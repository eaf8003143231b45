package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData, TypeUtils}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Persisted, mergeable EXACT value-histogram partials for summary
  * artifacts — `hist_<col>: map<T, bigint>` (non-null value → count
  * within the group) — what lets [[SummaryRewrite]] serve the whole
  * distinct-family over a non-key MEASURE fact-scan-free and EXACT:
  * `count(distinct m)`, `sum/avg(distinct m)`, exact
  * `percentile/median(m)` (the frequency argument replays the
  * multiset), and `approx_count_distinct(m)` (bit-identical — the
  * sketch is a pure function of the value SET, which the histogram
  * preserves). The serving side explodes the map, so every consumer
  * is Spark's OWN aggregate implementation — no custom eval semantics
  * to trust.
  *
  * The histogram is the exact counterpart of the `hll_<p>_<col>`
  * register partial: same monoid discipline (per-group partials,
  * count-sum merge is associative and commutative), but it carries
  * the full value→count multiset, so everything the fact could answer
  * about the column's DISTRIBUTION is derivable, not just its
  * cardinality estimate. The price is bounded by `cap`: a group whose
  * distinct-value count exceeds the cap REFUSES AT BUILD TIME (loud,
  * never a silently truncated histogram — a dropped value would serve
  * a wrong distinct count), which is the honest contract for the
  * low-cardinality measures this partial is for (status codes, score
  * buckets, user ids per small key-group, …). High-cardinality
  * measures belong to the HLL partial instead.
  *
  * HiSS-Cube analogue: the zoom pyramid's pre-binned payloads
  * (`metadata_strategy.py`) — a coarser resolution that still answers
  * the query exactly because the binning preserved what the query
  * needs; here the "bin" is the exact value multiset per key group.
  *
  * Entries are SORTED by value at eval, so artifact bytes are
  * deterministic and audits can compare `map_entries` arrays exactly.
  */
object HistSummary {

  /** Default per-group distinct-value cap — generous for the status/
    * bucket/id-per-group measures the partial targets while refusing
    * the degenerate "histogram of a unique id over a tiny key" build
    * before it dominates the artifact. */
  val DefaultCap: Int = 65536

  def colName(col: String): String = s"hist_$col"

  /** Artifact-schema pattern of a histogram-partial column. */
  val NamePattern: scala.util.matching.Regex = """hist_(.+)""".r

  def isHistType(t: DataType): Boolean = t match {
    case MapType(_, LongType, _) => true
    case _ => false
  }

  /** Key types the histogram supports: atomic, hashable, orderable,
    * and safely copyable out of reused eval buffers. */
  def supportedKeyType(t: DataType): Boolean = t match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        FloatType | DoubleType | StringType | DateType | TimestampType |
        TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** value→count histogram of `c`'s non-null values (build side). */
  def partialHist(c: Column, cap: Int = DefaultCap): Column =
    fn("graft_hist_partial", c, lit(cap))

  /** Count-sum merge of histogram maps (maintenance/rollup fold). */
  def mergeHist(c: Column, cap: Int = DefaultCap): Column =
    fn("graft_hist_merge", c, lit(cap))

  private def fn(name: String, args: Column*): Column = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(register)
    call_function(name, args: _*)
  }

  /** Idempotent per-session registration (the HllSummary pattern). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hist_partial"))) {
      reg.createOrReplaceTempFunction("graft_hist_partial",
        exprs => HistPartial(exprs(0), foldCap(exprs(1))), "scala_udf")
      reg.createOrReplaceTempFunction("graft_hist_merge",
        exprs => HistMerge(exprs(0), foldCap(exprs(1))), "scala_udf")
    }
  }

  private def foldCap(e: Expression): Int = {
    require(e.foldable, s"hist cap argument must be a literal: $e")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"hist cap argument must be integral, got $other")
    }
  }

  /** Defensive copy of a value that may live in a reused eval buffer
    * (UnsafeRow-backed UTF8String / Decimal), plus float-point KEY
    * normalization matching Spark's own aggregation-key semantics
    * (NormalizeFloatingNumbers): -0.0 groups with 0.0 and every NaN
    * bit pattern is one NaN — boxed equals() distinguishes both, and
    * an unnormalized histogram would overcount the distinct set. */
  private[plans] def copyValue(v: Any): Any = v match {
    case u: org.apache.spark.unsafe.types.UTF8String => u.copy()
    case d: org.apache.spark.sql.types.Decimal =>
      org.apache.spark.sql.types.Decimal(d.toJavaBigDecimal)
    case d: java.lang.Double =>
      if (d.isNaN) java.lang.Double.valueOf(Double.NaN)
      else if (d.doubleValue() == 0.0d) java.lang.Double.valueOf(0.0d)
      else d
    case f: java.lang.Float =>
      if (f.isNaN) java.lang.Float.valueOf(Float.NaN)
      else if (f.floatValue() == 0.0f) java.lang.Float.valueOf(0.0f)
      else f
    case other => other
  }
}

/** Aggregation buffer behind [[HistAggregate]]: two representations
  * under one interface, picked by the measure's TYPE at buffer
  * creation.
  *
  * Fixed-width measures (all integrals, date/timestamp, float/double
  * via canonical bits, boolean) ride a PRIMITIVE open-addressing
  * `mutable.LongMap[Long]` — no boxed key, no per-entry node object.
  * This is the q289 working-set fix: a 150k-entry histogram partial is
  * two primitive arrays (~2.5 MB) instead of ~20 MB of boxed
  * `HashMap[Any,Long]` entries, and a 32-thread local build holds ONE
  * partial per thread of the small kind, so the suite's allocation
  * pressure (and the GC swings the bench artifact showed) drops ~8×
  * on the hist-build family. Strings and decimals keep the generic
  * map ([[HistSummary.copyValue]] defends their reused eval buffers).
  */
private[plans] sealed trait HistBuffer { def size: Int }
private[plans] final class LongHistBuffer extends HistBuffer {
  val m = new mutable.LongMap[Long]()
  def size: Int = m.size
}
private[plans] final class AnyHistBuffer extends HistBuffer {
  val m = mutable.HashMap.empty[Any, Long]
  def size: Int = m.size
}

/** Shared plumbing of the two histogram aggregates: an exact
  * value→count map buffer with a hard distinct-cardinality cap,
  * length-prefixed UnsafeRow serialization (the Percentile pattern —
  * public Spark source), and a value-SORTED MapData eval so artifact
  * bytes are deterministic. */
sealed trait HistAggregate
    extends TypedImperativeAggregate[HistBuffer]
    with UnaryLike[Expression] {
  def cap: Int

  /** The histogram's VALUE type (= the measure column's type). */
  protected def keyType: DataType

  /** Fixed-width types pack losslessly into a primitive Long key. */
  @transient protected final lazy val fixedWidthKey: Boolean =
    keyType match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
          FloatType | DoubleType | DateType | TimestampType |
          TimestampNTZType => true
      case _ => false
    }

  /** Internal value → primitive Long key. Floating-point keys ride
    * their CANONICAL BITS: boxed-NaN `==` follows primitive semantics
    * (NaN ≠ NaN) so bit-canonicalization (doubleToLongBits collapses
    * every NaN pattern) is what makes NaN one histogram entry, and
    * -0.0 normalizes to 0.0 first — Spark's own aggregation-key
    * semantics (NormalizeFloatingNumbers). */
  protected final def toLongKey(v: Any): Long = keyType match {
    case BooleanType => if (v.asInstanceOf[java.lang.Boolean]) 1L else 0L
    case DoubleType =>
      val d = v.asInstanceOf[java.lang.Double].doubleValue()
      java.lang.Double.doubleToLongBits(if (d == 0.0d) 0.0d else d)
    case FloatType =>
      val f = v.asInstanceOf[java.lang.Float].floatValue()
      java.lang.Float.floatToIntBits(if (f == 0.0f) 0.0f else f).toLong
    case _ => v.asInstanceOf[java.lang.Number].longValue()
  }

  protected final def fromLongKey(k: Long): Any = keyType match {
    case BooleanType => java.lang.Boolean.valueOf(k != 0L)
    case ByteType => java.lang.Byte.valueOf(k.toByte)
    case ShortType => java.lang.Short.valueOf(k.toShort)
    case IntegerType | DateType => java.lang.Integer.valueOf(k.toInt)
    case FloatType => java.lang.Float.valueOf(
      java.lang.Float.intBitsToFloat(k.toInt))
    case DoubleType => java.lang.Double.valueOf(
      java.lang.Double.longBitsToDouble(k))
    case _ => java.lang.Long.valueOf(k)
  }

  override def createAggregationBuffer(): HistBuffer =
    if (fixedWidthKey) new LongHistBuffer else new AnyHistBuffer

  private def capError: Nothing = throw new IllegalStateException(
    s"$prettyName: a group exceeded cap=$cap distinct values — a " +
      "histogram partial over a high-cardinality measure would " +
      "dominate the artifact (and a truncated one would serve wrong " +
      "distinct counts). Raise the cap, key the column, or carry an " +
      "hll_ partial instead.")

  protected final def bumpLong(buf: LongHistBuffer, k: Long,
      by: Long): Unit = {
    val prev = buf.m.getOrElse(k, 0L)
    if (prev == 0L && buf.m.size >= cap) capError
    buf.m.update(k, prev + by)
  }

  protected final def bumpAny(buf: AnyHistBuffer, k: Any,
      by: Long): Unit = {
    val prev = buf.m.getOrElse(k, 0L)
    if (prev == 0L && buf.m.size >= cap) capError
    buf.m.update(k, prev + by)
  }

  /** Add one INTERNAL value (already non-null) with multiplicity. */
  protected final def bumpValue(buf: HistBuffer, v: Any,
      by: Long): Unit = buf match {
    case b: LongHistBuffer => bumpLong(b, toLongKey(v), by)
    case b: AnyHistBuffer => bumpAny(b, HistSummary.copyValue(v), by)
  }

  override def merge(b1: HistBuffer, b2: HistBuffer): HistBuffer =
    (b1, b2) match {
      case (a: LongHistBuffer, b: LongHistBuffer) =>
        b.m.foreach { case (k, c) => bumpLong(a, k, c) }
        a
      case (a: AnyHistBuffer, b: AnyHistBuffer) =>
        b.m.foreach { case (k, c) => bumpAny(a, k, c) }
        a
      case _ => throw new IllegalStateException(
        s"$prettyName: mismatched histogram buffer kinds in merge")
    }

  /** Entries as (internal value, count), buffer order. */
  private def entriesArray(buf: HistBuffer): Array[(Any, Long)] = {
    val out = new Array[(Any, Long)](buf.size)
    var i = 0
    buf match {
      case b: LongHistBuffer =>
        b.m.foreach { case (k, c) => out(i) = (fromLongKey(k), c); i += 1 }
      case b: AnyHistBuffer =>
        b.m.foreach { case (k, c) => out(i) = (k, c); i += 1 }
    }
    out
  }

  override def eval(buf: HistBuffer): Any = {
    val ord = TypeUtils.getInterpretedOrdering(keyType)
    val entries = entriesArray(buf)
      .sortBy(_._1)(ord.asInstanceOf[Ordering[Any]])
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1)),
      new GenericArrayData(entries.map(e => e._2: Any)))
  }

  override def dataType: DataType =
    MapType(keyType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val rowProj =
    UnsafeProjection.create(Array[DataType](keyType, LongType))
  @transient private lazy val rowBuf = new UnsafeRow(2)

  override def serialize(buf: HistBuffer): Array[Byte] = {
    // presized: 2-field UnsafeRow = 24 B fixed (+ var-length for
    // strings) + 4 B length prefix — log-growth copies of a multi-MB
    // ByteArrayOutputStream were measurable garbage at the q289 scale
    val bos = new ByteArrayOutputStream(buf.size * 32 + 16)
    val out = new DataOutputStream(bos)
    val row = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(2)
    def writeEntry(k: Any, c: Long): Unit = {
      row.update(0, k)
      row.update(1, c)
      val unsafe = rowProj.apply(row)
      out.writeInt(unsafe.getSizeInBytes)
      unsafe.writeToStream(out, null)
    }
    buf match {
      case b: LongHistBuffer =>
        b.m.foreach { case (k, c) => writeEntry(fromLongKey(k), c) }
      case b: AnyHistBuffer =>
        b.m.foreach { case (k, c) => writeEntry(k, c) }
    }
    out.writeInt(-1)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HistBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    var sz = in.readInt()
    while (sz >= 0) {
      val rowBytes = new Array[Byte](sz)
      in.readFully(rowBytes)
      rowBuf.pointTo(rowBytes, sz)
      val v = rowBuf.get(0, keyType)
      val c = rowBuf.getLong(1)
      // direct puts (the wire histogram was already cap-checked)
      buf match {
        case b: LongHistBuffer => b.m.update(toLongKey(v), c)
        case b: AnyHistBuffer =>
          b.m.update(HistSummary.copyValue(v), c)
      }
      sz = in.readInt()
    }
    buf
  }
}

/** Build side: exact value→count histogram of the child column's
  * non-null values — the `hist_<col>` artifact column. NULLs are
  * skipped exactly like count(col)/percentile's. */
case class HistPartial(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends HistAggregate {

  require(HistSummary.supportedKeyType(child.dataType),
    s"graft_hist_partial: unsupported measure type ${child.dataType} — " +
      "atomic orderable types only")

  override protected def keyType: DataType = child.dataType

  override def update(buf: HistBuffer, input: InternalRow): HistBuffer = {
    val v = child.eval(input)
    if (v != null) bumpValue(buf, v, 1L)
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): HistPartial =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HistPartial =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): HistPartial =
    copy(child = c)
  override def prettyName: String = "graft_hist_partial"
}

/** Maintenance fold: count-sum merge of histogram maps, map out —
  * what [[SummaryRewrite]]'s rollup/mergeDelta folds ride. A NULL
  * input map contributes nothing (empty histogram). The cap holds on
  * the MERGED group too: folding to coarser keys can only union value
  * sets, and a silent overflow here would be the same wrong-distinct
  * class the build-side cap refuses. */
case class HistMerge(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends HistAggregate {

  require(HistSummary.isHistType(child.dataType),
    s"graft_hist_merge: expected map<T,bigint>, got ${child.dataType}")

  override protected def keyType: DataType =
    child.dataType.asInstanceOf[MapType].keyType

  override def update(buf: HistBuffer, input: InternalRow): HistBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val m = v.asInstanceOf[MapData]
      val keys = m.keyArray()
      val vals = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        bumpValue(buf, keys.get(i, keyType), vals.getLong(i))
        i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): HistMerge =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HistMerge =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): HistMerge =
    copy(child = c)
  override def prettyName: String = "graft_hist_merge"
}
