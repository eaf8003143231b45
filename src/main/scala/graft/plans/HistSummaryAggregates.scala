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

/** Shared plumbing of the two histogram aggregates: an exact
  * value→count map buffer with a hard distinct-cardinality cap,
  * length-prefixed UnsafeRow serialization (the Percentile pattern —
  * public Spark source), and a value-SORTED MapData eval so artifact
  * bytes are deterministic. */
sealed trait HistAggregate
    extends TypedImperativeAggregate[mutable.HashMap[Any, Long]]
    with UnaryLike[Expression] {
  def cap: Int

  /** The histogram's VALUE type (= the measure column's type). */
  protected def keyType: DataType

  /** Floating-point buffer keys ride their CANONICAL BITS (boxed
    * long/int): Scala's `==` on boxed NaN follows primitive semantics
    * (NaN ≠ NaN), so a HashMap keyed by the boxed double would never
    * merge NaN rows; doubleToLongBits canonicalizes every NaN pattern
    * and [[HistSummary.copyValue]] has already normalized -0.0. */
  protected def toKey(v: Any): Any = keyType match {
    case DoubleType =>
      java.lang.Long.valueOf(java.lang.Double.doubleToLongBits(
        v.asInstanceOf[java.lang.Double].doubleValue()))
    case FloatType =>
      java.lang.Integer.valueOf(java.lang.Float.floatToIntBits(
        v.asInstanceOf[java.lang.Float].floatValue()))
    case _ => v
  }

  protected def fromKey(k: Any): Any = keyType match {
    case DoubleType => java.lang.Double.valueOf(
      java.lang.Double.longBitsToDouble(k.asInstanceOf[java.lang.Long]))
    case FloatType => java.lang.Float.valueOf(
      java.lang.Float.intBitsToFloat(k.asInstanceOf[java.lang.Integer]))
    case _ => k
  }

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty[Any, Long]

  protected def bump(buf: mutable.HashMap[Any, Long], k: Any,
      by: Long): Unit = {
    val prev = buf.getOrElse(k, 0L)
    if (prev == 0L && buf.size >= cap)
      throw new IllegalStateException(
        s"$prettyName: a group exceeded cap=$cap distinct values — a " +
          "histogram partial over a high-cardinality measure would " +
          "dominate the artifact (and a truncated one would serve wrong " +
          "distinct counts). Raise the cap, key the column, or carry an " +
          "hll_ partial instead.")
    buf.update(k, prev + by)
  }

  override def merge(b1: mutable.HashMap[Any, Long],
      b2: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    b2.foreach { case (k, c) => bump(b1, k, c) }
    b1
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val ord = TypeUtils.getInterpretedOrdering(keyType)
    val entries = buf.toArray.map { case (k, c) => (fromKey(k), c) }
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

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val row = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(2)
    buf.foreach { case (k, c) =>
      row.update(0, fromKey(k))
      row.update(1, c)
      val unsafe = rowProj.apply(row)
      out.writeInt(unsafe.getSizeInBytes)
      unsafe.writeToStream(out, null)
    }
    out.writeInt(-1)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = mutable.HashMap.empty[Any, Long]
    var sz = in.readInt()
    while (sz >= 0) {
      val rowBytes = new Array[Byte](sz)
      in.readFully(rowBytes)
      rowBuf.pointTo(rowBytes, sz)
      buf.update(toKey(HistSummary.copyValue(rowBuf.get(0, keyType))),
        rowBuf.getLong(1))
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

  override def update(buf: mutable.HashMap[Any, Long],
      input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) bump(buf, toKey(HistSummary.copyValue(v)), 1L)
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

  override def update(buf: mutable.HashMap[Any, Long],
      input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val m = v.asInstanceOf[MapData]
      val keys = m.keyArray()
      val vals = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        bump(buf, toKey(HistSummary.copyValue(keys.get(i, keyType))),
          vals.getLong(i))
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
