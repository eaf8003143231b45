package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, HyperLogLogPlusPlusHelper}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Persisted, mergeable HLL++ SKETCH PARTIALS for summary artifacts —
  * what lets [[SummaryRewrite]] serve `approx_count_distinct(measure)`
  * (the "uniques per day" dashboard aggregate, where the unique column
  * is NOT a summary key) fact-scan-free and BIT-identical to the
  * direct sketch.
  *
  * The three aggregates share Spark's own
  * [[org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper]] —
  * the exact update (same XxHash64 value hashing), register layout
  * (6-bit registers packed 10 per long word), max-merge, and
  * bias-corrected query that `approx_count_distinct` itself runs — so
  * the exactness contract is structural, not numeric: registers are a
  * pure function of the value SET plus per-register MAX, and max-merge
  * is associative and commutative, so partial-per-group then
  * merge-across-groups produces the IDENTICAL register words (hence
  * the identical estimate) as one pass over the fact. HiSS-Cube
  * analogue: the zoom pyramid's pre-binned partial payloads served in
  * place of raw pixels (`metadata_strategy.py`), here for the
  * distinct-count measure the plain cnt/sum partials cannot carry.
  *
  * Register-word columns are named `hll_<p>_<col>` — the precision is
  * IN the name so a query's `relativeSD` resolves (or refuses) at plan
  * time against the artifact SCHEMA: a mismatched-rsd query simply
  * finds no `hll_<p'>_<col>` column and the fact scan answers. All
  * three are `TypedImperativeAggregate[Array[Long]]` (object-hash
  * aggregation with sort-based spill fallback); the build pays this
  * once per summary, the serve side folds summary-row-count arrays.
  */
object HllSummary {

  /** The register-count exponent `approx_count_distinct(col, rsd)`
    * derives (the same expression HyperLogLogPlusPlusHelper computes
    * from its relativeSD — public Spark source). */
  def pFor(rsd: Double): Int =
    math.ceil(2.0d * math.log(1.106d / rsd) / math.log(2.0d)).toInt

  /** An rsd whose derived exponent is exactly `p` — mid-interval of
    * the preimage, so float rounding can never tip the ceil to p±1. */
  def rsdFor(p: Int): Double = 1.106d / math.pow(2.0d, (p - 0.5d) / 2.0d)

  def colName(p: Int, col: String): String = s"hll_${p}_$col"

  /** Artifact-schema pattern of a sketch-partial column. */
  val NamePattern: scala.util.matching.Regex = """hll_(\d+)_(.+)""".r

  def isWordsType(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** Register words of `c`'s value set (build side). */
  def partialWords(c: Column, p: Int): Column =
    fn("graft_hll_partial", c, lit(p))

  /** Max-merge of register-word arrays (maintenance/rollup fold). */
  def mergeWords(c: Column, p: Int): Column =
    fn("graft_hll_merge", c, lit(p))

  private def fn(name: String, args: Column*): Column = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(register)
    call_function(name, args: _*)
  }

  /** Idempotent per-session registration (the VectorExpressions
    * pattern); the analyzer wraps the returned AggregateFunction in a
    * Complete AggregateExpression. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hll_partial"))) {
      reg.createOrReplaceTempFunction("graft_hll_partial",
        exprs => HllPartialWords(exprs(0), foldP(exprs(1))), "scala_udf")
      reg.createOrReplaceTempFunction("graft_hll_merge",
        exprs => HllMergeWords(exprs(0), foldP(exprs(1))), "scala_udf")
    }
  }

  private def foldP(e: Expression): Int = {
    require(e.foldable, s"hll precision argument must be a literal: $e")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"hll precision argument must be integral, got $other")
    }
  }

  /** Minimal register-word buffer view — the only InternalRow surface
    * [[HyperLogLogPlusPlusHelper]] touches is getLong/setLong at word
    * offsets. */
  private[plans] final class WordsRow(val words: Array[Long])
      extends InternalRow {
    override def numFields: Int = words.length
    override def getLong(i: Int): Long = words(i)
    override def setLong(i: Int, v: Long): Unit = words(i) = v
    override def update(i: Int, v: Any): Unit =
      words(i) = v.asInstanceOf[Long]
    override def setNullAt(i: Int): Unit = unsupported()
    override def copy(): InternalRow = new WordsRow(words.clone())
    override def isNullAt(i: Int): Boolean = false
    override def getBoolean(i: Int): Boolean = unsupported()
    override def getByte(i: Int): Byte = unsupported()
    override def getShort(i: Int): Short = unsupported()
    override def getInt(i: Int): Int = unsupported()
    override def getFloat(i: Int): Float = unsupported()
    override def getDouble(i: Int): Double = unsupported()
    override def getDecimal(i: Int, p: Int, s: Int): Decimal = unsupported()
    override def getUTF8String(i: Int): org.apache.spark.unsafe.types.UTF8String =
      unsupported()
    override def getBinary(i: Int): Array[Byte] = unsupported()
    override def getGeography(i: Int): org.apache.spark.unsafe.types.GeographyVal =
      unsupported()
    override def getGeometry(i: Int): org.apache.spark.unsafe.types.GeometryVal =
      unsupported()
    override def getInterval(i: Int): org.apache.spark.unsafe.types.CalendarInterval =
      unsupported()
    override def getVariant(i: Int): org.apache.spark.unsafe.types.VariantVal =
      unsupported()
    override def getStruct(i: Int, n: Int): InternalRow = unsupported()
    override def getArray(i: Int): ArrayData = unsupported()
    override def getMap(i: Int): org.apache.spark.sql.catalyst.util.MapData =
      unsupported()
    override def get(i: Int, dt: DataType): AnyRef = unsupported()
    private def unsupported(): Nothing =
      throw new UnsupportedOperationException(
        "WordsRow carries HLL register words only")
  }
}

/** Shared plumbing of the three register-word aggregates. */
sealed trait HllWordsAggregate extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {
  def p: Int

  @transient protected lazy val helper =
    new HyperLogLogPlusPlusHelper(HllSummary.rsdFor(p))

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](helper.numWords)

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    helper.merge(new HllSummary.WordsRow(b1), new HllSummary.WordsRow(b2),
      0, 0)
    b1
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def nullable: Boolean = false
}

/** Build side: register words of the child column's value set — the
  * `hll_<p>_<col>` artifact column. NULL inputs are skipped exactly
  * like `approx_count_distinct`'s. */
case class HllPartialWords(child: Expression, p: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends HllWordsAggregate {

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      helper.update(new HllSummary.WordsRow(buf), 0, v, child.dataType)
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def withNewMutableAggBufferOffset(n: Int): HllPartialWords =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllPartialWords =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): HllPartialWords =
    copy(child = c)
  override def prettyName: String = "graft_hll_partial"
}

/** Maintenance fold: max-merge of register-word arrays, words out —
  * what [[SummaryRewrite]]'s rollup/mergeDelta folds ride. A NULL
  * input array contributes nothing (empty registers). */
case class HllMergeWords(child: Expression, p: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends HllWordsAggregate {

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == helper.numWords,
        s"hll register mismatch: artifact carries ${arr.numElements()} " +
          s"words, p=$p needs ${helper.numWords} — the column does not " +
          "honor its own name's precision")
      helper.merge(new HllSummary.WordsRow(buf),
        new HllSummary.WordsRow(arr.toLongArray()), 0, 0)
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def withNewMutableAggBufferOffset(n: Int): HllMergeWords =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllMergeWords =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): HllMergeWords =
    copy(child = c)
  override def prettyName: String = "graft_hll_merge"
}

/** Serve side: max-merge of register-word arrays, ESTIMATE out — the
  * expression [[SummaryRewrite]] substitutes for
  * `approx_count_distinct(measure)`. Same registers, same
  * bias-corrected query ⇒ the same Long the direct sketch returns. */
case class HllMergeEstimate(child: Expression, p: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends HllWordsAggregate {

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == helper.numWords,
        s"hll register mismatch: artifact carries ${arr.numElements()} " +
          s"words, p=$p needs ${helper.numWords}")
      helper.merge(new HllSummary.WordsRow(buf),
        new HllSummary.WordsRow(arr.toLongArray()), 0, 0)
    }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    helper.query(new HllSummary.WordsRow(buf), 0)
  override def dataType: DataType = LongType
  override def withNewMutableAggBufferOffset(n: Int): HllMergeEstimate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllMergeEstimate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): HllMergeEstimate =
    copy(child = c)
  override def prettyName: String = "graft_hll_merge_estimate"
}
