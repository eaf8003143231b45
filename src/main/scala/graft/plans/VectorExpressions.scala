package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen kernels for the embedding hot path (dot product, L1
  * distance, cosine) — BinaryExpressions over `array<float|double>` with
  * `doGenCode`, so vector math runs inside whole-stage codegen as a
  * tight primitive loop instead of the interpreted higher-order-function
  * chain (`aggregate`/`zip_with` evaluate a lambda per element, off the
  * codegen path — the difference IS the ANN scan cost at corpus scale).
  * Cosine additionally folds the three array traversals (a·b, a·a, b·b)
  * into ONE pass with three accumulators.
  *
  * Semantics are BIT-IDENTICAL to the HOF forms they replace (and to
  * the DuckDB oracles): elements cast to double, left-to-right
  * accumulation from 0.0, null array → null, length mismatch → null
  * (zip_with pads with nulls, which poisons the fold — same result),
  * null element → null.
  */
abstract class ArrayPairFold extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // Reject non-array<float|double> inputs at analysis time; without this
  // a bad column type only surfaces as an executor-side exception mid-job.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def getter(e: Expression): (ArrayData, Int) => Double = e.dataType match {
    case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case t => throw new IllegalArgumentException(
      s"$prettyName expects array<float|double>, got $t")
  }

  /** Java accessor snippet for one element of `arr` (already `(double)`). */
  protected def jGet(e: Expression, arr: String, i: String): String = e.dataType match {
    case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
    case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
    case t => throw new IllegalArgumentException(
      s"$prettyName expects array<float|double>, got $t")
  }

  /** Interpreted fold over one element pair → new accumulator state. */
  protected def foldEval(acc: Array[Double], x: Double, y: Double): Unit
  protected def finishEval(acc: Array[Double]): Double
  protected def accSlots: Int

  /** Java statements folding one pair (x, y) into the accumulator vars. */
  protected def jFold(acc: IndexedSeq[String], x: String, y: String): String
  protected def jFinish(acc: IndexedSeq[String]): String

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val (la, ra) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (la.numElements() != ra.numElements()) return null
    val (gl, gr) = (getter(left), getter(right))
    val acc = new Array[Double](accSlots)
    var i = 0
    while (i < la.numElements()) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      foldEval(acc, gl(la, i), gr(ra, i))
      i += 1
    }
    finishEval(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val acc = (0 until accSlots).map(k => ctx.freshName(s"acc$k"))
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val bad = ctx.freshName("bad")
      // freshName EVERY local (not just the accumulators): a fixed `x`/`y`
      // colliding with an enclosing generated scope fails janino compile
      // and silently drops the whole stage to the interpreted path.
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $l.numElements();
         |boolean $bad = ($n != $r.numElements());
         |${acc.map(a => s"double $a = 0.0;").mkString("\n")}
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { $bad = true; break; }
         |    double $x = ${jGet(left, l, i)};
         |    double $y = ${jGet(right, r, i)};
         |    ${jFold(acc, x, y)}
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = ${jFinish(acc)}; }
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ (double accumulation, array order). */
case class ArrayDotExpr(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "vec_dot"
  override protected def accSlots: Int = 1
  override protected def foldEval(acc: Array[Double], x: Double, y: Double): Unit =
    acc(0) += x * y
  override protected def finishEval(acc: Array[Double]): Double = acc(0)
  override protected def jFold(acc: IndexedSeq[String], x: String, y: String): String =
    s"${acc(0)} += $x * $y;"
  override protected def jFinish(acc: IndexedSeq[String]): String = acc(0)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Σ |aᵢ − bᵢ| — the reference's `target_distance` kernel. */
case class ArrayL1Expr(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "vec_l1"
  override protected def accSlots: Int = 1
  override protected def foldEval(acc: Array[Double], x: Double, y: Double): Unit =
    acc(0) += math.abs(x - y)
  override protected def finishEval(acc: Array[Double]): Double = acc(0)
  override protected def jFold(acc: IndexedSeq[String], x: String, y: String): String =
    s"${acc(0)} += java.lang.Math.abs($x - $y);"
  override protected def jFinish(acc: IndexedSeq[String]): String = acc(0)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Σ |aᵢ − bᵢ| skipping NaN pairs (numpy nansum semantics — the
  * reference's `target_distance` over stacked spectra, where masked
  * samples are NaN). A NaN difference contributes 0 instead of
  * poisoning the sum. */
case class ArrayNanL1Expr(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "vec_nanl1"
  override protected def accSlots: Int = 1
  override protected def foldEval(acc: Array[Double], x: Double, y: Double): Unit = {
    val d = math.abs(x - y)
    if (!d.isNaN) acc(0) += d
  }
  override protected def finishEval(acc: Array[Double]): Double = acc(0)
  override protected def jFold(acc: IndexedSeq[String], x: String, y: String): String =
    // No local: isNaN(x-y) ⇔ isNaN(|x-y|), so test the difference directly
    // (a fixed local name here would risk a janino name collision).
    s"if (!java.lang.Double.isNaN($x - $y)) ${acc(0)} += java.lang.Math.abs($x - $y);"
  override protected def jFinish(acc: IndexedSeq[String]): String = acc(0)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** a·b / (‖a‖·‖b‖) in ONE pass (three accumulators) — value-identical
  * to the three-pass form because each accumulator folds independently
  * in array order. */
case class ArrayCosineExpr(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "vec_cos"
  override protected def accSlots: Int = 3
  override protected def foldEval(acc: Array[Double], x: Double, y: Double): Unit = {
    acc(0) += x * y; acc(1) += x * x; acc(2) += y * y
  }
  override protected def finishEval(acc: Array[Double]): Double =
    acc(0) / (math.sqrt(acc(1)) * math.sqrt(acc(2)))
  override protected def jFold(acc: IndexedSeq[String], x: String, y: String): String =
    s"${acc(0)} += $x * $y; ${acc(1)} += $x * $x; ${acc(2)} += $y * $y;"
  override protected def jFinish(acc: IndexedSeq[String]): String =
    s"${acc(0)} / (java.lang.Math.sqrt(${acc(1)}) * java.lang.Math.sqrt(${acc(2)}))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** |A ∩ B| for two SORTED, de-duplicated string arrays — the verify
  * kernel of the set-similarity joins. Value-equal to
  * `size(array_intersect(a, b))` on set inputs, but a single merge walk
  * per pair instead of a hash-set build per row (`array_intersect`
  * constructs and probes a hash map for every invocation): the LSH and
  * prefix-filter verifies evaluate one intersection per CANDIDATE PAIR,
  * so at corpus scale this constant factor is the verify stage. Inputs
  * must be sorted ascending (`sort_array` — same binary UTF8 order this
  * walk compares by); the producers sort once per document, amortized
  * over that document's every pair. Null arrays → null; null ELEMENTS
  * never count as matches (the set producers emit none).
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "sorted_intersect_count"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val (la, ra) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    var i = 0; var j = 0; var c = 0
    val (n, m) = (la.numElements(), ra.numElements())
    while (i < n && j < m) {
      if (la.isNullAt(i)) i += 1
      else if (ra.isNullAt(j)) j += 1
      else {
        val cmp = la.getUTF8String(i).compareTo(ra.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |int $n = $l.numElements();
         |int $m = $r.numElements();
         |while ($i < $n && $j < $m) {
         |  if ($l.isNullAt($i)) { $i++; }
         |  else if ($r.isNullAt($j)) { $j++; }
         |  else {
         |    int $cmp = $l.getUTF8String($i).compareTo($r.getUTF8String($j));
         |    if ($cmp == 0) { $c++; $i++; $j++; }
         |    else if ($cmp < 0) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** All C(m,3) ascending-index triples of a sorted id array, each packed
  * into one long (`a·2⁴⁰ + b·2²⁰ + c` — the q225 20-bit dictionary
  * contract), emitted in the same lexicographic (i, j, k) order as the
  * nested-HOF form it replaces:
  *
  *   flatten(transform(sequence(1, m-2), i -> flatten(transform(
  *     sequence(i+1, m-1), j -> transform(sequence(j+1, m), k -> pack)))))
  *
  * That chain is the itemset hot path's whole cost: higher-order
  * functions evaluate OFF the codegen path — a lambda invocation and a
  * boxed Long per element, plus two levels of flatten copies and one
  * GenericArrayData per (i, j) prefix (~m²/2 array allocations per row).
  * Here the triple space is ONE primitive long[] filled by three tight
  * loops and wrapped zero-copy-per-element (UnsafeArrayData
  * .fromPrimitiveArray) — same multiset, same order, no boxing.
  *
  * Null array → null (HOF parity). Elements must be non-null (the
  * caller feeds `array_sort(collect_list(...))`, which cannot emit
  * nulls). The triple count is guarded against int overflow loudly —
  * the HOF form would OOM long before that bound anyway. */
case class PackedTriplesExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "packed_triples"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<bigint> argument, got ${t.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val m = a.numElements()
    // guard m FIRST: m³/6 overflows Long from m ≈ 3.8M, which would
    // bypass the cnt guard below and surface as a confusing
    // NegativeArraySizeException; 4096 is far above any real itemset
    // row (the 20-bit dictionary admits ≤ ~1M ids but C(2344,3)
    // already exceeds the array bound) yet safely below both limits
    if (m > 4096)
      throw new IllegalArgumentException(
        s"packed_triples: $m items — C($m, 3) exceeds the array bound")
    val cnt = if (m < 3) 0L else m.toLong * (m - 1) * (m - 2) / 6L
    if (cnt > Int.MaxValue - 16)
      throw new IllegalArgumentException(
        s"packed_triples: C($m, 3) = $cnt triples exceed the array bound")
    val out = new Array[Long](cnt.toInt)
    var p = 0
    var i = 0
    while (i < m - 2) {
      val vi = a.getLong(i) * 1099511627776L
      var j = i + 1
      while (j < m - 1) {
        val vj = vi + a.getLong(j) * 1048576L
        var k = j + 1
        while (k < m) { out(p) = vj + a.getLong(k); p += 1; k += 1 }
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val vi = ctx.freshName("vi")
      val vj = ctx.freshName("vj")
      s"""
         |int $m = $a.numElements();
         |if ($m > 4096) {
         |  throw new IllegalArgumentException(
         |    "packed_triples: " + $m + " items — C(" + $m +
         |    ", 3) exceeds the array bound");
         |}
         |long $cnt = $m < 3 ? 0L : (long) $m * ($m - 1) * ($m - 2) / 6L;
         |if ($cnt > Integer.MAX_VALUE - 16) {
         |  throw new IllegalArgumentException(
         |    "packed_triples: C(" + $m + ", 3) = " + $cnt +
         |    " triples exceed the array bound");
         |}
         |long[] $out = new long[(int) $cnt];
         |int $p = 0;
         |for (int $i = 0; $i < $m - 2; $i++) {
         |  long $vi = $a.getLong($i) * 1099511627776L;
         |  for (int $j = $i + 1; $j < $m - 1; $j++) {
         |    long $vj = $vi + $a.getLong($j) * 1048576L;
         |    for (int $k = $j + 1; $k < $m; $k++) {
         |      $out[$p++] = $vj + $a.getLong($k);
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}

object VectorExpressions {

  import org.apache.spark.sql.functions.call_function

  // self-contained Column builders: register on the active/default
  // session first (idempotent), so callers outside Tables.load resolve
  private def fn(name: String, args: Column*): Column = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(register)
    call_function(name, args: _*)
  }

  def vec_dot(a: Column, b: Column): Column = fn("vec_dot", a, b)
  def vec_l1(a: Column, b: Column): Column = fn("vec_l1", a, b)
  def vec_cos(a: Column, b: Column): Column = fn("vec_cos", a, b)
  def vec_nanl1(a: Column, b: Column): Column = fn("vec_nanl1", a, b)
  def sorted_intersect_count(a: Column, b: Column): Column =
    fn("sorted_intersect_count", a, b)
  def packed_triples(ids: Column): Column = fn("packed_triples", ids)

  /** Idempotent per-session registration — skipped when already present
    * (callers invoke this on every table load). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"))) {
      reg.createOrReplaceTempFunction("vec_dot",
        exprs => ArrayDotExpr(exprs(0), exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction("vec_l1",
        exprs => ArrayL1Expr(exprs(0), exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction("vec_cos",
        exprs => ArrayCosineExpr(exprs(0), exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction("vec_nanl1",
        exprs => ArrayNanL1Expr(exprs(0), exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction("simhash64",
        exprs => SimHash64Expr(exprs(0)), "scala_udf")
      reg.createOrReplaceTempFunction("sorted_intersect_count",
        exprs => SortedIntersectCountExpr(exprs(0), exprs(1)), "scala_udf")
    }
    // own guard: sessions registered by an older build of this block
    // would otherwise skip the newer function
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("packed_triples"))) {
      reg.createOrReplaceTempFunction("packed_triples",
        exprs => PackedTriplesExpr(exprs(0)), "scala_udf")
    }
  }
}
