package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Custom Catalyst expression (SURVEY.md §2.10 escape hatch, exercised
  * here deliberately): dense double-array dot product with real
  * `doGenCode`. This is the one hot loop the built-in surface cannot
  * express efficiently — `aggregate(zip_with(...))` evaluates an
  * interpreted lambda per element (128 closure calls per 64-dim pair),
  * while this compiles into the surrounding whole-stage-codegen Java as
  * a tight primitive loop. Measured ~3× faster on the all-pairs
  * similarity join at sf0.1.
  *
  * Semantics: null input array → null; arrays are assumed element-dense
  * (no null elements — true for the embeddings table and any L2
  * normalization output); length mismatch folds over the shorter.
  */
case class DoubleArrayDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"double_array_dot requires array<double> inputs, got $l / $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleArrayDot =
    copy(left = newLeft, right = newRight)
}

/** L2-normalize a dense float/double array to a unit double array in
  * ONE codegen'd pass — the vector family's single hottest per-row
  * operation. The HOF formulation this replaces
  * (`sqrt(aggregate(transform(v, x -> x*x), 0.0, +))` then
  * `transform(v, x -> x / nrm)`) evaluates an interpreted lambda per
  * ELEMENT — 128+ closure calls per 64-dim row, measured ~1.0 s per
  * pass over 100k vectors at x10 where the scan itself is 0.17 s, and
  * every ANN/similarity/dedup-embed query pays it at least once.
  *
  * Semantics (bit-identical to the HOF formulation): squared-norm
  * accumulates left-to-right in double precision (floats widened per
  * element); zero norm yields an all-zeros array (never NaN); null
  * array → null. Element-dense inputs assumed (no null elements —
  * true of the embeddings table and any normalization output), the
  * same contract as [[DoubleArrayDot]].
  */
case class DoubleArrayNormalize(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  // lazy: re-pattern-matching child.dataType per interpreted-path row
  // was measurable waste (review finding); transient keeps the cached
  // Boolean out of any serialized form
  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) |
         ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"double_array_normalize requires array<float> or array<double> input, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "double_array_normalize"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    val isF = elemIsFloat
    while (i < n) {
      val v = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
      out(i) = v
      s += v * v
      i += 1
    }
    val nrm = math.sqrt(s)
    if (nrm != 0.0) { i = 0; while (i < n) { out(i) /= nrm; i += 1 } }
    else java.util.Arrays.fill(out, 0.0)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      val out = ctx.freshName("out")
      val nrm = ctx.freshName("nrm")
      val get = if (elemIsFloat) s"(double) $a.getFloat" else s"$a.getDouble"
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double v = $get($i);
         |  $out[$i] = v;
         |  $s += v * v;
         |}
         |double $nrm = java.lang.Math.sqrt($s);
         |if ($nrm != 0.0) {
         |  for (int $i = 0; $i < $n; $i++) { $out[$i] /= $nrm; }
         |} else {
         |  java.util.Arrays.fill($out, 0.0);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): DoubleArrayNormalize = copy(child = newChild)
}

/** Elementwise `floor(x * scale)` into a dense double array in one
  * codegen'd pass — the k-means quantization step
  * (graft.api.Clustering). The HOF formulation
  * (`transform(v, x -> CAST(floor(x * scale) AS DOUBLE))`) evaluates an
  * interpreted lambda per ELEMENT — 64 closure calls per row, measured
  * as the dominant cost of the x100 (1M-vector) assignment pass.
  * Bit-identical semantics: floats widen per element, one IEEE multiply
  * + floor each; null array → null; element-dense input assumed (the
  * [[DoubleArrayDot]] contract).
  */
case class DoubleArrayQuantizeFloor(child: Expression, scale: Double)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  // Java-valid literal for codegen: Double.toString emits parseable
  // forms for all finite doubles ("1000.0", "1.0E-5", "-0.0"); a raw
  // interpolated splice of NaN/Infinity would emit bare `NaN`/`Infinity`
  // identifiers — uncompilable Java, forcing interpreted fallback
  // (review finding)
  private def scaleLiteral: String =
    if (scale.isNaN) "java.lang.Double.NaN"
    else if (scale == Double.PositiveInfinity) "java.lang.Double.POSITIVE_INFINITY"
    else if (scale == Double.NegativeInfinity) "java.lang.Double.NEGATIVE_INFINITY"
    else java.lang.Double.toString(scale) + "D"

  // lazy: re-pattern-matching child.dataType per interpreted-path row
  // was measurable waste (review finding); transient keeps the cached
  // Boolean out of any serialized form
  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) |
         ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"double_array_quantize_floor requires array<float> or array<double> input, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "double_array_quantize_floor"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Double](n)
    val isF = elemIsFloat
    var i = 0
    while (i < n) {
      val v = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
      out(i) = math.floor(v * scale)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val get = if (elemIsFloat) s"(double) $a.getFloat" else s"$a.getDouble"
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = java.lang.Math.floor($get($i) * $scaleLiteral);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): DoubleArrayQuantizeFloor = copy(child = newChild)
}
