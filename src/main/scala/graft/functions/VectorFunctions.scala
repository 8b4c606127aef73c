package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over ArrayType(FloatType) embeddings, built
  * entirely from codegen-friendly higher-order functions — no UDFs, so
  * the expressions stay inside whole-stage codegen and never leave the
  * JVM fast path. Floats are widened to double before accumulating
  * (left-to-right fold, same order as DuckDB's list reductions).
  */
object VectorFunctions {

  /** Dot product in double precision. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm in double precision. */
  def sqNorm(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(sqNorm(a))

  /** Cosine similarity; 0-norm guarded to NULL rather than NaN. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom =!= 0.0, dotD(a, b) / denom)
  }

  /** Codegen'd dot product over array<double> (graft.plans.DoubleArrayDot)
    * — same math as dotD but a tight primitive loop inside whole-stage
    * codegen instead of an interpreted per-element lambda. Use on the
    * per-pair hot path of similarity joins; inputs must already be
    * double arrays (cast("array<double>") is itself codegen'd). */
  def dotFast(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.plans.DoubleArrayDot(
        org.apache.spark.sql.GraftExpressionBridge.expression(a),
        org.apache.spark.sql.GraftExpressionBridge.expression(b)))

  /** Codegen'd unit L2-normalization (graft.plans.DoubleArrayNormalize)
    * — one tight pass per row replacing two interpreted per-element
    * HOF lambdas (square-sum + divide). Accepts array<float> or
    * array<double>; zero vector → zeros; bit-identical accumulation
    * order to the HOF formulation. */
  def normalizeFast(a: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.plans.DoubleArrayNormalize(
        org.apache.spark.sql.GraftExpressionBridge.expression(a)))
}
