package graft

import graft.plans.DoubleArrayDot
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{GraftExpressionBridge => B}

/** SQL-surface registration for the engine's custom expressions, so
  * `spark.sql("SELECT double_array_dot(a, b) ...")` works alongside the
  * Column API (`VectorFunctions.dotFast`).
  *
  * Two registration paths:
  *  - [[GraftFunctions.register]] — on an existing session (the harness
  *    hands us pre-built sessions, so this is the path the engine uses).
  *  - [[GraftExtensions]] — a SparkSessionExtensions hook for users who
  *    control session creation:
  *    `SparkSession.builder.withExtensions(new GraftExtensions)` or
  *    `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
object GraftFunctions {
  val names: Seq[String] = Seq("double_array_dot", "hamming_distance")

  def register(spark: SparkSession): Unit = {
    B.registerFunction(spark, "double_array_dot",
      args => {
        require(args.length == 2, "double_array_dot(a, b) takes exactly 2 arguments")
        DoubleArrayDot(args(0), args(1))
      })
    B.registerFunction(spark, "hamming_distance",
      args => {
        require(args.length == 2, "hamming_distance(a, b) takes exactly 2 arguments")
        graft.plans.HammingDistance(args(0), args(1))
      })
  }
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    B.injectFunction(ext, "double_array_dot",
      args => {
        require(args.length == 2, "double_array_dot(a, b) takes exactly 2 arguments")
        DoubleArrayDot(args(0), args(1))
      })
    B.injectFunction(ext, "hamming_distance",
      args => {
        require(args.length == 2, "hamming_distance(a, b) takes exactly 2 arguments")
        graft.plans.HammingDistance(args(0), args(1))
      },
      className = "graft.plans.HammingDistance")
    // naive abs(a-b) <= w joins become banded equi joins automatically
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
  }
}
