package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one SparkContext per forked test
  * JVM). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  spark.sparkContext.setLogLevel("WARN")

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  /** AQE-aware physical-plan walk: AdaptiveSparkPlanExec and the
    * QueryStageExec wrappers are LEAVES whose real plan hangs off a
    * field, not children — a naive collect misses every node below
    * them. Shared here because the recursion is correctness-critical
    * for plan-shape assertions (TopKSpec, ScaleJoinSpec). */
  def collectExec(plan: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    plan.collect {
      case a: AdaptiveSparkPlanExec => collectExec(a.executedPlan)
      case qs: QueryStageExec => qs +: collectExec(qs.plan)
      case p => Seq(p)
    }.flatten
  }
}
