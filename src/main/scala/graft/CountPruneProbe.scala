package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: which graded queries lose a LEAF relation when consumed
  * through `.count()` — the Bench metric? A leaf that survives the
  * query's own optimized plan but disappears from the count plan means
  * the benchmark times a plan with part of the operator optimized out
  * (the q_stream_simhash_dedup finding, generalized: unique-keyed
  * outer joins and Distinct-over-left-keys both qualify). Leaf
  * extraction is shared with the gating CountPruneSpec via
  * [[PlanLeaves]].
  *
  *   tools/run_main.sh graft.CountPruneProbe /root/testdata/sf0.001
  */
object CountPruneProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("graft-countprune").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val missing = PlanLeaves.prunedUnderCount(fn(spark, dir))
        if (missing.nonEmpty) {
          flagged += 1
          println(s"PRUNED $name: ${missing.mkString(" | ")}")
        }
      } catch {
        case e: Throwable => println(s"ERRORED $name: ${e.getClass.getSimpleName}")
      }
      spark.catalog.clearCache()
    }
    println(s"SWEEP_DONE flagged=$flagged of ${SparkEntry.queries.size}")
    spark.stop()
  }
}
