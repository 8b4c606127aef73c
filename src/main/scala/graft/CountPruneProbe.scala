package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: which graded queries lose a LEAF relation when consumed
  * through `.count()` — the Bench metric? A leaf that survives the
  * query's own optimized plan but disappears from the count plan means
  * the benchmark times a plan with part of the operator optimized out
  * (the q_stream_simhash_dedup finding, generalized: unique-keyed
  * outer joins and Distinct-over-left-keys both qualify).
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

    def leafSigs(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] =
      plan.collectLeaves().map { l => l.nodeName + ":" + (l match {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.mkString(",")
            case other => other.toString.take(60)
          }
        case other => other.schema.fieldNames.take(4).mkString(",")
      }) }

    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val qLeaves = leafSigs(df.queryExecution.optimizedPlan)
        val cLeaves = leafSigs(df.groupBy().count().queryExecution.optimizedPlan)
        // multiset compare: a leaf type+source that appears more times in
        // the query plan than in the count plan was pruned
        val missing = qLeaves.groupBy(identity).flatMap { case (k, v) =>
          val c = cLeaves.count(_ == k)
          if (c < v.size) Seq(s"$k (x${v.size} -> x$c)") else Nil
        }
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
