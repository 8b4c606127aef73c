package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** tfidf x100 memory-ceiling bisection (round-9, [[MhProbe]] twin).
  * Phases: spread (the repartition exchange alone), runs (the
  * DISK_ONLY run-array persist), dfreq (+ the model aggregate), full.
  * Usage: runMain graft.TfProbe <sfDir> <phase>
  */
object TfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val phase = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // reset the Java serialization handle table after EVERY object:
      // the disk leg of big caches writes fat columnar batches through
      // one ObjectOutputStream, and the default reset-every-100 retains
      // ~100 batches (~GBs) per task — the x100/8g text-cache OOM
      .config("spark.serializer.objectStreamReset", "1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label rows=$n ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val runs = api.Dedup.spread(docs)
      .select($"doc_id",
        org.apache.spark.sql.GraftExpressionBridge.column(
          graft.plans.TokenRunLengths(
            org.apache.spark.sql.GraftExpressionBridge.expression($"text"))).as("rl"))
    phase match {
      case "spread" =>
        timed("spread")(api.Dedup.spread(docs).count())
      case "runsnocache" =>
        timed("runs-nocache")(runs.count())
      case "runs" =>
        timed("runs-disk")(runs.persist(
          org.apache.spark.storage.StorageLevel.DISK_ONLY).count())
      case "dfreq" =>
        val r = runs.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        timed("runs-disk")(r.count())
        val tf = r.select($"doc_id", explode($"rl").as("e"))
          .select($"doc_id", $"e.token".as("token"), $"e.tf".as("tf"))
        timed("dfreq")(tf.groupBy($"token").agg(count(lit(1)).as("df")).count())
      case "full" =>
        timed("full-tfidf")(ops.Text.textTfidf(spark, dir).count())
    }
    spark.stop()
  }
}
