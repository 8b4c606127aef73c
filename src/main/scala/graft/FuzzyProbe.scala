package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level profile of q_join_fuzzy (or any named query): runs the
  * query twice (cold/warm) and prints, per completed stage, the task
  * time, record counts, and shuffle bytes — the decomposition MiniBench
  * can't show. Written for the round-8 masked-blocking rewrite to
  * locate the residual x30 superlinearity (candidate generation vs
  * pair-dedup distinct vs final sort).
  *
  *   tools/run_main.sh graft.FuzzyProbe /root/repo/scaledata/x30 q_join_fuzzy
  */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = if (args.length > 1) args(1) else "q_join_fuzzy"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = mutable.ArrayBuffer.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages += f"stage ${si.stageId}%3d ${si.name.take(60)}%-60s " +
          f"tasks=${si.numTasks}%3d exec=${m.executorRunTime / 1e3}%8.1fs " +
          f"in=${m.inputMetrics.recordsRead}%10d " +
          f"shR=${m.shuffleReadMetrics.recordsRead}%10d " +
          f"shW=${m.shuffleWriteMetrics.recordsWritten}%10d " +
          f"spill=${m.diskBytesSpilled / 1e6}%6.0fMB"
        ()
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to 2).foreach { run =>
      stages.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"== $name run$run: ${t}%.2f s, $n rows")
      stages.foreach(println)
    }
    spark.stop()
  }
}
