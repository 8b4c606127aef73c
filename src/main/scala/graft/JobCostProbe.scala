package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (guide §1): the per-JOB fixed cost of this host/session —
  * times bare 1-task jobs, a 2-exchange aggregate query with AQE on and
  * off, and a parquet-scan aggregate, 10 reps each after warmup. This
  * sizes the floor under the 175-query bench tail: if a rep costs
  * ~N × job-latency, per-query work below that is noise, not signal. */
object JobCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def bench(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach(_ => f) // warm
      val t0 = System.nanoTime()
      (1 to 10).foreach(_ => f)
      println(f"JOBCOST $name ${(System.nanoTime() - t0) / 1e10}%.4f s/rep")
    }
    bench("empty-job-1task")(spark.sparkContext.parallelize(1 to 1, 1).count())
    bench("empty-job-32task")(spark.sparkContext.parallelize(1 to 32, 32).count())
    bench("range-count")(spark.range(1000).count())
    val small = spark.range(200).select(($"id" % 7).as("k"), $"id".as("v"))
    bench("agg-sort-aqe-on")(
      small.groupBy($"k").agg(sum($"v").as("s")).orderBy($"k").count())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    bench("agg-sort-aqe-off")(
      small.groupBy($"k").agg(sum($"v").as("s")).orderBy($"k").count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val li = Tables.lineitem(spark, sfDir)
    bench("parquet-agg-aqe-on")(
      li.groupBy($"l_returnflag").agg(sum($"l_quantity")).count())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    bench("parquet-agg-aqe-off")(
      li.groupBy($"l_returnflag").agg(sum($"l_quantity")).count())
    spark.stop()
  }
}
