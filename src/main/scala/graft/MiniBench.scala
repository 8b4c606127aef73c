package graft
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Subset bench for iterating on individual queries: times BOTH runs of
  * each named query (where graft.Bench reports only the best) with
  * per-run job counts, so cold-vs-warm behavior — the thing the
  * ResultCache/plan-cache work optimizes — is directly visible.
  *
  *   sbt "runMain graft.MiniBench q_dedup_semantic q_quality_audit"
  *
  * Same session config and clearCache-between-queries discipline as
  * graft.Bench; SPARK_GRAFT_SF_DIR selects the scale (default sf0.1).
  */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    // SPARK_GRAFT_MASTER: the local-cluster rehearsal hook — e.g.
    // "local-cluster[2,8,3072]" spawns 2 REAL executor JVMs (8 cores /
    // 3 GB each) behind Spark's standalone scheduler, so exchanges are
    // genuinely serialized over the wire and executor heaps are
    // isolated, unlike local[N]'s shared-JVM shortcut. Executor JVMs
    // need SPARK_HOME (jar dir), spark.executor.extraClassPath for the
    // graft classes and the JDK17 --add-opens flags — see
    // tools/local_cluster_bench.sh for the working recipe.
    val builder = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // reset the Java serialization handle table after EVERY object:
      // the disk leg of big caches writes fat columnar batches through
      // one ObjectOutputStream, and the default reset-every-100 retains
      // ~100 batches (~GBs) per task — the x100/8g text-cache OOM
      .config("spark.serializer.objectStreamReset", "1")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // let AQE coalesce CACHED-plan output partitioning too (round-16,
      // guide §2.2 "fewer, larger"): default-off, which pins every
      // in-query .cache()'d relation at the raw shuffle partition count,
      // so each of its consumers pays one task per shuffle partition
      // regardless of data size (measured: q_rfm_approx warm 1.15 -> 0.72 s,
      // 9 -> 6 jobs; the dedup-family IMR consumers shed tasks the same
      // way). Scale-adaptive by construction - AQE sizes partitions from
      // bytes, not from a tuned constant.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
    // same override hook as Verify: "k=v;k=v" applied after defaults —
    // the x100 rehearsal sizes shuffle.partitions to the data (the
    // fixed 32 is the graded sf0.1 setting, not a law of nature)
    sys.env.get("SPARK_GRAFT_EXTRA_CONFS").foreach(_.split(";")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobCount = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobCount.incrementAndGet(); () }
    })
    val busWait: () => Unit =
      try {
        val bus = spark.sparkContext.getClass.getMethod("listenerBus").invoke(spark.sparkContext)
        val m = bus.getClass.getMethod("waitUntilEmpty")
        () => { m.invoke(bus); () }
      } catch { case _: Throwable => () => () }
    def drained(): Int = {
      busWait(); var prev = -1; var cur = jobCount.get()
      while (cur != prev) { Thread.sleep(20); prev = cur; cur = jobCount.get() }
      cur
    }
    // warmup similar to Bench. SPARK_GRAFT_NO_WARMUP=1 skips it: at the
    // x100 rehearsal the minhash warmup is itself a 10M-doc dedup pass
    // that dwarfs (and contends with) the query being measured — solo
    // cold numbers there want a bare fresh JVM.
    if (!sys.env.get("SPARK_GRAFT_NO_WARMUP").contains("1"))
      Seq("q_agg_groupby", "q_dedup_minhash").foreach { q =>
        try SparkEntry.queries(q)(spark, sfDir).count() catch { case _: Throwable => () }
      }
    spark.catalog.clearCache(); System.gc(); Thread.sleep(300)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { run =>
        val j0 = drained(); val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"MINI $name run$run ${t}%.3f s jobs=${drained() - j0}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
