package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev probe (guide §1): split a query's wall time into driver-side
  * plan work vs execution, with task-time totals from the listener.
  *
  *   sbt "runMain graft.ProfileProbe q_dedup_embed q_sim_pairs"
  *
  * Per run it prints: build (fn call), analyze (analyzed plan force),
  * plan (executedPlan force), exec (count minus the above), jobs,
  * stages, tasks, task-time sum. Driver-heavy queries show up as
  * build+analyze+plan >> exec-with-low-task-time; executor-bound ones
  * as task-time ≈ exec × cores. Bench session config, two runs per
  * query with no cache clear between (the bench's warm semantics).
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
        ()
      }
    })
    val busWait: () => Unit =
      try {
        val bus = spark.sparkContext.getClass.getMethod("listenerBus").invoke(spark.sparkContext)
        val m = bus.getClass.getMethod("waitUntilEmpty")
        () => { m.invoke(bus); () }
      } catch { case _: Throwable => () => () }
    def snap(): (Int, Int, Int, Long) = {
      busWait()
      var prev = (-1, -1, -1, -1L)
      var cur = (jobs.get(), stages.get(), tasks.get(), taskMs.get())
      while (cur != prev) { Thread.sleep(20); prev = cur
        cur = (jobs.get(), stages.get(), tasks.get(), taskMs.get()) }
      cur
    }
    // q_funnel_tws warms the batch transformWithState path: the FIRST
    // tws query in a session races RocksDB's snapshot-upload report
    // against StateStoreCoordinator endpoint creation and can fail with
    // CANNOT_LOAD_STATE_STORE (q_stream_simhash_dedup alone reproduces
    // it; Bench dodges it only because alphabetical order runs
    // q_funnel_tws first)
    if (!sys.env.get("SPARK_GRAFT_NO_WARMUP").contains("1"))
      Seq("q_agg_groupby", "q_dedup_minhash", "q_funnel_tws").foreach { q =>
        try SparkEntry.queries(q)(spark, sfDir).count() catch { case _: Throwable => () }
      }
    spark.catalog.clearCache(); System.gc(); Thread.sleep(300)
    args.toSeq.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { run =>
        val s0 = snap()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.analyzed
        val t2 = System.nanoTime()
        // optimizedPlan, NOT executedPlan: physical planning of a batch
        // transformWithState subtree allocates state-store info that the
        // count()'s own execution then trips over (CANNOT_LOAD_STATE_STORE)
        df.queryExecution.optimizedPlan
        val t3 = System.nanoTime()
        df.count()
        val t4 = System.nanoTime()
        val s1 = snap()
        def s(a: Long, b: Long) = f"${(b - a) / 1e9}%.3f"
        println(s"PROF $name run$run total=${s(t0, t4)} build=${s(t0, t1)} " +
          s"analyze=${s(t1, t2)} plan=${s(t2, t3)} exec=${s(t3, t4)} " +
          s"jobs=${s1._1 - s0._1} stages=${s1._2 - s0._2} tasks=${s1._3 - s0._3} " +
          s"taskSec=${(s1._4 - s0._4) / 1e3}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
