package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** Concurrent-caller robustness for the operators that memoize
  * filesystem state per JVM (the partitioned-copy cache behind
  * q_scan_partition, the bucketed-table write behind q_join_bucketed).
  * Both publish via write-to-temp + atomic rename (or a synchronized
  * one-time write), so N racing callers must all see a complete,
  * correct copy — this spec actually races them from a cold cache
  * rather than trusting the comment. A multi-tenant Spark driver
  * (thriftserver, notebook server) IS this situation.
  */
class ConcurrencySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def race[T](n: Int)(f: () => T): Seq[T] = {
    val pool = Executors.newFixedThreadPool(n)
    val gate = new CountDownLatch(1)
    try {
      val futs = (1 to n).map { _ =>
        pool.submit(new java.util.concurrent.Callable[T] {
          override def call(): T = { gate.await(); f() }
        })
      }
      gate.countDown()
      futs.map(_.get(300, TimeUnit.SECONDS))
    } finally { pool.shutdownNow(); () }
  }

  test("q_scan_partition: four concurrent cold callers agree and match the plain scan") {
    // fresh cache root via the graft.part.cache.dir SYSTEM PROPERTY —
    // highest precedence in scanPartition's resolution, so all callers
    // start cold and race the copy/validate/rename path even if the
    // GRAFT_PART_CACHE_DIR env var is set, and no process-global state
    // (tmpdir) is touched for other tests.
    //
    // The property is JVM-GLOBAL: this spec assumes ScalaTest's
    // default sequential suite execution (parallelExecution stays off
    // in build.sbt) — a suite running scanPartition concurrently with
    // this block would see the temporary root. The finally RESTORES
    // the prior value rather than clearing, so an externally-set
    // property survives the test either way.
    val fresh = java.nio.file.Files.createTempDirectory("graft_race_part").toString
    val prev = System.getProperty("graft.part.cache.dir")
    System.setProperty("graft.part.cache.dir", fresh)
    try {
      val counts = race(4)(() =>
        graft.ops.Relational.scanPartition(spark, dir).count())
      assert(counts.distinct.size == 1, s"racing callers disagreed: $counts")
      val expected = graft.ops.Relational.scanPartition(spark, dir).count()
      assert(counts.head == expected && expected > 0)
    } finally {
      if (prev == null) System.clearProperty("graft.part.cache.dir")
      else System.setProperty("graft.part.cache.dir", prev)
      ()
    }
  }

  test("q_join_bucketed: concurrent callers share one bucketed write and agree") {
    val rows = race(4)(() =>
      graft.ops.Relational.joinBucketed(spark, dir).collect().toSeq)
    assert(rows.distinct.size == 1, "racing callers returned different results")
    assert(rows.head.nonEmpty)
  }
}
