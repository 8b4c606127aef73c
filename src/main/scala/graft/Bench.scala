package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query at the
  * SPARK_GRAFT_SF_DIR scale factor and prints one JSON line.
  *
  * A warmup pass covering each table family's reader path AND the
  * heavy dedup codegen units runs before timing, then caches are
  * cleared, so the numbers measure steady-state plans from a cold-cache
  * state — not first-query JIT/codegen, parquet-footer reads, or
  * another query's leftover cached relations. Queries are timed in
  * sorted-name order for run-to-run comparability.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // at session build, not as a Tables.events side effect: the flag is
      // session-wide and behavior must not depend on read order
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JIT, codegen cache, and each table family's reader path
    // (the events TIMESTAMP(NANOS) legacy path alone costs ~3s on first
    // touch — without warmup that lands on whichever query happens to
    // read events first and skews its number). The dedup family warms
    // too: its wide flat-column aggregates (64 min/sum columns) are the
    // largest codegen units in the suite and their first compile+JIT
    // otherwise lands in the timed window (measured as a recurring ~5x
    // excursion on q_dedup_simhash in driver runs).
    Seq("q_agg_groupby", "q_fn_json", "q_text_stats", "q_fn_array",
      "q_dedup_minhash", "q_dedup_simhash", "q_agg_groupby")
      .foreach { q =>
        try SparkEntry.queries(q)(spark, sfDir).count()
        catch { case _: Throwable => () }
      }
    // drop caches the warmup populated: timed queries must measure the
    // same cold-cache state the per-query baseline runs measured
    spark.catalog.clearCache()
    // Two timed runs per query, keep the better: one-time costs (codegen
    // compile, reader-path JIT — ~5-8s on cold paths, and the codegen
    // cache evicts entries across ~60 intervening queries) otherwise land
    // on arbitrary queries and dominate the signal at this data size.
    //
    // A FAILED query must be visible and must never flatter the total:
    // it is reported in the "failed" list and carries a 600s penalty in
    // the headline metric (a fast-failing query would otherwise look
    // like a fast success and a regression would IMPROVE the number).
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var ok = true
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => ok = false }
        (System.nanoTime() - t0) / 1e9
      }
      if (!ok) failed += name
      // between queries (not between a query's two runs — run 2 may
      // legitimately reuse run 1's cache): drop cached relations so the
      // ~10 caching dedup/ANN queries don't accumulate storage memory
      // and GC pressure onto whoever runs after them
      spark.catalog.clearCache()
      name -> (times.min + (if (ok) 0.0 else 600.0))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
