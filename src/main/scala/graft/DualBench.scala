package graft

import org.apache.spark.sql.SparkSession

/** Dual-reading bench bridge (round-12 verdict item 5 / SURVEY §21
  * forward note 2): for every graded query, time the bench's
  * count()-shaped consumer AND a fully-materializing consumer (the
  * `noop` DSv2 writer — every row is produced and shipped to the sink,
  * nothing is written) side by side in one session, warm protocol
  * (best of two per consumer, count first). The per-query
  * full_s / count_s ratio is the EMPIRICAL bound on what count-shape
  * pruning hides — the one-time artifact that contextualizes the
  * round-over-round count-based series, with special interest in the
  * CountPruneSpec adjudicated rows. One JSON line to stdout and
  * DUALBENCH.json; NOT a graded artifact and not run per-round (the
  * bench metric itself is unchanged, keeping the series comparable).
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_QUERIES (comma subset). */
object DualBench {
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
    spark.sparkContext.setLogLevel("ERROR")
    // the Bench warmup set, for the same reader/codegen reasons
    Seq("q_agg_groupby", "q_fn_json", "q_text_stats", "q_fn_array",
      "q_dedup_minhash", "q_dedup_simhash", "q_agg_groupby")
      .foreach { q =>
        try SparkEntry.queries(q)(spark, sfDir).count()
        catch { case _: Throwable => () }
      }
    spark.catalog.clearCache()
    System.gc(); Thread.sleep(300)

    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = subset match {
      case Some(s) => SparkEntry.queries.filter { case (k, _) => s(k) }
      case None => SparkEntry.queries
    }
    def best2(f: () => Unit): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.min
    val rows = selected.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val countS = best2(() => { fn(spark, sfDir).count(); () })
        val fullS = best2(() =>
          fn(spark, sfDir).write.mode("overwrite").format("noop").save())
        Some((name, countS, fullS))
      } catch {
        case e: Throwable =>
          System.err.println(s"[dualbench] $name failed: ${e.getMessage}")
          None
      } finally {
        spark.catalog.clearCache()
        api.ResultCache.clear()
      }
    }
    def sec(d: Double): String = f"$d%.4f"
    val qs = rows.map { case (n, c, f) =>
      s""""$n":{"count_s":${sec(c)},"full_s":${sec(f)},"ratio":${sec(f / math.max(c, 1e-9))}}"""
    }.mkString("{", ",", "}")
    val cTot = rows.map(_._2).sum
    val fTot = rows.map(_._3).sum
    val line = s"""{"metric":"dual","n_queries":${rows.size},"count_total_s":${sec(cTot)},"full_total_s":${sec(fTot)},"ratio_total":${sec(fTot / math.max(cTot, 1e-9))},"sf":"$sfDir","queries":$qs}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("DUALBENCH.json"),
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(line)
    spark.stop()
  }
}
