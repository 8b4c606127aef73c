package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the round-12 operators at rehearsal scale: prints the
  * streaming-simhash-dedup verdict distribution (cross-checked against
  * the q_dedup_simhash pair relation's dup side on the same dir) and
  * the paragraph-dedup excision totals. Not part of the graded surface.
  *
  *   tools/run_main.sh graft.SdProbe /root/repo/scaledata/x10 [simhash|para|paraSep]
  */
object SdProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = if (args.length > 1) args(1) else "simhash"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer.objectStreamReset", "1")
      .config("spark.ui.enabled", "false")
      .appName("graft-sdprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    mode match {
      case "simhash" =>
        // the Bench metric is .count(): time it FIRST on the cold cache,
        // then the verdict materialization — a big gap means count()
        // still prunes part of the kernel
        val n = timed("tws_count") {
          ops.Streaming.simhashDedupBatchTws(spark, dir).count()
        }
        println(s"PROBE count=$n")
        spark.catalog.clearCache()
        val verdicts = timed("tws_verdicts") {
          ops.Streaming.simhashDedupBatchTws(spark, dir)
            .groupBy($"is_dup").count().collect()
            .map(r => r.getInt(0) -> r.getLong(1)).toMap
        }
        println(s"PROBE verdicts=$verdicts")
        // cross-check: the pair relation's distinct b side = the docs
        // flagged 1 (uncapped banding both sides at this scale or not —
        // a cap-dropped bucket would show here as a diff)
        val dupSide = timed("pair_dup_side") {
          api.Dedup.simhash(Tables.documents(spark, dir), "doc_id", "text",
              n = 3, maxHamming = 3, maxChunkOccupancy = Int.MaxValue)
            .select($"b_id").distinct().count()
        }
        println(s"PROBE pair_b_side=$dupSide tws_flagged=${verdicts.getOrElse(1, 0L)} " +
          s"agree=${dupSide == verdicts.getOrElse(1, 0L)}")
      case "para" =>
        val agg = timed("dedup_para") {
          ops.Text.textDedupPara(spark, dir)
            .agg(sum($"n_kept"), sum($"n_dropped")).collect()(0)
        }
        println(s"PROBE para kept=${agg.getLong(0)} dropped=${agg.getLong(1)}")
      case "paraSep" =>
        val agg = timed("dedup_para_sep") {
          ops.Text.dedupParagraphs(
            ops.Text.paragraphViewSep(Tables.documents(spark, dir), "<p>"))
            .agg(sum($"n_kept"), sum($"n_dropped")).collect()(0)
        }
        println(s"PROBE paraSep kept=${agg.getLong(0)} dropped=${agg.getLong(1)}")
      case "trimParaSep" =>
        // round-13: paragraph-granularity TRIM over the corpus' own
        // separator paragraphs (the graded fixed-width twin is
        // q_text_trim_para; this is the natural-structure front end)
        val agg = timed("trim_para_sep") {
          ops.Text.dedupTrimParagraphsSep(Tables.documents(spark, dir), 8, "<p>")
            .agg(sum($"n_segments"), count(lit(1)),
              sum(when($"n_segments" === 0, 1L).otherwise(0L))).collect()(0)
        }
        println(s"PROBE trimParaSep segments=${agg.getLong(0)} docs=${agg.getLong(1)} " +
          s"fully_excised=${agg.getLong(2)}")
      case "trimParaSepTwice" =>
        // idempotence AT SCALE: pass 2 over pass 1's surviving docs
        // must reproduce every document verbatim
        val trimmedOnce = ops.Text.dedupTrimParagraphsSep(
            Tables.documents(spark, dir), 8, "<p>")
          .filter(length($"text") > 0).select($"doc_id", $"text")
        val diff = timed("trim_para_sep_twice") {
          ops.Text.dedupTrimParagraphsSep(trimmedOnce, 8, "<p>")
            .select($"doc_id", $"text".as("t2"))
            .join(trimmedOnce, "doc_id")
            .filter($"t2" =!= $"text").count()
        }
        println(s"PROBE trimParaSepTwice changed_docs=$diff idempotent=${diff == 0L}")
      case "paraSepTwice" =>
        // the idempotence property AT SCALE: a second separator-
        // reconstructing pass over the first pass's output must excise
        // NOTHING (spec-pinned on toys; this proves it on the full
        // rehearsal corpus)
        val once = ops.Text.dedupParagraphsSep(Tables.documents(spark, dir), "<p>")
          .select($"doc_id", $"text")
        val agg = timed("dedup_para_sep_twice") {
          ops.Text.dedupParagraphsSep(once, "<p>")
            .agg(sum($"n_kept"), sum($"n_dropped")).collect()(0)
        }
        println(s"PROBE paraSepTwice kept=${agg.getLong(0)} dropped=${agg.getLong(1)} " +
          s"idempotent=${agg.getLong(1) == 0L}")
    }
    spark.stop()
  }
}
