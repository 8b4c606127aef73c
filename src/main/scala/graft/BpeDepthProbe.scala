package graft

import org.apache.spark.sql.SparkSession

/** Scale rehearsal for the round-13 lead item: sequential vs merge-
  * batched BPE training at tokenizer-depth merge counts (>= 128) on
  * the scaledata corpora. Isolates TRAINING depth from the one-time
  * corpus scan by materializing bpeWords (cached) before either timer
  * starts, asserts the two merge tables are IDENTICAL, and reports
  * supersteps + wall seconds for each. Findings land in BASELINE.md.
  *
  * Usage: tools/run_main.sh graft.BpeDepthProbe <sfDir> <nMerges> [seq|batched|delta|both|fast] [tokens|bigrams]
  * (fast = batched + delta only — the round-14 A/B at depths where the
  * sequential twin is too slow; equality asserted between whichever ran.
  * wordMode `bigrams` trains on adjacent-token bigrams instead of
  * whitespace tokens — the 3.44M-type vocab regime of the round-14
  * delta-trainer measurement; default `tokens`.)
  */
object BpeDepthProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nMerges = args(1).toInt
    val mode = if (args.length > 2) args(2) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("bpe-depth-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // wordMode "bigrams": one synthetic word per token BIGRAM
      // (hash-sampled 1/8) — a millions-distinct-words vocabulary, the
      // regime where a per-superstep full re-aggregate is vocab-bound
      // and the delta trainer's affected-words-sized update should win;
      // the default "tokens" mode is the graded corpus vocabulary
      val wordMode = if (args.length > 3) args(3) else "tokens"
      val srcDocs = Tables.documents(spark, dir)
      val wordsInput =
        if (wordMode == "bigrams") {
          import org.apache.spark.sql.functions._
          srcDocs.select(split(col("text"), " ").as("t"))
            .select(explode(expr(
              "transform(sequence(1, size(t) - 1), i -> concat(t[i - 1], '_', t[i]))")).as("w"))
            .filter(pmod(xxhash64(col("w")), lit(8)) === 0)
            .select(col("w").as("text"))
        } else srcDocs
      val words = ops.Text.bpeWords(wordsInput)
      val t0 = System.nanoTime()
      val nWords = words.count()
      val scanS = (System.nanoTime() - t0) / 1e9
      println(f"[bpe-depth] corpus=$dir vocab=$nWords%d scan=$scanS%.1fs merges=$nMerges%d")

      var reference: Seq[ops.Text.BpeMerge] = null
      def compare(label: String, got: Seq[ops.Text.BpeMerge]): Unit = {
        if (reference == null) reference = got
        else {
          println(s"[bpe-depth] $label equal=${got == reference}")
          if (got != reference) {
            got.zip(reference).find { case (a, b) => a != b }.foreach {
              case (a, b) =>
                println(s"[bpe-depth] FIRST DIVERGENCE at step ${b.step}:")
                println(s"[bpe-depth]   reference: $b")
                println(s"[bpe-depth]   $label:    $a")
            }
          }
        }
      }
      if (mode == "seq" || mode == "both") {
        val t1 = System.nanoTime()
        val seqMerges = ops.Text.bpeTrain(words, nMerges)
        val s = (System.nanoTime() - t1) / 1e9
        println(f"[bpe-depth] sequential: ${seqMerges.size}%d merges, ${seqMerges.size}%d supersteps, $s%.1fs")
        compare("sequential", seqMerges)
      }
      // SPARK_GRAFT_BPE_PROFILE=1: per-superstep wall seconds, the
      // late-superstep evidence (batched stays flat at full-reaggregate
      // cost; delta falls toward the affected-words floor). Profile
      // lines are summarized as first-10 / last-10 means plus a sparse
      // per-step trace.
      val profile = sys.env.get("SPARK_GRAFT_BPE_PROFILE").contains("1")
      def profiler(label: String): ((Int, Int, Double) => Unit, () => Unit) = {
        if (!profile) (null, () => ())
        else {
          val ts = scala.collection.mutable.ArrayBuffer.empty[Double]
          ((step: Int, bs: Int, s: Double) => {
            ts += s
            if (step <= 3 || step % 10 == 0)
              println(f"[bpe-depth]   $label superstep $step%3d batch=$bs%2d $s%6.2fs")
          }, () => {
            val head = ts.take(10); val tail = ts.takeRight(10)
            println(f"[bpe-depth]   $label mean first-10 ${head.sum / head.size}%.2fs, " +
              f"last-10 ${tail.sum / tail.size}%.2fs")
          })
        }
      }
      if (mode == "batched" || mode == "both" || mode == "fast") {
        val (cb, done) = profiler("batched")
        val t2 = System.nanoTime()
        val (batched, steps) = ops.Text.bpeTrainBatched(words, nMerges, onSuperstep = cb)
        val s = (System.nanoTime() - t2) / 1e9
        println(f"[bpe-depth] batched:    ${batched.size}%d merges, $steps%d supersteps, $s%.1fs")
        done()
        compare("batched", batched)
      }
      if (mode == "delta" || mode == "both" || mode == "fast") {
        val (cb, done) = profiler("delta")
        val t3 = System.nanoTime()
        val (delta, steps) = ops.Text.bpeTrainDelta(words, nMerges, onSuperstep = cb)
        val s = (System.nanoTime() - t3) / 1e9
        println(f"[bpe-depth] delta:      ${delta.size}%d merges, $steps%d supersteps, $s%.1fs")
        done()
        compare("delta", delta)
      }
    } finally spark.stop()
  }
}
