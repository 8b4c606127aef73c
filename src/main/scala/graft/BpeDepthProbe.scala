package graft

import org.apache.spark.sql.SparkSession

/** Scale rehearsal for the round-13 lead item: sequential vs merge-
  * batched BPE training at tokenizer-depth merge counts (>= 128) on
  * the scaledata corpora. Isolates TRAINING depth from the one-time
  * corpus scan by materializing bpeWords (cached) before either timer
  * starts, asserts the two merge tables are IDENTICAL, and reports
  * supersteps + wall seconds for each. Findings land in BASELINE.md.
  *
  * Usage: tools/run_main.sh graft.BpeDepthProbe <sfDir> <nMerges> [seq|batched|both]
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
      val words = ops.Text.bpeWords(Tables.documents(spark, dir))
      val t0 = System.nanoTime()
      val nWords = words.count()
      val scanS = (System.nanoTime() - t0) / 1e9
      println(f"[bpe-depth] corpus=$dir vocab=$nWords%d scan=$scanS%.1fs merges=$nMerges%d")

      var seqMerges: Seq[ops.Text.BpeMerge] = null
      if (mode != "batched") {
        val t1 = System.nanoTime()
        seqMerges = ops.Text.bpeTrain(words, nMerges)
        val s = (System.nanoTime() - t1) / 1e9
        println(f"[bpe-depth] sequential: ${seqMerges.size}%d merges, ${seqMerges.size}%d supersteps, $s%.1fs")
      }
      if (mode != "seq") {
        val t2 = System.nanoTime()
        val (batched, steps) = ops.Text.bpeTrainBatched(words, nMerges)
        val s = (System.nanoTime() - t2) / 1e9
        println(f"[bpe-depth] batched:    ${batched.size}%d merges, $steps%d supersteps, $s%.1fs")
        if (seqMerges != null) {
          println(s"[bpe-depth] equal=${batched == seqMerges}")
          if (batched != seqMerges) {
            batched.zip(seqMerges).find { case (a, b) => a != b }.foreach {
              case (a, b) =>
                println(s"[bpe-depth] FIRST DIVERGENCE at step ${b.step}:")
                println(s"[bpe-depth]   sequential: $b")
                println(s"[bpe-depth]   batched:    $a")
            }
          }
        }
      }
    } finally spark.stop()
  }
}
