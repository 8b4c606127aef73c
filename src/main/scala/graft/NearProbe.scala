package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off phase profiler for q_text_dedup_para_near's x100 cold path
  * (round-15 verdict item 1): times the pipeline's phases SEPARATELY —
  * paragraph view, signature pass, rep collapse, the mask-ladder pair
  * build, the cluster closure, and then the full query (which at that
  * point reads every cache, isolating the excision + reconstruction
  * tail) — so the cold-cost attribution in BASELINE.md is measured,
  * not inferred. Phases share the session caches on purpose: that is
  * exactly how the real cold run builds them, so the phase sum tracks
  * the solo cold number.
  *
  * Usage: tools/run_main.sh graft.NearProbe <sfDir>
  */
object NearProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer.objectStreamReset", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[near] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    try {
      val docs = Tables.documents(spark, dir)
      val paras = ops.Text.paragraphView(docs, 20)
      val nParas = t("phase 1: paragraph view scan")(paras.count())
      // the EXACT pid expression the kernel uses — the signature cache
      // built here must plan-match phase 5's textDedupParaNear run
      val withPid = paras
        .withColumn("pid", ops.Text.packedPid(col("doc_id"), col("para_idx")))
        .select(col("pid"), col("ptext"))
      val sigs = api.Dedup.simhashSignatures(withPid, "pid", "ptext", n = 3)
      val nSigs = t("phase 2: signature pass (materializes sig cache)")(sigs.count())
      val pairs = t("phase 3: mask-ladder pair build (internal eager count)")(
        api.Dedup.simhashPairsFromSigs(sigs))
      val nPairs = pairs.count()
      val nLabels = t("phase 4: cluster closure")(
        api.Dedup.clusterPairs(pairs, "a_id", "b_id").count())
      val nOut = t("phase 5: full query over warm caches (excision + reconstruction)")(
        ops.Text.textDedupParaNear(spark, dir).count())
      println(s"[near] rows: paras=$nParas sigs=$nSigs pairs=$nPairs " +
        s"labels=$nLabels out=$nOut")
    } finally spark.stop()
  }
}
