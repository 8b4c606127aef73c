package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ground-truth recall measurement for the MinHash/LSH scale path,
  * runnable only on ScaleGen dirs (it derives the planted-duplicate
  * pairs from the generator's seed-redirection rules, ScaleGen.scala):
  *
  *   exact dups: doc_id % 250 == 0 && doc_id > 123  → twin = id − 123
  *   near dups:  doc_id %  97 == 0 && doc_id >  41 && !exact
  *               → twin = id − 41, text + one appended word
  *
  * The scaling-ratio table proves banding cost stays linear under the
  * occupancy cap; THIS probe proves the cap keeps the answer: of the
  * planted pairs whose exact 3-shingle Jaccard clears the graded
  * threshold (0.8 — short near-dup texts legitimately fall below it),
  * what fraction does q_dedup_minhash's exact-verified banding emit?
  * Expected: 1.0 at every scale (banding miss probability at J ≥ 0.8
  * is ≤ 2e-4 per pair; the cap only drops buckets that boilerplate
  * cliques over-occupy, and ScaleGen's scaled vocabulary plants none).
  * Any sub-threshold planted pair in the output would be a PRECISION
  * bug (the verify join is exact), reported separately as fp_below.
  *
  * A simhash twin (round 7) asks the same question for the graded
  * 4×16-bit chunk configuration: of the planted pairs whose pairwise
  * signature hamming is ≤ 3, what fraction does the banded+capped
  * simhash path emit? (Pigeonhole makes banding exhaustive at this
  * config; any miss is cap-induced.)
  *
  * Usage: runMain graft.RecallProbe <scaleGenDir>
  * Output: one JSON line {planted_exact, found_exact, planted_near_ge08,
  * found_near_ge08, fp_below, recall_exact, recall_near,
  * simhash_planted_ham_le3, simhash_found, recall_simhash}.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: RecallProbe <scaleGenDir>")
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir)
    val id = col("doc_id")
    val isExact = id % 250 === 0 && id > 123
    val isNear = id % 97 === 0 && id > 41 && !isExact
    val planted = docs
      .filter(isExact || isNear)
      .select(
        when(isExact, id - 123).otherwise(id - 41).as("a_id"),
        id.as("b_id"),
        isExact.as("is_exact"))

    // exact 3-shingle Jaccard of each planted pair, computed
    // independently of the minhash pipeline (ground truth, not the
    // system under test): J = |A∩B| / |A∪B| over distinct shingles.
    // Texts shorter than 3 words get an EMPTY set — mirroring the
    // pipeline's shingles() guard — so a short-text planted pair scores
    // j = 0 (counted in planted_below) rather than j = 1 on a single
    // truncated shingle, which would register an ineligible miss.
    def shingleSet(c: String): org.apache.spark.sql.Column = expr(
      s"CASE WHEN size(split($c, ' ')) < 3 THEN array() " +
        s"ELSE array_distinct(transform(sequence(0, size(split($c, ' ')) - 3), " +
        s"i -> concat_ws(' ', slice(split($c, ' '), i + 1, 3)))) END")
    val withJ = planted
      .join(docs.select(id.as("a_id"), col("text").as("ta")), "a_id")
      .join(docs.select(id.as("b_id"), col("text").as("tb")), "b_id")
      .withColumn("j_union", size(array_union(shingleSet("ta"), shingleSet("tb"))))
      .withColumn("j", when(col("j_union") === 0, lit(0.0)).otherwise(
        size(array_intersect(shingleSet("ta"), shingleSet("tb"))).cast("double") / col("j_union")))
      .select("a_id", "b_id", "is_exact", "j")
      .cache()

    val found = api.Dedup.minhashLsh(docs, "doc_id", "text",
        n = 3, bands = 16, rowsPerBand = 4, threshold = 0.8)
      .select(col("a_id"), col("b_id"), lit(true).as("emitted"))

    val joined = withJ.join(found, Seq("a_id", "b_id"), "left")
      .select(col("is_exact"), col("j"), coalesce(col("emitted"), lit(false)).as("emitted"))
      .cache()
    // ground truth gates on the ACTUAL stored-text Jaccard, not the id
    // rule alone: ScaleGen documents "rare cross-rule hits" where the
    // twin row was itself redirected, so the stored texts differ and
    // the pair legitimately falls below threshold (measured at x1:
    // 4 of 399 exact-rule pairs, all with j < 0.8). Those are counted
    // in planted_below, not against recall.
    val exactEligible = joined.filter(col("is_exact") && col("j") >= 0.8)
    val exactTotal = exactEligible.count()
    val exactFound = exactEligible.filter(col("emitted")).count()
    val plantedBelow = joined.filter(col("j") < 0.8).count()
    val nearEligible = joined.filter(!col("is_exact") && col("j") >= 0.8)
    val nearTotal = nearEligible.count()
    val nearFound = nearEligible.filter(col("emitted")).count()
    val fpBelow = joined.filter(col("j") < 0.8 && col("emitted")).count()

    // ---- simhash twin (§17.3's question for the round-7 graded
    // config): of the planted pairs whose GROUND-TRUTH signature
    // hamming is ≤ 3 (signatures shared with the pipeline —
    // deterministic, oracle-pinned — but the hamming here is a direct
    // pairwise join, independent of banding), what fraction does the
    // banded+capped simhash path emit? With 4×16-bit chunks the
    // pigeonhole guarantees every hamming ≤ 3 pair shares an intact
    // chunk, so any miss is cap-induced — expected 0 on ScaleGen's
    // scaled-vocabulary corpus at every x.
    val sigs = api.Dedup.simhashSignatures(docs, "doc_id", "text", n = 3)
    val pairHamming = planted.select("a_id", "b_id")
      .join(sigs.select(col("doc_id").as("a_id"), col("sig").as("sig_a")), "a_id")
      .join(sigs.select(col("doc_id").as("b_id"), col("sig").as("sig_b")), "b_id")
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
      .select("a_id", "b_id", "hamming")
    val shFound = api.Dedup.simhash(docs, "doc_id", "text", n = 3, maxHamming = 3)
      .select(col("a_id"), col("b_id"), lit(true).as("sh_emitted"))
    val shJoined = pairHamming.join(shFound, Seq("a_id", "b_id"), "left")
      .select(col("hamming"), coalesce(col("sh_emitted"), lit(false)).as("sh_emitted"))
      .cache()
    val shEligible = shJoined.filter(col("hamming") <= 3)
    val shTotal = shEligible.count()
    val shFoundN = shEligible.filter(col("sh_emitted")).count()

    def ratio(n: Long, d: Long): String =
      if (d == 0) "null" else String.format(java.util.Locale.ROOT, "%.4f", Double.box(n.toDouble / d))
    println(s"""{"planted_exact_ge08":$exactTotal,"found_exact":$exactFound,""" +
      s""""planted_near_ge08":$nearTotal,"found_near_ge08":$nearFound,""" +
      s""""planted_below_thresh":$plantedBelow,"fp_below":$fpBelow,""" +
      s""""recall_exact":${ratio(exactFound, exactTotal)},""" +
      s""""recall_near":${ratio(nearFound, nearTotal)},""" +
      s""""simhash_planted_ham_le3":$shTotal,"simhash_found":$shFoundN,""" +
      s""""recall_simhash":${ratio(shFoundN, shTotal)},"dir":"$dir"}""")
    spark.stop()
  }
}
