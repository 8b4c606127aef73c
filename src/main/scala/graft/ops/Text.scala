package graft.ops

import graft.Tables
import graft.functions.Udafs
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication operators for a training-data pipeline
  * (SURVEY.md §2.8; BASELINE.json north-star). All tokenization is
  * whitespace-based (the corpus is clean single-space text — verified),
  * all ratio math is int/int → double (deterministic, no summation-order
  * issues), and every pipeline is a pure DataFrame plan: at 100 TB each
  * stage is a shuffle on a well-distributed key (token, shingle, band,
  * fingerprint), never a driver-side structure.
  */
object Text {

  /** Stopword list for quality/langid heuristics (subset of corpus vocab). */
  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  private def toks(c: Column): Column = split(c, " ")

  // ===========================================================================
  // analysis
  // ===========================================================================

  /** Corpus statistics per language: doc counts, char/token totals,
    * average token count, distinct sources. */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("n_tokens", size(toks($"text")))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        sum($"n_tokens".cast("long")).as("sum_tokens"),
        (sum($"n_tokens".cast("long")).cast("double") / count(lit(1))).as("avg_tokens"),
        countDistinct($"source").as("n_sources"),
      )
      .orderBy($"lang")
  }

  /** Token frequency top-20 (explode = Spark's Generator/UDTF shape).
    * Scale note: groupBy(token) shuffles one row per token occurrence but
    * partial aggregation collapses each task's counts first — the shuffle
    * carries |vocab| rows per task, not |corpus|. */
  def textTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(explode(toks($"text")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token")
      .limit(20)
  }

  /** Per-document quality scoring: token count, type/token ratio, stopword
    * ratio, average token length, and a composite score. All inputs are
    * integer counts so every division is bit-deterministic. */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = size(toks($"text")).cast("double")
    val nDistinct = size(array_distinct(toks($"text"))).cast("double")
    val nStop = size(filter(toks($"text"), t => t.isin(stopwords.map(lit): _*))).cast("double")
    Tables.documents(spark, dir)
      .select(
        $"doc_id",
        n.cast("int").as("n_tokens"),
        round((nDistinct / n), 6).as("ttr"),
        round((nStop / n), 6).as("stopword_ratio"),
        round(($"n_chars".cast("double") - (n - 1.0)) / n, 6).as("avg_token_len"),
        round(least(n / lit(50.0), lit(1.0)) * 0.4 + (nDistinct / n) * 0.4
          + (lit(1.0) - nStop / n) * 0.2, 6).as("quality"),
      )
      .orderBy($"doc_id")
  }

  /** Language-ID heuristic: stopword-profile density score (the n-gram
    * analogue degenerates on this synthetic corpus, so the profile is a
    * stopword hit rate; the operator shape — per-doc score + argmax
    * label — is what transfers to a real corpus). */
  def textLangId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = size(toks($"text")).cast("double")
    val enHits = size(filter(toks($"text"), t => t.isin(stopwords.map(lit): _*))).cast("double")
    Tables.documents(spark, dir)
      .select(
        $"doc_id", $"lang",
        round(enHits / n, 6).as("en_score"),
        when(enHits / n >= 0.05, "en").otherwise("und").as("predicted_lang"),
      )
      .orderBy($"doc_id")
  }

  /** Document fingerprinting: polynomial rolling hash over characters,
    * mod 1e9+7 — portable (same fold in the oracle), collision-checkable.
    * Output: one row per fingerprint with member count + canonical doc. */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("fp",
        aggregate(split($"text", ""), lit(0L), (acc, c) => (acc * 31 + ascii(c)) % 1000000007L))
      .groupBy($"fp")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("canonical_doc"))
      .orderBy($"fp")
  }

  /** BPE-ish token counting: a regex tokenizer (greedy ≤4-char letter
    * chunks — subword-shaped, unlike the whitespace tokens) counted per
    * language. regexp_extract_all is codegen'd; the pattern is kept in
    * the Java∩RE2 common subset so the oracle tokenizes identically. */
  def textTokensBpe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"lang",
        size(regexp_extract_all($"text", lit("[a-z]{1,4}"), lit(0))).as("n_sub"))
      .groupBy($"lang")
      .agg(
        sum($"n_sub".cast("long")).as("sum_subtokens"),
        (sum($"n_sub".cast("long")).cast("double") / count(lit(1))).as("avg_subtokens"),
      )
      .orderBy($"lang")
  }

  /** Edit-distance text similarity: levenshtein of each document's
    * 40-char prefix against a reference phrase, bucketed. At scale this
    * is the per-row scoring stage of fuzzy matching — O(len²) per row
    * but embarrassingly parallel (no shuffle until the final count). */
  def textEditDist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ref = "the fast key order sort table scan merge"
    Tables.documents(spark, dir)
      .select($"doc_id",
        levenshtein(substring($"text", 1, 40), lit(ref)).as("edit_dist"))
      .withColumn("bucket", floor($"edit_dist" / 5).cast("int"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("min_doc"))
      .orderBy($"bucket")
  }

  // ===========================================================================
  // deduplication
  // ===========================================================================

  /** Exact dedup after normalization (sorted distinct token set): groups
    * of set-identical documents keep the min doc_id as canonical. The
    * groupBy key is the normalized text — one shuffle, no pairwise work. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("norm_key", array_join(array_sort(array_distinct(toks($"text"))), " "))
      .groupBy($"norm_key")
      .agg(min($"doc_id").as("canonical_doc"), count(lit(1)).as("n_members"))
      .select($"canonical_doc", $"n_members")
      .orderBy($"canonical_doc")
  }

  /** Word-3-gram shingle sets per document (distinct). Array indexing in
    * the SQL expr is 0-based; sequence(1, n-2) yields all n-2 windows. */
  private def docShingles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("t", toks($"text"))
      .withColumn("shingles", expr(
        "array_distinct(transform(sequence(1, size(t) - 2), i -> concat_ws(' ', t[i-1], t[i], t[i+1])))"))
      .select($"doc_id", $"shingles")
  }

  /** Exact n-gram Jaccard near-dup pairs via inverted-index join: posting
    * list (shingle → docs), pair counts = intersection size, union from
    * set sizes. Shuffles on the shingle key — at 100 TB the hot shingles
    * are the skew risk; mitigated by the distinct-per-doc postings and a
    * document-frequency cap if needed. Threshold 0.5 (corpus has a clean
    * gap: planted near-dups sit at J ≥ 0.9, background at J ≤ 0.15). */
  def dedupNgram(spark: SparkSession, dir: String): DataFrame =
    jaccardPairs(spark, docShingles(spark, dir), 0.5)

  private def jaccardPairs(spark: SparkSession, shingled: DataFrame, thr: Double): DataFrame = {
    import spark.implicits._
    val post = shingled.select($"doc_id", explode($"shingles").as("sh"))
    val sizes = shingled.select($"doc_id", size($"shingles").as("n"))
    val inter = post.as("a")
      .join(post.as("b"), $"a.sh" === $"b.sh" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select($"doc_id".as("a_id"), $"n".as("n_a")), "a_id")
      .join(sizes.select($"doc_id".as("b_id"), $"n".as("n_b")), "b_id")
      .withColumn("jaccard",
        round($"n_inter".cast("double") / ($"n_a" + $"n_b" - $"n_inter"), 6))
      .filter($"jaccard" >= thr)
      .select($"a_id", $"b_id", $"jaccard")
      .orderBy($"a_id", $"b_id")
  }

  /** MinHash + LSH near-dup detection, with exact-Jaccard verification of
    * candidates — so the *output* is exact (and shares the inverted-index
    * oracle) while the *work* is LSH-bounded:
    *
    *   1. 64 MinHash values per doc: h_i(doc) = min over shingles of
    *      xxhash64(i, shingle); combined in one pass by the ArrayMinAgg
    *      UDAF (map-side partial merge — no 64-row-per-shingle shuffle).
    *   2. 16 bands × 4 rows: band key = hash(4-slice of signature);
    *      docs sharing any (band_idx, band_key) become candidate pairs.
    *      P(miss | J=0.9) = (1-0.9⁴)¹⁶ ≈ 4e-8 — recall is effectively 1.
    *   3. Exact Jaccard on candidates only (array_intersect on the two
    *      shingle sets), keep J ≥ 0.8.
    *
    * At 100 TB: stage 1 shuffles 64 longs/doc, stage 2 shuffles 16
    * (band, doc) rows/doc, stage 3 touches only near-colliding pairs —
    * vs the exact join's sum-over-shingles(df²) blowup. */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shingled = docShingles(spark, dir).cache()
    // 64 hash functions from 32 string hashes: each xxhash64(sh, s)
    // yields two independent 32-bit halves. (A Kirsch-Mitzenmacher
    // h1 + i*h2 family is NOT min-wise independent — the argmin
    // collapses toward shingles where both hashes are small, and
    // measured recall on planted near-dups dropped to 23/25.)
    //
    // The hashes are flat codegen'd columns and the signature is 64
    // codegen'd min() aggregate columns — whole-stage codegen keeps the
    // hot path primitive-typed; the interpreted HOF + array-UDAF
    // formulation of the same math measured ~4× slower (the UDAF shape
    // still wins when the signature width is dynamic — see Udafs).
    val post = shingled.select($"doc_id", explode($"shingles").as("sh"))
    val withH = post.select($"doc_id" +:
      (0 until 32).map(i => xxhash64($"sh", lit(i)).as(s"h$i")): _*)
    val minAggs = (0 until 32).flatMap(i => Seq(
      min(shiftright(col(s"h$i"), 32).bitwiseAND(lit(4294967295L))).as(s"f${2 * i}"),
      min(col(s"h$i").bitwiseAND(lit(4294967295L))).as(s"f${2 * i + 1}")))
    val sigs = withH.groupBy($"doc_id").agg(minAggs.head, minAggs.tail: _*)
      .withColumn("sig", array((0 until 64).map(j => col(s"f$j")): _*))
      .select($"doc_id", $"sig")
    val bands = sigs.select($"doc_id",
      posexplode(expr("transform(sequence(0, 15), b -> hash(slice(sig, b * 4 + 1, 4)))")))
      .toDF("doc_id", "band_idx", "band_key")
    val cand = bands.as("a")
      .join(bands.as("b"),
        $"a.band_idx" === $"b.band_idx" && $"a.band_key" === $"b.band_key" &&
        $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"))
      .distinct()
    cand
      .join(shingled.select($"doc_id".as("a_id"), $"shingles".as("sh_a")), "a_id")
      .join(shingled.select($"doc_id".as("b_id"), $"shingles".as("sh_b")), "b_id")
      .withColumn("n_inter", size(array_intersect($"sh_a", $"sh_b")))
      .withColumn("jaccard", round(
        $"n_inter".cast("double") / (size($"sh_a") + size($"sh_b") - $"n_inter"), 6))
      .filter($"jaccard" >= 0.8)
      .select($"a_id", $"b_id", $"jaccard")
      .orderBy($"a_id", $"b_id")
  }

  /** SimHash near-dup detection: 64-bit signature = sign of per-bit votes
    * (+1/-1 per distinct 3-gram shingle, from the shingle's xxhash64
    * bits); candidate pairs via 8×8-bit chunk banding (pigeonhole:
    * hamming ≤ 7 ⇒ some chunk equal), then exact hamming ≤ 7 filter
    * (J ≈ 0.9 near-dups differ in ~10% of shingles → a few sign flips;
    * unrelated docs sit at hamming ≈ 32). Shingles (not unigrams) carry
    * document identity.
    *
    * The bit votes are 64 codegen'd aggregate columns (sum of bit j;
    * majority ⟺ 2·sum > n) rather than an array-UDAF — whole-stage
    * codegen keeps the hot loop primitive-typed, measured ~3× faster
    * than the interpreted per-row array transform + typed Aggregator.
    * No oracle (xxhash64 is not portable to DuckDB) —
    * planted-near-dup recall asserted in ScalaTest. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docTok = docShingles(spark, dir)
      .select($"doc_id", explode($"shingles").as("token"))
      .withColumn("h", xxhash64($"token"))
    val bitSums = (0 until 64).map(j =>
      sum(shiftright($"h", j).bitwiseAND(lit(1L))).as(s"b$j"))
    val sigs = docTok.groupBy($"doc_id")
      .agg(count(lit(1)).as("n"), bitSums: _*)
      .withColumn("bits", array((0 until 64).map(j =>
        when(col(s"b$j") * 2 > $"n", 1).otherwise(0)): _*))
      .select($"doc_id", $"bits")
      .cache()
    val chunks = sigs.select($"doc_id", posexplode(expr(
      """transform(sequence(0, 7), c ->
        |  aggregate(slice(bits, c * 8 + 1, 8), 0L, (acc, x) -> acc * 2 + x))""".stripMargin)))
      .toDF("doc_id", "chunk_idx", "chunk_key")
    val cand = chunks.as("a")
      .join(chunks.as("b"),
        $"a.chunk_idx" === $"b.chunk_idx" && $"a.chunk_key" === $"b.chunk_key" &&
        $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"))
      .distinct()
    cand
      .join(sigs.select($"doc_id".as("a_id"), $"bits".as("bits_a")), "a_id")
      .join(sigs.select($"doc_id".as("b_id"), $"bits".as("bits_b")), "b_id")
      .withColumn("hamming", expr(
        "aggregate(zip_with(bits_a, bits_b, (x, y) -> CASE WHEN x = y THEN 0 ELSE 1 END), 0, (acc, v) -> acc + v)"))
      .filter($"hamming" <= 7)
      .select($"a_id", $"b_id", $"hamming")
      .orderBy($"a_id", $"b_id")
  }
}
