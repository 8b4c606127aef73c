package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between
  * dedup and tokenization: deterministic stratified sampling and
  * concat-and-chunk sequence packing. Both are pure DataFrame plans
  * keyed on the stratum column — each stratum's rows shuffle once into
  * its window partition.
  *
  * Determinism contract (shared with the DuckDB oracle): "random" order
  * inside a stratum is the md5 hex digest of the id rendered as a
  * string — portable across engines (same digest, same lowercase hex,
  * same string comparison), uniform-ish, and stable across runs, which
  * is what a reproducible training mixture needs. No RNG state, no
  * seed plumbing.
  */
object Sampling {

  /** Exactly n rows per stratum, chosen by md5(id) order (ties broken
    * by id). The rank-based form is exact-n; at extreme stratum skew
    * (one stratum ≫ a reducer) switch to threshold sampling — filter on
    * the digest prefix, binomial-not-exact counts, zero shuffles — the
    * standard trade, documented here rather than silently made. */
  def stratifiedTopN(df: DataFrame, strataCol: String, idCol: String,
      n: Int): DataFrame = {
    require(n >= 1)
    val ord = md5(col(idCol).cast("string").cast("binary"))
    val w = Window.partitionBy(col(strataCol)).orderBy(ord, col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
  }

  /** Mixture sampling: exactly allocation(stratum) rows per stratum, in
    * the same portable md5 order as [[stratifiedTopN]]. The allocation
    * is a PARAMETER (weights × budget resolved to integer counts by the
    * caller — pure constant arithmetic, no data dependence), joined in
    * as a broadcast literal table; strata absent from the allocation
    * contribute nothing. This is the data-mixing step of a training
    * pipeline: "40% en, 15% each of de/es/fr/zh" becomes per-stratum
    * ranks ≤ n_i. Same scale shape and skew caveat as stratifiedTopN. */
  def mixtureSample(df: DataFrame, strataCol: String, idCol: String,
      allocation: Map[String, Int]): DataFrame = {
    require(allocation.nonEmpty && allocation.values.forall(_ >= 0))
    val spark = df.sparkSession
    import spark.implicits._
    val alloc = allocation.toSeq.sortBy(_._1).toDF("__stratum", "__quota")
    val ord = md5(col(idCol).cast("string").cast("binary"))
    val w = Window.partitionBy(col(strataCol)).orderBy(ord, col(idCol))
    df.join(broadcast(alloc), col(strataCol) === col("__stratum"))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= col("__quota"))
      .drop("__stratum", "__quota")
  }

  /** Weighted sampling without replacement by SEQUENTIAL POISSON
    * sampling (Ohlsson 1998): each row gets a deterministic uniform
    * u = int(md5(id)[0:13 hex]) / 2^52 ∈ [0, 1), a priority
    * xi = u / w, and the sample is the k smallest xi (ties broken by
    * id) — inclusion probability approximately proportional to the
    * weight, the standard πps workhorse for weight-aware corpus
    * subsampling (upweight high-quality docs, downweight boilerplate).
    * Everything is EXACT portable arithmetic — md5 digest, one hex
    * parse, two IEEE divisions (correctly rounded, bit-identical in
    * any engine) — so the draw reproduces anywhere, unlike rand()-
    * seeded samples that depend on partitioning. Scale shape:
    * per-row expressions + one top-k (TakeOrderedAndProject — a k-row
    * heap per partition, a k·partitions-row single exchange; never a
    * full sort). Weights must be strictly positive: w ≤ 0 rows are
    * excluded (xi would be infinite/negative — documented, and the
    * filter keeps the division total). */
  def sequentialPoisson(df: DataFrame, idCol: String, weightCol: Column,
      k: Int): DataFrame = {
    require(k >= 1)
    val u = conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 13),
      16, 10).cast("double") / lit(4503599627370496.0d) // 2^52
    df.withColumn("w", weightCol.cast("long"))
      .filter(col("w") > 0)
      .withColumn("xi", u / col("w"))
      .orderBy(col("xi"), col(idCol))
      .limit(k)
  }

  /** Concat-and-chunk sequence packing: within each key, documents are
    * concatenated in id order and split into chunks of targetTokens —
    * chunk = floor(tokens-before-this-doc / targetTokens), the standard
    * LLM-pretraining packing layout (a doc whose tokens straddle a
    * boundary belongs to the chunk it starts in). Emits one row per
    * (key, chunk): doc count, token sum, first/last doc id.
    *
    * Scale: one window shuffle per key partition. Packing a 100 TB
    * corpus runs this per shard/key (as here, per language) — a single
    * global ordering would serialize into one reducer and is
    * deliberately not offered. */
  def packChunks(df: DataFrame, keyCol: String, idCol: String,
      tokensCol: String, targetTokens: Int): DataFrame = {
    require(targetTokens >= 1)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__before", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("chunk_id", floor(col("__before") / targetTokens))
      .groupBy(col(keyCol), col("chunk_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).cast("long").as("sum_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))
  }

  /** Leakage-safe train/val/test split — the contamination guard a
    * training pipeline runs before any split: near-duplicate CLUSTER
    * members must land in the SAME split, or val/test leak training
    * text. Assignment is a pure function of the cluster's canonical id
    * (minhash pairs → [[Dedup.clusterPairs]] transitive closure;
    * singletons are their own canonical), bucketed on the first hex
    * char of md5(canonical): '0'–'b' → train (12/16), 'c'–'d' → val,
    * 'e'–'f' → test — deterministic, engine-portable (same md5 hex in
    * DuckDB), and stable under corpus growth (a doc's split never
    * depends on other clusters). By construction no cluster spans
    * splits; SamplingSpec pins that property on the real pair relation
    * rather than trusting the construction. 100 TB shape: the split
    * itself adds ONE left join against the cluster map (pairs-sized,
    * usually broadcastable) and a per-row hash — the dedup pass it
    * rides on is the already-measured minhash topology.
    *
    * Output schema is STABLE: exactly (idCol, canon, split) — only the
    * id column is carried from the input (the assignment is a pure
    * function of it; callers keeping other columns join the result
    * back on idCol). Internal helper columns never escape. */
  def splitLeakageSafe(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val canon = Dedup.clusterPairs(
      Dedup.minhashLsh(docs, idCol, textCol), "a_id", "b_id")
      .withColumnRenamed("doc_id", "__cid")
    docs.select(col(idCol))
      .join(canon, col(idCol) === col("__cid"), "left")
      .withColumn("canon", coalesce(col("canonical_doc"), col(idCol)))
      .withColumn("__h", substring(md5(col("canon").cast("string")), 1, 1))
      .withColumn("split",
        when(col("__h") <= "b", "train")
          .when(col("__h") <= "d", "val")
          .otherwise("test"))
      .select(col(idCol), col("canon"), col("split"))
  }
}
