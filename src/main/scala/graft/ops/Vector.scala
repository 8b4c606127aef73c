package graft.ops

import graft.Tables
import graft.api.{Clustering, Similarity}
import graft.functions.Udafs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search + vector analytics over the embeddings table
  * (SURVEY.md §2.8), delegating to the reusable graft.api.Similarity
  * operators (once-per-row L2 normalization + the codegen'd
  * DoubleArrayDot per pair). Outputs round to 6 dp (the oracle's
  * accumulation order inside list_cosine_similarity is not
  * bit-identical to a sequential fold).
  */
object Vector {

  /** Brute-force cosine top-10 vs probe vec_id 0 — the exact baseline
    * the ANN variant is measured against. */
  def simKnn(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosineTopK(Tables.embeddings(spark, dir), "vec_id", "embedding",
      probeId = 0L, k = 10, keep = Seq("label"))

  /** All near-pairs with cosine ≥ 0.25, blocked by the sign-LSH sketch
    * bucket (graft.api.Similarity.signLshBuckets: 6 base sign bits,
    * 4-bit refinement to occupancy cap 32, recursively up to 14 levels)
    * — the 100 TB shape: over-cap buckets keep splitting on further
    * sign coords until every bucket fits the cap, so per-block work is
    * BOUNDED and candidate growth stays linear (one refinement level
    * left 3,517-member buckets and ~53M quadratic candidates at the x10
    * rehearsal — round-8 numbers in BASELINE.md). The DuckDB oracle
    * replicates the multi-level bucket arithmetic exactly (sign tests +
    * integer counts), so the output is hash-checked despite the
    * sketch. */
  def simPairs(spark: SparkSession, dir: String): DataFrame =
    Similarity.allPairsSketch(Tables.embeddings(spark, dir), "vec_id", "embedding",
      threshold = 0.25, nBits = 6, extraBits = 4, maxOccupancy = 32, levels = 14)

  /** MMR re-ranking of the dense top-20 vs probe 0 down to a diverse
    * top-10, λ = 0.7 — the retrieval-diversity step between
    * [[simKnn]]'s raw ranking and downstream curation (see
    * [[graft.api.Similarity.mmrTopK]]: integer selection scores
    * 7·c − 3·maxPair over ×10⁶-scaled 6-dp cosines, so the oracle
    * replays every greedy pick exactly). */
  def simMmr(spark: SparkSession, dir: String): DataFrame =
    Similarity.mmrTopK(Tables.embeddings(spark, dir), "vec_id", "embedding",
      probeId = 0L, kCand = 20, kOut = 10)

  /** Per-label centroid via the VecSumAgg typed Aggregator (element-wise
    * double sum, one pass, partial-merge) — output is scalar summaries
    * (first components + norm) so the oracle compare stays array-free. */
  def udafCentroid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .groupBy($"label")
      .agg(Udafs.vecSumCol($"embedding").as("vsum"), count(lit(1)).as("n_vecs"))
      .withColumn("centroid", expr("transform(vsum, v -> v / n_vecs)"))
      .select(
        $"label", $"n_vecs",
        round(element_at($"centroid", 1), 6).as("c1"),
        round(element_at($"centroid", 2), 6).as("c2"),
        round(sqrt(aggregate($"centroid", lit(0.0d), (acc, x) => acc + x * x)), 6)
          .as("centroid_norm"),
      )
      .orderBy($"label")
  }

  /** Embedding-cosine near-dup canonicalization (≥ 0.4 within the
    * sign-LSH sketch bucket, min-vec_id representative) —
    * graft.api.Similarity.nearDupCanonicalSketch with the same bucket
    * parameters (and the same oracle-portability argument) as simPairs. */
  def dedupEmbed(spark: SparkSession, dir: String): DataFrame =
    Similarity.nearDupCanonicalSketch(Tables.embeddings(spark, dir), "vec_id", "embedding",
      threshold = 0.4, nBits = 6, extraBits = 4, maxOccupancy = 32, levels = 14)

  /** Semantic dedup: the transitive closure of the embedding near-dup
    * graph — [[simPairs]]' sign-LSH-blocked exact-cosine pairs at the
    * 0.4 threshold, collapsed to connected components by
    * graft.api.Dedup.clusterPairs (pointer-jumping min-label
    * propagation, the same operator q_dedup_cluster uses on the MinHash
    * graph). Where q_dedup_embed keeps each vector's ONE-HOP
    * neighborhood min, this resolves chains A~B~C where cos(A,C) <
    * threshold to a single canonical id — the semantics a training
    * pipeline needs when near-dup groups overlap. The pair generation
    * reuses the session-cached sketchEmb relation, so the marginal cost
    * over q_sim_pairs is the O(log diameter) label rounds. Oracle:
    * DuckDB replays bucketing + exact cosine, then closes the pair set
    * with recursive SQL. */
  def dedupSemantic(spark: SparkSession, dir: String): DataFrame =
    graft.api.Dedup.clusterPairs(
      Similarity.allPairsSketch(Tables.embeddings(spark, dir), "vec_id", "embedding",
        threshold = 0.4, nBits = 6, extraBits = 4, maxOccupancy = 32, levels = 14),
      "a_id", "b_id")
      .select(col("doc_id").as("vec_id"), col("canonical_doc").as("canonical_vec"))
      .orderBy(col("vec_id"))

  /** Multi-table LSH ANN (8 tables × 4 random-coordinate sign bits) vs
    * probe vec_id 0 — graft.api.Similarity.annLsh for algorithm + scale
    * notes. FULL DuckDB oracle since round 3: the axis-aligned family is
    * pure sign tests, so the oracle replays bucketing + candidate union
    * + exact re-rank bit-for-bit (same upgrade pattern as simhash);
    * ScalaTest additionally asserts recall on a clustered fixture. */
  def annLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.annLsh(Tables.embeddings(spark, dir), "vec_id", "embedding",
      probeId = 0L, k = 10, nTables = 8, nBits = 4, dim = 64)

  /** KNN over the sign-bucket inverted file with Hamming-1 multi-probe
    * (same 6/4/32 bucket parameters as simPairs; 11 probed cells) vs
    * probe vec_id 0 — graft.api.Similarity.annMultiProbe. Fully
    * oracle-checkable: cells, probe set, and re-rank are sign tests +
    * integer arithmetic the DuckDB side replays exactly. */
  def annMultiProbe(spark: SparkSession, dir: String): DataFrame =
    Similarity.annMultiProbe(Tables.embeddings(spark, dir), "vec_id", "embedding",
      probeId = 0L, k = 10, nBits = 6, extraBits = 4, maxOccupancy = 32)

  /** IVF ANN (16 coarse cells from the FIXED-POINT integer Lloyd fit,
    * probe searches top-4 cells) vs probe vec_id 0 —
    * graft.api.Similarity.annIvf. FULL DuckDB oracle since round 15:
    * the quantizer runs in the quantEmb integer lattice (md5-ordered
    * seeds, exact integer distances, floor(mean) updates), so the
    * oracle replays cells + probe set + re-rank term for term — the
    * same upgrade that took the LSH family from rows-only to
    * hash-matched. iters = 2 assignment passes (one Lloyd update):
    * hash-spread seeds start well-mixed, and the fixture recall test
    * holds at this depth; the candidate-set re-rank invariant holds at
    * any iters. */
  def annIvf(spark: SparkSession, dir: String): DataFrame =
    Similarity.annIvf(Tables.embeddings(spark, dir), "vec_id", "embedding",
      probeId = 0L, k = 10, nCells = 16, nProbe = 4, iters = 2)

  /** IVF-PQ ANN (16 integer-k-means cells / probe top-4, 8×16
    * integer-lattice PQ codebooks, ADC top-50 overscan, exact top-10
    * re-rank) vs probe vec_id 0 — graft.api.Similarity.annIvfPq, the
    * full composition of the coarse quantizer and the code scan. FULL
    * DuckDB oracle since round 15 (both quantizers replay exactly —
    * see annIvfPqOracle); the designated ScalaTest keeps asserting
    * output == exact top-k over the ADC-selected candidates plus
    * fixture recall ≥ 0.9. */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame =
    Similarity.annIvfPq(Tables.embeddings(spark, dir), "vec_id", "embedding",
      probeId = 0L, k = 10, nCells = 16, nProbe = 4, iters = 2,
      m = 8, codebookK = 16, pqIters = 3, overscan = 5)

  /** Int8 scalar quantization of the embedding column — the 4×
    * compression step a 100 TB vector store applies before indexing —
    * with its reconstruction-error profile per label. Per-vector
    * affine quantization q = round((x−mn)/scale), scale = (mx−mn)/255:
    * pure per-row array arithmetic, no shuffle before the label
    * aggregate. Oracle-portable by construction: the per-vector mean
    * error is a SEQUENTIAL fold in array order in both engines (Spark
    * `aggregate` HOF ↔ DuckDB list_reduce), every op is deterministic
    * IEEE double arithmetic from the same float32 inputs, and only the
    * per-label avg (≤ corpus/10 values) relies on the 6 dp round. */
  def vecQuantize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .withColumn("dv", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("mn", expr("array_min(dv)"))
      .withColumn("scale", expr("greatest((array_max(dv) - mn) / 255.0d, 1e-30d)"))
      .withColumn("mean_err", expr(
        """aggregate(dv, CAST(0.0 AS DOUBLE),
          |  (a, x) -> a + abs(mn + floor((x - mn) / scale + 0.5d) * scale - x)
          |) / CAST(size(dv) AS DOUBLE)""".stripMargin))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"),
        round(avg($"mean_err"), 6).as("avg_err"),
        round(max($"mean_err"), 9).as("max_err"))
      .orderBy($"label")
  }

  /** Distributed Lloyd's k-means over the embeddings (k = 8, two
    * assignment rounds, seeds = the 8 smallest vec_ids) — the
    * SemDeDup-style corpus-partitioning primitive, via
    * graft.api.Clustering.kmeansAssign. Per-cluster summary: member
    * count, smallest member id, and the EXACT integer inertia (sum of
    * quantized squared distances to the final centroid). Everything is
    * exact integer arithmetic in doubles (quantize → floor(x·1000)), so
    * the DuckDB oracle replays both rounds hash-identically — see the
    * Clustering scaladoc for the engine-exactness argument and the
    * 100 TB shape (broadcast centroid literals + one k-row aggregate
    * per round; driver traffic is the k×dim model only). */
  def vecKmeans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Clustering.kmeansAssign(Tables.embeddings(spark, dir),
        "vec_id", "embedding", k = 8, rounds = 2)
      .groupBy($"cluster")
      .agg(count(lit(1)).as("n_members"),
        min($"vec_id").as("min_vec"),
        sum($"dist").cast("double").as("inertia"))
      .orderBy($"cluster")
  }
}
