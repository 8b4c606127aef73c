package graft.ops

import graft.Tables
import graft.functions.{Udafs, VectorFunctions => V}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search + vector analytics over the embeddings table
  * (SURVEY.md §2.8). Vector math is double-precision; the per-pair hot
  * path uses the codegen'd DoubleArrayDot expression (graft.plans) on
  * vectors that were L2-normalized ONCE per row — so a similarity join
  * does one tight primitive loop per pair and nothing else. Outputs
  * round to 6 dp (the oracle's accumulation order inside
  * list_cosine_similarity is not bit-identical to a sequential fold).
  */
object Vector {

  /** Embeddings with a unit-norm double-array column (one normalization
    * pass per row; the n² pair stage then never touches norms). */
  private def normalized(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .withColumn("nrm", V.l2Norm($"embedding"))
      .select($"vec_id", $"label",
        transform($"embedding", x => x.cast("double") / $"nrm").as("nemb"))
  }

  /** Brute-force cosine top-k against a probe vector (vec_id 0). The
    * probe is a 1-row broadcast — the big side streams through codegen
    * once, no shuffle until the final top-k (TakeOrderedAndProject).
    * This is the exact baseline the ANN variant is measured against. */
  def simKnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = normalized(spark, dir)
    val probe = emb.filter($"vec_id" === 0L).select($"nemb".as("probe_nemb"))
    emb.crossJoin(broadcast(probe))
      .filter($"vec_id" =!= 0L)
      .select($"vec_id", $"label", round(V.dotFast($"nemb", $"probe_nemb"), 6).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(10)
  }

  /** All-pairs similarity above a threshold, blocked by label: the join
    * is EQUI on label (shuffle both sides on label, pairs only within
    * blocks) — the O(n²) cross product never materializes across blocks.
    * At 100 TB the same shape holds with any bounded-cardinality
    * blocking key (label, LSH bucket, IVF cell). */
  def simPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = normalized(spark, dir)
    emb.as("a")
      .join(emb.as("b"), $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
      .select(
        $"a.vec_id".as("a_id"), $"b.vec_id".as("b_id"), $"a.label".as("label"),
        round(V.dotFast($"a.nemb", $"b.nemb"), 6).as("cos_sim"))
      .filter($"cos_sim" >= 0.25)
      .orderBy($"a_id", $"b_id")
  }

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

  /** Embedding-cosine near-dup dedup: vectors whose cosine ≥ threshold
    * (within a label block) collapse to the min vec_id among their
    * neighborhood (including self) as the canonical representative —
    * the vector-space analogue of dedupExact's groupBy-min. One
    * label-blocked pair join + one groupBy; no transitive closure (a
    * single-pass canonicalization, the standard first stage of
    * embedding dedup at scale). */
  def dedupEmbed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val thr = 0.4
    val emb = normalized(spark, dir)
    val pairs = emb.as("a")
      .join(emb.as("b"), $"a.label" === $"b.label" && $"a.vec_id" =!= $"b.vec_id")
      .select($"a.vec_id".as("vec_id"), $"b.vec_id".as("nbr"),
        V.dotFast($"a.nemb", $"b.nemb").as("cos"))
      .filter(round($"cos", 6) >= thr)
      .select($"vec_id", $"nbr")
    val withSelf = emb.select($"vec_id", $"vec_id".as("nbr")).unionByName(pairs)
    withSelf
      .groupBy($"vec_id")
      .agg(min($"nbr").as("canonical"), count(lit(1)).as("n_nbrs"))
      .filter($"n_nbrs" > 1)
      .select($"vec_id", $"canonical")
      .orderBy($"vec_id")
  }

  /** splitmix64 finalizer — deterministic pseudo-random bits for the LSH
    * hyperplanes with no RNG state (identical across runs and JVMs). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Approximate nearest neighbors via multi-table random-hyperplane
    * LSH: 8 independent tables × 4 signed ±1 projections each; a vector
    * lands in one 4-bit bucket per table, the probe's candidates are the
    * union over tables of its buckets, exact cosine re-ranks them.
    * Hyperplanes are literal ±1 arrays precomputed from splitmix64 —
    * each projection is one codegen'd DoubleArrayDot against a constant,
    * not a per-element hash. Sign of the projection is invariant under
    * the vector's positive scaling, so bucketing runs on the normalized
    * arrays shared with the re-rank stage.
    * Scale path: bucketing shuffles each vector nTables times (table
    * fan-out), probe lookup is a broadcast join on (table, bucket) — no
    * brute-force scan; recall/candidate-fraction tuned by (tables,
    * bits). On near-uniform data candidate sets are large (LSH needs
    * cluster structure to prune hard) — ScalaTest asserts recall on a
    * clustered fixture where the guarantee is meaningful. No DuckDB
    * oracle (hash-derived planes aren't portable). */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nTables = 8
    val nBits = 4
    val dim = 64
    val planes: IndexedSeq[IndexedSeq[Seq[Double]]] =
      (0 until nTables).map { t =>
        (0 until nBits).map { p =>
          (0 until dim).map { d =>
            if ((mix(((t.toLong * nBits + p) << 32) | d.toLong) & 1L) == 1L) 1.0 else -1.0
          }
        }
      }
    val emb = normalized(spark, dir)
    val bucketCols: Seq[Column] = (0 until nTables).map { t =>
      (0 until nBits).map { p =>
        when(V.dotFast($"nemb", typedlit(planes(t)(p))) > 0.0,
          lit(1L << (nBits - 1 - p))).otherwise(lit(0L))
      }.reduce(_ + _).as(s"bucket$t")
    }
    val bucketed = emb.select(($"vec_id" +: $"nemb" +: bucketCols): _*)
      .select($"vec_id", $"nemb",
        posexplode(array((0 until nTables).map(t => col(s"bucket$t")): _*)))
      .toDF("vec_id", "nemb", "table_id", "bucket")
    val probeBuckets = bucketed.filter($"vec_id" === 0L)
      .select($"nemb".as("probe_nemb"), $"table_id", $"bucket")
    bucketed
      .join(broadcast(probeBuckets), Seq("table_id", "bucket"))
      .filter($"vec_id" =!= 0L)
      .select($"vec_id", $"nemb", $"probe_nemb")
      .dropDuplicates("vec_id")
      .select($"vec_id", round(V.dotFast($"nemb", $"probe_nemb"), 6).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(10)
  }
}
