package graft.ops

import graft.Tables
import graft.functions.{Udafs, VectorFunctions => V}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search + vector analytics over the embeddings table
  * (SURVEY.md §2.8). All similarity math is double-precision HOFs
  * (VectorFunctions — codegen, no UDF); outputs round to 6 dp because
  * the oracle's accumulation order inside list_cosine_similarity is not
  * bit-identical to a sequential fold.
  */
object Vector {

  /** Brute-force cosine top-k against a probe vector (vec_id 0). The
    * probe is a 1-row broadcast — the big side streams through codegen
    * once, no shuffle until the final top-k (TakeOrderedAndProject).
    * This is the exact baseline an ANN variant is measured against. */
  def simKnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val probe = emb.filter($"vec_id" === 0L).select($"embedding".as("probe_emb"))
    emb.crossJoin(broadcast(probe))
      .filter($"vec_id" =!= 0L)
      .select($"vec_id", $"label", round(V.cosine($"embedding", $"probe_emb"), 6).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(10)
  }

  /** All-pairs similarity above a threshold, blocked by label: the join
    * is EQUI on label (shuffle both sides on label, pairs only within
    * blocks) — the O(n²) cross product never materializes across blocks.
    * At 100 TB the same shape holds with any bounded-cardinality
    * blocking key (label, LSH bucket, IVF cell).
    *
    * Each vector is L2-normalized ONCE before the join (n rows), so the
    * per-pair work is a single dot product — vs computing two norms per
    * pair (n² extra folds; measured 3-4× slower at sf0.1). */
  def simPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .withColumn("nrm", V.l2Norm($"embedding"))
      .select($"vec_id", $"label",
        transform($"embedding", x => x.cast("double") / $"nrm").as("nemb"))
    emb.as("a")
      .join(emb.as("b"), $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
      .select(
        $"a.vec_id".as("a_id"), $"b.vec_id".as("b_id"), $"a.label".as("label"),
        round(V.dotD($"a.nemb", $"b.nemb"), 6).as("cos_sim"))
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

  /** Approximate nearest neighbors via multi-table random-hyperplane
    * LSH: 8 independent tables × 4 signed projections each; a vector
    * lands in one 4-bit bucket per table, the probe's candidates are the
    * union over tables of its buckets, exact cosine re-ranks them.
    * Hyperplanes are pseudo-random but fully deterministic: component
    * (t, p, d) is ±1 from xxhash64(t*4+p, d) — no RNG state, identical
    * across runs. Scale path: bucketing shuffles each vector 8 times
    * (table fan-out), probe lookup is a broadcast join on (table,
    * bucket) — no brute-force scan; recall/candidate-fraction tuned by
    * (tables, bits). On near-uniform data candidate sets are large (LSH
    * needs cluster structure to prune hard) — ScalaTest asserts recall
    * on a clustered fixture where the guarantee is meaningful. No DuckDB
    * oracle (hash-derived planes aren't portable). */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nTables = 8
    val nBits = 4
    val emb = Tables.embeddings(spark, dir)
    // per-table signature: bit p = sign of <emb, hyperplane(t, p)>
    val sigsExpr = expr(
      s"""transform(sequence(0, ${nTables - 1}), t ->
        |  aggregate(sequence(0, ${nBits - 1}), 0L, (acc, p) ->
        |    acc * 2 + CASE WHEN
        |      aggregate(sequence(0, 63), cast(0.0 as double), (s, d) ->
        |        s + element_at(embedding, d + 1) *
        |            (CASE WHEN (xxhash64(t * $nBits + p, d) & 1) = 1 THEN 1.0 ELSE -1.0 END)) > 0
        |    THEN 1 ELSE 0 END))""".stripMargin)
    val bucketed = emb.withColumn("sigs", sigsExpr)
      .select($"vec_id", $"embedding", posexplode($"sigs"))
      .toDF("vec_id", "embedding", "table_id", "bucket")
    val probeBuckets = bucketed.filter($"vec_id" === 0L)
      .select($"embedding".as("probe_emb"), $"table_id", $"bucket")
    bucketed
      .join(broadcast(probeBuckets), Seq("table_id", "bucket"))
      .filter($"vec_id" =!= 0L)
      .select($"vec_id", $"embedding", $"probe_emb")
      .dropDuplicates("vec_id")
      .select($"vec_id", round(V.cosine($"embedding", $"probe_emb"), 6).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(10)
  }
}
