package graft.api

import graft.functions.{Udafs, VectorFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the
  * clustering primitive a training-data pipeline uses for SemDeDup-style
  * corpus partitioning and for IVF coarse quantizer training, exposed
  * as a first-class operator.
  *
  * Engine-exact by construction (the property that lets the DuckDB
  * oracle replay it hash-identically): every vector is quantized to
  * integer-valued doubles (`floor(x * scale)`) before any arithmetic,
  * so squared distances, centroid sums, and inertia are EXACT integer
  * arithmetic carried in doubles (products ≤ dim·scale² ≈ 6.4e7 per
  * element at dim 64, sums far below 2^53) — no accumulation-order or
  * libm drift anywhere. Centroid updates re-quantize with
  * `floor(sum / n)` (one IEEE division of exact operands, identical in
  * any engine). Ties in the nearest-centroid argmin break to the
  * smaller cluster id via struct ordering.
  *
  * 100 TB shape (the reason this is Lloyd's and not a fancier variant):
  * each round is one map pass (k codegen'd [[graft.plans.DoubleArrayDot]]
  * products per row against BROADCAST centroid literals — k·dim doubles
  * of plan state, never a join) plus one k-row aggregate
  * (element-wise-sum Aggregator with map-side partial merge, so the
  * exchange carries one dim-wide partial per (cluster, task)). Driver
  * traffic is the k×dim centroid model per round — the same bounded
  * model-only `collect()` contract as the IVF codebooks
  * (api.Similarity). Rows shuffle exactly once per recompute, keyed by
  * cluster id (k ≪ partitions; the aggregate is the tiny side).
  */
object Clustering {

  /** Assign every row to its nearest of k centroids after `rounds`
    * Lloyd assignment passes (centroids recomputed between passes;
    * `rounds` = 1 is plain nearest-neighbor to the seed centroids).
    * Seeds are the vectors of the k smallest ids (deterministic,
    * portable); cluster id = rank of the seed in id order (0-based).
    *
    * Returns (idCol, cluster, dist): dist is the EXACT squared L2
    * distance in the quantized integer space to the final round's
    * centroid.
    */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
                   k: Int, rounds: Int, scale: Double = 1000.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(rounds > 0, s"rounds must be positive, got $rounds")
    val vecs = df
      .select(col(idCol).as("__id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * lit(scale)).cast("double")).as("__q"))
      .withColumn("__xx", VectorFunctions.dotFast(col("__q"), col("__q")))
      .cache()

    // Seed centroids: the k smallest ids, labeled by rank in id order.
    var centroids: Array[(Int, Array[Double])] =
      vecs.orderBy(col("__id")).limit(k).collect().zipWithIndex.map {
        case (r, i) => (i, r.getSeq[Double](1).toArray)
      }

    var assigned: DataFrame = null
    for (round <- 1 to rounds) {
      // dist²(x, c) = |x|² − 2·x·c + |c|²; |c|² folds to a literal.
      val cands = array(centroids.toSeq.map { case (cl, c) =>
        val cc = c.map(v => v * v).sum
        struct(
          (col("__xx")
            - lit(2.0) * VectorFunctions.dotFast(col("__q"), typedLit(c.toSeq))
            + lit(cc)).as("d"),
          lit(cl).as("c"))
      }: _*)
      assigned = vecs
        .withColumn("__best", array_min(cands))
        .select(col("__id"), col("__q"),
          col("__best").getField("c").as("cluster"),
          col("__best").getField("d").as("dist"))
      if (round < rounds) {
        centroids = assigned
          .groupBy(col("cluster"))
          .agg(Udafs.vecSumDCol(col("__q")).as("vsum"), count(lit(1)).as("n"))
          .withColumn("c", expr("transform(vsum, v -> CAST(floor(v / n) AS DOUBLE))"))
          .select(col("cluster"), col("c"))
          .collect()
          .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
          .sortBy(_._1)
      }
    }
    assigned.select(col("__id").as(idCol), col("cluster"), col("dist"))
  }
}
