package graft

import graft.api.Clustering
import org.apache.spark.sql.functions._

/** graft.api.Clustering.kmeansAssign — engine-exact Lloyd's k-means.
  * The graded q_vec_kmeans oracle replays both rounds in DuckDB ×3 SFs;
  * this spec holds the same semantics against an INDEPENDENT driver-side
  * Scala re-implementation (quantize → seed-by-id-rank → argmin with
  * cluster-id tie-break → floor-mean recompute), plus the degenerate
  * edges the testdata can't exercise (all-identical vectors, emptying
  * clusters, rounds = 1).
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: identical arithmetic, plain Scala. */
  private def reference(rows: Seq[(Long, Seq[Float])], k: Int, rounds: Int,
                        scale: Double): Map[Long, (Int, Double)] = {
    val q = rows.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * scale)).toArray
    }.sortBy(_._1)
    var cents: Seq[(Int, Array[Double])] =
      q.take(k).zipWithIndex.map { case ((_, v), i) => (i, v) }
    var assign: Map[Long, (Int, Double)] = Map.empty
    for (round <- 1 to rounds) {
      assign = q.map { case (id, v) =>
        val best = cents.map { case (cl, c) =>
          val d = v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
          (d, cl)
        }.min // (dist, cl) tuple order = struct order: dist then cluster id
        id -> (best._2, best._1)
      }.toMap
      if (round < rounds) {
        cents = assign.toSeq.groupBy(_._2._1).toSeq.sortBy(_._1).map {
          case (cl, members) =>
            val vs = members.map { case (id, _) => q.find(_._1 == id).get._2 }
            val dim = vs.head.length
            (cl, Array.tabulate(dim)(i =>
              math.floor(vs.map(_(i)).sum / vs.length.toDouble)))
        }
      }
    }
    assign
  }

  test("kmeansAssign equals the driver-side reference on the real embeddings") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory, "driver testdata not present")
    val emb = Tables.embeddings(spark, dir)
    val rows = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toSeq
    val expected = reference(rows, k = 8, rounds = 2, scale = 1000.0)
    val got = Clustering.kmeansAssign(emb, "vec_id", "embedding", k = 8, rounds = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(got.size === rows.size)
    assert(got === expected)
  }

  test("rounds = 1 is plain nearest-seed assignment; more rounds never raise inertia") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory, "driver testdata not present")
    val emb = Tables.embeddings(spark, dir)
    def inertia(rounds: Int): Double =
      Clustering.kmeansAssign(emb, "vec_id", "embedding", k = 8, rounds = rounds)
        .agg(sum($"dist")).collect()(0).getDouble(0)
    val i1 = inertia(1)
    val i2 = inertia(2)
    val i3 = inertia(3)
    assert(i2 <= i1, s"one Lloyd update must not raise inertia ($i1 -> $i2)")
    assert(i3 <= i2, s"two Lloyd updates must not raise inertia ($i2 -> $i3)")
  }

  test("degenerate input: identical vectors all land in cluster 0 at distance 0") {
    val df = Seq.tabulate(6)(i => (i.toLong, Seq(0.5f, -0.25f, 0.125f)))
      .toDF("vec_id", "embedding")
    val got = Clustering.kmeansAssign(df, "vec_id", "embedding", k = 4, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.length === 6)
    assert(got.forall { case (_, cl, d) => cl === 0 && d === 0.0 })
  }

  test("clusters may empty between rounds without breaking the recompute") {
    // two far groups, k = 3: ids are laid out so the three seeds are
    // two identical group-A vectors (clusters 0, 1) and one group-B
    // vector (cluster 2). Every A point ties between clusters 0 and 1
    // and breaks to the SMALLER id, so cluster 1 empties after round 1 —
    // the recompute must carry on with the survivors only.
    val a = Seq(0L, 1L, 6L, 7L).map(i => (i, Seq(1.0f, 1.0f)))
    val b = Seq(2L, 3L, 4L, 5L).map(i => (i, Seq(100.0f, 100.0f)))
    val df = (a ++ b).toDF("vec_id", "embedding")
    val got = Clustering.kmeansAssign(df, "vec_id", "embedding", k = 3, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.length === 8)
    val byCluster = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster(0) === a.map(_._1).toSet, "group A ties to cluster 0")
    assert(byCluster(2) === b.map(_._1).toSet, "group B stays with its seed")
    assert(!byCluster.contains(1), "the duplicate seed's cluster empties")
  }
}
