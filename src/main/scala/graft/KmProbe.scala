package graft

import org.apache.spark.sql.SparkSession

/** Vector-cache diagnostic (round-8 x100 rehearsal tool): materialize
  * Clustering's cached quantized relation for a scale dir, print the
  * scan partition count and the cache's real storage footprint, then
  * time a full kmeansAssign — the probe that separated the cached
  * relation (541 MB at 1M×64, healthy) from the MiniBench warmup
  * contention that first looked like a kmeans pathology. */
object KmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
    println("scan partitions: " + emb.rdd.getNumPartitions)
    val vecs = emb
      .select(col("vec_id").as("__id"),
        org.apache.spark.sql.GraftExpressionBridge.column(
          graft.plans.DoubleArrayQuantizeFloor(
            org.apache.spark.sql.GraftExpressionBridge.expression(col("embedding")),
            1000.0)).as("__q"))
      .withColumn("__xx", graft.functions.VectorFunctions.dotFast(col("__q"), col("__q")))
      .cache()
    var t0 = System.nanoTime()
    println("rows: " + vecs.count())
    println(f"cache materialize s: ${(System.nanoTime() - t0) / 1e9}%.1f")
    spark.sparkContext.getRDDStorageInfo.foreach { i =>
      println(s"cached parts=${i.numCachedPartitions}/${i.numPartitions} " +
        s"mem=${i.memSize} disk=${i.diskSize}")
    }
    spark.catalog.clearCache()
    t0 = System.nanoTime()
    val n = graft.api.Clustering
      .kmeansAssign(emb, "vec_id", "embedding", k = 8, rounds = 2)
      .groupBy(col("cluster")).count().collect()
    println(f"kmeans total s: ${(System.nanoTime() - t0) / 1e9}%.1f clusters=${n.length}")
  }
}
