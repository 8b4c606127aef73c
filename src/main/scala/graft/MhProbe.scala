package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minhash x100 memory-ceiling bisection probe (round-9): run the
  * minhashLsh pipeline one phase at a time at a given scale dir so an
  * OOM pins to a PHASE, not "stage 2 of the whole query". Phases:
  *   shingle — materialize the shingle cache alone
  *   sig     — + the persisted signature relation
  *   count   — + the band-occupancy fixed-width count aggregate
  *   full    — the whole query (q_dedup_minhash)
  * Usage: runMain graft.MhProbe <sfDir> <phase>
  */
object MhProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val phase = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // reset the Java serialization handle table after EVERY object:
      // the disk leg of big caches writes fat columnar batches through
      // one ObjectOutputStream, and the default reset-every-100 retains
      // ~100 batches (~GBs) per task — the x100/8g text-cache OOM
      .config("spark.serializer.objectStreamReset", "1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // matches the round-9 minhashLsh shape: shingles inline, no
    // corpus-wide cache
    val shingled = api.Dedup.shingles(api.Dedup.spread(docs), "doc_id", "text", 3)
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label rows=$n ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    phase match {
      case "shingle" =>
        timed("shingle-pass")(shingled.count())
      case "sig" =>
        val sigs = api.Dedup.minhashSignatures(shingled, 64)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        timed("sig-persist")(sigs.count())
      case "count" =>
        val sigs = api.Dedup.minhashSignatures(shingled, 64)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        timed("sig-persist")(sigs.count())
        val occ = api.Dedup.minhashBandBuckets(sigs, 16, 4)
          .groupBy(col("band_idx"), col("band_key"))
          .agg(count(lit(1)).as("__occ"))
          .filter(col("__occ") >= 2 && col("__occ") <= 1024)
        timed("band-count")(occ.count())
      case "full" =>
        timed("full-minhash")(
          api.Dedup.minhashLsh(docs, "doc_id", "text").count())
    }
    spark.stop()
  }
}
