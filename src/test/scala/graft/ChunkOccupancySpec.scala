package graft

import org.apache.spark.sql.functions._

/** Occupancy-margin pin for the banded dedup paths (ADVICE r6): the
  * DuckDB oracles replay banding UNCAPPED, so Spark/oracle equivalence
  * for q_dedup_simhash and q_dedup_minhash silently depends on no
  * graded-corpus bucket exceeding the 1024 default cap. These tests
  * measure the UNCAPPED bucket occupancy with the exact production key
  * derivation (the same helpers the pipelines feed to capBuckets) on
  * the real driver testdata, so a future testdata change that pushes a
  * bucket over the cap fails HERE with the occupancy number, instead of
  * flipping an oracle row with no test pointing at the cause. */
class ChunkOccupancySpec extends SparkSpec {

  private val cap = 1024 // the default maxChunkOccupancy / maxBandOccupancy
  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  private def maxOccupancy(buckets: org.apache.spark.sql.DataFrame,
      idxCol: String, keyCol: String): Long =
    buckets.groupBy(col(idxCol), col(keyCol)).agg(count(lit(1)).as("occ"))
      .agg(max(col("occ"))).head.getLong(0)

  for (dir <- sfDirs) {
    // this same bound is the streaming dedup's per-key state size:
    // q_stream_simhash_dedup's ListState holds one 16-byte entry per
    // bucket member (the identical simhashChunkBuckets relation), so
    // occupancy < cap ⇒ every RocksDB value list stays tiny too
    test(s"simhash graded config: max uncapped chunk occupancy stays below the cap ($dir)") {
      assume(new java.io.File(dir).isDirectory, s"driver testdata not present at $dir")
      val docs = Tables.documents(spark, dir)
      val sigs = api.Dedup.simhashSignatures(docs, "doc_id", "text", n = 3)
      val occ = maxOccupancy(api.Dedup.simhashChunkBuckets(sigs, maxHamming = 3),
        "chunk_idx", "chunk_key")
      assert(occ < cap,
        s"max simhash chunk occupancy $occ reached the $cap cap on $dir — " +
          "the uncapped oracle replay would now diverge from the capped Spark path; " +
          "regrade the corpus or raise the cap IN BOTH places")
    }

    test(s"minhash graded config: max uncapped band occupancy stays below the cap ($dir)") {
      assume(new java.io.File(dir).isDirectory, s"driver testdata not present at $dir")
      val docs = Tables.documents(spark, dir)
      val shingled = api.Dedup.shingles(api.Dedup.spread(docs), "doc_id", "text", n = 3)
      val sigs = api.Dedup.minhashSignatures(shingled, numHashes = 64)
      val occ = maxOccupancy(api.Dedup.minhashBandBuckets(sigs, bands = 16, rowsPerBand = 4),
        "band_idx", "band_key")
      assert(occ < cap,
        s"max minhash band occupancy $occ reached the $cap cap on $dir — " +
          "the uncapped oracle replay would now diverge from the capped Spark path; " +
          "regrade the corpus or raise the cap IN BOTH places")
    }
  }
}
