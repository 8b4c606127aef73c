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
  // engineered corpora: a constant hot region overflows every level-0
  // bucket at occT=2 (forcing full mask-ladder descent), with
  // exact-duplicate groups (the star-edge path) and <=h-flip families
  // (true near-dups) mixed into background randoms. Ground truth:
  // driver-side union-find over ALL pairs at hamming <= h — the
  // refined generator must produce the SAME connected components (its
  // pair set is component-equivalent by contract, not pair-identical).
  // h ranges over {2, 3, 4} to pin the parts = h + 1 generalization
  // (r15): the ladder's pigeonhole completeness must hold when the
  // level masks are 21/14/9-bit (h=2) and 12-13/10/8-bit (h=4), not
  // just the derivation-native 16/12/9 (h=3).
  for (h <- 2 to 4)
    test(s"simhashPairsFromSigs: components equal brute-force hamming<=$h with descent forced (occT=2)") {
      import spark.implicits._
      for (seed <- 1 to 3) {
        val rnd = new scala.util.Random(seed * 92821 + h)
        val sigs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var id = 0L
        def add(s: Long): Unit = { sigs += ((id, s)); id += 1 }
        val hotChunk = 0xABCDL << 48
        for (_ <- 0 until 30) {
          val base = hotChunk | (rnd.nextLong() & 0x0000FFFFFFFFFFFFL)
          add(base)
          for (_ <- 0 until rnd.nextInt(3)) add(base)
          for (_ <- 0 until rnd.nextInt(3)) {
            var s = base
            for (_ <- 0 to rnd.nextInt(h)) s ^= 1L << rnd.nextInt(64)
            add(s)
          }
        }
        for (_ <- 0 until 40) add(rnd.nextLong())
        val got = api.Dedup.simhashPairsFromSigs(
            sigs.toSeq.toDF("doc_id", "sig"), occT = 2, finalCap = 65536,
            maxHamming = h)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        val arr = sigs.toArray
        val parent = Array.tabulate(arr.length)(identity)
        def find(x: Int): Int = {
          var r = x; while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        for (i <- arr.indices; j <- i + 1 until arr.length
             if java.lang.Long.bitCount(arr(i)._2 ^ arr(j)._2) <= h)
          parent(find(i)) = find(j)
        val expected = arr.indices.groupBy(find).values
          .map(_.map(arr(_)._1).toSet).filter(_.size > 1).toSet
        val p2 = scala.collection.mutable.Map.empty[Long, Long]
        def find2(x: Long): Long = {
          val p = p2.getOrElse(x, x)
          if (p == x) x else { val r = find2(p); p2(x) = r; r }
        }
        got.foreach { case (a, b) =>
          val (ra, rb) = (find2(a), find2(b)); if (ra != rb) p2(ra) = rb
        }
        val gotComp = got.flatMap(pr => Seq(pr._1, pr._2)).distinct
          .groupBy(find2).values.map(_.toSet).filter(_.size > 1).toSet
        assert(gotComp == expected,
          s"h=$h seed=$seed\ngot:      $gotComp\nexpected: $expected")
      }
    }

  test("simhashPairsFromSigs: START-LEVEL INVARIANCE — components identical entering at level 0, 1 or 2") {
    import spark.implicits._
    // the r15 scale path may SKIP ladder levels whose expected
    // occupancy exceeds occT (at 30M signatures every 16-bit level-0
    // bucket is hot, so the pass only learned "descend everything");
    // correctness rests on every level's mask set being
    // pigeonhole-complete ON ITS OWN. This pins it: same engineered
    // corpus (hot region + exact dups + <=3-flip families + randoms),
    // forced entry at each level, identical components.
    val rnd = new scala.util.Random(424242)
    val sigs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var id = 0L
    def add(s: Long): Unit = { sigs += ((id, s)); id += 1 }
    val hotChunk = 0x5A5AL << 48
    for (_ <- 0 until 25) {
      val base = hotChunk | (rnd.nextLong() & 0x0000FFFFFFFFFFFFL)
      add(base)
      for (_ <- 0 until rnd.nextInt(3)) add(base)
      for (_ <- 0 until rnd.nextInt(3)) {
        var s = base
        for (_ <- 0 to rnd.nextInt(3)) s ^= 1L << rnd.nextInt(64)
        add(s)
      }
    }
    for (_ <- 0 until 40) add(rnd.nextLong())
    val df = sigs.toSeq.toDF("doc_id", "sig")
    def components(pairs: Seq[(Long, Long)]): Set[Set[Long]] = {
      val p2 = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = p2.getOrElse(x, x)
        if (p == x) x else { val r = find(p); p2(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) p2(ra) = rb
      }
      pairs.flatMap(pr => Seq(pr._1, pr._2)).distinct
        .groupBy(find).values.map(_.toSet).filter(_.size > 1).toSet
    }
    val byLevel = (0 to 2).map { sl =>
      components(api.Dedup.simhashPairsFromSigs(df, occT = 2,
          finalCap = 65536, maxHamming = 3, startLevelOverride = sl)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    }
    assert(byLevel(0) == byLevel(1) && byLevel(1) == byLevel(2),
      s"start-level variance:\nL0: ${byLevel(0)}\nL1: ${byLevel(1)}\nL2: ${byLevel(2)}")
  }
}
