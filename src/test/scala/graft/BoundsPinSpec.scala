package graft

import org.apache.spark.sql.functions._

/** Pins for documented bounds that no behavioral test previously
  * enforced (the round-6 capBuckets lesson: simhash's scaladoc claimed
  * an occupancy cap the code never applied, and only an expensive x10
  * rehearsal caught it). Every bound in docs/PLANS.md's pin inventory
  * maps to a test; this suite holds the ones that didn't have a
  * natural home. */
class BoundsPinSpec extends SparkSpec {

  test("crossCorpus bloom sizing never exceeds Spark's runtime-bloom clamps (claimed in scaladoc)") {
    // the claim: auto-scaled bucket count keeps every per-bucket
    // filter's items/bits under maxNumItems = 4M / maxNumBits = 2^26
    // at ANY reference size — swept here across 9 orders of magnitude
    // (a 1e11-key reference ≈ a 100 TB crawl's url set)
    for (nRef <- Seq(1L, 1000L, 4000000L, 5000000L, 100000000L, 10000000000L, 100000000000L);
         fpp <- Seq(0.5, 0.01, 0.001)) {
      val (nBuckets, items, bits) = api.Dedup.bloomBucketPlan(nRef, fpp, buckets = 0)
      assert(nBuckets >= 16, s"bucket floor violated: $nBuckets at nRef=$nRef")
      assert(items <= 4000000L,
        s"itemsPerBucket $items exceeds the 4M clamp at nRef=$nRef fpp=$fpp (nBuckets=$nBuckets)")
      assert(bits <= 67108864L,
        s"bitsPerBucket $bits exceeds the 2^26 clamp at nRef=$nRef fpp=$fpp (nBuckets=$nBuckets)")
      // and the budget is actually used: expected per-bucket occupancy
      // times bucket count covers the reference with the 1.25 headroom
      assert(items * nBuckets >= nRef, s"sizing undershoots: $items x $nBuckets < $nRef")
    }
  }

  test("basketPairs' k <= 7 expansion-bound claim holds on the graded testdata") {
    // the scaladoc argues the generate expansion is bounded by basket
    // size k (C(k,2) rows per order); k <= 7 is a DATA property of the
    // testdata (4 lines per order, parts may repeat), so pin it where
    // a testdata regeneration would silently grow the quadratic term
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(dir).isDirectory, s"driver testdata not present at $dir")
    val maxBasket = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(size(collect_set(col("l_partkey"))).as("k"))
      .agg(max(col("k"))).head.getInt(0)
    assert(maxBasket <= 7,
      s"max basket size $maxBasket exceeds the documented k <= 7 bound — " +
        "basketPairs' C(k,2) expansion argument needs re-checking")
  }
}
