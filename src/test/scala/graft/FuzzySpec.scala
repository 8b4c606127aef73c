package graft

import graft.api.Fuzzy
import org.apache.spark.sql.functions._

/** graft.api.Fuzzy.hammingJoin — the pigeonhole-blocked fuzzy-key join.
  * The core assertion is COMPLETENESS: the blocked join must equal the
  * brute-force all-pairs Hamming join (equal lengths) exactly, because
  * the operator's contract is exactness, not recall. The graded
  * q_join_fuzzy's DuckDB oracle re-proves the same equality
  * independently; this spec holds it in-engine plus the edge cases the
  * testdata can't exercise (prefix edits, unequal lengths, short keys,
  * d = 2). */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(rows: Seq[(Long, String)], maxDist: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && sa.length == sb.length
      d = sa.zip(sb).count { case (x, y) => x != y }
      if d <= maxDist
    } yield (ia, ib, d)).toSet

  private def collectPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("blocked join equals brute force on the real customer names (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory, "driver testdata not present")
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey".cast("long"), $"c_name").as[(Long, String)].collect().toSeq
    val got = collectPairs(
      Fuzzy.hammingJoin(Tables.customer(spark, dir), "c_custkey", "c_name", maxDist = 1))
    assert(got === bruteForce(cust, 1))
    assert(got.nonEmpty, "testdata should contain hamming<=1 name pairs")
  }

  test("edits OUTSIDE the tail segments are still caught (segments need not cover the key)") {
    // pairs differ only in the PREFIX — every tail segment matches, so
    // blocking finds them; pigeonhole needs d+1 disjoint segments, not
    // coverage of the edit positions
    val rows = Seq(
      (1L, "Xustomer#000000042"), (2L, "Customer#000000042"), // prefix substitution
      (3L, "Custoper#000000042"),                             // mid substitution
      (4L, "Customer#000000043"))                             // tail substitution
    val got = collectPairs(Fuzzy.hammingJoin(rows.toDF("id", "s"), "id", "s", maxDist = 1))
    assert(got === bruteForce(rows, 1))
    assert(got.contains((1L, 2L, 1)) && got.contains((2L, 3L, 1)) && got.contains((2L, 4L, 1)))
  }

  test("maxDist = 2 (three segments) matches brute force, including cross-segment edits") {
    val rows = (0 until 60).map(i => (i.toLong, f"key-${i % 7}%03d-${i / 7}%04d")) ++
      Seq((100L, "kez-001-0001"), (101L, "kez-002-0001"), (102L, "XXy-001-0001"))
    val got = collectPairs(Fuzzy.hammingJoin(rows.toDF("id", "s"), "id", "s", maxDist = 2))
    assert(got === bruteForce(rows, 2))
  }

  test("unequal lengths never pair; keys shorter than (d+1)*segLen leave the join domain") {
    val rows = Seq((1L, "abcdef"), (2L, "abcdefg"), (3L, "abcdeg"),
      (4L, "abc"), (5L, "abd")) // len 3 < (1+1)*2=4 → excluded
    val got = collectPairs(Fuzzy.hammingJoin(rows.toDF("id", "s"), "id", "s",
      maxDist = 1, segLen = 2))
    assert(got === Set((1L, 3L, 1)))
  }

  test("masked join equals brute force on the real customer names (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory, "driver testdata not present")
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey".cast("long"), $"c_name").as[(Long, String)].collect().toSeq
    val got = collectPairs(
      Fuzzy.hammingJoinMasked(Tables.customer(spark, dir), "c_custkey", "c_name"))
    assert(got === bruteForce(cust, 1))
    assert(got.nonEmpty, "testdata should contain hamming<=1 name pairs")
  }

  test("masked join: prefix/mid/tail edits, short keys INCLUDED, segLen > 1, exact dups once") {
    val rows = Seq(
      (1L, "Xustomer#000000042"), (2L, "Customer#000000042"), // prefix substitution
      (3L, "Custoper#000000042"),                             // mid substitution
      (4L, "Customer#000000043"),                             // tail substitution
      (5L, "abc"), (6L, "abd"),       // short keys are IN the domain here
      (7L, "abc"),                    // exact duplicate of 5 → one (5,7,0) row
      (8L, "abcd"))                   // unequal length never pairs
    for (sl <- Seq(1, 2, 5)) {
      val got = collectPairs(
        Fuzzy.hammingJoinMasked(rows.toDF("id", "s"), "id", "s", segLen = sl))
      assert(got === bruteForce(rows, 1), s"segLen=$sl")
    }
    val df = Fuzzy.hammingJoinMasked(rows.toDF("id", "s"), "id", "s")
    assert(df.count() === df.distinct().count()) // pair-dedup actually applied
  }

  test("hamming_distance expression: nulls, unequal lengths, SQL registration") {
    GraftFunctions.register(spark)
    val df = Seq(("abcd", "abed"), ("abcd", "abcd")).toDF("a", "b")
    assert(df.select(Fuzzy.hammingDist($"a", $"b")).as[Int].collect().toSeq === Seq(1, 0))
    // unequal byte lengths → null (DuckDB's hamming errors instead; the
    // oracle guards with a length predicate)
    val mixed = Seq(("abc", "abcd"), (null: String, "abcd")).toDF("a", "b")
    assert(mixed.select(Fuzzy.hammingDist($"a", $"b")).collect().forall(_.isNullAt(0)))
    assert(spark.sql("SELECT hamming_distance('kitten', 'mitten')").head.getInt(0) === 1)
  }
}
