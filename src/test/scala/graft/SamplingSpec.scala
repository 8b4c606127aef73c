package graft

import org.apache.spark.sql.functions._

/** Invariants for the corpus-curation operators (graft.api.Sampling):
  * the sampler's determinism/exact-count contract and the packer's
  * conservation laws. */
class SamplingSpec extends SparkSpec {

  test("stratifiedTopN: exact per-stratum counts, deterministic, rank-bounded") {
    import spark.implicits._
    val df = (0 until 100).map(i => (s"s${i % 3}", i.toLong)).toDF("stratum", "id")
    val s1 = graft.api.Sampling.stratifiedTopN(df, "stratum", "id", n = 10)
    val counts = s1.groupBy($"stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("s0" -> 10L, "s1" -> 10L, "s2" -> 10L), counts.toString)
    assert(s1.agg(max($"sample_rank")).head().getInt(0) == 10)
    // a stratum smaller than n yields ALL its rows, not an error
    val tiny = Seq(("t", 1L), ("t", 2L)).toDF("stratum", "id")
    assert(graft.api.Sampling.stratifiedTopN(tiny, "stratum", "id", 10).count() == 2)
    // determinism: the same input picks the same ids in the same order
    val pick = (d: org.apache.spark.sql.DataFrame) =>
      graft.api.Sampling.stratifiedTopN(d, "stratum", "id", 10)
        .select($"stratum", $"sample_rank", $"id")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(pick(df) == pick(df.orderBy(rand()))) // input order is irrelevant
  }

  test("sequentialPoisson: xi matches a plain-Scala replay, excludes w<=0, respects k") {
    import spark.implicits._
    val df = Seq((0L, 4L), (1L, 1L), (2L, 9L), (3L, 0L), (4L, -2L), (5L, 25L))
      .toDF("id", "weight")
    val got = graft.api.Sampling.sequentialPoisson(df, "id", col("weight"), k = 3)
      .select($"id", $"w", $"xi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // plain-Scala replay of the identical arithmetic
    def xi(id: Long, w: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.substring(0, 13)
      (java.lang.Long.parseLong(hex, 16) / 4503599627370496.0) / w
    }
    val expected = Seq(0L -> 4L, 1L -> 1L, 2L -> 9L, 5L -> 25L)
      .map { case (id, w) => (id, w, xi(id, w)) }
      .sortBy(t => (t._3, t._1)).take(3)
    assert(got.toSeq == expected, s"got ${got.toSeq} want $expected")
    // non-positive weights never appear, whatever k
    val all = graft.api.Sampling.sequentialPoisson(df, "id", col("weight"), k = 10)
      .select($"id").as[Long].collect().toSet
    assert(all == Set(0L, 1L, 2L, 5L), all.toString)
    // determinism under input reordering
    val again = graft.api.Sampling.sequentialPoisson(
        df.orderBy(rand()), "id", col("weight"), k = 3)
      .select($"id", $"w", $"xi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(again.toSeq == got.toSeq)
  }

  test("mixtureSample: exact quotas, unallocated strata dropped, subset of stratifiedTopN order") {
    import spark.implicits._
    val df = (0 until 90).map(i => (s"s${i % 3}", i.toLong)).toDF("stratum", "id")
    val got = graft.api.Sampling.mixtureSample(df, "stratum", "id",
        Map("s0" -> 5, "s1" -> 12))
      .groupBy($"stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("s0" -> 5L, "s1" -> 12L), got.toString) // s2: no quota, no rows
    // the mixture draw is the same ordered prefix stratifiedTopN uses —
    // one deterministic order serves every quota
    val mixIds = graft.api.Sampling.mixtureSample(df, "stratum", "id", Map("s0" -> 5))
      .select($"id").as[Long].collect().toSet
    val topIds = graft.api.Sampling.stratifiedTopN(df, "stratum", "id", 5)
      .filter($"stratum" === "s0").select($"id").as[Long].collect().toSet
    assert(mixIds == topIds, s"$mixIds vs $topIds")
  }

  test("packChunks conserves docs and tokens; chunks start at 0 per key") {
    import spark.implicits._
    val df = (0 until 60).map(i => (s"k${i % 2}", i.toLong, (10 + i % 7).toLong))
      .toDF("key", "id", "toks")
    val packed = graft.api.Sampling.packChunks(df, "key", "id", "toks", targetTokens = 50)
    val byKey = packed.groupBy($"key")
      .agg(sum($"n_docs").as("docs"), sum($"sum_tokens").as("toks"), min($"chunk_id").as("c0"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val want = df.groupBy($"key").agg(count(lit(1)), sum($"toks"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    want.foreach { case (k, (docs, toks)) =>
      assert(byKey(k) == ((docs, toks, 0L)), s"$k: ${byKey(k)} vs ($docs, $toks, 0)")
    }
    // no chunk except possibly the last of a key exceeds target by more
    // than one straddling document's tokens (boundary docs stay in the
    // chunk they START in — so a chunk's sum is < target + its max doc)
    packed.collect().foreach { r =>
      assert(r.getAs[Long]("sum_tokens") < 50 + 17, r.toString)
    }
  }

  test("splitLeakageSafe: no near-dup pair spans two splits; buckets are the md5 hex ranges") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val asgRaw = api.Sampling.splitLeakageSafe(docs, "doc_id", "text")
    // the public schema is STABLE (r9 ADVICE): no internal helper
    // columns escape, and only the id column is carried
    assert(asgRaw.columns.toSeq == Seq("doc_id", "canon", "split"))
    val asg = asgRaw.cache()
    // the leakage property, pinned on the REAL pair relation rather
    // than trusted from the construction: both ends of every near-dup
    // pair land in the same split
    val pairs = api.Dedup.minhashLsh(docs, "doc_id", "text")
    val leaking = pairs
      .join(asg.select($"doc_id".as("a_id"), $"split".as("sa")), "a_id")
      .join(asg.select($"doc_id".as("b_id"), $"split".as("sb")), "b_id")
      .filter($"sa" =!= $"sb").count()
    assert(leaking == 0L, s"$leaking near-dup pairs span two splits")
    // every doc assigned exactly one split; assignment is the md5 rule
    assert(asg.count() == docs.count())
    val wrong = asg
      .withColumn("h", substring(md5($"canon".cast("string")), 1, 1))
      .filter(
        ($"h" <= "b" && $"split" =!= "train") ||
        ($"h" > "b" && $"h" <= "d" && $"split" =!= "val") ||
        ($"h" > "d" && $"split" =!= "test")).count()
    assert(wrong == 0L)
    asg.unpersist()
  }
}
