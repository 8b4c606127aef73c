package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._

/** Unit checks for relational operators on tiny inline frames with
  * hand-computed expecteds (FIXTURES.md naming so logic is copy-paste
  * compatible with the production readers). The oracle gate covers the
  * full queries; these pin the tricky semantics. */
class RelationalSpec extends SparkSpec {

  test("banded theta join equals naive theta join") {
    import spark.implicits._
    // prices straddling band boundaries on purpose
    val prices = Seq(1L -> 10.0, 2L -> 10.9, 3L -> 11.0, 4L -> 12.05, 5L -> 13.0, 6L -> 25.0)
    val df = prices.toDF("p_partkey", "p_retailprice")
    val w = 1.0
    // naive O(n²) reference
    val naive = df.as("a").join(df.as("b"),
        abs($"a.p_retailprice" - $"b.p_retailprice") <= w &&
        $"a.p_partkey" =!= $"b.p_partkey")
      .groupBy($"a.p_partkey".as("k")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // banded (same construction as Relational.joinTheta)
    val build = df.select($"p_partkey".as("bk"), $"p_retailprice".as("bp"),
      floor($"p_retailprice" / w).as("band"))
    val probe = df.select($"p_partkey".as("ak"), $"p_retailprice".as("ap"),
      explode(array(floor($"p_retailprice" / w) - 1, floor($"p_retailprice" / w),
        floor($"p_retailprice" / w) + 1)).as("band"))
    val banded = probe.join(build, "band")
      .filter(abs($"ap" - $"bp") <= w && $"ak" =!= $"bk")
      .groupBy($"ak").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(banded == naive)
    assert(naive(1L) == 2L) // 10.0 ↔ {10.9, 11.0}
    assert(!naive.contains(6L)) // isolated price
  }

  test("as-of join picks latest prior click per user") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click"),
      (2L, ts("2024-01-01 10:05:00"), 7L, "view"),
      (3L, ts("2024-01-01 10:10:00"), 7L, "purchase"),
      (4L, ts("2024-01-01 10:20:00"), 7L, "click"),
      (5L, ts("2024-01-01 10:30:00"), 7L, "purchase"),
      (6L, ts("2024-01-01 09:00:00"), 8L, "purchase"), // user 8: no prior click
    ).toDF("event_id", "ts", "user_id", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Long.MinValue, 0)
    val out = events
      .filter($"event_type".isin("purchase", "click"))
      .withColumn("click_id", when($"event_type" === "click", $"event_id"))
      .withColumn("last_click_id", last($"click_id", ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"last_click_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(3L).contains(1L))
    assert(out(5L).contains(4L))
    assert(out(6L).isEmpty)
  }

  test("sessionize splits on >30min gaps") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-01 10:10:00"), 1L), // same session
      (3L, ts("2024-01-01 11:00:00"), 1L), // 50min gap → new session
      (4L, ts("2024-01-01 11:20:00"), 1L), // same
      (5L, ts("2024-01-01 09:00:00"), 2L), // other user
    ).toDF("event_id", "ts", "user_id")
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val out = ev
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ts".isNull || unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 1800, 1)
          .otherwise(0))
      .withColumn("sid", sum($"new_session").over(
        byUser.rowsBetween(Long.MinValue, 0)))
      .groupBy($"user_id").agg(max($"sid").as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }

  test("approx_count_distinct within 5% of exact on events") {
    import spark.implicits._
    val df = (1L to 2000L).map(i => (i % 437, i)).toDF("user_id", "event_id")
    val exact = df.select(countDistinct($"user_id")).head.getLong(0)
    val approx = df.select(approx_count_distinct($"user_id", 0.02)).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("approx_percentile within tolerance of exact percentile") {
    import spark.implicits._
    val df = (1 to 10000).map(_.toDouble).toDF("v")
    val exact = df.selectExpr("percentile(v, 0.9)").head.getDouble(0)
    val approx = df.selectExpr("approx_percentile(v, 0.9, 1000)").head.getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }

  test("persist/unpersist lifecycle: storage level set and cleared") {
    import spark.implicits._
    val df = (1 to 100).toDF("x")
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assert(df.count() == 100)
    df.unpersist(blocking = true)
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("window rank is tie-safe (unique tiebreak key)") {
    import spark.implicits._
    val orders = Seq((1L, 10L, 500.0), (2L, 10L, 500.0), (3L, 10L, 500.0), (4L, 10L, 400.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val top = orders.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .orderBy($"rn").select($"o_orderkey").as[Long].collect()
    assert(top.toSeq == Seq(1L, 2L, 3L)) // deterministic despite price ties
  }

  test("rfmSegmentsApprox equals the exact ntile segmentation on the graded data x3 SFs") {
    // the approx variant buckets composite total-order values against
    // approx_percentile cut points — at test scale the sketch is exact
    // and the histogram must match the exact ntile variant ROW FOR ROW
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val exact = ops.Relational.rfmSegments(spark, sf).collect().toSeq
      val approx = ops.Relational.rfmSegmentsApprox(spark, sf).collect().toSeq
      assert(approx == exact, s"rfm approx != exact at $sf")
    }
  }
}
