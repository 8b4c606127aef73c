package graft

import graft.Schemas.Event
import graft.ops.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The two join shapes that only matter at scale: watermarked
  * stream-stream interval joins (state-bounded on both sides) and
  * bucketed co-located batch joins (no shuffle at read time). */
class ScaleJoinSpec extends SparkSpec {

  private def ev(id: Long, t: String, user: Long, typ: String): Event =
    Event(id, ts(t), user, typ, 1.0, "{}")

  test("stream-stream interval join: purchase matches clicks within 30min") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val c = clicks.toDF.select($"event_id".as("click_id"), $"ts".as("click_ts"), $"user_id".as("c_user"))
      .withWatermark("click_ts", "1 hour")
    val p = purchases.toDF.select($"event_id".as("purchase_id"), $"ts".as("purchase_ts"), $"user_id".as("p_user"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = p.join(c,
      $"p_user" === $"c_user" &&
      $"click_ts" <= $"purchase_ts" &&
      $"click_ts" >= $"purchase_ts" - expr("INTERVAL 30 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ss_join").outputMode("append").start()
    try {
      clicks.addData(Seq(
        ev(1, "2024-01-01 10:00:00", 1, "click"),
        ev(2, "2024-01-01 10:50:00", 1, "click"),
        ev(3, "2024-01-01 10:00:00", 2, "click")))
      purchases.addData(Seq(
        ev(10, "2024-01-01 11:00:00", 1, "purchase"),  // within 30m of click 2 only
        ev(11, "2024-01-01 12:00:00", 2, "purchase"))) // no click within 30m
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ss_join")
      .select($"purchase_id", $"click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((10L, 2L)), rows.toString)
  }

  test("bucketed tables co-locate: join plan has no shuffle exchange") {
    import spark.implicits._
    // warehouse.dir is a static conf — managed tables land in the default
    // ./spark-warehouse; DROP TABLE below removes the files.
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    val orders = Seq((1L, 10L, 100.0), (2L, 11L, 200.0), (3L, 10L, 300.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Seq((10L, "A"), (11L, "B")).toDF("c_custkey", "c_mktsegment")
    orders.write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    customer.write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")
    // disable auto-broadcast so the co-located sort-merge path is exercised
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), $"o_custkey" === $"c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n${plan.take(800)}")
      assert(joined.count() == 3)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
