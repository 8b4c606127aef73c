package graft

import graft.api.Temporal
import org.apache.spark.sql.functions._

/** The reusable temporal operators on hand-built frames. */
class TemporalApiSpec extends SparkSpec {

  test("sessionize appends incrementing per-key session ids") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-01 10:10:00"), 1L),
      (3L, ts("2024-01-01 11:00:00"), 1L),
      (4L, ts("2024-01-01 09:00:00"), 2L),
    ).toDF("event_id", "ts", "user_id")
    val out = Temporal.sessionize(df, "user_id", "ts", "event_id", 1800)
      .select($"event_id", $"session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("asofJoin matches latest right row at or before each left row") {
    import spark.implicits._
    val clicks = Seq(
      (100L, 7L, ts("2024-01-01 10:00:00")),
      (101L, 7L, ts("2024-01-01 10:20:00")),
    ).toDF("click_id", "user_id", "ts")
    val purchases = Seq(
      (200L, 7L, ts("2024-01-01 10:10:00")), // after click 100 only
      (201L, 7L, ts("2024-01-01 10:20:00")), // equal ts: click 101 matches
      (202L, 8L, ts("2024-01-01 10:00:00")), // no clicks for user 8
    ).toDF("purchase_id", "user_id", "ts")
    val out = Temporal.asofJoin(
        purchases, "purchase_id", "user_id", "ts",
        clicks, "click_id", "user_id", "ts")
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(out(200L).contains(100L))
    assert(out(201L).contains(101L))
    assert(out(202L).isEmpty)
  }

  test("asofJoin preserves non-numeric right id types (string UUIDs)") {
    import spark.implicits._
    val clicks = Seq(("uuid-a", 7L, ts("2024-01-01 10:00:00")))
      .toDF("click_id", "user_id", "ts")
    val purchases = Seq((200L, 7L, ts("2024-01-01 10:10:00")))
      .toDF("purchase_id", "user_id", "ts")
    val out = Temporal.asofJoin(
        purchases, "purchase_id", "user_id", "ts",
        clicks, "click_id", "user_id", "ts")
      .collect()
    assert(out.head.getString(2) == "uuid-a")
  }
}
