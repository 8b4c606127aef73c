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

  test("intervalOverlapSelfJoin equals the naive overlap join, incl. boundaries") {
    import spark.implicits._
    // durations = 600s = maxDur; pairs planted at exact-touch boundaries
    // (gap exactly 600s → single-instant overlap) and across band edges
    val iv = Seq(
      (1L, 1L, "2024-01-01 10:00:00"),
      (2L, 1L, "2024-01-01 10:10:00"), // touches 1 at exactly e1 = s2
      (3L, 1L, "2024-01-01 10:09:59"), // overlaps 1 and 2
      (4L, 1L, "2024-01-01 10:20:01"), // gap 601s from 2's start+... overlaps 2? s4=10:20:01 ≤ e2=10:20:00? NO — just misses
      (5L, 2L, "2024-01-01 10:05:00"), // other key — must not pair with key 1
      (6L, 1L, "2024-01-01 23:59:30"),
      (7L, 1L, "2024-01-02 00:00:30"), // overlap across midnight/band edge
    ).map { case (id, k, t) => (id, k, ts(t), new java.sql.Timestamp(ts(t).getTime + 600000L)) }
      .toDF("id", "k", "s", "e")
    val banded = Temporal.intervalOverlapSelfJoin(iv, "id", "k", "s", "e", 600L)
      .select($"a_id", $"b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = iv.as("a").join(iv.as("b"),
        $"a.k" === $"b.k" && $"a.id" < $"b.id" &&
        $"a.s" <= $"b.e" && $"b.s" <= $"a.e")
      .select($"a.id", $"b.id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == naive, s"banded=$banded naive=$naive")
    assert(banded.contains((1L, 2L)) && banded.contains((6L, 7L)))
    assert(!banded.contains((2L, 4L)) && !banded.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("resampleLocf fills gap buckets and carries the last observed max") {
    import spark.implicits._
    // key A observed at hours 0, 1, 4 (gap at 2, 3); key B at hour 0 only
    val df = Seq(
      ("A", "2024-01-01 00:10:00", 1.0), ("A", "2024-01-01 00:50:00", 3.0),
      ("A", "2024-01-01 01:30:00", 2.0),
      ("A", "2024-01-01 04:15:00", 5.0),
      ("B", "2024-01-01 00:00:00", 7.0),
    ).toDF("k", "t", "v").select($"k", $"t".cast("timestamp").as("t"), $"v")
    val out = graft.api.Temporal.resampleLocf(df, "k", "t", "v").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(13),
        r.getLong(2), r.getDouble(3), r.getInt(4))).toSet
    assert(out == Set(
      ("A", "2024-01-01 00", 2L, 3.0, 0),
      ("A", "2024-01-01 01", 1L, 2.0, 0),
      ("A", "2024-01-01 02", 0L, 2.0, 1), // gap: carries hour-1 max
      ("A", "2024-01-01 03", 0L, 2.0, 1),
      ("A", "2024-01-01 04", 1L, 5.0, 0),
      ("B", "2024-01-01 00", 1L, 7.0, 0),
    ), out.toString)
  }

  test("intervalOverlapSelfJoin raises loudly on a precondition-violating interval") {
    import spark.implicits._
    // one interval longer than maxDur: band diff can exceed 1 and pairs
    // would silently vanish — the guard must fail the query instead
    val iv = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00")),
      (2L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")), // 3600s > 600s
    ).toDF("id", "k", "s", "e")
    val ex = intercept[Exception] {
      Temporal.intervalOverlapSelfJoin(iv, "id", "k", "s", "e", 600L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("maxDurSeconds")), ex.toString)
  }
}
