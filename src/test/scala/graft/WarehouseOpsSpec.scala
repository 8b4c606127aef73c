package graft

import graft.api.Upsert
import graft.sources.Maintenance
import org.apache.spark.sql.functions._

/** Warehouse operations: merge/upsert semantics, tombstone deletes, and
  * small-file compaction. */
class WarehouseOpsSpec extends SparkSpec {

  test("upsert keeps the latest version per key; update wins ties") {
    import spark.implicits._
    val existing = Seq((1L, "old", 1L), (2L, "keep", 5L)).toDF("id", "v", "version")
    val updates = Seq((1L, "new", 2L), (3L, "ins", 1L), (2L, "tie", 5L)).toDF("id", "v", "version")
    val merged = Upsert.upsert(existing, updates, Seq("id"), "version")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(merged == Map(1L -> "new", 2L -> "tie", 3L -> "ins"))
  }

  test("upsert is idempotent: re-applying the same batch changes nothing") {
    import spark.implicits._
    val existing = Seq((1L, "a", 1L)).toDF("id", "v", "version")
    val updates = Seq((1L, "b", 2L)).toDF("id", "v", "version")
    val once = Upsert.upsert(existing, updates, Seq("id"), "version")
    val twice = Upsert.upsert(once, updates, Seq("id"), "version")
    assert(once.collect().toSeq == twice.collect().toSeq)
  }

  test("applyDeletes drops tombstoned keys only") {
    import spark.implicits._
    val existing = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val dead = Seq(Tuple1(2L)).toDF("id")
    val left = Upsert.applyDeletes(existing, dead, Seq("id"))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(left == Seq(1L, 3L))
  }

  test("compact rewrites many small files into the target count, same rows") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft_cin").toString
    val out = java.nio.file.Files.createTempDirectory("graft_cout").toString
    (1 to 1000).toDF("x").repartition(50).write.mode("overwrite").parquet(in)
    val before = Maintenance.tableStats(spark, in).head
    assert(before.getLong(1) >= 40, s"setup should create many files, got ${before.getLong(1)}")
    Maintenance.compact(spark, in, out, targetRowsPerFile = 500)
    val after = Maintenance.tableStats(spark, out).head
    assert(after.getLong(1) <= 3, s"expected ~2 files, got ${after.getLong(1)}")
    assert(after.getLong(3) == 1000)
    assert(spark.read.parquet(out).agg(sum($"x")).head.getLong(0) == 500500)
  }

  test("mergeInto: update/delete/insert/keep resolve per key in one pass") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("id", "v", "price")
    val changes = Seq(
      (2L, "update", "B", 22.0),  // matched update
      (3L, "delete", "", 0.0),    // matched delete
      (5L, "insert", "e", 50.0),  // unmatched insert
    ).toDF("id", "op", "v", "price")
    val got = Upsert.mergeInto(target, changes, "id")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getString(3)))).toMap
    assert(got === Map(
      1L -> (("a", 10.0, "keep")),
      2L -> (("B", 22.0, "update")),
      4L -> (("d", 40.0, "keep")),
      5L -> (("e", 50.0, "insert"))))
  }

  test("mergeInto edges: delete of an absent key is a no-op; insert on an existing key upserts") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val changes = Seq(
      (9L, "delete", "x"),   // absent key: must not surface a phantom row
      (2L, "insert", "b2"),  // existing key: insert degrades to replace (upsert)
    ).toDF("id", "op", "v")
    val got = Upsert.mergeInto(target, changes, "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set((1L, "a", "keep"), (2L, "b2", "insert")))
  }

  test("mergeInto rejects malformed op values instead of silently no-op'ing") {
    import spark.implicits._
    val target = Seq((1L, "a")).toDF("id", "v")
    val changes = Seq((1L, "updte", "A")).toDF("id", "op", "v")  // typo'd op
    val e = intercept[Exception] {
      Upsert.mergeInto(target, changes, "id").collect()
    }
    assert(e.getMessage.contains("invalid op") || e.getMessage.contains("updte"),
      e.getMessage)
  }
}
