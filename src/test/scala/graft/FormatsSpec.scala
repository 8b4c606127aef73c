package graft

import graft.sources.Formats
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink round-trips (SURVEY.md §2.1 q_scan_csv_json as a unit
  * test): values — including timestamps — must survive CSV and JSONL
  * round-trips bit-for-bit under the explicit schemas; partitioned
  * parquet must prune partitions at the scan. */
class FormatsSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_fmt").toString

  private lazy val ordersSlice = {
    import spark.implicits._
    Seq(
      (1L, 10L, "O", 1234.56, ts("1997-03-15 00:00:00"), "1-URGENT"),
      (2L, 11L, "F", 99.99, ts("1998-07-01 00:00:00"), "5-LOW"),
      (3L, 10L, "P", 50000.0, ts("2000-01-31 00:00:00"), "3-MEDIUM"),
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("o_orderkey").collect().map(_.toSeq).toSeq

  test("CSV round-trip preserves all values incl. timestamps") {
    val dir = tmp()
    Formats.writeCsv(ordersSlice, dir)
    val back = Formats.readCsv(spark, dir, Schemas.orders)
    assert(sortedRows(back) == sortedRows(ordersSlice))
  }

  test("JSONL round-trip preserves all values") {
    val dir = tmp()
    Formats.writeJsonl(ordersSlice, dir)
    val back = Formats.readJsonl(spark, dir, Schemas.orders)
    assert(sortedRows(back) == sortedRows(ordersSlice))
  }

  test("ORC round-trip preserves all values; filters push to the scan") {
    import org.apache.spark.sql.functions.col
    val dir = tmp()
    Formats.writeOrc(ordersSlice, dir)
    val back = Formats.readOrc(spark, dir, Schemas.orders)
    assert(sortedRows(back) == sortedRows(ordersSlice))
    val filtered = back.filter(col("o_custkey") === 10L)
    assert(filtered.count() == 2)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("o_custkey"),
      scan.take(500))
  }

  test("partitioned parquet write prunes partitions at the scan") {
    import spark.implicits._
    val dir = tmp()
    Formats.writeParquet(ordersSlice, dir, partitionBy = Seq("o_orderstatus"))
    val schemaNoPart = StructType(Schemas.orders.filterNot(_.name == "o_orderstatus"))
    val back = spark.read.parquet(dir).filter($"o_orderstatus" === "O")
    assert(back.count() == 1)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("o_orderstatus"), plan.take(500))
  }

  test("schema evolution: mergeSchema unions columns across parquet generations") {
    import spark.implicits._
    // generation 1 writes (id, a); generation 2 adds column b — the
    // standard additive-evolution path a long-lived 100 TB table takes.
    // mergeSchema reconciles footers at read time: old files surface
    // the new column as NULL, and per-file schemas stay untouched.
    val dir = tmp()
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .write.mode("append").parquet(dir)
    Seq((3L, "z", 30L)).toDF("id", "a", "b")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet == Set("id", "a", "b"))
    val rows = merged.orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(rows == Seq((1L, "x", None), (2L, "y", None), (3L, "z", Some(30L))))
    // and WITHOUT mergeSchema the read still works on one footer's view
    val plain = spark.read.parquet(dir)
    assert(plain.count() == 3)
  }

  test("CSV read with schema ignores header row and keeps types") {
    val dir = tmp()
    Formats.writeCsv(ordersSlice, dir)
    val back = Formats.readCsv(spark, dir, Schemas.orders)
    assert(back.schema("o_orderdate").dataType == TimestampType)
    assert(back.schema("o_totalprice").dataType == DoubleType)
    assert(back.count() == 3)
  }
}
