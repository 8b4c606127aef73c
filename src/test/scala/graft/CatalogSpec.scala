package graft

import org.apache.spark.sql.functions._

/** Catalog / DDL surface: managed tables behave like any warehouse's —
  * CTAS, INSERT INTO (append), catalog metadata, DROP. The session uses
  * the in-memory catalog; the database pins its LOCATION under /tmp so
  * managed-table data never lands in the repo tree.
  */
class CatalogSpec extends SparkSpec {

  test("managed table lifecycle: CTAS, INSERT INTO, catalog metadata, DROP") {
    val loc = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_ddl LOCATION '$loc'")
    try {
      spark.sql("DROP TABLE IF EXISTS graft_ddl.orders_top")
      spark.sql(
        """CREATE TABLE graft_ddl.orders_top USING parquet AS
          |SELECT o_orderkey, o_custkey, o_totalprice
          |FROM parquet.`/root/testdata/sf0.001/orders.parquet`
          |WHERE o_totalprice > 400000.0""".stripMargin)
      val ctasCount = spark.table("graft_ddl.orders_top").count()
      assert(ctasCount > 0)

      // INSERT INTO appends through the same table identity
      spark.sql("INSERT INTO graft_ddl.orders_top VALUES (9999999, 1, 500000.0)")
      assert(spark.table("graft_ddl.orders_top").count() == ctasCount + 1)
      assert(spark.table("graft_ddl.orders_top")
        .filter(col("o_orderkey") === 9999999L).count() == 1)

      // catalog metadata is queryable
      assert(spark.catalog.tableExists("graft_ddl.orders_top"))
      val cols = spark.catalog.listColumns("graft_ddl.orders_top")
        .collect().map(_.name).toSet
      assert(cols == Set("o_orderkey", "o_custkey", "o_totalprice"))

      // and the reverse direction: DESCRIBE runs as SQL
      val described = spark.sql("DESCRIBE TABLE graft_ddl.orders_top")
        .collect().map(_.getString(0)).toSet
      assert(described.contains("o_totalprice"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_ddl.orders_top")
      spark.sql("DROP DATABASE IF EXISTS graft_ddl")
      assert(!spark.catalog.databaseExists("graft_ddl"))
    }
  }

  test("file-path SQL: parquet.`path` tables query without registration") {
    val n = spark.sql(
      "SELECT count(*) AS n FROM parquet.`/root/testdata/sf0.001/region.parquet`")
      .collect().head.getLong(0)
    assert(n == 5L)
  }

  test("parameterized SQL: named and positional parameters bind without string splicing") {
    // the injection-safe SQL entry point (Spark 3.4+): parameters are
    // bound as literals by the parser, not interpolated into the text
    val named = spark.sql(
      "SELECT count(*) AS n FROM parquet.`/root/testdata/sf0.001/orders.parquet` " +
        "WHERE o_totalprice > :lo AND o_orderpriority = :prio",
      Map("lo" -> 500000.0, "prio" -> "1-URGENT"))
      .collect().head.getLong(0)
    val spliced = spark.sql(
      "SELECT count(*) AS n FROM parquet.`/root/testdata/sf0.001/orders.parquet` " +
        "WHERE o_totalprice > 500000.0 AND o_orderpriority = '1-URGENT'")
      .collect().head.getLong(0)
    assert(named === spliced)
    val positional = spark.sql(
      "SELECT count(*) AS n FROM parquet.`/root/testdata/sf0.001/orders.parquet` " +
        "WHERE o_totalprice > ? AND o_orderpriority = ?",
      Array(500000.0, "1-URGENT"))
      .collect().head.getLong(0)
    assert(positional === spliced)
  }
}
