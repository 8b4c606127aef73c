package graft

import java.nio.file.Files

import graft.sources.Jdbc
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Real JDBC sink/source against embedded Derby (the one JDBC engine
  * inside the Spark distribution's own jars — SURVEY §2.1's external
  * DB sink, previously blocked-as-contract, now exercised for real):
  * batch write+read roundtrip, partitioned parallel read, keyed MERGE
  * upsert idempotency (the at-least-once → exactly-once landing
  * contract of graft.api.Sinks), and the streaming foreachBatch sink.
  */
class JdbcSpec extends SparkSpec {

  private def freshDb(): String =
    Files.createTempDirectory("graft_jdbc").resolve("db").toString

  test("batch write + read roundtrip preserves values and schema") {
    import spark.implicits._
    val url = Jdbc.derbyUrl(freshDb())
    val df = Seq((1L, "alpha", BigDecimal("10.50")), (2L, "beta", BigDecimal("0.25")),
      (3L, "gamma", BigDecimal("7.00")))
      .toDF("id", "name", "amount")
      .select($"id", $"name", $"amount".cast("decimal(12,2)"))
    Jdbc.writeTable(df, url, "t_round", SaveMode.Overwrite,
      columnTypes = Some("name VARCHAR(64)"))
    val back = Jdbc.readTable(spark, url, "t_round")
      .select($"ID".as("id"), $"NAME".as("name"), $"AMOUNT".as("amount"))
    assert(back.count() === 3)
    val got = back.orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDecimal(2).toPlainString)).toSeq
    assert(got === Seq((1L, "alpha", "10.50"), (2L, "beta", "0.25"), (3L, "gamma", "7.00")))
  }

  test("partitioned read issues N parallel ranges and loses no rows") {
    import spark.implicits._
    val url = Jdbc.derbyUrl(freshDb())
    val df = (1L to 1000L).toDF("id").withColumn("v", col("id") * 2)
    Jdbc.writeTable(df, url, "t_part", SaveMode.Overwrite)
    val back = Jdbc.readTablePartitioned(spark, url, "t_part",
      partitionColumn = "ID", lowerBound = 1, upperBound = 1000, numPartitions = 4)
    assert(back.rdd.getNumPartitions === 4)
    assert(back.count() === 1000)
    // rows OUTSIDE the bounds still arrive via the open-ended end ranges
    val url2 = Jdbc.derbyUrl(freshDb())
    Jdbc.writeTable(df.withColumn("id", col("id") * 10), url2, "t_part", SaveMode.Overwrite)
    val back2 = Jdbc.readTablePartitioned(spark, url2, "t_part",
      partitionColumn = "ID", lowerBound = 100, upperBound = 200, numPartitions = 3)
    assert(back2.count() === 1000)
    assert(back2.agg(sum("V")).as[Long].head === (1L to 1000L).map(_ * 2).sum)
  }

  test("upsert is a keyed merge: replay-idempotent, updates non-keys") {
    import spark.implicits._
    val url = Jdbc.derbyUrl(freshDb())
    val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "tag", "score")
    Jdbc.upsert(v1, url, "t_up", Seq("k"))
    // replay the SAME batch — at-least-once delivery must not duplicate
    Jdbc.upsert(v1, url, "t_up", Seq("k"))
    // new batch: updates k=2, inserts k=3
    val v2 = Seq((2L, "b2", 25.0), (3L, "c", 30.0)).toDF("k", "tag", "score")
    Jdbc.upsert(v2, url, "t_up", Seq("k"))
    val got = Jdbc.readTable(spark, url, "t_up")
      .orderBy($"K").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got === Seq((1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 30.0)))
  }

  test("upsert handles composite keys and decimal/date payloads") {
    import spark.implicits._
    val url = Jdbc.derbyUrl(freshDb())
    val df = Seq((1L, "us", java.sql.Date.valueOf("2024-01-01"), BigDecimal("99.99")),
      (1L, "eu", java.sql.Date.valueOf("2024-01-02"), BigDecimal("1.01")))
      .toDF("id", "region", "day", "rev")
      .select($"id", $"region", $"day", $"rev".cast("decimal(10,2)"))
    Jdbc.upsert(df, url, "t_comp", Seq("id", "region"))
    Jdbc.upsert(df.withColumn("rev", $"rev" + 1), url, "t_comp", Seq("id", "region"))
    val got = Jdbc.readTable(spark, url, "t_comp").orderBy($"REGION")
      .collect().map(r => (r.getString(1), r.getDecimal(3).toPlainString)).toSeq
    assert(got === Seq(("eu", "2.01"), ("us", "100.99")))
  }

  test("streaming foreachBatch upsert lands exactly-once table state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val url = Jdbc.derbyUrl(freshDb())
    val ckpt = Files.createTempDirectory("graft_jdbc_ckpt").toString
    val ms = MemoryStream[(Long, Double)]
    val agg = ms.toDF.toDF("user", "value")
      .groupBy($"user").agg(sum($"value").as("total"))
    val q = Jdbc.streamUpsert(agg, url, "t_stream", Seq("user"), ckpt)
    try {
      ms.addData((1L, 1.0), (2L, 2.0)); q.processAllAvailable()
      ms.addData((1L, 4.0)); q.processAllAvailable()
    } finally q.stop()
    val got = Jdbc.readTable(spark, url, "t_stream").orderBy($"USER")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === Seq((1L, 5.0), (2L, 2.0)))
  }
}
