package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** One reader per table. Explicit schema: skips footer merging across
  * the (at 100 TB: many thousands of) files of a production table and
  * pins types so downstream plans never re-resolve.
  *
  * Column pruning and predicate pushdown happen downstream via Catalyst
  * — callers just `.select`/`.filter` and the parquet scan narrows
  * (verify with `.explain("formatted")`: ReadSchema / PushedFilters).
  */
object Tables {

  private def read(spark: SparkSession, dir: String, name: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region", Schemas.region)
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation", Schemas.nation)
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier", Schemas.supplier)
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer", Schemas.customer)
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part", Schemas.part)
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders", Schemas.orders)
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem", Schemas.lineitem)
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects outright
    * (PARQUET_TYPE_ILLEGAL). Read it as a nanosecond Long (legacy flag) and
    * convert via integer division — `ts DIV 1000` then timestamp_micros —
    * which is exact (the generator emits µs-precision values; and double
    * division would be lossy anyway: 2024 epoch-ns ≈ 1.7e18 > 2^53).
    *
    * SESSION-WIDE SIDE EFFECT: this sets spark.sql.legacy.parquet
    * .nanosAsLong for the whole session (the flag is read at scan
    * planning, not per-reader) — after the first call, any OTHER
    * TIMESTAMP(NANOS) parquet read in the session yields Longs instead
    * of failing. Graft's own mains (Verify/Bench) set the flag at
    * session build so behavior is order-independent; external callers
    * embedding this library should do the same. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.schema(Schemas.eventsRaw)
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents", Schemas.documents)
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings", Schemas.embeddings)
}
