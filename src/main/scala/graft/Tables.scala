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
  /** events.ts has shipped in two physical shapes across testdata
    * generations: parquet TIMESTAMP(MICROS) (reads directly as
    * TimestampType) and nanosecond INT64 — either a plain int64 column
    * or TIMESTAMP(NANOS), which Spark 4 rejects (PARQUET_TYPE_ILLEGAL)
    * unless `spark.sql.legacy.parquet.nanosAsLong` maps it to LongType.
    * Hardcoding one unit silently shears the other by 1000× (the
    * round-5 regression: the testdata flipped ns→µs and `ts DIV 1000`
    * compressed every event into Jan 1970, 12 red oracle rows), so the
    * reader sniffs: infer the footer schema once per directory and
    * branch on the physical type of `ts`.
    *
    * The ns path converts via integer division — `ts DIV 1000` then
    * timestamp_micros — which is exact (generators emit µs-precision
    * values; double division would be lossy: 2024 epoch-ns ≈ 1.7e18 >
    * 2^53). The sniff result is memoized per path: one extra footer
    * read per table directory per JVM, nothing per query.
    *
    * SESSION-WIDE SIDE EFFECT: sets spark.sql.legacy.parquet.nanosAsLong
    * for the whole session (the flag is read at scan planning, not
    * per-reader, and must be on BEFORE inference or a TIMESTAMP(NANOS)
    * footer fails instead of inferring LongType) — after the first
    * call, any OTHER TIMESTAMP(NANOS) parquet read in the session
    * yields Longs instead of failing. Graft's own mains (Verify/Bench)
    * set the flag at session build so behavior is order-independent;
    * external callers embedding this library should do the same. */
  /** Memo key: canonical path (so relative/absolute spellings share an
    * entry) + the directory's lastModified (so regenerating the table
    * in place — Spark's write commits rename into the dir and bump its
    * mtime — invalidates the sniff instead of silently reusing a stale
    * unit, which would be the round-5 shear bug reintroduced for
    * long-lived sessions). */
  private val eventsTsKind =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), String]()

  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val f = new java.io.File(path)
    val kind = eventsTsKind.computeIfAbsent(
      (f.getCanonicalPath, f.lastModified), { case (p, _) =>
        val schema = spark.read.parquet(p).schema
        schema.find(_.name == "ts").map(_.dataType) match {
          case Some(org.apache.spark.sql.types.TimestampType) => "us"
          case Some(org.apache.spark.sql.types.TimestampNTZType) => "ntz"
          case Some(org.apache.spark.sql.types.LongType) => "ns"
          case other => throw new IllegalStateException(
            s"events.ts at $p has unsupported physical type " +
              s"${other.map(_.toString).getOrElse("<no ts column>")} " +
              "(expected TIMESTAMP(MICROS), TIMESTAMP_NTZ(MICROS) or nanosecond INT64)")
        }
      })
    kind match {
      case "us" => read(spark, dir, "events", Schemas.events)
      // NTZ (isAdjustedToUTC=false, the current driver testdata): the
      // wall-clock digits ARE the values — the DuckDB oracle reads them
      // naively. Casting NTZ→TIMESTAMP re-interprets those digits in the
      // session timezone, which graft pins to UTC (Verify/Bench session
      // build; embedding callers must do the same), so the cast is an
      // exact µs-preserving relabel, not a shift.
      case "ntz" => spark.read.schema(Schemas.eventsNtz).parquet(path)
        .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
      case "ns" => spark.read.schema(Schemas.eventsRaw).parquet(path)
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents", Schemas.documents)
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings", Schemas.embeddings)
}
