package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/** JDBC sink/source — the reference genre's batch path lands query
  * results in a relational store (MySQL in the genre; embedded Derby
  * here, the one JDBC engine shipped inside the Spark distribution's
  * own jars, so the whole surface is REAL and testable offline — no
  * stand-in contract objects).
  *
  * Scale shape (the parts that survive a 1000-executor cluster):
  *
  *  - WRITES run from executors, one connection per partition, rows
  *    batched through `addBatch`/`executeBatch` — nothing funnels
  *    through the driver; parallelism = partition count. `coalesce`
  *    the DataFrame first if the target store can't take one
  *    connection per core.
  *  - READS use the built-in JDBC relation with
  *    partitionColumn/lowerBound/upperBound/numPartitions, so the scan
  *    is N parallel range queries, not one serial cursor. Filters
  *    still push down per partition (the relation compiles them into
  *    each range's WHERE).
  *  - UPSERT is per-partition batched update-then-insert keyed on the
  *    caller's key columns — the idempotent landing pattern
  *    [[graft.api.Sinks]] documents: micro-batch REPLAY after failure
  *    re-lands the same rows to the same final state (at-least-once
  *    delivery, exactly-once effect). A blind append sink would
  *    double-count on replay.
  *
  * Embedded Derby is single-JVM (perfect for local[32]; every
  * executor thread shares the engine). On a real cluster the same
  * code takes the store's client/server URL + driver class — only the
  * two string parameters change.
  */
object Jdbc {

  /** Derby's embedded driver (lives in derbytools.jar, already on the
    * Spark unmanaged classpath). */
  val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** Embedded single-JVM Derby database rooted at a directory. */
  def derbyUrl(dbDir: String): String = {
    // keep Derby's engine-wide log out of user.dir (it writes
    // derby.log in the working directory otherwise)
    if (System.getProperty("derby.stream.error.file") == null)
      System.setProperty("derby.stream.error.file",
        s"${System.getProperty("java.io.tmpdir")}/derby.log")
    s"jdbc:derby:$dbDir;create=true"
  }

  /** Land a DataFrame in a JDBC table via the built-in relation
    * writer (executor-side batched INSERTs; Overwrite recreates the
    * table). `columnTypes` optionally overrides created column DDL —
    * e.g. "k VARCHAR(64)" where the dialect default (Derby: CLOB for
    * StringType) would be wrong for a key column. */
  def writeTable(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Overwrite, driver: String = DerbyDriver,
      columnTypes: Option[String] = None, batchSize: Int = 1000): Unit = {
    val w = df.write.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .option("batchsize", batchSize.toString)
    columnTypes.fold(w)(t => w.option("createTableColumnTypes", t)).mode(mode).save()
  }

  /** Single-range JDBC read (small dimension tables). */
  def readTable(spark: SparkSession, url: String, table: String,
      driver: String = DerbyDriver): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .load()

  /** Parallel partitioned JDBC read: numPartitions concurrent range
    * queries over a numeric/date partition column — the only read
    * shape that scales past one cursor. Rows outside [lower, upper]
    * are still read (the first/last ranges are open-ended), so the
    * bounds need only be approximate. */
  def readTablePartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, driver: String = DerbyDriver): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .load()

  /** Spark → SQL DDL type for the engines this module targets (ANSI
    * names; Derby-compatible). Strings get VARCHAR, not the Derby
    * dialect's CLOB default — upsert keys must be comparable. */
  private def sqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INT"
    case ShortType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case d: DecimalType =>
      // Derby's max DECIMAL precision is 31; Spark sums can carry 38.
      // Clamp the declared precision, keep the scale — the VALUES are
      // unchanged, only the column's headroom shrinks.
      s"DECIMAL(${math.min(d.precision, 31)},${d.scale})"
    case StringType => "VARCHAR(4096)"
    case other => throw new IllegalArgumentException(
      s"no JDBC mapping for $other — project it to a scalar first")
  }

  /** Quoted identifier, folded to uppercase — matches what unquoted
    * identifiers resolve to, while surviving reserved words (USER,
    * ORDER, …) as column names. */
  private def qid(name: String): String = "\"" + name.toUpperCase + "\""

  /** CREATE TABLE with a PRIMARY KEY on the upsert key columns; no-op
    * if the table already exists (Derby SQLState X0Y32). */
  def ensureTable(schema: StructType, keyCols: Seq[String], url: String,
      table: String): Unit = {
    val cols = schema.fields.map { f =>
      val nn = if (keyCols.contains(f.name)) " NOT NULL" else ""
      s"${qid(f.name)} ${sqlType(f.dataType)}$nn"
    }.mkString(", ")
    val ddl = s"CREATE TABLE $table ($cols, PRIMARY KEY (${keyCols.map(qid).mkString(", ")}))"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(ddl)
      catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }
      finally st.close()
    } finally conn.close()
  }

  /** Idempotent batched upsert keyed on `keyCols`: each partition
    * opens one connection and, per `batchSize` chunk, runs one batched
    * UPDATE pass and then one batched INSERT pass for the rows the
    * UPDATE missed (executeBatch's per-row counts say which). Two
    * round-trips per chunk — the portable upsert shape (Derby's MERGE
    * rejects VALUES-derived sources; MySQL deployments can swap in
    * INSERT … ON DUPLICATE KEY UPDATE without touching callers).
    *
    * Replaying the same rows — a retried task, a replayed micro-batch
    * — re-lands the same final state. The input must carry at most one
    * row per key PER CALL (an aggregate by the key columns always
    * does); concurrent duplicate inserts across partitions would
    * otherwise race on the primary key. */
  def upsert(df: DataFrame, url: String, table: String, keyCols: Seq[String],
      batchSize: Int = 500): Unit = {
    val schema = df.schema
    require(keyCols.nonEmpty && keyCols.forall(schema.fieldNames.contains),
      s"keyCols $keyCols must be columns of ${schema.fieldNames.toSeq}")
    ensureTable(schema, keyCols, url, table)
    val fields = schema.fields
    val names = fields.map(_.name)
    val nonKey = names.filterNot(keyCols.contains)
    val keyIdx = keyCols.map(schema.fieldIndex).toArray
    val nonKeyIdx = nonKey.map(schema.fieldIndex).toArray
    val insertSql = s"INSERT INTO $table (${names.map(qid).mkString(", ")}) " +
      s"VALUES (${names.map(_ => "?").mkString(", ")})"
    // no non-key columns = pure insert-if-absent: probe membership with
    // a batched no-op UPDATE on the first key column
    val updateSql =
      if (nonKey.isEmpty)
        s"UPDATE $table SET ${qid(keyCols.head)} = ${qid(keyCols.head)} " +
          s"WHERE ${keyCols.map(k => s"${qid(k)} = ?").mkString(" AND ")}"
      else
        s"UPDATE $table SET ${nonKey.map(n => s"${qid(n)} = ?").mkString(", ")} " +
          s"WHERE ${keyCols.map(k => s"${qid(k)} = ?").mkString(" AND ")}"
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val up = conn.prepareStatement(updateSql)
          val ins = conn.prepareStatement(insertSql)
          try {
            rows.grouped(batchSize).foreach { chunk =>
              chunk.foreach { r =>
                var p = 1
                nonKeyIdx.foreach { i => up.setObject(p, r.get(i)); p += 1 }
                keyIdx.foreach { i => up.setObject(p, r.get(i)); p += 1 }
                up.addBatch()
              }
              val updated = up.executeBatch()
              var pending = 0
              chunk.iterator.zipWithIndex.foreach { case (r, j) =>
                if (updated(j) == 0) {
                  var i = 0
                  while (i < fields.length) { ins.setObject(i + 1, r.get(i)); i += 1 }
                  ins.addBatch(); pending += 1
                }
              }
              if (pending > 0) ins.executeBatch()
              conn.commit()
            }
          } finally { up.close(); ins.close() }
        } finally conn.close()
      }
    }
  }

  /** q_sink_jdbc: end-to-end JDBC sink proof, graded against the
    * DuckDB oracle — an orders aggregate is LANDED in a real JDBC
    * store (embedded Derby) via the executor-side batched writer,
    * then read back through the partitioned parallel read (4 range
    * queries). The oracle validates the aggregate itself, so any
    * value corruption in the store roundtrip (type mapping, decimal
    * scale, string truncation) fails the hash compare. Money follows
    * the repo DECIMAL convention (sum over DECIMAL(18,2), compared as
    * DOUBLE — Derby DOUBLE is IEEE 754 binary, exact roundtrip). */
  def sinkRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val agg = graft.Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_price"))
    val url = derbyUrl(
      java.nio.file.Files.createTempDirectory("graft_jdbc_q").resolve("db").toString)
    writeTable(agg, url, "prio_agg", SaveMode.Overwrite,
      columnTypes = Some("o_orderpriority VARCHAR(32)"))
    readTablePartitioned(spark, url, "prio_agg", "n_orders",
      lowerBound = 1L, upperBound = 1000000L, numPartitions = 4)
      .select(col("o_orderpriority").as("o_orderpriority"),
        col("n_orders").cast("long").as("n_orders"),
        col("total_price").cast("double").as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Stream → JDBC upsert sink: at-least-once micro-batch delivery
    * through [[upsert]]'s keyed write = exactly-once table state (the
    * [[graft.api.Sinks]] idempotency contract, realized against a
    * real store). */
  def streamUpsert(df: DataFrame, url: String, table: String,
      keyCols: Seq[String], checkpointDir: String): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsert(batch, url, table, keyCols)
      }
      .start()
}
