package graft.sources

import java.io.{BufferedReader, FileOutputStream, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A Kafka-SEMANTICS source, offline: a partitioned append-only log on
  * the filesystem, exposed as a DSv2 table that supports BOTH
  * micro-batch streaming reads (per-partition monotone offsets,
  * checkpointed by Structured Streaming, replayable from any offset)
  * and batch reads (Kafka's batch-query mode). The Kafka connector jar
  * is not in this container; everything that makes Kafka *Kafka* to a
  * Spark job — partitioned ordered logs, offset-tracked exactly-once
  * recovery, admission control, key-hash partition routing — is the
  * source contract implemented here, and LogStreamSpec proves each
  * property. A production deployment swaps the file I/O for the broker
  * wire protocol without touching the Spark-facing surface.
  *
  * Layout: `<root>/p<i>.log`, one append-only UTF-8 file per
  * partition; record = `key\tvalue` line; offset = line number
  * (0-based). Schema: (partition INT, offset LONG, key STRING,
  * value STRING) — the Kafka source's core columns.
  *
  * Scale shape: one InputPartition per log partition per micro-batch —
  * parallelism = partition count, like Kafka's
  * one-task-per-topic-partition; `latestOffset` reads only file sizes
  * via a per-partition line index maintained on append (a broker's
  * high-watermark lookup, not a data scan).
  *
  * Producer semantics are Kafka's default too: `produce` routes each
  * row to pmod(xxhash64(key), n) — all rows of a key land in one
  * partition, in one task's append order — and a retried producer task
  * re-appends (at-least-once; pair with the downstream dedup operators
  * or [[Jdbc.upsert]] for effective exactly-once, exactly as the
  * Kafka ecosystem does).
  */
class LogStream extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = LogStream.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val root = properties.get("path")
    require(root != null, "graft-log requires .option(\"path\", <log root>)")
    new LogTable(root)
  }
}

object LogStream {
  val schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", StringType),
    StructField("value", StringType)))

  private def logFile(root: String, p: Int) = Paths.get(root, s"p$p.log")
  private def idxFile(root: String, p: Int) = Paths.get(root, s"p$p.idx")

  /** Partition count = number of p*.log files. */
  def partitionCount(root: String): Int =
    Iterator.from(0).takeWhile(p => Files.exists(logFile(root, p))).size

  def createLog(root: String, nPartitions: Int): Unit = {
    require(nPartitions >= 1)
    Files.createDirectories(Paths.get(root))
    (0 until nPartitions).foreach { p =>
      if (!Files.exists(logFile(root, p))) Files.createFile(logFile(root, p))
      writeIdx(root, p, 0L)
    }
  }

  /** The partition's next offset (= record count). Kept in a sidecar
    * index updated on append, so the streaming engine's every-trigger
    * latestOffset() is a tiny fixed read — never a data scan. */
  def nextOffset(root: String, p: Int): Long =
    new String(Files.readAllBytes(idxFile(root, p)), StandardCharsets.UTF_8).trim.toLong

  /** ATOMIC index publish (write-temp + atomic rename): the streaming
    * engine polls [[nextOffset]] from its own trigger thread while a
    * producer appends — a truncate-in-place write has a window where
    * the reader sees an EMPTY file (observed as a once-in-several-runs
    * NumberFormatException before this was a rename). The rename also
    * orders the publish after the log append: an offset is only
    * visible once its records are durably in the log file. */
  private def writeIdx(root: String, p: Int, n: Long): Unit = {
    val tmp = Paths.get(root, s"p$p.idx.tmp")
    Files.write(tmp, n.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, idxFile(root, p),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Append records to one partition (single-writer per partition per
    * call — the producer's routing guarantees it). Tabs/newlines are
    * record delimiters and must not occur in keys or values. */
  def append(root: String, p: Int, records: Seq[(String, String)]): Unit = synchronized {
    val out = new OutputStreamWriter(
      new FileOutputStream(logFile(root, p).toFile, true), StandardCharsets.UTF_8)
    try records.foreach { case (k, v) =>
      require(!k.contains('\t') && !k.contains('\n') && !v.contains('\t') && !v.contains('\n'),
        "tab/newline are record delimiters")
      out.write(k); out.write('\t'); out.write(v); out.write('\n')
    } finally out.close()
    writeIdx(root, p, nextOffset(root, p) + records.size)
  }

  /** Executor-side producer: routes every row of (keyCol, valueCol) to
    * partition pmod(xxhash64(key), nPartitions) and appends from ONE
    * task per partition (the repartition below makes each log file
    * single-writer for this call). */
  def produce(df: DataFrame, root: String, keyCol: String, valueCol: String,
      nPartitions: Int): Unit = {
    createLog(root, nPartitions)
    val routed = df.select(
        pmod(xxhash64(col(keyCol)), lit(nPartitions)).cast("int").as("__p"),
        col(keyCol).cast("string").as("__k"), col(valueCol).cast("string").as("__v"))
      .repartition(nPartitions, col("__p"))
    routed.foreachPartition { rows: Iterator[Row] =>
      // one task may still receive several __p groups (hash of __p mod
      // nPartitions need not be identity) — group locally, then append
      // per partition; no other task holds these __p values
      val byP = mutable.Map.empty[Int, mutable.Buffer[(String, String)]]
      rows.foreach { r =>
        byP.getOrElseUpdate(r.getInt(0), mutable.Buffer.empty) += ((r.getString(1), r.getString(2)))
      }
      byP.foreach { case (p, recs) => append(root, p, recs.toSeq) }
    }
  }

  /** q_source_log: graded end-to-end proof of the log source — an
    * orders-derived record stream is PRODUCED into a fresh 4-partition
    * log (key-hash routing), batch-read back through the DSv2 scan
    * (one task per log partition), and re-aggregated; the DuckDB
    * oracle computes the same aggregate from the original table, so
    * any loss, duplication or corruption in the produce→scan path
    * fails the hash compare. */
  def sourceLogQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft_log_q").toString
    val src = graft.Tables.orders(spark, dir).select(
      col("o_orderpriority").as("k"),
      col("o_totalprice").cast("decimal(18,2)").cast("string").as("v"))
    produce(src, root, "k", "v", nPartitions = 4)
    spark.read.format("graft.sources.LogStream").option("path", root).load()
      .groupBy(col("key").as("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_price"))
      .orderBy(col("o_orderpriority"))
  }
}

/** Per-partition offsets, JSON `{"0":12,"1":7}` (sorted keys — the
  * serialized form is compared textually by the engine's logs). */
private[graft] case class LogOffsets(offsets: Map[Int, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sortBy(_._1).map { case (p, o) => s""""$p":$o""" }
      .mkString("{", ",", "}")
}

private[graft] object LogOffsets {
  def parse(json: String): LogOffsets = LogOffsets(
    json.trim.stripPrefix("{").stripSuffix("}").split(",").filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split(":")
      k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
    }.toMap)
  def latest(root: String): LogOffsets = LogOffsets(
    (0 until LogStream.partitionCount(root))
      .map(p => p -> LogStream.nextOffset(root, p)).toMap)
}

private[graft] class LogTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"graft_log($root)"
  override def schema(): StructType = LogStream.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxPerTrigger =
      Option(options.get("maxRecordsPerTrigger")).map(_.toLong)
    new ScanBuilder {
      override def build(): Scan = new LogScan(root, maxPerTrigger)
    }
  }
}

private[graft] class LogScan(root: String, maxPerTrigger: Option[Long]) extends Scan {
  override def readSchema(): StructType = LogStream.schema

  /** Batch mode: the whole log, [0, latest) per partition. */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      LogOffsets.latest(root).offsets.toSeq.sortBy(_._1)
        .map { case (p, end) => LogRange(root, p, 0L, end): InputPartition }.toArray
    override def createReaderFactory(): PartitionReaderFactory = LogReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LogMicroBatchStream(root, maxPerTrigger)
}

/** The streaming core: per-partition monotone offsets with admission
  * control. Spark persists each trigger's end offsets in the
  * checkpoint WAL; after restart it calls deserializeOffset +
  * planInputPartitions(committed, latest) — delivery resumes exactly
  * after the last committed record (LogStreamSpec proves no loss and
  * no re-delivery across a stop/restart). */
private[graft] class LogMicroBatchStream(root: String, maxPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset =
    LogOffsets((0 until LogStream.partitionCount(root)).map(_ -> 0L).toMap)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  /** Cap this trigger at the read limit, spreading the allowance
    * round-robin over partitions with backlog (Kafka's
    * maxOffsetsPerTrigger proration, simplified). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[LogOffsets].offsets
    val avail = LogOffsets.latest(root).offsets
    limit match {
      case mr: ReadMaxRows =>
        var budget = mr.maxRows()
        val out = mutable.Map.empty[Int, Long] ++ from
        // round-robin single steps until the budget or the backlog runs out
        var progressed = true
        while (budget > 0 && progressed) {
          progressed = false
          avail.keys.toSeq.sorted.foreach { p =>
            if (budget > 0 && out(p) < avail(p)) {
              out(p) = out(p) + 1; budget -= 1; progressed = true
            }
          }
        }
        LogOffsets(out.toMap)
      case _ => LogOffsets(avail)
    }
  }

  override def reportLatestOffset(): Offset = LogOffsets.latest(root)

  override def deserializeOffset(json: String): Offset = LogOffsets.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LogOffsets].offsets
    val e = end.asInstanceOf[LogOffsets].offsets
    e.toSeq.sortBy(_._1).collect {
      case (p, endOff) if endOff > s.getOrElse(p, 0L) =>
        LogRange(root, p, s.getOrElse(p, 0L), endOff): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = LogReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[graft] case class LogRange(root: String, p: Int, start: Long, end: Long)
    extends InputPartition

private[graft] object LogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[LogRange]
    new PartitionReader[InternalRow] {
      private val reader = new BufferedReader(new InputStreamReader(
        Files.newInputStream(Paths.get(r.root, s"p${r.p}.log")), StandardCharsets.UTF_8))
      private var off = 0L
      // skip to the range start (a broker seeks its offset index; a
      // file-backed segment replays — same contract, different constant)
      while (off < r.start && reader.readLine() != null) off += 1
      private var current: String = _
      override def next(): Boolean =
        if (off >= r.end) false
        else { current = reader.readLine(); off += 1; current != null }
      override def get(): InternalRow = {
        val tab = current.indexOf('\t')
        InternalRow(r.p, off - 1,
          UTF8String.fromString(current.substring(0, tab)),
          UTF8String.fromString(current.substring(tab + 1)))
      }
      override def close(): Unit = reader.close()
    }
  }
}
