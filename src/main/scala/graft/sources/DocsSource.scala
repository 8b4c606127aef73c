package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 connector (SURVEY.md §13): the source-side tier
  * of the §8 escalation ladder — the engine doesn't just consume
  * Spark's built-in formats, it shows how a NEW storage system plugs in
  * with the three scan optimizations a 100 TB connector must implement:
  *
  *   - FILTER PUSHDOWN ([[SupportsPushDownFilters]]): id-range
  *     predicates are absorbed into the scan's [lo, hi) bounds and
  *     reported handled, so Spark plans no post-scan Filter for them.
  *   - PARTITION PRUNING: input splits are planned over the FULL id
  *     domain, then splits outside the pushed bounds are dropped —
  *     `planInputPartitions()` shrinks, the DSv2 analog of Hive
  *     partition / parquet row-group pruning.
  *   - COLUMN PRUNING ([[SupportsPushDownRequiredColumns]]): the reader
  *     materializes only requested columns; the md5 digest behind
  *     cat/val/payload is never computed for an id-only projection.
  *
  * The table itself is a deterministic synthetic corpus so correctness
  * is oracle-checkable end to end: row i has
  *   id      = i
  *   h       = lowercase md5 hex of the DECIMAL string of i
  *   cat     = 'c' + (hex(h[0:8]) % 8)
  *   val     = hex(h[8:16]) % 1000
  *   payload = h[16:24]
  * MD5-of-string and integer arithmetic are bit-identical in any
  * engine (the simhash-oracle portability argument, Oracle.scala), so
  * DuckDB replays the generator with range() + a hex digit fold and
  * the full scan→filter→aggregate pipeline hash-matches.
  */
class DocsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = DocsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = properties.asScala
    new DocsTable(
      nrows = opts.getOrElse("nrows", "1024").toLong,
      slices = opts.getOrElse("slices", "8").toInt)
  }
}

object DocsSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("cat", StringType, nullable = false),
    StructField("val", LongType, nullable = false),
    StructField("payload", StringType, nullable = false),
  ))

  /** Rows materialized by the ROW reader since JVM start — local-mode
    * test instrumentation (executors share the JVM on local[*]): the
    * aggregate-pushdown spec asserts this does not move when
    * count/min/max are answered from the scan bounds. */
  private[graft] val rowsGenerated = new java.util.concurrent.atomic.AtomicLong(0L)

  /** One row of the generator contract — shared by the partition reader
    * and the spec's hand-computed fixtures. */
  private[graft] def genRow(i: Long): (Long, String, Long, String) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(i.toString.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    val h1 = java.lang.Long.parseLong(h.substring(0, 8), 16)
    val h2 = java.lang.Long.parseLong(h.substring(8, 16), 16)
    (i, "c" + (h1 % 8), h2 % 1000, h.substring(16, 24))
  }

  /** The graded query (q_source_dsv2): scan the connector with an
    * id-range + category filter and aggregate — exercising pushdown,
    * split pruning and column pruning in one plan. `dir` is unused: the
    * source is its own (deterministic) storage. */
  def dsv2Query(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft.sources.DocsSource")
      .option("nrows", 20000).option("slices", 16).load()
      .filter(col("id") >= 2500 && col("id") < 17500
        && col("cat").isin("c1", "c3", "c5"))
      .groupBy(col("cat"))
      .agg(count(lit(1)).as("n"), sum(col("val")).as("sum_val"),
        min(col("payload")).as("min_payload"))
      .orderBy(col("cat"))

  /** The aggregate-pushdown query (q_source_dsv2_agg): global
    * count/min/max over a pushed id range answers ENTIRELY from the
    * scan bounds — zero generator rows materialize (DsV2SourceSpec
    * asserts the row counter), the DSv2 analog of a metadata-only
    * count(*) over parquet footers. */
  def dsv2AggQuery(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft.sources.DocsSource")
      .option("nrows", 20000).option("slices", 16).load()
      .filter(col("id") >= 2500 && col("id") < 17500)
      .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
}

private[graft] class DocsTable(nrows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_docs($nrows)"
  override def schema(): StructType = DocsSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocsScanBuilder(nrows, slices)
}

private[graft] class DocsScanBuilder(nrows: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {
  private var lo: Long = 0L
  private var hi: Long = nrows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = DocsSource.schema
  private var aggSpecs: Option[Seq[DocsAggScan.Spec]] = None

  /** Absorb id-range predicates into [lo, hi); everything else stays
    * post-scan. Returned array = filters Spark must STILL apply — an
    * accepted range filter is fully enforced by the bounds, so it is
    * handled exactly (no re-evaluation needed). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, rest) = filters.partition {
      case EqualTo("id", _: Long | _: Int) => true
      case GreaterThan("id", _: Long | _: Int) => true
      case GreaterThanOrEqual("id", _: Long | _: Int) => true
      case LessThan("id", _: Long | _: Int) => true
      case LessThanOrEqual("id", _: Long | _: Int) => true
      case IsNotNull("id") => true // schema is non-null: vacuously true
      case _ => false
    }
    def num(v: Any): Long = v match { case l: Long => l; case i: Int => i.toLong }
    handled.foreach {
      case EqualTo("id", v) => lo = math.max(lo, num(v)); hi = math.min(hi, num(v) + 1)
      case GreaterThan("id", v) => lo = math.max(lo, num(v) + 1)
      case GreaterThanOrEqual("id", v) => lo = math.max(lo, num(v))
      case LessThan("id", v) => hi = math.min(hi, num(v))
      case LessThanOrEqual("id", v) => hi = math.min(hi, num(v) + 1)
      case IsNotNull(_) => ()
      case f => throw new IllegalStateException(s"unreachable: $f")
    }
    pushed = handled
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COMPLETE aggregate pushdown for global count(*)/min(id)/max(id):
    * the id domain is exactly [lo, hi) after filter pushdown, so all
    * three are metadata arithmetic — no row is ever generated (the
    * DSv2 analog of answering count(*) from parquet footers). Spark
    * only attempts this when every filter was pushed (no post-scan
    * Filter sits between the aggregate and the scan), so absorbing the
    * bounds is sufficient for exactness; anything else (group-bys,
    * other columns, other functions) is declined and runs as a normal
    * scan + aggregate. */
  /** PURE acceptability check — supportCompletePushDown may be probed
    * without a commitment to push, so it must not flip build()'s mode. */
  private def planSpecs(aggregation: Aggregation): Option[Seq[DocsAggScan.Spec]] = {
    def isId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case nr: NamedReference => nr.fieldNames.toSeq == Seq("id")
        case _ => false
      }
    if (aggregation.groupByExpressions.nonEmpty) return None
    val specs = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(DocsAggScan.CountStarSpec)
      case m: Min if isId(m.column) => Some(DocsAggScan.MinIdSpec)
      case m: Max if isId(m.column) => Some(DocsAggScan.MaxIdSpec)
      case _ => None
    }
    if (specs.exists(_.isEmpty)) None else Some(specs.flatten)
  }
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val s = planSpecs(aggregation)
    s.foreach(x => aggSpecs = Some(x))
    s.isDefined
  }
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    planSpecs(aggregation).isDefined

  override def build(): Scan = aggSpecs match {
    case Some(specs) => new DocsAggScan(lo, hi, specs, pushed)
    case None => new DocsScan(nrows, slices, lo, hi, pushed, required)
  }
}

private[graft] object DocsAggScan {
  sealed trait Spec
  case object CountStarSpec extends Spec
  case object MinIdSpec extends Spec
  case object MaxIdSpec extends Spec
}

/** Scan for a completely-pushed global aggregate: ONE partition, ONE
  * row, computed from the [lo, hi) bounds alone — `rowsGenerated`
  * stays untouched, which the spec asserts. Empty range ⇒ count 0 and
  * SQL-standard NULL min/max. */
private[graft] class DocsAggScan(private[graft] val lo: Long, private[graft] val hi: Long,
    specs: Seq[DocsAggScan.Spec], pushed: Array[Filter]) extends Scan with Batch {
  import DocsAggScan._
  override def readSchema(): StructType = StructType(specs.zipWithIndex.map {
    case (CountStarSpec, i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
  })
  override def description(): String =
    s"graft_docs AGG bounds=[$lo,$hi) specs=${specs.mkString(",")} " +
      s"PushedFilters: ${pushed.mkString("[", ", ", "]")}"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(DocsPartition(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory =
    new DocsAggReaderFactory(specs)
}

private[graft] class DocsAggReaderFactory(specs: Seq[DocsAggScan.Spec])
    extends PartitionReaderFactory {
  import DocsAggScan._
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DocsPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = {
        val empty = p.end <= p.start
        new GenericInternalRow(specs.map {
          case CountStarSpec => (if (empty) 0L else p.end - p.start): Any
          case MinIdSpec => if (empty) null else p.start
          case MaxIdSpec => if (empty) null else p.end - 1
        }.toArray)
      }
      override def close(): Unit = ()
    }
  }
}

private[graft] class DocsScan(nrows: Long, slices: Int,
    private[graft] val lo: Long, private[graft] val hi: Long,
    pushed: Array[Filter], required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft_docs nrows=$nrows bounds=[$lo,$hi) PushedFilters: ${pushed.mkString("[", ", ", "]")}"
  override def toBatch: Batch = this

  /** Splits are planned over the FULL [0, nrows) domain, then pruned
    * against the pushed bounds — so a pushed id range demonstrably
    * removes whole input partitions (the spec asserts the count). */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (nrows + slices - 1) / slices)
    (0L until nrows by per).flatMap { start =>
      val s = math.max(start, lo)
      val e = math.min(start + per, hi)
      if (s < e) Some(DocsPartition(s, e): InputPartition) else None
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new DocsReaderFactory(required)
}

private[graft] case class DocsPartition(start: Long, end: Long) extends InputPartition

private[graft] class DocsReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DocsPartition]
    new PartitionReader[InternalRow] {
      // column pruning, enforced: the md5 digest is only computed when a
      // derived column survives pruning — an id-only projection is pure
      // counter arithmetic
      private val needsDigest = required.fieldNames.exists(n => n != "id")
      private val fields = required.fieldNames
      private var i = p.start - 1
      override def next(): Boolean = {
        i += 1
        if (i < p.end) { DocsSource.rowsGenerated.incrementAndGet(); true } else false
      }
      override def get(): InternalRow = {
        val (id, cat, v, pay) =
          if (needsDigest) DocsSource.genRow(i) else (i, null, 0L, null)
        new GenericInternalRow(fields.map {
          case "id" => id: Any
          case "cat" => UTF8String.fromString(cat)
          case "val" => v
          case "payload" => UTF8String.fromString(pay)
        })
      }
      override def close(): Unit = ()
    }
  }
}
