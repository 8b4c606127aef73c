package graft

import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, DataSourceV2ScanRelation}
import org.apache.spark.sql.functions._

import graft.sources.{DocsScan, DocsSource}

/** The custom DataSource V2 connector (graft.sources.DocsSource): the
  * generator contract, and — the part that matters at 100 TB — that the
  * three scan optimizations actually fire: id-range filters land in the
  * scan (not a post-scan Filter), whole input splits are pruned, and an
  * id-only projection never computes the md5 digest (asserted via the
  * pruned read schema the reader branches on).
  */
class DsV2SourceSpec extends SparkSpec {

  private def docs(nrows: Long, slices: Int = 8) =
    spark.read.format("graft.sources.DocsSource")
      .option("nrows", nrows.toString).option("slices", slices.toString).load()

  private def theScan(df: org.apache.spark.sql.DataFrame): DocsScan =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation => r.scan.asInstanceOf[DocsScan]
    }.getOrElse(fail("no DataSourceV2ScanRelation in plan"))

  test("generator contract: row values match a hand-computed md5 fixture") {
    // md5("7") = 8f14e45fceea167a5a36dedd4bea2543
    //   h[0:8]  = 0x8f14e45f = 2400445535 → % 8 = 7   → cat c7
    //   h[8:16] = 0xceea167a = 3471447674 → % 1000 = 674
    //   h[16:24] = "5a36dedd"
    val row = docs(16).filter(col("id") === 7L).collect().head
    assert(row.getLong(0) == 7L)
    assert(row.getString(1) == "c7")
    assert(row.getLong(2) == 674L)
    assert(row.getString(3) == "5a36dedd")
    assert(docs(4096).count() == 4096L)
  }

  test("id-range filters are pushed into the scan and prune input splits") {
    val df = docs(1024, slices = 8).filter(col("id") >= 256L && col("id") < 384L)
    val scan = theScan(df)
    assert(scan.lo == 256L && scan.hi == 384L)
    // splits are planned over the full domain then pruned: 8 slices of
    // 128 ids, the range [256, 384) intersects exactly one
    assert(scan.toBatch.planInputPartitions().length == 1)
    assert(df.count() == 128L)
    // and the pushed range is NOT re-checked by a post-scan Filter: the
    // physical scan subtree contains no Filter on id
    val hasIdFilter = collectExec(df.queryExecution.executedPlan).exists {
      case f: org.apache.spark.sql.execution.FilterExec =>
        f.condition.references.map(_.name).exists(_ == "id")
      case _ => false
    }
    assert(!hasIdFilter, "pushed id range must not be re-filtered post-scan")
  }

  test("non-id predicates stay post-scan and are applied correctly") {
    val df = docs(2048).filter(col("id") < 1000L && col("cat") === "c3")
    val scan = theScan(df)
    assert(scan.hi == 1000L) // id part pushed
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getString(1) == "c3")) // cat part applied
    // cross-check the survivor count against the generator directly
    val expected = (0L until 1000L).count(i => DocsSource.genRow(i)._2 == "c3")
    assert(rows.length == expected)
  }

  test("column pruning reaches the reader: id-only projection reads a 1-field schema") {
    val df = docs(512).select(col("id"))
    val batchScan = collectExec(df.queryExecution.executedPlan).collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec"))
    assert(batchScan.scan.readSchema().fieldNames.toSeq == Seq("id"))
    assert(df.agg(sum(col("id"))).collect().head.getLong(0) == 511L * 512 / 2)
  }

  test("global count/min/max push COMPLETELY into the source: no rows generated, no Aggregate node") {
    val before = DocsSource.rowsGenerated.get()
    val df = docs(100000, slices = 8)
      .filter(col("id") >= 1000L && col("id") < 90000L)
      .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"), max(col("id")).as("max_id"))
    val row = df.collect().head
    assert(row.getLong(0) == 89000L && row.getLong(1) == 1000L && row.getLong(2) == 89999L)
    assert(DocsSource.rowsGenerated.get() == before,
      "a completely-pushed aggregate must not materialize generator rows")
    val aggNodes = collectExec(df.queryExecution.executedPlan).count {
      case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
      case _: org.apache.spark.sql.execution.aggregate.SortAggregateExec => true
      case _: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => true
      case _ => false
    }
    assert(aggNodes == 0, "complete pushdown leaves no aggregate operator in the plan")
  }

  test("aggregates the source cannot answer are declined and still correct") {
    // sum(val) is not pushable — the query must fall back to a normal
    // scan + aggregate and match the generator computed directly
    val before = DocsSource.rowsGenerated.get()
    val df = docs(1024).agg(sum(col("val")).as("s"))
    val got = df.collect().head.getLong(0)
    val expected = (0L until 1024L).map(i => DocsSource.genRow(i)._3).sum
    assert(got == expected)
    assert(DocsSource.rowsGenerated.get() > before, "fallback path must scan rows")
  }

  test("empty pushed range plans zero splits and returns zero rows") {
    val df = docs(1024).filter(col("id") >= 500L && col("id") < 400L)
    // Catalyst may fold the contradiction to an empty relation before the
    // source sees it; either way the result must be empty
    df.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation => r.scan.asInstanceOf[DocsScan]
    }.foreach(s => assert(s.toBatch.planInputPartitions().isEmpty))
    assert(df.count() == 0L)
  }
}
