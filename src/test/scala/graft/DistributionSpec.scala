package graft

import org.apache.spark.sql.functions._

/** Distribution operators — the knobs that control where rows live
  * (repartition by hash / range, coalesce) and therefore what a
  * downstream stage shuffles. Asserted at the plan/partition level,
  * not just row counts. */
class DistributionSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    (1L to 1000L).map(i => (i, i % 7, s"v$i")).toDF("id", "k", "v")
  }

  test("repartition(n, col) hash-partitions: same key never splits") {
    import spark.implicits._
    val parts = df.repartition(8, $"k")
      .select($"k", spark_partition_id().as("pid"))
      .distinct()
      .groupBy($"k").agg(countDistinct($"pid").as("n_pids"))
      .collect()
    assert(parts.forall(_.getLong(1) == 1L), "a key spans multiple partitions")
  }

  test("repartitionByRange orders partitions by key ranges") {
    import spark.implicits._
    val ranges = df.repartitionByRange(4, $"id")
      .select($"id", spark_partition_id().as("pid"))
      .groupBy($"pid").agg(min($"id").as("lo"), max($"id").as("hi"))
      .orderBy($"pid").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    // consecutive partitions must not overlap
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, ranges.mkString(","))
      case _ =>
    }
  }

  test("coalesce reduces partitions without a shuffle") {
    val c = df.repartition(16).coalesce(4)
    assert(c.rdd.getNumPartitions == 4)
    val plan = c.queryExecution.executedPlan.toString
    // coalesce appears as Coalesce, not as an Exchange after the repartition
    assert(plan.contains("Coalesce"), plan.take(300))
    assert(c.count() == 1000)
  }

  test("sortWithinPartitions keeps partition-local order, no global sort") {
    import spark.implicits._
    val s = df.repartition(4, $"k").sortWithinPartitions($"id")
    val plan = s.queryExecution.executedPlan.toString
    assert(plan.contains("Sort") && !plan.toLowerCase.contains("rangepartitioning"),
      plan.take(400))
  }

  test("zValue matches a driver-side Morton reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    def ref(a: Long, b: Long): Long =
      (0 until 10).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val got = pairs.toDF("a", "b")
      .select($"a", $"b", graft.api.ZOrder.zValue($"a", $"b", 10).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == ref(a, b), s"($a,$b)") }
  }

  test("z-order layout: narrow per-partition rectangles on BOTH dims vs linear sort") {
    import spark.implicits._
    // a 64x64 grid, both dims uniform: a linear sort on x gives each of
    // 8 partitions the FULL y span; the z-layout gives each a compact
    // rectangle in (x, y)
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")
    def meanSpan(laid: org.apache.spark.sql.DataFrame, c: String): Double = {
      val spans = laid.withColumn("pid", spark_partition_id())
        .groupBy($"pid").agg((max(col(c)) - min(col(c))).as("span"))
        .select(avg($"span")).as[Double].head()
      spans / 63.0 // normalize by the full-domain span
    }
    val linear = grid.repartitionByRange(8, $"x").sortWithinPartitions($"x")
    val zed = graft.api.ZOrder.cluster(grid, $"x", $"y", bits = 6, numPartitions = 8)
    val (linX, linY) = (meanSpan(linear, "x"), meanSpan(linear, "y"))
    val (zX, zY) = (meanSpan(zed, "x"), meanSpan(zed, "y"))
    // linear: x narrow, y full-span. z: BOTH dims bounded — each
    // partition is a consecutive z-range, i.e. at worst the union of
    // two adjacent power-of-two Morton blocks (range-partitioner cuts
    // aren't block-aligned), so spans stay well below the full domain
    // on both axes instead of pinning one axis at 100%.
    assert(linY > 0.95, s"linear layout should span y fully, got $linY")
    assert(zX < 0.8 && zY < 0.5, s"z layout rectangles too wide: x=$zX y=$zY")
    // pruning consequence: a filter on a y range touches every linear
    // partition but only the z partitions whose rectangle intersects it
    def touched(laid: org.apache.spark.sql.DataFrame): Long =
      laid.withColumn("pid", spark_partition_id())
        .groupBy($"pid").agg(min($"y").as("lo"), max($"y").as("hi"))
        .filter($"lo" <= 12 && $"hi" >= 5).count()
    assert(touched(linear) == 8L)
    assert(touched(zed) <= 6L, s"z layout should prune partitions, touched ${touched(zed)}")
  }

  test("z-order parquet footers: zone maps skip row groups a linear sort must read") {
    import spark.implicits._
    // real files, real footers: the statistics a zone-map (row-group
    // min/max) pruner consults are read straight from the written
    // parquet metadata, so this measures exactly what a 100 TB scan
    // with a suppkey predicate would have to decode under each layout
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_partkey", $"l_suppkey")
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_zorder_${System.nanoTime()}").getAbsolutePath
    li.repartitionByRange(8, $"l_partkey").sortWithinPartitions($"l_partkey")
      .write.parquet(s"$base/linear")
    graft.api.ZOrder.cluster(li, $"l_partkey", $"l_suppkey", bits = 8, numPartitions = 8)
      .write.parquet(s"$base/zed")
    // rows a reader must decode for l_suppkey ∈ [lo, hi] (suppkey domain at sf0.001 is [0, 9]): sum of rows of
    // row groups whose suppkey [min, max] intersects the range
    def survivingRows(dir: String, lo: Long, hi: Long): (Long, Long) = {
      import org.apache.hadoop.fs.Path
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import scala.jdk.CollectionConverters._
      val conf = spark.sparkContext.hadoopConfiguration
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      var kept = 0L
      var total = 0L
      files.foreach { f =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
        try r.getFooter.getBlocks.asScala.foreach { b =>
          total += b.getRowCount
          val col = b.getColumns.asScala
            .find(_.getPath.toDotString == "l_suppkey")
            .getOrElse(fail(s"no l_suppkey chunk in ${f.getName}"))
          val st = col.getStatistics
          assert(st != null && !st.isEmpty, "writer produced no statistics")
          val mn = st.genericGetMin.asInstanceOf[Number].longValue
          val mx = st.genericGetMax.asInstanceOf[Number].longValue
          if (mx >= lo && mn <= hi) kept += b.getRowCount
        } finally r.close()
      }
      (kept, total)
    }
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
    }
    try {
    val (linKept, linTotal) = survivingRows(s"$base/linear", 2L, 3L)
    val (zKept, zTotal) = survivingRows(s"$base/zed", 2L, 3L)
    assert(linTotal == zTotal && linTotal > 0)
    // linear-by-partkey: every row group spans the full suppkey domain →
    // zone maps skip nothing. z-order: only groups whose suppkey
    // rectangle intersects the queried band must be decoded.
    assert(linKept == linTotal, s"linear layout unexpectedly skipped: $linKept of $linTotal")
    // measured ~50% (the 2-value band straddles a scaled-bucket cut, and
    // range-partitioner sample cuts shift a few rows run to run) vs the
    // linear layout's 100% — assert with margin for the sampling jitter
    assert(zKept <= (zTotal * 6) / 10,
      s"z layout would decode $zKept of $zTotal — zone maps not tightened")
    } finally rmTree(new java.io.File(base))
  }
}
