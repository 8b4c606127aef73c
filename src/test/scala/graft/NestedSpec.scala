package graft

import org.apache.spark.sql.functions._

/** Nested-type operators: struct build/flatten, array-of-struct
  * explode+inline, map construction and higher-order map functions —
  * the §1 data-model surface the flat testdata doesn't exercise. */
class NestedSpec extends SparkSpec {

  test("struct round-trip: build, project fields, flatten") {
    import spark.implicits._
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v")
      .select($"id", struct($"name", $"v").as("payload"))
    val flat = df.select($"id", $"payload.name", $"payload.v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(flat == Set((1L, "a", 10.0), (2L, "b", 20.0)))
  }

  test("collect sorted array-of-struct per key, then inline back") {
    import spark.implicits._
    val lines = Seq((1L, 1, 5.0), (1L, 2, 7.0), (2L, 1, 3.0)).toDF("okey", "line", "qty")
    val nested = lines
      .groupBy($"okey")
      .agg(array_sort(collect_list(struct($"line", $"qty"))).as("items"))
    assert(nested.filter($"okey" === 1L).select(size($"items")).head.getInt(0) == 2)
    val back = nested.select($"okey", inline($"items"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(back == Set((1L, 1, 5.0), (1L, 2, 7.0), (2L, 1, 3.0)))
  }

  test("map functions: build, lookup, keys/values, transform_values") {
    import spark.implicits._
    val df = Seq((1L, Array("a", "b"), Array(1, 2))).toDF("id", "ks", "vs")
      .select($"id", map_from_arrays($"ks", $"vs").as("m"))
    val r = df.select(
      element_at($"m", "b").as("b_val"),
      size(map_keys($"m")).as("n_keys"),
      element_at(transform_values($"m", (_, v) => v * 10), "a").as("a_x10"),
      map_contains_key($"m", "zz").as("has_zz"),
    ).head
    assert(r.getInt(0) == 2 && r.getInt(1) == 2 && r.getInt(2) == 10 && !r.getBoolean(3))
  }

  test("nested schema pruning: selecting one struct leaf prunes the parquet ReadSchema") {
    import spark.implicits._
    // write genuinely nested parquet (the testdata is flat), then prove
    // the scan contract at 100 TB: projecting payload.v must narrow the
    // scan's ReadSchema to that one leaf — reading a 40-field struct to
    // serve a 1-field projection is the nested version of SELECT *
    val base = java.nio.file.Files.createTempDirectory("graft_nested").toString
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
    }
    try {
      Seq((1L, "a", 10.0, "x" * 100), (2L, "b", 20.0, "y" * 100))
        .toDF("id", "name", "v", "blob")
        .select($"id", struct($"name", $"v", $"blob").as("payload"))
        .write.parquet(base + "/t")
      val df = spark.read.parquet(base + "/t").select($"id", $"payload.v")
      assert(df.as[(Long, Double)].collect().toSet == Set((1L, 10.0), (2L, 20.0)))
      val scan = collectExec(df.queryExecution.executedPlan)
        .map(_.toString).find(_.contains("ReadSchema"))
        .getOrElse(fail("no scan node with ReadSchema"))
      val readSchema = scan.substring(scan.indexOf("ReadSchema"))
      assert(readSchema.contains("v"), readSchema.take(300))
      assert(!readSchema.contains("blob") && !readSchema.contains("name"),
        s"nested pruning failed — scan reads unneeded leaves: ${readSchema.take(300)}")
    } finally rmTree(new java.io.File(base))
  }

  test("VARIANT shredding round-trip: write emits typed_value subcolumns, shredded read stays exact") {
    // closes the PLANS.md note that `allowReadingShredded` was asserted
    // but nothing ever READ a shredded file: write variants with Spark
    // 4's shredded writer (typed_value parquet subcolumns), prove from
    // the FOOTER that shredding physically happened, and prove the
    // shredded read path returns the same typed extractions as the
    // unshredded one. At 100 TB this is the difference between
    // variant_get parsing every row and an ordinary pruned subcolumn
    // scan (docs/PLANS.md "VARIANT" section).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_shred").toString
    val confs = Seq(
      "spark.sql.variant.writeShredding.enabled" -> "true",
      "spark.sql.variant.inferShreddingSchema" -> "true",
      "spark.sql.variant.allowReadingShredded" -> "true")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val rows = (0L until 100L).map(i => (i, s"""{"k": ${i * 10}, "s": "v$i"}"""))
      rows.toDF("id", "js")
        .select($"id", parse_json($"js").as("v"))
        .repartition(1)
        .write.mode("overwrite").parquet(s"$dir/t")
      // physical evidence from the parquet footer: the variant column
      // was written SHREDDED (typed_value subcolumns), not as one
      // opaque binary value
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import scala.jdk.CollectionConverters._
      val pf = new java.io.File(s"$dir/t").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(pf.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
      val colPaths =
        try r.getFooter.getFileMetaData.getSchema.getColumns.asScala
          .map(_.getPath.mkString(".")).toSeq
        finally r.close()
      assert(colPaths.exists(_.contains("typed_value")),
        s"no typed_value subcolumn in the written file — shredding did not happen: $colPaths")
      // the shredded READ must serve typed extraction exactly
      val back = spark.read.parquet(s"$dir/t")
        .select($"id", expr("variant_get(v, '$.k', 'int')").as("k"),
          expr("variant_get(v, '$.s', 'string')").as("s"))
        .collect().map(row => (row.getLong(0), row.getInt(1), row.getString(2))).toSet
      assert(back == rows.map { case (i, _) => (i, i.toInt * 10, s"v$i") }.toSet,
        "shredded read returned different values than the writer was given")
    } finally {
      prev.foreach { case (k, Some(v)) => spark.conf.set(k, v)
                     case (k, None) => spark.conf.unset(k) }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      ()
    }
  }

  test("from_json into struct then to_json round-trips") {
    import spark.implicits._
    val df = Seq((1L, """{"k": 87, "tag": "x"}""")).toDF("id", "js")
    val parsed = df.select($"id",
      from_json($"js", org.apache.spark.sql.types.StructType.fromDDL("k INT, tag STRING")).as("s"))
    assert(parsed.select($"s.k").head.getInt(0) == 87)
    val back = parsed.select(to_json($"s").as("js2")).head.getString(0)
    assert(back.contains("\"k\":87") && back.contains("\"tag\":\"x\""))
  }
}
