package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Table-maintenance operations for a parquet lake — the jobs that keep
  * a 100 TB table scannable: small-file compaction (a streaming sink or
  * incremental loader leaves thousands of KB-sized files; scans then
  * pay per-file open/footer costs and schedulers drown in splits) and
  * a table stats report for capacity planning.
  */
object Maintenance {

  /** Rewrite a directory into ~targetRowsPerFile-row files. Copy-on-
    * write into outDir (never in place — readers of inputDir stay
    * consistent; swap directories atomically afterwards). */
  def compact(spark: SparkSession, inputDir: String, outDir: String,
      targetRowsPerFile: Long): Unit = {
    val df = spark.read.parquet(inputDir)
    val n = df.count()
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    df.repartition(files).write.mode(SaveMode.Overwrite).parquet(outDir)
  }

  /** Per-directory stats: file count, bytes, rows — the compaction
    * trigger signal. */
  def tableStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val nRows = spark.read.parquet(dir).count()
    Seq((dir, files.length.toLong, files.map(_.getLen).sum, nRows))
      .toDF("dir", "n_files", "total_bytes", "n_rows")
  }
}
