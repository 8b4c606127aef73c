package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Table-maintenance operations for a parquet lake — the jobs that keep
  * a 100 TB table scannable: small-file compaction (a streaming sink or
  * incremental loader leaves thousands of KB-sized files; scans then
  * pay per-file open/footer costs and schedulers drown in splits) and
  * a table stats report for capacity planning.
  *
  * Stats come from parquet FOOTERS only (file metadata carries the row
  * count) — no executor scan of the data; recursive listing so
  * partitioned layouts (e.g. the streaming sink's batch_id=N dirs) are
  * counted correctly.
  */
object Maintenance {

  private def parquetFiles(spark: SparkSession, dir: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val fs = FileSystem.get(new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
    val it = fs.listFiles(new Path(dir), true) // recursive
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) out += f
    }
    out.toSeq
  }

  private def footerRowCount(spark: SparkSession, f: Path): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val input = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(input)
    try reader.getRecordCount finally reader.close()
  }

  /** Rewrite a directory into ~targetRowsPerFile-row files. Row count
    * comes from footers (driver-side metadata read, O(files)), so the
    * data itself is scanned exactly once — by the rewrite. Copy-on-write
    * into outDir (never in place; readers of inputDir stay consistent;
    * swap directories atomically afterwards). */
  def compact(spark: SparkSession, inputDir: String, outDir: String,
      targetRowsPerFile: Long): Unit = {
    val n = parquetFiles(spark, inputDir).map(f => footerRowCount(spark, f.getPath)).sum
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    spark.read.parquet(inputDir)
      .repartition(files).write.mode(SaveMode.Overwrite).parquet(outDir)
  }

  /** Per-directory stats from footers + the recursive file listing — the
    * compaction trigger signal; zero data I/O. */
  def tableStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = parquetFiles(spark, dir)
    val nRows = files.map(f => footerRowCount(spark, f.getPath)).sum
    Seq((dir, files.length.toLong, files.map(_.getLen).sum, nRows))
      .toDF("dir", "n_files", "total_bytes", "n_rows")
  }
}
