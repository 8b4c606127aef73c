package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import graft.sources.LogStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The Kafka-semantics log source (SURVEY §2.1 / §18.11): exactly-once
  * streaming delivery over per-partition offsets, checkpointed restart
  * recovery (no loss, no re-delivery), admission control, key-hash
  * partition routing, and the batch-read mode. */
class LogStreamSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("graft_logsrc").toString

  private def readLog(root: String): DataFrame =
    spark.read.format("graft.sources.LogStream").option("path", root).load()

  private def readLogStream(root: String): DataFrame =
    spark.readStream.format("graft.sources.LogStream").option("path", root).load()

  test("batch read returns every produced record exactly once, key-routed") {
    import spark.implicits._
    val root = freshRoot()
    val df = (1 to 200).map(i => (s"k${i % 17}", s"v$i")).toDF("k", "v")
    LogStream.produce(df, root, "k", "v", nPartitions = 4)
    val back = readLog(root)
    assert(back.count() === 200)
    assert(back.select($"key", $"value").as[(String, String)].collect().toSet
      === (1 to 200).map(i => (s"k${i % 17}", s"v$i")).toSet)
    // a key lives in exactly one partition; with 17 keys all 4 partitions in use
    assert(back.groupBy($"key").agg(countDistinct($"partition").as("np"))
      .filter($"np" =!= 1).count() === 0)
    assert(back.select($"partition").distinct().count() === 4)
    // offsets are dense per partition: max(offset) = count - 1
    val dense = back.groupBy($"partition")
      .agg(max($"offset").as("mx"), count(lit(1)).as("n"))
      .filter($"mx" =!= $"n" - 1).count()
    assert(dense === 0)
  }

  test("streaming delivers appended records incrementally, exactly once") {
    import spark.implicits._
    val root = freshRoot()
    LogStream.createLog(root, 2)
    LogStream.append(root, 0, Seq(("a", "1"), ("b", "2")))
    val q = readLogStream(root).writeStream.format("memory")
      .queryName("log_inc").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("log_inc").count() === 2)
      LogStream.append(root, 1, Seq(("c", "3")))
      LogStream.append(root, 0, Seq(("d", "4")))
      q.processAllAvailable()
      val got = spark.table("log_inc").select($"key", $"value")
        .as[(String, String)].collect().toSeq
      assert(got.size === 4 && got.toSet === Set(("a", "1"), ("b", "2"), ("c", "3"), ("d", "4")))
    } finally q.stop()
  }

  test("restart from checkpoint resumes after the committed offset: no loss, no re-delivery") {
    val root = freshRoot()
    val ckpt = Files.createTempDirectory("graft_logsrc_ckpt").toString
    LogStream.createLog(root, 2)
    LogStream.append(root, 0, Seq(("a", "1"), ("b", "2")))
    LogStream.append(root, 1, Seq(("c", "3")))
    val q1 = readLogStream(root).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select("key").collect().foreach(r => LogStreamSpec.seen.add(r.getString(0)))
      }.start()
    try q1.processAllAvailable() finally q1.stop()
    assert(LogStreamSpec.seen.toArray.toSet === Set("a", "b", "c"))
    // append while no query is running, then restart from the checkpoint
    LogStream.append(root, 0, Seq(("d", "4")))
    LogStream.append(root, 1, Seq(("e", "5")))
    LogStreamSpec.seen.clear()
    val q2 = readLogStream(root).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select("key").collect().foreach(r => LogStreamSpec.seen.add(r.getString(0)))
      }.start()
    try q2.processAllAvailable() finally q2.stop()
    // ONLY the post-stop records — a re-delivery of a/b/c would land here
    assert(LogStreamSpec.seen.toArray.toSet === Set("d", "e"))
  }

  test("admission control caps records per trigger (maxRecordsPerTrigger)") {
    val root = freshRoot()
    LogStream.createLog(root, 2)
    LogStream.append(root, 0, Seq.tabulate(6)(i => (s"a$i", s"$i")))
    LogStream.append(root, 1, Seq.tabulate(5)(i => (s"b$i", s"$i")))
    LogStreamSpec.batchSizes.clear()
    val q = spark.readStream.format("graft.sources.LogStream")
      .option("path", root).option("maxRecordsPerTrigger", "3").load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        LogStreamSpec.batchSizes.add(java.lang.Long.valueOf(b.count())); ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val sizes = LogStreamSpec.batchSizes.toArray.map(_.asInstanceOf[java.lang.Long].longValue())
    assert(sizes.sum === 11, s"sizes=${sizes.toSeq}")
    assert(sizes.forall(_ <= 3), s"sizes=${sizes.toSeq}")
    assert(sizes.count(_ > 0) >= 4)
  }
}

object LogStreamSpec {
  val seen = new ConcurrentLinkedQueue[String]()
  val batchSizes = new ConcurrentLinkedQueue[java.lang.Long]()
}
