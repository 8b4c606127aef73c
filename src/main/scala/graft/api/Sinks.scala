package graft.api

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** External sink surface — the reference genre lands query results in
  * MySQL / HBase / Redis. This offline container has none of those
  * services, so the contract is expressed as a small executor-side
  * interface plus a foreachBatch adapter; a production deployment plugs
  * a JDBC connection pool or a KV client into open/put/close without
  * touching the streaming plan.
  *
  * IDEMPOTENCY CONTRACT (the part that matters at scale): micro-batches
  * REPLAY after failures — foreachBatch offers at-least-once delivery —
  * so `put` must be an upsert keyed on the row key (INSERT … ON
  * DUPLICATE KEY UPDATE / HBase Put / Redis SET), never a blind append.
  * `open` receives (partitionId, batchId) so transactional stores can
  * instead dedupe whole batches (skip when (partitionId, batchId) was
  * already committed — the foreach-writer protocol).
  *
  * Scale shape: the adapter writes from EXECUTORS, one sink instance
  * per partition per batch (connection setup amortizes over the
  * partition, parallelism = partition count); nothing funnels through
  * the driver.
  */
trait KeyValueSink extends Serializable {
  /** Called once per (partition, micro-batch) before any put. */
  def open(partitionId: Int, batchId: Long): Unit = ()
  /** Upsert one row — MUST be idempotent per the contract above. */
  def put(key: String, value: String): Unit
  /** Called once per (partition, micro-batch) after the last put. */
  def close(): Unit = ()
}

object Sinks {

  /** Land a stream into an external key-value store via foreachBatch.
    * Rows are (keyCol, valueCol) cast to strings; delivery is
    * at-least-once, deduplicated by the sink's idempotent put. */
  def toKeyValue(df: DataFrame, sink: KeyValueSink, keyCol: String,
      valueCol: String, checkpointDir: String): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, sink, keyCol, valueCol, batchId)
      }
      .start()

  /** The batch-side writer (also usable standalone for batch upserts —
    * e.g. landing a finished aggregate into the serving store). */
  def writeBatch(batch: DataFrame, sink: KeyValueSink, keyCol: String,
      valueCol: String, batchId: Long): Unit =
    batch.select(col(keyCol).cast("string"), col(valueCol).cast("string"))
      .foreachPartition { rows: Iterator[Row] =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        sink.open(pid, batchId)
        try rows.foreach(r => sink.put(r.getString(0), r.getString(1)))
        finally sink.close()
      }
}
