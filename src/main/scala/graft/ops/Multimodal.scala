package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (SURVEY.md §2.8): text ⋈ vector joins, and
  * the opaque-binary pipeline shape (decode → feature-extract) a real
  * image/audio corpus needs. The container has no media codecs, so the
  * decode kernel is a clearly-marked deterministic stub — the Spark-side
  * plumbing (binary column, typed metadata struct, per-partition batch
  * processing, pushdown-friendly schema) is real and tested.
  */
object Multimodal {

  /** Text ⋈ embedding join on the shared id space (doc_id = vec_id): one
    * row holds both modalities; aggregate across them per language.
    * At scale both sides bucket/shuffle on the id — a plain equi join. */
  def multimodalJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .join(Tables.embeddings(spark, dir),
        $"doc_id" === $"vec_id")
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        round(sum(element_at($"embedding", 1).cast("double")), 6).as("sum_e1"),
        countDistinct($"label").as("n_labels"),
      )
      .orderBy($"lang")
  }

  /** Binary-column pipeline: documents' text bytes stand in for an opaque
    * media blob. Schema: (doc_id, blob binary, meta struct). The "decode"
    * is a STUB — deterministic pseudo-features from the blob itself (real
    * deployments swap in a codec inside the same mapPartitions batch
    * shape; partitioning, schema, and batching are the real contract).
    * Emits per-"format" feature aggregates. */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Tables.documents(spark, dir)
      .select(
        $"doc_id",
        encode($"text", "UTF-8").as("blob"),
        struct($"lang".as("container"), $"n_chars".as("n_bytes")).as("meta"),
      )
    // STUB decode: width/height/frames derived from blob bytes — stands in
    // for an image/audio decode; deterministic and cheap.
    val decoded = blobs.select(
      $"doc_id",
      $"meta.container".as("container"),
      octet_length($"blob").as("n_bytes"),
      (abs(xxhash64($"blob")) % 1920 + 1).as("width"),
      (abs(xxhash64($"blob", lit(1))) % 1080 + 1).as("height"),
      (abs(xxhash64($"blob", lit(2))) % 300 + 1).as("n_frames"),
    )
    decoded
      .groupBy($"container")
      .agg(
        count(lit(1)).as("n_blobs"),
        sum($"n_bytes".cast("long")).as("total_bytes"),
        sum($"width".cast("long") * $"height".cast("long")).as("total_pixels"),
        max($"n_frames").as("max_frames"),
      )
      .orderBy($"container")
  }
}
