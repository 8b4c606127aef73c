package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  /** Typed rows for the per-partition media kernels. */
  case class Blob(doc_id: Long, blob: Array[Byte], container: String)
  case class Frame(doc_id: Long, frame_idx: Int, width: Int, height: Int,
      mean_luma: Double)

  /** Frame-sampling + resize pipeline in the per-partition batch shape a
    * real codec needs (a decoder is initialized once per PARTITION, not
    * per row — the mapPartitions boundary is the contract; swap the stub
    * body for an actual codec without touching the plan).
    *
    * STUB KERNEL: "frames" are 64-byte windows of the blob sampled every
    * `stride` frames; "resize" halves the fake dimensions; "luma" is a
    * deterministic byte mean. Fan-out is rows → frames (flatMap inside
    * the partition), so downstream sees a normal (doc_id, frame_idx,
    * features) DataFrame it can aggregate/join at scale. */
  def sampleFrames(blobs: Dataset[Blob], stride: Int): Dataset[Frame] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { iter =>
      // per-partition "decoder" init would go here (once, not per row)
      iter.flatMap { b =>
        val nFrames = math.max(1, b.blob.length / 64)
        (0 until nFrames by stride).map { f =>
          val window = b.blob.slice(f * 64, math.min((f + 1) * 64, b.blob.length))
          val fullW = 2 * (64 + (math.abs(b.doc_id) % 1856)).toInt
          val fullH = 2 * (64 + (math.abs(b.doc_id * 31) % 976)).toInt
          val luma = if (window.isEmpty) 0.0
            else window.map(x => (x & 0xff).toDouble).sum / window.length
          Frame(b.doc_id, f, fullW / 2, fullH / 2, luma) // "resized" by half
        }
      }
    }
  }

  /** Frame-sample query over the documents-as-blobs corpus: per container,
    * frame counts + mean of the stub luma feature. Rows-only check (the
    * kernel is a stub); the plumbing — binary column, typed Dataset,
    * partition-batch kernel, fan-out, aggregate — is the real contract. */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Tables.documents(spark, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("blob"), $"lang".as("container"))
      .as[Blob]
    sampleFrames(blobs, stride = 2).toDF()
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_frames"),
        round(avg($"mean_luma"), 6).as("avg_luma"),
        max($"width").as("width"), max($"height").as("height"))
      .orderBy($"doc_id")
  }
}
