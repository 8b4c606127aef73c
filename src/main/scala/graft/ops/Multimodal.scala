package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (SURVEY.md §2.8): text ⋈ vector joins, and
  * the opaque-binary pipeline (encode → decode → feature-extract) a real
  * image/audio corpus needs. The decode path runs a GENUINE pure-JVM
  * codec — javax.imageio PNG encode/decode inside the per-partition
  * batch shape (q_multimodal_decode is oracle-checked end-to-end
  * because gray8 PNG is lossless). Only the video frame SAMPLER
  * (sampleFrames) remains a deterministic stub: no video codec exists
  * in the JVM; its mapPartitions fan-out shape is the real contract.
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

  /** Typed rows for the per-partition media kernels. */
  case class Blob(doc_id: Long, blob: Array[Byte], container: String)
  case class PngBlob(doc_id: Long, container: String, png: Array[Byte])
  case class Decoded(doc_id: Long, container: String, width: Int, height: Int,
      mean_luma: Double)
  case class Frame(doc_id: Long, frame_idx: Int, width: Int, height: Int,
      mean_luma: Double)

  /** REAL codec, encode side: each blob's bytes become the pixel row of a
    * 1×N gray8 image, written to PNG bytes with javax.imageio. Kernel
    * init (disabling ImageIO's tmp-file cache) happens once per
    * PARTITION — the batch-shape contract a libjpeg/ffmpeg kernel would
    * need too. An empty blob becomes a single zero pixel (PNG has no
    * 0-width images). */
  def encodePng(blobs: Dataset[Blob]): Dataset[PngBlob] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
      iter.map { b =>
        val w = math.max(1, b.blob.length)
        val img = new java.awt.image.BufferedImage(
          w, 1, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        b.blob.indices.foreach(i => raster.setSample(i, 0, 0, b.blob(i) & 0xff))
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        PngBlob(b.doc_id, b.container, bos.toByteArray)
      }
    }
  }

  /** REAL codec, decode side: ImageIO.read parses the PNG container +
    * inflate stream (an actual decode, not arithmetic on the input) and
    * the kernel extracts (width, height, mean luma) from the raster. */
  def decodePng(pngs: Dataset[PngBlob]): Dataset[Decoded] = {
    import pngs.sparkSession.implicits._
    pngs.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false)
      iter.map { p =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p.png))
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var s = 0L; var x = 0
        while (x < w) {
          var y = 0
          while (y < h) { s += raster.getSample(x, y, 0); y += 1 }
          x += 1
        }
        Decoded(p.doc_id, p.container, w, h, s.toDouble / (w.toLong * h))
      }
    }
  }

  /** Binary-column pipeline over a genuine pure-JVM codec: documents'
    * text bytes → gray8 PNG (encodePng) → ImageIO decode (decodePng) →
    * per-blob features. Gray8 PNG is lossless, so the decoded pixel
    * means equal the source byte means and the whole pipeline is
    * oracle-checked: DuckDB recomputes width/mean from the characters
    * (ASCII corpus ⇒ byte value = code point). */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Tables.documents(spark, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("blob"), $"lang".as("container"))
      .as[Blob]
    decodePng(encodePng(blobs)).toDF()
      .select($"doc_id", $"container", $"width", $"height",
        round($"mean_luma", 6).as("mean_luma"))
      .orderBy($"doc_id")
  }

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
