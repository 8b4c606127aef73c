package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (SURVEY.md §2.8): text ⋈ vector joins, and
  * the opaque-binary pipeline (encode → decode → feature-extract →
  * frame-sample) a real image/audio/video corpus needs. Every kernel
  * runs a GENUINE pure-JVM codec — javax.imageio PNG encode/decode
  * inside the per-partition batch shape — and because gray8 PNG is
  * lossless, both q_multimodal_decode and q_multimodal_frames are
  * oracle-checked end-to-end (decoded pixel values provably equal the
  * source bytes, which DuckDB recomputes from the characters). A
  * production video pipeline swaps ImageIO for an ffmpeg binding in
  * the same mapPartitions slots; the plan shape doesn't change.
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
    // spread BEFORE the codec kernels: documents arrives as ONE parquet
    // split at test scale, and this pipeline's only shuffle is the final
    // orderBy — without the repartition the entire encode→decode codec
    // chain runs on one core (driver-run r2 measured 5.6 s vs 0.4 s
    // quiet). No-op at real scale where the table has many splits.
    val blobs = graft.api.Dedup.spread(Tables.documents(spark, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("blob"), $"lang".as("container")))
      .as[Blob]
    decodePng(encodePng(blobs)).toDF()
      .select($"doc_id", $"container", $"width", $"height",
        round($"mean_luma", 6).as("mean_luma"))
      .orderBy($"doc_id")
  }

  /** REAL frame sampler over DECODED pixels: ImageIO-parse each PNG,
    * then every `stride`-th 64-pixel window of the decoded row is a
    * "frame" with its mean luma — the decode-then-sample pipeline a
    * video corpus needs, in the same per-partition batch shape (decoder
    * init once per partition, flatMap fan-out rows → frames so
    * downstream sees a normal (doc_id, frame_idx, features) relation).
    * Gray8 PNG is lossless, so frame lumas are oracle-checkable from
    * per-character windows of the source text. */
  def sampleFrames(pngs: Dataset[PngBlob], stride: Int): Dataset[Frame] = {
    import pngs.sparkSession.implicits._
    pngs.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
      iter.flatMap { p =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p.png))
        val w = img.getWidth
        val raster = img.getRaster
        val nFrames = math.max(1, w / 64)
        (0 until nFrames by stride).map { f =>
          val start = f * 64
          val end = math.min(start + 64, w)
          var s = 0L; var x = start
          while (x < end) { s += raster.getSample(x, 0, 0); x += 1 }
          val luma = if (end == start) 0.0 else s.toDouble / (end - start)
          Frame(p.doc_id, f, w, img.getHeight, luma)
        }
      }
    }
  }

  /** Frame-sample query over the documents-as-blobs corpus: encode →
    * REAL ImageIO decode → stride-2 frame sampling → per-doc frame
    * count + mean frame luma. Oracle-checked end to end: the oracle
    * recomputes each frame's luma from the matching 64-character window
    * of the source text (both engines sum the same frames in the same
    * ascending order, so even the double accumulation matches). */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // spread before the codec kernels — same single-split trap as
    // multimodalDecode (the groupBy shuffle only comes AFTER the codecs)
    val blobs = graft.api.Dedup.spread(Tables.documents(spark, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("blob"), $"lang".as("container")))
      .as[Blob]
    sampleFrames(encodePng(blobs), stride = 2).toDF()
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_frames"),
        round(avg($"mean_luma"), 6).as("avg_luma"),
        max($"width").as("width"))
      .orderBy($"doc_id")
  }
}
