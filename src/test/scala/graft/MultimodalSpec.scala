package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.{Blob, Frame}

/** The binary-pipeline plumbing contract: frame fan-out counts, stride
  * sampling, deterministic stub features, and empty-blob safety. */
class MultimodalSpec extends SparkSpec {

  test("sampleFrames decodes PNGs and fans out stride-sampled pixel frames") {
    import spark.implicits._
    val blobs = Seq(
      Blob(1L, Array.fill[Byte](256)(7), "img"),  // 4 frames → stride 2 → 2
      Blob(2L, Array.fill[Byte](64)(1), "img"),   // 1 frame
      Blob(3L, Array.emptyByteArray, "img"),      // empty → 1-px image, luma 0
    ).toDS()
    val frames = Multimodal.sampleFrames(Multimodal.encodePng(blobs), stride = 2).collect()
    val byDoc = frames.groupBy(_.doc_id).view.mapValues(_.length).toMap
    assert(byDoc == Map(1L -> 2, 2L -> 1, 3L -> 1))
    val f1 = frames.filter(_.doc_id == 1L)
    assert(f1.map(_.frame_idx).sorted.toSeq == Seq(0, 2))
    assert(f1.forall(_.mean_luma == 7.0)) // constant pixels → exact mean
    assert(f1.forall(f => f.width == 256 && f.height == 1))
    assert(frames.find(_.doc_id == 3L).get.mean_luma == 0.0)
  }

  test("sampleFrames is deterministic across runs") {
    import spark.implicits._
    val blobs = Seq(Blob(42L, "some media bytes".getBytes("UTF-8"), "img")).toDS()
    val a = Multimodal.sampleFrames(Multimodal.encodePng(blobs), 1).collect().toSeq
    val b = Multimodal.sampleFrames(Multimodal.encodePng(blobs), 1).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("PNG encode→decode roundtrip is lossless and matches byte arithmetic") {
    import spark.implicits._
    val bytes = "hello png".getBytes("UTF-8")
    val blobs = Seq(
      Blob(1L, bytes, "img"),
      Blob(2L, Array.emptyByteArray, "img"),        // empty → 1 zero pixel
      Blob(3L, Array[Byte](0, 127, -1, -128), "img"), // full unsigned range
    ).toDS()
    val pngs = Multimodal.encodePng(blobs).collect()
    // the encode produced actual PNG containers (magic bytes)
    assert(pngs.forall(p => (p.png(0) & 0xff) == 0x89 && p.png(1) == 'P'.toByte))
    val decoded = Multimodal.decodePng(Multimodal.encodePng(blobs))
      .collect().map(d => d.doc_id -> d).toMap
    assert(decoded(1L).width == bytes.length && decoded(1L).height == 1)
    assert(decoded(1L).mean_luma ==
      bytes.map(b => (b & 0xff).toDouble).sum / bytes.length)
    assert(decoded(2L).width == 1 && decoded(2L).mean_luma == 0.0)
    // signed bytes decode as their unsigned pixel values: (0+127+255+128)/4
    assert(decoded(3L).mean_luma == (0 + 127 + 255 + 128) / 4.0)
  }
}
