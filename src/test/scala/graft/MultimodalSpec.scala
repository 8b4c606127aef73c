package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.{Blob, Frame}

/** The binary-pipeline plumbing contract: frame fan-out counts, stride
  * sampling, deterministic stub features, and empty-blob safety. */
class MultimodalSpec extends SparkSpec {

  test("sampleFrames fans out stride-sampled frames per blob") {
    import spark.implicits._
    val blobs = Seq(
      Blob(1L, Array.fill[Byte](256)(7), "img"),  // 4 frames → stride 2 → 2
      Blob(2L, Array.fill[Byte](64)(1), "img"),   // 1 frame
      Blob(3L, Array.emptyByteArray, "img"),      // empty blob → 1 frame, luma 0
    ).toDS()
    val frames = Multimodal.sampleFrames(blobs, stride = 2).collect()
    val byDoc = frames.groupBy(_.doc_id).view.mapValues(_.length).toMap
    assert(byDoc == Map(1L -> 2, 2L -> 1, 3L -> 1))
    val f1 = frames.filter(_.doc_id == 1L)
    assert(f1.map(_.frame_idx).sorted.toSeq == Seq(0, 2))
    assert(f1.forall(_.mean_luma == 7.0)) // constant bytes → exact mean
    assert(frames.find(_.doc_id == 3L).get.mean_luma == 0.0)
  }

  test("sampleFrames is deterministic across runs") {
    import spark.implicits._
    val blobs = Seq(Blob(42L, "some media bytes".getBytes("UTF-8"), "img")).toDS()
    val a = Multimodal.sampleFrames(blobs, 1).collect().toSeq
    val b = Multimodal.sampleFrames(blobs, 1).collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
