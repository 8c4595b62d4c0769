package graft.llm

import graft.SparkSpec

/** Ground truth for the multimodal plumbing (codec stubbed, Spark-side
  * schema/batching real). */
class MultimodalSpec extends SparkSpec {

  test("encode/decode round-trip is lossless") {
    val bytes = Multimodal.FakeCodec.encode(8, 6, 3, seed = 99)
    val d = Multimodal.FakeCodec.decode(bytes)
    assert(d.width == 8 && d.height == 6 && d.channels == 3)
    assert(d.pixels.length == 8 * 6 * 3)
    // deterministic: same seed → same payload
    assert(java.util.Arrays.equals(bytes,
      Multimodal.FakeCodec.encode(8, 6, 3, seed = 99)))
  }

  test("extractFeatures: one row per media, consistent dims") {
    val media = Multimodal.syntheticMedia(spark, 50)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 50)
    assert(feats.forall(r => r.getInt(4) == r.getInt(1) * r.getInt(2) * r.getInt(3)))
    assert(feats.forall(r => r.getDouble(5) >= 0 && r.getDouble(5) <= 255))
    // deterministic across evaluations
    val again = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 50))
      .collect()
    assert(feats.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("resize produces target dims, preserves channels") {
    val media = Multimodal.syntheticMedia(spark, 10)
    val resized = Multimodal.resize(media, 16, 12)
    val feats = Multimodal.extractFeatures(resized).collect()
    assert(feats.forall(r => r.getInt(1) == 16 && r.getInt(2) == 12 && r.getInt(3) == 3))
  }

  test("sampleFrames explodes height/stride rows per media") {
    val media = Multimodal.syntheticMedia(spark, 10)
    val heights = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val frames = Multimodal.sampleFrames(media, stride = 4).collect()
    val byMedia = frames.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byMedia == heights.map { case (id, h) => id -> (h + 3) / 4 })
  }
}
