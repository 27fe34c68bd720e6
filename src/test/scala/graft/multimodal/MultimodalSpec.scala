package graft.multimodal

import graft.{SparkSpec, Tables}

/** Multimodal plumbing: binary payload schema, deterministic stub decode,
  * fixed feature dimension, frame sampling and resize planning shapes. */
class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def media = Multimodal.asMedia(
    Tables.documents(spark, dir), "doc_id", "text", "image", "source")

  test("payload carries bytes; decode is deterministic with fixed dims") {
    val d1 = Multimodal.decodeAndFeaturize(media, featureDim = 16).collect()
    val d2 = Multimodal.decodeAndFeaturize(media, featureDim = 16).collect()
    assert(d1.length == 500)
    assert(d1.forall(_.feature.length == 16))
    assert(d1.map(x => (x.media_id, x.feature.toSeq)).toSet ==
      d2.map(x => (x.media_id, x.feature.toSeq)).toSet)
    assert(d1.forall(x => x.width >= 64 && x.width < 512))
  }

  test("frame sampling explodes stride-spaced indices within n_frames") {
    val dec = Multimodal.decodeAndFeaturize(media)
    val frames = Multimodal.sampleFrames(dec, stride = 4)
    val byId = frames.collect().groupBy(_.getLong(0))
    val nf = dec.collect().map(d => d.media_id -> d.n_frames).toMap
    for ((id, rows) <- byId) {
      val idxs = rows.map(_.getInt(1)).sorted
      assert(idxs.head == 0)
      assert(idxs.forall(i => i % 4 == 0 && i < nf(id)))
    }
  }

  test("resize plan: scale 1.0 when within box, shrinking otherwise") {
    val dec = Multimodal.decodeAndFeaturize(media)
    val plan = Multimodal.resizePlan(dec, maxSide = 256).collect()
    for (r <- plan) {
      val (w, h, s) = (r.getInt(1), r.getInt(2), r.getDouble(3))
      if (math.max(w, h) <= 256) assert(s == 1.0)
      else assert(math.abs(s - 256.0 / math.max(w, h)) < 1e-12)
    }
  }
}
