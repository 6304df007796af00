package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaMeta, MediaRow}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRow(0L, "image", Array.tabulate(256)(_.toByte), MediaMeta(16, 16, 0, 1)),
    MediaRow(1L, "audio", Array.tabulate(1000)(i => (i % 7).toByte), MediaMeta(0, 0, 16000, 1)),
    MediaRow(2L, "video", Array.tabulate(1200)(i => (i % 11).toByte), MediaMeta(8, 8, 0, 12))
  ).toDS

  test("decodeFeatures: 16-d normalized histogram, stable md5, batch-shaped") {
    val f = Multimodal.decodeFeatures(media, batchSize = 2).collect()
      .map(x => x.media_id -> x).toMap
    assert(f.size == 3)
    assert(f.values.forall(_.features.length == 16))
    // histogram of 0..255 is uniform: every bin = 16/256
    assert(f(0L).features.forall(v => math.abs(v - 16f / 256f) < 1e-6))
    assert(f(0L).n_bytes == 256L)
    // deterministic md5 across runs
    val again = Multimodal.decodeFeatures(media).collect()
      .map(x => x.media_id -> x.content_md5).toMap
    assert(f.map { case (k, v) => k -> v.content_md5 } == again)
  }

  test("resize subsamples to the target byte budget and updates meta") {
    val out = Multimodal.resize(media.filter(_.media_id == 1L), 4, 4).head()
    assert(out.bytes.length == 16)
    assert(out.meta.width == 4 && out.meta.height == 4)
  }

  test("sampleFrames explodes video to every-Nth frame, passes others through") {
    val frames = Multimodal.sampleFrames(media, everyN = 3).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId(0L).length == 1 && byId(1L).length == 1)
    assert(byId(2L).map(_.frame_idx).sorted.toSeq == Seq(0, 3, 6, 9))
    // each sampled frame carries ~1/12 of the bytes
    assert(byId(2L).forall(_.frame_bytes.length == 100))
  }

  test("balanced repartitions by media_id") {
    val b = Multimodal.balanced(media, 2)
    assert(b.rdd.getNumPartitions == 2)
    assert(b.count() == 3)
  }
}
