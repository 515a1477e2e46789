package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.FakeCodec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("FakeCodec block means over known bytes") {
    val bytes = Array.tabulate(130)(i => (i % 256).toByte)
    val (nBlocks, mean, firstMean) = FakeCodec.decode(bytes)
    assert(nBlocks === 3)                       // 64 + 64 + 2
    assert(mean === (0 until 130).sum.toDouble / 130.0)
    assert(firstMean === (0 until 64).sum.toDouble / 64.0)
  }

  test("FakeCodec treats bytes as unsigned") {
    val (_, mean, _) = FakeCodec.decode(Array(-1.toByte))
    assert(mean === 255.0)
  }

  test("FrameSampler: every 4th frame, equal-split pools, short tail frame") {
    // 300 bytes -> frames 0..4 (last = 44 bytes); sampled: 0 and 4.
    val bytes = Array.tabulate(300)(i => (i % 251).toByte)
    val frames = Multimodal.FrameSampler.sampleFrames(bytes).toSeq
    assert(frames.map(_._1) === Seq(0L, 4L))
    assert(frames.map(_._2) === Seq(64L, 44L))
    val (_, _, p) = frames(1)                   // tail frame: 44 bytes, 11 per pool
    val s = 4 * 64
    val exp = (0 until 4).map(j =>
      (s + j * 11 until s + (j + 1) * 11).map(k => bytes(k) & 0xff).sum / 11.0)
    assert(p.toSeq === exp)
  }

  test("FrameSampler: sub-pool frames pad empty pools with 0.0") {
    // A 3-byte payload: one frame, pools get 0,1,1,1 bytes (j*3/4 bounds).
    val frames = Multimodal.FrameSampler.sampleFrames(
      Array[Byte](10, 20, 30)).toSeq
    assert(frames.size === 1)
    val (_, fb, p) = frames(0)
    assert(fb === 3L)
    assert(p(0) === 0.0)                        // empty first pool
    assert(p.toSeq.drop(1) === Seq(10.0, 20.0, 30.0))
  }

  test("media pipeline: attach -> extract keeps one row per doc") {
    val docs = Seq((1L, "hello"), (2L, "worlds")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, Multimodal.attachMedia(docs))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_bytes === 5L)
    assert(feats(1L).n_blocks === 1L)
    assert(feats(1L).mean_byte === "hello".map(_.toInt).sum / 5.0)
    assert(feats(2L).n_bytes === 6L)
  }

  test("segmentAudio: mid runs, trailing open run, silent and empty docs") {
    // One synthetic "waveform" per case, 64-byte frames, threshold 100:
    // frame byte value 120 = active, 10 = silent.
    def wave(frames: Int*): Array[Byte] =
      frames.flatMap(v => Array.fill(64)(v.toByte)).toArray
    val media = Seq(
      // active(0) silent(1) active(2,3) — one 1-frame seg + one 2-frame,
      // the second CLOSED BY END OF PAYLOAD (the open-run flush path).
      (1L, wave(120, 10, 120, 120)),
      (2L, wave(10, 10)),                       // all silent: no segments
      (3L, Array.empty[Byte]),                  // empty payload
      // active tail frame shorter than a block (integer gate must use
      // the TAIL length, not the block size): 32 bytes of 120.
      (4L, Array.fill(32)(120.toByte))
    ).toDF("doc_id", "media")
      .selectExpr("doc_id", "'fake/raw' AS fmt",
        "CAST(octet_length(media) AS LONG) AS n_bytes", "media")
    val segs = Multimodal.segmentAudio(spark, media, threshold = 100L)
      .collect().groupBy(_.doc_id)
    val d1 = segs(1L).sortBy(_.seg_idx)
    assert(d1.map(s => (s.seg_idx, s.start_f, s.end_f, s.n_frames)).toSeq ===
      Seq((1L, 0L, 0L, 1L), (2L, 2L, 3L, 2L)))
    assert(d1(1).mean_energy === 120.0)
    assert(!segs.contains(2L) && !segs.contains(3L))
    assert(segs(4L).map(s => (s.start_f, s.end_f, s.n_frames)).toSeq ===
      Seq((0L, 0L, 1L)))
  }
}
