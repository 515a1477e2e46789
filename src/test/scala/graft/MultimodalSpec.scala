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

  test("media pipeline: attach -> extract keeps one row per doc") {
    val docs = Seq((1L, "hello"), (2L, "worlds")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, Multimodal.attachMedia(docs))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_bytes === 5L)
    assert(feats(1L).n_blocks === 1L)
    assert(feats(1L).mean_byte === "hello".map(_.toInt).sum / 5.0)
    assert(feats(2L).n_bytes === 6L)
  }
}
