package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog today"),
    (1L, "the quick brown fox jumps over the lazy dog today"),    // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat today"),    // near dup of 0
    (3L, "completely different text with no overlap at all here"),
    (4L, "short text")
  ).toDF("doc_id", "text")

  test("exactGroups maps byte-identical texts to one representative") {
    val out = Dedup.exactGroups(docs, col("text"), col("doc_id"))
      .select("doc_id", "rep_id", "is_dup").as[(Long, Long, Boolean)]
      .collect().map { case (k, v, d) => k -> ((v, d)) }.toMap
    assert(out(0L) === ((0L, false)))
    assert(out(1L) === ((0L, true)))
    assert(out(2L) === ((2L, false)))
  }

  test("jaccardPairs finds exact and near duplicates above threshold") {
    val pairs = Dedup.jaccardPairs(docs, col("text"), col("doc_id"), 3, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))   // identical: j = 1.0
    assert(pairs.contains((0L, 2L)))   // one word differs: j ~ 0.56
    assert(pairs.contains((1L, 2L)))
    assert(pairs.size === 3)           // nothing else is similar
  }

  test("jaccardPairs reports exact values when the DF cap binds") {
    // Shingle "A B C" appears in all 10 docs (df = 10 > maxDf = 4), so
    // the bucket count under-counts doc0/doc1's intersection (2 of 3).
    // The capped bound must route the pair through exact verification:
    // reported jaccard = 3/5 = 0.6, identical to an uncapped run.
    val docs = (Seq(
      (0L, "A B C D E F"),
      (1L, "A B C D E G")) ++
      (2L until 10L).map(i => (i, s"A B C x$i y$i z$i"))).toDF("doc_id", "text")
    def run(maxDf: Int) =
      Dedup.jaccardPairs(docs, col("text"), col("doc_id"), 3, 0.5, maxDf)
        .as[(Long, Long, Double)].collect().toSet
    val capped = run(4)
    assert(capped === run(1000))
    assert(capped === Set((0L, 1L, 0.6)))
  }

  test("duplicateClusters resolves chains, triangles and isolated pairs") {
    import spark.implicits._
    // Components: chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val out = Dedup.duplicateClusters(pairs)
      .as[(Long, Long, Long)].collect()
      .map { case (d, r, s) => d -> ((r, s)) }.toMap
    assert(out.size === 9)
    Seq(1L, 2L, 3L, 4L).foreach(d => assert(out(d) === ((1L, 4L))))
    Seq(10L, 11L, 12L).foreach(d => assert(out(d) === ((10L, 3L))))
    Seq(20L, 21L).foreach(d => assert(out(d) === ((20L, 2L))))
  }

  test("minhash and simhash agree with the exact pairs on real documents") {
    val d = spark.read.parquet(s"$Sf0001/documents.parquet")
    val exact = Dedup.jaccardPairs(d, col("text"), col("doc_id"), 3, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val mh = Dedup.minhashPairs(d, col("text"), col("doc_id"), 3, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val sh = Dedup.simhashPairs(d, col("text"), col("doc_id"), 3, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(mh === exact)
    assert(sh === exact)
    assert(exact.nonEmpty)  // the corpus has planted near-dups
  }

  test("bloomDecontaminate flags a superset of the exact sweep, zero misses") {
    val d = spark.read.parquet(s"$Sf0001/documents.parquet")
    val train = d.filter(col("doc_id") % 7 =!= 0)
    val eval = d.filter(col("doc_id") % 7 === 0)
    val exact = Dedup.decontaminate(train, eval, col("text"), col("doc_id"))
      .filter(col("is_contaminated"))
      .select("doc_id").as[Long].collect().toSet
    val bloom = Dedup.bloomDecontaminate(train, eval, col("text"), col("doc_id"))
      .filter(col("maybe_contaminated"))
      .select("doc_id").as[Long].collect().toSet
    assert(exact.nonEmpty)            // the corpus plants cross-split dupes
    assert(exact.subsetOf(bloom))     // one-sided error: no false negatives
    // and the filter is doing work: flagged set stays far from "everything"
    assert(bloom.size < train.count())
  }
}
