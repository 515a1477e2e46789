package graft

// (path-graph doubling pin lives at the bottom of DedupSpec)

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

  test("minhash bucket cap bounds adversarial band-key floods without losing true pairs") {
    // Build a flooded bucket the way an adversary (or template spam)
    // would: every decoy doc is one unique token plus a long shared run,
    // so its distinct shingle set is TWO shingles — the shared
    // (magic,magic,magic) and a unique boundary. Whenever the shared
    // shingle's 4 permutation hashes happen to be the band minima, every
    // decoy emits the SAME band key: one bucket holding the whole decoy
    // population, none of which are mutual near-dups (pairwise Jaccard
    // ~ 1/3). The magic token is found by probing two docs with
    // different unique tokens for a shared band key — deterministic,
    // because the permutation constants are fixed.
    def doc(unique: String, magic: String): String =
      unique + (" " + magic) * 30
    val probeTokens = (0 until 120).map(i => s"tok$i")
    val probes = probeTokens.flatMap(t =>
      Seq((t, 1, doc("ua", t)), (t, 2, doc("ub", t))))
      .toDF("tok", "side", "text")
      .select(col("tok"), col("side"),
        posexplode(graft.text.TextFunctions.minhashBandKeys(
          col("text"), 3, 128, 32)))
      .toDF("tok", "side", "band", "bkey")
    val magic = probes.groupBy("tok", "band", "bkey")
      .agg(countDistinct("side").as("sides"))
      .filter(col("sides") === 2)
      .select("tok").as[String].collect().headOption
      .getOrElse(fail("no band-dominating token among 120 probes — " +
        "hash constants changed?"))
    // 400 decoys flood the dominated band(s); 3 true near-dups (>= 0.8
    // Jaccard on a long shared tail, small head edits) sit in the SAME
    // flooded bucket via the magic run, plus pair in other bands through
    // their shared tail.
    val tail = (0 until 60).map(i => s"w$i").mkString(" ")
    val dups = Seq(
      9001L -> s"alpha $tail ${doc("da", magic)}",
      9002L -> s"beta $tail ${doc("db", magic)}",
      9003L -> s"gamma $tail ${doc("dc", magic)}")
    def corpus(decoys: Int) =
      ((0 until decoys).map(i => (i.toLong, doc(s"u$i", magic)))
        ++ dups.map { case (id, t) => (id, t) })
        .toDF("doc_id", "text")
    def cands(decoys: Int, cap: Int): Long =
      Dedup.minhashCandidatePairs(corpus(decoys), col("text"),
        col("doc_id"), 3, 128, 32, maxBucket = cap).count()
    // Uncapped, the flood is QUADRATIC in the decoy population — the
    // melt a single hot key causes at scale.
    val un400 = cands(400, Int.MaxValue)
    val un800 = cands(800, Int.MaxValue)
    assert(un400 > 20000L, s"flood did not form (got $un400 pairs)")
    assert(un800 > 3 * un400,
      s"uncapped flood should grow ~quadratically ($un400 -> $un800)")
    // Capped, every surviving bucket expands at most C(cap,2) pairs:
    // the total is a small fraction of the flood and grows at most
    // LINEARLY when the flood doubles (more buckets cross the cap and
    // drop out; none expands more).
    val cap400 = cands(400, 64)
    val cap800 = cands(800, 64)
    assert(cap400 < un400 / 4,
      s"bucket cap did not bound the flood ($cap400 of $un400)")
    assert(cap800 <= 2 * cap400 + 100,
      s"capped candidates grew super-linearly ($cap400 -> $cap800)")
    // Recall: the true near-dup pairs still verify exactly — they pair
    // through non-flooded bands — and no decoy pair survives the exact
    // verification.
    val verified = Dedup.minhashPairs(corpus(400), col("text"),
      col("doc_id"), 3, 0.8, maxBucket = 64)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(verified === Set((9001L, 9002L), (9001L, 9003L), (9002L, 9003L)))
  }

  test("minhash candidate volume scales at most linearly across a data " +
      "decade (the d3 stage-count invariant)") {
    // d3's decade timing ratio has sat at 10.2x-10.6x for 10x data two
    // rounds running. This pins WHY it is linear from the stage counts
    // themselves, not a timing inference: per doc, the sketch emits a
    // FIXED 32 band keys, and the bucketed pair expansion (cap 1024)
    // produces candidates proportional to docs x mean-bucket-fanout —
    // so the candidates-per-doc RATE must not grow with corpus size.
    // Exact d3 parameters (n=3, 128 hashes, 32 bands, maxBucket=1024).
    def stages(dir: String): (Long, Long, Long) = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val docs = d.count()
      val bandKeys = docs * 32 // per-row native sketch: fixed fan-out
      val cands = Dedup.minhashCandidatePairs(d, col("text"),
        col("doc_id"), 3, 128, 32, 1024).count()
      (docs, bandKeys, cands)
    }
    // documents carries 500 rows at sf0.001/sf0.01 and 5000 at sf0.1 —
    // the committed testdata's one clean 10x decade for this table.
    val (docsS, keysS, candsS) = stages(Sf0001)
    val (docsL, keysL, candsL) = stages("/root/testdata/sf0.1")
    info(f"sf0.001: docs=$docsS bandKeys=$keysS candidates=$candsS " +
      f"(${candsS.toDouble / docsS}%.3f/doc)")
    info(f"sf0.1:   docs=$docsL bandKeys=$keysL candidates=$candsL " +
      f"(${candsL.toDouble / docsL}%.3f/doc)")
    val scale = docsL.toDouble / docsS
    assert(scale >= 5.0, "test data shape changed; decade assumption broken")
    // Candidates may not grow faster than the doc count (50% slack for
    // the planted-duplicate density differing slightly between scales).
    assert(candsL <= candsS * scale * 1.5,
      s"candidate pairs grew SUPER-linearly across the decade: " +
        s"$candsS -> $candsL at ${scale}x docs")
  }

  test("minhash candidate rate holds at the SECOND decade " +
      "(the sf0.1 -> sf1.0 shape, counts not wall time)") {
    // The previous test pins sf0.001 -> sf0.1; the sf0.1 -> sf1.0
    // decade existed only as wall-time evidence (BENCH_r09_sf1.json's
    // ~10x total for 10x data), never as a candidate-count assertion.
    // This closes it with counts on exactly the corpus shape those
    // measurements used: ScaleUp.replicateDocuments replays the sf1.0
    // replica transform in-memory (per-replica token rename ->
    // cross-replica shingle sets disjoint — "10x more documents", not
    // "every doc gains 9 exact clones"), and d3's candidate RATE
    // (candidates per doc, cap 1024) must not grow across the decade.
    val d01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val step = d01.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val d10 = ScaleUp.replicateDocuments(d01, 10, step)
    def cands(d: org.apache.spark.sql.DataFrame): Long =
      Dedup.minhashCandidatePairs(d, col("text"), col("doc_id"),
        3, 128, 32, 1024).count()
    val docsS = d01.count(); val candsS = cands(d01)
    val docsL = d10.count(); val candsL = cands(d10)
    info(f"sf0.1:      docs=$docsS candidates=$candsS " +
      f"(${candsS.toDouble / docsS}%.3f/doc)")
    info(f"sf1.0-rep:  docs=$docsL candidates=$candsL " +
      f"(${candsL.toDouble / docsL}%.3f/doc)")
    assert(docsL === docsS * 10, "replica factor broken")
    // Within-replica SIMILARITY structure is preserved, but renamed
    // replicas re-hash their shingles, so marginal band collisions
    // fluctuate a little per replica (measured 2592 vs a 2600 exact-10x
    // floor) — the floor is 9x, catching any wholesale structure loss.
    // Super-linear growth above would mean cross-replica bucket
    // collisions accumulate with corpus size — the failure mode the
    // band-key space must absorb at 100 TB.
    assert(candsL >= candsS * 9,
      "replicas lost their within-replica candidate structure")
    assert(candsL <= candsS * 10 * 1.5,
      s"candidate pairs grew SUPER-linearly across the second decade: " +
        s"$candsS -> $candsL at 10x docs")
  }

  test("pointer doubling converges a path graph in O(log diameter) rounds") {
    // A 400-edge path is the adversarial case for label propagation:
    // the minimum must travel 400 hops, so a loop whose doubling step
    // silently degraded to plain propagation would need ~400 rounds
    // (and throw at the 30-round guard), while working doubling closes
    // it in ~log2(400) + small-constant rounds. This pins the
    // O(log diameter) claim the 100 TB design rests on.
    val path = spark.range(0, 400)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    // localThreshold = 0 forces the distributed loop: a 400-edge graph
    // would otherwise take the single-task union-find fast path and
    // this pin would stop exercising the doubling step.
    val out = Dedup.duplicateClusters(path, localThreshold = 0L)
    assert(Dedup.lastIterations > 1,
      "distributed loop not taken — threshold override broken?")
    assert(Dedup.lastIterations <= 14,
      s"path graph took ${Dedup.lastIterations} rounds — doubling broken?")
    val rows = out.collect()
    assert(rows.length === 401)
    assert(rows.forall(_.getLong(1) == 0L), "single component, rep = 0")
    assert(rows.forall(_.getLong(2) == 401L))
  }

  test("union-find fast path matches the distributed loop exactly") {
    import spark.implicits._
    // Deterministic pseudo-random graph with chains, cliques and
    // singleton pairs; compare the full output frames row-for-row.
    val edges = (0 until 3000).map { i =>
      val a = (i * 2654435761L) % 997
      val b = (a + i % 7 + 1) % 997
      (a, b)
    }.toDF("doc_a", "doc_b")
    val fast = Dedup.duplicateClusters(edges)
    assert(Dedup.lastIterations === 1, "fast path not taken")
    val fastRows = fast.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val loop = Dedup.duplicateClusters(edges, localThreshold = 0L)
    assert(Dedup.lastIterations > 1, "distributed loop not taken")
    val loopRows = loop.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fastRows === loopRows)
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

  test("substringDedup cuts arbitrary-offset repeated spans, drops clones " +
    "whole, and keeps sub-window docs intact") {
    val corpus = Seq(
      (0L, "a b c d e f"),            // first occurrence of every window
      (1L, "x y a b c d z"),          // embeds A's span at offset 2
      (2L, "a b c d e f"),            // exact clone of 0: must VANISH
      (3L, "m n o m n o m n o"),      // self-repetition within one doc
      (4L, "q r")                     // shorter than k: no windows, kept
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedup(corpus, col("text"), col("doc_id"), k = 3)
      .select("doc_id", "clean_text", "n_kept")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out(0L) === (("a b c d e f", 6L)))   // first doc untouched
    // B loses exactly the copied span "a b c d" (windows "a b c"/"b c d"
    // at positions 2 and 3 cover tokens 2..5), keeping its own frame.
    assert(out(1L) === (("x y z", 3L)))
    assert(!out.contains(2L))                   // clone fully covered
    // E's windows repeat its own pos-0..2 windows: every position from 3
    // on is covered, the first period survives.
    assert(out(3L) === (("m n o", 3L)))
    assert(out(4L) === (("q r", 2L)))           // sub-window doc intact
  }
}
