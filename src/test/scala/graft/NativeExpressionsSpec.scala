package graft

import org.apache.spark.sql.functions._
import graft.similarity.VectorFunctions._
import graft.text.TextFunctions._

/** Parity tests: the native kernels must be bit-identical to the
  * reference higher-order-function formulations they accelerate.
  */
class NativeExpressionsSpec extends SparkSpec {

  test("dotN is bit-identical to the HOF fold on real embeddings") {
    val v = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val diff = v.select(
        dot(col("embedding"), col("embedding")).as("ref"),
        dotN(col("embedding"), col("embedding")).as("nat"))
      .filter(col("ref") =!= col("nat")).count()
    assert(diff === 0)
  }

  test("dotN handles mixed double/float element types") {
    import spark.implicits._
    val d = Seq((Array(0.5, 0.25), Array(2.0f, 4.0f))).toDF("a", "b")
      .select(dotN(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(d === 2.0)
  }

  test("dotN yields NULL on ragged inputs, matching the HOF fold and " +
      "the oracle — never a truncated partial sum") {
    import spark.implicits._
    val r = Seq((Array(1.0, 2.0, 3.0), Array(10.0, 20.0)))
      .toDF("a", "b")
      .select(dotN(col("a"), col("b")).as("nat"),
        dot(col("a"), col("b")).as("ref"))
      .collect()(0)
    assert(r.isNullAt(0), "ragged dotN must be NULL, not a partial sum")
    assert(r.isNullAt(1), "the HOF reference answers NULL here too")
  }

  test("pqCodeN on a short vector is deterministic 0-padded, never " +
      "garbage from out-of-bounds reads") {
    import spark.implicits._
    import graft.similarity.VectorFunctions.pqCodeN
    // Codebook for m=2 subspaces, k=2 centroids, subDim=2: centroid
    // (m,0) = [0,0], (m,1) = [10,10]. A 2-element vector covers only
    // subspace 0; subspace 1 must read as [0,0] -> centroid 0.
    val flat = Seq(0.0, 0.0, 10.0, 10.0, 0.0, 0.0, 10.0, 10.0)
    val out = Seq(Tuple1(Array(9.0f, 9.0f)), Tuple1(Array(9.0f, 9.0f)))
      .toDF("embedding")
      .select(pqCodeN(col("embedding"), flat, 2, 2, 2).as("c"))
      .collect().map(_.getSeq[Int](0).toSeq)
    assert(out(0) === Seq(1, 0),
      "short vector: covered subspace picks its centroid, missing " +
        "subspace reads as zeros")
    assert(out(0) === out(1), "short-vector codes must be deterministic")
  }

  test("rollingHash native equals the HOF fold on real documents") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val diff = docs.select(
        rollingHashHof(col("text")).as("ref"),
        rollingHash(col("text")).as("nat"))
      .filter(col("ref") =!= col("nat")).count()
    assert(diff === 0)
  }

  test("minShingleHash native equals the HOF fingerprint on real documents") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val diff = docs.select(
        shingleFingerprintHof(col("text"), 3).as("ref"),
        shingleFingerprint(col("text"), 3).as("nat"))
      .filter(col("ref") =!= col("nat")
        || col("ref").isNull =!= col("nat").isNull).count()
    assert(diff === 0)
  }

  test("minShingleHash is null for docs shorter than n tokens") {
    import spark.implicits._
    val out = Seq("a b", "  ", "x y z").toDF("t")
      .select(shingleFingerprint(col("t"), 3).as("h")).collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0) && !out(2).isNullAt(0))
  }

  test("shingleSetN equals the HOF shingleSet on real documents") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val diff = docs.select(
        array_sort(shingleSet(col("text"), 3)).as("ref"),
        array_sort(shingleSetN(col("text"), 3)).as("nat"))
      .filter(col("ref") =!= col("nat")).count()
    assert(diff === 0)
  }

  test("minhashBandKeys: deterministic, band-count sized, null when short") {
    import spark.implicits._
    val out = Seq(
      "the quick brown fox jumps over the lazy dog today",
      "the quick brown fox jumps over the lazy dog today",  // identical
      "the quick brown fox jumps over the lazy cat today",  // near dup
      "a b")                                                // < n tokens
      .toDF("t").select(minhashBandKeys(col("t"), 3, 128, 32).as("k")).collect()
    assert(out(3).isNullAt(0))
    val Seq(k0, k1, k2) = (0 to 2).map(_ match {
      case i => out(i).getSeq[Long](0)
    })
    assert(k0.length === 32)
    assert(k0 === k1)                       // same text -> same keys
    assert(k0.zip(k2).exists { case (a, b) => a == b })  // near dup shares a band
    assert(k0 !== k2)                       // but not every band
  }

  test("simhashCode: majority-stable, Hamming-close for near dups, cutoff null") {
    import spark.implicits._
    val long1 = (1 to 80).map(i => s"w$i").mkString(" ")
    val long2 = (1 to 80).map(i => if (i == 40) "X" else s"w$i").mkString(" ")
    val out = Seq(long1, long1, long2, "tiny doc here")
      .toDF("t").select(simhashCode(col("t"), 3, 64).as("c")).collect()
    assert(out(3).isNullAt(0))              // below the shingle cutoff
    assert(out(0).getLong(0) === out(1).getLong(0))
    val ham = java.lang.Long.bitCount(out(0).getLong(0) ^ out(2).getLong(0))
    assert(ham <= 12)                       // near dup concentrates
    assert(out(0).getLong(0) !== 0L)
  }

  test("ZOrderCode interleaves 16-bit ranks most-significant-first") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.Bridge
    import graft.functions.ZOrderCode
    def z(rs: Long*): Long = {
      val df = Seq(1).toDF("x")
      df.select(Bridge.column(ZOrderCode(
        rs.map(r => Bridge.expression(lit(r).cast("long"))))).as("z"))
        .collect()(0).getLong(0)
    }
    assert(z(0xFFFFL) === 0xFFFFL)                 // k=1: identity
    assert(z(1L, 0L) === 2L)                       // col 0 owns odd bits
    assert(z(0L, 1L) === 1L)
    assert(z(0xFFFFL, 0L) === 0xAAAAAAAAL)         // alternating 10
    assert(z(0L, 0xFFFFL) === 0x55555555L)
    assert(z(0xFFFFL, 0xFFFFL) === 0xFFFFFFFFL)
    assert(z(0x1FFFFL, 0L) === 0xAAAAAAAAL)        // high bits masked
    // k=4 fills 64 bits; the sign-bit flip keeps signed ordering equal
    // to unsigned interleave ordering
    assert(z(1L, 1L, 1L, 1L) === (15L ^ Long.MinValue))
    assert(z(0xFFFFL, 0L, 0L, 0L) > z(0x7FFFL, 0xFFFFL, 0xFFFFL, 0xFFFFL))
    // ordering: the leading column dominates, then the second
    assert(z(2L, 0L) > z(1L, 3L))
  }

  test("PqCode/PqLut natives equal the HOF argmin/distance formulation") {
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val M = 4; val K = 16; val sub = 16
    val seeds = emb.filter(col("vec_id").between(200, 215))
      .orderBy(col("vec_id")).select(col("embedding"))
      .collect().toSeq.map(_.getSeq[Float](0).map(_.toDouble))
    val flat = for { m <- 0 until M; k <- 0 until K; i <- 0 until sub }
      yield seeds(k)(m * sub + i)
    // Reference: interpreted HOF fold of (x - c)^2 over each subspace
    // slice — the same widen-subtract-square-accumulate order as the
    // native loop and the DuckDB oracle.
    def l2Ref(m: Int, k: Int) = {
      val cent = typedLit(seeds(k).slice(m * sub, (m + 1) * sub))
      aggregate(zip_with(slice(col("embedding"), m * sub + 1, sub), cent,
        (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
        lit(0.0), (a, b) => a + b)
    }
    val codesRef = array((0 until M).map { m =>
      val scored = (0 until K).map(k =>
        struct((-l2Ref(m, k)).as("nd"), lit(-k).as("nk")))
      (-greatest(scored: _*).getField("nk")).cast("int")
    }: _*)
    val lutRef = array(
      (for { m <- 0 until M; k <- 0 until K } yield l2Ref(m, k)): _*)
    val diff = emb.select(
        codesRef.as("cref"),
        pqCodeN(col("embedding"), flat, M, K, sub).as("cnat"),
        lutRef.as("lref"),
        pqLutN(col("embedding"), flat, M, K, sub).as("lnat"))
      .filter(col("cref") =!= col("cnat") || col("lref") =!= col("lnat"))
      .count()
    assert(diff === 0)
  }

  test("shingleSetN edge cases: short, empty, padded") {
    import spark.implicits._
    val out = Seq("a b", "", "  x y z  ", "a  b c").toDF("t")
      .select(shingleSetN(col("t"), 3).as("s")).collect().map(_.getSeq[String](0))
    assert(out(0) === Seq())
    assert(out(1) === Seq())
    assert(out(2) === Seq("x y z"))
    assert(out(3) === Seq("a b c"))
  }

  /** The t16 oracle's semantics, verbatim in the JVM: encode each word
    * as a -separated code-point string, then iterate each rule's
    * literal leftmost non-overlapping replace (Java String.replace ==
    * DuckDB replace) to FIXPOINT before advancing to the next rule.
    * Token count = separators - 1 - word-boundary marks. */
  private def replayOracleTokens(text: String, merges: Seq[String]): Long = {
    val Sep = '\u001f'; val Rs = '\u001e'
    def enc(w: String): String = {
      val sb = new StringBuilder; sb.append(Sep)
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        sb.appendAll(Character.toChars(cp)); sb.append(Sep)
        i += Character.charCount(cp)
      }
      sb.toString
    }
    var s = text.toLowerCase.split("\\s+", -1).map(enc).mkString(Rs.toString)
    merges.foreach { m =>
      val c0 = new String(Character.toChars(m.codePointAt(0)))
      val c1 = new String(Character.toChars(
        m.codePointAt(m.offsetByCodePoints(0, 1))))
      val pat = s"$Sep$c0$Sep$c1$Sep"
      val rep = s"$Sep$m$Sep"
      var prev = ""
      while (prev != s) { prev = s; s = s.replace(pat, rep) }
    }
    s.count(_ == Sep) - 1L - s.count(_ == Rs)
  }

  test("bpeTokenCount equals the oracle's replace-fixpoint " +
      "on adversarial merge chains") {
    import spark.implicits._
    // The cases where a SINGLE replace pass diverges from the fixpoint:
    // back-to-back chains share the boundary separator ("abab", "aaaa"),
    // overlapping self-pairs pick leftmost ("aaa"), merged symbols must
    // stay inert under later rules ("ab" then "ba" on "aba"), rule
    // ORDER matters ("ba" before "ab" flips the winner) — and the cases
    // where the fixpoint diverges from PLAIN GREEDY: a self-pair run of
    // odd length >= 5 strands its leftover singleton MID-run (replace)
    // vs at the END (greedy), so a later rule consuming that singleton
    // sees different adjacencies ("sssssi"/['ss','si'] → 4 not 3,
    // "aaaaab"/['aa','ab'] → 4 not 3).
    val cases = Seq(
      ("abab abab", Seq("ab")),
      ("aaaa", Seq("aa")),
      ("aaa", Seq("aa")),
      ("aaaaa", Seq("aa")),
      ("sssssi", Seq("ss", "si")),
      ("aaaaab", Seq("aa", "ab")),
      ("sssssssi", Seq("ss", "si")),
      ("aba", Seq("ab", "ba")),
      ("aba", Seq("ba", "ab")),
      ("ababab bababa", Seq("ab", "ba")),
      ("the theatre heats", Seq("th", "he", "ea")),
      ("", Seq("ab")),
      ("   ", Seq("ab")),
      ("x", Seq("ab")),
      ("aabbaabb", Seq("ab", "aa", "bb")),
      ("mississippi", Seq("ss", "is", "si", "pp", "ip")))
    cases.foreach { case (text, merges) =>
      val nat = Seq(text).toDF("text")
        .select(bpeTokenCount(split(lower(col("text")), "\\s+"), merges)
          .as("n")).collect()(0).getLong(0)
      val ref = replayOracleTokens(text, merges)
      assert(nat === ref,
        s"native=$nat fixpoint=$ref for text='$text' merges=$merges")
    }
  }

  test("bpeTokenCount equals the oracle replay on real documents") {
    val merges = Seq("e ", "th", "he", "in", "er", "an", "re", "on",
      "at", "en", "nd", "ti", "es", "or").filter(_.trim.length == 2)
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val nat = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(bpeTokenCount(split(lower(col("text")), "\\s+"), merges)
        .as("n"))
      .collect().map(_.getLong(0))
    val ref = docs.map(replayOracleTokens(_, merges))
    assert(nat.toSeq === ref.toSeq)
  }
}
