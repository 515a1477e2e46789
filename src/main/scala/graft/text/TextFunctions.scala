package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, sub-token (BPE-ish) counting, rolling-hash fingerprints,
  * shingling, stopword/quality metrics, and a marker-token language-ID
  * heuristic.
  *
  * Everything here is a pure per-row `Column` expression built from
  * `org.apache.spark.sql.functions` higher-order functions — fully
  * codegen'd, no UDFs, no shuffles. At 100 TB these run inside the scan's
  * WholeStageCodegen stage at I/O speed; per-row cost is O(len(text)).
  *
  * Determinism: every hash is defined by explicit integer arithmetic
  * ((acc*31 + codepoint) mod 2^31-1) rather than an engine-internal hash,
  * so an independent engine (the DuckDB oracle) reproduces identical
  * values.
  */
object TextFunctions {

  /** 2^31 - 1 (Mersenne prime) — keeps acc*31+c within Long range. */
  val HashMod = 2147483647L

  /** SPACE-delimited tokens (ASCII 0x20 runs only — NOT general
    * whitespace); trims first and drops empty tokens so leading/
    * trailing/repeated spaces never yield phantom tokens. The space-only
    * contract is deliberate and load-bearing: the four native sketch
    * expressions (ShingleSet/MinHashBandKeys/SimHashCode/
    * MinShingleHash) and every DuckDB oracle implement the identical
    * split, and all must move in lockstep if it ever widens. Corpora
    * with structural newlines/tabs should pass through
    * [[normalizeWhitespace]] upstream — otherwise a "a\nb" reads as one
    * token here, which every operator then at least agrees on.
    */
  def tokens(c: Column): Column =
    filter(split(trim(c), " +"), t => length(t) > 0)

  /** Collapse every whitespace run (space, tab, newline, CR, unicode
    * spaces via \s) to one ASCII space — the normalization pass that
    * makes the space-only token contract above safe for raw multi-line
    * documents. Apply at ingest, before any token-derived operator.
    */
  def normalizeWhitespace(c: Column): Column =
    regexp_replace(c, "\\s+", " ")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish sub-token pattern: alpha runs, digit runs, single symbols.
    * A real BPE vocab merge table is model-specific; this regex is the
    * standard pre-tokenizer shape and is engine-portable.
    */
  val SubTokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  def subTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(SubTokenRe), lit(0)))

  /** Characters of a string as an array of Unicode code points. */
  def codePoints(c: Column): Column =
    transform(filter(split(c, ""), ch => length(ch) > 0),
      ch => ascii(ch).cast("long"))

  /** Rolling polynomial hash over the string's code points:
    * fold left with acc' = (acc*31 + cp) mod (2^31-1), acc0 = 0.
    * Order-sensitive (a true rolling hash), collision-bounded by the
    * modulus; used for document fingerprints and shingle hashing.
    * Native expression ([[graft.functions.RollingHash]]): the HOF fold
    * ([[rollingHashHof]]) is interpreted per character.
    */
  def rollingHash(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.RollingHash(
        org.apache.spark.sql.graftbridge.Bridge.expression(c)))

  /** The composed-HOF form of [[rollingHash]] — kept as the semantic
    * reference the native expression is parity-tested against. */
  def rollingHashHof(c: Column): Column =
    aggregate(codePoints(c), lit(0L), (acc, x) => (acc * 31 + x) % HashMod)

  /** Word n-gram shingles (space-joined) from an ALREADY-MATERIALIZED
    * token array column, the unit for near-dup Jaccard.
    *
    * PERFORMANCE: `toks` must be a plain column reference (projected in a
    * previous select), not an inline `tokens(text)` expression. Spark's
    * higher-order functions are interpreted, with no common-subexpression
    * elimination inside the lambda — an inline expression would re-split
    * the document for every element_at of every shingle, turning an O(L)
    * row into O(L * shingles). Measured 30x on the shingle pipeline.
    *
    * Docs shorter than n words yield an empty array (guarded — Spark's
    * `sequence` would otherwise produce a DESCENDING range).
    */
  def shinglesOfTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ",
          (1 to n).map(k => element_at(toks, i + k)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Inline convenience form — fine for small inputs / single-pass use;
    * prefer projecting `tokens` first + [[shinglesOfTokens]] in hot paths
    * (see the performance note there).
    */
  def shingles(c: Column, n: Int): Column = shinglesOfTokens(tokens(c), n)

  /** Distinct shingle set — the operand of Jaccard similarity. */
  def shingleSet(c: Column, n: Int): Column = array_distinct(shingles(c, n))

  /** Native single-pass shingle set ([[graft.functions.ShingleSet]]):
    * identical semantics to [[shingleSet]], O(len) per row instead of the
    * interpreted HOF pipeline (which degrades to O(len * shingles) once
    * the optimizer inlines the token expression into the lambda). Use in
    * every dedup hot path.
    */
  def shingleSetN(c: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.ShingleSet(
        org.apache.spark.sql.graftbridge.Bridge.expression(c), n))

  /** Bottom-1 sketch: min rolling-hash over the doc's distinct shingles
    * (a 1-permutation MinHash; cheap same-bucket prefilter). Native
    * single-pass expression ([[graft.functions.MinShingleHash]]); the
    * composed HOF form ([[shingleFingerprintHof]]) re-tokenizes the doc
    * per shingle once the optimizer inlines the lambda.
    */
  def shingleFingerprint(c: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.MinShingleHash(
        org.apache.spark.sql.graftbridge.Bridge.expression(c), n))

  /** Total BPE token count of a word-array column under a ranked merge
    * table ([[graft.functions.BpeTokenCount]]): each merge rule applied
    * in rank order as a leftmost non-overlapping greedy pass per word.
    * `words` should be `split(lower(text), "\\s+")` — the t13 merge
    * induction's tokenization convention.
    */
  def bpeTokenCount(words: Column, merges: Seq[String]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.BpeTokenCount(
        org.apache.spark.sql.graftbridge.Bridge.expression(words), merges))

  /** Hashed-n-gram linear classifier score over a word-array column
    * ([[graft.functions.HashedNgramScore]]): returns `[score, n_grams]`
    * — integer sum of bucketed weights over all unigrams + consecutive
    * bigrams, for exact rational thresholding without a division.
    */
  def hashedNgramScore(words: Column, weights: Seq[Long]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.HashedNgramScore(
        org.apache.spark.sql.graftbridge.Bridge.expression(words), weights))

  /** Per-row MinHash-LSH band keys ([[graft.functions.MinHashBandKeys]]):
    * the full signature is computed and banded inside one evaluator, so
    * MinHash dedup shuffles `bands` longs per document instead of one
    * row per shingle (see the expression scaladoc for the arithmetic).
    */
  def minhashBandKeys(c: Column, n: Int, numHashes: Int, bands: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.MinHashBandKeys(
        org.apache.spark.sql.graftbridge.Bridge.expression(c), n, numHashes, bands))

  /** Per-row 64-bit SimHash over distinct shingles
    * ([[graft.functions.SimHashCode]]); null below `minShingles` distinct
    * shingles (the sketch-reliability cutoff).
    */
  def simhashCode(c: Column, n: Int, minShingles: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.SimHashCode(
        org.apache.spark.sql.graftbridge.Bridge.expression(c), n, minShingles))

  /** Semantic reference for [[shingleFingerprint]] (parity-tested). */
  def shingleFingerprintHof(c: Column, n: Int): Column =
    array_min(transform(shingleSet(c, n), s =>
      aggregate(transform(filter(split(s, ""), ch => length(ch) > 0),
        ch => ascii(ch).cast("long")),
        lit(0L), (acc, x) => (acc * 31 + x) % HashMod)))

  // ---- Quality metrics ----

  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "or", "is", "in", "to", "for")

  def stopwordHits(c: Column): Column =
    size(filter(tokens(c), t => t.isin(Stopwords: _*)))

  def uniqueTokenCount(c: Column): Column = size(array_distinct(tokens(c)))

  /** Sum of token lengths (chars excluding whitespace). */
  def tokenCharCount(c: Column): Column =
    aggregate(tokens(c), lit(0L), (acc, t) => acc + length(t))

  /** Composite [0,1] quality score from length, lexical diversity and
    * stopword rate — the standard cheap pre-filter shape for pretraining
    * corpora (cf. C4/Gopher rules). All-double arithmetic, deterministic.
    */
  def qualityScore(c: Column): Column = {
    val n = tokenCount(c).cast("double")
    val lenScore = least(n / lit(100.0), lit(1.0))
    val uniqRatio = uniqueTokenCount(c).cast("double") / greatest(n, lit(1.0))
    val stopRatio = stopwordHits(c).cast("double") / greatest(n, lit(1.0))
    val avgTokLen = tokenCharCount(c).cast("double") / greatest(n, lit(1.0))
    val lenOk = when(avgTokLen >= 2.0 && avgTokLen <= 12.0, lit(1.0))
      .otherwise(lit(0.0))
    lenScore * lit(0.4) + uniqRatio * lit(0.3) +
      least(stopRatio * lit(4.0), lit(1.0)) * lit(0.2) + lenOk * lit(0.1)
  }

  def qualityBand(c: Column): Column = {
    val q = qualityScore(c)
    when(q >= 0.75, "high").when(q >= 0.5, "medium").otherwise("low")
  }

  // ---- Language ID (marker-token heuristic) ----

  /** Marker stopwords per language; scores are non-distinct hit counts.
    * Deterministic priority tie-break: en > de > es > fr; all-zero → "und".
    * (A production lang-ID would use char n-gram profiles; the marker-token
    * form is the portable heuristic the oracle can replicate exactly.)
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "que", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  def langScores(c: Column): Map[String, Column] =
    LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(tokens(c), t => t.isin(markers: _*)))
    }.toMap

  def langId(c: Column): Column = {
    val s = langScores(c)
    val Seq(en, de, es, fr) = Seq("en", "de", "es", "fr").map(s)
    when(en + de + es + fr === 0, "und")
      .when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }
}
