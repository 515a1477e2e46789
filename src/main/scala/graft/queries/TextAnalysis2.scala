package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.text.TextFunctions._

/** Second text-pipeline batch: repetition filters, PII scrubbing, document
  * chunking and sequence packing — the curation stages that sit between
  * quality scoring and tokenizer output in a pretraining pipeline.
  */
object TextAnalysis2 {

  import QuerySpec._

  /** Shared DuckDB token CTE (mirrors TextFunctions.tokens). */
  private val TokCte =
    """WITH tok AS (
      |  SELECT doc_id, source, text,
      |         list_filter(string_split_regex(trim(text), ' +'),
      |                     t -> length(t) > 0) AS toks
      |  FROM documents)""".stripMargin

  // ---- Repetition filters (Gopher-style) ----
  // Two signals: the fraction of tokens that are the single most frequent
  // token (top-term coverage) and the fraction of duplicate 3-grams.
  // Scale: the top-term count uses the explode + two-level hash-agg shape
  // (map-side combine on (doc, term), then a per-doc max that RIDES the
  // doc_id partitioning of the first agg — one shuffle total), because the
  // per-row HOF alternative is O(len^2) per document and dies on long
  // docs. The trigram-dup fraction IS per-row (native ShingleSet distinct
  // count vs. positional count), zero extra shuffle.
  val t8Repetition = withOracle(
    "t8_repetition",
    s"""$TokCte,
       |tc AS (SELECT doc_id, unnest(toks) AS term FROM tok),
       |top AS (SELECT doc_id, max(n) AS top_n FROM (
       |          SELECT doc_id, term, count(*) AS n FROM tc GROUP BY 1, 2)
       |        GROUP BY 1),
       |tri AS (SELECT doc_id,
       |          CAST(length(toks) AS BIGINT) AS n_tokens,
       |          CASE WHEN length(toks) >= 3 THEN length(toks) - 2 ELSE 0 END AS tri_total,
       |          CASE WHEN length(toks) >= 3 THEN length(list_distinct(
       |            list_transform(range(1, length(toks) - 1),
       |              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
       |          ELSE 0 END AS tri_distinct
       |        FROM tok),
       |m AS (SELECT t.doc_id, t.n_tokens,
       |        CAST(coalesce(top.top_n, 0) AS DOUBLE)
       |          / greatest(CAST(t.n_tokens AS DOUBLE), 1.0) AS top_term_frac,
       |        CASE WHEN t.tri_total = 0 THEN 0.0
       |             ELSE 1.0 - CAST(t.tri_distinct AS DOUBLE)
       |                          / CAST(t.tri_total AS DOUBLE) END AS dup_trigram_frac
       |      FROM tri t LEFT JOIN top USING (doc_id))
       |SELECT doc_id, n_tokens, top_term_frac, dup_trigram_frac,
       |       top_term_frac > 0.12 OR dup_trigram_frac > 0.35 AS is_repetitive
       |FROM m""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val perRow = toks.select(
      col("doc_id"),
      size(col("toks")).cast("long").as("n_tokens"),
      greatest(size(col("toks")) - 2, lit(0)).cast("long").as("tri_total"),
      size(array_distinct(shinglesOfTokens(col("toks"), 3)))
        .cast("long").as("tri_distinct"))
    val top = toks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id")).agg(max(col("n")).as("top_n"))
    perRow.join(top, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"),
        (coalesce(col("top_n"), lit(0L)).cast("double")
          / greatest(col("n_tokens").cast("double"), lit(1.0))).as("top_term_frac"),
        when(col("tri_total") === 0, lit(0.0))
          .otherwise(lit(1.0) - col("tri_distinct").cast("double")
            / col("tri_total").cast("double")).as("dup_trigram_frac"))
      .withColumn("is_repetitive",
        col("top_term_frac") > 0.12 || col("dup_trigram_frac") > 0.35)
  }

  // ---- PII scrubbing ----
  // Redact long digit runs (ids, account numbers, phone-shaped tokens)
  // from a derived contact line. Pure per-row regexp expressions — the
  // scrub pipelines inside the scan with zero shuffle at any scale. The
  // redaction COUNT is kept alongside the scrubbed text (audit trail:
  // curation pipelines log how much was removed, not just the output).
  // DuckDB note: its regexp_replace is first-match unless the 'g' flag is
  // given; Spark's is global always — the oracle passes 'g'.
  val t9PiiScrub = withOracle(
    "t9_pii_scrub",
    """WITH line AS (
      |  SELECT c_custkey,
      |         'contact ' || c_name || ' balance ' ||
      |         CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) ||
      |         ' segment ' || c_mktsegment AS raw
      |  FROM customer)
      |SELECT c_custkey,
      |       regexp_replace(raw, '[0-9]{4,}', '<NUM>', 'g') AS scrubbed,
      |       CAST(length(regexp_extract_all(raw, '[0-9]{4,}')) AS BIGINT)
      |         AS n_redacted
      |FROM line""".stripMargin) { (s, d) =>
    val raw = concat(
      lit("contact "), col("c_name"), lit(" balance "),
      col("c_acctbal").cast("decimal(12,2)").cast("string"),
      lit(" segment "), col("c_mktsegment"))
    Tables.customer(s, d)
      .select(col("c_custkey"), raw.as("raw"))
      .select(
        col("c_custkey"),
        regexp_replace(col("raw"), "[0-9]{4,}", "<NUM>").as("scrubbed"),
        size(regexp_extract_all(col("raw"), lit("[0-9]{4,}"), lit(0)))
          .cast("long").as("n_redacted"))
  }

  // ---- Overlapping document chunking ----
  // Fixed-size token windows (40 tokens, stride 30 → overlap 10): the
  // long-document split before tokenizer/embedding stages. explode of a
  // per-row start sequence + slice — per-row expressions, zero shuffle;
  // output rows ∝ total tokens / stride, the unavoidable fan-out.
  val t10Chunking = withOracle(
    "t10_chunking",
    s"""$TokCte,
       |st AS (SELECT doc_id, toks,
       |         unnest(generate_series(1, length(toks), 30)) AS chunk_start
       |       FROM tok WHERE length(toks) > 0)
       |SELECT doc_id, CAST(chunk_start AS BIGINT) AS chunk_start,
       |       CAST(least(40, length(toks) - chunk_start + 1) AS BIGINT)
       |         AS chunk_len,
       |       array_to_string(list_slice(toks, chunk_start, chunk_start + 39), ' ')
       |         AS chunk_text
       |FROM st""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), size(col("toks")), lit(30))).as("chunk_start"))
      .select(
        col("doc_id"),
        col("chunk_start").cast("long").as("chunk_start"),
        least(lit(40), size(col("toks")) - col("chunk_start") + 1)
          .cast("long").as("chunk_len"),
        array_join(slice(col("toks"), col("chunk_start"), lit(40)), " ")
          .as("chunk_text"))
  }

  // ---- Sequence packing ----
  // Assign documents to fixed token-budget training sequences (2048
  // tokens) by running offset within a shard. Sharding by `source` is the
  // production shape: packing needs a total order, and a global sort of
  // 100 TB is exactly what to avoid — per-shard windows sort only within
  // each shard's partition, in parallel. Window frame is ROWS-based on a
  // unique key (doc_id), so the running sum is engine-independent.
  //
  // BUDGET COLUMN — whitespace counts BY DESIGN, not an oversight:
  // t16_bpe_apply runs this SAME packing window over REAL BpeTokenCount
  // budgets (the production composition), so re-pointing c3 at BPE
  // counts would clone t16. c3 is kept as the isolated PACKING pin: its
  // trivially-recomputable whitespace budget makes any packing
  // regression attributable to the window itself, never to the
  // tokenizer kernel upstream. The two entries deliberately differ in
  // exactly one input column.
  val c3SequencePacking = withOracle(
    "c3_sequence_packing",
    """WITH t AS (
      |  SELECT doc_id, source,
      |         CAST(length(list_filter(string_split_regex(trim(text), ' +'),
      |                                 x -> length(x) > 0)) AS BIGINT) AS n_tokens
      |  FROM documents),
      |o AS (SELECT doc_id, source, n_tokens,
      |        sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      |          AS off FROM t)
      |SELECT doc_id, source, n_tokens,
      |       CAST(off // 2048 AS BIGINT) AS seq_id,
      |       CAST(off % 2048 AS BIGINT) AS pos_in_seq
      |FROM o""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(
        col("doc_id"), col("source"), col("n_tokens"),
        // integer `div`, NOT floor(double /): past 2^53 total tokens the
        // double quotient is lossy and could land one sequence off the
        // oracle's exact integer division
        expr("off div 2048").as("seq_id"),
        (col("off") % 2048).cast("long").as("pos_in_seq"))
  }

  // ---- Count-min heavy hitters ----
  // Terms covering >= 2% of all tokens, EXACTLY — found the sketch way.
  // Why not groupBy(term) directly? With a bounded vocabulary that is
  // fine (t7 does it), but when distinct terms outgrow executor hash
  // maps (URLs, n-grams — billions of keys at 100 TB), the partial
  // aggregation spills and the full (term) shuffle carries the whole
  // corpus. The count-min plan never shuffles more than it must:
  //
  //  1. SKETCH: each term instance maps to 4 (row, position) cells
  //     (independent universal hashes of the term's rolling hash);
  //     groupBy(row, pos) has a FIXED 4 x 2048 group space, so map-side
  //     partial aggregation is bounded (the per-partition partials ARE
  //     per-partition count-min sketches, and the exchange merges them —
  //     8192 rows per partition, corpus-size-independent). The collected
  //     matrix is 64 KiB — the codebook-materialization pattern.
  //  2. FILTER: est(term) = min over rows of matrix[r][pos_r(term)],
  //     a pure per-row expression against the broadcast matrix. Count-min
  //     only OVERcounts, so every true heavy hitter survives; the
  //     instance filter is a map-side scan, no shuffle.
  //  3. RE-COUNT: groupBy(term) over surviving instances only — the
  //     shuffle now carries candidate terms' instances, not the corpus —
  //     and the exact HAVING removes the sketch's false positives.
  //
  // Net result is EXACT (the oracle is the plain exact query), which is
  // the point: the sketch buys the plan, not an approximation.
  private val CmRows = 4
  private val CmWidth = 2048
  private val CmA = Array(31L, 131L, 8191L, 524287L)
  private val CmB = Array(7L, 11L, 13L, 17L)
  private val HhFrac = 0.02

  private def cmPos(h: org.apache.spark.sql.Column, r: Int) =
    pmod(pmod(lit(CmA(r)) * h + lit(CmB(r)), lit(2147483647L)), lit(CmWidth.toLong))

  val t11HeavyHitters = withOracle(
    "t11_heavy_hitters",
    s"""WITH tok AS (
       |  SELECT unnest(list_filter(string_split_regex(trim(text), ' +'),
       |                            t -> length(t) > 0)) AS term
       |  FROM documents),
       |tot AS (SELECT count(*) AS n_tokens FROM tok),
       |tc AS (SELECT term, count(*) AS n FROM tok GROUP BY 1)
       |SELECT term, CAST(n AS BIGINT) AS n
       |FROM tc, tot
       |WHERE CAST(n AS DOUBLE) >= CAST(n_tokens AS DOUBLE) * $HhFrac""".stripMargin) {
    (s, d) =>
      val toks = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("term"))
      // Pass 1: build + collect the 4 x 2048 sketch.
      val cells = toks.select(rollingHash(col("term")).as("h"))
        .select(explode(array((0 until CmRows).map(r =>
          struct(lit(r).as("r"), cmPos(col("h"), r).as("p"))): _*)).as("rp"))
        .groupBy(col("rp.r").as("r"), col("rp.p").as("p"))
        .agg(count(lit(1)).as("c"))
        .collect()
      val matrix = Array.fill(CmRows)(new Array[Long](CmWidth))
      cells.foreach(row =>
        matrix(row.getInt(0))(row.getLong(1).toInt) = row.getLong(2))
      // Pass 2: per-instance estimate filter, exact re-count, exact HAVING.
      val total = broadcast(toks.agg(count(lit(1)).as("n_tokens")))
      val withH = toks.select(col("term"), rollingHash(col("term")).as("h"))
      val est = least((0 until CmRows).map(r =>
        element_at(lit(matrix(r)), cmPos(col("h"), r).cast("int") + 1)): _*)
      withH
        .withColumn("est", est)
        .crossJoin(total)
        .filter(col("est").cast("double")
          >= col("n_tokens").cast("double") * HhFrac)
        .groupBy(col("term"))
        .agg(count(lit(1)).as("n"), max(col("n_tokens")).as("nt"))
        .filter(col("n").cast("double") >= col("nt").cast("double") * HhFrac)
        .select(col("term"), col("n"))
  }

  // ---- Mergeable-histogram quantiles ----
  // t5 computes EXACT percentiles (sort-based — fine while groups are
  // bounded); this is the sketch that replaces it when they aren't: a
  // fixed 64-bucket histogram of token counts per language. groupBy
  // (lang, bucket) has a bounded group space, so map-side partials are
  // per-partition histograms and the exchange merges them — the same
  // mergeable-sketch shape as HLL/count-min, corpus-size-independent
  // state. Quantile q resolves to the first bucket whose cumulative
  // count reaches q*n; the answer is the bucket's lower bound (error
  // bounded by bucket width — a resolution knob, not a correctness one).
  // All bucket/cumulative arithmetic is integer + exact IEEE doubles, so
  // the oracle reproduces the estimates bit-for-bit.
  private val QBucketW = 8L
  private val QBuckets = 64L

  val t12QuantileHistogram = withOracle(
    "t12_quantile_histogram",
    s"""WITH t AS (
       |  SELECT lang,
       |         CAST(length(list_filter(string_split_regex(trim(text), ' +'),
       |                                 x -> length(x) > 0)) AS BIGINT) AS n
       |  FROM documents),
       |h AS (SELECT lang, least(n // $QBucketW, ${QBuckets - 1}) AS bucket,
       |             count(*) AS c
       |      FROM t GROUP BY 1, 2),
       |cum AS (SELECT lang, bucket, c,
       |          sum(c) OVER (PARTITION BY lang ORDER BY bucket
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |          sum(c) OVER (PARTITION BY lang) AS n_lang
       |        FROM h),
       |q AS (SELECT * FROM cum, (SELECT unnest([0.5, 0.9, 0.99]) AS q) qq
       |      WHERE CAST(cum AS DOUBLE) >= q * CAST(n_lang AS DOUBLE))
       |SELECT lang, q, CAST(min(bucket) * $QBucketW AS BIGINT) AS est_lo,
       |       CAST(min(n_lang) AS BIGINT) AS n_docs
       |FROM q GROUP BY 1, 2""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val hist = Tables.documents(s, d)
      .select(col("lang"), tokenCount(col("text")).cast("long").as("n"))
      .groupBy(col("lang"),
        // integer `div`, not floor(double /): exact long semantics match
        // the oracle's `//` at any magnitude (double division goes lossy
        // past 2^53 — same rationale as c3_sequence_packing).
        least(expr(s"n div $QBucketW"), lit(QBuckets - 1)).as("bucket"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("lang")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("lang"))
    hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n_lang", sum(col("c")).over(wAll))
      .crossJoin(broadcast(
        s.range(1).select(explode(typedLit(Seq(0.5, 0.9, 0.99))).as("q"))))
      .filter(col("cum").cast("double") >= col("q") * col("n_lang").cast("double"))
      .groupBy(col("lang"), col("q"))
      .agg((min(col("bucket")) * QBucketW).as("est_lo"),
        min(col("n_lang")).as("n_docs"))
      .select(col("lang"), col("q"), col("est_lo"), col("n_docs"))
  }

  // ---- Training-mix source sampling ----
  // Down-sample each source at its own rate — the data-mixture step that
  // turns "weights per corpus" into an actual training set. The keep
  // decision is keyed on the CONTENT hash (like c1's split), so it is
  // reproducible with no seed plumbing, byte-identical duplicates sample
  // identically across sources, and re-running over a grown corpus keeps
  // every previously-kept document (rates are per-row pure functions —
  // zero shuffle, survives any scale). Rates here derive from the source
  // name (src0 → 100%, down by 4.5% per index); a production mixture
  // would broadcast a rate map — f4 demonstrates the literal-map decode.
  val c4SourceMixture = withOracle(
    "c4_source_mixture",
    """WITH r AS (
      |  SELECT doc_id, source,
      |         1000 - 45 * CAST(substr(source, 4) AS INT) AS permille,
      |         list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           list_transform(list_filter(string_split(text, ''), c -> length(c) > 0),
      |                          c -> CAST(ascii(c) AS BIGINT))),
      |           (a, b) -> (a * 31 + b) % 2147483647) % 1000 AS bucket
      |  FROM documents)
      |SELECT doc_id, source, CAST(bucket AS BIGINT) AS bucket,
      |       CAST(permille AS BIGINT) AS permille
      |FROM r WHERE bucket < permille""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        (lit(1000) - lit(45) * expr("substring(source, 4)").cast("int"))
          .cast("long").as("permille"),
        pmod(rollingHash(col("text")), lit(1000L)).as("bucket"))
      .filter(col("bucket") < col("permille"))
      .select(col("doc_id"), col("source"), col("bucket"), col("permille"))
  }

  // ---- BPE vocabulary induction: the first merge's pair counts ----
  // The scoring kernel a byte-pair-encoding tokenizer trainer runs every
  // merge iteration: count adjacent symbol pairs across the corpus,
  // weighted by word frequency, and take the top pairs (the argmax IS
  // the merge). Computed the way BPE trainers actually do — collapse the
  // corpus to DISTINCT words first (one shuffle; the heavy Zipf head
  // collapses to one row each), then expand each vocab word into its
  // ≤len-1 adjacent pairs and re-aggregate weighted by the word count.
  // The pair domain is bounded by charset² regardless of corpus size, so
  // the second shuffle is tiny, and the top-30 is TakeOrdered (per-
  // partition heads, no global sort). At 100 TB only the word-count
  // aggregation sees the data; everything after runs on the vocabulary.
  val t13BpeMerges = withOracle(
    "t13_bpe_merges",
    """WITH words AS (
      |  SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
      |  FROM documents, unnest(string_split_regex(lower(text), '\s+')) AS t(w)
      |  WHERE length(w) >= 2
      |  GROUP BY w),
      |pairs AS (
      |  SELECT substring(word, CAST(i AS INT), 2) AS pair, cnt
      |  FROM words, unnest(range(1, length(word))) AS u(i))
      |SELECT pair, CAST(sum(cnt) AS BIGINT) AS n_occurrences
      |FROM pairs GROUP BY pair
      |ORDER BY n_occurrences DESC, pair LIMIT 30""".stripMargin) { (s, d) =>
    val words = Tables.documents(s, d)
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    words
      // interpreted HOF is fine here: it runs once per DISTINCT word
      // (the vocabulary), not once per corpus token.
      .select(explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"), col("cnt"))
      .groupBy(col("pair"))
      .agg(sum(col("cnt")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(30)
  }

  // ---- Temperature-scaled mixture sampling ----
  // c4's rates are STATIC (declared per source name); this is the
  // data-derived complement a pretraining mixture actually computes:
  // sample each source proportionally to n^α (α=1/2 — the temperature
  // smoothing that up-weights small corpora), targeting half the corpus.
  // All arithmetic is integer-exact so both engines agree at any scale:
  // weights floor(sqrt(n)) (correctly-rounded IEEE sqrt + floor, exact
  // below 2^52), per-source quotas by 128-bit-safe integer division, and
  // the keep decision is `content_hash mod n_source < quota` — a pure
  // per-row predicate against a broadcast quota map. No global sort, no
  // per-source window (which would put a whole source in one partition);
  // the only shuffle is the tiny source-count aggregate, so the data
  // pass is scan + broadcast-join + filter at any corpus size, and the
  // content-hash key keeps the sample reproducible with no seed state.
  val c5TemperatureMixture = withOracle(
    "c5_temperature_mixture",
    """WITH n AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY source),
      |w AS (
      |  SELECT source, n_docs, CAST(floor(sqrt(n_docs)) AS BIGINT) AS wt
      |  FROM n),
      |tot AS (
      |  SELECT CAST(sum(n_docs) AS BIGINT) AS total,
      |         CAST(sum(wt) AS BIGINT) AS wsum FROM w),
      |q AS (
      |  SELECT source, n_docs, ((tot.total // 2) * wt) // tot.wsum AS quota
      |  FROM w, tot),
      |h AS (
      |  SELECT doc_id, source,
      |         list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           list_transform(list_filter(string_split(text, ''), c -> length(c) > 0),
      |                          c -> CAST(ascii(c) AS BIGINT))),
      |           (a, b) -> (a * 31 + b) % 2147483647) AS hash
      |  FROM documents)
      |SELECT h.doc_id, h.source, CAST(h.hash % q.n_docs AS BIGINT) AS bucket,
      |       CAST(q.quota AS BIGINT) AS quota
      |FROM h JOIN q USING (source)
      |WHERE h.hash % q.n_docs < q.quota""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val n = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val quotas = QuerySpec.temperatureQuotas(n) // shared with c8 stage 6
    docs
      .join(broadcast(quotas), Seq("source"))
      .withColumn("bucket", pmod(rollingHash(col("text")), col("n_docs")))
      .filter(col("bucket") < col("quota"))
      .select(col("doc_id"), col("source"), col("bucket"), col("quota"))
  }

  val specs: Seq[QuerySpec] =
    Seq(t8Repetition, t9PiiScrub, t10Chunking, c3SequencePacking,
      t11HeavyHitters, t12QuantileHistogram, c4SourceMixture, t13BpeMerges,
      c5TemperatureMixture)
}
