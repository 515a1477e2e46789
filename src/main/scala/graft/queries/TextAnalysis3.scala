package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.text.TextFunctions._

/** Round-5 text/retrieval additions over the `documents` table: BM25
  * ranked retrieval, a bigram-familiarity fluency proxy (the
  * perplexity-filter shape without a neural LM), and deterministic
  * weighted priority sampling. Shares the determinism conventions of
  * [[TextAnalysis]] — integer-exact where possible, and where doubles
  * appear they are produced by the SAME expression tree on both engines
  * (identical op order → identical IEEE-754 bits).
  */
object TextAnalysis3 {

  import QuerySpec._

  // ---- BM25 ranked retrieval ----
  // score(D,Q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl)),
  // k1 = 1.2, b = 0.75, over a fixed 4-term query. Two deviations from
  // the textbook form, both chosen for engine-exact determinism (same
  // rationale as t6_tfidf's rational idf):
  //   * idf is the RATIONAL Robertson–Sparck-Jones core
  //     (2N−2df+1)/(2df+1) — i.e. (N−df+.5)/(df+.5) scaled integer —
  //     not its logarithm: log's last ulp differs across libm builds,
  //     the rational is one exact IEEE division and a monotone
  //     transform of the log form (per-term ranking identical).
  //   * the per-doc sum runs in a FIXED, explicit order (hash + query +
  //     stream + vector, coalesced to 0.0) — double addition is not
  //     associative, so an unordered SUM() could differ between engines;
  //     a pivoted 4-term chain cannot.
  // Scale: the tf aggregate is filtered to query terms BEFORE the
  // shuffle (card ≤ N·|Q|); df and the corpus length stats are tiny
  // broadcast scalars; the final top-20 is orderBy+limit, which Spark
  // plans as TakeOrderedAndProject (per-partition partial top-k, no
  // global sort). Ranks are assigned after the limit, over 20 rows.
  private val BmQ = Seq("hash", "query", "stream", "vector")

  val t14Bm25 = withOracle(
    "t14_bm25",
    """WITH dl AS (
      |  SELECT doc_id,
      |         CAST(length(list_filter(string_split_regex(trim(text), ' +'),
      |                                 t -> length(t) > 0)) AS BIGINT) AS dl
      |  FROM documents),
      |stats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      |  FROM dl),
      |tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), ' +'),
      |                                    t -> length(t) > 0)) AS term
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      |  FROM tok WHERE term IN ('hash', 'query', 'stream', 'vector')
      |  GROUP BY 1, 2),
      |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |sc AS (
      |  SELECT tf.doc_id, tf.term,
      |         (CAST(2 * stats.n_docs - 2 * df.df + 1 AS DOUBLE)
      |            / CAST(2 * df.df + 1 AS DOUBLE))
      |           * ((CAST(tf.tf AS DOUBLE) * 2.2)
      |              / (CAST(tf.tf AS DOUBLE)
      |                 + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
      |                                          / stats.avgdl)))) AS contrib
      |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats),
      |agg AS (
      |  SELECT doc_id,
      |         CAST(count(*) AS BIGINT) AS n_match,
      |         ((coalesce(max(CASE WHEN term = 'hash'   THEN contrib END), 0.0)
      |          + coalesce(max(CASE WHEN term = 'query'  THEN contrib END), 0.0))
      |          + coalesce(max(CASE WHEN term = 'stream' THEN contrib END), 0.0))
      |          + coalesce(max(CASE WHEN term = 'vector' THEN contrib END), 0.0)
      |           AS score
      |  FROM sc GROUP BY 1),
      |top AS (SELECT * FROM agg ORDER BY score DESC, doc_id LIMIT 20)
      |SELECT doc_id, n_match, score,
      |       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
      |         AS rnk
      |FROM top""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val dl = docs.select(col("doc_id"),
      tokenCount(col("text")).cast("long").as("dl"))
    val stats = dl.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
        .as("avgdl"))
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term").isin(BmQ: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = (lit(2) * col("n_docs") - lit(2) * col("df") + lit(1))
      .cast("double") / (lit(2) * col("df") + lit(1)).cast("double")
    val denom = col("tf").cast("double") +
      lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl")))
    val contrib = idf * ((col("tf").cast("double") * lit(2.2)) / denom)
    def term(t: String) =
      coalesce(max(when(col("term") === t, col("contrib"))), lit(0.0))
    val agg = tf
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib", contrib)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_match"),
        (((term("hash") + term("query")) + term("stream")) + term("vector"))
          .as("score"))
    val top = agg.orderBy(col("score").desc, col("doc_id")).limit(20)
    top.withColumn("rnk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id"))).cast("long"))
  }

  // ---- Bigram-familiarity fluency score (perplexity-proxy filter) ----
  // The CCNet-style quality gate ranks documents by LM perplexity; the
  // engine-exact analogue scores each document by how FAMILIAR its
  // bigrams are corpus-wide, with no transcendental math: rank the
  // bigram vocabulary by corpus count (total order — count DESC, then
  // bigram text), cut into deciles by integer arithmetic, and score a
  // doc as the mean decile of its bigrams (0 = most familiar). Fluent,
  // templated text scores low; rare/garbled juxtapositions score high.
  // Scale: the ranked table is VOCABULARY-sized (≤ |V|², bounded —
  // 30-word corpus vocab here, still merely millions for real text), so
  // its global window is cheap; the corpus-sized pass is explode +
  // hash-agg + a broadcast join of the decile map. The mean is emitted
  // both as an exact integer pair (sum, n) and the deterministic
  // long-over-long double division.
  val t15BigramFluency = withOracle(
    "t15_bigram_fluency",
    """WITH tok AS (
      |  SELECT doc_id, list_filter(string_split_regex(trim(text), ' +'),
      |                             t -> length(t) > 0) AS toks
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest(CASE WHEN length(toks) >= 2 THEN
      |           list_transform(range(1, length(toks)),
      |                          i -> toks[i] || ' ' || toks[i+1])
      |         ELSE [] END) AS bigram
      |  FROM tok),
      |vocab AS (SELECT bigram, count(*) AS n FROM bg GROUP BY 1),
      |ranked AS (
      |  SELECT bigram,
      |         CAST(((row_number() OVER (ORDER BY n DESC, bigram) - 1) * 10)
      |              // (SELECT count(*) FROM vocab) AS BIGINT) AS decile
      |  FROM vocab)
      |SELECT bg.doc_id,
      |       CAST(count(*) AS BIGINT) AS n_bigrams,
      |       CAST(sum(ranked.decile) AS BIGINT) AS sum_decile,
      |       CAST(sum(ranked.decile) AS DOUBLE) / CAST(count(*) AS DOUBLE)
      |         AS fluency
      |FROM bg JOIN ranked USING (bigram)
      |GROUP BY 1""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val bg = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(shinglesOfTokens(col("toks"), 2)).as("bigram"))
    val vocab = bg.groupBy(col("bigram")).agg(count(lit(1)).as("n"))
    val vocabSize = vocab.agg(count(lit(1)).as("v_size"))
    val ranked = vocab
      .crossJoin(broadcast(vocabSize))
      .withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("bigram"))))
      .withColumn("decile",
        expr("((CAST(rn AS BIGINT) - 1) * 10) div v_size"))
      .select(col("bigram"), col("decile"))
    bg.join(broadcast(ranked), "bigram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("decile")).as("sum_decile"),
        (sum(col("decile")).cast("double") / count(lit(1)).cast("double"))
          .as("fluency"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_decile"),
        col("fluency"))
  }

  // ---- Deterministic weighted priority sampling ----
  // Weighted sampling without replacement, reproducible with no RNG
  // state: each doc gets the integer priority hash(text)·1000 div
  // (n_tokens+1) — longer (heavier) docs draw systematically smaller
  // priorities, the content-hash numerator makes the draw pseudorandom
  // within a weight class — and each source keeps its 50 smallest
  // priorities. The exact-integer analogue of A-ES exponential-jitter
  // sampling (priority u^(1/w) needs transcendental math; the quotient
  // keeps the weight monotonicity and is bit-identical across engines).
  // Scale: pure per-row arithmetic + a per-source window riding one
  // (source) shuffle; no global sort, no seed plumbing, and re-running
  // on a superset of the corpus keeps previously sampled survivors
  // stable unless displaced by genuinely smaller priorities.
  val c6PrioritySample = withOracle(
    "c6_priority_sample",
    """WITH w AS (
      |  SELECT doc_id, source,
      |         CAST(length(list_filter(string_split_regex(trim(text), ' +'),
      |                                 t -> length(t) > 0)) AS BIGINT) AS wt,
      |         list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           list_transform(list_filter(string_split(text, ''), c -> length(c) > 0),
      |                          c -> CAST(ascii(c) AS BIGINT))),
      |           (a, b) -> (a * 31 + b) % 2147483647) AS h
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, source, wt,
      |         CAST((h * 1000) // (wt + 1) AS BIGINT) AS priority
      |  FROM w),
      |r AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY source
      |                ORDER BY priority, doc_id) AS BIGINT) AS rn
      |  FROM p)
      |SELECT doc_id, source, wt, priority, rn
      |FROM r WHERE rn <= 50""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("priority"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("wt"),
        rollingHash(col("text")).as("h"))
      .withColumn("priority", expr("(h * 1000) div (wt + 1)"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 50)
      .select(col("doc_id"), col("source"), col("wt"), col("priority"),
        col("rn"))
  }

  // ---- Deterministic shard shuffle (training-order assignment) ----
  // The tokenize→shuffle→shard step every pretraining run ends with:
  // assign each document a shard and a position such that (a) the order
  // is pseudorandom with respect to source/content locality, (b) the
  // assignment is reproducible across engines and runs with no RNG
  // state, and (c) no global sort happens — the only shuffle is the
  // per-shard window, each shard ~1/32 of the corpus. Shard =
  // content-hash mod 32; position = rank of (hash, doc_id) within the
  // shard (doc_id breaks hash ties totally, so the order is exact on
  // both engines). Readers stream shard k in position order and get the
  // same curriculum everywhere.
  val c7ShardShuffle = withOracle(
    "c7_shard_shuffle",
    """WITH h AS (
      |  SELECT doc_id,
      |         list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           list_transform(list_filter(string_split(text, ''), c -> length(c) > 0),
      |                          c -> CAST(ascii(c) AS BIGINT))),
      |           (a, b) -> (a * 31 + b) % 2147483647) AS h
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(h % 32 AS BIGINT) AS shard,
      |       CAST(row_number() OVER (PARTITION BY h % 32
      |              ORDER BY h, doc_id) AS BIGINT) AS pos
      |FROM h""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), rollingHash(col("text")).as("h"))
      .withColumn("shard", pmod(col("h"), lit(32L)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  // ---- Epoch-based oversampling of rare sources ----
  // The UPSAMPLING half of the mixture story (c4/c5 down-sample): every
  // source is brought up to a common target — 2.5x the majority
  // source's document count, the "N.M epochs" shape of a real training
  // mix config (the fractional part matters: the generated corpus's
  // sources are uniform, so a plain max target would degenerate to one
  // epoch and never exercise the remainder path) — by integer epoch
  // replication: each doc repeats target/n_docs times, and the
  // remainder goes to the docs ranked first by content hash
  // (deterministic, seed-free — the same reproducibility rule as c4's
  // down-sampling). The (doc, epoch_idx) output is exactly the repeat
  // plan a training-mix config like "source X: 2.5 epochs" expands to.
  // Scale: one count aggregate, one broadcast of (source, n_docs) plus
  // a scalar target, a per-source rank window, then a per-row
  // sequence-explode whose fan-out IS the requested oversample — no
  // shuffle beyond the rank, nothing pairwise.
  val c9EpochOversample = withOracle(
    "c9_epoch_oversample",
    s"""WITH h AS (
       |  SELECT doc_id, source, ${QuerySpec.OracleSql.rollHash("text")} AS h
       |  FROM documents),
       |n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
       |      FROM h GROUP BY 1),
       |t AS (SELECT CAST((5 * max(n_docs)) // 2 AS BIGINT) AS target FROM n),
       |r AS (
       |  SELECT h.doc_id, h.source, n.n_docs, t.target,
       |         CAST(row_number() OVER (PARTITION BY h.source
       |                ORDER BY h.h, h.doc_id) AS BIGINT) AS rnk
       |  FROM h JOIN n USING (source), t),
       |k AS (
       |  SELECT doc_id, source,
       |         target // n_docs
       |           + CASE WHEN rnk <= target % n_docs THEN 1 ELSE 0 END
       |           AS n_repeats
       |  FROM r)
       |SELECT doc_id, source, CAST(n_repeats AS BIGINT) AS n_repeats,
       |       CAST(e AS BIGINT) AS epoch_idx
       |FROM k, unnest(range(0, n_repeats)) AS u(e)""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    val h = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), rollingHash(col("text")).as("h"))
    val counts = h.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val target = counts.agg(
      expr("(5 * max(n_docs)) div 2").as("target"))
    h.join(broadcast(counts), "source")
      .crossJoin(broadcast(target))
      .withColumn("rnk", row_number().over(w))
      .withColumn("n_repeats",
        expr("target div n_docs")
          + when(col("rnk") <= pmod(col("target"), col("n_docs")), 1)
            .otherwise(0))
      .select(col("doc_id"), col("source"),
        col("n_repeats").cast("long").as("n_repeats"),
        explode(expr("sequence(0, n_repeats - 1)")).as("epoch_idx"))
  }

  // ---- BPE merge-table APPLICATION + token-budget packing ----
  // t13 INDUCES the merge table (ranked adjacent-pair counts); this is
  // the other half a pretraining pipeline runs on 100% of bytes: apply
  // those merges greedily per document and pack sequences from the REAL
  // token budgets instead of c3's whitespace proxy.
  //
  // Semantics (pinned identically on both engines): words are
  // split(lower(text), '\s+') — t13's tokenization; each of the top-30
  // ranked pairs is applied IN RANK ORDER with separator-encoded
  // string-replace-to-FIXPOINT semantics over the word's code points:
  // within a replace pass a match consumes the shared boundary
  // separator, so the symbol after a merge cannot start the next match
  // in the same pass, and passes repeat per rule until none merges.
  // (This is NOT plain leftmost greedy — a self-pair run of odd length
  // >= 5 strands its leftover singleton mid-run, not at the end, which
  // changes what a later rule sees.) Merged symbols are inert under
  // later rules (every rule is a SINGLE-code-point pair). Spark runs
  // the whole apply inside one native expression
  // ([[graft.functions.BpeTokenCount]] — per-row JIT'd int loops, merge
  // table as a bounded literal); DuckDB replays the identical fixpoint
  // with a recursive CTE over the separator-encoded form —
  // NativeExpressionsSpec pins the equivalence, including the
  // greedy-divergent chains "sssssi"/['ss','si'] and "aaaaab"/['aa','ab'].
  //
  // Scale: merge induction is t13's plan (corpus collapses to the
  // distinct-word vocabulary in one shuffle; the pair domain is bounded
  // by charset²) and the 30-row table collects to a literal — the
  // codebook-materialization pattern. The apply is then a pure per-row
  // expression: no shuffle, no state, linear in corpus bytes at any
  // scale. The packing window shares c3's design point: one sequential
  // pass per SOURCE (the curriculum order a packer must serialize
  // anyway); sources are the parallel unit.
  /** The BPE induce-encode-apply-count oracle prefix t16 AND c12 share
    * — ONE copy (the QuerySpec.OracleSql discipline), ending at a `tok`
    * CTE of (doc_id, source, lang, n_words, n_tokens) per document.
    * `lang`/`n_words` ride along unused by t16's packing tail; c12's
    * fertility tail groups on them.
    */
  private val BpeTokCte =
    """WITH RECURSIVE
      |words AS (
      |  SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
      |  FROM documents, unnest(string_split_regex(lower(text), '\s+')) AS t(w)
      |  WHERE length(w) >= 2
      |  GROUP BY w),
      |pc AS (
      |  SELECT substring(word, CAST(i AS INT), 2) AS pair,
      |         CAST(sum(cnt) AS BIGINT) AS n
      |  FROM words, unnest(range(1, length(word))) AS u(i)
      |  GROUP BY pair),
      |merges AS (
      |  SELECT pair, rnk FROM (
      |    SELECT pair, row_number() OVER (ORDER BY n DESC, pair) AS rnk
      |    FROM pc)
      |  WHERE rnk <= 30),
      |nr AS (SELECT count(*) AS n FROM merges),
      |enc AS (
      |  SELECT doc_id, source, lang,
      |    CAST(length(string_split_regex(lower(text), '\s+')) AS BIGINT)
      |      AS n_words,
      |    array_to_string(list_transform(string_split_regex(lower(text), '\s+'),
      |      w -> chr(31) || regexp_replace(w, '(.)', '\1' || chr(31), 'g')),
      |      chr(30)) AS s
      |  FROM documents),
      |apply AS (
      |  SELECT doc_id, source, lang, n_words, s, 1 AS rule FROM enc
      |  UNION ALL
      |  SELECT a.doc_id, a.source, a.lang, a.n_words,
      |    replace(a.s,
      |      chr(31) || substring(m.pair, 1, 1) || chr(31) ||
      |        substring(m.pair, 2, 1) || chr(31),
      |      chr(31) || m.pair || chr(31)) AS s,
      |    CASE WHEN replace(a.s,
      |      chr(31) || substring(m.pair, 1, 1) || chr(31) ||
      |        substring(m.pair, 2, 1) || chr(31),
      |      chr(31) || m.pair || chr(31)) = a.s
      |    THEN a.rule + 1 ELSE a.rule END AS rule
      |  FROM apply a JOIN merges m ON m.rnk = a.rule),
      |tok AS (
      |  SELECT doc_id, source, lang, n_words,
      |    CAST(length(s) - length(replace(s, chr(31), '')) - 1
      |         - (length(s) - length(replace(s, chr(30), ''))) AS BIGINT)
      |      AS n_tokens
      |  FROM apply, nr WHERE rule = nr.n + 1)""".stripMargin

  /** Merge-table induction: t13's exact aggregation, ranked and
    * collected as the bounded literal the apply expression embeds —
    * the ONE Spark-side copy t16 and c12 share. */
  private def bpeMerges(s: org.apache.spark.sql.SparkSession,
      d: String): Seq[String] = {
    val vocab = Tables.documents(s, d)
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    vocab
      .select(explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"), col("cnt"))
      .groupBy(col("pair")).agg(sum(col("cnt")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(30)
      .collect().map(_.getString(0)).toSeq
  }

  val t16BpeApply = withOracle(
    "t16_bpe_apply",
    s"""$BpeTokCte,
      |o AS (
      |  SELECT doc_id, source, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      |      AS off
      |  FROM tok)
      |SELECT doc_id, source, n_tokens,
      |       CAST(off // 2048 AS BIGINT) AS seq_id,
      |       CAST(off % 2048 AS BIGINT) AS pos_in_seq
      |FROM o""".stripMargin) { (s, d) =>
    val merges = bpeMerges(s, d)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        bpeTokenCount(split(lower(col("text")), "\\s+"), merges)
          .as("n_tokens"))
      .withColumn("off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        // integer `div`, not floor(double /): exact long semantics match
        // the oracle's `//` at any magnitude (same rationale as c3).
        expr("off div 2048").as("seq_id"),
        (col("off") % 2048).cast("long").as("pos_in_seq"))
  }

  // ---- Quality-classifier inference gate ----
  // The DCLM/FineWeb-style corpus gate: a linear classifier over hashed
  // word n-grams (unigrams + consecutive bigrams), scored per document
  // and thresholded. Every modern pretraining pipeline runs one of
  // these over 100% of documents, so the inference must be a pure
  // per-row function — and it is: grams hash through the shared
  // RollingHash fold into 1024 buckets, the bucket weights are a
  // BOUNDED LITERAL (the broadcast-weights shape of a real trained
  // classifier; here a fixed integer formula both engines regenerate,
  // so the oracle is exact), and the score is an integer sum — no
  // shuffle, no floating point, bit-exact at any scale. The gate keeps
  // documents with non-negative mean weight; thresholding uses the
  // exact rational (score >= 0 x n_grams) so no division ever rounds.
  // Spark runs the whole inference in one native pass per row
  // ([[graft.functions.HashedNgramScore]] — each bigram hash CONTINUES
  // the left unigram's fold, so no gram string is ever materialized).
  // Shared with c8_corpus_pipeline's gate stage (the one-copy rule for
  // cross-entry conventions — see QuerySpec.OracleSql's rationale).
  private[queries] val GateBuckets = 1024
  private[queries] val GateMult = 2654435761L // Knuth's multiplicative constant
  private[queries] def gateWeights: Seq[Long] =
    (0 until GateBuckets).map(b => (b.toLong * GateMult) % 2001L - 1000L)
  /** The DuckDB side of one gram's bucketed weight (`g` = gram expr). */
  private[queries] def gateWeightSql(g: String): String =
    s"((${QuerySpec.OracleSql.rollHash(g)} % $GateBuckets) * $GateMult) % 2001 - 1000"

  val t17ClassifierGate = withOracle(
    "t17_classifier_gate",
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |         list_filter(string_split_regex(lower(text), '\\s+'),
       |                     w -> length(w) > 0) AS ws
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, source, g
       |  FROM toks, unnest(list_concat(ws,
       |    list_transform(range(1, length(ws)),
       |                   i -> ws[i] || ' ' || ws[i + 1]))) AS t(g)),
       |scored AS (
       |  SELECT doc_id, source,
       |         CAST(sum(${gateWeightSql("g")}) AS BIGINT) AS score,
       |         CAST(count(*) AS BIGINT) AS n_grams
       |  FROM grams GROUP BY doc_id, source)
       |SELECT doc_id, source, score, n_grams
       |FROM scored WHERE score >= 0""".stripMargin) { (s, d) =>
    val weights: Seq[Long] = gateWeights
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        hashedNgramScore(split(lower(col("text")), "\\s+"), weights)
          .as("sn"))
      .select(col("doc_id"), col("source"),
        col("sn").getItem(0).as("score"), col("sn").getItem(1).as("n_grams"))
      // n_grams >= 1 mirrors the oracle's GROUP BY (a document with no
      // grams never produces a group); the gate itself is score >= 0.
      .filter(col("n_grams") >= 1 && col("score") >= 0)
  }

  // ---- t18: n-gram novelty scoring ----
  // The dedup-pressure / memorization-risk metric a corpus dashboard
  // tracks per document: of a doc's DISTINCT 3-gram shingles, what
  // fraction appears in NO earlier document (global first owner = min
  // doc_id per shingle)? Near-clones of earlier docs score ~0, fresh
  // content ~1 — the per-doc complement of d2/d3's pairwise view, usable
  // as a cheap curation gate without computing any pairs. Scale: one
  // shuffle keyed on the shingle to find owners, one join back on the
  // same key (co-partitioned — Catalyst reuses the partitioning), one
  // doc-keyed count; everything linear in total distinct shingles, no
  // pairwise term. Docs under 3 tokens have no shingles and emit
  // nothing, mirrored by the oracle.
  val t18NgramNovelty = withOracle(
    "t18_ngram_novelty",
    """WITH tok AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), ' +'),
      |                     t -> length(t) > 0) AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |           CASE WHEN length(toks) >= 3 THEN
      |             list_transform(range(1, length(toks) - 1),
      |               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |           ELSE [] END)) AS shingle
      |  FROM tok),
      |own AS (SELECT shingle, min(doc_id) AS owner FROM sh GROUP BY 1)
      |SELECT sh.doc_id,
      |       CAST(count(*) AS BIGINT) AS n_shingles,
      |       CAST(sum(CASE WHEN own.owner = sh.doc_id
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |       CAST(sum(CASE WHEN own.owner = sh.doc_id THEN 1 ELSE 0 END)
      |            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS novelty
      |FROM sh JOIN own ON own.shingle = sh.shingle
      |GROUP BY sh.doc_id""".stripMargin) { (s, d) =>
    val sh = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(shingleSetN(col("text"), 3)).as("shingle"))
    val owners = sh.groupBy(col("shingle"))
      .agg(min(col("doc_id")).as("owner"))
    sh.join(owners, "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("owner") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_shingles").cast("double"))
  }

  // ---- c12: tokenizer fertility per language ----
  // The tokenizer-EVAL metric every multilingual pipeline tracks:
  // fertility = BPE tokens per whitespace word, per language — a
  // tokenizer whose merges were induced on one language family inflates
  // token counts (and training cost) on the others, and this table is
  // how that is caught. Composes the catalog's own pieces: the t13/t16
  // merge induction (shared [[bpeMerges]], collected once as a bounded
  // literal) and the native BpeTokenCount apply, then one lang-keyed
  // aggregation of exact integer token/word counts; fertility is the
  // deterministic long-over-long double division. Oracle shares t16's
  // recursive-CTE replay verbatim ([[BpeTokCte]] — one copy, no drift).
  val c12TokenizerFertility = withOracle(
    "c12_tokenizer_fertility",
    s"""$BpeTokCte
      |SELECT lang,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS bpe_tokens,
      |       CAST(sum(n_words) AS BIGINT) AS words,
      |       CAST(sum(n_tokens) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE)
      |         AS fertility
      |FROM tok GROUP BY lang""".stripMargin) { (s, d) =>
    val merges = bpeMerges(s, d)
    Tables.documents(s, d)
      .select(col("lang"),
        bpeTokenCount(split(lower(col("text")), "\\s+"), merges)
          .as("n_tokens"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("n_words"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bpe_tokens"),
        sum(col("n_words")).as("words"))
      .withColumn("fertility",
        col("bpe_tokens").cast("double") / col("words").cast("double"))
  }

  // ---- t19: Zipf coverage profile of the corpus vocabulary ----
  /** The corpus-statistics panel a pretraining run reads before fixing
    * its tokenizer and sampling weights: the top-100 term frequency
    * profile with rank x frequency (Zipf's law predicts ~constant) and
    * the cumulative share of ALL corpus tokens those head terms cover.
    * Logarithm-free by design: a fitted log-log slope would hinge on
    * libm's last ulp (Math.log vs DuckDB's log can disagree), while
    * rank*n is exact BIGINT and cum_share is one correctly-rounded
    * IEEE division of two exact BIGINTs — the t6/t14 rational-form
    * rationale. Scale: the (term) hash-agg is the only corpus shuffle
    * and its output is vocabulary-sized; the top-100 is a distributed
    * TakeOrderedAndProject (no global sort of the vocabulary) and the
    * rank/cumsum window orders 100 rows (the t14 limit-then-rank
    * pattern). The corpus-total branch re-aggregates the SAME term
    * counts, so the two consumers share one exchange via Spark's
    * ReuseExchange rather than scanning the corpus twice.
    */
  val t19ZipfCoverage = withOracle(
    "t19_zipf_coverage",
    """WITH tok AS (
      |  SELECT unnest(list_filter(string_split_regex(trim(text), ' +'),
      |                t -> length(t) > 0)) AS term
      |  FROM documents),
      |tc AS (SELECT term, count(*) AS n FROM tok GROUP BY 1),
      |tot AS (SELECT sum(n) AS total, count(*) AS vocab FROM tc),
      |top AS (SELECT term, n FROM tc ORDER BY n DESC, term LIMIT 100),
      |r AS (SELECT term, n,
      |        row_number() OVER (ORDER BY n DESC, term) AS rank,
      |        sum(n) OVER (ORDER BY n DESC, term
      |                     ROWS UNBOUNDED PRECEDING) AS cum_n
      |      FROM top)
      |SELECT CAST(rank AS BIGINT) AS rank, term, CAST(n AS BIGINT) AS n,
      |       CAST(rank * n AS BIGINT) AS rank_x_n,
      |       CAST(cum_n AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
      |       CAST(vocab AS BIGINT) AS vocab_size,
      |       CAST(total AS BIGINT) AS total_tokens
      |FROM r, tot""".stripMargin) { (s, d) =>
    val counts = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("total"),
      count(lit(1)).as("vocab"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("term"))
    counts.orderBy(col("n").desc, col("term")).limit(100)
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_n", sum(col("n")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .crossJoin(broadcast(tot))
      .select(col("rank"), col("term"), col("n"),
        (col("rank") * col("n")).as("rank_x_n"),
        (col("cum_n").cast("double") / col("total").cast("double"))
          .as("cum_share"),
        col("vocab").as("vocab_size"),
        col("total").as("total_tokens"))
  }

  // ---- t20: collocation mining by lift (rational PMI) ----
  /** Phrase discovery — the corpus-curation precursor to multi-word
    * tokenizer entries and stop-phrase lists: adjacent-pair
    * collocations ranked by LIFT, the rational form of PMI
    * (N * c_xy / (c_x * c_y); PMI is its log — a monotone transform, so
    * the ranking is the textbook one without a transcendental near the
    * hash, the t6 idf argument). Support floor c_xy >= 5 kills the
    * one-off pairs whose lift is spuriously huge. Distinct from t15
    * (which SCORES DOCS by bigram-decile fluency): this ranks the
    * BIGRAMS themselves against an independence baseline.
    * Scale: two vocabulary-sized hash-aggs off one token explode; the
    * unigram side joins the (support-filtered, much smaller) bigram
    * side twice on term keys; top-20 is sort+limit
    * (TakeOrderedAndProject — never a global window over the
    * vocabulary), with the rank stamped on the collected 20 rows.
    */
  val t20Collocations = withOracle(
    "t20_collocations",
    """WITH tok AS (
      |  SELECT list_filter(string_split_regex(trim(text), ' +'),
      |                     t -> length(t) > 0) AS toks
      |  FROM documents),
      |uni AS (SELECT unnest(toks) AS term FROM tok),
      |uc AS (SELECT term, count(*) AS c FROM uni GROUP BY 1),
      |nt AS (SELECT count(*) AS n_tok FROM uni),
      |bg AS (
      |  SELECT unnest(CASE WHEN length(toks) >= 2 THEN
      |           list_transform(range(1, length(toks)),
      |                          i -> toks[i] || ' ' || toks[i+1])
      |         ELSE [] END) AS bigram
      |  FROM tok),
      |bc AS (SELECT bigram, count(*) AS c_xy FROM bg
      |       GROUP BY 1 HAVING count(*) >= 5),
      |sc AS (
      |  SELECT bc.bigram, bc.c_xy, ux.c AS c_x, uy.c AS c_y,
      |         (CAST(nt.n_tok AS DOUBLE) * CAST(bc.c_xy AS DOUBLE))
      |           / (CAST(ux.c AS DOUBLE) * CAST(uy.c AS DOUBLE)) AS lift
      |  FROM bc
      |  JOIN uc ux ON ux.term = split_part(bc.bigram, ' ', 1)
      |  JOIN uc uy ON uy.term = split_part(bc.bigram, ' ', 2)
      |  CROSS JOIN nt),
      |top AS (SELECT * FROM sc ORDER BY lift DESC, bigram LIMIT 20)
      |SELECT bigram, CAST(c_xy AS BIGINT) AS c_xy,
      |       CAST(c_x AS BIGINT) AS c_x, CAST(c_y AS BIGINT) AS c_y,
      |       lift,
      |       CAST(row_number() OVER (ORDER BY lift DESC, bigram)
      |            AS BIGINT) AS rank
      |FROM top""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(tokens(col("text")).as("toks"))
    val uni = docs.select(explode(col("toks")).as("term"))
    val uc = uni.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val nt = uni.agg(count(lit(1)).as("n_tok"))
    val bc = docs
      .select(explode(shinglesOfTokens(col("toks"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= 5)
    val scored = bc
      .join(uc.select(col("term").as("tx"), col("c").as("c_x")),
        split(col("bigram"), " ").getItem(0) === col("tx"))
      .join(uc.select(col("term").as("ty"), col("c").as("c_y")),
        split(col("bigram"), " ").getItem(1) === col("ty"))
      .crossJoin(broadcast(nt))
      .select(col("bigram"), col("c_xy"), col("c_x"), col("c_y"),
        (col("n_tok").cast("double") * col("c_xy").cast("double")
          / (col("c_x").cast("double") * col("c_y").cast("double")))
          .as("lift"))
    val top = scored.orderBy(col("lift").desc, col("bigram")).limit(20)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("lift").desc, col("bigram"))
    top.withColumn("rank", row_number().over(w).cast("long"))
  }

  val specs: Seq[QuerySpec] =
    Seq(t14Bm25, t15BigramFluency, c6PrioritySample, c7ShardShuffle,
      t16BpeApply, t17ClassifierGate, c9EpochOversample, t18NgramNovelty,
      c12TokenizerFertility, t19ZipfCoverage, t20Collocations)
}
