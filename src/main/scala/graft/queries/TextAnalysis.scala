package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.text.TextFunctions._

/** Text-analysis queries over the `documents` table — the language-ID /
  * quality / token-counting / fingerprinting stages of a pretraining-data
  * pipeline. Pure per-row expressions (see [[graft.text.TextFunctions]]):
  * at 100 TB these pipeline inside the parquet scan with zero shuffles.
  *
  * Oracle notes: every hash/score is defined by explicit arithmetic the
  * DuckDB side reproduces verbatim (same fold order, same IEEE-754 ops),
  * so value hashes match exactly.
  */
object TextAnalysis {

  import QuerySpec._

  /** Shared DuckDB token CTE — mirrors TextFunctions.tokens. */
  private val TokCte =
    """WITH tok AS (
      |  SELECT doc_id, text,
      |         list_filter(string_split_regex(trim(text), ' +'),
      |                     t -> length(t) > 0) AS toks
      |  FROM documents)""".stripMargin

  // ---- Token counting (whitespace + BPE-ish sub-token regex) ----
  val t1TokenStats = withOracle(
    "t1_token_stats",
    s"""$TokCte
       |SELECT doc_id,
       |       CAST(length(toks) AS BIGINT) AS n_tokens,
       |       CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_subtokens,
       |       CAST(length(text) AS BIGINT) AS n_chars,
       |       CAST(length(list_distinct(toks)) AS BIGINT) AS n_uniq,
       |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |              list_transform(toks, t -> CAST(length(t) AS BIGINT))),
       |            (a, b) -> a + b) AS BIGINT) AS n_token_chars
       |FROM tok""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      tokenCount(col("text")).cast("long").as("n_tokens"),
      subTokenCount(col("text")).cast("long").as("n_subtokens"),
      length(col("text")).cast("long").as("n_chars"),
      uniqueTokenCount(col("text")).cast("long").as("n_uniq"),
      tokenCharCount(col("text")).as("n_token_chars"))
  }

  // ---- Quality scoring (length / diversity / stopword-rate composite) ----
  val t2Quality = withOracle(
    "t2_quality",
    s"""$TokCte
       |SELECT doc_id,
       |       CAST(least(CAST(length(toks) AS DOUBLE) / 100.0, 1.0) * 0.4
       |          + CAST(length(list_distinct(toks)) AS DOUBLE)
       |              / greatest(CAST(length(toks) AS DOUBLE), 1.0) * 0.3
       |          + least(CAST(length(list_filter(toks, t -> t IN
       |                ('the','a','an','of','and','or','is','in','to','for'))) AS DOUBLE)
       |              / greatest(CAST(length(toks) AS DOUBLE), 1.0) * 4.0, 1.0) * 0.2
       |          + (CASE WHEN
       |                CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |                       list_transform(toks, t -> CAST(length(t) AS BIGINT))),
       |                     (a, b) -> a + b) AS DOUBLE)
       |                  / greatest(CAST(length(toks) AS DOUBLE), 1.0)
       |                BETWEEN 2.0 AND 12.0
       |             THEN 1.0 ELSE 0.0 END) * 0.1
       |         AS DOUBLE) AS quality_score
       |FROM tok""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      qualityScore(col("text")).as("quality_score"))
  }

  // ---- Language ID (marker-token heuristic, fixed tie-break) ----
  val t3LangId = withOracle(
    "t3_lang_id",
    s"""$TokCte,
       |sc AS (
       |  SELECT doc_id,
       |    length(list_filter(toks, t -> t IN ('the','a','of','and','is')))  AS s_en,
       |    length(list_filter(toks, t -> t IN ('der','die','das','und','ist'))) AS s_de,
       |    length(list_filter(toks, t -> t IN ('el','la','los','que','es')))  AS s_es,
       |    length(list_filter(toks, t -> t IN ('le','la','les','et','est')))  AS s_fr
       |  FROM tok)
       |SELECT doc_id,
       |       CAST(s_en AS BIGINT) AS s_en, CAST(s_de AS BIGINT) AS s_de,
       |       CAST(s_es AS BIGINT) AS s_es, CAST(s_fr AS BIGINT) AS s_fr,
       |       CASE WHEN s_en + s_de + s_es + s_fr = 0 THEN 'und'
       |            WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
       |            WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
       |            WHEN s_es >= s_fr THEN 'es'
       |            ELSE 'fr' END AS lang_pred
       |FROM sc""".stripMargin) { (s, d) =>
    val scores = langScores(col("text"))
    Tables.documents(s, d).select(
      col("doc_id"),
      scores("en").cast("long").as("s_en"),
      scores("de").cast("long").as("s_de"),
      scores("es").cast("long").as("s_es"),
      scores("fr").cast("long").as("s_fr"),
      langId(col("text")).as("lang_pred"))
  }

  // ---- Document fingerprinting (rolling hash + bottom-1 shingle sketch) ----
  val t4Fingerprint = withOracle(
    "t4_fingerprint",
    s"""$TokCte,
       |sh AS (
       |  SELECT doc_id, text,
       |         list_distinct(CASE WHEN length(toks) >= 3 THEN
       |           list_transform(range(1, length(toks) - 1),
       |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |           ELSE [] END) AS shingles
       |  FROM tok)
       |SELECT doc_id,
       |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |              list_transform(list_filter(string_split(text, ''), c -> length(c) > 0),
       |                             c -> CAST(ascii(c) AS BIGINT))),
       |            (a, b) -> (a * 31 + b) % 2147483647) AS BIGINT) AS doc_fp,
       |       CAST(list_min(list_transform(shingles,
       |              s -> list_reduce(list_prepend(CAST(0 AS BIGINT),
       |                     list_transform(list_filter(string_split(s, ''), c -> length(c) > 0),
       |                                    c -> CAST(ascii(c) AS BIGINT))),
       |                   (a, b) -> (a * 31 + b) % 2147483647))) AS BIGINT) AS shingle_fp
       |FROM sh""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      rollingHash(col("text")).as("doc_fp"),
      shingleFingerprint(col("text"), 3).as("shingle_fp"))
  }

  // ---- Token-length distribution percentiles per language ----
  // The curation dashboard staple (length cutoffs are chosen from these).
  // Spark's percentile() is the EXACT interpolated aggregate (sort +
  // linear interpolation at p*(n-1)), the same definition as DuckDB's
  // quantile_cont, so values hash-match without approximation. Scale:
  // partial aggregation collects per-group counts map-side; groups are
  // languages (bounded), so the final per-group sort is small. For
  // unbounded group counts the approx sketch (percentile_approx) is the
  // scale path — not oracle-exact, hence not used here.
  val t5TokenPercentiles = withOracle(
    "t5_token_percentiles",
    s"""WITH t AS (
       |  SELECT lang,
       |         CAST(length(list_filter(string_split_regex(trim(text), ' +'),
       |                                 x -> length(x) > 0)) AS BIGINT) AS n_tokens
       |  FROM documents)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(quantile_cont(n_tokens, 0.5) AS DOUBLE) AS p50,
       |       CAST(quantile_cont(n_tokens, 0.9) AS DOUBLE) AS p90,
       |       CAST(quantile_cont(n_tokens, 0.99) AS DOUBLE) AS p99,
       |       CAST(max(n_tokens) AS BIGINT) AS max_tokens
       |FROM t GROUP BY lang""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"), tokenCount(col("text")).cast("long").as("n_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        expr("CAST(percentile(n_tokens, 0.5D) AS DOUBLE)").as("p50"),
        expr("CAST(percentile(n_tokens, 0.9D) AS DOUBLE)").as("p90"),
        expr("CAST(percentile(n_tokens, 0.99D) AS DOUBLE)").as("p99"),
        max(col("n_tokens")).as("max_tokens"))
  }

  // ---- Reproducible content-hash train/held-out split ----
  // Splitting on a CONTENT hash (not the id, not RNG) gives two
  // properties a training pipeline needs: the split is reproducible
  // across runs/engines with no seed plumbing, and byte-identical
  // duplicates land in the same side — no train/eval leakage through
  // unnoticed dupes. Pure per-row expression (native RollingHash):
  // zero shuffle, survives any scale.
  val c1HashSplit = withOracle(
    "c1_hash_split",
    """SELECT doc_id,
      |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |              list_transform(list_filter(string_split(text, ''), c -> length(c) > 0),
      |                             c -> CAST(ascii(c) AS BIGINT))),
      |            (a, b) -> (a * 31 + b) % 2147483647) % 100 AS BIGINT) AS bucket,
      |       CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
      |              list_transform(list_filter(string_split(text, ''), c -> length(c) > 0),
      |                             c -> CAST(ascii(c) AS BIGINT))),
      |            (a, b) -> (a * 31 + b) % 2147483647) % 100 < 90
      |            THEN 'train' ELSE 'heldout' END AS split
      |FROM documents""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      pmod(rollingHash(col("text")), lit(100L)).as("bucket"),
      when(pmod(rollingHash(col("text")), lit(100L)) < 90, "train")
        .otherwise("heldout").as("split"))
  }

  // ---- TF-IDF top terms per document ----
  // Corpus-relative term weighting: tf from an explode + (doc, term)
  // count, df from a second count over the distinct (doc, term) pairs,
  // idf as the RATIONAL (N+1)/(df+1) rather than its logarithm — log is
  // a transcendental whose last-ulp can differ across libm
  // implementations, while the rational is exact IEEE division on both
  // engines AND a monotone transform of log-idf, so per-document term
  // ranking is identical to the textbook formula. Top-3 terms per doc by
  // (tfidf DESC, term). Scale: two hash-aggs over the token explode and
  // a broadcast of the (tiny) corpus-size scalar; the per-doc window
  // rides the (doc_id) partitioning of the tf agg.
  val t6Tfidf = withOracle(
    "t6_tfidf",
    """WITH tok AS (
      |  SELECT doc_id,
      |         unnest(list_filter(string_split_regex(trim(text), ' +'),
      |                            t -> length(t) > 0)) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |              CAST(tf.tf AS DOUBLE)
      |                * (CAST(n.n_docs + 1 AS DOUBLE)
      |                   / CAST(df.df + 1 AS DOUBLE)) AS tfidf
      |       FROM tf JOIN df USING (term), n),
      |r AS (SELECT sc.*, row_number() OVER (PARTITION BY doc_id
      |                 ORDER BY tfidf DESC, term) AS rank FROM sc)
      |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
      |       CAST(df AS BIGINT) AS df, tfidf, CAST(rank AS BIGINT) AS rank
      |FROM r WHERE rank <= 3""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("tf").cast("double")
        * ((col("n_docs") + 1).cast("double") / (col("df") + 1).cast("double")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rank").cast("long").as("rank"))
  }

  // ---- Top-k terms per language ----
  // The wordcount-at-scale shape: tokenize + explode (map-side), one
  // hash-agg on (lang, term), then a top-k window riding the same
  // (lang) partitioning — no second shuffle. Ties break on term text
  // so the ranking is total and engine-independent. At 100 TB the
  // (lang, term) agg is the only full shuffle and its cardinality is
  // vocabulary-sized, not corpus-sized; a heavy-hitter variant would
  // swap the exact agg for count-min + candidate re-count.
  val t7TopTerms = withOracle(
    "t7_top_terms",
    """WITH tok AS (
      |  SELECT lang, unnest(list_filter(string_split_regex(trim(text), ' +'),
      |                      t -> length(t) > 0)) AS term
      |  FROM documents),
      |tc AS (SELECT lang, term, count(*) AS n FROM tok GROUP BY 1, 2),
      |r AS (SELECT lang, term, n,
      |      row_number() OVER (PARTITION BY lang ORDER BY n DESC, term)
      |        AS rnk FROM tc)
      |SELECT lang, term, CAST(n AS BIGINT) AS n, CAST(rnk AS BIGINT) AS rnk
      |FROM r WHERE rnk <= 5""".stripMargin) { (s, d) =>
    val counts = Tables.documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("lang"), col("term")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("term"))
    counts.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("lang"), col("term"), col("n"), col("rnk"))
  }

  val specs: Seq[QuerySpec] =
    Seq(t1TokenStats, t2Quality, t3LangId, t4Fingerprint, t5TokenPercentiles,
      t6Tfidf, t7TopTerms, c1HashSplit)
}
