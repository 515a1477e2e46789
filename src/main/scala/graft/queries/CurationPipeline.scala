package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.dedup.Dedup
import graft.text.TextFunctions._

/** c8 — the END-TO-END corpus curation pipeline, every stage of which
  * exists as a standalone oracle-verified operator, composed into ONE
  * declarative plan: the "documents in, training order out" program a
  * pretraining-data team actually ships.
  *
  *   1. content-hash split: bucket >= 90 becomes the held-out/eval set
  *      (c1 — dupes cannot straddle the split);
  *   2. language gate: marker-majority langId != 'und' (t3);
  *   3. quality gate: composite score >= 0.45 (t2 — engine-exact
  *      doubles, so the comparison is identical on both engines);
  *   3b. classifier gate: hashed-n-gram linear score >= 0 over >= 1
  *      gram (t17 — the DCLM/FineWeb trained-gate shape, same shared
  *      weights; all-integer, so the threshold is bit-exact);
  *   4. exact dedup: min-doc_id survivor per sha256(text) group (d1);
  *   5. decontamination: drop survivors sharing any 13-gram with the
  *      held-out set (d8 — broadcast DISTINCT eval shingles);
  *   6. temperature mixture: per-source sqrt(n) quotas over the
  *      SURVIVING counts, half-corpus target, content-hash keep rule
  *      (c5 — integer-exact);
  *   7. shard shuffle: hash-mod-32 shard + per-shard rank = the
  *      reproducible training order (c7).
  *
  * Scale shape: one corpus scan feeds per-row gates (native
  * expressions, no shuffle), then the three shuffles the semantics
  * require — sha groups, the 13-gram explode join (eval side
  * broadcast), and the per-shard rank window — plus two broadcast
  * scalars (source quotas, corpus totals). Nothing quadratic, nothing
  * collected, no stage that would not survive 1000 executors; Catalyst
  * pipelines the gates into the scan.
  */
object CurationPipeline {

  import QuerySpec._

  private val RollHash = QuerySpec.OracleSql.rollHash("text")
  private val Cat13 = QuerySpec.OracleSql.cat13

  val c8CorpusPipeline = withOracle(
    "c8_corpus_pipeline",
    s"""WITH h AS (
       |  SELECT doc_id, source, text, $RollHash AS h
       |  FROM documents),
       |tr AS (SELECT * FROM h WHERE h % 100 < 90),
       |ho AS (SELECT * FROM h WHERE h % 100 >= 90),
       |tok AS (
       |  SELECT doc_id, list_filter(string_split_regex(trim(text), ' +'),
       |                             t -> length(t) > 0) AS toks
       |  FROM tr),
       |lang AS (
       |  SELECT doc_id,
       |    length(list_filter(toks, t -> t IN ('the','a','of','and','is')))  AS s_en,
       |    length(list_filter(toks, t -> t IN ('der','die','das','und','ist'))) AS s_de,
       |    length(list_filter(toks, t -> t IN ('el','la','los','que','es')))  AS s_es,
       |    length(list_filter(toks, t -> t IN ('le','la','les','et','est')))  AS s_fr
       |  FROM tok),
       |lp AS (
       |  SELECT doc_id,
       |         CASE WHEN s_en + s_de + s_es + s_fr = 0 THEN 'und'
       |              WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
       |              WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
       |              WHEN s_es >= s_fr THEN 'es'
       |              ELSE 'fr' END AS lang_pred
       |  FROM lang),
       |qual AS (
       |  SELECT doc_id,
       |         CAST(least(CAST(length(toks) AS DOUBLE) / 100.0, 1.0) * 0.4
       |            + CAST(length(list_distinct(toks)) AS DOUBLE)
       |                / greatest(CAST(length(toks) AS DOUBLE), 1.0) * 0.3
       |            + least(CAST(length(list_filter(toks, t -> t IN
       |                  ('the','a','an','of','and','or','is','in','to','for'))) AS DOUBLE)
       |                / greatest(CAST(length(toks) AS DOUBLE), 1.0) * 4.0, 1.0) * 0.2
       |            + (CASE WHEN
       |                  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |                         list_transform(toks, t -> CAST(length(t) AS BIGINT))),
       |                       (a, b) -> a + b) AS DOUBLE)
       |                    / greatest(CAST(length(toks) AS DOUBLE), 1.0)
       |                  BETWEEN 2.0 AND 12.0
       |               THEN 1.0 ELSE 0.0 END) * 0.1
       |           AS DOUBLE) AS q
       |  FROM tok),
       |filt AS (
       |  SELECT tr.*, lp.lang_pred
       |  FROM tr JOIN lp USING (doc_id) JOIN qual USING (doc_id)
       |  WHERE lp.lang_pred <> 'und' AND qual.q >= 0.45),
       |gt AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
       |                             w -> length(w) > 0) AS ws
       |  FROM filt),
       |gg AS (
       |  SELECT doc_id, g
       |  FROM gt, unnest(list_concat(ws,
       |    list_transform(range(1, length(ws)),
       |                   i -> ws[i] || ' ' || ws[i + 1]))) AS t(g)),
       |gs AS (
       |  SELECT doc_id, CAST(sum(${TextAnalysis3.gateWeightSql("g")})
       |           AS BIGINT) AS score
       |  FROM gg GROUP BY doc_id),
       |filt2 AS (
       |  SELECT filt.* FROM filt JOIN gs USING (doc_id)
       |  WHERE gs.score >= 0),
       |grp AS (
       |  SELECT sha256(text) AS sha, min(doc_id) AS rep
       |  FROM filt2 GROUP BY 1),
       |uniq AS (
       |  SELECT filt2.* FROM filt2
       |  JOIN grp ON sha256(filt2.text) = grp.sha AND filt2.doc_id = grp.rep),
       |utok AS (
       |  SELECT doc_id, list_filter(string_split_regex(trim(text), ' +'),
       |                             t -> length(t) > 0) AS toks
       |  FROM uniq),
       |ush AS (
       |  SELECT doc_id,
       |         list_distinct(CASE WHEN length(toks) >= 13 THEN
       |           list_transform(range(1, length(toks) - 11), i -> $Cat13)
       |           ELSE [] END) AS shingles
       |  FROM utok),
       |htok AS (
       |  SELECT doc_id, list_filter(string_split_regex(trim(text), ' +'),
       |                             t -> length(t) > 0) AS toks
       |  FROM ho),
       |ev AS (
       |  SELECT DISTINCT unnest(
       |           list_distinct(CASE WHEN length(toks) >= 13 THEN
       |             list_transform(range(1, length(toks) - 11), i -> $Cat13)
       |             ELSE [] END)) AS sh
       |  FROM htok),
       |hits AS (
       |  SELECT t.doc_id FROM
       |    (SELECT doc_id, unnest(shingles) AS sh FROM ush) t
       |  JOIN ev USING (sh) GROUP BY 1),
       |clean AS (
       |  SELECT uniq.* FROM uniq
       |  LEFT JOIN hits USING (doc_id) WHERE hits.doc_id IS NULL),
       |n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
       |      FROM clean GROUP BY 1),
       |w AS (SELECT source, n_docs, CAST(floor(sqrt(n_docs)) AS BIGINT) AS wt
       |      FROM n),
       |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
       |               CAST(sum(wt) AS BIGINT) AS wsum FROM w),
       |q2 AS (SELECT source, n_docs, ((tot.total // 2) * wt) // tot.wsum AS quota
       |       FROM w, tot),
       |samp AS (
       |  SELECT clean.* FROM clean JOIN q2 USING (source)
       |  WHERE clean.h % q2.n_docs < q2.quota)
       |SELECT doc_id, source, lang_pred,
       |       CAST(h % 32 AS BIGINT) AS shard,
       |       CAST(row_number() OVER (PARTITION BY h % 32
       |              ORDER BY h, doc_id) AS BIGINT) AS pos
       |FROM samp""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .withColumn("h", rollingHash(col("text")))
    val train = docs.filter(pmod(col("h"), lit(100L)) < 90)
    val heldout = docs.filter(pmod(col("h"), lit(100L)) >= 90)
    val filtered = train
      .withColumn("lang_pred", langId(col("text")))
      .filter(col("lang_pred") =!= "und")
      .filter(qualityScore(col("text")) >= 0.45)
      // 3b. classifier gate — t17's native inference, shared weights;
      // the join-implied ">= 1 gram" of the oracle is the n_grams >= 1
      // conjunct here (a doc with no grams produces no gs group).
      .withColumn("sn", hashedNgramScore(
        split(lower(col("text")), "\\s+"), TextAnalysis3.gateWeights))
      .filter(col("sn").getItem(1) >= 1 && col("sn").getItem(0) >= 0)
      .drop("sn")
    // Exact dedup as a WINDOW over the content sha rather than
    // d1's groupBy+join-back (r17): same survivor set (min doc_id per
    // sha group), but ONE exchange instead of two AND — decisive here —
    // the exchange becomes the SHARED prefix every downstream consumer
    // of `unique` re-enters via ReuseExchange, so the gate chain above
    // it (langId, quality, classifier — the pipeline's per-row CPU) is
    // evaluated once per refresh instead of once per consumer branch
    // (measured: 5 evaluations before the rewrite). Same shape as the
    // catalog's w1 window dedup; the sha window carries no order and
    // only a min, so per-group state is O(1) streaming at any scale.
    val shaW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_sha"))
    val unique = filtered
      .withColumn("_sha", sha2(col("text"), 256))
      .withColumn("_rep", min(col("doc_id")).over(shaW))
      .filter(col("doc_id") === col("_rep"))
      .drop("_sha", "_rep")
    val keep = Dedup.decontaminate(unique, heldout,
        col("text"), col("doc_id"), n = 13)
      .filter(!col("is_contaminated")).select(col("doc_id"))
    val clean = unique.join(keep, "doc_id")
    val counts = clean.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val quotas = QuerySpec.temperatureQuotas(counts) // shared with c5
    val sampled = clean
      .join(broadcast(quotas), "source")
      .filter(pmod(col("h"), col("n_docs")) < col("quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    sampled
      .withColumn("shard", pmod(col("h"), lit(32L)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("source"), col("lang_pred"),
        col("shard"), col("pos"))
  }

  // ---- c10: RAG context assembly ----
  // The retrieval-side composition a RAG / retrieval-augmented training
  // pipeline runs per query: (1) exact top-k cosine retrieval (the s1
  // brute baseline — a deployment swaps in s2/b8's banded probe as the
  // scale path, the assembly stages are retrieval-agnostic), (2) enrich
  // candidates with document metadata via a BROADCAST of the tiny top-k
  // side (the documents scan never shuffles), (3) source-diversity cap —
  // at most ONE doc per source per context, the "host dedup" rule that
  // stops a single crawl domain from filling the window (drops 10 rows
  // at sf0.01), (4) pack surviving docs in rank order under a 200-token
  // context budget via a per-query running sum (drops 36 more). Emits
  // one row per query: the packed id list in rank order, doc count, and
  // token total. Every window partitions by q_id over at most k rows, so
  // per-query state is O(k) however large the corpus; the only scan of
  // `documents` carries a 3-column projection.
  val c10RagAssembly = withOracle(
    "c10_rag_assembly",
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
       |           FROM embeddings WHERE vec_id < 10),
       |sc AS (SELECT q.q_id, e.vec_id AS cand_id,
       |              ${SimilarityQueries.cosSql("q.q_emb", "e.embedding")} AS cosine
       |       FROM q, embeddings e WHERE e.vec_id <> q.q_id),
       |r AS (SELECT q_id, cand_id,
       |             row_number() OVER (PARTITION BY q_id
       |                                ORDER BY cosine DESC, cand_id) AS rank
       |      FROM sc),
       |top AS (SELECT q_id, cand_id, rank FROM r WHERE rank <= 8),
       |doc AS (SELECT doc_id, source,
       |               CAST(length(list_filter(
       |                 string_split_regex(trim(text), ' +'),
       |                 x -> length(x) > 0)) AS BIGINT) AS n_toks
       |        FROM documents),
       |d AS (SELECT top.q_id, top.rank, top.cand_id, doc.source, doc.n_toks
       |      FROM top JOIN doc ON doc.doc_id = top.cand_id),
       |u AS (SELECT *, row_number() OVER (PARTITION BY q_id, source
       |                                   ORDER BY rank) AS rn2 FROM d),
       |k AS (SELECT q_id, rank, cand_id, n_toks,
       |             sum(n_toks) OVER (PARTITION BY q_id ORDER BY rank
       |                               ROWS UNBOUNDED PRECEDING) AS cum
       |      FROM u WHERE rn2 = 1),
       |f AS (SELECT * FROM k WHERE cum <= 200)
       |SELECT q_id, string_agg(cand_id, ',' ORDER BY rank) AS context_ids,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_toks) AS BIGINT) AS total_tokens
       |FROM f GROUP BY q_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.similarity.VectorFunctions.{dotN, normN}
    val v = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        normN(col("embedding")).as("nrm"))
    val q = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val rankW = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    val top = v.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        (dotN(col("q_emb"), col("embedding"))
          / (col("q_nrm") * col("nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= 8)
      .select(col("q_id"), col("cand_id"), col("rank"))
    val doc = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(filter(split(trim(col("text")), " +"),
          t => length(t) > 0)).cast("long").as("n_toks"))
    val srcW = Window.partitionBy(col("q_id"), col("source"))
      .orderBy(col("rank"))
    val cumW = Window.partitionBy(col("q_id")).orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    doc.join(broadcast(top), col("doc_id") === col("cand_id"))
      .withColumn("rn2", row_number().over(srcW))
      .filter(col("rn2") === 1)
      .withColumn("cum", sum(col("n_toks")).over(cumW))
      .filter(col("cum") <= 200)
      .groupBy(col("q_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("rank"), col("cand_id")))),
          x => x.getField("cand_id").cast("string")), ",").as("context_ids"),
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_tokens"))
  }

  // ---- c11: dataset card (per-source corpus summary) ----
  // The summary table a dataset card / curation dashboard publishes per
  // source: volume (docs, tokens), shape (mean doc length), language
  // spread, and duplication pressure (docs sharing their leading
  // 15-token window with an earlier doc of the SAME source — st17's
  // head-shingle key, scoped per source). One scan, one source-keyed
  // aggregation; the head-dup count rides the same aggregate via
  // count distinct over heads. At 100 TB the output is |sources| rows
  // and every aggregate is map-side combinable except the two distincts,
  // which shuffle (source, value) pairs — still linear, no pairwise term.
  val c11DatasetCard = withOracle(
    "c11_dataset_card",
    """WITH t AS (
      |  SELECT source, lang,
      |         CAST(length(list_filter(string_split_regex(trim(text), ' +'),
      |                                 x -> length(x) > 0)) AS BIGINT) AS n_toks,
      |         array_to_string(list_filter(
      |           string_split_regex(trim(text), ' +'),
      |           x -> length(x) > 0)[1:15], ' ') AS head
      |  FROM documents)
      |SELECT source,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
      |       CAST(sum(n_toks) AS DOUBLE) / CAST(count(*) AS DOUBLE)
      |         AS mean_doc_tokens,
      |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |       CAST(count(*) - count(DISTINCT head) AS BIGINT) AS n_head_dups
      |FROM t GROUP BY source""".stripMargin) { (s, d) =>
    val toks = filter(split(trim(col("text")), " +"), t => length(t) > 0)
    Tables.documents(s, d)
      .select(col("source"), col("lang"),
        size(toks).cast("long").as("n_toks"),
        array_join(slice(toks, 1, 15), " ").as("head"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        (count(lit(1)) - countDistinct(col("head"))).as("n_head_dups"))
      .withColumn("mean_doc_tokens",
        col("n_tokens").cast("double") / col("n_docs").cast("double"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("mean_doc_tokens"), col("n_langs"), col("n_head_dups"))
  }

  // ---- c13: stratified split with EXACT per-stratum quotas ----
  /** The split c1 cannot give you: c1's Bernoulli-by-hash split has
    * binomial noise per stratum (a small language can land 7% or 14%
    * held-out), while an eval set needs floor(n/10) docs from EVERY
    * source, exactly. Standard recipe: within each stratum, order docs
    * by (content hash, doc_id) — a deterministic pseudo-random order,
    * the same RollingHash convention as c1 so the two splits are
    * consistent tooling — rank them, and cut at the per-stratum quota
    * computed from the stratum's own count. Scale: rank and count ride
    * ONE (source) shuffle (count(*) over the same window partition —
    * no separate quota join); the sort is per-stratum, parallel across
    * strata, never global. A single 100 TB stratum would shard its
    * window exactly like c3's packing (per-shard windows); strata here
    * are bounded.
    */
  val c13StratifiedSplit = withOracle(
    "c13_stratified_split",
    s"""WITH h AS (
       |  SELECT doc_id, source,
       |         ${QuerySpec.OracleSql.rollHash("text")} AS hv
       |  FROM documents),
       |r AS (SELECT doc_id, source,
       |        row_number() OVER (PARTITION BY source
       |                           ORDER BY hv, doc_id) AS rn,
       |        count(*) OVER (PARTITION BY source) AS n
       |      FROM h)
       |SELECT doc_id, source,
       |       CASE WHEN rn <= n // 10 THEN 'heldout' ELSE 'train' END
       |         AS split,
       |       CAST(n // 10 AS BIGINT) AS stratum_quota
       |FROM r""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("hv"), col("doc_id"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        rollingHash(col("text")).as("hv"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .select(col("doc_id"), col("source"),
        when(col("rn") <= floor(col("n") / 10), "heldout")
          .otherwise("train").as("split"),
        floor(col("n") / 10).cast("long").as("stratum_quota"))
  }

  // ---- c14: k-anonymity audit over quasi-identifiers ----
  /** The PRIVACY side of curation t9's PII scrub doesn't cover:
    * scrubbing direct identifiers leaves QUASI-identifiers (Sweeney's
    * k-anonymity, public literature) — attribute combinations rare
    * enough to re-identify a record. The audit groups the corpus by a
    * quasi-identifier tuple (language, source, token-length bucket —
    * the release-metadata columns a dataset card exposes) and flags
    * every equivalence class smaller than k=5: those documents are
    * re-identifiable from metadata alone and need suppression or
    * generalization before release. Emitting the per-class rows (not
    * just a count) puts the whole audit under the hash gate. Scale:
    * one hash aggregation on the quasi tuple — the class space is
    * bounded by the metadata vocabulary, so map-side partials do the
    * work; no window, no join, corpus-size-independent output.
    */
  val c14KAnonymity = withOracle(
    "c14_k_anonymity",
    """WITH q AS (
      |  SELECT lang, source,
      |         least(CAST(length(list_filter(
      |                 string_split_regex(trim(text), ' +'),
      |                 t -> length(t) > 0)) AS BIGINT) // 64, 7)
      |           AS len_bucket
      |  FROM documents)
      |SELECT lang, source, len_bucket,
      |       CAST(count(*) AS BIGINT) AS k,
      |       count(*) < 5 AS at_risk
      |FROM q GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"), col("source"),
        tokenCount(col("text")).cast("long").as("n"))
      // integer `div`, not floor(double /): exact long semantics match
      // the oracle's `//` (the t12 rationale).
      .select(col("lang"), col("source"),
        least(expr("n div 64"), lit(7L)).as("len_bucket"))
      .groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("k"))
      .select(col("lang"), col("source"), col("len_bucket"), col("k"),
        (col("k") < 5).as("at_risk"))
  }

  // ---- c15: l-diversity audit over the behavioral table ----
  /** The companion privacy check to c14's k-anonymity: a class can be
    * k-anonymous yet still leak if everyone in it shares the SAME
    * sensitive value (the homogeneity attack k-anonymity famously
    * misses — Machanavajjhala et al., "l-Diversity: Privacy Beyond
    * k-Anonymity", ICDE 2006). Here the quasi-identifier is the
    * behavioral release key (event_type, day) and the sensitive
    * attribute is user_id: a class with fewer than 3 distinct users is
    * flagged — publishing per-type daily aggregates for it would let an
    * observer who knows "Alice used feature X that day" attribute the
    * rows. One hash aggregation, distinct-count exact (the release
    * audit needs the exact l, not a sketch — classes are QI-bounded,
    * |event types| x |days|, so the exact count is cheap at any SF;
    * the per-class distinct rides the same map-side partial-agg shape
    * as a1). Output: class, size n, diversity l, at_risk.
    */
  val c15LDiversity = withOracle(
    "c15_l_diversity",
    """SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS l,
      |       count(DISTINCT user_id) < 3 AS at_risk
      |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"),
        col("ts").cast("date").cast("string").as("day"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("l"))
      .select(col("event_type"), col("day"), col("n"), col("l"),
        (col("l") < 3).as("at_risk"))
  }

  val specs: Seq[QuerySpec] =
    Seq(c8CorpusPipeline, c10RagAssembly, c11DatasetCard, c13StratifiedSplit,
      c14KAnonymity, c15LDiversity)
}
