package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables
import graft.similarity.VectorFunctions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * s1 is the exact brute-force baseline (broadcast the query set, score
  * every candidate, per-query top-k). s2 is the scale path: 16-bit
  * sign-random-projection LSH codes computed once per vector; candidate
  * filter `hamming(code_q, code_c) <= 4` runs as a 2-instruction integer
  * prefilter BEFORE any cosine arithmetic, so at 100 TB the expensive
  * fold touches only ~4% of pairs (and the code, computed at ingest, can
  * be partition/bucket key for a shuffle-free probe).
  *
  * Both are hash-verified: the LSH hyperplanes are deterministic rationals
  * (see [[graft.similarity.VectorFunctions.hyperplaneComponent]]) that the
  * DuckDB oracle recomputes exactly, so even the approximate variant's
  * candidate set — not just its final ranks — is bit-reproducible.
  */
object SimilarityQueries {

  import QuerySpec._

  private val Dim = 64
  private val Bits = 16
  private val MaxHamming = 4
  private val TopK = 5
  private val NumQueries = 10

  /** DuckDB ordered-fold dot product over list columns. */
  private def foldDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(range(1, length($a) + 1),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       |  (x, y) -> x + y)""".stripMargin

  private def cosSql(a: String, b: String): String =
    s"(${foldDot(a, b)} / (sqrt(${foldDot(a, a)}) * sqrt(${foldDot(b, b)})))"

  /** DuckDB replica of VectorFunctions.lshCode: per-bit hyperplane dot via
    * the LCG rational formula, CASE to the bit's power of two.
    */
  private def lshCodeSql(emb: String): String =
    (0 until Bits).map { j =>
      val base = j.toLong * Dim
      val dotJ =
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |  list_transform(range(1, length($emb) + 1),
           |    i -> (CAST((1103515245 * ($base + i - 1) + 12345) % 2147483648 AS DOUBLE)
           |          / 2147483648.0 - 0.5) * CAST($emb[i] AS DOUBLE))),
           |  (x, y) -> x + y)""".stripMargin
      s"(CASE WHEN $dotJ >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  // ---- s1: exact brute-force cosine top-k ----
  val s1BruteTopK = withOracle(
    "s1_ann_brute",
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
       |           FROM embeddings WHERE vec_id < $NumQueries),
       |sc AS (SELECT q.q_id, e.vec_id AS cand_id,
       |              ${cosSql("q.q_emb", "e.embedding")} AS cosine
       |       FROM q, embeddings e WHERE e.vec_id <> q.q_id),
       |r AS (SELECT q_id, cand_id, cosine,
       |             row_number() OVER (PARTITION BY q_id
       |                                ORDER BY cosine DESC, cand_id) AS rank
       |      FROM sc)
       |SELECT q_id, cand_id, CAST(rank AS BIGINT) AS rank, cosine
       |FROM r WHERE rank <= $TopK""".stripMargin) { (s, d) =>
    val v = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        normN(col("embedding")).as("nrm"))
    val q = v.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    v.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        (dotN(col("q_emb"), col("embedding"))
          / (col("q_nrm") * col("nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("cand_id"),
        col("rank").cast("long").as("rank"), col("cosine"))
  }

  // ---- s2: LSH-bucketed ANN (integer prefilter, exact re-rank) ----
  val s2AnnLsh = withOracle(
    "s2_ann_lsh",
    s"""WITH v AS (SELECT vec_id, embedding,
       |                  ${lshCodeSql("embedding")} AS code
       |           FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS q_emb, code AS q_code
       |      FROM v WHERE vec_id < $NumQueries),
       |cand AS (SELECT q.q_id, v.vec_id AS cand_id, q.q_emb, v.embedding
       |         FROM q, v
       |         WHERE v.vec_id <> q.q_id
       |           AND bit_count(xor(q.q_code, v.code)) <= $MaxHamming),
       |sc AS (SELECT q_id, cand_id,
       |              ${cosSql("q_emb", "embedding")} AS cosine
       |       FROM cand),
       |r AS (SELECT q_id, cand_id, cosine,
       |             row_number() OVER (PARTITION BY q_id
       |                                ORDER BY cosine DESC, cand_id) AS rank
       |      FROM sc)
       |SELECT q_id, cand_id, CAST(rank AS BIGINT) AS rank, cosine
       |FROM r WHERE rank <= $TopK""".stripMargin) { (s, d) =>
    val v = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        normN(col("embedding")).as("nrm"),
        lshCode(col("embedding"), Bits, Dim).as("code"))
    val q = v.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("code").as("q_code"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    v.join(broadcast(q),
        col("vec_id") =!= col("q_id")
          && hamming(col("q_code"), col("code")) <= MaxHamming)
      .select(col("q_id"), col("vec_id").as("cand_id"),
        (dotN(col("q_emb"), col("embedding"))
          / (col("q_nrm") * col("nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("cand_id"),
        col("rank").cast("long").as("rank"), col("cosine"))
  }

  val specs: Seq[QuerySpec] = Seq(s1BruteTopK, s2AnnLsh)
}
