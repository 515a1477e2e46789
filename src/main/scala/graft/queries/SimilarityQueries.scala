package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables
import graft.similarity.VectorFunctions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * s1 is the exact brute-force baseline (broadcast the query set, score
  * every candidate, per-query top-k). s2 is the scale path: 16-bit
  * sign-random-projection LSH codes computed once per vector, probed by
  * an EQUI-join — each query expands to the 2517 codes of its Hamming-4
  * ball (multi-probe) and candidates are hash-bucket hits only, so no
  * plan ever compares every vector against every query. The code is a
  * pure function of the vector, so at ingest it can be the bucket/
  * partition key and the probe becomes shuffle-free.
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

  /** Every 16-bit mask with at most MaxHamming bits set (2517 of them):
    * XORing the query code with each mask enumerates EXACTLY the codes
    * within Hamming distance MaxHamming — the multi-probe key set.
    */
  private val ProbeMasks: Seq[Int] =
    (0 until (1 << Bits)).filter(m => Integer.bitCount(m) <= MaxHamming)

  // ---- s2: LSH code-bucketed ANN (multi-probe equi-join, exact re-rank) ----
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
    // Multi-probe: each query expands to its 2517 Hamming-ball codes and
    // the candidate join is a pure EQUI-join on the code — a broadcast
    // hash join here, a shuffle/bucket join when the query set is large
    // (`code` is computed at ingest, so vectors can be stored bucketed by
    // it and probed shuffle-free). No vector is compared against every
    // query: only hash-bucket hits reach the cosine. The probed set is
    // EXACTLY {hamming(q_code, code) <= MaxHamming} — semantics (and the
    // oracle) identical to the prefilter formulation, and each candidate
    // is hit by exactly one mask, so no dedup pass is needed.
    val probes = Tables.embeddings(s, d)
      .filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"),
        normN(col("embedding")).as("q_nrm"),
        lshCode(col("embedding"), Bits, Dim).as("q_code"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        explode(typedLit(ProbeMasks)).as("mask"),
        col("q_code"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        col("q_code").bitwiseXOR(col("mask")).as("probe_code"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    v.join(broadcast(probes),
        col("code") === col("probe_code") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        (dotN(col("q_emb"), col("embedding"))
          / (col("q_nrm") * col("nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("cand_id"),
        col("rank").cast("long").as("rank"), col("cosine"))
  }

  private val IvfK = 16
  private val IvfCentroidBase = 100
  private val IvfNProbe = 4

  // ---- s3: IVF (inverted-file) ANN — cell-partitioned probe, exact re-rank ----
  /** The third ANN shape from the survey's scale menu (s1 brute force,
    * s2 LSH buckets, s3 IVF): a 16-vector coarse quantizer (deterministic
    * codebook = embeddings 100..115) assigns every vector to its argmax-
    * cosine cell as a PURE PER-ROW EXPRESSION over literal centroids (no
    * join, no shuffle — see [[VectorFunctions.ivfCell]]); each query
    * probes its `IvfNProbe` nearest cells through a broadcast equi-join
    * on the cell id and candidates are exactly re-ranked. At 100 TB the
    * table is partitioned by cell at ingest, so a probe reads only
    * nprobe/K of the data — the IVF contract. The oracle mirrors the
    * quantizer and probe exactly (same fold arithmetic, same rank-1 and
    * rank<=nprobe tie-breaks), so the result — including any recall the
    * coarse quantizer trades away — is bit-reproducible, the same
    * mirrored-semantics contract as s2.
    */
  val s3AnnIvf = withOracle(
    "s3_ann_ivf",
    s"""WITH c AS (SELECT CAST(vec_id - $IvfCentroidBase AS INT) AS j,
       |                  embedding AS c_emb
       |           FROM embeddings
       |           WHERE vec_id BETWEEN $IvfCentroidBase
       |                 AND ${IvfCentroidBase + IvfK - 1}),
       |v AS (SELECT vec_id, embedding FROM embeddings),
       |asg0 AS (SELECT v.vec_id, c.j,
       |                ${cosSql("c.c_emb", "v.embedding")} AS cs
       |         FROM v, c),
       |cells AS (SELECT vec_id, j AS cell FROM
       |          (SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id
       |                      ORDER BY cs DESC, j) AS rn FROM asg0)
       |          WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
       |      WHERE vec_id < $NumQueries),
       |qs AS (SELECT q.q_id, c.j, ${cosSql("c.c_emb", "q.q_emb")} AS cs
       |       FROM q, c),
       |probe AS (SELECT q_id, j AS cell FROM
       |          (SELECT q_id, j, row_number() OVER (PARTITION BY q_id
       |                      ORDER BY cs DESC, j) AS rn FROM qs)
       |          WHERE rn <= $IvfNProbe),
       |cand AS (SELECT p.q_id, ce.vec_id AS cand_id
       |         FROM probe p JOIN cells ce ON p.cell = ce.cell
       |         WHERE ce.vec_id <> p.q_id),
       |sc AS (SELECT cand.q_id, cand.cand_id,
       |              ${cosSql("q.q_emb", "v.embedding")} AS cosine
       |       FROM cand JOIN q ON q.q_id = cand.q_id
       |                 JOIN v ON v.vec_id = cand.cand_id),
       |r AS (SELECT q_id, cand_id, cosine,
       |             row_number() OVER (PARTITION BY q_id
       |                 ORDER BY cosine DESC, cand_id) AS rank FROM sc)
       |SELECT q_id, cand_id, CAST(rank AS BIGINT) AS rank, cosine
       |FROM r WHERE rank <= $TopK""".stripMargin) { (s, d) =>
    ivfSearch(embBase(s, d), seedCodebook(s, d))
  }

  /** (vec_id, embedding, nrm) over the embeddings table. */
  private def embBase(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        normN(col("embedding")).as("nrm"))

  /** Codebook load: 16 rows collected once at plan build — the coarse
    * quantizer is broadcast-sized by construction (not a driver loop
    * over data). Float components widen to double exactly.
    */
  private def seedCodebook(s: org.apache.spark.sql.SparkSession,
      d: String): Seq[Seq[Double]] =
    Tables.embeddings(s, d)
      .filter(col("vec_id")
        .between(IvfCentroidBase, IvfCentroidBase + IvfK - 1))
      .orderBy(col("vec_id")).select(col("embedding"))
      .collect().toSeq.map(_.getSeq[Float](0).map(_.toDouble))

  /** Assign cells from a literal codebook, probe each query's nearest
    * `IvfNProbe` cells through a broadcast equi-join, re-rank exactly.
    */
  private def ivfSearch(base: org.apache.spark.sql.DataFrame,
      codebook: Seq[Seq[Double]]): org.apache.spark.sql.DataFrame = {
    val assigned = base.withColumn("cell",
      ivfCell(codebook, col("embedding"), col("nrm")))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("cell"))
    val probes = assigned.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"),
        posexplode(array(codebook.map(c =>
          centroidCosine(c, col("embedding"), col("nrm"))): _*)))
      .toDF("q_id", "q_emb", "q_nrm", "cell", "cos")
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= IvfNProbe)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("cell"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    assigned.join(broadcast(probes),
        assigned("cell") === probes("cell") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        (dotN(col("q_emb"), col("embedding"))
          / (col("q_nrm") * col("nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("cand_id"),
        col("rank").cast("long").as("rank"), col("cosine"))
  }

  // ---- s6: TRAINED IVF — one quantized Lloyd iteration ----
  /** Composes the IVF machinery with the centroid UDAF: seed-codebook
    * assignment (as s3), then one k-means (Lloyd) refinement — each
    * cell's new centroid is the QUANTIZED component mean from
    * [[graft.similarity.CentroidAggregator]] (order-independent integer
    * sums, so the trained codebook is deterministic and the oracle
    * recomputes it bit-for-bit; cosine is scale-invariant, so the
    * x1000 quantization scale needs no undo) — then reassignment and
    * probing against the trained codebook. The training step is one
    * partial/final aggregate producing 16 rows; everything else stays
    * the per-row-expression + broadcast-probe plan of s3. This is the
    * real IVF build loop in miniature: more Lloyd rounds are the same
    * aggregate repeated.
    */
  val s6AnnIvfTrained = withOracle(
    "s6_ann_ivf_trained",
    s"""WITH c AS (SELECT CAST(vec_id - $IvfCentroidBase AS INT) AS j,
       |                  embedding AS c_emb
       |           FROM embeddings
       |           WHERE vec_id BETWEEN $IvfCentroidBase
       |                 AND ${IvfCentroidBase + IvfK - 1}),
       |v AS (SELECT vec_id, embedding FROM embeddings),
       |asg0 AS (SELECT v.vec_id, c.j,
       |                ${cosSql("c.c_emb", "v.embedding")} AS cs
       |         FROM v, c),
       |cells0 AS (SELECT vec_id, j AS cell FROM
       |           (SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id
       |                       ORDER BY cs DESC, j) AS rn FROM asg0)
       |           WHERE rn = 1),
       |comp AS (SELECT ce.cell, unnest(v.embedding) AS x,
       |                unnest(range(1, length(v.embedding) + 1)) AS dim
       |         FROM v JOIN cells0 ce USING (vec_id)),
       |cm AS (SELECT cell, dim,
       |              CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))
       |                   AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m
       |       FROM comp GROUP BY cell, dim),
       |trained AS (SELECT cell, list(m ORDER BY dim) AS t_emb
       |            FROM cm GROUP BY cell),
       |asg1 AS (SELECT v.vec_id, t.cell,
       |                ${cosSql("t.t_emb", "v.embedding")} AS cs
       |         FROM v, trained t),
       |cells1 AS (SELECT vec_id, cell FROM
       |           (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
       |                       ORDER BY cs DESC, cell) AS rn FROM asg1)
       |           WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
       |      WHERE vec_id < $NumQueries),
       |qs AS (SELECT q.q_id, t.cell, ${cosSql("t.t_emb", "q.q_emb")} AS cs
       |       FROM q, trained t),
       |probe AS (SELECT q_id, cell FROM
       |          (SELECT q_id, cell, row_number() OVER (PARTITION BY q_id
       |                      ORDER BY cs DESC, cell) AS rn FROM qs)
       |          WHERE rn <= $IvfNProbe),
       |cand AS (SELECT p.q_id, ce.vec_id AS cand_id
       |         FROM probe p JOIN cells1 ce ON p.cell = ce.cell
       |         WHERE ce.vec_id <> p.q_id),
       |sc AS (SELECT cand.q_id, cand.cand_id,
       |              ${cosSql("q.q_emb", "v.embedding")} AS cosine
       |       FROM cand JOIN q ON q.q_id = cand.q_id
       |                 JOIN v ON v.vec_id = cand.cand_id),
       |r AS (SELECT q_id, cand_id, cosine,
       |             row_number() OVER (PARTITION BY q_id
       |                 ORDER BY cosine DESC, cand_id) AS rank FROM sc)
       |SELECT q_id, cand_id, CAST(rank AS BIGINT) AS rank, cosine
       |FROM r WHERE rank <= $TopK""".stripMargin) { (s, d) =>
    val base = embBase(s, d)
    val seeded = base.withColumn("cell",
      ivfCell(seedCodebook(s, d), col("embedding"), col("nrm")))
    val centroidU = udaf(graft.similarity.CentroidAggregator,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    val trainedRows = seeded.groupBy(col("cell"))
      .agg(centroidU(col("embedding")).as("c"))
      .orderBy(col("cell")).collect()
    require(trainedRows.length == IvfK &&
      trainedRows.zipWithIndex.forall { case (r, i) => r.getInt(0) == i },
      "Lloyd iteration emptied a cell — codebook/cell ids out of line")
    val trained: Seq[Seq[Double]] =
      trainedRows.toSeq.map(_.getSeq[Double](1))
    ivfSearch(base, trained)
  }

  // ---- v1: typed UDAF — quantized per-group embedding centroid ----
  /** The custom-aggregate surface (SURVEY §2.9/§7): a Spark
    * `Aggregator` registered via `functions.udaf`, running as a real
    * partial/final aggregate. Components are quantized to Longs before
    * summation (floor(x*1000)) so the aggregation is order-independent
    * and the DuckDB oracle — an unnest-zip per-dimension integer sum —
    * hash-matches exactly; see [[graft.similarity.CentroidAggregator]].
    */
  val v1CentroidAgg = withOracle(
    "v1_centroid_agg",
    """WITH e AS (SELECT vec_id % 8 AS grp,
      |                  unnest(embedding) AS x,
      |                  unnest(range(1, length(embedding) + 1)) AS dim
      |           FROM embeddings)
      |SELECT CAST(grp AS BIGINT) AS grp,
      |       CAST(dim - 1 AS BIGINT) AS dim,
      |       CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS DOUBLE)
      |         / CAST(count(*) AS DOUBLE) AS centroid
      |FROM e GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val centroid = udaf(graft.similarity.CentroidAggregator,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    Tables.embeddings(s, d)
      .groupBy((col("vec_id") % 8).as("grp"))
      .agg(centroid(col("embedding")).as("c"))
      .select(col("grp"), posexplode(col("c")))
      .toDF("grp", "dim", "centroid")
      .select(col("grp"), col("dim").cast("long").as("dim"), col("centroid"))
  }

  val specs: Seq[QuerySpec] =
    Seq(s1BruteTopK, s2AnnLsh, s3AnnIvf, s6AnnIvfTrained, v1CentroidAgg)
}
