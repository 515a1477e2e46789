package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Sketch-based approximate aggregation — the distinct-count scale path.
  *
  * At 100 TB an exact `count(DISTINCT key)` shuffles every distinct key;
  * a HyperLogLog sketch shuffles a FIXED m-register state per group
  * (here m = 64 registers, i.e. bytes, per group) and is mergeable:
  * register-wise max is associative/commutative, so Spark's partial
  * aggregation combines sketches map-side and the reduce side merges
  * 32 partial sketches per group instead of re-seeing every key —
  * the same two-level shape `approx_count_distinct` uses internally.
  *
  * Spark ships HLL++ (`approx_count_distinct`), but its registers hash
  * with xxhash64 seeds DuckDB does not expose, so its estimates cannot
  * be oracle-checked. This query builds the HLL estimator from scratch
  * with engine-portable arithmetic instead, and the driver hash-matches
  * every intermediate against DuckDB running the identical algorithm:
  *
  *  - hash: two Wang-style multiply + xor-shift rounds mod 2^31 (an
  *    affine-ONLY hash, e.g. one LCG round, maps the near-sequential
  *    custkeys to an arithmetic progression whose leading-zero ranks
  *    are badly biased — measured 2x overestimate; the xor-shift
  *    rounds break affinity and bring the estimate within the
  *    1.04/sqrt(64) ~ 13% theoretical error),
  *  - register index: low 6 hash bits; rank: leading zeros of the
  *    remaining 25-bit suffix + 1, computed as 26 - length(bin(x))
  *    (`bin` exists in both engines and never emits leading zeros —
  *    no log2/floating point anywhere near the integer path),
  *  - estimate: the raw HLL harmonic mean alpha_m * m^2 / sum(2^-Mj),
  *    with empty registers contributing 2^0 = 1. Every float step is
  *    IEEE-exact (powers of two, division) so the DOUBLE output
  *    hash-matches bit-for-bit; no transcendental corrections.
  */
object SketchQueries {

  import QuerySpec._

  private val M = 64 // registers per group (6 index bits, 25 rank bits)

  val hll1ApproxDistinct = withOracle(
    "hll1_approx_distinct",
    """WITH h0 AS (
      |  SELECT o_orderpriority,
      |         (o_custkey * 2654435761) % 2147483648 AS h1
      |  FROM orders),
      |hx AS (
      |  SELECT o_orderpriority,
      |         (xor(h1, h1 // 32768) * 1597334677) % 2147483648 AS h3
      |  FROM h0),
      |h AS (SELECT o_orderpriority, xor(h3, h3 // 8192) AS hv FROM hx),
      |regs AS (
      |  SELECT o_orderpriority, hv % 64 AS reg,
      |         max(CASE WHEN hv // 64 = 0 THEN 26
      |                  ELSE 26 - length(bin(hv // 64)) END) AS mx
      |  FROM h GROUP BY 1, 2),
      |sk AS (
      |  SELECT o_orderpriority,
      |         sum(power(CAST(2.0 AS DOUBLE), -mx)) AS s,
      |         count(*) AS nb
      |  FROM regs GROUP BY 1),
      |ex AS (
      |  SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_exact
      |  FROM orders GROUP BY 1)
      |SELECT sk.o_orderpriority,
      |       CAST((0.7213 / (1.0 + 1.079 / 64.0)) * 64.0 * 64.0
      |            / (s + (64 - nb) * 1.0) AS DOUBLE) AS hll_est,
      |       CAST(n_exact AS BIGINT) AS n_exact
      |FROM sk JOIN ex USING (o_orderpriority)""".stripMargin) { (s, d) =>
    val orders = Tables.orders(s, d)
    val h1 = (col("o_custkey") * lit(2654435761L)) % lit(2147483648L)
    val h3 = (h1.bitwiseXOR(shiftright(h1, 15)) * lit(1597334677L)) %
      lit(2147483648L)
    val hv = h3.bitwiseXOR(shiftright(h3, 13))
    val suffix = shiftright(col("hv"), 6) // hv div 64, nonneg
    val regs = orders
      .select(col("o_orderpriority"), hv.as("hv"))
      .groupBy(col("o_orderpriority"), (col("hv") % M).as("reg"))
      .agg(max(when(suffix === 0, 26)
        .otherwise(lit(26) - length(bin(suffix)))).as("mx"))
    val sketch = regs.groupBy(col("o_orderpriority"))
      .agg(sum(pow(lit(2.0), -col("mx"))).as("s"),
        count(lit(1)).as("nb"))
      .select(col("o_orderpriority"),
        (lit(0.7213 / (1.0 + 1.079 / M)) * M * M /
          (col("s") + (lit(M) - col("nb")) * 1.0)).as("hll_est"))
    val exact = orders.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_exact"))
    sketch.join(exact, "o_orderpriority")
      .select(col("o_orderpriority"), col("hll_est"), col("n_exact"))
  }

  /** hll2 — sketch MERGEABILITY at the query level, the property that
    * makes sketches the 100 TB path: the corpus splits into two
    * partitions (orderkey parity), each builds its OWN register table
    * independently, and the union is the register-wise MAX — no
    * re-scan, no exact state. The query emits the merged estimate next
    * to the single-pass estimate (hll1's construction) and the exact
    * count; merged == single-pass is the algebraic invariant (max is
    * associative/commutative), visible in the output and checked by the
    * oracle's identical replication. At scale this is per-day /
    * per-partition sketch rollup: store M registers per group per
    * partition, answer any union with a max-merge.
    */
  val hll2SketchUnion = withOracle(
    "hll2_sketch_union",
    """WITH h0 AS (
      |  SELECT o_orderpriority, o_orderkey,
      |         (o_custkey * 2654435761) % 2147483648 AS h1
      |  FROM orders),
      |hx AS (
      |  SELECT o_orderpriority, o_orderkey,
      |         (xor(h1, h1 // 32768) * 1597334677) % 2147483648 AS h3
      |  FROM h0),
      |h AS (SELECT o_orderpriority, o_orderkey, xor(h3, h3 // 8192) AS hv
      |      FROM hx),
      |rA AS (
      |  SELECT o_orderpriority, hv % 64 AS reg,
      |         max(CASE WHEN hv // 64 = 0 THEN 26
      |                  ELSE 26 - length(bin(hv // 64)) END) AS mx
      |  FROM h WHERE o_orderkey % 2 = 0 GROUP BY 1, 2),
      |rB AS (
      |  SELECT o_orderpriority, hv % 64 AS reg,
      |         max(CASE WHEN hv // 64 = 0 THEN 26
      |                  ELSE 26 - length(bin(hv // 64)) END) AS mx
      |  FROM h WHERE o_orderkey % 2 <> 0 GROUP BY 1, 2),
      |merged AS (
      |  SELECT o_orderpriority, reg, max(mx) AS mx
      |  FROM (SELECT * FROM rA UNION ALL SELECT * FROM rB)
      |  GROUP BY 1, 2),
      |single AS (
      |  SELECT o_orderpriority, hv % 64 AS reg,
      |         max(CASE WHEN hv // 64 = 0 THEN 26
      |                  ELSE 26 - length(bin(hv // 64)) END) AS mx
      |  FROM h GROUP BY 1, 2),
      |em AS (
      |  SELECT o_orderpriority,
      |         CAST((0.7213 / (1.0 + 1.079 / 64.0)) * 64.0 * 64.0
      |              / (sum(power(CAST(2.0 AS DOUBLE), -mx))
      |                 + (64 - count(*)) * 1.0) AS DOUBLE) AS est_merged
      |  FROM merged GROUP BY 1),
      |es AS (
      |  SELECT o_orderpriority,
      |         CAST((0.7213 / (1.0 + 1.079 / 64.0)) * 64.0 * 64.0
      |              / (sum(power(CAST(2.0 AS DOUBLE), -mx))
      |                 + (64 - count(*)) * 1.0) AS DOUBLE) AS est_single
      |  FROM single GROUP BY 1),
      |ex AS (
      |  SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_exact
      |  FROM orders GROUP BY 1)
      |SELECT em.o_orderpriority, em.est_merged, es.est_single,
      |       em.est_merged = es.est_single AS merge_lossless,
      |       CAST(ex.n_exact AS BIGINT) AS n_exact
      |FROM em JOIN es USING (o_orderpriority)
      |        JOIN ex USING (o_orderpriority)""".stripMargin) { (s, d) =>
    val orders = Tables.orders(s, d)
    val h1 = (col("o_custkey") * lit(2654435761L)) % lit(2147483648L)
    val h3 = (h1.bitwiseXOR(shiftright(h1, 15)) * lit(1597334677L)) %
      lit(2147483648L)
    val hv = h3.bitwiseXOR(shiftright(h3, 13))
    val hashed = orders.select(col("o_orderpriority"), col("o_orderkey"),
      hv.as("hv"))
    val suffix = shiftright(col("hv"), 6)
    def regsOf(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("o_orderpriority"), (col("hv") % M).as("reg"))
      .agg(max(when(suffix === 0, 26)
        .otherwise(lit(26) - length(bin(suffix)))).as("mx"))
    def estimate(regs: org.apache.spark.sql.DataFrame, out: String) = regs
      .groupBy(col("o_orderpriority"))
      .agg(sum(pow(lit(2.0), -col("mx"))).as("s"), count(lit(1)).as("nb"))
      .select(col("o_orderpriority"),
        (lit(0.7213 / (1.0 + 1.079 / M)) * M * M /
          (col("s") + (lit(M) - col("nb")) * 1.0)).as(out))
    val rA = regsOf(hashed.filter(col("o_orderkey") % 2 === 0))
    val rB = regsOf(hashed.filter(col("o_orderkey") % 2 =!= 0))
    val merged = rA.unionAll(rB)
      .groupBy(col("o_orderpriority"), col("reg"))
      .agg(max(col("mx")).as("mx"))
    val em = estimate(merged, "est_merged")
    val es = estimate(regsOf(hashed), "est_single")
    val exact = orders.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_exact"))
    em.join(es, "o_orderpriority").join(exact, "o_orderpriority")
      .select(col("o_orderpriority"), col("est_merged"), col("est_single"),
        (col("est_merged") === col("est_single")).as("merge_lossless"),
        col("n_exact"))
  }

  /** hll3 — KMV (bottom-k / theta) sketch with SET OPERATIONS, the
    * distinct-count question HLL cannot answer: |A∩B| between two
    * customer populations without an exact-distinct shuffle of either.
    * The engine side aggregates through [[graft.functions.KmvAggregator]]
    * — a typed UDAF whose fixed k-long sorted-set state dedupes on
    * insert, partial-aggregates map-side, and merges by sorted union —
    * so NO count-distinct shuffle exists in the plan at any scale; the
    * shuffle payload is k longs per group, period. Estimates: with
    * fewer than k distinct hashes the sketch IS the exact set (estimate
    * = its size); otherwise D-hat = (k-1) * 2^31 / kth-smallest.
    * Union rides a second kmv over the filtered base (algebraically the
    * sketch-merge, which the aggregator's own merge path exercises
    * map-side); intersection is inclusion-exclusion over the three
    * estimates. The exact counts ride alongside as the error witness,
    * like hll1/hll2. Hash is the shared Wang-style portable hash, so
    * the DuckDB oracle (ORDER BY hv LIMIT k over distinct hashes)
    * reproduces every estimate bit-for-bit.
    */
  private val K = 32
  val hll3KmvTheta = withOracle(
    "hll3_kmv_theta", {
      def est(kth: String, n: String): String =
        s"""CASE WHEN $n < $K THEN CAST($n AS DOUBLE)
           |     ELSE ${K - 1}.0 * 2147483648.0 / CAST($kth AS DOUBLE) END"""
          .stripMargin
      s"""WITH h0 AS (
         |  SELECT o_orderstatus AS st, o_custkey,
         |         (o_custkey * 2654435761) % 2147483648 AS h1
         |  FROM orders WHERE o_orderstatus IN ('O', 'F')),
         |hx AS (SELECT st, o_custkey,
         |              (xor(h1, h1 // 32768) * 1597334677) % 2147483648 AS h3
         |       FROM h0),
         |h AS (SELECT DISTINCT st, xor(h3, h3 // 8192) AS hv FROM hx),
         |ka AS (SELECT count(*) AS n, max(hv) AS kth FROM
         |         (SELECT hv FROM h WHERE st = 'O' ORDER BY hv LIMIT $K)),
         |kb AS (SELECT count(*) AS n, max(hv) AS kth FROM
         |         (SELECT hv FROM h WHERE st = 'F' ORDER BY hv LIMIT $K)),
         |ku AS (SELECT count(*) AS n, max(hv) AS kth FROM
         |         (SELECT DISTINCT hv FROM h ORDER BY hv LIMIT $K)),
         |ex AS (
         |  SELECT count(DISTINCT CASE WHEN st = 'O' THEN o_custkey END)
         |           AS exact_a,
         |         count(DISTINCT CASE WHEN st = 'F' THEN o_custkey END)
         |           AS exact_b,
         |         count(DISTINCT o_custkey) AS exact_union
         |  FROM hx)
         |SELECT CAST($K AS BIGINT) AS k,
         |       ${est("ka.kth", "ka.n")} AS est_a,
         |       ${est("kb.kth", "kb.n")} AS est_b,
         |       ${est("ku.kth", "ku.n")} AS est_union,
         |       ${est("ka.kth", "ka.n")} + ${est("kb.kth", "kb.n")}
         |         - ${est("ku.kth", "ku.n")} AS est_inter,
         |       CAST(ex.exact_a AS BIGINT) AS exact_a,
         |       CAST(ex.exact_b AS BIGINT) AS exact_b,
         |       CAST(ex.exact_union AS BIGINT) AS exact_union,
         |       CAST(ex.exact_a + ex.exact_b - ex.exact_union AS BIGINT)
         |         AS exact_inter
         |FROM ka, kb, ku, ex""".stripMargin
    }) { (s, d) =>
    val kmv = udaf(new graft.functions.KmvAggregator(K))
    val h1 = (col("o_custkey") * lit(2654435761L)) % lit(2147483648L)
    val h3 = (h1.bitwiseXOR(shiftright(h1, 15)) * lit(1597334677L)) %
      lit(2147483648L)
    val hv = h3.bitwiseXOR(shiftright(h3, 13))
    val base = Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("O", "F"))
      .select(col("o_orderstatus").as("st"), col("o_custkey"), hv.as("hv"))
    def estOf(mins: org.apache.spark.sql.Column) = {
      val n = size(mins)
      when(n < K, n.cast("double"))
        .otherwise(lit((K - 1).toDouble * 2147483648.0)
          / element_at(mins, K).cast("double"))
    }
    val a = base.filter(col("st") === "O").agg(kmv(col("hv")).as("mins"))
      .select(estOf(col("mins")).as("est_a"))
    val b = base.filter(col("st") === "F").agg(kmv(col("hv")).as("mins"))
      .select(estOf(col("mins")).as("est_b"))
    val u = base.agg(kmv(col("hv")).as("mins"))
      .select(estOf(col("mins")).as("est_union"))
    val ex = base.agg(
      countDistinct(when(col("st") === "O", col("o_custkey"))).as("exact_a"),
      countDistinct(when(col("st") === "F", col("o_custkey"))).as("exact_b"),
      countDistinct(col("o_custkey")).as("exact_union"))
    a.crossJoin(b).crossJoin(u).crossJoin(ex)
      .select(lit(K.toLong).as("k"),
        col("est_a"), col("est_b"), col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_inter"),
        col("exact_a"), col("exact_b"), col("exact_union"),
        (col("exact_a") + col("exact_b") - col("exact_union"))
          .as("exact_inter"))
  }

  val specs: Seq[QuerySpec] =
    Seq(hll1ApproxDistinct, hll2SketchUnion, hll3KmvTheta)
}
