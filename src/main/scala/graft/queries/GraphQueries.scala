package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Iterative graph analytics over the relational tables: PageRank on the
  * customer↔supplier co-purchase graph (edges from orders⋈lineitem, one
  * undirected edge per distinct trading pair, represented as two
  * directed edges so no node dangles).
  *
  * Determinism: ranks are fixed-point BIGINTs scaled by 1e12 and every
  * step is integer arithmetic — `pr div outdeg` contributions, exact
  * BIGINT sums, `(85 * inflow) div 100` damping — so Spark and DuckDB
  * agree bit-for-bit (both truncate integer division toward zero for the
  * all-positive values here). No doubles anywhere: float summation order
  * can never perturb the hash.
  *
  * Scale: the Pregel shape — contributions shuffle on dst, the rank
  * frame joins edges on src; both sides hash-partition on the node id so
  * one partitioning is reused across rounds, and rounds are a fixed
  * small constant (3). The edge list, degree-annotated edges and node
  * set are lazily localCheckpoint-ed: they appear once per round in the
  * unrolled plan, and without the lineage cut Catalyst re-derives the
  * orders⋈lineitem distinct (the expensive part) up to 8× — exchange
  * reuse does not fire across the differently-aliased round subtrees.
  * The checkpoint is lazy (materializes inside the measured action, no
  * cross-run cache) and fresh per invocation. At 100 TB with many
  * rounds you'd also checkpoint the rank frame per round exactly as
  * dedup/Dedup.scala's connected components does; at a fixed 3 rounds
  * the rank lineage stays linear and needs no cut.
  *
  * Two deliberate trades of this pattern, both MEASURED in round 9:
  *  - CLEANUP IS GC-DRIVEN: the returned frame references the three
  *    checkpointed RDDs, so they cannot be unpersisted inside this
  *    builder; the ContextCleaner reclaims them once the caller drops
  *    the result — and Bench's per-entry tenancy probe shows it DOES
  *    (persisted-block residue before subsequent entries is ~0 MB in
  *    the full shared sweep). An r9 attempt to make cleanup eager —
  *    `.persist()` intermediates + eagerly checkpointing the final
  *    frame + blocking unpersists — cost pr1 2.7 s → 5.9 s isolated
  *    (InMemoryRelation's columnar encode/decode on every round's
  *    reuse vs localCheckpoint's raw partition blocks) and was
  *    reverted: raw-block checkpoints with GC cleanup are BOTH faster
  *    and residue-free here.
  *  - localCheckpoint uses NON-RELIABLE executor-local storage: a lost
  *    executor makes the truncated lineage unrecoverable, and dynamic
  *    allocation can trigger exactly that — at cluster scale prefer
  *    reliable `checkpoint()` (to the cluster FS) or pin executors, the
  *    caveat Spark's own localCheckpoint scaladoc carries. local[n]
  *    (this harness) has no executor loss, so the cheap variant is
  *    correct here.
  */
object GraphQueries {

  import QuerySpec._

  private val Scale = 1000000000000L // rank fixed-point: 1.0 == 1e12
  private val Teleport = Scale * 15 / 100 // (1-d) * Scale, d = 0.85
  private val SupplierBase = 1000000L // node-id offset for suppliers
  private val Rounds = 3

  /** The co-purchase graph every pr-entry iterates on: distinct
    * customer↔supplier trading pairs as two directed edges, with the
    * degree annotation and lineage cuts pr1's scaladoc motivates. Fresh
    * frames (and fresh lazy checkpoints) per invocation — shared
    * STRUCTURE between pr1/pr2, never shared runtime state.
    */
  private def coPurchaseGraph(s: org.apache.spark.sql.SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val pairs = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"),
        (col("l_suppkey") + SupplierBase).as("sp"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("sp").as("dst"))
      .unionAll(pairs.select(col("sp").as("src"), col("c").as("dst")))
      .localCheckpoint(false) // lazy: cut lineage, compute pairs once
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = deg.select(col("src").as("node"))
      .localCheckpoint(false) // reused by every round's left join + p0
    val nn = nodes.agg(count(lit(1)).as("n")) // 1-row broadcast scalar
    val edgesDeg = edges.join(deg, "src") // (src, dst, outdeg)
      .localCheckpoint(false) // reused by every round's contribution join
    (nodes, nn, edgesDeg)
  }

  val pr1PageRank = withOracle(
    "pr1_pagerank",
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + $SupplierBase AS sp
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT c AS src, sp AS dst FROM pairs
       |          UNION ALL SELECT sp, c FROM pairs),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
       |        FROM edges GROUP BY 1),
       |nodes AS (SELECT src AS node FROM deg),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |p0 AS (SELECT node, $Scale // n AS pr FROM nodes, nn),
       |i1 AS (SELECT e.dst, CAST(sum(p.pr // d.outdeg) AS BIGINT) AS inflow
       |       FROM edges e JOIN deg d ON e.src = d.src
       |            JOIN p0 p ON p.node = e.src
       |       GROUP BY 1),
       |p1 AS (SELECT node, $Teleport // n
       |              + (85 * coalesce(i.inflow, 0)) // 100 AS pr
       |       FROM nodes CROSS JOIN nn LEFT JOIN i1 i ON i.dst = node),
       |i2 AS (SELECT e.dst, CAST(sum(p.pr // d.outdeg) AS BIGINT) AS inflow
       |       FROM edges e JOIN deg d ON e.src = d.src
       |            JOIN p1 p ON p.node = e.src
       |       GROUP BY 1),
       |p2 AS (SELECT node, $Teleport // n
       |              + (85 * coalesce(i.inflow, 0)) // 100 AS pr
       |       FROM nodes CROSS JOIN nn LEFT JOIN i2 i ON i.dst = node),
       |i3 AS (SELECT e.dst, CAST(sum(p.pr // d.outdeg) AS BIGINT) AS inflow
       |       FROM edges e JOIN deg d ON e.src = d.src
       |            JOIN p2 p ON p.node = e.src
       |       GROUP BY 1),
       |p3 AS (SELECT node, $Teleport // n
       |              + (85 * coalesce(i.inflow, 0)) // 100 AS pr
       |       FROM nodes CROSS JOIN nn LEFT JOIN i3 i ON i.dst = node)
       |SELECT node, CAST(pr AS BIGINT) AS pr_scaled FROM p3""".stripMargin) {
    (s, d) =>
      val (nodes, nn, edgesDeg) = coPurchaseGraph(s, d)
      var pr: DataFrame = nodes.crossJoin(nn)
        .select(col("node"), expr(s"$Scale div n").as("pr"))
      for (_ <- 1 to Rounds) {
        val inflow = edgesDeg
          .join(pr.select(col("node").as("p_node"), col("pr")),
            col("src") === col("p_node"))
          .select(col("dst"), expr("pr div outdeg").as("contrib"))
          .groupBy("dst").agg(sum(col("contrib")).as("inflow"))
        pr = nodes
          .join(inflow, col("node") === col("dst"), "left")
          .crossJoin(nn)
          .select(col("node"),
            (expr(s"$Teleport div n")
              + expr("(85 * coalesce(inflow, 0L)) div 100")).as("pr"))
      }
      pr.select(col("node"), col("pr").as("pr_scaled"))
  }

  // ---- pr2: personalized PageRank ----
  /** PPR — the "related to THESE customers" variant: teleport mass
    * concentrates on a seed set (customers with custkey % 10 = 1)
    * instead of spreading uniformly, so rank measures proximity to the
    * seeds. Same fixed-point BIGINT arithmetic, same Pregel shape and
    * lineage-cut discipline as pr1 (shared [[coPurchaseGraph]]); the
    * only algebraic deltas are the seed-indicator start vector
    * (Scale/|S| on seeds, 0 elsewhere) and the teleport term
    * (Teleport/|S| on seeds, 0 elsewhere). Non-seed nodes earn rank
    * ONLY through inflow — the output separates the two populations
    * via is_seed so the oracle checks both. At 100 TB the seed set is
    * the broadcast side of the start-vector join; everything else
    * scales exactly as pr1's scaladoc argues.
    */
  val pr2PersonalizedPageRank = withOracle(
    "pr2_personalized_pagerank",
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + $SupplierBase AS sp
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT c AS src, sp AS dst FROM pairs
       |          UNION ALL SELECT sp, c FROM pairs),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
       |        FROM edges GROUP BY 1),
       |nodes AS (SELECT src AS node,
       |                 src < $SupplierBase AND src % 10 = 1 AS is_seed
       |          FROM deg),
       |ns AS (SELECT CAST(count(*) AS BIGINT) AS k FROM nodes
       |       WHERE is_seed),
       |p0 AS (SELECT node, is_seed,
       |              CASE WHEN is_seed THEN $Scale // k ELSE 0 END AS pr
       |       FROM nodes, ns),
       |i1 AS (SELECT e.dst, CAST(sum(p.pr // d.outdeg) AS BIGINT) AS inflow
       |       FROM edges e JOIN deg d ON e.src = d.src
       |            JOIN p0 p ON p.node = e.src
       |       GROUP BY 1),
       |p1 AS (SELECT node, is_seed,
       |              CASE WHEN is_seed THEN $Teleport // k ELSE 0 END
       |              + (85 * coalesce(i.inflow, 0)) // 100 AS pr
       |       FROM nodes CROSS JOIN ns LEFT JOIN i1 i ON i.dst = node),
       |i2 AS (SELECT e.dst, CAST(sum(p.pr // d.outdeg) AS BIGINT) AS inflow
       |       FROM edges e JOIN deg d ON e.src = d.src
       |            JOIN p1 p ON p.node = e.src
       |       GROUP BY 1),
       |p2 AS (SELECT node, is_seed,
       |              CASE WHEN is_seed THEN $Teleport // k ELSE 0 END
       |              + (85 * coalesce(i.inflow, 0)) // 100 AS pr
       |       FROM nodes CROSS JOIN ns LEFT JOIN i2 i ON i.dst = node),
       |i3 AS (SELECT e.dst, CAST(sum(p.pr // d.outdeg) AS BIGINT) AS inflow
       |       FROM edges e JOIN deg d ON e.src = d.src
       |            JOIN p2 p ON p.node = e.src
       |       GROUP BY 1),
       |p3 AS (SELECT node, is_seed,
       |              CASE WHEN is_seed THEN $Teleport // k ELSE 0 END
       |              + (85 * coalesce(i.inflow, 0)) // 100 AS pr
       |       FROM nodes CROSS JOIN ns LEFT JOIN i3 i ON i.dst = node)
       |SELECT node, is_seed, CAST(pr AS BIGINT) AS ppr_scaled
       |FROM p3""".stripMargin) { (s, d) =>
    val (nodes0, _, edgesDeg) = coPurchaseGraph(s, d)
    val nodes = nodes0.select(col("node"),
      (col("node") < SupplierBase && col("node") % 10 === 1).as("is_seed"))
    val ns = nodes.filter(col("is_seed")).agg(count(lit(1)).as("k"))
    var pr: DataFrame = nodes.crossJoin(ns)
      .select(col("node"), col("is_seed"),
        when(col("is_seed"), expr(s"$Scale div k")).otherwise(lit(0L))
          .as("pr"))
    for (_ <- 1 to Rounds) {
      val inflow = edgesDeg
        .join(pr.select(col("node").as("p_node"), col("pr")),
          col("src") === col("p_node"))
        .select(col("dst"), expr("pr div outdeg").as("contrib"))
        .groupBy("dst").agg(sum(col("contrib")).as("inflow"))
      pr = nodes
        .join(inflow, col("node") === col("dst"), "left")
        .crossJoin(ns)
        .select(col("node"), col("is_seed"),
          (when(col("is_seed"), expr(s"$Teleport div k")).otherwise(lit(0L))
            + expr("(85 * coalesce(inflow, 0L)) div 100")).as("pr"))
    }
    pr.select(col("node"), col("is_seed"), col("pr").as("ppr_scaled"))
  }

  val specs: Seq[QuerySpec] = Seq(pr1PageRank, pr2PersonalizedPageRank)
}
