package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.keys._
import graft.gold.DateDim

/** Gold-layer star-schema queries over the testdata tables, mirroring the
  * reference's `scripts/gold/` materialized views (dims + fact with
  * surrogate keys, CTE aggregates, expression date joins).
  */
object Star {

  import QuerySpec._

  // ---- W2/W3 replacement: generated date dimension ----
  // Reference: scripts/gold/dim_date.sql (see DateDim scaladoc for the
  // partition-safe rewrite of its ROW_NUMBER hacks).
  val w2DateDim = withOracle(
    "w2_date_dim",
    """WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS d0,
      |                  least(date_diff('day', min(CAST(o_orderdate AS DATE)), max(CAST(o_orderdate AS DATE))), 999) AS n
      |           FROM orders),
      |g AS (SELECT d0, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d0 AS TIMESTAMP) + CAST(n || ' days' AS INTERVAL), INTERVAL 1 DAY)) AS DATE) AS date_actual
      |      FROM b)
      |SELECT CAST(date_actual AS VARCHAR) AS date_actual,
      |       CAST(date_diff('day', d0, date_actual) AS BIGINT) AS date_key,
      |       CAST(year(date_actual) AS BIGINT) AS yr,
      |       CAST(quarter(date_actual) AS BIGINT) AS qtr,
      |       CAST(month(date_actual) AS BIGINT) AS mth,
      |       CAST(dayofmonth(date_actual) AS BIGINT) AS dom,
      |       CAST(dayofweek(date_actual) + 1 AS BIGINT) AS dow,
      |       CAST(weekofyear(date_actual) AS BIGINT) AS woy,
      |       dayname(date_actual) AS day_name,
      |       monthname(date_actual) AS month_name,
      |       dayofweek(date_actual) IN (0, 6) AS is_weekend
      |FROM g""".stripMargin) { (s, d) =>
    DateDim.build(Tables.orders(s, d), col("o_orderdate"))
      .withColumn("date_actual", col("date_actual").cast("string"))
  }

  // ---- Flagship: fact build (J3-J9, A1-A2, sha2 surrogate keys) ----
  // Reference: scripts/gold/fact_order_items.sql — the full shape:
  //   * two pre-aggregated CTEs left-joined by natural key (J8/J9);
  //   * inner joins to the base entities (J3/J4);
  //   * broadcast joins to surrogate-key dims (J5);
  //   * INNER expression join on DATE(purchase) to dim_date (J6) — rows
  //     beyond the 999-day cap drop, as in the reference;
  //   * LEFT expression join on DATE(ship) (J7) — null-tolerant;
  //   * sha2-256 fact/dim surrogate keys (stable across refreshes);
  //   * derived measures with coalesce arithmetic.
  // Scale: dims (part/supplier/customer at this ratio, date) broadcast;
  // lineitem-side joins on l_orderkey share one hash-partitioning; the two
  // CTEs aggregate map-side-partial before their shuffles. AQE handles
  // skewed orderkeys.
  val j3FactStar = withOracle(
    "j3_fact_star",
    """WITH dd AS (
      |  SELECT CAST(date_actual AS DATE) AS date_actual,
      |         date_diff('day', d0, date_actual) AS date_key
      |  FROM (SELECT d0, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d0 AS TIMESTAMP) + CAST(n || ' days' AS INTERVAL), INTERVAL 1 DAY)) AS DATE) AS date_actual
      |        FROM (SELECT min(CAST(o_orderdate AS DATE)) AS d0,
      |                     least(date_diff('day', min(CAST(o_orderdate AS DATE)), max(CAST(o_orderdate AS DATE))), 999) AS n
      |              FROM orders))),
      |order_totals AS (
      |  SELECT l_orderkey AS ot_orderkey,
      |         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS order_revenue,
      |         CAST(count(*) AS BIGINT) AS n_lines
      |  FROM lineitem GROUP BY 1),
      |order_flags AS (
      |  SELECT l_orderkey AS fl_orderkey,
      |         string_agg(DISTINCT l_returnflag, ', ' ORDER BY l_returnflag) AS return_flags,
      |         CAST(max(CAST(l_shipdate AS DATE)) AS VARCHAR) AS last_ship_date
      |  FROM lineitem GROUP BY 1)
      |SELECT sha256(concat_ws('|', CAST(l.l_orderkey AS VARCHAR), CAST(l.l_linenumber AS VARCHAR))) AS fact_key,
      |       l.l_orderkey,
      |       CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
      |       sha256(concat_ws('|', 'customer', CAST(c.c_custkey AS VARCHAR))) AS customer_key,
      |       sha256(concat_ws('|', 'part', CAST(p.p_partkey AS VARCHAR))) AS part_key,
      |       sha256(concat_ws('|', 'supplier', CAST(sp.s_suppkey AS VARCHAR))) AS supplier_key,
      |       CAST(dp.date_key AS BIGINT) AS order_date_key,
      |       CAST(ds.date_key AS BIGINT) AS ship_date_key,
      |       CAST(CAST(l.l_extendedprice * (1 - l.l_discount) * (1 + l.l_tax) AS DECIMAL(18,6)) AS DOUBLE) AS item_total,
      |       ot.order_revenue,
      |       ot.n_lines,
      |       fl.return_flags,
      |       fl.last_ship_date,
      |       o.o_totalprice > 200000 AS is_high_value
      |FROM lineitem l
      |JOIN orders o    ON l.l_orderkey = o.o_orderkey
      |JOIN customer c  ON o.o_custkey = c.c_custkey
      |JOIN part p      ON l.l_partkey = p.p_partkey
      |JOIN supplier sp ON l.l_suppkey = sp.s_suppkey
      |JOIN dd dp       ON CAST(o.o_orderdate AS DATE) = dp.date_actual
      |LEFT JOIN dd ds  ON CAST(l.l_shipdate AS DATE) = ds.date_actual
      |LEFT JOIN order_totals ot ON l.l_orderkey = ot.ot_orderkey
      |LEFT JOIN order_flags fl  ON l.l_orderkey = fl.fl_orderkey""".stripMargin) {
    (s, d) =>
      // widen: the fact assembly chains broadcast joins and six sha2
      // surrogate keys directly over the lineitem scan's unsplittable
      // 3 splits (measured 1.75 s single stage), and both CTE partial
      // aggregates sit on the same scan — per-row CPU the byte-based
      // split rule cannot see; no-op at scale (Parallelism scaladoc).
      val li = graft.core.Parallelism.widen(Tables.lineitem(s, d))
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val p = Tables.part(s, d)
      val sp = Tables.supplier(s, d)
      val dd = DateDim.build(o, col("o_orderdate"))
        .select(col("date_actual"), col("date_key"))

      val orderTotals = li.groupBy(col("l_orderkey").as("ot_orderkey"))
        .agg(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)")).cast("double").as("order_revenue"),
          count(lit(1)).as("n_lines"))
      val orderFlags = li.groupBy(col("l_orderkey").as("fl_orderkey"))
        .agg(
          array_join(sort_array(collect_set(col("l_returnflag"))), ", ")
            .as("return_flags"),
          max(col("l_shipdate").cast("date")).cast("string")
            .as("last_ship_date"))

      val dp = dd.as("dp")
      val ds = dd.as("ds")

      // Join order is partition-aware (same rationale as the Olist fact,
      // olist/Olist.scala:530-543): ALL l_orderkey-keyed joins (orders,
      // order_totals, order_flags) run contiguously so the fact side
      // shuffles on l_orderkey ONCE; only then does it re-exchange to
      // o_custkey for the customer join; bounded dims broadcast last.
      // The old o → c → ...broadcasts... → ot → fl order interleaved the
      // keys (orderkey → custkey → orderkey) and paid TWO extra
      // full-fact exchanges. The ot/fl left joins carry unique
      // per-order keys, so commuting them ahead of the customer inner
      // join is value-identical.
      li
        .join(o, li("l_orderkey") === o("o_orderkey"))
        .join(orderTotals, li("l_orderkey") === orderTotals("ot_orderkey"), "left")
        .join(orderFlags, li("l_orderkey") === orderFlags("fl_orderkey"), "left")
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(broadcast(sp), li("l_suppkey") === sp("s_suppkey"))
        .join(broadcast(dp), o("o_orderdate").cast("date") === col("dp.date_actual"))
        .join(broadcast(ds), li("l_shipdate").cast("date") === col("ds.date_actual"), "left")
        .select(
          surrogateKey(li("l_orderkey"), li("l_linenumber")).as("fact_key"),
          li("l_orderkey"),
          li("l_linenumber").cast("long").as("l_linenumber"),
          surrogateKey(lit("customer"), c("c_custkey")).as("customer_key"),
          surrogateKey(lit("part"), p("p_partkey")).as("part_key"),
          surrogateKey(lit("supplier"), sp("s_suppkey")).as("supplier_key"),
          col("dp.date_key").as("order_date_key"),
          col("ds.date_key").as("ship_date_key"),
          (li("l_extendedprice") * (lit(1) - li("l_discount"))
            * (lit(1) + li("l_tax")))
            .cast("decimal(18,6)").cast("double").as("item_total"),
          col("order_revenue"),
          col("n_lines"),
          col("return_flags"),
          col("last_ship_date"),
          (o("o_totalprice") > 200000).as("is_high_value"))
  }

  val specs: Seq[QuerySpec] = Seq(w2DateDim, j3FactStar)
}
