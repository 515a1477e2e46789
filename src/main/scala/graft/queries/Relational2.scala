package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables
import graft.text.TextFunctions

/** Extended relational coverage beyond the reference's own surface:
  * analytic windows (lag/lead, running frames, ranking), multi-level
  * aggregation (rollup/cube/pivot), set operations, a binned range join,
  * an as-of join via IGNORE NULLS window frames, and lateral explode.
  *
  * Scale notes: all windows are partitioned (no global ORDER BY window);
  * the range join is an equi-join on (user, time-bin) — O(matching pairs)
  * not O(n^2) — with the probe side exploding exactly 2 bins; rollup/cube
  * use Spark's Expand, which multiplies rows BEFORE the shuffle but keeps
  * partial aggregation.
  */
object Relational2 {

  import QuerySpec._

  // ---- W: lag/lead over partitioned order ----
  val w3LeadLag = withOracle(
    "w3_lead_lag",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
      |       CAST(CAST(lag(CAST(l_extendedprice AS DECIMAL(18,2)))
      |           OVER w AS DOUBLE) AS DOUBLE) AS prev_price,
      |       CAST(CAST(lead(CAST(l_extendedprice AS DECIMAL(18,2)))
      |           OVER w AS DOUBLE) AS DOUBLE) AS next_price
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_orderkey
      |             ORDER BY l_linenumber, l_partkey, l_suppkey)""".stripMargin) {
    (s, d) =>
      // (linenumber, partkey, suppkey) is the minimal total order in this
      // data — linenumber alone is not unique per order.
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      val price = col("l_extendedprice").cast("decimal(18,2)")
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        price.cast("double").as("price"),
        lag(price, 1).over(w).cast("double").as("prev_price"),
        lead(price, 1).over(w).cast("double").as("next_price"))
  }

  // ---- W: running aggregates (ROWS UNBOUNDED PRECEDING frame) ----
  val w4Running = withOracle(
    "w4_running_agg",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      |           PARTITION BY l_orderkey
      |           ORDER BY l_linenumber, l_partkey, l_suppkey
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |         AS running_qty,
      |       CAST(count(*) OVER (
      |           PARTITION BY l_orderkey
      |           ORDER BY l_linenumber, l_partkey, l_suppkey
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS running_cnt,
      |       CAST(count(*) OVER (PARTITION BY l_orderkey) AS BIGINT) AS order_lines
      |FROM lineitem""".stripMargin) { (s, d) =>
    val ordered = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col("l_orderkey"))
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
      sum(col("l_quantity").cast("decimal(18,2)")).over(ordered)
        .cast("double").as("running_qty"),
      count(lit(1)).over(ordered).as("running_cnt"),
      count(lit(1)).over(whole).as("order_lines"))
  }

  // ---- W: ranking family ----
  val w5Rank = withOracle(
    "w5_rank",
    """SELECT o_custkey, o_orderkey,
      |       CAST(rank() OVER w AS BIGINT) AS rnk,
      |       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      |       CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin) {
    (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"))
  }

  // ---- A: ROLLUP with grouping indicators ----
  val a8Rollup = withOracle(
    "a8_rollup",
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
      |FROM orders
      |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_orderpriority")).cast("long").as("g_priority"))
  }

  // ---- A: CUBE over a broadcast-joined dimension ----
  val a9Cube = withOracle(
    "a9_cube",
    """SELECT n.n_name, c.c_mktsegment,
      |       CAST(count(*) AS BIGINT) AS n_cust,
      |       CAST(GROUPING(n.n_name) AS BIGINT) AS g_nation,
      |       CAST(GROUPING(c.c_mktsegment) AS BIGINT) AS g_segment
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY CUBE(n.n_name, c.c_mktsegment)""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .cube(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        grouping(col("n_name")).cast("long").as("g_nation"),
        grouping(col("c_mktsegment")).cast("long").as("g_segment"))
  }

  // ---- A: pivot (wide aggregation) ----
  val a10Pivot = withOracle(
    "a10_pivot",
    """SELECT o_orderpriority,
      |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
      |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
      |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
      |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("O"), lit(0L)).as("n_open"),
        coalesce(col("F"), lit(0L)).as("n_filled"),
        coalesce(col("P"), lit(0L)).as("n_pending"))
  }

  // ---- U: set operations (UNION/INTERSECT/EXCEPT semantics) ----
  val u1SetOps = withOracle(
    "u1_setops",
    """WITH o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
      |f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |SELECT 'both' AS tag, o_custkey FROM (SELECT * FROM o INTERSECT SELECT * FROM f)
      |UNION ALL
      |SELECT 'only_open', o_custkey FROM (SELECT * FROM o EXCEPT SELECT * FROM f)
      |UNION ALL
      |SELECT 'only_filled', o_custkey FROM (SELECT * FROM f EXCEPT SELECT * FROM o)""".stripMargin) {
    (s, d) =>
      val orders = Tables.orders(s, d)
      val o = orders.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey")).distinct()
      val f = orders.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey")).distinct()
      o.intersect(f).select(lit("both").as("tag"), col("o_custkey"))
        .unionByName(o.except(f)
          .select(lit("only_open").as("tag"), col("o_custkey")))
        .unionByName(f.except(o)
          .select(lit("only_filled").as("tag"), col("o_custkey")))
  }

  // ---- J: range join via time-bin equi-join ----
  // Pairs of same-user events within 1 hour. The probe side explodes to
  // its bin and the next (any in-window partner lands in one of the two),
  // so the join is an equi-join on (user_id, bin): shuffle O(n), match
  // O(pairs) — the binning pattern that replaces an O(n^2) theta join.
  private val HourUs = 3600L * 1000000L
  val j13RangeJoin = withOracle(
    "j13_range_join",
    s"""WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tus
       |           FROM events)
       |SELECT a.event_id AS event_a, b.event_id AS event_b, a.user_id,
       |       CAST(b.tus - a.tus AS BIGINT) AS dt_us
       |FROM e a JOIN e b
       |  ON a.user_id = b.user_id
       | AND b.tus - a.tus BETWEEN 0 AND $HourUs
       | AND (b.tus > a.tus OR a.event_id < b.event_id)""".stripMargin) {
    (s, d) =>
      val e = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("tus"))
      val probe = e.withColumn("pbin",
        explode(array(floor(col("tus") / HourUs).cast("long"), floor(col("tus") / HourUs).cast("long") + 1)))
      val build = e.select(col("event_id").as("event_b"),
        col("user_id").as("user_b"), col("tus").as("tus_b"))
        .withColumn("bin", floor(col("tus_b") / HourUs).cast("long"))
      probe.join(build,
          col("user_id") === col("user_b") && col("pbin") === col("bin")
            && (col("tus_b") - col("tus")).between(0, HourUs)
            && (col("tus_b") > col("tus")
              || col("event_id") < col("event_b")))
        .select(col("event_id").as("event_a"), col("event_b"),
          col("user_id"), (col("tus_b") - col("tus")).as("dt_us"))
  }

  // ---- J: as-of join via IGNORE NULLS window frame ----
  // For each event, the timestamp of the user's most recent STRICTLY
  // PRIOR 'signup' event — the classic as-of/point-in-time lookup,
  // expressed as last(..., ignoreNulls) over ROWS ... 1 PRECEDING: one
  // partitioned sort, no join at all.
  val j14AsOf = withOracle(
    "j14_asof",
    """WITH e AS (SELECT event_id, user_id, event_type,
      |                  epoch_ns(ts) // 1000 AS tus
      |           FROM events)
      |SELECT event_id, user_id, CAST(tus AS BIGINT) AS tus,
      |       CAST(last_value(CASE WHEN event_type = 'signup' THEN tus END
      |                       IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY tus, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |         AS BIGINT) AS last_signup_us
      |FROM e""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .select(col("event_id"), col("user_id"), col("tus"),
        last(when(col("event_type") === "signup", col("tus")),
          ignoreNulls = true).over(w).as("last_signup_us"))
  }

  // ---- E: lateral explode (token frequencies with positions) ----
  val e1Explode = withOracle(
    "e1_explode_tokens",
    """WITH tok AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), ' +'),
      |                     t -> length(t) > 0) AS toks
      |  FROM documents),
      |x AS (SELECT doc_id, unnest(toks) AS tok,
      |             unnest(range(1, length(toks) + 1)) AS pos
      |      FROM tok)
      |SELECT tok, CAST(count(*) AS BIGINT) AS n,
      |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |       CAST(sum(pos) AS BIGINT) AS pos_sum
      |FROM x GROUP BY tok""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("pos") + 1).as("pos_sum"))
  }

  // ---- W7: value-based RANGE window frame ----
  // RANGE frames bound by VALUE distance (orders within $100 below the
  // current one), not row count — and because membership is value-based,
  // the result is deterministic even under order-by ties. Prices go
  // through exact integer cents (double -> decimal(18,2) -> *100 ->
  // bigint) so both engines frame identical sets.
  val w7RangeFrame = withOracle(
    "w7_range_frame",
    """WITH o AS (SELECT o_orderkey, o_orderpriority,
      |                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |                    AS cents
      |           FROM orders)
      |SELECT o_orderkey, o_orderpriority, cents,
      |       CAST(count(*) OVER w AS BIGINT) AS n_within_100,
      |       CAST(sum(cents) OVER w AS BIGINT) AS cents_within_100
      |FROM o
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents
      |             RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)""".stripMargin) {
    (s, d) =>
      val cents = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("cents")).rangeBetween(-10000L, 0L)
      cents.select(col("o_orderkey"), col("o_orderpriority"), col("cents"),
        count(lit(1)).over(w).as("n_within_100"),
        sum(col("cents")).over(w).as("cents_within_100"))
  }

  // ---- A12: explicit GROUPING SETS (beyond rollup/cube) ----
  // An arbitrary grouping-set list — the form rollup/cube cannot
  // express — through the SQL entry path, with GROUPING() flags
  // disambiguating real NULLs from subtotal rows.
  val a12GroupingSets = withOracle(
    "a12_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
      |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin) {
    (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("graft_a12_orders")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
        FROM graft_a12_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
  }

  // ---- A13: unpivot / melt (wide -> long) ----
  // The inverse of a10's pivot: per-priority aggregates melted into
  // (measure, value) rows via the DataFrame unpivot operator (Spark's
  // Expand node — row multiplication happens AFTER the aggregation, so
  // the melt itself is shuffle-free). All measures are cast to a common
  // DOUBLE before melting, as unpivot requires one value type.
  val a13Unpivot = withOracle(
    "a13_unpivot",
    """WITH agg AS (
      |  SELECT o_orderpriority,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |           AS total_price,
      |         CAST(count(*) AS DOUBLE) AS n_orders,
      |         CAST(count(DISTINCT o_custkey) AS DOUBLE) AS n_customers
      |  FROM orders GROUP BY 1)
      |SELECT o_orderpriority, measure, value
      |FROM agg UNPIVOT (value FOR measure IN
      |  (total_price, n_orders, n_customers))""".stripMargin) { (s, d) =>
    val agg = Tables.orders(s, d).groupBy(col("o_orderpriority"))
      .agg(
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_price"),
        count(lit(1)).cast("double").as("n_orders"),
        countDistinct(col("o_custkey")).cast("double").as("n_customers"))
    agg.unpivot(
      Array(col("o_orderpriority")),
      Array(col("total_price"), col("n_orders"), col("n_customers")),
      "measure", "value")
  }

  // ---- J16: correlated EXISTS / NOT EXISTS subqueries ----
  // Catalyst rewrites EXISTS to a left-semi and NOT EXISTS to a
  // left-anti hash join on the correlation key — the same physical
  // shape as j_semi/j_anti, but arrived at from the declarative
  // subquery form (the planner, not the author, picks the join).
  val j16Exists = withOracle(
    "j16_exists",
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 400000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |                  WHERE o2.o_custkey = c.c_custkey
      |                    AND o2.o_orderstatus = 'F'
      |                    AND o2.o_totalprice < 5000)""".stripMargin) { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("graft_j16_customer")
    Tables.orders(s, d).createOrReplaceTempView("graft_j16_orders")
    s.sql("""
      SELECT c_custkey, c_name
      FROM graft_j16_customer c
      WHERE EXISTS (SELECT 1 FROM graft_j16_orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 400000)
        AND NOT EXISTS (SELECT 1 FROM graft_j16_orders o2
                        WHERE o2.o_custkey = c.c_custkey
                          AND o2.o_orderstatus = 'F'
                          AND o2.o_totalprice < 5000)""")
  }

  // ---- C2: deterministic stratified sampling ----
  // ~10% of each priority stratum, selected by a Wang-style xor-shift
  // mix of the row key (multiply / xor-shift rounds; affine-only hashes
  // bias rank statistics — see hll1's scaladoc). Content-addressed
  // sampling is reproducible across runs, engines, and repartitioning —
  // unlike rand()-based sampling — and is a pure per-row filter: no
  // shuffle, fully pushdown-friendly. The same mix feeds hll1; shifts
  // are written as floor-div so DuckDB (`//`) and Spark (`shiftright`)
  // agree bit-for-bit on the nonnegative domain.
  val c2StratifiedSample = withOracle(
    "c2_stratified_sample",
    """WITH h0 AS (SELECT o_orderkey, o_orderpriority, o_totalprice,
      |            (o_orderkey * 2654435761) % 2147483648 AS h1 FROM orders),
      |hx AS (SELECT o_orderkey, o_orderpriority, o_totalprice,
      |       (xor(h1, h1 // 32768) * 1597334677) % 2147483648 AS h3 FROM h0)
      |SELECT o_orderkey, o_orderpriority,
      |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
      |FROM hx WHERE xor(h3, h3 // 8192) % 10 = 0""".stripMargin) { (s, d) =>
    val h1 = (col("o_orderkey") * lit(2654435761L)) % lit(2147483648L)
    val h3 = (h1.bitwiseXOR(shiftright(h1, 15)) * lit(1597334677L)) %
      lit(2147483648L)
    val hv = h3.bitwiseXOR(shiftright(h3, 13))
    Tables.orders(s, d)
      .filter(hv % 10 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)").cast("double").as("price"))
  }

  // ---- R1: recursive CTE (hierarchy walk) ----
  // Spark 4's WITH RECURSIVE (UNION ALL form; the engine rejects
  // recursion under distinct-UNION) over a synthetic part hierarchy
  // (parent = p_partkey div 10 — a tree rooted at key 0, so the walk is
  // a DAG traversal that terminates at the leaves without a depth
  // guard). Each level is one equi-join on the computed parent key —
  // linear total work, shuffle-partitioned per level, no driver loop:
  // the ONLY catalog entry where iteration happens inside the engine
  // rather than in library code (contrast Dedup.duplicateClusters).
  // path_cost accumulates root-to-node retailprice in DECIMAL(18,2),
  // re-cast each step so both engines carry the identical type (Spark
  // would otherwise widen per addition), emitted as DOUBLE.
  val r1RecursiveCte = withOracle(
    "r1_recursive_cte",
    """WITH RECURSIVE r(p_partkey, depth, path_cost) AS (
      |  SELECT p_partkey, 0, CAST(p_retailprice AS DECIMAL(18,2))
      |  FROM part WHERE p_partkey = 0
      |  UNION ALL
      |  SELECT c.p_partkey, r.depth + 1,
      |         CAST(r.path_cost + CAST(c.p_retailprice AS DECIMAL(18,2))
      |              AS DECIMAL(18,2))
      |  FROM r JOIN part c ON c.p_partkey // 10 = r.p_partkey
      |                    AND c.p_partkey > 0)
      |SELECT p_partkey, CAST(depth AS BIGINT) AS depth,
      |       CAST(path_cost AS DOUBLE) AS path_cost
      |FROM r""".stripMargin) { (s, d) =>
    Tables.part(s, d).createOrReplaceTempView("graft_r1_part")
    s.sql("""
      WITH RECURSIVE r(p_partkey, depth, path_cost) AS (
        SELECT p_partkey, 0, CAST(p_retailprice AS DECIMAL(18,2))
        FROM graft_r1_part WHERE p_partkey = 0
        UNION ALL
        SELECT c.p_partkey, r.depth + 1,
               CAST(r.path_cost + CAST(c.p_retailprice AS DECIMAL(18,2))
                    AS DECIMAL(18,2))
        FROM r JOIN graft_r1_part c ON c.p_partkey div 10 = r.p_partkey
                                   AND c.p_partkey > 0)
      SELECT p_partkey, CAST(depth AS BIGINT) AS depth,
             CAST(path_cost AS DOUBLE) AS path_cost
      FROM r""")
  }

  // ---- U2: multiset set ops (INTERSECT ALL / EXCEPT ALL) ----
  // Multiplicity semantics (min / difference of per-row counts) — the
  // ALL variants u1's DISTINCT forms don't cover. Tagged union keeps one
  // output shape.
  val u2SetOpsAll = withOracle(
    "u2_setops_all",
    """WITH a AS (SELECT o_orderstatus, o_orderpriority FROM orders
      |           WHERE o_custkey % 2 = 0),
      |b AS (SELECT o_orderstatus, o_orderpriority FROM orders
      |      WHERE o_custkey % 3 = 0)
      |SELECT 'intersect_all' AS op, * FROM (
      |  SELECT * FROM a INTERSECT ALL SELECT * FROM b)
      |UNION ALL
      |SELECT 'except_all' AS op, * FROM (
      |  SELECT * FROM a EXCEPT ALL SELECT * FROM b)""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val a = o.filter(col("o_custkey") % 2 === 0)
      .select(col("o_orderstatus"), col("o_orderpriority"))
    val b = o.filter(col("o_custkey") % 3 === 0)
      .select(col("o_orderstatus"), col("o_orderpriority"))
    a.intersectAll(b).select(lit("intersect_all").as("op"), col("*"))
      .unionAll(a.exceptAll(b).select(lit("except_all").as("op"), col("*")))
  }

  // ---- U3: SCD1 upsert (the MERGE INTO shape, engine-neutral) ----
  // Lakehouse upsert semantics without a transactional format: updates
  // full-outer-joined to the base, update wins per column, insert rows
  // ride the null base side. This is exactly what MERGE INTO ... WHEN
  // MATCHED UPDATE / WHEN NOT MATCHED INSERT computes; a Delta/Iceberg
  // writer would commit this frame as the new snapshot.
  val u3UpsertScd1 = withOracle(
    "u3_upsert_scd1",
    """WITH base AS (
      |  SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      |  FROM customer WHERE c_custkey % 7 <> 0),
      |updates AS (
      |  SELECT c_custkey, c_mktsegment || '_v2' AS c_mktsegment,
      |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100.00 AS DECIMAL(18,2)) AS bal
      |  FROM customer WHERE c_custkey % 3 = 0)
      |SELECT coalesce(u.c_custkey, b.c_custkey) AS c_custkey,
      |       coalesce(u.c_mktsegment, b.c_mktsegment) AS c_mktsegment,
      |       CAST(coalesce(u.bal, b.bal) AS DOUBLE) AS bal,
      |       u.c_custkey IS NOT NULL AND b.c_custkey IS NOT NULL AS was_updated,
      |       u.c_custkey IS NOT NULL AND b.c_custkey IS NULL AS was_inserted
      |FROM base b FULL OUTER JOIN updates u ON b.c_custkey = u.c_custkey""".stripMargin) {
    (s, d) =>
      val c = Tables.customer(s, d)
      val base = c.filter(col("c_custkey") % 7 =!= 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").cast("decimal(18,2)").as("bal"))
      val updates = c.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"),
          concat(col("c_mktsegment"), lit("_v2")).as("c_mktsegment"),
          (col("c_acctbal").cast("decimal(18,2)") + lit("100.00").cast("decimal(18,2)"))
            .cast("decimal(18,2)").as("bal"))
      base.alias("b")
        .join(updates.alias("u"), col("b.c_custkey") === col("u.c_custkey"),
          "full_outer")
        .select(
          coalesce(col("u.c_custkey"), col("b.c_custkey")).as("c_custkey"),
          coalesce(col("u.c_mktsegment"), col("b.c_mktsegment"))
            .as("c_mktsegment"),
          coalesce(col("u.bal"), col("b.bal")).cast("double").as("bal"),
          (col("u.c_custkey").isNotNull && col("b.c_custkey").isNotNull)
            .as("was_updated"),
          (col("u.c_custkey").isNotNull && col("b.c_custkey").isNull)
            .as("was_inserted"))
  }

  // ---- J15: explicit join-strategy control (SHUFFLE_HASH hint) ----
  // Values are a plain join; the operator under test is the STRATEGY:
  // the hint forces a shuffled hash join where the planner would pick
  // sort-merge — the right call when one side is much smaller than the
  // other but too big to broadcast (skips both sorts). PlanSpec asserts
  // the executed plan really is ShuffledHashJoin.
  val j15ShuffleHash = withOracle(
    "j15_shuffle_hash",
    """SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_customers
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.customer(s, d).alias("c")
      .join(Tables.nation(s, d).hint("shuffle_hash").alias("n"),
        col("c.c_nationkey") === col("n.n_nationkey"))
      .groupBy(col("n.n_name").as("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .select(col("n_name"), col("n_customers"))
  }

  // ---- A11: salted two-phase aggregation over skewed keys ----
  // lineitem's (returnflag, linestatus) has only ~4 heavy groups — at
  // 100 TB a single-phase hash-agg would funnel everything into 4
  // reducer partitions (the classic skew collapse). The salt spreads
  // each group across 64 partial groups, the first aggregation runs at
  // full parallelism, and the second collapses 4x64 tiny rows. Sums are
  // DECIMAL partials (order-independent), so the result is identical to
  // the plain GROUP BY the oracle runs. The salt is a deterministic
  // function of the row key — no RNG, re-runs are stable.
  val a11SaltedAgg = withOracle(
    "a11_salted_agg",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(count(*) AS BIGINT) AS n_items,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val partial = Tables.lineitem(s, d)
      .withColumn("_salt",
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(64)))
      .groupBy(col("l_returnflag"), col("l_linestatus"), col("_salt"))
      .agg(count(lit(1)).as("pn"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("pq"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("pp"))
    partial.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("pn")).as("n_items"),
        sum(col("pq")).cast("double").as("sum_qty"),
        sum(col("pp")).cast("double").as("sum_price"))
  }

  // ---- W6: distribution windows (percent_rank / cume_dist / ntile) ----
  // percent_rank and cume_dist are exact rationals ((rank-1)/(n-1),
  // peers/n) — bit-identical across engines; the window order is made
  // total by the orderkey tie-break so every rank is deterministic.
  val w6Distribution = withOracle(
    "w6_distribution",
    """SELECT o_orderkey, o_orderpriority,
      |       percent_rank() OVER w AS pct_rank,
      |       cume_dist() OVER w AS cume_dist,
      |       CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey)""".stripMargin) {
    (s, d) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").cast("decimal(18,2)"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderpriority"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume_dist"),
        ntile(4).over(w).cast("long").as("quartile"))
  }

  // ---- Bitwise aggregate vocabulary ----
  /** a15 — bit_and / bit_or / bit_xor per group: the flag-mask rollup
    * vocabulary (capability intersections, feature-bit unions, parity
    * checks). All-integer and fully commutative/associative, so
    * map-side partials combine exactly like sum's and the result is
    * engine-exact by construction.
    */
  val a15BitwiseAgg = withOracle(
    "a15_bitwise_agg",
    """SELECT l_linestatus,
      |       CAST(bit_and(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_and,
      |       CAST(bit_or(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_or,
      |       CAST(bit_xor(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_xor,
      |       CAST(bit_xor(l_orderkey * 31 + l_partkey) AS BIGINT) AS key_parity
      |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .agg(
        expr("bit_and(CAST(l_quantity AS BIGINT))").as("qty_and"),
        expr("bit_or(CAST(l_quantity AS BIGINT))").as("qty_or"),
        expr("bit_xor(CAST(l_quantity AS BIGINT))").as("qty_xor"),
        expr("bit_xor(l_orderkey * 31 + l_partkey)").as("key_parity"))
  }

  // ---- Statistical aggregates via exact sums ----
  /** a14 — the variance/stddev/correlation vocabulary, cross-engine
    * EXACT: the naive per-engine `var_pop`/`corr` built-ins accumulate
    * doubles in partition order (nondeterministic across engines AND
    * across runs), so instead every moment is aggregated as an exact
    * DECIMAL sum of exactly-representable products (quantities are
    * small integers, prices have two decimals — their doubles and
    * pairwise products are exact) and the statistics are assembled from
    * those sums in ONE fixed expression order both engines replay:
    * var = (n*Sxx - Sx^2)/n^2, corr = (n*Sxy - Sx*Sy) /
    * (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2)). Order-independent
    * shuffles (decimal addition commutes exactly), map-side partials,
    * one pass — the same reason the money aggregates use decimal.
    *
    * DECIMAL->DOUBLE conversion caveat (found by a failing gate at
    * sf0.001): once a sum's exact value needs more than double's 53
    * bits (syy's 4-decimal sums do), DuckDB's direct DECIMAL->DOUBLE
    * cast can be 1 ulp off the correctly-rounded double (measured:
    * 7096786968835.8685 -> ...f7a vs correct ...f79), while Spark's
    * BigDecimal conversion rounds correctly — so the oracle routes
    * every sum through VARCHAR (strtod is correctly rounded) to get
    * the identical double before the assembly arithmetic.
    */
  val a14StatsAgg = withOracle(
    "a14_stats_agg",
    """WITH s AS (
      |  SELECT l_returnflag,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
      |              AS VARCHAR) AS DOUBLE) AS sx,
      |         CAST(CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(18,2)))
      |              AS VARCHAR) AS DOUBLE) AS sxx,
      |         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
      |              AS VARCHAR) AS DOUBLE) AS sy,
      |         CAST(CAST(sum(CAST(l_extendedprice * l_extendedprice
      |                       AS DECIMAL(24,4))) AS VARCHAR) AS DOUBLE) AS syy,
      |         CAST(CAST(sum(CAST(l_quantity * l_extendedprice
      |                       AS DECIMAL(24,4))) AS VARCHAR) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, n,
      |       sx / n AS mean_qty,
      |       (n * sxx - sx * sx) / (CAST(n AS DOUBLE) * n) AS var_qty,
      |       sqrt((n * sxx - sx * sx) / (CAST(n AS DOUBLE) * n)) AS std_qty,
      |       (n * sxy - sx * sy)
      |         / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
      |         AS corr_qty_price
      |FROM s""".stripMargin) { (s, d) =>
    val n = col("n").cast("double")
    val varQty = (n * col("sxx") - col("sx") * col("sx")) / (n * n)
    // widen: the five exact-DECIMAL partial sums are per-row CPU an
    // unsplittable 3-split scan serializes (measured 1.8 s / 3 tasks);
    // decimal addition commutes exactly, so the extra exchange cannot
    // change a bit of the result. No-op at scale.
    graft.core.Parallelism.widen(Tables.lineitem(s, d))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sx"),
        sum((col("l_quantity") * col("l_quantity")).cast("decimal(18,2)"))
          .cast("double").as("sxx"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("sy"),
        sum((col("l_extendedprice") * col("l_extendedprice"))
          .cast("decimal(24,4)")).cast("double").as("syy"),
        sum((col("l_quantity") * col("l_extendedprice"))
          .cast("decimal(24,4)")).cast("double").as("sxy"))
      .select(col("l_returnflag"), col("n"),
        (col("sx") / n).as("mean_qty"),
        varQty.as("var_qty"),
        sqrt(varQty).as("std_qty"),
        ((n * col("sxy") - col("sx") * col("sy"))
          / (sqrt(n * col("sxx") - col("sx") * col("sx"))
            * sqrt(n * col("syy") - col("sy") * col("sy"))))
          .as("corr_qty_price"))
  }

  // ---- Runtime bloom-filter semi-join reduction ----
  /** j20 — Spark's RUNTIME FILTER: with broadcast off (the
    * 100 TB shape where the dim side is selective but past broadcast
    * size), InjectRuntimeFilter builds a bloom filter over the filtered
    * dim's join keys and plants `might_contain` into the fact scan's
    * stage — the fact side is pre-filtered BEFORE its shuffle, which at
    * scale is the difference between shuffling the whole fact table and
    * shuffling the ~5% that can possibly join. Result is a plain join
    * (the oracle never sees the filter — it is a pure physical
    * reduction); PlanSpec pins the injected filter and the non-broadcast
    * join. Runs on a CLONED session so the thresholds that force the
    * demo at test scale (the 100 TB defaults would not trigger on MBs)
    * never leak into the shared catalog session.
    */
  val j20RuntimeBloom = withOracle(
    "j20_runtime_bloom",
    """SELECT l.l_orderkey, l.l_partkey,
      |       CAST(count(*) AS BIGINT) AS n_lines,
      |       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE p.p_brand = 'Brand#4'
      |GROUP BY l.l_orderkey, l.l_partkey""".stripMargin) { (s0, d) =>
    val s = s0.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val p = Tables.part(s, d)
      .filter(col("p_brand") === "Brand#4")
      .select(col("p_partkey"))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"), col("l_partkey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"))
  }

  // ---- J21: manually salted skew join ----
  // The third cell of the skew matrix: a11 salts an AGGREGATION, the
  // PlanSpec AQE case pins the RUNTIME split of an unsalted join — this
  // is the PLANNED fix for a join whose hot key is known up front (the
  // only option when AQE cannot apply: streaming joins, or a hot key so
  // large even split reads straggle). The fact's hot key (~2/3 of all
  // rows on k=7777, the AQE test's shape) is spread across 8 salt
  // lanes by a deterministic row hash; the dim side is EXPLODED 8x so
  // every (k, salt) lane finds its dim row locally. Join keys include
  // the salt, so the hot key occupies 8 parallel partitions instead of
  // one straggler. The shuffle_hash hint keeps the dim from
  // broadcasting at test scale — at 100 TB a dim too big to broadcast
  // is the premise. Salting is exact: the join result is row-identical
  // to the unsalted join (the oracle), the salt only re-partitions it.
  val j21SaltedSkewJoin = withOracle(
    "j21_salted_skew_join",
    """WITH f AS (
      |  SELECT CASE WHEN l_orderkey % 3 <> 0 THEN 7777
      |              ELSE l_orderkey % 997 END AS k,
      |         l_quantity
      |  FROM lineitem),
      |dim AS (SELECT range AS k, range * 2 AS v FROM range(0, 8000))
      |SELECT CAST(k % 10 AS BIGINT) AS k_mod,
      |       CAST(count(*) AS BIGINT) AS n_items,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * v) AS DOUBLE)
      |         AS weighted_qty
      |FROM f JOIN dim USING (k) GROUP BY 1""".stripMargin) { (s, d) =>
    val S = 8
    val fact = Tables.lineitem(s, d)
      .select(
        when(col("l_orderkey") % 3 =!= 0, lit(7777L))
          .otherwise(pmod(col("l_orderkey"), lit(997L))).as("k"),
        col("l_quantity"),
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(S.toLong))
          .as("_salt"))
    val dim = s.range(0, 8000)
      .select(col("id").as("k"), (col("id") * 2).as("v"))
      .withColumn("_salt", explode(sequence(lit(0L), lit(S - 1L))))
    fact.join(dim.hint("shuffle_hash"), Seq("k", "_salt"))
      .groupBy(pmod(col("k"), lit(10L)).as("k_mod"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)") * col("v"))
          .cast("double").as("weighted_qty"))
  }

  // ---- a16: exact median + MAD (robust statistics) ----
  /** a14 assembles the MOMENT statistics (variance/correlation) from
    * exact sums; this is the ROBUST pair — per-group exact median and
    * median absolute deviation, the outlier-resistant spread measure
    * moments can't give (one corrupt 1e9 row ruins stddev, moves MAD
    * not at all). Both medians come from rank selection at ceil(n/2)
    * in a (value, key) total order (the g12 discipline — no
    * interpolation ambiguity), deviations are exact DECIMAL
    * subtraction, and the only double appears in the final cast — so
    * both engines agree bit-for-bit. Scale: two rank windows over the
    * SAME group partitioning plus a broadcast-size median join; exact
    * per-group medians are fine while rows-per-group is bounded (the
    * unbounded swap is t12's mergeable histogram).
    */
  val a16ExactMad = withOracle(
    "a16_exact_mad",
    """WITH v AS (
      |  SELECT o_orderkey, o_orderpriority,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS x
      |  FROM orders),
      |r1 AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
      |                               ORDER BY x, o_orderkey) AS rn,
      |         count(*) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM v),
      |med AS (
      |  SELECT o_orderpriority,
      |         max(CASE WHEN rn = (n + 1) // 2 THEN x END) AS med,
      |         max(n) AS n
      |  FROM r1 GROUP BY 1),
      |d AS (
      |  SELECT v.o_orderkey, v.o_orderpriority, m.med, m.n,
      |         abs(v.x - m.med) AS dev
      |  FROM v JOIN med m USING (o_orderpriority)),
      |r2 AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
      |                               ORDER BY dev, o_orderkey) AS rn
      |  FROM d)
      |SELECT o_orderpriority,
      |       CAST(max(med) AS DOUBLE) AS median,
      |       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN dev END)
      |            AS DOUBLE) AS mad,
      |       CAST(max(n) AS BIGINT) AS n
      |FROM r2 GROUP BY 1""".stripMargin) { (s, d) =>
    val v = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)").as("x"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("x"), col("o_orderkey"))
    val wAll = Window.partitionBy(col("o_orderpriority"))
    val med = v
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("o_orderpriority"))
      .agg(max(when(col("rn") === expr("(n + 1) div 2"), col("x")))
        .as("med"), max(col("n")).as("n"))
    val dev = v.join(broadcast(med), "o_orderpriority")
      .select(col("o_orderkey"), col("o_orderpriority"), col("med"),
        col("n"), abs(col("x") - col("med")).as("dev"))
    val w2 = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("dev"), col("o_orderkey"))
    dev.withColumn("rn", row_number().over(w2))
      .groupBy(col("o_orderpriority"))
      .agg(max(col("med")).cast("double").as("median"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("dev")))
          .cast("double").as("mad"),
        max(col("n")).as("n"))
  }

  // ---- a17: histogram median + MAD (the unbounded-group robust pair) ----
  /** a16's exact rank selection needs bounded rows-per-group (two rank
    * windows sort every group); this is its 100 TB swap — the same
    * robust statistics from a MERGEABLE fixed-width histogram
    * ([[graft.functions.MedianMadHistogram]]): per-group state is 4096
    * counters regardless of group size, map-side partials merge by
    * elementwise add, and the whole query is ONE group exchange with NO
    * rank window anywhere (PlanSpec pins both). Resolution is the
    * bucket width (w=64 on the money domain — median to ±32 of exact);
    * the count n stays exact. The oracle replays the identical bucket
    * algebra (floor(x/64), cumulative-half selection, ring-distance
    * weighted median) — integer-exact on both engines, so the
    * ESTIMATES hash-match bit-for-bit, the t12/hll3 discipline.
    */
  val a17HistogramMad = withOracle(
    "a17_histogram_mad",
    """WITH v AS (
      |  SELECT o_orderpriority AS g, o_totalprice AS x FROM orders),
      |h AS (
      |  SELECT g,
      |         least(greatest(CAST(floor(x / 64.0) AS BIGINT), 0), 4095)
      |           AS b,
      |         count(*) AS c
      |  FROM v GROUP BY 1, 2),
      |cum AS (
      |  SELECT g, b, c,
      |         sum(c) OVER (PARTITION BY g ORDER BY b) AS cum,
      |         sum(c) OVER (PARTITION BY g) AS n
      |  FROM h),
      |med AS (
      |  SELECT g, min(b) AS bmed, min(n) AS n FROM cum
      |  WHERE 2 * cum >= n GROUP BY g),
      |ring AS (
      |  SELECT h.g, abs(h.b - med.bmed) AS d, sum(h.c) AS c
      |  FROM h JOIN med ON h.g = med.g GROUP BY 1, 2),
      |rcum AS (
      |  SELECT ring.g, ring.d,
      |         sum(ring.c) OVER (PARTITION BY ring.g ORDER BY ring.d)
      |           AS cum,
      |         med.n, med.bmed
      |  FROM ring JOIN med ON ring.g = med.g),
      |mad AS (
      |  SELECT g, min(d) AS dmad, min(n) AS n, min(bmed) AS bmed
      |  FROM rcum WHERE 2 * cum >= n GROUP BY g)
      |SELECT g AS o_orderpriority,
      |       CAST(bmed * 64.0 + 32.0 AS DOUBLE) AS median_est,
      |       CAST(dmad * 64.0 AS DOUBLE) AS mad_est,
      |       CAST(n AS BIGINT) AS n
      |FROM mad""".stripMargin) { (s, d) =>
    val agg = udaf(new graft.functions.MedianMadHistogram(64.0, 4096),
      org.apache.spark.sql.Encoders.scalaDouble)
    Tables.orders(s, d)
      .select(col("o_orderpriority"),
        col("o_totalprice").cast("double").as("x"))
      .groupBy(col("o_orderpriority"))
      .agg(agg(col("x")).as("e"))
      .select(col("o_orderpriority"),
        col("e.median_est").as("median_est"),
        col("e.mad_est").as("mad_est"),
        col("e.n").as("n"))
  }

  // ---- a18: exact WEIGHTED median (quantity-weighted price) ----
  /** The third leg of the robust-stats family: a16 is the exact
    * unweighted median/MAD, a17 the unbounded-group histogram swap —
    * a18 is the exact WEIGHTED median (each row counts `l_quantity`
    * times), the estimator price/revenue analyses actually want when
    * line items carry volumes. Definition: the lower weighted median —
    * the smallest value whose running weight reaches half the group's
    * total (2*cum >= total with integer arithmetic, so no midpoint
    * interpolation and no float threshold).
    *
    * Determinism: values are exact price cents (BIGINT), weights exact
    * BIGINT quantities; the crossing rule compares integers, and value
    * ties cannot perturb the selected VALUE whatever intra-tie order
    * the cumulative sum visits. Scale: one hash exchange on the group
    * key; the running sum is a streaming frame and the group total is
    * Spark's O(n) whole-partition frame — both ride the same sort, and
    * the final min-where-crossed is a plain hash aggregate. Same
    * rows-per-group caveat as a16 (the window sorts each group); t12 /
    * a17's mergeable-histogram shape is the unbounded swap.
    */
  val a18WeightedMedian = withOracle(
    "a18_weighted_median",
    """WITH r AS (
      |  SELECT l_returnflag, l_linestatus,
      |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |           AS cents,
      |         CAST(l_quantity AS BIGINT) AS w
      |  FROM lineitem),
      |c AS (
      |  SELECT l_returnflag, l_linestatus, cents, w,
      |         sum(w) OVER (PARTITION BY l_returnflag, l_linestatus
      |                      ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cw,
      |         sum(w) OVER (PARTITION BY l_returnflag, l_linestatus) AS tw
      |  FROM r)
      |SELECT l_returnflag, l_linestatus,
      |       CAST(min(CASE WHEN 2 * cw >= tw THEN cents END) AS DOUBLE)
      |         / 100 AS w_median,
      |       CAST(max(tw) AS BIGINT) AS total_weight
      |FROM c GROUP BY 1, 2""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val grp = Seq(col("l_returnflag"), col("l_linestatus"))
    val run = Window.partitionBy(grp: _*).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(grp: _*)
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100)
          .cast("long").as("cents"),
        col("l_quantity").cast("long").as("w"))
      .withColumn("cw", sum(col("w")).over(run))
      .withColumn("tw", sum(col("w")).over(whole))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg((min(when(lit(2) * col("cw") >= col("tw"), col("cents")))
        .cast("double") / 100).as("w_median"),
        max(col("tw")).as("total_weight"))
  }

  val specs: Seq[QuerySpec] = Seq(
    w3LeadLag, w4Running, w5Rank, w6Distribution, w7RangeFrame, a8Rollup,
    a9Cube, a10Pivot, a11SaltedAgg, a12GroupingSets, a13Unpivot,
    u1SetOps, u2SetOpsAll, u3UpsertScd1, j13RangeJoin, j14AsOf,
    j15ShuffleHash, j16Exists, e1Explode, c2StratifiedSample,
    r1RecursiveCte, j20RuntimeBloom, a14StatsAgg, a15BitwiseAgg,
    j21SaltedSkewJoin, a16ExactMad, a17HistogramMad, a18WeightedMedian)
}
