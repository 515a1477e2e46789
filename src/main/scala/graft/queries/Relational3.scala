package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Third relational batch: lateral joins, correlated scalar subqueries,
  * and the higher-order array-function vocabulary — the remaining ANSI
  * SQL surface a reference user would expect to carry over.
  *
  * Scale notes are per-query; the common theme is that all three decorate
  * into standard joins/aggregations under Catalyst's decorrelation rules,
  * so none of them hides a nested-loop at 100 TB.
  */
object Relational3 {

  import QuerySpec._

  // ---- LATERAL join: top-2 orders per customer ----
  // The per-row-subquery shape (DuckDB/Postgres LATERAL). Catalyst
  // decorrelates the LIMIT-per-group lateral into a window rank over a
  // single shuffled join — the executed plan has no nested loop, so it
  // scales like any top-k-per-key window. Customers with no orders drop
  // (inner lateral), matching the oracle.
  val j17Lateral = withOracle(
    "j17_lateral",
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c JOIN LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t ON true""".stripMargin) {
    (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("graft_j17_customer")
      Tables.orders(s, d).createOrReplaceTempView("graft_j17_orders")
      s.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM graft_j17_customer c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM graft_j17_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""")
  }

  // ---- Correlated scalar subqueries (incl. the COUNT-bug case) ----
  // Two correlated aggregates per outer row. COUNT over an empty
  // correlated group must yield 0, not NULL (the classic "COUNT bug") —
  // Catalyst's decorrelation inserts the null-to-zero projection after
  // the left outer join; customers without orders prove it. Both
  // subqueries decorrelate into ONE aggregate-then-join (shared group on
  // o_custkey), not two nested loops.
  val j18CorrelatedAgg = withOracle(
    "j18_correlated_agg",
    """SELECT c_custkey,
      |  CAST((SELECT count(*) FROM orders o
      |        WHERE o.o_custkey = c.c_custkey) AS BIGINT) AS n_orders,
      |  (SELECT max(o_totalprice) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey) AS max_price
      |FROM customer c""".stripMargin) { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("graft_j18_customer")
    Tables.orders(s, d).createOrReplaceTempView("graft_j18_orders")
    s.sql("""
      SELECT c_custkey,
        CAST((SELECT count(*) FROM graft_j18_orders o
              WHERE o.o_custkey = c.c_custkey) AS BIGINT) AS n_orders,
        (SELECT max(o_totalprice) FROM graft_j18_orders o
         WHERE o.o_custkey = c.c_custkey) AS max_price
      FROM graft_j18_customer c""")
  }

  // ---- Higher-order array functions ----
  // transform / filter / aggregate / slice / array_contains /
  // array_position / array_min over the token array — the array-column
  // vocabulary. Pure per-row expressions: zero shuffle, runs inside the
  // scan at any scale. (HOF lambdas are interpreted, not codegen'd, so
  // the token array is PROJECTED once first — inlining `tokens(text)`
  // into every lambda would re-split the document per function.)
  val f7ArrayHof = withOracle(
    "f7_array_hof",
    """WITH tok AS (
      |  SELECT doc_id, list_filter(string_split_regex(trim(text), ' +'),
      |                             t -> length(t) > 0) AS toks
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(length(toks) AS BIGINT) AS n_tokens,
      |  CAST(length(list_filter(toks, t -> length(t) > 4)) AS BIGINT) AS n_long,
      |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |         list_transform(toks, t -> CAST(length(t) AS BIGINT))),
      |       (a, b) -> a + b) AS BIGINT) AS char_sum,
      |  array_to_string(list_slice(toks, 1, 3), ' ') AS head3,
      |  list_contains(toks, 'the') AS has_the,
      |  CAST(coalesce(list_position(toks, 'the'), 0) AS BIGINT) AS the_pos,
      |  list_min(toks) AS first_term
      |FROM tok""".stripMargin) { (s, d) =>
    import graft.text.TextFunctions.tokens
    Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(filter(col("toks"), t => length(t) > 4)).cast("long").as("n_long"),
        aggregate(transform(col("toks"), t => length(t).cast("long")),
          lit(0L), (a, x) => a + x).as("char_sum"),
        array_join(slice(col("toks"), 1, 3), " ").as("head3"),
        array_contains(col("toks"), "the").as("has_the"),
        array_position(col("toks"), "the").as("the_pos"),
        array_min(col("toks")).as("first_term"))
  }

  // ---- Batch sessionization ----
  // The batch twin of st7's streaming sessions: a 30-minute inactivity
  // gap closes a session. Classic gaps-and-islands — lag to mark session
  // starts, running sum to number them, then per-session aggregates.
  // Scale: both windows share ONE (user_id) partitioning and sort (the
  // second rides the first — one shuffle); the closing groupBy is a
  // hash-agg with map-side partials. Timestamps are compared and emitted
  // at MICROsecond precision on both engines (events.parquet is ns;
  // Tables.events truncates like DuckDB's epoch_ns // 1000). Money-style
  // sum via decimal (order-independent), final cast to double.
  val e2Sessionize = withOracle(
    "e2_sessionize",
    """WITH l AS (
      |  SELECT user_id, event_id, ts, value,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |n AS (SELECT *, CASE WHEN prev IS NULL
      |        OR epoch_ns(ts) // 1000 - epoch_ns(prev) // 1000 > 1800000000
      |      THEN 1 ELSE 0 END AS is_new FROM l),
      |s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |      FROM n)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |       CAST(epoch_ns(min(ts)) // 1000 AS BIGINT) AS session_start_us,
      |       CAST(epoch_ns(max(ts)) // 1000 AS BIGINT) AS session_end_us,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM s GROUP BY 1, 2""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val wo = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("prev", lag(col("ts"), 1).over(wo))
      .withColumn("is_new",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > 1800000000L,
          lit(1)).otherwise(lit(0)))
      .withColumn("session_id", sum(col("is_new")).over(wrun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        unix_micros(min(col("ts"))).as("session_start_us"),
        unix_micros(max(col("ts"))).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .select(col("user_id"), col("session_id").cast("long").as("session_id"),
        col("session_start_us"), col("session_end_us"),
        col("n_events"), col("total_value"))
  }

  // ---- MERGE with a DELETE clause ----
  // Extends u3's SCD1 upsert with the third MERGE arm:
  //   WHEN MATCHED AND <cond> THEN DELETE
  //   WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT
  // computed engine-neutrally as one full-outer join: delete rows are
  // FILTERED out of the merged snapshot, update wins per column, inserts
  // ride the null base side, unmatched base rows survive. The `action`
  // column is the merge audit trail (Delta's operationMetrics analogue).
  val u5MergeDelete = withOracle(
    "u5_merge_delete",
    """WITH base AS (
      |  SELECT c_custkey, c_mktsegment,
      |         CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      |  FROM customer WHERE c_custkey % 7 <> 0),
      |changes AS (
      |  SELECT c_custkey, c_mktsegment || '_v2' AS c_mktsegment,
      |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100.00 AS DECIMAL(18,2)) AS bal
      |  FROM customer WHERE c_custkey % 3 = 0),
      |m AS (
      |  SELECT b.c_custkey AS bk, u.c_custkey AS uk,
      |         coalesce(u.c_custkey, b.c_custkey) AS c_custkey,
      |         coalesce(u.c_mktsegment, b.c_mktsegment) AS c_mktsegment,
      |         coalesce(u.bal, b.bal) AS bal
      |  FROM base b FULL OUTER JOIN changes u ON b.c_custkey = u.c_custkey)
      |SELECT c_custkey, c_mktsegment, CAST(bal AS DOUBLE) AS bal,
      |       CASE WHEN bk IS NOT NULL AND uk IS NOT NULL THEN 'updated'
      |            WHEN uk IS NOT NULL THEN 'inserted'
      |            ELSE 'kept' END AS action
      |FROM m
      |WHERE NOT (bk IS NOT NULL AND uk IS NOT NULL AND bal > 9000.00)""".stripMargin) {
    (s, d) =>
      val c = Tables.customer(s, d)
      val base = c.filter(col("c_custkey") % 7 =!= 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").cast("decimal(18,2)").as("bal"))
      val changes = c.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"),
          concat(col("c_mktsegment"), lit("_v2")).as("c_mktsegment"),
          (col("c_acctbal").cast("decimal(18,2)")
            + lit("100.00").cast("decimal(18,2)"))
            .cast("decimal(18,2)").as("bal"))
      base.alias("b")
        .join(changes.alias("u"), col("b.c_custkey") === col("u.c_custkey"),
          "full_outer")
        .select(
          col("b.c_custkey").as("bk"), col("u.c_custkey").as("uk"),
          coalesce(col("u.c_custkey"), col("b.c_custkey")).as("c_custkey"),
          coalesce(col("u.c_mktsegment"), col("b.c_mktsegment"))
            .as("c_mktsegment"),
          coalesce(col("u.bal"), col("b.bal")).as("bal"))
        .filter(!(col("bk").isNotNull && col("uk").isNotNull
          && col("bal") > lit("9000.00").cast("decimal(18,2)")))
        .select(col("c_custkey"), col("c_mktsegment"),
          col("bal").cast("double").as("bal"),
          when(col("bk").isNotNull && col("uk").isNotNull, "updated")
            .when(col("uk").isNotNull, "inserted")
            .otherwise("kept").as("action"))
  }

  // ---- U8: MERGE with WHEN NOT MATCHED BY SOURCE (full sync) ----
  // The third MERGE arm u3/u5 don't exercise: the source is the
  // COMPLETE desired state, and target rows absent from it are DELETED
  // (`WHEN NOT MATCHED BY SOURCE THEN DELETE`) — the "make the table
  // equal this snapshot" sync a dimension refresh runs. Matched rows
  // update, source-only rows insert, target-only rows drop; the audit
  // column records which arm fired. Same full-outer-join MERGE shape as
  // u5, flipped retention rule: inner ∪ source-only survive.
  val u8MergeSync = withOracle(
    "u8_merge_sync",
    """WITH target AS (
      |  SELECT c_custkey, c_mktsegment,
      |         CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      |  FROM customer WHERE c_custkey % 2 = 1),
      |source AS (
      |  SELECT c_custkey, c_mktsegment || '_s' AS c_mktsegment,
      |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 7.00 AS DECIMAL(18,2)) AS bal
      |  FROM customer WHERE c_custkey % 3 <> 0),
      |m AS (
      |  SELECT t.c_custkey AS tk, s.c_custkey AS sk,
      |         coalesce(s.c_custkey, t.c_custkey) AS c_custkey,
      |         s.c_mktsegment AS s_seg, s.bal AS s_bal
      |  FROM target t FULL OUTER JOIN source s ON t.c_custkey = s.c_custkey)
      |SELECT c_custkey, s_seg AS c_mktsegment, CAST(s_bal AS DOUBLE) AS bal,
      |       CASE WHEN tk IS NOT NULL AND sk IS NOT NULL THEN 'updated'
      |            ELSE 'inserted' END AS action
      |FROM m WHERE sk IS NOT NULL""".stripMargin) {
    (s, d) =>
      val c = Tables.customer(s, d)
      val target = c.filter(col("c_custkey") % 2 === 1)
        .select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").cast("decimal(18,2)").as("bal"))
      val source = c.filter(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey"),
          concat(col("c_mktsegment"), lit("_s")).as("c_mktsegment"),
          (col("c_acctbal").cast("decimal(18,2)")
            + lit("7.00").cast("decimal(18,2)"))
            .cast("decimal(18,2)").as("bal"))
      target.alias("t")
        .join(source.alias("s"), col("t.c_custkey") === col("s.c_custkey"),
          "full_outer")
        .select(
          col("t.c_custkey").as("tk"), col("s.c_custkey").as("sk"),
          coalesce(col("s.c_custkey"), col("t.c_custkey")).as("c_custkey"),
          col("s.c_mktsegment").as("s_seg"), col("s.bal").as("s_bal"))
        // NOT MATCHED BY SOURCE -> DELETE: only source-backed rows live.
        .filter(col("sk").isNotNull)
        .select(col("c_custkey"), col("s_seg").as("c_mktsegment"),
          col("s_bal").cast("double").as("bal"),
          when(col("tk").isNotNull && col("sk").isNotNull, "updated")
            .otherwise("inserted").as("action"))
  }

  // ---- F10: ANSI-safe try_* arithmetic vocabulary ----
  // Spark 4 runs ANSI mode, where overflow/bad-cast/out-of-range THROW;
  // the try_* family is the per-row escape hatch that degrades each
  // failure to NULL instead of killing a 100 TB job at the first dirty
  // row: try_divide (zero divisor), try_multiply (long overflow),
  // try_cast (malformed string), try_element_at (index out of range).
  // The oracle replicates every NULL boundary with explicit CASE
  // guards / native NULL semantics, so the outputs hash-match exactly.
  //
  // Failure rows are ~1-2% BY DESIGN: TryEval catches a per-row
  // exception on each failure (Math.multiplyExact / Cast both construct
  // a stack-traced Throwable), so a try_* column where EVERY row fails
  // runs tens of times slower than the happy path — the sf0.1→sf1.0
  // scaling sweep caught this entry at 56 s with all-rows-fail terms.
  // Dirty data is rare by nature; the vocabulary is exercised on BOTH
  // paths either way.
  val f10TryArithmetic = withOracle(
    "f10_try_arithmetic",
    """SELECT o_orderkey,
      |       CASE WHEN (o_orderkey % 101) - 2 = 0 THEN NULL
      |            ELSE CAST(o_totalprice AS DOUBLE)
      |                 / CAST((o_orderkey % 101) - 2 AS DOUBLE) END AS d,
      |       CASE WHEN o_orderkey % 100 = 0 THEN NULL
      |            ELSE o_orderkey * 4 END AS m,
      |       CAST(CASE WHEN o_orderkey % 100 = 0 THEN NULL
      |            ELSE TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER)
      |            END AS BIGINT) AS c1,
      |       CAST(TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS BIGINT) AS c2,
      |       string_split(o_orderpriority, '-')[99] AS e
      |FROM orders""".stripMargin) { (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      // zero divisor on ~1% of rows ((key % 101) == 2)
      try_divide(col("o_totalprice").cast("double"),
        ((col("o_orderkey") % 101) - 2).cast("double")).as("d"),
      // overflow on ~1% of rows (Long.MaxValue * 4), plain multiply else
      try_multiply(
        when(col("o_orderkey") % 100 === 0, lit(Long.MaxValue))
          .otherwise(col("o_orderkey")),
        lit(4L)).as("m"),
      // malformed cast on ~1% of rows ("5-LOW" is not an int; the first
      // digit is), clean digit cast on the rest
      expr("""try_cast(CASE WHEN o_orderkey % 100 = 0 THEN o_orderpriority
                            ELSE substr(o_orderpriority, 1, 1) END AS int)""")
        .cast("long").as("c1"),
      expr("try_cast(substr(o_orderpriority, 1, 1) AS int)").cast("long")
        .as("c2"),
      try_element_at(split(col("o_orderpriority"), "-"), lit(99)).as("e"))
  }

  // ---- Native session_window in batch ----
  // Spark's built-in session-window operator (the declarative form of
  // e2's hand-rolled gaps-and-islands): sessions merge while the next
  // event starts BEFORE the current session end (last ts + gap), so a
  // gap of exactly 30 minutes STARTS a new session (e2's manual rule
  // closes only on strictly-greater — both conventions exist; each
  // oracle mirrors its own). session end = last event + gap, emitted as
  // epoch µs. One shuffle on user_id; per-key session merging happens
  // inside the aggregation.
  val w9SessionWindow = withOracle(
    "w9_session_window",
    """WITH l AS (
      |  SELECT user_id, event_id, ts, value,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |n AS (SELECT *, CASE WHEN prev IS NULL
      |        OR epoch_ns(ts) // 1000 - epoch_ns(prev) // 1000 >= 1800000000
      |      THEN 1 ELSE 0 END AS is_new FROM l),
      |s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |      FROM n)
      |SELECT user_id,
      |       CAST(epoch_ns(min(ts)) // 1000 AS BIGINT) AS session_start_us,
      |       CAST(epoch_ns(max(ts)) // 1000 + 1800000000 AS BIGINT)
      |         AS session_end_us,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM s GROUP BY user_id, sid""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("total_value"))
  }

  // ---- String-function vocabulary ----
  // split_part / translate / lpad / repeat / left / reverse / instr —
  // the remaining portable string surface. Pure per-row expressions,
  // zero shuffle.
  val f8StringFuncs = withOracle(
    "f8_string_funcs",
    """SELECT c_custkey,
      |       split_part(c_name, '#', 2) AS id_part,
      |       translate(c_name, '#0', '_x') AS translated,
      |       lpad(c_mktsegment, 12, '.') AS padded,
      |       repeat(left(c_name, 3), 2) AS repeated,
      |       reverse(c_mktsegment) AS reversed,
      |       CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos
      |FROM customer""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(
      col("c_custkey"),
      expr("split_part(c_name, '#', 2)").as("id_part"),
      translate(col("c_name"), "#0", "_x").as("translated"),
      lpad(col("c_mktsegment"), 12, ".").as("padded"),
      repeat(expr("left(c_name, 3)"), 2).as("repeated"),
      reverse(col("c_mktsegment")).as("reversed"),
      instr(col("c_name"), "#").cast("long").as("hash_pos"))
  }

  // ---- first_value / last_value / nth_value windows ----
  // The value-picking window vocabulary: first event value so far, the
  // partition's final value (full frame), the second value seen. Order
  // made total by (ts-as-µs, event_id), so every pick is deterministic
  // and engine-independent; values are emitted raw (no accumulation), so
  // doubles compare exactly.
  val w10ValuePick = withOracle(
    "w10_value_pick",
    """SELECT event_id, user_id, value,
      |       first_value(value) OVER w AS first_v,
      |       last_value(value) OVER (PARTITION BY user_id
      |         ORDER BY epoch_ns(ts) // 1000, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |         AS final_v,
      |       nth_value(value, 2) OVER w AS second_v
      |FROM events
      |WINDOW w AS (PARTITION BY user_id
      |             ORDER BY epoch_ns(ts) // 1000, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin) {
    (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val order = Seq(unix_micros(col("ts")), col("event_id"))
      val wRun = Window.partitionBy(col("user_id")).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("user_id")).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d).select(
        col("event_id"), col("user_id"), col("value"),
        first(col("value")).over(wRun).as("first_v"),
        last(col("value")).over(wAll).as("final_v"),
        nth_value(col("value"), 2).over(wRun).as("second_v"))
  }

  // ---- Funnel attribution ----
  /** Ordered multi-stage funnel (view -> click -> purchase, first-touch):
    * per user, the earliest view, the earliest click STRICTLY AFTER that
    * view, and the earliest purchase strictly after that click — the
    * standard product-analytics funnel over the events stream, emitted
    * as one row per funnel-entered user with the stage reached and the
    * per-stage timestamps (microseconds, the e2 convention — both
    * engines compare and emit at us precision).
    *
    * Scale: three hash aggregations and two joins, ALL keyed on
    * `user_id` — one partitioning reused across every stage (the
    * sequential dependency between stages is inherent to funnel
    * semantics; each stage's input is the previous stage's bounded
    * per-user row, not the event stream re-scanned per stage — stage 2+
    * scans are filtered to one event type before the join).
    */
  val e3Funnel = withOracle(
    "e3_funnel",
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS t2
      |      FROM events e JOIN v ON v.user_id = e.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS t3
      |      FROM events e JOIN c ON c.user_id = e.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
      |SELECT v.user_id,
      |       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
      |                 WHEN c.user_id IS NOT NULL THEN 2
      |                 ELSE 1 END AS BIGINT) AS stage,
      |       CAST(epoch_ns(v.t1) // 1000 AS BIGINT) AS t1_us,
      |       CAST(epoch_ns(c.t2) // 1000 AS BIGINT) AS t2_us,
      |       CAST(epoch_ns(p.t3) // 1000 AS BIGINT) AS t3_us
      |FROM v LEFT JOIN c ON c.user_id = v.user_id
      |       LEFT JOIN p ON p.user_id = v.user_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("t3").isNotNull, lit(3L))
          .when(col("t2").isNotNull, lit(2L))
          .otherwise(lit(1L)).as("stage"),
        unix_micros(col("t1")).as("t1_us"),
        unix_micros(col("t2")).as("t2_us"),
        unix_micros(col("t3")).as("t3_us"))
  }

  // ---- J19: interval-OVERLAP join (two derived interval sets) ----
  // Which per-user activity sessions overlap which per-type event
  // bursts — the interval×interval non-equi join (a_start <= b_end AND
  // b_start <= a_end) that a theta join would execute as an O(A×B)
  // nested loop. The scalable plan bins TIME instead: every interval
  // explodes to the DAY bins it spans (fan-out = duration/day, bounded
  // by the timeline, not the data), the bin becomes an equi-join key,
  // pairs sharing several days are deduplicated, and the exact overlap
  // predicate filters the survivors. One shuffle on the bin key, pair
  // work proportional to co-located-in-time intervals — the same
  // bin-the-range trick as j13, lifted from points to intervals on
  // both sides.
  val j19IntervalOverlap = withOracle(
    "j19_interval_overlap",
    """WITH e AS (SELECT user_id, event_type, event_id,
      |                  epoch_ns(ts) // 1000 AS us FROM events),
      |al AS (SELECT user_id, us, event_id,
      |              CASE WHEN lag(us) OVER w IS NULL
      |                   OR us - lag(us) OVER w > 1800000000
      |              THEN 1 ELSE 0 END AS brk
      |       FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |asn AS (SELECT user_id, us, sum(brk) OVER (PARTITION BY user_id
      |          ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM al),
      |a AS (SELECT user_id, CAST(min(us) AS BIGINT) AS a_start_us,
      |             CAST(max(us) AS BIGINT) AS a_end_us
      |      FROM asn GROUP BY user_id, sid),
      |bl AS (SELECT event_type, us, event_id,
      |              CASE WHEN lag(us) OVER w IS NULL
      |                   OR us - lag(us) OVER w > 600000000
      |              THEN 1 ELSE 0 END AS brk
      |       FROM e WINDOW w AS (PARTITION BY event_type ORDER BY us, event_id)),
      |bsn AS (SELECT event_type, us, sum(brk) OVER (PARTITION BY event_type
      |          ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM bl),
      |b AS (SELECT event_type, CAST(min(us) AS BIGINT) AS b_start_us,
      |             CAST(max(us) AS BIGINT) AS b_end_us
      |      FROM bsn GROUP BY event_type, sid)
      |SELECT a.user_id, b.event_type, a.a_start_us, a.a_end_us,
      |       b.b_start_us, b.b_end_us,
      |       CAST(least(a.a_end_us, b.b_end_us)
      |            - greatest(a.a_start_us, b.b_start_us) AS BIGINT) AS overlap_us
      |FROM a JOIN b ON a.a_start_us <= b.b_end_us
      |            AND b.b_start_us <= a.a_end_us""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val DayUs = 86400000000L
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    def islands(keyCol: String, gapUs: Long): org.apache.spark.sql.DataFrame = {
      val wo = Window.partitionBy(col(keyCol)).orderBy(col("us"), col("event_id"))
      val wrun = Window.partitionBy(col(keyCol))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("prev", lag(col("us"), 1).over(wo))
        .withColumn("brk",
          when(col("prev").isNull || col("us") - col("prev") > gapUs, lit(1))
            .otherwise(lit(0)))
        .withColumn("sid", sum(col("brk")).over(wrun))
        .groupBy(col(keyCol), col("sid"))
        .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"))
        .drop("sid")
    }
    val a = islands("user_id", 1800000000L)
      .select(col("user_id"), col("start_us").as("a_start_us"),
        col("end_us").as("a_end_us"))
    val b = islands("event_type", 600000000L)
      .select(col("event_type"), col("start_us").as("b_start_us"),
        col("end_us").as("b_end_us"))
    def binned(df: org.apache.spark.sql.DataFrame, s0: String, e0: String) =
      df.withColumn("bin",
        explode(sequence(expr(s"$s0 div ${DayUs}L"), expr(s"$e0 div ${DayUs}L"))))
    binned(a, "a_start_us", "a_end_us")
      .join(binned(b, "b_start_us", "b_end_us"), "bin")
      .filter(col("a_start_us") <= col("b_end_us")
        && col("b_start_us") <= col("a_end_us"))
      .select(col("user_id"), col("event_type"),
        col("a_start_us"), col("a_end_us"),
        col("b_start_us"), col("b_end_us"))
      .distinct()
      .withColumn("overlap_us",
        least(col("a_end_us"), col("b_end_us"))
          - greatest(col("a_start_us"), col("b_start_us")))
  }

  // ---- Cohort retention ----
  // The third classic event-analytics shape after sessionization (e2)
  // and funnels (e3): users cohorted by first-seen week, retention
  // counted as distinct active users per (cohort, weeks-since-cohort).
  // Both engines truncate to Monday weeks; the cohort week is emitted
  // as an ISO string (never a DATE column — the engines' date
  // representations differ, see the verify gotchas) and the offset is
  // exact integral division of a day diff between two week-truncated
  // dates. Scale: one shuffle to the per-user min (map-side combine),
  // one distinct on (user, cohort, week) — the classic two-pass shape;
  // nothing is ever per-pair or collected.
  val e4RetentionCohorts = withOracle(
    "e4_retention_cohorts",
    """WITH e AS (
      |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      |  FROM events),
      |c AS (
      |  SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1),
      |j AS (
      |  SELECT DISTINCT e.user_id, c.cohort_wk, e.wk
      |  FROM e JOIN c USING (user_id))
      |SELECT CAST(cohort_wk AS VARCHAR) AS cohort_week,
      |       CAST(date_diff('day', cohort_wk, wk) // 7 AS BIGINT)
      |         AS week_offset,
      |       CAST(count(*) AS BIGINT) AS n_users
      |FROM j GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
    val cohorts = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    e.join(cohorts, "user_id")
      .select(col("user_id"), col("cohort_wk"), col("wk"))
      .distinct()
      .groupBy(
        col("cohort_wk").cast("string").as("cohort_week"),
        // integral div like c3: exact at any magnitude
        expr("datediff(wk, cohort_wk) div 7").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  // ---- Consecutive event-pattern detection (the MATCH_RECOGNIZE-lite
  // CEP shape) ----
  // Detect the strictly-consecutive view -> click -> purchase sequence
  // per user: two LEADs over one (user, time) window turn each position
  // into the 3-gram starting there, and the pattern is a plain filter —
  // sequential pattern matching as a window expression, no state
  // machine, no self-joins. e3's funnel orders FIRST TOUCHES (the
  // macro journey); this matches exact consecutive micro-sequences.
  // Scale: one shuffle (the user window both LEADs share), then
  // filter + hash-agg.
  val w11EventPattern = withOracle(
    "w11_event_pattern",
    """WITH o AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         lead(event_type, 1) OVER w AS e1,
      |         lead(event_type, 2) OVER w AS e2
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |p AS (
      |  SELECT user_id, ts FROM o
      |  WHERE event_type = 'view' AND e1 = 'click' AND e2 = 'purchase')
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_patterns,
      |       CAST(epoch_ns(min(ts)) // 1000 AS BIGINT) AS first_start_us
      |FROM p GROUP BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e1", lead(col("event_type"), 1).over(w))
      .withColumn("e2", lead(col("event_type"), 2).over(w))
      .filter(col("event_type") === "view" && col("e1") === "click" &&
        col("e2") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_patterns"),
        unix_micros(min(col("ts"))).as("first_start_us"))
  }

  // ---- e5: event-transition matrix (first-order Markov over sessions) ----
  // The product-analytics staple behind "users who view then click":
  // per-user event streams ordered by (ts, event_id) — a total order, so
  // the lag is deterministic — yield (prev, next) transition counts plus
  // the row-normalized probability (integer-count division, exact on
  // both engines). First events transition from the synthetic '_START'
  // state. Scale: one shuffle for the per-user lag window, one for the
  // (prev, next) count; the output is |event types|^2-bounded however
  // large the stream, and the probability normalization runs on that
  // tiny aggregate, not the events.
  val e5TransitionMatrix = withOracle(
    "e5_transition_matrix",
    """WITH o AS (
      |  SELECT user_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id
      |                               ORDER BY ts, event_id) AS prev
      |  FROM events),
      |t AS (
      |  SELECT coalesce(prev, '_START') AS prev_type,
      |         event_type AS next_type,
      |         CAST(count(*) AS BIGINT) AS n_transitions
      |  FROM o GROUP BY 1, 2)
      |SELECT prev_type, next_type, n_transitions,
      |       CAST(n_transitions AS DOUBLE)
      |         / CAST(sum(n_transitions) OVER (PARTITION BY prev_type)
      |                AS DOUBLE) AS p
      |FROM t""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val seq = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val counts = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(seq))
      .groupBy(coalesce(col("prev"), lit("_START")).as("prev_type"),
        col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
    counts.withColumn("p", col("n_transitions").cast("double")
      / sum(col("n_transitions")).over(Window.partitionBy(col("prev_type")))
        .cast("double"))
  }

  // ---- w12: time-series gap fill (hourly spine + forward fill) ----
  // The dashboard/feature-store densification op: per user, an hourly
  // spine spans first to last activity, observed hours carry their
  // exact hourly sum (DECIMAL partials -> double), and gaps forward-
  // fill the last observed value (last_value IGNORE NULLS over an
  // unbounded-preceding frame). 95,604 of 105,171 spine rows are filled
  // gaps at sf0.01 — the fill path dominates. Scale: the spine is the
  // OUTPUT (dense series is the point), generated per user by one
  // sequence() expression — users x hours rows, no shuffle beyond the
  // per-user window; the hourly aggregate rides one shuffle.
  val w12ForwardFill = withOracle(
    "w12_forward_fill",
    """WITH e AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h,
      |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS hv
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM e GROUP BY 1),
      |spine AS (
      |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      |  FROM b),
      |j AS (
      |  SELECT s.user_id, s.h, e.hv FROM spine s
      |  LEFT JOIN e ON e.user_id = s.user_id AND e.h = s.h),
      |f AS (
      |  SELECT user_id, h, hv,
      |         last_value(hv IGNORE NULLS) OVER (
      |           PARTITION BY user_id ORDER BY h
      |           ROWS UNBOUNDED PRECEDING) AS filled
      |  FROM j)
      |SELECT user_id, CAST(epoch_ns(h) // 1000 AS BIGINT) AS hour_us,
      |       hv, filled
      |FROM f""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, d)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("hv"))
    val spine = e.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("h"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(e, Seq("user_id", "h"), "left")
      .withColumn("filled", last(col("hv"), ignoreNulls = true).over(w))
      .select(col("user_id"), unix_micros(col("h")).as("hour_us"),
        col("hv"), col("filled"))
  }

  // ---- e6: RFM customer segmentation ----
  // The e-commerce consumption-layer staple: per customer, Recency
  // (days since last order, against the corpus max date), Frequency
  // (order count) and Monetary (exact DECIMAL revenue sum), each cut
  // into quartiles by ntile(4) over a TOTAL order (metric + custkey
  // tie-break, so every quartile is engine-deterministic), composed
  // into the classic 3-digit segment code. The quartile windows are
  // global by definition — at 100 TB the cut points would come from a
  // broadcast percentile sketch (t12's shape) instead of a single-
  // partition window; the oracle needs the exact ntile, so this entry
  // keeps it (customers are 2-3 orders of magnitude fewer than orders).
  val e6RfmSegments = withOracle(
    "e6_rfm_segments",
    """WITH mx AS (SELECT max(o_orderdate) AS maxd FROM orders),
      |c AS (
      |  SELECT o_custkey,
      |         CAST(date_diff('day', max(o_orderdate), mx.maxd) AS BIGINT)
      |           AS r_days,
      |         CAST(count(*) AS BIGINT) AS n_orders,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |           AS monetary
      |  FROM orders, mx GROUP BY o_custkey, mx.maxd),
      |q AS (
      |  SELECT o_custkey, r_days, n_orders, monetary,
      |         CAST(ntile(4) OVER (ORDER BY r_days, o_custkey) AS BIGINT)
      |           AS r_q,
      |         CAST(ntile(4) OVER (ORDER BY n_orders DESC, o_custkey)
      |              AS BIGINT) AS f_q,
      |         CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey)
      |              AS BIGINT) AS m_q
      |  FROM c)
      |SELECT o_custkey, r_days, n_orders, monetary, r_q, f_q, m_q,
      |       r_q * 100 + f_q * 10 + m_q AS segment
      |FROM q""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.orders(s, d)
    val mx = orders.agg(max(col("o_orderdate")).as("maxd"))
    val c = orders.crossJoin(broadcast(mx))
      .groupBy(col("o_custkey"), col("maxd"))
      .agg(datediff(max(col("maxd")), max(col("o_orderdate")))
        .cast("long").as("r_days"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("monetary"))
    c.select(col("o_custkey"), col("r_days"), col("n_orders"),
        col("monetary"),
        ntile(4).over(Window.orderBy(col("r_days"), col("o_custkey")))
          .cast("long").as("r_q"),
        ntile(4).over(Window.orderBy(col("n_orders").desc, col("o_custkey")))
          .cast("long").as("f_q"),
        ntile(4).over(Window.orderBy(col("monetary").desc, col("o_custkey")))
          .cast("long").as("m_q"))
      .withColumn("segment",
        col("r_q") * 100 + col("f_q") * 10 + col("m_q"))
  }

  // ---- w13: M4 time-series downsampling ----
  /** The M4 aggregation (Jugel et al., VLDB 2014 — public literature):
    * per (series, time-bin) keep min, max, FIRST and LAST value — the
    * lossless-for-rendering downsample every monitoring/observability
    * store runs before charting, and the cheapest way to shrink a
    * 100 TB event stream to a plot-sized frame without losing spikes.
    * Series = event_type, bin = 15 minutes of event time (exact BIGINT
    * microsecond arithmetic, no date truncation ambiguity). First/last
    * are made total by the (ts, event_id) tie-break — same-timestamp
    * rows would otherwise make them engine-dependent. Scale: ONE
    * shuffle on (event_type, bin); both row_number windows and the
    * final hash-agg ride that same clustering (the windows' partition
    * keys equal the group-by keys, so Catalyst inserts no second
    * exchange); min/max/count come partial-aggregated map-side.
    */
  val w13M4Downsample = withOracle(
    "w13_m4_downsample",
    """WITH e AS (
      |  SELECT event_type, epoch_us(ts) AS tus, value, event_id
      |  FROM events),
      |b AS (SELECT event_type, tus // 900000000 AS bin, tus, value,
      |             event_id
      |      FROM e),
      |r AS (SELECT event_type, bin, value,
      |        row_number() OVER (PARTITION BY event_type, bin
      |                           ORDER BY tus, event_id) AS rn_a,
      |        row_number() OVER (PARTITION BY event_type, bin
      |                           ORDER BY tus DESC, event_id DESC) AS rn_d
      |      FROM b),
      |g AS (SELECT event_type, bin, count(*) AS n,
      |        min(value) AS v_min, max(value) AS v_max,
      |        max(CASE WHEN rn_a = 1 THEN value END) AS v_first,
      |        max(CASE WHEN rn_d = 1 THEN value END) AS v_last
      |      FROM r GROUP BY 1, 2)
      |SELECT event_type, CAST(bin * 900000000 AS BIGINT) AS bin_start_us,
      |       CAST(n AS BIGINT) AS n, v_min, v_max, v_first, v_last
      |FROM g""".stripMargin) { (s, d) =>
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("bin"))
      .orderBy(col("tus"), col("event_id"))
    val wD = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("bin"))
      .orderBy(col("tus").desc, col("event_id").desc)
    Tables.events(s, d)
      .select(col("event_type"), unix_micros(col("ts")).as("tus"),
        col("value"), col("event_id"))
      .withColumn("bin", expr("tus div 900000000"))
      .withColumn("rn_a", row_number().over(wA))
      .withColumn("rn_d", row_number().over(wD))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("v_min"),
        max(col("value")).as("v_max"),
        max(when(col("rn_a") === 1, col("value"))).as("v_first"),
        max(when(col("rn_d") === 1, col("value"))).as("v_last"))
      .select(col("event_type"),
        (col("bin") * 900000000L).as("bin_start_us"),
        col("n"), col("v_min"), col("v_max"), col("v_first"),
        col("v_last"))
  }

  // ---- w14: rolling-baseline anomaly detection ----
  /** The monitoring staple the reference's dashboards imply but never
    * compute: flag an event whose value exceeds 2x its OWN user's
    * trailing-20-event mean. The baseline frame is
    * `ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING` — strictly past, so
    * the flagged value never contaminates its own baseline, and the
    * detector is streamable (st-family could carry the same state).
    * Determinism: the frame sum runs in DECIMAL (order-independent,
    * exact), count is exact, and the single double division + compare
    * is IEEE-identical on both engines; rows with fewer than 10 prior
    * events are never flagged (cold-start guard), keeping the boolean
    * total. Scale: ONE shuffle on user_id (high cardinality — never
    * the 5-value event_type), O(20) frame state per row, no join.
    */
  /** THE one copy of the rolling-anomaly oracle — w14 (batch) and
    * st19 (streaming ring-buffer state) both gate on it; a threshold or
    * frame edit in one that missed the other would otherwise drift. */
  private[queries] val RollingAnomalyOracle: String =
    """WITH o AS (
      |  SELECT user_id, event_id, ts, value,
      |         CAST(count(*) OVER w AS BIGINT) AS n_base,
      |         CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
      |           AS base_sum
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
      |SELECT event_id, user_id,
      |       CAST(epoch_ns(ts) // 1000 AS BIGINT) AS t_us,
      |       value, n_base, base_sum,
      |       CASE WHEN n_base >= 10
      |            THEN value > 2.0 * (base_sum / CAST(n_base AS DOUBLE))
      |            ELSE false END AS is_anomaly
      |FROM o""".stripMargin

  val w14RollingAnomaly = withOracle(
    "w14_rolling_anomaly",
    RollingAnomalyOracle) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-20, -1)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("n_base", count(lit(1)).over(w))
      .withColumn("base_sum",
        sum(col("value").cast("decimal(18,6)")).over(w).cast("double"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t_us"),
        col("value"), col("n_base"), col("base_sum"),
        when(col("n_base") >= 10,
          col("value") > lit(2.0) *
            (col("base_sum") / col("n_base").cast("double")))
          .otherwise(lit(false)).as("is_anomaly"))
  }

  // ---- e7: last-touch marketing attribution ----
  /** Attribution without a join: each purchase credits the most recent
    * click/view by the same user at-or-before it (in the total
    * (ts, event_id) order), provided the touch is within a 7-day
    * lookback. The carried touch rides `last(..., ignoreNulls)` over an
    * unbounded-preceding frame — the forward-fill trick (w12) applied
    * to attribution, so the purchase<->touch pairing needs NO as-of
    * join and NO self-join: one user_id shuffle, one window pass, then
    * a filter. Purchases with no in-window touch report 'none' (the
    * direct-traffic bucket) with NULL id/gap. At 100 TB this is the
    * shape that survives: the alternative as-of join re-shuffles both
    * sides; this carries O(1) state per user through one sort.
    */
  val e7Attribution = withOracle(
    "e7_attribution",
    """WITH o AS (
      |  SELECT user_id, event_id, ts, event_type, value,
      |         last_value(CASE WHEN event_type IN ('click', 'view')
      |                         THEN event_id END IGNORE NULLS)
      |           OVER w AS t_id,
      |         last_value(CASE WHEN event_type IN ('click', 'view')
      |                         THEN event_type END IGNORE NULLS)
      |           OVER w AS t_type,
      |         last_value(CASE WHEN event_type IN ('click', 'view')
      |                         THEN ts END IGNORE NULLS)
      |           OVER w AS t_ts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS UNBOUNDED PRECEDING)),
      |p AS (
      |  SELECT user_id, event_id, ts, value, t_id, t_type,
      |         epoch_ns(ts) // 1000 - epoch_ns(t_ts) // 1000 AS gap_us
      |  FROM o WHERE event_type = 'purchase')
      |SELECT event_id AS purchase_id, user_id,
      |       CAST(epoch_ns(ts) // 1000 AS BIGINT) AS purchase_us, value,
      |       CASE WHEN gap_us <= 604800000000 THEN t_id END AS touch_id,
      |       coalesce(CASE WHEN gap_us <= 604800000000 THEN t_type END,
      |                'none') AS touch_type,
      |       CAST(CASE WHEN gap_us <= 604800000000 THEN gap_us END
      |            AS BIGINT) AS gap_us
      |FROM p""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val isTouch = col("event_type").isin("click", "view")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val SevenDaysUs = 604800000000L
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"))
      .withColumn("t_id",
        last(when(isTouch, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("t_type",
        last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .withColumn("t_ts",
        last(when(isTouch, col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("gap0",
        unix_micros(col("ts")) - unix_micros(col("t_ts")))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"), col("value"),
        when(col("gap0") <= SevenDaysUs, col("t_id")).as("touch_id"),
        coalesce(when(col("gap0") <= SevenDaysUs, col("t_type")),
          lit("none")).as("touch_type"),
        when(col("gap0") <= SevenDaysUs, col("gap0"))
          .cast("long").as("gap_us"))
  }

  // ---- e8: linear multi-touch attribution (RANGE frame) ----
  /** The multi-touch complement to e7's last-touch carry: each purchase
    * splits its value EQUALLY across every click/view by the same user
    * in the 7-day lookback. The touch count rides a time-RANGE frame
    * (`RANGE 604800000000 PRECEDING .. CURRENT ROW` over exact
    * microseconds) — one window pass over the interleaved event stream,
    * no self-join, no as-of; the purchase row itself never counts (its
    * CASE is null). RANGE-at-CURRENT-ROW includes order-value peers on
    * both engines, so the frame semantics are engine-identical. Credit
    * is one double division (value / n). Zero-touch purchases report
    * NULL credit — the direct-traffic bucket again. Scale: one user_id
    * shuffle; frame state is bounded by the lookback's event count.
    */
  val e8LinearAttribution = withOracle(
    "e8_linear_attribution",
    """WITH o AS (
      |  SELECT user_id, event_id, event_type, value,
      |         epoch_ns(ts) // 1000 AS us
      |  FROM events),
      |w AS (
      |  SELECT *,
      |         count(CASE WHEN event_type IN ('click', 'view') THEN 1 END)
      |           OVER (PARTITION BY user_id ORDER BY us
      |                 RANGE BETWEEN 604800000000 PRECEDING
      |                           AND CURRENT ROW) AS n_touches
      |  FROM o)
      |SELECT event_id AS purchase_id, user_id,
      |       CAST(us AS BIGINT) AS purchase_us, value,
      |       CAST(n_touches AS BIGINT) AS n_touches,
      |       CASE WHEN n_touches > 0
      |            THEN value / CAST(n_touches AS DOUBLE) END
      |         AS credit_per_touch
      |FROM w WHERE event_type = 'purchase'""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val isTouch = col("event_type").isin("click", "view")
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-604800000000L, 0L)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("us"))
      .withColumn("n_touches", count(when(isTouch, 1)).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("us").as("purchase_us"), col("value"),
        col("n_touches"),
        when(col("n_touches") > 0,
          col("value") / col("n_touches").cast("double"))
          .as("credit_per_touch"))
  }

  // ---- j22: FULL OUTER source reconciliation ----
  /** The one join type the catalog lacked, in its canonical data-eng
    * role: reconciling two overlapping copies of a feed (a migration
    * cutover, a vendor re-delivery, u8's merge-sync precursor). FULL
    * OUTER on the key, then a disposition per key: match / value
    * mismatch / left-only / right-only, with the coalesced value a
    * downstream consumer would take. Null-safe by construction — the
    * presence flags come from key nullability on each side, never from
    * value columns (a legitimately-NULL value must not read as
    * "absent"). Scale: one shuffle per side on the join key; the
    * disposition is a projection.
    */
  val j22FullOuter = withOracle(
    "j22_full_outer",
    """WITH a AS (
      |  SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS total_a
      |  FROM orders WHERE o_orderkey % 3 <> 0),
      |b AS (
      |  SELECT o_orderkey AS k,
      |         CAST(o_totalprice AS DOUBLE)
      |           + CASE WHEN o_orderkey % 5 = 0 THEN 1.0 ELSE 0.0 END
      |           AS total_b
      |  FROM orders WHERE o_orderkey % 2 <> 0)
      |SELECT coalesce(a.k, b.k) AS o_orderkey,
      |       a.k IS NOT NULL AS in_a,
      |       b.k IS NOT NULL AS in_b,
      |       total_a, total_b,
      |       CASE WHEN a.k IS NULL THEN 'b_only'
      |            WHEN b.k IS NULL THEN 'a_only'
      |            WHEN total_a = total_b THEN 'match'
      |            ELSE 'mismatch' END AS disposition,
      |       coalesce(total_b, total_a) AS reconciled
      |FROM a FULL OUTER JOIN b ON a.k = b.k""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d)
    val a = base.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey").as("ka"),
        col("o_totalprice").cast("double").as("total_a"))
    val b = base.filter(col("o_orderkey") % 2 =!= 0)
      .select(col("o_orderkey").as("kb"),
        (col("o_totalprice").cast("double") +
          when(col("o_orderkey") % 5 === 0, 1.0).otherwise(0.0))
          .as("total_b"))
    a.join(b, col("ka") === col("kb"), "full_outer")
      .select(coalesce(col("ka"), col("kb")).as("o_orderkey"),
        col("ka").isNotNull.as("in_a"),
        col("kb").isNotNull.as("in_b"),
        col("total_a"), col("total_b"),
        when(col("ka").isNull, "b_only")
          .when(col("kb").isNull, "a_only")
          .when(col("total_a") === col("total_b"), "match")
          .otherwise("mismatch").as("disposition"),
        coalesce(col("total_b"), col("total_a")).as("reconciled"))
  }

  // ---- w15: time-series gap fill by LINEAR INTERPOLATION ----
  /** w12's forward fill holds the last value flat through a gap; the
    * feature-store / sensor-series alternative is linear interpolation
    * between the surrounding observations (pandas' interpolate()).
    * Same hourly spine as w12; interior gaps get
    *   prev + (next - prev) * (t - t_prev) / (t_next - t_prev)
    * and LEADING/TRAILING gaps stay null (no extrapolation — the
    * standard contract, and the observable difference from w12).
    *
    * Determinism: hourly sums are DECIMAL(18,6) scaled to BIGINT
    * micro-units, the interpolation is BIGINT arithmetic with `div`
    * throughout — Spark's `div` and DuckDB's `//` BOTH truncate toward
    * zero (verified including negative numerators, which (next-prev)
    * produces on any falling series), so the engines agree bit-for-bit
    * with no float anywhere.
    *
    * Scale: one shuffle for the hourly aggregate, then TWO running-
    * frame window passes over the same user_id partitioning — the
    * backward carry ascending, the forward carry as a running frame
    * over DESCENDING hour order. The forward carry must NOT be the
    * "natural" `first(...) over (ROWS CURRENT..UNBOUNDED FOLLOWING)`:
    * Spark executes unbounded-FOLLOWING frames by re-scanning the
    * partition remainder for EVERY row (UnboundedFollowingWindow-
    * FunctionFrame), O(rows²) per partition — measured 28.5 s at
    * sf0.1 vs 1.0 s for this desc-running shape, and quadratic means
    * a 100 TB partition never finishes. A running (unbounded-
    * PRECEDING) frame is streaming, O(rows); the second sort is the
    * price and it's the cheap one. PlanSpec pins the absence of any
    * unbounded-following frame.
    */
  val w15Interpolate = withOracle(
    "w15_interpolate",
    """WITH e AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h,
      |         CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)
      |           AS hvm
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM e GROUP BY 1),
      |spine AS (
      |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      |  FROM b),
      |j AS (
      |  SELECT s.user_id, s.h,
      |         CAST(epoch_ns(s.h) // 3600000000000 AS BIGINT) AS k, e.hvm
      |  FROM spine s LEFT JOIN e ON e.user_id = s.user_id AND e.h = s.h),
      |f AS (
      |  SELECT user_id, h, k, hvm,
      |         last_value(hvm IGNORE NULLS) OVER past AS pv,
      |         last_value(CASE WHEN hvm IS NOT NULL THEN k END IGNORE NULLS)
      |           OVER past AS pk,
      |         first_value(hvm IGNORE NULLS) OVER fut AS nv,
      |         first_value(CASE WHEN hvm IS NOT NULL THEN k END IGNORE NULLS)
      |           OVER fut AS nk
      |  FROM j
      |  WINDOW past AS (PARTITION BY user_id ORDER BY h
      |                  ROWS UNBOUNDED PRECEDING),
      |         fut AS (PARTITION BY user_id ORDER BY h
      |                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT user_id, CAST(epoch_ns(h) // 1000 AS BIGINT) AS hour_us, hvm,
      |       CASE WHEN hvm IS NOT NULL THEN hvm
      |            WHEN pv IS NOT NULL AND nv IS NOT NULL
      |            THEN pv + ((nv - pv) * (k - pk)) // (nk - pk)
      |            END AS interp_micros
      |FROM f""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, d)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 1000000)
        .cast("long").as("hvm"))
    val spine = e.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("h"))
    val past = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The forward carry, expressed as a RUNNING frame over desc order:
    // at each row it yields the most recent non-null seen scanning from
    // the partition's largest h down to (and including) this row — i.e.
    // the next observed value at h' >= h. Same answer as
    // first(..., ignoreNulls) over CURRENT..UNBOUNDED FOLLOWING, O(n)
    // instead of O(n²) (see the scaladoc).
    val futDesc = Window.partitionBy(col("user_id")).orderBy(col("h").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(e, Seq("user_id", "h"), "left")
      .withColumn("k", expr("unix_micros(h) div 3600000000"))
      // Pre-project the masked hour index: bare-column window args let
      // CollapseWindow fuse same-ordering carries into one Window node
      // (an inline when() forces a projection between windows).
      .withColumn("mk", when(col("hvm").isNotNull, col("k")))
      .withColumn("pv", last(col("hvm"), ignoreNulls = true).over(past))
      .withColumn("pk", last(col("mk"), ignoreNulls = true).over(past))
      .withColumn("nv", last(col("hvm"), ignoreNulls = true).over(futDesc))
      .withColumn("nk", last(col("mk"), ignoreNulls = true).over(futDesc))
      .select(col("user_id"), unix_micros(col("h")).as("hour_us"),
        col("hvm"),
        when(col("hvm").isNotNull, col("hvm"))
          .when(col("pv").isNotNull && col("nv").isNotNull,
            col("pv") + expr("((nv - pv) * (k - pk)) div (nk - pk)"))
          .as("interp_micros"))
  }

  // ---- w16: month-over-month growth (the BI trend staple) ----
  /** Monthly revenue with month-over-month growth — the consumption-
    * layer KPI every revenue dashboard leads with. Revenue sums as
    * DECIMAL cents (exact, order-independent); growth is expressed in
    * BASIS POINTS as BIGINT — `(cur - prev) * 10000 div prev` — so the
    * engines agree bit-for-bit (both truncate toward zero, negative
    * deltas included; a double ratio would hash-diverge on summation
    * order). First month's growth is null (no prior). Scale: one
    * month-grain aggregate (map-side partials) and a lag window over
    * |months| rows — the window input is the AGGREGATE, not the fact
    * table, so the single-partition global window is bounded by the
    * calendar, not the data (the e6 rationale).
    */
  val w16MomGrowth = withOracle(
    "w16_mom_growth",
    """WITH m AS (
      |  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
      |              AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |g AS (
      |  SELECT month, rev_cents,
      |         lag(rev_cents) OVER (ORDER BY month) AS prev_cents
      |  FROM m)
      |SELECT month, CAST(rev_cents AS DOUBLE) / 100 AS revenue,
      |       CASE WHEN prev_cents IS NOT NULL
      |            THEN ((rev_cents - prev_cents) * 10000) // prev_cents
      |            END AS growth_bps
      |FROM g""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val m = Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate").cast("date"), "yyyy-MM")
        .as("month"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long").as("rev_cents"))
    m.withColumn("prev_cents",
        lag(col("rev_cents"), 1).over(Window.orderBy(col("month"))))
      .select(col("month"),
        (col("rev_cents").cast("double") / 100).as("revenue"),
        when(col("prev_cents").isNotNull,
          expr("((rev_cents - prev_cents) * 10000) div prev_cents"))
          .as("growth_bps"))
  }

  val specs: Seq[QuerySpec] =
    Seq(j17Lateral, j18CorrelatedAgg, f7ArrayHof, e2Sessionize, u5MergeDelete,
      u8MergeSync, f10TryArithmetic, w9SessionWindow, f8StringFuncs,
      w10ValuePick, e3Funnel, j19IntervalOverlap, e4RetentionCohorts,
      w11EventPattern, e5TransitionMatrix, w12ForwardFill, e6RfmSegments,
      w13M4Downsample, w14RollingAnomaly, e7Attribution,
      e8LinearAttribution, j22FullOuter, w15Interpolate, w16MomGrowth)
}
