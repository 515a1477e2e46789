package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.multimodal.Multimodal
import graft.streaming.Streams

/** Multimodal feature-extraction and Structured-Streaming queries.
  *
  * The multimodal oracle exploits that the test corpus is ASCII: the
  * UTF-8 payload bytes equal the code points, so DuckDB can recompute
  * the stubbed codec's block means exactly (same integer sums, same
  * double division) without any binary support.
  *
  * The streaming oracles are the batch equivalents: every streaming
  * output here is closed under end-of-stream (complete-mode windows,
  * final per-key states, key sets), so batch SQL over the same input is
  * the exact expected value regardless of micro-batch boundaries.
  */
object PipelineQueries {

  import QuerySpec._

  // ---- m1: binary media column -> partition-batched feature extraction ----
  val m1MediaFeatures = withOracle(
    "m1_media_features",
    """WITH b AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n,
      |         list_transform(list_filter(string_split(text, ''),
      |                                    c -> length(c) > 0),
      |                        c -> CAST(ascii(c) AS BIGINT)) AS cps
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(n AS BIGINT) AS n_bytes,
      |       CAST((n + 63) // 64 AS BIGINT) AS n_blocks,
      |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), cps),
      |                        (a, b) -> a + b) AS DOUBLE)
      |         / CAST(n AS DOUBLE) AS mean_byte,
      |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |                                     cps[1:least(n, 64)]),
      |                        (a, b) -> a + b) AS DOUBLE)
      |         / CAST(least(n, 64) AS DOUBLE) AS first_block_mean
      |FROM b""".stripMargin) { (s, d) =>
    Multimodal.extractFeatures(s,
      Multimodal.attachMedia(Tables.documents(s, d))).toDF()
  }

  // ---- m2: frame sampling + pooled resize (1 row -> n frame rows) ----
  // Same ASCII-payload trick as m1: the oracle recomputes every sampled
  // frame's equal-split pool means with identical integer bucket bounds
  // (j*fb//4) and the same sum/len double division.
  val m2FrameSample = withOracle(
    "m2_frame_sample",
    """WITH b AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n,
      |         list_transform(list_filter(string_split(text, ''),
      |                                    c -> length(c) > 0),
      |                        c -> CAST(ascii(c) AS BIGINT)) AS cps
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, n, cps,
      |         unnest(list_filter(range(0, CAST((n + 63) // 64 AS BIGINT)),
      |                            i -> i % 4 = 0)) AS frame_idx
      |  FROM b),
      |g AS (
      |  SELECT doc_id, frame_idx,
      |         CAST(frame_idx * 64 AS BIGINT) AS s,
      |         CAST(least(n, frame_idx * 64 + 64) AS BIGINT) AS e, cps
      |  FROM f),
      |p AS (
      |  SELECT doc_id, frame_idx, e - s AS fb,
      |         [CASE WHEN (j + 1) * (e - s) // 4 > j * (e - s) // 4
      |               THEN CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |                      cps[CAST(s + j * (e - s) // 4 + 1 AS BIGINT)
      |                          :CAST(s + (j + 1) * (e - s) // 4 AS BIGINT)]),
      |                      (a, b) -> a + b) AS DOUBLE)
      |                    / CAST((j + 1) * (e - s) // 4
      |                           - j * (e - s) // 4 AS DOUBLE)
      |               ELSE 0.0 END
      |          FOR j IN [0, 1, 2, 3]] AS pools
      |  FROM g)
      |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |       CAST(fb AS BIGINT) AS frame_bytes,
      |       pools[1] AS p0, pools[2] AS p1,
      |       pools[3] AS p2, pools[4] AS p3
      |FROM p""".stripMargin) { (s, d) =>
    Multimodal.extractFrames(s,
      Multimodal.attachMedia(Tables.documents(s, d))).toDF()
  }

  // ---- m4: perceptual-hash media dedup (the image-aHash shape) ----
  // Each payload hashes to a 64-bit aHash (block mean vs global mean,
  // exact integer cross-products — see Multimodal.PerceptualHash) and
  // identical codes bucket perceptually-same media: one shuffle on the
  // code, no pairwise comparison anywhere, the survivor rule is
  // min-doc_id per bucket — the media twin of d1's exact text dedup,
  // robust to the small payload perturbations a cryptographic hash
  // would scatter. The oracle replays the hash bit-for-bit via the
  // ASCII-payload trick (bit 63's weight is BIGINT min, the two's-
  // complement packing lshCodeSql also uses).
  val m4PhashDedup = withOracle(
    "m4_phash_dedup",
    """WITH b AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n,
      |         list_transform(list_filter(string_split(text, ''),
      |                                    c -> length(c) > 0),
      |                        c -> CAST(ascii(c) AS BIGINT)) AS cps
      |  FROM documents),
      |t AS (
      |  SELECT doc_id, n, cps,
      |         list_reduce(list_prepend(CAST(0 AS BIGINT), cps),
      |                     (a, b) -> a + b) AS tsum
      |  FROM b),
      |bv AS (
      |  SELECT doc_id, n, tsum, cps,
      |         CAST(j AS BIGINT) AS j,
      |         j * n // 64 AS s, (j + 1) * n // 64 AS e
      |  FROM t, unnest(range(0, 64)) AS u(j)),
      |bw AS (
      |  SELECT doc_id,
      |    CASE WHEN e > s AND
      |      list_reduce(list_prepend(CAST(0 AS BIGINT),
      |                               cps[CAST(s + 1 AS BIGINT)
      |                                   :CAST(e AS BIGINT)]),
      |                  (a, b) -> a + b) * n >= tsum * (e - s)
      |    THEN CASE WHEN j = 63 THEN (-9223372036854775807 - 1)
      |              ELSE (CAST(1 AS BIGINT) << j) END
      |    ELSE CAST(0 AS BIGINT) END AS w
      |  FROM bv),
      |ph AS (
      |  SELECT doc_id, CAST(sum(w) AS BIGINT) AS phash
      |  FROM bw GROUP BY 1)
      |SELECT doc_id, phash,
      |       CAST(count(*) OVER (PARTITION BY phash) AS BIGINT) AS n_same,
      |       doc_id = min(doc_id) OVER (PARTITION BY phash) AS keep
      |FROM ph""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("phash"))
    Multimodal.perceptualHashes(s,
        Multimodal.attachMedia(Tables.documents(s, d))).toDF()
      .withColumn("n_same", count(lit(1)).over(w))
      .withColumn("keep", col("doc_id") === min(col("doc_id")).over(w))
  }

  // ---- m3: cross-modal consistency scoring (the CLIP-filter shape) ----
  // Pair each document's TEXT-side embedding with its MEDIA-side pooled
  // feature vector (frame 0 of the m2 pipeline) and score the pair by
  // cosine agreement; the bottom-k lowest-agreement pairs are the
  // mismatch candidates a multimodal curation pass drops. The cosine
  // runs over an explicit 4-term chain (fixed add/mul order, sqrt is
  // correctly-rounded IEEE — engine-exact doubles); the embedding side
  // reads only the 4-component prefix the media vector is compared
  // against. Scale: per-row codec + one equi-join on doc id + a
  // TakeOrderedAndProject bottom-k — no shuffle beyond the join.
  val m3CrossModal = withOracle(
    "m3_cross_modal",
    """WITH b AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n,
      |         list_transform(list_filter(string_split(text, ''),
      |                                    c -> length(c) > 0),
      |                        c -> CAST(ascii(c) AS BIGINT)) AS cps
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, CAST(least(n, 64) AS BIGINT) AS e, cps FROM b),
      |p AS (
      |  SELECT doc_id,
      |         [CASE WHEN (j + 1) * e // 4 > j * e // 4
      |               THEN CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |                      cps[CAST(j * e // 4 + 1 AS BIGINT)
      |                          :CAST((j + 1) * e // 4 AS BIGINT)]),
      |                      (a, b) -> a + b) AS DOUBLE)
      |                    / CAST((j + 1) * e // 4 - j * e // 4 AS DOUBLE)
      |               ELSE 0.0 END
      |          FOR j IN [0, 1, 2, 3]] AS m
      |  FROM g),
      |j AS (
      |  SELECT p.doc_id, p.m,
      |         [CAST(emb.embedding[1] AS DOUBLE), CAST(emb.embedding[2] AS DOUBLE),
      |          CAST(emb.embedding[3] AS DOUBLE), CAST(emb.embedding[4] AS DOUBLE)] AS v
      |  FROM p JOIN embeddings emb ON p.doc_id = emb.vec_id),
      |sc AS (
      |  SELECT doc_id,
      |         (((m[1] * v[1] + m[2] * v[2]) + m[3] * v[3]) + m[4] * v[4])
      |           / (sqrt(((m[1] * m[1] + m[2] * m[2]) + m[3] * m[3]) + m[4] * m[4])
      |              * sqrt(((v[1] * v[1] + v[2] * v[2]) + v[3] * v[3]) + v[4] * v[4]))
      |           AS agreement
      |  FROM j
      |  WHERE sqrt(((m[1] * m[1] + m[2] * m[2]) + m[3] * m[3]) + m[4] * m[4]) > 0.0
      |    AND sqrt(((v[1] * v[1] + v[2] * v[2]) + v[3] * v[3]) + v[4] * v[4]) > 0.0),
      |bot AS (SELECT * FROM sc ORDER BY agreement, doc_id LIMIT 20)
      |SELECT doc_id, agreement,
      |       CAST(row_number() OVER (ORDER BY agreement, doc_id) AS BIGINT)
      |         AS rnk
      |FROM bot""".stripMargin) { (s, d) =>
    def fsqrt(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.functions.sqrt(c)
    val frames = Multimodal.extractFrames(s,
      Multimodal.attachMedia(Tables.documents(s, d))).toDF()
      .filter(col("frame_idx") === 0)
      .select(col("doc_id"), col("p0"), col("p1"), col("p2"), col("p3"))
    val emb = Tables.embeddings(s, d) // the one loader that knows encodings
      .select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("v0"),
        element_at(col("embedding"), 2).cast("double").as("v1"),
        element_at(col("embedding"), 3).cast("double").as("v2"),
        element_at(col("embedding"), 4).cast("double").as("v3"))
    val dot = ((col("p0") * col("v0") + col("p1") * col("v1"))
      + col("p2") * col("v2")) + col("p3") * col("v3")
    val nm = fsqrt(((col("p0") * col("p0") + col("p1") * col("p1"))
      + col("p2") * col("p2")) + col("p3") * col("p3"))
    val nv = fsqrt(((col("v0") * col("v0") + col("v1") * col("v1"))
      + col("v2") * col("v2")) + col("v3") * col("v3"))
    val sc = frames.join(emb, col("doc_id") === col("vec_id"))
      .filter(nm > 0.0 && nv > 0.0)
      .select(col("doc_id"), (dot / (nm * nv)).as("agreement"))
    sc.orderBy(col("agreement"), col("doc_id")).limit(20)
      .withColumn("rnk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("agreement"), col("doc_id"))).cast("long"))
  }

  // ---- st1: tumbling event-time window aggregate (complete mode) ----
  /** Shared hourly-aggregate oracle: st1 (single batch) and st11 (multi
    * micro-batch) must agree with the SAME convention — one string, so a
    * format/scale tweak can't silently decouple the invariant st11 tests.
    */
  private val HourlyOracleSql =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1""".stripMargin

  val st1HourlyAgg = withOracle(
    "st1_stream_hourly",
    HourlyOracleSql) { (s, d) =>
    Streams.hourlyAgg(s, d)
  }

  // ---- st10: sliding-window aggregate ----
  // 2h windows sliding hourly: every event contributes to exactly two
  // windows (floor-hour and floor-hour minus 1h, epoch-aligned) — the
  // oracle unnests that assignment explicitly.
  val st10Sliding = withOracle(
    "st10_stream_sliding",
    """WITH e AS (SELECT epoch_ns(ts) // 1000 AS us, value FROM events),
      |w AS (SELECT (us // 3600000000) * 3600000000 - k * 3600000000
      |               AS window_start_us,
      |             value
      |      FROM e, (SELECT unnest([0, 1]) AS k) kk)
      |SELECT CAST(window_start_us AS BIGINT) AS window_start_us,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM w GROUP BY 1""".stripMargin) { (s, d) =>
    Streams.slidingHourly(s, d)
  }

  // ---- st11: the same hourly aggregate through MANY micro-batches ----
  // Source split into 8 files, maxFilesPerTrigger=2 → 4 incremental
  // batches updating window state; the end state must equal st1's
  // single-batch run AND the batch oracle — the invariant that makes
  // incremental processing trustworthy.
  val st11MultiBatch = withOracle(
    "st11_stream_multibatch",
    HourlyOracleSql) { (s, d) =>
    Streams.multiBatchHourly(s, d)
  }

  // ---- st4: watermarked windowed aggregate (append mode) ----
  // Only watermark-closed windows are emitted. The oracle recomputes the
  // final watermark (max event time in MILLISECONDS, as Spark tracks it,
  // minus the 2h delay) and keeps windows whose end <= watermark.
  val st4Watermarked = withOracle(
    "st4_stream_watermark",
    """WITH e AS (SELECT epoch_ns(ts) // 1000 AS tus FROM events),
      |wm AS (SELECT (max(tus) // 1000) * 1000 - 7200000000 AS wm_us FROM e),
      |w AS (SELECT (tus // 3600000000) * 3600000000 AS h_us,
      |             count(*) AS n_events
      |      FROM e GROUP BY 1)
      |SELECT strftime(make_timestamp(h_us), '%Y-%m-%d %H:%M:%S') AS hour_start,
      |       CAST(n_events AS BIGINT) AS n_events
      |FROM w, wm WHERE h_us + 3600000000 <= wm_us""".stripMargin) { (s, d) =>
    Streams.watermarkedHourly(s, d)
  }

  // ---- st5: watermarked stream-stream join (reference J2) ----
  val st5StreamJoin = withOracle(
    "st5_stream_join",
    """WITH p AS (SELECT event_id AS purchase_id, user_id,
      |                  epoch_ns(ts) // 1000 AS p_us
      |           FROM events WHERE event_type = 'purchase'),
      |s AS (SELECT event_id AS signup_id, user_id,
      |             epoch_ns(ts) // 1000 AS s_us
      |      FROM events WHERE event_type = 'signup')
      |SELECT p.purchase_id, s.signup_id, p.user_id,
      |       CAST(p.p_us - s.s_us AS BIGINT) AS lag_us
      |FROM p JOIN s ON p.user_id = s.user_id
      | AND p.p_us >= s.s_us AND p.p_us - s.s_us <= 86400000000""".stripMargin) {
    (s, d) => Streams.streamStreamJoin(s, d)
  }

  // ---- st14: LEFT-OUTER stream-stream join (watermark-proven no-match) ----
  // Signups null-extend once the watermark proves no purchase can still
  // match ("did the signup convert" needs a definitive no). The source
  // runs through 4 time-ordered micro-batches so the watermark actually
  // overtakes held state; the closing no-data batch flushes against the
  // final watermark min(max s_ts, max p_ts) - 1h (ms-floored, as Spark
  // tracks it). Signups in the open tail — expiry s_ts + 24h not yet
  // behind that watermark — are retained in state, not emitted, and the
  // oracle reproduces that boundary exactly.
  val st14StreamLeftJoin = withOracle(
    "st14_stream_left_join",
    """WITH s AS (SELECT event_id AS signup_id, user_id,
      |                  epoch_ns(ts) // 1000 AS s_us
      |           FROM events WHERE event_type = 'signup'),
      |p AS (SELECT event_id AS purchase_id, user_id,
      |             epoch_ns(ts) // 1000 AS p_us
      |      FROM events WHERE event_type = 'purchase'),
      |m AS (SELECT s.signup_id, p.purchase_id, s.user_id,
      |             CAST(p.p_us - s.s_us AS BIGINT) AS lag_us
      |      FROM s JOIN p ON s.user_id = p.user_id
      |        AND p.p_us >= s.s_us AND p.p_us - s.s_us <= 86400000000),
      |wm AS (SELECT least((SELECT (max(s_us) // 1000) * 1000 FROM s),
      |                    (SELECT (max(p_us) // 1000) * 1000 FROM p))
      |              - 3600000000 AS wm_us),
      |u AS (SELECT s.signup_id, CAST(NULL AS BIGINT) AS purchase_id,
      |             s.user_id, CAST(NULL AS BIGINT) AS lag_us
      |      FROM s, wm
      |      WHERE s.s_us + 86400000000 < wm.wm_us
      |        AND NOT EXISTS (SELECT 1 FROM m WHERE m.signup_id = s.signup_id))
      |SELECT * FROM m UNION ALL SELECT * FROM u""".stripMargin) {
    (s, d) => Streams.streamStreamLeftJoin(s, d)
  }

  // ---- st15: flatMapGroupsWithState + event-time timeout ----
  // Watermark-clocked session close-out: a per-user state machine emits
  // one record per closed session, closed either by a >= 4h successor
  // gap or by the EVENT-TIME TIMEOUT proving the user went idle. The
  // oracle is gaps-and-islands with the same 4h break, keeping the last
  // session per user only when the final watermark (ms-floored max
  // event time - 1h) passed its idle deadline.
  private val SessionTimeoutOracle =
    """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events),
      |wm AS (SELECT (max(us) // 1000) * 1000 - 3600000000 AS wm_us FROM e),
      |d AS (SELECT user_id, us,
      |             CASE WHEN lag(us) OVER w IS NULL
      |                  OR us - lag(us) OVER w >= 14400000000
      |                  THEN 1 ELSE 0 END AS brk
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
      |s AS (SELECT user_id, us,
      |             sum(brk) OVER (PARTITION BY user_id ORDER BY us
      |                            ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM d),
      |g AS (SELECT user_id, sid,
      |             CAST(min(us) AS BIGINT) AS session_start_us,
      |             CAST(max(us) AS BIGINT) AS session_last_us,
      |             CAST(count(*) AS BIGINT) AS n_events
      |      FROM s GROUP BY 1, 2),
      |last AS (SELECT user_id, max(sid) AS max_sid FROM g GROUP BY 1)
      |SELECT g.user_id, g.session_start_us, g.session_last_us, g.n_events
      |FROM g JOIN last USING (user_id), wm
      |WHERE g.sid < last.max_sid
      |   OR (g.session_last_us // 1000) * 1000 + 14400000000 < wm.wm_us""".stripMargin

  val st15SessionTimeout = withOracle(
    "st15_session_timeout", SessionTimeoutOracle) {
    (s, d) => Streams.sessionTimeout(s, d)
  }

  // ---- st16: the SAME close-out on Spark 4's transformWithState ----
  // Typed state handles + explicit per-key event-time TIMERS on a
  // RocksDB state store — the arbitrary-stateful-processing successor
  // API. Shares st15's oracle verbatim: two independent state-machine
  // implementations must emit the identical set.
  val st16SessionTimeoutTws = withOracle(
    "st16_session_timeout_tws", SessionTimeoutOracle) {
    (s, d) => Streams.sessionTimeoutTws(s, d)
  }

  // ---- st19: streaming rolling-baseline anomaly alerts ----
  // The live twin of w14: a per-user ring of the <=20 most recent
  // values (exact micro-grid integers) carried across micro-batches
  // emits an alert when a value exceeds 2x its trailing mean of >= 10
  // strictly-prior events. One oracle gates batch and stream: this is
  // w14's shared SQL filtered to its anomaly rows, so the streaming
  // replay must reproduce the batch window's flag set exactly.
  val st19StreamAnomaly = withOracle(
    "st19_stream_anomaly",
    s"""SELECT event_id, user_id, t_us, value, n_base, base_sum
       |FROM (${Relational3.RollingAnomalyOracle})
       |WHERE is_anomaly""".stripMargin) { (s, d) =>
    Streams.streamAnomaly(s, d)
      .select(col("event_id"), col("user_id"), col("t_us"),
        col("value"), col("n_base"), col("base_sum"))
  }

  // ---- st2: stateful streaming dedup ----
  val st2StreamDedup = withOracle(
    "st2_stream_dedup",
    "SELECT DISTINCT user_id, event_type FROM events") { (s, d) =>
    Streams.streamDedup(s, d)
  }

  // ---- st3: custom state via mapGroupsWithState ----
  val st3Stateful = withOracle(
    "st3_stream_stateful",
    """SELECT user_id,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(max(value) AS DOUBLE) AS max_value
      |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
    Streams.statefulCounts(s, d)
  }

  // ---- st8: WATERMARKED streaming dedup (state-bounded) ----
  val st8StreamDedupWm = withOracle(
    "st8_stream_dedup_wm",
    "SELECT DISTINCT user_id, event_type FROM events") { (s, d) =>
    Streams.streamDedupWatermarked(s, d)
  }

  // ---- st7: session windows (8h inactivity gap, complete mode) ----
  // Oracle: gaps-and-islands — a session breaks where the per-user
  // spacing reaches the gap (>= matches session_window's strict-overlap
  // merge), session end = last event + gap. Micros arithmetic mirrors
  // the ns -> us floor division of the stream reader.
  val st7SessionWindow = withOracle(
    "st7_stream_session",
    """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, value
      |           FROM events),
      |d AS (SELECT user_id, us, value,
      |             CASE WHEN lag(us) OVER w IS NULL
      |                  OR us - lag(us) OVER w >= 28800000000
      |                  THEN 1 ELSE 0 END AS brk
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
      |s AS (SELECT user_id, us, value,
      |             sum(brk) OVER (PARTITION BY user_id ORDER BY us
      |                            ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM d)
      |SELECT user_id,
      |       CAST(min(us) AS BIGINT) AS session_start_us,
      |       CAST(max(us) + 28800000000 AS BIGINT) AS session_end_us,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, sid""".stripMargin) { (s, d) =>
    Streams.sessionAgg(s, d)
  }

  // ---- st9: stream-static broadcast join + complete-mode agg ----
  // The streaming fact enriched by a batch dimension (the reference's
  // silver streams against static lookups). Stateless join — only the
  // downstream aggregate holds state. Batch-deterministic: the final
  // complete-mode emission aggregates the whole input.
  val st9StreamStatic = withOracle(
    "st9_stream_static",
    """SELECT c.c_nationkey,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1""".stripMargin) { (s, d) =>
    Streams.streamStaticJoin(s, d)
  }

  // ---- st12: CDC apply (the DLT APPLY CHANGES INTO shape) ----
  // The event stream as a keyed change feed, MERGE-applied per
  // micro-batch with SEQUENCE ordering (ts, event_id) and 'error' as
  // the APPLY-AS-DELETE marker. Micro-batches are deliberately
  // time-shuffled (round-robin file split), so matching the batch
  // latest-per-key oracle proves the out-of-order CDC contract.
  val st12ApplyChanges = withOracle(
    "st12_apply_changes",
    """WITH r AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |         row_number() OVER (PARTITION BY user_id
      |             ORDER BY epoch_ns(ts) // 1000 DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us,
      |       event_id, event_type, value
      |FROM r WHERE rn = 1 AND event_type <> 'error'""".stripMargin) { (s, d) =>
    Streams.applyChanges(s, d)
  }

  // ---- st22: streaming upsert through the SQL MERGE surface ----
  // [[graft.streaming.Streams.streamMergeSql]]: the Databricks
  // `foreachBatch { MERGE INTO }` idiom verbatim — each time-ordered
  // micro-batch reduces to latest-per-key, the SQL upsert arm applies
  // live rows and the WHEN MATCHED DELETE arm applies 'error'
  // (apply-as-delete) markers, every statement an atomic snapshot
  // version. Same latest-non-error-per-key semantics as st12 (which
  // proves the out-of-order contract with a hand-built staged rewrite;
  // here the arrival axis is time-ordered and the subject is the SQL
  // surface composing with the commit protocol).
  val st22StreamMergeSql = withOracle(
    "st22_stream_merge_sql",
    """WITH r AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |         row_number() OVER (PARTITION BY user_id
      |             ORDER BY epoch_ns(ts) // 1000 DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us,
      |       event_id, event_type, value
      |FROM r WHERE rn = 1 AND event_type <> 'error'""".stripMargin) {
    (s, d) => Streams.streamMergeSql(s, d)
  }

  // ---- st13: CDC apply, SCD TYPE 2 (APPLY CHANGES … STORED AS SCD 2) ----
  // Full change history with [valid_from, valid_to) sequence intervals;
  // 'error' rows are APPLY-AS-DELETE markers that close the preceding
  // version's interval and are absent from the history themselves. The
  // time-shuffled micro-batches (round-robin file split) force the
  // out-of-order rebuild path — matching the batch windowed oracle
  // proves per-batch touched-key history rewrites converge to it.
  val st13Scd2 = withOracle(
    "st13_apply_scd2",
    """WITH c AS (
      |  SELECT user_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS valid_from_us,
      |         event_id, event_type, value
      |  FROM events),
      |h AS (
      |  SELECT user_id, valid_from_us, event_id, event_type, value,
      |         lead(valid_from_us) OVER (PARTITION BY user_id
      |             ORDER BY valid_from_us, event_id) AS valid_to_us
      |  FROM c)
      |SELECT user_id, valid_from_us, valid_to_us,
      |       event_id, event_type, value,
      |       valid_to_us IS NULL AS is_current
      |FROM h WHERE event_type <> 'error'""".stripMargin) { (s, d) =>
    Streams.applyChangesScd2(s, d)
  }

  // ---- m5: VAD-style audio segmentation (1 row -> n voiced segments) ----
  // [[graft.multimodal.Multimodal.segmentAudio]]: energy-gated run
  // detection over 64-byte frames of the stubbed payload; the activity
  // gate compares integers (fsum >= 96*flen), so the oracle's replay is
  // bit-exact. 430 segments over 313 of 500 sf0.01 docs (runs up to 4
  // frames); 187 docs emit nothing — both paths exercised.
  val m5AudioSegments = withOracle(
    "m5_audio_segments",
    """WITH b AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n,
      |         list_transform(list_filter(string_split(text, ''),
      |                                    c -> length(c) > 0),
      |                        c -> CAST(ascii(c) AS BIGINT)) AS cps
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS fidx,
      |         list_reduce(list_prepend(CAST(0 AS BIGINT),
      |                                  cps[i*64+1:least(n,(i+1)*64)]),
      |                     (a,x) -> a + x) AS fsum,
      |         CAST(least(n, (i+1)*64) - i*64 AS BIGINT) AS flen
      |  FROM b, unnest(range(0, (n+63)//64)) u(i)),
      |a AS (SELECT *, (fsum >= 96*flen) AS active FROM f),
      |g AS (SELECT *, CASE WHEN active AND (lag(active) OVER w IS NULL
      |                                      OR NOT lag(active) OVER w)
      |                     THEN 1 ELSE 0 END AS brk
      |      FROM a WINDOW w AS (PARTITION BY doc_id ORDER BY fidx)),
      |s AS (SELECT *, sum(brk) OVER (PARTITION BY doc_id ORDER BY fidx
      |                               ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM g),
      |seg AS (SELECT doc_id, sid, min(fidx) AS start_f, max(fidx) AS end_f,
      |               CAST(count(*) AS BIGINT) AS n_frames,
      |               CAST(sum(fsum) AS DOUBLE) / CAST(sum(flen) AS DOUBLE)
      |                 AS mean_energy
      |        FROM s WHERE active GROUP BY doc_id, sid)
      |SELECT doc_id,
      |       CAST(row_number() OVER (PARTITION BY doc_id
      |                               ORDER BY start_f) AS BIGINT) AS seg_idx,
      |       start_f, end_f, n_frames, mean_energy
      |FROM seg""".stripMargin) { (s, d) =>
    Multimodal.segmentAudio(s,
      Multimodal.attachMedia(Tables.documents(s, d))).toDF()
  }

  // ---- st17: streaming content-dedup admission gate ----
  // [[graft.streaming.Streams.streamDedupGate]]: first-wins ingest dedup
  // keyed on the rolling hash of the leading 15-token window (the head
  // shingle — 23/500 sf0.01 docs collide, so the reject path is
  // exercised), explicit admit state via flatMapGroupsWithState,
  // doc_id-ordered micro-batches. Oracle: admitted = min(doc_id) per fp.
  val st17DedupGate = withOracle(
    "st17_stream_dedup_gate",
    s"""WITH t AS (
       |  SELECT doc_id,
       |         array_to_string(list_filter(
       |           string_split_regex(trim(coalesce(text, '')), ' +'),
       |           x -> length(x) > 0)[1:15], ' ') AS head
       |  FROM documents)
       |SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
       |       CAST(${QuerySpec.OracleSql.rollHash("head")} AS BIGINT) AS fp
       |FROM t GROUP BY 2""".stripMargin) { (s, d) =>
    Streams.streamDedupGate(s, d)
  }

  // ---- st18: streaming observed metrics ----
  // [[graft.streaming.Streams.streamObservedMetrics]]: per-micro-batch
  // CollectMetrics counters folded into job totals — dq2's streaming
  // half. DECIMAL partials make the totals batching-independent.
  val st18StreamObserve = withOracle(
    "st18_stream_observe",
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
      |       CAST(max(user_id) AS BIGINT) AS max_user
      |FROM events""".stripMargin) { (s, d) =>
    Streams.streamObservedMetrics(s, d)
  }

  // ---- m6: multimodal sequence interleave (text chunks x frames) ----
  /** The multimodal training-sequence assembly step: each document's
    * text chunks (t10's 40-token/30-stride windows) and sampled media
    * frames (m2's every-4th-64-byte-block rule) are interleaved
    * text-first into ONE ordered sequence per document — exactly the
    * layout an image-text interleaved pretraining batch uses, with
    * media priced at a FIXED 16 "vision tokens" per frame (the
    * patch-budget convention) and each element stamped with its
    * running token offset so a packer can cut sequences on budget.
    * The interleave is closed-form — text chunk i lands at position
    * `i + min(i, F)`, frame j at `j + min(j+1, T)` (T text chunks, F
    * frames) — so no per-doc iteration exists anywhere: both sides are
    * explode + pure arithmetic, and the only shuffle is the per-doc
    * window that assigns running offsets (token budgeting is inherently
    * sequential WITHIN a doc, parallel across docs). The two branches
    * are separate column-pruned scans (tokens vs byte length) united
    * before the window — at 100 TB both scans are map-side-only and
    * the window's doc_id clustering is the single exchange.
    */
  // ---- m7: shot detection (cut segmentation over frame signatures) ----
  /** The video-curation step between m2's frame sampling and a real
    * keyframe selector: every frame gets an 8-bit per-chunk-vs-frame-
    * mean signature (exact integer cross-products — see
    * [[graft.multimodal.Multimodal.ShotDetector]]), consecutive frames
    * compare by signature Hamming distance, and a distance >= 3 opens a
    * new SHOT (gaps-and-islands over the cut flags). Output is one row
    * per shot with its start frame and length — the unit a sampler
    * would draw keyframes from. Scale: the codec pass is partition-
    * batched iterator work (frames never materialize per document);
    * the lag/cut/segment windows all ride ONE (doc_id) exchange, and
    * the final per-shot aggregate shares that clustering.
    */
  val m7ShotDetection = withOracle(
    "m7_shot_detection", {
      def chunkSum(j: Int): String =
        s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
           |  cps[CAST(s + $j * fb // 8 + 1 AS BIGINT)
           |      :CAST(s + ${j + 1} * fb // 8 AS BIGINT)]),
           |  (a, b) -> a + b)""".stripMargin
      val sigBits = (0 until 8).map { j =>
        s"""CASE WHEN ${j + 1} * fb // 8 > $j * fb // 8 AND
           |  ${chunkSum(j)} * fb >= fsum * (${j + 1} * fb // 8 - $j * fb // 8)
           |THEN ${1L << j} ELSE 0 END""".stripMargin
      }.mkString("(", " + ", ")")
      s"""WITH b AS (
         |  SELECT doc_id, octet_length(encode(text)) AS n,
         |         list_transform(list_filter(string_split(text, ''),
         |                                    c -> length(c) > 0),
         |                        c -> CAST(ascii(c) AS BIGINT)) AS cps
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, cps, CAST(i AS BIGINT) AS frame_idx,
         |         CAST(i * 64 AS BIGINT) AS s,
         |         CAST(least(n, i * 64 + 64) AS BIGINT) AS e
         |  FROM b, unnest(range(0, CAST((n + 63) // 64 AS BIGINT))) AS u(i)),
         |fs AS (
         |  SELECT doc_id, frame_idx, s, e - s AS fb, cps,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |                                  cps[s + 1:e]),
         |                     (a, b) -> a + b) AS fsum
         |  FROM f),
         |sg AS (SELECT doc_id, frame_idx, $sigBits AS sig FROM fs),
         |d AS (
         |  SELECT doc_id, frame_idx, sig,
         |         lag(sig) OVER (PARTITION BY doc_id ORDER BY frame_idx)
         |           AS prev
         |  FROM sg),
         |c AS (
         |  SELECT doc_id, frame_idx,
         |         CASE WHEN prev IS NULL OR bit_count(xor(sig, prev)) >= 3
         |              THEN 1 ELSE 0 END AS is_cut
         |  FROM d),
         |s2 AS (
         |  SELECT doc_id, frame_idx,
         |         sum(is_cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
         |                           ROWS UNBOUNDED PRECEDING) AS shot_id
         |  FROM c)
         |SELECT doc_id, CAST(shot_id AS BIGINT) AS shot_id,
         |       CAST(min(frame_idx) AS BIGINT) AS start_frame,
         |       CAST(count(*) AS BIGINT) AS n_frames
         |FROM s2 GROUP BY 1, 2""".stripMargin
    }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val sigs = Multimodal.frameSignatures(s,
      Multimodal.attachMedia(Tables.documents(s, d))).toDF()
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    sigs
      .withColumn("prev", lag(col("sig"), 1).over(w))
      .withColumn("is_cut",
        when(col("prev").isNull ||
          bit_count(col("sig").bitwiseXOR(col("prev"))) >= 3, 1)
          .otherwise(0))
      .withColumn("shot_id", sum(col("is_cut"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("shot_id"))
      .agg(min(col("frame_idx")).as("start_frame"),
        count(lit(1)).as("n_frames"))
      .select(col("doc_id"), col("shot_id").cast("long").as("shot_id"),
        col("start_frame"), col("n_frames"))
  }

  val m6Interleave = withOracle(
    "m6_interleave",
    """WITH b AS (
      |  SELECT doc_id,
      |         length(list_filter(string_split_regex(trim(text), ' +'),
      |                t -> length(t) > 0)) AS L,
      |         octet_length(encode(text)) AS n
      |  FROM documents),
      |m AS (SELECT doc_id, L,
      |        CASE WHEN L > 0 THEN (L - 1) // 30 + 1 ELSE 0 END AS T,
      |        ((n + 63) // 64 + 3) // 4 AS F
      |      FROM b),
      |c AS (SELECT doc_id, unnest(range(0, T)) AS item_idx, L, T, F
      |      FROM m WHERE T > 0),
      |ct AS (SELECT doc_id,
      |         CAST(item_idx + least(item_idx, F) AS BIGINT) AS pos,
      |         'text' AS kind, CAST(item_idx AS BIGINT) AS item_idx,
      |         CAST(least(40, L - item_idx * 30) AS BIGINT) AS n_tokens
      |       FROM c),
      |f AS (SELECT doc_id, unnest(range(0, F)) AS item_idx, T
      |      FROM m WHERE F > 0),
      |ft AS (SELECT doc_id,
      |         CAST(item_idx + least(item_idx + 1, T) AS BIGINT) AS pos,
      |         'media' AS kind, CAST(item_idx AS BIGINT) AS item_idx,
      |         CAST(16 AS BIGINT) AS n_tokens
      |       FROM f),
      |u AS (SELECT * FROM ct UNION ALL SELECT * FROM ft)
      |SELECT doc_id, pos, kind, item_idx, n_tokens,
      |       CAST(coalesce(sum(n_tokens) OVER (
      |              PARTITION BY doc_id ORDER BY pos
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |            0) AS BIGINT) AS seq_off
      |FROM u""".stripMargin) { (s, d) =>
    import graft.text.TextFunctions.tokens
    // Integer division: col/lit is double division in Spark — route
    // every quotient through floor() before the cast (positive args).
    val mm = Tables.documents(s, d)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("L"),
        octet_length(col("text")).cast("long").as("n"))
      .select(col("doc_id"), col("L"),
        when(col("L") > 0,
          floor((col("L") - 1) / lit(30)).cast("long") + 1)
          .otherwise(lit(0L)).as("T"),
        (floor((floor((col("n") + 63) / lit(64)) + 3) / lit(4)))
          .cast("long").as("F"))
    val ct = mm.filter(col("T") > 0)
      .select(col("doc_id"), col("L"), col("T"), col("F"),
        explode(sequence(lit(0L), col("T") - 1)).as("item_idx"))
      .select(col("doc_id"),
        (col("item_idx") + least(col("item_idx"), col("F"))).as("pos"),
        lit("text").as("kind"), col("item_idx"),
        least(lit(40L), col("L") - col("item_idx") * 30).as("n_tokens"))
    val ft = mm.filter(col("F") > 0)
      .select(col("doc_id"), col("T"),
        explode(sequence(lit(0L), col("F") - 1)).as("item_idx"))
      .select(col("doc_id"),
        (col("item_idx") + least(col("item_idx") + 1, col("T"))).as("pos"),
        lit("media").as("kind"), col("item_idx"),
        lit(16L).as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    ct.unionAll(ft)
      .withColumn("seq_off",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
  }

  // ---- st20: streaming quarantine routing (the live twin of g13) ----
  // The SAME oracle gates dq3 (plan-level tags), g13 (batch Pipeline
  // arm) and this streaming replay: four micro-batches, per-batch
  // tagged appends to `<table>__quarantine` under the main table's
  // idempotence markers — the union of both committed tables must
  // reproduce the batch split exactly regardless of batch boundaries.
  val st20StreamQuarantine = withOracle(
    "st20_stream_quarantine", Relational.QuarantineOracle) { (s, d) =>
    Streams.streamQuarantine(s, d)
  }

  // ---- st21: transactional streaming sink (exactly-once, no marker gap) ----
  // Each micro-batch is ONE atomic SnapshotCommit version: rows +
  // batch-id progress marker publish under a single pointer rename, so
  // there is no instant where the data landed but the marker didn't —
  // the crash window every non-transactional foreachBatch sink carries.
  // The final table must equal the batch oracle however the stream was
  // batched; PipelineSpec pins the replay idempotence directly.
  val st21SnapshotSink = withOracle(
    "st21_snapshot_sink",
    "SELECT event_id, user_id, event_type, value FROM events") { (s, d) =>
    Streams.streamSnapshotSink(s, d)
  }

  val specs: Seq[QuerySpec] =
    Seq(m1MediaFeatures, m2FrameSample, m3CrossModal, m4PhashDedup,
      m5AudioSegments, m6Interleave, m7ShotDetection, st1HourlyAgg,
      st2StreamDedup,
      st3Stateful, st4Watermarked, st5StreamJoin, st7SessionWindow,
      st8StreamDedupWm, st9StreamStatic, st10Sliding, st11MultiBatch,
      st12ApplyChanges, st13Scd2, st14StreamLeftJoin, st15SessionTimeout,
      st16SessionTimeoutTws, st17DedupGate, st18StreamObserve,
      st19StreamAnomaly, st20StreamQuarantine, st21SnapshotSink,
      st22StreamMergeSql)
}
