package graft.queries

import graft.Tables
import graft.streaming.Streaming
import org.apache.spark.sql.functions._

/** Batch twins of the streaming jobs (SURVEY.md §2.7 stretch slot): the
  * same logical plans run under `readStream` in production; here they run
  * over the batch events table so the DuckDB oracle can check them.
  */
object StreamingQueries extends QueryModule {

  val defs: Seq[QueryDef] = Seq(
    // ── Per-day KMV distinct sketch, streamed (the mergeable-sketch ×
    //    streaming marriage: the SAME bounded-heap topk_pairs aggregate
    //    that powers agg_theta_sketch_setops runs as a stateful
    //    streaming aggregation — micro-batch state merges are the
    //    sketch's union, proven against this one-shot batch twin in
    //    StreamingSpec): K=32 smallest md5 hashes per day, est =
    //    (K−1)·(2⁵²/θ), exact per-day distincts as audit. O(days·K)
    //    state at any corpus size. ─────────────────────────────────────
    QueryDef("streaming_distinct_kmv",
      (s, dir) => Streaming.kmvDailyDistinct(Tables.load(s, dir, "events")),
      Some("""WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, user_id,
      ((strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[1]) - 1) * 281474976710656 + (strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[2]) - 1) * 17592186044416 + (strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[3]) - 1) * 1099511627776 + (strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[4]) - 1) * 68719476736 + (strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[5]) - 1) * 4294967296 + (strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[6]) - 1) * 268435456 + (strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[7]) - 1) * 16777216 + (strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[8]) - 1) * 1048576 + (strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[9]) - 1) * 65536 + (strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[10]) - 1) * 4096 + (strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[11]) - 1) * 256 + (strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[12]) - 1) * 16 + (strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[13]) - 1) * 1) AS h FROM events),
  dh AS (SELECT DISTINCT day, h FROM e),
  ranked AS (SELECT day, h,
      row_number() OVER (PARTITION BY day ORDER BY h) AS rn,
      count(*) OVER (PARTITION BY day) AS nd FROM dh),
  kept AS (SELECT * FROM ranked WHERE rn <= 32),
  th AS (SELECT day, CAST(max(nd) AS BIGINT) AS nd,
      CAST(CASE WHEN max(nd) < 32 THEN 4503599627370496
        ELSE max(CASE WHEN rn = 32 THEN h END) END AS BIGINT) AS theta
    FROM kept GROUP BY day),
  ex AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
    FROM e GROUP BY day)
  SELECT th.day, ex.exact_users,
    CASE WHEN th.nd < 32 THEN th.nd
      ELSE CAST(floor(31 * (4503599627370496.0 / th.theta)) AS BIGINT) END
      AS est_users,
    th.theta,
    CAST(abs(CASE WHEN th.nd < 32 THEN th.nd
        ELSE CAST(floor(31 * (4503599627370496.0 / th.theta)) AS BIGINT) END
      - ex.exact_users) * 1000000 // greatest(ex.exact_users, 1) AS BIGINT)
      AS err_ppm
  FROM th JOIN ex USING (day) ORDER BY day""")),

    QueryDef("streaming_tumbling_counts",
      (s, dir) => Streaming.tumblingEventCounts(Tables.load(s, dir, "events"))
        .orderBy("window_start", "event_type"),
      Some("""SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
          event_type, count(*) AS n_events
        FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""")),

    // Sliding windows (2h window, 1h slide — every event in exactly two
    // epoch-aligned windows); the oracle materializes both window starts
    // per event and re-aggregates.
    QueryDef("streaming_sliding_counts",
      (s, dir) => Streaming.slidingEventCounts(Tables.load(s, dir, "events"))
        .orderBy("window_start", "event_type"),
      Some("""WITH e AS (SELECT event_type,
            CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS h
          FROM events),
        w AS (SELECT event_type, unnest([h, h - INTERVAL 1 HOUR]) AS ws FROM e)
        SELECT ws AS window_start, ws + INTERVAL 2 HOUR AS window_end,
          event_type, count(*) AS n_events
        FROM w GROUP BY 1, 2, 3 ORDER BY window_start, event_type""")),

    // Windowed top-k ("top event types this hour"): tumbling counts plus
    // a window-partitioned rank. The streaming form ranks each
    // micro-batch's updated counts in foreachBatch over the tiny
    // per-window count table (StreamingSpec pins parity with this twin).
    QueryDef("streaming_topk",
      (s, dir) => Streaming.topEventTypesPerWindow(
          Tables.load(s, dir, "events"), k = 3)
        .orderBy("window_start", "rank"),
      Some("""WITH c AS (SELECT
            CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
            event_type, count(*) AS n_events
          FROM events GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (PARTITION BY window_start
            ORDER BY n_events DESC, event_type) AS rk FROM c)
        SELECT window_start, event_type, n_events, CAST(rk AS INTEGER) AS rank
        FROM r WHERE rk <= 3 ORDER BY window_start, rank""")),

    QueryDef("streaming_user_totals",
      (s, dir) => Streaming.userValueTotals(
          Tables.load(s, dir, "events").filter(col("user_id") < 50))
        .orderBy("user_id"),
      Some("""SELECT user_id, count(*) AS n_events,
          CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total_value
        FROM events WHERE user_id < 50 GROUP BY user_id ORDER BY user_id""")),

    // Per-key EWMA batch twin (α=1/2, event_id order). The streaming
    // path is mapGroupsWithState with one (ewma, n, last-id) triple per
    // user and an idempotent-replay guard; StreamingSpec pins a
    // MemoryStream run equal to this plan, and this row anchors the
    // shared arithmetic to DuckDB's list_reduce fold bit-for-bit.
    QueryDef("streaming_ewma",
      (s, dir) => Streaming.ewmaPerUser(
          Tables.load(s, dir, "events").filter(col("user_id") < 50))
        .orderBy("user_id"),
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
          list_reduce(list(value ORDER BY event_id),
            (a, b) -> a * CAST(0.5 AS DOUBLE) + b * CAST(0.5 AS DOUBLE)) AS ewma
        FROM events WHERE user_id < 50 GROUP BY user_id ORDER BY user_id""")),

    // CUSUM drift batch twin (fixed target 10 000 cents, alarm at
    // 200 000): the deployable streaming form of `window_cusum_drift` —
    // a live monitor takes its reference level as a parameter, not from
    // a global mean it can't see. The streaming path is
    // mapGroupsWithState with one (S, peak, n, last-id) BIGINT tuple per
    // user and the idempotent-replay guard; StreamingSpec pins a
    // MemoryStream run equal to this plan, and this row anchors the
    // shared integer recurrence to DuckDB exactly.
    QueryDef("streaming_cusum",
      (s, dir) => Streaming.cusumPerUser(
          Tables.load(s, dir, "events"), targetCents = 10000L,
          alarmCents = 200000L)
        .orderBy("user_id"),
      Some("""WITH e AS (SELECT user_id, event_id,
            CAST(round(value * 100) AS BIGINT) AS v_cents FROM events),
        c AS (SELECT user_id, event_id,
            CAST(sum(v_cents - 10000) OVER (PARTITION BY user_id
              ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM e),
        m AS (SELECT user_id, cum,
            min(cum) OVER (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin
          FROM c)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
          CAST(max(cum - least(CAST(0 AS BIGINT), runmin)) AS BIGINT)
            AS peak_cusum_cents,
          CAST(max(CASE WHEN cum - least(CAST(0 AS BIGINT), runmin) > 200000
            THEN 1 ELSE 0 END) AS BIGINT) AS alarm
        FROM m GROUP BY user_id ORDER BY user_id""")),

    // Sessionization batch twin (6h inactivity gap). The streaming path
    // (flatMapGroupsWithState, event-time timeout) is asserted equal to
    // this plan in StreamingSpec — this row anchors both to DuckDB.
    QueryDef("streaming_sessionization",
      (s, dir) => Streaming.sessionize(Tables.load(s, dir, "events"), gapMinutes = 360)
        .orderBy("user_id", "session_start"),
      Some("""WITH e AS (
          SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        f AS (SELECT user_id, event_id, ts,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts - lag(ts) OVER w) > 21600 THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        g AS (SELECT user_id, ts,
            sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS sidx
          FROM f)
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
          count(*) AS n_events
        FROM g GROUP BY user_id, sidx ORDER BY user_id, session_start""")),

    // Streaming exact dedup: a doubled corpus collapses back to the
    // original through dropDuplicates on the event id (streaming form:
    // dropDuplicatesWithinWatermark, asserted in StreamingSpec).
    QueryDef("streaming_dedup",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        Streaming.dedupEvents(ev.unionByName(ev))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(20,2)")).cast("double").as("value_sum"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS value_sum
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // Per-user event-type cardinality — batch twin of the MapState
    // transformWithState processor (StreamingSpec pins last-snapshot
    // parity against a MemoryStream run of the same processor).
    QueryDef("streaming_user_event_types",
      (s, dir) => Streaming.userEventTypeCounts(Tables.load(s, dir, "events")),
      Some("""SELECT user_id, count(DISTINCT event_type) AS n_types,
          count(*) AS n_events
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // Per-user last-3 event buffer — batch twin of the ListState
    // transformWithState processor (StreamingSpec pins last-snapshot
    // parity against a MemoryStream run).
    QueryDef("streaming_user_recent_events",
      (s, dir) => Streaming.userRecentEvents(Tables.load(s, dir, "events")),
      Some("""WITH r AS (SELECT user_id, event_id,
            row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          FROM events)
        SELECT user_id, count(*) AS n_recent,
          CAST(sum(event_id) AS BIGINT) AS sum_recent,
          max(event_id) AS max_recent
        FROM r WHERE rn <= 3 GROUP BY user_id ORDER BY user_id""")),

    // CDC upsert/delete apply — the change-feed → snapshot MERGE shape.
    // The events table plays a change feed (op = D on event_id % 11,
    // else U); the snapshot keeps each key's latest-by-event_id change
    // and drops keys whose latest is a delete. Batch form is ONE
    // argmax-by-struct hash aggregate (no window); the streaming form
    // (transformWithState ValueState, larger-id-wins) converges to the
    // same snapshot under any micro-batch split — StreamingSpec parity.
    QueryDef("streaming_cdc_upsert",
      (s, dir) => Streaming.cdcSnapshot(
        Tables.load(s, dir, "events").select(
          col("user_id"), col("event_id"),
          when(col("event_id") % 11 === 0, "D").otherwise("U").as("op"),
          col("value"))),
      Some("""WITH c AS (SELECT user_id, event_id,
            CASE WHEN event_id % 11 = 0 THEN 'D' ELSE 'U' END AS op, value
          FROM events),
        l AS (SELECT user_id, max(event_id) AS last_event_id
          FROM c GROUP BY user_id)
        SELECT c.user_id, c.event_id AS last_event_id, c.value AS last_value
        FROM c JOIN l ON c.user_id = l.user_id AND c.event_id = l.last_event_id
        WHERE c.op <> 'D' ORDER BY c.user_id""")),

    // Watermark late-data admission (drop iff window end ≤ watermark at
    // arrival; StreamingSpec pins the rule against a live MemoryStream).
    // The in-order synthetic stream gets a deterministic arrival
    // permutation — batch = event_id DIV 8, every 5th event 3 batches
    // late — replayed identically by the oracle's integer arithmetic.
    QueryDef("streaming_late_drop",
      (s, dir) => Streaming.lateDropTumblingCounts(Tables.load(s, dir, "events"))
        .orderBy("window_start", "event_type"),
      Some("""WITH e AS (SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
            (event_id // 8) + (CASE WHEN event_id % 5 = 0 THEN 3 ELSE 0 END) AS b
          FROM events),
        m AS (SELECT *, max(epoch_us(ts)) OVER
            (ORDER BY b RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            - 600000000 AS wm
          FROM e),
        k AS (SELECT * FROM m WHERE wm IS NULL
            OR epoch_us(date_trunc('hour', ts)) + 3600000000 > wm)
        SELECT date_trunc('hour', ts) AS window_start, event_type,
          count(*) AS n_events
        FROM k GROUP BY 1, 2 ORDER BY window_start, event_type""")),

    // Native session_window aggregation (gap-merged sessions) — must
    // produce the same sessions as the flatMapGroupsWithState /
    // window-function implementations; session_end is max(ts), not the
    // window's gap-extended end, so all three share one oracle shape.
    QueryDef("streaming_session_window_native",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "events")
          .groupBy($"user_id", session_window($"ts", "6 hours"))
          .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
            count(lit(1)).as("n_events"))
          .select($"user_id", $"session_start", $"session_end", $"n_events")
          .orderBy($"user_id", $"session_start")
      },
      Some("""WITH e AS (
          SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        f AS (SELECT user_id, event_id, ts,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts - lag(ts) OVER w) > 21600 THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        g AS (SELECT user_id, ts,
            sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS sidx
          FROM f)
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
          count(*) AS n_events
        FROM g GROUP BY user_id, sidx ORDER BY user_id, session_start""")),

    // Stream-static enrichment: the stream joins a broadcast dimension
    // (no stream-side shuffle); batch twin anchored to DuckDB,
    // streaming parity in StreamingSpec.
    QueryDef("streaming_enrich_dim",
      (s, dir) => {
        import s.implicits._
        val weights = Seq(("click", 1.0), ("view", 0.5), ("purchase", 5.0),
          ("signup", 2.0), ("error", 0.0)).toDF("event_type", "weight")
        Streaming.enrichWithDim(
            Tables.load(s, dir, "events").select($"event_id", $"event_type"),
            weights, "event_type")
          .groupBy($"event_type", $"weight")
          .agg(count(lit(1)).as("n"))
          .orderBy($"event_type")
      },
      Some("""SELECT e.event_type, w.weight, count(*) AS n
        FROM events e LEFT JOIN (VALUES
          ('click', CAST(1.0 AS DOUBLE)), ('view', CAST(0.5 AS DOUBLE)),
          ('purchase', CAST(5.0 AS DOUBLE)), ('signup', CAST(2.0 AS DOUBLE)),
          ('error', CAST(0.0 AS DOUBLE))) w(event_type, weight)
          ON e.event_type = w.event_type
        GROUP BY e.event_type, w.weight ORDER BY e.event_type""")),

    // Stream-stream interval join: clicks ⋈ same-user purchases within
    // 30 minutes — the double-watermark join whose time-interval bound
    // is what keeps streaming state finite. Batch twin anchored to
    // DuckDB; streaming parity (MemoryStream both sides) in
    // StreamingSpec. `value` carries ≤ 2 decimals → decimal-exact sum.
    QueryDef("streaming_interval_join",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.load(s, dir, "events")
        Streaming.intervalJoin(
            ev.filter($"event_type" === "click"),
            ev.filter($"event_type" === "purchase"), intervalMin = 30)
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct($"user_id").as("n_users"),
            sum($"purchase_value".cast("decimal(20,2)")).cast("double")
              .as("total_purchase_value"))
      },
      Some("""SELECT count(*) AS n_pairs,
          count(DISTINCT l.user_id) AS n_users,
          CAST(sum(CAST(r.value AS DECIMAL(20,2))) AS DOUBLE) AS total_purchase_value
        FROM events l JOIN events r
          ON r.user_id = l.user_id
          AND l.event_type = 'click' AND r.event_type = 'purchase'
          AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTE"""))
    ,

    // Left-OUTER stream-stream interval join: clicks that never convert
    // inside the window survive null-padded (in streaming they emit once
    // the watermark proves no match can still arrive — StreamingSpec).
    QueryDef("streaming_interval_join_outer",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.load(s, dir, "events")
        Streaming.intervalJoinOuter(
            ev.filter($"event_type" === "click"),
            ev.filter($"event_type" === "purchase"), intervalMin = 30)
          .agg(count(lit(1)).as("n_rows"),
            count($"purchase_id").as("n_matched"),
            sum(when($"purchase_id".isNull, 1L).otherwise(0L)).as("n_unmatched"),
            sum($"purchase_value".cast("decimal(20,2)")).cast("double")
              .as("total_purchase_value"))
      },
      Some("""WITH l AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
          r AS (SELECT user_id, event_id AS purchase_id, ts, value FROM events
            WHERE event_type = 'purchase')
        SELECT count(*) AS n_rows,
          count(r.purchase_id) AS n_matched,
          CAST(sum(CASE WHEN r.purchase_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched,
          CAST(sum(CAST(r.value AS DECIMAL(20,2))) AS DOUBLE) AS total_purchase_value
        FROM l LEFT JOIN r
          ON r.user_id = l.user_id
          AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTE""")),

    // Per-user funnel stage — batch twin of the mapGroupsWithState
    // funnel automaton (Streaming.funnelStageStream; StreamingSpec pins
    // snapshot parity for time-monotone arrival). Same stage machine as
    // window_funnel_stages, per-user rows instead of the histogram.
    QueryDef("streaming_funnel_stage",
      (s, dir) => graft.operators.Funnel.userStages(
          Tables.load(s, dir, "events"))
        .orderBy("user_id"),
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
            epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        w1 AS (SELECT *, max(CASE WHEN event_type = 'view' THEN t END) OVER
            (PARTITION BY user_id ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS last_view
          FROM e),
        w2 AS (SELECT *, CASE WHEN event_type = 'click' AND last_view IS NOT NULL
            AND t - last_view <= 3600000000 THEN t END AS qc FROM w1),
        w3 AS (SELECT *, max(qc) OVER
            (PARTITION BY user_id ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS last_qc
          FROM w2),
        w4 AS (SELECT *, CASE WHEN event_type = 'purchase' AND last_qc IS NOT NULL
            AND t - last_qc <= 86400000000 THEN 1 ELSE 0 END AS qp FROM w3)
        SELECT user_id, CAST(max(CASE WHEN qp = 1 THEN 3
            WHEN qc IS NOT NULL THEN 2
            WHEN event_type = 'view' THEN 1 ELSE 0 END) AS INTEGER) AS stage
        FROM w4 GROUP BY user_id ORDER BY user_id""")),

    // OHLC candles — batch twin of the mapGroupsWithState candle state
    // (Streaming.ohlcPerKeyStream; StreamingSpec pins snapshot parity
    // including out-of-order cross-batch arrival, which the candle's
    // order-independent min_by/max_by merge tolerates where the
    // EWMA/CUSUM recurrences can't). Same aggregation as
    // window_ohlc_bars, shaped through the shared Streaming.ohlcPerKey.
    QueryDef("streaming_ohlc",
      (s, dir) => Streaming.ohlcPerKey(
          Tables.load(s, dir, "events").selectExpr("user_id",
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d",
            "event_id", "unix_micros(ts) AS tsm",
            "CAST(round(value * 100) AS BIGINT) AS c"))
        .orderBy("user_id", "d"),
      Some("""WITH t AS (SELECT user_id,
            CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
            CAST(round(value * 100) AS BIGINT) AS c,
            lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
              || lpad(CAST(event_id AS VARCHAR), 10, '0') AS k
          FROM events)
        SELECT user_id, d, arg_min(c, k) AS open_cents,
          max(c) AS high_cents, min(c) AS low_cents,
          arg_max(c, k) AS close_cents,
          CAST(count(*) AS BIGINT) AS n_events,
          CAST(sum(c) AS BIGINT) AS volume_cents
        FROM t GROUP BY user_id, d ORDER BY user_id, d"""))
  )
}
