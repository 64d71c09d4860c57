package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.operators.TimeSeries

/** Continuous-time analytics over the events stream: interval coalescing,
  * calendar gap-fill with forward fill, Markov transitions, per-group
  * OLS trend. See [[graft.operators.TimeSeries]] for the scale designs.
  */
object TimeSeriesQueries {

  val defs: Seq[QueryDef] = Seq(

    // ----------------------------------------------------------------
    // Interval coalescing: each event opens a 30-minute activity
    // interval; overlapping-or-touching intervals per user merge into
    // activity islands (the interval-union twin of q42's gap
    // sessionization — q42 counts islands of POINTS, this measures the
    // union of RANGES: covered wall-clock time, which pairwise
    // subtraction can't produce when intervals nest). Exact epoch-µs
    // long arithmetic end to end.
    QueryDef(
      "q102_interval_coalesce",
      (spark, dir) => {
        val ev = Tables.events(spark, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("s"))
        TimeSeries.coalesceIntervals(
            ev, "user_id", col("s"), col("s") + lit(1800000000L))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_intervals"),
            sum(col("end_us") - col("start_us")).as("covered_us"),
            max(col("end_us") - col("start_us")).as("longest_us"))
          .orderBy(col("user_id"))
      },
      Some("""WITH iv AS (SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e FROM events),
             |o AS (SELECT user_id, s, e,
             |  MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max FROM iv),
             |b AS (SELECT user_id, s, e,
             |  CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END AS nw FROM o),
             |i AS (SELECT user_id, s, e, SUM(nw) OVER (PARTITION BY user_id ORDER BY s, e
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM b),
             |m AS (SELECT user_id, island, MIN(s) AS s, MAX(e) AS e FROM i GROUP BY user_id, island)
             |SELECT user_id, COUNT(*) AS n_intervals,
             |  CAST(SUM(e - s) AS BIGINT) AS covered_us,
             |  CAST(MAX(e - s) AS BIGINT) AS longest_us
             |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // Calendar gap-fill + forward fill: daily high-value activity per
    // event type densified onto each type's calendar span — missing days
    // surface as is_gap rows carrying the last active day and its metric
    // forward (the ≥300 filter makes the series genuinely sparse: 73 of
    // 96 spine days are gaps at sf0.01). The forward fill is a running
    // MAX over a monotone day column — portable to any engine, no
    // IGNORE NULLS dependence.
    QueryDef(
      "q103_gap_fill",
      (spark, dir) => {
        val daily = Tables.events(spark, dir)
          .filter(col("value") >= 300.0)
          .groupBy(col("event_type"),
            datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
              .cast(LongType).as("day"))
          .agg(count(lit(1)).as("n"),
            graft.operators.Aggregations.dsum(col("value"), 18, 6).as("sum_value"))
        TimeSeries.gapFillDaily(daily, "event_type", "day")
          .withColumn("n_events", coalesce(col("n"), lit(0L)))
          .join(daily.select(col("event_type"), col("day").as("last_active_day"),
            col("sum_value").as("ffill_value")),
            Seq("event_type", "last_active_day"), "left")
          .select(col("event_type"), col("day"), col("n_events"), col("is_gap"),
            col("last_active_day"), col("ffill_value"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
             |    COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |  FROM events WHERE value >= 300.0 GROUP BY event_type, day),
             |spine AS (
             |  SELECT event_type, unnest(generate_series(MIN(day), MAX(day))) AS day
             |  FROM daily GROUP BY event_type),
             |f AS (
             |  SELECT s.event_type, s.day, COALESCE(d.n, 0) AS n_events, d.n IS NULL AS is_gap,
             |    MAX(CASE WHEN d.n IS NOT NULL THEN s.day END) OVER (
             |      PARTITION BY s.event_type ORDER BY s.day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_active_day
             |  FROM spine s LEFT JOIN daily d USING (event_type, day))
             |SELECT f.event_type, f.day, f.n_events, f.is_gap, f.last_active_day,
             |  d2.sum_value AS ffill_value
             |FROM f LEFT JOIN daily d2
             |  ON f.event_type = d2.event_type AND f.last_active_day = d2.day
             |ORDER BY f.event_type, f.day""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // Interval-overlap join: each user's activity islands (q102's merged
    // intervals) joined against global error-storm periods (error events'
    // 30-min intervals, coalesced) — "how much of each user's active time
    // fell inside an error storm". The join is a bucketized EQUI-join on
    // 6 h time buckets with the exact overlap predicate on top (never a
    // BroadcastNestedLoopJoin), deduped by emitting each pair only at the
    // bucket of greatest(start, start); the oracle replays the same pairs
    // with a plain inequality join.
    QueryDef(
      "q107_overlap_join",
      (spark, dir) => {
        val ev = Tables.events(spark, dir)
        val islands = TimeSeries.coalesceIntervals(
            ev.select(col("user_id"), unix_micros(col("ts")).as("s")),
            "user_id", col("s"), col("s") + lit(1800000000L))
          .select(col("user_id"), col("start_us").as("a_start"),
            col("end_us").as("a_end"))
        val periods = TimeSeries.coalesceIntervals(
            ev.filter(col("event_type") === "error" && col("value") >= 300.0)
              .select(lit("error").as("etype"), unix_micros(col("ts")).as("s")),
            "etype", col("s"), col("s") + lit(1800000000L))
          .select(col("island").as("period_id"), col("start_us").as("p_start"),
            col("end_us").as("p_end"))
        TimeSeries.overlapJoin(islands, periods,
            "a_start", "a_end", "p_start", "p_end", bucketUs = 21600000000L)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_overlaps"),
            countDistinct(col("period_id")).as("n_periods"),
            sum(col("overlap_us")).as("overlap_total_us"))
          .orderBy(col("user_id"))
      },
      Some("""WITH iv AS (SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e FROM events),
             |o AS (SELECT user_id, s, e,
             |  MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max FROM iv),
             |i AS (SELECT user_id, s, e, SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
             |  OVER (PARTITION BY user_id ORDER BY s, e
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM o),
             |a AS (SELECT user_id, MIN(s) AS a_start, MAX(e) AS a_end FROM i GROUP BY user_id, island),
             |pv AS (SELECT epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e FROM events
             |  WHERE event_type = 'error' AND value >= 300.0),
             |po AS (SELECT s, e,
             |  MAX(e) OVER (ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max FROM pv),
             |pi AS (SELECT s, e, SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
             |  OVER (ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM po),
             |p AS (SELECT island AS period_id, MIN(s) AS p_start, MAX(e) AS p_end FROM pi GROUP BY island)
             |SELECT a.user_id, COUNT(*) AS n_overlaps,
             |  COUNT(DISTINCT p.period_id) AS n_periods,
             |  CAST(SUM(LEAST(a.a_end, p.p_end) - GREATEST(a.a_start, p.p_start)) AS BIGINT) AS overlap_total_us
             |FROM a JOIN p ON a.a_start <= p.p_end AND p.p_start <= a.a_end
             |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // First-order Markov transition matrix over each user's event
    // sequence: P(next | prev) estimated from adjacent pairs. The
    // probability crosses the oracle hash as exact integer parts-per-
    // million (integral DECIMAL division) — no floating-point bit
    // pattern is part of the comparison contract (the q122 lesson).
    QueryDef(
      "q104_markov_transitions",
      (spark, dir) =>
        TimeSeries.transitions(
            Tables.events(spark, dir), "user_id", "event_type",
            Seq(col("ts"), col("event_id")))
          .select(col("prev_state"), col("next_state"), col("n_transitions"),
            col("prob_ppm"))
          .orderBy(col("prev_state"), col("next_state")),
      Some("""WITH seq AS (SELECT user_id, event_type,
             |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
             |  FROM events),
             |c AS (SELECT prev_state, event_type AS next_state, COUNT(*) AS n_transitions
             |  FROM seq WHERE prev_state IS NOT NULL GROUP BY prev_state, event_type)
             |SELECT prev_state, next_state, n_transitions,
             |  CAST((n_transitions * 1000000) // SUM(n_transitions) OVER (PARTITION BY prev_state) AS BIGINT) AS prob_ppm
             |FROM c ORDER BY prev_state, next_state""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // Generalized as-of join, NEAREST direction with tolerance (pandas
    // merge_asof parity; q41 is the backward special case): each purchase
    // matched to the user's closest click within 2 h, either side,
    // equidistant ties resolved backward. The oracle replays the exact
    // union + two-window construction — including the tie ordering — in
    // SQL; all distances are epoch-µs integers, and sums over them and
    // over matched click ids pin the MATCHING itself, not just counts.
    QueryDef(
      "q118_asof_nearest",
      (spark, dir) => {
        val ev = Tables.events(spark, dir)
        def side(t: String) = ev.filter(col("event_type") === t)
          .select(col("user_id"), unix_micros(col("ts")).as("uts"), col("event_id"))
        TimeSeries.asofJoin(side("purchase"), side("click"),
            "user_id", "uts", "uts", "event_id",
            direction = "nearest", toleranceUs = 7200000000L)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(when(col("asof_ts").isNotNull, 1L).otherwise(0L)).as("n_matched"),
            sum(col("asof_dist_us")).as("sum_dist_us"),
            sum(col("asof_val")).as("sum_matched_click_ids"))
          .orderBy(col("user_id"))
      },
      Some("""WITH p AS (SELECT user_id, epoch_us(ts) AS uts, event_id FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, epoch_us(ts) AS uts, event_id FROM events WHERE event_type = 'click'),
             |u AS (
             |  SELECT user_id, uts, 0 AS isq, CAST(NULL AS BIGINT) AS qts, CAST(NULL AS BIGINT) AS qid FROM p
             |  UNION ALL SELECT user_id, uts, 1, uts, event_id FROM c),
             |w AS (SELECT user_id, uts, isq,
             |    last_value(qts IGNORE NULLS) OVER wb AS bts,
             |    last_value(qid IGNORE NULLS) OVER wb AS bid,
             |    first_value(qts IGNORE NULLS) OVER wf AS fts,
             |    first_value(qid IGNORE NULLS) OVER wf AS fid
             |  FROM u
             |  WINDOW wb AS (PARTITION BY user_id ORDER BY uts ASC, isq DESC, qid ASC NULLS FIRST
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |  wf AS (PARTITION BY user_id ORDER BY uts ASC, isq DESC, qid ASC NULLS FIRST
             |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
             |m AS (SELECT user_id, uts,
             |    CASE WHEN bts IS NOT NULL AND fts IS NOT NULL THEN
             |      CASE WHEN uts - bts <= fts - uts THEN bts ELSE fts END
             |    ELSE COALESCE(bts, fts) END AS mts,
             |    CASE WHEN bts IS NOT NULL AND fts IS NOT NULL THEN
             |      CASE WHEN uts - bts <= fts - uts THEN bid ELSE fid END
             |    ELSE COALESCE(bid, fid) END AS mid
             |  FROM w WHERE isq = 0),
             |t AS (SELECT user_id,
             |    CASE WHEN mts IS NOT NULL AND abs(uts - mts) <= 7200000000 THEN mts END AS mts,
             |    CASE WHEN mts IS NOT NULL AND abs(uts - mts) <= 7200000000 THEN mid END AS mid,
             |    uts FROM m)
             |SELECT user_id, COUNT(*) AS n_purchases,
             |  CAST(SUM(CASE WHEN mts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
             |  CAST(SUM(abs(uts - mts)) AS BIGINT) AS sum_dist_us,
             |  CAST(SUM(mid) AS BIGINT) AS sum_matched_click_ids
             |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // Per-group OLS trend (value vs day) on EXACT fixed-point sufficient
    // statistics — the deterministic alternative to regr_slope's
    // order-dependent double accumulation. DuckDB's HUGEINT and Spark's
    // DECIMAL(38,0) both carry the ~10²³ cross-moment exactly; floating
    // point enters only in the final scalar divisions, shared by both
    // sides.
    QueryDef(
      "q105_trend_ols",
      (spark, dir) =>
        TimeSeries.olsByGroup(
            Tables.events(spark, dir), "event_type",
            datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")),
            col("value"))
          .orderBy(col("event_type")),
      Some("""WITH base AS (
             |  SELECT event_type, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
             |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS y_units
             |  FROM events),
             |stats AS (
             |  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
             |    CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
             |    CAST(SUM(CAST(y_units AS HUGEINT)) AS HUGEINT) AS sy_units,
             |    CAST(SUM(CAST(x AS HUGEINT) * y_units) AS HUGEINT) AS sxy_units,
             |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
             |  FROM base GROUP BY event_type),
             |fit AS (
             |  SELECT event_type, n,
             |    CAST(n * sxy_units - sx * sy_units AS DOUBLE)
             |      / CAST(n * sxx - sx * sx AS DOUBLE) / 1000000.0 AS slope_raw,
             |    sx, sy_units
             |  FROM stats)
             |SELECT event_type, CAST(n AS BIGINT) AS n,
             |  ROUND(slope_raw, 6) AS slope,
             |  ROUND((CAST(sy_units AS DOUBLE) / 1000000.0 - slope_raw * CAST(sx AS DOUBLE))
             |    / CAST(n AS DOUBLE), 6) AS intercept
             |FROM fit ORDER BY event_type""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // Purged temporal-split audit (de Prado's purging/embargo): a time
    // split at T leaks through entity recency — eval rows whose user was
    // active in the 6h embargo window before T are near-duplicates of
    // that user's boundary-adjacent train behavior. Exact counts of the
    // train rows purging would drop and the eval rows exposed (measured:
    // ~38-42% of eval here — a time-split benchmark on this stream is
    // mostly measuring memory). The temporal axis of the q148/q180/q149
    // contamination family.
    QueryDef(
      "q190_purged_split",
      (spark, dir) =>
        graft.operators.Sampling.purgedSplitAudit(
          Tables.events(spark, dir), col("ts"), col("user_id"),
          boundary = "2024-01-22 00:00:00", embargoHours = 6),
      Some("""WITH ev AS (SELECT ts, user_id AS k FROM events WHERE ts IS NOT NULL),
             |agg AS (SELECT
             |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-22 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
             |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-22 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_eval,
             |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-22 00:00:00' - INTERVAL 6 HOUR
             |      AND ts < TIMESTAMP '2024-01-22 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_embargo_train
             |  FROM ev),
             |eu AS (SELECT DISTINCT k FROM ev
             |  WHERE ts >= TIMESTAMP '2024-01-22 00:00:00' - INTERVAL 6 HOUR
             |    AND ts < TIMESTAMP '2024-01-22 00:00:00'),
             |nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_embargo_keys FROM eu),
             |lk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_eval_leaky FROM ev
             |  WHERE ts >= TIMESTAMP '2024-01-22 00:00:00' AND k IN (SELECT k FROM eu))
             |SELECT agg.n_train, agg.n_eval, agg.n_embargo_train, nu.n_embargo_keys, lk.n_eval_leaky,
             |  CASE WHEN agg.n_eval > 0 THEN CAST((lk.n_eval_leaky * 1000000) // agg.n_eval AS BIGINT) END AS leaky_ppm,
             |  CASE WHEN agg.n_train > 0 THEN CAST((agg.n_embargo_train * 1000000) // agg.n_train AS BIGINT) END AS purged_ppm
             |FROM agg, nu, lk""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // Point-in-time-correct feature snapshot at q190's boundary: per
    // user, training features computed ONLY from rows before T —
    // leakage-free by construction (the feature-store contract). All
    // exact integers (µs integer division for ages, powers-of-two
    // recency decay, micro-unit value sums) so a backfill replays
    // identically on any engine. One filtered scan, one per-entity agg.
    QueryDef(
      "q191_pit_features",
      (spark, dir) =>
        graft.operators.TimeSeries.pointInTimeFeatures(
          Tables.events(spark, dir), col("ts"), col("user_id"),
          col("value"), col("event_type"),
          boundary = "2024-01-22 00:00:00", maxAgeDays = 29),
      Some("""WITH ev AS (SELECT ts, user_id AS k, event_type, value FROM events
             |    WHERE ts IS NOT NULL AND ts < TIMESTAMP '2024-01-22 00:00:00'),
             |b AS (SELECT epoch_us(TIMESTAMP '2024-01-22 00:00:00') AS bus)
             |SELECT k,
             |  CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(((SELECT bus FROM b) - MAX(epoch_us(ts))) // 60000000 AS BIGINT) AS last_age_min,
             |  CAST(SUM(CASE WHEN ((SELECT bus FROM b) - epoch_us(ts)) // 86400000000 <= 29
             |    THEN 1 << (29 - CAST(((SELECT bus FROM b) - epoch_us(ts)) // 86400000000 AS INT))
             |    ELSE 0 END) AS BIGINT) AS recency_weight,
             |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types,
             |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS value_sum_micro
             |FROM ev GROUP BY k""".stripMargin),
    ),
  )
}
