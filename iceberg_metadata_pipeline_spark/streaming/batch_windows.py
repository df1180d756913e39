"""Windowed event-time queries over the events table, in batch form
(SURVEY.md §2.B streaming: the reference has no streaming at all — this
surface comes from the north-star events model). Batch window() /
session_window() semantics are DuckDB-checkable; the same shapes run as
Structured Streaming in streaming/stream.py with watermarks, tested in
tests/test_streaming.py.

Scale notes: tumbling/sliding windows are groupBys on (bucket, keys) —
partial-agg'd map-side, shuffle O(windows × keys). Session windows
shuffle per key for the sort; skewed users are the hazard (same answer
as windows.py: AQE + pre-filter).
"""

from __future__ import annotations

from iceberg_metadata_pipeline_spark.queries import sql_query

sql_query(
    "stream_tumbling_window",
    """
SELECT window.start AS win_start, event_type, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY window(ts, '1 hour'), event_type
ORDER BY win_start, event_type
""",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS win_start,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY win_start, event_type
""",
)

sql_query(
    "stream_sliding_window",
    """
SELECT window.start AS win_start, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY window(ts, '1 hour', '30 minutes')
ORDER BY win_start
""",
    oracle="""
SELECT win_start, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM (
  SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
           - to_minutes(30 * k) AS win_start,
         CAST(ts AS TIMESTAMP) AS tsx, value
  FROM events, unnest([0, 1]) AS u(k)
) s
WHERE tsx >= win_start AND tsx < win_start + INTERVAL '1 hour'
GROUP BY win_start
ORDER BY win_start
""",
)

sql_query(
    "stream_session_window",
    # 5-minute-gap sessions per user; Spark's session_window vs the classic
    # gaps-and-islands rewrite in DuckDB
    """
SELECT user_id, session_window.start AS session_start,
       COUNT(*) AS n_events, MAX(ts) AS last_ts
FROM events
GROUP BY user_id, session_window(ts, '5 minutes')
ORDER BY user_id, session_start
""",
    oracle="""
SELECT user_id, MIN(tsx) AS session_start, COUNT(*) AS n_events,
       MAX(tsx) AS last_ts
FROM (
  SELECT user_id, tsx,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tsx, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM (
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsx,
           CASE WHEN CAST(ts AS TIMESTAMP)
                     - lag(CAST(ts AS TIMESTAMP), 1, TIMESTAMP '1900-01-01')
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL '5 minutes'
                THEN 1 ELSE 0 END AS new_sess
    FROM events
  ) a
) b
GROUP BY user_id, sess_id
ORDER BY user_id, session_start
""",
)

sql_query(
    "stream_asof_lookup",
    # as-of join shape: each 'click' sees the latest 'view' of the same
    # user at-or-before it — the last(ignore nulls) running-window rewrite
    # (Spark has no native as-of join; SURVEY.md §2.B joins table)
    """
SELECT event_id, user_id, ts, last_view_ts
FROM (
  SELECT event_id, user_id, ts, event_type,
         MAX(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_ts
  FROM events
) t
WHERE event_type = 'click'
ORDER BY user_id, ts, event_id
""",
)

sql_query(
    "stream_dedup_keep_first",
    # batch form of streaming dropDuplicates-with-watermark: keep the
    # earliest event per (user_id, event_type)
    """
SELECT user_id, event_type, event_id, ts
FROM (
  SELECT user_id, event_type, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
) t
WHERE rn = 1
ORDER BY user_id, event_type
""",
)

sql_query(
    "stream_json_props_window",
    # JSON extraction feeding a windowed aggregate (events.props)
    """
SELECT window.start AS win_start,
       CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       COUNT(*) AS n
FROM events
GROUP BY window(ts, '6 hours')
ORDER BY win_start
""",
    oracle="""
SELECT time_bucket(INTERVAL '6 hours', CAST(ts AS TIMESTAMP)) AS win_start,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
       COUNT(*) AS n
FROM events
GROUP BY 1
ORDER BY win_start
""",
)

# Stream-stream join, batch rendition: the EXACT join condition of
# streaming/stream.py::clicks_views_stream_join (user equi-key + bounded
# event-time distance — the bound is what lets streaming expire state).
# Batch and streaming produce the same rows for a static input, so this
# oracle checks the join logic the streaming test exercises with
# watermarks in tests/test_streaming.py.
sql_query(
    "stream_join_clicks_views",
    """
SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
       v.event_id AS view_id, v.ts AS view_ts,
       CAST(CAST(v.value AS DECIMAL(38,6)) AS DOUBLE) AS view_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id
 AND v.ts <= c.ts
 AND v.ts >= c.ts - INTERVAL 60 MINUTES
ORDER BY click_id, view_id
""",
    oracle="""
SELECT c.event_id AS click_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS click_ts,
       v.event_id AS view_id, CAST(v.ts AS TIMESTAMP) AS view_ts,
       CAST(CAST(v.value AS DECIMAL(38,6)) AS DOUBLE) AS view_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id
 AND CAST(v.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP)
 AND CAST(v.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP) - INTERVAL 60 MINUTE
ORDER BY click_id, view_id
""",
)

# dropDuplicatesWithinWatermark, batch rendition: at-least-once sources
# duplicate within a bounded replay horizon; the streaming op keeps the
# first event per key while state lives (delta = 10 min). Batch
# equivalent: within each replay burst (same-key events chained at gaps
# <= delta), keep only the first — LAG over the per-key event-time order.
# The true streaming op (state expiry across micro-batch restarts) is
# asserted in tests/test_streaming.py.
sql_query(
    "stream_dedup_within_watermark",
    """
SELECT user_id, event_type, ts, event_id
FROM (
  SELECT user_id, event_type, ts, event_id,
         LAG(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_ts
  FROM events
) s
WHERE prev_ts IS NULL OR ts > prev_ts + INTERVAL 10 MINUTES
ORDER BY user_id, event_type, ts, event_id
""",
    oracle="""
SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
FROM (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
         LAG(CAST(ts AS TIMESTAMP)) OVER (
           PARTITION BY user_id, event_type
           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_ts
  FROM events
) s
WHERE prev_ts IS NULL OR ts > prev_ts + INTERVAL 10 MINUTE
ORDER BY user_id, event_type, ts, event_id
""",
)


# funnel conversion: of users whose first view happened, how many
# clicked AFTER it — two aggregates and one join on user_id (the
# product-analytics staple; at scale both sides shuffle once on the
# user key and the dim side is the smaller first-view table)
sql_query(
    "events_funnel_conversion",
    """
WITH v AS (
  SELECT user_id, MIN(ts) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT COUNT(DISTINCT v.user_id) AS n_viewers,
       COUNT(DISTINCT CASE WHEN c.ts > v.first_view THEN v.user_id END) AS n_converted
FROM v LEFT JOIN c ON c.user_id = v.user_id
""",
    oracle="same",
)

# fixed-width histogram: integer bucket arithmetic, exact in any engine
sql_query(
    "agg_histogram_bins",
    """
SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS bucket_total
FROM orders
GROUP BY bucket
ORDER BY bucket
""",
    oracle="same",
)

# time-interval RANGE frame: events in the trailing hour per user — the
# rolling-metric frame a monitoring query wants (RANGE on event time,
# not ROWS: ties and gaps handled by the time axis itself)
sql_query(
    "window_time_range_frame",
    """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_last_hour,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS val_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_id
""",
    oracle="same",
)

# sessionization via the lag-gap-cumsum idiom (the pure-SQL form of
# session windows): a session starts where the gap from the previous
# event exceeds 5 minutes; the running sum of starts numbers sessions.
# Two windows, both over the same (user, time) shuffle — one exchange.
sql_query(
    "events_sessionize_sql",
    """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP))
                   OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                   > INTERVAL 5 MINUTES THEN 1 ELSE 0 END AS new_session,
         event_id
  FROM events
),
sess AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS session_value
FROM sess
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
    oracle="same",
)

# per-user z-score outliers — the monitoring/anomaly staple. Moments via
# decimal sums (order-free) joined back to the stream; the join's build
# side is one row per user (broadcastable at any scale)
sql_query(
    "events_zscore_outliers",
    """
WITH m AS (
  SELECT user_id,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(value AS DECIMAL(38,12))) AS DOUBLE) AS s,
         CAST(SUM(CAST(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
                       AS DECIMAL(38,12))) AS DOUBLE) AS s2
  FROM events GROUP BY user_id
),
scored AS (
  SELECT e.event_id, e.user_id,
         round((CAST(e.value AS DOUBLE) - s / n)
               / nullif(sqrt((s2 - s * s / n) / n), 0), 6) AS z
  FROM events e JOIN m ON e.user_id = m.user_id
)
SELECT event_id, user_id, z
FROM scored
WHERE abs(z) > 2
ORDER BY event_id
""",
    oracle="same",
)

# weekly cohort retention: users grouped by first-activity week, counted
# in each later week they return — two aggregates and one join on
# user_id (both engines truncate weeks to Monday)
sql_query(
    "events_cohort_retention",
    """
WITH f AS (
  SELECT user_id, MIN(CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)) AS cohort
  FROM events GROUP BY user_id
),
a AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
  FROM events
)
SELECT f.cohort, CAST(datediff(a.wk, f.cohort) / 7 AS BIGINT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_active
FROM a JOIN f ON a.user_id = f.user_id
GROUP BY f.cohort, week_offset
ORDER BY cohort, week_offset
""",
    oracle="""
WITH f AS (
  SELECT user_id, MIN(CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)) AS cohort
  FROM events GROUP BY user_id
),
a AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
  FROM events
)
SELECT f.cohort, CAST(date_diff('day', f.cohort, a.wk) / 7 AS BIGINT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_active
FROM a JOIN f ON a.user_id = f.user_id
GROUP BY f.cohort, week_offset
ORDER BY cohort, week_offset
""",
)

# Time-series gap-fill + resample: per-hour revenue per event type on a
# COMPLETE hourly grid (missing hours materialized, then forward-filled
# with the last observed value). The grid is sequence()+explode over the
# per-group [min, max] span — O(span/step) rows per group, independent
# of event count; the forward fill is one last(ignorenulls) window per
# group ordered by grid time. At 100 TB the raw aggregation shuffles on
# (group, hour) with map-side combine; the grid+fill stage then runs on
# aggregated data (tiny), so gap-filling costs nothing extra at scale.
# DuckDB oracle: generate_series + last_value IGNORE NULLS.
sql_query(
    "events_gap_fill_resample",
    """
WITH per_hour AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY event_type, date_trunc('hour', CAST(ts AS TIMESTAMP))
),
bounds AS (
  SELECT event_type, MIN(h) AS mn, MAX(h) AS mx FROM per_hour GROUP BY event_type
),
grid AS (
  SELECT event_type, explode(sequence(mn, mx, INTERVAL 1 HOUR)) AS h FROM bounds
)
SELECT g.event_type, g.h,
  last(p.v, true) OVER (
    PARTITION BY g.event_type ORDER BY g.h
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
  CAST(p.v IS NULL AS INT) AS was_gap
FROM grid g LEFT JOIN per_hour p
  ON g.event_type = p.event_type AND g.h = p.h
ORDER BY g.event_type, g.h
""",
    oracle="""
WITH per_hour AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY event_type, date_trunc('hour', CAST(ts AS TIMESTAMP))
),
bounds AS (
  SELECT event_type, MIN(h) AS mn, MAX(h) AS mx FROM per_hour GROUP BY event_type
),
grid AS (
  SELECT b.event_type, g.h
  FROM bounds b, LATERAL (SELECT unnest(generate_series(b.mn, b.mx, INTERVAL 1 HOUR)) AS h) g
)
SELECT g.event_type, g.h,
  last_value(p.v IGNORE NULLS) OVER (
    PARTITION BY g.event_type ORDER BY g.h
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
  CAST(p.v IS NULL AS INT) AS was_gap
FROM grid g LEFT JOIN per_hour p
  ON g.event_type = p.event_type AND g.h = p.h
ORDER BY g.event_type, g.h
""",
)


# Marketing attribution: for every purchase, the first- and last-touch
# marketing events (click/view) of its journey — journey = the span
# since the user's previous purchase, derived as a running count of
# purchases strictly before the row (ROWS frame over a total
# (ts, event_id) order, so ties cannot reorder cross-engine). All
# outputs are exact integers; the shuffles are per-user windows plus
# two journey-key joins — no global sort, state bounded per user.
sql_query(
    "events_attribution_touch",
    """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           CAST(0 AS BIGINT)) AS journey
  FROM events
), mk AS (
  SELECT user_id, journey, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, journey
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY user_id, journey
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM marked WHERE event_type IN ('click', 'view')
), purch AS (
  SELECT user_id, journey, event_id AS purchase_id
  FROM marked WHERE event_type = 'purchase'
)
SELECT p.user_id, p.purchase_id,
       f.event_id AS first_touch, l.event_id AS last_touch
FROM purch p
LEFT JOIN mk f ON p.user_id = f.user_id AND p.journey = f.journey AND f.rn_a = 1
LEFT JOIN mk l ON p.user_id = l.user_id AND p.journey = l.journey AND l.rn_d = 1
ORDER BY p.user_id, p.purchase_id
""",
    oracle="same",
)


# bounce rate (round 10): share of 5-minute-gap sessions that contain
# exactly one event — the engagement-health staple. Reuses the
# lag-gap-cumsum sessionization (two windows over one (user, time)
# shuffle); the rate is one exact integer division. At 100 TB the
# windows stay partitioned by user and the final reduce is one row.
sql_query(
    "events_bounce_rate",
    """
WITH marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP))
                   OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                   > INTERVAL 5 MINUTES THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS session_id
  FROM marked
),
per AS (
  SELECT user_id, session_id, COUNT(*) AS n_events
  FROM sess GROUP BY user_id, session_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS bounce_rate
FROM per
""",
    oracle="same",
)


# time-to-convert (round 10): per-user first 'view' → first 'purchase'
# latency, summarized as exact integer-microsecond percentiles via the
# distinct-value prefix rule (the events_interarrival shape). One
# per-user conditional-min aggregate (map-combinable), then percentile
# work over DISTINCT latencies.
_TTC_TEMPLATE = """
WITH per_user AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view'
             THEN CAST(ts AS TIMESTAMP) END) AS first_view,
    MIN(CASE WHEN event_type = 'purchase'
             THEN CAST(ts AS TIMESTAMP) END) AS first_purchase
  FROM events GROUP BY user_id
), lat AS (
  SELECT CAST({EPOCH_US_P} - {EPOCH_US_V} AS BIGINT) AS us
  FROM per_user
  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
    AND first_purchase >= first_view
), pv AS (
  SELECT us, CAST(COUNT(*) AS BIGINT) AS n_v FROM lat GROUP BY us
), c AS (
  SELECT us, n_v,
    COALESCE(SUM(n_v) OVER (
      ORDER BY us ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS cb
  FROM pv
), tot AS (SELECT CAST(SUM(n_v) AS BIGINT) AS n FROM pv)
SELECT
  (SELECT n FROM tot) AS n_converted,
  CAST(MIN(CASE WHEN cb + n_v >= ((SELECT n FROM tot) + 1) / 2
                THEN us END) AS BIGINT) AS median_us,
  CAST(MIN(CASE WHEN 10 * (cb + n_v) >= 9 * (SELECT n FROM tot)
                THEN us END) AS BIGINT) AS p90_us
FROM c
"""

sql_query(
    "events_time_to_convert",
    _TTC_TEMPLATE.replace("{EPOCH_US_P}", "unix_micros(first_purchase)")
    .replace("{EPOCH_US_V}", "unix_micros(first_view)"),
    oracle=_TTC_TEMPLATE.replace("{EPOCH_US_P}", "epoch_us(first_purchase)")
    .replace("{EPOCH_US_V}", "epoch_us(first_view)"),
)
