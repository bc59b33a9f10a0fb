"""Crawl-event analytics: sessionization + JSON property extraction.

The reference's monitoring surface is batch log aggregation
(search_gov_crawler/search_gov_spiders/monitors.py analog, rebuilt in
plans/crawl.py + streaming/monitor.py). These extend it with the two
shapes real crawl-ops dashboards need:

- `sessionize`: native ``F.session_window`` (dynamic-gap windows, the
  same operator Structured Streaming uses for stateful sessions) over
  (user_id) — per-worker fetch sessions with event counts and value
  totals. The DuckDB twin is the classic gaps-and-islands rewrite
  (lag -> new-session flag -> running sum), which pins Spark's session
  semantics exactly: a session extends while the next event starts in
  [last_ts, last_ts + gap] — an event exactly at the gap boundary
  MERGES (pinned by test_events.py).
- `props_rollup`: ``get_json_object`` extraction from the JSON props
  column aggregated per event type (json scalar functions stay in
  codegen; no Python).

Scale: both group on high-cardinality keys (user_id, event_type) —
single hash-shuffle each, map-side combine; session_window state is
bounded per key by the gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GAP_MINUTES = 30


def sessionize(events: DataFrame, gap_minutes: int = GAP_MINUTES) -> DataFrame:
    """Per-user sessions: (user_id, session_start, session_end, n_events,
    total_value). session_end = last event + gap (Spark session_window's
    window.end)."""
    return (
        events.groupBy(
            "user_id",
            F.session_window(F.col("ts"), f"{gap_minutes} minutes").alias("w"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.min("ts").alias("session_start"),
        )
        .select(
            "user_id",
            "session_start",
            F.col("w.end").alias("session_end"),
            F.col("n_events").cast("long").alias("n_events"),
            "total_value",
        )
    )


def sessionize_sql(table: str = "events", gap_minutes: int = GAP_MINUTES) -> str:
    return f"""
        WITH o AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL {gap_minutes} MINUTE
                      THEN 1 ELSE 0 END AS new_s
          FROM {table}
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
          SELECT *, sum(new_s) OVER (
            PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
          ) AS sid FROM o
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL {gap_minutes} MINUTE AS session_end,
               count(*) AS n_events,
               round(sum(value), 6) AS total_value
        FROM s
        GROUP BY user_id, sid
        ORDER BY user_id, session_start
    """


def props_rollup(events: DataFrame) -> DataFrame:
    """Per-event-type rollup of the JSON props column:
    (event_type, n_events, sum_k, distinct_k)."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.countDistinct("k").cast("long").alias("distinct_k"),
        )
    )


def props_rollup_sql(table: str = "events") -> str:
    return f"""
        SELECT event_type,
               count(*) AS n_events,
               sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
               count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS distinct_k
        FROM {table}
        GROUP BY event_type
        ORDER BY event_type
    """
