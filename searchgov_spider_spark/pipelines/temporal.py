"""Temporal / custom relational operators Spark lacks as builtins:
as-of join, interval range join, hypertable-style multi-grain rollup,
and a deterministic KMV distinct sketch.

These are the brief's named custom-operator family. Each is expressed
as a composition of existing DataFrame ops in its *scalable* shape (the
shape a 1000-executor cluster needs), never as a driver loop or per-row
Python, and each carries a DuckDB-SQL twin for the value-hash gate:

- ``asof_join``: most-recent-prior match via the union-tag + sorted
  last-non-null-carry pattern — ONE shuffle on the key, one sort, no
  range self-join (the naive ``ON r.ts <= l.ts`` join is O(n^2) per key
  and is exactly what this operator exists to avoid at scale).
- ``range_join_concurrency``: interval-overlap join via time-bucket
  binning — intervals explode into the fixed-width bins they span,
  pairs equi-join on bin (broadcast-or-shuffle, Catalyst's choice),
  dedupe, then the exact overlap predicate filters. Bin width trades
  fanout vs per-bin pair count; at corpus scale pick width ~= median
  interval length.
- ``rollup_hypertable``: one-pass GROUPING SETS over (type, day, hour)
  — the continuous-aggregate ladder a hypertable maintains, as a single
  shuffle with partial aggregation (Spark expands grouping sets
  map-side; no N-pass re-scan).
- ``kmv_distinct``: k-minimum-values cardinality sketch over the
  deterministic md5-based ``portable_hash32`` family, so the estimate
  is bit-identical across engines and oracle-checkable (the production
  path for non-verifiable estimates is ``approx_count_distinct``/HLL;
  KMV here is the deterministic twin with the same merge algebra:
  per-partition k-smallest, merged k-smallest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash32_col, portable_hash32_sql
from .textstats import tokens_col, tokens_sql

ASOF_LEFT_TYPE = "purchase"
ASOF_RIGHT_TYPE = "click"
RANGE_BIN_MINUTES = 60
KMV_K = 64


# ---------------------------------------------------------------------------
# As-of join
# ---------------------------------------------------------------------------

def asof_join(
    events: DataFrame,
    left_type: str = ASOF_LEFT_TYPE,
    right_type: str = ASOF_RIGHT_TYPE,
) -> DataFrame:
    """Join each ``left_type`` event to the most recent ``right_type``
    event of the same user at-or-before its timestamp (ties on ts break
    toward the larger event_id). Unmatched left rows keep nulls.

    Output: (event_id, user_id, ts, match_id, match_ts, lag_us).

    Plan: tag-union both sides, ONE shuffle+sort on
    (user_id, ts, side, event_id), then ``last(..., ignoreNulls)`` over
    rows UNBOUNDED PRECEDING..CURRENT carries the latest right-side id
    forward onto every left row — linear in the partition, no per-key
    quadratic range join. Right rows sort before left rows at equal ts
    (at-or-before semantics).
    """
    left = events.filter(F.col("event_type") == left_type).select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_left")
    )
    right = events.filter(F.col("event_type") == right_type).select(
        F.col("event_id").alias("r_id"),
        "user_id",
        F.col("ts").alias("r_ts"),
    )
    u = left.unionByName(
        right.select(
            F.col("r_id").alias("event_id"),
            "user_id",
            F.col("r_ts").alias("ts"),
            F.lit(0).alias("is_left"),
        )
    ).withColumn("r_id", F.when(F.col("is_left") == 0, F.col("event_id"))) \
     .withColumn("r_ts", F.when(F.col("is_left") == 0, F.col("ts")))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("is_left"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "event_id",
        "user_id",
        "ts",
        "is_left",
        F.last("r_id", ignorenulls=True).over(w).alias("match_id"),
        F.last("r_ts", ignorenulls=True).over(w).alias("match_ts"),
    )
    return carried.filter(F.col("is_left") == 1).select(
        "event_id",
        "user_id",
        "ts",
        "match_id",
        "match_ts",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("match_ts").cast("timestamp"))
        ).alias("lag_us"),
    )


def asof_join_sql(
    table: str = "events",
    left_type: str = ASOF_LEFT_TYPE,
    right_type: str = ASOF_RIGHT_TYPE,
) -> str:
    return f"""
        WITH l AS (
          SELECT event_id, user_id, ts FROM {table} WHERE event_type = '{left_type}'
        ), r AS (
          SELECT event_id AS r_id, user_id, ts AS r_ts FROM {table}
          WHERE event_type = '{right_type}'
        ), j AS (
          SELECT l.event_id, l.user_id, l.ts, r.r_id, r.r_ts,
                 row_number() OVER (
                   PARTITION BY l.event_id ORDER BY r.r_ts DESC, r.r_id DESC
                 ) AS rn
          FROM l LEFT JOIN r ON r.user_id = l.user_id AND r.r_ts <= l.ts
        )
        SELECT event_id, user_id, ts, r_id AS match_id, r_ts AS match_ts,
               date_diff('us', r_ts, ts)::BIGINT AS lag_us
        FROM j WHERE rn = 1
        ORDER BY event_id
    """


# ---------------------------------------------------------------------------
# Range (interval-overlap) join via time-bucket binning
# ---------------------------------------------------------------------------

def range_join_concurrency(
    sessions: DataFrame, bin_minutes: int = RANGE_BIN_MINUTES
) -> DataFrame:
    """For each session interval [session_start, session_end), count
    overlapping sessions of OTHER users (concurrency). Sessions must
    carry (user_id, session_start, session_end).

    Plan (the scalable range join): each interval explodes into the
    fixed-width time bins it spans (``sequence`` of truncated
    timestamps), candidate pairs equi-join on bin, and the exact
    half-open overlap predicate (a.start < b.end AND b.start < a.end)
    filters — never an unbinned theta join. Multi-bin duplicate pairs
    are killed WITHOUT a distinct shuffle: a pair is counted only in
    the first bin both intervals occupy (bin == trunc(max(starts)) —
    every overlapping pair shares that bin, and only once), so the
    count is one hash-agg over the filtered join output.
    """
    if 60 % bin_minutes != 0:
        # the first-shared-bin dedupe below keys on hour marks; a step
        # that skips them would miss pairs
        raise ValueError("bin_minutes must divide 60")
    step = F.expr(f"interval {bin_minutes} minutes")
    binned = sessions.select(
        "user_id",
        "session_start",
        "session_end",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("session_start")),
                F.date_trunc("hour", F.col("session_end")),
                step,
            )
        ).alias("bin"),
    )
    a = binned.select(
        F.col("user_id").alias("a_user"),
        F.col("session_start").alias("a_start"),
        F.col("session_end").alias("a_end"),
        "bin",
    )
    b = binned.select(
        F.col("user_id").alias("b_user"),
        F.col("session_start").alias("b_start"),
        F.col("session_end").alias("b_end"),
        "bin",
    )
    first_shared_bin = F.date_trunc(
        "hour", F.greatest("a_start", "b_start")
    )
    pairs = a.join(b, "bin").filter(
        (F.col("a_user") != F.col("b_user"))
        & (F.col("a_start") < F.col("b_end"))
        & (F.col("b_start") < F.col("a_end"))
        & (F.col("bin") == first_shared_bin)
    )
    counts = pairs.groupBy("a_user", "a_start").agg(
        F.count("*").alias("n_concurrent")
    )
    return (
        sessions.select(
            F.col("user_id"), F.col("session_start"), F.col("session_end")
        )
        .join(
            counts,
            (F.col("user_id") == F.col("a_user"))
            & (F.col("session_start") == F.col("a_start")),
            "left",
        )
        .select(
            "user_id",
            "session_start",
            "session_end",
            F.coalesce(F.col("n_concurrent"), F.lit(0)).cast("long").alias("n_concurrent"),
        )
    )


def range_join_concurrency_sql(sessions_cte: str) -> str:
    """DuckDB twin: exact (unbinned) overlap join over the sessions CTE —
    the semantics the binned plan must reproduce bit-for-bit."""
    return f"""
        WITH s AS ({sessions_cte}),
        pairs AS (
          SELECT a.user_id AS a_user, a.session_start AS a_start,
                 count(*) AS n_concurrent
          FROM s a JOIN s b
            ON a.user_id <> b.user_id
           AND a.session_start < b.session_end
           AND b.session_start < a.session_end
          GROUP BY a.user_id, a.session_start
        )
        SELECT s.user_id, s.session_start, s.session_end,
               coalesce(p.n_concurrent, 0)::BIGINT AS n_concurrent
        FROM s LEFT JOIN pairs p
          ON p.a_user = s.user_id AND p.a_start = s.session_start
        ORDER BY s.user_id, s.session_start
    """


# ---------------------------------------------------------------------------
# Hypertable-style multi-grain rollup (one-pass GROUPING SETS)
# ---------------------------------------------------------------------------

def rollup_hypertable(events: DataFrame) -> DataFrame:
    """Continuous-aggregate ladder over (event_type, day, hour) in ONE
    pass: GROUPING SETS ((type, day, hour), (type, day), (type), ()).

    Output: (event_type, day, hour, grain, n_events, sum_value) where
    grain = grouping(type)*4 + grouping(day)*2 + grouping(hour)
    (0 = hourly leaf ... 7 = grand total).
    """
    base = events.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "value",
    )
    rolled = base.groupingSets(
        [
            ["event_type", "day", "hour"],
            ["event_type", "day"],
            ["event_type"],
            [],
        ],
        "event_type",
        "day",
        "hour",
    ).agg(
        (
            F.grouping("event_type").cast("long") * 4
            + F.grouping("day").cast("long") * 2
            + F.grouping("hour").cast("long")
        ).alias("grain"),
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
    return rolled.select(
        "event_type", "day", "hour", "grain", "n_events", "sum_value"
    )


def rollup_hypertable_sql(table: str = "events") -> str:
    return f"""
        WITH base AS (
          SELECT event_type,
                 date_trunc('day', ts)::TIMESTAMP AS day,
                 date_trunc('hour', ts)::TIMESTAMP AS hour,
                 value
          FROM {table}
        )
        SELECT event_type, day, hour,
               (grouping(event_type) * 4 + grouping(day) * 2
                + grouping(hour))::BIGINT AS grain,
               count(*)::BIGINT AS n_events,
               round(sum(value), 6) AS sum_value
        FROM base
        GROUP BY GROUPING SETS (
          (event_type, day, hour), (event_type, day), (event_type), ()
        )
        ORDER BY grain, event_type, day, hour
    """


# ---------------------------------------------------------------------------
# KMV distinct sketch (deterministic, oracle-checkable)
# ---------------------------------------------------------------------------

def kmv_distinct(
    docs: DataFrame, k: int = KMV_K, text_col: str = "text"
) -> DataFrame:
    """Per-source vocabulary-size estimate via the k-minimum-values
    sketch: over distinct token hashes h in [0, 2^32), keep the k
    smallest; estimate D ~= (k-1) * 2^32 / h_(k); exact when fewer than
    k distinct hashes exist.

    Output: (source, n_kept, h_k, est_distinct, exact_distinct).

    Plan: explode -> distinct (source, token) -> hash -> per-source
    k-smallest window (WindowGroupLimit pushes the limit into the sort)
    -> one agg. Merge algebra matches real KMV (k-smallest of a union =
    k-smallest of merged k-smallest sets), which is why the production
    variant drops in as ``approx_count_distinct`` without plan changes.
    """
    toks = docs.select(
        "source",
        F.explode(F.transform(tokens_col(text_col), F.lower)).alias("token"),
    ).filter(F.col("token") != "")
    hashed = (
        toks.distinct()
        .select("source", portable_hash32_col("token").alias("h"), "token")
    )
    exact = hashed.groupBy("source").agg(
        F.count_distinct("token").alias("exact_distinct")
    )
    dh = hashed.select("source", "h").distinct()
    w = Window.partitionBy("source").orderBy(F.asc("h"))
    kept = dh.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    sk = kept.groupBy("source").agg(
        F.count("*").cast("long").alias("n_kept"), F.max("h").alias("h_k")
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        (F.lit(float(k - 1)) * F.lit(4294967296.0)) / F.col("h_k")
    )
    return (
        sk.join(exact, "source")
        .select(
            "source",
            "n_kept",
            "h_k",
            F.round(est, 6).alias("est_distinct"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
        )
    )


def kmv_distinct_sql(k: int = KMV_K, table: str = "documents") -> str:
    h = portable_hash32_sql("token")
    return f"""
        WITH toks AS (
          SELECT DISTINCT source, lower(w) AS token
          FROM {table}, unnest({tokens_sql('text')}) AS u(w)
          WHERE w <> ''
        ), hashed AS (SELECT source, token, {h} AS h FROM toks),
        exact AS (
          SELECT source, count(DISTINCT token) AS exact_distinct
          FROM hashed GROUP BY source
        ), dh AS (SELECT DISTINCT source, h FROM hashed),
        kept AS (
          SELECT source, h,
                 row_number() OVER (PARTITION BY source ORDER BY h ASC) AS rn
          FROM dh
        ), sk AS (
          SELECT source, count(*)::BIGINT AS n_kept, max(h) AS h_k
          FROM kept WHERE rn <= {k} GROUP BY source
        )
        SELECT sk.source, sk.n_kept, sk.h_k,
               round(CASE WHEN sk.n_kept < {k} THEN sk.n_kept::DOUBLE
                     ELSE ({float(k - 1)!r} * 4294967296.0) / sk.h_k END, 6)
                 AS est_distinct,
               exact.exact_distinct::BIGINT AS exact_distinct
        FROM sk JOIN exact USING (source)
        ORDER BY source
    """
