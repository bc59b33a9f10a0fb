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
               sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
               count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS distinct_k
        FROM {table}
        GROUP BY event_type
        ORDER BY event_type
    """


PCTS = (0.5, 0.9, 0.99)


def percentiles_exact(events: DataFrame) -> DataFrame:
    """Exact nearest-rank percentiles of ``value`` per event_type:
    p_q = the value at rank ceil(q * n) of the ascending sort (ties on
    value break by event_id so the selected element is unique).

    One shuffle on event_type + one window sort; the per-group sort is
    the unavoidable cost of EXACT percentiles — the approximate path at
    corpus scale is ``percentile_approx`` (t-digest), which this pins
    numerically via the same plan shape. No float arithmetic: selection
    only, so cross-engine equality is exact.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    ranked = events.select("event_type", "event_id", "value").withColumn(
        "rn", F.row_number().over(w)
    ).withColumn("n", F.count("*").over(Window.partitionBy("event_type")))
    aggs = [F.count("*").cast("long").alias("n")]
    for q in PCTS:
        tag = f"p{int(q * 100)}"
        aggs.append(
            F.max(
                F.when(F.col("rn") == F.ceil(F.lit(q) * F.col("n")), F.col("value"))
            ).alias(tag)
        )
    return ranked.groupBy("event_type").agg(*aggs)


def percentiles_exact_sql(table: str = "events") -> str:
    pct_cols = ",\n               ".join(
        f"max(CASE WHEN rn = ceil({q} * n) THEN value END) AS p{int(q * 100)}"
        for q in PCTS
    )
    return f"""
        WITH ranked AS (
          SELECT event_type, value,
                 row_number() OVER (
                   PARTITION BY event_type ORDER BY value ASC, event_id ASC
                 ) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM {table}
        )
        SELECT event_type, count(*)::BIGINT AS n,
               {pct_cols}
        FROM ranked GROUP BY event_type ORDER BY event_type
    """


ROLL_WINDOW = 4


def rolling_stats(events: DataFrame, window_rows: int = ROLL_WINDOW) -> DataFrame:
    """Per-user moving aggregates ordered by (ts, event_id): count and
    value-sum over the trailing ``window_rows`` rows, plus the running
    event count — the standard ROWS-frame window family.

    One shuffle on user_id; both frames share the single per-partition
    sort (Catalyst collapses same-spec windows into one Window node).
    """
    from pyspark.sql import Window

    base = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    trailing = base.rowsBetween(-(window_rows - 1), Window.currentRow)
    running = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(trailing).cast("long").alias("w_n"),
        F.round(F.sum("value").over(trailing), 6).alias("w_sum"),
        F.count("*").over(running).cast("long").alias("cum_n"),
    )


def rolling_stats_sql(table: str = "events", window_rows: int = ROLL_WINDOW) -> str:
    return f"""
        SELECT event_id, user_id, ts,
               (count(*) OVER w_trail)::BIGINT AS w_n,
               round(sum(value) OVER w_trail, 6) AS w_sum,
               (count(*) OVER w_run)::BIGINT AS cum_n
        FROM {table}
        WINDOW
          w_trail AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN {window_rows - 1} PRECEDING AND CURRENT ROW),
          w_run AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_events(events: DataFrame) -> DataFrame:
    """Per-user event-type count matrix: one column per known type plus
    a total. Explicit pivot values ⇒ single pass (no extra distinct-scan
    job); unknown types would land in no column by design.
    """
    counts = (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    total = None
    for t in EVENT_TYPES:
        c = F.coalesce(F.col(t), F.lit(0)).cast("long")
        counts = counts.withColumn(t, c)
        total = c if total is None else total + c
    return counts.withColumn("total", total.cast("long"))


def pivot_events_sql(table: str = "events") -> str:
    cols = ",\n               ".join(
        f"(count(*) FILTER (WHERE event_type = '{t}'))::BIGINT AS {t}"
        for t in EVENT_TYPES
    )
    return f"""
        SELECT user_id,
               {cols},
               (count(*) FILTER (WHERE event_type IN ({', '.join(repr(t) for t in EVENT_TYPES)})))::BIGINT AS total
        FROM {table}
        GROUP BY user_id ORDER BY user_id
    """


HOP_WINDOW_MIN = 10
HOP_SLIDE_MIN = 5


def hopping_counts(
    events: DataFrame,
    window_min: int = HOP_WINDOW_MIN,
    slide_min: int = HOP_SLIDE_MIN,
) -> DataFrame:
    """Hopping (sliding) window counts per event_type: ``F.window`` with
    a slide — each event lands in window_min/slide_min overlapping
    windows. The same expression runs unchanged under readStream (the
    streaming monitor's sliding variant); batch here so the oracle can
    pin values. Epoch origin 1970-01-01 (Spark's default), mirrored in
    the SQL twin's epoch arithmetic.
    """
    w = F.window(F.col("ts"), f"{window_min} minutes", f"{slide_min} minutes")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def hopping_counts_sql(
    table: str = "events",
    window_min: int = HOP_WINDOW_MIN,
    slide_min: int = HOP_SLIDE_MIN,
) -> str:
    n_hops = window_min // slide_min
    slide_s = slide_min * 60
    starts = ", ".join(
        f"to_timestamp((floor(epoch(ts) / {slide_s}) - {i}) * {slide_s})::TIMESTAMP"
        for i in range(n_hops)
    )
    return f"""
        WITH hopped AS (
          SELECT u.ws AS window_start, event_type, value
          FROM {table}, unnest([{starts}]) AS u(ws)
        )
        SELECT window_start,
               window_start + INTERVAL {window_min} MINUTE AS window_end,
               event_type,
               count(*)::BIGINT AS n,
               round(sum(value), 6) AS sum_value
        FROM hopped
        GROUP BY window_start, event_type
        ORDER BY window_start, event_type
    """


INCR_CUTOFF = "2024-01-25"


def incremental_counts(events: DataFrame, cutoff: str = INCR_CUTOFF) -> DataFrame:
    """Incremental view maintenance of a per-type aggregate: the
    committed aggregate over history (ts < cutoff) merges with the
    aggregate of the new delta (ts >= cutoff) by RE-AGGREGATING the
    partials — count and integer-cent sums are algebraic, so
    merge(agg(A), agg(B)) == agg(A ∪ B) exactly.

    This is the per-wave update shape the crawl state store uses
    (sources/state.py write_delta/read_accumulated): never recompute
    history, just fold the delta's partial in. The oracle is the full
    recompute — equality IS the IVM correctness proof.
    """
    cents = F.round(F.col("value") * 100).cast("long")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").cast("long").alias("n"),
            F.sum(cents).alias("sum_c"),
        )

    prev = agg(events.filter(F.col("ts") < cutoff))
    delta = agg(events.filter(F.col("ts") >= cutoff))
    return (
        prev.unionByName(delta)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"), F.sum("sum_c").alias("sum_c"))
    )


def incremental_counts_sql(table: str = "events") -> str:
    # full recompute — the merged incremental result must equal this
    return f"""
        SELECT event_type, count(*)::BIGINT AS n,
               sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_c
        FROM {table} GROUP BY event_type ORDER BY event_type
    """


FUNNEL_STAGES = ("view", "click", "purchase")


def funnel(events: DataFrame, stages=FUNNEL_STAGES) -> DataFrame:
    """Ordered funnel analysis: per user, the earliest time each stage
    was reached AFTER the previous stage (classic conversion funnel —
    view -> click -> purchase in order, not mere presence).

    Output: (user_id, t_<stage>..., reached) where reached = number of
    stages completed in order.

    Plan: one conditional-min hash-agg per stage, each joined back
    before the next (stage k's floor is stage k-1's time) — k tiny
    shuffles of per-user 1-row tables, never a window over raw events.
    """
    cur = events.select("user_id").distinct()
    prev_col = None
    t_cols = []
    for s in stages:
        ev_s = events.filter(F.col("event_type") == s).select(
            F.col("user_id").alias("_u"), F.col("ts").alias("_t")
        )
        # the stage floor lives in the JOIN condition (not a post-filter)
        # so users whose stage events all precede the floor keep their
        # row with a null stage time instead of vanishing
        cond = F.col("user_id") == F.col("_u")
        if prev_col is not None:
            cond = cond & (F.col("_t") >= F.col(prev_col))
        tc = f"t_{s}"
        cur = (
            cur.join(ev_s, cond, "left")
            .groupBy("user_id", *t_cols)
            .agg(F.min("_t").alias(tc))
        )
        t_cols.append(tc)
        prev_col = tc
    reached = None
    for tc in t_cols:
        c = F.when(F.col(tc).isNotNull(), 1).otherwise(0)
        reached = c if reached is None else reached + c
    return cur.select("user_id", *t_cols, reached.cast("long").alias("reached"))


def funnel_sql(table: str = "events", stages=FUNNEL_STAGES) -> str:
    s1, s2, s3 = stages
    return f"""
        WITH users AS (SELECT DISTINCT user_id FROM {table}),
        f1 AS (
          SELECT u.user_id, min(e.ts) AS t_{s1}
          FROM users u LEFT JOIN {table} e
            ON e.user_id = u.user_id AND e.event_type = '{s1}'
          GROUP BY u.user_id
        ), f2 AS (
          SELECT f1.user_id, f1.t_{s1},
                 min(CASE WHEN f1.t_{s1} IS NOT NULL THEN e.ts END) AS t_{s2}
          FROM f1 LEFT JOIN {table} e
            ON e.user_id = f1.user_id AND e.event_type = '{s2}'
           AND e.ts >= f1.t_{s1}
          GROUP BY f1.user_id, f1.t_{s1}
        ), f3 AS (
          SELECT f2.user_id, f2.t_{s1}, f2.t_{s2},
                 min(CASE WHEN f2.t_{s2} IS NOT NULL THEN e.ts END) AS t_{s3}
          FROM f2 LEFT JOIN {table} e
            ON e.user_id = f2.user_id AND e.event_type = '{s3}'
           AND e.ts >= f2.t_{s2}
          GROUP BY f2.user_id, f2.t_{s1}, f2.t_{s2}
        )
        SELECT user_id, t_{s1}, t_{s2}, t_{s3},
               ((t_{s1} IS NOT NULL)::INT + (t_{s2} IS NOT NULL)::INT
                + (t_{s3} IS NOT NULL)::INT)::BIGINT AS reached
        FROM f3 ORDER BY user_id
    """


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly retention triangle: cohort = Monday-truncated week of each
    user's first event; one row per (cohort_week, week_offset) with the
    distinct-user count active that week.

    Plan: first-event agg (one shuffle), join back (broadcast — the
    per-user table is small relative to events at corpus scale... it is
    NOT, so hash join on user_id), distinct + hash-agg.
    """
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    j = active.join(firsts, "user_id")
    offset = (
        (F.unix_timestamp(F.col("week").cast("timestamp"))
         - F.unix_timestamp(F.col("cohort_week").cast("timestamp")))
        / (7 * 86400)
    ).cast("long")
    return (
        j.select("user_id", "cohort_week", offset.alias("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )


def retention_cohorts_sql(table: str = "events") -> str:
    return f"""
        WITH firsts AS (
          SELECT user_id, date_trunc('week', min(ts))::TIMESTAMP AS cohort_week
          FROM {table} GROUP BY user_id
        ), active AS (
          SELECT DISTINCT user_id, date_trunc('week', ts)::TIMESTAMP AS week
          FROM {table}
        )
        SELECT f.cohort_week,
               ((epoch(a.week) - epoch(f.cohort_week)) / {7 * 86400})::BIGINT AS week_offset,
               count(DISTINCT a.user_id)::BIGINT AS n_users
        FROM active a JOIN firsts f USING (user_id)
        GROUP BY f.cohort_week, week_offset
        ORDER BY cohort_week, week_offset
    """


def transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition counts over each user's event
    sequence ordered by (ts, event_id): (from_type, to_type, n).

    One shuffle on user_id + one window (lead), then a hash-agg —
    linear in the log.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    pairs = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    return pairs.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )


def transitions_sql(table: str = "events") -> str:
    return f"""
        WITH seq AS (
          SELECT event_type AS from_type,
                 lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ) AS to_type
          FROM {table}
        )
        SELECT from_type, to_type, count(*)::BIGINT AS n
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
        ORDER BY from_type, to_type
    """


def trend(events: DataFrame) -> DataFrame:
    """Per-type linear trend (OLS slope/intercept) of daily value over
    time. ALL sufficient statistics are exact integers — x = day index
    since epoch, y = value in cents — so n, Sx, Sy, Sxy, Sxx are
    bit-identical across engines and the closed-form doubles
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) divide identical operands.

    One hash-agg; the regression itself is a projection (this is how
    closed-form ML fits run at 100 TB — aggregate sufficient statistics,
    solve on the skinny result).
    """
    x = F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 86400).cast("long")
    y = F.round(F.col("value") * 100).cast("long")
    s = events.select("event_type", x.alias("x"), y.alias("y")).groupBy(
        "event_type"
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    denom = s["n"] * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (s["n"] * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / denom.cast("double")
    intercept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / s["n"].cast("double")
    return s.select(
        "event_type", "n",
        F.round(slope, 9).alias("slope_cents_per_day"),
        F.round(intercept, 6).alias("intercept_cents"),
    )


def trend_sql(table: str = "events") -> str:
    return f"""
        WITH s AS (
          SELECT event_type,
                 count(*)::BIGINT AS n,
                 sum(floor(epoch(ts) / 86400)::BIGINT)::BIGINT AS sx,
                 sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sy,
                 sum(floor(epoch(ts) / 86400)::BIGINT
                     * CAST(round(value * 100) AS BIGINT))::BIGINT AS sxy,
                 sum(floor(epoch(ts) / 86400)::BIGINT
                     * floor(epoch(ts) / 86400)::BIGINT)::BIGINT AS sxx
          FROM {table} GROUP BY event_type
        )
        SELECT event_type, n,
               round((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE, 9)
                 AS slope_cents_per_day,
               round((sy::DOUBLE - ((n * sxy - sx * sy)::DOUBLE
                      / (n * sxx - sx * sx)::DOUBLE) * sx::DOUBLE) / n::DOUBLE, 6)
                 AS intercept_cents
        FROM s ORDER BY event_type
    """


def mad_stats(events: DataFrame) -> DataFrame:
    """Robust dispersion per event type: nearest-rank median of value
    (in exact integer cents) and the median absolute deviation around it
    — two selection passes, zero float arithmetic, bit-exact across
    engines. The window sorts run per type on integer keys; at corpus
    scale this is the exact-robust-stats shape (approx path:
    percentile_approx on |y - approx median|).
    """
    from pyspark.sql import Window

    cents = F.round(F.col("value") * 100).cast("long")
    base = events.select("event_type", "event_id", cents.alias("y"))
    w1 = Window.partitionBy("event_type").orderBy(F.asc("y"), F.asc("event_id"))
    ranked = base.withColumn("rn", F.row_number().over(w1)).withColumn(
        "n", F.count("*").over(Window.partitionBy("event_type"))
    )
    med = ranked.filter(
        F.col("rn") == F.ceil(F.lit(0.5) * F.col("n"))
    ).select("event_type", F.col("y").alias("med"))
    dev = base.join(med, "event_type").select(
        "event_type", "event_id", F.abs(F.col("y") - F.col("med")).alias("d"), "med"
    )
    w2 = Window.partitionBy("event_type").orderBy(F.asc("d"), F.asc("event_id"))
    ranked2 = dev.withColumn("rn", F.row_number().over(w2)).withColumn(
        "n", F.count("*").over(Window.partitionBy("event_type"))
    )
    return ranked2.filter(F.col("rn") == F.ceil(F.lit(0.5) * F.col("n"))).select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("med").alias("median_c"),
        F.col("d").alias("mad_c"),
    )


def mad_stats_sql(table: str = "events") -> str:
    return f"""
        WITH base AS (
          SELECT event_type, event_id,
                 CAST(round(value * 100) AS BIGINT) AS y
          FROM {table}
        ), r1 AS (
          SELECT *, row_number() OVER (
                   PARTITION BY event_type ORDER BY y ASC, event_id ASC
                 ) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM base
        ), med AS (
          SELECT event_type, y AS med FROM r1 WHERE rn = ceil(0.5 * n)
        ), dev AS (
          SELECT base.event_type, base.event_id,
                 abs(base.y - med.med) AS d, med.med
          FROM base JOIN med USING (event_type)
        ), r2 AS (
          SELECT *, row_number() OVER (
                   PARTITION BY event_type ORDER BY d ASC, event_id ASC
                 ) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM dev
        )
        SELECT event_type, n::BIGINT AS n, med AS median_c, d AS mad_c
        FROM r2 WHERE rn = ceil(0.5 * n)
        ORDER BY event_type
    """


def fill_gaps(events: DataFrame) -> DataFrame:
    """Daily counts per event type DENSIFIED over the full [min_day,
    max_day] calendar — missing days appear with n = 0 (the gap-filling
    every time-series consumer needs before resampling).

    Plan: one agg for the global day span (broadcast 1-row), a
    ``sequence``-exploded calendar spine cross-joined with the distinct
    type dimension, then a left join of the real daily counts — spine
    cardinality is days x types (tiny next to events), so the only real
    shuffle is the daily-count hash-agg.
    """
    day = F.date_trunc("day", F.col("ts"))
    daily = events.select(day.alias("day"), "event_type").groupBy(
        "day", "event_type"
    ).agg(F.count("*").alias("n"))
    span = events.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    spine = span.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    types = events.select("event_type").distinct()
    full = spine.crossJoin(types)
    return (
        full.join(daily, ["day", "event_type"], "left")
        .select(
            "day", "event_type",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
    )


def fill_gaps_sql(table: str = "events") -> str:
    return f"""
        WITH daily AS (
          SELECT date_trunc('day', ts)::TIMESTAMP AS day, event_type, count(*) AS n
          FROM {table} GROUP BY 1, 2
        ), span AS (
          SELECT date_trunc('day', min(ts))::TIMESTAMP AS d0,
                 date_trunc('day', max(ts))::TIMESTAMP AS d1
          FROM {table}
        ), spine AS (
          SELECT u.day::TIMESTAMP AS day
          FROM span, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS u(day)
        ), types AS (SELECT DISTINCT event_type FROM {table})
        SELECT s.day, t.event_type, coalesce(d.n, 0)::BIGINT AS n
        FROM spine s CROSS JOIN types t
        LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type
        ORDER BY s.day, t.event_type
    """


def unpivot_events(events: DataFrame) -> DataFrame:
    """UNPIVOT (melt): the per-user pivot matrix back to long
    (user_id, event_type, n) keeping only nonzero cells — the native
    ``DataFrame.unpivot`` operator (Spark 3.4+), round-tripping
    ``pivot_events``.
    """
    wide = pivot_events(events)
    long = wide.unpivot(
        ids=["user_id"],
        values=list(EVENT_TYPES),
        variableColumnName="event_type",
        valueColumnName="n",
    )
    return long.filter(F.col("n") > 0).select(
        "user_id", "event_type", F.col("n").cast("long").alias("n")
    )


def unpivot_events_sql(table: str = "events") -> str:
    types = ", ".join(f"'{t}'" for t in EVENT_TYPES)
    return f"""
        SELECT user_id, event_type, count(*)::BIGINT AS n
        FROM {table}
        WHERE event_type IN ({types})
        GROUP BY user_id, event_type
        HAVING count(*) > 0
        ORDER BY user_id, event_type
    """


DEBOUNCE_SECONDS = 60


def debounce(events: DataFrame, min_gap_s: int = DEBOUNCE_SECONDS) -> DataFrame:
    """Stream debouncing: drop events that repeat the same (user_id,
    event_type) within ``min_gap_s`` seconds of the PREVIOUS KEPT event
    of that key... which classic lag() CANNOT express (kept-ness is
    recursive). The industry-standard relaxation implemented here —
    and mirrored exactly in the oracle — drops events within the gap of
    the previous event *of the key* (kept or not): one lag window,
    linear, and idempotent on already-debounced streams.

    Output: the surviving events (event_id, ts, user_id, event_type,
    value).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    prev = F.lag("ts").over(w)
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        prev.cast("timestamp")
    )
    return (
        events.withColumn("gap_us", gap_us)
        .filter(F.col("gap_us").isNull() | (F.col("gap_us") >= min_gap_s * 1_000_000))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


def debounce_sql(table: str = "events", min_gap_s: int = DEBOUNCE_SECONDS) -> str:
    return f"""
        WITH lagged AS (
          SELECT event_id, ts, user_id, event_type, value,
                 lag(ts) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC
                 ) AS prev_ts
          FROM {table}
        )
        SELECT event_id, ts, user_id, event_type, value
        FROM lagged
        WHERE prev_ts IS NULL
           OR date_diff('us', prev_ts, ts) >= {min_gap_s * 1_000_000}
        ORDER BY event_id
    """


def peak_events(events: DataFrame) -> DataFrame:
    """Per-user argmax: the event carrying the user's maximum value,
    via the native ``max_by`` aggregate (ties broken toward the larger
    event_id by maximizing the (value, event_id) struct). One hash-agg —
    no window, no sort.
    """
    key = F.struct(F.col("value"), F.col("event_id"))
    return events.groupBy("user_id").agg(
        F.max_by("event_id", key).cast("long").alias("peak_event_id"),
        F.max_by("event_type", key).alias("peak_type"),
        F.max("value").alias("peak_value"),
        F.count("*").cast("long").alias("n_events"),
    )


def peak_events_sql(table: str = "events") -> str:
    # DuckDB's arg_max takes scalar keys only; the window formulation
    # pins the identical (value desc, event_id desc) selection
    return f"""
        WITH ranked AS (
          SELECT user_id, event_id, event_type, value,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY value DESC, event_id DESC
                 ) AS rn,
                 count(*) OVER (PARTITION BY user_id) AS n_events
          FROM {table}
        )
        SELECT user_id, event_id::BIGINT AS peak_event_id,
               event_type AS peak_type, value AS peak_value,
               n_events::BIGINT AS n_events
        FROM ranked WHERE rn = 1
        ORDER BY user_id
    """


def daily_deltas(events: DataFrame) -> DataFrame:
    """Day-over-day count change per event type over the DENSIFIED daily
    series (composes ``fill_gaps`` so gaps register as drops to zero):
    (day, event_type, n, delta) with delta null on each series' first
    day. One extra lag window over the tiny spine table.
    """
    from pyspark.sql import Window

    daily = fill_gaps(events)
    w = Window.partitionBy("event_type").orderBy(F.asc("day"))
    return daily.select(
        "day",
        "event_type",
        "n",
        (F.col("n") - F.lag("n").over(w)).cast("long").alias("delta"),
    )


def daily_deltas_sql(table: str = "events") -> str:
    return f"""
        WITH filled AS ({fill_gaps_sql(table)})
        SELECT day, event_type, n,
               (n - lag(n) OVER (PARTITION BY event_type ORDER BY day ASC))::BIGINT AS delta
        FROM filled
        ORDER BY day, event_type
    """


def rank_functions(events: DataFrame) -> DataFrame:
    """The full ranking-window family over value per event type — rank,
    dense_rank, percent_rank, cume_dist — in ONE window sort (Catalyst
    collapses same-spec window functions into a single Window node).
    All four are tie-stable (rows with equal value get equal outputs),
    and percent_rank/cume_dist are ratios of integers, so cross-engine
    equality is exact.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(F.asc("value"))
    return events.select(
        "event_id",
        "event_type",
        "value",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


def rank_functions_sql(table: str = "events") -> str:
    return f"""
        SELECT event_id, event_type, value,
               (rank() OVER w)::BIGINT AS rnk,
               (dense_rank() OVER w)::BIGINT AS drnk,
               percent_rank() OVER w AS prank,
               cume_dist() OVER w AS cdist
        FROM {table}
        WINDOW w AS (PARTITION BY event_type ORDER BY value ASC)
        ORDER BY event_id
    """


CHI2_BUCKETS = 4


def chi2_independence(events: DataFrame, buckets: int = CHI2_BUCKETS) -> DataFrame:
    """Pearson chi-square test of independence between event_type and a
    user-hash bucket (user_id % buckets): the feature-association check
    run before trusting a categorical split. Observed counts are exact
    integers; expected = row_total * col_total / n and the statistic
    sum((O-E)^2 / E) use identical double operands in both engines
    (rounded to 9 for the cross-engine hash).

    Output: one row (n, n_cells, dof, chi2). Plan: one contingency
    hash-agg, two tiny marginal re-aggs joined back, one final reduce.
    """
    cell = events.select(
        (F.col("user_id") % buckets).alias("b"), "event_type"
    ).groupBy("b", "event_type").agg(F.count("*").alias("o"))
    row_t = cell.groupBy("b").agg(F.sum("o").alias("rt"))
    col_t = cell.groupBy("event_type").agg(F.sum("o").alias("ct"))
    n = cell.agg(F.sum("o").alias("n"))
    terms = (
        cell.join(row_t, "b")
        .join(col_t, "event_type")
        .crossJoin(F.broadcast(n))
        .select(
            "n",
            (
                (F.col("o") - F.col("rt") * F.col("ct") / F.col("n"))
                * (F.col("o") - F.col("rt") * F.col("ct") / F.col("n"))
                / (F.col("rt") * F.col("ct") / F.col("n"))
            ).alias("term"),
        )
    )
    dims = cell.agg(
        F.count_distinct("b").alias("r"), F.count_distinct("event_type").alias("c")
    )
    return (
        terms.groupBy("n")
        .agg(F.count("*").cast("long").alias("n_cells"), F.round(F.sum("term"), 9).alias("chi2"))
        .crossJoin(F.broadcast(dims))
        .select(
            F.col("n").cast("long").alias("n"),
            "n_cells",
            ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
            "chi2",
        )
    )


def chi2_independence_sql(table: str = "events", buckets: int = CHI2_BUCKETS) -> str:
    return f"""
        WITH cell AS (
          SELECT user_id % {buckets} AS b, event_type, count(*) AS o
          FROM {table} GROUP BY 1, 2
        ), row_t AS (SELECT b, sum(o) AS rt FROM cell GROUP BY b),
        col_t AS (SELECT event_type, sum(o) AS ct FROM cell GROUP BY event_type),
        n AS (SELECT sum(o) AS n FROM cell),
        dims AS (
          SELECT count(DISTINCT b) AS r, count(DISTINCT event_type) AS c FROM cell
        )
        SELECT n.n::BIGINT AS n,
               count(*)::BIGINT AS n_cells,
               ((SELECT (r - 1) * (c - 1) FROM dims))::BIGINT AS dof,
               round(sum(
                 (o - rt * ct / n.n) * (o - rt * ct / n.n) / (rt * ct / n.n)
               ), 9) AS chi2
        FROM cell
        JOIN row_t USING (b)
        JOIN col_t USING (event_type)
        CROSS JOIN n
        GROUP BY n.n
    """


def value_hour_corr(events: DataFrame) -> DataFrame:
    """Pearson correlation between hour-of-day and value per event type,
    from EXACT integer sufficient statistics (hour 0-23 x cents):
    r = (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2)).
    Integer sums are bit-identical across engines; the closed form then
    applies identical double operands in identical order. One hash-agg +
    a projection (the ``corr`` builtin is the float-accumulating analog;
    this is its verifiable twin).
    """
    x = F.hour(F.col("ts").cast("timestamp")).cast("long")
    y = F.round(F.col("value") * 100).cast("long")
    s = events.select("event_type", x.alias("x"), y.alias("y")).groupBy(
        "event_type"
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (s["n"] * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt((s["n"] * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")) * F.sqrt(
        (s["n"] * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return s.select("event_type", "n", F.round(num / den, 9).alias("corr_hour_value"))


def value_hour_corr_sql(table: str = "events") -> str:
    return f"""
        WITH s AS (
          SELECT event_type,
                 count(*)::BIGINT AS n,
                 sum(extract(hour FROM ts)::BIGINT)::BIGINT AS sx,
                 sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sy,
                 sum(extract(hour FROM ts)::BIGINT
                     * CAST(round(value * 100) AS BIGINT))::BIGINT AS sxy,
                 sum(extract(hour FROM ts)::BIGINT
                     * extract(hour FROM ts)::BIGINT)::BIGINT AS sxx,
                 sum(CAST(round(value * 100) AS BIGINT)
                     * CAST(round(value * 100) AS BIGINT))::BIGINT AS syy
          FROM {table} GROUP BY event_type
        )
        SELECT event_type, n,
               round((n * sxy - sx * sy)::DOUBLE
                     / (sqrt((n * sxx - sx * sx)::DOUBLE)
                        * sqrt((n * syy - sy * sy)::DOUBLE)), 9) AS corr_hour_value
        FROM s ORDER BY event_type
    """


def props_keys(events: DataFrame) -> DataFrame:
    """Generic JSON-object profiling (no fixed paths): parse props into
    a MapType and explode its entries — per key: occurrence count,
    distinct values, min/max numeric value. This is the schema-free
    JSON path (``from_json`` to map + ``explode``); ``props_rollup`` is
    the fixed-path twin.
    """
    kv = events.select(
        F.explode(F.from_json(F.col("props"), "map<string,string>")).alias("key", "val")
    )
    v = F.col("val").cast("long")
    return kv.groupBy("key").agg(
        F.count("*").cast("long").alias("n"),
        F.count_distinct("val").cast("long").alias("n_distinct"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def props_keys_sql(table: str = "events") -> str:
    return f"""
        WITH kv AS (
          SELECT u.key, json_extract_string(props, '$.' || u.key) AS val
          FROM {table}, unnest(json_keys(props)) AS u(key)
        )
        SELECT key, count(*)::BIGINT AS n,
               count(DISTINCT val)::BIGINT AS n_distinct,
               min(CAST(val AS BIGINT)) AS min_v,
               max(CAST(val AS BIGINT)) AS max_v
        FROM kv GROUP BY key ORDER BY key
    """
