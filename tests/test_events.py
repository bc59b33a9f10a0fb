"""Event sessionization + JSON props rollup (pipelines/events.py)."""

from datetime import datetime

import pytest

from searchgov_spider_spark.pipelines import events as pe


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, ts, uid, "view", v, p) for i, (ts, uid, v, p) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_sessionize_merge_and_boundary(spark):
    t = lambda m, s=0: datetime(2024, 1, 1, 0, m, s)
    df = _ev(
        spark,
        [
            (t(0), 1, 1.0, "{}"),
            (t(29, 59), 1, 2.0, "{}"),   # < 30 min after last -> same session
            (t(59, 59), 1, 4.0, "{}"),   # extends again (gap from LAST event)
            (t(0), 2, 8.0, "{}"),
            (t(30), 2, 16.0, "{}"),      # exactly the gap -> still MERGES
            (t(0), 3, 32.0, "{}"),
            (datetime(2024, 1, 1, 0, 30, 0, 1), 3, 64.0, "{}"),  # past gap -> new
        ],
    )
    out = pe.sessionize(df, gap_minutes=30).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 1
    s = by_user[1][0]
    assert s["n_events"] == 3 and s["total_value"] == 7.0
    assert s["session_start"] == t(0)
    assert s["session_end"] == datetime(2024, 1, 1, 1, 29, 59)  # last + gap
    # Spark session_window merges an event landing exactly at last + gap
    assert len(by_user[2]) == 1 and by_user[2][0]["n_events"] == 2
    assert len(by_user[3]) == 2
    assert sorted(r["n_events"] for r in by_user[3]) == [1, 1]


def test_props_rollup_extracts_json(spark):
    df = _ev(
        spark,
        [
            (datetime(2024, 1, 1), 1, 0.0, '{"k": 5}'),
            (datetime(2024, 1, 2), 1, 0.0, '{"k": 5}'),
            (datetime(2024, 1, 3), 2, 0.0, '{"k": 7}'),
            (datetime(2024, 1, 4), 2, 0.0, "not json"),
        ],
    )
    row = pe.props_rollup(df).collect()[0]
    assert row["event_type"] == "view"
    assert row["n_events"] == 4
    assert row["sum_k"] == 17          # malformed props -> null, ignored by sum
    assert row["distinct_k"] == 2      # countDistinct skips the null


def _ev_typed(spark, rows):
    """rows: (event_id, ts, user_id, event_type, value)"""
    return spark.createDataFrame(
        [(i, ts, uid, et, v, "{}") for (i, ts, uid, et, v) in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_percentiles_nearest_rank(spark):
    t = datetime(2024, 1, 1)
    # 10 values 1..10 for type a; 3 values for type b
    rows = [(i, t, 1, "a", float(i + 1)) for i in range(10)]
    rows += [(100 + i, t, 1, "b", float(v)) for i, v in enumerate((5, 1, 9))]
    out = {r.event_type: r for r in pe.percentiles_exact(_ev_typed(spark, rows)).collect()}
    a = out["a"]
    # nearest-rank: ceil(0.5*10)=5 -> 5.0; ceil(0.9*10)=9 -> 9.0; ceil(0.99*10)=10 -> 10.0
    assert (a.n, a.p50, a.p90, a.p99) == (10, 5.0, 9.0, 10.0)
    b = out["b"]
    # sorted [1,5,9]: ceil(1.5)=2 -> 5; ceil(2.7)=3 -> 9; ceil(2.97)=3 -> 9
    assert (b.n, b.p50, b.p90, b.p99) == (3, 5.0, 9.0, 9.0)


def test_rolling_stats_frames(spark):
    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [(i, t(i), 7, "a", float(i)) for i in range(6)]
    out = sorted(pe.rolling_stats(_ev_typed(spark, rows), window_rows=4).collect(),
                 key=lambda r: r.event_id)
    # trailing-4 count saturates at 4; cumulative keeps growing
    assert [r.w_n for r in out] == [1, 2, 3, 4, 4, 4]
    assert [r.cum_n for r in out] == [1, 2, 3, 4, 5, 6]
    assert out[5].w_sum == 2.0 + 3 + 4 + 5


def test_pivot_events_counts(spark):
    t = datetime(2024, 1, 1)
    rows = [
        (0, t, 1, "click", 0.0), (1, t, 1, "click", 0.0), (2, t, 1, "view", 0.0),
        (3, t, 2, "purchase", 0.0),
    ]
    out = {r.user_id: r for r in pe.pivot_events(_ev_typed(spark, rows)).collect()}
    assert (out[1].click, out[1].view, out[1].purchase, out[1].total) == (2, 1, 0, 3)
    assert (out[2].purchase, out[2].click, out[2].total) == (1, 0, 1)


def test_hopping_counts_overlap(spark):
    # one event at 00:07 -> windows [00:00,00:10) and [00:05,00:15)
    rows = [(0, datetime(2024, 1, 1, 0, 7), 1, "a", 2.5)]
    out = sorted(pe.hopping_counts(_ev_typed(spark, rows)).collect(),
                 key=lambda r: r.window_start)
    assert len(out) == 2
    assert out[0].window_start == datetime(2024, 1, 1, 0, 0)
    assert out[0].window_end == datetime(2024, 1, 1, 0, 10)
    assert out[1].window_start == datetime(2024, 1, 1, 0, 5)
    assert all(r.n == 1 and r.sum_value == 2.5 for r in out)


def test_incremental_counts_equals_full(spark):
    t = lambda d: datetime(2024, 1, d)
    rows = [(i, t(1 + i % 28), i % 5, "ab"[i % 2], float(i) * 0.37) for i in range(60)]
    df = _ev_typed(spark, rows)
    got = {r.event_type: (r.n, r.sum_c)
           for r in pe.incremental_counts(df, cutoff="2024-01-15").collect()}
    want = {}
    for i, ts, uid, et, v in rows:
        n, s = want.get(et, (0, 0))
        want[et] = (n + 1, s + round(v * 100))
    assert got == want


def test_funnel_ordered_stages(spark):
    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        # user 1: complete in-order funnel
        (0, t(0), 1, "view", 0.0), (1, t(5), 1, "click", 0.0), (2, t(9), 1, "purchase", 0.0),
        # user 2: purchase BEFORE click -> only view+click count in order
        (3, t(0), 2, "view", 0.0), (4, t(2), 2, "purchase", 0.0), (5, t(4), 2, "click", 0.0),
        # user 3: no view at all -> later stages can't start
        (6, t(1), 3, "click", 0.0), (7, t(2), 3, "purchase", 0.0),
    ]
    df = _ev_typed(spark, rows)
    got = {r.user_id: r for r in pe.funnel(df).collect()}
    assert got[1].reached == 3 and got[1].t_purchase == t(9)
    assert got[2].reached == 2 and got[2].t_click == t(4) and got[2].t_purchase is None
    assert got[3].reached == 0 and got[3].t_view is None
    # user 2 has no purchase AT OR AFTER the click
    # user 1's stage times are ordered
    assert got[1].t_view <= got[1].t_click <= got[1].t_purchase


def test_transitions_counts(spark):
    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        (0, t(0), 1, "view", 0.0), (1, t(1), 1, "click", 0.0), (2, t(2), 1, "view", 0.0),
        (3, t(0), 2, "view", 0.0), (4, t(1), 2, "click", 0.0),
    ]
    got = {(r.from_type, r.to_type): r.n for r in pe.transitions(_ev_typed(spark, rows)).collect()}
    assert got == {("view", "click"): 2, ("click", "view"): 1}


def test_retention_cohorts_offsets(spark):
    # user 1 first active week 0, also week 2; user 2 only week 1
    d = lambda day: datetime(2024, 1, day)  # 2024-01-01 is a Monday
    rows = [
        (0, d(2), 1, "view", 0.0), (1, d(16), 1, "view", 0.0),
        (2, d(9), 2, "view", 0.0),
    ]
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in pe.retention_cohorts(_ev_typed(spark, rows)).collect()}
    assert got[(d(1), 0)] == 1 and got[(d(1), 2)] == 1
    assert got[(d(8), 0)] == 1
    assert len(got) == 3


def test_trend_exact_ols(spark):
    # y = 200 + 300*x cents exactly -> slope 300, intercept 200
    rows = [
        (i, datetime(2024, 1, 1 + x), 1, "a", (2.0 + 3.0 * x))
        for i, x in enumerate(range(10))
    ]
    df = _ev_typed(spark, rows)
    (r,) = pe.trend(df).collect()
    assert r.n == 10
    assert r.slope_cents_per_day == pytest.approx(300.0, abs=1e-9)
    # intercept is at x=0 (epoch day), far from 2024 -> recompute exactly
    import math
    xs = [int(datetime(2024, 1, 1 + x).timestamp() // 86400) for x in range(10)]
    ys = [round((2.0 + 3.0 * x) * 100) for x in range(10)]
    n = 10
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    assert r.slope_cents_per_day == pytest.approx(slope, abs=1e-9)
    assert r.intercept_cents == pytest.approx(round(intercept, 6), abs=1e-6)


def test_mad_stats_exact(spark):
    t = datetime(2024, 1, 1)
    # values 1..9 -> median 5.00 (500c); deviations [0..4]*100 doubled ->
    # sorted d: 0,100,100,200,200,300,300,400,400 -> rank ceil(4.5)=5 -> 200
    rows = [(i, t, 1, "a", float(i + 1)) for i in range(9)]
    (r,) = pe.mad_stats(_ev_typed(spark, rows)).collect()
    assert (r.event_type, r.n, r.median_c, r.mad_c) == ("a", 9, 500, 200)


def test_fill_gaps_zero_days(spark):
    d = lambda day: datetime(2024, 1, day)
    rows = [(0, d(1), 1, "a", 0.0), (1, d(4), 1, "a", 0.0), (2, d(2), 1, "b", 0.0)]
    got = {(r.day, r.event_type): r.n for r in pe.fill_gaps(_ev_typed(spark, rows)).collect()}
    # 4-day span x 2 types = 8 rows, gaps zero-filled
    assert len(got) == 8
    assert got[(d(1), "a")] == 1 and got[(d(2), "a")] == 0
    assert got[(d(3), "b")] == 0 and got[(d(2), "b")] == 1


def test_unpivot_roundtrip(spark):
    t = datetime(2024, 1, 1)
    rows = [(0, t, 1, "click", 0.0), (1, t, 1, "click", 0.0), (2, t, 2, "view", 0.0)]
    got = {(r.user_id, r.event_type): r.n
           for r in pe.unpivot_events(_ev_typed(spark, rows)).collect()}
    assert got == {(1, "click"): 2, (2, "view"): 1}


def test_debounce_keeps_first_and_spaced(spark):
    from datetime import timedelta

    t = lambda s: datetime(2024, 1, 1) + timedelta(seconds=s)
    rows = [
        (0, t(0), 1, "a", 0.0),
        (1, t(30), 1, "a", 0.0),   # 30s < 60 -> dropped
        (2, t(70), 1, "a", 0.0),   # 40s after id 1 (kept or not) -> dropped
        (3, t(45), 1, "b", 0.0),   # other type -> kept
        (4, t(0), 2, "a", 0.0),    # other user -> kept
    ]
    kept = sorted(r.event_id for r in pe.debounce(_ev_typed(spark, rows), min_gap_s=60).collect())
    assert kept == [0, 3, 4]


def test_peak_events_argmax_ties(spark):
    t = datetime(2024, 1, 1)
    rows = [
        (0, t, 1, "a", 5.0), (1, t, 1, "b", 9.0), (2, t, 1, "c", 9.0),  # tie -> id 2
        (3, t, 2, "a", 1.0),
    ]
    got = {r.user_id: r for r in pe.peak_events(_ev_typed(spark, rows)).collect()}
    assert (got[1].peak_event_id, got[1].peak_type, got[1].peak_value, got[1].n_events) == (2, "c", 9.0, 3)
    assert got[2].peak_event_id == 3


def test_daily_deltas_on_gapped_series(spark):
    d = lambda day: datetime(2024, 1, day)
    rows = [(0, d(1), 1, "a", 0.0), (1, d(1), 1, "a", 0.0), (2, d(3), 1, "a", 0.0)]
    got = {r.day: (r.n, r.delta) for r in pe.daily_deltas(_ev_typed(spark, rows)).collect()}
    assert got[d(1)] == (2, None)
    assert got[d(2)] == (0, -2)
    assert got[d(3)] == (1, 1)


def test_rank_functions_ties(spark):
    t = datetime(2024, 1, 1)
    rows = [(0, t, 1, "a", 1.0), (1, t, 1, "a", 2.0), (2, t, 1, "a", 2.0), (3, t, 1, "a", 3.0)]
    got = {r.event_id: r for r in pe.rank_functions(_ev_typed(spark, rows)).collect()}
    # ties at 2.0: rank 2,2 then 4; dense 2,2 then 3
    assert (got[1].rnk, got[2].rnk, got[3].rnk) == (2, 2, 4)
    assert (got[1].drnk, got[2].drnk, got[3].drnk) == (2, 2, 3)
    assert got[0].prank == 0.0 and got[3].prank == 1.0
    assert got[1].cdist == got[2].cdist == 0.75
    assert got[3].cdist == 1.0


def test_chi2_independence_matches_scipy_free_python(spark):
    t = datetime(2024, 1, 1)
    # build a 2-bucket x 2-type table with known association
    rows = []
    i = 0
    for b, et, n in ((0, "a", 30), (0, "b", 10), (1, "a", 10), (1, "b", 30)):
        for _ in range(n):
            rows.append((i * 2 + b, t, i * 2 + b, et, 0.0))  # user_id parity = bucket
            i += 1
    df = _ev_typed(spark, rows)
    (r,) = pe.chi2_independence(df, buckets=2).collect()
    assert r.n == 80 and r.n_cells == 4 and r.dof == 1
    # python replica
    obs = {(0, "a"): 0, (0, "b"): 0, (1, "a"): 0, (1, "b"): 0}
    for (eid, _, uid, et, _) in rows:
        obs[(uid % 2, et)] += 1
    nrow = {b: obs[(b, "a")] + obs[(b, "b")] for b in (0, 1)}
    ncol = {c: obs[(0, c)] + obs[(1, c)] for c in ("a", "b")}
    n = 80
    chi2 = sum(
        (o - nrow[b] * ncol[c] / n) ** 2 / (nrow[b] * ncol[c] / n)
        for (b, c), o in obs.items()
    )
    assert r.chi2 == pytest.approx(round(chi2, 9), abs=1e-9)
    assert r.chi2 > 3.84  # significant at p < .05, dof 1 (by construction)


def test_hour_corr_exact(spark):
    # perfect positive correlation: value == hour -> r == 1
    rows = [(i, datetime(2024, 1, 1, h), 1, "a", float(h)) for i, h in enumerate(range(24))]
    # no correlation by symmetry: value alternates independent of hour
    rows += [(100 + i, datetime(2024, 1, 2, h), 1, "b", float(i % 2))
             for i, h in enumerate(range(0, 24, 2))]
    df = _ev_typed(spark, rows)
    got = {r.event_type: r.corr_hour_value for r in pe.value_hour_corr(df).collect()}
    assert got["a"] == pytest.approx(1.0, abs=1e-9)
    import statistics
    xs = list(range(0, 24, 2))
    ys = [i % 2 for i in range(len(xs))]
    want = statistics.correlation([float(x) for x in xs], [float(y * 100) for y in ys])
    assert got["b"] == pytest.approx(round(want, 9), abs=1e-6)


def test_props_keys_multikey(spark):
    t = datetime(2024, 1, 1)
    rows = [
        (0, t, 1, "a", 0.0, '{"k": 5, "j": 2}'),
        (1, t, 1, "a", 0.0, '{"k": 7}'),
        (2, t, 2, "a", 0.0, '{"j": 9}'),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {r.key: r for r in pe.props_keys(df).collect()}
    assert (got["k"].n, got["k"].n_distinct, got["k"].min_v, got["k"].max_v) == (2, 2, 5, 7)
    assert (got["j"].n, got["j"].min_v, got["j"].max_v) == (2, 2, 9)
