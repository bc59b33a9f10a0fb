"""Event sessionization + JSON props rollup (pipelines/events.py)."""

from datetime import datetime

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
