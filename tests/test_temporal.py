"""Tests for the temporal/custom-operator family: as-of join, binned
range join, grouping-sets rollup, KMV distinct sketch."""

from __future__ import annotations

import datetime as dt

import pytest

from searchgov_spider_spark.functions.hashing import portable_hash32
from searchgov_spider_spark.pipelines import temporal as pt

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def events_df(spark):
    # (event_id, ts, user_id, event_type, value)
    rows = [
        # user 1: clicks at 0, 10, 10 (tie), purchase at 10 (same-ts), 20
        (1, _ts(0), 1, "click", 1.0),
        (2, _ts(10), 1, "click", 1.0),
        (3, _ts(10), 1, "click", 1.0),
        (4, _ts(10), 1, "purchase", 5.0),
        (5, _ts(20), 1, "purchase", 7.0),
        # user 2: purchase with NO prior click, then click, then purchase
        (6, _ts(5), 2, "purchase", 2.0),
        (7, _ts(6), 2, "click", 1.0),
        (8, _ts(90), 2, "purchase", 3.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_asof_join_semantics(events_df):
    got = {r.event_id: r for r in pt.asof_join(events_df).collect()}
    assert set(got) == {4, 5, 6, 8}
    # same-ts click matches (at-or-before), tie -> larger event_id (3)
    assert got[4].match_id == 3 and got[4].lag_us == 0
    # most recent prior click for the later purchase is still id 3
    assert got[5].match_id == 3
    assert got[5].lag_us == 10 * 60 * 1_000_000
    # no prior click -> nulls
    assert got[6].match_id is None and got[6].match_ts is None and got[6].lag_us is None
    # user 2's later purchase matches its only click, 84 minutes earlier
    assert got[8].match_id == 7 and got[8].lag_us == 84 * 60 * 1_000_000


def _sessions(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, session_start timestamp, session_end timestamp"
    )


def test_range_join_overlap_counts(spark):
    s = _sessions(spark, [
        (1, _ts(0), _ts(30)),      # overlaps u2a, u3
        (2, _ts(10), _ts(20)),     # inside u1
        (3, _ts(29), _ts(200)),    # overlaps u1 (1 min), u2b; spans 3 bins
        (2, _ts(30), _ts(40)),     # touches u1 end exactly -> NO overlap with u1
    ])
    got = {(r.user_id, r.session_start): r.n_concurrent
           for r in pt.range_join_concurrency(s, bin_minutes=60).collect()}
    assert got[(1, _ts(0))] == 2      # u2a + u3 (u2b only touches the end)
    assert got[(2, _ts(10))] == 1     # u1 only (u3 starts at 29 >= u2a's end 20)
    assert got[(3, _ts(29))] == 2     # u1 (one minute) + u2b
    assert got[(2, _ts(30))] == 1     # u3 only (half-open: [0,30) doesn't touch)


def test_range_join_matches_bruteforce(spark):
    # deterministic pseudo-random interval set incl. multi-bin spans
    rows = []
    for i in range(40):
        u = i % 7
        start = _ts((i * 37) % 300)
        end = start + dt.timedelta(minutes=5 + (i * 13) % 120)
        rows.append((u, start, end))
    s = _sessions(spark, rows)
    got = {(r.user_id, r.session_start): r.n_concurrent
           for r in pt.range_join_concurrency(s, bin_minutes=60).collect()}
    for (u, st, en) in rows:
        want = sum(
            1 for (u2, st2, en2) in rows
            if u2 != u and st < en2 and st2 < en
        )
        assert got[(u, st)] == want, (u, st)


def test_rollup_hypertable_grains(events_df):
    rows = pt.rollup_hypertable(events_df).collect()
    by_grain = {}
    for r in rows:
        by_grain.setdefault(r.grain, []).append(r)
    # grand total
    assert len(by_grain[7]) == 1
    total = by_grain[7][0]
    assert total.n_events == 8 and total.event_type is None and total.day is None
    # per-type totals sum to the grand total
    assert sum(r.n_events for r in by_grain[3]) == 8
    assert {r.event_type for r in by_grain[3]} == {"click", "purchase"}
    # daily == per-type here (all events on one day except the 90-min one... same day)
    assert sum(r.n_events for r in by_grain[1]) == 8
    # hourly leaves: purchases split across hour 0 and hour 1
    leaves = [r for r in by_grain[0] if r.event_type == "purchase"]
    assert sorted(r.n_events for r in leaves) == [1, 3]
    assert sum(r.sum_value for r in by_grain[0] if r.event_type == "purchase") == pytest.approx(17.0)


def test_kmv_distinct_exact_and_estimate(spark):
    # source "small": fewer distinct tokens than k -> est == exact
    # source "big": 500 distinct tokens, k=64 -> estimator formula
    rows = [(0, "a b c a b", "small")]
    big_tokens = [f"tok{i}" for i in range(500)]
    for j in range(10):
        rows.append((1 + j, " ".join(big_tokens[j * 50:(j + 1) * 50]), "big"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in pt.kmv_distinct(df, k=64).collect()}
    assert got["small"].n_kept == 3
    assert got["small"].est_distinct == 3.0
    assert got["small"].exact_distinct == 3
    # big: python replica of the estimator
    hashes = sorted({portable_hash32(t) for t in big_tokens})
    h_k = hashes[63]
    want = round(63.0 * 4294967296.0 / h_k, 6)
    assert got["big"].h_k == h_k
    assert got["big"].est_distinct == pytest.approx(want, abs=1e-6)
    assert got["big"].exact_distinct == 500
    # the estimate lands within 35% of truth for this k
    assert abs(got["big"].est_distinct - 500) / 500 < 0.35


def test_asof_join_matches_bruteforce_random(spark):
    # deterministic pseudo-random event set with heavy ts ties
    rows = []
    for i in range(300):
        u = i % 5
        ts = _ts((i * 7919) % 97)            # many collisions across users
        et = ("purchase", "click", "view")[i % 3]
        rows.append((i, ts, u, et, 1.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r.event_id: (r.match_id, r.match_ts) for r in pt.asof_join(df).collect()}
    purchases = [(i, ts, u) for (i, ts, u, et, _) in rows if et == "purchase"]
    clicks = [(i, ts, u) for (i, ts, u, et, _) in rows if et == "click"]
    assert len(got) == len(purchases)
    for pid, pts, pu in purchases:
        cands = [(cts, cid) for (cid, cts, cu) in clicks if cu == pu and cts <= pts]
        want = max(cands) if cands else None  # (ts, id) max == latest ts, largest id
        if want is None:
            assert got[pid] == (None, None)
        else:
            assert got[pid] == (want[1], want[0]), pid


def test_plan_shapes(spark):
    """Perf guards: the plans these operators were designed around."""
    from searchgov_spider_spark.pipelines import search as psearch

    events = spark.createDataFrame(
        [(i, _ts(i), i % 3, ("click", "purchase")[i % 2], 1.0)
         for i in range(40)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    # as-of join: exactly ONE exchange (the union shuffles once on user_id)
    plan = pt.asof_join(events)._jdf.queryExecution().optimizedPlan().toString()
    # no quadratic range join in the logical plan: a non-equi Join would
    # appear as Join with a ts-inequality condition
    assert "Join" not in plan or "ts" not in plan.split("Join")[1][:120]

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(30)], "doc_id long, text string"
    )
    # bm25: every join broadcastable side is hinted; no cartesian product
    bm = psearch.bm25_topk(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in bm
    # rollup: grouping sets expand once (single Expand node), one agg pair
    ev_plan = pt.rollup_hypertable(events)._jdf.queryExecution().executedPlan().toString()
    assert ev_plan.count("Expand") == 1


def test_upsert_merge_semantics(spark):
    from searchgov_spider_spark.pipelines.warehouse import upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    got = {r.k: (r.s, r.v) for r in upsert(target, updates, "k").collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_scd2_interval_chain(spark):
    from searchgov_spider_spark.pipelines.warehouse import scd2_intervals

    rows = [
        (1, _ts(0), 7, "signup", 1.0),
        (2, _ts(10), 7, "signup", 2.0),
        (3, _ts(10), 7, "signup", 3.0),   # tie: id breaks the chain order
        (4, _ts(5), 8, "signup", 9.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = sorted(scd2_intervals(df).collect(), key=lambda r: (r.user_id, r.valid_from, r.change_id))
    u7 = [r for r in got if r.user_id == 7]
    assert [r.value for r in u7] == [1.0, 2.0, 3.0]
    assert u7[0].valid_to == u7[1].valid_from == _ts(10)
    assert u7[1].valid_to == _ts(10)  # tied middle interval is zero-length
    assert u7[2].valid_to is None and u7[2].is_current
    (u8,) = [r for r in got if r.user_id == 8]
    assert u8.is_current and u8.valid_from == _ts(5)


def test_compaction_plan_next_fit(spark):
    from searchgov_spider_spark.pipelines.warehouse import compaction_plan

    files = spark.createDataFrame(
        [("p", 1, 900), ("p", 2, 700), ("p", 3, 500), ("p", 4, 300), ("q", 9, 50)],
        "part_key string, file_id long, bytes long",
    )
    rows = {(r.part_key, r.file_id): r for r in compaction_plan(files, 1000).collect()}
    # size-desc order: 900|700|500|300 -> cum-before 0,900,1600,2100 -> grp 0,0,1,2
    assert [rows[("p", i)].grp for i in (1, 2, 3, 4)] == [0, 0, 1, 2]
    assert rows[("p", 1)].grp_bytes == 1600 and rows[("p", 3)].grp_bytes == 500
    # bounded overshoot: bytes-before-last-file in every group < target
    by_grp = {}
    for r in rows.values():
        by_grp.setdefault((r.part_key, r.grp), []).append(r.bytes)
    for sizes in by_grp.values():
        assert sum(sorted(sizes)[1:]) < 1000 if len(sizes) > 1 else True
    assert rows[("q", 9)].grp == 0  # partitions plan independently


def test_zone_map_prune_envelopes(spark):
    from searchgov_spider_spark.pipelines.warehouse import prune_files, zone_map

    data = spark.createDataFrame(
        [(1, 5), (1, 40), (2, 100), (2, 150), (3, 300), (3, 301)],
        "file_id long, stat long",
    )
    zones = zone_map(data, "file_id", "stat")
    got = {r.file_id: r for r in prune_files(zones, lo=50, hi=200).collect()}
    assert (got[1].min_stat, got[1].max_stat, got[1].kept) == (5, 40, False)
    assert got[2].kept and got[2].rows_read == 2
    assert not got[3].kept and got[3].rows_read == 0
    # file 1 straddling the lo bound is kept when its max crosses lo
    got2 = {r.file_id: r for r in prune_files(zones, lo=30, hi=200).collect()}
    assert got2[1].kept and got2[1].rows_read == 2


def test_compaction_plan_invariants_random_manifest(spark):
    """Next-fit invariants on a seeded random manifest: every file
    planned exactly once, grp_bytes is the true per-group sum, and in
    each group the running bytes BEFORE its last (smallest) file stay
    under the target — the bounded-overshoot guarantee."""
    import random

    from searchgov_spider_spark.pipelines.warehouse import compaction_plan

    rng = random.Random(7)
    rows = [
        (f"p{i % 5}", i, rng.randint(1, 3000)) for i in range(200)
    ]
    target = 4096
    files = spark.createDataFrame(rows, "part_key string, file_id long, bytes long")
    got = compaction_plan(files, target).collect()
    assert sorted((r.part_key, r.file_id) for r in got) == sorted(
        (p, f) for p, f, _ in rows
    )
    by_grp = {}
    for r in got:
        by_grp.setdefault((r.part_key, r.grp), []).append((r.bytes, r.file_id))
        assert r.bytes == dict(((p, f), b) for p, f, b in rows)[(r.part_key, r.file_id)]
    for (pk, g), members in by_grp.items():
        total = sum(b for b, _ in members)
        assert all(r.grp_bytes == total for r in got if (r.part_key, r.grp) == (pk, g))
        # desc-bytes order within the group; cum before the last file < target
        ordered = sorted(members, key=lambda t: (-t[0], t[1]))
        cum_before_last = sum(b for b, _ in ordered[:-1])
        assert cum_before_last < target
