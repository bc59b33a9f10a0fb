"""Degenerate-input behavior for the operator surface: empty inputs,
below-threshold corpora, k > n — operators must return empty/total
results, never throw."""

from __future__ import annotations

import datetime as dt

from searchgov_spider_spark.pipelines import events as pe
from searchgov_spider_spark.pipelines import temporal as pt
from searchgov_spider_spark.pipelines.dedup import overlap_join
from searchgov_spider_spark.pipelines.sampling import weighted_sample
from searchgov_spider_spark.pipelines.textstats import pmi_bigrams

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_asof_join_no_right_side(spark):
    rows = [(1, dt.datetime(2024, 1, 1), 1, "purchase", 1.0, "{}")]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = pt.asof_join(df).collect()
    assert len(out) == 1
    assert out[0].match_id is None and out[0].lag_us is None


def test_asof_join_empty_input(spark):
    df = spark.createDataFrame([], EV_SCHEMA)
    assert pt.asof_join(df).collect() == []


def test_pmi_no_bigrams(spark):
    # single-token and empty docs: no adjacent pairs anywhere
    df = spark.createDataFrame(
        [(0, "alone"), (1, ""), (2, "   ")], "doc_id long, text string"
    )
    assert pmi_bigrams(df, k=5, min_count=1).collect() == []


def test_overlap_join_below_threshold(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, "a b")], "doc_id long, text string"
    )
    # both sets have 2 tokens < min_overlap -> dropped before the join
    assert overlap_join(df, min_overlap=3).collect() == []


def test_weighted_sample_k_exceeds_n(spark):
    df = spark.createDataFrame(
        [(0, "x", "s", 10), (1, "y", "s", 20)],
        "doc_id long, text string, source string, n_chars long",
    )
    out = weighted_sample(df, k=50).collect()
    assert len(out) == 2
    assert sorted(r.rank for r in out) == [1, 2]


def test_percentiles_single_row(spark):
    df = spark.createDataFrame(
        [(0, dt.datetime(2024, 1, 1), 1, "a", 3.5, "{}")], EV_SCHEMA
    )
    (r,) = pe.percentiles_exact(df).collect()
    assert (r.n, r.p50, r.p90, r.p99) == (1, 3.5, 3.5, 3.5)


def test_funnel_empty(spark):
    df = spark.createDataFrame([], EV_SCHEMA)
    assert pe.funnel(df).collect() == []


def test_rollup_empty(spark):
    df = spark.createDataFrame([], EV_SCHEMA)
    rows = pt.rollup_hypertable(df).collect()
    # grouping sets over empty input: only the () grand-total row with 0
    # events — or nothing, depending on engine semantics; pin Spark's
    grains = sorted(r.grain for r in rows)
    assert grains in ([], [7])


def test_kmv_empty_source(spark):
    df = spark.createDataFrame([(0, "", "s")], "doc_id long, text string, source string")
    assert pt.kmv_distinct(df).collect() == []
