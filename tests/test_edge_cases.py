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


def test_compaction_plan_ties_and_oversize(spark):
    from searchgov_spider_spark.pipelines.warehouse import compaction_plan

    files = spark.createDataFrame(
        # equal bytes: file_id breaks the order; 1500 alone exceeds target
        [("p", 2, 400), ("p", 1, 400), ("p", 3, 1500)],
        "part_key string, file_id long, bytes long",
    )
    rows = {r.file_id: r for r in compaction_plan(files, 1000).collect()}
    # desc bytes, asc file_id: 1500(f3) | 400(f1), 400(f2)
    assert rows[3].grp == 0 and rows[3].grp_bytes == 1500  # oversize file alone
    assert rows[1].grp == 1 and rows[2].grp == 1
    assert rows[1].grp_bytes == 800
    # empty manifest plans to nothing
    empty = spark.createDataFrame([], "part_key string, file_id long, bytes long")
    assert compaction_plan(empty, 1000).collect() == []


def test_mirror_hosts_degenerate_inputs(spark):
    from searchgov_spider_spark.pipelines import search as psearch

    # identical fingerprint sets -> resemblance exactly 1.0 (1e6 ppm)
    pages = spark.createDataFrame(
        [("a.gov", "f1"), ("a.gov", "f2"), ("b.gov", "f1"), ("b.gov", "f2")],
        "host string, fp string",
    )
    r = psearch.mirror_hosts(pages, threshold_ppm=1_000_000).collect()
    assert len(r) == 1 and r[0].jaccard_ppm == 1_000_000
    # everything boilerplate under a tiny df-cut -> no pairs at all
    assert psearch.mirror_hosts(pages, threshold_ppm=1, max_hosts_per_fp=1).count() == 0
    # empty input
    empty = spark.createDataFrame([], "host string, fp string")
    assert psearch.mirror_hosts(empty).collect() == []


def test_bpe_pairs_short_words_only(spark):
    from searchgov_spider_spark.pipelines.textstats import bpe_pairs

    docs = spark.createDataFrame(
        [(0, "a b c a"), (1, "x y")], "doc_id long, text string"
    )
    # every word is 1 char: no adjacent pairs exist
    assert bpe_pairs(docs, min_freq=1).collect() == []


def test_semdedup_more_centroids_than_rows(spark):
    from searchgov_spider_spark.pipelines import similarity as psim

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 0.001])],
        "vec_id long, embedding array<float>",
    )
    # n_centroids > n rows: every vector is its own centroid, so every
    # cluster is a singleton and nothing can be a duplicate
    rows = {r.vec_id: r for r in psim.semdedup(emb, n_centroids=10, threshold=0.9).collect()}
    assert all(r.is_kept for r in rows.values())
    assert {r.cluster_id for r in rows.values()} == {0, 1, 2}
    # with 2 centroids, v2 is no longer a centroid: it lands in v0's
    # cluster (cos ~1) and is its dup at threshold 0.9
    rows2 = {r.vec_id: r for r in psim.semdedup(emb, n_centroids=2, threshold=0.9).collect()}
    assert rows2[0].is_kept and rows2[1].is_kept
    assert not rows2[2].is_kept and rows2[2].dup_of == 0 and rows2[2].cluster_id == 0


def test_dsir_weights_absent_target_source(spark):
    from searchgov_spider_spark.pipelines.sampling import dsir_weights

    docs = spark.createDataFrame(
        [(0, "alpha beta", "s1"), (1, "beta gamma", "s2")],
        "doc_id long, text string, source string",
    )
    rows = dsir_weights(docs, target_source="nope").collect()
    # target counts are all zero: weights are finite and defined
    assert len(rows) == 2
    assert all(r.log_weight == r.log_weight for r in rows)  # not NaN


def test_epoch_shuffle_empty_and_modality_empty_text(spark):
    from searchgov_spider_spark.pipelines import spans as pspans
    from searchgov_spider_spark.pipelines.sampling import epoch_shuffle

    empty = spark.createDataFrame([], "doc_id long, text string, source string")
    assert epoch_shuffle(empty).collect() == []
    # empty text tokenizes to [''] -> one zero-length text span, no media
    one = spark.createDataFrame([(0, "", "s")], "doc_id long, text string, source string")
    r = pspans.modality_mix(pspans.derive_spans(one, keep=("source",))).collect()
    assert len(r) == 1 and (r[0].text_spans, r[0].media_spans) == (1, 0)
    assert r[0].media_share_ppm == 0
