"""Plan-shape regression tests: the scale contracts the operators
document (shuffle counts, no per-row Python) asserted on the actual
physical plans, so a future edit cannot silently add an exchange to a
shuffle-free operator."""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


def _n_shuffles(df) -> int:
    # shuffle exchanges only; BroadcastExchange is deliberately allowed
    return len(re.findall(r"(?<!Broadcast)Exchange", _plan(df)))


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [(i, "tok%d alpha beta gamma delta epsilon zeta eta" % i, "s") for i in range(8)]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_media_captions_is_shuffle_free(docs_df):
    from searchgov_spider_spark.pipelines import spans as ps

    df = ps.media_captions(ps.derive_spans(docs_df))
    assert _n_shuffles(df) == 0
    assert "Python" not in _plan(df)  # no UDF in the hot path


def test_derive_flat_spans_is_shuffle_free(docs_df):
    from searchgov_spider_spark.pipelines import spans as ps

    assert _n_shuffles(ps.derive_flat_spans(docs_df)) == 0


def test_pack_spans_single_shard_shuffle(docs_df):
    from searchgov_spider_spark.pipelines import packing as pp
    from searchgov_spider_spark.pipelines import spans as ps

    df = pp.pack_spans(ps.derive_spans(docs_df))
    assert _n_shuffles(df) == 1  # exactly the shard-key window exchange


def test_soft404_is_pure_projection(spark):
    from searchgov_spider_spark.operators.traps import soft404

    pages = spark.createDataFrame(
        [("a.gov", "u", 200, "body")],
        "domain string, url string, http_status int, text string",
    )
    df = soft404(pages)
    assert _n_shuffles(df) == 0


def test_tokenizer_fertility_single_agg_shuffle(docs_df):
    from searchgov_spider_spark.pipelines import textstats as pstats

    assert _n_shuffles(pstats.tokenizer_fertility(docs_df)) == 1


def test_hash_split_is_pure_projection(docs_df):
    from searchgov_spider_spark.pipelines import sampling as psampling

    assert _n_shuffles(psampling.hash_split(docs_df)) == 0


def test_asof_join_single_shuffle(spark):
    from searchgov_spider_spark.pipelines import temporal as pt

    events = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00", "purchase", 1.0, "{}"),
         (2, 1, "2024-01-01 00:00:01", "click", 1.0, "{}")],
        "event_id long, user_id long, ts string, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    assert _n_shuffles(pt.asof_join(events)) == 1


def test_exact_dedup_single_agg_shuffle(docs_df):
    from searchgov_spider_spark.pipelines import dedup as pd

    assert _n_shuffles(pd.exact_dup_groups(docs_df)) == 1


def test_span_ops_tolerate_empty_spans(spark):
    # Spark's sequence(1, 0) is descending [1, 0] (DuckDB's is empty);
    # the span operators guard it so real spans tables may hold []
    from searchgov_spider_spark.pipelines import spans as ps

    df = spark.createDataFrame(
        [(0, []), (1, [("text", "hi", None, 0)]), (2, [("media", None, "m.png", 0)])],
        f"doc_id long, spans {ps.SPAN_SCHEMA}",
    )
    caps = ps.media_captions(df).collect()
    assert [(r["doc_id"], r["media_ref"]) for r in caps] == [(2, "m.png")]
    prof = {r["doc_id"]: r for r in ps.interleave_profile(df).collect()}
    assert prof[0]["n_spans"] == 0 and prof[0]["longest_text_run"] == 0
    assert prof[1]["longest_text_run"] == 1
    assert prof[2]["longest_text_run"] == 0


def test_epoch_shuffle_is_pure_projection(docs_df):
    from searchgov_spider_spark.pipelines import sampling as psampling

    df = psampling.epoch_shuffle(docs_df)
    assert _n_shuffles(df) == 0
    assert "Python" not in _plan(df)


def test_modality_mix_single_agg_shuffle(docs_df):
    from searchgov_spider_spark.pipelines import spans as ps

    df = ps.modality_mix(ps.derive_spans(docs_df, keep=("source",)))
    assert _n_shuffles(df) == 1  # the per-source hash-agg, nothing else
    assert "Generate" not in _plan(df)  # no explode: array fns only


def test_bpe_pairs_two_agg_shuffles(docs_df):
    from searchgov_spider_spark.pipelines import textstats as pstats

    df = pstats.bpe_pairs(docs_df)
    assert _n_shuffles(df) == 2  # word-count agg + pair agg
    assert "Python" not in _plan(df)


def test_compaction_plan_manifest_windows_only(spark):
    from searchgov_spider_spark.pipelines.warehouse import compaction_plan

    files = spark.createDataFrame(
        [("p", 1, 10)], "part_key string, file_id long, bytes long"
    )
    df = compaction_plan(files, 100)
    # both windows share the part_key partitioning: at most 2 exchanges
    assert _n_shuffles(df) <= 2


def test_mirror_hosts_no_cartesian(spark):
    from searchgov_spider_spark.pipelines import search as psearch

    pages = spark.createDataFrame(
        [("a.gov", "f1"), ("b.gov", "f1")], "host string, fp string"
    )
    plan = (
        psearch.mirror_hosts(pages)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan  # pair join keyed on fp, never all-pairs


def test_semdedup_no_cartesian_beyond_centroid_broadcast(spark):
    from searchgov_spider_spark.pipelines import similarity as psim

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    plan = (
        psim.semdedup(emb, n_centroids=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only product is the broadcast of k centroid vectors; the
    # intra-cluster pair join is keyed on cluster_id
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_span_integrity_is_shuffle_free(docs_df):
    from searchgov_spider_spark.pipelines import spans as ps

    df = ps.span_integrity(ps.corrupt_spans(ps.derive_spans(docs_df)))
    assert _n_shuffles(df) == 0
    assert "Python" not in _plan(df)


def test_skew_plan_single_shuffle_broadcast_total(spark):
    from searchgov_spider_spark.pipelines.profiling import skew_plan

    df = spark.createDataFrame([("d%d" % (i % 3),) for i in range(30)], "domain string")
    plan = _plan(skew_plan(df, "domain", 5))
    # one hash-agg shuffle on the key; the 1-row total joins via broadcast
    assert _n_shuffles(skew_plan(df, "domain", 5)) <= 2
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_partition_plan_two_aggs_no_sort_join(spark):
    from searchgov_spider_spark.pipelines.profiling import partition_plan

    df = spark.createDataFrame(
        [(f"https://d{i%3}.gov/{i}", f"d{i%3}.gov") for i in range(30)],
        "url string, domain string",
    )
    plan = _plan(partition_plan(df, 8))
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan  # hash32 is JVM-side md5, not a UDF


def test_heavy_keys_never_shuffles_raw_keys(spark):
    from searchgov_spider_spark.pipelines.profiling import heavy_keys

    df = spark.createDataFrame([("k%d" % (i % 4),) for i in range(40)], "k string")
    plan = _plan(heavy_keys(df, "k", capacity=2))
    # the raw stream is probed via broadcast; the only exchanges are the
    # candidate distinct + the candidate-bounded recount
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_decontaminate_broadcast_probe(spark):
    from searchgov_spider_spark.pipelines.cleaning import bloom_decontaminate

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta iota") for i in range(4)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon zeta eta theta")], "doc_id long, text string"
    )
    plan = _plan(bloom_decontaminate(docs, bench))
    assert "BroadcastExchange" in plan  # bit list + bench grams broadcast
    # the gram/position PROBES must be broadcast joins; the only sort-
    # merge joins allowed are the two per-doc assembly joins on doc_id
    # (bloom_hits / exact_hits back onto docs — both sides legitimately
    # big at corpus scale)
    assert len(re.findall(r"SortMergeJoin \[doc_id", plan)) == plan.count("SortMergeJoin")


def test_opic_one_shuffle_per_round_shape(spark):
    from searchgov_spider_spark.pipelines.search import opic

    nodes = spark.createDataFrame([(i,) for i in range(6)], "node long")
    edges = spark.createDataFrame([(i, (i + 1) % 6) for i in range(6)], "src long, dst long")
    plan = _plan(opic(nodes, edges, n_iter=2))
    assert "Python" not in plan  # pure DataFrame integer arithmetic


def test_surt_cdx_single_window_shuffle(spark):
    from searchgov_spider_spark.operators.archive import cdx_index

    log = spark.createDataFrame(
        [("https://a.gov/x", 1, 200, "text/html", "d1", 10)],
        "url string, fetch_ts long, http_status long, mime string, digest string, n_bytes long",
    )
    df = cdx_index(log)
    plan = _plan(df)
    assert _n_shuffles(df) == 1  # exactly the per-surt lag window exchange
    assert "Python" not in plan  # SURT is pure codegen, no UDF


def test_conditional_fetch_no_cartesian(spark):
    from searchgov_spider_spark.operators.archive import conditional_fetch_plan

    cand = spark.createDataFrame(
        [("u1", "d.gov", "c1")], "url string, domain string, cur_digest string"
    )
    prior = spark.createDataFrame(
        [("u1", "e", "lm", "c1", 9)],
        "url string, etag string, last_modified string, digest string, n_bytes long",
    )
    plan = _plan(conditional_fetch_plan(cand, prior))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "Python" not in plan


def test_wave_eta_two_bounded_aggs(spark):
    from searchgov_spider_spark.operators.politeness import wave_eta

    sched = spark.createDataFrame([("d.gov",)], "domain string")
    df = wave_eta(sched)
    assert _n_shuffles(df) <= 2  # domain agg + worker agg, both map-side combined
    assert "Python" not in _plan(df)


def test_mixture_temperature_broadcast_total(docs_df):
    from searchgov_spider_spark.pipelines.sampling import mixture_temperature

    plan = _plan(mixture_temperature(docs_df))
    assert "Broadcast" in plan  # 1-row total joins broadcast, never sort-merge
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan


def test_hll_registers_no_python_no_join(spark):
    from searchgov_spider_spark.pipelines.profiling import hll_registers

    df = spark.createDataFrame([(1,)], "user_id long")
    plan = _plan(hll_registers(df, "user_id"))
    assert "Python" not in plan  # rho via bin/lpad/instr codegen
    assert "Join" not in plan  # registers + exact counts in one agg tree


def test_quantile_sketch_broadcast_stats_no_global_sort(spark):
    from searchgov_spider_spark.pipelines.profiling import quantile_sketch

    ev = spark.createDataFrame([("t", 1.0)], "event_type string, value double")
    plan = _plan(quantile_sketch(ev))
    assert "Broadcast" in plan  # per-group stats broadcast back
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan


def test_bitext_mine_broadcasts_bounded_sides(spark):
    from searchgov_spider_spark.pipelines.similarity import bitext_mine

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)], "vec_id long, embedding array<double>"
    )
    plan = _plan(bitext_mine(emb, n_queries=2, k=2))
    assert "CartesianProduct" not in plan  # only broadcast nested-loop fans out
    assert "Python" not in plan  # cosine is higher-order codegen, no UDF
