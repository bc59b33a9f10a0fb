"""Deterministic sampling / splitting (pipelines/sampling.py).

The properties that make a split usable for training-data prep:
stability (assignment is a pure function of the key, immune to
partitioning and appends), weight fidelity, and — for the
leakage-safe variant — the invariant that no near-dup pair ever
straddles two splits.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from searchgov_spider_spark.pipelines import dedup as pdedup
from searchgov_spider_spark.pipelines import sampling as ps


def _docs(spark, n=4000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("token"), (F.col("id") % 7).cast("string")).alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("es"), F.lit("zh"), F.lit("fr")),
            ((F.col("id") % 4) + 1).cast("int"),
        ).alias("lang"),
    )


def test_split_is_stable_under_partitioning_and_subsets(spark):
    docs = _docs(spark)
    full = {r["doc_id"]: r["split"] for r in ps.hash_split(docs, "doc_id").collect()}
    # repartitioned + filtered view: every doc keeps its split (the
    # incremental-append guarantee — rand() fails exactly this test)
    subset = ps.hash_split(docs.where("doc_id % 3 = 0").repartition(13), "doc_id")
    for r in subset.collect():
        assert full[r["doc_id"]] == r["split"]


def test_split_weights_and_bucket_range(spark):
    out = ps.hash_split(_docs(spark), "doc_id").collect()
    n = len(out)
    counts = {}
    for r in out:
        assert 0 <= r["split_bucket"] < ps.SPLIT_BUCKETS
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert set(counts) == {"train", "val", "test"}
    # md5 buckets over 4000 keys: expect weights within a loose tolerance
    assert abs(counts["train"] / n - 0.9) < 0.03
    assert abs(counts["val"] / n - 0.05) < 0.02
    assert abs(counts["test"] / n - 0.05) < 0.02


def test_custom_weights_cover_all_buckets(spark):
    out = ps.hash_split(_docs(spark, 500), "doc_id", weights={"a": 0.5, "b": 0.5})
    assert out.where(F.col("split").isNull()).count() == 0
    assert {r["split"] for r in out.select("split").distinct().collect()} == {"a", "b"}


def test_different_salts_give_independent_splits(spark):
    docs = _docs(spark, 2000)
    a = ps.hash_split(docs, "doc_id", salt="expA").select("doc_id", "split")
    b = ps.hash_split(docs, "doc_id", salt="expB").select("doc_id", F.col("split").alias("split_b"))
    agree = a.join(b, "doc_id").where("split = split_b").count()
    # identical salts would agree 2000/2000; independent ones ~ sum(w^2)=0.815
    assert agree < 1900


def test_stratified_sample_fractions_and_determinism(spark):
    docs = _docs(spark)
    fr = {"en": 0.5, "es": 0.1}
    kept = ps.stratified_sample(docs, fr, strata_col="lang", key_col="doc_id")
    rows = kept.collect()
    assert {r["lang"] for r in rows} <= {"en", "es"}  # zh/fr: no fraction -> dropped
    per = {}
    for r in rows:
        per[r["lang"]] = per.get(r["lang"], 0) + 1
    assert abs(per["en"] / 1000 - 0.5) < 0.06
    assert abs(per.get("es", 0) / 1000 - 0.1) < 0.04
    # deterministic: a second run returns the identical id set
    again = {r["doc_id"] for r in ps.stratified_sample(docs, fr, "lang", "doc_id").collect()}
    assert again == {r["doc_id"] for r in rows}


def test_leakage_safe_split_keeps_near_dups_together(spark):
    # 7 distinct texts over 400 docs -> huge near-dup clusters
    docs = _docs(spark, 400)
    out = ps.leakage_safe_split(docs).collect()
    assert len(out) == 400
    split_of = {r["doc_id"]: r["split"] for r in out}
    cluster_of = {r["doc_id"]: r["cluster"] for r in out}
    pairs = pdedup.simhash_near_dups(docs, max_hamming=3).collect()
    assert pairs, "fixture must actually produce near-dup pairs"
    for p in pairs:
        assert split_of[p["doc_a"]] == split_of[p["doc_b"]]
        assert cluster_of[p["doc_a"]] == cluster_of[p["doc_b"]]
    # cluster representative is the minimum member (keep-rep contract)
    by_cluster = {}
    for d, c in cluster_of.items():
        by_cluster.setdefault(c, []).append(d)
    for c, members in by_cluster.items():
        assert c == min(members)


def test_weighted_sample_matches_python():
    import math

    from searchgov_spider_spark.functions.hashing import portable_hash32
    from searchgov_spider_spark.pipelines.sampling import WSAMPLE_SALT

    # python replica of the A-ES key for a given doc
    def key(doc_id, w):
        u = (portable_hash32(f"{WSAMPLE_SALT}|{doc_id}") + 1) / 4294967296.0
        return round(math.log(u) / w, 9)

    # sanity: keys are negative and heavier weights push keys toward 0
    assert key(1, 1000) > key(1, 10)


def test_weighted_sample_topk(spark):
    from searchgov_spider_spark.pipelines.sampling import weighted_sample

    import math
    from searchgov_spider_spark.functions.hashing import portable_hash32
    from searchgov_spider_spark.pipelines.sampling import WSAMPLE_SALT

    rows = [(i, "x", "s", 10 + (i * 13) % 90) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, n_chars long")
    got = [(r.doc_id, r.rank) for r in weighted_sample(df, k=20).collect()]
    keys = sorted(
        (
            -round(math.log((portable_hash32(f"{WSAMPLE_SALT}|{i}") + 1) / 4294967296.0) / w, 9),
            i,
        )
        for (i, _, _, w) in rows
    )[:20]
    want = [(i, r + 1) for r, (_, i) in enumerate(keys)]
    assert got == want


def test_dsir_weights_matches_python(spark):
    import math
    from collections import Counter

    rows = [
        (0, "alpha beta beta", "tgt"),
        (1, "alpha gamma", "tgt"),
        (2, "delta delta gamma", "other"),
        (3, "beta delta", "other"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.doc_id: r for r in ps.dsir_weights(docs, target_source="tgt").collect()}

    toks = {d: t.split() for d, t, _ in rows}
    raw = Counter(t for ts in toks.values() for t in ts)
    tgt = Counter(t for d, ts in toks.items() if d in (0, 1) for t in ts)
    v = len(raw)
    tot_raw, tot_tgt = sum(raw.values()), sum(tgt.values())
    for d, ts in toks.items():
        lw = sum(
            math.log((tgt.get(t, 0) + 1) / (tot_tgt + v))
            - math.log((raw[t] + 1) / (tot_raw + v))
            for t in ts
        )
        assert got[d].n_tokens == len(ts)
        assert abs(got[d].log_weight - lw) < 1e-12
        assert abs(got[d].avg_log_weight - lw / len(ts)) < 1e-12
    # target-looking docs rank above non-target ones
    assert got[0].avg_log_weight > got[2].avg_log_weight


def test_epoch_shuffle_permutation_properties(spark):
    docs = _docs(spark, 600)
    e1 = {r.doc_id: (r.shard, r.sort_key) for r in ps.epoch_shuffle(docs, epoch=1).collect()}
    # stable: pure function of (key, epoch), immune to repartitioning
    e1b = {
        r.doc_id: (r.shard, r.sort_key)
        for r in ps.epoch_shuffle(docs.repartition(7), epoch=1).collect()
    }
    assert e1 == e1b
    # a different epoch is a different permutation
    e2 = {r.doc_id: (r.shard, r.sort_key) for r in ps.epoch_shuffle(docs, epoch=2).collect()}
    assert e1 != e2
    # shards are within range and reasonably balanced
    from collections import Counter

    shards = Counter(s for s, _ in e1.values())
    assert set(shards) <= set(range(64))
    assert max(shards.values()) < 3 * (600 / 64)
