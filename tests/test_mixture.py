"""Source-mixture weighting (pipelines/sampling.py mixture_*)."""

from searchgov_spider_spark.pipelines import sampling as ps


def test_mixture_weights_repeat_counts(spark):
    rows = [(i, f"text {i}", "en", "heavy" if i < 200 else "zero", 10) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    out = ps.mixture_weights(df, {"heavy": 2.5, "zero": 0.0})
    rows_ = out.collect()
    heavy = [r for r in rows_ if r["source"] == "heavy"]
    zero = [r for r in rows_ if r["source"] == "zero"]
    assert all(r["n_repeats"] in (2, 3) for r in heavy)
    assert all(r["n_repeats"] == 0 for r in zero)
    # fractional part 0.5 -> roughly half the heavy docs get the 3rd copy
    n3 = sum(1 for r in heavy if r["n_repeats"] == 3)
    assert 60 <= n3 <= 140
    # expected epochs ~= weight
    assert abs(sum(r["n_repeats"] for r in heavy) / len(heavy) - 2.5) < 0.25


def test_mixture_weights_deterministic(spark):
    rows = [(i, "t", "en", "s", 1) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    a = {r["doc_id"]: r["n_repeats"] for r in ps.mixture_weights(df, {"s": 1.3}).collect()}
    b = {r["doc_id"]: r["n_repeats"] for r in ps.mixture_weights(df.repartition(7), {"s": 1.3}).collect()}
    assert a == b  # stable under repartitioning


def test_mixture_expand_multiplicity(spark):
    rows = [(1, "t", "en", "a", 1), (2, "t", "en", "b", 1), (3, "t", "en", "c", 1)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    w = ps.mixture_weights(df, {"a": 2.0, "b": 0.0, "c": 1.0})
    out = ps.mixture_expand(w).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(r["copy_idx"])
    assert sorted(got[1]) == [1, 2]
    assert 2 not in got
    assert got[3] == [1]
