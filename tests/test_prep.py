"""End-to-end corpus_prep composition (pipelines/prep.py)."""

import pytest
from pyspark.sql import functions as F

from searchgov_spider_spark.pipelines import cleaning as pc
from searchgov_spider_spark.pipelines import prep as pp


@pytest.fixture(scope="module")
def corpus(spark):
    good = ("the quick brown fox jumps over a lazy dog near the old barn " * 3).strip()
    leak = "alpha beta gamma delta epsilon zeta eta theta " * 5  # 40 toks
    rows = [
        (1, good),                      # survives everything
        (2, good),                      # exact dup of 1 -> dropped (keep min doc_id)
        (3, "too short"),               # fails Gopher MIN_TOKENS
        (4, (leak + "and the filler words go on and on here with a tail").strip()),
        (5, good + " extra distinct suffix keeps this one from being a dup"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench(spark):
    # shares an 8-gram with doc 4 only
    return spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )


def test_corpus_prep_stage_semantics(corpus, bench):
    out = {r["doc_id"]: r for r in pp.corpus_prep(corpus, bench, n_shards=1).collect()}
    assert set(out) == {1, 5}  # 2 exact-dup'd, 3 quality-failed, 4 contaminated
    for r in out.values():
        assert r["split"] in ("train", "val", "test")


def test_corpus_prep_offsets_partition_the_stream(corpus, bench, spark):
    # build a bigger deterministic corpus: 40 distinct quality docs
    rows = [
        (i, f"doc {i} " + ("the a and of to in word{} text body goes here " .format(i) * 4))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    empty_bench = spark.createDataFrame([], "doc_id long, text string")
    packed = pp.corpus_prep(docs, empty_bench, n_shards=4).collect()
    assert len(packed) == 40
    by_stream = {}
    for r in packed:
        by_stream.setdefault((r["split"], r["shard"]), []).append(r)
    for rows_ in by_stream.values():
        rows_.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rows_:
            assert r["start_off"] == off and r["end_off"] == off + r["n_tokens"]
            off = r["end_off"]


def test_corpus_prep_survivors_pass_gopher(corpus, bench):
    out = pp.corpus_prep(corpus, bench)
    keep_ids = {
        r["doc_id"]
        for r in pc.gopher_stats(corpus).where(F.col("keep")).collect()
    }
    assert {r["doc_id"] for r in out.collect()} <= keep_ids


def test_prep_job_end_to_end(spark, tmp_path):
    """jobs/prep_job.py: runs the flagship chain from a parquet documents
    table, writes split/shard-partitioned placement, and the stats line
    is consistent with what was written."""
    import sys

    sys.path.insert(0, "jobs")
    import prep_job

    # per-doc-unique tokens interleaved with stopwords: passes the Gopher
    # rules, and every 8-gram contains a doc-specific token so the
    # default benchmark slice only decontaminates itself
    word = lambda j: F.concat(F.lit(f"w{j}x"), F.col("id").cast("string"))  # noqa: E731
    parts = []
    for j in range(34):
        parts.append(F.lit("the " if j % 3 == 0 else ("and " if j % 3 == 1 else "for ")))
        parts.append(word(j))
        parts.append(F.lit(" "))
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"), F.concat(*parts).alias("text")
    )
    src = str(tmp_path / "docs")
    out = str(tmp_path / "packed")
    docs.write.parquet(src)
    stats = prep_job.main(["--documents", src, "--out", out, "--shards", "4"])
    assert stats["docs_in"] == 300
    assert 0 < stats["docs_packed"] <= 300
    assert set(stats["splits"]) <= {"train", "val", "test"}
    written = spark.read.parquet(out)
    assert written.count() == stats["docs_packed"]
    # "chunks" is a real chunk count: sum over (split, shard) of
    # (max(last_chunk) + 1), since chunk indexes restart per shard
    expected_chunks = sum(
        r["n"]
        for r in written.groupBy("split", "shard")
        .agg((F.max("last_chunk") + 1).alias("n"))
        .collect()
    )
    assert stats["chunks"] == expected_chunks > 0
    assert {r["shard"] for r in written.select("shard").distinct().collect()} <= set(range(4))
