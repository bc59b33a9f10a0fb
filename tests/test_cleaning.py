"""Corpus-cleaning ops: Gopher quality rules, repetition stats, C4-style
cross-corpus segment dedup (pipelines/cleaning.py)."""

import pytest
from pyspark.sql import functions as F

from searchgov_spider_spark.pipelines import cleaning as pc


@pytest.fixture(scope="module")
def docs(spark):
    good = "the quick brown fox jumps over a lazy dog and then " * 4  # 44 toks, stopwords
    short = "tiny doc with the a few words"  # < MIN_TOKENS
    soup = ",,, ;;; ::: !!! ??? ... " * 10  # no alpha tokens
    reps = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3).strip()
    boiler = "shared boilerplate segment one two three four five six seven"  # exactly 10 toks
    rows = [
        (0, good.strip()),
        (1, short),
        (2, soup.strip()),
        (3, reps),  # 30 tokens = 3 identical 10-token segments
        (4, boiler + " unique tail for document four only here now ok"),
        (5, boiler + " another distinct tail for document five yes indeed ok"),
        (6, "solo"),  # 1 token: no bigrams, one short segment
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_stats_rules(docs):
    r = {x["doc_id"]: x for x in pc.gopher_stats(docs).collect()}
    assert r[0]["keep"] is True
    assert r[1]["keep"] is False  # too few tokens
    assert r[2]["keep"] is False and r[2]["alpha_frac"] == 0.0
    assert r[0]["stop_hits"] >= 2
    assert 3.0 <= r[0]["mean_word_len"] <= 10.0


def test_repetition_stats_values(docs):
    r = {x["doc_id"]: x for x in pc.repetition_stats(docs).collect()}
    # doc 3: 30 tokens repeating with period 10 -> all 3 segments identical
    assert r[3]["n_segs"] == 3 and r[3]["dup_seg_ppm"] == 2 * 1_000_000 // 3
    # its bigrams: 29 total, "kappa alpha" appears 2x, the rest of the cycle 3x
    assert r[3]["n_bigrams"] == 29
    assert r[3]["top_bigram_ppm"] == 3 * 1_000_000 // 29
    # doc 0 has distinct segments
    assert r[0]["dup_seg_ppm"] == 0
    # 1-token doc: zero bigrams, one segment, no NaNs
    assert r[6]["n_bigrams"] == 0 and r[6]["top_bigram_ppm"] == 0
    assert r[6]["n_segs"] == 1 and r[6]["dup_seg_ppm"] == 0


def test_segment_dedup_removes_cross_doc_boilerplate(docs):
    out = {x["doc_id"]: x for x in pc.segment_dedup(docs, max_docs=1).collect()}
    assert len(out) == 7  # every doc survives, even if emptied
    # docs 4 and 5 share their first 10-token segment -> removed from both
    assert out[4]["n_removed"] == 1 and out[5]["n_removed"] == 1
    assert not out[4]["clean_text"].startswith("shared boilerplate")
    assert out[4]["clean_text"] == "unique tail for document four only here now ok"
    # intra-doc repetition alone is NOT cross-doc: doc 3's segments live in
    # one distinct doc, so nothing is removed
    assert out[3]["n_removed"] == 0
    # unaffected docs reassemble to the whitespace-normalized original
    orig = {x["doc_id"]: " ".join(x["text"].split()) for x in docs.collect()}
    for d in (0, 1, 2, 3, 6):
        assert out[d]["clean_text"] == orig[d], d


def test_segment_dedup_can_empty_a_document(spark):
    df = spark.createDataFrame(
        [(1, "one two three"), (2, "one two three")], "doc_id long, text string"
    )
    out = {x["doc_id"]: x for x in pc.segment_dedup(df, max_docs=1).collect()}
    assert out[1]["clean_text"] == "" and out[1]["n_removed"] == 1
    assert out[2]["clean_text"] == "" and out[2]["n_removed"] == 1


def test_segment_dedup_identity_when_threshold_high(docs):
    out = pc.segment_dedup(docs, max_docs=10_000)
    assert out.filter(F.col("n_removed") > 0).count() == 0


def test_repetition_profile_fracs(spark):
    # "ab cd ab cd ab cd" : 17 chars; top 2-gram mass — "ab cd" x3 = 15,
    # "cd ab" x2 = 10 -> top = 15/17; dup 5-grams: the two 5-grams
    # "ab cd ab cd ab" / "cd ab cd ab cd" are distinct -> 0.0
    df = spark.createDataFrame(
        [(1, "ab cd ab cd ab cd"), (2, "x")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in pc.repetition_profile(df).collect()}
    r1 = out[1]
    assert r1["n_chars"] == 17
    assert r1["top_2gram_char_frac"] == pytest.approx(15 / 17, abs=1e-6)
    # top 3-gram: "ab cd ab" x2 (8 chars) and "cd ab cd" x2 -> mass 16
    assert r1["top_3gram_char_frac"] == pytest.approx(16 / 17, abs=1e-6)
    assert r1["dup_5gram_char_frac"] == 0.0
    # single-token doc: no grams at all -> zeros, not nulls
    r2 = out[2]
    assert r2["n_chars"] == 1
    assert all(
        r2[c] == 0.0
        for c in r2.asDict()
        if c.endswith("_char_frac")
    )


def test_repetition_profile_dup_mass(spark):
    # 30 tokens with period 10: every 5..10-gram repeats -> dup frac > 0
    reps = ("t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 " * 3).strip()
    df = spark.createDataFrame([(1, reps)], "doc_id long, text string")
    r = pc.repetition_profile(df).collect()[0]
    assert r["dup_5gram_char_frac"] > 0.5
    assert r["dup_10gram_char_frac"] > 0.5


def test_decontaminate_flags_ngram_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta leak tail")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # shares the benchmark's first 8-gram verbatim
            (1, "x alpha beta gamma delta epsilon zeta eta theta y"),
            # same words, one swapped -> no shared 8-gram
            (2, "x alpha beta gamma delta epsilon zeta eta NOPE y"),
            # too short for any 8-gram
            (3, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pc.decontaminate(corpus, bench, n=8).collect()}
    assert len(out) == 3
    assert out[1]["contaminated"] is True and out[1]["n_hits"] == 1
    assert out[2]["contaminated"] is False and out[2]["n_hits"] == 0
    assert out[3]["n_grams"] == 0 and out[3]["contaminated"] is False


def test_decontaminate_counts_distinct_hits_once(spark):
    # the contaminated 8-gram repeats in the corpus doc; distinct grams
    # per doc mean it still counts as ONE hit
    leak = "alpha beta gamma delta epsilon zeta eta theta"
    bench = spark.createDataFrame([(0, leak)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, f"{leak} filler {leak}")], "doc_id long, text string"
    )
    row = pc.decontaminate(corpus, bench, n=8).collect()[0]
    assert row["n_hits"] == 1 and row["contaminated"] is True


def test_dedup_ngram_spans_removes_overlapping_shared_runs(spark):
    # docs 1 and 2 share a 6-token run; with n=4 every 4-gram inside the
    # run is cross-doc duplicated, so the whole run is excised from both
    # regardless of its alignment within each doc.
    shared = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [
            (1, f"intro one two {shared} tail1 tail2"),
            (2, f"{shared} closing words here"),
            (3, "a totally different document with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    out = {x["doc_id"]: x for x in pc.dedup_ngram_spans(df, n=4).collect()}
    assert out[1]["clean_text"] == "intro one two tail1 tail2"
    assert out[1]["n_removed"] == 6
    assert out[2]["clean_text"] == "closing words here"
    assert out[2]["n_removed"] == 6
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_text"] == "a totally different document with no overlap at all"


def test_dedup_ngram_spans_can_empty_and_ignores_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "one two three four"), (2, "one two three four"), (3, "one two")],
        "doc_id long, text string",
    )
    out = {x["doc_id"]: x for x in pc.dedup_ngram_spans(df, n=4).collect()}
    assert out[1]["clean_text"] == "" and out[1]["n_removed"] == 4
    assert out[2]["clean_text"] == "" and out[2]["n_removed"] == 4
    # doc 3 is shorter than n: it has no grams, nothing can be removed
    assert out[3]["clean_text"] == "one two" and out[3]["n_removed"] == 0


def test_dedup_ngram_spans_intra_doc_repeat_not_removed(spark):
    # the gram repeats WITHIN one doc only -> distinct-doc count is 1
    df = spark.createDataFrame(
        [(1, "x y z w x y z w"), (2, "unrelated text entirely here")],
        "doc_id long, text string",
    )
    out = {x["doc_id"]: x for x in pc.dedup_ngram_spans(df, n=4).collect()}
    assert out[1]["n_removed"] == 0


def test_bpe_pairs_matches_python(spark):
    from collections import Counter

    from searchgov_spider_spark.pipelines.textstats import bpe_pairs

    docs = spark.createDataFrame(
        [(0, "low low lower"), (1, "newest widest x")],  # 1-char word dropped
        "doc_id long, text string",
    )
    got = {(r.left_sym, r.right_sym): r.pair_freq for r in bpe_pairs(docs, min_freq=1).collect()}
    wfreq = Counter("low low lower newest widest x".split())
    exp = Counter()
    for w, c in wfreq.items():
        if len(w) < 2:
            continue
        for a, b in zip(w, w[1:]):
            exp[(a, b)] += c
    assert got == dict(exp)
    # ('l','o') counted once per 'low' occurrence plus 'lower': freq 3
    assert got[("l", "o")] == 3
    # min_freq prunes the tail
    pruned = {(r.left_sym, r.right_sym) for r in bpe_pairs(docs, min_freq=3).collect()}
    assert pruned == {k for k, c in exp.items() if c >= 3}


class TestBloomDecontaminate:
    def test_exact_subset_of_bloom_and_fp_measured(self, spark):
        bench = spark.createDataFrame(
            [(100, "one two three four five six seven eight nine ten")],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [
                (0, "one two three four five six seven eight is contaminated text"),
                (1, "totally unrelated words nowhere near the benchmark set at all"),
                (2, "one two three four five six seven DIFFERENT eight nine ten"),
            ],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in pc.bloom_decontaminate(corpus, bench).collect()}
        assert rows[0].contaminated_exact and rows[0].contaminated_bloom
        assert not rows[1].contaminated_exact
        # exact hit implies bloom hit, so fp_grams is never negative
        assert all(r.fp_grams >= 0 for r in rows.values())
        assert all(r.bloom_hits >= r.exact_hits for r in rows.values())
        # doc 2 shares no full 8-gram (the inserted token breaks them)
        assert not rows[2].contaminated_exact

    def test_short_docs_have_zero_grams(self, spark):
        bench = spark.createDataFrame(
            [(100, "one two three four five six seven eight nine")],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame([(0, "too short")], "doc_id long, text string")
        r = pc.bloom_decontaminate(corpus, bench).collect()[0]
        assert r.n_grams == 0 and r.bloom_hits == 0 and not r.contaminated_bloom
