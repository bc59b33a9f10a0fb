"""Crawl-health operators: spider-trap detection, adaptive recrawl
scheduling, and the integer-exact readability scores — each checked
against a pure-Python oracle on hand-built inputs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from searchgov_spider_spark.operators.traps import detect_traps, recrawl_schedule
from searchgov_spider_spark.pipelines.textstats import readability


def test_detect_traps(spark):
    rows = []
    # trap: 25 distinct session-id permutations of one path
    rows += [("a.gov", f"https://a.gov/cal?sid={i}") for i in range(25)]
    # not a trap: same path population but no query strings
    rows += [(f"a.gov", f"https://a.gov/doc/{i}") for i in range(25)]
    # below min_urls: queries dominate but only 5 URLs
    rows += [("b.gov", f"https://b.gov/s?q={i}") for i in range(5)]
    # mixed: 30 URLs, 12 with queries (40% < 80%)
    rows += [("c.gov", f"https://c.gov/m?p={i}") for i in range(12)]
    rows += [("c.gov", f"https://c.gov/m/{i}") for i in range(18)]
    urls = spark.createDataFrame(rows, "domain string, url string")
    out = {
        (r["domain"], r["path"]): r
        for r in detect_traps(urls).collect()
    }
    assert out[("a.gov", "/cal")]["is_trap"] is True
    assert out[("a.gov", "/cal")]["n_urls"] == 25
    assert out[("a.gov", "/cal")]["query_pct"] == 100
    # /doc/<i> are 25 distinct paths with 1 URL each — none flagged
    assert out[("a.gov", "/doc/0")]["is_trap"] is False
    assert out[("b.gov", "/s")]["is_trap"] is False  # under min_urls
    assert out[("b.gov", "/s")]["query_pct"] == 100
    # /m holds 12 query URLs; /m/<i> are separate paths
    assert out[("c.gov", "/m")]["n_urls"] == 12
    assert out[("c.gov", "/m")]["is_trap"] is False


def test_detect_traps_null_query_handling(spark):
    # query-less URLs yield NULL query; countDistinct must skip them
    urls = spark.createDataFrame(
        [("d.gov", "https://d.gov/x"), ("d.gov", "https://d.gov/x?a=1")],
        "domain string, url string",
    )
    row = detect_traps(urls, min_urls=1, query_pct=50).collect()[0]
    assert row["n_urls"] == 2 and row["n_queries"] == 1
    assert row["query_pct"] == 50 and row["is_trap"] is True


def test_recrawl_schedule(spark):
    t0 = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)

    def visits(url_id, pattern):  # pattern: list of changed flags, daily
        return [
            ("d0.gov", url_id, t0 + i * day, bool(c)) for i, c in enumerate(pattern)
        ]

    rows = (
        visits(1, [1, 1, 1, 1])       # hot: changes every visit
        + visits(2, [0, 1, 0, 1])     # half
        + visits(3, [0, 0, 0, 0])     # static
        + [("d1.gov", 9, t0, True)]   # single observation, other domain
    )
    df = spark.createDataFrame(
        rows, "domain string, url_id long, ts timestamp, changed boolean"
    )
    out = {r["url_id"]: r for r in recrawl_schedule(df).collect()}
    assert out[1]["change_ppm"] == 1_000_000
    assert out[2]["change_ppm"] == 500_000
    assert out[3]["change_ppm"] == 0
    # span 3 days = 259200 s; url 1: 259200/4 changes... span DIV changes
    assert out[1]["revisit_sec"] == 259200 // 4
    assert out[2]["revisit_sec"] == 259200 // 2
    assert out[3]["revisit_sec"] == 259200  # never changed: full span
    # per-domain rank by descending change rate
    assert out[1]["fetch_rank"] == 1
    assert out[2]["fetch_rank"] == 2
    assert out[3]["fetch_rank"] == 3
    assert out[9]["fetch_rank"] == 1  # own domain
    assert out[9]["span_sec"] == 0 and out[9]["revisit_sec"] == 0


def test_readability_counts_and_scores(spark):
    text = "The cat sat on the mat. It was happy!"
    docs = spark.createDataFrame([(1, text), (2, "")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in readability(docs).collect()}
    r1 = out[1]
    assert r1["n_words"] == 9
    assert r1["n_sentences"] == 2
    # vowel groups: the(1) cat(1) sat(1) on(1) the(1) mat(1) it(1) was(1)
    # happy(2: a, y) = 10
    assert r1["n_syllables"] == 10
    w, s, y = 9, 2, 10
    assert r1["fre_milli"] == 206835 - 1015 * w // s - 84600 * y // w
    assert r1["fkg_milli"] == 390 * w // s + 11800 * y // w - 15590
    # empty text: floors keep the formula total (words=1, sentences=1)
    r2 = out[2]
    assert r2["n_words"] == 1 and r2["n_sentences"] == 1 and r2["n_syllables"] == 0


def test_url_templates(spark):
    urls = spark.createDataFrame(
        [
            ("a.gov", "https://a.gov/article/1"),
            ("a.gov", "https://a.gov/article/2"),
            ("a.gov", "https://a.gov/article/2"),  # dup URL: counted once
            ("a.gov", "https://a.gov/doc/deadbeef1234/view"),
            ("a.gov", "https://a.gov/doc/cafebabe5678/view"),
            ("a.gov", "https://a.gov/about"),
        ],
        "domain string, url string",
    )
    from searchgov_spider_spark.operators.traps import url_templates

    out = {r["template"]: r for r in url_templates(urls).collect()}
    assert out["https://a.gov/article/{n}"]["n_urls"] == 2
    assert out["https://a.gov/article/{n}"]["sample_url"] == "https://a.gov/article/1"
    assert out["https://a.gov/doc/{hex}/view"]["n_urls"] == 2
    assert out["https://a.gov/about"]["n_urls"] == 1


def test_domain_circuit_breaker(spark):
    from searchgov_spider_spark.operators.politeness import domain_circuit_breaker

    rows = (
        [("bad.gov", 503)] * 6 + [("bad.gov", 200)] * 6        # 50% >= 30%
        + [("ok.gov", 500)] * 2 + [("ok.gov", 200)] * 10       # 16% < 30%
        + [("tiny.gov", 503)] * 5                              # under min_fetches
        + [("clean.gov", 404)] * 12                            # 4xx is not 5xx
    )
    log = spark.createDataFrame(rows, "domain string, http_status int")
    out = {r["domain"]: r for r in domain_circuit_breaker(log).collect()}
    assert out["bad.gov"]["suspended"] is True
    assert out["bad.gov"]["err_ppm"] == 500_000
    assert out["ok.gov"]["suspended"] is False
    assert out["tiny.gov"]["suspended"] is False
    assert out["tiny.gov"]["err_ppm"] == 1_000_000
    assert out["clean.gov"]["n_5xx"] == 0 and out["clean.gov"]["suspended"] is False


class TestRedirects:
    def test_chains_loops_and_direct(self, spark):
        from searchgov_spider_spark.operators.redirects import resolve_redirects

        requests = spark.createDataFrame(
            [("a",), ("b",), ("c",), ("d",), ("x",), ("y",), ("solo",)], "url string"
        )
        redirects = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("y", "x")],
            "src string, dst string",
        )
        out = {r["url"]: r for r in resolve_redirects(requests, redirects, max_hops=4).collect()}
        assert out["a"]["final_url"] == "d" and out["a"]["n_hops"] == 3 and not out["a"]["capped"]
        assert out["b"]["final_url"] == "d" and out["b"]["n_hops"] == 2
        assert out["d"]["final_url"] == "d" and out["d"]["n_hops"] == 0 and not out["d"]["capped"]
        assert out["solo"]["n_hops"] == 0 and not out["solo"]["capped"]
        # 2-cycle: still redirecting at the cap
        assert out["x"]["capped"] and out["x"]["n_hops"] == 4
        assert out["y"]["capped"]

    def test_cap_shorter_than_chain(self, spark):
        from searchgov_spider_spark.operators.redirects import resolve_redirects

        requests = spark.createDataFrame([("a",)], "url string")
        redirects = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
        )
        out = resolve_redirects(requests, redirects, max_hops=2).collect()[0]
        assert out["final_url"] == "c" and out["n_hops"] == 2 and out["capped"]


def test_soft404_flags(spark):
    from searchgov_spider_spark.operators.traps import soft404

    rows = [
        ("a.gov", "u1", 200, "Sorry, this PAGE NOT FOUND here" + " x" * 20),
        ("a.gov", "u2", 200, "y" * 10),  # too small
        ("a.gov", "u3", 200, "perfectly healthy page content with plenty of characters here"),
        ("a.gov", "u4", 404, "page not found"),  # real 404, not soft
        ("a.gov", "u5", 200, "this document has moved somewhere else entirely my friend ok"),
    ]
    df = spark.createDataFrame(rows, "domain string, url string, http_status int, text string")
    out = {r["url"]: r for r in soft404(df).collect()}
    assert out["u1"]["is_soft404"] and out["u1"]["pattern_hit"]
    assert out["u2"]["is_soft404"] and out["u2"]["too_small"] and not out["u2"]["pattern_hit"]
    assert not out["u3"]["is_soft404"]
    assert not out["u4"]["is_soft404"]  # 404 status is an honest 404
    assert out["u5"]["is_soft404"] and out["u5"]["pattern_hit"]


def test_change_detect_states(spark):
    from searchgov_spider_spark.operators.traps import change_detect

    prev = spark.createDataFrame(
        [
            ("a.gov", "u1", "h1"), ("a.gov", "u2", "h2"), ("a.gov", "u3", "h3"),
            ("b.gov", "u9", "h9"),
        ],
        "domain string, url string, content_hash string",
    )
    curr = spark.createDataFrame(
        [
            ("a.gov", "u1", "h1"),        # unchanged
            ("a.gov", "u2", "h2x"),       # changed
            ("a.gov", "u4", "h4"),        # new
            # u3 gone; b.gov entirely gone
        ],
        "domain string, url string, content_hash string",
    )
    got = {r.domain: r for r in change_detect(prev, curr).collect()}
    a = got["a.gov"]
    assert (a.n_unchanged, a.n_changed, a.n_new, a.n_gone) == (1, 1, 1, 1)
    assert a.change_ppm == 1_000_000 // 2
    b = got["b.gov"]
    assert (b.n_unchanged, b.n_changed, b.n_new, b.n_gone) == (0, 0, 0, 1)
    assert b.change_ppm is None  # no co-observed pages: rate undefined, not 0


class TestHostReputation:
    def test_tiers_and_multipliers(self, spark):
        from searchgov_spider_spark.operators.politeness import host_reputation

        rows = (
            # clean host: 10 perfect fetches
            [("good.gov", 200, False, False)] * 10
            # half the fetches 503 -> penalty 4*500000/10 = 200000 -> degraded
            + [("flaky.gov", 503, False, False)] * 5
            + [("flaky.gov", 200, False, False)] * 5
            # all dup + soft404 -> penalty (3+2)*1e6/10 = 500000 -> bad
            + [("junk.gov", 200, True, True)] * 10
        )
        df = spark.createDataFrame(
            rows, "domain string, http_status int, is_dup boolean, is_soft404 boolean"
        )
        got = {r.domain: r for r in host_reputation(df).collect()}
        assert got["good.gov"].tier == "good"
        assert got["good.gov"].score_ppm == 1_000_000
        assert got["good.gov"].budget_multiplier_ppm == 1_000_000
        assert got["flaky.gov"].tier == "degraded"
        assert got["flaky.gov"].score_ppm == 800_000
        assert got["flaky.gov"].budget_multiplier_ppm == 500_000
        assert got["junk.gov"].tier == "bad"
        assert got["junk.gov"].score_ppm == 500_000
        assert got["junk.gov"].budget_multiplier_ppm == 100_000

    def test_score_floor_zero(self, spark):
        from searchgov_spider_spark.operators.politeness import host_reputation

        df = spark.createDataFrame(
            [("awful.gov", 503, True, True)] * 4,
            "domain string, http_status int, is_dup boolean, is_soft404 boolean",
        )
        r = host_reputation(df).collect()[0]
        assert r.score_ppm == 100_000  # (4+3+2)*1e6/10 penalty = 900k
        df2 = df.withColumn("is_soft404", F.lit(True)).withColumn("is_dup", F.lit(True))
        assert host_reputation(df2).collect()[0].score_ppm >= 0
