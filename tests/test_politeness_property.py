"""Randomized invariant for the salted two-phase politeness top-k
(operators/politeness.py:schedule_wave) — the engine's core skew trick.

Property: for ANY frontier and ANY salt count, the salted two-phase
schedule must be row-identical (including fetch_rank) to the naive
unsalted single-window reference, and (scheduled, deferred) must
partition the frontier. Randomized inputs deliberately include heavy
ties on (priority, depth, discovery_idx) so the canon_url tie-breaker
is load-bearing, plus a hot domain holding most rows (the case salting
exists for) and a per-row budget column derived from crawl_delay.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from searchgov_spider_spark.operators.politeness import FRONTIER_ORDER, schedule_wave


def _random_frontier(spark, seed: int, n: int = 400):
    rng = random.Random(seed)
    doms = ["hot.gov"] * 6 + [f"d{i}.gov" for i in range(8)]
    rows = []
    for i in range(n):
        d = rng.choice(doms)
        rows.append(
            (
                d,
                rng.getrandbits(63) - (1 << 62),  # signed url_hash incl. negatives
                f"https://{d}/p/{i}",
                rng.randint(0, 2),  # priority: heavy ties
                rng.randint(0, 3),  # depth: heavy ties
                rng.randint(0, 9),  # discovery_idx: ties too
                float(rng.choice([0.0, 1.0, 4.0])),  # crawl_delay
            )
        )
    return spark.createDataFrame(
        rows,
        "domain string, url_hash long, canon_url string, priority int, "
        "depth int, discovery_idx int, crawl_delay double",
    )


def _reference(frontier, budget_col):
    """Naive unsalted single-window schedule (correct but hot-skewed)."""
    w = Window.partitionBy("domain").orderBy(*[F.col(c) for c in FRONTIER_ORDER])
    return (
        frontier.withColumn("fetch_rank", F.row_number().over(w))
        .filter(F.col("fetch_rank") <= budget_col)
    )


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("salt_buckets", [1, 3, 16])
def test_salted_schedule_matches_unsalted_reference(spark, seed, salt_buckets):
    frontier = _random_frontier(spark, seed)
    budget = 7
    scheduled, deferred = schedule_wave(frontier, budget, salt_buckets=salt_buckets)
    ref = _reference(frontier, F.lit(budget))

    got = {(r["canon_url"], r["fetch_rank"]) for r in scheduled.collect()}
    want = {(r["canon_url"], r["fetch_rank"]) for r in ref.collect()}
    assert got == want

    # (scheduled, deferred) partitions the frontier exactly
    s_urls = {u for u, _ in got}
    d_urls = {r["canon_url"] for r in deferred.collect()}
    all_urls = {r["canon_url"] for r in frontier.collect()}
    assert s_urls | d_urls == all_urls
    assert not (s_urls & d_urls)


def test_salted_schedule_matches_reference_per_row_budget(spark):
    """The crawl-delay-derived budget path: budget is a per-row COLUMN
    (all rows of a domain carry the same value, as in the engine)."""
    frontier = _random_frontier(spark, seed=9).withColumn(
        "wave_budget",
        F.when(F.col("crawl_delay") >= 4.0, F.lit(2))
        .when(F.col("crawl_delay") >= 1.0, F.lit(5))
        .otherwise(F.lit(11)),
    )
    # budget must be constant per domain for the semantics to be sound:
    # re-derive it from the domain so every row of a domain agrees
    per_domain = frontier.groupBy("domain").agg(F.min("wave_budget").alias("wave_budget"))
    frontier = frontier.drop("wave_budget").join(per_domain, "domain")

    scheduled, _ = schedule_wave(frontier, "wave_budget", salt_buckets=4)
    ref = _reference(frontier, F.col("wave_budget"))
    got = {(r["canon_url"], r["fetch_rank"]) for r in scheduled.collect()}
    want = {(r["canon_url"], r["fetch_rank"]) for r in ref.collect()}
    assert got == want
