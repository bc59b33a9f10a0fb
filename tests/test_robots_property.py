"""Randomized cross-implementation invariant for the RFC 9309 matcher
(operators/robots.py): for ANY pattern assembled from the grammar below
and ANY path, the Spark codegen evaluation (regex translation + rlike /
startswith fast path + most-octets precedence) must agree with an
independent pure-Python reference matcher written directly from the RFC
text. The grammar hits every branch: wildcards at the start/middle/end,
stacked wildcards, trailing and interior '$', regex metacharacters as
literals, empty patterns, and allow/disallow precedence ties."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from searchgov_spider_spark.operators.robots import robots_allowed_col

_SEGS = ["", "a", "ab", "fish", "fish.php", "x(1)", "p[2]", "c+d", "a$b", "UP"]
_WILD = ["", "*", "**"]


def _py_pattern_matches(pattern: str, path: str) -> bool:
    """Reference matcher straight from RFC 9309 §2.2.3: anchored at the
    path start; '*' spans any characters; a trailing '$' anchors the
    end; everything else is a literal octet."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else re.escape(c) for c in body)
    rx = "^" + rx + ("$" if anchored else "")
    return re.search(rx, path) is not None


def _py_allowed(path: str, allows: list[str], denies: list[str]) -> bool:
    best_allow = max(
        (len(p) for p in allows if _py_pattern_matches(p, path)), default=-1
    )
    best_deny = max(
        (len(p) for p in denies if _py_pattern_matches(p, path)), default=-1
    )
    if best_deny < 0:
        return True
    return best_allow >= best_deny


def _rand_pattern(rng: random.Random) -> str:
    n = rng.randint(1, 3)
    parts = ["/"]
    for _ in range(n):
        parts.append(rng.choice(_WILD))
        parts.append(rng.choice(_SEGS))
        if rng.random() < 0.4:
            parts.append("/")
    pat = "".join(parts)
    if rng.random() < 0.3:
        pat += "$"
    return pat


def _rand_path(rng: random.Random) -> str:
    segs = [rng.choice(_SEGS) or "idx" for _ in range(rng.randint(1, 4))]
    path = "/" + "/".join(segs)
    if rng.random() < 0.3:
        path += "?" + rng.choice(["q=1", "a=b&c=d", ""])
    return path


def test_robots_matcher_matches_python_reference(spark):
    rng = random.Random(20260821)
    rows = []
    expected = []
    for i in range(400):
        allows = [_rand_pattern(rng) for _ in range(rng.randint(0, 3))]
        denies = [_rand_pattern(rng) for _ in range(rng.randint(0, 3))]
        path = _rand_path(rng)
        rows.append((i, path, allows, denies))
        expected.append(_py_allowed(path, allows, denies))
    df = spark.createDataFrame(
        rows, "i long, path string, allows array<string>, denies array<string>"
    )
    got = {
        r["i"]: r["ok"]
        for r in df.select(
            "i",
            robots_allowed_col(F.col("path"), F.col("allows"), F.col("denies")).alias("ok"),
        ).collect()
    }
    bad = [
        (rows[i][1], rows[i][2], rows[i][3], got[i], expected[i])
        for i in range(len(rows))
        if got[i] is not expected[i]
    ]
    assert not bad, f"{len(bad)} divergences from the RFC reference, first: {bad[0]}"
