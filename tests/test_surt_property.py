"""Randomized cross-engine invariant for the SURT kernel
(operators/archive.py): for ANY URL assembled from the grammar below,
the Spark codegen column and the DuckDB oracle fragment must agree
byte-for-byte, and the key must satisfy the SURT structural invariants.

The grammar deliberately hits every branch of the spec: scheme present/
absent/weird, userinfo, mixed case, www0-www99 prefixes, default vs
non-default vs no port, empty path, query without path, fragments, deep
hosts, and dot-segment-free deep paths.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from searchgov_spider_spark.operators.archive import (
    surt_key_col,
    surt_key_sql,
    surt_nos_sql,
)

_SCHEMES = ["https://", "http://", "HTTPS://", "ftp://", ""]
_USERINFO = ["", "", "", "user@", "User:Pw@"]
_WWW = ["", "", "www.", "WWW2.", "www99."]
_HOSTS = ["example.gov", "Sub.Example.GOV", "a.b.c.d.gov", "single", "agency.mil"]
_PORTS = ["", "", ":80", ":443", ":8080", ":65535"]
_PATHS = ["", "/", "/A/b", "/x/y/z/", "/p%20q", "/UPPER/Case"]
_QUERIES = ["", "", "?a=1", "?B=2&a=1", "?"]
_FRAGS = ["", "", "#f", "#Frag/with/slash"]


def _random_url(rng: random.Random) -> str:
    return (
        rng.choice(_SCHEMES)
        + rng.choice(_USERINFO)
        + rng.choice(_WWW)
        + rng.choice(_HOSTS)
        + rng.choice(_PORTS)
        + rng.choice(_PATHS)
        + rng.choice(_QUERIES)
        + rng.choice(_FRAGS)
    )


@pytest.mark.parametrize("seed", [11, 23])
def test_surt_cross_engine_parity_and_invariants(spark, seed):
    rng = random.Random(seed)
    urls = list({_random_url(rng) for _ in range(400)})
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["surt"]
        for r in df.select("url", surt_key_col("url").alias("surt")).collect()
    }
    con = duckdb.connect()
    sql = f"SELECT url, {surt_key_sql(surt_nos_sql('url'))} AS surt FROM (SELECT unnest(?) AS url)"
    exp = dict(con.execute(sql, [urls]).fetchall())
    assert got == exp  # byte-identical across engines, every branch

    for u, s in got.items():
        host_part, _, path_part = s.partition(")")
        assert path_part.startswith("/")  # path always rooted
        assert s == s.lower() or any(c in s for c in "%")  # lowercased (pct-escapes ride along)
        assert "#" not in s  # fragments stripped
        assert not host_part.startswith("www")  # www label stripped before reverse
        assert not host_part.endswith(":80") and not host_part.endswith(":443")  # default ports dropped
