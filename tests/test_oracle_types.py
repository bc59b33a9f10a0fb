"""Guard against the rounds-2/3 gate-typing bug class: every
oracle_sql() entry must produce only types the driver's pandas
canonicalizer hashes faithfully — no HUGEINT (int128 -> float64 ->
"8105.0" vs "8105"), no LIST/STRUCT (unhashable under sort_values).

Runs DuckDB LIMIT-0 only (no Spark, no data scan beyond parquet
footers), so it is cheap enough to keep in the default suite.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_TEST", "/root/testdata/sf0.001")


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_all_oracle_output_types_driver_safe():
    from probe_oracle_types import probe

    offenders = probe(SF_DIR)
    assert not offenders, (
        "driver-unsafe oracle output types (add ::BIGINT casts / "
        f"array_to_string): {offenders}"
    )


def test_schedule_rollup_markdown_render():
    """The driver-side markdown render reproduces the reference's
    per-day table shape (readschedule.py:53-70) from rollup rows."""
    from searchgov_spider_spark.operators.schedule_report import render_markdown

    rows = [
        {"day": "Monday", "n_entries": 2,
         "entries": "08:05|Site A|a.gov|3\n09:30|Site B|b.gov|2"},
        {"day": "Sunday", "n_entries": 1, "entries": "00:00|Site C|c.gov|1"},
    ]
    md = render_markdown(rows)
    assert "## Sunday (1)" in md and "## Monday (2)" in md
    assert md.index("## Sunday (1)") < md.index("## Monday (2)")
    assert "|Site A|08:05|a.gov|3|" in md
    assert " * [Tuesday (0)](#tuesday-0)" in md
    assert "## Tuesday (0)" in md


def test_canon_hash_rejects_driver_unsafe_types():
    """Driver-fidelity pin (the r3->r4 lesson): canon_hash must MIMIC
    the driver, not be friendlier than it. A DuckDB HUGEINT column
    (pandas float64) must hash DIFFERENTLY from the bit-identical
    Spark int64 column, and a list-typed column must raise — if either
    starts 'passing', the replica would go green on oracles the real
    gate fails."""
    import duckdb
    import pandas as pd

    from check_oracle import canon_hash

    # HUGEINT: sum(BIGINT) promotes to int128; .df() renders float64
    con = duckdb.connect()
    hug = con.sql(
        "SELECT k, sum(v) AS s FROM (VALUES (1, 8105::BIGINT), (2, 17::BIGINT))"
        " t(k, v) GROUP BY k"
    ).df()
    assert str(hug["s"].dtype) == "float64"  # the failure precondition
    spark_like = pd.DataFrame({"k": [1, 2], "s": pd.array([8105, 17], dtype="int64")})
    assert canon_hash(hug) != canon_hash(spark_like)

    # LIST: sort_values over list cells must raise like the driver does
    listy = pd.DataFrame({"k": [2, 1], "l": [[1, 2], [3]]})
    try:
        canon_hash(listy)
    except TypeError:
        pass
    else:
        raise AssertionError("canon_hash accepted a list-typed column")


def test_probe_flags_hugeint_and_list_oracles():
    """The LIMIT-0 probe's marker logic must flag both bug classes on a
    synthetic oracle (not just happen to find none in the real set)."""
    import duckdb

    from probe_oracle_types import BAD_TYPE_MARKERS

    con = duckdb.connect()
    rel = con.sql(
        "SELECT * FROM (SELECT sum(1::BIGINT) AS s, [1, 2] AS l,"
        " {'a': 1} AS st, 1::BIGINT AS ok) LIMIT 0"
    )
    flagged = [
        c
        for c, ty in zip(rel.columns, [str(t) for t in rel.types])
        if any(m in str(ty).upper() for m in BAD_TYPE_MARKERS)
    ]
    assert flagged == ["s", "l", "st"]
