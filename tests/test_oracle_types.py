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
