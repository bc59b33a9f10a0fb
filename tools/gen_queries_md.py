"""Regenerate QUERIES.md from the driver contract: one row per
queries() entry, in gate order, with oracle presence and the query
function's docstring (first sentences, truncated)."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_oracle = sum(1 for k in qs if k in oracles)
    lines = [
        "# QUERIES — the driver-contract catalog",
        "",
        f"{len(qs)} operator queries exposed by `__spark_entry__.py:queries()`; "
        f"{n_oracle} carry a DuckDB oracle-SQL twin checked by the driver's "
        "row-count/schema/value-hash gate at sf0.01 (replica: "
        "`python tools/check_oracle.py`). Dict order is the gate order: "
        "positions 1-50 hold one representative per operator family so a "
        "count- or time-budgeted gate proves the whole engine; variants "
        "follow (see driver_queries.queries() docstring).",
        "",
        "| # | query | oracle | what it runs |",
        "|---|---|---|---|",
    ]
    for i, (name, fn) in enumerate(qs.items(), 1):
        doc = " ".join((fn.__doc__ or "").split())
        doc = re.sub(r"\|", "\\|", doc)[:160]
        lines.append(f"| {i} | `{name}` | {'yes' if name in oracles else 'no'} | {doc} |")
    with open("QUERIES.md", "w", encoding="UTF-8") as f:
        f.write("\n".join(lines) + "\n")
    print(f"QUERIES.md: {len(qs)} queries, {n_oracle} with oracles")


if __name__ == "__main__":
    main()
