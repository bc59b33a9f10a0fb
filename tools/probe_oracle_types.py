"""LIMIT-0 type probe over every oracle_sql() entry.

The driver's correctness gate canonicalizes both result sets through
pandas before hashing; DuckDB types that pandas cannot represent
exactly break the hash even when values are bit-identical:

- HUGEINT (DuckDB promotes ``sum(BIGINT)`` to int128) -> float64 in
  pandas -> ``8105.0`` != Spark's ``8105``.
- LIST/STRUCT -> python lists -> ``sort_values`` dies on unhashable
  cells.

This probe wraps each oracle in ``SELECT * FROM (...) LIMIT 0`` and
fails any query whose result description contains HUGEINT, UHUGEINT,
a LIST ( ``[]`` suffix ) or STRUCT column, so the class of bug that
cost rounds 2-3 four red rows can never recur.

Usage: python tools/probe_oracle_types.py [sf_dir]
Exit 0 = clean; 1 = offenders found (printed with column + type).
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

BAD_TYPE_MARKERS = ("HUGEINT", "[]", "STRUCT", "MAP(", "UNION(")


def probe(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, list[tuple[str, str]]]:
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    offenders: dict[str, list[tuple[str, str]]] = {}
    errors: dict[str, str] = {}
    for name, sql in entrymod.oracle_sql().items():
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
            cols = rel.columns
            types = [str(t) for t in rel.types]
        except Exception as e:  # surfaced so a broken oracle is loud
            errors[name] = f"{type(e).__name__}: {str(e)[:200]}"
            continue
        bad = [
            (c, ty)
            for c, ty in zip(cols, types)
            if any(m in ty.upper() for m in BAD_TYPE_MARKERS)
        ]
        if bad:
            offenders[name] = bad
    if errors:
        offenders.update({k: [("<error>", v)] for k, v in errors.items()})
    return offenders


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    offenders = probe(sf_dir)
    for name, bad in offenders.items():
        for col, ty in bad:
            print(f"BAD   {name}: {col} -> {ty}")
    if offenders:
        print(f"\n{len(offenders)} oracles with driver-unsafe output types")
        return 1
    print("ALL ORACLE TYPES CLEAN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
