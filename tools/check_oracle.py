"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at the given sf, compare
row count, schema (order-insensitive by column name), and value hash.

The value hash MIMICS THE DRIVER, not a friendlier normalization: both
result sets go through a pandas roundtrip (``sdf.toPandas()`` /
``rel.df()``), columns sorted by name, rows via ``sort_values`` over
all columns, cells rendered with ``str()``. That reproduces the two
failure classes the driver surfaced in rounds 2-3 that a custom
``fetchall`` normalizer hid:

- DuckDB HUGEINT (``sum(BIGINT)``) -> pandas float64 -> ``"8105.0"``
  vs Spark int64 ``"8105"`` (hash mismatch on bit-identical values);
- list cells -> ``sort_values`` raises ``unhashable type: 'list'``.

A LIMIT-0 type probe (tools/probe_oracle_types.py) runs first so the
whole class fails fast with the offending column named.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

from searchgov_spider_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def canon_hash(pdf):
    """Driver-style canonicalization: columns sorted by name, rows
    sorted by all columns (raises on unhashable cells, as the driver
    does), cells str()-rendered. Returns a 16-hex digest.

    Two dtype normalizations calibrated against the driver's r3
    verdicts (it passed monitor_codes/bm25_topk etc. with date/double
    outputs while failing HUGEINT-vs-int64):

    - float64 columns are rounded to 9 decimals (low-order-bit engine
      noise tolerated, but a float column against an int column still
      mismatches -> the HUGEINT class stays caught);
    - datetime64 columns that are all-midnight render as bare dates
      (Spark toPandas gives datetime.date objects, DuckDB .df() gives
      datetime64[ns]; same value, different default str()).
    """
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_float_dtype(s):
            pdf[c] = s.round(9)
        elif pd.api.types.is_datetime64_any_dtype(s):
            if s.notna().all() and (s == s.dt.normalize()).all():
                pdf[c] = s.dt.date
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    h = hashlib.sha256()
    for row in pdf.itertuples(index=False, name=None):
        h.update("|".join(str(v) for v in row).encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    # Fail fast on driver-unsafe oracle output types (HUGEINT/LIST/...).
    from probe_oracle_types import probe

    bad_types = probe(sf_dir)
    if not only:
        for name, bad in bad_types.items():
            for col, ty in bad:
                print(f"FAIL  {name}: oracle type unsafe for driver: {col} -> {ty}")

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = [n for n in only if n not in qs]
    if unknown:
        # A typo'd filter must hard-fail: a name matching nothing would
        # otherwise skip every query and print a vacuous ALL OK.
        print(f"FAIL  unknown query name(s): {unknown}")
        return 2
    failures = list(bad_types) if not only else []
    records = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            records[name] = {"status": "err", "detail": f"spark: {type(e).__name__}"}
            continue
        t1 = time.monotonic()
        if name not in oracles:
            print(f"weak  {name}: {len(spdf)} rows (no oracle) [{t1-t0:.1f}s]")
            records[name] = {"status": "weak", "rows": len(spdf), "sec": round(t1 - t0, 2)}
            continue
        try:
            opdf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            records[name] = {"status": "err", "detail": f"duckdb: {str(e)[:160]}"}
            continue
        problems = []
        if len(spdf) != len(opdf):
            problems.append(f"rows {len(spdf)} vs {len(opdf)}")
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(
                f"cols {sorted(spdf.columns)} vs {sorted(opdf.columns)}"
            )
        else:
            try:
                sh = canon_hash(spdf)
                oh = canon_hash(opdf)
            except TypeError as e:
                problems.append(f"canonicalize error (driver would ERR): {e}")
            else:
                if sh != oh:
                    problems.append(f"hash {sh} vs {oh}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{t1-t0:.1f}s]")
            failures.append(name)
            records[name] = {
                "status": "fail", "rows": len(spdf),
                "detail": "; ".join(problems)[:200], "sec": round(t1 - t0, 2),
            }
            if sorted(spdf.columns) == sorted(opdf.columns):
                cols = sorted(spdf.columns)
                try:
                    so = {
                        "|".join(str(v) for v in r)
                        for r in spdf[cols].itertuples(index=False, name=None)
                    }
                    oo = {
                        "|".join(str(v) for v in r)
                        for r in opdf[cols].itertuples(index=False, name=None)
                    }
                    for x in list(so - oo)[:3]:
                        print(f"        spark-only: {x[:200]}")
                    for x in list(oo - so)[:3]:
                        print(f"        oracle-only: {x[:200]}")
                except TypeError:
                    pass
        else:
            print(f"ok    {name}: {len(spdf)} rows [{t1-t0:.1f}s]")
            records[name] = {
                "status": "ok", "rows": len(spdf),
                "rows_match": True, "schema_match": True, "hash_match": True,
                "sec": round(t1 - t0, 2),
            }
    if json_out:
        import json

        counts = {"ok": 0, "fail": 0, "err": 0, "weak": 0}
        for r in records.values():
            counts[r["status"]] += 1
        with open(json_out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n_queries": len(records),
                 "counts": counts, "queries": records},
                f, indent=1,
            )
        print(f"wrote {json_out}: {counts}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
