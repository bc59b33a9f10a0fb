"""Per-day crawl-schedule rollup — the engine's restatement of the
reference's markdown schedule generator.

Reference: search_gov_crawler/domains/readschedule.py —
``transform_schedule`` (:36-50) parses each site's 5-field cron
``"M H * * dow"`` into a day bucket and a zero-padded ``HH:MM`` time,
sorts each day's entries by time, and ``create_markdown_tables``
(:53-70) renders one ``|name|time|allowed_domains|depth|`` table per
day (Sunday-first day order).

The Spark restatement keeps the same semantics as one declarative
plan: a pure-projection cron parse (split + lpad, no UDF), a single
groupBy(day) with ``array_sort`` + ``array_join`` replacing the
driver-side per-day sort/render loop, and the Sunday-first ordering
carried as an explicit ``dow_idx`` column. Scale shape: one shuffle on
a 7-value key over a config-sized table — trivially fine, and the
formulation stays correct if the schedule table were per-tenant x
per-site at millions of rows (the day key would then be salted by
tenant, which groupBy on a composite key gives for free).

Entry sort is (time, name) — the reference's ``sorted(key=time)`` is
stable on input order, which a distributed engine cannot reproduce, so
both engines pin the tie-break on name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Sunday-first, as in readschedule.py:54 days_of_week
DAY_NAMES = (
    "Sunday", "Monday", "Tuesday", "Wednesday",
    "Thursday", "Friday", "Saturday",
)
_ABBREV = ("sun", "mon", "tue", "wed", "thu", "fri", "sat")

_DAY_CASE = "CASE lower(trim(element_at(split(schedule, ' '), 5))) " + " ".join(
    f"WHEN '{a}' THEN '{n}'" for a, n in zip(_ABBREV, DAY_NAMES)
) + " END"

_DOW_CASE = "CASE day " + " ".join(
    f"WHEN '{n}' THEN {i}" for i, n in enumerate(DAY_NAMES)
) + " END"


def schedule_rollup(sites: DataFrame) -> DataFrame:
    """(day, dow_idx, n_entries, entries) — one row per weekday with
    the day's schedule table rendered as ``HH:MM|name|domains|depth``
    rows joined by newline, entries sorted by (time, name).

    Input columns: name, schedule ("M H * * dow" cron), allowed_domains,
    depth_limit — the crawl-sites config shape
    (sources/crawl_sites.py.to_seeds_df / the reference JSON).
    """
    parsed = sites.select(
        F.expr(_DAY_CASE).alias("day"),
        F.concat(
            F.lpad(F.element_at(F.split("schedule", " "), 2), 2, "0"),
            F.lit(":"),
            F.lpad(F.element_at(F.split("schedule", " "), 1), 2, "0"),
        ).alias("time"),
        "name",
        "allowed_domains",
        F.col("depth_limit").cast("long").alias("depth_limit"),
    )
    row = F.concat_ws(
        "|", "time", "name", "allowed_domains", F.col("depth_limit").cast("string")
    )
    return (
        parsed.select("day", row.alias("row"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_entries"),
            F.array_join(F.array_sort(F.collect_list("row")), "\n").alias("entries"),
        )
        .withColumn("dow_idx", F.expr(_DOW_CASE).cast("long"))
        .select("day", "dow_idx", "n_entries", "entries")
    )


def schedule_rollup_sql(sites_sql: str) -> str:
    """DuckDB oracle twin over the same (name, schedule,
    allowed_domains, depth_limit) relation."""
    day_case = "CASE lower(trim(split_part(schedule, ' ', 5))) " + " ".join(
        f"WHEN '{a}' THEN '{n}'" for a, n in zip(_ABBREV, DAY_NAMES)
    ) + " END"
    dow_case = "CASE day " + " ".join(
        f"WHEN '{n}' THEN {i}" for i, n in enumerate(DAY_NAMES)
    ) + " END"
    return f"""
        WITH sites AS ({sites_sql}),
        parsed AS (
          SELECT {day_case} AS day,
                 lpad(split_part(schedule, ' ', 2), 2, '0') || ':' ||
                 lpad(split_part(schedule, ' ', 1), 2, '0') AS time,
                 name, allowed_domains, depth_limit
          FROM sites
        ), rows_ AS (
          SELECT day,
                 time || '|' || name || '|' || allowed_domains || '|' ||
                 depth_limit::VARCHAR AS row
          FROM parsed
        )
        SELECT day,
               ({dow_case})::BIGINT AS dow_idx,
               count(*)::BIGINT AS n_entries,
               array_to_string(list(row ORDER BY row), chr(10)) AS entries
        FROM rows_
        GROUP BY day
        ORDER BY dow_idx
    """


def render_markdown(rollup_rows) -> str:
    """Driver-side markdown render of a collected rollup (the
    reference's create_markdown_tables + create_header_and_toc output
    shape) — config-sized, so plain Python by design."""
    by_day = {r["day"]: r for r in rollup_rows}
    toc = ""
    tables = ""
    for day in DAY_NAMES:
        r = by_day.get(day)
        n = int(r["n_entries"]) if r else 0
        toc += f" * [{day} ({n})](#{day.lower()}-{n})\n"
        tables += f"\n\n## {day} ({n})\n|Name|Time (UTC)|Allowed Domains|Depth|\n|---|---|---|---|\n"
        if not r:
            continue
        for line in r["entries"].split("\n"):
            time, name, domains, depth = line.split("|")
            tables += f"|{name}|{time}|{domains}|{depth}|\n"
    return toc + tables
