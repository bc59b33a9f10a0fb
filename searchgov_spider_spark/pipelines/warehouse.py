"""Warehouse-style mutation operators: MERGE-style upsert and SCD2
validity intervals.

Spark has no MERGE INTO against plain parquet (that's a table-format
feature); these express the same semantics as pure DataFrame plans — the
shapes the crawl state store's delta persistence composes per wave
(sources/state.py write_delta/read_accumulated), generalized to any keyed
table.

Scale shapes: upsert is one left_anti shuffle on the key (the delta is
usually the small side — broadcastable); SCD2 is one shuffle + one
window per key, linear in the change log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE semantics: rows of ``updates`` replace same-key rows of
    ``target``; unmatched target rows survive; new keys insert.
    Equivalent to ``MERGE INTO target USING updates ON key WHEN MATCHED
    UPDATE * WHEN NOT MATCHED INSERT *``.

    Plan: updates ∪ (target LEFT ANTI updates ON key) — one anti-join
    shuffle (broadcast when the delta is small), no window, no full
    rewrite of unmatched data at the plan level (a format with file
    pruning rewrites only matched files).
    """
    kept = target.join(updates.select(key), key, "left_anti")
    return updates.unionByName(kept)


def upsert_sql(target_sql: str, updates_sql: str, key: str, order_by: str) -> str:
    # NOT EXISTS, not NOT IN: a NULL key in u would make NOT IN evaluate
    # UNKNOWN and silently drop every unmatched target row, whereas the
    # Spark twin's left_anti join keeps them. NOT EXISTS with an equality
    # correlate matches left_anti's null-safe keep-semantics exactly.
    return f"""
        WITH t AS ({target_sql}), u AS ({updates_sql})
        SELECT * FROM u
        UNION ALL
        SELECT * FROM t WHERE NOT EXISTS (
          SELECT 1 FROM u WHERE u.{key} = t.{key}
        )
        ORDER BY {order_by}
    """


def scd2_intervals(
    changes: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a change log into validity
    intervals — (key, value, valid_from, valid_to, is_current), where
    valid_to = the next change's timestamp (null while current). Ties on
    ts break by ``id_col`` so the interval chain is deterministic.

    One shuffle on the key, one window (lead + last-row flag share the
    sort).
    """
    w = Window.partitionBy(key).orderBy(F.asc(ts_col), F.asc(id_col))
    return changes.select(
        key,
        F.col(value_col).alias("value"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.col(id_col).alias("change_id"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def scd2_intervals_sql(
    table: str = "events",
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    where: str = "TRUE",
) -> str:
    return f"""
        SELECT {key},
               {value_col} AS value,
               {ts_col} AS valid_from,
               lead({ts_col}) OVER w AS valid_to,
               {id_col} AS change_id,
               lead({ts_col}) OVER w IS NULL AS is_current
        FROM {table}
        WHERE {where}
        WINDOW w AS (PARTITION BY {key} ORDER BY {ts_col} ASC, {id_col} ASC)
        ORDER BY {key}, valid_from, change_id
    """
