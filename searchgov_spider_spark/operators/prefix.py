"""Exact distributed global running sums (prefix sums over a total
order) — without ever funneling the dataset through a one-partition
window.

A bare ``Window.orderBy(...)`` (no partitionBy) moves ALL rows to a
single task — correct, but serial; at corpus scale it is the classic
unscalable plan Spark itself warns about. The standard two-phase
formulation keeps the same exact result:

1. ``repartitionByRange`` on the order key: partition i holds a
   contiguous key range, ranges ascend with the partition id.
2. Local prefix sums per partition (a window PARTITIONED by
   ``spark_partition_id()`` — parallel).
3. Per-partition totals (one row per partition — bounded by the
   partition count, not the data) get a cumulative offset via a window
   over that tiny set, and broadcast-join back.

Determinism contract: the order key must be UNIQUE (ties could split
across range boundaries and the intra-tie order of a running sum is
engine-defined) — the same totality contract as pipelines/packing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    val: Column,
    out_col: str = "running",
) -> DataFrame:
    """Append ``out_col`` = exact running sum of ``val`` over the total
    order given by ``order_cols`` (unique-key contract above). Inclusive
    frame (UNBOUNDED PRECEDING .. CURRENT ROW)."""
    d = (
        df.repartitionByRange(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_val", val)
        # one eager materialization: the local-prefix branch and the
        # per-partition-totals branch both read these blocks, so the
        # range partitioner's sampling pass and the input lineage run
        # exactly once (and _pid is frozen against recomputation)
        .localCheckpoint(eager=True)
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = d.withColumn("_run_local", F.sum("_val").over(w_local))
    # one row per partition; the offset window is bounded by the
    # partition count, so its single-partition execution is O(cluster
    # size), never O(data)
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("_pid")
        .agg(F.sum("_val").alias("_tot"))
        .withColumn("_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)))
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_run_local") + F.col("_off")).cast("long"))
        .drop("_pid", "_val", "_run_local", "_off")
    )
