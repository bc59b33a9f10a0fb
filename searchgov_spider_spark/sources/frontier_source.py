"""Synthetic-frontier source via Spark 4's Python Data Source API.

The 10^10-URL frontier design generates candidate URLs EXECUTOR-SIDE —
nothing frontier-sized ever exists on the driver. ``spark.range`` already
gives that for the bench generator; this module expresses the same
generator as a first-class registered data source
(``pyspark.sql.datasource.DataSource``), the idiomatic Spark-4 way to add
a custom scan:

    spark.dataSource.register(FrontierDataSource)
    df = spark.read.format("synthetic_frontier") \
             .option("n", 10**10).option("numPartitions", 4096).load()

Why it matters at scale: ``partitions()`` plans explicit row-range splits
(driver holds only the RANGE LIST, O(numPartitions)), each executor task
materializes its slice as Arrow RecordBatches (the vectorized read path —
no per-row Python between the generator and the JVM), and the row content
is a pure function of the row id, so any split count yields the identical
table (tested). Rows are bit-identical to ``bench.synthetic_frontier``:
1,759 .gov domains (the search.gov production seed-list size) with domain
0 taking ~25% of URLs — the hot-domain skew the salted politeness
scheduler exists for.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

N_DOMAINS = 1759  # search.gov production seed-list size (BASELINE.md)
ARROW_BATCH_ROWS = 65536


@dataclass
class _Range(InputPartition):
    start: int
    end: int


class FrontierReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1_000_000))
        self.num_partitions = int(options.get("numpartitions", 32))

    def partitions(self):
        # explicit range planning: the driver holds O(numPartitions) state
        # no matter how large n is
        per = max(1, -(-self.n // self.num_partitions))
        return [
            _Range(start, min(start + per, self.n))
            for start in range(0, self.n, per)
        ]

    def read(self, partition: _Range):
        # Arrow batches, not per-row tuples: the vectorized handoff to the
        # JVM; numpy builds each column in one shot
        import numpy as np
        import pyarrow as pa

        for lo in range(partition.start, partition.end, ARROW_BATCH_ROWS):
            hi = min(lo + ARROW_BATCH_ROWS, partition.end)
            ids = np.arange(lo, hi, dtype=np.int64)
            dom = np.where(ids % 4 == 0, 0, ids % N_DOMAINS)
            urls = pa.array(
                [f"HTTPS://D{d}.gov/p/{i}#frag" for d, i in zip(dom, ids)],
                type=pa.string(),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids),
                    urls,
                    pa.array(ids % 5),
                    pa.array(ids % 4),
                    pa.array(ids),
                ],
                names=["id", "url", "priority", "depth", "discovery_idx"],
            )


class FrontierDataSource(DataSource):
    """``format("synthetic_frontier")`` — options: n, numPartitions."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_frontier"

    def schema(self) -> str:
        return (
            "id long, url string, priority long, depth long, discovery_idx long"
        )

    def reader(self, schema) -> FrontierReader:
        return FrontierReader(self.options)
