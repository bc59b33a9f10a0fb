"""Table profiling: the per-column data-quality summary every pipeline
run records before trusting its input (null rates, cardinalities).

Long-format output so one schema fits any table; a single pass computes
all columns' stats (one aggregate, map-side combined — at 100 TB this is
one scan, not one scan per column). String min/max are deliberately
omitted from the cross-engine contract: float/timestamp formatting
differs between engines, while counts are representation-independent.
"""

from __future__ import annotations



from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame) -> DataFrame:
    """(column, n, n_null, n_distinct) per column, one scan.

    n_distinct counts non-null distincts (Spark count_distinct and SQL
    COUNT(DISTINCT col) agree on skipping nulls).
    """
    aggs = []
    for c in df.columns:
        aggs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.count("*").cast("long").alias("n"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_null"),
                F.count_distinct(F.col(c)).cast("long").alias("n_distinct"),
            ).alias(c)
        )
    one = df.agg(*aggs)
    rows = one.select(F.explode(F.array(*[F.col(c) for c in df.columns])).alias("s"))
    return rows.select("s.column", "s.n", "s.n_null", "s.n_distinct")


def profile_table_sql(table: str, columns: list[str]) -> str:
    selects = [
        f"""SELECT '{c}' AS "column", count(*)::BIGINT AS n,
            sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
            count(DISTINCT {c})::BIGINT AS n_distinct FROM {table}"""
        for c in columns
    ]
    return " UNION ALL ".join(selects) + ' ORDER BY "column"'
