"""End-to-end training-corpus preparation: the flagship composition.

One call chains the corpus-prep stages every pretraining pipeline runs
over a crawl corpus, each already verified individually by its own
oracle query:

  1. quality filter   — Gopher acceptance rules (cleaning.gopher_keep_col)
  2. exact dedup      — keep the min-doc_id copy per normalized-text md5
  3. decontamination  — drop docs sharing an n-gram with the benchmark
  4. split assignment — deterministic salted-hash train/val/test
  5. sequence packing — concat-and-chunk placement per (split, shard)

Scale shape (100 TB): stage 1 is a codegen projection; stage 2 is ONE
shuffle on the 128-bit dup key (row_number window, no self-join);
stage 3 broadcasts the benchmark grams so the corpus probe is
shuffle-free, plus a doc_id semi-join; stage 4 is a projection;
stage 5 is one shuffle on (split, shard) with per-shard sorts. Nothing
collects to the driver; every stage's output is a DataFrame the next
stage consumes lazily, so Catalyst fuses the projections and AQE picks
join strategies at runtime.

The DuckDB twin reproduces all five stages in one CTE chain, so the
driver's oracle gate verifies the full composition end to end
(row count, schema, value hash), not just the pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cleaning import (
    _ngrams,
    gopher_keep_col,
    gopher_keep_sql,
    ngrams_rel_sql,
)
from .dedup import normalized_text_col, normalized_text_sql
from .textstats import tokens_col
from .packing import CAPACITY, N_SHARDS, pack_chunks, pack_chunks_sql
from .sampling import hash_split, hash_split_sql

DECON_NGRAM = 8


def corpus_prep(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    weights: dict[str, float] | None = None,
    n: int = DECON_NGRAM,
    capacity: int = CAPACITY,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """Run the full prep chain; returns per-surviving-document placement
    (doc_id, split, shard, n_tokens, start_off, end_off, first_chunk,
    last_chunk)."""
    quality = docs.where(gopher_keep_col(text_col))
    dup_rank = Window.partitionBy(
        F.md5(normalized_text_col(text_col))
    ).orderBy("doc_id")
    unique = (
        quality.withColumn("_rn", F.row_number().over(dup_rank))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    # Inline decontamination (flag-only): needs `unique` once for the gram
    # probe and once as the anti-join base — the full decontaminate()
    # would add a third replay of the filter+window subplan for features
    # this stage discards.
    bench_grams = benchmark.select(
        F.explode(_ngrams(tokens_col(F.col(text_col)), n)).alias("gram")
    ).distinct()
    contaminated_ids = (
        unique.select(
            "doc_id",
            F.explode(_ngrams(tokens_col(F.col(text_col)), n)).alias("gram"),
        )
        .join(F.broadcast(bench_grams), "gram")
        .select("doc_id")
        .distinct()
    )
    clean = unique.join(contaminated_ids, "doc_id", "left_anti")
    split = hash_split(clean, weights=weights)
    return pack_chunks(
        split, capacity, n_shards, text_col, extra_partition_cols=("split",)
    )


def corpus_prep_sql(
    table: str = "documents",
    bench_pred: str = "doc_id % 37 = 0",
    weights: dict[str, float] | None = None,
    n: int = DECON_NGRAM,
    capacity: int = CAPACITY,
    n_shards: int = N_SHARDS,
) -> str:
    bucket_expr, split_expr = hash_split_sql("doc_id", weights)
    return f"""
        WITH bench AS (SELECT * FROM {table} WHERE {bench_pred}),
        corpus AS (SELECT * FROM {table} WHERE NOT ({bench_pred})),
        quality AS (SELECT * FROM corpus WHERE {gopher_keep_sql('text')}),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY md5({normalized_text_sql('text')}) ORDER BY doc_id
          ) AS rn FROM quality
        ),
        uniq AS (SELECT doc_id, text FROM ranked WHERE rn = 1),
        bg AS (SELECT DISTINCT gram FROM ({ngrams_rel_sql('bench', n)})),
        cg AS ({ngrams_rel_sql('uniq', n)}),
        bad AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (gram)),
        clean AS (
          SELECT * FROM uniq WHERE doc_id NOT IN (SELECT doc_id FROM bad)
        ),
        s AS (SELECT doc_id, text, {split_expr} AS split FROM clean),
        packed AS ({pack_chunks_sql('s', capacity, n_shards, extra_cols=('split',))})
        SELECT * FROM packed
    """
