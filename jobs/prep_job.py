"""Cluster entry point for the training-corpus prep pipeline.

Runs the flagship chain (Gopher quality filter → exact dedup →
benchmark n-gram decontamination → deterministic hash split → sequence
packing) over a documents table and writes the packed placement,
partitioned by (split, shard) so a training loader reads exactly its
shard's files:

    python tools/package.py                     # -> dist/searchgov_spider_spark.zip
    spark-submit \
        --master <cluster-master> \
        --py-files dist/searchgov_spider_spark.zip \
        jobs/prep_job.py \
        --documents s3a://.../documents \
        --benchmark s3a://.../benchmarks \
        --out       s3a://.../packed

Prints one JSON stats line (docs in, surviving docs, tokens, chunks,
per-split doc counts) — the accounting a data-engineering run records
next to the output.

Input schema: documents(doc_id, text, ...); benchmark rows need the same
``text`` column (the decontamination n-gram source).
"""

from __future__ import annotations

import argparse
import json


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description="searchgov_spider_spark corpus prep driver")
    ap.add_argument("--documents", required=True, help="input documents parquet")
    ap.add_argument(
        "--benchmark",
        help="benchmark/eval-set parquet for decontamination; default: the "
        "deterministic doc_id %% 37 slice of --documents (the test split)",
    )
    ap.add_argument("--out", required=True, help="output dir for the packed placement")
    ap.add_argument("--capacity", type=int, default=None, help="chunk token capacity")
    ap.add_argument("--shards", type=int, default=None, help="shard count")
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from pyspark.sql import functions as F

    from searchgov_spider_spark.pipelines import prep as pprep
    from searchgov_spider_spark.session import get_spark

    spark = get_spark("searchgov-prep")
    docs = spark.read.parquet(args.documents)
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        corpus = docs
    else:
        bench = docs.where(F.col("doc_id") % 37 == 0)
        corpus = docs.where(F.col("doc_id") % 37 != 0)

    kwargs = {}
    if args.capacity:
        kwargs["capacity"] = args.capacity
    if args.shards:
        kwargs["n_shards"] = args.shards
    packed = pprep.corpus_prep(corpus, bench, **kwargs)
    packed.write.mode("overwrite").partitionBy("split", "shard").parquet(args.out)

    written = spark.read.parquet(args.out)
    stats_row = written.agg(
        F.count(F.lit(1)).alias("docs_packed"),
        F.sum("n_tokens").alias("tokens"),
    ).collect()[0]
    # real chunk count: chunk indexes restart per (split, shard), so the
    # total is the sum over shards of (max(last_chunk) + 1); NULL-safe
    # (empty output -> 0)
    chunks_row = (
        written.groupBy("split", "shard")
        .agg((F.max("last_chunk") + 1).alias("n_chunks"))
        .agg(F.sum("n_chunks").alias("chunks"))
        .collect()[0]
    )
    splits = {
        r["split"]: int(r["n"])
        for r in written.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    stats = {
        "docs_in": docs.count(),
        "docs_packed": int(stats_row["docs_packed"]),
        "tokens": int(stats_row["tokens"] or 0),
        "chunks": int(chunks_row["chunks"] or 0),
        "splits": splits,
    }
    print(json.dumps(stats))
    return stats


if __name__ == "__main__":
    main()
