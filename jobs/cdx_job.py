"""Cluster entry point for web-archive (CDX) indexing.

Builds the SURT-keyed capture index from a fetch log and writes it
SORT-ON-WRITE: range-partitioned by SURT so all of a host's (and, by
the reversed-label key, a whole agency's) captures are contiguous on
disk, every partition internally sorted by (surt, fetch_ts, url). That
layout is what makes per-host incremental diffs, range-pruned lookups,
and WARC locality cheap at archive scale — a reader filtering
``surt LIKE 'gov,example,%'`` touches exactly the matching range files.

    python tools/package.py                     # -> dist/searchgov_spider_spark.zip
    spark-submit \
        --master <cluster-master> \
        --py-files dist/searchgov_spider_spark.zip \
        jobs/cdx_job.py \
        --fetch-log s3a://.../fetch_log \
        --out       s3a://.../cdx \
        --partitions 4096

Optionally, with ``--prior`` (previous capture metadata: url, etag,
last_modified, digest, n_bytes) the job also prints the per-domain
conditional-fetch savings report for the NEXT recrawl of the same
URLs — the bandwidth a revalidation pass would save.

With ``--warc-out`` (fetch log must carry a ``body`` column) the job
also writes the archive records the index points at: per-record-gzip
.warc.gz files plus a manifest parquet of (warc_file, offset, length)
member placements — the Common Crawl layout a CDX consumer resolves
captures through.

Input fetch-log schema: (url, fetch_ts:long, http_status:long,
mime:string, digest:string, n_bytes:long [, domain] [, body]).
"""

from __future__ import annotations

import argparse
import json


def positive_int(value):
    n = int(value)
    if n <= 0:
        raise argparse.ArgumentTypeError(f"must be a positive integer, got {value!r}")
    return n


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description="searchgov_spider_spark CDX index builder")
    ap.add_argument("--fetch-log", required=True, help="fetch log parquet")
    ap.add_argument("--out", required=True, help="output dir for the sorted CDX parquet")
    ap.add_argument(
        "--partitions",
        type=positive_int,
        default=None,
        help="range-partition count (default: Spark decides via AQE)",
    )
    ap.add_argument(
        "--prior", help="optional prior-capture metadata parquet -> revalidation report"
    )
    ap.add_argument(
        "--warc-out",
        help="optional dir: also write per-record-gzip .warc.gz archives "
        "(requires a 'body' column in the fetch log) and a manifest "
        "parquet at <warc-out>/manifest the CDX offsets resolve through",
    )
    ap.add_argument(
        "--warc-files",
        type=positive_int,
        default=16,
        help="archive fan-out for --warc-out (files per corpus)",
    )
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from pyspark.sql import functions as F

    from searchgov_spider_spark.operators.archive import cdx_index, conditional_fetch_plan
    from searchgov_spider_spark.session import get_spark

    spark = get_spark("searchgov-cdx")
    log = spark.read.parquet(args.fetch_log)
    cdx = cdx_index(log)
    # sort-on-write: global range partitioning on the SURT, then an
    # intra-partition sort — one exchange, and the window inside
    # cdx_index already shuffled on the same key family
    if args.partitions is not None:
        cdx = cdx.repartitionByRange(args.partitions, "surt", "fetch_ts")
    else:
        cdx = cdx.repartitionByRange("surt", "fetch_ts")
    cdx = cdx.sortWithinPartitions("surt", "fetch_ts", "url")
    cdx.write.mode("overwrite").parquet(args.out)

    written = spark.read.parquet(args.out)
    stats = written.agg(
        F.count(F.lit(1)).alias("captures"),
        F.countDistinct("surt").alias("distinct_surts"),
        F.sum(F.col("is_revisit").cast("long")).alias("revisits"),
        F.sum("n_bytes").alias("bytes"),
    ).collect()[0]
    # sum() over an empty log aggregates to NULL — render as 0
    print(json.dumps({k: int(v or 0) for k, v in stats.asDict().items()}))

    if args.prior:
        prior = spark.read.parquet(args.prior)
        cand = log.select(
            "url",
            (
                F.col("domain")
                if "domain" in log.columns
                else F.regexp_extract("url", "^[a-z]+://([^/]+)", 1)
            ).alias("domain"),
            F.col("digest").alias("cur_digest"),
        )
        for row in conditional_fetch_plan(cand, prior).orderBy("domain").collect():
            print(json.dumps(row.asDict()))

    if args.warc_out:
        from searchgov_spider_spark.operators.archive import (
            warc_records,
            write_warc_gz_files,
        )

        recs = warc_records(log, n_files=args.warc_files)
        manifest = write_warc_gz_files(recs, args.warc_out)
        manifest.write.mode("overwrite").parquet(args.warc_out + "/manifest")
        m = spark.read.parquet(args.warc_out + "/manifest")
        mstats = m.agg(
            F.count(F.lit(1)).alias("records"),
            F.countDistinct("warc_file").alias("warc_files"),
            F.sum("length").alias("compressed_bytes"),
        ).collect()[0]
        print(json.dumps({k: int(v or 0) for k, v in mstats.asDict().items()}))
    return stats


if __name__ == "__main__":
    main()
