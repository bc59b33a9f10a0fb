"""Crawl-state persistence: snapshot-per-wave tables (frontier, seen,
documents, metrics) with resume.

Production layout is Iceberg — `frontier`/`seen` partitioned by
``bucket(N, url_hash)``, one snapshot committed per wave, resume =
``VERSION AS OF``; snapshot expiry replaces the reference's Redis orphan
TTL (extensions/scheduler_queue.py:52-121, SCHEDULER_KEY_ORPHAN_AGE).
This sandbox has no Iceberg runtime jars, so the default backend is
bucketed parquet with a manifest directory — same layout, same resume
contract — and the Iceberg backend is gated behind catalog availability.

The wave loop (plans/crawl.py) only needs: write(df, name, wave),
read(name, wave), latest_wave(name), expire(keep_last).
"""

from __future__ import annotations

import json
import re
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ParquetStateStore:
    """Bucketed-parquet state store (Iceberg-snapshot analog).

    Layout: {root}/{name}/wave={w}/bucket={b}/part-*.parquet plus
    {root}/manifests/{name}/wave={w}.json marking committed waves —
    a write is visible to resume only after its manifest lands, which
    makes half-written waves invisible (the snapshot-commit analog).
    """

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 32):
        self.spark = spark
        self.root = Path(root)
        self.n_buckets = n_buckets

    def _table(self, name: str) -> Path:
        return self.root / name

    def _manifest(self, name: str, wave: int) -> Path:
        return self.root / "manifests" / name / f"wave={wave}.json"

    def write(self, df: DataFrame, name: str, wave: int, meta: dict | None = None) -> DataFrame:
        path = self._table(name) / f"wave={wave}"
        out = df
        bucketed = "url_hash" in df.columns
        if bucketed:
            out = out.withColumn("bucket", F.pmod(F.col("url_hash"), F.lit(self.n_buckets)))
            out.write.mode("overwrite").partitionBy("bucket").parquet(str(path))
        else:
            out.write.mode("overwrite").parquet(str(path))
        m = self._manifest(name, wave)
        m.parent.mkdir(parents=True, exist_ok=True)
        m.write_text(
            json.dumps({
                "wave": wave,
                "schema": df.schema.json(),
                "partitions": self._partition_stats(path),
                **(meta or {}),
            })
        )
        try:
            back = self.spark.read.parquet(str(path))
        except Exception:
            # an empty df writes only _SUCCESS — no files to infer from
            return self.spark.createDataFrame([], df.schema)
        return back.drop("bucket") if bucketed else back

    def write_delta(self, df: DataFrame, name: str, wave: int, meta: dict | None = None) -> DataFrame:
        """Append-only commit: the wave directory holds ONLY this wave's
        delta (e.g. the fingerprints scheduled this wave), never the full
        accumulated table — O(delta) I/O per wave instead of O(seen),
        the Redis-SADD / Iceberg-append analog. Re-writing the same wave
        overwrites its directory, so wave replay after a crash is
        idempotent. Returns the read-back (lineage-truncated) delta."""
        return self.write(df, name, wave, meta={**(meta or {}), "delta": True})

    @staticmethod
    def _partition_stats(path: Path) -> dict:
        """Per-partition lineage for the manifest (Iceberg manifest-entry
        analog): rows/bytes/files per bucket, read from parquet footers
        driver-side — no extra Spark job."""
        import pyarrow.parquet as pq

        stats: dict[str, dict] = {}
        for f in sorted(path.glob("**/*.parquet")):
            bucket = f.parent.name if f.parent.name.startswith("bucket=") else "_root"
            s = stats.setdefault(bucket, {"rows": 0, "bytes": 0, "files": 0})
            try:
                s["rows"] += pq.ParquetFile(f).metadata.num_rows
            except Exception:
                continue
            s["bytes"] += f.stat().st_size
            s["files"] += 1
        return stats

    def lineage(self, name: str) -> list[dict]:
        """Committed per-wave, per-partition lineage records:
        [{wave, bucket, rows, bytes, files}, ...] across all manifests."""
        out = []
        for w in self.committed_waves(name):
            meta = json.loads(self._manifest(name, w).read_text())
            for bucket, s in meta.get("partitions", {}).items():
                out.append({"wave": w, "bucket": bucket, **s})
        return out

    def read_accumulated(self, name: str, up_to: int | None = None) -> DataFrame:
        """Union of all committed delta waves ≤ ``up_to`` (default: all).
        Deltas committed past ``up_to`` — e.g. a seen-delta from a wave
        whose frontier commit never landed — are excluded, which is what
        makes torn-state resume correct: the replayed wave re-marks them.
        """
        waves = [w for w in self.committed_waves(name) if up_to is None or w <= up_to]
        paths = []
        for w in waves:
            d = self._table(name) / f"wave={w}"
            if d.exists() and any(d.glob("**/*.parquet")):
                paths.append(str(d))
        if not paths:
            # all committed deltas are empty: rebuild schema from a manifest
            from pyspark.sql.types import StructType

            if not waves:
                raise FileNotFoundError(f"no committed wave for state table {name!r}")
            meta = json.loads(self._manifest(name, waves[-1]).read_text())
            schema = StructType.fromJson(json.loads(meta["schema"]))
            return self.spark.createDataFrame([], schema)
        # basePath anchors partition discovery at the table root so the
        # wave=/bucket= directory levels parse as partition columns
        df = self.spark.read.option("basePath", str(self._table(name))).parquet(*paths)
        return df.drop("bucket", "wave")

    def compact(self, name: str, up_to: int | None = None) -> int:
        """Merge committed deltas ≤ ``up_to`` (default: all) into the
        newest such wave's directory and drop the older ones (Iceberg
        rewrite_data_files analog). Bounds the file count for long
        crawls; returns waves merged away.

        On possibly-torn state (this table committed ahead of a sibling,
        e.g. a seen-delta whose frontier commit never landed), pass the
        sibling's latest wave as ``up_to`` — compacting past the resume
        cut would otherwise fold the torn delta into an older wave and
        defeat ``read_accumulated``'s exclusion of it."""
        waves = [w for w in self.committed_waves(name) if up_to is None or w <= up_to]
        if len(waves) <= 1:
            return 0
        latest = waves[-1]
        acc = self.read_accumulated(name, up_to=latest).localCheckpoint(eager=True)
        self.write(acc, name, latest, meta={"delta": True, "compacted_through": latest})
        for w in waves[:-1]:
            self._manifest(name, w).unlink(missing_ok=True)
            shutil.rmtree(self._table(name) / f"wave={w}", ignore_errors=True)
        return len(waves) - 1

    def committed_waves(self, name: str) -> list[int]:
        mdir = self.root / "manifests" / name
        if not mdir.exists():
            return []
        waves = []
        for p in mdir.glob("wave=*.json"):
            m = re.match(r"wave=(\d+)\.json", p.name)
            if m:
                waves.append(int(m.group(1)))
        return sorted(waves)

    def latest_wave(self, name: str) -> int | None:
        waves = self.committed_waves(name)
        return waves[-1] if waves else None

    def read(self, name: str, wave: int | None = None) -> DataFrame:
        if wave is None:
            wave = self.latest_wave(name)
        if wave is None:
            raise FileNotFoundError(f"no committed wave for state table {name!r}")
        try:
            df = self.spark.read.parquet(str(self._table(name) / f"wave={wave}"))
        except Exception:
            # empty snapshot (e.g. drained frontier of a finished crawl):
            # rebuild from the schema recorded in the manifest
            from pyspark.sql.types import StructType

            meta = json.loads(self._manifest(name, wave).read_text())
            schema = StructType.fromJson(json.loads(meta["schema"]))
            if "bucket" in schema.fieldNames():
                schema = StructType([f for f in schema.fields if f.name != "bucket"])
            return self.spark.createDataFrame([], schema)
        return df.drop("bucket") if "bucket" in df.columns else df

    def expire(self, name: str, keep_last: int = 2) -> int:
        """Drop all but the newest ``keep_last`` waves (snapshot expiry /
        orphan-TTL analog). Returns number of waves removed."""
        waves = self.committed_waves(name)
        drop = waves[:-keep_last] if keep_last > 0 else waves
        for w in drop:
            self._manifest(name, w).unlink(missing_ok=True)
            shutil.rmtree(self._table(name) / f"wave={w}", ignore_errors=True)
        return len(drop)


def iceberg_available(spark: SparkSession, catalog: str = "spark_catalog") -> bool:
    """True when an Iceberg catalog is configured and loadable."""
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    except Exception:
        impl = None
    if not impl or "iceberg" not in str(impl).lower():
        return False
    try:
        spark._jvm.org.apache.iceberg.Snapshot  # noqa: B018 - probe class
        return True
    except Exception:
        return False


class IcebergStateStore:
    """Iceberg-backed store: same interface over real snapshots.

    Deployment path (requires iceberg-spark-runtime on the cluster):
    tables created as ``PARTITIONED BY (bucket(N, url_hash))``, one
    commit per wave, resume via ``VERSION AS OF``, maintenance via
    ``expire_snapshots``. Instantiation fails fast in environments
    without the runtime (this sandbox).
    """

    def __init__(self, spark: SparkSession, database: str, n_buckets: int = 32, catalog: str = "spark_catalog"):
        if not iceberg_available(spark, catalog):
            raise NotImplementedError(
                "Iceberg runtime not on the classpath; use ParquetStateStore "
                "(identical layout + resume contract) or add "
                "iceberg-spark-runtime to spark.jars.packages"
            )
        self.spark = spark
        self.database = database
        self.n_buckets = n_buckets

    def write(self, df: DataFrame, name: str, wave: int, meta: dict | None = None) -> DataFrame:
        full = f"{self.database}.{name}"
        (
            df.withColumn("wave", F.lit(wave))
            .writeTo(full)
            .option("write.distribution-mode", "hash")
            .append()
        )
        return self.spark.read.table(full).filter(F.col("wave") == wave).drop("wave")

    def read(self, name: str, wave: int) -> DataFrame:
        return (
            self.spark.read.table(f"{self.database}.{name}")
            .filter(F.col("wave") == wave)
            .drop("wave")
        )
