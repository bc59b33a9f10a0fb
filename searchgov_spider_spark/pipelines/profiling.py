"""Table profiling: the per-column data-quality summary every pipeline
run records before trusting its input (null rates, cardinalities).

Long-format output so one schema fits any table; a single pass computes
all columns' stats (one aggregate, map-side combined — at 100 TB this is
one scan, not one scan per column). String min/max are deliberately
omitted from the cross-engine contract: float/timestamp formatting
differs between engines, while counts are representation-independent.
"""

from __future__ import annotations



from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash32_col as hash32_col
from ..functions.hashing import portable_hash32_sql as hash32_sql


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


def skew_plan(
    df: DataFrame, key_col: str, target_rows_per_task: int = 1_000_000
) -> DataFrame:
    """Shuffle-skew diagnosis + salting plan for a prospective
    groupBy/join key — the pre-flight a 100 TB job runs before keying a
    shuffle on a column like `domain` (the reference crawl's hot-.gov
    problem: a handful of domains own most of the frontier, so one
    reducer gets the whole key while 999 executors idle).

    Returns ONE ROW PER HOT KEY (keys whose row count exceeds the
    per-task target), with

    - ``cnt``         exact rows under the key,
    - ``share_ppm``   cnt * 1e6 DIV total (integer, engine-portable),
    - ``salt_factor`` ceil(cnt / target): how many salted sub-keys to
                      spread the key over (the factor `salted two-phase`
                      aggregation/join code should use).

    Plan shape: one hash-agg on the key (map-side combined) + a
    broadcast 1-row total join — no window over all keys, output is
    only the hot tail. At 10^10 frontier rows this is one shuffle of
    |distinct keys| combiner rows, and the result is small enough to
    drive a broadcast salt map.
    """
    t = max(int(target_rows_per_task), 1)
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    total = df.agg(F.count("*").cast("long").alias("_total"))
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("cnt") > t)
        .select(
            "key",
            "cnt",
            F.expr("cnt * 1000000 DIV _total").alias("share_ppm"),
            F.expr(f"(cnt + {t} - 1) DIV {t}").alias("salt_factor"),
        )
    )


def skew_plan_sql(table: str, key_expr: str, target_rows_per_task: int = 1_000_000) -> str:
    t = max(int(target_rows_per_task), 1)
    return f"""
        WITH counts AS (
          SELECT {key_expr} AS key, count(*)::BIGINT AS cnt FROM {table} GROUP BY 1
        ), total AS (SELECT count(*)::BIGINT AS _total FROM {table})
        SELECT key, cnt,
               (cnt * 1000000 // _total)::BIGINT AS share_ppm,
               ((cnt + {t} - 1) // {t})::BIGINT AS salt_factor
        FROM counts, total
        WHERE cnt > {t}
        ORDER BY cnt DESC, key
    """


def partition_plan(
    frontier: DataFrame,
    n_partitions: int,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Explicit hash-partition layout audit for the URL frontier — the
    north-rule contract is "scales to 10^10 URLs via explicit hash
    partitioning on canonical-URL hash", and this is the operator that
    PROVES a chosen partition count holds: assign every row its
    partition id ``pmod(hash32(url), P)`` (the same deterministic
    md5-based hash the seen-set shards on), then report per partition

    - ``n_urls``           rows landing in the partition,
    - ``n_domains``        distinct domains (politeness-budget spread),
    - ``max_domain_rows``  the largest single domain inside it (residual
                           intra-partition skew a salt map must absorb),
    - ``load_ppm``         n_urls * 1e6 DIV total vs the ideal 1e6/P.

    Two hash-aggs (url->pid+domain, then pid), both map-side combined;
    output is exactly P rows. A balanced plan shows load_ppm tightly
    around 1e6/P; a fat max_domain_rows flags the keys skew_plan would
    salt."""
    p = int(n_partitions)
    pid = F.pmod(hash32_col(F.col(url_col)), F.lit(p)).cast("long")
    per_dom = (
        frontier.select(pid.alias("pid"), F.col(domain_col).alias("domain"))
        .groupBy("pid", "domain")
        .agg(F.count("*").cast("long").alias("dn"))
    )
    per_pid = per_dom.groupBy("pid").agg(
        F.sum("dn").cast("long").alias("n_urls"),
        F.count("*").cast("long").alias("n_domains"),
        F.max("dn").cast("long").alias("max_domain_rows"),
    )
    total = per_pid.agg(F.sum("n_urls").cast("long").alias("_total"))
    return per_pid.join(F.broadcast(total)).select(
        "pid", "n_urls", "n_domains", "max_domain_rows",
        F.expr("n_urls * 1000000 DIV _total").alias("load_ppm"),
    )


def partition_plan_sql(
    table: str, n_partitions: int, url_expr: str = "url", domain_expr: str = "domain"
) -> str:
    p = int(n_partitions)
    h = hash32_sql(url_expr)
    return f"""
        WITH rows_pid AS (
          SELECT {h} % {p} AS pid, {domain_expr} AS domain FROM {table}
        ), per_dom AS (
          SELECT pid, domain, count(*)::BIGINT AS dn FROM rows_pid GROUP BY pid, domain
        ), per_pid AS (
          SELECT pid, sum(dn)::BIGINT AS n_urls, count(*)::BIGINT AS n_domains,
                 max(dn)::BIGINT AS max_domain_rows
          FROM per_dom GROUP BY pid
        ), total AS (SELECT sum(n_urls)::BIGINT AS _total FROM per_pid)
        SELECT pid, n_urls, n_domains, max_domain_rows,
               (n_urls * 1000000 // _total)::BIGINT AS load_ppm
        FROM per_pid, total
        ORDER BY pid
    """


def heavy_keys(df: DataFrame, key_col: str, capacity: int = 64) -> DataFrame:
    """EXACT heavy hitters over a key column with bounded memory — the
    sketch-first complement to ``skew_plan``: when the key's cardinality
    is too large to hash-aggregate in full (every URL of a 10^10-row
    frontier), per-partition Misra-Gries summaries of ``capacity``
    entries find the candidates, and only the candidates are recounted
    exactly.

    Output: (key, cnt, share_ppm) for every key whose exact count
    exceeds N / (capacity + 1), descending — IDENTICAL to the plain
    ``GROUP BY key HAVING cnt * (capacity+1) > N`` despite the sketch:
    Misra-Gries guarantees any key with partition-local count >
    N_p/(c+1) survives its partition summary, and a key above the
    global threshold must be above the local threshold in at least one
    partition (pigeonhole over sum N_p = N). The candidate set may vary
    with partitioning; the thresholded exact recount does not.

    Scale shape: the only full-width pass is a broadcast semi-join
    probe of the stream against <= c * n_partitions candidate keys +
    one map-side-combined recount; nothing ever shuffles on the raw
    key. The Misra-Gries pass is an Arrow-batched mapInPandas whose
    per-batch work is a value_counts + a bounded Counter merge — no
    per-row Python.
    """
    import pandas as pd

    c = max(int(capacity), 1)
    keys = df.select(F.col(key_col).cast("string").alias("key"))

    def mg_partition(batches):
        from collections import Counter

        summary: Counter = Counter()
        for pdf in batches:
            summary.update(pdf["key"].value_counts().to_dict())
            if len(summary) > c:
                # batch Misra-Gries reduction: subtract the (c+1)-th
                # largest weight from everyone; >= c+1 entries shrink per
                # subtracted unit, preserving the N/(c+1) guarantee
                d = sorted(summary.values(), reverse=True)[c]
                summary = Counter(
                    {t: w - d for t, w in summary.items() if w - d > 0}
                )
        yield pd.DataFrame({"key": list(summary.keys())})

    candidates = (
        keys.mapInPandas(mg_partition, "key string").distinct()
    )
    total = keys.agg(F.count("*").cast("long").alias("_total"))
    return (
        keys.join(F.broadcast(candidates), "key")
        .groupBy("key")
        .agg(F.count("*").cast("long").alias("cnt"))
        .join(F.broadcast(total))
        .filter(F.col("cnt") * (c + 1) > F.col("_total"))
        .select("key", "cnt", F.expr("cnt * 1000000 DIV _total").alias("share_ppm"))
    )


def heavy_keys_sql(table: str, key_expr: str, capacity: int = 64) -> str:
    """Oracle twin: the sketch-free formulation the MG path provably
    equals."""
    c = max(int(capacity), 1)
    return f"""
        WITH counts AS (
          SELECT {key_expr}::VARCHAR AS key, count(*)::BIGINT AS cnt
          FROM {table} GROUP BY 1
        ), total AS (SELECT sum(cnt)::BIGINT AS _total FROM counts)
        SELECT key, cnt, (cnt * 1000000 // _total)::BIGINT AS share_ppm
        FROM counts, total
        WHERE cnt * {c + 1} > _total
        ORDER BY cnt DESC, key
    """


# --- HyperLogLog register build ----------------------------------------------

HLL_P = 6  # 2^6 = 64 registers — small enough to eyeball, shape generalizes


def hll_registers(df: DataFrame, key_col: str, p: int = HLL_P) -> DataFrame:
    """Distributed HyperLogLog register build over ``df[key_col]``.

    The engine's cardinality sketch for frontier/seen-set accounting
    (Spark's own approx_count_distinct is HLL++ but its registers are
    opaque and not oracle-checkable). This builds the registers openly
    with the portable hash so DuckDB reproduces them bit-for-bit:

      h       = portable 32-bit md5 hash of the key
      bucket  = h % 2^p                (register index)
      w       = h DIV 2^p             (remaining 32-p bits)
      rho(w)  = position of the highest set bit counted from the MSB of
                the (32-p)-bit window + 1; w = 0 → 32-p+1

    Output one row per register: ``(bucket, max_rho, n_hashes)`` plus
    ``n_exact`` (exact distinct keys hashing into the bucket) so a test
    can compare the sketch against truth per register. The estimate
    itself (alpha_m * m^2 / sum(2^-rho), a float) is deliberately NOT a
    column — register state is the exact-integer, mergeable part: at
    100 TB each executor's partial registers combine by max() in one
    map-side-combinable agg, which is exactly how the sketch merges
    across a 1000-executor cluster (and across waves: max of register
    tables IS the union sketch).

    rho is computed from the binary-string position of the first '1'
    (``instr(lpad(bin(w), 32-p, '0'), '1')``) — pure codegen, no UDF,
    identical in DuckDB (strpos/bin/lpad).
    """
    from ..functions.hashing import portable_hash32_col

    m = 1 << p
    width = 32 - p
    h = portable_hash32_col(F.concat(F.lit("hll|"), F.col(key_col).cast("string")))
    # _w via integer DIV, not float division: h/m happens to be exact in
    # double only because m is a power of two — DIV states the intended
    # integer op and stays correct for any future hash width / m
    keyed = df.select(
        F.col(key_col).alias("_k"), h.alias("_h")
    ).select(
        "_k",
        F.pmod(F.col("_h"), F.lit(m)).cast("long").alias("bucket"),
        F.expr(f"_h DIV {m}").cast("long").alias("_w"),
    ).withColumn(
        "_rho",
        F.when(F.col("_w") == 0, F.lit(width + 1))
        .otherwise(F.expr(f"instr(lpad(bin(_w), {width}, '0'), '1')"))
        .cast("long"),
    )
    return (
        keyed.groupBy("bucket")
        .agg(
            F.max("_rho").alias("max_rho"),
            F.count(F.lit(1)).cast("long").alias("n_hashes"),
            F.countDistinct("_k").cast("long").alias("n_exact"),
        )
    )


def hll_registers_sql(table: str, key_expr: str, p: int = HLL_P) -> str:
    """DuckDB twin building the identical registers."""
    from ..functions.hashing import portable_hash32_sql

    m = 1 << p
    width = 32 - p
    h = portable_hash32_sql(f"'hll|' || CAST({key_expr} AS VARCHAR)")
    return f"""
        WITH keyed AS (
          SELECT {key_expr} AS k,
                 ({h} % {m})::BIGINT AS bucket,
                 ({h} // {m})::BIGINT AS w
          FROM {table}
        ),
        rho AS (
          SELECT k, bucket,
                 (CASE WHEN w = 0 THEN {width + 1}
                       ELSE strpos(lpad(bin(w), {width}, '0'), '1') END)::BIGINT AS rho
          FROM keyed
        )
        SELECT bucket, max(rho)::BIGINT AS max_rho,
               count(*)::BIGINT AS n_hashes,
               count(DISTINCT k)::BIGINT AS n_exact
        FROM rho
        GROUP BY bucket
        ORDER BY bucket
    """


# --- equi-width histogram quantile sketch ------------------------------------

QSKETCH_BUCKETS = 32


def quantile_sketch(
    events: DataFrame,
    n_buckets: int = QSKETCH_BUCKETS,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Mergeable equi-width histogram quantile estimates per group.

    Exact percentiles (pipelines/events.py:percentiles_exact) need a full
    sort per group; at 100 TB the standard trade is a histogram sketch:
    per-partition bucket counts merge by addition (one map-side-combined
    hash agg — the same mergeability story as hll_registers), and
    quantiles read off the cumulative histogram with bounded error
    (bucket width), never a global sort. approx_percentile exists but its
    KLL-ish internals are not oracle-checkable; this histogram is.

    All-integer: values go to cents (round(value*100), the repo's exact-
    cents idiom), bucket = ((c - min_c) * n_buckets) DIV (max_c - min_c
    + 1), quantile rank k_q = ceil(q * n) in integer math, and the
    estimate is the LOWER BOUND in cents of the first bucket whose
    cumulative count reaches k_q — deterministic cross-engine.

    Output per group: ``(event_type, n, min_c, max_c, p50_est_c,
    p90_est_c, p99_est_c)``.

    Scale shape: one agg for (min, max, count), broadcast back; one agg
    to bucket counts (output <= groups x n_buckets); the cumulative
    window and the final agg run over that bounded table, not the data.
    The stats broadcast assumes group cardinality is dashboard-sized
    (event types, sources); for a high-cardinality group key drop the
    F.broadcast hint and let the stats join shuffle on the same key as
    the histogram agg — the plan gains one exchange and nothing else.
    """
    g = F.col(group_col)
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = events.select(g.alias("grp"), cents.alias("c"))
    stats = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("c").alias("min_c"),
        F.max("c").alias("max_c"),
    )
    bucketed = (
        base.join(F.broadcast(stats), "grp")
        .withColumn("bucket", F.expr(f"((c - min_c) * {n_buckets}) DIV (max_c - min_c + 1)"))
    )
    # n/min_c/max_c are functional on grp, so carrying them as grouping
    # keys costs nothing and avoids a SECOND stats join (which would
    # re-run the min/max/count scan — review finding)
    hist = bucketed.groupBy("grp", "n", "min_c", "max_c", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("bn")
    )
    w = Window.partitionBy("grp").orderBy("bucket")
    cum = hist.withColumn("cum", F.sum("bn").over(w))

    def est(q_pct: int):
        # nearest-rank k = ceil(q * n / 100); first bucket with cum >= k;
        # estimate = that bucket's lower bound in cents
        k = F.expr(f"(n * {q_pct} + 99) DIV 100")
        hit_bucket = F.min(F.when(F.col("cum") >= k, F.col("bucket")))
        return hit_bucket

    agg = cum.groupBy("grp", "n", "min_c", "max_c").agg(
        est(50).alias("_b50"), est(90).alias("_b90"), est(99).alias("_b99")
    )
    lo = lambda b: (F.col("min_c") + F.expr(f"({b} * (max_c - min_c + 1)) DIV {n_buckets}")).cast("long")  # noqa: E731
    return agg.select(
        F.col("grp").alias(group_col),
        "n", "min_c", "max_c",
        lo("_b50").alias("p50_est_c"),
        lo("_b90").alias("p90_est_c"),
        lo("_b99").alias("p99_est_c"),
    )


def quantile_sketch_sql(
    table: str = "events",
    n_buckets: int = QSKETCH_BUCKETS,
    group_expr: str = "event_type",
    value_expr: str = "value",
) -> str:
    """DuckDB twin with the identical integer bucket/rank arithmetic."""
    return f"""
        WITH base AS (
          SELECT {group_expr} AS grp, CAST(round({value_expr} * 100) AS BIGINT) AS c
          FROM {table}
        ),
        stats AS (
          SELECT grp, count(*)::BIGINT AS n, min(c) AS min_c, max(c) AS max_c
          FROM base GROUP BY grp
        ),
        hist AS (
          SELECT b.grp, ((b.c - s.min_c) * {n_buckets}) // (s.max_c - s.min_c + 1) AS bucket,
                 count(*)::BIGINT AS bn
          FROM base b JOIN stats s USING (grp)
          GROUP BY b.grp, bucket
        ),
        cum AS (
          SELECT h.grp, h.bucket, s.n, s.min_c, s.max_c,
                 (sum(h.bn) OVER (PARTITION BY h.grp ORDER BY h.bucket))::BIGINT AS cum
          FROM hist h JOIN stats s USING (grp)
        ),
        hit AS (
          SELECT grp, n, min_c, max_c,
                 min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN bucket END) AS b50,
                 min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN bucket END) AS b90,
                 min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN bucket END) AS b99
          FROM cum GROUP BY grp, n, min_c, max_c
        )
        SELECT grp AS {group_expr}, n, min_c, max_c,
               (min_c + (b50 * (max_c - min_c + 1)) // {n_buckets})::BIGINT AS p50_est_c,
               (min_c + (b90 * (max_c - min_c + 1)) // {n_buckets})::BIGINT AS p90_est_c,
               (min_c + (b99 * (max_c - min_c + 1)) // {n_buckets})::BIGINT AS p99_est_c
        FROM hit
        ORDER BY {group_expr}
    """
