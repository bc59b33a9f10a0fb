"""Deterministic corpus sampling & train/val/test splitting.

Why hash-based buckets instead of ``rand()``: a training-data split
must be (1) reproducible across runs and engines, (2) stable under
repartitioning and incremental appends — a document keeps its split
when new crawl waves land — and (3) assignable with zero coordination.
A salted md5 bucket of the document key gives all three; ``rand(seed)``
gives none (its values depend on partition layout and row order).

Scale shape: ``hash_split`` and ``stratified_sample`` are narrow
per-row projections — NO shuffle, one codegen'd md5 per row; at 100 TB
the split column is free relative to the scan, and writers can
``partitionBy("split")`` without a separate assignment pass.
``leakage_safe_split`` additionally resolves near-dup clusters (bounded
min-label propagation, one shuffle per round over the LSH pair graph)
and splits on the cluster representative, so near-duplicate documents
ALWAYS land in the same split — closing the classic eval-contamination
hole where a test document's near-twin sits in train. The reference
crawler has no corpus-prep stage (its dedup is URL-level,
``helpers/domain_spider.py``); these are the corpus-preparation
additions the brief calls for, with DuckDB oracle twins via the
portable md5 hash family (functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash32_col, portable_hash32_sql
from .dedup import dup_clusters, simhash_near_dups

# Bucket granularity: weights resolve to integer thresholds out of 10^4,
# so any weight expressible to 0.01% is exact (no float-boundary drift
# between Spark and the SQL oracle).
SPLIT_BUCKETS = 10_000

DEFAULT_WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}


def split_bucket_col(key: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, SPLIT_BUCKETS) from a salted md5 of
    the key. Different salts give independent splits over the same keys
    (e.g. one per experiment) without touching the data."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(
        portable_hash32_col(F.concat(F.lit(f"{salt}|"), c.cast("string"))),
        F.lit(SPLIT_BUCKETS),
    ).cast("long")


def split_bucket_sql(key_expr: str, salt: str = "") -> str:
    """DuckDB fragment computing the identical bucket."""
    salted = f"'{salt}|' || CAST({key_expr} AS VARCHAR)"
    return f"({portable_hash32_sql(salted)} % {SPLIT_BUCKETS})"


def _thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    out, cum = [], 0.0
    for name, w in weights.items():
        cum += w
        out.append((name, round(cum * SPLIT_BUCKETS)))
    out[-1] = (out[-1][0], SPLIT_BUCKETS)  # absorb rounding in the last split
    return out


def split_label_col(bucket: Column, weights: dict[str, float] | None = None) -> Column:
    """Map a bucket to its split name by cumulative-weight thresholds."""
    expr = None
    for name, hi in _thresholds(weights or DEFAULT_WEIGHTS):
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr


def split_label_sql(bucket_expr: str, weights: dict[str, float] | None = None) -> str:
    arms = " ".join(
        f"WHEN {bucket_expr} < {hi} THEN '{name}'"
        for name, hi in _thresholds(weights or DEFAULT_WEIGHTS)
    )
    return f"CASE {arms} END"


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Assign every row a deterministic train/val/test split: adds
    ``split_bucket`` and ``split`` columns. Pure projection — no shuffle,
    stable under appends and repartitioning."""
    bucket = split_bucket_col(key_col, salt)
    return df.withColumn("split_bucket", bucket).withColumn(
        "split", split_label_col(F.col("split_bucket"), weights)
    )


def hash_split_sql(
    key_expr: str, weights: dict[str, float] | None = None, salt: str = ""
) -> tuple[str, str]:
    """(bucket_expr, split_case_expr) mirroring hash_split in DuckDB."""
    bucket = split_bucket_sql(key_expr, salt)
    return bucket, split_label_sql(bucket, weights)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float] | float,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its salted
    bucket falls below the stratum's fraction. The native-Spark analog of
    ``sampleBy`` with exact reproducibility (``sampleBy`` is partition-
    order dependent). Unknown strata are dropped when ``fractions`` is a
    dict. Narrow projection + filter — no shuffle."""
    bucket = split_bucket_col(key_col, salt)
    if isinstance(fractions, dict):
        frac = None
        for stratum, f in fractions.items():
            cond = F.col(strata_col) == F.lit(stratum)
            lim = F.lit(round(f * SPLIT_BUCKETS))
            frac = F.when(cond, lim) if frac is None else frac.when(cond, lim)
        keep = bucket < frac  # null threshold (unknown stratum) -> filtered
    else:
        keep = bucket < F.lit(round(fractions * SPLIT_BUCKETS))
    return df.where(keep)


def stratified_sample_sql(
    fractions: dict[str, float] | float,
    strata_expr: str = "lang",
    key_expr: str = "doc_id",
    salt: str = "",
) -> str:
    """WHERE-clause fragment mirroring stratified_sample."""
    bucket = split_bucket_sql(key_expr, salt)
    if isinstance(fractions, dict):
        arms = " ".join(
            f"WHEN {strata_expr} = '{s}' THEN {round(f * SPLIT_BUCKETS)}"
            for s, f in fractions.items()
        )
        return f"{bucket} < (CASE {arms} END)"
    return f"{bucket} < {round(fractions * SPLIT_BUCKETS)}"


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    weights: dict[str, float] | None = None,
    salt: str = "",
    max_hamming: int = 3,
) -> DataFrame:
    """Train/val/test split that can NOT leak near-duplicates across
    splits: resolve near-dup pairs (SimHash hd<=``max_hamming`` by
    default, or any caller-supplied (doc_a, doc_b) pair set, e.g.
    MinHash LSH) into clusters, then hash-split on the CLUSTER
    representative — every member of a cluster inherits the same split.

    Returns (doc_id, cluster, split_bucket, split). Scale: cluster
    resolution is the bounded label propagation of ``dup_clusters``;
    the split itself is a projection on the cluster key, and the final
    join is doc_id-keyed (AQE broadcasts the label side when small)."""
    if pairs is None:
        pairs = simhash_near_dups(docs, max_hamming=max_hamming)
    clusters = dup_clusters(pairs, docs.select("doc_id"))
    labeled = clusters.withColumn("split_bucket", split_bucket_col("cluster", salt))
    return labeled.withColumn("split", split_label_col(F.col("split_bucket"), weights))


def mixture_weights(
    docs: DataFrame,
    weights: dict[str, float],
    default: float = 1.0,
    key_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mixture",
) -> DataFrame:
    """Per-document repeat counts for a weighted source mixture
    (Pile/DoReMi-style epoch factors): a source with weight 2.5 repeats
    every doc twice and a deterministic hash-chosen half of them a third
    time, so the expected epoch count per source is exact while each
    document's multiplicity is reproducible (same properties as
    hash_split: stable under repartitioning and appends, no rand()).

    Adds (weight, n_repeats); n_repeats = floor(w) + (bucket < frac(w)).
    Pure projection — no shuffle.
    """
    w = None
    for s, f_ in weights.items():
        cond = F.col(source_col) == F.lit(s)
        w = F.when(cond, F.lit(float(f_))) if w is None else w.when(cond, F.lit(float(f_)))
    w = F.lit(float(default)) if w is None else w.otherwise(F.lit(float(default)))
    bucket = split_bucket_col(key_col, salt)
    base = F.floor(w).cast("long")
    frac_th = F.round((w - F.floor(w)) * SPLIT_BUCKETS).cast("long")
    extra = (bucket < frac_th).cast("long")
    return docs.withColumn("weight", w).withColumn("n_repeats", base + extra)


def mixture_expand(weighted: DataFrame) -> DataFrame:
    """Materialize the mixture: one row per (doc_id, copy_idx) repeat.
    Docs with n_repeats = 0 are dropped. sequence() is gated (Spark's
    sequence(1, 0) steps DOWNWARD, it is not empty)."""
    copies = F.when(
        F.col("n_repeats") >= 1,
        F.sequence(F.lit(1).cast("long"), F.col("n_repeats")),
    ).otherwise(F.array().cast("array<long>"))
    return weighted.select("doc_id", F.explode(copies).alias("copy_idx"))


def mixture_weights_sql(
    weights: dict[str, float],
    default: float = 1.0,
    table: str = "documents",
    key_expr: str = "doc_id",
    source_expr: str = "source",
    salt: str = "mixture",
) -> str:
    arms = " ".join(
        f"WHEN {source_expr} = '{s}' THEN {float(f_)}" for s, f_ in weights.items()
    )
    # CAST: DuckDB folds numeric CASE literals to DECIMAL, whose string
    # form ('0.00') would hash-mismatch Spark's double ('0.0').
    w = f"CAST((CASE {arms} ELSE {float(default)} END) AS DOUBLE)"
    bucket = split_bucket_sql(key_expr, salt)
    return f"""
        SELECT *, {w} AS weight,
               CAST(floor({w}) AS BIGINT)
                 + CAST({bucket} < CAST(round(({w} - floor({w})) * {SPLIT_BUCKETS}, 0) AS BIGINT) AS BIGINT)
                 AS n_repeats
        FROM {table}
        ORDER BY doc_id
    """


def mixture_expand_sql(
    weights: dict[str, float],
    default: float = 1.0,
    table: str = "documents",
) -> str:
    inner = mixture_weights_sql(weights, default, table)
    return f"""
        SELECT doc_id, CAST(c AS BIGINT) AS copy_idx
        FROM ({inner}) , unnest(range(1, n_repeats + 1)) AS u(c)
        ORDER BY doc_id, copy_idx
    """


WSAMPLE_SALT = "wsample-r2"
WSAMPLE_K = 50


def weighted_sample(
    docs: DataFrame, k: int = WSAMPLE_K, weight_col: str = "n_chars"
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each row draws u in (0, 1] from the salted portable
    hash of its id and keeps key = ln(u) / w; the k largest keys are the
    sample, each row's inclusion probability proportional to its weight.

    Determinism: u is a pure function of doc_id (same value in the SQL
    twin), keys are rounded to 9 decimals for ORDERING so ln ulps can't
    flip the boundary, and doc_id breaks exact ties. Plan: projection +
    orderBy().limit(k) — Spark's distributed TakeOrderedAndProject (each
    partition keeps its local top-k, the driver merges k-sized heaps) —
    then the rank window runs over the ALREADY k-row result, so the
    single-partition WindowExec is bounded by k, never by corpus size.
    """
    u = (
        portable_hash32_col(
            F.concat(F.lit(f"{WSAMPLE_SALT}|"), F.col("doc_id").cast("string"))
        )
        + F.lit(1)
    ).cast("double") / F.lit(4294967296.0)
    key = F.round(F.log(u) / F.col(weight_col), 9)
    from pyspark.sql import Window

    w = Window.partitionBy().orderBy(F.desc("key"), F.asc("doc_id"))
    topk = (
        docs.select("doc_id", F.col(weight_col).alias("weight"), key.alias("key"))
        .orderBy(F.desc("key"), F.asc("doc_id"))
        .limit(k)
    )
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("doc_id", "weight", "key", "rank")
    )


def weighted_sample_sql(
    k: int = WSAMPLE_K, weight_col: str = "n_chars", table: str = "documents"
) -> str:
    h = portable_hash32_sql(f"'{WSAMPLE_SALT}|' || doc_id")
    return f"""
        WITH keyed AS (
          SELECT doc_id, {weight_col} AS weight,
                 round(ln(({h} + 1)::DOUBLE / 4294967296.0) / {weight_col}, 9) AS key
          FROM {table}
        ), ranked AS (
          SELECT doc_id, weight, key,
                 row_number() OVER (ORDER BY key DESC, doc_id ASC)::BIGINT AS rank
          FROM keyed
        )
        SELECT doc_id, weight, key, rank FROM ranked WHERE rank <= {k}
        ORDER BY rank
    """


# ---------------------------------------------------------------------------
# DSIR-style importance weights (data selection for a target distribution)
# ---------------------------------------------------------------------------


def dsir_weights(
    docs: DataFrame, target_source: str = "src0", text_col: str = "text"
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023)
    restated over unigram features: per document, the importance
    log-weight sum_t [ ln p_target(t) - ln p_raw(t) ] with add-one
    smoothing, where the target distribution is estimated from the
    slice of the corpus matching ``target_source`` and the raw
    distribution from the whole corpus. Documents with the highest
    weight are the ones to up-sample when you want more
    target-looking data — the standard pretraining data-selection
    recipe when a small high-quality target corpus exists.

    Output: (doc_id, n_tokens, log_weight, avg_log_weight) — raw IEEE
    doubles, no rounding (sums of ulp-identical ln operands agree
    across engines far inside the gate's 1e-9).

    Scale shape: identical to lm_score — two vocab hash-aggs (map-side
    combine), the per-term log-ratio table broadcasts back onto the
    token stream (vocab << corpus), one final per-doc agg. The target
    slice is a pushed-down filter, not a second scan at the plan level
    (Spark reuses the exchange; at 100 TB the target estimate can also
    be precomputed once and broadcast as a static table).
    """
    from .textstats import tokens_col

    terms = docs.select(
        "doc_id",
        F.col("source"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    ).filter(F.length("term") > 0)
    raw = terms.groupBy("term").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt = (
        terms.filter(F.col("source") == target_source)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c_tgt"))
    )
    vocab = raw.join(tgt, "term", "left").na.fill({"c_tgt": 0})
    tot = vocab.agg(
        F.sum("c_raw").alias("total_raw"),
        F.sum("c_tgt").alias("total_tgt"),
        F.count(F.lit(1)).alias("v_size"),
    )
    ratio = vocab.crossJoin(F.broadcast(tot)).select(
        "term",
        (
            F.log(
                (F.col("c_tgt") + F.lit(1)).cast("double")
                / (F.col("total_tgt") + F.col("v_size")).cast("double")
            )
            - F.log(
                (F.col("c_raw") + F.lit(1)).cast("double")
                / (F.col("total_raw") + F.col("v_size")).cast("double")
            )
        ).alias("log_ratio"),
    )
    return (
        terms.join(F.broadcast(ratio), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("log_ratio").alias("log_weight"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "log_weight",
            (F.col("log_weight") / F.col("n_tokens")).alias("avg_log_weight"),
        )
    )


def dsir_weights_sql(table: str = "documents", target_source: str = "src0") -> str:
    from .textstats import tokens_sql

    return f"""
        WITH terms AS (
          SELECT doc_id, source, unnest({tokens_sql('text')}) AS term
          FROM {table}
        ),
        terms_ne AS (SELECT * FROM terms WHERE length(term) > 0),
        raw AS (SELECT term, count(*)::BIGINT AS c_raw FROM terms_ne GROUP BY term),
        tgt AS (
          SELECT term, count(*)::BIGINT AS c_tgt FROM terms_ne
          WHERE source = '{target_source}' GROUP BY term
        ),
        vocab AS (
          SELECT raw.term, raw.c_raw, coalesce(tgt.c_tgt, 0) AS c_tgt
          FROM raw LEFT JOIN tgt ON raw.term = tgt.term
        ),
        tot AS (
          SELECT sum(c_raw)::BIGINT AS total_raw, sum(c_tgt)::BIGINT AS total_tgt,
                 count(*)::BIGINT AS v_size
          FROM vocab
        ),
        ratio AS (
          SELECT term,
                 ln((c_tgt + 1) / (total_tgt + v_size))
                 - ln((c_raw + 1) / (total_raw + v_size)) AS log_ratio
          FROM vocab CROSS JOIN tot
        ),
        scored AS (
          SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(log_ratio) AS log_weight
          FROM terms_ne JOIN ratio USING (term)
          GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, log_weight,
               log_weight / n_tokens AS avg_log_weight
        FROM scored ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle (training-order assignment)
# ---------------------------------------------------------------------------


def epoch_shuffle(
    docs: DataFrame, epoch: int = 1, n_shards: int = 64, key: str = "doc_id"
) -> DataFrame:
    """Global training-data shuffle for an epoch, with ZERO shuffle at
    assignment time: every document gets (shard, sort_key) from a salted
    portable hash of its key, a different permutation per epoch. The
    trainer streams shards in shard order, each shard sorted by
    sort_key — equivalent to a uniform pseudo-random permutation, but
    the assignment is a pure per-row projection: reproducible across
    runs/engines, stable under repartitioning and corpus appends, and
    free at 100 TB (the only data movement is the writer's
    partitionBy(shard), which replaces — not adds to — its normal
    output partitioning). Contrast with ``ORDER BY rand()``: a full
    range-partitioned sort whose result changes with partition layout.
    """
    h = portable_hash32_col(
        F.concat(F.lit(f"epoch{epoch}|"), F.col(key).cast("string"))
    )
    return docs.select(
        F.col(key),
        F.lit(epoch).cast("long").alias("epoch"),
        F.pmod(h, F.lit(n_shards)).cast("long").alias("shard"),
        h.cast("long").alias("sort_key"),
    )


def epoch_shuffle_sql(
    table: str = "documents", epoch: int = 1, n_shards: int = 64, key: str = "doc_id"
) -> str:
    h = portable_hash32_sql(f"'epoch{epoch}|' || CAST({key} AS VARCHAR)")
    return f"""
        SELECT {key},
               {epoch}::BIGINT AS epoch,
               ({h} % {n_shards})::BIGINT AS shard,
               ({h})::BIGINT AS sort_key
        FROM {table}
        ORDER BY {key}
    """


# --- temperature-scaled source mixture ---------------------------------------


def mixture_temperature(docs: DataFrame, source_col: str = "source") -> DataFrame:
    """Temperature-scaled (alpha = 0.5) sampling shares per source.

    Multilingual / multi-source LLM training mixes rarely sample
    proportionally to corpus size: raw proportions drown low-resource
    sources, uniform sampling over-repeats tiny ones. The standard
    compromise samples source i with probability proportional to
    ``p_i^alpha`` (mBERT/XLM-R exponent smoothing; DoReMi's static
    baseline). alpha is fixed at 1/2 because sqrt is the one power IEEE
    754 guarantees correctly rounded — both engines produce the
    bit-identical double, so the floor'd fixed-point weight below is
    deterministic cross-engine (an arbitrary ``pow(x, a)`` is NOT
    correctly rounded and could flip a floor boundary).

    Per source: ``(source, n_docs, n_bytes, w_sqrt =
    floor(1e3 * sqrt(n_bytes)), share_ppm = w_sqrt * 1e6 DIV
    sum(w_sqrt))`` — integer outputs only. The fixed-point scale is 1e3,
    not 1e6: at 100 TB a source can hold ~1e14 bytes, so w_sqrt stays
    <= ~1e10 and the ppm numerator <= ~1e16 — comfortably inside BIGINT
    in both engines (a 1e6 scale would overflow Spark's long). One
    map-side-combinable hash agg + a broadcast 1-row total join; output
    bounded by source cardinality.
    """
    per_src = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.octet_length("text")).cast("long").alias("n_bytes"),
    )
    w = F.floor(F.lit(1_000.0) * F.sqrt(F.col("n_bytes").cast("double"))).cast("long")
    weighted = per_src.withColumn("w_sqrt", w)
    total = weighted.agg(F.sum("w_sqrt").alias("_w_total"))
    return (
        weighted.join(F.broadcast(total))
        .select(
            "source", "n_docs", "n_bytes", "w_sqrt",
            F.expr("w_sqrt * 1000000 DIV _w_total").alias("share_ppm"),
        )
    )


def mixture_temperature_sql(table: str = "documents", source_expr: str = "source") -> str:
    """DuckDB twin (identical sqrt fixed-point arithmetic)."""
    return f"""
        WITH per_src AS (
          SELECT {source_expr} AS source,
                 count(*)::BIGINT AS n_docs,
                 -- strlen = UTF-8 byte count in DuckDB (octet_length is BLOB-only);
                 -- matches Spark's octet_length on strings
                 sum(strlen(text))::BIGINT AS n_bytes
          FROM {table} GROUP BY {source_expr}
        ),
        weighted AS (
          SELECT *, CAST(floor(1000.0 * sqrt(n_bytes::DOUBLE)) AS BIGINT) AS w_sqrt
          FROM per_src
        )
        SELECT source, n_docs, n_bytes, w_sqrt,
               -- ::BIGINT: sum() promotes to HUGEINT in DuckDB and the
               -- division inherits it; the driver's canonicalizer needs int64
               (w_sqrt * 1000000 // (SELECT sum(w_sqrt) FROM weighted))::BIGINT AS share_ppm
        FROM weighted
        ORDER BY source
    """
