"""Sequence packing for pretraining batches: concat-and-chunk placement.

GPT-style pretraining concatenates documents (with a separator) and
slices the token stream into fixed-`capacity` chunks; a document's
placement is fully determined by the running token offset in front of
it. Globally that ordering is a single sort — useless at 100 TB — so
the scale-correct design packs WITHIN deterministic shards: documents
hash into `n_shards` independent streams, each packed in doc_id order.
Chunk boundaries never cross shards, shards never interact, and the
only non-projection work is one windowed prefix-sum per shard (a
shuffle on the shard key, then a per-partition sort bounded by shard
size; pick n_shards >= cluster parallelism so every executor packs in
parallel).

The reference crawler has no batching stage (its closest analog is the
fixed-size POST batching of `search_gov_crawler/elasticsearch/...`
document uploads, re-expressed in sources/sinks.py); this is one of the
corpus-preparation additions the brief calls for, with a DuckDB oracle
twin (window prefix-sums are ANSI SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens_col, tokens_sql

CAPACITY = 128  # tokens per packed chunk (driver-query default)
N_SHARDS = 8


def pack_chunks(
    docs: DataFrame,
    capacity: int = CAPACITY,
    n_shards: int = N_SHARDS,
    text_col: str = "text",
    extra_partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document placement in the packed token stream.

    Returns (doc_id, *extra_partition_cols, shard, n_tokens, start_off,
    end_off, first_chunk, last_chunk): offsets are within the
    (extra..., shard) stream's concatenation (end exclusive), chunks are
    `capacity`-token slices of it; a document straddles
    last_chunk - first_chunk chunk boundaries. Extra partition columns
    let a caller pack e.g. each train/val/test split independently.

    Determinism contract: `doc_id` MUST be unique within each
    (*extra_partition_cols, shard) stream — it is the total order key of
    the prefix-sum window, and a duplicate would make `start_off`
    engine-dependent (ties in ORDER BY are free to permute). Every call
    site feeds the `documents` table or a dedup stage's output, both of
    which carry unique doc_ids; callers packing other tables must dedup
    first (pipelines/dedup.exact_dedup) or pre-concat duplicate rows.
    """
    extra = list(extra_partition_cols)
    n_tokens = F.size(tokens_col(F.col(text_col)))
    base = docs.select(
        "doc_id",
        *extra,
        F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("long").alias("shard"),
        n_tokens.cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(*extra, "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    # Chunk ids via integer division on longs (`DIV`), never floor of a
    # float quotient — identical bit-for-bit in every engine/build.
    placed = base.select(
        "doc_id",
        *extra,
        "shard",
        "n_tokens",
        start.alias("start_off"),
        (start + F.col("n_tokens")).alias("end_off"),
    )
    return placed.select(
        "doc_id",
        *extra,
        "shard",
        "n_tokens",
        "start_off",
        "end_off",
        F.expr(f"start_off DIV {capacity}").alias("first_chunk"),
        F.expr(
            f"(start_off + greatest(n_tokens, 1) - 1) DIV {capacity}"
        ).alias("last_chunk"),
    )


def pack_chunks_sql(
    table: str = "documents",
    capacity: int = CAPACITY,
    n_shards: int = N_SHARDS,
    extra_cols: tuple[str, ...] = (),
) -> str:
    ex = "".join(f"{c}, " for c in extra_cols)
    part = ", ".join([*extra_cols, "shard"])
    return f"""
        WITH pc_t AS (
          SELECT doc_id, {ex}
                 doc_id % {n_shards} AS shard,
                 len({tokens_sql('text')}) AS n_tokens
          FROM {table}
        ), pc_s AS (
          SELECT doc_id, {ex}shard, n_tokens,
                 coalesce(sum(n_tokens) OVER (
                   PARTITION BY {part} ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
          FROM pc_t
        )
        SELECT doc_id, {ex}shard, n_tokens, start_off::BIGINT AS start_off,
               (start_off + n_tokens)::BIGINT AS end_off,
               (start_off // {capacity})::BIGINT AS first_chunk,
               ((start_off + greatest(n_tokens, 1) - 1) // {capacity})::BIGINT AS last_chunk
        FROM pc_s
        ORDER BY doc_id
    """


def chunk_stats(packed: DataFrame, capacity: int = CAPACITY) -> DataFrame:
    """Per-shard packing summary from `pack_chunks` output:
    (shard, n_docs, n_tokens, n_chunks, fill_ppm) where fill_ppm is the
    overall fill ratio (last chunk's slack included) in integer parts-
    per-million: `n_tokens * 1000000 DIV (n_chunks * capacity)`. Pure
    integer arithmetic throughout — ceil-div for n_chunks, DIV for the
    ratio — so the hashed output carries no doubles (safe up to
    ~9.2e12 tokens/shard before the *1e6 long would overflow; shards at
    100 TB stay far below that because n_shards >= parallelism)."""
    return (
        packed.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.expr(f"(sum(n_tokens) + {capacity - 1}) DIV {capacity}").alias(
                "n_chunks"
            ),
        )
        .select(
            "shard",
            "n_docs",
            "n_tokens",
            "n_chunks",
            F.expr(f"n_tokens * 1000000 DIV (n_chunks * {capacity})").alias(
                "fill_ppm"
            ),
        )
    )


def chunk_stats_sql(
    table: str = "documents",
    capacity: int = CAPACITY,
    n_shards: int = N_SHARDS,
) -> str:
    return f"""
        WITH t AS (
          SELECT doc_id % {n_shards} AS shard,
                 len({tokens_sql('text')}) AS n_tokens
          FROM {table}
        ), g AS (
          SELECT shard, count(*) AS n_docs, sum(n_tokens) AS n_tokens,
                 (sum(n_tokens) + {capacity - 1}) // {capacity} AS n_chunks
          FROM t GROUP BY shard
        )
        SELECT shard, n_docs, n_tokens::BIGINT AS n_tokens,
               n_chunks::BIGINT AS n_chunks,
               (n_tokens * 1000000 // (n_chunks * {capacity}))::BIGINT AS fill_ppm
        FROM g
        ORDER BY shard
    """


# ---------------------------------------------------------------------------
# Content-defined chunking (rolling-hash boundaries, Rabin/CDC family)
# ---------------------------------------------------------------------------

CDC_DIVISOR = 8  # expected chunk length in tokens (boundary prob = 1/divisor)


def cdc_chunks(
    docs: DataFrame, divisor: int = CDC_DIVISOR, text_col: str = "text"
) -> DataFrame:
    """Content-defined chunking over the token stream: the dedup-stable
    complement of `pack_chunks`. Fixed-size chunking shifts every
    boundary after a one-token insertion; CDC places a boundary after
    token i whenever the hash of the 2-gram ending at i is divisible by
    ``divisor``, so boundaries — and therefore chunk hashes — realign
    immediately after any local edit. Chunk-hash equality across
    documents then finds shared passages at chunk granularity (the
    LSH-bucket join shape, pipelines/dedup.py).

    Scale shape: per-row native array projection (no UDF, no shuffle)
    + one explode. Expected chunk length is ``divisor`` tokens; chunk
    hashes are the same order-sensitive rolling polynomial used by
    `textstats.fingerprints`, mod 2^31-1, all-integer for exact oracle
    comparison.

    Output: (doc_id, chunk_id 1-based, start_pos 1-based token index,
    n_tokens, chunk_hash).
    """
    from ..functions.hashing import portable_hash32_col
    from .textstats import ROLL_MOD, ROLL_MULT

    # Stage toks -> bounds -> starts/ends as real columns: each is
    # referenced many times by the next stage's lambdas, and inlining
    # them would re-run split()/the md5 boundary scan once per chunk
    # (the O(m^2) trap documented on winnow_fingerprints).
    tokd = docs.select("doc_id", tokens_col(F.col(text_col)).alias("c_toks"))
    n = F.size("c_toks")
    # Boundary AFTER token i (2 <= i < n) iff hash(tok[i-1] + ' ' + tok[i])
    # is divisible; never after the last token (that chunk ends anyway).
    bounded = tokd.select(
        "doc_id",
        "c_toks",
        F.when(
            n >= 2,
            F.filter(
                F.sequence(F.lit(2), n),
                lambda i: (i < n)
                & (
                    portable_hash32_col(
                        F.concat_ws(" ", F.slice(F.col("c_toks"), i - 1, 2))
                    )
                    % divisor
                    == 0
                ),
            ),
        ).otherwise(F.array().cast("array<int>")).alias("bounds"),
    )
    staged = bounded.select(
        "doc_id",
        "c_toks",
        F.concat(
            F.array(F.lit(1)).cast("array<int>"),
            F.transform("bounds", lambda b: (b + 1).cast("int")),
        ).alias("starts"),
        F.concat(F.col("bounds"), F.array(n.cast("int"))).alias("ends"),
    )

    def chunk_struct(c):
        st = F.element_at(F.col("starts"), c)
        en = F.element_at(F.col("ends"), c)
        seg = F.slice(F.col("c_toks"), st, en - st + 1)
        roll = F.aggregate(
            F.transform(seg, lambda t: portable_hash32_col(t)),
            F.lit(0).cast("long"),
            lambda acc, h: (acc * ROLL_MULT + h) % ROLL_MOD,
        )
        return F.struct(
            c.cast("int").alias("chunk_id"),
            st.cast("int").alias("start_pos"),
            (en - st + 1).cast("int").alias("n_tokens"),
            roll.alias("chunk_hash"),
        )

    chunks = F.transform(F.sequence(F.lit(1), F.size("starts")), chunk_struct)
    return staged.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.start_pos").alias("start_pos"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.chunk_hash").alias("chunk_hash"),
    )


def cdc_chunks_sql(divisor: int = CDC_DIVISOR, table: str = "documents") -> str:
    from .textstats import ROLL_MOD, ROLL_MULT
    from ..functions.hashing import portable_hash32_sql

    h2 = portable_hash32_sql("array_to_string(list_slice(toks, i - 1, i), ' ')")
    ht = portable_hash32_sql("t")
    return f"""
        WITH cd_t AS (
          SELECT doc_id, toks, len(toks) AS n
          FROM (SELECT doc_id, {tokens_sql('text')} AS toks FROM {table})
        ), cd_b AS (
          SELECT doc_id, toks, n,
                 list_filter(generate_series(2, n),
                             i -> i < n AND ({h2}) % {divisor} = 0) AS bounds
          FROM cd_t
        ), cd_c AS (
          SELECT doc_id, toks,
                 list_concat([1], list_transform(bounds, b -> b + 1)) AS starts,
                 list_concat(bounds, [n]) AS ends
          FROM cd_b
        )
        SELECT doc_id,
               u.c::BIGINT AS chunk_id,
               starts[u.c]::BIGINT AS start_pos,
               (ends[u.c] - starts[u.c] + 1)::BIGINT AS n_tokens,
               list_reduce(
                 list_prepend(0::BIGINT,
                   list_transform(list_slice(toks, starts[u.c], ends[u.c]), t -> {ht})),
                 (acc, h) -> (acc * {ROLL_MULT} + h) % {ROLL_MOD}
               ) AS chunk_hash
        FROM cd_c, unnest(generate_series(1, len(starts))) AS u(c)
        ORDER BY doc_id, chunk_id
    """


# ---------------------------------------------------------------------------
# Interleaved (multimodal) sequence packing over the span model
# ---------------------------------------------------------------------------

MEDIA_BUDGET = 16  # tokens a media span occupies in the packed stream


def pack_spans(
    spanned: DataFrame,
    capacity: int = CAPACITY,
    n_shards: int = N_SHARDS,
    media_budget: int = MEDIA_BUDGET,
) -> DataFrame:
    """Sequence packing for INTERLEAVED text+media documents (the
    BASELINE input-hint shape): each document's cost in the packed token
    stream is its text-token count plus ``media_budget`` tokens per media
    span (the fixed per-image token count a vision encoder emits), and
    placement is the same shard-local windowed prefix sum as
    ``pack_chunks`` — multimodal batches pack exactly like text ones once
    cost is defined, and a document's spans are never split across
    shards so (kind, text, media_ref, order) stays intact per chunk
    assembly.

    Input: (doc_id, spans) rows (spans: array<struct<kind, text,
    media_ref, offset>>). Output per doc: shard, n_text_tokens, n_media,
    cost, start_off/end_off in the shard stream, first/last chunk ids —
    all integer-exact (DIV, never float floor). Same doc_id-uniqueness
    contract as pack_chunks.

    Scale shape: per-row higher-order array projections (no UDF, no
    explode), then ONE shuffle on the shard key for the prefix-sum
    window. n_shards >= cluster parallelism keeps every executor packing
    independently at 100 TB.
    """
    spans = F.col("spans")
    texts = F.filter(spans, lambda s: s["kind"] == "text")
    n_media = F.size(F.filter(spans, lambda s: s["kind"] == "media"))
    n_text_tokens = F.aggregate(
        texts,
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.size(tokens_col(s["text"])),
    )
    base = spanned.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("long").alias("shard"),
        n_text_tokens.alias("n_text_tokens"),
        n_media.cast("long").alias("n_media"),
        (n_text_tokens + n_media.cast("long") * media_budget).alias("cost"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("cost").over(w), F.lit(0))
    placed = base.select(
        "doc_id",
        "shard",
        "n_text_tokens",
        "n_media",
        "cost",
        start.alias("start_off"),
        (start + F.col("cost")).alias("end_off"),
    )
    return placed.select(
        "*",
        F.expr(f"start_off DIV {capacity}").alias("first_chunk"),
        F.expr(
            f"(start_off + greatest(cost, 1) - 1) DIV {capacity}"
        ).alias("last_chunk"),
    )


def pack_spans_sql(
    table: str = "documents",
    capacity: int = CAPACITY,
    n_shards: int = N_SHARDS,
    media_budget: int = MEDIA_BUDGET,
) -> str:
    from .spans import derive_spans_sql_cte

    return f"""
        WITH {derive_spans_sql_cte(table)},
        ps_c AS (
          SELECT doc_id,
                 doc_id % {n_shards} AS shard,
                 list_reduce(list_prepend(0::BIGINT,
                   list_transform(list_filter(spans, s -> s['kind'] = 'text'),
                                  s -> len({tokens_sql("s['text']")})::BIGINT)),
                   (a, b) -> a + b) AS n_text_tokens,
                 len(list_filter(spans, s -> s['kind'] = 'media'))::BIGINT AS n_media
          FROM sp
        ), ps_s AS (
          SELECT doc_id, shard, n_text_tokens, n_media,
                 n_text_tokens + n_media * {media_budget} AS cost,
                 coalesce(sum(n_text_tokens + n_media * {media_budget}) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
          FROM ps_c
        )
        SELECT doc_id, shard, n_text_tokens, n_media, cost,
               start_off::BIGINT AS start_off,
               (start_off + cost)::BIGINT AS end_off,
               (start_off // {capacity})::BIGINT AS first_chunk,
               ((start_off + greatest(cost, 1) - 1) // {capacity})::BIGINT AS last_chunk
        FROM ps_s
        ORDER BY doc_id
    """
