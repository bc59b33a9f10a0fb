"""Operators over the interleaved text+media span model.

The canonical input table (BASELINE.json input_hint) is

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

The crawl engine produces this shape from fetched pages
(operators/extraction.py); here are the generic span-level operators a
corpus pipeline needs — all native higher-order array functions, order-
preserving by construction (the per-row invariant is span-sequence
equality on (kind, text, media_ref, order)).

``derive_spans`` deterministically lifts a flat text table into the
interleaved shape (every 7th token becomes a media span) so these
operators are exercised — and oracle-checked — on the driver's flat
``documents`` testdata too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_col, tokens_sql

SPAN_SCHEMA = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
MEDIA_EVERY = 7  # token positions p with p % 7 == 3 become media spans


def derive_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, *keep, spans) with spans interleaved deterministically
    from text: 1-based token position p -> media span iff p % 7 == 3,
    else text span. offset = p - 1;
    media_ref = 'https://cdn.example.gov/<doc>/<p>.png'."""
    toks = tokens_col(text_col)
    # Two-arg transform gives (element, 0-based index) directly — no
    # sequence materialization and no per-position element_at probe.
    spans = F.transform(
        toks,
        lambda t, i: F.when(
            (i + 1) % MEDIA_EVERY == 3,
            F.struct(
                F.lit("media").alias("kind"),
                F.lit(None).cast("string").alias("text"),
                F.concat(
                    F.lit("https://cdn.example.gov/"), F.col(id_col).cast("string"), F.lit("/"),
                    (i + 1).cast("string"), F.lit(".png"),
                ).alias("media_ref"),
                i.cast("int").alias("offset"),
            ),
        ).otherwise(
            F.struct(
                F.lit("text").alias("kind"),
                t.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                i.cast("int").alias("offset"),
            )
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), *[F.col(c) for c in keep], spans.alias("spans")
    )


def derive_spans_sql_cte(table: str = "documents", keep: tuple[str, ...] = ()) -> str:
    """DuckDB CTE producing the identical (doc_id, *keep, spans) rows."""
    keep_outer = "".join(f" {c}," for c in keep)
    keep_inner = "".join(f" {c}," for c in keep)
    return f"""
        sp AS (
          SELECT doc_id,{keep_outer}
                 list_transform(generate_series(1, len(toks)), p ->
                   CASE WHEN p % {MEDIA_EVERY} = 3 THEN
                     {{'kind': 'media', 'text': NULL,
                       'media_ref': 'https://cdn.example.gov/' || doc_id::VARCHAR || '/' || p::VARCHAR || '.png',
                       'offset': p - 1}}
                   ELSE
                     {{'kind': 'text', 'text': toks[p], 'media_ref': NULL, 'offset': p - 1}}
                   END) AS spans
          FROM (SELECT doc_id,{keep_inner} {tokens_sql('text')} AS toks FROM {table})
        )
    """


def flatten_spans(spanned: DataFrame) -> DataFrame:
    """posexplode preserving order: (doc_id, pos, kind, text, media_ref,
    offset). The pos == offset invariant holds for engine output."""
    return spanned.select(
        "doc_id", F.posexplode("spans").alias("pos", "s")
    ).select(
        "doc_id", "pos", F.col("s.kind").alias("kind"), F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"), F.col("s.offset").alias("offset"),
    )


def derive_flat_spans(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """``flatten_spans(derive_spans(docs))`` fused into one codegen-able
    plan: posexplode the token array FIRST, then compute the span fields
    as plain column expressions on the exploded rows. Semantically
    identical (tested row-for-row), but the struct array never
    materializes and no interpreted higher-order lambdas run — measured
    ~3.5x faster at sf0.1. Use when the source is a flat text table;
    ``flatten_spans`` remains the operator for REAL spans-array tables
    (the BASELINE input-hint shape, e.g. crawl extraction output)."""
    toks = tokens_col(text_col)
    flat = docs.select(F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "tok"))
    p1 = F.col("pos") + 1
    is_media = p1 % MEDIA_EVERY == 3
    return flat.select(
        "doc_id",
        "pos",
        F.when(is_media, F.lit("media")).otherwise(F.lit("text")).alias("kind"),
        F.when(is_media, F.lit(None).cast("string")).otherwise(F.col("tok")).alias("text"),
        F.when(
            is_media,
            F.concat(
                F.lit("https://cdn.example.gov/"), F.col("doc_id").cast("string"),
                F.lit("/"), p1.cast("string"), F.lit(".png"),
            ),
        ).alias("media_ref"),
        F.col("pos").cast("int").alias("offset"),
    )


def flatten_spans_sql(table: str = "documents") -> str:
    return f"""
        WITH {derive_spans_sql_cte(table)}
        SELECT doc_id, u.pos - 1 AS pos, u.s['kind'] AS kind, u.s['text'] AS text,
               u.s['media_ref'] AS media_ref, u.s['offset'] AS "offset"
        FROM sp, (SELECT unnest(spans) AS s, generate_subscripts(spans, 1) AS pos) u
        ORDER BY doc_id, pos
    """


def span_stats(spanned: DataFrame) -> DataFrame:
    """Per-doc span accounting: counts per kind, total text chars, media
    refs in order — pure higher-order functions, no explode."""
    spans = F.col("spans")
    texts = F.filter(spans, lambda s: s["kind"] == "text")
    media = F.filter(spans, lambda s: s["kind"] == "media")
    return spanned.select(
        "doc_id",
        F.size(spans).alias("n_spans"),
        F.size(texts).alias("n_text"),
        F.size(media).alias("n_media"),
        F.aggregate(texts, F.lit(0), lambda acc, s: acc + F.length(s["text"])).alias("text_chars"),
        F.transform(media, lambda s: s["media_ref"]).alias("media_refs"),
    )


def span_stats_sql(table: str = "documents") -> str:
    return f"""
        WITH {derive_spans_sql_cte(table)}
        SELECT doc_id,
               len(spans) AS n_spans,
               len(list_filter(spans, s -> s['kind'] = 'text')) AS n_text,
               len(list_filter(spans, s -> s['kind'] = 'media')) AS n_media,
               list_reduce(list_prepend(0,
                 list_transform(list_filter(spans, s -> s['kind'] = 'text'),
                                s -> length(s['text']))), (a, b) -> a + b) AS text_chars,
               array_to_string(list_transform(list_filter(spans, s -> s['kind'] = 'media'),
                              s -> s['media_ref']), ',') AS media_refs
        FROM sp
        ORDER BY doc_id
    """


def reassemble_text(spanned: DataFrame) -> DataFrame:
    """Inverse of derive_spans for the text spans: space-joined text spans
    in offset order (round-trip invariant used by tests)."""
    ordered = F.array_sort(
        F.col("spans"), lambda a, b: F.when(a["offset"] < b["offset"], -1).when(a["offset"] > b["offset"], 1).otherwise(0)
    )
    texts = F.filter(ordered, lambda s: s["kind"] == "text")
    return spanned.select(
        "doc_id",
        F.array_join(F.transform(texts, lambda s: s["text"]), " ").alias("text"),
    )


CAPTION_WINDOW = 3  # span positions of context on each side of a media span


def media_captions(spanned: DataFrame, window: int = CAPTION_WINDOW) -> DataFrame:
    """(image, caption-context) pair mining from interleaved documents —
    the multimodal-training-data operator: for every media span, the text
    spans within ``window`` positions before and after it, in order.
    This is how image-text pair corpora are built from interleaved web
    documents (alt-text/neighboring-sentence mining).

    Output: (doc_id, media_ref, offset, caption_before, caption_after) —
    one row per media span, captions are space-joined neighboring text
    spans (empty string when none).

    Scale shape: pure per-row higher-order array functions (no UDF) +
    one explode whose output is proportional to the media-span count;
    context never leaves the row, so there is no self-join on position —
    the naive formulation — and no shuffle at all before any downstream
    agg.
    """
    spans = F.col("spans")
    n = F.size(spans)

    def texts_in(seg):
        return F.array_join(
            F.transform(
                F.filter(seg, lambda s: s["kind"] == "text"),
                lambda s: s["text"],
            ),
            " ",
        )

    def pair(p):
        start_b = F.greatest(p - window, F.lit(1))
        before = F.slice(spans, start_b, p - start_b)
        after = F.slice(spans, p + 1, F.lit(window))
        m = F.element_at(spans, p)
        return F.struct(
            m["media_ref"].alias("media_ref"),
            m["offset"].alias("offset"),
            texts_in(before).alias("caption_before"),
            texts_in(after).alias("caption_after"),
        )

    # guard n >= 1: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty
    # like DuckDB's generate_series — a real spans table may hold empty
    # arrays (derived spans never do: tokens_col('') -> [''])
    media_pos = F.when(
        n >= 1,
        F.filter(
            F.sequence(F.lit(1), n),
            lambda i: F.element_at(spans, i)["kind"] == "media",
        ),
    ).otherwise(F.array().cast("array<int>"))
    rows = F.transform(media_pos, pair)
    return spanned.select("doc_id", F.explode(rows).alias("m")).select(
        "doc_id",
        F.col("m.media_ref").alias("media_ref"),
        F.col("m.offset").alias("offset"),
        F.col("m.caption_before").alias("caption_before"),
        F.col("m.caption_after").alias("caption_after"),
    )


def media_captions_sql(table: str = "documents", window: int = CAPTION_WINDOW) -> str:
    return f"""
        WITH {derive_spans_sql_cte(table)},
        mc AS (
          SELECT doc_id, spans,
                 list_filter(generate_series(1, len(spans)),
                             i -> spans[i]['kind'] = 'media') AS media_pos
          FROM sp
        )
        SELECT doc_id,
               spans[u.p]['media_ref'] AS media_ref,
               spans[u.p]['offset'] AS "offset",
               coalesce(array_to_string(list_transform(
                 list_filter(list_slice(spans, greatest(u.p - {window}, 1), u.p - 1),
                             s -> s['kind'] = 'text'),
                 s -> s['text']), ' '), '') AS caption_before,
               coalesce(array_to_string(list_transform(
                 list_filter(list_slice(spans, u.p + 1, u.p + {window}),
                             s -> s['kind'] = 'text'),
                 s -> s['text']), ' '), '') AS caption_after
        FROM mc, unnest(media_pos) AS u(p)
        ORDER BY doc_id, "offset"
    """


def interleave_profile(spanned: DataFrame) -> DataFrame:
    """Per-document interleaving structure: counts of adjacent span-kind
    transitions (text->text, text->media, media->text, media->media) plus
    the longest text run — how tightly media interleaves with text, the
    statistic that drives the media token budget in ``packing.pack_spans``
    and caption-window sizing in ``media_captions``.

    Pure per-row higher-order array functions (one pass over the spans
    array, no explode, no shuffle); all-integer output.
    """
    spans = F.col("spans")
    n = F.size(spans)

    def trans_count(a: str, b: str):
        # guard n >= 2: Spark's sequence(1, 0) is DESCENDING [1, 0], not
        # empty like DuckDB's generate_series — unguarded it would probe
        # element_at(spans, 2) on a 1-span doc
        return (
            F.when(
                n >= 2,
                F.size(
                    F.filter(
                        F.sequence(F.lit(1), n - 1),
                        lambda i: (F.element_at(spans, i)["kind"] == a)
                        & (F.element_at(spans, i + 1)["kind"] == b),
                    )
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
        )

    # longest text run = max gap between consecutive media positions
    # (with virtual media sentinels at 0 and n+1): pure integer zip_with
    # over the media-position array, no fold state
    mpos = F.concat(
        F.array(F.lit(0)),
        F.when(
            n >= 1,
            F.filter(
                F.sequence(F.lit(1), n),
                lambda i: F.element_at(spans, i)["kind"] == "media",
            ),
        ).otherwise(F.array().cast("array<int>")),
        F.array(n + 1),
    )
    gaps = F.zip_with(
        F.slice(mpos, 1, F.size(mpos) - 1),
        F.slice(mpos, 2, F.size(mpos) - 1),
        lambda a, b: b - a - 1,
    )
    longest = F.array_max(gaps).cast("long")
    return spanned.select(
        "doc_id",
        n.cast("long").alias("n_spans"),
        trans_count("text", "text").alias("tt"),
        trans_count("text", "media").alias("tm"),
        trans_count("media", "text").alias("mt"),
        trans_count("media", "media").alias("mm"),
        longest.alias("longest_text_run"),
    )


MEDIA_TOKEN_COST = 4  # token-budget cost of one media span (vision-token analog)
TRUNCATE_BUDGET = 24  # default per-document token budget for truncation


def truncate_spans(
    spanned: DataFrame, budget: int = TRUNCATE_BUDGET, media_cost: int = MEDIA_TOKEN_COST
) -> DataFrame:
    """Per-document token-budget truncation that PRESERVES span boundaries:
    keep the longest span prefix whose cumulative token cost fits the
    budget (text span = its whitespace token count, media span = a fixed
    vision-token cost). This is the context-window fitting step of an
    interleaved multimodal training pipeline — a document is never cut
    mid-span, so the (kind, text, media_ref, order) invariant survives.

    Output: the KEPT prefix flattened to rows (doc_id, pos, kind, text,
    media_ref, offset) — directly comparable against the oracle and
    against ``flatten_spans`` of the untruncated input.

    Scale shape: a single O(n) fold per row (``F.aggregate`` with a
    (total, kept, kept_tokens) accumulator — costs are strictly positive
    so the running total is monotone and the prefix decision is local),
    then one explode proportional to the kept output. No shuffle at all;
    the naive formulation (explode -> per-doc window cumsum -> filter)
    pays a full shuffle on doc_id that this avoids.
    """
    spans = F.col("spans")

    def cost(s):
        return (
            F.when(s["kind"] == "media", F.lit(media_cost))
            .otherwise(F.size(F.split(F.trim(s["text"]), r"\s+")))
            .cast("long")
        )

    acc0 = F.struct(
        F.lit(0).cast("long").alias("tot"),
        F.lit(0).cast("int").alias("k"),
        F.lit(0).cast("long").alias("kept_tokens"),
    )

    def step(acc, s):
        new_tot = acc["tot"] + cost(s)
        fits = new_tot <= budget
        return F.struct(
            new_tot.alias("tot"),
            F.when(fits, acc["k"] + 1).otherwise(acc["k"]).alias("k"),
            F.when(fits, new_tot).otherwise(acc["kept_tokens"]).alias("kept_tokens"),
        )

    agg = F.aggregate(spans, acc0, step)
    kept = spanned.select(
        "doc_id", F.slice(spans, 1, agg["k"]).alias("spans")
    )
    return flatten_spans(kept)


def truncate_spans_sql(
    table: str = "documents", budget: int = TRUNCATE_BUDGET, media_cost: int = MEDIA_TOKEN_COST
) -> str:
    return f"""
        WITH {derive_spans_sql_cte(table)},
        flat AS (
          SELECT doc_id, u.pos - 1 AS pos, u.s AS s,
                 CASE WHEN u.s['kind'] = 'media' THEN {media_cost}
                      ELSE len(regexp_split_to_array(trim(u.s['text']), '\\s+')) END AS cost
          FROM sp, (SELECT unnest(spans) AS s, generate_subscripts(spans, 1) AS pos) u
        )
        SELECT doc_id, pos, s['kind'] AS kind, s['text'] AS text,
               s['media_ref'] AS media_ref, s['offset'] AS "offset"
        FROM (
          SELECT *, sum(cost) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS UNBOUNDED PRECEDING) AS cum
          FROM flat
        )
        WHERE cum <= {budget}
        ORDER BY doc_id, pos
    """


def derived_media(docs: DataFrame) -> DataFrame:
    """Flat media-span table (doc_id, media_ref, offset, content_hash)
    from the derived interleaved shape. The content hash is a
    deterministic stand-in for hashing the fetched blob bytes (the real
    path is ``multimodal.media_meta`` over binary columns): blobs at the
    same token position hash identically, so the SAME logical image is
    referenced from many documents under different refs — exactly the
    situation media dedup exists for (CDN mirrors, resized copies with
    shared origin, repeated site chrome)."""
    flat = derive_flat_spans(docs).filter(F.col("kind") == "media")
    return flat.select(
        "doc_id",
        "media_ref",
        "offset",
        F.md5((F.col("offset") + 1).cast("string")).alias("content_hash"),
    )


def dedup_media(media: DataFrame) -> DataFrame:
    """Media-blob dedup across the corpus: group media references by
    content hash; the canonical ref is the lexicographic minimum (stable,
    engine-independent). Output per blob: (content_hash, canonical_ref,
    ref_count, n_docs, n_refs) — the blob store's reference-count
    manifest.

    Scale shape: ONE hash aggregation on content_hash with map-side
    partial aggregation; count(distinct) columns rewrite to the standard
    two-level expand+agg, still a single shuffle family. At 100 TB the
    blob table is re-partitioned by content_hash anyway for the store
    layout, so this agg co-locates with the write."""
    return (
        media.groupBy("content_hash")
        .agg(
            F.min("media_ref").alias("canonical_ref"),
            F.count(F.lit(1)).cast("long").alias("ref_count"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.countDistinct("media_ref").cast("long").alias("n_refs"),
        )
        .orderBy("content_hash")
    )


def dedup_media_sql(table: str = "documents") -> str:
    return f"""
        WITH {derive_spans_sql_cte(table)},
        media AS (
          SELECT doc_id, u.s['media_ref'] AS media_ref,
                 md5((u.s['offset'] + 1)::VARCHAR) AS content_hash
          FROM sp, (SELECT unnest(spans) AS s) u
          WHERE u.s['kind'] = 'media'
        )
        SELECT content_hash,
               min(media_ref) AS canonical_ref,
               count(*)::BIGINT AS ref_count,
               count(DISTINCT doc_id)::BIGINT AS n_docs,
               count(DISTINCT media_ref)::BIGINT AS n_refs
        FROM media
        GROUP BY content_hash
        ORDER BY content_hash
    """


def rewrite_media_refs(spanned: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite every media span's ref to its canonical blob ref, keeping
    the span sequence byte-identical otherwise (kind, text, order all
    preserved — verified by the round-trip test).

    ``mapping`` is (media_ref, canonical_ref), e.g. exploded from
    ``dedup_media``. Scale shape: explode -> equi-join on media_ref
    (broadcast when the mapping is small; at blob-store scale both sides
    hash-partition on media_ref) -> re-assemble with an order-restoring
    sort_array on the captured position. One join + one aggregation; the
    text spans ride through with null join keys (left join keeps them)."""
    flat = spanned.select("doc_id", F.posexplode("spans").alias("pos", "s"))
    joined = flat.join(
        mapping.select(
            F.col("media_ref").alias("_mr"), F.col("canonical_ref").alias("_canon")
        ),
        flat["s"]["media_ref"] == F.col("_mr"),
        "left",
    )
    new_span = F.struct(
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.when(
            (F.col("s.kind") == "media") & F.col("_canon").isNotNull(), F.col("_canon")
        ).otherwise(F.col("s.media_ref")).alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )
    return (
        joined.select("doc_id", F.struct(F.col("pos"), new_span.alias("s")).alias("ps"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("ps")).alias("pss"))
        .select("doc_id", F.transform(F.col("pss"), lambda x: x["s"]).alias("spans"))
    )


def interleave_profile_sql(table: str = "documents") -> str:
    def trans(a: str, b: str) -> str:
        return (
            f"len(list_filter(generate_series(1, len(spans) - 1), "
            f"i -> spans[i]['kind'] = '{a}' AND spans[i + 1]['kind'] = '{b}'))::BIGINT"
        )

    return f"""
        WITH {derive_spans_sql_cte(table)}
        SELECT doc_id,
               len(spans)::BIGINT AS n_spans,
               {trans('text', 'text')} AS tt,
               {trans('text', 'media')} AS tm,
               {trans('media', 'text')} AS mt,
               {trans('media', 'media')} AS mm,
               (SELECT max(b - a - 1) FROM (
                  SELECT unnest(list_slice(mpos, 1, len(mpos) - 1)) AS a,
                         unnest(list_slice(mpos, 2, len(mpos))) AS b
               ))::BIGINT AS longest_text_run
        FROM (
          SELECT doc_id, spans,
                 list_concat(list_concat([0],
                   list_filter(generate_series(1, len(spans)),
                               i -> spans[i]['kind'] = 'media')),
                   [len(spans) + 1]) AS mpos
          FROM sp
        )
        ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# Modality-mix accounting (per-source text/media balance for data planning)
# ---------------------------------------------------------------------------


def modality_mix(spanned: DataFrame, target_ppm: int = 150_000) -> DataFrame:
    """Per-source modality balance over interleaved span sequences: how
    much of each source is media vs text, and how far it sits from the
    corpus's target media share — the planning table a multimodal data
    mixer reads before deciding which sources to up/down-sample so the
    blended corpus hits its image-token budget.

    Input: (doc_id, source, spans) rows (``derive_spans(...,
    keep=("source",))`` or a real extraction table). Output per source:
    (source, n_docs, text_spans, media_spans, media_share_ppm,
    dev_from_target_ppm) — all integer-exact (ppm via integer DIV;
    nullif guards an all-empty source identically in both engines).

    Scale shape: per-row higher-order ``filter``/``size`` over the spans
    array (no explode), then ONE map-side-combinable hash-agg onto
    |sources| rows — the cheapest possible pass over 100 TB of spans.
    """
    m = F.size(F.filter("spans", lambda s: s["kind"] == F.lit("media")))
    per = spanned.select(
        "source",
        (F.size("spans") - m).cast("long").alias("t"),
        m.cast("long").alias("m"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("t").cast("long").alias("text_spans"),
            F.sum("m").cast("long").alias("media_spans"),
        )
        .withColumn(
            "media_share_ppm",
            F.expr("media_spans * 1000000 DIV nullif(text_spans + media_spans, 0)"),
        )
        .withColumn(
            "dev_from_target_ppm",
            F.col("media_share_ppm") - F.lit(int(target_ppm)),
        )
    )


def modality_mix_sql(table: str = "documents", target_ppm: int = 150_000) -> str:
    return f"""
        WITH {derive_spans_sql_cte(table, keep=("source",))},
        per AS (
          SELECT source,
                 (len(spans) - len(list_filter(spans, s -> s['kind'] = 'media')))::BIGINT AS t,
                 len(list_filter(spans, s -> s['kind'] = 'media'))::BIGINT AS m
          FROM sp
        ),
        agg AS (
          SELECT source, count(*)::BIGINT AS n_docs,
                 sum(t)::BIGINT AS text_spans, sum(m)::BIGINT AS media_spans
          FROM per GROUP BY source
        )
        SELECT source, n_docs, text_spans, media_spans,
               media_spans * 1000000 // nullif(text_spans + media_spans, 0) AS media_share_ppm,
               media_spans * 1000000 // nullif(text_spans + media_spans, 0)
                 - {int(target_ppm)} AS dev_from_target_ppm
        FROM agg
        ORDER BY source
    """


def corrupt_spans(spanned: DataFrame) -> DataFrame:
    """Deterministically damage a slice of a spans table so the
    integrity audit has something to find (test/gate synth, mirrored
    bit-for-bit by ``corrupt_spans_sql_cte``). Per doc_id:

    - ``% 11 == 0``: zero out every offset (breaks strict ordering for
      any doc with >= 2 spans);
    - ``% 13 == 0``: null the text of every text span;
    - ``% 17 == 0``: relabel every 2nd span's kind to 'ad' (unknown);
    - ``% 19 == 0``: give text spans a media_ref (field conflict).

    Damage composes when several predicates hit the same doc.
    """
    did = F.col("doc_id")
    spans = F.col("spans")

    def span(kind, text, ref, off):
        return F.struct(
            kind.alias("kind"), text.alias("text"),
            ref.alias("media_ref"), off.cast("int").alias("offset"),
        )

    damaged = F.transform(
        spans,
        lambda s, i: span(
            F.when((did % 17 == 0) & (i % 2 == 1), F.lit("ad")).otherwise(s["kind"]),
            F.when((did % 13 == 0) & (s["kind"] == "text"), F.lit(None).cast("string")).otherwise(s["text"]),
            F.when((did % 19 == 0) & (s["kind"] == "text"), F.lit("https://ads.example.com/x.gif")).otherwise(s["media_ref"]),
            F.when(did % 11 == 0, F.lit(0)).otherwise(s["offset"]),
        ),
    )
    return spanned.withColumn("spans", damaged)


def corrupt_spans_sql_cte(src: str = "sp") -> str:
    """DuckDB CTE ``corrupted`` applying the identical damage to ``src``
    (1-based list position p maps to the Spark lambda's 0-based i)."""
    return f"""
        corrupted AS (
          SELECT doc_id,
                 list_transform(generate_series(1, len(spans)), p ->
                   {{'kind': CASE WHEN doc_id % 17 = 0 AND (p - 1) % 2 = 1
                                  THEN 'ad' ELSE spans[p]['kind'] END,
                     'text': CASE WHEN doc_id % 13 = 0 AND spans[p]['kind'] = 'text'
                                  THEN NULL ELSE spans[p]['text'] END,
                     'media_ref': CASE WHEN doc_id % 19 = 0 AND spans[p]['kind'] = 'text'
                                       THEN 'https://ads.example.com/x.gif'
                                       ELSE spans[p]['media_ref'] END,
                     'offset': CASE WHEN doc_id % 11 = 0 THEN 0
                                    ELSE spans[p]['offset'] END}}) AS spans
          FROM {src}
        )
    """


def span_integrity(spanned: DataFrame) -> DataFrame:
    """Per-doc integrity audit of the interleaved span contract — the
    validation pass a 100 TB ingest runs before trusting upstream
    extraction output (the input_hint table is produced by many
    independent crawl waves; a single bad extractor build silently
    corrupts ordering or kind tags).

    Checks, all as native higher-order array functions (no explode, no
    shuffle — one narrow projection per doc):

    - ``n_disorder``   spans whose offset is not strictly greater than
                       the previous span's (order violations);
    - ``n_bad_kind``   kind outside {'text','media'};
    - ``n_text_null``  text spans with NULL text;
    - ``n_media_null`` media spans with NULL media_ref;
    - ``n_conflict``   text spans carrying a media_ref, or media spans
                       carrying text;
    - ``is_valid``     all of the above zero.

    Returns (doc_id, n_spans, n_disorder, n_bad_kind, n_text_null,
    n_media_null, n_conflict, is_valid).
    """
    spans = F.col("spans")

    def count_where(pred):
        return F.size(F.filter(spans, pred)).cast("long")

    disorder = F.size(
        F.filter(
            spans,
            lambda s, i: (i > 0) & (s["offset"] <= F.element_at(spans, i)["offset"]),
        )
    ).cast("long")
    out = spanned.select(
        "doc_id",
        F.size(spans).cast("long").alias("n_spans"),
        disorder.alias("n_disorder"),
        count_where(lambda s: ~s["kind"].isin("text", "media")).alias("n_bad_kind"),
        count_where(lambda s: (s["kind"] == "text") & s["text"].isNull()).alias("n_text_null"),
        count_where(lambda s: (s["kind"] == "media") & s["media_ref"].isNull()).alias("n_media_null"),
        count_where(
            lambda s: ((s["kind"] == "text") & s["media_ref"].isNotNull())
            | ((s["kind"] == "media") & s["text"].isNotNull())
        ).alias("n_conflict"),
    )
    bad = (
        F.col("n_disorder") + F.col("n_bad_kind") + F.col("n_text_null")
        + F.col("n_media_null") + F.col("n_conflict")
    )
    return out.withColumn("is_valid", bad == 0)


def span_integrity_sql(table: str = "documents") -> str:
    """Oracle twin: derive -> corrupt -> audit. The Spark gate query
    applies ``corrupt_spans`` to the same derived table."""
    return f"""
        WITH {derive_spans_sql_cte(table)},
        {corrupt_spans_sql_cte('sp')},
        audited AS (
          SELECT doc_id,
                 len(spans)::BIGINT AS n_spans,
                 len(list_filter(generate_series(2, len(spans)), p ->
                     spans[p]['offset'] <= spans[p - 1]['offset']))::BIGINT AS n_disorder,
                 len(list_filter(spans, s -> s['kind'] NOT IN ('text', 'media')))::BIGINT AS n_bad_kind,
                 len(list_filter(spans, s -> s['kind'] = 'text' AND s['text'] IS NULL))::BIGINT AS n_text_null,
                 len(list_filter(spans, s -> s['kind'] = 'media' AND s['media_ref'] IS NULL))::BIGINT AS n_media_null,
                 len(list_filter(spans, s -> (s['kind'] = 'text' AND s['media_ref'] IS NOT NULL)
                                          OR (s['kind'] = 'media' AND s['text'] IS NOT NULL)))::BIGINT AS n_conflict
          FROM corrupted
        )
        SELECT *, (n_disorder + n_bad_kind + n_text_null + n_media_null + n_conflict) = 0 AS is_valid
        FROM audited
        ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# span-sequence equality — the per-row invariant, as an operator
# ---------------------------------------------------------------------------


def span_sequence_equality(
    ours: DataFrame,
    theirs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document span-sequence equality on (kind, text, media_ref,
    order) — the BASELINE per-row invariant vs the reference crawler's
    output, as a first-class audit operator.

    Both inputs are ``(doc_id, spans)`` tables in the canonical
    interleaved shape. Each side's sequence is canonicalized by sorting
    on ``offset`` (the order field) and projecting (kind, text,
    media_ref); the comparison is then positional and null-safe, so a
    text edit, a media_ref swap, a dropped/extra span, or a document
    missing from either side all surface.

    Output, one row per doc_id present on either side::

        (doc_id, n_ours, n_theirs, equal, first_mismatch)

    ``first_mismatch`` is the 1-based position of the first differing
    span (length differences mismatch at min(n)+1), 0 when the
    sequences are identical.

    Scale shape: one full outer join on doc_id (both sides hash-
    partition on the id — the layout extraction output already has) and
    pure higher-order array expressions; no explode, no UDF. Mirrored
    by :func:`span_sequence_equality_sql`.
    """

    def canon(spans):
        keyed = F.transform(
            spans,
            lambda s: F.struct(
                s["offset"].alias("offset"), s["kind"].alias("kind"),
                s["text"].alias("text"), s["media_ref"].alias("media_ref"),
            ),
        )
        return F.transform(
            F.array_sort(keyed),
            lambda s: F.struct(
                s["kind"].alias("kind"), s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )

    a = ours.select(F.col(id_col).alias("doc_id"), canon("spans").alias("a"))
    b = theirs.select(F.col(id_col).alias("doc_id"), canon("spans").alias("b"))
    j = a.join(b, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("a", F.array().cast(a.schema["a"].dataType)).alias("a"),
        F.coalesce("b", F.array().cast(b.schema["b"].dataType)).alias("b"),
    )
    same = lambda x, y: (  # noqa: E731 — positional null-safe struct compare
        x["kind"].eqNullSafe(y["kind"])
        & x["text"].eqNullSafe(y["text"])
        & x["media_ref"].eqNullSafe(y["media_ref"])
    )
    # zip_with pads the shorter side with null structs, whose fields read
    # null -> eqNullSafe false vs any real span -> mismatch at min(n)+1
    flags = F.zip_with("a", "b", lambda x, y: ~same(x, y))
    return j.select(
        "doc_id",
        F.size("a").cast("long").alias("n_ours"),
        F.size("b").cast("long").alias("n_theirs"),
        F.coalesce(F.array_position(flags, F.lit(True)), F.lit(0)).cast("long").alias(
            "first_mismatch"
        ),
    ).withColumn("equal", F.col("first_mismatch") == 0)


def span_sequence_equality_sql(ours_cte: str, theirs_cte: str) -> str:
    """DuckDB twin over CTEs named ``ours`` and ``theirs`` with
    ``(doc_id, spans)``. 1-based list indexing returns NULL out of
    range, and ``IS NOT DISTINCT FROM`` on structs gives the same
    null-safe positional compare; ``range(1, n+1)`` is DuckDB's
    list-returning scalar range."""
    canon = (
        "list_transform(list_sort(list_transform(spans,"
        " s -> {'offset': s.offset, 'kind': s.kind, 'text': s.text,"
        " 'media_ref': s.media_ref})),"
        " s -> {'kind': s.kind, 'text': s.text, 'media_ref': s.media_ref})"
    )
    return f"""
        WITH {ours_cte},
        {theirs_cte},
        a AS (SELECT doc_id, {canon} AS a FROM ours),
        b AS (SELECT doc_id, {canon} AS b FROM theirs),
        j AS (
          SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                 coalesce(a.a, []) AS a, coalesce(b.b, []) AS b
          FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
        ),
        cmp AS (
          SELECT doc_id, len(a)::BIGINT AS n_ours, len(b)::BIGINT AS n_theirs,
                 coalesce(
                   list_filter(range(1, greatest(len(a), len(b)) + 1),
                               i -> NOT (a[i] IS NOT DISTINCT FROM b[i]))[1],
                   0)::BIGINT AS first_mismatch
          FROM j
        )
        SELECT doc_id, n_ours, n_theirs, first_mismatch,
               first_mismatch = 0 AS equal
        FROM cmp
        ORDER BY doc_id
    """
