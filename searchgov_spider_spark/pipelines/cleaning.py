"""Corpus cleaning for LLM training-data prep: Gopher-style quality rules,
repetition statistics, and cross-corpus boilerplate (segment) dedup.

These are corpus-preparation additions beyond the reference crawler (the
reference's closest analog is the sanitize/summarize stage feeding i14y,
elasticsearch/i14y_helper.py:78-133); the rule set follows the published
Gopher (Rae et al. 2021, §A1.1) and C4 (Raffel et al. 2020, §2.2) cleaning
heuristics restated as relational plans.

Scale notes (100 TB):
- `gopher_stats` is a pure projection — no shuffle, whole-stage codegen.
- `repetition_stats` explodes n-grams/segments and hash-aggregates keyed by
  (doc_id, gram): map-side combine applies, doc_id is high-cardinality so
  the shuffle is well distributed. Deliberately NOT computed with per-row
  array folds (an O(L^2) lambda per document dies on 10k-token web pages).
- `segment_dedup` is the C4 "remove boilerplate repeated across documents"
  pass: explode fixed-width token segments, count distinct docs per
  segment (two-phase exact distinct), drop segments above the threshold,
  reassemble order-preserving. The reassembly groups on doc_id with a
  bounded per-doc segment list (ceil(len/width) rows).

Every operator has a DuckDB-SQL twin so the driver's oracle gate verifies
exact values; all ratios are integer counts followed by one round(x, 6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash32_sql, seeded_hash32_col
from .textstats import STOPWORDS, tokens_col, tokens_sql

# Gopher-ish acceptance thresholds, tuned so the synthetic corpus (10-99
# tokens/doc) exercises both branches of the keep flag.
MIN_TOKENS = 30
MAX_TOKENS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MIN_ALPHA_FRAC = 0.8
MIN_STOP_HITS = 2

SEGMENT_WIDTH = 10  # tokens per non-overlapping dedup segment


def _toks(text_col: str) -> Column:
    return tokens_col(F.col(text_col))


def _gopher_feature_cols(text_col: str):
    """(n_tokens, mean_word_len, alpha_frac, stop_hits, keep) columns —
    shared by gopher_stats and the composed corpus_prep filter."""
    toks = _toks(text_col)
    n_tokens = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, F.length), F.lit(0).cast("long"), lambda a, x: a + x
    )
    mean_word_len = F.round(sum_len / n_tokens, 6)
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_frac = F.round(n_alpha / n_tokens, 6)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    keep = (
        (n_tokens >= MIN_TOKENS)
        & (n_tokens <= MAX_TOKENS)
        & (mean_word_len >= MIN_MEAN_WORD_LEN)
        & (mean_word_len <= MAX_MEAN_WORD_LEN)
        & (alpha_frac >= MIN_ALPHA_FRAC)
        & (stop_hits >= MIN_STOP_HITS)
    )
    return n_tokens, mean_word_len, alpha_frac, stop_hits, keep


def gopher_keep_col(text_col: str = "text") -> Column:
    """The Gopher acceptance flag alone (for inline corpus filtering)."""
    return _gopher_feature_cols(text_col)[4]


def gopher_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher rule features + keep flag (pure projection).

    Features: token count, mean word length, fraction of tokens containing
    an alphabetic character, stopword occurrence count. keep = all rule
    thresholds hold (Rae et al. 2021 §A1.1 shape, thresholds local).
    """
    n_tokens, mean_word_len, alpha_frac, stop_hits, keep = _gopher_feature_cols(text_col)
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
        keep.alias("keep"),
    )


def gopher_keep_sql(text_expr: str = "text") -> str:
    """Boolean SQL fragment mirroring gopher_keep_col (DuckDB)."""
    toks = tokens_sql(text_expr)
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    nt = f"len({toks})"
    mwl = f"round(list_sum(list_transform({toks}, x -> length(x))) / len({toks}), 6)"
    af = f"round(len(list_filter({toks}, x -> regexp_matches(x, '[A-Za-z]'))) / len({toks}), 6)"
    sh = f"len(list_filter({toks}, x -> list_contains([{stop_list}], lower(x))))"
    return (
        f"({nt} >= {MIN_TOKENS} AND {nt} <= {MAX_TOKENS}"
        f" AND {mwl} >= {MIN_MEAN_WORD_LEN} AND {mwl} <= {MAX_MEAN_WORD_LEN}"
        f" AND {af} >= {MIN_ALPHA_FRAC} AND {sh} >= {MIN_STOP_HITS})"
    )


def gopher_stats_sql(table: str = "documents") -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
        WITH t AS (
          SELECT doc_id, {tokens_sql('text')} AS toks FROM {table}
        ), r AS (
          SELECT doc_id,
                 len(toks) AS n_tokens,
                 round(list_sum(list_transform(toks, x -> length(x))) / len(toks), 6) AS mean_word_len,
                 round(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) / len(toks), 6) AS alpha_frac,
                 len(list_filter(toks, x -> list_contains([{stop_list}], lower(x)))) AS stop_hits
          FROM t
        )
        SELECT doc_id, n_tokens, mean_word_len, alpha_frac, stop_hits,
               (n_tokens >= {MIN_TOKENS} AND n_tokens <= {MAX_TOKENS}
                AND mean_word_len >= {MIN_MEAN_WORD_LEN} AND mean_word_len <= {MAX_MEAN_WORD_LEN}
                AND alpha_frac >= {MIN_ALPHA_FRAC} AND stop_hits >= {MIN_STOP_HITS}) AS keep
        FROM r
        ORDER BY doc_id
    """


def _segments(docs: DataFrame, text_col: str, width: int) -> DataFrame:
    """(doc_id, seg_idx, seg): non-overlapping width-token windows, the
    remainder tail kept as a final shorter segment (so reassembly is exact)."""
    toks = _toks(text_col)
    n_segs = F.ceil(F.size(toks) / F.lit(float(width))).cast("int")
    seg_structs = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.struct(
            i.alias("seg_idx"),
            F.array_join(F.slice(toks, i * width + 1, width), " ").alias("seg"),
        ),
    )
    return docs.select("doc_id", F.explode(seg_structs).alias("s")).select(
        "doc_id", F.col("s.seg_idx").alias("seg_idx"), F.col("s.seg").alias("seg")
    )


def _segments_sql(table: str, width: int) -> str:
    return f"""
        SELECT doc_id, CAST(i AS INT) AS seg_idx,
               array_to_string(toks[(i*{width}+1):(i*{width}+{width})], ' ') AS seg
        FROM (SELECT doc_id, {tokens_sql('text')} AS toks FROM {table}),
             unnest(range(CAST(ceil(len(toks)/{float(width)}) AS BIGINT))) AS u(i)
    """


def repetition_stats(
    docs: DataFrame, text_col: str = "text", width: int = SEGMENT_WIDTH
) -> DataFrame:
    """Per-document repetition features (Gopher §A1.1 repetition rules):

    - top_bigram_ppm: occurrences of the doc's most frequent token bigram
      over total bigrams, in integer parts-per-million (shape-analog of
      "fraction of chars in the most common 2-gram").
    - dup_seg_ppm: fraction (ppm) of non-overlapping width-token segments
      that are repeats of an earlier segment within the same document.

    Fractions are BIGINT ppm via integer division — `x * 1000000 DIV n` —
    never rounded doubles, so the value hash is bit-identical across
    engines and builds (round(float, 6) at a 6th-decimal tie is not).

    Shape: explode -> hash-agg keyed by (doc_id, gram) with map-side
    combine -> per-doc agg -> joins back on doc_id. No O(L^2) per-row
    folds, no window over the exploded stream.
    """
    base = docs.select("doc_id", _toks(text_col).alias("toks"))
    n = F.size(F.col("toks"))
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, n - 1),
                F.slice(F.col("toks"), 2, n - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram"),
    )
    big_counts = bigrams.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
    big_stats = big_counts.groupBy("doc_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("n_bigrams")
    )
    segs = _segments(docs, text_col, width)
    seg_stats = segs.groupBy("doc_id").agg(
        F.count("*").alias("n_segs"), F.countDistinct("seg").alias("n_distinct_segs")
    )
    out = (
        docs.select("doc_id")
        .join(big_stats, "doc_id", "left")
        .join(seg_stats, "doc_id", "left")
    )
    return out.select(
        "doc_id",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce(
            F.expr("top_c * 1000000 DIV n_bigrams"), F.lit(0)
        ).cast("long").alias("top_bigram_ppm"),
        F.col("n_segs").cast("long").alias("n_segs"),
        F.expr("(n_segs - n_distinct_segs) * 1000000 DIV n_segs")
        .cast("long")
        .alias("dup_seg_ppm"),
    )


def repetition_stats_sql(table: str = "documents", width: int = SEGMENT_WIDTH) -> str:
    return f"""
        WITH base AS (
          SELECT doc_id, {tokens_sql('text')} AS toks FROM {table}
        ), big AS (
          SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bigram
          FROM base, unnest(range(1, len(toks))) AS u(i)
        ), bc AS (
          SELECT doc_id, bigram, count(*) AS c FROM big GROUP BY doc_id, bigram
        ), bs AS (
          SELECT doc_id, max(c) AS top_c, sum(c) AS n_bigrams FROM bc GROUP BY doc_id
        ), seg AS ({_segments_sql(table, width)}),
        ss AS (
          SELECT doc_id, count(*) AS n_segs, count(DISTINCT seg) AS n_distinct_segs
          FROM seg GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(bs.n_bigrams, 0)::BIGINT AS n_bigrams,
               coalesce(bs.top_c * 1000000 // bs.n_bigrams, 0)::BIGINT AS top_bigram_ppm,
               ss.n_segs AS n_segs,
               (ss.n_segs - ss.n_distinct_segs) * 1000000 // ss.n_segs AS dup_seg_ppm
        FROM {table} d
        LEFT JOIN bs ON d.doc_id = bs.doc_id
        LEFT JOIN ss ON d.doc_id = ss.doc_id
        ORDER BY d.doc_id
    """


# PII patterns restricted to the regex subset Java (Spark) and RE2
# (DuckDB) treat identically; replacement is applied in this order, and
# counts are taken on the ORIGINAL text (a PII span nested inside an
# earlier-replaced one is counted but only scrubbed once — documented
# semantics, identical in both engines).
PII_PATTERNS = (
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssns", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phones", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / SSNs / US phone numbers; count each kind.

    Pure projection (one codegen'd regexp pass per pattern, no shuffle,
    no Python) — at 100 TB this runs at scan speed. Returns
    (doc_id, n_emails, n_ssns, n_phones, clean_text).
    """
    t = F.col(text_col)
    clean = t
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{name}"))
        clean = F.regexp_replace(clean, pat, repl)
    return docs.select("doc_id", *counts, clean.alias("clean_text"))


def pii_scrub_sql(table: str = "documents") -> str:
    """DuckDB twin. `table` may be any relation expression (a table name
    or a parenthesized subquery exposing doc_id + text)."""
    counts = ",\n               ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    clean = "text"
    for _, pat, repl in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    return f"""
        SELECT doc_id,
               {counts},
               {clean} AS clean_text
        FROM {table}
        ORDER BY doc_id
    """


def _ngrams(toks: Column, n: int) -> Column:
    """Distinct space-joined n-grams of a token array (empty if < n tokens).

    sequence(1, count) is gated on count >= 1: Spark's sequence steps
    DOWNWARD when stop < start, so an unguarded sequence(1, 0) would
    yield [1, 0] and slice(toks, 0, n) throws.
    """
    count = F.size(toks) - (n - 1)
    return F.when(
        count >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    word n-gram with an eval benchmark set (the standard train-set
    contamination check, e.g. GPT-3 Brown et al. 2020 §C / PaLM app. B,
    restated as a relational plan).

    Returns (doc_id, n_grams, n_hits, contaminated) for every corpus doc.

    Scale shape: benchmark n-grams are DISTINCT and broadcast (eval sets
    are tiny next to a 100 TB corpus), so the probe is a broadcast hash
    join on the exploded corpus grams — no corpus-side shuffle for the
    join; the per-doc hit count hash-aggregates on high-cardinality
    doc_id with map-side combine. Corpus grams are array_distinct'ed
    per doc before explode to bound fan-out at <= token count.
    """
    grams = _ngrams(tokens_col(F.col(text_col)), n)
    bench_grams = (
        benchmark.select(F.explode(_ngrams(tokens_col(F.col(text_col)), n)).alias("gram"))
        .distinct()
    )
    doc_grams = docs.select("doc_id", F.explode(grams).alias("gram"))
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select("doc_id", F.size(grams).cast("long").alias("n_grams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def ngrams_rel_sql(src: str, n: int) -> str:
    """(doc_id, gram) relation of distinct word n-grams per doc (DuckDB);
    `src` is a table name or CTE name exposing doc_id + text."""
    return f"""
          SELECT doc_id, g AS gram FROM (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                     range(1, greatest(len(toks) - {n - 1}, 0) + 1),
                     i -> array_to_string(toks[i:(i+{n - 1})], ' ')))) AS g
            FROM (SELECT doc_id, {tokens_sql('text')} AS toks FROM {src})
          )
        """


def decontaminate_sql(
    table: str = "documents",
    bench_pred: str = "doc_id % 37 = 0",
    n: int = 8,
) -> str:
    """DuckDB twin: benchmark = rows of `table` matching bench_pred,
    corpus = the rest (mirrors the driver query's deterministic split)."""

    def grams(src: str) -> str:
        return ngrams_rel_sql(src, n)

    return f"""
        WITH bench AS (SELECT * FROM {table} WHERE {bench_pred}),
        corpus AS (SELECT * FROM {table} WHERE NOT ({bench_pred})),
        bg AS (SELECT DISTINCT gram FROM ({grams('bench')})),
        cg AS ({grams('corpus')}),
        hits AS (
          SELECT cg.doc_id, count(*) AS n_hits
          FROM cg JOIN bg USING (gram) GROUP BY cg.doc_id
        ),
        sizes AS (
          SELECT doc_id,
                 len(list_distinct(list_transform(
                   range(1, greatest(len(toks) - {n - 1}, 0) + 1),
                   i -> array_to_string(toks[i:(i+{n - 1})], ' ')))) AS n_grams
          FROM (SELECT doc_id, {tokens_sql('text')} AS toks FROM corpus)
        )
        SELECT s.doc_id, s.n_grams,
               coalesce(h.n_hits, 0) AS n_hits,
               coalesce(h.n_hits, 0) > 0 AS contaminated
        FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id
        ORDER BY s.doc_id
    """


TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)


def _ngrams_all(toks: Column, n: int) -> Column:
    """ALL space-joined n-gram occurrences (with repeats; empty if < n
    tokens). Same descending-sequence guard as _ngrams."""
    count = F.size(toks) - (n - 1)
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


NGRAM_SPAN_N = 8


def dedup_ngram_spans(
    docs: DataFrame,
    text_col: str = "text",
    n: int = NGRAM_SPAN_N,
    max_docs: int = 1,
) -> DataFrame:
    """Exact duplicated-n-gram span removal at token granularity (the
    ExactSubstr dedup of Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", with token n-grams standing in for
    the suffix-array substrings): every occurrence of an n-gram that
    appears in more than ``max_docs`` distinct documents is excised —
    all n covered token positions drop — and each document is
    reassembled from its surviving tokens in original order.

    Unlike ``segment_dedup`` (non-overlapping width-token segments,
    whole-segment drop), this covers OVERLAPPING grams, so runs of
    shared text are removed wall-to-wall regardless of alignment.

    Shape: one overlapping-gram explode -> per-gram hash-agg (map-side
    combine) -> dup grams joined back (only dup occurrences explode
    into covered positions, n rows each) -> left join + per-doc
    reassembly. No windows, no per-row Python; work is corpus-linear
    plus n x (duplicated occurrences).

    Returns (doc_id, clean_text, n_tokens, n_removed); a fully-covered
    document survives with clean_text = ''.
    """
    toks = _toks(text_col)
    base = docs.select("doc_id", F.posexplode(toks).alias("pos", "tok"))
    grams = docs.select(
        "doc_id", F.posexplode(_ngrams_all(toks, n)).alias("gpos", "gram")
    )
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") > max_docs)
        .select("gram")
    )
    covered = (
        grams.join(dup_grams, "gram")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("gpos"), F.col("gpos") + (n - 1))).alias("pos"),
        )
        .distinct()
        .withColumn("rm", F.lit(True))
    )
    flagged = base.join(covered, ["doc_id", "pos"], "left")
    kept_struct = F.when(F.col("rm").isNull(), F.struct(F.col("pos"), F.col("tok")))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list(kept_struct)), lambda s: s["tok"]),
                " ",
            ).alias("clean_text"),
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("rm").isNotNull(), 1).otherwise(0)).cast("long").alias("n_removed"),
        )
        .select("doc_id", "clean_text", "n_tokens", "n_removed")
    )


def dedup_ngram_spans_sql(
    table: str = "documents", n: int = NGRAM_SPAN_N, max_docs: int = 1
) -> str:
    return f"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM {table}
        ), base AS (
          SELECT doc_id, i - 1 AS pos, t[i] AS tok
          FROM toks, unnest(generate_series(1, len(t))) AS g(i)
        ), grams AS (
          SELECT doc_id, i - 1 AS gpos, array_to_string(t[i:i+{n - 1}], ' ') AS gram
          FROM toks, unnest(generate_series(1, len(t) - {n - 1})) AS g(i)
        ), dup AS (
          SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) > {max_docs}
        ), cov AS (
          SELECT DISTINCT g.doc_id, g.gpos + u.k AS pos
          FROM grams g JOIN dup USING (gram), unnest(generate_series(0, {n - 1})) AS u(k)
        ), flagged AS (
          SELECT b.doc_id, b.pos, b.tok, (c.pos IS NOT NULL) AS rm
          FROM base b LEFT JOIN cov c ON c.doc_id = b.doc_id AND c.pos = b.pos
        )
        SELECT doc_id,
               coalesce(string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE NOT rm), '') AS clean_text,
               count(*)::BIGINT AS n_tokens,
               (count(*) FILTER (WHERE rm))::BIGINT AS n_removed
        FROM flagged
        GROUP BY doc_id
        ORDER BY doc_id
    """


def repetition_profile(
    docs: DataFrame,
    text_col: str = "text",
    top_ns: tuple[int, ...] = TOP_NS,
    dup_ns: tuple[int, ...] = DUP_NS,
) -> DataFrame:
    """The full Gopher repetition rule family (Rae et al. 2021 §A1.1):
    per document, the fraction of characters covered by the most
    frequent n-gram (n in top_ns) and by all duplicated n-grams
    (n in dup_ns; char mass of every occurrence of grams seen > once —
    the overlap-ignoring published approximation, so it can exceed 1).

    Character base = length of the whitespace-normalized token stream.
    Shape: ONE explode of (n, gram) pairs for all n -> hash-agg on
    (doc_id, n, gram) with map-side combine -> per-(doc_id, n) masses ->
    conditional-agg pivot to columns -> left join back (short docs get
    zeros). No per-row O(L^2) folds, no window over the exploded rows.
    """
    ns = sorted(set(top_ns) | set(dup_ns))
    toks = _toks(text_col)
    n_chars = F.length(F.array_join(toks, " "))
    def _tagged_grams(n: int) -> Column:
        # NB: the lambda must be unary — F.transform treats a 2-arg
        # lambda as (element, index), which would shadow the n tag.
        return F.transform(
            _ngrams_all(toks, n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram")),
        )

    tagged = F.flatten(F.array(*[_tagged_grams(n) for n in ns]))
    base = docs.select("doc_id", n_chars.cast("long").alias("n_chars"))
    exploded = docs.select("doc_id", F.explode(tagged).alias("g")).select(
        "doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram")
    )
    counts = exploded.groupBy("doc_id", "n", "gram").agg(F.count("*").alias("c"))
    glen = F.length(F.col("gram"))
    per_n = counts.groupBy("doc_id", "n").agg(
        F.max(F.col("c") * glen).alias("top_mass"),
        F.sum(F.when(F.col("c") > 1, F.col("c") * glen).otherwise(0)).alias("dup_mass"),
    )
    frac = lambda mass: F.round(mass / F.nullif(F.col("n_chars"), F.lit(0)), 6)  # noqa: E731
    pivoted = (
        per_n.join(base, "doc_id")
        .groupBy("doc_id")
        .agg(
            *[
                F.max(F.when(F.col("n") == n, frac(F.col("top_mass")))).alias(
                    f"top_{n}gram_char_frac"
                )
                for n in top_ns
            ],
            *[
                F.max(F.when(F.col("n") == n, frac(F.col("dup_mass")))).alias(
                    f"dup_{n}gram_char_frac"
                )
                for n in dup_ns
            ],
        )
    )
    out_cols = [f"top_{n}gram_char_frac" for n in top_ns] + [
        f"dup_{n}gram_char_frac" for n in dup_ns
    ]
    joined = base.join(pivoted, "doc_id", "left")
    return joined.select(
        "doc_id",
        "n_chars",
        *[F.coalesce(F.col(c), F.lit(0.0)).alias(c) for c in out_cols],
    )


def repetition_profile_sql(
    table: str = "documents",
    top_ns: tuple[int, ...] = TOP_NS,
    dup_ns: tuple[int, ...] = DUP_NS,
) -> str:
    ns = sorted(set(top_ns) | set(dup_ns))
    gram_blocks = "\n          UNION ALL\n".join(
        f"""          SELECT doc_id, {n} AS n,
                 array_to_string(toks[i:(i+{n - 1})], ' ') AS gram
          FROM base, unnest(range(1, greatest(len(toks) - {n - 1}, 0) + 1)) AS u(i)"""
        for n in ns
    )
    top_cols = ",\n               ".join(
        f"coalesce(max(CASE WHEN n = {n} THEN round(top_mass / nullif(n_chars, 0), 6) END), 0.0)"
        f" AS top_{n}gram_char_frac"
        for n in top_ns
    )
    dup_cols = ",\n               ".join(
        f"coalesce(max(CASE WHEN n = {n} THEN round(dup_mass / nullif(n_chars, 0), 6) END), 0.0)"
        f" AS dup_{n}gram_char_frac"
        for n in dup_ns
    )
    return f"""
        WITH base AS (
          SELECT doc_id, {tokens_sql('text')} AS toks FROM {table}
        ), chars AS (
          SELECT doc_id, length(array_to_string(toks, ' ')) AS n_chars FROM base
        ), g AS (
{gram_blocks}
        ), c AS (
          SELECT doc_id, n, gram, count(*) AS c FROM g GROUP BY doc_id, n, gram
        ), m AS (
          SELECT doc_id, n,
                 max(c * length(gram)) AS top_mass,
                 sum(CASE WHEN c > 1 THEN c * length(gram) ELSE 0 END) AS dup_mass
          FROM c GROUP BY doc_id, n
        )
        SELECT ch.doc_id, ch.n_chars,
               {top_cols},
               {dup_cols}
        FROM chars ch LEFT JOIN m ON ch.doc_id = m.doc_id
        GROUP BY ch.doc_id, ch.n_chars
        ORDER BY ch.doc_id
    """


def segment_dedup(
    docs: DataFrame,
    text_col: str = "text",
    width: int = SEGMENT_WIDTH,
    max_docs: int = 1,
) -> DataFrame:
    """C4-style cross-corpus boilerplate removal: drop every width-token
    segment whose normalized form occurs in more than `max_docs` distinct
    documents, then reassemble each document's surviving segments in
    original order.

    Returns (doc_id, clean_text, n_segs, n_removed). Documents whose
    segments are all removed survive with clean_text = ''.
    """
    segs = _segments(docs, text_col, width)
    seg_docs = segs.groupBy("seg").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    flagged = segs.join(seg_docs, "seg").withColumn(
        "keep", F.col("n_docs") <= max_docs
    )
    kept_struct = F.when(
        F.col("keep"), F.struct(F.col("seg_idx"), F.col("seg"))
    )  # collect_list drops nulls -> removed segments vanish
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(kept_struct)), lambda s: s["seg"]
                ),
                " ",
            ).alias("clean_text"),
            F.count("*").cast("long").alias("n_segs"),
            F.sum(F.when(~F.col("keep"), 1).otherwise(0)).cast("long").alias("n_removed"),
        )
        .select("doc_id", "clean_text", "n_segs", "n_removed")
    )


def segment_dedup_sql(
    table: str = "documents", width: int = SEGMENT_WIDTH, max_docs: int = 1
) -> str:
    return f"""
        WITH seg AS ({_segments_sql(table, width)}),
        sd AS (
          SELECT seg, count(DISTINCT doc_id) AS n_docs FROM seg GROUP BY seg
        ), flagged AS (
          SELECT s.doc_id, s.seg_idx, s.seg, (sd.n_docs <= {max_docs}) AS keep
          FROM seg s JOIN sd USING (seg)
        )
        SELECT doc_id,
               coalesce(string_agg(seg, ' ' ORDER BY seg_idx) FILTER (WHERE keep), '') AS clean_text,
               count(*) AS n_segs,
               count(*) FILTER (WHERE NOT keep) AS n_removed
        FROM flagged
        GROUP BY doc_id
        ORDER BY doc_id
    """


def typo_pairs(docs: DataFrame, min_len: int = 4, text_col: str = "text") -> DataFrame:
    """Fuzzy self-join of the corpus vocabulary at edit distance <= 1 —
    spelling-variant / typo candidate pairs for normalization.

    Blocking is the SymSpell deletion neighborhood: each distinct token
    joins under itself plus every single-character-deletion key; two
    strings within one edit ALWAYS share such a key, so the blocked
    equi-join is COMPLETE for lev <= 1 with key fanout len+1 per token
    (linear — never the quadratic all-pairs join), and ``levenshtein``
    verifies candidates exactly. Tokens shorter than ``min_len`` are
    skipped (dense false-cognate neighborhoods).

    Output: (w1, w2, c1, c2, dist) with w1 < w2, pair-distinct.
    """
    toks = docs.select(
        F.explode(
            F.filter(
                F.transform(F.split(F.trim(F.col(text_col)), r"\s+"), F.lower),
                lambda x: x != "",
            )
        ).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count("*").alias("c")).filter(
        F.length("token") >= min_len
    )
    del_keys = F.array_distinct(
        F.concat(
            F.array(F.col("token")),
            F.transform(
                F.sequence(F.lit(1), F.length("token")),
                lambda i: F.concat(
                    F.col("token").substr(F.lit(1), i - 1),
                    F.col("token").substr(i + 1, F.length("token")),
                ),
            ),
        )
    )
    keys = vocab.select("token", "c", F.explode(del_keys).alias("k"))
    a = keys.select(F.col("k"), F.col("token").alias("w1"), F.col("c").alias("c1"))
    b = keys.select(F.col("k"), F.col("token").alias("w2"), F.col("c").alias("c2"))
    return (
        a.join(b, "k")
        .filter(
            (F.col("w1") < F.col("w2"))
            & (F.levenshtein("w1", "w2") <= 1)
        )
        .select(
            "w1", "w2", "c1", "c2",
            F.levenshtein("w1", "w2").cast("long").alias("dist"),
        )
        .distinct()
    )


def typo_pairs_sql(min_len: int = 4, table: str = "documents") -> str:
    return f"""
        WITH toks AS (
          SELECT lower(w) AS token
          FROM {table}, unnest(regexp_split_to_array(trim(text), '\\s+')) AS u(w)
          WHERE w <> ''
        ), vocab AS (
          SELECT token, count(*) AS c FROM toks
          GROUP BY token HAVING length(token) >= {min_len}
        ), keys AS (
          SELECT token, c, u.k
          FROM vocab, unnest(list_distinct(list_prepend(token,
            list_transform(generate_series(1, length(token)),
              i -> substr(token, 1, i - 1) || substr(token, i + 1, length(token)))
          ))) AS u(k)
        )
        SELECT DISTINCT a.token AS w1, b.token AS w2, a.c AS c1, b.c AS c2,
               levenshtein(a.token, b.token)::BIGINT AS dist
        FROM keys a JOIN keys b ON a.k = b.k
        WHERE a.token < b.token AND levenshtein(a.token, b.token) <= 1
        ORDER BY w1, w2
    """


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (BFF-style)
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 18  # filter bits
BLOOM_K = 3        # hash functions


def bloom_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 8,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Bloom-filter benchmark decontamination (the BFF pattern: build a
    static Bloom filter over eval-set n-grams, probe every corpus gram
    against it), run side-by-side with the exact gram join so the
    filter's false-positive cost is MEASURED, not assumed.

    Per corpus doc: (doc_id, n_grams, bloom_hits, exact_hits, fp_grams,
    contaminated_bloom, contaminated_exact, false_positive).

    Bloom semantics, engine-portably: position j of gram g is
    ``hash32(j || '|' || g) % m`` (the same seeded md5 family MinHash
    uses); g probes positive iff all k of its positions are set. An
    exact hit always blooms positive, so fp_grams = bloom_hits -
    exact_hits >= 0 and false_positive flags docs the filter would
    wrongly discard.

    Scale shape: the SET BIT LIST (<= k * |bench grams| distinct
    positions — for a real eval suite, a few MB) is what broadcasts, not
    the gram strings; at 100 TB the corpus side stays shuffle-free for
    the probe (broadcast joins) and pays one map-side-combined hash-agg
    per (doc, gram) + one per doc. This is why BFF-style filters win at
    scale: the membership structure is O(bits), independent of corpus
    size.
    """
    grams = _ngrams(tokens_col(F.col(text_col)), n)

    def positions(gram_col):
        return F.array(
            *[
                F.pmod(seeded_hash32_col(gram_col, j), F.lit(m)).cast("long")
                for j in range(k)
            ]
        )

    bench_pos = (
        benchmark.select(F.explode(_ngrams(tokens_col(F.col(text_col)), n)).alias("gram"))
        .distinct()
        .select(F.explode(positions(F.col("gram"))).alias("pos"))
        .distinct()
    )
    bench_grams = (
        benchmark.select(F.explode(_ngrams(tokens_col(F.col(text_col)), n)).alias("gram"))
        .distinct()
    )
    doc_grams = docs.select("doc_id", F.explode(grams).alias("gram"))
    bloom_gram_hits = (
        doc_grams.select("doc_id", "gram", F.explode(positions(F.col("gram"))).alias("pos"))
        .join(F.broadcast(bench_pos), "pos")
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("n_pos"))
        .filter(F.col("n_pos") == k)
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("bloom_hits"))
    )
    exact_hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("exact_hits"))
    )
    return (
        docs.select("doc_id", F.size(grams).cast("long").alias("n_grams"))
        .join(bloom_gram_hits, "doc_id", "left")
        .join(exact_hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("bloom_hits", F.lit(0)).cast("long").alias("bloom_hits"),
            F.coalesce("exact_hits", F.lit(0)).cast("long").alias("exact_hits"),
            (F.coalesce("bloom_hits", F.lit(0)) - F.coalesce("exact_hits", F.lit(0)))
            .cast("long")
            .alias("fp_grams"),
            (F.coalesce("bloom_hits", F.lit(0)) > 0).alias("contaminated_bloom"),
            (F.coalesce("exact_hits", F.lit(0)) > 0).alias("contaminated_exact"),
            (
                (F.coalesce("bloom_hits", F.lit(0)) > 0)
                & (F.coalesce("exact_hits", F.lit(0)) == 0)
            ).alias("false_positive"),
        )
    )


def bloom_decontaminate_sql(
    table: str = "documents",
    bench_pred: str = "doc_id % 37 = 0",
    n: int = 8,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> str:
    """DuckDB twin (same deterministic bench/corpus split as
    ``decontaminate_sql``)."""
    seeds = ", ".join(str(j) for j in range(k))

    def pos(gram: str, j: str) -> str:
        h = portable_hash32_sql(f"{j}::VARCHAR || '|' || {gram}")
        return f"{h} % {m}"

    return f"""
        WITH bench AS (SELECT * FROM {table} WHERE {bench_pred}),
        corpus AS (SELECT * FROM {table} WHERE NOT ({bench_pred})),
        bg AS (SELECT DISTINCT gram FROM ({ngrams_rel_sql('bench', n)})),
        bench_pos AS (
          SELECT DISTINCT {pos('gram', 'j')} AS pos
          FROM bg, (SELECT unnest([{seeds}]) AS j)
        ),
        cg AS ({ngrams_rel_sql('corpus', n)}),
        bloom_hits AS (
          SELECT doc_id, count(*)::BIGINT AS bloom_hits FROM (
            SELECT doc_id, gram
            FROM (SELECT doc_id, gram, {pos('gram', 'j')} AS pos
                  FROM cg, (SELECT unnest([{seeds}]) AS j)) cp
            JOIN bench_pos USING (pos)
            GROUP BY doc_id, gram HAVING count(*) = {k}
          ) GROUP BY doc_id
        ),
        exact_hits AS (
          SELECT cg.doc_id, count(*)::BIGINT AS exact_hits
          FROM cg JOIN bg USING (gram) GROUP BY cg.doc_id
        ),
        sizes AS (
          SELECT doc_id, count(*)::BIGINT AS n_grams FROM cg GROUP BY doc_id
        ),
        base AS (
          SELECT c.doc_id,
                 coalesce(s.n_grams, 0)::BIGINT AS n_grams,
                 coalesce(b.bloom_hits, 0)::BIGINT AS bloom_hits,
                 coalesce(e.exact_hits, 0)::BIGINT AS exact_hits
          FROM corpus c
          LEFT JOIN sizes s USING (doc_id)
          LEFT JOIN bloom_hits b USING (doc_id)
          LEFT JOIN exact_hits e USING (doc_id)
        )
        SELECT doc_id, n_grams, bloom_hits, exact_hits,
               (bloom_hits - exact_hits)::BIGINT AS fp_grams,
               bloom_hits > 0 AS contaminated_bloom,
               exact_hits > 0 AS contaminated_exact,
               bloom_hits > 0 AND exact_hits = 0 AS false_positive
        FROM base
        ORDER BY doc_id
    """
