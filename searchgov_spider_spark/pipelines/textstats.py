"""Text analysis over document corpora: tokenization, quality scoring,
language identification, fingerprinting.

All expressions are native Spark SQL functions (no UDFs) and each has a
DuckDB-SQL twin generator so the driver's oracle check verifies the exact
values. The reference's analogs: NLTK word counting in
elasticsearch/i14y_helper.py:78-133 (summarize_text) and the language
cascade in helpers/domain_spider.py:150-167; the scale-oriented quality /
fingerprint operators are corpus-preparation additions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash32_col, portable_hash32_sql

# Word-ish tokens: letters, digit runs, or single punctuation (BPE-ish).
REGEX_TOKEN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Stopword list used for quality scoring and keyword extraction. Kept tiny
# and inline so the oracle SQL embeds the identical list.
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for", "is",
    "are", "was", "be", "with", "as", "at", "by", "it", "this", "that",
)

# Marker-word profiles for the n-gram/stopword language-ID heuristic.
# Deliberately small: language ID at corpus scale is a cheap first-pass
# filter, not a classifier. Order = tie-break preference.
LANG_MARKERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "and", "of", "to", "in", "is", "that", "for", "with", "as")),
    ("es", ("el", "la", "de", "que", "los", "las", "una", "por", "con", "para")),
    ("de", ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "den")),
    ("fr", ("le", "la", "les", "des", "est", "une", "dans", "pour", "qui", "pas")),
)

ROLL_MULT = 1_000_003
ROLL_MOD = 2_147_483_647


def tokens_col(text: Column | str) -> Column:
    """Whitespace tokens of trimmed text (empty text -> [''])."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def tokens_sql(expr: str) -> str:
    return f"regexp_split_to_array(trim({expr}), '\\s+')"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + regex(BPE-ish) token counts per document."""
    text = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(tokens_col(text)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(REGEX_TOKEN), 0)).alias("re_tokens"),
        F.length(text).alias("n_chars"),
    )


def token_counts_sql(table: str = "documents") -> str:
    return f"""
        SELECT doc_id,
               len({tokens_sql('text')}) AS ws_tokens,
               len(regexp_extract_all(text, '{REGEX_TOKEN}')) AS re_tokens,
               length(text) AS n_chars
        FROM {table}
        ORDER BY doc_id
    """


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / digit ratios + a composite score.

    Everything is exact integer counting followed by one rounded division,
    so the DuckDB oracle reproduces identical doubles.
    """
    text = F.col(text_col)
    toks = tokens_col(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    n_punct = F.length(F.regexp_replace(text, r"[^.!?,;:]", ""))
    n_digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    stop_ratio = F.round(n_stop / n_tokens, 6)
    punct_ratio = F.round(n_punct / n_chars, 6)
    digit_ratio = F.round(n_digit / n_chars, 6)
    # Composite: reward stopword presence (naturalness), penalize
    # punctuation/digit soup and degenerate length.
    score = F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio + digit_ratio, F.lit(1.0))) * 0.2,
        6,
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        score.alias("quality_score"),
    )


def quality_features_sql(table: str = "documents") -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
        WITH t AS (
          SELECT doc_id,
                 length(text) AS n_chars,
                 {tokens_sql('text')} AS toks,
                 length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct,
                 length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
          FROM {table}
        ), r AS (
          SELECT doc_id, n_chars, len(toks) AS n_tokens,
                 round(len(list_filter(toks, x -> list_contains([{stop_list}], lower(x)))) / len(toks), 6) AS stop_ratio,
                 round(n_punct / n_chars, 6) AS punct_ratio,
                 round(n_digit / n_chars, 6) AS digit_ratio
          FROM t
        )
        SELECT doc_id, n_chars, n_tokens, stop_ratio, punct_ratio, digit_ratio,
               round(least(n_tokens / 100.0, 1.0) * 0.4
                     + least(stop_ratio * 4.0, 1.0) * 0.4
                     + (1.0 - least(punct_ratio + digit_ratio, 1.0)) * 0.2, 6) AS quality_score
        FROM r
        ORDER BY doc_id
    """


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID with CJK script short-circuit.

    predicted = 'zh' if any CJK chars else argmax over marker-word hit
    counts (ties broken by LANG_MARKERS order), 'und' when nothing hits.
    """
    text = F.col(text_col)
    toks = F.transform(tokens_col(text), F.lower)
    has_cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", "")) > 0
    def _contains(arr):
        # single-arg lambda: a 2-arg lambda would make F.filter pass the
        # element index as the second argument
        return lambda t: F.array_contains(arr, t)

    scores = []
    for lang, markers in LANG_MARKERS:
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append((lang, F.size(F.filter(toks, _contains(arr)))))
    # deterministic argmax fold: a later language wins only on a strictly
    # greater score, so ties resolve to LANG_MARKERS order
    pred = F.lit("und")
    acc = F.lit(0)
    for lang, sc in scores:
        pred = F.when(sc > acc, F.lit(lang)).otherwise(pred)
        acc = F.greatest(acc, sc)
    pred = F.when(has_cjk, F.lit("zh")).otherwise(pred)
    out = [F.col("doc_id"), pred.alias("predicted_lang")]
    out += [sc.alias(f"score_{lang}") for lang, sc in scores]
    return docs.select(*out)


def language_id_sql(table: str = "documents") -> str:
    score_exprs = []
    for lang, markers in LANG_MARKERS:
        lst = ", ".join(f"'{m}'" for m in markers)
        score_exprs.append(
            f"len(list_filter(list_transform(toks, x -> lower(x)), t -> list_contains([{lst}], t))) AS score_{lang}"
        )
    langs = [lang for lang, _ in LANG_MARKERS]
    # cascade argmax matching the Spark fold: later languages only win on
    # strictly greater score
    pred = "'und'"
    acc = "0"
    for lang in langs:
        pred = f"CASE WHEN score_{lang} > {acc} THEN '{lang}' ELSE {pred} END"
        acc = f"greatest({acc}, score_{lang})"
    return f"""
        WITH t AS (
          SELECT doc_id, text, {tokens_sql('text')} AS toks FROM {table}
        ), s AS (
          SELECT doc_id, text, {', '.join(score_exprs)} FROM t
        )
        SELECT doc_id,
               CASE WHEN length(regexp_replace(text, '[^一-鿿]', '', 'g')) > 0
                    THEN 'zh' ELSE {pred} END AS predicted_lang,
               {', '.join(f'score_{lang}' for lang in langs)}
        FROM s
        ORDER BY doc_id
    """


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Two document fingerprints:

    - content_md5: md5 of whitespace-normalized lowercased text (exact-dup key)
    - roll_hash: order-sensitive rolling polynomial hash over the portable
      32-bit token hashes (near-shingle fingerprint; mod 2^31-1)
    """
    text = F.col(text_col)
    norm = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    toks = tokens_col(text)
    hashes = F.transform(toks, lambda t: portable_hash32_col(t))
    roll = F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * ROLL_MULT + h) % ROLL_MOD,
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("content_md5"),
        roll.alias("roll_hash"),
    )


def fingerprints_sql(table: str = "documents") -> str:
    h = portable_hash32_sql("t")
    return f"""
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_md5,
               list_reduce(
                 list_prepend(0::BIGINT, list_transform({tokens_sql('text')}, t -> {h})),
                 (acc, h) -> (acc * {ROLL_MULT} + h) % {ROLL_MOD}
               ) AS roll_hash
        FROM {table}
        ORDER BY doc_id
    """


def top_keywords(docs: DataFrame, k: int = 10, text_col: str = "text") -> DataFrame:
    """A2 word-frequency keywords (i14y_helper.py:78-133 restated as a
    relational plan): explode tokens, drop stopwords, count per (source,
    word), keep top-k per source with (count desc, word asc) ordering.

    Scale shape: hash-agg with map-side partial aggregation, then a
    per-group top-k window over the already-aggregated (small) table —
    the explode never passes through a window.
    """
    from pyspark.sql import Window

    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    words = docs.select(
        "source", F.explode(F.transform(tokens_col(text_col), F.lower)).alias("word")
    ).filter(~F.array_contains(stop_arr, F.col("word")) & (F.col("word") != ""))
    counts = words.groupBy("source", "word").agg(F.count("*").alias("n"))
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("word"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("source", "word", "n", "rank")
    )


def top_keywords_sql(k: int = 10, table: str = "documents") -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
        WITH words AS (
          SELECT source, lower(w) AS word
          FROM {table}, unnest({tokens_sql('text')}) AS u(w)
          WHERE NOT list_contains([{stop_list}], lower(w)) AND w <> ''
        ), counts AS (
          SELECT source, word, count(*) AS n FROM words GROUP BY source, word
        ), ranked AS (
          SELECT source, word, n,
                 row_number() OVER (PARTITION BY source ORDER BY n DESC, word ASC) AS rank
          FROM counts
        )
        SELECT source, word, n, rank FROM ranked WHERE rank <= {k}
        ORDER BY source, rank
    """


def pmi_bigrams(
    docs: DataFrame, k: int = 20, min_count: int = 5, text_col: str = "text"
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information:
    pmi(x,y) = ln( p(xy) / (p(x) p(y)) ) over adjacent lowercased tokens,
    bigrams with count < ``min_count`` dropped (classic corpus-analysis /
    tokenizer-merge-candidate signal).

    Adjacent pairs come from zip_with over two shifted slices of the
    token array (no self-join on token position); counts are two
    hash-aggs with map-side combine; totals ride along as broadcast
    1-row aggregates; the filtered bigram table (small after the count
    floor) broadcasts against the vocabulary. pmi is rounded to 9
    decimals for output AND ordering so ln ulps can't flip ranks
    between engines. The final top-k window runs over the filtered
    aggregate, never the token stream.
    """
    from pyspark.sql import Window

    toks = F.filter(F.transform(tokens_col(text_col), F.lower), lambda x: x != "")
    t = docs.select(toks.alias("t"))
    ln = F.greatest(F.size("t") - F.lit(1), F.lit(0))
    pairs = t.select(
        F.explode(
            F.zip_with(
                F.slice("t", 1, ln),
                F.slice("t", 2, ln),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    uni = t.select(F.explode("t").alias("word")).groupBy("word").agg(
        F.count("*").alias("c")
    )
    t_tot = uni.agg(F.sum("c").cast("double").alias("t_tot"))
    b_tot = pairs.agg(F.count("*").cast("double").alias("b_tot"))
    bg = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )
    scored = (
        F.broadcast(bg)
        .join(uni.select(F.col("word").alias("w1"), F.col("c").alias("cx")), "w1")
        .join(uni.select(F.col("word").alias("w2"), F.col("c").alias("cy")), "w2")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(b_tot))
        .select(
            "w1",
            "w2",
            "n",
            F.round(
                F.log(
                    (F.col("n") / F.col("b_tot"))
                    / ((F.col("cx") / F.col("t_tot")) * (F.col("cy") / F.col("t_tot")))
                ),
                9,
            ).alias("pmi"),
        )
    )
    # distributed top-k (TakeOrderedAndProject) FIRST, so the rank
    # window's single partition holds k rows, never the full bigram table
    w = Window.partitionBy().orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    return (
        scored.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("w1", "w2", "n", "pmi", "rank")
    )


def pmi_bigrams_sql(k: int = 20, min_count: int = 5, table: str = "documents") -> str:
    return f"""
        WITH toks AS (
          SELECT list_filter(
                   list_transform({tokens_sql('text')}, w -> lower(w)),
                   w -> w <> ''
                 ) AS t
          FROM {table}
        ), pairs AS (
          SELECT t[i] AS w1, t[i + 1] AS w2
          FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
        ), uni AS (
          SELECT u.w AS word, count(*) AS c FROM toks, unnest(t) AS u(w) GROUP BY u.w
        ), tt AS (SELECT sum(c)::DOUBLE AS t_tot FROM uni),
        bt AS (SELECT count(*)::DOUBLE AS b_tot FROM pairs),
        bg AS (
          SELECT w1, w2, count(*) AS n FROM pairs
          GROUP BY w1, w2 HAVING count(*) >= {min_count}
        ), scored AS (
          SELECT w1, w2, n,
                 round(ln((n / b_tot) / ((cx.c / t_tot) * (cy.c / t_tot))), 9) AS pmi
          FROM bg
          JOIN uni cx ON cx.word = bg.w1
          JOIN uni cy ON cy.word = bg.w2
          CROSS JOIN tt CROSS JOIN bt
        ), ranked AS (
          SELECT w1, w2, n, pmi,
                 row_number() OVER (ORDER BY pmi DESC, w1 ASC, w2 ASC)::BIGINT AS rank
          FROM scored
        )
        SELECT w1, w2, n, pmi, rank FROM ranked WHERE rank <= {k}
        ORDER BY rank
    """


VOCAB_SIZE = 100


def vocab_coverage(
    docs: DataFrame, vocab_size: int = VOCAB_SIZE, text_col: str = "text"
) -> DataFrame:
    """Tokenizer-vocabulary planning: take the top ``vocab_size`` corpus
    tokens by frequency (ties: token asc), then measure each document's
    OOV token fraction against that vocabulary — the coverage/size curve
    a tokenizer build sweeps.

    Plan: one hash-agg for counts, then a distributed top-k
    (orderBy().limit — TakeOrderedAndProject, each partition keeps a
    vocab_size-sized heap; at a web-scale vocabulary the full token-count
    table never funnels through one partition), the chosen vocab
    broadcast back onto the token stream as a left join, one per-doc agg.
    """
    toks = docs.select(
        "doc_id",
        F.explode(F.transform(tokens_col(text_col), F.lower)).alias("token"),
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count("*").alias("c"))
    vocab = (
        counts.orderBy(F.desc("c"), F.asc("token"))
        .limit(vocab_size)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 9).alias("oov_rate"),
        )
    )


def vocab_coverage_sql(vocab_size: int = VOCAB_SIZE, table: str = "documents") -> str:
    return f"""
        WITH toks AS (
          SELECT doc_id, lower(w) AS token
          FROM {table}, unnest({tokens_sql('text')}) AS u(w)
          WHERE w <> ''
        ), counts AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
        vocab AS (
          SELECT token FROM (
            SELECT token, row_number() OVER (ORDER BY c DESC, token ASC) AS r
            FROM counts
          ) WHERE r <= {vocab_size}
        )
        SELECT doc_id,
               count(*)::BIGINT AS n_tokens,
               sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
               round(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                     / count(*), 9) AS oov_rate
        FROM toks LEFT JOIN vocab v USING (token)
        GROUP BY doc_id ORDER BY doc_id
    """


def length_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Power-of-two document-length histogram per source: bucket =
    floor(log2(n_chars)) (empty docs land in bucket -1) — the corpus
    shape report every training-data run starts with. One hash-agg;
    the log2 bucket is integer-exact on both engines (floor of a double
    log only flips at exact powers of two, where log2 is exact)."""
    n = F.length(F.col(text_col))
    bucket = F.when(n <= 0, F.lit(-1)).otherwise(
        F.floor(F.log2(n.cast("double")))
    ).cast("long")
    return (
        docs.select("source", bucket.alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def length_histogram_sql(table: str = "documents") -> str:
    return f"""
        SELECT source,
               (CASE WHEN length(text) <= 0 THEN -1
                     ELSE floor(log2(length(text)::DOUBLE)) END)::BIGINT AS bucket,
               count(*)::BIGINT AS n_docs
        FROM {table}
        GROUP BY source, bucket
        ORDER BY source, bucket
    """


def source_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Shannon entropy (nats) of each source's token distribution plus
    its normalized form (divided by ln of the vocab size) — the corpus
    diversity metric mixture tuning reads. Two hash-aggs; p*ln(p) runs
    on identical operands in both engines and rounds to 9 decimals.
    """
    toks = docs.select(
        "source",
        F.explode(F.transform(tokens_col(text_col), F.lower)).alias("token"),
    ).filter(F.col("token") != "")
    counts = toks.groupBy("source", "token").agg(F.count("*").alias("c"))
    totals = counts.groupBy("source").agg(
        F.sum("c").alias("tot"), F.count("*").alias("v")
    )
    ent = (
        counts.join(totals, "source")
        .select(
            "source",
            "v",
            (
                -(F.col("c") / F.col("tot"))
                * F.log(F.col("c") / F.col("tot"))
            ).alias("term"),
        )
        .groupBy("source", "v")
        .agg(F.round(F.sum("term"), 9).alias("entropy"))
    )
    return ent.select(
        "source",
        F.col("v").cast("long").alias("vocab"),
        "entropy",
        F.round(
            F.when(F.col("v") > 1, F.col("entropy") / F.log(F.col("v").cast("double")))
            .otherwise(F.lit(0.0)),
            9,
        ).alias("norm_entropy"),
    )


def source_entropy_sql(table: str = "documents") -> str:
    return f"""
        WITH toks AS (
          SELECT source, lower(w) AS token
          FROM {table}, unnest({tokens_sql('text')}) AS u(w)
          WHERE w <> ''
        ), counts AS (
          SELECT source, token, count(*) AS c FROM toks GROUP BY source, token
        ), totals AS (
          SELECT source, sum(c) AS tot, count(*) AS v FROM counts GROUP BY source
        ), ent AS (
          SELECT counts.source, v,
                 round(sum(-(c / tot) * ln(c / tot)), 9) AS entropy
          FROM counts JOIN totals USING (source)
          GROUP BY counts.source, v
        )
        SELECT source, v::BIGINT AS vocab, entropy,
               round(CASE WHEN v > 1 THEN entropy / ln(v::DOUBLE) ELSE 0.0 END, 9)
                 AS norm_entropy
        FROM ent ORDER BY source
    """


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken — SIGMOD 2003)
# ---------------------------------------------------------------------------

WINNOW_K = 3  # tokens per k-gram
WINNOW_W = 4  # hashes per winnowing window


def winnow_fingerprints(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    text_col: str = "text",
) -> DataFrame:
    """MOSS-style winnowing fingerprints: the canonical document
    fingerprint for partial-overlap / near-duplicate detection.

    Per document: hash every token k-gram, slide a window of ``w``
    consecutive gram hashes, select the minimum hash in each window
    (ties -> RIGHTMOST occurrence, the robust-winnowing rule), emit the
    distinct (position, hash) selections. Guarantee: any shared token
    run of length >= k + w - 1 between two documents produces at least
    one shared fingerprint, while only ~2/(w+1) of gram hashes are kept.

    Scale shape: a pure per-row projection over native higher-order
    array functions (no shuffle, no UDF) followed by one explode +
    distinct — fingerprint extraction over 100 TB is embarrassingly
    parallel; downstream matching joins on gram_hash like any LSH
    bucket join (pipelines/dedup.py). Work per doc is O(n_grams * w)
    with w a small constant.

    Output: (doc_id, pos, gram_hash) — pos is the 1-based token
    position where the selected k-gram starts; all integers, so the
    DuckDB oracle compares exactly. Documents with fewer than k tokens
    emit nothing; documents with fewer than w grams winnow a single
    window over all their grams.
    """
    # Stage the gram-hash array as a REAL column before windowing: the
    # window lambda references it w-per-gram times, and CollapseProject
    # correctly refuses to inline a multiply-referenced md5 pipeline —
    # without this staging Catalyst re-evaluates all m gram hashes for
    # every window (O(m^2 k) md5 calls per document; measured 236 s vs
    # ~1 s at sf0.01).
    toks = tokens_col(F.col(text_col))
    staged = docs.select("doc_id", toks.alias("w_toks")).select(
        "doc_id",
        # F.sequence(1, 0) yields DESCENDING [1, 0] — guard docs shorter
        # than k (slice(toks, 0, k) throws on the 0 index).
        F.when(
            F.size("w_toks") >= k,
            F.transform(
                F.sequence(F.lit(1), F.size("w_toks") - k + 1),
                lambda i: portable_hash32_col(
                    F.concat_ws(" ", F.slice(F.col("w_toks"), i, k))
                ),
            ),
        ).otherwise(F.array().cast("array<long>")).alias("grams"),
    )
    m = F.size("grams")
    wlen = F.least(F.lit(w), m)
    wins = m - wlen + 1  # >= 1 whenever m >= 1

    def select_window(j):
        sl = F.slice(F.col("grams"), j, wlen)
        mn = F.array_min(sl)
        # Rightmost position of the min inside the window, formulated
        # identically in both engines (max of matching indices).
        rpos = F.array_max(
            F.transform(
                F.sequence(F.lit(1), wlen),
                lambda q: F.when(F.element_at(sl, q) == mn, q).otherwise(F.lit(0)),
            )
        )
        return F.struct(
            (j - 1 + rpos).cast("int").alias("pos"), mn.alias("gram_hash")
        )

    # F.sequence(1, 0) yields DESCENDING [1, 0] — guard the empty case.
    sel = F.when(
        m >= 1, F.transform(F.sequence(F.lit(1), wins), select_window)
    ).otherwise(F.array().cast("array<struct<pos:int,gram_hash:bigint>>"))
    return (
        staged.select("doc_id", F.explode(sel).alias("s"))
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.gram_hash").alias("gram_hash"))
        .distinct()
    )


def winnow_fingerprints_sql(
    k: int = WINNOW_K, w: int = WINNOW_W, table: str = "documents"
) -> str:
    h = portable_hash32_sql("array_to_string(list_slice(toks, i, i + %d), ' ')" % (k - 1))
    return f"""
        WITH g AS (
          SELECT doc_id,
                 list_transform(generate_series(1, len(toks) - {k} + 1),
                                i -> {h}) AS grams
          FROM (SELECT doc_id, {tokens_sql('text')} AS toks FROM {table})
        ), win AS (
          SELECT doc_id, grams,
                 least({w}, len(grams)) AS wlen
          FROM g WHERE len(grams) >= 1
        ), sel AS (
          SELECT doc_id, u.j AS j,
                 list_slice(grams, u.j, u.j + wlen - 1) AS sl
          FROM win, unnest(generate_series(1, len(grams) - wlen + 1)) AS u(j)
        )
        SELECT DISTINCT doc_id,
               (j - 1 + list_max(list_transform(generate_series(1, len(sl)),
                  q -> CASE WHEN sl[q] = list_min(sl) THEN q ELSE 0 END)))::BIGINT AS pos,
               list_min(sl) AS gram_hash
        FROM sel
        ORDER BY doc_id, pos
    """


# --- readability (Flesch / Flesch-Kincaid, integer-exact) -------------------

def readability(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc Flesch reading ease + Flesch-Kincaid grade, integer-exact.

    Counts: words = whitespace tokens; sentences = runs of [.!?]
    (floored at 1 — crawl text is often terminator-free); syllables =
    vowel-group runs [aeiouy]+ of the lowercased text (the standard
    cheap proxy). Scores are emitted in milli-units via the SAME
    floor-division formula on both engines:

        fre_milli = 206835 - 1015*W DIV S - 84600*Y DIV W
        fkg_milli = 390*W DIV S + 11800*Y DIV W - 15590

    (milli-scaled Flesch 1948 / Kincaid 1975 coefficients; floor
    division replaces the real-valued ratio so the driver hash is
    engine-proof — the ordering of docs by score is preserved to
    within 1 milli-unit.)

    Scale shape: one pure projection — three regexp counts per row, no
    shuffle, stays in whole-stage codegen.
    """
    t = F.lower(F.col(text_col))
    words = F.greatest(
        F.size(F.filter(tokens_col(text_col), lambda x: x != "")), F.lit(1)
    ).cast("long")
    sentences = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")), F.lit(1)
    ).cast("long")
    syllables = F.regexp_count(t, F.lit("[aeiouy]+")).cast("long")
    return (
        docs.select(
            "doc_id",
            words.alias("n_words"),
            sentences.alias("n_sentences"),
            syllables.alias("n_syllables"),
        )
        .withColumn(
            "fre_milli",
            F.expr("206835 - 1015 * n_words DIV n_sentences - 84600 * n_syllables DIV n_words"),
        )
        .withColumn(
            "fkg_milli",
            F.expr("390 * n_words DIV n_sentences + 11800 * n_syllables DIV n_words - 15590"),
        )
    )


def readability_sql(table: str = "documents") -> str:
    return f"""
        WITH c AS (
          SELECT doc_id,
                 greatest(len(list_filter({tokens_sql('text')}, x -> x <> '')), 1)::BIGINT AS n_words,
                 greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT AS n_sentences,
                 len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS n_syllables
          FROM {table}
        )
        SELECT doc_id, n_words, n_sentences, n_syllables,
               206835 - 1015 * n_words // n_sentences - 84600 * n_syllables // n_words AS fre_milli,
               390 * n_words // n_sentences + 11800 * n_syllables // n_words - 15590 AS fkg_milli
        FROM c
        ORDER BY doc_id
    """


def tokenizer_fertility(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Tokenizer-budget accounting per source: corpus bytes per regex
    (BPE-ish) token and regex tokens per whitespace word, both in integer
    ppm — the numbers a pretraining-data planner uses to convert corpus
    bytes into token budgets (and to spot sources whose tokenization is
    pathologically expensive). One map-side-combinable hash agg onto
    |sources| rows; all-integer output."""
    text = F.col(text_col)
    per_doc = docs.select(
        "source",
        F.octet_length(text).cast("long").alias("n_bytes"),
        F.size(tokens_col(text)).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(REGEX_TOKEN), 0)).cast("long").alias("re_tokens"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bytes").alias("n_bytes"),
            F.sum("ws_tokens").alias("ws_tokens"),
            F.sum("re_tokens").alias("re_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_bytes",
            "ws_tokens",
            "re_tokens",
            F.expr("n_bytes * 1000000 DIV re_tokens").alias("bytes_per_token_ppm"),
            F.expr("re_tokens * 1000000 DIV ws_tokens").alias("fertility_ppm"),
        )
    )


def tokenizer_fertility_sql(table: str = "documents") -> str:
    return f"""
        WITH tfd AS (
          SELECT source,
                 strlen(text)::BIGINT AS n_bytes,
                 len({tokens_sql('text')})::BIGINT AS ws_tokens,
                 len(regexp_extract_all(text, '{REGEX_TOKEN}'))::BIGINT AS re_tokens
          FROM {table}
        ),
        agg AS (
          SELECT source, count(*)::BIGINT AS n_docs, sum(n_bytes) AS n_bytes,
                 sum(ws_tokens) AS ws_tokens, sum(re_tokens) AS re_tokens
          FROM tfd GROUP BY source
        )
        SELECT source, n_docs, n_bytes::BIGINT AS n_bytes,
               ws_tokens::BIGINT AS ws_tokens, re_tokens::BIGINT AS re_tokens,
               (n_bytes * 1000000 // re_tokens)::BIGINT AS bytes_per_token_ppm,
               (re_tokens * 1000000 // ws_tokens)::BIGINT AS fertility_ppm
        FROM agg
        ORDER BY source
    """


def lang_mixture(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language corpus composition: document count, whitespace-token
    count, and token share of the whole corpus in integer ppm — the
    table a pretraining data-mixture planner reads before setting
    per-language sampling weights (pipelines/sampling.mixture_weights).

    Single scan: the language decision and the token count are computed
    in one projection (no doc_id join), then one hash-agg onto
    |languages| rows; the corpus total rides along as a broadcast 1-row
    aggregate. Integer-exact output.
    """
    # The language decision is rebuilt inline (same fold as language_id)
    # rather than joining language_id's output back on doc_id: the fused
    # projection keeps this a one-scan zero-join plan.
    toks = F.transform(tokens_col(F.col(text_col)), F.lower)
    has_cjk = F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", "")) > 0

    def _contains(arr):
        return lambda t: F.array_contains(arr, t)

    pred = F.lit("und")
    acc = F.lit(0)
    for lang, markers in LANG_MARKERS:
        arr = F.array(*[F.lit(m) for m in markers])
        sc = F.size(F.filter(toks, _contains(arr)))
        pred = F.when(sc > acc, F.lit(lang)).otherwise(pred)
        acc = F.greatest(acc, sc)
    pred = F.when(has_cjk, F.lit("zh")).otherwise(pred)
    per_doc = docs.select(
        pred.alias("predicted_lang"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("ws_tokens"),
    )
    agg = per_doc.groupBy("predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ws_tokens").alias("ws_tokens"),
    )
    total = agg.agg(F.sum("ws_tokens").alias("total_tokens"))
    return agg.crossJoin(F.broadcast(total)).select(
        "predicted_lang",
        "n_docs",
        "ws_tokens",
        F.expr("ws_tokens * 1000000 DIV total_tokens").alias("share_ppm"),
    )


def lang_mixture_sql(table: str = "documents") -> str:
    score_exprs = []
    for lang, markers in LANG_MARKERS:
        lst = ", ".join(f"'{m}'" for m in markers)
        score_exprs.append(
            f"len(list_filter(list_transform(toks, x -> lower(x)), t -> list_contains([{lst}], t))) AS score_{lang}"
        )
    langs = [lang for lang, _ in LANG_MARKERS]
    pred = "'und'"
    acc = "0"
    for lang in langs:
        pred = f"CASE WHEN score_{lang} > {acc} THEN '{lang}' ELSE {pred} END"
        acc = f"greatest({acc}, score_{lang})"
    return f"""
        WITH t AS (
          SELECT doc_id, text, {tokens_sql('text')} AS toks FROM {table}
        ), s AS (
          SELECT doc_id, text, len(toks)::BIGINT AS ws_tokens,
                 {', '.join(score_exprs)}
          FROM t
        ), p AS (
          SELECT CASE WHEN length(regexp_replace(text, '[^一-鿿]', '', 'g')) > 0
                      THEN 'zh' ELSE {pred} END AS predicted_lang,
                 ws_tokens
          FROM s
        ), agg AS (
          SELECT predicted_lang, count(*)::BIGINT AS n_docs,
                 sum(ws_tokens)::BIGINT AS ws_tokens
          FROM p GROUP BY predicted_lang
        )
        SELECT predicted_lang, n_docs, ws_tokens,
               (ws_tokens * 1000000 // (SELECT sum(ws_tokens) FROM agg))::BIGINT AS share_ppm
        FROM agg
        ORDER BY predicted_lang
    """


# ---------------------------------------------------------------------------
# BPE pair counting (the tokenizer-training inner loop, distributed)
# ---------------------------------------------------------------------------


def bpe_pairs(docs: DataFrame, text_col: str = "text", min_freq: int = 2) -> DataFrame:
    """First BPE training iteration, distributed: adjacent character-pair
    frequencies weighted by word frequency. This is THE counting step a
    tokenizer trainer (BPE/WordPiece) repeats per merge — at corpus
    scale the trick is that pairs are counted over the WORD-FREQUENCY
    TABLE, not the token stream: one explode+hash-agg compresses 100 TB
    of text to a |vocab|-row table, and per-word pair expansion then
    touches |vocab| * avg_word_len rows regardless of corpus size.

    Output: (left_sym, right_sym, pair_freq) for pairs with corpus
    frequency >= ``min_freq`` — the argmax row is the first merge rule.

    Scale shape: shuffle #1 is the word-count agg (map-side combine,
    skew-neutral: hot words pre-aggregate per partition); pair expansion
    is a no-shuffle lateral over the vocab; shuffle #2 aggregates
    ~alphabet^2 pair rows. No per-row Python anywhere.
    """
    words = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wfreq"))
        # sequence(1, 0) is descending in Spark: gate 1-char words out
        .filter(F.length("word") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> struct(substr(word, i, 1) AS left_sym,"
                "             substr(word, i + 1, 1) AS right_sym))"
            )
        ).alias("p"),
        "wfreq",
    )
    return (
        pairs.groupBy(F.col("p.left_sym").alias("left_sym"), F.col("p.right_sym").alias("right_sym"))
        .agg(F.sum("wfreq").cast("long").alias("pair_freq"))
        .filter(F.col("pair_freq") >= min_freq)
    )


def bpe_pairs_sql(table: str = "documents", min_freq: int = 2) -> str:
    return f"""
        WITH words AS (
          SELECT word, count(*)::BIGINT AS wfreq FROM (
            SELECT unnest({tokens_sql('text')}) AS word FROM {table}
          ) WHERE length(word) > 0
          GROUP BY word
        ),
        pairs AS (
          SELECT substr(word, i::INT, 1) AS left_sym,
                 substr(word, i::INT + 1, 1) AS right_sym,
                 wfreq
          FROM (
            SELECT word, wfreq,
                   unnest(generate_series(1, length(word) - 1)) AS i
            FROM words WHERE length(word) >= 2
          )
        )
        SELECT left_sym, right_sym, sum(wfreq)::BIGINT AS pair_freq
        FROM pairs
        GROUP BY left_sym, right_sym
        HAVING sum(wfreq) >= {min_freq}
        ORDER BY left_sym, right_sym
    """
