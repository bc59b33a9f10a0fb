"""A2 word-frequency summarizer (SURVEY.md §2.6).

Reference: /root/reference/search_gov_crawler/elasticsearch/i14y_helper.py:78-133
``summarize_text``: NLTK sentence/word tokenize; word frequencies over
alnum non-stopword words; each sentence scores the running frequency of
every already-counted word; summary = top-3 sentences, keywords = top-10
words (both ties broken by first-seen order, via Python's stable sort).

This rebuild replicates the exact scoring loop — including its quirk that
a sentence's score uses word frequencies as of the moment the sentence is
scanned — in a vectorized pandas UDF (pure-Python kernel per doc, Arrow
batch transfer; NLTK's punkt tokenizer is replaced by a deterministic
regex splitter, noted below). The keyword half also exists as a pure
relational plan in pipelines/textstats.top_keywords (explode → hash-agg →
windowed top-k) for corpus-level keyword extraction at scale.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Deterministic stand-ins for nltk punkt / word_tokenize:
SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")
WORD_RE = re.compile(r"[A-Za-z0-9]+(?:'[A-Za-z]+)?|[^\w\s]")

# Per-language stopwords (NLTK stopwords corpus analog; tiny determinstic
# subsets — the operator contract is the scoring loop, not the corpus).
# Languages beyond this table return (None, None), mirroring the
# reference's missing-stopwords-file behavior (i14y_helper.py:102-107).
STOPWORDS_BY_LANG: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the a an and or of to in on for is are was be with as at by it this that".split()
    ),
    "es": frozenset("el la los las de que y una un por con para en es no".split()),
    "de": frozenset("der die das und ist nicht ein mit auf den zu".split()),
    "fr": frozenset("le la les des est une dans pour qui pas et".split()),
    "it": frozenset("di e il la che a in un per è una sono con non le".split()),
    "pt": frozenset("de a o que e do da em um para é com não uma os".split()),
    "nl": frozenset("de het een van en in is dat op te zijn met voor niet".split()),
}

_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("summary", T.StringType()),
        T.StructField("keywords", T.StringType()),
    ]
)


def summarize_text(text: str | None, lang_code: str | None = "en") -> tuple[str | None, str | None]:
    """Pure-Python kernel; loop semantics mirror i14y_helper.py:108-131."""
    if not isinstance(text, str) or not text:
        return None, None
    stop_words = STOPWORDS_BY_LANG.get(lang_code or "")
    if stop_words is None:
        return None, None

    sentences = [s for s in SENT_SPLIT.split(text) if s]
    word_frequencies: dict[str, int] = {}
    sentence_scores: dict[str, int] = {}
    for sentence in sentences:
        for word in (w.lower() for w in WORD_RE.findall(sentence)):
            if word.isalnum() and word not in stop_words:
                word_frequencies[word] = word_frequencies.get(word, 0) + 1
            if word in word_frequencies:
                sentence_scores[sentence] = sentence_scores.get(sentence, 0) + word_frequencies[word]

    summary = " ".join(sorted(sentence_scores, key=sentence_scores.get, reverse=True)[:3])
    keywords = ", ".join(sorted(word_frequencies, key=word_frequencies.get, reverse=True)[:10])
    return summary, keywords


@F.pandas_udf(_RESULT_SCHEMA)
def summarize_udf(texts: pd.Series, langs: pd.Series) -> pd.DataFrame:
    rows = [summarize_text(t, lg) for t, lg in zip(texts, langs)]
    return pd.DataFrame({"summary": [r[0] for r in rows], "keywords": [r[1] for r in rows]})


def with_summary(df, text_col: str = "text", lang_col: Column | str | None = None):
    """Attach (summary, keywords) columns; lang defaults to 'en'."""
    lang = (
        F.lit("en")
        if lang_col is None
        else (F.col(lang_col) if isinstance(lang_col, str) else lang_col)
    )
    s = summarize_udf(F.col(text_col), lang)
    return df.withColumn("summary", s["summary"]).withColumn("keywords", s["keywords"])
