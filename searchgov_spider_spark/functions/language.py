"""Language identification: allow-map + cascade + n-gram/stopword heuristic.

Reference behavior:
- 45-language allow map — elasticsearch/i14y_helper.py:16-27.
- cascade: Content-Language header[:2] -> <html lang> -> meta 'language'
  -> detector on first 64 chars — helpers/domain_spider.py:150-167,
  convert_html_i14y.py:45-47.

The reference uses `langdetect` (not installed here); we implement a
deterministic heuristic detector: script-range detection for CJK/Cyrillic/
Arabic etc., else stopword-ratio scoring over a small per-language table.
It is exposed both as a pure function (tests) and a pandas UDF (hot path).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

ALLOWED_LANGUAGE_CODE = {
    "ar": "arabic", "bg": "bulgarian", "bn": "bengali", "ca": "catalan", "cs": "czech",
    "da": "danish", "de": "german", "el": "greek", "en": "english", "es": "spanish",
    "et": "estonian", "fa": "persian", "fr": "french", "he": "hebrew", "hi": "hindi",
    "hr": "croatian", "ht": "haitian creole", "hu": "hungarian", "hy": "armenian",
    "id": "indonesian", "it": "italian", "ja": "japanese", "km": "khmer", "ko": "korean",
    "lt": "lithuanian", "lv": "latvian", "mk": "macedonian", "nl": "dutch", "pl": "polish",
    "ps": "pashto", "pt": "portuguese", "ro": "romanian", "ru": "russian", "sk": "slovak",
    "so": "somali", "sq": "albanian", "sr": "serbian", "sw": "swahili", "th": "thai",
    "tr": "turkish", "uk": "ukrainian", "ur": "urdu", "uz": "uzbek", "vi": "vietnamese",
    "zh": "chinese",
}

# Minimal high-frequency stopword tables for Latin-script scoring.
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to a in is it you that he was for on are with as i his they be at".split()),
    "es": frozenset("de la que el en y a los del se las por un para con no una su al es lo".split()),
    "fr": frozenset("de la le et les des en un du une que est pour qui dans a par plus pas au".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf für ist im dem nicht ein".split()),
    "it": frozenset("di e il la che a in un per è una sono con non le si da come dei".split()),
    "pt": frozenset("de a o que e do da em um para é com não uma os no se na por mais".split()),
    "nl": frozenset("de het een van en in is dat op te zijn met voor niet aan er ook als".split()),
}

_SCRIPT_RANGES: tuple[tuple[str, str], ...] = (
    ("zh", "一-鿿"),
    ("ja", "぀-ヿ"),
    ("ko", "가-힯ᄀ-ᇿ"),
    ("ru", "Ѐ-ӿ"),
    ("ar", "؀-ۿ"),
    ("he", "֐-׿"),
    ("el", "Ͱ-Ͽ"),
    ("th", "฀-๿"),
    ("hi", "ऀ-ॿ"),
)
_SCRIPT_RE = [(code, re.compile(f"[{rng}]")) for code, rng in _SCRIPT_RANGES]
_WORD_RE = re.compile(r"[a-zà-ÿа-я']+")


def detect_lang(text: str | None) -> str | None:
    """Deterministic two-letter language guess over the first 64 chars
    (same truncation as the reference detector call site)."""
    if not text or not isinstance(text, str):
        return None
    sample = text[:64]
    for code, rx in _SCRIPT_RE:
        if rx.search(sample):
            return code
    words = _WORD_RE.findall(sample.lower())
    if not words:
        return None
    best, best_hits = None, 0
    for code, table in STOPWORDS.items():
        hits = sum(1 for w in words if w in table)
        if hits > best_hits:
            best, best_hits = code, hits
    return best or "en"


def normalize_lang(lang: str | None) -> str | None:
    """'en-US' -> 'en' (convert_html_scrapy parity); non-allowed -> None."""
    if not lang:
        return None
    code = lang.split("-")[0].lower()[:2]
    return code if code in ALLOWED_LANGUAGE_CODE else None


@F.pandas_udf(T.StringType())
def detect_lang_udf(texts: pd.Series) -> pd.Series:
    return texts.map(detect_lang, na_action="ignore")


def language_cascade_col(header_lang: Column, html_lang: Column, meta_lang: Column, content: Column) -> Column:
    """F.coalesce cascade; detector UDF only evaluated when all else null."""
    norm = lambda c: F.lower(F.split(c, "-").getItem(0))  # noqa: E731
    return F.coalesce(
        F.substring(header_lang, 1, 2),
        norm(html_lang),
        norm(meta_lang),
        detect_lang_udf(F.substring(content, 1, 64)),
    )
