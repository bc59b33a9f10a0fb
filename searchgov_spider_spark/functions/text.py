"""Text sanitization + tokenization scalar functions.

Behavior parity with the reference's content helpers
(/root/reference/search_gov_crawler/search_gov_spiders/helpers/content.py:7-50;
spec in tests/search_gov_spiders/test_content.py): entity replacement,
non-printable removal, whitespace collapse. Implementations are original.

Native Column versions are provided for the hot path (regexp chains stay in
whole-stage codegen); the pure functions back the pandas-UDF paths and the
unit tests.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ENTITY_REPLACEMENTS = {"&#13;": "\r", "&#10;": "\n", "&nbsp;": " "}
# Newline not preceded by one of the literal chars p { P } > (the reference's
# NON_PUNCTUATION_NEWLINES pattern has no unicode-property support in `re`,
# so its observable behavior is this literal char class — we match it).
_NON_PUNCT_NEWLINE = re.compile(r"(?<![p{P}>])\n", flags=re.MULTILINE)
_WS = re.compile(r"\s+")


def remove_control_chars(text: str) -> str:
    """Drop characters that are neither printable nor whitespace."""
    return "".join(ch for ch in text if ch.isprintable() or ch.isspace())


def trim_whitespace(text) -> str:
    try:
        return " ".join(text.split()).strip()
    except (AttributeError, TypeError):
        return ""


def replace_whitespace(text) -> str:
    """Collapse all whitespace runs to single spaces and strip."""
    if not text:
        return ""
    return _WS.sub(" ", text).strip()


def clean_line(line: str) -> str:
    for entity, char in _ENTITY_REPLACEMENTS.items():
        line = line.replace(entity, char)
    line = remove_control_chars(line)
    line = trim_whitespace(_NON_PUNCT_NEWLINE.sub(" ", line))
    return line.strip() or ""


def sanitize_text(text) -> str | None:
    """Line-wise sanitize; empty lines dropped; final whitespace collapse."""
    if not text:
        return None
    try:
        cleaned = "\n".join(filter(None, (clean_line(ln) for ln in text.splitlines())))
        cleaned = cleaned.replace("␤", "")
    except AttributeError:
        cleaned = text
    return replace_whitespace(cleaned)


_CAMEL_SPLIT = re.compile(
    r"(?<!^)(?=[A-Z][a-z])|(?<=[a-z])(?=[A-Z])|[-_+~,%]|(?<=\D)(?=\d)|(?<=\d)(?=\D)"
)


def separate_file_name(file_name: str) -> str:
    """Split a file name into words on case/digit/punct boundaries
    (i14y_helper.py:136-142 parity)."""
    base_name = file_name.rsplit(".", 1)[0].replace(".", " ")
    return " ".join(_CAMEL_SPLIT.split(base_name))


def force_bool(value) -> bool:
    """'true' (any case) -> True, everything else False (helpers parity)."""
    return str(value).lower() == "true"


# BPE-ish token pattern used by token counting / fingerprinting: words,
# numbers, or single non-space symbols.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokenize(text: str) -> list[str]:
    if not text:
        return []
    return re.findall(TOKEN_PATTERN, text)


# ---------------------------------------------------------------------------
# Vectorized UDFs
# ---------------------------------------------------------------------------

@F.pandas_udf(T.StringType())
def sanitize_text_udf(texts: pd.Series) -> pd.Series:
    return texts.map(sanitize_text, na_action="ignore")


# ---------------------------------------------------------------------------
# Native Column builders (fast path; ASCII control chars + whitespace only —
# full unicode-printability parity requires the pandas UDF above)
# ---------------------------------------------------------------------------

def replace_whitespace_col(col: Column | str) -> Column:
    # (?U) = Java UNICODE_CHARACTER_CLASS so \s matches   like Python's re
    return F.trim(F.regexp_replace(col, r"(?U)\s+", " "))


def remove_control_chars_col(col: Column | str) -> Column:
    # Java regex: control/format chars that are not whitespace.
    return F.regexp_replace(col, r"(?U)[\p{Cc}\p{Cf}&&[^\s]]", "")


def sanitize_text_col(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "&#13;", "\r")
    c = F.regexp_replace(c, "&#10;", "\n")
    c = F.regexp_replace(c, "&nbsp;", " ")
    c = remove_control_chars_col(c)
    c = F.regexp_replace(c, "␤", "")
    return replace_whitespace_col(c)


def token_count_col(col: Column | str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_PATTERN), F.lit(0)))
