"""HTTP body decoding (helpers/encoding.py:10-34 behavior, without cchardet).

Cascade: utf-8 -> detected encoding -> str(bytes) fallback. cchardet is not
available in this environment; detection is a deterministic heuristic:

1. BOM sniff (utf-8-sig / utf-16 / utf-32);
2. strict utf-8 probe;
3. null-byte layout (BOM-less utf-16/utf-32, by which byte lane the
   nulls occupy — real text in these encodings is >30% nulls);
4. shift_jis probe (strict decode + at least one decoded CJK/kana char —
   the cross-check keeps cp1252 bodies from false-positiving);
5. cp1252 (cchardet's usual WINDOWS-1252 answer for 8-bit .gov content;
   a superset of latin-1 in the 0xA0-0xFF range and the right answer
   for 0x80-0x9F smart quotes/dashes where latin-1 yields C1 controls);
6. latin-1 last resort (never fails — the reference's "never raise"
   contract).

VISCII maps to cp1258 as the reference does.
"""

from __future__ import annotations

import codecs

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BOMS = (
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF32_LE, "utf-32"),
    (codecs.BOM_UTF32_BE, "utf-32"),
    (codecs.BOM_UTF16_LE, "utf-16"),
    (codecs.BOM_UTF16_BE, "utf-16"),
)

# cp1252 leaves these five bytes undefined; their presence rules it out
_CP1252_HOLES = frozenset(b"\x81\x8d\x8f\x90\x9d")


def _is_cjk(ch: str) -> bool:
    o = ord(ch)
    return (
        0x3040 <= o <= 0x30FF  # hiragana + katakana
        or 0x4E00 <= o <= 0x9FFF  # CJK unified
        or 0xFF01 <= o <= 0xFF60  # fullwidth forms
    )


def detect_encoding(data: bytes) -> str | None:
    if not data:
        return None
    for bom, enc in _BOMS:
        if data.startswith(bom):
            return enc
    # null-layout first: ASCII text in BOM-less utf-16/32 is also valid
    # utf-8 (the nulls), so the utf-8 probe would misclaim it
    sample = data[:4096]
    n = len(sample)
    nulls = sample.count(0)
    if n >= 4 and nulls / n > 0.3:
        even_nulls = sample[::2].count(0)
        odd_nulls = sample[1::2].count(0)
        if nulls / n > 0.6:
            return "utf-32-le" if sample[1:4].count(0) >= 2 else "utf-32-be"
        return "utf-16-le" if odd_nulls > even_nulls else "utf-16-be"

    try:
        data.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        pass

    try:
        decoded = sample.decode("shift_jis")
        if any(_is_cjk(ch) for ch in decoded):
            return "shift_jis"
    except UnicodeDecodeError:
        pass

    if not any(b in _CP1252_HOLES for b in sample):
        return "cp1252"
    return "latin-1"


def decode_http_response(response_bytes: bytes | None) -> str | None:
    if response_bytes is None:
        return None
    try:
        return response_bytes.decode("utf-8")
    except UnicodeDecodeError:
        enc = detect_encoding(response_bytes)
        if str(enc).upper() == "VISCII":
            enc = "cp1258"
        try:
            return response_bytes.decode(enc)
        except (UnicodeDecodeError, TypeError, LookupError):
            return str(response_bytes)


@F.pandas_udf(T.StringType())
def decode_body_udf(bodies: pd.Series) -> pd.Series:
    return bodies.map(decode_http_response, na_action="ignore")


def decode_utf8_col(col: Column | str) -> Column:
    """Native fast path when bodies are known-utf8 (the synthetic corpus)."""
    return F.decode(F.col(col) if isinstance(col, str) else col, "UTF-8")
