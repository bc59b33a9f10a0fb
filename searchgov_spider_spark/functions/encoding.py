"""HTTP body decoding (helpers/encoding.py:10-34 behavior, without cchardet).

Cascade: utf-8 -> detected encoding -> str(bytes) fallback. cchardet is not
available in this environment; detection falls back to a deterministic
heuristic (BOM sniff, latin-1 last resort — latin-1 never fails, matching the
reference's "never raise" contract). VISCII maps to cp1258 as the reference
does.
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


def detect_encoding(data: bytes) -> str | None:
    if not data:
        return None
    for bom, enc in _BOMS:
        if data.startswith(bom):
            return enc
    try:
        data.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
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
