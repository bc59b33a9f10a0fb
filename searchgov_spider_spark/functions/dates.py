"""Date parsing: ISO output format + fuzzy and PDF 'D:' formats.

Reference behavior: parse_date_safely (i14y_helper.py:32-57) emits
'%Y-%m-%dT%H:%M:%S' or None; PDF dates are 'D:YYYYMMDDHHmmSS...' strings
(convert_pdf_i14y.py:184-229). dateutil is unavailable; the pure parser
covers the common formats deterministically.
"""

from __future__ import annotations

import re
from datetime import datetime

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

ISO_FMT = "%Y-%m-%dT%H:%M:%S"

_FORMATS = (
    "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%Y/%m/%d",
    "%m/%d/%Y", "%m-%d-%Y", "%B %d, %Y", "%b %d, %Y", "%d %B %Y", "%Y%m%d",
)
_PDF_DATE = re.compile(r"^D:(\d{4})(\d{2})?(\d{2})?(\d{2})?(\d{2})?(\d{2})?")


def parse_pdf_date(value: str | None) -> str | None:
    if not value:
        return None
    m = _PDF_DATE.match(str(value))
    if not m:
        return None
    parts = [int(g) if g else d for g, d in zip(m.groups(), (1970, 1, 1, 0, 0, 0))]
    try:
        return datetime(*parts).strftime(ISO_FMT)
    except ValueError:
        return None


def parse_date_safely(value) -> str | None:
    if value is None or value == "":
        return None
    if isinstance(value, datetime):
        return value.strftime(ISO_FMT)
    s = str(value).strip()
    pdf = parse_pdf_date(s)
    if pdf:
        return pdf
    for fmt in _FORMATS:
        try:
            return datetime.strptime(s, fmt).strftime(ISO_FMT)
        except ValueError:
            continue
    # fuzzy fallback: find a YYYY-MM-DD or Month DD, YYYY anywhere in the string
    m = re.search(r"(\d{4})-(\d{2})-(\d{2})", s)
    if m:
        try:
            return datetime(int(m[1]), int(m[2]), int(m[3])).strftime(ISO_FMT)
        except ValueError:
            return None
    return None


@F.pandas_udf(T.StringType())
def parse_date_udf(values: pd.Series) -> pd.Series:
    return values.map(parse_date_safely, na_action="ignore")


def iso_timestamp_col(col: Column | str) -> Column:
    """Native fast path for well-formed inputs."""
    return F.date_format(F.to_timestamp(col), "yyyy-MM-dd'T'HH:mm:ss")
