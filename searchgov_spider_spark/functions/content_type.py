"""Content-type predicate + simple-type projection.

Reference behavior (helpers/domain_spider.py:30-50,77-96): a content-type
header is valid for an output target iff any allowed type regex-searches the
header; the "simple" type is the FIRST allowed type that matches (allow-list
order matters). Nulls propagate as null (the reference returns None for a
falsy header).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import CONTENT_TYPES_BY_TARGET


def is_valid_content_type(header: str | None, output_target: str) -> bool | None:
    if not header:
        return None
    header = str(header)
    return any(re.search(t, header) for t in CONTENT_TYPES_BY_TARGET[output_target])


def get_simple_content_type(header: str | None, output_target: str) -> str | None:
    if not header:
        return None
    header = str(header)
    for t in CONTENT_TYPES_BY_TARGET[output_target]:
        if re.search(t, header):
            return t
    return None


def is_valid_content_type_col(header: Column | str, output_target: str) -> Column:
    """Native predicate: null header -> null, else any-allowed-type match.

    The allowed types contain '/' and '.' — '.' is a regex wildcard in the
    reference's re.search too, so plain rlike keeps exact parity.
    """
    c = F.col(header) if isinstance(header, str) else header
    allowed = CONTENT_TYPES_BY_TARGET[output_target]
    matched = None
    for t in allowed:
        m = c.rlike(t)
        matched = m if matched is None else (matched | m)
    return F.when(c.isNull() | (c == ""), F.lit(None).cast("boolean")).otherwise(matched)


def simple_content_type_col(header: Column | str, output_target: str) -> Column:
    """First matching allowed type, in allow-list order (F.coalesce of whens)."""
    c = F.col(header) if isinstance(header, str) else header
    allowed = CONTENT_TYPES_BY_TARGET[output_target]
    branches = [F.when(c.rlike(t), F.lit(t)) for t in allowed]
    return F.when(c.isNull() | (c == ""), F.lit(None)).otherwise(F.coalesce(*branches))
