"""URL canonicalization and URL-part functions.

Rebuild of the semantics the reference gets from w3lib/scrapy request
fingerprinting (reference: search_gov_spiders/job_state/dupefilter.py:8-25 —
canonical URL before hashing) and elasticsearch/i14y_helper.py:145-181
(ensure_http_prefix, get_url_path, get_base_extension, get_domain_name).
Implementation is original, written against the documented behavior:

  canonicalize(url) =
    lowercase scheme + host, strip default port, strip fragment,
    sort query parameters (key, value) keeping duplicates and blanks,
    resolve path dot-segments, '' path -> '/'.

Hot path: ``canonicalize_udf`` is an Arrow-batched pandas UDF (no per-row
Python at the DataFrame layer); ``url_hash_col`` is native xxhash64.
"""

from __future__ import annotations

import posixpath
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21}


def ensure_http_prefix(url: str) -> str:
    """Prefix scheme-less URLs with https:// (i14y_helper.py:145-147 parity)."""
    if url is None:
        return None
    return url if url.startswith(("http://", "https://")) else f"https://{url}"


def _normalize_path(path: str) -> str:
    if not path:
        return "/"
    # resolve /./ and /../ segments without touching trailing-slash intent
    normalized = posixpath.normpath(path)
    if path.endswith("/") and not normalized.endswith("/"):
        normalized += "/"
    if normalized == ".":
        return "/"
    if not normalized.startswith("/"):
        normalized = "/" + normalized
    return normalized


def canonicalize_url(url: str) -> str | None:
    """Canonical form used for dedup fingerprinting.

    Deterministic, idempotent: canonicalize(canonicalize(u)) == canonicalize(u).
    """
    if url is None:
        return None
    url = url.strip()
    if not url.lower().startswith(("http://", "https://")):
        url = ensure_http_prefix(url)
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = (parts.scheme or "https").lower()
    host = (parts.hostname or "").lower()
    port = None
    try:
        port = parts.port
    except ValueError:
        port = None
    netloc = host
    if port is not None and port != DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    path = _normalize_path(parts.path)
    query = urlencode(sorted(parse_qsl(parts.query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path, query, ""))


def get_url_path(url: str) -> str:
    return urlsplit(ensure_http_prefix(url)).path


def get_domain_name(url: str) -> str:
    return urlsplit(ensure_http_prefix(url)).netloc


def get_base_extension(url: str) -> tuple[str, str]:
    """(basename, extension-without-dot) of the URL path."""
    path = get_url_path(url)
    base = posixpath.basename(path)
    if "." in base:
        stem, _, ext = base.rpartition(".")
        return stem, ext
    return base, ""


# ---------------------------------------------------------------------------
# Vectorized UDFs (Arrow-batched; the only Python in the canonicalize hot path)
# ---------------------------------------------------------------------------

# Fast-path pattern: scheme://host[/path][#fragment] with no port, no
# userinfo, no query, and a path free of dot-segments and '//' runs. For
# such URLs canonicalization reduces to lowercasing scheme+host and
# dropping the fragment — pure vectorized pandas string ops. Everything
# else (queries to sort, ports to strip, '..' to resolve) falls back to
# the per-row reference implementation. The fast path covers the
# overwhelming majority of real crawl URLs.
_FAST_URL_RE = (
    r"^(?P<scheme>[Hh][Tt][Tt][Pp][Ss]?)://"
    r"(?P<host>[A-Za-z0-9](?:[A-Za-z0-9.-]*[A-Za-z0-9])?)"
    r"(?P<path>/[^?#]*)?(?:#.*)?$"
)
_DOT_SEGMENT_RE = r"/\.|//"


def canonicalize_batch(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalization (one Arrow batch). NULL rows stay NULL
    and cost nothing — ``with_canonical``'s single-pass mode feeds the UDF
    a column that is NULL wherever the JVM fast path already answered."""
    out = pd.Series(index=urls.index, dtype=object)
    present = urls.notna()
    if not present.any():
        return out
    s = urls[present].str.strip()
    parts = s.str.extract(_FAST_URL_RE)
    path = parts["path"]
    # interior whitespace goes to the slow path: urlsplit (WHATWG) strips
    # ASCII tab/newline from URLs, which the fast-path regex would keep
    fast = (
        parts["scheme"].notna()
        & ~path.fillna("").str.contains(_DOT_SEGMENT_RE, regex=True)
        & ~path.fillna("").str.contains(r"\s", regex=True)
    )
    if fast.any():
        out[fast[fast].index] = (
            parts.loc[fast, "scheme"].str.lower()
            + "://"
            + parts.loc[fast, "host"].str.lower()
            + path[fast].fillna("/")
        )
    slow = s.index[~fast]
    if len(slow):
        out[slow] = s[slow].map(canonicalize_url)
    return out


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return canonicalize_batch(urls)


# Java-regex mirror of _FAST_URL_RE for the JVM-native fast path. The
# whitespace guard is applied separately: Java's `$` also matches before a
# trailing newline, so fast-path classification additionally requires the
# raw URL to contain no whitespace at all (such rows go to the UDF, which
# strips and canonicalizes them identically).
_FAST_URL_RE_JAVA = (
    r"^([Hh][Tt][Tt][Pp][Ss]?)://"
    r"([A-Za-z0-9](?:[A-Za-z0-9.-]*[A-Za-z0-9])?)"
    r"(/[^?#]*)?(?:#.*)?$"
)


def canonicalize_fast_col(url: Column | str) -> Column:
    """JVM-native canonicalization of fast-pattern URLs; NULL otherwise.

    Fast pattern = scheme://host[/path][#fragment] with no whitespace, no
    port, no userinfo, no query, and a path free of dot-segments and '//'
    runs — for which canonicalization is lowercasing scheme+host, dropping
    the fragment, and '' path -> '/'. Exactly the pandas fast path of
    ``canonicalize_batch``, but whole-stage-codegen'd: zero Python. Rows
    that return NULL here MUST be routed through ``canonicalize_udf``.
    """
    c = F.col(url) if isinstance(url, str) else url
    path = F.regexp_extract(c, _FAST_URL_RE_JAVA, 3)
    ok = (
        c.isNotNull()
        & ~c.rlike(r"\s")
        & c.rlike(_FAST_URL_RE_JAVA)
        & ~path.rlike(r"/\.|//")
    )
    canon = F.concat(
        F.lower(F.regexp_extract(c, _FAST_URL_RE_JAVA, 1)),
        F.lit("://"),
        F.lower(F.regexp_extract(c, _FAST_URL_RE_JAVA, 2)),
        F.when(path == "", F.lit("/")).otherwise(path),
    )
    return F.when(ok, canon)


def with_canonical(
    df, url_col: str = "url", out_col: str = "canon_url", rescan_cheap: bool = False
):
    """Hybrid canonicalization: native JVM expression for fast-pattern rows,
    Arrow UDF only for the rest. Semantics identical to
    ``withColumn(out_col, canonicalize_udf(url_col))`` for every input.

    rescan_cheap=True (frontier read from parquet / generated ranges):
    split-union — the fast branch never touches Python at all; costs a
    second column-pruned scan of the input.

    rescan_cheap=False (mid-lineage inputs that are expensive to
    recompute, e.g. the engine's extraction explode): single pass — the
    UDF receives NULL for fast rows, so Python does no per-row work on
    them; only the Arrow round-trip of a mostly-null column remains.
    """
    fast = canonicalize_fast_col(url_col)
    if rescan_cheap:
        fast_rows = df.withColumn(out_col, fast).filter(F.col(out_col).isNotNull())
        slow_rows = df.filter(fast.isNull()).withColumn(
            out_col, canonicalize_udf(url_col)
        )
        return fast_rows.unionByName(slow_rows)
    slow_in = F.when(fast.isNull(), F.col(url_col))
    return df.withColumn(out_col, F.coalesce(fast, canonicalize_udf(slow_in)))


# ---------------------------------------------------------------------------
# Native Column builders (JVM-side fast paths)
# ---------------------------------------------------------------------------

def url_hash_col(canon_url: Column | str) -> Column:
    """64-bit frontier identity hash of the canonical URL (JVM xxhash64).

    The identity hash is never salted — salting applies only to shuffle
    keys (SURVEY.md §7 hard part (d)).
    """
    return F.xxhash64(canon_url)


def url_host_col(url: Column | str) -> Column:
    """Hostname, lowercased (native try_parse_url — stays in codegen).

    try_parse_url, not parse_url: crawl candidates contain malformed URLs
    (javascript: links, whitespace) and a single bad row must yield null,
    not abort the stage.
    """
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def url_path_col(url: Column | str) -> Column:
    return F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))


def url_query_col(url: Column | str) -> Column:
    return F.try_parse_url(url, F.lit("QUERY"))


def url_extension_col(url: Column | str) -> Column:
    """Lowercased file extension of the URL path ('' when none)."""
    return F.lower(F.regexp_extract(url_path_col(url), r"\.([A-Za-z0-9]+)$", 1))


def ensure_http_prefix_col(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.when(c.rlike(r"^https?://"), c).otherwise(F.concat(F.lit("https://"), c))


def url_sha256_col(url: Column | str) -> Column:
    """Document id = sha256 of the (http-prefixed) URL (i14y_helper.py:170-173)."""
    return F.sha2(ensure_http_prefix_col(url), 256)
