"""robots.txt rule evaluation S7 (SURVEY.md §2.1).

The reference sets ROBOTSTXT_OBEY=True (settings.py:31) and delegates to
Scrapy's middleware, which enforces standard robots semantics per host for
UA 'usasearch' (settings.py:28) falling back to '*'. Here rules live in a
small ``robots`` table (FIXTURES.md §4):

    robots(domain, user_agent, allow_prefixes, disallow_prefixes,
           crawl_delay, sitemap_urls)

Evaluation is RFC 9309 (REP) matching — the semantics Scrapy's Protego
parser applies for the reference's ROBOTSTXT_OBEY=True. Rules are
path patterns where ``*`` matches any character sequence (including
``/``) and a trailing ``$`` anchors the end of the path; all other
octets are literal. Among the allow/disallow rules that match, the one
with the most octets (pattern length) wins; an allow/disallow tie and
no-match both default to allow; a missing robots row allows everything.

Implementation: broadcast join on domain (the robots table is tiny), then
pure higher-order array expressions — F.filter + F.aggregate compute the
longest matching pattern lengths JVM-side, no UDF. Plain prefixes (the
overwhelmingly common rule shape) stay on a startswith fast path;
patterns containing ``*``/``$`` are translated to an anchored Java regex
by pure string expressions and matched with rlike.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urls import url_host_col, url_path_col

# regex metacharacters that must be escaped when an RFC 9309 pattern is
# translated to a Java regex ('*' is excluded: it becomes '.*'; a
# TRAILING '$' is the end anchor, any interior '$' is literal)
_META_CLASS = r"[.?+(){}\[\]\\|^$]"


def rule_regex_col(p: Column) -> Column:
    """Translate an RFC 9309 path pattern to an equivalent Java regex,
    as a pure string-expression column: ``^`` + pattern with regex
    metachars escaped and ``*`` -> ``.*``, plus a ``$`` anchor iff the
    pattern ends with one. rlike's find semantics then give exactly the
    REP rule: anchored at the path start, free to end anywhere unless
    ``$``-anchored."""
    ends = p.endswith("$")
    body = F.when(ends, F.substr(p, F.lit(1), F.length(p) - 1)).otherwise(p)
    esc = F.regexp_replace(body, _META_CLASS, "\\\\$0")
    wild = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(F.lit("^"), wild, F.when(ends, F.lit("$")).otherwise(F.lit("")))


def _rule_matches(path: Column, p: Column) -> Column:
    """Does rule pattern ``p`` match ``path`` (RFC 9309 §2.2.2)?
    Wildcard-free patterns short-circuit to startswith so the common
    case never compiles a regex."""
    has_wild = p.contains("*") | p.endswith("$")
    return F.when(has_wild, F.rlike(path, rule_regex_col(p))).otherwise(
        path.startswith(p)
    )


def _longest_match(path: Column, patterns: Column) -> Column:
    """Octet length of the most specific (longest) pattern matching
    ``path`` (0 if none) — RFC 9309 §2.2.2 picks the match with the
    most octets."""
    matching = F.filter(patterns, lambda p: _rule_matches(path, p))
    return F.aggregate(
        matching, F.lit(0), lambda acc, p: F.greatest(acc, F.octet_length(p))
    )


def select_agent_rules(robots: DataFrame, user_agent: str = "usasearch") -> DataFrame:
    """One rule row per domain: the specific UA's row if present, else '*'.

    min_by on specificity keeps the plan a single aggregate over the tiny
    table (no self-join)."""
    pref = F.when(F.col("user_agent") == user_agent, 0).when(F.col("user_agent") == "*", 1).otherwise(2)
    packed = F.struct(
        F.col("allow_prefixes"), F.col("disallow_prefixes"), F.col("crawl_delay"), F.col("sitemap_urls")
    )
    return (
        robots.filter(F.col("user_agent").isin(user_agent, "*"))
        .groupBy("domain")
        .agg(F.min_by(packed, pref).alias("_r"))
        .select("domain", "_r.allow_prefixes", "_r.disallow_prefixes", "_r.crawl_delay", "_r.sitemap_urls")
    )


def robots_allowed_col(path: Column, allow_prefixes: Column, disallow_prefixes: Column) -> Column:
    allow_len = _longest_match(path, F.coalesce(allow_prefixes, F.array().cast("array<string>")))
    deny_len = _longest_match(path, F.coalesce(disallow_prefixes, F.array().cast("array<string>")))
    return (deny_len == 0) | (allow_len >= deny_len)


def apply_robots(
    candidates: DataFrame,
    robots: DataFrame,
    user_agent: str = "usasearch",
    host_col: str | None = None,
) -> DataFrame:
    """Drop candidates disallowed by their domain's robots rules and attach
    ``crawl_delay`` (politeness floor). Missing robots row ⇒ allowed, null
    delay."""
    rules = select_agent_rules(robots, user_agent)
    host = F.col(host_col) if host_col else url_host_col("url")
    joined = candidates.withColumn("_host", host).join(
        F.broadcast(rules.withColumnRenamed("domain", "_host")), "_host", "left"
    )
    allowed = robots_allowed_col(url_path_col("url"), F.col("allow_prefixes"), F.col("disallow_prefixes"))
    return (
        joined.filter(F.col("allow_prefixes").isNull() | allowed)
        .drop("_host", "allow_prefixes", "disallow_prefixes", "sitemap_urls")
    )
