"""robots.txt rule evaluation S7 (SURVEY.md §2.1).

The reference sets ROBOTSTXT_OBEY=True (settings.py:31) and delegates to
Scrapy's middleware, which enforces standard robots semantics per host for
UA 'usasearch' (settings.py:28) falling back to '*'. Here rules live in a
small ``robots`` table (FIXTURES.md §4):

    robots(domain, user_agent, allow_prefixes, disallow_prefixes,
           crawl_delay, sitemap_urls)

Evaluation is the standard longest-match rule: among all allow/disallow
prefixes that prefix-match the URL path, the longest wins; ties and no-match
default to allow; a missing robots row allows everything.

Implementation: broadcast join on domain (the robots table is tiny), then
pure higher-order array expressions — F.filter + F.aggregate compute the
longest matching prefix lengths JVM-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urls import url_host_col, url_path_col


def _longest_match(path: Column, prefixes: Column) -> Column:
    """Length of the longest prefix in ``prefixes`` matching ``path`` (0 if none)."""
    matching = F.filter(prefixes, lambda p: path.startswith(p))
    return F.aggregate(matching, F.lit(0), lambda acc, p: F.greatest(acc, F.length(p)))


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
