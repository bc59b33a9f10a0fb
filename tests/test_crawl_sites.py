"""Crawl-sites config validation (sources/crawl_sites.py) — mirrors the
reference's tests/search_gov_spiders/test_crawl_sites.py behavior table,
plus the Spark boundary (to_seeds_df -> normalize_job_rules)."""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

from searchgov_spider_spark.sources.crawl_sites import (
    CrawlSite,
    CrawlSites,
    validate_crontab,
)

REF_DOMAINS = Path("/root/reference/search_gov_crawler/domains")


@pytest.fixture(name="base_args")
def fixture_base_args() -> dict:
    return {
        "name": "test",
        "allow_query_string": True,
        "allowed_domains": "example.com",
        "handle_javascript": False,
        "output_target": "csv",
        "starting_urls": "https://www.example.com",
        "depth_limit": 3,
    }


@pytest.mark.parametrize(
    "optional",
    [{}, {"schedule": None}, {"schedule": "* * * 1 1"},
     {"deny_paths": None}, {"deny_paths": ["/path1/", "/path2/"]}],
)
def test_valid_site(base_args, optional):
    site = CrawlSite(**(base_args | optional))
    assert site.job_id == "test"


def test_job_id_derivation(base_args):
    site = CrawlSite(**(base_args | {"name": "My Test - Site"}))
    assert site.job_id == "my-test-site"


def test_to_dict(base_args):
    site = CrawlSite(**base_args)
    d = site.to_dict(exclude=("name",))
    assert "name" not in d and d["job_id"] == "test" and d["depth_limit"] == 3


@pytest.mark.parametrize(
    "missing", [("name",), ("allow_query_string",), ("handle_javascript", "starting_urls")]
)
def test_missing_fields(base_args, missing):
    args = base_args | {m: None for m in missing}
    match = f"All CrawlSite fields are required!  Add values for {','.join(missing)}"
    with pytest.raises(TypeError, match=re.escape(match)):
        CrawlSite(**args)


@pytest.mark.parametrize(
    ("field", "bad", "log_text", "expected_type"),
    [
        ("name", 123, "type", "str"),
        ("allow_query_string", "string val", "type", "bool"),
        ("allowed_domains", True, "type", "str"),
        ("handle_javascript", 99.99, "type", "bool"),
        ("starting_urls", {"some": "dict"}, "type", "str"),
        ("schedule", True, "one of types", ["str", "NoneType"]),
        ("deny_paths", 10, "one of types", ["list", "NoneType"]),
    ],
)
def test_wrong_types(base_args, field, bad, log_text, expected_type):
    args = base_args | {"schedule": "* * * * *", field: bad}
    match = f"Invalid type! Field {field} with value {bad} must be {log_text} {expected_type}"
    with pytest.raises(TypeError, match=re.escape(match)):
        CrawlSite(**args)


def test_invalid_output_target(base_args):
    with pytest.raises(TypeError, match="Invalid output_target value index!"):
        CrawlSite(**(base_args | {"output_target": "index"}))


def test_duplicate_deny_paths(base_args):
    with pytest.raises(TypeError, match="deny_paths must be unique"):
        CrawlSite(**(base_args | {"deny_paths": ["/dup/", "/dup/"]}))


def test_invalid_cron(base_args):
    with pytest.raises(
        ValueError, match="Invalid cron expression in schedule value: I AM NOT A CRON EXPRESSION"
    ):
        CrawlSite(**(base_args | {"schedule": "I AM NOT A CRON EXPRESSION"}))


@pytest.mark.parametrize(
    ("expr", "ok"),
    [
        ("* * * * *", True),
        ("*/5 0-23 1,15 jan-jun mon", True),
        ("0 12 * * 0-7", True),
        ("60 * * * *", False),     # minute out of range
        ("* 24 * * *", False),     # hour out of range
        ("* * 0 * *", False),      # day starts at 1
        ("* * * * * *", False),    # six fields
        ("*/0 * * * *", False),    # zero step
        ("5-1 * * * *", False),    # inverted range
    ],
)
def test_crontab_matrix(expr, ok):
    if ok:
        validate_crontab(expr)
    else:
        with pytest.raises(ValueError):
            validate_crontab(expr)


def test_duplicate_job_id(base_args):
    a = CrawlSite(**base_args)
    b = CrawlSite(**(base_args | {"allowed_domains": "test.example.com"}))
    with pytest.raises(TypeError, match="Duplicate job_id found"):
        CrawlSites([a, b])


def test_duplicate_domain_per_target(base_args):
    a = CrawlSite(**base_args)
    b = CrawlSite(**(base_args | {"name": "test 2"}))
    with pytest.raises(TypeError, match="allowed_domain and output_target must be unique"):
        CrawlSites([a, b])


def test_scheduled_filter(base_args):
    a = CrawlSite(**base_args)
    b = CrawlSite(
        **(base_args | {
            "name": "another test",
            "allowed_domains": "another.example.com",
            "starting_urls": "https://another.example.com",
            "schedule": "* * * * *",
        })
    )
    assert [s.name for s in CrawlSites([a, b]).scheduled()] == ["another test"]


def test_from_file_and_seeds_df(base_args, tmp_path, spark):
    records = [
        base_args,
        base_args | {
            "name": "js site",
            "allowed_domains": "js.example.com",
            "starting_urls": "https://js.example.com/a,https://js.example.com/b",
            "handle_javascript": True,
            "deny_paths": ["/skip/"],
            "schedule": "15 2 * * *",
        },
    ]
    f = tmp_path / "crawl-sites.json"
    f.write_text(json.dumps(records), encoding="UTF-8")
    sites = CrawlSites.from_file(f)
    assert len(list(sites)) == 2

    from searchgov_spider_spark.operators.filters import normalize_job_rules

    seeds = sites.to_seeds_df(spark)
    rules = normalize_job_rules(seeds)
    got = {r["job"]: r for r in rules.collect()}
    assert set(got) == {"test", "js site"}
    assert got["js site"]["needs_js"] is True
    assert len(got["js site"]["start_urls"]) == 2


def test_crawl_job_boots_from_sites_json(tmp_path, spark):
    """jobs/crawl_job.py --sites: the cluster driver boots straight from the
    reference's config file format (scheduler-entry-point parity, SURVEY §3.2)
    and commits per-wave state."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent / "jobs"))
    import crawl_job

    from searchgov_spider_spark.testing.graph import generate_graph, graph_to_dfs

    graph = generate_graph(n_pages=80, seed=11)
    pages_df, seeds_df, _robots = graph_to_dfs(spark, graph)
    pages_p = str(tmp_path / "pages")
    pages_df.write.parquet(pages_p)
    records = [
        {
            "name": r["name"],
            "allowed_domains": r["allowed_domains"],
            "starting_urls": r["starting_urls"],
            "allow_query_string": r["allow_query_string"],
            "handle_javascript": r["handle_javascript"],
            "output_target": r["output_target"],
            "depth_limit": r["depth_limit"],
            "deny_paths": list(r["deny_paths"]) if r["deny_paths"] else None,
        }
        for r in seeds_df.collect()
    ]
    sites = tmp_path / "crawl-sites.json"
    sites.write_text(json.dumps(records), encoding="UTF-8")

    state = str(tmp_path / "state")
    result = crawl_job.main(
        ["--sites", str(sites), "--pages", pages_p, "--state-dir", state, "--max-waves", "2"]
    )
    assert result.waves and result.waves[0].scheduled > 0
    assert (Path(state) / "frontier").exists() and (Path(state) / "seen").exists()


@pytest.mark.skipif(not REF_DOMAINS.is_dir(), reason="reference repo not present")
@pytest.mark.parametrize(
    "file_name",
    ["crawl-sites-development.json", "crawl-sites-staging.json", "crawl-sites-production.json"],
)
def test_reference_production_files_validate(file_name):
    """The strongest parity check available: the reference's REAL crawl-site
    config files (read-only test input) must pass this validator, and each
    must contain at least one scheduled job — the same assertions the
    reference's own test_crawl_sites_file_is_valid makes."""
    path = REF_DOMAINS / file_name
    if not path.is_file():
        pytest.skip(f"{file_name} not in reference checkout")
    sites = CrawlSites.from_file(path)
    assert len(list(sites.scheduled())) > 0
