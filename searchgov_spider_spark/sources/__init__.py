"""Sources: seed configs, page fetchers (table-replay + HTTP), sitemaps, state."""

from .crawl_sites import CrawlSite, CrawlSites, validate_crontab  # noqa: F401
