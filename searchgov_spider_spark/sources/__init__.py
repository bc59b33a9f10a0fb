"""Sources: seed configs, page fetchers (table-replay + HTTP), sitemaps, state."""
