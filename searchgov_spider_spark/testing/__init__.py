"""Deterministic synthetic fixtures: page link-graph, seeds, robots, and a
pure-Python crawl simulator that serves as the golden oracle for the Spark
crawl engine (the analog of the reference's recorded-HTTP-cache e2e tests)."""
