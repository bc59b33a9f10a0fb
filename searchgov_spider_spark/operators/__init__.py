"""Crawl-dataflow operators (SURVEY.md §2), expressed as DataFrame transforms.

Each operator is a function DataFrame -> DataFrame (or a small composition
helper), keeping the logical plan declarative so Catalyst handles pushdown,
pruning and join strategy. Shuffle-bearing operators document their
partitioning contract in the docstring.
"""
