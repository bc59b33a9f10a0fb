"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl-wave scheduling plan on
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator family (SURVEY.md §2 + corpus pipelines) with DuckDB oracles.
Implementations live in ``searchgov_spider_spark/driver_queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# Python workers resolve the package via PYTHONPATH (set before the JVM
# starts); required when the driver process runs from another cwd.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from searchgov_spider_spark import driver_queries as dq  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: politeness-budgeted crawl-wave scheduling (salted two-phase
    top-k over the frontier) + seen-set dedup on sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    scheduled = dq.q_frontier_schedule(spark, sf_dir)
    return scheduled


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dq.queries()


def oracle_sql() -> dict[str, str]:
    return dq.oracle_sql()
