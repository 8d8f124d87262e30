"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``searchengine_spark.entry_queries``; SQL oracles
are generated from the same constants the Spark operators use.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ensure_pkg_shipped(spark: SparkSession) -> None:
    # pandas UDFs need the package importable on executors
    from searchengine_spark.session import _ship_package

    try:
        _ship_package(spark)
    except Exception:
        pass  # already added, or local-only session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-20 over sf0.001 documents."""
    from searchengine_spark.entry_queries import ft_bm25_top20

    _ensure_pkg_shipped(spark)
    return ft_bm25_top20(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from searchengine_spark.entry_queries import QUERIES

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_pkg_shipped(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from searchengine_spark.entry_queries import ORACLES

    return dict(ORACLES)
