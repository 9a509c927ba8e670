"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in panditya_spark/; the query inventory is the
registry populated by panditya_spark.plans (one entry per implemented
operator from SURVEY.md §2 plus the data-pipeline extensions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's signature operation — a k-hop BFS
    subgraph (grapher.py:25-94) — run on the sf0.001 key-chain graph."""
    from panditya_spark.plans import QUERIES

    return QUERIES["g1_khop_bfs"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from panditya_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from panditya_spark.plans import ORACLES

    return dict(ORACLES)
