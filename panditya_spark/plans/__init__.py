"""Query registry: every operator from SURVEY.md §2 is declared here as a
named (spark, sf_dir) -> DataFrame callable plus (where SQL-expressible)
a DuckDB oracle. Importing this package populates the registry."""

from panditya_spark.plans.registry import ORACLES, QUERIES, register

# Import for registration side effects.
from panditya_spark.plans import relational_queries  # noqa: E402,F401
from panditya_spark.plans import graph_queries  # noqa: E402,F401
from panditya_spark.plans import data_pipeline_queries  # noqa: E402,F401
from panditya_spark.plans import serving_queries  # noqa: E402,F401
from panditya_spark.plans import streaming_queries  # noqa: E402,F401
from panditya_spark.plans import multimodal_queries  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register"]
