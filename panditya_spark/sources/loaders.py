"""Sources: driver testdata parquet + reference-shaped CSV ingestion.

Mirrors the reference's scan surface (SURVEY.md §2.1 S1-S5):
  - S1/S2/S3 all-string CSV scans (reference reads with dtype=str,
    utils/extract.py:15-18) → spark.read.csv with header, everything
    left as StringType.
  - S4/S5 JSON maps → here re-expressed as normalized DataFrames.
  - Testdata parquet: plain spark.read.parquet; column pruning and
    predicate pushdown reach the scan via Catalyst, so loaders never
    pre-select.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Kept as a bare parquet scan so that
    Catalyst pushes filters/projections from downstream operators into
    the file scan (check .explain() for PushedFilters / ReadSchema).

    events.ts is TIMESTAMP(NANOS) in the files, which vanilla Spark
    rejects; we read it as long (legacy nanosAsLong conf, set in
    ensure_session_defaults) and truncate to microseconds — the same
    ns→µs truncation DuckDB applies."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def read_csv_all_string(spark: SparkSession, path: str) -> DataFrame:
    """S1-style scan: header row, every column StringType (no inference),
    matching the reference's pandas read_csv(dtype=str) semantics
    (utils/extract.py:15-18). Multiline quoted fields are enabled because
    the SETI master CSV embeds newlines inside quoted Work ID cells
    (split on [,\\r\\n]+ at transform.py:223)."""
    return (
        spark.read.option("header", True)
        .option("inferSchema", False)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )
