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
from pyspark.sql import functions as F

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

    events.ts has changed physical type across testdata generations:
    TIMESTAMP(NANOS) (arrives as long under the legacy nanosAsLong
    conf; truncated to micros like DuckDB does) and TIMESTAMP(MICROS,
    isAdjustedToUTC=false) (arrives as TIMESTAMP_NTZ unless
    inferTimestampNTZ is disabled; cast to TIMESTAMP — identical
    instants since the session tz is UTC). Both shapes are normalized
    HERE, by schema, so downstream watermarks/unix_micros always see
    plain TimestampType regardless of which conf stuck."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to plain TimestampType from any of
    the physical shapes the driver testdata has shipped: long nanos
    (legacy nanosAsLong read of TIMESTAMP(NANOS)) or TIMESTAMP_NTZ
    (TIMESTAMP_MICROS isAdjustedToUTC=0). The UTC session timezone makes
    the NTZ cast instant-preserving and DuckDB-identical."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dtype = df.schema[col].dataType
    if isinstance(dtype, LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dtype, TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def table_row_count(sf_dir: str, name: str) -> int | None:
    """Exact row count from the parquet footer — pure driver-side
    metadata, no Spark job. Used to route size-gated operators (e.g.
    cosine_near_pairs exact-vs-LSH) without paying a count() scan.
    Returns None when the file is missing/unreadable (caller falls back
    to counting)."""
    try:
        import pyarrow.parquet as pq

        return pq.ParquetFile(os.path.join(sf_dir, f"{name}.parquet")).metadata.num_rows
    except Exception:
        return None


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


def read_json_with_quarantine(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Schema-enforced JSON ingestion with bad-record QUARANTINE — the
    ingest pattern a production pipeline needs before anything else
    touches the data: PERMISSIVE mode routes unparseable lines into
    the corrupt-record column instead of failing the job (or silently
    dropping rows, DROPMALFORMED's failure mode). Returns (good, bad):
    good rows with the declared schema, bad rows as (raw_line) for a
    quarantine sink + replay.

    The corrupt column must be declared IN the read schema (Spark
    populates it only when asked), and a plan over the RAW relation
    that references only the corrupt column is rejected by Spark
    (SPARK-21610) — the parsed frame is materialized first (eager
    localCheckpoint), which satisfies the restriction, makes the two
    splits share one parse, AND lets the ContextCleaner reclaim the
    blocks when the splits are dropped (a cache() here would leak one
    pinned relation per invocation for the session lifetime).
    """
    full_schema = schema + ", _corrupt string"
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
        .localCheckpoint(eager=True)
    )
    good = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = df.filter(F.col("_corrupt").isNotNull()).select(
        F.col("_corrupt").alias("raw_line")
    )
    return good, bad
