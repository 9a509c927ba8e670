"""SparkSession factory.

Defaults chosen for correctness *and* scale-out behavior:

- AQE on (runtime re-plan: broadcast flips as BFS frontiers shrink,
  skew-join splitting for hub vertices — the reference data has one
  9,049-node component, so degree skew is real).
- Arrow on (pandas UDF / toPandas transfers are columnar batches).
- UTC session timezone so timestamp semantics match DuckDB oracles.
- shuffle partitions sized to the local core count (tests run on
  local[32]); on a real cluster this would be set per-job or left to
  AQE coalescing.
- A checkpoint dir for iterative algorithms (connected components,
  BFS) whose lineage must be cut periodically.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

_CHECKPOINT_DIR: str | None = None


def get_spark(app_name: str = "panditya-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        n = max(int(cpus), 1)
    except ValueError:
        n = 32
    spark = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        # Long-lived sessions (the bench runs 35 queries × reps; a real
        # deployment runs for days) accumulate broadcast/shuffle/RDD
        # state that ContextCleaner only releases on a JVM GC; with a
        # 12 GB heap, organic GC is rare and the block manager creeps
        # ~120 MB per iterative-query rep until execution slows
        # (measured r16: 8 back-to-back g14_scc runs degraded 9.2 →
        # 21.0 s; with a 90 s periodic GC the same loop held 9.0-9.1 s
        # on late reps). Default 30min is tuned for multi-hour cluster
        # jobs; 90 s bounds the creep at a negligible full-GC cost.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "90s"),
        )
        .getOrCreate()
    )
    ensure_session_defaults(spark)
    return spark


def ensure_session_defaults(spark: SparkSession) -> SparkSession:
    """Apply runtime-mutable defaults to *any* session (including one the
    driver hands us): UTC timestamps for oracle parity and a checkpoint
    dir for iterative graph jobs. Static confs (AQE etc.) can't be
    changed post-start, so we only touch runtime confs here."""
    global _CHECKPOINT_DIR
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # The driver's events.parquet timestamp physical type has changed
    # across testdata generations: TIMESTAMP(NANOS) in one, then
    # TIMESTAMP(MICROS, isAdjustedToUTC=false) — which Spark would infer
    # as TIMESTAMP_NTZ, a type withWatermark/unix_micros reject. Both
    # confs below make either shape arrive as something load_table /
    # read_events_stream can normalize to plain TIMESTAMP; the loaders
    # ALSO guard by schema (LongType → timestamp_micros, NTZ → cast), so
    # a conf silently not applying cannot recur as a red round. The
    # session tz is UTC, so NTZ-as-TIMESTAMP matches DuckDB's naive
    # reading instant-for-instant.
    for conf, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
    ):
        try:
            spark.conf.set(conf, val)
        except Exception:
            # Runtime-immutable on some deployments (e.g. Connect with a
            # locked conf); the schema-level guards in the loaders are
            # the real defense — do not mask THEIR failures.
            pass
    try:
        if not spark.sparkContext.getCheckpointDir():
            if _CHECKPOINT_DIR is None:
                _CHECKPOINT_DIR = tempfile.mkdtemp(prefix="panditya-spark-ckpt-")
            spark.sparkContext.setCheckpointDir(_CHECKPOINT_DIR)
    except Exception:
        pass  # Spark Connect sessions have no sparkContext; localCheckpoint fallback
    return spark
