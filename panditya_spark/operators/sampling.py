"""Deterministic sampling operators for training-data pipelines (spec
extension; absent from the reference — its corpus fits in RAM).

Reproducibility is the design constraint: a training subset must be
re-derivable bit-for-bit months later, on any cluster size, so nothing
here uses rand()/TABLESAMPLE (both are partition-layout dependent).
Every decision is a pure function of the row's key:

- deterministic_sample: Bernoulli-style p-fraction keep via a hex-prefix
  compare on md5(key). A per-row projection + filter — pushed to the
  scan, zero shuffle, and identical in any SQL engine (the property the
  DuckDB oracle checks).
- stratified_sample: exactly n rows per stratum, chosen by md5(key)
  order — one shuffle by the strata key (a window row_number), the
  same plan shape as any per-group top-N. Hash-ordering makes the
  selection uniform within the stratum yet stable across runs.

At 100 TB both are single-pass: no count() pre-pass, no driver-side
state, no dependence on spark.sql.shuffle.partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_prefix(key: Column, nchars: int = 2) -> Column:
    """First `nchars` hex chars of md5(key) — a uniform, engine-portable
    bucket label (Spark and DuckDB both emit lowercase-hex md5)."""
    return F.substring(F.md5(key.cast("string")), 1, nchars)


def deterministic_sample(
    df: DataFrame, key_col: str, max_prefix: str = "2a"
) -> DataFrame:
    """Keep rows whose md5(key) 2-hex-char prefix sorts below
    `max_prefix`: fraction ≈ int(max_prefix, 16) / 256 (default '2a' →
    42/256 ≈ 16.4%). Pure filter — no shuffle, no RNG state."""
    return df.filter(hash_prefix(F.col(key_col)) < F.lit(max_prefix))


def in_sample_flag(key: Column, max_prefix: str = "2a") -> Column:
    """The deterministic_sample predicate as an INT column (for marking
    rather than filtering)."""
    return (hash_prefix(key) < F.lit(max_prefix)).cast("int")


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    n_per_stratum: int,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, picked by md5(key)
    order (key as the tiebreak → total order, fully deterministic).
    One row_number window = one shuffle on the strata columns."""
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= n_per_stratum)
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    weights: dict[str, int],
) -> DataFrame:
    """Data-mixing: downsample per-source so the OUTPUT follows the
    target mixture `weights` (integer parts, e.g. {a: 4, b: 3, c: 2,
    d: 1} → 40/30/20/10%), keeping the maximum total that needs no
    upsampling. Sources absent from `weights` are dropped.

    The per-source take t_s is derived with INTEGER arithmetic only —
    cap_s = (n_s * W) div w_s, K = min(cap_s), t_s = (K * w_s) div W,
    W = sum(weights) — because the float version (floor(T * w_s) with
    T = min(n_s / w_s)) rounds differently per engine on values like
    25/0.4 and would break the DuckDB oracle by one row. Rows are
    picked per source by md5(key) order (uniform within source, stable
    across runs and cluster layouts — same contract as
    stratified_sample).

    Scale shape: two tiny aggregates (source counts ⋈ broadcast
    weights → one global min → broadcast back) plus ONE shuffle by
    source for the row_number window. No count() pre-pass on the
    driver, no RNG.
    """
    spark = df.sparkSession
    total_w = sum(weights.values())
    wdf = spark.createDataFrame(
        sorted(weights.items()), [source_col, "w"]
    )
    counts = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(wdf), source_col)
    )
    k = counts.select(
        F.min(F.expr(f"n * {total_w} div w")).alias("k")
    )
    takes = (
        counts.crossJoin(F.broadcast(k))
        .select(source_col, F.expr(f"k * w div {total_w}").alias("take"))
    )
    w_order = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.join(F.broadcast(takes), source_col)
        .withColumn("rn", F.row_number().over(w_order))
        .filter(F.col("rn") <= F.col("take"))
        .drop("rn", "take")
    )
