"""Partitioning strategies for 100 TB-scale joins (scale extension; no
reference counterpart — the reference joins pandas frames in memory,
e.g. transform.py's entity merges, so THESE operators are where the
Spark engine earns the scale-up).

Two named strategies, each with an explain-verified test:

- Bucketed co-located join: both tables are written bucketed (and
  sorted) by the join key, so a later sort-merge join needs NO Exchange
  on either side — at 100 TB this turns every repeated fact⋈fact join
  on the same key into a zero-shuffle merge. This is the "pre-shuffle
  once, join forever" pattern; the bucket count is chosen once per
  table (rows / target_rows_per_bucket) and must match across tables
  being co-joined.

- Salted skew join: a hot key (one nation owning half the customers,
  one document id duplicated a million times) makes one shuffle
  partition the straggler. Salting splits every hot key into
  `n_salts` synthetic sub-keys: the large side scatters rows across
  salts deterministically, the small side replicates each row to ALL
  salts, and the join key becomes (key, salt) — the hot key's rows now
  land on n_salts partitions instead of one. Result is exactly the
  plain inner join (small-side replication guarantees every pair still
  meets). AQE's skew-join splitting (enabled in session defaults)
  handles moderate skew automatically; explicit salting is for the
  pathological keys AQE can't subdivide, e.g. a single key larger than
  an executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bucketed_write(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist `df` as a bucketed+sorted table (external when `path` is
    given). On a cluster the warehouse is object storage and this is the
    one full shuffle the dataset ever pays for this key; every later
    join/aggregate on `bucket_cols` between same-bucketed tables is
    Exchange-free."""
    w = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching
    bucket counts Spark plans a sort-merge join whose both sides read
    pre-bucketed files — zero Exchange (asserted by the plan-shape
    test)."""
    return spark.table(left_table).join(spark.table(right_table), on)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join, exactly equal to big.join(small, on).

    The big side's salt is a deterministic hash of the whole row (plus
    the key), so reruns shuffle identically; the small side explodes to
    every salt value. Only inner and left joins are supported — for a
    right/full join the replicated small side would need de-dup of its
    unmatched rows.
    """
    assert how in ("inner", "left"), "salted_join supports inner/left only"
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return b.join(s, [on, "_salt"], how).drop("_salt")


def top_skewed_keys(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """(key, cnt) for the `top_n` heaviest keys — the diagnostic that
    decides whether a join needs salting. One map-side-combinable
    aggregate; at scale this is the profile step a pipeline runs before
    choosing the join strategy."""
    return (
        df.groupBy(F.col(key))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.col(key))
        .limit(top_n)
    )


# ------------------------------------------------------ z-order clustering
def morton_code(x, y, bits: int = 8):
    """Interleave the low ``bits`` bits of two bucket ordinals into a
    Morton (Z-curve) value: x occupies even bit positions, y odd. Pure
    bitwise column arithmetic — whole-stage codegen, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_write(
    df: DataFrame,
    col_x: str,
    col_y: str,
    path: str,
    bits: int = 8,
    n_files: int = 16,
) -> None:
    """Write ``df`` clustered along a 2-D Z-curve over (col_x, col_y) —
    the multi-dimensional data-skipping layout (Delta OPTIMIZE ZORDER
    BY / Hudi clustering): a range predicate on EITHER column now maps
    to a bounded set of z-ranges, so file/row-group min-max stats prune
    both dimensions, where a linear sort prunes only its leading
    column.

    Scale shape: bucket ordinals come from ONE min/max aggregate +
    width_bucket (equal-width histogram — no global sort, no sampled
    ntile), the Morton interleave is bitwise column math, and the
    layout is repartitionByRange(z) + sortWithinPartitions(z): exactly
    one range shuffle, the same cost as any clustered write. Both
    columns must be numeric-orderable (cast dates to days first).
    """
    lo_x, hi_x, lo_y, hi_y = [
        float(v)
        for v in df.agg(
            F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
        ).first()
    ]
    nb = 1 << bits
    # width_bucket returns 1..nb+1 (hi lands in nb+1); clamp to 0..nb-1.
    bx = F.least(
        F.lit(nb - 1),
        F.width_bucket(F.col(col_x), F.lit(lo_x), F.lit(hi_x), F.lit(nb)) - 1,
    ).cast("long")
    by = F.least(
        F.lit(nb - 1),
        F.width_bucket(F.col(col_y), F.lit(lo_y), F.lit(hi_y), F.lit(nb)) - 1,
    ).cast("long")
    (
        df.withColumn("_z", morton_code(bx, by, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
