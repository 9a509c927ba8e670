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


# ----------------------------------------------- importance resampling
def importance_select(
    docs: DataFrame,
    target_filter: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets_prefix: int = 2,
) -> DataFrame:
    """DSIR-style importance selection (Xie et al. 2023: hashed n-gram
    features, target-vs-raw importance ratio) with an INTEGER-EXACT
    evidence surrogate so a SQL oracle can value-check it to the bit.

    Features are hashed word buckets: bucket = the first
    ``n_buckets_prefix`` hex chars of md5(word) (256 buckets at 2 —
    the same engine-portable hash family as deterministic_sample).
    Per bucket, count token occurrences in the target slice and in the
    full raw corpus; per document, sum those bucket counts over its
    tokens:

        tgt_evidence(d) = Σ_{w ∈ d} tgt_count[bucket(w)]
        raw_evidence(d) = Σ_{w ∈ d} raw_count[bucket(w)]

    A document leans toward the target distribution when its
    NORMALIZED target evidence exceeds its normalized raw evidence;
    the float-free comparison is the cross-multiplication

        tgt_evidence · total_raw  >=  raw_evidence · total_tgt

    (exactly the sign of the log-importance-weight under a linear —
    rather than log — bucket score; the log-weighted variant is the
    bigram-LM operator's territory). Products go through DECIMAL(38,0)
    so 100 TB-scale token counts cannot wrap int64.

    Scale shape: one explode+groupBy for bucket counts (map-side
    combinable, 256-row result), broadcast back onto the token stream,
    one per-doc sum — no all-pairs, no driver state. Returns
    (id, tgt_evidence, raw_evidence, keep).
    """
    from panditya_spark.operators.text import _plain_words

    toks = docs.select(
        F.col(id_col),
        F.explode(_plain_words(F.col(text_col))).alias("w"),
    ).select(
        id_col, F.substring(F.md5("w"), 1, n_buckets_prefix).alias("bucket")
    )
    tgt_ids = docs.filter(target_filter).select(id_col)
    tgt_counts = (
        toks.join(tgt_ids, id_col, "semi")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("tgt_cnt"))
    )
    raw_counts = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("raw_cnt")
    )
    buckets = raw_counts.join(tgt_counts, "bucket", "left").select(
        "bucket",
        F.coalesce("tgt_cnt", F.lit(0)).alias("tgt_cnt"),
        "raw_cnt",
    )
    totals = buckets.agg(
        F.sum("tgt_cnt").alias("total_tgt"), F.sum("raw_cnt").alias("total_raw")
    )
    evid = (
        toks.join(F.broadcast(buckets), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("tgt_cnt").alias("tgt_evidence"),
            F.sum("raw_cnt").alias("raw_evidence"),
        )
    )
    dec = "decimal(38,0)"
    return evid.crossJoin(F.broadcast(totals)).select(
        id_col,
        "tgt_evidence",
        "raw_evidence",
        (
            F.col("tgt_evidence").cast(dec) * F.col("total_raw").cast(dec)
            >= F.col("raw_evidence").cast(dec) * F.col("total_tgt").cast(dec)
        )
        .cast("int")
        .alias("keep"),
    )


def token_budget_allocation(
    groups: DataFrame,
    group_col: str,
    tokens_col: str,
    weight_col: str,
    total_budget_col: str = "total_budget",
    max_epochs: int = 1,
) -> DataFrame:
    """Token-budget mixture allocation — the data-mixing planning step
    of a training pipeline (the DoReMi/Pile-style "how many tokens of
    each source does this run consume" decision): given per-group
    available token counts and integer mixture weights, split an
    integer token budget proportionally to the weights, cap every
    group at ``max_epochs`` passes over its own data, and hand the
    capped groups' surplus to the uncapped groups in a second
    proportional round (two-round water-filling; any residual after
    round two is reported in ``unallocated`` rather than silently
    over-assigned — exact water-filling is a <=n_groups-round
    fixpoint, and two rounds is the documented planning contract).

    ALL arithmetic is BIGINT with integral DIV (never float shares,
    never double division — exact past 2^53), so the allocation is
    engine-exact and oracle-checkable at any corpus size.

    Input: one row per group with (group, tokens, weight,
    total_budget) — total_budget is a column so callers can derive it
    from the corpus itself in the same plan (e.g. "one corpus pass").
    Scale shape: everything after the caller's per-group aggregate
    runs on an n_groups-row frame — two 1-row aggregates broadcast
    back via crossJoin, no shuffle larger than the group list.

    Returns (group, avail_tokens, weight, cap_tokens, alloc_tokens,
    epochs_micro, unallocated) with epochs_micro = allocated epochs at
    1e-6 scale and unallocated the same global residual on every row.
    """
    g = groups.select(
        F.col(group_col).alias("grp"),
        F.col(tokens_col).cast("bigint").alias("avail"),
        F.col(weight_col).cast("bigint").alias("w"),
        F.col(total_budget_col).cast("bigint").alias("budget"),
    )
    tot_w = g.agg(
        F.sum("w").alias("w_total"),
        F.min("w").alias("w_min"),
        # sum()/min() SKIP nulls, so a NULL weight (including a failed
        # cast of a dirty string) would sail through the positivity
        # check while its r1 = budget * NULL DIV w_total is NULL and
        # null-skipping least(cap, NULL) grants the FULL capacity,
        # driving the leftover pool (and sibling allocations) negative.
        # Count the nulls explicitly so they hit the guard too.
        (F.count(F.lit(1)) - F.count("w")).alias("w_nulls"),
    )
    # Degenerate weights must fail LOUDLY: w_total is the round-1
    # divisor, and DIV by zero/NULL yields NULL, which Spark's
    # null-skipping least() would silently turn into r1 = cap — every
    # group allocated its full capacity. The guard lives INSIDE the
    # divisor expression so column pruning can never drop it.
    guarded_total = (
        "CASE WHEN w_total > 0 AND w_min >= 0 AND w_nulls = 0 THEN w_total "
        "ELSE raise_error('token_budget_allocation: weights must be "
        "non-NULL, >= 0, with a positive total') END"
    )
    round1 = (
        g.crossJoin(F.broadcast(tot_w))
        .withColumn("cap", F.col("avail") * max_epochs)
        .withColumn("r1", F.expr(f"least(cap, budget * w DIV ({guarded_total}))"))
        .withColumn("capped", (F.col("r1") >= F.col("cap")).cast("int"))
    )
    leftovers = round1.agg(
        (F.max("budget") - F.sum("r1")).alias("leftover"),
        F.sum(F.when(F.col("capped") == 0, F.col("w")).otherwise(F.lit(0))).alias(
            "w_uncapped"
        ),
    )
    alloc = (
        round1.crossJoin(F.broadcast(leftovers))
        .withColumn(
            "r2",
            F.expr(
                # greatest(0, leftover): belt-and-braces — if any
                # future degenerate input ever slips past the guard and
                # drives the pool negative, round 2 must grant nothing
                # rather than emit NEGATIVE allocations.
                "CASE WHEN capped = 0 AND w_uncapped > 0 "
                "THEN least(cap - r1, greatest(CAST(0 AS BIGINT), leftover) "
                "* w DIV w_uncapped) "
                "ELSE CAST(0 AS BIGINT) END"
            ),
        )
        .withColumn("alloc", F.col("r1") + F.col("r2"))
    )
    residual = alloc.agg((F.max("leftover") - F.sum("r2")).alias("unallocated"))
    return alloc.crossJoin(F.broadcast(residual)).select(
        F.col("grp"),
        F.col("avail").alias("avail_tokens"),
        F.col("w").alias("weight"),
        F.col("cap").alias("cap_tokens"),
        F.col("alloc").alias("alloc_tokens"),
        F.expr(
            "CASE WHEN avail > 0 THEN alloc * 1000000 DIV avail "
            "ELSE CAST(0 AS BIGINT) END"
        ).alias("epochs_micro"),
        F.col("unallocated").cast("bigint").alias("unallocated"),
    )
