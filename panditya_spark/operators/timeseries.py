"""Time-series regularization operators (training-pipeline extensions;
the reference has no time-series surface — SURVEY.md §2.10 class).

Gap filling + interpolation is the canonical "regularize an event
stream onto a fixed grid" step (sensor/metrics pipelines, feature
backfill before windowed training). Everything here is built-in
pyspark.sql functions — sequence/explode for the grid, two analytic
windows for the neighbor lookups — so the whole operator stays inside
whole-stage codegen and scales as one shuffle per series key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gapfill_interpolate(
    series: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Regularize (key, ts, value) onto a dense per-key time grid and
    linearly interpolate interior gaps; edge gaps take the nearest
    observed value (back-/forward-fill).

    Mechanics, chosen for the 100 TB shape:
    - the per-key span aggregation is a tiny one-row-per-key shuffle;
    - the dense grid is ``explode(sequence(lo, hi, step))`` — generated
      executor-side, never materialized on the driver;
    - the grid←observations join and both neighbor windows share the
      same hash partitioning on ``key_col``, so Catalyst runs ONE
      Exchange for the whole operator (join + 2 windows reuse it);
    - neighbor lookup is ``last(ignorenulls)`` over an unbounded-
      preceding ROWS frame (and ``first`` mirrored forward) — O(n) per
      key, no self-join.

    Interpolation arithmetic is written in one fixed operand order
    (``prev + (next - prev) * frac``) so an engine evaluating the same
    IEEE doubles reproduces it bit-for-bit — that is what lets a plain
    SQL oracle value-check the output.
    """
    lo, hi = f"_{val_col}_lo", f"_{val_col}_hi"
    spans = series.groupBy(key_col).agg(
        F.min(ts_col).alias(lo), F.max(ts_col).alias(hi)
    )
    grid = spans.select(
        key_col,
        F.explode(
            F.sequence(F.col(lo), F.col(hi), F.expr(f"INTERVAL {step}"))
        ).alias(ts_col),
    )
    joined = grid.join(series, [key_col, ts_col], "left")

    w_back = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col(val_col)
    t_obs = F.when(v.isNotNull(), F.col(ts_col))
    prev_v = F.last(v, ignorenulls=True).over(w_back)
    prev_t = F.last(t_obs, ignorenulls=True).over(w_back)
    next_v = F.first(v, ignorenulls=True).over(w_fwd)
    next_t = F.first(t_obs, ignorenulls=True).over(w_fwd)
    frac = (
        F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_t)
    ).cast("double") / (
        F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)
    ).cast("double")
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return joined.select(
        key_col,
        ts_col,
        filled.alias(val_col),
        v.isNull().cast("int").alias("is_gap"),
    )


def time_decayed_agg(
    series: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    half_life_hours: float = 24.0,
) -> DataFrame:
    """Exponentially time-decayed feature aggregate per key — the
    recency-weighted activity score feature pipelines derive from an
    event log (each observation weighted by 2^(-age/half_life) relative
    to the key's most recent event):

        score(k) = Σ v_i·w_i / Σ w_i,   w_i = exp(-λ·(T_k - t_i))

    Anchoring the decay at the PER-KEY max timestamp keeps every weight
    in (0, 1] — no exp overflow however old the log — and makes the
    operator incremental-friendly (new data only shifts T_k). Shape:
    one tiny per-key max aggregate joined back (same hash partitioning
    as the final aggregate — Catalyst reuses the Exchange), then one
    map-side-combinable weighted sum. Rows-only registry class: the
    weighted sums are distributed float additions (order-sensitive at
    1e-15); exact semantics are pinned by a Python-mirror pytest.

    Returns (key, n_events, last_ts, decayed_score).
    """
    import math

    lam = math.log(2.0) / (half_life_hours * 3600.0)
    ref = series.groupBy(key_col).agg(F.max(ts_col).alias("_T"))
    j = series.join(ref, key_col)
    age = (
        F.unix_timestamp(F.col("_T")) - F.unix_timestamp(F.col(ts_col))
    ).cast("double")
    w = F.exp(F.lit(-lam) * age)
    v = F.col(val_col)
    return j.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.col(ts_col)).alias("last_ts"),
        (F.sum(v * w) / F.sum(w)).alias("decayed_score"),
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    window_rows: int = 24,
    threshold: float = 3.0,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Rolling z-score anomaly detection per series — the monitoring
    primitive of a metrics pipeline: each point is scored against the
    mean/stddev of the PRECEDING `window_rows` points (strictly
    trailing ROWS frame — the current point never contaminates its own
    baseline, and ROWS not RANGE so same-timestamp peers don't merge;
    see the sessionize ROWS-frame bug class). A point is anomalous
    when |value − mean| > threshold · stddev with a full baseline
    window (early points with fewer than window_rows predecessors are
    never flagged — an unstable stddev over 2 points flags half the
    stream).

    ONE analytic window per series key = one shuffle on the key;
    map-only before and after. Returns (key, time, value, baseline_n,
    is_anomaly) with is_anomaly an INTEGER (engine-exact; the float z
    itself stays internal).

    The mean and stddev are ROUNDED to 6 decimals before the threshold
    comparison: avg/stddev accumulation order differs across engines
    (and partitionings), so a point sitting within one ulp of the
    3-sigma boundary could otherwise flip the integer flag between two
    correct executions. Snapping both statistics to a fixed grid makes
    the comparison operands bit-identical everywhere except the
    measure-zero case of a true value landing within float noise of a
    half-grid point (the same robustness convention as the rounded
    cosine ranks in operators/similarity)."""
    from pyspark.sql.window import Window

    order = [F.col(time_col)] + [
        F.col(c) for c in (order_tiebreak or [])
    ]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-window_rows, -1)
    )
    mean = F.round(F.avg(F.col(value_col)).over(w), 6)
    sd = F.round(F.stddev_samp(F.col(value_col)).over(w), 6)
    n = F.count(F.lit(1)).over(w)
    flag = (
        (n >= window_rows)
        & sd.isNotNull()
        & (F.abs(F.col(value_col) - mean) > F.lit(threshold) * sd)
    )
    return df.select(
        F.col(key_col),
        F.col(time_col),
        F.col(value_col),
        n.cast("bigint").alias("baseline_n"),
        flag.cast("int").alias("is_anomaly"),
    )
