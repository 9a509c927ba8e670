"""Data-quality constraint checking (Deequ/Great-Expectations-style;
training-pipeline extension — the validation gate a corpus passes
before a training run is launched).

A constraint suite compiles to ONE conditional-count aggregate over the
table (every check is a ``sum(case when violated)``), plus one
anti-join per referential constraint — so a 100-constraint suite on a
100 TB table costs a single scan, not 100 jobs. Results are integer
violation counts: engine-exact, oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_not_null(col: str) -> tuple[str, Column]:
    return f"not_null({col})", F.col(col).isNull()


def check_range(col: str, lo, hi) -> tuple[str, Column]:
    return (
        f"range({col},{lo},{hi})",
        F.col(col).isNull() | ~F.col(col).between(lo, hi),
    )


def check_in_set(col: str, values: list) -> tuple[str, Column]:
    return (
        f"in_set({col})",
        F.col(col).isNull() | ~F.col(col).isin(values),
    )


def check_pattern(col: str, regex: str, name: str | None = None) -> tuple[str, Column]:
    return (
        name or f"pattern({col})",
        F.col(col).isNull() | ~F.col(col).rlike(regex),
    )


def _conditional_counts(df: DataFrame, checks: list[tuple[str, Column]]) -> DataFrame:
    """The one-scan conditional-count aggregate the whole suite rides
    on — exposed unexecuted so scripts/explain_audit.py can gate its
    plan shape (single Exchange, map-side partial aggregation).
    coalesce: SUM over zero rows is NULL — an empty input has zero
    violations, not a crash. Positional aliases (c0, c1, …) tolerate
    duplicate constraint names instead of silently reporting one count
    for both."""
    aggs = [
        F.coalesce(F.sum(F.when(pred, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias(f"c{i}")
        for i, (_, pred) in enumerate(checks)
    ]
    return df.agg(*aggs)


def constraint_report(
    df: DataFrame,
    checks: list[tuple[str, Column]],
    unique_keys: list[list[str]] | None = None,
    references: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Evaluate a constraint suite; returns one row per constraint:
    (constraint_name, n_violations, satisfied).

    - ``checks``: (name, violation_predicate) pairs — ALL evaluated in
      one conditional-count aggregate (single scan, map-side partial).
    - ``unique_keys``: each key list adds a uniqueness constraint,
      counted as rows beyond the first per duplicate key group — one
      hash aggregate each.
    - ``references``: (fk_col, dim_df, pk_col) adds referential
      integrity, counted via left-anti join (null FKs are counted by
      their own not_null check if desired, not here — SQL FK
      semantics: null references are not violations).
    """
    spark = df.sparkSession
    results: list[tuple[str, int]] = []
    if checks:
        row = _conditional_counts(df, checks).first()
        results = [(name, row[i]) for i, (name, _) in enumerate(checks)]

    for keys in unique_keys or []:
        dup = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
                .cast("bigint")
                .alias("v")
            )
            .first()["v"]
        )
        results.append((f"unique({','.join(keys)})", dup))

    for fk, dim, pk in references or []:
        orphans = (
            df.filter(F.col(fk).isNotNull())
            .join(
                dim.select(F.col(pk).alias(fk)).distinct(),
                fk,
                "left_anti",
            )
            .count()
        )
        results.append((f"ref({fk}->{pk})", orphans))

    return spark.createDataFrame(
        [(name, int(v), int(v == 0)) for name, v in results],
        ["constraint_name", "n_violations", "satisfied"],
    )
