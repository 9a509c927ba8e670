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
    # r16 (guide §1.2/§2.6): the suite used to run one DRIVER ACTION
    # per constraint family — conditional-count first(), a first() per
    # unique key, a count() per reference — then re-created a local
    # DataFrame from the collected scalars. Serial actions pay the
    # per-job driver fixed cost once EACH (measured ~2s of driver gap
    # on a 3-action suite at sf0.1) and serialize stages that share no
    # data. All legs now union into ONE lazy plan: a single action
    # computes every constraint with the independent scans scheduled
    # together, and nothing is collected to the driver at all.
    spark = df.sparkSession
    legs: list[DataFrame] = []
    if checks:
        kvs = F.array(
            *[
                F.struct(
                    F.lit(name).alias("constraint_name"),
                    F.col(f"c{i}").alias("n_violations"),
                )
                for i, (name, _) in enumerate(checks)
            ]
        )
        legs.append(
            _conditional_counts(df, checks)
            .select(F.explode(kvs).alias("kv"))
            .select("kv.constraint_name", "kv.n_violations")
        )

    for keys in unique_keys or []:
        legs.append(
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
                .cast("bigint")
                .alias("n_violations")
            )
            .select(
                F.lit(f"unique({','.join(keys)})").alias("constraint_name"),
                "n_violations",
            )
        )

    for fk, dim, pk in references or []:
        legs.append(
            df.filter(F.col(fk).isNotNull())
            .join(
                dim.select(F.col(pk).alias(fk)).distinct(),
                fk,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
            .select(
                F.lit(f"ref({fk}->{pk})").alias("constraint_name"),
                "n_violations",
            )
        )

    if not legs:
        return spark.createDataFrame(
            [],
            "constraint_name string, n_violations bigint, satisfied bigint",
        )
    report = legs[0]
    for leg in legs[1:]:
        report = report.unionByName(leg)
    # satisfied mirrors the former int(v == 0) → LongType exactly.
    return report.withColumn(
        "satisfied", (F.col("n_violations") == 0).cast("bigint")
    )
