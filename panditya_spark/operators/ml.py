"""Model-based quality filtering (spec extension): train a logistic
quality classifier from heuristic labels, score the corpus at scale —
the bootstrap pattern modern LLM data pipelines use (a classifier
trained on curated-vs-crawl labels generalizes past the hand rules
that seeded it; cf. the GPT-3 / CCNet-style curation step).

Built on pyspark.ml (public Spark MLlib): VectorAssembler feeds an
LBFGS LogisticRegression — training is a handful of distributed
gradient/tree aggregations over the feature table, scoring is one
map-only transform. Both ends are DataFrames; nothing leaves the JVM
except the final coefficient vector (driver-size by definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUALITY_FEATURES = ["n_words", "mean_word_len", "stop_ratio", "punct_ratio"]


def quality_feature_frame(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The classifier's feature set, all builtin column expressions
    (JVM, map-only): word count, mean word length, stopword ratio,
    punctuation density."""
    from panditya_spark.operators.text import (
        LANG_MARKERS,
        punct_count,
        stopword_ratio,
        word_count,
    )

    text = F.col(text_col)
    n_words = word_count(text)
    return docs.select(
        F.col(id_col),
        n_words.cast("double").alias("n_words"),
        F.when(
            n_words > 0,
            F.length(F.regexp_replace(text, r"\s+", "")).cast("double") / n_words,
        )
        .otherwise(F.lit(0.0))
        .alias("mean_word_len"),
        stopword_ratio(text, LANG_MARKERS["en"]).alias("stop_ratio"),
        F.when(
            F.length(text) > 0,
            punct_count(text).cast("double") / F.length(text),
        )
        .otherwise(F.lit(0.0))
        .alias("punct_ratio"),
    )


def train_quality_classifier(
    features: DataFrame, label_col: str, max_iter: int = 25
):
    """Fit the logistic model. Deterministic for fixed input: LBFGS
    from a zero initial vector with no sampling or seed-dependent
    step. Returns the fitted PipelineModel. ``max_iter`` trades fit
    tightness for LBFGS aggregation rounds — the separation-flag
    driver twin runs a shorter budget (the sign of the separation is
    settled within a few iterations; only calibrated probabilities
    need the full budget)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=QUALITY_FEATURES, outputCol="raw_features"),
            StandardScaler(
                inputCol="raw_features", outputCol="features", withMean=True
            ),
            LogisticRegression(
                featuresCol="features",
                labelCol=label_col,
                maxIter=max_iter,
                regParam=0.01,
            ),
        ]
    )
    model = pipe.fit(features)
    _strip_training_summary(model.stages[-1])
    return model


def _strip_training_summary(lr_model) -> None:
    """Drop the fitted model's training summary before scoring.

    The summary holds the predictions DataFrame, which holds the
    SparkSession; scoring serializes the model into the task closure
    (Java serialization walks `trainingSummary`, it is not transient),
    so the session rides along. That worked by accident until any
    `observe()` call in the session initializes the session's lazy
    `ObservationManager` — a non-serializable field — after which
    every scoring action dies with "Task not serializable" (found in
    r16 when the iterative-loop fixpoint probes moved to observe()).
    Nothing here reads the summary, so drop it: reflection clears the
    field in-place (0 ms); if the JVM refuses (a future Spark renaming
    the field), a model save/load round trip — which never persists
    summaries — is the public-API fallback.
    """
    try:
        jm = lr_model._java_obj
        fld = jm.getClass().getDeclaredField("trainingSummary")
        fld.setAccessible(True)
        from pyspark import SparkContext

        fld.set(jm, SparkContext._active_spark_context._jvm.scala.Option.empty())
    except Exception:
        import shutil
        import tempfile

        from pyspark.ml.classification import LogisticRegressionModel

        d = tempfile.mkdtemp(prefix="lr_strip_")
        try:
            lr_model.write().overwrite().save(d)
            lr_model._java_obj = LogisticRegressionModel.load(d)._java_obj
        finally:
            shutil.rmtree(d, ignore_errors=True)


def score_quality(model, features: DataFrame, id_col: str) -> DataFrame:
    """Score a feature frame: (id, quality_prob, keep). The transform
    is map-only — at 100 TB the classifier is a broadcast coefficient
    vector applied in one scan pass."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(features)
    return scored.select(
        F.col(id_col),
        F.round(vector_to_array("probability")[1], 6).alias("quality_prob"),
        F.col("prediction").cast("int").alias("keep"),
    )


# ------------------------------------------------------- per-group fitting
def group_trend(
    df: DataFrame, key_cols: list[str], x_col: str, y_col: str
) -> DataFrame:
    """Per-group OLS line fit via grouped-map applyInPandas — the
    "one small model per key" pattern (per-domain trend, per-tenant
    seasonality, per-sensor calibration) that a pure SQL aggregate
    can't express once the per-group math outgrows closed-form
    aggregates. Each group's rows land in one pandas frame (Arrow
    batch); the fit is closed-form OLS in NumPy. Per-group output is
    one row, so shuffle volume is the input once and the result is
    dimension-table sized.

    At 100 TB the contract is: groups must fit in executor memory
    (here: one row per day per key — thousands of rows, not the raw
    log). Aggregate FIRST (JVM-side), model per group SECOND — the
    registered query demonstrates exactly that order.

    Returns key_cols + (slope, intercept, n, r2). Simple-regression
    agreement with Spark's builtin regr_slope/regr_intercept is pinned
    by pytest to 1e-9 — the builtin covers plain lines; grouped-map is
    the escape hatch when it stops being a line.
    """
    import numpy as np  # noqa: F401 (resolved in the worker closure)

    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema
        if f.name in key_cols
    )
    schema = f"{key_fields}, slope double, intercept double, n long, r2 double"

    def fit(pdf):
        import numpy as np
        import pandas as pd

        x = pdf[x_col].to_numpy(dtype=float)
        y = pdf[y_col].to_numpy(dtype=float)
        xm, ym = x.mean(), y.mean()
        sxx = float(((x - xm) ** 2).sum())
        sxy = float(((x - xm) * (y - ym)).sum())
        slope = sxy / sxx if sxx > 0 else 0.0
        intercept = ym - slope * xm
        ss_tot = float(((y - ym) ** 2).sum())
        ss_res = float(((y - (slope * x + intercept)) ** 2).sum())
        r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 1.0
        row = [pdf[k].iloc[0] for k in key_cols] + [
            slope,
            intercept,
            len(pdf),
            r2,
        ]
        return pd.DataFrame([row], columns=key_cols + ["slope", "intercept", "n", "r2"])

    return df.groupBy(*key_cols).applyInPandas(fit, schema)
