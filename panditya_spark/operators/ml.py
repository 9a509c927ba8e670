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


def train_quality_classifier(features: DataFrame, label_col: str):
    """Fit the logistic model. Deterministic for fixed input: LBFGS
    from a zero initial vector with no sampling or seed-dependent
    step. Returns the fitted PipelineModel."""
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
                maxIter=25,
                regParam=0.01,
            ),
        ]
    )
    return pipe.fit(features)


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
