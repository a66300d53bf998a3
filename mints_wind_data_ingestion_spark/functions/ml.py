"""Model-based quality scoring (SURVEY.md §2.11 text surface).

Production corpus curation layers a LEARNED quality scorer on top of
the heuristic signals (the fastText-classifier pattern): train a small
classifier on weak labels, score the whole corpus distributed, filter
on the calibrated probability. This module wires that stage through
pyspark.ml so scoring is a JVM-side transform over the feature
columns — no Python boundary in the hot path once the (tiny) model is
fit.

Scale: training reads only the (sampled) labeled subset; scoring is a
narrow map over the corpus scan — the model broadcast is a handful of
coefficients. The heavy lifting (feature computation) is the same
codegen'd expressions x_text_features uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["train_quality_model", "score_quality"]


def train_quality_model(
    labeled: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    max_iter: int = 50,
):
    """Fit a logistic-regression quality scorer on weak labels.
    Returns (assembler, model) — keep both to score consistently."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    va = VectorAssembler(inputCols=feature_cols, outputCol="__features")
    lr = LogisticRegression(
        featuresCol="__features", labelCol=label_col, maxIter=max_iter
    )
    model = lr.fit(va.transform(labeled))
    return va, model


def score_quality(
    bundle, df: DataFrame, out_col: str = "quality_prob"
) -> DataFrame:
    """Score a corpus with a trained quality model: appends the
    positive-class probability as `out_col`; drops the intermediate
    vector columns."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    va, model = bundle
    scored = model.transform(va.transform(df))
    return scored.withColumn(
        out_col, vector_to_array(F.col(model.getProbabilityCol()))[1]
    ).drop("__features", model.getRawPredictionCol(),
           model.getProbabilityCol(), model.getPredictionCol())
