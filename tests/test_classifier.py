"""Linear-probe quality classifier (operators.classifier, r10):
Spark-vs-local exact model parity (the oracle's load-bearing claim),
planted-signal learnability (the optimizer actually optimizes),
degenerate-input safety, and the driver query's accuracy floor."""

from __future__ import annotations

import pytest


def test_spark_and_local_models_bit_identical(spark, sf_dir):
    """The whole oracle strategy rests on this: the Spark trainer and
    the DuckDB-fed pure-Python replica produce EXACTLY equal models
    (same exact-integer sufficient statistics, same GD loop)."""
    from mints_wind_data_ingestion_spark.operators.classifier import (
        linear_probe_local,
        probe_features,
        train_linear_probe,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ms = train_linear_probe(probe_features(docs))
    ml = linear_probe_local(sf_dir)
    assert ms == ml  # n, mu, sigma AND w — floats compared exactly


def test_probe_learns_planted_signal(spark):
    """On a corpus where the label is genuinely linearly predictable
    (stopword-heavy docs are SHORT, clean docs are LONG), the trained
    probe must separate nearly perfectly — pinning that the
    sufficient-statistics + GD machinery optimizes, which the
    near-random driver corpus cannot show."""
    from mints_wind_data_ingestion_spark.operators.classifier import (
        probe_features,
        score_linear_probe,
        train_linear_probe,
    )

    rows = []
    for i in range(120):
        if i % 2:  # stopword-heavy and short → y=1
            rows.append((i, "the and of to a in " + f"w{i} w{i + 1}"))
        else:  # stopword-free and long → y=0
            rows.append((i, " ".join(f"tok{i}x{j}" for j in range(40))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    feats = probe_features(docs)
    out = score_linear_probe(feats, train_linear_probe(feats)).collect()
    assert {r["y"] for r in out} == {0, 1}  # both classes present
    acc = sum(r["pred"] == (r["y"] == 1) for r in out) / len(out)
    assert acc >= 0.95, f"planted-signal accuracy {acc:.2f}"


def test_degenerate_docs_are_safe(spark):
    """Empty / NULL-ish / constant-feature corpora never produce NaN:
    a zero-variance feature standardizes to z = 0 (sigma falls back
    to 1) and empty docs carry all-zero features with label 0."""
    from mints_wind_data_ingestion_spark.operators.classifier import (
        probe_features,
        score_linear_probe,
        train_linear_probe,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, ""), (3, "same same"), (4, "same same")],
        "doc_id long, text string",
    )
    feats = probe_features(docs)
    model = train_linear_probe(feats)
    assert all(s > 0 for s in model["sigma"])
    assert all(w == w for w in model["w"])  # no NaN
    out = score_linear_probe(feats, model).collect()
    assert len(out) == 4
    assert all(r["margin_e6"] is not None for r in out)


def test_driver_query_beats_or_matches_base_rate(spark, sf_dir):
    """x_quality_probe on the graded corpus: accuracy never falls
    below the majority-class base rate (the ridge probe can always
    reach the constant predictor)."""
    from mints_wind_data_ingestion_spark.plans import REGISTRY

    rows = REGISTRY["x_quality_probe"].build(spark, sf_dir).collect()
    n = len(rows)
    pos = sum(r["y"] for r in rows)
    base = max(pos, n - pos) / n
    acc = sum(r["pred"] == (r["y"] == 1) for r in rows) / n
    assert acc >= base - 1e-9, f"acc {acc:.3f} under base {base:.3f}"
