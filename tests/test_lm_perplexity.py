"""Bigram-LM perplexity scoring (operators.lm, round 7) — the
CCNet-class quality filter, pinned on a hand-computed model."""

from __future__ import annotations

import math

import pytest

from mints_wind_data_ingestion_spark.operators.lm import (
    bigram_perplexity,
    train_bigram_counts,
)

TRAIN = [(1, "a b a c"), (2, "a b")]
# bigram counts: (a,b)=2, (b,a)=1, (a,c)=1 → c(a)=3, c(b)=1; V=3


def _nll_e6(c12, c1, v=3, k=0.1):
    return round(-math.log((c12 + k) / (c1 + k * v)) * 1_000_000)


def _avg_e4(nlls):
    return round(sum(nlls) / max(len(nlls), 1) / 100.0)


def test_train_counts(spark):
    big, pre, vocab = train_bigram_counts(
        spark.createDataFrame(TRAIN, "doc_id long, text string")
    )
    assert {r["bg"]: r["c12"] for r in big.collect()} == {
        "a b": 2, "b a": 1, "a c": 1,
    }
    assert {r["w1"]: r["c1"] for r in pre.collect()} == {"a": 3, "b": 1}
    assert vocab.collect()[0]["v"] == 3


@pytest.mark.parametrize("text,nlls", [
    ("a b z", [_nll_e6(2, 3), _nll_e6(0, 1)]),   # seen + unseen pair
    ("z z", [_nll_e6(0, 0)]),                     # unseen context → 1/V
    ("a b a c", [_nll_e6(2, 3), _nll_e6(1, 1), _nll_e6(1, 3)]),
    ("", []),                                     # no bigrams → 0, pass
    ("solo", []),
])
def test_hand_computed_scores(spark, text, nlls):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    [row] = bigram_perplexity(docs, train, add_k=0.1).collect()
    assert row["n_bigrams"] == len(nlls)
    assert row["avg_nll_e4"] == _avg_e4(nlls)
    assert row["lm_pass"] == (row["avg_nll_e4"] <= 80_000)


def test_model_survives_parquet_roundtrip(spark, tmp_path):
    """The model is a TABLE — persist it like the IVF index and score
    a later batch from disk (the steady-state production shape:
    train once, re-join per batch) with identical results."""
    from mints_wind_data_ingestion_spark.operators.lm import (
        score_perplexity,
    )

    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    docs = spark.createDataFrame([(7, "a b z")], "doc_id long, text string")
    big, pre, vocab = train_bigram_counts(train)
    live = score_perplexity(docs, big, pre, vocab).collect()
    for name, df in (("big", big), ("pre", pre), ("vocab", vocab)):
        df.write.mode("overwrite").parquet(str(tmp_path / name))
    reloaded = score_perplexity(
        docs,
        spark.read.parquet(str(tmp_path / "big")),
        spark.read.parquet(str(tmp_path / "pre")),
        spark.read.parquet(str(tmp_path / "vocab")),
    ).collect()
    assert [tuple(r) for r in live] == [tuple(r) for r in reloaded]


def test_reference_text_scores_below_noise(spark, sf_dir):
    """The filter's point: text that VIOLATES the training
    distribution scores higher nll than any in-distribution document.
    (All-unseen-token noise would score the uniform 1/V floor — on
    this near-uniform synthetic corpus that is close to the average,
    so the adversarial case pairs a FREQUENT context with unseen
    continuations: P = k/(c1 + kV) ≪ 1/V.)"""
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 3 != 0)
    top = (
        train.select(F.explode(F.split("text", r"\s+")).alias("w"))
        .filter(F.col("w") != "").groupBy("w").count()
        .orderBy(F.desc("count"), "w").first()["w"]
    )
    noise_text = f"{top} zq {top} xv {top} qqk {top} wjz"
    scored = bigram_perplexity(
        docs.filter(F.col("doc_id") % 3 == 0).select("doc_id", "text")
        .union(spark.createDataFrame(
            [(10**9, noise_text)], "doc_id long, text string")),
        train, add_k=0.1,
    )
    rows = {r["doc_id"]: r["avg_nll_e4"] for r in scored.collect()}
    noise = rows.pop(10**9)
    assert noise > max(rows.values())  # out-of-distribution scores worst


def test_persist_load_bigram_model(spark, tmp_path):
    """persist_bigram_model / load_bigram_model round-trip: the stored
    {bigrams, prefixes, vocab} layout scores identically to the live
    model (r8 — the artifact the streaming gate consumes)."""
    from mints_wind_data_ingestion_spark.operators.lm import (
        load_bigram_model,
        persist_bigram_model,
        score_perplexity,
    )

    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    docs = spark.createDataFrame(
        [(7, "a b z"), (8, "a b a c")], "doc_id long, text string"
    )
    big, pre, vocab = train_bigram_counts(train)
    live = sorted(tuple(r) for r in
                  score_perplexity(docs, big, pre, vocab).collect())
    persist_bigram_model(train, str(tmp_path / "lm"))
    stored = sorted(tuple(r) for r in score_perplexity(
        docs, *load_bigram_model(spark, str(tmp_path / "lm"))
    ).collect())
    assert live == stored


def test_lm_gate_ingest_stream_matches_batch(spark, tmp_path, sf_dir):
    """Streaming CCNet gate (r8): kept ∪ quarantined == input, kept ∩
    quarantined == ∅, and the stream's verdict equals the batch
    score_perplexity verdict on the same documents against the same
    persisted model — with the quarantine carrying the scores."""
    import pyspark.sql.functions as F

    from mints_wind_data_ingestion_spark.operators.lm import (
        load_bigram_model,
        persist_bigram_model,
        score_perplexity,
    )
    from mints_wind_data_ingestion_spark.streaming.pipeline import (
        run_lm_gate_ingest,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id", "text")
    model = str(tmp_path / "lm")
    persist_bigram_model(train, model)

    # candidates: in-distribution docs + one frequent-context/unseen-
    # continuation adversarial doc that must land in quarantine
    top = (
        train.select(F.explode(F.split("text", r"\s+")).alias("w"))
        .filter(F.col("w") != "").groupBy("w").count()
        .orderBy(F.desc("count"), "w").first()["w"]
    )
    noise = f"{top} zq {top} xv {top} qqk {top} wjz"
    incoming = (
        docs.filter(F.col("doc_id") % 3 == 0).select("doc_id", "text")
        .unionByName(spark.createDataFrame(
            [(10**9, noise)], "doc_id long, text string"))
    )
    # gate midway between the corpus scores and the noise score so
    # both sides are non-empty regardless of testdata drift
    scored = score_perplexity(
        incoming, *load_bigram_model(spark, model)
    )
    vals = sorted(r["avg_nll_e4"] for r in scored.collect())
    gate = int((vals[-1] + vals[len(vals) // 2]) // 2)

    landing = str(tmp_path / "landing")
    incoming.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append").parquet(landing)
    incoming.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append").parquet(landing)
    schema = spark.read.parquet(landing).schema
    q = run_lm_gate_ingest(
        spark, landing, str(tmp_path / "corpus"), str(tmp_path / "ckpt"),
        schema, model, gate_nll_e4=gate,
        quarantine_path=str(tmp_path / "quarantine"),
    )
    q.awaitTermination(180)
    assert q.exception() is None

    kept = {r.doc_id for r in spark.read.parquet(
        str(tmp_path / "corpus")).select("doc_id").collect()}
    quar = spark.read.parquet(str(tmp_path / "quarantine"))
    dropped = {r.doc_id for r in quar.select("doc_id").collect()}

    want_pass = {
        r["doc_id"]
        for r in score_perplexity(
            incoming, *load_bigram_model(spark, model), gate_nll_e4=gate
        ).filter("lm_pass").collect()
    }
    assert kept == want_pass
    assert kept | dropped == {r.doc_id for r in incoming.collect()}
    assert kept.isdisjoint(dropped) and dropped
    assert 10**9 in dropped
    # quarantine carries the evidence
    row = quar.filter(f"doc_id = {10**9}").first()
    assert row.avg_nll_e4 > gate and not row.lm_pass


# --- stupid backoff (r8, Brants et al. 2007) -------------------------------

BK_TRAIN = [(1, "a b c a b d"), (2, "a b c")]
# unigrams a:3 b:3 c:2 d:1 (N=9, V=4); bigrams "a b":3 "b c":2 "b d":1
# "c a":1; trigrams "a b c":2 "b c a":1 "c a b":1 "a b d":1


def _bk_e4(*scores):
    return round(sum(round(-math.log(s) * 1e6) for s in scores)
                 / len(scores) / 100)


@pytest.mark.parametrize("text,scores", [
    ("a b c", [2 / 3]),                         # seen trigram: c123/c12
    ("x a b", [0.4 * (3 / 3)]),                 # backoff to suffix bigram
    ("a b z", [0.4 * 0.4 * 0.1 / (9 + 0.4)]),   # backoff to unigram floor
    ("a b c a", [2 / 3, 1 / 2]),                # two positions, mixed
    ("ab", []),                                 # <3 tokens: 0, pass
])
def test_stupid_backoff_hand_model(spark, text, scores):
    from mints_wind_data_ingestion_spark.operators.lm import (
        stupid_backoff_perplexity,
    )

    train = spark.createDataFrame(BK_TRAIN, "doc_id long, text string")
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    [row] = stupid_backoff_perplexity(docs, train, add_k=0.1).collect()
    assert row["n_trigrams"] == len(scores)
    assert row["avg_nll_e4"] == (_bk_e4(*scores) if scores else 0)


def test_stupid_backoff_penalizes_reordering(spark, sf_dir):
    """The trigram filter's point over the bigram one: SHUFFLED text
    built from in-vocabulary words scores worse than the intact
    document whose trigrams the model has seen — context two words
    back carries signal unigram statistics can't."""
    import random

    import pyspark.sql.functions as F

    from mints_wind_data_ingestion_spark.operators.lm import (
        stupid_backoff_perplexity,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id", "text")
    intact = docs.filter(F.col("doc_id") % 3 == 0).first()["text"]
    words = intact.split()
    rng = random.Random(3)
    shuffled = " ".join(rng.sample(words, len(words)))
    cand = spark.createDataFrame(
        [(1, intact), (2, shuffled)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["avg_nll_e4"]
            for r in stupid_backoff_perplexity(cand, train).collect()}
    assert rows[2] > rows[1]
