"""DSIR importance resampling (operators.lm.dsir_logweights +
x_dsir_sample, r8 — Xie et al. 2023): hand-computed log-weights on a
tiny two-distribution corpus, discrimination (target-like documents
outweigh raw-like ones), and the Gumbel top-k selection properties
(deterministic, rank-ordered, weight-responsive)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mints_wind_data_ingestion_spark.operators.lm import dsir_logweights

TGT = [(1, "a b a b a b"), (2, "a b a b")]     # target loves "a b"
RAW = [(3, "c d c d c d"), (4, "c d c d")]     # raw loves "c d"


def _nll_e6(c12, c1, v, k=0.1):
    return round(-math.log((c12 + k) / (c1 + k * v)) * 1_000_000)


def test_hand_computed_logweights(spark):
    """Per-bigram delta = nll_raw_e6 - nll_tgt_e6, quantized per side
    before the subtraction, summed exactly."""
    tgt = spark.createDataFrame(TGT, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    # target model: bigrams "a b":5 "b a":3 -> c(a)=5, c(b)=3; V=2
    # raw model:    bigrams "c d":5 "d c":3 -> c(c)=5, c(d)=3; V=2
    docs = spark.createDataFrame(
        [(10, "a b"), (11, "c d"), (12, "x")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: (r["n_bigrams"], r["logw_e6"])
            for r in dsir_logweights(docs, tgt, raw).collect()}
    # "a b": tgt seen (5/ (5+0.2)), raw unseen context (0.1/(0+0.2))
    lw_ab = _nll_e6(0, 0, 2) - _nll_e6(5, 5, 2)
    lw_cd = _nll_e6(5, 5, 2) - _nll_e6(0, 0, 2)
    assert rows[10] == (1, lw_ab) and lw_ab > 0
    assert rows[11] == (1, lw_cd) and lw_cd < 0
    assert rows[12] == (0, 0)  # no bigrams: neutral weight


def test_target_like_docs_outweigh_raw_like(spark, sf_dir):
    """On the real corpus with the %7 split, documents FROM the target
    slice average a higher log-weight than the rest — the selection
    signal the sampler rides."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lw = dsir_logweights(
        docs,
        docs.filter(F.col("doc_id") % 7 == 0),
        docs.filter(F.col("doc_id") % 7 != 0),
    )
    rows = lw.join(
        docs.select("doc_id", (F.col("doc_id") % 7 == 0).alias("is_tgt")),
        "doc_id",
    ).groupBy("is_tgt").agg(F.avg("logw_e6").alias("m")).collect()
    means = {r["is_tgt"]: r["m"] for r in rows}
    assert means[True] > means[False]


def test_gumbel_topk_selection_properties(spark, sf_dir):
    """x_dsir_sample: deterministic across runs, exactly k rows,
    ranks ordered by the Gumbel-perturbed weight with a unique
    tiebreak, and the selection is weight-responsive (the selected
    set's mean log-weight beats the corpus mean)."""
    from mints_wind_data_ingestion_spark.plans import REGISTRY

    a = REGISTRY["x_dsir_sample"].build(spark, sf_dir).collect()
    b = REGISTRY["x_dsir_sample"].build(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    assert len(a) == 100
    by_rank = sorted(a, key=lambda r: r["rank"])
    gs = [r["g_e6"] for r in by_rank]
    assert gs == sorted(gs, reverse=True)
    assert [r["rank"] for r in by_rank] == list(range(1, 101))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lw = dsir_logweights(
        docs,
        docs.filter(F.col("doc_id") % 7 == 0),
        docs.filter(F.col("doc_id") % 7 != 0),
    )
    corpus_mean = lw.agg(F.avg("logw_e6")).first()[0]
    sel_mean = sum(r["logw_e6"] for r in a) / len(a)
    assert sel_mean > corpus_mean


def test_planted_target_document_ranks_high(spark):
    """A candidate that IS target-distribution text must outrank every
    raw-distribution candidate regardless of the Gumbel noise when
    the weight gap dominates (long docs → large |logw|)."""
    from mints_wind_data_ingestion_spark.operators.lm import (
        dsir_logweights,
    )

    tgt = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog " * 5)],
        "doc_id long, text string")
    raw = spark.createDataFrame(
        [(2, "stack overflow segfault kernel panic core dump " * 5)],
        "doc_id long, text string")
    cands = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog " * 4),
         (11, "stack overflow segfault kernel panic core dump " * 4)],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["logw_e6"]
            for r in dsir_logweights(cands, tgt, raw).collect()}
    assert rows[10] > 0 > rows[11]
    # the gap is tens of nats * 1e6 — far beyond any Gumbel draw
    assert rows[10] - rows[11] > 20_000_000


# ---------------------------------------------------------------------------
# hashed n-gram buckets (r10 — VERDICT r8 #7 / r9 #3): the variant Xie
# et al. productionize; pure-Python replica differential + plan pins
# ---------------------------------------------------------------------------


def _py_bucket_logweights(doc_rows, tgt_rows, raw_rows, B, k=0.1):
    """Pure-Python replica of dsir_bucket_logweights under the
    md5-prefix bucket hash (the engine-portable hash the driver plan
    uses) — independent reimplementation, not a port of the plan."""
    import hashlib
    from collections import Counter

    def grams(text):
        toks = (text or "").split()
        return toks + [a + " " + b for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B

    def counts(rows):
        c = Counter(bucket(g) for _, t in rows for g in grams(t))
        return c, sum(c.values())

    ct, tt = counts(tgt_rows)
    cr, tr = counts(raw_rows)

    def nll_e6(c, tot):
        return round(-math.log((c + k) / (tot + k * B)) * 1_000_000)

    out = {}
    for doc_id, text in doc_rows:
        gs = grams(text)
        lw = sum(
            nll_e6(cr.get(bucket(g), 0), tr)
            - nll_e6(ct.get(bucket(g), 0), tt)
            for g in gs
        )
        out[doc_id] = (len(gs), lw)
    return out


def test_bucket_logweights_match_python_replica(spark, sf_dir):
    """dsir_bucket_logweights under the md5-prefix hash must equal the
    pure-Python replica on the real corpus, bucket collisions and
    all (B=64 forces heavy collisions)."""
    from mints_wind_data_ingestion_spark.operators.lm import (
        dsir_bucket_logweights,
    )
    from mints_wind_data_ingestion_spark.plans.extensions import _md5_60

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tgt = docs.filter(F.col("doc_id") % 7 == 0)
    raw = docs.filter(F.col("doc_id") % 7 != 0)
    got = {
        r["doc_id"]: (r["n_grams"], r["logw_e6"])
        for r in dsir_bucket_logweights(
            docs, tgt, raw, hash_buckets=64, hash_fn=_md5_60
        ).collect()
    }
    rows = [(r["doc_id"], r["text"])
            for r in docs.select("doc_id", "text").collect()]
    want = _py_bucket_logweights(
        rows,
        [x for x in rows if x[0] % 7 == 0],
        [x for x in rows if x[0] % 7 != 0],
        B=64,
    )
    assert got == want


def test_bucket_logweights_default_hash_and_edges(spark):
    """The production (xxhash64) path: same n_grams accounting, empty
    and NULL docs neutral, and target-like docs outweigh raw-like —
    the semantics survive any hash family."""
    from mints_wind_data_ingestion_spark.operators.lm import (
        dsir_bucket_logweights,
    )

    tgt = spark.createDataFrame(TGT, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    docs = spark.createDataFrame(
        [(10, "a b a"), (11, "c d c"), (12, ""), (13, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: (r["n_grams"], r["logw_e6"])
            for r in dsir_bucket_logweights(
                docs, tgt, raw, hash_buckets=4096).collect()}
    assert rows[10][0] == 5 and rows[11][0] == 5  # 3 uni + 2 bi
    assert rows[12] == (0, 0) and rows[13] == (0, 0)
    assert rows[10][1] > 0 > rows[11][1]


def test_bucket_plan_broadcasts_model(spark):
    """The per-bucket delta model must reach the scorer as a BROADCAST
    join (the whole point of the bucketed variant: one bounded-width
    broadcast + one groupBy shuffle, not four shuffle joins)."""
    from mints_wind_data_ingestion_spark.operators.lm import (
        dsir_bucket_logweights,
    )

    tgt = spark.createDataFrame(TGT, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    docs = spark.createDataFrame(
        [(10, "a b"), (11, "c d")], "doc_id long, text string"
    )
    plan = dsir_bucket_logweights(
        docs, tgt, raw, hash_buckets=256
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_dsir_bucket_model_persist_load_roundtrip(spark, sf_dir, tmp_path):
    """persist/load round-trip: scoring against the LOADED model
    equals scoring against the in-flight one, and meta carries the
    bucket modulus."""
    from mints_wind_data_ingestion_spark.operators.lm import (
        dsir_bucket_logweights,
        load_dsir_bucket_model,
        persist_dsir_bucket_model,
        score_dsir_buckets,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tgt = docs.filter(F.col("doc_id") % 7 == 0)
    raw = docs.filter(F.col("doc_id") % 7 != 0)
    path = str(tmp_path / "dsir")
    persist_dsir_bucket_model(tgt, raw, path, hash_buckets=512)
    delta, meta = load_dsir_bucket_model(spark, path)
    m = meta.collect()
    assert len(m) == 1 and m[0]["hash_buckets"] == 512
    assert delta.count() <= 512
    got = sorted(map(tuple, score_dsir_buckets(
        docs, delta, meta, hash_buckets=512).collect()))
    want = sorted(map(tuple, dsir_bucket_logweights(
        docs, tgt, raw, hash_buckets=512).collect()))
    assert got == want


def test_dsir_gate_stream_equals_batch(spark, sf_dir, tmp_path):
    """Streaming DSIR gate (r10): kept ∪ quarantined == input, kept ∩
    quarantined == ∅, and the stream's verdict equals the batch
    score_dsir_buckets verdict against the same persisted model —
    with the quarantine carrying the scores."""
    from mints_wind_data_ingestion_spark.operators.lm import (
        load_dsir_bucket_model,
        persist_dsir_bucket_model,
        score_dsir_buckets,
    )
    from mints_wind_data_ingestion_spark.streaming.pipeline import (
        run_dsir_gate_ingest,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tgt = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    raw = docs.filter(F.col("doc_id") % 7 != 0).select("doc_id", "text")
    model = str(tmp_path / "model")
    persist_dsir_bucket_model(tgt, raw, model, hash_buckets=512)

    incoming = docs.select("doc_id", "text")
    # gate at the median batch log-weight so both sides are non-empty
    # regardless of testdata drift
    delta, meta = load_dsir_bucket_model(spark, model)
    scored = score_dsir_buckets(incoming, delta, meta, hash_buckets=512)
    vals = sorted(r["logw_e6"] for r in scored.collect())
    gate = vals[len(vals) // 2]

    landing = str(tmp_path / "landing")
    incoming.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append").parquet(landing)
    incoming.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append").parquet(landing)
    schema = spark.read.parquet(landing).schema
    q = run_dsir_gate_ingest(
        spark, landing, str(tmp_path / "corpus"), str(tmp_path / "ckpt"),
        schema, model, min_logw_e6=gate,
        quarantine_path=str(tmp_path / "quarantine"),
    )
    q.awaitTermination(180)
    assert q.exception() is None

    kept = {r.doc_id for r in spark.read.parquet(
        str(tmp_path / "corpus")).select("doc_id").collect()}
    quar = spark.read.parquet(str(tmp_path / "quarantine"))
    dropped = {r.doc_id for r in quar.select("doc_id").collect()}

    want_pass = {r["doc_id"] for r in scored.collect()
                 if r["logw_e6"] >= gate}
    assert kept == want_pass
    assert kept | dropped == {r.doc_id for r in incoming.collect()}
    assert kept.isdisjoint(dropped) and dropped and kept
    # quarantine carries the evidence
    assert {"doc_id", "n_grams", "logw_e6"} <= set(quar.columns)
    assert all(r["logw_e6"] < gate for r in quar.collect())


def test_dsir_gate_replay_is_noop(spark, sf_dir, tmp_path):
    """Re-running the DSIR gate stream with the same checkpoint (no
    new files) is a no-op: same epochs, same kept rows — the
    epoch-keyed exactly-once contract the other ingest gates pin."""
    from mints_wind_data_ingestion_spark.operators.lm import (
        persist_dsir_bucket_model,
    )
    from mints_wind_data_ingestion_spark.streaming.pipeline import (
        run_dsir_gate_ingest,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    model = str(tmp_path / "model")
    persist_dsir_bucket_model(
        docs.filter(F.col("doc_id") % 7 == 0),
        docs.filter(F.col("doc_id") % 7 != 0),
        model, hash_buckets=256,
    )
    landing = str(tmp_path / "landing")
    docs.coalesce(1).write.mode("append").parquet(landing)
    schema = spark.read.parquet(landing).schema
    corpus = str(tmp_path / "corpus")
    args = (spark, landing, corpus, str(tmp_path / "ckpt"), schema, model)

    q = run_dsir_gate_ingest(*args, min_logw_e6=0)
    q.awaitTermination(180)
    assert q.exception() is None
    first = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert first

    q2 = run_dsir_gate_ingest(*args, min_logw_e6=0)
    q2.awaitTermination(180)
    assert q2.exception() is None
    again = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert again == first
