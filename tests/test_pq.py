"""Product quantization (late r11). The registry differential pins
x_pq_codes/x_pq_topk against the replica oracles; these tests pin
SEMANTICS: trainer/replica parity, code-size (compression) claim,
recall of the reranked path vs exact brute force, and determinism."""

from __future__ import annotations

import numpy as np

from mints_wind_data_ingestion_spark.operators.similarity import (
    pq_encode,
    pq_local,
    topk_bruteforce,
    topk_pq,
    topk_pq_rerank,
    train_pq_codebooks,
)
from mints_wind_data_ingestion_spark.plans.extensions import (
    _PQ_ITERS,
    _PQ_KS,
    _PQ_M,
)
from mints_wind_data_ingestion_spark.sources.tables import load_tables


def _books(spark, sf_dir):
    emb = load_tables(spark, sf_dir)["embeddings"]
    return emb, train_pq_codebooks(
        emb, m=_PQ_M, ks=_PQ_KS, iters=_PQ_ITERS
    )


def test_trainer_matches_pyarrow_replica(spark, sf_dir):
    _, books = _books(spark, sf_dir)
    assert np.array_equal(
        books, pq_local(sf_dir, m=_PQ_M, ks=_PQ_KS, iters=_PQ_ITERS)
    )
    assert books.shape == (_PQ_M, _PQ_KS, 64 // _PQ_M)


def test_code_size_is_16x_compression(spark, sf_dir):
    emb, books = _books(spark, sf_dir)
    row = pq_encode(emb, books).first()
    assert len(row.codes) == _PQ_M  # 16 codes, each fits uint8
    assert all(0 <= c < _PQ_KS for c in row.codes)
    # 16 bytes of code vs 64 float32 = 256 bytes -> 16x
    assert 64 * 4 / _PQ_M == 16.0


def test_rerank_recall_vs_bruteforce(spark, sf_dir):
    emb, books = _books(spark, sf_dir)
    codes = pq_encode(emb, books)
    probes = emb.filter("vec_id < 8")
    truth = {
        (r.query_id, r.neighbor_id)
        for r in topk_bruteforce(probes, emb, k=10, dim=64).collect()
    }
    raw = {
        (r.query_id, r.neighbor_id)
        for r in topk_pq(probes, codes, books, k=10).collect()
    }
    rer = {
        (r.query_id, r.neighbor_id)
        for r in topk_pq_rerank(
            probes, codes, emb, books, k=10, shortlist=30, dim=64
        ).collect()
    }
    raw_recall = len(raw & truth) / len(truth)
    rer_recall = len(rer & truth) / len(truth)
    assert rer_recall >= 0.95, rer_recall  # measured 1.0
    assert rer_recall >= raw_recall
    assert raw_recall >= 0.4  # ADC-only floor, measured 0.62


def test_rerank_similarities_are_exact(spark, sf_dir):
    """The reranked result reports EXACT cosine (not the ADC
    approximation): its (pair -> sim) map must agree with brute force
    wherever the pairs coincide."""
    emb, books = _books(spark, sf_dir)
    codes = pq_encode(emb, books)
    probes = emb.filter("vec_id < 8")
    brute = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in topk_bruteforce(probes, emb, k=10, dim=64).collect()
    }
    for r in topk_pq_rerank(
        probes, codes, emb, books, k=10, shortlist=30, dim=64
    ).collect():
        key = (r.query_id, r.neighbor_id)
        if key in brute:
            assert r.cosine_sim == brute[key]


def test_encode_deterministic(spark, sf_dir):
    emb, books = _books(spark, sf_dir)
    a = sorted(
        (r.vec_id, tuple(r.codes)) for r in pq_encode(emb, books).collect()
    )
    b = sorted(
        (r.vec_id, tuple(r.codes)) for r in pq_encode(emb, books).collect()
    )
    assert a == b
