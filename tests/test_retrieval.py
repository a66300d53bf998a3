"""BM25 retrieval operator — exact-value and ranking-semantics tests.

The registry-level oracle parity (x_bm25_topk / x_text_suite vs
DuckDB) is covered by tests/test_correctness.py's driver replay; here
we pin the OPERATOR's math and its distributed top-k semantics on a
hand-computable corpus.
"""

from __future__ import annotations

import math

import pytest

from mints_wind_data_ingestion_spark.operators.retrieval import bm25_topk


def _bm25_ref(corpus, queries, k1=1.2, b=0.75):
    """Driver-side reference implementation (plain Python)."""
    toks = {d: t.split() for d, t in corpus}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for qid, terms in queries:
        for d, tk in toks.items():
            s = 0.0
            for term in sorted(set(terms)):
                tf = tk.count(term)
                if not tf:
                    continue
                df = sum(1 for t2 in toks.values() if term in t2)
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
            if s > 0:
                out[(qid, d)] = int(round(s * 1e6))
    return out


CORPUS = [
    (1, "wind speed high wind gust"),
    (2, "speed limit low"),
    (3, "calm morning no wind"),
    (4, "wind wind wind turbine"),
    (5, "unrelated text entirely"),
]
QUERIES = [(10, ("wind", "speed")), (20, ("turbine",))]


def test_bm25_exact_scores(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        (r.query_id, r.doc_id): r.score_e6
        for r in bm25_topk(docs, QUERIES, k=10).collect()
    }
    assert got == _bm25_ref(CORPUS, QUERIES)


def test_bm25_ranking_and_k(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    rows = bm25_topk(docs, QUERIES, k=2).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    # k caps each query's result list
    assert all(len(v) <= 2 for v in by_q.values())
    # rnk is 1..n in score_e6-descending order, ties impossible here
    for v in by_q.values():
        v.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in v] == list(range(1, len(v) + 1))
        assert all(
            v[i].score_e6 >= v[i + 1].score_e6 for i in range(len(v) - 1)
        )
    # doc 1 matches BOTH query-10 terms (wind tf=2 + speed tf=1) and
    # outranks doc 4's single-term tf=3 — multi-term coverage beats
    # raw term repetition, the saturating-tf property BM25 exists for
    assert [r.doc_id for r in by_q[10]] == [1, 2]
    # only doc 4 contains 'turbine'
    assert [r.doc_id for r in by_q[20]] == [4]


def test_bm25_salted_topk_matches_naive(spark):
    """The two-phase salted top-k must equal a global sort — exercise
    with more matching docs than salt buckets so both phases do real
    pruning, and with forced ties (identical docs) so the doc-id
    tiebreak matters."""
    rows = [(i, "alpha beta " + ("alpha " * (i % 7))) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25_topk(
        docs, [(1, ("alpha",))], k=15, salt_buckets=4
    ).collect()
    ref = _bm25_ref(rows, [(1, ("alpha",))])
    want = sorted(
        ((s, d) for (q, d), s in ref.items()),
        key=lambda t: (-t[0], t[1]),
    )[:15]
    assert [(r.score_e6, r.doc_id) for r in sorted(got, key=lambda r: r.rnk)] == want


def test_bm25_empty_terms_raises(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(docs, [(1, ())])


def test_bm25_table_path_equals_constant_path(spark, sf_dir):
    """The posting-join variant (bm25_topk_table) and the constant-term
    plan (bm25_topk) must produce identical rows for the shared graded
    workload — same math, two physical shapes. The decimal-summed and
    double-chained scores agree because the workload's score values sit
    far (>1e-9) from any .5e-6 rounding boundary."""
    from mints_wind_data_ingestion_spark.plans import REGISTRY

    a = {
        (r.query_id, r.doc_id): (r.score_e6, r.rnk)
        for r in REGISTRY["x_bm25_topk"].build(spark, sf_dir).collect()
    }
    b = {
        (r.query_id, r.doc_id): (r.score_e6, r.rnk)
        for r in REGISTRY["x_bm25_table"].build(spark, sf_dir).collect()
    }
    assert a == b
    assert a, "expected matches for the graded workload"


def test_bm25_invalid_terms_raise(spark):
    docs = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    for bad in ("", "two words", "tab\tsep"):
        with pytest.raises(ValueError):
            bm25_topk(docs, [(1, (bad,))])
    with pytest.raises(ValueError):
        bm25_topk(docs, [(1, ("x",)), (1, ("y",))])  # duplicate query_id


def test_editdist_rejects_degenerate_params(spark):
    from mints_wind_data_ingestion_spark.operators.dedup import (
        editdist_dedup_pairs,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        editdist_dedup_pairs(docs, "doc_id", "text", rare_cap=1)
    with pytest.raises(ValueError):
        editdist_dedup_pairs(docs, "doc_id", "text", shingle_n=0)
    with pytest.raises(ValueError):
        editdist_dedup_pairs(docs, "doc_id", "text", max_rel_dist=0.0)
