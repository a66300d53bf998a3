"""BM25 retrieval operator — exact-value and ranking-semantics tests.

The registry-level oracle parity (x_bm25_topk / x_text_suite vs
DuckDB) is covered by tests/test_correctness.py's driver replay; here
we pin the OPERATOR's math and its distributed top-k semantics on a
hand-computable corpus.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

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


@settings(deadline=None, max_examples=10)
@given(st.data())
def test_bm25_matches_reference_model(spark, data):
    """Property (VERDICT r5 #6): BOTH physical BM25 paths equal the
    20-line pure-Python scorer on random corpora/queries — tokens drawn
    from a regex-hostile alphabet (metacharacters, quotes, backslash)
    and docs joined with mixed ASCII whitespace, the class of
    token-boundary divergence (regexp tf vs tokenizer) that fixed
    fixtures can't sweep.

    Alphabet notes: no char of 'E' (so no term can contain the \\\\E
    quoting terminator, which bm25_topk rejects by contract) and only
    ASCII whitespace separators (Java \\s and Python str.split() agree
    there; exotic Unicode whitespace is a documented tokenizer-contract
    difference between engines, not a scoring property)."""
    from mints_wind_data_ingestion_spark.operators.retrieval import (
        bm25_topk_table,
    )

    token_chars = "abXY01.*+?()[]{}|^$\\'\"-:#"
    vocab = data.draw(
        st.lists(
            st.text(alphabet=token_chars, min_size=1, max_size=4),
            min_size=3, max_size=8, unique=True,
        ),
        label="vocab",
    )
    seps = [" ", "  ", "\t", "\n", " \t", "\r\n", "\f"]
    n_docs = data.draw(st.integers(2, 6), label="n_docs")
    corpus = []
    for i in range(n_docs):
        toks = data.draw(
            st.lists(st.sampled_from(vocab), min_size=0, max_size=10),
            label=f"doc{i}",
        )
        sep = data.draw(st.sampled_from(seps), label=f"sep{i}")
        pad = data.draw(st.sampled_from(["", " ", "\t"]), label=f"pad{i}")
        corpus.append((i, pad + sep.join(toks) + pad))
    assume(any(t.split() for _, t in corpus))  # avgdl > 0

    n_q = data.draw(st.integers(1, 3), label="n_q")
    queries = []
    for qid in range(n_q):
        terms = data.draw(
            st.lists(
                st.sampled_from(vocab + ["zzmiss"]), min_size=1, max_size=3,
                unique=True,
            ),
            label=f"q{qid}",
        )
        queries.append((qid, tuple(terms)))

    ref = _bm25_ref(corpus, queries)
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    k = len(corpus)  # no truncation: membership is the property
    qdf = spark.createDataFrame(
        [(qid, t) for qid, ts in queries for t in ts],
        "query_id long, term string",
    )
    for got_rows in (
        bm25_topk(docs, queries, k=k, salt_buckets=2).collect(),
        bm25_topk_table(docs, qdf, k=k, salt_buckets=2).collect(),
    ):
        got = {(r.query_id, r.doc_id): r.score_e6 for r in got_rows}
        # exact membership: a doc matches iff it shares >=1 token with
        # the query — the token-boundary property under test
        assert set(got) == set(ref)
        # scores to within 1 micro-unit (double-chain vs decimal-sum vs
        # libm ln may legitimately differ in the last rounded digit)
        assert all(abs(got[kq] - ref[kq]) <= 1 for kq in got)
        # ranks are internally consistent: (score desc, doc_id asc)
        by_q: dict[int, list] = {}
        for r in got_rows:
            by_q.setdefault(r.query_id, []).append(r)
        for rows in by_q.values():
            rows.sort(key=lambda r: r.rnk)
            assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
            assert rows == sorted(
                rows, key=lambda r: (-r.score_e6, r.doc_id)
            )


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
