"""Substring-level exact dedup (operators.dedup.substring_dedup) —
the Lee et al. 2022 ExactSubstr family (r8): planted duplicates,
edge classes (short docs, periodic strings, within-doc repeats,
adjacent spans), and a seeded brute-force differential over a
repeat-dense random corpus.

The registry query (x_dedup_substring) is additionally verified
against the DuckDB oracle by test_correctness's differential mirror
and the driver gate; these tests pin the OPERATOR semantics directly
against a pure-Python reference implementation of the definition.
"""

from __future__ import annotations

import hashlib
import random
from collections import Counter

import pytest

from mints_wind_data_ingestion_spark.operators.dedup import (
    duplicated_window_positions,
    substring_dedup,
)


def _ref(texts: dict[int, str], L: int) -> dict[int, dict]:
    """Brute-force reference: flag every position whose length-L window
    substring has corpus multiplicity >= 2; islands break when the gap
    from the previous flagged position is >= L; cut = text minus the
    union of flagged spans."""
    cnt: Counter[str] = Counter()
    for t in texts.values():
        for i in range(len(t) - L + 1):
            cnt[t[i : i + L]] += 1
    out = {}
    for d, t in texts.items():
        flagged = [
            i + 1 for i in range(len(t) - L + 1) if cnt[t[i : i + L]] >= 2
        ]
        islands: list[list[int]] = []
        for p in flagged:
            if islands and p - islands[-1][-1] < L:
                islands[-1].append(p)
            else:
                islands.append([p])
        spans = [(isl[0], isl[-1] + L - 1) for isl in islands]
        kept, cur = [], 1
        for s, e in spans:
            kept.append(t[cur - 1 : s - 1])
            cur = e + 1
        kept.append(t[cur - 1 :])
        out[d] = dict(
            n_chars=len(t),
            dup_windows=len(flagged),
            dup_spans=len(spans),
            dup_chars=sum(e - s + 1 for s, e in spans),
            kept_text="".join(kept),
        )
    return out


def _run(spark, texts: dict[int, str], L: int) -> dict[int, dict]:
    df = spark.createDataFrame(
        list(texts.items()), "doc_id int, text string"
    )
    rows = substring_dedup(df, "doc_id", "text", min_len=L).collect()
    return {
        r["doc_id"]: {
            k: r[k]
            for k in (
                "n_chars", "dup_windows", "dup_spans", "dup_chars",
                "kept_text",
            )
        }
        for r in rows
    }


def _check(spark, texts: dict[int, str], L: int) -> dict[int, dict]:
    got, want = _run(spark, texts, L), _ref(texts, L)
    assert got == want
    return got


def test_planted_cross_doc_block(spark):
    """An 80-char block planted in two otherwise-distinct docs: 21
    flagged windows each (80-60+1), one span, 80 chars cut — and the
    kept text is exactly the doc minus the block."""
    block = "".join(chr(ord("a") + (i * 7) % 26) for i in range(80))
    # distinct flanking chars (< > vs [ ]) so the maximal shared
    # substring is EXACTLY the 80-char block, not block + flanks
    texts = {
        1: "prefix-one<" + block + ">suffix-one",
        2: "a different lead-in:[" + block + "]and a different tail",
        3: "clean document with nothing repeated in it at all, honest",
    }
    got = _check(spark, texts, 60)
    assert got[1]["dup_windows"] == 21
    assert got[1]["dup_spans"] == 1 and got[1]["dup_chars"] == 80
    assert got[1]["kept_text"] == "prefix-one<>suffix-one"
    assert got[2]["kept_text"] == "a different lead-in:[]and a different tail"
    assert got[3]["dup_windows"] == 0
    assert got[3]["kept_text"] == texts[3]


def test_within_doc_repeat_two_spans(spark):
    """The same 60-char block twice INSIDE one doc (far apart): both
    occurrences flagged (multiplicity counts within-doc), two spans,
    120 chars cut."""
    block = "B" * 30 + "C" * 30
    # mid must carry no internal 60-char repeat of its own (an all-'x'
    # run would be flagged as a periodic self-repeat — correctly)
    mid = (
        "the quick brown fox jumps over the lazy dog while the rain "
        "in spain falls mainly on the plain today, allegedly"
    )
    texts = {1: block + mid + block, 2: "unrelated other doc content"}
    got = _check(spark, texts, 60)
    assert got[1]["dup_spans"] == 2
    assert got[1]["dup_chars"] == 120
    assert got[1]["kept_text"] == mid


def test_short_docs_pass_through(spark):
    """Docs shorter than min_len generate no windows: zero stats,
    verbatim kept text — even if they EQUAL each other (sub-threshold
    duplication is out of scope by definition)."""
    texts = {1: "tiny doc", 2: "tiny doc", 3: "another short one"}
    got = _check(spark, texts, 60)
    for d in texts:
        assert got[d]["dup_windows"] == 0
        assert got[d]["kept_text"] == texts[d]


def test_periodic_string_fully_covered(spark):
    """A periodic doc ('ab'×50): every window repeats within the doc,
    one island covers the whole text, kept text is empty."""
    texts = {1: "ab" * 50, 2: "some other non-periodic text right here"}
    got = _check(spark, texts, 60)
    assert got[1]["dup_chars"] == 100
    assert got[1]["dup_spans"] == 1
    assert got[1]["kept_text"] == ""


def test_adjacent_spans_cut_contiguously(spark):
    """Two flagged regions exactly adjacent (gap == L breaks the
    island but leaves no chars between spans): the cut removes both
    with nothing left behind, and coverage equals the sum."""
    # doc 1 contains block A at pos 1..60 and block B at pos 61..120:
    # A repeats in doc 2, B in doc 3; within doc 1 they are adjacent.
    a, b = "A" * 60, "B" * 60
    texts = {
        1: a + b + "tail section of document one",
        2: "doc two carries " + a + " someplace inside",
        3: "and doc three has " + b + " in the middle of it",
    }
    got = _check(spark, texts, 60)
    assert got[1]["dup_chars"] == 120
    assert got[1]["kept_text"] == "tail section of document one"


def test_flagged_positions_exact(spark):
    """duplicated_window_positions returns exactly the multiplicity>=2
    position set (1-based)."""
    block = "Z" * 64
    texts = {1: "head " + block, 2: block + " tail", 3: "no repeats here"}
    df = spark.createDataFrame(list(texts.items()), "doc_id int, text string")
    got = sorted(
        (r["doc_id"], r["pos"])
        for r in duplicated_window_positions(df, "doc_id", "text", 60).collect()
    )
    # doc1: block at 6..69 -> window starts 6..10; doc2: starts 1..5
    assert got == [(1, p) for p in range(6, 11)] + [(2, p) for p in range(1, 6)]


def test_brute_force_differential_random_corpus(spark):
    """Seeded repeat-dense random corpus (3-letter alphabet, L=8):
    hundreds of organic within- and cross-doc repeats; operator output
    must equal the brute-force reference doc-for-doc, including the
    reconstructed kept text."""
    rng = random.Random(42)
    texts = {
        d: "".join(rng.choice("abc") for _ in range(rng.randint(5, 120)))
        for d in range(40)
    }
    got = _check(spark, texts, 8)
    # sanity: the corpus genuinely exercises the operator
    assert sum(v["dup_windows"] for v in got.values()) > 100
    assert any(v["dup_spans"] >= 2 for v in got.values())
    assert any(0 < v["dup_chars"] < v["n_chars"] for v in got.values())


def test_min_len_validation():
    with pytest.raises(ValueError, match="min_len"):
        duplicated_window_positions(None, "id", "t", 1)


def test_registry_query_kept_md5_matches_cut(spark):
    """The registry query's kept_md5 is the md5 of the operator's cut
    text for the same corpus — the column the oracle cross-checks."""
    from mints_wind_data_ingestion_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    out = {
        r["doc_id"]: r["kept_md5"]
        for r in REGISTRY["x_dedup_substring"].build(spark, sf).collect()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    cut = {
        r["doc_id"]: hashlib.md5(r["kept_text"].encode()).hexdigest()
        for r in substring_dedup(docs, "doc_id", "text", min_len=60).collect()
    }
    assert out == cut


def test_unicode_char_semantics_match_reference(spark):
    """Positions, lengths and cuts are CHARACTER-based on both sides
    (Spark substring/length are char-semantic, as is the Python
    reference) — multibyte text must not shift spans or split code
    points."""
    block = "日本語のテキストが繰り返されるブロックです" * 3  # 63 chars
    texts = {
        1: "café-prefix→" + block + "←suffix-ünïcode",
        2: "другой префикс『" + block + "』другой суффикс",
        3: "пустой документ без повторов — ничего общего здесь нет",
    }
    got = _check(spark, texts, 60)
    assert got[1]["dup_windows"] > 0
    assert got[1]["dup_chars"] == got[2]["dup_chars"] == 63
    assert got[1]["kept_text"] == "café-prefix→←suffix-ünïcode"
    assert got[2]["kept_text"] == "другой префикс『』другой суффикс"


def _ref_against(new_texts, base_texts, L):
    """Brute-force cross-corpus reference: flag new-side positions
    whose window occurs anywhere in base; islands/cut as in _ref."""
    base_wins = {
        t[i : i + L]
        for t in base_texts.values()
        for i in range(len(t) - L + 1)
    }
    out = {}
    for d, t in new_texts.items():
        flagged = [
            i + 1 for i in range(len(t) - L + 1)
            if t[i : i + L] in base_wins
        ]
        islands = []
        for p in flagged:
            if islands and p - islands[-1][-1] < L:
                islands[-1].append(p)
            else:
                islands.append([p])
        spans = [(i[0], i[-1] + L - 1) for i in islands]
        kept, cur = [], 1
        for s, e in spans:
            kept.append(t[cur - 1 : s - 1])
            cur = e + 1
        kept.append(t[cur - 1 :])
        out[d] = dict(
            n_chars=len(t), dup_windows=len(flagged),
            dup_spans=len(spans),
            dup_chars=sum(e - s + 1 for s, e in spans),
            kept_text="".join(kept),
        )
    return out


def _run_against(spark, new_texts, base_texts, L):
    from mints_wind_data_ingestion_spark.operators.dedup import (
        substring_excise,
    )

    new_df = spark.createDataFrame(list(new_texts.items()),
                                   "doc_id int, text string")
    base_df = spark.createDataFrame(list(base_texts.items()),
                                    "doc_id int, text string")
    rows = substring_excise(new_df, base_df, "doc_id", "text",
                            min_len=L).collect()
    return {
        r["doc_id"]: {
            k: r[k]
            for k in ("n_chars", "dup_windows", "dup_spans", "dup_chars",
                      "kept_text")
        }
        for r in rows
    }


def test_excise_cuts_protected_text_only(spark):
    """Cross-corpus excision: a benchmark passage planted from base is
    cut out of a new doc; a substring duplicated WITHIN the batch but
    absent from base is NOT flagged (cross-only semantics, unlike the
    self form); base ids may overlap new ids."""
    bench = "".join(chr(ord("a") + (i * 11) % 26) for i in range(70))
    batch_dup = "Z" * 65
    new = {
        1: "lead-in text before(" + bench + ")and after it",
        2: "first copy<" + batch_dup + ">here only in the batch",
        3: "second copy[" + batch_dup + "]also only in the batch",
        4: "a completely clean document with nothing protected",
    }
    base = {1: "eval set doc: «" + bench + "» with different flanks",
            2: "another protected doc, unrelated content entirely"}
    got = _run_against(spark, new, base, 60)
    assert got == _ref_against(new, base, 60)
    assert got[1]["dup_chars"] == 70
    assert got[1]["kept_text"] == "lead-in text before()and after it"
    # within-batch duplicate, absent from base: untouched
    assert got[2]["dup_windows"] == 0 and got[3]["dup_windows"] == 0
    assert got[4]["kept_text"] == new[4]


def test_excise_brute_force_differential(spark):
    """Seeded repeat-dense split corpus: operator equals the
    brute-force cross reference doc-for-doc, kept text included."""
    rng = random.Random(7)
    texts = {
        d: "".join(rng.choice("abc") for _ in range(rng.randint(5, 120)))
        for d in range(40)
    }
    new = {d: t for d, t in texts.items() if d % 3 == 0}
    base = {d: t for d, t in texts.items() if d % 3 != 0}
    got = _run_against(spark, new, base, 8)
    assert got == _ref_against(new, base, 8)
    assert sum(v["dup_windows"] for v in got.values()) > 50


def test_index_path_matches_direct_excision(spark, tmp_path):
    """build_window_index → parquet → substring_excise_against_index
    reproduces the two-sided substring_excise doc-for-doc (r8 — the
    steady-state recurrence the streaming gate consumes)."""
    from mints_wind_data_ingestion_spark.operators.dedup import (
        build_window_index,
        substring_excise,
        substring_excise_against_index,
    )

    rng = random.Random(11)
    texts = {
        d: "".join(rng.choice("abc") for _ in range(rng.randint(5, 120)))
        for d in range(30)
    }
    new = spark.createDataFrame(
        [(d, t) for d, t in texts.items() if d % 3 == 0],
        "doc_id int, text string")
    base = spark.createDataFrame(
        [(d, t) for d, t in texts.items() if d % 3 != 0],
        "doc_id int, text string")
    direct = {
        r["doc_id"]: tuple(r)
        for r in substring_excise(new, base, "doc_id", "text",
                                  min_len=8).collect()
    }
    build_window_index(base, "doc_id", "text", min_len=8).write.parquet(
        str(tmp_path / "widx"))
    stored = {
        r["doc_id"]: tuple(r)
        for r in substring_excise_against_index(
            new, spark.read.parquet(str(tmp_path / "widx")),
            "doc_id", "text", min_len=8).collect()
    }
    assert direct == stored
    assert any(r[2] > 0 for r in direct.values())  # non-trivial


def test_excise_ingest_stream_matches_batch(spark, tmp_path):
    """Streaming excision gate: every landed doc reaches the corpus
    (sanitize, not drop) with text equal to the batch operator's cut;
    the audit carries stats for exactly the excised docs."""
    from pyspark.sql import functions as F

    from mints_wind_data_ingestion_spark.operators.dedup import (
        build_window_index,
        substring_excise,
    )
    from mints_wind_data_ingestion_spark.streaming.pipeline import (
        run_excise_ingest,
    )

    bench = "".join(chr(ord("a") + (i * 11) % 26) for i in range(70))
    protected = spark.createDataFrame(
        [(1, "eval doc with «" + bench + "» inside"),
         (2, "another protected doc, nothing shared")],
        "doc_id long, text string")
    idx = str(tmp_path / "widx")
    build_window_index(protected, "doc_id", "text", min_len=60) \
        .write.parquet(idx)

    incoming = spark.createDataFrame(
        [(10, "contaminated(" + bench + ")document"),
         (11, "a perfectly clean training document right here"),
         (12, "short doc")],
        "doc_id long, text string")
    landing = str(tmp_path / "landing")
    incoming.filter("doc_id != 11").coalesce(1).write.mode(
        "append").parquet(landing)
    incoming.filter("doc_id = 11").coalesce(1).write.mode(
        "append").parquet(landing)
    schema = spark.read.parquet(landing).schema
    q = run_excise_ingest(
        spark, landing, str(tmp_path / "corpus"), str(tmp_path / "ckpt"),
        schema, idx, audit_path=str(tmp_path / "audit"),
    )
    q.awaitTermination(180)
    assert q.exception() is None

    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(
        str(tmp_path / "corpus")).collect()}
    want = {r["doc_id"]: r["kept_text"] for r in substring_excise(
        incoming, protected, "doc_id", "text", min_len=60).collect()}
    assert got == want                      # stream text == batch cut
    assert got[10] == "contaminated()document"
    assert got[11] == "a perfectly clean training document right here"
    assert set(got) == {10, 11, 12}         # nothing dropped
    audit = spark.read.parquet(str(tmp_path / "audit"))
    assert {r["doc_id"] for r in audit.collect()} == {10}
    assert audit.first()["dup_chars"] == 70
