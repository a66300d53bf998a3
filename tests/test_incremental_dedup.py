"""Incremental (cross-corpus) MinHash dedup —
operators.dedup.minhash_dedup_pairs_against (round 7).

Semantics pinned: only NEW×BASE pairs are reported (within-batch and
within-base near-dups are the self-dedup operator's job), jaccard is
the exact verified value, and the cross path agrees pair-for-pair
with the exact cross all-pairs join on the real testdata corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mints_wind_data_ingestion_spark.functions.text import (
    shingle_docs_pandas,
)
from mints_wind_data_ingestion_spark.operators.dedup import (
    minhash_dedup_pairs,
    minhash_dedup_pairs_against,
)

A = "the quick brown fox jumps over the lazy dog again and again today"
A_NEAR = "the quick brown fox jumps over the lazy dog again and again now"
B = "completely different text about spark physical plans and shuffles"
B_NEAR = "completely different text about spark physical plans and stages"


def _sh(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return shingle_docs_pandas(df, "doc_id", "text", 3, out="shingles")


def test_cross_pairs_only(spark):
    """new contains a near-dup of a base doc AND an internal near-dup
    pair; only the cross pair comes back, with its exact jaccard."""
    base = _sh(spark, [(1, A), (2, B)])
    new = _sh(spark, [(10, A_NEAR), (11, B), (12, B_NEAR)])
    out = minhash_dedup_pairs_against(
        new, base, "doc_id", "shingles", threshold=0.5,
        num_hashes=96, bands=16, rows_per_band=6,
    ).collect()
    got = {(r["id_new"], r["id_base"]): r["jaccard"] for r in out}
    assert set(got) == {(10, 1), (11, 2), (12, 2)}
    assert got[(11, 2)] == 1.0  # exact copy of a base doc
    # 11 and 12 are near-dups WITHIN new — not reported here...
    assert all(k[0] != 11 or k[1] != 12 for k in got)
    # ...but the self-dedup operator composes for that
    within = minhash_dedup_pairs(
        new, "doc_id", "shingles", threshold=0.5,
        num_hashes=96, bands=16, rows_per_band=6,
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in within} == {(11, 12)}


def test_exact_jaccard_value(spark):
    base = _sh(spark, [(1, A)])
    new = _sh(spark, [(10, A_NEAR)])
    out = minhash_dedup_pairs_against(
        new, base, "doc_id", "shingles", threshold=0.5,
        num_hashes=96, bands=16, rows_per_band=6,
    ).collect()
    # 13 tokens → 11 distinct 3-shingles per doc ("again and again"
    # windows overlap); only the final shingle ("and again today" vs
    # "and again now") differs: |A∩B| = 10, |A∪B| = 12
    assert len(out) == 1
    assert out[0]["jaccard"] == pytest.approx(10 / 12)


def test_matches_exact_cross_join_on_testdata(spark, sf_dir):
    """Recall check on the real corpus: the banded cross path finds
    exactly the pairs the exact (inverted-index) cross join finds at
    threshold 0.5 — same split as the driver suite."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    inc = shingle_docs_pandas(
        docs.filter(F.col("doc_id") % 3 == 0), "doc_id", "text", 3,
        out="shingles")
    base = shingle_docs_pandas(
        docs.filter(F.col("doc_id") % 3 != 0), "doc_id", "text", 3,
        out="shingles")
    got = {
        (r["id_new"], r["id_base"])
        for r in minhash_dedup_pairs_against(
            inc, base, "doc_id", "shingles", threshold=0.5,
            num_hashes=96, bands=16, rows_per_band=6,
        ).collect()
    }
    # exact reference: distinct-shingle posting intersection counts
    sets = inc.unionByName(base).select(
        "doc_id", F.array_distinct("shingles").alias("sh")
    )
    post = sets.select("doc_id", F.explode("sh").alias("s"))
    sizes = sets.select("doc_id", F.size("sh").alias("n"))
    inter = (
        post.alias("a").join(post.alias("b"), "s")
        .filter((F.col("a.doc_id") % 3 == 0) & (F.col("b.doc_id") % 3 != 0))
        .groupBy(F.col("a.doc_id").alias("id_new"),
                 F.col("b.doc_id").alias("id_base"))
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    want = {
        (r["id_new"], r["id_base"])
        for r in inter
        .join(sizes.withColumnRenamed("doc_id", "id_new")
              .withColumnRenamed("n", "na"), "id_new")
        .join(sizes.withColumnRenamed("doc_id", "id_base")
              .withColumnRenamed("n", "nb"), "id_base")
        .filter(F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni"))
                >= 0.5)
        .collect()
    }
    assert got == want and len(want) > 0


def test_overlapping_id_spaces_verify_per_side(spark):
    """ADVICE r7: an id present in BOTH corpora with DIFFERENT content
    must verify each side against its own postings — the old unioned
    verify merged the two docs' shingle sets into one corrupted set.
    Here id 1 is doc A in base but doc B in new: the (1, 1) self-pair
    must NOT be reported (A vs B share nothing), while new id 1's true
    match against base id 2 (B) must come back at jaccard 1.0 — under
    a unioned verify its size would double and the value would sink."""
    base = _sh(spark, [(1, A), (2, B)])
    new = _sh(spark, [(1, B), (3, A_NEAR)])
    out = minhash_dedup_pairs_against(
        new, base, "doc_id", "shingles", threshold=0.5,
        num_hashes=96, bands=16, rows_per_band=6,
    ).collect()
    got = {(r["id_new"], r["id_base"]): r["jaccard"] for r in out}
    assert set(got) == {(1, 2), (3, 1)}
    assert got[(1, 2)] == 1.0  # exact copy, per-side sizes intact


def test_same_id_same_doc_reports_already_ingested(spark):
    """When the two corpora genuinely share ids (re-ingest), the
    id_new == id_base pair is the 'already ingested' answer and
    carries the true jaccard of the two versions."""
    base = _sh(spark, [(7, A)])
    new = _sh(spark, [(7, A_NEAR)])
    out = minhash_dedup_pairs_against(
        new, base, "doc_id", "shingles", threshold=0.5,
        num_hashes=96, bands=16, rows_per_band=6,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_new"], r["id_base"]) == (7, 7)
    assert 0.5 <= r["jaccard"] < 1.0


def test_persisted_index_path_matches_direct(spark, tmp_path, sf_dir):
    """minhash_index → parquet → minhash_dedup_pairs_against_index
    reproduces minhash_dedup_pairs_against pair-for-pair on the real
    testdata corpus — the steady-state recurrence is semantically the
    same operator, minus the base-side rebuild (r8)."""
    from pyspark.sql import functions as F

    from mints_wind_data_ingestion_spark.operators.dedup import (
        minhash_dedup_pairs_against_index,
        minhash_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = shingle_docs_pandas(
        docs.filter(F.col("doc_id") % 3 == 0), "doc_id", "text", 3,
        out="shingles")
    base = shingle_docs_pandas(
        docs.filter(F.col("doc_id") % 3 != 0), "doc_id", "text", 3,
        out="shingles")
    params = dict(num_hashes=96, bands=16, rows_per_band=6)
    direct = {
        (r["id_new"], r["id_base"]): r["jaccard"]
        for r in minhash_dedup_pairs_against(
            new, base, "doc_id", "shingles", 0.5, **params).collect()
    }
    posting, buckets = minhash_index(base, "doc_id", "shingles", **params)
    posting.write.parquet(str(tmp_path / "posting"))
    buckets.write.parquet(str(tmp_path / "buckets"))
    spark.catalog.clearCache()
    stored = {
        (r["id_new"], r["id_base"]): r["jaccard"]
        for r in minhash_dedup_pairs_against_index(
            new,
            spark.read.parquet(str(tmp_path / "posting")),
            spark.read.parquet(str(tmp_path / "buckets")),
            "doc_id", "shingles", 0.5, **params).collect()
    }
    assert direct == stored and direct  # non-trivial pair set
