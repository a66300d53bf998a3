"""Round 12: skew-proofing the frame-hash pair joins (VERDICT r11 #2).

Real video/audio corpora are Zipfian in frame hashes — black frames,
title cards and silence hash identically across thousands of clips —
so the plain inverted-index count plan's self-equi-join fans one hot
posting list of m clips into m²/2 rows. These tests plant exactly that
corpus (10³ clips sharing one constant intro-frame hash) and pin:

1. the PPJoin prefix filter keeps the CANDIDATE set bounded (the hot
   hash sorts last in the rarity order and drops out of every prefix);
2. the result is IDENTICAL to the plain count plan — the filter is
   exact, never a recall trade;
3. the two-sided (batch × stored-corpus) gate join has the same two
   properties under a corpus-side hot key.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mints_wind_data_ingestion_spark.operators.dedup import (
    _ppjoin_rs_candidates,
    _ppjoin_self_candidates,
    jaccard_join_prefix_filtered_rs,
)
from mints_wind_data_ingestion_spark.sources.multimodal import (
    video_neardup_join,
    video_neardup_pairs,
)

HOT = 0xB1AC0  # the shared "black intro frame" hash
N_CLIPS = 1000


def _hot_key_frame_table(spark, n_clips: int = N_CLIPS):
    """(doc_id, frame_idx, fhash): every clip opens on the HOT frame
    then plays 7 unique frames — except clips 1 and 2, which share 6
    of their 7 uniques (the one planted near-dup pair: |∩| = 7 of
    |∪| = 9 → jaccard 7/9)."""
    rows = []
    for i in range(n_clips):
        rows.append((i, 0, HOT))
        for j in range(7):
            if i == 2 and j < 6:
                fh = 1_000_000 + 1 * 10_000 + j  # clip 1's frames
            else:
                fh = 1_000_000 + i * 10_000 + j
            rows.append((i, j + 1, fh))
    return spark.createDataFrame(
        rows, "doc_id long, frame_idx int, fhash long"
    )


def test_hot_key_candidates_bounded(spark):
    frames = _hot_key_frame_table(spark)
    sets = (
        frames.groupBy("doc_id")
        .agg(F.array_distinct(F.collect_set("fhash")).alias("__sh"))
        .select(
            F.col("doc_id").alias("__id"),
            "__sh",
            F.size("__sh").alias("__n"),
        )
    )
    n_cands = _ppjoin_self_candidates(sets, 0.5).count()
    # plain count plan: the hot posting list alone meets itself in
    # ~N²/2 = 499 500 join rows; the prefix filter must keep only
    # pairs meeting on RARE hashes — here just the planted pair
    assert n_cands < 50, n_cands
    assert n_cands >= 1


def test_hot_key_prefix_equals_uniform(spark):
    frames = _hot_key_frame_table(spark, n_clips=200)
    got_p = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in video_neardup_pairs(frames, method="prefix").collect()
    )
    got_u = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in video_neardup_pairs(frames, method="uniform").collect()
    )
    assert got_p == got_u == [(1, 2, round(7 / 9, 9))]


def test_hot_key_rs_candidates_bounded_and_exact(spark):
    """Corpus-side hot key: 500 stored clips all open on the HOT
    frame; a 10-clip batch also opens on it. The plain postings join
    fans 10 × 500 through the hot hash; the R-S prefix filter must
    keep candidates bounded AND return the identical hit set."""
    stored_rows = [
        (10_000 + i, [HOT] + [2_000_000 + i * 100 + j for j in range(7)])
        for i in range(500)
    ]
    batch_rows = [
        (i, [HOT] + [3_000_000 + i * 100 + j for j in range(7)])
        for i in range(10)
    ]
    # plant: batch clip 5 is a re-cut of stored clip 10_007
    batch_rows[5] = (5, [HOT] + [2_000_000 + 7 * 100 + j for j in range(6)])
    stored = spark.createDataFrame(
        stored_rows, "__oid long, __fh array<long>"
    )
    batch = spark.createDataFrame(batch_rows, "doc_id long, __fh array<long>")

    sets_n = batch.select(
        F.col("doc_id").alias("__id"),
        F.array_distinct("__fh").alias("__sh"),
    ).withColumn("__n", F.size("__sh"))
    sets_s = stored.select(
        F.col("__oid").alias("__id"),
        F.array_distinct("__fh").alias("__sh"),
    ).withColumn("__n", F.size("__sh"))
    n_cands = _ppjoin_rs_candidates(sets_n, sets_s, 0.5).count()
    assert n_cands < 50, n_cands  # plain join: ≥ 5 000 via HOT alone

    got_p = sorted(
        (r["doc_id"], r["__oid"], round(r["jaccard"], 9))
        for r in video_neardup_join(batch, stored, method="prefix").collect()
    )
    got_u = sorted(
        (r["doc_id"], r["__oid"], round(r["jaccard"], 9))
        for r in video_neardup_join(batch, stored, method="uniform").collect()
    )
    # |∩| = 6 uniques + HOT = 7; |∪| = 7 + 8 - 7 = 8
    assert got_p == got_u == [(5, 10_007, round(7 / 8, 9))]


def test_rs_duplicate_array_entries_do_not_understate_jaccard(spark):
    """ADVICE r11: an input signature ARRAY with repeated hashes must
    not inflate the set size — both size and intersection are computed
    over the de-duplicated set, in both methods."""
    batch = spark.createDataFrame(
        [(1, [7, 7, 7, 8, 9, 9])], "doc_id long, __fh array<long>"
    )
    stored = spark.createDataFrame(
        [(100, [7, 8, 9, 10])], "__oid long, __fh array<long>"
    )
    for method in ("prefix", "uniform"):
        rows = video_neardup_join(
            batch, stored, threshold=0.5, method=method
        ).collect()
        # sets {7,8,9} vs {7,8,9,10}: jaccard 3/4 — the raw-size bug
        # computed 3/(6+4-3) = 3/7 < 0.5 and dropped the pair
        assert [(r["doc_id"], r["__oid"]) for r in rows] == [(1, 100)], method
        assert rows[0]["jaccard"] == pytest.approx(3 / 4)


def test_repeated_composite_builds_do_not_grow_cache(spark):
    """VERDICT r11 #5: rebuilding a mid-plan-caching composite in one
    session must REPLACE its cache entries, not stack new ones —
    managed_cache bounds live entries by distinct plan, not by build
    count."""
    import os

    from mints_wind_data_ingestion_spark.plans.registry import REGISTRY

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    jsc = spark.sparkContext._jsc.sc()

    def n_persistent() -> int:
        return jsc.getPersistentRDDs().size()

    counts = []
    for _ in range(3):
        REGISTRY["x_layout_mm_suite"].build(spark, sf_dir).count()
        counts.append(n_persistent())
    # first build establishes the steady state; rebuilds must not grow
    assert counts[1] == counts[2] == counts[0], counts


def test_ivfpq_matches_exact_ivf_and_prunes(spark):
    """IVFPQ (VERDICT r11 #3): the composed probe→ADC→rerank pipeline
    must (a) partition-prune its codes scan to the probed cells, and
    (b) at shortlist=30 return the IDENTICAL top-10 to the exact-
    vector IVF probe of the same cells — the PQ compression costs no
    recall beyond the coarse pruning both share."""
    import os

    from mints_wind_data_ingestion_spark.plans.registry import REGISTRY

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    ivfpq_df = REGISTRY["x_ivfpq_topk"].build(spark, sf_dir)
    plan = ivfpq_df._jdf.queryExecution().executedPlan().toString()
    assert (
        "dynamicpruning" in plan.lower()
        or "PartitionFilters: [isnotnull(cell" in plan
    )
    ivf = {
        (r.query_id, r.neighbor_id, r.cosine_sim)
        for r in REGISTRY["x_sim_topk_ivf_index"].build(spark, sf_dir).collect()
    }
    ivfpq = {
        (r.query_id, r.neighbor_id, r.cosine_sim)
        for r in ivfpq_df.collect()
    }
    assert ivfpq == ivf


def test_prefix_rs_function_direct(spark):
    """jaccard_join_prefix_filtered_rs with custom column names."""
    new = spark.createDataFrame(
        [("a", [1, 2, 3, 4])], "nid string, sig array<int>"
    )
    stored = spark.createDataFrame(
        [("x", [1, 2, 3, 9]), ("y", [50, 60, 70, 80])],
        "sid string, sig array<int>",
    )
    rows = jaccard_join_prefix_filtered_rs(
        new, stored, "nid", "sid", "sig", 0.5
    ).collect()
    assert [(r.nid, r.sid) for r in rows] == [("a", "x")]
    assert rows[0].jaccard == pytest.approx(3 / 5)
