"""Video near-dup (r11): frame-sampled dHash signatures + frame-set
Jaccard pairs. The registry differential (test_correctness) already
pins x_video_sig/x_video_dedup against their replica oracles; these
tests pin the SEMANTICS: planted-sibling recovery, trim robustness of
the set model, and the quarantine contract."""

from __future__ import annotations

import numpy as np
import pytest

from mints_wind_data_ingestion_spark.plans.extensions import (
    _VID_SIB_OFFSET,
    synth_video_frames,
    video_pairs_local,
)
from mints_wind_data_ingestion_spark.sources.multimodal import (
    dhash64,
    encode_y4m_gray,
    sample_video_frames,
    video_dhash_df,
    video_neardup_pairs,
)


def test_container_round_trip():
    frames = synth_video_frames(40, 0)
    back = sample_video_frames(encode_y4m_gray(frames), every_n=1)
    assert len(back) == len(frames)
    for (idx, y), orig in zip(back, frames):
        assert (y == orig).all()


def test_sibling_pairs_recovered(spark):
    rows = []
    for i in (10, 20, 30, 40, 80):
        for sib in (0, 1) if i % 40 == 0 else (0,):
            rows.append(
                (i + sib * _VID_SIB_OFFSET,
                 bytearray(encode_y4m_gray(synth_video_frames(i, sib)))),
            )
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = video_dhash_df(df)
    pairs = video_neardup_pairs(hashes, threshold=0.5).collect()
    # exactly the two planted (i, sibling) pairs; 6/8 shared frames
    assert sorted((r.id_a, r.id_b) for r in pairs) == [
        (40, 40 + _VID_SIB_OFFSET),
        (80, 80 + _VID_SIB_OFFSET),
    ]
    for r in pairs:
        assert r.jaccard == pytest.approx(0.6)


def test_trim_robustness(spark):
    """A head-trimmed re-cut keeps every remaining frame hash, so the
    SET model still pairs it — the property frame-index alignment
    would lose."""
    frames = synth_video_frames(10, 0)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_y4m_gray(frames))),
            (2, bytearray(encode_y4m_gray(frames[1:]))),  # trim frame 0
        ],
        "doc_id long, payload binary",
    )
    pairs = video_neardup_pairs(video_dhash_df(df), threshold=0.5).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]
    assert pairs[0].jaccard == pytest.approx(7 / 8)  # 7 shared of 8 total


def test_corrupt_payload_quarantined(spark):
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_y4m_gray(synth_video_frames(10, 0)))),
            (2, bytearray(b"MP4 ftyp not y4m")),
            (3, bytearray(b"YUV4MPEG2 W24 H20\nFRAME\n\x00\x01")),  # truncated
        ],
        "doc_id long, payload binary",
    )
    out = video_dhash_df(df).toPandas()
    good = out[out.doc_id == 1]
    assert len(good) == 8 and good.fhash.notna().all()
    for bad_id in (2, 3):
        bad = out[out.doc_id == bad_id]
        assert len(bad) == 1 and bad.fhash.isna().all()
    # quarantined rows drop out of the pair stage, never poison it
    pairs = video_neardup_pairs(video_dhash_df(df)).collect()
    assert pairs == []


def test_replica_brute_force_matches_engine(spark, sf_dir):
    """Belt-and-braces beyond the oracle hash: the brute-force replica
    pair list equals the engine's, tuple for tuple."""
    from mints_wind_data_ingestion_spark.plans import REGISTRY

    eng = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 12))
        for r in REGISTRY["x_video_dedup"].build(spark, sf_dir).collect()
    )
    rep = sorted((a, b, round(j, 12)) for a, b, j in video_pairs_local(sf_dir))
    assert eng == rep and len(eng) >= 1


def test_dhash_frame_independence():
    """Edited frames change ONLY their own hash (the property the set
    model depends on)."""
    a = [dhash64(f) for f in synth_video_frames(40, 0)]
    b = [dhash64(f) for f in synth_video_frames(40, 1)]
    assert [i for i in range(8) if a[i] != b[i]] == [2, 5]
