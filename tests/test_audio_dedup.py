"""Audio fingerprint near-dup (late r11). The registry differential
pins x_audio_sig/x_audio_dedup against their replica oracles; these
tests pin SEMANTICS (planted-sibling recovery, trim robustness,
quarantine, discrimination) and the streaming ingest gate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mints_wind_data_ingestion_spark.plans.extensions import (
    _AUD_SIB_OFFSET,
    audio_pairs_local,
    synth_audio_segments,
)
from mints_wind_data_ingestion_spark.sources.multimodal import (
    audio_fingerprint,
    audio_fingerprint_df,
    decode_audio,
    encode_wav_pcm16,
    video_neardup_pairs,
)


def test_wav_round_trip_is_fingerprint_exact():
    wave = synth_audio_segments(45, 0)
    direct = audio_fingerprint(wave.astype(np.float64) / 32768.0)
    via_wav = audio_fingerprint(
        decode_audio(encode_wav_pcm16(wave))["waveform"]
    )
    assert direct == via_wav and len(direct) == 8


def test_sibling_pairs_recovered(spark):
    rows = []
    for i in (5, 15, 25, 45, 85):
        for sib in (0, 1) if i % 40 == 5 else (0,):
            rows.append(
                (i + sib * _AUD_SIB_OFFSET,
                 bytearray(encode_wav_pcm16(synth_audio_segments(i, sib)))),
            )
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = video_neardup_pairs(
        audio_fingerprint_df(df), threshold=0.5
    ).collect()
    assert sorted((r.id_a, r.id_b) for r in pairs) == [
        (5, 5 + _AUD_SIB_OFFSET),
        (45, 45 + _AUD_SIB_OFFSET),
        (85, 85 + _AUD_SIB_OFFSET),
    ]
    for r in pairs:
        assert r.jaccard >= 0.5


def test_trim_robustness(spark):
    """A clip trimmed by exactly one frame keeps every remaining
    fingerprint — the set model pairs it with the original."""
    wave = synth_audio_segments(15, 0)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav_pcm16(wave))),
            (2, bytearray(encode_wav_pcm16(wave[512:]))),
        ],
        "doc_id long, payload binary",
    )
    pairs = video_neardup_pairs(audio_fingerprint_df(df)).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]


def test_corrupt_payload_quarantined(spark):
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav_pcm16(synth_audio_segments(5, 0)))),
            (2, bytearray(b"fLaC not a wav")),
            (3, bytearray(encode_wav_pcm16(np.zeros(100, "<i2"))[:30])),
        ],
        "doc_id long, payload binary",
    )
    out = audio_fingerprint_df(df).toPandas()
    assert out[out.doc_id == 1].fhash.notna().all()
    for bad in (2, 3):
        rows = out[out.doc_id == bad]
        assert len(rows) == 1 and rows.fhash.isna().all()


def test_replica_brute_force_matches_engine(spark, sf_dir):
    from mints_wind_data_ingestion_spark.plans import REGISTRY

    eng = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 12))
        for r in REGISTRY["x_audio_dedup"].build(spark, sf_dir).collect()
    )
    rep = sorted((a, b, round(j, 12)) for a, b, j in audio_pairs_local(sf_dir))
    assert eng == rep and len(eng) >= 1


def test_audio_ingest_gate(spark, sf_dir, tmp_path):
    """The audio twin of the video gate: planted siblings streamed in
    3 chunks, corrupt payload quarantined, replay byte-identical."""
    from mints_wind_data_ingestion_spark.plans.extensions import (
        _audio_corpus,
    )
    from mints_wind_data_ingestion_spark.streaming.pipeline import (
        run_audio_dedup_ingest,
    )

    corpus_df = _audio_corpus(spark, sf_dir)
    landing = str(tmp_path / "landing")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    quar = str(tmp_path / "quarantine")
    # 7 chunks: the sibling offset (30 000 000) is ≡ 2 (mod 7), so
    # planted pairs straddle epochs and the cross-epoch join is
    # exercised (mod 3 and mod 4 both divide the offset and would put
    # every sibling in its twin's chunk)
    for i in range(7):
        chunk = corpus_df.filter(F.pmod("doc_id", F.lit(7)) == i)
        if i == 0:
            chunk = chunk.unionByName(
                spark.createDataFrame(
                    [(999_999_999, bytearray(b"not audio"))],
                    "doc_id long, payload binary",
                )
            )
        chunk.coalesce(1).write.mode("append").parquet(landing)

    schema = spark.read.parquet(landing).schema
    q = run_audio_dedup_ingest(
        spark, landing, corpus, ckpt, schema, quarantine_path=quar
    )
    q.awaitTermination(240)

    kept = spark.read.parquet(corpus)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert "fhashes" in kept.columns

    all_ids = {int(r.doc_id) for r in corpus_df.select("doc_id").collect()}
    planted = {i for i in all_ids if i < _AUD_SIB_OFFSET and i % 40 == 5}
    clean = all_ids - planted - {i + _AUD_SIB_OFFSET for i in planted}
    assert planted, "fixture must plant sibling pairs"
    assert clean <= kept_ids
    for i in planted:  # exactly one of each planted pair survives
        assert (i in kept_ids) != (i + _AUD_SIB_OFFSET in kept_ids)
    assert 999_999_999 not in kept_ids

    quarantined = {r.doc_id: r for r in spark.read.parquet(quar).collect()}
    assert quarantined[999_999_999].reason == "undecodable"
    for i in planted:  # the dropped twin names its survivor
        dropped = i + _AUD_SIB_OFFSET if i in kept_ids else i
        surv = i if i in kept_ids else i + _AUD_SIB_OFFSET
        row = quarantined[dropped]
        assert row.best_match == surv and row.jaccard >= 0.5
        assert row.reason in ("batch_dup", "corpus_dup")
    assert any(
        quarantined[i + _AUD_SIB_OFFSET if i in kept_ids else i].reason
        == "corpus_dup"
        for i in planted
    )

    # replay: byte-identical corpus
    before = sorted(kept_ids)
    q2 = run_audio_dedup_ingest(
        spark, landing, corpus, ckpt, schema, quarantine_path=quar
    )
    q2.awaitTermination(240)
    assert sorted(
        r.doc_id for r in spark.read.parquet(corpus).collect()
    ) == before
