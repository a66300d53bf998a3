"""Property-based round-trips for the r12 codecs (hypothesis):
arbitrary int16 signals and uint8 frames must survive
encode→decode — FLAC bit-exactly, G.711 idempotently on its own
decode levels, MJPEG-AVI with bounded dHash drift. The fuzz sweep
(test_multimodal_fuzz) covers corruption; these cover the VALID-input
envelope (odd lengths, extremes, multichannel, tiny frames)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from mints_wind_data_ingestion_spark.sources.flaccodec import (
    decode_flac,
    encode_flac,
)
from mints_wind_data_ingestion_spark.sources.multimodal import (
    _g711_table,
    decode_audio,
    dhash64,
    encode_mjpeg_avi,
    encode_wav_g711,
    sample_video_frames,
)

_SETTINGS = dict(max_examples=40, deadline=None)


@settings(**_SETTINGS)
@given(
    sig=arrays(
        np.int16,
        st.integers(min_value=1, max_value=3000),
        elements=st.integers(min_value=-32768, max_value=32767),
    ),
    ch=st.integers(min_value=1, max_value=3),
    bs=st.sampled_from([192, 256, 577, 4096]),
)
def test_flac_round_trip_property(sig, ch, bs):
    s = np.stack([np.roll(sig, i) for i in range(ch)], axis=1)
    d = decode_flac(encode_flac(s, 8000, block_size=bs))
    back = np.round(d["waveform"] * 32768.0).astype(np.int16)
    assert d["n_channels"] == ch
    assert np.array_equal(back, s)


@settings(**_SETTINGS)
@given(
    sig=arrays(
        np.int16,
        st.integers(min_value=1, max_value=2000),
        elements=st.integers(min_value=-32768, max_value=32767),
    ),
    law=st.sampled_from(["ulaw", "alaw"]),
)
def test_g711_idempotent_on_levels_property(sig, law):
    """One companding pass quantizes; a SECOND pass is exact (the
    signal is already on the 256 decode levels)."""
    once = np.round(
        decode_audio(encode_wav_g711(sig, law=law))["waveform"][:, 0]
        * 32768.0
    ).astype(np.int16)
    twice = np.round(
        decode_audio(encode_wav_g711(once, law=law))["waveform"][:, 0]
        * 32768.0
    ).astype(np.int16)
    assert np.array_equal(once, twice)
    # every decoded sample is a genuine table level
    levels = set(int(v) for v in _g711_table(law))
    assert all(int(v) in levels for v in once)


@settings(**_SETTINGS)
@given(
    h=st.integers(min_value=8, max_value=40),
    w=st.integers(min_value=8, max_value=40),
    n=st.integers(min_value=1, max_value=5),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_mjpeg_avi_round_trip_property(h, w, n, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w), dtype=np.uint8)
    # smooth-ish frames (JPEG-friendly): cumulative sums wrap via uint8
    frames = [((base.astype(np.int64) + 5 * i) % 256).astype(np.uint8)
              for i in range(n)]
    back = sample_video_frames(encode_mjpeg_avi(frames, quality=95), 1)
    assert [i for i, _ in back] == list(range(n))
    for (_, yb), orig in zip(back, frames):
        assert yb.shape == orig.shape
        assert bin(dhash64(yb) ^ dhash64(orig)).count("1") <= 6
