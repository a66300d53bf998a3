"""External-decoder dispatch branches (VERDICT r13 next-round #6).

The MP3/AAC-class import gates in sources/multimodal.py have two
halves: the typed NotImplementedError when the external lib is absent
(exercised by every quarantine test in this container, which ships
neither PIL nor soundfile) and the DISPATCH branch when it is present
— which, until r14, had no executed test anywhere. These tests run
the dispatch half, skipping cleanly where the lib is missing, so a
CI-style environment with PIL/soundfile installed executes them.

Bonus where PIL exists: libwebp-backed cross-validation of the
engine's own VP8L codec — the independent-decoder check the r14
webpcodec provenance note defers to exactly this test.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mints_wind_data_ingestion_spark.sources import multimodal as mm


def test_image_dispatch_to_pil():
    """A P3 (ASCII) PPM has no native decoder — it must reach the PIL
    dispatch branch and decode there."""
    Image = pytest.importorskip("PIL.Image")  # noqa: F841
    payload = b"P3\n2 2\n255\n" + b" ".join(
        str(v).encode() for v in range(12)
    )
    out = mm.decode_image(payload)
    assert (out["width"], out["height"]) == (2, 2)
    assert np.asarray(out["pixels"]).reshape(2, 2, 3)[1, 1, 2] == 11


def test_webp_cross_validated_against_libwebp():
    """Where PIL (libwebp) exists, the engine's VP8L encoder output
    must decode bit-identically in the independent decoder — the
    PNG/JPEG javax.imageio recipe applied to WebP."""
    Image = pytest.importorskip("PIL.Image")
    from io import BytesIO

    from mints_wind_data_ingestion_spark.sources.webpcodec import encode_webp

    rng = np.random.default_rng(20260816)
    for kw in (
        {},
        {"use_palette": True},
        {"subtract_green": True, "cache_bits": 5},
        {"predictor_mode": 11},
    ):
        px = rng.integers(0, 256, size=(13, 9), dtype=np.uint8)
        blob = encode_webp(px, **kw)
        img = Image.open(BytesIO(blob)).convert("RGB")
        assert np.array_equal(np.asarray(img)[:, :, 0], px), kw


def _minimal_aiff(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Hand-built FORM/AIFF (COMM with the 80-bit extended sample
    rate + SSND) — a format soundfile reads and the native WAV/FLAC
    paths do not."""
    n = len(samples)
    # 80-bit extended float for common rates: exponent + mantissa
    exp = 16398  # 2^(16398-16383) scaling places rate in the mantissa
    mant = rate << (63 - 15)
    ext = struct.pack(">Hq", exp, mant - (1 << 63))  # top bit implied
    # simpler: use the well-known byte patterns for 8000 Hz
    ext = b"\x40\x0b\xfa\x00\x00\x00\x00\x00\x00\x00"
    comm = b"COMM" + struct.pack(">IhIh", 18, 1, n, 16) + ext
    ssnd_body = struct.pack(">II", 0, 0) + samples.astype(">i2").tobytes()
    ssnd = b"SSND" + struct.pack(">I", len(ssnd_body)) + ssnd_body
    body = b"AIFF" + comm + ssnd
    return b"FORM" + struct.pack(">I", len(body)) + body


def test_audio_dispatch_to_soundfile():
    soundfile = pytest.importorskip("soundfile")  # noqa: F841
    samples = (np.sin(np.arange(400) / 5) * 8000).astype(np.int16)
    out = mm.decode_audio(_minimal_aiff(samples))
    assert out["n_samples"] == 400
    assert out["sample_rate"] == 8000


def test_gates_raise_typed_without_libs():
    """The other half of the contract, runnable everywhere: absent
    the lib, the gate names it inside the quarantine class."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: the dispatch tests above cover it")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        mm.decode_image(b"P3\n1 1\n255\n0 0 0")


def test_zstd_cross_validated_against_binding():
    """Where the `zstandard` binding (libzstd) exists, cross-validate
    both directions: our frames decode there, its frames decode here —
    the javax.imageio recipe applied to zstd."""
    zstandard = pytest.importorskip("zstandard")
    from mints_wind_data_ingestion_spark.sources.zstdcodec import (
        compress_zstd,
        decompress_zstd,
    )

    data = (b"cross-validation payload " * 400) + bytes(range(129))
    for kw in ({}, {"seq_mode": "fse"}, {"literals": "raw"},
               {"single_segment": False}):
        blob = compress_zstd(data, **kw)
        assert zstandard.ZstdDecompressor().decompress(blob) == data, kw
    for level in (1, 3, 19):
        their = zstandard.ZstdCompressor(level=level).compress(data)
        assert decompress_zstd(their) == data, level


def test_xxh64_cross_validated_against_binding():
    xxhash = pytest.importorskip("xxhash")
    from mints_wind_data_ingestion_spark.sources.zstdcodec import xxh64

    for payload in (b"", b"a", b"tail123", bytes(range(200)) * 7):
        assert xxh64(payload) == xxhash.xxh64_intdigest(payload)
