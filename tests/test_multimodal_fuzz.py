"""Corruption fuzz over the native multimodal decoders (round 7) —
same contract as the GRIB quarantine fuzz: a corrupt BMP/PNM/WAV/Y4M
payload either decodes or raises inside MM_DECODE_ERRORS (what the
transform UDTFs convert to NULL rows) — never a hang, never a foreign
exception that would kill the Arrow batch."""

from __future__ import annotations

import random
import struct
import time

import numpy as np
import pytest

from mints_wind_data_ingestion_spark.sources import multimodal as mm


def _payloads():
    px = (np.arange(16 * 12 * 3, dtype=np.int64) % 256).astype(
        np.uint8
    ).reshape(12, 16, 3)
    pcm = (np.sin(np.arange(2000) / 10) * 3000).astype("<i2").tobytes()
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    y4m = (
        b"YUV4MPEG2 W16 H12 F25:1 Ip A1:1 C420\n"
        + b"".join(b"FRAME\n" + bytes(16 * 12 * 3 // 2) for _ in range(4))
    )
    from mints_wind_data_ingestion_spark.sources.flaccodec import encode_flac
    from mints_wind_data_ingestion_spark.sources.gifcodec import (
        encode_gif,
        encode_gif_frames,
    )
    from mints_wind_data_ingestion_spark.sources.jpegcodec import encode_jpeg
    from mints_wind_data_ingestion_spark.sources.tiffcodec import encode_tiff
    from mints_wind_data_ingestion_spark.sources.webpcodec import encode_webp

    samples = np.frombuffer(pcm, dtype="<i2")
    return [
        (mm.encode_bmp(px), "img"),
        # r13 codecs: GIF (still + animated), baseline TIFF
        (encode_gif(px[:, :, 0]), "img"),
        (encode_tiff(px, compression="lzw", predictor=True), "img"),
        (encode_tiff(px[:, :, 0], compression="packbits"), "img"),
        (encode_gif_frames([px[:, :, 0], px[:, :, 1]]), "vid"),
        # r14 codec: lossless WebP (plain + palette-bundled)
        (encode_webp(px), "img"),
        (encode_webp((px[:, :, 0] // 32) * 32, use_palette=True), "img"),
        (b"P6\n16 12\n255\n" + px.tobytes(), "img"),
        (b"P5\n# c\n16 12 255\n" + px[:, :, 0].tobytes(), "img"),
        (encode_jpeg(px, quality=85, subsampling="4:2:0"), "img"),
        (encode_jpeg(px[:, :, 0], quality=85, restart_interval=1), "img"),
        (wav, "aud"),
        # r12 codecs: G.711 (both laws), FLAC, MJPEG-in-AVI
        (mm.encode_wav_g711(samples, law="ulaw"), "aud"),
        (mm.encode_wav_g711(samples, law="alaw"), "aud"),
        (encode_flac(samples, 8000, block_size=512), "aud"),
        (y4m, "vid"),
        (mm.encode_mjpeg_avi(
            [px[:, :, 0], (px[:, :, 1] // 2)], quality=85
        ), "vid"),
    ]


def test_corrupt_payloads_stay_inside_quarantine_class():
    rng = random.Random(20260815)
    payloads = _payloads()
    dec = {
        "img": mm.decode_image,
        "aud": mm.decode_audio,
        "vid": lambda p: mm.sample_video_frames(p, 2),
    }
    quarantined = ok = 0
    for _ in range(8000):
        base, kind = payloads[rng.randrange(len(payloads))]
        b = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            b[rng.randrange(0, len(b))] = rng.randrange(256)
        t0 = time.perf_counter()
        try:
            dec[kind](bytes(b))
            ok += 1
        except mm.MM_DECODE_ERRORS:
            quarantined += 1
        # anything else propagates and fails the test
        assert time.perf_counter() - t0 < 3.0, "per-payload stall"
    assert quarantined > 300 and ok > 300


def test_wav_zero_channels_quarantines():
    """A corrupt fmt chunk claiming 0 channels must raise inside the
    quarantine class, not ZeroDivisionError."""
    pcm = bytes(100)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 0, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    with pytest.raises(ValueError, match="0 channels"):
        mm.decode_audio(wav)


def test_wav_bad_bit_depth_quarantines():
    """bits outside {8,16,32} surfaces KeyError — inside
    MM_DECODE_ERRORS, so the UDTF boundary still quarantines it."""
    pcm = bytes(100)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 24)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    with pytest.raises(mm.MM_DECODE_ERRORS):
        mm.decode_audio(wav)


def test_gif_decompression_bomb_header_refused_fast():
    """ADVICE r13: a 5-byte header edit can demand a 65535x65535
    (~12.9 GB RGB) canvas; MemoryError is NOT a quarantine class, so
    the guard must raise ValueError BEFORE any allocation."""
    from mints_wind_data_ingestion_spark.sources.gifcodec import (
        decode_gif,
        encode_gif,
    )

    px = (np.arange(8 * 8, dtype=np.int64) % 256).astype(np.uint8)
    gif = bytearray(encode_gif(px.reshape(8, 8)))
    struct.pack_into("<HH", gif, 6, 65535, 65535)  # logical screen
    t0 = time.perf_counter()
    with pytest.raises(ValueError, match="decompression-bomb"):
        decode_gif(bytes(gif))
    assert time.perf_counter() - t0 < 0.5
    with pytest.raises(mm.MM_DECODE_ERRORS):
        mm.decode_image(bytes(gif))  # the UDTF boundary class covers it


def test_tiff_decompression_bomb_header_refused_fast():
    """TIFF width/height are 32-bit LONGs — an 8-byte edit can demand
    a canvas in the hundreds of GB. Guard raises before allocating."""
    from mints_wind_data_ingestion_spark.sources.tiffcodec import (
        decode_tiff,
        encode_tiff,
    )

    px = (np.arange(8 * 8, dtype=np.int64) % 256).astype(
        np.uint8
    ).reshape(8, 8)
    tif = bytearray(encode_tiff(px))
    # little-endian classic TIFF: find the IFD and patch tags 256/257
    (ifd_off,) = struct.unpack_from("<I", tif, 4)
    (n_entries,) = struct.unpack_from("<H", tif, ifd_off)
    patched = 0
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        (tag,) = struct.unpack_from("<H", tif, e)
        if tag in (256, 257):  # ImageWidth / ImageLength
            struct.pack_into("<HHII", tif, e, tag, 4, 1, 500_000)
            patched += 1
    assert patched == 2
    t0 = time.perf_counter()
    with pytest.raises(ValueError, match="decompression-bomb"):
        decode_tiff(bytes(tif))
    assert time.perf_counter() - t0 < 0.5


def test_lzw_table_capped_at_4096_entries():
    """ADVICE r13: both LZW decoders must stop growing the code table
    at the 12-bit boundary (compliant writers CLEAR before it), so a
    CLEAR-free corrupt stream cannot build unboundedly long entries.
    Large images exercise the cap on the normal path: the encoders DO
    emit clear-on-full, and round-trips must stay bit-exact."""
    from mints_wind_data_ingestion_spark.sources.gifcodec import (
        decode_gif,
        encode_gif,
    )
    from mints_wind_data_ingestion_spark.sources.tiffcodec import (
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.default_rng(20260816)
    # enough entropy to fill the 4096-entry table several times over
    g = rng.integers(0, 256, size=(200, 300), dtype=np.uint8)
    gif_px = decode_gif(encode_gif(g))["pixels"]  # RGB canvas
    assert np.array_equal(gif_px[:, :, 0], g)
    assert np.array_equal(gif_px[:, :, 0], gif_px[:, :, 1])
    out = decode_tiff(encode_tiff(g, compression="lzw"))
    assert np.array_equal(out["pixels"], g)
