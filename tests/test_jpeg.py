"""Native baseline-JPEG codec (sources/jpegcodec.py, r11).

Verification strategy (the symmetric-bug trap): a decoder tested only
against its own encoder cannot catch errors that cancel in round-trip
(e.g. a transposed zigzag on both sides). Three independent anchors
break the symmetry:

1. the zigzag permutation and Annex-K quality scaling are pinned
   against literal spec tables typed here, not generated;
2. the 2-D DCT used in round-trip bounds is cross-checked against a
   direct O(N^4) textbook double sum written in this file;
3. the JVM's javax.imageio JPEG codec (shipped with Java 17, already
   running for Spark) decodes our encoder's output and encodes
   streams for our decoder — full third-party interop both ways,
   bulk-transferred via BMP so no per-pixel py4j traffic.
"""

from __future__ import annotations

import numpy as np
import pytest

from mints_wind_data_ingestion_spark.sources.jpegcodec import (
    QTABLE_LUMA,
    ZIGZAG,
    _A,
    decode_jpeg,
    encode_jpeg,
    scaled_qtable,
)
from mints_wind_data_ingestion_spark.sources.multimodal import (
    decode_image,
    dhash64,
    encode_bmp,
    _decode_bmp,
)


def _gradient_rgb(h: int = 40, w: int = 56) -> np.ndarray:
    """Smooth (wrap-free) gradients: worst case for header/layout bugs,
    easy case for the DCT, so tight error bounds are meaningful."""
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            np.clip(yy * 4, 0, 255),
            np.clip(xx * 3, 0, 255),
            np.clip(yy + xx, 0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)


def _rmse(a: np.ndarray, b: np.ndarray) -> float:
    d = a.astype(np.float64) - b.astype(np.float64)
    return float(np.sqrt((d * d).mean()))


# ---------------------------------------------------------------------------
# spec-literal anchors
# ---------------------------------------------------------------------------


def test_zigzag_matches_spec_literal():
    # ITU-T T.81 figure 5: zigzag position of each raster cell
    spec = [
        0, 1, 5, 6, 14, 15, 27, 28,
        2, 4, 7, 13, 16, 26, 29, 42,
        3, 8, 12, 17, 25, 30, 41, 43,
        9, 11, 18, 24, 31, 40, 44, 53,
        10, 19, 23, 32, 39, 45, 52, 54,
        20, 22, 33, 38, 46, 51, 55, 60,
        21, 34, 37, 47, 50, 56, 59, 61,
        35, 36, 48, 49, 57, 58, 62, 63,
    ]
    inv = np.zeros(64, dtype=np.int64)
    inv[ZIGZAG] = np.arange(64)
    assert list(inv) == spec


def test_quality_scaling_matches_ijg_formula():
    # quality 50 is the identity on Annex K values
    assert (scaled_qtable(QTABLE_LUMA, 50) == QTABLE_LUMA).all()
    # hand-computed spots: Q=90 -> scale 20; Q=10 -> scale 500
    assert scaled_qtable(QTABLE_LUMA, 90)[0] == (16 * 20 + 50) // 100
    assert scaled_qtable(QTABLE_LUMA, 10)[0] == min(255, (16 * 500 + 50) // 100)
    # everything clamps into the 8-bit DQT range
    assert (scaled_qtable(QTABLE_LUMA, 1) <= 255).all()
    assert (scaled_qtable(QTABLE_LUMA, 100) >= 1).all()
    with pytest.raises(ValueError):
        scaled_qtable(QTABLE_LUMA, 0)


def test_dct_basis_against_textbook_double_sum():
    rng = np.random.default_rng(3)
    x = rng.uniform(-128, 127, (8, 8))
    fast = _A @ x @ _A.T
    slow = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = np.sqrt(0.5) if u == 0 else 1.0
            cv = np.sqrt(0.5) if v == 0 else 1.0
            s = 0.0
            for m in range(8):
                for n in range(8):
                    s += (
                        x[m, n]
                        * np.cos((2 * m + 1) * u * np.pi / 16)
                        * np.cos((2 * n + 1) * v * np.pi / 16)
                    )
            slow[u, v] = 0.25 * cu * cv * s
    assert np.abs(fast - slow).max() < 1e-9


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------


def test_gray_round_trip():
    yy, xx = np.mgrid[0:33, 0:41]
    img = np.clip(yy * 5 + xx * 2, 0, 255).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(img, quality=95))
    assert (d["mode"], d["width"], d["height"]) == ("L", 41, 33)
    assert d["pixels"].shape == (33, 41)
    assert _rmse(d["pixels"], img) < 2.0


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("ri", [0, 3])
def test_rgb_round_trip(sub, ri):
    img = _gradient_rgb()
    d = decode_jpeg(
        encode_jpeg(img, quality=92, subsampling=sub, restart_interval=ri)
    )
    assert (d["mode"], d["width"], d["height"]) == ("RGB", 56, 40)
    assert d["pixels"].shape == (40, 56, 3)
    assert _rmse(d["pixels"], img) < (2.5 if sub == "4:4:4" else 4.0)


def test_restart_markers_change_bytes_not_pixels():
    img = _gradient_rgb()
    plain = encode_jpeg(img, quality=90)
    restarted = encode_jpeg(img, quality=90, restart_interval=2)
    assert plain != restarted
    assert b"\xff\xd0" in restarted or b"\xff\xd1" in restarted
    a = decode_jpeg(plain)["pixels"]
    b = decode_jpeg(restarted)["pixels"]
    assert (a == b).all()


def test_odd_dimensions_and_single_block():
    for h, w in [(17, 13), (8, 8), (1, 1), (9, 24)]:
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [np.clip(yy * 7, 0, 255), np.clip(xx * 9, 0, 255), (yy + xx) % 200],
            axis=-1,
        ).astype(np.uint8)
        d = decode_jpeg(encode_jpeg(img, quality=95, subsampling="4:2:0"))
        assert d["pixels"].shape == (h, w, 3)
        assert _rmse(d["pixels"], img) < 6.0


def test_noise_survives_high_quality():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(img, quality=98))
    assert _rmse(d["pixels"], img) < 4.0


def test_determinism():
    img = _gradient_rgb()
    assert encode_jpeg(img, quality=85) == encode_jpeg(img, quality=85)


# ---------------------------------------------------------------------------
# corruption / unsupported-mode quarantine contract
# ---------------------------------------------------------------------------


def test_corruption_raises_valueerror():
    img = _gradient_rgb()
    good = bytearray(encode_jpeg(img, quality=90))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good[: len(good) // 2]))  # truncated mid-scan
    # corrupt a DHT byte: either an invalid Huffman code or a
    # structurally broken table — both must surface as ValueError
    sof = bytes(good).find(b"\xff\xc4")
    bad = bytearray(good)
    bad[sof + 6] = 0xFF
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


def test_arithmetic_rejected_with_clear_error():
    img = _gradient_rgb()
    good = bytearray(encode_jpeg(img, quality=90))
    i = bytes(good).find(b"\xff\xc0")
    good[i + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic sequential)
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg(bytes(good))


def test_decode_image_dispatches_jpeg():
    img = _gradient_rgb()
    d = decode_image(encode_jpeg(img, quality=95))
    assert d["mode"] == "RGB"
    assert _rmse(d["pixels"], img) < 2.5


# ---------------------------------------------------------------------------
# dhash stability across a re-encode (VERDICT r10 #6 acceptance)
# ---------------------------------------------------------------------------


def test_dhash_stable_across_jpeg_reencode():
    from mints_wind_data_ingestion_spark.plans.extensions import (
        synth_image_pixels,
    )

    for doc_id in range(8):
        px = synth_image_pixels(doc_id, 0)
        h0 = dhash64(px)
        h1 = dhash64(decode_jpeg(encode_jpeg(px, quality=90))["pixels"])
        assert bin(h0 ^ h1).count("1") <= 6, doc_id


# ---------------------------------------------------------------------------
# third-party interop: the JVM's javax.imageio codec
# ---------------------------------------------------------------------------


def _jvm_io(spark):
    jvm = spark._jvm

    def jvm_read(b: bytes):
        return jvm.javax.imageio.ImageIO.read(
            jvm.java.io.ByteArrayInputStream(b)
        )

    def jvm_write(bimg, fmt: str) -> bytes:
        baos = jvm.java.io.ByteArrayOutputStream()
        assert jvm.javax.imageio.ImageIO.write(bimg, fmt, baos)
        return bytes(baos.toByteArray())

    return jvm_read, jvm_write


def test_jvm_decodes_our_encoder(spark):
    jvm_read, jvm_write = _jvm_io(spark)
    img = _gradient_rgb(32, 48)
    for sub, ri in [("4:4:4", 0), ("4:2:0", 0), ("4:4:4", 2)]:
        bimg = jvm_read(encode_jpeg(img, quality=95, subsampling=sub,
                                    restart_interval=ri))
        assert bimg is not None, "JVM ImageIO rejected our stream"
        assert (bimg.getWidth(), bimg.getHeight()) == (48, 32)
        theirs = _decode_bmp(jvm_write(bimg, "bmp"))["pixels"]
        assert _rmse(theirs, img) < 4.0, (sub, ri)


def _jvm_write_progressive(spark, bimg) -> bytes:
    """JPEG bytes via ImageIO's PROGRESSIVE writer (MODE_DEFAULT emits
    the classic 10-scan jpeg_simple_progression script: interleaved
    first+refinement DC, spectral AC bands, two successive-
    approximation AC refinement levels — every Annex G decode path)."""
    jvm = spark._jvm
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "jpg"
    ).next()
    p = writer.getDefaultWriteParam()
    p.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    baos = jvm.java.io.ByteArrayOutputStream()
    out = jvm.javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    writer.setOutput(out)
    writer.write(None, jvm.javax.imageio.IIOImage(bimg, None, None), p)
    out.flush()
    writer.dispose()
    return bytes(baos.toByteArray())


def test_progressive_color_vs_jvm(spark):
    jvm_read, jvm_write = _jvm_io(spark)
    img = _gradient_rgb(32, 48)
    pj = _jvm_write_progressive(spark, jvm_read(encode_bmp(img)))
    assert b"\xff\xc2" in pj  # really SOF2
    mine = decode_jpeg(pj)
    assert (mine["mode"], mine["width"], mine["height"]) == ("RGB", 48, 32)
    theirs = _decode_bmp(jvm_write(jvm_read(pj), "bmp"))["pixels"]
    # same-bitstream decode: only IDCT rounding + chroma upsample
    # filter may differ (ours nearest, theirs interpolated)
    assert _rmse(mine["pixels"], theirs) < 2.0
    assert _rmse(mine["pixels"], img) < 6.0


def test_progressive_gray_bitexact_vs_jvm(spark):
    jvm = spark._jvm
    jvm_read, jvm_write = _jvm_io(spark)
    h, w = 32, 48
    yy, xx = np.mgrid[0:h, 0:w]
    g = np.clip(yy * 5 + xx, 0, 255).astype(np.uint8)
    bi = jvm_read(encode_bmp(np.stack([g, g, g], axis=-1)))
    gray_bi = jvm.java.awt.image.BufferedImage(w, h, 10)  # TYPE_BYTE_GRAY
    gray_bi.getGraphics().drawImage(bi, 0, 0, None)
    pj = _jvm_write_progressive(spark, gray_bi)
    assert b"\xff\xc2" in pj
    mine = decode_jpeg(pj)
    assert mine["mode"] == "L"
    # no chroma, no upsampling: our scan pipeline must match the JVM
    # decoder EXACTLY — any Annex G bookkeeping slip shows up here
    dec = jvm_read(pj)
    rgb_bi = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    rgb_bi.getGraphics().drawImage(dec, 0, 0, None)
    theirs = _decode_bmp(jvm_write(rgb_bi, "bmp"))["pixels"][:, :, 0]
    assert (mine["pixels"] == theirs).all()


def test_progressive_dispatches_through_decode_image(spark):
    jvm_read, _ = _jvm_io(spark)
    img = _gradient_rgb(24, 24)
    pj = _jvm_write_progressive(spark, jvm_read(encode_bmp(img)))
    d = decode_image(pj)
    assert d["mode"] == "RGB"
    assert _rmse(d["pixels"], img) < 8.0


def test_our_decoder_reads_jvm_encoder(spark):
    jvm_read, jvm_write = _jvm_io(spark)
    img = _gradient_rgb(32, 48)
    jvm_jpg = jvm_write(jvm_read(encode_bmp(img)), "jpg")
    mine = decode_jpeg(jvm_jpg)
    assert (mine["mode"], mine["width"], mine["height"]) == ("RGB", 48, 32)
    # decode-vs-decode of the SAME bitstream: only IDCT rounding and
    # the chroma upsample filter (ours nearest, theirs interpolated)
    # may differ — a structural bug would blow far past this bound
    theirs = _decode_bmp(jvm_write(jvm_read(jvm_jpg), "bmp"))["pixels"]
    assert _rmse(mine["pixels"], theirs) < 2.0
    assert _rmse(mine["pixels"], img) < 6.0  # JVM default quality ~75


def test_cross_format_near_dup_detection(spark):
    """The LAION scenario end-to-end: the same image stored as BMP and
    as a JPEG re-encode (quality 90) must land within the banded
    Hamming join's reach — format-crossing near-dup detection through
    the real decode dispatch, on the Spark path."""
    from mints_wind_data_ingestion_spark.plans.extensions import (
        synth_image_pixels,
    )
    from mints_wind_data_ingestion_spark.sources.multimodal import (
        image_dhash_df,
        image_neardup_pairs,
    )

    rows = []
    for i in range(6):
        px = synth_image_pixels(i, 0)
        rows.append((i, bytearray(encode_bmp(px))))
        rows.append((100 + i, bytearray(encode_jpeg(px, quality=90))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = image_neardup_pairs(image_dhash_df(df), max_hamming=6)
    got = sorted((r.id_a, r.id_b) for r in pairs.collect())
    assert got == [(i, 100 + i) for i in range(6)]


# ---------------------------------------------------------------------------
# property: round trip over the supported encode matrix
# ---------------------------------------------------------------------------


def test_round_trip_property_matrix():
    """Randomized dims × quality × subsampling × restart interval ×
    gray/color: decode(encode(x)) must keep shape/mode exactly and
    land within a quantization-error bound that scales with quality.
    Deterministic seeds (the hypothesis-free matrix form — the codec
    matrix convention): failures replay exactly."""
    rng = np.random.default_rng(20260816)
    for trial in range(24):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        gray = bool(rng.integers(0, 2))
        quality = int(rng.choice([70, 85, 92, 98]))
        sub = str(rng.choice(["4:4:4", "4:2:0"]))
        ri = int(rng.choice([0, 1, 3]))
        # smooth random field: low-order 2-D cosine mix (JPEG's own
        # basis, so error bounds stay tight and meaningful)
        yy, xx = np.mgrid[0:h, 0:w]
        a, b, c = rng.uniform(-1, 1, 3)
        base = (
            128
            + 90 * a * np.cos(np.pi * yy / max(h, 1) * 1.5)
            + 90 * b * np.cos(np.pi * xx / max(w, 1) * 2.0)
            + 40 * c
        )
        if gray:
            img = np.clip(base, 0, 255).astype(np.uint8)
        else:
            # chroma-smooth color (correlated channels): 4:2:0 halves
            # CHROMA resolution, so an anti-correlated fixture would
            # measure the subsampling itself, not the codec
            img = np.clip(
                np.stack([base, base * 0.9 + 10, base * 0.7 + 40], axis=-1),
                0, 255,
            ).astype(np.uint8)
        d = decode_jpeg(
            encode_jpeg(img, quality=quality, subsampling=sub,
                        restart_interval=ri)
        )
        assert d["pixels"].shape == img.shape, (trial, h, w, gray, sub, ri)
        assert d["mode"] == ("L" if gray else "RGB")
        bound = 6.0 if quality >= 90 else 12.0
        if sub == "4:2:0" and not gray:
            bound += 4.0
        assert _rmse(d["pixels"], img) < bound, (
            trial, h, w, gray, quality, sub, ri, _rmse(d["pixels"], img)
        )


def test_transform_images_jpeg_output(spark):
    """transform_images(out_format='jpeg'): the resized shard is a
    decodable JPEG whose pixels track the BMP (lossless) output of
    the same pipeline within quantization error; corrupt payloads
    still quarantine to NULL rows."""
    from mints_wind_data_ingestion_spark.sources.multimodal import (
        transform_images,
    )

    rows = [
        (1, bytearray(encode_bmp(_gradient_rgb(30, 30)))),
        (2, bytearray(encode_jpeg(_gradient_rgb(25, 35), quality=95))),
        (3, bytearray(b"garbage payload")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    jpg = {r.doc_id: r for r in transform_images(
        df, 16, 16, out_format="jpeg", quality=95
    ).collect()}
    bmp = {r.doc_id: r for r in transform_images(df, 16, 16).collect()}
    for i in (1, 2):
        assert bytes(jpg[i].resized)[:2] == b"\xff\xd8"
        a = decode_image(bytes(jpg[i].resized))["pixels"]
        b = decode_image(bytes(bmp[i].resized))["pixels"]
        assert a.shape == b.shape == (16, 16, 3)
        assert _rmse(a, b) < 3.0
    assert jpg[3].resized is None and bmp[3].resized is None
    with pytest.raises(ValueError, match="out_format"):
        transform_images(df, 16, 16, out_format="tiff")
