"""Baseline TIFF codec (r13): round trips across compression ×
predictor × strip layouts, byte-order/palette/photometric handling,
corruption quarantine, and bit-exact interop with javax.imageio's
TIFF plugin (lossless both directions)."""

from __future__ import annotations

import numpy as np
import pytest

from mints_wind_data_ingestion_spark.sources.multimodal import (
    decode_image,
    encode_bmp,
)
from mints_wind_data_ingestion_spark.sources.tiffcodec import (
    decode_tiff,
    encode_tiff,
)


def _rgb(rng, h=25, w=31):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("compression", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("predictor", [False, True])
@pytest.mark.parametrize("strips", [None, 7])
def test_roundtrip_matrix(compression, predictor, strips):
    rng = np.random.default_rng(3)
    img = _rgb(rng)
    d = decode_tiff(encode_tiff(img, compression=compression,
                                predictor=predictor,
                                rows_per_strip=strips))
    assert (d["mode"], d["width"], d["height"]) == ("RGB", 31, 25)
    assert (d["pixels"] == img).all()
    g = rng.integers(0, 256, (25, 31), dtype=np.uint8)
    dg = decode_tiff(encode_tiff(g, compression=compression,
                                 predictor=predictor,
                                 rows_per_strip=strips))
    assert dg["mode"] == "L" and (dg["pixels"] == g).all()


def test_packbits_compresses_runs():
    img = np.zeros((16, 64), dtype=np.uint8)  # long zero runs
    enc = encode_tiff(img, compression="packbits")
    assert len(enc) < 16 * 64 // 4
    assert (decode_tiff(enc)["pixels"] == img).all()


def test_lzw_early_change_boundary():
    """A wide high-entropy image pushes the LZW table across every
    width boundary (511/1023/2047/4095 with early change) and the
    clear-on-full path."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (64, 256), dtype=np.uint8)
    assert (decode_tiff(encode_tiff(img, compression="lzw"))["pixels"]
            == img).all()


def test_decode_image_dispatches_tiff():
    g = (np.arange(300, dtype=np.uint8).reshape(15, 20) * 7) % 256
    d = decode_image(encode_tiff(g))
    assert d["mode"] == "L" and (d["pixels"] == g).all()


def test_big_endian_and_white_is_zero():
    """Hand-build a minimal MM (big-endian) WhiteIsZero TIFF."""
    import struct

    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = g.tobytes()
    tags = [
        (256, 3, 1, 8), (257, 3, 1, 8), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 0), (273, 4, 1, None), (277, 3, 1, 1),
        (278, 4, 1, 8), (279, 4, 1, len(data)),
    ]
    ifd = struct.pack(">H", len(tags))
    data_off = 8 + 2 + 12 * len(tags) + 4
    for tag, typ, cnt, val in tags:
        if tag == 273:
            val = data_off
        if typ == 3:
            ifd += struct.pack(">HHIHH", tag, typ, cnt, val, 0)
        else:
            ifd += struct.pack(">HHII", tag, typ, cnt, val)
    payload = struct.pack(">2sHI", b"MM", 42, 8) + ifd + struct.pack(">I", 0) + data
    d = decode_tiff(payload)
    assert d["mode"] == "L"
    assert (d["pixels"] == 255 - g).all()


def test_palette_tiff():
    """Palette (photometric 3) via a hand-extended encoder output:
    rewrite a gray TIFF's photometric to 3 and append a ColorMap."""
    import struct

    g = (np.arange(100, dtype=np.uint8).reshape(10, 10) * 2) % 256
    base = bytearray(encode_tiff(g))
    # parse the little-endian IFD to find tag positions
    (n,) = struct.unpack_from("<H", base, 8)
    cmap_vals = []
    for v in range(256):
        cmap_vals.append((v * 257) & 0xFFFF)  # R ramp
    cmap = cmap_vals + [0] * 256 + [(65535 - v * 257) & 0xFFFF for v in range(256)]
    cmap_off = len(base)
    base += struct.pack("<768H", *cmap)
    # patch photometric (262) to 3 and splice a ColorMap tag by
    # rebuilding the IFD with one more entry
    entries = []
    for i in range(n):
        p = 10 + 12 * i
        tag, typ, cnt = struct.unpack_from("<HHI", base, p)
        val = bytes(base[p + 8 : p + 12])
        if tag == 262:
            val = struct.pack("<HH", 3, 0)
        entries.append((tag, typ, cnt, val))
    entries.append((320, 3, 768, struct.pack("<I", cmap_off)))
    entries.sort()
    ifd = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += struct.pack("<HHI", tag, typ, cnt) + val
    ifd += struct.pack("<I", 0)
    shift = len(ifd) - (2 + 12 * n + 4)
    # rebuild whole file: header + new IFD + rest shifted
    old_tail = bytes(base[2 + 12 * n + 4 + 8:])
    out = bytearray(struct.pack("<2sHI", b"II", 42, 8) + ifd + old_tail)
    # strip offsets and ColorMap offset moved by `shift`
    (n2,) = struct.unpack_from("<H", out, 8)
    for i in range(n2):
        p = 10 + 12 * i
        tag, typ, cnt = struct.unpack_from("<HHI", out, p)
        if tag in (273, 320):
            (old,) = struct.unpack_from("<I", out, p + 8)
            struct.pack_into("<I", out, p + 8, old + shift)
    d = decode_tiff(bytes(out))
    assert d["mode"] == "RGB"
    assert (d["pixels"][:, :, 0] == g).all()          # R ramp = index
    assert (d["pixels"][:, :, 1] == 0).all()          # G zero
    assert (d["pixels"][:, :, 2] == 255 - g).all()    # B inverse


@pytest.mark.parametrize("mutate", ["magic", "badcomp", "shortstrip",
                                    "truncated_ifd"])
def test_corruption_quarantines(mutate):
    g = (np.arange(400, dtype=np.uint8).reshape(20, 20) * 3) % 256
    enc = bytearray(encode_tiff(g, compression="lzw"))
    if mutate == "magic":
        enc[2] = 43  # BigTIFF
    elif mutate == "badcomp":
        import struct
        (n,) = struct.unpack_from("<H", enc, 8)
        for i in range(n):
            p = 10 + 12 * i
            tag = struct.unpack_from("<H", enc, p)[0]
            if tag == 259:
                struct.pack_into("<H", enc, p + 8, 7)  # JPEG-in-TIFF
    elif mutate == "shortstrip":
        enc = enc[:-12]
    elif mutate == "truncated_ifd":
        enc = enc[:12]
    with pytest.raises(ValueError):
        decode_tiff(bytes(enc))


# ---------------------------------------------------------------------------
# third-party interop: javax.imageio's TIFF plugin (lossless → exact)
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


@pytest.mark.parametrize("compression", ["none", "packbits", "lzw"])
def test_jvm_decodes_our_tiff_bitexact(spark, compression):
    from mints_wind_data_ingestion_spark.sources.multimodal import (
        _decode_bmp,
    )

    jvm_read, jvm_write = _jvm_io(spark)
    rng = np.random.default_rng(11)
    img = _rgb(rng, 20, 28)
    bimg = jvm_read(encode_tiff(img, compression=compression,
                                predictor=(compression == "lzw")))
    assert bimg is not None, "JVM ImageIO rejected our TIFF"
    theirs = _decode_bmp(jvm_write(bimg, "bmp"))["pixels"]
    assert (theirs == img).all(), compression


def test_we_decode_jvm_lzw_tiff_bitexact(spark):
    """The gold check for the early-change LZW variant: a stream
    written by an independent implementation."""
    jvm = spark._jvm
    jvm_read, _ = _jvm_io(spark)
    rng = np.random.default_rng(13)
    img = _rgb(rng, 20, 28)
    bimg = jvm_read(encode_bmp(img))
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "tiff"
    ).next()
    p = writer.getDefaultWriteParam()
    p.setCompressionMode(
        jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT
    )
    p.setCompressionType("LZW")
    baos = jvm.java.io.ByteArrayOutputStream()
    out = jvm.javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    writer.setOutput(out)
    writer.write(None, jvm.javax.imageio.IIOImage(bimg, None, None), p)
    out.flush()
    writer.dispose()
    jtiff = bytes(baos.toByteArray())
    assert jtiff[:2] in (b"II", b"MM")
    got = decode_tiff(jtiff)
    assert got["mode"] == "RGB"
    assert (got["pixels"] == img).all()
