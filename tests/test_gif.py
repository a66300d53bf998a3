"""GIF codec (r13): round-trip parity, interlace, LZW table growth /
clear-on-full, corruption quarantine, and third-party interop with
the JVM's javax.imageio GIF codec (lossless format → bit-exact both
directions)."""

from __future__ import annotations

import numpy as np
import pytest

from mints_wind_data_ingestion_spark.sources.gifcodec import (
    decode_gif,
    encode_gif,
)
from mints_wind_data_ingestion_spark.sources.multimodal import (
    decode_image,
    encode_bmp,
)


def _palette_image(rng, h, w, n_colors=200):
    pal = np.unique(
        rng.integers(0, 256, (n_colors, 3), dtype=np.uint8), axis=0
    )
    return pal[rng.integers(0, len(pal), (h, w))]


def test_gray_roundtrip_bitexact():
    rng = np.random.default_rng(7)
    g = rng.integers(0, 256, (20, 24), dtype=np.uint8)
    d = decode_gif(encode_gif(g))
    assert (d["width"], d["height"], d["mode"]) == (24, 20, "RGB")
    assert (d["pixels"] == np.repeat(g[:, :, None], 3, axis=2)).all()


def test_rgb_roundtrip_bitexact():
    rng = np.random.default_rng(11)
    img = _palette_image(rng, 50, 60)
    assert (decode_gif(encode_gif(img))["pixels"] == img).all()


def test_interlaced_roundtrip():
    rng = np.random.default_rng(13)
    img = _palette_image(rng, 37, 29)  # odd dims stress the passes
    enc = encode_gif(img, interlace=True)
    assert enc[:6] == b"GIF89a"
    assert (decode_gif(enc)["pixels"] == img).all()


def test_lzw_clear_on_full_roundtrip():
    """300×300 with 200 colors forces the LZW dictionary past 4096
    codes — the clear-and-rebuild path on both sides."""
    rng = np.random.default_rng(17)
    img = _palette_image(rng, 300, 300)
    assert (decode_gif(encode_gif(img))["pixels"] == img).all()


def test_two_color_min_code_size():
    rng = np.random.default_rng(19)
    bw = np.where(rng.random((33, 17)) > 0.5, 255, 0).astype(np.uint8)
    d = decode_gif(encode_gif(bw))
    assert (d["pixels"][:, :, 0] == bw).all()


def test_decode_image_dispatches_gif():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8) * 3
    d = decode_image(encode_gif(g))
    assert d["mode"] == "RGB" and (d["pixels"][:, :, 2] == g).all()


def test_too_many_colors_fails_loud():
    rng = np.random.default_rng(23)
    with pytest.raises(ValueError, match="256"):
        encode_gif(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8))


@pytest.mark.parametrize("mutate", ["magic", "truncate", "trailer_only",
                                    "bad_block"])
def test_corruption_quarantines(mutate):
    g = (np.arange(400, dtype=np.uint8).reshape(20, 20) * 5) % 256
    enc = bytearray(encode_gif(g))
    if mutate == "magic":
        enc[:6] = b"JIF89a"
    elif mutate == "truncate":
        enc = enc[: len(enc) // 2]
    elif mutate == "trailer_only":
        enc = enc[:13] + bytes([0x3B])
    elif mutate == "bad_block":
        # image descriptor byte → an undefined block type (computed
        # offset: header 13 + 3 × palette entries — a .index() search
        # could hit a palette byte that happens to be 0x2C)
        i = 13 + 3 * (2 << (enc[10] & 0x07))
        assert enc[i] == 0x2C
        enc[i] = 0x7E
    with pytest.raises(ValueError):
        decode_gif(bytes(enc))


# ---------------------------------------------------------------------------
# third-party interop: javax.imageio's GIF codec (lossless → bit-exact)
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


def test_jvm_decodes_our_gif_bitexact(spark):
    from mints_wind_data_ingestion_spark.sources.multimodal import (
        _decode_bmp,
    )

    jvm_read, jvm_write = _jvm_io(spark)
    jvm = spark._jvm
    rng = np.random.default_rng(29)
    img = _palette_image(rng, 24, 40)
    for interlace in (False, True):
        bimg = jvm_read(encode_gif(img, interlace=interlace))
        assert bimg is not None, "JVM ImageIO rejected our GIF"
        # ImageIO reads GIF as TYPE_BYTE_INDEXED; convert to 3BYTE_BGR
        # so its BMP writer emits the 24-bit form our decoder reads
        rgb = jvm.java.awt.image.BufferedImage(
            bimg.getWidth(), bimg.getHeight(),
            jvm.java.awt.image.BufferedImage.TYPE_3BYTE_BGR,
        )
        g = rgb.getGraphics()
        g.drawImage(bimg, 0, 0, None)
        g.dispose()
        theirs = _decode_bmp(jvm_write(rgb, "bmp"))["pixels"]
        assert (theirs == img).all(), f"interlace={interlace}"


def test_we_decode_jvm_gif_bitexact(spark):
    jvm_read, jvm_write = _jvm_io(spark)
    rng = np.random.default_rng(31)
    img = _palette_image(rng, 24, 40, n_colors=120)
    jgif = jvm_write(jvm_read(encode_bmp(img)), "gif")
    assert jgif[:4] == b"GIF8"
    got = decode_gif(jgif)
    assert (got["pixels"] == img).all()


# ---------------------------------------------------------------------------
# animated GIF (r13): frame walk, disposal/transparency composition,
# and the video-dedup sampling contract
# ---------------------------------------------------------------------------


def test_animation_roundtrip_and_sampling():
    from mints_wind_data_ingestion_spark.sources.gifcodec import (
        decode_gif_frames,
        encode_gif_frames,
    )

    rng = np.random.default_rng(37)
    frames = [_palette_image(rng, 18, 22, n_colors=60) for _ in range(7)]
    payload = encode_gif_frames(frames)
    got = decode_gif_frames(payload, every_n=1)
    assert [k for k, _ in got] == list(range(7))
    for (_, rgb), want in zip(got, frames):
        assert (rgb == want).all()
    # every 3rd frame
    got3 = decode_gif_frames(payload, every_n=3)
    assert [k for k, _ in got3] == [0, 3, 6]
    assert (got3[1][1] == frames[3]).all()


def _gce(disposal, transparent=None):
    import struct

    flags = (disposal & 7) << 2 | (1 if transparent is not None else 0)
    return struct.pack(
        "<BBBBHBB", 0x21, 0xF9, 4, flags, 4,
        transparent if transparent is not None else 0, 0,
    )


def _handmade_animation():
    """Frame 0: full 8×8 gray-100. Frame 1: 4×4 patch at (2,2) with a
    transparent hole, disposal 3 (restore previous). Frame 2: full
    gray-200. Exercises transparency, offsets and restore-to-previous."""
    import struct

    import numpy as np

    from mints_wind_data_ingestion_spark.sources.gifcodec import (
        _image_block,
        _palette_and_indices,
    )

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 8, 8, 0, 0, 0)

    f0 = np.full((8, 8, 3), 100, dtype=np.uint8)
    t0, i0, e0 = _palette_and_indices(f0)
    out += _gce(disposal=1)
    out += _image_block(i0, t0, e0)

    # patch: grayscale → identity palette (the fast path), so the
    # transparent INDEX equals the gray value 77
    patch = np.full((4, 4, 3), 50, dtype=np.uint8)
    patch[1:3, 1:3] = 77
    tp, ip, ep = _palette_and_indices(patch)
    out += _gce(disposal=3, transparent=77)
    out += _image_block(ip, tp, ep, ix=2, iy=2)

    f2 = np.full((8, 8, 3), 200, dtype=np.uint8)
    t2, i2, e2 = _palette_and_indices(f2)
    out += _gce(disposal=1)
    out += _image_block(i2, t2, e2)
    out.append(0x3B)
    return bytes(out)


def test_animation_transparency_and_disposal():
    from mints_wind_data_ingestion_spark.sources.gifcodec import (
        decode_gif_frames,
    )

    got = decode_gif_frames(_handmade_animation())
    assert len(got) == 3
    f0, f1, f2 = (rgb for _, rgb in got)
    assert (f0 == 100).all()
    # frame 1: patch of 50 at (2,2)..(5,5) with the transparent hole
    # showing frame 0's 100 through
    assert (f1[2:6, 2:6, 0] == [[50, 50, 50, 50],
                                [50, 100, 100, 50],
                                [50, 100, 100, 50],
                                [50, 50, 50, 50]]).all()
    assert (f1[0:2] == 100).all()
    # frame 2 drew after disposal 3 restored frame 0's canvas, then
    # painted fully over it
    assert (f2 == 200).all()


def test_video_sampler_takes_animated_gif():
    from mints_wind_data_ingestion_spark.sources.gifcodec import (
        encode_gif_frames,
    )
    from mints_wind_data_ingestion_spark.sources.multimodal import (
        sample_video_frames,
    )

    rng = np.random.default_rng(41)
    g = [rng.integers(0, 256, (20, 24), dtype=np.uint8) for _ in range(6)]
    got = sample_video_frames(encode_gif_frames(g), every_n=2)
    assert [k for k, _ in got] == [0, 2, 4]
    # grayscale frames: the Y plane equals the source exactly
    assert all((y == g[k]).all() for k, y in got)


def test_gif_video_dhash_pipeline(spark):
    from mints_wind_data_ingestion_spark.sources.gifcodec import (
        encode_gif_frames,
    )
    from mints_wind_data_ingestion_spark.sources.multimodal import (
        video_dhash_df,
        video_neardup_pairs,
    )

    rng = np.random.default_rng(43)
    base = [rng.integers(0, 256, (20, 24), dtype=np.uint8)
            for _ in range(8)]
    edited = list(base)
    edited[3] = rng.integers(0, 256, (20, 24), dtype=np.uint8)
    other = [rng.integers(0, 256, (20, 24), dtype=np.uint8)
             for _ in range(8)]
    df = spark.createDataFrame(
        [(1, encode_gif_frames(base)), (2, encode_gif_frames(edited)),
         (3, encode_gif_frames(other)), (4, b"GIF89a\x00trunc")],
        "doc_id long, payload binary",
    )
    hashes = video_dhash_df(df, every_n=1)
    rows = hashes.collect()
    # the corrupt payload leaves one NULL evidence row
    assert [r.doc_id for r in rows if r.fhash is None] == [4]
    pairs = video_neardup_pairs(
        hashes, threshold=0.5, method="uniform", cache=False
    ).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]
