"""Native lossless-WebP (VP8L) codec tests (round 14, VERDICT r13
"What's missing" #2): round-trips across every encoder option (each
exercising a distinct decoder path), spec vectors for the prefix-value
scheme and the 120-entry distance mapping, container gates (lossy
VP8 / animation), the decompression-bomb guard, corruption fuzz, and
the decode_image dispatch."""

from __future__ import annotations

import random
import struct
import time

import numpy as np
import pytest

from mints_wind_data_ingestion_spark.sources import multimodal as mm
from mints_wind_data_ingestion_spark.sources.webpcodec import (
    _DIST_MAP,
    _BitReader,
    _BitWriter,
    _plane_to_dist,
    _prefix_encode,
    _prefix_value,
    _read_prefix_code,
    _write_prefix_code,
    decode_webp,
    encode_webp,
)


def _rt(px, **kw):
    out = decode_webp(encode_webp(px, **kw))
    exp = px if px.ndim == 3 else np.stack([px] * 3, axis=2)
    assert out["mode"] == "RGB"
    assert (out["width"], out["height"]) == (exp.shape[1], exp.shape[0])
    assert np.array_equal(out["pixels"], exp)


def test_roundtrip_matrix():
    rng = np.random.default_rng(20260816)
    gray = rng.integers(0, 256, size=(23, 17), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(12, 31, 3), dtype=np.uint8)
    _rt(gray)
    _rt(rgb)
    _rt(np.full((9, 13), 7, dtype=np.uint8))  # flat → RLE backrefs
    _rt(rgb, subtract_green=True)
    _rt(gray, use_palette=True)  # 8-bit palette, no bundling
    _rt(rgb, predictor_mode=2)
    _rt(gray, cache_bits=6)
    _rt(np.ones((1, 1), dtype=np.uint8))  # minimum dimensions


def test_roundtrip_every_predictor_mode():
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(11, 19, 3), dtype=np.uint8)
    for mode in range(14):
        _rt(rgb, predictor_mode=mode)


def test_palette_bundling_all_widths():
    """palette ≤2 → 8 px/byte, ≤4 → 4, ≤16 → 2, else unbundled —
    the sub-byte pixel-bundling decode path at every width."""
    rng = np.random.default_rng(5)
    for ncolors in (2, 3, 4, 9, 16, 17, 250):
        vals = np.linspace(0, 255, ncolors).astype(np.uint8)
        img = vals[rng.integers(0, ncolors, size=(21, 13))]
        _rt(img, use_palette=True)


def test_prefix_value_scheme_vectors():
    """Spec §4.2.2.2: symbols 0-3 are literal values 1-4; above that,
    (2 + parity) << extra_bits ranges. Encode/decode must be exact
    inverses over the whole LZ77 range."""
    for v in list(range(1, 300)) + [4096, 100_000, 2**20]:
        sym, extra, ebits = _prefix_encode(v)
        bw = _BitWriter()
        bw.write(extra, ebits)
        bw.write(0, 8)
        br = _BitReader(bw.finish())
        assert _prefix_value(br, sym) == v, v
    # pinned vectors from the spec ranges
    assert _prefix_encode(1) == (0, 0, 0)
    assert _prefix_encode(4) == (3, 0, 0)
    assert _prefix_encode(5) == (4, 0, 1)
    assert _prefix_encode(7) == (5, 0, 1)
    assert _prefix_encode(9) == (6, 0, 2)
    assert _prefix_encode(13) == (7, 0, 2)


def test_distance_map_properties():
    """The 120-entry 2D neighborhood: unique pairs, dy ≥ 0, (dx, dy)
    within the 8-row window, and code > 120 → linear distance."""
    assert len(_DIST_MAP) == 120 and len(set(_DIST_MAP)) == 120
    for dx, dy in _DIST_MAP:
        assert 0 <= dy <= 8 and -8 <= dx <= 8
        assert dy > 0 or dx > 0  # strictly backward
    # first entries pinned to the spec table
    assert _DIST_MAP[:6] == ((0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0))
    assert _plane_to_dist(1, 100) == 100  # (0,1) = one row up
    assert _plane_to_dist(2, 100) == 1  # (1,0) = previous pixel
    assert _plane_to_dist(4, 100) == 99  # (-1,1)
    assert _plane_to_dist(121, 100) == 1  # linear: code − 120
    assert _plane_to_dist(320, 100) == 200


def test_prefix_code_roundtrip_fuzz():
    rng = random.Random(9)
    for _ in range(80):
        n = rng.randint(1, 280)
        freqs = {rng.randrange(280): rng.randint(1, 999) for _ in range(n)}
        from mints_wind_data_ingestion_spark.sources.webpcodec import (
            _huffman_lengths_impl,
        )

        lengths = _huffman_lengths_impl(freqs)
        bw = _BitWriter()
        _write_prefix_code(bw, lengths, 280)
        bw.write(0, 7)
        code = _read_prefix_code(_BitReader(bw.finish()), 280)
        if code.single is not None:
            assert [s for s, l in lengths.items() if l] == [code.single]
        else:
            got = {s: l for (l, _), s in code.table.items()}
            assert got == {s: l for s, l in lengths.items() if l}


def test_lossy_and_animation_gates():
    lossy = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(ValueError, match="lossy VP8"):
        decode_webp(lossy)
    anim = (
        b"RIFF" + struct.pack("<I", 26) + b"WEBP"
        + b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
        + b"ANIM" + struct.pack("<I", 6) + b"\x00" * 6
    )
    with pytest.raises(ValueError, match="animated"):
        decode_webp(anim)
    with pytest.raises(mm.MM_DECODE_ERRORS):
        mm.decode_image(lossy)  # quarantine class covers the gates


def test_vp8x_wrapped_vp8l_decodes():
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    plain = encode_webp(px)
    vp8l_chunk = plain[12:]  # VP8L chunk incl. header
    vp8x = (
        b"VP8X" + struct.pack("<I", 10)
        + b"\x00" * 4
        + struct.pack("<I", 7)[:3] + struct.pack("<I", 7)[:3]
    )
    body = b"WEBP" + vp8x + vp8l_chunk
    wrapped = b"RIFF" + struct.pack("<I", len(body)) + body
    out = decode_webp(wrapped)
    assert np.array_equal(out["pixels"][:, :, 0], px)


def test_bomb_guard_refuses_huge_header_fast():
    px = np.zeros((4, 4), dtype=np.uint8)
    blob = bytearray(encode_webp(px))
    # VP8L header: signature byte at offset 20, then 14+14 bits dims.
    # 16383 × 16383 = 268 Mpx > the pixel guard.
    dims = 0x2F | ((16383 - 1) << 8) | ((16383 - 1) << 22)
    blob[20:25] = dims.to_bytes(5, "little")[:5] ; blob[24] |= 0
    t0 = time.perf_counter()
    with pytest.raises(ValueError, match="decompression-bomb"):
        decode_webp(bytes(blob))
    assert time.perf_counter() - t0 < 0.5


def test_corruption_fuzz_stays_in_quarantine_class():
    rng = random.Random(20260816)
    rng2 = np.random.default_rng(11)
    bases = [
        encode_webp(rng2.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)),
        encode_webp(
            (rng2.integers(0, 4, size=(14, 14)) * 80).astype(np.uint8),
            use_palette=True,
        ),
        encode_webp(
            rng2.integers(0, 256, size=(10, 10), dtype=np.uint8),
            cache_bits=5, subtract_green=True,
        ),
    ]
    quarantined = ok = 0
    for _ in range(3000):
        b = bytearray(bases[rng.randrange(len(bases))])
        for _ in range(rng.randint(1, 5)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        t0 = time.perf_counter()
        try:
            mm.decode_image(bytes(b))
            ok += 1
        except mm.MM_DECODE_ERRORS:
            quarantined += 1
        assert time.perf_counter() - t0 < 3.0
    assert quarantined > 100 and ok > 100


def test_decode_image_dispatch():
    px = np.arange(96, dtype=np.uint8).reshape(8, 4, 3) * 2
    out = mm.decode_image(encode_webp(px))
    assert np.array_equal(out["pixels"], px)


def test_deterministic_encoder():
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
    assert encode_webp(px) == encode_webp(px)


def test_dims_out_of_range_rejected():
    with pytest.raises(ValueError, match="out of range"):
        encode_webp(np.zeros((1, 20000), dtype=np.uint8))


def test_lz77_general_distances_roundtrip():
    """The r14b matcher emits arbitrary backref distances: tiled
    images produce 2D plane-code offsets (row above, diagonal) AND
    long linear distances (> the 120-entry map). Round-trips pin the
    whole distance-mapping surface."""
    rng = np.random.default_rng(17)
    row = rng.integers(0, 256, size=(1, 40, 3), dtype=np.uint8)
    vert = np.repeat(row, 30, axis=0)  # every row = row above (dist w)
    _rt(vert)
    tile = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    tiled = np.tile(tile, (5, 6, 1))  # horizontal dist 8, vertical 6*w
    _rt(tiled)
    _rt(tiled, cache_bits=5)  # cache replay along copied pixels
    _rt(tiled, subtract_green=True)
    wide = np.tile(
        rng.integers(0, 256, size=(2, 300, 3), dtype=np.uint8), (8, 1, 1)
    )  # dist 600 > 120: linear distance encoding
    _rt(wide)


def test_meta_prefix_codes_hand_vector():
    """Decoder-only path until now: META prefix codes — a 2-group
    spatially-varying code assignment. Hand-built stream: 8×4 image,
    4-px blocks, left half group 0 (green 11), right half group 1
    (green 77); every channel is a single-symbol simple code, so the
    group selection alone determines the pixels."""
    from mints_wind_data_ingestion_spark.sources.webpcodec import (
        _BitWriter,
        _write_prefix_code,
        decode_webp,
    )

    w, h = 8, 4
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # META prefix codes present
    bw.write(0, 3)  # huffman_bits = 2 → 4-px blocks → 2×1 meta image
    # meta image (entropy-coded, no cache, no meta): 2 pixels whose
    # (red<<8|green) are the group ids 0 and 1 → red 0, green 0 / 1
    bw.write(0, 1)  # meta image: no cache
    _write_prefix_code(bw, {0: 1, 1: 1}, 256 + 24)  # green: syms 0,1
    _write_prefix_code(bw, {0: 1}, 256)  # red = 0
    _write_prefix_code(bw, {0: 1}, 256)  # blue
    _write_prefix_code(bw, {255: 1}, 256)  # alpha
    _write_prefix_code(bw, {0: 1}, 40)  # distance (unused)
    bw.write(0, 1)  # meta pixel 0: green code 0
    bw.write(1, 1)  # meta pixel 1: green code 1
    # two groups, each single-symbol codes: green 11 vs 77
    for g in (11, 77):
        _write_prefix_code(bw, {g: 1}, 256 + 24)
        _write_prefix_code(bw, {5: 1}, 256)  # red
        _write_prefix_code(bw, {9: 1}, 256)  # blue
        _write_prefix_code(bw, {255: 1}, 256)  # alpha
        _write_prefix_code(bw, {0: 1}, 40)
    # pixel data: every channel single-symbol → zero data bits
    payload = bw.finish()
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(payload) + (len(payload) & 1))
        + b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) & 1 else b"")
    )
    out = decode_webp(blob)["pixels"]
    assert out.shape == (4, 8, 3)
    assert (out[:, :4, 1] == 11).all()  # left blocks: group 0 green
    assert (out[:, 4:, 1] == 77).all()  # right blocks: group 1 green
    assert (out[:, :, 0] == 5).all() and (out[:, :, 2] == 9).all()


def test_huffman_lengths_always_complete():
    """The clamp-and-repair must end with Kraft sum EXACTLY 1: zstd
    weights must total a power of two and libwebp rejects incomplete
    VP8L codes. Skewed wide histograms force the clamp path."""
    import random as _r

    from mints_wind_data_ingestion_spark.sources.webpcodec import (
        _huffman_lengths_impl,
    )

    rng = _r.Random(4)
    for max_len in (11, 15):
        for trial in range(40):
            n = rng.randint(2, 280)
            freqs = {
                s: rng.choice([1, 1, 1, 2, 10, 1000, 100000])
                for s in rng.sample(range(280), n)
            }
            lengths = _huffman_lengths_impl(freqs, max_len=max_len)
            kraft = sum(1 << (max_len - l) for l in lengths.values())
            assert kraft == 1 << max_len, (max_len, trial)
            assert max(lengths.values()) <= max_len
