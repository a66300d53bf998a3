"""Native lossless-WebP (VP8L) codec — written from the public "WebP
Lossless Bitstream Specification" (Google, also published as RFC 9649
§3) and RIFF framing from the WebP Container Specification.

Why this codec (VERDICT r13 "What's missing" #2): WebP's share of
current web crawls exceeds GIF's and TIFF's combined, and the LOSSLESS
profile fits the engine's falsifiability doctrine exactly as
PNG/GIF/FLAC did — lossless → byte-exact round-trip verifiable and
spec-vector testable without a second decoder in the container. The
lossy VP8 profile stays a typed gate (implementation-variant output —
the MP3 doctrine).

Decoder scope (fail-loud ValueError outside it — quarantine contract):
- RIFF/WEBP container: plain `VP8L` files and extended `VP8X` files
  wrapping a VP8L chunk (ICCP/EXIF/XMP skipped). Lossy `VP8 ` and
  animated `ANIM/ANMF` raise with the contract named.
- the full VP8L feature set: all four transforms (predictor — all 14
  modes, color, subtract-green, color-indexing incl. sub-byte pixel
  bundling), meta prefix codes, color cache, LZ77 backward references
  with the 120-entry 2D distance mapping, simple AND normal prefix
  codes (code-length codes with 16/17/18 repeats and the max_symbol
  variant), and the 16384×16384 dimension ceiling bounded by the
  engine's decompression-bomb pixel guard.

Encoder scope (the deterministic fixture half): literal/RLE coding
with real canonical prefix codes, optional subtract-green, optional
color-indexing (with mandated bundling for ≤16-color palettes),
optional uniform predictor transform, optional color cache — enough
option surface that every decoder path above is exercised by
round-trip tests rather than trusted.

Cross-validation note: this container ships no independent WebP
decoder (PIL/libwebp absent; javax.imageio has no WebP plugin), so —
per the r13 GIF/TIFF provenance pattern — verification is round-trip
+ hand-built spec vectors + corruption fuzz, and the optional
external-decoder dispatch test (tests/test_decoder_dispatch.py) picks
up PIL cross-checks automatically in environments that have it.
"""

from __future__ import annotations

import struct

__all__ = ["decode_webp", "encode_webp"]

#: decompression-bomb guard — same formula/rationale as
#: gifcodec._MAX_PIXELS (14-bit dims allow 16384² ≈ 268 Mpx ≈ 1 GB).
_MAX_PIXELS = 1024 * 1024 * 1024 // 4 // 3

#: code-length-code symbol order (spec §4.2.1.2 / DEFLATE heritage)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
              13, 14, 15)

#: LZ77 distance mapping (spec §4.2.2.3): the first 120 distance
#: values address a 2D neighborhood as (dx, dy) pairs; values above
#: 120 are linear distances − 120.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)

_DIST_INDEX = {v: i + 1 for i, v in enumerate(_DIST_MAP)}


# ---------------------------------------------------------------------------
# bit I/O — VP8L is LSB-first within bytes (the DEFLATE convention)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("VP8L: bitstream exhausted")
            self.acc |= self.data[self.pos] << self.nbits
            self.nbits += 8
            self.pos += 1
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


def _reverse_bits(code: int, length: int) -> int:
    rev = 0
    for _ in range(length):
        rev = (rev << 1) | (code & 1)
        code >>= 1
    return rev


#: root-table width for the LUT decoder — covers every code length the
#: engine's own encoder emits and the overwhelming share of real
#: streams; longer codes fall back to the bit-walk.
_LUT_BITS = 10


class _PrefixCode:
    """Canonical prefix decoder: codes assigned in (length, symbol)
    order, MSB-first values, read from the LSB-first stream. Decoding
    peeks `_LUT_BITS` bits into a root lookup table (indexed by the
    REVERSED code, since the stream delivers code bits LSB-first);
    codes longer than the root fall back to a per-bit walk. A
    single-symbol code reads zero bits (spec: simple codes with one
    symbol; libwebp builds the same 0-bit table for degenerate normal
    codes)."""

    __slots__ = ("table", "single", "lut")

    def __init__(self, lengths: list[int]):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("VP8L: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            self.lut = None
            return
        self.single = None
        if max(l for l, _ in nz) > 15:
            raise ValueError("VP8L: prefix length > 15")
        nz.sort()
        code = 0
        prev_len = nz[0][0]
        table: dict[tuple[int, int], int] = {}
        lut = [None] * (1 << _LUT_BITS)
        kraft = 0
        for length, sym in nz:
            code <<= length - prev_len
            prev_len = length
            table[(length, code)] = sym
            kraft += 1 << (15 - length)
            if length <= _LUT_BITS:
                base = _reverse_bits(code, length)
                entry = (sym, length)
                for k in range(1 << (_LUT_BITS - length)):
                    lut[base | (k << length)] = entry
            code += 1
        if kraft > (1 << 15):
            raise ValueError("VP8L: over-subscribed prefix code")
        self.table = table
        self.lut = lut

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        # top up the accumulator to a full root window (tolerating a
        # near-EOF stream with fewer bits left)
        while br.nbits < _LUT_BITS and br.pos < len(br.data):
            br.acc |= br.data[br.pos] << br.nbits
            br.nbits += 8
            br.pos += 1
        entry = self.lut[br.acc & ((1 << _LUT_BITS) - 1)]
        if entry is not None:
            sym, length = entry
            if length > br.nbits:
                raise ValueError("VP8L: bitstream exhausted")
            br.acc >>= length
            br.nbits -= length
            return sym
        code = 0
        for length in range(1, 16):
            code = (code << 1) | br.read(1)
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid prefix code in stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    """Spec §4.2.1: simple code (1-2 symbols) or normal code (lengths
    via the code-length code with 16/17/18 repeats and the optional
    max_symbol cap)."""
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol is 8-bit
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("VP8L: simple-code symbol out of alphabet")
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet_size:
                raise ValueError("VP8L: simple-code symbol out of alphabet")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            lengths[sym0] = 1
        return _PrefixCode(lengths)

    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode(clc_lengths)

    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = clc.decode(br)
        if s < 16:
            lengths[sym] = s
            sym += 1
            if s:
                prev_len = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym >= alphabet_size:
                    raise ValueError("VP8L: code-length repeat overruns")
                lengths[sym] = prev_len
                sym += 1
        elif s == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
        if sym > alphabet_size:
            raise ValueError("VP8L: code-length run overruns alphabet")
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _prefix_value(br: _BitReader, sym: int) -> int:
    """Length/distance prefix decoding (spec §4.2.2.2): 24/40-symbol
    alphabets share the scheme."""
    if sym < 4:
        return sym + 1
    extra_bits = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _plane_to_dist(code: int, width: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dy * width + dx)


def _read_entropy_image(
    br: _BitReader, w: int, h: int, top_level: bool
) -> list[int]:
    """One entropy-coded image (spec §4.3.2: color-cache info, meta
    prefix codes at top level only, prefix-code groups, LZ77 pixel
    data) → list of `w*h` ARGB ints."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L: invalid color-cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    huff_image = None
    huff_bits = 0
    num_groups = 1
    if top_level and br.read(1):  # meta prefix codes
        huff_bits = br.read(3) + 2
        hw, hh = _subsample_size(w, huff_bits), _subsample_size(h, huff_bits)
        huff_image = _read_entropy_image(br, hw, hh, False)
        num_groups = 1 + max(
            ((p >> 8) & 0xFFFF) for p in huff_image
        )

    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, 40),  # distance
            )
        )

    n = w * h
    out = [0] * n
    pos = 0
    hw = _subsample_size(w, huff_bits) if huff_image is not None else 0
    group = groups[0]
    while pos < n:
        if huff_image is not None:
            x, y = pos % w, pos // w
            meta = huff_image[(y >> huff_bits) * hw + (x >> huff_bits)]
            group = groups[(meta >> 8) & 0xFFFF]
        g_code, r_code, b_code, a_code, d_code = group
        s = g_code.decode(br)
        if s < 256:
            red = r_code.decode(br)
            blue = b_code.decode(br)
            alpha = a_code.decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache_size:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif s < 256 + 24:
            length = _prefix_value(br, s - 256)
            dist = _plane_to_dist(_prefix_value(br, d_code.decode(br)), w)
            if dist > pos:
                raise ValueError("VP8L: backward reference before start")
            if pos + length > n:
                raise ValueError("VP8L: backward reference past image end")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache_size:
                    cache[
                        (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
        else:
            idx = s - 256 - 24
            out[pos] = cache[idx]
            pos += 1
    return out


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) >> 1) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8)
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(left: int, top: int, tl: int) -> int:
    p_l = p_t = 0
    for sh in (24, 16, 8, 0):
        lc, tc, tlc = (left >> sh) & 0xFF, (top >> sh) & 0xFF, (tl >> sh) & 0xFF
        p = lc + tc - tlc
        p_l += abs(p - lc)
        p_t += abs(p - tc)
    return left if p_l < p_t else top


def _cas_full(left: int, top: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        c = _clamp(
            ((left >> sh) & 0xFF) + ((top >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        )
        out |= c << sh
    return out


def _cas_half(left: int, top: int, tl: int) -> int:
    ave = _avg2(left, top)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        d = a - ((tl >> sh) & 0xFF)
        # C integer division toward zero (libwebp / spec pseudocode)
        c = _clamp(a + (abs(d) >> 1) * (1 if d >= 0 else -1))
        out |= c << sh
    return out


def _predict(mode: int, left: int, top: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), top)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(tl, top)
    if mode == 9:
        return _avg2(top, tr)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(top, tr))
    if mode == 11:
        return _select(left, top, tl)
    if mode == 12:
        return _cas_full(left, top, tl)
    if mode == 13:
        return _cas_half(left, top, tl)
    raise ValueError(f"VP8L: predictor mode {mode} out of range")


def _add_pixels(px: int, pred: int) -> int:
    return (
        ((((px >> 24) + (pred >> 24)) & 0xFF) << 24)
        | (((((px >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16)
        | (((((px >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8)
        | (((px & 0xFF) + (pred & 0xFF)) & 0xFF)
    )


def _inv_predictor(argb: list[int], w: int, h: int, bits: int,
                   modes: list[int]) -> None:
    bw = _subsample_size(w, bits)
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = argb[i - 1]
            elif x == 0:
                pred = argb[i - w]
            else:
                mode = (modes[(y >> bits) * bw + (x >> bits)] >> 8) & 0xFF
                # memory-layout TR rule: at x = w-1 this reads the
                # current row's first (already decoded) pixel — the
                # spec's rightmost-column convention
                pred = _predict(
                    mode, argb[i - 1], argb[i - w], argb[i - w + 1],
                    argb[i - w - 1],
                )
            argb[i] = _add_pixels(argb[i], pred)


def _ct_delta(t: int, c: int) -> int:
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inv_color_transform(argb: list[int], w: int, h: int, bits: int,
                         elems: list[int]) -> None:
    bw = _subsample_size(w, bits)
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            e = elems[(y >> bits) * bw + (x >> bits)]
            g2r, g2b, r2b = e & 0xFF, (e >> 8) & 0xFF, (e >> 16) & 0xFF
            px = argb[i]
            g = (px >> 8) & 0xFF
            red = ((px >> 16) & 0xFF) + _ct_delta(g2r, g)
            red &= 0xFF
            blue = (px & 0xFF) + _ct_delta(g2b, g) + _ct_delta(r2b, red)
            argb[i] = (px & 0xFF00FF00) | (red << 16) | (blue & 0xFF)


def _inv_subtract_green(argb: list[int]) -> None:
    for i, px in enumerate(argb):
        g = (px >> 8) & 0xFF
        red = (((px >> 16) & 0xFF) + g) & 0xFF
        blue = ((px & 0xFF) + g) & 0xFF
        argb[i] = (px & 0xFF00FF00) | (red << 16) | blue


def _palette_width_bits(palette_size: int) -> int:
    if palette_size <= 2:
        return 3
    if palette_size <= 4:
        return 2
    if palette_size <= 16:
        return 1
    return 0


def _inv_color_indexing(
    argb: list[int], packed_w: int, w: int, h: int, palette: list[int]
) -> list[int]:
    wb = _palette_width_bits(len(palette))
    xsub = 1 << wb
    bpp = 8 >> wb
    mask = (1 << bpp) - 1
    out = [0] * (w * h)
    for y in range(h):
        prow = y * packed_w
        orow = y * w
        for x in range(w):
            packed = argb[prow + (x >> wb)]
            idx = ((packed >> 8) >> (bpp * (x & (xsub - 1)))) & mask
            if idx >= len(palette):
                raise ValueError(
                    f"VP8L: palette index {idx} outside the "
                    f"{len(palette)}-entry palette"
                )
            out[orow + x] = palette[idx]
    return out


def _decode_vp8l_payload(data: bytes):
    br = _BitReader(data)
    if br.read(8) != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    if w * h > _MAX_PIXELS:
        raise ValueError(
            f"VP8L: {w}x{h} exceeds the {_MAX_PIXELS}-pixel "
            f"decompression-bomb guard"
        )

    # transforms (top level only), captured in read order
    transforms: list[tuple] = []
    seen: set[int] = set()
    xsize = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError(f"VP8L: transform {ttype} appears twice")
        seen.add(ttype)
        if ttype == 0:  # predictor
            bits = br.read(3) + 2
            bw, bh = _subsample_size(xsize, bits), _subsample_size(h, bits)
            modes = _read_entropy_image(br, bw, bh, False)
            transforms.append(("pred", bits, modes))
        elif ttype == 1:  # color
            bits = br.read(3) + 2
            bw, bh = _subsample_size(xsize, bits), _subsample_size(h, bits)
            elems = _read_entropy_image(br, bw, bh, False)
            transforms.append(("color", bits, elems))
        elif ttype == 2:
            transforms.append(("sub_green",))
        else:  # color indexing
            palette_size = br.read(8) + 1
            deltas = _read_entropy_image(br, palette_size, 1, False)
            palette = []
            prev = 0
            for d in deltas:
                entry = (
                    (((prev >> 24) + (d >> 24)) & 0xFF) << 24
                    | ((((prev >> 16) & 0xFF) + ((d >> 16) & 0xFF)) & 0xFF)
                    << 16
                    | ((((prev >> 8) & 0xFF) + ((d >> 8) & 0xFF)) & 0xFF)
                    << 8
                    | (((prev & 0xFF) + (d & 0xFF)) & 0xFF)
                )
                palette.append(entry)
                prev = entry
            packed_w = _subsample_size(
                xsize, _palette_width_bits(palette_size)
            )
            transforms.append(("index", xsize, palette))
            xsize = packed_w

    argb = _read_entropy_image(br, xsize, h, True)

    for t in reversed(transforms):
        if t[0] == "index":
            full_w, palette = t[1], t[2]
            argb = _inv_color_indexing(argb, xsize, full_w, h, palette)
            xsize = full_w
        elif t[0] == "sub_green":
            _inv_subtract_green(argb)
        elif t[0] == "color":
            _inv_color_transform(argb, xsize, h, t[1], t[2])
        else:
            _inv_predictor(argb, xsize, h, t[1], t[2])
    return w, h, argb


def decode_webp(payload: bytes) -> dict:
    """RIFF/WEBP → the `decode_image` contract: {"width", "height",
    "mode": "RGB", "pixels": (h, w, 3) uint8} (alpha dropped, like the
    TIFF path). ValueError on corruption; typed ValueError gates for
    lossy VP8 and animation."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    vp8l = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"WebP: truncated {tag!r} chunk")
        if tag == b"VP8L":
            vp8l = body
            break
        if tag == b"VP8 ":
            raise ValueError(
                "WebP: lossy VP8 decode is implementation-variant and "
                "stays import-gated (the MP3 doctrine); only lossless "
                "VP8L decodes natively"
            )
        if tag in (b"ANIM", b"ANMF"):
            raise ValueError(
                "WebP: animated WebP is the video family's concern; "
                "still-image VP8L decodes natively"
            )
        if tag == b"VP8X":
            pass  # extended header: keep walking the sub-chunks
        pos += 8 + size + (size & 1)
    if vp8l is None:
        raise ValueError("WebP: no VP8L chunk found")
    w, h, argb = _decode_vp8l_payload(vp8l)
    arr = np.array(argb, dtype=np.uint32).reshape(h, w)
    rgb = np.empty((h, w, 3), dtype=np.uint8)
    rgb[:, :, 0] = (arr >> 16) & 0xFF
    rgb[:, :, 1] = (arr >> 8) & 0xFF
    rgb[:, :, 2] = arr & 0xFF
    return {"width": w, "height": h, "mode": "RGB", "pixels": rgb}


# ---------------------------------------------------------------------------
# encoder (fixture half)
# ---------------------------------------------------------------------------


def _huffman_lengths_impl(freqs: dict[int, int], max_len: int = 15):
    """Length-limited canonical Huffman lengths from a histogram
    (heap build + clamp-and-repair against the Kraft sum): returns
    {symbol: code_length}."""
    import heapq

    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 1}
    # heap of (freq, tiebreak, symbols_tuple)
    heap = [(f, s, (s,)) for s, f in sorted(freqs.items())]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    tb = 1 << 30
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        tb += 1
        heapq.heappush(heap, (f1 + f2, tb, s1 + s2))
    # clamp-and-repair to max_len. The code must end COMPLETE (Kraft
    # sum exactly 1): zstd Huffman weights must total a power of two
    # and libwebp rejects incomplete VP8L codes, so after fixing
    # over-subscription we also repair UNDER-completeness by promoting
    # the deepest symbols whose gain fits the remaining deficit (the
    # deficit is always divisible by the deepest symbol's gain, so the
    # greedy step always finds a candidate).
    over = [s for s in syms if depth[s] > max_len]
    if over:
        for s in over:
            depth[s] = max_len
        kraft = sum(1 << (max_len - depth[s]) for s in syms)
        budget = 1 << max_len
        bysh = sorted(syms, key=lambda s: depth[s])
        i = 0
        while kraft > budget:
            s = bysh[i % len(bysh)]
            if depth[s] < max_len:
                kraft -= 1 << (max_len - depth[s] - 1)
                depth[s] += 1
            i += 1
        while kraft < budget:
            need = budget - kraft
            best = None
            for s in syms:
                if depth[s] > 1 and (1 << (max_len - depth[s])) <= need:
                    if best is None or depth[s] > depth[best]:
                        best = s
            if best is None:  # unreachable by the divisibility argument
                raise ValueError("huffman completion failed")
            kraft += 1 << (max_len - depth[best])
            depth[best] -= 1
    return depth


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """{symbol: (code_value_msb, length)} in canonical order."""
    out = {}
    code = 0
    prev = None
    for length, sym in sorted((l, s) for s, l in lengths.items() if l):
        if prev is None:
            prev = length
        code <<= length - prev
        prev = length
        out[sym] = (code, length)
        code += 1
    return out


def _write_code_msb(bw: _BitWriter, code: int, length: int) -> None:
    """Canonical code values are MSB-defined; the stream is LSB-first
    bit order, so emit the code's bits most-significant first."""
    for i in range(length - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _write_prefix_code(
    bw: _BitWriter, lengths: dict[int, int], alphabet_size: int
):
    """Emit one prefix code: the simple form for ≤2 symbols, else the
    normal form (code-length code + 17/18 zero runs, no max_symbol)."""
    nz = sorted(s for s, l in lengths.items() if l)
    if 1 <= len(nz) <= 2 and nz[-1] <= 255:
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        if nz[0] <= 1 and len(nz) == 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(nz[0], 1)
        else:
            bw.write(1, 1)
            bw.write(nz[0], 8)
        if len(nz) == 2:
            bw.write(nz[1], 8)
        return
    bw.write(0, 1)  # normal

    # serialize lengths with zero-run symbols
    seq: list[tuple[int, int, int]] = []  # (symbol, extra, extra_bits)
    i = 0
    full = [lengths.get(s, 0) for s in range(alphabet_size)]
    while i < alphabet_size:
        if full[i] == 0:
            run = 1
            while i + run < alphabet_size and full[i + run] == 0:
                run += 1
            left = run
            while left >= 11:
                chunk = min(left, 138)
                seq.append((18, chunk - 11, 7))
                left -= chunk
            while left >= 3:
                chunk = min(left, 10)
                seq.append((17, chunk - 3, 3))
                left -= chunk
            for _ in range(left):
                seq.append((0, 0, 0))
            i += run
        else:
            seq.append((full[i], 0, 0))
            i += 1

    clc_freq: dict[int, int] = {}
    for s, _, _ in seq:
        clc_freq[s] = clc_freq.get(s, 0) + 1
    if len(clc_freq) == 1:
        # degenerate: give the unused length-0 symbol a dummy slot so
        # the code-length code is a complete 1-bit code
        dummy = 0 if 0 not in clc_freq else 1
        clc_freq[dummy] = 1
    clc_len = _huffman_lengths_impl(clc_freq, max_len=7)
    clc_codes = _canonical_codes(clc_len)

    order_pos = {s: i for i, s in enumerate(_CLC_ORDER)}
    last = max(order_pos[s] for s in clc_len)
    num_clc = max(4, last + 1)
    bw.write(num_clc - 4, 4)
    for i in range(num_clc):
        bw.write(clc_len.get(_CLC_ORDER[i], 0), 3)
    bw.write(0, 1)  # no max_symbol cap
    for s, extra, ebits in seq:
        code, length = clc_codes[s]
        _write_code_msb(bw, code, length)
        if ebits:
            bw.write(extra, ebits)


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """value → (symbol, extra_value, extra_bits) for the length /
    distance prefix scheme."""
    if v <= 4:
        return v - 1, 0, 0
    u = v - 1
    eb = u.bit_length() - 2
    base = 1 << (eb + 1)
    if u >= base + (1 << eb):
        sym = 2 * eb + 3
        offset = base + (1 << eb)
    else:
        sym = 2 * eb + 2
        offset = base
    return sym, u - offset, eb


def _encode_entropy_image(
    bw: _BitWriter, argb: list[int], w: int, use_rle: bool,
    cache_bits: int = 0, top_level: bool = False,
) -> None:
    """One entropy-coded image: optional color cache, single prefix
    group, literal/RLE/cache-hit coding. Only TOP-LEVEL images carry
    the meta-prefix bit — sub-resolution images (transform data,
    palettes) have no meta codes in the bitstream (spec §4.3.2)."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if top_level:
        bw.write(0, 1)  # no meta prefix codes
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size

    # token pass: (kind, payload) where kind 'lit' → argb, 'ref' →
    # (length, dist_value), 'hit' → cache index. use_rle enables a
    # general greedy LZ77 matcher (3-pixel hash, min match 3) whose
    # distances encode through the 2D plane-code map when the offset
    # is in the 8-row neighborhood and as dist+120 otherwise — so
    # round-trips exercise the full distance-mapping surface, not
    # just the dist-1 run case.
    tokens: list[tuple] = []
    n = len(argb)
    i = 0
    dist_code: dict[int, int] = {}
    if use_rle:
        for di, (dx, dy) in enumerate(_DIST_MAP):
            d = dy * w + dx
            if d >= 1 and d not in dist_code:
                dist_code[d] = di + 1
    match_table: dict[tuple, int] = {}
    while i < n:
        if use_rle and i + 3 <= n:
            key = (argb[i], argb[i + 1], argb[i + 2])
            j = match_table.get(key)
            match_table[key] = i
            if j is not None:
                max_len = min(n - i, 4096)
                length = 0
                while length < max_len and argb[j + length] == argb[i + length]:
                    length += 1
                if length >= 3:
                    dist = i - j
                    tokens.append(
                        ("ref", length, dist_code.get(dist, dist + 120))
                    )
                    if cache_size:
                        # the decoder inserts every COPIED pixel —
                        # replay it or the cache states diverge
                        for k in range(length):
                            px = argb[i + k]
                            cache[
                                (0x1E35A7BD * px & 0xFFFFFFFF)
                                >> (32 - cache_bits)
                            ] = px
                    i += length
                    continue
        px = argb[i]
        if cache_size:
            idx = (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[idx] == px:
                tokens.append(("hit", idx))
                i += 1
                continue
            cache[idx] = px
        tokens.append(("lit", px))
        i += 1

    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            gf[(px >> 8) & 0xFF] = gf.get((px >> 8) & 0xFF, 0) + 1
            rf[(px >> 16) & 0xFF] = rf.get((px >> 16) & 0xFF, 0) + 1
            bf[px & 0xFF] = bf.get(px & 0xFF, 0) + 1
            af[(px >> 24) & 0xFF] = af.get((px >> 24) & 0xFF, 0) + 1
        elif t[0] == "ref":
            lsym, _, _ = _prefix_encode(t[1])
            gf[256 + lsym] = gf.get(256 + lsym, 0) + 1
            dsym, _, _ = _prefix_encode(t[2])
            df[dsym] = df.get(dsym, 0) + 1
        else:
            s = 256 + 24 + t[1]
            gf[s] = gf.get(s, 0) + 1
    for f in (rf, bf, af):
        if not f:
            f[0] = 1  # channel never emitted: 1-symbol simple code
    if not df:
        df[0] = 1

    green_alpha = 256 + 24 + cache_size
    gl = _huffman_lengths_impl(gf)
    rl = _huffman_lengths_impl(rf)
    bl = _huffman_lengths_impl(bf)
    al = _huffman_lengths_impl(af)
    dl = _huffman_lengths_impl(df)
    _write_prefix_code(bw, gl, green_alpha)
    _write_prefix_code(bw, rl, 256)
    _write_prefix_code(bw, bl, 256)
    _write_prefix_code(bw, al, 256)
    _write_prefix_code(bw, dl, 40)
    # precompute REVERSED code values: an MSB-first canonical code
    # emitted into the LSB-first writer is one write() of its
    # bit-reversal — the per-bit loop was the encoder's hot spot
    def _rev_codes(lengths):
        return {
            s: (_reverse_bits(c, l), l)
            for s, (c, l) in _canonical_codes(lengths).items()
        }

    gc, rc, bc, ac, dc = (
        _rev_codes(gl), _rev_codes(rl), _rev_codes(bl),
        _rev_codes(al), _rev_codes(dl),
    )

    def emit(codes, sym):
        rev, length = codes[sym]
        bw.write(rev, length)

    single_g = len([s for s in gl if gl[s]]) == 1
    single_r = len(rl) == 1
    single_b = len(bl) == 1
    single_a = len(al) == 1
    single_d = len(dl) == 1
    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            if not single_g:
                emit(gc, (px >> 8) & 0xFF)
            if not single_r:
                emit(rc, (px >> 16) & 0xFF)
            if not single_b:
                emit(bc, px & 0xFF)
            if not single_a:
                emit(ac, (px >> 24) & 0xFF)
        elif t[0] == "ref":
            lsym, lex, leb = _prefix_encode(t[1])
            if not single_g:
                emit(gc, 256 + lsym)
            if leb:
                bw.write(lex, leb)
            dsym, dex, deb = _prefix_encode(t[2])
            if not single_d:
                emit(dc, dsym)
            if deb:
                bw.write(dex, deb)
        else:
            if not single_g:
                emit(gc, 256 + 24 + t[1])


def encode_webp(
    pixels,
    *,
    use_palette: bool = False,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    cache_bits: int = 0,
    use_rle: bool = True,
) -> bytes:
    """Deterministic lossless WebP (VP8L in a RIFF container) from
    (h, w) grayscale or (h, w, 3) RGB uint8 — the fixture half; each
    keyword exercises a distinct decoder path (palette incl. sub-byte
    bundling, subtract-green, a uniform predictor transform, color
    cache, LZ77 RLE references)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = np.stack([px, px, px], axis=2)
    h, w, _ = px.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError(f"VP8L: dimensions {w}x{h} out of range")
    argb = (
        (0xFF000000
         | (px[:, :, 0].astype(np.uint32) << 16)
         | (px[:, :, 1].astype(np.uint32) << 8)
         | px[:, :, 2].astype(np.uint32))
        .reshape(-1)
        .tolist()
    )

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version

    xsize = w
    if subtract_green and not use_palette:
        bw.write(1, 1)
        bw.write(2, 2)
        argb = [
            (p & 0xFF00FF00)
            | (((((p >> 16) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF) << 16)
            | (((p & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF)
            for p in argb
        ]
    if predictor_mode is not None and not use_palette:
        if not 0 <= predictor_mode <= 13:
            raise ValueError("VP8L: predictor mode out of range")
        bits = 9  # 512-px blocks: still a real sub-image grid
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(bits - 2, 3)
        bwid, bhei = _subsample_size(xsize, bits), _subsample_size(h, bits)
        modes = [0xFF000000 | (predictor_mode << 8)] * (bwid * bhei)
        _encode_entropy_image(bw, modes, bwid, use_rle=False)
        # residuals in scan order against the not-yet-subtracted
        # neighbors (the decoder reconstructs them progressively)
        res = list(argb)
        for y in range(h - 1, -1, -1):
            for x in range(xsize - 1, -1, -1):
                i = y * xsize + x
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = argb[i - 1]
                elif x == 0:
                    pred = argb[i - xsize]
                else:
                    pred = _predict(
                        predictor_mode, argb[i - 1], argb[i - xsize],
                        argb[i - xsize + 1], argb[i - xsize - 1],
                    )
                res[i] = (
                    ((((argb[i] >> 24) - (pred >> 24)) & 0xFF) << 24)
                    | (((((argb[i] >> 16) & 0xFF)
                         - ((pred >> 16) & 0xFF)) & 0xFF) << 16)
                    | (((((argb[i] >> 8) & 0xFF)
                         - ((pred >> 8) & 0xFF)) & 0xFF) << 8)
                    | (((argb[i] & 0xFF) - (pred & 0xFF)) & 0xFF)
                )
        argb = res
    if use_palette:
        colors = sorted(set(argb))
        if len(colors) > 256:
            raise ValueError(
                f"VP8L: {len(colors)} colors exceed the 256-entry palette"
            )
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(colors) - 1, 8)
        deltas = []
        prev = 0
        for c in colors:
            deltas.append(
                ((((c >> 24) - (prev >> 24)) & 0xFF) << 24)
                | (((((c >> 16) & 0xFF) - ((prev >> 16) & 0xFF)) & 0xFF)
                   << 16)
                | (((((c >> 8) & 0xFF) - ((prev >> 8) & 0xFF)) & 0xFF) << 8)
                | (((c & 0xFF) - (prev & 0xFF)) & 0xFF)
            )
            prev = c
        _encode_entropy_image(bw, deltas, len(colors), use_rle=False)
        wb = _palette_width_bits(len(colors))
        xsub = 1 << wb
        bpp = 8 >> wb
        packed_w = _subsample_size(w, wb)
        colors_arr = np.array(colors, dtype=np.int64)
        idx = np.searchsorted(
            colors_arr, np.array(argb, dtype=np.int64)
        ).reshape(h, w)
        padded = np.zeros((h, packed_w * xsub), dtype=np.int64)
        padded[:, :w] = idx
        grouped = padded.reshape(h, packed_w, xsub)
        shifts = (bpp * np.arange(xsub, dtype=np.int64)).reshape(1, 1, -1)
        packed_green = (grouped << shifts).sum(axis=2)
        argb = (0xFF000000 | (packed_green << 8)).reshape(-1).tolist()
        xsize = packed_w
    bw.write(0, 1)  # end of transforms

    _encode_entropy_image(bw, argb, xsize, use_rle, cache_bits,
                          top_level=True)
    payload = bw.finish()

    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
