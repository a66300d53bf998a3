"""Native baseline-TIFF codec — written from the public TIFF 6.0
specification (Adobe, 1992) for the archival-corpus slice of the
multimodal ingest path (scans, scientific imagery, fax archives ship
as TIFF far more often than as PNG).

Scope (fail-loud ValueError outside it — the quarantine contract):

- both byte orders (II little / MM big endian), classic 32-bit IFDs;
- the FIRST image (multi-page TIFFs take page 0, like GIF frame 0);
- 8-bit grayscale (PhotometricInterpretation 0/1), 8-bit RGB(A)
  (alpha dropped), 8-bit palette (ColorMap 16-bit entries → high
  byte), chunky planar config, strip organization (any RowsPerStrip);
- Compression 1 (none), 32773 (PackBits), 5 (LZW — the TIFF variant:
  MSB-first bit packing and EARLY-CHANGE code widening, one code
  before GIF's boundary), each with Predictor 1 (none) or
  2 (horizontal differencing);
- `encode_tiff` fixture half: deterministic little-endian writer for
  gray/RGB with compression none/PackBits/LZW and optional
  predictor 2, round-trippable bit-exact (TIFF is lossless here).

Tiles, planar=2, 16-bit samples, JPEG-in-TIFF and BigTIFF raise with
the contract named. Cross-checked bit-exact both directions against
javax.imageio's TIFF plugin (Java 9+) in tests/test_tiff.py.
"""

from __future__ import annotations

import struct

__all__ = ["decode_tiff", "encode_tiff"]

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8}

#: decompression-bomb guard (ADVICE r13) — same formula as Pillow's
#: default MAX_IMAGE_PIXELS; see gifcodec._MAX_PIXELS for rationale
_MAX_PIXELS = 1024 * 1024 * 1024 // 4 // 3


def _read_ifd(payload: bytes, off: int, bo: str) -> dict[int, tuple]:
    """tag → (type, values tuple) for one IFD."""
    if off + 2 > len(payload):
        raise ValueError("TIFF: truncated IFD")
    (n,) = struct.unpack_from(bo + "H", payload, off)
    entries = {}
    pos = off + 2
    if pos + 12 * n > len(payload):
        raise ValueError("TIFF: truncated IFD entries")
    for _ in range(n):
        tag, typ, cnt = struct.unpack_from(bo + "HHI", payload, pos)
        size = _TYPE_SIZES.get(typ, 0) * cnt
        if size == 0:
            pos += 12
            continue  # unknown type: skip per spec
        if size <= 4:
            voff = pos + 8
        else:
            (voff,) = struct.unpack_from(bo + "I", payload, pos + 8)
            if voff + size > len(payload):
                raise ValueError(f"TIFF: tag {tag} value out of range")
        fmt = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}.get(typ)
        if fmt:
            vals = struct.unpack_from(bo + str(cnt) + fmt, payload, voff)
        elif typ in (5, 10):  # rationals
            raw = struct.unpack_from(
                bo + str(2 * cnt) + ("I" if typ == 5 else "i"),
                payload, voff,
            )
            vals = tuple(
                raw[i] / raw[i + 1] if raw[i + 1] else 0.0
                for i in range(0, len(raw), 2)
            )
        else:
            vals = (payload[voff : voff + size],)
        entries[tag] = (typ, vals)
        pos += 12
    return entries


def _unpackbits(data: bytes, expected: int) -> bytes:
    """PackBits (TIFF 6.0 §9): runs of literal / repeated bytes."""
    out = bytearray()
    i = 0
    n = len(data)
    while len(out) < expected:
        if i >= n:
            raise ValueError("TIFF: PackBits stream exhausted")
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1 bytes
            if i + c + 1 > n:
                raise ValueError("TIFF: PackBits literal overruns")
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:  # repeat next byte 257-c times
            if i >= n:
                raise ValueError("TIFF: PackBits repeat overruns")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op per spec
    return bytes(out[:expected])


#: LZW root table (256 single-byte entries + clear/EOI placeholders),
#: built once — per-call reconstruction showed up in the decode profile
_LZW_BASE_TABLE = [bytes([i]) for i in range(256)] + [b"", b""]


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, 8-bit symbols,
    clear = 256, EOI = 257, EARLY-CHANGE widening (the width grows
    when the next assigned code would be 2^width − 1, one code before
    the GIF boundary — TIFF 6.0 §13 as implemented by every shipping
    writer)."""
    clear, eoi = 256, 257
    base = _LZW_BASE_TABLE
    table = list(base)
    tlen = 258
    width = 9
    mask = (1 << width) - 1
    # early change: widen one code EARLIER than the table-full
    # boundary (writers emit the next code already wide)
    grow_at = (1 << width) - 1
    out = bytearray()
    out_len = 0
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    prev: bytes | None = None
    while out_len < expected:
        while nbits < width:
            if pos >= n:
                raise ValueError("TIFF: LZW stream exhausted")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        nbits -= width
        code = (acc >> nbits) & mask
        # trim consumed bits: without this the accumulator grows into
        # an unbounded bigint and every shift goes O(stream length)
        acc &= (1 << nbits) - 1
        if code < tlen:
            if code == clear:
                table = list(base)
                tlen = 258
                width = 9
                mask = (1 << width) - 1
                grow_at = (1 << width) - 1
                prev = None
                continue
            if code == eoi:
                break
            entry = table[code]
            # 12-bit cap (ADVICE r13): a compliant writer CLEARs before
            # code 4096; growing past it lets a CLEAR-free corrupt
            # stream build unboundedly long entries before any error
            if prev is not None and tlen < 4096:
                table.append(prev + entry[:1])
                tlen += 1
        elif code == tlen and prev is not None and tlen < 4096:
            entry = prev + prev[:1]
            table.append(entry)
            tlen += 1
        else:
            if prev is None:
                raise ValueError(f"TIFF: first LZW code {code} invalid")
            raise ValueError(f"TIFF: LZW code {code} beyond table")
        out += entry
        out_len += len(entry)
        prev = entry
        if tlen == grow_at and width < 12:
            width += 1
            mask = (1 << width) - 1
            grow_at = (1 << width) - 1
    if out_len < expected:
        raise ValueError(f"TIFF: LZW produced {out_len} of {expected}")
    return bytes(out[:expected])


def decode_tiff(payload: bytes) -> dict:
    """Baseline TIFF → the `decode_image` contract: {"width",
    "height", "mode": "RGB" | "L", "pixels"} for the first page.
    Raises ValueError on corruption or out-of-scope features."""
    import numpy as np

    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    magic, first_ifd = struct.unpack_from(bo + "HI", payload, 2)
    if magic == 43:
        raise ValueError("TIFF: BigTIFF not supported")
    if magic != 42:
        raise ValueError(f"TIFF: bad magic {magic}")
    ifd = _read_ifd(payload, first_ifd, bo)

    def tagv(tag, default=None):
        e = ifd.get(tag)
        return e[1] if e else default

    w = tagv(256, (0,))[0]
    h = tagv(257, (0,))[0]
    if not w or not h:
        raise ValueError(f"TIFF: zero dimensions {w}x{h}")
    if w * h > _MAX_PIXELS:
        # width/height are 32-bit LONGs: an 8-byte header edit can
        # demand a multi-GB canvas, and MemoryError is deliberately not
        # a quarantine class (ADVICE r13) — refuse before allocating
        raise ValueError(
            f"TIFF: {w}x{h} exceeds the {_MAX_PIXELS}-pixel "
            f"decompression-bomb guard"
        )
    comp = tagv(259, (1,))[0]
    photo = tagv(262, (1,))[0]
    spp = tagv(277, (1,))[0]
    bps = tagv(258, tuple([1] * spp))
    planar = tagv(284, (1,))[0]
    predictor = tagv(317, (1,))[0]
    if planar != 1:
        raise ValueError("TIFF: planar configuration 2 not supported")
    if any(b != 8 for b in bps):
        raise ValueError(f"TIFF: only 8-bit samples supported, got {bps}")
    if comp not in (1, 5, 32773):
        raise ValueError(
            f"TIFF: compression {comp} not supported "
            f"(none/LZW/PackBits decode natively)"
        )
    if predictor not in (1, 2):
        raise ValueError(f"TIFF: predictor {predictor} not supported")
    if photo not in (0, 1, 2, 3):
        raise ValueError(f"TIFF: photometric {photo} not supported")
    offs = tagv(273)
    cnts = tagv(279)
    if not offs or not cnts or len(offs) != len(cnts):
        raise ValueError("TIFF: missing or inconsistent strip tags")
    rps = tagv(278, (h,))[0] or h

    row_bytes = w * spp
    raw = bytearray()
    for si, (o, c) in enumerate(zip(offs, cnts)):
        if o + c > len(payload):
            raise ValueError(f"TIFF: strip {si} out of range")
        rows = min(rps, h - si * rps)
        if rows <= 0:
            raise ValueError("TIFF: more strips than rows")
        expected = rows * row_bytes
        chunk = payload[o : o + c]
        if comp == 1:
            if len(chunk) < expected:
                raise ValueError(f"TIFF: strip {si} short")
            raw += chunk[:expected]
        elif comp == 32773:
            raw += _unpackbits(chunk, expected)
        else:
            raw += _lzw_decode_tiff(chunk, expected)
    px = np.frombuffer(bytes(raw), dtype=np.uint8, count=h * row_bytes)
    px = px.reshape(h, w, spp) if spp > 1 else px.reshape(h, w)
    if predictor == 2:
        px = np.cumsum(px.astype(np.uint32), axis=1).astype(np.uint8)

    if photo == 3:
        cmap = ifd.get(320)
        if not cmap:
            raise ValueError("TIFF: palette image without ColorMap")
        vals = cmap[1]
        if len(vals) != 3 * 256:
            raise ValueError(
                f"TIFF: ColorMap holds {len(vals)} values, want 768"
            )
        table = (
            np.array(vals, dtype=np.uint16).reshape(3, 256).T >> 8
        ).astype(np.uint8)
        idx = px if px.ndim == 2 else px[:, :, 0]
        return {"width": int(w), "height": int(h), "mode": "RGB",
                "pixels": table[idx]}
    if photo in (0, 1):
        g = px if px.ndim == 2 else px[:, :, 0]
        if photo == 0:  # WhiteIsZero
            g = (255 - g.astype(np.int16)).astype(np.uint8)
        return {"width": int(w), "height": int(h), "mode": "L",
                "pixels": g}
    # photo == 2: RGB(A) — alpha dropped
    if spp < 3:
        raise ValueError(f"TIFF: RGB with {spp} samples/pixel")
    return {"width": int(w), "height": int(h), "mode": "RGB",
            "pixels": px[:, :, :3].copy()}


def _packbits(row: bytes) -> bytes:
    """PackBits encode one row (repeat runs ≥ 3 compressed)."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(row[i])
            i += run
            continue
        # literal run up to the next ≥3 repeat
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and row[j] == row[j + 1] == row[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += row[i:j]
        i = j
    return bytes(out)


def _lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF-variant LZW encode (MSB-first, early change) — the
    inverse of `_lzw_decode_tiff`. The bit emitter is INLINED in the
    symbol loop (the closure call per emitted code was a visible
    slice of the encode profile); the accumulator is trimmed after
    every flush so it never grows into a bigint."""
    clear, eoi = 256, 257
    out = bytearray()
    append = out.append
    acc = 0
    nbits = 0

    table: dict = {}
    get = table.get
    next_code = 258
    width = 9
    # emit CLEAR
    acc = (acc << width) | clear
    nbits += width
    while nbits >= 8:
        nbits -= 8
        append((acc >> nbits) & 0xFF)
    acc &= (1 << nbits) - 1
    it = iter(data)
    cur = -1
    for v in it:
        cur = v
        break
    for v in it:
        key = (cur << 8) | v
        hit = get(key)
        if hit is not None:
            cur = hit
            continue
        acc = (acc << width) | cur
        nbits += width
        while nbits >= 8:
            nbits -= 8
            append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1
        table[key] = next_code
        # early change: widen when the JUST-ASSIGNED value is
        # 2^width − 1 — one entry earlier than the GIF variant, so
        # the decoder's next-slot rule (widen when the table's next
        # free slot reaches 2^width − 1) reads the following code at
        # the new width
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        next_code += 1
        if next_code > 4093:
            acc = (acc << width) | clear
            nbits += width
            while nbits >= 8:
                nbits -= 8
                append((acc >> nbits) & 0xFF)
            acc &= (1 << nbits) - 1
            table = {}
            get = table.get
            next_code = 258
            width = 9
        cur = v
    if cur >= 0:
        acc = (acc << width) | cur
        nbits += width
        while nbits >= 8:
            nbits -= 8
            append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1
    acc = (acc << width) | eoi
    nbits += width
    while nbits >= 8:
        nbits -= 8
        append((acc >> nbits) & 0xFF)
    acc &= (1 << nbits) - 1
    if nbits:
        append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(
    pixels,
    compression: str = "none",
    predictor: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Encode an (H, W) gray or (H, W, 3) RGB uint8 array as a
    little-endian baseline TIFF — deterministic, losslessly
    round-trippable through `decode_tiff`. `compression`:
    'none' | 'packbits' | 'lzw'; `predictor` applies horizontal
    differencing (LZW/none only — the spec allows it anywhere, real
    writers pair it with LZW)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim not in (2, 3) or (px.ndim == 3 and px.shape[2] != 3):
        raise ValueError("encode_tiff expects (H, W) or (H, W, 3) uint8")
    h, w = px.shape[:2]
    if not h or not w:
        raise ValueError("encode_tiff: empty image")
    spp = 1 if px.ndim == 2 else 3
    comp_code = {"none": 1, "packbits": 32773, "lzw": 5}.get(compression)
    if comp_code is None:
        raise ValueError(f"encode_tiff: unknown compression {compression}")
    rps = rows_per_strip or h

    body = px
    if predictor:
        body = body.astype(np.int16)
        if spp == 1:
            body = np.concatenate(
                [body[:, :1], np.diff(body, axis=1)], axis=1
            )
        else:
            body = np.concatenate(
                [body[:, :1, :], np.diff(body, axis=1)], axis=1
            )
        body = (body & 0xFF).astype(np.uint8)

    strips = []
    for r0 in range(0, h, rps):
        block = body[r0 : r0 + rps].tobytes()
        if comp_code == 1:
            strips.append(block)
        elif comp_code == 32773:
            row_bytes = w * spp
            enc = bytearray()
            for i in range(0, len(block), row_bytes):
                enc += _packbits(block[i : i + row_bytes])
            strips.append(bytes(enc))
        else:
            strips.append(_lzw_encode_tiff(block))

    n_strips = len(strips)
    tags = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, spp, None if spp > 2 else 8),
        (259, 3, 1, comp_code),
        (262, 3, 1, 1 if spp == 1 else 2),
        (273, 4, n_strips, None),
        (277, 3, 1, spp),
        (278, 4, 1, rps),
        (279, 4, n_strips, None),
        (284, 3, 1, 1),
    ]
    if predictor:
        tags.append((317, 3, 1, 2))
    tags.sort()

    header = struct.pack("<2sHI", b"II", 42, 8)
    ifd_size = 2 + 12 * len(tags) + 4
    # layout: header | IFD | out-of-line tag values | strips
    extra = bytearray()
    extra_base = 8 + ifd_size

    def outline(fmt: str, vals) -> int:
        off = extra_base + len(extra)
        extra.extend(struct.pack("<" + fmt, *vals))
        return off

    bps_vals = tuple([8] * spp)
    strip_off_base = None  # patched below
    ifd = bytearray(struct.pack("<H", len(tags)))
    patch_positions = {}
    for tag, typ, cnt, val in tags:
        entry = struct.pack("<HHI", tag, typ, cnt)
        if tag == 258 and spp > 2:
            entry += struct.pack("<I", outline(f"{spp}H", bps_vals))
        elif tag in (273, 279):
            if cnt == 1:
                patch_positions[tag] = 8 + len(ifd) + 8
                entry += struct.pack("<I", 0)
            else:
                patch_positions[tag] = extra_base + len(extra)
                entry += struct.pack("<I", outline(f"{cnt}I", [0] * cnt))
        else:
            if typ == 3:
                entry += struct.pack("<HH", val, 0)
            else:
                entry += struct.pack("<I", val)
        ifd += entry
    ifd += struct.pack("<I", 0)  # no next IFD

    data_base = extra_base + len(extra)
    strip_offsets = []
    pos = data_base
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    strip_counts = [len(s) for s in strips]

    out = bytearray(header + ifd + extra + b"".join(strips))
    for tag, vals in ((273, strip_offsets), (279, strip_counts)):
        p = patch_positions[tag]
        if n_strips == 1:
            struct.pack_into("<I", out, p, vals[0])
        else:
            struct.pack_into(f"<{n_strips}I", out, p, *vals)
    return bytes(out)
