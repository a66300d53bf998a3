"""Native FLAC codec (r12) — lossless audio for the multimodal path.

Written from the public FLAC format specification (xiph.org /
RFC 9639): "fLaC" magic → metadata blocks (STREAMINFO mandatory) →
frames of rice-coded subframes. The decoder covers the full subset
real encoders emit for integer PCM: CONSTANT / VERBATIM / FIXED
(orders 0-4) / LPC (orders 1-32) subframes, both rice residual
methods (4- and 5-bit parameters, escape-to-raw partitions, partition
orders 0-15), all four channel assignments (independent, left/side,
right/side, mid/side), 8/12/16/20/24-bit samples, and both blocking
strategies. CRC-8 (frame header) and CRC-16 (whole frame) are
VERIFIED — a corrupt stream raises ValueError (the multimodal
quarantine class), never returns wrong samples silently.

The encoder half (`encode_flac`) is the fixtures/re-encode
counterpart (the encode_bmp / encode_y4m_gray / encode_jpeg
precedent): deterministic fixed-predictor selection (orders 0-2 by
residual magnitude), single-partition rice residuals, CONSTANT
collapse, independent channels — a valid, compact subset any
spec-conforming decoder reads back bit-exactly.

Because FLAC is LOSSLESS, the audio fingerprint dedup model survives
a WAV→FLAC re-encode EXACTLY (bit-equal waveforms → bit-equal
fingerprints) — unlike the G.711 companded path, where only
near-stability holds. Pinned in tests/test_round12.py.

Reference parity note: the reference repo (a GRIB2→JSON→Postgres cron
ETL, SURVEY.md §1) has no audio surface; this module serves the
engine's multimodal-corpus mandate (BASELINE.json north_star).
"""

from __future__ import annotations

import struct

__all__ = ["decode_flac", "encode_flac"]

#: frame-header sample-rate codes (Hz); None = read from elsewhere
_SR_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _make_crc_table(poly: int, width: int) -> list[int]:
    top, mask = 1 << (width - 1), (1 << width) - 1
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0 —
    table-driven (one lookup per byte; the per-bit form was the
    decode hot spot)."""
    crc = 0
    t = _CRC8_TABLE
    for b in data:
        crc = t[crc ^ b]
    return crc


def _crc16_scalar(data: bytes) -> int:
    crc = 0
    t = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFF00) ^ t[(crc >> 8) ^ b]
    return crc


#: vectorized-CRC16 table cache: "shift state by k zero bytes" as a
#: pair of 256-entry uint16 tables (new = hi[s>>8] ^ lo[s&0xFF] — CRC
#:  is GF(2)-linear, so the two byte halves superpose), built by
#: doubling from k=1; plus the per-column tables of the 8-byte fold.
_CRC16_SHIFT: dict = {}
_CRC16_COLS: list | None = None


def _crc16_shift_tables(k: int):
    t = _CRC16_SHIFT.get(k)
    if t is None:
        import numpy as np

        if k == 1:
            # state v<<8 after one zero byte: table[v]; state v: v<<8
            hi = np.array(_CRC16_TABLE, dtype=np.uint16)
            lo = (np.arange(256, dtype=np.uint32) << 8).astype(
                np.uint16
            )
        else:
            h1, l1 = _crc16_shift_tables(k // 2)
            hs, ls = h1.copy(), l1.copy()
            hi = h1[hs >> 8] ^ l1[hs & 0xFF]
            lo = h1[ls >> 8] ^ l1[ls & 0xFF]
        t = _CRC16_SHIFT[k] = (hi, lo)
    return t


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0.
    Short inputs run the table-driven byte loop; frame-sized inputs
    fold 8 bytes per vectorized step (per-column contribution tables)
    and then combine the fold states by doubling — ~4× the byte loop
    at FLAC frame sizes, bit-identical (pinned against the scalar in
    tests)."""
    n = len(data)
    if n < 128:
        return _crc16_scalar(data)
    import numpy as np

    global _CRC16_COLS
    if _CRC16_COLS is None:
        cols = []
        for j in range(8):
            v = np.array(_CRC16_TABLE, dtype=np.uint16)
            hi1, lo1 = _crc16_shift_tables(1)
            for _ in range(7 - j):  # column j sits 7-j bytes from end
                v = hi1[v >> 8] ^ lo1[v & 0xFF]
            cols.append(v)
        _CRC16_COLS = cols
    arr = np.frombuffer(data, dtype=np.uint8)
    m = -(-n // 8)
    size = 1 << (m - 1).bit_length()
    # pad with LEADING zeros (CRC-neutral at init 0) to 8·2^j bytes
    buf = np.zeros(size * 8, dtype=np.uint8)
    buf[size * 8 - n :] = arr
    g = buf.reshape(size, 8)
    C = _CRC16_COLS
    v = (
        C[0][g[:, 0]] ^ C[1][g[:, 1]] ^ C[2][g[:, 2]] ^ C[3][g[:, 3]]
        ^ C[4][g[:, 4]] ^ C[5][g[:, 5]] ^ C[6][g[:, 6]] ^ C[7][g[:, 7]]
    )
    k = 8
    while len(v) > 1:
        left, right = v[0::2], v[1::2]
        hi, lo = _crc16_shift_tables(k)
        v = hi[left >> 8] ^ lo[left & 0xFF] ^ right
        k *= 2
    return int(v[0])


class _BitReader:
    __slots__ = ("data", "pos", "bit", "bits", "ones")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bit = 0
        self.bits = None  # lazy np.unpackbits view (decode fast path)
        self.ones = None  # sorted positions of set bits, int64 ndarray

    def _ensure_bits(self):
        """Materialize the whole payload as a bit array + set-bit
        index ONCE per stream — the vectorized rice path's backing
        store (≈9× payload bytes; a FLAC frame is KBs). Both stay
        ndarrays: each rice block slices out just its own window of
        set bits (a stream-wide Python list cost more to build than
        every chain walk it served)."""
        if self.bits is None:
            import numpy as np

            self.bits = np.unpackbits(
                np.frombuffer(self.data, dtype=np.uint8)
            )
            self.ones = np.flatnonzero(self.bits).astype(np.int64)
        return self.bits, self.ones

    def read(self, n: int) -> int:
        out = 0
        while n:
            if self.pos >= len(self.data):
                raise ValueError("FLAC: bitstream truncated")
            avail = 8 - self.bit
            take = min(n, avail)
            byte = self.data[self.pos]
            out = (out << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            n -= take
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.pos >= len(self.data):
                raise ValueError("FLAC: bitstream truncated in unary")
            if self.read(1):
                return q
            q += 1

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _read_utf8_number(r: _BitReader) -> int:
    """The frame header's UTF-8-style coded number (up to 36 bits)."""
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("FLAC: bad UTF-8 coded number")
    val = b0 & (mask - 1)
    for _ in range(n):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("FLAC: bad UTF-8 continuation")
        val = (val << 6) | (b & 0x3F)
    return val


def _rice_block_fast(r: _BitReader, n: int, k: int):
    """Vectorized rice decode of `n` values with parameter `k`:
    unary terminator positions walk a block-local window of the
    stream's set-bit index (remainder fields may contain 1s, so the
    next set bit at/after the cursor is exactly the terminator), then
    the k-bit remainders gather as ONE (n × k) matrix. Advances the
    reader past the block. Returns an int64 array of zigzag-DECODED
    residuals."""
    import numpy as np

    bits, ones = r._ensure_bits()
    cur = r.pos * 8 + r.bit
    dk = 1 + k
    # bound the set-bit window for THIS block: each value consumes
    # exactly one terminator and skips at most k set bits inside its
    # remainder, so ≤ n·(k+1) entries — a few-KB local list instead of
    # a stream-wide index
    idx0 = int(np.searchsorted(ones, cur))
    o = ones[idx0 : idx0 + n * dk].tolist()
    terms: list[int] = []
    app = terms.append
    ptr = 0
    try:
        for _ in range(n):
            p = o[ptr]
            while p < cur:  # set bit inside a remainder field: skip
                ptr += 1
                p = o[ptr]
            app(p)
            cur = p + dk
            ptr += 1
    except IndexError:
        # ran off the window: with the ≤ n·(k+1) consumption bound,
        # only a truncated/corrupt stream gets here
        raise ValueError("FLAC: bitstream truncated in unary") from None
    starts = np.array(terms, dtype=np.int64)
    q = starts.copy()
    q[1:] -= starts[:-1] + dk
    q[0] -= r.pos * 8 + r.bit
    if cur > len(bits):
        raise ValueError("FLAC: bitstream truncated in rice remainder")
    if k:
        idx = (starts[:, None] + 1) + np.arange(k)[None, :]
        rem = bits[idx].astype(np.int64) @ (
            1 << np.arange(k - 1, -1, -1, dtype=np.int64)
        )
        z = (q << k) | rem
    else:
        z = q
    r.pos, r.bit = cur >> 3, cur & 7
    return (z >> 1) ^ -(z & 1)


def _decode_residual(r: _BitReader, blocksize: int, order: int):
    """Residual block as ONE int64 ndarray (the callers either feed
    numpy directly — fixed-predictor integration — or `tolist()` once
    for the LPC recurrence; the old per-value `int()` generator over
    every rice value was a visible slice of the decode profile)."""
    import numpy as np

    method = r.read(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    n_part = 1 << porder
    if blocksize % n_part:
        raise ValueError("FLAC: partition does not divide block size")
    parts: list = []
    for p in range(n_part):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC: predictor order exceeds first partition")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            parts.append(np.array(
                [r.read_signed(raw) if raw else 0 for _ in range(n)],
                dtype=np.int64,
            ))
        elif n:
            parts.append(_rice_block_fast(r, n, param))
    if not parts:
        return np.empty(0, dtype=np.int64)
    return parts[0] if len(parts) == 1 else np.concatenate(parts)


def _read_fixed_width_block(r: _BitReader, n: int, width: int):
    """Vectorized read of `n` signed `width`-bit fields (the VERBATIM
    subframe body): one (n × width) bit gather instead of n per-bit
    reads. Returns an int64 ndarray."""
    import numpy as np

    bits, _ones = r._ensure_bits()
    cur = r.pos * 8 + r.bit
    end = cur + n * width
    if end > len(bits):
        raise ValueError("FLAC: bitstream truncated in verbatim block")
    w = (1 << np.arange(width - 1, -1, -1, dtype=np.int64))
    vals = bits[cur:end].reshape(n, width).astype(np.int64) @ w
    vals = np.where(vals >= (1 << (width - 1)), vals - (1 << width), vals)
    r.pos, r.bit = end >> 3, end & 7
    return vals


def _integrate_fixed(warmup: list[int], resid, order: int):
    """Inverse of the order-`order` fixed predictor, vectorized: the
    residual IS the order-th finite difference of the signal, so the
    signal is `order` cumulative sums, each seeded from the matching
    difference level of the warmup samples. Returns an int64 ndarray
    (warmup included)."""
    import numpy as np

    cur = np.asarray(resid, dtype=np.int64)
    levels = [np.asarray(warmup, dtype=np.int64)]
    for _ in range(order):
        levels.append(np.diff(levels[-1]))
    for j in range(order - 1, -1, -1):
        cur = levels[j][-1] + np.cumsum(cur)
    return np.concatenate([levels[0], cur])


#: compiled LPC restoration kernels keyed on (order, shift). The IIR
#: recurrence is inherently serial (each sample feeds the next
#: prediction through an exact integer >> shift), so the hot loop is
#: generated source with the lag window held in LOCAL variables
#: (s1..sN shift register) and the dot product unrolled — measured
#: ~1.5× over the list-indexing walk, exact integer arithmetic
#: unchanged.
_LPC_KERNELS: dict = {}


def _lpc_kernel(order: int, shift: int):
    f = _LPC_KERNELS.get((order, shift))
    if f is None:
        cvars = ", ".join(f"c{j}" for j in range(order))
        svars = [f"s{order - j}" for j in range(order)]  # oldest first
        init = ", ".join(svars) + " = " + ", ".join(
            f"w[{j}]" for j in range(order)
        )
        expr = " + ".join(f"c{j}*{svars[j]}" for j in range(order))
        rot_lhs = ", ".join(f"s{i}" for i in range(order, 0, -1))
        rot_rhs = (
            ", ".join(f"s{i}" for i in range(order - 1, 0, -1)) + ", v"
            if order > 1
            else "v"
        )
        src = (
            f"def _k(resid, w, {cvars}):\n"
            f"    {init}\n"
            f"    out = list(w)\n"
            f"    app = out.append\n"
            f"    for r in resid:\n"
            f"        v = r + (({expr}) >> {shift})\n"
            f"        app(v)\n"
            f"        {rot_lhs} = {rot_rhs}\n"
            f"    return out\n"
        )
        ns: dict = {}
        exec(src, ns)  # noqa: S102 — source assembled from ints only
        f = _LPC_KERNELS[(order, shift)] = ns["_k"]
    return f


def _decode_subframe(r: _BitReader, blocksize: int, bps: int):
    if r.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC: wasted bits exceed sample size")

    import numpy as np

    if stype == 0:  # CONSTANT
        v = r.read_signed(eff)
        samples = np.full(blocksize, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        samples = _read_fixed_width_block(r, blocksize, eff)
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        warmup = [r.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(r, blocksize, order)
        samples = _integrate_fixed(warmup, resid, order)
    elif stype >= 32:  # LPC, order 1-32
        order = stype - 31
        warmup = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4)
        if prec == 0xF:
            raise ValueError("FLAC: invalid LPC precision")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(r, blocksize, order)
        # serial integer IIR: run the compiled shift-register kernel
        # (exact Python-int arithmetic — c0 pairs with the OLDEST lag)
        out = _lpc_kernel(order, shift)(
            resid.tolist(), warmup, *coefs[::-1]
        )
        try:
            samples = np.array(out, dtype=np.int64)
        except OverflowError:
            # a corrupt stream can make the recurrence explode past
            # int64; keep exact Python ints (object dtype) so the
            # frame reaches its CRC check and fails THERE, exactly as
            # the pre-vectorized list pipeline did
            samples = np.array(out, dtype=object)
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    if wasted:
        samples = samples << wasted
    return samples


def decode_flac(payload: bytes) -> dict:
    """FLAC → the `decode_audio` contract: {"sample_rate",
    "n_channels", "n_samples", "waveform": float64 in [-1, 1],
    shape (n, ch)}. Raises ValueError on any corruption (bad magic,
    CRC mismatch, reserved codes, truncation)."""
    import numpy as np

    if payload[:4] != b"fLaC":
        raise ValueError("FLAC: bad magic")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC: truncated metadata")
        hdr = payload[pos]
        last, btype = hdr & 0x80, hdr & 0x7F
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if len(body) < length:
            raise ValueError("FLAC: truncated metadata block")
        if btype == 0:
            if length != 34:
                raise ValueError("FLAC: STREAMINFO must be 34 bytes")
            streaminfo = body
        pos += 4 + length
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC: missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)  # min framesize
    si.read(24)  # max framesize
    sr_si = si.read(20)
    ch_si = si.read(3) + 1
    bps_si = si.read(5) + 1
    total = si.read(36)

    channels_out: list[list] = [[] for _ in range(ch_si)]
    r = _BitReader(payload, pos)
    while r.pos < len(payload):
        frame_start = r.pos
        if r.read(14) != 0x3FFE:
            raise ValueError(f"FLAC: lost frame sync at {frame_start}")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 0:
            pass
        elif sr_code in _SR_TABLE:
            pass
        elif sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        else:
            raise ValueError("FLAC: invalid sample rate code")
        bps = {0: bps_si, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24}.get(ss_code)
        if bps is None:
            raise ValueError(f"FLAC: reserved sample size code {ss_code}")
        r.align()
        # CRC-8 covers the header bytes up to (excluding) the crc byte
        if _crc8(payload[frame_start : r.pos]) != r.read(8):
            raise ValueError("FLAC: frame header CRC-8 mismatch")

        if ch_code <= 7:
            n_ch = ch_code + 1
            if n_ch != ch_si:
                raise ValueError("FLAC: channel count mismatch")
            subs = [
                _decode_subframe(r, blocksize, bps) for _ in range(n_ch)
            ]
        elif ch_code in (8, 9, 10):
            if ch_si != 2:
                raise ValueError("FLAC: stereo decorrelation in non-stereo stream")
            bps_a = bps + (1 if ch_code == 9 else 0)
            bps_b = bps + (1 if ch_code in (8, 10) else 0)
            a = _decode_subframe(r, blocksize, bps_a)
            b = _decode_subframe(r, blocksize, bps_b)
            if ch_code == 8:  # left/side
                subs = [a, a - b]
            elif ch_code == 9:  # right/side
                subs = [a + b, b]
            else:  # mid/side
                m2 = (a << 1) | (b & 1)
                subs = [(m2 + b) >> 1, (m2 - b) >> 1]
        else:
            raise ValueError(f"FLAC: reserved channel assignment {ch_code}")
        r.align()
        body_end = r.pos
        if _crc16(payload[frame_start:body_end]) != r.read(16):
            raise ValueError("FLAC: frame CRC-16 mismatch")
        for c in range(ch_si):
            channels_out[c].append(subs[c])

    chans = [
        np.concatenate(c) if c else np.empty(0, dtype=np.int64)
        for c in channels_out
    ]
    n = min(len(chans[0]), total) if total else len(chans[0])
    arr = np.stack([c[:n] for c in chans], axis=1).astype(np.float64)
    wave = arr / float(1 << (bps_si - 1))
    return {
        "sample_rate": sr_si,
        "n_channels": ch_si,
        "n_samples": n,
        "waveform": wave,
    }


# ---------------------------------------------------------------------------
# encoder (fixtures / re-encode half)
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def write_bitarr(self, bits) -> None:
        """Append a 0/1 uint8 array of bits (MSB-first order), honoring
        the writer's current sub-byte position — the vectorized batch
        counterpart of per-bit `write` (numpy packbits does the byte
        assembly; the ≤7 leftover bits return to the scalar
        accumulator)."""
        import numpy as np

        if self.nbits:
            pre = np.empty(self.nbits, dtype=np.uint8)
            for i in range(self.nbits):
                pre[i] = (self.acc >> (self.nbits - 1 - i)) & 1
            bits = np.concatenate([pre, bits])
        rem = len(bits) & 7
        main = bits[: len(bits) - rem] if rem else bits
        self.buf += np.packbits(main).tobytes()
        acc = 0
        if rem:
            for b in bits[len(bits) - rem :]:
                acc = (acc << 1) | int(b)
        self.acc = acc
        self.nbits = rem

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    n_cont = 1
    while bits > 6 * n_cont + (6 - n_cont):
        n_cont += 1
    for i in range(n_cont):
        out.append(0x80 | ((n >> (6 * (n_cont - 1 - i))) & 0x3F))
    lead = (0xFF << (7 - n_cont)) & 0xFF | (n >> (6 * n_cont))
    return bytes([lead] + out)


def _zigzag(resid) -> "object":
    """int64 zigzag codes of a residual array: 2r for r ≥ 0,
    2|r| − 1 for r < 0 — identical to the scalar encoder's mapping."""
    import numpy as np

    r = np.asarray(resid, dtype=np.int64)
    return np.abs(r << 1) - (r < 0)


def _best_rice_param(resid) -> tuple[int, int]:
    """(k, total bits) of the smallest-size rice parameter (4-bit
    method, k ≤ 14) — vectorized: one (z >> k).sum() per candidate k,
    first minimum wins (ties keep the smallest k, as the scalar loop
    did)."""
    z = _zigzag(resid)
    n = len(z)
    best_k, best_bits = 0, None
    for k in range(15):
        bits = int((z >> k).sum()) + n * (1 + k)
        if best_bits is None or bits < best_bits:
            best_k, best_bits = k, bits
    return best_k, best_bits


def _write_residual(w: _BitWriter, resid) -> None:
    """Method 0 (4-bit rice), partition order 0 — the rice codes are
    assembled as one bit array (unary terminators scattered at their
    cumulative offsets, the k remainder bit-planes each placed with
    one vectorized store) and appended in a single packbits pass;
    bit-identical to the per-residual loop it replaces."""
    import numpy as np

    w.write(0, 2)
    w.write(0, 4)
    k, _bits = _best_rice_param(resid)
    w.write(k, 4)
    z = _zigzag(resid)
    q = z >> k
    lens = q + 1 + k
    total = int(lens.sum())
    off = np.zeros(len(z), dtype=np.int64)
    np.cumsum(lens[:-1], out=off[1:])
    bits = np.zeros(total, dtype=np.uint8)
    bits[off + q] = 1
    if k:
        base = off + q + 1
        for t in range(k):
            bits[base + t] |= ((z >> (k - 1 - t)) & 1).astype(np.uint8)
    w.write_bitarr(bits)


_LPC_ORDER = 8
_LPC_PRECISION = 12  # quantized coefficient bits


def _lpc_quantized(s: list[int], order: int):
    """(qcoefs, shift) via autocorrelation + Levinson-Durbin, coefs
    quantized to `_LPC_PRECISION`-bit signed at a power-of-two shift —
    the standard FLAC LPC path. Returns None when the block is too
    short or numerically degenerate (caller falls back to FIXED)."""
    import numpy as np

    if len(s) <= order * 2:
        return None
    x = np.asarray(s, dtype=np.float64)
    n = len(x)
    r = np.array(
        [np.dot(x[: n - lag], x[lag:]) for lag in range(order + 1)]
    )
    if r[0] == 0.0:
        return None
    # Levinson-Durbin recursion
    err = r[0]
    a = np.zeros(order)
    for i in range(order):
        acc = r[i + 1] - np.dot(a[:i], r[i:0:-1][:i])
        if err <= 0:
            return None
        k = acc / err
        a[: i + 1] = np.concatenate([a[:i] - k * a[:i][::-1], [k]])
        err *= 1.0 - k * k
    cmax = np.abs(a).max()
    if not np.isfinite(cmax) or cmax == 0.0:
        return None
    # shift: largest power of two keeping every coef in PRECISION bits
    shift = _LPC_PRECISION - 1 - max(0, int(np.floor(np.log2(cmax))) + 1)
    shift = max(1, min(15, shift))
    q = np.round(a * (1 << shift)).astype(np.int64)
    lim = 1 << (_LPC_PRECISION - 1)
    q = np.clip(q, -lim, lim - 1)
    if not q.any():
        return None
    return [int(v) for v in q], shift


def _encode_subframe(w: _BitWriter, s, bps: int) -> None:
    import numpy as np

    s = np.asarray(s, dtype=np.int64)
    if bool((s == s[0]).all()):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(int(s[0]), bps)
        return
    # candidates: fixed predictors 0-2 and one Levinson-Durbin LPC,
    # all judged by ACTUAL coded size (header + warmup + optimal-k
    # rice bits), against the verbatim floor. Residuals are array
    # slices (order-j shifted differences) — bit-identical to the
    # per-sample predictor loop this replaces.
    n = len(s)
    cands = []
    for order, coefs in list(_FIXED_COEFS.items())[:3]:
        if n <= order:
            continue
        resid = s[order:].copy()
        for j, c in enumerate(coefs):
            resid -= c * s[order - 1 - j : n - 1 - j]
        _k, rice_bits = _best_rice_param(resid)
        cands.append((order * bps + rice_bits, ("fixed", order, None), resid))
    lpc = _lpc_quantized(s, _LPC_ORDER)
    if lpc is not None:
        qc, shift = lpc
        o = len(qc)
        acc = np.zeros(n - o, dtype=np.int64)
        for j, c in enumerate(qc):
            acc += c * s[o - 1 - j : n - 1 - j]
        resid = s[o:] - (acc >> shift)
        _k, rice_bits = _best_rice_param(resid)
        hdr = o * bps + 4 + 5 + o * _LPC_PRECISION
        cands.append((hdr + rice_bits, ("lpc", o, (qc, shift)), resid))
    bits, (kind, order, extra), resid = min(
        cands, key=lambda c: (c[0], c[1][0], c[1][1])
    )
    if bits >= n * bps:
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        for v in s:
            w.write(int(v), bps)
        return
    w.write(0, 1)
    if kind == "fixed":
        w.write(8 + order, 6)  # FIXED
        w.write(0, 1)
        for v in s[:order]:
            w.write(int(v), bps)
    else:
        qc, shift = extra
        w.write(31 + order, 6)  # LPC, order-1 = order-1 … type 1xxxxx
        w.write(0, 1)
        for v in s[:order]:
            w.write(int(v), bps)
        w.write(_LPC_PRECISION - 1, 4)
        w.write(shift, 5)
        for c in qc:
            w.write(c, _LPC_PRECISION)
    _write_residual(w, resid)


def encode_flac(
    samples, sample_rate: int = 8000, block_size: int = 4096
) -> bytes:
    """Encode an (n,) or (n, ch) int16 array as a FLAC stream —
    deterministic subset encoder (fixed predictors 0-2, 4-bit rice,
    partition order 0, independent channels)."""
    import hashlib

    import numpy as np

    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if not n:
        raise ValueError("encode_flac: no samples")
    if not 0 < sample_rate < 65536:
        # the frame header carries the rate as a 16-bit Hz field
        # (code 13); a larger rate would silently truncate in the
        # bit writer and disagree with STREAMINFO's 20-bit field
        raise ValueError(
            f"encode_flac: sample_rate {sample_rate} outside the "
            f"16-bit Hz frame-header range [1, 65535]"
        )
    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()

    frames = bytearray()
    for fi, start in enumerate(range(0, n, block_size)):
        blk = s[start : start + block_size]
        bs = len(blk)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # 16-bit block size follows
        w.write(13, 4)  # 16-bit sample rate (Hz) follows
        w.write(ch - 1, 4)
        w.write(4, 3)  # 16 bps
        w.write(0, 1)
        for b in _utf8_number(fi):
            w.write(b, 8)
        w.write(bs - 1, 16)
        w.write(sample_rate, 16)
        # header is byte-aligned by construction (32 bits + whole
        # UTF-8 bytes + 2×16); CRC-8 covers every header byte so far
        w.write(_crc8(bytes(w.buf)), 8)
        for c in range(ch):
            _encode_subframe(w, blk[:, c].astype(np.int64), 16)
        w.align()
        body = bytes(w.buf)
        frames += body + struct.pack(">H", _crc16(body))

    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(15, 5)  # 16 bps
    si.write(n, 36)
    si.align()
    streaminfo = si.bytes() + md5
    return (
        b"fLaC"
        + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
        + bytes(frames)
    )
