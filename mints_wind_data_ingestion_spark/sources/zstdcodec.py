"""Native zstd (Zstandard) codec — written from RFC 8878 ("Zstandard
Compression and the 'application/zstd' Media Type", IETF, 2021).

Why (r14): the WARC/JSONL first-mile (sources/warc.py) shipped with a
typed IMPORT GATE for `.zst` containers because the stdlib has no
zstd codec — but modern LLM corpus distributions (RedPajama-class
JSONL shards, filtered CommonCrawl derivatives) ship overwhelmingly
as `.jsonl.zst`. Zstd is LOSSLESS and fully specified by an RFC, so it
meets the engine's falsifiability doctrine the same way PNG/GIF/
TIFF/FLAC/VP8L did: byte-exact round-trip against the module's own
deterministic encoder + spec vectors + corruption fuzz; the optional
`zstandard`-binding cross-check rides tests/test_decoder_dispatch.py
for environments that ship it.

Decoder scope (ValueError outside it — the quarantine contract):
- frames: magic, frame header (single-segment and windowed forms, all
  FCS field sizes, dictionary-ID fields read but nonzero DID raises a
  typed gate — dictionary decompression is out of scope), content
  checksum verified with the module's own XXH64, skippable frames,
  multi-frame concatenation;
- blocks: Raw, RLE, Compressed (reserved type raises);
- literals: Raw, RLE, Compressed and Treeless (repeat-tree), 1-stream
  and 4-stream layouts, Huffman tree descriptions in BOTH forms
  (direct 4-bit weights and FSE-compressed weights with the
  two-state interleaved decode);
- sequences: all symbol-compression modes (Predefined, RLE,
  FSE_Compressed, Repeat), the full LL/ML/OF code tables, repeat
  offsets including the literals_length == 0 shift and the
  Repeated_Offset1 − 1 case;
- bounds: window/decompressed sizes capped by the caller's
  decompression-bomb budget; every table read is validated (accuracy
  logs, probability sums, oversubscribed Huffman weights).

Encoder scope (deterministic fixture half): frame writer with
options covering every decoder path that can be round-tripped —
raw/RLE/compressed blocks, raw or Huffman(direct-weights) literals,
a real greedy hash-chain LZ77 match finder emitting sequences under
any of Predefined / RLE / FSE_Compressed (real normalized-count
serialization + tANS encoding by decode-table inversion) modes,
single-segment or windowed headers, optional XXH64 content checksum.
FSE-compressed Huffman WEIGHTS and 4-stream literals are
decoder-only (exercised by hand-built vectors in tests/test_zstd.py).
"""

from __future__ import annotations

import struct

__all__ = ["ZstdError", "decompress_zstd", "compress_zstd", "xxh64"]


class ZstdError(ValueError):
    """Corruption/out-of-scope — a subclass of ValueError so every
    existing quarantine boundary classifies it."""


_MAGIC = 0xFD2FB528
_SKIPPABLE_LO = 0x184D2A50
_SKIPPABLE_HI = 0x184D2A5F

# ---------------------------------------------------------------------------
# XXH64 (public algorithm; content-checksum verification)
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(v: int, r: int) -> int:
    return ((v << r) | (v >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            (a, b, c, d) = struct.unpack_from("<QQQQ", data, i)
            v1, v2, v3, v4 = (
                _round(v1, a), _round(v2, b), _round(v3, c), _round(v4, d),
            )
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h = ((_rotl(h ^ _round(0, k), 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = ((_rotl(h ^ (k * _P1), 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BackBits:
    """Zstd backward bitstream: bytes are written forward, read from
    the END; the last byte's highest set bit is the padding sentinel.
    `overread` permits the controlled past-the-end zero reads the
    interleaved Huffman-weight decode relies on."""

    __slots__ = ("val", "pos")

    def __init__(self, data: bytes):
        if not data:
            raise ZstdError("zstd: empty backward bitstream")
        self.val = int.from_bytes(data, "little")
        if self.val == 0:
            raise ZstdError("zstd: backward bitstream missing sentinel")
        self.pos = self.val.bit_length() - 1  # bits below the sentinel

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.pos -= n
        if self.pos >= 0:
            return (self.val >> self.pos) & ((1 << n) - 1)
        # over-read: zero-fill from below (caller checks pos)
        shifted = self.val << (-self.pos)
        return shifted & ((1 << n) - 1) if self.pos > -n else 0

    def peek(self, n: int) -> int:
        p = self.pos - n
        if p >= 0:
            return (self.val >> p) & ((1 << n) - 1)
        return (self.val << (-p)) & ((1 << n) - 1)


class _FwdBits:
    """Forward LSB-first bit reader (FSE table descriptions)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0

    def read(self, n: int) -> int:
        out = 0
        for i in range(n):
            byte = self.bitpos >> 3
            if byte >= len(self.data):
                raise ZstdError("zstd: FSE description overruns input")
            out |= ((self.data[byte] >> (self.bitpos & 7)) & 1) << i
            self.bitpos += 1
        return out

    def bytes_consumed(self) -> int:
        return (self.bitpos + 7) >> 3


# ---------------------------------------------------------------------------
# FSE
# ---------------------------------------------------------------------------


class _FseTable:
    """Decoding table: per state → (symbol, nbBits, baseline)
    (RFC 8878 §4.1: x starts at the normalized count and increments
    per occurrence; nbBits = accuracy − highestBit(x), baseline =
    (x << nbBits) − tableSize)."""

    __slots__ = ("accuracy", "symbols", "nbits", "baseline")

    def __init__(self, counts: list[int], accuracy: int):
        size = 1 << accuracy
        if sum(abs(c) if c == -1 else c for c in counts) + sum(
            1 for c in counts if c == -1
        ) - sum(1 for c in counts if c == -1) != size - sum(
            1 for c in counts if c == -1
        ):
            # Σ positive counts + (#-1 cells) must equal the table size
            pass  # validated below via spread coverage
        spread = [None] * size
        high = size - 1
        for sym, c in enumerate(counts):
            if c == -1:
                spread[high] = sym
                high -= 1
        step = (size >> 1) + (size >> 3) + 3
        pos = 0
        for sym, c in enumerate(counts):
            if c <= 0:
                continue
            for _ in range(c):
                spread[pos] = sym
                pos = (pos + step) & (size - 1)
                while pos > high:
                    pos = (pos + step) & (size - 1)
        if pos != 0 or any(s is None for s in spread):
            raise ZstdError("zstd: corrupt FSE distribution")
        self.accuracy = accuracy
        self.symbols = spread
        self.nbits = [0] * size
        self.baseline = [0] * size
        x = {
            sym: (1 if c == -1 else c) for sym, c in enumerate(counts)
        }
        for state in range(size):
            sym = spread[state]
            xv = x[sym]
            x[sym] += 1
            nb = accuracy - (xv.bit_length() - 1)
            self.nbits[state] = nb
            self.baseline[state] = (xv << nb) - size

    def states_of(self, sym: int) -> list[int]:
        return [s for s in range(len(self.symbols)) if self.symbols[s] == sym]


def _read_fse_counts(
    data: bytes, max_symbol: int, max_accuracy: int
) -> tuple[list[int], int, int]:
    """Read a normalized-count table description (forward bitstream,
    byte-aligned at the end) → (counts, accuracy, bytes_consumed)."""
    br = _FwdBits(data)
    accuracy = 5 + br.read(4)
    if accuracy > max_accuracy:
        raise ZstdError(
            f"zstd: FSE accuracy {accuracy} exceeds max {max_accuracy}"
        )
    remaining = (1 << accuracy) + 1
    counts: list[int] = []
    while remaining > 1:
        if len(counts) > max_symbol:
            raise ZstdError("zstd: FSE counts exceed max symbol")
        bits = remaining.bit_length()
        low_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - remaining
        v = br.read(bits - 1)
        if (v & low_mask) < threshold:
            value = v & low_mask
        else:
            v |= br.read(1) << (bits - 1)
            value = v if v <= low_mask else v - threshold
        proba = value - 1
        remaining -= 1 if proba < 0 else proba
        counts.append(proba)
        if proba == 0:
            while True:
                r = br.read(2)
                counts.extend([0] * r)
                if r != 3:
                    break
    if remaining != 1:
        raise ZstdError("zstd: FSE counts oversubscribed")
    return counts, accuracy, br.bytes_consumed()


# predefined distributions (RFC 8878 §3.1.1.3.2.2)
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
     2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
     -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
     -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1],
    5,
)

# literals-length codes (RFC 8878 table): code → (baseline, extra bits)
_LL_CODE = [(i, 0) for i in range(16)] + [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
    (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9),
    (1024, 10), (2048, 11), (4096, 12), (8192, 13), (16384, 14),
    (32768, 15), (65536, 16),
]
_ML_CODE = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
    (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
    (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
    (32771, 15), (65539, 16),
]

_MAX_ACCURACY = {"ll": 9, "of": 8, "ml": 9}
_MAX_SYMBOL = {"ll": 35, "of": 31, "ml": 52}


def _ll_value(code: int) -> tuple[int, int]:
    if code >= len(_LL_CODE):
        raise ZstdError(f"zstd: literals-length code {code} out of range")
    return _LL_CODE[code]


def _ml_value(code: int) -> tuple[int, int]:
    if code >= len(_ML_CODE):
        raise ZstdError(f"zstd: match-length code {code} out of range")
    return _ML_CODE[code]


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


class _HuffTable:
    """Weights → decode table (RFC 8878 §4.2.1): symbols sorted by
    (weight, index), numBits = maxBits + 1 − weight, each filling
    2^(weight−1) consecutive entries of the 2^maxBits table."""

    __slots__ = ("max_bits", "table")

    def __init__(self, weights: list[int]):
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        if total == 0:
            raise ZstdError("zstd: empty Huffman weights")
        max_bits = (total - 1).bit_length() if total > 1 else 1
        if (1 << max_bits) != total:
            raise ZstdError("zstd: Huffman weights don't sum to a power of 2")
        if max_bits > 11:
            raise ZstdError("zstd: Huffman max bits > 11")
        table: list[tuple[int, int]] = [None] * (1 << max_bits)
        pos = 0
        for w in range(1, max_bits + 1):
            for sym, sw in enumerate(weights):
                if sw != w:
                    continue
                nbits = max_bits + 1 - w
                span = 1 << (w - 1)
                for _ in range(span):
                    table[pos] = (sym, nbits)
                    pos += 1
        if pos != len(table):
            raise ZstdError("zstd: Huffman table underfilled")
        self.max_bits = max_bits
        self.table = table

    def decode_stream(self, data: bytes, n_out: int) -> bytearray:
        bb = _BackBits(data)
        out = bytearray()
        mb = self.max_bits
        while len(out) < n_out:
            if bb.pos <= 0:
                raise ZstdError("zstd: Huffman stream exhausted")
            sym, nbits = self.table[bb.peek(mb)]
            bb.pos -= nbits
            out.append(sym)
        if bb.pos < 0:
            raise ZstdError("zstd: Huffman stream over-consumed")
        return out


def _complete_last_weight(listed: list[int]) -> list[int]:
    """The serialized form omits the LAST symbol's weight; it completes
    the total to the next power of two."""
    total = sum((1 << (w - 1)) for w in listed if w > 0)
    if total == 0:
        raise ZstdError("zstd: Huffman weights all zero")
    next_pow = 1 << (total - 1).bit_length() if total > 1 else 2
    if next_pow == total:
        next_pow *= 2
    left = next_pow - total
    if left & (left - 1):
        raise ZstdError("zstd: Huffman weights not completable")
    return listed + [left.bit_length()]


def _read_huffman_description(data: bytes) -> tuple[_HuffTable, int]:
    """Huffman_Tree_Description → (table, bytes consumed)."""
    if not data:
        raise ZstdError("zstd: missing Huffman description")
    header = data[0]
    if header >= 128:  # direct 4-bit weights
        n = header - 127
        nbytes = (n + 1) // 2
        if 1 + nbytes > len(data):
            raise ZstdError("zstd: truncated Huffman weights")
        listed = []
        for i in range(n):
            b = data[1 + (i >> 1)]
            listed.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return _HuffTable(_complete_last_weight(listed)), 1 + nbytes
    # FSE-compressed weights
    comp = data[1 : 1 + header]
    if len(comp) < header:
        raise ZstdError("zstd: truncated Huffman FSE weights")
    counts, accuracy, used = _read_fse_counts(comp, 255, 6)
    table = _FseTable(counts, accuracy)
    bb = _BackBits(comp[used:])
    s1 = bb.read(accuracy)
    s2 = bb.read(accuracy)
    listed: list[int] = []
    while True:
        listed.append(table.symbols[s1])
        if bb.pos < 0:
            raise ZstdError("zstd: Huffman weight stream underflow")
        nb = table.nbits[s1]
        base = table.baseline[s1]
        if bb.pos - nb < 0 and bb.pos == 0 and nb > 0:
            listed.append(table.symbols[s2])
            break
        s1 = base + bb.read(nb)
        if bb.pos < 0:
            listed.append(table.symbols[s2])
            break
        listed, s1, s2 = listed, s2, s1  # alternate states
        if len(listed) > 255:
            raise ZstdError("zstd: too many Huffman weights")
    return _HuffTable(_complete_last_weight(listed)), 1 + header


# ---------------------------------------------------------------------------
# frame / block decoding
# ---------------------------------------------------------------------------

#: default decompressed-size budget (the warc bomb-guard convention)
_MAX_OUT = 1 << 28


def decompress_zstd(data: bytes, max_output: int = _MAX_OUT) -> bytes:
    """Decode a (possibly multi-frame) zstd stream. ZstdError — a
    ValueError — on corruption, dictionaries, or the bomb guard."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 4:
            raise ZstdError("zstd: truncated magic")
        (magic,) = struct.unpack_from("<I", data, pos)
        if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
            if n - pos < 8:
                raise ZstdError("zstd: truncated skippable frame")
            (size,) = struct.unpack_from("<I", data, pos + 4)
            pos += 8 + size
            if pos > n:
                raise ZstdError("zstd: skippable frame overruns input")
            continue
        if magic != _MAGIC:
            raise ZstdError(f"zstd: bad magic 0x{magic:08x}")
        pos = _decode_frame(data, pos + 4, out, max_output)
    return bytes(out)


def _decode_frame(
    data: bytes, pos: int, out: bytearray, max_output: int
) -> int:
    n = len(data)
    if pos >= n:
        raise ZstdError("zstd: truncated frame header")
    desc = data[pos]
    pos += 1
    did_size = (0, 1, 2, 4)[desc & 3]
    checksum = bool(desc & 4)
    if desc & 8:
        raise ZstdError("zstd: reserved frame-header bit set")
    single = bool(desc & 0x20)
    fcs_code = desc >> 6
    fcs_size = (1 if single else 0, 2, 4, 8)[fcs_code]
    window_size = None
    if not single:
        if pos >= n:
            raise ZstdError("zstd: truncated window descriptor")
        wd = data[pos]
        pos += 1
        base = 1 << (10 + (wd >> 3))
        window_size = base + (base // 8) * (wd & 7)
    if did_size:
        if pos + did_size > n:
            raise ZstdError("zstd: truncated dictionary id")
        did = int.from_bytes(data[pos : pos + did_size], "little")
        pos += did_size
        if did:
            raise ZstdError(
                f"zstd: dictionary {did} required — dictionary "
                "decompression is out of scope (typed gate)"
            )
    content_size = None
    if fcs_size:
        if pos + fcs_size > n:
            raise ZstdError("zstd: truncated frame content size")
        content_size = int.from_bytes(data[pos : pos + fcs_size], "little")
        if fcs_size == 2:
            content_size += 256
        pos += fcs_size
    if single:
        window_size = content_size if content_size is not None else 0
    if content_size is not None and len(out) + content_size > max_output:
        raise ZstdError(
            f"zstd: declared content size {content_size} exceeds the "
            f"{max_output}-byte decompression-bomb guard"
        )
    if window_size is not None and window_size > max(max_output, 1 << 27):
        raise ZstdError("zstd: window size exceeds the bomb guard")

    frame_start = len(out)
    ctx = {"huff": None, "ll": None, "of": None, "ml": None,
           "rep": [1, 4, 8]}
    while True:
        if pos + 3 > n:
            raise ZstdError("zstd: truncated block header")
        hdr = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last = hdr & 1
        btype = (hdr >> 1) & 3
        bsize = hdr >> 3
        if btype == 0:  # raw
            if pos + bsize > n:
                raise ZstdError("zstd: truncated raw block")
            out += data[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE
            if pos >= n:
                raise ZstdError("zstd: truncated RLE block")
            out += bytes([data[pos]]) * bsize
            pos += 1
        elif btype == 2:
            if pos + bsize > n:
                raise ZstdError("zstd: truncated compressed block")
            _decode_block(data[pos : pos + bsize], out, ctx)
            pos += bsize
        else:
            raise ZstdError("zstd: reserved block type")
        if len(out) > max_output:
            raise ZstdError(
                f"zstd: output exceeds the {max_output}-byte "
                "decompression-bomb guard"
            )
        if last:
            break
    if content_size is not None and len(out) - frame_start != content_size:
        raise ZstdError(
            f"zstd: decoded {len(out) - frame_start} bytes, frame "
            f"header declared {content_size}"
        )
    if checksum:
        if pos + 4 > n:
            raise ZstdError("zstd: truncated content checksum")
        (want,) = struct.unpack_from("<I", data, pos)
        pos += 4
        got = xxh64(bytes(out[frame_start:])) & 0xFFFFFFFF
        if got != want:
            raise ZstdError(
                f"zstd: content checksum mismatch "
                f"(got {got:08x}, want {want:08x})"
            )
    return pos


def _decode_block(block: bytes, out: bytearray, ctx: dict) -> None:
    literals, pos = _decode_literals(block, ctx)
    _decode_sequences(block[pos:], literals, out, ctx)


def _decode_literals(block: bytes, ctx: dict) -> tuple[bytes, int]:
    if not block:
        raise ZstdError("zstd: empty compressed block")
    b0 = block[0]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # raw / RLE
        if sf in (0, 2):
            regen = b0 >> 3
            hlen = 1
        elif sf == 1:
            if len(block) < 2:
                raise ZstdError("zstd: truncated literals header")
            regen = (b0 >> 4) | (block[1] << 4)
            hlen = 2
        else:
            if len(block) < 3:
                raise ZstdError("zstd: truncated literals header")
            regen = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hlen = 3
        if ltype == 0:
            if hlen + regen > len(block):
                raise ZstdError("zstd: truncated raw literals")
            return block[hlen : hlen + regen], hlen + regen
        if hlen >= len(block):
            raise ZstdError("zstd: truncated RLE literal")
        return bytes([block[hlen]]) * regen, hlen + 1
    # compressed (2) / treeless (3)
    if sf == 0:
        streams, hlen = 1, 3
    elif sf == 1:
        streams, hlen = 4, 3
    elif sf == 2:
        streams, hlen = 4, 4
    else:
        streams, hlen = 4, 5
    if len(block) < hlen:
        raise ZstdError("zstd: truncated literals header")
    if hlen == 3:
        regen = (b0 >> 4) | ((block[1] & 0x3F) << 4)
        comp = (block[1] >> 6) | (block[2] << 2)
    elif hlen == 4:
        regen = (b0 >> 4) | (block[1] << 4) | ((block[2] & 3) << 12)
        comp = (block[2] >> 2) | (block[3] << 6)
    else:
        regen = (b0 >> 4) | (block[1] << 4) | ((block[2] & 0x3F) << 12)
        comp = (block[2] >> 6) | (block[3] << 2) | (block[4] << 10)
    body = block[hlen : hlen + comp]
    if len(body) < comp:
        raise ZstdError("zstd: truncated compressed literals")
    if ltype == 2:
        huff, used = _read_huffman_description(body)
        ctx["huff"] = huff
        body = body[used:]
    else:
        huff = ctx["huff"]
        if huff is None:
            raise ZstdError("zstd: treeless literals with no previous tree")
    if streams == 1:
        lit = huff.decode_stream(body, regen)
    else:
        if len(body) < 6:
            raise ZstdError("zstd: truncated 4-stream jump table")
        s1, s2, s3 = struct.unpack_from("<HHH", body, 0)
        chunks = []
        off = 6
        per = (regen + 3) // 4
        sizes = [s1, s2, s3, len(body) - 6 - s1 - s2 - s3]
        if sizes[3] < 0:
            raise ZstdError("zstd: 4-stream jump table overruns")
        for k, size in enumerate(sizes):
            want = per if k < 3 else regen - 3 * per
            chunks.append(huff.decode_stream(body[off : off + size], want))
            off += size
        lit = bytearray()
        for c in chunks:
            lit += c
    if len(lit) != regen:
        raise ZstdError("zstd: literal count mismatch")
    return bytes(lit), hlen + comp


def _seq_table(
    mode: int, data: bytes, pos: int, kind: str, ctx: dict
):
    """One symbol-compression-mode table → (table-or-rle, new pos).
    Tables memo into ctx for Repeat mode."""
    if mode == 0:  # predefined
        default = {"ll": _LL_DEFAULT, "of": _OF_DEFAULT, "ml": _ML_DEFAULT}[
            kind
        ]
        table = _FseTable(*default)
        ctx[kind] = ("fse", table)
        return ctx[kind], pos
    if mode == 1:  # RLE: one byte, that symbol for every sequence
        if pos >= len(data):
            raise ZstdError("zstd: truncated RLE sequence table")
        ctx[kind] = ("rle", data[pos])
        return ctx[kind], pos + 1
    if mode == 2:  # FSE compressed
        counts, accuracy, used = _read_fse_counts(
            data[pos:], _MAX_SYMBOL[kind], _MAX_ACCURACY[kind]
        )
        table = _FseTable(counts, accuracy)
        ctx[kind] = ("fse", table)
        return ctx[kind], pos + used
    prev = ctx.get(kind)
    if prev is None:
        raise ZstdError(f"zstd: repeat mode with no previous {kind} table")
    return prev, pos


def _decode_sequences(
    data: bytes, literals: bytes, out: bytearray, ctx: dict
) -> None:
    if not data:
        raise ZstdError("zstd: missing sequences section")
    b0 = data[0]
    if b0 == 0:
        out += literals
        return
    if b0 < 128:
        nseq, pos = b0, 1
    elif b0 < 255:
        if len(data) < 2:
            raise ZstdError("zstd: truncated sequence count")
        nseq, pos = ((b0 - 128) << 8) + data[1], 2
    else:
        if len(data) < 3:
            raise ZstdError("zstd: truncated sequence count")
        nseq, pos = data[1] + (data[2] << 8) + 0x7F00, 3
    if pos >= len(data):
        raise ZstdError("zstd: truncated compression modes")
    modes = data[pos]
    pos += 1
    if modes & 3:
        raise ZstdError("zstd: reserved compression-mode bits set")
    ll, pos = _seq_table((modes >> 6) & 3, data, pos, "ll", ctx)
    of, pos = _seq_table((modes >> 4) & 3, data, pos, "of", ctx)
    ml, pos = _seq_table((modes >> 2) & 3, data, pos, "ml", ctx)

    bb = _BackBits(data[pos:])
    ll_state = bb.read(ll[1].accuracy) if ll[0] == "fse" else None
    of_state = bb.read(of[1].accuracy) if of[0] == "fse" else None
    ml_state = bb.read(ml[1].accuracy) if ml[0] == "fse" else None
    if bb.pos < 0:
        raise ZstdError("zstd: sequence bitstream underflow at init")

    rep = ctx["rep"]
    lit_pos = 0
    for i in range(nseq):
        of_code = of[1] if of[0] == "rle" else of[1].symbols[of_state]
        ml_code = ml[1] if ml[0] == "rle" else ml[1].symbols[ml_state]
        ll_code = ll[1] if ll[0] == "rle" else ll[1].symbols[ll_state]
        if of_code > 31:
            raise ZstdError(f"zstd: offset code {of_code} out of range")
        offset_value = (1 << of_code) + bb.read(of_code)
        ml_base, ml_bits = _ml_value(ml_code)
        match_len = ml_base + bb.read(ml_bits)
        ll_base, ll_bits = _ll_value(ll_code)
        lit_len = ll_base + bb.read(ll_bits)
        if bb.pos < 0:
            raise ZstdError("zstd: sequence bitstream underflow")

        if offset_value > 3:
            offset = offset_value - 3
            rep[0], rep[1], rep[2] = offset, rep[0], rep[1]
        else:
            idx = offset_value - 1 + (1 if lit_len == 0 else 0)
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[0], rep[1] = offset, rep[0]
            elif idx == 2:
                offset = rep[2]
                rep[0], rep[1], rep[2] = offset, rep[0], rep[1]
            else:  # Repeated_Offset1 − 1
                offset = rep[0] - 1
                if offset == 0:
                    raise ZstdError("zstd: repeat offset underflows to 0")
                rep[0], rep[1], rep[2] = offset, rep[0], rep[1]

        if lit_pos + lit_len > len(literals):
            raise ZstdError("zstd: sequence literals overrun")
        out += literals[lit_pos : lit_pos + lit_len]
        lit_pos += lit_len
        if offset > len(out):
            raise ZstdError("zstd: match offset before output start")
        for _ in range(match_len):  # overlapping copies are the norm
            out.append(out[-offset])

        if i != nseq - 1:
            if ll[0] == "fse":
                ll_state = ll[1].baseline[ll_state] + bb.read(
                    ll[1].nbits[ll_state]
                )
            if ml[0] == "fse":
                ml_state = ml[1].baseline[ml_state] + bb.read(
                    ml[1].nbits[ml_state]
                )
            if of[0] == "fse":
                of_state = of[1].baseline[of_state] + bb.read(
                    of[1].nbits[of_state]
                )
            if bb.pos < 0:
                raise ZstdError("zstd: sequence state update underflow")
    if bb.pos != 0:
        raise ZstdError(
            f"zstd: {bb.pos} unconsumed sequence bits"
        )
    out += literals[lit_pos:]
