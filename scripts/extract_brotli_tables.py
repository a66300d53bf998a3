"""One-time extraction of RFC 7932's appendix data into
sources/brotlidata.py.

The brotli format (RFC 7932) ships three fixed data tables in its
appendices: the 122,784-byte static dictionary (Appendix A), the 121
word transforms (Appendix B), and the context-mode lookup tables
(section 7.1). They are normative spec DATA — not code — and this
script materializes them from the public reference library
(libbrotlicommon, BSD/MIT-licensed, installed in the local conda env)
via its public C API, then VALIDATES every block against the spec's
own closed-form structure before writing:

- the LSB6/MSB6/SIGNED context tables must equal their RFC formulas
  exactly (proves the symbol offset/endianness before the UTF8 block
  is trusted);
- the per-length dictionary word counts must match the RFC's
  size_bits_by_length (1 << bits words of each length 4..24, offsets
  strictly increasing, total = 122,784);
- the transform engine in sources/brotlicodec.py is later
  cross-checked word-by-word against BrotliTransformDictionaryWord in
  tests/test_brotli.py.

Run: python scripts/extract_brotli_tables.py [libpath]
"""

from __future__ import annotations

import base64
import ctypes
import hashlib
import sys

LIB = sys.argv[1] if len(sys.argv) > 1 else (
    "/root/miniconda/lib/libbrotlicommon.so.1"
)


class BrotliDictionary(ctypes.Structure):
    _fields_ = [
        ("size_bits_by_length", ctypes.c_uint8 * 32),
        ("offsets_by_length", ctypes.c_uint32 * 32),
        ("data_size", ctypes.c_size_t),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
    ]


class BrotliTransforms(ctypes.Structure):
    _fields_ = [
        ("prefix_suffix_size", ctypes.c_uint16),
        ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
        ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
        ("num_transforms", ctypes.c_uint32),
        ("transforms", ctypes.POINTER(ctypes.c_uint8)),
        ("params", ctypes.POINTER(ctypes.c_uint8)),
        ("cutOffTransforms", ctypes.c_int16 * 10),
    ]


def main() -> None:
    lib = ctypes.CDLL(LIB)
    lib.BrotliGetDictionary.restype = ctypes.POINTER(BrotliDictionary)
    lib.BrotliGetTransforms.restype = ctypes.POINTER(BrotliTransforms)

    d = lib.BrotliGetDictionary().contents
    assert d.data_size == 122784, d.data_size
    data = bytes(ctypes.cast(
        d.data, ctypes.POINTER(ctypes.c_uint8 * d.data_size)
    ).contents)
    size_bits = list(d.size_bits_by_length)
    offsets = list(d.offsets_by_length)
    # RFC structural validation: words of length i live at
    # offsets[i]..offsets[i]+ (1<<bits)*i; lengths 4..24 populated
    for i in range(4, 25):
        assert size_bits[i] > 0
        assert offsets[i + 1] - offsets[i] == (1 << size_bits[i]) * i, i
    assert offsets[25] == 122784
    for i in list(range(0, 4)) + list(range(25, 32)):
        assert size_bits[i] == 0

    t = lib.BrotliGetTransforms().contents
    assert t.num_transforms == 121, t.num_transforms
    ps = bytes(ctypes.cast(
        t.prefix_suffix,
        ctypes.POINTER(ctypes.c_uint8 * t.prefix_suffix_size),
    ).contents)
    n_map = max(
        bytes(ctypes.cast(
            t.transforms, ctypes.POINTER(ctypes.c_uint8 * (121 * 3))
        ).contents)
    ) + 1
    pmap = list(ctypes.cast(
        t.prefix_suffix_map, ctypes.POINTER(ctypes.c_uint16 * n_map)
    ).contents)
    trip = bytes(ctypes.cast(
        t.transforms, ctypes.POINTER(ctypes.c_uint8 * (121 * 3))
    ).contents)
    # resolve (prefix bytes, type, suffix bytes) per transform: the
    # prefix_suffix blob is LENGTH-PREFIXED strings addressed via the
    # map (map[idx] points at the length byte)
    def _str(idx: int) -> bytes:
        off = pmap[idx]
        return ps[off + 1 : off + 1 + ps[off]]

    transforms = []
    for i in range(121):
        p_i, typ, s_i = trip[3 * i], trip[3 * i + 1], trip[3 * i + 2]
        assert typ <= 20, typ
        transforms.append((_str(p_i), typ, _str(s_i)))
    # RFC sanity: transform 0 is ("", Identity, "")
    assert transforms[0] == (b"", 0, b"")

    ctx = bytes(ctypes.c_uint8.__mul__(2048).in_dll(
        lib, "_kBrotliContextLookupTable"
    ))
    lsb6, msb6 = ctx[0:512], ctx[512:1024]
    utf8, signed = ctx[1024:1536], ctx[1536:2048]
    assert lsb6 == bytes(i & 63 for i in range(256)) + bytes(256)
    assert msb6 == bytes(i >> 2 for i in range(256)) + bytes(256)

    def _sig(b: int) -> int:
        if b == 0:
            return 0
        if b <= 15:
            return 1
        if b <= 63:
            return 2
        if b <= 127:
            return 3
        if b <= 191:
            return 4
        if b <= 239:
            return 5
        if b <= 254:
            return 6
        return 7

    assert signed == bytes(_sig(i) << 3 for i in range(256)) + bytes(
        _sig(i) for i in range(256)
    )

    sha = hashlib.sha256(data).hexdigest()
    b64 = base64.b64encode(data).decode()
    chunks = [b64[i : i + 76] for i in range(0, len(b64), 76)]
    with open(
        "mints_wind_data_ingestion_spark/sources/brotlidata.py", "w"
    ) as f:
        f.write('"""RFC 7932 (brotli) normative appendix data.\n\n')
        f.write(
            "Static dictionary (Appendix A, 122,784 bytes), word\n"
            "transforms (Appendix B, 121 entries), and the UTF8\n"
            "context-mode lookup tables (section 7.1). Materialized\n"
            "by scripts/extract_brotli_tables.py from the public\n"
            "reference library's C API (BrotliGetDictionary /\n"
            "BrotliGetTransforms / _kBrotliContextLookupTable) with\n"
            "structural validation against the spec's closed forms;\n"
            "the LSB6/MSB6/SIGNED tables are NOT stored - they are\n"
            "pure formulas, computed in brotlicodec and asserted\n"
            "against the library at extraction time.\n"
            '"""\n\n'
        )
        f.write("import base64 as _b64\n\n")
        f.write(f"DICT_SHA256 = {sha!r}\n\n")
        f.write(f"SIZE_BITS_BY_LENGTH = {size_bits!r}\n\n")
        f.write(f"OFFSETS_BY_LENGTH = {offsets!r}\n\n")
        f.write(f"TRANSFORMS = {transforms!r}\n\n")
        f.write(f"UTF8_LUT_P1 = {list(utf8[:256])!r}\n\n")
        f.write(f"UTF8_LUT_P2 = {list(utf8[256:])!r}\n\n")
        f.write('_DICT_B64 = (\n')
        for c in chunks:
            f.write(f'    "{c}"\n')
        f.write(")\n\n")
        f.write("DICTIONARY = _b64.b64decode(_DICT_B64)\n")
        f.write('assert len(DICTIONARY) == 122784, "corrupt embed"\n')
    print("wrote brotlidata.py; dict sha256", sha)


if __name__ == "__main__":
    main()
