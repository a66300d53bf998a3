"""Round-14 optimization pins: vectorized kernels must stay
bit-identical to the scalar reference implementations they replaced
(the encoder bytes feed driver-hashed corpora — a one-bit drift would
flip suite hashes downstream)."""

from __future__ import annotations

import numpy as np
import pytest

# ---------------------------------------------------------------------------
# FLAC encoder: numpy rice search / residuals / packbits rice writer
# vs the original per-sample scalar encoder (r13 code, inlined here as
# the reference)
# ---------------------------------------------------------------------------


def _ref_best_rice_param(resid):
    best = (0, None)
    for k in range(15):
        bits = sum(((abs(2 * r) - (r < 0)) >> k) + 1 + k for r in resid)
        if best[1] is None or bits < best[1]:
            best = (k, bits)
    return best


def _ref_write_residual(w, resid):
    w.write(0, 2)
    w.write(0, 4)
    k, _bits = _ref_best_rice_param(resid)
    w.write(k, 4)
    for rv in resid:
        z = (rv << 1) if rv >= 0 else ((-rv) << 1) - 1
        q = z >> k
        for _ in range(q):
            w.write(0, 1)
        w.write(1, 1)
        w.write(z, k)


def _ref_encode_subframe(w, s, bps):
    from mints_wind_data_ingestion_spark.sources.flaccodec import (
        _FIXED_COEFS,
        _LPC_ORDER,
        _LPC_PRECISION,
        _lpc_quantized,
    )

    s = [int(v) for v in s]
    if all(v == s[0] for v in s):
        w.write(0, 1)
        w.write(0, 6)
        w.write(0, 1)
        w.write(s[0], bps)
        return
    cands = []
    for order, coefs in list(_FIXED_COEFS.items())[:3]:
        if len(s) <= order:
            continue
        resid = [
            s[i] - sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, len(s))
        ]
        _k, rice_bits = _ref_best_rice_param(resid)
        cands.append((order * bps + rice_bits, ("fixed", order, None), resid))
    lpc = _lpc_quantized(s, _LPC_ORDER)
    if lpc is not None:
        qc, shift = lpc
        o = len(qc)
        resid = [
            s[i] - (sum(c * s[i - 1 - j] for j, c in enumerate(qc)) >> shift)
            for i in range(o, len(s))
        ]
        _k, rice_bits = _ref_best_rice_param(resid)
        hdr = o * bps + 4 + 5 + o * _LPC_PRECISION
        cands.append((hdr + rice_bits, ("lpc", o, (qc, shift)), resid))
    bits, (kind, order, extra), resid = min(
        cands, key=lambda c: (c[0], c[1][0], c[1][1])
    )
    if bits >= len(s) * bps:
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in s:
            w.write(v, bps)
        return
    w.write(0, 1)
    if kind == "fixed":
        w.write(8 + order, 6)
        w.write(0, 1)
        for v in s[:order]:
            w.write(v, bps)
    else:
        qc, shift = extra
        w.write(31 + order, 6)
        w.write(0, 1)
        for v in s[:order]:
            w.write(v, bps)
        w.write(_LPC_PRECISION - 1, 4)
        w.write(shift, 5)
        for c in qc:
            w.write(c, _LPC_PRECISION)
    _ref_write_residual(w, resid)


def _cases():
    from mints_wind_data_ingestion_spark.plans.extensions import (
        synth_audio_segments,
    )

    rng = np.random.default_rng(20260817)
    yield "synth5", synth_audio_segments(5, 0)
    yield "synth45", synth_audio_segments(45, 0)
    yield "synth2485", synth_audio_segments(2485, 1)
    yield "noise", rng.integers(-32768, 32767, size=5000, dtype=np.int16)
    yield "quiet", rng.integers(-40, 40, size=9001, dtype=np.int16)
    yield "stereo", rng.integers(-32768, 32767, size=(4097, 2), dtype=np.int16)
    yield "const", np.full(300, -7, dtype=np.int16)
    yield "ramp", np.arange(-4000, 4000, dtype=np.int16)
    yield "tiny", np.array([1, -1, 3], dtype=np.int16)
    t = np.arange(8000)
    yield "tone", (3000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)


@pytest.mark.parametrize("name,samples", list(_cases()))
def test_flac_subframes_bit_identical_to_scalar_reference(name, samples):
    from mints_wind_data_ingestion_spark.sources.flaccodec import (
        _BitWriter,
        _encode_subframe,
    )

    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    for c in range(s.shape[1]):
        for blk in (s[:4096, c], s[4096:8192, c]):
            if not len(blk):
                continue
            wv, wr = _BitWriter(), _BitWriter()
            _encode_subframe(wv, blk.astype(np.int64), 16)
            _ref_encode_subframe(wr, list(blk), 16)
            wv.align()
            wr.align()
            assert wv.bytes() == wr.bytes(), name


@pytest.mark.parametrize("name,samples", list(_cases()))
def test_flac_stream_roundtrips_and_decodes(name, samples):
    from mints_wind_data_ingestion_spark.sources.flaccodec import (
        decode_flac,
        encode_flac,
    )

    s = np.asarray(samples, dtype=np.int16)
    out = decode_flac(encode_flac(s))
    n = s.shape[0] if s.ndim else len(s)
    assert out["n_samples"] == n
    dec = np.round(out["waveform"] * 32768.0).astype(np.int64)
    ref = (s if s.ndim == 2 else s[:, None]).astype(np.int64)
    assert np.array_equal(dec, ref), name


def test_rice_writer_matches_scalar_on_edge_values():
    from mints_wind_data_ingestion_spark.sources.flaccodec import (
        _BitWriter,
        _write_residual,
    )

    cases = [
        [0],
        [0, 0, 0],
        [-1, 1, -2, 2],
        [40000, -40000, 1, 0],
        list(range(-100, 100, 7)),
    ]
    for resid in cases:
        wv, wr = _BitWriter(), _BitWriter()
        wv.write(5, 3)  # unaligned start exercises write_bitarr carry
        wr.write(5, 3)
        _write_residual(wv, np.asarray(resid, dtype=np.int64))
        _ref_write_residual(wr, resid)
        wv.align()
        wr.align()
        assert wv.bytes() == wr.bytes(), resid


def test_crc16_vectorized_fold_matches_byte_loop():
    from mints_wind_data_ingestion_spark.sources.flaccodec import (
        _crc16,
        _crc16_scalar,
    )

    rng = np.random.default_rng(21)
    # spans the scalar cutoff (128), non-pow2 group counts, frame-ish
    # and stream-ish sizes
    for n in (0, 1, 7, 127, 128, 129, 255, 1000, 4097, 65537):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert _crc16(data) == _crc16_scalar(data), n
    assert _crc16(b"\x00" * 4096) == _crc16_scalar(b"\x00" * 4096)
    assert _crc16(b"\xff" * 4096) == _crc16_scalar(b"\xff" * 4096)


def test_lpc_kernel_matches_naive_recurrence():
    from mints_wind_data_ingestion_spark.sources.flaccodec import (
        _lpc_kernel,
    )

    rng = np.random.default_rng(22)
    for order in (1, 2, 3, 8, 12, 32):
        for shift in (0, 5, 14):
            coefs = rng.integers(-(1 << 14), 1 << 14, order).tolist()
            warm = rng.integers(-32768, 32768, order).tolist()
            resid = rng.integers(-4000, 4000, 777).tolist()
            # naive reference: spec recurrence, coefs[0] pairs with
            # the most recent lag
            ref = list(warm)
            for r in resid:
                acc = sum(
                    c * ref[-1 - j] for j, c in enumerate(coefs)
                )
                ref.append(r + (acc >> shift))
            got = _lpc_kernel(order, shift)(
                resid, warm, *coefs[::-1]
            )
            assert got == ref, (order, shift)


def test_complex_packing_corrupt_group_floor_rejects_in_o1():
    """A corrupt 5.2/5.3 descriptor set whose minimum possible group-
    length sum already exceeds n must quarantine BEFORE the O(ng)
    descriptor expansion (observed 0.15-5.7 s on a 267-byte message
    claiming 1.9M groups; the guard makes it microseconds)."""
    import time

    from mints_wind_data_ingestion_spark.sources.grib2codec import (
        decode_grib2_bytes,
        encode_grib2_message,
        scan_grib2_bytes,
    )

    from datetime import datetime, timezone

    kw = dict(
        parameter_number=2,
        ref_time=datetime(2026, 8, 1, tzinfo=timezone.utc),
        nx=30,
        ny=20,
        packing="complex",
    )
    rng = np.random.default_rng(14)
    vals = (
        np.sin(np.arange(600) / 9.0) * 10 + rng.normal(0, 0.8, 600)
    )
    msg = bytearray(encode_grib2_message(vals, **kw))
    # locate section 5 (walk from octet 16) and corrupt ng upward
    o = 16
    while True:
        slen = int.from_bytes(msg[o : o + 4], "big")
        if msg[o + 4] == 5:
            break
        o += slen
    # octet o+31..34: number of groups -> absurdly large but < n, so
    # only the length-floor check can reject it cheaply
    msg[o + 31 : o + 35] = (550).to_bytes(4, "big")
    t0 = time.perf_counter()
    out = scan_grib2_bytes(bytes(msg))
    dt = time.perf_counter() - t0
    assert len(out) == 1 and out[0]["record"] is None
    assert "group lengths sum to at least" in out[0]["error"]
    assert dt < 0.1, f"floor rejection took {dt:.3f}s"
    # the untouched original still decodes
    ok = decode_grib2_bytes(bytes(encode_grib2_message(vals, **kw)))
    assert len(ok) == 1


def test_dhash_and_luma_rewrites_bit_identical():
    """dhash64 now resizes BEFORE the luma map (nearest-neighbor gather
    and a pointwise map commute exactly); _luma_plane runs one (N,3)
    matmul pass. Both must stay bit-identical to the r13 forms."""
    from mints_wind_data_ingestion_spark.sources import multimodal as mm

    def luma_ref(px):
        px = np.asarray(px)
        if px.ndim == 3:
            r = px[..., 0].astype(np.int64)
            g = px[..., 1].astype(np.int64)
            b = px[..., 2].astype(np.int64)
            return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)
        return px.astype(np.uint8, copy=False)

    def dhash_ref(pixels):
        px = np.asarray(pixels)
        if px.ndim == 3:
            r = px[..., 0].astype(np.int64)
            g = px[..., 1].astype(np.int64)
            b = px[..., 2].astype(np.int64)
            px = (r * 299 + g * 587 + b * 114) // 1000
        else:
            px = px.astype(np.int64)
        small = mm.resize_image(px, 9, 8)
        bits = small[:, :-1] > small[:, 1:]
        weights = 1 << np.arange(63, -1, -1, dtype=np.uint64)
        return int(bits.reshape(-1).astype(np.uint64) @ weights)

    rng = np.random.default_rng(7)
    for t in range(200):
        h, w = rng.integers(1, 90, 2)
        c = int(rng.choice([0, 3, 4]))
        shape = (h, w) if c == 0 else (h, w, c)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(mm._luma_plane(img), luma_ref(img)), shape
        assert mm.dhash64(img) == dhash_ref(img), shape


def test_ivf_suite_rebuild_launches_zero_jobs_and_plan_caches(spark):
    """r14 opt: the composite's probe pulls and persisted-index parquet
    reads are session-memoized on the index markers, so a rebuild
    against an unchanged index launches ZERO jobs — which makes the
    suite admissible to the prepared-plan cache from its second build.
    Values must stay identical to a fresh (cache-off) build."""
    from mints_wind_data_ingestion_spark.plans import (
        REGISTRY,
        enable_plan_cache,
    )

    sf = "/root/testdata/sf0.001"
    tracker = spark._jsc.sc().statusTracker()
    group = spark.sparkContext.getLocalProperty("spark.jobGroup.id")

    def njobs():
        return len(list(tracker.getJobIdsForGroup(group)))

    enable_plan_cache(True)
    try:
        REGISTRY["x_sim_ivf_suite"].build(spark, sf)
        j1 = njobs()
        b2 = REGISTRY["x_sim_ivf_suite"].build(spark, sf)
        assert njobs() == j1, "rebuild launched eager jobs"
        b3 = REGISTRY["x_sim_ivf_suite"].build(spark, sf)
        assert b2 is b3, "suite did not enter the prepared-plan cache"
        rows = sorted(map(tuple, b3.collect()))
    finally:
        enable_plan_cache(False)
    fresh = sorted(
        map(tuple, REGISTRY["x_sim_ivf_suite"].build(spark, sf).collect())
    )
    assert rows == fresh
