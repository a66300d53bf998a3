"""Time-series resampling (operators.resample, round 7) — per-key
linear interpolation onto a step-aligned grid, pinned by hand."""

from __future__ import annotations

from datetime import datetime

import pytest

STEP = 10_000_000  # 10 s in µs


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, datetime.utcfromtimestamp(us / 1e6), v, rid)
         for k, us, v, rid in rows],
        "k long, ts timestamp, v double, rid long",
    )


def _run(spark, rows, step=STEP):
    from mints_wind_data_ingestion_spark.operators.resample import (
        resample_interpolate,
    )

    out = resample_interpolate(
        _df(spark, rows), key_col="k", ts_col="ts", val_col="v",
        id_col="rid", step_us=step,
    ).collect()
    return {(r["k"], r["ts_us"]): r["v_e6"] for r in out}


def test_linear_interpolation_and_exact_hits(spark):
    # key 1: obs at 5 s (v=1.0) and 25 s (v=3.0) → ticks at 10 s and
    # 20 s interpolate to 1.5 and 2.5; no tick outside [5, 25]
    got = _run(spark, [(1, 5_000_000, 1.0, 1), (1, 25_000_000, 3.0, 2)])
    assert got == {
        (1, 10_000_000): 1_500_000,
        (1, 20_000_000): 2_500_000,
    }
    # obs exactly ON a tick returns the observation
    got = _run(spark, [(2, 10_000_000, 7.0, 1), (2, 30_000_000, 9.0, 2)])
    assert got[(2, 10_000_000)] == 7_000_000
    assert got[(2, 20_000_000)] == 8_000_000
    assert got[(2, 30_000_000)] == 9_000_000


def test_no_extrapolation_and_no_aligned_tick(spark):
    # whole range inside one step: no aligned tick → no rows, and the
    # sequence guard must not throw
    assert _run(spark, [(1, 12_000_000, 1.0, 1),
                        (1, 18_000_000, 2.0, 2)]) == {}


def test_duplicate_ts_latest_wins(spark):
    # two obs at the same µs: the higher rid wins (engine upsert
    # semantics), deterministically
    got = _run(spark, [
        (1, 10_000_000, 1.0, 1),
        (1, 10_000_000, 5.0, 2),  # latest wins
        (1, 20_000_000, 5.0, 3),
    ])
    assert got[(1, 10_000_000)] == 5_000_000
    assert got[(1, 20_000_000)] == 5_000_000


def test_keys_independent(spark):
    got = _run(spark, [
        (1, 0, 0.0, 1), (1, 20_000_000, 2.0, 2),
        (2, 40_000_000, 8.0, 3), (2, 60_000_000, 10.0, 4),
    ])
    assert got == {
        (1, 0): 0, (1, 10_000_000): 1_000_000,
        (1, 20_000_000): 2_000_000,
        (2, 40_000_000): 8_000_000, (2, 50_000_000): 9_000_000,
        (2, 60_000_000): 10_000_000,
    }


def test_null_values_are_not_observations(spark):
    """A NULL-valued row must not act as an observation: kept, it
    would desynchronize the bracketing windows (next_ts from the NULL
    obs, next_v from a later one) and interpolate against the wrong
    anchor (review finding, r7)."""
    # straight line 10 → 22 over 24 s, ignoring the NULL at 12 s
    got = _run(spark, [
        (1, 0, 10.0, 1),
        (1, 12_000_000, None, 2),   # NULL obs mid-range — ignored
        (1, 24_000_000, 22.0, 3),
    ])
    assert got == {
        (1, 0): 10_000_000,
        (1, 10_000_000): 15_000_000,
        (1, 20_000_000): 20_000_000,
    }
    # trailing NULL: no later real obs → ticks after the last real
    # obs are dropped, never emitted with NULL v_e6
    got = _run(spark, [(2, 0, 1.0, 1), (2, 25_000_000, None, 2)])
    assert got == {(2, 0): 1_000_000}
    # NULL at a duplicate timestamp must not beat the real value
    got = _run(spark, [
        (3, 10_000_000, 4.0, 1),
        (3, 10_000_000, None, 2),  # higher rid but NULL — skipped
        (3, 20_000_000, 6.0, 3),
    ])
    assert got[(3, 10_000_000)] == 4_000_000


def test_locf_carries_forward(spark):
    # obs at 5 s (v=1.0), 25 s (v=3.0): locf fills ticks 10 s and 20 s
    # with 1.0 (the LAST observation at/before the tick), not the
    # interpolated value
    got = _run_kind(spark, [(1, 5_000_000, 1.0, 1),
                            (1, 25_000_000, 3.0, 2)], "locf")
    assert got == {
        (1, 10_000_000): 1_000_000,
        (1, 20_000_000): 1_000_000,
    }
    # exact hit still returns the observation itself
    got = _run_kind(spark, [(2, 10_000_000, 7.0, 1),
                            (2, 30_000_000, 9.0, 2)], "locf")
    assert got[(2, 10_000_000)] == 7_000_000
    assert got[(2, 30_000_000)] == 9_000_000


def _run_kind(spark, rows, kind):
    from mints_wind_data_ingestion_spark.operators.resample import (
        resample_interpolate,
    )

    out = resample_interpolate(
        _df(spark, rows), key_col="k", ts_col="ts", val_col="v",
        id_col="rid", step_us=STEP, kind=kind,
    ).collect()
    return {(r["k"], r["ts_us"]): r["v_e6"] for r in out}


def test_kind_validation(spark):
    from mints_wind_data_ingestion_spark.operators.resample import (
        resample_interpolate,
    )

    with pytest.raises(ValueError, match="kind"):
        resample_interpolate(
            _df(spark, [(1, 0, 0.0, 1)]), key_col="k", ts_col="ts",
            val_col="v", id_col="rid", step_us=STEP, kind="spline",
        )


def test_step_validation(spark):
    from mints_wind_data_ingestion_spark.operators.resample import (
        resample_interpolate,
    )

    with pytest.raises(ValueError, match="positive"):
        resample_interpolate(
            _df(spark, [(1, 0, 0.0, 1)]), key_col="k", ts_col="ts",
            val_col="v", id_col="rid", step_us=0,
        )
