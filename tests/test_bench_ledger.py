"""Bench ledger semantics (bench.load_prior_min / roll_ledger).

VERDICT r6 #1: the old prior_min min-merged over ALL historical
BENCH_r*.json artifacts, so a deliberate ledger RESEED (BASELINE.md
"Ledger resets, not rolls" — a plan change retires an old minimum)
was re-polluted on every run and the 1.35× burst-retry trigger fired
forever on an unreachable target. These tests pin the fixed
authority order: BENCH_HISTORY.json wins for names it carries;
recorded artifacts only seed ledger-unknown names; the end-of-run
roll mins against the ledger only, never the artifacts."""

from __future__ import annotations

import json
import os

from bench import load_history, load_prior_min, roll_ledger


def _write(d, name, obj):
    p = os.path.join(d, name)
    with open(p, "w") as fh:
        json.dump(obj, fh)
    return p


def test_history_is_authoritative_over_artifacts(tmp_path):
    """A reseeded (raised) ledger value sticks even though an older
    recorded artifact carries a lower min for the same name."""
    d = str(tmp_path)
    _write(d, "BENCH_r05.json", {"queries": {"q": 1.0, "only_art": 3.0}})
    _write(d, "BENCH_r06.json", {"parsed": {"queries": {"q": 1.2}}})
    hist_path = _write(d, "BENCH_HISTORY.json",
                       {"queries": {"q": 2.0}, "plan_cache": True})
    hist = load_history(hist_path)
    pm = load_prior_min(d, hist)
    assert pm["q"] == 2.0  # reseed sticks — artifacts ignored
    assert pm["only_art"] == 3.0  # ledger-unknown name seeds from artifacts


def test_artifact_min_taken_across_rounds_for_new_names(tmp_path):
    d = str(tmp_path)
    _write(d, "BENCH_r01.json", {"queries": {"new_q": 5.0}})
    _write(d, "BENCH_r02.json", {"queries": {"new_q": 4.0}})
    pm = load_prior_min(d, {})
    assert pm["new_q"] == 4.0


def test_malformed_artifacts_and_ledger_skipped(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "BENCH_r03.json"), "w") as fh:
        fh.write("{not json")
    _write(d, "BENCH_r04.json", {"queries": {"q": "fast"}})  # non-numeric
    hist = load_history(os.path.join(d, "BENCH_HISTORY.json"))  # absent
    assert hist == {}
    assert load_prior_min(d, hist) == {}


def test_roll_ledger_mins_against_ledger_only(tmp_path):
    """The end-of-run roll must not re-min against artifact values:
    a slower-than-reseed run leaves the reseed; a genuinely faster run
    rolls it down; names outside this run's subset survive; the
    plan_cache regime marker is recorded (ADVICE r6)."""
    d = str(tmp_path)
    hist_path = os.path.join(d, "BENCH_HISTORY.json")
    hist = {"q": 2.0, "untouched": 1.5}
    roll_ledger(hist_path, hist, {"q": 2.3})
    saved = json.load(open(hist_path))
    assert saved["queries"]["q"] == 2.0  # slower run: reseed holds
    assert saved["queries"]["untouched"] == 1.5  # subset run keeps rest
    assert saved["plan_cache"] is True
    roll_ledger(hist_path, load_history(hist_path), {"q": 1.8})
    assert json.load(open(hist_path))["queries"]["q"] == 1.8  # real gain rolls
