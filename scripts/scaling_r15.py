"""Window-controlled scaling evidence (VERDICT r14 next-round #8).

The driver's scaling table compares one full 32-core sweep against one
full 8-core sweep run ~15 minutes later — on this host (BASELINE.md:
multi-minute steal bursts) the two legs routinely sample different
windows and the ratios read "8 cores beats 32" out of host noise.

This script interleaves the legs ADJACENT-IN-TIME: the query surface is
split into small groups, and for every group a 32-core bench subprocess
and an 8-core one run back-to-back (seconds apart, same window), twice
(two rounds, so each suite also gets two samples per core count from
two different windows; per-(query, cpus) minimums defeat one-off
bursts). Output: a per-query c8/c32 table printed as JSON and written
to SCALING_R15.json.

Usage: python scripts/scaling_r15.py [group_size] [rounds]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from mints_wind_data_ingestion_spark.plans import (  # noqa: E402
    PROMOTED_SLOTS,
    driver_registry,
)


def run_leg(names: list[str], cpus: int) -> dict[str, float]:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_ONLY=",".join(names),
        # first pass only (2 runs/query, min): budget floor+cap at 1 s
        # disables the split/resettle/second-sweep/recovery machinery —
        # this script provides its own window control (interleaving +
        # two rounds), and per-leg wall time is what bounds skew
        SPARK_GRAFT_BENCH_BUDGET_SEC="1",
        SPARK_GRAFT_BENCH_BUDGET_MAX_SEC="1",
        SPARK_GRAFT_BENCH_SETTLE_SEC="0",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    m = re.findall(r'\{"metric".*\}', out.stdout)
    if not m:
        raise RuntimeError(
            f"no metric line (cpus={cpus}): {out.stdout[-500:]}\n"
            f"{out.stderr[-500:]}"
        )
    return json.loads(m[-1])["queries"]


def main() -> None:
    group_size = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    names = sorted(
        n for n in driver_registry() if n not in PROMOTED_SLOTS
    )
    groups = [
        names[i:i + group_size] for i in range(0, len(names), group_size)
    ]
    best: dict[tuple[str, int], float] = {}
    samples: dict[tuple[str, int], list[float]] = {}
    for rnd in range(rounds):
        for gi, group in enumerate(groups):
            for cpus in (32, 8):
                timings = run_leg(group, cpus)
                for q, sec in timings.items():
                    key = (q, cpus)
                    best[key] = min(best.get(key, float("inf")), sec)
                    samples.setdefault(key, []).append(sec)
                print(
                    f"round {rnd + 1} group {gi + 1}/{len(groups)} "
                    f"c{cpus}: {sum(timings.values()):.2f}s",
                    flush=True,
                )
    table = {}
    for q in names:
        c32 = best.get((q, 32))
        c8 = best.get((q, 8))
        if c32 and c8:
            table[q] = {
                "c32_min": c32,
                "c8_min": c8,
                "speedup_32_over_8": round(c8 / c32, 3),
                "c32_samples": samples[(q, 32)],
                "c8_samples": samples[(q, 8)],
            }
    out = {
        "method": "interleaved adjacent-in-time legs, "
                  f"{rounds} rounds, group_size {group_size}, "
                  "min per (query, cpus)",
        "per_query": table,
    }
    with open(os.path.join(HERE, "SCALING_R15.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    for q, row in sorted(table.items()):
        print(
            f"{q:28s} c32 {row['c32_min']:7.3f}  c8 {row['c8_min']:7.3f}"
            f"  x{row['speedup_32_over_8']:.2f}"
        )


if __name__ == "__main__":
    main()
