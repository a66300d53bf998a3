"""Scale profile for the r12 changes: the multimodal dedup family
re-measured with this round's code (skew-safe PPJoin prefix pair
joins as the standalone default + size-aware spread of the synth
corpora), plus the IVFPQ steady state.

Same posture as scaling_modalities.py: full pipelines, build+noop,
interleaved best-of-3, sf0.01 → sf0.1 = 10× payloads at constant
near-dup density. Appends a `### Round-12: ...` subsection to
SCALING.md (hand-written `### ` subsections survive
scaling_sf1.py's regeneration).

Usage: python scripts/scaling_r12.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mints_wind_data_ingestion_spark.plans import REGISTRY  # noqa: E402
from mints_wind_data_ingestion_spark.session import get_spark  # noqa: E402

QUERIES = ["x_image_dedup", "x_video_dedup", "x_audio_dedup", "x_ivfpq_topk"]
BASE, BIG = "/root/testdata/sf0.01", "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("scaling-r12")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["x_video_sig"].build(spark, BASE).write.format("noop").mode(
        "overwrite"
    ).save()

    def run(name: str, sf: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].build(spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    best: dict[tuple[str, str], float] = {}
    for _ in range(3):  # interleaved: every (query, sf) samples every window
        for name in QUERIES:
            for sf in (BASE, BIG):
                k = (name, sf)
                dt = run(name, sf)
                best[k] = min(best.get(k, dt), dt)

    lines = [
        "",
        "### Round-12: modality dedup re-measured under the skew-safe defaults",
        "",
        "The standalone image/video/audio dedup entries now run the EXACT",
        "PPJoin prefix pair join by default (video/audio) and spread their",
        "single-split synth corpora (_spread, work_factor=256 — fires at",
        "sf0.1, no-ops at tiny scale); IVFPQ rides its persisted",
        "cell-partitioned codes. Build+noop, interleaved best-of-3:",
        "",
        "| query | sf0.01 s | sf0.1 s | growth | note |",
        "|---|---|---|---|---|",
    ]
    note = {
        "x_image_dedup": "banded Hamming, 525 → 5 250 images",
        "x_video_dedup": "prefix Jaccard, 63 → 625 clips",
        "x_audio_dedup": "prefix Jaccard, every 4th clip FLAC",
        "x_ivfpq_topk": "cell-pruned ADC + rerank, warm index",
    }
    for name in QUERIES:
        a, b = best[(name, BASE)], best[(name, BIG)]
        lines.append(
            f"| `{name}` | {a:.2f} | {b:.2f} | {b / a:.1f}× | {note[name]} |"
        )
    lines += [
        "",
        "The exactness-preserving prefix filter holds the video/audio",
        "growth sub-linear while removing the hot-key hazard (SCALING.md",
        "r12 skew note); the corpus spread flattens the Arrow synth/hash",
        "stage at the bigger scale.",
    ]
    with open(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING.md"),
        "a",
    ) as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
