"""sf1-scale spot run of the dedup/CC/LSH path (VERDICT r4 #7).

SCALING.md's 100× spread tops out at sf0.1 (5 000 docs / 2 000
vectors), where fixed job costs still dominate — the sub-linear rows
there don't yet PROVE the banded-join structure scales. This script
derives a 10× corpus from the provided sf0.1 testdata (no synthetic
distributions invented: every derived row is a perturbed copy of a
driver-generated row):

- documents ×10: replica k offsets doc_id by k·10⁷ and prefixes every
  word with "v{k}" for k>0 — so no 3-gram shingle crosses replicas and
  the near-duplicate pair structure scales exactly linearly (each
  replica slice preserves the original's internal near-dup pairs).
- embeddings ×10: replica k offsets vec_id and rolls the vector by k
  positions — same norm/value distribution, no cross-replica
  degenerate duplicates.

Then it times x_dedup_minhash / x_dedup_cluster / x_sim_topk_lsh at
sf0.1 and at the derived sf1 (best-of-3, noop sink, warm session) and
appends the 0.1→1 growth table to SCALING.md. Growth ≈10× is
data-bound linear; ≫10× would mean a pair-space or sort blowup and
fail the 100 TB posture.

Usage: python scripts/scaling_sf1.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mints_wind_data_ingestion_spark.plans import REGISTRY  # noqa: E402
from mints_wind_data_ingestion_spark.schemas import TESTDATA_TABLES  # noqa: E402
from mints_wind_data_ingestion_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scaling_sf1")
REPLICAS = 10
QUERIES = [
    "x_dedup_minhash",
    "x_dedup_cluster",
    "x_sim_topk_lsh",
    # round-5 additions: the rare-shingle-blocked Levenshtein join
    # (within-replica pairs scale exactly 10×; the v{k} prefix kills
    # cross-replica shingles) and the constant-term BM25 scan (the
    # two corpus passes are scan-bound — the pure-linear case)
    "x_dedup_editdist",
    "x_bm25_topk",
    # round-6 addition: the Gopher repetition gates — per-doc gram
    # explode + two combinable aggs; the v{k} prefix changes gram
    # STRINGS but not per-doc counts, so outputs scale exactly 10×
    "x_quality_repetition",
    # round-7 addition: the posting-join BM25 path — corpus explode
    # pruned against the broadcast term set, DECIMAL score sums. The
    # v{k} prefix means only replica 0 matches the fixed workload's
    # terms, so this measures the part that actually dominates at
    # 100 TB: the tokenize/explode/prune corpus pass over 10× bytes
    # with a constant matched set (post-prune stages are match-bound)
    "x_bm25_table",
    # round-7 additions: the cross-corpus banded dedup (replica slices
    # preserve within-replica near-dup pairs, so cross pairs scale
    # exactly 10×) and the bigram-LM filter (v{k} prefixes make each
    # replica its own closed vocabulary — bigram table and score join
    # both scale linearly, the worst case for the model-table join)
    "x_dedup_incremental",
    "x_lm_perplexity",
    # round-7 addition: per-key gap-fill over the 10× events corpus —
    # 10× keys with identical per-key series, so ticks, window rows
    # and outputs all scale exactly 10× (the pure key-parallel case)
    "x_resample_interpolate",
    # round-8 addition: substring-level exact dedup — the position
    # explode is O(total chars) and the v{k} prefixes keep replicas'
    # 60-char windows disjoint while preserving each replica's
    # internal repeats, so windows, flagged positions, islands and
    # output rows all scale ~10× (the prefix lengthens words a few
    # chars, so slightly super-10× window counts are expected)
    "x_dedup_substring",
    # round-8 addition: the trigram backoff LM — same closed-vocab
    # replica argument as x_lm_perplexity (v{k} prefixes), one gram
    # order deeper: count tables and the five-way score join all
    # scale linearly
    "x_lm_backoff",
    # round-8 addition: DSIR selection — two bigram models + the
    # four-way score join, same closed-vocab replica argument; the
    # top-k is constant-size so growth is model/explode-bound
    "x_dsir_sample",
    # round-8 addition: cross-corpus excision — the batch third and
    # the protected two-thirds both grow 10×, windows stay disjoint
    # across replicas, so candidates and cuts scale ~10× with the
    # corpus (the steady-state fixed-batch shape is profiled
    # separately in scaling_incremental.py's pattern)
    "x_substring_excise",
    # round-14 additions (VERDICT r13 #7): the r13 skew machinery at
    # 10×. x_dedup_jaccard drives jaccard_join_adaptive — the bounded
    # stats pull + route decision runs at both scales, and the ratio
    # statistic (Σdf²/postings) is scale-INVARIANT under replica
    # derivation (df distribution per replica unchanged, vol and
    # postings both ×10), so the uniform route must hold at sf1 —
    # pinning the routing threshold at a second scale point.
    # x_dedup_simhash exercises the banded-Hamming path whose
    # identical-fingerprint collapse gate (r13) likewise reads a
    # scale-linear statistic (largest cluster ×1 under replicas).
    "x_dedup_jaccard",
    "x_dedup_simhash",
    # round-14 addition: the WARC/WET container-ingestion e2e — gzip
    # member walk + record parse over 10× documents; pure per-doc
    # work, the embarrassingly-parallel linear case
    "x_warc_ingest",
    # round-14 addition: link-graph PageRank at 10× — edge synthesis,
    # probe-pull, and the exact-integer local solve over 10× docs.
    # Shape note: sf1 doc ids are replica-offset (non-contiguous), so
    # the modulo-N targets mostly miss the id space — the graph
    # degenerates toward all-dangling (deterministic, oracle-identical
    # by construction); the spot row measures the machinery's scaling,
    # not a web-shaped rank distribution.
    "x_pagerank",
]


def build_sf1(spark) -> None:
    os.makedirs(SF1, exist_ok=True)
    # unscaled tables ride through as symlinks
    for t in TESTDATA_TABLES:
        if t in ("documents", "embeddings", "events"):
            continue
        link = os.path.join(SF1, f"{t}.parquet")
        if not os.path.lexists(link):
            os.symlink(os.path.join(SF01, f"{t}.parquet"), link)

    # events ×10 (r7): replica k offsets user_id/event_id, timestamps
    # unchanged — each replica user carries the original's exact
    # per-user series, so resample/EWMA-class outputs scale exactly
    # 10× (10× keys, same per-key tick/obs structure)
    ev_out = os.path.join(SF1, "events.parquet")
    if os.path.islink(ev_out):
        # pre-r7 runs SYMLINKED events into SF1; the stale link would
        # make the ×10 derivation silently skip and the "sf1" rows
        # measure unscaled data
        os.remove(ev_out)
    if not os.path.exists(ev_out):
        ev = spark.read.parquet(os.path.join(SF01, "events.parquet"))
        k = F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("__k")
        rep = ev.select("*", k)
        scaled = rep.select(
            (F.col("event_id")
             + F.col("__k").cast("bigint") * F.lit(10 ** 9)).alias(
                "event_id"
            ),
            (F.col("user_id")
             + F.col("__k").cast("bigint") * F.lit(10 ** 7)).alias(
                "user_id"
            ),
            *[c for c in ev.columns if c not in ("event_id", "user_id")],
        )
        scaled.repartition(32).write.mode("overwrite").parquet(ev_out)

    docs_out = os.path.join(SF1, "documents.parquet")
    if not os.path.exists(docs_out):
        docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
        k = F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("__k")
        rep = docs.select("*", k)
        scaled = rep.select(
            (F.col("doc_id") + F.col("__k") * F.lit(10_000_000)).alias("doc_id"),
            F.when(F.col("__k") == 0, F.col("text")).otherwise(
                # prefix every token with v{k}: kills cross-replica
                # shingle overlap, preserves within-replica structure
                F.regexp_replace(
                    F.col("text"), r"(\S+)",
                    F.concat(F.lit("v"), F.col("__k").cast("string"), F.lit("$1")),
                )
            ).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        scaled.repartition(32).write.mode("overwrite").parquet(docs_out)

    emb_out = os.path.join(SF1, "embeddings.parquet")
    if not os.path.exists(emb_out):
        emb = spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))
        k = F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("__k")
        rep = emb.select("*", k)
        dim = len(rep.select("embedding").first()[0])
        rolled = F.concat(
            F.slice(F.col("embedding"), F.col("__k") + 1, F.lit(dim)),
            F.slice(F.col("embedding"), 1, F.col("__k")),
        )
        scaled = rep.select(
            (F.col("vec_id") + F.col("__k") * F.lit(10_000_000)).alias("vec_id"),
            rolled.alias("embedding"),
            *[c for c in emb.columns if c not in ("vec_id", "embedding")],
        )
        scaled.repartition(32).write.mode("overwrite").parquet(emb_out)


def main() -> None:
    spark = get_spark("scaling-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)
    for t in ("documents", "embeddings"):
        n = spark.read.parquet(os.path.join(SF1, f"{t}.parquet")).count()
        print(f"sf1 {t}: {n} rows")

    REGISTRY["flagship_latest_by_bucket"].build(spark, SF01).write.format(
        "noop"
    ).mode("overwrite").save()

    rows = []
    for name in QUERIES:
        times = []
        for sf in (SF01, SF1):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                REGISTRY[name].build(spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
                # clear AFTER EVERY run, exactly like bench.py: plans
                # that register mid-plan .cache() points (minhash
                # postings, the LM gram counts) would otherwise serve
                # runs 2-3 from the cache and the best-of-3 would
                # exclude the very stage being measured (r7 review)
                spark.catalog.clearCache()
            times.append(best)
        growth = times[1] / times[0]
        rows.append((name, times[0], times[1], growth))
        print(f"{name}: sf0.1={times[0]:.2f}s sf1={times[1]:.2f}s "
              f"growth={growth:.1f}x")

    stamp = "\n## sf0.1 → sf1 spot run (10× derived corpus; see scripts/scaling_sf1.py)\n\n"
    stamp += ("50 000 documents / 20 000 embeddings / 1 M events,\n"
              "replica-perturbed from the driver's sf0.1 parquet so near-dup\n"
              "pair structure and per-key time series scale exactly linearly.\n"
              "best-of-3, noop sink, warm session.\n\n")
    stamp += "| query | sf0.1 s | sf1 s | 0.1→1 growth |\n|---|---|---|---|\n"
    for name, a, b, g in rows:
        stamp += f"| `{name}` | {a:.2f} | {b:.2f} | {g:.1f}× |\n"
    # verify the claim before stamping it (r8 review: prose must not
    # outrun the measurements). A linear row can measure slightly over
    # 10× under this host's ±50% noise; >12× would be a real
    # super-linear signal and should fail the run, not get recorded.
    gmax = max(g for _, _, _, g in rows)
    assert gmax <= 12.0, f"super-linear growth {gmax:.1f}x — investigate"
    stamp += (f"\nAt 10× the data the measured growth factors top out at"
              f" {gmax:.1f}× —\n"
              "data-bound at most linear, never a pair-space blowup: the\n"
              "banded minhash join, the large/small-star CC rounds, the\n"
              "bucketed LSH join, the rare-shingle-blocked Levenshtein join,\n"
              "the constant-term BM25 corpus passes, the repetition-gate\n"
              "gram explode, and the substring window passes. Rows well\n"
              "under 10× are job-floor- or model-table-bound;\n"
              "`x_substring_excise` sits nearest 10× because BOTH its\n"
              "corpus sides grow here — ~10× IS its linear expectation,\n"
              "and its production recurrence (fixed batch vs persisted\n"
              "index) is the steady-state shape profiled below at ~1×.\n")
    md_path = os.path.join(os.path.dirname(SF1), "SCALING.md")
    md = open(md_path).read()
    cut = md.find("\n## sf0.1 → sf1 spot run")
    tail = ""
    if cut >= 0:
        old = md[cut:]
        # hand-written "### ..." subsections under the spot-run section
        # (e.g. the round-6 stage-level profile) survive regeneration
        sub = old.find("\n### ")
        if sub >= 0:
            tail = old[sub:]
        md = md[:cut]
    open(md_path, "w").write(md + stamp + tail)
    print("SCALING.md updated")


if __name__ == "__main__":
    main()
