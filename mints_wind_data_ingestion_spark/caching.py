"""Bounded mid-plan cache registry (r12, VERDICT r11 #5).

Several operators register mid-plan `.cache()` points — a posting
list consumed by both sides of a self-join, a signature table feeding
its own part AND a derived pair query. Those caches are load-bearing
(without the materialization point an expensive Arrow pass executes
once per consumer) but a plain `.cache()` is never released: in a
long-lived session that re-builds the same query (bench iterations, a
notebook, a service) every build stacks one more CacheManager entry.

`managed_cache` bounds that: each cache point registers under a key —
by default the plan's own semantic hash, so identical re-builds map to
the same key — and REPLACES (unpersists) the previous holder of that
key. Live entries are therefore bounded by the number of DISTINCT
plans cached, not the number of builds. Replacement is lazy-safe: a
consumer still holding the old DataFrame merely recomputes its
subtree; correctness never depends on a cache.

One-shot processes (the external driver's verify pass, pytest
sessions that build each query once) see identical behavior to plain
`.cache()`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["managed_cache"]

#: (applicationId, owner, slot) → the live cached DataFrame
_managed: dict[tuple[str, str, str], DataFrame] = {}


def managed_cache(
    df: DataFrame, owner: str | None = None, slot: str = ""
) -> DataFrame:
    """Cache `df`, releasing whatever a prior call cached under the
    same (owner, slot). `owner=None` self-keys on the analyzed plan's
    semantic hash — identical re-builds replace, distinct plans
    coexist. Returns the cached DataFrame."""
    if owner is None:
        try:
            owner = str(df._jdf.queryExecution().analyzed().semanticHash())
        except Exception:  # noqa: BLE001 — fingerprint is best-effort
            return df.cache()
    app_id = df.sparkSession.sparkContext.applicationId
    # sweep entries from OTHER applications on insert: their sessions
    # are stopped (one live SparkContext per process), so the keys
    # only pin dead DataFrame/JVM handles in a long-lived process
    # cycling many sessions
    for dead in [k for k in _managed if k[0] != app_id]:
        del _managed[dead]
    key = (app_id, owner, slot)
    old = _managed.get(key)
    if old is not None and old is not df:
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001 — e.g. a stopped session
            pass
    _managed[key] = df
    return df.cache()
