"""DuckDB-oracle differential tests over the whole query registry —
the local mirror of the driver's t2 gate (SURVEY.md §5 strategy #1)."""

from __future__ import annotations

import pytest

from mints_wind_data_ingestion_spark.plans import REGISTRY, resolve_oracle

from .compare import assert_results_match


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    sdf = q.build(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    oracle = resolve_oracle(q, sf_dir)
    if oracle is None:
        # rows-only check (non-SQL-expressible op): plan executes, sane schema
        assert len(spark_cols) > 0
        return

    rel = duck.sql(oracle)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()
    assert_results_match(spark_cols, spark_rows, duck_cols, duck_rows, name)


def test_registry_nonempty():
    assert len(REGISTRY) >= 1


import pytest  # noqa: E402


@pytest.mark.parametrize(
    "name",
    ["flagship_latest_by_bucket", "q5_local_supplier_volume",
     "x_dedup_minhash", "w_window_suite", "x_decontaminate"],
)
def test_results_invariant_under_aqe_off(name, spark, sf_dir):
    """Correctness must not depend on adaptive execution: AQE
    re-planning (coalescing, skew splits, broadcast promotion) may
    change the physical plan, never the result multiset."""
    from .compare import rows_to_multiset

    q = REGISTRY[name]
    base_df = q.build(spark, sf_dir)
    base = rows_to_multiset(
        list(base_df.columns), [tuple(r) for r in base_df.collect()]
    )
    key = "spark.sql.adaptive.enabled"
    spark.conf.set(key, "false")
    try:
        off_df = q.build(spark, sf_dir)
        off = rows_to_multiset(
            list(off_df.columns), [tuple(r) for r in off_df.collect()]
        )
    finally:
        spark.conf.set(key, "true")
    assert base == off


def test_driver_contract_invariants():
    """Guard the external-driver contract: the exported surface stays
    within the 50-row correctness window, every driver query carries an
    oracle except the one justified rows-only entry, oracle keys are a
    subset of query keys, and composites' folded components stay
    registered for the pytest mirror."""
    import __spark_entry__ as entry
    from mints_wind_data_ingestion_spark.plans import driver_registry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert len(qs) <= 50, "driver caps its correctness file at 50 rows"
    assert set(oracles) <= set(qs)
    rows_only = set(qs) - set(oracles)
    assert rows_only == set(), (
        f"unexpected rows-only driver entries: {rows_only}"
    )
    assert set(qs) == set(driver_registry())
    # every demoted component still registered (pytest mirror covers it)
    demoted = {n for n, q in REGISTRY.items() if not q.driver}
    assert demoted and demoted.isdisjoint(qs)
