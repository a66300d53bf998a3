"""Prepared-plan cache semantics (plans.registry.enable_plan_cache).

bench.py opts in to reuse DataFrame plan handles across repeated runs
of the same query — these tests pin the safety rules the cache
enforces on itself (OFF by default, eager builds excluded, mid-plan
persist points excluded, scale-keyed), because a wrong exclusion would
silently corrupt the benchmark's honesty rather than any query result.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mints_wind_data_ingestion_spark.plans import REGISTRY, enable_plan_cache
from mints_wind_data_ingestion_spark.plans.registry import query, tables


@pytest.fixture()
def plan_cache():
    """Enable the cache for one test; always restore the default-off
    state (and drop any queries the test registered)."""
    before = set(REGISTRY)
    enable_plan_cache(True)
    try:
        yield
    finally:
        enable_plan_cache(False)
        for name in set(REGISTRY) - before:
            del REGISTRY[name]


def test_cache_off_by_default(spark, sf_dir):
    q = REGISTRY["flagship_latest_by_bucket"]
    a = q.build(spark, sf_dir)
    b = q.build(spark, sf_dir)
    assert a is not b  # fresh plan every build when not opted in


def test_cache_reuses_plan_handle_per_scale(spark, sf_dir, plan_cache):
    q = REGISTRY["flagship_latest_by_bucket"]
    # the FIRST touch of a scale dir runs the table-load job, which the
    # job detector correctly reads as an eager build — warm the tables,
    # then reset the exclusion set (exactly bench.py's warmup order)
    other = ("/root/testdata/sf0.01"
             if sf_dir.rstrip("/").endswith("0.001")
             else "/root/testdata/sf0.001")
    tables(spark, sf_dir)
    tables(spark, other)
    enable_plan_cache(True)
    a = q.build(spark, sf_dir)
    assert q.build(spark, sf_dir) is a  # same (query, sf): reused
    c = q.build(spark, other)
    assert c is not a  # different scale: its own plan
    # reuse returns a live, executable handle with identical results
    assert a.count() == c.sparkSession.createDataFrame(
        a.collect(), a.schema
    ).count()


def test_eager_build_never_cached(spark, sf_dir, plan_cache):
    """A build that launches Spark jobs while constructing (training,
    iterative rounds) must re-run every time — caching it would hide
    real cluster work from the timer."""
    builds = {"n": 0}

    @query("zz_test_eager_build", tags=("test",), driver=False)
    def zz_test_eager_build(sess, _sf):
        builds["n"] += 1
        # driver pull during construction = an eager build
        seed = sess.range(10).count()
        return sess.range(seed)

    q = REGISTRY["zz_test_eager_build"]
    q.build(spark, sf_dir)
    q.build(spark, sf_dir)
    assert builds["n"] == 2  # self-excluded, built fresh both times


def test_midplan_persist_handle_rematerializes(spark, sf_dir, plan_cache):
    """r14 opt: a build whose plan registers a mid-plan .cache() IS
    plan-cached — the InMemoryRelation inside the reused handle
    re-populates after catalog.clearCache() (Spark re-materializes the
    cache buffers on the next action), so the handle keeps both its
    correctness and its materialize-once-per-run semantics. The old
    rule rebuilt these plans every run, charging the bench ~2.5 s of
    pure plan reconstruction per sweep."""
    builds = {"n": 0}

    @query("zz_test_persist_build", tags=("test",), driver=False)
    def zz_test_persist_build(sess, _sf):
        builds["n"] += 1
        shared = sess.range(100).select(
            F.col("id"), (F.col("id") % 7).alias("k")
        ).cache()
        return shared.join(shared.groupBy("k").count(), "k")

    q = REGISTRY["zz_test_persist_build"]
    a = q.build(spark, sf_dir)
    r1 = sorted(map(tuple, a.collect()))
    b = q.build(spark, sf_dir)
    assert builds["n"] == 1 and b is a  # reused, one construction
    spark.catalog.clearCache()
    # the reused handle still executes correctly after its cache entry
    # is dropped — identical rows, cache re-registered on this action
    r2 = sorted(map(tuple, q.build(spark, sf_dir).collect()))
    assert r1 == r2
    spark.catalog.clearCache()


def test_eager_build_detected_under_job_group(spark, sf_dir, plan_cache):
    """Jobs launched during build inherit the calling thread's job
    group — getJobIdsForGroup(None) only lists group-LESS jobs, so
    detection must probe the CURRENT group or an eager build under
    e.g. foreachBatch would be cached as lazy (ADVICE r6)."""
    builds = {"n": 0}

    @query("zz_test_eager_grouped", tags=("test",), driver=False)
    def zz_test_eager_grouped(sess, _sf):
        builds["n"] += 1
        seed = sess.range(10).count()  # job runs INSIDE the group
        return sess.range(seed)

    q = REGISTRY["zz_test_eager_grouped"]
    spark.sparkContext.setJobGroup("zz-group", "plan-cache gate test")
    try:
        q.build(spark, sf_dir)
        q.build(spark, sf_dir)
    finally:
        spark.sparkContext.setJobGroup(None, None)
    assert builds["n"] == 2  # self-excluded even under a job group


def test_lazy_build_cached_and_results_stay_live(spark, sf_dir, plan_cache):
    """The cached handle is a PLAN, not a result: execution still runs
    (a fresh action on the reused handle sees the same data and
    recomputes — here just verified by repeated identical actions)."""
    builds = {"n": 0}

    @query("zz_test_lazy_build", tags=("test",), driver=False)
    def zz_test_lazy_build(sess, _sf):
        builds["n"] += 1
        return sess.range(50).groupBy((F.col("id") % 5).alias("k")).count()

    q = REGISTRY["zz_test_lazy_build"]
    r1 = q.build(spark, sf_dir).collect()
    r2 = q.build(spark, sf_dir).collect()
    assert builds["n"] == 1  # one construction ...
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))  # ... N runs
