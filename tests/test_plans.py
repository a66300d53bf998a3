"""Physical-plan audits (SURVEY.md §4): the optimizations the reference
hand-rolls must appear in OUR plans as Catalyst features — pushed
filters, pruned schemas, broadcast joins, partial aggregation, heap-based
top-k. These tests pin the plan SHAPE so a refactor that silently
de-optimizes a query fails CI, not the 100 TB run."""

from __future__ import annotations

import contextlib
import io

from mints_wind_data_ingestion_spark.plans import REGISTRY


def plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].build(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_and_column_pruning(spark, sf_dir):
    """F1: predicates reach the parquet scan; only referenced columns
    are read (the engine-side analog of grib2json's --fp/--fs/--fv +
    --data flags, SURVEY.md §4)."""
    p = plan(spark, sf_dir, "f1_conjunctive_filter")
    assert "PushedFilters:" in p
    assert "l_returnflag" in p.split("PushedFilters:")[1].splitlines()[0]
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_partkey" not in read_schema  # unreferenced → pruned
    assert "l_quantity" in read_schema


def test_dimension_joins_broadcast(spark, sf_dir):
    """J5: both dims broadcast — the fact side never shuffles for the
    join; no sort-merge join anywhere in the plan."""
    import re

    p = plan(spark, sf_dir, "j5_dim_enrichment")
    # formatted mode lists each node once in the tree and once in the
    # details — count distinct node headers
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", p)) == 2
    assert "SortMergeJoin" not in p


def test_q3_join_strategy(spark, sf_dir):
    """Q3: filtered customer broadcasts; final top-10 is
    TakeOrderedAndProject (per-partition heaps), never a global Sort."""
    p = plan(spark, sf_dir, "q3_shipping_priority")
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p


def test_q5_join_strategy(spark, sf_dir):
    """Q5 (six-way): the region⋈nation⋈supplier dimension branch rides
    entirely on broadcasts, so the fact pipeline shuffles only twice —
    lineitem⋈orders on orderkey and ⋈customer on custkey. Pin: ≥3
    broadcast joins, and the date predicate pushed to the orders scan."""
    import re

    p = plan(spark, sf_dir, "q5_local_supplier_volume")
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", p)) >= 3
    pushed = [
        line for line in p.splitlines() if "PushedFilters:" in line and "o_orderdate" in line
    ]
    assert pushed, "orders date range must push to the parquet scan"


def test_q7_join_strategy(spark, sf_dir):
    """Q7: nation broadcasts twice (aliased roles) and the nation-name
    filter is applied INSIDE each broadcast branch — the fact side is
    reduced by two selective broadcast hash joins before any shuffle."""
    import re

    p = plan(spark, sf_dir, "q7_volume_shipping")
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", p)) >= 2
    # the n_name IN (...) filter must sit on the nation scans, not post-join
    assert p.count("n_name") >= 2


def test_aggregate_is_partial_then_final(spark, sf_dir):
    """Q1: hash aggregation combines map-side before the single
    shuffle (partial + final HashAggregate pair)."""
    p = plan(spark, sf_dir, "q1_pricing_summary")
    assert p.count("HashAggregate") >= 2
    assert "Functions [4]" in p or "partial" in p.lower()


def test_topk_is_heap_not_sort(spark, sf_dir):
    """O1: global top-k plans as TakeOrderedAndProject — no full sort
    ever materializes (converter.py:134-181's early termination)."""
    p = plan(spark, sf_dir, "o1_topk_orders")
    assert "TakeOrderedAndProject" in p
    assert "Sort [" not in p


def test_flagship_single_shuffle(spark, sf_dir):
    """Flagship: max_by aggregation needs exactly ONE exchange on the
    group keys, with a PARTIAL aggregate before it — only per-partition
    winners cross the wire. (Spark plans max_by-over-struct as
    SortAggregate — struct buffers aren't hash-aggregable — but the
    partial/final split is what matters at scale.) The row_number
    formulation would instead shuffle every input row into a Window."""
    import re

    p = plan(spark, sf_dir, "flagship_latest_by_bucket")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "Window" not in p
    assert len(re.findall(r"\(\d+\) \w*Aggregate", p)) == 2  # partial + final


def test_unpivot_is_expand_not_union(spark, sf_dir):
    """Unpivot compiles to one map-side Expand node — not a UNION of
    three self-scans — so the only exchanges in the plan are the
    pivot aggregate's own pair and the input is scanned once."""
    import re

    p = plan(spark, sf_dir, "a_unpivot_types")
    assert "Expand" in p and "Union" not in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 2  # pivot agg's pair


def test_udaf_is_arrow_grouped_agg(spark, sf_dir):
    """The weighted-median UDAF runs as Arrow-batched
    AggregateInPandas (Series-to-scalar), one exchange on the
    high-cardinality group key — never a row-at-a-time Python UDF."""
    import re

    p = plan(spark, sf_dir, "udaf_weighted_median")
    # Spark 4.1 names the node ArrowAggregatePython (AggregateInPandas
    # in older releases) — either way, the Arrow-batched grouped path
    assert "ArrowAggregatePython" in p or "AggregateInPandas" in p
    assert "BatchEvalPython" not in p  # the row-at-a-time path
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1


def test_bucketed_join_has_zero_exchanges(spark, sf_dir):
    """Co-located join: lineitem and orders written bucketed by their
    join key (same bucket count) join with NO Exchange on either side
    and no sort (sortBy at write, one file per bucket) — the shuffle
    was paid once at write time, amortized over every future join.
    This is the 100 TB contract for repeated fact⋈fact joins."""
    import re

    from mints_wind_data_ingestion_spark.plans.registry import tables
    from mints_wind_data_ingestion_spark.sinks import write_bucketed

    t = tables(spark, sf_dir)
    write_bucketed(t["lineitem"].select("l_orderkey", "l_quantity"),
                   "bkt_lineitem", "l_orderkey", buckets=8)
    write_bucketed(t["orders"].select("o_orderkey", "o_totalprice"),
                   "bkt_orders", "o_orderkey", buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force the sort-merge path: at real scale neither fact side
    # broadcasts — that is exactly the case bucketing exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # honor the write-time sortBy (since 3.0 Spark re-sorts unless told
    # each bucket is one pre-sorted file — write_bucketed guarantees it)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        li, o = spark.table("bkt_lineitem"), spark.table("bkt_orders")
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        plan_str = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan_str
        assert "Exchange" not in plan_str, "bucketed join must not shuffle"
        assert not re.search(r"\bSort\b", plan_str), (
            "sortBy + one file per bucket must let the join skip sorts"
        )
        assert "SelectedBucketsCount" in plan_str
        # equivalence with the plain (shuffling) join
        from pyspark.sql import functions as F

        plain = t["lineitem"].join(
            t["orders"], F.col("l_orderkey") == F.col("o_orderkey")
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_events_scan_prunes_props(spark, sf_dir):
    """Nested/wide columns not referenced (the json props blob) stay
    out of the scan schema for queries that don't touch them."""
    p = plan(spark, sf_dir, "a2_bucket_counts")
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "props" not in read_schema


def test_mixture_sample_is_shuffle_free(spark, sf_dir):
    """Corpus rebalancing must stay a narrow filter: no Exchange, no
    window, no aggregate anywhere in the mixture-sample plan — at
    100 TB this op streams through the scan."""
    p = plan(spark, sf_dir, "x_sample_mixture")
    assert "Exchange" not in p
    assert "Window" not in p
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema  # body never read for sampling


def test_stratified_sample_single_shuffle(spark, sf_dir):
    """Exact-k stratified sampling pays exactly one shuffle (on the
    stratum key) AND pre-filters map-side: Spark's WindowGroupLimit
    must appear in Partial mode before the exchange, so at most k rows
    per stratum per task cross the wire — the property that keeps
    exact-k viable when a stratum spans millions of rows."""
    import re

    p = plan(spark, sf_dir, "x_sample_stratified")
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.M)) == 1
    assert "row_number(), 3, Partial" in p


def test_q17_brand_filter_broadcasts(spark, sf_dir):
    """Q17's decorrelated plan: the brand-filtered part dim reaches the
    fact via BroadcastHashJoin, and the brand predicate is pushed into
    the part scan — the fact table is never joined unfiltered."""
    p = plan(spark, sf_dir, "q17_small_qty_revenue")
    assert "BroadcastHashJoin" in p
    pushed = p.split("PushedFilters:")
    assert any("Brand#12" in seg.splitlines()[0] for seg in pushed[1:])


def test_q18_topk_no_global_sort(spark, sf_dir):
    """Q18's ORDER BY ... LIMIT 100 must plan as TakeOrderedAndProject
    (per-partition heaps), never a global Sort+Exchange(range)."""
    p = plan(spark, sf_dir, "q18_large_volume_customers")
    assert "TakeOrderedAndProject" in p
    assert "rangepartitioning" not in p


def test_profile_is_single_scan(spark, sf_dir):
    """Five columns' null/distinct/min/max stats from ONE table scan:
    the multi-distinct fuses into a single Expand-based aggregate, and
    the unpivot to long form is a map-side Generate — never five jobs
    or five scans."""
    import re

    p = plan(spark, sf_dir, "x_profile_columns")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
    assert "Expand" in p


def test_quantize_is_narrow_jvm_only(spark, sf_dir):
    """Int8 quantization streams through the scan: no Exchange, no
    Python evaluation node — pure codegen'd array expressions."""
    p = plan(spark, sf_dir, "x_embed_quantize")
    assert "Exchange" not in p
    assert "Python" not in p and "BatchEval" not in p


def test_chunking_and_redaction_are_narrow(spark, sf_dir):
    """Corpus→training-sample transforms (chunking fan-out, PII
    scrub) must stream through the scan: Generate/regexp chains, no
    Exchange, no Python node."""
    for q in ("x_doc_chunks", "x_pii_redact"):
        p = plan(spark, sf_dir, q)
        assert "Exchange" not in p, q
        assert "Python" not in p, q


def test_grouped_map_is_arrow_single_shuffle(spark, sf_dir):
    """The per-group model fit runs as Arrow-batched grouped-map
    (FlatMapGroupsInPandas), one exchange on the group key, no
    row-at-a-time Python evaluation."""
    import re

    p = plan(spark, sf_dir, "x_group_trend_fit")
    assert "FlatMapGroupsInPandas" in p or "FlatMapGroupsInArrow" in p
    assert "BatchEvalPython" not in p
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.M)) == 1


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    """100 TB shuffle-join posture: when one side of a non-broadcast
    join carries a selective filter, Spark injects a runtime Bloom
    filter (bloom_filter_agg on the creation side, might_contain on
    the application side) so the big side drops non-joining rows
    BEFORE the shuffle. Thresholds here are forced because the test
    tables are tiny; at real scale the defaults trigger on their own.
    Result equivalence with the plain join is asserted alongside the
    plan shape."""
    from pyspark.sql import functions as F

    from mints_wind_data_ingestion_spark.plans.registry import tables

    t = tables(spark, sf_dir)
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB"
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = t["lineitem"].select("l_orderkey", "l_quantity")
        big = t["orders"].filter(F.col("o_totalprice") > 400000).select(
            "o_orderkey", "o_totalprice"
        )
        j = li.join(big, li.l_orderkey == big.o_orderkey)
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in p
        assert "might_contain" in p.lower() or "BloomFilterMightContain" in p
        filtered_count = j.count()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    plain = t["lineitem"].join(
        t["orders"].filter(F.col("o_totalprice") > 400000),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    assert filtered_count == plain.count()


def test_join_hints_control_strategy(spark, sf_dir):
    """Join-strategy control surface: hints override the planner's
    default — SHUFFLE_HASH avoids the sort phase of SMJ (right choice
    when one side is moderately small but above the broadcast
    threshold), MERGE forces SMJ. At 100 TB picking the join physical
    strategy per query is a first-class tuning lever."""
    from mints_wind_data_ingestion_spark.plans.registry import tables

    t = tables(spark, sf_dir)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = t["lineitem"].select("l_orderkey", "l_quantity")
        o = t["orders"].select("o_orderkey")
        sh = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        assert "ShuffledHashJoin" in sh._jdf.queryExecution().executedPlan().toString()
        mg = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        assert "SortMergeJoin" in mg._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_q10_pushes_filters_to_both_fact_scans(spark, sf_dir):
    """Q10's selective predicates live on two different fact tables —
    both must reach their parquet scans as pushed filters."""
    p = plan(spark, sf_dir, "q10_returned_items")
    pushed = [seg.splitlines()[0] for seg in p.split("PushedFilters:")[1:]]
    assert any("l_returnflag" in x for x in pushed)
    assert any("o_orderdate" in x for x in pushed)
    assert "TakeOrderedAndProject" in p


def test_window_suite_two_exchanges(spark, sf_dir):
    """w_window_suite computes 15 window columns with exactly TWO
    exchanges: all user_id-partitioned specs (ranking, lag/lead,
    running, trailing-range) share one shuffle; only the
    event_type-partitioned distribution trio adds the second."""
    import re

    p = plan(spark, sf_dir, "w_window_suite")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 2


def test_text_features_no_extra_scans(spark, sf_dir):
    """x_text_features fuses quality + lang-ID + fingerprint + TTR +
    the quantile gate: the quantile threshold side must join back by
    BROADCAST (never shuffling the corpus for a 1-row dimension)."""
    p = plan(spark, sf_dir, "x_text_features")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_decontaminate_is_inverted_index_join(spark, sf_dir):
    """x_decontaminate must join eval grams against the distinct train
    gram index on the hash key — an equi-join (hash or sort-merge or
    AQE-broadcast), NEVER a nested-loop/cartesian doc-by-doc compare."""
    p = plan(spark, sf_dir, "x_decontaminate")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or (
        "BroadcastHashJoin" in p
    )


def test_embed_standardize_broadcasts_dim_stats(spark, sf_dir):
    """x_embed_standardize joins cells against the dims-sized stats
    table by broadcast — the corpus-side explode never shuffles for
    the join (the per-vec regroup is the only corpus shuffle)."""
    p = plan(spark, sf_dir, "x_embed_standardize")
    assert "BroadcastHashJoin" in p


def test_q6_full_pushdown(spark, sf_dir):
    """Q6: all four predicates reach the parquet scan, and only the
    three referenced columns are read."""
    p = plan(spark, sf_dir, "q6_forecast_revenue")
    pushed = p.split("PushedFilters:")[1].splitlines()[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed
    rs = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in rs and "l_extendedprice" in rs


def test_zorder_stats_broadcasts_bounds(spark, sf_dir):
    """x_zorder_stats: corpus bounds are a 1-row broadcast onto the
    scan (never a shuffle of events for the bounds), and the z-value
    is pure expressions — no Python stage anywhere in the plan."""
    p = plan(spark, sf_dir, "x_zorder_stats")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "Python" not in p and "Arrow" not in p
