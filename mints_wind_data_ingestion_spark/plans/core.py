"""Core reference-parity queries (SURVEY.md §2.1-§2.8).

Each query maps a reference operator onto the driver testdata
(FIXTURES.md §B: `events.ts` ↔ recorded_time, `events.event_type` ↔
parameterNumber U/V analog, `events.value` ↔ grid-cell value,
`events.props` ↔ header jsonb). TPC-H-ish tables drive the generic
relational surface.

Scale notes are attached per query; the common posture: aggregations are
hash-aggregates with map-side partial combine, dimension joins broadcast
the small side, top-k never globally sorts (TakeOrderedAndProject), and
all double reductions run through DECIMAL then cast back so results are
bit-stable regardless of partition count or accumulation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.time import bucket_3h, bucket_6h, fmt_recorded_time
from .registry import query, tables

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB oracle dialect)
# ---------------------------------------------------------------------------

#: timezone-free epoch bucketing — identical semantics to
#: functions.time.bucket() on the Spark side.
_DUCK_BUCKET_3H = (
    "TIMESTAMP '1970-01-01' + to_seconds(CAST(floor(epoch(ts)/10800)*10800 AS BIGINT))"
)
_DUCK_BUCKET_6H = (
    "TIMESTAMP '1970-01-01' + to_seconds(CAST(floor(epoch(ts)/21600)*21600 AS BIGINT))"
)


def _dsum(col: str) -> F.Column:
    """Deterministic sum of a double column: exact DECIMAL accumulation,
    one final rounding to DOUBLE. Bit-stable under any partitioning."""
    return F.sum(F.col(col).cast("decimal(18,4)")).cast("double")


# ---------------------------------------------------------------------------
# flagship — Phase 0 slice (SURVEY.md §7): latest wind field per bucket
# ---------------------------------------------------------------------------


@query(
    "flagship_latest_by_bucket",
    oracle=f"""
    SELECT bucket_ts, event_type, event_id, ts, value
    FROM (SELECT *, {_DUCK_BUCKET_3H} AS bucket_ts FROM events)
    QUALIFY row_number() OVER (
        PARTITION BY bucket_ts, event_type
        ORDER BY ts DESC, event_id DESC) = 1
    """,
    tags=("A1", "C2", "F3"),
)
def flagship_latest_by_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins dedup per 3 h observation bucket per component —
    the reference's core question (converter.py:129 bucketing +
    converter.py:96-104 latest-wins upsert), events-table analog.

    Spark shape: one aggregate with `max_by` over a (ts, event_id)
    total order — partial aggregation map-side, ONE shuffle carrying
    only per-partition winners. (The physical operator is
    SortAggregate, not HashAggregate — struct-typed buffers aren't
    hash-aggregable — but the partial/final split is what matters:
    the shuffle stays ≤|groups| rows per partition.) At 100 TB this
    beats the row_number() formulation, which shuffles EVERY row into
    a Window sort; the oracle uses row_number only because it reads
    better in SQL. Plan shape pinned by tests/test_plans.py.
    """
    ev = tables(spark, sf_dir)["events"]
    ordering = F.struct(F.col("ts"), F.col("event_id"))
    payload = F.struct(F.col("event_id"), F.col("ts"), F.col("value"))
    return (
        ev.withColumn("bucket_ts", bucket_3h("ts"))
        .groupBy("bucket_ts", "event_type")
        .agg(F.max_by(payload, ordering).alias("latest"))
        .select(
            "bucket_ts",
            "event_type",
            F.col("latest.event_id").alias("event_id"),
            F.col("latest.ts").alias("ts"),
            F.col("latest.value").alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# filters / projections (F1-F5)
# ---------------------------------------------------------------------------


@query(
    "f1_conjunctive_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity < 10 AND l_discount >= 0.05
    """,
    tags=("F1", "F2"),
 driver=False)
def f1_conjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive equality/range predicate + projection — the grib2json
    record filter `--fp 2 --fs 103 --fv 10.0` (converter.py:49-53).

    All three predicates push down to the parquet scan (PushedFilters)
    and only 5 of 11 columns are read (ReadSchema) — the Spark analog of
    the decoder evaluating filters before materializing data arrays.
    """
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(
            (F.col("l_returnflag") == "R")
            & (F.col("l_quantity") < 10)
            & (F.col("l_discount") >= 0.05)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@query(
    "f3_computed_columns",
    oracle=f"""
    SELECT event_id, ts,
           {_DUCK_BUCKET_3H} AS bucket_3h,
           {_DUCK_BUCKET_6H} AS bucket_6h,
           strftime(ts, '%Y-%m-%d %H:00:00') || '+00' AS recorded_time_text
    FROM events
    """,
    tags=("F3", "C1", "C2", "C4"), driver=False)
def f3_computed_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed-column enrichment (converter.py:63-69): 3 h observation
    bucket, 6 h run-cycle bucket, and the reference's exact
    'YYYY-MM-DD HH:00:00+00' text form — one narrow projection, zero
    shuffles, fully codegen'd."""
    ev = tables(spark, sf_dir)["events"]
    return ev.select(
        "event_id",
        "ts",
        bucket_3h("ts").alias("bucket_3h"),
        bucket_6h("ts").alias("bucket_6h"),
        fmt_recorded_time("ts").alias("recorded_time_text"),
    )


@query(
    "f5_retention_window",
    oracle="""
    SELECT event_id, ts, event_type, value
    FROM events
    WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAY
    """,
    tags=("F5", "C7"),
 driver=False)
def f5_retention_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day retention predicate (deleteOld.py:9), anchored on max(ts)
    for determinism instead of now().

    The anchor is a scalar subquery → broadcast; on a date-partitioned
    table this predicate is partition pruning, not a scan-filter.
    """
    ev = tables(spark, sf_dir)["events"]
    anchor = ev.agg(F.max("ts").alias("mx"))
    return (
        ev.join(F.broadcast(anchor))
        .filter(F.col("ts") >= F.col("mx") - F.expr("INTERVAL 7 DAYS"))
        .select("event_id", "ts", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# joins (J1-J5)
# ---------------------------------------------------------------------------


@query(
    "j1_uv_component_join",
    oracle=f"""
    WITH latest AS (
        SELECT bucket_ts, user_id, event_type, value
        FROM (SELECT *, {_DUCK_BUCKET_3H} AS bucket_ts FROM events
              WHERE event_type IN ('click', 'view'))
        QUALIFY row_number() OVER (
            PARTITION BY bucket_ts, user_id, event_type
            ORDER BY ts DESC, event_id DESC) = 1
    )
    SELECT u.bucket_ts, u.user_id,
           u.value AS u_value, v.value AS v_value,
           sqrt(u.value * u.value + v.value * v.value) AS magnitude
    FROM latest u JOIN latest v
      ON u.bucket_ts = v.bucket_ts AND u.user_id = v.user_id
    WHERE u.event_type = 'click' AND v.event_type = 'view'
    """,
    tags=("J1", "J2", "C14", "A1"),
 driver=False)
def j1_uv_component_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U⋈V component alignment (converter.py:88 + §1.2): pair the latest
    'click' (U) and 'view' (V) value per (3 h bucket, user) and derive the
    vector magnitude — the wind-speed computation (C14).

    Spark shape: one pass builds BOTH components via conditional
    max_by aggregation — no self-join at all. The naive plan (dedup,
    then U-side join V-side) scans and shuffles events twice; this
    formulation is one scan + one shuffle, and the join disappears.
    """
    ev = tables(spark, sf_dir)["events"]
    filtered = ev.filter(F.col("event_type").isin("click", "view"))
    ordering = F.struct(F.col("ts"), F.col("event_id"))
    pick = lambda t: F.max_by(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("value")),
        F.when(F.col("event_type") == t, ordering),
    )
    return (
        filtered.withColumn("bucket_ts", bucket_3h("ts"))
        .groupBy("bucket_ts", "user_id")
        .agg(pick("click").alias("u_value"), pick("view").alias("v_value"))
        .filter(F.col("u_value").isNotNull() & F.col("v_value").isNotNull())
        .select(
            "bucket_ts",
            "user_id",
            "u_value",
            "v_value",
            F.sqrt(F.col("u_value") * F.col("u_value") + F.col("v_value") * F.col("v_value")).alias(
                "magnitude"
            ),
        )
    )


@query(
    "j5_dim_enrichment",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           count(*) AS customer_cnt,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    tags=("J5", "A2"), driver=False)
def j5_dim_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code→name dimension enrichment (grib2json --names, SURVEY.md J5):
    broadcast-hash-join the fact against two tiny dims, then aggregate.

    Both dims are explicitly broadcast — at 100 TB the customer side
    never shuffles for the join; the only shuffle is the final
    aggregation on (region, nation), which partial-aggregates map-side
    first.
    """
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("customer_cnt"),
            _dsum("c_acctbal").alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# aggregation / sort / top-k (A2, A3/O1, grid stats)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A2", "agg", "bench"),
 driver=False)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary aggregate (TPC-H Q1 shape) — the 'grid statistics'
    class of SURVEY.md §2.4: wide scan → hash aggregate on a tiny key
    space.

    Scale: predicate pushes to parquet; partial aggregation reduces each
    map task to ≤6 rows before the single shuffle; DECIMAL accumulation
    makes the sums independent of partition order.
    """
    li = tables(spark, sf_dir)["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(18,4)")).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    tags=("J5", "A2", "O1", "bench"),
 driver=False)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join analytics (TPC-H Q3 shape): selective dimension
    filter → fact join → aggregate → top-k. The join-planning stress
    query of the bench set.

    Scale shape: the filtered customer side broadcasts (hash join, no
    fact shuffle); orders⋈lineitem is the one real shuffle pair and AQE
    re-plans it if the filtered orders side turns out broadcastable;
    both date predicates push to the parquet scans; the final top-10 is
    TakeOrderedAndProject (per-partition heaps, no global sort).
    DECIMAL-backed revenue keeps the hash order-insensitive.
    """
    t = tables(spark, sf_dir)
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = t["lineitem"].filter(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("J5", "A2", "bench"),
 driver=False)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way join (TPC-H Q5 shape): local-supplier revenue per nation
    — the deepest join-planning stress in the bench set, including the
    non-key equality c_nationkey = s_nationkey that correlates two
    dimension branches.

    Scale shape: region⋈nation⋈supplier collapses into one broadcast
    dimension (supplier is dimension-sized at any SF; nation/region are
    tiny); lineitem⋈orders is the one shuffle pair on orderkey, then
    one shuffle on custkey joins customer; the local-supplier equality
    is evaluated as a post-join filter on broadcast-side columns, never
    a shuffle key. Date predicate pushes to the orders scan. DECIMAL
    accumulation keeps the hash order-insensitive.
    """
    t = tables(spark, sf_dir)
    supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    cust = t["customer"].select("c_custkey", "c_nationkey")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l.l_shipdate) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
            OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("J5", "A2"),
 driver=False)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume (TPC-H Q7 shape): the same dimension
    table joined twice under different roles, with a disjunctive
    cross-branch predicate.

    Scale shape: nation broadcasts twice (aliased n1/n2); the
    nation-name filters are pushed INTO each broadcast side before the
    join — the disjunction then only pairs the two surviving names, so
    the fact side is pre-filtered by two broadcast semi-join-like hash
    joins rather than scanned into a blowup. lineitem⋈orders and
    ⋈customer are the two fact shuffles; year() is a codegen'd scalar.
    """
    t = tables(spark, sf_dir)
    pair = ("NATION_20", "NATION_11")
    n1 = t["nation"].filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = t["supplier"].join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    ).select("s_suppkey", "supp_nation")
    cust = t["customer"].join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    ).select("c_custkey", "cust_nation")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@query(
    "a2_bucket_counts",
    oracle=f"""
    SELECT {_DUCK_BUCKET_6H} AS bucket_ts,
           count(*) AS event_cnt,
           count(DISTINCT user_id) AS user_cnt
    FROM events GROUP BY 1
    """,
    tags=("A2", "C1"), driver=False)
def a2_bucket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence/count check per run-cycle bucket (converter.py:161
    `len(check_data_json)` generalized): count + distinct count.

    count(DISTINCT) expands to a two-phase aggregate; with AQE the
    partial phase coalesces. For approximate pipelines at 100 TB,
    `approx_count_distinct` (HLL) trades exactness for one phase.
    """
    ev = tables(spark, sf_dir)["events"]
    return (
        ev.withColumn("bucket_ts", bucket_6h("ts"))
        .groupBy("bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            F.countDistinct("user_id").alias("user_cnt"),
        )
    )


@query(
    "a3_argmax_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate
    FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey
        ORDER BY o_totalprice DESC, o_orderkey DESC) = 1
    """,
    tags=("A3", "O1", "A1"),
 driver=False)
def a3_argmax_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match selection over an ordered candidate set
    (converter.py:134-181: newest available file wins) — per-key argmax
    as one hash aggregate (`max_by`), not a window sort."""
    orders = tables(spark, sf_dir)["orders"]
    ordering = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    payload = F.struct("o_orderkey", "o_totalprice", "o_orderdate")
    return (
        orders.groupBy("o_custkey")
        .agg(F.max_by(payload, ordering).alias("best"))
        .select("o_custkey", "best.o_orderkey", "best.o_totalprice", "best.o_orderdate")
    )


@query(
    "o1_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    tags=("O1", "topk"),
 driver=False)
def o1_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered scan with early termination (converter.py:134-181):
    global top-k. Spark plans this as TakeOrderedAndProject — each
    partition keeps a k-heap, the driver merges k×partitions rows;
    no global sort ever materializes."""
    orders = tables(spark, sf_dir)["orders"]
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .limit(10)
    )


@query(
    "q17_small_qty_revenue",
    driver=False,
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN part_avg a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12'
      AND l.l_quantity < 0.2 * a.avg_qty
    """,
    tags=("J5", "A1", "bench"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): the correlated
    scalar subquery `l_quantity < 0.2 * (SELECT avg(l_quantity) ...
    WHERE l_partkey = p_partkey)` re-expressed Spark-first as a
    pre-aggregation joined back to the fact — the standard decorrelation
    Catalyst itself would emit, made explicit so the join sides are
    controllable.

    Scale shape: the per-part average is a map-side-combining agg on
    l_partkey (narrow: two longs per part); the brand filter prunes
    part BEFORE its broadcast, so the fact scan is filtered by a
    broadcast hash join, and the avg table joins on the same partkey.
    DECIMAL accumulation on both sums keeps the value hash stable.
    avg is computed as decimal-sum / count rather than avg() so Spark
    and the oracle fold bit-identically.
    """
    t = tables(spark, sf_dir)
    li = t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice")
    part_avg = li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    brand = t["part"].filter(F.col("p_brand") == "Brand#12").select("p_partkey")
    return (
        li.join(F.broadcast(brand), F.col("l_partkey") == F.col("p_partkey"))
        .join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
                / F.lit(7.0)
            ).cast("double").alias("avg_yearly")
        )
    )


@query(
    "q18_large_volume_customers",
    driver=False,
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 250
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    tags=("J5", "A2", "O1", "bench"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18 shape): `o_orderkey IN
    (SELECT ... HAVING sum > N)` — an aggregation-driven semi-join.
    Spark-first the subquery IS the fact: aggregate lineitem once on
    orderkey, filter the aggregate (HAVING), and join the survivors
    to orders — the semi-join and the total-quantity column come from
    the same single pass instead of TPC-H's textbook double scan.

    Scale shape: one map-side-combining agg on l_orderkey; the
    surviving "big orders" table is tiny (HAVING prunes hard), so its
    join to orders broadcasts; customer joins on c_custkey (shuffle at
    real scale — dimension too big to ship; AQE may still elect
    broadcast at small SF). Top-100 with a unique tiebreaker plans as
    TakeOrderedAndProject, never a global sort.
    """
    t = tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey", F.col("q").cast("double").alias("total_qty"))
    )
    return (
        t["orders"]
        .join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            t["customer"].select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .limit(100)
    )


@query(
    "q10_returned_items",
    driver=False,
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    tags=("J5", "A2", "O1", "bench"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): top-20 customers by
    revenue lost to returns in one quarter — a 4-way join where the
    selective predicates live on BOTH fact tables (returnflag on
    lineitem, date range on orders), each pushed to its own scan.

    Scale shape: lineitem⋈orders shuffles on orderkey after both
    scans are pre-filtered; customer joins on custkey (dimension
    shuffle; AQE may broadcast at small SF); nation broadcasts. The
    top-20 (revenue DESC, custkey tiebreak) is TakeOrderedAndProject.
    """
    t = tables(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = t["customer"].select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    nat = t["nation"].select("n_nationkey", "n_name")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .limit(20)
    )


@query(
    "q6_forecast_revenue",
    driver=False,
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("F1", "A2", "bench"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue-change (TPC-H Q6 shape): the purest
    scan-filter-aggregate in the suite — every predicate pushes to the
    parquet scan, the aggregate partials to one row per task before
    the single-row exchange. The canonical 'is pushdown actually
    happening' probe at any scale."""
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q14_promo_revenue",
    driver=False,
    oracle="""
    SELECT CAST(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE)
           / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE) AS DOUBLE)
           AS promo_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    tags=("J5", "A2", "bench"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-effect ratio (TPC-H Q14 shape): conditional aggregate
    over a broadcast dimension join — two DECIMAL sums from one pass,
    ratio taken once at the end (never per-row division). The date
    window prunes the fact scan; part broadcasts at any SF."""
    t = tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    joined = li.join(
        F.broadcast(t["part"].select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0).cast("decimal(18,4)"))).cast("double")
            / F.sum(disc).cast("double")
        ).cast("double").alias("promo_pct")
    )
