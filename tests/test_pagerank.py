"""operators.graph.page_rank — exact-integer fixed-iteration PageRank
(r14). The promise under test: bit-identical ranks regardless of
partitioning/aggregation order (scaled-BIGINT arithmetic), correct
dangling-mass redistribution, and hub-skew shapes that stay
map-side-combinable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mints_wind_data_ingestion_spark.operators.graph import page_rank

SCALE = 10**12


def _pr_reference(n, edges, iterations=5, scale=SCALE):
    """Driver-side replay of the exact integer recurrence."""
    from collections import defaultdict

    out = defaultdict(int)
    for s, _ in edges:
        out[s] += 1
    r = {i: scale // n for i in range(n)}
    for _ in range(iterations):
        dang = sum(v for k, v in r.items() if out[k] == 0)
        agg = defaultdict(int)
        for s, t in edges:
            agg[t] += r[s] // out[s]
        r = {
            i: (15 * (scale // n)) // 100
            + (85 * (agg[i] + dang // n)) // 100
            for i in range(n)
        }
    return r


@pytest.fixture(scope="module")
def triangle(spark):
    # 0→1, 1→2, 2→0 cycle + 3 dangling + 4→0 feeder
    edges = [(0, 1), (1, 2), (2, 0), (4, 0)]
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    return nodes, e, edges


def test_matches_exact_reference(spark, triangle):
    nodes, e, edges = triangle
    got = {
        r.id: (r.rank_e, r.out_deg, r.in_deg)
        for r in page_rank(nodes, e).collect()
    }
    want = _pr_reference(5, edges)
    assert {k: v[0] for k, v in got.items()} == want
    assert got[3] == (want[3], 0, 0)          # dangling node
    assert got[0][2] == 2                      # in-degree via feeder


def test_partitioning_invariance(spark, triangle):
    """Same ranks at 1 partition and 32 partitions — the integer
    arithmetic makes the result order-independent by construction."""
    nodes, e, _ = triangle
    one = page_rank(nodes.coalesce(1), e.coalesce(1)).collect()
    many = page_rank(
        nodes.repartition(32), e.repartition(32)
    ).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_hub_receives_dangling_and_mass(spark):
    """Star graph: every spoke feeds the hub; hub itself dangles.
    Hub rank must strictly dominate, and total mass stays within the
    truncation envelope (≤ iterations * n lost units)."""
    n = 50
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(
        [(i, 0) for i in range(1, n)], "src long, dst long"
    )
    rows = {r.id: r.rank_e for r in page_rank(nodes, e, iterations=3).collect()}
    assert rows[0] > max(v for k, v in rows.items() if k != 0) * 10
    total = sum(rows.values())
    assert total <= SCALE
    assert total >= SCALE - 4 * (3 + 1) * n * 100  # truncation-only loss


def test_checkpoint_path_identical(spark, triangle):
    nodes, e, edges = triangle
    base = page_rank(nodes, e, iterations=6).collect()
    ckpt = page_rank(nodes, e, iterations=6, checkpoint_every=2).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, ckpt))


def test_zero_iterations_uniform(spark, triangle):
    nodes, e, _ = triangle
    rows = page_rank(nodes, e, iterations=0).collect()
    assert {r.rank_e for r in rows} == {SCALE // 5}


def test_local_equals_distributed(spark):
    """The size-gated local solve and the distributed rounds replay
    the identical integer recurrence — the CC doctrine's equivalence
    pin, on a graph with every shape at once: cycle, dangling node,
    feeder, hub, and an edge-untouched (isolated) node."""
    n = 40
    edges = (
        [(i, (i + 1) % 10) for i in range(10)]        # cycle
        + [(i, 0) for i in range(10, 30)]             # hub feeders
        + [(30, 11), (31, 12)]                        # side links
    )  # nodes 32..39 untouched; 11, 12 dangle with in-links
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    loc = sorted(map(tuple, page_rank(nodes, e).collect()))
    dist = sorted(
        map(tuple, page_rank(nodes, e, local_solve_edges=0).collect())
    )
    assert loc == dist
    ref = _pr_reference(n, edges)
    assert {t[0]: t[1] for t in loc} == ref


def test_hypothesis_random_graphs_match_reference(spark):
    """Property: on arbitrary random digraphs the distributed-free
    local solve equals the pure-Python reference replay exactly —
    the integer recurrence leaves no rounding freedom."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=12, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        n=st.integers(2, 25),
        edges=st.lists(
            st.tuples(st.integers(0, 24), st.integers(0, 24)),
            max_size=60, unique=True,
        ),
        iters=st.integers(0, 4),
    )
    def prop(n, edges, iters):
        e = [(s, t) for s, t in edges if s < n and t < n and s != t]
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        edf = (
            spark.createDataFrame(e, "src long, dst long")
            if e
            else spark.createDataFrame([], "src long, dst long")
        )
        got = {
            r.id: r.rank_e
            for r in page_rank(nodes, edf, iterations=iters).collect()
        }
        assert got == _pr_reference(n, e, iterations=iters)

    prop()
