"""Connected-components operator (operators.graph) — shape cases the
differential oracle can't isolate: chains (where naive min-label
flood-fill needs O(diameter) rounds), stars, disjoint components,
singletons, and duplicate/reversed edge input."""

from __future__ import annotations

from pyspark.sql import functions as F

from mints_wind_data_ingestion_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def _cc(spark, edges):
    """Run BOTH CC paths — the size-gated local union-find (default at
    these sizes) and the distributed star rounds (forced with
    local_solve_edges=0) — assert they agree, return the mapping."""
    df = spark.createDataFrame(edges, "src long, dst long")
    local = {
        r.node: r.component for r in connected_components(df).collect()
    }
    dist = {
        r.node: r.component
        for r in connected_components(df, local_solve_edges=0).collect()
    }
    assert local == dist
    return local


def test_cc_chain(spark):
    # 1-2-3-4-5-6-7-8: worst case for flood fill; large/small-star
    # collapses it in O(log^2) rounds.
    got = _cc(spark, [(i, i + 1) for i in range(1, 8)])
    assert got == {i: 1 for i in range(1, 9)}


def test_cc_two_components_and_star(spark):
    got = _cc(spark, [(10, 11), (11, 12), (20, 21), (20, 22), (20, 23)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 22: 20, 23: 20}


def test_cc_duplicate_and_reversed_edges(spark):
    got = _cc(spark, [(2, 1), (1, 2), (2, 3), (3, 2), (3, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_dedup_clusters_singletons_kept(spark):
    ents = spark.range(1, 8).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([(2, 5), (5, 6)], "id_a long, id_b long")
    out = {r.doc_id: (r.cluster_id, r.is_representative)
           for r in dedup_clusters(ents, pairs, "doc_id").collect()}
    assert out == {
        1: (1, True), 2: (2, True), 3: (3, True), 4: (4, True),
        5: (2, False), 6: (2, False), 7: (7, True),
    }
    # keep-list = representatives: exactly one survivor per cluster
    assert sum(1 for c, rep in out.values() if rep) == 5


def test_cc_empty_pairs(spark):
    ents = spark.range(3).select(F.col("id").alias("doc_id"))
    empty = spark.createDataFrame([], "id_a long, id_b long")
    out = dedup_clusters(ents, empty, "doc_id")
    assert out.filter(~F.col("is_representative")).isEmpty()
    assert out.count() == 3


def test_cc_matches_union_find_on_random_graph(spark):
    """Connected components on a 200-node pseudo-random graph (seeded
    LCG, ~160 edges) must agree exactly with a driver-side union-find
    — covers component shapes (cycles, trees, isolated chains) the
    hand-written cases don't."""
    state, edges = 12345, []
    for _ in range(160):
        state = (state * 6364136223846793005 + 1442695040888963407) % 2**64
        u = state % 200
        state = (state * 6364136223846793005 + 1442695040888963407) % 2**64
        v = state % 200
        if u != v:
            edges.append((u, v))

    parent = list(range(200))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent[find(u)] = find(v)
    expect = {}
    for n in {x for e in edges for x in e}:
        expect.setdefault(find(n), []).append(n)
    want = {n: min(members) for members in expect.values() for n in members}

    got = _cc(spark, edges)
    assert got == want


def test_sampling_is_partitioning_invariant(spark, sf_dir):
    """Deterministic sampling contract: membership is a pure function
    of the id — identical sample under any repartitioning (the
    property that makes samples reproducible across cluster sizes and
    engines)."""
    from mints_wind_data_ingestion_spark.operators.sampling import (
        hash_sample,
        mixture_sample,
        stratified_sample_exact,
    )
    from mints_wind_data_ingestion_spark.plans.registry import tables

    docs = tables(spark, sf_dir)["documents"]
    rates = {"en": 1.0, "de": 0.5, "fr": 0.25, "es": 0.25, "zh": 0.125}

    def ids(df):
        return sorted(r.doc_id for r in df.select("doc_id").collect())

    a, b = docs.repartition(13), docs.coalesce(1)
    assert ids(hash_sample(a, "doc_id", 0.3)) == ids(hash_sample(b, "doc_id", 0.3))
    assert ids(mixture_sample(a, "lang", "doc_id", rates)) == ids(
        mixture_sample(b, "lang", "doc_id", rates)
    )
    assert ids(stratified_sample_exact(a, ["source"], "doc_id", 2)) == ids(
        stratified_sample_exact(b, ["source"], "doc_id", 2)
    )


def test_cc_mega_star_skew_handled(spark):
    """A viral-duplicate mega-cluster makes the star center a hot key
    in the CC round's m(u) join (VERDICT r2 'Next round' #6). The
    engine's posture: AQE skew-join splitting (on in session.py)
    splits the hot partition at runtime — salting would tax EVERY
    round; AQE costs nothing when there is no skew. This test plants a
    100k-edge star, forces the shuffle-join path (no broadcast, tiny
    skew thresholds so the 100k-row key trips them at test scale) and
    asserts (a) components are exactly right and (b) the executed plan
    of the round's join shows the skew split fired ([skew=true] /
    AQEShuffleRead skewed)."""
    import pyspark.sql.functions as F

    from mints_wind_data_ingestion_spark.operators.graph import (
        _min_neighborhood,
        _symmetrize,
    )

    n = 100_000
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16KB")

        star = spark.range(1, n + 1).select(
            F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
        )
        # (a) the round's join, exactly as _cc_rounds builds it
        # (m checkpointed — the canonical-SMJ-shape requirement AQE's
        # skew rule has; see the operator comment)
        e = _symmetrize(star, "src", "dst").localCheckpoint()
        m = _min_neighborhood(e).localCheckpoint()
        large = (
            e.filter(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # collect() finalizes THIS DataFrame's AQE plan (a write wraps
        # the query in a separate execution whose plan we can't read)
        assert len(large.collect()) == n
        plan = large._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan or "isSkew=true" in plan, (
            "AQE skew split did not fire on the hot-key CC join:\n"
            + plan[:2000]
        )

        # (b) end-to-end correctness on the mega-star, distributed
        # rounds forced (the local gate would absorb 100k edges)
        comp = connected_components(star, local_solve_edges=0)
        bad = comp.filter(F.col("component") != 0).count()
        assert bad == 0
        assert comp.count() == n + 1
    finally:
        for k, v in saved.items():
            conf.set(k, v)
