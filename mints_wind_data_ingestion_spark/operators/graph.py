"""Connected components over a pair/edge DataFrame — the clustering
step of large-scale deduplication.

Near-dup detection (MinHash-LSH, SimHash, embedding cosine — see
`operators.dedup` / `operators.similarity`) emits PAIRS; an actual
dedup pipeline needs CLUSTERS: the transitive closure of the pair
graph, one representative kept per component. The reference pipeline
has no analogue (its upsert key is exact — `converter.py:108-117`
replaces rows by recorded_time); this operator is part of the mandated
LLM-training-pipeline surface.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the
published shuffle-native CC algorithm:

- large-star: every node points its LARGER neighbors at the minimum
  of its closed neighborhood;
- small-star: every node points its smaller-or-equal neighbors at
  that minimum.

Each round is one groupBy + one join (two shuffles on node ids, no
adjacency list ever materialized as an array), and the edge set
converges in O(log² n) rounds to a star forest: every node directly
attached to its component's minimum id. That round bound is what makes
this viable at 100 TB — min-label flood-fill needs O(diameter) rounds,
which on chain-shaped duplicate clusters (A≈B≈C≈…) is unbounded.

Driver involvement per round is one scalar action (the convergence
check — count of changed edges); `localCheckpoint` truncates lineage
so round N's plan does not replay rounds 1..N-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_clusters"]

#: edge-count above which the large-star round materializes m(u) so
#: AQE's skew rule can split a hot star-center key (see _cc_rounds).
#: Below it a hot key fits one task trivially and the extra
#: per-round materialization job would dominate (the convergence
#: signature already carries the count, so the gate is free).
SKEW_CHECKPOINT_EDGES = 50_000


def _symmetrize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Both directions, self-loops dropped, duplicates collapsed."""
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    return (
        fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _min_neighborhood(edges: DataFrame) -> DataFrame:
    """m(u) = min of u's closed neighborhood, from symmetric edges."""
    return edges.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """Return (node, component) where component is the minimum node id
    in the node's connected component. Nodes appearing only in
    self-loops (or not at all) are the caller's concern — join the
    result back to the entity table and coalesce to the node's own id
    (`dedup_clusters` does exactly that).

    Rounds alternate large-star and small-star on the live edge set;
    convergence = a round that changes nothing (checked with one
    count() per round — the only driver action, a scalar).
    """
    # Every round's groupBy/join/distinct materializes EAGERLY via
    # localCheckpoint, so the session's shuffle.partitions applies to
    # each of the O(log² n) rounds. Under a driver-owned session that
    # default (200) means 200 tasks per tiny intermediate — scope the
    # conf to the loop (restored in finally) and size it to the actual
    # parallelism; at real scale callers size it to the edge volume.
    sess = edges.sparkSession
    key = "spark.sql.shuffle.partitions"
    old = sess.conf.get(key)
    sess.conf.set(key, str(sess.sparkContext.defaultParallelism))
    try:
        return _cc_rounds(edges, src, dst, max_rounds)
    finally:
        sess.conf.set(key, old)


def _edge_signature(e: DataFrame):
    """(count, xxhash64-sum) of the edge set in ONE action — the cheap
    per-round convergence probe. Equality of signatures is confirmed
    with an exact set compare before stopping, so a (astronomically
    unlikely) hash collision can only cost one extra comparison, never
    a wrong result."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        # XOR, not SUM: order-independent, collision-resistant enough
        # for a probe, and cannot overflow under ANSI mode
        F.expr("bit_xor(xxhash64(u, v))").alias("h"),
    ).first()
    return row[0], row[1]


def _cc_rounds(
    edges: DataFrame, src: str, dst: str, max_rounds: int
) -> DataFrame:
    e = _symmetrize(edges, src, dst).localCheckpoint()
    sig = _edge_signature(e)
    for _ in range(max_rounds):
        # large-star: for v in N(u) with v > u attach v to m(u).
        # Keeping (u, m(u)) preserves connectivity of the star center.
        #
        # Above SKEW_CHECKPOINT_EDGES, m is localCheckpoint'd: a viral
        # mega-cluster makes its center a hot key in this join, and
        # AQE's OptimizeSkewedJoin only matches the canonical
        # SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) shape — with the
        # m-aggregate inlined between shuffle and join the rule cannot
        # fire; with m materialized both sides are plain scans and the
        # hot partition splits at runtime (pinned by
        # tests/test_graph.py::test_cc_mega_star_skew_handled). Below
        # the threshold the hot key fits one task and the extra
        # materialization job per round would dominate — the edge
        # count rides along free on the convergence signature.
        m = _min_neighborhood(e)
        if sig[0] > SKEW_CHECKPOINT_EDGES:
            m = m.localCheckpoint()
        large = (
            e.filter(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # e2 materializes: it has two consumers (m2 and the small-star
        # join) and recomputing the large-star join for each measures
        # slower than the extra checkpoint pass.
        e2 = _symmetrize(large, "u", "v").localCheckpoint()

        # small-star: for v in N(u) with v <= u attach v to m(u).
        # m2 stays inline: the small-star join's left side is keyed by
        # the LARGER endpoint of each edge, so a mega-star's rows key
        # by its (distinct) leaves, not its center — no hot key, no
        # need to pay a materialization for AQE's skew shape here.
        m2 = _min_neighborhood(e2)
        small = (
            e2.filter(F.col("v") < F.col("u"))
            .join(m2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m2.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        e3 = _symmetrize(small, "u", "v").localCheckpoint()

        sig3 = _edge_signature(e3)
        if sig3 == sig and e3.exceptAll(e).isEmpty():
            e = e3
            break
        e, sig = e3, sig3

    # star forest: every edge now touches its component min.
    return (
        e.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("component"))
        .select(F.col("u").alias("node"), "component")
    )


def dedup_clusters(
    entities: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Cluster assignment for EVERY entity: near-dup pairs → connected
    components → (id, cluster_id, is_representative). Singletons (no
    pair) form their own cluster. The keep-list of a dedup pipeline is
    `filter(is_representative)`.

    The component table is tiny relative to the corpus (only entities
    that matched a pair), so the join back is broadcast-eligible and
    the full corpus is never shuffled.
    """
    comp = connected_components(pairs, src=pair_a, dst=pair_b)
    return (
        entities.select(F.col(id_col))
        .join(F.broadcast(comp.withColumnRenamed("node", id_col)), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn(
            "is_representative", (F.col(id_col) == F.col("cluster_id"))
        )
    )
