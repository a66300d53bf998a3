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

Size-gated local solve: when the (deduplicated, symmetrized) edge set
is small enough to fit a bounded driver budget, the rounds are skipped
entirely and the components come from one Arrow pull + union-find.
This is the Kiveris paper's own termination move — contract the graph
until it fits on one machine, then finish locally — applied at round
zero when the graph ALREADY fits. Near-dup pair sets are orders of
magnitude smaller than the corpus (only documents with at least one
candidate match appear), so in practice most dedup runs take this
path; a 100 TB corpus with billions of pairs exceeds the gate and gets
the full O(log² n) distributed rounds. The pull is bounded by
construction — LIMIT (LOCAL_SOLVE_EDGES + 1) rows ≈ 16 MB of Arrow —
so the size check and the data pull are ONE narrow job (no
symmetrize shuffle, no checkpoint, no separate count; r6), the same
bounded-pull posture as the IVF trainer's seed sample.
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

#: raw-edge count at or below which components are solved driver-side
#: with union-find instead of distributed star rounds. 1M edges = two
#: int64 columns ≈ 16 MB over Arrow and well under a second of
#: union-find — cheaper than even ONE distributed round's two
#: shuffles + checkpoint + probe. Above it, the shuffle rounds are
#: the only shape that scales.
LOCAL_SOLVE_EDGES = 1_000_000


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
    local_solve_edges: int | None = None,
) -> DataFrame:
    """Return (node, component) where component is the minimum node id
    in the node's connected component. Nodes appearing only in
    self-loops (or not at all) are the caller's concern — join the
    result back to the entity table and coalesce to the node's own id
    (`dedup_clusters` does exactly that).

    Edge sets at or below `local_solve_edges` (default
    LOCAL_SOLVE_EDGES) are solved with one bounded Arrow pull +
    union-find; larger graphs run the alternating large-star /
    small-star rounds (convergence = a round that changes nothing,
    checked with one scalar action per round). Both paths produce the
    identical (node, min-id component) mapping — pinned by
    tests/test_graph.py, whose shape cases run both paths and assert
    they agree.
    """
    # Every round's groupBy/join/distinct materializes EAGERLY via
    # localCheckpoint, so the session's shuffle.partitions applies to
    # each of the O(log² n) rounds. Under a driver-owned session that
    # default (200) means 200 tasks per tiny intermediate — scope the
    # conf to the loop (restored in finally) and size it to the actual
    # parallelism; at real scale callers size it to the edge volume.
    threshold = LOCAL_SOLVE_EDGES if local_solve_edges is None else local_solve_edges
    sess = edges.sparkSession
    key = "spark.sql.shuffle.partitions"
    old = sess.conf.get(key)
    sess.conf.set(key, str(sess.sparkContext.defaultParallelism))
    try:
        raw = edges.select(
            F.col(src).alias("u"), F.col(dst).alias("v")
        ).filter(F.col("u") != F.col("v"))
        if threshold > 0:
            # probe-pull (r6): LIMIT threshold+1 in ONE narrow job — no
            # symmetrize shuffle, no checkpoint, no separate count. If
            # everything came back, the whole edge set is already in
            # the driver's hands and union-find finishes it (raw
            # duplicates/orientations are harmless to union-find, so
            # the distinct the old path paid for is skipped too). Only
            # a genuinely big graph falls through — paying one partial
            # scan for the probe, noise next to its O(log² n) rounds;
            # callers that KNOW they're huge pass local_solve_edges=0
            # to skip the probe entirely.
            # Caller contract: the probe counts RAW rows, so an edge
            # list with >threshold duplicate rows over a tiny distinct
            # edge set takes the distributed path (correct, just not
            # the local fast path) and the pull may hold threshold+1
            # duplicates. Every in-repo producer (dedup pair gens)
            # emits near-deduped canonical pairs; a duplicate-heavy
            # caller should .distinct() first or pass
            # local_solve_edges=0.
            pdf = raw.limit(threshold + 1).toPandas()
            if len(pdf) <= threshold:
                return _cc_local(sess, pdf)
        e = _symmetrize(raw, "u", "v").localCheckpoint()
        sig = _edge_signature(e)
        return _cc_rounds(e, sig, max_rounds)
    finally:
        sess.conf.set(key, old)


def _cc_local(sess, pdf) -> DataFrame:
    """Union-find over a bounded raw-edge pull (pandas DataFrame of
    (u, v), self-loops already filtered; duplicates and either
    orientation are fine — union is idempotent and symmetric).

    Path-halving union-find with union-by-min so every root IS its
    component's minimum id — bit-identical to the star rounds'
    fixpoint. Output is created through Arrow, so the driver
    round-trip is columnar both ways.
    """
    import pandas as pd

    schema = "node long, component long"
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(pdf["u"].to_numpy(), pdf["v"].to_numpy()):
        u, v = int(u), int(v)
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            # union-by-min: smaller root wins, so the final root of
            # every class is the component minimum
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    if not parent:
        return sess.createDataFrame([], schema)
    nodes = sorted(parent)
    out = pd.DataFrame(
        {"node": nodes, "component": [find(n) for n in nodes]},
        dtype="int64",
    )
    return sess.createDataFrame(out, schema=schema)


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


def _cc_rounds(e: DataFrame, sig: tuple, max_rounds: int) -> DataFrame:
    """Distributed star rounds over an already-symmetrized,
    checkpointed edge set with its initial signature."""
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
    local_solve_edges: int | None = None,
) -> DataFrame:
    """Cluster assignment for EVERY entity: near-dup pairs → connected
    components → (id, cluster_id, is_representative). Singletons (no
    pair) form their own cluster. The keep-list of a dedup pipeline is
    `filter(is_representative)`.

    The component table is tiny relative to the corpus (only entities
    that matched a pair), so the join back is broadcast-eligible and
    the full corpus is never shuffled.
    """
    comp = connected_components(
        pairs, src=pair_a, dst=pair_b, local_solve_edges=local_solve_edges
    )
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
