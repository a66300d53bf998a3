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

__all__ = ["connected_components", "dedup_clusters", "page_rank"]

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

#: raw-edge count at or below which PageRank is solved driver-side
#: (one bounded probe-pull + the exact integer recurrence over edge
#: endpoints only — see _pr_local). 5 iterations x 1M edges is a few
#: seconds of dict arithmetic, cheaper than 5 rounds x 3 shuffles.
PR_LOCAL_SOLVE_EDGES = 1_000_000


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


def page_rank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    scale: int = 10**12,
    damping_pct: int = 85,
    checkpoint_every: int | None = None,
    local_solve_edges: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed link graph — the
    link-level quality prior real crawl-curation pipelines weight
    documents by (the CommonCrawl host/link-graph ranking slot). No
    reference analogue; part of the mandated LLM-pipeline surface.

    EXACT INTEGER ARITHMETIC: ranks live in units of `1/scale`
    (BIGINT), every division is integral (`div`), every sum is a
    BIGINT sum — so the result is bit-identical across engines,
    partition counts, and aggregation orders, and an ANSI-SQL oracle
    can replay it hash-exactly. Float PageRank cannot make that
    promise (sum order perturbs the low bits). The truncation error
    is ≤ iterations/scale per node — noise at scale=1e12 — and mass
    lost to truncation is never redistributed (deterministic by
    construction).

    Per iteration (the power-method step, all positive BIGINTs):

        base      = scale div N
        contrib(u)= r(u) div outdeg(u)            [outdeg > 0]
        agg(v)    = sum of contrib(u) over u→v
        dang      = sum of r(u) where outdeg(u) = 0
        r'(v)     = (15·base) div 100
                    + (85·(agg(v) + dang div N)) div 100

    Scale posture: `edges` and the degree table are computed once and
    re-joined every iteration (callers at scale should persist them
    pre-partitioned by `src`); the per-iteration shuffles are the
    contrib join on src and the groupBy(dst) — the latter is
    partial-aggregated map-side, so in-degree hubs (the skew case of
    real web graphs) combine before the shuffle; the dangling mass is
    a broadcast-1-row scalar join, never a collect. `checkpoint_every`
    truncates lineage via localCheckpoint for deep iteration counts
    (lazy plans stack otherwise); None keeps the whole plan lazy for
    oracle-replayed fixed small iteration counts.

    Size-gated local solve (the connected_components doctrine): edge
    sets at or below `local_solve_edges` (default
    PR_LOCAL_SOLVE_EDGES) take ONE bounded probe-pull — the CORPUS is
    never pulled: only edge endpoints evolve individually, while
    every edge-untouched node (no out-links, no in-links by
    construction) shares one closed-form rank, emitted as a literal
    in a broadcast-join pass over `nodes` with zero shuffles. Both
    paths replay the identical integer recurrence — pinned by
    tests/test_pagerank.py. Pass 0 to force the distributed rounds.
    NOTE the laziness change on the local path: the probe-pull, the
    node count, and the solve all run at DataFrame-CONSTRUCTION time
    (the jaccard_join_adaptive posture) — callers that build but
    never execute plans pay them anyway.
    Caller contract (as with connected_components): the probe counts
    RAW edge rows, and out-degree counts RAW rows too — feed a
    deduplicated edge list.

    Returns (id_col, rank_e, out_deg, in_deg): the final scaled rank
    and the degree columns the curation filters typically want.
    """
    n = nodes.select(F.col(id_col).alias("__pr_id"))
    e = edges.select(F.col(src).alias("__pr_s"), F.col(dst).alias("__pr_d"))
    gate = PR_LOCAL_SOLVE_EDGES if local_solve_edges is None else local_solve_edges
    if gate > 0:
        pdf = e.limit(gate + 1).toPandas()
        if len(pdf) <= gate:
            return _pr_local(n, pdf, id_col, iterations, scale)
    out_deg = e.groupBy("__pr_s").agg(F.count(F.lit(1)).alias("__pr_od"))
    in_deg = e.groupBy("__pr_d").agg(F.count(F.lit(1)).alias("__pr_idg"))
    cnt = n.agg(F.count(F.lit(1)).cast("long").alias("__pr_n"))

    ranks = (
        n.crossJoin(F.broadcast(cnt))
        .select(
            "__pr_id",
            F.expr(f"CAST({scale} AS BIGINT) div __pr_n").alias("__pr_r"),
        )
    )
    for it in range(iterations):
        with_deg = ranks.join(
            out_deg, ranks["__pr_id"] == out_deg["__pr_s"], "left"
        )
        dang = with_deg.filter(F.col("__pr_od").isNull()).agg(
            F.coalesce(F.sum("__pr_r"), F.lit(0)).cast("long").alias("__pr_dang")
        )
        contrib = with_deg.filter(F.col("__pr_od").isNotNull()).select(
            F.col("__pr_id").alias("__pr_cid"),
            F.expr("__pr_r div __pr_od").alias("__pr_c"),
        )
        agg = (
            e.join(contrib, e["__pr_s"] == contrib["__pr_cid"])
            .groupBy("__pr_d")
            .agg(F.sum("__pr_c").cast("long").alias("__pr_agg"))
        )
        ranks = (
            n.join(agg, n["__pr_id"] == agg["__pr_d"], "left")
            .crossJoin(F.broadcast(cnt))
            .crossJoin(F.broadcast(dang))
            .select(
                "__pr_id",
                F.expr(
                    f"(15 * (CAST({scale} AS BIGINT) div __pr_n)) div 100"
                    " + (85 * (coalesce(__pr_agg, CAST(0 AS BIGINT))"
                    " + (__pr_dang div __pr_n))) div 100"
                ).alias("__pr_r"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return (
        ranks.join(out_deg, ranks["__pr_id"] == out_deg["__pr_s"], "left")
        .join(in_deg, ranks["__pr_id"] == in_deg["__pr_d"], "left")
        .select(
            F.col("__pr_id").alias(id_col),
            F.col("__pr_r").alias("rank_e"),
            F.coalesce(F.col("__pr_od"), F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce(F.col("__pr_idg"), F.lit(0)).cast("long").alias("in_deg"),
        )
    )


def _pr_local(n_df: DataFrame, pdf, id_col: str, iterations: int,
              scale: int) -> DataFrame:
    """Driver-side replay of the exact integer recurrence over a
    bounded edge pull. Only edge endpoints get individual ranks; the
    (possibly enormous) set of edge-untouched nodes — all dangling
    with no in-links by construction — evolves as ONE closed-form
    scalar, so the output pass over `nodes` is a broadcast left join,
    no shuffle, and the corpus never reaches the driver."""
    from collections import defaultdict

    sess = n_df.sparkSession
    total = n_df.count()
    schema = f"__pr_lid long, rank_e long, out_deg long, in_deg long"
    if total == 0:
        return sess.createDataFrame([], schema).select(
            F.col("__pr_lid").alias(id_col), "rank_e", "out_deg", "in_deg"
        )
    srcs = [int(x) for x in pdf["__pr_s"]]
    dsts = [int(x) for x in pdf["__pr_d"]]
    out: dict[int, int] = defaultdict(int)
    idg: dict[int, int] = defaultdict(int)
    for s in srcs:
        out[s] += 1
    for t in dsts:
        idg[t] += 1
    touched = sorted(set(out) | set(idg))
    n_untouched = total - len(touched)
    base = scale // total
    r = {u: base for u in touched}
    r_u = base  # the shared rank of every edge-untouched node
    for _ in range(iterations):
        dang = sum(v for u, v in r.items() if u not in out)
        dang += n_untouched * r_u
        agg: dict[int, int] = defaultdict(int)
        for s, t in zip(srcs, dsts):
            agg[t] += r[s] // out[s]
        const = (15 * base) // 100
        dshare = dang // total
        r = {
            u: const + (85 * (agg[u] + dshare)) // 100 for u in touched
        }
        r_u = const + (85 * dshare) // 100
    rows = [(u, r[u], out.get(u, 0), idg.get(u, 0)) for u in touched]
    local = sess.createDataFrame(rows, schema)
    return (
        n_df.join(
            F.broadcast(local),
            n_df["__pr_id"] == local["__pr_lid"],
            "left",
        )
        .select(
            F.col("__pr_id").alias(id_col),
            F.coalesce(F.col("rank_e"), F.lit(r_u).cast("long"))
            .alias("rank_e"),
            F.coalesce(F.col("out_deg"), F.lit(0)).cast("long")
            .alias("out_deg"),
            F.coalesce(F.col("in_deg"), F.lit(0)).cast("long")
            .alias("in_deg"),
        )
    )
