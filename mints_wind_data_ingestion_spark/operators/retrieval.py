"""BM25 text retrieval — query-driven top-k search over a document
corpus, the standard lexical-retrieval primitive of LLM-data curation
(targeted subset extraction, retrieval-based decontamination checks,
nearest-duplicate triage by topic).

Scoring is Okapi BM25 (Robertson & Walker, SIGIR'94; the k1/b form
every search engine ships):

    score(q, d) = Σ_{t ∈ q}  idf(t) · tf(t,d)·(k1+1)
                             ─────────────────────────────────
                             tf(t,d) + k1·(1 − b + b·dl/avgdl)

    idf(t) = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )

Scale posture (100 TB) — the query terms are PLAN CONSTANTS, which
buys a shape no generic explode→groupBy retrieval plan can match:

- Corpus statistics in ONE partial-aggregating pass: a single global
  agg computes df(t) for every term (sum of per-doc contains flags),
  N, and Σdl — map-side combined, one tiny row out, broadcast back.
  No (doc, term) shuffle exists anywhere in the plan.
- Scoring is a fully NARROW projection: per-term tf comes from the
  per-row token array, per-query scores are generated columns, and a
  stack() unpivot emits (query_id, score) rows only for documents
  that matched ≥1 term of that query. Zero exchanges.
- Top-k per query uses the salted two-phase pattern: a first
  row_number over (query_id, id % salt_buckets) prunes each bucket to
  k rows IN PARALLEL, and only the surviving salt_buckets·k rows per
  query meet the final single-partition ranking. A naive
  Window.partitionBy(query_id) would funnel every matching document
  of a query through one reducer — the classic skew trap this
  operator exists to avoid. Callers gate salt_buckets on corpus size
  (below ~256 MB one reducer beats the extra stage; A/B 1.25 s vs
  1.47 s at sf0.1).
- Total: 2 corpus scans (stats + scoring; independent branches run
  concurrently — see BASELINE.md's scan-sharing negative result),
  one 1-row broadcast, and the bounded window exchange(s) — the
  explain('formatted') audit shows 2 exchanges / 1 broadcast / 0
  Python ops. The first explode-based implementation paid 7
  exchanges incl. a (doc, term) shuffle and measured 1.21 s at
  sf0.1 vs 1.11 s for this shape on a far noisier floor.
- Scores are emitted as `score_e6` (round(score·1e6) as bigint): the
  only non-exact arithmetic is ln() and the per-term double sum, both
  stable far past 1e-6, so results are engine-portable and
  differentially verifiable (same convention as the corr_e6 /
  zipf_slope_e6 surfaces).

Reference parity: the reference repo has no text retrieval; this is
part of the mandated beyond-reference LLM-pipeline surface (SURVEY.md
§2.11).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import token_count, tokens

__all__ = ["bm25_topk", "bm25_topk_table"]


def _salted_topk(
    scored: DataFrame, id_col: str, k: int, salt_buckets: int
) -> DataFrame:
    """Salted two-phase per-query top-k over (query_id, id, score_e6):
    phase 1 prunes each (query_id, id % salt_buckets) bucket to k rows
    in parallel, so only salt_buckets·k rows per query reach the final
    single-partition ranking — never every match of a hot query
    through one reducer. salt_buckets<=1 skips the pruning phase
    (callers gate on corpus size)."""
    if salt_buckets <= 1:
        pruned = scored
    else:
        # salt on xxhash64(id), not id itself: works for ANY id type
        # (string doc ids would fail pmod's numeric cast under ANSI),
        # and phase 1 is correct under any bucket assignment — it only
        # needs each bucket's top-k superset
        salted = scored.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("id")), F.lit(salt_buckets))
        )
        w1 = Window.partitionBy("query_id", "_salt").orderBy(
            F.col("score_e6").desc(), F.col("id").asc()
        )
        pruned = (
            salted.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= k)
            .drop("_salt", "_r1")
        )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score_e6").desc(), F.col("id").asc()
    )
    return (
        pruned.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select("query_id", F.col("id").alias(id_col), "score_e6", "rnk")
    )


def bm25_topk(
    docs: DataFrame,
    queries: Sequence[tuple[int, Sequence[str]]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    salt_buckets: int = 32,
) -> DataFrame:
    """Top-k BM25 matches per query → (query_id, id, score_e6, rnk).

    `queries` is [(query_id, terms)]; duplicate terms within a query
    are collapsed (classic BM25 with binary query-term frequency).
    Ties rank by ascending document id, so output is deterministic.
    """
    # k1/b are embedded into SQL strings via repr() below: a numpy
    # scalar (repr "np.float64(1.2)" under numpy 2.x) or Decimal would
    # produce unparsable SQL where the old F.lit() path accepted them —
    # coerce to plain float first, same as int() already does for qids
    k1, b = float(k1), float(b)
    qlist = [(int(qid), sorted(set(ts))) for qid, ts in queries]
    if len({qid for qid, _ in qlist}) != len(qlist):
        raise ValueError("bm25_topk: duplicate query_id in queries")
    terms = sorted({t for _, ts in qlist for t in ts})
    if not terms:
        raise ValueError("bm25_topk: queries contain no terms")

    def _boundary_pat(t: str) -> str:
        # a term is a whitespace-delimited TOKEN: whitespace inside it
        # (or an empty string) would make the regex semantics diverge
        # from tokens()/dl silently, and \E would break literal quoting
        if not t or "\\E" in t or any(c.isspace() for c in t):
            raise ValueError(f"bm25_topk: unsupported term {t!r}")
        return r"(?:^|\s)\Q" + t + r"\E(?:$|\s)"

    # The whole scoring plan is assembled as SQL STRINGS, not Column
    # trees: every Column operator costs py4j round-trips (~0.15 ms
    # each), and the per-term/per-query expression forest measured
    # 3 000+ round-trips ≈ 0.5 s of DRIVER latency per build (r6
    # cProfile). The strings parse JVM-side in a handful of calls and
    # produce the identical analyzed plan. All float literals carry
    # the D suffix — a bare `0.5` is DECIMAL in Spark SQL and would
    # silently change the arithmetic's type lattice.
    def _sql_str(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    # per-term tf as a codegen'd regexp count: zero-width lookahead at
    # a token boundary, so overlapping boundaries ("a a a") all count —
    # value-identical to counting exact matches in tokens(text), but
    # JVM-side whole-stage codegen instead of an interpreted per-element
    # HOF (the HOF variant measured 1.5 s vs ~0.5 s at sf0.1). \Q..\E
    # quotes the term so it is matched literally.
    def tf_sql(t: str) -> str:
        return (
            f"regexp_count(`{text_col}`, "
            + _sql_str("(?=" + _boundary_pat(t) + ")")
            + ")"
        )

    def has_sql(t: str) -> str:
        # df needs EXISTENCE, not the count: rlike stops at the first
        # match (interleaved A/B on the stats pass: 0.27 s vs 0.31 s
        # min-of-5 at sf0.1)
        return f"`{text_col}` RLIKE " + _sql_str(_boundary_pat(t))

    # pass 1 — corpus statistics, ONE map-side-combined global agg:
    # df per term (sum of tf>0 flags), N, Σdl; avgdl is an
    # exact-int ratio → bit-stable double
    toked = docs.selectExpr(
        f"`{id_col}` AS id",
        f"`{text_col}`",
        f"regexp_count(`{text_col}`, '\\\\S+') AS dl",
    )
    stats = toked.agg(
        F.expr("count(1) AS n_docs"),
        F.expr("CAST(sum(dl) AS DOUBLE) / count(1) AS avgdl"),
        *[
            F.expr(f"sum(CAST(({has_sql(t)}) AS LONG)) AS df_{i}")
            for i, t in enumerate(terms)
        ],
    )

    scored_wide = toked.crossJoin(F.broadcast(stats)).selectExpr(
        "id",
        "dl",
        "n_docs",
        "avgdl",
        *[f"df_{i}" for i in range(len(terms))],
        *[f"{tf_sql(t)} AS tf_{i}" for i, t in enumerate(terms)],
    )
    norm_sql = f"{k1!r}D * ({(1.0 - b)!r}D + {b!r}D * dl / avgdl)"

    def idf_sql(i: int) -> str:
        return f"ln((n_docs - df_{i} + 0.5D) / (df_{i} + 0.5D) + 1.0D)"

    # index lookup is a dict, not list.index: plan construction stays
    # O(total query terms), not O(T^2), for large ad-hoc term sets
    term_ix = {t: i for i, t in enumerate(terms)}

    def qscore_sql(ts: list[str]) -> str:
        # 0.0D + term1 + term2 … — identical association order to the
        # old Column fold, so scores are bit-for-bit unchanged
        parts = ["0.0D"]
        for t in ts:
            i = term_ix[t]
            parts.append(
                f"CASE WHEN tf_{i} > 0 THEN {idf_sql(i)} * tf_{i} "
                f"* {(k1 + 1.0)!r}D / (tf_{i} + {norm_sql}) "
                "ELSE 0.0D END"
            )
        return " + ".join(parts)

    def qmatched_sql(ts: list[str]) -> str:
        tfs = ", ".join(f"tf_{term_ix[t]}" for t in ts)
        return f"greatest({tfs}, 0) > 0"

    stack_args = ", ".join(
        f"{qid}L, CAST(round(({qscore_sql(ts)}) * 1000000.0D, 0) AS LONG), "
        f"({qmatched_sql(ts)})"
        for qid, ts in qlist
    )
    scored = (
        scored_wide.selectExpr(
            "id",
            f"stack({len(qlist)}, {stack_args}) "
            "AS (query_id, score_e6, matched)",
        )
        .filter("matched")
        .drop("matched")
    )

    return _salted_topk(scored, id_col, k, salt_buckets)


def bm25_topk_table(
    docs: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    term_col: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    salt_buckets: int = 32,
) -> DataFrame:
    """Top-k BM25 per query for a query TABLE → (query_id, doc_id,
    score_e6, rnk) — the posting-join complement to `bm25_topk`.

    `bm25_topk` bakes the terms into the plan (per-term generated
    columns) — unbeatable for a handful of ad-hoc queries but the plan
    grows with the term count. This variant takes `queries` as a
    DataFrame of (query_id, term) rows and scales to THOUSANDS of
    queries with a fixed-size plan:

    - explode tokens, broadcast-semi-prune against the distinct term
      set IMMEDIATELY (the corpus-sized explode never shuffles — only
      query-term hits survive to the (doc, term) tf aggregation);
    - N/avgdl from one tiny aggregation broadcast back; df as a
      window count over the PRUNED posting rows, so the corpus
      explode executes exactly once — two corpus scans total (stats +
      posting), matching the constant-term variant;
    - per-(doc, term) scores join the query table (broadcast — the
      query workload is the small side by construction), then sum per
      (query, doc) THROUGH DECIMAL(28,12): the term partials arrive
      shuffle-ordered, and a double sum would make score_e6 flip with
      partition count (the registry determinism contract);
    - salted two-phase top-k (`_salted_topk`).

    Same scoring math and output schema as `bm25_topk`; the pytest
    differential pins the two paths row-for-row equal on the shared
    workload. One semantic difference, inherent to the lazy input: a
    term that can never be a token (empty or whitespace-containing) is
    FILTERED rather than raised — a DataFrame's contents can't be
    validated at plan time, so the invalid-term contract is "ignored,
    by construction matches nothing" instead of ValueError.
    """
    from ..caching import managed_cache

    qterms = (
        queries.select(
            F.col(qid_col).alias("query_id"), F.col(term_col).alias("term")
        )
        # terms that cannot equal any whitespace token (see docstring)
        .filter(F.col("term").rlike(r"^\S+$"))
        .distinct()
    )
    toked = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col),
        token_count(text_col).alias("dl"),
    )
    # r15 pass-merging (guide §2.3/§2.4; VERDICT r14 next-round #2):
    # - the prune is a broadcast SEMI join against qterms directly — the
    #   old inner join needed its own distinct-terms aggregation (one
    #   more exchange + stage) purely to avoid row duplication, which
    #   the semi join rules out by construction;
    # - the pruned per-(doc, term) tf table is CACHED and df comes from
    #   a tiny groupBy(term) + broadcast join back. The old plan ran df
    #   as a window count over the full posting — every tf row of a
    #   term through ONE reducer (the hot-term funnel: at corpus scale
    #   "the"-class terms serialize millions of rows through a single
    #   task). Now only per-term partial counts cross the df exchange,
    #   nothing funnels, and the cache keeps the corpus explode at
    #   exactly one execution (the reason the window was chosen in r6).
    posting = managed_cache(
        toked.select(
            "id", "dl", F.explode(tokens(text_col)).alias("term")
        )
        .join(F.broadcast(qterms), "term", "semi")
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    stats = toked.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    dfreq = posting.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    with_df = posting.join(F.broadcast(dfreq), "term")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    term_score = idf * F.col("tf") * F.lit(k1 + 1.0) / (F.col("tf") + norm)
    pre_agg = with_df.crossJoin(F.broadcast(stats)).join(
        F.broadcast(qterms), "term"
    )
    if salt_buckets <= 1:
        # small-corpus gate (same gate that disables the salted
        # pruning phase): one explicit repartition(query_id) serves
        # BOTH the score aggregation (HashPartitioning(query_id)
        # satisfies ClusteredDistribution(query_id, id)) and the final
        # top-k window — the two exchanges collapse into one. Above
        # the gate the (query_id, id)-keyed aggregation keeps hot
        # queries spread, which is what the salted path needs.
        pre_agg = pre_agg.repartition("query_id")
    scored = pre_agg.groupBy("query_id", "id").agg(
        F.round(
            F.sum(term_score.cast("decimal(28,12)")).cast("double")
            * F.lit(1000000.0),
            0,
        ).cast("long").alias("score_e6")
    )
    return _salted_topk(scored, id_col, k, salt_buckets)
