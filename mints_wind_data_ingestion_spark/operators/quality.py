"""Repetition-based document quality features (Gopher-class filters).

The standard LLM-curation repetition gates — published in the Gopher
appendix (Rae et al. 2021, table A1) and reused by MassiveText/
FineWeb-class pipelines — measure how much of a document is the same
n-gram repeated:

- ``top{2,3}_char_e6`` — fraction of characters covered by the single
  most frequent word n-gram (count × gram length / total chars), the
  "most common 2-gram > 20%" style gate. Occurrences may overlap, so
  the ratio can exceed 1 for degenerate docs ("a a a a") — the
  standard definition, kept as-is (thresholds already account for it).
- ``dup5_char_e6`` — characters covered by all 5-grams occurring more
  than once (Σ count × length / total chars), the "duplicate 5-grams
  > 15%" gate.
- ``word_rep_e6`` — 1 − distinct/total words, a cheap whole-doc
  repetition summary.
- ``gopher_pass`` — the published thresholds applied (top-2 ≤ 0.20,
  top-3 ≤ 0.18, dup-5 ≤ 0.15).

Ratios are emitted as micro-units (``round(x * 1e6)`` BIGINT) so the
driver hash is integer-stable; numerators and denominators are exact
ints and both engines perform the identical IEEE multiply-then-divide.

Scale shape: ONE narrow projection builds all three gram families as
arrays (slice/transform expressions — no UDF), ONE explode, ONE
shuffle on (doc_id, n, gram) — well-distributed keys, map-side
combinable — then a second map-side-combinable agg back to doc_id.
Ties for the top gram resolve by the lexicographically largest gram
(max over struct(count, gram)), mirrored exactly in the SQL oracle's
``ORDER BY c DESC, gram DESC``. No driver pulls, no cartesian
anything; at 100 TB the explode multiplies rows ~3× word count per
doc, the same envelope as the shingle pipelines.

No counterpart in the reference (its 278-LoC cron ETL has no text
surface); the semantics follow the public Gopher paper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["repetition_features", "GOPHER_THRESHOLDS_E6"]

#: published Gopher gates in micro-units: top-2-gram 20%, top-3-gram
#: 18%, duplicate-5-gram 15% of characters
GOPHER_THRESHOLDS_E6 = {"top2": 200_000, "top3": 180_000, "dup5": 150_000}


def _grams(n: int) -> Column:
    """Tagged word n-grams as an array<struct<n,gram>> (empty when the
    doc is shorter than n words — sequence() would otherwise run
    backwards)."""
    return F.when(
        F.col("n_words") >= n,
        F.transform(
            F.sequence(F.lit(0), F.col("n_words") - n),
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", F.slice("ws", i + 1, n)).alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<n:int,gram:string>>"))


def repetition_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition features + the Gopher pass flag."""
    # greatest(n_chars, 1): an empty document must yield zero ratios in
    # BOTH engines, not ride each engine's own x/0 convention (Spark
    # NULL vs IEEE inf) into a hash divergence
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.greatest(F.length(text_col), F.lit(1)).alias("n_chars"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("ws"),
    ).select(
        "doc_id",
        "n_chars",
        F.size("ws").alias("n_words"),
        F.size(F.array_distinct("ws")).alias("n_distinct"),
        "ws",
    )
    # explode_OUTER: a doc too short for even one 2-gram must survive
    # to the output with zero ratios, not vanish from the corpus (the
    # null gram row groups under a null key and no branch counts it)
    ex = base.select(
        "doc_id", "n_chars", "n_words", "n_distinct",
        F.explode_outer(F.concat(_grams(2), _grams(3), _grams(5))).alias("g"),
    )
    # n_chars/n_words/n_distinct are functionally dependent on doc_id —
    # carrying them as group keys keeps the plan join-free
    counts = ex.groupBy(
        "doc_id", "n_chars", "n_words", "n_distinct",
        F.col("g.n").alias("n"), F.col("g.gram").alias("gram"),
    ).agg(F.count(F.lit(1)).alias("c"))
    per = counts.groupBy("doc_id", "n_chars", "n_words", "n_distinct").agg(
        F.max(F.when(F.col("n") == 2, F.struct("c", "gram"))).alias("t2"),
        F.max(F.when(F.col("n") == 3, F.struct("c", "gram"))).alias("t3"),
        F.sum(
            F.when(
                (F.col("n") == 5) & (F.col("c") > 1),
                F.col("c") * F.length("gram"),
            ).otherwise(F.lit(0))
        ).alias("dup5"),
    )

    def _e6(num: Column, den: Column) -> Column:
        return F.round(num * F.lit(1000000.0) / den).cast("bigint")

    out = per.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        _e6(F.col("n_words") - F.col("n_distinct"), F.col("n_words")).alias(
            "word_rep_e6"
        ),
        _e6(
            F.coalesce(F.col("t2.c") * F.length("t2.gram"), F.lit(0)),
            F.col("n_chars"),
        ).alias("top2_char_e6"),
        _e6(
            F.coalesce(F.col("t3.c") * F.length("t3.gram"), F.lit(0)),
            F.col("n_chars"),
        ).alias("top3_char_e6"),
        _e6(F.coalesce(F.col("dup5"), F.lit(0)), F.col("n_chars")).alias(
            "dup5_char_e6"
        ),
    )
    th = GOPHER_THRESHOLDS_E6
    return out.withColumn(
        "gopher_pass",
        (F.col("top2_char_e6") <= th["top2"])
        & (F.col("top3_char_e6") <= th["top3"])
        & (F.col("dup5_char_e6") <= th["dup5"]),
    )
