"""N-gram language-model perplexity scoring — the CCNet-class quality
filter (Wenzek et al. 2020: a small LM trained on a clean reference
corpus scores candidate documents; high perplexity → low quality).

From-scratch and fully distributed: the "model" is a bigram count
TABLE (a DataFrame — at 100 TB it is exactly the artifact a pipeline
persists and re-joins per batch, like the dedup signature table), and
scoring is one explode + two aggregate-derived joins — no per-row
Python, no driver-side model object:

- train: token bigrams of the reference corpus → groupBy count. The
  prefix (context) counts DERIVE from the bigram table by a second
  agg (c(w1) = Σ_w2 c(w1,w2)), so one shuffle builds both; the
  vocabulary size is one more map-side-combined distinct-count.
- score: add-k smoothed conditional P(w2|w1) = (c12 + k)/(c1 + k·V),
  joined per document bigram. Unseen contexts fall back to the
  uniform k/(k·V) = 1/V automatically through the left joins — no
  special UNK machinery, no row can produce log(0).

Determinism contract (registry rules): each bigram's ln P quantizes
to an e6 BIGINT BEFORE the per-document sum, so accumulation order
cannot perturb low bits; the document score is the exact integer mean
re-rounded to e4 (avg negative log-likelihood — the monotone
equivalent of perplexity, ppl = exp(nll)). ln() itself is the same
correctly-rounded libm call in Spark and DuckDB — the BM25 idf oracle
has pinned that parity across rounds.

No counterpart in the reference (a 278-LoC cron ETL); semantics follow
the public CCNet paper.

Scale shape: the bigram explode is ~1× token count (narrower than the
shingle pipelines' 9×); the score joins key on (w1, w2) / (w1) —
natural-language skew on common bigrams is bounded by the JOIN being
build-side-small per key (counts, not postings), and AQE handles the
residual. The model table is O(distinct bigrams) — broadcast-able for
reference corpora up to ~10M bigrams, shuffle-joined beyond.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["train_bigram_counts", "score_perplexity", "bigram_perplexity"]


def _bigrams(text: Column) -> Column:
    """Adjacent token pairs as array<struct<w1,w2>> — pure array
    expressions (transform over the token window, no UDF)."""
    toks = F.filter(
        F.split(F.coalesce(text, F.lit("")), r"\s+"), lambda t: t != ""
    )
    k = F.size(toks) - F.lit(1)
    # sequence(1, 0) is DESCENDING in Spark, not empty — guard k < 1
    return F.when(k < 1, F.expr("CAST(array() AS array<struct<w1:string,w2:string>>)")).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        )
    )


def train_bigram_counts(
    train_docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(bigram counts, prefix counts, 1-row vocab size) for the
    reference corpus — the persistable LM artifact. Prefix counts
    derive from the bigram table (one extra map-side-combinable agg,
    no second corpus pass); V counts distinct tokens over ALL
    positions (the standard vocabulary definition)."""
    pairs = train_docs.select(
        F.explode(_bigrams(F.col(text_col))).alias("bg")
    ).select("bg.w1", "bg.w2")
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    pre = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = train_docs.select(
        F.explode(
            F.filter(
                F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
                lambda t: t != "",
            )
        ).alias("w")
    ).agg(F.countDistinct("w").alias("v"))
    return big, pre, vocab


def score_perplexity(
    docs: DataFrame,
    big: DataFrame,
    pre: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.1,
    gate_nll_e4: int = 80_000,
) -> DataFrame:
    """Per-document (doc_id, n_bigrams, avg_nll_e4, lm_pass) under the
    add-k bigram model. avg_nll_e4 = round(mean of per-bigram
    round(-ln P · 1e6) / 100): integer-exact given the per-bigram
    quantization, so the result is bit-stable under any partitioning.
    Documents with no bigrams (empty/one token) score 0 and pass —
    length gates are a different filter's job (x_text_suite).
    `gate_nll_e4` is the CCNet-style cutoff: nll 8.0 ≈ ppl 3000."""
    add_k = float(add_k)
    dbg = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(_bigrams(F.col(text_col))).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    scored = (
        dbg.join(big, ["w1", "w2"], "left")
        .join(pre, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.when(
                F.col("w1").isNull(), F.lit(None).cast("bigint")
            ).otherwise(
                F.round(
                    -F.log(
                        (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(add_k))
                        / (F.coalesce(F.col("c1"), F.lit(0))
                           + F.lit(add_k) * F.col("v"))
                    ) * F.lit(1_000_000.0)
                ).cast("bigint")
            ).alias("nll_e6"),
        )
    )
    out = scored.groupBy("doc_id").agg(
        F.count("nll_e6").alias("n_bigrams"),
        F.round(
            F.coalesce(F.sum("nll_e6"), F.lit(0))
            / F.greatest(F.count("nll_e6"), F.lit(1)) / F.lit(100.0)
        ).cast("bigint").alias("avg_nll_e4"),
    )
    return out.withColumn(
        "lm_pass", F.col("avg_nll_e4") <= F.lit(gate_nll_e4)
    )


def bigram_perplexity(
    docs: DataFrame,
    train_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.1,
    gate_nll_e4: int = 80_000,
) -> DataFrame:
    """Train on `train_docs`, score `docs` — the CCNet shape (LM on a
    clean reference corpus, scores for the candidate corpus)."""
    big, pre, vocab = train_bigram_counts(train_docs, text_col)
    return score_perplexity(
        docs, big, pre, vocab, id_col=id_col, text_col=text_col,
        add_k=add_k, gate_nll_e4=gate_nll_e4,
    )
