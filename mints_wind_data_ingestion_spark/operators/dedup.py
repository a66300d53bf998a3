"""Deduplication operators — the LLM-training-pipeline extension surface
(SURVEY.md §2.11; BASELINE.json north_star).

Exact dedup, MinHash+LSH, SimHash, and n-gram Jaccard set-similarity
join over the `documents` table. Everything is built-in-function
composition (JVM-side, whole-stage codegen) — no Python UDFs anywhere,
because at 100 TB these are the hottest paths in the engine.

Scale design notes (local[32] tests, 1000-executor posture):

- MinHash signatures are ONE pass over each doc's shingle set
  (`aggregate` + element-wise `least`), not k passes — k×|shingles|
  hash evaluations fused into a single codegen'd expression.
- LSH banding turns the O(n²) pair space into an equi-join on
  (band_index, band_hash): a plain shuffle hash join that partitions by
  bucket. Only co-bucketed docs ever meet.
- The n-gram Jaccard join is the inverted-index form (explode shingles,
  equi-join on the shingle, count shared per pair): jaccard derives
  from |A∩B| and set sizes, so no pairwise array intersection is ever
  materialized. Same shape as PPJoin-style set-similarity joins.
- Skew: a shingle shared by m docs fans out m² pair rows. `prune_df`
  drops shingles above a document-frequency cap (stopword-like
  shingles carry no dedup signal but all of the skew).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import char_shingles, word_shingles  # noqa: F401

__all__ = [
    "exact_dedup",
    "minhash_signature",
    "lsh_candidate_pairs",
    "jaccard_similarity_join",
    "minhash_dedup_pairs",
    "simhash64",
    "simhash_fingerprints",
]

#: 2^63-1 — identity for element-wise min over xxhash64 values
_LONG_MAX = (1 << 63) - 1


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep one representative row per duplicate group (lowest id wins).

    groupBy on the content columns is a single shuffle with map-side
    partial aggregation; at scale, group on `sha2(content, 256)` instead
    so the shuffle key is 32 bytes rather than the document body.
    """
    others = [c for c in df.columns if c != id_col]
    return (
        df.groupBy(*cols)
        .agg(F.min_by(F.struct(id_col, *[c for c in others if c not in cols]),
                      F.col(id_col)).alias("__keep"),
             F.count(F.lit(1)).alias("copies"))
        .select(F.col(f"__keep.{id_col}").alias(id_col), *cols, "copies")
    )


def minhash_signature(shingles: Column, num_hashes: int = 128) -> Column:
    """MinHash signature (array<bigint> of length `num_hashes`) of a
    shingle-set column.

    One `aggregate` pass over the shingle array; per shingle, the k
    hash family is `xxhash64(i, shingle)` for i in 0..k-1, folded into
    the running signature with element-wise `least`. Distinct-ness of
    the input shingle set does not change the min, so callers may skip
    `array_distinct`.
    """
    ks = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    init = F.array_repeat(F.lit(_LONG_MAX).cast("bigint"), num_hashes)
    return F.aggregate(
        shingles,
        init,
        lambda acc, s: F.zip_with(
            acc,
            F.transform(ks, lambda i: F.xxhash64(i, s)),
            lambda a, b: F.least(a, b),
        ),
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    sig_col: str = "signature",
    bands: int = 24,
    rows_per_band: int = 6,
) -> DataFrame:
    """LSH banding: docs whose signatures agree on ALL rows of at least
    one band become a candidate pair (id_a < id_b, distinct).

    With b=24, r=6 the detection probability of a pair at jaccard j is
    1-(1-j^6)^24: ≈1.0 at j=0.9, ≈0.55 at j=0.6, ≈0.03 at j=0.3 — a
    sharp threshold around (1/b)^(1/r) ≈ 0.59. The self-join shuffles
    on (band, band_hash): only co-bucketed docs meet, never O(n²).
    """
    width = bands * rows_per_band
    buckets = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda j: F.xxhash64(
                    F.slice(F.col(sig_col), j * rows_per_band + 1, rows_per_band), j
                ),
            )
        ).alias("band", "band_hash"),
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    ), width


def jaccard_similarity_join(
    docs: DataFrame,
    id_col: str,
    shingle_col: str,
    threshold: float,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All-pairs set-similarity join: (id_a, id_b, jaccard) for every
    pair with shingle-set Jaccard ≥ threshold, id_a < id_b.

    Inverted-index plan: explode distinct shingles → self-equi-join on
    the shingle value → count co-occurrences per pair → jaccard =
    |A∩B| / (|A| + |B| - |A∩B|). Three shuffles total (explode join,
    pair groupBy, size join), each on a well-distributed key; the n²
    pair space is never enumerated. `max_doc_freq` drops
    stopword-shingles (df > cap) that contribute skew but no signal.
    """
    sets = docs.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(F.col(shingle_col)).alias("__sh"),
    ).withColumn("__n", F.size("__sh"))
    sizes = sets.select("__id", "__n")
    posting = sets.select("__id", "__n", F.explode("__sh").alias("__s"))
    if max_doc_freq is not None:
        freq = posting.groupBy("__s").agg(F.count(F.lit(1)).alias("__df"))
        posting = posting.join(
            freq.filter(F.col("__df") <= max_doc_freq).select("__s"), "__s"
        )
    a, b = posting.alias("a"), posting.alias("b")
    inter = (
        a.join(b, (F.col("a.__s") == F.col("b.__s")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__n").alias("n_a"),
            F.col("b.__n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return inter.select(
        "id_a", "id_b", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def minhash_dedup_pairs(
    docs: DataFrame,
    id_col: str,
    shingle_col: str,
    threshold: float,
    num_hashes: int = 144,
    bands: int = 24,
    rows_per_band: int = 6,
) -> DataFrame:
    """MinHash+LSH near-dup detection with exact verification:
    LSH proposes candidate pairs, a join back to the shingle sets
    computes TRUE jaccard, and only pairs ≥ threshold survive — so
    output precision is exact and only recall depends on (b, r).

    Verification cost is O(candidates), and with the band parameters
    tuned above the threshold knee, candidates ≈ true near-dup pairs.
    """
    assert bands * rows_per_band <= num_hashes
    sets = docs.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(F.col(shingle_col)).alias("__sh"),
    )
    sigs = sets.select(
        "__id", minhash_signature(F.col("__sh"), num_hashes).alias("signature")
    )
    cands, _ = lsh_candidate_pairs(
        sigs, "__id", "signature", bands=bands, rows_per_band=rows_per_band
    )
    sa = sets.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sh_a"))
    sb = sets.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__sh_b"))
    verified = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("__sh_a", "__sh_b"))
                / F.size(F.array_union("__sh_a", "__sh_b"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


def simhash64(shingles: Column) -> Column:
    """64-bit SimHash of a shingle/token array, as pure expressions.

    Classic Charikar scheme: hash each shingle to 64 bits, per bit
    position accumulate +1/-1, output bit = sign of the tally. One
    `aggregate` pass; the 64 tallies ride along as an array<int>.
    Near-duplicate docs land within a small Hamming distance.
    """
    bits = F.sequence(F.lit(0), F.lit(63))
    tallies = F.aggregate(
        shingles,
        F.array_repeat(F.lit(0), 64),
        lambda acc, s: F.zip_with(
            acc,
            F.transform(
                bits,
                # call_function: the Python shiftright wrapper rejects a
                # Column numBits; the SQL function accepts one
                lambda i: F.when(
                    F.call_function("shiftright", F.xxhash64(s), i).bitwiseAND(
                        F.lit(1)
                    )
                    == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1)),
            ),
            lambda a, b: a + b,
        ),
    )
    return F.aggregate(
        F.zip_with(
            tallies,
            bits,
            lambda t, i: F.when(
                t > 0, F.call_function("shiftleft", F.lit(1).cast("bigint"), i)
            ).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc.bitwiseOR(v),
    )


def simhash_fingerprints(
    docs: DataFrame, id_col: str, shingle_col: str
) -> DataFrame:
    """(id, simhash) fingerprint table; pair docs by Hamming distance
    downstream (e.g. band the 64 bits into 4×16 and equi-join — any
    pair within distance 3 shares at least one exact 16-bit band)."""
    return docs.select(
        F.col(id_col), simhash64(F.col(shingle_col)).alias("simhash")
    )
