"""Deduplication operators (SURVEY.md §2.J5/J6/J7; LLM-pipeline mandate).

Scale notes: exact dedup is one hash-shuffle on the content hash —
the 256-bit digest (16-64 bytes) shuffles instead of the document body
when only ids are needed.  MinHash near-dedup is the classic
shingle → signature → band-bucket pipeline: every step is a groupBy /
join on bounded keys, no driver state, no cross join; candidate
verification touches only same-bucket pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from insight_spark.operators.text import tokenize


def content_hash(c: Column) -> Column:
    """J5: deterministic content fingerprint (sha256 hex, oracle-parity)."""
    return F.sha2(c, 256)


def exact_dedup(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """J5: group byte-identical content, keep the min-id row.

    Returns (hash, keep_id, n_dups); join back on ``keep_id`` to
    materialize the surviving rows.
    """
    return (
        df.groupBy(content_hash(F.col(content_col)).alias("content_sha256"))
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count("*").alias("n_dups"),
        )
    )


def jaccard(a: Column, b: Column) -> Column:
    """J7: exact Jaccard similarity of two token arrays (as sets)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )


def minhash_signature(tokens: Column, n_hashes: int, seed: int = 42) -> Column:
    """J6: MinHash signature — array of per-seed minimum token hashes.

    Seeded hash family via xxhash64(token, seed_i); fully deterministic,
    computed rowwise JVM-side (no shuffle).
    """
    return F.array(
        *[
            F.array_min(
                F.transform(tokens, lambda t: F.xxhash64(t, F.lit(seed + i)))
            ).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    )


def near_dedup_minhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    n_bands: int = 4,
    threshold: float = 0.7,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """J6: MinHash+LSH near-duplicate pairs, exact-verified.

    shingles → minhash signature → band buckets → same-bucket candidate
    pairs (a<b) → exact token-set Jaccard verification ≥ threshold.
    Returns (a_id, b_id, jaccard_sim).  At scale every stage is a
    shuffle on bounded keys: band-bucket cardinality ~ corpus size, and
    the self-join happens per bucket, not globally.
    """
    rows_per_band = n_hashes // n_bands
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(tokenize(F.col(text_col))).alias("_tokens"),
    ).withColumn("_sig", minhash_signature(F.col("_tokens"), n_hashes, seed))

    bands = toks.select(
        "_id",
        "_tokens",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        *[
                            F.element_at(F.col("_sig"), b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ],
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("_band", "_bucket"),
    )

    left = bands.select(
        F.col("_id").alias("a_id"),
        F.col("_tokens").alias("_a_tokens"),
        "_band",
        "_bucket",
    )
    right = bands.select(
        F.col("_id").alias("b_id"),
        F.col("_tokens").alias("_b_tokens"),
        "_band",
        "_bucket",
    )
    cand = (
        left.join(right, ["_band", "_bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "_a_tokens", "_b_tokens")
        .dropDuplicates(["a_id", "b_id"])
    )
    sim = jaccard(F.col("_a_tokens"), F.col("_b_tokens"))
    return (
        cand.withColumn("jaccard_sim", F.round(sim, 6))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("a_id", "b_id", "jaccard_sim")
    )
