"""LLM-data-pipeline queries: dedup, quality, fingerprints (SURVEY.md §2.J)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insight_spark.operators.dedup import exact_dedup, near_dedup_minhash
from insight_spark.queries import query
from insight_spark.sources import load_table


@query(
    "dedup_hash",
    oracle="""
    SELECT sha256(text) AS content_sha256,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_dups
    FROM documents
    GROUP BY sha256(text)
    """,
)
def dedup_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup of documents (J5): sha256 group, keep min id."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, content_col="text", id_col="doc_id")


@query("minhash_near_dup_pairs")  # rows-only: sketch-dependent candidates
def minhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, exact-verified (J6).

    Candidate generation is sketch-dependent (not SQL-oracle-hashable);
    the verification step is exact Jaccard, property-tested in pytest.
    """
    docs = load_table(spark, sf_dir, "documents")
    return near_dedup_minhash(docs, threshold=0.5)
