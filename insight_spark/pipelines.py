"""End-to-end job compositions — the reference's actual pipelines.

The reference (SURVEY.md §0.1) is a text search/suggestion ETL: Spark
batch jobs build a search index and suggestion tables into
Elasticsearch/PostgreSQL, and a Pulsar consumer keeps them fresh.  These
functions compose the oracled operators into those job shapes, so a
reference user's workloads map 1:1:

| reference job                  | here                         |
| ------------------------------ | ---------------------------- |
| corpus → ES search index       | ``build_search_index``       |
| term/suggestion table → PG     | ``build_suggestions``        |
| corpus hygiene (dedup + stats) | ``prepare_corpus``           |
| Pulsar consumer → serving      | ``streaming_ingest``         |

Each stage is a declarative DataFrame (lazy); callers pick the sink
(``sources.sinks``).  Every underlying operator is individually
DuckDB-oracled via the query registry; the compositions are tested in
tests/test_pipelines.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insight_spark.operators.dedup import exact_dedup, simhash_fingerprints
from insight_spark.operators.text import (
    doc_freq,
    normalize_text,
    tf_idf,
    tokenize,
    tokens_df,
)


def prepare_corpus(docs: DataFrame) -> DataFrame:
    """Corpus hygiene: exact-dedup, normalize, token/char stats, simhash.

    The LLM-data-pipeline front door: returns one row per surviving doc
    with ``text_norm``, ``tokens``, ``n_tokens``, ``n_chars``,
    ``simhash``.  Near-dup candidates come from grouping on simhash
    bands downstream.  One shuffle for dedup, one for simhash.
    """
    survivors = docs.join(
        exact_dedup(docs, "text", "doc_id").select(
            F.col("keep_id").alias("doc_id")
        ),
        "doc_id",
        "left_semi",
    )
    enriched = survivors.withColumn(
        "text_norm", normalize_text(F.col("text"))
    ).withColumn("tokens", tokenize(F.col("text_norm")))
    enriched = enriched.withColumn("n_tokens", F.size("tokens")).withColumn(
        "n_chars", F.length("text")
    )
    return enriched.join(simhash_fingerprints(docs), "doc_id", "left")


def build_search_index(docs: DataFrame) -> dict[str, DataFrame]:
    """The ES-index-build job: postings + per-doc weights + doc stats.

    Returns the three tables a search serving layer needs:
    ``postings`` (term → doc_id, tf·idf weight, for retrieval),
    ``doc_stats`` (doc_id → length norms, for scoring), ``vocabulary``
    (term → df, idf).  All shuffle on bounded keys (term / doc_id); the
    vocabulary side is broadcast-sized by construction.
    """
    weights = tf_idf(docs)
    postings = weights.select("token", "doc_id", "tf", "tf_idf")
    vocabulary = doc_freq(docs)
    doc_stats = (
        tokens_df(docs)
        .groupBy("doc_id")
        .agg(F.count("*").alias("doc_len"))
    )
    return {
        "postings": postings,
        "vocabulary": vocabulary,
        "doc_stats": doc_stats,
    }


def build_suggestions(docs: DataFrame, min_tf: int = 2) -> DataFrame:
    """The suggestion-table job: ranked completion candidates per prefix.

    Terms ranked by corpus frequency; the serving layer resolves a typed
    prefix against ``prefix1``/``prefix2`` (first 1-2 chars — the ES
    completion-suggester access pattern, emulated relationally).
    """
    tf = (
        tokens_df(docs)
        .groupBy("token")
        .agg(F.count("*").alias("tf"))
        .filter((F.col("tf") >= min_tf) & (F.length("token") >= 2))
    )
    return tf.select(
        "token",
        "tf",
        F.substring("token", 1, 1).alias("prefix1"),
        F.substring("token", 1, 2).alias("prefix2"),
    )


def streaming_ingest(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """The Pulsar-consumer job: stream events → hourly serving rollup.

    File-source stand-in for the topic (SURVEY §3.3); idempotent
    foreachBatch upsert into a keyed parquet serving table (the ES/PG
    role).  Returns the started StreamingQuery (caller awaits/stops).
    """
    from insight_spark.sources.sinks import foreach_batch_upsert
    from insight_spark.streaming.core import (
        hourly_counts_stream,
        read_events_stream,
    )

    stream = hourly_counts_stream(read_events_stream(spark, in_dir))
    return (
        stream.writeStream.outputMode("update")
        .foreachBatch(foreach_batch_upsert(out_dir, ["window_start", "event_type"]))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
