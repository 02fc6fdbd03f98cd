"""Corpus-cleaning operators from the modern LLM-data playbook.

Three canonical pre-training cleaners, each value-oracled:

- ``line_dedup_stats`` — C4/RefinedWeb-style line-level boilerplate
  removal: corpus-frequent text spans are struck from every document.
- ``dsir_importance`` — DSIR-style importance weighting (Xie et al.
  2023): per-doc log-likelihood ratio between a target domain's and the
  raw corpus's unigram LMs, the score used to importance-resample raw
  data toward a target distribution.
- ``semantic_dedup`` — SemDeDup (Abbas et al. 2023): cluster the
  embedding space, then mark within-cluster near-duplicates by cosine,
  keeping one representative per duplicate group.

All three follow the house float discipline (micro-int sums, ROUND
before compare) so the DuckDB oracles are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insight_spark.operators.similarity import dot, l2_norm
from insight_spark.operators.text import tokenize, tokens_df
from insight_spark.queries import query
from insight_spark.sources import load_table

#: Tokens per "line" (the fixture text has no newlines, so fixed-width
#: token spans stand in for lines; on real corpora swap the chunker for
#: ``split(text, '\n')`` — every downstream step is unchanged).
_LINE_LEN = 3
#: A line appearing in >= this many distinct docs is boilerplate.
_BOILER_DOCS = 3


@query(
    "line_dedup_stats",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), t -> t <> '')
                   AS ts
        FROM documents
    ),
    lines AS (
        SELECT doc_id,
               list_aggregate(
                   list_slice(ts, (i - 1) * {_LINE_LEN} + 1,
                              i * {_LINE_LEN}),
                   'string_agg', ' ') AS line
        FROM toks
        CROSS JOIN (SELECT unnest(range(1, 100000)) AS i)
        WHERE (i - 1) * {_LINE_LEN} < len(ts)
    ),
    freq AS (
        SELECT line, COUNT(DISTINCT doc_id) AS n_docs
        FROM lines GROUP BY line
    )
    SELECT l.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN f.n_docs >= {_BOILER_DOCS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boiler,
           ROUND(CAST(SUM(CASE WHEN f.n_docs >= {_BOILER_DOCS}
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS boiler_ratio
    FROM lines l JOIN freq f USING (line)
    GROUP BY l.doc_id
    """,
)
def line_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level dedup audit: per document, how many of its
    lines are corpus-boilerplate (present in >= {_BOILER_DOCS} docs).

    The shape is the scale story: documents explode to (doc_id, line)
    once; line frequency is a word-count aggregate on the line string
    (the only content shuffled is the line text itself — at real scale,
    hash the line to 16 bytes first and shuffle digests, exactly like
    ``dedup_hash``); the frequency table joins back per-line and the
    verdict re-aggregates on doc_id.  Two shuffles total (line key, doc
    key), both on bounded keys, no UDFs — the same plan C4's "discard
    any line seen more than once" rule compiles to at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize(F.col("text")).alias("ts"))
    n_lines = F.ceil(F.size("ts") / F.lit(_LINE_LEN)).cast("int")
    lines = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n_lines),
                lambda i: F.array_join(
                    F.slice(
                        F.col("ts"),
                        (i - 1) * _LINE_LEN + 1,
                        _LINE_LEN,
                    ),
                    " ",
                ),
            )
        ).alias("line"),
    )
    freq = lines.groupBy("line").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    boiler = (F.col("n_docs") >= _BOILER_DOCS).cast("long")
    return (
        lines.join(freq, "line")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(boiler).alias("n_boiler"),
            F.round(
                F.sum(boiler).cast("double") / F.count("*"), 6
            ).alias("boiler_ratio"),
        )
    )


@query(
    "dsir_importance",
    oracle=r"""
    WITH toks AS (
        SELECT d.doc_id, d.lang,
               unnest(list_filter(string_split_regex(d.text, '\s+'),
                                  t -> t <> '')) AS token
        FROM documents d
    ),
    raw AS (SELECT token, COUNT(*) AS rc FROM toks GROUP BY token),
    tgt AS (SELECT token, COUNT(*) AS tc FROM toks
            WHERE lang = 'en' GROUP BY token),
    tots AS (
        SELECT (SELECT SUM(rc) FROM raw) AS rn,
               (SELECT COALESCE(SUM(tc), 0) FROM tgt) AS tn,
               (SELECT COUNT(*) FROM raw) AS v
    ),
    micro AS (
        SELECT t.doc_id,
               CAST(ROUND(log10(
                   ((COALESCE(g.tc, 0) + 0.5) / (tots.tn + 0.5 * tots.v))
                   / ((r.rc + 0.5) / (tots.rn + 0.5 * tots.v))
               ) * 1000000) AS BIGINT) AS s
        FROM toks t
        JOIN raw r USING (token)
        LEFT JOIN tgt g USING (token)
        CROSS JOIN tots
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND((SUM(s) / COUNT(*)) / 1000000.0, 6) AS avg_log_ratio
    FROM micro GROUP BY doc_id
    """,
)
def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weight: per-doc mean log10 likelihood ratio
    between the target-domain (here: lang='en') and raw-corpus unigram
    LMs, add-0.5 smoothed.  Docs whose token mix looks target-like
    score high; importance resampling keeps docs with probability
    proportional to exp of this score — the standard recipe for
    steering a 100 TB crawl toward a curated target distribution.

    Scale shape: ONE token-count shuffle builds both LMs (the target
    counts are a filtered aggregate of the same stream); both vocab
    tables broadcast back onto the token stream (word vocabs stay
    MB-sized at any corpus size); the per-doc agg shuffles on doc_id.
    Float discipline: per-token log-ratio is rounded to integer
    micro-units BEFORE the per-doc sum (exact, order-independent —
    the ``unigram_surprisal_score`` trick), one final division.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(tokenize(F.col("text"))).alias("token")
    )
    raw = toks.groupBy("token").agg(F.count("*").alias("rc"))
    tgt = (
        toks.filter(F.col("lang") == "en")
        .groupBy("token")
        .agg(F.count("*").alias("tc"))
    )
    tots = raw.join(tgt, "token", "left").agg(
        F.sum("rc").alias("rn"),
        F.coalesce(F.sum("tc"), F.lit(0)).alias("tn"),
        F.count("*").alias("v"),
    )
    ratio = (
        (F.coalesce(F.col("tc"), F.lit(0)) + 0.5)
        / (F.col("tn") + 0.5 * F.col("v"))
    ) / ((F.col("rc") + 0.5) / (F.col("rn") + 0.5 * F.col("v")))
    micro = (
        toks.join(F.broadcast(raw), "token")
        .join(F.broadcast(tgt), "token", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "doc_id",
            F.round(F.log10(ratio) * 1000000).cast("long").alias("s"),
        )
    )
    return micro.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round((F.sum("s") / F.count("*")) / 1000000.0, 6).alias(
            "avg_log_ratio"
        ),
    )


#: SemDeDup cosine threshold — sits in the top tail of the fixture's
#: near-random vectors (max pairwise cosine ~ 0.51, cf.
#: ``embedding_near_dup``).
_SEMDEDUP_TAU = 0.4


def _semantic_dedup_oracle() -> str:
    from insight_spark.queries.vectors_extra import KMEANS_ASSIGN_CTE

    return (
        "WITH "
        + KMEANS_ASSIGN_CTE
        + f""",
    ev AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    pts AS (
        SELECT a3.vec_id, a3.cell, ev.v
        FROM a3 JOIN ev USING (vec_id)
    ),
    pairs AS (
        SELECT a.vec_id,
               ROUND(list_cosine_similarity(a.v, b.v), 6) AS sim
        FROM pts a JOIN pts b
          ON b.cell = a.cell AND b.vec_id < a.vec_id
    ),
    stats AS (
        SELECT vec_id, COUNT(*) AS n_lower, MAX(sim) AS mx
        FROM pairs GROUP BY vec_id
    )
    SELECT p.vec_id,
           CAST(p.cell AS INTEGER) AS cell_id,
           CAST(COALESCE(s.n_lower, 0) AS BIGINT) AS n_lower,
           ROUND(COALESCE(s.mx, -1.0), 6) AS max_sim_lower,
           CAST(CASE WHEN COALESCE(s.mx, -1.0) >= {_SEMDEDUP_TAU}
                     THEN 1 ELSE 0 END AS INTEGER) AS is_dup
    FROM pts p LEFT JOIN stats s USING (vec_id)
    """
    )


@query("semantic_dedup", oracle=_semantic_dedup_oracle())
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: embedding-space semantic dedup.  Cluster with the
    exact integer k-means (same 2-round model as ``kmeans_lloyd`` —
    the oracle shares its unrolled CTE verbatim), then within each
    cluster mark a point a duplicate when its cosine to some LOWER-id
    clustermate is >= tau; the lowest id of each duplicate group
    survives — the keep-one policy from the SemDeDup paper.

    The cluster step IS the scale story: pairwise cosine is quadratic,
    but only within a cell — with K ~ sqrt(N) cells the total pair
    count is ~N^1.5/K tractable, and each cell's pair join is an
    equi-join on cell id (shuffle on cell, AQE splits skewed cells).
    Norms are hoisted per ROW before the pair join (N not N^2 sqrt
    evaluations, the ``embedding_near_dup`` lesson); per-pair work is
    a JVM higher-order fold, no Python.
    """
    from insight_spark.operators.clustering import lloyd, quantize_micro

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", quantize_micro(F.col("embedding")).alias("e"))
    assigned = lloyd(q, k=8, n_iter=2, vec_col="e", id_col="vec_id").select(
        "vec_id", "cell"
    )
    pts = assigned.join(
        emb.select("vec_id", "embedding"), "vec_id"
    ).select(
        "vec_id",
        "cell",
        F.col("embedding").alias("v"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    a = pts.select(
        F.col("vec_id").alias("a_id"),
        F.col("cell").alias("a_cell"),
        F.col("v").alias("a_v"),
        F.col("nrm").alias("a_n"),
    )
    b = pts.select(
        F.col("vec_id").alias("b_id"),
        F.col("cell").alias("b_cell"),
        F.col("v").alias("b_v"),
        F.col("nrm").alias("b_n"),
    )
    denom = F.col("a_n") * F.col("b_n")
    sim = F.round(
        F.when(denom == 0.0, F.lit(0.0)).otherwise(
            dot(F.col("a_v"), F.col("b_v")) / denom
        ),
        6,
    )
    stats = (
        a.join(
            b,
            (F.col("b_cell") == F.col("a_cell"))
            & (F.col("b_id") < F.col("a_id")),
        )
        .select(F.col("a_id").alias("vec_id"), sim.alias("sim"))
        .groupBy("vec_id")
        .agg(F.count("*").alias("n_lower"), F.max("sim").alias("mx"))
    )
    mx = F.round(F.coalesce(F.col("mx"), F.lit(-1.0)), 6)
    return (
        pts.select("vec_id", "cell")
        .join(stats, "vec_id", "left")
        .select(
            "vec_id",
            F.col("cell").cast("int").alias("cell_id"),
            F.coalesce(F.col("n_lower"), F.lit(0))
            .cast("long")
            .alias("n_lower"),
            mx.alias("max_sim_lower"),
            (mx >= _SEMDEDUP_TAU).cast("int").alias("is_dup"),
        )
    )
