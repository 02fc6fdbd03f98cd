"""Corpus mixing / sampling / fingerprinting queries (SURVEY §2.M95+).

The data-mixture layer of an LLM pretraining pipeline: once the corpus
is deduped and quality-scored, these decide HOW MUCH of each slice is
trained on (temperature re-weighting, per-source token budgets,
perplexity terciles) and give the plagiarism-robust fingerprint
(winnowing) used for overlap audits.

Scale shapes: every query here is either map-only + a |sources|- or
|vocab|-bounded aggregate, or a window PARTITIONED on a data key
(source / lang) — nothing global, nothing driver-side.  Float
discipline follows SURVEY §7.4: cross-engine doubles only ever appear
(a) rounded to integer micro-units before any aggregation, or
(b) divided once and rounded at output.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from insight_spark.operators.text import tokenize, tokens_df
from insight_spark.queries import query
from insight_spark.sources import load_table

#: Mixture temperature (alpha): 0 = uniform over sources, 1 = natural.
#: 0.3 is the multilingual-mixing standard (mT5 / XLM-R lineage).
_MIX_ALPHA = 0.3

#: Per-source token budget for the deterministic subsampler.
_SAMPLE_BUDGET = 500

#: Winnowing parameters: k-gram size and window width (MOSS defaults
#: scaled down to the fixture's short documents).
_WINNOW_K = 3
_WINNOW_W = 4


@query(
    "source_mixture_temperature",
    oracle=rf"""
    WITH per_source AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(list_filter(string_split_regex(text, '\s+'),
                                        t -> t <> ''))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(n_tokens) AS t FROM per_source),
    scored AS (
        SELECT source, n_docs, n_tokens,
               CAST(n_tokens AS DOUBLE) / tot.t AS p,
               CAST(ROUND(POWER(CAST(n_tokens AS DOUBLE) / tot.t,
                                {_MIX_ALPHA}) * 1000000) AS BIGINT) AS s
        FROM per_source CROSS JOIN tot
    ),
    norm AS (SELECT SUM(s) AS z FROM scored)
    SELECT source, n_docs, n_tokens,
           ROUND(p, 6) AS nat_share,
           ROUND(CAST(s AS DOUBLE) / norm.z, 6) AS temp_weight,
           ROUND((CAST(s AS DOUBLE) / norm.z)
                 * (SELECT t FROM tot) / n_tokens, 6) AS expected_epochs
    FROM scored CROSS JOIN norm
    """,
)
def source_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing weights — the knob that decides
    how often each corpus slice is sampled during pretraining:
    w_i ∝ p_i^α with α={0.3}, flattening the natural distribution so
    low-resource sources are up-sampled (and `expected_epochs` shows by
    how much: the number of passes over source i when one corpus-sized
    token budget is drawn under w).

    Plan: one token-count aggregate to |sources| rows; the two scalars
    (corpus total, normalizer Z) attach as 1-row broadcasts — the same
    no-global-window shape as ``source_token_budget``.  Cross-engine
    float discipline: p is one IEEE division of exact ints; p^α rounds
    to integer micro-units before the (exact) normalizer sum.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokenize(F.col("text"))).cast("long")).alias("n_tokens"),
    )
    tot = per_source.agg(F.sum("n_tokens").alias("t"))
    scored = per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        "t",
        (F.col("n_tokens").cast("double") / F.col("t")).alias("p"),
        F.round(
            F.pow(F.col("n_tokens").cast("double") / F.col("t"), _MIX_ALPHA)
            * 1000000
        )
        .cast("long")
        .alias("s"),
    )
    norm = scored.agg(F.sum("s").alias("z"))
    return scored.crossJoin(F.broadcast(norm)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round("p", 6).alias("nat_share"),
        F.round(F.col("s").cast("double") / F.col("z"), 6).alias(
            "temp_weight"
        ),
        F.round(
            (F.col("s").cast("double") / F.col("z"))
            * F.col("t")
            / F.col("n_tokens"),
            6,
        ).alias("expected_epochs"),
    )


@query(
    "token_budget_sampler",
    oracle=rf"""
    WITH sized AS (
        SELECT doc_id, source,
               CAST(len(list_filter(string_split_regex(text, '\s+'),
                                    t -> t <> '')) AS INTEGER) AS n_tokens
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, source, n_tokens,
               CAST(ROW_NUMBER() OVER w AS INTEGER) AS rk,
               CAST(SUM(n_tokens) OVER (w ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT) AS running
        FROM sized
        WINDOW w AS (PARTITION BY source
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
    )
    SELECT doc_id, source, n_tokens, rk, running
    FROM ranked WHERE running <= {_SAMPLE_BUDGET}
    """,
)
def token_budget_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-capped deterministic corpus subsample: within each
    source, take documents in md5(doc_id) priority order until the
    per-source token budget ({500} here) is exhausted — how an
    over-represented source is down-sampled to its mixture allocation
    without RNG (append-stable: new docs sort into the priority order
    but never reshuffle which earlier docs were kept for a fixed
    budget frontier).

    One window partitioned ON source (the data key — scale-safe per
    the engine-wide unpartitioned-window guard) computes rank and
    running token total in a single pass; the filter is map-side after
    it.  At 100 TB the md5 priority makes the kept set a uniform
    random-looking sample, but reproducible from the corpus alone.
    """
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "source",
        F.size(tokenize(F.col("text"))).alias("n_tokens"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = sized.select(
        "doc_id",
        "source",
        "n_tokens",
        F.row_number().over(w).alias("rk"),
        F.sum("n_tokens")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("running"),
    )
    return ranked.filter(F.col("running") <= _SAMPLE_BUDGET)


@query(
    "ccnet_perplexity_buckets",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, lang,
               unnest(list_filter(string_split_regex(text, '\s+'),
                                  t -> t <> '')) AS token
        FROM documents
    ),
    vocab AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
    tot AS (SELECT SUM(c) AS n FROM vocab),
    micro AS (
        SELECT t.doc_id, t.lang,
               CAST(ROUND(-log10(CAST(v.c AS DOUBLE) / tot.n) * 1000000)
                    AS BIGINT) AS s
        FROM toks t JOIN vocab v USING (token) CROSS JOIN tot
    ),
    per_doc AS (
        SELECT doc_id, lang,
               CAST(ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*)) AS BIGINT)
                   AS score_micro
        FROM micro GROUP BY doc_id, lang
    ),
    bucketed AS (
        SELECT lang, score_micro,
               CAST(NTILE(3) OVER (PARTITION BY lang
                    ORDER BY score_micro, doc_id) AS INTEGER) AS bucket
        FROM per_doc
    )
    SELECT lang, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(ROUND(CAST(SUM(score_micro) AS DOUBLE) / COUNT(*)) AS BIGINT)
               / 1000000.0 AS avg_surprisal
    FROM bucketed GROUP BY lang, bucket
    """,
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: per language, split documents
    into head/middle/tail terciles of LM score (here the corpus-unigram
    surprisal proxy), the classic pre-filter that keeps `head` for
    high-quality training data and routes `tail` to review.

    Plan: the unigram-surprisal machinery (vocab count-aggregate,
    broadcast back, micro-int per-token scores) feeds one NTILE window
    partitioned ON lang — the data key, so terciles of a 100-language
    100 TB corpus compute as 100 independent sorted passes, not one.
    Per-doc scores round to integer micro-units before every
    aggregation, so tercile boundaries and bucket means are bit-equal
    cross-engine.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(tokenize(F.col("text"))).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count("*").alias("c"))
    tot = vocab.agg(F.sum("c").alias("n"))
    micro = (
        toks.join(F.broadcast(vocab), "token")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "lang",
            F.round(
                -F.log10(F.col("c").cast("double") / F.col("n")) * 1000000
            )
            .cast("long")
            .alias("s"),
        )
    )
    per_doc = micro.groupBy("doc_id", "lang").agg(
        F.round(F.sum("s").cast("double") / F.count("*"))
        .cast("long")
        .alias("score_micro")
    )
    w = Window.partitionBy("lang").orderBy("score_micro", "doc_id")
    bucketed = per_doc.select(
        "lang", "score_micro", F.ntile(3).over(w).alias("bucket")
    )
    return bucketed.groupBy("lang", "bucket").agg(
        F.count("*").alias("n_docs"),
        (F.round(F.sum("score_micro") / F.count("*")).cast("long")
         / F.lit(1000000.0)).alias("avg_surprisal"),
    )


@query(
    "winnowing_fingerprints",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), t -> t <> '')
                   AS ts
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               list_transform(range(1, len(ts) - {_WINNOW_K} + 2),
                   i -> md5(list_aggregate(
                            list_slice(ts, i, i + {_WINNOW_K} - 1),
                            'string_agg', ' '))) AS hs
        FROM toks WHERE len(ts) >= {_WINNOW_K + _WINNOW_W - 1}
    ),
    fp AS (
        SELECT doc_id, hs,
               list_transform(range(1, len(hs) - {_WINNOW_W} + 2),
                   i -> list_aggregate(
                            list_slice(hs, i, i + {_WINNOW_W} - 1),
                            'min')) AS fps
        FROM grams
    )
    SELECT doc_id,
           CAST(len(fps) AS INTEGER) AS n_windows,
           CAST(len(list_distinct(fps)) AS INTEGER) AS n_fingerprints,
           list_aggregate(fps, 'min') AS min_fp,
           list_aggregate(fps, 'max') AS max_fp
    FROM fp
    """,
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., the MOSS
    algorithm): hash every k-gram, slide a w-wide window over the hash
    sequence, record each window's minimum — guaranteeing any shared
    substring of length ≥ k+w-1 between two documents shares a
    fingerprint, with ~2/(w+1) of positions selected.  The
    overlap-audit complement to MinHash: position-aware, so it catches
    copied PASSAGES, not just similar documents.

    Plan: pure per-row higher-order-function projection (transform +
    slice + array_min over md5 hex strings — lexicographic min, no
    hex-to-int conversion needed cross-engine), zero shuffles, zero
    Python.  At 100 TB this is the map-side pass that feeds a
    (fingerprint → postings) word-count aggregate for passage-overlap
    joins; the per-doc summary here keeps the verified surface
    deterministic and bounded.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokenize(F.col("text")).alias("ts")
    ).filter(F.size("ts") >= _WINNOW_K + _WINNOW_W - 1)
    grams = toks.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size("ts") - _WINNOW_K + 1),
            lambda i: F.md5(
                F.array_join(F.slice(F.col("ts"), i, _WINNOW_K), " ")
            ),
        ).alias("hs"),
    )
    fp = grams.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size("hs") - _WINNOW_W + 1),
            lambda i: F.array_min(F.slice(F.col("hs"), i, _WINNOW_W)),
        ).alias("fps"),
    )
    return fp.select(
        "doc_id",
        F.size("fps").alias("n_windows"),
        F.size(F.array_distinct("fps")).alias("n_fingerprints"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp"),
    )


@query(
    "cdc_chunk_dedup",
    oracle="""
    WITH base AS (
        SELECT doc_id, text, len(text) AS n FROM documents
    ),
    cut AS (
        SELECT doc_id, text, n,
               CASE WHEN n >= 8 THEN
                   [0] || list_transform(
                       list_filter(range(1, n - 6),
                           i -> i + 7 < n AND
                                list_sum(list_transform(range(0, 8),
                                    j -> CAST(ascii(substr(text, i + j, 1))
                                              AS BIGINT)
                                         * CAST(31 ** (7 - j) AS BIGINT)))
                                % 64 = 0),
                       i -> i + 7) || [n]
               ELSE [0, n] END AS cuts
        FROM base
    ),
    chunks AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(cuts)),
                   k -> md5(substr(text, cuts[k] + 1,
                                   cuts[k + 1] - cuts[k])))) AS ch
        FROM cut
    ),
    freq AS (
        SELECT ch, COUNT(DISTINCT doc_id) AS nd FROM chunks GROUP BY ch
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_chunks,
           CAST(SUM(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS INTEGER)
               AS n_shared
    FROM chunks c JOIN freq f USING (ch)
    GROUP BY c.doc_id
    """,
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS rolling-hash dedup
    primitive): cut each document where an 8-char polynomial hash
    (Horner, base 31) hits 0 mod 64 — boundaries follow CONTENT, so an
    insertion early in a document shifts only the chunk it lands in,
    and every later chunk still dedups against the corpus (the
    property fixed-size blocks lack; the storage-layer complement to
    MinHash document-level dedup).  Per doc: chunk count + how many of
    its chunks also appear in other documents.

    Scale shape: chunking is a pure per-row higher-order projection
    (no UDF — the Horner fold is a nested JVM ``aggregate``); only
    16-byte chunk digests shuffle for the corpus frequency (never
    content), then a doc-key re-aggregate — exactly the `dedup_hash`
    digest discipline applied sub-document.  Production CDC adds
    min/max chunk-size clamps; the cut rule here is the textbook form
    so both engines replay it bit-exactly.
    """
    docs = load_table(spark, sf_dir, "documents")
    cut = docs.select(
        "doc_id",
        "text",
        F.expr(
            """
            CASE WHEN length(text) >= 8 THEN
                concat(
                    array(0),
                    transform(
                        filter(sequence(1, length(text) - 7),
                            i -> i + 7 < length(text) AND
                                 aggregate(sequence(0, 7), 0L,
                                     (acc, j) -> acc * 31L +
                                         ascii(substring(text, i + j, 1)))
                                 % 64 = 0),
                        i -> i + 7),
                    array(length(text)))
            ELSE array(0, length(text)) END
            """
        ).alias("cuts"),
    )
    chunks = cut.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(cuts) - 1),"
                " k -> md5(substring(text, element_at(cuts, k) + 1,"
                " element_at(cuts, k + 1) - element_at(cuts, k))))"
            )
        ).alias("ch"),
    )
    freq = chunks.groupBy("ch").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    return (
        chunks.join(freq, "ch")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_chunks"),
            F.sum((F.col("nd") >= 2).cast("int")).cast("int").alias(
                "n_shared"
            ),
        )
    )


@query(
    "data_prep_funnel",
    oracle=rf"""
    WITH base AS (
        SELECT doc_id, source, text, sha256(text) AS h,
               len(list_filter(string_split_regex(text, '\s+'),
                               t -> t <> '')) AS nt
        FROM documents
    ),
    keep AS (SELECT h, MIN(doc_id) AS keep_id FROM base GROUP BY h),
    dedup AS (
        SELECT b.* FROM base b JOIN keep k ON b.doc_id = k.keep_id
    ),
    quality AS (SELECT * FROM dedup WHERE nt >= 10),
    ranked AS (
        SELECT doc_id, source, nt,
               SUM(nt) OVER (PARTITION BY source
                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                             ROWS UNBOUNDED PRECEDING) AS running
        FROM quality
    ),
    sampled AS (SELECT * FROM ranked WHERE running <= {_SAMPLE_BUDGET}),
    per_source AS (
        SELECT source, SUM(nt) AS st FROM sampled GROUP BY source
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS n_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM dedup) AS n_after_dedup,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM quality) AS n_after_quality,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM sampled) AS n_sampled,
           (SELECT CAST(COALESCE(SUM(nt), 0) AS BIGINT) FROM sampled)
               AS sampled_tokens,
           (SELECT CAST(COALESCE(SUM((st + 2047) // 2048), 0) AS BIGINT)
            FROM per_source) AS n_bins_lb
    """,
)
def data_prep_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-prep lifecycle in ONE report (flagship #2, composing
    the round-5 surface the way a training-data team actually runs
    it): exact dedup (sha256 keep-min) → quality gate (min token
    count) → per-source md5-priority budget sampling → context-window
    bin lower bound (ceil tokens/2048 per source — the fixed-width
    bound the greedy packer refines).

    Every stage count is value-checked in one row, so a regression in
    ANY stage's semantics breaks the hash.  Plan: one digest shuffle,
    map-side quality filter, one source-partitioned window, and
    1-row-aggregate crossJoins — the same stage shapes as the verified
    standalone queries (`dedup_hash`, `token_budget_sampler`,
    `pack_token_budget`), composed without materialization between
    stages.
    """
    from insight_spark.operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "source", "text",
        F.size(tokenize(F.col("text"))).alias("nt"),
    )
    keep = exact_dedup(docs, content_col="text", id_col="doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    dedup = base.join(keep, "doc_id", "left_semi")
    quality = dedup.filter(F.col("nt") >= 10)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = quality.select(
        "doc_id",
        "source",
        "nt",
        F.sum("nt")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("running"),
    )
    sampled = ranked.filter(F.col("running") <= _SAMPLE_BUDGET)
    per_source = sampled.groupBy("source").agg(F.sum("nt").alias("st"))
    m1 = base.agg(F.count("*").alias("n_docs"))
    m2 = dedup.agg(F.count("*").alias("n_after_dedup"))
    m3 = quality.agg(F.count("*").alias("n_after_quality"))
    m4 = sampled.agg(
        F.count("*").alias("n_sampled"),
        F.coalesce(F.sum("nt"), F.lit(0)).alias("sampled_tokens"),
    )
    m5 = per_source.agg(
        F.coalesce(
            F.sum(F.floor((F.col("st") + 2047) / 2048)), F.lit(0)
        ).alias("n_bins_lb")
    )
    return (
        m1.crossJoin(m2).crossJoin(m3).crossJoin(m4).crossJoin(m5)
    )


@query(
    "k_anonymity_suppress",
    oracle="""
    WITH cells AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY lang, source
    )
    SELECT CASE WHEN n >= 5 THEN lang ELSE '*' END AS lang,
           CASE WHEN n >= 5 THEN source ELSE '*' END AS source,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           n >= 5 AS released
    FROM cells
    GROUP BY 1, 2, released
    """,
)
def k_anonymity_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release gate (privacy-preserving corpus stats): the
    (lang, source) quasi-identifier cells are released only when they
    hold ≥ k=5 documents; smaller cells collapse into one suppressed
    '*'/'*' bucket — so no published row isolates fewer than k
    individuals' documents.  The pre-release step any corpus-stats
    dashboard or datasheet runs before sharing slice counts.

    Plan: one quasi-identifier aggregate (map-side combined), then a
    second tiny aggregate over the |cells| rows that folds the
    sub-threshold cells together — both shuffles on bounded keys; the
    release decision is a projection, never a per-row filter that
    would leak counts via absence.
    """
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count("*").alias("n"))
    released = F.col("n") >= 5
    return (
        cells.select(
            F.when(released, F.col("lang")).otherwise("*").alias("lang"),
            F.when(released, F.col("source")).otherwise("*").alias("source"),
            "n",
            released.alias("released"),
        )
        .groupBy("lang", "source", "released")
        .agg(
            F.sum("n").alias("n_docs"),
            F.count("*").alias("n_cells"),
        )
        .select("lang", "source", "n_docs", "n_cells", "released")
    )


#: Fixed target mixture weights per language (copies per document,
#: possibly fractional) and the md5-hex acceptance threshold for the
#: fractional part: accept the extra copy iff the first 8 hex chars of
#: md5('up#' || doc_id) sort below format(int(frac(w) * 2^32), '08x').
#: Both engines compare fixed-width lowercase hex bytewise, so the
#: Bernoulli draw is deterministic and exactly replayable.
_UPSAMPLE_W: dict[str, tuple[int, str]] = {
    "en": (1, "99999999"),  # w = 1.6
    "zh": (0, "e6666666"),  # w = 0.9
    "es": (0, "b3333333"),  # w = 0.7
    "de": (1, "33333333"),  # w = 1.2
    "fr": (0, "66666666"),  # w = 0.4
}


def _upsample_case(col: str, idx: int) -> str:
    return (
        "CASE lang "
        + " ".join(
            f"WHEN '{lang}' THEN {repr(v[idx])}"
            for lang, v in _UPSAMPLE_W.items()
        )
        + f" ELSE {repr((1, '00000000')[idx])} END AS {col}"
    )


@query(
    "mixture_fractional_upsample",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, lang,
               {_upsample_case("base", 0)},
               {_upsample_case("thr", 1)}
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang,
               base + CASE WHEN substr(md5('up#' || CAST(doc_id AS VARCHAR)),
                                        1, 8) < thr
                           THEN 1 ELSE 0 END AS n_copies
        FROM w
    ),
    e AS (
        SELECT lang, doc_id, unnest(range(1, n_copies + 1)) AS copy_idx
        FROM c WHERE n_copies > 0
    ),
    oc AS (SELECT lang, COUNT(*) AS n FROM e GROUP BY lang),
    dc AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang)
    SELECT dc.lang,
           CAST(dc.n_docs AS BIGINT) AS n_docs,
           CAST(coalesce(oc.n, 0) AS BIGINT) AS n_rows_out,
           ROUND(CAST(coalesce(oc.n, 0) AS DOUBLE) / dc.n_docs, 6)
               AS upsample_ratio
    FROM dc LEFT JOIN oc USING (lang)
    """,
)
def mixture_fractional_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fractional upsampling to target mixture weights —
    the materialization step after a mixture is chosen (cf.
    source_mixture_temperature, which chooses the weights): each
    document is replicated floor(w) times plus one more with
    probability frac(w), drawn from a hash of the doc id, so the
    realized corpus hits the target weight in expectation with
    per-document determinism (re-runs produce the identical corpus —
    the property RNG-based samplers lack, and what makes the op
    driver-hash-checkable).

    Scale shape: one projection computes n_copies (no shuffle), the
    replication is a bounded explode (ceil(max w) rows per doc), and
    the report is a pair of lang-keyed map-side-combined counts.  The
    hash draw never looks at other rows — embarrassingly parallel at
    any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = F.lit(1)
    thr = F.lit("00000000")
    for lang, (b, t) in _UPSAMPLE_W.items():
        base = F.when(F.col("lang") == lang, F.lit(b)).otherwise(base)
        thr = F.when(F.col("lang") == lang, F.lit(t)).otherwise(thr)
    u = F.substring(F.md5(F.concat(F.lit("up#"), F.col("doc_id").cast("string"))), 1, 8)
    c = docs.select(
        "doc_id",
        "lang",
        (base + F.when(u < thr, 1).otherwise(0)).alias("n_copies"),
    )
    reps = c.filter(F.col("n_copies") > 0).select(
        "lang",
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy_idx"),
    )
    oc = reps.groupBy("lang").agg(F.count("*").alias("n_rows_out"))
    dc = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    return dc.join(oc, "lang", "left").select(
        "lang",
        "n_docs",
        F.coalesce("n_rows_out", F.lit(0)).alias("n_rows_out"),
        F.round(
            F.coalesce("n_rows_out", F.lit(0)).cast("double") / F.col("n_docs"),
            6,
        ).alias("upsample_ratio"),
    )


#: Differentially-private release parameters (M127): counting queries
#: have sensitivity 1, so Laplace scale b = 1/epsilon.
_DP_EPSILON = 0.5
_DP_SCALE = 1.0 / _DP_EPSILON
#: 256-quantile inverse-CDF table of integer Laplace(b) noise, indexed
#: by the first byte of the release cell's md5 — computed ONCE here in
#: Python (pure math, no RNG) and embedded as a literal on BOTH engine
#: sides, so the release is deterministic, reproducible, and
#: hash-checkable while still drawing from the right distribution at
#: 1/256 resolution.  Keying noise on the CELL IDENTITY (not the data)
#: is the standard reproducible-release construction: re-running the
#: pipeline cannot be used to average the noise away.
_DP_NOISE: list[int] = []
for _k in range(256):
    _u = (_k + 0.5) / 256.0
    import math as _math

    _x = (
        _DP_SCALE * _math.log(2.0 * _u)
        if _u < 0.5
        else -_DP_SCALE * _math.log(2.0 * (1.0 - _u))
    )
    _DP_NOISE.append(int(round(_x)))

#: Minimum noisy count to release (small-cell suppression, the
#: standard companion to DP release).
_DP_RELEASE_MIN = 5

_DP_NOISE_SQL = "[" + ", ".join(str(v) for v in _DP_NOISE) + "]"


@query(
    "dp_noisy_release",
    oracle=rf"""
    WITH counts AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    keyed AS (
        SELECT *, md5(event_type || '|' || day) AS h FROM counts
    ),
    bucketed AS (
        SELECT event_type, day, n,
               (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)
                   AS bucket
        FROM keyed
    ),
    noisy AS (
        SELECT event_type, day,
               greatest(n + ({_DP_NOISE_SQL})[bucket + 1], 0) AS noisy_n
        FROM bucketed
    )
    SELECT event_type, day, CAST(noisy_n AS BIGINT) AS noisy_n
    FROM noisy WHERE noisy_n >= {_DP_RELEASE_MIN}
    """,
)
def dp_noisy_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (M127): per
    (event_type, day) event counts + integer Laplace(1/eps) noise,
    with small-cell suppression — the privacy-preserving aggregate
    release a data platform puts in front of raw usage tables.

    The noise is drawn by inverse CDF from a 256-quantile table
    indexed by the first byte of md5(secret || cell key): the noise
    is keyed on cell identity so re-runs release the SAME value
    (re-execution cannot average the noise away), and cells whose
    noisy count falls below the release floor (5) are suppressed.

    PRIVACY CAVEAT — this default configuration is a MECHANISM DEMO,
    not epsilon-DP.  With the default empty secret the noise is a
    pure public function of the cell key, so anyone who knows the
    scheme recomputes the bucket and subtracts the noise exactly —
    the release is invertible and the epsilon accounting is void.
    Determinism is chosen deliberately so the release is
    engine-independent and hash-checkable by the DuckDB oracle.  The
    production path sets ``SPARK_GRAFT_DP_SECRET`` (or passes
    ``secret=`` to this module's helper): the bucket then derives
    from md5(secret || cell), which an adversary without the secret
    cannot recompute — the standard keyed-PRF reproducible-release
    construction.  (A secret seed necessarily forfeits the
    cross-engine value oracle, which is why the harness default stays
    deterministic.)  True per-execution RNG would forfeit
    reproducibility as well; the keyed-PRF middle ground keeps both
    re-run stability and non-recomputability.

    Scale: map-side-combined count over the release grid, then a pure
    projection (md5 + table lookup) — no extra shuffle beyond the one
    aggregation; the noise table is a 256-int literal in the plan,
    not a join.
    """
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("n"))
    # Keyed-PRF bucket: empty secret (harness default) degenerates to
    # the public md5(cell) the oracle replays; a real deployment sets
    # SPARK_GRAFT_DP_SECRET so the noise is not publicly recomputable
    # (see the privacy caveat above).  The secret is joined to the cell
    # key with an explicit '|' separator so distinct (secret, cell)
    # pairs cannot collapse to one PRF input (md5('ab'||'c') ==
    # md5('a'||'bc') without it); with the secret set, the registry
    # drops this query's oracle (_ORACLE_SKIP_ENV) so the driver runs
    # the rows-only check instead of a guaranteed hash mismatch.
    secret = os.environ.get("SPARK_GRAFT_DP_SECRET", "")
    cell = F.concat_ws("|", "event_type", "day")
    h = F.md5(F.concat(F.lit(secret + "|"), cell) if secret else cell)
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    noise = F.element_at(F.array(*[F.lit(v) for v in _DP_NOISE]), bucket + 1)
    noisy = F.greatest(F.col("n") + noise, F.lit(0)).alias("noisy_n")
    return (
        counts.select("event_type", "day", noisy)
        .filter(F.col("noisy_n") >= _DP_RELEASE_MIN)
    )


@query(
    "l_diversity_audit",
    oracle="""
    WITH rows_ AS (
        SELECT c_nationkey AS nation, c_mktsegment AS segment,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS sens
        FROM customer
    ),
    sv AS (
        SELECT nation, segment, sens, CAST(COUNT(*) AS BIGINT) AS ns
        FROM rows_ GROUP BY nation, segment, sens
    ),
    cells AS (
        SELECT nation, segment,
               CAST(SUM(ns) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS l_distinct,
               CAST(MAX(ns) AS BIGINT) AS top_sens_n
        FROM sv GROUP BY nation, segment
    )
    SELECT CAST(nation AS INTEGER) AS nation, segment, n_rows,
           l_distinct,
           CASE WHEN l_distinct >= 3 THEN 1 ELSE 0 END AS meets_l3,
           (2000000 * top_sens_n + n_rows) // (2 * n_rows)
               AS top_sens_share_ppm
    FROM cells
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (M259): k-anonymity's (M121) necessary
    companion — a cell can hold >= k individuals yet leak everything
    if they all share the SAME sensitive value (the homogeneity
    attack).  Per (nation, segment) quasi-identifier cell: row count,
    number of DISTINCT sensitive values (account-balance bands), an
    l>=3 flag, and the dominant sensitive value's share — the
    recursive-(c,l) early-warning number (a share near 1e6 means the
    cell is as good as homogeneous even when l is technically met).

    Exactness: all counts exact BIGINTs; the share is half-up integer
    ppm; the sensitive banding (floor(acctbal/1000)) is shared with
    the oracle.  Scale: two nested bounded-key aggregates (QI x band,
    then QI), both map-side combined — the k_anonymity_suppress shape.
    """
    cust = load_table(spark, sf_dir, "customer")
    rows_ = cust.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("sens"),
    )
    sv = rows_.groupBy("nation", "segment", "sens").agg(
        F.count("*").cast("long").alias("ns")
    )
    cells = sv.groupBy("nation", "segment").agg(
        F.sum("ns").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("l_distinct"),
        F.max("ns").cast("long").alias("top_sens_n"),
    )
    return cells.select(
        F.col("nation").cast("int").alias("nation"),
        "segment",
        "n_rows",
        "l_distinct",
        (F.col("l_distinct") >= 3).cast("int").alias("meets_l3"),
        F.expr(
            "(2000000 * top_sens_n + n_rows) div (2 * n_rows)"
        ).alias("top_sens_share_ppm"),
    )


@query(
    "t_closeness_audit",
    oracle="""
    WITH a AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(CAST(c_acctbal AS DECIMAL(38,6)) * 1000000 AS BIGINT)
                   AS au
        FROM customer
    ),
    bounds AS (
        SELECT CAST(MIN(au) AS BIGINT) AS lo,
               CAST(MAX(au) AS BIGINT) AS hi,
               CAST(COUNT(*) AS BIGINT) AS n_total
        FROM a
    ),
    binned AS (
        SELECT c_nationkey, c_mktsegment,
               least((au - lo) * 10 // (hi - lo + 1), 9) AS bin
        FROM a, bounds
    ),
    grp AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_g
        FROM binned GROUP BY c_nationkey, c_mktsegment
    ),
    gb AS (
        SELECT c_nationkey, c_mktsegment, bin,
               CAST(COUNT(*) AS BIGINT) AS c_gb
        FROM binned GROUP BY c_nationkey, c_mktsegment, bin
    ),
    gtot AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS c_b
        FROM binned GROUP BY bin
    ),
    dense AS (
        SELECT g.c_nationkey, g.c_mktsegment, g.n_g,
               CAST(r.range AS BIGINT) AS bin,
               CAST(COALESCE(gb.c_gb, 0) AS BIGINT) AS c_gb,
               CAST(COALESCE(gl.c_b, 0) AS BIGINT) AS c_b
        FROM grp g
        CROSS JOIN range(10) r
        LEFT JOIN gb ON gb.c_nationkey = g.c_nationkey
                    AND gb.c_mktsegment = g.c_mktsegment
                    AND gb.bin = r.range
        LEFT JOIN gtot gl ON gl.bin = r.range
    ),
    cum AS (
        SELECT c_nationkey, c_mktsegment, n_g,
               SUM(CAST(c_gb AS HUGEINT) * (SELECT n_total FROM bounds)
                   - CAST(c_b AS HUGEINT) * n_g) OVER (
                   PARTITION BY c_nationkey, c_mktsegment
                   ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_d
        FROM dense
    ),
    emd AS (
        SELECT c_nationkey, c_mktsegment, n_g,
               CAST(SUM(ABS(cum_d)) AS HUGEINT) AS emd_num
        FROM cum GROUP BY c_nationkey, c_mktsegment, n_g
    )
    SELECT e.c_nationkey, e.c_mktsegment, e.n_g,
           CAST(e.emd_num AS DOUBLE)
           / (CAST(e.n_g AS DOUBLE) * CAST(b.n_total AS DOUBLE) * 9.0)
               AS t_emd,
           CAST(CAST(e.emd_num AS DOUBLE)
                / (CAST(e.n_g AS DOUBLE) * CAST(b.n_total AS DOUBLE)
                   * 9.0) <= 0.2 AS INT) AS within_t02
    FROM emd e CROSS JOIN bounds b
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (M267): completes the privacy trio
    (`k_anonymity_suppress` M91, `l_diversity_audit` M256).  k-anon
    bounds group SIZE, l-diversity bounds sensitive-value VARIETY —
    both are blind to a group whose sensitive DISTRIBUTION leans
    (1 of 3 distinct values at 98% still leaks).  t-closeness bounds
    the distance between each quasi-identifier group's sensitive
    distribution and the global one; for an ORDERED attribute
    (account balance) the canonical distance is the 1-D Earth Mover's
    Distance = mean |cumulative difference| over the value bins
    (Li et al., ICDE 2007 — public formulation).

    Exactness: acctbal micro-quantized; equi-width decile bins by the
    exact integer expression least((a−lo)·10 div (hi−lo+1), 9) (the
    M147 discipline) against broadcast exact global bounds; the
    per-bin mass gap uses the common denominator n_g·N, so
    d_b = c_gb·N − c_b·n_g is an EXACT integer (HUGEINT/DECIMAL —
    n_g·N overflows int64 at 100 TB); the EMD numerator Σ|cum d_b| is
    exact, and t_emd is ONE IEEE division tree both engines share.
    The within_t02 flag compares those identical doubles.

    Scale: three map-side-combined histogram aggregates off one scan
    shape (group sizes, group×bin, global×bin — the last is 10 rows,
    broadcast), densified against a literal 10-bin grid (≤125·10
    rows), cumulated by a window PARTITIONED per group over 10 rows.
    Nothing global, nothing driver-side; output ≤125 rows of
    metadata.
    """
    dec = "decimal(38,0)"
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        (F.col("c_acctbal").cast("decimal(38,6)") * 1000000)
        .cast("long")
        .alias("au"),
    )
    bounds = cust.agg(
        F.min("au").cast("long").alias("lo"),
        F.max("au").cast("long").alias("hi"),
        F.count("*").cast("long").alias("n_total"),
    )
    binned = cust.crossJoin(F.broadcast(bounds)).select(
        "c_nationkey",
        "c_mktsegment",
        "n_total",
        F.expr("least(((au - lo) * 10) div (hi - lo + 1), 9)").alias(
            "bin"
        ),
    )
    grp = binned.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").cast("long").alias("n_g"),
        F.max("n_total").alias("n_total"),
    )
    gb = binned.groupBy("c_nationkey", "c_mktsegment", "bin").agg(
        F.count("*").cast("long").alias("c_gb")
    )
    glob = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("c_b")
    )
    grid = spark.range(10).select(F.col("id").cast("long").alias("bin"))
    dense = (
        grp.crossJoin(F.broadcast(grid))
        .join(gb, ["c_nationkey", "c_mktsegment", "bin"], "left")
        .join(F.broadcast(glob), ["bin"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_g",
            "n_total",
            "bin",
            F.coalesce(F.col("c_gb"), F.lit(0)).cast("long").alias("c_gb"),
            F.coalesce(F.col("c_b"), F.lit(0)).cast("long").alias("c_b"),
        )
    )
    w = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dense.select(
        "c_nationkey",
        "c_mktsegment",
        "n_g",
        "n_total",
        F.sum(
            F.col("c_gb").cast(dec) * F.col("n_total")
            - F.col("c_b").cast(dec) * F.col("n_g")
        )
        .over(w)
        .alias("cum_d"),
    )
    emd = cum.groupBy("c_nationkey", "c_mktsegment", "n_g", "n_total").agg(
        F.sum(F.abs(F.col("cum_d"))).alias("emd_num")
    )
    t_emd = F.col("emd_num").cast("double") / (
        F.col("n_g").cast("double")
        * F.col("n_total").cast("double")
        * F.lit(9.0)
    )
    return emd.select(
        "c_nationkey",
        "c_mktsegment",
        "n_g",
        t_emd.alias("t_emd"),
        (t_emd <= F.lit(0.2)).cast("int").alias("within_t02"),
    )


@query(
    "largest_remainder_allocation",
    oracle="""
    WITH w AS (
        SELECT source, CAST(SUM(n_chars) AS BIGINT) AS wt
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(wt) AS BIGINT) AS wtot FROM w),
    quota AS (
        SELECT source, wt,
               CAST(wt AS HUGEINT) * 997 // wtot AS base,
               CAST(wt AS HUGEINT) * 997 % wtot AS rem
        FROM w CROSS JOIN tot
    ),
    short AS (
        SELECT CAST(997 - SUM(base) AS BIGINT) AS n_extra FROM quota
    ),
    ranked AS (
        SELECT source, wt, CAST(base AS BIGINT) AS base,
               CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                    AS BIGINT) AS rr
        FROM quota
    )
    SELECT source, wt, base,
           CAST(CASE WHEN rr <= (SELECT n_extra FROM short)
                     THEN 1 ELSE 0 END AS INT) AS got_extra,
           base + CASE WHEN rr <= (SELECT n_extra FROM short)
                       THEN 1 ELSE 0 END AS final_alloc
    FROM ranked
    """,
)
def largest_remainder_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder quota allocation (M269): split a FIXED budget
    of 997 sample slots across sources proportional to token mass
    (n_chars) so the allocations are integers that sum EXACTLY to the
    budget — the missing arithmetic under every quota surface here
    (`stratified_sample` rounds per-stratum independently and can be
    off by ±|strata|; `token_budget_sampler` caps but doesn't
    apportion).  Hamilton's method: floor the exact quotas, then hand
    the leftover slots to the largest fractional remainders
    (deterministic source-name tie-break).

    Exactness: quota = wt·997 div W and remainder wt·997 mod W are
    exact integer arithmetic (HUGEINT/DECIMAL — wt·budget overflows
    int64 when source mass exceeds ~9e15 chars at 100 TB); the
    remainder ranking is an integer sort with a name tie-break; no
    division to float anywhere.  Σ final_alloc == 997 is pinned as a
    property test.

    Scale: one map-side-combined groupBy(source) (≤|sources| rows at
    any corpus size), a 1-row total broadcast, then ranking over the
    |sources|-row table (documented BOUNDED_GLOBAL_WINDOW_OK entry) —
    metadata-scale everywhere after the single corpus scan.
    """
    dec = "decimal(38,0)"
    docs = load_table(spark, sf_dir, "documents")
    w = docs.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("wt")
    )
    tot = w.agg(F.sum("wt").cast("long").alias("wtot"))
    quota = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "wt",
        F.expr(
            "CAST((CAST(wt AS decimal(38,0)) * 997) div wtot AS BIGINT)"
        ).alias("base"),
        F.expr(
            "CAST((CAST(wt AS decimal(38,0)) * 997) % wtot AS BIGINT)"
        ).alias("rem"),
    )
    short = quota.agg(
        (F.lit(997) - F.sum("base")).cast("long").alias("n_extra")
    )
    ranked = quota.withColumn(
        "rr",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), F.asc("source")))
        .cast("long"),
    )
    out = ranked.crossJoin(F.broadcast(short)).select(
        "source",
        "wt",
        "base",
        F.when(F.col("rr") <= F.col("n_extra"), 1)
        .otherwise(0)
        .cast("int")
        .alias("got_extra"),
        (
            F.col("base")
            + F.when(F.col("rr") <= F.col("n_extra"), 1).otherwise(0)
        ).alias("final_alloc"),
    )
    return out


@query(
    "ipf_raking_weights",
    oracle="""
    WITH cells AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY source, lang
    ),
    dims AS (
        SELECT CAST(SUM(n) AS BIGINT) AS big_n,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_src,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_lang
        FROM cells
    ),
    rowf AS (
        SELECT c.source,
               CAST((2000000 * d.big_n + d.n_src * SUM(c.n))
                    // (2 * d.n_src * SUM(c.n)) AS BIGINT) AS r_ppm
        FROM cells c CROSS JOIN dims d
        GROUP BY c.source, d.big_n, d.n_src
    ),
    m1 AS (
        SELECT c.lang,
               CAST(SUM(CAST(r.r_ppm AS HUGEINT) * c.n) AS HUGEINT)
                   AS m1_l
        FROM cells c JOIN rowf r ON r.source = c.source
        GROUP BY c.lang
    ),
    colf AS (
        SELECT m.lang,
               CAST((2 * 1000000000000 * CAST(d.big_n AS HUGEINT)
                     + d.n_lang * m.m1_l)
                    // (2 * d.n_lang * m.m1_l) AS BIGINT) AS c_ppm
        FROM m1 m CROSS JOIN dims d
    )
    SELECT c.source, c.lang, c.n AS n_docs,
           CAST((2 * CAST(r.r_ppm AS HUGEINT) * f.c_ppm + 1000000)
                // 2000000 AS BIGINT) AS weight_ppm
    FROM cells c
    JOIN rowf r ON r.source = c.source
    JOIN colf f ON f.lang = c.lang
    """,
)
def ipf_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sweep IPF raking weights (M308): per (source, lang) cell,
    the sampling weight after one row sweep + one column sweep of
    iterative proportional fitting toward UNIFORM source AND lang
    margins (Deming-Stephan raking, public) — the dataset-balancing
    arithmetic under survey weighting and corpus rebalancing that the
    single-margin ops here (`source_mixture_temperature` reweights
    one margin; `mixture_fractional_upsample` applies one) cannot do:
    raking reconciles TWO margins at once.

    Determinism: every factor is quantized to ppm with the half-up
    integer identity at the moment it is produced (row factor, then
    column factor over the row-adjusted margin, then the product) —
    both engines do the same integer arithmetic in HUGEINT/DECIMAL,
    so the weights hash exactly; convergence of further sweeps is a
    property question, not a hash question (the column margins are
    exact after this sweep by construction; the row margins are
    property-checked to have moved toward target).

    Scale: one (source, lang) histogram (≤20·|langs| cells), 1-row
    dims reduce, two margin joins on broadcast-bounded keys —
    metadata-scale after the single corpus scan.
    """
    dec = "decimal(38,0)"
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("n")
    )
    dims = cells.agg(
        F.sum("n").cast("long").alias("big_n"),
        F.countDistinct("source").cast("long").alias("n_src"),
        F.countDistinct("lang").cast("long").alias("n_lang"),
    )
    rowf = (
        cells.groupBy("source")
        .agg(F.sum("n").cast("long").alias("n_s"))
        .crossJoin(F.broadcast(dims))
        .select(
            "source",
            F.expr(
                "CAST((2000000 * big_n + n_src * n_s)"
                " div (2 * n_src * n_s) AS BIGINT)"
            ).alias("r_ppm"),
        )
    )
    m1 = (
        cells.join(F.broadcast(rowf), "source")
        .groupBy("lang")
        .agg(
            F.sum(F.col("r_ppm").cast(dec) * F.col("n")).alias("m1_l")
        )
    )
    colf = m1.crossJoin(F.broadcast(dims)).select(
        "lang",
        F.expr(
            "CAST((2 * CAST(1000000000000 AS decimal(38,0))"
            " * big_n + n_lang * m1_l)"
            " div (2 * n_lang * m1_l) AS BIGINT)"
        ).alias("c_ppm"),
    )
    return (
        cells.join(F.broadcast(rowf), "source")
        .join(F.broadcast(colf), "lang")
        .select(
            "source",
            "lang",
            F.col("n").alias("n_docs"),
            F.expr(
                "CAST((2 * CAST(r_ppm AS decimal(38,0)) * c_ppm"
                " + 1000000) div 2000000 AS BIGINT)"
            ).alias("weight_ppm"),
        )
    )


@query(
    "jains_fairness_index",
    oracle="""
    WITH s AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS mass
        FROM documents GROUP BY source
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
           CAST(SUM(CAST(n_docs AS HUGEINT)) AS DOUBLE)
           * CAST(SUM(CAST(n_docs AS HUGEINT)) AS DOUBLE)
           / (CAST(COUNT(*) AS DOUBLE)
              * CAST(SUM(CAST(n_docs AS HUGEINT) * n_docs) AS DOUBLE))
               AS fairness_docs,
           CAST(SUM(CAST(mass AS HUGEINT)) AS DOUBLE)
           * CAST(SUM(CAST(mass AS HUGEINT)) AS DOUBLE)
           / (CAST(COUNT(*) AS DOUBLE)
              * CAST(SUM(CAST(mass AS HUGEINT) * mass) AS DOUBLE))
               AS fairness_mass
    FROM s
    """,
)
def jains_fairness_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jain's fairness index over sources (M321): J = (Σx)²/(n·Σx²)
    for per-source doc counts and char mass — the multi-tenant
    fairness number (Jain et al. 1984, public) every shared-resource
    scheduler reports: J = 1 is perfectly even, J = 1/n is one tenant
    hogging everything.  For a training corpus it is the one-number
    answer to "how concentrated is my mixture" that the full
    `source_mixture_temperature` table details (and the
    concentration complement of `revenue_lorenz_curve`'s Gini).

    Exactness: sums and sums-of-squares exact HUGEINT/DECIMAL (mass²
    crosses int64); the index is ONE shared IEEE tree per measure —
    and the squared-sum operands stay below 2⁶³ at fixture scale by
    construction of the measure (docstring of M319 records why that
    bound matters: DuckDB's wide-int→double cast double-rounds
    above it).

    Scale: one |sources|-keyed map-side aggregate + a 1-row reduce.
    """
    dec = "decimal(38,0)"
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("mass"),
    )
    m = s.agg(
        F.count("*").cast("long").alias("n_sources"),
        F.sum("n_docs").cast("long").alias("sd"),
        F.sum(F.col("n_docs").cast(dec) * F.col("n_docs")).alias("sdd"),
        F.sum("mass").cast("long").alias("sm"),
        F.sum(F.col("mass").cast(dec) * F.col("mass")).alias("smm"),
    )
    jd = (
        F.col("sd").cast("double")
        * F.col("sd").cast("double")
        / (F.col("n_sources").cast("double") * F.col("sdd").cast("double"))
    )
    jm = (
        F.col("sm").cast("double")
        * F.col("sm").cast("double")
        / (F.col("n_sources").cast("double") * F.col("smm").cast("double"))
    )
    return m.select(
        "n_sources", jd.alias("fairness_docs"), jm.alias("fairness_mass")
    )


@query(
    "simpson_diversity_index",
    oracle=r"""
    WITH tok AS (
        SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                  t -> t <> '')) AS token
        FROM documents
    ),
    tf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS f
           FROM tok GROUP BY token),
    tm AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
               CAST(SUM(f) AS BIGINT) AS n,
               CAST(SUM(CAST(f AS HUGEINT) * (f - 1)) AS HUGEINT) AS coll
        FROM tf
    ),
    sf AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS f
           FROM documents GROUP BY source),
    sm AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
               CAST(SUM(f) AS BIGINT) AS n,
               CAST(SUM(CAST(f AS HUGEINT) * (f - 1)) AS HUGEINT) AS coll
        FROM sf
    )
    SELECT tm.vocab, tm.n AS n_tokens,
           1.0 - CAST(tm.coll AS DOUBLE)
                 / (CAST(tm.n AS DOUBLE) * CAST(tm.n - 1 AS DOUBLE))
               AS token_diversity,
           1.0 - CAST(sm.coll AS DOUBLE)
                 / (CAST(sm.n AS DOUBLE) * CAST(sm.n - 1 AS DOUBLE))
               AS source_diversity
    FROM tm CROSS JOIN sm
    """,
)
def simpson_diversity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson diversity index (M322): 1 − Σf(f−1)/(N(N−1)) — the
    probability two random draws differ — for the TOKEN distribution
    and the SOURCE distribution of the corpus (Simpson 1949, public).
    The entropy-free diversity number: unlike Shannon entropy it
    needs NO logarithms, so it hashes exactly — which is precisely
    why it is this engine's default diversity gauge (the log-based
    gauges here quantize through literal tables).  Token diversity
    near 1 = vocabulary-open corpus; source diversity near 1/n =
    one feed dominating (read with M321's fairness index).

    Exactness: f(f−1) collision sums exact HUGEINT/DECIMAL; each
    index ONE shared IEEE tree over exact integers.

    Scale: the token leg is the word-count shuffle (vocab-bounded
    keys) + a 1-row reduce; the source leg is |sources| rows.  The
    collision-sum form needs NO normalized probabilities, so there
    is no per-key division anywhere.
    """
    dec = "decimal(38,0)"
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("f"))
    )
    tm = tf.agg(
        F.count("*").cast("long").alias("vocab"),
        F.sum("f").cast("long").alias("n"),
        F.sum(F.col("f").cast(dec) * (F.col("f") - 1)).alias("coll"),
    )
    sm = (
        docs.groupBy("source")
        .agg(F.count("*").cast("long").alias("f"))
        .agg(
            F.sum("f").cast("long").alias("sn"),
            F.sum(F.col("f").cast(dec) * (F.col("f") - 1)).alias("scoll"),
        )
    )
    t_div = F.lit(1.0) - F.col("coll").cast("double") / (
        F.col("n").cast("double") * (F.col("n") - 1).cast("double")
    )
    s_div = F.lit(1.0) - F.col("scoll").cast("double") / (
        F.col("sn").cast("double") * (F.col("sn") - 1).cast("double")
    )
    return tm.crossJoin(F.broadcast(sm)).select(
        "vocab",
        F.col("n").alias("n_tokens"),
        t_div.alias("token_diversity"),
        s_div.alias("source_diversity"),
    )


@query(
    "cluster_sample_two_stage",
    oracle="""
    WITH stage1 AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(strpos('0123456789abcdef',
                           substr(md5('s1|' || source), 1, 1)) - 1
                    AS BIGINT) AS h
        FROM documents GROUP BY source
    ),
    picked AS (
        SELECT source, n_docs FROM stage1
        ORDER BY h, source LIMIT 5
    ),
    stage2 AS (
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_sampled
        FROM documents d JOIN picked p ON d.source = p.source
        WHERE substr(md5('s2|' || CAST(d.doc_id AS VARCHAR)), 1, 1)
              IN ('0', '1', '2', '3')
        GROUP BY d.source
    )
    SELECT p.source, p.n_docs,
           CAST(COALESCE(s.n_sampled, 0) AS BIGINT) AS n_sampled,
           CAST((2000000 * COALESCE(s.n_sampled, 0) + p.n_docs)
                // (2 * p.n_docs) AS BIGINT) AS within_rate_ppm
    FROM picked p LEFT JOIN stage2 s ON s.source = p.source
    """,
)
def cluster_sample_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage cluster sample (M329): stage 1 picks 5 of the
    sources by a salted hash order (clusters), stage 2 samples ~1/4
    of documents WITHIN the picked sources — the survey-sampling
    design used when visiting a cluster has a fixed cost (per-domain
    crawl politeness, per-shard open cost, per-archive unpack):
    touching 5 sources fully beats touching 20 sources thinly for
    the same sample size.  The deterministic two-salt construction
    ('s1|' for clusters, 's2|' for elements) makes the ENTIRE sample
    reproducible on any engine from the hashes alone — the same
    property `bottomk_mergeable_sample` gives one-stage sampling.

    Exactness: both stages are md5-order/md5-range selections with
    name/id tie-breaks; counts and the realized within-rate exact
    integers (half-up ppm).

    Scale: stage 1 is a |sources|-row TakeOrdered(5); stage 2 is a
    map-side filtered count semi-joined to the 5-row broadcast —
    the corpus is scanned once and only the picked clusters' rows
    survive the broadcast join.
    """
    docs = load_table(spark, sf_dir, "documents")
    stage1 = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs")
    ).select(
        "source",
        "n_docs",
        (
            F.instr(
                F.lit("0123456789abcdef"),
                F.substring(
                    F.md5(F.concat(F.lit("s1|"), F.col("source"))), 1, 1
                ),
            )
            - 1
        )
        .cast("long")
        .alias("h"),
    )
    picked = stage1.orderBy("h", "source").limit(5).select(
        "source", "n_docs"
    )
    stage2 = (
        docs.join(F.broadcast(picked.select("source")), "source")
        .filter(
            F.expr(
                "substr(md5('s2|' || CAST(doc_id AS STRING)), 1, 1)"
                " IN ('0', '1', '2', '3')"
            )
        )
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_sampled"))
    )
    return picked.join(stage2, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce(F.col("n_sampled"), F.lit(0))
        .cast("long")
        .alias("n_sampled"),
        F.expr(
            "CAST((2000000 * COALESCE(n_sampled, 0) + n_docs)"
            " div (2 * n_docs) AS BIGINT)"
        ).alias("within_rate_ppm"),
    )


@query(
    "pareto_skyline_sources",
    oracle=r"""
    WITH mass AS (
        SELECT source, CAST(SUM(n_chars) AS BIGINT) AS mass
        FROM documents GROUP BY source
    ),
    vocab AS (
        SELECT source, CAST(COUNT(DISTINCT token) AS BIGINT) AS vocab
        FROM (
            SELECT source,
                   unnest(list_filter(string_split_regex(text, '\s+'),
                                      t -> t <> '')) AS token
            FROM documents
        ) GROUP BY source
    ),
    s AS (
        SELECT m.source, m.mass, v.vocab
        FROM mass m JOIN vocab v ON v.source = m.source
    )
    SELECT a.source, a.mass, a.vocab,
           CAST(NOT EXISTS (
               SELECT 1 FROM s b
               WHERE (b.mass > a.mass AND b.vocab >= a.vocab)
                  OR (b.mass >= a.mass AND b.vocab > a.vocab)
           ) AS INT) AS on_skyline
    FROM s a
    """,
)
def pareto_skyline_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline over sources (M344): which sources are
    UNDOMINATED in (char mass, vocabulary) — the skyline operator
    (Börzsönyi et al. 2001, public) applied to the mixture decision
    it was made for: a dominated source offers strictly less volume
    AND less lexical variety than some other source, so under any
    monotone utility it never deserves marginal budget; the skyline
    set IS the efficient frontier the mixture debate should range
    over (detailing M321's one-number concentration view).

    Note the doc-level mass sum is computed from the documents table
    directly, NOT the exploded token rows — exploding multiplies
    n_chars by token count (both sides share this two-aggregate
    shape).

    Exactness: both measures exact BIGINTs; dominance is strict
    integer comparison with the standard tie rule (equal points
    dominate nothing); flags per source.

    Scale: measures come from two aggregates sharing the source
    key; the dominance test is the |sources|²-pair comparison on a
    BOUNDED summary table (≤400 pairs at any corpus size) — the
    at-scale skyline over UNBOUNDED point sets would use the
    sort-partition-merge algorithm; this query's frontier is over
    group summaries, where the quadratic test on metadata is the
    right call.
    """
    docs = load_table(spark, sf_dir, "documents")
    mass = docs.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("mass")
    )
    vocab = (
        docs.select(
            "source", F.explode(tokenize(F.col("text"))).alias("token")
        )
        .groupBy("source")
        .agg(F.countDistinct("token").cast("long").alias("vocab"))
    )
    s = mass.join(vocab, "source")
    a = s.select(
        F.col("source").alias("a_source"),
        F.col("mass").alias("a_mass"),
        F.col("vocab").alias("a_vocab"),
    )
    b = s.select(
        F.col("mass").alias("b_mass"), F.col("vocab").alias("b_vocab")
    )
    dominated = (
        a.crossJoin(F.broadcast(b))
        .filter(
            (
                (F.col("b_mass") > F.col("a_mass"))
                & (F.col("b_vocab") >= F.col("a_vocab"))
            )
            | (
                (F.col("b_mass") >= F.col("a_mass"))
                & (F.col("b_vocab") > F.col("a_vocab"))
            )
        )
        .select(F.col("a_source").alias("source"))
        .distinct()
    )
    return (
        s.join(
            dominated.withColumn("dom", F.lit(1)), "source", "left"
        )
        .select(
            "source",
            "mass",
            "vocab",
            F.when(F.col("dom").isNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("on_skyline"),
        )
    )


@query(
    "skyline_users_scalable",
    oracle="""
    WITH pts AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6)) * 1000000)
                    AS BIGINT) AS vu
        FROM events GROUP BY user_id
    )
    SELECT a.user_id, a.n, a.vu
    FROM pts a
    WHERE NOT EXISTS (
        SELECT 1 FROM pts b
        WHERE (b.vu > a.vu AND b.n >= a.n)
           OR (b.vu >= a.vu AND b.n > a.n)
    )
    """,
)
def skyline_users_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline over an UNBOUNDED point set (M353) — the
    sort-partition-merge algorithm `pareto_skyline_sources` (M344)
    defers to when the points are data-scale, here users ranked by
    (total value, event count): a user is on the frontier iff nobody
    both spent more AND did more.  M344's quadratic dominance test is
    right for a ≤|sources|² summary; at |users| = data scale it is
    O(N²) — this query is the scalable form (Börzsönyi 2001's
    sort-filter, distributed):

    1. reduce to one row per distinct x (``max y`` per x) — dominance
       within an x-column is just the column max;
    2. ``repartitionByRange(x DESC) + sortWithinPartitions(x DESC)``
       — range partition ids are ordered, so everything with larger x
       than partition p lives in partitions < p plus p's own prefix;
    3. per partition, one vectorized numpy pass: keep x iff its y
       exceeds the running max of all previous (larger-x) y — seeded
       with the CROSS-PARTITION prefix max, computed driver-side from
       the ≤P per-partition maxima (bounded metadata, the only
       collect);
    4. equi-join the surviving (x, ymax) points back to recover the
       user rows (ties at the same point all survive — equal points
       dominate nothing, matching the oracle's strict-dominance rule).

    Scale: two keyed aggregates + one range exchange + one equi-join;
    per-partition work is a single linear scan; driver state is P
    numbers.  No global window, no all-pairs comparison, no
    data-scale collect — the same answer the O(N²) oracle computes.
    """
    ev = load_table(spark, sf_dir, "events")
    pts = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        (F.sum(F.col("value").cast("decimal(38,6)")) * 1000000)
        .cast("long")
        .alias("vu"),
    )
    xs = pts.groupBy("vu").agg(F.max("n").alias("ymax"))
    n_parts = 8
    ranged = (
        xs.repartitionByRange(n_parts, F.col("vu").desc())
        .sortWithinPartitions(F.col("vu").desc())
        .withColumn("pid", F.spark_partition_id())
    )
    ranged = ranged.localCheckpoint()  # stats + filter share one scan
    stats = ranged.groupBy("pid").agg(F.max("ymax").alias("pmax")).collect()
    pmax = {int(r["pid"]): int(r["pmax"]) for r in stats}
    prefix: dict[int, int] = {}
    run = None
    for pid in sorted(pmax):
        if run is not None:
            prefix[pid] = run
        run = pmax[pid] if run is None else max(run, pmax[pid])

    def keep_frontier(batches):
        import numpy as np

        m = None  # running max of y over all larger-x rows seen
        for pdf in batches:
            if not len(pdf):
                continue
            if m is None:
                m = prefix.get(int(pdf["pid"].iloc[0]), None)
            ys = pdf["ymax"].to_numpy(np.int64)
            seed = np.int64(m) if m is not None else np.iinfo(np.int64).min
            prev = np.maximum.accumulate(
                np.concatenate(([seed], ys))
            )[:-1]
            mask = ys > prev
            m = int(max(int(prev[-1]), int(ys[-1])))
            out = pdf.loc[mask, ["vu", "ymax"]]
            if len(out):
                yield out

    sky = ranged.mapInPandas(keep_frontier, "vu long, ymax long")
    return pts.join(
        sky,
        (pts["vu"] == sky["vu"]) & (pts["n"] == sky["ymax"]),
    ).select(pts["user_id"], pts["n"], pts["vu"])
