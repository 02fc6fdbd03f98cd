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
from pyspark.sql.window import Window

from insight_spark.operators.text import tokenize
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
    nonempty AS (SELECT * FROM toks WHERE len(ts) > 0),
    lines AS (
        SELECT doc_id,
               list_aggregate(
                   list_slice(ts, (i - 1) * {_LINE_LEN} + 1,
                              i * {_LINE_LEN}),
                   'string_agg', ' ') AS line
        FROM nonempty
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
    # empty-token docs produce a DESCENDING F.sequence(1, 0) — two
    # spurious empty "lines" the oracle never emits; drop them first
    # (mirrors bigram_lm_score's F.size guard)
    toks = docs.select(
        "doc_id", tokenize(F.col("text")).alias("ts")
    ).filter(F.size("ts") > 0)
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
           CAST(ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*)) AS BIGINT)
               / 1000000.0 AS avg_log_ratio
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
        (F.round(F.sum("s") / F.count("*")).cast("long")
         / F.lit(1000000.0)).alias("avg_log_ratio"),
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
    nrm AS (
        SELECT vec_id,
               CAST(list_sum(list_transform(e, x -> x * x)) AS BIGINT)
                   AS nrm2
        FROM emb
    ),
    pts AS (
        SELECT a3.vec_id, a3.cell, emb.e, nrm.nrm2
        FROM a3 JOIN emb USING (vec_id) JOIN nrm USING (vec_id)
    ),
    pairs AS (
        SELECT a.vec_id,
               floor(CAST(list_sum(list_transform(range(1, 65),
                                                  i -> a.e[i] * b.e[i]))
                          AS DOUBLE)
                     / (sqrt(CAST(a.nrm2 AS DOUBLE))
                        * sqrt(CAST(b.nrm2 AS DOUBLE)))
                     * 1000000 + 0.5) / 1000000.0 AS sim
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
           COALESCE(s.mx, -1.0) AS max_sim_lower,
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

    Kernel history, because each step was measured on the 10x probe
    (20k vectors, ~25M within-cell pairs):

    1. Plain cell equi-join + per-pair JVM array fold: AQE coalesced
       the small *input* shuffle to ONE partition while the *output*
       exploded quadratically — a single task that ran >12 min.  AQE's
       size-based rules cannot see explosion-under-coalescing.
    2. Salted join (``operators/partitioning.salted_join``) restored
       parallelism, but the per-pair zip_with/aggregate fold allocates
       two arrays per pair — the kernel, not the distribution, was the
       bottleneck (still minutes).
    3. Final form — the SemDeDup paper's own kernel, distributed: ONE
       ``applyInPandas`` per cell computing the pairwise Gram matrix
       with blocked numpy matmul.  On micro-int coordinates every
       product (<= 4e11) and 64-term sum (<= 3e13) is far below 2^53,
       so float64 BLAS is EXACT integer arithmetic — bit-equal to the
       DuckDB oracle's BIGINT folds, at BLAS speed.

    Scale: cells bound the quadratic term (K ~ sqrt(N) in production);
    per-cell memory is bounded by the row-blocked matmul (block x n,
    never n x n); Arrow batches stream group-wise, and the only
    shuffle is the groupBy(cell) exchange.
    """
    import numpy as np
    import pandas as pd

    from insight_spark.operators.clustering import lloyd, quantize_micro

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", quantize_micro(F.col("embedding")).alias("e"))
    # kernel="blas" (r12 opt): exact integer GEMM assignment, bit-
    # identical to the literal form (see kmeans_lloyd docstring) and
    # ~2x faster end-to-end at the registered knobs.
    final = lloyd(
        q, k=8, n_iter=2, vec_col="e", id_col="vec_id", kernel="blas"
    ).select("vec_id", "cell", "e")
    tau = _SEMDEDUP_TAU

    def score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        # exact: micro-int coords as float64 (all sums < 2^53)
        E = np.asarray(pdf["e"].tolist(), dtype="float64")
        n = len(pdf)
        # micro-int norms are integers >= 1 when nonzero; clamp the
        # all-zero-vector case so cosines stay finite (0, never NaN)
        # instead of diverging from the oracle's MAX-over-NaN semantics
        nrm = np.maximum(np.sqrt((E * E).sum(axis=1)), 1.0)
        mx = np.full(n, -1.0)
        B = 1024
        for s in range(0, n, B):
            g = E[s : s + B] @ E.T
            cos = g / (nrm[s : s + B, None] * nrm[None, :])
            cosr = np.floor(cos * 1000000 + 0.5) / 1000000.0
            for r in range(g.shape[0]):
                i = s + r
                if i > 0:
                    mx[i] = cosr[r, :i].max()
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "cell_id": pdf["cell"].astype("int32"),
                "n_lower": np.arange(n, dtype="int64"),
                "max_sim_lower": mx,
                "is_dup": (mx >= tau).astype("int32"),
            }
        )

    return final.groupBy("cell").applyInPandas(
        score_cell,
        schema="vec_id long, cell_id int, n_lower long, "
        "max_sim_lower double, is_dup int",
    )


#: Semantic-decontamination cosine threshold — below the fixture's
#: cross-slice max-cosine tail so every SF flags some rows (the
#: near-random vectors top out around 0.5, cf. _SEMDEDUP_TAU).
_SEMDECON_TAU = 0.35

#: Hard cap on the collected eval split (r9 verdict "what's wrong" #2):
#: a benchmark suite is model-sized (~1e3-1e5 items), but the fixture
#: proxy defines eval as 1/7 of the corpus, which would scale the
#: driver matrix linearly with data.  The cap makes the bounded-driver
#: -state claim STRUCTURAL: both engine and oracle take the lowest
#: `_SEMDECON_EVAL_CAP` vec_ids of the slice (deterministic order), so
#: the collect is O(cap·dim) ≈ 32 MB worst case regardless of corpus
#: size.  All test SFs sit far below the cap, so results are unchanged.
_SEMDECON_EVAL_CAP = 65536


def _semantic_decon_oracle() -> str:
    return f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                             AS BIGINT)) AS e
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, e,
               greatest(sqrt(CAST(list_sum(list_transform(e, x -> x * x))
                                  AS DOUBLE)), 1.0) AS nrm
        FROM q
    ),
    sims AS (
        SELECT c.vec_id,
               floor(CAST(list_sum(list_transform(range(1, 65),
                                                  i -> c.e[i] * ev.e[i]))
                          AS DOUBLE)
                     / (c.nrm * ev.nrm) * 1000000 + 0.5) / 1000000.0 AS sim
        FROM (SELECT * FROM n WHERE vec_id % 7 <> 0) c
        CROSS JOIN (SELECT * FROM n WHERE vec_id % 7 = 0
                    ORDER BY vec_id LIMIT {_SEMDECON_EVAL_CAP}) ev
    )
    SELECT vec_id,
           CAST(SUM(CASE WHEN sim >= {_SEMDECON_TAU} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_eval_hits,
           MAX(sim) AS max_sim_eval,
           CAST(CASE WHEN MAX(sim) >= {_SEMDECON_TAU} THEN 1 ELSE 0 END
                AS INTEGER) AS is_contaminated
    FROM sims GROUP BY vec_id
    """


@query("semantic_decontaminate", oracle=_semantic_decon_oracle())
def semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination — the third leg of the
    decontamination family: ``ngram_decontaminate`` catches verbatim
    quotes, ``fuzzy_decontaminate`` catches shingle-level paraphrase,
    and this catches SEMANTIC restatements that share no surface form
    (translated, heavily reworded, or format-converted benchmark
    items), by flagging training vectors whose max cosine to any
    eval-set vector reaches tau.

    Eval set = the deterministic vec_id % 7 == 0 slice (the
    ``fuzzy_decontaminate`` convention), hard-capped by construction
    at the lowest ``_SEMDECON_EVAL_CAP`` vec_ids on BOTH sides, so the
    driver collect is O(cap x dim) — a structural bound, not a fixture
    accident.  Scale shape: the eval matrix is MODEL-sized state (a
    benchmark suite is ~1e3-1e5 vectors; the cap admits 65536) —
    collected once like IVF centroids and closed over by a
    ``mapInPandas`` scan, so the 100 TB corpus is read exactly once,
    map-only, ZERO shuffles; per-batch cost is one BLAS matmul
    (corpus_batch x eval).  Exactness: micro-int coordinates make
    every dot product integer arithmetic below 2^53, so float64 BLAS
    is bit-equal to the oracle's BIGINT folds (the ``semantic_dedup``
    kernel argument), and the 6-dp floor-rounding happens on
    identical doubles on both sides.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from insight_spark.operators.clustering import quantize_micro

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", quantize_micro(F.col("embedding")).alias("e"))
    corpus = q.filter(F.col("vec_id") % 7 != 0)
    # bounded-BY-CONSTRUCTION driver state: at most _SEMDECON_EVAL_CAP
    # rows (TakeOrdered, deterministic lowest-vec_id prefix — matches
    # the oracle's ORDER BY vec_id LIMIT), cf. IVF centroids
    ev_rows = (
        q.filter(F.col("vec_id") % 7 == 0)
        .orderBy("vec_id")
        .limit(_SEMDECON_EVAL_CAP)
        .collect()
    )
    EV = np.asarray([r["e"] for r in ev_rows], dtype="float64")
    ev_nrm = np.maximum(np.sqrt((EV * EV).sum(axis=1)), 1.0)
    tau = _SEMDECON_TAU

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.asarray(pdf["e"].tolist(), dtype="float64")
            nrm = np.maximum(np.sqrt((E * E).sum(axis=1)), 1.0)
            cos = (E @ EV.T) / (nrm[:, None] * ev_nrm[None, :])
            cosr = np.floor(cos * 1000000 + 0.5) / 1000000.0
            mx = cosr.max(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "n_eval_hits": (cosr >= tau).sum(axis=1).astype("int64"),
                    "max_sim_eval": mx,
                    "is_contaminated": (mx >= tau).astype("int32"),
                }
            )

    return corpus.mapInPandas(
        scan,
        schema="vec_id long, n_eval_hits long, max_sim_eval double, "
        "is_contaminated int",
    )


@query(
    "bigram_lm_score",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), t -> t <> '')
                   AS ts
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ts)),
                                     i -> [ts[i], ts[i + 1]])) AS g
        FROM toks WHERE len(ts) >= 2
    ),
    pairs AS (SELECT doc_id, g[1] AS w1, g[2] AS w2 FROM grams),
    uni AS (
        SELECT w, COUNT(*) AS cu
        FROM (SELECT unnest(ts) AS w FROM toks) GROUP BY w
    ),
    tot AS (SELECT SUM(cu) AS t FROM uni),
    big AS (SELECT w1, w2, COUNT(*) AS cb FROM pairs GROUP BY w1, w2),
    micro AS (
        SELECT p.doc_id,
               CAST(ROUND(-log10(
                   0.7 * (CAST(b.cb AS DOUBLE) / u1.cu)
                   + 0.3 * (CAST(u2.cu AS DOUBLE) / tot.t)
               ) * 1000000) AS BIGINT) AS s
        FROM pairs p
        JOIN big b ON b.w1 = p.w1 AND b.w2 = p.w2
        JOIN uni u1 ON u1.w = p.w1
        JOIN uni u2 ON u2.w = p.w2
        CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*)) AS BIGINT)
           / 1000000.0 AS avg_surprisal
    FROM micro GROUP BY doc_id
    """,
)
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM quality score — the upgrade of
    ``unigram_surprisal_score`` every production LM-filter makes:
    per-doc mean surprisal under p = 0.7 * p(w2|w1) + 0.3 * p(w2),
    with both model tables estimated from the corpus itself.  Docs
    whose word ORDER is unusual (shuffled text, keyword stuffing)
    now score high even when their unigram mix looks normal.

    Scale shape: two word-count aggregates (bigram table keyed on the
    pair, unigram on the token — both vocabulary-bounded, both
    broadcast back onto the gram stream); the per-doc agg shuffles on
    doc_id.  Float discipline: the per-gram surprisal is rounded to
    integer micro-units before the per-doc sum (order-independent,
    exact), one final division.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize(F.col("text")).alias("ts")).filter(
        F.size("ts") >= 2
    )
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ts") - 1),
                lambda i: F.struct(
                    F.element_at("ts", i).alias("w1"),
                    F.element_at("ts", i + 1).alias("w2"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    uni = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cu"))
    )
    tot = uni.agg(F.sum("cu").alias("t"))
    big = pairs.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("cu").alias("cu1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cu").alias("cu2"))
    p = 0.7 * (F.col("cb").cast("double") / F.col("cu1")) + 0.3 * (
        F.col("cu2").cast("double") / F.col("t")
    )
    micro = (
        pairs.join(F.broadcast(big), ["w1", "w2"])
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(-F.log10(p) * 1000000).cast("long").alias("s"),
        )
    )
    return micro.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        (F.round(F.sum("s") / F.count("*")).cast("long")
         / F.lit(1000000.0)).alias("avg_surprisal"),
    )


@query(
    "twap_user_value",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v_micro,
               epoch_us(ts) AS t,
               LEAD(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS t_next
        FROM events
    ),
    weighted AS (
        SELECT user_id,
               CAST(v_micro AS DECIMAL(38,0)) * CAST(t_next - t AS DECIMAL(38,0))
                   AS wv,
               CAST(t_next - t AS DECIMAL(38,0)) AS dt
        FROM seq WHERE t_next IS NOT NULL AND t_next > t
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           floor(CAST(SUM(wv) AS DOUBLE) / CAST(SUM(dt) AS DOUBLE)
                 + 0.5) / 1000000.0 AS twap
    FROM weighted GROUP BY user_id
    """,
)
def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP) — each reading is
    held until the next one, so its weight is the interval it was live
    (finance's TWAP / monitoring's time-weighted mean; the plain AVG
    overweights burst periods).

    One LEAD window per user (single exchange on user_id, the key the
    sessionizer already uses), zero-length intervals dropped.  Exact
    arithmetic: values quantized to micro-int, intervals are integer
    MICROseconds (epoch_us/unix_micros — whole-second truncation would
    silently diverge on sub-second timestamps, and DuckDB's epoch() is
    a fractional double), products and sums carried as DECIMAL(38,0) (no float
    accumulation, no BIGINT overflow at any scale); one final double
    division with floor-idiom rounding.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("v_micro"),
        F.unix_micros("ts").alias("t"),
        F.unix_micros(F.lead("ts").over(w)).alias("t_next"),
    )
    weighted = seq.filter(
        F.col("t_next").isNotNull() & (F.col("t_next") > F.col("t"))
    ).select(
        "user_id",
        (
            F.col("v_micro").cast("decimal(38,0)")
            * (F.col("t_next") - F.col("t")).cast("decimal(38,0)")
        ).alias("wv"),
        (F.col("t_next") - F.col("t")).cast("decimal(38,0)").alias("dt"),
    )
    return weighted.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        (
            F.floor(
                F.sum("wv").cast("double") / F.sum("dt").cast("double")
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("twap"),
    )


@query(
    "span_merge_intervals",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS l
        FROM documents
    ),
    pos AS (
        SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS p
        FROM toks
    ),
    spans AS (
        SELECT doc_id, greatest(p - 1, 0) AS s, p + 1 AS e
        FROM pos WHERE regexp_matches(tok, '[0-9]')
    ),
    marked AS (
        SELECT doc_id, s, e,
               CASE WHEN MAX(e) OVER w IS NULL OR s > MAX(e) OVER w
                    THEN 1 ELSE 0 END AS brk
        FROM spans
        WINDOW w AS (PARTITION BY doc_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    isl AS (
        SELECT doc_id, s, e,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY s, e
                              ROWS UNBOUNDED PRECEDING) AS island
        FROM marked
    ),
    merged AS (
        SELECT doc_id, island, MIN(s) AS ms, MAX(e) AS me
        FROM isl GROUP BY doc_id, island
    ),
    raw AS (SELECT doc_id, COUNT(*) AS n_raw FROM spans GROUP BY doc_id)
    SELECT m.doc_id,
           CAST(r.n_raw AS BIGINT) AS n_raw_spans,
           CAST(COUNT(*) AS BIGINT) AS n_merged_spans,
           CAST(SUM(me - ms + 1) AS BIGINT) AS covered_tokens
    FROM merged m JOIN raw r USING (doc_id)
    GROUP BY m.doc_id, r.n_raw
    """,
)
def span_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing (PII-masking span merge): pad every
    digit-bearing token to a ±1-token span, merge overlapping spans
    per document (gaps-and-islands: running-max window + break-count
    island ids), report raw vs merged span counts and total covered
    tokens — the bookkeeping a redaction pass emits before masking.

    The merge is the classic interval-union shape every span-level
    cleaner needs (PII windows, dup spans, quote regions).  Windows
    are partitioned by doc_id — per-doc span counts are bounded, so
    no task ever holds more than one document's spans.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(tokenize(F.col("text"))).alias("p", "tok")
    )
    spans = pos.filter(F.col("tok").rlike("[0-9]")).select(
        "doc_id",
        F.greatest(F.col("p") - 1, F.lit(0)).alias("s"),
        (F.col("p") + 1).alias("e"),
    )
    w = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked = spans.withColumn(
        "brk",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0),
    )
    isl = marked.withColumn(
        "island", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    merged = isl.groupBy("doc_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    raw = spans.groupBy("doc_id").agg(F.count("*").alias("n_raw_spans"))
    out = merged.groupBy("doc_id").agg(
        F.count("*").alias("n_merged_spans"),
        F.sum(F.col("me") - F.col("ms") + 1).alias("covered_tokens"),
    )
    return raw.join(out, "doc_id").select(
        "doc_id", "n_raw_spans", "n_merged_spans", "covered_tokens"
    )


#: Observed quality gate (M129) floor: distinct-token ratio >= 1/2,
#: enforced as the exact rational predicate 2*distinct >= total.


def quality_gate_observed(docs: DataFrame):
    """Quality gate with IN-FLIGHT audit metrics via ``observe()``
    (M129): filter docs whose distinct-token ratio falls below the
    0.5 floor, and record (rows seen, rows dropped, mean ratio) as
    named observation metrics collected DURING the same job.

    Returns ``(gated_df, observation)``.  At 100 TB the observe()
    metrics are the difference between "the gate dropped 3.1% today"
    showing up in monitoring for free and paying a SECOND full-corpus
    aggregation to learn it: Spark accumulates the metric expressions
    on the same pass that executes the filter, with no extra shuffle
    or scan (the observe node is a CollectMetrics wrapper in the same
    stage).  Gate semantics are value-oracled via the companion query;
    the metric values are pinned against an independent recount in
    tests/test_observe_metrics.py.

    Float discipline (r7 hardening, found by the sf0.001 parity gate):
    every HASHED quantity is exact integer arithmetic — the gate
    predicate is the rational form ``2*distinct >= total`` and the
    per-doc ratio is half-up-rounded to 1e-6 units via integer
    division ``(2e6*d + s) div (2*s)``, because engine ROUND(double)
    implementations legitimately disagree by 1 ulp at shortest-repr
    boundaries (Spark rounds the DECIMAL shortest repr, DuckDB rounds
    in double space).  The observation's display mean keeps a rounded
    double (single-engine, test-pinned only).
    """
    from pyspark.sql import Observation

    toks = tokenize(F.col("text"))
    scored = docs.withColumn("_d", F.size(F.array_distinct(toks))).withColumn(
        "_s", F.size(toks)
    )
    keep = (F.col("_s") > 0) & (2 * F.col("_d") >= F.col("_s"))
    # exact half-up micro-units: (2e6*d + s) div (2*s), integer ops only.
    # F.size() is 32-bit INT, so widen BEFORE multiplying: a doc with
    # >= 1074 distinct tokens overflows 2000000*_d in INT arithmetic
    # (ArithmeticException under Spark 4 ANSI mode, silently wrong with
    # ANSI off) while the DuckDB oracle computes in BIGINT.
    micro = F.expr(
        "(2000000 * CAST(_d AS BIGINT) + _s) div (2 * CAST(_s AS BIGINT))"
    ).alias("ratio_micro")
    obs = Observation("quality_gate")
    observed = scored.observe(
        obs,
        F.count(F.lit(1)).alias("n_seen"),
        F.sum(F.when(~keep, 1).otherwise(0)).alias("n_dropped"),
        F.round(
            F.avg(
                F.when(
                    F.col("_s") > 0,
                    F.col("_d").cast("double") / F.col("_s"),
                ).otherwise(F.lit(0.0))
            ),
            6,
        ).alias("mean_ratio"),
    )
    gated = observed.filter(keep).withColumn("ratio_micro", micro)
    return gated, obs


@query(
    "observed_quality_gate",
    oracle=r"""
    WITH scored AS (
        SELECT source,
               len(list_distinct(list_filter(
                   string_split_regex(text, '\s+'), t -> t <> ''))) AS d,
               len(list_filter(
                   string_split_regex(text, '\s+'), t -> t <> '')) AS s
        FROM documents
    ),
    kept AS (
        SELECT source, (2000000 * d + s) // (2 * s) AS ratio_micro
        FROM scored WHERE s > 0 AND 2 * d >= s
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(ratio_micro) AS DOUBLE) / 1000000.0 / COUNT(*)
               AS mean_kept_ratio
    FROM kept GROUP BY source
    """,
)
def observed_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M129 driver surface for ``quality_gate_observed``: per-source
    survivor counts + mean kept ratio.  All hashed values are exact:
    counts, integer micro-unit ratios, and a final double derived
    from them by the identical (sum/1e6)/n expression on both
    engines — bit-equal under IEEE division, so no terminal ROUND is
    needed (terminal ROUND(double) is exactly where engines diverge
    by 1 ulp; see quality_gate_observed docstring).  The observe()
    metrics themselves are runtime state on the Observation handle —
    asserted against an independent recount in
    tests/test_observe_metrics.py, the same evidence split as the
    streaming state ops."""
    docs = load_table(spark, sf_dir, "documents")
    gated, _obs = quality_gate_observed(docs)
    return gated.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        (
            F.sum("ratio_micro").cast("double")
            / F.lit(1000000.0)
            / F.count("*")
        ).alias("mean_kept_ratio"),
    )


#: C4-style blocklist (Raffel et al. 2020 §2.2 "bad words" filter).
#: Three literal terms chosen for coverage of the audit's three cases
#: on the fixture vocabulary: a rare term ("dup", ~5% of docs), a
#: common term ("slow", ~95% of docs — density, not presence, must
#: gate), and an absent term ("stale", 0 hits — the list entry that
#: never fires).  A production list swaps in the real lexicon; every
#: downstream expression is unchanged.
_BLOCKLIST = ("dup", "slow", "stale")

#: Flag threshold: blocklist tokens >= 4% of the document's tokens.
#: Expressed as the integer cross-multiplication 25*hits >= n_tokens
#: (1e6*hits/n >= 40000 <=> 25*hits >= n) so the gate never touches a
#: float on either engine.
_BLOCK_DENSITY_PCT = 4


@query(
    "blocklist_filter_audit",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(text, '\s+'), t -> t <> '')
                   AS l
        FROM documents
    ),
    scored AS (
        SELECT source,
               len(l) AS n_tok,
               len(list_filter(l,
                   t -> list_contains(['dup', 'slow', 'stale'], t)))
                   AS hits,
               len(list_filter(l, t -> t = 'dup')) AS rare_hits
        FROM toks WHERE len(l) > 0
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE 25 * hits >= n_tok) AS BIGINT)
               AS n_flagged,
           CAST(COUNT(*) FILTER (WHERE rare_hits > 0) AS BIGINT)
               AS n_rare_term_docs,
           CAST(SUM(hits) AS BIGINT) AS total_hits,
           CAST(MAX(1000000 * hits // n_tok) AS BIGINT)
               AS max_density_micro
    FROM scored GROUP BY source
    """,
)
def blocklist_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist filter audit (M158): per source, how many
    documents a bad-words filter would flag at a 4%-of-tokens density
    threshold, how many contain the rare term at all, total hits, and
    the worst per-doc density — the pre-flight report run BEFORE
    committing a lexicon filter to a crawl (C4 dropped ~5% of docs to
    its list; the per-source split says which feeds pay).  Density
    gates, not presence gates, because common terms appear in nearly
    every document — presence would flag the whole corpus.

    Exactness: the flag is the integer cross-multiplication
    25*hits >= n_tokens and the density report an integer division to
    micro-units — no float reaches a hashed column on either engine.

    Scale: one map-only projection (split + two higher-order filters,
    blocklist inlined as an array literal — at lexicon sizes beyond
    literals, a broadcast join on exploded tokens), then a
    |sources|-keyed aggregate.  Zero corpus-sized shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    block_arr = F.array(*[F.lit(t) for t in _BLOCKLIST])
    l = tokenize(F.col("text"))
    scored = docs.select(
        "source",
        F.size(l).alias("n_tok"),
        F.size(
            F.filter(l, lambda t: F.array_contains(block_arr, t))
        ).alias("hits"),
        F.size(F.filter(l, lambda t: t == "dup")).alias("rare_hits"),
    ).filter(F.col("n_tok") > 0)
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_if(25 * F.col("hits") >= F.col("n_tok")).alias("n_flagged"),
        F.count_if(F.col("rare_hits") > 0).alias("n_rare_term_docs"),
        F.sum("hits").alias("total_hits"),
        F.max(
            F.expr("1000000 * hits div n_tok")
        ).alias("max_density_micro"),
    )


#: Thresholds (micro-units of mean surprisal) for the LM-filter sweep.
#: Spans the fixture's observed avg_surprisal range (~1.3-1.6) so every
#: tier produces a non-trivial keep-rate curve.
_SURPRISAL_SWEEP_MICRO = (1400000, 1450000, 1500000, 1550000, 1600000)

from insight_spark.queries import _ORACLE as _REGISTERED_ORACLES  # noqa: E402


@query(
    "surprisal_filter_sweep",
    oracle=f"""
    WITH scored AS ({_REGISTERED_ORACLES["bigram_lm_score"]}),
    th AS (
        SELECT unnest([{", ".join(str(t) for t in _SURPRISAL_SWEEP_MICRO)}])
            AS t_micro
    )
    SELECT CAST(t_micro AS BIGINT) AS threshold_micro,
           CAST(COUNT(*) AS BIGINT) AS n_scored,
           CAST(COUNT(*) FILTER (
                WHERE avg_surprisal <= t_micro / 1000000.0) AS BIGINT)
               AS n_kept,
           CAST(COUNT(*) FILTER (
                WHERE avg_surprisal <= t_micro / 1000000.0) AS DOUBLE)
               / COUNT(*) AS kept_frac
    FROM scored CROSS JOIN th
    GROUP BY t_micro
    """,
)
def surprisal_filter_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-filter threshold sweep (M172): the keep-rate curve of the
    bigram-LM quality filter (M83) at five candidate thresholds — the
    knob-setting report read before committing a perplexity cutoff to
    a crawl (CCNet picked its tercile boundaries from exactly this
    curve; "keep 70%" is a budget decision, and this table is where
    the budget meets the data).

    Parity: the per-doc scores are the M83 pipeline verbatim (oracle
    text reused from the registered query, so the two cannot drift);
    thresholds are integer micro literals divided by 1e6 — the same
    double on both engines; counts integer, kept_frac ONE division.

    Scale: the score table is computed once (two vocabulary-bounded LM
    broadcasts + one doc-keyed agg — M83's shape); the sweep is a
    5-row broadcast cross join over the |docs|-row score table and a
    5-key aggregate.  Adding thresholds changes the constant, nothing
    else.
    """
    scored = bigram_lm_score(spark, sf_dir)
    th = spark.createDataFrame(
        [(t,) for t in _SURPRISAL_SWEEP_MICRO], "t_micro long"
    )
    kept = F.count_if(
        F.col("avg_surprisal") <= F.col("t_micro") / F.lit(1000000.0)
    )
    return (
        scored.crossJoin(F.broadcast(th))
        .groupBy(F.col("t_micro").alias("threshold_micro"))
        .agg(
            F.count("*").alias("n_scored"),
            kept.alias("n_kept"),
            (kept.cast("double") / F.count("*")).alias("kept_frac"),
        )
    )


#: Encoding-artifact character classes (shared regex dialect — the
#: \x{...} code-point escape parses identically in Java regex and RE2,
#: SURVEY §7.4.5).  C0 controls exclude \t \n \r (legitimate text).
_ENC_FFFD = r"\x{fffd}"
_ENC_ZERO_WIDTH = r"[\x{200b}\x{200c}\x{200d}\x{feff}]"
_ENC_CONTROL = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"
_ENC_ANY = (
    r"[\x{fffd}\x{200b}\x{200c}\x{200d}\x{feff}\x{a0}"
    r"\x00-\x08\x0b\x0c\x0e-\x1f]"
)


@query(
    "encoding_artifact_audit",
    oracle=f"""
    WITH raw AS (
        SELECT source,
               CASE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                   WHEN '0' THEN text || chr(65533)
                   WHEN '1' THEN text || chr(65533)
                   WHEN '2' THEN chr(8203) || text
                   WHEN '3' THEN text || chr(160)
                   WHEN '4' THEN text || chr(7)
                   ELSE text
               END AS t
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(count_if(regexp_matches(t, '{_ENC_FFFD}')) AS BIGINT)
               AS n_replacement,
           CAST(count_if(regexp_matches(t, '{_ENC_ZERO_WIDTH}')) AS BIGINT)
               AS n_zero_width,
           CAST(count_if(regexp_matches(t, '{_ENC_CONTROL}')) AS BIGINT)
               AS n_control,
           CAST(count_if(contains(t, chr(160))) AS BIGINT) AS n_nbsp,
           CAST(SUM(len(t) - len(regexp_replace(t, '{_ENC_ANY}', '', 'g')))
                AS BIGINT) AS artifact_chars,
           CAST(count_if(NOT regexp_matches(t, '{_ENC_ANY}')) AS DOUBLE)
               / COUNT(*) AS clean_frac
    FROM raw GROUP BY source
    """,
)
def encoding_artifact_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-artifact audit (M176): per-source counts of the
    mojibake fingerprints every web-scale corpus carries — U+FFFD
    replacement characters (a decoder already lost bytes), zero-width
    characters (C&P/SEO junk that poisons tokenizers), C0 control
    characters other than tab/newline/CR, and non-breaking spaces —
    plus total artifact characters and the per-source clean fraction.
    The report that decides whether a source needs re-extraction
    before it is worth quality-scoring.

    The fixture text is pure ASCII, so a deterministic md5-keyed
    corruption stand-in (~5/16 of docs get one artifact class each,
    the kappa/M160 pattern) plays the raw crawl; point the audit at a
    real raw-text column and the CASE disappears.

    Exactness: artifact detection is shared-dialect regex (the \\x{{..}}
    code-point escape parses identically in Java regex and RE2);
    counts are exact BIGINTs, clean_frac ONE IEEE division.

    Scale: map-only regex projection (codegen, no Python) + one
    |sources|-keyed map-side-combined aggregate — zero joins, zero
    windows, pushdown-transparent.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    t = (
        F.when(h.isin("0", "1"), F.concat(F.col("text"), F.lit(chr(0xFFFD))))
        .when(h == "2", F.concat(F.lit(chr(0x200B)), F.col("text")))
        .when(h == "3", F.concat(F.col("text"), F.lit(chr(0xA0))))
        .when(h == "4", F.concat(F.col("text"), F.lit(chr(0x07))))
        .otherwise(F.col("text"))
    )
    raw = docs.select("source", t.alias("t"))
    return raw.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_if(F.col("t").rlike(_ENC_FFFD))
        .cast("long")
        .alias("n_replacement"),
        F.count_if(F.col("t").rlike(_ENC_ZERO_WIDTH))
        .cast("long")
        .alias("n_zero_width"),
        F.count_if(F.col("t").rlike(_ENC_CONTROL))
        .cast("long")
        .alias("n_control"),
        F.count_if(F.col("t").contains(chr(0xA0)))
        .cast("long")
        .alias("n_nbsp"),
        F.sum(
            F.length("t") - F.length(F.regexp_replace("t", _ENC_ANY, ""))
        )
        .cast("long")
        .alias("artifact_chars"),
        (
            F.count_if(~F.col("t").rlike(_ENC_ANY)).cast("double")
            / F.count("*")
        ).alias("clean_frac"),
    )


@query(
    "normalization_dedup_delta",
    oracle=r"""
    WITH variants AS (
        SELECT source, doc_id, text FROM documents
        UNION ALL
        SELECT source, doc_id + 1000000 AS doc_id,
               CASE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                   WHEN '0' THEN upper(text)
                   WHEN '1' THEN text || ' !!!'
                   ELSE '  ' || text
               END AS text
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '2'
    ),
    digests AS (
        SELECT source, doc_id,
               md5(text) AS raw_d,
               md5(trim(regexp_replace(regexp_replace(lower(text),
                        '[^a-z0-9 \t\n]', '', 'g'),
                        '[ \t\n]+', ' ', 'g'))) AS norm_d
        FROM variants
    ),
    raw_dup AS (
        SELECT source, raw_d, COUNT(*) AS n FROM digests
        GROUP BY source, raw_d HAVING COUNT(*) >= 2
    ),
    norm_dup AS (
        SELECT source, norm_d, COUNT(*) AS n FROM digests
        GROUP BY source, norm_d HAVING COUNT(*) >= 2
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COALESCE((SELECT SUM(n) FROM raw_dup r
                          WHERE r.source = d.source), 0) AS BIGINT)
               AS dup_docs_raw,
           CAST(COALESCE((SELECT SUM(n) FROM norm_dup m
                          WHERE m.source = d.source), 0) AS BIGINT)
               AS dup_docs_norm,
           CAST(COALESCE((SELECT SUM(n) FROM norm_dup m
                          WHERE m.source = d.source), 0)
                - COALESCE((SELECT SUM(n) FROM raw_dup r
                            WHERE r.source = d.source), 0) AS BIGINT)
               AS normalization_delta
    FROM digests d GROUP BY d.source
    """,
)
def normalization_dedup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization dedup delta (M201): how many MORE duplicate
    documents does exact dedup find after text normalization
    (casefold → strip non-alphanumerics → collapse whitespace → trim)
    than on raw bytes — the knob table behind "aggressive vs
    conservative" exact-dedup policy (C4 normalized before hashing;
    raw-byte hashing misses every trivially-reformatted mirror).
    Trivial crawl variants (case flips, trailing punctuation, leading
    whitespace — the md5-keyed injection, ~3/16 of docs get one
    variant copy each) stand in for the real mirrors a crawl
    carries; the audit reports per-source duplicate-doc counts under
    both digests and the delta normalization buys.

    Parity: the normalization chain is shared-dialect regex
    (explicit [^a-z0-9 \\t\\n] class — no POSIX [[:punct:]]
    divergence); digests are md5 of identical strings; all counts
    exact BIGINTs, no division at all.

    Scale: map-only normalize + two digest-keyed aggregates (the
    `dedup_hash` shuffle shape, run twice on 32-byte keys) + a
    \\|sources\\|-keyed rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    perturbed = docs.where(h <= "2").select(
        "source",
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.when(h == "0", F.upper("text"))
        .when(h == "1", F.concat(F.col("text"), F.lit(" !!!")))
        .otherwise(F.concat(F.lit("  "), F.col("text")))
        .alias("text"),
    )
    variants = docs.select("source", "doc_id", "text").unionAll(perturbed)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 \t\n]", ""),
            "[ \t\n]+",
            " ",
        )
    )
    digests = variants.select(
        "source",
        "doc_id",
        F.md5("text").alias("raw_d"),
        F.md5(norm).alias("norm_d"),
    )

    def dup_docs(col: str, out: str) -> DataFrame:
        return (
            digests.groupBy("source", col)
            .agg(F.count("*").alias("n"))
            .where(F.col("n") >= 2)
            .groupBy("source")
            .agg(F.sum("n").cast("long").alias(out))
        )

    raw_dup = dup_docs("raw_d", "dup_docs_raw")
    norm_dup = dup_docs("norm_d", "dup_docs_norm")
    return (
        digests.groupBy("source")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .join(raw_dup, "source", "left")
        .join(norm_dup, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("dup_docs_raw", F.lit(0))
            .cast("long")
            .alias("dup_docs_raw"),
            F.coalesce("dup_docs_norm", F.lit(0))
            .cast("long")
            .alias("dup_docs_norm"),
            (
                F.coalesce("dup_docs_norm", F.lit(0))
                - F.coalesce("dup_docs_raw", F.lit(0))
            )
            .cast("long")
            .alias("normalization_delta"),
        )
    )


#: Stopword gate lexicon (shared verbatim with the oracle — the
#: text_extra.STOPWORDS list, inlined to keep this module's oracle
#: self-contained).
_STOP_GATE = ("the", "a", "of", "and", "to", "in")
_STOP_IN_SQL = ", ".join(f"'{s}'" for s in _STOP_GATE)


@query(
    "predicate_selectivity_profile",
    oracle=rf"""
    WITH toks AS (
        SELECT list_filter(string_split_regex(text, '\s+'),
                           t -> t <> '') AS l,
               text
        FROM documents
    ),
    flags AS (
        SELECT CAST(len(l) < 20 AS INT) AS d_len,
               CAST(20 * len(list_filter(l, t -> t IN ({_STOP_IN_SQL})))
                    < len(l) AS INT) AS d_stop,
               CAST(5 * len(list_distinct(l)) < 3 * len(l) AS INT)
                   AS d_dup,
               CAST(len(text) < 80 AS INT) AS d_char
        FROM toks
    ),
    rates AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(d_len) AS BIGINT) AS x_len,
               CAST(SUM(d_stop) AS BIGINT) AS x_stop,
               CAST(SUM(d_dup) AS BIGINT) AS x_dup,
               CAST(SUM(d_char) AS BIGINT) AS x_char
        FROM flags
    ),
    gates AS (
        SELECT 'len_lt_20' AS gate, CAST(1 AS BIGINT) AS unit_cost,
               n, x_len AS n_dropped FROM rates
        UNION ALL
        SELECT 'stopword_lt_5pct', 2, n, x_stop FROM rates
        UNION ALL
        SELECT 'distinct_ratio_lt_60pct', 2, n, x_dup FROM rates
        UNION ALL
        SELECT 'chars_lt_80', 1, n, x_char FROM rates
    ),
    scored AS (
        SELECT gate, unit_cost, n, n_dropped,
               CAST(1000000 * n_dropped // n AS BIGINT) AS drop_ppm
        FROM gates
    )
    SELECT a.gate, a.unit_cost, a.n_dropped, a.drop_ppm,
           CAST(1 + (SELECT COUNT(*) FROM scored b
                     WHERE b.drop_ppm * a.unit_cost
                           > a.drop_ppm * b.unit_cost
                        OR (b.drop_ppm * a.unit_cost
                            = a.drop_ppm * b.unit_cost
                            AND b.gate < a.gate)) AS INT) AS greedy_rank
    FROM scored a
    """,
)
def predicate_selectivity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascade filter-ordering profile (M205): measured drop rate and
    unit cost for each corpus-quality gate, plus the GREEDY execution
    rank (highest selectivity-per-cost first — the classic
    predicate-ordering result).  At 100 TB the order the hygiene
    cascade runs in IS the pipeline's cost: a cheap gate that drops
    30% first means every later, pricier gate scans 30% less — this
    table is read before wiring `data_prep_funnel`'s stage order, the
    same reasoning Catalyst applies to conjunctive predicates,
    surfaced for the stages an optimizer can't see inside.

    Exactness: selectivities are exact integer ppm divisions; the
    greedy rank compares the rationals drop/cost by CROSS
    MULTIPLICATION (b.drop·a.cost > a.drop·b.cost — no float ratio
    anywhere) with the gate name as tie-break, computed as a 4×4
    count-of-better self-join rather than a window.

    Scale: ONE map-side-combined aggregate measures all four gates in
    a single corpus pass (each flag a codegen'd array/string
    expression); everything after is 4-row math.
    """
    docs = load_table(spark, sf_dir, "documents")
    l = tokenize(F.col("text"))
    flags = docs.select(
        (F.size(l) < 20).cast("int").alias("d_len"),
        (
            20 * F.size(F.filter(l, lambda t: t.isin(*_STOP_GATE)))
            < F.size(l)
        )
        .cast("int")
        .alias("d_stop"),
        (5 * F.size(F.array_distinct(l)) < 3 * F.size(l))
        .cast("int")
        .alias("d_dup"),
        (F.length("text") < 80).cast("int").alias("d_char"),
    )
    rates = flags.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("d_len").cast("long").alias("x_len"),
        F.sum("d_stop").cast("long").alias("x_stop"),
        F.sum("d_dup").cast("long").alias("x_dup"),
        F.sum("d_char").cast("long").alias("x_char"),
    )
    gate_defs = (
        ("len_lt_20", 1, "x_len"),
        ("stopword_lt_5pct", 2, "x_stop"),
        ("distinct_ratio_lt_60pct", 2, "x_dup"),
        ("chars_lt_80", 1, "x_char"),
    )
    parts = [
        rates.select(
            F.lit(name).alias("gate"),
            F.lit(cost).cast("long").alias("unit_cost"),
            F.col("n"),
            F.col(col).alias("n_dropped"),
        )
        for name, cost, col in gate_defs
    ]
    gates = parts[0].unionAll(parts[1]).unionAll(parts[2]).unionAll(parts[3])
    scored = gates.select(
        "gate",
        "unit_cost",
        "n_dropped",
        F.expr("CAST(1000000 * n_dropped div n AS BIGINT)").alias(
            "drop_ppm"
        ),
    )
    a = scored.alias("a")
    b = scored.select(
        F.col("gate").alias("b_gate"),
        F.col("unit_cost").alias("b_cost"),
        F.col("drop_ppm").alias("b_ppm"),
    )
    better = (
        F.col("b_ppm") * F.col("a.unit_cost")
        > F.col("a.drop_ppm") * F.col("b_cost")
    ) | (
        (
            F.col("b_ppm") * F.col("a.unit_cost")
            == F.col("a.drop_ppm") * F.col("b_cost")
        )
        & (F.col("b_gate") < F.col("a.gate"))
    )
    return (
        a.join(F.broadcast(b), better, "left")
        .groupBy("a.gate", "a.unit_cost", "a.n_dropped", "a.drop_ppm")
        .agg((F.count("b_gate") + 1).cast("int").alias("greedy_rank"))
        .select(
            F.col("gate"),
            F.col("unit_cost"),
            F.col("n_dropped"),
            F.col("drop_ppm"),
            "greedy_rank",
        )
    )


#: Special-token literals audited by ``special_token_contamination``.
#: Chosen with NO substring collisions (e.g. '<s>' would also match
#: inside '</s>' and corrupt the counts).
_SPECIAL_TOKENS = (
    "<|endoftext|>",
    "[INST]",
    "<|im_start|>",
    "<|im_end|>",
    "<pad>",
)


@query(
    "special_token_contamination",
    oracle="""
    WITH inj AS (
        SELECT CASE
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      IN ('0', '1', '2')
                 THEN text || ' ' ||
                      (['<|endoftext|>', '[INST]', '<|im_start|>',
                        '<|im_end|>', '<pad>'])[
                          1 + (instr('0123456789abcdef',
                                     substr(md5(CAST(doc_id AS VARCHAR)),
                                            2, 1)) - 1) % 5]
                 ELSE text
               END AS t
        FROM documents
    ),
    tk AS (
        SELECT unnest(['<|endoftext|>', '[INST]', '<|im_start|>',
                       '<|im_end|>', '<pad>']) AS token
    )
    SELECT tk.token,
           CAST(count_if(contains(t, token)) AS BIGINT) AS n_docs,
           CAST(SUM((len(t) - len(replace(t, token, ''))) // len(token))
                AS BIGINT) AS n_occurrences
    FROM inj CROSS JOIN tk
    GROUP BY tk.token
    """,
)
def special_token_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Special-token contamination audit (M270): per tokenizer control
    token, how many corpus documents contain the LITERAL string and how
    often — the hygiene gate run before pretraining, because a crawl
    that quotes chat transcripts or model cards carries '<|endoftext|>'
    / '[INST]'-style literals that (a) fragment documents at encode
    time and (b) teach the model to emit control tokens mid-text.
    Production pipelines strip or escape them; this table is the
    evidence for how much stripping will touch.  Fixture text is clean,
    so a deterministic md5-keyed injection (~3/16 of docs get one
    token appended, token chosen by the next md5 hex char — the M199
    stand-in pattern) provides ground truth on both sides.

    Parity: the audited literals share no substring (house rule in
    ``_SPECIAL_TOKENS``); occurrence counting is the exact integer
    (len − len(replace))/len(token) identity — no regex, so no
    engine-dialect divergence; all counts exact BIGINTs.

    Scale: ONE corpus scan; the 5-token table is a broadcast literal
    cross join (scan×5 codegen'd string ops, still map-only), then a
    5-key map-side-combined aggregate.  Nothing shuffles but 5 rows.
    """
    toks = list(_SPECIAL_TOKENS)
    arr = ", ".join(f"'{t}'" for t in toks)
    docs = load_table(spark, sf_dir, "documents")
    inj = docs.select(
        F.expr(
            f"""
            CASE WHEN substr(md5(CAST(doc_id AS STRING)), 1, 1)
                      IN ('0', '1', '2')
                 THEN concat(text, ' ',
                      element_at(array({arr}),
                          1 + (instr('0123456789abcdef',
                                     substr(md5(CAST(doc_id AS STRING)),
                                            2, 1)) - 1) % 5))
                 ELSE text
            END
            """
        ).alias("t")
    )
    tk = spark.createDataFrame([(t,) for t in toks], ["token"])
    return (
        inj.crossJoin(F.broadcast(tk))
        .groupBy("token")
        .agg(
            F.count_if(F.expr("contains(t, token)"))
            .cast("long")
            .alias("n_docs"),
            F.sum(
                F.expr(
                    "(length(t) - length(replace(t, token, '')))"
                    " div length(token)"
                )
            )
            .cast("long")
            .alias("n_occurrences"),
        )
    )


@query(
    "markup_strip_audit",
    oracle="""
    WITH inj AS (
        SELECT source,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                         IN ('0', '1', '2', '3')
                    THEN '<div class="post"><p>' || text ||
                         '</p></div> &amp; <br/>'
                    ELSE text
               END AS t
        FROM documents
    ),
    stripped AS (
        SELECT source, t,
               replace(regexp_replace(t, '<[^>]*>', '', 'g'),
                       '&amp;', '&') AS clean
        FROM inj
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(count_if(len(t) <> len(clean)) AS BIGINT)
               AS n_docs_with_markup,
           CAST(SUM(len(t) - len(clean)) AS BIGINT) AS chars_removed,
           CAST((2000000 * SUM(len(t) - len(clean)) + SUM(len(t)))
                // (2 * SUM(len(t))) AS BIGINT) AS markup_ppm
    FROM stripped GROUP BY source
    """,
)
def markup_strip_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML-markup stripping audit (M284): per source, how much of the
    raw bytes are tags/entities a text-extraction pass removes — the
    boilerplate-overhead table read before choosing an extractor for a
    crawl feed (a source at 300k markup-ppm is a DOM-heavy site whose
    text extraction needs a real parser; near-zero is API text).
    Fixture docs are plain, so an md5-keyed wrapper injection (~1/4 of
    docs get a div/p wrapper + an '&amp;' entity — the M199 stand-in
    pattern) provides ground truth.

    Parity: tag stripping is ONE capture-free regex '<[^>]*>' with
    identical RE2/Java semantics (capture REPLACEMENT syntax differs
    between engines — $1 vs \\1 — so the audit deliberately uses
    none); entity unescape is a literal replace; counts and the
    half-up ppm are exact integers.

    Scale: map-only string work fused into the scan + a
    |sources|-keyed map-side-combined aggregate.  At 100 TB this is
    the cheapest possible shape: one pass, no shuffle of content.
    """
    docs = load_table(spark, sf_dir, "documents")
    inj = docs.select(
        "source",
        F.when(
            F.expr(
                "substr(md5(CAST(doc_id AS STRING)), 1, 1)"
                " IN ('0', '1', '2', '3')"
            ),
            F.concat(
                F.lit('<div class="post"><p>'),
                F.col("text"),
                F.lit("</p></div> &amp; <br/>"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("t"),
    )
    stripped = inj.select(
        "source",
        F.length("t").alias("raw_len"),
        F.length(
            F.replace(
                F.regexp_replace(F.col("t"), "<[^>]*>", ""),
                F.lit("&amp;"),
                F.lit("&"),
            )
        ).alias("clean_len"),
    )
    return stripped.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_if(F.col("raw_len") != F.col("clean_len"))
        .cast("long")
        .alias("n_docs_with_markup"),
        F.sum(F.col("raw_len") - F.col("clean_len"))
        .cast("long")
        .alias("chars_removed"),
        F.expr(
            "CAST((2000000 * SUM(raw_len - clean_len) + SUM(raw_len))"
            " div (2 * SUM(raw_len)) AS BIGINT)"
        ).alias("markup_ppm"),
    )


@query(
    "url_canonicalize_dedup",
    oracle="""
    WITH urls AS (
        SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
                   AS domain,
               'https://site' || CAST(doc_id % 7 AS VARCHAR)
               || '.example.com/p/' || CAST(doc_id // 4 AS VARCHAR)
               || CASE doc_id % 4
                    WHEN 1 THEN '?utm_source=news'
                    WHEN 2 THEN '?utm_campaign=mail&utm_medium=email'
                    WHEN 3 THEN '#section-2'
                    ELSE ''
                  END AS url
        FROM documents
    ),
    canon AS (
        SELECT domain, url,
               regexp_replace(regexp_replace(url, '#.*$', ''),
                              '\\?utm_.*$', '') AS curl
        FROM urls
    )
    SELECT domain,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_distinct,
           CAST(COUNT(DISTINCT curl) AS BIGINT) AS n_canonical,
           CAST(COUNT(*) - COUNT(DISTINCT curl) AS BIGINT) AS collapsed
    FROM canon GROUP BY domain
    """,
)
def url_canonicalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup (M285): strip tracking params
    (utm_*) and fragments, then count how many raw URLs collapse into
    each canonical form per domain — the crawl-frontier dedup that
    byte-exact URL comparison misses entirely (every campaign tag
    makes a 'new' URL; recrawling them is pure waste, and downstream
    doc dedup pays the decode cost M201 measures).  Synthetic URLs
    derived deterministically from doc_id (4 docs share a path; 4
    tracking variants) give exact ground truth: raw distinct ≈ 4× the
    canonical count.

    Parity: canonicalization is two capture-free anchored regexes
    ('#.*$', '\\?utm_.*$') with identical RE2/Java semantics; all
    counts exact BIGINTs.  Scale: map-only canonicalization fused
    into the scan; the distinct counts shuffle CANONICAL STRINGS
    within |domains| groups — the same two-phase distinct every
    dedup layer here uses, keyed on bounded-cardinality domains plus
    the url hash.
    """
    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(
        F.concat(
            F.lit("site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com"),
        ).alias("domain"),
        F.concat(
            F.lit("https://site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/p/"),
            F.expr("CAST(doc_id div 4 AS STRING)"),
            F.when(F.col("doc_id") % 4 == 1, F.lit("?utm_source=news"))
            .when(
                F.col("doc_id") % 4 == 2,
                F.lit("?utm_campaign=mail&utm_medium=email"),
            )
            .when(F.col("doc_id") % 4 == 3, F.lit("#section-2"))
            .otherwise(F.lit("")),
        ).alias("url"),
    )
    canon = urls.select(
        "domain",
        "url",
        F.regexp_replace(
            F.regexp_replace(F.col("url"), "#.*$", ""), r"\?utm_.*$", ""
        ).alias("curl"),
    )
    return canon.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.countDistinct("url").cast("long").alias("n_raw_distinct"),
        F.countDistinct("curl").cast("long").alias("n_canonical"),
        (F.count("*") - F.countDistinct("curl"))
        .cast("long")
        .alias("collapsed"),
    )


@query(
    "doc_prefix_dup_groups",
    oracle=r"""
    WITH pref AS (
        SELECT doc_id, source,
               array_to_string(
                   list_filter(string_split_regex(lower(text), '\s+'),
                               t -> t <> '')[1:8], ' ') AS p8
        FROM documents
    ),
    g AS (
        SELECT p8, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(MIN(doc_id) AS BIGINT) AS exemplar_doc
        FROM pref GROUP BY p8 HAVING COUNT(*) >= 2
    )
    SELECT CAST((SELECT COUNT(*) FROM pref) AS BIGINT) AS n_docs_total,
           CAST(COUNT(*) AS BIGINT) AS n_dup_prefixes,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs_in_groups,
           CAST(SUM(n_docs) - COUNT(*) AS BIGINT) AS n_redundant,
           CAST(MAX(n_docs) AS BIGINT) AS largest_group
    FROM g
    """,
)
def doc_prefix_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-prefix duplicate groups (M328): documents whose first 8
    normalized tokens are identical — the HEADER-boilerplate dedup
    axis the other dedup ops miss by construction (minhash/LSH judge
    whole-document similarity, so two articles behind the same
    14-word cookie banner do NOT pair; line dedup strikes the
    banner's lines but never GROUPS the documents; this query groups
    exactly them).  In a crawl pipeline the groups feed two actions:
    a shared prefix with n_sources == 1 is a template to strip
    (M175's input), with n_sources > 1 it is syndication to
    de-duplicate.

    Exactness: the prefix key is a pure token-slice normalization
    (lowercase, whitespace split, first 8 — identical semantics both
    engines); all outputs exact counts with MIN exemplar tie-break.

    Scale: map-side key extraction (a bounded slice — the key is
    ≤8 tokens regardless of doc length, so the shuffle carries tiny
    keys, the dedup_hash argument), one groupBy on that key, a
    bounded summary reduce.
    """
    docs = load_table(spark, sf_dir, "documents")
    p8 = F.array_join(
        F.slice(tokenize(F.lower(F.col("text"))), 1, 8), " "
    )
    pref = docs.select("doc_id", "source", p8.alias("p8"))
    g = (
        pref.groupBy("p8")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.min("doc_id").cast("long").alias("exemplar_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    tot = pref.agg(F.count("*").cast("long").alias("n_docs_total"))
    return g.agg(
        F.count("*").cast("long").alias("n_dup_prefixes"),
        F.sum("n_docs").cast("long").alias("n_docs_in_groups"),
        (F.sum("n_docs") - F.count("*")).cast("long").alias("n_redundant"),
        F.max("n_docs").cast("long").alias("largest_group"),
    ).crossJoin(F.broadcast(tot)).select(
        "n_docs_total",
        "n_dup_prefixes",
        "n_docs_in_groups",
        "n_redundant",
        "largest_group",
    )
