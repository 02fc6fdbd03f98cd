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

from insight_spark.operators.text import ngrams, tokenize


def content_hash(c: Column) -> Column:
    """J5: deterministic content fingerprint (sha256 hex, oracle-parity)."""
    return F.sha2(c, 256)


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Ensure CPU-bound rowwise stages (minhash signatures, shingle
    md5s) get cluster-wide parallelism.

    A small single-file parquet scan yields ONE input partition, and a
    map-side compute stage cannot be split by AQE — measured: the md5
    MinHash signature stage ran 16 s single-threaded on a 5000-doc
    one-file fixture vs ~1 s spread over 32 threads.  At 100 TB inputs
    arrive in thousands of splits and this branch no-ops; the
    repartition costs one extra pass only when the source is
    pathologically under-partitioned.

    HASH-partitioned on ``key``, not round-robin: round-robin
    placement depends on upstream partition layout and needs a
    determinism-preserving local sort on retry; hash placement is a
    pure function of the row, so stage retries and concurrent-load
    rescheduling cannot reorder results.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target, F.col(key))
    return df


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


def simhash_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 16,
) -> DataFrame:
    """SimHash document fingerprints (LLM-pipeline dedup mandate).

    Classic Charikar simhash over the distinct-token set: each token
    votes ±1 on every bit of its hash; the fingerprint bit is the sign
    of the vote sum.  Near-duplicate docs land at small Hamming
    distance.

    Cross-engine determinism: the per-token hash is the first
    ``n_bits/4`` hex nibbles of md5(token) — identical in Spark and
    DuckDB — so the whole operator is value-oracle-checkable (unlike
    xxhash64-based sketches).  Everything is JVM-side SQL: explode →
    16 conditional sums in ONE hash aggregate (single shuffle on
    doc_id) → bit recombination.  At 100 TB this is a word-count-shaped
    job; no driver state, no UDF.
    """
    assert n_bits % 4 == 0
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("_t"),
    ).withColumn("_h", F.md5(F.col("_t")))
    # vote_i = sum over tokens of (2*bit_i - 1), bit_i from md5 nibbles
    votes = [
        F.sum(
            F.expr(
                f"(instr('0123456789abcdef', substr(_h, {j + 1}, 1)) - 1)"
                f" div {2 ** b} % 2 * 2 - 1"
            )
        ).alias(f"_v{j * 4 + b}")
        for j in range(n_bits // 4)
        for b in range(4)
    ]
    summed = toks.groupBy("doc_id").agg(*votes)
    fp = None
    for i in range(n_bits):
        bit = F.when(F.col(f"_v{i}") >= 0, F.lit(2**i)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return summed.select("doc_id", fp.cast("long").alias("simhash"))


def simhash_oracle_sql(n_bits: int = 16) -> str:
    """DuckDB SQL computing identical fingerprints (same md5-nibble hash)."""
    assert n_bits % 4 == 0
    votes = ",\n           ".join(
        f"SUM((strpos('0123456789abcdef', substr(h, {j + 1}, 1)) - 1)"
        f" // {2 ** b} % 2 * 2 - 1) AS v{j * 4 + b}"
        for j in range(n_bits // 4)
        for b in range(4)
    )
    fp = " + ".join(
        f"(CASE WHEN v{i} >= 0 THEN {2 ** i} ELSE 0 END)" for i in range(n_bits)
    )
    return rf"""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(
                   list_filter(string_split_regex(text, '\s+'), t -> t <> '')
               )) AS t
        FROM documents
    ),
    hashed AS (SELECT doc_id, md5(t) AS h FROM toks),
    votes AS (
        SELECT doc_id,
           {votes}
        FROM hashed GROUP BY doc_id
    ),
    fp AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes)
    """


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


def _bucket_pair_candidates(bands: DataFrame, *key_cols: str) -> DataFrame:
    """LSH candidate generation via bucket arrays (single source of
    truth for both the xxhash64 production path and the md5
    value-oracled twin): the band table aggregates to (bucket →
    sorted ``_id`` array) ONCE, and unordered pairs (a < b by the
    sort) explode from each array — a band self-join would evaluate
    the whole signature subplan twice and shuffle n² rows per bucket
    where the array holds n ids.

    PRECONDITION (the r5 PPJoin lesson): bucket sizes must be bounded
    by construction — collect_list materializes each bucket's id array
    on one task.  For MinHash bands that's exactly what running exact
    dedup FIRST guarantees (identical docs, the one unbounded-bucket
    source, are already gone); do NOT reuse this shape where a single
    key can collect an unbounded id set.

    Returns distinct (a_id, b_id) pairs.
    """
    buckets = (
        bands.groupBy(*key_cols)
        .agg(F.sort_array(F.collect_list("_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    return (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) ->"
                    " transform(slice(ids, i + 2, size(ids) - i - 1),"
                    " y -> struct(x AS a_id, y AS b_id))))"
                )
            ).alias("p")
        )
        .select("p.a_id", "p.b_id")
        .dropDuplicates(["a_id", "b_id"])
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
    keep_all: bool = False,
) -> DataFrame:
    """J6: MinHash+LSH near-duplicate pairs, exact-verified.

    shingles (``shingle_n``-gram word sequences, the GPT-3/Gopher-style
    dedup unit — unigram sets over-match templated corpora) → minhash
    signature → band buckets → same-bucket candidate id pairs (a<b),
    deduped as bare (long, long) ids → shingle sets joined back →
    exact Jaccard verification ≥ threshold.  Returns
    (a_id, b_id, jaccard_sim); with ``keep_all`` every LSH candidate
    pair survives with an ``is_dup`` verdict column instead of being
    filtered — the auditable form (verification evidence per
    candidate, false-positive rate observable downstream).

    At scale every stage is a shuffle on bounded keys: band-bucket
    cardinality ~ corpus size, candidates explode per bucket from a
    sorted id array (the r5 rewrite — a band self-join would evaluate
    the signature subplan twice, see ``minhash_lsh_pairs_md5``), and
    the pair-dedup shuffle moves 16-byte id pairs — the (possibly
    large) shingle arrays are shuffled once per side by the
    verification joins, never through the band stage.

    Docs with an EMPTY shingle set (< ``shingle_n`` tokens) never band
    and so never pair — by design: an empty set has Jaccard 0 (or 0/0)
    against everything, so no such pair can verify at ``threshold`` >
    0, and a shared null-signature bucket would only manufacture
    candidate volume (visible under ``keep_all``, but as guaranteed
    false positives).  The filter below makes the drop explicit,
    matching ``_md5_shingle_bands``' size guard.
    """
    rows_per_band = n_hashes // n_bands
    shingles = F.array_distinct(ngrams(tokenize(F.col(text_col)), shingle_n))
    toks = (
        _spread(docs, id_col)
        .select(F.col(id_col).alias("_id"), shingles.alias("_sh"))
        .filter(F.size("_sh") > 0)
    )
    # Signature via explode + map-side-combined min aggregate (r6, same
    # rationale as _md5_bands_from_sh): a transform-per-seed over a
    # projected shingle column gets the shingle expression INLINED by
    # CollapseProject and re-evaluated n_hashes times per row (HOF
    # lambdas see no subexpression elimination); row-wise xxhash64
    # post-explode is whole-stage-codegen'd and the groupBy shuffles
    # only n_hashes longs per doc.  Same signature values:
    # min over the same hash family, per test_properties pins.
    grams = toks.select("_id", F.explode("_sh").alias("_g"))
    sig = grams.groupBy("_id").agg(
        *[
            F.min(F.xxhash64(F.col("_g"), F.lit(seed + i))).alias(f"_h{i}")
            for i in range(n_hashes)
        ]
    )

    bands = sig.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        *[
                            F.col(f"_h{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("_band", "_bucket"),
    )

    cand = _bucket_pair_candidates(bands, "_band", "_bucket")
    sets = toks.select("_id", "_sh")
    cand = cand.join(
        sets.select(F.col("_id").alias("a_id"), F.col("_sh").alias("_a_sh")),
        "a_id",
    ).join(
        sets.select(F.col("_id").alias("b_id"), F.col("_sh").alias("_b_sh")),
        "b_id",
    )
    sim = jaccard(F.col("_a_sh"), F.col("_b_sh"))
    verified = cand.withColumn("jaccard_sim", F.round(sim, 6))
    if keep_all:
        return verified.select(
            "a_id",
            "b_id",
            "jaccard_sim",
            (F.col("jaccard_sim") >= threshold).alias("is_dup"),
        )
    return verified.filter(F.col("jaccard_sim") >= threshold).select(
        "a_id", "b_id", "jaccard_sim"
    )


def prefix_filtered_jaccard_join(
    docs: DataFrame,
    threshold_num: int,
    threshold_den: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """J7 scale path: corpus-wide Jaccard threshold self-join via
    prefix filtering (the PPJoin candidate rule) — no all-pairs join.

    Each doc keeps only its p = |s| - ceil(t·|s|) + 1 globally
    *rarest* tokens (ascending document frequency, token tie-break);
    any pair with J >= t must share at least one prefix token, so the
    equi-join on prefix tokens yields a candidate superset of the
    answer, which exact Jaccard verification then trims.

    The threshold is the rational ``num/den`` so the prefix-length
    ceil() is exact integer math — a float ``0.9 * 10`` can round up
    and silently shorten the prefix below the safe bound, dropping
    true pairs.  Verification compares ``den·|∩| >= num·|∪|`` in
    integers for the same reason.

    Scale shape: explode + vocabulary-frequency join + per-doc token
    sort (bounded by doc length), prefix explode, equi-join on prefix
    token, pair-dedup on bare id pairs, then two set joins for
    verification.  The frequency table is |vocab|-sized, so it gets NO
    broadcast hint — at fixture scale AQE upgrades it to a runtime
    broadcast anyway (it is far under autoBroadcastJoinThreshold), and
    at 100 TB (GB-sized vocab) the same plan stays a shuffle join on
    token instead of OOMing every executor.  Candidate volume is
    governed by rare-token bucket sizes — the filter is exactly what
    makes corpus-wide similarity join feasible without |docs|².
    """
    t_num, t_den = threshold_num, threshold_den
    # The token table feeds FIVE subplan evaluations downstream (the
    # vocabulary-frequency aggregate, both sides of the ranked join,
    # and both verification set joins) and the tokenizer is the
    # expensive part of each — materialize it once (guide §1.2: don't
    # compute things twice; §3.3: materializing an intermediate
    # truncates the repeated subtree).  r12 measured the
    # double-evaluation but could not separate this fix from machine
    # noise on a degraded box; re-measured r13 on a quiet box (see
    # OPTIMIZATION_r13.md).  localCheckpoint is executor-local and
    # non-recomputable — fine for a batch analytics job where a lost
    # executor fails the query and the caller re-runs; a long-lived
    # cluster pipeline would swap in reliable checkpointing or a
    # write + read-back at the same two points.
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(tokenize(F.col(text_col))).alias("_s"),
    ).where(F.size("_s") > 0).localCheckpoint()
    freq = (
        toks.select(F.explode("_s").alias("_tok"))
        .groupBy("_tok")
        .agg(F.count("*").alias("_df"))
    )
    ranked = toks.select(
        "_id", F.size("_s").alias("_sz"), F.explode("_s").alias("_tok")
    ).join(freq, "_tok")
    prefix = (
        ranked.groupBy("_id", "_sz")
        .agg(F.sort_array(F.collect_list(F.struct("_df", "_tok"))).alias("_ord"))
        .select(
            "_id",
            F.explode(
                F.expr(
                    f"slice(_ord, 1, _sz - (({t_num} * _sz + {t_den - 1}) "
                    f"div {t_den}) + 1)._tok"
                )
            ).alias("_tok"),
        )
        # Both sides of the candidate self-join below are THIS subplan;
        # without a barrier the frequency aggregate + per-doc sort run
        # twice (r12's measured double evaluation).  One materialization
        # feeds both sides; the join then scans ~|prefix| cached rows
        # twice instead of re-deriving them.
        .localCheckpoint()
    )
    # Candidates stay a STREAMING self-join here — deliberately NOT the
    # bucket-array form used by the MinHash LSH stages: a prefix-token
    # bucket is unbounded (a doc made of corpus-common tokens puts a
    # high-df token in its prefix), and materializing one bucket's
    # pair array OOMed at sf0.1 (measured — 8 GiB heap, ~5k-id bucket
    # → 12.5M struct array in a single row).  The join streams the
    # same pair volume through the shuffle instead; its per-side
    # subplan (explode + vocab join + sort) is cheap enough that the
    # double evaluation is the right trade.  Bucket arrays are safe
    # only where bucket cardinality is bounded by construction
    # (LSH signature buckets after exact dedup).
    cand = (
        prefix.select(F.col("_id").alias("a_id"), "_tok")
        .join(prefix.select(F.col("_id").alias("b_id"), "_tok"), "_tok")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    cand = cand.join(
        toks.select(F.col("_id").alias("a_id"), F.col("_s").alias("_a")), "a_id"
    ).join(
        toks.select(F.col("_id").alias("b_id"), F.col("_s").alias("_b")), "b_id"
    )
    inter = F.size(F.array_intersect("_a", "_b"))
    union = F.size("_a") + F.size("_b") - inter
    return (
        cand.select(
            "a_id",
            "b_id",
            inter.alias("_i"),
            union.alias("_u"),
        )
        .filter(F.lit(t_den) * F.col("_i") >= F.lit(t_num) * F.col("_u"))
        .select(
            "a_id",
            "b_id",
            F.round(
                F.col("_i").cast("double") / F.col("_u").cast("double"), 6
            ).alias("jaccard_sim"),
        )
    )


def _md5_shingle_bands(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int,
    n_bands: int,
    shingle_n: int,
) -> tuple[DataFrame, DataFrame]:
    """Shared md5-family sketch stages: shingle sets ``(_id, _sh)`` and
    LSH band buckets ``(_id, _band, _bkey)`` for a corpus.  Used by the
    within-corpus pair join and the cross-corpus (decontamination)
    variant — signatures are per-document, so banding each corpus
    separately is bit-identical to banding their union."""
    sh = _spread(docs, id_col).select(
        F.col(id_col).alias("_id"),
        F.array_distinct(ngrams(tokenize(F.col(text_col)), shingle_n)).alias(
            "_sh"
        ),
    ).filter(F.size("_sh") > 0)
    return sh, _md5_bands_from_sh(sh, n_hashes, n_bands)


def md5_digest_concat_sql(n_hashes: int, var: str = "g") -> str:
    """DuckDB lambda body for the per-gram chunked digest — generated
    from the SAME ``n_digests = n_hashes // 4`` formula as
    ``_md5_bands_from_sh`` so a non-default ``n_hashes`` (e.g. 16)
    can never silently desync Spark (which computes extra digests)
    from an oracle hardcoding two (whose substr past char 64 would
    yield empty chunks)."""
    assert n_hashes % 4 == 0, "chunked family packs 4 chunks per digest"
    return " || ".join(
        f"md5({var})" if d == 0 else f"md5('{'#' * d}' || {var})"
        for d in range(n_hashes // 4)
    )


def _md5_bands_from_sh(
    sh: DataFrame, n_hashes: int, n_bands: int
) -> DataFrame:
    """Band buckets ``(_id, _band, _bkey)`` from a shingle-set table
    ``(_id, _sh)`` — split out so callers can materialize ``sh`` once
    and feed the SAME barrier to banding and verification."""
    rows_per_band = n_hashes // n_bands
    assert rows_per_band * n_bands == n_hashes
    # Hash family (r6 rewrite): n_hashes values are 8-hex-char (32-bit)
    # CHUNKS of ceil(n/4) md5 digests per gram — md5(g), md5('#'+g), …
    # — instead of n_hashes independent md5('i#'+g) calls.  The
    # signature stage was the funnel's dominant cost (measured 5.0 s of
    # dedup_pipeline_summary's 5.5 s at sf0.1); chunking cuts the md5
    # count per gram from 8 to 2 for identical LSH semantics (md5 bits
    # are uniform, chunks behave as independent 32-bit hash functions;
    # min over fixed-width lowercase-hex strings = numeric min in both
    # engines).  Tie risk per doc is ~|sh|²/2³³ — negligible, and any
    # tie is replayed bit-identically by the DuckDB oracle.
    assert n_hashes % 4 == 0, "chunked family packs 4 chunks per digest"
    n_digests = n_hashes // 4

    # Signature via EXPLODE + row-wise digest + map-side-combined min
    # aggregate, NOT array higher-order functions: HOF lambdas are
    # interpreted per-element with no common-subexpression caching, and
    # CollapseProject inlines a projected digest array into every
    # consumer — both roads re-run the md5s n_hashes times.  Row-wise
    # expressions get whole-stage codegen + subexpression elimination,
    # so the digest concat runs ONCE per gram and the 8 substrings are
    # chunk reads.  The groupBy(_id) shuffle moves only 8×8 hex chars
    # per doc after partial aggregation.
    grams = sh.select("_id", F.explode("_sh").alias("_g"))
    g = F.col("_g")
    dig = F.concat(
        *[
            F.md5(g) if d == 0 else F.md5(F.concat(F.lit("#" * d), g))
            for d in range(n_digests)
        ]
    )
    sig = grams.groupBy("_id").agg(
        *[
            F.min(F.substring(dig, 1 + 8 * i, 8)).alias(f"_h{i}")
            for i in range(n_hashes)
        ]
    )
    bands = sig.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"_h{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("_band", "_bkey"),
    )
    return bands


def minhash_lsh_pairs_md5(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    n_bands: int = 4,
    shingle_n: int = 3,
    keep_all: bool = False,
) -> DataFrame:
    """J6 value-oracled variant: MinHash+LSH near-dup pairs with an
    md5 hash family, fully reproducible in DuckDB SQL.

    Same pipeline shape as ``near_dedup_minhash`` (shingle → signature
    → band bucket → candidate pair → exact-Jaccard verify at t=1/2),
    but the per-seed hash is ``md5(seed || '#' || gram)`` and the
    signature element is the **lexicographic** minimum of the fixed-
    width lowercase hex strings — which equals the numeric minimum of
    the 128-bit values, and both engines compare ASCII strings
    bytewise.  That makes every intermediate (signatures, band keys,
    candidate set, verified pairs) bit-identical across engines, so
    the driver's value-hash check covers the whole sketch pipeline
    instead of a rows-only count (the simhash md5-nibble trick,
    extended to MinHash).

    The xxhash64 twin stays the 100 TB default (JVM hash, no hex
    materialization); this variant trades ~2× signature cost for
    oracle-checkability.  Verification threshold is the integer form
    ``2·|∩| >= |∪|`` (exact, no float compare).

    Candidate generation is bucket-array, not self-join (r5): the
    band table aggregates to (bucket → sorted id array) ONCE and
    pairs explode from each array — a band self-join evaluates the
    whole signature subplan twice (the aliased sides don't
    canonicalize to a reusable exchange), measured 1.75× slower cold
    at sf0.1 for an identical candidate set.  Per-bucket arrays hold
    n ids where the self-join shuffles n² rows; the one degenerate
    case (a mega-bucket of identical docs) is exactly what running
    exact dedup FIRST removes (the funnel's composition order).
    """
    # NOTE (r6, measured): the shingle subplan feeds three consumers
    # (band build + both verify sides) but deliberately stays LAZY — a
    # localCheckpoint barrier on ``sh`` was tried and made the sf0.1
    # funnel 0.8 s SLOWER: writing the materialized gram arrays costs
    # more than recomputing the zip_with shingling per consumer.
    sh, bands = _md5_shingle_bands(
        docs, text_col, id_col, n_hashes, n_bands, shingle_n
    )
    cand = _bucket_pair_candidates(bands, "_band", "_bkey")
    sets = sh.select("_id", "_sh")
    cand = cand.join(
        sets.select(F.col("_id").alias("a_id"), F.col("_sh").alias("_a")), "a_id"
    ).join(sets.select(F.col("_id").alias("b_id"), F.col("_sh").alias("_b")), "b_id")
    inter = F.size(F.array_intersect("_a", "_b"))
    union = F.size("_a") + F.size("_b") - inter
    sim = F.round(inter.cast("double") / union.cast("double"), 6).alias(
        "jaccard_sim"
    )
    if keep_all:
        # auditable form (near_dedup_minhash's keep_all): every LSH
        # candidate survives with its exact Jaccard and an integer-form
        # verdict — verification evidence in the output, false-positive
        # rate observable downstream.
        return cand.select(
            "a_id", "b_id", sim, (F.lit(2) * inter >= union).alias("is_dup")
        )
    return cand.filter(F.lit(2) * inter >= union).select("a_id", "b_id", sim)


def minhash_lsh_pairs_md5_oracle_sql(
    n_hashes: int = 8, n_bands: int = 4, keep_all: bool = False
) -> str:
    """DuckDB SQL producing identical pairs (same md5 hash family).
    With ``keep_all``, replays the auditable form: every candidate with
    an ``is_dup`` verdict instead of the verification WHERE."""
    rows_per_band = n_hashes // n_bands
    sigs = ",\n               ".join(
        f"list_min(list_transform(ds, d -> substr(d, {1 + 8 * i}, 8)))"
        f" AS h{i}"
        for i in range(n_hashes)
    )
    band_rows = "\n        UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS bkey FROM sig".format(
            b=b,
            key=" || '|' || ".join(
                f"h{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(n_bands)
    )
    _verify = (
        "2 * len(list_intersect(sa.s, sb.s))"
        " >= len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))"
    )
    _verdict_sql = f",\n           {_verify} AS is_dup" if keep_all else ""
    _where_sql = "" if keep_all else f"WHERE {_verify}"
    return rf"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS t
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                   i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS s
        FROM toks
    ),
    sh2 AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
    shd AS (
        SELECT doc_id, s,
               list_transform(s, g -> {md5_digest_concat_sql(n_hashes)}) AS ds
        FROM sh2
    ),
    sig AS (
        SELECT doc_id, s,
               {sigs}
        FROM shd
    ),
    bands AS (
        {band_rows}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                    AND a.doc_id < b.doc_id
    )
    SELECT a_id, b_id,
           ROUND(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                 / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))),
                 6) AS jaccard_sim{_verdict_sql}
    FROM cand
    JOIN sh2 sa ON sa.doc_id = a_id
    JOIN sh2 sb ON sb.doc_id = b_id
    {_where_sql}
    """


def minhash_band_cardinality_oracle_sql(
    n_hashes: int = 8, n_bands: int = 4
) -> str:
    """DuckDB SQL for the LSH band-load audit (M146): replays the SAME
    md5 band family as ``minhash_lsh_pairs_md5_oracle_sql`` (identical
    toks/sh/sig/bands CTE prefix) and aggregates per-band bucket-load
    statistics instead of exploding pairs."""
    rows_per_band = n_hashes // n_bands
    sigs = ",\n               ".join(
        f"list_min(list_transform(ds, d -> substr(d, {1 + 8 * i}, 8)))"
        f" AS h{i}"
        for i in range(n_hashes)
    )
    band_rows = "\n        UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS bkey FROM sig".format(
            b=b,
            key=" || '|' || ".join(
                f"h{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(n_bands)
    )
    return rf"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS t
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),
                   i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS s
        FROM toks
    ),
    sh2 AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
    shd AS (
        SELECT doc_id, s,
               list_transform(s, g -> {md5_digest_concat_sql(n_hashes)}) AS ds
        FROM sh2
    ),
    sig AS (
        SELECT doc_id, s,
               {sigs}
        FROM shd
    ),
    bands AS (
        {band_rows}
    ),
    bsz AS (
        SELECT band, bkey, CAST(COUNT(*) AS BIGINT) AS n
        FROM bands GROUP BY band, bkey
    )
    SELECT band,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(MAX(n) AS BIGINT) AS max_bucket,
           CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_colliding,
           CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS candidate_pairs
    FROM bsz GROUP BY band
    """


def minhash_lsh_cross_pairs_md5(
    left: DataFrame,
    right: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    n_bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Cross-corpus MinHash+LSH near-dup pairs (fuzzy decontamination
    shape): every verified (left, right) pair with shingle-Jaccard
    >= 1/2, md5 hash family so the whole sketch is oracle-checkable.

    The asymmetric form of ``minhash_lsh_pairs_md5``: each corpus is
    shingled/signed/banded independently (per-document math, so the
    split changes nothing), and candidates come from joining LEFT band
    buckets to RIGHT band buckets — never left×left.  With a bounded
    right side (an eval/benchmark set — the decontamination case) the
    right bands broadcast: the big training corpus is scanned once,
    map-side, and candidate volume scales with |right| · bucket
    collision rate, not |left|².  Verification joins the shingle sets
    back on the bounded candidate ids only.

    Returns ``(a_id, b_id, jaccard_sim)`` with a_id from ``left``,
    b_id from ``right``.
    """
    sh_l, bands_l = _md5_shingle_bands(
        left, text_col, id_col, n_hashes, n_bands, shingle_n
    )
    sh_r, bands_r = _md5_shingle_bands(
        right, text_col, id_col, n_hashes, n_bands, shingle_n
    )
    cand = (
        bands_l.select(F.col("_id").alias("a_id"), "_band", "_bkey")
        .join(
            F.broadcast(
                bands_r.select(F.col("_id").alias("b_id"), "_band", "_bkey")
            ),
            ["_band", "_bkey"],
        )
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    cand = cand.join(
        sh_l.select(F.col("_id").alias("a_id"), F.col("_sh").alias("_a")),
        "a_id",
    ).join(
        F.broadcast(
            sh_r.select(F.col("_id").alias("b_id"), F.col("_sh").alias("_b"))
        ),
        "b_id",
    )
    inter = F.size(F.array_intersect("_a", "_b"))
    union = F.size("_a") + F.size("_b") - inter
    return (
        cand.filter(F.lit(2) * inter >= union)
        .select(
            "a_id",
            "b_id",
            F.round(inter.cast("double") / union.cast("double"), 6).alias(
                "jaccard_sim"
            ),
        )
    )


def incremental_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Day-2 dedup: deduplicate an incoming BATCH against an existing
    corpus snapshot without reshuffling the corpus documents.

    Returns every batch row annotated with ``drop_reason``:
    ``'corpus_dup'`` (content already in the corpus), ``'batch_dup'``
    (an earlier batch row — lower id — has the same content), or NULL
    (kept).  Downstream appends the NULL slice to the corpus.

    Scale shape: the corpus is reduced to DISTINCT 256-bit digests
    before anything moves — the join shuffles 32-byte hashes, never
    documents, and the batch (typically ≪ corpus) is the small side.
    When the corpus digest set fits a bloom budget, slot a
    ``bloom_filter_agg``/``might_contain`` prefilter before this join
    (see ``bloom_semi_agg``) — false positives are then removed by
    this exact digest join, so the bloom is a pure IO saver.
    Within-batch dedup is the standard keyed arg-min, one shuffle on
    the digest.
    """
    from pyspark.sql.window import Window

    dig = F.sha2(F.col(content_col), 256)
    corpus_digests = corpus.select(dig.alias("_digest")).distinct()
    b = batch.withColumn("_digest", dig)
    marked = b.join(
        corpus_digests.withColumn("_in_corpus", F.lit(1)),
        "_digest",
        "left",
    )
    w_min = F.min(id_col).over(Window.partitionBy("_digest"))
    return (
        marked.withColumn("_keep_id", w_min)
        .withColumn(
            "drop_reason",
            F.when(F.col("_in_corpus") == 1, "corpus_dup").when(
                F.col(id_col) != F.col("_keep_id"), "batch_dup"
            ),
        )
        .drop("_in_corpus", "_keep_id")
    )
