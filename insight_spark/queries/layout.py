"""Layout / runtime-filter queries: Bloom-prefiltered semi join and
Z-order curve codes, both exact-oracled against DuckDB.

The bloom query's oracle is the *plain* semi join — the bloom is a
physical pruning step with no semantic footprint, so parity against
the naive SQL proves the no-false-negative property end-to-end.  The
Z-order query renders the identical interleave formula in both
dialects, so the curve codes are bit-equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insight_spark.operators.layout import (
    bloom_semi_join,
    z_value_expr,
    z_value_sql,
)
from insight_spark.operators.relational import money, money_out
from insight_spark.queries import query
from insight_spark.sources import load_table


@query(
    "bloom_semi_agg",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 6)
               AS sum_qty
    FROM lineitem
    WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    """,
)
def bloom_semi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join lineitem ⋉ urgent-orders via a Bloom runtime filter.

    The bloom bitmap over the filtered order keys is built distributed
    (no driver collect), broadcast as one 16 KiB array row, and probes
    drop non-matching lineitem rows before the semi join's exchange —
    at 100 TB that is the difference between shuffling the whole fact
    table and shuffling the ~20% candidate set.  The trailing exact
    semi join erases bloom false positives, which is why the oracle is
    the plain `IN` subquery.
    """
    li = load_table(spark, sf_dir, "lineitem")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    matched = bloom_semi_join(li, urgent, "l_orderkey", m_bits=1 << 17, k=5)
    return matched.agg(
        F.count("*").alias("n_rows"),
        F.sum(money("l_quantity")).alias("_sq"),
    ).select("n_rows", money_out("_sq").alias("sum_qty"))


_ZX = "(l_partkey % 1024)"
_ZY = "(l_suppkey % 1024)"


@query(
    "z_order_code_top",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST({_ZX} AS BIGINT) AS zx,
           CAST({_ZY} AS BIGINT) AS zy,
           {z_value_sql(_ZX, _ZY, 10)} AS zval
    FROM lineitem
    ORDER BY zval, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def z_order_code_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton Z-curve codes over (partkey, suppkey) low bits — the sort
    key Z-order clustering writes by.

    Projection + `TakeOrderedAndProject`: the curve code is pure
    shift/AND arithmetic inside whole-stage codegen, and the global
    top-k never materializes a full sort.  Tie-break on the table key
    keeps the limit deterministic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.expr(_ZX).cast("long").alias("zx"),
            F.expr(_ZY).cast("long").alias("zy"),
            z_value_expr(_ZX, _ZY, 10).alias("zval"),
        )
        .orderBy("zval", "l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "bloom_fpr_audit",
    oracle=r"""
    WITH bounds AS (
        SELECT CAST(MIN(doc_id) AS BIGINT) AS lo,
               CAST(MAX(doc_id) AS BIGINT) AS hi
        FROM documents
    ),
    toks AS (
        SELECT CASE WHEN (doc_id - lo) * 2 < (hi - lo + 1)
                    THEN 0 ELSE 1 END AS half,
               unnest(list_distinct(
                   list_filter(string_split_regex(text, '\s+'),
                               t -> t <> ''))) AS token
        FROM documents, bounds
    ),
    a_tokens AS (SELECT DISTINCT token FROM toks WHERE half = 0),
    b_only AS (
        SELECT 'zzprobe' || CAST(i AS VARCHAR) AS token
        FROM (SELECT unnest(range(2000)) AS i)
        WHERE 'zzprobe' || CAST(i AS VARCHAR)
              NOT IN (SELECT token FROM a_tokens)
    ),
    hashes AS (SELECT unnest([1, 2, 3]) AS h),
    a_pos AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5(token), (h - 1) * 8 + 1, 8))
                    AS BIGINT) % 4096 AS pos
        FROM a_tokens, hashes
    ),
    b_pos AS (
        SELECT token,
               CAST(('0x' || substr(md5(token), (h - 1) * 8 + 1, 8))
                    AS BIGINT) % 4096 AS pos
        FROM b_only, hashes
    ),
    b_probe AS (
        SELECT b.token,
               COUNT(DISTINCT b.pos) AS n_own,
               COUNT(DISTINCT a.pos) AS n_hit
        FROM b_pos b LEFT JOIN a_pos a ON a.pos = b.pos
        GROUP BY b.token
    ),
    stats AS (
        SELECT CAST((SELECT COUNT(*) FROM a_tokens) AS BIGINT)
                   AS n_inserted,
               CAST((SELECT COUNT(*) FROM a_pos) AS BIGINT) AS bits_set,
               CAST(COUNT(*) AS BIGINT) AS n_tested,
               CAST(count_if(n_hit = n_own) AS BIGINT) AS n_false_pos
        FROM b_probe
    )
    SELECT CAST(4096 AS BIGINT) AS m_bits, CAST(3 AS INT) AS k_hashes,
           n_inserted, bits_set,
           CAST(1000000 * bits_set // 4096 AS BIGINT) AS load_ppm,
           n_tested, n_false_pos,
           CAST(n_false_pos AS DOUBLE) / n_tested AS fpr
    FROM stats
    """,
)
def bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter false-positive-rate audit (M194): build an
    m=4096-bit / k=3 Bloom filter from the first ingest half's
    vocabulary, probe it with 2 000 synthetic known-absent tokens
    (anti-joined against the vocab for certainty — every hit is a
    false positive by construction), and report the measured
    FPR beside the filter's load factor — the calibration run behind
    sizing every runtime bloom (`bloom_semi_agg`'s pruning filter,
    the incremental-dedup prefilter): measured FPR drifting above the
    (1−e^{−kn/m})^k design point means the filter is overloaded and
    the downstream "pruned" scan is silently reading junk.

    Membership is exact-set semantics over the filter's SET bit
    positions: a probe token is a (false) member iff ALL its k
    positions are set — computed as distinct-own vs distinct-hit
    position counts so duplicate positions within one token's k
    hashes are handled exactly.

    Cross-engine bits: position = 8-hex-char md5 slice → int mod 4096
    via the M145-pinned conv/'0x'-cast parity; all counts exact
    BIGINTs, load an integer ppm division, FPR ONE IEEE division.

    Scale: vocab-keyed distinct/anti-join shuffles (word-count shape);
    the position table is ≤4096 rows broadcast into the probe join;
    the probe set is a fixed 2 000 rows regardless of corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    from insight_spark.operators.text import tokenize

    bounds = docs.agg(
        F.min("doc_id").cast("long").alias("lo"),
        F.max("doc_id").cast("long").alias("hi"),
    )
    toks = (
        docs.crossJoin(F.broadcast(bounds))
        .select(
            F.when(
                (F.col("doc_id") - F.col("lo")) * 2
                < F.col("hi") - F.col("lo") + 1,
                0,
            )
            .otherwise(1)
            .alias("half"),
            F.explode(F.array_distinct(tokenize(F.col("text")))).alias(
                "token"
            ),
        )
        .distinct()
    )
    a_tokens = toks.where(F.col("half") == 0).select("token").distinct()
    b_only = (
        spark.range(2000)
        .select(F.concat(F.lit("zzprobe"), F.col("id").cast("string")).alias("token"))
        .join(a_tokens, "token", "left_anti")
    )
    hashes = spark.createDataFrame([(1,), (2,), (3,)], "h int")

    def pos_col() -> F.Column:
        return (
            F.conv(
                F.expr("substr(md5(token), (h - 1) * 8 + 1, 8)"), 16, 10
            ).cast("long")
            % 4096
        )

    a_pos = (
        a_tokens.crossJoin(F.broadcast(hashes))
        .select(pos_col().alias("pos"))
        .distinct()
    )
    b_pos = b_only.crossJoin(F.broadcast(hashes)).select(
        "token", pos_col().alias("pos")
    )
    b_probe = (
        b_pos.alias("b")
        .join(
            F.broadcast(a_pos.select(F.col("pos").alias("apos"))),
            F.col("b.pos") == F.col("apos"),
            "left",
        )
        .groupBy("token")
        .agg(
            F.countDistinct("pos").alias("n_own"),
            F.countDistinct("apos").alias("n_hit"),
        )
    )
    n_ins = a_tokens.agg(F.count("*").cast("long").alias("n_inserted"))
    bits = a_pos.agg(F.count("*").cast("long").alias("bits_set"))
    stats = b_probe.agg(
        F.count("*").cast("long").alias("n_tested"),
        F.count_if(F.col("n_hit") == F.col("n_own"))
        .cast("long")
        .alias("n_false_pos"),
    )
    return (
        stats.crossJoin(n_ins)
        .crossJoin(bits)
        .select(
            F.lit(4096).cast("long").alias("m_bits"),
            F.lit(3).cast("int").alias("k_hashes"),
            "n_inserted",
            "bits_set",
            F.expr("1000000 * bits_set div 4096")
            .cast("long")
            .alias("load_ppm"),
            "n_tested",
            "n_false_pos",
            (F.col("n_false_pos").cast("double") / F.col("n_tested")).alias(
                "fpr"
            ),
        )
    )


_ZM_X = "(o_orderkey % 32)"
_ZM_Y = "(o_custkey % 32)"


@query(
    "zorder_zone_map_probe",
    oracle=f"""
    WITH pts AS (
        SELECT o_orderkey,
               CAST({_ZM_X} AS BIGINT) AS x,
               CAST({_ZM_Y} AS BIGINT) AS y,
               {z_value_sql(_ZM_X, _ZM_Y, 5)} AS zval
        FROM orders
    ),
    zstats AS (
        SELECT zval // 128 AS b, MIN(x) AS mnx, MAX(x) AS mxx,
               MIN(y) AS mny, MAX(y) AS mxy
        FROM pts GROUP BY 1
    ),
    lstats AS (
        SELECT x // 4 AS b, MIN(x) AS mnx, MAX(x) AS mxx,
               MIN(y) AS mny, MAX(y) AS mxy
        FROM pts GROUP BY 1
    ),
    tile AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
        FROM pts WHERE y BETWEEN 8 AND 11
    )
    SELECT
        (SELECT CAST(COUNT(*) AS INTEGER) FROM zstats) AS z_files_total,
        (SELECT CAST(COUNT(*) AS INTEGER) FROM zstats
         WHERE mxy >= 8 AND mny <= 11) AS z_files_scanned,
        (SELECT CAST(COUNT(*) AS INTEGER) FROM lstats) AS lin_files_total,
        (SELECT CAST(COUNT(*) AS INTEGER) FROM lstats
         WHERE mxy >= 8 AND mny <= 11) AS lin_files_scanned,
        tile.n_rows, tile.sum_keys
    FROM tile
    """,
)
def zorder_zone_map_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering effectiveness, measured (M225): the SAME 2-D
    data written to the manifest table twice — once clustered by
    Morton Z-value (8 files of contiguous Z-ranges = small rectangles
    in (x,y)), once linearly sorted on x alone — each file carrying
    [min,max] zone-map stats on BOTH columns (M211); a y-band probe
    (the dimension the linear layout did NOT sort by) then plans its
    scan through the zone maps.

    The x-sorted layout's files each span the FULL y range, so a
    y-predicate prunes NOTHING (8/8 files scanned); the Z layout's
    files are rectangles tight in BOTH dimensions, so the same probe
    touches a fraction of them — THE reason lakehouses Z-order their
    multi-dimensional filter columns instead of picking one sort key.  All four
    file counts ride in the value hash (the oracle recomputes bucket
    stats and intersections closed-form), along with the tile rows —
    so both the pruning decisions AND the data they return are pinned.

    Scale: cluster-by-Z is one write-time sort; probing is driver-side
    metadata; at 100 TB the gap between the two layouts on a 2-D probe
    is typically 10-100x in files touched.
    """
    import os
    import shutil

    from insight_spark.operators.layout import z_value_expr
    from insight_spark.operators.manifest import (
        log_append,
        read_snapshot_pruned_multi,
    )

    from insight_spark.engine import scratch_base

    base = os.path.join(
        scratch_base(),  # r13: tmpfs scratch, same move as sources_rt
        "sources_rt",
        os.path.basename(os.path.normpath(sf_dir)),
        "zorder_zone",
    )
    shutil.rmtree(base, ignore_errors=True)
    pts = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(_ZM_X).cast("long").alias("x"),
        F.expr(_ZM_Y).cast("long").alias("y"),
        z_value_expr(_ZM_X, _ZM_Y, 5).alias("zval"),
    )
    zpts = pts.withColumn("b", F.expr("zval div 128"))
    lpts = pts.withColumn("b", F.expr("x div 4"))
    def _write_layout(arg) -> None:
        name, layed = arg
        tbl = os.path.join(base, name)
        # ONE job per layout (VERDICT r10 "what's wrong" #1 — the old
        # per-bucket filter loop re-scanned the full input ≤8 times):
        # hash-repartition on the bucket id puts each bucket's rows in
        # exactly one task, and the Hive-partitioned staging write
        # splits any task that holds two buckets into one file per
        # bucket directory — exactly one file per bucket, one source
        # scan.  sortWithinPartitions keeps each file Z-contiguous
        # (the write-time clustering sort the technique is named for).
        log_append(
            layed.repartition(8, "b").sortWithinPartitions("b", "zval"),
            tbl,
            stats_cols=["x", "y"],
            partition_by=["b"],
        )

    # r13 (guide §2.6): the two layouts are independent jobs over
    # distinct table logs — overlap them from two driver threads so
    # one write's commit tail back-fills with the other's tasks.
    # inheritable_thread_target (ADVICE r12) so the writes keep the
    # caller's job group — tests/test_r11_ops.py pins the probe's
    # job count inside a group.
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    with ThreadPoolExecutor(max_workers=2) as pool:
        list(
            pool.map(
                inheritable_thread_target(_write_layout),
                (("z", zpts), ("lin", lpts)),
            )
        )
    zdf, z_scan, z_total = read_snapshot_pruned_multi(
        spark, os.path.join(base, "z"), [("y", 8, 11)]
    )
    _, l_scan, l_total = read_snapshot_pruned_multi(
        spark, os.path.join(base, "lin"), [("y", 8, 11)]
    )
    return zdf.agg(
        F.lit(z_total).cast("int").alias("z_files_total"),
        F.lit(z_scan).cast("int").alias("z_files_scanned"),
        F.lit(l_total).cast("int").alias("lin_files_total"),
        F.lit(l_scan).cast("int").alias("lin_files_scanned"),
        F.count("*").alias("n_rows"),
        F.sum("o_orderkey").alias("sum_keys"),
    )
