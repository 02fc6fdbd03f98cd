"""Event-stream batch queries (SURVEY.md §2.D5/D6, §2.H13, §2.K1 batch).

These are the batch forms of the streaming K-ops (stream-batch
unification, §2.K): the same DataFrame expressions run under
``readStream`` in insight_spark.streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insight_spark.operators.relational import MONEY, money_out
from insight_spark.queries import query
from insight_spark.sources import load_table


@query(
    "distinct_exact",
    oracle="""
    SELECT COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    """,
)
def distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count (D5) — two-phase partial/final distinct agg."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@query(
    "distinct_exact_approx",
    oracle="""
    SELECT COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events,
           TRUE AS approx_within_5pct
    FROM events
    """,
)
def distinct_exact_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact + approx distinct (D5/D6).

    The raw HyperLogLog estimate is engine-specific, so instead of
    shipping it, the query ships the *error-bound assertion*: the
    sketch (rsd 0.02) must land within 5% of the exact count.  The
    oracle states the bound as a constant TRUE — Spark recomputes it
    from the live sketch, so a sketch regression breaks the value hash.
    This upgrades D6 from a rows-only check to a real oracle row
    (SURVEY.md §7.4.6 refinement).
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.approx_count_distinct("user_id", 0.02).alias("_n_users_approx"),
        F.count("*").alias("n_events"),
    )
    rel_err = F.abs(F.col("_n_users_approx") - F.col("n_users")) / F.col(
        "n_users"
    )
    return agg.select(
        "n_users", "n_events", (rel_err <= 0.05).alias("approx_within_5pct")
    )


@query(
    "json_extract_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           ROUND(CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE)
                 / COUNT(json_extract_string(props, '$.k')), 6) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction + agg (H13, D1).  get_json_object stays
    JVM-side (Jackson), no Python UDF."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    grouped = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.count(k).alias("_n_k"),
    )
    return grouped.select(
        "event_type",
        "n",
        "sum_k",
        F.round(F.col("sum_k").cast("double") / F.col("_n_k"), 6).alias("avg_k"),
    )


@query(
    "variant_extract_agg",
    oracle="""
    WITH docs AS (
        SELECT event_type,
               '{"meta":{"type":"' || event_type || '"},"payload":'
                   || props || '}' AS doc
        FROM events
    )
    SELECT json_extract_string(doc, '$.meta.type') AS meta_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(doc, '$.payload.k')
                         AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(doc, '$.payload.k')
                         AS INTEGER)) AS INTEGER) AS max_k
    FROM docs
    GROUP BY 1
    """,
)
def variant_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through the Spark 4 VARIANT type
    (H13/H14 depth): documents parse ONCE into variant's shredded
    binary encoding (``parse_json``), then typed paths extract with
    ``variant_get`` — nested traversal without re-parsing JSON text
    per path, the engine-native route for schema-on-read event
    payloads (vs ``json_extract_agg``'s per-path get_json_object).

    The nested doc is built deterministically from the flat fixture
    columns so the extraction exercises two levels; the oracle replays
    the same construction with DuckDB's JSON functions — the hash
    check pins variant path semantics (string vs int coercion
    included) to the portable JSON-text behavior.  Scale: map-only
    parse+extract fused into the scan projection, one bounded-key
    aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"meta":{"type":"'),
        F.col("event_type"),
        F.lit('"},"payload":'),
        F.col("props"),
        F.lit("}"),
    )
    v = F.parse_json(doc)
    k = F.variant_get(v, "$.payload.k", "int")
    return (
        ev.select(
            F.variant_get(v, "$.meta.type", "string").alias("meta_type"),
            k.alias("_k"),
        )
        .groupBy("meta_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("_k").alias("sum_k"),
            F.max("_k").alias("max_k"),
        )
    )


@query(
    "events_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window agg (K1 batch form).  ``F.window`` buckets
    are epoch-aligned, identical to date_trunc('hour')."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(MONEY)).alias("_sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            money_out("_sum_value").alias("sum_value"),
        )
    )


@query(
    "funnel_conversion_steps",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT)
               AS n_users,
           CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT)
               AS n_view_click_purchase,
           ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
                 / (SELECT COUNT(*) FROM v), 6) AS click_rate,
           ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
                 / NULLIF((SELECT COUNT(*) FROM c), 0), 6) AS purchase_rate
    """,
)
def funnel_conversion_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (the sequential-pattern analytics shape
    SQL MATCH_RECOGNIZE covers in other engines): a user converts at
    stage k only via events in ORDER — first view, then the first
    click strictly after it, then the first purchase strictly after
    that click.  One row: stage survivor counts + step conversion
    rates.

    Spark shape: three per-user min-aggregates chained by equi-joins
    on user_id — each stage shuffles only (user_id, one timestamp),
    partial-aggregated map-side; no self-cross-join, no window over
    unbounded event lists, no per-user event array materialization.
    The stage chain is the standard scalable funnel plan at any
    event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    n_users = ev.agg(F.countDistinct("user_id").alias("n_users"))
    nv = v.agg(F.count("*").alias("n_view"))
    nc = c.agg(F.count("*").alias("n_view_click"))
    np_ = p.agg(F.count("*").alias("n_view_click_purchase"))
    return (
        n_users.crossJoin(nv)
        .crossJoin(nc)
        .crossJoin(np_)
        .select(
            "n_users",
            "n_view",
            "n_view_click",
            "n_view_click_purchase",
            F.round(
                F.col("n_view_click").cast("double") / F.col("n_view"), 6
            ).alias("click_rate"),
            F.round(
                F.col("n_view_click_purchase").cast("double")
                / F.nullif(F.col("n_view_click"), F.lit(0)),
                6,
            ).alias("purchase_rate"),
        )
    )


@query(
    "funnel_time_to_convert",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    ),
    d AS (
        SELECT p.user_id,
               epoch_ms(p.t_purchase) // 1000
               - epoch_ms(v.t_view) // 1000 AS delta_s
        FROM p JOIN v USING (user_id)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           ROUND(quantile_cont(delta_s, 0.5), 6) AS median_s,
           ROUND(quantile_cont(delta_s, 0.9), 6) AS p90_s,
           CAST(MIN(delta_s) AS BIGINT) AS min_s,
           CAST(MAX(delta_s) AS BIGINT) AS max_s
    FROM d
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency distribution (M144): for every FULLY converted
    user (the ordered view → click-after → purchase-after chain of
    `funnel_conversion_steps`), the view→purchase latency in whole
    seconds, summarized as count + interpolated median/p90 + exact
    min/max — the time-to-convert readout product analytics pairs
    with the stage-rate funnel.

    Same chained per-user MIN-aggregate plan as the stage funnel
    (user-keyed shuffles of one timestamp each, no windows, no event
    arrays); latencies are exact integer seconds (epoch-second
    subtraction), so the only doubles are the two interpolated
    percentiles — the shared Spark-percentile / quantile_cont
    definition, 6-dp-rounded (value_percentiles precedent: integer
    gaps dwarf any interpolation ulp).
    """
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    d = p.join(v, "user_id").select(
        (
            F.floor(F.unix_millis("t_purchase") / 1000)
            - F.floor(F.unix_millis("t_view") / 1000)
        ).alias("delta_s")
    )
    return d.agg(
        F.count("*").alias("n_converted"),
        F.round(F.percentile("delta_s", F.lit(0.5)), 6).alias("median_s"),
        F.round(F.percentile("delta_s", F.lit(0.9)), 6).alias("p90_s"),
        F.min("delta_s").cast("long").alias("min_s"),
        F.max("delta_s").cast("long").alias("max_s"),
    )


@query(
    "kmv_set_cardinality",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(MAX(CASE WHEN event_type = 'view'
                             THEN 1 ELSE 0 END) AS BIGINT) AS in_a,
               CAST(MAX(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS in_b
        FROM events
        WHERE event_type IN ('view', 'purchase')
        GROUP BY user_id
    ),
    hashed AS (
        SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 11))
                    AS BIGINT) AS h,
               in_a, in_b
        FROM per_user
    ),
    head AS (
        SELECT h, in_a, in_b FROM hashed
        ORDER BY h, in_a DESC, in_b DESC LIMIT 64
    ),
    sk AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
               CAST(MAX(h) AS BIGINT) AS h_k,
               CAST(SUM(in_a * in_b) AS BIGINT) AS j_num
        FROM head
    ),
    exact AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
               CAST(SUM(in_a * in_b) AS BIGINT) AS exact_inter
        FROM per_user
    ),
    est AS (
        SELECT sk.k_used, sk.h_k,
               CASE WHEN sk.k_used < 64 THEN exact.exact_union
                    ELSE ((sk.k_used - 1) * 17592186044416) // sk.h_k
               END AS est_union,
               sk.j_num, exact.exact_union, exact.exact_inter
        FROM sk, exact
    )
    SELECT k_used, h_k, est_union, exact_union,
           (2000000 * abs(est_union - exact_union) + exact_union)
               // (2 * exact_union) AS union_err_ppm,
           (j_num * est_union) // k_used AS est_inter,
           exact_inter,
           (2000000 * j_num + k_used) // (2 * k_used) AS jaccard_ppm
    FROM est
    """,
)
def kmv_set_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values sketch (M252): distinct-count and intersection
    estimation over the view-user and purchase-user sets — the
    mergeable theta-sketch-style alternative to HLL (D6/M41's family)
    that also estimates SET OPERATIONS: union cardinality from the
    k-th smallest hash, Jaccard from the membership flags carried by
    the k smallest, intersection = jaccard x union.  The exact counts
    ride along so the result IS its own error report.

    Exactness: the keyed hash is 44 bits of md5 (conv/strtol parity,
    the bootstrap_mean_ci idiom) so (k-1)*2^44 stays deep inside
    int64 and every estimate is integer division — identical on both
    engines; below k distinct users the sketch degrades to exact by
    construction.  Scale: one user-keyed aggregate, then a global
    top-64-by-hash (TakeOrdered with map-side partial top-k — the
    batch equivalent of the streaming bounded sketch) and two 1-row
    reduces; the production form keeps one 64-value state per set and
    merges by min-merge.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "view").cast("int"))
            .cast("long")
            .alias("in_a"),
            F.max((F.col("event_type") == "purchase").cast("int"))
            .cast("long")
            .alias("in_b"),
        )
    )
    hashed = per_user.select(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 11),
               16, 10)
        .cast("long")
        .alias("h"),
        "in_a",
        "in_b",
    )
    head = hashed.orderBy(
        "h", F.desc("in_a"), F.desc("in_b")
    ).limit(64)
    sk = head.agg(
        F.count("*").cast("long").alias("k_used"),
        F.max("h").cast("long").alias("h_k"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("j_num"),
    )
    exact = per_user.agg(
        F.count("*").cast("long").alias("exact_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias(
            "exact_inter"
        ),
    )
    est = sk.crossJoin(exact).select(
        "k_used",
        "h_k",
        F.when(F.col("k_used") < 64, F.col("exact_union"))
        .otherwise(
            F.expr("((k_used - 1) * 17592186044416) div h_k")
        )
        .alias("est_union"),
        "j_num",
        "exact_union",
        "exact_inter",
    )
    return est.select(
        "k_used",
        "h_k",
        "est_union",
        "exact_union",
        F.expr(
            "(2000000 * abs(est_union - exact_union) + exact_union)"
            " div (2 * exact_union)"
        ).alias("union_err_ppm"),
        F.expr("(j_num * est_union) div k_used").alias("est_inter"),
        "exact_inter",
        F.expr("(2000000 * j_num + k_used) div (2 * k_used)").alias(
            "jaccard_ppm"
        ),
    )


@query(
    "ohlc_hourly_bars",
    oracle="""
    WITH x AS (
        SELECT date_trunc('hour', ts) AS bar_hour,
               struct_pack(
                   us := epoch_us(ts),
                   eid := event_id,
                   vu := CAST(CAST(value AS DECIMAL(38,6)) * 1000000
                              AS BIGINT)
               ) AS s
        FROM events WHERE event_type = 'purchase'
    )
    SELECT bar_hour,
           CAST(COUNT(*) AS BIGINT) AS n_trades,
           CAST(min(s)['vu'] AS BIGINT) AS open_micro,
           CAST(max(s)['vu'] AS BIGINT) AS close_micro,
           CAST(MAX(s.vu) AS BIGINT) AS high_micro,
           CAST(MIN(s.vu) AS BIGINT) AS low_micro
    FROM x GROUP BY bar_hour
    """,
)
def ohlc_hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars over purchase values (M277): open / high /
    low / close per hour — the canonical time-series downsample every
    market-data and metrics store serves (candlestick charts, bar
    aggregation before modeling).  Open and close are FIRST/LAST BY
    TIME, which plain min/max aggregates can't express.

    Exactness: first/last via min/max over a (epoch_µs, event_id,
    value_micro) struct — lexicographic struct comparison is identical
    in both engines, the (ts, event_id) prefix is UNIQUE so ties are
    impossible, and epoch-µs integers sidestep timestamp-precision
    dialect drift (Spark stores µs; DuckDB epoch_us truncates its ns
    identically).  Value in exact micro BIGINTs throughout.

    Scale: ONE map-side-combined aggregate on the hour key — the
    min/max-over-struct pairs are classic partial-aggregable monoids,
    so this is exactly the `events_hourly` shuffle shape (|hours|
    keys) with zero windows, zero joins, no per-group
    materialization.  This is the batch form; the same expressions
    run under `readStream` with a watermark (the K1 unification).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    s = F.struct(
        F.unix_micros(F.col("ts")).alias("us"),
        F.col("event_id").alias("eid"),
        (F.col("value").cast("decimal(38,6)") * 1000000)
        .cast("long")
        .alias("vu"),
    )
    return (
        ev.select(F.date_trunc("hour", "ts").alias("bar_hour"), s.alias("s"))
        .groupBy("bar_hour")
        .agg(
            F.count("*").cast("long").alias("n_trades"),
            F.min("s").getField("vu").cast("long").alias("open_micro"),
            F.max("s").getField("vu").cast("long").alias("close_micro"),
            F.max(F.col("s.vu")).cast("long").alias("high_micro"),
            F.min(F.col("s.vu")).cast("long").alias("low_micro"),
        )
    )


@query(
    "bottomk_mergeable_sample",
    oracle="""
    WITH hashed AS (
        SELECT DISTINCT user_id,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 11))
                    AS BIGINT) AS h
        FROM events
    ),
    head AS (SELECT user_id, h FROM hashed ORDER BY h, user_id LIMIT 32)
    SELECT user_id, h,
           CAST(ROW_NUMBER() OVER (ORDER BY h, user_id) AS INTEGER)
               AS sample_rank
    FROM head
    """,
)
def bottomk_mergeable_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k mergeable uniform sample (M283): the k=32 users with
    the smallest md5 hashes ARE a uniform random sample of the user
    population — and unlike reservoir sampling, the bottom-k set is a
    MERGEABLE sketch: bottomk(A ∪ B) == bottomk(bottomk(A) ∪
    bottomk(B)) (property-pinned), so per-partition heaps combine to
    the global sample with no coordination and the same sample is
    reproducible on any engine from the hash alone.  `kmv_set_
    cardinality` consumes this structure's k-th statistic for
    counting; this query emits the SAMPLE ITSELF — the distributed
    EDA/debugging primitive ("show me 32 representative users").

    Exactness: the hash is the house 44-bit md5-prefix integer (the
    kmv idiom); ordering and ranks are exact integers with user_id
    tie-break.  Scale: distinct-user reduce, then TakeOrdered(32)
    (per-partition heaps + driver merge of k·P rows — never a global
    sort); the rank window runs on the 32-row head (documented
    BOUNDED_GLOBAL_WINDOW_OK entry).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    hashed = ev.select("user_id").distinct().select(
        "user_id",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 11),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    head = hashed.orderBy("h", "user_id").limit(32)
    return head.withColumn(
        "sample_rank",
        F.row_number()
        .over(Window.orderBy("h", "user_id"))
        .cast("int"),
    )


@query(
    "ams_f2_sketch",
    oracle="""
    WITH reps AS (SELECT unnest(range(0, 16)) AS r),
    signed AS (
        SELECT r.r,
               CASE WHEN (strpos('0123456789abcdef',
                          substr(md5(CAST(r.r AS VARCHAR) || '|'
                                     || CAST(e.user_id AS VARCHAR)),
                                 1, 1)) - 1) % 2 = 0
                    THEN 1 ELSE -1 END AS s
        FROM events e CROSS JOIN reps r
    ),
    z AS (
        SELECT r, CAST(SUM(s) AS BIGINT) AS zr FROM signed GROUP BY r
    ),
    est AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
               CAST(SUM(CAST(zr AS HUGEINT) * zr) AS HUGEINT) AS sum_z2
        FROM z
    ),
    freq AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS f
        FROM events GROUP BY user_id
    ),
    exact AS (
        SELECT CAST(SUM(CAST(f AS HUGEINT) * f) AS HUGEINT) AS f2
        FROM freq
    )
    SELECT est.n_reps,
           CAST(exact.f2 AS BIGINT) AS f2_exact,
           CAST((2 * est.sum_z2 + est.n_reps)
                // (2 * est.n_reps) AS BIGINT) AS f2_est,
           CAST((2000000 * abs((2 * est.sum_z2 + est.n_reps)
                               // (2 * est.n_reps) - exact.f2)
                 + exact.f2) // (2 * exact.f2) AS BIGINT) AS err_ppm
    FROM est CROSS JOIN exact
    """,
)
def ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-frequency-moment sketch (M301): estimate
    F₂ = Σ f_u² of the user-frequency vector from 16 ±1-hash
    counters (Alon-Matias-Szegedy 1996, public) — the sketch that
    underlies streaming JOIN-SIZE estimation (self-join size IS F₂;
    `join_size_estimate` computes the exact form, this is its
    mergeable one-pass estimator) and completes the sketch shelf
    (HLL distinct, CMS point-frequency, KMV set ops, histogram
    quantiles, bloom membership — AMS is the moments/join-size
    member).

    Determinism: the ±1 hash is the md5 parity of (rep|user) — both
    engines COMPUTE the same signs (no shared literals), so
    estimator and exact value alike are exact integer arithmetic:
    each Z_r is an exact BIGINT sum of ±1s weighted by arrival
    counts, the estimate is the half-up mean of Z_r² in HUGEINT/
    DECIMAL, and err_ppm is the half-up integer identity.

    Scale: ONE events scan × 16-rep broadcast explode, map-side
    ±1 accumulation into 16 cells (the CMS build shape — cells, not
    keys, shuffle); exact side is the `distinct_exact` two-phase
    shape.  Z_r cells are additively MERGEABLE across partitions,
    shards, and days — the property the whole sketch family here is
    organized around.
    """
    dec = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events")
    reps = spark.range(16).select(F.col("id").cast("int").alias("r"))
    signed = ev.crossJoin(F.broadcast(reps)).select(
        "r",
        F.when(
            (
                F.instr(
                    F.lit("0123456789abcdef"),
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("r").cast("string"),
                                F.lit("|"),
                                F.col("user_id").cast("string"),
                            )
                        ),
                        1,
                        1,
                    ),
                )
                - 1
            )
            % 2
            == 0,
            1,
        )
        .otherwise(-1)
        .alias("s"),
    )
    z = signed.groupBy("r").agg(F.sum("s").cast("long").alias("zr"))
    est = z.agg(
        F.count("*").cast("long").alias("n_reps"),
        F.sum(F.col("zr").cast(dec) * F.col("zr")).alias("sum_z2"),
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("f"))
        .agg(F.sum(F.col("f").cast(dec) * F.col("f")).alias("f2"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "n_reps",
        F.col("f2").cast("long").alias("f2_exact"),
        F.expr(
            "CAST((2 * sum_z2 + n_reps) div (2 * n_reps) AS BIGINT)"
        ).alias("f2_est"),
        F.expr(
            "CAST((2000000 * abs((2 * sum_z2 + n_reps) div (2 * n_reps)"
            " - f2) + f2) div (2 * f2) AS BIGINT)"
        ).alias("err_ppm"),
    )


@query(
    "event_type_affinity",
    oracle="""
    WITH ut AS (
        SELECT DISTINCT user_id, event_type FROM events
    ),
    singles AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM ut GROUP BY event_type
    ),
    tot AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ut
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT p.type_a, p.type_b, sa.n AS n_a, sb.n AS n_b, p.n_both,
           CAST((2000000 * CAST(p.n_both AS HUGEINT) * t.n_users
                 + CAST(sa.n AS HUGEINT) * sb.n)
                // (2 * CAST(sa.n AS HUGEINT) * sb.n) AS BIGINT)
               AS lift_ppm
    FROM pairs p
    JOIN singles sa ON sa.event_type = p.type_a
    JOIN singles sb ON sb.event_type = p.type_b
    CROSS JOIN tot t
    """,
)
def event_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type affinity lift (M303): for every behavior pair, the
    observed/expected co-adoption ratio lift = P(a∧b)/(P(a)·P(b)) at
    USER level — the feature-adoption affinity matrix product
    analytics reads before bundling or cross-promoting (lift ≫ 1e6
    ppm: the behaviors travel together; ≪ 1e6: substitutes).  The
    user-level cousin of `assoc_rules` (basket level) and
    `pmi_collocations` (token level, log-scaled) — same algebra,
    different grain, and kept log-free so it hashes exactly.

    Exactness: distinct (user, type) reduce; pair counts via the
    bounded self-join (≤|types| rows per user → ≤C(5,2) pairs);
    lift as the half-up integer identity over HUGEINT/DECIMAL
    products (n_both·N overflows int64 at ~1e10 users).

    Scale: the self-join fans out by per-user TYPE COUNT (≤5), never
    by data volume; singles/totals are |types|-row broadcasts onto
    10 metadata rows.
    """
    dec = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    singles = ut.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    tot = ut.agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    return (
        pairs.join(
            F.broadcast(
                singles.select(
                    F.col("event_type").alias("type_a"),
                    F.col("n").alias("n_a"),
                )
            ),
            "type_a",
        )
        .join(
            F.broadcast(
                singles.select(
                    F.col("event_type").alias("type_b"),
                    F.col("n").alias("n_b"),
                )
            ),
            "type_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.expr(
                "CAST((2000000 * CAST(n_both AS decimal(38,0)) * n_users"
                " + CAST(n_a AS decimal(38,0)) * n_b)"
                " div (2 * CAST(n_a AS decimal(38,0)) * n_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


@query(
    "decayed_user_activity_rank",
    oracle="""
    WITH w AS (
        SELECT user_id,
               least(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                     // 7, 4) AS wk
        FROM events
    ),
    scored AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS events_total,
               CAST(SUM(CAST(1 AS BIGINT) << CAST(wk AS INTEGER))
                    AS BIGINT) AS score_decayed
        FROM w GROUP BY user_id
    )
    SELECT user_id, events_total, score_decayed
    FROM scored
    ORDER BY score_decayed DESC, user_id
    LIMIT 10
    """,
)
def decayed_user_activity_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed activity ranking (M304): top-10 users by an
    exponentially time-decayed event count — recent weeks weigh
    2× the week before them — the recency-aware popularity score
    every feed/recommendation ranker uses instead of the raw count
    `join_key_skew_profile`-style tallies give (a user active only in
    week 1 should not outrank one active now).

    Exactness: the decay weights are exact integer POWERS OF TWO
    (weight = 1 << week_index, the `ewma_smooth` bit-exact-weights
    discipline) — no float decay constant, no libm; week bucketing is
    exact epoch-day integer arithmetic; top-10 ordered on (exact
    score, user_id).

    Scale: one map-side-combined user-keyed aggregate, then
    TakeOrderedAndProject(10) — per-partition heaps, never a global
    sort.
    """
    ev = load_table(spark, sf_dir, "events")
    wk = F.least(
        F.expr(
            "datediff(CAST(ts AS DATE), DATE '2024-01-01') div 7"
        ),
        F.lit(4),
    )
    scored = (
        ev.select("user_id", wk.alias("wk"))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("events_total"),
            F.sum(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(wk AS INT))")
            )
            .cast("long")
            .alias("score_decayed"),
        )
    )
    return scored.orderBy(
        F.desc("score_decayed"), F.asc("user_id")
    ).limit(10)


@query(
    "rate_limit_admission_audit",
    oracle="""
    WITH ranked AS (
        SELECT event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, date_trunc('minute', ts)
                   ORDER BY epoch_us(ts), event_id
               ) AS rn
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(count_if(rn <= 3) AS BIGINT) AS admitted,
           CAST(count_if(rn > 3) AS BIGINT) AS rejected,
           CAST((2000000 * count_if(rn > 3) + COUNT(*))
                // (2 * COUNT(*)) AS BIGINT) AS reject_ppm
    FROM ranked GROUP BY event_type
    """,
)
def rate_limit_admission_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-limit admission replay (M331): apply a 3-per-user-per-
    calendar-minute limit to the historical log IN ARRIVAL ORDER and
    report what it would have admitted/rejected per event type — the
    policy dry-run every API team does before turning a limiter on
    (M299 sized the burst; this prices a concrete rule against real
    traffic, and `frequency_cap_waste` is its daily-grain cousin).
    Admission is by arrival rank WITHIN the window, not random drop —
    exactly how fixed-window limiters behave.

    Exactness: arrival order = (epoch_µs, event_id) — exact and
    unique; admission is an integer rank predicate; rates half-up
    ppm.

    Scale: ONE window partitioned on (user, minute) — finer than the
    sessionize key, so per-partition state is at most one user's one
    minute; then a |types|-keyed map-side aggregate.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", F.date_trunc("minute", "ts")
    ).orderBy(F.unix_micros(F.col("ts")), F.col("event_id"))
    ranked = ev.select(
        "event_type", F.row_number().over(w).alias("rn")
    )
    return ranked.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.count_if(F.col("rn") <= 3).cast("long").alias("admitted"),
        F.count_if(F.col("rn") > 3).cast("long").alias("rejected"),
        F.expr(
            "CAST((2000000 * count_if(rn > 3) + COUNT(*))"
            " div (2 * COUNT(*)) AS BIGINT)"
        ).alias("reject_ppm"),
    )


@query(
    "telemetry_echo_audit",
    oracle="""
    WITH cells AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        GROUP BY event_type, user_id,
                 CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT),
                 date_trunc('second', ts)
    )
    SELECT event_type,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(count_if(n >= 2) AS BIGINT) AS echo_cells,
           CAST(SUM(CASE WHEN n >= 2 THEN n - 1 ELSE 0 END) AS BIGINT)
               AS echo_events,
           CAST((2000000 * SUM(CASE WHEN n >= 2 THEN n - 1 ELSE 0 END)
                 + SUM(n)) // (2 * SUM(n)) AS BIGINT) AS echo_ppm
    FROM cells GROUP BY event_type
    """,
)
def telemetry_echo_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry echo audit (M343): events IDENTICAL in (user, type,
    value, second) beyond the first — the double-fire/SDK-echo rate
    (a retry loop or a double-mounted handler emits byte-identical
    telemetry; `burst_rate_audit` counts VOLUME spikes, this counts
    literal REPEATS — a user legitimately clicking 5 different
    things in a second is a burst, not an echo).  echo_events is
    exactly what an idempotency key would have suppressed — the
    before/after table for introducing one.

    Exactness: the identity cell is exact (micro value, second
    truncation); overage per cell = n−1 exact; rate half-up ppm.

    Scale: ONE map-side-combined count on the full identity key
    (echoes collapse map-side), then a |types|-keyed reduce.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        "user_id",
        (F.col("value").cast("decimal(38,6)") * 1000000)
        .cast("long")
        .alias("vu"),
        F.date_trunc("second", "ts").alias("sec"),
    ).agg(F.count("*").cast("long").alias("n"))
    return cells.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.count_if(F.col("n") >= 2).cast("long").alias("echo_cells"),
        F.sum(F.when(F.col("n") >= 2, F.col("n") - 1).otherwise(0))
        .cast("long")
        .alias("echo_events"),
        F.expr(
            "CAST((2000000 * SUM(CASE WHEN n >= 2 THEN n - 1 ELSE 0 END)"
            " + SUM(n)) div (2 * SUM(n)) AS BIGINT)"
        ).alias("echo_ppm"),
    )
