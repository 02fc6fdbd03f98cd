"""Property pins for the round-9 session-2 operators (M175-M191).

These cover the invariants the driver hash can't see: the CUSUM
closed form agreeing with the sequential recurrence it replaces, the
Theil-Sen median agreeing with a brute-force reference, RAKE's
segmentation laws, Lorenz/DAU monotonicity, and the Benford table's
exact-probability accounting.
"""

from __future__ import annotations

from tests.conftest import SF_DIR


def _q(name):
    from insight_spark.queries import all_queries

    return all_queries()[name]


def _hourly_series(spark):
    from pyspark.sql import functions as F

    from insight_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events")
    rows = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("x"))
        .orderBy("h")
        .collect()
    )
    return [(r["h"], r["x"]) for r in rows]


def test_cusum_matches_sequential_recurrence(spark):
    """The prefix-minus-running-min closed form IS the recurrence
    S_t = max(0, S_{t-1} + (n*x_t - sum_x)) — replay it sequentially
    in Python and compare the top-5 rows."""
    series = _hourly_series(spark)
    n = len(series)
    sx = sum(x for _, x in series)
    s, out = 0, []
    for h, x in series:
        s = max(0, s + (n * x - sx))
        out.append((h, x, s))
    expect = sorted(out, key=lambda t: (-t[2], t[0]))[:5]
    got = [
        (r["hour"], r["n_events"], r["cusum_scaled"])
        for r in _q("cusum_changepoint")(spark, SF_DIR).collect()
    ]
    assert got == expect


def test_theil_sen_matches_reference(spark):
    """Brute-force all-pairs median (same micro quantization, same
    (slope, i, j) total order) equals the query's single row."""
    import math

    series = [x for _, x in _hourly_series(spark)]
    slopes = []
    for i in range(len(series)):
        for j in range(i + 1, len(series)):
            s = math.floor(
                float((series[j] - series[i]) * 1000000) / (j - i)
            )
            slopes.append((s, i + 1, j + 1))
    slopes.sort()
    med = slopes[(len(slopes) + 1) // 2 - 1][0]
    row = _q("theil_sen_trend")(spark, SF_DIR).collect()[0]
    assert row["n_pairs"] == len(slopes)
    assert row["median_slope_micro"] == med


def test_rake_segmentation_laws(spark):
    """Every keyphrase is 1-3 words, contains no stopword, and scores
    are positive multiples consistent with >= plen * 1e6 (each member
    word's deg/freq ratio >= 1, so score_micro >= plen * 1e6 is NOT
    guaranteed per-word after integer floor -- but every word's
    score_micro >= 1e6 since deg >= freq; a phrase of k words scores
    >= k * 1e6)."""
    from insight_spark.queries.text_extra import STOPWORDS

    rows = _q("rake_keyword_extract")(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 15
    for r in rows:
        words = r["phrase"].split(" ")
        assert 1 <= len(words) <= 3
        assert not set(words) & set(STOPWORDS)
        assert r["score_micro"] >= len(words) * 1000000


def test_benford_table_exact_probabilities(spark):
    """The expected-probability column is the pre-quantized Benford
    table and sums to exactly 1e6 when all 9 digits appear; observed
    fractions sum to 1 (one division each of the same total)."""
    rows = _q("benford_first_digit_audit")(spark, SF_DIR).collect()
    digits = {r["digit"] for r in rows}
    assert digits <= set(range(1, 10))
    if len(digits) == 9:
        assert sum(r["expected_micro"] for r in rows) == 1000000
    total = sum(r["n"] for r in rows)
    assert all(
        abs(r["observed_frac"] - r["n"] / total) < 1e-15 for r in rows
    )


def test_dau_never_exceeds_wau(spark):
    """A day's actives are a subset of its trailing-7-day actives, so
    stickiness <= 1 everywhere and dau <= wau."""
    rows = _q("dau_wau_stickiness")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["dau"] <= r["wau"]
        assert 0.0 < r["stickiness"] <= 1.0


def test_lorenz_curve_monotone_and_convex_ordering(spark):
    """Cumulative shares are nondecreasing, end at exactly 1e6 (the
    final integer division is tn//tn), and the revenue share never
    exceeds the population share (buckets ascend by per-customer
    spend, the Lorenz ordering)."""
    rows = sorted(
        _q("revenue_lorenz_curve")(spark, SF_DIR).collect(),
        key=lambda r: r["bucket"],
    )
    assert rows
    prev_p, prev_r = -1, -1
    for r in rows:
        assert r["cum_pop_ppm"] >= prev_p and r["cum_rev_ppm"] >= prev_r
        # floor division loses < 1 ppm; allow the 1-ppm slack
        assert r["cum_rev_ppm"] <= r["cum_pop_ppm"] + 1
        prev_p, prev_r = r["cum_pop_ppm"], r["cum_rev_ppm"]
    assert rows[-1]["cum_pop_ppm"] == 1000000
    assert rows[-1]["cum_rev_ppm"] == 1000000


def test_churn_labels_match_holdout_recount(spark):
    """churned == 1 exactly for feature-row users with zero events
    after the split, recounted directly from the raw table."""
    from pyspark.sql import functions as F

    from insight_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events")
    split = ev.agg(
        F.min("ts").cast("timestamp") + F.expr("INTERVAL 21 DAY")
    ).collect()[0][0]
    holdout = {
        r["user_id"]
        for r in ev.where(F.col("ts") >= F.lit(split))
        .select("user_id")
        .distinct()
        .collect()
    }
    rows = _q("churn_label_build")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["churned"] == (0 if r["user_id"] in holdout else 1)


def test_rbo_overlap_monotone_and_bounded(spark):
    """Prefix overlap is nondecreasing in depth and never exceeds the
    depth; terms are overlap * weight exactly."""
    rows = sorted(
        _q("rank_biased_overlap")(spark, SF_DIR).collect(),
        key=lambda r: r["depth"],
    )
    assert [r["depth"] for r in rows] == list(range(1, 11))
    prev = 0
    for r in rows:
        assert prev <= r["overlap_at_d"] <= r["depth"]
        assert r["term_nano"] == r["overlap_at_d"] * r["weight_nano"]
        prev = r["overlap_at_d"]


def test_knn_label_agreement_shape(spark):
    """Each probe reports exactly 3 non-self neighbors (corpus > 4)
    and agree_frac is the exact n_same / n_neighbors division."""
    rows = _q("knn_label_agreement")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_neighbors"] == 3
        assert 0 <= r["n_same"] <= 3
        assert r["agree_frac"] == r["n_same"] / r["n_neighbors"]
