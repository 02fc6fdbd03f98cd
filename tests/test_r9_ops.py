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


def test_hazard_risk_sets_telescope(spark):
    """n_at_risk is nonincreasing and telescopes exactly: each day's
    at-risk count drops by the previous day's conversions."""
    rows = sorted(
        _q("survival_hazard_table")(spark, SF_DIR).collect(),
        key=lambda r: r["day"],
    )
    assert [r["day"] for r in rows] == list(range(7))
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_at_risk"] == prev["n_at_risk"] - prev["n_converted"]
    for r in rows:
        assert 0 <= r["n_converted"] <= r["n_at_risk"]


def test_bloom_no_false_negatives_and_fpr_sane(spark):
    """Every inserted token's positions are set by construction (no
    false negatives is structural); the measured FPR must match
    n_false_pos / n_tested and the load factor can't exceed 3n/m."""
    row = _q("bloom_fpr_audit")(spark, SF_DIR).collect()[0]
    assert row["m_bits"] == 4096 and row["k_hashes"] == 3
    assert 0 < row["bits_set"] <= min(4096, 3 * row["n_inserted"])
    assert row["n_tested"] > 0
    assert abs(row["fpr"] - row["n_false_pos"] / row["n_tested"]) < 1e-15


def test_reshard_strategy_ordering(spark):
    """The audit's whole point, pinned to theory: mod-N moves ~8/9 of
    keys, naive range re-split exactly-measure 1/2, ring consistent
    hashing ~1/9 — strictly ordered, and only ring approaches the
    1/9 lower bound any 8->9 rebalance must pay."""
    rows = {
        r["strategy"]: r
        for r in _q("reshard_stability_audit")(spark, SF_DIR).collect()
    }
    assert set(rows) == {"mod", "range", "ring"}
    assert len({r["n_keys"] for r in rows.values()}) == 1
    assert rows["mod"]["moved_ppm"] > 750000       # ~889k expected
    assert 350000 < rows["range"]["moved_ppm"] < 650000   # exactly 1/2
    assert rows["ring"]["moved_ppm"] < 300000      # ~111k expected
    assert (
        rows["ring"]["n_moved"]
        < rows["range"]["n_moved"]
        < rows["mod"]["n_moved"]
    )


def test_zipf_coverage_monotone(spark):
    """Coverage is nondecreasing in k and total_mass is constant."""
    rows = sorted(
        _q("zipf_coverage_curve")(spark, SF_DIR).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == [10, 100, 1000]
    assert len({r["total_mass"] for r in rows}) == 1
    assert (
        rows[0]["top_mass"] <= rows[1]["top_mass"] <= rows[2]["top_mass"]
        <= rows[0]["total_mass"]
    )


def test_jaccard_sweep_nested(spark):
    """Tighter thresholds are subsets: pair and doc counts are
    nonincreasing in the threshold."""
    rows = sorted(
        _q("jaccard_threshold_sweep")(spark, SF_DIR).collect(),
        key=lambda r: r["threshold_pct"],
    )
    assert [r["threshold_pct"] for r in rows] == [70, 80, 90]
    for loose, tight in zip(rows, rows[1:]):
        assert tight["n_pairs"] <= loose["n_pairs"]
        assert tight["n_docs_flagged"] <= loose["n_docs_flagged"]


def test_srm_counts_partition_users(spark):
    """Arms partition the distinct-user universe exactly."""
    from insight_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events")
    n_users = ev.select("user_id").distinct().count()
    row = _q("ab_srm_check")(spark, SF_DIR).collect()[0]
    assert row["n_a"] + row["n_b"] == n_users == row["n_total"]


def test_json_validity_matches_python_parser(spark):
    """The audit's invalid counts agree with Python's json.loads over
    the same deterministically corrupted payloads."""
    import hashlib
    import json as pyjson

    from insight_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events")
    rows = ev.select("event_id", "event_type", "props").collect()
    bad = {}
    for r in rows:
        h = hashlib.md5(str(r["event_id"]).encode()).hexdigest()[0]
        p = r["props"][: max(len(r["props"]) - 2, 0)] if h in "01" else r["props"]
        try:
            pyjson.loads(p)
        except Exception:
            bad[r["event_type"]] = bad.get(r["event_type"], 0) + 1
    got = {
        r["event_type"]: r["n_invalid"]
        for r in _q("json_validity_audit")(spark, SF_DIR).collect()
    }
    for et, n in got.items():
        assert n == bad.get(et, 0), (et, n, bad.get(et, 0))


def test_normalization_delta_nonnegative_and_superset(spark):
    """raw-equal implies norm-equal, so every raw dup cluster nests in
    a norm cluster: dup_docs_norm >= dup_docs_raw per source, and the
    injected variants are all recovered (total delta >= 2 per
    injected pair is too strong under cross-collisions, but the
    corpus-wide delta must be positive — the injection guarantees
    norm-only pairs exist)."""
    rows = _q("normalization_dedup_delta")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["dup_docs_norm"] >= r["dup_docs_raw"]
        assert r["normalization_delta"] >= 0
    assert sum(r["normalization_delta"] for r in rows) > 0


def test_calibration_ece_consistent_with_reliability_bins(spark):
    """ECE re-derived from the M142 reliability-diagram rows (the
    float path) agrees with the integer-telescoped query, and
    MCE >= ECE >= 0 structurally."""
    bins = _q("calibration_reliability_bins")(spark, SF_DIR).collect()
    n = sum(b["n"] for b in bins)
    ece_ref = (
        sum(b["n"] * abs(b["mean_pred"] - b["frac_pos"]) for b in bins) / n
    )
    row = _q("calibration_ece")(spark, SF_DIR).collect()[0]
    assert row["n"] == n and row["n_bins"] == len(bins)
    assert abs(row["ece"] - ece_ref) < 1e-9
    assert 0.0 <= row["ece"] <= row["mce"] <= 1.0


def test_pass_at_k_matches_combinatorial_reference(spark):
    """The product form equals the exact C(n-c,k)/C(n,k) combinatorial
    estimator, recomputed with Python bigint comb over the raw
    (n, c) table."""
    from math import comb

    from pyspark.sql import functions as F

    from insight_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events")
    nc = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.count_if(F.col("event_type") == "purchase").alias("c"),
        )
        .collect()
    )
    got = {
        r["k"]: r for r in _q("pass_at_k_estimator")(spark, SF_DIR).collect()
    }
    for k in (1, 5, 10):
        vals = []
        for r in nc:
            n, c = r["n"], r["c"]
            if n < k:
                continue
            exact = 1.0 - comb(n - c, k) / comb(n, k) if n - c >= k else 1.0
            vals.append(round(exact * 1000000 + 1e-9) / 1000000)
        if not vals:
            assert k not in got
            continue
        row = got[k]
        assert row["n_prompts"] == len(vals)
        # per-prompt micro quantization happens on the PRODUCT form;
        # it can differ from the comb form by 1 micro per prompt
        assert abs(row["mean_pass_at_k"] - sum(vals) / len(vals)) < 2e-6


def test_wilson_interval_brackets_rate(spark):
    """Wilson bounds always bracket the point rate, stay inside
    [0, 1], and shrink with n (no cross-day assertion — just the
    structural laws)."""
    rows = _q("conversion_wilson_ci")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["wilson_lo"] <= r["rate"] <= r["wilson_hi"] <= 1.0


def test_selectivity_profile_rank_is_greedy_order(spark):
    """greedy_rank is a permutation of 1..4 ordered by the exact
    drop/cost rational (cross-multiplied, name tie-break)."""
    rows = _q("predicate_selectivity_profile")(spark, SF_DIR).collect()
    assert len(rows) == 4
    assert sorted(r["greedy_rank"] for r in rows) == [1, 2, 3, 4]
    ordered = sorted(rows, key=lambda r: r["greedy_rank"])
    for a, b in zip(ordered, ordered[1:]):
        # name tie-break inverts: on equal drop/cost rationals the
        # smaller gate name wins the better rank, so b's name sits on
        # a's side of the tuple comparison.
        assert (
            a["drop_ppm"] * b["unit_cost"],
            b["gate"],
        ) >= (
            b["drop_ppm"] * a["unit_cost"],
            a["gate"],
        )
