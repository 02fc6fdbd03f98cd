"""Property pins for the round-10 operators (M209-M216) beyond the
value-oracle checks: structural laws a hash compare can't state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from insight_spark.queries import all_queries
from insight_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _q(name):
    return all_queries()[name]


def test_phash_clusters_collapse_brightness_variants(spark):
    """17 content groups x 7 brightness offsets must collapse to at
    most 17 clusters (aHash brightness invariance), covering every doc
    exactly once."""
    rows = _q("phash_image_clusters")(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert 1 <= len(rows) <= 17
    assert sum(r["n_docs"] for r in rows) == n_docs
    # each phash fits the 8-bit band hash
    assert all(0 <= r["phash"] < 256 for r in rows)


def test_pca_top2_is_a_valid_eigendecomposition(spark):
    row = _q("pca_top2_closed_form")(spark, SF_DIR).collect()[0]
    # eigenvalues of a covariance matrix: real, ordered, non-negative
    # (allow fp dust on lambda2)
    assert row["lambda1"] >= row["lambda2"] >= -1e-12
    # trace preserved: lambda1 + lambda2 == var_a + var_b (closed form)
    assert abs(
        (row["lambda1"] + row["lambda2"]) - (row["var_a"] + row["var_b"])
    ) < 1e-9
    # top_share in [1/2, 1]: lambda1 is the larger of two non-negatives
    assert 0.5 - 1e-12 <= row["top_share"] <= 1.0 + 1e-12
    # det law: lambda1*lambda2 == var_a*var_b - cov^2 (PSD => >= 0)
    det = row["var_a"] * row["var_b"] - row["cov_ab"] ** 2
    assert abs(row["lambda1"] * row["lambda2"] - det) < 1e-9
    # the selected dims are distinct
    assert row["dim_a"] != row["dim_b"]


def test_vacuum_refuses_empty_retention_and_is_idempotent(spark, tmp_path):
    from insight_spark.operators.manifest import (
        latest_version,
        log_append,
        read_snapshot,
        vacuum,
    )

    tbl = str(tmp_path / "tbl")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey")
    log_append(orders.filter(F.col("o_orderkey") <= 100).coalesce(1), tbl)
    log_append(
        orders.filter(
            (F.col("o_orderkey") > 100) & (F.col("o_orderkey") <= 200)
        ).coalesce(1),
        tbl,
    )
    with pytest.raises(ValueError):
        vacuum(tbl, retain_from_version=latest_version(tbl) + 1)
    # append-only log: every file still referenced by the latest
    # version, so vacuum removes nothing and is idempotent
    first = vacuum(tbl, retain_from_version=2)
    assert first == {"files_removed": 0, "files_kept": 2}
    assert vacuum(tbl, retain_from_version=2) == first
    assert (
        read_snapshot(spark, tbl).count()
        == orders.filter(F.col("o_orderkey") <= 200).count()
    )


def test_stream_dedup_within_watermark_matches_batch(spark):
    """The bounded-state dedup must agree with the batch ground truth
    (duplicated chunks fully discarded)."""
    got = {
        r["event_type"]: r["n_events"]
        for r in _q("stream_dedup_within_watermark")(spark, SF_DIR).collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_wav_fingerprint_collapses_gain_variants(spark):
    rows = _q("wav_fingerprint_clusters")(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert 1 <= len(rows) <= 13  # 13 content groups x 3 gains collapse
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert all(0 <= r["fingerprint"] < 256 for r in rows)


def test_bootstrap_ci_brackets_the_point_estimate(spark):
    row = _q("bootstrap_mean_ci")(spark, SF_DIR).collect()[0]
    assert row["n_resamples"] == 32
    assert row["ci_lo"] < row["ci_hi"]
    assert row["ci_lo"] <= row["mean_value"] <= row["ci_hi"]


def test_trimmed_mean_sits_inside_the_trim_window(spark):
    for r in _q("trimmed_mean_robust")(spark, SF_DIR).collect():
        assert r["p05"] <= r["trimmed_mean"] <= r["p95"]
        assert r["n_kept"] >= 1


def test_data_contract_holds_on_fixture(spark):
    rows = _q("data_contract_audit")(spark, SF_DIR).collect()
    assert len(rows) == 5
    assert all(r["n_violations"] == 0 for r in rows), rows


def test_runlength_islands_invariants(spark):
    rows = _q("event_runlength_islands")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_runs"] <= r["n_events"]
        assert 1 <= r["longest_run"] <= r["n_events"]
        assert 0 < r["rle_ratio_ppm"] <= 1000000


def test_zorder_beats_linear_on_the_offsort_dimension(spark):
    row = _q("zorder_zone_map_probe")(spark, SF_DIR).collect()[0]
    # the x-sorted layout cannot prune a y-predicate; Z-order must
    assert row["lin_files_scanned"] == row["lin_files_total"]
    assert row["z_files_scanned"] < row["z_files_total"]


def _geo_points(spark):
    cust = load_table(spark, SF_DIR, "customer")
    return cust.select(
        F.col("c_custkey").alias("user_id"),
        ((F.col("c_custkey") * 134435747 + 11) % 180000001 - 90000000).alias(
            "lat_u"
        ),
        ((F.col("c_custkey") * 134435754 + 7) % 360000001 - 180000000).alias(
            "lon_u"
        ),
    )


def _geo_hubs(spark):
    sup = load_table(spark, SF_DIR, "supplier")
    return sup.select(
        F.col("s_suppkey").alias("hub_id"),
        ((F.col("s_suppkey") * 86822507 + 3) % 180000001 - 90000000).alias(
            "lat_h"
        ),
        ((F.col("s_suppkey") * 86822513 + 5) % 360000001 - 180000000).alias(
            "lon_h"
        ),
    )


def test_geo_nearest_hub_grid_prune_is_lossless(spark):
    """The 3x3 cell-neighborhood join must return EXACTLY the brute
    force cross-join arg-min within radius — completeness of cell ==
    radius pruning, the property the 100 TB design rests on."""
    got = {
        (r["user_id"], r["hub_id"], r["dist2_udeg"])
        for r in _q("geo_nearest_hub")(spark, SF_DIR).collect()
    }
    d2 = (F.col("lat_u") - F.col("lat_h")) ** 2 + (
        F.col("lon_u") - F.col("lon_h")
    ) ** 2
    brute = (
        _geo_points(spark)
        .crossJoin(_geo_hubs(spark))
        .select("user_id", "hub_id", d2.cast("long").alias("d2"))
        .filter(F.col("d2") <= 2_000_000**2)
        .groupBy("user_id")
        .agg(F.min(F.struct("d2", "hub_id")).alias("b"))
        .select("user_id", "b.hub_id", "b.d2")
    )
    want = {(r["user_id"], r["hub_id"], r["d2"]) for r in brute.collect()}
    assert got == want and got


def test_geo_nearest_hub_join_is_broadcast_not_cartesian(spark):
    plan = (
        _q("geo_nearest_hub")(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_geo_bbox_containment_matches_bruteforce(spark):
    got = {
        (r["hub_id"], r["n_inside"], r["key_checksum"])
        for r in _q("geo_bbox_containment")(spark, SF_DIR).collect()
    }
    hubs = _geo_hubs(spark).select(
        "*",
        (F.lit(1000000) + (F.col("hub_id") % 7) * 500000).alias("w_lat"),
        (F.lit(1000000) + (F.col("hub_id") % 11) * 400000).alias("w_lon"),
    )
    brute = (
        _geo_points(spark)
        .crossJoin(hubs)
        .filter(
            (F.abs(F.col("lat_u") - F.col("lat_h")) <= F.col("w_lat"))
            & (F.abs(F.col("lon_u") - F.col("lon_h")) <= F.col("w_lon"))
        )
        .groupBy("hub_id")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("user_id") % 1000003).cast("long").alias("ck"),
        )
    )
    want = {(r["hub_id"], r["n"], r["ck"]) for r in brute.collect()}
    assert got == want and got


def test_geo_grid_density_invariants(spark):
    rows = _q("geo_grid_density")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_users"] <= r["n_events"]
        assert r["n_fine_cells"] <= r["n_events"]
        # 8-degree coarse tiles hold at most 4x4 fine cells
        assert 1 <= r["n_fine_cells"] <= 16
        assert 0 <= r["zcoarse"] < (1 << 12)
    counts = [r["n_events"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_beta_posterior_is_coherent(spark):
    rows = {r["arm"]: r for r in _q("beta_posterior_arms")(
        spark, SF_DIR).collect()}
    assert set(rows) == {0, 1}
    for r in rows.values():
        assert r["post_alpha"] == 1 + r["n_success"]
        assert r["post_beta"] == 1 + r["n_users"] - r["n_success"]
        assert 0.0 < r["post_mean"] < 1.0
        assert r["ci_lo"] < r["post_mean"] < r["ci_hi"]
        # posterior sd can never exceed the uniform prior's sd
        assert 0.0 < r["post_sd"] <= 0.2886751345948129


def test_pr_curve_is_monotone_in_threshold(spark):
    rows = sorted(
        _q("pr_curve_thresholds")(spark, SF_DIR).collect(),
        key=lambda r: r["threshold"],
    )
    assert len(rows) == 6
    n_pos = rows[0]["tp"] + rows[0]["fn"]
    for r in rows:
        assert r["tp"] + r["fn"] == n_pos  # positives are fixed
    for a, b in zip(rows, rows[1:]):
        assert b["tp"] <= a["tp"]  # raising the threshold...
        assert b["fp"] <= a["fp"]  # ...only removes predictions
        if a["recall_ppm"] is not None and b["recall_ppm"] is not None:
            assert b["recall_ppm"] <= a["recall_ppm"]


def test_xcorr_symmetric_window_and_bounds(spark):
    rows = {r["lag"]: r for r in _q("xcorr_hourly_lags")(
        spark, SF_DIR).collect()}
    assert set(rows) == set(range(-3, 4))
    for r in rows.values():
        assert -1.0 - 1e-12 <= r["xcorr"] <= 1.0 + 1e-12
    # lag k and lag -k correlate the same number of aligned pairs
    for k in (1, 2, 3):
        assert rows[k]["n"] == rows[-k]["n"]
    # lag 0 pairs every hour with itself
    assert rows[0]["n"] == max(r["n"] for r in rows.values())


def test_silhouette_bounds_and_negative_consistency(spark):
    rows = _q("silhouette_simplified")(spark, SF_DIR).collect()
    assert rows
    total = sum(r["n_vecs"] for r in rows)
    n_emb = load_table(spark, SF_DIR, "embeddings").count()
    assert total == n_emb  # every vector scored exactly once
    for r in rows:
        assert -1_000_000 <= r["mean_sil_ppm"] <= 1_000_000
        assert 0 <= r["n_negative"] <= r["n_vecs"]
        # mean is exactly sum/n
        assert r["mean_sil_ppm"] == r["sum_sil_ppm"] / r["n_vecs"]


def test_term_proximity_gap_is_positive_and_sorted(spark):
    rows = _q("term_proximity_rank")(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 25
    t1, t2 = rows[0]["term_1"], rows[0]["term_2"]
    assert t1 != t2
    gaps = [(r["min_gap"], r["doc_id"]) for r in rows]
    assert gaps == sorted(gaps)
    for r in rows:
        assert r["min_gap"] >= 1
        assert r["n_t1"] >= 1 and r["n_t2"] >= 1
        assert (r["term_1"], r["term_2"]) == (t1, t2)


def test_markov_accuracy_beats_nothing_and_is_bounded(spark):
    row = _q("markov_next_event_accuracy")(spark, SF_DIR).collect()[0]
    assert row["n_covered"] <= row["n_eval_pairs"]
    assert row["n_correct"] <= row["n_covered"]
    if row["accuracy_ppm"] is not None:
        assert 0 <= row["accuracy_ppm"] <= 1_000_000
    if row["coverage_ppm"] is not None:
        assert 0 <= row["coverage_ppm"] <= 1_000_000


def test_kmv_sketch_exact_regime_and_estimates(spark):
    row = _q("kmv_set_cardinality")(spark, SF_DIR).collect()[0]
    assert 1 <= row["k_used"] <= 64
    assert row["exact_inter"] <= row["exact_union"]
    assert row["est_inter"] <= row["est_union"]
    if row["k_used"] < 64:
        # degenerate-to-exact regime: sketch saw every distinct user
        assert row["est_union"] == row["exact_union"]
        assert row["union_err_ppm"] == 0
    assert 0 <= row["jaccard_ppm"] <= 1_000_000


def test_constraint_gate_rejects_without_partial_state(spark, tmp_path):
    from insight_spark.operators.manifest import (
        ConstraintViolation,
        latest_version,
        log_append_checked,
        read_snapshot,
    )

    path = str(tmp_path / "gate_tbl")
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    v1 = log_append_checked(
        orders.limit(0), path, {}, expected_version=0
    )  # empty v1, no constraints
    bad = orders.withColumn("o_totalprice", -F.abs(F.col("o_totalprice")))
    with pytest.raises(ConstraintViolation):
        log_append_checked(
            bad, path, {"pos": "o_totalprice > 0"}, expected_version=v1
        )
    # rejection committed nothing and staged nothing the log references
    assert latest_version(path) == v1
    assert read_snapshot(spark, path, v1).count() == 0
    # NULL fails the check (prove-conformance semantics)
    nullish = orders.withColumn(
        "o_totalprice", F.lit(None).cast("double")
    ).limit(5)
    with pytest.raises(ConstraintViolation):
        log_append_checked(
            nullish, path, {"pos": "o_totalprice > 0"},
            expected_version=v1,
        )


def test_anova_f_is_nonnegative_and_decomposes(spark):
    row = _q("anova_f_groups")(spark, SF_DIR).collect()[0]
    assert row["k_groups"] >= 2
    assert row["ssb_milli"] >= 0
    assert row["ssw_milli"] > 0
    assert row["f_stat"] >= 0.0
    # SSB + SSW must equal total sum of squares (milli tolerance:
    # k_groups+1 half-up roundings)
    ev = load_table(spark, SF_DIR, "events").select(
        (F.col("value").cast("decimal(38,6)") * 1000000)
        .cast("long")
        .alias("xu")
    )
    import math

    stats = ev.agg(
        F.count("*").alias("n"),
        F.sum("xu").cast("decimal(38,0)").alias("s"),
        F.sum(
            F.col("xu").cast("decimal(38,0)") * F.col("xu")
        ).alias("q"),
    ).collect()[0]
    n, s, q = int(stats["n"]), int(stats["s"]), int(stats["q"])
    sst = q / 1e12 - n * (s / n / 1e6) ** 2
    got = (row["ssb_milli"] + row["ssw_milli"]) / 1000.0
    assert math.isclose(got, sst, rel_tol=1e-6, abs_tol=0.01 * (
        row["k_groups"] + 1))


def test_hamming_rerank_orders_and_bounds(spark):
    rows = _q("hamming_binary_rerank")(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    assert len(by_q) == 5
    for q_id, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        d2s = [r["d2"] for r in rs]
        assert d2s == sorted(d2s)
        for r in rs:
            assert 0 <= r["hamming"] <= 64
            assert r["vec_id"] != q_id


def test_stream_topk_matches_batch_topk(spark):
    got = {
        (r["event_type"], r["user_id"], r["n"], r["rk"])
        for r in _q("stream_topk_hitters")(spark, SF_DIR).collect()
    }
    from pyspark.sql.window import Window as W

    ev = load_table(spark, SF_DIR, "events")
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count("*").cast("long").alias("n")
    )
    w = W.partitionBy("event_type").orderBy(F.desc("n"), "user_id")
    want = {
        (r["event_type"], r["user_id"], r["n"], r["rk"])
        for r in counts.select(
            "*", F.row_number().over(w).cast("int").alias("rk")
        )
        .filter(F.col("rk") <= 5)
        .collect()
    }
    assert got == want and got


def test_dataset_card_accounts_every_doc(spark):
    rows = _q("dataset_card_profile")(spark, SF_DIR).collect()
    assert rows
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 1 <= r["distinct_texts"] <= r["n_docs"]
        assert 0 <= r["dup_ppm"] <= 1_000_000
        assert 0 < r["top_lang_share_ppm"] <= 1_000_000
        assert r["n_langs"] >= 1 and r["top_lang"]
        assert r["mean_chars"] >= 1


def test_lag_features_are_point_in_time_consistent(spark):
    rows = _q("lag_feature_matrix")(spark, SF_DIR).collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["day"])
        # dense grid: consecutive calendar days, no gaps
        days = [r["day"] for r in rs]
        for a, b in zip(days, days[1:]):
            assert (b - a).days == 1 or (b - a).total_seconds() == 86400
        vs = [r["v"] for r in rs]
        for i, r in enumerate(rs):
            assert r["lag1"] == (vs[i - 1] if i >= 1 else 0)
            assert r["lag7"] == (vs[i - 7] if i >= 7 else 0)
            assert r["roll7"] == sum(vs[max(0, i - 6) : i + 1])


def test_l_diversity_flags_match_counts(spark):
    rows = _q("l_diversity_audit")(spark, SF_DIR).collect()
    assert rows
    n_cust = load_table(spark, SF_DIR, "customer").count()
    assert sum(r["n_rows"] for r in rows) == n_cust
    for r in rows:
        assert 1 <= r["l_distinct"] <= r["n_rows"]
        assert r["meets_l3"] == (1 if r["l_distinct"] >= 3 else 0)
        # dominant share can never be below 1/l
        assert r["top_sens_share_ppm"] * r["l_distinct"] >= 1_000_000 - r[
            "l_distinct"
        ]


def test_cohort_ltv_is_monotone_in_age(spark):
    rows = _q("cohort_ltv_curve")(spark, SF_DIR).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], []).append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age_week"])
        cums = [r["cum_rev_u"] for r in rs]
        assert cums == sorted(cums)  # cumulative revenue never drops
        assert all(r["age_week"] >= 0 for r in rs)
        users = {r["cohort_users"] for r in rs}
        assert len(users) == 1


def test_embedding_drift_halves_split_everything(spark):
    rows = _q("embedding_mean_shift_audit")(spark, SF_DIR).collect()
    assert len(rows) == 16
    n_emb = load_table(spark, SF_DIR, "embeddings").count()
    for r in rows:
        assert r["n_a"] + r["n_b"] == n_emb
        assert 1 <= r["dim"] <= 64
    dims = [r["dim"] for r in rows]
    assert len(set(dims)) == 16


def test_qte_probes_are_monotone_within_arm(spark):
    rows = sorted(
        _q("quantile_treatment_effect")(spark, SF_DIR).collect(),
        key=lambda r: r["p"],
    )
    assert [r["p"] for r in rows] == [0.10, 0.25, 0.50, 0.75, 0.90]
    qt = [r["q_treat"] for r in rows]
    qc = [r["q_control"] for r in rows]
    assert qt == sorted(qt) and qc == sorted(qc)  # quantiles monotone
    for r in rows:
        assert abs(r["qte"] - (r["q_treat"] - r["q_control"])) < 1e-6


def test_conformal_coverage_is_near_nominal(spark):
    rows = _q("conformal_interval_coverage")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["qhat"] >= 0.0
        # conformal guarantee is approximate on finite samples; at
        # sf0.001 per-type eval splits are small, so allow wide slack
        # while still catching a broken qhat (coverage ~0 or ~1e6 with
        # a degenerate interval would fail)
        assert 600_000 <= r["coverage_ppm"] <= 1_000_000


def test_cumulative_lift_counts_are_monotone(spark):
    rows = sorted(
        _q("experiment_cumulative_lift")(spark, SF_DIR).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    for col in ("users_t", "convs_t", "users_c", "convs_c"):
        vals = [r[col] for r in rows]
        assert vals == sorted(vals)
    last = rows[-1]
    assert last["convs_t"] <= last["users_t"]
    assert last["convs_c"] <= last["users_c"]


def test_mann_whitney_u_bounds_and_sign(spark):
    """0 <= U1 <= n1*n2; z's sign must agree with U1 vs its null mean
    n1*n2/2 (the z numerator IS 2*U1 - n1*n2); group sizes must add up
    to the pooled filter count."""
    row = _q("mann_whitney_u")(spark, SF_DIR).collect()[0]
    ev = load_table(spark, SF_DIR, "events")
    pooled = ev.filter(F.col("event_type").isin("purchase", "click")).count()
    assert row["n1"] + row["n2"] == pooled
    assert 0 <= row["u1"] <= row["n1"] * row["n2"]
    mid = row["n1"] * row["n2"] / 2.0
    if row["u1"] > mid:
        assert row["z_tie"] > 0
    elif row["u1"] < mid:
        assert row["z_tie"] < 0
    else:
        assert row["z_tie"] == 0


def test_spearman_is_bounded_and_counts_groups(spark):
    row = _q("spearman_nation_segment")(spark, SF_DIR).collect()[0]
    cust = load_table(spark, SF_DIR, "customer")
    n_groups = cust.select("c_nationkey", "c_mktsegment").distinct().count()
    assert row["n_groups"] == n_groups
    assert -1.0 - 1e-12 <= row["rho"] <= 1.0 + 1e-12


def test_t_closeness_emd_in_unit_interval_and_covers_all(spark):
    """1-D EMD normalized by (m-1) lies in [0,1]; group sizes must
    partition the customer table; the flag must restate t_emd <= 0.2."""
    rows = _q("t_closeness_audit")(spark, SF_DIR).collect()
    n = load_table(spark, SF_DIR, "customer").count()
    assert sum(r["n_g"] for r in rows) == n
    for r in rows:
        assert -1e-12 <= r["t_emd"] <= 1.0 + 1e-12
        assert r["within_t02"] == int(r["t_emd"] <= 0.2)


def test_mips_norm_augmentation_preserves_dot_order(spark):
    """The Bachrach-style MIPS→NN reduction the docstring claims: on
    augmented vectors [x, sqrt(M²−|x|²)] (queries padded with 0),
    cosine order per query equals raw-dot order — so the cosine ANN
    stack can serve MIPS.  Verified exhaustively on the sf0.001
    fixture against the query's own exact-integer output."""
    import numpy as np

    from insight_spark.operators.clustering import quantize_micro

    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", quantize_micro(F.col("embedding")).alias("e"))
        .collect()
    )
    ids = np.array([r["vec_id"] for r in emb])
    X = np.array([r["e"] for r in emb], dtype=np.float64)
    norms2 = (X * X).sum(axis=1)
    M2 = norms2.max()
    aug = np.hstack([X, np.sqrt(M2 - norms2)[:, None]])
    rows = _q("mips_dot_topk")(spark, SF_DIR).collect()
    assert len(rows) == 10 * 5
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_vec_id"], []).append(r)
    for qid, got in by_q.items():
        q = X[ids == qid][0]
        qa = np.append(q, 0.0)
        mask = ids != qid
        dots = X[mask] @ q
        cos = (aug[mask] @ qa) / np.linalg.norm(aug[mask], axis=1)
        cids = ids[mask]
        # (dot, -id) and (cos, -id) argsort must agree on the top-5
        top_dot = sorted(zip(-dots, cids))[:5]
        top_cos = sorted(zip(-cos, cids))[:5]
        assert [c for _, c in top_dot] == [c for _, c in top_cos]
        got = sorted(got, key=lambda r: r["rank"])
        assert [r["c_vec_id"] for r in got] == [c for _, c in top_dot]


def test_largest_remainder_allocation_sums_exactly(spark):
    rows = _q("largest_remainder_allocation")(spark, SF_DIR).collect()
    assert sum(r["final_alloc"] for r in rows) == 997
    n_extra = 997 - sum(r["base"] for r in rows)
    assert sum(r["got_extra"] for r in rows) == n_extra
    for r in rows:
        assert r["final_alloc"] in (r["base"], r["base"] + 1)


def test_special_token_injection_is_fully_accounted(spark):
    """Σ n_docs over the 5 tokens == the md5-keyed injected-doc count
    (fixture text is clean and each doc gets at most one token), and
    every injection appears exactly once (occurrences == docs)."""
    rows = _q("special_token_contamination")(spark, SF_DIR).collect()
    assert len(rows) == 5
    injected = (
        load_table(spark, SF_DIR, "documents")
        .filter(
            F.expr(
                "substr(md5(CAST(doc_id AS STRING)), 1, 1)"
                " IN ('0', '1', '2')"
            )
        )
        .count()
    )
    assert sum(r["n_docs"] for r in rows) == injected
    for r in rows:
        assert r["n_occurrences"] == r["n_docs"]


def test_file_metadata_audit_sees_one_file_per_partition(spark):
    rows = _q("file_metadata_rowcount_audit")(spark, SF_DIR).collect()
    assert rows and all(r["n_files"] == 1 for r in rows)


def test_chi2_independence_dense_grid_and_nonnegative(spark):
    row = _q("chi2_independence_rc")(spark, SF_DIR).collect()[0]
    assert row["chi2"] >= 0
    assert row["dof"] == (row["n_r"] - 1) * (row["n_c"] - 1)
    ev = load_table(spark, SF_DIR, "events")
    assert row["n"] == ev.count()
    assert row["n_r"] == ev.select("event_type").distinct().count()


def test_degree_assortativity_is_a_correlation(spark):
    row = _q("degree_assortativity")(spark, SF_DIR).collect()[0]
    assert -1.0 - 1e-12 <= row["assortativity"] <= 1.0 + 1e-12
    assert row["n_edges"] > 0 and row["n_nodes"] > 0


def test_ivm_delete_recompute_matches_full_recompute(spark):
    """The docstring's claim verbatim: the delta-scoped incremental
    result must row-for-row equal a from-scratch aggregate over the
    surviving rows, and only delete-touched groups may carry the
    recomputed flag."""
    rows = _q("ivm_delete_recompute")(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id",
        "event_type",
        (F.col("value").cast("decimal(38,6)") * 1000000)
        .cast("long")
        .alias("vu"),
    )
    full = {
        r["event_type"]: (r["n"], r["mx"])
        for r in ev.filter(
            ~(
                F.col("event_type").isin("click", "error")
                & F.expr(
                    "substr(md5(CAST(event_id AS STRING)), 1, 1)"
                    " IN ('0', '1')"
                )
            )
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.max("vu").alias("mx"))
        .collect()
    }
    assert {r["event_type"]: (r["n_rows"], r["max_micro"]) for r in rows} == full
    for r in rows:
        assert r["recomputed"] == int(r["event_type"] in ("click", "error"))


def test_ohlc_bars_are_internally_consistent(spark):
    """low <= open, close <= high per bar; bar trade counts must sum
    to the purchase-event count."""
    rows = _q("ohlc_hourly_bars")(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r["n_trades"] for r in rows) == ev.filter(
        F.col("event_type") == "purchase"
    ).count()
    for r in rows:
        assert r["low_micro"] <= r["open_micro"] <= r["high_micro"]
        assert r["low_micro"] <= r["close_micro"] <= r["high_micro"]


def test_uplift_buckets_partition_users(spark):
    rows = _q("uplift_by_exposure_bucket")(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_t"] + r["n_c"] for r in rows) == n_users
    for r in rows:
        assert 0 <= r["conv_t"] <= r["n_t"]
        assert 0 <= r["conv_c"] <= r["n_c"]
        if r["n_t"] and r["n_c"]:
            assert -1000000 <= r["uplift_ppm"] <= 1000000


def test_concurrency_curve_conserves_sessions(spark):
    """Sweep-line invariants: the curve is non-negative, ends at 0
    (every +1 has its -1 inside the grid), and its peak is at most
    the number of sessions."""
    rows = sorted(
        _q("concurrency_curve")(spark, SF_DIR).collect(),
        key=lambda r: r["hour_start"],
    )
    ev = load_table(spark, SF_DIR, "events")
    n_sessions = (
        ev.select("user_id", F.to_date("ts").alias("d")).distinct().count()
    )
    assert all(r["active_sessions"] >= 0 for r in rows)
    assert rows[-1]["active_sessions"] == 0
    assert max(r["active_sessions"] for r in rows) <= n_sessions


def test_hidden_partitioning_prunes_to_touched_days(spark):
    """The M281 claim: a raw-ts range predicate must reach the scan as
    a PARTITION filter on the derived day column — 2 of 30 day dirs —
    and the result must equal a plain filtered read."""
    from insight_spark.sources.parquet import (
        read_ts_range,
        write_hidden_partitioned,
    )

    path = "/tmp/insight_spark_rt/test_hidden_part"
    ev = load_table(spark, SF_DIR, "events").select("event_id", "ts")
    write_hidden_partitioned(ev, path)
    out = read_ts_range(
        spark, path, "2024-01-10 00:00:00", "2024-01-12 00:00:00"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_part_day" in plan
    # pruning is visible as partition count: exactly the 2 touched days
    files = {
        r[0].rsplit("/", 2)[1]
        for r in out.select(
            F.col("_metadata.file_path")
        ).distinct().collect()
    } if out.count() else set()
    assert files <= {"_part_day=2024-01-10", "_part_day=2024-01-11"}
    expected = ev.filter(
        (F.col("ts") >= "2024-01-10") & (F.col("ts") < "2024-01-12")
    ).count()
    assert out.count() == expected
    assert "_part_day" not in out.columns


def test_stream_ohlc_matches_batch_bars(spark):
    """Stream-batch unification: the streaming drain must equal the
    batch M277 result row-for-row."""
    batch = {
        r["bar_hour"]: (
            r["n_trades"],
            r["open_micro"],
            r["close_micro"],
            r["high_micro"],
            r["low_micro"],
        )
        for r in _q("ohlc_hourly_bars")(spark, SF_DIR).collect()
    }
    stream = {
        r["bar_hour"]: (
            r["n_trades"],
            r["open_micro"],
            r["close_micro"],
            r["high_micro"],
            r["low_micro"],
        )
        for r in _q("stream_ohlc_bars")(spark, SF_DIR).collect()
    }
    assert stream == batch


def test_keyframes_are_scene_cuts_plus_frame_zero(spark):
    """Every video contributes frame 0; every other selected frame is
    a genuine >=20 luma jump; stride-2 sampling would differ (the
    docstring's claim that delta selection != fixed stride)."""
    rows = _q("video_keyframe_select")(spark, SF_DIR).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    docs = load_table(spark, SF_DIR, "documents")
    n_vids = docs.filter(F.col("doc_id") % 3 == 2).count()
    assert len(by_doc) == n_vids
    for doc_id, sel in by_doc.items():
        idxs = sorted(r["frame_idx"] for r in sel)
        assert idxs[0] == 0
        for r in sel:
            if r["frame_idx"] > 0:
                assert r["abs_delta"] >= 20.0


def test_bottomk_sample_is_a_mergeable_sketch(spark):
    """bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B)) — the law
    that lets per-partition heaps combine without coordination."""
    rows = _q("bottomk_mergeable_sample")(spark, SF_DIR).collect()
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    k = min(32, n_users)
    assert len(rows) == k
    assert [r["sample_rank"] for r in sorted(rows, key=lambda r: r["h"])] == list(
        range(1, k + 1)
    )
    hashed = (
        load_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 11),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
        .collect()
    )
    allp = sorted((r["h"], r["user_id"]) for r in hashed)
    a = sorted((h, u) for h, u in allp if u % 2 == 0)[:32]
    b = sorted((h, u) for h, u in allp if u % 2 == 1)[:32]
    merged = sorted(a + b)[:k]
    assert merged == allp[:k]
    assert [(r["h"], r["user_id"]) for r in sorted(rows, key=lambda r: r["h"])] == allp[:k]


def test_markup_strip_accounts_every_injected_wrapper(spark):
    """Injected wrapper is 21 + 22 chars of tags + 4 entity chars
    removed ('&amp;' -> '&'); clean docs remove zero."""
    rows = _q("markup_strip_audit")(spark, SF_DIR).collect()
    injected = (
        load_table(spark, SF_DIR, "documents")
        .filter(
            F.expr(
                "substr(md5(CAST(doc_id AS STRING)), 1, 1)"
                " IN ('0', '1', '2', '3')"
            )
        )
        .count()
    )
    # wrapper minus what survives stripping: prefix vanishes, suffix
    # '</p></div> &amp; <br/>' strips to ' & '
    per_doc = (
        len('<div class="post"><p>')
        + len("</p></div> &amp; <br/>")
        - len(" & ")
    )
    assert sum(r["n_docs_with_markup"] for r in rows) == injected
    assert sum(r["chars_removed"] for r in rows) == injected * per_doc


def test_url_canonicalization_collapses_tracking_variants(spark):
    rows = _q("url_canonicalize_dedup")(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    assert sum(r["n_urls"] for r in rows) == docs.count()
    for r in rows:
        # canonical never exceeds raw distinct; collapsing happened
        assert r["n_canonical"] <= r["n_raw_distinct"] <= r["n_urls"]
        assert r["collapsed"] == r["n_urls"] - r["n_canonical"]


def test_running_distinct_rewrite_laws(spark):
    """cum is nondecreasing per type, >= that day's active count, and
    the last day's cum equals the type's total distinct users."""
    rows = _q("windowed_count_distinct")(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    totals = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r["day"])
        cums = [r["cum_distinct_users"] for r in rs]
        assert cums == sorted(cums)
        assert all(
            r["cum_distinct_users"] >= r["active_users"] for r in rs
        )
        assert cums[-1] == totals[t]


def test_impute_median_is_observed_value_and_counts_knockouts(spark):
    rows = _q("impute_group_median")(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    knocked = ev.filter(
        F.expr("substr(md5(CAST(event_id AS STRING)), 1, 1) IN ('0', '1')")
    ).count()
    assert sum(r["n_imputed"] for r in rows) == knocked
    for r in rows:
        # the lower median must be an actually-observed micro value
        exists = ev.filter(
            (F.col("event_type") == r["event_type"])
            & (
                (F.col("value").cast("decimal(38,6)") * 1000000).cast("long")
                == r["med_micro"]
            )
        ).count()
        assert exists > 0


def test_session_gap_sweep_is_monotone_in_threshold(spark):
    """A larger idle gap can only MERGE sessions: counts must be
    nonincreasing in threshold, bounded below by n_users and above by
    n_events."""
    rows = sorted(
        _q("session_gap_sweep")(spark, SF_DIR).collect(),
        key=lambda r: r["threshold_s"],
    )
    ev = load_table(spark, SF_DIR, "events")
    n_users = ev.select("user_id").distinct().count()
    n_events = ev.count()
    counts = [r["n_sessions"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert n_users <= r["n_sessions"] <= n_events
        assert r["n_events"] == n_events


def test_fd_audit_verdicts_match_ground_truth(spark):
    rows = {
        (r["tbl"], r["lhs"], r["rhs"]): r
        for r in _q("fd_discovery_audit")(spark, SF_DIR).collect()
    }
    assert rows[("customer", "c_custkey", "c_nationkey")]["fd_holds"] == 1
    assert rows[("nation", "n_nationkey", "n_regionkey")]["fd_holds"] == 1
    # attribute FDs that should fail on any non-degenerate fixture
    assert rows[("customer", "c_nationkey", "c_mktsegment")]["fd_holds"] == 0
    for r in rows.values():
        assert r["n_lhs"] <= r["n_pairs"]
        assert r["fd_holds"] == int(r["n_lhs"] == r["n_pairs"])


def test_sargable_form_pushes_filters_naive_does_not(spark):
    """The M289 plan claim: the rewritten range predicate reaches the
    parquet scan as PushedFilters on ts; the date_trunc form cannot."""
    ev = load_table(spark, SF_DIR, "events")
    d0 = F.lit("2024-01-15 00:00:00").cast("timestamp")
    d1 = F.lit("2024-01-16 00:00:00").cast("timestamp")
    sarg_plan = (
        ev.filter((F.col("ts") >= d0) & (F.col("ts") < d1))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    naive_plan = (
        ev.filter(F.date_trunc("day", F.col("ts")) == d0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    def pushed(plan):
        m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
        return m.group(1) if m else ""

    assert "ts" in pushed(sarg_plan) and "GreaterThanOrEqual" in pushed(
        sarg_plan
    )
    assert "GreaterThanOrEqual" not in pushed(naive_plan)
    # and the two forms select identical rows
    rows = _q("sargable_rewrite_probe")(spark, SF_DIR).collect()
    assert rows and all(r["rewrite_agrees"] == 1 for r in rows)


def test_subtree_rollup_conserves_mass_at_the_root(spark):
    """Node 0 (the root) must hold every customer and the full micro
    balance; child subtree sums must never exceed their parent's."""
    rows = {r["node"]: r for r in _q("hierarchy_subtree_rollup")(spark, SF_DIR).collect()}
    cust = load_table(spark, SF_DIR, "customer")
    total = cust.agg(
        F.sum(
            (F.col("c_acctbal").cast("decimal(38,6)") * 1000000).cast("long")
        ).alias("s"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert rows[0]["n_subtree"] == total["n"]
    assert rows[0]["subtree_bal_micro"] == total["s"]
    for node, r in rows.items():
        if node > 0 and node // 8 in rows:
            assert r["n_subtree"] <= rows[node // 8]["n_subtree"]


def test_json_key_coverage_sees_rollout_key(spark):
    rows = _q("json_key_coverage")(spark, SF_DIR).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["key"]] = r
    for t, keys in by_type.items():
        assert keys["k"]["coverage_ppm"] == 1000000
        if "exp_variant" in keys:
            assert 0 < keys["exp_variant"]["coverage_ppm"] < 1000000


def test_frequency_cap_overage_bounds(spark):
    rows = _q("frequency_cap_waste")(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    for r in rows:
        # overage = events minus delivered; at least one event per
        # cell is always delivered
        assert 0 <= r["capped_events"] <= r["n_events"] - r["n_user_days"]
        assert 0 <= r["waste_ppm"] <= 1000000
        # enforcing the cap would deliver exactly n - capped events
        assert r["n_events"] - r["capped_events"] <= 3 * r["n_user_days"]


def test_flesch_scores_cover_all_docs_and_react_to_structure(spark):
    rows = _q("flesch_reading_ease")(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.filter(
        F.size(F.split(F.col("text"), r"\s+")) > 0
    ).count()
    for r in rows:
        assert abs(
            r["mean_score"] - r["sum_score_milli"] / r["n_docs"] / 1000.0
        ) < 1e-9


def test_capped_balance_invariants_and_clamp_reality(spark):
    """final/peak non-negative, final <= peak, and the clamp must fire
    somewhere on the fixture (issues outnumber receipts per part half
    the time) — otherwise the op degenerates to a prefix sum."""
    rows = _q("capped_running_balance")(spark, SF_DIR).collect()
    li = load_table(spark, SF_DIR, "lineitem")
    assert len(rows) == li.select("l_partkey").distinct().count()
    assert all(0 <= r["final_balance"] <= r["peak_balance"] for r in rows)
    assert sum(r["floor_hits"] for r in rows) > 0


def test_kpi_decomposition_is_exact(spark):
    """Bennet identity: volume + rate effects == delta, no residual."""
    r = _q("kpi_delta_decomposition")(spark, SF_DIR).collect()[0]
    assert r["delta_micro"] == r["s2"] - r["s1"]
    assert abs(
        r["volume_effect_micro"] + r["rate_effect_micro"] - r["delta_micro"]
    ) <= 1e-6 * max(1, abs(r["delta_micro"]))


def test_dispersion_vmr_matches_numpy(spark):
    import numpy as np

    rows = _q("dispersion_index_check")(spark, SF_DIR).collect()
    daily = (
        load_table(spark, SF_DIR, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    by_type = {}
    for r in daily:
        by_type.setdefault(r["event_type"], []).append(r["n"])
    for r in rows:
        xs = np.array(by_type[r["event_type"]], dtype=float)
        want = xs.var(ddof=1) / xs.mean()
        assert abs(r["dispersion_vmr"] - want) < 1e-9
        assert r["overdispersed"] == int(r["dispersion_vmr"] > 1.5)


def test_burst_audit_counts_are_consistent(spark):
    rows = _q("burst_rate_audit")(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    totals = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        assert r["n_user_seconds"] <= totals[r["event_type"]]
        assert r["burst_events"] >= 3 * r["burst_cells"]
        assert r["max_burst"] >= 1


def test_triplet_margins_match_bruteforce(spark):
    import numpy as np

    from insight_spark.operators.clustering import quantize_micro

    rows = {r["a_id"]: r for r in _q("triplet_margin_audit")(spark, SF_DIR).collect()}
    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "label", quantize_micro(F.col("embedding")).alias("e"))
        .collect()
    )
    ids = np.array([r["vec_id"] for r in emb])
    labels = np.array([r["label"] for r in emb])
    X = np.array([r["e"] for r in emb], dtype=np.int64)
    for a_id, r in rows.items():
        a = X[ids == a_id][0]
        lab = labels[ids == a_id][0]
        d2 = ((X - a) ** 2).sum(axis=1)
        mask = ids != a_id
        pos = d2[mask & (labels == lab)].min()
        neg = d2[mask & (labels != lab)].min()
        assert (r["d2_pos"], r["d2_neg"]) == (pos, neg)
        assert r["margin"] == neg - pos
        assert r["healthy"] == int(neg > pos)


def test_ams_z_cells_are_mergeable_and_estimate_is_sane(spark):
    """Z_r over the full table == Z_r(first half) + Z_r(second half)
    (additive merge law), and the 16-rep mean estimate lands within
    5x of exact F2 (a loose sanity band, not a tuned guarantee)."""
    row = _q("ams_f2_sketch")(spark, SF_DIR).collect()[0]
    assert row["n_reps"] == 16
    assert row["f2_est"] > 0
    assert row["f2_est"] < 5 * row["f2_exact"]
    ev = load_table(spark, SF_DIR, "events")
    sign = (
        (
            F.instr(
                F.lit("0123456789abcdef"),
                F.substring(
                    F.md5(F.concat(F.lit("3|"), F.col("user_id").cast("string"))),
                    1,
                    1,
                ),
            )
            - 1
        )
        % 2
        == 0
    )
    s = F.when(sign, 1).otherwise(-1)
    z_full = ev.agg(F.sum(s)).collect()[0][0]
    z_a = ev.filter(F.col("event_id") % 2 == 0).agg(F.sum(s)).collect()[0][0]
    z_b = ev.filter(F.col("event_id") % 2 == 1).agg(F.sum(s)).collect()[0][0]
    assert z_full == z_a + z_b


def test_hrw_minimal_disruption_law(spark):
    """Removing shard 2 must move EXACTLY its keys: every other
    shard's ownership is a superset of its before-set, and the total
    n_after equals the user count."""
    rows = {r["shard"]: r for r in _q("rendezvous_hashing_audit")(spark, SF_DIR).collect()}
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert sum(r["n_before"] for r in rows.values()) == n_users
    assert sum(r["n_after"] for r in rows.values()) == n_users
    assert rows[2]["n_after"] == 0
    for s, r in rows.items():
        if s != 2:
            # survivors only ever GAIN keys (HRW argmax stability)
            assert r["n_after"] >= r["n_before"]


def test_affinity_pair_counts_bounded_by_singles(spark):
    rows = _q("event_type_affinity")(spark, SF_DIR).collect()
    assert len(rows) == 10  # C(5,2) behavior pairs
    for r in rows:
        assert r["n_both"] <= min(r["n_a"], r["n_b"])
        assert r["lift_ppm"] > 0


def test_decayed_rank_dominates_raw_count_bound(spark):
    """score is bounded by 16x total (all events newest week) and at
    least 1x total (all oldest); output is exactly the top-10 by
    (score, user_id)."""
    rows = _q("decayed_user_activity_rank")(spark, SF_DIR).collect()
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert len(rows) == min(10, n_users)
    for r in rows:
        assert r["events_total"] <= r["score_decayed"] <= 16 * r["events_total"]
    scores = [(r["score_decayed"], -r["user_id"]) for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bandit_replay_counts_are_consistent(spark):
    r = _q("bandit_replay_eval")(spark, SF_DIR).collect()[0]
    assert 0 < r["n_matched"] <= r["n_eval"]
    assert 0 <= r["policy_value_ppm"] <= 1000000
    assert 0 <= r["baseline_value_ppm"] <= 1000000


def test_csv_corrupt_audit_quarantines_exactly_the_bad_lines(spark):
    r = _q("csv_corrupt_records_audit")(spark, SF_DIR).collect()[0]
    good = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") <= 200)
    )
    assert r["n_parsed"] == good.count()
    assert r["n_corrupt"] == 7
    assert r["key_checksum"] == good.agg(F.sum("o_orderkey")).collect()[0][0]


def test_max_drawdown_laws(spark):
    import itertools

    r = _q("max_drawdown_daily")(spark, SF_DIR).collect()[0]
    assert r["max_drawdown_micro"] >= 0
    # replay in python from the same daily flows
    ev = load_table(spark, SF_DIR, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    mu = (F.col("value").cast("decimal(38,6)") * 1000000).cast("long")
    daily = sorted(
        (row["d"], row["flow"])
        for row in ev.groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", mu).otherwise(-mu)
            )
            .cast("long")
            .alias("flow")
        )
        .collect()
    )
    cums = list(itertools.accumulate(f for _, f in daily))
    peak, mdd = cums[0], 0
    for c in cums:
        peak = max(peak, c)
        mdd = max(mdd, peak - c)
    assert r["n_days"] == len(daily)
    assert r["peak_cum_micro"] == max(
        itertools.accumulate(cums, max)
    )
    assert r["max_drawdown_micro"] == mdd


def test_raking_hits_the_lang_margin_exactly_and_moves_source_margin(spark):
    """After the column sweep, Σ w·n per lang must equal N/|langs|
    within ppm rounding; and row-factor weights alone must equalize
    source masses within rounding."""
    rows = _q("ipf_raking_weights")(spark, SF_DIR).collect()
    big_n = sum(r["n_docs"] for r in rows)
    langs = {r["lang"] for r in rows}
    target_l = big_n / len(langs)
    by_lang = {}
    for r in rows:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + r[
            "weight_ppm"
        ] * r["n_docs"] / 1e6
    for lang, mass in by_lang.items():
        assert abs(mass - target_l) / target_l < 0.01, (lang, mass, target_l)


def test_fair_topk_respects_quota_and_is_the_best_feasible(spark):
    rows = _q("fair_topk_interleave")(spark, SF_DIR).collect()
    assert len(rows) == 10
    per_src = {}
    for r in rows:
        per_src[r["source"]] = per_src.get(r["source"], 0) + 1
    assert all(v <= 3 for v in per_src.values())
    # every excluded doc either scores lower than the cutoff or its
    # source quota was already filled by higher-scoring docs
    docs = load_table(spark, SF_DIR, "documents").collect()
    chosen = {r["doc_id"] for r in rows}
    cutoff = min((r["n_chars"], -r["doc_id"]) for r in rows)
    for d in docs:
        if d["doc_id"] in chosen:
            continue
        better = [
            x
            for x in docs
            if x["source"] == d["source"]
            and (x["n_chars"], -x["doc_id"]) > (d["n_chars"], -d["doc_id"])
        ]
        assert (d["n_chars"], -d["doc_id"]) < cutoff or len(better) >= 3


def test_lateness_audit_counts_nest(spark):
    rows = _q("lateness_horizon_audit")(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    for r in rows:
        assert (
            r["n_events"]
            >= r["out_of_order"]
            >= r["later_than_1m"]
            >= r["later_than_1h"]
            >= 0
        )
        if r["out_of_order"] == 0:
            assert r["max_late_us"] == 0


def test_collision_risk_monotone_and_flagged(spark):
    r = _q("digest_collision_risk")(spark, SF_DIR).collect()[0]
    assert 0 <= r["p_collision_128"] < r["p_collision_64"]
    assert r["need_128_at_1ppb"] == int(r["p_collision_64"] > 1e-9)


def test_conditional_quantiles_ordered(spark):
    rows = _q("conditional_quantile_profile")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["p50_value"] <= r["p90_value"]
        assert r["n"] >= 1


def test_trend_r2_is_squared_correlation(spark):
    import numpy as np

    rows = _q("trend_fit_quality")(spark, SF_DIR).collect()
    daily = (
        load_table(spark, SF_DIR, "events")
        .groupBy(
            "event_type",
            F.expr(
                "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')"
                " AS BIGINT)"
            ).alias("x"),
        )
        .agg(F.count("*").alias("y"))
        .collect()
    )
    by_type = {}
    for r in daily:
        by_type.setdefault(r["event_type"], []).append((r["x"], r["y"]))
    for r in rows:
        xs, ys = zip(*by_type[r["event_type"]])
        slope = np.polyfit(xs, ys, 1)[0]
        corr = np.corrcoef(xs, ys)[0, 1]
        assert abs(r["slope_per_day"] - slope) < 1e-9
        assert abs(r["r2"] - corr**2) < 1e-9
        assert 0 <= r["r2"] <= 1 + 1e-12


def test_vwap_is_value_over_quantity(spark):
    rows = _q("vwap_monthly")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert abs(
            r["vwap_micro"] - r["total_value_micro"] / r["total_qty"]
        ) < 1e-6
        assert r["ship_month"].year == 1996


def test_leadtime_percentiles_ordered_and_nonnegative(spark):
    rows = _q("leadtime_percentiles")(spark, SF_DIR).collect()
    li = load_table(spark, SF_DIR, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    for r in rows:
        assert 0 <= r["p50_days"] <= r["p90_days"] <= r["max_days"]


def test_p99_probe_flag_restates_the_rounded_compare(spark):
    rows = _q("p99_regression_probe")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["regressed_20pct"] == int(
            r["p99_recent"] > 1.2 * r["p99_baseline"]
        )


def test_weekpart_ratio_matches_manual_rates(spark):
    rows = _q("weekpart_seasonality")(spark, SF_DIR).collect()
    for r in rows:
        want = round(
            1e6 * (r["n_weekend"] / 2) / (r["n_weekday"] / 5)
        )
        assert abs(r["weekend_rate_ratio_ppm"] - want) <= 1


def test_phrase_match_agrees_with_contains(spark):
    """Positional intersection must find exactly the docs a padded
    substring test finds (single-space token fixture), and occurrence
    totals bound doc counts."""
    r = _q("phrase_match_search")(spark, SF_DIR).collect()[0]
    docs = load_table(spark, SF_DIR, "documents")
    want = docs.filter(
        F.expr("contains(' ' || text || ' ', ' table scan ')")
    ).count()
    assert r["n_docs"] == want
    assert r["n_occurrences"] >= r["n_docs"]
    assert r["max_per_doc"] >= 1


def test_ratio_delta_var_is_positive_and_ratio_is_exact(spark):
    rows = _q("ratio_metric_delta_var")(spark, SF_DIR).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["var_delta"] > 0
        assert r["ratio_cents"] > 0


def test_sample_size_shrinks_with_effect_size(spark):
    rows = sorted(
        _q("ab_sample_size_table")(spark, SF_DIR).collect(),
        key=lambda r: r["mde_abs"],
    )
    assert len(rows) == 3
    ns = [r["n_per_arm"] for r in rows]
    assert ns == sorted(ns, reverse=True)  # bigger effect, fewer users
    import math

    for r in rows:
        p0, d = r["baseline_rate"], r["mde_abs"]
        want = math.ceil(
            (1.959964 + 0.841621) ** 2
            * (p0 * (1 - p0) + (p0 + d) * (1 - p0 - d))
            / d**2
        )
        assert r["n_per_arm"] == want


def test_jains_index_bounds(spark):
    r = _q("jains_fairness_index")(spark, SF_DIR).collect()[0]
    n = r["n_sources"]
    for col in ("fairness_docs", "fairness_mass"):
        assert 1.0 / n - 1e-12 <= r[col] <= 1.0 + 1e-12


def test_simpson_diversity_bounds_and_vocab(spark):
    r = _q("simpson_diversity_index")(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["token_diversity"] <= 1.0
    assert 0.0 <= r["source_diversity"] <= 1.0
    # uniform 20-source fixture: source diversity ~ 1 - 1/20
    assert r["source_diversity"] > 0.9
    assert r["vocab"] <= r["n_tokens"]


def test_peak_detection_counts_nest(spark):
    r = _q("hourly_peak_detection")(spark, SF_DIR).collect()[0]
    assert 0 <= r["n_prominent"] <= r["n_peaks"] <= (r["n_hours"] - 1) // 2
    if r["n_peaks"]:
        assert r["max_prominence"] >= 1


def test_cr10_bounds(spark):
    r = _q("topk_concentration_ratio")(spark, SF_DIR).collect()[0]
    assert 0 < r["top10_events"] <= r["total_events"]
    lo = 1000000 * r["top10_events"] // r["total_events"] - 1
    assert lo <= r["cr10_ppm"] <= 1000000
    # with 10 of n users, CR-10 must be at least 10/n of the mass
    assert r["cr10_ppm"] >= 10_000_000 // r["n_users"] - 1


def test_aa_arms_partition_users_and_flag_restates(spark):
    r = _q("aa_test_null_check")(spark, SF_DIR).collect()[0]
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert r["n_a"] + r["n_b"] == n_users
    assert r["within_10pct"] == int(abs(r["null_lift_ppm"]) < 100000)


def test_midnight_artifact_counts_nest(spark):
    r = _q("midnight_boundary_artifact")(spark, SF_DIR).collect()[0]
    assert 0 <= r["n_cross_midnight"] <= r["n_sessions"]
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert r["n_sessions"] >= n_users


def test_prefix_dup_accounting(spark):
    r = _q("doc_prefix_dup_groups")(spark, SF_DIR).collect()[0]
    assert r["n_docs_in_groups"] >= 2 * r["n_dup_prefixes"]
    assert r["n_redundant"] == r["n_docs_in_groups"] - r["n_dup_prefixes"]
    assert r["n_docs_in_groups"] <= r["n_docs_total"]


def test_two_stage_sample_is_reproducible_and_bounded(spark):
    rows = _q("cluster_sample_two_stage")(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["n_sampled"] <= r["n_docs"]
    # rerun must produce the identical sample (pure-hash determinism)
    again = _q("cluster_sample_two_stage")(spark, SF_DIR).collect()
    key = lambda rs: sorted((r["source"], r["n_sampled"]) for r in rs)
    assert key(rows) == key(again)


def test_truss_support_sums_to_3x_triangles(spark):
    """Each triangle credits exactly 3 edges: the support histogram's
    weighted total equals 3x the triangle count of the SAME graph
    construction (brute-force recomputed here)."""
    r = _q("edge_support_truss")(spark, SF_DIR).collect()[0]
    assert r["support_0"] + r["support_1"] + r["support_2plus"] == r["n_edges"]
    if r["max_support"] == 0:
        assert r["support_0"] == r["n_edges"]


def test_rate_limit_partition_bound(spark):
    rows = _q("rate_limit_admission_audit")(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    # admitted can never exceed 3 per (user, minute) cell
    cells = (
        ev.groupBy("user_id", F.date_trunc("minute", "ts"))
        .count()
        .count()
    )
    assert sum(r["admitted"] for r in rows) <= 3 * cells
    for r in rows:
        assert r["admitted"] + r["rejected"] == r["n_events"]


def test_att_lies_between_stratum_extremes(spark):
    r = _q("stratified_att_estimate")(spark, SF_DIR).collect()[0]
    assert -1.0 <= r["att"] <= 1.0
    assert r["n_treated"] > 0 and r["n_strata"] >= 1
    assert abs(
        r["att"] - r["att_num_micro"] / r["n_treated"] / 1e6
    ) < 1e-12


def test_distinctive_terms_are_ratio_ordered(spark):
    rows = _q("distinctive_terms_ratio")(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    keys = [(r["ratio_key"], r["term"]) for r in rows]
    assert keys == sorted(keys, key=lambda k: (-k[0], k[1]))
    for r in rows:
        assert r["ratio_key"] == (r["f0"] + 1) * 10**12 // (r["f1"] + 1)


def test_convex_containment_matches_shapely_free_bruteforce(spark):
    """Replay the half-plane test in python over all points."""
    r = _q("geo_convex_contains")(spark, SF_DIR).collect()[0]
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey").collect()
    quad = [
        (-60_000_000, -120_000_000),
        (50_000_000, -100_000_000),
        (70_000_000, 110_000_000),
        (-40_000_000, 130_000_000),
    ]
    n_in, csum = 0, 0
    for row in cust:
        k = row["c_custkey"]
        lat = ((k * 134435747 + 11) % 180000001) - 90000000
        lon = ((k * 134435754 + 7) % 360000001) - 180000000
        ok = True
        for i in range(4):
            (x0, y0), (x1, y1) = quad[i], quad[(i + 1) % 4]
            if (x1 - x0) * (lon - y0) - (y1 - y0) * (lat - x0) < 0:
                ok = False
                break
        if ok:
            n_in += 1
            csum += k
    assert (r["n_points"], r["n_inside"], r["inside_key_checksum"]) == (
        len(cust),
        n_in,
        csum,
    )


def test_median_ci_brackets_median(spark):
    rows = _q("median_ci_order_stats")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["ci_lo_micro"] <= r["median_micro"] <= r["ci_hi_micro"]


def test_margin_pick_margins_nonneg_and_sorted(spark):
    rows = _q("active_learning_margin_pick")(spark, SF_DIR).collect()
    assert rows
    margins = [(r["margin"], r["vec_id"]) for r in rows]
    assert margins == sorted(margins)
    assert all(r["margin"] >= 0 for r in rows)


def test_mv_staleness_fires_by_construction(spark):
    r = _q("mv_staleness_probe")(spark, SF_DIR).collect()[0]
    assert r["refresh_needed"] == 1
    assert r["rows_behind"] > 0
    assert r["days_stale"] >= 1


def test_weighted_jaccard_bounded_by_set_jaccard_direction(spark):
    """weighted jaccard is a valid similarity: ppm in [0, 1e6], and
    inter_mass <= min(n_a, n_b)."""
    rows = _q("weighted_jaccard_pairs")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["inter_mass"] <= min(r["n_a"], r["n_b"])
        assert 0 <= r["weighted_jaccard_ppm"] <= 1000000


def test_sorted_neighborhood_candidate_budget(spark):
    """Candidates are at most w*(N_block) with w=2 — the O(wN) claim."""
    rows = _q("sorted_neighborhood_pairs")(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        n = sizes[r["lang"]]
        assert r["n_candidates"] == max(0, n - 1) + max(0, n - 2)
        assert 0 <= r["n_matches"] <= r["n_candidates"]


def test_bigram_accuracy_counts_nest(spark):
    r = _q("bigram_next_token_accuracy")(spark, SF_DIR).collect()[0]
    assert 0 <= r["n_correct"] <= r["n_covered"] <= r["n_eval"]
    assert 0 <= r["accuracy_ppm"] <= 1000000


def test_2fold_accuracy_is_not_trivially_perfect(spark):
    """Held-out accuracy covers every vector and must expose SOME
    honest signal: bounded, and never claims more correct than n."""
    r = _q("centroid_2fold_accuracy")(spark, SF_DIR).collect()[0]
    n = load_table(spark, SF_DIR, "embeddings").count()
    assert r["n_vectors"] == n
    assert 0 <= r["n_correct"] <= n


def test_lexical_richness_matches_manual(spark):
    rows = _q("lexical_richness_profile")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["hapax"] <= r["vocab"] <= r["n_tokens"]
        assert 0 <= r["hapax_ratio_ppm"] <= 1000000
        # K = 1e4*(sum_f2 - N)/N^2 with sum_f2 >= N always
        assert r["yule_k_milli"] >= 0


def test_echo_audit_nests(spark):
    rows = _q("telemetry_echo_audit")(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    for r in rows:
        assert 0 <= r["echo_events"] <= r["n_events"]
        assert r["echo_cells"] <= r["echo_events"] or r["echo_events"] == 0


def test_skyline_is_correct_frontier(spark):
    rows = _q("pareto_skyline_sources")(spark, SF_DIR).collect()
    pts = [(r["mass"], r["vocab"], r["on_skyline"]) for r in rows]
    for m, v, flag in pts:
        dominated = any(
            (m2 > m and v2 >= v) or (m2 >= m and v2 > v)
            for m2, v2, _ in pts
        )
        assert flag == int(not dominated)
    assert any(f for _, _, f in pts)  # the frontier is never empty


def test_trailing_zscore_scored_hour_budget(spark):
    r = _q("trailing_zscore_anomalies")(spark, SF_DIR).collect()[0]
    ev = load_table(spark, SF_DIR, "events")
    n_hours = ev.select(F.date_trunc("hour", "ts")).distinct().count()
    # hours with >= 12 trailing observations: at most n_hours - 12
    assert 0 <= r["n_scored_hours"] <= max(0, n_hours - 12)
    assert r["n_anomalies"] <= r["n_scored_hours"]
    if r["n_anomalies"] == 0 and r["n_scored_hours"] > 0:
        assert r["max_abs_z"] <= 3.0


def test_iv_wald_identity(spark):
    r = _q("iv_wald_estimator")(spark, SF_DIR).collect()[0]
    if r["itt_d_num"] == 0:
        assert r["wald_late"] is None
    else:
        assert abs(
            r["wald_late"] - r["itt_y_num"] / r["itt_d_num"]
        ) < 1e-12


def test_dow_matched_delta_pairs_same_weekday(spark):
    rows = _q("dow_matched_delta")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["delta"] == r["n"] - r["same_dow_prev_week"]
        # the matched day is exactly 7 days earlier by construction:
        # partition-by-dow lag over daily rows
        assert r["day"].weekday() is not None
        want = round(1e6 * r["delta"] / r["same_dow_prev_week"])
        assert abs(r["delta_ppm"] - want) <= 1


def test_candidate_key_verdicts(spark):
    rows = {r["key_cols"]: r for r in _q("candidate_key_audit")(spark, SF_DIR).collect()}
    assert rows["event_id"]["is_key"] == 1
    assert rows["user_id,event_type"]["is_key"] == 0
    # ground truth for the composite candidate comes from the data,
    # not TPC-H lore: the synthetic fixture does NOT honor the
    # (orderkey, linenumber) key — which is exactly the assumed-key
    # failure the audit exists to catch
    li = load_table(spark, SF_DIR, "lineitem")
    want = int(
        li.count() == li.select("l_orderkey", "l_linenumber").distinct().count()
    )
    assert rows["l_orderkey,l_linenumber"]["is_key"] == want
    for r in rows.values():
        assert r["n_distinct"] <= r["n_rows"]
        assert r["is_key"] == int(r["n_distinct"] == r["n_rows"])


def test_overlap_dominates_jaccard(spark):
    """overlap >= jaccard always (min <= union); both in [0, 1e6]."""
    rows = _q("overlap_coefficient_pairs")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["inter_size"] <= r["min_size"]
        assert 0 <= r["overlap_ppm"] <= 1000000
