"""Declared query registry — the surface behind ``__spark_entry__``.

Each query is a (name, spark_fn, oracle_sql) triple registered via the
``@query`` decorator.  ``spark_fn(spark, sf_dir) -> DataFrame`` builds
the PySpark plan; ``oracle`` is the DuckDB-dialect SQL the driver runs
side-by-side at sf0.01 (row-count + schema + order-insensitive
value-hash).  Queries with ``oracle=None`` get the weaker rows-only
check (approx sketches, engine-specific RNG — SURVEY.md §7.4.6).

Alignment discipline (SURVEY.md §7.4), applied inside every pair:
- every computed column aliased identically on both sides;
- money/measure sums: DECIMAL(38,6) cast *before* aggregation (exact,
  order-independent) on both sides;
- means: round(exact_sum::double / count, 6) — identical formula both
  sides → bit-equal doubles;
- every order feeding row_number/limit ends in a unique tie-break key;
- rank-on-rounded-score for float ordering parity.
"""

from __future__ import annotations

import functools
import importlib
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, SparkQuery] = {}
_ORACLE: dict[str, str] = {}

#: Submodules that populate the registry on import.
_MODULES = (
    "insight_spark.queries.relational",
    "insight_spark.queries.windows",
    "insight_spark.queries.events",
    "insight_spark.queries.text",
    "insight_spark.queries.vectors",
    "insight_spark.queries.llm",
    "insight_spark.queries.joins",
    "insight_spark.queries.aggregates",
    "insight_spark.queries.window_extra",
    "insight_spark.queries.setops",
    "insight_spark.queries.text_extra",
    "insight_spark.queries.vectors_extra",
    "insight_spark.queries.misc",
    "insight_spark.queries.pipeline_extra",
    "insight_spark.queries.functions_extra",
    "insight_spark.queries.subqueries",
    "insight_spark.queries.training",
    "insight_spark.queries.corpus_extra",
    "insight_spark.queries.analytics_extra",
    "insight_spark.queries.tpch",
    "insight_spark.queries.graph",
    "insight_spark.queries.layout",
    "insight_spark.queries.sources_rt",
    "insight_spark.queries.streaming_rt",
    "insight_spark.queries.corpus_clean",
    "insight_spark.queries.mixing",
    "insight_spark.queries.langtok",
    "insight_spark.queries.geo",
)

#: Driver-facing registration order.  The external correctness driver
#: records the FIRST 50 entries of ``queries()`` per round.  Rotation
#: history (r5-r10 rationales) lives in git; principle carried forward:
#: first-time driver evidence outranks refresh, refresh goes oldest-
#: signature-first, and a name is only listed here AFTER its
#: implementation is registered (tests/test_registry.py pins both
#: directions at build time -- the r8 lesson).
#: ROUND-11 rotation (VERDICT r10 tasks 1/2/5): the registry grew by
#: 142 in round 10 while the driver signs 50/round, so 142 queries
#: (30% of the surface) have local-oracle + judge-sample evidence but
#: no driver signature.  This window is ALL first-time evidence: the
#: 50 OLDEST-ADDED of those 142, ordered by the git commit that
#: introduced each (ties broken by registration order).  Registry
#: growth is frozen this round (<=10 additions) until the backlog
#: clears.  COMMITTED ROTATION PLAN for the following rounds
#: (VERDICT r10 task 5, done-criterion "no signature older than r4
#: by r13"):
#:   r12 = the 32 r2-era signatures + the 18 oldest r3-era (refresh
#:         outranks backlog there because those signatures are 9-10
#:         rounds stale and the code has churned since);
#:   r13 = the remaining 21 r3-era + the 29 oldest of the backlog
#:         tail (backlog names 51-79 in the oldest-added order
#:         recorded below);
#:   r14 = backlog names 80-129;  r15 = backlog names 130-142 + the
#:         oldest r4-era refresh.  After r15: zero never-signed
#:         queries, no signature older than r5.
#: Backlog tail (names 51-142, oldest-added first, for r13-r15; the
#: two r11 additions stream_state_rescale_audit and
#: stream_state_migration_roundtrip append after name 142, landing in
#: the r15 window alongside the r4-era refresh):
#:   lag_feature_matrix, stream_topk_hitters, cohort_ltv_curve,
#:   embedding_mean_shift_audit, l_diversity_audit, conformal_interval_coverage,
#:   experiment_cumulative_lift, quantile_treatment_effect, mann_whitney_u,
#:   spearman_nation_segment, t_closeness_audit, file_metadata_rowcount_audit,
#:   largest_remainder_allocation, mips_dot_topk, special_token_contamination,
#:   manifest_disjoint_writers, manifest_restore_roundtrip, chi2_independence_rc,
#:   degree_assortativity, ivm_delete_recompute, concurrency_curve,
#:   ohlc_hourly_bars, uplift_by_exposure_bucket, hidden_partition_pruning,
#:   stream_ohlc_bars, bottomk_mergeable_sample, video_keyframe_select,
#:   markup_strip_audit, url_canonicalize_dedup, impute_group_median,
#:   windowed_count_distinct, fd_discovery_audit, sargable_rewrite_probe,
#:   session_gap_sweep, hierarchy_subtree_rollup, json_key_coverage,
#:   flesch_reading_ease, frequency_cap_waste, capped_running_balance,
#:   kpi_delta_decomposition, burst_rate_audit, dispersion_index_check,
#:   ams_f2_sketch, triplet_margin_audit, event_type_affinity,
#:   rendezvous_hashing_audit, bandit_replay_eval, decayed_user_activity_rank,
#:   csv_corrupt_records_audit, max_drawdown_daily, fair_topk_interleave,
#:   ipf_raking_weights, digest_collision_risk, lateness_horizon_audit,
#:   conditional_quantile_profile, trend_fit_quality, leadtime_percentiles,
#:   vwap_monthly, p99_regression_probe, weekpart_seasonality,
#:   phrase_match_search, ab_sample_size_table, ratio_metric_delta_var,
#:   jains_fairness_index, simpson_diversity_index, hourly_peak_detection,
#:   topk_concentration_ratio, aa_test_null_check, midnight_boundary_artifact,
#:   doc_prefix_dup_groups, multi_table_publish, cluster_sample_two_stage,
#:   edge_support_truss, rate_limit_admission_audit, distinctive_terms_ratio,
#:   stratified_att_estimate, geo_convex_contains, median_ci_order_stats,
#:   active_learning_margin_pick, mv_staleness_probe, sorted_neighborhood_pairs,
#:   weighted_jaccard_pairs, bigram_next_token_accuracy, centroid_2fold_accuracy,
#:   lexical_richness_profile, telemetry_echo_audit, pareto_skyline_sources,
#:   iv_wald_estimator, trailing_zscore_anomalies, dow_matched_delta,
#:   candidate_key_audit, overlap_coefficient_pairs
#: Exactly 50 names.  Unlisted queries follow in registration order.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # added in 72f2675
    "suggest_from_index",
    # added in f72c7e3
    "manifest_log_roundtrip",
    # added in 5ceeae6
    "manifest_checkpoint_read",
    "manifest_delete_roundtrip",
    "manifest_schema_evolution",
    "manifest_zone_map_scan",
    # added in a607870
    "manifest_vacuum_audit",
    "pca_top2_closed_form",
    "phash_image_clusters",
    "stream_dedup_within_watermark",
    # added in d08bf6f
    "length_bucket_padding_sweep",
    "pseudonym_consistency_audit",
    "truncation_loss_audit",
    "wav_fingerprint_clusters",
    # added in ed52f49
    "diff_in_diff_estimate",
    "stream_manifest_sink_versions",
    "window_distribution_family",
    # added in 15f214d
    "manifest_merge_upsert",
    "zorder_zone_map_probe",
    # added in eb31e68
    "code_like_score",
    "kwic_windows",
    "prf_query_expansion",
    "sentence_split_stats",
    # added in 8003bea
    "nearest_centroid_confusion",
    "url_parse_stats",
    # added in 4f146c7
    "data_contract_audit",
    "per_type_trend_slopes",
    # added in 3a35056
    "delta_index_merge_read",
    "event_runlength_islands",
    # added in 048e141
    "bootstrap_mean_ci",
    "interarrival_median_gap",
    "trimmed_mean_robust",
    # added in 8a146bf
    "cuped_adjusted_lift",
    "manifest_clone_diverge",
    "manifest_compact_optimize",
    # added in 327fc42
    "manifest_version_cdc",
    # added in 7a15263
    "geo_bbox_containment",
    "geo_grid_density",
    "geo_nearest_hub",
    # added in a646b41
    "beta_posterior_arms",
    "pr_curve_thresholds",
    "xcorr_hourly_lags",
    # added in f2e7e81
    "kmv_set_cardinality",
    "markov_next_event_accuracy",
    "silhouette_simplified",
    "term_proximity_rank",
    # added in 298b4ec
    "anova_f_groups",
    "hamming_binary_rerank",
    "manifest_constraint_gate",
    # added in e0e492d
    "dataset_card_profile",
)

_loaded = False

#: Registration-time plan lint default (VERDICT r10 task 8): ON, so a
#: new query with a scale-killer plan fails the moment a dev builds it
#: — not at the next full suite run (rounds 5 and 6 each shipped one
#: because nothing ran the guard at write time).  The driver's timed
#: correctness runs and bench flip this off via ``set_lint_default``
#: (zero planning overhead there); ``SPARK_GRAFT_LINT_PLANS=1/0`` in
#: the environment overrides in either direction.
_LINT_DEFAULT: bool = True


def set_lint_default(enabled: bool) -> None:
    """Flip the build-time plan lint for paths where it must not run
    (the external driver's timed window, bench) or must (dev loops)."""
    global _LINT_DEFAULT
    _LINT_DEFAULT = enabled


def _lint_enabled() -> bool:
    env = os.environ.get("SPARK_GRAFT_LINT_PLANS")
    if env is not None:
        return env not in ("", "0")
    return _LINT_DEFAULT


def _load() -> None:
    global _loaded
    if not _loaded:
        for mod in _MODULES:
            importlib.import_module(mod)
        _loaded = True


def query(name: str, oracle: str | None = None):
    """Register a declared query (and its DuckDB oracle, if hashable).

    Every registered query lints its own physical plan at build time
    (plans/audit.lint_query_plan) and raises ``PlanScaleError`` on a
    fatal scale-killer shape — the registration-time gate the
    round-5/round-6 regressions called for (both rounds shipped a
    query that failed the engine-wide test guard because nothing ran
    the guard when the query was written).  ON by default since r11
    (VERDICT r10 task 8); the driver's timed path (__spark_entry__)
    and bench flip it off via ``set_lint_default(False)``, and
    ``SPARK_GRAFT_LINT_PLANS=1/0`` overrides either way."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        @functools.wraps(fn)
        def linted(spark: SparkSession, sf_dir: str) -> DataFrame:
            df = fn(spark, sf_dir)
            if _lint_enabled():
                from insight_spark.plans.audit import lint_query_plan

                lint_query_plan(name, df)
            return df

        _QUERIES[name] = linted
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def _priority_order(names) -> list[str]:
    ranked = [n for n in _DRIVER_PRIORITY if n in names]
    rest = [n for n in names if n not in set(_DRIVER_PRIORITY)]
    return ranked + rest


#: Oracles that are only valid under the default environment: when the
#: named env var is SET, the query's output intentionally diverges from
#: the registered SQL (e.g. a keyed-PRF secret changes the DP noise),
#: so ``all_oracle_sql`` drops the entry — the driver then records the
#: weaker rows-only check instead of a guaranteed hash mismatch.
_ORACLE_SKIP_ENV: dict[str, str] = {
    "dp_noisy_release": "SPARK_GRAFT_DP_SECRET",
}


def all_queries() -> dict[str, SparkQuery]:
    """Registry in driver order.  FAIL-SOFT on priority-list drift
    (VERDICT r8 "what's wrong" #1): an unregistered ``_DRIVER_PRIORITY``
    name is stripped with a warning instead of killing every registry
    consumer — the r8 hard assert here converted five missing names
    into a zeroed round (empty CORRECTNESS, crashed bench, dead smoke
    check, failed test collection).  The strictness now lives in
    ``tests/test_registry.py``, where a mismatch fails the BUILD, not
    the driver."""
    _load()
    missing = [n for n in _DRIVER_PRIORITY if n not in _QUERIES]
    if missing:
        import logging
        import warnings

        msg = f"_DRIVER_PRIORITY names not registered (stripped): {missing}"
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
        # Python warnings are often filtered out of driver logs; a
        # WARNING-level log line survives there (ADVICE r9 #4).
        logging.getLogger(__name__).warning(msg)
    return {n: _QUERIES[n] for n in _priority_order(_QUERIES)}


def all_oracle_sql() -> dict[str, str]:
    _load()
    skip = {
        name
        for name, env in _ORACLE_SKIP_ENV.items()
        if os.environ.get(env)
    }
    return {
        n: _ORACLE[n] for n in _priority_order(_ORACLE) if n not in skip
    }
