"""Training-data pipeline ops: connected components + packing properties."""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from insight_spark.operators.components import (  # noqa: E402
    canonical_assignment,
    connected_components,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _brute_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find ground truth: vertex -> min id in its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {v: find(v) for v in parent}


def test_connected_components_matches_union_find(spark):
    """Random graphs (chains, stars, cycles, singletons mixed) — the
    distributed CC labels must equal brute-force union-find."""
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(int(n * 0.8))
        ]
        # force a long chain: worst case for plain propagation, the
        # case pointer jumping exists for
        chain_base = 100 + trial * 100
        edges += [(chain_base + i, chain_base + i + 1) for i in range(30)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["v"]: r["label"]
            for r in connected_components(df, max_iter=12).collect()
        }
        want = _brute_components(edges)
        assert got == want, f"trial {trial}: CC mismatch"


def test_canonical_assignment_covers_all_ids(spark):
    """Every id gets a canonical; unpaired ids map to themselves;
    canonicals are component minima."""
    pairs = spark.createDataFrame(
        [(2, 5), (5, 9)], "a_id long, b_id long"
    )
    all_ids = spark.createDataFrame(
        [(i,) for i in range(12)], "doc_id long"
    )
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in canonical_assignment(pairs, all_ids).collect()
    }
    assert len(got) == 12
    assert got[2] == got[5] == got[9] == 2
    for i in [0, 1, 3, 4, 6, 7, 8, 10, 11]:
        assert got[i] == i


def test_pack_token_budget_properties(spark):
    """Greedy packing invariants under the (source, shard) salted key:
    every doc packed exactly once; no bin over budget unless it holds a
    single oversized doc; bin ids dense from 0 per (source, shard) in
    doc_id order; shard is the deterministic xxhash64 salt."""
    from insight_spark.queries.training import (
        _PACK_BUDGET,
        _PACK_SHARDS,
        pack_token_budget,
    )

    out = pack_token_budget(spark, SF_DIR).collect()
    docs_seen = [r["doc_id"] for r in out]
    assert len(docs_seen) == len(set(docs_seen)) > 0
    assert all(0 <= r["shard"] < _PACK_SHARDS for r in out)

    by_group: dict[tuple, list] = {}
    for r in out:
        by_group.setdefault((r["source"], r["shard"]), []).append(r)
    assert len(by_group) > 1, "shard salt produced a single group"
    for group, rows in by_group.items():
        rows.sort(key=lambda r: r["doc_id"])
        bins: dict[int, int] = {}
        for r in rows:
            bins[r["bin_id"]] = bins.get(r["bin_id"], 0) + r["n_tokens"]
        for bin_id, total in bins.items():
            n_docs = sum(1 for r in rows if r["bin_id"] == bin_id)
            assert total <= _PACK_BUDGET or n_docs == 1, (
                f"{group} bin {bin_id}: {total} tokens in {n_docs} docs"
            )
        # bin ids are 0..max contiguous and non-decreasing in doc order
        seq = [r["bin_id"] for r in rows]
        assert seq == sorted(seq)
        assert set(seq) == set(range(max(seq) + 1))


def test_train_test_split_stable_under_append(spark):
    """Content-keyed split: restricting the corpus must not move any
    surviving doc between splits (the append-stability property)."""
    from insight_spark.queries.training import train_test_split

    full = {
        r["doc_id"]: r["split"]
        for r in train_test_split(spark, SF_DIR).collect()
    }
    from insight_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    half.createOrReplaceTempView("_half_docs")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    sub = {
        r["doc_id"]: r["split"]
        for r in half.select(
            "doc_id",
            F.when(h2 < "cd", "train").otherwise("test").alias("split"),
        ).collect()
    }
    assert sub == {k: v for k, v in full.items() if k % 2 == 0}
    # sanity: both splits non-empty, train is the large side
    n_train = sum(1 for v in full.values() if v == "train")
    assert 0 < n_train < len(full) and n_train > len(full) / 2


def test_write_training_shards_deterministic(spark, tmp_path):
    """Shard export: every doc lands in exactly one shard, assignment
    matches the md5 formula, and two writes are byte-stable."""
    from insight_spark.sources import load_table
    from insight_spark.sources.sinks import write_training_shards

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, id_col="doc_id", n_shards=4)

    back = spark.read.parquet(out)
    n_docs = docs.count()
    assert back.count() == n_docs
    assert back.select("doc_id").distinct().count() == n_docs
    assert back.select("shard").distinct().count() == 4

    expected = docs.select(
        "doc_id",
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
            ).cast("long")
            % 4
        )
        .cast("int")
        .alias("shard"),
    )
    mismatch = (
        back.select("doc_id", "shard")
        .exceptAll(expected)
        .count()
    )
    assert mismatch == 0

    out2 = str(tmp_path / "shards2")
    write_training_shards(docs, out2, id_col="doc_id", n_shards=4)
    back2 = spark.read.parquet(out2)
    assert back.exceptAll(back2).count() == 0 and back2.exceptAll(back).count() == 0
