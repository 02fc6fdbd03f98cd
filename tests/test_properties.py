"""Property-based tests (SURVEY.md §5.3.3) — algebraic invariants that
need no oracle.

Hypothesis generates small in-memory tables; each property is checked
over ~10 examples (Spark round-trips dominate, so examples are few but
adversarial: nulls, empties, duplicates, extreme values come from
hypothesis shrinking).
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from insight_spark.operators.dedup import exact_dedup, jaccard, minhash_signature
from insight_spark.operators.similarity import cosine, l2_norm
from insight_spark.sources import load_table

SF = "/root/testdata/sf0.001"

PROP = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ints = st.lists(st.integers(-1000, 1000), min_size=0, max_size=30)
vecs = st.lists(
    st.floats(-10, 10, allow_nan=False, width=32), min_size=2, max_size=8
)


@PROP
@given(xs=ints, threshold=st.integers(-1000, 1000))
def test_filter_subset_of_scan(spark, xs, threshold):
    df = spark.createDataFrame([(x,) for x in xs], "x int")
    filtered = df.filter(F.col("x") > threshold)
    assert filtered.count() <= df.count()
    vals = {r["x"] for r in filtered.collect()}
    assert vals <= set(xs)
    assert all(v > threshold for v in vals)


@PROP
@given(a=ints, b=ints)
def test_union_counts_add(spark, a, b):
    da = spark.createDataFrame([(x,) for x in a], "x int")
    db = spark.createDataFrame([(x,) for x in b], "x int")
    assert da.unionAll(db).count() == len(a) + len(b)


@PROP
@given(xs=ints, k=st.integers(1, 10))
def test_topk_nested(spark, xs, k):
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i int, x int")
    ordered = df.orderBy(F.desc("x"), F.asc("i"))
    small = [(r["i"], r["x"]) for r in ordered.limit(k).collect()]
    big = [(r["i"], r["x"]) for r in ordered.limit(k + 1).collect()]
    assert set(small) <= set(big)


@PROP
@given(xs=st.lists(st.text(st.characters(categories=("Ll",)), max_size=5), max_size=20))
def test_dedup_idempotent(spark, xs):
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "doc_id int, text string"
    )
    once = exact_dedup(df, "text", "doc_id")
    # dedup of the survivors changes nothing
    survivors = df.join(
        once.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    twice = exact_dedup(survivors, "text", "doc_id")
    assert once.count() == twice.count()
    assert {r["content_sha256"] for r in once.collect()} == {
        r["content_sha256"] for r in twice.collect()
    }


@PROP
@given(v=vecs)
def test_cosine_self_is_one(spark, v):
    df = spark.createDataFrame([(v,)], "v array<float>")
    row = df.select(
        cosine(F.col("v"), F.col("v")).alias("c"), l2_norm(F.col("v")).alias("n")
    ).first()
    if row["n"] == 0.0:
        assert row["c"] == 0.0  # zero-vector guard
    else:
        assert math.isclose(row["c"], 1.0, abs_tol=1e-6)


@PROP
@given(a=st.lists(st.text(st.characters(categories=("Ll",)), min_size=1, max_size=4), max_size=10),
       b=st.lists(st.text(st.characters(categories=("Ll",)), min_size=1, max_size=4), max_size=10))
def test_jaccard_symmetric_bounded(spark, a, b):
    df = spark.createDataFrame([(a, b)], "a array<string>, b array<string>")
    row = df.select(
        jaccard(F.col("a"), F.col("b")).alias("ab"),
        jaccard(F.col("b"), F.col("a")).alias("ba"),
    ).first()
    assert math.isclose(row["ab"], row["ba"], abs_tol=1e-12)
    assert 0.0 <= row["ab"] <= 1.0


@PROP
@given(toks=st.lists(st.text(st.characters(categories=("Ll",)), min_size=1, max_size=4),
                     min_size=1, max_size=10))
def test_minhash_signature_deterministic_and_permutation_invariant(spark, toks):
    import random

    shuffled = toks[:]
    random.Random(0).shuffle(shuffled)
    df = spark.createDataFrame(
        [(toks,), (shuffled,)], "toks array<string>"
    ).select(minhash_signature(F.array_distinct(F.col("toks")), 8).alias("sig"))
    sigs = [tuple(r["sig"]) for r in df.collect()]
    assert sigs[0] == sigs[1]  # signature depends on the token SET only


def test_hll_within_error_bound(spark):
    """D6 sketch property (SURVEY §7.4.6): HLL within 5% of exact."""
    ev = load_table(spark, SF, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= max(1, 0.05 * row["exact"])


@pytest.mark.parametrize("frac", [0.0, 0.3, 1.0])
def test_sample_bounds_and_determinism(spark, frac):
    """B10: seeded sampling is deterministic and a subset of the input.

    NB: fraction must be passed by keyword — ``df.sample(0.3, seed=7)``
    hits the (withReplacement, fraction) overload and silently drops the
    seed (nondeterministic!).
    """
    ev = load_table(spark, SF, "events").select("event_id")
    s1 = {r["event_id"] for r in ev.sample(fraction=frac, seed=7).collect()}
    s2 = {r["event_id"] for r in ev.sample(fraction=frac, seed=7).collect()}
    assert s1 == s2
    all_ids = {r["event_id"] for r in ev.collect()}
    assert s1 <= all_ids
    if frac == 0.0:
        assert not s1
    if frac == 1.0:
        assert s1 == all_ids


def test_sessionize_invariant_under_intra_session_shuffle(spark):
    """SURVEY §5.3.3: permuting event arrival order (the window sorts by
    ts anyway) must not change session boundaries."""
    from insight_spark.operators.windows import sessionize

    rows = [
        (1, 100, "2024-01-01 10:00:00"),
        (2, 100, "2024-01-01 10:10:00"),
        (3, 100, "2024-01-01 10:20:00"),
        (4, 100, "2024-01-01 12:00:00"),
        (5, 200, "2024-01-01 10:05:00"),
        (6, 200, "2024-01-01 11:30:00"),
    ]
    import random

    shuffled = rows[:]
    random.Random(3).shuffle(shuffled)

    def sessions(data):
        df = spark.createDataFrame(
            [(e, u, t) for e, u, t in data], "event_id long, user_id long, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = sessionize(df, key="user_id", ts="ts", gap_seconds=1800, tie="event_id")
        return sorted(
            (r["user_id"], r["event_id"], r["session_id"]) for r in out.collect()
        )

    assert sessions(rows) == sessions(shuffled)
