"""Parity gates for the scale-tier BLAS similarity kernels.

The BLAS forms exist because the Catalyst-literal kernels stop scaling
at production knob sizes (K ~ sqrt(N) cells, T·P plane folds — see the
ivf_assign_blas docstring and the probe_r12c measurements in SCALE.md).
A faster kernel that disagrees with the registered oracle-checked form
is worthless, so each BLAS form is pinned ROW-FOR-ROW equal to its
literal counterpart on the fixture — the same "brute force stays the
correctness oracle" contract the ANN recall gates use.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from insight_spark.operators.similarity import (
    ivf_assign,
    ivf_assign_blas,
    ivf_topk,
    lsh_bucket_join,
    lsh_bucket_join_blas,
    lsh_buckets_blas,
    lsh_plane_signs,
    seeded_centroids,
)
from insight_spark.sources import load_table
from tests.conftest import SF_DIR_T2


def _emb(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("c_vec_id"),
        F.col("embedding").alias("c_embedding"),
    )
    return queries, corpus


def test_ivf_assign_blas_matches_literal_argmin(spark):
    """Same (dist, cell_id) argmin per vector, at a production-shaped
    K (16 cells on the sf0.01 fixture), including tie handling."""
    _, corpus = _emb(spark, SF_DIR_T2)
    cents = seeded_centroids(corpus, n_cells=16)
    lit = {
        r["c_vec_id"]: r["cell_id"]
        for r in ivf_assign(corpus, cents).select("c_vec_id", "cell_id").collect()
    }
    blas = {
        r["c_vec_id"]: r["cell_id"]
        for r in ivf_assign_blas(corpus, cents)
        .select("c_vec_id", "cell_id")
        .collect()
    }
    assert len(lit) == len(blas) > 0
    diff = {v: (lit[v], blas[v]) for v in lit if lit[v] != blas[v]}
    assert not diff, f"assignment mismatch: {dict(list(diff.items())[:5])}"


def test_ivf_topk_identical_through_blas_assignment(spark):
    """End-to-end: swapping the assignment kernel under ivf_topk leaves
    the ranked result identical (the index contract is just cell_id)."""
    queries, corpus = _emb(spark, SF_DIR_T2)
    cents = seeded_centroids(corpus, n_cells=16)
    cols = ("q_vec_id", "c_vec_id", "cos_sim", "rank")
    a = sorted(
        tuple(r[c] for c in cols)
        for r in ivf_topk(queries, ivf_assign(corpus, cents), cents, k=5).collect()
    )
    b = sorted(
        tuple(r[c] for c in cols)
        for r in ivf_topk(
            queries, ivf_assign_blas(corpus, cents), cents, k=5
        ).collect()
    )
    assert a == b and len(a) == 50


def test_lsh_buckets_blas_bit_parity(spark):
    """The int64 matmul projection reproduces bucket_exact's integer
    fold bit-for-bit: same (id, table, bucket) triples."""
    _, corpus = _emb(spark, SF_DIR_T2)
    signs = lsh_plane_signs(4, 6, 64)
    blas = {
        (r["c_vec_id"], r["_table"], r["_bucket"])
        for r in lsh_buckets_blas(
            corpus, signs, "c_embedding", "c_vec_id"
        ).collect()
    }
    # reference buckets via the registered literal form's own join:
    # a self-probe where queries == first 10 corpus vectors must land
    # every query in its own bucket in every table -> recoverable from
    # the joined candidate set; instead assert directly against the
    # exact integer projection computed in plain Python.
    rows = corpus.select("c_vec_id", "c_embedding").collect()
    import math

    expect = set()
    for r in rows:
        xi = [math.floor(float(x) * 1_000_000.0) for x in r["c_embedding"]]
        for t, tbl in enumerate(signs):
            b = 0
            for p, plane in enumerate(tbl):
                proj = sum(v * s for v, s in zip(xi, plane))
                if proj >= 0:
                    b += 1 << p
            expect.add((r["c_vec_id"], t, b))
    assert blas == expect


def test_lsh_bucket_join_blas_matches_literal(spark):
    """Full knn parity: BLAS bucketing produces the same ranked top-k
    as the registered literal-matrix lsh_bucket_join."""
    queries, corpus = _emb(spark, SF_DIR_T2)
    signs = lsh_plane_signs(8, 4, 64)
    cols = ("q_vec_id", "c_vec_id", "cos_sim", "rank")
    a = sorted(
        tuple(r[c] for c in cols)
        for r in lsh_bucket_join(
            queries, corpus, k=5, n_planes=4, n_tables=8, plane_signs=signs
        ).collect()
    )
    b = sorted(
        tuple(r[c] for c in cols)
        for r in lsh_bucket_join_blas(queries, corpus, k=5, plane_signs=signs).collect()
    )
    assert a == b and len(a) == 50


def test_ivf_topk_blas_matches_literal_probe(spark):
    """Full BLAS IVF stack (assign + probe selection) returns the same
    ranked top-k as the literal-expression ivf_topk at the same knobs,
    at an n_probe > 1 so probe-order parity is actually exercised."""
    from insight_spark.operators.similarity import ivf_topk_blas

    queries, corpus = _emb(spark, SF_DIR_T2)
    cents = seeded_centroids(corpus, n_cells=16)
    cols = ("q_vec_id", "c_vec_id", "cos_sim", "rank")
    a = sorted(
        tuple(r[c] for c in cols)
        for r in ivf_topk(
            queries, ivf_assign(corpus, cents), cents, k=5, n_probe=3
        ).collect()
    )
    b = sorted(
        tuple(r[c] for c in cols)
        for r in ivf_topk_blas(
            queries, ivf_assign_blas(corpus, cents), cents, k=5, n_probe=3
        ).collect()
    )
    assert a == b and len(a) == 50


def test_lloyd_blas_kernel_bit_identical(spark):
    """k-means: the BLAS assignment kernel is EXACT (micro-int products
    stay under 2^53 in float64), so the full 2-round training
    trajectory — every (vec_id, cell, dist) — is bit-identical to the
    literal kernel, at a K above the literal form's codegen comfort
    zone.  Unlike the float ANN parity pins, a mismatch here is a hard
    bug, never rounding."""
    from insight_spark.operators.clustering import lloyd, quantize_micro

    emb = load_table(spark, SF_DIR_T2, "embeddings").select(
        "vec_id", quantize_micro(F.col("embedding")).alias("e")
    )
    cols = ("vec_id", "cell", "dist")
    a = sorted(
        tuple(r[c] for c in cols)
        for r in lloyd(emb, k=20, n_iter=2, kernel="literal").collect()
    )
    b = sorted(
        tuple(r[c] for c in cols)
        for r in lloyd(emb, k=20, n_iter=2, kernel="blas").collect()
    )
    assert a == b and len(a) == emb.count()
