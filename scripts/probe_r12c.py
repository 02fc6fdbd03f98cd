"""Round-12 two-decade scale probe: the ANN / graph-closure / text-rank
families — the headline "similarity search" and "dedup closure" surfaces
that until now had correctness evidence at three tiers but NO measured
scaling (SCALE.md carried design arguments only for knn/ann_ivf/ann_lsh,
kmeans_lloyd, near_dup_clusters, pagerank_tokens, tfidf_top, bm25_search).

Fixture methodology (the SCALE.md r4 shifted-key rule): N shifted-id
copies of sf0.1 ``embeddings`` (vec_id + i*1e9) and ``documents``
(doc_id + i*1e9).  Shifting — not verbatim duplication — grows the real
problem surface: the ANN corpus gains N× distinct vectors while the 10
query vectors (vec_id < 10, copy 0 only) stay fixed, so the measured
variable is corpus-growth cost at constant query load; the document
copies keep within-copy id adjacency (near-dup chains replicate N×,
component COUNT grows N×, diameter stays fixed — the pointer-jumping
round count must not grow).

Two legs per ANN tier:

1. **Registered knobs, as frozen in the registry** (n_cells=8,
   n_planes=4×8 tables).  Honest: at 100× these small-data knobs stop
   pruning (8 cells of 25 k vectors, probe 3 → 75 k candidates/query),
   so the gap between this leg and the brute baseline SHRINKS — the
   measurement that proves index knobs are data-scale-dependent.
2. **Scaled knobs per the documented K ~ sqrt(N) rule** (the same rule
   semantic_dedup's 100x probe applied): n_cells = sqrt(N) keeps cell
   size = sqrt(N), n_planes = log2(N/sqrt(N)) keeps LSH buckets
   ~sqrt(N).  This is the leg a 100 TB deployment runs — the quantizer
   is retrained for the corpus, the operators are unchanged.

Usage: python scripts/probe_r12c.py [--rebuild] [--x100]
Prints one line per (query, tier) with warm best-of-2 seconds.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
FIX10 = "/tmp/insight_spark_probe/sf0.1x10_ann"
FIX100 = "/tmp/insight_spark_probe/sf0.1x100_ann"

#: registered queries probed as-is (knobs frozen in the registry)
QUERIES = (
    "knn_cosine_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "kmeans_lloyd",
    "near_dup_clusters",
    "pagerank_tokens",
    "tfidf_top",
    "bm25_search",
)

SHIFT = 1_000_000_000


def build_fixture(spark, fix: str, mult: int) -> None:
    from pyspark.sql import functions as F

    from insight_spark.sources import load_table

    os.makedirs(fix, exist_ok=True)
    for table, id_col in (("embeddings", "vec_id"), ("documents", "doc_id")):
        out = os.path.join(fix, f"{table}.parquet")
        if os.path.exists(out):
            continue
        src = load_table(spark, BASE, table)
        copies = [
            src.withColumn(
                id_col, (F.col(id_col) + F.lit(i * SHIFT)).cast("long")
            )
            for i in range(mult)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        big.repartition(max(8, mult // 2)).write.mode("overwrite").parquet(out)
        print(f"built {out} (x{mult})", file=sys.stderr)


def _emb(spark, sf_dir):
    from pyspark.sql import functions as F

    from insight_spark.sources import load_table

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


def ivf_scaled_literal(spark, sf_dir: str, n_corpus: int):
    """Leg 2a: quantizer retrained for the corpus (n_cells = sqrt(N),
    cell size sqrt(N), n_probe 3) through the REGISTERED literal-argmin
    assignment.  Measured N^1.5 (the expression tree is O(K·d) per
    row) — kept in the probe as the negative control that motivated
    the BLAS kernel."""
    from insight_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        seeded_centroids,
    )

    queries, corpus = _emb(spark, sf_dir)
    n_cells = max(8, int(math.sqrt(n_corpus)))
    cents = seeded_centroids(corpus, n_cells=n_cells)
    indexed = ivf_assign(corpus, cents)
    return ivf_topk(queries, indexed, cents, k=5, n_probe=3)


def ivf_scaled_blas(spark, sf_dir: str, n_corpus: int):
    """Leg 2b: same retrained quantizer through the full BLAS stack —
    ``ivf_assign_blas`` (corpus assignment, one GEMM per Arrow batch)
    + ``ivf_topk_blas`` (query probe selection, same kernel) — the
    100 TB path, pinned row-for-row equal to leg 2a in
    tests/test_similarity_blas.py."""
    from insight_spark.operators.similarity import (
        ivf_assign_blas,
        ivf_topk_blas,
        seeded_centroids,
    )

    queries, corpus = _emb(spark, sf_dir)
    n_cells = max(8, int(math.sqrt(n_corpus)))
    cents = seeded_centroids(corpus, n_cells=n_cells)
    indexed = ivf_assign_blas(corpus, cents)
    return ivf_topk_blas(queries, indexed, cents, k=5, n_probe=3)


def lsh_scaled_blas(spark, sf_dir: str, n_corpus: int):
    """Leg 2c: LSH with bucket population held at ~sqrt(N) —
    n_planes = log2(N/sqrt(N)) = log2(N)/2, 8 tables (recall knob
    unchanged) — through the BLAS bucketing kernel (integer matmul per
    Arrow batch, bit-equal to the literal sign-matrix form)."""
    from insight_spark.operators.similarity import (
        lsh_bucket_join_blas,
        lsh_plane_signs,
    )

    queries, corpus = _emb(spark, sf_dir)
    n_planes = max(4, int(round(math.log2(n_corpus) / 2)))
    return lsh_bucket_join_blas(
        queries, corpus, k=5, plane_signs=lsh_plane_signs(8, n_planes, 64)
    )


def _kmeans_scaled(kernel):
    def run(spark, sf_dir: str, n_corpus: int):
        """Leg 2d/2e: the quantizer TRAINER at K = sqrt(N), 2 Lloyd
        rounds — literal vs BLAS assignment kernel.  Unlike the ANN
        float kernels the swap is exact integer arithmetic, so the two
        legs compute the identical model (pinned by
        test_lloyd_blas_kernel_bit_identical)."""
        from pyspark.sql import functions as F

        from insight_spark.operators.clustering import lloyd, quantize_micro
        from insight_spark.sources import load_table

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", quantize_micro(F.col("embedding")).alias("e")
        )
        k = max(8, int(math.sqrt(n_corpus)))
        final = lloyd(emb, k=k, n_iter=2, kernel=kernel)
        return final.groupBy(F.col("cell").cast("int").alias("cell_id")).agg(
            F.count("*").alias("n_points"),
            F.sum("dist").alias("inertia_micro2"),
        )

    return run


SCALED = {
    "ann_ivf_sqrtN_literal": ivf_scaled_literal,
    "ann_ivf_sqrtN_blas": ivf_scaled_blas,
    "ann_lsh_logN_blas": lsh_scaled_blas,
    "kmeans_sqrtN_literal": _kmeans_scaled("literal"),
    "kmeans_sqrtN_blas": _kmeans_scaled("blas"),
}


def main() -> None:
    from insight_spark.engine import get_spark
    from insight_spark.queries import all_queries, set_lint_default

    set_lint_default(False)
    spark = get_spark("probe_r12c")
    spark.sparkContext.setLogLevel("ERROR")
    if "--rebuild" in sys.argv:
        import shutil

        shutil.rmtree(FIX10, ignore_errors=True)
        shutil.rmtree(FIX100, ignore_errors=True)
    build_fixture(spark, FIX10, 10)
    tiers = [("1x", BASE, 2000), ("10x", FIX10, 20000)]
    if "--x100" in sys.argv:
        build_fixture(spark, FIX100, 100)
        tiers.append(("100x", FIX100, 200000))
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    reg = all_queries()
    for name in QUERIES:
        if only and only not in name:
            continue
        fn = reg[name]
        for tier, sf_dir, _n in tiers:
            fn(spark, sf_dir).toPandas()  # cold
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).toPandas()
                best = min(best, time.perf_counter() - t0)
            print(f"{name} {tier} {best:.3f}s", flush=True)
    for name, fn in SCALED.items():
        if only and only not in name:
            continue
        for tier, sf_dir, n_corpus in tiers:
            if name.endswith("_literal") and tier == "100x":
                # negative controls only: N^1.5 measured over the first
                # two decades projects ~10 min per leg here — the
                # point is already made at 10x.
                print(f"{name} {tier} skipped (N^1.5 control)", flush=True)
                continue
            fn(spark, sf_dir, n_corpus).toPandas()  # cold
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir, n_corpus).toPandas()
                best = min(best, time.perf_counter() - t0)
            print(f"{name} {tier} {best:.3f}s", flush=True)


if __name__ == "__main__":
    main()
