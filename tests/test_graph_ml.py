"""Property tests for the iterative ops (M27 k-means, M28 PageRank).

The oracle-parity suite already value-checks both end-to-end; these
pin the algorithmic invariants the value hash can't express:
monotone inertia for Lloyd and mass conservation for PageRank.
"""

from pyspark.sql import functions as F

from insight_spark.operators.clustering import (
    assign_cells,
    lloyd,
    quantize_micro,
    update_centroids,
)
from insight_spark.operators.pagerank import SCALE, pagerank
from insight_spark.operators.text import tokenize
from insight_spark.sources import load_table

K = 8


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", quantize_micro(F.col("embedding")).alias("e")
    )


def _inertia(assigned) -> int:
    return assigned.agg(F.sum("dist")).first()[0]


def test_lloyd_inertia_monotone(spark, sf_dir):
    """Each Lloyd round must not increase total inertia (textbook
    guarantee, preserved under micro-int quantization up to the
    +-0.5-unit rounding of centroid coords — strictly decreasing on
    this fixture)."""
    emb = _emb(spark, sf_dir)
    seed = [
        (i, list(r["e"]))
        for i, r in enumerate(
            emb.orderBy("vec_id").limit(K).select("e").collect()
        )
    ]
    a0 = assign_cells(emb, seed)
    i0 = _inertia(a0)
    c1 = dict(update_centroids(a0))
    a1 = assign_cells(emb, [(cid, c1.get(cid, c)) for cid, c in seed])
    i1 = _inertia(a1)
    i2 = _inertia(lloyd(emb, k=K, n_iter=2))
    assert i0 > i1 >= i2


def test_lloyd_partitions_all_points(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    final = lloyd(emb, k=K, n_iter=1)
    assert final.count() == emb.count()
    cells = {r["cell"] for r in final.select("cell").distinct().collect()}
    assert cells <= set(range(K))


def test_pagerank_mass_conserved(spark, sf_dir):
    """Total rank mass stays in (0.8·SCALE, SCALE]: floor division and
    dangling nodes only ever *leak* mass (≤1 unit/edge/round + dangling
    share), never create it — and ranks must actually differentiate."""
    docs = load_table(spark, sf_dir, "documents")
    l = tokenize(F.col("text"))
    n_pairs = F.greatest(F.size(l) - 1, F.lit(0))
    pairs = docs.select(
        F.explode(
            F.zip_with(
                F.slice(l, 1, n_pairs),
                F.slice(l, 2, n_pairs),
                lambda a, b: F.struct(a.alias("src"), b.alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    edges = pairs.groupBy("src", "dst").agg(
        F.count("*").cast("long").alias("w")
    )
    nodes = docs.select(F.explode(l).alias("node")).distinct()
    ranks = pagerank(nodes, edges, n_iter=3)
    rows = ranks.collect()
    total = sum(r["p"] for r in rows)
    assert 0.8 * SCALE < total <= SCALE
    assert len({r["p"] for r in rows}) > 1
    assert min(r["p"] for r in rows) > 0
