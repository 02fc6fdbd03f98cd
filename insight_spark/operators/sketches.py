"""Mergeable frequency sketches: count-min (heavy-hitter estimates).

The HLL family (distinct counts) rides Spark's built-in
``hll_sketch_agg``/``hll_union_agg``; frequency estimation has no
built-in equivalent, so the count-min sketch is assembled from
DataFrame primitives.  Representation: the sketch IS a DataFrame of
``(r, pos, c)`` counter cells — at most ``depth × width`` rows no
matter how many input rows were folded in.  That makes it:

- **mergeable**: union two sketches and re-sum per cell (counters add);
- **map-side combined**: the explode(depth) → groupBy(r, pos) count
  collapses to ≤ depth·width rows per task before the shuffle, so the
  exchange is bounded by the sketch size, never the data size;
- **broadcastable**: depth·width ≤ ~32 K cells ≈ a few hundred KiB, so
  estimation joins broadcast the sketch, not the data.

Guarantees (classic CM bounds): estimate ≥ true count always (each
cell only ever over-counts); excess ≤ t·N/width with probability
≥ 1 − t^−depth per query key (Markov per row, independent seeded rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_estimate"]


def _cells(key: Column, depth: int, width: int) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(F.xxhash64(key, F.lit(r)), F.lit(width)).alias("pos"),
            )
            for r in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, key: str, depth: int = 4, width: int = 8192
) -> DataFrame:
    """Fold ``df[key]`` into a count-min sketch: DataFrame of
    ``(r, pos, c)`` with ≤ depth·width rows."""
    return (
        df.select(F.explode(_cells(F.col(key), depth, width)).alias("cell"))
        .groupBy(F.col("cell.r").alias("r"), F.col("cell.pos").alias("pos"))
        .agg(F.count("*").alias("c"))
    )


def cms_estimate(
    keys: DataFrame, sketch: DataFrame, key: str, depth: int = 4, width: int = 8192
) -> DataFrame:
    """Append ``cms_est`` (the min-over-rows counter) to ``keys``.

    The sketch side broadcasts; missing cells (key never folded in)
    count as 0.  depth·|keys| probe rows exist only inside the
    broadcast-join stage — the output is |keys| rows again.
    """
    probes = keys.select(
        F.col(key), F.explode(_cells(F.col(key), depth, width)).alias("cell")
    ).select(key, "cell.r", "cell.pos")
    est = (
        probes.join(F.broadcast(sketch), ["r", "pos"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est"))
    )
    return keys.join(est, key)
