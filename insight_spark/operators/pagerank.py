"""Distributed PageRank on a weighted edge list (SURVEY.md §2.M28).

The companion iterative-graph op to ``components.connected_components``:
power iteration with damping, expressed as join + map-side-combined
aggregate per round.

Scale posture (1000-executor / 100 TB framing):

- Per round: one equi-join of the (static, cached) edge list with the
  |V|-row rank table on ``src``, then a ``groupBy(dst)`` sum — both
  hash-partitioned on node id, so consecutive rounds reuse the same
  partitioning; edges never re-derive (``localCheckpoint`` truncates
  the lineage once at build).
- Rank state is |V| rows — node-count scale, not corpus scale.
  ``localCheckpoint`` per round keeps the plan O(1) deep instead of
  O(iterations) (the CC-loop lesson, ``components.py``).
- **Fixed-point integer arithmetic end-to-end**: ranks are BIGINTs in
  1e-9 units, per-edge contributions are ``(85·p·w) div (100·W)``
  (exact integer division), teleport is ``(15·SCALE) div (100·N)``.
  No float sums → results independent of partitioning and bit-equal in
  any engine (same exactness contract as ``clustering.py``).  Floor
  division leaks ≤1 unit of mass per edge per round — at 1e-9 scale
  that is the quantization noise, identically on both sides of the
  oracle.  Headroom: 85·p·w needs p·w < 1e17; p ≤ SCALE=1e9 keeps edge
  weights safe to ~1e8 occurrences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed-point rank scale: 1e-9 rank units.
SCALE = 1_000_000_000

#: Damping factor as the exact rational 85/100.
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank(
    nodes: DataFrame, edges: DataFrame, n_iter: int
) -> DataFrame:
    """``n_iter`` damped power-iteration rounds; returns (node, rank).

    ``nodes``: one column ``node``.  ``edges``: ``src``, ``dst``,
    BIGINT weight ``w`` (out-weight totals are derived internally).  Dangling mass is dropped (not redistributed)
    — the standard simplification, applied identically in the oracle.

    Precondition: every edge endpoint (``src`` AND ``dst``) must
    appear in ``nodes``.  The join-free round 0 aggregates straight
    off the edge table — an edge whose ``src`` is absent from
    ``nodes`` would contribute mass in round 0 that the rounds-1+
    ``edges ⋈ ranks`` join (and the oracle's ``ew JOIN r0``) would
    drop.  Both callers build ``nodes`` as the distinct endpoint set,
    so this holds by construction; a caller with external node lists
    must semi-join ``edges`` against ``nodes`` first (amortized across
    all rounds at build, where ``out_w`` is derived).
    """
    nodes = nodes.localCheckpoint(eager=False)
    n = nodes.count()
    out_w = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    edges = (
        edges.join(out_w, "src")
        .select("src", "dst", "w", "wout")
        .localCheckpoint(eager=False)
    )
    teleport = (DAMP_DEN - DAMP_NUM) * SCALE // (DAMP_DEN * n)
    # n_iter == 0 keeps the old contract: the uniform init table.
    ranks = nodes.select("node", F.lit(SCALE // n).cast("long").alias("p"))
    for it in range(n_iter):
        if it == 0:
            # Round 0 is join-free (r12, the components.py round-0
            # lesson): the init rank is the SAME constant SCALE div n
            # for every node, so joining edges to a |V|-row rank table
            # only to read that constant back is a wasted V-sized
            # shuffle — substitute the literal into the identical
            # integer expression and aggregate straight off the edges.
            # Bit-equal by construction: same `(85·p·w) div (100·wout)`
            # arithmetic with p bound to the same value.
            contribs = (
                edges.select(
                    "dst",
                    F.expr(
                        # BIGINT literal: the old `p` column was long,
                        # so 85·p promoted; a bare int literal overflows
                        # under ANSI at constant folding.
                        f"({DAMP_NUM} * CAST({SCALE // n} AS BIGINT) * w)"
                        f" div ({DAMP_DEN} * wout)"
                    ).alias("c"),
                )
                .groupBy("dst")
                .agg(F.sum("c").alias("in_mass"))
            )
        else:
            contribs = (
                edges.join(ranks.withColumnRenamed("node", "src"), "src")
                .select(
                    "dst",
                    F.expr(
                        f"({DAMP_NUM} * p * w) div ({DAMP_DEN} * wout)"
                    ).alias("c"),
                )
                .groupBy("dst")
                .agg(F.sum("c").alias("in_mass"))
            )
        ranks = (
            nodes.join(
                contribs.withColumnRenamed("dst", "node"), "node", "left"
            )
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.coalesce(F.col("in_mass"), F.lit(0))
                )
                .cast("long")
                .alias("p"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
