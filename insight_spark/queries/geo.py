"""Geospatial operators: grid-pruned spatial joins and density rollups.

The space-partitioning family every location-aware pipeline needs:
nearest-neighbor-within-radius joins, 2-D bounding-box containment
joins, and multi-resolution grid density — all expressed as cell-key
equi-joins so Catalyst shuffles/broadcasts on plain BIGINT keys and
never sees a distance predicate it can't push.  Coordinates are exact
integer micro-degrees derived deterministically from table keys (the
fixture has no real lat/lon columns), and the distance metric is the
planar squared micro-degree distance — exact BIGINT arithmetic on both
engines, no libm.  Production would swap the final exact-distance
expression for haversine and add longitude wrap cells; the pruning
layer is metric-agnostic given cell size >= radius.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insight_spark.operators.layout import z_value_expr, z_value_sql
from insight_spark.queries import query
from insight_spark.sources import load_table

#: Micro-degree derivations (exact BIGINT, identical both engines).
_LAT_U = "((user_id * 134435747 + 11) % 180000001) - 90000000"
_LON_U = "((user_id * 134435754 + 7) % 360000001) - 180000000"
_LAT_H = "((hub_id * 86822507 + 3) % 180000001) - 90000000"
_LON_H = "((hub_id * 86822513 + 5) % 360000001) - 180000000"

#: Radius / cell size for the nearest-hub join, in micro-degrees.
#: Cell size == radius makes the 3x3 neighborhood provably complete:
#: d <= R implies |dlat| <= R and |dlon| <= R, so the hub's cell is
#: within +-1 of the point's cell in each dimension.
_CELL = 2_000_000
_R2 = _CELL * _CELL


def _fdiv(expr: str, c: int) -> str:
    """Sign-safe floor division as a SQL string valid on BOTH engines
    modulo the div operator: caller substitutes ``div`` (Spark) or
    ``//`` (DuckDB) via the ``op`` placeholder."""
    return f"(({expr}) - ((({expr}) % {c} + {c}) % {c})) {{op}} {c}"


def _fdiv_spark(expr: str, c: int):
    return F.expr(_fdiv(expr, c).format(op="div"))


def _fdiv_sql(expr: str, c: int) -> str:
    return _fdiv(expr, c).format(op="//")


@query(
    "geo_nearest_hub",
    oracle=f"""
    WITH u AS (
        SELECT c_custkey AS user_id,
               {_LAT_U.replace("user_id", "c_custkey")} AS lat_u,
               {_LON_U.replace("user_id", "c_custkey")} AS lon_u
        FROM customer
    ),
    h AS (
        SELECT s_suppkey AS hub_id,
               {_LAT_H.replace("hub_id", "s_suppkey")} AS lat_h,
               {_LON_H.replace("hub_id", "s_suppkey")} AS lon_h
        FROM supplier
    ),
    cand AS (
        SELECT u.user_id, h.hub_id,
               (u.lat_u - h.lat_h) * (u.lat_u - h.lat_h)
             + (u.lon_u - h.lon_h) * (u.lon_u - h.lon_h) AS d2
        FROM u CROSS JOIN h
    ),
    ranked AS (
        SELECT user_id, hub_id, d2,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY d2, hub_id
               ) AS rn
        FROM cand WHERE d2 <= {_R2}
    )
    SELECT user_id, hub_id, d2 AS dist2_udeg FROM ranked WHERE rn = 1
    """,
)
def geo_nearest_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest hub within a radius, grid-pruned (M243): assign every
    point and hub to a cell of side R, replicate each hub to its 3x3
    cell neighborhood, equi-join on the cell key, and arg-min the
    exact distance — the canonical scalable form of a spatial
    nearest-neighbor join.  Completeness is by construction (cell
    size == radius), which the oracle independently verifies with a
    plain cross join + window.

    Exactness: coordinates and squared distances are BIGINT
    micro-degrees end-to-end (|d| <= 2R inside a neighborhood, square
    ~1e14 — well inside int64); arg-min via min(struct(d2, hub_id))
    == the oracle's ORDER BY d2, hub_id tie-break.  Scale: the 9x
    replicated hub table stays dim-sized and broadcasts; the point
    side never shuffles — at 100 TB this is one map-side join + one
    keyed aggregate, candidates bounded by hub density per cell, not
    |points| x |hubs|.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.expr(_LAT_U.replace("user_id", "c_custkey")).alias("lat_u"),
        F.expr(_LON_U.replace("user_id", "c_custkey")).alias("lon_u"),
    )
    pts = cust.select(
        "*",
        _fdiv_spark("lat_u", _CELL).alias("cl_lat"),
        _fdiv_spark("lon_u", _CELL).alias("cl_lon"),
    )
    hubs = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("hub_id"),
        F.expr(_LAT_H.replace("hub_id", "s_suppkey")).alias("lat_h"),
        F.expr(_LON_H.replace("hub_id", "s_suppkey")).alias("lon_h"),
    )
    offs = F.array(F.lit(-1), F.lit(0), F.lit(1))
    h9 = (
        hubs.select(
            "*",
            _fdiv_spark("lat_h", _CELL).alias("hc_lat"),
            _fdiv_spark("lon_h", _CELL).alias("hc_lon"),
        )
        .select("*", F.explode(offs).alias("di"))
        .select("*", F.explode(offs).alias("dj"))
        .select(
            "hub_id",
            "lat_h",
            "lon_h",
            (F.col("hc_lat") + F.col("di")).alias("cl_lat"),
            (F.col("hc_lon") + F.col("dj")).alias("cl_lon"),
        )
    )
    dlat = F.col("lat_u") - F.col("lat_h")
    dlon = F.col("lon_u") - F.col("lon_h")
    cand = (
        pts.join(F.broadcast(h9), ["cl_lat", "cl_lon"])
        .select("user_id", "hub_id", (dlat * dlat + dlon * dlon).alias("d2"))
        .filter(F.col("d2") <= _R2)
    )
    return cand.groupBy("user_id").agg(
        F.min(F.struct("d2", "hub_id")).alias("b")
    ).select(
        "user_id",
        F.col("b.hub_id").alias("hub_id"),
        F.col("b.d2").alias("dist2_udeg"),
    )


@query(
    "geo_bbox_containment",
    oracle=f"""
    WITH u AS (
        SELECT c_custkey AS user_id,
               {_LAT_U.replace("user_id", "c_custkey")} AS lat_u,
               {_LON_U.replace("user_id", "c_custkey")} AS lon_u
        FROM customer
    ),
    h AS (
        SELECT s_suppkey AS hub_id,
               {_LAT_H.replace("hub_id", "s_suppkey")} AS lat_h,
               {_LON_H.replace("hub_id", "s_suppkey")} AS lon_h,
               1000000 + (s_suppkey % 7) * 500000 AS w_lat,
               1000000 + (s_suppkey % 11) * 400000 AS w_lon
        FROM supplier
    )
    SELECT h.hub_id,
           CAST(COUNT(*) AS BIGINT) AS n_inside,
           CAST(SUM(u.user_id % 1000003) AS BIGINT) AS key_checksum
    FROM h JOIN u
      ON abs(u.lat_u - h.lat_h) <= h.w_lat
     AND abs(u.lon_u - h.lon_h) <= h.w_lon
    GROUP BY h.hub_id
    """,
)
def geo_bbox_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D bounding-box containment join (M244): each hub owns a
    rectangle, points fall inside or not — the geofence /
    coverage-count join.  The scalable form: explode each rectangle to
    the exact grid cells it overlaps via sequence() on the covered
    cell range (bounded — half-widths are 0.5-2.5 cells here, so at
    most 6x7 cells per box), equi-join points on the cell key, then
    apply the exact containment predicate and aggregate per hub.  The
    oracle runs the raw theta-join form.

    Exactness: all coordinates, half-widths, counts, and the modular
    key checksum are BIGINTs.  Scale: the exploded rectangle-cell
    table is O(|hubs| * cells-per-box) and broadcasts; points are
    scanned once map-side, and the only shuffle is the final per-hub
    aggregate — the theta join the oracle runs would be |points| x
    |hubs| at 100 TB.
    """
    pts = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.expr(_LAT_U.replace("user_id", "c_custkey")).alias("lat_u"),
        F.expr(_LON_U.replace("user_id", "c_custkey")).alias("lon_u"),
    )
    pts = pts.select(
        "*",
        _fdiv_spark("lat_u", _CELL).alias("cl_lat"),
        _fdiv_spark("lon_u", _CELL).alias("cl_lon"),
    )
    hubs = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("hub_id"),
        F.expr(_LAT_H.replace("hub_id", "s_suppkey")).alias("lat_h"),
        F.expr(_LON_H.replace("hub_id", "s_suppkey")).alias("lon_h"),
        (F.lit(1000000) + (F.col("s_suppkey") % 7) * 500000).alias("w_lat"),
        (F.lit(1000000) + (F.col("s_suppkey") % 11) * 400000).alias("w_lon"),
    )
    cells = (
        hubs.select(
            "*",
            F.explode(
                F.sequence(
                    _fdiv_spark("lat_h - w_lat", _CELL),
                    _fdiv_spark("lat_h + w_lat", _CELL),
                )
            ).alias("cl_lat"),
        )
        .select(
            "*",
            F.explode(
                F.sequence(
                    _fdiv_spark("lon_h - w_lon", _CELL),
                    _fdiv_spark("lon_h + w_lon", _CELL),
                )
            ).alias("cl_lon"),
        )
        .select("hub_id", "lat_h", "lon_h", "w_lat", "w_lon",
                "cl_lat", "cl_lon")
    )
    inside = pts.join(F.broadcast(cells), ["cl_lat", "cl_lon"]).filter(
        (F.abs(F.col("lat_u") - F.col("lat_h")) <= F.col("w_lat"))
        & (F.abs(F.col("lon_u") - F.col("lon_h")) <= F.col("w_lon"))
    )
    return inside.groupBy("hub_id").agg(
        F.count("*").cast("long").alias("n_inside"),
        F.sum(F.col("user_id") % 1000003).cast("long").alias("key_checksum"),
    )


#: Fine grid for the density rollup: 2-degree cells.
_FINE = 2_000_000


@query(
    "geo_grid_density",
    oracle=f"""
    WITH pts AS (
        SELECT event_id, user_id,
               {_LAT_U} AS lat_u,
               {_LON_U} AS lon_u
        FROM events
    ),
    cells AS (
        SELECT event_id, user_id,
               {_fdiv_sql("lat_u", _FINE)} AS fl_lat,
               {_fdiv_sql("lon_u", _FINE)} AS fl_lon
        FROM pts
    ),
    fine AS (
        SELECT event_id, user_id, fl_lat, fl_lon,
               {z_value_sql("(fl_lat + 45)", "(fl_lon + 90)", 8)} AS zfine,
               {_fdiv_sql("fl_lat", 4)} AS co_lat,
               {_fdiv_sql("fl_lon", 4)} AS co_lon
        FROM cells
    ),
    agg AS (
        SELECT co_lat, co_lon,
               {z_value_sql("(co_lat + 12)", "(co_lon + 23)", 6)} AS zcoarse,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(COUNT(DISTINCT zfine) AS BIGINT) AS n_fine_cells
        FROM fine GROUP BY co_lat, co_lon
    )
    SELECT co_lat, co_lon, zcoarse, n_events, n_users, n_fine_cells
    FROM agg
    ORDER BY n_events DESC, zcoarse LIMIT 40
    """,
)
def geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution grid density heatmap (M245): bucket events to
    2-degree fine cells, roll up to 8-degree coarse cells, and report
    the hottest coarse cells with their event/user/fine-cell counts —
    the tile-server aggregation, keyed by the same Morton Z-codes the
    layout family (M100/M225) writes as clustering keys, so a hot
    tile's rows are physically contiguous after a Z-order OPTIMIZE.

    Exactness: cell coordinates via the sign-safe floor-div identity
    (the SCALE.md discipline), Morton codes as the shared
    shift/AND/add term structure (operators/layout.py) — all BIGINT.
    Scale: one map-side projection + one grouped aggregate over
    O(coarse cells) groups; the two distincts expand to the standard
    two-level partial aggregate, no joins, no windows.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    pts = ev.select(
        "event_id",
        "user_id",
        F.expr(_LAT_U).alias("lat_u"),
        F.expr(_LON_U).alias("lon_u"),
    )
    fine = pts.select(
        "event_id",
        "user_id",
        _fdiv_spark("lat_u", _FINE).alias("fl_lat"),
        _fdiv_spark("lon_u", _FINE).alias("fl_lon"),
    ).select(
        "event_id",
        "user_id",
        z_value_expr("(fl_lat + 45)", "(fl_lon + 90)", 8).alias("zfine"),
        _fdiv_spark("fl_lat", 4).alias("co_lat"),
        _fdiv_spark("fl_lon", 4).alias("co_lon"),
    )
    agg = fine.groupBy("co_lat", "co_lon").agg(
        F.count("*").cast("long").alias("n_events"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.count_distinct("zfine").cast("long").alias("n_fine_cells"),
    )
    return (
        agg.select(
            "co_lat",
            "co_lon",
            z_value_expr("(co_lat + 12)", "(co_lon + 23)", 6).alias(
                "zcoarse"
            ),
            "n_events",
            "n_users",
            "n_fine_cells",
        )
        .orderBy(F.desc("n_events"), "zcoarse")
        .limit(40)
    )


#: Convex test polygon (micro-degrees), counter-clockwise: a quad
#: covering a mid-latitude band.  Literal vertices shared verbatim by
#: both engines.
_QUAD = (
    (-60_000_000, -120_000_000),
    (50_000_000, -100_000_000),
    (70_000_000, 110_000_000),
    (-40_000_000, 130_000_000),
)


@query(
    "geo_convex_contains",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS user_id,
               {_LAT_U.replace("user_id", "c_custkey")} AS lat_u,
               {_LON_U.replace("user_id", "c_custkey")} AS lon_u
        FROM customer
    ),
    signs AS (
        SELECT user_id,
               CASE WHEN
                 (CAST({_QUAD[1][0]} - {_QUAD[0][0]} AS HUGEINT))
                   * (lon_u - {_QUAD[0][1]})
                 - (CAST({_QUAD[1][1]} - {_QUAD[0][1]} AS HUGEINT))
                   * (lat_u - {_QUAD[0][0]}) >= 0
                AND
                 (CAST({_QUAD[2][0]} - {_QUAD[1][0]} AS HUGEINT))
                   * (lon_u - {_QUAD[1][1]})
                 - (CAST({_QUAD[2][1]} - {_QUAD[1][1]} AS HUGEINT))
                   * (lat_u - {_QUAD[1][0]}) >= 0
                AND
                 (CAST({_QUAD[3][0]} - {_QUAD[2][0]} AS HUGEINT))
                   * (lon_u - {_QUAD[2][1]})
                 - (CAST({_QUAD[3][1]} - {_QUAD[2][1]} AS HUGEINT))
                   * (lat_u - {_QUAD[2][0]}) >= 0
                AND
                 (CAST({_QUAD[0][0]} - {_QUAD[3][0]} AS HUGEINT))
                   * (lon_u - {_QUAD[3][1]})
                 - (CAST({_QUAD[0][1]} - {_QUAD[3][1]} AS HUGEINT))
                   * (lat_u - {_QUAD[3][0]}) >= 0
               THEN 1 ELSE 0 END AS inside
        FROM pts
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(inside) AS BIGINT) AS n_inside,
           CAST(SUM(CASE WHEN inside = 1 THEN user_id ELSE 0 END)
                AS BIGINT) AS inside_key_checksum
    FROM signs
    """,
)
def geo_convex_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convex-polygon containment (M334): count points inside a
    convex quad by the half-plane sign test — every edge's cross
    product (v_{i+1}−v_i) × (p−v_i) must be non-negative for a CCW
    polygon — extending the geo family's axis-aligned boxes
    (`geo_bbox_containment`) to arbitrary convex regions
    (geofences, delivery zones, coverage polygons) with ZERO new
    machinery: the test is four codegen'd integer sign checks, no
    trigonometry, no geometry library.

    Exactness: coordinates are the family's exact integer
    micro-degrees; each cross product is exact HUGEINT/DECIMAL
    (coordinate differences reach 2.5e8; products 6e16 > int64-safe
    only barely — widened deliberately); the boundary convention
    (≥ 0: on-edge counts as inside) is explicit and identical.
    The inside-key checksum rides in the hash so a single
    misclassified point is a value mismatch.

    Scale: map-only — the predicate fuses into the scan; at 100 TB
    the grid-cell prefilter of `geo_nearest_hub` would bound
    candidates first and this test runs only on the cell survivors.
    """
    dec = "decimal(38,0)"
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("user_id"),
        F.expr(_LAT_U.replace("user_id", "c_custkey")).alias("lat_u"),
        F.expr(_LON_U.replace("user_id", "c_custkey")).alias("lon_u"),
    )
    conds = []
    n = len(_QUAD)
    for i in range(n):
        (x0, y0), (x1, y1) = _QUAD[i], _QUAD[(i + 1) % n]
        cross = F.expr(
            f"CAST({x1 - x0} AS {dec}) * (lon_u - {y0})"
            f" - CAST({y1 - y0} AS {dec}) * (lat_u - {x0})"
        )
        conds.append(cross >= 0)
    inside = F.when(
        conds[0] & conds[1] & conds[2] & conds[3], 1
    ).otherwise(0)
    signs = pts.select("user_id", inside.alias("inside"))
    return signs.agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum("inside").cast("long").alias("n_inside"),
        F.sum(
            F.when(F.col("inside") == 1, F.col("user_id")).otherwise(0)
        )
        .cast("long")
        .alias("inside_key_checksum"),
    )
