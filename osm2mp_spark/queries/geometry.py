"""Non-SQL-expressible geometry/graph queries (driver gate: rows-only;
exact semantics are pytest-verified against the pure-Python oracle in
osm2mp_spark.oracle.reference).

- ring_assembly        G1  multipolygon stitching (applyInPandas per relation)
- self_intersect_split W1  per-chain stateful splitting (applyInPandas)
- road_merge           I1  fixpoint merge via functionalized successor graph
                           + pointer-doubling label propagation
- sea_synthesis        G10-G12 coastline closure against the map boundary
- bsp_tiles            I3  skew-aware BSP tile build + per-tile counts
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.chains import merge_roads, split_self_intersections
from ..operators.rings import assemble_rings
from ..operators.tiles import assign_tiles_bsp
from ..sources.points import derived_lat_sql, derived_lon_sql
from . import register


@register("ring_assembly")
def ring_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 — one hexagon relation per sampled order, delivered as 3 arcs with
    the middle arc REVERSED (tests reversed-member stitching); every 17th
    relation is broken (one arc dropped → whole relation skipped,
    lib/OSM.pm:186). Output: closed rings with vertex counts."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter("o_orderkey % 10 = 0")
    hexpt = (
        "transform(sequence(0, 6), i -> struct("
        f"  {derived_lon_sql('o_orderkey')} + cos(radians(i * 60.0)) AS lon,"
        f"  {derived_lat_sql('o_orderkey')} + sin(radians(i * 60.0)) AS lat))"
    )
    ways = o.selectExpr(
        "CAST(o_orderkey AS STRING) AS rel_id",
        f"{hexpt} AS hex",
        "o_orderkey % 17 = 0 AS broken",
    ).selectExpr(
        "rel_id",
        "broken",
        "array("
        " struct('w1' AS way_id, 'outer' AS role, 1 AS seq, slice(hex, 1, 3) AS chain),"
        " struct('w2' AS way_id, 'outer' AS role, 2 AS seq, reverse(slice(hex, 3, 3)) AS chain),"
        " struct('w3' AS way_id, 'outer' AS role, 3 AS seq, slice(hex, 5, 3) AS chain)"
        ") AS members",
    ).select(
        "rel_id", "broken", F.explode("members").alias("m")
    ).filter(
        # broken relations lose their middle arc
        ~(F.col("broken") & (F.col("m.seq") == 2))
    ).select(
        "rel_id",
        F.col("m.way_id").alias("way_id"),
        F.col("m.role").alias("role"),
        F.col("m.seq").alias("seq"),
        F.col("m.chain").alias("chain"),
    )
    rings = assemble_rings(ways)
    return rings.select(
        F.col("rel_id").cast("bigint").alias("rel_id"),
        "ring_no",
        "is_inner",
        F.size("pts").alias("n_pts"),
        F.element_at("pts", 1)["lon"].alias("start_lon"),
    )


@register("self_intersect_split")
def self_intersect_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — lineitem chains with low-cardinality vertex positions
    (l_partkey mod 7) so vertices repeat within chains; per-chain
    applyInPandas splitting."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pts = li.selectExpr(
        "CAST(l_orderkey AS BIGINT) AS chain_id",
        __import__("osm2mp_spark.sources.points",
                   fromlist=["LINEITEM_SEQ_SQL"]).LINEITEM_SEQ_SQL + " AS seq",
        f"{derived_lon_sql('l_partkey % 7')} AS lon",
        f"{derived_lat_sql('l_partkey % 7')} AS lat",
    )
    return split_self_intersections(pts)


# concave L-shaped map region with one hole — spans the derived-point
# domain; shared by the G3 queries and their oracles
CONCAVE_OUTER = [
    (-180.0, -85.0), (180.0, -85.0), (180.0, 0.0), (0.0, 0.0),
    (0.0, 85.0), (-180.0, 85.0),
]
CONCAVE_HOLE = [(-90.0, -45.0), (-30.0, -45.0), (-30.0, -20.0), (-90.0, -20.0)]


@register("clip_polygons_concave")
def clip_polygons_concave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 — hexagon polygons (radius 2°, centered at derived positions)
    clipped to the concave L-region with a hole via the Greiner–Hormann
    kernel (GPC INTERSECT parity, lib/Clipper.pm:16-43). mapInPandas,
    zero shuffle; pytest holds the kernel to hand-computed fixtures."""
    import math

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").cast("bigint").alias("poly_id")
    )
    from ..operators.clip import clip_polygons_to_region
    from ..sources.points import with_derived_position

    pts = with_derived_position(cust, "poly_id")
    hexes = pts.select(
        "poly_id",
        F.expr(
            "transform(sequence(0, 5), i -> struct("
            "lon + 2.0 * cos(radians(i * 60.0 + 10.0)) AS lon, "
            "lat + 2.0 * sin(radians(i * 60.0 + 10.0)) AS lat))"
        ).alias("ring"),
    )
    return clip_polygons_to_region(hexes, CONCAVE_OUTER, [CONCAVE_HOLE])


@register("road_merge")
def road_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1 — two-vertex roads over a 300-node universe (shared endpoints →
    real merge graph with contention); fixpoint label propagation. Output:
    (road_id, head_id) + per-head merged sizes."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    roads = o.selectExpr(
        "CAST(o_orderkey AS BIGINT) AS road_id",
        "o_orderpriority AS attrs",
        "array("
        f" struct({derived_lon_sql('o_orderkey % 300')} AS lon,"
        f"        {derived_lat_sql('o_orderkey % 300')} AS lat),"
        f" struct({derived_lon_sql('(o_orderkey + 1) % 300')} AS lon,"
        f"        {derived_lat_sql('(o_orderkey + 1) % 300')} AS lat)"
        ") AS chain",
    )
    labels = merge_roads(roads)
    sizes = labels.groupBy("head_id").agg(F.count("*").alias("chain_len"))
    return labels.join(sizes, "head_id").select("road_id", "head_id", "chain_len")


def sea_chain_vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sf-scaling coastline set derived from orders:
    - every 20th order → an OPEN 5-vertex coastline heading east from its
      derived position (6°/step, ±1.5° deterministic wiggle);
    - every 50th order → a closed CW 2°×2° lake;
    - every 100th order → a CCW 1°×1° island inside that lake.
    Output vertex rows (chain_id, seq, lon, lat, closed)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.selectExpr(
        "CAST(o_orderkey AS BIGINT) AS okey",
        f"{derived_lon_sql('o_orderkey')} AS lon0",
        f"{derived_lat_sql('o_orderkey')} AS lat0",
    )
    coast = base.filter("okey % 20 = 0").select(
        F.expr("okey * 10").alias("chain_id"),
        F.posexplode(
            F.expr(
                "transform(sequence(0, 4), i -> struct("
                "  least(lon0 + i * 6.0, 179.9) AS lon,"
                "  greatest(least(lat0 + (okey * (i + 1)) % 7 * 0.5 - 1.5,"
                "           84.9), -84.9) AS lat))"
            )
        ).alias("seq", "p"),
        F.lit(False).alias("closed"),
    ).select("chain_id", "seq", "p.lon", "p.lat", "closed")
    def _closed_ring(suffix: int, dxs: str, dys: str):
        return base.filter(
            f"okey % {50 if suffix == 1 else 100} = 0"
        ).select(
            F.expr(f"okey * 10 + {suffix}").alias("chain_id"),
            F.posexplode(
                F.expr(
                    "transform(sequence(0, 4), i -> struct("
                    f"  least(lon0, 177.0) + element_at(array({dxs}), i + 1) AS lon,"
                    f"  least(lat0, 82.0) + element_at(array({dys}), i + 1) AS lat))"
                )
            ).alias("seq", "p"),
            F.lit(True).alias("closed"),
        ).select("chain_id", "seq", "p.lon", "p.lat", "closed")

    # lake: CW 2°×2° rectangle; island: CCW 1°×1° inside it
    lake = _closed_ring(1, "0.0D, 0.0D, 2.0D, 2.0D, 0.0D",
                        "0.0D, 2.0D, 2.0D, 0.0D, 0.0D")
    isle = _closed_ring(2, "0.5D, 1.5D, 1.5D, 0.5D, 0.5D",
                        "0.5D, 0.5D, 1.5D, 1.5D, 0.5D")
    return coast.unionByName(lake).unionByName(isle)


@register("sea_synthesis")
def sea_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G10-G12 at scale — sf-scaling coastline chains synthesized from
    orders, water synthesis run PER TILE inside applyInPandas against each
    tile's own bbox (the per-tile path lib/Coastlines.pm runs per map).
    Open chains replicate to every tile they touch (closure — the crossing
    math needs the outside vertices); closed rings go to their first
    vertex's tile. Geometry never shuffles except the one tile grouping."""
    from ..operators.coastlines import synthesize_water_per_tile
    from ..operators.tiles import assign_tiles_grid

    pts = sea_chain_vertices(spark, sf_dir)
    tiled = assign_tiles_grid(pts, nx=8, ny=8)
    # open chains replicate to every tile any SEGMENT touches — a segment
    # can cross a tile containing neither endpoint (corner-to-corner), so
    # vertex tiles alone under-replicate. Tile set per segment = all grid
    # cells overlapping the segment bbox (a safe over-approximation:
    # a chain clipped against a tile it doesn't enter yields no runs).
    from pyspark.sql import Window as _W

    w = _W.partitionBy("chain_id").orderBy("seq")
    segs = (
        pts.filter(~F.col("closed"))
        .withColumn("lon2", F.lead("lon").over(w))
        .withColumn("lat2", F.lead("lat").over(w))
        .filter(F.col("lon2").isNotNull())
    )

    def _ti(c: str, lo: float, width: float, n: int) -> str:
        return (
            f"LEAST({n - 1}, GREATEST(0, "
            f"CAST(FLOOR(({c} - {lo!r}) / {width!r}) AS INT)))"
        )

    open_tiles = (
        segs.selectExpr(
            "chain_id",
            f"{_ti('least(lon, lon2)', -180.0, 45.0, 8)} AS ix0",
            f"{_ti('greatest(lon, lon2)', -180.0, 45.0, 8)} AS ix1",
            f"{_ti('least(lat, lat2)', -90.0, 22.5, 8)} AS iy0",
            f"{_ti('greatest(lat, lat2)', -90.0, 22.5, 8)} AS iy1",
        )
        .select(
            "chain_id",
            F.explode(F.expr("sequence(ix0, ix1)")).alias("ix"),
            F.col("iy0"),
            F.col("iy1"),
        )
        .select(
            "chain_id",
            "ix",
            F.explode(F.expr("sequence(iy0, iy1)")).alias("iy"),
        )
        .selectExpr("chain_id", "CAST(iy * 8 + ix AS INT) AS tile_id")
        .distinct()
    )
    closed_tiles = (
        tiled.filter(F.col("closed") & (F.col("seq") == 0))
        .select("chain_id", "tile_id")
    )
    chain_tiles = open_tiles.unionByName(closed_tiles)
    full = pts.join(chain_tiles, "chain_id").select(
        "tile_id", "chain_id", "seq", "lon", "lat"
    )
    return synthesize_water_per_tile(full, nx=8, ny=8)


@register("bsp_tiles")
def bsp_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3/J13 — build the BSP tile tree from the SPARK A4 density histogram
    (√count-weighted splits over cell counts; the driver sees O(cells),
    never raw points — _old/splitter.pl:104-143), broadcast it, assign
    every customer point, count per tile. Byte-identical at any
    parallelism (BASELINE.md determinism check)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").cast("bigint").alias("point_id")
    )
    from ..operators.tiles import build_bsp_tiles_spark
    from ..sources.points import with_derived_position

    pts = with_derived_position(cust, "point_id")
    tree = build_bsp_tiles_spark(pts, nodes_per_tile_frac=32, min_tile_nodes=32)
    return (
        assign_tiles_bsp(pts, tree)
        .groupBy("tile_id")
        .agg(F.count("*").alias("n_points"), F.min("point_id").alias("min_point"))
    )


# ---------------------------------------------------------------------------
# G6: generic contour-group nesting (osm2mp.pl:1752-1764)
# ---------------------------------------------------------------------------

@register(
    "contour_nesting",
    oracle=f"""
WITH base AS (
  SELECT CAST(o_orderkey AS BIGINT) AS rel_id, o_orderkey AS okey
  FROM orders WHERE o_orderkey % 4 = 0)
SELECT rel_id, CAST(0 AS INT) AS contour_no, CAST(0 AS INT) AS polygon_no,
       FALSE AS is_inner FROM base
UNION ALL
SELECT rel_id, 1, 0, TRUE FROM base WHERE okey % 2 = 0
UNION ALL
SELECT rel_id, 2, 0, TRUE FROM base WHERE okey % 3 = 0
UNION ALL
SELECT rel_id, 3, 1, FALSE FROM base WHERE okey % 5 = 0
""",
)
def contour_nesting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6 — generic contour-group nesting (osm2mp.pl:1752-1764): the first
    remaining contour opens a polygon; later contours whose first vertex
    lies inside it become its inner rings; non-contained contours open the
    next polygon. Spark side runs the GENERIC per-relation kernel
    (grouped_map_in_pandas); the oracle is the hand-specified grouping of
    the synthetic contour sets (big square + up to two contained inners +
    one disjoint square)."""
    from ..operators.rings import nest_contours

    def square(fx: str, fy: str, s: float) -> str:
        corners = [
            (fx, fy),
            (f"{fx} + {s}", fy),
            (f"{fx} + {s}", f"{fy} + {s}"),
            (fx, f"{fy} + {s}"),
            (fx, fy),
        ]
        return "array(" + ", ".join(
            f"struct({x} AS lon, {y} AS lat)" for x, y in corners
        ) + ")"

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        "o_orderkey % 4 = 0"
    )
    base = o.selectExpr(
        "CAST(o_orderkey AS BIGINT) AS rel_id",
        "o_orderkey AS okey",
        f"least(greatest({derived_lon_sql('o_orderkey')}, -170.0), 160.0) AS lon0",
        f"least(greatest({derived_lat_sql('o_orderkey')}, -75.0), 75.0) AS lat0",
    )
    c0 = base.selectExpr(
        "rel_id", "CAST(0 AS INT) AS contour_no",
        square("(lon0 - 3.0)", "(lat0 - 3.0)", 6.0) + " AS ring",
    )
    c1 = base.filter("okey % 2 = 0").selectExpr(
        "rel_id", "CAST(1 AS INT) AS contour_no",
        square("(lon0 - 1.5)", "(lat0 - 0.5)", 1.0) + " AS ring",
    )
    c2 = base.filter("okey % 3 = 0").selectExpr(
        "rel_id", "CAST(2 AS INT) AS contour_no",
        square("(lon0 + 0.5)", "(lat0 - 0.5)", 1.0) + " AS ring",
    )
    c3 = base.filter("okey % 5 = 0").selectExpr(
        "rel_id", "CAST(3 AS INT) AS contour_no",
        square("(lon0 + 5.0)", "(lat0 - 0.5)", 1.0) + " AS ring",
    )
    contours = c0.unionByName(c1).unionByName(c2).unionByName(c3)
    return nest_contours(contours)
