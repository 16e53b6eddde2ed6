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
from ..operators.coastlines import synthesize_water
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


@register("sea_synthesis")
def sea_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G10-G12 — deterministic coastline set against the map boundary:
    stitching, sea closure along the perimeter, lake/island nesting.
    Driver-side kernel (geometry is dimension-scale), DataFrame out."""
    bbox = (-90.0, -45.0, 90.0, 45.0)
    chains = {
        # two arcs that stitch into one crossing coastline
        "c1": [(-100.0, 10.0), (-50.0, 5.0), (0.0, 0.0)],
        "c2": [(0.0, 0.0), (50.0, -5.0), (100.0, -10.0)],
        # a second independent crossing coastline
        "c3": [(-100.0, -30.0), (0.0, -35.0), (100.0, -40.0)],
        # closed lake (CW) with an island (CCW) inside
        "lake": [(10.0, 20.0), (10.0, 30.0), (30.0, 30.0), (30.0, 20.0), (10.0, 20.0)],
        "isle": [(15.0, 24.0), (25.0, 24.0), (25.0, 26.0), (15.0, 26.0), (15.0, 24.0)],
    }
    water = synthesize_water(chains, bbox)
    rows = []
    for i, ring in enumerate(water["seas"]):
        rows.append(("sea", i, len(ring), ring[0][0], ring[0][1]))
    for i, lk in enumerate(water["lakes"]):
        rows.append(("lake", i, len(lk["ring"]), lk["ring"][0][0], lk["ring"][0][1]))
        for j, isl in enumerate(lk["islands"]):
            rows.append(("island", i * 100 + j, len(isl), isl[0][0], isl[0][1]))
    for i, isl in enumerate(water["free_islands"]):
        rows.append(("free_island", i, len(isl), isl[0][0], isl[0][1]))
    return spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["kind", "idx", "n_pts", "start_lon", "start_lat"]
        )
    )


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
