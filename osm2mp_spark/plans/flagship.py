"""Flagship pipeline — the minimum end-to-end slice (SURVEY §7.1.3):

    points → JVM cell-encode → broadcast PIP join (city, holes, canonical
    overlap rule) → kNN nearest-city fallback for uncontained points →
    BSP tile assignment → per-tile stats

This exercises scan, whole-stage-codegen cell encode, broadcast hash join,
Arrow refine UDF, broadcast KD/min_by kNN, broadcast BSP descent, and one
aggregation — the full skeleton of the 100 TB job. The only wide shuffles
are the smallest-wins aggregation and the final per-tile count, both
map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.knn import knn_bruteforce
from ..operators.pip_join import pip_join
from ..operators.tiles import assign_tiles_bsp, assign_tiles_grid
from ..sources.layers import CITIES, city_polygons
from ..sources.points import derived_points_np, with_derived_position
from ..spatial.bsp import build_bsp_tiles
from ..spatial.index import PolygonIndex


def flagship(
    spark: SparkSession,
    sf_dir: str,
    use_bsp: bool = True,
    max_tile_nodes: int | None = None,
) -> DataFrame:
    """Run the flagship over customer-derived points of `sf_dir`.

    Returns one row per point: (point_id, lon, lat, city_id, is_fallback,
    tile_id). city_id is the containing city (smallest-wins) or the kNN
    nearest city for uncontained points (is_fallback = true).
    """
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").cast("bigint").alias("point_id")
    )
    pts = with_derived_position(cust, "point_id")

    idx = PolygonIndex(city_polygons())
    contained = pip_join(pts, idx, how="smallest", area_col="city_id")

    outs = pts.join(contained.select("point_id"), "point_id", "left_anti")
    anchors = [(c["area_id"], c["center"][0], c["center"][1]) for c in CITIES]
    fallback = knn_bruteforce(outs, anchors, out_id="city_id").drop("dist_sq")

    unioned = contained.withColumn("is_fallback", F.lit(False)).unionByName(
        fallback.withColumn("is_fallback", F.lit(True))
    )

    if use_bsp:
        # build the BSP on the deterministic position generator (driver-side
        # histogram — tiny), then broadcast-descend per row
        import numpy as np

        n = cust.count()
        keys = np.arange(1, n + 1)
        lons, lats = derived_points_np(keys)
        tree = build_bsp_tiles(
            lons, lats, max_tile_nodes=max_tile_nodes or max(64, n // 64)
        )
        return assign_tiles_bsp(unioned, tree)
    return assign_tiles_grid(unioned)
