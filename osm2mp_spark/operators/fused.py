"""Fused spatial kernel: PIP smallest-wins resolve + BSP tile descent in ONE
Arrow pass.

The flagship's two Python stages (containment, tiling) each pay an Arrow
serialize → Python → deserialize round-trip over the full point stream; in
local mode the Python workers also contend with JVM task threads for the
same cores. Fusing them halves the Arrow traffic and the worker passes —
the classic operator-fusion move, done at the UDF level because Catalyst
can't fuse across two Python evaluations.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..spatial.bsp import BSPTileTree
from ..spatial.index import PolygonIndex
from .pip_join import _area_ranks


def pip_bsp_fused(
    df: DataFrame,
    index: PolygonIndex,
    tree: BSPTileTree,
    lon: str = "lon",
    lat: str = "lat",
    area_col: str = "area_id",
    tile_col: str = "tile_id",
) -> DataFrame:
    """df + (area_col nullable, tile_col) in a single vectorized UDF."""
    spark = df.sparkSession
    from ..shipping import ensure_shipped

    ensure_shipped(spark)
    grids = dense_mask_grids(index)
    b = spark.sparkContext.broadcast((index, grids, tree))

    @F.pandas_udf(f"struct<{area_col}:string, {tile_col}:int>")
    def _fused(lon_s: pd.Series, lat_s: pd.Series) -> pd.DataFrame:
        import numpy as np

        idx_b, (cgrid, fgrid, aids, level), tree_b = b.value
        lons = lon_s.to_numpy(dtype=float)
        lats = lat_s.to_numpy(dtype=float)
        out = _resolve_masks(idx_b, cgrid, fgrid, aids, level, lons, lats)
        tiles = tree_b.assign(lons, lats)
        return pd.DataFrame({area_col: out, tile_col: tiles})

    out_df = df.withColumn("__f", _fused(F.col(lon), F.col(lat)))
    return (
        out_df.withColumn(area_col, F.col(f"__f.{area_col}"))
        .withColumn(tile_col, F.col(f"__f.{tile_col}"))
        .drop("__f")
    )


def dense_mask_grids(index: PolygonIndex):
    """Dense (2^level)² int64 candidate/full bitmask grids — the UDF then
    resolves cells with two numpy gathers instead of per-row dict lookups
    (which were the profiled bottleneck at 40M rows)."""
    import numpy as np

    ranks = _area_ranks(index)
    if len(ranks) > 64:
        raise NotImplementedError("bitmask fast path supports ≤64 polygons")
    rank_to_aid = [a for a, _ in sorted(ranks.items(), key=lambda kv: kv[1])]
    level = index.level
    n = 1 << level
    cgrid = np.zeros(n * n, dtype=np.int64)
    fgrid = np.zeros(n * n, dtype=np.int64)
    from ..geometry.cells import cell_bounds

    for cell, aid, full in index.entries():
        minlon, minlat, _, _ = cell_bounds(int(cell))
        ix = int((minlon + 180.0) / 360.0 * n + 1e-9)
        iy = int((minlat + 90.0) / 180.0 * n + 1e-9)
        pos = iy * n + ix
        bit = np.int64(1) << np.int64(ranks[aid])
        cgrid[pos] |= bit
        if full:
            fgrid[pos] |= bit
    return cgrid, fgrid, rank_to_aid, level


def _resolve_masks(index, cgrid, fgrid, aids, level, lons, lats):
    """Vectorized smallest-wins resolve over dense mask grids."""
    import numpy as np

    # same ops as geometry.cells.cell_ixiy — boundary points must land in
    # the same cell the index cover used
    n = 1 << level
    ix = np.clip(np.floor((lons + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    iy = np.clip(np.floor((lats + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    pos = iy * n + ix
    cmask = cgrid[pos]
    fmask = fgrid[pos]
    out = np.full(len(pos), None, dtype=object)
    unresolved = cmask != 0
    for r, aid in enumerate(aids):
        if not unresolved.any():
            break
        bit = np.int64(1) << np.int64(r)
        has = unresolved & ((cmask & bit) != 0)
        if not has.any():
            continue
        full_hit = has & ((fmask & bit) != 0)
        out[full_hit] = aid
        unresolved &= ~full_hit
        rest = np.where(has & ~full_hit)[0]
        if len(rest):
            res = index.refine(lons[rest], lats[rest], aid)
            hit = rest[res >= 0]
            out[hit] = aid
            unresolved[hit] = False
    return out
