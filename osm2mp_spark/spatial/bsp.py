"""Recursive BSP tile partitioner — the engine's skew-aware tiler.

Re-expresses the reference splitter's semantics (`_old/splitter.pl`):

  1. density histogram over fixed cells (0.02° lat × 0.04° lon,
     splitter.pl:15-16,104-143) — in Spark this is a groupBy hash agg (A4);
  2. while any tile holds more than `max_tile_nodes` points: split it along
     the √(cell count)-weighted centroid (splitter.pl:226-247), axis chosen
     by lat-corrected aspect ratio (:226-227), optional bbox shrink to the
     occupied cells (:278-294);
  3. tiles ordered by (minlon asc, minlat desc) (:299).

The histogram is tiny (driver-side numpy); the resulting tile tree is
broadcast, and per-row assignment is an O(depth) binary descent inside a
pandas UDF — no join at all (SURVEY J13). This doubles as the salt-factor
source for skewed-cell repartitioning (SURVEY §4).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

LAT_CELL = 0.02
LON_CELL = 0.04
_OFF = 1_000_000
_MOD = 2_000_000


def density_histogram(
    lons: np.ndarray,
    lats: np.ndarray,
    lat_cell: float = LAT_CELL,
    lon_cell: float = LON_CELL,
):
    """(cell_ix, cell_iy, count) arrays — the A4 aggregation, driver-side
    variant for oracle/tests. The Spark variant is groupBy(floor(lat/c)...)."""
    ix = np.floor(np.asarray(lons) / lon_cell).astype(np.int64)
    iy = np.floor(np.asarray(lats) / lat_cell).astype(np.int64)
    # offset before packing so negative indices survive the decode
    key = (ix + _OFF) * _MOD + (iy + _OFF)
    uniq, counts = np.unique(key, return_counts=True)
    return uniq // _MOD - _OFF, uniq % _MOD - _OFF, counts


@dataclass
class _Node:
    minlon: float
    minlat: float
    maxlon: float
    maxlat: float
    # internal node: split axis + value + children; leaf: tile_id
    axis: int = -1  # 0 = split on lon, 1 = split on lat, -1 = leaf
    value: float = 0.0
    left: "_Node | None" = None
    right: "_Node | None" = None
    tile_id: int = -1


class BSPTileTree:
    """Flattened BSP tree, cheap to broadcast & descend vectorized."""

    def __init__(self, root: _Node):
        self.root = root
        # flatten to arrays for vectorized descent
        nodes: list[_Node] = []

        def collect(n: _Node) -> int:
            idx = len(nodes)
            nodes.append(n)
            if n.axis >= 0:
                n._li = collect(n.left)  # type: ignore[attr-defined]
                n._ri = collect(n.right)  # type: ignore[attr-defined]
            return idx

        collect(root)
        m = len(nodes)
        self.axis = np.full(m, -1, dtype=np.int8)
        self.value = np.zeros(m, dtype=np.float64)
        self.left = np.zeros(m, dtype=np.int32)
        self.right = np.zeros(m, dtype=np.int32)
        self.tile_id = np.full(m, -1, dtype=np.int32)
        for i, n in enumerate(nodes):
            self.axis[i] = n.axis
            self.value[i] = n.value
            self.tile_id[i] = n.tile_id
            if n.axis >= 0:
                self.left[i] = n._li  # type: ignore[attr-defined]
                self.right[i] = n._ri  # type: ignore[attr-defined]

    def assign(self, lons: np.ndarray, lats: np.ndarray) -> np.ndarray:
        """Vectorized descent: tile id per point (O(depth) passes)."""
        lons = np.asarray(lons, dtype=np.float64)
        lats = np.asarray(lats, dtype=np.float64)
        cur = np.zeros(lons.shape, dtype=np.int32)
        while True:
            ax = self.axis[cur]
            active = ax >= 0
            if not active.any():
                break
            coord = np.where(ax == 0, lons, lats)
            go_right = coord >= self.value[cur]
            nxt = np.where(go_right, self.right[cur], self.left[cur])
            cur = np.where(active, nxt, cur).astype(np.int32)
        return self.tile_id[cur]

    def leaves(self) -> list[tuple[int, float, float, float, float]]:
        """(tile_id, minlon, minlat, maxlon, maxlat), ordered by
        (minlon asc, minlat desc) — splitter.pl:299 output order."""
        out = []

        def walk(n: _Node):
            if n.axis < 0:
                out.append((n.tile_id, n.minlon, n.minlat, n.maxlon, n.maxlat))
            else:
                walk(n.left)
                walk(n.right)

        walk(self.root)
        out.sort(key=lambda t: (t[1], -t[2]))
        return out


def build_bsp_tiles(
    lons: np.ndarray,
    lats: np.ndarray,
    max_tile_nodes: int,
    lat_cell: float = LAT_CELL,
    lon_cell: float = LON_CELL,
    shrink: bool = True,
) -> BSPTileTree:
    """Raw-point convenience wrapper for tests/oracles: histogram the points
    driver-side, then delegate to `build_bsp_tiles_from_histogram`. At scale
    the histogram comes from Spark (A4 aggregation) — never materialize raw
    points on the driver; see operators.tiles.build_bsp_tiles_spark."""
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    ix = np.floor(lons / lon_cell).astype(np.int64)
    iy = np.floor(lats / lat_cell).astype(np.int64)
    key = (ix + _OFF) * _MOD + (iy + _OFF)
    uniq, counts = np.unique(key, return_counts=True)
    bbox = (
        float(lons.min()) if len(lons) else -180.0,
        float(lats.min()) if len(lats) else -90.0,
        float(lons.max()) if len(lons) else 180.0,
        float(lats.max()) if len(lats) else 90.0,
    )
    return build_bsp_tiles_from_histogram(
        uniq // _MOD - _OFF,
        uniq % _MOD - _OFF,
        counts,
        max_tile_nodes,
        lat_cell=lat_cell,
        lon_cell=lon_cell,
        shrink=shrink,
        bbox=bbox,
    )


def build_bsp_tiles_from_histogram(
    cell_ix: np.ndarray,
    cell_iy: np.ndarray,
    cell_counts: np.ndarray,
    max_tile_nodes: int,
    lat_cell: float = LAT_CELL,
    lon_cell: float = LON_CELL,
    shrink: bool = True,
    bbox: tuple[float, float, float, float] | None = None,
) -> BSPTileTree:
    """Driver-side recursive BSP over a density histogram — the scale path
    (_old/splitter.pl:104-143,208-301: histogram → recursive split). The
    input is O(occupied cells), never O(points): at 10^12 rows the Spark A4
    aggregation reduces to at most 180/lon_cell × 170/lat_cell cells.

    Deterministic: cells are processed in sorted (ix, iy) order; ties in the
    weighted centroid resolve by cell order. Split value snaps to cell edges
    (the reference splits on the histogram grid). `bbox` (raw point extent,
    from a Spark min/max agg) only tightens the root box; split values —
    hence tile assignment — depend on cell edges alone."""
    order = np.lexsort((np.asarray(cell_iy), np.asarray(cell_ix)))
    cx = np.asarray(cell_ix, dtype=np.float64)[order]
    cy = np.asarray(cell_iy, dtype=np.float64)[order]
    counts = np.asarray(cell_counts, dtype=np.int64)[order]
    if bbox is None:
        bbox = (
            float(cx.min()) * lon_cell if len(cx) else -180.0,
            float(cy.min()) * lat_cell if len(cy) else -90.0,
            (float(cx.max()) + 1) * lon_cell if len(cx) else 180.0,
            (float(cy.max()) + 1) * lat_cell if len(cy) else 90.0,
        )

    next_id = [0]

    def split(mask: np.ndarray, bbox) -> _Node:
        total = int(counts[mask].sum())
        minlon, minlat, maxlon, maxlat = bbox
        if shrink and mask.any():
            # shrink bbox to occupied cells (splitter.pl:278-294)
            minlon = max(minlon, float(cx[mask].min()) * lon_cell)
            maxlon = min(maxlon, (float(cx[mask].max()) + 1) * lon_cell)
            minlat = max(minlat, float(cy[mask].min()) * lat_cell)
            maxlat = min(maxlat, (float(cy[mask].max()) + 1) * lat_cell)
        if total <= max_tile_nodes or mask.sum() <= 1:
            n = _Node(minlon, minlat, maxlon, maxlat, tile_id=next_id[0])
            next_id[0] += 1
            return n
        w = np.sqrt(counts[mask].astype(np.float64))
        avglon = float((w * (cx[mask] + 0.5) * lon_cell).sum() / w.sum())
        avglat = float((w * (cy[mask] + 0.5) * lat_cell).sum() / w.sum())
        # axis by lat-corrected aspect ratio (splitter.pl:226-227)
        midlat = (minlat + maxlat) / 2.0
        width = (maxlon - minlon) * np.cos(np.radians(midlat))
        height = maxlat - minlat
        axis = 0 if width >= height else 1
        if axis == 0:
            sv = np.floor(avglon / lon_cell) * lon_cell
            if sv <= minlon or sv >= maxlon:
                sv = np.floor((minlon + maxlon) / 2.0 / lon_cell) * lon_cell
            lm = mask & (cx * lon_cell < sv)
        else:
            sv = np.floor(avglat / lat_cell) * lat_cell
            if sv <= minlat or sv >= maxlat:
                sv = np.floor((minlat + maxlat) / 2.0 / lat_cell) * lat_cell
            lm = mask & (cy * lat_cell < sv)
        rm = mask & ~lm
        if not lm.any() or not rm.any():
            n = _Node(minlon, minlat, maxlon, maxlat, tile_id=next_id[0])
            next_id[0] += 1
            return n
        node = _Node(minlon, minlat, maxlon, maxlat, axis=axis, value=float(sv))
        node.left = split(lm, (minlon, minlat, sv, maxlat) if axis == 0 else (minlon, minlat, maxlon, sv))
        node.right = split(rm, (sv, minlat, maxlon, maxlat) if axis == 0 else (minlon, sv, maxlon, maxlat))
        return node

    all_mask = np.ones(len(cx), dtype=bool)
    root = split(all_mask, bbox)
    tree = BSPTileTree(root)
    # renumber leaves in canonical (minlon asc, minlat desc) order
    order = {old: new for new, (old, *_rest) in enumerate(tree.leaves())}
    tree.tile_id = np.array(
        [order.get(int(t), -1) if t >= 0 else -1 for t in tree.tile_id],
        dtype=np.int32,
    )

    def renum(n: _Node):
        if n.axis < 0:
            n.tile_id = order[n.tile_id]
        else:
            renum(n.left)
            renum(n.right)

    renum(root)
    return tree
