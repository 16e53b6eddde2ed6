"""Broadcastable polygon index for the filter-refine PIP join.

Replaces the reference's per-process R-tree (`lib/AreaTree.pm:28-44`,
Tree::R of bbox → polygon) with a structure designed for Spark:

  coarse phase:  cell id (Z-order, geometry/cells.py) → candidate polygon ids,
                 materialized as a small (cell, polygon_id) DataFrame that
                 Catalyst broadcast-joins against the cell-encoded points;
  refine phase:  exact three-state ray-casting PIP (geometry/kernels.py)
                 inside an Arrow-vectorized pandas UDF, reading ring data
                 from a sparkContext.broadcast of this index.

Cells fully inside a polygon are tagged so the refine UDF can skip the exact
test for them (the reference's rough-containment early accept,
osm2mp.pl:1711-1720).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..geometry.kernels import (
    INSIDE,
    points_in_polygon,
    points_in_ring,
    ring_bbox,
    shoelace_area,
)
from ..geometry.cells import (
    CELL_LEVEL_DEFAULT,
    cell_bounds,
    cell_cover_bbox,
)


@dataclass
class Polygon:
    """One area: id, outer rings, inner rings (holes), optional payload tags."""

    area_id: str
    outers: list  # list of Nx2 [lon, lat] arrays
    inners: list = field(default_factory=list)
    tags: dict = field(default_factory=dict)

    def __post_init__(self):
        self.outers = [np.asarray(r, dtype=np.float64) for r in self.outers]
        self.inners = [np.asarray(r, dtype=np.float64) for r in self.inners]
        self.area = sum(shoelace_area(r) for r in self.outers) - sum(
            shoelace_area(r) for r in self.inners
        )

    def contains(self, px, py) -> np.ndarray:
        """Three-state containment incl. hole subtraction."""
        return points_in_polygon(px, py, self.outers, self.inners)


class PolygonIndex:
    """Cell-cover index over a set of polygons.

    `entries()` yields (cell_id, area_id, full) rows — `full=True` when the
    cell is entirely inside the polygon (exact test skippable). The whole
    object is small (dimension data) and broadcast to executors for the
    refine UDF.
    """

    def __init__(self, polygons: list[Polygon], level: int = CELL_LEVEL_DEFAULT):
        self.level = level
        self.polygons: dict[str, Polygon] = {p.area_id: p for p in polygons}
        self._entries: list[tuple[int, str, bool]] = []
        for p in polygons:
            seen: set[int] = set()
            for ring in p.outers:
                minlon, minlat, maxlon, maxlat = ring_bbox(ring)
                for cid in cell_cover_bbox(minlon, minlat, maxlon, maxlat, level):
                    cid = int(cid)
                    if cid in seen:
                        continue
                    seen.add(cid)
                    cls = self._classify_cell(cid, p)
                    if cls == "outside":
                        continue
                    self._entries.append((cid, p.area_id, cls == "full"))

    @staticmethod
    def _classify_cell(cell_id: int, p: Polygon) -> str:
        """'full' if all 4 cell corners strictly inside and no ring edge can
        cross the cell (conservative: no edge bbox overlaps the cell bbox);
        'outside' if corners all outside and nothing crosses; else 'partial'.
        Misclassifying toward 'partial' is safe — it only costs an exact test."""
        minlon, minlat, maxlon, maxlat = cell_bounds(cell_id)
        cx = np.array([minlon, maxlon, maxlon, minlon])
        cy = np.array([minlat, minlat, maxlat, maxlat])
        res = points_in_polygon(cx, cy, p.outers, p.inners)
        # conservative crossing test: any ring EDGE whose bbox overlaps the cell
        crossed = False
        for ring in list(p.outers) + list(p.inners):
            x, y = ring[:, 0], ring[:, 1]
            ex0 = np.minimum(x[:-1], x[1:])
            ex1 = np.maximum(x[:-1], x[1:])
            ey0 = np.minimum(y[:-1], y[1:])
            ey1 = np.maximum(y[:-1], y[1:])
            if np.any(
                (ex1 >= minlon) & (ex0 <= maxlon) & (ey1 >= minlat) & (ey0 <= maxlat)
            ):
                crossed = True
                break
        if not crossed and np.all(res == INSIDE):
            return "full"
        if not crossed and np.all(res == -1):
            return "outside"
        return "partial"

    def entries(self) -> list[tuple[int, str, bool]]:
        return list(self._entries)

    def candidates_for_cell(self, cell_id: int) -> list[tuple[str, bool]]:
        return [(aid, full) for cid, aid, full in self._entries if cid == cell_id]

    def refine(self, px: np.ndarray, py: np.ndarray, area_id: str) -> np.ndarray:
        """Exact containment for a batch of points against one polygon."""
        return self.polygons[area_id].contains(px, py)

    def find_smallest_containing(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Single-node oracle path: for each point, the containing polygon of
        smallest area (ties by area_id) — the canonical deterministic rule
        replacing the reference's nondeterministic `first {}` match
        (lib/AreaTree.pm:67, SURVEY §7.3 risk 1). Returns object array of
        area_id or None."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        order = sorted(self.polygons.values(), key=lambda p: (p.area, p.area_id))
        out = np.full(px.shape, None, dtype=object)
        unresolved = np.ones(px.shape, dtype=bool)
        for p in order:
            if not unresolved.any():
                break
            res = p.contains(px[unresolved], py[unresolved])
            hit = res >= 0
            idx = np.where(unresolved)[0][hit]
            out[idx] = p.area_id
            unresolved[idx] = False
        return out
