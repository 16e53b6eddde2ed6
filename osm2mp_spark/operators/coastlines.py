"""G10-G12: coastline stitching, sea polygon synthesis, lake/island nesting.

Boundary geometry is dimension-scale (the collected coastline set for one
map/tile is small), so per the SURVEY plan (§2.3 G11) this runs driver-side
over collected chains; the Spark surface is `synthesize_water(spark_df,
boundary)`, which collects, runs the kernel, and returns a DataFrame of
water polygons. The at-scale path runs it per tile inside applyInPandas
(each tile's coastline set is small by construction).

Semantics re-expressed from the survey description of lib/Coastlines.pm:
  - stitch chains end-to-start to fixpoint (:50-99; dict-keyed-by-first-point
    walk → our deterministic sorted-seed variant, oracle.reference)
  - open chains crossing a RECTANGULAR boundary are closed by walking the
    boundary perimeter clockwise from each chain's end to the next chain's
    start (water lies right of travel; :101-196). Crossing points are exact
    segment×rect-edge intersections; events are ordered by perimeter
    position (:158-168).
  - closed rings: CW → lake, CCW → island; islands nest into the first
    containing lake by descending-vertex-count order (:198-241).
"""

from __future__ import annotations

import numpy as np

from ..geometry.kernels import points_in_ring, segment_intersection
from ..oracle.reference import classify_lakes_islands_oracle, stitch_coastlines_oracle


def _on_perimeter(p, bbox, eps: float = 1e-9) -> bool:
    minlon, minlat, maxlon, maxlat = bbox
    x, y = p
    on_edge = (
        abs(y - maxlat) < eps or abs(y - minlat) < eps
        or abs(x - maxlon) < eps or abs(x - minlon) < eps
    )
    inside = minlon - eps <= x <= maxlon + eps and minlat - eps <= y <= maxlat + eps
    return on_edge and inside


def _perimeter_pos(p, bbox) -> float:
    """Position of a boundary point along the rect perimeter, clockwise from
    (minlon, maxlat) [NW corner]: top → right → bottom → left."""
    minlon, minlat, maxlon, maxlat = bbox
    x, y = p
    w = maxlon - minlon
    h = maxlat - minlat
    eps = 1e-9
    if abs(y - maxlat) < eps:
        return x - minlon
    if abs(x - maxlon) < eps:
        return w + (maxlat - y)
    if abs(y - minlat) < eps:
        return w + h + (maxlon - x)
    if abs(x - minlon) < eps:
        return w + h + w + (y - minlat)
    raise ValueError(f"point {p} not on boundary {bbox}")


def _walk_perimeter(t0: float, t1: float, bbox) -> list[tuple[float, float]]:
    """Corner points passed when walking clockwise from perimeter position
    t0 to t1 (exclusive of endpoints)."""
    minlon, minlat, maxlon, maxlat = bbox
    w = maxlon - minlon
    h = maxlat - minlat
    total = 2 * (w + h)
    corners = [
        (w, (maxlon, maxlat)),
        (w + h, (maxlon, minlat)),
        (w + h + w, (minlon, minlat)),
        (total, (minlon, maxlat)),
    ]
    out = []
    t = t0
    if t1 <= t0:
        t1 += total
    for lap in (0, total):
        for ct, cp in corners:
            ctt = ct + lap
            if t0 < ctt < t1:
                out.append(cp)
    return out


def _clip_open_chain(chain, bbox):
    """Clip an open chain to the rect, returning inside runs whose first/last
    points are EXACT boundary crossings (or original endpoints if inside)."""
    minlon, minlat, maxlon, maxlat = bbox
    rect = [
        (minlon, minlat), (maxlon, minlat), (maxlon, maxlat), (minlon, maxlat),
        (minlon, minlat),
    ]
    pts = [tuple(p) for p in chain]
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    inside = (xs >= minlon) & (xs <= maxlon) & (ys >= minlat) & (ys <= maxlat)
    runs = []
    cur: list[tuple[float, float]] = []
    for i in range(len(pts)):
        if inside[i]:
            if not cur and i > 0:
                # entering: add crossing point on segment (i-1, i)
                cr = _rect_crossing(pts[i - 1], pts[i], rect)
                if cr is not None and cr != pts[i]:
                    cur.append(cr)
            cur.append(pts[i])
        else:
            if cur:
                cr = _rect_crossing(pts[i], pts[i - 1], rect)  # exiting
                if cr is not None and cr != cur[-1]:
                    cur.append(cr)
                runs.append(cur)
                cur = []
            elif i > 0 and not inside[i - 1]:
                # pure transit: both endpoints outside, segment may still
                # cross the rect — emit the (entry, exit) crossing pair
                entry = _rect_crossing(pts[i - 1], pts[i], rect)
                exit_ = _rect_crossing(pts[i], pts[i - 1], rect)
                if entry is not None and exit_ is not None and entry != exit_:
                    runs.append([entry, exit_])
    if cur:
        runs.append(cur)
    return runs


def _rect_crossing(p_out, p_in, rect):
    """Intersection of segment (p_out → p_in) with the rect edges, nearest
    to p_out."""
    best = None
    best_t = None
    for e0, e1 in zip(rect[:-1], rect[1:]):
        hit = segment_intersection(p_out, p_in, e0, e1)
        if hit is None:
            # also try the closed variant at segment end
            hit = segment_intersection(p_out, (p_in[0] + (p_in[0] - p_out[0]) * 1e-12,
                                               p_in[1] + (p_in[1] - p_out[1]) * 1e-12),
                                       e0, e1)
        if hit is not None:
            t = max(abs(hit[0] - p_out[0]), abs(hit[1] - p_out[1]))
            if best is None or t < best_t:
                best, best_t = hit, t
    return best


def _close_runs(runs: list[tuple[list, float, float]], total: float, walk) -> list:
    """Shared sea-closure loop (lib/Coastlines.pm:101-196): from each open
    run's END walk the boundary CLOCKWISE (water right of travel) to the
    nearest unused run START (or back to the ring's own start), splicing
    boundary vertices in between. runs: (pts, t_start, t_end) with
    perimeter positions carried explicitly."""
    seas = []
    used = [False] * len(runs)
    for i0 in range(len(runs)):
        if used[i0]:
            continue
        ring = list(runs[i0][0])
        t_start0, t_end = runs[i0][1], runs[i0][2]
        used[i0] = True
        while True:
            best = None
            for j, r in enumerate(runs):
                if used[j]:
                    continue
                d = (r[1] - t_end) % total
                if best is None or d < best[0] or (d == best[0] and j < best[1]):
                    best = (d, j)
            d_close = (t_start0 - t_end) % total
            if best is None or d_close <= best[0]:
                ring.extend(walk(t_end, t_start0))
                ring.append(ring[0])
                seas.append(ring)
                break
            _, j = best
            ring.extend(walk(t_end, runs[j][1]))
            ring.extend(runs[j][0])
            t_end = runs[j][2]
            used[j] = True
    return seas


class RingBoundary:
    """Arbitrary simple boundary ring (G11 general case —
    lib/Coastlines.pm:101-196 walks the actual boundary polygon, not a
    rect). The ring is stored CLOCKWISE; perimeter position = cumulative
    euclidean arc length from vertex 0."""

    def __init__(self, ring):
        from ..geometry.kernels import signed_area

        pts = [tuple(map(float, p)) for p in ring]
        if pts[0] != pts[-1]:
            pts.append(pts[0])
        if signed_area(pts) > 0:  # CCW → reverse to CW
            pts = pts[::-1]
        self.pts = pts
        self.cum = [0.0]
        for a, b in zip(pts[:-1], pts[1:]):
            self.cum.append(
                self.cum[-1] + float(np.hypot(b[0] - a[0], b[1] - a[1]))
            )
        self.total = self.cum[-1]

    def contains(self, p) -> bool:
        return points_in_ring(
            np.array([p[0]]), np.array([p[1]]), self.pts
        )[0] >= 0  # on-edge counts inside (osm2mp is_inside_bounds)

    def crossing(self, p_out, p_in):
        """Nearest intersection of (p_out → p_in) with the ring, as
        (point, perimeter_pos); None if no crossing."""
        cs = self.crossings(p_out, p_in)
        return cs[0] if cs else None

    def crossings(self, p0, p1):
        """ALL intersections of segment (p0 → p1) with the ring, ordered
        along the segment from p0 — a segment may cross a CONCAVE ring
        any even number of times, and pairing only the outermost two
        would span excluded notches."""
        found = []
        for i, (e0, e1) in enumerate(zip(self.pts[:-1], self.pts[1:])):
            hit = segment_intersection(p0, p1, e0, e1)
            if hit is None:
                continue
            t = max(abs(hit[0] - p0[0]), abs(hit[1] - p0[1]))
            pos = self.cum[i] + float(np.hypot(hit[0] - e0[0], hit[1] - e0[1]))
            found.append((t, hit, pos))
        found.sort(key=lambda x: x[0])
        return [(hit, pos) for _, hit, pos in found]

    def walk(self, t0: float, t1: float) -> list:
        """Ring vertices passed walking clockwise from t0 to t1."""
        out = []
        t1_adj = t1 if t1 > t0 else t1 + self.total
        for lap in (0.0, self.total):
            for i in range(len(self.pts) - 1):
                ct = self.cum[i] + lap
                if t0 < ct < t1_adj:
                    out.append(self.pts[i])
        return out


def _clip_open_chain_ring(chain, boundary: RingBoundary):
    """Inside runs of an open chain against an arbitrary ring, endpoints
    replaced by exact crossings with perimeter positions carried.
    Returns [(pts, t_start|None, t_end|None)].

    Sweep with crossing ALTERNATION: every segment contributes ALL its
    ring intersections in order along the segment, toggling inside/out at
    each — a segment across a concave notch (4+ crossings) yields one run
    per inside interval instead of one run spanning the notch."""
    pts = [tuple(p) for p in chain]
    runs: list[tuple[list, float | None, float | None]] = []
    inside = boundary.contains(pts[0])
    cur: list = [pts[0]] if inside else []
    t_start: float | None = None
    for i in range(1, len(pts)):
        for hit, pos in boundary.crossings(pts[i - 1], pts[i]):
            if inside:
                if not cur or hit != cur[-1]:
                    cur.append(hit)
                runs.append((cur, t_start, pos))
                cur, t_start = [], None
            else:
                cur = [hit]
                t_start = pos
            inside = not inside
        if inside and (not cur or pts[i] != cur[-1]):
            cur.append(pts[i])
    if cur:
        runs.append((cur, t_start, None))
    return [(r, t0, t1) for r, t0, t1 in runs if len(r) >= 2]


def synthesize_water(chains: dict[str, list], boundary) -> dict:
    """Full G10-G12 kernel over raw coastline chains against either a
    rectangular bbox (minlon, minlat, maxlon, maxlat) or an ARBITRARY
    simple boundary ring (list of (lon, lat) — the lib/Coastlines.pm
    general case).

    Returns {"seas": [ring...], "lakes": [{"ring", "islands"}...],
    "free_islands": [...]}, rings closed, deterministic order."""
    merged = stitch_coastlines_oracle(chains)
    closed = [ch for ch in merged if ch[0] == ch[-1]]
    open_chains = [ch for ch in merged if ch[0] != ch[-1]]

    is_rect = (
        isinstance(boundary, (tuple, list))
        and len(boundary) == 4
        and not isinstance(boundary[0], (tuple, list))
    )

    # clip open chains to the boundary; only runs with BOTH endpoints on the
    # perimeter can be closed by boundary arcs — a coastline that ends
    # strictly inside the map is incomplete data and is skipped, like the
    # reference skips unclosable geometry (lib/OSM.pm:186 pattern)
    runs: list[tuple[list, float, float]] = []
    if is_rect:
        bbox = tuple(boundary)
        total = 2 * ((bbox[2] - bbox[0]) + (bbox[3] - bbox[1]))
        for ch in open_chains:
            for r in _clip_open_chain(ch, bbox):
                if len(r) < 2:
                    continue
                if _on_perimeter(r[0], bbox) and _on_perimeter(r[-1], bbox):
                    runs.append(
                        (r, _perimeter_pos(r[0], bbox), _perimeter_pos(r[-1], bbox))
                    )
        walk = lambda t0, t1: _walk_perimeter(t0, t1, bbox)  # noqa: E731
    else:
        ringb = boundary if isinstance(boundary, RingBoundary) else RingBoundary(boundary)
        total = ringb.total
        for ch in open_chains:
            for r, t0, t1 in _clip_open_chain_ring(ch, ringb):
                if len(r) >= 2 and t0 is not None and t1 is not None:
                    runs.append((r, t0, t1))
        walk = ringb.walk

    seas = _close_runs(runs, total, walk) if runs else []

    nest = classify_lakes_islands_oracle(closed)
    return {"seas": seas, "lakes": nest["lakes"], "free_islands": nest["free_islands"]}


def tile_bbox_grid(tile_id: int, nx: int = 8, ny: int = 8):
    """Bbox of a row-major-from-SW world-grid tile (operators.tiles
    grid_tile_expr numbering)."""
    iy, ix = divmod(int(tile_id), nx)
    w = 360.0 / nx
    h = 180.0 / ny
    return (-180.0 + ix * w, -90.0 + iy * h, -180.0 + (ix + 1) * w,
            -90.0 + (iy + 1) * h)


def synthesize_water_per_tile(
    pts,
    nx: int = 8,
    ny: int = 8,
    chain_col: str = "chain_id",
    seq_col: str = "seq",
):
    """The AT-SCALE G10-G12 path: coastline chains grouped per tile, the
    water-synthesis kernel run inside applyInPandas against each tile's own
    bbox. Each tile's coastline set is small by construction (the reference
    splitter guarantees it), so the kernel cost is bounded per group while
    the tile axis distributes.

    Input: vertex rows (chain_col, seq_col, lon, lat, tile_id) where a
    chain appears IN FULL under every tile it was assigned to (closure for
    open chains — crossing geometry needs the outside vertices; first-
    vertex tile for closed rings). Output rows:
    (tile_id, kind, idx, n_pts, start_lon, start_lat)."""
    import pandas as pd

    from .grouped import grouped_map_in_pandas

    schema = (
        "tile_id int, kind string, idx int, n_pts int, "
        "start_lon double, start_lat double"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([chain_col, seq_col])
        tile = int(pdf["tile_id"].iloc[0])
        bbox = tile_bbox_grid(tile, nx, ny)
        chains = {
            str(cid): list(zip(grp["lon"], grp["lat"]))
            for cid, grp in pdf.groupby(chain_col, sort=True)
        }
        water = synthesize_water(chains, bbox)
        rows = []
        for i, ring in enumerate(water["seas"]):
            rows.append((tile, "sea", i, len(ring), ring[0][0], ring[0][1]))
        for i, lk in enumerate(water["lakes"]):
            rows.append((tile, "lake", i, len(lk["ring"]),
                         lk["ring"][0][0], lk["ring"][0][1]))
            for j, isl in enumerate(lk["islands"]):
                rows.append((tile, "island", i * 100 + j, len(isl),
                             isl[0][0], isl[0][1]))
        for i, isl in enumerate(water["free_islands"]):
            rows.append((tile, "free_island", i, len(isl), isl[0][0], isl[0][1]))
        return pd.DataFrame(
            rows,
            columns=["tile_id", "kind", "idx", "n_pts", "start_lon", "start_lat"],
        )

    return grouped_map_in_pandas(pts, "tile_id", kernel, schema=schema)
