"""Vectorized geometry kernels (NumPy) used inside Arrow/pandas UDFs.

These re-implement, from the published algorithm descriptions, the geometric
primitives whose *semantics* the reference engine relies on (citations are
into /root/reference for parity checking only — no code is derived from it):

- three-state point-in-ring ray casting    (Math::Polygon::Tree `contains`
  semantics used via lib/Boundary.pm:86-89, lib/AreaTree.pm:67-71)
- Sutherland–Hodgman polygon clipping      (GPC INTERSECT use at
  osm2mp.pl:1723-1729 — convex clip regions; see SURVEY §7.3 risk 6)
- chain clipping with keep-one-outside-vertex rule (osm2mp.pl:1821-1838)
- shoelace area / centroid / orientation   (osm2mp.pl:1736, 2241;
  lib/WriterMPC.pm:441)
- spherical-corrected polygon area in km²  (osm2mp.pl:1905-1921)
- segment intersection, half-open ends     (lib/Coastlines.pm:258-275)
- lat-corrected planar angle cosine + distance (osm2mp.pl:1151-1193)

All kernels take numpy arrays and are vectorized over points; polygon ring
loops are over edges (rings are small — tens to hundreds of vertices).
"""

from __future__ import annotations

import numpy as np

# meters per degree at the equator, per the reference's planar metric
# (osm2mp.pl:1151-1157 uses degrees * 180/20_000_000 inverse => 111_111.11 m/deg)
M_PER_DEG = 20_000_000.0 / 180.0

INSIDE = 1
ON_EDGE = 0
OUTSIDE = -1


def _as_xy(ring) -> tuple[np.ndarray, np.ndarray]:
    """Accept ring as Nx2 array-like or list of (lon, lat); return x, y arrays."""
    a = np.asarray(ring, dtype=np.float64)
    if a.ndim != 2 or a.shape[1] != 2:
        raise ValueError(f"ring must be Nx2, got {a.shape}")
    return a[:, 0], a[:, 1]


def _closed(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Ensure the ring is explicitly closed (first point == last point)."""
    if x[0] != x[-1] or y[0] != y[-1]:
        x = np.append(x, x[0])
        y = np.append(y, y[0])
    return x, y


def points_in_ring(px: np.ndarray, py: np.ndarray, ring) -> np.ndarray:
    """Three-state PIP by ray casting: 1 inside, 0 on edge, -1 outside.

    Vectorized over points; loops over ring edges. Horizontal ray to +x with
    the half-open rule [y1, y2) so vertices are counted once.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x, y = _closed(*_as_xy(ring))
    n = len(x) - 1
    inside = np.zeros(px.shape, dtype=bool)
    on_edge = np.zeros(px.shape, dtype=bool)
    for i in range(n):
        x1, y1, x2, y2 = x[i], y[i], x[i + 1], y[i + 1]
        # on-segment test: collinear and within bbox of the segment
        cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        within = (
            (np.minimum(x1, x2) <= px)
            & (px <= np.maximum(x1, x2))
            & (np.minimum(y1, y2) <= py)
            & (py <= np.maximum(y1, y2))
        )
        on_edge |= (cross == 0.0) & within
        # crossing test, half-open in y
        cond = (y1 <= py) != (y2 <= py)
        if y2 != y1:
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            inside ^= cond & (px < xint)
    out = np.where(on_edge, ON_EDGE, np.where(inside, INSIDE, OUTSIDE))
    return out.astype(np.int8)


def points_in_polygon(
    px: np.ndarray, py: np.ndarray, outers: list, inners: list | None = None
) -> np.ndarray:
    """PIP against a multipolygon: inside any outer and not strictly inside any
    inner (hole). Points on a hole edge count as inside the polygon; points on
    an outer edge count as on-edge (0). Returns int8 {-1, 0, 1}.

    Hole-subtraction semantics mirror lib/AreaTree.pm:67-71 (candidate accepted
    when inside bound and in none of the inner rings).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    best = np.full(px.shape, OUTSIDE, dtype=np.int8)
    for ring in outers:
        r = points_in_ring(px, py, ring)
        best = np.maximum(best, r)
    if inners:
        in_hole = np.zeros(px.shape, dtype=bool)
        for ring in inners:
            in_hole |= points_in_ring(px, py, ring) == INSIDE
        best = np.where(in_hole & (best == INSIDE), OUTSIDE, best)
    return best


def signed_area(ring) -> float:
    """Shoelace signed area in degree² (positive = counter-clockwise)."""
    x, y = _closed(*_as_xy(ring))
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def shoelace_area(ring) -> float:
    """Absolute shoelace area in degree²."""
    return abs(signed_area(ring))


def is_clockwise(ring) -> bool:
    """Orientation test (WriterMPC.pm:441 `isClockwise` semantics)."""
    return signed_area(ring) < 0


def centroid(ring) -> tuple[float, float]:
    """Area-weighted polygon centroid (degenerate rings fall back to mean)."""
    x, y = _closed(*_as_xy(ring))
    cr = x[:-1] * y[1:] - x[1:] * y[:-1]
    a = 0.5 * np.sum(cr)
    if a == 0.0:
        return float(np.mean(x[:-1])), float(np.mean(y[:-1]))
    cx = np.sum((x[:-1] + x[1:]) * cr) / (6.0 * a)
    cy = np.sum((y[:-1] + y[1:]) * cr) / (6.0 * a)
    return float(cx), float(cy)


def ring_bbox(ring) -> tuple[float, float, float, float]:
    x, y = _as_xy(ring)
    return float(x.min()), float(y.min()), float(x.max()), float(y.max())


def spherical_area_km2(ring) -> float:
    """Planar shoelace area corrected by cos(centroid latitude), in km².

    Same formula family as the reference's area threshold selector
    (osm2mp.pl:1905-1921): deg² × cos(lat_c) × (40000/360)².
    """
    a = shoelace_area(ring)
    _, cy = centroid(ring)
    return a * np.cos(np.radians(cy)) * (40_000.0 / 360.0) ** 2


def planar_dist_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Lat-corrected planar distance in meters (osm2mp.pl:1151-1157 metric)."""
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon2 = np.asarray(lon2, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    clat = np.cos(np.radians((lat1 + lat2) / 2.0))
    dx = (lon2 - lon1) * clat
    dy = lat2 - lat1
    return np.sqrt(dx * dx + dy * dy) * M_PER_DEG


def lcos(p0, p1, p2) -> float:
    """Cosine of the angle at p1 formed by p0→p1→p2, with cos(lat) x-scaling
    (osm2mp.pl:1179-1193 semantics). Each p is (lon, lat)."""
    clat = np.cos(np.radians(p1[1]))
    ax = (p1[0] - p0[0]) * clat
    ay = p1[1] - p0[1]
    bx = (p2[0] - p1[0]) * clat
    by = p2[1] - p1[1]
    na = np.hypot(ax, ay)
    nb = np.hypot(bx, by)
    if na == 0.0 or nb == 0.0:
        return 0.0
    return float((ax * bx + ay * by) / (na * nb))


def segment_intersection(p11, p12, p21, p22):
    """Parametric segment × segment intersection, half-open at p12 / p22
    (lib/Coastlines.pm:258-275 semantics: t in [0,1), u in [0,1)).

    Returns (x, y) or None.
    """
    x1, y1 = p11
    x2, y2 = p12
    x3, y3 = p21
    x4, y4 = p22
    d = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
    if d == 0.0:
        return None
    t = ((x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)) / d
    u = ((x3 - x1) * (y2 - y1) - (y3 - y1) * (x2 - x1)) / d
    if 0.0 <= t < 1.0 and 0.0 <= u < 1.0:
        return (x1 + t * (x2 - x1), y1 + t * (y2 - y1))
    return None


def sutherland_hodgman(subject, clip_ring) -> np.ndarray:
    """Clip `subject` polygon by a CONVEX `clip_ring` (CCW), returning the
    intersection polygon as an Mx2 array (possibly empty).

    Replaces the reference's GPC INTERSECT call (osm2mp.pl:1723-1729,
    lib/Clipper.pm:16-43) for convex clip regions; SURVEY §7.3 risk 6 notes
    the concave general case is out of scope for the fixture set (tiles and
    bboxes are rectangles).
    """
    subj = np.asarray(subject, dtype=np.float64)
    if len(subj) and (subj[0] == subj[-1]).all():
        subj = subj[:-1]
    cx, cy = _closed(*_as_xy(clip_ring))
    # ensure CCW clip ring so "inside" is left of each edge
    if signed_area(np.column_stack([cx, cy])) < 0:
        cx, cy = cx[::-1], cy[::-1]
    out = subj
    for i in range(len(cx) - 1):
        if len(out) == 0:
            break
        ex1, ey1, ex2, ey2 = cx[i], cy[i], cx[i + 1], cy[i + 1]
        x, y = out[:, 0], out[:, 1]
        # signed side of each subject vertex relative to the clip edge
        side = (ex2 - ex1) * (y - ey1) - (ey2 - ey1) * (x - ex1)
        nxt = np.roll(np.arange(len(out)), -1)
        new_pts: list[tuple[float, float]] = []
        for j in range(len(out)):
            k = nxt[j]
            cur_in = side[j] >= 0.0
            nxt_in = side[k] >= 0.0
            if cur_in:
                new_pts.append((x[j], y[j]))
            if cur_in != nxt_in:
                # edge crosses the clip line: add intersection point
                denom = side[j] - side[k]
                t = side[j] / denom if denom != 0.0 else 0.0
                new_pts.append(
                    (x[j] + t * (x[k] - x[j]), y[j] + t * (y[k] - y[j]))
                )
        out = np.asarray(new_pts, dtype=np.float64).reshape(-1, 2)
    return out


def clip_chain_parts(inside_flags: np.ndarray) -> list[tuple[int, int]]:
    """Given per-vertex three-state inside flags for a chain, return the
    [start, end] (inclusive) index ranges of the clipped parts under the
    reference's rule (osm2mp.pl:1821-1838): a part is a maximal run of
    inside/on-edge vertices, EXTENDED by one outside vertex on each crossing
    end if such a vertex exists.
    """
    f = np.asarray(inside_flags)
    n = len(f)
    parts: list[tuple[int, int]] = []
    i = 0
    while i < n:
        if f[i] >= ON_EDGE:
            start = i
            while i + 1 < n and f[i + 1] >= ON_EDGE:
                i += 1
            end = i
            ext_start = start - 1 if start > 0 else start
            ext_end = end + 1 if end < n - 1 else end
            if ext_end - ext_start >= 1:  # need at least 2 points to be a line
                parts.append((ext_start, ext_end))
        i += 1
    return parts
