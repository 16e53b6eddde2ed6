"""General polygon clipping — G3 (lib/Clipper.pm:16-43 wraps GPC; the
semantics to match are GPC INTERSECT/DIFFERENCE on arbitrary simple
polygons, concave included, with region holes handled at the region level:
clip-to-region = (subject ∩ outer) ∖ each hole).

From-scratch Greiner–Hormann (Greiner & Hormann, ACM TOG 17(2), 1998 —
public algorithm): pairwise edge intersections are inserted into both
vertex rings, each intersection gets an entry/exit flag from the parity
walk, and result rings are traced by switching rings at every
intersection. Difference = intersection with the clip ring's flags
inverted. Degenerate contacts (vertex exactly on an edge, collinear
overlapping edges) raise DegenerateClip; callers perturb the subject by
~1e-9° (sub-micrometer) and retry — the reference's GPC does the same
epsilon-shifting internally.

Driver/executor-side pure Python+math: rings are tiny (dozens of
vertices); the distributed axis is millions of subjects via
grouped_map_in_pandas (operators/clip_polygons).
"""

from __future__ import annotations

from .kernels import signed_area


class DegenerateClip(ValueError):
    """Vertex-on-edge / collinear-overlap contact: perturb and retry."""


class HoleInsideSubject(DegenerateClip):
    """Difference with a clip ring strictly inside the subject — the result
    is a ring-with-hole, not a simple ring. NOT a numeric degeneracy:
    callers handle it structurally (record an inner ring); retrying with a
    perturbed subject can never change containment."""


class _V:
    __slots__ = ("x", "y", "nxt", "prv", "inter", "entry", "twin", "alpha",
                 "visited")

    def __init__(self, x: float, y: float, inter: bool = False, alpha: float = 0.0):
        self.x = x
        self.y = y
        self.nxt: "_V | None" = None
        self.prv: "_V | None" = None
        self.inter = inter
        self.entry = False
        self.twin: "_V | None" = None
        self.alpha = alpha
        self.visited = False


def _build(ring) -> _V:
    pts = [tuple(map(float, p)) for p in ring]
    if pts[0] == pts[-1]:
        pts = pts[:-1]
    if len(pts) < 3:
        raise ValueError("ring needs >= 3 distinct vertices")
    vs = [_V(x, y) for x, y in pts]
    for i, v in enumerate(vs):
        v.nxt = vs[(i + 1) % len(vs)]
        v.prv = vs[(i - 1) % len(vs)]
    return vs[0]


def _verts(head: _V):
    v = head
    while True:
        yield v
        v = v.nxt
        if v is head:
            break


def _edges(head: _V):
    """(edge_start_vertex, edge_end_ORIGINAL_vertex) pairs — intersection
    vertices inserted later sit between originals."""
    originals = [v for v in _verts(head) if not v.inter]
    for i, a in enumerate(originals):
        yield a, originals[(i + 1) % len(originals)]


_EPS = 1e-12


def _segment_int(p1, p2, q1, q2):
    """Intersection params (alpha_p, alpha_q) strictly inside both segments,
    or None; degenerate contact raises."""
    d1x, d1y = p2.x - p1.x, p2.y - p1.y
    d2x, d2y = q2.x - q1.x, q2.y - q1.y
    den = d1x * d2y - d1y * d2x
    ex, ey = q1.x - p1.x, q1.y - p1.y
    if den == 0.0:
        # parallel: overlap only if collinear AND ranges touch
        if ex * d1y - ey * d1x == 0.0:
            # collinear — any range overlap is degenerate for GH
            t0 = (ex * d1x + ey * d1y) / (d1x * d1x + d1y * d1y)
            t1 = t0 + (d2x * d1x + d2y * d1y) / (d1x * d1x + d1y * d1y)
            lo, hi = min(t0, t1), max(t0, t1)
            if hi > _EPS and lo < 1.0 - _EPS:
                raise DegenerateClip("collinear overlapping edges")
        return None
    ap = (ex * d2y - ey * d2x) / den
    aq = (ex * d1y - ey * d1x) / den
    if -_EPS < ap < _EPS or 1.0 - _EPS < ap < 1.0 + _EPS:
        if -_EPS <= aq <= 1.0 + _EPS and -_EPS < ap < 1.0 + _EPS:
            raise DegenerateClip("vertex-on-edge contact (subject)")
        return None
    if -_EPS < aq < _EPS or 1.0 - _EPS < aq < 1.0 + _EPS:
        if 0.0 < ap < 1.0:
            raise DegenerateClip("vertex-on-edge contact (clip)")
        return None
    if 0.0 < ap < 1.0 and 0.0 < aq < 1.0:
        return ap, aq
    return None


def _insert(between_a: _V, between_b: _V, v: _V) -> None:
    """Insert intersection v between originals a→b, sorted by alpha among
    the intersections already there."""
    cur = between_a
    while cur.nxt is not between_b and cur.nxt.alpha < v.alpha:  # type: ignore[union-attr]
        cur = cur.nxt  # type: ignore[assignment]
    v.nxt = cur.nxt
    v.prv = cur
    cur.nxt.prv = v  # type: ignore[union-attr]
    cur.nxt = v


def _ray_state_scalar(px: float, py: float, verts: list) -> int:
    """Scalar twin of kernels.points_in_ring for ONE point (1 inside,
    0 on-edge, -1 outside) — identical IEEE operations edge-for-edge, but
    without the ~100 µs/call numpy dispatch overhead that dominated the
    kernel profile (points_in_ring was 66% of gh_clip time when fed single
    points). `verts` is the OPEN ring [(x, y), ...]."""
    inside = False
    on_edge = False
    n = len(verts)
    x1, y1 = verts[0]
    for i in range(n):
        x2, y2 = verts[(i + 1) % n]
        cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        if (cross == 0.0
                and min(x1, x2) <= px <= max(x1, x2)
                and min(y1, y2) <= py <= max(y1, y2)):
            on_edge = True
        if (y1 <= py) != (y2 <= py) and y2 != y1:
            if px < x1 + (py - y1) * (x2 - x1) / (y2 - y1):
                inside = not inside
        x1, y1 = x2, y2
    if on_edge:
        return 0
    return 1 if inside else -1


def _originals(head: _V) -> list:
    return [(v.x, v.y) for v in _verts(head) if not v.inter]


def _point_inside(x: float, y: float, head: _V) -> bool:
    # three-state kernel: 1 inside, 0 on-edge, -1 outside — strict inside
    return _ray_state_scalar(x, y, _originals(head)) == 1


def gh_clip(subject, clip, op: str = "int") -> list[list[tuple]]:
    """GPC-style boolean of two simple rings. op: 'int' (A∩B) or
    'diff' (A∖B). Returns a list of closed result rings (first == last).
    Raises DegenerateClip on vertex-on-edge contact."""
    s_head = _build(subject)
    c_head = _build(clip)

    # 1. find + insert all intersections (edge lists hoisted: the inner ring
    # used to be re-enumerated per outer edge — 40% of kernel time)
    inters: list[_V] = []
    s_edges = list(_edges(s_head))
    c_edges = list(_edges(c_head))
    for sa, sb in s_edges:
        for ca, cb in c_edges:
            r = _segment_int(sa, sb, ca, cb)
            if r is None:
                continue
            ap, aq = r
            x = sa.x + ap * (sb.x - sa.x)
            y = sa.y + ap * (sb.y - sa.y)
            vs = _V(x, y, inter=True, alpha=ap)
            vc = _V(x, y, inter=True, alpha=aq)
            vs.twin = vc
            vc.twin = vs
            _insert(sa, sb, vs)
            _insert(ca, cb, vc)
            inters.append(vs)

    if not inters:
        # containment / disjoint cases
        s_in_c = _point_inside(s_head.x, s_head.y, c_head)
        c_in_s = _point_inside(c_head.x, c_head.y, s_head)
        s_ring = [(v.x, v.y) for v in _verts(s_head)]
        s_ring.append(s_ring[0])
        c_ring = [(v.x, v.y) for v in _verts(c_head)]
        c_ring.append(c_ring[0])
        if op == "int":
            if s_in_c:
                return [s_ring]
            if c_in_s:
                return [c_ring]
            return []
        # diff
        if s_in_c:
            return []
        if c_in_s:
            # clip strictly inside subject → ring-with-hole; callers that
            # need holes use clip_region_with_holes (returns inners)
            raise HoleInsideSubject("difference would create a hole ring")
        return [s_ring]

    # 2. entry/exit flags (parity walk from a non-intersection vertex —
    # the ring heads are originals by construction). entry = the walk
    # ENTERS the other polygon at this intersection.
    for head, other in ((s_head, c_head), (c_head, s_head)):
        inside = _point_inside(head.x, head.y, other)
        v = head
        while True:
            if v.inter:
                v.entry = not inside
                inside = not inside
            v = v.nxt
            if v is head:
                break
    if op == "diff":
        # A ∖ B (Greiner–Hormann flag table): invert the SUBJECT ring's
        # flags — its runs outside B are kept, traversed via the clip
        # boundary between crossings
        for v in _verts(s_head):
            if v.inter:
                v.entry = not v.entry

    # 3. trace result rings: at an entry move forward, at an exit move
    # backward; jump to the twin at every intersection; a ring closes when
    # the jump lands back on its starting intersection (either copy).
    out: list[list[tuple]] = []
    for start in inters:
        if start.visited:
            continue
        ring = [(start.x, start.y)]
        cur: _V = start
        while True:
            cur.visited = True
            cur.twin.visited = True  # type: ignore[union-attr]
            forward = cur.entry
            while True:
                cur = cur.nxt if forward else cur.prv  # type: ignore[assignment]
                ring.append((cur.x, cur.y))
                if cur.inter:
                    break
            cur = cur.twin  # type: ignore[assignment]
            if cur is start or cur is start.twin or cur.visited:
                break
        if ring[0] != ring[-1]:
            ring.append(ring[0])
        if len(ring) >= 4:
            out.append(ring)
    return out


def _perturbed(ring, eps: float):
    return [(x + eps, y + eps * 0.7) for x, y in ring]


def gh_clip_robust(subject, clip, op: str = "int", eps: float = 1e-9
                   ) -> list[list[tuple]]:
    """gh_clip with automatic degeneracy perturbation of the SUBJECT (the
    GPC-equivalent epsilon shift; 1e-9° ≈ 0.1 µm)."""
    for attempt in range(4):
        try:
            return gh_clip(
                _perturbed(subject, eps * attempt) if attempt else subject,
                clip,
                op,
            )
        except HoleInsideSubject:
            raise  # structural, not numeric — retrying cannot change it
        except DegenerateClip:
            if attempt == 3:
                raise
    raise AssertionError("unreachable")


def clip_region_with_holes(subject, outer, holes=()) -> dict:
    """Clip one subject ring to a region (outer ring minus hole rings) —
    the Boundary.pm:54-61 shape. Returns {"outers": [...], "inners":
    [...]}: inners are holes that fell strictly inside a result piece."""
    pieces = gh_clip_robust(subject, outer, "int")
    inners: list[list[tuple]] = []
    for hole in holes:
        nxt: list[list[tuple]] = []
        for p in pieces:
            try:
                nxt.extend(gh_clip_robust(p, hole, "diff"))
            except HoleInsideSubject:
                # hole strictly inside the piece: keep piece + inner ring
                # (structural case, detected without any retry; genuine
                # numeric degeneracies still surface loudly)
                nxt.append(p)
                h = [tuple(map(float, q)) for q in hole]
                if h[0] != h[-1]:
                    h.append(h[0])
                inners.append(h)
        pieces = nxt
    return {"outers": pieces, "inners": inners}


def ring_area_abs(ring) -> float:
    return abs(signed_area(ring))
