"""Single-node pure-Python oracle of the reference semantics (SURVEY §5).

The reference ships zero tests; these functions ARE the golden net. Each
implements, straight from the survey's semantic description (citations into
/root/reference for parity only — no code is derived from it), the canonical
deterministic variant of an operator the Spark engine must match:

- stitch_rings_oracle            G1  multipolygon assembly (lib/OSM.pm:133-194)
- self_intersection_breaks_oracle W1/W2/W3 chain break rule (osm2mp.pl:715-756)
- merge_roads_oracle             I1  road merging fixpoint (osm2mp.pl:596-661)
- stitch_coastlines_oracle       G10 coastline stitching (lib/Coastlines.pm:50-99)
- classify_lakes_islands_oracle  G12 lake/island nesting (lib/Coastlines.pm:198-241)

Canonical determinism rules (FIXTURES.md): where the reference iterates Perl
hashes in arbitrary order, we process candidates in sorted natural-key order.
"""

from __future__ import annotations

from ..geometry.kernels import is_clockwise, lcos, points_in_ring


def stitch_rings_oracle(members: list[tuple[str, list]]) -> dict | None:
    """Assemble closed rings from (role, chain) members.

    Semantics (lib/OSM.pm:133-194): chains whose endpoints match are joined
    end-to-start, accepting reversed chains; a member set that cannot be
    closed into rings marks the whole multipolygon broken → None.
    Roles: outer/exclave → outer rings; inner/enclave → inner rings.
    Deterministic: chains are consumed in input order; when extending a ring,
    the first matching chain in input order wins, preferring non-reversed.

    Returns {"outers": [ring, ...], "inners": [ring, ...]} with closed rings
    (first point == last point), or None if any chain set is broken.
    """
    out: dict = {"outers": [], "inners": []}
    for role_kind, key in (("outer", "outers"), ("inner", "inners")):
        chains = [
            list(map(tuple, ch))
            for role, ch in members
            if role in (role_kind, "exclave" if role_kind == "outer" else "enclave")
        ]
        used = [False] * len(chains)
        for i in range(len(chains)):
            if used[i]:
                continue
            used[i] = True
            ring = list(chains[i])
            # extend until closed or stuck
            while ring[0] != ring[-1]:
                found = False
                for j in range(len(chains)):
                    if used[j]:
                        continue
                    cj = chains[j]
                    if cj[0] == ring[-1]:
                        ring.extend(cj[1:])
                        used[j] = True
                        found = True
                        break
                    if cj[-1] == ring[-1]:
                        ring.extend(list(reversed(cj))[1:])
                        used[j] = True
                        found = True
                        break
                if not found:
                    return None  # broken multipolygon → skip (OSM.pm:186)
            if len(ring) < 4:
                return None  # degenerate ring
            out[key].append(ring)
    return out


def self_intersection_breaks_oracle(
    pts: list[tuple],
    routing_nodes: set | None = None,
    max_road_nodes: int | None = None,
    barriers: set | None = None,
) -> list[int]:
    """Break indices for the reference's road-splitting loop
    (osm2mp.pl:715-756), covering W1 self-intersection, W2 max-road-nodes
    and W3 barrier breaks with their interacting state. Faithful rule:

    - `routing_nodes` is the reference's %nodid set (junction/crossroad
      vertices); `prev` tracks the LAST routing-node index seen.
      None (default) = every vertex is a routing node (the canonical
      standalone-chain variant: prev is always i-1).
    - vertex at i repeats one seen since the last break (osm2mp.pl:725):
      non-immediate repeat (pts[i] != pts[prev]) breaks at `prev`
      (:727-729); immediate repeat breaks at midpoint (i + prev) >> 1 and
      the midpoint vertex becomes a routing node (:731-737).
    - `rnod` (routing nodes since last break) hitting 1 + max_road_nodes
      breaks at `prev` (:743-747); an interior barrier vertex breaks at
      itself (:749-755).

    Split parts SHARE the break vertex: part k spans
    pts[B[k] .. B[k+1]] inclusive, where B = [0] + breaks + [len-1]
    (osm2mp.pl:770-775 slices chain[breaks[i]..breaks[i+1]]).
    """
    pts = [tuple(p) for p in pts]
    # NB: a passed-in set is mutated in place (midpoint breaks add routing
    # nodes, osm2mp.pl:736-737) so recursive re-splits see the additions
    nodid = set(pts) if routing_nodes is None else routing_nodes
    barrier_set = {tuple(p) for p in (barriers or ())}
    breaks: list[int] = []
    brk = 0
    rnod = 1
    prev = 0
    # O(n) repeat test: last-occurrence index per vertex; "seen since the
    # last break" ⇔ last occurrence ≥ brk (the last occurrence is the max,
    # so any in-window occurrence implies it) — replaces an O(n²)
    # set(pts[brk:i]) rebuild per step
    seen: dict[tuple, int] = {pts[0]: 0}
    for i in range(1, len(pts)):
        cnode = pts[i]
        if cnode in nodid:
            rnod += 1
        if seen.get(cnode, -1) >= brk:
            if cnode != pts[prev]:
                brk = prev
            else:
                brk = (i + prev) >> 1
                nodid.add(pts[brk])
            breaks.append(brk)
            rnod = 2
        elif max_road_nodes is not None and rnod == 1 + max_road_nodes:
            brk = prev
            breaks.append(brk)
            rnod = 2
        elif i < len(pts) - 1 and cnode in barrier_set:
            brk = i
            breaks.append(brk)
            rnod = 1
        if cnode in nodid:
            prev = i
        seen[cnode] = i
    return breaks


def split_parts_from_breaks(n: int, breaks: list[int]) -> list[tuple[int, int]]:
    """(start, end) inclusive index spans of the split parts — adjacent
    parts share the break vertex (osm2mp.pl:770-775, 814)."""
    bounds = [0] + list(breaks) + [n - 1]
    return [(bounds[k], bounds[k + 1]) for k in range(len(bounds) - 1)]


def merge_roads_oracle(
    roads: dict[str, dict], merge_cos: float = 0.2
) -> dict[str, list[str]]:
    """Road merging to fixpoint (osm2mp.pl:596-661).

    roads: {road_id: {"chain": [(lon,lat), ...], "attrs": hashable}}.
    A road A merges with B when attrs equal, A.chain[-1] == B.chain[0],
    and the turn angle cosine at the junction exceeds merge_cos
    (lcos(A[-2], A[-1], B[1]) > merge_cos). Canonical determinism: among
    candidates the best cosine wins, ties by road_id; each road may be
    consumed by at most one predecessor (best predecessor wins by the same
    rule); chains are then concatenated to fixpoint.

    Returns {head_road_id: [road ids merged, in order]}.
    """
    succ: dict[str, str] = {}
    claimed: dict[str, tuple] = {}  # road -> (cos, pred) best predecessor
    ids = sorted(roads)
    for a in ids:
        ra = roads[a]
        best: tuple | None = None
        for b in ids:
            if b == a:
                continue
            rb = roads[b]
            if ra["attrs"] != rb["attrs"]:
                continue
            if tuple(ra["chain"][-1]) != tuple(rb["chain"][0]):
                continue
            if len(ra["chain"]) < 2 or len(rb["chain"]) < 2:
                continue
            c = lcos(ra["chain"][-2], ra["chain"][-1], rb["chain"][1])
            if c <= merge_cos:
                continue
            if best is None or (-c, b) < (-best[0], best[1]):
                best = (c, b)
        if best is None:
            continue
        c, b = best
        # predecessor contention: best cosine, then smallest pred id
        if b not in claimed or (-c, a) < (-claimed[b][0], claimed[b][1]):
            if b in claimed:
                succ.pop(claimed[b][1], None)
            claimed[b] = (c, a)
            succ[a] = b
    # assemble chains: heads are roads that are nobody's successor; a CYCLE
    # of mergeable roads (e.g. a roundabout split into same-attr ways) has
    # no such head — canonical rule: break the cycle at its smallest road_id
    # (that road becomes the head), so loops merge deterministically instead
    # of vanishing or spinning
    heads = [r for r in ids if r not in claimed]
    out: dict[str, list[str]] = {}
    visited: set[str] = set()
    for h in heads:
        seq = [h]
        visited.add(h)
        cur = h
        while cur in succ:
            cur = succ[cur]
            seq.append(cur)
            visited.add(cur)
        out[h] = seq
    for r in ids:  # sorted → the min id of each cycle is reached first
        if r in visited:
            continue
        seq = [r]
        visited.add(r)
        cur = succ.get(r)
        while cur is not None and cur != r:
            seq.append(cur)
            visited.add(cur)
            cur = succ.get(cur)
        out[r] = seq
    return out


def stitch_coastlines_oracle(chains: dict[str, list]) -> list[list]:
    """Coastline stitching (lib/Coastlines.pm:50-99): chains keyed by first
    point; repeatedly append the chain whose first point equals the current
    chain's last point, until no progress. Deterministic: process seed chains
    in sorted key order. Returns the list of merged chains (closed ones are
    rings)."""
    by_first: dict[tuple, list] = {}
    for k in sorted(chains):
        ch = [tuple(p) for p in chains[k]]
        if ch[0] in by_first:
            continue  # duplicate start point — reference carps and skips (:56-59)
        by_first[ch[0]] = ch
    merged: list[list] = []
    while by_first:
        first = sorted(by_first)[0]
        ch = by_first.pop(first)
        while ch[0] != ch[-1] and ch[-1] in by_first:
            nxt = by_first.pop(ch[-1])
            ch = ch + nxt[1:]
        merged.append(ch)
    return merged


def classify_lakes_islands_oracle(rings: list[list]) -> dict:
    """G12 (lib/Coastlines.pm:198-241): closed coastline rings — CW = lake
    (water right of travel), CCW = island; an island whose first point is
    inside a lake becomes that lake's hole. Lakes considered in descending
    vertex count (:219). Returns {"lakes": [{"ring":…, "islands":[…]}],
    "free_islands": [...]}.
    """
    lakes = [r for r in rings if is_clockwise(r)]
    islands = [r for r in rings if not is_clockwise(r)]
    lakes.sort(key=len, reverse=True)
    out = {"lakes": [{"ring": r, "islands": []} for r in lakes], "free_islands": []}
    for isl in islands:
        placed = False
        for lk in out["lakes"]:
            px, py = isl[0]
            if points_in_ring([px], [py], lk["ring"])[0] >= 0:
                lk["islands"].append(isl)
                placed = True
                break
        if not placed:
            out["free_islands"].append(isl)
    return out


def nest_contours_oracle(contours: list[list[tuple]]) -> list[tuple[int, int, bool]]:
    """G6 — generic contour-group nesting (osm2mp.pl:1752-1764): repeatedly
    take the FIRST remaining contour as a polygon's outer ring; every later
    contour whose FIRST VERTEX lies inside that outer joins the polygon as
    an inner ring (the reference's single-level polygon_contains_point
    test — a ring nested inside an inner still joins the same polygon,
    a faithful quirk). Returns (contour_idx, polygon_no, is_inner)."""
    import numpy as np

    from ..geometry.kernels import points_in_ring

    out: list[tuple[int, int, bool]] = []
    rest = list(range(len(contours)))
    poly_no = 0
    while rest:
        head = rest.pop(0)
        out.append((head, poly_no, False))
        outer = contours[head]
        keep = []
        for j in rest:
            p = contours[j][0]
            if points_in_ring(np.array([p[0]]), np.array([p[1]]), outer)[0] == 1:
                out.append((j, poly_no, True))
            else:
                keep.append(j)
        rest = keep
        poly_no += 1
    return out
