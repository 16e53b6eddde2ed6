"""Pure-SQL PIP paths — the zero-Python fast lane of the spatial planner.

For CONVEX polygons, containment is a conjunction of edge cross-product
signs — a plain Column predicate that whole-stage codegen turns into
branch-free arithmetic. The planner (`pip_resolve_auto`) uses this lane when
every polygon in the layer is convex (plus convex holes via strict-inside
subtraction) and the layer is TINY (≤4 polygons — see the measured codegen
cliff below); otherwise it falls back to the Arrow filter-refine lane
(operators.pip_join.pip_resolve), which handles arbitrary rings.

Same canonical semantics as the kernel: on-edge counts inside (cross ≥ 0
over CCW edges); strictly-inside-hole subtracts; smallest-area rank order
decides overlaps. Equality with the Arrow lane is pytest-verified.

This matters at 100 TB: the flagship containment stage becomes pure JVM —
no Arrow serialization, no Python worker oversubscription (profiled 2×
whole-job speedup at local[32], where 32 JVM threads + 32 Python workers
would otherwise contend for 32 cores).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..geometry.kernels import signed_area
from ..spatial.index import PolygonIndex
from .pip_join import _area_ranks, pip_resolve


def is_convex(ring) -> bool:
    """True when the (closed) ring is convex (all cross products same sign)."""
    a = np.asarray(ring, dtype=np.float64)
    if (a[0] == a[-1]).all():
        a = a[:-1]
    n = len(a)
    if n < 3:
        return False
    sign = 0
    for i in range(n):
        p0, p1, p2 = a[i], a[(i + 1) % n], a[(i + 2) % n]
        cr = (p1[0] - p0[0]) * (p2[1] - p1[1]) - (p1[1] - p0[1]) * (p2[0] - p1[0])
        if cr != 0:
            s = 1 if cr > 0 else -1
            if sign == 0:
                sign = s
            elif s != sign:
                return False
    return True


def _ccw(ring) -> list:
    r = [(float(p[0]), float(p[1])) for p in np.asarray(ring, dtype=np.float64)]
    if signed_area(r) < 0:
        r = list(reversed(r))
    return r


def convex_inside_sql(ring, lon: str, lat: str, strict: bool = False) -> str:
    """SQL predicate: point inside the convex ring (on-edge inside unless
    strict). Edges taken CCW so inside = all crosses ≥ 0 (or > 0)."""
    r = _ccw(ring)
    if r[0] != r[-1]:
        r = r + [r[0]]
    op = ">" if strict else ">="
    terms = []
    # NB: `D` suffix — a bare x.y literal is DECIMAL in Spark SQL, and the
    # edge-delta subtractions would then run in BigDecimal arithmetic
    # (profiled 10× slower than the Arrow lane; with doubles this lane wins)
    for (x1, y1), (x2, y2) in zip(r[:-1], r[1:]):
        terms.append(
            f"(({x2!r}D - {x1!r}D) * ({lat} - {y1!r}D)"
            f" - ({y2!r}D - {y1!r}D) * ({lon} - {x1!r}D)) {op} 0"
        )
    return "(" + " AND ".join(terms) + ")"


def layer_is_convex(index: PolygonIndex) -> bool:
    for p in index.polygons.values():
        if len(p.outers) != 1:
            return False
        if not is_convex(p.outers[0]):
            return False
        for h in p.inners:
            if not is_convex(h):
                return False
    return True


def pip_resolve_auto(
    df: DataFrame,
    index: PolygonIndex,
    lon: str = "lon",
    lat: str = "lat",
    area_col: str = "area_id",
    keep_unmatched: bool = False,
    max_inline_polygons: int = 4,
) -> DataFrame:
    """The PIP planner: convex TINY layer → inline SQL lane (pure JVM);
    otherwise → Arrow filter-refine lane. Identical output either way.

    Measured cliff: beyond ~5 hexagons' worth of inlined cross-product
    predicates in one stage, Spark's generated method crosses the 64KB
    bytecode limit and whole-stage codegen silently falls back to
    interpreted mode — 10-80× slower than the Arrow lane
    (methodSplitThreshold does not rescue it). So the SQL lane is only for
    tiny dimension layers (countries/regions, ≤4 polygons); the Arrow lane
    (5.8M rows/s/8cores measured) is the scale path."""
    if len(index.polygons) <= max_inline_polygons and layer_is_convex(index):
        ranks = _area_ranks(index)
        order = sorted(ranks.items(), key=lambda kv: kv[1])
        flag_cols = {}
        out = df
        for i, (aid, _r) in enumerate(order):
            p = index.polygons[aid]
            cond = convex_inside_sql(p.outers[0], lon, lat)
            for h in p.inners:
                cond += f" AND NOT {convex_inside_sql(h, lon, lat, strict=True)}"
            col = f"__pipf{i}"
            flag_cols[col] = aid
            out = out.withColumn(col, F.expr(cond))
        whens = " ".join(
            f"WHEN {col} THEN '{aid}'" for col, aid in flag_cols.items()
        )
        out = out.withColumn(
            area_col, F.expr(f"CASE {whens} ELSE NULL END")
        ).drop(*flag_cols)
        return out if keep_unmatched else out.filter(F.col(area_col).isNotNull())
    return pip_resolve(
        df, index, lon=lon, lat=lat, area_col=area_col, keep_unmatched=keep_unmatched
    )
