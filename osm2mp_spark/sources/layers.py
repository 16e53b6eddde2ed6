"""Deterministic polygon layer fixtures (FIXTURES.md §2-3).

The address hierarchy (country → region → city, mirroring the reference's
`cfg/addressing.yml` addr_levels), the access areas with 8-bit transport
masks (`cfg/settings-access.yml` transport_types order), and a rectangular
map boundary. All literal coordinates are plain Python floats shared between
the Spark engine side and the DuckDB oracle SQL (via `repr`), so both parse
the identical IEEE double.

City set per FIXTURES.md: 10 plain convex hexagons + 1 city with a hole +
1 overlapping pair (smallest-area-wins canonical rule, replacing the
reference's nondeterministic first-match, lib/AreaTree.pm:67).
"""

from __future__ import annotations

import math

from ..geometry.kernels import shoelace_area


def _hexagon(cx: float, cy: float, r: float) -> list[tuple[float, float]]:
    """Convex hexagon (CCW, closed) — vertices computed once at import."""
    pts = [
        (cx + r * math.cos(math.radians(a)), cy + r * math.sin(math.radians(a)))
        for a in range(0, 360, 60)
    ]
    return pts + [pts[0]]


def _rect(x0: float, y0: float, x1: float, y1: float) -> list[tuple[float, float]]:
    """CCW closed rectangle ring."""
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]


COUNTRIES = [
    {"area_id": "C1", "outer": _rect(-170.0, -75.0, -10.0, 75.0), "inner": None},
    {"area_id": "C2", "outer": _rect(10.0, -75.0, 170.0, 75.0), "inner": None},
]

REGIONS = [
    {"area_id": "R1", "outer": _rect(-165.0, -70.0, -95.0, -5.0), "inner": None},
    {"area_id": "R2", "outer": _rect(-165.0, 0.0, -95.0, 70.0), "inner": None},
    {"area_id": "R3", "outer": _rect(15.0, -70.0, 85.0, -5.0), "inner": None},
    {"area_id": "R4", "outer": _rect(95.0, -70.0, 165.0, 70.0), "inner": None},
]

# (city_id, center, hex radius) — centers are also the kNN anchors (J15)
_CITY_DEFS = [
    ("city01", -150.0, -40.0, 10.0),
    ("city02", -120.0, -30.0, 7.0),
    ("city03", -110.0, -60.0, 9.0),
    ("city04", -150.0, 30.0, 9.0),
    ("city05", -120.0, 50.0, 11.0),
    ("city06", 30.0, -40.0, 13.0),
    ("city07", 60.0, -25.0, 8.0),
    ("city08", 75.0, -55.0, 9.0),
    ("city09", 110.0, 30.0, 12.0),
    ("city10", 140.0, 50.0, 9.0),
    # hole city: hexagon with a square hole (tests hole subtraction, J2)
    ("city11", -110.0, 20.0, 8.0),
    # overlapping pair (tests smallest-area-wins): city13 ⊂∩ city12
    ("city12", 120.0, 5.0, 10.0),
    ("city13", 126.0, 9.0, 6.0),
]

_CITY11_HOLE = _rect(-112.0, 18.0, -108.0, 22.0)

CITIES = []
for _cid, _cx, _cy, _r in _CITY_DEFS:
    _outer = _hexagon(_cx, _cy, _r)
    _inner = _CITY11_HOLE if _cid == "city11" else None
    _area = shoelace_area(_outer) - (shoelace_area(_inner) if _inner else 0.0)
    CITIES.append(
        {
            "area_id": _cid,
            "center": (_cx, _cy),
            "outer": _outer,
            "inner": _inner,
            "area": _area,
        }
    )

# access areas (J5): rectangles + 8-bit transport masks, bit order
# emergency, delivery, car, bus, taxi, foot, bike, truck (settings-access.yml)
ACCESS_AREAS = [
    {"area_id": "acc_noride", "outer": _rect(-60.0, -20.0, -20.0, 20.0), "mask": 0b00000110},
    {"area_id": "acc_nofoot", "outer": _rect(-40.0, 0.0, 20.0, 40.0), "mask": 0b00100000},
    {"area_id": "acc_trucks", "outer": _rect(40.0, 10.0, 90.0, 55.0), "mask": 0b00000001},
]

# map boundary for clipping stages (FIXTURES.md §2): rectangle, CCW closed
BOUNDARY = _rect(-90.0, -45.0, 90.0, 45.0)


def city_polygons():
    """CITIES as spatial.index.Polygon objects."""
    from ..spatial.index import Polygon

    return [
        Polygon(
            c["area_id"],
            [c["outer"]],
            [c["inner"]] if c["inner"] else [],
            tags={"center": c["center"]},
        )
        for c in CITIES
    ]


def region_polygons():
    from ..spatial.index import Polygon

    return [Polygon(r["area_id"], [r["outer"]]) for r in REGIONS]


def country_polygons():
    from ..spatial.index import Polygon

    return [Polygon(c["area_id"], [c["outer"]]) for c in COUNTRIES]


# ---------------------------------------------------------------------------
# SQL fragment builders for the DuckDB oracle (shared literals via repr)
# ---------------------------------------------------------------------------

def edges_values_sql() -> str:
    """VALUES rows (city_id, area, x1, y1, x2, y2) for all city outer rings."""
    rows = []
    for c in CITIES:
        ring = c["outer"]
        for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
            rows.append(
                f"('{c['area_id']}', {c['area']!r}, {x1!r}, {y1!r}, {x2!r}, {y2!r})"
            )
    return ",\n    ".join(rows)


def hole_edges_values_sql() -> str:
    rows = []
    for c in CITIES:
        if not c["inner"]:
            continue
        ring = c["inner"]
        for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
            rows.append(f"('{c['area_id']}', {x1!r}, {y1!r}, {x2!r}, {y2!r})")
    return ",\n    ".join(rows)


def centers_values_sql() -> str:
    """VALUES rows (city_id, cx, cy) for kNN."""
    return ",\n    ".join(
        f"('{c['area_id']}', {c['center'][0]!r}, {c['center'][1]!r})" for c in CITIES
    )


def access_values_sql() -> str:
    rows = []
    for a in ACCESS_AREAS:
        r = a["outer"]
        x0, y0 = r[0]
        x1, y1 = r[2]
        rows.append(f"('{a['area_id']}', {a['mask']}, {x0!r}, {y0!r}, {x1!r}, {y1!r})")
    return ",\n    ".join(rows)
