"""Sinks (SURVEY §2.1 S7-S11): per-tile partitioned writes and the
Polish-format text renderer.

- S8/S11 (multiout / per-tile re-emit): `write_per_tile` — the native Spark
  shape is `df.write.partitionBy('tile_id')`; every tile becomes a
  directory, writable in one pass regardless of tile count (the reference
  needed RAM-bounded multipass batches, _old/splitter.pl:314-334).
- S9 (shapefile layers): `write_layers` — one partitioned parquet dataset
  per layer with the fixed per-layer schema, the columnar stand-in for the
  5 DBF schemas of WriterMPC.pm:28-89.
- S7 (MP text): `render_mp_points` — golden-text rendering of point
  sections ([POI] blocks, cfg/output-polish.yml semantics) used by tests;
  production output stays columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def write_per_tile(df: DataFrame, out_dir: str, tile_col: str = "tile_id",
                   fmt: str = "parquet") -> None:
    """S8/S11 — route each record to its tile's output in one pass."""
    df.write.mode("overwrite").partitionBy(tile_col).format(fmt).save(out_dir)


# --- S9: the five fixed DBF layer schemas (WriterMPC.pm:28-89) ---------------
# DBF 'C'(width) → string, 'N' → long. Field NAMES and order are the
# reference's; widths become metadata (parquet has no fixed-width char).

def _fields(spec: list[tuple[str, str, int | None]]) -> list[StructField]:
    return [
        StructField(
            name,
            StringType() if kind == "C" else LongType(),
            True,
            {"dbf_width": width} if width is not None else {},
        )
        for name, kind, width in spec
    ]


_COMMON = [("NAME", "C", 120), ("GRMN_TYPE", "C", 32)]

_ROAD = _COMMON + [
    ("ROUTE_LVL", "N", 1), ("SPD_LIMIT", "N", 3), ("SPD_FORMAT", "N", 1),
    ("IS_LGL_SPD", "N", 1), ("ROUTE_SPD", "N", 3), ("ONE_WAY", "N", 1),
    ("TOLL_ROAD", "N", 1), ("LINK_ID", "N", None), ("ACC_MASK", "C", 10),
    ("CNTRL_ACC", "N", 1), ("IS_TUNNEL", "N", 1), ("TURN_RSTRS", "C", 64),
    ("L_CITY", "C", 64), ("R_CITY", "C", 64), ("L_STATE", "C", 64),
    ("R_STATE", "C", 64), ("L_COUNTRY", "C", 64), ("R_COUNTRY", "C", 64),
    ("L_PCODE", "C", 8), ("R_PCODE", "C", 8),
]

LAYER_SCHEMAS: dict[str, StructType] = {
    "points": StructType(_fields(_COMMON + [
        ("STRT_ADDR", "C", 64), ("CITY", "C", 64), ("STATE", "C", 64),
        ("COUNTRY", "C", 64), ("PCODE", "C", 64), ("PHONE", "C", 64),
    ])),
    "areas": StructType(_fields(_COMMON + [
        ("HGT_DP_FMT", "C", 3), ("HGT_DP", "N", 5),
    ])),
    "lines": StructType(_fields(_COMMON)),
    "roads": StructType(_fields(_ROAD)),
    "addr_pseudoroads": StructType(_fields(_ROAD + [
        ("L_FORMAT", "N", 1), ("L_PARITY", "N", 1), ("L_FROM_ADR", "C", 4),
        ("L_TO_ADR", "C", 4), ("R_PARITY", "N", 1), ("R_FORMAT", "N", 1),
        ("R_FROM_ADR", "C", 4), ("R_TO_ADR", "C", 4),
        ("Z_LVL_STRT", "N", 1), ("Z_LVL_END", "N", 1),
    ])),
}


def conform_to_layer(df: DataFrame, layer: str) -> DataFrame:
    """Project/cast a frame onto a layer's fixed schema: missing attribute
    columns become NULL, extra columns are kept AFTER the fixed prefix
    (geometry etc.), fixed columns are cast to the DBF-mapped type."""
    from pyspark.sql import functions as F

    schema = LAYER_SCHEMAS[layer]
    fixed = []
    have = {c.lower(): c for c in df.columns}
    for f in schema.fields:
        src = have.get(f.name.lower())
        col = (
            F.col(src).cast(f.dataType) if src is not None
            else F.lit(None).cast(f.dataType)
        )
        fixed.append(col.alias(f.name))
    fixed_names = {f.name.lower() for f in schema.fields}
    extras = [F.col(c) for c in df.columns if c.lower() not in fixed_names]
    return df.select(*fixed, *extras)


def write_layers(layers: dict[str, DataFrame], out_dir: str) -> None:
    """S9 — one dataset per layer, conformed to the fixed per-layer schema
    (the columnar stand-in for the 5 DBF schemas of WriterMPC.pm:28-89)."""
    for name, df in layers.items():
        out = conform_to_layer(df, name) if name in LAYER_SCHEMAS else df
        out.write.mode("overwrite").parquet(f"{out_dir}/{name}")


def render_mp_points(rows, default_level: int = 0) -> str:
    """S7 — Polish-format [POI] sections from (type_code, label, lon, lat)
    rows. Data(level)=(lat,lon) per the MP spec; deterministic row order is
    the caller's job (sort by natural key)."""
    out = []
    for type_code, label, lon, lat in rows:
        out.append(
            "[POI]\n"
            f"Type=0x{type_code:x}\n"
            f"Label={label}\n"
            f"Data{default_level}=({lat:.5f},{lon:.5f})\n"
            "[END]\n"
        )
    return "\n".join(out)


# --- Polish-format section renderers (cfg/output-polish.yml templates) -------

def _speed_code(speed) -> int:
    """Garmin speed class (WriterTT speed_code; same thresholds as the
    speed_kernels query)."""
    s = speed or 0
    for code, bound in ((7, 120), (6, 100), (5, 85), (4, 70), (3, 50),
                        (2, 30), (1, 10)):
        if s >= bound:
            return code
    return 0


def _latlons(chain) -> str:
    # Data lines are (lat,lon) pairs — cfg/output-polish.yml:125-129
    return ",".join(f"({lat:.5f},{lon:.5f})" for lon, lat in chain)


def _common_fields(data: dict) -> list[str]:
    """_common_fields template (cfg/output-polish.yml:71-89): EndLevel,
    Type, Label (extra Label override; road_ref+refs prefix rule),
    remaining extra fields in sorted key order."""
    out = []
    level_l = data.get("level_l") or 0
    level_h = data.get("level_h")
    if level_h and level_h > level_l:
        out.append(f"EndLevel={level_h}")
    out.append(f"Type={data['type']}")
    extra = dict(data.get("extra_fields") or {})
    label = data.get("name")
    if "Label" in extra:
        label = extra.pop("Label")
    refs = data.get("refs")
    if refs and data.get("road_ref"):
        joined = "-".join(sorted(set(refs)))
        label = f"{data['road_ref']}{joined}" + (f" {label}" if label else "")
    if label is not None:
        out.append(f"Label={label}")
    for k in sorted(extra):
        out.append(f"{k}={extra[k]}")
    return out


def render_mp_polyline(data: dict) -> str:
    """[POLYLINE] section (cfg/output-polish.yml:122-132)."""
    lines = ["[POLYLINE]",
             f"Data{data.get('level_l') or 0}={_latlons(data['chain'])}"]
    lines += _common_fields(data)
    lines.append("[END]")
    return "\n".join(lines) + "\n"


def render_mp_road(data: dict) -> str:
    """Routable road [POLYLINE] (cfg/output-polish.yml:135-153): RoadID,
    DirIndicator, RouteParams=(speed_code, class, oneway, toll, access),
    Nod lines binding chain positions to routing node ids."""
    lines = ["[POLYLINE]", f"Data0={_latlons(data['chain'])}",
             f"RoadID={data['road_id']}"]
    if data.get("oneway"):
        lines.append("DirIndicator=1")
    lines.append(
        "RouteParams="
        f"{_speed_code(data.get('speed'))},{data.get('road_class', 0)},"
        f"{data.get('oneway') or 0},{data.get('toll') or 0},"
        f"{data.get('access_flags') or '0,0,0,0,0,0,0,0'}"
    )
    lines += _common_fields(data)
    for n, (pos, node_id, *arc) in enumerate(data.get("nod") or []):
        lines.append(f"Nod{n}={pos},{node_id},{arc[0] if arc else 0}")
    lines.append("[END]")
    return "\n".join(lines) + "\n"


def render_mp_polygon(data: dict) -> str:
    """[POLYGON] section (cfg/output-polish.yml:104-119): one Data line per
    contour, optional EntryPoint lines (J7 entrances)."""
    level = data.get("level_l") or 0
    lines = ["[POLYGON]"]
    for contour in data["contours"]:
        lines.append(f"Data{level}={_latlons(contour)}")
    lines += _common_fields(data)
    for (lon, lat), kind in data.get("entrance") or []:
        lines.append(f"EntryPoint=({lat:.5f},{lon:.5f}),{kind}")
    lines.append("[END]")
    return "\n".join(lines) + "\n"


def render_mp_restriction(opts: dict) -> str:
    """[Restrict] section (cfg/output-polish.yml:157-168)."""
    lines = ["[Restrict]",
             f"TraffPoints={opts['node_from']},{opts['node_via']},{opts['node_to']}",
             f"TraffRoads={opts['road_from']},{opts['road_to']}"]
    if opts.get("param"):
        lines.append(f"RestrParam={opts['param']}")
    lines.append("[END-Restrict]")
    return "\n".join(lines) + "\n"


def render_mp_destination_sign(opts: dict) -> str:
    """[Sign] section (cfg/output-polish.yml:173-183)."""
    lines = ["[Sign]",
             f"SignPoints={opts['node_from']},{opts['node_via']},{opts['node_to']}",
             f"SignRoads={opts['road_from']},{opts['road_to']}"]
    if opts.get("param"):
        lines.append(f"SignParam={opts['param']}")
    lines.append("[END-Sign]")
    return "\n".join(lines) + "\n"
