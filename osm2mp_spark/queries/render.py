"""Gate-backed MP (Polish-format) text rendering — S7 in the hard gate.

The sink renderers in plans/sinks.py are Python-side formatting helpers
held to golden-text pytest fixtures. These queries render the SAME sections
entirely JVM-side (`format_string` / `concat_ws` / `transform` — whole-stage
codegen, no Python in the hot path) with an exact DuckDB `printf` oracle, so
the text-output surface gets rows+schema+hash gate coverage like every other
operator. Cross-engine float formatting safety is a property of THIS
coordinate grid, not of doubles in general: Java's Formatter (HALF_UP)
and C printf (half-even) DO diverge on exact .5 ties at 5 decimals, which
exist for doubles of the form odd/2^k ≤ 6 fractional bits (measured:
1/64 → '0.01563' Java vs '0.01562' C). The derived k/1e-4 coordinate grid
can never produce such values (odd/64 · 10^4 is never an integer, and the
non-dyadic grid points round to full-mantissa doubles), and 0/200k grid
values disagreed when measured. Do NOT reuse %.5f cross-engine for other
value families (e.g. the raster extents: 0.703125 = 45/64 IS a tie).
A pytest additionally pins each rendered string to the plans.sinks Python
renderer, so the gate transitively covers the sink format too (reference:
osm2mp.pl output templates, cfg/output-polish.yml).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.points import (
    LINEITEM_SEQ_SQL as _SEQ,
    LINEITEM_VKEY_SQL as _VKEY,
    derived_lat_sql,
    derived_lon_sql,
    with_derived_position,
)
from . import register

# Garmin city-POI type codes 0x100..0xb00 by size class (render_mp_points /
# cfg/output-polish.yml POI template); the class derives from the key.
_POI_TYPE = "CAST(256 + point_id % 11 * 256 AS INT)"

_POI_FMT = "[POI]\nType=0x%x\nLabel=%s\nData0=(%.5f,%.5f)\n[END]\n"


@register(
    "mp_poi_render",
    oracle=f"""
WITH pts AS (
  SELECT CAST(c_custkey AS BIGINT) AS point_id, c_name AS label,
         {derived_lon_sql('c_custkey')} AS lon,
         {derived_lat_sql('c_custkey')} AS lat
  FROM customer)
SELECT point_id,
       printf('{_POI_FMT}', {_POI_TYPE}, label, lat, lon) AS mp
FROM pts
""",
)
def mp_poi_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — [POI] sections (Type/Label/Data0) rendered per row in codegen;
    identical section layout to plans.sinks.render_mp_points."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").cast("bigint").alias("point_id"),
        F.col("c_name").alias("label"),
    )
    pts = with_derived_position(c, "point_id")
    return pts.select(
        "point_id",
        F.format_string(
            _POI_FMT, F.expr(_POI_TYPE), F.col("label"), F.col("lat"), F.col("lon")
        ).alias("mp"),
    )


# [POLYLINE] rendering: chains assembled from the lineitem fact table (the
# same ordered-chain shape as clip_chains), Data0 as the comma-joined
# (lat,lon) run, then the _common_fields sequence EndLevel? -> Type -> Label.
# The chain assembly (Spark aggregation AND oracle CTE) is shared between
# the polyline and road renderers — a formatting or seq-ordering fix lands
# in exactly one place per engine.
_PL_TYPE = "CAST(2 + chain_id % 6 AS INT)"
_PL_ENDLEVEL = "CAST(chain_id % 4 AS INT)"


def _chains_cte(with_count: bool = False) -> str:
    """Oracle-side chain assembly: pts + chains CTEs (DuckDB)."""
    n = ",\n         COUNT(*) AS n_pts" if with_count else ""
    return f"""pts AS (
  SELECT CAST(l_orderkey AS BIGINT) AS chain_id, {_SEQ} AS seq,
         {derived_lon_sql(_VKEY)} AS lon, {derived_lat_sql(_VKEY)} AS lat
  FROM lineitem),
chains AS (
  SELECT chain_id,
         array_to_string(LIST(printf('(%.5f,%.5f)', lat, lon) ORDER BY seq),
                         ',') AS data0{n}
  FROM pts GROUP BY chain_id)"""


def _spark_chains(spark: SparkSession, sf_dir: str,
                  with_count: bool = False) -> DataFrame:
    """Spark-side chain assembly: (chain_id, data0[, n_pts]) — sort_array
    over (seq, rendered-point) structs, one shuffle, no window."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").cast("bigint").alias("chain_id"),
        F.expr(_SEQ).alias("seq"),
        F.expr(_VKEY).alias("__vkey"),
    )
    pts = with_derived_position(li, "__vkey")
    aggs = [
        F.expr(
            "concat_ws(',', transform(sort_array(collect_list(p)), x -> x.txt))"
        ).alias("data0")
    ]
    if with_count:
        aggs.append(F.count("*").alias("n_pts"))
    return (
        pts.select(
            "chain_id",
            F.struct(
                F.col("seq"),
                F.format_string(
                    "(%.5f,%.5f)", F.col("lat"), F.col("lon")
                ).alias("txt"),
            ).alias("p"),
        )
        .groupBy("chain_id")
        .agg(*aggs)
    )


@register(
    "mp_polyline_render",
    oracle=f"""
WITH {_chains_cte()}
SELECT chain_id,
       '[POLYLINE]' || chr(10) || 'Data0=' || data0 || chr(10)
       || CASE WHEN {_PL_ENDLEVEL} > 0
               THEN 'EndLevel=' || {_PL_ENDLEVEL} || chr(10) ELSE '' END
       || printf('Type=0x%x', {_PL_TYPE}) || chr(10)
       || printf('Label=chain %d', chain_id) || chr(10)
       || '[END]' || chr(10) AS mp
FROM chains
""",
)
def mp_polyline_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — routable-map [POLYLINE] sections: per-chain ordered Data0 run
    (sort_array over (seq, rendered-point) structs — one shuffle, no window)
    plus the EndLevel/Type/Label field sequence of plans.sinks
    render_mp_polyline. All string assembly stays JVM-side; at 10^12 rows
    the render is embarrassingly parallel and the only exchange is the
    per-chain groupBy."""
    chains = _spark_chains(spark, sf_dir)
    return chains.select(
        "chain_id",
        F.concat(
            F.lit("[POLYLINE]\nData0="),
            F.col("data0"),
            F.lit("\n"),
            F.expr(
                f"CASE WHEN {_PL_ENDLEVEL} > 0 "
                f"THEN concat('EndLevel=', {_PL_ENDLEVEL}, '\n') ELSE '' END"
            ),
            F.format_string("Type=0x%x\n", F.expr(_PL_TYPE)),
            F.format_string("Label=chain %d\n", F.col("chain_id")),
            F.lit("[END]\n"),
        ).alias("mp"),
    )


# Routable road [POLYLINE] (render_mp_road twin): RouteParams carries the
# Garmin speed class (same thresholds as functions/garmin speed_code and
# plans.sinks._speed_code), DirIndicator only for oneways, Nod lines bind
# the first and last chain positions to routing node ids.
_RD_SPEED = "CAST(chain_id % 141 AS INT)"          # kmh 0..140
_RD_CLASS = "CAST(chain_id % 5 AS INT)"
_RD_ONEWAY = "CAST(chain_id % 2 AS INT)"
_RD_TOLL = "CASE WHEN chain_id % 3 = 0 THEN 1 ELSE 0 END"

_SPEED_CODE = """CASE WHEN spd >= 120 THEN 7 WHEN spd >= 100 THEN 6
 WHEN spd >= 85 THEN 5 WHEN spd >= 70 THEN 4 WHEN spd >= 50 THEN 3
 WHEN spd >= 30 THEN 2 WHEN spd >= 10 THEN 1 ELSE 0 END"""


@register(
    "mp_road_render",
    oracle=f"""
WITH {_chains_cte(with_count=True)},
attrs AS (
  SELECT chain_id, data0, n_pts, {_RD_SPEED} AS spd FROM chains)
SELECT chain_id,
       '[POLYLINE]' || chr(10) || 'Data0=' || data0 || chr(10)
       || printf('RoadID=%d', chain_id) || chr(10)
       || CASE WHEN {_RD_ONEWAY} = 1 THEN 'DirIndicator=1' || chr(10)
               ELSE '' END
       || printf('RouteParams=%d,%d,%d,%d,0,0,0,0,0,0,0,0',
                 {_SPEED_CODE}, {_RD_CLASS}, {_RD_ONEWAY}, {_RD_TOLL})
       || chr(10)
       || printf('Type=0x%x', CAST(2 + chain_id % 6 AS INT)) || chr(10)
       || printf('Label=road %d', chain_id) || chr(10)
       || printf('Nod0=0,%d,0', chain_id * 2) || chr(10)
       || printf('Nod1=%d,%d,0', n_pts - 1, chain_id * 2 + 1) || chr(10)
       || '[END]' || chr(10) AS mp
FROM attrs
""",
)
def mp_road_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — routable road [POLYLINE] sections: ordered Data0 run, RoadID,
    DirIndicator (oneway only), RouteParams with the Garmin speed-class
    CASE, Type/Label, and Nod lines binding the chain's first/last
    positions to routing node ids — all JVM-side, one groupBy."""
    chains = _spark_chains(spark, sf_dir, with_count=True).withColumn(
        "spd", F.expr(_RD_SPEED)
    )
    return chains.select(
        "chain_id",
        F.concat(
            F.lit("[POLYLINE]\nData0="), F.col("data0"), F.lit("\n"),
            F.format_string("RoadID=%d\n", F.col("chain_id")),
            F.expr(
                f"CASE WHEN {_RD_ONEWAY} = 1 THEN 'DirIndicator=1\n' "
                f"ELSE '' END"
            ),
            F.format_string(
                "RouteParams=%d,%d,%d,%d,0,0,0,0,0,0,0,0\n",
                F.expr(_SPEED_CODE), F.expr(_RD_CLASS),
                F.expr(_RD_ONEWAY), F.expr(_RD_TOLL),
            ),
            F.format_string("Type=0x%x\n", F.expr("CAST(2 + chain_id % 6 AS INT)")),
            F.format_string("Label=road %d\n", F.col("chain_id")),
            F.format_string("Nod0=0,%d,0\n", F.col("chain_id") * 2),
            F.format_string(
                "Nod1=%d,%d,0\n", F.col("n_pts") - 1, F.col("chain_id") * 2 + 1
            ),
            F.lit("[END]\n"),
        ).alias("mp"),
    )


# [POLYGON] rendering (render_mp_polygon twin): one Data line per contour
# (outer ring; every 4th polygon also a hole), Type/Label, EntryPoint
# lines (J7 entrances) for every 5th polygon. Ring vertices derive from
# shifted part keys through the shared exact point generator, so each
# vertex is bit-identical cross-engine.
def _ring_pts(key: str, offs: list[int]) -> list[tuple[str, str]]:
    return [
        (derived_lon_sql(f"({key} + {o})"), derived_lat_sql(f"({key} + {o})"))
        for o in offs
    ]


def _ring_sql(key: str, offs: list[int]) -> str:
    """Closed-ring Data body: derived vertices, first repeated last."""
    pts = _ring_pts(key, offs)
    pts = pts + [pts[0]]
    return " || ',' || ".join(
        f"printf('(%.5f,%.5f)', {lat}, {lon})" for lon, lat in pts
    )


_PG_OUTER = [0, 210000, 420000, 630000]
_PG_HOLE = [70000, 140000, 280000]


@register(
    "mp_polygon_render",
    oracle=f"""
WITH polys AS (
  SELECT CAST(p_partkey AS BIGINT) AS poly_id FROM part)
SELECT poly_id,
       '[POLYGON]' || chr(10)
       || 'Data0=' || {_ring_sql('poly_id', _PG_OUTER)} || chr(10)
       || CASE WHEN poly_id % 4 = 0
               THEN 'Data0=' || {_ring_sql('poly_id', _PG_HOLE)} || chr(10)
               ELSE '' END
       || printf('Type=0x%x', CAST(19 + poly_id % 3 AS INT)) || chr(10)
       || printf('Label=area %d', poly_id) || chr(10)
       || CASE WHEN poly_id % 5 = 0
               THEN printf('EntryPoint=(%.5f,%.5f),1',
                           {derived_lat_sql('poly_id')},
                           {derived_lon_sql('poly_id')}) || chr(10)
               ELSE '' END
       || '[END]' || chr(10) AS mp
FROM polys
""",
)
def mp_polygon_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — [POLYGON] sections: one Data0 line per contour (outer ring +
    conditional hole), Type/Label, conditional EntryPoint — the full
    multi-contour layout of plans.sinks.render_mp_polygon, rendered
    row-wise in codegen (no shuffle at all: contours derive from the
    polygon's own key)."""
    polys = spark.read.parquet(f"{sf_dir}/part.parquet").selectExpr(
        "CAST(p_partkey AS BIGINT) AS poly_id"
    )
    return polys.selectExpr(
        "poly_id",
        f"""concat(
  '[POLYGON]\n',
  'Data0=', {_ring_sql('poly_id', _PG_OUTER)}, '\n',
  CASE WHEN poly_id % 4 = 0
       THEN concat('Data0=', {_ring_sql('poly_id', _PG_HOLE)}, '\n')
       ELSE '' END,
  format_string('Type=0x%x\n', CAST(19 + poly_id % 3 AS INT)),
  format_string('Label=area %d\n', poly_id),
  CASE WHEN poly_id % 5 = 0
       THEN format_string('EntryPoint=(%.5f,%.5f),1\n',
                          {derived_lat_sql('poly_id')},
                          {derived_lon_sql('poly_id')})
       ELSE '' END,
  '[END]\n') AS mp""",
    )


# [Restrict] / [Sign] sections (render_mp_restriction / _destination_sign
# twins): node and road ids derive from the order key; RestrParam only for
# every 4th restriction, SignParam carries the exit label.
@register(
    "mp_restriction_render",
    oracle=f"""
SELECT CAST(o_orderkey AS BIGINT) AS rel_id,
       '[Restrict]' || chr(10)
       || printf('TraffPoints=%d,%d,%d', o_orderkey * 3, o_orderkey * 3 + 1,
                 o_orderkey * 3 + 2) || chr(10)
       || printf('TraffRoads=%d,%d', o_orderkey * 2, o_orderkey * 2 + 1)
       || chr(10)
       || CASE WHEN o_orderkey % 4 = 0
               THEN 'RestrParam=0,1,1,1' || chr(10) ELSE '' END
       || '[END-Restrict]' || chr(10) AS mp
FROM orders WHERE o_orderkey % 10 = 0
""",
)
def mp_restriction_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — [Restrict] sections (turn restrictions J11/I5-I7 feed the
    sink this renders): TraffPoints/TraffRoads id lines + conditional
    vehicle-mask RestrParam."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        "o_orderkey % 10 = 0"
    )
    return o.selectExpr(
        "CAST(o_orderkey AS BIGINT) AS rel_id",
        """concat(
  '[Restrict]\n',
  format_string('TraffPoints=%d,%d,%d\n', o_orderkey * 3,
                o_orderkey * 3 + 1, o_orderkey * 3 + 2),
  format_string('TraffRoads=%d,%d\n', o_orderkey * 2, o_orderkey * 2 + 1),
  CASE WHEN o_orderkey % 4 = 0 THEN 'RestrParam=0,1,1,1\n' ELSE '' END,
  '[END-Restrict]\n') AS mp""",
    )


@register(
    "mp_sign_render",
    oracle=f"""
SELECT CAST(o_orderkey AS BIGINT) AS rel_id,
       '[Sign]' || chr(10)
       || printf('SignPoints=%d,%d,%d', o_orderkey * 3, o_orderkey * 3 + 1,
                 o_orderkey * 3 + 2) || chr(10)
       || printf('SignRoads=%d,%d', o_orderkey * 2, o_orderkey * 2 + 1)
       || chr(10)
       || printf('SignParam=T,exit %d', CAST(o_orderkey % 50 AS INT))
       || chr(10)
       || '[END-Sign]' || chr(10) AS mp
FROM orders WHERE o_orderkey % 15 = 0
""",
)
def mp_sign_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — destination-sign [Sign] sections with the exit-label
    SignParam."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        "o_orderkey % 15 = 0"
    )
    return o.selectExpr(
        "CAST(o_orderkey AS BIGINT) AS rel_id",
        """concat(
  '[Sign]\n',
  format_string('SignPoints=%d,%d,%d\n', o_orderkey * 3,
                o_orderkey * 3 + 1, o_orderkey * 3 + 2),
  format_string('SignRoads=%d,%d\n', o_orderkey * 2, o_orderkey * 2 + 1),
  format_string('SignParam=T,exit %d\n', CAST(o_orderkey % 50 AS INT)),
  '[END-Sign]\n') AS mp""",
    )


# --- render-a-tile end-to-end (VERDICT r04 ask #6): dense raster tiles →
# vector rectangles → MP [POLYGON] sections, one pipeline.


def _tile_rect_oracle() -> str:
    from .raster import _G, _LAT_PP, _LON_PP, _NX, _runs_cte

    # global pixel corners: gx = (tile % NX)*G + px, gy = (tile // NX)*G+py;
    # rect right/top edges sit at px1+1 / py1+1 pixel boundaries. %.6f is
    # tie-free here: corners are multiples of 45/32 resp. 45/64, whose
    # denominators divide 10^6, so both engines print the exact expansion
    # (%.5f would hit half-way ties — see mp render docstrings).
    lon0 = f"(((tile_id % {_NX}) * {_G} + px0) * {_LON_PP!r} - 180.0)"
    lon1 = f"(((tile_id % {_NX}) * {_G} + px1 + 1) * {_LON_PP!r} - 180.0)"
    lat0 = f"(((tile_id // {_NX}) * {_G} + py0) * {_LAT_PP!r} - 90.0)"
    lat1 = f"(((tile_id // {_NX}) * {_G} + py1 + 1) * {_LAT_PP!r} - 90.0)"
    ring = " || ',' || ".join(
        f"printf('(%.6f,%.6f)', {la}, {lo})"
        for la, lo in [(lat0, lon0), (lat0, lon1), (lat1, lon1),
                       (lat1, lon0), (lat0, lon0)]
    )
    return f"""
WITH {_runs_cte('duckdb')},
vgrp AS (
  SELECT tile_id, px0, px1, py, n_points,
         py - CAST(ROW_NUMBER() OVER (PARTITION BY tile_id, px0, px1
                                      ORDER BY py) AS INT) AS grp
  FROM segs),
rects AS (
  SELECT tile_id, px0, px1, MIN(py) AS py0, MAX(py) AS py1,
         CAST(SUM(n_points) AS BIGINT) AS n_points
  FROM vgrp GROUP BY tile_id, px0, px1, grp)
SELECT tile_id, px0, py0,
       '[POLYGON]' || chr(10)
       || 'Data0=' || {ring} || chr(10)
       || printf('Type=0x%x', CAST(76 + (px1 - px0 + 1) * (py1 - py0 + 1) % 3 AS INT)) || chr(10)
       || printf('Label=tile %d rect (%d pts)', tile_id, n_points) || chr(10)
       || '[END]' || chr(10) AS mp
FROM rects
"""


@register("mp_tile_render", oracle=_tile_rect_oracle())
def mp_tile_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render-a-tile end-to-end: the raster pipeline's per-tile occupancy
    rectangles (raster_polygonize — runs → gaps-and-islands rect merge)
    rendered as MP [POLYGON] sections with exact geographic Data0 rings.
    Pixel→degree corners are multiples of 45/32 (lon) / 45/64 (lat) whose
    denominators divide 10^6, so %.6f prints the exact binary double in
    both engines — no rounding tie can diverge (the %.5f pitfall)."""
    from .raster import _G, _LAT_PP, _LON_PP, _NX, _spark_runs, rects_from_runs

    rects = rects_from_runs(_spark_runs(spark, sf_dir))
    lon0 = f"(((tile_id % {_NX}) * {_G} + px0) * {_LON_PP!r}D - 180.0D)"
    lon1 = f"(((tile_id % {_NX}) * {_G} + px1 + 1) * {_LON_PP!r}D - 180.0D)"
    lat0 = f"(((tile_id DIV {_NX}) * {_G} + py0) * {_LAT_PP!r}D - 90.0D)"
    lat1 = f"(((tile_id DIV {_NX}) * {_G} + py1 + 1) * {_LAT_PP!r}D - 90.0D)"
    ring = ", ',', ".join(
        f"format_string('(%.6f,%.6f)', {la}, {lo})"
        for la, lo in [(lat0, lon0), (lat0, lon1), (lat1, lon1),
                       (lat1, lon0), (lat0, lon0)]
    )
    return rects.selectExpr(
        "tile_id", "px0", "py0",
        f"""concat(
  '[POLYGON]\n',
  'Data0=', {ring}, '\n',
  format_string('Type=0x%x\n',
                CAST(76 + (px1 - px0 + 1) * (py1 - py0 + 1) % 3 AS INT)),
  format_string('Label=tile %d rect (%d pts)\n', tile_id, n_points),
  '[END]\n') AS mp""",
    )
