"""Scalar-kernel + ring-math queries (SURVEY §2.9, §2.3 G7/G9, §2.5 A5/A9).
All exact-arithmetic (quantized cross products) so the oracle hash matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.points import derived_lat_sql, derived_lon_sql
from . import register

# ---------------------------------------------------------------------------
# speed class bucketing + speed prediction (WriterTT.pm:256-262,
# osm2mp.pl:1596-1618)
# ---------------------------------------------------------------------------

@register(
    "speed_kernels",
    oracle="""
WITH src AS (
  SELECT CAST(l_orderkey AS BIGINT) AS way_id, {seq} AS seq,
         CAST(l_quantity * 3 AS BIGINT) AS rawspeed,
         (l_suppkey % 5 = 0) AS is_mph
  FROM lineitem)
SELECT way_id, seq,
       CAST(CASE WHEN is_mph THEN FLOOR(rawspeed * 1609.0 / 1e3) ELSE rawspeed END
            AS BIGINT) AS speed_kmh,
       CAST(CASE WHEN rawspeed >= 120 THEN 7 WHEN rawspeed >= 100 THEN 6
                 WHEN rawspeed >= 85 THEN 5 WHEN rawspeed >= 70 THEN 4
                 WHEN rawspeed >= 50 THEN 3 WHEN rawspeed >= 30 THEN 2
                 WHEN rawspeed >= 10 THEN 1 ELSE 0 END AS INT) AS speed_class
FROM src
""".format(seq=__import__("osm2mp_spark.sources.points", fromlist=["LINEITEM_SEQ_SQL"]).LINEITEM_SEQ_SQL),
)
def speed_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 — mph→km/h conversion (exact integer arithmetic) + the
    reference's speed-code threshold table (0,10,30,50,70,85,100,120)."""
    from ..sources.points import LINEITEM_SEQ_SQL as seq

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "CAST(l_orderkey AS BIGINT) AS way_id",
        f"{seq} AS seq",
        "CAST(l_quantity * 3 AS BIGINT) AS rawspeed",
        "(l_suppkey % 5 = 0) AS is_mph",
    )
    kmh = F.when(
        F.col("is_mph"), F.expr("FLOOR(rawspeed * 1609.0 / 1e3)")
    ).otherwise(F.col("rawspeed")).cast("bigint")
    cls = (
        F.when(F.col("rawspeed") >= 120, 7)
        .when(F.col("rawspeed") >= 100, 6)
        .when(F.col("rawspeed") >= 85, 5)
        .when(F.col("rawspeed") >= 70, 4)
        .when(F.col("rawspeed") >= 50, 3)
        .when(F.col("rawspeed") >= 30, 2)
        .when(F.col("rawspeed") >= 10, 1)
        .otherwise(0)
        .cast("int")
    )
    return li.select("way_id", "seq", kmh.alias("speed_kmh"), cls.alias("speed_class"))


# ---------------------------------------------------------------------------
# Garmin address normalization (lib/GarminTools.pm:22-60)
# ---------------------------------------------------------------------------

@register(
    "garmin_address",
    oracle="""
SELECT CAST(c.c_custkey AS BIGINT) AS obj_id,
       CONCAT_WS(', ', NULLIF(TRIM(n.n_name), ''), NULLIF(TRIM(r.r_name), ''),
                 'H' || CAST(c.c_custkey % 100 AS VARCHAR)) AS garmin_addr
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
""",
)
def garmin_address(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 — street+region concat normalization with empty-part elision."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("c_custkey").cast("bigint").alias("obj_id"),
            F.concat_ws(
                ", ",
                F.nullif(F.trim("n_name"), F.lit("")),
                F.nullif(F.trim("r_name"), F.lit("")),
                F.concat(F.lit("H"), (F.col("c_custkey") % 100).cast("string")),
            ).alias("garmin_addr"),
        )
    )


# ---------------------------------------------------------------------------
# A5: √count-weighted centroid of the density histogram (splitter.pl:229-247)
# — integer-quantized weights so the sums are order-independent & exact
# ---------------------------------------------------------------------------

@register(
    "weighted_centroid",
    oracle=f"""
WITH pts AS (SELECT {derived_lon_sql('c_custkey')} AS lon,
                    {derived_lat_sql('c_custkey')} AS lat FROM customer),
hist AS (
  SELECT CAST(FLOOR(lon * 25.0) AS BIGINT) AS cx,
         CAST(FLOOR(lat * 50.0) AS BIGINT) AS cy,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pts GROUP BY 1, 2),
w AS (SELECT cx, cy, CAST(FLOOR(SQRT(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS wq
      FROM hist)
SELECT CAST(SUM(wq * cx) AS DOUBLE) / SUM(wq) AS wx,
       CAST(SUM(wq * cy) AS DOUBLE) / SUM(wq) AS wy,
       CAST(COUNT(*) AS BIGINT) AS n_cells
FROM w
""",
)
def weighted_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — the splitter's split-line selector: √(cell count)-weighted mean
    cell coordinate. Weights quantized to integers → exact at any
    parallelism."""
    from ..sources.points import with_derived_position

    pts = with_derived_position(
        spark.read.parquet(f"{sf_dir}/customer.parquet").selectExpr(
            "CAST(c_custkey AS BIGINT) AS point_id"
        ),
        "point_id",
    )
    hist = pts.groupBy(
        F.expr("CAST(FLOOR(lon * 25.0) AS BIGINT)").alias("cx"),
        F.expr("CAST(FLOOR(lat * 50.0) AS BIGINT)").alias("cy"),
    ).agg(F.count("*").alias("n"))
    w = hist.withColumn(
        "wq", F.expr("CAST(FLOOR(SQRT(CAST(n AS DOUBLE)) * 1e6) AS BIGINT)")
    )
    return w.agg(
        (F.sum(F.col("wq") * F.col("cx")).cast("double") / F.sum("wq")).alias("wx"),
        (F.sum(F.col("wq") * F.col("cy")).cast("double") / F.sum("wq")).alias("wy"),
        F.count("*").alias("n_cells"),
    )


# ---------------------------------------------------------------------------
# A9/G9 + G7: ring area (higher-order aggregate) + orientation normalization
# over synthesized diamond rings; cross products quantized to ints so the
# fold is exact in both engines.
# ---------------------------------------------------------------------------

_RING = f"""
rings AS (
  SELECT CAST(o_orderkey AS BIGINT) AS way_id,
         {derived_lon_sql('o_orderkey')} AS x0,
         {derived_lat_sql('o_orderkey')} AS y0,
         CAST(1 + o_orderkey % 3 AS DOUBLE) AS s,
         (o_orderkey % 2 = 0) AS flip
  FROM orders WHERE o_orderkey % 5 = 0)
"""


@register(
    "ring_area_orientation",
    oracle=f"""
WITH {_RING},
terms AS (
  SELECT way_id, s, flip,
         -- shoelace cross terms of the diamond (x0, y0±s), (x0±s, y0),
         -- CCW base order; quantized to micro-units
         CAST(FLOOR(((x0) * (y0) - (x0 + s) * (y0 - s)) * 1e6) AS BIGINT)
       + CAST(FLOOR(((x0 + s) * (y0 + s) - (x0) * (y0)) * 1e6) AS BIGINT)
       + CAST(FLOOR(((x0) * (y0) - (x0 - s) * (y0 + s)) * 1e6) AS BIGINT)
       + CAST(FLOOR(((x0 - s) * (y0 - s) - (x0) * (y0)) * 1e6) AS BIGINT)
         AS qsum
  FROM rings)
SELECT way_id,
       CAST(CASE WHEN flip THEN -qsum ELSE qsum END AS BIGINT) AS signed_q,
       (CASE WHEN flip THEN -qsum ELSE qsum END) < 0 AS is_clockwise
FROM terms
""",
)
def ring_area_orientation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/G9 + G7 — per-ring shoelace sum via a higher-order `aggregate()`
    over the vertex array (the Spark-side A9 shape), orientation =
    sign(signed area); cross terms integer-quantized for exactness."""
    rings = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        "o_orderkey % 5 = 0"
    ).selectExpr(
        "CAST(o_orderkey AS BIGINT) AS way_id",
        f"{derived_lon_sql('o_orderkey')} AS x0",
        f"{derived_lat_sql('o_orderkey')} AS y0",
        "CAST(1 + o_orderkey % 3 AS DOUBLE) AS s",
        "(o_orderkey % 2 = 0) AS flip",
    )
    # diamond ring as an array column (closed implicitly by wrap in zip)
    arr = (
        "array(struct(x0 AS x, y0 - s AS y), struct(x0 + s AS x, y0 AS y), "
        "struct(x0 AS x, y0 + s AS y), struct(x0 - s AS x, y0 AS y))"
    )
    qsum = (
        f"aggregate(zip_with({arr}, "
        f"array_append(slice({arr}, 2, 3), element_at({arr}, 1)), "
        "(a, b) -> CAST(FLOOR((a.x * b.y - b.x * a.y) * 1e6) AS BIGINT)), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    return rings.selectExpr(
        "way_id",
        f"CAST(CASE WHEN flip THEN -({qsum}) ELSE ({qsum}) END AS BIGINT) AS signed_q",
        f"(CASE WHEN flip THEN -({qsum}) ELSE ({qsum}) END) < 0 AS is_clockwise",
    )


# ---------------------------------------------------------------------------
# MP → Garmin type translation (WriterMPC.pm:550-557 + __DATA__ table)
# ---------------------------------------------------------------------------

from ..functions.garmin import (  # noqa: E402
    PSEUDOROAD_LENGTH,
    code_table_values_sql,
    synthesize_pseudoroads,
    translate_types,
)

# synthetic feature stream: kind from partkey mod 3 (1=point, 3=line,
# 5=polygon), mp code drawn from a per-kind candidate list by modulo —
# includes codes ABSENT from the table to exercise the UNKNOWN default
_POINT_CODES = ["0x0100", "0x0500", "0x0c00", "0x2800", "0x2c04", "0xff00"]
_LINE_CODES = ["0x01", "0x05", "0x07", "0x14", "0x1f", "0xfe"]
_POLY_CODES = ["0x03", "0x07", "0x13", "0x3c", "0x50", "0xfd"]


def _codes_sql(codes: list[str]) -> str:
    return "[" + ", ".join(f"'{c}'" for c in codes) + "]"


@register(
    "garmin_typemap",
    oracle=f"""
WITH feats AS (
  SELECT CAST(p_partkey AS BIGINT) AS feature_id,
         CAST(1 + (p_partkey % 3) * 2 AS INT) AS kind,
         CASE 1 + (p_partkey % 3) * 2
           WHEN 1 THEN {_codes_sql(_POINT_CODES)}[CAST(p_partkey % 6 AS INT) + 1]
           WHEN 3 THEN {_codes_sql(_LINE_CODES)}[CAST(p_partkey % 6 AS INT) + 1]
           ELSE {_codes_sql(_POLY_CODES)}[CAST(p_partkey % 6 AS INT) + 1]
         END AS mp_code
  FROM part),
dim(kind, mp_code, garmin_type) AS (VALUES {code_table_values_sql()})
SELECT f.feature_id, f.kind, f.mp_code,
       COALESCE(d.garmin_type, 'UNKNOWN') AS garmin_type
FROM feats f LEFT JOIN dim d
  ON f.kind = d.kind AND LOWER(f.mp_code) = d.mp_code
""",
)
def garmin_typemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 — MP→Garmin type translation as a BROADCAST dimension join
    (WriterMPC.pm:550-557 `_init_code_table` keying: (shape kind,
    lowercased mp code) → garmin name; unknown codes surface as UNKNOWN).
    A 700-entry CASE would cross the 64KB codegen cliff — the broadcast
    hash join is the scale shape for any table size."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    pt = ", ".join(f"'{c}'" for c in _POINT_CODES)
    ln = ", ".join(f"'{c}'" for c in _LINE_CODES)
    pg = ", ".join(f"'{c}'" for c in _POLY_CODES)
    feats = p.selectExpr(
        "CAST(p_partkey AS BIGINT) AS feature_id",
        "CAST(1 + (p_partkey % 3) * 2 AS INT) AS kind",
        f"""CASE 1 + (p_partkey % 3) * 2
           WHEN 1 THEN element_at(array({pt}), CAST(p_partkey % 6 AS INT) + 1)
           WHEN 3 THEN element_at(array({ln}), CAST(p_partkey % 6 AS INT) + 1)
           ELSE element_at(array({pg}), CAST(p_partkey % 6 AS INT) + 1)
         END AS mp_code""",
    )
    return translate_types(feats)


# ---------------------------------------------------------------------------
# housenumber pseudoroads (WriterMPC.pm:273-316, mp-housesearch.pl:71-91)
# ---------------------------------------------------------------------------

@register(
    "housenumber_pseudoroads",
    oracle=f"""
WITH pts AS (
  SELECT CAST(c_custkey AS BIGINT) AS point_id,
         CASE WHEN c_custkey % 13 = 0 THEN 'N/A'
              WHEN c_custkey % 7 = 0
                THEN CAST(c_custkey % 197 + 1 AS VARCHAR) || 'a'
              ELSE CAST(c_custkey % 197 + 1 AS VARCHAR) END AS house,
         'st' || CAST(c_custkey % 50 AS VARCHAR) AS street,
         {derived_lon_sql('c_custkey')} AS lon,
         {derived_lat_sql('c_custkey')} AS lat
  FROM customer),
numbered AS (
  SELECT *, REGEXP_EXTRACT(house, '([0-9]+)', 1) AS h
  FROM pts WHERE REGEXP_EXTRACT(house, '([0-9]+)', 1) <> '')
SELECT CAST(ROW_NUMBER() OVER (ORDER BY point_id) AS BIGINT) AS link_id,
       point_id,
       house || ' ' || street AS name,
       'ALLEY' AS road_type,
       CAST(h AS BIGINT) AS l_from_adr,
       CAST(h AS BIGINT) AS l_to_adr,
       '1,1,1,1,1,1,1,1,1,1' AS access_flags,
       lon,
       lat - {PSEUDOROAD_LENGTH!r} AS lat0,
       lat + {PSEUDOROAD_LENGTH!r} AS lat1
FROM numbered
""",
)
def housenumber_pseudoroads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 — housenumber pseudoroad synthesis (WriterMPC.pm:273-316):
    digit-bearing address points become 2-vertex vertical ALLEY roads,
    named "<house> <street>", L_FROM/TO_ADR = the number, all-open
    access, deterministic sequential LINK_ID."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pts = c.selectExpr(
        "CAST(c_custkey AS BIGINT) AS point_id",
        "CASE WHEN c_custkey % 13 = 0 THEN 'N/A'"
        "     WHEN c_custkey % 7 = 0"
        "       THEN CAST(c_custkey % 197 + 1 AS STRING) || 'a'"
        "     ELSE CAST(c_custkey % 197 + 1 AS STRING) END AS house",
        "'st' || CAST(c_custkey % 50 AS STRING) AS street",
        f"{derived_lon_sql('c_custkey')} AS lon",
        f"{derived_lat_sql('c_custkey')} AS lat",
    )
    return synthesize_pseudoroads(pts)
