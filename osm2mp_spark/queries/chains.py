"""Ordered-chain queries: interpolation, splitting, displacement
(SURVEY §2.3 G13-G14, §2.6 W2-W3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.points import derived_lat_sql, derived_lon_sql
from . import register

# ---------------------------------------------------------------------------
# G13: address interpolation (osm2mp.pl:2111-2160) — even interpolation:
# synthesize a housenumber point every 2 numbers between the way's two
# anchor nodes, positions linearly interpolated.
# ---------------------------------------------------------------------------

_END_H = "(2 + 2 * (o_orderkey % 4 + 2))"  # even end housenumber 6..12


@register(
    "addr_interpolation",
    oracle=f"""
WITH ways AS (
  SELECT CAST(o_orderkey AS BIGINT) AS way_id,
         2 AS h0, {_END_H} AS h1,
         {derived_lon_sql('o_orderkey')} AS lon0,
         {derived_lat_sql('o_orderkey')} AS lat0,
         {derived_lon_sql('o_orderkey + 500000')} AS lon1,
         {derived_lat_sql('o_orderkey + 500000')} AS lat1
  FROM orders WHERE o_orderkey % 10 = 0
)
SELECT way_id,
       CAST(h AS BIGINT) AS housenumber,
       lon0 + (lon1 - lon0) * ((h - h0) / (h1 - h0)) AS lon,
       lat0 + (lat1 - lat0) * ((h - h0) / (h1 - h0)) AS lat
FROM ways, UNNEST(generate_series(h0, h1, 2)) AS t(h)
""",
)
def addr_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G13 — posexplode(sequence(...)) + linear lerp, zero UDFs."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ways = o.filter("o_orderkey % 10 = 0").selectExpr(
        "CAST(o_orderkey AS BIGINT) AS way_id",
        "2 AS h0",
        f"{_END_H} AS h1",
        f"{derived_lon_sql('o_orderkey')} AS lon0",
        f"{derived_lat_sql('o_orderkey')} AS lat0",
        f"{derived_lon_sql('o_orderkey + 500000')} AS lon1",
        f"{derived_lat_sql('o_orderkey + 500000')} AS lat1",
    )
    return ways.select(
        "way_id",
        F.explode(F.expr("sequence(h0, h1, 2)")).alias("h"),
        "h0", "h1", "lon0", "lat0", "lon1", "lat1",
    ).selectExpr(
        "way_id",
        "CAST(h AS BIGINT) AS housenumber",
        "lon0 + (lon1 - lon0) * ((h - h0) / (h1 - h0)) AS lon",
        "lat0 + (lat1 - lat0) * ((h - h0) / (h1 - h0)) AS lat",
    )


# ---------------------------------------------------------------------------
# W2: max-node splitting (osm2mp.pl:745-750) — break every MAX vertices.
# Chains = events per user, ordered by (ts, event_id).
# ---------------------------------------------------------------------------

_MAX_NODES = 8


@register(
    "chain_split_maxnodes",
    oracle=f"""
SELECT CAST(user_id AS BIGINT) AS chain_id,
       CAST(event_id AS BIGINT) AS node_id,
       CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)
            / {_MAX_NODES}.0) AS BIGINT) AS seg_no
FROM events
""",
)
def chain_split_maxnodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — running count window + floor(cum/max) segment id."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        F.col("user_id").cast("bigint").alias("chain_id"),
        F.col("event_id").cast("bigint").alias("node_id"),
        F.floor((F.row_number().over(w) - 1) / _MAX_NODES).alias("seg_no"),
    )


# ---------------------------------------------------------------------------
# W3: barrier splitting (osm2mp.pl:752-758) — break AFTER each barrier node
# (barrier = 'error' event), gaps-and-islands via lagged cumulative sum.
# ---------------------------------------------------------------------------

@register(
    "chain_split_barriers",
    oracle="""
SELECT CAST(user_id AS BIGINT) AS chain_id,
       CAST(event_id AS BIGINT) AS node_id,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS seg_no
FROM events
""",
)
def chain_split_barriers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — barrier rows close the running segment; later rows start the
    next (lag-window cumulative sum)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    barrier = F.when(F.col("event_type") == "error", 1).otherwise(0)
    return e.select(
        F.col("user_id").cast("bigint").alias("chain_id"),
        F.col("event_id").cast("bigint").alias("node_id"),
        F.coalesce(F.sum(barrier).over(w), F.lit(0)).cast("bigint").alias("seg_no"),
    )


# ---------------------------------------------------------------------------
# G14: close-node displacement (osm2mp.pl:1145-1175, one-pass deterministic
# variant per SURVEY §7.3 risk 4): adjacent vertices nearer than D degrees
# are pushed apart symmetrically along their segment.
# ---------------------------------------------------------------------------

_FIX_DIST = 5.0  # degrees (scaled-up analog of fix_close_dist for scattered fixtures)

from ..sources.points import LINEITEM_SEQ_SQL as _SEQ, LINEITEM_VKEY_SQL as _VKEY


@register(
    "fix_close_nodes",
    oracle=f"""
WITH pts AS (
  SELECT CAST(l_orderkey AS BIGINT) AS chain_id, {_SEQ} AS seq,
         {derived_lon_sql(_VKEY)} AS lon, {derived_lat_sql(_VKEY)} AS lat
  FROM lineitem),
paired AS (
  SELECT chain_id, seq, lon, lat,
         LEAD(lon) OVER (PARTITION BY chain_id ORDER BY seq) AS nlon,
         LEAD(lat) OVER (PARTITION BY chain_id ORDER BY seq) AS nlat
  FROM pts),
flagged AS (
  SELECT *, SQRT((nlon-lon)*(nlon-lon) + (nlat-lat)*(nlat-lat)) AS dist
  FROM paired WHERE nlon IS NOT NULL)
SELECT chain_id, seq, dist,
       lon - (nlon - lon) * (({_FIX_DIST!r} / dist - 1.0) / 2.0) AS new_lon,
       lat - (nlat - lat) * (({_FIX_DIST!r} / dist - 1.0) / 2.0) AS new_lat
FROM flagged
WHERE dist < {_FIX_DIST!r} AND dist > 0.0
""",
)
def fix_close_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G14 — lead() window + exact arithmetic; emits the displaced first
    vertex of each too-close pair."""
    from .spatial import lineitem_chain_points

    pts = lineitem_chain_points(spark, sf_dir)
    w = Window.partitionBy("chain_id").orderBy("seq")
    paired = (
        pts.withColumn("nlon", F.lead("lon").over(w))
        .withColumn("nlat", F.lead("lat").over(w))
        .filter(F.col("nlon").isNotNull())
        .withColumn(
            "dist",
            F.sqrt(
                (F.col("nlon") - F.col("lon")) * (F.col("nlon") - F.col("lon"))
                + (F.col("nlat") - F.col("lat")) * (F.col("nlat") - F.col("lat"))
            ),
        )
    )
    fac = (F.lit(_FIX_DIST) / F.col("dist") - F.lit(1.0)) / F.lit(2.0)
    return (
        paired.filter((F.col("dist") < _FIX_DIST) & (F.col("dist") > 0.0))
        .select(
            "chain_id",
            "seq",
            "dist",
            (F.col("lon") - (F.col("nlon") - F.col("lon")) * fac).alias("new_lon"),
            (F.col("lat") - (F.col("nlat") - F.col("lat")) * fac).alias("new_lat"),
        )
    )


# ---------------------------------------------------------------------------
# G14 sequential variant: the reference's compounding close-node walk
# (osm2mp.pl:880-890 + fix_close_nodes :1145-1175) — pairs are fixed IN
# CHAIN ORDER and each fix moves the vertex the next pair reads (accordion).
# Fixture: dense chains (3.5-degree longitude steps, < fix_dist=5) so nearly
# every pair compounds. All arithmetic is + - * / sqrt abs sign — exact in
# both engines; the oracle replays the walk as a recursive CTE.
# ---------------------------------------------------------------------------

_SEQ_LON = "(-90.0 + (l_linenumber - 1) * 3.5E0)"


def _seq_lat() -> str:
    return f"({derived_lat_sql('l_orderkey')} + ({_VKEY} % 3) * 1.0E0)"


def _fix_seq_oracle() -> str:
    L = 5.0
    return f"""
WITH RECURSIVE
pts AS (
  SELECT CAST(l_orderkey AS BIGINT) AS chain_id, {_SEQ} AS seq,
         {_SEQ_LON} AS lon, {_seq_lat()} AS lat
  FROM lineitem),
v AS (
  SELECT chain_id, seq, lon, lat,
         ROW_NUMBER() OVER (PARTITION BY chain_id ORDER BY seq) - 1 AS pos
  FROM pts),
nn AS (SELECT chain_id, COUNT(*) AS n FROM v GROUP BY chain_id),
walk(chain_id, pos, cur_lon, cur_lat, fin_lon, fin_lat) AS (
  SELECT chain_id, pos, lon, lat, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
  FROM v WHERE pos = 0
  UNION ALL
  SELECT chain_id, pos,
    CASE WHEN moved THEN
      CASE WHEN dlon = 0.0 THEN clon ELSE clon + ndlon * slon END
    ELSE nlon END,
    CASE WHEN moved THEN
      CASE WHEN dlon = 0.0 THEN clat + {L!r} / 2.0 * sgn0
           ELSE clat + ndlat * slat END
    ELSE nlat END,
    CASE WHEN moved THEN
      CASE WHEN dlon = 0.0 THEN clon ELSE clon - ndlon * slon END
    ELSE cur_lon END,
    CASE WHEN moved THEN
      CASE WHEN dlon = 0.0 THEN clat - {L!r} / 2.0 * sgn0
           ELSE clat - ndlat * slat END
    ELSE cur_lat END
  FROM (
    SELECT t.*,
      (NOT (dlon = 0.0 AND dlat = 0.0))
        AND (dlat * dlat + dlon * dlon < {L!r} * {L!r}) AS moved,
      sqrt({L!r} * {L!r} / (1.0 + azim * azim)) / 2.0 AS ndlon,
      sqrt({L!r} * {L!r} / (1.0 + azim * azim)) / 2.0 * abs(azim) AS ndlat,
      CASE WHEN dlon > 0.0 THEN 1.0 ELSE -1.0 END AS slon,
      CASE WHEN dlat = 0.0 THEN 0.0 WHEN dlat > 0.0 THEN 1.0 ELSE -1.0 END AS slat,
      CASE WHEN dlat = 0.0 THEN 1.0 WHEN dlat > 0.0 THEN 1.0 ELSE -1.0 END AS sgn0
    FROM (
      SELECT w.chain_id, x.pos, x.lon AS nlon, x.lat AS nlat,
             w.cur_lon, w.cur_lat,
             x.lon - w.cur_lon AS dlon, x.lat - w.cur_lat AS dlat,
             (w.cur_lon + x.lon) / 2.0 AS clon,
             (w.cur_lat + x.lat) / 2.0 AS clat,
             (x.lat - w.cur_lat) /
               (CASE WHEN x.lon - w.cur_lon = 0.0 THEN 1.0
                     ELSE x.lon - w.cur_lon END) AS azim
      FROM walk w JOIN v x ON x.chain_id = w.chain_id AND x.pos = w.pos + 1
    ) t
  ) u
)
SELECT w.chain_id, v.seq, w.fin_lon AS lon, w.fin_lat AS lat
FROM walk w JOIN v ON v.chain_id = w.chain_id AND v.pos = w.pos - 1
WHERE w.pos >= 1
UNION ALL
SELECT w.chain_id, v.seq, w.cur_lon AS lon, w.cur_lat AS lat
FROM walk w
JOIN nn ON nn.chain_id = w.chain_id
JOIN v ON v.chain_id = w.chain_id AND v.pos = w.pos
WHERE w.pos = nn.n - 1
"""


@register("fix_close_nodes_seq", oracle=_fix_seq_oracle())
def fix_close_nodes_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G14 sequential/compounding variant (osm2mp.pl:880-890, :1145-1175) —
    see operators.chains.fix_close_nodes_walk for the faithful-walk rules
    and documented canonical deviations. The oracle replays the walk as a
    recursive CTE carrying (current vertex, finalized predecessor) state."""
    from ..operators.chains import fix_close_nodes_walk

    pts = spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "CAST(l_orderkey AS BIGINT) AS chain_id",
        f"{_SEQ} AS seq",
        f"{_SEQ_LON} AS lon",
        f"{_seq_lat()} AS lat",
    )
    return fix_close_nodes_walk(pts, fix_dist=5.0)
