"""Relation-join + graph-expansion queries (SURVEY §2.4 J1/J6/J8/J9,
§2.8 I5-I7, J14 redistribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.tiles import grid_tile_expr, redistribute_nodes
from ..sources.points import derived_lat_sql, derived_lon_sql
from . import register

from ..sources.points import LINEITEM_SEQ_SQL as _SEQ, LINEITEM_VKEY_SQL as _VK


# ---------------------------------------------------------------------------
# J1: way→node coordinate resolution — THE sort-merge join the north star
# names. Chains reference node ids; node geometry lives in a separate table.
# ---------------------------------------------------------------------------

@register(
    "way_node_resolution",
    oracle=f"""
WITH nodes AS (
  SELECT CAST(p_partkey AS BIGINT) AS node_id,
         {derived_lon_sql('p_partkey')} AS lon,
         {derived_lat_sql('p_partkey')} AS lat
  FROM part),
refs AS (
  SELECT CAST(l_orderkey AS BIGINT) AS chain_id, {_SEQ} AS seq,
         CAST(l_partkey AS BIGINT) AS node_id
  FROM lineitem)
SELECT r.chain_id, r.seq, r.node_id, n.lon, n.lat
FROM refs r JOIN nodes n ON r.node_id = n.node_id
""",
)
def way_node_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — get_lonlat(chain): exploded node refs ⋈ node geometry, forced
    sort-merge (both sides fact-scale at 10^12; broadcast would not fit)."""
    nodes = spark.read.parquet(f"{sf_dir}/part.parquet").selectExpr(
        "CAST(p_partkey AS BIGINT) AS node_id",
        f"{derived_lon_sql('p_partkey')} AS lon",
        f"{derived_lat_sql('p_partkey')} AS lat",
    )
    refs = spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "CAST(l_orderkey AS BIGINT) AS chain_id",
        f"{_SEQ} AS seq",
        "CAST(l_partkey AS BIGINT) AS node_id",
    )
    return refs.join(nodes.hint("merge"), "node_id").select(
        "chain_id", "seq", "node_id", "lon", "lat"
    )


# ---------------------------------------------------------------------------
# J6 + O8: POI × building containment with leftover pass
# ---------------------------------------------------------------------------

_BLD = f"""
buildings AS (
  SELECT CAST(s_suppkey AS BIGINT) AS building_id,
         {derived_lon_sql('s_suppkey * 7 + 3')} AS cx,
         {derived_lat_sql('s_suppkey * 7 + 3')} AS cy,
         2.0 + s_suppkey % 4 AS half
  FROM supplier),
pois AS (
  SELECT CAST(c_custkey AS BIGINT) AS poi_id,
         {derived_lon_sql('c_custkey')} AS lon,
         {derived_lat_sql('c_custkey')} AS lat
  FROM customer)
"""


@register(
    "poi_building_match",
    oracle=f"""
WITH {_BLD},
hits AS (
  SELECT p.poi_id, b.building_id, b.half,
         ROW_NUMBER() OVER (PARTITION BY p.poi_id ORDER BY b.half, b.building_id) AS rn
  FROM pois p JOIN buildings b
    ON p.lon >= b.cx - b.half AND p.lon <= b.cx + b.half
   AND p.lat >= b.cy - b.half AND p.lat <= b.cy + b.half)
SELECT p.poi_id,
       COALESCE(CAST(h.building_id AS VARCHAR), '-') AS building_id,
       (h.building_id IS NULL) AS leftover
FROM pois p LEFT JOIN (SELECT poi_id, building_id FROM hits WHERE rn = 1) h
  ON p.poi_id = h.poi_id
""",
)
def poi_building_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — POIs claimed by the smallest containing building (address
    inheritance, osm2mp.pl:2183-2210); unmatched POIs emitted as the
    leftover pass (O8 anti-join, :530-544)."""
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").selectExpr(
        "CAST(s_suppkey AS BIGINT) AS building_id",
        f"{derived_lon_sql('s_suppkey * 7 + 3')} AS cx",
        f"{derived_lat_sql('s_suppkey * 7 + 3')} AS cy",
        "2.0 + s_suppkey % 4 AS half",
    )
    pois = spark.read.parquet(f"{sf_dir}/customer.parquet").selectExpr(
        "CAST(c_custkey AS BIGINT) AS poi_id",
        f"{derived_lon_sql('c_custkey')} AS lon",
        f"{derived_lat_sql('c_custkey')} AS lat",
    )
    hits = (
        pois.join(
            F.broadcast(sup),
            (F.col("lon") >= F.col("cx") - F.col("half"))
            & (F.col("lon") <= F.col("cx") + F.col("half"))
            & (F.col("lat") >= F.col("cy") - F.col("half"))
            & (F.col("lat") <= F.col("cy") + F.col("half")),
        )
        .groupBy("poi_id")
        .agg(
            F.min_by(
                "building_id", F.struct(F.col("half"), F.col("building_id"))
            ).alias("building_id")
        )
    )
    return pois.join(hits, "poi_id", "left").select(
        "poi_id",
        F.coalesce(F.col("building_id").cast("string"), F.lit("-")).alias(
            "building_id"
        ),
        F.col("building_id").isNull().alias("leftover"),
    )


# ---------------------------------------------------------------------------
# J8: street-relation tag propagation (members inherit relation tags)
# ---------------------------------------------------------------------------

@register(
    "street_relation_tags",
    oracle="""
SELECT CAST(c.c_custkey AS BIGINT) AS member_id,
       n.n_name AS street,
       r.r_name AS region,
       CONCAT(n.n_name, ' / ', r.r_name) AS addr_tag
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
""",
)
def street_relation_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 — house members inherit street-relation tags
    (osm2mp.pl:397-452): member ⋈ relation ⋈ parent, tag merge."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("c_custkey").cast("bigint").alias("member_id"),
            F.col("n_name").alias("street"),
            F.col("r_name").alias("region"),
            F.concat(F.col("n_name"), F.lit(" / "), F.col("r_name")).alias("addr_tag"),
        )
    )


# ---------------------------------------------------------------------------
# J9/A8: route-shield refs accumulated onto member ways, deduped + sorted
# ---------------------------------------------------------------------------

@register(
    "route_refs",
    oracle="""
SELECT CAST(l_orderkey AS BIGINT) AS way_id,
       STRING_AGG(DISTINCT 'R' || CAST(l_suppkey % 20 AS VARCHAR), ';'
                  ORDER BY 'R' || CAST(l_suppkey % 20 AS VARCHAR)) AS refs
FROM lineitem GROUP BY 1
""",
)
def route_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 + A8 — shield refs from route relations merged & deduped onto the
    way (uniq sort, osm2mp.pl:2056-2063)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.select(
            F.col("l_orderkey").cast("bigint").alias("way_id"),
            F.concat(F.lit("R"), (F.col("l_suppkey") % 20).cast("string")).alias("ref"),
        )
        .groupBy("way_id")
        .agg(F.array_join(F.array_sort(F.collect_set("ref")), ";").alias("refs"))
    )


# ---------------------------------------------------------------------------
# I6: barrier → all-pairs turn restrictions at the node
# ---------------------------------------------------------------------------

@register(
    "barrier_restrictions",
    oracle="""
WITH nw AS (
  SELECT DISTINCT CAST(l_partkey AS BIGINT) AS node_id,
         CAST(l_orderkey AS BIGINT) AS way_id
  FROM lineitem WHERE l_partkey % 50 = 0)
SELECT a.node_id, a.way_id AS from_way, b.way_id AS to_way
FROM nw a JOIN nw b ON a.node_id = b.node_id AND a.way_id <> b.way_id
""",
)
def barrier_restrictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I6 — each barrier node emits a no-go for every (from, to) way pair
    through it except pass-through (osm2mp.pl:1038-1071); node groups are
    tiny so the within-group cross join is safe."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    nw = (
        li.filter("l_partkey % 50 = 0")
        .select(
            F.col("l_partkey").cast("bigint").alias("node_id"),
            F.col("l_orderkey").cast("bigint").alias("way_id"),
        )
        .distinct()
    )
    a = nw.alias("a")
    b = nw.alias("b")
    return a.join(
        b,
        (F.col("a.node_id") == F.col("b.node_id"))
        & (F.col("a.way_id") != F.col("b.way_id")),
    ).select(
        F.col("a.node_id").alias("node_id"),
        F.col("a.way_id").alias("from_way"),
        F.col("b.way_id").alias("to_way"),
    )


# ---------------------------------------------------------------------------
# I7: u-turn suppression at 2-way nodes
# ---------------------------------------------------------------------------

@register(
    "uturn_suppression",
    oracle="""
WITH nw AS (
  SELECT DISTINCT CAST(l_partkey AS BIGINT) AS node_id,
         CAST(l_orderkey AS BIGINT) AS way_id
  FROM lineitem WHERE l_orderkey % 37 = 0),
deg AS (SELECT node_id, COUNT(*) AS n, MIN(way_id) AS w1, MAX(way_id) AS w2
        FROM nw GROUP BY node_id)
SELECT node_id, w1 AS way_a, w2 AS way_b
FROM deg WHERE n = 2
""",
)
def uturn_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I7 — nodes shared by exactly two ways get a no-u-turn pair
    (osm2mp.pl:821-867)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    nw = (
        li.filter("l_orderkey % 37 = 0")
        .select(
            F.col("l_partkey").cast("bigint").alias("node_id"),
            F.col("l_orderkey").cast("bigint").alias("way_id"),
        ).distinct()
    )
    return (
        nw.groupBy("node_id")
        .agg(F.count("*").alias("n"), F.min("way_id").alias("way_a"),
             F.max("way_id").alias("way_b"))
        .filter("n = 2")
        .select("node_id", "way_a", "way_b")
    )


# ---------------------------------------------------------------------------
# J14b: node redistribution after chain→tile closure
# ---------------------------------------------------------------------------

@register(
    "tile_redistribute",
    oracle=f"""
WITH pts AS (
  SELECT CAST(l_orderkey AS BIGINT) AS chain_id,
         (CAST(l_partkey AS BIGINT) * 10 + l_linenumber) AS point_id,
         {derived_lon_sql('(CAST(l_partkey AS BIGINT) * 10 + l_linenumber)')} AS lon,
         {derived_lat_sql('(CAST(l_partkey AS BIGINT) * 10 + l_linenumber)')} AS lat
  FROM lineitem),
tiled AS (SELECT chain_id, point_id,
                 CAST({grid_tile_expr('lon', 'lat')} AS INT) AS tile_id FROM pts),
chain_tiles AS (SELECT DISTINCT chain_id, tile_id FROM tiled),
pulled AS (
  SELECT t.point_id, ct.tile_id
  FROM tiled t JOIN chain_tiles ct ON t.chain_id = ct.chain_id)
SELECT DISTINCT point_id, tile_id FROM (
  SELECT point_id, tile_id FROM tiled
  UNION ALL SELECT point_id, tile_id FROM pulled)
""",
)
def tile_redistribute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J14 redistribution (splitter.pl:445-465): chains pull ALL their
    nodes into each of their tiles."""
    vk = _VK
    pts = spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "CAST(l_orderkey AS BIGINT) AS chain_id",
        f"{vk} AS point_id",
        f"{derived_lon_sql(vk)} AS lon",
        f"{derived_lat_sql(vk)} AS lat",
    )
    tiled = pts.withColumn(
        "tile_id", F.expr(f"CAST({grid_tile_expr('lon', 'lat')} AS INT)")
    )
    chain_tiles = tiled.select("chain_id", "tile_id").distinct()
    return redistribute_nodes(tiled, chain_tiles)
