"""Source-format queries: the reference's native .osm XML ingest, gated by a
full write→read round trip whose expected output DuckDB derives from the
same source tables (so renderer AND parser are both on the hook, including
bit-exact float round-tripping through decimal text)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.points import derived_lat_sql, derived_lon_sql
from . import register

_HW = ["residential", "primary", "secondary", "track", "service"]
_HW_SQL_SPARK = "array(" + ", ".join(f"'{h}'" for h in _HW) + ")"
_HW_SQL_DUCK = "[" + ", ".join(f"'{h}'" for h in _HW) + "]"


@register(
    "osm_xml_roundtrip",
    oracle=f"""
SELECT CAST(o_orderkey AS BIGINT) AS node_id,
       {derived_lon_sql('o_orderkey')} AS lon,
       {derived_lat_sql('o_orderkey')} AS lat,
       CAST(CASE WHEN o_orderkey % 3 = 0 THEN 0 ELSE 2 END AS INT) AS n_tags,
       CASE WHEN o_orderkey % 3 = 0 THEN NULL
            ELSE ({_HW_SQL_DUCK})[CAST(o_orderkey % 5 AS INT) + 1] END AS highway
FROM orders WHERE o_orderkey % 20 = 0
""",
)
def osm_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1-adjacent — the reference's native format: render an .osm document
    set from the orders sample (distributed, one document per partition),
    read it back with the XML source, emit parsed node rows. The oracle
    computes the expected rows from the source table directly, so any
    renderer/parser asymmetry (escaping, tag ordering, float text) fails
    the hash."""
    import os

    from ..sources.osm_xml import read_osm_nodes, write_osm_xml_nodes

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter("o_orderkey % 20 = 0")
    nodes = o.selectExpr(
        "CAST(o_orderkey AS BIGINT) AS node_id",
        f"{derived_lon_sql('o_orderkey')} AS lon",
        f"{derived_lat_sql('o_orderkey')} AS lat",
        "CASE WHEN o_orderkey % 3 = 0 THEN map() ELSE map("
        f" 'highway', element_at({_HW_SQL_SPARK}, CAST(o_orderkey % 5 AS INT) + 1),"
        " 'name', concat('node ', CAST(o_orderkey AS STRING))"
        ") END AS tags",
    )
    # Unique per Spark application (concurrent runs must not race on a
    # shared fixed path) with stale-sibling sweeping (unique paths would
    # otherwise accumulate in /tmp forever).
    from ..scratch import scratch_dir

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    path = scratch_dir(
        f"osm_xml_rt_{sf_name}", spark.sparkContext.applicationId
    )
    write_osm_xml_nodes(nodes, path)
    parsed = read_osm_nodes(spark, path)
    return parsed.select(
        "node_id",
        "lon",
        "lat",
        F.size("tags").alias("n_tags"),
        F.col("tags")["highway"].alias("highway"),
    )
