"""OSM XML source/sink — the reference's NATIVE input format (osm2mp.pl
reads .osm documents via OSM::Parser; lib/OSM.pm builds the node/way/relation
stores from it). Spark-first shape:

- read: `spark.read.text(path, wholetext=True)` → one row per .osm document
  → Arrow-batched mapInPandas parse (xml.etree, executor-side) → typed
  DataFrames. Parallelism = documents; planet-scale pipelines pre-split
  extracts into many documents (or ingest PBF→parquet once), so the
  per-document axis is the distribution axis — no driver-side XML ever.
- write: per-partition renderer producing one well-formed .osm document per
  partition (a text-sink row per document), used by tests and the
  round-trip gate.

Float exactness: coordinates render with Python repr (shortest round-trip
decimal) and parse back with float() — bit-identical doubles end-to-end,
which the DuckDB-oracled round-trip query (`osm_xml_roundtrip`) proves.
"""

from __future__ import annotations

from xml.sax.saxutils import escape, quoteattr

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

NODES_SCHEMA = "node_id bigint, lon double, lat double, tags map<string,string>"
WAYS_SCHEMA = "way_id bigint, refs array<bigint>, tags map<string,string>"
RELS_SCHEMA = (
    "rel_id bigint, members array<struct<mtype:string,ref:bigint,role:string>>, "
    "tags map<string,string>"
)


def _parse_docs(it, kind: str):
    import xml.etree.ElementTree as ET

    for pdf in it:
        rows = []
        for doc in pdf["value"]:
            root = ET.fromstring(doc)
            if kind == "node":
                for el in root.iter("node"):
                    rows.append(
                        (
                            int(el.get("id")),
                            float(el.get("lon")),
                            float(el.get("lat")),
                            {t.get("k"): t.get("v") for t in el.findall("tag")},
                        )
                    )
            elif kind == "way":
                for el in root.iter("way"):
                    rows.append(
                        (
                            int(el.get("id")),
                            [int(nd.get("ref")) for nd in el.findall("nd")],
                            {t.get("k"): t.get("v") for t in el.findall("tag")},
                        )
                    )
            else:
                for el in root.iter("relation"):
                    rows.append(
                        (
                            int(el.get("id")),
                            [
                                {
                                    "mtype": m.get("type"),
                                    "ref": int(m.get("ref")),
                                    "role": m.get("role", ""),
                                }
                                for m in el.findall("member")
                            ],
                            {t.get("k"): t.get("v") for t in el.findall("tag")},
                        )
                    )
        cols = {
            "node": ["node_id", "lon", "lat", "tags"],
            "way": ["way_id", "refs", "tags"],
            "relation": ["rel_id", "members", "tags"],
        }[kind]
        yield pd.DataFrame(rows, columns=cols)


def read_osm_nodes(spark: SparkSession, path: str) -> DataFrame:
    docs = spark.read.text(path, wholetext=True)
    return docs.mapInPandas(lambda it: _parse_docs(it, "node"), NODES_SCHEMA)


def read_osm_ways(spark: SparkSession, path: str) -> DataFrame:
    docs = spark.read.text(path, wholetext=True)
    return docs.mapInPandas(lambda it: _parse_docs(it, "way"), WAYS_SCHEMA)


def read_osm_relations(spark: SparkSession, path: str) -> DataFrame:
    docs = spark.read.text(path, wholetext=True)
    return docs.mapInPandas(lambda it: _parse_docs(it, "relation"), RELS_SCHEMA)


def _render_tags(tags) -> str:
    if tags is None:
        return ""
    return "".join(
        f"<tag k={quoteattr(str(k))} v={quoteattr(str(v))}/>"
        for k, v in sorted(tags.items())
    )


def render_node(node_id: int, lon: float, lat: float, tags=None) -> str:
    return (
        f'<node id="{int(node_id)}" lon={quoteattr(repr(float(lon)))} '
        f'lat={quoteattr(repr(float(lat)))}>{_render_tags(tags)}</node>'
    )


def render_way(way_id: int, refs, tags=None) -> str:
    nds = "".join(f'<nd ref="{int(r)}"/>' for r in refs)
    return f'<way id="{int(way_id)}">{nds}{_render_tags(tags)}</way>'


def render_relation(rel_id: int, members, tags=None) -> str:
    ms = "".join(
        f'<member type={quoteattr(m["mtype"])} ref="{int(m["ref"])}" '
        f'role={quoteattr(m.get("role", ""))}/>'
        for m in members
    )
    return f'<relation id="{int(rel_id)}">{ms}{_render_tags(tags)}</relation>'


def write_osm_xml_nodes(nodes: DataFrame, path: str) -> None:
    """One well-formed .osm document per partition (text sink, one row per
    document). Input: (node_id, lon, lat, tags map) — extra columns ignored."""
    from ..shipping import ensure_shipped

    ensure_shipped(nodes.sparkSession)

    def render(it):
        # Drain EVERY Arrow batch of the partition into ONE document: a
        # partition larger than arrow.maxRecordsPerBatch arrives as several
        # batches, and emitting one <osm> doc per batch would concatenate
        # multiple documents into one text-sink file — which the wholetext
        # reader (one document per file) cannot parse. NB: one-document-
        # per-partition necessarily buffers the partition's rendered text
        # in the Python worker — size partitions (repartition upstream) so
        # a document fits comfortably in worker memory.
        parts = []
        for pdf in it:
            parts.append(
                "".join(
                    render_node(r.node_id, r.lon, r.lat, r.tags)
                    for r in pdf.itertuples()
                )
            )
        if not parts:  # empty partition → no file, not an empty document
            return
        body = "".join(parts)
        yield pd.DataFrame(
            {"value": [f"<?xml version='1.0'?><osm version=\"0.6\">{body}</osm>"]}
        )

    nodes.select("node_id", "lon", "lat", "tags").mapInPandas(
        render, "value string"
    ).write.mode("overwrite").text(path)


__all__ = [
    "read_osm_nodes", "read_osm_ways", "read_osm_relations",
    "render_node", "render_way", "render_relation", "write_osm_xml_nodes",
    "escape",
]
