"""OSM XML source: hand-written fixture document (ways/relations/escaping/
unicode) + renderer round-trip invariants. The node path is additionally
gate-checked end-to-end by the `osm_xml_roundtrip` query oracle."""

import os

DOC = """<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6">
  <node id="1" lon="10.5" lat="-3.25"><tag k="name" v="A &amp; B &quot;x&quot;"/></node>
  <node id="2" lon="11.0" lat="-3.0"/>
  <node id="3" lon="12.0" lat="-2.0"><tag k="name" v="Köln–Mitte"/></node>
  <way id="100">
    <nd ref="1"/><nd ref="2"/><nd ref="3"/>
    <tag k="highway" v="primary"/><tag k="oneway" v="yes"/>
  </way>
  <way id="101"><nd ref="3"/><nd ref="1"/></way>
  <relation id="500">
    <member type="way" ref="100" role="outer"/>
    <member type="way" ref="101" role=""/>
    <member type="node" ref="2" role="admin_centre"/>
    <tag k="type" v="multipolygon"/>
  </relation>
</osm>
"""


class TestOsmXmlSource:
    def _write(self, tmp_path) -> str:
        p = tmp_path / "docs"
        os.makedirs(p, exist_ok=True)
        (p / "a.osm").write_text(DOC, encoding="utf-8")
        return str(p)

    def test_parse_nodes(self, spark, tmp_path):
        from osm2mp_spark.sources.osm_xml import read_osm_nodes

        rows = {
            r.node_id: r
            for r in read_osm_nodes(spark, self._write(tmp_path)).collect()
        }
        assert set(rows) == {1, 2, 3}
        assert rows[1].lon == 10.5 and rows[1].lat == -3.25
        assert rows[1].tags["name"] == 'A & B "x"'   # entity unescaping
        assert rows[2].tags == {}
        assert rows[3].tags["name"] == "Köln–Mitte"  # unicode survives

    def test_parse_ways_ordered_refs(self, spark, tmp_path):
        from osm2mp_spark.sources.osm_xml import read_osm_ways

        rows = {
            r.way_id: r
            for r in read_osm_ways(spark, self._write(tmp_path)).collect()
        }
        assert rows[100].refs == [1, 2, 3]       # document order preserved
        assert rows[100].tags == {"highway": "primary", "oneway": "yes"}
        assert rows[101].refs == [3, 1] and rows[101].tags == {}

    def test_parse_relations_members(self, spark, tmp_path):
        from osm2mp_spark.sources.osm_xml import read_osm_relations

        (rel,) = read_osm_relations(spark, self._write(tmp_path)).collect()
        assert rel.rel_id == 500
        assert [(m.mtype, m.ref, m.role) for m in rel.members] == [
            ("way", 100, "outer"), ("way", 101, ""), ("node", 2, "admin_centre"),
        ]
        assert rel.tags == {"type": "multipolygon"}

    def test_render_escapes_and_roundtrips(self, spark, tmp_path):
        import pandas as pd

        from osm2mp_spark.sources.osm_xml import (
            read_osm_nodes,
            write_osm_xml_nodes,
        )

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "node_id": [7, 8],
                    "lon": [1.1000000000000001, -179.99999999999997],
                    "lat": [0.1, 89.999999999999986],
                    "tags": [{"name": 'Quote " <amp> & done'}, {}],
                }
            )
        )
        out = str(tmp_path / "rt")
        write_osm_xml_nodes(df, out)
        back = {r.node_id: r for r in read_osm_nodes(spark, out).collect()}
        # bit-exact double round trip through decimal text (repr/float)
        assert back[7].lon == 1.1000000000000001 and back[7].lat == 0.1
        assert back[8].lon == -179.99999999999997
        assert back[8].lat == 89.999999999999986
        assert back[7].tags["name"] == 'Quote " <amp> & done'

    def test_write_multi_arrow_batch_partition(self, spark, tmp_path):
        """A partition larger than arrow.maxRecordsPerBatch arrives at the
        writer as SEVERAL Arrow batches; the sink must still emit ONE
        well-formed document per partition (ADVICE r03: two docs
        newline-glued in one file broke the wholetext reader)."""
        from pyspark.sql import functions as F

        from osm2mp_spark.sources.osm_xml import (
            read_osm_nodes,
            write_osm_xml_nodes,
        )

        key = "spark.sql.execution.arrow.maxRecordsPerBatch"
        old = spark.conf.get(key)
        spark.conf.set(key, "50")
        try:
            df = (
                spark.range(0, 400)  # 400 rows, 2 partitions → 8 batches each
                .repartition(2)
                .select(
                    F.col("id").alias("node_id"),
                    (F.col("id") * 0.001).alias("lon"),
                    (F.col("id") * -0.002).alias("lat"),
                    F.expr("map('n', CAST(id AS STRING))").alias("tags"),
                )
            )
            out = str(tmp_path / "multibatch")
            write_osm_xml_nodes(df, out)
            back = read_osm_nodes(spark, out)
            assert back.count() == 400
            assert back.select("node_id").distinct().count() == 400
        finally:
            spark.conf.set(key, old)


class TestScratchSweep:
    def test_scratch_dir_sweeps_stale_siblings(self, tmp_path):
        import os
        import time

        from osm2mp_spark.scratch import scratch_dir

        base = str(tmp_path)
        stale = os.path.join(base, "pfx_oldapp")
        fresh = os.path.join(base, "pfx_newapp")
        other = os.path.join(base, "unrelated_dir")
        for d in (stale, fresh, other):
            os.makedirs(d)
        old = time.time() - 3 * 3600
        os.utime(stale, (old, old))

        mine = scratch_dir("pfx", "myapp", base=base, max_age_s=2 * 3600)
        assert mine == os.path.join(base, "pfx_myapp")
        assert not os.path.exists(stale)      # old sibling swept
        assert os.path.isdir(fresh)           # young sibling untouched
        assert os.path.isdir(other)           # different prefix untouched

    def test_scratch_dir_removes_own_preexisting(self, tmp_path):
        import os

        from osm2mp_spark.scratch import scratch_dir

        base = str(tmp_path)
        mine = os.path.join(base, "p_a")
        os.makedirs(os.path.join(mine, "leftover"))
        got = scratch_dir("p", "a", base=base)
        assert got == mine and not os.path.exists(mine)

    def test_scratch_dir_spares_dir_with_fresh_nested_writes(self, tmp_path):
        """A long-lived run that only writes inside NESTED subdirs (e.g.
        streaming store batch dirs) keeps its scratch dir alive: staleness
        is judged by the newest mtime anywhere in the tree, not the
        top-level dir's."""
        import os
        import time

        from osm2mp_spark.scratch import scratch_dir

        base = str(tmp_path)
        live = os.path.join(base, "pfx_longrun")
        nested = os.path.join(live, "store", "batch=000000042")
        os.makedirs(nested)
        old = time.time() - 3 * 3600
        # top levels look ancient ...
        for d in (live, os.path.join(live, "store")):
            os.utime(d, (old, old))
        # ... but a nested batch dir was just written
        with open(os.path.join(nested, "part-0"), "w") as f:
            f.write("x")

        scratch_dir("pfx", "other", base=base, max_age_s=2 * 3600)
        assert os.path.isdir(live)  # spared: fresh nested write

        # and with the nested file aged too, the whole tree goes
        os.utime(os.path.join(nested, "part-0"), (old, old))
        os.utime(nested, (old, old))
        scratch_dir("pfx", "other2", base=base, max_age_s=2 * 3600)
        assert not os.path.exists(live)
