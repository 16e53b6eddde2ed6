"""Sinks (S5/S7/S8/S11), access-flag vectors, transliteration."""

import os

import pytest
from pyspark.sql import functions as F


class TestPolyReader:
    def test_parses_and_closes(self):
        from osm2mp_spark.sources.boundary_io import read_poly

        text = "test\n1\n   0.0  0.0\n   10.0 0.0\n   10.0 10.0\n   0.0 10.0\nEND\nEND\n"
        ring = read_poly(text)
        assert ring[0] == ring[-1]
        assert len(ring) == 5

    def test_cw_reversed_to_ccw(self):
        from osm2mp_spark.geometry.kernels import signed_area
        from osm2mp_spark.sources.boundary_io import read_poly

        cw = "t\n1\n 0 0\n 0 10\n 10 10\n 10 0\nEND\nEND\n"
        ring = read_poly(cw)
        assert signed_area(ring) > 0

    def test_empty_section_raises(self):
        from osm2mp_spark.sources.boundary_io import read_poly

        with pytest.raises(ValueError):
            read_poly("t\n1\nEND\nEND\n")


class TestPerTileSink:
    def test_partitioned_write_roundtrip(self, spark, tmp_path):
        from osm2mp_spark.plans.sinks import write_per_tile

        df = spark.range(100).selectExpr(
            "id", "CAST(id % 4 AS INT) AS tile_id", "id * 2 AS v"
        )
        out = str(tmp_path / "tiles")
        write_per_tile(df, out)
        # one directory per tile
        dirs = sorted(d for d in os.listdir(out) if d.startswith("tile_id="))
        assert dirs == [f"tile_id={i}" for i in range(4)]
        back = spark.read.parquet(out)
        assert back.count() == 100
        assert back.filter("tile_id = 2").count() == 25

    def test_mp_text_render(self):
        from osm2mp_spark.plans.sinks import render_mp_points

        txt = render_mp_points([(0x2C04, "Museum", 30.5, 59.25)])
        assert "[POI]" in txt and "Type=0x2c04" in txt
        assert "Data0=(59.25000,30.50000)" in txt
        assert txt.rstrip().endswith("[END]")


class TestAccessFlags:
    def test_mask_roundtrip(self, spark):
        from osm2mp_spark.functions.access import mask_to_array, reorder_for_mpc

        df = spark.createDataFrame([(0b10100001,)], "m int").select(
            mask_to_array(F.col("m")).alias("arr")
        )
        arr = df.collect()[0].arr
        assert arr == [1, 0, 0, 0, 0, 1, 0, 1]
        re = spark.createDataFrame([(arr,)], "arr array<int>").select(
            reorder_for_mpc(F.col("arr")).alias("r")
        ).collect()[0].r
        # WriterMPC.pm:373 slice [2,3,4,9,5,6,7,9,1,0] → 10 mpc flags
        # (Carpools / Through Traffic constant 0)
        assert re == [0, 0, 0, 0, 1, 0, 1, 0, 0, 1]

    def test_motorroad_inverted(self, spark):
        from osm2mp_spark.functions.access import tag_access_mask

        rows = [
            ({"motorroad": "yes"},),   # forbids foot+bike (mode -1)
            ({"motorroad": "no"},),
            ({"motorroad": "yes", "foot": "yes"},),  # foot re-allowed later
        ]
        df = spark.createDataFrame(rows, "tags map<string,string>").select(
            tag_access_mask(F.col("tags")).alias("m")
        )
        got = [r.m for r in df.collect()]
        assert got == [0b01100000, 0, 0b01000000]

    def test_tag_masks(self, spark):
        from osm2mp_spark.functions.access import tag_access_mask

        rows = [
            ({"access": "no"},),
            ({"access": "no", "foot": "yes"},),
            ({"bicycle": "no"},),
            ({},),
        ]
        df = spark.createDataFrame(rows, "tags map<string,string>").select(
            tag_access_mask(F.col("tags")).alias("m")
        )
        got = [r.m for r in df.collect()]
        assert got[0] == 0b11111111
        assert got[1] == 0b11011111  # foot bit cleared
        assert got[2] == 0b01000000
        assert got[3] == 0

    def test_area_override_merge(self, spark):
        from osm2mp_spark.functions.access import merge_masks

        df = spark.createDataFrame([(0b1, 0b100)], "a int, b int").select(
            merge_masks(F.col("a"), F.col("b")).alias("m")
        )
        assert df.collect()[0].m == 0b101


class TestStrings:
    def test_clean_label(self, spark):
        from osm2mp_spark.functions.strings import clean_label

        df = spark.createDataFrame(
            [(" ..Main   St{reet}  ",), ("ok",)], "s string"
        ).select(clean_label(F.col("s")).alias("c"))
        got = [r.c for r in df.collect()]
        assert got == ["Main Street", "ok"]

    def test_translit(self, spark):
        from osm2mp_spark.functions.strings import make_translit_udf

        tr = make_translit_udf(spark)
        df = spark.createDataFrame(
            [("Müller",), ("москва",), (None,)], "s string"
        ).select(tr(F.col("s")).alias("t"))
        got = [r.t for r in df.collect()]
        assert got == ["Muller", "moskva", None]
