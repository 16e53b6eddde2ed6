"""Salted repartitioning (the north rule's explicit skew defuser) +
the J4 cityside 2-point test."""

import numpy as np
from pyspark.sql import functions as F


class TestSaltedRepartition:
    def test_hot_key_split_across_partitions(self, spark):
        from osm2mp_spark.operators.tiles import salted_repartition

        # one pathological tile holds 90% of the rows (the hot-cell case the
        # reference's √count BSP splitting addresses, splitter.pl:226-247)
        df = spark.range(10_000).selectExpr(
            "id", "CAST(CASE WHEN id < 9000 THEN 7 ELSE id % 5 END AS BIGINT) AS tile_id"
        )
        counts = {r.tile_id: r.n for r in df.groupBy("tile_id").agg(F.count("*").alias("n")).collect()}
        salted = salted_repartition(
            df, "tile_id", counts, rows_per_partition=1000, num_partitions=16,
            det_col="id",
        )
        sizes = (
            salted.withColumn("p", F.spark_partition_id())
            .groupBy("p").agg(F.count("*").alias("n"))
            .toPandas()
        )
        # without salting, one partition would hold >= 9000 rows; with it,
        # the hot tile spreads over >= ceil(9000/1000) = 9 salt values
        assert sizes.n.max() < 5000
        # content unchanged
        assert salted.count() == 10_000

    def test_salt_deterministic_across_parallelism(self, spark):
        from osm2mp_spark.operators.tiles import salted_repartition

        df = spark.range(1000).selectExpr("id", "CAST(id % 3 AS BIGINT) AS tile_id")
        counts = {0: 400, 1: 300, 2: 300}
        a = salted_repartition(df, "tile_id", counts, 100, 8, det_col="id")
        b = salted_repartition(df.repartition(3), "tile_id", counts, 100, 4, det_col="id")
        pa = a.orderBy("id").toPandas()
        pb = b.orderBy("id").toPandas()
        assert (pa.values == pb.values).all()


class TestCitysideJ4:
    def test_two_point_rule(self, spark):
        """J4 (osm2mp.pl:1797-1811): object counts as inside-city iff the
        chain's 1/3 and 2/3 vertices are BOTH contained."""
        from osm2mp_spark.operators.pip_join import pip_resolve
        from osm2mp_spark.spatial.index import Polygon, PolygonIndex

        idx = PolygonIndex([Polygon("c", [[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]])])
        # chain A: both sample points inside; chain B: one in, one out
        chains = spark.createDataFrame(
            [
                (1, [(2.0, 2.0), (3.0, 3.0), (4.0, 4.0), (5.0, 5.0), (6.0, 6.0), (7.0, 7.0)]),
                (2, [(2.0, 2.0), (3.0, 3.0), (4.0, 4.0), (20.0, 20.0), (21.0, 21.0), (22.0, 22.0)]),
            ],
            "chain_id int, pts array<struct<lon:double, lat:double>>",
        )
        sampled = chains.select(
            "chain_id",
            F.element_at("pts", F.expr("CAST(size(pts) / 3 AS INT)"))["lon"].alias("lon1"),
            F.element_at("pts", F.expr("CAST(size(pts) / 3 AS INT)"))["lat"].alias("lat1"),
            F.element_at("pts", F.expr("CAST(size(pts) * 2 / 3 AS INT)"))["lon"].alias("lon2"),
            F.element_at("pts", F.expr("CAST(size(pts) * 2 / 3 AS INT)"))["lat"].alias("lat2"),
        )
        r1 = pip_resolve(sampled, idx, lon="lon1", lat="lat1",
                         area_col="c1", keep_unmatched=True)
        r2 = pip_resolve(r1, idx, lon="lon2", lat="lat2",
                         area_col="c2", keep_unmatched=True)
        out = r2.withColumn(
            "inside_city", F.col("c1").isNotNull() & F.col("c2").isNotNull()
        ).orderBy("chain_id").toPandas()
        assert list(out.inside_city) == [True, False]
