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


class TestBandJoinSkew:
    """Adversarial skew for the wide-signature band join (VERDICT r04 ask
    #5): a planted corpus where ONE band bucket holds ~every signature
    (constant-content images share the h0 word → bands 0 and 1 collide
    corpus-wide). The join must neither lose correctness nor serialize
    into a single straggler task."""

    N = 2000

    def _planted_sigs(self, spark):
        """N signatures sharing h0 (adversarial constant band) with h1-h3
        spread far apart (i*2^13 steps ⇒ unrelated pairs differ by tens of
        bits), plus 3 planted near-dup pairs (last-bit flips)."""
        import pandas as pd

        rows = []
        for i in range(self.N):
            h1 = (i * 0x2001) & 0x7FFFFFFFFFFFFFFF
            h2 = (i * 0x40009) & 0x7FFFFFFFFFFFFFFF
            h3 = (i * 0x800011) & 0x7FFFFFFFFFFFFFFF
            rows.append(("skew%06d" % i, 0x1234567890ABCDEF, h1, h2, h3))
        for j in range(3):  # near-dups of the first three
            b = rows[j]
            rows.append((b[0] + "x", b[1], b[2] ^ 1, b[3], b[4]))
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["image_id", "h0", "h1", "h2", "h3"])
        )

    def _brute_pairs(self, sigs_pdf):
        import numpy as np

        ids = sigs_pdf.image_id.to_numpy()
        words = sigs_pdf[["h0", "h1", "h2", "h3"]].to_numpy(dtype=np.uint64)
        out = set()
        n = len(ids)
        # vectorized all-pairs popcount, one anchor row at a time
        for i in range(n):
            x = words[i] ^ words
            ham = np.zeros(n, dtype=np.int64)
            for w in range(4):
                v = x[:, w].copy()
                c = np.zeros(n, dtype=np.int64)
                while v.any():
                    c += (v & np.uint64(1)).astype(np.int64)
                    v >>= np.uint64(1)
                ham += c
            for j in np.nonzero(ham <= 7)[0]:
                if ids[i] < ids[j]:
                    out.add((ids[i], ids[j], int(ham[j])))
        return out

    def test_skewed_bucket_correct_and_split(self, spark):
        from osm2mp_spark.operators.images import wide_hamming_pairs

        sigs = self._planted_sigs(spark)
        confs = {
            # force the shuffled join path (at 10^12 sigs nothing
            # broadcasts) and make AQE's skew splitter fire at test scale
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        }
        old = {k: spark.conf.get(k, None) for k in confs}

        # AQE's skew split shows up as MORE tasks than shuffle partitions
        # in the join stage — the stable witness (the plan string's
        # skew=true marker prints only while the re-optimized query stage
        # object is still materialized). Shared with bench.py --skew.
        from osm2mp_spark.metrics import max_stage_tasks

        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            pairs = wide_hamming_pairs(sigs, max_hamming=7)
            got = set()
            n_tasks_on = max_stage_tasks(
                spark, "skew_on", lambda: got.update(
                    (r.id_a, r.id_b, r.hamming) for r in pairs.collect()
                )
            )
            exp = self._brute_pairs(sigs.toPandas())
            assert got == exp and len(got) >= 3
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            n_tasks_off = max_stage_tasks(
                spark, "skew_off",
                lambda: wide_hamming_pairs(sigs, max_hamming=7).count(),
            )
            n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
            # skew split really fired: the join stage fans out beyond the
            # shuffle partition count; without it, it cannot
            assert n_tasks_on > n_parts >= n_tasks_off, (
                n_tasks_on, n_tasks_off, n_parts,
            )
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
