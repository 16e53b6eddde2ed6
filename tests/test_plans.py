"""Physical-plan assertions — codify the perf claims so regressions that
silently change the plan shape (a lost broadcast, an extra shuffle, lost
column pruning) fail loudly."""

import contextlib
import io

import pytest


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


class TestPlanShapes:
    def test_way_node_resolution_uses_sort_merge(self, spark, sf_dir):
        import __spark_entry__ as E

        p = plan_of(E.queries()["way_node_resolution"](spark, sf_dir))
        assert "SortMergeJoin" in p
        assert "BroadcastHashJoin" not in p

    def test_pip_city_no_shuffle_before_udf(self, spark, sf_dir):
        """pip_resolve is shuffle-free: the only Exchange (if any) belongs
        to downstream consumers, not the containment itself."""
        from osm2mp_spark.operators.pip_join import pip_resolve
        from osm2mp_spark.queries.spatial import _city_index, customer_points

        df = pip_resolve(customer_points(spark, sf_dir), _city_index())
        p = plan_of(df)
        assert "Exchange" not in p
        assert "ArrowEvalPython" in p or "PythonUDF" in p or "Project" in p

    def test_knn_expression_no_join_no_shuffle(self, spark, sf_dir):
        from osm2mp_spark.operators.knn import knn_bruteforce
        from osm2mp_spark.queries.spatial import customer_points
        from osm2mp_spark.sources.layers import CITIES

        anchors = [(c["area_id"], c["center"][0], c["center"][1]) for c in CITIES]
        p = plan_of(knn_bruteforce(customer_points(spark, sf_dir), anchors))
        assert "Join" not in p
        assert "Exchange" not in p

    def test_image_flagship_single_exchange_pruned_scan(self, spark, tmp_path):
        from osm2mp_spark.plans.images_flagship import flagship_images
        from osm2mp_spark.sources.images import generate_images_df

        path = str(tmp_path / "imgs")
        generate_images_df(spark, 30, partitions=2).write.parquet(path)
        p = plan_of(flagship_images(spark, path))
        # one shuffle total (the final partial->final aggregate)
        assert p.count("Exchange") == 1
        # scan pruned to the 5 needed columns (no w/h/caption/phash)
        assert "caption" not in p.split("ReadSchema")[-1]
        assert "MapInPandas" in p

    def test_small_dim_joins_broadcast(self, spark, sf_dir):
        import __spark_entry__ as E

        p = plan_of(E.queries()["street_relation_tags"](spark, sf_dir))
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p

    def test_pricing_summary_filter_pushdown(self, spark, sf_dir):
        import __spark_entry__ as E

        p = plan_of(E.queries()["pricing_summary"](spark, sf_dir))
        assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p

    def test_dedup_pair_joins_never_cartesian(self, spark, sf_dir):
        """The PAIR joins of simhash_pairs / dedup_embedding_cosine /
        ngram_jaccard are banded equi-joins — an inequality-only pair join
        would plan as CartesianProduct (or an un-keyed nested loop over the
        corpus×corpus space) and die at scale. Tiny fixed-size dimension
        crossJoins (8-row hexpos etc.) are allowed."""
        import re

        import __spark_entry__ as E

        keys = {
            "simhash_pairs": "band_no",
            "dedup_embedding_cosine": "band_no",
            "ngram_jaccard": "shingle",
        }
        for name, key in keys.items():
            p = plan_of(E.queries()[name](spark, sf_dir))
            assert "CartesianProduct" not in p, name
            # the pair join is an equi-join keyed on the banding column
            assert re.search(
                rf"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin) \[{key}", p
            ), name

    def test_knn_city_query_zero_shuffle(self, spark, sf_dir):
        """The full J15 query (containment filter + expression kNN) must
        plan with no join and no exchange — one Arrow resolve, one filter,
        one expression projection."""
        import __spark_entry__ as E

        p = plan_of(E.queries()["knn_city"](spark, sf_dir))
        assert "Exchange" not in p
        assert "Join" not in p

    def test_pip_hierarchy_zero_shuffle_single_arrow_pass(self, spark, sf_dir):
        """All three addressing levels resolve in ONE batched Arrow node —
        no joins, no exchanges (Catalyst fuses adjacent scalar pandas UDFs)."""
        import __spark_entry__ as E

        p = plan_of(E.queries()["pip_hierarchy"](spark, sf_dir))
        assert "Exchange" not in p
        assert "Join" not in p
        assert p.count("ArrowEvalPython") == 1


class TestRound3PlanShapes:
    """Pin the round-3 rewrites: a regression back to the amplified shapes
    changes these plans visibly."""

    def test_simhash_votes_one_aggregate_no_explode(self, spark, sf_dir):
        """dedup_simhash: per-token digit columns + ONE groupBy of 32
        map-side-combined sums — no hexpos/k crossJoin row explosion."""
        import __spark_entry__ as E

        p = plan_of(E.queries()["dedup_simhash"](spark, sf_dir))
        assert "partial_sum" in p             # map-side combine present
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        # exactly one explode (the token split), not hexpos x k
        assert p.count("Generate") <= 1

    def test_minhash_single_groupby_no_seed_crossjoin(self, spark, sf_dir):
        """dedup_minhash_lsh: N_HASH min aggregates in one groupBy; the only
        joins are the band-bucket equi-join (no seed-table crossJoin)."""
        import __spark_entry__ as E

        p = plan_of(E.queries()["dedup_minhash_lsh"](spark, sf_dir))
        assert "partial_min" in p
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

    def test_embedding_dedup_distinct_before_dot(self, spark, sf_dir):
        """dedup_embedding_cosine: the exact-dot verification happens after
        the pair-id distinct via BROADCAST lookback joins of the vector
        table — never per band collision."""
        import __spark_entry__ as E

        p = plan_of(E.queries()["dedup_embedding_cosine"](spark, sf_dir))
        assert p.count("BroadcastHashJoin") >= 2  # qa/na and qb/nb lookbacks
        assert "CartesianProduct" not in p

    def test_image_spatial_join_single_lineage(self, spark, sf_dir):
        """One generation pass, zero joins: features carry lon/lat through,
        PIP runs on the feature rows."""
        import __spark_entry__ as E

        p = plan_of(E.queries()["image_spatial_join"](spark, sf_dir))
        assert "Join" not in p
        assert p.count("MapInPandas") == 2  # generate, then decode+features


class TestLateRound3PlanShapes:
    """Pin the plan shapes of the session's new operator families."""

    def test_image_ann_topk_banded_broadcast_no_cartesian(self, spark, sf_dir):
        """The query set reaches the corpus only through the (band, key)
        broadcast equi-join — an inequality-only pair join would plan as a
        cartesian/nested loop over corpus x corpus."""
        import __spark_entry__ as E

        p = plan_of(E.queries()["image_ann_topk"](spark, sf_dir))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert p.count("BroadcastHashJoin") == 1

    def test_cell_rollup_one_pass_all_levels(self, spark, sf_dir):
        """All four resolution levels come from ONE shuffle: grouping-set
        Expand + map-side partial aggregation, single Exchange."""
        import __spark_entry__ as E

        p = plan_of(E.queries()["cell_rollup"](spark, sf_dir))
        assert "Expand" in p
        assert p.count("Exchange") == 1
        assert "partial_count" in p

    def test_render_chain_queries_single_shuffle(self, spark, sf_dir):
        """The chain renderers aggregate per chain with map-side partial
        aggregation and exactly one Exchange — no window, no join."""
        import __spark_entry__ as E

        for name in ("mp_polyline_render", "mp_road_render"):
            p = plan_of(E.queries()[name](spark, sf_dir))
            assert p.count("Exchange") == 1, name
            assert "Join" not in p, name
            assert "Window" not in p, name


class TestConditionalBroadcast:
    def test_gated_broadcast_falls_back_to_shuffle(self, spark):
        """maybe_broadcast keeps the hint under the ceiling and drops it
        above: with the ceiling forced to 1 row, the image ANN candidate
        join must plan WITHOUT a broadcast of the query side (VERDICT r03:
        unconditional F.broadcast of a corpus-derived frame OOMs at
        10^12)."""
        import __spark_entry__ as E

        key = "spark.osm2mp.broadcast.maxRows"
        auto = "spark.sql.autoBroadcastJoinThreshold"
        old_auto = spark.conf.get(auto)
        spark.conf.set(auto, "-1")  # isolate the explicit hint
        try:
            spark.conf.set(key, "1")
            low = E.queries()["image_ann_topk"](spark, "/root/testdata/sf0.001")
            plan_low = low._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" not in plan_low
            assert "CartesianProduct" not in plan_low

            spark.conf.set(key, str(4_000_000))
            hi = E.queries()["image_ann_topk"](spark, "/root/testdata/sf0.001")
            plan_hi = hi._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" in plan_hi
        finally:
            spark.conf.unset(key)
            spark.conf.set(auto, old_auto)
