"""Dump .explain('formatted') for named registry queries to plans/r06/.

Usage: python tools/dump_plans.py <suffix> [query ...]
Writes plans/r06/<query>_<suffix>.txt for each query (default: a fixed hot set).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "image_dedup_phash",
    "image_dedup_wide",
    "image_dedup_clusters",
    "flagship_dedup",
    "image_ann_topk",
    "image_ann_topk_wide",
    "multimodal_dedup",
    "caption_exact_pairs",
    "node_degree",
    "tile_chain_closure",
    "clip_chains",
    "cell_rollup",
]


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    qs = entry.queries()
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dump-plans")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name not in qs:
            print(f"skip {name}: not in registry")
            continue
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
