#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric mirrors BASELINE.json: end-to-end spatial-join +
tile-assignment throughput. `value` is total wall seconds over the headline
query set; `queries` holds per-query seconds; extra keys record rows/sec for
the flagship and the parallelism level used.

--two-level additionally reruns the flagship at N/4 cores and reports the
scaling efficiency (BASELINE.md sandbox protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline set: the flagship e2e + the operators that stress shuffle/window/agg
HEADLINE = [
    "pip_city",
    "pip_hierarchy",
    "knn_city",
    "clip_chains",
    "tile_counts",
    "tile_chain_closure",
    "node_degree",
    "density_histogram",
]


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )


def run_df(df) -> int:
    """Materialize fully without collecting (noop sink) and return row count."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def bench_flagship(spark, sf_dir: str) -> tuple[float, int]:
    from osm2mp_spark.plans.flagship import flagship

    df = flagship(spark, sf_dir)
    t0 = time.time()
    n = df.count()
    return time.time() - t0, n


def main():
    two_level = "--two-level" in sys.argv
    import __spark_entry__ as entry

    qs = entry.queries()

    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    from osm2mp_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    # warm-up: JVM + Arrow path
    spark.range(1000).selectExpr("sum(id)").collect()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        if name not in qs:
            continue
        df = qs[name](spark, SF_DIR)
        t0 = time.time()
        run_df(df)
        dt = time.time() - t0
        per_query[name] = round(dt, 3)
        total += dt

    fl_sec, fl_rows = bench_flagship(spark, SF_DIR)
    per_query["flagship_e2e"] = round(fl_sec, 3)
    total += fl_sec
    rows_per_sec = fl_rows / fl_sec if fl_sec > 0 else 0.0

    result = {
        "metric": "headline query wall time (spatial join + tiling engine)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": SF_DIR,
        "cpus": CPUS,
        "flagship_rows": fl_rows,
        "flagship_rows_per_sec": round(rows_per_sec, 1),
    }

    if two_level:
        spark.stop()
        low = max(1, CPUS // 4)
        spark_low = make_spark(low)
        spark_low.sparkContext.setLogLevel("ERROR")
        ensure_shipped(spark_low)
        spark_low.range(1000).selectExpr("sum(id)").collect()
        fl_sec_low, _ = bench_flagship(spark_low, SF_DIR)
        spark_low.stop()
        rps_low = fl_rows / fl_sec_low if fl_sec_low else 0.0
        eff = (rows_per_sec / rps_low) / (CPUS / low) if rps_low else 0.0
        result["two_level"] = {
            "n_cores": low,
            "n4_cores": CPUS,
            "rows_per_sec_n": round(rps_low, 1),
            "rows_per_sec_4n": round(rows_per_sec, 1),
            "scaling_efficiency": round(eff, 3),
        }
    else:
        spark.stop()

    print(json.dumps(result))


if __name__ == "__main__":
    main()
