#!/usr/bin/env python
"""Production entrypoint — the north rule's deployment shape:

    spark-submit --py-files osm2mp_spark.zip tools/run_job.py \\
        --sf-dir /root/testdata/sf0.01 --out /tmp/flagship_out

Runs the flagship spatial pipeline (PIP city containment + kNN fallback +
BSP tile assignment) over the given parquet tables and writes the result
through the per-partition checkpoint sink (bucketed parquet + lineage
manifest with input fingerprint and throughput metrics). A re-run after a
mid-job kill redoes only the buckets with no manifest record — resume is
the default behavior, not a flag.

The script imports osm2mp_spark WITHOUT any sys.path setup: the package
must arrive via --py-files (or an installed wheel), which is exactly what
this entrypoint exists to prove.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("osm2mp-flagship").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # imports resolve from --py-files
    from osm2mp_spark.plans.flagship import flagship
    from osm2mp_spark.streaming.checkpoint import checkpointed_write

    result = flagship(spark, args.sf_dir)
    stats = checkpointed_write(result, args.out, "point_id", n_buckets=args.buckets)
    print(json.dumps({"job": "flagship", "out": args.out, **stats}))
    spark.stop()


if __name__ == "__main__":
    main()
