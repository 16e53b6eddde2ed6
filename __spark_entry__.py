"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship spatial pipeline on sf0.001.
queries()         — operator queries from SURVEY.md §2 (registry in
                    osm2mp_spark.queries).
oracle_sql()      — DuckDB-equivalent SQL per query (same parquet views).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from osm2mp_spark import queries as _q  # noqa: E402
from osm2mp_spark.shipping import ensure_shipped  # noqa: E402

_q.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from osm2mp_spark.plans.flagship import flagship

    ensure_shipped(spark)
    return flagship(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable) -> Callable:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_shipped(spark)
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in _q.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
