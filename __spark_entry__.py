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


def _gate_priority_order(names: list[str]) -> list[str]:
    """Order queries so the ones WITHOUT a row in the newest committed
    CORRECTNESS_r*.json run FIRST: if the driver's gate checks only a prefix
    of the registry, rotation then guarantees union coverage across rounds
    (VERDICT r02 follow-up — 26/76 queries were never gate-checked)."""
    import glob
    import json
    import re

    def round_no(p: str) -> int:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    seen: set[str] = set()
    artifacts = sorted(
        glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")), key=round_no
    )
    if artifacts:
        try:
            with open(artifacts[-1]) as f:
                seen = set(json.load(f))
        except (OSError, ValueError):
            seen = set()
    return sorted(names, key=lambda n: (n in seen, names.index(n)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = _gate_priority_order(list(_q.QUERIES))
    return {name: _wrap(_q.QUERIES[name]) for name in ordered}


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
