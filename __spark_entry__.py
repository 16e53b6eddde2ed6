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
    """Order queries so a prefix-limited driver gate maximizes coverage:
    (1) queries NEVER checked by any round's CORRECTNESS_r*.json (new this
    round, or rotation-pending) run first, (2) then queries missing from
    the NEWEST artifact (round-to-round rotation), (3) then registry order.
    Guarantees union coverage across rounds (VERDICT r02 follow-up) AND
    that freshly-added operators hit the gate in their own round."""
    import glob
    import json
    import re

    def round_no(p: str) -> int:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    ever: set[str] = set()
    newest: set[str] = set()
    artifacts = sorted(
        glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")), key=round_no
    )
    for p in artifacts:
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        # a rows-only record (hash_match null — the query had no oracle
        # that round) does NOT count as verified: such queries keep top
        # priority until an exact-gate row exists for them. Artifacts that
        # are a bare list of names (no per-query records) count as checked.
        if isinstance(data, dict):
            keys = {
                n for n, rec in data.items()
                if not isinstance(rec, dict) or rec.get("hash_match")
            }
        elif isinstance(data, list):
            keys = {n for n in data if isinstance(n, str)}
        else:
            continue
        ever |= keys
        if p == artifacts[-1]:
            newest = keys
    return sorted(
        names, key=lambda n: (n in ever, n in newest, names.index(n))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = _gate_priority_order(list(_q.QUERIES))
    return {name: _wrap(_q.QUERIES[name]) for name in ordered}


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
