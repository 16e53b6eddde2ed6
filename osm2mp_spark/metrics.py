"""Measurement helpers shared by bench.py and the test suite."""

from __future__ import annotations


def max_stage_tasks(spark, tag: str, run) -> int:
    """Largest stage (by task count) among the jobs `run` submits, via a
    dedicated job group — the stable witness that AQE's skew split fired
    (the join stage fans out beyond the shuffle partition count). The
    final-plan `skew=true` string is NOT reliable for this: it only prints
    while the re-optimized query stage object is still materialized. Use a
    UNIQUE tag per probe — job groups accumulate across calls."""
    sc = spark.sparkContext
    sc.setJobGroup(tag, tag)
    try:
        run()
    finally:
        sc.setJobGroup("", "")
    tr = sc.statusTracker()
    mx = 0
    for j in tr.getJobIdsForGroup(tag):
        ji = tr.getJobInfo(j)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = tr.getStageInfo(sid)
            if si:
                mx = max(mx, si.numTasks)
    return mx


__all__ = ["max_stage_tasks"]
