"""grouped_map_in_pandas — applyInPandas semantics at mapInPandas cost.

`df.groupBy(k).applyInPandas(fn)` pays one Python call per GROUP; with
millions of tiny groups (chains of a few vertices) the per-group overhead
dominates by 10-100×. This helper keeps the same per-group `fn` contract but
executes it per Arrow BATCH:

  1. repartition by the key (each group lives in exactly one partition),
  2. sortWithinPartitions by (key, order),
  3. mapInPandas over the partition's batch stream, carrying the trailing
     (possibly batch-straddling) group over to the next batch before
     running a vectorized pandas groupby-apply on complete groups.

Same shuffle count as applyInPandas (one), far fewer Python transitions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def grouped_map_in_pandas(
    df: DataFrame,
    key: str,
    fn,
    schema: str,
    order: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Run `fn(group_pdf) -> pdf` once per group, batched per partition."""
    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    arranged = df.repartition(parts, key)
    arranged = (
        arranged.sortWithinPartitions(key, order) if order
        else arranged.sortWithinPartitions(key)
    )

    def run(it):
        carry: pd.DataFrame | None = None
        for pdf in it:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            last_key = pdf[key].iloc[-1]
            complete = pdf[pdf[key] != last_key]
            carry = pdf[pdf[key] == last_key]
            if len(complete):
                yield from _apply_groups(complete, key, fn)
        if carry is not None and len(carry):
            yield from _apply_groups(carry, key, fn)

    return arranged.mapInPandas(run, schema=schema)


def _apply_groups(pdf: pd.DataFrame, key: str, fn):
    outs = []
    for _, grp in pdf.groupby(key, sort=False):
        out = fn(grp)
        if out is not None and len(out):
            outs.append(out)
    if outs:
        yield pd.concat(outs, ignore_index=True)
