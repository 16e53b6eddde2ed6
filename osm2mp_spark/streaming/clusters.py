"""Incremental near-dup CLUSTERING: min-label connected components
maintained across micro-batches — the third leg of the incremental family
(pairs: streaming.dedup; ANN top-k: streaming.ann; cluster/keeper: here).

The batch form (queries.images_q.image_dedup_clusters_wide) labels each
signature with the minimum packed id of its connected component over the
near-dup pair graph. Incrementally, a micro-batch's new pairs can (a) link
brand-new vertices, (b) attach new vertices to existing clusters, or (c)
MERGE existing clusters. (c) is the scale hazard: relabeling a merged
cluster's members would cost O(cluster) per merge. Instead, merges are
recorded in a FORWARDING log and member rows are never rewritten:

  labels/batch=<id>   (vertex, label)      — append-only: one row per
                                            vertex, written in the batch
                                            where it first appears in a
                                            pair; `label` was its root at
                                            that moment
  forward/batch=<id>  (from_label, to_label) — cluster merges of batch id

A vertex's CURRENT root = follow its stored label through the forwarding
chains. Roots are component minima by induction (a merge's new root is the
min of the merged roots and any new vertex ids), so resolved labels equal
the batch min-label components over the union of all pairs seen — which is
how the gate checks it (same recursive-CTE DuckDB oracle as the one-shot).

Per-batch cost is O(batch): the batch's pair graph + the CURRENT labels of
its touched vertices (pruned row-group scan of the vertex-sorted compacted
labels store — streaming.dedup.pruned_store_scan) + the forwarding tail
(bounded by compaction cadence) feed a driver union-find sized by the
BATCH, never the store. compact_labels resolves every chain and rewrites
the labels store sorted by vertex with an empty forwarding tail, bounding
both chain length and tail reads; it only merges batches certified by the
dedup metrics ledger (same crash-window rules as the other stores).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import (
    _SPARK_FOR_FS,
    _batch_dirs,
    _chunked_in_scan,
    _commit_compacted,
    _compacted_dir,
    _join,
    _rmtree,
    _tail_dirs,
)

LABELS_SCHEMA = "vertex long, label long"
FORWARD_SCHEMA = "from_label long, to_label long"


def _forward_map(spark: SparkSession, forward_root: str,
                 below: int | None = None) -> dict[int, int]:
    """Driver-side forwarding map with path compression. The forwarding
    tail holds one row per cluster MERGE since the last compaction —
    bounded by compaction cadence, so the collect is bounded (and empty
    right after a compaction)."""
    dirs = _batch_dirs(forward_root, below)
    if not dirs:
        return {}
    fwd = {
        int(r.from_label): int(r.to_label)
        for r in spark.read.parquet(*dirs).collect()
    }

    def resolve(x: int) -> int:
        seen = []
        while x in fwd:
            seen.append(x)
            x = fwd[x]
        for s in seen:
            fwd[s] = x
        return x

    for k in list(fwd):
        resolve(k)
    return fwd


def _labels_for(
    spark: SparkSession, labels_root: str, vertices: list[int],
    below: int | None = None,
) -> dict[int, int]:
    """Stored (vertex → label-at-write-time) for the given vertex set:
    chunked-In point lookup (_chunked_in_scan — row-group pruning on the
    vertex-sorted compacted prefix, and the filter also bounds the driver
    collect) over compacted prefix + delta tail, one collect job."""
    comp, n = _compacted_dir(labels_root)
    scan = _chunked_in_scan(
        spark, comp, _tail_dirs(labels_root, n, below), vertices, "vertex"
    )
    if scan is None:
        return {}
    return {int(r.vertex): int(r.label) for r in scan.collect()}


def update_clusters(
    spark: SparkSession,
    labels_root: str,
    batch_id: int,
    pairs: DataFrame,
    key_expr_a: str,
    key_expr_b: str,
) -> dict:
    """Fold one micro-batch's pairs into the cluster state. `key_expr_a/b`
    are SQL expressions packing the pair id columns to BIGINT vertices
    (e.g. queries.images_q._img_key('id_a')). Idempotent overwrite per
    batch; a replay recomputes identical deltas from the state below it.

    Returns the batch's FOLD — `{"touched": [v...], "old_root": {v: root
    before this batch}, "new_root": {x: root after, for x in touched ∪
    old roots}}` — so downstream incremental consumers (the flagship
    rollup's retraction deltas, streaming.flagship) see exactly which
    clusters this batch changed without re-deriving the union-find."""
    from ..operators.chains import (
        _DEFAULT_DRIVER_EDGES,
        _DRIVER_EDGES_CONF,
        min_label_components,
    )

    _SPARK_FOR_FS[0] = spark
    kdf = pairs.selectExpr(f"{key_expr_a} AS ka", f"{key_expr_b} AS kb")
    max_edges = int(
        spark.conf.get(_DRIVER_EDGES_CONF, str(_DEFAULT_DRIVER_EDGES))
    )
    # GUARD (the r5 verdict's one perf-weak item): a hot micro-batch (near-
    # identical-signature flood) emits O(n²) pairs — collecting them raw
    # would put the whole quadratic graph on the driver. Count first (the
    # batch pairs are an already-written parquet dir, so this is a cheap
    # metadata-ish scan); above the same crossover min_label_components
    # uses, pre-collapse the batch graph DISTRIBUTIVELY and collect only a
    # spanning edge per non-root vertex — O(batch vertices), connectivity-
    # equivalent, so the union-find below (and every output: labels,
    # forwarding, fold summary) is unchanged.
    if kdf.count() <= max_edges:
        edges = [(int(r.ka), int(r.kb)) for r in kdf.collect()]
    else:
        lab = min_label_components(kdf, src="ka", dst="kb")
        edges = [
            (int(r.vertex), int(r.label))
            for r in lab.collect()
            if r.vertex != r.label
        ]
    labels_dir = _join(labels_root, "labels")
    forward_dir = _join(labels_root, "forward")
    if not edges:
        # still write empty deltas so the layout stays per-batch uniform
        spark.createDataFrame([], LABELS_SCHEMA).write.mode(
            "overwrite"
        ).parquet(_join(labels_dir, f"batch={batch_id:09d}"))
        spark.createDataFrame([], FORWARD_SCHEMA).write.mode(
            "overwrite"
        ).parquet(_join(forward_dir, f"batch={batch_id:09d}"))
        return {"touched": [], "old_root": {}, "new_root": {}}
    touched = sorted({v for e in edges for v in e})
    stored = _labels_for(spark, labels_dir, touched, below=batch_id)
    fwd = _forward_map(spark, forward_dir, below=batch_id)

    def current_root(v: int) -> int:
        l = stored.get(v, v)
        while l in fwd:
            l = fwd[l]
        return l

    old_root = {v: current_root(v) for v in touched}

    # driver union-find sized by the BATCH's pair graph: vertices are the
    # touched ids and their current roots
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-label rule keeps roots = component minima by induction
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for v in touched:
        union(v, current_root(v))
    for a, b in edges:
        union(a, b)

    new_labels = [
        (v, find(v)) for v in touched if v not in stored
    ]
    # forwarding records merges of PRE-EXISTING roots only. A new vertex's
    # root is written directly into its labels row; and every pre-existing
    # root that merges is reachable here, because a merge of root L needs a
    # touched STORED vertex resolving to L (a new vertex resolves to
    # itself), and any pre-existing root is itself a stored vertex.
    merges = set()
    for v in touched:
        if v not in stored:
            continue
        old = current_root(v)
        new = find(old)
        if new != old:
            merges.add((old, new))
    merges = sorted(merges)
    spark.createDataFrame(new_labels or [], LABELS_SCHEMA).coalesce(
        1
    ).write.mode("overwrite").parquet(
        _join(labels_dir, f"batch={batch_id:09d}")
    )
    spark.createDataFrame(merges or [], FORWARD_SCHEMA).coalesce(
        1
    ).write.mode("overwrite").parquet(
        _join(forward_dir, f"batch={batch_id:09d}")
    )
    return {
        "touched": touched,
        "old_root": old_root,
        "new_root": {
            x: find(x) for x in set(touched) | set(old_root.values())
        },
    }


def read_labels(spark: SparkSession, labels_root: str) -> DataFrame:
    """Fully-resolved (vertex, label) over everything processed so far:
    stored labels mapped through the (driver-bounded) forwarding map."""
    _SPARK_FOR_FS[0] = spark
    labels_dir = _join(labels_root, "labels")
    comp, n = _compacted_dir(labels_dir)
    dirs = ([comp] if comp else []) + _tail_dirs(labels_dir, n)
    if not dirs:
        return spark.createDataFrame([], LABELS_SCHEMA)
    lab = spark.read.parquet(*dirs)
    fwd = _forward_map(spark, _join(labels_root, "forward"))
    if not fwd:
        return lab.select("vertex", "label")
    mapping = spark.createDataFrame(
        [(k, v) for k, v in fwd.items()], FORWARD_SCHEMA
    )
    return (
        lab.join(F.broadcast(mapping),
                 lab.label == mapping.from_label, "left")
        .select("vertex", F.coalesce("to_label", "label").alias("label"))
    )


def compact_labels(
    spark: SparkSession,
    labels_root: str,
    store_path: str,
    block_bytes: int = 8 << 20,
    num_files: int | None = None,
) -> int:
    """Resolve every forwarding chain into the stored labels and rewrite
    them as one `labels/compacted=<N>` dir range-sorted by vertex (the
    layout pruned per-batch reads need), dropping the merged label deltas
    and the forwarding rows they absorbed. Only batches certified by the
    dedup metrics ledger merge (crash-window replay safety, as in
    compact_store)."""
    _SPARK_FOR_FS[0] = spark
    labels_dir = _join(labels_root, "labels")
    forward_dir = _join(labels_root, "forward")
    comp, comp_n = _compacted_dir(labels_dir)
    certified = {
        int(re.search(r"batch=(\d+)$", d).group(1))
        for d in _batch_dirs(_join(store_path, "metrics"))
    }
    mcomp, mcomp_n = _compacted_dir(_join(store_path, "metrics"))

    def ok(d: str) -> bool:
        i = int(re.search(r"batch=(\d+)$", d).group(1))
        return i in certified or i < mcomp_n

    lab_batches = [d for d in _batch_dirs(labels_dir) if ok(d)]
    fwd_batches = [d for d in _batch_dirs(forward_dir) if ok(d)]
    if not lab_batches and not fwd_batches:
        return comp_n
    ids = [
        int(re.search(r"batch=(\d+)$", d).group(1))
        for d in lab_batches + fwd_batches
    ]
    horizon = max(ids) + 1
    if horizon <= comp_n:
        # every input is a sub-horizon crash-window replay dir — degenerate
        # (empty) by construction, since a replay of a batch the compacted
        # labels already resolve folds to a no-op. Dropping them is the
        # whole job; recommitting at the unchanged horizon would only open
        # a crash window where the store's one compacted copy is mid-swap.
        for d in lab_batches + fwd_batches:
            _rmtree(d)
        return comp_n
    lab_tail = [
        d for d in lab_batches
        if int(re.search(r"batch=(\d+)$", d).group(1)) >= comp_n
    ]
    srcs = ([comp] if comp else []) + lab_tail
    lab = spark.read.parquet(*srcs)
    fwd = _forward_map(spark, forward_dir)
    if fwd:
        mapping = spark.createDataFrame(
            [(k, v) for k, v in fwd.items()], FORWARD_SCHEMA
        )
        lab = (
            lab.join(F.broadcast(mapping),
                     lab.label == mapping.from_label, "left")
            .select("vertex", F.coalesce("to_label", "label").alias("label"))
        )
    n_parts = num_files or spark.sparkContext.defaultParallelism
    _commit_compacted(
        labels_dir, horizon,
        lambda tmp: (
            lab.repartitionByRange(n_parts, "vertex")
            .sortWithinPartitions("vertex")
            .write.mode("overwrite")
            .option("parquet.block.size", block_bytes)
            .parquet(tmp)
        ),
        sources=lab_batches + fwd_batches,
        old_comp=comp,
    )
    return horizon


__all__ = [
    "update_clusters", "read_labels", "compact_labels",
    "LABELS_SCHEMA", "FORWARD_SCHEMA",
]
