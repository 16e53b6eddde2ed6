"""Streaming ingest → INCREMENTAL near-dup detection (the composition the
r3 verdict asked for): newly-landed image files stream in, each micro-batch
is wide-signature-hashed and banded-Hamming-joined against the accumulated
signature store, so duplicates are caught AT INGEST TIME — no periodic
all-corpus recompute.

Incremental invariant: a pair is emitted by exactly one micro-batch — the
one holding its LATER-arriving member (the earlier member is already in the
store; a pair landing in one batch is emitted by that batch). Hence after
any partitioning of a corpus into micro-batches, the union of emitted pairs
EQUALS the one-shot batch join (image_dedup_wide) — which is how the gate
checks it, via the same DuckDB all-pairs oracle.

Exactly-once across restarts: the streaming checkpoint pins the file→batch
assignment, and every per-batch output (signatures into the store, pairs
into the pairs dir) goes to a `batch=<id>` directory written with
mode=overwrite — a re-executed batch recomputes byte-identical content
(deterministic kernel) over the same store prefix (store = batches < id),
so replays are idempotent. Store paths may be plain local paths or URIs
(file://, hdfs://, s3a://): Spark's reads/writes are scheme-transparent,
and the listing/delete/rename helpers below route URIs through Hadoop FS.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.images import (
    WIDE_WORDS,
    dhash_wide_images,
    wide_band_explode,
)


# --- filesystem access: plain os for local paths, Hadoop FS for URI paths
# (hdfs://, s3a://, file://, ...) so the store works on cluster storage.
# Spark's own reads/writes are scheme-transparent already; only the
# listing / delete / rename below are os-level.

_SPARK_FOR_FS: list[SparkSession | None] = [None]


def _is_uri(p: str) -> bool:
    return "://" in p


def _hadoop_fs(p: str):
    spark = _SPARK_FOR_FS[0] or SparkSession.getActiveSession()
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(p)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _listdir(root: str) -> list[str]:
    if not _is_uri(root):
        return sorted(os.listdir(root)) if os.path.isdir(root) else []
    fs, jvm = _hadoop_fs(root)
    jpath = jvm.org.apache.hadoop.fs.Path(root)
    if not fs.exists(jpath):
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(jpath))


def _rmtree(p: str) -> None:
    if not _is_uri(p):
        import shutil

        shutil.rmtree(p, ignore_errors=True)
        return
    fs, jvm = _hadoop_fs(p)
    fs.delete(jvm.org.apache.hadoop.fs.Path(p), True)


def _rename(src: str, dst: str) -> None:
    if not _is_uri(src):
        os.rename(src, dst)
        return
    fs, jvm = _hadoop_fs(src)
    P = jvm.org.apache.hadoop.fs.Path
    fs.rename(P(src), P(dst))


def _join(root: str, name: str) -> str:
    return root.rstrip("/") + "/" + name


def _batch_dirs(root: str, below: int | None = None) -> list[str]:
    out = []
    for d in _listdir(root):
        m = re.fullmatch(r"batch=(\d+)", d)
        if m and (below is None or int(m.group(1)) < below):
            out.append(_join(root, d))
    return out


def _compacted_dir(root: str) -> tuple[str | None, int]:
    """Newest `compacted=<N>` dir (signatures of every batch id < N merged
    into one directory) and its N; (None, 0) when the store has never been
    compacted."""
    best, best_n = None, 0
    for d in _listdir(root):
        m = re.fullmatch(r"compacted=(\d+)", d)
        if m and int(m.group(1)) > best_n:
            best, best_n = _join(root, d), int(m.group(1))
    return best, best_n


def _store_dirs(root: str, below: int | None = None) -> list[str]:
    """Directories whose union is the signatures of all batches < `below`:
    the newest compacted prefix plus the uncompacted batch tail.

    Horizon check: the streaming checkpoint only ever replays the single
    in-flight batch, and compact_store only covers metrics-certified
    batches, so a (re)processed batch id can sit AT the horizon (n ==
    below + 1: certified-but-uncommitted crash window — safe, because the
    replayed batch's signatures appearing both fresh and inside the
    compacted dir collapse in pairs_touching's canonical distinct) but
    never BELOW it; n > below + 1 means the store was compacted while the
    stream ran, which WOULD silently change join inputs — refuse."""
    comp, n = _compacted_dir(root)
    if comp is None:
        return _batch_dirs(root, below)
    if below is not None and n > below + 1:
        raise RuntimeError(
            f"store compacted through batch {n} but batch {below} is being "
            f"(re)processed — compact_store must only run between stream "
            f"runs"
        )
    tail = [
        d for d in _batch_dirs(root, below)
        if int(re.search(r"batch=(\d+)$", d).group(1)) >= n
    ]
    return [comp, *tail]


def compact_store(spark: SparkSession, store_path: str) -> int:
    """Merge the accumulated signature store (compacted prefix + every
    COMPLETED `batch=<id>` dir) into a single `compacted=<max_id+1>` dir
    and drop the merged inputs. Run BETWEEN stream runs (never while the
    query is active): at one dir per micro-batch a long-lived ingest
    accumulates unbounded directory listings; compaction bounds store reads
    to one merged dir + the tail since the last compaction. Atomic via
    write-to-tmp + rename; returns the new horizon N (0 = nothing to do).

    Only batches CERTIFIED by a metrics row are eligible: a crash can leave
    store/batch=b written but the streaming checkpoint uncommitted, and the
    restarted stream will REPLAY batch b — if compaction had swallowed it,
    _store_dirs' horizon guard would refuse the replay forever. The metrics
    row is written last in process(), so its presence proves the batch's
    store+pairs output is complete (the checkpoint commit may still be
    missing, but a replay over a compacted horizon N == b is then
    indistinguishable from the committed run: same store prefix, same
    idempotent overwrite outputs)."""
    comp, comp_n = _compacted_dir(store_path)
    certified = {
        int(re.search(r"batch=(\d+)$", d).group(1))
        for d in _batch_dirs(_join(store_path, "metrics"))
    }
    batches = [
        d for d in _batch_dirs(store_path)
        if int(re.search(r"batch=(\d+)$", d).group(1)) in certified
    ]
    if not batches:
        return comp_n
    ids = [int(re.search(r"batch=(\d+)$", d).group(1)) for d in batches]
    horizon = max(ids) + 1
    srcs = ([comp] if comp else []) + [
        d for d, i in zip(batches, ids) if i >= comp_n
    ]
    _SPARK_FOR_FS[0] = spark
    tmp = _join(store_path, f"compacted={horizon}.tmp")
    final = _join(store_path, f"compacted={horizon}")
    _rmtree(tmp)
    spark.read.parquet(*srcs).write.mode("overwrite").parquet(tmp)
    _rmtree(final)
    _rename(tmp, final)
    for d, i in zip(batches, ids):
        if i < horizon:
            _rmtree(d)
    if comp:
        _rmtree(comp)
    return horizon


def pairs_touching(new_sigs: DataFrame, all_sigs: DataFrame,
                   max_hamming: int = 7) -> DataFrame:
    """Wide-banded Hamming pairs with at least one side in `new_sigs`
    (all_sigs ⊇ new_sigs). Canonical (least, greatest) id ordering so a
    same-batch pair found from both sides dedupes to one row."""
    ln = wide_band_explode(new_sigs).select(
        F.col("image_id").alias("nid"),
        *[F.col(w).alias(f"n{w}") for w in WIDE_WORDS],
        "band", "key",
    )
    ra = wide_band_explode(all_sigs).select(
        F.col("image_id").alias("aid"),
        *[F.col(w).alias(f"a{w}") for w in WIDE_WORDS],
        "band", "key",
    )
    ham = " + ".join(f"bit_count(x{w} ^ y{w})" for w in WIDE_WORDS)
    lo = F.col("nid") < F.col("aid")
    return (
        ln.join(ra, ["band", "key"])
        .filter(F.col("nid") != F.col("aid"))
        # canonicalize the word columns WITH the id ordering: a same-batch
        # pair is found from both directions, and without this the swapped
        # word columns defeat the distinct (two identical output rows)
        .select(
            F.least("nid", "aid").alias("id_a"),
            F.greatest("nid", "aid").alias("id_b"),
            *[
                F.when(lo, F.col(f"n{w}")).otherwise(F.col(f"a{w}")).alias(f"x{w}")
                for w in WIDE_WORDS
            ],
            *[
                F.when(lo, F.col(f"a{w}")).otherwise(F.col(f"n{w}")).alias(f"y{w}")
                for w in WIDE_WORDS
            ],
        )
        .distinct()
        .withColumn("hamming", F.expr(f"CAST({ham} AS INT)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def start_incremental_dedup(
    spark: SparkSession,
    images_path: str,
    schema,
    store_path: str,
    pairs_path: str,
    checkpoint_path: str,
    max_hamming: int = 7,
    max_files_per_trigger: int | None = 1,
):
    """readStream over an image-file landing zone → per-micro-batch wide
    signatures + incremental banded join against the store. Returns the
    StreamingQuery (caller drives processAllAvailable / awaitTermination)."""

    _SPARK_FOR_FS[0] = spark

    def process(batch_df: DataFrame, batch_id: int) -> None:
        import time

        t0 = time.time()
        sig_dir = _join(store_path, f"batch={batch_id:09d}")
        (
            dhash_wide_images(batch_df)
            .write.mode("overwrite")
            .parquet(sig_dir)
        )
        new = spark.read.parquet(sig_dir)
        prev = _store_dirs(store_path, below=batch_id)
        prev = [d for d in prev if d != sig_dir]
        all_sigs = (
            spark.read.parquet(sig_dir, *prev) if prev else new
        )
        out = _join(pairs_path, f"batch={batch_id:09d}")
        pairs_touching(new, all_sigs, max_hamming).write.mode(
            "overwrite"
        ).parquet(out)
        # per-batch lineage + throughput record (north_rule: resumable with
        # per-partition lineage + metrics). Same idempotent overwrite layout
        # as the data; written LAST so a metrics row certifies a completed
        # batch. Counts come from parquet footers — no recompute.
        n_new = new.count()
        n_pairs = spark.read.parquet(out).count()
        secs = time.time() - t0
        spark.createDataFrame(
            [(int(batch_id), n_new, n_pairs, float(secs),
              float(n_new / secs) if secs > 0 else 0.0)],
            "batch_id long, n_images long, n_pairs long, secs double, "
            "images_per_sec double",
        ).coalesce(1).write.mode("overwrite").parquet(
            _join(_join(store_path, "metrics"), f"batch={batch_id:09d}")
        )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(images_path)
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_pairs(spark: SparkSession, pairs_path: str) -> DataFrame:
    """Accumulated pair set across every processed micro-batch."""
    dirs = _batch_dirs(pairs_path)
    if not dirs:
        return spark.createDataFrame(
            [], "id_a string, id_b string, hamming int"
        )
    return spark.read.parquet(*dirs).select("id_a", "id_b", "hamming")


def read_batch_metrics(spark: SparkSession, store_path: str) -> DataFrame:
    """Per-batch lineage/throughput records (batch_id, n_images, n_pairs,
    secs, images_per_sec) — the mid-run resume ledger: a batch with a
    metrics row is complete; absent rows re-run from the streaming
    checkpoint."""
    dirs = _batch_dirs(_join(store_path, "metrics"))
    if not dirs:
        return spark.createDataFrame(
            [],
            "batch_id long, n_images long, n_pairs long, secs double, "
            "images_per_sec double",
        )
    return spark.read.parquet(*dirs)


__all__ = [
    "start_incremental_dedup", "read_pairs", "pairs_touching",
    "read_batch_metrics", "compact_store",
]
