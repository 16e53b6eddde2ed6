"""Multimodal (image) operators — Arrow-batched mapInPandas plumbing.

The spatial stages of the engine must never ship `bytes` through Python
(SURVEY §7.3 risk 5): geometry work selects payload columns away and
re-joins on image_id. These operators are the *payload* path: decode,
verify (the per-row invariant of BASELINE.json input_hint), resize, and
feature extraction — each a vectorized batch kernel inside mapInPandas with
a real schema, so the Spark-side shape (column pruning, batch sizes,
partition counts) is production-true even where a codec is stubbed
(see sources.images: jpeg is a clearly-marked deterministic fake codec).

Video frame-sampling (`sample_frames`) is a real FVID seek-sampler: the
container format carries a frame index, only the sampled frames are decoded
(seek, never full-scan), and each sampled frame is re-encoded as a real PNG.
Only the underlying *codec* is the documented container stand-in
(sources.images FJPG/FVID — no image/video libs ship in this sandbox).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..sources.images import caption_for, decode, phash_for, pixels_for

VERIFY_SCHEMA = (
    "image_id string, fmt string, pixels_ok boolean, psnr double, "
    "caption_ok boolean, phash_ok boolean"
)

FEATURE_SCHEMA = (
    "image_id string, mean_r double, mean_g double, mean_b double, "
    "std_gray double, dhash long"
)

RESIZE_SCHEMA = "image_id string, out_w int, out_h int, out_bytes binary"


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def verify_images(df: DataFrame, psnr_min: float = 40.0) -> DataFrame:
    """Per-row payload invariant (input_hint): decode bytes → allclose vs the
    generator's pixels (exact for png/bmp, PSNR ≥ psnr_min for lossy),
    caption exact equality, phash recompute match."""

    def kernel(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                idx = int(r.image_id[3:])
                want = pixels_for(r.image_id, r.w, r.h)
                got = decode(bytes(r.bytes), r.fmt)
                if r.fmt in ("png", "bmp"):
                    ok = bool(np.array_equal(got, want))
                    ps = float("inf") if ok else _psnr(got, want)
                else:
                    ps = _psnr(got, want)
                    ok = ps >= psnr_min
                rows.append(
                    (
                        r.image_id,
                        r.fmt,
                        ok,
                        ps if np.isfinite(ps) else 99.0,
                        r.caption == caption_for(idx),
                        int(r.phash) == phash_for(want),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "fmt", "pixels_ok", "psnr", "caption_ok", "phash_ok",
                ],
            )

    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    cols = df.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    return cols.mapInPandas(kernel, schema=VERIFY_SCHEMA)


def extract_features(df: DataFrame, carry: list[str] | None = None) -> DataFrame:
    """Per-channel means, grayscale std, and an 8×8 difference hash — the
    embedding-ish features downstream dedup/ANN stages consume.

    `carry`: extra input columns passed through unchanged (e.g. lon/lat) so
    a downstream spatial stage can run on THIS output instead of re-deriving
    a second branch of the image lineage — branching an expensive generation/
    decode DAG executes it once per branch."""
    carry = list(carry or [])

    def kernel(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                px = decode(bytes(r.bytes), r.fmt).astype(np.float64)
                gray = px.mean(axis=2)
                # 8x8 dhash: downsample to 8x9 grid, compare horizontal pairs
                h, w = gray.shape
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(9) * w) // 9
                g = gray[np.ix_(ys, xs)]
                bits = (g[:, 1:] > g[:, :-1]).flatten()
                dh = 0
                for b in bits:
                    dh = (dh << 1) | int(b)
                dh -= (dh & (1 << 63)) << 1  # to signed int64
                rows.append(
                    (
                        r.image_id,
                        float(px[:, :, 0].mean()),
                        float(px[:, :, 1].mean()),
                        float(px[:, :, 2].mean()),
                        float(gray.std()),
                        dh,
                    )
                    + tuple(getattr(r, c) for c in carry)
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "mean_r", "mean_g", "mean_b", "std_gray",
                         "dhash", *carry],
            )

    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    schema = FEATURE_SCHEMA
    if carry:
        carried = df.select(*carry).schema
        schema += ", " + ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in carried.fields
        )
    return df.select("image_id", "bytes", "fmt", *carry).mapInPandas(
        kernel, schema=schema
    )


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize, re-encoded as PNG (lossless output side)."""
    from ..sources.images import encode_png

    def kernel(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                px = decode(bytes(r.bytes), r.fmt)
                h, w, _ = px.shape
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                out = px[np.ix_(ys, xs)]
                rows.append((r.image_id, out_w, out_h, encode_png(out)))
            yield pd.DataFrame(
                rows, columns=["image_id", "out_w", "out_h", "out_bytes"]
            )

    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    return df.select("image_id", "bytes", "fmt").mapInPandas(
        kernel, schema=RESIZE_SCHEMA
    )


FRAME_SCHEMA = (
    "video_id string, frame_no int, w int, h int, mean_gray double, "
    "frame_png binary"
)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling over the FVID container (the sandbox stand-in
    for a real codec — none ships here; swap `fvid_header`/`fvid_frame`
    for a PyAV/ffmpeg seek at deployment, the Spark plumbing is identical).

    Input (video_id, bytes, ...); mapInPandas kernel reads each
    container's header and SEEK-extracts every `every_n`-th frame — the
    untouched frames' bytes are never decoded. One row per sampled frame
    with the per-frame mean and a real PNG re-encode. Rows are independent
    per video → zero shuffle."""
    import pandas as pd

    from ..shipping import ensure_shipped
    from ..sources.images import encode_png, fvid_frame, fvid_header

    ensure_shipped(df.sparkSession)

    def kernel(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                data = bytes(r.bytes)
                w, h, n = fvid_header(data)
                for f in range(0, n, every_n):
                    px = fvid_frame(data, f)
                    rows.append(
                        (r.video_id, f, w, h,
                         float(px.astype(np.float64).mean()),
                         encode_png(px))
                    )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["video_id", "frame_no", "w", "h", "mean_gray",
                             "frame_png"],
                )

    return df.select("video_id", "bytes").mapInPandas(kernel, schema=FRAME_SCHEMA)


# --- perceptual-hash dedup ----------------------------------------------------

DHASH_SCHEMA = "image_id string, dhash long"


def hamming_band_layout(max_hamming: int, bits: int = 64) -> list[tuple[int, int]]:
    """(offset, width) per band for the pigeonhole banding: `max_hamming + 1`
    contiguous bands covering all bits. Any pair within Hamming distance
    max_hamming differs in at most max_hamming bands, so at least one band
    matches exactly — the band equi-join is LOSSLESS for the threshold
    (the same argument as the simhash banding, queries/dedup.py)."""
    nb = max_hamming + 1
    widths = [bits // nb + (1 if i < bits % nb else 0) for i in range(nb)]
    out, off = [], 0
    for wd in widths:
        out.append((off, wd))
        off += wd
    return out


def dhash_images(df: DataFrame) -> DataFrame:
    """Pooled 64-bit difference hash over decoded pixels — the real
    perceptual hash behind the input_hint's `phash` column (the fact-table
    generator's sha-based stand-in has no near-dup structure).

    Exact integer arithmetic end-to-end so the hash is bit-stable at any
    parallelism: per-block gray SUMS via a 2-D prefix sum, adjacent-column
    comparison by cross-multiplication (blocks differ in pixel count when
    w % 9 or h % 8 != 0 — comparing raw sums would bias toward wider
    blocks; sum_r * cnt_l > sum_l * cnt_r is the exact mean comparison)."""

    def kernel(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                px = decode(bytes(r.bytes), r.fmt)
                # r+g+b, exact — single-pass accumulate (no int64 copy of px)
                gray = px.sum(axis=2, dtype=np.int64)
                s, cnt = _block_sums(gray, 8, 9)
                rows.append((r.image_id, _pack64(_compare_bits(s, cnt, 1))))
            yield pd.DataFrame(rows, columns=["image_id", "dhash"])

    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    return df.select("image_id", "bytes", "fmt").mapInPandas(
        kernel, schema=DHASH_SCHEMA
    )


def _prefix2d(gray: np.ndarray) -> np.ndarray:
    """2-D inclusive prefix sum with a zero border — computed ONCE per
    image and shared by every pooling geometry (the grid only selects
    entries from it)."""
    h, w = gray.shape
    pref = np.zeros((h + 1, w + 1), dtype=np.int64)
    np.cumsum(np.cumsum(gray, axis=0), axis=1, out=pref[1:, 1:])
    return pref


def _block_sums_from_prefix(pref: np.ndarray, rows_c: int, cols_c: int):
    """(rows_c x cols_c) exact block SUMS + per-block pixel counts from a
    shared prefix sum (blocks differ in size when the image dims don't
    divide evenly)."""
    h, w = pref.shape[0] - 1, pref.shape[1] - 1
    yb = (np.arange(rows_c + 1) * h) // rows_c
    xb = (np.arange(cols_c + 1) * w) // cols_c
    s = (
        pref[yb[1:, None], xb[None, 1:]]
        - pref[yb[:-1, None], xb[None, 1:]]
        - pref[yb[1:, None], xb[None, :-1]]
        + pref[yb[:-1, None], xb[None, :-1]]
    )
    cnt = (yb[1:] - yb[:-1])[:, None] * (xb[1:] - xb[:-1])[None, :]
    return s, cnt


def _block_sums(gray: np.ndarray, rows_c: int, cols_c: int):
    """Exact-integer block pooling of one grid (kept for the single-grid
    callers/tests; wide_signature shares one prefix across its 4 grids)."""
    return _block_sums_from_prefix(_prefix2d(gray), rows_c, cols_c)


def _compare_bits(s: np.ndarray, cnt: np.ndarray, axis: int) -> np.ndarray:
    """Adjacent-block exact mean comparison along `axis` (0 = vertical,
    1 = horizontal) by cross-multiplication — no float division ever."""
    if axis == 1:
        return (s[:, 1:] * cnt[:, :-1] > s[:, :-1] * cnt[:, 1:]).flatten()
    return (s[1:, :] * cnt[:-1, :] > s[:-1, :] * cnt[1:, :]).flatten()


def _pack64(bits: np.ndarray) -> int:
    """64 bools → signed int64, MSB-first (dhash_images' packing) — via
    packbits, bit-identical to the shift loop it replaced."""
    return int.from_bytes(
        np.packbits(np.asarray(bits, dtype=np.uint8)).tobytes(),
        "big", signed=True,
    )


# 4 independent 64-bit pooling geometries — (rows, cols, compare-axis),
# each yielding exactly 64 bits. Concatenated they form the 256-bit WIDE
# signature whose word-aligned 32-bit bands keep Hamming banding lossless
# up to distance 7 with 2^32 buckets per band (VERDICT r03: 64-bit sigs cap
# lossless bands at ~9 bits → ~512 buckets → bucket-quadratic at 1e9+ sigs).
WIDE_GEOMETRIES = (
    (8, 9, 1),    # classic horizontal dHash
    (9, 8, 0),    # vertical twin
    (4, 17, 1),   # wide-row horizontal (4×16)
    (17, 4, 0),   # tall-column vertical (16×4)
)

DHASH_WIDE_SCHEMA = "image_id string, h0 long, h1 long, h2 long, h3 long"
WIDE_WORDS = ("h0", "h1", "h2", "h3")


def wide_signature(px: np.ndarray) -> tuple[int, int, int, int]:
    """256-bit perceptual signature of one decoded image: 4 packed words,
    one per WIDE_GEOMETRIES entry. Exact integer arithmetic throughout —
    bit-stable at any parallelism (same contract as dhash_images)."""
    pref = _prefix2d(px.sum(axis=2, dtype=np.int64))
    words = []
    for rows_c, cols_c, axis in WIDE_GEOMETRIES:
        s, cnt = _block_sums_from_prefix(pref, rows_c, cols_c)
        words.append(_pack64(_compare_bits(s, cnt, axis)))
    return tuple(words)


def dhash_wide_images(df: DataFrame) -> DataFrame:
    """(image_id, bytes, fmt, ...) → 256-bit wide signatures as 4 int64
    words. One mapInPandas pass; bytes never shuffle. Measured on the dedup
    corpus: planted cross-codec near-dups land at Hamming ≤ 5 over the 256
    bits, unrelated pairs ≥ 96 (mean ~128) — an order of magnitude wider
    margin than the 64-bit signature's 0-2 vs 27-44."""

    def kernel(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                px = decode(bytes(r.bytes), r.fmt)
                rows.append((r.image_id, *wide_signature(px)))
            yield pd.DataFrame(rows, columns=["image_id", *WIDE_WORDS])

    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    return df.select("image_id", "bytes", "fmt").mapInPandas(
        kernel, schema=DHASH_WIDE_SCHEMA
    )


def wide_band_explode(sigs: DataFrame) -> DataFrame:
    """(image_id, h0..h3) → 8 word-aligned 32-bit band rows
    (image_id, h0..h3, band, key). Pigeonhole over 8 bands is lossless for
    Hamming ≤ 7 across the 256 bits; each band key has 2^32 distinct
    values, so per-band bucket population stays ~n/4.3e9 — at 10^12
    signatures that is ~230 rows per bucket, keeping the band equi-join
    near-linear where 64-bit/9-bit banding went bucket-quadratic."""
    from pyspark.sql import functions as F

    bands = []
    for i in range(8):
        word = WIDE_WORDS[i // 2]
        key = (
            F.shiftrightunsigned(word, 32)
            if i % 2 == 0
            else F.col(word).bitwiseAND(F.lit(0xFFFFFFFF))
        )
        bands.append(
            F.struct(F.lit(i).alias("band"), key.alias("key"))
        )
    return sigs.select(
        "image_id", *WIDE_WORDS, F.explode(F.array(*bands)).alias("b")
    ).select("image_id", *WIDE_WORDS, "b.band", "b.key")


def _wide_hamming_expr(a_prefix: str, b_prefix: str) -> str:
    return " + ".join(
        f"bit_count({a_prefix}{w} ^ {b_prefix}{w})" for w in WIDE_WORDS
    )


def wide_hamming_pairs(sigs: DataFrame, max_hamming: int = 7) -> DataFrame:
    """Near-duplicate pairs over 256-bit wide signatures: 32-bit-band
    equi-join candidates → exact 4-word popcount filter. Lossless for
    max_hamming ≤ 7 (8 bands). The at-scale configuration of the image
    dedup family — the 64-bit path (phash_hamming_pairs) remains the
    low-memory variant for small corpora."""
    from pyspark.sql import functions as F

    if max_hamming > 7:
        raise ValueError("8-band pigeonhole is lossless only to Hamming 7")
    e = wide_band_explode(sigs)
    left = e.select(
        F.col("image_id").alias("id_a"),
        *[F.col(w).alias(f"a{w}") for w in WIDE_WORDS],
        "band", "key",
    )
    right = e.select(
        F.col("image_id").alias("id_b"),
        *[F.col(w).alias(f"b{w}") for w in WIDE_WORDS],
        "band", "key",
    )
    return (
        left.join(right, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", *[f"a{w}" for w in WIDE_WORDS],
                *[f"b{w}" for w in WIDE_WORDS])
        .distinct()  # close pairs collide in several bands — emit once
        .withColumn(
            "hamming", F.expr(f"CAST({_wide_hamming_expr('a', 'b')} AS INT)")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def band_explode(sigs: DataFrame, max_hamming: int) -> DataFrame:
    """(image_id, dhash) → one row per pigeonhole band:
    (image_id, dhash, band, key). The single source of the banding used by
    every Hamming join (pairs, ANN top-k) — tuning the layout here keeps
    all consumers lossless together."""
    from pyspark.sql import functions as F

    bands = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned("dhash", off)
            .bitwiseAND(F.lit((1 << wd) - 1))
            .alias("key"),
        )
        for i, (off, wd) in enumerate(hamming_band_layout(max_hamming))
    ]
    return sigs.select(
        "image_id", "dhash", F.explode(F.array(*bands)).alias("b")
    ).select("image_id", "dhash", "b.band", "b.key")


def probe_explode64(sigs: DataFrame, errors_per_band: int) -> DataFrame:
    """(image_id, dhash) → multi-probe rows (image_id, dhash, band, key)
    over 4 disjoint 16-bit bands: each band's exact key plus, when
    errors_per_band == 1, the 16 single-bit flips of it (17 probes/band).
    With errors_per_band == 0 this is the plain 4×16-bit exact banding
    (4 rows/signature)."""
    from pyspark.sql import functions as F

    if errors_per_band not in (0, 1):
        raise ValueError("probe_explode64 supports 0 or 1 errors per band")
    structs = []
    for b in range(4):
        key = f"(shiftrightunsigned(dhash, {b * 16}) & 65535)"
        probes = [key]
        if errors_per_band == 1:
            probes += [f"({key} ^ {1 << j})" for j in range(16)]
        structs += [
            f"named_struct('band', {b}, 'key', CAST({p} AS BIGINT))"
            for p in probes
        ]
    return sigs.selectExpr(
        "image_id", "dhash", f"explode(array({', '.join(structs)})) AS b"
    ).selectExpr("image_id", "dhash", "b.band AS band", "b.key AS key")


def phash_hamming_pairs(sigs: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate image pairs over 64-bit perceptual hashes — output
    EQUALS the all-pairs Hamming join the DuckDB oracle runs.

    For max_hamming ≤ 7 the candidate generator is a MULTI-PROBE equi-join
    over 4 disjoint 16-bit bands: by pigeonhole a pair ≤ 7 bits apart has a
    band with ≤ floor(max_hamming/4) ≤ 1 differing bits, so probing each
    signature's 16 single-bit band flips (plus the exact key) against the
    other side's exact 16-bit keys is LOSSLESS — and the 2^16 keys keep
    per-band buckets ~n/65536, ~12× fewer candidate rows than the
    max_hamming+1-band layout whose ~9-bit keys go bucket-quadratic
    (measured 378M candidates at 206k sigs vs ~31M probed; BENCH §1a / r6).
    Every candidate still passes the exact popcount ≤ max_hamming filter.

    Thresholds above 7 fall back to the classic max_hamming+1 contiguous
    banding (hamming_band_layout), which stays lossless for any
    threshold."""
    from pyspark.sql import functions as F

    if max_hamming <= 7:
        probes = probe_explode64(sigs, errors_per_band=max_hamming // 4)
        exact = probe_explode64(sigs, errors_per_band=0)
        left = probes.select(
            F.col("image_id").alias("id_a"), F.col("dhash").alias("ha"),
            "band", "key",
        )
        right = exact.select(
            F.col("image_id").alias("id_b"), F.col("dhash").alias("hb"),
            "band", "key",
        )
    else:
        e = band_explode(sigs, max_hamming)
        left = e.select(
            F.col("image_id").alias("id_a"), F.col("dhash").alias("ha"),
            "band", "key",
        )
        right = e.select(
            F.col("image_id").alias("id_b"), F.col("dhash").alias("hb"),
            "band", "key",
        )
    return (
        left.join(right, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .distinct()  # a close pair collides in several bands — emit once
        .withColumn("hamming", F.expr("CAST(bit_count(ha ^ hb) AS INT)"))
        .filter(F.col("hamming") <= max_hamming)
        .drop("ha", "hb")
    )
