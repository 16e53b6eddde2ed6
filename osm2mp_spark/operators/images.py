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
