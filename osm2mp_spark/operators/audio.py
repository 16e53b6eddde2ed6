"""Audio operators — decode / verify / feature-extract / resample over the
opaque `bytes` column, all Arrow-batched mapInPandas (zero per-row Python
at the Spark layer; the kernels are vectorized numpy). Mirrors the image
operator family; the WAV codec is fully real (sources/audio.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

VERIFY_SCHEMA = (
    "audio_id string, samples_ok boolean, rate_ok boolean, n_samples int"
)
FEATURES_SCHEMA = (
    "audio_id string, n_samples int, rms double, zcr double, "
    "peak int, duration_ms double"
)
RESAMPLE_SCHEMA = "audio_id string, out_rate int, out_n int, out_bytes binary"


def _batched(df: DataFrame, kernel, schema: str, cols: list[str]) -> DataFrame:
    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    return df.select(*cols).mapInPandas(kernel, schema=schema)


def verify_audio(df: DataFrame) -> DataFrame:
    """Per-row payload invariant: decoded samples byte-match the
    deterministic generator, rate matches metadata (the audio analog of
    the image PSNR/caption gate — PCM is lossless so equality is exact)."""

    def kernel(it):
        from ..sources.audio import audio_samples, decode_wav

        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                samples, rate = decode_wav(bytes(r.bytes))
                expected = audio_samples(r.audio_id, int(r.n_samples), rate)
                rows.append(
                    (r.audio_id, bool(np.array_equal(samples, expected)),
                     rate == int(r.sample_rate), len(samples))
                )
            yield pd.DataFrame(
                rows, columns=["audio_id", "samples_ok", "rate_ok", "n_samples"]
            )

    return _batched(df, kernel, VERIFY_SCHEMA,
                    ["audio_id", "bytes", "sample_rate", "n_samples"])


def extract_audio_features(df: DataFrame) -> DataFrame:
    """RMS, zero-crossing rate, peak, duration — the quality/lang-id-style
    scalar features of the audio modality, computed vectorized per clip."""

    def kernel(it):
        from ..sources.audio import decode_wav

        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                x, rate = decode_wav(bytes(r.bytes))
                xf = x.astype(np.float64)
                rms = float(np.sqrt(np.mean(xf * xf)))
                zcr = float(np.mean(np.signbit(xf[1:]) != np.signbit(xf[:-1])))
                rows.append(
                    (r.audio_id, len(x), rms, zcr, int(np.abs(x).max()),
                     1000.0 * len(x) / rate)
                )
            yield pd.DataFrame(
                rows,
                columns=["audio_id", "n_samples", "rms", "zcr", "peak",
                         "duration_ms"],
            )

    return _batched(df, kernel, FEATURES_SCHEMA, ["audio_id", "bytes"])


def resample_audio(df: DataFrame, factor: int = 2) -> DataFrame:
    """Integer-factor decimation (every `factor`-th sample), re-encoded as
    real WAV at the reduced rate — the audio analog of image resize."""

    def kernel(it):
        from ..sources.audio import decode_wav, encode_wav

        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                x, rate = decode_wav(bytes(r.bytes))
                out = x[::factor]
                out_rate = rate // factor
                rows.append(
                    (r.audio_id, out_rate, len(out), encode_wav(out, out_rate))
                )
            yield pd.DataFrame(
                rows, columns=["audio_id", "out_rate", "out_n", "out_bytes"]
            )

    return _batched(df, kernel, RESAMPLE_SCHEMA, ["audio_id", "bytes"])
