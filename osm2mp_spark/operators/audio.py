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


SPECTROGRAM_SCHEMA = (
    "audio_id string, n_frames int, band_e0 bigint, band_e1 bigint, "
    "band_e2 bigint, band_e3 bigint, dominant_band int"
)


def spectrogram_features(df: DataFrame, n_fft: int = 256, hop: int = 128) -> DataFrame:
    """Framed power-spectrogram band energies — the spectral analog of the
    text quality scores: per clip, short-time rectangular-window rfft over
    (n_fft, hop) frames, power summed over time, binned into 4 equal
    frequency bands. Energies are FLOOR-quantized to bigint per row (order-
    independent exact values — the golden-gate rule), dominant_band is the
    argmax. All numpy-vectorized inside one mapInPandas; bytes never leave
    the kernel."""

    def kernel(it):
        from ..sources.audio import decode_wav

        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                samples, _rate = decode_wav(bytes(r.bytes))
                x = samples.astype(np.float64)
                if len(x) < n_fft:
                    x = np.pad(x, (0, n_fft - len(x)))
                n_frames = 1 + (len(x) - n_fft) // hop
                idx = (
                    np.arange(n_fft)[None, :]
                    + hop * np.arange(n_frames)[:, None]
                )
                spec = np.abs(np.fft.rfft(x[idx], axis=1)) ** 2
                power = spec.sum(axis=0)  # per-bin power over all frames
                nb = len(power)
                bounds = [0, nb // 4, nb // 2, 3 * nb // 4, nb]
                bands = [
                    float(power[bounds[k]:bounds[k + 1]].sum()) for k in range(4)
                ]
                q = [int(np.floor(b)) for b in bands]
                rows.append(
                    (r.audio_id, int(n_frames), q[0], q[1], q[2], q[3],
                     int(np.argmax(bands)))
                )
            yield pd.DataFrame(
                rows,
                columns=["audio_id", "n_frames", "band_e0", "band_e1",
                         "band_e2", "band_e3", "dominant_band"],
            )

    return _batched(df, kernel, SPECTROGRAM_SCHEMA, ["audio_id", "bytes"])
