"""Audio payload source — opaque `binary` column + typed metadata, the
audio face of the multimodal contract (images.py is the image face).

Unlike image jpeg (stubbed — no codec lib ships here), PCM WAV needs no
external library at all: the codec below writes and parses the real
RIFF/WAVE format (16-bit mono PCM), so the audio path is fully real.
Content is deterministic per audio_id (seeded sine mix + hash noise), so
executors generate payloads without anything crossing the driver.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

AUDIO_SCHEMA = (
    "audio_id string, bytes binary, sample_rate int, n_samples int, "
    "fmt string"
)

SAMPLE_RATE = 8000


def _seed_ints(audio_id: str, n: int) -> np.ndarray:
    # one SHAKE-256 XOF call for the whole stream (see images._rng_ints)
    return np.frombuffer(
        hashlib.shake_256(f"aud:{audio_id}".encode()).digest(n), dtype=np.uint8
    ).copy()


def audio_samples(audio_id: str, n: int, rate: int = SAMPLE_RATE) -> np.ndarray:
    """Deterministic int16 mono signal: two seeded sine tones + noise."""
    seed = _seed_ints(audio_id, 4).astype(np.float64)
    f1 = 100.0 + seed[0] * 8.0       # 100..2140 Hz
    f2 = 50.0 + seed[1] * 4.0
    t = np.arange(n, dtype=np.float64) / rate
    sig = (
        0.5 * np.sin(2 * np.pi * f1 * t)
        + 0.3 * np.sin(2 * np.pi * f2 * t + seed[2] / 40.0)
    )
    noise = (_seed_ints(audio_id + ":n", n).astype(np.float64) - 127.5) / 2048.0
    x = np.clip(sig + noise, -1.0, 1.0)
    return np.round(x * 32000.0).astype(np.int16)


# --- real RIFF/WAVE PCM16 codec ------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int = SAMPLE_RATE) -> bytes:
    """16-bit mono PCM WAV (RIFF little-endian), byte-exact round-trip."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    n_channels, bits = 1, 16
    byte_rate = rate * n_channels * bits // 8
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, rate, byte_rate, block_align, bits
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Parse RIFF/WAVE chunks; returns (int16 samples, sample_rate)."""
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE", "not a WAV payload"
    pos = 12
    rate = None
    samples = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            codec, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            assert codec == 1 and ch == 1 and bits == 16, "PCM16 mono only"
        elif tag == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    assert rate is not None and samples is not None, "missing fmt/data chunk"
    return samples, rate


def generate_audio_df(spark, n: int, seconds: float = 0.5,
                      rate: int = SAMPLE_RATE, partitions: int | None = None):
    """Executor-side deterministic audio table (no payload on the driver)."""
    import pandas as pd

    from ..shipping import ensure_shipped

    ensure_shipped(spark)
    n_samples = int(seconds * rate)
    base = spark.range(n).repartition(partitions or 8)

    def gen(it):
        for pdf in it:
            rows = []
            for idx in pdf["id"]:
                aid = f"aud{int(idx):06d}"
                rows.append(
                    (aid, encode_wav(audio_samples(aid, n_samples, rate), rate),
                     rate, n_samples, "wav")
                )
            yield pd.DataFrame(
                rows,
                columns=["audio_id", "bytes", "sample_rate", "n_samples", "fmt"],
            )

    return base.mapInPandas(gen, schema=AUDIO_SCHEMA)
