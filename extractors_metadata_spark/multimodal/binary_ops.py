"""Multimodal binary-column operators: decode / feature-extract / frame-sample.

Images, audio, and video are opaque ``binary`` columns with typed metadata
structs (the reference's analog: netCDF blobs consumed header-only,
``/root/reference/netcdf/terra_netcdf.py:33-58``). The Spark-side plumbing —
schemas, ``mapInPandas`` batching, partition sizing — is real and tested; the
codec step itself is STUBBED (no image/audio libraries ship in this
container): ``decode_image(real_decode=True)`` raises NotImplementedError,
and the default path emits a deterministic fake decode (seeded from the
payload bytes) so downstream feature pipelines are exercised end-to-end.

Scale notes: mapInPandas streams Arrow batches, so a partition never
materializes more than ``spark.sql.execution.arrow.maxRecordsPerBatch`` blobs
at once; for 100 TB of media, size ``spark.sql.files.maxPartitionBytes`` so a
partition's payload fits executor memory (the engine default 128 MB assumes
blobs ≤ a few MB).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_FEATURES_SCHEMA = (
    "url string, width int, height int, channels int, features array<float>"
)
FRAME_SAMPLE_SCHEMA = "url string, frame_idx int, frame_sha long"


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic pseudo-decode: dims derived from the payload hash."""
    h = hash_bytes(payload)
    return 320 + int(h % 1024), 240 + int((h >> 10) % 768), 3


def hash_bytes(b: bytes) -> int:
    """Stable 63-bit FNV-1a (no Python hash() — PYTHONHASHSEED varies)."""
    h = np.uint64(14695981039346656037)
    prime = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        for chunk in np.frombuffer(b[:4096], dtype=np.uint8):
            h = np.uint64(h ^ np.uint64(chunk)) * prime
    return int(h & np.uint64(0x7FFFFFFFFFFFFFFF))


def decode_image_features(
    df: DataFrame,
    binary_col: str = "html",
    id_col: str = "url",
    n_features: int = 16,
    real_decode: bool = False,
) -> DataFrame:
    """binary -> (dims, feature vector) via mapInPandas (Arrow-batched).

    ``real_decode=True`` is the integration point for an actual codec
    (PIL/libvips on a real cluster) — unavailable here by design.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "no image codec in this environment; deploy with PIL/libvips "
                    "and implement the decode here"
                )
            urls = pdf[id_col]
            dims = [_fake_dims(bytes(b) if b is not None else b"") for b in pdf[binary_col]]
            seeds = np.array([hash_bytes(bytes(b) if b is not None else b"") for b in pdf[binary_col]])
            # deterministic per-payload features (fake embedding)
            feats = [
                np.random.default_rng(s).standard_normal(n_features).astype(np.float32).tolist()
                for s in seeds
            ]
            yield pd.DataFrame(
                {
                    "url": urls,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                    "features": feats,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(gen, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    binary_col: str = "html",
    id_col: str = "url",
    every_n: int = 10,
    n_frames: int = 3,
    real_decode: bool = False,
) -> DataFrame:
    """video binary -> sampled frame fingerprints (stubbed decode), one row per
    (url, frame_idx) — the fan-out shape a real frame sampler produces."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError("no video codec in this environment")
            out_url, out_idx, out_sha = [], [], []
            for url, payload in zip(pdf[id_col], pdf[binary_col]):
                base = hash_bytes(bytes(payload) if payload is not None else b"")
                for j in range(n_frames):
                    out_url.append(url)
                    out_idx.append(j * every_n)
                    out_sha.append((base + j * every_n) & 0x7FFFFFFFFFFFFFFF)
            yield pd.DataFrame({"url": out_url, "frame_idx": out_idx, "frame_sha": out_sha})

    return df.select(id_col, binary_col).mapInPandas(gen, FRAME_SAMPLE_SCHEMA)
