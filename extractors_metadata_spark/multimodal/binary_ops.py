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
from pyspark.sql import functions as F

IMAGE_FEATURES_SCHEMA = (
    "url string, width int, height int, channels int, features array<float>"
)
FRAME_SAMPLE_SCHEMA = "url string, frame_idx int, frame_sha long"


def hash_bytes_batch(payloads) -> np.ndarray:
    """Stable 63-bit FNV-1a over the first 4096 bytes of each payload,
    vectorized across the batch: the byte matrix is scatter-filled in one
    pass and the FNV fold runs one numpy op per byte POSITION (≤ 4096),
    never a Python-level loop per byte per row. Identical values to the
    scalar definition (the ``multimodal_dims_verify`` oracle replays this
    exact fold in DuckDB HUGEINT arithmetic). No Python hash() —
    PYTHONHASHSEED varies."""
    trunc = [(bytes(b) if b is not None else b"")[:4096] for b in payloads]
    n = len(trunc)
    h = np.full(n, 14695981039346656037, dtype=np.uint64)
    if n == 0:
        return h
    lens = np.fromiter((len(t) for t in trunc), dtype=np.int64, count=n)
    max_len = int(lens.max()) if n else 0
    if max_len:
        mat = np.zeros((n, max_len), dtype=np.uint8)
        flat = np.frombuffer(b"".join(trunc), dtype=np.uint8)
        row_idx = np.repeat(np.arange(n), lens)
        col_idx = np.arange(len(flat)) - np.repeat(np.cumsum(lens) - lens, lens)
        mat[row_idx, col_idx] = flat
        prime = np.uint64(1099511628211)
        with np.errstate(over="ignore"):
            for j in range(max_len):
                upd = (h ^ mat[:, j].astype(np.uint64)) * prime
                h = np.where(lens > j, upd, h)
    return h & np.uint64(0x7FFFFFFFFFFFFFFF)


def hash_bytes(b: bytes) -> int:
    """Scalar convenience wrapper over ``hash_bytes_batch`` (same values)."""
    return int(hash_bytes_batch([b])[0])


def _fake_dims_batch(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic pseudo-decode dims derived from the payload hashes."""
    return (320 + (h % np.uint64(1024))).astype(np.int32), (
        240 + ((h >> np.uint64(10)) % np.uint64(768))
    ).astype(np.int32)


def _normals_from_seeds(seeds: np.ndarray, n_features: int) -> np.ndarray:
    """Deterministic per-seed standard normals in ONE vectorized pass:
    SplitMix64 over a (seed, counter) grid -> 53-bit uniforms -> Box-Muller.
    Replaces per-row ``default_rng(seed)`` construction (which dominated the
    stub path's cost) while keeping the same contract: same payload -> same
    feature vector."""
    n = len(seeds)
    pairs = (n_features + 1) // 2
    ctr = np.arange(1, 2 * pairs + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = seeds[:, None].astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15) * ctr[None, :]
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    u = (z >> np.uint64(11)).astype(np.float64) * (2.0**-53)
    u1 = np.maximum(u[:, :pairs], 1e-300)  # guard log(0)
    u2 = u[:, pairs : 2 * pairs]
    r = np.sqrt(-2.0 * np.log(u1))
    out = np.empty((n, 2 * pairs), dtype=np.float64)
    out[:, 0::2] = r * np.cos(2.0 * np.pi * u2)
    out[:, 1::2] = r * np.sin(2.0 * np.pi * u2)
    return out[:, :n_features].astype(np.float32)


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
            seeds = hash_bytes_batch(pdf[binary_col])
            widths, heights = _fake_dims_batch(seeds)
            feats = _normals_from_seeds(seeds, n_features)
            yield pd.DataFrame(
                {
                    "url": pdf[id_col],
                    "width": widths,
                    "height": heights,
                    "channels": np.full(len(pdf), 3, dtype=np.int32),
                    "features": list(feats),
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
            base = hash_bytes_batch(pdf[binary_col])
            idx = np.tile(np.arange(n_frames, dtype=np.int64) * every_n, len(pdf))
            with np.errstate(over="ignore"):
                sha = (
                    np.repeat(base, n_frames) + idx.astype(np.uint64)
                ) & np.uint64(0x7FFFFFFFFFFFFFFF)
            yield pd.DataFrame(
                {
                    "url": np.repeat(pdf[id_col].to_numpy(), n_frames),
                    "frame_idx": idx.astype(np.int32),
                    "frame_sha": sha.astype(np.int64),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(gen, FRAME_SAMPLE_SCHEMA)


AHASH_BANDS = 4  # 16-bit bands; pigeonhole guarantees detection to dist 3


def _gray64_from_seeds(seeds: np.ndarray) -> np.ndarray:
    """(n, 64) deterministic 8x8 grayscale pixels (0..255) per payload seed:
    the LOW BYTE of the same SplitMix64 (seed, counter) grid the feature
    generator mixes — pure integer end-to-end, so DuckDB replays it with
    HUGEINT limb arithmetic (unlike the Box-Muller floats, which need the
    bit-equal-libm argument)."""
    n = len(seeds)
    ctr = np.arange(1, 65, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = seeds[:, None].astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15) * ctr[None, :]
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return (z & np.uint64(0xFF)).astype(np.int64).reshape(n, 64)


def ahash_from_gray(pix: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Average-hash a batch of (n, 64) integer pixel grids: bit j is set iff
    64 * pix[j] >= sum(pix) — the mean comparison cross-multiplied so the
    decision is PURE INTEGER (no float mean can ulp-flip a bit). Returns
    (ahash int64 via two's-complement view, bands (n, 4) int32 16-bit
    chunks for the banded Hamming join)."""
    pix = np.asarray(pix, dtype=np.int64)
    s = pix.sum(axis=1)
    bits = (64 * pix >= s[:, None]).astype(np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    hu = (bits * weights).sum(axis=1, dtype=np.uint64)
    ahash = hu.view(np.int64)
    bands = np.stack(
        [((hu >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int32)
         for b in range(AHASH_BANDS)],
        axis=1,
    )
    return ahash, bands


def dhash_from_gray(pix: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Difference-hash a batch of (n, 64) integer pixel grids: bit
    (r, c) is set iff p[r, c] < p[r, (c+1) % 8] — the horizontal
    GRADIENT sign, wrapping at the row edge (the stub grid is 8x8; a
    real decoder would hand a 9-column thumbnail and drop the wrap).
    Gradient signs survive global brightness/contrast shifts that move
    aHash's mean — the standard reason dHash complements it.  Pure
    integer comparisons; same (hash, 4x16-bit bands) packing as aHash."""
    pix = np.asarray(pix, dtype=np.int64).reshape(-1, 8, 8)
    nxt = np.roll(pix, -1, axis=2)
    bits = (pix < nxt).reshape(-1, 64).astype(np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    hu = (bits * weights).sum(axis=1, dtype=np.uint64)
    dhash = hu.view(np.int64)
    bands = np.stack(
        [((hu >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int32)
         for b in range(AHASH_BANDS)],
        axis=1,
    )
    return dhash, bands


IMAGE_DHASH_SCHEMA = "url string, dhash long, b0 int, b1 int, b2 int, b3 int"


def decode_image_dhash(
    df: DataFrame,
    binary_col: str = "html",
    id_col: str = "url",
    real_decode: bool = False,
) -> DataFrame:
    """binary -> 64-bit difference-hash fingerprint + 16-bit bands, one
    fused mapInPandas Arrow pass (the aHash/pHash triad's gradient
    member). ``real_decode=True`` is the codec integration point
    (decode, grayscale, 9x8 downsample — then dhash_from_gray on the
    adjacent-column differences)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "no image codec in this environment; decode + grayscale "
                    "+ downsample here, then dhash_from_gray unchanged"
                )
            seeds = hash_bytes_batch(pdf[binary_col])
            dhash, bands = dhash_from_gray(_gray64_from_seeds(seeds))
            yield pd.DataFrame(
                {
                    "url": pdf[id_col],
                    "dhash": dhash,
                    "b0": bands[:, 0],
                    "b1": bands[:, 1],
                    "b2": bands[:, 2],
                    "b3": bands[:, 3],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(gen, IMAGE_DHASH_SCHEMA)


IMAGE_AHASH_SCHEMA = "url string, ahash long, b0 int, b1 int, b2 int, b3 int"


def decode_image_ahash(
    df: DataFrame,
    binary_col: str = "html",
    id_col: str = "url",
    real_decode: bool = False,
) -> DataFrame:
    """binary -> 64-bit average-hash perceptual fingerprint + its four
    16-bit bands, one mapInPandas Arrow pass (hash + fake thumbnail + aHash
    fused). ``real_decode=True`` is the codec integration point (decode,
    grayscale, 8x8 downsample — then the SAME ahash_from_gray)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "no image codec in this environment; decode + grayscale "
                    "+ 8x8 downsample here, then ahash_from_gray unchanged"
                )
            seeds = hash_bytes_batch(pdf[binary_col])
            ahash, bands = ahash_from_gray(_gray64_from_seeds(seeds))
            yield pd.DataFrame(
                {
                    "url": pdf[id_col],
                    "ahash": ahash,
                    "b0": bands[:, 0],
                    "b1": bands[:, 1],
                    "b2": bands[:, 2],
                    "b3": bands[:, 3],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(gen, IMAGE_AHASH_SCHEMA)


def ahash_pairs(hashed: DataFrame, max_dist: int = 3) -> DataFrame:
    """(url_a, url_b, hamdist): image near-duplicate pairs at Hamming
    distance <= ``max_dist`` over the aHash fingerprints — the multimodal
    member of the near-dup family (minhash/simhash/winnowing for text,
    aHash for images; re-hosted and lightly-recompressed images land within
    a few bits).

    Scale shape: candidates come from a BANDED self-join — each hash splits
    into 4 exact 16-bit band keys, pairs sharing any band meet ONCE per
    shared band and are de-duplicated; the pigeonhole bound makes recall
    EXACT for max_dist <= 3 (4 bands, <= 3 differing bits leave >= 1 band
    untouched). Never all-pairs; band buckets are ~n/65536 on non-adversarial
    data (cap hot buckets upstream like dedup.py's minhash join if the
    corpus has monochrome-heavy spikes). The verify is pair-scoped:
    bit_count(xor) in codegen.
    """
    from pyspark.sql import functions as F

    if not 0 <= max_dist <= 3:
        raise ValueError("max_dist must be in [0, 3] for exact 4-band recall")
    ex = hashed.select(
        "url", "ahash",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("b", "v"),
    )
    a = ex.select(
        F.col("url").alias("url_a"), F.col("ahash").alias("ah_a"), "b", "v"
    )
    bb = ex.select(
        F.col("url").alias("url_b"), F.col("ahash").alias("ah_b"), "b", "v"
    )
    cand = (
        a.join(bb, ["b", "v"])
        .filter(F.col("url_a") < F.col("url_b"))
        .select("url_a", "url_b", "ah_a", "ah_b")
        .distinct()
    )
    ham = F.expr("bit_count(ah_a ^ ah_b)").cast("int")
    return cand.select(
        "url_a", "url_b", ham.alias("hamdist")
    ).filter(F.col("hamdist") <= max_dist)


DCT_SCALE = 1 << 20


def phash_dct_table() -> np.ndarray:
    """(8, 8) int64 fixed-point DCT-II basis T[k][x] =
    rint(cos(pi*(2x+1)*k/16) * 2^20) — COMPILE-TIME constants computed
    once from float64 cos (identical on every host) and consumed as
    integer literals by BOTH the engine and the oracle (the _NDCG_W /
    sprt_constants single-source rule); the transform itself is pure
    int64 arithmetic."""
    k = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    return np.rint(
        np.cos(np.pi * (2 * x + 1) * k / 16.0) * DCT_SCALE
    ).astype(np.int64)


def phash_from_gray(pix: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """pHash a batch of (n, 64) integer pixel grids: 2-D integer DCT
    C = T P T^T (|C| <= 8^2 * 255 * 2^40 ~ 1.8e16, int64-safe), bit
    (k, l) set iff C[k][l] > median, median = the 32nd-smallest of the
    64 coefficients (frozen order statistic — no float mean/median
    anywhere). Returns (phash int64 two's-complement, 16-bit bands) —
    the DCT concentrates structure into low frequencies, which is what
    makes pHash robust to the rescaling/blur that flips aHash bits."""
    t = phash_dct_table()
    p = np.asarray(pix, dtype=np.int64).reshape(-1, 8, 8)
    c = np.einsum("kx,nxy,ly->nkl", t, p, t).reshape(-1, 64)
    med = np.sort(c, axis=1)[:, 31]
    bits = (c > med[:, None]).astype(np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    hu = (bits * weights).sum(axis=1, dtype=np.uint64)
    phash = hu.view(np.int64)
    bands = np.stack(
        [((hu >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int32)
         for b in range(AHASH_BANDS)],
        axis=1,
    )
    return phash, bands


IMAGE_PHASH_SCHEMA = "url string, phash long, b0 int, b1 int, b2 int, b3 int"


def decode_image_phash(
    df: DataFrame,
    binary_col: str = "html",
    id_col: str = "url",
    real_decode: bool = False,
) -> DataFrame:
    """binary -> 64-bit DCT perceptual hash + 16-bit bands, one
    mapInPandas Arrow pass over the SAME deterministic stub thumbnail
    as decode_image_ahash (real_decode=True is the same codec
    integration point: decode, grayscale, 8x8 downsample, then
    phash_from_gray unchanged)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "no image codec in this environment; decode + grayscale "
                    "+ 8x8 downsample here, then phash_from_gray unchanged"
                )
            seeds = hash_bytes_batch(pdf[binary_col])
            phash, bands = phash_from_gray(_gray64_from_seeds(seeds))
            yield pd.DataFrame(
                {
                    "url": pdf[id_col],
                    "phash": phash,
                    "b0": bands[:, 0],
                    "b1": bands[:, 1],
                    "b2": bands[:, 2],
                    "b3": bands[:, 3],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(gen, IMAGE_PHASH_SCHEMA)


AUDIO_WINDOWS = 4
AUDIO_SAMPLES = 64
AUDIO_CLIP = 32700
AUDIO_SILENCE_SQ = AUDIO_SAMPLES * 1000 * 1000  # mean |s| < 1000


def audio_windows_from_seeds(seeds: np.ndarray) -> np.ndarray:
    """(n, AUDIO_WINDOWS * AUDIO_SAMPLES) deterministic int16-range PCM
    samples per payload seed: SplitMix64 (seed, counter) low 16 bits
    recentred to [-32768, 32767]; every 4th window is attenuated 64x
    (integer div) so the silence branch is live — pure integer, HUGEINT-
    replayable (the _gray64_from_seeds recipe widened to 256 counters)."""
    n = len(seeds)
    total = AUDIO_WINDOWS * AUDIO_SAMPLES
    ctr = np.arange(1, total + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = seeds[:, None].astype(np.uint64) + np.uint64(
            0x9E3779B97F4A7C15
        ) * ctr[None, :]
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    s = (z & np.uint64(0xFFFF)).astype(np.int64) - 32768
    win = (ctr.astype(np.int64) - 1) // AUDIO_SAMPLES
    quiet = (win % 4 == 0)
    # trunc division toward zero on both engines: do it on abs, restore sign
    att = np.sign(s) * (np.abs(s) // 64)
    return np.where(quiet[None, :], att, s).reshape(n, total)


AUDIO_ENERGY_SCHEMA = (
    "url string, win long, energy_sq long, n_clipped long, silent boolean"
)


def decode_audio_energy(
    df: DataFrame,
    binary_col: str = "html",
    id_col: str = "url",
    real_decode: bool = False,
) -> DataFrame:
    """audio binary -> per-window QC triage, one row per (url, window):
    energy_sq = sum of squared samples (the RMS sufficient statistic —
    emitted UNROOTED so no float exists), n_clipped = samples at |s| >=
    AUDIO_CLIP, silent = energy below the silence floor. The loudness /
    clipping / dead-air screen an audio-corpus pipeline runs before
    transcription; real_decode=True is the codec integration point
    (decode to PCM, then the same windowed integer statistics)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "no audio codec in this environment; decode to int16 "
                    "PCM here, then the same windowed integer statistics"
                )
            seeds = hash_bytes_batch(pdf[binary_col])
            pcm = audio_windows_from_seeds(seeds).reshape(
                -1, AUDIO_WINDOWS, AUDIO_SAMPLES
            )
            energy = (pcm * pcm).sum(axis=2)
            clipped = (np.abs(pcm) >= AUDIO_CLIP).sum(axis=2)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "url": np.repeat(pdf[id_col].to_numpy(), AUDIO_WINDOWS),
                    "win": np.tile(
                        np.arange(AUDIO_WINDOWS, dtype=np.int64), n
                    ),
                    "energy_sq": energy.reshape(-1).astype(np.int64),
                    "n_clipped": clipped.reshape(-1).astype(np.int64),
                    "silent": (
                        energy.reshape(-1) < AUDIO_SILENCE_SQ
                    ).astype(bool),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(
        gen, AUDIO_ENERGY_SCHEMA
    )


SHOT_SCHEMA = "url string, frame_idx int, dhash long"


def detect_shot_boundaries(
    df: DataFrame,
    binary_col: str = "html",
    id_col: str = "url",
    n_frames: int = 8,
    every_n: int = 10,
    frames_per_shot: int = 2,
    thr: int = 16,
    real_decode: bool = False,
) -> DataFrame:
    """Video shot-boundary detection over the sampled-frame stub: per
    (video, frame) a dHash fingerprint, then the consecutive-frame
    Hamming distance and a boundary flag (dist >= ``thr``) — the cut
    detector every video-curation pipeline runs before dedup/caption.
    The stub "video" is piecewise-static by construction (each shot =
    ``frames_per_shot`` identical frames off the shot-advanced SplitMix
    seed), so within-shot distance is exactly 0 and cuts are live;
    ``real_decode=True`` is the codec integration point (decode frame
    f*every_n, grayscale, 8x8 downsample — then the SAME dhash/lag/
    threshold chain).

    -> (url, frame_idx, dhash, hamdist, is_boundary); the first frame
    emits hamdist = -1, is_boundary = 0 (no predecessor; integer
    sentinel keeps the output NULL-free).  One fused Arrow pass for the
    fingerprints; the distance is a url-keyed lag window + JVM
    bit_count(xor) — the proven ahash_pairs surface."""
    fps = int(frames_per_shot)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "no video codec in this environment; decode + grayscale "
                    "+ downsample here, then the same dhash chain"
                )
            base = hash_bytes_batch(pdf[binary_col])
            f = np.tile(np.arange(n_frames, dtype=np.int64), len(pdf))
            with np.errstate(over="ignore"):
                seeds = (
                    np.repeat(base, n_frames).astype(np.uint64)
                    + ((f // fps) * every_n).astype(np.uint64)
                ) & np.uint64(0x7FFFFFFFFFFFFFFF)
            dh, _ = dhash_from_gray(_gray64_from_seeds(seeds.astype(np.int64)))
            yield pd.DataFrame(
                {
                    "url": np.repeat(pdf[id_col].to_numpy(), n_frames),
                    "frame_idx": (f * every_n).astype(np.int32),
                    "dhash": dh,
                }
            )

    from pyspark.sql import Window

    hashed = df.select(id_col, binary_col).mapInPandas(gen, SHOT_SCHEMA)
    w = Window.partitionBy("url").orderBy("frame_idx")
    out = hashed.withColumn("_prev", F.lag("dhash").over(w))
    ham = F.expr("bit_count(dhash ^ _prev)").cast("int")
    return out.select(
        "url",
        "frame_idx",
        "dhash",
        F.when(F.col("_prev").isNull(), F.lit(-1)).otherwise(ham)
        .cast("int").alias("hamdist"),
        F.when(
            F.col("_prev").isNotNull() & (ham >= thr), F.lit(1)
        ).otherwise(F.lit(0)).cast("int").alias("is_boundary"),
    )
