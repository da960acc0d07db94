"""Multimodal-column plumbing: binary payloads with typed metadata through
actor-pool decode / feature-extract stages.

The image/audio codec libraries are not in this container, so the decode
kernels are STUBS behind ``try: import`` — but everything Ray-side is real
and tested: the schema (``payload: binary`` + ``media_type``/``width``/…
metadata columns), the actor-pool ``map_batches`` stage shape (decoder state
built once per actor in ``__init__``), small-batch sizing for wide binary
rows, and the output layout.  Swapping ``_decode_stub`` for a real
PIL/libvips/ffmpeg call is a one-function change.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),   # "image/png", "audio/wav", ...
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)


def _decode_stub(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: a 16-bin byte histogram
    (normalized).  A real deployment replaces this body with e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` → pixel array."""
    try:  # the real decoders, if ever present in the image
        import PIL.Image  # noqa: F401

        raise NotImplementedError("real image decode not wired in this environment")
    except ImportError:
        pass
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) == 0:
        return np.zeros(16, dtype=np.float32)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float32)
    return hist / hist.sum()


class MediaFeatureExtractor:
    """Actor-pool stage: decode binary payloads → fixed-size feature vectors.

    Stateful-stage shape (SURVEY.md §2.3): decoder/model handles are built
    ONCE per actor here in ``__init__`` (for real codecs: open the model,
    allocate pinned buffers), then ``__call__`` runs per batch.  Use small
    ``batch_size`` — wide binary rows blow out worker heaps otherwise
    (ray_guide "Memory-aware")."""

    def __init__(self):
        self.decode = _decode_stub

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        feats = [self.decode(p, t) for p, t in zip(df["payload"], df["media_type"])]
        return pd.DataFrame(
            {
                "media_id": df["media_id"].to_numpy(),
                "media_type": df["media_type"].to_numpy(),
                "n_bytes": df["payload"].map(len).astype("int64"),
                "features": [f.tolist() for f in feats],
            }
        )


def extract_media_features(media: rd.Dataset, *, batch_size: int = 256,
                           concurrency=(1, 8)) -> rd.Dataset:
    """media(MEDIA_SCHEMA) → (media_id, media_type, n_bytes, features)."""
    return media.map_batches(
        MediaFeatureExtractor,
        batch_format="pandas",
        batch_size=batch_size,      # small: payloads are wide
        concurrency=concurrency,
        num_cpus=1,
    )


def synth_media(seed: int, n: int) -> pa.Table:
    """Deterministic fake binary payloads (for tests/queries)."""
    rng = np.random.default_rng(seed)
    ids, types, payloads = [], [], []
    for i in range(n):
        size = int(rng.integers(64, 2048))
        body = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=32).digest()
        payload = (body * (size // 32 + 1))[:size]
        ids.append(i)
        types.append("image/png" if i % 3 else "audio/wav")
        payloads.append(payload)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


def _sample_frames_stub(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic stand-in for video frame sampling: n evenly-spaced
    byte windows.  A real deployment replaces the body with an ffmpeg/pyav
    keyframe extraction; the Ray-side plumbing (explode to one row per
    frame, small batches) is identical."""
    try:
        import av  # noqa: F401

        raise NotImplementedError("real frame sampling not wired in this environment")
    except ImportError:
        pass
    if not payload:
        return []
    step = max(1, len(payload) // n_frames)
    return [payload[i * step : i * step + 64] for i in range(min(n_frames, len(payload)))]


def _resize_stub(frame: bytes, side: int = 8) -> np.ndarray:
    """Deterministic stand-in for an image resize: fold the byte stream into
    a (side × side) float grid (real: PIL/libvips resample)."""
    arr = np.frombuffer(frame, dtype=np.uint8).astype(np.float32)
    need = side * side
    if len(arr) < need:
        arr = np.pad(arr, (0, need - len(arr)))
    return (arr[:need] / 255.0).reshape(side, side)


class FrameSampler:
    """Actor-pool stage: video payloads → one row per sampled frame with a
    resized thumbnail feature.  Explode happens inside the batch (pandas
    explode), keeping the stage single-output; ``batch_size`` stays small
    because each input row fans out ``n_frames`` ways (memory-aware sizing
    for wide binary rows)."""

    def __init__(self, n_frames: int = 4, side: int = 8):
        self.n_frames = n_frames
        self.side = side

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for mid, payload in zip(df["media_id"], df["payload"]):
            for fi, frame in enumerate(_sample_frames_stub(payload, self.n_frames)):
                thumb = _resize_stub(frame, self.side)
                rows.append((mid, fi, float(thumb.mean()), float(thumb.std())))
        return pd.DataFrame(rows, columns=["media_id", "frame_idx", "thumb_mean", "thumb_std"])


def sample_video_frames(media: rd.Dataset, *, n_frames: int = 4,
                        batch_size: int = 64, concurrency=(1, 4)) -> rd.Dataset:
    """media(MEDIA_SCHEMA) → (media_id, frame_idx, thumb_mean, thumb_std)."""
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
