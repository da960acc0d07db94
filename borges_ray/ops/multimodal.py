"""Multimodal-column plumbing: binary payloads with typed metadata through
actor-pool decode / feature-extract stages.

The image/audio/video codec libraries are not in this container, so decode
targets a deterministic FAKE CONTAINER FORMAT ("BORG"): a real binary
header (magic, type tag, width, height, body length) followed by frame
records.  The extractors genuinely PARSE the bytes — header fields,
big-endian ints, per-frame records — so the Ray-side shape (schema, actor
``__init__`` state, small batches for wide binary rows, explode-per-frame
output) is exactly what a PIL/ffmpeg deployment needs; swapping the parser
body for ``PIL.Image.open`` / ``av.open`` is a one-function change, and
``try: import`` guard rails mark the swap points.

Payloads derive from the ``documents`` table (doc_id arithmetic), which
makes both stages ORACLE-CHECKABLE: DuckDB recomputes the expected fields
from doc_id while the engine must actually parse the container bytes.

Layout (big-endian):

    0:4   b"BORG"                     magic
    4:5   type tag (0=image, 1=audio, 2=video)
    5:9   width  = 16 + d % 317
    9:13  height = 16 + d % 211
    13:17 body length (bytes)
    17:   body — image/audio: constant byte (d % 251), length 100 + d%1000;
          video: n_total = 1 + d % 9 frame records, each 64 bytes of
          constant (d + frame_idx) % 251
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),   # "image/borg", "audio/borg", "video/borg"
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)

_MAGIC = b"BORG"
_TYPES = ["image/borg", "audio/borg", "video/borg"]
FRAME_BYTES = 64


def synth_media_payload(d: int, video: bool = False) -> tuple[str, bytes]:
    """(media_type, payload) for doc ``d`` in the BORG container format."""
    width = 16 + d % 317
    height = 16 + d % 211
    if video:
        n_total = 1 + d % 9
        body = b"".join(bytes([(d + fi) % 251]) * FRAME_BYTES
                        for fi in range(n_total))
        tag = 2
    else:
        body = bytes([d % 251]) * (100 + d % 1000)
        tag = d % 3 % 2  # 0=image, 1=audio (videos come from video=True)
    header = _MAGIC + struct.pack(">BIII", tag, width, height, len(body))
    return _TYPES[tag], header + body


def media_from_documents(ds: rd.Dataset, *, video: bool = False) -> rd.Dataset:
    """documents → MEDIA_SCHEMA rows (media_id = doc_id)."""

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        types, payloads = [], []
        for d in df["doc_id"]:
            t, p = synth_media_payload(int(d), video=video)
            types.append(t)
            payloads.append(p)
        return pd.DataFrame({"media_id": df["doc_id"].astype("int64"),
                             "media_type": types, "payload": payloads,
                             "n_bytes": [len(p) for p in payloads]})

    return ds.map_batches(gen, batch_format="pandas")


def _parse_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse the BORG header → (type_tag, width, height, body_len).  This is
    the honest stand-in for a codec's container parse; a real deployment
    replaces callers with PIL / libav open."""
    try:  # the real decoders, if ever present in the image
        import PIL.Image  # noqa: F401

        raise NotImplementedError("real image decode not wired in this environment")
    except ImportError:
        pass
    if payload[:4] != _MAGIC:
        raise ValueError("bad magic")
    return struct.unpack(">BIII", payload[4:17])


class MediaFeatureExtractor:
    """Actor-pool stage: parse binary payloads → typed feature columns.

    Stateful-stage shape (SURVEY.md §2.3): decoder/model handles are built
    ONCE per actor in ``__init__`` (for real codecs: open the model,
    allocate pinned buffers), then ``__call__`` runs per batch.  Use small
    ``batch_size`` — wide binary rows blow out worker heaps otherwise
    (ray_guide "Memory-aware")."""

    def __init__(self):
        self.parse = _parse_header  # per-actor decoder handle

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        widths, heights, checksums = [], [], []
        for p in df["payload"]:
            _tag, w, h, blen = self.parse(p)
            body = np.frombuffer(p, dtype=np.uint8, offset=17)
            widths.append(w)
            heights.append(h)
            checksums.append(int(body.sum(dtype=np.uint64) % (1 << 32)))
        return pd.DataFrame(
            {
                "media_id": df["media_id"].to_numpy(),
                "media_type": df["media_type"].to_numpy(),
                "n_bytes": df["payload"].map(len).astype("int64"),
                "width": pd.Series(widths, dtype="int64"),
                "height": pd.Series(heights, dtype="int64"),
                "checksum": pd.Series(checksums, dtype="int64"),
            }
        )


def extract_media_features(media: rd.Dataset, *, batch_size: int = 256,
                           concurrency=(1, 8)) -> rd.Dataset:
    """media(MEDIA_SCHEMA) → (media_id, media_type, n_bytes, width, height,
    checksum)."""
    return media.map_batches(
        MediaFeatureExtractor,
        batch_format="pandas",
        batch_size=batch_size,      # small: payloads are wide
        concurrency=concurrency,
        num_cpus=1,
    )


def _sample_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """Read ≤ ``n_frames`` frame records from a BORG video container (real
    deployments: ffmpeg/pyav keyframe extraction — same output contract)."""
    try:
        import av  # noqa: F401

        raise NotImplementedError("real frame sampling not wired in this environment")
    except ImportError:
        pass
    _tag, _w, _h, blen = struct.unpack(">BIII", payload[4:17])
    n_total = blen // FRAME_BYTES
    out = []
    for fi in range(min(n_frames, n_total)):
        start = 17 + fi * FRAME_BYTES
        out.append(payload[start: start + FRAME_BYTES])
    return out


def _resize(frame: bytes, side: int = 8) -> np.ndarray:
    """Fold a frame record into a (side × side) float grid (real:
    PIL/libvips resample)."""
    # float64, not float32: the oracle recomputes thumb stats with double
    # division — float32 error (~6e-8) can cross a 6-dp rounding boundary
    arr = np.frombuffer(frame, dtype=np.uint8).astype(np.float64)
    need = side * side
    if len(arr) < need:
        arr = np.pad(arr, (0, need - len(arr)))
    return (arr[:need] / 255.0).reshape(side, side)


class FrameSampler:
    """Actor-pool stage: video payloads → one row per sampled frame with a
    resized thumbnail feature.  Explode happens inside the batch (one row
    in, ≤ n_frames rows out), keeping the stage single-output;
    ``batch_size`` stays small because each input row fans out."""

    def __init__(self, n_frames: int = 4, side: int = 8):
        self.n_frames = n_frames
        self.side = side

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for mid, payload in zip(df["media_id"], df["payload"]):
            for fi, frame in enumerate(_sample_frames(payload, self.n_frames)):
                thumb = _resize(frame, self.side)
                rows.append((mid, fi, round(float(thumb.mean()), 6),
                             round(float(thumb.std()), 6)))
        return pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                           "thumb_mean", "thumb_std"])


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
