"""WARC-style record source/sink for Common-Crawl-shaped page corpora.

Common Crawl distributes pages as WARC files: a stream of records, each a
CRLF-terminated header block (``WARC/1.0``, ``WARC-Target-URI``,
``WARC-Date``, ``Content-Length``) followed by exactly ``Content-Length``
payload bytes and a blank-line separator.  This module writes a Dataset of
``(url, ts, payload)`` rows as one ``.warc`` file per output task and reads
them back as a Dataset — the on-ramp from raw crawl archives into the
engine's Parquet world.

Scale shape: writing streams (each task serializes only its own blocks);
reading maps one file to one task via ``read_binary_files`` and parses the
byte stream with index arithmetic — payloads are sliced, never decoded, so
binary (html/image) payloads pass through untouched.  Files are the unit of
parallelism, matching Common Crawl's ~1 GB segment files.
"""

from __future__ import annotations

import os
import re

import pandas as pd
import ray.data as rd

_CRLF = b"\r\n"
_HDR_RE = re.compile(
    rb"WARC/1\.0\r\nWARC-Target-URI: (?P<uri>[^\r\n]*)\r\n"
    rb"WARC-Date: (?P<date>[^\r\n]*)\r\nContent-Length: (?P<len>\d+)\r\n\r\n"
)


def record_bytes(url: str, ts: str, payload: bytes) -> bytes:
    head = (f"WARC/1.0\r\nWARC-Target-URI: {url}\r\nWARC-Date: {ts}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n").encode("utf-8")
    return head + payload + _CRLF + _CRLF


def write_warc(ds: rd.Dataset, out_dir: str, *, url_col: str = "url",
               ts_col: str = "warc_ts", payload_col: str = "payload") -> None:
    """Dataset → one ``part-<block>.warc`` per block under ``out_dir``.
    File names are a digest over EVERY url in the block plus the row count
    (a first-url-only name collides when two blocks start with the same
    url — duplicate urls across blocks are normal in crawl corpora).  Stale
    ``part-*.warc`` files from a previous run are removed up front, so a
    rerun with different batching is actually idempotent rather than
    leaving a mix of fresh and stale parts."""
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        if f.startswith("part-") and f.endswith(".warc"):
            os.unlink(os.path.join(out_dir, f))

    def dump(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"path": pd.Series([], dtype="object"),
                                 "n_records": pd.Series([], dtype="int64")})
        blob = b"".join(
            record_bytes(u, t, p if isinstance(p, bytes) else str(p).encode("utf-8"))
            for u, t, p in zip(df[url_col], df[ts_col].astype(str), df[payload_col])
        )
        import hashlib

        # name = digest of the FULL record bytes: a retried/re-executed
        # dump task rewrites the same bytes under the same name (atomic
        # replace below) instead of duplicating records; rerun idempotency
        # across calls comes from the up-front part-file cleanup.  Known
        # limit: two blocks whose entire byte content is identical (i.e.
        # fully duplicated records) merge into one file — record-level
        # duplicates across such blocks should be deduped upstream.
        h = hashlib.blake2b(blob, digest_size=12).hexdigest()
        path = os.path.join(out_dir, f"part-{h}.warc")
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # atomic: a dying writer never leaves a stub
        return pd.DataFrame({"path": [path], "n_records": [len(df)]})

    # consume: the writer-side map emits one manifest row per file
    dump_ds = ds.map_batches(dump, batch_format="pandas")
    dump_ds.materialize()


def parse_warc_bytes(blob: bytes) -> pd.DataFrame:
    """One WARC byte stream → (url, warc_ts, payload) rows.  Header fields
    are located by regex; payloads sliced by Content-Length (never
    scanned), so payload bytes may contain anything — including strings
    that look like WARC headers."""
    urls, tss, payloads = [], [], []
    pos = 0
    while True:
        m = _HDR_RE.match(blob, pos)
        if not m:
            break
        n = int(m.group("len"))
        body_start = m.end()
        urls.append(m.group("uri").decode("utf-8"))
        tss.append(m.group("date").decode("utf-8"))
        payloads.append(blob[body_start : body_start + n])
        pos = body_start + n + 4  # CRLF CRLF separator
    return pd.DataFrame({"url": urls, "warc_ts": tss, "payload": payloads})


def read_warc(paths: str | list[str], **kw) -> rd.Dataset:
    """``.warc`` files → Dataset[(url, warc_ts, payload: binary)].  One
    file per read task (file = parallelism unit)."""
    raw = rd.read_binary_files(paths, **kw)

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        frames = [parse_warc_bytes(b) for b in df["bytes"]]
        if not frames:
            return pd.DataFrame({"url": pd.Series([], dtype="object"),
                                 "warc_ts": pd.Series([], dtype="object"),
                                 "payload": pd.Series([], dtype="object")})
        return pd.concat(frames, ignore_index=True)

    return raw.map_batches(parse, batch_format="pandas")
