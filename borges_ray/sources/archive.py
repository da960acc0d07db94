"""Zip-archive corpus: build + member-extract stages (S15/T7).

Mirrors the reference's SFTP-delivered zip handling
(``Borges/spiders/IOP/scripts/upload_to_mongodb.py``): member listing +
extension filter via ``fp.split(".")[1]`` (:48-73), and the per-extension
decode branch — ``.xml`` members decode as UTF-8, ``.html`` members as
windows-1252 (:83-127, ``_extract_single_file_from_zip``).  The reference
unzips to a temp folder one file at a time; here extraction is a
``map_batches`` stage over binary zip payloads — each task opens its own
archives, so the stage scales with the number of zips and never touches
the driver.

Zip bytes are written deterministically (fixed DOS timestamp, no
compression timestamps) so the corpus is byte-stable across runs.
"""

from __future__ import annotations

import io
import os
import zipfile

import pandas as pd
import ray.data as rd

_FIXED_DT = (1980, 1, 1, 0, 0, 0)  # determinism: no wall-clock in zip headers


def zip_bytes(members: list[tuple[str, bytes]]) -> bytes:
    """One in-memory zip from (member_name, payload_bytes) pairs."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members:
            info = zipfile.ZipInfo(name, date_time=_FIXED_DT)
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return buf.getvalue()


def build_article_zip_corpus(sf_dir: str, out_dir: str,
                             docs_per_zip: int = 50) -> str:
    """documents table → zip files of synthetic article payloads on disk
    (the stand-in for the reference's SFTP drop folder).  Members:
    ``{doc_id}.xml`` (JATS, utf-8) / ``{doc_id}.html`` (meta-tag dialect,
    cp1252), plus one junk ``manifest.pdf`` per zip that the extension
    filter must skip.  Idempotent via a ``_DONE`` marker."""
    from ..synth_articles import synth_article

    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    df = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"]).sort_values("doc_id")
    for zid, grp in df.groupby(df["doc_id"] // docs_per_zip):
        members: list[tuple[str, bytes]] = [("manifest.pdf", b"%PDF-junk")]
        for d, t in zip(grp["doc_id"], grp["text"]):
            kind, payload = synth_article(int(d), t or "")
            if kind == "jats":
                members.append((f"{int(d)}.xml", payload.encode("utf-8")))
            else:
                members.append((f"{int(d)}.html", payload.encode("windows-1252")))
        with open(os.path.join(out_dir, f"batch-{int(zid):05d}.zip"), "wb") as fp:
            fp.write(zip_bytes(members))
    with open(done, "w") as fp:
        fp.write("ok")
    return out_dir


class ZipMemberExtractor:
    """``map_batches`` stage: (path, bytes) zip rows → one row per kept
    member with the decoded text payload.

    - extension filter compares ``fp.split(".")[1]`` exactly like the
      reference (:57-73) — reproduced verbatim, dotfiles beware;
    - decode branch: xml → utf-8, html → windows-1252 (:83-127);
    - ``content_kind`` maps xml → 'jats', html → 'meta' so the output feeds
      :class:`borges_ray.extract_meta.MetaExtractor` directly.
    """

    KIND_OF_EXT = {"xml": "jats", "html": "meta"}

    def __init__(self, ext_filter: tuple[str, ...] = ("xml", "html")):
        self.ext_filter = tuple(ext_filter)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, kinds, payloads, sources = [], [], [], []
        for path, data in zip(df["path"], df["bytes"]):
            with zipfile.ZipFile(io.BytesIO(data)) as zp:
                names = [fp for fp in zp.namelist()
                         if fp.split(".")[1] in self.ext_filter]
                for fp in names:
                    raw = zp.read(fp)
                    if fp.endswith("xml"):
                        text = raw.decode()
                    elif fp.endswith("html"):
                        text = raw.decode(encoding="windows-1252")
                    else:  # pragma: no cover — ext_filter guards this
                        continue
                    stem, ext = fp.rsplit("/", 1)[-1].rsplit(".", 1)
                    ids.append(int(stem))
                    kinds.append(self.KIND_OF_EXT[ext])
                    payloads.append(text)
                    sources.append(path)
        return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                             "content_kind": kinds, "payload": payloads,
                             "source_zip": sources})


def read_zip_articles(zip_dir: str, **kw) -> rd.Dataset:
    """Binary-file read of a zip drop folder → extracted member rows."""
    from .io import read_binary

    paths = sorted(os.path.join(zip_dir, f) for f in os.listdir(zip_dir)
                   if f.endswith(".zip"))
    ds = read_binary(paths, **kw)
    return ds.map_batches(ZipMemberExtractor, batch_format="pandas",
                          concurrency=(1, 8))
