"""Source/sink wrappers (SURVEY.md §2.1).

The reference moves records through JSON-lines feed exports
(``Borges/spiders/ECS/issue_link.py:28-43``, scrapy ``-o`` feeds), Mongo
collections, pickle shards (``Borges/db_scripts/mongo2pickle.py:5-34``) and a
static CSV (``Borges/spiders/Elsevier/physlettA.csv``).  Our engine's
canonical interchange is Parquet; JSON-lines and CSV are supported for
debug/compat:

- S4/S5 (jsonlines writer/reader) → :func:`write_jsonl` / :func:`read_jsonl`
- S9 (pickle worklist shards)     → ``write_table(..., num_shards=n)``
  (projected, sharded Parquet — the same worklist-splitting semantics)
- S16 (CSV static source)         → :func:`read_csv`
- S6/S7 (Mongo query source/sink) → Parquet checkpoint tables + dedup-write
  (see :mod:`borges_ray.state.checkpoint` and :mod:`borges_ray.ops.dedup`)
"""

from __future__ import annotations

import ray.data as rd


def read_jsonl(paths: str | list[str], **kw) -> rd.Dataset:
    """JSON-lines reader (S5 — ``json_lines.reader``,
    ``Borges/db_scripts/insert_jl.py:25-41``)."""
    return rd.read_json(paths, **kw)


def write_jsonl(ds: rd.Dataset, path: str, **kw) -> None:
    """JSON-lines writer (S4 — ``jsonlines.open(...).write``)."""
    ds.write_json(path, **kw)


def read_csv(paths: str | list[str], **kw) -> rd.Dataset:
    """CSV source (S16)."""
    return rd.read_csv(paths, **kw)


def read_table(sf_dir: str, table: str, columns: list[str] | None = None, **kw) -> rd.Dataset:
    """Column-pruned Parquet scan (canonical source)."""
    from ..ops.relational import load

    return load(sf_dir, table, columns=columns, **kw)


def write_table(ds: rd.Dataset, path: str, *, num_shards: int | None = None,
                columns: list[str] | None = None) -> None:
    """Parquet sink; with ``num_shards``/``columns`` it reproduces the
    reference's projected worklist-shard dump (S9 ``mongo2pickle``): project,
    repartition into n shards, write one file set per shard."""
    if columns is not None:
        ds = ds.select_columns(columns)
    if num_shards is not None:
        ds = ds.repartition(num_shards)
    ds.write_parquet(path)


def read_binary(paths: str | list[str], **kw) -> rd.Dataset:
    """Binary-blob source (S14/S15 — the reference lands SFTP-downloaded
    zip archives on disk, ``download_via_sftp.py:161-179``; our equivalent
    reads raw payload files as (bytes, path) rows, feeding the multimodal /
    archive-extract stages)."""
    return rd.read_binary_files(paths, include_paths=True, **kw)


def sample(ds: rd.Dataset, frac: float, seed: int = 42) -> rd.Dataset:
    """Seeded random sample (O3 — Mongo ``$sample`` dry-run collections,
    ``Borges/db_scripts/create_dummy_col.py:26-31``).  Deterministic for a
    fixed seed + input layout."""
    return ds.random_sample(frac, seed=seed)


def compact_parquet(in_dir: str, out_dir: str, *, rows_per_file: int,
                    columns: list[str] | None = None) -> dict:
    """Small-file compaction: rewrite a directory of many small Parquet
    files (the natural output of per-round crawl checkpoints and per-block
    sinks) into files of ~``rows_per_file`` rows each.

    Scale shape: a pure streamed read → split/coalesce → write; NO
    all-to-all (``repartition(target_num_rows_per_block=...)`` is a local
    split/merge of adjacent blocks, not a shuffle), so 100 TB compaction
    moves each byte exactly once.  Row order within each input file is
    preserved; file boundaries change.  Returns {files_in, files_out, rows}.
    """
    import os

    import pyarrow.parquet as pq

    files_in = sum(1 for f in os.listdir(in_dir) if f.endswith(".parquet"))
    ds = rd.read_parquet(in_dir, columns=columns)
    ds = ds.repartition(target_num_rows_per_block=rows_per_file)
    ds.write_parquet(out_dir, min_rows_per_file=rows_per_file)
    files_out, rows = 0, 0
    for f in os.listdir(out_dir):
        if f.endswith(".parquet"):
            files_out += 1
            rows += pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows
    return {"files_in": files_in, "files_out": files_out, "rows": rows}
