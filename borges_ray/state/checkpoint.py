"""Round/partition checkpoint layout with atomic commit markers.

The reference resumes by querying Mongo for ``{'Crawled': False}``
(``Borges/spiders/Elsevier/paper_xml.py:203``) — mutable flags in a DB.  Our
equivalent is immutable round outputs (SURVEY.md §4 "Checkpoint / resume"):

    ckpt/
      round=0000/
        crawled/      *.parquet   (fetch results of this round)
        seen_delta/   *.parquet   (URLs first enqueued during this round)
        frontier/     *.parquet   (the FULL frontier entering round r itself:
                                   bootstrap writes seeds to round=0/frontier,
                                   and run_crawl reads round r's frontier as
                                   that round's input)
        host_state/   *.parquet   (host, next_seq) entering round r
        metrics/      *.parquet
        _COMMITTED                (empty marker, written LAST)

Resume = max round with ``_COMMITTED``; the seen index rebuilds from the
union of ``seen_delta`` over rounds 0..k, the frontier reloads from round k,
and per-host sequence counters continue from ``host_state`` — a killed job
replays only the uncommitted round, and replaying is idempotent because
every output is keyed by (round, url).

Writes land in ``_tmp.<name>`` then ``os.rename`` — the marker never
coexists with partial data.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

SUBDIRS = ("crawled", "seen_delta", "frontier", "host_state", "metrics")


def round_dir(ckpt: str, rnd: int) -> str:
    return os.path.join(ckpt, f"round={rnd:04d}")


def is_committed(ckpt: str, rnd: int) -> bool:
    return os.path.exists(os.path.join(round_dir(ckpt, rnd), "_COMMITTED"))


def last_committed_round(ckpt: str) -> int:
    """Highest committed round index, or -1."""
    if not os.path.isdir(ckpt):
        return -1
    rounds = sorted(
        int(d.split("=")[1]) for d in os.listdir(ckpt) if d.startswith("round=")
    )
    last = -1
    for r in rounds:
        if is_committed(ckpt, r):
            last = r
        else:
            break  # a gap means everything after is invalid
    return last


def clean_uncommitted(ckpt: str) -> None:
    """Remove any round dirs past the last committed one (idempotent replay)."""
    if not os.path.isdir(ckpt):
        return
    last = last_committed_round(ckpt)
    for d in os.listdir(ckpt):
        if d.startswith("round=") and int(d.split("=")[1]) > last:
            shutil.rmtree(os.path.join(ckpt, d))


def write_table(ckpt: str, rnd: int, name: str, table: pa.Table) -> str:
    """Write one table into the round dir atomically (tmp + rename)."""
    rd = round_dir(ckpt, rnd)
    tmp = os.path.join(rd, f"_tmp.{name}")
    final = os.path.join(rd, name)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(table, os.path.join(tmp, "part-0.parquet"))
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    return final


def commit_round(ckpt: str, rnd: int) -> None:
    marker = os.path.join(round_dir(ckpt, rnd), "_COMMITTED")
    with open(marker, "w"):
        pass


def read_table(ckpt: str, rnd: int, name: str) -> pa.Table:
    return pq.read_table(os.path.join(round_dir(ckpt, rnd), name))


def read_all_rounds(ckpt: str, name: str, upto: int) -> pa.Table | None:
    """Concatenate one table kind across rounds 0..upto (inclusive)."""
    tables = []
    for r in range(upto + 1):
        p = os.path.join(round_dir(ckpt, r), name)
        if os.path.isdir(p):
            tables.append(pq.read_table(p))
    if not tables:
        return None
    return pa.concat_tables(tables, promote_options="default")
