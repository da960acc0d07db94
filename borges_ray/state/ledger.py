"""Cross-run incremental dedup ledger — insert-if-absent ACROSS pipeline
runs (S7 generalized: the reference's ``insert_one``-if-absent Mongo sink,
``Borges/db_scripts/insert_jl.py``, persisted between crawl snapshots).

An incremental corpus build (monthly Common-Crawl snapshots, rolling
recrawls) must not re-admit documents already ingested by ANY earlier run.
The ledger is a hash-sharded Parquet key store on disk:

    ledger_dir/shard=<s>/run-<n>.parquet     (append-only key files)

``ledger_upsert`` filters a new batch's rows to the NOVEL ones (keys absent
from the ledger) with a distributed anti-join — the driver never reads
ledger keys — then appends exactly those keys as a new file set per shard.

Scale shape: only the KEY column is ever stored or shuffled (8-byte
fingerprints); the anti-join build side streams off column-pruned Parquet;
appends are new files, never rewrites, so concurrent readers stay
consistent.  Failure contract: keys are appended only AFTER the novel rows
are pinned to the spill checkpoint, so a crash mid-append re-admits the
not-yet-committed remainder on rerun and never double-admits (the rerun
anti-joins against whatever was committed); a caller that needs the novel
PAYLOAD durable must write the returned dataset to its own sink before
treating the batch as ingested.
"""

from __future__ import annotations

import os

import pandas as pd
import ray.data as rd


def _key_files(ledger_dir: str) -> list[str]:
    return sorted(
        os.path.join(dp, f)
        for dp, _dn, fs in os.walk(ledger_dir)
        for f in fs if f.endswith(".parquet"))


def _next_run_id(ledger_dir: str) -> int:
    runs = set()
    for f in _key_files(ledger_dir):
        name = os.path.basename(f)
        if name.startswith("run-"):
            try:
                runs.add(int(name[4:].split(".")[0].split("-")[0]))
            except ValueError:
                pass
    return max(runs, default=-1) + 1


def ledger_upsert(ds: rd.Dataset, ledger_dir: str, key_col: str,
                  *, num_shards: int = 16) -> rd.Dataset:
    """Filter ``ds`` to rows whose ``key_col`` is NOT already in the
    ledger, append those keys to the ledger, and return the novel rows.

    The returned Dataset is pinned (parquet spill under /tmp) because the
    key append below consumes the same derivation.  Keys are deduplicated
    ACROSS the whole run (distributed ``distinct``), not just within each
    batch, so a key occurring in several batches lands in the ledger once
    and ``ledger_key_count`` counts true distinct keys."""
    from ..ops.relational import distinct, hash_semi_join, spill_point

    os.makedirs(ledger_dir, exist_ok=True)
    existing = _key_files(ledger_dir)
    if existing:
        ledger_keys = rd.read_parquet(existing, columns=[key_col])
        novel = hash_semi_join(ds, ledger_keys, on=[key_col], anti=True)
    else:
        novel = ds
    novel = spill_point(novel, "ledger_novel")

    run_id = _next_run_id(ledger_dir)

    def append_keys(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"shard": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        keys = df[[key_col]]
        shard = (pd.util.hash_pandas_object(keys[key_col].astype(str), index=False)
                 .to_numpy() % num_shards)
        out = []
        for s in sorted(set(shard)):
            sdir = os.path.join(ledger_dir, f"shard={int(s)}")
            os.makedirs(sdir, exist_ok=True)
            part = keys[shard == s]
            # one file per (run, writer-pid, shard): append-only, no rewrite
            path = os.path.join(sdir, f"run-{run_id}-{os.getpid()}.parquet")
            if os.path.exists(path):  # same worker, later batch → new file
                path = os.path.join(
                    sdir, f"run-{run_id}-{os.getpid()}-{len(os.listdir(sdir))}.parquet")
            part.to_parquet(path, index=False)
            out.append({"shard": int(s), "n": len(part)})
        return pd.DataFrame(out)

    novel_keys = distinct(novel.select_columns([key_col]), [key_col])
    novel_keys.map_batches(append_keys, batch_format="pandas").materialize()
    return novel


def ledger_key_count(ledger_dir: str) -> int:
    """Distinct keys currently committed (audit helper; reads only key
    column metadata-sized files)."""
    files = _key_files(ledger_dir)
    if not files:
        return 0
    import pyarrow.dataset as pads

    return pads.dataset(files, format="parquet").count_rows()


def _ledger_max_period(ledger_dir: str, period_col: str):
    """Max committed period across the ledger's key files, from parquet
    ROW-GROUP STATISTICS only — the driver never reads period data (at
    10^10 ledger keys a column scan would be O(keys) driver time); cost is
    one metadata footer per file."""
    import pyarrow.parquet as pq

    best = None
    for f in _key_files(ledger_dir):
        md = pq.ParquetFile(f).metadata
        try:
            ci = md.schema.to_arrow_schema().get_field_index(period_col)
        except Exception:
            continue
        if ci < 0:
            continue
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is not None and st.has_min_max:
                best = st.max if best is None else max(best, st.max)
    return best


def ledger_upsert_periods(ds: rd.Dataset, ledger_dir: str, key_col: str,
                          period_col: str, *, num_shards: int = 16) -> rd.Dataset:
    """Period-aware insert-if-absent with CURRENT-PERIOD REFRESH — the
    reference's resume policy: a finished year is skipped on re-index, but
    the year that was IN PROGRESS when the previous run stopped is always
    re-selected, because its data may have been incomplete at index time
    (``Borges/spiders/Elsevier/paper_index.py:157-160`` skips only years
    recorded as complete; ``:256-266`` re-stamps the current year's entry
    on every pass).

    Returns the rows a resumed run must (re-)process: keys absent from the
    ledger entirely, PLUS every key of the ledger's max (in-progress)
    period.  Ledger appends stay insert-if-absent (a refreshed key is not
    double-recorded); merge the returned rows over the previous run's
    output with :func:`~borges_ray.ops.records.keyed_overwrite` so
    re-fetched current-period rows replace their stale versions.

    Scale shape: both membership tests are the same keys-only distributed
    anti/semi joins as :func:`ledger_upsert`; the driver reads only the max
    period scalar."""
    from ..ops.relational import distinct, hash_semi_join, spill_point

    os.makedirs(ledger_dir, exist_ok=True)
    existing = _key_files(ledger_dir)
    if not existing:
        novel = spill_point(ds, "ledger_novel")
        to_process = novel
    else:
        cur = _ledger_max_period(ledger_dir, period_col)
        if cur is None:
            # silent fallback would skip the refresh contract entirely
            # (df[period_col] != None is elementwise True → every key
            # "done"); a period-less ledger is a different store
            raise ValueError(
                f"ledger at {ledger_dir} has no '{period_col}' statistics — "
                "was it written by the period-less ledger_upsert?  "
                "ledger_upsert_periods requires a period-keyed ledger.")
        ledger_keys = rd.read_parquet(existing, columns=[key_col, period_col])
        # completed-period keys filter admission; the current period's keys
        # do NOT (they are re-admitted for refresh)
        done_keys = ledger_keys.map_batches(
            lambda df: df.loc[df[period_col] != cur, [key_col]],
            batch_format="pandas")
        to_process = spill_point(
            hash_semi_join(ds, done_keys, on=[key_col], anti=True),
            "ledger_refresh")
        # append only keys absent from the ledger ENTIRELY
        all_keys = rd.read_parquet(existing, columns=[key_col])
        novel = spill_point(
            hash_semi_join(to_process, all_keys, on=[key_col], anti=True),
            "ledger_novel")

    run_id = _next_run_id(ledger_dir)

    def append_keys(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"shard": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        keys = df[[key_col, period_col]]
        shard = (pd.util.hash_pandas_object(keys[key_col].astype(str), index=False)
                 .to_numpy() % num_shards)
        out = []
        for s in sorted(set(shard)):
            sdir = os.path.join(ledger_dir, f"shard={int(s)}")
            os.makedirs(sdir, exist_ok=True)
            part = keys[shard == s]
            path = os.path.join(sdir, f"run-{run_id}-{os.getpid()}.parquet")
            if os.path.exists(path):
                path = os.path.join(
                    sdir, f"run-{run_id}-{os.getpid()}-{len(os.listdir(sdir))}.parquet")
            part.to_parquet(path, index=False)
            out.append({"shard": int(s), "n": len(part)})
        return pd.DataFrame(out)

    novel_keys = distinct(novel.select_columns([key_col, period_col]),
                          [key_col, period_col])
    novel_keys.map_batches(append_keys, batch_format="pandas").materialize()
    return to_process
