"""The crawl engine: BSP rounds of Ray Data stages with Parquet checkpoints.

One crawl round (mirrors the oracle spec in ``reference_crawl.py`` exactly):

    frontier_r ──combiner──shuffle(host)──► selected (host_seq assigned)
        │                                     │
        │ broadcast(selected urls)            ├──groupby(bucket)──► fetch-join pages
        ▼                                     ▼
    deferred                                parse (extract/lang/links)
        │                                     │ explode→winner dedup→seen+robots gate
        ▼                                     ▼
    frontier_{r+1} = deferred ∪ new_allowed;  crawled_r, seen_delta, metrics

Checkpoint layout (see :mod:`borges_ray.state.checkpoint`): ``round=r`` is
the state *entering* round r — resume replays at most one uncommitted round,
idempotently (the seen shards rebuild from committed deltas; crawled rows are
keyed by (url), each url fetched exactly once).

Scale notes: the frontier is only ever *scanned* (combiner + deferral
passes), never shuffled in full — the host-shuffle moves ≤ budget×blocks
rows/host, the bucket-shuffle moves only the politeness-bounded selection,
and the pages corpus is probed per-bucket, never shuffled (SURVEY.md §7.3).
"""

from __future__ import annotations

import os
import sys
import threading
import time
from dataclasses import dataclass

# fsspec.implementations.http fails to import in this container (no
# aiohttp).  Ray's write path probes it per write and catches
# ModuleNotFoundError — but CONCURRENT writer threads race the failing
# import and see a partially-initialized module, surfacing a plain
# ImportError that Ray does NOT catch.  Register a benign stub once so the
# probe is deterministic: Ray's isinstance() check against the stub class
# is always False, i.e. "not an HTTP filesystem" — the same answer the
# clean ModuleNotFoundError path produces.
try:  # pragma: no cover — environment-dependent
    import fsspec.implementations.http  # noqa: F401
except ImportError:
    import sys as _sys
    import types as _types

    try:
        import fsspec.implementations as _fsspec_impls

        _http_stub = _types.ModuleType("fsspec.implementations.http")

        class _StubHTTPFileSystem:  # never instantiated; isinstance-only
            pass

        _http_stub.HTTPFileSystem = _StubHTTPFileSystem
        _sys.modules["fsspec.implementations.http"] = _http_stub
        _fsspec_impls.http = _http_stub
    except ImportError:
        pass

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray
import ray.data as rd

from .. import schemas
from ..canonical import canonicalize, host_of, partition_of
from ..stages.fetch import fetch_selected
from ..stages.links import WINNER_ASC, WINNER_SORT, gate_candidates, link_candidates
from ..stages.parse import parse_fetched
from ..stages.politeness import defer_frontier, delays_from_robots, select_frontier
from ..state import checkpoint as ckpt
from ..state.urlseen import create_seen_index


@dataclass
class EngineConfig:
    round_ms: int = 10_000
    default_delay_ms: int = 1000
    max_rounds: int = 50
    max_depth: int | None = None
    num_partitions: int = 16
    num_buckets: int = 16       # pages-corpus hash buckets
    num_seen_shards: int = 4
    seen_capacity: int = 1_000_000
    flaky: bool = False          # T6 deterministic transient-failure + retry model
    night_shift: bool = False    # F9 time-of-day host gating
    api_keys: tuple = ()         # T2/S13: non-empty → session-actor fetch path
    render: bool = False         # S12: browser-render actor fetch path
    seen_filter: str = "bloom"   # "bloom" | "cuckoo" (deletable — recrawl)
    parse_block_rows: int = 512  # split fetched blocks before parse (skew fix)
    # Pluggable fetch seam (S10-S12 deployment point): any callable
    # ``(selected: rd.Dataset, cfg: EngineConfig, rnd: int) -> rd.Dataset``
    # whose output adds the fetch-contract columns (status, attempts, html)
    # — e.g. ``stages.fetch.fetch_selected_http`` wrapped with a real
    # transport.  None → the built-in dispatch (render / api_keys / probe).
    fetcher: object = None
    # Downloader-middleware hook points (the reference's Scrapy middleware
    # stack surface, Borges/settings.py:93-104): request middlewares map
    # over the SELECTION before fetch (drop/rewrite rows), response
    # middlewares over the fetched rows before parse.  Each entry is a
    # pandas-batch callable ``df -> df``.
    request_middlewares: tuple = ()
    response_middlewares: tuple = ()


def _count_rows(path: str) -> int:
    if not os.path.isdir(path):
        return 0
    return pads.dataset(path, format="parquet").count_rows()


def _scan_blocks(path_or_files, num_partitions: int) -> int:
    """Metadata-driven block count for frontier/seen scans: bytes-scaled
    (grows with the table — at a 10^10-row frontier this is what sets real
    parallelism) with a rows floor, capped at ``num_partitions`` so a small
    round never shreds a ~1 MB frontier into 32 micro-blocks whose per-task
    overhead dominates the round (the same pathology
    ``relational._auto_num_blocks`` fixes for queries)."""
    from ..ops.relational import _auto_num_blocks

    if isinstance(path_or_files, str):
        files = [os.path.join(dp, f) for dp, _dn, fs in os.walk(path_or_files)
                 for f in fs if f.endswith(".parquet")]
    else:
        files = list(path_or_files)
    if not files:
        return 1
    return _auto_num_blocks(files, target_bytes=4 << 20, rows_per_block=5000,
                            max_row_blocks=num_partitions)


def _write_ds_into(final_dir: str, ds_or_table, tag: str) -> None:
    """Write a Dataset (or small Arrow table) as parquet files inside
    ``final_dir`` under a unique ``tag`` prefix (atomic: tmp + rename)."""
    tmp = final_dir + f".__tmp_{tag}"
    os.makedirs(tmp, exist_ok=True)
    if isinstance(ds_or_table, pa.Table):
        pq.write_table(ds_or_table, os.path.join(tmp, f"{tag}-0.parquet"))
    else:
        ds_or_table.write_parquet(tmp)
    os.makedirs(final_dir, exist_ok=True)
    for i, f in enumerate(sorted(os.listdir(tmp))):
        if f.endswith(".parquet"):
            os.rename(os.path.join(tmp, f), os.path.join(final_dir, f"{tag}-{i}.parquet"))
    import shutil

    shutil.rmtree(tmp)


def _atomic_write_table(dir_: str, name: str, table: pa.Table) -> None:
    """Task-side atomic parquet write: tmp file + rename (same dir)."""
    tmp = os.path.join(dir_, f".__tmp.{name}.{os.getpid()}")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(dir_, name))


def _make_split_emit(rnd: int, frontier_dir: str, seen_dir: str,
                     crawled_dir: str):
    """Per-block split emitter for the gated new-link rows: writes the
    block's frontier rows (non-blocked), seen-delta rows (all), and
    robots-blocked status-999 crawled rows as parquet files named by a
    content digest (a retried task rewrites the same bytes under the same
    name — idempotent), and returns only the tiny (partition, blocked, n)
    tally.  The driver never sees a new-link row."""

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"partition": pd.Series(dtype="int64"),
                              "blocked": pd.Series(dtype=bool),
                              "n": pd.Series(dtype="int64")})
        if df.empty:
            return empty
        import hashlib

        from ..stages.parse import PARSED_SCHEMA

        h = hashlib.blake2b(digest_size=8)
        for u in df["url"]:
            h.update(u.encode("utf-8"))
            h.update(b"\x00")
        digest = h.hexdigest()

        t = pa.Table.from_pandas(df, preserve_index=False)
        nb = t.filter(pc.invert(t["blocked"]))
        if nb.num_rows:
            ft = nb.select([f.name for f in schemas.FRONTIER]).cast(schemas.FRONTIER)
            _atomic_write_table(frontier_dir, f"new-{digest}.parquet", ft)
        st = t.append_column(
            "seen_round", pa.array([rnd + 1] * t.num_rows, pa.int32()))
        st = st.select(["url", "partition", "seen_round"]).cast(schemas.SEEN)
        _atomic_write_table(seen_dir, f"links-{digest}.parquet", st)
        b = df[df["blocked"]]
        if len(b):
            b = b.assign(fetch_round=rnd + 1, host_seq=-1, status=999,
                         attempts=0, extracted_text="", lang="", n_links=0)
            b = b.copy()
            b["links"] = [[] for _ in range(len(b))]
            bt = pa.Table.from_pandas(
                b[PARSED_SCHEMA.names], preserve_index=False).cast(PARSED_SCHEMA)
            _atomic_write_table(crawled_dir, f"blocked-{digest}.parquet", bt)
        tally = (df.groupby(["partition", "blocked"], sort=False)
                 .size().rename("n").reset_index())
        tally["partition"] = tally["partition"].astype("int64")
        tally["n"] = tally["n"].astype("int64")
        return tally

    return emit


def bootstrap(seeds: pa.Table, robots_df: pd.DataFrame, cfg: EngineConfig,
              ckpt_dir: str) -> None:
    """Round-0 checkpoint from the seed table (driver-side; seeds are tiny —
    the reference's start_urls.yaml scale)."""
    robots_map = {h: tuple(p) for h, p in zip(robots_df["host"], robots_df["disallow_prefixes"])}
    rows, crawled, seen_rows = [], [], []
    seen: set[str] = set()
    cands = []
    for url, prio in zip(seeds["url"].to_pylist(), seeds["priority"].to_pylist()):
        cu = canonicalize(url)
        if cu is not None:
            cands.append((cu, prio))
    # input order, first-listed wins — exactly the oracle's enqueue rule
    # (reference_crawl.py: seeds are enqueued in list order, `u in seen` skips)
    for cu, prio in cands:
        if cu in seen:
            continue
        seen.add(cu)
        host = host_of(cu)
        part = partition_of(cu, cfg.num_partitions)
        seen_rows.append({"url": cu, "partition": part, "seen_round": 0})
        path = cu.split(host, 1)[1] if host in cu else "/"
        if any(path.startswith(p) for p in robots_map.get(host, ())):
            crawled.append({"url": cu, "host": host, "depth": 0, "priority": prio,
                            "fetch_round": 0, "host_seq": -1, "status": 999,
                            "attempts": 0, "extracted_text": "", "lang": "",
                            "n_links": 0, "links": [], "partition": part})
            continue
        rows.append({"url": cu, "host": host, "depth": 0, "priority": prio,
                     "discovered_round": 0, "parent_url": "", "partition": part})

    rd0 = ckpt.round_dir(ckpt_dir, 0)
    os.makedirs(rd0, exist_ok=True)
    frontier_t = (
        pa.Table.from_pylist(rows).cast(schemas.FRONTIER) if rows
        else schemas.FRONTIER.empty_table()
    )
    _write_ds_into(os.path.join(rd0, "frontier"), frontier_t, "seed")
    seen_t = pa.Table.from_pylist(seen_rows).cast(schemas.SEEN) if seen_rows else schemas.SEEN.empty_table()
    _write_ds_into(os.path.join(rd0, "seen_delta"), seen_t, "seed")
    if crawled:
        from ..stages.parse import PARSED_SCHEMA

        ct = pa.Table.from_pylist(crawled).select(PARSED_SCHEMA.names).cast(PARSED_SCHEMA)
        _write_ds_into(os.path.join(rd0, "crawled"), ct, "blocked")
    # empty hive-partitioned host-state (hb=<b>/ dirs appear as hosts do)
    os.makedirs(os.path.join(rd0, "host_state"), exist_ok=True)
    ckpt.commit_round(ckpt_dir, 0)


def _update_host_state(old_dir: str, sel_counts: pd.DataFrame, new_dir: str,
                       num_partitions: int, delays: dict[str, int],
                       rnd: int, round_ms: int) -> None:
    """Fold this round's per-host selection counts into the host state
    table — ``(host, next_seq, next_allowed_ms)`` kept hive-partitioned by
    ``hb = hash(host) % P``.  ``next_allowed_ms`` is the host's continuous
    politeness clock (Scrapy's per-slot ``next_request_time``, see
    ``stages/politeness.py``): a host that fetched ``n`` URLs this round
    advances to ``max(old_clock, rnd·round_ms) + n·delay``, carrying any
    fractional-round remainder into the next round.

    Driver cost is O(hosts ACTIVE this round) — politeness-bounded — never
    O(all hosts ever seen): only buckets containing an active host are
    read+rewritten; untouched buckets carry forward as HARDLINKS (a file op,
    no data read — an idle host's stale clock is a no-op under the max()
    rule).  ``sel_counts`` is the (host, n) frame of this round's
    selections — the same bounded size as the selection itself."""
    from ..canonical import stable_hash

    os.makedirs(new_dir, exist_ok=True)
    by_bucket: dict[int, pd.DataFrame] = {}
    if len(sel_counts):
        sel_counts = sel_counts.copy()
        sel_counts["hb"] = [stable_hash(h) % num_partitions
                            for h in sel_counts["host"]]
        by_bucket = {int(b): g for b, g in sel_counts.groupby("hb", sort=False)}

    old_buckets: dict[int, str] = {}
    if os.path.isdir(old_dir):
        for d in os.listdir(old_dir):
            if d.startswith("hb="):
                old_buckets[int(d.split("=", 1)[1])] = os.path.join(old_dir, d)

    default_delay = delays["__default__"]
    for b in sorted(set(by_bucket) | set(old_buckets)):
        src = old_buckets.get(b)
        dst = os.path.join(new_dir, f"hb={b}")
        if b not in by_bucket:
            # untouched bucket: hardlink files forward — zero data read
            os.makedirs(dst, exist_ok=True)
            for f in os.listdir(src):
                if f.endswith(".parquet"):
                    os.link(os.path.join(src, f), os.path.join(dst, f))
            continue
        if src is not None:
            old = pq.read_table(src).to_pandas()
            if "next_allowed_ms" not in old.columns:  # pre-carryover ckpt
                old["next_allowed_ms"] = 0
            old = old[["host", "next_seq", "next_allowed_ms"]]
        else:
            old = pd.DataFrame({"host": pd.Series(dtype=object),
                                "next_seq": pd.Series(dtype="int64"),
                                "next_allowed_ms": pd.Series(dtype="int64")})
        add = by_bucket[b][["host", "n"]]
        merged = old.merge(add, on="host", how="outer")
        merged["n"] = merged["n"].fillna(0).astype("int64")
        merged["next_seq"] = (merged["next_seq"].fillna(0).astype("int64")
                              + merged["n"])
        merged["next_allowed_ms"] = merged["next_allowed_ms"].fillna(0).astype("int64")
        active = merged["n"] > 0
        if active.any():
            delay = merged["host"].map(lambda h: delays.get(h, default_delay))
            start = merged["next_allowed_ms"].clip(lower=rnd * round_ms)
            merged.loc[active, "next_allowed_ms"] = (
                start + merged["n"] * delay)[active].astype("int64")
        merged = (merged[["host", "next_seq", "next_allowed_ms"]]
                  .sort_values("host", kind="mergesort").reset_index(drop=True))
        os.makedirs(dst, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(merged, preserve_index=False),
                       os.path.join(dst, "state-0.parquet"))


def run_crawl(
    pages_root: str,
    seeds: pa.Table,
    robots_df: pd.DataFrame,
    cfg: EngineConfig,
    ckpt_dir: str,
    resume: bool = True,
) -> dict:
    """Run (or resume) the crawl to completion; returns summary paths/counts.

    ``pages_root`` must be the hash-bucketed corpus layout produced by
    :func:`borges_ray.stages.fetch.write_pages_bucketed`.
    """
    if not resume:
        import shutil

        if os.path.isdir(ckpt_dir):
            shutil.rmtree(ckpt_dir)
    ckpt.clean_uncommitted(ckpt_dir)
    last = ckpt.last_committed_round(ckpt_dir)
    if last < 0:
        bootstrap(seeds, robots_df, cfg, ckpt_dir)
        last = 0

    # --- rebuild run-wide state from committed checkpoints ----------------
    # Distributed: the seen-delta Parquet is read as a Dataset and each
    # WORKER task routes its batch of urls to the shard actors
    # (state.urlseen.seen_load) — the driver never materializes the seen
    # set (at 10^10 urls the old to_pylist() rebuild was the last
    # whole-corpus driver read in the crawl).  Shard actors serialize
    # concurrent loaders and load_keys is idempotent, so overlapping
    # batches from parallel tasks are safe.
    shards = create_seen_index(cfg.num_seen_shards, cfg.seen_capacity,
                               filter_kind=cfg.seen_filter)
    seen_files = [
        os.path.join(p, f)
        for r in range(last + 1)
        if os.path.isdir(p := os.path.join(ckpt.round_dir(ckpt_dir, r), "seen_delta"))
        for f in sorted(os.listdir(p)) if f.endswith(".parquet")
    ]
    if seen_files:
        from ..state.urlseen import seen_load

        def _load_seen(df: pd.DataFrame, shards=shards) -> pd.DataFrame:
            return pd.DataFrame({"n": [seen_load(shards, df["url"].tolist())]})

        loaded = (
            rd.read_parquet(seen_files, columns=["url"],
                            override_num_blocks=_scan_blocks(
                                seen_files, cfg.num_partitions))
            .map_batches(_load_seen, batch_format="pandas")
            .sum("n")
        )
        del loaded

    delays = delays_from_robots(robots_df, cfg.default_delay_ms)
    delays_ref = ray.put(delays)
    _alw = (robots_df["allow_prefixes"]
            if "allow_prefixes" in robots_df.columns
            else [()] * len(robots_df))
    robots_ref = ray.put(
        {h: (tuple(p), tuple(a)) for h, p, a in
         zip(robots_df["host"], robots_df["disallow_prefixes"], _alw)}
    )

    timing = bool(os.environ.get("BORGES_CRAWL_TIMING"))

    def _fetch_parse(sel: rd.Dataset, rnd_tag: int) -> rd.Dataset:
        """Fetch-join + parse for one round's selection, pinned.  With a
        key pool configured, fetch runs on session actors (T2/S13); with
        ``render``, on browser-handle actors (S12) — identical rows,
        bookkeeping columns dropped before parse."""
        for mw in cfg.request_middlewares:
            sel = sel.map_batches(mw, batch_format="pandas")
        if cfg.fetcher is not None:
            fetched = cfg.fetcher(sel, cfg, rnd_tag)
        elif cfg.render:
            from ..stages.fetch import fetch_selected_render

            fetched = fetch_selected_render(
                sel, pages_root, cfg.num_buckets,
                flaky=cfg.flaky).drop_columns(["render_ms", "handle_gen"])
        elif cfg.api_keys:
            from ..stages.fetch import fetch_selected_sessions

            fetched = fetch_selected_sessions(
                sel, pages_root, cfg.num_buckets, tuple(cfg.api_keys),
                flaky=cfg.flaky).drop_columns(["key_idx"])
        else:
            fetched = fetch_selected(sel, pages_root, cfg.num_buckets,
                                     flaky=cfg.flaky)
        for mw in cfg.response_middlewares:
            fetched = fetched.map_batches(mw, batch_format="pandas")
        # The fetch emits ONE block per corpus bucket, so parse parallelism
        # was capped at num_buckets and skewed by the hottest bucket (a
        # single 3k-row block serialized 5+ s of per-page extraction).
        # A split-only streaming repartition rebalances fetched html into
        # ~parse_block_rows-row blocks — no all-to-all, bounded payload
        # (the selection is politeness-bounded) — so parse scales with
        # CPUs, not buckets.
        if cfg.parse_block_rows:
            fetched = fetched.repartition(
                target_num_rows_per_block=cfg.parse_block_rows)
        return parse_fetched(fetched, rnd_tag).materialize()

    prefetch: dict | None = None  # round-pipelined selection (see below)
    rnd = last
    while rnd < cfg.max_rounds:
        t_round = time.time()
        marks: dict[str, float] = {}
        marks_lock = threading.Lock()  # prefetch/host-state threads write
        # into this round's marks while the timing print may iterate it

        def _mark(name: str, t0: float) -> None:
            with marks_lock:
                marks[name] = round(time.time() - t0, 2)

        this_dir = ckpt.round_dir(ckpt_dir, rnd)
        next_dir = ckpt.round_dir(ckpt_dir, rnd + 1)
        frontier_path = os.path.join(this_dir, "frontier")
        frontier_size = _count_rows(frontier_path)
        if frontier_size == 0:
            break
        os.makedirs(next_dir, exist_ok=True)

        host_state_dir = os.path.join(this_dir, "host_state")

        # metadata-driven scan blocks: bytes-scaled at design scale, small
        # for a ~1 MB sandbox frontier (see _scan_blocks)
        frontier = rd.read_parquet(
            frontier_path,
            override_num_blocks=_scan_blocks(frontier_path, cfg.num_partitions))

        # 1. politeness selection (host_seq assigned).  The selection is
        # politeness-BOUNDED (≤ budget × hosts rows), so pinning it in the
        # object store is safe and saves a write→read round trip.  Host
        # counters come from the partitioned host-state checkpoint — the
        # driver never holds a hosts dict.  If the PREVIOUS round prefetched
        # this round's selection (round pipelining: the select ran
        # concurrently with the previous round's tail — blocked/tally
        # split, metrics, commit), reuse it; inputs are identical (the
        # committed frontier + host-state files), so the result is too.
        t0 = time.time()
        pre_parsed = None
        if prefetch is not None and prefetch["rnd"] == rnd:
            prefetch["thread"].join()
            if "err" in prefetch["state"]:
                raise prefetch["state"]["err"]
            selected = prefetch["state"]["selected"]
            pre_parsed = prefetch["state"].get("parsed")
            prefetch = None
        else:
            selected = select_frontier(frontier, delays_ref, host_state_dir,
                                       num_partitions=cfg.num_partitions,
                                       rnd=rnd, night_shift=cfg.night_shift,
                                       round_ms=cfg.round_ms).materialize()
        _mark("select", t0)
        sel_dir = os.path.join(next_dir, "selected")

        # 6 (early). host_state: fold this round's per-host selections into
        # the partitioned counter/clock table — depends ONLY on the pinned
        # selection, so it launches IMMEDIATELY after select on a thread
        # overlapped with everything else (it gates next round's prefetched
        # selection).  The counts are politeness-BOUNDED, never O(all hosts)
        hs_err: list[BaseException] = []

        def _host_state_job(rnd=rnd, selected=selected,
                            host_state_dir=host_state_dir, next_dir=next_dir):
            try:
                t0h = time.time()
                # per-host counts straight off the PINNED selection (one
                # small Ray combiner pass) — the old driver-side os.walk +
                # per-file parquet read of the hive layout was the long
                # pole of the prefetch critical path on a throttled host
                parts = selected.map_batches(
                    lambda df: df["host"].value_counts().rename("n")
                                 .rename_axis("host").reset_index(),
                    batch_format="pandas").to_pandas()
                if len(parts):
                    host_counts = (parts.groupby("host", sort=False)["n"]
                                   .sum().reset_index())
                else:
                    host_counts = pd.DataFrame({"host": pd.Series(dtype=object),
                                                "n": pd.Series(dtype="int64")})
                _update_host_state(host_state_dir, host_counts,
                                   os.path.join(next_dir, "host_state"),
                                   cfg.num_partitions, delays, rnd, cfg.round_ms)
                _mark("host_state", t0h)
            except BaseException as e:  # surfaced before prefetch/commit
                hs_err.append(e)

        hs_thread = threading.Thread(target=_host_state_job)
        hs_thread.start()

        # hive-partitioned by the url-hash partition: the deferral scan
        # reads per-partition membership slices instead of a broadcast set.
        # Coalesce blocks first — the hive write fans out blocks×partitions
        # files otherwise (537 tiny files/round measured at 32×32)
        t0 = time.time()
        selected.repartition(2).write_parquet(sel_dir, partition_cols=["partition"])
        _mark("write_sel", t0)

        def _launch_prefetch(rnd=rnd, next_dir=next_dir):
            """Round pipelining: once round r+1's frontier AND host-state
            files are fully written, run its politeness selection on a
            thread concurrent with THIS round's remaining tail.  Nothing is
            persisted until round r+1 itself, so crash/resume semantics are
            unchanged."""
            if rnd + 1 >= cfg.max_rounds:
                return None
            hs_thread.join()
            if hs_err:
                raise hs_err[0]
            nf_path = os.path.join(next_dir, "frontier")
            if _count_rows(nf_path) == 0:
                return None
            nf = rd.read_parquet(
                nf_path,
                override_num_blocks=_scan_blocks(nf_path, cfg.num_partitions))
            state: dict = {}
            t0p = time.time()

            def _run():
                try:
                    state["selected"] = select_frontier(
                        nf, delays_ref, os.path.join(next_dir, "host_state"),
                        num_partitions=cfg.num_partitions, rnd=rnd + 1,
                        night_shift=cfg.night_shift,
                        round_ms=cfg.round_ms).materialize()
                    _mark("prefetch_select", t0p)
                    # software pipeline the EXPENSIVE stage too: round r+1's
                    # fetch-join + parse runs here, overlapped with round
                    # r's gate/metrics/commit tail.  Nothing is persisted
                    # (the pinned parse output is written by round r+1
                    # itself), so crash/resume semantics are unchanged.
                    state["parsed"] = _fetch_parse(state["selected"], rnd + 1)
                    _mark("prefetch_fetch", t0p)
                except BaseException as e:
                    state["err"] = e

            th = threading.Thread(target=_run)
            th.start()
            return {"rnd": rnd + 1, "thread": th, "state": state}

        # 2. deferral (frontier scan minus selected urls) — runs CONCURRENTLY
        # with fetch+parse on a driver thread: the two pipelines share no
        # data dependency, so their Ray executions overlap
        frontier2 = rd.read_parquet(
            frontier_path,
            override_num_blocks=_scan_blocks(frontier_path, cfg.num_partitions))
        deferred = defer_frontier(frontier2, sel_dir)
        frontier_next_dir = os.path.join(next_dir, "frontier")
        defer_err: list[BaseException] = []

        def _defer_job():
            try:
                _write_ds_into(frontier_next_dir, deferred, "deferred")
            except BaseException as e:  # surfaced after join
                defer_err.append(e)

        defer_thread = threading.Thread(target=_defer_job)
        defer_thread.start()

        # 3-4. fetch-join + parse (bounded like the selection → materialize;
        # html is dropped by parse, only text+links are pinned).  When the
        # previous round's prefetch thread already ran this round's
        # fetch+parse (software pipelining), the pinned result is reused.
        t0 = time.time()
        parsed = pre_parsed if pre_parsed is not None else _fetch_parse(selected, rnd)
        _mark("fetch_parse", t0)
        # write the crawled checkpoint on a thread OVERLAPPED with the
        # gate/split below (both consume the pinned ``parsed`` set; the
        # only reader of the files is the metrics pass, which joins this
        # thread first).  ``has_crawled`` comes from the pinned rows, not
        # the not-yet-written files.
        crawled_dir = os.path.join(next_dir, "crawled")
        has_crawled = bool(parsed.count())
        wc_err: list[BaseException] = []
        t_wc = time.time()

        def _write_crawled_job():
            try:
                _write_ds_into(crawled_dir, parsed, "fetched")
                _mark("write_crawled", t_wc)
            except BaseException as e:  # surfaced before the metrics read
                wc_err.append(e)

        wc_thread = threading.Thread(target=_write_crawled_job)
        wc_thread.start()

        # 5. link candidates → winner dedup → seen + robots gate → FUSED
        # split: ONE execution over the gated rows in which each task writes
        # its own block's frontier/seen/blocked parquet files directly
        # (task-side writes, content-digest names → idempotent under task
        # retry) and returns only (partition, blocked, n) tally rows.  This
        # replaces the r03 shape — materialize + a `new` checkpoint write +
        # four separate derivation executions — with a single pass: the
        # gated rows are touched once and never pinned, and the per-round
        # fixed cost drops by ~3 execution round-trips + 2 dataset writes.
        seen_delta_dir = os.path.join(next_dir, "seen_delta")
        new_counts = pd.DataFrame({"partition": pd.Series(dtype="int64"),
                                   "blocked": pd.Series(dtype=bool),
                                   "n": pd.Series(dtype="int64")})
        t0 = time.time()
        if has_crawled:
            parsed_back = parsed.select_columns(["url", "status", "priority", "depth", "links"])
            cands = link_candidates(parsed_back, rnd, cfg.num_partitions, cfg.max_depth)
            gated = gate_candidates(cands, shards, robots_ref, rnd + 1)
            for d in (frontier_next_dir, seen_delta_dir, crawled_dir):
                os.makedirs(d, exist_ok=True)
            emit = _make_split_emit(rnd, frontier_next_dir, seen_delta_dir,
                                    crawled_dir)
            tallies = gated.map_batches(emit, batch_format="pandas").to_pandas()
            if len(tallies):
                new_counts = (tallies.groupby(["partition", "blocked"], sort=False)
                              ["n"].sum().reset_index())
        if not len(new_counts):
            _write_ds_into(seen_delta_dir, schemas.SEEN.empty_table(), "links")
        _mark("gate_split", t0)

        t0 = time.time()
        defer_thread.join()
        _mark("defer_join", t0)
        if defer_err:
            raise defer_err[0]
        # round r+1's frontier (deferred + new) and, inside the launch,
        # its host state are now complete → prefetch its selection
        prefetch = _launch_prefetch()

        hs_thread.join()  # no-op if _launch_prefetch already joined it
        if hs_err:
            raise hs_err[0]
        wc_thread.join()  # metrics below reads the crawled files
        if wc_err:
            raise wc_err[0]
        t0 = time.time()

        if has_crawled:
            crawled_t = pq.read_table(crawled_dir,
                                      columns=["status", "partition", "n_links"]).to_pandas()
        else:
            crawled_t = pd.DataFrame({"status": pd.Series(dtype="int32"),
                                      "partition": pd.Series(dtype="int32"),
                                      "n_links": pd.Series(dtype="int32")})
        fetched_rows = crawled_t[crawled_t.status == 200]
        # every non-200 FETCH is a miss (404 and retry-exhausted 503 alike);
        # 999 = robots-blocked, never fetched — the oracle's `missed` rule
        missed_rows = crawled_t[(crawled_t.status != 200) & (crawled_t.status != 999)]
        # selected-per-partition from the hive layout's parquet METADATA —
        # row counts only, no data read, no driver copy of the selection
        sel_counts_rows = []
        if os.path.isdir(sel_dir):
            for dname in os.listdir(sel_dir):
                if not dname.startswith("partition="):
                    continue
                p = int(dname.split("=", 1)[1])
                n = sum(pq.ParquetFile(os.path.join(sel_dir, dname, f)).metadata.num_rows
                        for f in os.listdir(os.path.join(sel_dir, dname))
                        if f.endswith(".parquet"))
                sel_counts_rows.append((p, n))
        sel_counts = pd.DataFrame(sel_counts_rows, columns=["partition", "selected"]) \
            if sel_counts_rows else pd.DataFrame({"partition": pd.Series(dtype="int64"),
                                                  "selected": pd.Series(dtype="int64")})
        per_part = pd.DataFrame({"partition": range(cfg.num_partitions)})
        per_part["round"] = rnd
        per_part = per_part.merge(
            sel_counts.set_index("partition")["selected"], on="partition", how="left"
        ).merge(
            fetched_rows.groupby("partition").size().rename("fetched"), on="partition", how="left"
        ).merge(
            missed_rows.groupby("partition").size().rename("missed"), on="partition", how="left"
        ).merge(
            fetched_rows.groupby("partition")["n_links"].sum().rename("links_emitted"),
            on="partition", how="left",
        )
        if len(new_counts):
            nc = new_counts
            per_part = per_part.merge(
                nc[~nc["blocked"]].set_index("partition")["n"].rename("links_new"),
                on="partition", how="left",
            ).merge(
                nc[nc["blocked"]].set_index("partition")["n"].rename("blocked"),
                on="partition", how="left",
            )
        else:
            per_part["links_new"] = 0
            per_part["blocked"] = 0
        per_part["frontier_size"] = frontier_size
        per_part = per_part.fillna(0)
        for c in ("selected", "fetched", "missed", "blocked", "links_emitted", "links_new", "frontier_size"):
            per_part[c] = per_part[c].astype("int64")
        per_part["round"] = per_part["round"].astype("int32")
        per_part["partition"] = per_part["partition"].astype("int32")
        m_t = pa.Table.from_pandas(
            per_part[[f.name for f in schemas.METRICS]], preserve_index=False
        ).cast(schemas.METRICS)
        _write_ds_into(os.path.join(next_dir, "metrics"), m_t, "m")
        _mark("metrics", t0)

        ckpt.commit_round(ckpt_dir, rnd + 1)
        if timing:
            with marks_lock:
                snapshot = dict(marks)
            print(f"[crawl-timing] round={rnd} total={time.time() - t_round:.2f} "
                  f"{snapshot}", file=sys.stderr)
        rnd += 1

    return {
        "ckpt_dir": ckpt_dir,
        "rounds": rnd,
        "crawled_rows": sum(
            _count_rows(os.path.join(ckpt.round_dir(ckpt_dir, r), "crawled"))
            for r in range(rnd + 1)
        ),
    }


def collect_crawled(ckpt_dir: str) -> pa.Table:
    """All crawled rows across committed rounds (official CRAWLED columns)."""
    last = ckpt.last_committed_round(ckpt_dir)
    t = ckpt.read_all_rounds(ckpt_dir, "crawled", last)
    if t is None:
        return schemas.CRAWLED.empty_table()
    cols = [f.name for f in schemas.CRAWLED]
    return t.select(cols)


def collect_seen(ckpt_dir: str) -> pa.Table:
    last = ckpt.last_committed_round(ckpt_dir)
    t = ckpt.read_all_rounds(ckpt_dir, "seen_delta", last)
    return t if t is not None else schemas.SEEN.empty_table()


def crawl_entry(sf_dir: str) -> rd.Dataset:
    """Flagship entry: full engine on the deterministic synthetic web
    (sized by sf tier), returning the crawled table as a Dataset."""
    import tempfile

    from ..stages.fetch import write_pages_bucketed
    from ..synth import synth_pages, synth_robots, synth_seeds

    n_pages = 2000
    cfg = EngineConfig(max_rounds=8, num_buckets=8, num_partitions=8)
    tmp = tempfile.mkdtemp(prefix="borges_entry_")
    pages_root = os.path.join(tmp, "pages")
    pages = synth_pages(42, n_pages)
    write_pages_bucketed(pages.select(["url", "html"]), pages_root, cfg.num_buckets)
    robots_df = synth_robots(42, n_pages).to_pandas()
    run_crawl(pages_root, synth_seeds(42, n_pages), robots_df, cfg,
              os.path.join(tmp, "ckpt"), resume=False)
    return rd.from_arrow(collect_crawled(os.path.join(tmp, "ckpt")))


def _main() -> None:
    """CLI: ``python -m borges_ray.pipelines.crawl [--n-pages N] [--ckpt DIR]
    [--rounds R] [--flaky] [--night-shift] [--resume]`` — runs the engine on
    the deterministic synthetic web and prints a status summary."""
    import argparse
    import tempfile

    import ray

    from ..stages.fetch import write_pages_bucketed
    from ..synth import synth_pages, synth_robots, synth_seeds

    ap = argparse.ArgumentParser(description="borges_ray crawl engine")
    ap.add_argument("--n-pages", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--num-cpus", type=int, default=8)
    ap.add_argument("--flaky", action="store_true")
    ap.add_argument("--night-shift", action="store_true")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    work = args.ckpt or tempfile.mkdtemp(prefix="borges_crawl_")
    pages_root = os.path.join(work, "pages")
    if not os.path.isdir(pages_root):
        pages = synth_pages(args.seed, args.n_pages)
        write_pages_bucketed(pages.select(["url", "html"]), pages_root, 8)
    cfg = EngineConfig(max_rounds=args.rounds, num_partitions=8, num_buckets=8,
                      num_seen_shards=4, flaky=args.flaky,
                      night_shift=args.night_shift)
    summary = run_crawl(pages_root, synth_seeds(args.seed, args.n_pages),
                        synth_robots(args.seed, args.n_pages).to_pandas(),
                        cfg, os.path.join(work, "ckpt"), resume=args.resume)
    crawled = collect_crawled(os.path.join(work, "ckpt")).to_pandas()
    by_status = crawled["status"].value_counts().to_dict()
    print(f"rounds={summary['rounds']} crawled={len(crawled)} "
          f"statuses={by_status} ckpt={os.path.join(work, 'ckpt')}")
    ray.shutdown()


if __name__ == "__main__":
    _main()
