"""Benchmark harness.

Headline: the crawl engine over a deterministic synthetic Common-Crawl-style
web sized to the sf tier (sf × 1M pages), measuring fetched+parsed pages/sec
and frontier URLs/sec dedup throughput (BASELINE.json metric).  Also times a
representative subset of the ``queries()`` pipelines over ``$GRAFT_SF_DIR``.

Prints exactly ONE JSON line on stdout:
  {"metric": "crawl_wall_sec", "value": <sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "pages_per_sec": ..., "frontier_urls_per_sec": ..., ...}

``--scaling``: runs the same bench twice in fresh processes at
RAY_GRAFT_CPUS=8 and =32 on the SAME corpus (cache warmed) and reports both
throughputs + scaling efficiency — the in-sandbox stand-in for the N vs 4N
node cluster criterion (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SEED = 42
BENCH_ROOT = "/tmp/borges_bench"


def sf_of(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def corpus_paths(n_pages: int, num_buckets: int) -> tuple[str, str]:
    root = os.path.join(BENCH_ROOT, f"web_{SEED}_{n_pages}_{num_buckets}")
    return os.path.join(root, "pages"), root


def ensure_corpus(n_pages: int, num_buckets: int) -> str:
    """Generate + bucket the synthetic web once; cache under /tmp."""
    pages_root, root = corpus_paths(n_pages, num_buckets)
    marker = os.path.join(root, "_DONE")
    if os.path.exists(marker):
        return pages_root
    import shutil

    from borges_ray.stages.fetch import write_pages_bucketed_ds
    from borges_ray.synth import synth_pages_dataset

    if os.path.isdir(root):
        shutil.rmtree(root)
    os.makedirs(root, exist_ok=True)
    ds = synth_pages_dataset(SEED, n_pages, chunk=max(2000, n_pages // 256))
    write_pages_bucketed_ds(ds.map_batches(lambda t: t.select(["url", "html"]),
                                           batch_format="pyarrow"),
                            pages_root, num_buckets)
    with open(marker, "w"):
        pass
    return pages_root


def bench_crawl(n_pages: int, num_cpus: int) -> dict:
    import shutil

    from borges_ray.pipelines.crawl import EngineConfig, run_crawl
    from borges_ray.state import checkpoint as ckpt_mod
    from borges_ray.synth import synth_robots, synth_seeds

    num_buckets = 32
    cfg = EngineConfig(
        round_ms=60_000,            # meaty rounds: 30-240 fetches/host/round
        max_rounds=8,
        num_partitions=32,
        num_buckets=num_buckets,
        num_seen_shards=8,
        seen_capacity=max(1_000_000, 4 * n_pages),
    )
    pages_root = ensure_corpus(n_pages, num_buckets)
    ckpt_dir = os.path.join(BENCH_ROOT, f"ckpt_{os.getpid()}")
    if os.path.isdir(ckpt_dir):
        shutil.rmtree(ckpt_dir)

    seeds = synth_seeds(SEED, n_pages)
    robots = synth_robots(SEED, n_pages).to_pandas()

    t0 = time.time()
    summary = run_crawl(pages_root, seeds, robots, cfg, ckpt_dir, resume=False)
    wall = time.time() - t0

    import pyarrow.parquet as pq

    last = ckpt_mod.last_committed_round(ckpt_dir)
    m = ckpt_mod.read_all_rounds(ckpt_dir, "metrics", last)
    md = m.to_pandas() if m is not None else None
    fetch_attempts = int(md["selected"].sum()) if md is not None else 0
    links = int(md["links_emitted"].sum()) if md is not None else 0
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    return {
        "crawl_wall_sec": round(wall, 2),
        "rounds": summary["rounds"],
        "crawled_rows": summary["crawled_rows"],
        "fetch_attempts": fetch_attempts,
        "pages_per_sec": round(fetch_attempts / wall, 1),
        "frontier_urls_per_sec": round((links + fetch_attempts) / wall, 1),
    }


QUERY_SUBSET = [
    "pricing_summary", "join_hash", "window_hourly",
    "dedup_docs_exact", "knn_cosine", "sessionize",
]


def bench_queries(sf_dir: str) -> dict:
    import __ray_entry__ as e

    qs = e.queries()
    out = {}
    for name in QUERY_SUBSET:
        t0 = time.time()
        res = qs[name](sf_dir)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        out[name] = round(time.time() - t0, 2)
    return out


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf = sf_of(sf_dir)
    n_pages = max(2000, int(1_000_000 * sf))

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    crawl_stats = bench_crawl(n_pages, num_cpus)
    queries = bench_queries(sf_dir)

    result = {
        "metric": "crawl_wall_sec",
        "value": crawl_stats["crawl_wall_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        "n_pages": n_pages,
        **crawl_stats,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same corpus + pipeline at 8 and 32 CPUs in fresh processes."""
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # warm: corpus generation + page cache (untimed for the comparison)
    warm = run(8)
    lo = run(8)
    hi = run(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "pages_per_sec_8": lo["pages_per_sec"],
        "pages_per_sec_32": hi["pages_per_sec"],
        "warm_sec_8": warm["value"],
        "sf": lo["sf"],
        "n_pages": lo["n_pages"],
    }


if __name__ == "__main__":
    res = run_scaling() if "--scaling" in sys.argv else run_bench()
    print(json.dumps(res))
