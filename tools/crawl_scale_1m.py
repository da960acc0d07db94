"""BSP crawl 8→32 CPU pair at a 1M-page corpus (rounds ~10× the bench
sandbox size) — extends the 100k→400k round-size trend from BASELINE.md.

Each level runs in a FRESH process (fresh ``ray.init``) with BENCH_REPS
reps inside; levels are interleaved so a bursty host phase cannot bias one
level; min-of-reps approximates uncontended walls.  The corpus is built
once (cached under /tmp/borges_bench) by a warm 32-CPU pass.

Usage: PYTHONPATH=/root/repo python tools/crawl_scale_1m.py [n_pages]
Writes the result JSON to stdout (one line, like bench.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPS = int(os.environ.get("BENCH_REPS", "2"))


def child(ncpu: int) -> dict:
    code = f"""
import json, os, sys
sys.path.insert(0, "/root/repo")
os.environ["BENCH_REPS"] = "{REPS}"
import bench
bench._init_ray({ncpu})
pages_root = bench.ensure_corpus({N_PAGES}, 32)
stats = bench.bench_crawl(pages_root, {N_PAGES}, 32)
import ray
ray.shutdown()
print("RESULT " + json.dumps(stats))
"""
    env = dict(os.environ, PYTHONPATH="/root/repo")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, check=True).stdout
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError("no RESULT line in child output")


def main() -> None:
    # warm pass builds/caches the corpus (untimed for the pair)
    warm = child(32)
    runs: dict[int, list[dict]] = {}
    for ncpu in (8, 32, 8, 32):
        runs.setdefault(ncpu, []).append(child(ncpu))
    best = {n: min(rs, key=lambda r: r["crawl_wall_sec_min"])
            for n, rs in runs.items()}
    lo = best[8]["crawl_wall_sec_min"]
    hi = best[32]["crawl_wall_sec_min"]
    med_lo = min(r["crawl_wall_sec"] for r in runs[8])
    med_hi = min(r["crawl_wall_sec"] for r in runs[32])
    res = {
        "metric": "crawl_scaling_1m",
        "n_pages": N_PAGES,
        "value": round((lo / hi) / 4, 3),
        "unit": "ratio",
        "pair_8_to_32": {
            "sec_lo_min": lo, "sec_hi_min": hi,
            "efficiency_min": round((lo / hi) / 4, 3),
            "efficiency_median": round((med_lo / med_hi) / 4, 3),
            "frontier_urls_per_sec": {
                "8": best[8]["frontier_urls_per_sec_best"],
                "32": best[32]["frontier_urls_per_sec_best"]},
            "pages_per_sec_32": best[32]["crawl_pages_per_sec"],
            "all_runs_sec": {str(n): [r["crawl_wall_all"] for r in rs]
                             for n, rs in runs.items()},
        },
        "warm_sec_32": warm["crawl_wall_sec"],
        "rounds": best[32]["crawl_rounds"],
        "fetch_attempts": best[32]["crawl_fetch_attempts"],
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
