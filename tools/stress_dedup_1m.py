"""1M-page MinHash near-dup dedup stress — the scale regime the sf0.1
bench can't reach (blob exchange ~11 GB, candidate pairs ~1.4M).

Two modes:

* default: raw synthetic corpus (no planted duplicates) — exercises the
  full chain; random 400-1000-word bodies yield 0 true pairs, so the
  expected output is ``verified pairs: 0`` and ``survivors: 1000000``.
* ``--planted``: ~3% of docs are overwritten with per-cluster template
  text (cluster = (h//100) % 10000, variant = h % 100 in {0,1,2};
  variants differ by 3 of 300 tokens, J ≈ 0.9).  Ground-truth pair and
  survivor counts are computed driver-side from the url hashes and
  asserted EXACTLY against the engine — the planted-cluster fixture uses
  per-cluster RNG tokens, not an arithmetic token formula (which planted
  ~700k accidental cross-cluster shifted near-dups in an early version).

Corpus build (once): tools/stress_dedup_1m.py --build
Usage: PYTHONPATH=/root/repo python tools/stress_dedup_1m.py [--build] [--planted]

History this file pins down: the union→sort verify shape livelocked at
this scale (preserve-order UnionOperator buffers its whole input; see
borges_ray.ops.relational.cogroup_spill).  With the disk-bucketed
cogroup the full chain runs 1M docs in ~206-212 s on 32 sandbox CPUs.
"""
import os
import sys
import time

import numpy as np
import pandas as pd
import ray

ROOT = "/tmp/borges_scale_1m"
PAGES = os.path.join(ROOT, "pages")


def build_corpus() -> None:
    import shutil

    from borges_ray.stages.fetch import write_pages_bucketed_ds
    from borges_ray.synth import synth_pages_dataset

    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT)
    t0 = time.time()
    ds = synth_pages_dataset(42, 1_000_000, chunk=8000, words_lo=400, words_hi=1000)
    write_pages_bucketed_ds(
        ds.map_batches(lambda t: t.select(["url", "html"]), batch_format="pyarrow"),
        PAGES, 64)
    open(os.path.join(ROOT, "_DONE"), "w").close()
    print(f"corpus build: {time.time()-t0:.1f}s", flush=True)


def template_text(cluster: int, variant: int) -> str:
    rng = np.random.default_rng(cluster + 1)
    toks = [f"w{t}" for t in rng.integers(0, 50021, 300)]
    for k in range(3):
        toks[(variant * 17 + k * 41) % 300] = f"v{variant}x{k}"
    return " ".join(toks)


def main(planted: bool) -> int:
    import ray.data as rd

    from borges_ray.canonical import stable_hash
    from borges_ray.extract import extract_text
    from borges_ray.ops.dedup import dedup_survivors_ds, minhash_near_dup_pairs_ds
    from borges_ray.ops.relational import _spill_point_n

    def to_docs(df):
        h = np.array([stable_hash(u) for u in df["url"]], dtype=np.uint64)
        texts = []
        for u_h, html in zip(h, df["html"]):
            hv = int(u_h)
            if planted and hv % 100 < 3:
                texts.append(template_text((hv // 100) % 10000, hv % 100))
            else:
                texts.append(extract_text(html))
        return pd.DataFrame({"doc_id": h.view(np.int64), "text": texts})

    T0 = time.time()
    pages = rd.read_parquet(PAGES, columns=["url", "html"],
                            override_num_blocks=128)
    docs = pages.map_batches(to_docs, batch_format="pandas")

    t = time.time()
    verified = minhash_near_dup_pairs_ds(docs, "doc_id", threshold=0.7)
    verified, _ = _spill_point_n(verified, "stress_ver")
    n_ver = verified.count()
    print(f"STAGE sign+band+verify: {time.time()-t:.1f}s; "
          f"verified pairs: {n_ver}", flush=True)

    t = time.time()
    ids_only = rd.read_parquet(PAGES, columns=["url"],
                               override_num_blocks=64).map_batches(
        lambda df: pd.DataFrame({"doc_id": np.array(
            [stable_hash(u) for u in df["url"]],
            dtype=np.uint64).view(np.int64)}), batch_format="pandas")
    surv = dedup_survivors_ds(ids_only, verified, "doc_id")
    n_surv = surv.count()
    print(f"STAGE cc+survivors: {time.time()-t:.1f}s; survivors: {n_surv}",
          flush=True)
    print(f"TOTAL: {time.time()-T0:.1f}s over 1M docs", flush=True)

    if not planted:
        return 0

    import collections

    urls = rd.read_parquet(PAGES, columns=["url"]).to_pandas()["url"]
    h = np.array([stable_hash(u) for u in urls], dtype=np.uint64)
    key = (h[h % 100 < 3] // 100) % 10000
    sizes = collections.Counter(key.tolist())
    true_pairs = sum(n * (n - 1) // 2 for n in sizes.values())
    true_surv = len(h) - sum(n - 1 for n in sizes.values())
    ok = n_ver == true_pairs and n_surv == true_surv
    print(f"GROUND TRUTH pairs={true_pairs} survivors={true_surv} "
          f"MATCH={ok}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    if "--build" in sys.argv or not os.path.exists(os.path.join(ROOT, "_DONE")):
        build_corpus()
    rc = main("--planted" in sys.argv)
    ray.shutdown()
    sys.exit(rc)
