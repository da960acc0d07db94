"""Scale proofs for the round-4 additions that have non-trivial
distributed shapes:

* ``--snm``: sorted-neighborhood blocking at 2M rows — the pair set must
  EXACTLY equal a single-process pandas replay of the windowed self-join
  over the global (key, id) order (ghost rows across thousands of
  rank-group boundaries are load-bearing at this size).
* ``--kcore``: k-core peeling at ~2M edges / 200k nodes — core node set
  + degrees must EXACTLY equal a sequential peeling reference.

Usage: PYTHONPATH=/root/repo python tools/stress_r4_ops.py [--snm] [--kcore]
"""
import sys
import time

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def stress_snm() -> None:
    from borges_ray.ops.dedup import sorted_neighborhood_pairs_ds

    n = 2_000_000
    rng = np.random.default_rng(7)
    # keys from a skewed alphabet so prefix groups vary 100x in size
    letters = np.array(list("aabbbcdefgh"))
    keys = rng.choice(letters, size=(n, 6))
    keys = np.array(["".join(r) for r in keys])
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "key": keys})

    t0 = time.time()
    ds = rd.from_pandas(df.sample(frac=1.0, random_state=3)).repartition(64)
    out = sorted_neighborhood_pairs_ds(ds, "id", "key", window=5,
                                       verify_prefix=4).to_pandas()
    wall = time.time() - t0

    t1 = time.time()
    s = df.sort_values(["key", "id"], kind="mergesort").reset_index(drop=True)
    ids = s["id"].to_numpy()
    pfx = s["key"].str.slice(0, 4).to_numpy()
    want = set()
    for g in range(1, 6):
        ok = pfx[:-g] == pfx[g:]
        want.update(zip(ids[:-g][ok].tolist(), ids[g:][ok].tolist(),
                        [g] * int(ok.sum())))
    ref_wall = time.time() - t1

    got = set(zip(out["id_a"].tolist(), out["id_b"].tolist(),
                  out["gap"].tolist()))
    assert got == want, (len(got), len(want))
    print(f"snm 2M rows: pairs={len(got)} wall={wall:.1f}s "
          f"(single-process ref {ref_wall:.1f}s) EXACT")


def stress_kcore() -> None:
    from borges_ray.ops.graph import kcore

    n_nodes, n_edges = 200_000, 2_000_000
    rng = np.random.default_rng(11)
    # power-lawish: preferential endpoints via squared-uniform skew
    u = (rng.random(n_edges) ** 2 * n_nodes).astype(np.int64)
    v = (rng.random(n_edges) ** 2 * n_nodes).astype(np.int64)
    df = pd.DataFrame({"src": u, "dst": v})

    t0 = time.time()
    out = kcore(rd.from_pandas(df).repartition(64), k=8,
                max_rounds=40).to_pandas()
    wall = time.time() - t0

    t1 = time.time()
    e = df[df["src"] != df["dst"]]
    lo = np.minimum(e["src"], e["dst"])
    hi = np.maximum(e["src"], e["dst"])
    und = pd.DataFrame({"u": lo, "v": hi}).drop_duplicates()
    cur = und
    while True:
        deg = pd.concat([cur["u"], cur["v"]]).value_counts()
        dead = set(deg[deg < 8].index)
        if not dead:
            break
        cur = cur[~cur["u"].isin(dead) & ~cur["v"].isin(dead)]
    deg = pd.concat([cur["u"], cur["v"]]).value_counts().sort_index()
    ref_wall = time.time() - t1

    got = dict(zip(out["node"], out["deg"]))
    want = {int(k): int(c) for k, c in deg.items()}
    assert got == want, (len(got), len(want))
    print(f"kcore 2M edges: core_nodes={len(got)} wall={wall:.1f}s "
          f"(single-process ref {ref_wall:.1f}s) EXACT")


if __name__ == "__main__":
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    if "--snm" in sys.argv or len(sys.argv) == 1:
        stress_snm()
    if "--kcore" in sys.argv or len(sys.argv) == 1:
        stress_kcore()
    ray.shutdown()
