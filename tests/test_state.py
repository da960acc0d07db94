"""Unit tests for the state layer: Bloom filter, seen shards, checkpoints."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from borges_ray.state.bloom import BloomFilter
from borges_ray.state import checkpoint as ckpt


def test_bloom_no_false_negatives_and_low_fp():
    bf = BloomFilter(capacity=10_000, fp_rate=0.01)
    keys = [f"http://h{i}.example/p/{i}" for i in range(5000)]
    bf.add_batch(keys)
    assert bf.maybe_contains_batch(keys).all()          # no false negatives
    other = [f"http://other{i}.example/x" for i in range(5000)]
    fp = bf.maybe_contains_batch(other).mean()
    assert fp < 0.03                                     # ~1% target


def test_bloom_empty_and_determinism():
    bf1, bf2 = BloomFilter(1000), BloomFilter(1000)
    assert bf1.maybe_contains_batch([]).shape == (0,)
    bf1.add_batch(["a", "b"]); bf2.add_batch(["a", "b"])
    assert (bf1.bits == bf2.bits).all()


def test_cuckoo_membership_delete_and_determinism():
    from borges_ray.state.cuckoo import CuckooFilter

    cf = CuckooFilter(capacity=10_000)
    keys = [f"http://h{i}.example/p/{i}" for i in range(5000)]
    cf.add_batch(keys)
    assert cf.contains_batch(keys).all()                 # no false negatives
    other = [f"http://other{i}.example/x" for i in range(5000)]
    assert cf.contains_batch(other).mean() < 0.005       # ~0.012% design rate

    # deletion: removed keys become definitely-absent, others unaffected
    gone, kept = keys[:2500], keys[2500:]
    assert cf.delete_batch(gone).all()
    assert not cf.contains_batch(gone).any()
    assert cf.contains_batch(kept).all()
    assert cf.count == len(kept)

    # determinism: same op sequence → identical table (resume rebuild)
    cf2 = CuckooFilter(capacity=10_000)
    cf2.add_batch(keys)
    cf2.delete_batch(gone)
    assert (cf.table == cf2.table).all()


def test_cuckoo_over_capacity_raises():
    from borges_ray.state.cuckoo import CuckooFilter

    cf = CuckooFilter(capacity=1024)  # 1024-min floor → 512 buckets × 4
    with pytest.raises(RuntimeError):
        cf.add_batch([f"k{i}" for i in range(4096)])


@pytest.mark.parametrize("kind", ["bloom", "cuckoo"])
def test_seen_shards_invalidate_readmits(ray_session, kind):
    """Recrawl invalidation: forgotten URLs come back as NEW on the next
    round, untouched URLs stay seen — under either filter backend (cuckoo
    additionally deletes the fingerprint; Bloom just goes stale on the
    fast path, membership truth being the exact set either way)."""
    from borges_ray.state.urlseen import (
        create_seen_index, seen_check_and_add, seen_invalidate)

    shards = create_seen_index(2, 10_000, filter_kind=kind)
    urls = [f"http://h.example/{i}" for i in range(50)]
    assert seen_check_and_add(shards, urls, 1).all()
    stale = urls[::5]
    assert seen_invalidate(shards, stale) == len(stale)
    assert seen_invalidate(shards, stale) == 0           # idempotent
    m = seen_check_and_add(shards, urls, 2)
    assert m.sum() == len(stale)
    assert all(m[i] == (i % 5 == 0) for i in range(50))
    # re-admitted URLs are seen again afterwards
    assert not seen_check_and_add(shards, stale, 3).any()


def test_seen_shards_exactly_once(ray_session):
    from borges_ray.state.urlseen import create_seen_index, seen_check_and_add

    shards = create_seen_index(2, 10_000)
    urls = [f"http://h.example/{i}" for i in range(100)]
    m1 = seen_check_and_add(shards, urls, 1)
    assert m1.all()                                      # all new first time
    m2 = seen_check_and_add(shards, urls + ["http://h.example/new"], 2)
    assert m2[:-1].sum() == 0 and m2[-1]                 # only the new one
    # idempotent retry: same round re-observes its own additions as new
    m3 = seen_check_and_add(shards, ["http://h.example/new"], 2)
    assert m3.tolist() == [True]
    m4 = seen_check_and_add(shards, ["http://h.example/new"], 3)
    assert m4.tolist() == [False]


def test_seen_shards_resume_load(ray_session):
    from borges_ray.state.urlseen import create_seen_index, seen_check_and_add
    import ray

    from borges_ray.canonical import stable_hash

    shards = create_seen_index(2, 10_000)
    preloaded = ["http://a.example/", "http://b.example/"]
    for u in preloaded:  # resume path routes by the same hash as check_and_add
        ray.get(shards[stable_hash(u) % 2].load_keys.remote([u]))
    m = seen_check_and_add(shards, preloaded + ["http://c.example/"], 0)
    assert m.tolist() == [False, False, True]


def test_checkpoint_commit_and_resume(tmp_path):
    d = str(tmp_path / "ck")
    t = pa.table({"x": pa.array([1, 2, 3])})
    for r in range(3):
        os.makedirs(ckpt.round_dir(d, r), exist_ok=True)
        ckpt.write_table(d, r, "crawled", t)
        ckpt.commit_round(d, r)
    # round 3 exists but uncommitted
    os.makedirs(ckpt.round_dir(d, 3), exist_ok=True)
    ckpt.write_table(d, 3, "crawled", t)
    assert ckpt.last_committed_round(d) == 2
    ckpt.clean_uncommitted(d)
    assert not os.path.isdir(ckpt.round_dir(d, 3))
    all_t = ckpt.read_all_rounds(d, "crawled", 2)
    assert all_t.num_rows == 9


def test_checkpoint_gap_invalidates_tail(tmp_path):
    d = str(tmp_path / "ck2")
    t = pa.table({"x": pa.array([1])})
    for r in (0, 1, 2):
        os.makedirs(ckpt.round_dir(d, r), exist_ok=True)
        ckpt.write_table(d, r, "m", t)
        if r != 1:
            ckpt.commit_round(d, r)
    assert ckpt.last_committed_round(d) == 0     # gap at 1 → 2 doesn't count


def test_write_table_atomic_overwrite(tmp_path):
    d = str(tmp_path / "ck3")
    os.makedirs(ckpt.round_dir(d, 0), exist_ok=True)
    ckpt.write_table(d, 0, "m", pa.table({"x": pa.array([1])}))
    ckpt.write_table(d, 0, "m", pa.table({"x": pa.array([7, 8])}))  # idempotent replay
    assert ckpt.read_table(d, 0, "m")["x"].to_pylist() == [7, 8]
