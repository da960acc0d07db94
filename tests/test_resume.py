"""Resume exactness (SURVEY.md §5 item 4): a crawl killed mid-run and
resumed produces byte-identical final tables to an uninterrupted run."""

from __future__ import annotations

import os
import shutil

import pytest

from borges_ray.pipelines.crawl import EngineConfig, collect_crawled, collect_seen, run_crawl
from borges_ray.stages.fetch import write_pages_bucketed
from borges_ray.state import checkpoint as ckpt
from borges_ray.synth import synth_pages, synth_robots, synth_seeds

N_PAGES = 300
SEED = 42
CFG = dict(max_rounds=4, num_partitions=8, num_buckets=4, num_seen_shards=2)


@pytest.fixture(scope="module")
def web(tmp_path_factory):
    root = tmp_path_factory.mktemp("rweb")
    pages_root = str(root / "pages")
    pages = synth_pages(SEED, N_PAGES)
    write_pages_bucketed(pages.select(["url", "html"]), pages_root, num_buckets=4)
    return pages_root, synth_seeds(SEED, N_PAGES), synth_robots(SEED, N_PAGES).to_pandas(), str(root)


def _tables(ckpt_dir):
    crawled = collect_crawled(ckpt_dir).to_pandas().sort_values("url").reset_index(drop=True)
    seen = collect_seen(ckpt_dir).to_pandas().sort_values("url").reset_index(drop=True)
    return crawled, seen


def test_resume_equals_uninterrupted(web, ray_session):
    pages_root, seeds, robots, root = web

    full_dir = os.path.join(root, "full")
    run_crawl(pages_root, seeds, robots, EngineConfig(**CFG), full_dir, resume=False)

    # interrupted run: stop after 2 rounds, then resume to the end
    part_dir = os.path.join(root, "part")
    run_crawl(pages_root, seeds, robots, EngineConfig(**{**CFG, "max_rounds": 2}), part_dir, resume=False)
    run_crawl(pages_root, seeds, robots, EngineConfig(**CFG), part_dir, resume=True)

    fc, fs = _tables(full_dir)
    pc_, ps = _tables(part_dir)
    assert fc.equals(pc_)
    assert fs.equals(ps)


def test_resume_replays_uncommitted_round(web, ray_session):
    pages_root, seeds, robots, root = web

    full_dir = os.path.join(root, "full")  # built by previous test (module scope)
    if ckpt.last_committed_round(full_dir) < 0:
        run_crawl(pages_root, seeds, robots, EngineConfig(**CFG), full_dir, resume=False)

    # simulate a mid-round crash: copy, strip the last round's commit marker
    # and half-delete its contents
    crash_dir = os.path.join(root, "crash")
    if os.path.isdir(crash_dir):
        shutil.rmtree(crash_dir)
    shutil.copytree(full_dir, crash_dir)
    last = ckpt.last_committed_round(crash_dir)
    rd = ckpt.round_dir(crash_dir, last)
    os.remove(os.path.join(rd, "_COMMITTED"))
    shutil.rmtree(os.path.join(rd, "seen_delta"))  # partial write

    run_crawl(pages_root, seeds, robots, EngineConfig(**CFG), crash_dir, resume=True)

    fc, fs = _tables(full_dir)
    cc, cs = _tables(crash_dir)
    assert fc.equals(cc)
    assert fs.equals(cs)
