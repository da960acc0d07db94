"""Ray Data stages of the crawl engine (politeness, fetch, parse, links),
plus the formal extension surface (SURVEY.md §2.11).

The reference extends per-publisher by subclassing ``scrapy.Spider`` and
overriding ``parse`` callbacks; this engine's equivalent unit of extension
is a **PipelineStep**: any callable ``Dataset → Dataset``.  Every stage in
:mod:`borges_ray.stages` and every operator in :mod:`borges_ray.ops`
satisfies the protocol (usually as a ``functools.partial`` or a closure over
its config), and :func:`compose` chains them into a pipeline — the
spider-middleware-chain analogue, but lazy and shuffle-aware.
"""

from __future__ import annotations

from typing import Callable, Protocol, runtime_checkable

import ray.data as rd


@runtime_checkable
class PipelineStep(Protocol):
    """A composable pipeline stage: ``Dataset → Dataset``.

    Contract (what the engine's own stages guarantee and extensions must
    preserve):

    - **lazy**: build the plan, never trigger execution (no ``take``/
      ``to_pandas``/``materialize`` on unbounded inputs);
    - **deterministic**: same input rows → same output rows, independent of
      partitioning and parallelism (vectorized kernels, stable hashes, no
      wall clock);
    - **schema-honest**: emit typed columns even for empty inputs.
    """

    def __call__(self, ds: rd.Dataset) -> rd.Dataset:  # pragma: no cover
        ...


def compose(*steps: Callable[[rd.Dataset], rd.Dataset]) -> Callable[[rd.Dataset], rd.Dataset]:
    """Chain PipelineSteps left-to-right into one step.

    ``compose(extract, lang_tag, quality)(ds)`` ≡
    ``quality(lang_tag(extract(ds)))`` — the reference's spider middleware
    chain (``Borges/settings.py`` DOWNLOADER_MIDDLEWARES ordering) as plain
    function composition over lazy Datasets."""

    def chained(ds: rd.Dataset) -> rd.Dataset:
        for step in steps:
            ds = step(ds)
        return ds

    return chained
