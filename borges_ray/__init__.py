"""borges_ray — a Ray-Data-native URL-frontier + fetch-scheduler engine.

A from-scratch reimplementation of the data-processing capabilities of
kevcruse96/Borges (a Scrapy + MongoDB scientific-publisher scraper) as one
coherent Ray Data engine:

- ``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
  batches for every per-record transform (canonicalize, fetch, extract,
  language-tag, parse).
- Actor pools for stateful stages (politeness token buckets, Bloom URL-seen
  shards, fetch sessions).
- Explicit groupby / join / repartition for the wide steps (dedup, fetch-join,
  per-host politeness), with documented partitioning keys and skew handling.
- Immutable per-round Parquet checkpoints with ``_COMMITTED`` markers for
  exact resume (the reference's Mongo crawl-flag resume, done as tables).

Package layout (see SURVEY.md §7):

- :mod:`borges_ray.schemas`    — declared pyarrow schemas for every table
- :mod:`borges_ray.canonical`  — URL canonicalization, host extraction, stable hash partitioner
- :mod:`borges_ray.extract`    — HTML→text extraction + link extraction + CJK language tagging
- :mod:`borges_ray.synth`      — deterministic synthetic web generator (pages/seeds/robots)
- :mod:`borges_ray.state`      — URL-seen Bloom filter, checkpoint layout
- :mod:`borges_ray.stages`     — Ray Data stages (fetch, extract, politeness, dedup)
- :mod:`borges_ray.pipelines`  — the BSP crawl-round driver loop
- :mod:`borges_ray.ops`        — general relational + training-data operators
  (groupby/join/topk/dedup/minhash/simhash/ANN/text-analysis) used by
  ``__ray_entry__.queries()``
"""

__version__ = "0.1.0"

import logging as _logging


class _BenignEmptySortBlockFilter(_logging.Filter):
    """Drop Ray's "RefBundle with a different schema … names=[]" warning.

    Ray's ``sort`` (AllToAllOperator) emits an UNTYPED empty block for every
    empty range partition — unavoidable from user code when the key space is
    small (e.g. 5 distinct segments range-partitioned into more blocks than
    keys).  The empty block carries no rows, is never handed to a UDF, and is
    dropped on materialization, so the warning is noise for this engine's
    bucketed-groupby shape.  Only the ``names=[]`` (schema-less empty block)
    variant is filtered; real schema mismatches still surface."""

    def filter(self, record: _logging.LogRecord) -> bool:
        msg = record.getMessage()
        if "RefBundle with a different schema" not in msg:
            return True
        # schema-less empty block: printed as "names=[], types=[]" or as a
        # bare "new schema: ." when the block metadata carries None
        return not ("names=[], types=[]" in msg or "new schema: ." in msg)


_logging.getLogger("ray.data._internal.execution.streaming_executor_state").addFilter(
    _BenignEmptySortBlockFilter()
)


def _disable_tensor_extension_casting() -> None:
    """Opt out of Ray Data's automatic tensor-extension casting.

    This engine's list-typed columns (token lists, author lists, float32
    embeddings) are plain Arrow ``list<T>`` payloads, not tensors.  Ray
    2.49's auto-cast turns pandas-origin ndarray cells into its tensor
    extension type, which (a) embeds pandas metadata on parquet write that
    ``to_pandas`` cannot parse back ("numpy.ndarray(shape=…)" dtype
    strings) and (b) raises on ragged object-ndarray columns read back
    from parquet (e.g. ``list<string>`` author lists with nulls).  With
    casting off, such columns stay plain lists/object arrays end-to-end.
    Set at import so driver AND workers (which also import this package
    for UDFs) agree."""
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_tensor_extension_casting = False
    except Exception:  # pragma: no cover — ray absent or API moved
        pass


_disable_tensor_extension_casting()
