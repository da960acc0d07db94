"""General-purpose Ray Data operators re-expressing the reference's operator
inventory (SURVEY.md §2) plus the large-scale training-data operations
(dedup family, similarity search, text analysis, multimodal plumbing).

Modules:

- :mod:`borges_ray.ops.relational` — scan/filter/project/groupby/topk/
  distinct/joins/explode/window (SURVEY.md §2.1-2.10)
- :mod:`borges_ray.ops.textops`    — token counting, quality scoring,
  language-ID, document fingerprinting
- :mod:`borges_ray.ops.dedup`      — exact dedup, MinHash+LSH, SimHash,
  n-gram Jaccard near-dup
- :mod:`borges_ray.ops.embed`      — brute-force / LSH-bucketed cosine
  similarity search and embedding near-dup
- :mod:`borges_ray.ops.multimodal` — binary-payload (image/audio) decode
  plumbing with stubbed codecs
- :mod:`borges_ray.ops.lm`         — bigram-LM perplexity (CCNet-style
  quality scoring) and DSIR hashed-bucket importance weights
- :mod:`borges_ray.ops.ccnet`      — paragraph-level corpus-global dedup,
  repetition metrics, train/eval decontamination
- :mod:`borges_ray.ops.sketch`     — HyperLogLog / count-min sketches
- :mod:`borges_ray.ops.pack`       — token-budget shard + sequence packing
- :mod:`borges_ray.ops.index`      — hive-partitioned inverted token index,
  pruned conjunctive search, BM25
- :mod:`borges_ray.ops.graph`      — partitioned-edge PageRank, HITS,
  anchor-text aggregation, pointer-doubling redirect resolution
- :mod:`borges_ray.ops.sched`      — crawl-budget apportionment and
  recrawl planning
"""
