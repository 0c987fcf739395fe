"""rendler_ray — a Ray-Data-native crawl-and-render data engine.

A from-scratch reimplementation of the capabilities of the public
``mesosphere/RENDLER`` demo (a Mesos crawl+render framework; see SURVEY.md)
re-expressed Ray-Data-first: ``ray.data.Dataset`` pipelines over zero-copy
Arrow batches, actor pools for stateful stages (URL-seen shards, synthetic
web shards, politeness), explicit host-hash partitioning of the frontier,
and bounded deterministic BFS rounds instead of the reference's async
message loop (SURVEY.md §3.4).

Subpackages:
  sources/    synthetic closed-world web generator, storage seam
  state/      seen-set shard actors (exact + cuckoo), politeness
  stages/     fetch / link-extract / render batch stages
  pipelines/  the crawl round loop, dot export, queries registry
  functions/  scalar/batch kernels: canonicalize, text, ann, media

Library code never calls ``ray.init``/``ray.shutdown`` (driver contract).
"""

__version__ = "0.1.0"
