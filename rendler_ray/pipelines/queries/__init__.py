"""The ``queries()`` / ``oracle_sql()`` registry, split by family.

Round 5 split the former 21k-line ``queries.py`` into per-family part
files (each <3k lines) for maintainability:

- ``_p01_relational``          shared helpers + relational / window ops
- ``_p02_trainingdata``        training-data ops (dedup, filters, sampling)
- ``_p03_dupspans_filters``    dup-span removal, chunking, quality filters
- ``_p04_containment_retrieval`` containment pairs, RRF/BM25/bitext retrieval
- ``_p05_sources_embeddings``  per-source stats, embeddings, vocab, layout
- ``_p06_lakehouse_cdc``       MERGE/CDC, SCD2, zone maps, eval metrics
- ``_p07_analytics_graph``     RFM, BFS, pHash, anomaly, kNN-outlier, walks
- ``_p08_audits_stats``        audits (k-anon, Benford), sweeps, divisions
- ``_p09_graph_search_ts``     Kendall/percentiles, PIT join, wildcard, MST
- ``_p10_timeseries_er``       KMV algebra, ANOVA, seasonal, ER blocking
- ``_p11_round5``              round-5 families (part margins, privacy,
                               partition quality, mixing, CKA, …)
- ``_registry``                the QUERIES / ORACLES dicts + driver window

The parts are assembled into ONE shared module namespace (this
package's ``globals()``) rather than imported as independent modules,
ON PURPOSE: the registry relies on runtime-rebound module globals —
tests monkeypatch gate constants via ``setattr(Q, "_VERIFY_DRIVER_MAX",
...)`` and the checkpoint root is rebound via ``global _CKPT_ROOT`` —
and a real import graph would freeze each reader's binding at import
time (the classic stale-alias bug). Executing the parts in order into
one namespace preserves the exact semantics of the former single file
(call-time name resolution, shared gates, pickling by reference via
``getattr`` on this package) while keeping each source file small.
Part files are compiled with their own filenames, so tracebacks and
``file:line`` references point into the part files.

Public contract unchanged: ``from rendler_ray.pipelines.queries import
QUERIES, ORACLES`` (names and semantics identical to round 4).

Never calls ray.init/shutdown (driver contract).
"""

import os as _os
import __future__ as _future

_PARTS = [
    "_p01_relational",
    "_p02_trainingdata",
    "_p03_dupspans_filters",
    "_p04_containment_retrieval",
    "_p05_sources_embeddings",
    "_p06_lakehouse_cdc",
    "_p07_analytics_graph",
    "_p08_audits_stats",
    "_p09_graph_search_ts",
    "_p10_timeseries_er",
    "_p11_round5",
    "_registry",
]

_dir = _os.path.dirname(__file__)
for _part in _PARTS:
    _fn = _os.path.join(_dir, _part + ".py")
    with open(_fn, "r", encoding="utf-8") as _f:
        _src = _f.read()
    # each part keeps postponed annotation evaluation (the old file's
    # `from __future__ import annotations`) via the compile flag
    exec(compile(_src, _fn, "exec",
                 flags=_future.annotations.compiler_flag,
                 dont_inherit=True), globals())
del _os, _future, _dir, _part, _fn, _f, _src
