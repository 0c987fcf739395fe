"""Cross-run crawl diffing: structural comparison of two crawl snapshots.

The incremental re-crawl (``crawl.py`` ``recrawl_prior_dir``) answers
"which pages changed?" page-by-page at fetch time; this module answers
the at-rest question between two completed runs — what happened to the
GRAPH and the PAGE SET between snapshot A and snapshot B:

  * ``edge_diff``  — edges present in exactly one run ("added" /
    "removed"), computed as ONE union-groupby shuffle over per-batch
    deduped (src, dst) pairs. Min/Max over a side tag classifies
    presence without requiring global per-side dedup first, so the
    pass is retry/batch-order independent and never collects edges.
  * ``page_diff``  — per-URL content comparison: 200-fetched pages keyed
    by exact content fingerprint (same md5-over-text-spans the crawl's
    content-dedup uses), FULL OUTER hash join on url → "added" /
    "removed" / "changed". The join carries one (url, fp) row per page,
    not the span payloads.

Scale posture: both diffs stream; driver state is O(1). At the 10^10-URL
design point the edge diff is a single all-to-all on (src, dst) — the
same exchange any structural comparison needs at minimum — and the page
diff joins two url-keyed tables that are each ~the seen-set size class.

Reference parity: mesosphere/RENDLER has no re-crawl story (one-shot
demo; SURVEY.md §2.7) — this is part of the beyond-reference
training-data surface, conformance-tested against refsim crawls of the
two corpus snapshots.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Max, Min

from rendler_ray.pipelines.crawl import _content_fp_batch
from rendler_ray.state.politeness import _nonempty_blocks

_SIDE_A, _SIDE_B = 1, 2


def _tag_edges(side: int):
    def fn(t: pa.Table) -> pa.Table:
        # per-batch dedup: the shuffle moves unique pairs, not links
        pairs = t.select(["src", "dst"]).group_by(["src", "dst"]).aggregate([])
        return pairs.append_column(
            "side", pa.array([side] * len(pairs), pa.int8()))
    return fn


def edge_diff(edges_a, edges_b):
    """Structural (src, dst) edge-set diff of two crawls.

    Returns a Dataset with columns (change: "added"|"removed", src, dst).
    Edges in both runs are dropped. min(side)==max(side) identifies
    one-sided pairs even when the same edge appears in many batches of
    one run (dedup-safe without a per-side distinct pass).
    """
    tagged = (edges_a.select_columns(["src", "dst"])
              .map_batches(_tag_edges(_SIDE_A), batch_format="pyarrow")
              .union(edges_b.select_columns(["src", "dst"])
                     .map_batches(_tag_edges(_SIDE_B),
                                  batch_format="pyarrow")))
    agg = (tagged.groupby(["src", "dst"])
           .aggregate(Min("side", alias_name="smin"),
                      Max("side", alias_name="smax")))

    def classify(t: pa.Table) -> pa.Table:
        smin = t["smin"]
        one_sided = pc.equal(smin, t["smax"])
        t = t.filter(one_sided)
        change = pc.if_else(pc.equal(t["smin"], _SIDE_A),
                            pa.scalar("removed"), pa.scalar("added"))
        return pa.table({"change": change, "src": t["src"],
                         "dst": t["dst"]})

    return agg.map_batches(classify, batch_format="pyarrow")


def _url_fp(fetched):
    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["status"], 200))
        t = _content_fp_batch(t)
        return pa.table({"url": t["url"], "fp": t["fingerprint"]})
    return fetched.select_columns(["url", "status", "spans"]).map_batches(
        fn, batch_format="pyarrow")


def page_diff(fetched_a, fetched_b, num_partitions: int = 8):
    """Per-URL content diff of two crawls' fetched tables.

    Returns (change: "added"|"removed"|"changed", url). "added" = 200 in
    B only, "removed" = 200 in A only (dropped pages fetch as 404 or
    become unreachable), "changed" = 200 in both with different content
    fingerprints. Unchanged pages are dropped.
    """
    a = _url_fp(fetched_a)
    b = _url_fp(fetched_b).map_batches(
        lambda t: pa.table({"url_b": t["url"], "fp_b": t["fp"]}),
        batch_format="pyarrow")
    joined = a.join(b, join_type="full_outer",
                    num_partitions=num_partitions,
                    on=("url",), right_on=("url_b",))
    joined = _nonempty_blocks(joined.materialize())
    if joined is None:
        return pa.table({"change": pa.array([], pa.string()),
                         "url": pa.array([], pa.string())})

    def classify(t: pa.Table) -> pa.Table:
        # Ray's outer join emits ONE coalesced key column (left name)
        fp_a, fp_b = t["fp"], t["fp_b"]
        change = pc.if_else(
            pc.is_null(fp_a), pa.scalar("added"),
            pc.if_else(pc.is_null(fp_b), pa.scalar("removed"),
                       pa.scalar("changed")))
        keep = pc.or_kleene(pc.is_null(fp_a), pc.or_kleene(
            pc.is_null(fp_b), pc.not_equal(fp_a, fp_b)))
        return pa.table({"change": change, "url": t["url"]}).filter(keep)

    return joined.map_batches(classify, batch_format="pyarrow")
