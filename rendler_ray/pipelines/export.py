"""Dot-graph export: the reference's shutdown artifact
(``python/export_dot.py::dot``; SURVEY.md §2.1 S5).

Reference semantics: one Graphviz node per RENDERED url (the node label
is the render thumbnail), one edge per crawl edge whose BOTH endpoints
are rendered (node labels need images — SURVEY.md §2.4 J1), duplicate
(src, dst) pairs collapsed (§2.5 A1 set semantics). The writer here is
byte-stable: nodes and edges are emitted in sorted order, so a fixed
crawl produces a golden-comparable file.

The endpoint filter is a semi-join of edges against the rendered-node
set. After a bounded crawl the rendered set is the small side, so it is
broadcast (``ray.put`` once, read per batch) rather than shuffled; at
unbounded scale swap in ``edges.join(renders.select_columns(["doc_id"]))``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray


def _quote_arr(arr) -> pa.Array:
    """Vectorized dot-quoting: backslash-escape, wrap in quotes."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    q = pc.replace_substring(arr, pattern="\\", replacement="\\\\")
    q = pc.replace_substring(q, pattern='"', replacement='\\"')
    return pc.binary_join_element_wise('"', q, '"', "")


def dot_from_tables(edges: pa.Table, renders: pa.Table) -> str:
    """Emit the dot text from (already endpoint-filtered) edges + the
    rendered-node table — all Arrow kernels (distinct, sort, escape,
    line assembly); no per-row Python until the final join of emitted
    lines (O(artifact), not O(crawl))."""
    nodes = (renders.select(["doc_id", "media_ref"])
             .group_by("doc_id").aggregate([("media_ref", "min")])
             .sort_by("doc_id"))
    ids_q = _quote_arr(nodes["doc_id"])
    refs_q = _quote_arr(nodes["media_ref_min"])
    node_lines = pc.binary_join_element_wise(
        "  ", ids_q, " [label=", ids_q, " image=", refs_q, "];", "")
    rset = nodes["doc_id"].combine_chunks()
    both = pc.and_(pc.is_in(edges["src"], value_set=rset),
                   pc.is_in(edges["dst"], value_set=rset))
    uniq = (edges.select(["src", "dst"]).filter(both)
            .group_by(["src", "dst"]).aggregate([])
            .sort_by([("src", "ascending"), ("dst", "ascending")]))
    edge_lines = pc.binary_join_element_wise(
        "  ", _quote_arr(uniq["src"]), " -> ", _quote_arr(uniq["dst"]),
        ";", "")
    lines = (["digraph G {", "  node [shape=box];"]
             + node_lines.to_pylist() + edge_lines.to_pylist() + ["}"])
    return "\n".join(lines) + "\n"


def export_dot(edges_ds: "ray.data.Dataset", renders_ds: "ray.data.Dataset",
               path: str | None = None) -> str:
    """Distributed prep, driver-side emit (the dot file itself is a small
    artifact). Broadcast semi-join: rendered set shipped once."""
    node_tbl = pa.concat_tables(
        renders_ds.select_columns(["doc_id", "media_ref"]).iter_batches(
            batch_size=None, batch_format="pyarrow"
        ),
        promote_options="default",
    ) if renders_ds.count() else pa.table({"doc_id": pa.array([], pa.string()),
                                           "media_ref": pa.array([], pa.string())})
    rendered_ref = ray.put(node_tbl["doc_id"].combine_chunks())

    def keep_rendered(t: pa.Table) -> pa.Table:
        rset = ray.get(rendered_ref)  # Arrow string array (zero-copy)
        mask = pc.and_(pc.is_in(t["src"], value_set=rset),
                       pc.is_in(t["dst"], value_set=rset))
        # per-batch distinct: the driver sees at most the unique pairs
        return (t.select(["src", "dst"]).filter(mask)
                .group_by(["src", "dst"]).aggregate([]))

    edge_parts = list(
        edges_ds.map_batches(keep_rendered, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    edge_tbl = (pa.concat_tables(edge_parts, promote_options="default")
                if edge_parts else pa.table({"src": pa.array([], pa.string()),
                                             "dst": pa.array([], pa.string())}))
    out = dot_from_tables(edge_tbl, node_tbl)
    if path:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(out)
        import os

        os.replace(tmp, path)
    return out
