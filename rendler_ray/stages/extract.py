"""Link extraction: the reference's HTML href scrape + urljoin
(``python/crawl_executor.py``; SURVEY.md §2.2 M1–M3), vectorized over
Arrow batches of interleaved docs.

Semantics that are load-bearing for conformance:
  * links are extracted in PAGE ORDER — text spans in offset order, and
    within a span, left-to-right regex match order (the reference appends
    links to its queues in page order; SURVEY.md §2.2 M1);
  * relative hrefs resolve against the page URL (M2);
  * ``ord`` records the link's position in the page — it is part of the
    crawl-order sort key (depth, src_seq, ord).

Implementation: ``pc.list_flatten`` + ``list_parent_indices`` to get all
spans columnar; a single compiled GROUPLESS regex ``findall`` over the
text spans (one string per match, no tuple unpacking), then pandas
``explode`` + vectorized string kernels for the href strip / relative
resolve, and pure-numpy group arithmetic for ``ord``. No Python
per-match loop anywhere — the old one dominated crawl wall time at
~24M links.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# href="..." (generic HTML), absolute synthetic URL, host-relative path.
# Alternation order matters: the absolute form must win over the bare
# "/pNNNNN" suffix it contains. NO capture groups: findall returns the
# full match string, keeping the hot path tuple-free.
LINK_RE = re.compile(r'href="[^"]+"|\bs://h\d+/p\d+|/p\d+')

EDGE_FIELDS = [
    ("src", pa.string()),
    ("dst", pa.string()),
    ("ord", pa.int32()),
    ("src_seq", pa.int64()),
    ("depth", pa.int32()),
]

_EMPTY_EDGES = pa.table(
    {name: pa.array([], type=typ) for name, typ in EDGE_FIELDS}
)


def _resolve(href: str, host: str) -> str:
    """Scalar reference-parity resolve (used by refsim/tests)."""
    if "://" in href:
        return href
    if href.startswith("/"):
        return f"s://{host}{href}"
    return href


# whole-token link forms for the Arrow/RE2 fast path (see extract_edges)
_TOKEN_LINK_RE = r'^(?:s://h\d+/p\d+|/p\d+|href="[^"]+")$'


def _extract_token_fast(ttexts: pa.Array, t_par: np.ndarray,
                        hosts: np.ndarray):
    """All-Arrow extraction for token-delimited corpora: split on spaces
    (C++), whole-token RE2 match (C++), resolve via if_else/join (C++).
    Byte-identical to the regex path whenever every link occurs as a
    whitespace-delimited token (true of the synthetic web and of
    whitespace-tokenized text corpora generally)."""
    toks = pc.split_pattern(ttexts, " ")
    ftoks = pc.list_flatten(toks)
    par2 = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    mlink = pc.match_substring_regex(ftoks, _TOKEN_LINK_RE)
    sel = np.flatnonzero(mlink.to_numpy(zero_copy_only=False))
    if len(sel) == 0:
        return None, None
    hrefs = ftoks.take(pa.array(sel))
    rows = t_par[par2[sel]]
    is_rel = pc.starts_with(hrefs, "/")
    resolved = pc.if_else(
        is_rel,
        pc.binary_join_element_wise(
            "s://", pa.array(hosts[rows], pa.string()), hrefs, ""),
        hrefs)
    return resolved, rows


def extract_edges(batch: pa.Table) -> pa.Table:
    """Fetch batch (url, host, depth, seq, status, spans) → edges batch
    (src, dst, ord, src_seq, depth). 404 rows produce no edges."""
    if batch.num_rows == 0:
        return _EMPTY_EDGES
    spans = batch["spans"].combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    kinds = flat.field("kind").to_numpy(zero_copy_only=False)
    # redirect spans carry the absolute Location URL, canonical spans
    # the rel=canonical target: both extract through the link kernels
    tmask = (kinds == "text") | (kinds == "redirect") | (kinds == "canonical")
    t_par = parents[tmask]
    ttexts = flat.field("text").filter(pa.array(tmask))
    hosts = batch["host"].to_numpy(zero_copy_only=False)

    # fast path: no generic href="..." form present (those can contain
    # spaces), AND — verified, not assumed — the whole-token matches
    # account for EVERY substring match (an RE2 count over the same
    # pattern): links embedded inside larger tokens force the general
    # path, so the two paths can never silently diverge.
    has_href = bool(pc.any(
        pc.match_substring(ttexts, 'href="')).as_py() or False)
    if not has_href:
        n_sub = pc.sum(
            pc.count_substring_regex(ttexts, LINK_RE.pattern)).as_py() or 0
        resolved_arr, rows = _extract_token_fast(ttexts, t_par, hosts)
        n_tok = 0 if resolved_arr is None else len(rows)
        if n_tok == n_sub:
            if resolved_arr is None:
                return _EMPTY_EDGES
            return _assemble_edges(batch, resolved_arr, rows)
        # embedded/adjacent link forms present: general regex path below

    texts = ttexts.to_numpy(zero_copy_only=False)
    found = pd.Series(texts, dtype=object).str.findall(LINK_RE)

    ex = found.explode().dropna()
    total = len(ex)
    if total == 0:
        return _EMPTY_EDGES
    # doc row per match; ascending because spans flatten doc-major and
    # matches are in-span left-to-right — i.e. page order
    rows = t_par[ex.index.to_numpy(np.int64)]

    h = ex.reset_index(drop=True)
    is_href = h.str.startswith('href="')
    if bool(is_href.any()):
        h = h.str.slice(6, -1).where(is_href, h)
    is_rel = h.str.startswith("/") & ~h.str.contains("://", regex=False)
    if bool(is_rel.any()):
        resolved = ("s://" + pd.Series(hosts[rows]) + h).where(is_rel, h)
    else:
        resolved = h

    return _assemble_edges(
        batch, pa.array(resolved.to_numpy(dtype=object), pa.string()), rows)


def _assemble_edges(batch: pa.Table, dst: pa.Array,
                    rows: np.ndarray) -> pa.Table:
    """Common tail: page-order ``ord`` (index minus group start — rows is
    sorted) + src columns gathered by row index."""
    total = len(rows)
    idx = np.arange(total, dtype=np.int64)
    change = np.flatnonzero(np.diff(rows)) + 1
    bounds = np.concatenate(([0], change, [total]))
    group_start = np.repeat(bounds[:-1], np.diff(bounds))
    ords = idx - group_start

    urls = batch["url"].to_numpy(zero_copy_only=False)
    seqs = batch["seq"].to_numpy(zero_copy_only=False)
    depths = batch["depth"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "src": pa.array(urls[rows], pa.string()),
            "dst": pc.cast(dst, pa.string()),
            "ord": pa.array(ords.astype(np.int32)),
            "src_seq": pa.array(seqs[rows].astype(np.int64)),
            "depth": pa.array(depths[rows].astype(np.int32)),
        }
    )
