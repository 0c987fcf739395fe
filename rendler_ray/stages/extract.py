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
spans columnar; a single compiled-regex ``pandas.Series.str.findall``
over the text spans (the hot part); a short Python assembly loop over
the per-span match LISTS only (≈ one iteration per span, not per char).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# href="..." (generic HTML), absolute synthetic URL, host-relative path.
# Alternation order matters: the absolute form must win over the bare
# "/pNNNNN" suffix it contains.
LINK_RE = re.compile(r'href="([^"]+)"|(\bs://h\d{3}/p\d{5})|(/p\d{5})')

EDGE_FIELDS = [
    ("src", pa.string()),
    ("dst", pa.string()),
    ("ord", pa.int32()),
    ("src_seq", pa.int64()),
    ("depth", pa.int32()),
]


def _resolve(href: str, host: str) -> str:
    if "://" in href:
        return href
    if href.startswith("/"):
        return f"s://{host}{href}"
    return href


def extract_edges(batch: pa.Table) -> pa.Table:
    """Fetch batch (url, host, depth, seq, status, spans) → edges batch
    (src, dst, ord, src_seq, depth). 404 rows produce no edges."""
    cols = {name: [] for name, _ in EDGE_FIELDS}
    if batch.num_rows:
        spans = batch["spans"].combine_chunks()
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        kinds = flat.field("kind").to_numpy(zero_copy_only=False)
        texts = flat.field("text").to_numpy(zero_copy_only=False)
        tmask = kinds == "text"
        t_par = parents[tmask]
        found = pd.Series(texts[tmask], dtype=object).str.findall(LINK_RE)

        urls = batch["url"].to_numpy(zero_copy_only=False)
        hosts = batch["host"].to_numpy(zero_copy_only=False)
        seqs = batch["seq"].to_numpy(zero_copy_only=False)
        depths = batch["depth"].to_numpy(zero_copy_only=False)
        ord_counter = np.zeros(batch.num_rows, dtype=np.int64)
        src_c, dst_c, ord_c, seq_c, dep_c = (
            cols["src"], cols["dst"], cols["ord"], cols["src_seq"], cols["depth"]
        )
        for row, matches in zip(t_par, found.to_numpy()):
            if not matches:
                continue
            host = hosts[row]
            o = int(ord_counter[row])
            for g1, g2, g3 in matches:
                # findall with groups yields one tuple per match; exactly
                # one alternative participated.
                href = g1 or g2 or g3
                dst_c.append(_resolve(href, host))
                src_c.append(urls[row])
                ord_c.append(o)
                seq_c.append(int(seqs[row]))
                dep_c.append(int(depths[row]))
                o += 1
            ord_counter[row] = o
    return pa.table(
        {name: pa.array(cols[name], type=typ) for name, typ in EDGE_FIELDS}
    )
