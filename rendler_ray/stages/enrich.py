"""Per-page enrichment: the training-data half of the crawl pipeline.

A production crawl-for-training-data doesn't stop at fetch: every page
is scored (quality filters), language-identified, and fingerprinted
(near-dup dedup) before it is worth storing. This stage computes, per
fetched page, from the concatenated text spans:

  * token counts + stopword/uniqueness quality ratios
    (``functions.text.quality_batch`` kernels)
  * language-ID heuristic (``lang_id_batch``)
  * 64-bit SimHash fingerprint (``simhash64_batch``)

It is a batch transform chained directly after the fetch stage —
Ray Data fuses the two ``map_batches`` into one task pipeline, so the
span payload is read once per batch while it is hot.

Reference parity note: mesosphere/RENDLER has no enrichment (its crawl
executor only extracts hrefs — ``python/crawl_executor.py``); this is
part of the BASELINE.json scope extension (training-data ops as
first-class pipeline stages).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from rendler_ray.functions.text import (
    MinHasher,
    lang_id_batch,
    quality_batch,
    simhash64_batch,
)

def minhash_bands_batch(batch: pa.Table, *, num_perm: int = 64,
                        bands: int = 8,
                        text_col: str = "page_text") -> pa.Table:
    """Append ``minhash_bands`` (list<string> of per-band LSH hashes) —
    crawl-time MinHash signatures (CCNet/RefinedWeb-style fuzzy dedup).
    A downstream ``groupby(band_hash)`` bucketing gives near-dup
    candidate groups without re-reading page content. Uses text.py's
    parameter-keyed per-worker hasher cache. Band hashes come from the
    vectorized FNV fold (text.py::band_hashes_batch) — no per-row
    Python in this hot path (r4)."""
    from rendler_ray.functions.text import (_MINHASHERS, MinHasher,
                                            band_hashes_batch)

    key = (num_perm, 3, bands, 7, "doc_id", text_col)
    mh = _MINHASHERS.get(key)
    if mh is None:
        mh = _MINHASHERS[key] = MinHasher(num_perm=num_perm, bands=bands,
                                          text_col=text_col)
    n = batch.num_rows
    # batched signatures (one explode + one hash pass — hot path);
    # empty pages keep the all-zeros signature the row form used
    sigs = mh.signatures_batch(batch[text_col].combine_chunks())
    empty = pc.equal(batch[text_col], "").to_numpy(zero_copy_only=False)
    sigs[empty] = np.uint64(0)
    bh = band_hashes_batch(sigs, mh.bands)
    lists = pa.ListArray.from_arrays(
        pa.array(np.arange(n + 1, dtype=np.int32) * mh.bands, pa.int32()),
        pa.array(bh.ravel(), pa.string()))
    return batch.append_column("minhash_bands", lists)


def page_text_column(batch: pa.Table, out_col: str = "page_text") -> pa.Table:
    """Join each page's text spans (in offset order) into one string
    column; media spans are skipped. Empty-span (404) rows get ""."""
    spans = batch["spans"].combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    kinds = flat.field("kind").to_numpy(zero_copy_only=False)
    tmask = kinds == "text"
    texts = flat.field("text").to_numpy(zero_copy_only=False)[tmask]
    t_par = parents[tmask]
    joined = pd.Series(texts, dtype=object).groupby(t_par).agg(" ".join)
    col = np.full(batch.num_rows, "", dtype=object)
    col[joined.index.to_numpy(np.int64)] = joined.to_numpy(dtype=object)
    return batch.append_column(out_col, pa.array(col, pa.string()))


def enrich_batch(batch: pa.Table, *, bpe_merges_ref=None) -> pa.Table:
    """Fetch batch → fetch batch + quality/lang/simhash columns; with a
    trained BPE merge table (``ray.put`` list of (left, right) pairs,
    from ``functions.bpe.bpe_train``) also ``n_bpe_pieces`` — the
    crawl-time token-budget column a training-data pipeline filters and
    packs by (tokenize-at-ingest, not in a later full re-read pass)."""
    if batch.num_rows == 0:
        cols = [("n_tokens", pa.int64()),
                ("n_uniq_tokens", pa.int64()),
                ("n_stopwords", pa.int64()),
                ("stopword_ratio", pa.float64()),
                ("uniq_ratio", pa.float64()),
                ("lang_pred", pa.string()),
                ("lang_score", pa.float64()),
                ("simhash", pa.int64()),
                ("minhash_bands", pa.list_(pa.string()))]
        if bpe_merges_ref is not None:
            cols.append(("n_bpe_pieces", pa.int64()))
        for name, typ in cols:
            batch = batch.append_column(name, pa.array([], typ))
        return batch
    t = page_text_column(batch)
    t = quality_batch(t, col="page_text")
    t = lang_id_batch(t, col="page_text")
    t = simhash64_batch(t, col="page_text")
    t = minhash_bands_batch(t, text_col="page_text")
    if bpe_merges_ref is not None:
        from rendler_ray.functions.bpe import bpe_encode_batch

        t = bpe_encode_batch(t, merges_ref=bpe_merges_ref,
                             text_col="page_text")
    return t.drop_columns(["page_text"])
