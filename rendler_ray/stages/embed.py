"""Text-embedding inference stage: the text twin of media.MediaDecoder.

A training-data pipeline doesn't just consume an embeddings table
(ANN / near-dup / k-means all do) — it has to PRODUCE one from the
crawled text. This stage is that producer, shaped exactly the way a
model-inference stage runs on Ray Data: a callable CLASS for
``map_batches`` actor pools, model load ONCE per actor in
``__init__``, batched vectorized inference in ``__call__``.

Sandbox honesty (same contract as ``functions/media.py``): no model
weights or inference runtime ship in this environment, so the default
backend is a DETERMINISTIC stub — feature-hashed bag-of-tokens counts
through a seeded random projection, L2-normalized (the classic hashing
trick; public technique, Weinberger et al. ICML'09). ``strict=True``
raises instead. Everything around the stub is real and tested: the
actor signature, Arrow batching, the output schema (``list<float32>``
matching the driver's embeddings table), and the downstream chain
(embed → IVF/LSH index → near-dup / top-k) runs end-to-end on it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rendler_ray.functions.canon import stable_hash64


class TextEmbedder:
    """``map_batches`` actor stage: append an ``embedding`` column
    (list<float32>, L2-normalized) computed from ``text_col``.

    Real deployment: load the encoder here (once per actor) and replace
    ``__call__``'s projection with batched model inference — nothing
    else changes. The stub is pure vectorized Arrow/numpy: one
    ``split_pattern``, hash-bucketed token counts per row
    (``bincount`` over parent·buckets+bucket), one (rows × buckets) @
    (buckets × dim) matmul."""

    def __init__(self, dim: int = 64, buckets: int = 1024, seed: int = 13,
                 text_col: str = "text", strict: bool = False):
        # Real impl: load tokenizer + model weights here, once per actor.
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((buckets, dim))
        self.buckets = buckets
        self.text_col = text_col
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "no text-embedding model available in this environment; "
                "load a real encoder in TextEmbedder.__init__")
        n = batch.num_rows
        if n == 0:
            return batch.append_column(
                "embedding", pa.array([], pa.list_(pa.float32())))
        toks = pc.split_pattern(batch[self.text_col].combine_chunks(), " ")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        b = (stable_hash64(flat) % np.uint64(self.buckets)).astype(np.int64)
        cnt = np.bincount(parents * self.buckets + b,
                          minlength=n * self.buckets).reshape(
            n, self.buckets).astype(np.float64)
        emb = cnt @ self.proj
        nrm = np.linalg.norm(emb, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        emb = (emb / nrm).astype(np.float32)
        return batch.append_column(
            "embedding", pa.array(list(emb), pa.list_(pa.float32())))


def embed_text_ds(ds, text_col: str = "text", dim: int = 64,
                  concurrency=(1, 4), batch_size: int = 1024,
                  strict: bool = False):
    """text table → + embedding column via the actor pool. Modest
    ``batch_size``: the stub's count matrix is rows × buckets doubles
    (a real encoder is likewise activation-bound — size batches to the
    model, not the block)."""
    return ds.map_batches(
        TextEmbedder,
        fn_constructor_kwargs={"dim": dim, "text_col": text_col,
                               "strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
