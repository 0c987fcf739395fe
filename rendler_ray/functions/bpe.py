"""Distributed BPE merge training over a text corpus.

Classic byte-pair-encoding merge learning (Sennrich et al. 2016 —
public algorithm), expressed Ray-Data-first: training runs on the WORD
FREQUENCY table, so raw text is touched exactly once (explode →
``groupby(word).sum`` — the only full-corpus shuffle). Each merge round
is then over the much smaller unique-word table:

  1. ``map_batches``: weighted adjacent-pair counts, locally combined
     per batch (one (a, b, n) row per distinct pair per batch);
  2. ``groupby(a, b).sum`` → global pair counts;
  3. per-batch partial top-1 → driver fold over ≤ one row per block →
     the merge winner (deterministic tie-break — count desc, then pair
     lexicographic asc). An argmax needs no sort all-to-all;
  4. ``map_batches``: rewrite every word's symbol sequence with the
     winning merge (left-to-right, non-overlapping — the classic rule).

The driver holds only the learned merge list (num_merges rows); the
word table is materialized between rounds (vocabulary-sized — swap for
a parquet checkpoint past ~10^8 unique words). Symbols are plain
characters (no end-of-word marker), a documented simplification.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum


def _word_counts(ds, text_col: str):
    def explode(t: pa.Table) -> pa.Table:
        toks = pd.Series(t[text_col].to_numpy(zero_copy_only=False),
                         dtype=object).str.split(" ")
        words = np.concatenate([np.array(x, dtype=object) for x in toks])
        w, c = np.unique(words, return_counts=True)  # local combine
        return pa.table({"word": pa.array(w, pa.string()),
                         "n": pa.array(c, pa.int64())})

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("word").aggregate(Sum("n", alias_name="n")))


def _to_syms(t: pa.Table) -> pa.Table:
    return pa.table({
        "syms": pa.array([list(w) for w in t["word"].to_pylist()],
                         pa.list_(pa.string())),
        "n": t["n"],
    })


def _count_pairs(t: pa.Table) -> pa.Table:
    counts: dict[tuple[str, str], int] = {}
    ns = t["n"].to_numpy(zero_copy_only=False)
    for syms, n in zip(t["syms"].to_pylist(), ns):
        n = int(n)
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + n
    if not counts:
        return pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    ks = list(counts.keys())
    return pa.table({"a": pa.array([k[0] for k in ks], pa.string()),
                     "b": pa.array([k[1] for k in ks], pa.string()),
                     "n": pa.array([counts[k] for k in ks], pa.int64())})


def _merge_word(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(ds, text_col: str = "text", num_merges: int = 24,
              min_count: int = 2) -> pa.Table:
    """Learn ``num_merges`` BPE merges; returns (rank, left, right, n).
    Deterministic for a fixed corpus. Stops early when the best pair's
    weighted count drops below ``min_count``."""
    seqs = _word_counts(ds, text_col).map_batches(
        _to_syms, batch_format="pyarrow").materialize()

    def _top1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        df = t.to_pandas().sort_values(
            ["n", "a", "b"], ascending=[False, True, True]).head(1)
        return pa.Table.from_pandas(df, preserve_index=False)

    ranks, lefts, rights, counts = [], [], [], []
    for rank in range(num_merges):
        cand = (seqs.map_batches(_count_pairs, batch_format="pyarrow")
                .groupby(["a", "b"]).aggregate(Sum("n", alias_name="n"))
                .map_batches(_top1, batch_format="pyarrow")
                .take_all())  # ≤ 1 row per block — bounded driver fold
        if not cand:
            break
        top = min(cand, key=lambda r: (-r["n"], r["a"], r["b"]))
        if top["n"] < min_count:
            break
        a, b = top["a"], top["b"]
        ranks.append(rank)
        lefts.append(a)
        rights.append(b)
        counts.append(int(top["n"]))

        def apply(t: pa.Table, a=a, b=b) -> pa.Table:
            return pa.table({
                "syms": pa.array([_merge_word(s, a, b)
                                  for s in t["syms"].to_pylist()],
                                 pa.list_(pa.string())),
                "n": t["n"],
            })

        seqs = seqs.map_batches(apply, batch_format="pyarrow").materialize()

    return pa.table({"rank": pa.array(ranks, pa.int32()),
                     "left": pa.array(lefts, pa.string()),
                     "right": pa.array(rights, pa.string()),
                     "n": pa.array(counts, pa.int64())})


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply the learned merges in rank order (the classic encoder)."""
    syms = list(word)
    for a, b in merges:
        if len(syms) < 2:
            break
        syms = _merge_word(syms, a, b)
    return syms


def bpe_encode_batch(batch: pa.Table, *, merges_ref,
                     text_col: str = "text") -> pa.Table:
    """``map_batches`` kernel: tokens-per-document under a trained merge
    table (broadcast via ``ray.put`` once, resolved zero-copy per task).
    Each distinct word in the batch is encoded once (local memo) —
    per-unique-word work, not per-occurrence."""
    import ray

    merges = ray.get(merges_ref)
    memo: dict[str, int] = {}
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        total = 0
        for w in t.split(" "):
            k = memo.get(w)
            if k is None:
                k = memo[w] = len(encode_word(w, merges))
            total += k
        out[i] = total
    return batch.append_column("n_bpe_pieces", pa.array(out, pa.int64()))
