"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``) and every batch does one numpy matmul against it (never
re-shipped per batch); per-batch partial top-k bounds the final reduce
to ``num_batches × k`` rows per query.

Scale path: LSH-bucketed search (random-hyperplane signatures → bucket
groupby → search within probed buckets only) — the same shape as an IVF
index with hash-assigned lists; recall is tunable via bits/probes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def batch_to_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    return m / nrm


class CosineTopK:
    """``map_batches`` actor stage: partial top-k per query per batch.

    The query matrix ref is resolved ONCE per actor in ``__init__``.
    Emits (query_id, vec_id, score) candidate rows; a small final
    groupby-per-query reduce picks the global top-k.
    """

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id",
                 col: str = "embedding"):
        q = ray.get(queries_ref)  # dict: query_id -> vector
        self.qids = np.array(sorted(q))
        self.qmat = _normalize(np.array([q[i] for i in self.qids], dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        # id/query types follow the inputs (ints for vec_id corpora,
        # strings for media_ref / doc_id-string corpora)
        qt = (pa.string() if self.qids.dtype.kind in "OU"
              else pa.int64())
        vt = batch.schema.field(self.id_col).type
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], qt),
                             "vec_id": pa.array([], vt),
                             "score": pa.array([], pa.float64())})
        m = _normalize(batch_to_matrix(batch, self.col))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        scores = self.qmat @ m.T                       # (Q, B)
        k = min(self.k, scores.shape[1])
        # partial top-k per query within this batch
        part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        out_q, out_v, out_s = [], [], []
        for qi in range(scores.shape[0]):
            sel = part[qi]
            qid = self.qids[qi]
            # query ids may be ints (vec_id) or strings (media_ref)
            qid = qid.item() if isinstance(qid, np.generic) else qid
            out_q.extend([qid] * len(sel))
            out_v.extend(ids[sel].tolist())
            out_s.extend(scores[qi, sel].tolist())
        return pa.table({"query_id": pa.array(out_q, qt),
                         "vec_id": pa.array(out_v, vt),
                         "score": pa.array(out_s, pa.float64())})


def topk_reduce(k: int, scale: int = 6):
    """Per-query final reduce: scores go fixed-point (score_e6 int64 =
    round(score·10^6)) and ranking uses (score_e6 desc, vec_id asc) —
    integers compare exactly against the DuckDB oracle, where float
    rounding can differ by 1 ulp."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["score_e6"] = (g["score"] * (10 ** scale)).round().astype(np.int64)
        g = g.sort_values(["score_e6", "vec_id"],
                          ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g.drop(columns=["score"])

    return fn


def brute_force_topk(ds, queries: dict[int, np.ndarray], k: int,
                     concurrency=(1, 4), batch_size: int = 4096):
    """Full pipeline: broadcast queries → partial per-batch top-k →
    per-query global top-k. Returns (query_id, vec_id, score, rank)."""
    qref = ray.put(queries)
    cands = ds.map_batches(
        cosine_topk_batch,
        fn_kwargs={"queries_ref": qref, "k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
    )
    return cands.groupby("query_id").map_groups(
        topk_reduce(k), batch_format="pandas"
    )


class LshBucketer:
    """Random-hyperplane LSH: adds a ``bucket`` column (int signature).
    Vectors in the same bucket are near-duplicate candidates; for ANN,
    probe the query's bucket (+ optional neighbor buckets)."""

    def __init__(self, dim: int, bits: int = 12, seed: int = 5,
                 col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, bits))
        self.col = col

    def signature(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("bucket", pa.array([], pa.int64()))
        m = _normalize(batch_to_matrix(batch, self.col))
        return batch.append_column("bucket", pa.array(self.signature(m), pa.int64()))


def embedding_near_dup_pairs(ds, threshold: float = 0.95, bits: int = 10,
                             dim: int = 64, id_col: str = "vec_id",
                             max_bucket: int | None = 4096):
    """Embedding-cosine near-duplicate pairs via LSH bucketing:
    bucket groupby (the only shuffle) → exact cosine within buckets →
    (a, b, score) pairs with a < b. Approximate: pairs split across
    buckets are missed (recall grows with fewer bits / multiple tables).

    Skew guard (``max_bucket``): a hot bucket of size b costs O(b²) in
    ONE task. Buckets over the cap are salted into ceil(b/cap)
    hash-of-id sub-buckets BEFORE the groupby, bounding every task at
    O(cap²); cross-sub pairs inside an oversized bucket are dropped
    (same approximation class as the bucketing itself). Output is
    unchanged whenever no bucket exceeds the cap. The bucket histogram
    has ≤ 2^bits rows — a config constant — so it broadcasts.
    """
    bucketed = ds.map_batches(
        lsh_bucket_batch,
        fn_kwargs={"dim": dim, "bits": bits},
        batch_format="pyarrow",
        num_cpus=1,
    )
    if max_bucket is not None:
        from rendler_ray.functions.canon import stable_hash64

        def partial_hist(t: pa.Table) -> pa.Table:
            b, c = np.unique(t["bucket"].to_numpy(zero_copy_only=False),
                             return_counts=True)
            return pa.table({"bucket": pa.array(b, pa.int64()),
                             "n": pa.array(c, pa.int64())})

        # per-batch partial counts streamed to the driver (≤ 2^bits rows
        # per batch, config-bounded) — no groupby all-to-all just to
        # build a histogram the driver can fold
        hist: dict = {}
        for t in (bucketed.select_columns(["bucket"])
                  .map_batches(partial_hist, batch_format="pyarrow")
                  .iter_batches(batch_size=None, batch_format="pyarrow")):
            for b, n in zip(t["bucket"].to_pylist(), t["n"].to_pylist()):
                hist[b] = hist.get(b, 0) + n
        n_sub = {b: -(-n // max_bucket) for b, n in hist.items() if n > max_bucket}
        if n_sub:
            sub_ref = ray.put(n_sub)

            def salt(t: pa.Table) -> pa.Table:
                ns = ray.get(sub_ref)
                bk = t["bucket"].to_numpy(zero_copy_only=False)
                subs = np.fromiter((ns.get(int(b), 1) for b in bk),
                                   dtype=np.int64, count=len(bk))
                h = stable_hash64(np.array(
                    [str(x) for x in t[id_col].to_pylist()], dtype=object))
                salted = (bk.astype(np.int64) << 20) | \
                    (h % subs.astype(np.uint64)).astype(np.int64)
                return t.set_column(
                    t.schema.get_field_index("bucket"), "bucket",
                    pa.array(salted, pa.int64()))

            bucketed = bucketed.map_batches(salt, batch_format="pyarrow")
        # no oversized bucket: keys unchanged, no extra pass

    def within(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "score": []}).astype(
                {"a": np.int64, "b": np.int64, "score": np.float64}
            )
        m = _normalize(np.stack(g["embedding"].map(np.asarray)).astype(np.float64))
        ids = g[id_col].to_numpy()
        s = m @ m.T
        iu, ju = np.triu_indices(len(g), k=1)
        keep = s[iu, ju] >= threshold
        a, b = ids[iu[keep]], ids[ju[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a": lo, "b": hi, "score": np.round(s[iu, ju][keep], 6)})

    return bucketed.groupby("bucket").map_groups(within, batch_format="pandas")


def salt_hot_int_buckets(ds, key_col: str = "bucket_key",
                         id_col: str = "doc_id",
                         max_bucket: int = 4096, shift_bits: int = 20):
    """Hot-bucket salting for int64 LSH bucket keys (the generic form of
    :func:`embedding_near_dup_pairs`'s skew guard, reused by the simhash
    text path): buckets with more than ``max_bucket`` rows are split
    into ceil(n/max_bucket) hash-of-id sub-buckets BEFORE the bucket
    groupby, bounding every in-bucket O(b²) task at O(max_bucket²).

    The histogram is per-batch partial counts folded on the driver —
    bounded by the KEY SPACE (4·2^16 for the simhash 4×16-bit banding),
    a config constant, never the corpus — so no extra all-to-all.
    When a bucket IS split, every key shifts left ``shift_bits`` (cold
    buckets get sub 0), so keys must fit in 63−shift_bits bits; pairs
    crossing sub-buckets of an oversized bucket are missed unless they
    share another band — the deliberate trade (an oversized bucket is
    boilerplate; exhaustively pairing it is the scale killer, Manku
    WWW'07 §5 discussion). Returns ``ds`` UNCHANGED (keys unshifted)
    when no bucket exceeds the cap."""
    import pyarrow.compute as pc

    from rendler_ray.functions.canon import stable_hash64

    def partial_hist(t: pa.Table) -> pa.Table:
        b, c = np.unique(t[key_col].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"k": pa.array(b, pa.int64()),
                         "n": pa.array(c, pa.int64())})

    hist: dict = {}
    for t in (ds.select_columns([key_col])
              .map_batches(partial_hist, batch_format="pyarrow")
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        for b, n in zip(t["k"].to_pylist(), t["n"].to_pylist()):
            hist[b] = hist.get(b, 0) + n
    n_sub = {b: -(-n // max_bucket)
             for b, n in hist.items() if n > max_bucket}
    if not n_sub:
        return ds
    # keys must fit 63−shift_bits bits once shifted — enforce, don't
    # rely on the caller having read the docstring
    max_key = max(abs(int(k)) for k in hist)
    assert max_key < (1 << (63 - shift_bits)), (
        f"bucket key {max_key} overflows {63 - shift_bits} bits under "
        f"shift_bits={shift_bits}")
    # sorted (hot key → n_sub) arrays: the per-batch lookup is one
    # vectorized searchsorted instead of a per-row dict.get generator
    hot_keys = np.array(sorted(n_sub), dtype=np.int64)
    hot_nsub = np.array([n_sub[int(k)] for k in hot_keys],
                        dtype=np.uint64)
    sub_ref = ray.put((hot_keys, hot_nsub))

    def salt(t: pa.Table) -> pa.Table:
        hk, hn = ray.get(sub_ref)
        bk = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(hk, bk)
        pos_c = np.minimum(pos, len(hk) - 1)
        is_hot = hk[pos_c] == bk
        subs = np.where(is_hot, hn[pos_c], np.uint64(1))
        h = stable_hash64(t[id_col])
        salted = (bk << shift_bits) | (h % subs).astype(np.int64)
        return t.set_column(t.schema.get_field_index(key_col), key_col,
                            pa.array(salted, pa.int64()))

    return ds.map_batches(salt, batch_format="pyarrow")


# per-worker stage caches for the task-pool forms (keyed on parameters,
# so differing pipelines in one session never share the wrong instance;
# LRU-bounded — refs from finished queries never recur)
_TOPK_CACHE: dict = {}
_LSH_CACHE: dict = {}


def cosine_topk_batch(batch: pa.Table, *, queries_ref, k: int,
                      id_col: str = "vec_id",
                      col: str = "embedding") -> pa.Table:
    """Task-pool form of :class:`CosineTopK` — the normalized query
    matrix is built once per worker per (queries, k) and reused across
    batches (the ref itself resolves zero-copy from local plasma)."""
    from rendler_ray.util import lru_get

    key = (queries_ref.hex(), k, id_col, col)
    stage = lru_get(_TOPK_CACHE, key,
                    lambda: CosineTopK(queries_ref, k, id_col, col))
    return stage(batch)


def lsh_bucket_batch(batch: pa.Table, *, dim: int, bits: int = 12,
                     seed: int = 5, col: str = "embedding") -> pa.Table:
    """Task-pool form of :class:`LshBucketer`; the plane matrix is built
    once per worker per parameter set."""
    from rendler_ray.util import lru_get

    key = (dim, bits, seed, col)
    stage = lru_get(_LSH_CACHE, key,
                    lambda: LshBucketer(dim, bits, seed, col))
    return stage(batch)


# ------------------------------------------------------------------ IVF


def _kmeans_centroids(sample: np.ndarray, n_lists: int, seed: int = 11,
                      iters: int = 8) -> np.ndarray:
    """Deterministic spherical k-means on a sample (driver-side, numpy):
    hash-seeded init, cosine assignment, mean + renormalize update."""
    rng = np.random.default_rng(seed)
    sample = _normalize(sample)
    idx = rng.choice(len(sample), size=min(n_lists, len(sample)),
                     replace=False)
    cent = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


class IvfAssign:
    """map_batches stage: append the IVF list id (argmax-cosine
    centroid). Centroids resolve from plasma once per worker."""

    def __init__(self, cent_ref):
        self.cent = ray.get(cent_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("ivf_list", pa.array([], pa.int32()))
        m = _normalize(batch_to_matrix(batch))
        lists = np.argmax(m @ self.cent.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_list", pa.array(lists))


_IVF_CACHE: dict = {}


def ivf_assign_batch(batch: pa.Table, *, cent_ref) -> pa.Table:
    from rendler_ray.util import lru_get

    return lru_get(_IVF_CACHE, cent_ref.hex(),
                   lambda: IvfAssign(cent_ref))(batch)


def ivf_topk(ds, queries: dict[int, np.ndarray], k: int, n_lists: int = 16,
             n_probe: int = 4, sample_rows: int = 4096, seed: int = 11):
    """IVF ANN: train centroids on a deterministic sample (driver-side
    k-means — the centroid table is tiny), broadcast them, assign every
    vector to its list in one map pass, then brute-force ONLY the lists
    each query probes (n_probe nearest centroids). The filter runs as a
    per-batch mask, so non-probed vectors never reach the matmul —
    at scale this is the partition-pruned read."""
    head = _deterministic_sample(ds, "vec_id", sample_rows)
    cent = _kmeans_centroids(
        np.stack([np.asarray(v, np.float64)
                  for v in head["embedding"].to_pylist()]),
        n_lists, seed=seed)
    cent_ref = ray.put(cent)

    qids = np.array(sorted(queries))
    qmat = _normalize(np.stack([np.asarray(queries[i], np.float64)
                                for i in qids]))
    # lists each query probes — pruning is PER QUERY (union only for the
    # coarse row filter; each query scores only its own probed lists)
    probe = np.argsort(-(qmat @ cent.T), axis=1)[:, :n_probe]
    probe_sets = {int(q): set(int(x) for x in probe[i])
                  for i, q in enumerate(qids)}
    union_lists = sorted(set(np.unique(probe).tolist()))
    union_ref = ray.put(union_lists)
    probe_ref = ray.put(probe_sets)
    qref = ray.put(queries)

    assigned = ds.map_batches(ivf_assign_batch,
                              fn_kwargs={"cent_ref": cent_ref},
                              batch_format="pyarrow", num_cpus=1)

    def only_probed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ul = ray.get(union_ref)
        return t.filter(pc.is_in(
            t["ivf_list"], value_set=pa.array(ul, pa.int32())))

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        q = ray.get(qref)
        ps = ray.get(probe_ref)
        qi = np.array(sorted(q))
        qm = _normalize(np.stack([np.asarray(q[i], np.float64)
                                  for i in qi]))
        m = _normalize(batch_to_matrix(t))
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        lists = t["ivf_list"].to_numpy(zero_copy_only=False)
        out_q, out_v, out_s = [], [], []
        for row_q, qid in enumerate(qi):
            allowed = np.isin(lists, list(ps[int(qid)]))
            if not allowed.any():
                continue
            sub = m[allowed]
            scores = qm[row_q] @ sub.T
            kk = min(k, len(scores))
            sel = np.argpartition(-scores, kk - 1)[:kk]
            out_q.extend([int(qid)] * len(sel))
            out_v.extend(ids[allowed][sel].tolist())
            out_s.extend(scores[sel].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    cands = assigned.map_batches(
        only_probed, batch_format="pyarrow").map_batches(
        score, batch_format="pyarrow", num_cpus=1)
    return cands.groupby("query_id").map_groups(
        topk_reduce(k), batch_format="pandas")


def _kmeans_l2(sample: np.ndarray, k: int, seed: int = 13,
               iters: int = 10) -> np.ndarray:
    """Deterministic L2 k-means on a driver-side sample (the PQ
    sub-codebook trainer — NOT spherical: subspace blocks of a unit
    vector are not unit vectors themselves)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(k, len(sample)),
                     replace=False)
    cent = sample[np.sort(idx)].copy()
    for _ in range(iters):
        d2 = (-2.0 * (sample @ cent.T)
              + (cent ** 2).sum(axis=1)[None, :])
        a = np.argmin(d2, axis=1)
        for c in range(len(cent)):
            members = sample[a == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def pq_train(ds, m: int = 4, ks: int = 32, sample_rows: int = 4096,
             seed: int = 13) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. TPAMI'11, public):
    normalize, split the dimension into ``m`` subspaces, train an
    independent ``ks``-centroid L2 codebook per subspace on a
    deterministic sample. Returns (m, ks, dim/m) — a few KB that
    broadcasts once; the corpus itself never leaves its blocks."""
    head = _deterministic_sample(ds, "vec_id", sample_rows)
    x = _normalize(np.stack([np.asarray(v, np.float64)
                             for v in head["embedding"].to_pylist()]))
    d = x.shape[1]
    assert d % m == 0, (d, m)
    sub = d // m
    return np.stack([
        _kmeans_l2(x[:, s * sub:(s + 1) * sub], ks, seed=seed + s)
        for s in range(m)])


class PqScore:
    """``map_batches`` actor stage for PQ ANN: encode each vector to its
    per-subspace nearest codeword, then score every query against the
    CODES via an ADC lookup table (query·codeword partial dots) — the
    100-TB ANN scan shape: the full-precision corpus matmul is replaced
    by m table gathers per vector, codebooks + LUT resolve from plasma
    once per actor.

    Emits a parallelism-robust partial top-k per query per batch: all
    rows tying the batch's k-th ROUNDED score survive (PQ scores tie in
    droves — every vector sharing a code word scores identically — so a
    plain argpartition cut would make the output depend on how rows
    land in batches)."""

    def __init__(self, cent_ref, queries_ref, k: int,
                 rerank_mult: int = 4):
        self.cent = ray.get(cent_ref)          # (m, ks, sub)
        q = ray.get(queries_ref)
        self.qids = np.array(sorted(q))
        self.qm = _normalize(np.stack([np.asarray(q[i], np.float64)
                                       for i in self.qids]))
        m, ks, sub = self.cent.shape
        self.lut = np.stack([self.qm[:, s * sub:(s + 1) * sub]
                             @ self.cent[s].T
                             for s in range(m)], axis=1)   # (Q, m, ks)
        self.k = k
        self.rerank = k * rerank_mult

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        x = _normalize(batch_to_matrix(batch))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        m, ks, sub = self.cent.shape
        codes = np.empty((len(x), m), np.int64)
        for s in range(m):
            xs = x[:, s * sub:(s + 1) * sub]
            d2 = (-2.0 * (xs @ self.cent[s].T)
                  + (self.cent[s] ** 2).sum(axis=1)[None, :])
            codes[:, s] = np.argmin(d2, axis=1)
        scores = np.zeros((len(self.qids), len(x)))
        for s in range(m):
            scores += self.lut[:, s, codes[:, s]]
        se6 = np.round(scores * 1e6).astype(np.int64)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(self.qids)):
            row = se6[qi]
            kk = min(self.rerank, len(row))
            thr = np.partition(row, len(row) - kk)[len(row) - kk]
            keep = row >= thr
            # exact re-rank of the ADC survivors ONLY (a handful of
            # rows — never the whole batch): emitted scores are true
            # cosines, so only cross-batch prefilter misses cost recall
            exact = self.qm[qi] @ x[keep].T
            out_q.extend([int(self.qids[qi])] * int(keep.sum()))
            out_v.extend(ids[keep].tolist())
            out_s.extend(exact.tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})


_PQ_CACHE: dict = {}


def pq_score_batch(batch: pa.Table, *, cent_ref, queries_ref,
                   k: int) -> pa.Table:
    from rendler_ray.util import lru_get

    return lru_get(_PQ_CACHE, (cent_ref.hex(), queries_ref.hex(), k),
                   lambda: PqScore(cent_ref, queries_ref, k))(batch)


def pq_topk(ds, queries: dict[int, np.ndarray], k: int, m: int = 4,
            ks: int = 32, sample_rows: int = 4096, seed: int = 13):
    """PQ ANN end-to-end: train sub-codebooks on a deterministic sample
    (driver), broadcast codebooks + ADC LUTs once, ONE stateless scan
    that encodes and scores per batch, then the shared per-query
    fixed-point top-k reduce. Approximate by construction — recall
    bounds are pytested against the brute-force oracle."""
    cent_ref = ray.put(pq_train(ds, m=m, ks=ks, sample_rows=sample_rows,
                                seed=seed))
    qref = ray.put(queries)
    cands = ds.map_batches(
        pq_score_batch,
        fn_kwargs={"cent_ref": cent_ref, "queries_ref": qref, "k": k},
        batch_format="pyarrow", num_cpus=1)
    return cands.groupby("query_id").map_groups(
        topk_reduce(k), batch_format="pandas")


def _deterministic_sample(ds, id_col: str, sample_rows: int) -> pa.Table:
    """One-pass deterministic sample by stable hash threshold on the id —
    no global sort/shuffle (scale path for training samples)."""
    n = ds.count()  # parquet metadata, no data read
    if n <= sample_rows:
        return pa.concat_tables(ds.iter_batches(batch_size=None,
                                                batch_format="pyarrow"))
    # threshold with ~1.3x margin, then trim deterministically by hash;
    # clamp: for sample_rows < n <= 1.3*sample_rows the ratio reaches 1
    # and the raw int would overflow uint64
    thr = np.uint64(min(int((1.3 * sample_rows / n) * 2**64), 2**64 - 1))

    def keep(t: pa.Table) -> pa.Table:
        from rendler_ray.functions.canon import stable_hash64

        h = stable_hash64(np.array([str(x) for x in
                                    t[id_col].to_pylist()], dtype=object))
        return t.append_column("_h", pa.array(h.astype(np.uint64))).filter(
            pa.array(h < thr))

    samp = pa.concat_tables(
        ds.map_batches(keep, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"))
    order = np.argsort(samp["_h"].to_numpy(zero_copy_only=False),
                       kind="stable")[:sample_rows]
    return samp.take(pa.array(np.sort(order))).drop_columns(["_h"])


def kmeans_fit(ds, n_clusters: int = 8, iters: int = 10, seed: int = 11,
               col: str = "embedding", sample_rows: int = 2048):
    """Distributed k-means (iterative multi-pass Dataset algorithm):
    per iteration, broadcast the centroids, one ``map_batches`` pass
    emits per-batch partial (sum, count) rows per cluster, and the
    driver mean-reduces the tiny partials into new centroids. Data
    never leaves the cluster; the driver only ever sees
    n_clusters × dim floats per iteration. Deterministic
    (hash-sampled init, one-pass sample — no sort shuffle).
    """
    ds = ds.materialize()  # iterations re-scan: read the input ONCE
    head = _deterministic_sample(ds, "vec_id", sample_rows)
    cent = _kmeans_centroids(
        np.stack([np.asarray(v, np.float64)
                  for v in head[col].to_pylist()]),
        n_clusters, seed=seed, iters=1)

    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partials(t: pa.Table, ref=cent_ref) -> pa.Table:
            empty = pa.table({
                "cluster": pa.array([], pa.int32()),
                "vec_sum": pa.array([], pa.list_(pa.float64())),
                "n": pa.array([], pa.int64())})
            if t.num_rows == 0:
                return empty
            c = ray.get(ref)
            m = _normalize(batch_to_matrix(t, col))
            assign = np.argmax(m @ c.T, axis=1)
            rows = []
            for k in np.unique(assign):
                sel = m[assign == k]
                rows.append((int(k), sel.sum(axis=0), len(sel)))
            return pa.table({
                "cluster": pa.array([r[0] for r in rows], pa.int32()),
                "vec_sum": pa.array([r[1].tolist() for r in rows],
                                    pa.list_(pa.float64())),
                "n": pa.array([r[2] for r in rows], pa.int64()),
            })

        agg = pa.concat_tables(
            ds.map_batches(partials, batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"))
        clusters = np.array(agg["cluster"].to_pylist())
        sums = [np.asarray(v) for v in agg["vec_sum"].to_pylist()]
        counts = np.array(agg["n"].to_pylist(), dtype=np.int64)
        new_cent = cent.copy()
        for k in range(len(cent)):
            mask = clusters == k
            if mask.any():
                total = np.stack([s for s, m_ in zip(sums, mask)
                                  if m_]).sum(axis=0)
                new_cent[k] = total / counts[mask].sum()  # true mean
        cent = _normalize(new_cent)
    return cent


def kmeans_cluster_sizes(ds, n_clusters: int = 8, iters: int = 10,
                         seed: int = 11, col: str = "embedding"):
    """Fit + final assignment pass → (cluster, n_members). Deterministic
    given the seed, so the driver's rows-only check is stable."""
    from ray.data.aggregate import Count

    cent = kmeans_fit(ds, n_clusters=n_clusters, iters=iters, seed=seed,
                      col=col)
    cent_ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"cluster": pa.array([], pa.int32())})
        c = ray.get(cent_ref)
        m = _normalize(batch_to_matrix(t, col))
        return pa.table({"cluster": pa.array(
            np.argmax(m @ c.T, axis=1).astype(np.int32))})

    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby("cluster").aggregate(Count(alias_name="n_members")))


# ------------------------------------------------------ exact kNN graph


def _ref_to_matrix(tb: pa.Table):
    ids = tb["vec_id"].to_numpy(zero_copy_only=False)
    unit = tb["unit"].combine_chunks()
    m = unit.flatten().to_numpy(zero_copy_only=False).reshape(
        len(tb), -1)
    return ids, m


class BlockKnnScan:
    """Exact k-NN graph, blocked-scan form: each ``map_batches`` task
    holds ONE query block and streams the (normalized, materialized)
    corpus blocks from the object store, keeping a RUNNING top-k per
    query row. This is the honest exact baseline — O(n²/p) similarity
    work spread over p tasks with O(one block + k·rows) memory per
    task, corpus stored once per node in plasma (shared-memory
    ``ray.get``, zero-copy Arrow) — while the in-tree IVF / LSH / PQ
    stages are the approximate scale paths on the same layout. The
    ranking key is the single int64 ``sim_e6·2³² − nbr_id`` (ids
    asserted < 2³²): a TOTAL order, so the running merge is
    block-order- and parallelism-invariant and tie-stable against the
    SQL oracle's (sim_e6 DESC, nbr_id ASC)."""

    def __init__(self, block_refs, k: int, exclude_self: bool = True,
                 cross_side: bool = False):
        self.refs = block_refs
        self.k = k
        self.exclude_self = exclude_self
        self.cross_side = cross_side  # neighbors from the OTHER side

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"vec_id": pa.array([], pa.int64()),
                          "nbr_id": pa.array([], pa.int64()),
                          "sim_e6": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        q_ids, qm = _ref_to_matrix(batch)
        q_side = (batch["side"].to_numpy(zero_copy_only=False)
                  if self.cross_side else None)
        nq = len(q_ids)
        # negation-safe sentinel: np.iinfo(int64).min wraps under
        # unary minus (-min == min), which would make masked
        # entries WIN the argpartition(-key) selection
        sentinel = -(1 << 62)
        pool_key = np.full((nq, 0), sentinel, np.int64)
        for ref in self.refs:
            tb = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            if tb.num_rows == 0:
                continue
            b_ids, bm = _ref_to_matrix(tb)
            assert int(b_ids.max()) < (1 << 32)
            sims = qm @ bm.T
            key = (np.round(sims * 1e6).astype(np.int64) << 32) - b_ids
            if self.exclude_self:
                key[q_ids[:, None] == b_ids[None, :]] = sentinel
            if self.cross_side:
                b_side = tb["side"].to_numpy(zero_copy_only=False)
                key[q_side[:, None] == b_side[None, :]] = sentinel
            kk = min(self.k, key.shape[1])
            part = np.argpartition(-key, kk - 1, axis=1)[:, :kk]
            cand = np.take_along_axis(key, part, axis=1)
            pool_key = np.concatenate([pool_key, cand], axis=1)
            if pool_key.shape[1] > self.k:
                sel = np.argpartition(-pool_key, self.k - 1,
                                      axis=1)[:, :self.k]
                pool_key = np.take_along_axis(pool_key, sel, axis=1)
        pool_key = -np.sort(-pool_key, axis=1)  # rank order per row
        valid = pool_key > sentinel
        nbr = (-pool_key) & ((1 << 32) - 1)
        sim = (pool_key + nbr) >> 32
        ranks = np.broadcast_to(
            np.arange(1, pool_key.shape[1] + 1, dtype=np.int64),
            pool_key.shape)
        qq = np.broadcast_to(q_ids[:, None], pool_key.shape)
        v = valid.ravel()
        return pa.table({
            "vec_id": pa.array(qq.ravel()[v], pa.int64()),
            "nbr_id": pa.array(nbr.ravel()[v], pa.int64()),
            "sim_e6": pa.array(sim.ravel()[v], pa.int64()),
            "rank": pa.array(ranks.ravel()[v], pa.int64())})


def knn_graph(ds, k: int = 4, id_col: str = "vec_id",
              col: str = "embedding", side_col: str | None = None,
              concurrency=(1, 8)):
    """Exact cosine k-NN graph over an embedding Dataset:
    (vec_id, nbr_id, sim_e6, rank). The corpus is normalized ONCE and
    materialized; the same materialized blocks serve as both the query
    stream and the broadcast-scanned index. ``side_col`` restricts
    neighbors to the OPPOSITE side (cross-lingual / cross-modal
    mining)."""

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {"vec_id": pa.array([], pa.int64()),
                    "unit": pa.array([], pa.list_(pa.float64()))}
            if side_col:
                cols["side"] = pa.array([], pa.int64())
            return pa.table(cols)
        m = _normalize(batch_to_matrix(t, col))
        out = {"vec_id": t[id_col],
               "unit": pa.FixedSizeListArray.from_arrays(
                   pa.array(m.ravel(), pa.float64()), m.shape[1])}
        if side_col:
            out["side"] = t[side_col]
        return pa.table(out)

    mat = ds.map_batches(prep, batch_format="pyarrow").materialize()
    refs = list(mat.to_arrow_refs())
    return mat.map_batches(
        BlockKnnScan,
        fn_constructor_kwargs={"block_refs": refs, "k": k,
                               "cross_side": side_col is not None},
        batch_format="pyarrow", concurrency=concurrency)


def knn_graph_lsh(ds, k: int = 4, bits: int = 8, seed: int = 5,
                  id_col: str = "vec_id", col: str = "embedding",
                  side_col: str | None = None, multiprobe: bool = True):
    """APPROXIMATE cosine k-NN graph — the scale path past
    :func:`knn_graph`'s exact O(n²) blocked scan: random-hyperplane
    LSH buckets (one signature per vector) with MULTI-PROBE candidate
    emission (each vector also lands in every 1-bit-flip neighbor
    bucket, so near-misses across one hyperplane are still co-bucketed
    — the standard recall lever that costs ×(bits+1) narrow rows, not
    ×n). Exact cosine + the same total-order int64 key INSIDE each
    bucket; cross-bucket duplicates collapse in a (vec, nbr) groupby
    before the per-vector top-k. Same output schema as knn_graph.

    Bucket count (2^bits) must scale with the corpus — like IVF's
    n_lists — so per-bucket groups stay bounded; recall vs the exact
    graph is measured in tests (and tunable via bits/multiprobe)."""
    import pandas as pd

    rng_planes = np.random.default_rng(seed)

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {"bucket": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "unit": pa.array([], pa.list_(pa.float64()))}
            if side_col:
                cols["side"] = pa.array([], pa.int64())
            return pa.table(cols)
        m = _normalize(batch_to_matrix(t, col))
        planes = np.random.default_rng(seed).standard_normal(
            (m.shape[1], bits))
        sig = (((m @ planes) > 0)
               * (1 << np.arange(bits))).sum(axis=1).astype(np.int64)
        reps = bits + 1 if multiprobe else 1
        bkt = np.repeat(sig, reps)
        if multiprobe:
            flips = np.concatenate([[0], 1 << np.arange(bits)])
            bkt = np.bitwise_xor(bkt,
                                 np.tile(flips, len(m)).astype(np.int64))
        out = {"bucket": pa.array(bkt, pa.int64()),
               "vec_id": pa.array(
                   np.repeat(t[id_col].to_numpy(zero_copy_only=False),
                             reps), pa.int64()),
               "unit": pa.FixedSizeListArray.from_arrays(
                   pa.array(np.repeat(m, reps, axis=0).ravel(),
                            pa.float64()), m.shape[1])}
        if side_col:
            out["side"] = pa.array(
                np.repeat(t[side_col].to_numpy(zero_copy_only=False),
                          reps), pa.int64())
        return pa.table(out)

    del rng_planes

    def bucket_scan(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy(np.int64)
        m = np.stack(g["unit"].to_numpy())
        key = (np.round((m @ m.T) * 1e6).astype(np.int64) << 32) - ids
        sentinel = -(1 << 62)
        key[ids[:, None] == ids[None, :]] = sentinel  # self + dup rows
        if side_col is not None:
            sd = g["side"].to_numpy(np.int64)
            key[sd[:, None] == sd[None, :]] = sentinel
        kk = min(k, key.shape[1])
        part = np.argpartition(-key, kk - 1, axis=1)[:, :kk]
        cand = np.take_along_axis(key, part, axis=1).ravel()
        qq = np.repeat(ids, kk)
        keep = cand > sentinel
        return pd.DataFrame({"vec_id": qq[keep], "key": cand[keep]})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        # multi-probe emits the same (vec, nbr) pair from several
        # buckets with the IDENTICAL key — np.unique dedups inside the
        # per-vector group (a separate (vec, key) dedup groupby would
        # be a whole extra all-to-all of the widest table)
        kv = np.unique(g["key"].to_numpy(np.int64))[::-1][:k]
        nbr = (-kv) & ((1 << 32) - 1)
        sim = (kv + nbr) >> 32
        return pd.DataFrame({
            "vec_id": np.repeat(g["vec_id"].iloc[0], len(kv)),
            "nbr_id": nbr, "sim_e6": sim,
            "rank": np.arange(1, len(kv) + 1, dtype=np.int64)})

    cand = (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("bucket").map_groups(bucket_scan,
                                          batch_format="pandas"))
    return cand.groupby("vec_id").map_groups(finish,
                                             batch_format="pandas")


_BQ_POP8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def bq_encode(m: np.ndarray) -> np.ndarray:
    """BINARY QUANTIZATION (sign-bit codes — the 1-bit-per-dim vector
    compression of Charikar STOC'02 hyperplane sketches, as deployed
    in modern vector stores): row-wise 64-bit code with bit j set iff
    coordinate j > 0. 512× smaller than float64; Hamming distance on
    codes approximates angular distance."""
    bits = (m > 0).astype(np.uint8)
    pad = (-bits.shape[1]) % 64  # whole uint64 words
    if pad:
        bits = np.concatenate(
            [bits, np.zeros((len(bits), pad), np.uint8)], axis=1)
    by = np.packbits(bits, axis=1)
    w = by.shape[1] // 8
    return by.view(">u8").astype(np.uint64).reshape(len(bits), w)


def _bq_hamming(codes: np.ndarray, qcode: np.ndarray) -> np.ndarray:
    """Row-wise popcount(codes XOR qcode) via the byte table."""
    x = codes ^ qcode[None, :]
    return _BQ_POP8[x.copy().view(np.uint8)].reshape(len(x), -1) \
        .sum(axis=1).astype(np.int64)


def bq_score_batch(batch: pa.Table, *, queries_ref, k: int,
                   cand: int) -> pa.Table:
    """One stateless BQ scan pass: encode the batch to sign codes,
    take the ``cand`` Hamming-nearest rows per query (ties by vec_id),
    exact-cosine re-rank only those — the Hamming prefilter does the
    memory-bound scan, full-precision touches ≤ cand rows per batch."""
    q = ray.get(queries_ref)  # {qid: vector}
    if batch.num_rows == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    m = _normalize(batch_to_matrix(batch))
    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    codes = bq_encode(m)
    out_q, out_v, out_s = [], [], []
    for qid in sorted(q):
        qv = np.asarray(q[qid], np.float64)
        qv = qv / np.linalg.norm(qv)
        ham = _bq_hamming(codes, bq_encode(qv[None, :])[0])
        take = min(cand, len(ham))
        sel = np.lexsort((ids, ham))[:take]
        sims = m[sel] @ qv
        kk = min(k, take)
        best = np.argpartition(-sims, kk - 1)[:kk] if take > kk \
            else np.arange(take)
        out_q.extend([qid] * len(best))
        out_v.extend(ids[sel][best].tolist())
        out_s.extend(sims[best].tolist())
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "vec_id": pa.array(out_v, pa.int64()),
                     "score": pa.array(out_s, pa.float64())})


def bq_topk(ds, queries: dict[int, np.ndarray], k: int,
            cand: int = 64):
    """Binary-quantized ANN end-to-end: broadcast queries once, ONE
    stateless encode+Hamming-prefilter+exact-rerank pass, the shared
    per-query fixed-point top-k reduce. Approximate by construction
    (cross-batch prefilter misses only) — recall bounds pytested."""
    qref = ray.put(queries)
    cands = ds.map_batches(
        bq_score_batch,
        fn_kwargs={"queries_ref": qref, "k": k, "cand": cand},
        batch_format="pyarrow", num_cpus=1)
    return cands.groupby("query_id").map_groups(
        topk_reduce(k), batch_format="pandas")
