"""Distributed sketches: HyperLogLog approximate distinct counting and
Misra–Gries two-pass exact heavy hitters.

Standard HLL (Flajolet et al. 2007, public paper): p-bit bucket index,
max leading-zero rank per bucket, harmonic-mean estimate with the usual
small-range correction. The distributed shape is the interesting part:
each ``map_batches`` task emits one PARTIAL register row per group
(register arrays as fixed-size binary), and partials combine with an
element-wise ``max`` — a commutative, idempotent reduce, so the result
is independent of batch order and safe under task retries. The combine
runs as ``groupby(key).map_groups`` over rows of ~2^p bytes, never over
the raw data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rendler_ray.functions.canon import stable_hash64


def hll_partial_batch(batch: pa.Table, *, key_col: str, val_col: str,
                      p: int = 12) -> pa.Table:
    """One partial-register row per key in this batch:
    (key, registers: binary[2^p])."""
    m = 1 << p
    keys = batch[key_col].to_numpy(zero_copy_only=False)
    h = stable_hash64(batch[val_col].to_numpy(zero_copy_only=False))
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    # rank = leading zeros of the remaining bits + 1 (capped at 64-p+1)
    rank = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    nz = rest != 0
    # leading zeros via bit_length: lz = 64 - bit_length(rest)
    bl = np.zeros(len(h), dtype=np.int64)
    r = rest[nz]
    for shift in (32, 16, 8, 4, 2, 1):  # branchless bit-length, vectorized
        big = r >= (np.uint64(1) << np.uint64(shift))
        bl_add = np.where(big, shift, 0)
        r = np.where(big, r >> np.uint64(shift), r)
        bl[nz] += bl_add
    bl[nz] += 1  # bit_length of remaining value
    rank_nz = (64 - bl[nz] + 1).astype(np.uint8)
    rank[nz] = rank_nz

    out_keys, out_regs = [], []
    df = pd.DataFrame({"k": keys, "b": bucket, "r": rank})
    for k, g in df.groupby("k", sort=False):
        regs = np.zeros(m, dtype=np.uint8)
        np.maximum.at(regs, g["b"].to_numpy(), g["r"].to_numpy())
        out_keys.append(k)
        out_regs.append(regs.tobytes())
    return pa.table({key_col: pa.array(out_keys),
                     "registers": pa.array(out_regs, pa.binary())})


def hll_merge_group(g: pd.DataFrame, p: int = 12) -> pd.DataFrame:
    """Element-wise max over the group's partial registers → estimate."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    for blob in g["registers"]:
        regs = np.maximum(regs, np.frombuffer(blob, np.uint8))
    est = hll_estimate(regs, p)
    key_col = [c for c in g.columns if c != "registers"][0]
    return pd.DataFrame({key_col: [g[key_col].iloc[0]],
                         "approx_distinct": [int(round(est))]})


def hll_estimate(regs: np.ndarray, p: int) -> float:
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(2.0 ** -regs.astype(np.float64))
    if e <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            e = m * np.log(m / zeros)  # linear counting, small range
    return float(e)


def approx_distinct(ds, key_col: str, val_col: str, p: int = 12):
    """Dataset pipeline: per-batch partials → groupby(key) max-merge.
    Error ~1.04/sqrt(2^p) ≈ 1.6% at p=12."""
    partials = ds.map_batches(
        hll_partial_batch, fn_kwargs={"key_col": key_col,
                                      "val_col": val_col, "p": p},
        batch_format="pyarrow")
    return partials.groupby(key_col).map_groups(
        lambda g: hll_merge_group(g, p), batch_format="pandas")


# --------------------------------------------------- exact heavy hitters


def mg_candidates_batch(batch: pa.Table, *, col: str,
                        eps: float) -> pa.Table:
    """Misra–Gries (1982, public) summary of one batch: the ≤ ceil(1/eps)
    candidate keys whose batch frequency can reach eps·batch_rows.
    Pigeonhole: any key with GLOBAL frequency ≥ eps·N has local
    frequency ≥ eps·n_b in at least one batch, so the union of per-batch
    candidates is a superset of the true frequent keys — no cross-batch
    state needed. Vectorized: a batch-local count + threshold stands in
    for the sequential decrement loop (same guarantee, tighter set)."""
    vals = batch[col].to_numpy(zero_copy_only=False)
    if len(vals) == 0:
        return pa.table({col: pa.array([], batch[col].type)})
    u, c = np.unique(vals, return_counts=True)
    keep = c >= max(1, int(np.ceil(eps * len(vals))))
    return pa.table({col: pa.array(u[keep].tolist(), batch[col].type)})


def heavy_hitters(ds, col: str, eps: float = 0.005):
    """EXACT frequent items via the classic two-pass sketch pattern:
    pass 1 fans out per-batch Misra–Gries candidate summaries (bounded
    ≤ 1/eps rows per batch — never the raw column) and dedups them;
    pass 2 exactly recounts ONLY the candidates (broadcast ``is_in``
    filter → groupby count) and keeps counts ≥ ceil(eps·N). The
    candidate superset property makes the output exactly equal to
    ``GROUP BY col HAVING count(*) >= ceil(eps*N)`` — SQL-oracle-able,
    unlike a one-pass approximate sketch."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    n = ds.count()
    if n == 0:
        # same typed empty table as the no-candidates branch below — a
        # raw empty Dataset loses its schema through to_pandas
        sch = ds.schema()
        col_type = dict(zip(sch.names, sch.types))[col]
        return pa.table({col: pa.array([], col_type),
                         "n": pa.array([], pa.int64())})
    thr = max(1, int(np.ceil(eps * n)))
    cand = (ds.map_batches(mg_candidates_batch,
                           fn_kwargs={"col": col, "eps": eps},
                           batch_format="pyarrow")
            .groupby(col).aggregate(Count(alias_name="_n"))
            .select_columns([col]))
    # candidate set is ≤ (batches × 1/eps) keys — broadcast class
    batches = list(cand.iter_batches(batch_size=None,
                                     batch_format="pyarrow"))
    if not batches:  # no key frequent in ANY batch => none frequent globally
        sch = ds.schema()  # ray Schema wrapper: parallel names/types lists
        col_type = dict(zip(sch.names, sch.types))[col]
        # a pyarrow Table, NOT an empty Dataset: Dataset.to_pandas()
        # drops the columns of an all-empty dataset (schema mismatch
        # downstream); the Arrow table keeps the typed schema
        return pa.table({col: pa.array([], col_type),
                         "n": pa.array([], pa.int64())})
    cref = ray.put(pa.concat_tables(batches)[col].combine_chunks())

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[col], value_set=ray.get(cref)))

    counts = (ds.map_batches(keep, batch_format="pyarrow")
              .groupby(col).aggregate(Count(alias_name="n")))
    return counts.map_batches(
        lambda t, v=thr: t.filter(pc.greater_equal(t["n"], v)),
        batch_format="pyarrow")


def approx_quantiles(ds, col: str, percents: list[int],
                     bins: int = 1 << 14):
    """Approximate quantiles by a two-pass fixed-width histogram sketch:
    pass 1 folds per-batch (min, max) partials to the global range;
    pass 2 emits per-batch NON-ZERO (bucket, count) rows — a local
    combiner, so the shuffle carries ≤ ``bins`` rows per batch — and a
    native ``groupby(bucket).sum`` merges them (commutative integer
    adds: deterministic under any batch order/retry, unlike a float
    t-digest whose centroids depend on merge order). The driver then
    walks the ≤ ``bins``-row cumulative histogram.

    Error bound: the returned value is a real bucket LEFT EDGE within
    (max-min)/bins of the exact quantile value (asserted in tests).
    ``percents`` are integer percentages; ranks use the exact integer
    form ceil(p·n/100) = (p·n + 99)//100. Returns a pyarrow Table
    (percent, value). This is the unbounded-cardinality fallback to the
    exact value-histogram percentile (queries.percentile_order_values).
    """
    from ray.data.aggregate import Sum

    def minmax(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        if len(v) == 0:
            return pa.table({"mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({"mn": [float(np.min(v))],
                         "mx": [float(np.max(v))]})

    mm = ds.map_batches(minmax, batch_format="pyarrow")
    gmn, gmx = mm.min("mn"), mm.max("mx")
    if gmn is None:
        return pa.table({"percent": pa.array([], pa.int64()),
                         "value": pa.array([], pa.float64())})
    width = (gmx - gmn) / bins

    def hist(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        if width == 0.0:
            b = np.zeros(len(v), dtype=np.int64)
        else:
            b = np.clip(((v - gmn) / width).astype(np.int64), 0, bins - 1)
        bucket, n = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(bucket, pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    counts = (ds.map_batches(hist, batch_format="pyarrow")
              .groupby("bucket").aggregate(Sum("n", alias_name="n")))
    rows = sorted((r["bucket"], r["n"]) for r in counts.take_all())
    buckets = np.array([b for b, _ in rows], dtype=np.int64)
    cum = np.cumsum(np.array([n for _, n in rows], dtype=np.int64))
    total = int(cum[-1])
    out_p, out_v = [], []
    for p in percents:
        rank = (p * total + 99) // 100
        i = int(np.searchsorted(cum, rank))
        out_p.append(int(p))
        out_v.append(float(gmn + buckets[i] * width))
    return pa.table({"percent": pa.array(out_p, pa.int64()),
                     "value": pa.array(out_v, pa.float64())})


def approx_quantiles_by(ds, key_col: str, col: str, percents: list[int],
                        bins: int = 1 << 12):
    """Per-group approximate quantiles (grouped form of
    :func:`approx_quantiles`): pass 1 folds per-batch per-group
    (min, max) partials through a native groupby — one row per group —
    and broadcasts the range dict (bounded by group count, the same
    posture as the politeness budget-gate thresholds); pass 2 emits
    per-batch non-zero (key, bucket, count) partials against each
    group's OWN range, merges them with an integer groupby sum, and a
    per-group cumulative walk picks rank (p·n + 99)//100. Error per
    group ≤ (group max - group min)/bins. Returns a Dataset
    (key, percent, value); deterministic."""
    import ray
    from ray.data.aggregate import Max, Min, Sum

    def minmax(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": t[key_col].to_numpy(zero_copy_only=False),
            "v": t[col].to_numpy(zero_copy_only=False).astype(np.float64)})
        g = df.groupby("k", sort=False)["v"].agg(["min", "max"])
        return pa.table({key_col: pa.array(g.index.to_numpy(object)),
                         "mn": pa.array(g["min"].to_numpy(np.float64)),
                         "mx": pa.array(g["max"].to_numpy(np.float64))})

    ranges = (ds.map_batches(minmax, batch_format="pyarrow")
              .groupby(key_col).aggregate(Min("mn", alias_name="mn"),
                                          Max("mx", alias_name="mx")))
    rdict: dict = {}
    for b in ranges.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for k, mn, mx in zip(b[key_col].to_pylist(), b["mn"].to_pylist(),
                             b["mx"].to_pylist()):
            rdict[k] = (mn, (mx - mn) / bins)
    if not rdict:
        return ds.map_batches(lambda t: pa.table({
            key_col: pa.array([], pa.string()),
            "percent": pa.array([], pa.int64()),
            "value": pa.array([], pa.float64())}), batch_format="pyarrow")
    ref = ray.put(rdict)

    def hist(t: pa.Table) -> pa.Table:
        rd_ = ray.get(ref)
        keys = pd.Series(t[key_col].to_numpy(zero_copy_only=False),
                         dtype=object)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        mn = keys.map(lambda k: rd_[k][0]).to_numpy(np.float64)
        w = keys.map(lambda k: rd_[k][1]).to_numpy(np.float64)
        b = np.zeros(len(v), dtype=np.int64)
        nz = w > 0
        b[nz] = np.clip(((v[nz] - mn[nz]) / w[nz]).astype(np.int64),
                        0, bins - 1)
        g = (pd.DataFrame({"k": keys, "bucket": b, "n": 1})
             .groupby(["k", "bucket"], sort=False).sum().reset_index())
        return pa.table({key_col: pa.array(g["k"].to_numpy(object)),
                         "bucket": pa.array(g["bucket"].to_numpy(np.int64),
                                            pa.int64()),
                         "n": pa.array(g["n"].to_numpy(np.int64),
                                       pa.int64())})

    counts = (ds.map_batches(hist, batch_format="pyarrow")
              .groupby([key_col, "bucket"])
              .aggregate(Sum("n", alias_name="n")))

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        rd_ = ray.get(ref)
        k = g[key_col].iloc[0]
        mn, w = rd_[k]
        g = g.sort_values("bucket")
        cum = np.cumsum(g["n"].to_numpy(np.int64))
        buckets = g["bucket"].to_numpy(np.int64)
        total = int(cum[-1])
        rows = []
        for p in percents:
            rank = (p * total + 99) // 100
            i = int(np.searchsorted(cum, rank))
            rows.append((k, int(p), float(mn + buckets[i] * w)))
        return pd.DataFrame(rows, columns=[key_col, "percent", "value"])

    return counts.groupby(key_col).map_groups(walk, batch_format="pandas")


# ------------------------------------------------------- Bloom filter


def _splitmix64(x: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized splitmix64 finalizer (Steele et al. '14) over int64
    keys — wrapping uint64 arithmetic, deterministic everywhere."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(seed)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def bloom_build(ds, col: str, m_bits: int = 1 << 20, k: int = 4) -> np.ndarray:
    """Distributed Bloom-filter build over an int64 key column: each
    batch emits ONE fixed-size packed-uint64 bitmap partial; partials
    OR-fold on the driver (#blocks × m/8 bytes — 128 KiB each at the
    default m; a tree `union` reduce replaces the driver fold when
    #blocks × m stops being driver-sized). Double hashing per
    Kirsch–Mitzenmacher'06: position_i = h1 + i·h2 (mod m)."""
    words = m_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        keys = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        bm = np.zeros(words, np.uint64)
        h1 = _splitmix64(keys, 0x51_7C_C1_B7)
        h2 = _splitmix64(keys, 0x27_22_0A_95) | np.uint64(1)
        with np.errstate(over="ignore"):
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
                np.bitwise_or.at(
                    bm, (pos >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.large_binary())})

    out = np.zeros(words, np.uint64)
    for b in (ds.select_columns([col])
              .map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        for v in b["bm"]:
            out |= np.frombuffer(v.as_py(), np.uint64)
    return out


def bloom_contains(bitmap: np.ndarray, keys: np.ndarray,
                   m_bits: int, k: int = 4) -> np.ndarray:
    """Vectorized membership test mask (true ⇒ maybe-member; false ⇒
    definitely absent). Same double-hash family as :func:`bloom_build`."""
    keys = keys.astype(np.int64)
    h1 = _splitmix64(keys, 0x51_7C_C1_B7)
    h2 = _splitmix64(keys, 0x27_22_0A_95) | np.uint64(1)
    hit = np.ones(len(keys), dtype=bool)
    with np.errstate(over="ignore"):
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
            w = bitmap[(pos >> np.uint64(6)).astype(np.int64)]
            hit &= ((w >> (pos & np.uint64(63))) & np.uint64(1)).astype(bool)
    return hit
