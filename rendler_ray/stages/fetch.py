"""Fetch stage: the Ray-Data-native replacement for RENDLER's CrawlExecutor
HTTP GET (``python/crawl_executor.py::launchTask``, SURVEY.md §2.1 S2).

The sandbox web is closed-world: page content lives in the interleaved
``docs`` table. The web is sharded across ``WebShard`` actors by stable
URL hash — each shard holds 1/N of the corpus in memory with an exact
index, mirroring how a real fetch fleet would partition connection state
by host shard. The ``Fetcher`` is a ``map_batches`` callable-CLASS
(actor pool): it holds the shard handles (resolved once per actor in
``__init__``) and per batch does one bulk lookup RPC per shard —
assembly is pure Arrow ``take``/``filter``/``concat`` (no Python-object
round-trip of the span payloads).

A miss is a 404: status recorded, empty span list, no render, no links —
matching the reference's TASK_FAILED path (fetch errors just logged,
URL dropped; SURVEY.md §4.1 retries row).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from rendler_ray.functions.canon import url_hash_shard
from rendler_ray.schema import SPAN_STRUCT


@ray.remote
class WebShard:
    """Holds the shard of the closed-world docs table with
    ``stable_hash64(doc_id) % num_shards == shard_id``.

    At real scale the docs table is hash-partitioned on storage and each
    shard reads only its own partition files; reading the single sandbox
    file and filtering is the small-scale stand-in.
    """

    def __init__(self, docs_path: str, shard_id: int, num_shards: int):
        tbl = pq.read_table(docs_path, columns=["doc_id", "spans"])
        sh = url_hash_shard(tbl["doc_id"], num_shards)
        self.tbl = tbl.filter(pa.array(sh == shard_id)).combine_chunks()
        self.index = {u: i for i, u in enumerate(self.tbl["doc_id"].to_pylist())}

    def get_many(self, urls: list[str]) -> tuple[np.ndarray, pa.Array]:
        """(found-mask aligned to input, spans rows for the found urls in
        input order)."""
        idx = np.fromiter(
            (self.index.get(u, -1) for u in urls), dtype=np.int64, count=len(urls)
        )
        mask = idx >= 0
        spans = self.tbl["spans"].take(pa.array(idx[mask]))
        return mask, spans.combine_chunks()

    def num_docs(self) -> int:
        return self.tbl.num_rows


def make_web_shards(docs_path: str, num_shards: int) -> list:
    return [
        WebShard.options(num_cpus=0.1).remote(docs_path, i, num_shards)
        for i in range(num_shards)
    ]


class Fetcher:
    """``map_batches`` actor-pool stage: frontier batch → fetch batch.

    Input columns: url, canon_url, host, depth, seq.
    Output adds:   status (200|404), spans.
    Output row order is NOT the input order (rows regroup by web shard);
    the ``seq`` column carries crawl order, so no stage depends on
    physical row order.
    """

    def __init__(self, shards: list):
        self.shards = shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _with_fetch_columns(batch, pa.array([], pa.int32()),
                                       pa.array([], pa.list_(SPAN_STRUCT)))
        urls = batch["url"].to_numpy(zero_copy_only=False)
        sh = url_hash_shard(urls, len(self.shards))
        futs = []
        for k in np.unique(sh):
            sel = np.flatnonzero(sh == k)
            futs.append(
                (sel, self.shards[int(k)].get_many.remote(urls[sel].tolist()))
            )
        parts: list[pa.Table] = []
        for sel, f in futs:
            mask, spans = ray.get(f)
            sub = batch.take(pa.array(sel))
            found = sub.filter(pa.array(mask))
            parts.append(
                _with_fetch_columns(
                    found, pa.array(np.full(found.num_rows, 200, np.int32)), spans
                )
            )
            missing = sub.filter(pa.array(~mask))
            if missing.num_rows:
                empty_spans = pa.array(
                    [[]] * missing.num_rows, type=pa.list_(SPAN_STRUCT)
                )
                parts.append(
                    _with_fetch_columns(
                        missing,
                        pa.array(np.full(missing.num_rows, 404, np.int32)),
                        empty_spans,
                    )
                )
        return pa.concat_tables(parts, promote_options="default")


def make_web_blobs(docs_path: str, num_shards: int) -> list:
    """Plasma-broadcast closed-world web: per hash shard, a
    (sorted doc_id numpy array, spans table in that order) pair is
    ``ray.put`` ONCE; every fetch task reads it zero-copy from the local
    object store. This is the 'broadcast the lookup side once, read in
    every task' pattern — no actor RPC round-trip, no payload
    re-serialization, scales with CPU count.

    At real scale the web obviously isn't broadcastable — there the
    fetch stage is network I/O and this path doesn't exist; the shard
    layout (hash by url) is the same one the storage partitioning uses.
    """
    tbl = pq.read_table(docs_path, columns=["doc_id", "spans"])
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    sh = url_hash_shard(ids, num_shards)
    refs = []
    for k in range(num_shards):
        sub = tbl.filter(pa.array(sh == k)).combine_chunks()
        ids_k = sub["doc_id"].to_numpy(zero_copy_only=False).astype(str)
        order = np.argsort(ids_k, kind="stable")
        refs.append(ray.put((ids_k[order],
                             sub.take(pa.array(order)).combine_chunks())))
    return refs


# per-worker zero-copy cache of resolved web shards (ObjectRef hex ->
# blob), LRU-bounded: refs from finished crawls never recur, and a miss
# is one zero-copy ray.get from local plasma
_WEB_CACHE: dict = {}


def _web_shard(ref):
    from rendler_ray.util import lru_get

    return lru_get(_WEB_CACHE, ref.hex(), lambda: ray.get(ref), maxsize=16)


def fetch_batch(batch: pa.Table, *, shards: list) -> pa.Table:
    """Task-pool fetch over plasma web shards (see ``make_web_blobs``):
    vectorized ``np.searchsorted`` lookup per shard, Arrow ``take`` for
    the span payloads — no Python per-row work, no actor round-trips."""
    n = batch.num_rows
    if n == 0:
        return _with_fetch_columns(batch, pa.array([], pa.int32()),
                                   pa.array([], pa.list_(SPAN_STRUCT)))
    urls = batch["url"].to_numpy(zero_copy_only=False)
    sh = url_hash_shard(urls, len(shards))
    parts: list[pa.Table] = []
    for k in np.unique(sh):
        ids_sorted, spans_tbl = _web_shard(shards[int(k)])
        sel = np.flatnonzero(sh == k)
        u = urls[sel].astype(str)
        pos = np.searchsorted(ids_sorted, u)
        pos_c = np.minimum(pos, len(ids_sorted) - 1)
        mask = (ids_sorted[pos_c] == u) if len(ids_sorted) else \
            np.zeros(len(u), dtype=bool)
        sub = batch.take(pa.array(sel))
        found = sub.filter(pa.array(mask))
        if found.num_rows:
            spans = spans_tbl["spans"].take(
                pa.array(pos_c[mask])).combine_chunks()
            parts.append(_with_fetch_columns(
                found, pa.array(np.full(found.num_rows, 200, np.int32)),
                spans))
        missing = sub.filter(pa.array(~mask))
        if missing.num_rows:
            empty_spans = pa.array([[]] * missing.num_rows,
                                   type=pa.list_(SPAN_STRUCT))
            parts.append(_with_fetch_columns(
                missing, pa.array(np.full(missing.num_rows, 404, np.int32)),
                empty_spans))
    return pa.concat_tables(parts, promote_options="default")


def inject_transient_failures(t: pa.Table, *, fail_rate: float,
                              fail_seed: int = 0,
                              retries: int = 2) -> pa.Table:
    """Deterministic transient-failure model for the fetch stage — the
    closed-world stand-in for the HTTP timeouts / connection resets a
    real fetcher sees. Each (url, attempt) draws an independent hash
    coin: attempt ``a`` of url ``u`` fails iff
    ``stable_hash64(f"{u}#a{a}#s{seed}") < fail_rate · 2^64``.

    Retry semantics (what slots into the ``Fetcher`` seam for a real
    deployment, where they differ from plasma lookups): transient
    errors retry IN-TASK up to ``retries`` times with bounded attempts
    — no re-enqueue into the frontier, no cross-round state; a url
    still failing after the last attempt reports **status 598** with
    no spans, so it is rendered-nothing / extracts-nothing / still
    SEEN — exactly the reference's TASK_FAILED path (failure logged,
    URL dropped, never refetched). Because failures here are purely
    transient, a run with enough retries is bit-identical to a
    failure-free run — pinned by tests/test_fetch_retries.py. Columns
    and schema are unchanged whether the model is on or off.

    Vectorized: one hash pass per attempt over only the
    still-failing rows' draw; no Python per-row work."""
    from rendler_ray.functions.canon import stable_hash64

    if not fail_rate or t.num_rows == 0:
        return t
    lim = np.uint64(min(int(fail_rate * 2.0 ** 64), 2 ** 64 - 1))
    urls = t["url"].to_numpy(zero_copy_only=False).astype(str)
    failing = np.ones(len(urls), dtype=bool)
    idx = np.arange(len(urls))
    for a in range(retries + 1):
        salted = np.char.add(urls[idx], f"#a{a}#s{fail_seed}")
        idx = idx[stable_hash64(salted) < lim]
        if idx.size == 0:
            return t
    failing[:] = False
    failing[idx] = True
    ok = t.filter(pa.array(~failing))
    bad = t.filter(pa.array(failing))
    bad = bad.set_column(
        bad.schema.get_field_index("status"), "status",
        pa.array(np.full(bad.num_rows, 598, np.int32)))
    bad = bad.set_column(
        bad.schema.get_field_index("spans"), "spans",
        pa.array([[]] * bad.num_rows, type=pa.list_(SPAN_STRUCT)))
    return pa.concat_tables([ok, bad], promote_options="default")


def _with_fetch_columns(t: pa.Table, status: pa.Array, spans) -> pa.Table:
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    if len(spans):
        # redirect pages (a kind="redirect" span holding the Location
        # URL) report HTTP 301: render skips them (it keeps status==200
        # only) and extract emits the single Location edge. Vectorized:
        # flatten kinds once, mark parent rows.
        kinds = pc.list_flatten(spans).field("kind")
        redir_flat = pc.equal(kinds, "redirect").to_numpy(
            zero_copy_only=False)
        if redir_flat.any():
            par = pc.list_parent_indices(spans).to_numpy(
                zero_copy_only=False)
            mask = np.zeros(len(spans), dtype=bool)
            mask[par[redir_flat]] = True
            status = pc.if_else(pa.array(mask),
                                pa.scalar(301, pa.int32()), status)
    return t.append_column("status", status).append_column(
        "spans", pa.chunked_array([spans], type=pa.list_(SPAN_STRUCT))
    )
