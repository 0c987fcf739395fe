"""Dataset utilities the Ray Data API doesn't provide directly."""

from __future__ import annotations

import ray
import ray.data
import pyarrow as pa


@ray.remote
def _add_seq_slice(block: pa.Table, offset: int, column: str,
                   row0: int, n_rows: int) -> pa.Table:
    sl = block.slice(row0, n_rows)  # zero-copy
    seq = pa.array(range(offset, offset + sl.num_rows), type=pa.int64())
    return sl.append_column(column, seq)


def with_row_seq(
    ds: "ray.data.Dataset",
    sort_keys: list[str],
    start: int = 0,
    column: str = "seq",
    target_rows_per_block: int = 4096,
) -> "ray.data.Dataset":
    """Globally sort ``ds`` by ``sort_keys`` and assign a dense, contiguous
    int64 row number ``column`` starting at ``start``.

    This is a distributed zip-with-index: sort (range-partitioned blocks in
    global order) → read per-block row counts from block METADATA only
    (no data fetched to the driver) → cumulative offsets → remote tasks
    append the seq column. The Dataset API cannot express this (block index
    is not visible to ``map_batches``), so this is one of the few places
    raw Ray tasks are justified (SURVEY.md §2, custom operators).

    Output blocks are capped at ``target_rows_per_block`` rows (zero-copy
    slices): sort often emits FEW large blocks, and block count is the
    parallelism ceiling for every downstream map stage — without the split
    a whole crawl round would run nearly serial.
    """
    m = ds.sort(sort_keys).materialize()
    refs: list[ray.ObjectRef] = []
    offset = start
    for bundle in m.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            n = meta.num_rows
            row0 = 0
            while row0 < n:
                k = min(target_rows_per_block, n - row0)
                refs.append(
                    _add_seq_slice.remote(block_ref, offset, column, row0, k))
                offset += k
                row0 += k
    if not refs:
        return m  # empty dataset: nothing to number
    return ray.data.from_arrow_refs(refs)


def lru_get(cache: dict, key, factory, maxsize: int = 8):
    """Bounded per-worker stage cache: dict-as-LRU (insertion order =
    recency; hit re-inserts). Long-lived workers run many pipelines in
    one session, and ObjectRefs from finished pipelines never recur —
    unbounded caches would accumulate dead broadcast copies. Eviction is
    cheap to get wrong-ish: a re-build is one zero-copy ``ray.get`` or a
    deterministic constructor."""
    if key in cache:
        val = cache.pop(key)
        cache[key] = val
        return val
    val = factory()
    while len(cache) >= maxsize:
        cache.pop(next(iter(cache)))
    cache[key] = val
    return val


def table_from_ds(ds: "ray.data.Dataset") -> pa.Table:
    """Materialize a SMALL dataset to one Arrow table (tests / exports)."""
    tables = [b for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default")
