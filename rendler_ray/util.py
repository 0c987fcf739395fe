"""Dataset utilities the Ray Data API doesn't provide directly."""

from __future__ import annotations

import ray
import ray.data
import pyarrow as pa


@ray.remote
def _add_seq_block(block: pa.Table, offset: int, column: str) -> pa.Table:
    seq = pa.array(range(offset, offset + block.num_rows), type=pa.int64())
    return block.append_column(column, seq)


def with_row_seq(
    ds: "ray.data.Dataset",
    sort_keys: list[str],
    start: int = 0,
    column: str = "seq",
) -> "ray.data.Dataset":
    """Globally sort ``ds`` by ``sort_keys`` and assign a dense, contiguous
    int64 row number ``column`` starting at ``start``.

    This is a distributed zip-with-index: sort (range-partitioned blocks in
    global order) → read per-block row counts from block METADATA only
    (no data fetched to the driver) → cumulative offsets → one remote task
    per block appends the seq column. The Dataset API cannot express this
    (block index is not visible to ``map_batches``), so this is one of the
    few places raw Ray tasks are justified (SURVEY.md §2, custom operators).
    """
    m = ds.sort(sort_keys).materialize()
    refs: list[ray.ObjectRef] = []
    offset = start
    for bundle in m.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            refs.append(_add_seq_block.remote(block_ref, offset, column))
            offset += meta.num_rows
    if not refs:
        return m  # empty dataset: nothing to number
    return ray.data.from_arrow_refs(refs)


def table_from_ds(ds: "ray.data.Dataset") -> pa.Table:
    """Materialize a SMALL dataset to one Arrow table (tests / exports)."""
    tables = [b for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default")
