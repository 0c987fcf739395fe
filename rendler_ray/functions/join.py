"""Skew-resistant equi-join: the hot-key/cold-key hybrid every
shuffle-join engine needs at web scale.

A plain hash join partitions both sides by ``hash(key) % P``; a hot key
(one user generating half the events, one host dominating a crawl) lands
its ENTIRE row set in one partition — that task runs as long as the key
is big, and the join is serial no matter how many nodes exist. The
standard fix (what the builder brief calls "salt hot keys") splits the
plan by key temperature:

- **hot keys** (found exactly with the two-pass Misra–Gries pattern in
  :func:`rendler_ray.functions.sketch.heavy_hitters`) never shuffle at
  all: the small-dimension side's rows for those few keys broadcast once
  (``ray.put``) and the fact side's hot rows join map-side inside
  ``map_batches`` — each hot key's work is spread over every block that
  contains it, which is exactly the parallelism the hash join lost;
- **cold keys** flow through the normal distributed hash join, which is
  balanced by construction once the hot keys are gone.

The union of both legs equals the plain inner join row-for-row
(pytest-asserted, including under adversarial 50%-single-key skew).
Assumes the RIGHT side is the dimension side: bounded rows per key, so
the broadcast leg is |hot keys| × rows-per-key — a few KB even when the
hot keys cover half the fact table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray


def skew_join(left, right, on: str, right_on: str | None = None,
              hot_eps: float = 0.02, num_partitions: int = 8,
              stats: dict | None = None):
    """Inner equi-join ``left ⋈ right`` on ``left[on] == right[right_on]``
    with exact hot-key extraction (keys covering ≥ ``hot_eps`` of the
    left side are broadcast-joined map-side; the rest hash-join).
    Output columns = left columns + right columns minus the right key
    (dropped — it duplicates the left key — matching ``Dataset.join``'s
    contract). ``stats`` (optional dict) gets
    ``hot_keys`` / ``n_hot_keys`` recorded for tests/telemetry."""
    from rendler_ray.functions.sketch import heavy_hitters
    from rendler_ray.goldenhash import to_pandas

    right_on = right_on or on
    hh = to_pandas(heavy_hitters(left, on, eps=hot_eps))
    # an all-cold left side yields a 0-row frame that may have lost its
    # columns (empty-Dataset schema drop) — treat either as "no hot keys"
    hot = hh[on].to_numpy() if on in hh.columns else np.zeros(0)
    if stats is not None:
        stats["hot_keys"] = sorted(hot.tolist())
        stats["n_hot_keys"] = len(hot)

    if len(hot) == 0:
        return left.join(right, join_type="inner",
                         num_partitions=num_partitions,
                         on=(on,), right_on=(right_on,))

    hot_arr = pa.array(hot)

    # dimension-side rows for the hot keys: bounded (|hot| keys × the
    # dim side's rows-per-key), collected once and broadcast
    rhot_tbl = pa.concat_tables(
        right.map_batches(
            lambda t: t.filter(pc.is_in(t[right_on], value_set=hot_arr)),
            batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    rref = ray.put(rhot_tbl)

    def hot_leg(t: pa.Table) -> pa.Table:
        rt = ray.get(rref)
        lt = t.filter(pc.is_in(t[on], value_set=hot_arr))
        ldf = lt.to_pandas()
        rdf = rt.to_pandas()
        j = ldf.merge(rdf, left_on=on, right_on=right_on)
        if right_on != on:
            # match Dataset.join's output contract: the right key
            # column is dropped (it duplicates the left key)
            j = j.drop(columns=[right_on])
        return pa.Table.from_pandas(j, preserve_index=False)

    def cold_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t[on], value_set=hot_arr)))

    hot_ds = left.map_batches(hot_leg, batch_format="pyarrow")
    # sanitize the cold side before the hash join: when the hot keys
    # cover most of the left side (an extreme but legal skew), many —
    # or all — cold blocks are empty, and Ray's join aggregator chokes
    # on empty schema-less partitions (ROUND2 notes / CLAUDE.md)
    from rendler_ray.state.politeness import _nonempty_blocks

    cold_left = _nonempty_blocks(
        left.map_batches(cold_filter, batch_format="pyarrow")
        .materialize())
    if cold_left is None:  # every left key is hot
        return hot_ds
    cold = cold_left.join(right, join_type="inner",
                          num_partitions=num_partitions,
                          on=(on,), right_on=(right_on,))
    # align column order (left columns then right columns minus the
    # dropped right key — Dataset.join's contract; computed from
    # inputs, not by triggering execution for schema inference)
    cols = list(left.schema().names) + [
        c for c in right.schema().names if c != right_on]

    def order(t: pa.Table) -> pa.Table:
        return t.select(cols)

    return hot_ds.union(cold.map_batches(order, batch_format="pyarrow"))
