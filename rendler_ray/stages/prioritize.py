"""Priority-driven frontier scheduling (focused crawling).

A training-data crawl under a fetch budget should spend fetches on the
most valuable pages first — the URL-ordering idea of Cho, García-Molina
& Page (WWW'98, "Efficient crawling through URL ordering"): schedule
the frontier by an importance estimate (typically PageRank from a prior
crawl of the same web) instead of FIFO. This stage decides WHICH
frontier rows fetch each round: the ``k`` highest-scored (score desc,
discovery ``seq`` asc on ties, unscored URLs at score 0); the rest
defer to later rounds exactly like politeness deferral. Without a depth
cap only the fetch order across rounds moves — the final fetched set is
the same reachable closure (conformance-tested); under a max_depth cap
the focused crawl instead spends its depth budget along high-score
paths (deferral can push first discovery of a page onto a longer path,
pruning that page's children — the defining trade of focused crawling).

Scale posture: scores attach by broadcast dict while the score table
fits (``broadcast_max`` rows), by a left-outer hash join on ``url``
above it — the same two-form contract as the politeness budget gate.
Selection pulls ONLY the (seq, score) columns to the driver (16 B/row,
the bounded posture of the crawl's seq ranking; a round past that cap
would swap in a distributed sort+limit on the packed key) and
broadcasts the admitted seq set (≤ k int64 rows).

Reference parity: mesosphere/RENDLER crawls strictly FIFO (its queue is
a list — SURVEY.md §2 O1); prioritization is part of the BASELINE.json
scope extension (training-data crawling as first-class).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

_FRONTIER_COLS = ["url", "canon_url", "host", "depth", "seq"]


def load_scores(path: str):
    """Score table parquet → Dataset (url, score:int64). Scores must be
    integers (fixed-point the float upstream — ordering by last-ulp
    float differences is not reproducible across reduction orders).

    Dedup on url (max score wins): the two attach forms would otherwise
    diverge on duplicate urls — the broadcast dict collapses them
    (last wins) while the left-outer join would DUPLICATE frontier rows,
    double-fetching a URL downstream. A no-op for unique score tables."""
    import ray.data as rd
    from ray.data.aggregate import Max

    return (rd.read_parquet(path, columns=["url", "score"])
            .groupby("url").aggregate(Max("score", alias_name="score")))


def _attach_broadcast(frontier, scores_ds):
    d: dict[str, int] = {}
    for b in scores_ds.iter_batches(batch_size=65536,
                                    batch_format="pyarrow"):
        d.update(zip(b["url"].to_pylist(), b["score"].to_pylist()))
    ref = ray.put(d)

    def fn(t: pa.Table) -> pa.Table:
        dd = ray.get(ref)
        s = (pd.Series(t["url"].to_numpy(zero_copy_only=False))
             .map(dd).fillna(0).astype(np.int64))
        return t.append_column("score", pa.array(s.to_numpy(), pa.int64()))

    return frontier.map_batches(fn, batch_format="pyarrow")


def _attach_join(frontier, scores_ds, num_partitions: int = 8):
    from rendler_ray.state.politeness import _nonempty_blocks

    # load_scores ends in a groupby, whose empty partitions emit
    # zero-column placeholder blocks that break a downstream hash join
    scores_ds = _nonempty_blocks(scores_ds.materialize())
    if scores_ds is None:  # empty score table: everything scores 0
        return frontier.map_batches(
            lambda t: t.append_column(
                "score", pa.array(np.zeros(t.num_rows, np.int64))),
            batch_format="pyarrow")
    joined = frontier.join(
        scores_ds, join_type="left_outer", num_partitions=num_partitions,
        on=("url",), right_on=("url",)).materialize()
    joined = _nonempty_blocks(joined)
    if joined is None:
        return None

    def fill(t: pa.Table) -> pa.Table:
        s = pc.fill_null(pc.cast(t["score"], pa.int64()), 0)
        i = t.schema.get_field_index("score")
        return t.set_column(i, "score", s)

    return joined.map_batches(fill, batch_format="pyarrow")


def priority_gate(frontier, scores_ds, k: int,
                  broadcast_max: int = 1_000_000):
    """Split a frontier dataset into (admitted, deferred): admitted =
    the ``k`` rows with the highest (score, -seq); deferred = the rest,
    or None when the whole frontier fits in ``k``. Deterministic
    (seq is unique)."""
    if frontier.count() <= k:
        return frontier, None
    scored = (_attach_broadcast(frontier, scores_ds)
              if scores_ds.count() <= broadcast_max
              else _attach_join(frontier, scores_ds))
    if scored is None:  # unreachable (frontier non-empty); defensive
        return frontier, None
    scored = scored.materialize()

    seqs_l, scores_l = [], []
    for b in (scored.select_columns(["seq", "score"])
              .iter_batches(batch_size=65536, batch_format="pyarrow")):
        seqs_l.append(b["seq"].to_numpy(zero_copy_only=False))
        scores_l.append(b["score"].to_numpy(zero_copy_only=False))
    seqs = np.concatenate(seqs_l)
    scores = np.concatenate(scores_l)
    order = np.lexsort((seqs, -scores))
    admit_ref = ray.put(pa.array(np.sort(seqs[order[:k]]), pa.int64()))

    def _split(admit: bool):
        def fn(t: pa.Table) -> pa.Table:
            mask = pc.is_in(t["seq"], value_set=ray.get(admit_ref))
            if not admit:
                mask = pc.invert(mask)
            return t.filter(mask).select(_FRONTIER_COLS)
        return fn

    return (scored.map_batches(_split(True), batch_format="pyarrow"),
            scored.map_batches(_split(False), batch_format="pyarrow"))
