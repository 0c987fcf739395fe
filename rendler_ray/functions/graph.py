"""Graph algorithms over the crawl's edge table.

PageRank by power iteration — the canonical computation on the link
graph the reference accumulates (``python/rendler.py`` crawlResults;
SURVEY.md §1.1 "crawl graph"). Ray-Data shape per iteration: broadcast
the current rank vector (``ray.put`` once), one ``map_batches`` pass
over the edges emits per-batch partial contribution sums per dst, and a
``groupby(dst).sum`` reduces them; dangling mass and teleport close the
equation on the driver (scalar math). The broadcast-dict form holds to
~10^8 nodes; past that, ranks become a table and the broadcast becomes
a hash join keyed on src — same iteration skeleton.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data.aggregate import Sum


def pagerank(edges_ds, iters: int = 10, damping: float = 0.85):
    """edges (src, dst) → pandas DataFrame (url, rank), ranks sum to 1.
    Deterministic. Duplicate (src,dst) edges count once (reference A1
    set semantics)."""
    # node set + out-degrees (distinct edges), one pass
    pairs = set()
    for b in edges_ds.iter_batches(batch_size=65536,
                                   batch_format="pyarrow"):
        pairs.update(zip(b["src"].to_pylist(), b["dst"].to_pylist()))
    nodes = sorted({s for s, _ in pairs} | {d for _, d in pairs})
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"url": [], "rank": []})
    out_deg: dict[str, int] = {}
    for s, _ in pairs:
        out_deg[s] = out_deg.get(s, 0) + 1

    edge_tbl = pa.table({
        "src": pa.array([s for s, _ in sorted(pairs)], pa.string()),
        "dst": pa.array([d for _, d in sorted(pairs)], pa.string()),
    })
    edges = ray.data.from_arrow(edge_tbl)
    ranks = {u: 1.0 / n for u in nodes}

    for _ in range(iters):
        state_ref = ray.put((ranks, out_deg))

        def contrib(t: pa.Table, ref=state_ref) -> pa.Table:
            r, deg = ray.get(ref)
            src = t["src"].to_pylist()
            dst = t["dst"].to_pylist()
            w = np.array([r[s] / deg[s] for s in src])
            df = pd.DataFrame({"dst": dst, "w": w}).groupby(
                "dst", sort=False)["w"].sum().reset_index()
            return pa.Table.from_pandas(df, preserve_index=False)

        agg = (edges.map_batches(contrib, batch_format="pyarrow")
               .groupby("dst").aggregate(Sum("w", alias_name="w")))
        inflow = {r["dst"]: r["w"] for r in agg.take_all()}
        dangling = sum(ranks[u] for u in nodes if u not in out_deg)
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = {u: base + damping * inflow.get(u, 0.0) for u in nodes}

    return pd.DataFrame({"url": nodes,
                         "rank": [ranks[u] for u in nodes]})
