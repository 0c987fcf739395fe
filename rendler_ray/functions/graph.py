"""Graph algorithms over the crawl's edge table.

PageRank by power iteration — the canonical computation on the link
graph the reference accumulates (``python/rendler.py`` crawlResults;
SURVEY.md §1.1 "crawl graph"). Duplicate (src, dst) edges count once
(reference A1 set semantics).

Two executions, one shared distributed prep (distinct edges via
``groupby(src, dst)``, out-degrees via ``groupby(src).count()`` — the
edge table itself NEVER lands on the driver):

* :func:`pagerank` — broadcast-state iteration: the rank/degree dicts
  are ``ray.put`` once per iteration, one ``map_batches`` pass over the
  deduped edges emits per-batch partial per-dst sums, and a
  ``groupby(dst).sum`` reduces them. Driver memory is O(nodes) (the
  dicts), which holds to ~10^8 nodes.
* :func:`pagerank_ds` — fully distributed iteration for past that
  ceiling: ranks live as a Dataset, each iteration hash-joins
  ranks ⋈ edges on ``src``, groups contributions by ``dst``, and
  rebuilds the rank table with a union-groupby (nodes with no inflow
  get the teleport base). Driver state is O(1) scalars; dangling mass
  falls out of the contribution total (sum of contributions == total
  rank held by non-dangling nodes), so no extra join is needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data.aggregate import Count, Max, Min, Sum


def _distinct_edges_and_degrees(edges_ds):
    """(distinct-edge Dataset (src, dst), out-degree Dataset (src, deg),
    node Dataset (url)) — all via distributed groupbys; nothing collects
    to the driver."""
    distinct = (edges_ds.select_columns(["src", "dst"])
                .groupby(["src", "dst"])
                .aggregate(Count(alias_name="_n"))
                .select_columns(["src", "dst"])
                .materialize())
    deg = distinct.groupby("src").aggregate(Count(alias_name="deg"))
    srcs = distinct.select_columns(["src"]).map_batches(
        lambda t: t.rename_columns(["url"]), batch_format="pyarrow")
    dsts = distinct.select_columns(["dst"]).map_batches(
        lambda t: t.rename_columns(["url"]), batch_format="pyarrow")
    nodes = (srcs.union(dsts).groupby("url")
             .aggregate(Count(alias_name="_n"))
             .select_columns(["url"]))
    return distinct, deg, nodes


def pagerank(edges_ds, iters: int = 10, damping: float = 0.85,
             _prep=None):
    """edges (src, dst) → pandas DataFrame (url, rank), ranks sum to 1.
    Deterministic. Broadcast-state form: rank/degree dicts on the
    driver (O(nodes)); the edge table stays distributed throughout."""
    distinct, deg_ds, nodes_ds = (_prep if _prep is not None
                                  else _distinct_edges_and_degrees(edges_ds))
    nodes = sorted(
        u
        for b in nodes_ds.iter_batches(batch_size=65536,
                                       batch_format="pyarrow")
        for u in b["url"].to_pylist())
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"url": [], "rank": []})
    out_deg: dict[str, int] = {}
    for b in deg_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        out_deg.update(zip(b["src"].to_pylist(), b["deg"].to_pylist()))

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

        agg = (distinct.map_batches(contrib, batch_format="pyarrow")
               .groupby("dst").aggregate(Sum("w", alias_name="w")))
        inflow = {r["dst"]: r["w"] for r in agg.take_all()}
        dangling = sum(ranks[u] for u in nodes if u not in out_deg)
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = {u: base + damping * inflow.get(u, 0.0) for u in nodes}

    return pd.DataFrame({"url": nodes,
                         "rank": [ranks[u] for u in nodes]})


def personalized_pagerank(edges_ds, seeds: list[str], iters: int = 10,
                          damping: float = 0.85, _prep=None):
    """PERSONALIZED (topic-sensitive) PageRank — Haveliwala WWW'02:
    teleport mass returns to the SEED set instead of uniformly, so
    ranks measure proximity/importance RELATIVE to the seeds (the
    re-crawl prioritizer's "how relevant is this page to where we
    started"). Nodes unreachable from the seeds converge to rank 0.

    Broadcast-state form, same structure and driver ceiling
    (O(nodes) dicts, ~10^8) as :func:`pagerank`; the fully
    distributed analog is :func:`pagerank_ds`'s join shape with the
    personalization vector joined onto the node table instead of the
    uniform teleport scalar. Dangling mass also returns to the seeds
    (the standard PPR convention). Deterministic."""
    distinct, deg_ds, nodes_ds = (_prep if _prep is not None
                                  else _distinct_edges_and_degrees(edges_ds))
    nodes = sorted(
        u
        for b in nodes_ds.iter_batches(batch_size=65536,
                                       batch_format="pyarrow")
        for u in b["url"].to_pylist())
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"url": [], "rank": []})
    present = [s for s in sorted(set(seeds)) if s in set(nodes)]
    if not present:
        raise ValueError("no seed present in the graph")
    p = {u: 1.0 / len(present) for u in present}
    out_deg: dict[str, int] = {}
    for b in deg_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        out_deg.update(zip(b["src"].to_pylist(), b["deg"].to_pylist()))

    ranks = dict(p)

    for _ in range(iters):
        state_ref = ray.put((ranks, out_deg))

        def contrib(t: pa.Table, ref=state_ref) -> pa.Table:
            r, deg = ray.get(ref)
            src = t["src"].to_pylist()
            dst = t["dst"].to_pylist()
            w = np.array([r.get(s, 0.0) / deg[s] for s in src])
            df = pd.DataFrame({"dst": dst, "w": w}).groupby(
                "dst", sort=False)["w"].sum().reset_index()
            return pa.Table.from_pandas(df, preserve_index=False)

        agg = (distinct.map_batches(contrib, batch_format="pyarrow")
               .groupby("dst").aggregate(Sum("w", alias_name="w")))
        inflow = {r["dst"]: r["w"] for r in agg.take_all()}
        dangling = sum(ranks.get(u, 0.0) for u in nodes
                       if u not in out_deg)
        tele = (1.0 - damping) + damping * dangling
        ranks = {u: tele * p.get(u, 0.0) + damping * inflow.get(u, 0.0)
                 for u in nodes}

    return pd.DataFrame({"url": nodes,
                         "rank": [ranks[u] for u in nodes]})


def pagerank_ds(edges_ds, iters: int = 10, damping: float = 0.85,
                num_partitions: int = 16, _prep=None):
    """Fully distributed PageRank: returns a Dataset (url, rank).

    Per iteration: ranks ⋈ edges hash join on src → per-edge
    contribution rank/deg → ``groupby(dst).sum`` → union with the node
    table (w=0) so no-inflow nodes keep the teleport base →
    ``groupby(url).sum`` → vectorized rank update. Driver holds only
    scalars (n, dangling mass); the rank table is materialized once per
    iteration so the lazy graph doesn't re-execute prior iterations.
    """
    distinct, deg_ds, nodes_ds = (_prep if _prep is not None
                                  else _distinct_edges_and_degrees(edges_ds))
    nodes_ds = nodes_ds.materialize()
    n = nodes_ds.count()
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "rank": pa.array([], pa.float64())}))

    # degree travels WITH the edges: one static join, reused every
    # iteration (deg never changes)
    edges_deg = distinct.join(
        deg_ds, join_type="inner", num_partitions=num_partitions,
        on=("src",), right_on=("src",), right_suffix="_r").select_columns(
        ["src", "dst", "deg"]).materialize()

    def init_rank(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rank", pa.array(np.full(t.num_rows, 1.0 / n), pa.float64()))

    ranks = nodes_ds.map_batches(init_rank,
                                 batch_format="pyarrow").materialize()
    zeros = nodes_ds.map_batches(
        lambda t: t.append_column(
            "w", pa.array(np.zeros(t.num_rows), pa.float64())),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        joined = edges_deg.join(
            ranks, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("url",))

        def contrib(t: pa.Table) -> pa.Table:
            w = (t["rank"].to_numpy(zero_copy_only=False)
                 / t["deg"].to_numpy(zero_copy_only=False))
            return pa.table({"url": t["dst"],
                             "w": pa.array(w, pa.float64())})

        inflow = (joined.map_batches(contrib, batch_format="pyarrow")
                  .groupby("url").aggregate(Sum("w", alias_name="w"))
                  .materialize())  # consumed twice: sum + union
        # total contribution mass == rank held by non-dangling nodes, so
        # dangling mass needs no extra join: 1 - sum(w) (ranks sum to 1)
        covered = inflow.sum("w") or 0.0
        dangling = max(0.0, 1.0 - covered)
        base = (1.0 - damping) / n + damping * dangling / n

        def update(t: pa.Table, b=base, d=damping) -> pa.Table:
            w = t["w"].to_numpy(zero_copy_only=False)
            return pa.table({"url": t["url"],
                             "rank": pa.array(b + d * w, pa.float64())})

        ranks = (inflow.union(zeros)
                 .groupby("url").aggregate(Sum("w", alias_name="w"))
                 .map_batches(update, batch_format="pyarrow")
                 .materialize())
    return ranks


def pagerank_auto(edges_ds, iters: int = 10, damping: float = 0.85,
                  driver_max: int = 1_000_000, num_partitions: int = 16):
    """Size-gated PageRank, always returning a Dataset (url, rank):
    node counts ≤ ``driver_max`` run the broadcast-state
    :func:`pagerank` (driver dicts + one map pass per iteration — far
    fewer shuffles, the small-graph fast path); bigger graphs run the
    fully distributed :func:`pagerank_ds` (per-iteration hash join,
    O(1) driver state). Both forms agree to float64 determinism
    (bit-agreement pytest-asserted), so the gate is invisible in
    output — the same bounded-driver + distributed-fallback pattern as
    :func:`connected_components_auto`."""
    prep = _distinct_edges_and_degrees(edges_ds)
    nodes_ds = prep[2].materialize()
    prep = (prep[0], prep[1], nodes_ds)
    if nodes_ds.count() > driver_max:
        return pagerank_ds(edges_ds, iters=iters, damping=damping,
                           num_partitions=num_partitions, _prep=prep)
    df = pagerank(edges_ds, iters=iters, damping=damping, _prep=prep)
    return ray.data.from_arrow(pa.table({
        "url": pa.array(df["url"].tolist(), pa.string()),
        "rank": pa.array(df["rank"].to_numpy(np.float64), pa.float64())}))


def connected_components_auto(edges_ds, driver_max: int = 1_000_000,
                              **kw):
    """Size-gated connected components: when the DISTINCT edge count is
    ≤ ``driver_max`` (8–80 MB of key strings — the verified near-dup
    pair graph is vastly smaller than its corpus), a driver union-find
    finishes in one pass instead of ~8 star-contraction rounds × 3
    shuffles each; bigger graphs run the distributed
    :func:`connected_components_star`. Identical output contract
    ((url, component=min member), equality pytest-asserted) — the same
    bounded-driver-state + distributed-fallback pattern as the crawl's
    dense-seq key rank (pipelines/crawl.py::_number_winners)."""
    from rendler_ray.state.politeness import _nonempty_blocks

    edges = edges_ds.select_columns(["src", "dst"]).materialize()
    n_raw = edges.count()  # >= distinct count: a conservative gate
    if n_raw == 0:
        return ray.data.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "component": pa.array([], pa.string())}))
    if n_raw > driver_max:
        # the distinct groupby only pays off on the star path (it
        # shrinks every contraction round); union-find absorbs
        # duplicate edges natively, so the driver path skips it
        distinct = (edges.groupby(["src", "dst"])
                    .aggregate(Count(alias_name="_n"))
                    .select_columns(["src", "dst"])).materialize()
        distinct = _nonempty_blocks(distinct)
        if distinct is None:
            return ray.data.from_arrow(pa.table({
                "url": pa.array([], pa.string()),
                "component": pa.array([], pa.string())}))
        return connected_components_star(distinct, **kw)
    distinct = edges

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for b in distinct.iter_batches(batch_size=65536,
                                   batch_format="pyarrow"):
        for a, c in zip(b["src"].to_pylist(), b["dst"].to_pylist()):
            ra, rc = find(a), find(c)
            if ra != rc:
                parent[max(ra, rc)] = min(ra, rc)
    urls = sorted(parent)
    comp = [find(u) for u in urls]
    return ray.data.from_arrow(pa.table({
        "url": pa.array(urls, pa.string()),
        "component": pa.array(comp, pa.string())}))


def connected_components_star(edges_ds, max_iters: int = 30,
                              num_partitions: int = 16):
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14): O(log² n) rounds worst case — and a handful in
    practice — vs graph-diameter rounds for min-label propagation
    (:func:`connected_components_ds`). Same output contract: Dataset
    (url, component) with ``component`` the lexicographic min url of the
    component. Deterministic; direction and duplicate edges ignored.

    Each round is two ``groupby(node).map_groups`` passes over the
    symmetrized edge list (large-star hooks every neighbor bigger than
    the center to the neighborhood min; small-star hooks the center and
    its smaller neighbors to it) plus one dedup groupby; the edge set
    only shrinks, so later rounds are cheap. Convergence = unchanged
    edge-set hash signature (edges monotonically contract toward the
    star fixpoint, where both operations are identities).
    """
    from ray.data.aggregate import Min

    from rendler_ray.functions.canon import stable_hash64
    from rendler_ray.state.politeness import _nonempty_blocks

    distinct = (edges_ds.select_columns(["src", "dst"])
                .groupby(["src", "dst"])
                .aggregate(Count(alias_name="_n"))
                .select_columns(["src", "dst"])).materialize()
    distinct = _nonempty_blocks(distinct)
    if distinct is None:
        return ray.data.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "component": pa.array([], pa.string())}))

    srcs = distinct.select_columns(["src"]).map_batches(
        lambda t: t.rename_columns(["url"]), batch_format="pyarrow")
    dsts = distinct.select_columns(["dst"]).map_batches(
        lambda t: t.rename_columns(["url"]), batch_format="pyarrow")
    nodes = (srcs.union(dsts).groupby("url")
             .aggregate(Count(alias_name="_n"))
             .select_columns(["url"])).materialize()

    # canonicalize each undirected edge to (u=hi, v=lo); drop self-loops
    def canon_pair(t: pa.Table) -> pa.Table:
        a = t["src"].to_numpy(zero_copy_only=False)
        b = t["dst"].to_numpy(zero_copy_only=False)
        hi = np.maximum(a, b)
        lo = np.minimum(a, b)
        keep = hi != lo
        return pa.table({"u": pa.array(hi[keep], pa.string()),
                         "v": pa.array(lo[keep], pa.string())})

    edges = (distinct.map_batches(canon_pair, batch_format="pyarrow")
             .groupby(["u", "v"]).aggregate(Count(alias_name="_n"))
             .select_columns(["u", "v"])).materialize()
    edges = _nonempty_blocks(edges)

    def _sig(ds) -> int:
        import pyarrow.compute as pc
        s = 0
        for b in ds.map_batches(
                lambda t: pa.table({"h": pa.array([int(stable_hash64(
                    pc.binary_join_element_wise(t["u"], t["v"], "\x00"))
                    .sum(dtype=np.uint64))], pa.uint64())}),
                batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"):
            for v in b["h"].to_pylist():
                s = (s + v) & 0xFFFFFFFFFFFFFFFF
        return s

    def _star(ds, large: bool):
        """One star operation over the symmetrized edge list. m =
        min(neighbors ∪ {center}) — for small-star the global min either
        IS a smaller neighbor or the center itself, so the expression
        coincides with min(N≤ ∪ {center}). Emitted edges are always
        (bigger, smaller) with the self-pair dropped, preserving the
        canonical orientation with no re-canonicalize pass."""
        rev = ds.map_batches(
            lambda t: pa.table({"u": t["v"], "v": t["u"]}),
            batch_format="pyarrow")

        def star_group(g: pd.DataFrame) -> pd.DataFrame:
            u = g["u"].iloc[0]
            nbrs = np.unique(g["v"].to_numpy())
            m = min(nbrs[0], u)
            if large:
                targets = nbrs[nbrs > u]
            else:
                targets = np.append(nbrs[nbrs < u], u)
            targets = targets[targets != m]
            return pd.DataFrame({
                "u": targets,
                "v": np.full(len(targets), m, dtype=object)})

        out = ds.union(rev).groupby("u").map_groups(
            star_group, batch_format="pandas")
        return _nonempty_blocks(out.materialize())

    if edges is not None:
        sig_prev = _sig(edges)
        for _ in range(max_iters):
            lg = _star(edges, large=True)
            if lg is None:
                edges = None
                break
            sm = _star(lg, large=False)
            if sm is None:
                edges = None
                break
            edges = (sm.groupby(["u", "v"])
                     .aggregate(Count(alias_name="_n"))
                     .select_columns(["u", "v"])).materialize()
            edges = _nonempty_blocks(edges)
            if edges is None:
                break
            sig = _sig(edges)
            if sig == sig_prev:
                break
            sig_prev = sig

    # at the fixpoint edges are (node -> component root); self-label
    # every node so roots, isolated and self-loop nodes resolve too
    self_lab = nodes.map_batches(
        lambda t: pa.table({"url": t["url"], "label": t["url"]}),
        batch_format="pyarrow")
    if edges is not None:
        lab = edges.map_batches(
            lambda t: pa.table({"url": t["u"], "label": t["v"]}),
            batch_format="pyarrow")
        self_lab = lab.union(self_lab)
    return (self_lab.groupby("url")
            .aggregate(Min("label", alias_name="label"))
            .map_batches(lambda t: pa.table(
                {"url": t["url"], "component": t["label"]}),
                batch_format="pyarrow"))


def label_propagation_ds(edges_ds, iters: int = 5,
                         num_partitions: int = 8):
    """Community detection by SYNCHRONOUS label propagation (Raghavan
    et al. 2007, public): every node starts with its own id and, each
    round, adopts the most frequent label among its neighbors (tie:
    lexicographically smallest). A fixed iteration count + synchronous
    updates make the result deterministic (the classic async variant is
    visit-order-dependent, useless as a pinned fixture); communities
    denser than the round count stabilize, which is the curation
    use-case (site/community-level corpus mixing).

    Fully distributed rounds over the symmetrized distinct edge list:
    labels ⋈ edges hash join on ``src`` → (dst, neighbor label) rows →
    ``groupby(dst, label)`` count (the all-to-all carries one row per
    distinct (node, label), not per edge) → per-node mode via a small
    ``map_groups`` finisher (rows per group = distinct neighbor labels,
    bounded by degree). Driver state: none."""
    from rendler_ray.state.politeness import _nonempty_blocks

    distinct = (edges_ds.select_columns(["src", "dst"])
                .groupby(["src", "dst"])
                .aggregate(Count(alias_name="_n"))
                .select_columns(["src", "dst"]))
    sym = (distinct.union(distinct.map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"]}),
        batch_format="pyarrow"))
        .groupby(["src", "dst"]).aggregate(Count(alias_name="_n"))
        .select_columns(["src", "dst"])).materialize()
    sym = _nonempty_blocks(sym)
    if sym is None:
        return ray.data.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "label": pa.array([], pa.string())}))

    labels = (sym.select_columns(["src"])
              .groupby("src").aggregate(Count(alias_name="_n"))
              .map_batches(lambda t: pa.table(
                  {"url": t["src"], "label": t["src"]}),
                  batch_format="pyarrow")).materialize()
    # sparse-key guard: more join partitions than nodes/4 leaves empty
    # schema-less partitions that crash the hash-join aggregator
    num_partitions = max(1, min(num_partitions, labels.count() // 4))

    for _ in range(iters):
        cand = sym.join(labels, join_type="inner",
                        num_partitions=num_partitions,
                        on=("src",), right_on=("url",))
        counts = (cand.map_batches(
            lambda t: pa.table({"dst": t["dst"], "label": t["label"]}),
            batch_format="pyarrow")
            .groupby(["dst", "label"])
            .aggregate(Count(alias_name="n"))).materialize()
        # per-node mode with smallest-label tie-break, fully
        # vectorized (r5 — the old per-node pandas ``map_groups``
        # finisher was a Python call per VERTEX per round): max count
        # per node, equi-join back on (node, count) to keep the tied
        # candidates, then a string Min for the deterministic winner.
        # Staged so no execution holds more than two shuffle stages.
        mx = counts.groupby("dst").aggregate(
            Max("n", alias_name="n")).materialize()
        winners = counts.join(mx, join_type="inner",
                              num_partitions=num_partitions,
                              on=("dst", "n"))
        labels = (winners.groupby("dst")
                  .aggregate(Min("label", alias_name="label"))
                  .map_batches(lambda t: pa.table(
                      {"url": t["dst"], "label": t["label"]}),
                      batch_format="pyarrow")).materialize()
    return labels


def connected_components_ds(edges_ds, max_iters: int = 50,
                            num_partitions: int = 16):
    """Connected components of the (undirected view of the) crawl graph:
    Dataset (url, component) where ``component`` is the lexicographic
    min url of the component. Deterministic.

    Min-label propagation, fully distributed: per iteration,
    labels ⋈ symmetric-edges hash join on the source node → candidate
    (dst, src_label) rows → union with current labels →
    ``groupby(url).min`` → new labels. Converges in graph-diameter
    iterations; convergence is detected with a per-batch label-hash sum
    folded to one driver scalar (labels only ever decrease, so an
    unchanged signature means a fixpoint — no extra compare join).
    """
    from ray.data.aggregate import Min

    from rendler_ray.functions.canon import stable_hash64
    from rendler_ray.state.politeness import _nonempty_blocks

    distinct = (edges_ds.select_columns(["src", "dst"])
                .groupby(["src", "dst"])
                .aggregate(Count(alias_name="_n"))
                .select_columns(["src", "dst"]))
    sym = (distinct.union(distinct.map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"]}),
        batch_format="pyarrow"))
        .groupby(["src", "dst"]).aggregate(Count(alias_name="_n"))
        .select_columns(["src", "dst"])).materialize()
    sym = _nonempty_blocks(sym)
    if sym is None:
        return ray.data.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "component": pa.array([], pa.string())}))

    # every node appears as a src in the symmetric edge list
    labels = (sym.select_columns(["src"])
              .groupby("src").aggregate(Count(alias_name="_n"))
              .map_batches(lambda t: pa.table(
                  {"url": t["src"], "label": t["src"]}),
                  batch_format="pyarrow")).materialize()

    def _sig(ds) -> int:
        s = 0
        for b in (ds.select_columns(["label"])
                  .map_batches(lambda t: pa.table({"h": pa.array(
                      [int(stable_hash64(np.asarray(
                          t["label"].to_pylist(), dtype=object))
                          .sum(dtype=np.uint64))], pa.uint64())}),
                      batch_format="pyarrow")
                  .iter_batches(batch_size=None, batch_format="pyarrow")):
            for v in b["h"].to_pylist():
                s = (s + v) & 0xFFFFFFFFFFFFFFFF
        return s

    sig_prev = _sig(labels)
    for _ in range(max_iters):
        cand = sym.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("url",)).map_batches(
            lambda t: pa.table({"url": t["dst"], "label": t["label"]}),
            batch_format="pyarrow")
        labels = (cand.union(labels.select_columns(["url", "label"]))
                  .groupby("url").aggregate(Min("label", alias_name="label"))
                  ).materialize()
        # hash-join partitioning chokes on the zero-column placeholder
        # blocks empty partitions emit; rebuild from real blocks before
        # the next iteration's join (metadata-only driver work)
        labels = _nonempty_blocks(labels)
        sig = _sig(labels)
        if sig == sig_prev:
            break
        sig_prev = sig
    return labels.map_batches(
        lambda t: pa.table({"url": t["url"], "component": t["label"]}),
        batch_format="pyarrow")


def hits(edges_ds, iters: int = 10, _prep=None) -> pd.DataFrame:
    """Broadcast-state HITS hubs/authorities (Kleinberg JACM'99) over
    the deduped edge table: auth = E^T·hub, hub = E·auth per iteration,
    each MAX-normalized — max is an order-independent float reduction
    (unlike a sum-norm), so both execution forms and any parallelism
    level divide by the bit-identical scalar. Driver holds the two
    O(nodes) score dicts (same ceiling as :func:`pagerank`); the edge
    table stays distributed, one ``map_batches`` partial-combine pass +
    one ``groupby.sum`` per half-step."""
    distinct, _deg, nodes_ds = (_prep if _prep is not None
                                else _distinct_edges_and_degrees(edges_ds))
    nodes = sorted(
        u
        for b in nodes_ds.iter_batches(batch_size=65536,
                                       batch_format="pyarrow")
        for u in b["url"].to_pylist())
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"url": [], "hub": [], "auth": []})
    hub = {u: 1.0 for u in nodes}
    auth = {u: 0.0 for u in nodes}

    def _half(scores: dict, key_col: str, out_col: str) -> dict:
        ref = ray.put(scores)

        def contrib(t: pa.Table, ref=ref) -> pa.Table:
            s = ray.get(ref)
            w = np.array([s[x] for x in t[key_col].to_pylist()],
                         dtype=np.float64)
            df = pd.DataFrame({"url": t[out_col].to_pylist(), "w": w}) \
                .groupby("url", sort=False)["w"].sum().reset_index()
            return pa.Table.from_pandas(df, preserve_index=False)

        agg = (distinct.map_batches(contrib, batch_format="pyarrow")
               .groupby("url").aggregate(Sum("w", alias_name="w")))
        raw = {r["url"]: r["w"] for r in agg.take_all()}
        mx = max(raw.values(), default=0.0)
        return {u: (raw.get(u, 0.0) / mx if mx > 0 else 0.0)
                for u in nodes}

    for _ in range(iters):
        auth = _half(hub, "src", "dst")
        hub = _half(auth, "dst", "src")
    return pd.DataFrame({"url": nodes,
                         "hub": [hub[u] for u in nodes],
                         "auth": [auth[u] for u in nodes]})


def hits_ds(edges_ds, iters: int = 10, num_partitions: int = 16,
            _prep=None):
    """Fully distributed HITS: scores live as Datasets; each half-step
    hash-joins scores ⋈ edges, groups contributions by the opposite
    endpoint, unions the zero-score node table (no-inflow nodes stay 0)
    and divides by the global max (``Dataset.max`` — an exact,
    order-independent reduction). Driver state is O(1) scalars — the
    past-driver-RAM form of :func:`hits`."""
    from rendler_ray.state.politeness import _nonempty_blocks

    distinct, _deg, nodes_ds = (_prep if _prep is not None
                                else _distinct_edges_and_degrees(edges_ds))
    nodes_ds = nodes_ds.materialize()
    if nodes_ds.count() == 0:
        return ray.data.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "hub": pa.array([], pa.float64()),
            "auth": pa.array([], pa.float64())}))
    distinct = _nonempty_blocks(distinct.materialize())

    def const_col(v: float):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "w", pa.array(np.full(t.num_rows, v), pa.float64()))
        return fn

    hub = nodes_ds.map_batches(const_col(1.0),
                               batch_format="pyarrow").materialize()
    zeros = nodes_ds.map_batches(const_col(0.0),
                                 batch_format="pyarrow").materialize()
    auth = zeros

    def _half(scores, key_col: str, out_col: str):
        joined = distinct.join(
            scores, join_type="inner", num_partitions=num_partitions,
            on=(key_col,), right_on=("url",))

        def contrib(t: pa.Table) -> pa.Table:
            return pa.table({"url": t[out_col], "w": t["w"]})

        raw = (joined.map_batches(contrib, batch_format="pyarrow")
               .groupby("url").aggregate(Sum("w", alias_name="w"))
               .union(zeros)
               .groupby("url").aggregate(Sum("w", alias_name="w"))
               .materialize())
        mx = raw.max("w") or 0.0

        def norm(t: pa.Table, m=mx) -> pa.Table:
            w = t["w"].to_numpy(zero_copy_only=False)
            out = w / m if m > 0 else np.zeros(len(w))
            return pa.table({"url": t["url"],
                             "w": pa.array(out, pa.float64())})

        return _nonempty_blocks(
            raw.map_batches(norm, batch_format="pyarrow").materialize())

    for _ in range(iters):
        auth = _half(hub, "src", "dst")
        hub = _half(auth, "dst", "src")

    pad_h = hub.map_batches(
        lambda t: pa.table({"url": t["url"], "hub": t["w"],
                            "auth": pa.array(np.zeros(t.num_rows),
                                             pa.float64())}),
        batch_format="pyarrow")
    pad_a = auth.map_batches(
        lambda t: pa.table({"url": t["url"],
                            "hub": pa.array(np.zeros(t.num_rows),
                                            pa.float64()),
                            "auth": t["w"]}),
        batch_format="pyarrow")
    return (pad_h.union(pad_a).groupby("url")
            .aggregate(Sum("hub", alias_name="hub"),
                       Sum("auth", alias_name="auth")))


def hits_auto(edges_ds, iters: int = 10, driver_max: int = 1_000_000,
              num_partitions: int = 16):
    """Size-gated HITS, always returning a Dataset (url, hub, auth):
    broadcast-state :func:`hits` while the node table fits driver RAM,
    fully distributed :func:`hits_ds` past it — the
    :func:`pagerank_auto` pattern. Two-form agreement is
    pytest-asserted."""
    prep = _distinct_edges_and_degrees(edges_ds)
    nodes_ds = prep[2].materialize()
    prep = (prep[0], prep[1], nodes_ds)
    if nodes_ds.count() > driver_max:
        return hits_ds(edges_ds, iters=iters,
                       num_partitions=num_partitions, _prep=prep)
    df = hits(edges_ds, iters=iters, _prep=prep)
    return ray.data.from_arrow(pa.table({
        "url": pa.array(df["url"].tolist(), pa.string()),
        "hub": pa.array(df["hub"].to_numpy(np.float64), pa.float64()),
        "auth": pa.array(df["auth"].to_numpy(np.float64), pa.float64())}))


def kcore(edges_ds, _sym=None) -> pd.DataFrame:
    """k-core decomposition (coreness per node) of the undirected view
    of the edge table — DRIVER form: exact iterative peeling (Batagelj
    & Zaveršnik 2003 semantics: a node removed while peeling at level k
    belongs to the (k-1)-core but not the k-core, so coreness = k-1).
    The adjacency set lives on the driver — the small-graph fast path
    behind :func:`kcore_auto`'s gate. Deterministic: coreness is a
    property of the graph, independent of removal order. Returns a
    pandas DataFrame (url, core) sorted by url."""
    sym = _sym if _sym is not None else _symmetric_edges(edges_ds)
    adj: dict[str, set] = {}
    if sym is not None:
        for b in sym.iter_batches(batch_size=65536,
                                  batch_format="pyarrow"):
            for a, c in zip(b["src"].to_pylist(), b["dst"].to_pylist()):
                adj.setdefault(a, set()).add(c)
    deg = {u: len(ns) for u, ns in adj.items()}
    remaining = set(adj)
    core: dict[str, int] = {}
    k = 0
    while remaining:
        k += 1
        stack = [u for u in remaining if deg[u] < k]
        while stack:
            u = stack.pop()
            if u not in remaining:
                continue
            core[u] = k - 1
            remaining.discard(u)
            for w in adj[u]:
                if w in remaining:
                    deg[w] -= 1
                    if deg[w] < k:
                        stack.append(w)
    urls = sorted(core)
    return pd.DataFrame({"url": urls,
                         "core": np.array([core[u] for u in urls],
                                          dtype=np.int64)})


def _symmetric_edges(edges_ds):
    """Distinct symmetrized self-loop-free undirected edge list
    (src, dst) — both orientations present, so groupby(src).count IS
    the undirected degree. None when empty."""
    from rendler_ray.state.politeness import _nonempty_blocks

    distinct = edges_ds.select_columns(["src", "dst"])
    sym = (distinct.union(distinct.map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"]}),
        batch_format="pyarrow"))
        .groupby(["src", "dst"]).aggregate(Count(alias_name="_n"))
        .select_columns(["src", "dst"]))
    sym = sym.map_batches(
        lambda t: t.filter(pa.compute.invert(
            pa.compute.equal(t["src"], t["dst"]))),
        batch_format="pyarrow").materialize()
    return _nonempty_blocks(sym)


def kcore_ds(edges_ds, num_partitions: int = 8, _sym=None):
    """Fully DISTRIBUTED k-core decomposition: Dataset (url, core).

    Phase k peels nodes of degree < k to a fixpoint, then k increments;
    a peeled node's coreness is k-1. Per inner round: degrees via a
    union-groupby over (edge rows → 1) ∪ (alive nodes → 0) — the
    zero-pad trick gives degree 0 to nodes whose last edge vanished
    with a removed neighbor, with NO anti-join; the surviving-node set
    then inner-joins back against both edge endpoints (the edge set
    only ever shrinks). Driver state: two scalars (k, removed-count).
    Removed nodes accumulate as a lazy union of per-phase Datasets.
    Output equals :func:`kcore` exactly (two-form equality is
    pytest-asserted)."""
    sym = _sym if _sym is not None else _symmetric_edges(edges_ds)
    out_parts = []
    empty = ray.data.from_arrow(pa.table({
        "url": pa.array([], pa.string()),
        "core": pa.array([], pa.int64())}))
    if sym is None:
        return empty
    from rendler_ray.state.politeness import _nonempty_blocks

    alive = (sym.select_columns(["src"])
             .groupby("src").aggregate(Count(alias_name="_n"))
             .select_columns(["src"])).materialize()
    k = 1
    while sym is not None:
        ones = sym.map_batches(
            lambda t: pa.table({"src": t["src"],
                                "d": pa.array(np.ones(t.num_rows,
                                                      np.int64))}),
            batch_format="pyarrow")
        zeros = alive.map_batches(
            lambda t: pa.table({"src": t["src"],
                                "d": pa.array(np.zeros(t.num_rows,
                                                       np.int64))}),
            batch_format="pyarrow")
        deg = (ones.union(zeros).groupby("src")
               .aggregate(Sum("d", alias_name="deg"))).materialize()
        def peel(t: pa.Table, kk=k) -> pa.Table:
            sel = t.filter(pa.compute.less(t["deg"], kk))
            return pa.table({
                "url": sel["src"],
                "core": pa.array(np.full(sel.num_rows, kk - 1,
                                         np.int64))})

        removed = deg.map_batches(peel,
                                  batch_format="pyarrow").materialize()
        if removed.count() == 0:
            k += 1
            continue
        out_parts.append(removed)
        alive = (deg.map_batches(
            lambda t, kk=k: t.filter(
                pa.compute.greater_equal(t["deg"], kk)),
            batch_format="pyarrow").select_columns(["src"])).materialize()
        alive = _nonempty_blocks(alive)
        if alive is None:
            break
        # sparse-key guard (see label_propagation_ds)
        nparts = max(1, min(num_partitions, alive.count() // 4))
        keep_u = alive.map_batches(
            lambda t: t.rename_columns(["ku"]), batch_format="pyarrow")
        sym = (sym.join(keep_u, join_type="inner",
                        num_partitions=nparts,
                        on=("src",), right_on=("ku",))
               .select_columns(["src", "dst"]))
        sym = (sym.join(keep_u, join_type="inner",
                        num_partitions=nparts,
                        on=("dst",), right_on=("ku",))
               .select_columns(["src", "dst"])).materialize()
        sym = _nonempty_blocks(sym)
        if sym is None:
            # survivors' remaining edges all vanished: they peel at
            # the CURRENT level next round (degree 0 < k)
            out_parts.append(alive.map_batches(
                lambda t, kk=k: pa.table({
                    "url": t["src"],
                    "core": pa.array(np.full(t.num_rows, kk - 1,
                                             np.int64))}),
                batch_format="pyarrow"))
            break
    # out_parts holds one small MATERIALIZED dataset per peel round, so
    # the union chain is plan-only depth (no recomputation); graphs with
    # very deep peel sequences (kmax·rounds ≫ 10³) would want a
    # checkpointed fold instead
    res = empty
    for p in out_parts:
        res = res.union(p)
    return res


def scc(edges_ds, _nodes_adj=None) -> pd.DataFrame:
    """Strongly connected components of the DIRECTED crawl graph —
    DRIVER form: one iterative Tarjan pass (Tarjan SIAM J.Comput.'72;
    iterative so Python's recursion limit never binds). The web graph's
    bow-tie structure (Broder WWW'00) is an SCC question — the giant
    core vs IN/OUT tendrils is a standard crawl-frontier diagnostic the
    undirected CC cannot see. Returns pandas (url, scc) sorted by url,
    ``scc`` = lexicographic min url of the component (the
    connected-components label convention). Deterministic: the
    partition is a graph property, independent of visit order."""
    if _nodes_adj is None:
        adj: dict[str, list] = {}
        nodes: set = set()
        seen_e: set = set()
        for b in edges_ds.select_columns(["src", "dst"]).iter_batches(
                batch_size=65536, batch_format="pyarrow"):
            for a, c in zip(b["src"].to_pylist(), b["dst"].to_pylist()):
                nodes.add(a)
                nodes.add(c)
                if a != c and (a, c) not in seen_e:
                    seen_e.add((a, c))
                    adj.setdefault(a, []).append(c)
    else:
        nodes, adj = _nodes_adj

    index: dict = {}
    low: dict = {}
    onstack: dict = {}
    stack: list = []
    comp: dict = {}
    idx = 0
    for root in sorted(nodes):
        if root in index:
            continue
        index[root] = low[root] = idx
        idx += 1
        stack.append(root)
        onstack[root] = True
        work = [(root, iter(adj.get(root, ())))]
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = idx
                    idx += 1
                    stack.append(w)
                    onstack[w] = True
                    work.append((w, iter(adj.get(w, ()))))
                    advanced = True
                    break
                if onstack.get(w):
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    onstack[w] = False
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
            if work:
                u = work[-1][0]
                low[u] = min(low[u], low[v])
    urls = sorted(comp)
    return pd.DataFrame({"url": urls, "scc": [comp[u] for u in urls]})


def scc_ds(edges_ds, num_partitions: int = 8, max_outer: int = 50):
    """Fully DISTRIBUTED strongly connected components: Dataset
    (url, scc) — trim + forward-backward coloring rounds (the
    MultiStep/FW-BW family: Hong PPoPP'13, Slota IPDPS'14 semantics),
    built from joins/groupbys only.

    Per outer round:
      1. TRIM to a fixpoint: any node with (remaining) in-degree 0 or
         out-degree 0 is a singleton SCC (scc = itself) — degrees via
         the zero-pad union-groupby (no anti-join), removal via two
         semi-joins. A DAG trims away entirely, which is why outer
         rounds count SCC *layers*, not nodes.
      2. FORWARD min-label to a fixpoint: fwd[v] = min url that
         reaches v (labels ⋈ edges on src → groupby(dst).min — the
         connected_components_ds recurrence, directed). SCC members
         have identical ancestor sets, so fwd is constant per SCC,
         and the min member r of the minimal-colored SCC has
         fwd[r] = r.
      3. BACKWARD marking within color: roots {v: fwd[v] == v} mark
         their SCC by propagating along REVERSED edges restricted to
         equal fwd color (v→w, w marked, fwd[v] == fwd[w] ⇒ v marked).
         Marked nodes' scc = their fwd label, which IS the min member
         (fwd ≤ every member's url because each member is an ancestor;
         the root itself is a member).
      4. Emit marked, remove them, loop. Unmarked nodes recompute fwd
         next round (their labels may have flowed through removed
         SCCs). Every round peels ≥ the minimal-color SCCs per
         reachability layer.

    Driver state: O(1) scalars + per-round signatures. Output equals
    :func:`scc` exactly (two-form equality pytest-asserted)."""
    from ray.data.aggregate import Min

    from rendler_ray.functions.canon import stable_hash64
    from rendler_ray.state.politeness import _nonempty_blocks

    empty = ray.data.from_arrow(pa.table({
        "url": pa.array([], pa.string()),
        "scc": pa.array([], pa.string())}))

    distinct = (edges_ds.select_columns(["src", "dst"])
                .groupby(["src", "dst"])
                .aggregate(Count(alias_name="_n"))
                .select_columns(["src", "dst"])).materialize()
    distinct = _nonempty_blocks(distinct)
    if distinct is None:
        return empty
    srcs = distinct.select_columns(["src"]).map_batches(
        lambda t: t.rename_columns(["url"]), batch_format="pyarrow")
    dsts = distinct.select_columns(["dst"]).map_batches(
        lambda t: t.rename_columns(["url"]), batch_format="pyarrow")
    nodes = (srcs.union(dsts).groupby("url")
             .aggregate(Count(alias_name="_n"))
             .select_columns(["url"])).materialize()
    # self-loops don't affect the partition; drop them from the edge set
    edges = distinct.map_batches(
        lambda t: t.filter(pa.compute.invert(
            pa.compute.equal(t["src"], t["dst"]))),
        batch_format="pyarrow").materialize()
    edges = _nonempty_blocks(edges)

    out_parts = []

    def _label_sig(ds, col: str) -> int:
        s = 0
        for b in (ds.select_columns([col]).map_batches(
                lambda t: pa.table({"h": pa.array([int(stable_hash64(
                    np.asarray(t[col].to_pylist(), dtype=object))
                    .sum(dtype=np.uint64))], pa.uint64())}),
                batch_format="pyarrow")
                .iter_batches(batch_size=None, batch_format="pyarrow")):
            for v in b["h"].to_pylist():
                s = (s + v) & 0xFFFFFFFFFFFFFFFF
        return s

    def _semi(es, alive, col):
        """edges with endpoint ``col`` ∈ alive (sparse-key clamped)."""
        np_ = max(1, min(num_partitions, alive.count() // 4))
        keep = alive.map_batches(
            lambda t: t.rename_columns(["ku"]), batch_format="pyarrow")
        out = (es.join(keep, join_type="inner", num_partitions=np_,
                       on=(col,), right_on=("ku",))
               .select_columns(["src", "dst"])).materialize()
        return _nonempty_blocks(out)

    # every outer round removes ≥ 1 node (the minimal remaining url is
    # always a root), so the node count strictly decreases; the
    # progress check is a bug guard, not a truncation — max_outer only
    # bounds the CHEAP inner fixpoints
    n_prev = None
    while True:
        if nodes is None or nodes.count() == 0:
            break
        n_now = nodes.count()
        if n_prev is not None and n_now >= n_prev:
            raise RuntimeError("scc_ds made no progress")  # bug guard
        n_prev = n_now
        # ---- 1. trim to fixpoint: in/out-degree-0 nodes are singletons
        while True:
            if edges is None:
                # no edges at all: every remaining node is a singleton
                out_parts.append(nodes.map_batches(
                    lambda t: pa.table({"url": t["url"],
                                        "scc": t["url"]}),
                    batch_format="pyarrow"))
                nodes = None
                break
            degs = []
            for col in ("src", "dst"):
                ones = edges.map_batches(
                    lambda t, c=col: pa.table({
                        "url": t[c],
                        "d": pa.array(np.ones(t.num_rows, np.int64))}),
                    batch_format="pyarrow")
                zeros = nodes.map_batches(
                    lambda t: pa.table({
                        "url": t["url"],
                        "d": pa.array(np.zeros(t.num_rows, np.int64))}),
                    batch_format="pyarrow")
                degs.append(ones.union(zeros).groupby("url")
                            .aggregate(Sum("d", alias_name=f"d_{col}"))
                            .materialize())
            both = degs[0].join(degs[1], join_type="inner",
                                num_partitions=max(
                                    1, min(num_partitions,
                                           nodes.count() // 4)),
                                on=("url",), right_on=("url",)
                                ).materialize()
            trivial = both.map_batches(
                lambda t: pa.table({"url": t.filter(
                    pa.compute.or_(pa.compute.equal(t["d_src"], 0),
                                   pa.compute.equal(t["d_dst"], 0)))
                    ["url"]}),
                batch_format="pyarrow").materialize()
            if trivial.count() == 0:
                break
            out_parts.append(trivial.map_batches(
                lambda t: pa.table({"url": t["url"], "scc": t["url"]}),
                batch_format="pyarrow").materialize())
            alive = both.map_batches(
                lambda t: pa.table({"url": t.filter(
                    pa.compute.and_(pa.compute.greater(t["d_src"], 0),
                                    pa.compute.greater(t["d_dst"], 0)))
                    ["url"]}),
                batch_format="pyarrow").materialize()
            nodes = _nonempty_blocks(alive)
            if nodes is None:
                edges = None
                break
            edges = _semi(edges, nodes, "src")
            if edges is not None:
                edges = _semi(edges, nodes, "dst")
        if nodes is None or nodes.count() == 0:
            break
        # ---- 2. forward min-label fixpoint (directed)
        labels = nodes.map_batches(
            lambda t: pa.table({"url": t["url"], "label": t["url"]}),
            batch_format="pyarrow").materialize()
        np_ = max(1, min(num_partitions, nodes.count() // 4))
        sig_prev = _label_sig(labels, "label")
        for _ in range(max_outer * 100):  # labels only decrease: converges
            cand = edges.join(
                labels, join_type="inner", num_partitions=np_,
                on=("src",), right_on=("url",)).map_batches(
                lambda t: pa.table({"url": t["dst"],
                                    "label": t["label"]}),
                batch_format="pyarrow")
            labels = (cand.union(labels.select_columns(["url", "label"]))
                      .groupby("url")
                      .aggregate(Min("label", alias_name="label"))
                      ).materialize()
            labels = _nonempty_blocks(labels)
            sig = _label_sig(labels, "label")
            if sig == sig_prev:
                break
            sig_prev = sig
        # ---- 3. backward marking within equal fwd color
        marked = labels.map_batches(
            lambda t: t.filter(pa.compute.equal(t["url"], t["label"])),
            batch_format="pyarrow").materialize()
        marked = _nonempty_blocks(marked)
        n_marked = marked.count() if marked is not None else 0
        while marked is not None:
            mw = marked.map_batches(
                lambda t: pa.table({"w": t["url"], "lw": t["label"]}),
                batch_format="pyarrow")
            cand = edges.join(
                mw, join_type="inner", num_partitions=np_,
                on=("dst",), right_on=("w",)).select_columns(
                ["src", "lw"]).materialize()
            cand = _nonempty_blocks(cand)
            if cand is None:
                break
            cand2 = cand.join(
                labels, join_type="inner", num_partitions=np_,
                on=("src",), right_on=("url",)).map_batches(
                lambda t: t.filter(pa.compute.equal(
                    t["lw"], t["label"])).select(["src", "label"])
                .rename_columns(["url", "label"]),
                batch_format="pyarrow")
            marked = (cand2.union(marked)
                      .groupby("url")
                      .aggregate(Min("label", alias_name="label"))
                      ).materialize()
            marked = _nonempty_blocks(marked)
            n_new = marked.count() if marked is not None else 0
            if n_new == n_marked:
                break
            n_marked = n_new
        if marked is None or n_marked == 0:
            break  # defensive: roots always exist while nodes remain
        out_parts.append(marked.map_batches(
            lambda t: pa.table({"url": t["url"], "scc": t["label"]}),
            batch_format="pyarrow").materialize())
        # ---- 4. remove marked; recompute survivors next round
        mneg = marked.map_batches(
            lambda t: pa.table({"url": t["url"],
                                "d": pa.array(np.ones(t.num_rows,
                                                      np.int64))}),
            batch_format="pyarrow")
        npos = nodes.map_batches(
            lambda t: pa.table({"url": t["url"],
                                "d": pa.array(np.zeros(t.num_rows,
                                                       np.int64))}),
            batch_format="pyarrow")
        nodes = (mneg.union(npos).groupby("url")
                 .aggregate(Sum("d", alias_name="d"))
                 .map_batches(lambda t: pa.table({"url": t.filter(
                     pa.compute.equal(t["d"], 0))["url"]}),
                     batch_format="pyarrow")).materialize()
        nodes = _nonempty_blocks(nodes)
        if nodes is None:
            break
        edges = _semi(edges, nodes, "src")
        if edges is not None:
            edges = _semi(edges, nodes, "dst")
    res = empty
    for p in out_parts:
        res = res.union(p)
    return res


def scc_auto(edges_ds, driver_max: int = 1_000_000,
             num_partitions: int = 8):
    """Size-gated strongly connected components, always returning a
    Dataset (url, scc): raw edge counts ≤ ``driver_max`` run the
    one-pass driver Tarjan (:func:`scc`), bigger graphs the
    distributed trim + forward-backward rounds (:func:`scc_ds`).
    Identical output (equality pytest-asserted) — the
    :func:`connected_components_auto` pattern."""
    n_raw = edges_ds.select_columns(["src", "dst"]).count()
    if n_raw > driver_max:
        return scc_ds(edges_ds, num_partitions=num_partitions)
    df = scc(edges_ds)
    return ray.data.from_arrow(pa.table({
        "url": pa.array(df["url"].tolist(), pa.string()),
        "scc": pa.array(df["scc"].tolist(), pa.string())}))


_BOWTIE_PARTS = ("core", "in", "out", "other")


def bowtie(edges_ds) -> pd.DataFrame:
    """Bow-tie decomposition (Broder WWW'00) — DRIVER form: Tarjan SCC
    (:func:`scc`), CORE = the largest SCC (tie: min member url), then
    two BFS passes (reverse-reachability → IN, forward → OUT);
    everything else is OTHER (tendrils/tubes/disconnected,
    undistinguished as in the 4-way summary). IN and OUT are provably
    disjoint from each other outside CORE (a node both reaching and
    reached by the core would close a cycle through it and be IN the
    core's SCC). Returns pandas (url, part) sorted by url."""
    from collections import Counter, deque

    adj: dict[str, list] = {}
    radj: dict[str, list] = {}
    nodes: set = set()
    seen_e: set = set()
    for b in edges_ds.select_columns(["src", "dst"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        for a, c in zip(b["src"].to_pylist(), b["dst"].to_pylist()):
            nodes.add(a)
            nodes.add(c)
            if a != c and (a, c) not in seen_e:
                seen_e.add((a, c))
                adj.setdefault(a, []).append(c)
                radj.setdefault(c, []).append(a)
    df = scc(edges_ds, _nodes_adj=(nodes, adj))
    comp = dict(zip(df["url"], df["scc"]))
    sizes = Counter(comp.values())
    if not sizes:
        return pd.DataFrame({"url": [], "part": []})
    core_label = min(lab for lab, n in sizes.items()
                     if n == max(sizes.values()))
    core = {u for u, lab in comp.items() if lab == core_label}

    def bfs(frontier: set, nbrs: dict) -> set:
        seen = set(frontier)
        dq = deque(frontier)
        while dq:
            u = dq.popleft()
            for w in nbrs.get(u, ()):
                if w not in seen:
                    seen.add(w)
                    dq.append(w)
        return seen

    in_set = bfs(core, radj) - core
    out_set = bfs(core, adj) - core
    part = {}
    for u in nodes:
        part[u] = ("core" if u in core else
                   "in" if u in in_set else
                   "out" if u in out_set else "other")
    urls = sorted(part)
    return pd.DataFrame({"url": urls, "part": [part[u] for u in urls]})


def bowtie_ds(edges_ds, num_partitions: int = 8):
    """Fully DISTRIBUTED bow-tie: SCC via :func:`scc_ds`, core = the
    max-size SCC (two bounded aggregates: max count, then min label at
    that count), IN/OUT via monotone flag-propagation join rounds
    (reached-set only grows; count-stable = fixpoint), and the final
    4-way classification as ONE zero-pad union-groupby Min over part
    codes (core=0 < in=1 < out=2 < other=3 — a node's min code IS its
    class because IN∩OUT=∅ outside the core). Driver state: O(1)
    scalars. Output equals :func:`bowtie` exactly (pytest)."""
    from ray.data.aggregate import Min

    from rendler_ray.state.politeness import _nonempty_blocks

    empty = ray.data.from_arrow(pa.table({
        "url": pa.array([], pa.string()),
        "part": pa.array([], pa.string())}))
    sccs = scc_ds(edges_ds, num_partitions=num_partitions).materialize()
    sccs = _nonempty_blocks(sccs)
    if sccs is None:
        return empty
    sizes = (sccs.groupby("scc").aggregate(Count(alias_name="n"))
             ).materialize()
    mx = sizes.max("n")
    core_label = sizes.map_batches(
        lambda t, m=mx: t.filter(pa.compute.equal(t["n"], m)),
        batch_format="pyarrow").min("scc")
    core = sccs.map_batches(
        lambda t, cl=core_label: pa.table({"url": t.filter(
            pa.compute.equal(t["scc"], cl))["url"]}),
        batch_format="pyarrow").materialize()

    distinct = (edges_ds.select_columns(["src", "dst"])
                .groupby(["src", "dst"])
                .aggregate(Count(alias_name="_n"))
                .select_columns(["src", "dst"])).materialize()
    distinct = _nonempty_blocks(distinct)
    n_nodes = sccs.count()
    nparts = max(1, min(num_partitions, n_nodes // 4))

    def _reach(frontier, key_col: str, out_col: str):
        """Monotone reachability closure from ``frontier`` along
        edges oriented key_col → out_col."""
        reached = frontier.materialize()
        n_prev = reached.count()
        while distinct is not None:
            keep = reached.map_batches(
                lambda t: t.rename_columns(["ku"]),
                batch_format="pyarrow")
            cand = (distinct.join(keep, join_type="inner",
                                  num_partitions=nparts,
                                  on=(key_col,), right_on=("ku",))
                    .select_columns([out_col]).map_batches(
                    lambda t: t.rename_columns(["url"]),
                    batch_format="pyarrow"))
            reached = (cand.union(reached).groupby("url")
                       .aggregate(Count(alias_name="_n"))
                       .select_columns(["url"])).materialize()
            reached = _nonempty_blocks(reached)
            n_now = reached.count()
            if n_now == n_prev:
                break
            n_prev = n_now
        return reached

    fwd = _reach(core, "src", "dst")   # core ∪ OUT
    bwd = _reach(core, "dst", "src")   # core ∪ IN

    def code(ds, c: int):
        return ds.map_batches(
            lambda t, cc=c: pa.table({
                "url": t["url"],
                "code": pa.array(np.full(t.num_rows, cc, np.int64))}),
            batch_format="pyarrow")

    allnodes = sccs.select_columns(["url"])
    lab = (code(core, 0).union(code(bwd, 1)).union(code(fwd, 2))
           .union(code(allnodes, 3))
           .groupby("url").aggregate(Min("code", alias_name="code")))
    parts = pa.array(list(_BOWTIE_PARTS), pa.string())
    return lab.map_batches(
        lambda t: pa.table({
            "url": t["url"],
            "part": pa.compute.take(
                parts, t["code"].combine_chunks())}),
        batch_format="pyarrow")


def bowtie_auto(edges_ds, driver_max: int = 1_000_000,
                num_partitions: int = 8):
    """Size-gated bow-tie decomposition, always returning a Dataset
    (url, part): raw edge counts ≤ ``driver_max`` run the driver
    Tarjan+BFS (:func:`bowtie`), bigger graphs the distributed
    :func:`bowtie_ds`. Identical output (equality pytest-asserted)."""
    n_raw = edges_ds.select_columns(["src", "dst"]).count()
    if n_raw > driver_max:
        return bowtie_ds(edges_ds, num_partitions=num_partitions)
    df = bowtie(edges_ds)
    return ray.data.from_arrow(pa.table({
        "url": pa.array(df["url"].tolist(), pa.string()),
        "part": pa.array(df["part"].tolist(), pa.string())}))


def kcore_auto(edges_ds, driver_max: int = 1_000_000,
               num_partitions: int = 8):
    """Size-gated k-core decomposition, always returning a Dataset
    (url, core): raw edge counts ≤ ``driver_max`` run the driver
    peeling (one pass, no per-round shuffles), bigger graphs the
    distributed :func:`kcore_ds` (degree union-groupby + semi-join
    rounds). Identical output (equality pytest-asserted) — the
    :func:`connected_components_auto` pattern."""
    n_raw = edges_ds.select_columns(["src", "dst"]).count()
    sym = _symmetric_edges(edges_ds)
    if n_raw > driver_max:
        return kcore_ds(edges_ds, num_partitions=num_partitions,
                        _sym=sym)
    df = kcore(edges_ds, _sym=sym)
    return ray.data.from_arrow(pa.table({
        "url": pa.array(df["url"].tolist(), pa.string()),
        "core": pa.array(df["core"].to_numpy(np.int64), pa.int64())}))


def _aa_weights(deg_cap: int) -> dict[int, int]:
    """Degree → Adamic–Adar weight table: w(d) = round(10⁶ / ln d) for
    d ∈ [2, deg_cap]. Rounding happens ONCE per DEGREE here, so both
    the driver and distributed forms sum identical integers — the
    per-pair score is an order-free int64 sum at any parallelism."""
    import math

    return {d: int(round(1e6 / math.log(d)))
            for d in range(2, deg_cap + 1)}


def adamic_adar(edges_ds, topk: int = 50, deg_cap: int = 64,
                _sym=None) -> pd.DataFrame:
    """Driver-bounded Adamic–Adar link prediction (Adamic & Adar,
    Social Networks 2003): for every non-adjacent pair (a < b) sharing
    ≥1 common neighbor, score = Σ_w 10⁶/ln(deg(w)) over common
    neighbors w, hubs with deg > ``deg_cap`` skipped (their ~0 weights
    cost O(deg²) pair explosion for no signal — the standard cap).
    Returns the ``topk`` pairs by (aa_e6 desc, a, b) with the common-
    neighbor count ``cn``."""
    sym = _sym if _sym is not None else _symmetric_edges(edges_ds)
    cols = {"a": [], "b": [], "cn": [], "aa_e6": []}
    if sym is None:
        return pd.DataFrame(cols)
    df = pa.concat_tables(
        sym.iter_batches(batch_size=None,
                         batch_format="pyarrow")).to_pandas()
    wtab = _aa_weights(deg_cap)
    eset = set(zip(df["src"], df["dst"]))
    scores: dict[tuple[str, str], int] = {}
    cns: dict[tuple[str, str], int] = {}
    for w, ns in df.groupby("src")["dst"]:
        d = len(ns)
        if d < 2 or d > deg_cap:
            continue
        wgt = wtab[d]
        arr = sorted(ns)
        for i in range(d - 1):
            a = arr[i]
            for b in arr[i + 1:]:
                if (a, b) in eset:
                    continue
                k = (a, b)
                scores[k] = scores.get(k, 0) + wgt
                cns[k] = cns.get(k, 0) + 1
    rows = sorted(((a, b, cns[(a, b)], s)
                   for (a, b), s in scores.items()),
                  key=lambda r: (-r[3], r[0], r[1]))[:topk]
    return pd.DataFrame(rows, columns=["a", "b", "cn", "aa_e6"])


def adamic_adar_ds(edges_ds, topk: int = 50, deg_cap: int = 64,
                   num_partitions: int = 8, _sym=None):
    """Fully distributed Adamic–Adar: symmetrized edges grouped by the
    shared neighbor w (``map_groups`` — each group ≤ deg_cap rows, so
    the per-group pair explode is bounded deg_cap²), per-pair integer
    sums via one groupby, existing edges removed with a left-outer
    join against the edge table (match-marker null ⇒ non-adjacent),
    and the top-k cut with a per-block prune before the tiny global
    sort. Materialize barriers keep each execution ≤2 shuffle
    stages."""
    import ray.data as rd

    sym = _sym if _sym is not None else _symmetric_edges(edges_ds)
    empty = pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string()),
                      "cn": pa.array([], pa.int64()),
                      "aa_e6": pa.array([], pa.int64())})
    if sym is None:
        return rd.from_arrow(empty)
    wref = ray.put(_aa_weights(deg_cap))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = len(g)
        wtab = ray.get(wref)
        if d < 2 or d > deg_cap:
            return pd.DataFrame({"a": [], "b": [], "cn": [],
                                 "aa_e6": []})
        ns = np.sort(g["dst"].to_numpy(object))
        i, j = np.triu_indices(d, k=1)
        return pd.DataFrame({
            "a": ns[i], "b": ns[j],
            "cn": np.ones(len(i), np.int64),
            "aa_e6": np.full(len(i), wtab[d], np.int64)})

    cand = (sym.groupby("src").map_groups(pairs, batch_format="pandas")
            .groupby(["a", "b"])
            .aggregate(Sum("cn", alias_name="cn"),
                       Sum("aa_e6", alias_name="aa_e6"))
            .materialize())
    mark = sym.map_batches(
        lambda t: pa.table({"a": t["src"], "b": t["dst"],
                            "_adj": pa.array(
                                np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow")
    j = cand.join(mark, join_type="left_outer", on=("a", "b"),
                  num_partitions=num_partitions)
    j = j.map_batches(
        lambda t: t.filter(pa.compute.is_null(t["_adj"]))
        .select(["a", "b", "cn", "aa_e6"]),
        batch_format="pyarrow").materialize()

    def prune(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["aa_e6", "a", "b"], ascending=[False, True, True]).head(topk)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (j.map_batches(prune, batch_format="pyarrow")
            .sort(["aa_e6", "a", "b"], descending=[True, False, False])
            .limit(topk))


def adamic_adar_auto(edges_ds, topk: int = 50, deg_cap: int = 64,
                     driver_max: int = 1_000_000,
                     num_partitions: int = 8):
    """Size-gated Adamic–Adar, always returning a Dataset
    (a, b, cn, aa_e6): raw edge counts ≤ ``driver_max`` run the driver
    form, bigger graphs the distributed ``map_groups`` + join form.
    Identical output (equality pytest-asserted)."""
    import ray.data as rd

    n_raw = edges_ds.select_columns(["src", "dst"]).count()
    sym = _symmetric_edges(edges_ds)
    if n_raw > driver_max:
        return adamic_adar_ds(edges_ds, topk=topk, deg_cap=deg_cap,
                              num_partitions=num_partitions, _sym=sym)
    df = adamic_adar(edges_ds, topk=topk, deg_cap=deg_cap, _sym=sym)
    return rd.from_arrow(pa.table({
        "a": pa.array(df["a"].tolist(), pa.string()),
        "b": pa.array(df["b"].tolist(), pa.string()),
        "cn": pa.array(np.asarray(df["cn"], np.int64), pa.int64()),
        "aa_e6": pa.array(np.asarray(df["aa_e6"], np.int64),
                          pa.int64())}))


def brandes_betweenness(a: "np.ndarray", b: "np.ndarray",
                        sources: list[int]) -> dict:
    """EXACT source-sampled betweenness (Brandes JMS'01, the
    sampled-source estimator of Brandes–Pich'07): for each source s,
    one BFS builds the shortest-path DAG (dist, sigma path counts),
    then the reverse-depth dependency accumulation
    delta[v] += sigma[v]/sigma[w] * (1 + delta[w]) folds descendants'
    dependencies — all in exact ``Fraction`` arithmetic so the result
    is parallelism- and order-independent. Returns
    {node: Fraction betweenness} summed over the sampled sources
    (endpoints excluded, the classic convention). Undirected edges as
    two int arrays. O(sources * E) — each source's pass is independent
    (embarrassingly parallel across sources at scale)."""
    from collections import deque
    from fractions import Fraction

    adj: dict[int, list[int]] = {}
    for u, v in zip(a.tolist(), b.tolist()):
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    btw: dict[int, Fraction] = {}
    for s in sources:
        if s not in adj:
            continue
        dist = {s: 0}
        sigma = {s: 1}
        order = [s]
        q = deque([s])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    sigma[v] = 0
                    order.append(v)
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
        delta = {v: Fraction(0) for v in order}
        for w in reversed(order):
            for v in adj[w]:
                if dist.get(v, -1) == dist[w] - 1:
                    delta[v] += Fraction(sigma[v], sigma[w]) \
                        * (1 + delta[w])
            if w != s:
                btw[w] = btw.get(w, Fraction(0)) + delta[w]
    return btw


def bridges_articulation(a: "np.ndarray", b: "np.ndarray"):
    """Tarjan BRIDGES + ARTICULATION POINTS (Tarjan 1974 low-link) over
    an undirected DISTINCT edge list, one iterative DFS (explicit
    stack — the test graphs have paths far past Python's recursion
    limit). The single parent-edge skip is exact because the edge list
    is distinct (no parallel edges — _orders_graph_edges guarantees
    this). Returns (bridges, cuts): bridges as a sorted list of
    canonical (min, max) pairs, cuts as a sorted node list — both are
    set-valued graph properties, so DFS visit order can't leak into
    the result. O(V + E) driver state; at scale this is the
    gate-asserted driver fold of the betweenness/diameter family (per
    component independent — components partition the work)."""
    adj: dict[int, list[int]] = {}
    for u, v in zip(a.tolist(), b.tolist()):
        u, v = int(u), int(v)
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    disc: dict[int, int] = {}
    low: dict[int, int] = {}
    parent: dict[int, int] = {}
    it: dict[int, int] = {}
    bridges: list[tuple[int, int]] = []
    cuts: set[int] = set()
    timer = 0
    for root in sorted(adj):
        if root in disc:
            continue
        parent[root] = -1
        disc[root] = low[root] = timer
        timer += 1
        it[root] = 0
        root_children = 0
        st = [root]
        while st:
            u = st[-1]
            i = it[u]
            if i < len(adj[u]):
                it[u] += 1
                v = adj[u][i]
                if v not in disc:
                    parent[v] = u
                    disc[v] = low[v] = timer
                    timer += 1
                    it[v] = 0
                    st.append(v)
                elif v != parent[u]:
                    if disc[v] < low[u]:
                        low[u] = disc[v]
            else:
                st.pop()
                p = parent[u]
                if p != -1:
                    if low[u] < low[p]:
                        low[p] = low[u]
                    if low[u] > disc[p]:
                        bridges.append((min(p, u), max(p, u)))
                    if parent[p] != -1 and low[u] >= disc[p]:
                        cuts.add(p)
                    if p == root:
                        root_children += 1
        if root_children >= 2:
            cuts.add(root)
    return sorted(bridges), sorted(cuts)


def label_propagation_auto(edges_ds, iters: int = 5,
                           num_partitions: int = 8,
                           driver_max: int = 2_000_000):
    """Size-gated front end for :func:`label_propagation_ds` (r5): at
    ≤ ``driver_max`` distinct directed edges the synchronous rounds
    fold on the driver as vectorized pandas passes (counts →
    sort(n desc, label asc) → drop_duplicates per node — the identical
    mode/tie rule), which removes 5 rounds × (hash join + groupby +
    per-node ``map_groups``) of fixed costs at bench scale; above the
    gate the unchanged distributed rounds run. Both forms are
    deterministic and pytest-asserted equal on a forced-past-the-gate
    run."""
    n_edges = edges_ds.count()
    if n_edges > driver_max:
        return label_propagation_ds(edges_ds, iters=iters,
                                    num_partitions=num_partitions)
    t = pa.concat_tables(
        edges_ds.select_columns(["src", "dst"])
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    if t.num_rows == 0:
        return ray.data.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "label": pa.array([], pa.string())}))
    src = np.asarray(t["src"].to_pylist(), dtype=object)
    dst = np.asarray(t["dst"].to_pylist(), dtype=object)
    e = pd.DataFrame({"src": np.concatenate([src, dst]),
                      "dst": np.concatenate([dst, src])}) \
        .drop_duplicates()
    nodes = np.unique(e["src"].to_numpy())
    lab = pd.Series(nodes, index=nodes, dtype=object)
    for _ in range(iters):
        cand = pd.DataFrame({
            "dst": e["dst"].to_numpy(),
            "label": lab.loc[e["src"]].to_numpy()})
        counts = (cand.groupby(["dst", "label"], sort=False)
                  .size().reset_index(name="n"))
        counts = counts.sort_values(
            ["dst", "n", "label"], ascending=[True, False, True],
            kind="stable")
        win = counts.drop_duplicates("dst")
        lab = pd.Series(win["label"].to_numpy(),
                        index=win["dst"].to_numpy(), dtype=object)
    lab = lab.sort_index()
    return ray.data.from_arrow(pa.table({
        "url": pa.array(lab.index.to_numpy(), pa.string()),
        "label": pa.array(lab.to_numpy(), pa.string())}))
