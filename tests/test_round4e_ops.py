"""Round-4e ops: k-core decomposition, distributed PCA, MMR
diversified re-rank, priority dedup, source-token concentration —
each checked against an independent brute-force recomputation (the
DuckDB oracles are checked separately by scripts/check_correctness.py;
these tests must not depend on them)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rendler_ray.goldenhash import to_pandas
from rendler_ray.pipelines.queries import (
    _LANG_PRIORITY,
    mmr_rerank_docs,
    pca_project_embeddings,
    priority_dedup_docs,
    source_token_concentration,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- k-core


def _edges_ds(pairs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in pairs], pa.string()),
        "dst": pa.array([b for _, b in pairs], pa.string())}))


KNOWN = [("a", "b"), ("b", "c"), ("a", "c"),          # triangle: core 2
         ("c", "d"), ("d", "e"),                      # tail: core 1
         ("f", "g"), ("f", "h"), ("f", "i"),          # K4: core 3
         ("g", "h"), ("g", "i"), ("h", "i"),
         ("a", "b"), ("e", "e")]                      # dup + self-loop
KNOWN_CORE = {"a": 2, "b": 2, "c": 2, "d": 1, "e": 1,
              "f": 3, "g": 3, "h": 3, "i": 3}


def test_kcore_known_graph(ray_session):
    from rendler_ray.functions.graph import kcore

    df = kcore(_edges_ds(KNOWN))
    assert dict(zip(df["url"], df["core"])) == KNOWN_CORE


def test_kcore_two_form_equality(ray_session):
    """Driver peeling == distributed peel rounds, on the known graph
    AND on a crawl graph (directed, has dangling/redirect edges)."""
    from rendler_ray.functions.graph import kcore, kcore_auto, kcore_ds
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.pipelines.queries import _synth_docs_for
    from rendler_ray.sources.synthweb import default_seeds

    for edges in (_edges_ds(KNOWN),
                  crawl(CrawlConfig(docs_path=_synth_docs_for(SF),
                                    seeds=default_seeds(1),
                                    max_depth=3)).edges):
        drv = kcore(edges).reset_index(drop=True)
        dist = (kcore_ds(edges).to_pandas()
                .sort_values("url").reset_index(drop=True))
        pd.testing.assert_frame_equal(drv, dist)
        # the gate picks the driver form here; same answer either way
        auto = (kcore_auto(edges).to_pandas()
                .sort_values("url").reset_index(drop=True))
        pd.testing.assert_frame_equal(drv, auto)


def test_kcore_empty(ray_session):
    from rendler_ray.functions.graph import kcore_auto

    out = kcore_auto(_edges_ds([])).to_pandas()
    assert len(out) == 0


# ---------------------------------------------------------------- PCA


def test_pca_matches_driver_brute(ray_session):
    """The distributed two-pass PCA equals a single-process numpy PCA
    over the same fixed-point input — exact row equality (integer
    outputs; per-row dot products are batching-invariant)."""
    out = to_pandas(pca_project_embeddings(SF)).sort_values(
        "vec_id").reset_index(drop=True)

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist())
    m = np.array(t["embedding"].to_pylist(), np.float64)
    e = np.floor(m * 1e6)  # the op's fixed-point convention
    n = len(e)
    mean = e.sum(axis=0) / 1e6 / n
    G = (e.astype(np.int64).T @ e.astype(np.int64))
    cov = G / 1e12 / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    W = evecs[:, ::-1][:, :4].copy()
    for c in range(4):
        if W[np.argmax(np.abs(W[:, c])), c] < 0:
            W[:, c] = -W[:, c]
    y = np.round(((e / 1e6 - mean) @ W) * 1e6).astype(np.int64)

    order = np.argsort(ids)
    for c in range(4):
        assert (out[f"pc{c + 1}_e6"].to_numpy()
                == y[order, c]).all(), f"pc{c + 1} mismatch"
    # variance along components is non-increasing (eigh ordering held)
    vs = [out[f"pc{c + 1}_e6"].to_numpy(np.float64).var()
          for c in range(4)]
    assert all(vs[i] >= vs[i + 1] - 1e-6 for i in range(3))
    # projections are centered (means were subtracted): |mean| small
    for c in range(4):
        assert abs(out[f"pc{c + 1}_e6"].mean()) < 1000  # < 1e-3 in e6


# ---------------------------------------------------------------- MMR


def test_mmr_matches_independent_brute(ray_session):
    """Independent greedy recomputation: full cosine matrix over the
    corpus, top-40 candidates by (score_e6 desc, id asc), per-step
    max-sim recomputed from scratch (the op keeps a running max)."""
    out = to_pandas(mmr_rerank_docs(SF))

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist())
    m = np.array(t["embedding"].to_pylist(), np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    qs = {int(i): m[k] for k, i in enumerate(ids) if i < 4}
    corp = ids >= 16
    cids, cm = ids[corp], m[corp]

    got_rows = out.sort_values(["query_id", "rank"]).to_numpy().tolist()
    exp_rows = []
    for qid in sorted(qs):
        rel = np.round((cm @ qs[qid]) * 1e6).astype(np.int64)
        order = sorted(range(len(cids)),
                       key=lambda i: (-rel[i], cids[i]))[:40]
        cand = [(int(cids[i]), int(rel[i])) for i in order]
        cand.sort()  # the op iterates candidates in id order
        picked = []
        for rank in range(1, 11):
            best = None
            for vid, r in cand:
                if vid in (p[0] for p in picked):
                    continue
                if picked:
                    u = cm[np.flatnonzero(cids == vid)[0]]
                    ms = max(int(np.round(
                        float(u @ cm[np.flatnonzero(cids == p)[0]])
                        * 1e6)) for p, _ in picked)
                    sc = r - ms
                else:
                    sc = r
                if best is None or sc > best[2]:
                    best = (vid, r, sc)
            picked.append((best[0], best[1]))
            exp_rows.append([qid, best[0], best[1], best[2], rank])
    assert got_rows == exp_rows


def test_mmr_properties(ray_session):
    out = to_pandas(mmr_rerank_docs(SF))
    for qid, g in out.groupby("query_id"):
        assert g["vec_id"].is_unique
        g = g.sort_values("rank")
        # rank 1 is the pure-relevance argmax (mmr == rel there)
        assert g.iloc[0]["mmr_e6"] == g.iloc[0]["rel_e6"]
        assert (g["vec_id"] >= 16).all()


# ------------------------------------------------------ priority dedup


def test_priority_dedup_planted(ray_session, tmp_path):
    """Planted cross-language duplicates: the en copy survives even
    when a zh copy has the smaller doc_id; ties break on doc_id."""
    rows = [
        (10, "alpha beta", "zh"), (11, "alpha beta", "en"),
        (12, "alpha beta", "de"),            # en wins despite id 11>10
        (20, "gamma", "fr"), (21, "gamma", "fr"),   # tie: min doc_id
        (30, "delta", "xx"),                 # unknown lang, alone
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string())})
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = to_pandas(priority_dedup_docs(str(tmp_path)))
    by_fp = {hashlib.md5(t.encode()).hexdigest(): t
             for _, t, _ in rows}
    got = {by_fp[r.fingerprint]: (r.doc_id, r.lang_rank)
           for r in out.itertuples()}
    assert got == {"alpha beta": (11, _LANG_PRIORITY["en"]),
                   "gamma": (20, _LANG_PRIORITY["fr"]),
                   "delta": (30, 9)}


def test_priority_dedup_no_dups_is_identity(ray_session):
    """sf0.001 has no duplicate texts: every doc survives, priority =
    its own lang rank."""
    out = to_pandas(priority_dedup_docs(SF))
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pylist()
    assert len(out) == len(docs)
    ranks = {r["doc_id"]: _LANG_PRIORITY.get(r["lang"], 9)
             for r in docs}
    for r in out.itertuples():
        assert ranks[r.doc_id] == r.lang_rank


# -------------------------------------------- source concentration


def test_source_concentration_brute(ray_session):
    out = to_pandas(source_token_concentration(SF)).sort_values(
        "rank").reset_index(drop=True)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text", "source"]).to_pylist()
    agg: dict[str, int] = {}
    for r in docs:
        agg[r["source"]] = agg.get(r["source"], 0) \
            + len(r["text"].split(" "))
    total = sum(agg.values())
    exp = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(out["source"]) == [s for s, _ in exp]
    assert list(out["n_tokens"]) == [n for _, n in exp]
    cum = np.cumsum([n for _, n in exp])
    assert list(out["share_e9"]) == [n * 10**9 // total for _, n in exp]
    assert list(out["cum_share_e9"]) == [int(c) * 10**9 // total
                                         for c in cum]
    # Lorenz invariants: monotone, ends exactly at 1e9
    assert out["cum_share_e9"].is_monotonic_increasing
    assert out["cum_share_e9"].iloc[-1] == 10**9


# --------------------------------------------------------- kNN graph


def _emb():
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"])
    ids = np.array(t["vec_id"].to_pylist())
    m = np.array(t["embedding"].to_pylist(), np.float64)
    return ids, m / np.linalg.norm(m, axis=1, keepdims=True), \
        np.array(t["label"].to_pylist())


def test_knn_graph_matches_brute_and_partition_invariant(ray_session):
    import ray.data as rd

    from rendler_ray.functions.ann import knn_graph
    from rendler_ray.pipelines.queries import knn_graph_embeddings

    out = to_pandas(knn_graph_embeddings(SF)).sort_values(
        ["vec_id", "rank"]).reset_index(drop=True)
    ids, m, _ = _emb()
    sims = np.round(m @ m.T * 1e6).astype(np.int64)
    exp = []
    for qi, qid in enumerate(ids):
        cand = sorted((-sims[qi, bi], int(b))
                      for bi, b in enumerate(ids) if b != qid)
        for r, (s, b) in enumerate(cand[:4], 1):
            exp.append([int(qid), b, int(-s), r])
    assert out.to_numpy().tolist() == sorted(
        exp, key=lambda r: (r[0], r[3]))
    # block layout must not change the result (running-merge total order)
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    out7 = (knn_graph(rd.from_arrow(t).repartition(7), k=4).to_pandas()
            .sort_values(["vec_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out7)


def test_bitext_margin_matches_brute(ray_session):
    from rendler_ray.pipelines.queries import bitext_mine_pairs

    out = to_pandas(bitext_mine_pairs(SF)).sort_values(
        "src_id").reset_index(drop=True)
    ids, m, lbl = _emb()
    side = (lbl >= 5).astype(int)
    sims = np.round(m @ m.T * 1e6).astype(np.int64)
    sums, kns, best = {}, {}, {}
    for qi, qid in enumerate(ids):
        cand = sorted((-sims[qi, bi], int(b))
                      for bi, b in enumerate(ids)
                      if side[bi] != side[qi])[:4]
        sums[int(qid)] = int(-sum(s for s, _ in cand))
        kns[int(qid)] = len(cand)
        best[int(qid)] = (cand[0][1], int(-cand[0][0]))
    exp = []
    for x in sorted(best):
        y, sim = best[x]
        num = 2 * sim * kns[x] * kns[y]
        den = sums[x] * kns[y] + sums[y] * kns[x]
        if den > 0 and 100 * num >= 105 * den:
            exp.append([x, y, sim, num, den])
    assert out.to_numpy().tolist() == exp
    assert len(exp) > 0  # the op finds pairs on this corpus


def test_source_percentile_brute(ray_session):
    from rendler_ray.pipelines.queries import source_percentile_scores

    out = to_pandas(source_percentile_scores(SF))
    df = out.sort_values(["source", "clf_score", "doc_id"])
    for _, g in df.groupby("source"):
        n = len(g)
        assert list(g["src_rank"]) == list(range(1, n + 1))
        exp = [(r - 1) * 10**9 // (n - 1) if n > 1 else 0
               for r in range(1, n + 1)]
        assert list(g["pctl_e9"]) == exp
    # percentiles are comparable across sources: max is exactly 1e9
    assert out.groupby("source")["pctl_e9"].max().eq(10**9).all()


def test_label_centroids_brute(ray_session):
    from rendler_ray.pipelines.queries import label_centroids_embeddings

    out = to_pandas(label_centroids_embeddings(SF)).sort_values(
        ["label", "i"]).reset_index(drop=True)
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["embedding", "label"])
    m = np.floor(np.array(t["embedding"].to_pylist(), np.float64)
                 * 1e6).astype(np.int64)
    lbl = np.array(t["label"].to_pylist(), np.int64)
    rows = []
    for lab in np.unique(lbl):
        sel = m[lbl == lab]
        s, n = sel.sum(axis=0), len(sel)
        cen = np.where(s >= 0, s // n, -((-s) // n))
        rows += [[int(lab), i + 1, int(cen[i]), n]
                 for i in range(m.shape[1])]
    assert out.to_numpy().tolist() == rows


def test_bitext_two_forms_agree(ray_session):
    """Driver fold (below the gate) vs distributed groupby + joins
    (gate forced to 0): identical output."""
    from rendler_ray.pipelines.queries import bitext_mine_pairs

    a = to_pandas(bitext_mine_pairs(SF)).sort_values(
        "src_id").reset_index(drop=True)
    b = to_pandas(bitext_mine_pairs(SF, driver_max=0)).sort_values(
        "src_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_knn_graph_lsh_recall_and_exact_sims(ray_session):
    """The approximate graph's recall@4 vs the exact graph clears the
    pinned floor at bits=5 (deterministic: seeded planes), and every
    emitted sim is the TRUE cosine (approximation loses edges, never
    distorts scores)."""
    from rendler_ray.pipelines.queries import (
        knn_graph_embeddings, knn_graph_lsh_embeddings)

    exact = to_pandas(knn_graph_embeddings(SF))
    approx = to_pandas(knn_graph_lsh_embeddings(SF))
    E = set(zip(exact["vec_id"], exact["nbr_id"]))
    A = set(zip(approx["vec_id"], approx["nbr_id"]))
    assert len(E & A) / len(E) >= 0.65
    ids, m, _ = _emb()
    pos = {int(v): i for i, v in enumerate(ids)}
    sims = np.round(m @ m.T * 1e6).astype(np.int64)
    for r in approx.itertuples():
        assert sims[pos[r.vec_id], pos[r.nbr_id]] == r.sim_e6


def test_kcore_hypothesis_vs_iterated_filter(ray_session):
    """Property check on random small graphs: peeling coreness equals
    the DEFINITION — coreness(v) = max k such that v survives the
    iterated 'drop nodes with degree < k' fixpoint (an independent
    implementation using set filtering per k, no shared code)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rendler_ray.functions.graph import kcore

    node = st.integers(0, 9).map(lambda i: f"n{i}")
    edges_strat = st.lists(st.tuples(node, node), min_size=0,
                           max_size=25)

    def brute_coreness(pairs):
        adj = {}
        for a, b in pairs:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        core = {u: 0 for u in adj}
        k = 1
        while True:
            alive = set(adj)
            while True:  # k-core fixpoint by iterated filtering
                drop = {u for u in alive
                        if len(adj[u] & alive) < k}
                if not drop:
                    break
                alive -= drop
            if not alive:
                break
            for u in alive:
                core[u] = k
            k += 1
        return core

    @settings(max_examples=15, deadline=None)
    @given(edges_strat)
    def check(pairs):
        df = kcore(_edges_ds(pairs))
        got = dict(zip(df["url"], df["core"]))
        assert got == brute_coreness(pairs)

    check()


def test_sorted_group_sums_matches_native(ray_session):
    """groupagg.sorted_group_sums == Ray's native aggregate, both at
    the default block size AND with a tiny target block size that
    splits range partitions into many blocks — forcing keys to
    straddle block boundaries and exercising the bounded fixup."""
    import ray.data as rd
    from ray.data import DataContext
    from ray.data.aggregate import Count, Sum

    from rendler_ray.functions.groupagg import sorted_group_sums

    t = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "value"])
    uid = np.array(t["user_id"].to_pylist(), np.int64)
    keyed_tbl = pa.table({"k": pa.array(uid % 7, pa.int64()),  # hot keys
                          "value": t["value"]})

    def run(block_bytes):
        ctx = DataContext.get_current()
        old = ctx.target_max_block_size
        try:
            if block_bytes:
                ctx.target_max_block_size = block_bytes
            ds = rd.from_arrow(keyed_tbl).repartition(8)
            out = sorted_group_sums(ds, "k", ["value"],
                                    count_col="n").to_pandas()
        finally:
            ctx.target_max_block_size = old
        return out.sort_values("k").reset_index(drop=True)

    native = (rd.from_arrow(keyed_tbl).groupby("k")
              .aggregate(Sum("value", alias_name="value"),
                         Count(alias_name="n"))
              .to_pandas().sort_values("k").reset_index(drop=True))
    for blk in (None, 2048):  # default; tiny => forced straddles
        got = run(blk)
        assert list(got["k"]) == list(native["k"])
        assert list(got["n"]) == list(native["n"])
        assert np.allclose(got["value"], native["value"], rtol=0,
                           atol=1e-9)


def test_sorted_group_agg_min_max_string_key(ray_session):
    """The generic spec (min/max/count) over a STRING key matches the
    native aggregate — the exact-dedup shape (content-hash keys)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    from rendler_ray.functions.groupagg import sorted_group_agg

    rng = np.random.default_rng(3)
    keys = [f"k{int(i):03d}" for i in rng.integers(0, 50, 500)]
    vals = rng.integers(-1000, 1000, 500).astype(np.int64)
    tbl = pa.table({"key": pa.array(keys, pa.string()),
                    "v": pa.array(vals, pa.int64())})
    ds = rd.from_arrow(tbl).repartition(7)
    got = (sorted_group_agg(ds, "key",
                            [("v", "min", "lo"), ("v", "max", "hi"),
                             ("key", "count", "n")])
           .to_pandas().sort_values("key").reset_index(drop=True))
    exp = (rd.from_arrow(tbl).groupby("key")
           .aggregate(Min("v", alias_name="lo"),
                      Max("v", alias_name="hi"),
                      Count(alias_name="n"))
           .to_pandas().sort_values("key").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
