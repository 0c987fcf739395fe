"""Round-4o op families: Welch A/B t-test report, Gini–Simpson token
diversity, full ROC curve table."""

import math
import os
from collections import Counter
from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_welch_t_brute(ray_session):
    """t²/df agree with an independent Fraction-moment recompute, and
    both arms are genuinely populated for every emitted type."""
    from rendler_ray.pipelines.queries import welch_t_ab_test

    out = welch_t_ab_test(SF).to_pandas().set_index("event_type")
    ev = pq.read_table(os.path.join(SF, "events.parquet"),
                       columns=["user_id", "event_type", "value"]) \
        .to_pandas()
    # DuckDB round() is half-away-from-zero
    c = np.floor(np.abs(ev["value"].to_numpy()) * 100 + 0.5) \
        * np.sign(ev["value"].to_numpy())
    ev["cents"] = c.astype(np.int64)
    ev["arm"] = ev["user_id"] % 2
    assert len(out) > 0
    for et, g in ev.groupby("event_type"):
        a = g[g.arm == 0]["cents"].to_numpy()
        b = g[g.arm == 1]["cents"].to_numpy()
        if len(a) < 2 or len(b) < 2:
            assert et not in out.index
            continue
        row = out.loc[et]
        assert int(row["n_a"]) == len(a) and int(row["n_b"]) == len(b)
        assert int(row["sum_a_c"]) == int(a.sum())
        assert int(row["sum_b_c"]) == int(b.sum())
        # independent float recompute (same tree) from exact moments
        na, nb = len(a), len(b)
        sa, sb = int(a.sum()), int(b.sum())
        qa = int((a.astype(object) ** 2).sum())
        qb = int((b.astype(object) ** 2).sum())
        ma, mb = sa / na, sb / nb
        va = (float(qa) - float(sa) * ma) / (na - 1)
        vb = (float(qb) - float(sb) * mb) / (nb - 1)
        sea, seb = va / na, vb / nb
        se = sea + seb
        t2 = (ma - mb) ** 2 / se
        dfw = se * se / (sea * sea / (na - 1) + seb * seb / (nb - 1))
        assert int(row["t2_e6"]) == math.floor(t2 * 1e6)
        assert int(row["df_e6"]) == math.floor(dfw * 1e6)
        # Welch df is bracketed by min-arm-df and pooled df
        assert min(na, nb) - 1 <= dfw <= na + nb - 2


def test_gini_simpson_brute(ray_session):
    """gini_e6 equals the exact Fraction floor per source; bounds and
    the two-draw probability interpretation hold."""
    from rendler_ray.pipelines.queries import gini_simpson_by_source

    out = gini_simpson_by_source(SF).to_pandas().set_index("source")
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["source", "text"]).to_pandas()
    assert len(out) > 0
    for src, g in docs.groupby("source"):
        cnt = Counter()
        for t in g["text"]:
            cnt.update(t.split(" "))
        n = sum(cnt.values())
        cc = sum(c * (c - 1) for c in cnt.values())
        row = out.loc[src]
        assert int(row["n_tokens"]) == n
        assert int(row["distinct_tokens"]) == len(cnt)
        exp = (Fraction(n * (n - 1) - cc, n * (n - 1)) * 10 ** 6
               if n > 1 else 0)
        assert int(row["gini_e6"]) == math.floor(exp)
        assert 0 <= int(row["gini_e6"]) <= 1_000_000


def test_roc_curve_brute(ray_session):
    """Every operating point matches a pandas recompute; the curve is
    monotone and ends at (1, 1); AUC from the curve's trapezoids is
    consistent with auc_quality_eval within the e6 quantization."""
    from rendler_ray.pipelines.queries import (auc_quality_eval,
                                               roc_curve_eval)

    out = roc_curve_eval(SF).to_pandas().sort_values(
        "s", ascending=False).reset_index(drop=True)
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text", "lang"]).to_pandas()
    from rendler_ray.pipelines.queries import _clf_weights

    scores, pos = [], []
    for t, lg in zip(docs["text"], docs["lang"]):
        toks = np.array(t.split(" "), dtype=object)
        uniq, inv = np.unique(toks, return_inverse=True)
        scores.append(int(np.rint(_clf_weights(uniq)[inv].sum())))
        pos.append(lg == "en")
    s = np.array(scores)
    p = np.array(pos)
    np_t, nn_t = int(p.sum()), int((~p).sum())
    assert len(out) == len(np.unique(s))
    for _, row in out.head(50).iterrows():
        thr = int(row["s"])
        tp = int((p & (s >= thr)).sum())
        fp = int((~p & (s >= thr)).sum())
        assert (int(row["tp"]), int(row["fp"])) == (tp, fp)
        assert int(row["tpr_e6"]) == 10 ** 6 * tp // np_t
        assert int(row["fpr_e6"]) == 10 ** 6 * fp // nn_t
    # monotone in threshold-descending order, ending at (all, all)
    assert (out["tp"].diff().dropna() >= 0).all()
    assert (out["fp"].diff().dropna() >= 0).all()
    assert int(out["tp"].iloc[-1]) == np_t
    assert int(out["fp"].iloc[-1]) == nn_t
    # trapezoid AUC over exact counts vs the Mann–Whitney scalar op
    tp_ = np.concatenate([[0], out["tp"].to_numpy()])
    fp_ = np.concatenate([[0], out["fp"].to_numpy()])
    auc2 = int(((fp_[1:] - fp_[:-1]) * (tp_[1:] + tp_[:-1])).sum())
    auc_e6 = 10 ** 6 * auc2 // (2 * np_t * nn_t)
    ref = int(auc_quality_eval(SF).to_pandas()["auc_e6"][0])
    assert abs(auc_e6 - ref) <= 1


def _edges_df(sf):
    o = pq.read_table(os.path.join(sf, "orders.parquet"),
                      columns=["o_custkey", "o_orderkey"]).to_pandas()
    a = np.minimum(o.o_custkey, o.o_orderkey % 1500 + 1).to_numpy()
    b = np.maximum(o.o_custkey, o.o_orderkey % 1500 + 1).to_numpy()
    keep = a != b
    return pd.DataFrame({"a": a[keep], "b": b[keep]}).drop_duplicates()


def _ktruss_brute(e, k):
    """Independent recompute-everything peeling (no decrement queue)."""
    edges = {(int(r.a), int(r.b)) for r in e.itertuples()}
    while True:
        adj = {}
        for x, y in edges:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        sup = {(x, y): len(adj[x] & adj[y]) for x, y in edges}
        drop = {f for f, s in sup.items() if s < k - 2}
        if not drop:
            return sorted(edges), sup
        edges -= drop


def test_ktruss_brute_and_two_form(ray_session):
    """Driver output equals an independent full-recompute peel at two
    sfs (incl. the empty 4-truss at sf0.001); the forced-distributed
    rounds produce the identical table; the truss invariant holds."""
    from rendler_ray.pipelines.queries import ktruss_crawl_graph

    for sf in (SF, "/root/testdata/sf0.01"):
        out = ktruss_crawl_graph(sf).to_pandas() \
            .sort_values(["a", "b"]).reset_index(drop=True)
        exp_edges, sup = _ktruss_brute(_edges_df(sf), 4)
        assert [(int(r.a), int(r.b)) for r in out.itertuples()] \
            == exp_edges
        for r in out.itertuples():
            assert int(r.support) == sup[(int(r.a), int(r.b))]
            assert int(r.support) >= 2  # k - 2 within the fixpoint
        dist = ktruss_crawl_graph(sf, _force_distributed=True) \
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        assert dist.astype("int64").equals(out.astype("int64")), sf


def test_rocchio_brute(ray_session):
    """Expanded-query ranking equals a direct numpy recompute of the
    Rocchio formula (top-10 feedback, E = 20⌊q·1e6⌋ + Σ⌊v·1e6⌋)."""
    from rendler_ray.pipelines.queries import rocchio_expand_search

    out = rocchio_expand_search(SF).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    emb = pq.read_table(os.path.join(SF, "embeddings.parquet")) \
        .to_pandas()
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy(np.int64)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True),
                        1e-300)
    for qid in range(4):
        q = m[ids == qid][0]
        qn = q / np.linalg.norm(q)
        s = np.round(mn @ qn * 1e6).astype(np.int64)
        order = np.lexsort((ids, -s))[:10]
        fb = ids[order]
        e = 20.0 * np.floor(q * 1e6)
        for d in fb:
            e = e + np.floor(m[ids == d][0] * 1e6)
        en = e / np.linalg.norm(e)
        s2 = np.round(mn @ en * 1e6).astype(np.int64)
        order2 = np.lexsort((ids, -s2))[:10]
        got = out[out.query_id == qid]
        assert got["vec_id"].tolist() == ids[order2].tolist()
        assert got["score_e6"].tolist() == s2[order2].tolist()


def test_snippet_anchored_is_global_opt(ray_session):
    """Best anchored window equals brute enumeration over ALL window
    starts (the anchoring argument), and hit counts are exact."""
    from rendler_ray.pipelines.queries import (_BM25_QUERIES,
                                               snippet_extract_docs)

    out = snippet_extract_docs(SF).to_pandas()
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas() \
        .set_index("doc_id")
    assert len(out) == 40  # one row per (query, top-10 doc)
    for r in out.itertuples():
        toks = docs.loc[int(r.doc_id), "text"].split(" ")
        terms = set(_BM25_QUERIES[int(r.query_id)])
        ismatch = np.array([t in terms for t in toks])
        # global optimum over EVERY start position 1..len
        best_n, best_p = -1, -1
        for p in range(1, len(toks) + 1):
            n = int(ismatch[p - 1:p - 1 + 10].sum())
            if n > best_n:
                best_n, best_p = n, p
        assert int(r.n_hits) == best_n
        # the anchored start is a hit position achieving the optimum
        assert ismatch[int(r.best_start) - 1]
        got_n = int(ismatch[int(r.best_start) - 1:
                            int(r.best_start) - 1 + 10].sum())
        assert got_n == best_n
        # smallest anchored start among optima
        for p in (np.flatnonzero(ismatch) + 1):
            if p >= int(r.best_start):
                break
            assert int(ismatch[p - 1:p - 1 + 10].sum()) < best_n


def test_dbscan_brute(ray_session):
    """Labels/cores/counts equal a direct numpy+BFS recompute at
    sf0.001, and all three populations (core, border, noise) occur."""
    from rendler_ray.pipelines.queries import dbscan_embeddings

    out = dbscan_embeddings(SF).to_pandas().set_index("vec_id")
    emb = pq.read_table(os.path.join(SF, "embeddings.parquet")) \
        .to_pandas()
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy(np.int64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sim = np.round(mn @ mn.T * 1e6).astype(np.int64)
    np.fill_diagonal(sim, -(10 ** 9))
    adjm = sim >= 300_000
    nb = adjm.sum(1)
    core = nb >= 5
    # BFS components over the core-core graph
    lab = {}
    for s_i in np.flatnonzero(core):
        if int(ids[s_i]) in lab:
            continue
        comp, stack = [], [s_i]
        seen = {s_i}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in np.flatnonzero(adjm[x] & core):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        root = int(ids[list(comp)].min())
        for x in comp:
            lab[int(ids[x])] = root
    for i in range(len(ids)):
        vid = int(ids[i])
        row = out.loc[vid]
        assert int(row["n_nbrs"]) == int(nb[i])
        assert int(row["is_core"]) == int(core[i])
        if core[i]:
            assert int(row["label"]) == lab[vid]
        else:
            cn = [lab[int(ids[j])]
                  for j in np.flatnonzero(adjm[i] & core)]
            assert int(row["label"]) == (min(cn) if cn else -1)
    assert (out["is_core"] == 1).any()
    assert ((out["is_core"] == 0) & (out["label"] >= 0)).any()  # border
    assert (out["label"] == -1).any()                           # noise
    assert out[out.is_core == 1]["label"].nunique() > 1


def test_kmv_overlap_brute_and_accuracy(ray_session):
    """Sketch algebra equals an independent hash recompute, and the
    estimates land near the EXACT truth (k=64 ⇒ ~1/√64 rel. error)."""
    import hashlib

    from rendler_ray.pipelines.queries import kmv_overlap_types

    out = kmv_overlap_types(SF).to_pandas()
    ev = pq.read_table(os.path.join(SF, "events.parquet"),
                       columns=["event_type", "user_id"]).to_pandas()
    users = {t: set(g["user_id"].tolist())
             for t, g in ev.groupby("event_type")}

    def sketch(us):
        return sorted(int(hashlib.md5(str(int(u)).encode())
                          .hexdigest()[:15], 16) for u in us)[:64]

    assert len(out) == len(users) * (len(users) - 1) // 2
    for r in out.itertuples():
        sa, sb = set(sketch(users[r.type_a])), \
            set(sketch(users[r.type_b]))
        union = sorted(sa | sb)[:64]
        n_kept, kth = len(union), union[-1]
        u_est = n_kept if n_kept < 64 else 63 * 16 ** 15 // kth
        n_both = sum(1 for h in union if h in sa and h in sb)
        assert int(r.n_kept) == n_kept and int(r.n_both) == n_both
        assert int(r.union_est) == u_est
        assert int(r.inter_est) == n_both * u_est // n_kept
        tu = len(users[r.type_a] | users[r.type_b])
        ti = len(users[r.type_a] & users[r.type_b])
        assert abs(int(r.union_est) - tu) <= 0.5 * tu
        assert abs(int(r.jaccard_e6) / 1e6 - ti / tu) <= 0.25


def _pav_brute(pairs):
    """O(n²) reference PAV: repeatedly merge ANY adjacent violating
    pair (order independent — the PAV fixpoint is unique)."""
    blocks = [[p, n] for p, n in pairs]
    changed = True
    while changed:
        changed = False
        for i in range(len(blocks) - 1):
            a, b = blocks[i], blocks[i + 1]
            if a[0] * b[1] > b[0] * a[1]:
                blocks[i:i + 2] = [[a[0] + b[0], a[1] + b[1]]]
                changed = True
                break
    return blocks


def test_isotonic_pav_brute(ray_session):
    """The stack PAV equals the quadratic merge-any-violator reference;
    rates are monotone; mass is conserved per block."""
    from fractions import Fraction

    from rendler_ray.pipelines.queries import isotonic_calibrate_scores

    out = isotonic_calibrate_scores(SF).to_pandas()
    hist = out.sort_values("s")[["n_pos", "n"]].to_numpy()
    blocks = _pav_brute([(int(p), int(n)) for p, n in hist])
    # expand reference blocks over rows and compare rationals
    it = iter(out.sort_values("s").itertuples())
    rates = []
    for bp, bn in blocks:
        left = bn
        f = Fraction(bp, bn)
        rates.append(f)
        while left > 0:
            r = next(it)
            assert Fraction(int(r.iso_num), int(r.iso_den)) == f
            left -= int(r.n)
    assert all(x <= y for x, y in zip(rates, rates[1:]))
    assert out["n_pos"].sum() == sum(p for p, _ in blocks)
    assert (out["iso_num"] <= out["iso_den"]).all()
    assert out["s"].is_monotonic_increasing
