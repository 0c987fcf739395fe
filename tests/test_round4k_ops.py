"""Round-4k op families: k-anonymity/l-diversity release audit,
Benford first-digit audit, winsorization at exact order statistics."""

import math
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    return pq.read_table(os.path.join(SF, "events.parquet")).to_pandas()


def _orders() -> pd.DataFrame:
    return pq.read_table(os.path.join(SF, "orders.parquet")).to_pandas()


def test_k_anonymity_brute(ray_session):
    """Per-QI row/user counts and both flags match a pandas brute
    force, and the audit actually finds violations at this scale."""
    from rendler_ray.pipelines.queries import k_anonymity_audit

    out = k_anonymity_audit(SF).to_pandas() \
        .sort_values(["event_type", "day", "hour"]).reset_index(drop=True)

    ev = _events()
    us = ev.ts.to_numpy("datetime64[us]").astype(np.int64)
    ev = ev.assign(day=us // 86_400_000_000,
                   hour=(us // 3_600_000_000) % 24)
    g = ev.groupby(["event_type", "day", "hour"]).agg(
        n_rows=("event_id", "size"),
        n_users=("user_id", "nunique")).reset_index()
    g["k_anon"] = (g.n_rows >= 5).astype(np.int64)
    g["l_diverse"] = (g.n_users >= 3).astype(np.int64)
    g = g.sort_values(["event_type", "day", "hour"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(out, g, check_dtype=False)
    # the audit bites: at least one group violates each rule
    assert (g.k_anon == 0).any() and (g.l_diverse == 0).any()


def test_benford_brute(ray_session):
    """Digit counts are the exact integer leading digits and the
    expected/chi2 fixed-point terms reproduce the float tree."""
    from rendler_ray.pipelines.queries import benford_digit_audit

    out = benford_digit_audit(SF).to_pandas() \
        .sort_values("digit").reset_index(drop=True)

    cents = np.rint(_orders().o_totalprice.to_numpy(np.float64) * 100) \
        .astype(np.int64)
    cents = cents[cents > 0]
    lead = np.array([int(str(v)[0]) for v in cents], np.int64)
    n_by = pd.Series(lead).value_counts().sort_index()
    total = int(n_by.sum())
    d = n_by.index.to_numpy(np.int64)
    assert (out.digit.to_numpy() == d).all()
    assert (out.n_obs.to_numpy() == n_by.to_numpy()).all()
    exp = total * (np.log(1.0 + 1.0 / d) / np.log(10.0))
    dev = n_by.to_numpy(np.float64) - exp
    assert (out.expected_e6.to_numpy()
            == np.rint(1e6 * exp).astype(np.int64)).all()
    assert (out.chi2_term_e6.to_numpy()
            == np.rint(1e6 * dev * dev / exp).astype(np.int64)).all()
    # the law is informative here: expectations sum to ~N
    assert abs(out.expected_e6.sum() / 1e6 - total) < 1.0


def test_winsorize_brute(ray_session):
    """Clipped values match numpy clip at the exact p5/p95 order
    statistics, and the clip actually fires on both tails."""
    from rendler_ray.pipelines.queries import winsorize_order_values

    out = winsorize_order_values(SF).to_pandas() \
        .sort_values("o_orderkey").reset_index(drop=True)

    o = _orders()
    cents = np.rint(o.o_totalprice.to_numpy(np.float64) * 100) \
        .astype(np.int64)
    srt = np.sort(cents)
    n = len(srt)
    lo, hi = srt[5 * (n - 1) // 100], srt[95 * (n - 1) // 100]
    want = pd.DataFrame({"o_orderkey": o.o_orderkey,
                         "value_c": cents,
                         "winsor_c": np.clip(cents, lo, hi)}) \
        .sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    assert (want.winsor_c == lo).sum() > (cents == lo).sum()
    assert (want.winsor_c == hi).sum() > (cents == hi).sum()
    assert math.isclose(
        np.clip(cents, lo, hi).mean(), cents.mean(), rel_tol=0.2)


def _edges_001() -> pd.DataFrame:
    o = _orders()
    u = o.o_custkey.to_numpy(np.int64)
    v = (o.o_orderkey.to_numpy(np.int64) % 1500) + 1
    a, b = np.minimum(u, v), np.maximum(u, v)
    keep = a != b
    return pd.DataFrame({"a": a[keep], "b": b[keep]}).drop_duplicates()


def _adj_001() -> dict:
    adj: dict = {}
    for a, b in _edges_001().itertuples(index=False):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    return adj


def test_brandes_known_graphs():
    """Star and path graphs reproduce the closed-form betweenness;
    a 4-cycle exercises exact Fraction split over two shortest
    paths."""
    from fractions import Fraction

    from rendler_ray.functions.graph import brandes_betweenness

    # star K1,4: center 0 carries 2*C(4,2) = 12 over all sources
    a = np.array([0, 0, 0, 0]), np.array([1, 2, 3, 4])
    btw = brandes_betweenness(a[0], a[1], [0, 1, 2, 3, 4])
    assert btw[0] == 12 and all(btw.get(i, 0) == 0 for i in (1, 2, 3, 4))
    # path 0-1-2-3-4: btw = 2 * (left * right)
    p = np.array([0, 1, 2, 3]), np.array([1, 2, 3, 4])
    btw = brandes_betweenness(p[0], p[1], [0, 1, 2, 3, 4])
    assert btw[1] == 6 and btw[2] == 8 and btw[3] == 6
    # 4-cycle: two shortest paths 0→3 split 1/2 + 1/2 per middle node
    c = np.array([0, 1, 0, 2]), np.array([1, 3, 2, 3])
    btw = brandes_betweenness(c[0], c[1], [0, 1, 2, 3])
    assert btw[1] == Fraction(1) and btw[2] == Fraction(1)


def test_betweenness_seed_sample_brute(ray_session):
    """The sf0.001 top-20 matches an independent per-source
    shortest-path enumeration (sigma ratios recomputed via pair DP)."""
    from fractions import Fraction

    from rendler_ray.pipelines.queries import betweenness_seed_sample

    out = betweenness_seed_sample(SF).to_pandas()
    adj = _adj_001()

    from collections import deque
    btw: dict = {}
    for s in (1, 2, 3, 4):
        dist, sigma, order = {s: 0}, {s: 1}, [s]
        q = deque([s])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v], sigma[v] = dist[u] + 1, 0
                    order.append(v)
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
        # delta via pair DP: for each target t, walk the DAG backward
        for t in order:
            if t == s:
                continue
            # fraction of s→t shortest paths through v
            thru = {t: Fraction(1)}
            lvl = sorted((n for n in thru), key=lambda n: -dist[n])
            pend = deque([t])
            while pend:
                w = pend.popleft()
                for v in adj[w]:
                    if dist.get(v, -1) == dist[w] - 1:
                        add = thru[w] * Fraction(sigma[v], sigma[w])
                        if v not in thru:
                            thru[v] = Fraction(0)
                            pend.append(v)
                        thru[v] += add
            for v, f in thru.items():
                if v not in (s, t):
                    btw[v] = btw.get(v, Fraction(0)) + f
    rows = sorted(((f.numerator * 10**9) // f.denominator, k)
                  for k, f in btw.items())
    want = [(k, v) for v, k in rows if v > 0]
    want.sort(key=lambda r: (-r[1], r[0]))
    want = want[:20]
    got = list(zip(out.node.tolist(), out.btw_e9.tolist()))
    assert got == want


def test_closeness_brute_and_two_form(ray_session):
    """Driver closeness matches a BFS brute force, and the forced
    distributed multi-source form agrees exactly."""
    from rendler_ray.pipelines.queries import closeness_centrality_seeds

    out = closeness_centrality_seeds(SF).to_pandas() \
        .sort_values("src").reset_index(drop=True)
    adj = _adj_001()
    from collections import deque
    rows = []
    for s in (1, 2, 3, 4):
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= 6:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        nr, sd = len(dist), sum(dist.values())
        rows.append((s, nr, sd, (nr - 1) * 10**6 // sd if sd else 0))
    want = pd.DataFrame(rows, columns=[
        "src", "n_reached", "sum_dist", "closeness_e6"])
    pd.testing.assert_frame_equal(out, want, check_dtype=False)

    dist_form = closeness_centrality_seeds(SF, driver_max=0) \
        .to_pandas().sort_values("src").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        dist_form.astype("int64"), want.astype("int64"))


def test_bipartite_brute_and_two_form(ray_session):
    """Walk-parity flags match a level-set brute force; the derived
    graph has triangles so odd witnesses exist; forced distributed
    form agrees exactly."""
    from rendler_ray.pipelines.queries import bipartite_check_graph

    out = bipartite_check_graph(SF).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    adj = _adj_001()
    seen = {1: {0}}
    level = {1}
    for d in range(1, 7):
        nxt = set()
        for u in level:
            for v in adj.get(u, ()):
                s = seen.setdefault(v, set())
                if d not in s:
                    s.add(d)
                    nxt.add(v)
        level = nxt
    ks = sorted(seen)
    he = [int(any(x % 2 == 0 for x in seen[k])) for k in ks]
    ho = [int(any(x % 2 == 1 for x in seen[k])) for k in ks]
    want = pd.DataFrame({
        "node": ks, "has_even": he, "has_odd": ho,
        "odd_witness": [a & b for a, b in zip(he, ho)]})
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    # sf0.001's orders graph is near-forest density: node 1's 6-hop
    # ball is genuinely bipartite there (every node single-parity).
    # The denser sf0.01 graph has odd cycles — the witness bit fires.
    assert want.odd_witness.sum() == 0
    assert (want.has_even == 1).any() and (want.has_odd == 1).any()
    out01 = bipartite_check_graph("/root/testdata/sf0.01").to_pandas()
    assert out01.odd_witness.sum() > 0

    dist_form = bipartite_check_graph(SF, driver_max=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        dist_form.astype("int64"), want.astype("int64"))


def test_prefix_filter_jaccard_complete(ray_session):
    """The prefix-filtered join returns EXACTLY the all-pairs truth
    (completeness is the PPJoin theorem; soundness is the exact
    verify), and both the driver fold and the fully distributed form
    agree."""
    from rendler_ray.functions.text import ngram_set
    from rendler_ray.pipelines.queries import prefix_filter_jaccard_pairs

    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    gsets = {int(r.doc_id): ngram_set(r.text, 3)
             for r in docs.itertuples(index=False)}
    ids = sorted(gsets)
    want = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            ga, gb = gsets[ids[i]], gsets[ids[j]]
            inter = len(ga & gb)
            uni = len(ga) + len(gb) - inter
            if 2 * inter >= uni:
                want.append((ids[i], ids[j], inter, uni))
    out = prefix_filter_jaccard_pairs(SF).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    got = list(out.itertuples(index=False, name=None))
    assert got == want and len(want) > 0

    dist = prefix_filter_jaccard_pairs(SF, gram_driver_max=0,
                                       driver_max=0).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    got_d = [(int(a), int(b), int(i), int(u))
             for a, b, i, u in dist.itertuples(index=False, name=None)]
    assert got_d == want


def test_bq_topk_recall(ray_session):
    """Binary-quantized ANN: emitted scores are TRUE cosines (subset
    of brute-force scores) and recall@10 vs brute force clears the
    sign-code floor on the uniform corpus; known-signature unit check
    on the encoder."""
    import pyarrow as pa  # noqa: F401

    from rendler_ray.functions.ann import bq_encode
    from rendler_ray.pipelines.queries import ann_bq_topk

    m = np.array([[1.0, -2.0, 0.5, -0.1], [-1.0, 3.0, -0.5, 0.2]])
    codes = bq_encode(m)
    assert codes.shape == (2, 1)
    assert int(codes[0, 0]) >> 62 == 0b10
    assert int(codes[1, 0]) >> 62 == 0b01

    out = ann_bq_topk(SF).to_pandas()
    emb = pq.read_table(os.path.join(SF, "embeddings.parquet")) \
        .to_pandas()
    vecs = np.stack(emb.embedding.to_numpy())
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    ids = emb.vec_id.to_numpy(np.int64)
    hits = tot = 0
    for qid in range(8):
        qv = vecs[ids == qid][0]
        sims = vecs @ qv
        se6 = np.round(sims * 1e6).astype(np.int64)
        order = np.lexsort((ids, -se6))[:10]
        want = set(ids[order])
        got = set(out[out.query_id == qid].vec_id)
        assert len(got) == 10
        # every emitted score is the true cosine of that pair (±1 ulp
        # of e6 rounding — matmul summation order differs per batch)
        for r in out[out.query_id == qid].itertuples(index=False):
            truth = se6[ids == r.vec_id][0]
            assert abs(r.score_e6 - truth) <= 1
        hits += len(got & want)
        tot += 10
    assert hits / tot >= 0.5  # sign codes on uniform vectors: floor


def test_negative_sample_brute(ray_session):
    """Negatives reproduce the md5-step rule exactly, never equal the
    anchor, and cover a spread of the corpus."""
    import hashlib

    from rendler_ray.pipelines.queries import negative_sample_pairs

    out = negative_sample_pairs(SF).to_pandas() \
        .sort_values(["anchor_id", "j"]).reset_index(drop=True)
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id"]).to_pandas()
    ids = np.sort(docs.doc_id.to_numpy(np.int64))
    n = len(ids)
    pos = {int(d): i for i, d in enumerate(ids)}
    rows = []
    for d in ids.tolist():
        for j in range(1, 5):
            h = int(hashlib.md5(f"{d}:{j}".encode()).hexdigest()[:15],
                    16)
            rows.append((d, j, int(ids[(pos[d] + 1 + h % (n - 1)) % n])))
    want = pd.DataFrame(rows, columns=["anchor_id", "j", "neg_id"])
    pd.testing.assert_frame_equal(out.astype("int64"),
                                  want.astype("int64"))
    assert (out.anchor_id != out.neg_id).all()
    assert out.neg_id.nunique() > n // 2


def test_sssp_brute_and_two_form(ray_session):
    """Hop-bounded weighted distances match an independent
    Bellman–Ford DP, weights actually vary (not plain BFS), and the
    forced distributed round form agrees exactly."""
    from rendler_ray.pipelines.queries import sssp_bounded_graph

    out = sssp_bounded_graph(SF).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    adj: dict = {}
    for a, b in _edges_001().itertuples(index=False):
        a, b = int(a), int(b)
        w = 1 + (7 * a + 13 * b) % 9
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    INF = 1 << 60
    d = {1: 0}
    best = {1: 0}
    for _ in range(6):
        nd: dict = {}
        for u, du in d.items():
            for v, w in adj.get(u, ()):
                c = du + w
                if c < nd.get(v, INF):
                    nd[v] = c
        d = nd
        for v, dv in nd.items():
            if dv < best.get(v, INF):
                best[v] = dv
    want = pd.DataFrame({"node": sorted(best),
                         "dist": [best[k] for k in sorted(best)]})
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    # weighted: more distinct distances than the 6 hop counts a plain
    # BFS could produce
    assert want[want.node != 1].dist.nunique() > 6

    dist_form = sssp_bounded_graph(SF, driver_max=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        dist_form.astype("int64"), want.astype("int64"))


def test_theil_sen_brute(ray_session):
    """The e12-quantized slope median matches an independent
    recomputation, negative slopes are present (the floor-division
    CASE in the SQL is exercised), and the quantized median brackets
    the exact Fraction median."""
    from fractions import Fraction

    from rendler_ray.pipelines.queries import theil_sen_daily_trend

    out = theil_sen_daily_trend(SF).to_pandas()
    ev = _events()
    d = ev.ts.to_numpy("datetime64[us]").astype(np.int64) \
        // 86_400_000_000
    u, c = np.unique(d, return_counts=True)
    keys, fracs = [], []
    for i in range(len(u)):
        for j in range(i + 1, len(u)):
            dy = int(c[j]) - int(c[i])
            dx = int(u[j]) - int(u[i])
            keys.append((dy * 10**12) // dx)
            fracs.append(Fraction(dy, dx))
    keys.sort()
    fracs.sort()
    m = len(keys)
    assert out.n_days[0] == len(u) and out.n_pairs[0] == m
    assert out.med_slope_e12_x2[0] == keys[(m - 1) // 2] + keys[m // 2]
    assert any(k < 0 for k in keys)  # negative slopes exercised
    fmed2 = fracs[(m - 1) // 2] + fracs[m // 2]
    assert abs(Fraction(int(out.med_slope_e12_x2[0]), 10**12) - fmed2) \
        <= Fraction(2, 10**12)


def test_trending_brute(ray_session):
    """Per-day top-3 with previous-day ranks matches a pandas window
    brute force; rank deltas are nonzero somewhere."""
    from rendler_ray.pipelines.queries import trending_types_daily

    out = trending_types_daily(SF).to_pandas() \
        .sort_values(["day", "rank"]).reset_index(drop=True)
    ev = _events()
    d = ev.ts.to_numpy("datetime64[us]").astype(np.int64) \
        // 86_400_000_000
    g = ev.assign(day=d).groupby(["day", "event_type"]) \
        .size().reset_index(name="n")
    g = g.sort_values(["day", "n", "event_type"],
                      ascending=[True, False, True], kind="stable")
    g["rank"] = g.groupby("day").cumcount() + 1
    prev = g[["day", "event_type", "rank"]].copy()
    prev["day"] += 1
    prev = prev.rename(columns={"rank": "prev_rank"})
    w = g.merge(prev, on=["day", "event_type"], how="left")
    w["prev_rank"] = w["prev_rank"].fillna(0).astype(np.int64)
    w = w[w["rank"] <= 3]
    w["rank_delta"] = np.where(w.prev_rank == 0, 0,
                               w.prev_rank - w["rank"])
    w = w.sort_values(["day", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out, w[["day", "event_type", "n", "rank", "prev_rank",
                "rank_delta"]].astype(
            {"day": np.int64, "n": np.int64, "rank": np.int64,
             "prev_rank": np.int64, "rank_delta": np.int64}),
        check_dtype=False)
    assert (w.rank_delta != 0).any()


def test_kendall_brute(ray_session):
    """Fenwick-folded pair counts match an O(n²) enumeration over the
    docs, all five buckets partition C(n,2), and ties exist (tau-b's
    correction terms are live)."""
    from rendler_ray.pipelines.queries import _clf_weights, \
        kendall_tau_docs

    out = kendall_tau_docs(SF).to_pandas()
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    xs, ys = [], []
    for txt in docs.text:
        toks = txt.split(" ")
        u, inv = np.unique(np.array(toks, object), return_inverse=True)
        w = _clf_weights(u)[inv]
        xs.append(len(toks))
        ys.append(int(np.rint(w.sum())))
    x = np.array(xs, np.int64)
    y = np.array(ys, np.int64)
    n = len(x)
    nc = nd = tx = ty = txy = 0
    for i in range(n):
        dx = x[i + 1:] - x[i]
        dy = y[i + 1:] - y[i]
        nc += int(((dx > 0) & (dy > 0)).sum()
                  + ((dx < 0) & (dy < 0)).sum())
        nd += int(((dx > 0) & (dy < 0)).sum()
                  + ((dx < 0) & (dy > 0)).sum())
        tx += int(((dx == 0) & (dy != 0)).sum())
        ty += int(((dx != 0) & (dy == 0)).sum())
        txy += int(((dx == 0) & (dy == 0)).sum())
    assert out.n_docs[0] == n
    assert (out.concordant[0], out.discordant[0], out.tied_x[0],
            out.tied_y[0], out.tied_xy[0]) == (nc, nd, tx, ty, txy)
    assert nc + nd + tx + ty + txy == n * (n - 1) // 2
    assert tx > 0 and ty >= 0


def test_hourly_percentiles_brute(ray_session):
    """Exact per-hour order statistics match numpy, p50 ≤ p90 ≤ p99."""
    from rendler_ray.pipelines.queries import hourly_value_percentiles

    out = hourly_value_percentiles(SF).to_pandas() \
        .sort_values("hour").reset_index(drop=True)
    ev = _events()
    us = ev.ts.to_numpy("datetime64[us]").astype(np.int64)
    hour = (us // 3_600_000_000) % 24
    cents = np.rint(ev.value.to_numpy(np.float64) * 100).astype(np.int64)
    rows = []
    for h in sorted(set(hour.tolist())):
        v = np.sort(cents[hour == h])
        n = len(v)
        rows.append((h, int(v[(n - 1) * 50 // 100]),
                     int(v[(n - 1) * 90 // 100]),
                     int(v[(n - 1) * 99 // 100])))
    want = pd.DataFrame(rows, columns=["hour", "p50", "p90", "p99"])
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    assert (want.p50 <= want.p90).all() and (want.p90 <= want.p99).all()


def test_maximal_matching(ray_session):
    """Driver greedy: valid matching (no shared endpoint), MAXIMAL
    (every live edge touches a matched vertex), equals the sequential
    key-order greedy; forced distributed local-minima rounds agree
    exactly."""
    from rendler_ray.pipelines.queries import (_matching_key,
                                               maximal_matching_graph)

    out = maximal_matching_graph(SF).to_pandas()
    e = _edges_001()
    a = e.a.to_numpy(np.int64)
    b = e.b.to_numpy(np.int64)
    k = _matching_key(a, b)
    order = np.lexsort((b, a, k))
    matched: set = set()
    want = []
    for i in order:
        u, v = int(a[i]), int(b[i])
        if u not in matched and v not in matched:
            matched.update((u, v))
            want.append((u, v))
    want.sort()
    assert list(out.itertuples(index=False, name=None)) == want
    # matching: endpoints unique
    eps = [x for p in want for x in p]
    assert len(eps) == len(set(eps))
    # maximal: every edge touches a matched vertex
    ms = set(eps)
    assert all(int(u) in ms or int(v) in ms
               for u, v in zip(a.tolist(), b.tolist()))

    dist_form = maximal_matching_graph(SF, driver_max=0).to_pandas()
    assert list(dist_form.itertuples(index=False, name=None)) == want


def test_consistent_hash_brute(ray_session):
    """Assignments match a searchsorted brute force; scale-out moves
    a nonzero minority of keys (the ring's defining property)."""
    import hashlib

    from rendler_ray.pipelines.queries import consistent_hash_assignment

    out = consistent_hash_assignment(SF).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    def ring(s):
        pos, sh = [], []
        for j in range(s):
            for i in range(16):
                pos.append(int(hashlib.md5(
                    f"s{j}:vn{i}".encode()).hexdigest()[:15], 16))
                sh.append(j)
        o = np.argsort(np.array(pos, np.int64), kind="stable")
        return np.array(pos, np.int64)[o], np.array(sh, np.int64)[o]

    pa_pos, pa_sh = ring(8)
    pb_pos, pb_sh = ring(9)
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id"]).to_pandas()
    ids = np.sort(docs.doc_id.to_numpy(np.int64))
    h = np.array([int(hashlib.md5(str(int(d)).encode())
                      .hexdigest()[:15], 16) for d in ids], np.int64)
    sa = pa_sh[np.searchsorted(pa_pos, h, side="left") % len(pa_pos)]
    sb = pb_sh[np.searchsorted(pb_pos, h, side="left") % len(pb_pos)]
    want = pd.DataFrame({"doc_id": ids, "shard": sa, "shard_plus": sb,
                         "moved": (sa != sb).astype(np.int64)})
    pd.testing.assert_frame_equal(out.astype("int64"),
                                  want.astype("int64"))
    frac = want.moved.mean()
    assert 0.0 < frac < 0.35  # ≈ 1/(S+1), never a full re-mod
    assert want.shard.nunique() == 8 and want.shard_plus.nunique() == 9


def test_wau_brute(ray_session):
    """Rolling 7-day distinct user counts match a per-day set brute
    force, and WAU ≥ DAU everywhere (with strict > somewhere)."""
    from rendler_ray.pipelines.queries import weekly_active_users

    out = weekly_active_users(SF).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    ev = _events()
    day = ev.ts.to_numpy("datetime64[us]").astype(np.int64) \
        // 86_400_000_000
    df = pd.DataFrame({"u": ev.user_id.to_numpy(np.int64), "d": day})
    days = sorted(set(day.tolist()))
    rows = []
    for d in days:
        w = df[(df.d >= d - 6) & (df.d <= d)]
        rows.append((d, w.u.nunique()))
    want = pd.DataFrame(rows, columns=["day", "wau"])
    pd.testing.assert_frame_equal(out.astype("int64"),
                                  want.astype("int64"))
    dau = df.groupby("d").u.nunique()
    assert (want.set_index("day").wau >= dau).all()
    assert (want.set_index("day").wau > dau).any()


def test_maxsim_brute(ray_session):
    """Late-interaction scores match a driver recompute with the same
    chunker + embedder stub, and maxsim differs from single-vector
    scoring (the multi-vector structure is live)."""
    from rendler_ray.pipelines.queries import maxsim_multivector_topk
    from rendler_ray.stages.embed import TextEmbedder
    import pyarrow as pa

    out = maxsim_multivector_topk(SF).to_pandas()
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id")
    emb = TextEmbedder()

    def chunks(txt, cap):
        toks = txt.split(" ")
        return [" ".join(toks[s: s + 32])
                for s in range(0, min(len(toks), cap * 32), 32)]

    def mat(txts):
        et = emb(pa.table({"text": pa.array(txts, pa.string())}))
        return np.stack([np.asarray(v, np.float64)
                         for v in et["embedding"].to_pylist()])

    qm = {int(r.doc_id): mat(chunks(r.text, 4))
          for r in docs[docs.doc_id < 4].itertuples(index=False)}
    corpus = docs[docs.doc_id >= 4]
    multi_beats_single = False
    for qid, q in qm.items():
        scores = {}
        for r in corpus.itertuples(index=False):
            cm = mat(chunks(r.text, 8))
            sims = q @ cm.T
            scores[int(r.doc_id)] = float(sims.max(axis=1).sum())
        se6 = {d: int(np.rint(s * 1e6)) for d, s in scores.items()}
        order = sorted(se6, key=lambda d: (-se6[d], d))[:10]
        sub = out[out.query_id == qid].sort_values("rank")
        assert sub.vec_id.tolist() == order
        for r in sub.itertuples(index=False):
            assert abs(r.score_e6 - se6[r.vec_id]) <= 1
        if len(q) > 1:
            multi_beats_single = True
    assert multi_beats_single  # at least one query is multi-vector


def test_boolean_search_brute(ray_session):
    """AND/OR/AND-NOT doc sets match python set algebra for every
    query, and all three modes are distinct somewhere."""
    from rendler_ray.pipelines.queries import (_BM25_QUERIES,
                                               boolean_search_docs)

    out = boolean_search_docs(SF).to_pandas()
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    tsets = {int(r.doc_id): set(r.text.split(" "))
             for r in docs.itertuples(index=False)}
    saw_diff = False
    for qid, (t1, t2) in _BM25_QUERIES.items():
        s1 = {d for d, s in tsets.items() if t1 in s}
        s2 = {d for d, s in tsets.items() if t2 in s}
        want = {"and": s1 & s2, "or": s1 | s2, "not": s1 - s2}
        for mode, w in want.items():
            got = set(out[(out.query_id == qid)
                          & (out["mode"] == mode)].doc_id)
            assert got == w, (qid, mode)
        if want["and"] != want["or"] != want["not"]:
            saw_diff = True
    assert saw_diff


def test_postings_compression_brute(ray_session):
    """Varint byte sums match a per-token LEB128 recompute; gap coding
    actually compresses (ratio > 1 for every high-df token)."""
    from rendler_ray.pipelines.queries import postings_compression_stats

    out = postings_compression_stats(SF).to_pandas() \
        .sort_values("token").reset_index(drop=True)
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    from collections import Counter, defaultdict
    freq: Counter = Counter()
    posting = defaultdict(set)
    for r in docs.itertuples(index=False):
        toks = r.text.split(" ")
        freq.update(toks)
        for t in set(toks):
            posting[t].add(int(r.doc_id))
    top = sorted(freq, key=lambda t: (-freq[t], t))[:100]

    def leb(n):
        assert n >= 1
        b = 0
        while n > 0:
            b += 1
            n >>= 7
        return b

    rows = []
    for t in sorted(top):
        ids = sorted(posting[t])
        gaps = [ids[0] + 1] + [b - a for a, b in zip(ids, ids[1:])]
        var = sum(leb(g) for g in gaps)
        rows.append((t, len(ids), 8 * len(ids), var,
                     8 * len(ids) * 10**6 // var))
    want = pd.DataFrame(rows, columns=[
        "token", "df", "raw_bytes", "varint_bytes", "ratio_e6"])
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    assert (want.ratio_e6 > 10**6).all()


def test_cohort_retention_brute(ray_session):
    """Cohort cells match a pandas brute force; offsets span multiple
    weeks; week-0 cell is the cohort size (everyone is active in
    their own first week)."""
    from rendler_ray.pipelines.queries import cohort_retention_weeks

    out = cohort_retention_weeks(SF).to_pandas() \
        .sort_values(["cohort_day", "week_offset"]).reset_index(drop=True)
    ev = _events()
    day = ev.ts.to_numpy("datetime64[us]").astype(np.int64) \
        // 86_400_000_000
    p = pd.DataFrame({"u": ev.user_id.to_numpy(np.int64),
                      "d": day}).drop_duplicates()
    d0 = p.groupby("u").d.min()
    p = p.assign(c=p.u.map(d0), w=(p.d - p.u.map(d0)) // 7)
    want = p[["c", "w", "u"]].drop_duplicates() \
        .groupby(["c", "w"]).size().reset_index(name="n_users") \
        .rename(columns={"c": "cohort_day", "w": "week_offset"}) \
        .sort_values(["cohort_day", "week_offset"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out.astype("int64"),
                                  want.astype("int64"))
    assert out.week_offset.nunique() >= 2
    wk0 = out[out.week_offset == 0].set_index("cohort_day").n_users
    sizes = d0.reset_index().groupby("d").u.nunique()
    assert (wk0 == sizes.reindex(wk0.index)).all()
