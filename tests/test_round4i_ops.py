"""Round-4i op families: snapshot table diff (CDC classify),
referential-integrity audit, clustering coefficient, degree
assortativity, count-min sketch, calibration curve, per-source
exact-k sampling, RFM segmentation, BFS distances."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _docs() -> pd.DataFrame:
    return pq.read_table(os.path.join(SF, "documents.parquet")).to_pandas()


def test_table_diff_brute(ray_session):
    """Status counts + key checksums match a pure-pandas diff of the
    same derived snapshot."""
    from rendler_ray.pipelines.queries import table_diff_docs

    out = table_diff_docs(SF).to_pandas() \
        .sort_values("status").reset_index(drop=True)

    a = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "lang", "n_chars"]).to_pandas()
    b = a.copy()
    b.loc[b.doc_id % 13 == 0, "n_chars"] += 7
    b = b[b.doc_id % 17 != 0]
    app = a[a.doc_id % 19 == 0].copy()
    app["doc_id"] += 1_000_000_000
    b = pd.concat([b, app])
    j = a.merge(b, on="doc_id", how="outer", suffixes=("_a", "_b"),
                indicator=True)
    status = pd.Series("changed", index=j.index)
    status[j._merge == "right_only"] = "added"
    status[j._merge == "left_only"] = "removed"
    same = (j.lang_a == j.lang_b) & (j.n_chars_a == j.n_chars_b)
    status[(j._merge == "both") & same] = "unchanged"
    want = pd.DataFrame({"status": status, "k": j.doc_id}) \
        .groupby("status", as_index=False) \
        .agg(n=("k", "size"), key_sum=("k", "sum")) \
        .sort_values("status").reset_index(drop=True)
    want["key_sum"] = want["key_sum"].astype("int64")
    # every class must actually occur, else the test proves nothing
    assert set(want.status) == {"added", "removed", "changed", "unchanged"}
    pd.testing.assert_frame_equal(out[["status", "n", "key_sum"]],
                                  want[["status", "n", "key_sum"]])


def test_fk_audit_brute(ray_session):
    """Orphan counts match a pandas anti-join on the corrupted
    parent snapshots, and orphans actually exist."""
    from rendler_ray.pipelines.queries import fk_integrity_audit

    out = fk_integrity_audit(SF).to_pandas() \
        .set_index("relation").sort_index()

    li = pq.read_table(os.path.join(SF, "lineitem.parquet"),
                       columns=["l_orderkey"]).to_pandas()
    od = pq.read_table(os.path.join(SF, "orders.parquet"),
                       columns=["o_orderkey", "o_custkey"]).to_pandas()
    cu = pq.read_table(os.path.join(SF, "customer.parquet"),
                       columns=["c_custkey"]).to_pandas()
    ok = set(od.o_orderkey[od.o_orderkey % 1000 >= 5])
    ck = set(cu.c_custkey[cu.c_custkey % 100 >= 3])
    lo = int((~li.l_orderkey.isin(ok)).sum())
    co = int((~od.o_custkey.isin(ck)).sum())
    assert out.loc["lineitem->orders", "n_child"] == len(li)
    assert out.loc["lineitem->orders", "n_orphan"] == lo
    assert out.loc["orders->customer", "n_child"] == len(od)
    assert out.loc["orders->customer", "n_orphan"] == co
    assert lo > 0 and co > 0


def _orders_edges(sf: str = SF) -> set[tuple[int, int]]:
    od = pq.read_table(os.path.join(sf, "orders.parquet"),
                       columns=["o_custkey", "o_orderkey"]).to_pandas()
    u = od.o_custkey.to_numpy()
    v = od.o_orderkey.to_numpy() % 1500 + 1
    return {(min(a, b), max(a, b)) for a, b in zip(u, v) if a != b}


def test_clustering_coefficient_brute(ray_session):
    """Per-node cc matches an adjacency-set brute force (at sf0.01 —
    the sf0.001 graph has zero triangles, which would leave the
    triangle path unexercised)."""
    from rendler_ray.pipelines.queries import clustering_coefficient_nodes

    sf = "/root/testdata/sf0.01"
    out = clustering_coefficient_nodes(sf).to_pandas() \
        .set_index("node").sort_index()

    edges = _orders_edges(sf)
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = {}
    for v, ns in adj.items():
        d = len(ns)
        if d < 2:
            continue
        ns_l = sorted(ns)
        tri = sum(1 for i, x in enumerate(ns_l) for y in ns_l[i + 1:]
                  if y in adj[x])
        rows[v] = (d, tri, (2_000_000 * tri) // (d * (d - 1)))
    assert set(out.index) == set(rows)
    for v, (d, tri, cc) in rows.items():
        r = out.loc[v]
        assert (r.deg, r.n_tri, r.cc_e6) == (d, tri, cc)
    # the metric must be non-degenerate on this graph
    assert out.n_tri.sum() > 0 and (out.n_tri == 0).any()


def test_degree_assortativity_brute_and_two_forms(ray_session):
    """Exact integer moments + r vs a pure-python brute force; the
    broadcast and forced-join forms agree bit-exactly."""
    from rendler_ray.pipelines.queries import degree_assortativity

    a = degree_assortativity(SF).to_pandas().iloc[0]
    b = degree_assortativity(SF, driver_max=0).to_pandas().iloc[0]
    assert tuple(a) == tuple(b)

    edges = _orders_edges()
    deg: dict[int, int] = {}
    for x, y in edges:
        deg[x] = deg.get(x, 0) + 1
        deg[y] = deg.get(y, 0) + 1
    m = 2 * len(edges)
    sx = sum(deg[x] + deg[y] for x, y in edges)
    sxy = sum(2 * deg[x] * deg[y] for x, y in edges)
    sx2 = sum(deg[x] ** 2 + deg[y] ** 2 for x, y in edges)
    num, den = m * sxy - sx * sx, m * sx2 - sx * sx
    r = (1 if num >= 0 else -1) * (abs(1_000_000 * num) // den)
    assert (a.m, a.sx, a.sxy, a.sx2, a.r_e6) == (m, sx, sxy, sx2, r)
    assert -1_000_000 <= r <= 1_000_000


def test_cms_overestimate_property(ray_session):
    """CMS point estimates are one-sided: est ≥ exact for every
    queried user, and at 15 users vs 256 buckets most are exact."""
    from rendler_ray.pipelines.queries import cms_user_counts

    out = cms_user_counts(SF).to_pandas().set_index("user_id")
    ev = pq.read_table(os.path.join(SF, "events.parquet"),
                       columns=["user_id"]).to_pandas()
    exact = ev.user_id.value_counts()
    for u in range(50):
        e = int(exact.get(u, 0))
        assert out.loc[u, "est"] >= e
    eq = sum(int(out.loc[u, "est"]) == int(exact.get(u, 0))
             for u in range(50))
    assert eq >= 45  # collisions are possible but must be rare


def test_calibration_curve_brute(ray_session):
    """Decile stats match a pandas recompute, deciles partition the
    corpus, and the curve is non-degenerate."""
    from rendler_ray.pipelines.queries import (
        _clf_weights, calibration_curve_docs)

    out = calibration_curve_docs(SF).to_pandas() \
        .set_index("decile").sort_index()

    docs = _docs()
    scores = []
    for text in docs["text"]:
        toks = np.array(text.split(" "), dtype=object)
        scores.append(int(np.rint(_clf_weights(toks).sum())))
    df = pd.DataFrame({"doc_id": docs.doc_id, "s": scores,
                       "pos": (docs.lang == "en").astype(int)})
    df = df.sort_values(["s", "doc_id"]).reset_index(drop=True)
    n = len(df)
    df["decile"] = df.index * 10 // n
    want = df.groupby("decile").agg(
        n=("s", "size"), n_pos=("pos", "sum"), sum_score=("s", "sum"))
    assert list(out.index) == list(range(10))
    assert out.n.sum() == n
    for d in range(10):
        w = want.loc[d]
        assert (out.loc[d, "n"], out.loc[d, "n_pos"],
                out.loc[d, "sum_score"]) == (w.n, w.n_pos, w.sum_score)
        assert out.loc[d, "frac_pos_e6"] == 10 ** 6 * w.n_pos // w.n
    assert out.frac_pos_e6.nunique() > 1


def test_sample_per_source_k_brute(ray_session):
    """Per-source exact-k sample matches the md5-rank brute force and
    draws exactly min(k, |source|) docs per source."""
    import hashlib

    from rendler_ray.pipelines.queries import sample_docs_per_source_k

    out = sample_docs_per_source_k(SF).to_pandas()
    docs = _docs()[["doc_id", "source"]].copy()
    docs["rk"] = [hashlib.md5(f"{i}-pss".encode()).hexdigest()
                  for i in docs.doc_id]
    want = docs.sort_values(["rk", "doc_id"]).groupby("source").head(5)
    for src, g in out.groupby("source"):
        w = want[want.source == src]
        assert set(g.doc_id) == set(w.doc_id)
        assert sorted(g.smp_rank) == list(range(1, len(w) + 1))
    assert set(out.source) == set(docs.source)


def test_rfm_segments_brute(ray_session):
    """Segment cells match a pandas recompute of the tercile codes."""
    from rendler_ray.pipelines.queries import rfm_user_segments

    out = rfm_user_segments(SF).to_pandas() \
        .set_index(["r_code", "f_code", "m_code"]).sort_index()

    ev = pq.read_table(os.path.join(SF, "events.parquet"),
                       columns=["user_id", "ts", "value"]).to_pandas()
    ev["us"] = ev.ts.to_numpy().astype("datetime64[us]").astype(np.int64)
    ev["cents"] = np.round(ev.value * 100).astype(np.int64)
    ua = ev.groupby("user_id").agg(
        recency=("us", "max"), freq=("us", "size"),
        cents=("cents", "sum")).reset_index()
    n = len(ua)

    def code(col):
        r = ua.sort_values([col, "user_id"]).reset_index()
        c = pd.Series(np.arange(n) * 3 // n, index=r["index"])
        return c.sort_index().to_numpy()

    ua["r_code"], ua["f_code"], ua["m_code"] = \
        code("recency"), code("freq"), code("cents")
    want = ua.groupby(["r_code", "f_code", "m_code"]).agg(
        n_users=("cents", "size"), sum_cents=("cents", "sum"))
    assert out.n_users.sum() == n
    pd.testing.assert_frame_equal(out, want[out.columns],
                                  check_dtype=False)


def test_bfs_two_forms_and_brute(ray_session):
    """Driver and forced-distributed BFS agree with each other and
    with a pure-python BFS, and the graph has depth > 1 from seed."""
    from rendler_ray.goldenhash import to_pandas
    from rendler_ray.pipelines.queries import bfs_distances_graph

    a = to_pandas(bfs_distances_graph(SF)).sort_values("node") \
        .reset_index(drop=True)
    b = to_pandas(bfs_distances_graph(SF, driver_max=0)) \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])

    edges = _orders_edges()
    adj: dict[int, set[int]] = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    dist = {1: 0}
    frontier = [1]
    for d in range(1, 7):
        nxt = sorted({v for u in frontier for v in adj.get(u, ())
                      if v not in dist})
        for v in nxt:
            dist[v] = d
        frontier = nxt
    got = dict(zip(a.node, a.dist))
    assert got == dist
    assert max(dist.values()) >= 2


def test_media_phash_dedup_brute(ray_session):
    """Banded pHash pairs equal an all-pairs Hamming ≤ 3 brute force
    over the same blobs+variants, and the variant pairs are found."""
    import ray.data as rd

    from rendler_ray.functions import media as M
    from rendler_ray.functions.canon import stable_hash64
    from rendler_ray.functions.media import phash64_batch
    from rendler_ray.pipelines.queries import (
        _synth_docs_for, media_phash_dedup)

    out = media_phash_dedup(SF).to_pandas()
    got = {(a, b): h for a, b, h in
           zip(out.ref_a, out.ref_b, out.hamming)}

    docs = rd.read_parquet(_synth_docs_for(SF))
    med = M.media_pipeline(docs)
    rows = med.select_columns(["media_ref", "blob"]).take_all()
    refs = [r["media_ref"] for r in rows]
    blobs = [r["blob"] for r in rows]
    for i in np.nonzero(stable_hash64(refs) % np.uint64(5) == 0)[0]:
        v = bytearray(blobs[int(i)])
        v[17] = (v[17] + 2) % 256
        refs.append(refs[int(i)] + "#v")
        blobs.append(bytes(v))
    h = phash64_batch(blobs)
    want = {}
    for i in range(len(h)):
        for j in range(i + 1, len(h)):
            d = bin(int(h[i]) ^ int(h[j])).count("1")
            if d <= 3:
                a, b = sorted((refs[i], refs[j]))
                want[(a, b)] = min(d, want.get((a, b), 64))
    assert got == want
    # the injected variants must actually be detected
    assert any(b.endswith("#v") for _, b in got)


def test_skyline_docs_brute(ray_session):
    """Skyline equals the O(n²) dominance brute force, including
    coincident-duplicate handling."""
    from rendler_ray.pipelines.queries import _clf_weights, skyline_docs

    out = skyline_docs(SF).to_pandas()
    docs = _docs()
    pts = []
    for did, text, nch in zip(docs.doc_id, docs.text, docs.n_chars):
        toks = np.array(text.split(" "), dtype=object)
        s = int(np.rint(_clf_weights(toks).sum()))
        pts.append((did, s, nch))
    want = set()
    for i, (di, si, ci) in enumerate(pts):
        dominated = any(
            (sj >= si and cj >= ci and (sj > si or cj > ci))
            for j, (dj, sj, cj) in enumerate(pts) if j != i)
        if not dominated:
            want.add((di, si, ci))
    assert set(zip(out.doc_id, out.clf_score, out.n_chars)) == want
    assert 1 < len(want) < len(pts)


def test_personalized_pagerank_brute(ray_session):
    """PPR over the crawl graph matches a pure-python power iteration
    (≤1 ulp at the 1e-9 grain) and conserves probability mass."""
    from rendler_ray.pipelines.queries import (
        _synth_docs_for, personalized_pagerank_crawl)
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    out = personalized_pagerank_crawl(SF).to_pandas()
    assert abs(out.rank_e9.sum() - 10 ** 9) < 1000

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(SF),
                            seeds=default_seeds(1), max_depth=4))
    edges = {(r["src"], r["dst"]) for r in res.edges.take_all()}
    nodes = sorted({u for e in edges for u in e})
    seed = default_seeds(1)[0]
    adj: dict[str, list[str]] = {}
    for s, d in sorted(edges):
        adj.setdefault(s, []).append(d)
    p = {seed: 1.0}
    ranks = dict(p)
    damping = 0.85
    for _ in range(10):
        inflow: dict[str, float] = {}
        for s, ds_ in adj.items():
            w = ranks.get(s, 0.0) / len(ds_)
            for d in ds_:
                inflow[d] = inflow.get(d, 0.0) + w
        dangling = sum(ranks.get(u, 0.0) for u in nodes
                       if u not in adj)
        tele = (1.0 - damping) + damping * dangling
        ranks = {u: tele * p.get(u, 0.0) + damping * inflow.get(u, 0.0)
                 for u in nodes}
    got = dict(zip(out.url, out.rank_e9))
    assert set(got) == set(nodes)
    for u in nodes:
        assert abs(got[u] - round(ranks[u] * 1e9)) <= 1
    # the seed's teleport share must show up
    assert got[seed] > 0


def test_ohlc_hourly_brute(ray_session):
    """OHLC bars match a pandas first/last/min/max recompute."""
    from rendler_ray.pipelines.queries import ohlc_hourly_values

    out = ohlc_hourly_values(SF).to_pandas() \
        .set_index("hour").sort_index()
    ev = pq.read_table(os.path.join(SF, "events.parquet"),
                       columns=["event_id", "ts", "value"]).to_pandas()
    ev["us"] = ev.ts.to_numpy().astype("datetime64[us]").astype(np.int64)
    ev["cents"] = np.round(ev.value * 100).astype(np.int64)
    ev["hour"] = ev.us // 3_600_000_000
    ev = ev.sort_values(["us", "event_id"])
    want = ev.groupby("hour").agg(
        open_c=("cents", "first"), high_c=("cents", "max"),
        low_c=("cents", "min"), close_c=("cents", "last"),
        n=("cents", "size"))
    pd.testing.assert_frame_equal(out, want[out.columns],
                                  check_dtype=False)
    assert (out.high_c >= out.low_c).all()


def test_half_life_decay_brute(ray_session):
    """Decay scores match the integer-shift brute force and actually
    span several halving buckets."""
    from rendler_ray.pipelines.queries import half_life_decay_users

    out = half_life_decay_users(SF).to_pandas().set_index("user_id")
    ev = pq.read_table(os.path.join(SF, "events.parquet"),
                       columns=["user_id", "ts"]).to_pandas()
    us = ev.ts.to_numpy().astype("datetime64[us]").astype(np.int64)
    t = us.max()
    shift = np.minimum((t - us) // 86_400_000_000, 20)
    wt = (1_000_000 >> shift).astype(np.int64)
    want = pd.DataFrame({"user_id": ev.user_id, "wt": wt}) \
        .groupby("user_id").agg(decay_score=("wt", "sum"),
                                n=("wt", "size"))
    pd.testing.assert_frame_equal(out, want[out.columns],
                                  check_dtype=False)
    assert len(np.unique(shift)) >= 3  # decay actually varies


def test_ks_drift_brute(ray_session):
    """Per-source exact KS distance matches a scipy-free brute force
    (all |ΔCDF| evaluated at every data point)."""
    from rendler_ray.pipelines.queries import (
        _clf_weights, ks_drift_by_source)

    out = ks_drift_by_source(SF).to_pandas().set_index("source")

    docs = _docs()
    scores = []
    for text in docs["text"]:
        toks = np.array(text.split(" "), dtype=object)
        scores.append(int(np.rint(_clf_weights(toks).sum())))
    df = pd.DataFrame({"source": docs.source, "s": scores})
    pts = np.unique(df.s)
    n = len(df)
    cum_all = np.array([(df.s <= x).sum() for x in pts], np.int64)
    for src, g in df.groupby("source"):
        ns = len(g)
        cum_s = np.array([(g.s <= x).sum() for x in pts], np.int64)
        d = int(np.abs(cum_s * n - cum_all * ns).max())
        assert out.loc[src, "n_s"] == ns
        assert out.loc[src, "d_e6"] == 10 ** 6 * d // (ns * n)
    assert out.d_e6.max() > 0  # sources genuinely differ


def test_orc_roundtrip_bitexact(ray_session):
    """ORC sink→source roundtrip reproduces the parquet source rows
    bit-exactly, and the shard files are real ORC."""
    import glob

    import pyarrow.orc as paorc

    from rendler_ray.pipelines.queries import (
        _ckpt_root, docs_orc_export_roundtrip)

    out = docs_orc_export_roundtrip(SF).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = pq.read_table(
        os.path.join(SF, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source", "n_chars"]) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out[want.columns], want)
    shards = glob.glob(f"{_ckpt_root()}/orc_export/*.orc")
    assert shards and not glob.glob(f"{_ckpt_root()}/orc_export/*.tmp")
    assert sum(paorc.ORCFile(s).nrows for s in shards) == len(want)


def test_dedup_threshold_sweep_brute(ray_session):
    """Sweep rows match a brute recompute from the (pytest-verified)
    simhash pair chain + exact Jaccard, and counts are cumulative."""
    from rendler_ray.functions.text import jaccard_sets, ngram_set
    from rendler_ray.pipelines.queries import (
        dedup_threshold_sweep, simhash_near_dup_pairs)

    out = dedup_threshold_sweep(SF).to_pandas().set_index("ham_max")
    pairs = simhash_near_dup_pairs(SF).to_pandas()
    docs = _docs().set_index("doc_id")["text"]
    sh = {}
    for h in range(4):
        sub = pairs[pairs.hamming <= h]
        nt = 0
        for a, b in zip(sub.a, sub.b):
            ga = sh.setdefault(a, ngram_set(docs[a]))
            gb = sh.setdefault(b, ngram_set(docs[b]))
            nt += jaccard_sets(ga, gb) >= 0.5
        assert out.loc[h, "n_pairs"] == len(sub)
        assert out.loc[h, "n_true"] == nt
        assert out.loc[h, "precision_e6"] == (
            10 ** 6 * nt // len(sub) if len(sub) else 0)
    assert out.n_pairs.is_monotonic_increasing
    assert out.n_pairs.iloc[-1] > 0
