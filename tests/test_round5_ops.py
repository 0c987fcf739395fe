"""Round-5 op tests, batch 1: brute-force pytests for the three
round-4 snapshot-commit ops that shipped with SQL oracles only
(ADVICE r4) — revenue Pareto deciles, per-dimension embedding stats,
and the Gini mean-difference coefficient."""

import os

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _cents(x: np.ndarray) -> np.ndarray:
    # DuckDB round() is half-away-from-zero
    return (np.floor(np.abs(x) * 100 + 0.5) * np.sign(x)).astype(np.int64)


def test_revenue_pareto_brute(ray_session):
    """Decile counts/spends/shares agree with a python recompute of
    the desc-rank decile split; cumulative shares are monotone and
    end at ≈1; the Pareto property (decile 0 share is the largest)
    holds."""
    from rendler_ray.pipelines.queries import revenue_pareto_customers

    out = revenue_pareto_customers(SF).to_pandas()
    od = pq.read_table(os.path.join(SF, "orders.parquet"),
                       columns=["o_custkey", "o_totalprice"]).to_pandas()
    od["c"] = _cents(od["o_totalprice"].to_numpy())
    spend = od.groupby("o_custkey")["c"].sum()
    n = len(spend)
    # desc rank, ties broken by custkey desc == asc (spend, custkey)
    # rank r = n-1-i with i the asc position
    order = sorted(zip(spend.to_numpy(), spend.index.to_numpy()))
    dec = {}
    for i, (s, _) in enumerate(order):
        d = (n - 1 - i) * 10 // n
        cnt, tot = dec.get(d, (0, 0))
        dec[d] = (cnt + 1, tot + int(s))
    total = sum(t for _, t in dec.values())
    assert list(out["decile"]) == sorted(dec)
    cum = 0
    for _, row in out.iterrows():
        d = int(row["decile"])
        assert int(row["n_customers"]) == dec[d][0]
        assert int(row["spend_c"]) == dec[d][1]
        assert int(row["share_e6"]) == dec[d][1] * 1_000_000 // total
        cum += dec[d][1]
        assert int(row["cum_share_e6"]) == cum * 1_000_000 // total
    shares = out["share_e6"].to_numpy()
    assert shares[0] == shares.max()          # top decile dominates
    assert int(out["cum_share_e6"].iloc[-1]) in (999_999, 1_000_000)
    assert (np.diff(out["cum_share_e6"].to_numpy()) >= 0).all()


def test_embedding_dim_stats_brute(ray_session):
    """Per-dim n/min/max/mean/var agree with an exact big-int numpy
    recompute; variance is non-negative (Cauchy–Schwarz) and dims are
    1..64 exactly once."""
    from rendler_ray.pipelines.queries import embedding_dim_stats

    out = embedding_dim_stats(SF).to_pandas()
    em = pq.read_table(os.path.join(SF, "embeddings.parquet"),
                       columns=["embedding"])
    e = np.vstack(em["embedding"].to_pylist()).astype(np.float64)
    v = (np.floor(np.abs(e * 1e6) + 0.5) * np.sign(e)).astype(np.int64)
    n, d = v.shape
    assert list(out["i"]) == list(range(1, d + 1))
    for j in range(d):
        col = [int(x) for x in v[:, j]]
        s, q = sum(col), sum(x * x for x in col)
        row = out.iloc[j]
        assert int(row["n"]) == n
        assert int(row["mn"]) == min(col) and int(row["mx"]) == max(col)
        assert int(row["mean_e6"]) == s // n  # python floor division
        var = (n * q - s * s) // (n * n)
        assert int(row["var_e12"]) == var
        assert var >= 0


def test_gini_mean_difference_brute(ray_session):
    """gini_e6 equals the O(n²)-definition recompute Σ|xi−xj| /
    (2n(n−1)x̄) on a subsample identity check via the closed form, and
    the full-table closed form recomputed in exact python ints; the
    coefficient is in [0, 1e6]."""
    from rendler_ray.pipelines.queries import gini_mean_difference_values

    out = gini_mean_difference_values(SF).to_pandas().iloc[0]
    od = pq.read_table(os.path.join(SF, "orders.parquet"),
                       columns=["o_orderkey", "o_totalprice"]).to_pandas()
    x = _cents(od["o_totalprice"].to_numpy())
    keys = od["o_orderkey"].to_numpy()
    order = np.lexsort((keys, x))
    xs = [int(v) for v in x[order]]
    n, s = len(xs), sum(xs)
    w = sum((2 * (i + 1) - n - 1) * v for i, v in enumerate(xs))
    gini = w * 1_000_000 // ((n - 1) * s)
    assert int(out["n"]) == n and int(out["sum_c"]) == s
    assert int(out["gini_e6"]) == gini
    assert 0 <= gini <= 1_000_000
    # closed form == pair-sum definition on a small prefix:
    # gini = Σ_{i,j}|xi−xj| / (2·n·(n−1)·mean) with our (n−1) scaling
    sub = xs[:200]
    m = len(sub)
    pair = sum(abs(a - b) for a in sub for b in sub)
    wsub = sum((2 * (i + 1) - m - 1) * v for i, v in enumerate(sub))
    assert pair == 2 * wsub  # Σ|xi−xj| == 2·Σ(2i−n−1)x(i) when sorted


def test_phash_hot_bucket_salting(ray_session):
    """Adversarial identical-thumbnail corpus (10k copies of one
    pHash): the banded pair search must SALT the hot bucket into
    ≤max_bucket sub-buckets instead of materializing one O(b²)
    Hamming matrix — it completes with bounded per-task work, finds
    only within-sub-bucket pairs (the documented Manku-style recall
    trade), and an un-skewed corpus is untouched by the guard."""
    import pyarrow as pa
    import ray.data as rd

    from rendler_ray.pipelines.queries import _phash_banded_pairs

    n = 2_000
    cap = 128  # small cap so the salted shape is exercised hard
    sigs = rd.from_arrow(pa.table({
        "ref": pa.array([f"r{i:05d}" for i in range(n)], pa.string()),
        "phash": pa.array([0x0123456789ABCDEF] * n, pa.int64())}))
    out = _phash_banded_pairs(sigs, ham_max=3, max_bucket=cap)
    got = out.to_pandas() if hasattr(out, "to_pandas") else out
    import pandas as pd
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    # pairs exist (identical hashes ARE near-dups)...
    assert len(got) > 0
    assert (got["hamming"] == 0).all()
    # ...but bounded: with the bucket split into ceil(n/cap) = 16
    # sub-buckets per band, the pair count is far below all-pairs
    # C(2k,2) ≈ 2M — the blowup the salt prevents.
    assert len(got) < n * (n - 1) // 2 / 4
    # un-skewed corpus: distinct hashes, salting is a no-op and exact
    small = rd.from_arrow(pa.table({
        "ref": pa.array(["a", "b", "c"], pa.string()),
        "phash": pa.array([0, 1, 1 << 40], pa.int64())}))
    sp = _phash_banded_pairs(small, ham_max=3, max_bucket=cap)
    sp = sp.to_pandas() if not isinstance(sp, pd.DataFrame) else sp
    # (a,b) at hamming 1, (a,c) at hamming 1 — (b,c) is hamming 2,
    # also ≤ 3 and band-detectable
    assert set(map(tuple, sp[["ref_a", "ref_b"]].to_numpy())) == {
        ("a", "b"), ("a", "c"), ("b", "c")}


def _as_df(x):
    import pandas as pd
    return x if isinstance(x, pd.DataFrame) else x.to_pandas()


def test_betweenness_two_form(ray_session):
    """Forced past the driver gate, the per-source Ray-task fan-out
    over shared plasma edge blocks returns exactly the driver fold's
    top-k table (Fraction arithmetic is order-independent)."""
    from rendler_ray.pipelines.queries import betweenness_seed_sample

    drv = _as_df(betweenness_seed_sample(SF))
    dist = _as_df(betweenness_seed_sample(SF, driver_max=0))
    assert drv.reset_index(drop=True).equals(dist.reset_index(drop=True))


def test_bridges_articulation_two_form(ray_session):
    """Forced past the driver gate, per-component Tarjan sharding
    (CC labels → label join → one DFS task per component) returns the
    SAME bridge/cut SETS as the whole-graph driver fold."""
    from rendler_ray.pipelines.queries import (
        articulation_points_graph, bridges_crawl_graph)

    drv_b = _as_df(bridges_crawl_graph(SF))
    dist_b = _as_df(bridges_crawl_graph(SF, driver_max=0))
    assert set(map(tuple, drv_b[["a", "b"]].to_numpy())) == \
        set(map(tuple, dist_b[["a", "b"]].to_numpy()))
    assert len(dist_b) == len(drv_b)  # no dup emits across components

    drv_c = _as_df(articulation_points_graph(SF))
    dist_c = _as_df(articulation_points_graph(SF, driver_max=0))
    assert set(drv_c["node"]) == set(dist_c["node"])
    assert len(dist_c) == len(drv_c)


def test_diameter_two_form(ray_session):
    """Forced past the driver gate, the distributed double sweep
    (BFS rounds ×2 + bounded argmax aggregates) returns the driver
    fold's exact (ecc_seed, far_node, diameter_lb) row."""
    from rendler_ray.pipelines.queries import graph_diameter_bound

    drv = _as_df(graph_diameter_bound(SF))
    dist = _as_df(graph_diameter_bound(SF, driver_max=0))
    assert drv.reset_index(drop=True).equals(dist.reset_index(drop=True))


def test_dedup_exact_two_form(ray_session, monkeypatch):
    """dedup_exact_docs' driver Arrow fold (below the row gate) and
    the sorted_group_agg distributed form (forced past it) return the
    identical (fingerprint, min doc_id) table."""
    import pandas as pd

    import rendler_ray.pipelines.queries as Q

    drv = _as_df(Q.dedup_exact_docs(SF))
    monkeypatch.setattr(Q, "_DEDUP_DRIVER_MAX", -1)
    dist = _as_df(Q.dedup_exact_docs(SF))
    key = ["fingerprint", "doc_id"]
    a = drv[key].sort_values(key).reset_index(drop=True)
    b = dist[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_part_brand_margins_brute(ray_session):
    """Broadcast-join rollup equals a pandas merge + groupby recompute
    with the identical per-row cents rounding."""
    import pandas as pd

    from rendler_ray.pipelines.queries import part_brand_margins

    out = _as_df(part_brand_margins(SF)).sort_values(
        "p_brand").reset_index(drop=True)
    li = pq.read_table(os.path.join(SF, "lineitem.parquet")).to_pandas()
    pt = pq.read_table(os.path.join(SF, "part.parquet")).to_pandas()

    def rha(x):
        return (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype(np.int64)

    m = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    m["rev"] = rha((m["l_extendedprice"].to_numpy()
                    * (1.0 - m["l_discount"].to_numpy())) * 100.0)
    m["cost"] = (rha(m["p_retailprice"].to_numpy() * 100.0)
                 * m["l_quantity"].to_numpy().astype(np.int64))
    g = m.groupby("p_brand").agg(
        n_items=("rev", "size"), revenue_cents=("rev", "sum"),
        retail_cost_cents=("cost", "sum")).reset_index()
    g["margin_cents"] = g["revenue_cents"] - g["retail_cost_cents"]
    g = g.sort_values("p_brand").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["p_brand", "n_items", "revenue_cents",
             "retail_cost_cents", "margin_cents"]].astype(
            {"n_items": np.int64}),
        g.astype({"n_items": np.int64}))


def test_l_diversity_brute(ray_session):
    """Per-QI-group row counts and distinct-sensitive counts equal a
    pandas nunique recompute; every group satisfies l >= 1 and
    l <= n_rows."""
    from rendler_ray.pipelines.queries import l_diversity_orders

    out = _as_df(l_diversity_orders(SF))
    od = pq.read_table(os.path.join(SF, "orders.parquet")).to_pandas()
    od["month"] = od["o_orderdate"].dt.month.astype(np.int64)
    g = od.groupby(["o_orderpriority", "month"]).agg(
        n_rows=("o_custkey", "size"),
        l_distinct=("o_custkey", "nunique")).reset_index()
    a = out.sort_values(["o_orderpriority", "month"]).reset_index(
        drop=True)
    b = g.sort_values(["o_orderpriority", "month"]).reset_index(
        drop=True)
    assert (a["n_rows"].to_numpy() == b["n_rows"].to_numpy()).all()
    assert (a["l_distinct"].to_numpy()
            == b["l_distinct"].to_numpy()).all()
    assert (a["l_distinct"] <= a["n_rows"]).all()


def test_partition_modularity_brute(ray_session):
    """Exact-integer modularity terms equal a Fraction recompute of
    Newman's definition over the brute-force edge set, and the summed
    Q matches sum(e_c/m - (D_c/2m)^2) within the 16-term floor
    quantization."""
    from fractions import Fraction

    from rendler_ray.pipelines.queries import partition_modularity_graph

    out = _as_df(partition_modularity_graph(SF))
    od = pq.read_table(os.path.join(SF, "orders.parquet")).to_pandas()
    a = od["o_custkey"].to_numpy()
    b = (od["o_orderkey"].to_numpy() % 1500) + 1
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    edges = {(x, y) for x, y in zip(lo, hi) if x != y}
    m = len(edges)
    e_in, deg = {}, {}
    for (x, y) in edges:
        deg[x] = deg.get(x, 0) + 1
        deg[y] = deg.get(y, 0) + 1
        if x % 16 == y % 16:
            e_in[x % 16] = e_in.get(x % 16, 0) + 1
    D = {}
    for v, d in deg.items():
        D[v % 16] = D.get(v % 16, 0) + d
    for _, r in out.iterrows():
        c = int(r["community"])
        assert int(r["e_in"]) == e_in.get(c, 0)
        assert int(r["deg_sum"]) == D[c]
        q = Fraction(4 * m * e_in.get(c, 0) - D[c] * D[c], 4 * m * m)
        import math
        assert int(r["q_term_e6"]) == math.floor(q * 1_000_000)
    assert set(out["community"]) == set(D)


def test_unimax_brute(ray_session):
    """Water-fill quotas match a pure-python recompute; per-language
    selections are exactly the md5-rank-top-quota sets; the spent
    budget equals half the corpus."""
    import hashlib

    from rendler_ray.pipelines.queries import unimax_mix_docs

    out = _as_df(unimax_mix_docs(SF))
    d = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "lang"]).to_pandas()
    counts = d.groupby("lang").size().sort_values(kind="stable")
    rows = sorted((int(n), l) for l, n in counts.items())
    budget = len(d) // 2
    remaining, left, quota = budget, len(rows), {}
    for n, lang in rows:
        take = min(n, remaining // left)
        quota[lang] = take
        remaining -= take
        left -= 1
    got = out.groupby("lang").size().to_dict()
    assert got == {k: v for k, v in quota.items() if v > 0}
    assert len(out) == budget - remaining
    assert len(out) == budget  # corpus is bigger than the budget here
    for lang, grp in d.groupby("lang"):
        ranked = sorted(
            grp["doc_id"],
            key=lambda i: hashlib.md5(f"{i}-ux1".encode()).hexdigest())
        want = set(ranked[:quota[lang]])
        assert set(out[out["lang"] == lang]["doc_id"]) == want


def test_doremi_brute(ray_session):
    """Weights replay exactly in scalar python; they sum to ~1e6 (the
    integer-division remainder bound) and are monotone in the proxy
    loss (the exponentiated-gradient property from a uniform init)."""
    import math

    from rendler_ray.pipelines.queries import doremi_domain_weights

    out = _as_df(doremi_domain_weights(SF)).sort_values(
        "source").reset_index(drop=True)
    d = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["text", "source"]).to_pandas()
    stop = {"the", "a", "of", "to", "and", "in", "is", "it"}
    d["nt"] = d["text"].str.split(" ").map(len)
    d["ns"] = d["text"].str.split(" ").map(
        lambda ts: sum(1 for x in ts if x in stop))
    g = d.groupby("source").agg(n=("nt", "size"), t=("nt", "sum"),
                                s=("ns", "sum")).sort_index()
    loss = [1.0 - (float(s) / float(t))
            for s, t in zip(g["s"], g["t"])]
    L = len(g)
    w = [1_000_000 // L] * L
    for _ in range(3):
        u = [int(math.floor(abs(wi * math.exp(0.5 * li)) + 0.5))
             for wi, li in zip(w, loss)]
        z = sum(u)
        w = [ui * 1_000_000 // z for ui in u]
    assert list(out["weight_e6"]) == w
    assert abs(sum(w) - 1_000_000) <= L
    order = np.argsort(loss)
    ws = np.asarray(w)[order]
    assert (np.diff(ws) >= 0).all()


def test_embedding_cka_brute(ray_session):
    """CKA e6 equals an exact-int numpy recompute from the raw
    embedding table (moments as Python ints, identical final float
    tree); value is in (0, 1e6]."""
    from rendler_ray.pipelines.queries import embedding_cka_halves

    out = _as_df(embedding_cka_halves(SF))
    v = np.asarray(pq.read_table(
        os.path.join(SF, "embeddings.parquet"),
        columns=["embedding"])["embedding"].to_pylist(),
        dtype=np.float64)
    e = (np.floor(np.abs(v * 1e6) + 0.5)
         * np.sign(v * 1e6)).astype(np.int64)
    x, y = e[:, :32].astype(object), e[:, 32:].astype(object)
    cxy, cxx, cyy = x.T @ y, x.T @ x, y.T @ y
    sxy = int((cxy * cxy).sum())
    sxx = int((cxx * cxx).sum())
    syy = int((cyy * cyy).sum())
    want = int(np.floor(1000000 * (np.float64(sxy) / np.sqrt(
        np.float64(sxx) * np.float64(syy)))))
    assert int(out["cka_e6"][0]) == want
    assert 0 < want <= 1_000_000
    assert int(out["n"][0]) == len(v)


def test_time_travel_brute(ray_session):
    """v0 stats equal the raw table; v1 stats equal a pandas replay of
    the CDC merge; the manifest lists exactly the files each version
    read and survives re-reads."""
    import json

    from rendler_ray.pipelines.queries import docs_time_travel_read

    out = _as_df(docs_time_travel_read(SF)).set_index("version")
    d = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "n_chars", "source"]).to_pandas()
    assert out.loc[0, "n_rows"] == len(d)
    assert out.loc[0, "sum_n_chars"] == d["n_chars"].sum()
    assert out.loc[0, "sum_doc_id"] == d["doc_id"].sum()
    assert out.loc[0, "n_patched"] == 0

    m = d["doc_id"] % 97
    v1 = d[m != 7].copy()
    upd = v1["doc_id"] % 97 == 3
    v1.loc[upd, "n_chars"] += 1000
    v1.loc[upd, "source"] = "patched"
    ins = d[m == 11].copy()
    ins["doc_id"] += 1_000_000_000
    ins["source"] = "inserted"
    import pandas as pd
    v1 = pd.concat([v1, ins])
    assert out.loc[1, "n_rows"] == len(v1)
    assert out.loc[1, "sum_n_chars"] == v1["n_chars"].sum()
    assert out.loc[1, "sum_doc_id"] == v1["doc_id"].sum()
    assert out.loc[1, "n_patched"] == int(upd.sum())

    root = os.path.join(
        "/tmp/rendler_ray_tt", f"sf0.001_{os.getpid()}")
    mf = json.load(open(os.path.join(root, "manifest.json")))
    assert set(mf) == {"0", "1"}
    for files in mf.values():
        assert files and all(os.path.exists(f) for f in files)


def test_rouge_l_brute(ray_session):
    """Every adjacent pair's LCS equals the quadratic reference DP;
    pairing is exactly consecutive (source, doc_id) order; f_e6 is the
    exact integer harmonic mean."""
    from rendler_ray.pipelines.queries import rouge_l_adjacent_pairs

    out = _as_df(rouge_l_adjacent_pairs(SF)).sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    d = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "text", "source"]).to_pandas()
    d = d.sort_values(["source", "doc_id"]).reset_index(drop=True)
    want_pairs = [
        (int(d.loc[i, "doc_id"]), int(d.loc[i + 1, "doc_id"]))
        for i in range(len(d) - 1)
        if d.loc[i, "source"] == d.loc[i + 1, "source"]]
    assert sorted(zip(out["doc_a"], out["doc_b"])) == sorted(want_pairs)

    txt = d.set_index("doc_id")["text"]

    def ref_lcs(a, b):
        a, b = a.split(" ")[:64], b.split(" ")[:64]
        dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                dp[i][j] = max(dp[i - 1][j], dp[i][j - 1],
                               dp[i - 1][j - 1] + (a[i - 1] == b[j - 1]))
        return dp[len(a)][len(b)], len(a), len(b)

    for _, r in out.iterrows():
        want, la, lb = ref_lcs(txt[r["doc_a"]], txt[r["doc_b"]])
        assert int(r["lcs"]) == want
        assert int(r["len_a"]) == la and int(r["len_b"]) == lb
        assert int(r["f_e6"]) == 2 * want * 1_000_000 // (la + lb)


def test_excess_fluency_two_form(ray_session):
    """Driver count+join fold and the staged distributed form return
    identical per-doc excess tables; keep == (excess > 0) everywhere;
    fluency3 matches trigram_fluency_docs' fluency on shared docs."""
    import pandas as pd

    from rendler_ray.pipelines.queries import (excess_fluency_select_docs,
                                               trigram_fluency_docs)

    drv = _as_df(excess_fluency_select_docs(SF)).sort_values(
        "doc_id").reset_index(drop=True)
    dist = _as_df(excess_fluency_select_docs(SF, driver_max=-1)) \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(drv, dist[drv.columns])
    assert ((drv["excess_e6"] > 0).astype(np.int64)
            == drv["keep"]).all()
    tf = _as_df(trigram_fluency_docs(SF)).set_index("doc_id")
    j = drv.set_index("doc_id")
    assert (j["fluency3_e6"] == tf.loc[j.index, "fluency_e6"]).all()


def test_vacuum_expired_snapshots(ray_session):
    """After vacuum: the retained (latest) version reads its full
    pre-vacuum row count through the rewritten manifest; the expired
    version's unshared files are gone and it reads 0 rows; the
    manifest no longer lists the expired version."""
    import json

    from rendler_ray.pipelines.queries import vacuum_expired_snapshots

    out = _as_df(vacuum_expired_snapshots(SF)).set_index("version")
    assert out.loc[0, "retained"] == 0
    assert out.loc[1, "retained"] == 1
    assert out.loc[0, "n_rows_after"] == 0
    assert out.loc[1, "n_rows_after"] == out.loc[1, "n_rows_before"]
    assert out.loc[0, "n_rows_before"] > 0
    root = os.path.join("/tmp/rendler_ray_tt",
                        f"sf0.001_{os.getpid()}")
    mf = json.load(open(os.path.join(root, "manifest.json")))
    assert set(mf) == {"1"}
    assert all(os.path.exists(f) for f in mf["1"])


def test_label_prop_two_form(ray_session):
    """Forced past the edge gate, the distributed label-propagation
    rounds return exactly the driver fold's (url, label) table."""
    import pandas as pd

    from rendler_ray.functions.graph import (label_propagation_auto,
                                             label_propagation_ds)
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.pipelines.queries import _synth_docs_for
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(SF),
                            seeds=default_seeds(1), max_depth=3))
    drv = _as_df(label_propagation_auto(res.edges)).sort_values(
        "url").reset_index(drop=True)
    dist = _as_df(label_propagation_ds(res.edges)).sort_values(
        "url").reset_index(drop=True)
    pd.testing.assert_frame_equal(drv, dist)


def test_promo_share_brute(ray_session):
    """Promo shares equal a pandas merge recompute with identical
    per-row cents; share is the exact integer quotient and lies in
    [0, 1e6]; promo <= total per month."""
    from rendler_ray.pipelines.queries import promo_revenue_share_monthly

    out = _as_df(promo_revenue_share_monthly(SF)).sort_values(
        "ym").reset_index(drop=True)
    li = pq.read_table(os.path.join(SF, "lineitem.parquet")).to_pandas()
    pt = pq.read_table(os.path.join(SF, "part.parquet")).to_pandas()

    def rha(x):
        return (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype(np.int64)

    m = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    m["ym"] = (m["l_shipdate"].dt.year * 100
               + m["l_shipdate"].dt.month).astype(np.int64)
    m["rev"] = rha((m["l_extendedprice"].to_numpy()
                    * (1.0 - m["l_discount"].to_numpy())) * 100.0)
    m["promo"] = np.where(m["p_type"] == "PROMO", m["rev"], 0)
    g = m.groupby("ym").agg(promo_cents=("promo", "sum"),
                            total_cents=("rev", "sum")).reset_index()
    g = g.sort_values("ym").reset_index(drop=True)
    assert (out["ym"].to_numpy() == g["ym"].to_numpy()).all()
    assert (out["promo_cents"].to_numpy()
            == g["promo_cents"].to_numpy()).all()
    assert (out["total_cents"].to_numpy()
            == g["total_cents"].to_numpy()).all()
    want_share = [int(a) * 1_000_000 // int(b)
                  for a, b in zip(g["promo_cents"], g["total_cents"])]
    assert list(out["promo_share_e6"]) == want_share
    assert out["promo_share_e6"].between(0, 1_000_000).all()


def test_supplier_nation_flow_brute(ray_session):
    """The flow matrix equals a four-way pandas merge recompute; total
    cells <= 25x25 and total revenue equals the unsegmented sum."""
    from rendler_ray.pipelines.queries import supplier_nation_flow

    out = _as_df(supplier_nation_flow(SF))
    li = pq.read_table(os.path.join(SF, "lineitem.parquet")).to_pandas()
    od = pq.read_table(os.path.join(SF, "orders.parquet")).to_pandas()
    cu = pq.read_table(os.path.join(SF, "customer.parquet")).to_pandas()
    su = pq.read_table(os.path.join(SF, "supplier.parquet")).to_pandas()
    na = pq.read_table(os.path.join(SF, "nation.parquet")).to_pandas()

    def rha(x):
        return (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype(np.int64)

    m = (li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cu, left_on="o_custkey", right_on="c_custkey")
         .merge(su, left_on="l_suppkey", right_on="s_suppkey")
         .merge(na.rename(columns={"n_name": "supp_nation"}),
                left_on="s_nationkey", right_on="n_nationkey")
         .merge(na.rename(columns={"n_name": "cust_nation",
                                   "n_nationkey": "nk2"}),
                left_on="c_nationkey", right_on="nk2"))
    m["rev"] = rha((m["l_extendedprice"].to_numpy()
                    * (1.0 - m["l_discount"].to_numpy())) * 100.0)
    g = m.groupby(["supp_nation", "cust_nation"]).agg(
        n_items=("rev", "size"),
        revenue_cents=("rev", "sum")).reset_index()
    key = ["supp_nation", "cust_nation"]
    a = out.sort_values(key).reset_index(drop=True)
    b = g.sort_values(key).reset_index(drop=True)
    assert (a["n_items"].to_numpy().astype(np.int64)
            == b["n_items"].to_numpy().astype(np.int64)).all()
    assert (a["revenue_cents"].to_numpy()
            == b["revenue_cents"].to_numpy()).all()
    assert len(a) <= 625
    assert a["revenue_cents"].sum() == m["rev"].sum()


def test_eigenvector_two_form(ray_session):
    """Forced past the edge gate, the broadcast-score distributed
    rounds return exactly the driver fold's integer score table; the
    max score is 1e6 and scores are positive on this connected-ish
    graph."""
    import pandas as pd

    from rendler_ray.pipelines.queries import eigenvector_centrality_graph

    drv = _as_df(eigenvector_centrality_graph(SF)).sort_values(
        "node").reset_index(drop=True)
    dist = _as_df(eigenvector_centrality_graph(SF, driver_max=-1)) \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(drv, dist)
    assert drv["score_e6"].max() == 1_000_000
    assert (drv["score_e6"] >= 0).all()


def test_dau_mau_brute(ray_session):
    """Stickiness equals a pandas recompute (per-day/per-month
    distincts, exact integer quotient); stickiness is within
    (0, 1e6]."""
    from rendler_ray.pipelines.queries import dau_mau_stickiness

    out = _as_df(dau_mau_stickiness(SF))
    ev = pq.read_table(os.path.join(SF, "events.parquet"),
                       columns=["ts", "user_id"]).to_pandas()
    ev["day"] = (ev["ts"].astype("int64") // 86_400_000_000)
    ev["ym"] = (ev["ts"].dt.year * 100 + ev["ts"].dt.month)
    dau = ev.groupby("day")["user_id"].nunique()
    day_ym = ev.groupby("day")["ym"].first()
    mau = ev.groupby("ym")["user_id"].nunique()
    import pandas as pd
    df = pd.DataFrame({"ym": day_ym, "dau": dau}).groupby("ym").agg(
        sum_dau=("dau", "sum"), n_days=("dau", "size"))
    for _, r in out.iterrows():
        ymv = int(r["ym"])
        assert int(r["n_days"]) == int(df.loc[ymv, "n_days"])
        assert int(r["sum_dau"]) == int(df.loc[ymv, "sum_dau"])
        assert int(r["mau"]) == int(mau.loc[ymv])
        want = (int(df.loc[ymv, "sum_dau"]) * 1_000_000
                // (int(df.loc[ymv, "n_days"]) * int(mau.loc[ymv])))
        assert int(r["stickiness_e6"]) == want
        assert 0 < int(r["stickiness_e6"]) <= 1_000_000


def test_degree_distribution_brute(ray_session):
    """Histogram equals a python recompute; sum(degree*n_nodes) equals
    2m (handshake lemma)."""
    from rendler_ray.pipelines.queries import degree_distribution_graph

    out = _as_df(degree_distribution_graph(SF))
    od = pq.read_table(os.path.join(SF, "orders.parquet")).to_pandas()
    a = od["o_custkey"].to_numpy()
    b = (od["o_orderkey"].to_numpy() % 1500) + 1
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    edges = {(x, y) for x, y in zip(lo, hi) if x != y}
    deg = {}
    for (x, y) in edges:
        deg[x] = deg.get(x, 0) + 1
        deg[y] = deg.get(y, 0) + 1
    from collections import Counter
    hist = Counter(deg.values())
    got = dict(zip(out["degree"].astype(int), out["n_nodes"].astype(int)))
    assert got == dict(hist)
    assert sum(d * n for d, n in got.items()) == 2 * len(edges)


def test_burrows_delta_brute(ray_session):
    """Delta table equals a scalar python recompute from raw token
    counts (same vocab cut, same per-addend float tree); distances are
    symmetric-complete over source pairs and non-negative."""
    import math
    from collections import Counter

    from rendler_ray.pipelines.queries import stylometry_burrows_delta

    out = _as_df(stylometry_burrows_delta(SF))
    d = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["text", "source"]).to_pandas()
    toks = d["text"].str.split(" ")
    allc = Counter(t for xs in toks for t in xs)
    vocab = [t for t, _ in sorted(allc.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:16]]
    srcs = sorted(d["source"].unique())
    f = {}
    for s in srcs:
        sub = toks[d["source"] == s]
        c = Counter(t for xs in sub for t in xs)
        tot = sum(c.values())
        for t in vocab:
            f[(s, t)] = c.get(t, 0) * 1_000_000 // tot
    n = len(srcs)
    R = {}
    for t in vocab:
        vals = [f[(s, t)] for s in srcs]
        R[t] = n * sum(v * v for v in vals) - sum(vals) ** 2
    want = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            tot_e6, used = 0, 0
            for t in vocab:
                if R[t] <= 0:
                    continue
                used += 1
                tot_e6 += math.floor(
                    1000000.0 * ((abs(f[(a, t)] - f[(b, t)]) * n)
                                 / math.sqrt(R[t])))
            want[(a, b)] = (used, tot_e6 // used if used else 0)
    got = {(r["source_a"], r["source_b"]):
           (int(r["k_used"]), int(r["delta_e6"]))
           for _, r in out.iterrows()}
    assert got == want
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2
    assert all(v[1] >= 0 for v in got.values())


def test_readability_brute(ray_session):
    """Flesch e3 scores equal a scalar python recompute (vowel-run
    syllables, '.'-segment sentences, identical floor quotients)."""
    import re

    from rendler_ray.pipelines.queries import readability_scores_docs

    out = _as_df(readability_scores_docs(SF)).set_index("doc_id")
    d = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "text"]).to_pandas()
    for _, r in d.iterrows():
        txt = r["text"]
        w = max(len(txt.split(" ")), 1)
        s = max(sum(1 for x in txt.split(".") if x.strip() != ""), 1)
        syll = len(re.findall("[aeiouAEIOU]+", txt))
        f = 206835 - 1015 * w // s - 84600 * syll // w
        row = out.loc[r["doc_id"]]
        assert (int(row["n_words"]), int(row["n_sents"]),
                int(row["n_syllables"]), int(row["flesch_e3"])) == \
            (w, s, syll, f)


def test_clv_cohort_brute(ray_session):
    """Cohort matrix equals a pandas recompute; every customer's
    offset-0 cell exists and total revenue is conserved."""
    from rendler_ray.pipelines.queries import clv_cohort_revenue

    out = _as_df(clv_cohort_revenue(SF))
    od = pq.read_table(os.path.join(SF, "orders.parquet")).to_pandas()

    def rha(x):
        return (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype(np.int64)

    od["m"] = od["o_orderdate"].dt.year * 12 + od["o_orderdate"].dt.month
    od["cents"] = rha(od["o_totalprice"].to_numpy() * 100.0)
    od["m0"] = od.groupby("o_custkey")["m"].transform("min")
    od["cohort_ym"] = ((od["m0"] - 1) // 12 * 100
                       + ((od["m0"] - 1) % 12 + 1))
    od["months_since"] = od["m"] - od["m0"]
    g = od.groupby(["cohort_ym", "months_since"]).agg(
        n_orders=("cents", "size"),
        revenue_cents=("cents", "sum")).reset_index()
    key = ["cohort_ym", "months_since"]
    a = out.sort_values(key).reset_index(drop=True)
    b = g.sort_values(key).reset_index(drop=True)
    assert (a[key].to_numpy() == b[key].to_numpy()).all()
    assert (a["n_orders"].to_numpy().astype(np.int64)
            == b["n_orders"].to_numpy()).all()
    assert (a["revenue_cents"].to_numpy()
            == b["revenue_cents"].to_numpy()).all()
    assert a["revenue_cents"].sum() == od["cents"].sum()
    assert set(a[a["months_since"] == 0]["cohort_ym"]) == \
        set(od["cohort_ym"].unique())


def test_region_rollup_brute(ray_session):
    """Rollup cube equals a pandas recompute at every level; subtotal
    conservation holds (nations sum to their region row, regions sum
    to the grand total)."""
    from rendler_ray.pipelines.queries import region_nation_rollup_revenue

    out = _as_df(region_nation_rollup_revenue(SF))
    od = pq.read_table(os.path.join(SF, "orders.parquet")).to_pandas()
    cu = pq.read_table(os.path.join(SF, "customer.parquet")).to_pandas()
    na = pq.read_table(os.path.join(SF, "nation.parquet")).to_pandas()
    re_ = pq.read_table(os.path.join(SF, "region.parquet")).to_pandas()

    def rha(x):
        return (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype(np.int64)

    m = (od.merge(cu, left_on="o_custkey", right_on="c_custkey")
         .merge(na, left_on="c_nationkey", right_on="n_nationkey")
         .merge(re_, left_on="n_regionkey", right_on="r_regionkey"))
    m["cents"] = rha(m["o_totalprice"].to_numpy() * 100.0)
    leaf = m.groupby(["r_name", "n_name"]).agg(
        n=("cents", "size"), rev=("cents", "sum"))
    got_leaf = out[(out["region"] != "ALL") & (out["nation"] != "ALL")]
    assert len(got_leaf) == len(leaf)
    for (r, n), row in leaf.iterrows():
        g = got_leaf[(got_leaf["region"] == r)
                     & (got_leaf["nation"] == n)].iloc[0]
        assert int(g["n_orders"]) == int(row["n"])
        assert int(g["revenue_cents"]) == int(row["rev"])
    subs = out[(out["nation"] == "ALL") & (out["region"] != "ALL")]
    for _, srow in subs.iterrows():
        r = srow["region"]
        part = got_leaf[got_leaf["region"] == r]
        assert int(srow["revenue_cents"]) == part["revenue_cents"].sum()
        assert int(srow["n_orders"]) == part["n_orders"].sum()
    tot = out[(out["region"] == "ALL")].iloc[0]
    assert int(tot["revenue_cents"]) == got_leaf["revenue_cents"].sum()
    assert int(tot["n_orders"]) == len(od)


def test_peak_hour_brute(ray_session):
    """Packed-key argmax equals a pandas recompute with the same
    count-desc hour-asc tie rule; hours are in [0, 24)."""
    from rendler_ray.pipelines.queries import peak_hour_per_type

    out = _as_df(peak_hour_per_type(SF)).set_index("event_type")
    ev = pq.read_table(os.path.join(SF, "events.parquet"),
                       columns=["event_type", "ts"]).to_pandas()
    ev["hour"] = ev["ts"].dt.hour
    g = ev.groupby(["event_type", "hour"]).size().reset_index(name="n")
    for et, grp in g.groupby("event_type"):
        grp = grp.sort_values(["n", "hour"],
                              ascending=[False, True])
        assert int(out.loc[et, "peak_hour"]) == int(grp.iloc[0]["hour"])
        assert int(out.loc[et, "n_events"]) == int(grp.iloc[0]["n"])
    assert out["peak_hour"].between(0, 23).all()


def test_repeat_buyer_brute(ray_session):
    """Segment table equals a pandas recompute; customers and orders
    are conserved across segments."""
    from rendler_ray.pipelines.queries import repeat_buyer_segments

    out = _as_df(repeat_buyer_segments(SF)).set_index("segment")
    od = pq.read_table(os.path.join(SF, "orders.parquet"),
                       columns=["o_custkey", "o_totalprice"]).to_pandas()

    def rha(x):
        return (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype(np.int64)

    od["cents"] = rha(od["o_totalprice"].to_numpy() * 100.0)
    pc_ = od.groupby("o_custkey").agg(n=("cents", "size"),
                                      cents=("cents", "sum"))
    pc_["segment"] = np.where(
        pc_["n"] == 1, "one_time",
        np.where(pc_["n"] <= 5, "repeat_2_5", "repeat_6_plus"))
    g = pc_.groupby("segment").agg(n_customers=("n", "size"),
                                   n_orders=("n", "sum"),
                                   cents=("cents", "sum"))
    for seg, row in g.iterrows():
        assert int(out.loc[seg, "n_customers"]) == int(row["n_customers"])
        assert int(out.loc[seg, "n_orders"]) == int(row["n_orders"])
        assert int(out.loc[seg, "revenue_cents"]) == int(row["cents"])
    assert out["n_customers"].sum() == len(pc_)
    assert out["n_orders"].sum() == len(od)


def test_angle_histogram_brute(ray_session):
    """Bucket histogram equals a numpy recompute over all successor
    pairs; buckets lie in [-10, 10] and pair count is conserved."""
    from rendler_ray.pipelines.queries import embedding_angle_histogram

    out = _as_df(embedding_angle_histogram(SF))
    v = np.asarray(pq.read_table(
        os.path.join(SF, "embeddings.parquet"),
        columns=["vec_id", "embedding"]).sort_by("vec_id")
        ["embedding"].to_pylist(), dtype=np.float32).astype(np.float64)
    a, b = v[:-1], v[1:]
    num = (a * b).sum(1)
    den = np.sqrt((a * a).sum(1)) * np.sqrt((b * b).sum(1))
    x = 1e6 * (num / den)
    s = (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype(np.int64)
    from collections import Counter
    want = Counter(np.floor_divide(s, 100_000).tolist())
    got = dict(zip(out["bucket"].astype(int), out["n_pairs"].astype(int)))
    assert got == dict(want)
    assert sum(got.values()) == len(v) - 1
    assert all(-10 <= k <= 10 for k in got)


def test_backlog_aging_brute(ray_session):
    """Aging buckets equal a pandas recompute against the max-date
    watermark; finished orders are excluded; value conserved."""
    from rendler_ray.pipelines.queries import orders_backlog_aging

    out = _as_df(orders_backlog_aging(SF))
    od = pq.read_table(os.path.join(SF, "orders.parquet")).to_pandas()

    def rha(x):
        return (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype(np.int64)

    wm = od["o_orderdate"].max()
    open_ = od[od["o_orderstatus"] != "F"].copy()
    age = (wm - open_["o_orderdate"]).dt.days
    open_["age_bucket"] = np.where(
        age <= 30, "0_30", np.where(age <= 90, "31_90",
                                    np.where(age <= 365, "91_365",
                                             "365_plus")))
    open_["cents"] = rha(open_["o_totalprice"].to_numpy() * 100.0)
    g = open_.groupby(["o_orderstatus", "age_bucket"]).agg(
        n_orders=("cents", "size"), value_cents=("cents", "sum"))
    for (st, bk), row in g.iterrows():
        m = out[(out["o_orderstatus"] == st)
                & (out["age_bucket"] == bk)].iloc[0]
        assert int(m["n_orders"]) == int(row["n_orders"])
        assert int(m["value_cents"]) == int(row["value_cents"])
    assert len(out) == len(g)
    assert out["value_cents"].sum() == open_["cents"].sum()


def test_weekday_seasonality_brute(ray_session):
    """Indices equal a pandas recompute with the Sunday=0 convention;
    the day-count-weighted mean index per type is ~1e6 (exact up to
    floor quantization)."""
    from rendler_ray.pipelines.queries import weekday_seasonality_index

    out = _as_df(weekday_seasonality_index(SF))
    ev = pq.read_table(os.path.join(SF, "events.parquet"),
                       columns=["event_type", "ts"]).to_pandas()
    ev["dow"] = (ev["ts"].dt.dayofweek + 1) % 7  # pandas Mon=0
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    d_days = ev.groupby("dow")["day"].nunique()
    n_days = int(d_days.sum())
    tot = ev.groupby("event_type").size()
    g = ev.groupby(["event_type", "dow"]).size().reset_index(name="n")
    for _, r in out.iterrows():
        row = g[(g["event_type"] == r["event_type"])
                & (g["dow"] == r["dow"])].iloc[0]
        assert int(r["n_events"]) == int(row["n"])
        want = (int(row["n"]) * n_days * 1_000_000
                // (int(d_days[r["dow"]]) * int(tot[r["event_type"]])))
        assert int(r["idx_e6"]) == want
    # weighted-mean sanity: sum over dows of n_td == n_t per type
    s = out.groupby("event_type")["n_events"].sum()
    for et, v in s.items():
        assert int(v) == int(tot[et])


def test_nation_hhi_brute(ray_session):
    """HHI equals an exact Python-int recompute; values lie in
    (1e6/n_customers, 1e6]."""
    from rendler_ray.pipelines.queries import nation_revenue_hhi

    out = _as_df(nation_revenue_hhi(SF)).set_index("nationkey")
    od = pq.read_table(os.path.join(SF, "orders.parquet")).to_pandas()
    cu = pq.read_table(os.path.join(SF, "customer.parquet")).to_pandas()

    def rha(x):
        return (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype(np.int64)

    od["cents"] = rha(od["o_totalprice"].to_numpy() * 100.0)
    m = od.merge(cu, left_on="o_custkey", right_on="c_custkey")
    pc_ = m.groupby(["c_nationkey", "o_custkey"])["cents"].sum()
    for nk, grp in pc_.groupby(level=0):
        c = [int(x) for x in grp]
        tot = sum(c)
        want = sum(x * x for x in c) * 1_000_000 // (tot * tot)
        assert int(out.loc[nk, "hhi_e6"]) == want
        assert int(out.loc[nk, "n_customers"]) == len(c)
        assert int(out.loc[nk, "revenue_cents"]) == tot
        assert want <= 1_000_000
        assert want * len(c) >= 1_000_000 - len(c)
