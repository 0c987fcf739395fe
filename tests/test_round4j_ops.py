"""Round-4j op families: interval attribution join, leave-one-out
target encoding, GROUPING SETS, classifier eval (per-class P/R/F1 and
Cohen's kappa), seasonal anomaly detection, kNN-distance outliers,
bloom data-skipping index, phrase search, Matryoshka dim ablation,
data-quality constraint audit."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    return pq.read_table(os.path.join(SF, "events.parquet")).to_pandas()


def test_interval_join_brute(ray_session):
    """Per-purchase window counts/sums match an O(n·m) pandas brute
    force, and the window actually bites (some purchases have views,
    some don't)."""
    from rendler_ray.pipelines.queries import interval_join_attribution

    out = interval_join_attribution(SF).to_pandas() \
        .sort_values("purchase_id").reset_index(drop=True)

    ev = _events()
    p = ev[ev.event_type == "purchase"]
    v = ev[ev.event_type == "view"]
    rows = []
    for _, r in p.iterrows():
        w = v[(v.user_id == r.user_id) & (v.ts > r.ts - pd.Timedelta("1h"))
              & (v.ts <= r.ts)]
        cents = np.rint(w.value.to_numpy(np.float64) * 100).astype(np.int64)
        rows.append((r.event_id, r.user_id,
                     r.ts.value // 10**9, len(w), int(cents.sum())))
    want = pd.DataFrame(rows, columns=[
        "purchase_id", "user_id", "purchase_epoch",
        "n_views_1h", "views_value_c"]) \
        .sort_values("purchase_id").reset_index(drop=True)
    assert (want.n_views_1h > 0).any() and (want.n_views_1h == 0).any()
    pd.testing.assert_frame_equal(
        out.astype("int64"), want.astype("int64"))


def test_loo_encode_brute(ray_session):
    """enc_num/enc_den reproduce the leave-one-out mean exactly, and
    excluding self actually changes the value vs the plain mean."""
    from rendler_ray.pipelines.queries import loo_target_encode_events

    out = loo_target_encode_events(SF).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)

    ev = _events()
    ev["c"] = np.rint(ev.value.to_numpy(np.float64) * 100).astype(np.int64)
    g = ev.groupby("event_type")["c"].agg(["sum", "size"])
    want_num = ev.event_type.map(g["sum"]).to_numpy(np.int64) \
        - ev.c.to_numpy(np.int64)
    want_den = ev.event_type.map(g["size"]).to_numpy(np.int64) - 1
    ev2 = ev.sort_values("event_id").reset_index(drop=True)
    want = pd.DataFrame({
        "event_id": ev2.event_id,
        "enc_num_c": ev.sort_values("event_id").event_type.map(
            g["sum"]).to_numpy(np.int64)
        - ev2.c.to_numpy(np.int64),
        "enc_den": ev2.event_type.map(g["size"]).to_numpy(np.int64) - 1})
    assert (out.enc_num_c.to_numpy() == want.enc_num_c.to_numpy()).all()
    assert (out.enc_den.to_numpy() == want.enc_den.to_numpy()).all()
    # LOO differs from the plain mean unless the category is constant
    assert (want_den >= 1).all()
    plain = ev.event_type.map(g["sum"] / g["size"])
    loo = want_num / np.maximum(want_den, 1)
    assert (np.abs(plain - loo) > 1e-9).any()


def test_grouping_sets_brute(ray_session):
    """The three grouping sets reproduce pandas marginals with the
    right gid per set."""
    from rendler_ray.pipelines.queries import grouping_sets_revenue

    out = grouping_sets_revenue(SF).to_pandas()
    o = pq.read_table(os.path.join(SF, "orders.parquet")).to_pandas()
    o["c"] = np.rint(o.o_totalprice.to_numpy(np.float64) * 100) \
        .astype(np.int64)

    detail = o.groupby(["o_orderpriority", "o_orderstatus"])["c"] \
        .agg(["sum", "size"])
    by_p = o.groupby("o_orderpriority")["c"].agg(["sum", "size"])
    by_s = o.groupby("o_orderstatus")["c"].agg(["sum", "size"])
    assert len(out) == len(detail) + len(by_p) + len(by_s)
    assert set(out.gid) == {0, 1, 2}
    g1 = out[out.gid == 1].set_index("o_orderpriority")
    for k, r in by_p.iterrows():
        assert g1.loc[k, "revenue_c"] == r["sum"]
        assert g1.loc[k, "n_orders"] == r["size"]
        assert g1.loc[k, "o_orderstatus"] == "ALL"
    g2 = out[out.gid == 2].set_index("o_orderstatus")
    for k, r in by_s.iterrows():
        assert g2.loc[k, "revenue_c"] == r["sum"]
    g0 = out[out.gid == 0].set_index(["o_orderpriority", "o_orderstatus"])
    for k, r in detail.iterrows():
        assert g0.loc[k, "revenue_c"] == r["sum"]


def test_lang_eval_brute(ray_session):
    """P/R/F1 and kappa match a driver recompute from the raw
    confusion counts, and kappa's rational is in [-1, 1]."""
    import ray.data as rd
    from rendler_ray.functions import text as F_text
    from rendler_ray.pipelines.queries import (kappa_lang_eval,
                                               prf1_lang_eval)

    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text", "lang"])
    pred = F_text.lang_id_batch(docs)
    conf = pd.DataFrame({
        "t": pred["lang"].to_numpy(zero_copy_only=False),
        "p": pred["lang_pred"].to_numpy(zero_copy_only=False)}) \
        .groupby(["t", "p"]).size()

    out = prf1_lang_eval(SF).to_pandas().set_index("lang")
    classes = sorted({t for t, _ in conf.index} | {p for _, p in conf.index})
    assert sorted(out.index) == classes
    for c in classes:
        n_true = int(conf[conf.index.get_level_values("t") == c].sum())
        n_pred = int(conf[conf.index.get_level_values("p") == c].sum())
        n_corr = int(conf.get((c, c), 0))
        r = out.loc[c]
        assert r.n_true == n_true and r.n_pred == n_pred \
            and r.n_correct == n_corr
        if n_pred:
            assert r.prec_e6 == 10**6 * n_corr // n_pred
        else:
            assert r.prec_e6 == -1
        if n_true:
            assert r.rec_e6 == 10**6 * n_corr // n_true
        else:
            assert r.rec_e6 == -1
    # the eval must be non-degenerate: some agreement, some confusion
    assert (out.n_correct > 0).any()
    assert out.n_correct.sum() < out.n_true.sum()

    k = kappa_lang_eval(SF).to_pandas().iloc[0]
    n = int(conf.sum())
    agree = sum(int(conf.get((c, c), 0)) for c in classes)
    pe = sum(int(conf[conf.index.get_level_values("t") == c].sum())
             * int(conf[conf.index.get_level_values("p") == c].sum())
             for c in classes)
    assert k.n == n and k.n_agree == agree
    assert k.kappa_num == n * agree - pe
    assert k.kappa_den == n * n - pe
    assert -k.kappa_den <= k.kappa_num <= k.kappa_den


def test_event_anomaly_brute(ray_session):
    """Flagged buckets match a pure-pandas recompute of the exact
    integer z-squared test, and the screen is non-degenerate."""
    from rendler_ray.pipelines.queries import event_anomaly_hours

    out = event_anomaly_hours(SF).to_pandas() \
        .sort_values("bucket_epoch").reset_index(drop=True)

    ev = _events()
    b = (ev.ts.astype("int64") // 10**6 // 3600).to_numpy()
    bc = pd.Series(b).value_counts().sort_index()
    df = pd.DataFrame({"bucket": bc.index, "c": bc.to_numpy()})
    df["how"] = ((df.bucket // 24 + 4) % 7) * 24 + df.bucket % 24
    g = df.groupby("how")["c"].agg(nh="size", s="sum",
                                   q=lambda x: int((x**2).sum()))
    j = df.join(g, on="how")
    lhs = (j.c * j.nh - j.s).astype(object) ** 2
    rhs = 2 * (j.nh * j.q - j.s.astype(object) ** 2)
    want = j[lhs > rhs]
    assert 0 < len(want) < len(df)
    assert list(out.bucket_epoch) == sorted(want.bucket * 3600)
    got = out.set_index("bucket_epoch")
    for _, r in want.iterrows():
        assert got.loc[r.bucket * 3600, "n_events"] == r.c
        assert got.loc[r.bucket * 3600, "how"] == r.how
    # the statistic is bounded by nh-1 when the point is in its own
    # cohort -- the documented reason the default threshold is 2
    z2_max = ((j.c * j.nh - j.s).astype(object) ** 2
              / (j.nh * j.q - j.s.astype(object) ** 2).replace(0, 1))
    assert (z2_max <= (j.nh - 1)).all()


def test_knn_outlier_brute(ray_session):
    """Top-20 kNN-distance outliers match a full O(n^2) numpy brute
    force including the (sum asc, vec_id asc) tie rule."""
    from rendler_ray.pipelines.queries import knn_outlier_docs

    out = knn_outlier_docs(SF).to_pandas()

    emb = pq.read_table(os.path.join(SF, "embeddings.parquet"),
                        columns=["vec_id", "embedding"]).to_pandas()
    m = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, -2.0)  # below any cosine; keeps the cast finite
    ids = emb.vec_id.to_numpy(np.int64)
    rows = []
    for i in range(len(ids)):
        se6 = np.rint(sims[i] * 1_000_000).astype(np.int64)
        # top-4 by (sim desc, nbr_id asc)
        order = np.lexsort((ids, -se6))
        order = order[order != i][:4]
        rows.append((ids[i], int(se6[order].sum())))
    want = pd.DataFrame(rows, columns=["vec_id", "knn_sim_sum_e6"]) \
        .sort_values(["knn_sim_sum_e6", "vec_id"]).head(20) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want)


def test_bloom_index_prunes(ray_session):
    """The absent query token reads ZERO files (every shard's bloom
    rejects it), present tokens return exactly the brute-force match
    set, and at least one file is actually skipped overall."""
    from rendler_ray.pipelines.queries import (_BLOOM_QUERY_TOKENS,
                                               _bloom_token_search)

    out, stats = _bloom_token_search(SF)
    df = out.to_pandas()  # Dataset and pa.Table both support this

    assert stats["surviving_shards"]["gradientzzz"] == 0
    assert stats["files_read"] < stats["files_total"] * \
        len(_BLOOM_QUERY_TOKENS)

    docs = _docs_tokens()
    for tok in _BLOOM_QUERY_TOKENS:
        want = {i for i, toks in docs.items() if tok in toks}
        got = set(df[df.token == tok].doc_id)
        assert got == want


def _docs_tokens():
    t = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "text"]).to_pandas()
    return {int(r.doc_id): set(r.text.split(" "))
            for r in t.itertuples()}


def test_phrase_search_brute(ray_session):
    """Adjacency counts match a per-doc token scan, and at least one
    doc has multiple occurrences (the count is exercised)."""
    from rendler_ray.pipelines.queries import (_PHRASE_QUERY,
                                               phrase_search_docs)

    out = phrase_search_docs(SF).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    t = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "text"]).to_pandas()
    t1, t2 = _PHRASE_QUERY
    want = []
    for r in t.itertuples():
        toks = r.text.split(" ")
        n = sum(1 for i in range(len(toks) - 1)
                if toks[i] == t1 and toks[i + 1] == t2)
        if n:
            want.append((int(r.doc_id), n))
    want = pd.DataFrame(want, columns=["doc_id", "n_occ"]) \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(want) > 0
    pd.testing.assert_frame_equal(out.astype("int64"),
                                  want.astype("int64"))


def test_matryoshka_brute(ray_session):
    """Per-(dim, query) overlap matches a numpy brute force with the
    same tie rule, the full dim recalls itself perfectly, and the
    ablation is non-trivial (some smaller dim loses a neighbor)."""
    from rendler_ray.pipelines.queries import (_MRL_DIMS,
                                               matryoshka_recall_eval)

    out = matryoshka_recall_eval(SF).to_pandas() \
        .set_index(["dim", "query_id"]).sort_index()

    emb = pq.read_table(os.path.join(SF, "embeddings.parquet"),
                        columns=["vec_id", "embedding"]).to_pandas()
    ids = emb.vec_id.to_numpy(np.int64)
    m = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    qids = sorted(ids[ids < 4])
    tops = {}
    for d in _MRL_DIMS:
        a = m[:, :d] / np.linalg.norm(m[:, :d], axis=1, keepdims=True)
        for q in qids:
            qv = a[ids == q][0]
            s = np.rint(a @ qv * 1_000_000).astype(np.int64)
            keep = ids != q
            order = np.lexsort((ids[keep], -s[keep]))[:4]
            tops[(d, q)] = set(ids[keep][order])
    full_d = max(_MRL_DIMS)
    for d in _MRL_DIMS:
        for q in qids:
            n = len(tops[(d, q)] & tops[(full_d, q)])
            assert out.loc[(d, q), "n_overlap"] == n
            assert out.loc[(d, q), "recall_e6"] == 10**6 * n // 4
    assert (out.loc[full_d]["n_overlap"] == 4).all()
    assert (out["n_overlap"] < 4).any()


def test_dq_audit_brute(ray_session):
    """Every rule's violation count matches pandas, and the rule set
    covers both tables."""
    from rendler_ray.pipelines.queries import dq_constraint_audit

    out = dq_constraint_audit(SF).to_pandas().set_index("rule")
    o = pq.read_table(os.path.join(SF, "orders.parquet")).to_pandas()
    ev = _events()
    assert out.loc["orders.o_orderkey unique", "n_violations"] == \
        len(o) - o.o_orderkey.nunique()
    assert out.loc["orders.o_custkey not_null", "n_violations"] == \
        o.o_custkey.isna().sum()
    assert out.loc["orders.o_totalprice positive", "n_violations"] == \
        int((~(o.o_totalprice > 0)).sum())
    assert out.loc["events.event_type accepted_values",
                   "n_violations"] == int((~ev.event_type.isin(
                       ["view", "click", "purchase", "signup",
                        "refund"])).sum())
    assert out.loc["events.value non_negative", "n_violations"] == \
        int((ev.value < 0).sum())
    assert (out.n_rows.loc[lambda s: s.index.str.startswith("orders")]
            == len(o)).all()
    assert (out.n_rows.loc[lambda s: s.index.str.startswith("events")]
            == len(ev)).all()


def test_association_rules_brute(ray_session):
    """Pair supports and exact lift rationals match a pandas brute
    force over user baskets."""
    from rendler_ray.pipelines.queries import association_rules_types

    out = association_rules_types(SF).to_pandas() \
        .sort_values(["type_a", "type_b"]).reset_index(drop=True)

    ev = _events()
    ev["day"] = ev.ts.astype("int64") // 10**6 // 86400
    ut = ev[["user_id", "day", "event_type"]].drop_duplicates()
    n_baskets = len(ut[["user_id", "day"]].drop_duplicates())
    cnt = ut.groupby("event_type").size()
    baskets = ut.groupby(["user_id", "day"])["event_type"].agg(set)
    types = sorted(cnt.index)
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            both = int(sum(1 for bs in baskets if a in bs and b in bs))
            if both:
                rows.append((a, b, int(cnt[a]), int(cnt[b]), both,
                             n_baskets, both * n_baskets,
                             int(cnt[a]) * int(cnt[b])))
    want = pd.DataFrame(rows, columns=[
        "type_a", "type_b", "n_a", "n_b", "n_both", "n_baskets",
        "lift_num", "lift_den"]).sort_values(["type_a", "type_b"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want)
    # lift must be non-trivial somewhere (not exactly 1)
    assert (want.lift_num != want.lift_den).any()


def test_trigram_seq_brute(ray_session):
    """Top-10 event-type trigrams match a pandas recompute including
    the (n desc, trigram asc) tie rule."""
    from rendler_ray.pipelines.queries import event_type_trigrams_top

    out = event_type_trigrams_top(SF).to_pandas().reset_index(drop=True)

    ev = _events().sort_values(["user_id", "ts", "event_id"],
                               kind="stable")
    tris = {}
    for _, g in ev.groupby("user_id"):
        et = g.event_type.to_list()
        for i in range(len(et) - 2):
            k = f"{et[i]}>{et[i+1]}>{et[i+2]}"
            tris[k] = tris.get(k, 0) + 1
    want = pd.DataFrame(sorted(tris.items(),
                               key=lambda kv: (-kv[1], kv[0]))[:10],
                        columns=["trigram", "n"])
    want["n"] = want.n.astype("int64")
    pd.testing.assert_frame_equal(out, want)


def test_sample_bias_brute(ray_session):
    """Per-source chi2 cells match an arbitrary-precision recompute,
    and the audit is non-degenerate (nonzero cells exist)."""
    import hashlib

    from rendler_ray.pipelines.queries import sample_bias_chi2

    out = sample_bias_chi2(SF).to_pandas().set_index("source")

    d = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "source"]).to_pandas()
    d["samp"] = [hashlib.md5(f"{i}-s1".encode()).hexdigest()[:2] < "1a"
                 for i in d.doc_id]
    N = len(d)
    n = int(d.samp.sum())
    for s, g in d.groupby("source"):
        c, o = len(g), int(g.samp.sum())
        assert out.loc[s, "n_corpus"] == c
        assert out.loc[s, "n_sample"] == o
        assert out.loc[s, "chi2_e6"] == \
            10**6 * (o * N - n * c) ** 2 // (N * n * c)
    assert (out.chi2_e6 > 0).any()


def test_winnow_pairs_brute(ray_session):
    """Copy pairs match a driver brute force over the same df-capped
    fingerprint postings, and pairs exist at this sf."""
    from collections import defaultdict

    from rendler_ray.functions.text import rolling_hash_fingerprint
    from rendler_ray.pipelines.queries import winnow_copy_pairs

    out = winnow_copy_pairs(SF).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)

    t = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "text"]).to_pandas()
    bucket = defaultdict(set)
    for r in t.itertuples():
        for fp in set(rolling_hash_fingerprint(r.text).split("-")):
            bucket[fp].add(int(r.doc_id))
    pairs = defaultdict(int)
    for docs in bucket.values():
        if not 2 <= len(docs) <= 20:
            continue
        ds = sorted(docs)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pairs[(ds[i], ds[j])] += 1
    want = pd.DataFrame(
        [(a, b, n) for (a, b), n in sorted(pairs.items()) if n >= 2],
        columns=["a", "b", "n_shared"])
    assert len(want) > 0
    pd.testing.assert_frame_equal(out.astype("int64"),
                                  want.astype("int64"))


def test_quantile_normalize_brute(ray_session):
    """qn values match the exact integer position formula, and after
    normalization any two sources of equal size have identical value
    multisets (the defining property)."""
    from rendler_ray.pipelines.queries import quantile_normalize_chars

    out = quantile_normalize_chars(SF).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    d = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "source", "n_chars"]).to_pandas()
    N = len(d)
    gvals = d.sort_values(["n_chars", "doc_id"]).n_chars.to_numpy()
    want = {}
    for _, g in d.groupby("source"):
        g = g.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        ns = len(g)
        for rk0, r in enumerate(g.itertuples()):
            pos = rk0 * (N - 1) // (ns - 1) if ns > 1 else (N - 1) // 2
            want[int(r.doc_id)] = int(gvals[pos])
    assert len(out) == N
    for r in out.itertuples():
        assert r.qn_chars == want[int(r.doc_id)]
    # defining property: equal-size sources get identical multisets
    sizes = d.groupby("source").size()
    same = sizes[sizes == sizes.iloc[0]]
    if len(same) >= 2:
        a, b = same.index[:2]
        ma = sorted(out[out.source == a].qn_chars)
        mb = sorted(out[out.source == b].qn_chars)
        assert ma == mb
    # and it's a real transform (some value changed)
    assert (out.qn_chars != out.n_chars).any()


def test_twap_brute(ray_session):
    """Per-user TWAP rationals match a pandas recompute, and TWAP
    differs from the plain mean for at least one user."""
    from rendler_ray.pipelines.queries import twap_value_by_user

    out = twap_value_by_user(SF).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)

    ev = _events().sort_values(["user_id", "ts", "event_id"],
                               kind="stable")
    rows = []
    diff_seen = False
    for u, g in ev.groupby("user_id"):
        us = g.ts.to_numpy("datetime64[us]").astype(np.int64)
        c = np.rint(g.value.to_numpy(np.float64) * 100).astype(np.int64)
        num = int(np.dot(c[:-1].astype(object), np.diff(us))) \
            if len(us) > 1 else 0
        den = int(us[-1] - us[0])
        rows.append((u, num, den))
        if den and abs(num / den - c.mean()) > 1e-9:
            diff_seen = True
    want = pd.DataFrame(rows, columns=["user_id", "twap_num_c_us",
                                       "twap_den_us"])
    pd.testing.assert_frame_equal(out.astype("int64"),
                                  want.astype("int64"))
    assert diff_seen


def test_random_walks_two_forms_and_validity(ray_session):
    """The forced-distributed indexed-adjacency walk equals the driver
    fold bit-for-bit, and every hop follows a real graph edge chosen
    by the documented hash rule."""
    from rendler_ray.pipelines.queries import (_orders_graph_edges,
                                               _walk_hash,
                                               random_walks_crawl)

    drv = random_walks_crawl(SF).to_pandas() \
        .sort_values(["start", "step"]).reset_index(drop=True)
    dist = random_walks_crawl(SF, driver_max=0).to_pandas() \
        .sort_values(["start", "step"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(drv, dist)

    e = _orders_graph_edges(SF).to_pandas()
    adj = {}
    for r in e.itertuples():
        adj.setdefault(int(r.a), []).append(int(r.b))
        adj.setdefault(int(r.b), []).append(int(r.a))
    for u in adj:
        adj[u].sort()
    assert len(drv) > 0
    for s, g in drv.groupby("start"):
        g = g.sort_values("step")
        assert list(g.step) == list(range(len(g)))
        node = int(g.iloc[0].node)
        assert node == s
        for t in range(1, len(g)):
            nbrs = adj[node]
            want = nbrs[_walk_hash(int(s), t - 1, node) % len(nbrs)]
            node = int(g.iloc[t].node)
            assert node == want


def test_concurrent_sessions_brute(ray_session):
    """Top-10 concurrency moments match a single-process sweep, and
    real overlap exists (peak > 1)."""
    from rendler_ray.pipelines.queries import concurrent_sessions_peak

    out = concurrent_sessions_peak(SF).to_pandas()

    ev = _events().sort_values(["user_id", "ts", "event_id"],
                               kind="stable")
    bounds = []
    for u, g in ev.groupby("user_id"):
        ts = g.ts.to_numpy("datetime64[us]").astype(np.int64)
        new = np.ones(len(ts), bool)
        new[1:] = np.diff(ts) > 30 * 60 * 10**6
        sid = np.cumsum(new)
        for i in pd.Series(sid).unique():
            seg = ts[sid == i]
            bounds.append((int(seg.min()), 1, int(u)))
            bounds.append((int(seg.max()), -1, int(u)))
    bounds.sort(key=lambda r: (r[0], -r[1], r[2]))
    lvl = 0
    rows = []
    for t, d, u in bounds:
        lvl += d
        rows.append((lvl, t, u))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    want = pd.DataFrame([(t, u, l) for l, t, u in rows[:10]],
                        columns=["epoch_us", "user_id", "level"])
    assert want.level.iloc[0] > 1
    pd.testing.assert_frame_equal(out.astype("int64"),
                                  want.astype("int64"))


def test_relational_division_brute(ray_session):
    """Division result matches pandas, is non-degenerate (some
    customers qualify, some don't)."""
    from rendler_ray.pipelines.queries import customers_all_priorities

    out = sorted(customers_all_priorities(SF).to_pandas().o_custkey)
    o = pq.read_table(os.path.join(SF, "orders.parquet"),
                      columns=["o_custkey", "o_orderpriority"]).to_pandas()
    total = o.o_orderpriority.nunique()
    per = o.groupby("o_custkey")["o_orderpriority"].nunique()
    want = sorted(per[per == total].index)
    assert 0 < len(want) < o.o_custkey.nunique()
    assert out == want


def test_dup_weight_brute(ray_session):
    """Group sizes match pandas at sf0.001 and the annotation is
    non-degenerate at sf0.1 (real duplicate groups exist there)."""
    from rendler_ray.pipelines.queries import dup_weight_docs

    out = dup_weight_docs(SF).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    d = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "text"]).to_pandas()
    want = d.text.map(d.text.value_counts()).to_numpy(np.int64)
    d2 = d.sort_values("doc_id")
    assert (out.dup_group_n.to_numpy()
            == d2.text.map(d.text.value_counts()).to_numpy(np.int64)).all()

    big = dup_weight_docs("/root/testdata/sf0.1").to_pandas()
    assert (big.dup_group_n > 1).any()


def test_markov_eval_brute(ray_session):
    """Per-from-type accuracy matches a pandas recompute of the
    identical split/fit/argmax/eval rules, and accuracy is
    non-degenerate (neither all-0 nor all-perfect)."""
    from rendler_ray.pipelines.queries import markov_next_type_eval

    out = markov_next_type_eval(SF).to_pandas().set_index("from_type")

    ev = _events().sort_values(["user_id", "ts", "event_id"],
                               kind="stable")

    def fold(parity):
        c = {}
        for _, g in ev[ev.event_id % 2 == parity].groupby("user_id"):
            et = g.event_type.to_list()
            for a, b in zip(et, et[1:]):
                c[(a, b)] = c.get((a, b), 0) + 1
        return c

    train, test = fold(0), fold(1)
    pred = {}
    for (f, t), n in sorted(train.items()):
        if f not in pred or n > train[(f, pred[f])]:
            pred[f] = t
    accs = []
    for f in sorted({f for f, _ in test} & set(pred)):
        nt = sum(n for (ff, _), n in test.items() if ff == f)
        nc = test.get((f, pred[f]), 0)
        assert out.loc[f, "pred_type"] == pred[f]
        assert out.loc[f, "n_correct"] == nc
        assert out.loc[f, "n_total"] == nt
        assert out.loc[f, "acc_e6"] == 10**6 * nc // nt
        accs.append(nc / nt)
    assert len(accs) > 0
    assert any(a > 0 for a in accs) and any(a < 1 for a in accs)


def test_psi_brute(ray_session):
    """Per-bucket counts and e6 PSI terms match a numpy recompute of
    the identical smoothing/expression, and the drift is non-trivial
    (some nonzero term)."""
    from rendler_ray.functions import text as F_text  # noqa: F401
    from rendler_ray.pipelines.queries import (_clf_weights,
                                               psi_score_halves)

    out = psi_score_halves(SF).to_pandas().set_index("bucket")

    d = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "text"]).to_pandas()
    scores = []
    for r in d.itertuples():
        toks = np.array(r.text.split(" "), dtype=object)
        scores.append(int(np.rint(_clf_weights(toks).sum())))
    s = np.array(scores, np.int64)
    par = d.doc_id.to_numpy(np.int64) % 2
    lo, hi = int(s.min()), int(s.max())
    width = max(hi - lo + 1, 1)
    b = (s - lo) * 10 // width
    ca = np.bincount(b[par == 0], minlength=10).astype(np.int64)
    cb = np.bincount(b[par == 1], minlength=10).astype(np.int64)
    p = (ca + 1.0) / (ca.sum() + 10)
    q = (cb + 1.0) / (cb.sum() + 10)
    term = np.rint((p - q) * np.log(p / q) * 1_000_000).astype(np.int64)
    assert (out.n_even.to_numpy() == ca).all()
    assert (out.n_odd.to_numpy() == cb).all()
    assert (out.psi_term_e6.to_numpy() == term).all()
    assert (term != 0).any()
    # PSI total is non-negative by construction (each term is)
    assert out.psi_term_e6.sum() >= 0


def test_monthly_growth_brute(ray_session):
    """Deltas reproduce pandas diffs with the first-month-0 rule."""
    from rendler_ray.pipelines.queries import monthly_revenue_growth

    out = monthly_revenue_growth(SF).to_pandas()
    o = pq.read_table(os.path.join(SF, "orders.parquet"),
                      columns=["o_orderdate", "o_totalprice"]).to_pandas()
    o["m"] = o.o_orderdate.to_numpy("datetime64[M]").astype(np.int64)
    o["c"] = np.rint(o.o_totalprice.to_numpy(np.float64) * 100) \
        .astype(np.int64)
    g = o.groupby("m")["c"].sum().sort_index()
    assert list(out.month) == list(g.index)
    assert list(out.revenue_c) == list(g.to_numpy())
    prev = np.concatenate([[0], g.to_numpy()[:-1]])
    assert (out.prev_revenue_c.to_numpy() == prev).all()
    assert (out.delta_c.to_numpy() == g.to_numpy() - prev).all()


def test_budget_audit_invariants(ray_session):
    """No (round, host) cell exceeds the budget, the budget BINDS
    somewhere (some cell == budget), and over-budget hosts drain into
    later rounds (a host appears in >1 round)."""
    from rendler_ray.pipelines.queries import crawl_host_budget_audit

    out = crawl_host_budget_audit(SF, budget=10).to_pandas()
    assert (out.n_fetched <= 10).all()
    assert (out.n_fetched == 10).any()
    assert out.groupby("host")["round"].nunique().max() > 1
    # audit totals must equal the crawl's fetched pages
    from rendler_ray.pipelines.queries import _synth_docs_for
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(SF),
                            seeds=default_seeds(1), max_depth=3,
                            host_budget_per_round=10))
    assert out.n_fetched.sum() == res.pages_fetched


def test_depth_histogram_invariants(ray_session):
    """Depth 0 is exactly the seed, depths are contiguous, totals
    match the flagship crawl, and fan-out actually grows somewhere."""
    from rendler_ray.pipelines.queries import (_synth_docs_for,
                                               crawl_depth_histogram)
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    out = crawl_depth_histogram(SF).to_pandas()
    assert list(out.depth) == list(range(len(out)))
    assert out.n_pages.iloc[0] == 1 and out.n_hosts.iloc[0] == 1
    assert (out.n_pages.diff().dropna() > 0).any()
    res = crawl(CrawlConfig(docs_path=_synth_docs_for(SF),
                            seeds=default_seeds(1), max_depth=4))
    assert out.n_pages.sum() == res.pages_fetched


def test_cusum_brute(ray_session):
    """Flagged days match an arbitrary-precision recompute, the
    running deviation sums to zero over the full window, and the
    monitor is non-degenerate."""
    from rendler_ray.pipelines.queries import cusum_changepoint_days

    out = cusum_changepoint_days(SF).to_pandas() \
        .sort_values("day_epoch").reset_index(drop=True)

    ev = _events()
    d = (ev.ts.astype("int64") // 10**6 // 86400).value_counts() \
        .sort_index()
    n = len(d)
    s = int(d.sum())
    q = int((d.astype(object) ** 2).sum())
    var_e = n * q - s * s
    cu = 0
    want = []
    total = 0
    for i, (day, c) in enumerate(d.items(), start=1):
        cu += n * int(c) - s
        total = cu
        if cu * cu > i * var_e:
            want.append((day * 86400, int(c), cu))
    assert total == 0  # deviations sum to zero by construction
    assert 0 < len(want) < n
    wantdf = pd.DataFrame(want, columns=["day_epoch", "n_events",
                                         "cusum_scaled"])
    pd.testing.assert_frame_equal(out.astype("int64"),
                                  wantdf.astype("int64"))


def test_dataset_card_brute(ray_session):
    """Every headline metric matches a pandas recompute."""
    from rendler_ray.pipelines.queries import dataset_card_report

    out = dataset_card_report(SF).to_pandas().set_index("metric")
    d = pq.read_table(os.path.join(SF, "documents.parquet")).to_pandas()
    toks = d.text.str.split(" ")
    assert out.loc["n_docs", "value"] == len(d)
    assert out.loc["n_tokens", "value"] == int(toks.map(len).sum())
    assert out.loc["n_chars", "value"] == int(d.n_chars.sum())
    assert out.loc["vocab_size", "value"] == \
        len(set().union(*toks.to_list()))
    assert out.loc["n_sources", "value"] == d.source.nunique()
    assert out.loc["n_langs", "value"] == d.lang.nunique()
    assert out.loc["n_dup_docs", "value"] == \
        len(d) - d.text.nunique()


def test_autocorr_brute(ray_session):
    """The exact rational matches an arbitrary-precision recompute
    and |r| <= 1 by Cauchy-Schwarz."""
    from rendler_ray.pipelines.queries import autocorr_daily_counts

    out = autocorr_daily_counts(SF).to_pandas().iloc[0]
    ev = _events()
    d = (ev.ts.astype("int64") // 10**6 // 86400).value_counts() \
        .sort_index()
    n = len(d)
    s = int(d.sum())
    e = [n * int(c) - s for c in d]
    assert out.n_days == n
    assert out.acf1_num == sum(a * b for a, b in zip(e, e[1:]))
    assert out.acf1_den == sum(a * a for a in e)
    assert abs(out.acf1_num) <= out.acf1_den


def test_kl_unigram_brute(ray_session):
    """Per-source KL matches a numpy recompute of the identical
    expression tree, is >= 0 for every source up to the e6 rounding
    grain, and at least one source genuinely diverges."""
    from rendler_ray.pipelines.queries import kl_unigram_by_source

    out = kl_unigram_by_source(SF).to_pandas().set_index("source")
    d = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["source", "text"]).to_pandas()
    st = {}
    for r in d.itertuples():
        for tok in r.text.split(" "):
            st[(r.source, tok)] = st.get((r.source, tok), 0) + 1
    gtok = {}
    ns = {}
    for (s_, tok), c in st.items():
        gtok[tok] = gtok.get(tok, 0) + c
        ns[s_] = ns.get(s_, 0) + c
    n = sum(gtok.values())
    kl = {s_: 0 for s_ in ns}
    for (s_, tok), c in st.items():
        p = c / ns[s_]
        kl[s_] += int(np.rint(
            p * np.log((c * n) / (ns[s_] * gtok[tok])) * 10**6))
    for s_ in ns:
        assert out.loc[s_, "n_tokens"] == ns[s_]
        assert out.loc[s_, "kl_e6"] == kl[s_]
        # KL >= 0 up to the per-term rounding grain (#terms ulps)
        assert out.loc[s_, "kl_e6"] >= -len(gtok)
    assert (out.kl_e6 > 0).any()


def test_diameter_brute(ray_session):
    """The double-sweep bound matches a networkx-free brute force:
    ecc(far) from the op equals the true eccentricity of the sweep's
    far node, and it lower-bounds the exact diameter of the seed
    component (computed by all-pairs BFS, feasible at sf0.001)."""
    from collections import deque

    from rendler_ray.pipelines.queries import (_orders_graph_edges,
                                               graph_diameter_bound)

    out = graph_diameter_bound(SF).to_pandas().iloc[0]
    e = _orders_graph_edges(SF).to_pandas()
    adj = {}
    for r in e.itertuples():
        adj.setdefault(int(r.a), set()).add(int(r.b))
        adj.setdefault(int(r.b), set()).add(int(r.a))

    def bfs(src):
        dist = {src: 0}
        q = deque([src])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return dist

    d1 = bfs(1)
    ecc = max(d1.values())
    far = min(n for n, d in d1.items() if d == ecc)
    assert out.ecc_seed == ecc and out.far_node == far
    assert out.diameter_lb == max(bfs(far).values())
    comp = list(d1)
    true_diam = max(max(bfs(s).values()) for s in comp)
    assert out.diameter_lb <= true_diam
    assert out.diameter_lb >= ecc  # sweep can only improve the bound


def test_km_brute(ray_session):
    """Risk table matches a pandas recompute, censoring is REAL (the
    48 h window leaves both classes non-empty), and the risk set is
    monotonically non-increasing in time."""
    from rendler_ray.pipelines.queries import km_survival_curve

    out = km_survival_curve(SF).to_pandas()

    ev = _events().sort_values(["user_id", "ts", "event_id"],
                               kind="stable")
    win = 48 * 3_600_000_000
    obs = []
    for u, g in ev.groupby("user_id"):
        us = g.ts.to_numpy("datetime64[us]").astype(np.int64)
        et = g.event_type.to_numpy()
        views = us[et == "view"]
        if not len(views):
            continue
        v0 = views[0]
        purch = us[(et == "purchase") & (us >= v0) & (us < v0 + win)]
        if len(purch):
            obs.append(((purch[0] - v0) // 3_600_000_000, 1))
        else:
            obs.append((48, 0))
    df = pd.DataFrame(obs, columns=["t", "ev"])
    assert (df.ev == 0).any() and (df.ev == 1).any()  # censoring real
    g = df.groupby("t").agg(c=("ev", "size"), d=("ev", "sum")) \
        .sort_index(ascending=False)
    g["n_risk"] = g.c.cumsum()
    g = g.sort_index()
    want = g[g.d > 0].reset_index()
    assert list(out.t_hours) == list(want.t)
    assert list(out.n_risk) == list(want.n_risk)
    assert list(out.n_events) == list(want.d)
    assert (out.n_risk.diff().dropna() <= 0).all()


def test_feature_hash_brute(ray_session):
    """Bucket counts match a driver recompute, every doc's bucket sum
    equals its token count, and collisions actually occur (the trick's
    defining property at 64 buckets over the corpus vocab)."""
    import hashlib

    from rendler_ray.pipelines.queries import feature_hash_docs

    out = feature_hash_docs(SF).to_pandas()
    d = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "text"]).to_pandas()
    vocab = set()
    want = {}
    for r in d.itertuples():
        toks = r.text.split(" ")
        vocab.update(toks)
        for tok in toks:
            b = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 64
            want[(int(r.doc_id), b)] = want.get((int(r.doc_id), b), 0) + 1
    got = {(int(r.doc_id), int(r.bucket)): int(r.n)
           for r in out.itertuples()}
    assert got == want
    tok_sums = out.groupby("doc_id")["n"].sum()
    assert (tok_sums == d.set_index("doc_id").text.str.split(" ")
            .map(len)).all()
    n_used = len({int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 64
                  for t in vocab})
    assert n_used < len(vocab) or n_used <= 64


def test_quality_sweep_brute(ray_session):
    """Each percentile row matches a brute-force sort + filter, kept
    counts are monotonically non-increasing in the percentile, and
    thresholds are order statistics of the real score distribution."""
    from rendler_ray.pipelines.queries import (_clf_weights,
                                               quality_threshold_sweep)

    out = quality_threshold_sweep(SF).to_pandas().set_index("pctl")

    d = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "text"]).to_pandas()
    scores, ntok = [], []
    for r in d.itertuples():
        toks = np.array(r.text.split(" "), dtype=object)
        scores.append(int(np.rint(_clf_weights(toks).sum())))
        ntok.append(len(toks))
    df = pd.DataFrame({"doc_id": d.doc_id, "s": scores, "nt": ntok}) \
        .sort_values(["s", "doc_id"]).reset_index(drop=True)
    n = len(df)
    for p in range(10, 100, 10):
        thr = int(df.s.iloc[p * (n - 1) // 100])
        kept = df[df.s >= thr]
        assert out.loc[p, "threshold"] == thr
        assert out.loc[p, "n_docs_kept"] == len(kept)
        assert out.loc[p, "n_tokens_kept"] == int(kept.nt.sum())
    assert (out.n_docs_kept.diff().dropna() <= 0).all()
