"""Round-4h op families: χ² feature selection, exact AUC eval,
zone-map file pruning, bucketed-layout join, PMI collocations,
Adamic-Adar link prediction."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _docs() -> pd.DataFrame:
    return pq.read_table(os.path.join(SF, "documents.parquet")).to_pandas()


def test_chi2_token_lang_brute(ray_session):
    """Exact χ² against a pure-pandas doc-presence brute force."""
    from rendler_ray.pipelines.queries import chi2_token_lang

    out = chi2_token_lang(SF).to_pandas()

    docs = _docs()
    toks = docs["text"].str.split(" ")
    freq = pd.Series(np.concatenate(toks.to_numpy())).value_counts()
    fdf = freq.rename_axis("t").reset_index(name="c") \
        .sort_values(["c", "t"], ascending=[False, True])
    vocab = set(fdf["t"].head(500))
    n = len(docs)
    pres = {}   # (lang, token) -> a
    ttot = {}
    ltot = docs["lang"].value_counts().to_dict()
    for lang, ts in zip(docs["lang"], toks):
        for tok in set(ts) & vocab:
            pres[(lang, tok)] = pres.get((lang, tok), 0) + 1
            ttot[tok] = ttot.get(tok, 0) + 1
    rows = []
    for (lang, tok), a in pres.items():
        ab, ac = ttot[tok], ltot[lang]
        if ab >= n:
            continue
        b, c = ab - a, ac - a
        d = n - ab - ac + a
        chi = (n * (a * d - b * c) ** 2 * 10 ** 6) // (
            ab * (n - ab) * ac * (n - ac))
        rows.append((lang, tok, chi))
    brute = pd.DataFrame(rows, columns=["lang", "token", "chi2_e6"])
    brute = brute.sort_values(["lang", "chi2_e6", "token"],
                              ascending=[True, False, True]) \
        .groupby("lang").head(20)

    a = out.sort_values(["lang", "token"]).reset_index(drop=True)
    b = brute.sort_values(["lang", "token"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_auc_quality_eval_brute(ray_session):
    """Exact AUC against an all-pairs Mann-Whitney brute force."""
    from rendler_ray.pipelines.queries import _clf_weights, auc_quality_eval

    out = auc_quality_eval(SF).to_pandas().iloc[0]

    docs = _docs()
    scores = []
    for text in docs["text"]:
        toks = np.array(text.split(" "), dtype=object)
        scores.append(int(np.rint(_clf_weights(toks).sum())))
    s = np.array(scores, np.int64)
    pos = (docs["lang"] == "en").to_numpy()
    ps, ns = s[pos], s[~pos]
    # 2U = 2*#(pos>neg) + #(pos==neg)
    u2 = int(2 * (ps[:, None] > ns[None, :]).sum()
             + (ps[:, None] == ns[None, :]).sum())
    assert out["n_pos"] == len(ps) and out["n_neg"] == len(ns)
    assert out["auc_e6"] == (10 ** 6 * u2) // (2 * len(ps) * len(ns))
    assert 0 <= out["auc_e6"] <= 10 ** 6


def test_zonemap_actually_prunes(ray_session):
    """The middle-decile range query must SKIP most files of the
    sorted layout, and the pruned read must equal the full scan."""
    from rendler_ray.pipelines.queries import _zonemap_layout

    sf = "/root/testdata/sf0.01"
    out, zmap = _zonemap_layout(sf)
    assert len(zmap) >= 8  # layout actually split into many files
    tmin = min(lo for lo, _ in zmap.values())
    tmax = max(hi for _, hi in zmap.values())
    lo = tmin + (tmax - tmin) * 45 // 100
    hi = tmin + (tmax - tmin) * 55 // 100
    hit = [p for p, (a, b) in zmap.items() if not (b < lo or a > hi)]
    # a ~10% window of a sorted layout touches a small minority of files
    assert 0 < len(hit) <= max(2, len(zmap) // 3)
    # pruned-file union == exact full-scan filter
    full = pq.read_table(out).to_pandas()
    want = full[(full["ts_us"] >= lo) & (full["ts_us"] <= hi)]
    got = pd.concat([pq.read_table(p).to_pandas() for p in hit])
    got = got[(got["ts_us"] >= lo) & (got["ts_us"] <= hi)]
    assert len(got) == len(want)
    assert got["value_c"].sum() == want["value_c"].sum()


def test_pmi_two_forms_equal(ray_session):
    """Driver-fold and forced-distributed (hashed-key join) forms of
    the PMI collocation op produce identical top-100 tables."""
    from rendler_ray.goldenhash import to_pandas
    from rendler_ray.pipelines.queries import pmi_bigrams_top

    a = to_pandas(pmi_bigrams_top(SF)) \
        .sort_values(["x", "y"]).reset_index(drop=True)
    b = to_pandas(pmi_bigrams_top(SF, driver_max=0)) \
        .sort_values(["x", "y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])
    assert len(a) == 100


def _aa_brute(edges, topk=50, deg_cap=64):
    """Pure-python Adamic-Adar reference on an undirected edge list."""
    import math
    from collections import defaultdict

    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    wtab = {d: int(round(1e6 / math.log(d)))
            for d in range(2, deg_cap + 1)}
    scores, cns = defaultdict(int), defaultdict(int)
    for w, ns in adj.items():
        if not (2 <= len(ns) <= deg_cap):
            continue
        ns = sorted(ns)
        for i in range(len(ns) - 1):
            for b in ns[i + 1:]:
                a = ns[i]
                if b in adj[a]:
                    continue
                scores[(a, b)] += wtab[len(adj[w])]
                cns[(a, b)] += 1
    rows = sorted(((a, b, cns[(a, b)], s)
                   for (a, b), s in scores.items()),
                  key=lambda r: (-r[3], r[0], r[1]))[:topk]
    return rows


def test_adamic_adar_brute_and_two_forms(ray_session, small_docs):
    """Both the driver and distributed Adamic-Adar forms match a
    pure-python brute force on a real crawl graph."""
    from rendler_ray.functions.graph import adamic_adar_auto
    from rendler_ray.goldenhash import to_pandas
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=small_docs,
                            seeds=default_seeds(1), max_depth=3))
    edges = {(r["src"], r["dst"]) for r in res.edges.take_all()}
    want = pd.DataFrame(_aa_brute(edges),
                        columns=["a", "b", "cn", "aa_e6"])

    a = to_pandas(adamic_adar_auto(res.edges)).reset_index(drop=True)
    b = to_pandas(adamic_adar_auto(res.edges, driver_max=0)) \
        .sort_values(["aa_e6", "a", "b"],
                     ascending=[False, True, True]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, want[a.columns])
    pd.testing.assert_frame_equal(b[a.columns], want[a.columns])


def test_bucketed_layout_colocates_keys(ray_session):
    """Every bucket directory holds only keys with key % 8 == bucket,
    for both sides of the bucketed join layout."""
    from rendler_ray.pipelines.queries import bucketed_join_revenue

    res = bucketed_join_revenue(SF)  # builds the layout as a side effect
    res.materialize()
    root = None
    base = "/tmp/rendler_ray_bucketed"
    tag = f"sf0.001-{os.getpid()}"
    root = os.path.join(base, tag)
    assert os.path.isdir(root)
    for side, key in [("orders", "o_custkey"), ("customer", "c_custkey")]:
        bdirs = [d for d in os.listdir(os.path.join(root, side))
                 if d.startswith("bucket=")]
        assert len(bdirs) == 8
        for d in bdirs:
            b = int(d.split("=")[1])
            t = pq.read_table(os.path.join(root, side, d), columns=[key])
            ks = t[key].to_numpy()
            assert len(ks) > 0 and (ks % 8 == b).all()
