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
