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
