"""Round-4j op families: interval attribution join, leave-one-out
target encoding, GROUPING SETS, classifier eval (per-class P/R/F1 and
Cohen's kappa)."""

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
