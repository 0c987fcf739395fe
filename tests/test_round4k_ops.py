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
