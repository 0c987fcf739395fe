"""Round-4p op families: one-way ANOVA across order priorities,
Mann–Kendall daily trend test, per-user inter-arrival burstiness,
Zipf-law slope fit."""

import math
import os
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _cents(x: np.ndarray) -> np.ndarray:
    # DuckDB round() is half-away-from-zero
    return (np.floor(np.abs(x) * 100 + 0.5) * np.sign(x)).astype(np.int64)


def test_anova_order_priority_brute(ray_session):
    """F/eta² agree with an exact big-int recompute from the raw
    table, eta² is a valid fraction, and the q hi/lo split is
    lossless."""
    from rendler_ray.pipelines.queries import anova_order_priority

    out = anova_order_priority(SF).to_pandas().iloc[0]
    od = pq.read_table(os.path.join(SF, "orders.parquet"),
                       columns=["o_orderpriority", "o_totalprice"]) \
        .to_pandas()
    od["c"] = _cents(od["o_totalprice"].to_numpy())
    groups = {p: g["c"].tolist() for p, g in od.groupby("o_orderpriority")}
    k = len(groups)
    n = len(od)
    s_tot = int(od["c"].sum())
    q_tot = sum(int(v) * int(v) for vs in groups.values() for v in vs)
    a_e6 = sum(sum(vs) ** 2 * 1_000_000 // len(vs)
               for vs in groups.values())
    ssb = max(a_e6 - s_tot * s_tot * 1_000_000 // n, 0)
    ssw = q_tot * 1_000_000 - a_e6
    assert int(out["k_groups"]) == k and int(out["n"]) == n
    assert int(out["sum_c"]) == s_tot
    assert int(out["eta2_e6"]) == ssb * 1_000_000 // (ssb + ssw)
    assert int(out["f_e6"]) == ssb * (n - k) * 1_000_000 \
        // (ssw * (k - 1))
    assert 0 <= int(out["eta2_e6"]) <= 1_000_000
    assert int(out["f_e6"]) >= 0


def test_mann_kendall_brute(ray_session):
    """S, tie-corrected variance and z agree with an O(D²) python
    recompute over the daily counts; |S| is bounded by C(n,2)."""
    from rendler_ray.pipelines.queries import mann_kendall_daily

    out = mann_kendall_daily(SF).to_pandas().iloc[0]
    ev = pq.read_table(os.path.join(SF, "events.parquet"),
                       columns=["ts"]).to_pandas()
    day = (ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    daily = sorted(Counter(day).items())
    c = [v for _, v in daily]
    n = len(c)
    s = sum((c[j] > c[i]) - (c[j] < c[i])
            for i in range(n) for j in range(i + 1, n))
    ties = sum(t * (t - 1) * (2 * t + 5)
               for t in Counter(c).values())
    var18 = n * (n - 1) * (2 * n + 5) - ties
    assert int(out["n_days"]) == n
    assert int(out["s_stat"]) == s
    assert int(out["var18"]) == var18
    assert abs(s) <= n * (n - 1) // 2
    if var18 <= 0 or s == 0:
        assert int(out["z_e6"]) == 0
    else:
        sd = math.sqrt(var18 / 18.0)
        z = (s - 1) / sd if s > 0 else (s + 1) / sd
        assert int(out["z_e6"]) == math.floor(z * 1e6)


def test_interarrival_burstiness_brute(ray_session):
    """Every emitted user matches a per-user pandas recompute; every
    eligible user (≥ 2 gaps, positive gap sum) is emitted; CV² ≥ 0
    (Cauchy–Schwarz) and CV² = 0 only for perfectly regular gaps."""
    from rendler_ray.pipelines.queries import \
        interarrival_burstiness_users

    out = interarrival_burstiness_users(SF).to_pandas() \
        .set_index("user_id").sort_index()
    ev = pq.read_table(
        os.path.join(SF, "events.parquet"),
        columns=["event_id", "ts", "user_id"]).to_pandas()
    ev["sec"] = (ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
                 // 1_000_000)
    expected = {}
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="stable")
        gaps = np.diff(g["sec"].to_numpy(np.int64))
        m = len(gaps)
        sg = int(gaps.sum())
        if m < 2 or sg == 0:
            continue
        sq = sum(int(v) * int(v) for v in gaps)
        expected[int(uid)] = (m, sg,
                              (m * sq - sg * sg) * 1_000_000
                              // (sg * sg))
    assert set(out.index) == set(expected)
    assert len(out) > 0
    for uid, (m, sg, cv2) in expected.items():
        row = out.loc[uid]
        assert int(row["n_gaps"]) == m
        assert int(row["sum_gap_s"]) == sg
        assert int(row["cv2_e6"]) == cv2
        assert cv2 >= 0
        if cv2 == 0:
            assert len(set(np.diff(sorted(
                ev[ev.user_id == uid]["sec"])))) <= 1


def test_zipf_fit_brute(ray_session):
    """Slope rational agrees with an exact recompute from the true
    token counts, den > 0, and the fitted slope is negative (the
    frequency curve decreases in rank)."""
    from rendler_ray.pipelines.queries import zipf_fit_tokens

    out = zipf_fit_tokens(SF).to_pandas().iloc[0]
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["text"]).to_pandas()
    cnt = Counter(t for txt in docs["text"] for t in txt.split(" "))
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    n = len(top)

    def r6(v: float) -> int:  # DuckDB half-away round at e6
        s = v * 1e6
        return int(math.floor(s + 0.5) if s >= 0 else math.ceil(s - 0.5))

    x = [r6(math.log(i + 1)) for i in range(n)]
    y = [r6(math.log(c)) for _, c in top]
    sx, sy = sum(x), sum(y)
    sxy = sum(a * b for a, b in zip(x, y))
    sxx = sum(a * a for a in x)
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    assert int(out["n_ranks"]) == n
    assert int(out["slope_num"]) == num
    assert int(out["slope_den"]) == den
    assert den > 0
    assert int(out["slope_e6"]) == (num * 1_000_000) // den
    assert num < 0  # Zipf: frequency falls with rank


def test_token_freq_topk_counts_matches_names(ray_session):
    """The counts helper and the name-only wrapper stay consistent,
    and the cut is (freq desc, token asc)."""
    from rendler_ray.pipelines.queries import (
        _read, _token_freq_topk, _token_freq_topk_counts)

    ds = _read(SF, "documents", ["text"])
    pairs = _token_freq_topk_counts(ds, 50)
    names = _token_freq_topk(_read(SF, "documents", ["text"]), 50)
    assert [p[0] for p in pairs] == names
    cs = [p[1] for p in pairs]
    assert all(a >= b for a, b in zip(cs, cs[1:]))
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["text"]).to_pandas()
    cnt = Counter(t for txt in docs["text"] for t in txt.split(" "))
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert pairs == exp
