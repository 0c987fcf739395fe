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


def _load_edges():
    od = pq.read_table(os.path.join(SF, "orders.parquet"),
                       columns=["o_custkey", "o_orderkey"]).to_pandas()
    u = od["o_custkey"].to_numpy(np.int64)
    v = od["o_orderkey"].to_numpy(np.int64) % 1500 + 1
    a, b = np.minimum(u, v), np.maximum(u, v)
    keep = a != b
    return sorted(set(zip(a[keep].tolist(), b[keep].tolist())))


def _components(nodes, edges):
    adj = {n: [] for n in nodes}
    for x, y in edges:
        if x in adj and y in adj:
            adj[x].append(y)
            adj[y].append(x)
    seen, comps = set(), 0
    for n in nodes:
        if n in seen:
            continue
        comps += 1
        stack = [n]
        seen.add(n)
        while stack:
            u = stack.pop()
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
    return comps


def test_bridges_brute(ray_session):
    """Tarjan bridges equal the per-edge-removal definition on the
    sf0.001 graph (near-forest: most edges ARE bridges)."""
    from rendler_ray.pipelines.queries import bridges_crawl_graph

    out = bridges_crawl_graph(SF).to_pandas()
    got = set(zip(out["a"].tolist(), out["b"].tolist()))
    edges = _load_edges()
    nodes = sorted({n for e in edges for n in e})
    base = _components(nodes, edges)
    expect = set()
    for e in edges:
        rest = [x for x in edges if x != e]
        if _components(nodes, rest) > base:
            expect.add(e)
    assert got == expect
    assert len(got) > 0


def test_articulation_brute(ray_session):
    """Cut vertices equal the per-node-removal definition."""
    from rendler_ray.pipelines.queries import articulation_points_graph

    got = set(articulation_points_graph(SF).to_pandas()["node"])
    edges = _load_edges()
    nodes = sorted({n for e in edges for n in e})
    base = _components(nodes, edges)
    expect = set()
    for n in nodes:
        rest_nodes = [x for x in nodes if x != n]
        rest_edges = [e for e in edges if n not in e]
        # removing an isolated-after-removal component root still
        # counts iff component count among REMAINING nodes grows
        if _components(rest_nodes, rest_edges) > base:
            expect.add(n)
    assert got == expect
    assert len(got) > 0


def test_bridges_known_graph():
    """Path 1-2-3 + triangle 3-4-5: bridges (1,2),(2,3); cuts 2,3."""
    from rendler_ray.functions.graph import bridges_articulation

    a = np.array([1, 2, 3, 4, 5])
    b = np.array([2, 3, 4, 5, 3])
    br, cuts = bridges_articulation(a, b)
    assert br == [(1, 2), (2, 3)]
    assert cuts == [2, 3]


def test_holt_linear_brute(ray_session):
    """The emitted trajectory replays the recurrence exactly, starts
    at (y1, 0), and the level stays inside the running data range."""
    from rendler_ray.pipelines.queries import holt_linear_daily

    out = holt_linear_daily(SF).to_pandas().sort_values("rn")
    ev = pq.read_table(os.path.join(SF, "events.parquet"),
                       columns=["ts"]).to_pandas()
    day = (ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    daily = sorted(Counter(day).items())
    assert out["n"].tolist() == [n for _, n in daily]
    l = b = 0.0
    for i, (row, (_, y)) in enumerate(zip(out.itertuples(), daily)):
        if i == 0:
            l, b = float(y), 0.0
        else:
            l_new = (y + l + b) / 2.0
            b = (l_new - l + b) / 2.0
            l = l_new
        assert row.level_e6 == math.floor(l * 1e6)
        assert row.trend_e6 == math.floor(b * 1e6)
    assert out.iloc[0]["level_e6"] == daily[0][1] * 1_000_000
    assert out.iloc[0]["trend_e6"] == 0
    counts = [n for _, n in daily]
    assert min(counts) * 1e6 - 1 <= out["level_e6"].iloc[-1] \
        <= max(counts) * 1e6 + abs(out["trend_e6"]).max()


def test_seasonal_naive_brute(ray_session):
    """MAE / APE sums agree with a dict-based recompute over the
    calendar (not row-lag) definition."""
    from rendler_ray.pipelines.queries import seasonal_naive_eval

    out = seasonal_naive_eval(SF).to_pandas().iloc[0]
    ev = pq.read_table(os.path.join(SF, "events.parquet"),
                       columns=["ts"]).to_pandas()
    day = (ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    cnt = dict(Counter(day))
    n_eval = sum_abs = sum_ape = 0
    for d, y in sorted(cnt.items()):
        if d - 7 not in cnt:
            continue
        err = abs(y - cnt[d - 7])
        n_eval += 1
        sum_abs += err
        sum_ape += err * 1_000_000 // y
    assert int(out["n_eval_days"]) == n_eval > 0
    assert int(out["sum_abs_err"]) == sum_abs
    assert int(out["mae_e6"]) == sum_abs * 1_000_000 // n_eval
    assert int(out["sum_ape_e6"]) == sum_ape


def test_logreg_fit_brute(ray_session):
    """The 3-step GD trajectory matches a single-process recompute
    (same rounding conventions), the first step moves the weights,
    and training log-loss does not increase over the run."""
    from rendler_ray.pipelines.queries import logreg_quality_fit

    out = logreg_quality_fit(SF).to_pandas().sort_values("step")
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["n_chars", "lang"]).to_pandas()
    x = docs["n_chars"].to_numpy(np.float64) / 1000.0
    y = (docs["lang"] == "en").to_numpy(np.float64)
    n = len(x)

    def rha(v):
        return np.where(v >= 0, np.floor(v + 0.5),
                        np.ceil(v - 0.5)).astype(np.int64)

    def loss(w0, w1):
        m = (float(w0) + float(w1) * x) / 1e6
        p = 1.0 / (1.0 + np.exp(-m))
        eps = 1e-12
        return float(-(y * np.log(p + eps)
                       + (1 - y) * np.log(1 - p + eps)).mean())

    w0 = w1 = 0
    losses = [loss(0, 0)]
    for step in range(3):
        m = (float(w0) + float(w1) * x) / 1e6
        p = 1.0 / (1.0 + np.exp(-m))
        g0 = int(rha((p - y) * 1e6).sum())
        g1 = int(rha(((p - y) * x) * 1e6).sum())
        w0 -= g0 // (4 * n)
        w1 -= g1 // (4 * n)
        row = out.iloc[step]
        assert int(row["n"]) == n
        assert int(row["g0_e6"]) == g0
        assert int(row["g1_e6"]) == g1
        assert int(row["w0_e6"]) == w0
        assert int(row["w1_e6"]) == w1
        losses.append(loss(w0, w1))
    assert (int(out.iloc[0]["w0_e6"]), int(out.iloc[0]["w1_e6"])) \
        != (0, 0)
    assert losses[-1] <= losses[0]


def test_rich_club_brute(ray_session):
    """φ(k) agrees with the definitional recompute; φ is a valid
    fraction and the club shrinks as k grows."""
    from rendler_ray.pipelines.queries import rich_club_graph

    out = rich_club_graph(SF).to_pandas().set_index("k").sort_index()
    edges = _load_edges()
    deg = Counter()
    for x, y in edges:
        deg[x] += 1
        deg[y] += 1
    prev_n = None
    for k in (1, 2, 4, 8, 16):
        nk = sum(1 for d in deg.values() if d > k)
        ek = sum(1 for x, y in edges if deg[x] > k and deg[y] > k)
        row = out.loc[k]
        assert int(row["n_nodes"]) == nk
        assert int(row["n_edges"]) == ek
        exp = (2 * ek * 1_000_000 // (nk * (nk - 1))) if nk >= 2 else 0
        assert int(row["phi_e6"]) == exp
        assert 0 <= exp <= 1_000_000
        if prev_n is not None:
            assert nk <= prev_n
        prev_n = nk


def test_user_journey_brute(ray_session):
    """Top-10 equals a pandas recompute with the same (count desc,
    journey asc) cut; journeys are 3 steps."""
    from rendler_ray.pipelines.queries import user_journey_strings

    out = user_journey_strings(SF).to_pandas()
    ev = pq.read_table(
        os.path.join(SF, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"]).to_pandas()
    js = []
    for _, g in ev.groupby("user_id"):
        if len(g) < 3:
            continue
        g = g.sort_values(["ts", "event_id"], kind="stable").head(3)
        js.append(">".join(g["event_type"].tolist()))
    exp = sorted(Counter(js).items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(out["journey"], out["n_users"])) == exp
    assert all(j.count(">") == 2 for j in out["journey"])


def _novelty_brute():
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    by_doc = {}
    for did, txt in zip(docs["doc_id"], docs["text"]):
        toks = txt.split(" ")
        if len(toks) < 5:
            gs = {txt}
        else:
            gs = {" ".join(toks[i:i + 5])
                  for i in range(len(toks) - 4)}
        by_doc[int(did)] = gs
    first = {}
    for did in sorted(by_doc):
        for g in by_doc[did]:
            first.setdefault(g, did)
    return {did: (len(gs),
                  sum(1 for g in gs if first[g] == did))
            for did, gs in by_doc.items()}


def test_gram_novelty_brute(ray_session):
    """Per-doc distinct/novel counts match a set-based recompute; the
    smallest doc_id is 100% novel; totals conserve (Σ novel = distinct
    gram vocabulary)."""
    from rendler_ray.pipelines.queries import gram_novelty_docs

    out = gram_novelty_docs(SF).to_pandas().set_index("doc_id")
    exp = _novelty_brute()
    assert set(out.index) == set(exp)
    vocab = set()
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    for txt in docs["text"]:
        toks = txt.split(" ")
        vocab |= ({txt} if len(toks) < 5 else
                  {" ".join(toks[i:i + 5])
                   for i in range(len(toks) - 4)})
    for did, (nd, nv) in exp.items():
        row = out.loc[did]
        assert int(row["n_distinct"]) == nd
        assert int(row["n_novel"]) == nv
        assert int(row["novelty_e6"]) == nv * 1_000_000 // nd
    mind = min(exp)
    assert int(out.loc[mind]["novelty_e6"]) == 1_000_000
    assert int(out["n_novel"].sum()) == len(vocab)


def test_gram_novelty_two_form(ray_session):
    """The forced-distributed form (gate 0) equals the driver fold."""
    from rendler_ray.pipelines.queries import gram_novelty_docs

    a = gram_novelty_docs(SF).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b_ds = gram_novelty_docs(SF, driver_max=0)
    b = b_ds.to_pandas() if hasattr(b_ds, "to_pandas") else b_ds
    if not isinstance(b, pd.DataFrame):
        b = b.to_pandas()
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns.tolist()])


def test_bigram_generate_brute(ray_session):
    """The walk replays a dict-based greedy argmax (count desc, token
    asc ties) from the corpus-top token; forced-distributed probes
    produce the identical walk."""
    from rendler_ray.pipelines.queries import bigram_greedy_generate

    out = bigram_greedy_generate(SF).to_pandas()
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["text"]).to_pandas()
    uni = Counter()
    bg = Counter()
    for txt in docs["text"]:
        toks = txt.split(" ")
        uni.update(toks)
        bg.update(zip(toks, toks[1:]))
    cur = min(uni.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    walk = [cur]
    for _ in range(15):
        nxt = [(w2, c) for (w1, w2), c in bg.items() if w1 == cur]
        if not nxt:
            break
        cur = min(nxt, key=lambda kv: (-kv[1], kv[0]))[0]
        walk.append(cur)
    assert out["token"].tolist() == walk
    assert out["step"].tolist() == list(range(len(walk)))
    dist = bigram_greedy_generate(SF, driver_max=0).to_pandas()
    assert dist["token"].tolist() == walk


def test_length_bucket_brute(ray_session):
    """Pad-waste matches an explicit batching recompute for both
    plans, and sorting never increases waste."""
    from rendler_ray.pipelines.queries import length_bucket_batching

    out = length_bucket_batching(SF).to_pandas().set_index("plan")
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    docs["ln"] = [len(t.split(" ")) for t in docs["text"]]

    def plan_stats(ordered):
        padded = tot = nb = 0
        for i in range(0, len(ordered), 32):
            chunk = ordered[i:i + 32]
            padded += max(chunk) * len(chunk)
            tot += sum(chunk)
            nb += 1
        return nb, tot, padded

    arr = docs.sort_values("doc_id")["ln"].tolist()
    srt = docs.sort_values(["ln", "doc_id"])["ln"].tolist()
    for plan, ordered in (("arrival", arr), ("sorted", srt)):
        nb, tot, padded = plan_stats(ordered)
        row = out.loc[plan]
        assert int(row["n_batches"]) == nb
        assert int(row["total_tokens"]) == tot
        assert int(row["padded_tokens"]) == padded
        assert int(row["waste_e6"]) == (padded - tot) * 1_000_000 \
            // padded
    assert int(out.loc["sorted"]["waste_e6"]) \
        <= int(out.loc["arrival"]["waste_e6"])


def test_event_seq_entropy_brute(ray_session):
    """Per-prev conditional entropy matches a Counter recompute; h is
    non-negative and bounded by ln(successor fan-out)."""
    from rendler_ray.pipelines.queries import event_seq_entropy

    out = event_seq_entropy(SF).to_pandas().set_index("prev")
    ev = pq.read_table(
        os.path.join(SF, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"]).to_pandas()
    pairs = Counter()
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="stable")
        et = g["event_type"].tolist()
        pairs.update(zip(et, et[1:]))
    totals = Counter()
    for (p, _), c in pairs.items():
        totals[p] += c
    for p, n in totals.items():
        succ = {q: c for (a, q), c in pairs.items() if a == p}
        h = 0
        for c in succ.values():
            t = (c / n) * math.log(n / c) * 1e6
            h += int(math.floor(t + 0.5) if t >= 0
                     else math.ceil(t - 0.5))
        row = out.loc[p]
        assert int(row["n"]) == n
        assert int(row["h_e6"]) == h
        assert 0 <= h <= math.log(len(succ)) * 1e6 + len(succ)
    assert set(out.index) == set(totals)


def test_seasonal_decompose_brute(ray_session):
    """Row-for-row identity trend+seasonal+resid == y·1e6; trend
    matches the centered 7-row sum; seasonal is the per-dow floor
    mean of detrended values."""
    from rendler_ray.pipelines.queries import seasonal_decompose_daily

    out = seasonal_decompose_daily(SF).to_pandas().sort_values("day") \
        .reset_index(drop=True)
    ev = pq.read_table(os.path.join(SF, "events.parquet"),
                       columns=["ts"]).to_pandas()
    day = (ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    daily = sorted(Counter(day).items())
    assert len(out) == max(len(daily) - 6, 0)
    for i, row in out.iterrows():
        j = i + 3
        assert daily[j][0] == row["day"]
        s7 = sum(c for _, c in daily[j - 3:j + 4])
        assert int(row["trend7_e6"]) == s7 * 1_000_000 // 7
        assert (int(row["trend7_e6"]) + int(row["seasonal_e6"])
                + int(row["resid_e6"])) == int(row["n"]) * 1_000_000
        assert int(row["dow"]) == int(row["day"]) % 7
    det = out["n"] * 1_000_000 - out["trend7_e6"]
    for dow, g in out.groupby("dow"):
        exp = int(det[g.index].sum()) // len(g)
        assert (g["seasonal_e6"] == exp).all()


def test_sorted_neighborhood_brute(ray_session):
    """Pairs equal the definitional window-4 + ed≤1 recompute; every
    emitted pair is a true fuzzy pair (precision 1 after verify) and
    the blocking's recall against the complete fuzzy join is
    reported ≥ 0.5 on this corpus."""
    from rendler_ray.pipelines.queries import (fuzzy_name_pairs,
                                               sorted_neighborhood_pairs)

    out = sorted_neighborhood_pairs(SF)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    got = set(zip(out["name_a"], out["name_b"]))
    names = sorted(set(pq.read_table(
        os.path.join(SF, "customer.parquet"),
        columns=["c_name"]).to_pandas()["c_name"]))

    def ed_le1(a, b):
        if a == b:
            return True
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) <= 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        i = 0
        while i < la and a[i] == b[i]:
            i += 1
        return a[i:] == b[i + 1:]

    exp = set()
    for i, a in enumerate(names):
        for b in names[i + 1:i + 5]:
            if ed_le1(a, b):
                exp.add((a, b))
    assert got == exp
    full = fuzzy_name_pairs(SF)
    full = full.to_pandas() if hasattr(full, "to_pandas") else full
    truth = set(zip(full["name_a"], full["name_b"]))
    assert got <= truth  # precision 1 after the exact verify
    # window-4 blocking is recall-LIMITED by design: strictly fewer
    # pairs than the complete fuzzy join, but well above zero
    assert 0 < len(got) < len(truth)
    assert len(got) * 4 >= len(truth)  # ≥ 25% recall on this corpus


def test_doc_feature_corr_brute(ray_session):
    """corr_e6 per pair matches an exact-moment recompute; |corr| ≤ 1;
    n_chars vs n_tokens correlates strongly positively."""
    from rendler_ray.pipelines.queries import doc_feature_corr_matrix

    out = doc_feature_corr_matrix(SF).to_pandas() \
        .set_index(["feat_a", "feat_b"])
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["n_chars", "text"]).to_pandas()
    x1 = docs["n_chars"].astype(int).tolist()
    x2 = [len(t.split(" ")) for t in docs["text"]]
    x3 = [max(len(w) for w in t.split(" ")) for t in docs["text"]]
    n = len(docs)
    feats = {"n_chars": x1, "n_tokens": x2, "max_tok_len": x3}
    for (fa, fb), row in out.iterrows():
        a, b = feats[fa], feats[fb]
        num = n * sum(p * q for p, q in zip(a, b)) - sum(a) * sum(b)
        d1 = n * sum(p * p for p in a) - sum(a) ** 2
        d2 = n * sum(q * q for q in b) - sum(b) ** 2
        exp = math.floor(num / math.sqrt(float(d1) * float(d2)) * 1e6)
        assert int(row["corr_e6"]) == exp
        assert -1_000_000 <= exp <= 1_000_000
        assert int(row["n"]) == n
    assert int(out.loc[("n_chars", "n_tokens")]["corr_e6"]) > 500_000
