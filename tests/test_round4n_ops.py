"""Round-4n op families: Borůvka minimum spanning forest, EWMA daily
smoothing (recursive-CTE recurrence oracle), U-shaped multi-touch
attribution."""

import os
from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _orders_edges(sf):
    o = pq.read_table(os.path.join(sf, "orders.parquet"),
                      columns=["o_custkey", "o_orderkey"]).to_pandas()
    a = np.minimum(o.o_custkey, o.o_orderkey % 1500 + 1).to_numpy()
    b = np.maximum(o.o_custkey, o.o_orderkey % 1500 + 1).to_numpy()
    keep = a != b
    return pd.DataFrame({"a": a[keep], "b": b[keep]}).drop_duplicates()


def test_mst_brute_and_invariants(ray_session):
    """The emitted forest equals an independent Kruskal on the unique
    packed keys at BOTH sf0.001 and sf0.01, and |MSF| = V − C."""
    from rendler_ray.pipelines.queries import _mst_pack, mst_crawl_graph

    for sf in (SF, "/root/testdata/sf0.01"):
        out = mst_crawl_graph(sf).to_pandas() \
            .sort_values(["a", "b"]).reset_index(drop=True)
        e = _orders_edges(sf)
        k = _mst_pack(e.a.to_numpy(), e.b.to_numpy())
        assert len(np.unique(k)) == len(k)  # tie-break really unique
        nodes = np.unique(np.concatenate([e.a, e.b]))
        parent = {int(n): int(n) for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        mask = (1 << 22) - 1
        chosen = []
        for kv in sorted(k.tolist()):
            ea, eb = (kv >> 22) & mask, kv & mask
            ra, rb = find(ea), find(eb)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
                chosen.append(kv)
        exp = pd.DataFrame({
            "a": [(c >> 22) & mask for c in chosen],
            "b": [c & mask for c in chosen],
            "w": [c >> 44 for c in chosen]}) \
            .sort_values(["a", "b"]).reset_index(drop=True)
        assert out.astype("int64").equals(exp.astype("int64")), sf
        ncomp = len({find(int(n)) for n in nodes})
        assert len(out) == len(nodes) - ncomp  # spanning forest size
        # every chosen edge carries the deterministic weight
        assert (out.w.to_numpy()
                == 1 + (7 * out.a.to_numpy()
                        + 13 * out.b.to_numpy()) % 9).all()


def test_mst_two_form(ray_session):
    """driver_max=0 forces the distributed Borůvka rounds; the forest
    is bit-identical to the driver Kruskal fold (unique weights make
    the MSF unique, so the agreement is exact, not statistical)."""
    from rendler_ray.pipelines.queries import mst_crawl_graph

    base = mst_crawl_graph(SF).to_pandas()
    forced = mst_crawl_graph(SF, driver_max=0).to_pandas()
    assert base.equals(forced)


def test_ewma_brute(ray_session):
    """rn/day/n/ewma_e6 match a pandas sequential replay of the
    identical (s + n) / 2.0 recurrence, and the smoothing actually
    damps: |ewma − n| < max day-over-day |Δn| somewhere non-trivial."""
    import math

    from rendler_ray.pipelines.queries import ewma_daily_counts

    out = ewma_daily_counts(SF).to_pandas() \
        .sort_values("rn").reset_index(drop=True)
    ev = pq.read_table(os.path.join(SF, "events.parquet"),
                       columns=["ts"]).to_pandas()
    day = ev.ts.to_numpy("datetime64[us]").astype(np.int64) \
        // 86_400_000_000
    daily = pd.Series(day).value_counts().sort_index()
    assert len(out) == len(daily)
    s = 0.0
    for i, (d, n) in enumerate(zip(daily.index, daily.to_numpy())):
        s = float(n) if i == 0 else (s + n) / 2.0
        row = out.iloc[i]
        assert row.rn == i + 1 and row.day == d and row.n == n
        assert row.ewma_e6 == math.floor(s * 1000000.0)
    # smoothing is live: ewma differs from the raw series mid-stream
    mid = out.iloc[1:]
    assert (mid.ewma_e6 != mid.n * 1_000_000).any()


def test_attribution_brute(ray_session):
    """Every (pid, tid) row matches a pandas brute force of the 24 h
    window; per-conversion Fraction credits sum to exactly 1; all four
    position labels occur at sf0.001."""
    from rendler_ray.pipelines.queries import attribution_u_shape_events

    out = attribution_u_shape_events(SF).to_pandas()
    ev = pq.read_table(os.path.join(SF, "events.parquet"),
                       columns=["event_id", "ts", "user_id",
                                "event_type"]).to_pandas()
    ev["t"] = ev.ts.to_numpy("datetime64[us]").astype(np.int64)

    exp_rows = []
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["t", "event_id"], kind="stable")
        tch = g[g.event_type != "purchase"]
        for p in g[g.event_type == "purchase"].itertuples():
            w = tch[(tch.t < p.t) & (tch.t >= p.t - 86_400_000_000)]
            k = len(w)
            if k == 0:
                continue
            for rk, t in enumerate(w.itertuples(), start=1):
                if k == 1:
                    pos, num, den = "only", 1, 1
                elif rk == 1 or rk == k:
                    pos = "first" if rk == 1 else "last"
                    num, den = (1, 2) if k == 2 else (2, 5)
                else:
                    pos, num, den = "middle", 1, 5 * (k - 2)
                exp_rows.append((p.event_id, t.event_id, k, pos,
                                 num, den))
    exp = pd.DataFrame(exp_rows, columns=["pid", "tid", "k", "pos",
                                          "credit_num", "credit_den"]) \
        .sort_values(["pid", "tid"]).reset_index(drop=True)
    got = out.sort_values(["pid", "tid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[exp.columns].astype(exp.dtypes.to_dict()), exp)

    assert set(out.pos) == {"only", "first", "middle", "last"}
    for pid, g in out.groupby("pid"):
        tot = sum(Fraction(int(n), int(d))
                  for n, d in zip(g.credit_num, g.credit_den))
        assert tot == 1, pid
