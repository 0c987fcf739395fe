"""Round-4l op families: one-pass Poisson bootstrap, federated
multi-format ingest, RLE layout report."""

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    return pq.read_table(os.path.join(SF, "events.parquet")).to_pandas()


def test_bootstrap_brute(ray_session):
    """Every replicate's (n_eff, sum_c, mean_e6) matches a pandas brute
    force of the identical md5 inverse-CDF draw, and the Poisson(1)
    weights average ~1 so each replicate resamples ~n rows."""
    from rendler_ray.pipelines.queries import (_POIS_T,
                                               bootstrap_mean_ci_events)

    out = bootstrap_mean_ci_events(SF).to_pandas() \
        .sort_values("b").reset_index(drop=True)

    ev = _events()
    c = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    thr = np.array(_POIS_T, np.int64)
    n = len(ev)
    for b in range(8):
        u = np.array([int(hashlib.md5(f"{e}:{b}".encode())
                          .hexdigest()[:15], 16)
                      for e in ev.event_id.tolist()], np.int64)
        w = (u[:, None] >= thr[None, :]).sum(axis=1)
        row = out[out.b == b].iloc[0]
        assert row.n_eff == w.sum()
        assert row.sum_c == (w * c).sum()
        assert row.mean_e6 == (w * c).sum() * 1_000_000 // max(w.sum(), 1)
        # Poisson(1): mean weight within 15% of 1 at n=1000
        assert 0.85 * n <= w.sum() <= 1.15 * n

    # the spread is a real CI: replicates differ
    assert out.mean_e6.nunique() > 1


def test_bootstrap_thresholds_are_poisson1():
    """The shared threshold literals are the Poisson(1) CDF scaled to
    the 60-bit md5 domain (so P(draw >= T_k) = P(X > k))."""
    import math

    from rendler_ray.pipelines.queries import _POIS_T

    acc = 0.0
    for k in range(8):
        acc += math.exp(-1.0) / math.factorial(k)
        assert _POIS_T[k] == int(acc * 16 ** 15)
    assert _POIS_T == sorted(_POIS_T)


def test_federated_union_lossless(ray_session):
    """The three-format federation aggregates to exactly the plain
    single-parquet answer — no row lost or duplicated at any stripe."""
    from rendler_ray.pipelines.queries import federated_union_ingest

    out = federated_union_ingest(SF).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)

    ev = _events()
    us = ev.ts.to_numpy("datetime64[us]").astype(np.int64)
    ev = ev.assign(cents=np.round(ev.value.to_numpy() * 100)
                   .astype(np.int64), ts_us=us)
    g = ev.groupby("event_type").agg(
        n_events=("event_id", "size"), sum_cents=("cents", "sum"),
        first_us=("ts_us", "min"), last_us=("ts_us", "max")) \
        .reset_index().sort_values("event_type").reset_index(drop=True)

    assert len(out) == len(g)
    for col in ("n_events", "sum_cents", "first_us", "last_us"):
        assert (out[col].to_numpy() == g[col].to_numpy()).all(), col

    # each stripe is non-empty at this scale (the federation is real)
    ids = ev.event_id.to_numpy()
    for m in range(3):
        assert (ids % 3 == m).any()


def test_rle_stats_brute(ray_session):
    """Run counts in (ts, event_id) order and the distinct floor match
    a pandas shift-compare, and sorting can only shrink the layout."""
    from rendler_ray.pipelines.queries import rle_column_stats

    out = rle_column_stats(SF).to_pandas().set_index("col")

    ev = _events()
    us = ev.ts.to_numpy("datetime64[us]").astype(np.int64)
    ev = ev.assign(ts_us=us).sort_values(["ts_us", "event_id"]) \
        .reset_index(drop=True)
    for col in ("event_type", "user_id"):
        v = ev[col].to_numpy()
        runs = 1 + int((v[1:] != v[:-1]).sum())
        row = out.loc[col]
        assert row.n_rows == len(ev)
        assert row.runs_time_order == runs
        assert row.n_distinct == ev[col].nunique()
        assert row.rle_bytes_time == 12 * runs
        assert row.rle_bytes_sorted == 12 * ev[col].nunique()
        assert row.rle_bytes_sorted <= row.rle_bytes_time
        assert row.n_distinct <= row.runs_time_order
