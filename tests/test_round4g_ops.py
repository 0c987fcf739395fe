"""Round-4g ops: MERGE/CDC apply, SCD2 history build, LOCF gap fill,
hive-partitioned roundtrip, robust median/MAD outliers, greedy
k-center coreset — each checked against an independent brute-force
recomputation (the DuckDB oracles are checked separately by
scripts/check_correctness.py; these tests must not depend on them)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from rendler_ray.goldenhash import canon, to_pandas
from rendler_ray.pipelines.queries import (
    gap_fill_hourly_values,
    kcenter_coreset_embeddings,
    merge_upsert_docs,
    robust_outlier_docs,
    scd2_user_type_history,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return pq.read_table(
        f"{SF}/documents.parquet",
        columns=["doc_id", "n_chars", "source"]).to_pandas()


# ------------------------------------------------------------- merge


def _brute_merge(df: pd.DataFrame) -> pd.DataFrame:
    m = df["doc_id"] % 97
    out = df[m != 7].copy()
    upd = out["doc_id"] % 97 == 3
    out.loc[upd, "n_chars"] += 1000
    out.loc[upd, "source"] = "patched"
    ins = df[m == 11].copy()
    ins["doc_id"] += 1_000_000_000
    ins["source"] = "inserted"
    return pd.concat([out, ins])[["doc_id", "n_chars", "source"]]


def test_merge_upsert_vs_brute(ray_session):
    got = canon(to_pandas(merge_upsert_docs(SF)))
    want = canon(_brute_merge(_docs()))
    pd.testing.assert_frame_equal(got, want)


def test_merge_upsert_two_forms_equal(ray_session):
    """The broadcast (CDC-batch-fits-driver) and hash-join forms must
    agree row-for-row — driver_max=0 forces the join path."""
    a = canon(to_pandas(merge_upsert_docs(SF)))
    b = canon(to_pandas(merge_upsert_docs(SF, driver_max=0)))
    pd.testing.assert_frame_equal(a, b)


# -------------------------------------------------------------- scd2


def _brute_scd2() -> pd.DataFrame:
    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"]).to_pandas()
    rows = []
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="stable")
        et = g["event_type"].tolist()
        ts = (g["ts"].to_numpy("datetime64[us]").astype(np.int64)
              // 1_000_000)
        runs = []  # (type, first_ts)
        for t, s in zip(et, ts):
            if not runs or runs[-1][0] != t:
                runs.append((t, int(s)))
        for i, (t, s) in enumerate(runs):
            vt = runs[i + 1][1] if i + 1 < len(runs) else 4102444800
            rows.append((uid, t, i + 1, s, vt))
    return pd.DataFrame(rows, columns=[
        "user_id", "event_type", "version", "valid_from", "valid_to"])


def test_scd2_vs_brute(ray_session):
    got = canon(to_pandas(scd2_user_type_history(SF)))
    want = canon(_brute_scd2())
    pd.testing.assert_frame_equal(got, want)


def test_scd2_intervals_tile(ray_session):
    """Per user the validity intervals must tile: sorted by version,
    each valid_to equals the next valid_from; the last is the
    sentinel; types alternate between consecutive runs."""
    df = to_pandas(scd2_user_type_history(SF))
    for _, g in df.groupby("user_id"):
        g = g.sort_values("version")
        assert (g["version"].to_numpy()
                == np.arange(1, len(g) + 1)).all()
        assert (g["valid_to"].to_numpy()[:-1]
                == g["valid_from"].to_numpy()[1:]).all()
        assert g["valid_to"].iloc[-1] == 4102444800
        et = g["event_type"].to_numpy()
        assert (et[1:] != et[:-1]).all()


# ---------------------------------------------------------- gap fill


def test_gap_fill_vs_brute(ray_session):
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type", "value"]).to_pandas()
    ev["hour_epoch"] = (ev["ts"].to_numpy("datetime64[us]")
                        .astype(np.int64) // 3_600_000_000 * 3600)
    ev["v"] = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    obs = ev.groupby(["event_type", "hour_epoch"])["v"].max()
    h0, h1 = (ev["hour_epoch"].min(), ev["hour_epoch"].max())
    rows = []
    for et in sorted(ev["event_type"].unique()):
        lastv = None
        for h in range(int(h0), int(h1) + 1, 3600):
            if (et, h) in obs.index:
                lastv = int(obs[(et, h)])
                rows.append((et, h, lastv, 1))
            else:
                rows.append((et, h, -1 if lastv is None else lastv, 0))
    want = canon(pd.DataFrame(rows, columns=[
        "event_type", "hour_epoch", "value_c", "observed"]))
    got = canon(to_pandas(gap_fill_hourly_values(SF)))
    pd.testing.assert_frame_equal(got, want)


# ------------------------------------------------------ robust outliers


def test_robust_outliers_vs_brute(ray_session):
    df = _docs()
    keep = []
    for s, g in df.groupby("source"):
        v = np.sort(g["n_chars"].to_numpy())
        n = len(v)
        med2 = int(v[(n + 1) // 2 - 1]) + int(v[n // 2])
        dev = np.abs(2 * g["n_chars"].to_numpy() - med2)
        dv = np.sort(dev)
        mad2 = int(dv[(n + 1) // 2 - 1]) + int(dv[n // 2])
        keep.append(g[4 * dev > 7 * mad2])
    want = canon(pd.concat(keep)[["doc_id", "source", "n_chars"]])
    got = canon(to_pandas(robust_outlier_docs(SF)))
    pd.testing.assert_frame_equal(got, want)


def test_robust_outliers_deep_bisection(ray_session):
    """n_hist=2 forces the deepest bisection path — must equal the
    default-width run exactly."""
    a = canon(to_pandas(robust_outlier_docs(SF)))
    b = canon(to_pandas(robust_outlier_docs(SF, n_hist=2)))
    pd.testing.assert_frame_equal(a, b)


def test_robust_outliers_empty_is_typed(ray_session, tmp_path):
    """A constant-length corpus has MAD=0 and zero outliers — the op
    must return the TYPED empty schema (regression: an all-empty
    filter result loses block schemas downstream)."""
    import pyarrow as pa

    t = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                  "text": pa.array(["x"] * 40, pa.string()),
                  "lang": pa.array(["en"] * 40, pa.string()),
                  "source": pa.array(["s0", "s1"] * 20, pa.string()),
                  "n_chars": pa.array([77] * 40, pa.int64())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = to_pandas(robust_outlier_docs(str(tmp_path)))
    assert len(got) == 0
    assert list(got.columns) == ["doc_id", "source", "n_chars"]


# ----------------------------------------------------------- skew join


def _skew_tables(n=20_000, hot_frac=0.5, n_cold_keys=30, seed=3):
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    n_hot = int(n * hot_frac)
    keys = np.concatenate([
        np.full(n_hot, 7, np.int64),  # one key = half the fact table
        rng.integers(100, 100 + n_cold_keys, n - n_hot).astype(np.int64)])
    rng.shuffle(keys)
    left = pa.table({"k": pa.array(keys, pa.int64()),
                     "v": pa.array(np.arange(n, dtype=np.int64))})
    dim_keys = np.unique(np.concatenate([[7], np.arange(100, 100 + n_cold_keys)]))
    right = pa.table({"dk": pa.array(dim_keys, pa.int64()),
                      "name": pa.array([f"d{k}" for k in dim_keys],
                                       pa.string())})
    return left, right


def test_skew_join_adversarial_vs_brute(ray_session):
    """50%-single-key skew: the hybrid must equal the pandas merge
    row-for-row AND actually route the hot key through the broadcast
    leg (stats), with the cold keys still hash-joined."""
    import ray.data as rd

    from rendler_ray.functions.join import skew_join

    left, right = _skew_tables()
    stats = {}
    got = canon(to_pandas(skew_join(
        rd.from_arrow(left), rd.from_arrow(right), on="k",
        right_on="dk", hot_eps=0.05, stats=stats)))
    want = canon(left.to_pandas().merge(
        right.to_pandas(), left_on="k", right_on="dk")
        .drop(columns=["dk"]))
    pd.testing.assert_frame_equal(got, want)
    assert stats["n_hot_keys"] >= 1 and 7 in stats["hot_keys"]
    assert len(stats["hot_keys"]) < 31  # cold keys stayed cold


def test_skew_join_all_hot(ray_session):
    """Two keys at 50% each — every key is hot, the cold leg is empty
    (the sparse-key hash-join hazard the sanitizer guards)."""
    import pyarrow as pa
    import ray.data as rd

    from rendler_ray.functions.join import skew_join

    left = pa.table({"k": pa.array([1, 2] * 500, pa.int64()),
                     "v": pa.array(range(1000), pa.int64())})
    right = pa.table({"dk": pa.array([1, 2, 3], pa.int64()),
                      "name": pa.array(["a", "b", "c"], pa.string())})
    stats = {}
    got = canon(to_pandas(skew_join(
        rd.from_arrow(left), rd.from_arrow(right), on="k",
        right_on="dk", hot_eps=0.1, stats=stats)))
    want = canon(left.to_pandas().merge(
        right.to_pandas(), left_on="k", right_on="dk")
        .drop(columns=["dk"]))
    pd.testing.assert_frame_equal(got, want)
    assert stats["hot_keys"] == [1, 2]


def test_skew_join_no_hot_keys(ray_session):
    """Uniform keys below the threshold — plain-join fallback path."""
    import pyarrow as pa
    import ray.data as rd

    from rendler_ray.functions.join import skew_join

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 200, 5000).astype(np.int64)
    left = pa.table({"k": pa.array(keys, pa.int64()),
                     "v": pa.array(range(5000), pa.int64())})
    dk = np.arange(0, 200, dtype=np.int64)
    right = pa.table({"dk": pa.array(dk, pa.int64()),
                      "name": pa.array([f"d{k}" for k in dk], pa.string())})
    stats = {}
    got = canon(to_pandas(skew_join(
        rd.from_arrow(left), rd.from_arrow(right), on="k",
        right_on="dk", hot_eps=0.05, stats=stats)))
    want = canon(left.to_pandas().merge(
        right.to_pandas(), left_on="k", right_on="dk")
        .drop(columns=["dk"]))
    pd.testing.assert_frame_equal(got, want)
    assert stats["n_hot_keys"] == 0


# ------------------------------------------- schema evolution / compact


def test_schema_evolution_vs_brute(ray_session):
    from rendler_ray.pipelines.queries import docs_schema_evolution_union

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"]).to_pandas()
    b = docs.copy()
    b["doc_id"] += 1_000_000_000
    b["lang"] = ""
    b["quality"] = b["n_chars"] % 100
    a = docs.copy()
    a["quality"] = -1
    want = canon(pd.concat([a, b])[["doc_id", "lang", "n_chars",
                                    "quality"]])
    got = canon(to_pandas(docs_schema_evolution_union(SF)))
    pd.testing.assert_frame_equal(got, want)


def test_compaction_content_identical(ray_session):
    from rendler_ray.pipelines.queries import compact_docs_files

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pandas()
    got = to_pandas(compact_docs_files(SF))
    assert got["files_after"].iloc[0] < got["files_before"].iloc[0]
    assert got["rows"].iloc[0] == len(docs)
    assert got["sum_ids"].iloc[0] == docs["doc_id"].sum()
    assert got["sum_chars"].iloc[0] == docs["n_chars"].sum()


# ------------------------------------- mixing / coverage / compression


def test_epoch_repeat_vs_brute(ray_session):
    import hashlib

    from rendler_ray.pipelines.queries import source_epoch_repeat_docs

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    rows = []
    for _, r in docs.iterrows():
        f = 1 + int(hashlib.md5(r["source"].encode())
                    .hexdigest()[:2], 16) % 3
        for e in range(1, f + 1):
            rows.append((r["doc_id"], r["source"], e))
    want = canon(pd.DataFrame(rows,
                              columns=["doc_id", "source", "epoch"]))
    got = canon(to_pandas(source_epoch_repeat_docs(SF)))
    pd.testing.assert_frame_equal(got, want)


def test_vocab_coverage_vs_brute_and_two_forms(ray_session):
    from collections import Counter

    from rendler_ray.pipelines.queries import vocab_coverage_curve

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text"]).to_pandas()
    cnt = Counter()
    for t in docs["text"]:
        cnt.update(t.split(" "))
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    cs = np.cumsum([c for _, c in ordered])
    want = []
    for k in (10, 100, 1000, 10000):
        cov = int(cs[min(k, len(cs)) - 1])
        want.append((k, cov, total, cov * 1_000_000 // total))
    want = canon(pd.DataFrame(want, columns=["k", "covered", "total",
                                             "coverage_e6"]))
    got = canon(to_pandas(vocab_coverage_curve(SF)))
    pd.testing.assert_frame_equal(got, want)
    # forced distributed form (driver_max=0) must agree exactly
    got2 = canon(to_pandas(vocab_coverage_curve(SF, driver_max=0)))
    pd.testing.assert_frame_equal(got2, want)


def test_compression_ratio_vs_brute(ray_session):
    import zlib

    from rendler_ray.pipelines.queries import compression_ratio_docs

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    docs["raw_bytes"] = [len(t.encode()) for t in docs["text"]]
    docs["zip_bytes"] = [len(zlib.compress(t.encode(), 6))
                         for t in docs["text"]]
    g = docs.groupby("source", as_index=False)[
        ["raw_bytes", "zip_bytes"]].sum()
    g["ratio_e6"] = (g["zip_bytes"] * 1_000_000
                     // g["raw_bytes"].clip(lower=1))
    want = canon(g[["source", "raw_bytes", "zip_bytes", "ratio_e6"]])
    got = canon(to_pandas(compression_ratio_docs(SF)))
    pd.testing.assert_frame_equal(got, want)


def test_leakage_free_split_invariants(ray_session):
    from rendler_ray.pipelines.queries import (
        _verified_jaccard_pairs,
        leakage_free_split_docs,
    )

    got = to_pandas(leakage_free_split_docs(SF))
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id"]).to_pandas()
    # every doc exactly once, splits in {0,1,2}
    assert sorted(got["doc_id"]) == sorted(docs["doc_id"])
    assert set(got["split"]).issubset({0, 1, 2})
    # the guard itself: NO verified near-dup pair straddles splits
    pairs = to_pandas(_verified_jaccard_pairs(SF, "leakfree_test"))
    sp = dict(zip(got["doc_id"], got["split"]))
    cl = dict(zip(got["doc_id"], got["cluster"]))
    assert len(pairs) > 0  # the fixture corpus HAS near-dups
    for a, b in zip(pairs["a"], pairs["b"]):
        assert sp[a] == sp[b]
        assert cl[a] == cl[b]
    # rough 80/10/10 shape: train strictly the biggest bucket
    frac = got["split"].value_counts(normalize=True)
    assert frac.get(0, 0) > 0.6


# ----------------------------------------- curriculum / filtered ANN


def test_curriculum_interleave_vs_brute(ray_session):
    from rendler_ray.pipelines.queries import (
        _clf_weights,
        curriculum_interleave_docs,
    )

    docs = pq.read_table(
        f"{SF}/documents.parquet",
        columns=["doc_id", "text", "source"]).to_pandas()
    scores = []
    for t in docs["text"]:
        toks = np.array(t.split(" "), dtype=object)
        scores.append(int(np.rint(_clf_weights(toks).sum())))
    docs["clf_score"] = scores
    docs["rnk"] = (docs.sort_values(["clf_score", "doc_id"],
                                    ascending=[False, True])
                   .groupby("source").cumcount() + 1)
    docs = docs.sort_values(["rnk", "source", "doc_id"],
                            kind="stable").reset_index(drop=True)
    docs["pos"] = np.arange(1, len(docs) + 1)
    want = canon(docs[["doc_id", "source", "rnk", "pos"]])
    got = canon(to_pandas(curriculum_interleave_docs(SF)))
    pd.testing.assert_frame_equal(got, want)


def test_curriculum_round_robin_property(ray_session):
    """The stream must be rank-major: every rank-1 doc precedes every
    rank-2 doc, etc."""
    from rendler_ray.pipelines.queries import curriculum_interleave_docs

    df = to_pandas(curriculum_interleave_docs(SF)).sort_values("pos")
    assert (np.diff(df["rnk"].to_numpy()) >= 0).all()


def test_ann_filtered_vs_brute(ray_session):
    from rendler_ray.pipelines.queries import ann_filtered_topk

    emb = pq.read_table(
        f"{SF}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"]).to_pandas()
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy(np.int64)
    even = (emb["label"].to_numpy() % 2) == 0
    got = to_pandas(ann_filtered_topk(SF))
    # every hit satisfies the predicate
    evset = set(ids[even].tolist())
    assert set(got["vec_id"]).issubset(evset)
    for q in range(4):
        qv = m[ids == q][0]
        s = np.rint((m[even] @ qv) * 1e6).astype(np.int64)
        order = np.lexsort((ids[even], -s))[:10]
        want_ids = ids[even][order].tolist()
        g = got[got["query_id"] == q].sort_values("rank")
        assert g["vec_id"].tolist() == want_ids


# ------------------------------------------------------------ k-center


def test_kcenter_vs_brute(ray_session):
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas()
    ids = emb["vec_id"].to_numpy(np.int64)
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    k = 16
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    sel = [0]
    centers = [m[ids == 0][0]]
    radius = [0]
    mind = None
    for _ in range(k - 1):
        diff = m - centers[-1][None, :]
        d = np.rint((diff * diff).sum(1) * 1e6).astype(np.int64)
        mind = d if mind is None else np.minimum(mind, d)
        best = np.lexsort((ids, -mind))[0]
        sel.append(int(ids[best]))
        radius.append(int(mind[best]))
        centers.append(m[best])
    got = to_pandas(kcenter_coreset_embeddings(SF, k=k))
    assert got["vec_id"].tolist() == sel
    assert got["radius_e6"].tolist() == radius
    assert got["rank"].tolist() == list(range(k))
    # farthest-point property: selection radii are non-increasing
    assert all(a >= b for a, b in zip(radius[1:], radius[2:]))
