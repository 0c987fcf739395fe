"""Round-4c ops: dataset-card stats, length buckets, OOV coverage,
temperature-reweighted source mixing — each checked against an
independent pure-Python brute-force recomputation over the sf0.001
documents table (the DuckDB oracle is checked separately by
scripts/check_correctness.py; these tests must not depend on it)."""

import collections
import hashlib
import math

import pyarrow.parquet as pq

from rendler_ray.goldenhash import to_pandas
from rendler_ray.pipelines.queries import (
    corpus_stats_by_source,
    doc_length_buckets,
    oov_rate_docs,
    temperature_mix_docs,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return pq.read_table(
        f"{SF}/documents.parquet",
        columns=["doc_id", "text", "source", "n_chars"]).to_pylist()


def test_corpus_stats_by_source(ray_session):
    rows = _docs()
    agg = {}
    for r in rows:
        toks = r["text"].split(" ")
        s = agg.setdefault(r["source"],
                           dict(n_docs=0, n_tokens=0, max_tokens=0,
                                sum_chars=0, vocab=set()))
        s["n_docs"] += 1
        s["n_tokens"] += len(toks)
        s["max_tokens"] = max(s["max_tokens"], len(toks))
        s["sum_chars"] += r["n_chars"]
        s["vocab"].update(toks)
    got = to_pandas(corpus_stats_by_source(SF)).set_index("source")
    assert len(got) == len(agg)
    for src, s in agg.items():
        g = got.loc[src]
        assert (int(g["n_docs"]), int(g["n_tokens"]), int(g["max_tokens"]),
                int(g["sum_chars"]), int(g["n_vocab"])) == (
            s["n_docs"], s["n_tokens"], s["max_tokens"], s["sum_chars"],
            len(s["vocab"]))


def test_doc_length_buckets(ray_session):
    rows = _docs()
    exp = collections.Counter()
    exp_tok = collections.Counter()
    for r in rows:
        n = len(r["text"].split(" "))
        exp[n.bit_length()] += 1
        exp_tok[n.bit_length()] += n
    got = to_pandas(doc_length_buckets(SF)).set_index("bucket")
    assert set(got.index) == set(exp)
    for b in exp:
        assert int(got.loc[b, "n_docs"]) == exp[b]
        assert int(got.loc[b, "n_tokens"]) == exp_tok[b]


def test_oov_rate_docs(ray_session):
    rows = _docs()
    freq = collections.Counter()
    for r in rows:
        freq.update(r["text"].split(" "))
    # frequency desc, token asc — the deterministic vocabulary cut
    vocab = set(t for t, _ in sorted(
        freq.items(), key=lambda kv: (-kv[1], kv[0]))[:1000])
    got = to_pandas(oov_rate_docs(SF)).set_index("doc_id")
    assert len(got) == len(rows)
    for r in rows:
        toks = r["text"].split(" ")
        g = got.loc[r["doc_id"]]
        assert int(g["n_tokens"]) == len(toks)
        assert int(g["n_oov"]) == sum(1 for t in toks if t not in vocab)


def test_temperature_mix_docs(ray_session):
    rows = _docs()
    by_src = collections.defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r["doc_id"])
    exp = set()
    for src, ids in by_src.items():
        q = min(len(ids), 4 * math.isqrt(len(ids)))
        ranked = sorted(
            ids, key=lambda i: hashlib.md5(f"{i}-mx1".encode()).hexdigest())
        exp.update(ranked[:q])
    got = to_pandas(temperature_mix_docs(SF))
    assert set(got["doc_id"]) == exp
    # sub-sqrt scaling: every source's kept count is its quota
    kept = got.groupby("source").size()
    for src, ids in by_src.items():
        assert kept[src] == min(len(ids), 4 * math.isqrt(len(ids)))


def _hits_reference(edges, iters=10):
    """Dense numpy HITS with max-normalization (the implementation's
    documented variant) over distinct edges."""
    import numpy as np

    es = sorted(set(edges))
    nodes = sorted({s for s, _ in es} | {d for _, d in es})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    E = np.zeros((n, n))
    for s, d in es:
        E[idx[s], idx[d]] = 1.0
    hub = np.ones(n)
    auth = np.zeros(n)
    for _ in range(iters):
        auth = E.T @ hub
        m = auth.max()
        auth = auth / m if m > 0 else auth * 0.0
        hub = E @ auth
        m = hub.max()
        hub = hub / m if m > 0 else hub * 0.0
    return nodes, hub, auth


def test_hits_broadcast_matches_dense_reference(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rendler_ray.functions.graph import hits

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
             ("d", "c"), ("a", "b")]  # dup a->b counts once
    tbl = pa.table({"src": [s for s, _ in edges],
                    "dst": [d for _, d in edges]})
    df = hits(rd.from_arrow(tbl), iters=10)
    nodes, hub, auth = _hits_reference(edges)
    assert list(df["url"]) == nodes
    assert np.allclose(df["hub"].to_numpy(), hub, atol=1e-12)
    assert np.allclose(df["auth"].to_numpy(), auth, atol=1e-12)
    # c is cited by a, b, d: the top authority; a links to top
    # authorities: the top hub
    got = df.set_index("url")
    assert got.loc["c", "auth"] == 1.0
    assert got.loc["a", "hub"] == 1.0


def test_hits_ds_matches_broadcast_form(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rendler_ray.functions.graph import hits, hits_ds

    rng = __import__("numpy").random.default_rng(7)
    src = rng.integers(0, 80, 500)
    dst = rng.integers(0, 80, 500)
    tbl = pa.table({"src": pa.array([f"u{i}" for i in src]),
                    "dst": pa.array([f"u{i}" for i in dst])})
    a = hits(rd.from_arrow(tbl), iters=6).sort_values(
        "url").reset_index(drop=True)
    b = pd.DataFrame(hits_ds(rd.from_arrow(tbl), iters=6,
                             num_partitions=4).take_all()).sort_values(
        "url").reset_index(drop=True)
    assert list(a["url"]) == list(b["url"])
    for col in ("hub", "auth"):
        ae9 = np.round(a[col].to_numpy() * 1e9).astype(np.int64)
        be9 = np.round(b[col].to_numpy() * 1e9).astype(np.int64)
        assert (ae9 == be9).all()


def test_verify_driver_fold_matches_distributed(ray_session, monkeypatch):
    """The size-gated driver verify (and the keep-best driver finisher)
    must emit exactly the distributed forms' rows — gate invisible."""
    import rendler_ray.pipelines.queries as Q

    def snap(ds):
        df = to_pandas(ds)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    a_pairs = snap(Q._verified_jaccard_pairs(SF, "tfdrv"))
    a_best = snap(Q.near_dup_keep_best_docs(SF))
    monkeypatch.setattr(Q, "_VERIFY_DRIVER_MAX", -1)
    b_pairs = snap(Q._verified_jaccard_pairs(SF, "tfdist"))
    b_best = snap(Q.near_dup_keep_best_docs(SF))
    assert a_pairs.equals(b_pairs)
    assert a_best.equals(b_best)


def test_prefix_dup_matrix_brute(ray_session):
    """Combinatorial pair counts must equal the enumerated pair count
    over a brute-force fingerprint index."""
    import itertools

    from rendler_ray.pipelines.queries import prefix_dup_source_matrix

    rows = _docs()
    fp = {}
    for r in rows:
        key = hashlib.md5(
            " ".join(r["text"].split(" ")[:8]).encode()).hexdigest()
        fp.setdefault(key, []).append(r["source"])
    exp = collections.Counter()
    for srcs in fp.values():
        for a, b in itertools.combinations(srcs, 2):
            exp[(min(a, b), max(a, b))] += 1
    got = to_pandas(prefix_dup_source_matrix(SF))
    gm = {(r.src_a, r.src_b): r.n_pairs for r in got.itertuples()}
    assert gm == dict(exp)


def test_near_dup_source_matrix_two_forms(ray_session, monkeypatch):
    """Driver fold vs double-hash-join source lookup: identical rows."""
    import rendler_ray.pipelines.queries as Q

    def snap(df):
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    a = snap(to_pandas(Q.near_dup_source_matrix(SF)))
    monkeypatch.setattr(Q, "_VERIFY_DRIVER_MAX", -1)
    b = snap(to_pandas(Q.near_dup_source_matrix(SF)))
    assert len(a) and a.equals(b)
