"""Round-4b ops: paragraph/segment dedup, per-source quartiles,
deterministic epoch shuffle, quality-aware near-dup dedup — each
checked against an independent brute-force recomputation (and, for the
size-gated dedup, two-form equality broadcast vs join fallback)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rendler_ray.goldenhash import to_pandas
from rendler_ray.pipelines.queries import (
    _PARA_SEG_TOKENS,
    QUERIES,
    epoch_shuffle_docs,
    near_dup_keep_best_docs,
    paragraph_dedup_docs,
    source_quartiles,
)

SF = "/root/testdata/sf0.001"


def _brute_para(texts: dict[int, str]):
    """Python-loop reference for the segment dedup: tile, count distinct
    docs per segment text, drop dup segments, rejoin."""
    segs = {}
    for d, t in texts.items():
        tk = t.split(" ")
        segs[d] = [" ".join(tk[i:i + _PARA_SEG_TOKENS])
                   for i in range(0, len(tk), _PARA_SEG_TOKENS)]
    ndocs = {}
    for d, ss in segs.items():
        for s in set(ss):
            ndocs[s] = ndocs.get(s, 0) + 1
    out = {}
    for d, ss in segs.items():
        kept = [s for s in ss if ndocs[s] < 2]
        rm = len(ss) - len(kept)
        if rm:
            out[d] = (rm, hashlib.md5(
                " ".join(kept).encode()).hexdigest())
    return out


def _para_fixture(tmp_path) -> dict[int, str]:
    shared = " ".join(f"w{i}" for i in range(_PARA_SEG_TOKENS))
    shared2 = " ".join(f"x{i}" for i in range(_PARA_SEG_TOKENS))
    texts = {
        0: shared + " " + " ".join(f"a{i}" for i in range(30)),
        1: shared + " " + " ".join(f"b{i}" for i in range(7)),
        2: shared,                        # everything removed -> md5('')
        3: " ".join(f"c{i}" for i in range(45)),  # untouched
        4: shared2 + " " + shared,        # two dup segments
        5: shared2 + " tail words here",
        # same SHORT tail in two docs (tail tiles compare by text too)
        6: " ".join(f"d{i}" for i in range(25)) + " common short tail",
        7: " ".join(f"e{i}" for i in range(25)) + " common short tail",
    }
    pq.write_table(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": list(texts.values()),
    }), str(tmp_path / "documents.parquet"))
    return texts


@pytest.mark.usefixtures("ray_session")
def test_paragraph_dedup_brute_force(tmp_path):
    texts = _para_fixture(tmp_path)
    got = to_pandas(paragraph_dedup_docs(str(tmp_path)))
    exp = _brute_para(texts)
    assert len(exp) >= 4, "fixture must have affected docs"
    got_d = {int(r.doc_id): (int(r.n_removed_segments), r.cleaned_md5)
             for r in got.itertuples()}
    assert got_d == exp
    # doc 2 loses everything -> md5 of empty string
    assert got_d[2][1] == hashlib.md5(b"").hexdigest()
    assert 3 not in got_d  # untouched docs are not emitted


@pytest.mark.usefixtures("ray_session")
def test_paragraph_dedup_join_equals_broadcast(tmp_path):
    """broadcast_max=0 forces the int-keyed join fallback — identical
    output to the broadcast form on the same corpus."""
    _para_fixture(tmp_path)
    a = to_pandas(paragraph_dedup_docs(str(tmp_path))).sort_values(
        "doc_id").reset_index(drop=True)
    b = to_pandas(paragraph_dedup_docs(str(tmp_path), broadcast_max=0)
                  ).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


@pytest.mark.usefixtures("ray_session")
def test_source_quartiles_brute_force(tmp_path):
    rng = np.random.default_rng(7)
    rows = []
    for s, n in (("a", 1), ("b", 2), ("c", 7), ("d", 100)):
        for v in rng.integers(0, 5000, n):
            rows.append((s, int(v)))
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "source": pa.array([r[0] for r in rows], pa.string()),
        "n_chars": pa.array([r[1] for r in rows], pa.int64()),
    }), str(tmp_path / "documents.parquet"))

    got = to_pandas(source_quartiles(str(tmp_path))).set_index("source")
    df = pd.DataFrame(rows, columns=["source", "n_chars"])
    for s, g in df.groupby("source"):
        v = np.sort(g["n_chars"].to_numpy())
        n = len(v)
        for col, q in (("p25", 25), ("p50", 50), ("p75", 75)):
            assert int(got.loc[s, col]) == int(v[(n - 1) * q // 100]), (
                s, col)


@pytest.mark.usefixtures("ray_session")
def test_epoch_shuffle_is_seeded_permutation():
    got = to_pandas(epoch_shuffle_docs(SF)).sort_values("epoch_rank")
    n = len(got)
    # dense 1..n rank, every doc exactly once
    assert list(got["epoch_rank"]) == list(range(1, n + 1))
    assert got["doc_id"].is_unique
    # rank order == sort by (mix(doc_id), doc_id): recompute the mix
    d = got["doc_id"].to_numpy(np.int64)
    k1 = (d * 2654435761) % 2147483648
    k2 = (np.bitwise_xor(k1, k1 // 4096) * 2654435761) % 2147483648
    k3 = np.bitwise_xor(k2, k2 // 4096)
    assert (k3 == got["shuffle_key"].to_numpy(np.int64)).all()
    order = np.lexsort((d, k3))
    assert (order == np.arange(n)).all()
    # it actually shuffles: the permutation is far from identity
    assert (got["doc_id"].to_numpy() != np.sort(d)).mean() > 0.9
    # deterministic across runs
    again = to_pandas(epoch_shuffle_docs(SF)).sort_values("epoch_rank")
    assert list(again["doc_id"]) == list(got["doc_id"])


@pytest.mark.usefixtures("ray_session")
def test_near_dup_keep_best_matches_union_find():
    """Keep-best dedup must equal a driver union-find over the same
    verified pair set with the argmax(n_chars, -doc_id) survivor rule."""
    pairs = QUERIES["ngram_jaccard_pairs"](SF).to_pandas()

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "n_chars"])
    nchars = dict(zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()))
    clusters: dict[int, list[int]] = {}
    for d in nchars:
        clusters.setdefault(find(d) if d in parent else d, []).append(d)
    expected = sorted(
        (max(ms, key=lambda d: (nchars[d], -d)), c, )
        for c, ms in clusters.items())
    expected = [(d, c, nchars[d]) for d, c in expected]

    gdf = to_pandas(near_dup_keep_best_docs(SF))
    got = sorted(zip(gdf["doc_id"].astype(int), gdf["cluster"].astype(int),
                     gdf["n_chars"].astype(int)))
    assert len(expected) < len(nchars), "fixture corpus has no near-dups"
    assert got == expected
    # the rule differs from min-doc-id on this corpus (the test bites)
    mins = sorted((min(ms), c) for c, ms in clusters.items())
    assert [g[:2] for g in got] != mins


@pytest.mark.usefixtures("ray_session")
def test_ann_pq_topk_recall():
    """PQ + exact re-rank must recover (nearly) the brute-force top-10:
    measured 1.0 mean recall at both test scales; the bound leaves room
    for codebook drift without letting a broken encoder pass."""
    from rendler_ray.pipelines.queries import ann_pq_topk, ann_topk

    bf = ann_topk(SF).to_pandas()
    pq = to_pandas(ann_pq_topk(SF))
    recs = []
    for q in sorted(bf["query_id"].unique()):
        b = set(bf[bf.query_id == q]["vec_id"])
        p = set(pq[pq.query_id == q]["vec_id"])
        recs.append(len(b & p) / len(b))
    assert np.mean(recs) >= 0.8, recs
    assert min(recs) >= 0.5, recs
    # per-query output is exactly k ranked rows with exact-cosine scores
    assert (pq.groupby("query_id").size() == 10).all()


@pytest.mark.usefixtures("ray_session")
def test_semantic_decontam_brute_force():
    from rendler_ray.pipelines.queries import semantic_decontam_docs

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist())
    m = np.stack([np.asarray(v, np.float64)
                  for v in t["embedding"].to_pylist()])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    qm, cm = m[ids < 16], m[ids >= 16]
    cids = ids[ids >= 16]
    se6 = np.round((qm @ cm.T) * 1e6).astype(np.int64)
    nm = (se6 >= 300_000).sum(axis=0)
    exp = {int(c): (int(n), int(mx))
           for c, n, mx in zip(cids, nm, se6.max(axis=0)) if n > 0}
    got = to_pandas(semantic_decontam_docs(SF))
    got_d = {int(r.vec_id): (int(r.n_matches), int(r.max_sim_e6))
             for r in got.itertuples()}
    assert len(exp) > 0, "fixture has no contaminated vectors"
    assert got_d == exp


@pytest.mark.usefixtures("ray_session")
def test_dedup_events_window_brute_force(tmp_path):
    """Debounce semantics vs a python loop, incl. the exact-3600s
    boundary (strictly-greater keeps) and cross-type independence."""
    from rendler_ray.pipelines.queries import dedup_events_window

    rows = [  # (event_id, us, user, type)
        (1, 0, 7, "view"),
        (2, 10, 7, "view"),            # dup (10us later)
        (3, 3_600_000_000, 7, "view"),  # exactly 3600s after #1: dup
        (4, 3_600_000_011, 7, "view"),  # 11us after #3 (the LAG): dup
        (5, 5, 7, "click"),             # other type: kept
        (6, 0, 8, "view"),              # other user: kept
        (7, 0, 9, "buy"),
        (8, 7_300_000_000, 9, "buy"),   # > 2h later: kept
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    }), str(tmp_path / "events.parquet"))

    got = to_pandas(dedup_events_window(str(tmp_path)))
    kept = {}
    for eid, us, u, t in sorted(rows, key=lambda r: (r[2], r[3], r[1], r[0])):
        prev = kept.get(("last", u, t))
        keep = prev is None or us - prev > 3_600_000_000
        kept[("last", u, t)] = us  # LAG vs previous RAW event
        if keep:
            kept[eid] = us
    exp = sorted(e for e in kept if isinstance(e, int))
    assert sorted(got["event_id"]) == exp == [1, 5, 6, 7, 8]


@pytest.mark.usefixtures("ray_session")
def test_sample_exact_k_is_uniform_top_k():
    from rendler_ray.pipelines.queries import sample_docs_exact_k

    got = to_pandas(sample_docs_exact_k(SF)).sort_values("sample_rank")
    assert len(got) == 100 and got["doc_id"].is_unique
    # equals the numpy top-100 of the same mix over all doc_ids
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    d = np.asarray(t["doc_id"].to_pylist(), np.int64)
    k1 = (d * 2246822519) % 2147483648
    k2 = (np.bitwise_xor(k1, k1 // 4096) * 2246822519) % 2147483648
    key = np.bitwise_xor(k2, k2 // 4096)
    order = np.lexsort((d, key))[:100]
    assert list(got["doc_id"]) == d[order].tolist()
    # k larger than the corpus: every row, dense ranks
    allr = to_pandas(sample_docs_exact_k(SF, k=10**6))
    assert len(allr) == len(d)
    assert sorted(allr["sample_rank"]) == list(range(1, len(d) + 1))


@pytest.mark.usefixtures("ray_session")
def test_media_text_match_brute_force():
    """The distributed cross-modal chain (actor-pool text tower +
    projected image features + partial-top-k matching) must equal a
    driver recomputation with the same stub encoders."""
    from rendler_ray.functions.ann import _normalize
    from rendler_ray.pipelines.queries import (_synth_docs_for,
                                               media_text_match)
    from rendler_ray.stages.embed import TextEmbedder
    from rendler_ray.stages.enrich import page_text_column
    from rendler_ray.functions import media as F_media

    got = to_pandas(media_text_match(SF))
    assert got["media_ref"].nunique() == 16
    assert sorted(got.groupby("media_ref")["rank"].apply(list).iloc[0]) \
        == [1, 2, 3]

    docs = pq.read_table(_synth_docs_for(SF))
    texts = page_text_column(docs)
    emb_t = TextEmbedder(text_col="page_text")(
        texts.select(["doc_id", "page_text"]))
    tm = np.stack([np.asarray(v, np.float64)
                   for v in emb_t["embedding"].to_pylist()])
    tids = emb_t["doc_id"].to_pylist()

    media = F_media.explode_media_spans(docs)
    dec = F_media.MediaDecoder()(media)
    refs_all = dec["media_ref"].to_pylist()
    order = np.argsort(np.asarray(refs_all, dtype=object))[:16]
    proj = np.random.default_rng(99).standard_normal((8, 64))
    exp_rows = {}
    for i in order:
        r = refs_all[int(i)]
        q = np.asarray(dec["feature"][int(i)].as_py(), np.float64) @ proj
        s = _normalize(q[None, :])[0] @ _normalize(tm).T
        se6 = np.round(s * 1e6).astype(np.int64)
        top = sorted(zip(-se6, tids))[:3]
        exp_rows[r] = [(d, int(-ns)) for ns, d in top]
    for r, rows in exp_rows.items():
        g = got[got.media_ref == r].sort_values("rank")
        assert list(zip(g["doc_id"], g["score_e6"])) == rows, r


@pytest.mark.usefixtures("ray_session")
def test_bm25_brute_force(tmp_path):
    """BM25 vs an independent per-doc loop (Lucene idf variant), on a
    corpus where tf saturation and length normalization both bite."""
    import math

    from rendler_ray.pipelines.queries import (_BM25_B, _BM25_K1,
                                               _BM25_QUERIES,
                                               bm25_search_docs)

    texts = {
        0: "hash join hash join hash",           # high tf, short
        1: "hash join " + "filler " * 40,        # low density, long
        2: "hash " + "pad " * 5,                 # one term only
        3: "join",                               # one term, tiny dl
        4: "sort merge sort",                    # other query
        5: "nothing relevant here at all",       # no hits
        6: "window stream window stream window stream",
        7: "table scan table scan",
    }
    pq.write_table(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": list(texts.values()),
    }), str(tmp_path / "documents.parquet"))

    toks = {d: t.split(" ") for d, t in texts.items()}
    n = len(texts)
    avgdl = sum(len(v) for v in toks.values()) / n
    exp = {}
    for qid, qt in _BM25_QUERIES.items():
        rows = []
        for d, tk in toks.items():
            s = 0.0
            hit = False
            for term in qt:
                tf = tk.count(term)
                if tf:
                    hit = True
                df = sum(1 for v in toks.values() if term in v)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                norm = _BM25_K1 * (1.0 - _BM25_B
                                   + _BM25_B * (len(tk) / avgdl))
                s += idf * (tf * (_BM25_K1 + 1.0)) / (tf + norm)
            if hit:
                rows.append((-int(np.round(s * 1e6)), d))
        rows.sort()
        exp[qid] = [(d, -ns, r + 1) for r, (ns, d) in enumerate(rows[:10])]

    got = to_pandas(bm25_search_docs(str(tmp_path)))
    for qid in _BM25_QUERIES:
        g = got[got.query_id == qid].sort_values("rank")
        assert (list(zip(g["doc_id"], g["score_e6"], g["rank"]))
                == exp[qid]), qid
    # saturation sanity: 5 hash-terms in 5 tokens beats 2 in 42
    q0 = got[got.query_id == 0].set_index("doc_id")
    assert q0.loc[0, "rank"] < q0.loc[1, "rank"]
    assert 5 not in set(got["doc_id"])  # no-hit doc never appears


@pytest.mark.usefixtures("ray_session")
def test_label_propagation_matches_reference():
    """Distributed sync LPA == a pure-python synchronous recompute on a
    two-community barbell graph (and the communities separate)."""
    import ray.data as rd

    from rendler_ray.functions.graph import label_propagation_ds

    def reference(edges, iters=5):
        adj: dict[str, set] = {}
        for s, d in edges:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
        lab = {v: v for v in adj}
        for _ in range(iters):
            new = {}
            for v in adj:
                cnt: dict[str, int] = {}
                for nb in adj[v]:
                    cnt[lab[nb]] = cnt.get(lab[nb], 0) + 1
                new[v] = sorted(cnt, key=lambda l: (-cnt[l], l))[0]
            lab = new
        return lab

    def run(edges):
        ds = rd.from_arrow(pa.table({
            "src": pa.array([e[0] for e in edges], pa.string()),
            "dst": pa.array([e[1] for e in edges], pa.string())}))
        return {r["url"]: r["label"]
                for r in label_propagation_ds(ds, iters=5).take_all()}

    # barbell: two triangles bridged by one edge
    barbell = [("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
               ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
               ("a1", "b1")]
    assert run(barbell) == reference(barbell)
    # hub-and-spokes plus a dense clique hanging off one spoke —
    # asymmetric degrees exercise the count-vs-tie mode path
    star = [("h", f"s{i}") for i in range(5)] + \
        [("s0", "c1"), ("s0", "c2"), ("c1", "c2"),
         ("c1", "c3"), ("c2", "c3"), ("s0", "c3")]
    assert run(star) == reference(star)
