"""Unit tests for the text / ann / media batch kernels."""

import numpy as np
import pyarrow as pa
import pytest

from rendler_ray.functions import text as T


def _docs_batch():
    return pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["the cat sat on the mat", "the cat sat on the mat",
                 "completely different words here now"],
    })


def test_token_and_quality():
    out = T.token_count_batch(_docs_batch())
    assert out["n_tokens"].to_pylist() == [6, 6, 5]
    q = T.quality_batch(_docs_batch())
    assert q["n_stopwords"].to_pylist()[0] == 2  # 'the' twice
    assert q["n_uniq_tokens"].to_pylist()[0] == 5
    r = q["stopword_ratio"].to_pylist()[0]
    assert abs(r - 2 / 6) < 1e-12


def test_md5_and_simhash_dup_detection():
    out = T.md5_fingerprint_batch(_docs_batch())
    fps = out["fingerprint"].to_pylist()
    assert fps[0] == fps[1] != fps[2]
    sh = T.simhash64_batch(_docs_batch())["simhash"].to_pylist()
    assert sh[0] == sh[1]
    assert bin(sh[0] ^ sh[2]).count("1") > 4  # far apart


def test_simhash_near_vs_far():
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "the quick brown fox jumps over the lazy cat again and again"
    c = "entirely unrelated content about databases and query engines"
    t = pa.table({"doc_id": [1, 2, 3], "text": [a, b, c]})
    sh = T.simhash64_batch(t)["simhash"].to_pylist()
    near = bin(sh[0] ^ sh[1]).count("1")
    far = bin(sh[0] ^ sh[2]).count("1")
    assert near < far


def test_minhash_similar_docs_share_bands():
    mh = T.MinHasher(num_perm=64, bands=16)
    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            "a b c d e f g h i j k l m n o p",
            "a b c d e f g h i j k l m n o q",   # 1 token differs
            "z y x w v u t s r q p o n m l k",   # reversed-ish
        ],
    })
    out = mh(t)
    by_doc = {}
    for r in out.to_pylist():
        by_doc.setdefault(r["doc_id"], set()).add((r["band_id"], r["band_hash"]))
    assert len(by_doc[1] & by_doc[2]) > 0, "near-dups must share a band"
    assert len(by_doc[1] & by_doc[3]) == 0


def test_jaccard():
    assert T.jaccard_ngrams("a b c d", "a b c d") == 1.0
    assert T.jaccard_ngrams("a b c d", "x y z w") == 0.0


def test_rolling_fingerprint_deterministic():
    t = "one two three four five six seven eight nine ten eleven twelve"
    assert T.rolling_hash_fingerprint(t) == T.rolling_hash_fingerprint(t)
    # robust to a small append (that's the point of winnowing)...
    assert isinstance(T.rolling_hash_fingerprint(t + " x"), str)
    # ...but different content fingerprints differently
    u = "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu"
    assert T.rolling_hash_fingerprint(t) != T.rolling_hash_fingerprint(u)


def test_lang_id():
    t = pa.table({"doc_id": [1, 2], "text": ["the cat and the dog of it",
                                             "el que de la y el que"]})
    out = T.lang_id_batch(t)
    assert out["lang_pred"].to_pylist() == ["en", "es"]


def test_ann_normalize_and_topk_math():
    from rendler_ray.functions.ann import _normalize

    m = np.array([[3.0, 4.0], [0.0, 0.0]])
    n = _normalize(m)
    assert abs(np.linalg.norm(n[0]) - 1.0) < 1e-12
    assert not np.isnan(n).any()


def test_media_explode_and_decode():
    from rendler_ray.functions.media import MediaDecoder, explode_media_spans
    from rendler_ray.sources.synthweb import generate_docs

    docs = generate_docs(n_docs=50, n_hosts=4, seed=42)
    media = explode_media_spans(docs)
    assert media.num_rows > 0
    assert set(media["kind"].to_pylist()) == {"image"}
    dec = MediaDecoder()
    out = dec(media)
    assert out.num_rows == media.num_rows
    assert (np.array(out["n_bytes"].to_pylist()) >= 64).all()
    # deterministic
    out2 = MediaDecoder()(media)
    assert out["blob"].to_pylist() == out2["blob"].to_pylist()

    with pytest.raises(NotImplementedError):
        MediaDecoder(strict=True)(media)


@pytest.mark.usefixtures("ray_session")
def test_hll_approx_distinct_accuracy():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rendler_ray.functions.sketch import approx_distinct

    rng = np.random.default_rng(0)
    n_true = {"a": 5000, "b": 300, "c": 17}
    rows_k, rows_v = [], []
    for k, n in n_true.items():
        vals = rng.choice(n * 3, size=n, replace=False)
        reps = np.repeat(vals, 3)  # duplicates must not inflate
        rows_k += [k] * len(reps)
        rows_v += [f"{k}-{v}" for v in reps]
    ds = rd.from_arrow(pa.table({"k": rows_k, "v": rows_v}))
    out = {r["k"]: r["approx_distinct"]
           for r in approx_distinct(ds, "k", "v").take_all()}
    for k, n in n_true.items():
        assert abs(out[k] - n) / n < 0.05, (k, out[k], n)


@pytest.mark.usefixtures("ray_session")
def test_ivf_topk_recall_vs_brute_force():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rendler_ray.functions.ann import brute_force_topk, ivf_topk

    rng = np.random.default_rng(3)
    n, d = 2000, 32
    vecs = rng.standard_normal((n, d))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))
    queries = {i: vecs[i] for i in range(5)}
    exact = brute_force_topk(ds, queries, k=10).to_pandas()
    # unstructured gaussian data is IVF's worst case: probe half the
    # lists (real pruning — each query scores only its own probed lists)
    approx = ivf_topk(ds, queries, k=10, n_lists=16, n_probe=8).to_pandas()
    recalls = []
    for q in queries:
        e = set(exact[exact.query_id == q]["vec_id"])
        a = set(approx[approx.query_id == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8, recalls


@pytest.mark.usefixtures("ray_session")
def test_kmeans_deterministic_and_total():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rendler_ray.functions.ann import kmeans_cluster_sizes

    rng = np.random.default_rng(9)
    n, d = 600, 16
    vecs = rng.standard_normal((n, d))
    mk = lambda: rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))}))
    a = {r["cluster"]: r["n_members"]
         for r in kmeans_cluster_sizes(mk(), n_clusters=4, iters=5).take_all()}
    b = {r["cluster"]: r["n_members"]
         for r in kmeans_cluster_sizes(mk(), n_clusters=4, iters=5).take_all()}
    assert a == b
    assert sum(a.values()) == n
    assert len(a) >= 2


@pytest.mark.usefixtures("ray_session")
def test_pagerank_sums_to_one_and_deterministic():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rendler_ray.functions.graph import pagerank

    # a -> b, a -> c, b -> c, c -> a (+ dangling d pointed to by c)
    edges = pa.table({"src": ["a", "a", "b", "c", "c", "a"],
                      "dst": ["b", "c", "c", "a", "d", "b"]})  # dup a->b
    df1 = pagerank(rd.from_arrow(edges), iters=20)
    df2 = pagerank(rd.from_arrow(edges), iters=20)
    assert np.isclose(df1["rank"].sum(), 1.0, atol=1e-9)
    assert df1.equals(df2)
    r = dict(zip(df1["url"], df1["rank"]))
    # c receives from both a and b: highest-ranked non-seed
    assert r["c"] > r["b"] and r["c"] > r["d"]


@pytest.mark.usefixtures("ray_session")
def test_deterministic_sample_overflow_band():
    """sample_rows < n <= 1.3*sample_rows used to overflow uint64 in the
    hash threshold (ADVICE r1); the clamp must keep it exact-size."""
    import ray.data as rd

    from rendler_ray.functions.ann import _deterministic_sample

    n = 5000  # 4096 < 5000 <= 1.3*4096
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([[float(i), 1.0] for i in range(n)],
                              pa.list_(pa.float32()))}))
    out = _deterministic_sample(ds, "vec_id", 4096)
    assert out.num_rows == 4096
    assert len(set(out["vec_id"].to_pylist())) == 4096


def test_lru_get_bounds_and_recency():
    from rendler_ray.util import lru_get

    c: dict = {}
    builds = []
    for k in range(5):
        lru_get(c, k, lambda k=k: builds.append(k) or k, maxsize=3)
    assert len(c) == 3 and list(c) == [2, 3, 4]
    # hit refreshes recency: 2 survives the next insert, 3 is evicted
    assert lru_get(c, 2, lambda: "rebuilt", maxsize=3) == 2
    lru_get(c, 9, lambda: 9, maxsize=3)
    assert list(c) == [4, 2, 9]
    assert builds == [0, 1, 2, 3, 4]


@pytest.mark.usefixtures("ray_session")
def test_pagerank_ds_matches_broadcast_form():
    """The fully distributed (join-based) PageRank must agree with the
    broadcast-dict form to 1e-9 granularity on a random fixture graph."""
    import pandas as pd
    import ray.data as rd

    from rendler_ray.functions.graph import pagerank, pagerank_ds

    rng = np.random.default_rng(3)
    src = rng.integers(0, 120, 800)
    dst = rng.integers(0, 120, 800)
    tbl = pa.table({"src": pa.array([f"u{i}" for i in src]),
                    "dst": pa.array([f"u{i}" for i in dst])})
    a = pagerank(rd.from_arrow(tbl), iters=8).sort_values(
        "url").reset_index(drop=True)
    b = pd.DataFrame(pagerank_ds(rd.from_arrow(tbl), iters=8,
                                 num_partitions=4).take_all()).sort_values(
        "url").reset_index(drop=True)
    assert list(a["url"]) == list(b["url"])
    ae9 = np.round(a["rank"].to_numpy() * 1e9).astype(np.int64)
    be9 = np.round(b["rank"].to_numpy() * 1e9).astype(np.int64)
    assert (ae9 == be9).all()
    assert np.isclose(b["rank"].sum(), 1.0, atol=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_near_dup_bucket_cap_and_unchanged_when_small():
    """LSH near-dup skew guard: an adversarial single hot bucket is
    salted into bounded sub-buckets (each task O(cap²)); with no
    oversized bucket the output is identical to the uncapped run."""
    import pandas as pd
    import ray.data as rd

    from rendler_ray.functions.ann import embedding_near_dup_pairs

    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    # 200 tiny perturbations of one direction: all land in one bucket
    vecs = base[None, :] + 0.001 * rng.standard_normal((200, 16))
    mk = lambda: rd.from_arrow(pa.table({
        "vec_id": pa.array(range(200), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))}))

    full = pd.DataFrame(embedding_near_dup_pairs(
        mk(), threshold=0.99, bits=6, dim=16, max_bucket=None).take_all())
    capped = pd.DataFrame(embedding_near_dup_pairs(
        mk(), threshold=0.99, bits=6, dim=16, max_bucket=50).take_all())
    # capped output is a SUBSET (cross-sub pairs dropped), non-empty,
    # and every sub-bucket still found its internal pairs
    assert 0 < len(capped) < len(full)
    fk = set(zip(full["a"], full["b"]))
    ck = set(zip(capped["a"], capped["b"]))
    assert ck <= fk
    # cap high enough to cover everything -> identical output
    same = pd.DataFrame(embedding_near_dup_pairs(
        mk(), threshold=0.99, bits=6, dim=16, max_bucket=4096).take_all())
    sk = set(zip(same["a"], same["b"]))
    assert sk == fk


@pytest.mark.usefixtures("ray_session")
def test_connected_components():
    """Two components + an isolated self-loop node; labels are the
    lexicographic min url of each component, direction ignored."""
    import pandas as pd
    import ray.data as rd

    from rendler_ray.functions.graph import connected_components_ds

    edges = pa.table({
        #  comp {a,b,c,d} (chain via directed edges both ways),
        #  comp {x,y}, self-loop {z}
        "src": ["b", "c", "d", "y", "z", "b"],
        "dst": ["a", "b", "c", "x", "z", "a"],  # dup b->a
    })
    out = pd.DataFrame(
        connected_components_ds(rd.from_arrow(edges),
                                num_partitions=4).take_all())
    got = dict(zip(out["url"], out["component"]))
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a",
                   "x": "x", "y": "x", "z": "z"}
    # deterministic across runs
    out2 = pd.DataFrame(
        connected_components_ds(rd.from_arrow(edges),
                                num_partitions=4).take_all())
    assert sorted(map(tuple, out.values)) == sorted(map(tuple, out2.values))


@pytest.mark.usefixtures("ray_session")
def test_connected_components_star_matches_propagation():
    """Star contraction (Kiveris SoCC'14) must agree with min-label
    propagation everywhere: the shared fixture, a diameter-16 chain
    (where star needs O(log) rounds), and degenerate graphs."""
    import pandas as pd
    import ray.data as rd

    from rendler_ray.functions.graph import (connected_components_ds,
                                             connected_components_star)

    edges = pa.table({
        "src": ["b", "c", "d", "y", "z", "b"],
        "dst": ["a", "b", "c", "x", "z", "a"],
    })
    out = pd.DataFrame(connected_components_star(
        rd.from_arrow(edges), num_partitions=4).take_all())
    assert dict(zip(out["url"], out["component"])) == {
        "a": "a", "b": "a", "c": "a", "d": "a",
        "x": "x", "y": "x", "z": "z"}

    n = 16
    chain = pa.table({"src": [f"n{i:02d}" for i in range(1, n)],
                      "dst": [f"n{i - 1:02d}" for i in range(1, n)]})
    o1 = pd.DataFrame(connected_components_star(
        rd.from_arrow(chain), num_partitions=4).take_all())
    o2 = pd.DataFrame(connected_components_ds(
        rd.from_arrow(chain), max_iters=30, num_partitions=4).take_all())
    assert sorted(map(tuple, o1.values)) == sorted(map(tuple, o2.values))
    assert set(o1["component"]) == {"n00"}

    # empty edge table and self-loop-only graph
    e0 = pd.DataFrame({"src": pd.Series([], dtype=object),
                       "dst": pd.Series([], dtype=object)})
    assert connected_components_star(
        rd.from_pandas(e0), num_partitions=2).take_all() == []
    sl = pa.table({"src": ["q", "r"], "dst": ["q", "r"]})
    o = pd.DataFrame(connected_components_star(
        rd.from_arrow(sl), num_partitions=2).take_all())
    assert dict(zip(o["url"], o["component"])) == {"q": "q", "r": "r"}


@pytest.mark.usefixtures("ray_session")
def test_bpe_train_classic_merges():
    """Hand-verified first merges on the classic BPE toy corpus
    (weighted pair counts + (count desc, pair asc) tie-break)."""
    import ray.data as rd

    from rendler_ray.functions.bpe import bpe_train

    docs = pa.table({"text": [
        "low low low low low",
        "lower lower",
        "newest newest newest",
        "widest",
    ]})
    out = bpe_train(rd.from_arrow(docs), num_merges=4)
    got = list(zip(out["left"].to_pylist(), out["right"].to_pylist(),
                   out["n"].to_pylist()))
    # (l,o)=7 ties (o,w)=7 -> lexicographic; then (lo,w)=7; then
    # (e,s)=4 ties (s,t)=4 -> lexicographic; then (es,t)=4
    assert got == [("l", "o", 7), ("lo", "w", 7),
                   ("e", "s", 4), ("es", "t", 4)]
    assert out["rank"].to_pylist() == [0, 1, 2, 3]


@pytest.mark.usefixtures("ray_session")
def test_bpe_encode_applies_merges_in_rank_order():
    import ray
    import ray.data as rd

    from rendler_ray.functions.bpe import bpe_encode_batch, encode_word

    merges = [("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t")]
    assert encode_word("lowest", merges) == ["low", "est"]
    assert encode_word("low", merges) == ["low"]
    assert encode_word("slower", merges) == ["s", "low", "e", "r"]

    batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": ["low lowest", "slower low"]})
    out = bpe_encode_batch(batch, merges_ref=ray.put(merges))
    assert out["n_bpe_pieces"].to_pylist() == [1 + 2, 4 + 1]


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_exact_under_adversarial_spread():
    """Two-pass MG must be EXACT: a key exactly at the global threshold
    spread evenly across blocks is kept; one just under it (or locally
    hot but globally under) is dropped."""
    import ray.data as rd

    from rendler_ray.functions.sketch import heavy_hitters

    # 4 blocks x 100 rows, eps=0.05 -> global thr = ceil(0.05*400) = 20
    blocks = []
    for i in range(4):
        vals = (["hot"] * 5                       # 20 total == thr: kept
                + ["edge"] * (5 if i < 3 else 4)  # 19 total: dropped
                + (["sparse"] * 19 if i == 0 else [])  # candidate, 19: drop
                + [f"f{i}_{j}" for j in range(100)])
        blocks.append(pa.table({"k": pa.array(vals[:100], pa.string())}))
    ds = rd.from_arrow(blocks)  # one block per table => one batch each
    got = {r["k"]: r["n"] for r in
           heavy_hitters(ds, "k", eps=0.05).take_all()}
    assert got == {"hot": 20}


@pytest.mark.usefixtures("ray_session")
def test_host_stats_matches_bruteforce():
    """host_stats_from_crawl (partial-aggregate union-groupby shape) ==
    a brute-force pandas recomputation on an inline fixture."""
    import pandas as pd
    import ray.data as rd

    from rendler_ray.functions.canon import host_of
    from rendler_ray.pipelines.queries import host_stats_from_crawl

    edges = pa.table({
        "src": ["s://a/1", "s://a/1", "s://a/2", "s://b/1", "s://b/2"],
        "dst": ["s://a/2", "s://b/1", "s://b/1", "s://a/1", "s://b/1"],
    })
    fetched = pa.table({
        "host": ["a", "a", "b", "b", "c"],
    })
    got = pd.DataFrame(host_stats_from_crawl(
        rd.from_arrow(edges), rd.from_arrow(fetched)).take_all())
    got = got.sort_values("host").reset_index(drop=True)

    e = pd.DataFrame({"sh": [host_of(u) for u in edges["src"].to_pylist()],
                      "dh": [host_of(u) for u in edges["dst"].to_pylist()]})
    exp = {}
    for h in ["a", "b", "c"]:
        out = e[e.sh == h]
        exp[h] = dict(
            pages=int((pd.Series(fetched["host"].to_pylist()) == h).sum()),
            out_edges=len(out),
            in_edges=int((e.dh == h).sum()),
            cross_host_edges=int((out.dh != h).sum()),
            n_dst_hosts=out.dh.nunique())
    for _, row in got.iterrows():
        for k, v in exp[row["host"]].items():
            assert row[k] == v, (row["host"], k, row[k], v)
    assert set(got["host"]) == {"a", "b", "c"}


@pytest.mark.usefixtures("ray_session")
def test_approx_quantiles_accuracy_and_edges():
    """Histogram-sketch quantiles within (max-min)/bins of the exact
    value; constant and empty inputs behave."""
    import numpy as np
    import ray.data as rd

    from rendler_ray.functions.sketch import approx_quantiles

    rng = np.random.default_rng(7)
    v = rng.lognormal(mean=2.0, sigma=1.0, size=20000)
    ds = rd.from_arrow(pa.table({"value": pa.array(v, pa.float64())}))
    out = {r["percent"]: r["value"]
           for r in approx_quantiles(ds, "value", [50, 90, 99],
                                     bins=1 << 14).to_pylist()}
    bound = (v.max() - v.min()) / (1 << 14)
    sv = np.sort(v)
    for p in (50, 90, 99):
        exact = sv[(p * len(v) + 99) // 100 - 1]
        assert abs(out[p] - exact) <= bound, (p, out[p], exact, bound)

    const = rd.from_arrow(pa.table({"value": pa.array([3.5] * 100)}))
    out = approx_quantiles(const, "value", [50, 99]).to_pylist()
    assert all(r["value"] == 3.5 for r in out)

    empty = rd.from_arrow(pa.table({"value": pa.array([], pa.float64())}))
    assert approx_quantiles(empty, "value", [50]).num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_approx_quantiles_by_group_accuracy():
    """Grouped histogram sketch within each group's own (max-min)/bins
    bound vs exact; groups with wildly different ranges."""
    import numpy as np
    import ray.data as rd

    from rendler_ray.functions.sketch import approx_quantiles_by

    rng = np.random.default_rng(11)
    data = {"a": rng.normal(10, 2, 5000),
            "b": rng.lognormal(5, 1, 3000),
            "c": np.full(100, 42.0)}
    ks = np.concatenate([[k] * len(v) for k, v in data.items()])
    vs = np.concatenate(list(data.values()))
    ds = rd.from_arrow(pa.table({"k": pa.array(ks, pa.string()),
                                 "value": pa.array(vs, pa.float64())}))
    bins = 1 << 12
    out = {}
    for r in approx_quantiles_by(ds, "k", "value", [50, 99],
                                 bins=bins).take_all():
        out[(r["k"], r["percent"])] = r["value"]
    for k, v in data.items():
        bound = (v.max() - v.min()) / bins
        sv = np.sort(v)
        for p in (50, 99):
            exact = sv[(p * len(v) + 99) // 100 - 1]
            got = out[(k, p)]
            assert abs(got - exact) <= max(bound, 1e-12), (k, p, got, exact)


@pytest.mark.usefixtures("ray_session")
def test_simhash_banding_matches_bruteforce_all_pairs():
    """4×16-bit banding is LOSSLESS for hamming radius ≤ 3 (pigeonhole):
    the banded pipeline must return exactly the brute-force all-pairs
    result on the real sf0.001 documents table."""
    import pyarrow.parquet as pq

    from rendler_ray.pipelines.queries import QUERIES

    got = QUERIES["simhash_near_dup_pairs"]("/root/testdata/sf0.001")
    got = got.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    sh = T.simhash64_batch(docs)
    ids = sh["doc_id"].to_numpy()
    sig = sh["simhash"].to_numpy().astype(np.uint64)
    iu, ju = np.triu_indices(len(ids), k=1)
    ham = T.hamming64(sig[iu], sig[ju])
    keep = ham <= 3
    import pandas as pd
    exp = pd.DataFrame({
        "a": np.minimum(ids[iu[keep]], ids[ju[keep]]).astype(np.int64),
        "b": np.maximum(ids[iu[keep]], ids[ju[keep]]).astype(np.int64),
        "hamming": ham[keep]}).sort_values(["a", "b"]).reset_index(drop=True)
    assert len(exp) > 0, "fixture corpus has no near-dup pairs"
    pd.testing.assert_frame_equal(
        got[["a", "b", "hamming"]].astype("int64"),
        exp.astype("int64"))


@pytest.mark.usefixtures("ray_session")
def test_near_dup_dedup_matches_union_find():
    """The distributed dedup capstone (verified pairs → star CC →
    survivors) must equal a driver union-find over the same verified
    pairs on the sf0.001 documents table."""
    import pyarrow.parquet as pq

    from rendler_ray.pipelines.queries import QUERIES

    pairs = QUERIES["ngram_jaccard_pairs"]("/root/testdata/sf0.001")
    pairs = pairs.to_pandas()

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
    # canonical min-id rep per member
    rep = {x: find(x) for x in list(parent)}

    all_ids = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                            columns=["doc_id"])["doc_id"].to_pylist()
    expected = sorted((d, rep.get(d, d)) for d in all_ids
                      if rep.get(d, d) == d)

    gdf = QUERIES["near_dup_dedup_docs"]("/root/testdata/sf0.001").to_pandas()
    got = sorted(zip(gdf["doc_id"].astype(int), gdf["cluster"].astype(int)))
    assert len(expected) < len(all_ids), "fixture corpus has no near-dups"
    assert got == expected


@pytest.mark.usefixtures("ray_session")
def test_bloom_filter_no_false_negatives():
    """bloom_build/bloom_contains: every member hits (no false
    negatives — the property the exact-join cleanup relies on), and the
    false-positive rate stays near the k/m design point."""
    import ray.data as rd

    from rendler_ray.functions import sketch as S

    keys = np.arange(5000, dtype=np.int64) * 13 + 7
    ds = rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(4)
    m_bits = 1 << 18
    bm = S.bloom_build(ds, "k", m_bits=m_bits, k=4)

    assert S.bloom_contains(bm, keys, m_bits, 4).all(), "false negative"
    probe = np.arange(100000, dtype=np.int64)
    hit = S.bloom_contains(bm, probe, m_bits, 4)
    members = np.isin(probe, keys)
    assert not (~hit & members).any()
    fp_rate = (hit & ~members).sum() / (~members).sum()
    assert fp_rate < 0.01, fp_rate  # 5k keys in 256k bits, k=4 → ~2e-4


@pytest.mark.usefixtures("ray_session")
def test_connected_components_auto_matches_star():
    """The size-gated driver union-find and the distributed star
    contraction must emit identical (url, component) tables — on a
    multi-component graph with chains, and under a forced-low
    driver_max that exercises the star path through the same entry."""
    import ray.data as rd

    from rendler_ray.functions.graph import (connected_components_auto,
                                             connected_components_star)

    edges = pa.table({
        "src": ["a", "b", "c", "x", "y", "m", "a", "b"],
        "dst": ["b", "c", "d", "y", "z", "m", "b", "a"]})  # dups+loop
    auto = sorted(map(tuple, connected_components_auto(
        rd.from_arrow(edges)).to_pandas().values.tolist()))
    star = sorted(map(tuple, connected_components_star(
        rd.from_arrow(edges)).to_pandas().values.tolist()))
    forced = sorted(map(tuple, connected_components_auto(
        rd.from_arrow(edges), driver_max=2).to_pandas().values.tolist()))
    assert auto == star == forced
    assert auto == [("a", "a"), ("b", "a"), ("c", "a"), ("d", "a"),
                    ("m", "m"), ("x", "x"), ("y", "x"), ("z", "x")]


@pytest.mark.usefixtures("ray_session")
def test_customer_order_counts_null_fill(tmp_path):
    """The testdata has no zero-order customers, so pin the LEFT-join
    null-fill path with a synthetic pair of tables."""
    import pyarrow.parquet as pq

    from rendler_ray.pipelines.queries import QUERIES

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_mktsegment": ["A", "B", "A"],
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1], pa.int64()),
        "o_totalprice": pa.array([10.5, 2.25], pa.float64()),
    }), str(tmp_path / "orders.parquet"))

    df = (QUERIES["customer_order_counts"](str(tmp_path))
          .to_pandas().sort_values("c_custkey").reset_index(drop=True))
    assert df["n_orders"].tolist() == [2, 0, 0]
    assert df["spend_c"].tolist() == [1275, 0, 0]


@pytest.mark.usefixtures("ray_session")
def test_simhash_hot_bucket_salting():
    """Adversarial boilerplate corpus: 1000 docs with IDENTICAL simhash
    put all 4 band buckets at size 1000. Salting must split each into
    hash-of-id sub-buckets (bounding the in-bucket O(b²) verify), and
    must pass a cold corpus through with keys UNCHANGED."""
    import pandas as pd
    import ray.data as rd

    from rendler_ray.functions.ann import salt_hot_int_buckets
    from rendler_ray.functions.text import simhash_bands_batch

    n = 1000
    hot = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "simhash": pa.array(np.full(n, 123456789, np.int64))})
    banded = rd.from_arrow(hot).map_batches(
        simhash_bands_batch, batch_format="pyarrow")
    salted = salt_hot_int_buckets(banded, max_bucket=64)
    df = salted.to_pandas()
    assert len(df) == 4 * n
    sizes = df.groupby("bucket_key").size()
    # 16 hash-of-id sub-buckets per band: max group far below n (hash
    # balance, not an exact split) and well past 4 groups total
    assert sizes.max() <= 4 * 64
    assert sizes.size >= 4 * 8
    # signatures ride along unchanged — in-bucket verify still works
    assert (df["simhash"] == 123456789).all()

    cold = pa.table({
        "doc_id": pa.array(np.arange(10, dtype=np.int64)),
        "simhash": pa.array(np.arange(10, dtype=np.int64) * 999983)})
    b2 = rd.from_arrow(cold).map_batches(
        simhash_bands_batch, batch_format="pyarrow")
    out = (salt_hot_int_buckets(b2, max_bucket=64).to_pandas()
           .sort_values(["doc_id", "bucket_key"]).reset_index(drop=True))
    exp = (b2.to_pandas()
           .sort_values(["doc_id", "bucket_key"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, exp)


@pytest.mark.usefixtures("ray_session")
def test_pagerank_auto_gate_switches_identical_e9():
    """pagerank_auto with a forced-low driver_max must take the
    distributed pagerank_ds path and produce the same 1e-9 fixed-point
    ranks as the broadcast path (the gate is invisible in output)."""
    import pandas as pd
    import ray.data as rd

    from rendler_ray.functions.graph import pagerank_auto

    rng = np.random.default_rng(11)
    src = rng.integers(0, 60, 300)
    dst = rng.integers(0, 60, 300)
    tbl = pa.table({"src": pa.array([f"u{i}" for i in src]),
                    "dst": pa.array([f"u{i}" for i in dst])})
    lo = pd.DataFrame(pagerank_auto(rd.from_arrow(tbl), iters=8,
                                    driver_max=2,
                                    num_partitions=4).take_all())
    hi = pd.DataFrame(pagerank_auto(rd.from_arrow(tbl), iters=8,
                                    driver_max=10**6).take_all())
    lo = lo.sort_values("url").reset_index(drop=True)
    hi = hi.sort_values("url").reset_index(drop=True)
    assert list(lo["url"]) == list(hi["url"])
    le9 = np.round(lo["rank"].to_numpy() * 1e9).astype(np.int64)
    he9 = np.round(hi["rank"].to_numpy() * 1e9).astype(np.int64)
    assert (le9 == he9).all()


def test_scrub_regex_removes_all_url_tokens():
    """The scrub kernel's regex redacts absolute and host-relative URL
    tokens and counts them."""
    import pyarrow.compute as pc

    txt = pa.array(["see s://h003/p00007 and /p00123 here",
                    "no links at all"])
    pat = r"(s://h\d{3})?/p\d{5}"
    assert pc.count_substring_regex(txt, pat).to_pylist() == [2, 0]
    red = pc.replace_substring_regex(txt, pat, "<|url|>").to_pylist()
    assert red[0] == "see <|url|> and <|url|> here"
    assert "p00" not in red[0]


def test_band_hashes_batch_matches_reference_loop():
    """The vectorized FNV band fold (r4 — replaced the per-(doc, band)
    md5 loop) must bit-match a plain per-row reference implementation,
    and identical band slices must collide while differing ones don't."""
    rng = np.random.default_rng(12)
    sigs = rng.integers(0, 2**63, size=(7, 64), dtype=np.uint64)
    sigs[3] = sigs[0]  # identical signature → identical band hashes
    bands, rb = 16, 4
    got = T.band_hashes_batch(sigs, bands)

    def ref(sig, b):
        h = np.uint64(0xCBF29CE484222325)
        prime = np.uint64(0x100000001B3)
        for j in range(rb):
            h = np.uint64((int(h) ^ int(sig[b * rb + j])) *
                          int(prime) % (1 << 64))
        h = np.uint64((int(h) ^ b) * int(prime) % (1 << 64))
        h = np.uint64(int(h) ^ (int(h) >> 29))
        return format(int(h), "016x")

    for i in range(len(sigs)):
        for b in range(bands):
            assert got[i, b] == ref(sigs[i], b)
    assert (got[3] == got[0]).all()
    assert (got[1] != got[0]).any()
