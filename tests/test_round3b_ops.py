"""Round-3 second-half ops: duplicate-span stats, classifier scoring,
dense-rank / first-last windows, SemDeDup — each checked against an
independent brute-force recomputation."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rendler_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_dup_span_stats_brute_force(tmp_path):
    texts = {
        0: "a b c d e f g",            # 3 grams, 2 shared with doc 1
        1: "x a b c d e f y",          # 4 grams, 2 shared with doc 0
        2: "one two three",            # short: whole text is the gram
        3: "one two three",            # duplicate short doc
        4: "totally unique words only here",  # 1 gram, unshared
    }
    pq.write_table(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": list(texts.values()),
    }), str(tmp_path / "documents.parquet"))

    def grams(s):
        t = s.split(" ")
        if len(t) < 5:
            return [s]
        return [" ".join(t[i:i + 5]) for i in range(len(t) - 4)]

    owners = {}
    for d, s in texts.items():
        for g in set(grams(s)):
            owners.setdefault(g, set()).add(d)
    dup = {g for g, ds in owners.items() if len(ds) >= 2}
    want = {d: sum(g in dup for g in grams(s))
            for d, s in texts.items()}
    want = {d: n for d, n in want.items() if n > 0}

    got = (QUERIES["dup_span_stats_docs"](str(tmp_path)).to_pandas()
           .set_index("doc_id")["n_dup_grams"].to_dict())
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_dup_span_driver_gate_equals_distributed():
    """The bounded-driver Arrow fold (default below 5M gram instances)
    and the distributed two-shuffle form must agree exactly — the
    connected_components_auto gate-invisibility contract."""
    from rendler_ray.goldenhash import to_pandas
    from rendler_ray.pipelines.queries import dup_span_stats_docs

    a = (to_pandas(dup_span_stats_docs(SF))
         .sort_values("doc_id").reset_index(drop=True))
    b = (to_pandas(dup_span_stats_docs(SF, driver_max=0))
         .sort_values("doc_id").reset_index(drop=True))
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_trigram_fluency_driver_gate_equals_distributed():
    """trigram_fluency_docs' bounded-driver Arrow fold and its
    distributed hash-join form must agree exactly (same contract as
    dup_span_stats_docs — hashed n-gram keys, size-gated finish)."""
    from rendler_ray.goldenhash import to_pandas
    from rendler_ray.pipelines.queries import trigram_fluency_docs

    a = (to_pandas(trigram_fluency_docs(SF))
         .sort_values("doc_id").reset_index(drop=True))
    b = (to_pandas(trigram_fluency_docs(SF, driver_max=0))
         .sort_values("doc_id").reset_index(drop=True))
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_tfidf_driver_gate_equals_distributed():
    """tfidf_top_terms' bounded-driver fold and its distributed
    join + map_groups form must agree exactly."""
    from rendler_ray.goldenhash import to_pandas
    from rendler_ray.pipelines.queries import tfidf_top_terms

    key = ["doc_id", "token"]
    a = (to_pandas(tfidf_top_terms(SF))
         .sort_values(key).reset_index(drop=True))
    b = (to_pandas(tfidf_top_terms(SF, driver_max=0))
         .sort_values(key).reset_index(drop=True))
    assert len(a) > 0
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


@pytest.mark.usefixtures("ray_session")
def test_classifier_score_brute_force(tmp_path):
    texts = ["the cat sat", "on the mat today", "zebra"]
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": texts,
    }), str(tmp_path / "documents.parquet"))

    def w(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15],
                   16) % 1001 - 500

    want = [sum(w(t) for t in s.split(" ")) for s in texts]
    df = (QUERIES["classifier_score_docs"](str(tmp_path)).to_pandas()
          .sort_values("doc_id"))
    assert df["clf_score"].tolist() == want
    assert df["keep_flag"].tolist() == [int(s > 0) for s in want]


@pytest.mark.usefixtures("ray_session")
def test_dense_rank_vs_pandas():
    got = (QUERIES["dense_rank_orders"](SF).to_pandas()
           .sort_values(["o_orderpriority", "o_orderkey"])
           .reset_index(drop=True))
    want = got[["o_orderkey", "o_orderpriority", "cents"]].copy()
    want["drank"] = (want.groupby("o_orderpriority")["cents"]
                     .rank(method="dense", ascending=False).astype(int))
    assert got["drank"].tolist() == want["drank"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_first_last_vs_pandas():
    got = (QUERIES["first_last_order_per_customer"](SF).to_pandas()
           .sort_values("o_custkey").reset_index(drop=True))
    orders = pq.read_table(
        SF + "/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"]).to_pandas()
    orders = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    g = orders.groupby("o_custkey")["o_orderkey"]
    want = pd.DataFrame({"first_key": g.first(), "last_key": g.last(),
                         "n_orders": g.size()}).reset_index()
    assert got["first_key"].tolist() == want["first_key"].tolist()
    assert got["last_key"].tolist() == want["last_key"].tolist()
    assert got["n_orders"].tolist() == want["n_orders"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_semdedup_planted_duplicates(tmp_path):
    """60 random vectors + 10 exact copies (higher vec_ids). Copies land
    in the same k-means cluster as their source (identical vector ⇒
    identical assignment) so SemDeDup must drop every copy; the full
    keep set is re-derived by brute-force union-find per OUTPUT
    cluster."""
    rng = np.random.default_rng(3)
    base = rng.normal(size=(60, 16)).astype(np.float32)
    vecs = np.concatenate([base, base[:10]])
    ids = np.concatenate([np.arange(60), np.arange(100, 110)])
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))

    df = (QUERIES["semdedup_drop_docs"](str(tmp_path)).to_pandas()
          .sort_values("vec_id").reset_index(drop=True))
    assert sorted(df["vec_id"]) == sorted(ids.tolist())
    by_id = df.set_index("vec_id")
    # every planted copy shares its source's cluster and is dropped
    for i in range(10):
        assert by_id.loc[100 + i, "cluster"] == by_id.loc[i, "cluster"]
        assert by_id.loc[100 + i, "keep_flag"] == 0
        assert by_id.loc[i, "keep_flag"] == 1

    # brute-force recheck per output cluster
    vec_of = {int(v): vecs[k] for k, v in enumerate(ids)}
    for cl, grp in df.groupby("cluster"):
        gids = sorted(grp["vec_id"].tolist())
        m = np.stack([vec_of[i] for i in gids]).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        parent = list(range(len(gids)))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        sim = m @ m.T
        for a in range(len(gids)):
            for b in range(a + 1, len(gids)):
                if sim[a, b] >= 0.95:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        want_keep = {gids[i]: int(find(i) == i) for i in range(len(gids))}
        got_keep = grp.set_index("vec_id")["keep_flag"].to_dict()
        assert {int(k): int(v) for k, v in got_keep.items()} == want_keep


@pytest.mark.usefixtures("ray_session")
def test_semdedup_giant_cluster_bounded(tmp_path):
    """Adversarial skew: 3000 near-identical vectors all land in ONE
    k-means cluster. The hard per-cluster cap must sub-bucket-salt it
    so no single dedup task sees an unbounded group — every OUTPUT
    cluster stays a small multiple of max_cluster, keeps = one min-id
    survivor per sub-bucket, and everything else is dropped."""
    from rendler_ray.pipelines.queries import semdedup_drop_docs

    rng = np.random.default_rng(7)
    base = rng.normal(size=16)
    base /= np.linalg.norm(base)
    vecs = base + rng.normal(size=(3000, 16)) * 1e-4  # cosine ≈ 1.0
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(3000), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))

    df = (semdedup_drop_docs(str(tmp_path), max_cluster=256)
          .to_pandas())
    assert len(df) == 3000
    sizes = df.groupby("cluster").size()
    assert len(sizes) >= 2, "giant cluster was never split"
    # hash sub-bucketing is uneven but bounded well below the corpus
    assert sizes.max() <= 4 * 256, sizes.max()
    # within every sub-bucket all vectors are mutual near-dups: exactly
    # one survivor each, and it is the bucket's min vec_id
    kept = df[df["keep_flag"] == 1]
    assert len(kept) == len(sizes)
    mins = df.groupby("cluster")["vec_id"].min()
    assert sorted(kept["vec_id"]) == sorted(mins.tolist())


@pytest.mark.usefixtures("ray_session")
def test_remove_dup_spans_brute_force(tmp_path):
    """Cleaned text = tokens not covered by any duplicated 5-gram,
    checked by hand on a fixture; affected-doc set == the stats op's;
    broadcast and join-fallback forms agree."""
    texts = {
        0: "a b c d e f g",             # grams abcde/bcdef share w/ 1
        1: "x a b c d e f y",
        2: "one two three",             # short dup pair: fully removed
        3: "one two three",
        4: "totally unique words only here",
    }
    pq.write_table(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": list(texts.values()),
    }), str(tmp_path / "documents.parquet"))

    from rendler_ray.goldenhash import to_pandas
    from rendler_ray.pipelines.queries import (QUERIES,
                                               remove_dup_spans_docs)

    got = (to_pandas(remove_dup_spans_docs(str(tmp_path)))
           .sort_values("doc_id").reset_index(drop=True))
    # docs 0/1: grams 'a b c d e'+'b c d e f' duplicated -> tokens
    # a..f covered in both; doc 0 keeps 'g', doc 1 keeps 'x'+'y'
    want = {
        0: (6, hashlib.md5(b"g").hexdigest()),
        1: (6, hashlib.md5(b"x y").hexdigest()),
        2: (3, hashlib.md5(b"").hexdigest()),
        3: (3, hashlib.md5(b"").hexdigest()),
    }
    assert {int(r.doc_id): (int(r.n_removed_tokens), r.cleaned_md5)
            for r in got.itertuples()} == want

    stats = (to_pandas(QUERIES["dup_span_stats_docs"](str(tmp_path))))
    assert sorted(stats["doc_id"]) == sorted(got["doc_id"])

    fb = (to_pandas(remove_dup_spans_docs(str(tmp_path),
                                          broadcast_max=0,
                                          num_partitions=2))
          .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, fb)
