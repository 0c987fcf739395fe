"""Round-3 third-batch ops: chunking with overlap, badwords gating,
percent_rank/cume_dist, train/val/test split, two-pass histogram,
CSV/JSONL ingest — each checked against an independent brute-force
recomputation (the DuckDB oracles run in scripts/check_correctness.py)."""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rendler_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_chunk_overlap_brute_force(tmp_path):
    texts = {
        0: " ".join(f"w{i}" for i in range(80)),   # 80 toks: 4 chunks
        1: " ".join(f"x{i}" for i in range(32)),   # exactly one window
        2: "a b c",                                # short: 1 tiny chunk
        3: " ".join(f"y{i}" for i in range(33)),   # window + 9-tok tail
    }
    pq.write_table(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": list(texts.values()),
    }), str(tmp_path / "documents.parquet"))

    W, S = 32, 24
    want = []
    for d, s in texts.items():
        toks = s.split(" ")
        for j, lo in enumerate(range(0, len(toks), S)):
            seg = toks[lo:lo + W]
            want.append((d, j, len(seg), " ".join(seg)))

    df = (QUERIES["chunk_docs_overlap"](str(tmp_path)).to_pandas()
          .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    got = list(df.itertuples(index=False, name=None))
    assert got == sorted(want)
    # every consecutive chunk pair within a doc overlaps by W - S tokens
    full = df[df["n_tokens"] == W]
    for (d, j, n, txt) in got:
        if j > 0 and (d, j - 1) in {(a, b) for a, b, *_ in got}:
            prev = next(t for a, b, _, t in got if (a, b) == (d, j - 1))
            if len(prev.split(" ")) == W:
                assert prev.split(" ")[S:] == txt.split(" ")[:W - S]
    assert len(full) >= 3


@pytest.mark.usefixtures("ray_session")
def test_badwords_filter_brute_force(tmp_path):
    texts = ["the slow query", "fast path only", "dup dup slow", "clean"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()), "text": texts,
    }), str(tmp_path / "documents.parquet"))
    bad = {"slow", "dup", "drop", "null"}
    df = (QUERIES["badwords_filter_docs"](str(tmp_path)).to_pandas()
          .sort_values("doc_id"))
    want = [sum(t in bad for t in s.split(" ")) for s in texts]
    assert df["n_bad"].tolist() == want
    assert df["keep_flag"].tolist() == [int(n == 0) for n in want]


@pytest.mark.usefixtures("ray_session")
def test_percent_rank_vs_pandas():
    df = (QUERIES["percent_rank_orders"](SF).to_pandas()
          .sort_values(["o_orderpriority", "o_orderkey"])
          .reset_index(drop=True))
    # recompute from scratch over the raw table
    import pandas as pd
    raw = pd.read_parquet(f"{SF}/orders.parquet",
                          columns=["o_orderkey", "o_orderpriority",
                                   "o_totalprice"])
    raw["cents"] = (raw["o_totalprice"] * 100).round().astype(np.int64)
    g = raw.groupby("o_orderpriority")["cents"]
    n = g.transform("size").to_numpy()
    rank_min = g.rank(method="min").to_numpy()
    le = g.rank(method="max").to_numpy()
    pr = np.where(n > 1, (rank_min - 1) / np.maximum(n - 1, 1), 0.0)
    cd = le / n
    raw["pr9"] = np.floor(pr * 1e9 + 0.5).astype(np.int64)
    raw["cd9"] = np.floor(cd * 1e9 + 0.5).astype(np.int64)
    raw = (raw.sort_values(["o_orderpriority", "o_orderkey"])
           .reset_index(drop=True))
    assert df["pr9"].tolist() == raw["pr9"].tolist()
    assert df["cd9"].tolist() == raw["cd9"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_split_deterministic_and_balanced():
    a = (QUERIES["train_val_test_split"](SF).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (QUERIES["train_val_test_split"](SF).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)
    frac = a["split"].value_counts(normalize=True)
    assert 0.70 < frac["train"] < 0.90
    assert frac.get("val", 0) > 0 and frac.get("test", 0) > 0
    # matches the md5 rule exactly
    for doc_id, split in a.sample(20, random_state=0).itertuples(
            index=False):
        h = int(hashlib.md5(f"{doc_id}-split".encode())
                .hexdigest()[:15], 16) % 100
        assert split == ("train" if h < 80 else "val" if h < 90 else "test")


@pytest.mark.usefixtures("ray_session")
def test_value_histogram_partitions_all_rows():
    df = QUERIES["value_histogram_events"](SF).to_pandas()
    total = pq.read_table(f"{SF}/events.parquet",
                          columns=["value"]).num_rows
    assert df["n_events"].sum() == total
    assert df["bucket"].between(0, 19).all()
    assert df["bucket"].is_unique


@pytest.mark.usefixtures("ray_session")
def test_dsir_importance_brute_force(tmp_path):
    docs = [
        (0, "en", "the cat sat on the mat"),
        (1, "en", "the dog sat on the rug"),
        (2, "de", "der hund sitzt auf dem teppich"),
        (3, "fr", "le chat"),
        (4, "zh", "solo"),          # short doc: whole text is the gram
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "lang": [d[1] for d in docs],
        "text": [d[2] for d in docs],
    }), str(tmp_path / "documents.parquet"))

    def grams(s):
        t = s.split(" ")
        return [" ".join(t[i:i + 2]) for i in range(len(t) - 1)] \
            if len(t) >= 2 else [s]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % 4096

    ct, cs = {}, {}
    for _, lang, s in docs:
        for g in grams(s):
            b = bucket(g)
            cs[b] = cs.get(b, 0) + 1
            if lang == "en":
                ct[b] = ct.get(b, 0) + 1
    ratio = {b: ((ct.get(b, 0) + 1) * 1_000_000) // (c + 1)
             for b, c in cs.items()}
    want = {d: sum(ratio[bucket(g)] for g in grams(s))
            for d, _, s in docs}

    got = (QUERIES["dsir_importance_docs"](str(tmp_path)).to_pandas()
           .set_index("doc_id")["dsir_score"].to_dict())
    assert got == want
    # target-language docs must outscore the non-target ones here
    assert min(got[0], got[1]) > max(got[2], got[3])


@pytest.mark.usefixtures("ray_session")
def test_event_transition_matrix_vs_pandas():
    import pandas as pd
    got = (QUERIES["event_transition_matrix"](SF).to_pandas()
           .sort_values(["from_type", "to_type"]).reset_index(drop=True))
    ev = (pd.read_parquet(f"{SF}/events.parquet",
                          columns=["user_id", "event_id", "ts",
                                   "event_type"])
          .sort_values(["user_id", "ts", "event_id"]))
    prev = ev.groupby("user_id")["event_type"].shift(1)
    pairs = (pd.DataFrame({"from_type": prev, "to_type": ev["event_type"]})
             .dropna().groupby(["from_type", "to_type"]).size()
             .reset_index(name="n")
             .sort_values(["from_type", "to_type"])
             .reset_index(drop=True))
    assert got["from_type"].tolist() == pairs["from_type"].tolist()
    assert got["to_type"].tolist() == pairs["to_type"].tolist()
    assert got["n"].tolist() == pairs["n"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_string_agg_vs_pandas():
    import pandas as pd
    got = (QUERIES["customer_names_by_nation"](SF).to_pandas()
           .sort_values("c_nationkey").reset_index(drop=True))
    c = (pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_nationkey", "c_custkey", "c_name"])
         .sort_values("c_custkey"))
    want = c.groupby("c_nationkey").agg(
        names=("c_name", "|".join),
        n_customers=("c_name", "size")).reset_index()
    assert got["names"].tolist() == want["names"].tolist()
    assert got["n_customers"].tolist() == want["n_customers"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_orders_above_avg_vs_pandas():
    import pandas as pd
    got = (QUERIES["orders_above_customer_avg"](SF).to_pandas()
           .sort_values("o_orderkey").reset_index(drop=True))
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_orderkey", "o_custkey",
                                 "o_totalprice"])
    o["cents"] = (o["o_totalprice"] * 100).round().astype(np.int64)
    g = o.groupby("o_custkey")["cents"]
    keep = o[o["cents"] * g.transform("size") > g.transform("sum")]
    assert got["o_orderkey"].tolist() == sorted(keep["o_orderkey"])
    assert len(got) > 0


@pytest.mark.usefixtures("ray_session")
def test_regex_extract_brute_force(tmp_path):
    import re
    texts = ["a bb ccc dddddd ee", "short toks here", "gigantic word",
             "x"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()), "text": texts,
    }), str(tmp_path / "documents.parquet"))
    got = (QUERIES["regex_extract_docs"](str(tmp_path)).to_pandas()
           .sort_values("doc_id"))
    want = [(m.group(1) if (m := re.search(r"\b([a-z]{6,})\b", s))
             else "") for s in texts]
    assert got["first_long"].tolist() == want


@pytest.mark.usefixtures("ray_session")
def test_csv_jsonl_ingest_match_parquet():
    csv = (QUERIES["events_csv_ingest"](SF).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    jl = (QUERIES["events_jsonl_ingest"](SF).to_pandas()
          .sort_values("event_type").reset_index(drop=True))
    assert csv.equals(jl)
    # recompute straight from parquet
    import pandas as pd
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type", "value"])
    ev["cents"] = (ev["value"] * 100).round().astype(np.int64)
    ev["ts_us"] = ev["ts"].values.astype("datetime64[us]").astype(np.int64)
    g = ev.groupby("event_type").agg(
        n_events=("cents", "size"), sum_cents=("cents", "sum"),
        first_us=("ts_us", "min"), last_us=("ts_us", "max")).reset_index()
    g = g.sort_values("event_type").reset_index(drop=True)
    assert csv["n_events"].tolist() == g["n_events"].tolist()
    assert csv["sum_cents"].tolist() == g["sum_cents"].tolist()
    assert csv["first_us"].tolist() == g["first_us"].tolist()
    assert csv["last_us"].tolist() == g["last_us"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_cooccurrence_brute_force(tmp_path):
    from itertools import combinations
    texts = ["the cat sat", "the cat ran", "a dog sat", "the dog",
             "cat cat cat", ""]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": texts,
    }), str(tmp_path / "documents.parquet"))
    docs = [set(s.split(" ")) for s in texts]
    df = {}
    for d in docs:
        for t in d:
            df[t] = df.get(t, 0) + 1
    top = {t for t, _ in sorted(df.items(),
                                key=lambda kv: (-kv[1], kv[0]))[:100]}
    want = {}
    for d in docs:
        for a, b in combinations(sorted(d & top), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    got = QUERIES["token_cooccurrence_top100"](str(tmp_path)).to_pandas()
    gmap = {(r.token_a, r.token_b): r.n_docs for r in got.itertuples()}
    assert gmap == want
    assert all(a < b for a, b in gmap)


@pytest.mark.usefixtures("ray_session")
def test_cooccurrence_top100_cap():
    got = QUERIES["token_cooccurrence_top100"](SF).to_pandas()
    toks = set(got["token_a"]) | set(got["token_b"])
    assert len(toks) <= 100
    assert (got["n_docs"] >= 1).all()


@pytest.mark.usefixtures("ray_session")
def test_gram_matrix_vs_numpy():
    import pandas as pd
    got = (QUERIES["embedding_gram_matrix"](SF).to_pandas()
           .sort_values(["i", "j"]).reset_index(drop=True))
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["embedding"])["embedding"]
    e = np.floor(np.stack(emb.to_numpy()).astype(np.float64)
                 * 1_000_000).astype(np.int64)
    g = e.T @ e
    d = e.shape[1]
    assert len(got) == d * (d + 1) // 2
    iu, ju = np.triu_indices(d)
    want = pd.DataFrame({"i": iu + 1, "j": ju + 1, "g": g[iu, ju]})
    want = want.sort_values(["i", "j"]).reset_index(drop=True)
    assert got["i"].tolist() == want["i"].tolist()
    assert got["j"].tolist() == want["j"].tolist()
    assert got["g"].tolist() == want["g"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_q6_pushdown_vs_pandas():
    import pandas as pd
    got = QUERIES["q6_pruned_revenue"](SF)
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"])
    m = ((li["l_shipdate"] >= "1996-01-01")
         & (li["l_shipdate"] < "1997-01-01")
         & (li["l_discount"] >= 0.05) & (li["l_discount"] <= 0.07)
         & (li["l_quantity"] < 24))
    sub = li[m]
    cents = (sub["l_extendedprice"] * 100).round().astype(np.int64)
    disc = (sub["l_discount"] * 100).round().astype(np.int64)
    assert got["n_rows"][0].as_py() == len(sub) > 0
    assert got["revenue"][0].as_py() == int((cents * disc).sum())


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_pairs_brute_force(tmp_path):
    names = ["cat", "bat", "cats", "ab", "ba", "bab", "", "x",
             "cart", "caat", "hello", "hallo", "hell", "shell"]
    pq.write_table(pa.table({"c_name": pa.array(names, pa.string())}),
                   str(tmp_path / "customer.parquet"))

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    want = sorted({tuple(sorted((a, b))) for i, a in enumerate(names)
                   for b in names[i + 1:] if lev(a, b) <= 1})
    got = (QUERIES["fuzzy_name_pairs"](str(tmp_path)).to_pandas()
           .sort_values(["name_a", "name_b"]))
    assert list(map(tuple, got.to_numpy())) == want
    assert ("ab", "ba") not in set(map(tuple, got.to_numpy()))


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_pairs_sf():
    got = QUERIES["fuzzy_name_pairs"](SF).to_pandas()
    assert len(got) > 0
    assert (got["name_a"] < got["name_b"]).all()
    # no duplicate pairs
    assert not got.duplicated(["name_a", "name_b"]).any()


@pytest.mark.usefixtures("ray_session")
def test_random_shuffle_training_export():
    """Exercise ds.random_shuffle on the packed-sequence export path:
    the shuffled dataset is an exact permutation of the unshuffled one
    (rows intact, order changed). Order is NOT asserted stable across
    invocations — Ray's shuffle seed does not pin block arrival order,
    which is why the oracle-able exports use md5-hash ordering
    instead (functions/pack.py)."""
    from rendler_ray.pipelines.queries import QUERIES as Q
    base = Q["pack_training_sequences"](SF)
    plain = base.to_pandas().sort_values("seq_id").reset_index(drop=True)
    s1 = base.random_shuffle(seed=7).to_pandas()
    assert sorted(s1["seq_id"]) == plain["seq_id"].tolist()
    assert s1["seq_id"].tolist() != plain["seq_id"].tolist()
    # rows survive intact, not just ids: spot-check content equality
    a = s1.sort_values("seq_id").reset_index(drop=True)
    assert a["n_tokens"].tolist() == plain["n_tokens"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_quantize_int8_vs_numpy():
    import pandas as pd
    got = (QUERIES["embedding_quantize_int8"](SF).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    e = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    lo, hi = e.min(0), e.max(0)
    span = np.where(hi - lo == 0, 1.0, hi - lo)
    q = np.floor((e - lo[None, :]) * 255.0 / span[None, :])
    q = np.where((hi - lo)[None, :] == 0, 0.0, q).astype(np.int64)
    order = np.argsort(emb["vec_id"].to_numpy())
    assert got["vec_id"].tolist() == emb["vec_id"].to_numpy()[order].tolist()
    assert got["q_sum"].tolist() == q.sum(1)[order].tolist()
    assert got["q_min"].tolist() == q.min(1)[order].tolist()
    assert got["q_max"].tolist() == q.max(1)[order].tolist()
    assert got["q_max"].max() == 255 and got["q_min"].min() == 0
