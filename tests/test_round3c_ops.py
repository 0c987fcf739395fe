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
