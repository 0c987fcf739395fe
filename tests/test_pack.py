"""Sequence-packing invariants (functions/pack.py) + shuffled training
export through the resumable partitioned sink."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _docs(n=40, seed=3):
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [" ".join(rng.choice(words, size=rng.integers(1, 30)))
             for _ in range(n)]
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                     "text": pa.array(texts)})


@pytest.mark.usefixtures("ray_session")
def test_pack_boundary_invariants():
    """Every sequence except the tail is exactly seq_len tokens; totals
    conserve (sum == sum of per-doc n_tokens+1); seq_ids are dense from
    0; the first sequence starts with the hash-min document's first
    token; n_docs ≥ 1 everywhere."""
    import ray.data as rd

    from rendler_ray.functions.pack import pack_sequences

    tbl = _docs()
    L = 16
    out = (pack_sequences(rd.from_arrow(tbl), seq_len=L)
           .to_pandas().sort_values("seq_id").reset_index(drop=True))
    total = sum(len(t.split(" ")) + 1 for t in tbl["text"].to_pylist())
    assert out["n_tokens"].sum() == total
    assert (out["n_tokens"].iloc[:-1] == L).all()
    assert out["n_tokens"].iloc[-1] <= L
    assert list(out["seq_id"]) == list(range(len(out)))
    assert (out["n_docs"] >= 1).all()

    first_doc = min(
        tbl["doc_id"].to_pylist(),
        key=lambda i: (hashlib.md5(f"{i}-pk".encode()).hexdigest(), i))
    first_tok = tbl["text"].to_pylist()[first_doc].split(" ")[0]
    assert out["first_token"].iloc[0] == first_tok
    assert out["last_token"].iloc[-1] == "<|eod|>"


@pytest.mark.usefixtures("ray_session")
def test_pack_manifest_by_counts_matches_token_pack():
    """The counts-only manifest (no text) agrees with the token-level
    packer on (seq_id, n_tokens, n_docs) for the same corpus + salt —
    the capstone's cheap path is the same packing."""
    import ray.data as rd

    from rendler_ray.functions.pack import (
        pack_manifest_by_counts,
        pack_sequences,
    )

    tbl = _docs(n=25, seed=9)
    n_tok = pa.array([len(t.split(" ")) for t in tbl["text"].to_pylist()],
                     pa.int64())
    counts = pa.table({"doc_id": tbl["doc_id"], "n_tokens": n_tok})
    L = 16
    a = (pack_sequences(rd.from_arrow(tbl), seq_len=L)
         .to_pandas().sort_values("seq_id").reset_index(drop=True))
    b = (pack_manifest_by_counts(rd.from_arrow(counts), seq_len=L,
                                 id_col="doc_id", n_col="n_tokens")
         .to_pandas().sort_values("seq_id").reset_index(drop=True))
    assert list(a["seq_id"]) == list(b["seq_id"])
    assert list(a["n_tokens"]) == list(b["n_tokens"])
    assert list(a["n_docs"]) == list(b["n_docs"])


@pytest.mark.usefixtures("ray_session")
def test_packed_export_resumable(tmp_path):
    """Packed manifest → write_partitioned training shards: stamped
    buckets are skipped on re-run and the read-back equals the
    manifest."""
    import ray.data as rd

    from rendler_ray.functions.pack import pack_sequences
    from rendler_ray.storage import read_partitioned, write_partitioned

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    packed = pack_sequences(ds, seq_len=128).materialize()
    out = str(tmp_path / "shards")
    r1 = write_partitioned(packed, out, key_col="seq_id", num_buckets=8)
    assert sorted(r1["written"]) and not r1["skipped"]
    r2 = write_partitioned(packed, out, key_col="seq_id", num_buckets=8)
    assert not r2["written"] and sorted(r2["skipped"]) == sorted(r1["written"])
    back = (read_partitioned(out).to_pandas()
            .sort_values("seq_id").reset_index(drop=True))
    exp = (packed.to_pandas().sort_values("seq_id").reset_index(drop=True))
    assert (back["n_tokens"] == exp["n_tokens"]).all()
    assert (back["first_token"] == exp["first_token"]).all()
    assert len(back) == len(exp)


@pytest.mark.usefixtures("ray_session")
def test_streaming_split_covers_all_sequences():
    """Trainer-side consumption: streaming_split over the packed
    manifest hands every sequence to exactly one concurrent consumer —
    no loss, no duplication (the multi-worker training-ingest shape)."""
    import threading

    import ray.data as rd

    from rendler_ray.functions.pack import pack_sequences

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    packed = pack_sequences(ds, seq_len=128).materialize()
    expected = sorted(packed.to_pandas()["seq_id"])

    splits = packed.streaming_split(2, equal=False)
    got = [[], []]

    def consume(i):
        for b in splits[i].iter_batches(batch_size=32,
                                        batch_format="pyarrow"):
            got[i].extend(b["seq_id"].to_pylist())

    ts = [threading.Thread(target=consume, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert sorted(got[0] + got[1]) == expected
    assert got[0] and got[1]  # both consumers actually received work


@pytest.mark.usefixtures("ray_session")
def test_token_shards_reconstruct_every_doc(tmp_path):
    """pack_token_sequences emits the REAL token arrays: written shards,
    read back and concatenated in seq order, reproduce the exact global
    token stream — splitting on <|eod|> recovers every document's text
    in (md5 hash, doc_id) order; token_ids align 1:1 with tokens."""
    import ray.data as rd

    from rendler_ray.functions.canon import stable_hash64
    from rendler_ray.functions.pack import pack_token_sequences
    from rendler_ray.storage import read_partitioned, write_partitioned

    tbl = _docs(n=40, seed=3)
    L = 16
    seqs = pack_token_sequences(rd.from_arrow(tbl), seq_len=L).materialize()
    out = str(tmp_path / "tok_shards")
    write_partitioned(seqs, out, key_col="seq_id", num_buckets=4)

    back = (read_partitioned(out).to_pandas()
            .sort_values("seq_id").reset_index(drop=True))
    # fixed length except the tail; ids align with tokens
    assert (back["n_tokens"].iloc[:-1] == L).all()
    for toks, ids in zip(back["tokens"], back["token_ids"]):
        assert len(toks) == len(ids)
        want = (stable_hash64(np.asarray(toks, object))
                % np.uint64(1 << 31)).astype(np.int32)
        assert list(ids) == list(want)

    stream = [t for toks in back["tokens"] for t in toks]
    docs, cur = [], []
    for t in stream:
        if t == "<|eod|>":
            docs.append(" ".join(cur))
            cur = []
        else:
            cur.append(t)
    assert not cur  # stream ends on a doc boundary
    texts = tbl["text"].to_pylist()
    order = sorted(range(len(texts)),
                   key=lambda i: (hashlib.md5(f"{i}-pk".encode()).hexdigest(),
                                  i))
    assert docs == [texts[i] for i in order]
