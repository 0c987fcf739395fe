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
