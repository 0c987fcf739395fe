"""Round-4d ops: RRF hybrid retrieval and CCNet-style per-language
perplexity buckets — each checked against an independent brute-force
recomputation over the sf0.001 tables (the DuckDB oracle is checked
separately by scripts/check_correctness.py; these tests must not
depend on it)."""

import collections
import fractions
import hashlib
import math

import numpy as np
import pyarrow.parquet as pq

from rendler_ray.goldenhash import to_pandas
from rendler_ray.pipelines.queries import (
    _BM25_B,
    _BM25_K1,
    _BM25_QUERIES,
    bpe_fertility_by_lang,
    ccnet_perplexity_buckets,
    hard_negative_mining_docs,
    rrf_hybrid_search_docs,
)

SF = "/root/testdata/sf0.001"


def _docs(cols):
    return pq.read_table(f"{SF}/documents.parquet",
                         columns=cols).to_pylist()


def _bm25_topn(n):
    """Brute-force BM25 leg: same formula, same float-op order as the
    op (term-order numpy adds == Python float adds)."""
    rows = _docs(["doc_id", "text"])
    toks = {r["doc_id"]: r["text"].split(" ") for r in rows}
    ndocs = len(rows)
    avgdl = sum(len(t) for t in toks.values()) / ndocs
    out = {}
    for qid, terms in _BM25_QUERIES.items():
        dfs = {t: sum(1 for tk in toks.values() if t in tk)
               for t in terms}
        idf = {t: math.log(1.0 + (ndocs - dfs[t] + 0.5) / (dfs[t] + 0.5))
               for t in terms}
        scored = []
        for did, tk in toks.items():
            tf = collections.Counter(tk)
            if not any(tf[t] for t in terms):
                continue
            dl = len(tk)
            norm = _BM25_K1 * (1.0 - _BM25_B + _BM25_B * (dl / avgdl))
            s = np.float64(0.0)
            for t in terms:
                s = s + idf[t] * (tf[t] * (_BM25_K1 + 1.0)) \
                    / (tf[t] + norm)
            scored.append((int(np.round(s * 1e6)), did))
        scored.sort(key=lambda x: (-x[0], x[1]))
        out[qid] = [did for _, did in scored[:n]]
    return out


def _dense_topn(n):
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pylist()
    m = np.stack([np.asarray(r["embedding"], np.float64) for r in emb])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = np.array([r["vec_id"] for r in emb])
    out = {}
    for qid in _BM25_QUERIES:
        qv = m[np.flatnonzero(ids == qid)[0]]
        se6 = np.round(m @ qv * 1e6).astype(np.int64)
        order = sorted(zip(-se6, ids))
        out[qid] = [int(i) for _, i in order[:n]]
    return out


def test_rrf_hybrid_search_docs(ray_session):
    k_leg, k, kk = 20, 10, 60
    lex, den = _bm25_topn(k_leg), _dense_topn(k_leg)
    got = to_pandas(rrf_hybrid_search_docs(SF))
    for qid in _BM25_QUERIES:
        lr = {d: r for r, d in enumerate(lex[qid], 1)}
        dr = {d: r for r, d in enumerate(den[qid], 1)}
        fused = []
        for d in set(lr) | set(dr):
            # exact rational RRF — Fraction ordering independently
            # validates the op's double-division sort
            f = fractions.Fraction(0)
            num, dn = 1, None
            if d in lr:
                f += fractions.Fraction(1, kk + lr[d])
            if d in dr:
                f += fractions.Fraction(1, kk + dr[d])
            if d in lr and d in dr:
                num = 2 * kk + lr[d] + dr[d]
                dn = (kk + lr[d]) * (kk + dr[d])
            else:
                dn = kk + (lr.get(d) or dr[d])
            assert f == fractions.Fraction(num, dn)
            fused.append((f, d, num, dn))
        fused.sort(key=lambda x: (-x[0], x[1]))
        g = got[got["query_id"] == qid].sort_values("rank")
        assert len(g) == min(k, len(fused))
        for row, (f, d, num, dn) in zip(g.itertuples(), fused[:k]):
            assert (row.doc_id, row.rrf_num, row.rrf_den) == (d, num, dn)


def test_ccnet_perplexity_buckets(ray_session):
    import pyarrow as pa
    import pyarrow.compute as pc

    rows = _docs(["doc_id", "text", "lang"])
    tric, bigc = collections.Counter(), collections.Counter()
    per_doc = {}
    for r in rows:
        tk = r["text"].split(" ")
        tris = [" ".join(tk[i:i + 3]) for i in range(len(tk) - 2)]
        bigs = [" ".join(tk[i:i + 2]) for i in range(len(tk) - 2)]
        if tris:
            per_doc[r["doc_id"]] = (tris, bigs, r["lang"])
        tric.update(tris)
        bigc.update(bigs)
    flu = {}
    for did, (tris, bigs, lang) in per_doc.items():
        s_tri = sum(tric[t] for t in tris)
        s_big = sum(bigc[b] for b in bigs)
        e6 = pc.cast(pc.round(
            pc.multiply(pa.array([s_tri / s_big], pa.float64()), 1e6),
            options=pc.RoundOptions(
                ndigits=0, round_mode="half_towards_infinity")),
            pa.int64())[0].as_py()
        flu[did] = (e6, lang)

    bylang = collections.defaultdict(list)
    for e6, lang in flu.values():
        bylang[lang].append(e6)
    th = {}
    for lang, vals in bylang.items():
        vals.sort()
        n = len(vals)
        th[lang] = (vals[(n - 1) * 33 // 100], vals[(n - 1) * 66 // 100])

    got = to_pandas(ccnet_perplexity_buckets(SF))
    assert len(got) == len(flu)
    for row in got.itertuples():
        e6, lang = flu[row.doc_id]
        assert (row.lang, row.fluency_e6) == (lang, e6)
        t33, t66 = th[lang]
        exp = ("tail" if e6 <= t33 else
               "middle" if e6 <= t66 else "head")
        assert row.bucket == exp
    # every language with >= 3 docs must populate all three buckets
    counts = got.groupby(["lang", "bucket"]).size()
    for lang, vals in bylang.items():
        if len(set(vals)) >= len(vals) >= 3:
            for b in ("head", "middle", "tail"):
                assert counts.get((lang, b), 0) > 0


def test_bpe_fertility_by_lang(ray_session):
    import re

    from rendler_ray.functions.text import BPE_ISH_RE

    rows = _docs(["lang", "text"])
    agg = collections.defaultdict(lambda: [0, 0, 0])
    rx = re.compile(BPE_ISH_RE)
    for r in rows:
        a = agg[r["lang"]]
        a[0] += len(rx.findall(r["text"]))
        a[1] += len(r["text"].split(" "))
        a[2] += 1
    got = to_pandas(bpe_fertility_by_lang(SF)).set_index("lang")
    assert len(got) == len(agg)
    for lang, (nb, nw, nd) in agg.items():
        g = got.loc[lang]
        assert (int(g["n_bpe_tokens"]), int(g["n_words"]),
                int(g["n_docs"])) == (nb, nw, nd)
        assert int(g["fertility_e6"]) == int(
            np.floor(np.float64(nb) / nw * 1e6 + 0.5))


def test_hard_negative_mining_docs(ray_session):
    lex = _bm25_topn(20)
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pylist()
    unit = {}
    for r in emb:
        v = np.asarray(r["embedding"], np.float64)
        unit[r["vec_id"]] = v / np.linalg.norm(v)
    got = to_pandas(hard_negative_mining_docs(SF))
    for qid in _BM25_QUERIES:
        exp = []
        for rank, did in enumerate(lex[qid], 1):
            se6 = int(np.round(float(unit[did] @ unit[qid]) * 1e6))
            if se6 < 100_000:
                exp.append((did, rank, se6))
        exp = exp[:10]
        g = got[got["query_id"] == qid].sort_values("hn_rank")
        assert [(r.doc_id, r.bm25_rank, r.dense_sim_e6)
                for r in g.itertuples()] == exp
        assert list(g["hn_rank"]) == list(range(1, len(exp) + 1))
        # hard negatives are lexical confusers: every kept doc is
        # semantically BELOW the gate while lexically top-20
        assert (g["dense_sim_e6"] < 100_000).all()


def _brute_cdc(text, mask=0xFF):
    """Independent sequential gear-hash recompute: h_i = (h_{i-1}<<1 +
    G[b_i]) mod 2^64 — the textbook recurrence the vectorized
    64-shift-convolution form must equal (shifts >= 64 drop out
    mod 2^64)."""
    import hashlib as hl

    G = [int.from_bytes(hl.md5(bytes([v])).digest()[:8], "big")
         for v in range(256)]
    b = text.encode("utf-8")
    h, ends = 0, []
    for i, byte in enumerate(b):
        h = ((h << 1) + G[byte]) & ((1 << 64) - 1)
        if i >= 63 and (h & mask) == 0:
            ends.append(i)
    if not b:
        return []
    if not ends or ends[-1] != len(b) - 1:
        ends.append(len(b) - 1)
    out, prev = [], 0
    for ci, e in enumerate(ends):
        out.append((ci, prev, e + 1 - prev,
                    hl.md5(b[prev:e + 1]).hexdigest()))
        prev = e + 1
    return out


def test_cdc_chunk_batch_matches_sequential_gear():
    import pyarrow as pa

    from rendler_ray.functions.text import cdc_chunk_batch

    rows = _docs(["doc_id", "text"])[:200]
    t = pa.table({"doc_id": [r["doc_id"] for r in rows],
                  "text": [r["text"] for r in rows]})
    got = cdc_chunk_batch(t).to_pylist()
    byid = collections.defaultdict(list)
    for r in got:
        byid[r["doc_id"]].append(
            (r["chunk_idx"], r["start"], r["length"], r["chunk_md5"]))
    n_multi = 0
    for r in rows:
        exp = _brute_cdc(r["text"])
        assert byid.get(r["doc_id"], []) == exp
        n_multi += len(exp) > 1
    assert n_multi > 0  # corpus long enough that boundaries exist


def test_cdc_realignment_property():
    """An insertion at the head shifts offsets but preserves every
    chunk identity after the first content-defined boundary — the
    property fixed-size blocking lacks."""
    import pyarrow as pa

    from rendler_ray.functions.text import cdc_chunk_batch

    rows = _docs(["doc_id", "text"])
    # pick docs that chunk into >= 3 pieces so the suffix is nontrivial
    picked = [r["text"] for r in rows if len(_brute_cdc(r["text"])) >= 3]
    assert picked
    for text in picked[:5]:
        prefix = "INSERTED NEW HEAD CONTENT " * 4  # > 63 bytes
        t = pa.table({"doc_id": [0, 1], "text": [text, prefix + text]})
        ch = cdc_chunk_batch(t).to_pylist()
        orig = [r["chunk_md5"] for r in ch if r["doc_id"] == 0]
        mod = [r["chunk_md5"] for r in ch if r["doc_id"] == 1]
        # everything after the original's first boundary realigns
        assert mod[-(len(orig) - 1):] == orig[1:]
        # fixed-size blocking would keep NO block hash: every 256-byte
        # frame shifts by len(prefix) % 256 != 0
        b0, b1 = text.encode(), (prefix + text).encode()
        fixed0 = {hashlib.md5(b0[i:i + 256]).hexdigest()
                  for i in range(0, len(b0), 256)}
        fixed1 = {hashlib.md5(b1[i:i + 256]).hexdigest()
                  for i in range(0, len(b1), 256)}
        assert not (fixed0 & fixed1) or len(fixed0 & fixed1) < len(orig) - 1


def test_ccnet_two_forms_agree(ray_session):
    """Driver fast-path (fluency fold below the gate) vs fully
    distributed path (gate forced to 0): identical output."""
    a = to_pandas(ccnet_perplexity_buckets(SF)) \
        .sort_values("doc_id").reset_index(drop=True)
    b = to_pandas(ccnet_perplexity_buckets(SF, driver_max=0)) \
        .sort_values("doc_id").reset_index(drop=True)
    assert a[["doc_id", "lang", "fluency_e6", "bucket"]].equals(
        b[["doc_id", "lang", "fluency_e6", "bucket"]])


def test_profile_orders_columns(ray_session):
    from rendler_ray.pipelines.queries import (
        _PROFILE_COLS,
        profile_orders_columns,
    )

    tbl = pq.read_table(f"{SF}/orders.parquet",
                        columns=list(_PROFILE_COLS))
    got = to_pandas(profile_orders_columns(SF)).set_index("col_name")
    assert len(got) == len(_PROFILE_COLS)
    for c in _PROFILE_COLS:
        col = tbl[c]
        g = got.loc[c]
        assert int(g["n_rows"]) == tbl.num_rows
        assert int(g["n_null"]) == col.null_count
        assert int(g["n_distinct"]) == len(
            {v for v in col.to_pylist() if v is not None})


def test_docs_jsonl_export_roundtrip(ray_session):
    from rendler_ray.pipelines.queries import docs_jsonl_export_roundtrip

    src = pq.read_table(
        f"{SF}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    got = to_pandas(docs_jsonl_export_roundtrip(SF)) \
        .sort_values("doc_id").reset_index(drop=True)[src.columns]
    assert got.equals(src)


def _shingles(t, n=3):
    toks = t.split(" ")
    if len(toks) < n:
        return frozenset({" ".join(toks)})
    return frozenset(" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1))


def test_near_dup_incremental_docs(ray_session):
    from rendler_ray.goldenhash import to_pandas as tp
    from rendler_ray.pipelines.queries import (
        near_dup_incremental_docs,
        ngram_jaccard_pairs,
    )

    texts = {r["doc_id"]: r["text"] for r in _docs(["doc_id", "text"])}
    got = tp(near_dup_incremental_docs(SF))
    assert len(got) > 0
    for row in got.itertuples():
        # orientation: new = arriving shard (odd), old = corpus (even)
        assert row.new_id % 2 == 1 and row.old_id % 2 == 0
        # independent exact-jaccard recheck of every emitted pair
        ga, gb = _shingles(texts[row.new_id]), _shingles(texts[row.old_id])
        inter = len(ga & gb)
        jac = inter / (len(ga) + len(gb) - inter)
        # the chain emits round(jac, 6)
        assert jac >= 0.5 and abs(jac - row.jaccard) <= 5e-7

    # equivalence: the incremental op finds EXACTLY the cross-parity
    # subset of the full chain (same LSH index, same verify)
    full = tp(ngram_jaccard_pairs(SF))
    cross = full[(full["a"] + full["b"]) % 2 == 1]
    exp = {(a if a % 2 == 1 else b, b if a % 2 == 1 else a, j)
           for a, b, j in zip(cross["a"], cross["b"], cross["jaccard"])}
    assert {(r.new_id, r.old_id, r.jaccard)
            for r in got.itertuples()} == exp


def test_near_dup_incremental_two_forms(ray_session):
    from rendler_ray.goldenhash import to_pandas as tp
    from rendler_ray.pipelines.queries import near_dup_incremental_docs

    a = tp(near_dup_incremental_docs(SF)) \
        .sort_values(["new_id", "old_id"]).reset_index(drop=True)
    b = tp(near_dup_incremental_docs(SF, driver_max=0)) \
        .sort_values(["new_id", "old_id"]).reset_index(drop=True)
    assert a.equals(b)


def test_cdc_partition_property():
    """Hypothesis: for ANY unicode text batch, CDC chunks exactly
    partition each doc's bytes (contiguous, non-overlapping, full
    cover) and concatenating chunk bytes reproduces the text."""
    import pyarrow as pa
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from rendler_ray.functions.text import cdc_chunk_batch

    @settings(max_examples=30, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(texts=st.lists(st.text(min_size=0, max_size=600), min_size=1,
                          max_size=8))
    def run(texts):
        t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        ch = cdc_chunk_batch(t).to_pylist()
        byid = collections.defaultdict(list)
        for r in ch:
            byid[r["doc_id"]].append(r)
        for i, txt in enumerate(texts):
            b = txt.encode("utf-8")
            rows = sorted(byid.get(i, []), key=lambda r: r["chunk_idx"])
            if not b:
                assert rows == []
                continue
            pos = 0
            for r in rows:
                assert r["start"] == pos and r["length"] >= 1
                seg = b[r["start"]:r["start"] + r["length"]]
                assert hashlib.md5(seg).hexdigest() == r["chunk_md5"]
                pos += r["length"]
            assert pos == len(b)

    run()
