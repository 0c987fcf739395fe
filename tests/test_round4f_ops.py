"""Round-4f ops: strongly connected components, Heaps-law vocabulary
growth, Naive-Bayes language fit+predict, LPT shard balancing — each
checked against an independent brute-force recomputation (the DuckDB
oracles are checked separately by scripts/check_correctness.py; these
tests must not depend on them)."""

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from rendler_ray.goldenhash import to_pandas
from rendler_ray.pipelines.queries import (
    nb_lang_fit_predict,
    ndcg_bm25_eval,
    normalize_text_docs,
    ols_chars_tokens_by_source,
    shard_balance_plan,
    vocab_growth_curve,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- SCC


def _edges_ds(pairs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in pairs], pa.string()),
        "dst": pa.array([b for _, b in pairs], pa.string())}))


# cycle a→b→c→a, bridge c→d, 2-cycle d⇄e, dangling e→f, self-loop g,
# duplicate edge
KNOWN = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
         ("e", "d"), ("e", "f"), ("g", "g"), ("a", "b")]
KNOWN_SCC = {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d",
             "f": "f", "g": "g"}


def test_scc_known_graph(ray_session):
    from rendler_ray.functions.graph import scc

    df = scc(_edges_ds(KNOWN))
    assert dict(zip(df["url"], df["scc"])) == KNOWN_SCC


def _brute_scc(pairs):
    """Independent definition: u ~ v iff mutual reachability under the
    boolean transitive closure (Floyd–Warshall over ≤ ~40 nodes)."""
    names = sorted({x for p in pairs for x in p})
    idx = {u: i for i, u in enumerate(names)}
    R = np.eye(len(names), dtype=bool)
    for a, b in pairs:
        R[idx[a], idx[b]] = True
    for k in range(len(names)):
        R |= np.outer(R[:, k], R[k, :])
    return {u: min(v for v in names
                   if R[idx[u], idx[v]] and R[idx[v], idx[u]])
            for u in names}


def test_scc_random_vs_brute_and_two_forms(ray_session):
    from rendler_ray.functions.graph import scc, scc_auto, scc_ds

    rng = np.random.default_rng(7)
    for trial in range(3):
        m = int(rng.integers(20, 50))
        pairs = [(f"n{int(a):02d}", f"n{int(b):02d}")
                 for a, b in rng.integers(0, 20, size=(m, 2))]
        brute = _brute_scc(pairs)
        df = scc(_edges_ds(pairs))
        assert dict(zip(df["url"], df["scc"])) == brute
        got = {r["url"]: r["scc"]
               for r in scc_ds(_edges_ds(pairs),
                               num_partitions=4).take_all()}
        assert got == brute
    # gate invisibility: forced-distributed == driver on one graph
    auto_drv = {r["url"]: r["scc"]
                for r in scc_auto(_edges_ds(KNOWN)).take_all()}
    auto_ds = {r["url"]: r["scc"]
               for r in scc_auto(_edges_ds(KNOWN),
                                 driver_max=0).take_all()}
    assert auto_drv == auto_ds == KNOWN_SCC


def test_scc_dag_trims_entirely(ray_session):
    """A pure DAG (path + diamond) is all singleton SCCs — the trim
    phase must peel everything without FW-BW rounds mattering."""
    from rendler_ray.functions.graph import scc, scc_ds

    pairs = [("a", "b"), ("b", "c"), ("c", "d"),
             ("a", "x"), ("x", "d")]
    exp = {u: u for u in "abcdx"}
    df = scc(_edges_ds(pairs))
    assert dict(zip(df["url"], df["scc"])) == exp
    got = {r["url"]: r["scc"]
           for r in scc_ds(_edges_ds(pairs), num_partitions=2).take_all()}
    assert got == exp


# ------------------------------------------------------------ bow-tie


def _brute_bowtie(pairs):
    from collections import Counter

    names = sorted({x for p in pairs for x in p})
    idx = {u: i for i, u in enumerate(names)}
    R = np.eye(len(names), dtype=bool)
    for a, b in pairs:
        R[idx[a], idx[b]] = True
    for k in range(len(names)):
        R |= np.outer(R[:, k], R[k, :])
    comp = {u: min(v for v in names
                   if R[idx[u], idx[v]] and R[idx[v], idx[u]])
            for u in names}
    sizes = Counter(comp.values())
    mx = max(sizes.values())
    core_lab = min(l for l, n in sizes.items() if n == mx)
    core = {u for u in names if comp[u] == core_lab}
    out = {}
    for u in names:
        if u in core:
            out[u] = "core"
        elif any(R[idx[u], idx[c]] for c in core):
            out[u] = "in"
        elif any(R[idx[c], idx[u]] for c in core):
            out[u] = "out"
        else:
            out[u] = "other"
    return out


BOWTIE_KNOWN = [("i1", "c1"), ("i2", "c1"), ("c1", "c2"), ("c2", "c3"),
                ("c3", "c1"), ("c2", "o1"), ("o1", "o2"), ("i1", "t1"),
                ("d1", "d2")]
BOWTIE_EXP = {"i1": "in", "i2": "in", "c1": "core", "c2": "core",
              "c3": "core", "o1": "out", "o2": "out", "t1": "other",
              "d1": "other", "d2": "other"}


def test_bowtie_known_and_random(ray_session):
    from rendler_ray.functions.graph import bowtie, bowtie_auto, bowtie_ds

    df = bowtie(_edges_ds(BOWTIE_KNOWN))
    assert dict(zip(df["url"], df["part"])) == BOWTIE_EXP
    got = {r["url"]: r["part"]
           for r in bowtie_ds(_edges_ds(BOWTIE_KNOWN),
                              num_partitions=2).take_all()}
    assert got == BOWTIE_EXP
    rng = np.random.default_rng(11)
    for trial in range(2):
        m = int(rng.integers(15, 40))
        pairs = [(f"n{int(a):02d}", f"n{int(b):02d}")
                 for a, b in rng.integers(0, 14, size=(m, 2))]
        exp = _brute_bowtie(pairs)
        df = bowtie(_edges_ds(pairs))
        assert dict(zip(df["url"], df["part"])) == exp, trial
        g2 = {r["url"]: r["part"]
              for r in bowtie_ds(_edges_ds(pairs),
                                 num_partitions=4).take_all()}
        assert g2 == exp, trial
    # gate invisibility
    a1 = {r["url"]: r["part"]
          for r in bowtie_auto(_edges_ds(BOWTIE_KNOWN)).take_all()}
    a2 = {r["url"]: r["part"]
          for r in bowtie_auto(_edges_ds(BOWTIE_KNOWN),
                               driver_max=0).take_all()}
    assert a1 == a2 == BOWTIE_EXP


# ------------------------------------------------------ DP counts


def test_dp_source_counts_deterministic_and_calibrated(ray_session):
    from rendler_ray.pipelines.queries import dp_source_counts

    a = to_pandas(dp_source_counts(SF)).set_index("source")["noisy_n_e6"]
    b = to_pandas(dp_source_counts(SF)).set_index("source")["noisy_n_e6"]
    assert (a == b).all()  # reproducible release

    true = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source"]).value_counts("source")
    # fixed-seed draws: all within a generous Laplace tail at ε=1
    # (P(|noise| > 12) = e^-12 ≈ 6e-6 per source)
    for src, n in true.items():
        assert abs(a[src] / 1e6 - n) < 12.0, src
    # same uniforms, smaller ε ⇒ proportionally larger |noise|
    wide = to_pandas(dp_source_counts(SF, eps=0.1)) \
        .set_index("source")["noisy_n_e6"]
    for src, n in true.items():
        n1 = abs(a[src] / 1e6 - n)
        n10 = abs(wide[src] / 1e6 - n)
        assert n10 >= 9.99 * n1 - 1e-3, src


# ------------------------------------------------- vocab growth curve


def test_vocab_growth_vs_brute(ray_session):
    df = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    n = len(df)
    q, r = divmod(n, 10)
    order = np.sort(df["doc_id"].to_numpy())
    bucket_of = {}
    pos = 0
    for i in range(1, 11):
        s = q + (1 if i <= r else 0)
        for d in order[pos:pos + s]:
            bucket_of[int(d)] = i
        pos += s
    first: dict = {}
    for d, t in zip(df["doc_id"], df["text"]):
        for tok in t.split(" "):
            if tok not in first or d < first[tok]:
                first[tok] = int(d)
    nb = Counter(bucket_of[d] for d in first.values())
    exp_rows = []
    cum = 0
    for b in sorted(nb):
        cum += nb[b]
        exp_rows.append((b, nb[b], cum))

    out = to_pandas(vocab_growth_curve(SF))
    got_rows = list(zip(out["bucket"], out["new_tokens"],
                        out["vocab_cum"]))
    assert got_rows == exp_rows


def test_vocab_growth_multibucket_synth(ray_session, tmp_path):
    """The testdata corpus saturates its vocab in decile 1; force a
    corpus whose vocabulary actually grows so every bucket contributes
    and the NTILE boundary math is exercised off the trivial path."""
    import ray.data as rd

    n = 103  # deliberately not divisible by 10
    rows = {"doc_id": list(range(n)),
            "text": [f"common w{d} w{d}x" for d in range(n)]}
    p = tmp_path / "docs"
    rd.from_arrow(pa.table({
        "doc_id": pa.array(rows["doc_id"], pa.int64()),
        "text": pa.array(rows["text"], pa.string()),
    })).repartition(3).write_parquet(str(p))
    import glob
    import os

    # vocab_growth_curve reads <dir>/documents.parquet
    d = tmp_path / "sf"
    os.makedirs(d)
    tbl = pa.concat_tables([
        __import__("pyarrow.parquet", fromlist=["read_table"])
        .read_table(f) for f in glob.glob(str(p) + "/*.parquet")])
    __import__("pyarrow.parquet", fromlist=["write_table"]).write_table(
        tbl, str(d / "documents.parquet"))

    out = to_pandas(vocab_growth_curve(str(d)))
    # every doc introduces 2 new tokens ("w{d}", "w{d}x"); "common" is
    # new only in bucket 1. NTILE(10) over 103 docs: first 3 buckets
    # have 11 docs, the rest 10.
    sizes = [11, 11, 11] + [10] * 7
    exp_new = [2 * s + (1 if i == 0 else 0)
               for i, s in enumerate(sizes)]
    assert list(out["new_tokens"]) == exp_new
    assert list(out["vocab_cum"]) == list(np.cumsum(exp_new))
    assert list(out["bucket"]) == list(range(1, 11))


# ---------------------------------------------- NB lang fit + predict


def _rha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def test_nb_lang_vs_brute(ray_session):
    df = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    train = df[df["doc_id"] % 10 != 0]
    test = df[df["doc_id"] % 10 == 0]

    freq: Counter = Counter()
    for t in train["text"]:
        freq.update(t.split(" "))
    vocab = [t for t, _ in sorted(freq.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:2000]]
    vset = set(vocab)
    V = len(vocab)
    langs = sorted(train["lang"].unique())
    cnt: Counter = Counter()
    tot: Counter = Counter()
    for t, lg in zip(train["text"], train["lang"]):
        for tok in t.split(" "):
            if tok in vset:
                cnt[(lg, tok)] += 1
                tot[lg] += 1
    n_train = len(train)
    prior = {lg: _rha(1e6 * math.log(
        (train["lang"] == lg).sum() / n_train)) for lg in langs}
    W = {(lg, tok): _rha(1e6 * math.log(
        (cnt.get((lg, tok), 0) + 1.0) / (tot.get(lg, 0) + V)))
        for lg in langs for tok in vocab}

    exp = {}
    for did, t, lg in zip(test["doc_id"], test["text"], test["lang"]):
        scores = {l: prior[l] + sum(W[(l, tok)] for tok in t.split(" ")
                                    if tok in vset) for l in langs}
        pred = min(langs, key=lambda l: (-scores[l], l))
        exp[int(did)] = (pred, lg, int(pred == lg))

    out = to_pandas(nb_lang_fit_predict(SF))
    got = {int(r.doc_id): (r.pred_lang, r.true_lang, int(r.correct))
           for r in out.itertuples()}
    assert got == exp
    assert len(got) == len(test)


def test_nb_lang_two_form_equality(ray_session):
    """Driver-folded fit (default) == forced-distributed fallback
    (fit_driver_max=0): the gate must be invisible in output."""
    a = to_pandas(nb_lang_fit_predict(SF)) \
        .sort_values("doc_id").reset_index(drop=True)
    b = to_pandas(nb_lang_fit_predict(SF, fit_driver_max=0)) \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


# ------------------------------------------------- shard balance plan


def test_shard_balance_vs_brute_and_bound(ray_session):
    import heapq

    df = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["source", "text"])
    per = df.assign(n=df["text"].str.split(" ").str.len()) \
        .groupby("source")["n"].sum()
    order = sorted(per.items(), key=lambda kv: (-kv[1], kv[0]))
    heap = [(0, s) for s in range(8)]
    heapq.heapify(heap)
    exp = {}
    loads = [0] * 8
    for src, ntok in order:
        load, sid = heapq.heappop(heap)
        exp[src] = (int(ntok), sid)
        loads[sid] += int(ntok)
        heapq.heappush(heap, (load + int(ntok), sid))

    out = to_pandas(shard_balance_plan(SF))
    got = {r.source: (int(r.n_tokens), int(r.shard))
           for r in out.itertuples()}
    assert got == exp
    # Graham'69 LPT bound: max load ≤ (4/3 − 1/24)·OPT,
    # OPT ≥ max(total/8, max item)
    opt_lb = max(per.sum() / 8.0, per.max())
    assert max(loads) <= (4.0 / 3.0) * opt_lb + 1e-9


# ----------------------------------------------- OLS by source (brute)


def test_ols_vs_brute(ray_session):
    df = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["source", "n_chars", "text"])
    df = df.assign(y=df["text"].str.split(" ").str.len())
    exp = {}
    for src, g in df.groupby("source"):
        n = len(g)
        sx = int(g["n_chars"].sum())
        sy = int(g["y"].sum())
        sxy = int((g["n_chars"] * g["y"]).sum())
        sxx = int((g["n_chars"] ** 2).sum())
        den = n * sxx - sx * sx
        slope = 0.0 if den == 0 else float(n * sxy - sx * sy) / float(den)
        icept = (float(sy) - slope * float(sx)) / n
        exp[src] = (n, round(1e6 * slope), round(1e6 * icept))

    out = to_pandas(ols_chars_tokens_by_source(SF))
    for r in out.itertuples():
        en, es, ei = exp[r.source]
        assert int(r.n) == en
        # brute uses banker's round; allow the half-away difference of
        # ≤ 1 ulp-at-e6 only at exact halves (never observed — assert
        # exact first, fall back to ±1 with a visible message)
        assert abs(int(r.slope_e6) - es) <= 1, r.source
        assert abs(int(r.intercept_e6) - ei) <= 1, r.source
    assert len(out) == len(exp)


def test_ols_degenerate_constant_x(ray_session, tmp_path):
    """A source with constant n_chars has zero variance: slope 0,
    intercept = mean token count — the guarded branch on both sides."""
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "source": pa.array(["cst", "cst", "var", "var"], pa.string()),
        "n_chars": pa.array([10, 10, 5, 15], pa.int64()),
        "text": pa.array(["a b c", "a b c d e", "x y", "x y z w"],
                         pa.string())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = to_pandas(ols_chars_tokens_by_source(str(tmp_path))) \
        .set_index("source")
    assert int(out.loc["cst", "slope_e6"]) == 0
    assert int(out.loc["cst", "intercept_e6"]) == 4_000_000  # mean(3,5)
    # var: points (5,2),(15,4) → slope 0.2, intercept 1
    assert int(out.loc["var", "slope_e6"]) == 200_000
    assert int(out.loc["var", "intercept_e6"]) == 1_000_000


# --------------------------------------------- normalize text (brute)


def test_normalize_vs_brute(ray_session, tmp_path):
    import hashlib

    texts = ["Hello, World!  x", "  UPPER-case_mix 42 ",
             "already clean", "!!!", ""]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = to_pandas(normalize_text_docs(str(tmp_path))) \
        .set_index("doc_id")
    for i, t in enumerate(texts):
        n = re.sub(" +", " ", re.sub("[^a-z0-9 ]", "", t.lower())) \
            .strip(" ")
        assert int(out.loc[i, "n_chars_norm"]) == len(n), (i, n)
        assert out.loc[i, "norm_md5"] == hashlib.md5(
            n.encode()).hexdigest(), (i, n)


# ------------------------------------------------------- NDCG (brute)


def test_ndcg_vs_brute(ray_session, tmp_path):
    """Full-stack brute NDCG on a corpus where ranking ≠ ideal (a
    rel-1 doc can outscore a rel-2 doc via tf saturation), so
    DCG < IDCG genuinely."""
    from rendler_ray.pipelines.queries import (_BM25_B, _BM25_K1,
                                               _BM25_QUERIES)

    texts = {
        0: "hash join hash join hash",
        1: "hash join " + "filler " * 40,
        2: "hash " + "pad " * 5,
        3: "join",
        4: "sort merge sort",
        5: "nothing relevant here at all",
        6: "window stream window stream window stream",
        7: "table scan table scan",
        8: "hash hash hash hash hash hash hash hash",  # rel-1, high tf
    }
    pq.write_table(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": list(texts.values()),
    }), str(tmp_path / "documents.parquet"))

    toks = {d: t.split(" ") for d, t in texts.items()}
    n = len(texts)
    avgdl = sum(len(v) for v in toks.values()) / n

    def rha(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    exp = {}
    for qid, qt in _BM25_QUERIES.items():
        rows = []
        for d, tk in toks.items():
            s, hit = 0.0, False
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
        ranked = [d for _, d in rows[:10]]
        rel = {d: sum(1 for term in qt if term in tk)
               for d, tk in toks.items()}
        dcg = sum(rha(1000000 * rel[d] / math.log2(pos + 1))
                  for pos, d in enumerate(ranked, 1))
        ideal = sorted((r for r in rel.values() if r > 0), reverse=True)
        idcg = sum(rha(1000000 * g / math.log2(pos + 1))
                   for pos, g in enumerate(ideal[:10], 1))
        ndcg = 0 if idcg == 0 else rha(1e6 * (float(dcg) / float(idcg)))
        exp[qid] = (dcg, idcg, ndcg)

    out = to_pandas(ndcg_bm25_eval(str(tmp_path))).set_index("query_id")
    for qid, (dcg, idcg, ndcg) in exp.items():
        assert int(out.loc[qid, "dcg_e6"]) == dcg, qid
        assert int(out.loc[qid, "idcg_e6"]) == idcg, qid
        assert int(out.loc[qid, "ndcg_e6"]) == ndcg, qid
    # the saturation corpus makes at least one query imperfect
    assert any(v[2] < 1_000_000 for v in exp.values())


# --------------------------------------- confusion / topk / z-order


def test_nb_confusion_consistent_with_predictions(ray_session):
    from rendler_ray.pipelines.queries import nb_lang_confusion

    preds = to_pandas(nb_lang_fit_predict(SF))
    exp = preds.groupby(["true_lang", "pred_lang"]).size().to_dict()
    out = to_pandas(nb_lang_confusion(SF))
    got = {(r.true_lang, r.pred_lang): int(r.n)
           for r in out.itertuples()}
    assert got == exp
    assert sum(got.values()) == len(preds)


def test_top_quality_per_source_vs_brute(ray_session):
    from rendler_ray.pipelines.queries import (_clf_weights,
                                               top_quality_docs_per_source)

    df = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "text"])
    scores = {}
    for did, txt in zip(df["doc_id"], df["text"]):
        toks = np.array(txt.split(" "), dtype=object)
        scores[int(did)] = int(_clf_weights(toks).sum())
    exp = {}
    for src, g in df.groupby("source"):
        rows = sorted(((-scores[int(d)], int(d)) for d in g["doc_id"]))
        exp[src] = [(d, -ns, i + 1)
                    for i, (ns, d) in enumerate(rows[:3])]
    out = to_pandas(top_quality_docs_per_source(SF))
    for src, rows in exp.items():
        g = out[out.source == src].sort_values("rank")
        assert list(zip(g["doc_id"], g["clf_score"], g["rank"])) == rows


def test_zorder_bijective_and_sorted(ray_session):
    from rendler_ray.pipelines.queries import zorder_events_layout

    out = to_pandas(zorder_events_layout(SF))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts", "user_id"])
    secs = ev["ts"].astype("int64") // 1_000_000
    exp_x = (ev["user_id"].to_numpy() & 0xFFFF)
    exp_y = ((secs.to_numpy() // 3600) & 0xFFFF)
    by_id = dict(zip(out["event_id"], out["z"]))

    def deinterleave(z, off):
        v = (z >> off) & 0x55555555
        v = (v | (v >> 1)) & 0x33333333
        v = (v | (v >> 2)) & 0x0F0F0F0F
        v = (v | (v >> 4)) & 0x00FF00FF
        v = (v | (v >> 8)) & 0x0000FFFF
        return v

    for eid, x, y in zip(ev["event_id"], exp_x, exp_y):
        z = by_id[int(eid)]
        assert deinterleave(z, 0) == x and deinterleave(z, 1) == y
    # layout property: output rows come back in curve order
    assert (np.diff(out["z"].to_numpy()) >= 0).all()
    assert (out["zbucket"].to_numpy() == (out["z"].to_numpy() >> 26)).all()


# ------------------------------------------ entropy / late events


def test_token_entropy_vs_brute(ray_session):
    from rendler_ray.pipelines.queries import token_entropy_by_source

    df = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["source", "text"])
    exp = {}
    for src, g in df.groupby("source"):
        cnt = Counter()
        for t in g["text"]:
            cnt.update(t.split(" "))
        n = sum(cnt.values())
        se = sum(_rha(1e6 * c * math.log(c)) for c in cnt.values())
        h = math.log(n) - (se / 1e6) / n
        exp[src] = (n, _rha(1e6 * h))
    out = to_pandas(token_entropy_by_source(SF))
    got = {r.source: (int(r.n), int(r.entropy_e6))
           for r in out.itertuples()}
    assert got == exp


def test_late_event_stats_vs_brute(ray_session):
    from rendler_ray.pipelines.queries import late_event_stats

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts", "event_type"]) \
        .sort_values("event_id")
    secs = (ev["ts"].astype("int64") // 1_000_000).to_numpy()
    run = np.maximum.accumulate(secs)
    late = np.zeros(len(ev), dtype=np.int64)
    late[1:] = (secs[1:] < run[:-1] - 3600).astype(np.int64)
    exp = (pd.DataFrame({"event_type": ev["event_type"].to_numpy(),
                         "late": late})
           .groupby("event_type")["late"].agg(["sum", "size"]))
    out = to_pandas(late_event_stats(SF)).set_index("event_type")
    for et, row in exp.iterrows():
        assert int(out.loc[et, "n_late"]) == int(row["sum"]), et
        assert int(out.loc[et, "n_total"]) == int(row["size"]), et
    assert len(out) == len(exp)


def test_late_event_stats_shuffled_stream(ray_session, tmp_path):
    """Out-of-order arrivals (random event time vs arrival order) must
    produce late flags matching the sequential replay — exercises the
    cross-bucket watermark (an early bucket's max gates a later
    bucket's rows)."""
    from rendler_ray.pipelines.queries import late_event_stats

    n = 5000
    rng = np.random.default_rng(3)
    secs = rng.integers(10**9, 10**9 + 50_000, size=n)
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(secs * 1_000_000, pa.timestamp("us")),
        "event_type": pa.array(
            np.where(rng.random(n) < 0.5, "a", "b"), pa.string())})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    run = np.maximum.accumulate(secs)
    late = np.zeros(n, dtype=np.int64)
    late[1:] = (secs[1:] < run[:-1] - 3600).astype(np.int64)
    df = pd.DataFrame({"event_type": tbl["event_type"].to_numpy(
        zero_copy_only=False), "late": late})
    expg = df.groupby("event_type")["late"].agg(["sum", "size"])
    out = to_pandas(late_event_stats(str(tmp_path))) \
        .set_index("event_type")
    for et, row in expg.iterrows():
        assert int(out.loc[et, "n_late"]) == int(row["sum"]), et
        assert int(out.loc[et, "n_total"]) == int(row["size"]), et
    assert int(out["n_late"].sum()) > 0  # the stream IS disordered


def test_late_event_stats_ordered_stream(ray_session, tmp_path):
    """A stream whose event-time order equals arrival order has zero
    late events — and bucket boundaries must not invent any."""
    from rendler_ray.pipelines.queries import late_event_stats

    n = 1000
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(
            np.arange(n, dtype="int64") * 10_000_000_000 + 10**15,
            pa.timestamp("us")),
        "event_type": pa.array(["t"] * n, pa.string())})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = to_pandas(late_event_stats(str(tmp_path)))
    assert int(out["n_late"].iloc[0]) == 0
    assert int(out["n_total"].iloc[0]) == n


# --------------------------------------- vocab overlap / token drift


def test_source_vocab_overlap_vs_brute(ray_session):
    from rendler_ray.pipelines.queries import source_vocab_overlap

    df = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["source", "text"])
    vocab = {}
    for src, g in df.groupby("source"):
        v = set()
        for t in g["text"]:
            v.update(t.split(" "))
        vocab[src] = v
    srcs = sorted(vocab)
    exp = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = len(vocab[a] & vocab[b])
            if inter:
                j = inter / (len(vocab[a]) + len(vocab[b]) - inter)
                exp[(a, b)] = (inter, _rha(1e6 * j))
    out = to_pandas(source_vocab_overlap(SF))
    got = {(r.src_a, r.src_b): (int(r.inter), int(r.jaccard_e6))
           for r in out.itertuples()}
    assert got == exp


def test_token_drift_vs_brute(ray_session):
    from rendler_ray.pipelines.queries import token_drift_halves

    df = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    df0 = Counter()
    df1 = Counter()
    n0 = n1 = 0
    for did, t in zip(df["doc_id"], df["text"]):
        toks = set(t.split(" "))
        if did % 2 == 0:
            n0 += 1
            df0.update(toks)
        else:
            n1 += 1
            df1.update(toks)
    rows = []
    for tok in set(df0) | set(df1):
        s = abs(math.log((df0.get(tok, 0) + 1.0) / (n0 + 1))
                - math.log((df1.get(tok, 0) + 1.0) / (n1 + 1)))
        rows.append((-_rha(1e6 * s), tok, df0.get(tok, 0),
                     df1.get(tok, 0)))
    rows.sort()
    exp = [(t, d0, d1, -ns) for ns, t, d0, d1 in rows[:20]]
    out = to_pandas(token_drift_halves(SF))
    got = list(zip(out["token"], out["df0"], out["df1"],
                   out["drift_e6"]))
    assert [(t, int(a), int(b), int(s)) for t, a, b, s in got] == exp


# ------------------------------------------------ JL / k-fold


def test_jl_distance_preservation(ray_session):
    from rendler_ray.pipelines.queries import jl_project_embeddings

    out = to_pandas(jl_project_embeddings(SF))
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    orig = {int(i): np.asarray(v, np.float64)
            for i, v in zip(emb["vec_id"], emb["embedding"])}
    proj = {}
    for vid, g in out.groupby("vec_id"):
        proj[int(vid)] = g.sort_values("i")["proj_e6"].to_numpy() / 1e6
    assert set(proj) == set(orig)
    assert all(len(v) == 16 for v in proj.values())
    # JL property: squared distances preserved in expectation; with
    # d=16 individual pairs fluctuate, so check the mean ratio over
    # many pairs is near 1 and no pair is wildly distorted
    rng = np.random.default_rng(5)
    ids = sorted(orig)
    ratios = []
    for _ in range(200):
        a, b = rng.choice(ids, 2, replace=False)
        d0 = np.sum((orig[a] - orig[b]) ** 2)
        d1 = np.sum((proj[a] - proj[b]) ** 2)
        if d0 > 0:
            ratios.append(d1 / d0)
    r = np.array(ratios)
    assert abs(r.mean() - 1.0) < 0.15
    assert (r > 0.2).all() and (r < 5.0).all()
    # determinism: same seed, same sketch
    out2 = to_pandas(jl_project_embeddings(SF))
    assert (out.sort_values(["vec_id", "i"])["proj_e6"].to_numpy()
            == out2.sort_values(["vec_id", "i"])["proj_e6"].to_numpy()
            ).all()


def test_stratified_kfold_vs_brute_and_balance(ray_session):
    import hashlib

    from rendler_ray.pipelines.queries import stratified_kfold_docs

    df = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "source"])
    exp = {}
    for src, g in df.groupby("source"):
        hs = sorted((hashlib.md5(f"{d}-kf1".encode()).hexdigest(), d)
                    for d in g["doc_id"])
        for rk, (_, d) in enumerate(hs):
            exp[int(d)] = rk % 5
    out = to_pandas(stratified_kfold_docs(SF))
    got = dict(zip(out["doc_id"].astype(int), out["fold"].astype(int)))
    assert got == exp
    # stratification: within every source, fold sizes differ by ≤ 1
    for src, g in out.groupby("source"):
        sizes = g["fold"].value_counts()
        assert sizes.max() - sizes.min() <= 1, src


# --------------------------------------------- crawl graph stats


def test_crawl_graph_stats_vs_brute(ray_session):
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.pipelines.queries import (_synth_docs_for,
                                               crawl_graph_stats)
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(SF),
                            seeds=default_seeds(1), max_depth=4))
    e = to_pandas(res.edges.select_columns(["src", "dst"]))
    pairs = set(zip(e["src"], e["dst"]))
    nodes = {x for p in pairs for x in p}
    loops = sum(1 for a, b in pairs if a == b)
    mutual = sum(1 for a, b in pairs
                 if a < b and (b, a) in pairs)
    srcs = {a for a, b in pairs}
    dsts = {b for a, b in pairs}
    out = to_pandas(crawl_graph_stats(SF)).iloc[0]
    assert int(out["n_edges"]) == len(pairs)
    assert int(out["n_nodes"]) == len(nodes)
    assert int(out["n_self_loops"]) == loops
    assert int(out["n_mutual_pairs"]) == mutual
    assert int(out["n_source_nodes"]) == len(nodes - dsts)
    assert int(out["n_sink_nodes"]) == len(nodes - srcs)
