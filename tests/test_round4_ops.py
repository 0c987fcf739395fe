"""Round-4 ops: token-budget data selection — checked against an
independent brute-force recomputation plus degenerate-shape edges."""

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rendler_ray.goldenhash import to_pandas
from rendler_ray.pipelines.queries import select_docs_token_budget

SF = "/root/testdata/sf0.001"


def _clf_score(text: str) -> int:
    s = 0
    for tok in text.split(" "):
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        s += h % 1001 - 500
    return s


def _brute(texts: dict[int, str], budget_div: int) -> set[int]:
    rows = sorted(
        ((-_clf_score(t), d, len(t.split(" "))) for d, t in texts.items()))
    budget = sum(r[2] for r in rows) // budget_div
    kept, cum = set(), 0
    for negs, d, n in rows:
        cum += n
        if cum > budget:
            break
        kept.add(d)
    return kept


@pytest.mark.usefixtures("ray_session")
def test_token_budget_brute_force(tmp_path):
    texts = {i: f"doc {i} text with some tokens number{i} "
                f"{'pad ' * (i % 7)}".strip()
             for i in range(40)}
    pq.write_table(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": list(texts.values()),
    }), str(tmp_path / "documents.parquet"))

    got = set(to_pandas(select_docs_token_budget(str(tmp_path)))["doc_id"])
    assert got == _brute(texts, 4)
    assert len(got) > 0


@pytest.mark.usefixtures("ray_session")
def test_token_budget_identical_scores_zero_width(tmp_path):
    """All docs share one score → score range collapses to a single
    histogram bucket → the whole cut resolves in the exact driver sort
    (zero-width guard + doc_id tie-break)."""
    texts = {i: "same words every time" for i in range(10)}
    pq.write_table(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": list(texts.values()),
    }), str(tmp_path / "documents.parquet"))

    got = to_pandas(select_docs_token_budget(str(tmp_path)))
    # budget = 40 // 4 = 10 tokens -> exactly 2 four-token docs, lowest
    # doc_ids first (score ties break on doc_id asc)
    assert sorted(got["doc_id"]) == [0, 1]


def _gset(s: str) -> frozenset:
    tk = s.split(" ")
    if len(tk) < 5:
        return frozenset((s,))
    return frozenset(" ".join(tk[i:i + 5]) for i in range(len(tk) - 4))


@pytest.mark.usefixtures("ray_session")
def test_gram_containment_brute_force(tmp_path):
    """Excerpt detection: doc 1 embeds all of doc 0 inside a longer
    page (containment 1.0, Jaccard well under 0.5); docs 2/3 are
    identical short docs; doc 4 is unrelated."""
    from rendler_ray.pipelines.queries import gram_containment_pairs

    quote = "alpha beta gamma delta epsilon zeta eta"
    texts = {
        0: quote,
        1: ("intro words before the quote " + quote
            + " and a very long tail of unrelated filler text "
            + " ".join(f"w{i}" for i in range(40))),
        2: "tiny doc",
        3: "tiny doc",
        4: "completely different content about other things entirely ok",
    }
    pq.write_table(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": list(texts.values()),
    }), str(tmp_path / "documents.parquet"))

    # brute force with the same rare-gram candidate rule (2 <= df <= 20)
    gsets = {d: _gset(t) for d, t in texts.items()}
    df: dict[str, set] = {}
    for d, gs in gsets.items():
        for g in gs:
            df.setdefault(g, set()).add(d)
    rare = {g for g, ds_ in df.items() if 2 <= len(ds_) <= 20}
    cands = set()
    for g in rare:
        ds_ = sorted(df[g])
        for i in range(len(ds_)):
            for j in range(i + 1, len(ds_)):
                cands.add((ds_[i], ds_[j]))
    want = {}
    for a, b in cands:
        inter = len(gsets[a] & gsets[b])
        m = min(len(gsets[a]), len(gsets[b]))
        if 2 * inter >= m:
            want[(a, b)] = round(inter / m * 1e6)

    got = to_pandas(gram_containment_pairs(str(tmp_path)))
    got_d = {(r.a, r.b): r.containment_e6 for r in got.itertuples()}
    assert got_d == want
    assert (0, 1) in got_d and got_d[(0, 1)] == 1_000_000
    assert (2, 3) in got_d


@pytest.mark.usefixtures("ray_session")
def test_gram_containment_driver_gate_equals_distributed():
    """Driver-fold pair emit + verify vs the distributed map_groups +
    join form (same gate-invisibility contract as dup_span/trigram)."""
    from rendler_ray.pipelines.queries import gram_containment_pairs

    key = ["a", "b"]
    x = (to_pandas(gram_containment_pairs(SF))
         .sort_values(key).reset_index(drop=True))
    y = (to_pandas(gram_containment_pairs(SF, driver_max=0))
         .sort_values(key).reset_index(drop=True))
    assert len(x) > 0
    pd.testing.assert_frame_equal(x[sorted(x.columns)], y[sorted(y.columns)])


@pytest.mark.usefixtures("ray_session")
def test_token_budget_refinement_equals_direct(tmp_path):
    """driver_max=0 forces full histogram bisection down to single
    values — including the doc_id tie-break phase when every doc shares
    one score — and must match both the direct form and brute force."""
    from rendler_ray.pipelines.queries import select_docs_token_budget

    texts = {i: "same words every time" for i in range(12)}  # all tied
    texts.update({100 + i: f"unique text number{i} with filler "
                           f"{'pad ' * (i % 5)}".strip()
                  for i in range(20)})
    pq.write_table(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": list(texts.values()),
    }), str(tmp_path / "documents.parquet"))

    a = (to_pandas(select_docs_token_budget(str(tmp_path)))
         .sort_values("doc_id").reset_index(drop=True))
    b = (to_pandas(select_docs_token_budget(str(tmp_path), driver_max=0))
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])
    assert set(a["doc_id"]) == _brute(texts, 4)


@pytest.mark.usefixtures("ray_session")
def test_source_median_gate_brute_force(tmp_path):
    """Per-source exact median gating vs brute force: odd and even
    group sizes plus a singleton source (whose sole doc can never beat
    its own median and must drop)."""
    from rendler_ray.pipelines.queries import source_median_quality_gate

    texts, sources = {}, {}
    for i in range(9):            # odd-size source
        texts[i] = f"alpha words number{i} for source one item{i}"
        sources[i] = "s_odd"
    for i in range(9, 15):        # even-size source
        texts[i] = f"beta tokens item number{i} two {('x ' * (i % 4))}".strip()
        sources[i] = "s_even"
    texts[15] = "single doc in its own source"
    sources[15] = "s_one"
    pq.write_table(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": list(texts.values()),
        "source": pa.array([sources[d] for d in texts], pa.string()),
    }), str(tmp_path / "documents.parquet"))

    scores = {d: _clf_score(t) for d, t in texts.items()}
    want = set()
    for src in set(sources.values()):
        vs = sorted(scores[d] for d in texts if sources[d] == src)
        n = len(vs)
        m2 = vs[(n + 1) // 2 - 1] + vs[n // 2]
        want |= {d for d in texts
                 if sources[d] == src and 2 * scores[d] > m2}

    got = to_pandas(source_median_quality_gate(str(tmp_path)))
    assert set(got["doc_id"]) == want
    assert not any(got["source"] == "s_one")  # singleton always drops
    assert len(want) > 0

    # n_hist=2 forces the deepest possible value bisection (one bit per
    # level) — must agree with the wide-histogram form exactly
    got2 = to_pandas(source_median_quality_gate(str(tmp_path), n_hist=2))
    assert set(got2["doc_id"]) == want


@pytest.mark.usefixtures("ray_session")
def test_token_budget_div1_keeps_everything(tmp_path):
    """budget = total tokens → no bucket ever crosses → the
    keep-everything fast path returns every doc."""
    texts = {i: f"some text {i}" for i in range(8)}
    pq.write_table(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": list(texts.values()),
    }), str(tmp_path / "documents.parquet"))

    got = to_pandas(select_docs_token_budget(str(tmp_path), budget_div=1))
    assert sorted(got["doc_id"]) == list(range(8))
