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
