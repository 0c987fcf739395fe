"""Priority-driven frontier scheduling (stages/prioritize.py).

Invariants: prioritization changes only the fetch ORDER across rounds —
the final fetched URL set, depths, and seen set must equal the FIFO
crawl's; per-round fetch counts respect the cap; the join-form score
attach (past the broadcast ceiling) is value-identical to the broadcast
form.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from rendler_ray.pipelines.crawl import CrawlConfig, crawl
from rendler_ray.sources.synthweb import default_seeds, docs_parquet


@pytest.fixture(scope="module")
def small_docs(tmp_path_factory):
    p = tmp_path_factory.mktemp("prio") / "docs.parquet"
    return docs_parquet(str(p), n_docs=400, n_hosts=10, seed=42)


def _fetch_rows(res):
    t = res.fetched.select_columns(["url", "depth", "seq"]).take_all()
    return {r["url"]: (r["depth"], r["seq"]) for r in t}


def _scores_path(small_docs, tmp_path, base) -> str:
    from rendler_ray.functions.graph import pagerank

    import numpy as np

    ranks = pagerank(base.edges, iters=5)
    spath = str(tmp_path / "scores.parquet")
    pq.write_table(pa.table({
        "url": pa.array(ranks["url"], pa.string()),
        "score": pa.array(
            np.round(ranks["rank"].to_numpy() * 1e9).astype(np.int64),
            pa.int64())}), spath)
    return spath


@pytest.mark.usefixtures("ray_session")
def test_priority_gate_split():
    from rendler_ray.stages.prioritize import priority_gate

    frontier = rd.from_arrow(pa.table({
        "url": ["u0", "u1", "u2", "u3"],
        "canon_url": ["u0", "u1", "u2", "u3"],
        "host": ["h"] * 4,
        "depth": pa.array([1] * 4, pa.int32()),
        "seq": pa.array([10, 11, 12, 13], pa.int64()),
    }))
    scores = rd.from_arrow(pa.table({
        "url": ["u2", "u0"],
        "score": pa.array([100, 50], pa.int64()),
    }))
    adm, dfr = priority_gate(frontier, scores, k=2)
    a = sorted(r["url"] for r in adm.take_all())
    d = sorted(r["url"] for r in dfr.take_all())
    assert a == ["u0", "u2"]  # top scores; u1/u3 (score 0) defer
    assert d == ["u1", "u3"]
    # whole frontier fits -> no deferral
    adm, dfr = priority_gate(frontier, scores, k=10)
    assert dfr is None and adm.count() == 4


@pytest.mark.usefixtures("ray_session")
def test_prioritized_crawl_same_set_different_order(small_docs, tmp_path):
    """Without a depth cap, prioritization is order-only: the fetched
    set is the reachable closure either way. (Under a max_depth cap the
    sets legitimately differ — deferral can push first discovery of a
    page onto a longer path, pruning its children.)"""
    base = crawl(CrawlConfig(docs_path=small_docs, seeds=default_seeds(1)))
    spath = _scores_path(small_docs, tmp_path, base)

    out = str(tmp_path / "prio_out")
    prio = crawl(CrawlConfig(docs_path=small_docs, seeds=default_seeds(1),
                             priority_scores=spath,
                             priority_per_round=64, out_dir=out))

    b, p = _fetch_rows(base), _fetch_rows(prio)
    assert set(b) == set(p)                       # same fetched URL set
    assert prio.seen_count == base.seen_count
    assert prio.rounds > base.rounds              # cap forces more rounds
    assert prio.deferred_rounds > 0

    # per-round fetch counts respect the cap
    r = 0
    while os.path.exists(os.path.join(out, f"round={r}", "fetch.parquet")):
        n = pq.read_table(
            os.path.join(out, f"round={r}", "fetch.parquet"),
            columns=["url"]).num_rows
        assert n <= 64
        r += 1
    assert r == prio.rounds


@pytest.mark.usefixtures("ray_session")
def test_join_form_identical_to_broadcast(small_docs, tmp_path):
    base = crawl(CrawlConfig(docs_path=small_docs, seeds=default_seeds(1),
                             max_depth=3))
    spath = _scores_path(small_docs, tmp_path, base)
    kw = dict(docs_path=small_docs, seeds=default_seeds(1), max_depth=3,
              priority_scores=spath, priority_per_round=16)
    bc = crawl(CrawlConfig(**kw))
    jn = crawl(CrawlConfig(**kw, priority_broadcast_max=0))
    assert _fetch_rows(bc) == _fetch_rows(jn)  # identical incl. seqs
