"""Conformance: the Ray pipeline must reproduce the reference state
machine (refsim) exactly — fetch order, seen set, edge set, renders."""

import pyarrow.parquet as pq
import pytest

from rendler_ray.pipelines.crawl import CrawlConfig, crawl
from rendler_ray.refsim import simulate
from rendler_ray.sources.synthweb import default_seeds
from rendler_ray.util import table_from_ds


def _run(small_docs, **kw):
    cfg = CrawlConfig(
        docs_path=small_docs,
        seeds=kw.pop("seeds", default_seeds(1)),
        num_seen_shards=2,
        num_web_shards=2,
        fetch_concurrency=(1, 2),
        render_concurrency=(1, 2),
        **kw,
    )
    return crawl(cfg)


def _assert_conformance(res, sim):
    fetched = table_from_ds(res.fetched)
    order = [
        u for _, u in sorted(
            zip(fetched["seq"].to_pylist(), fetched["url"].to_pylist())
        )
    ]
    assert order == sim.order, "crawl (fetch) order mismatch"

    frontier = table_from_ds(res.frontier_log)
    assert set(frontier["url"].to_pylist()) == sim.seen, "URL-seen set mismatch"
    assert res.seen_count == len(sim.seen)

    edges = table_from_ds(res.edges)
    got = sorted(
        zip(edges["src"].to_pylist(), edges["dst"].to_pylist(),
            edges["ord"].to_pylist())
    )
    assert got == sorted(sim.edges), "edge list mismatch"

    renders = table_from_ds(res.renders)
    assert set(renders["doc_id"].to_pylist()) == set(sim.rendered)


@pytest.mark.usefixtures("ray_session")
def test_full_crawl_conformance(small_docs):
    res = _run(small_docs)
    sim = simulate(pq.read_table(small_docs), default_seeds(1))
    _assert_conformance(res, sim)
    assert res.pages_fetched == len(sim.order)


@pytest.mark.usefixtures("ray_session")
def test_max_depth_conformance(small_docs):
    res = _run(small_docs, max_depth=2)
    sim = simulate(pq.read_table(small_docs), default_seeds(1), max_depth=2)
    _assert_conformance(res, sim)


@pytest.mark.usefixtures("ray_session")
def test_max_pages_conformance(small_docs):
    res = _run(small_docs, max_pages=17)
    sim = simulate(pq.read_table(small_docs), default_seeds(1), max_pages=17)
    _assert_conformance(res, sim)


@pytest.mark.usefixtures("ray_session")
def test_multi_seed_conformance(small_docs):
    seeds = default_seeds(3)
    res = _run(small_docs, seeds=seeds)
    sim = simulate(pq.read_table(small_docs), seeds)
    _assert_conformance(res, sim)


@pytest.mark.usefixtures("ray_session")
def test_span_sequence_invariant(small_docs):
    """The driver's per-row invariant: (kind, text, media_ref, order) per
    doc_id must survive the pipeline (BASELINE.json input_hint)."""
    res = _run(small_docs, max_pages=40)
    fetched = table_from_ds(res.fetched)
    src = {r["doc_id"]: r["spans"] for r in pq.read_table(small_docs).to_pylist()}
    n_checked = 0
    for row in fetched.to_pylist():
        if row["status"] != 200:
            continue
        assert row["spans"] == src[row["url"]], f"span corruption for {row['url']}"
        n_checked += 1
    assert n_checked > 0


@pytest.mark.usefixtures("ray_session")
def test_cuckoo_mode_conformance(small_docs):
    """The 10^10-scale seen-set path (cuckoo filters) must match the
    exact path on a corpus far below capacity (FPR ~1e-4)."""
    res = _run(small_docs, seen_mode="cuckoo", seen_capacity_per_shard=1 << 16)
    sim = simulate(pq.read_table(small_docs), default_seeds(1))
    _assert_conformance(res, sim)


@pytest.fixture(scope="session")
def redirect_docs(tmp_path_factory):
    """Corpus where ~20% of pages are HTTP-301 redirects (one
    kind="redirect" span holding the absolute Location URL)."""
    from rendler_ray.sources.synthweb import docs_parquet

    p = tmp_path_factory.mktemp("webr") / "docs.parquet"
    return docs_parquet(str(p), n_docs=300, n_hosts=8, seed=42,
                        p_redirect=0.2)


@pytest.mark.usefixtures("ray_session")
def test_redirect_conformance(redirect_docs):
    """301 pages: fetched (Location edge followed) but never rendered —
    exact order/seen/edge/render equality vs the refsim oracle."""
    res = _run(redirect_docs)
    sim = simulate(pq.read_table(redirect_docs), default_seeds(1))
    _assert_conformance(res, sim)

    fetched = table_from_ds(res.fetched)
    st = dict(zip(fetched["url"].to_pylist(), fetched["status"].to_pylist()))
    n301 = sum(1 for v in st.values() if v == 301)
    n200 = sum(1 for v in st.values() if v == 200)
    assert n301 > 0, "corpus produced no reachable redirects"
    assert len(sim.rendered) == n200  # 404s + 301s never render
    # every rendered page is a 200; no 301 ever rendered
    renders = table_from_ds(res.renders)
    assert all(st[u] == 200 for u in renders["doc_id"].to_pylist())


@pytest.mark.usefixtures("ray_session")
def test_canonical_conformance(tmp_path_factory):
    """rel=canonical spans: the canonical target is one more (trailing)
    extracted edge — exact conformance on a corpus mixing canonicals
    AND redirects (redirect pages are exempt from annotation)."""
    from rendler_ray.sources.synthweb import docs_parquet

    p = tmp_path_factory.mktemp("webc") / "docs.parquet"
    docs = docs_parquet(str(p), n_docs=300, n_hosts=8, seed=42,
                        p_redirect=0.1, p_canonical=0.3)
    res = _run(docs)
    sim = simulate(pq.read_table(docs), default_seeds(1))
    _assert_conformance(res, sim)

    src = pq.read_table(docs)
    n_canon = sum(any(sp["kind"] == "canonical" for sp in row)
                  for row in src["spans"].to_pylist())
    assert n_canon > 0, "corpus produced no canonical annotations"


@pytest.mark.usefixtures("ray_session")
def test_actor_stage_mode_conformance(small_docs):
    """stage_mode='actors' (Fetcher/Renderer actor pools over WebShard
    actors) — same semantics as the task-mode default."""
    res = _run(small_docs, stage_mode="actors", max_depth=2)
    sim = simulate(pq.read_table(small_docs), default_seeds(1), max_depth=2)
    _assert_conformance(res, sim)


@pytest.mark.usefixtures("ray_session")
def test_edge_cases_empty_crawls(small_docs):
    """Degenerate inputs must produce clean empty results, not crashes:
    a 404 seed (fetched, nothing extracted) and max_pages=0."""
    res = _run(small_docs, seeds=["s://h999/p99999"])
    assert res.pages_fetched == 1          # the dangling seed itself
    assert res.edges.count() == 0          # (empty ds loses its schema:
    assert res.renders.count() == 0        # assert counts, not columns)
    sim = simulate(pq.read_table(small_docs), ["s://h999/p99999"])
    assert sim.order == ["s://h999/p99999"] and not sim.edges
    fetched = table_from_ds(res.fetched)
    assert fetched["url"].to_pylist() == sim.order
    assert res.seen_count == len(sim.seen) == 1

    res0 = _run(small_docs, max_pages=0)
    assert res0.pages_fetched == 0
    assert res0.edges.count() == 0
