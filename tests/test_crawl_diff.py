"""Cross-run crawl diffing (pipelines/diff.py) conformance: the
distributed edge/page diffs must equal the set/fingerprint diffs of two
independent refsim crawls over the base and mutated corpus snapshots."""

import hashlib

import pyarrow.parquet as pq
import pytest

from rendler_ray.pipelines.crawl import CrawlConfig, crawl
from rendler_ray.pipelines.diff import edge_diff, page_diff
from rendler_ray.refsim import edge_set, simulate
from rendler_ray.sources.synthweb import default_seeds, mutated_docs_parquet
from rendler_ray.util import table_from_ds


@pytest.fixture(scope="module")
def docs_pair(small_docs):
    return small_docs, mutated_docs_parquet(small_docs)


@pytest.fixture(scope="module")
def crawl_pair(ray_session, docs_pair):
    a, b = docs_pair
    kw = dict(seeds=default_seeds(1), max_depth=4, num_seen_shards=2,
              num_web_shards=2, fetch_concurrency=(1, 2),
              render_concurrency=(1, 2))
    return (crawl(CrawlConfig(docs_path=a, **kw)),
            crawl(CrawlConfig(docs_path=b, **kw)))


@pytest.fixture(scope="module")
def sim_pair(docs_pair):
    a, b = docs_pair
    return (simulate(pq.read_table(a), default_seeds(1), max_depth=4),
            simulate(pq.read_table(b), default_seeds(1), max_depth=4))


def _sim_fp_map(docs_path, sim):
    """url -> md5-of-text-spans for every 200-fetched page (independent
    recomputation of the pipeline's content fingerprint)."""
    tbl = pq.read_table(docs_path)
    texts = {}
    for did, spans in zip(tbl["doc_id"].to_pylist(),
                          tbl["spans"].to_pylist()):
        texts[did] = "\n".join(sp["text"] for sp in spans
                               if sp["kind"] == "text")
    return {u: hashlib.md5(texts[u].encode()).hexdigest()
            for u in sim.rendered}


def test_mutation_is_deterministic_and_nontrivial(docs_pair):
    a, b = docs_pair
    ta, tb = pq.read_table(a), pq.read_table(b)
    assert tb.equals(pq.read_table(mutated_docs_parquet(a)))
    ids_a, ids_b = set(ta["doc_id"].to_pylist()), set(tb["doc_id"].to_pylist())
    assert ids_b < ids_a, "mutation must drop at least one page"
    assert default_seeds(1)[0] in ids_b


def test_edge_diff_conformance(crawl_pair, sim_pair):
    res_a, res_b = crawl_pair
    sim_a, sim_b = sim_pair
    ea, eb = edge_set(sim_a), edge_set(sim_b)
    got = table_from_ds(edge_diff(res_a.edges, res_b.edges))
    got_added = {(s, d) for c, s, d in zip(got["change"].to_pylist(),
                                           got["src"].to_pylist(),
                                           got["dst"].to_pylist())
                 if c == "added"}
    got_removed = {(s, d) for c, s, d in zip(got["change"].to_pylist(),
                                             got["src"].to_pylist(),
                                             got["dst"].to_pylist())
                   if c == "removed"}
    assert got_added == eb - ea
    assert got_removed == ea - eb
    assert got_removed, "dropped pages must remove edges"
    assert got_added, "added outlinks must add edges"
    assert len(got) == len(got_added) + len(got_removed)


def test_page_diff_conformance(crawl_pair, sim_pair, docs_pair):
    res_a, res_b = crawl_pair
    sim_a, sim_b = sim_pair
    docs_a, docs_b = docs_pair
    fa, fb = _sim_fp_map(docs_a, sim_a), _sim_fp_map(docs_b, sim_b)
    exp = {}
    for u in fa.keys() | fb.keys():
        if u not in fb:
            exp[u] = "removed"
        elif u not in fa:
            exp[u] = "added"
        elif fa[u] != fb[u]:
            exp[u] = "changed"
    got_t = table_from_ds(page_diff(res_a.fetched, res_b.fetched))
    got = dict(zip(got_t["url"].to_pylist(), got_t["change"].to_pylist()))
    assert got == exp
    assert "removed" in got.values()
    assert "changed" in got.values()


def test_diff_of_identical_runs_is_empty(crawl_pair):
    res_a, _ = crawl_pair
    assert table_from_ds(edge_diff(res_a.edges, res_a.edges)).num_rows == 0
    assert table_from_ds(page_diff(res_a.fetched, res_a.fetched)).num_rows == 0
