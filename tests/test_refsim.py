import pyarrow.parquet as pq

from rendler_ray.refsim import edge_set, simulate
from rendler_ray.sources.synthweb import default_seeds, generate_docs


def test_fifo_bfs_order():
    docs = generate_docs(n_docs=100, n_hosts=4, seed=42)
    r = simulate(docs, default_seeds(1))
    assert r.order[0] == default_seeds(1)[0]
    # BFS: depths along the visit order are non-decreasing
    depths = [r.depth[u] for u in r.order]
    assert depths == sorted(depths)
    # every fetched url was seen; seen ⊇ fetched
    assert set(r.order) <= r.seen
    # no url fetched twice
    assert len(r.order) == len(set(r.order))


def test_max_depth_gates_discovery():
    docs = generate_docs(n_docs=100, n_hosts=4, seed=42)
    r = simulate(docs, default_seeds(1), max_depth=1)
    assert max(r.depth.values()) <= 1
    full = simulate(docs, default_seeds(1))
    assert len(r.seen) <= len(full.seen)
    # edges still recorded for over-depth links
    assert edge_set(r) <= edge_set(full)


def test_max_pages_truncates():
    docs = generate_docs(n_docs=100, n_hosts=4, seed=42)
    r = simulate(docs, default_seeds(1), max_pages=10)
    assert len(r.order) == 10


def test_404s_consume_but_produce_nothing():
    docs = generate_docs(n_docs=80, n_hosts=4, seed=11, p_dangle=0.5)
    r = simulate(docs, default_seeds(1))
    fetched_404 = [u for u in r.order if u not in set(docs["doc_id"].to_pylist())]
    assert fetched_404, "expected some dangling fetches with p_dangle=0.5"
    srcs = {s for s, _, _ in r.edges}
    assert not (set(fetched_404) & srcs)
    assert not (set(fetched_404) & set(r.rendered))
