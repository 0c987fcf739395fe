"""Property tests over generator randomization (SURVEY.md §5.2 item 3):
the per-row invariant from BASELINE.json — span-sequence equality
(kind, text, media_ref, order) per doc_id — must hold through the full
crawl for ANY generator parameters, and the crawl must match refsim."""

import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rendler_ray.pipelines.crawl import CrawlConfig, crawl
from rendler_ray.refsim import simulate
from rendler_ray.sources.synthweb import default_seeds, generate_docs
from rendler_ray.util import table_from_ds


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10_000),
       n_docs=st.integers(30, 120),
       n_hosts=st.integers(2, 6),
       mean_links=st.floats(1.0, 8.0),
       mean_images=st.floats(0.0, 2.0))
def test_span_invariant_and_conformance(tmp_path_factory, seed, n_docs,
                                        n_hosts, mean_links, mean_images):
    tbl = generate_docs(n_docs=n_docs, n_hosts=n_hosts,
                        mean_links=mean_links, mean_images=mean_images,
                        seed=seed)
    path = str(tmp_path_factory.mktemp("docs") / f"d{seed}.parquet")
    pq.write_table(tbl, path)

    res = crawl(CrawlConfig(docs_path=path, seeds=default_seeds(1),
                            num_seen_shards=2, num_web_shards=2))

    # per-row invariant: fetched spans == input spans, order included
    src = {d: sp for d, sp in zip(tbl["doc_id"].to_pylist(),
                                  tbl["spans"].to_pylist())}
    fetched = table_from_ds(res.fetched)
    for url, status, spans in zip(fetched["url"].to_pylist(),
                                  fetched["status"].to_pylist(),
                                  fetched["spans"].to_pylist()):
        if status == 200:
            assert spans == src[url], f"span sequence corrupted for {url}"
        else:
            assert spans == []

    # conformance: seen set + crawl order match the reference simulator
    sim = simulate(tbl, default_seeds(1))
    order = [u for _, u in sorted(zip(fetched["seq"].to_pylist(),
                                      fetched["url"].to_pylist()))]
    assert order == sim.order
    assert res.seen_count == len(sim.seen)
