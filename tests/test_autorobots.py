import pyarrow.parquet as pq
import pytest

from rendler_ray.pipelines.crawl import CrawlConfig, crawl
from rendler_ray.sources.synthweb import default_seeds, docs_parquet
from rendler_ray.util import table_from_ds


@pytest.mark.usefixtures("ray_session")
def test_auto_robots_fetched_from_web(tmp_path):
    """auto_robots=True: each host's /robots.txt is fetched from the
    closed world; its Disallow and Crawl-delay apply. Hosts without a
    robots page are allow-all."""
    docs = docs_parquet(str(tmp_path / "docs.parquet"), n_docs=300,
                        n_hosts=8, seed=42, p_host_robots=1.0)
    res = crawl(CrawlConfig(docs_path=docs, seeds=default_seeds(1),
                            max_depth=3, num_seen_shards=2,
                            num_web_shards=2, auto_robots=True))
    fetched = table_from_ds(res.fetched)
    urls = fetched["url"].to_pylist()
    # Disallow: /p00001 must keep every host's p00001* pages unfetched
    blocked = [u for u in urls if u.split("/")[-1].startswith("p00001")]
    assert blocked == [], blocked
    # robots.txt pages themselves never get crawled as pages
    assert not any(u.endswith("robots.txt") for u in urls)
    # crawl-delay 2s at 60s window => budget 30/host/round => deferrals
    assert res.pages_fetched > 0

    # same corpus WITHOUT auto_robots fetches the blocked pages
    res2 = crawl(CrawlConfig(docs_path=docs, seeds=default_seeds(1),
                             max_depth=3, num_seen_shards=2,
                             num_web_shards=2))
    urls2 = table_from_ds(res2.fetched)["url"].to_pylist()
    assert any(u.split("/")[-1].startswith("p00001") for u in urls2)


@pytest.mark.usefixtures("ray_session")
def test_sharded_host_ledger_identical(tmp_path):
    """The sharded host ledger (the auto_robots DEFAULT since r4;
    host_ledger_shards=0 is the explicit driver-dict opt-out) must
    crawl identically to the driver-dict ledger."""
    docs = docs_parquet(str(tmp_path / "docs_hl.parquet"), n_docs=300,
                        n_hosts=8, seed=42, p_host_robots=0.7)
    base = dict(docs_path=docs, seeds=default_seeds(1), max_depth=3,
                num_seen_shards=2, num_web_shards=2, auto_robots=True)
    drv = crawl(CrawlConfig(**base, host_ledger_shards=0))
    shd = crawl(CrawlConfig(**base, host_ledger_shards=2))
    a = sorted(zip(table_from_ds(drv.fetched)["seq"].to_pylist(),
                   table_from_ds(drv.fetched)["url"].to_pylist()))
    b = sorted(zip(table_from_ds(shd.fetched)["seq"].to_pylist(),
                   table_from_ds(shd.fetched)["url"].to_pylist()))
    assert a == b
    assert drv.rounds == shd.rounds and drv.seen_count == shd.seen_count
