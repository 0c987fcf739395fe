"""Transient fetch-failure model: in-task bounded retries, then the
TASK_FAILED give-up path (status 598, no spans, no children, still
seen). See stages/fetch.py::inject_transient_failures."""

import pytest

from rendler_ray.pipelines.crawl import CrawlConfig, crawl
from rendler_ray.sources.synthweb import default_seeds


def _signature(res):
    df = (res.fetched.select_columns(["url", "depth", "seq", "status"])
          .to_pandas().sort_values("seq").reset_index(drop=True))
    return df, res.seen_count, res.edges.count()


@pytest.mark.usefixtures("ray_session")
def test_retries_recover_baseline(small_docs):
    """Failures are transient, so enough in-task retries must make the
    crawl BIT-IDENTICAL to a failure-free run (per-url permanent-failure
    probability 0.5^26 ≈ 1.5e-8)."""
    base = crawl(CrawlConfig(docs_path=small_docs, seeds=default_seeds(1)))
    flaky = crawl(CrawlConfig(docs_path=small_docs, seeds=default_seeds(1),
                              fetch_fail_rate=0.5, fetch_fail_seed=3,
                              fetch_retries=25))
    bdf, bseen, bedges = _signature(base)
    fdf, fseen, fedges = _signature(flaky)
    assert bdf.equals(fdf)
    assert (bseen, bedges) == (fseen, fedges)


@pytest.mark.usefixtures("ray_session")
def test_all_attempts_fail(small_docs):
    """fail_rate=1.0: every attempt fails, every fetch gives up — the
    crawl degrades to the seed round with zero edges, no crash."""
    res = crawl(CrawlConfig(docs_path=small_docs, seeds=default_seeds(2),
                            fetch_fail_rate=1.0, fetch_retries=2))
    df = res.fetched.to_pandas()
    assert set(df["status"]) == {598}
    assert len(df) == 2 and res.edges.count() == 0
    assert df["spans"].map(len).sum() == 0


@pytest.mark.usefixtures("ray_session")
def test_giveup_urls_drop_cleanly(small_docs):
    """retries=0 at a moderate rate: some urls give up; they must have
    no outgoing edges, keep their seen/seq slot, and never be
    refetched."""
    res = crawl(CrawlConfig(docs_path=small_docs, seeds=default_seeds(4),
                            fetch_fail_rate=0.35, fetch_fail_seed=7,
                            fetch_retries=0))
    df = res.fetched.to_pandas()
    gave_up = df[df["status"] == 598]
    assert len(gave_up) > 0, "rate 0.35 over hundreds of urls must hit"
    assert len(gave_up) < len(df), "some urls must survive"
    assert gave_up["spans"].map(len).sum() == 0
    edges = res.edges.to_pandas()
    srcs = set(edges["src"]) if len(edges) else set()
    assert srcs.isdisjoint(set(gave_up["url"]))
    # each url fetched exactly once (no re-enqueue of failures)
    assert df["url"].is_unique
    assert res.seen_count == len(df)
