"""Incremental re-crawl: unchanged pages skip the render stage and
reuse the prior run's artifacts; changed/new pages render fresh. The
combined renders must equal a from-scratch crawl of the new web."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rendler_ray.pipelines.crawl import CrawlConfig, crawl
from rendler_ray.schema import DOCS_SCHEMA
from rendler_ray.util import table_from_ds


def _span(text):
    return [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]


def _write(tmp_path, name, rows):
    docs = pa.Table.from_pydict(
        {"doc_id": [r[0] for r in rows],
         "spans": [_span(r[1]) for r in rows]}, schema=DOCS_SCHEMA)
    p = str(tmp_path / name)
    pq.write_table(docs, p)
    return p


@pytest.mark.usefixtures("ray_session")
def test_recrawl_reuses_unchanged_renders(tmp_path):
    v1 = _write(tmp_path, "v1.parquet", [
        ("s://h000/p00000", "x /p00001 /p00002 /p00003 y"),
        ("s://h000/p00001", "alpha"),
        ("s://h000/p00002", "beta"),
        ("s://h000/p00003", "gamma"),
    ])
    v2 = _write(tmp_path, "v2.parquet", [
        ("s://h000/p00000", "x /p00001 /p00002 /p00003 y"),  # unchanged
        ("s://h000/p00001", "alpha"),                        # unchanged
        ("s://h000/p00002", "beta CHANGED"),                 # changed
        ("s://h000/p00003", "gamma /p00004"),                # changed + link
        ("s://h000/p00004", "delta"),                        # new page
    ])
    seeds = ["s://h000/p00000"]
    prior_dir = str(tmp_path / "prior")
    crawl(CrawlConfig(docs_path=v1, seeds=seeds, num_seen_shards=2,
                      num_web_shards=2, out_dir=prior_dir))

    rec = crawl(CrawlConfig(docs_path=v2, seeds=seeds, num_seen_shards=2,
                            num_web_shards=2, recrawl_prior_dir=prior_dir,
                            recrawl_fp_shards=2))
    # only p00002 (changed), p00003 (changed), p00004 (new) render fresh
    assert rec.stats["pages_rendered"] == 3
    assert rec.stats["renders_reused"] == 2  # p00000, p00001
    assert rec.pages_fetched == 5            # everything still fetched

    fresh = crawl(CrawlConfig(docs_path=v2, seeds=seeds, num_seen_shards=2,
                              num_web_shards=2))

    def content(res):
        t = table_from_ds(res.renders)
        return sorted(zip(t["doc_id"].to_pylist(),
                          t["media_ref"].to_pylist(),
                          t["image"].to_pylist()))

    assert content(rec) == content(fresh)
    # link extraction still ran on unchanged pages (frontier intact)
    assert rec.seen_count == fresh.seen_count
