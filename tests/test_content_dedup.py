"""Crawl-time exact content dedup (training-data crawls): pages whose
text fingerprint was already crawled are dropped before render/extract,
first discoverer (min seq) wins, cross-round and within-round."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rendler_ray.pipelines.crawl import CrawlConfig, crawl
from rendler_ray.schema import DOCS_SCHEMA
from rendler_ray.util import table_from_ds

DUP_TEXT = "dup content A s://h000/p00003"


def _span(text):
    return [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]


def _corpus(tmp_path):
    docs = pa.Table.from_pydict({
        "doc_id": ["s://h000/p00000", "s://h000/p00001", "s://h000/p00002",
                   "s://h000/p00003", "s://h000/p00004", "s://h000/p00005"],
        "spans": [
            _span("x /p00001 /p00002 /p00003 /p00004 y"),
            _span(DUP_TEXT),              # first discoverer of the dup text
            _span(DUP_TEXT),              # same-round duplicate
            _span("u /p00005 v"),
            _span(DUP_TEXT),              # same-round duplicate
            _span(DUP_TEXT),              # round-2 duplicate (cross-round)
        ],
    }, schema=DOCS_SCHEMA)
    p = str(tmp_path / "dup_docs.parquet")
    pq.write_table(docs, p)
    return p


@pytest.mark.usefixtures("ray_session")
def test_content_dedup_drops_duplicate_pages(tmp_path):
    docs = _corpus(tmp_path)
    base = dict(docs_path=docs, seeds=["s://h000/p00000"],
                num_seen_shards=2, num_web_shards=2)

    plain = crawl(CrawlConfig(**base))
    assert plain.pages_fetched == 6
    assert plain.stats["pages_rendered"] == 6
    assert plain.stats["content_dups"] == 0

    dd = crawl(CrawlConfig(**base, content_dedup=True,
                           content_dedup_shards=2))
    kept = sorted(table_from_ds(dd.fetched)["url"].to_pylist())
    # p00001 wins its dup group (lowest seq); p00002/p00004 (same round)
    # and p00005 (later round) are dropped
    assert kept == ["s://h000/p00000", "s://h000/p00001", "s://h000/p00003"]
    assert dd.pages_fetched == 6            # fetch work still happened
    assert dd.stats["content_dups"] == 3
    assert dd.stats["pages_rendered"] == 3  # dups never rendered
    # dup pages contribute no edges
    srcs = set(table_from_ds(dd.edges)["src"].to_pylist())
    assert "s://h000/p00002" not in srcs and "s://h000/p00004" not in srcs
    # URL-seen set is unaffected by content dedup (all 6 discovered)
    assert dd.seen_count == plain.seen_count

    # deterministic
    dd2 = crawl(CrawlConfig(**base, content_dedup=True,
                            content_dedup_shards=2))
    assert sorted(table_from_ds(dd2.fetched)["url"].to_pylist()) == kept


@pytest.mark.usefixtures("ray_session")
def test_content_dedup_resume_equivalence(tmp_path):
    """Resume rebuilds the fingerprint seen-set from the checkpointed
    (already-deduped) fetch tables: kill after round 1, resume — same
    kept set as the uninterrupted dedup crawl."""
    docs = _corpus(tmp_path)
    base = dict(docs_path=docs, seeds=["s://h000/p00000"],
                num_seen_shards=2, num_web_shards=2, content_dedup=True,
                content_dedup_shards=2)
    full = crawl(CrawlConfig(**base))

    part = str(tmp_path / "part")
    crawl(CrawlConfig(**base, out_dir=part, max_rounds=2))
    resumed = crawl(CrawlConfig(**base, out_dir=part), resume=True)
    assert (sorted(table_from_ds(resumed.fetched)["url"].to_pylist())
            == sorted(table_from_ds(full.fetched)["url"].to_pylist()))
    assert resumed.seen_count == full.seen_count
