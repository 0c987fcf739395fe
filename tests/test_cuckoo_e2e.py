"""Cuckoo-mode seen set end-to-end at scale (SURVEY.md §2.3 T1 scale
path): a ≥10^5-URL crawl with the 16-bit-fingerprint filter must match
the exact-set crawl within the filter's false-positive bound, and the
manifest must record per-shard occupancy/FPR telemetry."""

import json
import os

import pytest

from rendler_ray.pipelines.crawl import CrawlConfig, crawl
from rendler_ray.sources.synthweb import default_seeds, docs_parquet


@pytest.mark.usefixtures("ray_session")
def test_cuckoo_crawl_matches_exact_within_fpr(tmp_path):
    docs = docs_parquet("/tmp/rendler_ray_web/docs_cuckoo_150k.parquet",
                        n_docs=150_000, n_hosts=200, seed=42)
    base = dict(docs_path=docs, seeds=default_seeds(1),
                num_seen_shards=4, num_web_shards=4)

    exact = crawl(CrawlConfig(**base))
    assert exact.seen_count >= 100_000  # the >=1e5-URL premise

    out = str(tmp_path / "cuckoo")
    cuckoo = crawl(CrawlConfig(**base, seen_mode="cuckoo", out_dir=out))

    # a false positive = URL wrongly "seen" => never crawled, so cuckoo
    # can only undercount; bound misses by the reported FPR estimate
    # (expected misses ~= distinct URLs x fpr), with slack for the
    # blocked-subtree amplification of a single miss.
    stats = cuckoo.stats["seen_shards"]
    assert all(s["mode"] == "cuckoo" for s in stats)
    assert all(s["kicked_out"] == 0 for s in stats)
    fpr = max(s["fpr_estimate"] for s in stats)
    allowed = max(20, int(10 * fpr * exact.seen_count))
    assert cuckoo.seen_count <= exact.seen_count
    assert exact.seen_count - cuckoo.seen_count <= allowed
    assert exact.pages_fetched - cuckoo.pages_fetched <= allowed

    # FPR telemetry lands in the checkpoint manifest every round
    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    mstats = manifest["seen_stats"]
    assert len(mstats) == 4
    for s in mstats:
        assert s["mode"] == "cuckoo"
        assert 0 <= s["load"] < 0.95
        assert s["fpr_estimate"] < 1e-3
        assert s["count"] > 0
