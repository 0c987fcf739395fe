"""Dot-export golden stability + checkpoint/resume equivalence
(SURVEY.md §5.2 items 4 and 5)."""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from rendler_ray.pipelines.crawl import CrawlConfig, crawl
from rendler_ray.pipelines.export import dot_from_tables, export_dot
from rendler_ray.refsim import simulate
from rendler_ray.sources.synthweb import default_seeds
from rendler_ray.util import table_from_ds


@pytest.mark.usefixtures("ray_session")
def test_dot_export_byte_stable_and_filtered(small_docs, tmp_path):
    cfg = CrawlConfig(docs_path=small_docs, seeds=default_seeds(1),
                      max_depth=2, num_seen_shards=2, num_web_shards=2)
    res = crawl(cfg)
    out1 = export_dot(res.edges, res.renders, str(tmp_path / "r.dot"))
    out2 = export_dot(res.edges, res.renders)
    assert out1 == out2, "dot output must be byte-stable"
    assert out1.startswith("digraph G {")
    assert (tmp_path / "r.dot").read_text() == out1

    # J1 semantics: every edge endpoint is a rendered node
    rendered = {r["doc_id"] for r in table_from_ds(res.renders).to_pylist()}
    for line in out1.splitlines():
        if "->" in line:
            src, dst = line.strip().rstrip(";").split(" -> ")
            assert src.strip('"') in rendered and dst.strip('"') in rendered

    # matches refsim edge/render sets
    sim = simulate(pq.read_table(small_docs), default_seeds(1), max_depth=2)
    sim_pairs = {(s, d) for s, d, _ in sim.edges
                 if s in set(sim.rendered) and d in set(sim.rendered)}
    got_pairs = {
        tuple(x.strip('"') for x in ln.strip().rstrip(";").split(" -> "))
        for ln in out1.splitlines() if "->" in ln
    }
    assert got_pairs == sim_pairs


@pytest.mark.usefixtures("ray_session")
def test_resume_equivalence(small_docs, tmp_path):
    """Kill after round 1, resume, final outputs identical to an
    uninterrupted run."""
    full_dir = str(tmp_path / "full")
    part_dir = str(tmp_path / "part")

    base = dict(docs_path=small_docs, seeds=default_seeds(1), max_depth=3,
                num_seen_shards=2, num_web_shards=2)
    full = crawl(CrawlConfig(**base, out_dir=full_dir))

    # simulate a crash: run only 2 rounds, then resume
    crawl(CrawlConfig(**base, out_dir=part_dir, max_rounds=2))
    resumed = crawl(CrawlConfig(**base, out_dir=part_dir), resume=True)

    def key(res):
        f = table_from_ds(res.fetched)
        return sorted(zip(f["seq"].to_pylist(), f["url"].to_pylist(),
                          f["status"].to_pylist()))

    assert key(resumed) == key(full)
    assert resumed.seen_count == full.seen_count

    e_full = sorted(map(tuple, table_from_ds(full.edges).to_pylist()))
    e_res = sorted(map(tuple, table_from_ds(resumed.edges).to_pylist()))
    assert e_res == e_full

    # dot artifacts byte-identical
    assert export_dot(resumed.edges, resumed.renders) == export_dot(
        full.edges, full.renders)


@pytest.mark.usefixtures("ray_session")
def test_manifest_written_atomically(small_docs, tmp_path):
    out = str(tmp_path / "ck")
    crawl(CrawlConfig(docs_path=small_docs, seeds=default_seeds(1),
                      max_depth=1, num_seen_shards=2, num_web_shards=2,
                      out_dir=out))
    assert os.path.exists(os.path.join(out, "manifest.json"))
    assert os.path.exists(os.path.join(out, "round=0", "frontier.parquet"))
    assert not any(p.endswith(".tmp") for p in os.listdir(out))


def test_dot_from_tables_escaping():
    import pyarrow as pa

    edges = pa.table({"src": ['u"1'], "dst": ["u2"]})
    renders = pa.table({"doc_id": ['u"1', "u2"], "media_ref": ["m1", "m2"]})
    out = dot_from_tables(edges, renders)
    assert '"u\\"1"' in out


@pytest.mark.usefixtures("ray_session")
def test_resume_fallback_without_seen_snapshots(small_docs, tmp_path):
    """Deleting the seen/ snapshots forces the frontier-replay rebuild —
    results must be identical either way."""
    part_dir = str(tmp_path / "part2")
    base = dict(docs_path=small_docs, seeds=default_seeds(1), max_depth=3,
                num_seen_shards=2, num_web_shards=2)
    crawl(CrawlConfig(**base, out_dir=part_dir, max_rounds=2))
    shutil.rmtree(os.path.join(part_dir, "seen"))
    resumed = crawl(CrawlConfig(**base, out_dir=part_dir), resume=True)

    full = crawl(CrawlConfig(**base))
    f1 = table_from_ds(resumed.fetched)
    f2 = table_from_ds(full.fetched)
    key = lambda t: sorted(zip(t["seq"].to_pylist(), t["url"].to_pylist()))
    assert key(f1) == key(f2)
    assert resumed.seen_count == full.seen_count


@pytest.mark.usefixtures("ray_session")
def test_resume_rejects_ahead_seen_snapshots(small_docs, tmp_path):
    """Crash window: seen snapshots written for round r+1 but manifest
    committed at round r — resume must reject the ahead-stamped
    snapshots (round stamp mismatch) and fall back to frontier replay,
    yielding the same result as the uninterrupted run."""
    import pickle

    part_dir = str(tmp_path / "ahead")
    base = dict(docs_path=small_docs, seeds=default_seeds(1), max_depth=3,
                num_seen_shards=2, num_web_shards=2)
    crawl(CrawlConfig(**base, out_dir=part_dir, max_rounds=2))
    # simulate the crash: re-stamp the snapshots one round ahead
    for i in range(2):
        p = os.path.join(part_dir, "seen", f"shard={i}.pkl")
        with open(p, "rb") as f:
            payload = pickle.load(f)
        payload["round"] += 1
        with open(p, "wb") as f:
            pickle.dump(payload, f)

    resumed = crawl(CrawlConfig(**base, out_dir=part_dir), resume=True)
    full = crawl(CrawlConfig(**base))

    def key(res):
        t = table_from_ds(res.fetched)  # materialize ONCE: zip must pair
        return sorted(zip(t["seq"].to_pylist(), t["url"].to_pylist()))

    assert key(resumed) == key(full)
    assert resumed.seen_count == full.seen_count


@pytest.mark.usefixtures("ray_session")
def test_stale_orphan_frontier_is_overwritten(small_docs, tmp_path):
    """Crash window: round r+1 frontier written but manifest still at
    round r-1 — the orphan file must be ignored/overwritten on redo, not
    resumed into."""
    import pyarrow as pa
    import pyarrow.parquet as pqt

    part_dir = str(tmp_path / "orphan")
    base = dict(docs_path=small_docs, seeds=default_seeds(1), max_depth=3,
                num_seen_shards=2, num_web_shards=2)
    crawl(CrawlConfig(**base, out_dir=part_dir, max_rounds=2))
    # fabricate a bogus orphan frontier two rounds ahead
    bogus_dir = os.path.join(part_dir, "round=3", "frontier.parquet")
    os.makedirs(bogus_dir, exist_ok=True)
    pqt.write_table(
        pa.table({"url": ["s://h000/p00001"],
                  "canon_url": ["s://h000/p00001"], "host": ["h000"],
                  "depth": pa.array([9], pa.int32()),
                  "seq": pa.array([999], pa.int64())}),
        os.path.join(bogus_dir, "bogus.parquet"))

    resumed = crawl(CrawlConfig(**base, out_dir=part_dir), resume=True)
    full = crawl(CrawlConfig(**base))

    def key(res):
        t = table_from_ds(res.fetched)
        return sorted(zip(t["seq"].to_pylist(), t["url"].to_pylist()))

    assert key(resumed) == key(full)
