"""Politeness in the full pipeline: budgets defer (never drop), robots
disallow permanently, seen-set equality is preserved under any budget
(north_rule: 'same seed list and politeness budget')."""

import os

import pyarrow.parquet as pq
import pytest

from rendler_ray.pipelines.crawl import CrawlConfig, crawl
from rendler_ray.refsim import simulate, simulate_polite
from rendler_ray.sources.synthweb import default_seeds, docs_parquet
from rendler_ray.util import table_from_ds


def _round_orders(out_dir: str) -> tuple[list[list[str]], dict[str, int]]:
    """Per-round fetch order (urls sorted by seq) + url->seq map, read
    back from the crawl's round checkpoints."""
    import glob as _glob

    rounds, seqs = [], {}
    r = 0
    while True:
        p = os.path.join(out_dir, f"round={r}", "fetch.parquet")
        if not os.path.exists(p):
            break
        if not _glob.glob(os.path.join(p, "*.parquet")):
            rounds.append([])  # all-blocked round: empty marker dir
            r += 1
            continue
        t = pq.read_table(p, columns=["url", "seq"])
        rows = sorted(zip(t["seq"].to_pylist(), t["url"].to_pylist()))
        rounds.append([u for _, u in rows])
        seqs.update({u: s for s, u in rows})
        r += 1
    return rounds, seqs


def _assert_conformance(res, out_dir, sim):
    got_rounds, got_seqs = _round_orders(out_dir)
    # a final all-deferred/all-blocked round can be empty on either side
    assert ([r for r in got_rounds if r]
            == [r for r in sim.round_order if r])
    assert got_seqs == {u: sim.seq[u] for u in got_seqs}
    assert res.seen_count == len(sim.seen)
    assert res.pages_fetched == len(sim.order)


@pytest.mark.usefixtures("ray_session")
def test_polite_conformance_budget(small_docs, tmp_path):
    """Exact per-round fetch order + seq assignment + seen set vs the
    independent politeness oracle (north_rule: 'same seed list and
    politeness budget')."""
    out = str(tmp_path / "polite_budget")
    res = crawl(CrawlConfig(docs_path=small_docs, seeds=default_seeds(1),
                            max_depth=2, host_budget_per_round=3,
                            max_rounds=500, num_seen_shards=2,
                            num_web_shards=2, out_dir=out))
    sim = simulate_polite(pq.read_table(small_docs), default_seeds(1),
                          max_depth=2, host_budget_per_round=3)
    _assert_conformance(res, out, sim)


@pytest.mark.usefixtures("ray_session")
def test_polite_conformance_robots_and_budget(small_docs, tmp_path):
    """Static robots (full-host disallow) + budget — the crawl_polite
    query shape — matches the oracle exactly."""
    robots = {"h001": "User-agent: *\nDisallow: /\n"}
    out = str(tmp_path / "polite_robots")
    res = crawl(CrawlConfig(docs_path=small_docs, seeds=default_seeds(1),
                            max_depth=3, host_budget_per_round=50,
                            robots=robots, num_seen_shards=2,
                            num_web_shards=2, out_dir=out))
    sim = simulate_polite(pq.read_table(small_docs), default_seeds(1),
                          max_depth=3, host_budget_per_round=50,
                          robots=robots)
    _assert_conformance(res, out, sim)


@pytest.mark.usefixtures("ray_session")
def test_auto_robots_conformance(tmp_path):
    """auto_robots end-to-end (robots fetched from the closed world, new
    hosts per round, crawl-delay budgets) matches the oracle exactly."""
    docs = docs_parquet(str(tmp_path / "docs_conf.parquet"), n_docs=300,
                        n_hosts=8, seed=42, p_host_robots=1.0)
    out = str(tmp_path / "auto_robots")
    res = crawl(CrawlConfig(docs_path=docs, seeds=default_seeds(1),
                            max_depth=3, auto_robots=True,
                            num_seen_shards=2, num_web_shards=2,
                            out_dir=out))
    sim = simulate_polite(pq.read_table(docs), default_seeds(1),
                          max_depth=3, auto_robots=True)
    _assert_conformance(res, out, sim)


def test_polite_sim_reduces_to_fifo(tmp_path):
    """Sanity: with politeness off, the round-structured oracle's order
    is exactly the plain FIFO oracle's order."""
    docs = docs_parquet(str(tmp_path / "docs_fifo.parquet"), n_docs=300,
                        n_hosts=8, seed=42)
    tbl = pq.read_table(docs)
    plain = simulate(tbl, default_seeds(1), max_depth=3)
    polite = simulate_polite(tbl, default_seeds(1), max_depth=3)
    assert polite.order == plain.order
    assert polite.seen == plain.seen
    assert polite.edges == plain.edges


@pytest.mark.usefixtures("ray_session")
def test_budget_defers_but_crawls_everything(small_docs):
    base = dict(docs_path=small_docs, seeds=default_seeds(1), max_depth=2,
                num_seen_shards=2, num_web_shards=2)
    free = crawl(CrawlConfig(**base))
    budgeted = crawl(CrawlConfig(**base, host_budget_per_round=3,
                                 max_rounds=500))
    assert budgeted.rounds > free.rounds
    assert budgeted.seen_count == free.seen_count
    assert budgeted.pages_fetched == free.pages_fetched
    # same fetched set; order differs only by deferral
    f1 = set(table_from_ds(free.fetched)["url"].to_pylist())
    f2 = set(table_from_ds(budgeted.fetched)["url"].to_pylist())
    assert f1 == f2

    # per-round per-host cap actually holds
    fetched = table_from_ds(budgeted.fetched).to_pylist()
    # rounds aren't recorded on fetch rows; check via renders round column
    renders = table_from_ds(budgeted.renders).to_pylist()
    per = {}
    for r in renders:
        host = r["doc_id"].split("/")[2]
        per[(r["rendered_round"], host)] = per.get(
            (r["rendered_round"], host), 0) + 1
    assert max(per.values()) <= 3


@pytest.mark.usefixtures("ray_session")
def test_robots_disallow_blocks_host(small_docs):
    robots = {"h001": "User-agent: *\nDisallow: /\n"}
    res = crawl(CrawlConfig(docs_path=small_docs, seeds=default_seeds(1),
                            max_depth=3, robots=robots,
                            num_seen_shards=2, num_web_shards=2))
    hosts = {u.split("/")[2] for u in
             table_from_ds(res.fetched)["url"].to_pylist()}
    assert "h001" not in hosts
    assert res.pages_fetched > 0


@pytest.mark.usefixtures("ray_session")
def test_path_scoped_disallow(small_docs):
    # block a page-prefix on the hub host (the seed p00000 stays allowed)
    robots = {"h000": "User-agent: *\nDisallow: /p0001\n"}
    res = crawl(CrawlConfig(docs_path=small_docs, seeds=default_seeds(1),
                            max_depth=2, robots=robots,
                            num_seen_shards=2, num_web_shards=2))
    fetched = table_from_ds(res.fetched)["url"].to_pylist()
    assert res.pages_fetched > 0
    assert any(u.startswith("s://h000/") for u in fetched)
    assert not any(u.startswith("s://h000/p0001") for u in fetched)


@pytest.mark.usefixtures("ray_session")
def test_budget_gate_join_path_identical(small_docs):
    """Forcing broadcast_max_hosts=0 routes every round through the hash-
    join gate (_budget_gate_join); the crawl must be identical to the
    broadcast-dict path — same fetch set, same seq order, same rounds."""
    base = dict(docs_path=small_docs, seeds=default_seeds(1), max_depth=2,
                num_seen_shards=2, num_web_shards=2,
                host_budget_per_round=3, max_rounds=500)
    bcast = crawl(CrawlConfig(**base))
    joined = crawl(CrawlConfig(**base, budget_broadcast_max_hosts=0))
    a = sorted(zip(table_from_ds(bcast.fetched)["seq"].to_pylist(),
                   table_from_ds(bcast.fetched)["url"].to_pylist()))
    b = sorted(zip(table_from_ds(joined.fetched)["seq"].to_pylist(),
                   table_from_ds(joined.fetched)["url"].to_pylist()))
    assert a == b
    assert bcast.rounds == joined.rounds
    assert bcast.seen_count == joined.seen_count


@pytest.mark.usefixtures("ray_session")
def test_polite_conformance_max_pages(small_docs, tmp_path):
    """max_pages truncation composed with per-host budgets matches the
    oracle exactly (truncation keeps the remaining smallest seqs BEFORE
    robots/budget gating, as the pipeline does)."""
    out = str(tmp_path / "polite_maxpages")
    res = crawl(CrawlConfig(docs_path=small_docs, seeds=default_seeds(1),
                            max_depth=3, host_budget_per_round=7,
                            max_pages=120, max_rounds=500,
                            num_seen_shards=2, num_web_shards=2,
                            out_dir=out))
    sim = simulate_polite(pq.read_table(small_docs), default_seeds(1),
                          max_depth=3, host_budget_per_round=7,
                          max_pages=120)
    _assert_conformance(res, out, sim)
    assert res.pages_fetched <= 120


@pytest.mark.usefixtures("ray_session")
def test_polite_resume_equivalence(small_docs, tmp_path):
    """Kill a budgeted+robots crawl after 3 rounds, resume: identical to
    the uninterrupted run AND to the politeness oracle (deferred rows
    and policies reconstruct across the checkpoint boundary)."""
    robots = {"h001": "User-agent: *\nDisallow: /\n"}
    base = dict(docs_path=small_docs, seeds=default_seeds(1), max_depth=2,
                host_budget_per_round=5, robots=robots, max_rounds=500,
                num_seen_shards=2, num_web_shards=2)
    full_dir = str(tmp_path / "pfull")
    part_dir = str(tmp_path / "ppart")
    full = crawl(CrawlConfig(**base, out_dir=full_dir))
    crawl(CrawlConfig(**{**base, "max_rounds": 3}, out_dir=part_dir))
    resumed = crawl(CrawlConfig(**base, out_dir=part_dir), resume=True)

    sim = simulate_polite(pq.read_table(small_docs), default_seeds(1),
                          max_depth=2, host_budget_per_round=5,
                          robots=robots)
    _assert_conformance(full, full_dir, sim)
    _assert_conformance(resumed, part_dir, sim)
    assert resumed.seen_count == full.seen_count


@pytest.mark.usefixtures("ray_session")
def test_auto_robots_resume_equivalence(tmp_path):
    """auto_robots resume: the known-host ledger restarts empty, so
    robots re-fetch for hosts still in the frontier — policies
    reconstruct deterministically and the crawl matches the oracle."""
    docs = docs_parquet(str(tmp_path / "docs_arr.parquet"), n_docs=300,
                        n_hosts=8, seed=42, p_host_robots=1.0)
    base = dict(docs_path=docs, seeds=default_seeds(1), max_depth=3,
                auto_robots=True, num_seen_shards=2, num_web_shards=2)
    part_dir = str(tmp_path / "arpart")
    crawl(CrawlConfig(**base, max_rounds=2, out_dir=part_dir))
    resumed = crawl(CrawlConfig(**base, max_rounds=1000, out_dir=part_dir),
                    resume=True)
    sim = simulate_polite(pq.read_table(docs), default_seeds(1),
                          max_depth=3, auto_robots=True)
    _assert_conformance(resumed, part_dir, sim)


@pytest.mark.usefixtures("ray_session")
def test_allow_carves_exception_and_matches_oracle(small_docs, tmp_path):
    """Allow: longest-match wins — /p0000x pages stay crawlable inside a
    broader Disallow; exact conformance vs the oracle."""
    from rendler_ray.state.politeness import parse_robots, path_allowed

    robots = {"h000": ("User-agent: *\n"
                       "Disallow: /p00\n"
                       "Allow: /p0000\n")}
    pol = parse_robots(robots["h000"])
    assert path_allowed("s://h000/p00003", pol)       # Allow (6) > Dis (4)
    assert not path_allowed("s://h000/p00103", pol)   # only Disallow hits
    assert path_allowed("s://h000/robots.txt", pol)   # neither matches

    out = str(tmp_path / "allow_conf")
    res = crawl(CrawlConfig(docs_path=small_docs, seeds=default_seeds(1),
                            max_depth=3, robots=robots, num_seen_shards=2,
                            num_web_shards=2, out_dir=out))
    sim = simulate_polite(pq.read_table(small_docs), default_seeds(1),
                          max_depth=3, robots=robots)
    _assert_conformance(res, out, sim)
    urls = [u for r in sim.round_order for u in r]
    assert any(u.startswith("s://h000/p0000") for u in urls)
    assert not any(u.startswith("s://h000/p001") for u in urls)


@pytest.mark.usefixtures("ray_session")
def test_polite_conformance_with_redirects(tmp_path):
    """Politeness budgets interacting with HTTP-301 redirects AND
    rel=canonical edges: exact per-round fetch order + seq + seen set
    vs the oracle on a corpus exercising all three features at once."""
    from rendler_ray.sources.synthweb import docs_parquet

    docs = docs_parquet(str(tmp_path / "docs.parquet"), n_docs=300,
                        n_hosts=8, seed=42, p_redirect=0.15,
                        p_canonical=0.2)
    out = str(tmp_path / "polite_redir")
    res = crawl(CrawlConfig(docs_path=docs, seeds=default_seeds(1),
                            max_depth=3, host_budget_per_round=4,
                            max_rounds=500, num_seen_shards=2,
                            num_web_shards=2, out_dir=out))
    sim = simulate_polite(pq.read_table(docs), default_seeds(1),
                          max_depth=3, host_budget_per_round=4)
    _assert_conformance(res, out, sim)
    # the corpus really exercised both features
    src = pq.read_table(docs)["spans"].to_pylist()
    assert any(sp["kind"] == "redirect" for row in src for sp in row)
    assert any(sp["kind"] == "canonical" for row in src for sp in row)


@pytest.mark.usefixtures("ray_session")
def test_auto_robots_sharded_policy_store_conformance(tmp_path):
    """host_ledger_shards>0 keeps BOTH the known-host ledger AND the
    parsed policy store in sharded actors (the driver only ever puts one
    round's gathered policies) — the crawl must still match the
    politeness oracle exactly, per-round order and seqs included."""
    docs = docs_parquet(str(tmp_path / "docs_conf_sh.parquet"), n_docs=300,
                        n_hosts=8, seed=42, p_host_robots=1.0)
    out = str(tmp_path / "auto_robots_sh")
    res = crawl(CrawlConfig(docs_path=docs, seeds=default_seeds(1),
                            max_depth=3, auto_robots=True,
                            host_ledger_shards=2,
                            num_seen_shards=2, num_web_shards=2,
                            out_dir=out))
    sim = simulate_polite(pq.read_table(docs), default_seeds(1),
                          max_depth=3, auto_robots=True)
    _assert_conformance(res, out, sim)
