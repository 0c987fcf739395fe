import numpy as np
import pytest

from rendler_ray.state.cuckoo import CuckooFilter


def test_cuckoo_basic():
    f = CuckooFilter(capacity=10_000, seed=1)
    keys = [f"s://h{i:03d}/p{i:05d}" for i in range(5000)]
    new = f.check_and_add_many(keys)
    assert new.all()
    again = f.check_and_add_many(keys)
    assert not again.any()
    assert f.contains_many(keys).all()
    assert f.count == 5000


def test_cuckoo_false_positive_rate():
    f = CuckooFilter(capacity=100_000, seed=2)
    keys = [f"u{i}" for i in range(50_000)]
    f.check_and_add_many(keys)
    probe = [f"x{i}" for i in range(20_000)]
    fp = f.contains_many(probe).sum()
    assert fp / len(probe) < 1e-3, f"FPR too high: {fp / len(probe)}"
    assert f.kicked_out == 0


def test_cuckoo_snapshot_roundtrip():
    f = CuckooFilter(capacity=1000, seed=3)
    f.check_and_add_many([f"k{i}" for i in range(400)])
    snap = f.snapshot()
    g = CuckooFilter(capacity=1000, seed=3)
    g.restore(snap)
    assert g.contains_many([f"k{i}" for i in range(400)]).all()
    assert g.count == f.count


@pytest.mark.usefixtures("ray_session")
def test_seen_shards_route_and_dedup():
    from rendler_ray.state.seen import make_seen_shards, seen_check_and_add

    shards = make_seen_shards(3, "exact")
    urls = [f"s://h{i % 7:03d}/p{i:05d}" for i in range(200)]
    m1 = seen_check_and_add(shards, urls)
    assert m1.all()
    m2 = seen_check_and_add(shards, urls + ["s://h999/p00001"])
    assert m2.sum() == 1 and m2[-1]
    import ray

    assert sum(ray.get([s.count.remote() for s in shards])) == 201


@pytest.mark.usefixtures("ray_session")
def test_seen_shards_cuckoo_mode_and_snapshot():
    import ray

    from rendler_ray.state.seen import make_seen_shards, seen_check_and_add

    shards = make_seen_shards(2, "cuckoo", capacity_per_shard=10_000)
    urls = [f"s://h000/p{i:05d}" for i in range(500)]
    assert seen_check_and_add(shards, urls).all()
    assert not seen_check_and_add(shards, urls).any()
    snaps = ray.get([s.snapshot.remote() for s in shards])
    fresh = make_seen_shards(2, "cuckoo", capacity_per_shard=10_000)
    ray.get([s.restore.remote(sn) for s, sn in zip(fresh, snaps)])
    assert not seen_check_and_add(fresh, urls).any()


def test_politeness_parse_robots():
    from rendler_ray.state.politeness import parse_robots, path_allowed

    pol = parse_robots(
        "User-agent: *\nDisallow: /private\nCrawl-delay: 2\n",
        window_ms=10_000,
    )
    assert pol.budget_per_round == 5
    assert pol.allow_all
    assert not path_allowed("s://h001/private/x", pol)
    assert path_allowed("s://h001/public", pol)

    deny = parse_robots("User-agent: *\nDisallow: /\n")
    assert not deny.allow_all
    other_agent = parse_robots("User-agent: bot\nDisallow: /\n")
    assert other_agent.allow_all and not other_agent.disallow
