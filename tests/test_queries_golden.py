"""Golden value-hash checks for deterministic queries() entries that
have no SQL oracle (the driver records them rows-only; these pin the
VALUES). Hashes were captured from the round-1 implementations — any
rework must stay value-identical."""

import hashlib

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _value_hash(res):
    if not isinstance(res, pd.DataFrame):
        try:
            res = res.to_pandas()
        except AttributeError:
            res = pd.DataFrame(res.take_all())
    df = res.sort_values(list(res.columns)).reset_index(drop=True)
    return len(df), hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


GOLDEN = {
    # captured from the round-1 broadcast/materialize implementations,
    # before the distributed hot-bucket/join rework
    "minhash_dup_groups": (45, "2f92a5df49dea93fd9051390ffe53030"),
    "ngram_jaccard_pairs": (28, "41c52de67b532184751b357cec44d10b"),
}


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_query_matches_golden(name):
    from rendler_ray.pipelines.queries import QUERIES

    got = _value_hash(QUERIES[name](SF))
    assert got == GOLDEN[name], f"{name}: {got} != {GOLDEN[name]}"


@pytest.mark.usefixtures("ray_session")
def test_hot_bucket_join_fallback_identical(monkeypatch):
    """Forcing _HOT_BCAST_MAX=0 routes the hot-bucket filter through the
    hash semi-join (the past-the-broadcast-cap path); output must be
    value-identical to the broadcast is_in path."""
    import rendler_ray.pipelines.queries as Q

    base = _value_hash(Q.QUERIES["minhash_dup_groups"](SF))
    monkeypatch.setattr(Q, "_HOT_BCAST_MAX", 0)
    joined = _value_hash(Q.QUERIES["minhash_dup_groups"](SF))
    assert joined == base == GOLDEN["minhash_dup_groups"]
