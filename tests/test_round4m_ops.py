"""Round-4m op families: KMV distinct sketch, point-in-time (SCD2
feature-store) join, permuterm wildcard search."""

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    return pq.read_table(os.path.join(SF, "events.parquet")).to_pandas()


def test_kmv_brute(ray_session):
    """Per-type (n_kept, kth_hash, est_distinct) matches a pandas brute
    force of the identical md5 order statistic at BOTH sf0.001 (15
    users → exact small-set branch) and sf0.01 (150 users → estimator
    branch), and the estimate lands within the k=64 KMV error envelope
    of the true distinct count."""
    from rendler_ray.pipelines.queries import kmv_distinct_users

    branches = set()
    for sf in (SF, "/root/testdata/sf0.01"):
        out = kmv_distinct_users(sf).to_pandas() \
            .sort_values("event_type").reset_index(drop=True)
        ev = pq.read_table(os.path.join(sf, "events.parquet"),
                           columns=["event_type", "user_id"]).to_pandas()
        for _, row in out.iterrows():
            users = ev[ev.event_type == row.event_type].user_id.unique()
            hs = np.sort(np.array(
                [int(hashlib.md5(str(int(u)).encode())
                     .hexdigest()[:15], 16) for u in users], np.int64))
            true_d = len(hs)
            kept = hs[:64]
            assert row.n_kept == len(kept)
            assert row.kth_hash == kept[-1]
            exp = (len(kept) if len(kept) < 64
                   else 63 * 16 ** 15 // int(kept[-1]))
            assert row.est_distinct == exp
            # k=64 KMV: relative error ~1/sqrt(k) = 12.5%; allow 4 sigma
            assert abs(int(row.est_distinct) - true_d) \
                <= max(2, true_d // 2)
            branches.add("est" if len(kept) == 64 else "exact")
        assert len(out) == ev.event_type.nunique()
    assert branches == {"exact", "est"}  # both code paths exercised


def test_pit_join_brute(ray_session):
    """Every odd event resolves to the even-stream SCD2 interval
    covering its timestamp (pandas interval brute force), with real
    variety: some 'none' probes, several types, versions beyond 1."""
    from rendler_ray.pipelines.queries import pit_join_events

    out = pit_join_events(SF).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)

    ev = _events()
    ev["t"] = ev.ts.to_numpy("datetime64[us]").astype(np.int64)
    even = ev[ev.event_id % 2 == 0]
    odd = ev[ev.event_id % 2 == 1]
    assert len(out) == len(odd)

    # brute: per-user run-collapse of the even stream
    dim: dict[int, list[tuple[int, int, str, int]]] = {}
    for uid, g in even.groupby("user_id"):
        g = g.sort_values(["t", "event_id"], kind="stable")
        runs = []
        for et, tus in zip(g.event_type, g.t):
            sec = int(tus) // 1_000_000
            if not runs or runs[-1][2] != et:
                runs.append([sec, 4102444800, et, len(runs) + 1])
            if len(runs) > 1:
                runs[-2][1] = runs[-1][0]
        dim[int(uid)] = [tuple(r) for r in runs]

    got = {int(r.event_id): (r.event_type, int(r.version))
           for r in out.itertuples()}
    n_none = 0
    for r in odd.itertuples():
        sec = int(r.t) // 1_000_000
        exp = ("none", 0)
        for vf, vt, et, ver in dim.get(int(r.user_id), []):
            if vf <= sec < vt:
                exp = (et, ver)
                break
        if exp[0] == "none":
            n_none += 1
        assert got[int(r.event_id)] == exp, r.event_id

    assert n_none > 0                       # before-first probes exist
    resolved = out[out.event_type != "none"]
    assert resolved.event_type.nunique() > 1
    assert (resolved.version > 1).any()     # mid-history versions hit


def test_permuterm_equals_direct_predicate():
    """The rotation-index probe equals the direct
    startswith/endswith/non-overlap predicate on adversarial tokens —
    including the overlap case LIKE alone would get wrong."""
    from rendler_ray.pipelines.queries import _permuterm_match

    vocab = np.array(["", "s", "er", "reon", "ron", "sorter", "scan",
                      "query", "qry", "cn", "c", "n", "ss"], object)
    cases = [("s", ""), ("", "er"), ("re", "on"), ("re", "eon"),
             ("qu", "ry"), ("c", "n"), ("s", "s"), ("", "")]
    for pre, suf in cases:
        mask = _permuterm_match(vocab, pre, suf)
        exp = np.array([t.startswith(pre) and t.endswith(suf)
                        and len(t) >= len(pre) + len(suf)
                        for t in vocab])
        assert (mask == exp).all(), (pre, suf, vocab[mask ^ exp])
    # the overlap case concretely: re*eon must NOT match 'reon'
    assert not _permuterm_match(np.array(["reon"], object),
                                "re", "eon")[0]


def test_wildcard_brute(ray_session):
    """Per-query (n_tokens, n_docs, n_postings) matches a pandas brute
    force over the exploded distinct postings, and every query in the
    fixed set matches something at sf0.001."""
    from rendler_ray.pipelines.queries import (_WILDCARD_QUERIES,
                                               wildcard_search_docs)

    out = wildcard_search_docs(SF).to_pandas() \
        .sort_values("qid").reset_index(drop=True)
    assert sorted(out.qid) == sorted(_WILDCARD_QUERIES)

    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    posts = docs.assign(token=docs.text.str.split(" ")) \
        .explode("token")[["doc_id", "token"]].drop_duplicates()
    for qid, (pre, suf) in _WILDCARD_QUERIES.items():
        hit = posts[posts.token.map(
            lambda t: t.startswith(pre) and t.endswith(suf)
            and len(t) >= len(pre) + len(suf))]
        row = out[out.qid == qid].iloc[0]
        assert row.n_tokens == hit.token.nunique()
        assert row.n_docs == hit.doc_id.nunique()
        assert row.n_postings == len(hit)
        assert row.n_postings > 0
