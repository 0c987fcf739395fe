"""Round-4i op families: snapshot table diff (CDC classify) and
referential-integrity audit."""

import os

import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_table_diff_brute(ray_session):
    """Status counts + key checksums match a pure-pandas diff of the
    same derived snapshot."""
    from rendler_ray.pipelines.queries import table_diff_docs

    out = table_diff_docs(SF).to_pandas() \
        .sort_values("status").reset_index(drop=True)

    a = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "lang", "n_chars"]).to_pandas()
    b = a.copy()
    b.loc[b.doc_id % 13 == 0, "n_chars"] += 7
    b = b[b.doc_id % 17 != 0]
    app = a[a.doc_id % 19 == 0].copy()
    app["doc_id"] += 1_000_000_000
    b = pd.concat([b, app])
    j = a.merge(b, on="doc_id", how="outer", suffixes=("_a", "_b"),
                indicator=True)
    status = pd.Series("changed", index=j.index)
    status[j._merge == "right_only"] = "added"
    status[j._merge == "left_only"] = "removed"
    same = (j.lang_a == j.lang_b) & (j.n_chars_a == j.n_chars_b)
    status[(j._merge == "both") & same] = "unchanged"
    want = pd.DataFrame({"status": status, "k": j.doc_id}) \
        .groupby("status", as_index=False) \
        .agg(n=("k", "size"), key_sum=("k", "sum")) \
        .sort_values("status").reset_index(drop=True)
    want["key_sum"] = want["key_sum"].astype("int64")
    # every class must actually occur, else the test proves nothing
    assert set(want.status) == {"added", "removed", "changed", "unchanged"}
    pd.testing.assert_frame_equal(out[["status", "n", "key_sum"]],
                                  want[["status", "n", "key_sum"]])


def test_fk_audit_brute(ray_session):
    """Orphan counts match a pandas anti-join on the corrupted
    parent snapshots, and orphans actually exist."""
    from rendler_ray.pipelines.queries import fk_integrity_audit

    out = fk_integrity_audit(SF).to_pandas() \
        .set_index("relation").sort_index()

    li = pq.read_table(os.path.join(SF, "lineitem.parquet"),
                       columns=["l_orderkey"]).to_pandas()
    od = pq.read_table(os.path.join(SF, "orders.parquet"),
                       columns=["o_orderkey", "o_custkey"]).to_pandas()
    cu = pq.read_table(os.path.join(SF, "customer.parquet"),
                       columns=["c_custkey"]).to_pandas()
    ok = set(od.o_orderkey[od.o_orderkey % 1000 >= 5])
    ck = set(cu.c_custkey[cu.c_custkey % 100 >= 3])
    lo = int((~li.l_orderkey.isin(ok)).sum())
    co = int((~od.o_custkey.isin(ck)).sum())
    assert out.loc["lineitem->orders", "n_child"] == len(li)
    assert out.loc["lineitem->orders", "n_orphan"] == lo
    assert out.loc["orders->customer", "n_child"] == len(od)
    assert out.loc["orders->customer", "n_orphan"] == co
    assert lo > 0 and co > 0
