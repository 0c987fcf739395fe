"""The ``queries()`` / ``oracle_sql()`` registry: every operator shape
from SURVEY.md §2 exercised over the driver testdata tables, plus the
training-data ops (dedup / similarity / text analysis / multimodal) and
the crawl pipelines themselves.

Each entry is a callable ``fn(sf_dir) -> Dataset | pyarrow.Table``;
ORACLES holds the DuckDB-equivalent SQL where the op is SQL-expressible
(same column NAMES and, for floats, the same explicit rounding — sums of
doubles are order-dependent in the last ulps, so both sides round).

Never calls ray.init/shutdown (driver contract).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from rendler_ray.functions import ann as F_ann
from rendler_ray.functions import media as F_media
from rendler_ray.functions import text as F_text

# --------------------------------------------------------------- helpers


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    """Pruned parquet read with SIZE-AWARE block count (r4): Ray's
    default parallelism (~200) oversplits small files into tiny blocks,
    and every downstream sort/aggregate all-to-all pays per-block fixed
    costs — measured at sf0.1/32cpus, 16 blocks vs default was q1 3.4s
    → 0.7s, tfidf 12.7s → 6.8s, with even CPU-heavy text ops faster
    (map parallelism was never the bottleneck; exchange overhead was).
    Files ≥ 256 MB keep Ray's native splitting (row-group granularity
    is the right unit at real scale — the override is a SMALL-file
    guard, ~1 block/MB, not a cap on big data)."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        sz = os.path.getsize(path)
    except OSError:
        sz = 1 << 30
    if (1 << 20) <= sz < (1 << 28):
        # sub-1MB files keep Ray's single block: forcing 16 blocks on a
        # tiny table yields EMPTY blocks whose schema-less RefBundles
        # crash the hash-join aggregator on sparse keys
        nb = int(min(256, max(16, sz >> 20)))
        return rd.read_parquet(path, columns=columns,
                               override_num_blocks=nb)
    return rd.read_parquet(path, columns=columns)


def _query_vecs(sf_dir: str, n: int) -> dict[int, "np.ndarray"]:
    """The fixed query/benchmark vectors (vec_id < n) via a PUSHED-DOWN
    filtered read: row groups whose vec_id statistics exclude the first
    n ids are never read. At 100 TB the alternative — streaming the
    whole embedding table through a ``Dataset.filter`` to fetch a
    handful of rows — scans the corpus to build a constant."""
    import pyarrow.dataset as pds

    t = pa.concat_tables(
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"],
                        filter=pds.field("vec_id") < n)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    return {int(i): np.asarray(v, dtype=np.float64)
            for i, v in zip(t["vec_id"].to_pylist(),
                            t["embedding"].to_pylist())}


def _fixed_point(ds, cols: dict[str, int]):
    """Convert float columns to fixed-point int64 (value * 10^scale,
    rounded). Float sums are order-dependent in the last ulps AND
    Arrow/DuckDB round() can land on 1-ulp-different doubles, so float
    outputs can never be hash-compared — integers can. Oracle SQL uses
    CAST(round(x * 10^scale) AS BIGINT) to match."""
    def fn(t: pa.Table) -> pa.Table:
        for c, scale in cols.items():
            v = pc.round(pc.multiply(t[c], float(10 ** scale)),
                         options=pc.RoundOptions(
                             ndigits=0, round_mode="half_towards_infinity"))
            t = t.set_column(t.schema.get_field_index(c), c,
                             pc.cast(v, pa.int64()))
        return t
    return ds.map_batches(fn, batch_format="pyarrow")


def _cents(col) -> pa.Array:
    """Float price column → int64 cents, rounded half-away-from-zero
    (DuckDB ``round``'s rule). Per-ROW fixed-pointing before any sum —
    rounding a block-parallel double sum after the fact can drift a full
    cent from DuckDB's sequential sum on large groups."""
    return pc.cast(pc.round(pc.multiply(col, 100.0),
                            options=pc.RoundOptions(
                                ndigits=0,
                                round_mode="half_towards_infinity")),
                   pa.int64())


def _synth_docs_for(sf_dir: str) -> str:
    """Deterministic synthetic interleaved docs sized to the scale factor
    (the crawl's closed world; cached under /tmp)."""
    from rendler_ray.sources.synthweb import docs_parquet

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    n = {"0.001": 200, "0.01": 2000, "0.1": 20000}.get(sf, 2000)
    return docs_parquet(f"/tmp/rendler_ray_web/docs_{n}.parquet",
                        n_docs=n, n_hosts=max(8, n // 100), seed=42)


# ======================================================== relational ops
# (SURVEY.md §2 operator shapes over the driver testdata tables)


def q1_lineitem_agg(sf_dir: str):
    """A1/A2-shape grouped aggregate (TPC-H Q1 family): partial per-batch
    combine happens inside Ray's hash aggregate; rounding makes the
    double sums oracle-stable."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        # per-batch combiner: the shuffle then moves <= 6 rows per batch
        # instead of the whole table (partial aggregation pattern)
        df = pd.DataFrame({
            "l_returnflag": t["l_returnflag"].to_numpy(zero_copy_only=False),
            "l_linestatus": t["l_linestatus"].to_numpy(zero_copy_only=False),
            "q": t["l_quantity"].to_numpy(zero_copy_only=False),
            "p": t["l_extendedprice"].to_numpy(zero_copy_only=False),
            "d": t["l_discount"].to_numpy(zero_copy_only=False),
        })
        df["rev"] = df["p"] * (1.0 - df["d"])
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            sum_qty=("q", "sum"), sum_base_price=("p", "sum"),
            sum_revenue=("rev", "sum"), sum_disc=("d", "sum"),
            count_order=("q", "size")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                      Sum("sum_base_price", alias_name="sum_base_price"),
                      Sum("sum_revenue", alias_name="sum_revenue"),
                      Sum("sum_disc", alias_name="sum_disc"),
                      Sum("count_order", alias_name="count_order")))

    def finish(t: pa.Table) -> pa.Table:
        avg = pc.divide(t["sum_disc"], pc.cast(t["count_order"], pa.float64()))
        return t.drop_columns(["sum_disc"]).append_column("avg_disc", avg)

    out = _fixed_point(out.map_batches(finish, batch_format="pyarrow"),
                       {"sum_qty": 2, "sum_base_price": 2,
                        "sum_revenue": 2, "avg_disc": 6})
    return out.map_batches(lambda t: t.rename_columns(
        ["l_returnflag", "l_linestatus", "sum_qty_c", "sum_base_price_c",
         "sum_revenue_c", "count_order", "avg_disc_e6"]),
        batch_format="pyarrow")


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity) * 100) AS BIGINT)        AS sum_qty_c,
       CAST(round(sum(l_extendedprice) * 100) AS BIGINT)   AS sum_base_price_c,
       CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS sum_revenue_c,
       CAST(round(avg(l_discount) * 1000000) AS BIGINT)    AS avg_disc_e6,
       count(*)                                            AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def revenue_by_segment(sf_dir: str):
    """J1-shape hash join (orders ⋈ customer) + grouped aggregate."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    j = orders.join(cust, join_type="inner", num_partitions=8,
                    on=("o_custkey",), right_on=("c_custkey",))
    out = j.groupby("c_mktsegment").aggregate(
        Sum("o_totalprice", alias_name="revenue_c"),
        Count(alias_name="n_orders"))
    return _fixed_point(out, {"revenue_c": 2})


REVENUE_BY_SEGMENT_SQL = """
SELECT c_mktsegment, CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS revenue_c,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def revenue_by_segment_broadcast(sf_dir: str):
    """Broadcast map-side variant of :func:`revenue_by_segment` — the
    production choice at this size ratio (customer ≪ orders): the
    (custkey → segment) map ships ONCE via ray.put, each orders batch
    resolves segments locally (vectorized searchsorted) and emits ≤
    |segments| partial-sum rows, and one tiny groupby folds them — no
    all-to-all over the fact table. Same oracle as the hash-join form."""
    cust = pa.concat_tables(
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    keys = cust["c_custkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(keys)
    keys = keys[order]
    segs = cust["c_mktsegment"].to_numpy(zero_copy_only=False)[order]
    names, codes = np.unique(segs, return_inverse=True)
    ref = ray.put((keys, codes.astype(np.int64), list(map(str, names))))

    def partial(t: pa.Table) -> pa.Table:
        ks, cs, nm = ray.get(ref)
        idx = np.searchsorted(ks, t["o_custkey"].to_numpy(
            zero_copy_only=False))
        seg = cs[idx]  # every o_custkey exists in customer (FK)
        rev = np.bincount(seg, weights=t["o_totalprice"].to_numpy(
            zero_copy_only=False), minlength=len(nm))
        n = np.bincount(seg, minlength=len(nm)).astype(np.int64)
        return pa.table({"c_mktsegment": pa.array(nm, pa.string()),
                         "rev": pa.array(rev, pa.float64()),
                         "n": pa.array(n, pa.int64())})

    out = (_read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("c_mktsegment")
           .aggregate(Sum("rev", alias_name="revenue_c"),
                      Sum("n", alias_name="n_orders")))
    return _fixed_point(out, {"revenue_c": 2})


def semi_join_orders(sf_dir: str):
    """J2-shape broadcast semi-join: keep orders whose customer has
    acctbal > 5000. Small side shipped once via ray.put."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    keys: list[pa.Array] = []
    for b in cust.iter_batches(batch_size=65536, batch_format="pyarrow"):
        t = b.filter(pc.greater(b["c_acctbal"], 5000.0))
        keys.append(t["c_custkey"].combine_chunks())
    keys_ref = ray.put(pa.concat_arrays(keys))

    def keep(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)  # Arrow array, zero-copy from plasma
        return t.filter(pc.is_in(t["o_custkey"], value_set=ks))

    return _read(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
        keep, batch_format="pyarrow")


def bloom_semi_join_lineitem(sf_dir: str):
    """Bloom-prefiltered semi-join — the scale form of a semi-join whose
    build side is too big to broadcast exactly: urgent orders →
    distributed Bloom build (per-batch bitmap partials OR-folded, 128
    KiB total) → probe side drops definite non-members BEFORE the
    shuffle → exact inner hash join of the survivors removes the false
    positives → per-order aggregate. Output is EXACT (the oracle is the
    plain IN semi-join); the bloom only cuts shuffle volume."""
    from rendler_ray.functions import sketch as F_sketch

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    urgent = orders.map_batches(
        lambda t: t.filter(
            pc.equal(t["o_orderpriority"], "1-URGENT")
        ).select(["o_orderkey"]).rename_columns(["l_orderkey"]),
        batch_format="pyarrow")
    m_bits = 1 << 20
    bm_ref = ray.put(F_sketch.bloom_build(urgent, "l_orderkey",
                                          m_bits=m_bits, k=4))

    def prefilter(t: pa.Table) -> pa.Table:
        bm = ray.get(bm_ref)
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(
            F_sketch.bloom_contains(bm, keys, m_bits, 4)))

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    cand = li.map_batches(prefilter, batch_format="pyarrow")
    exact = cand.join(urgent, join_type="inner", num_partitions=8,
                      on=("l_orderkey",))

    def agg_partial(t: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"], "q": q})

    return (exact.map_batches(agg_partial, batch_format="pyarrow")
            .groupby("l_orderkey")
            .aggregate(Count(alias_name="n_items"),
                       Sum("q", alias_name="sum_qty")))


BLOOM_SEMI_JOIN_SQL = """
SELECT l_orderkey, count(*) AS n_items,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')
GROUP BY l_orderkey
"""


SEMI_JOIN_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
"""


def anti_join_customers(sf_dir: str):
    """T1/J2-shape anti-join (the seen-set 'drop already-seen' semantics
    at rest): customers with no high-value (>300k) order. The seen key
    set is broadcast once (ray.put), membership tested per batch."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    seen: list[pa.Array] = []
    for b in orders.iter_batches(batch_size=65536, batch_format="pyarrow"):
        t = b.filter(pc.greater(b["o_totalprice"], 300000.0))
        seen.append(t["o_custkey"].combine_chunks())
    seen_ref = ray.put(pa.concat_arrays(seen))

    def keep(t: pa.Table) -> pa.Table:
        s = ray.get(seen_ref)
        return t.filter(pc.invert(pc.is_in(t["c_custkey"], value_set=s)))

    return _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        keep, batch_format="pyarrow")


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN
  (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
"""


def full_outer_spend_balance(sf_dir: str):
    """FULL OUTER hash join of two filtered aggregates — big-spender
    order totals ⋈ high-balance customers on custkey: rows exist with
    either side null (coalesced to sentinels so the compare is
    total-order-safe). The join runs on pre-aggregated/filtered inputs
    (shuffle carries one row per key, not per order — the right
    cardinality posture for an outer join at scale)."""
    from rendler_ray.state.politeness import _nonempty_blocks

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    spend = (orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 150000.0)),
        batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_orders"),
                   Sum("o_totalprice", alias_name="spend")))
    spend = _fixed_point(spend, {"spend": 2})
    cust = _fixed_point(
        _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
            lambda t: t.filter(pc.greater(t["c_acctbal"], 1000.0)),
            batch_format="pyarrow"),
        {"c_acctbal": 2})

    joined = spend.join(cust, join_type="full_outer", num_partitions=8,
                        on=("o_custkey",), right_on=("c_custkey",))
    joined = _nonempty_blocks(joined.materialize())
    if joined is None:
        return pa.table({"custkey": pa.array([], pa.int64()),
                         "n_orders": pa.array([], pa.int64()),
                         "spend_c": pa.array([], pa.int64()),
                         "acctbal_c": pa.array([], pa.int64())})

    def finish(t: pa.Table) -> pa.Table:
        # Ray's outer join emits ONE coalesced key column (left name)
        return pa.table({
            "custkey": pc.cast(t["o_custkey"], pa.int64()),
            "n_orders": pc.fill_null(pc.cast(t["n_orders"], pa.int64()), 0),
            "spend_c": pc.fill_null(pc.cast(t["spend"], pa.int64()), 0),
            "acctbal_c": pc.fill_null(pc.cast(t["c_acctbal"], pa.int64()),
                                      -1),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


FULL_OUTER_SQL = """
WITH a AS (
  SELECT o_custkey, count(*) AS n_orders,
         CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS spend_c
  FROM orders WHERE o_totalprice > 150000 GROUP BY o_custkey),
b AS (
  SELECT c_custkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c
  FROM customer WHERE c_acctbal > 1000)
SELECT COALESCE(a.o_custkey, b.c_custkey) AS custkey,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(spend_c, 0) AS spend_c,
       COALESCE(acctbal_c, -1) AS acctbal_c
FROM a FULL OUTER JOIN b ON a.o_custkey = b.c_custkey
"""


def multiway_join_revenue(sf_dir: str):
    """Three-way join (TPC-H Q3 family): customer ⋈ orders ⋈ lineitem
    with the cardinality-aware operator ORDER — lineitem is combined to
    per-(orderkey, batch) partial revenue, then SEMI-FILTERED through
    the BUILDING-orders join BEFORE the per-order aggregate, so the
    expensive high-cardinality groupby sums only the ~1/5 of partials
    that survive the segment filter (the join is Ray's hash shuffle,
    which is much cheaper per row than the sort-based aggregate).
    Top-10 cutoff sorts the ROUNDED integer revenue on both sides
    (float sums at the cutoff would be engine-dependent in the last
    ulp)."""
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev_partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        df = (pd.DataFrame({"o_orderkey": t["l_orderkey"].to_numpy(),
                            "revenue": rev.to_numpy()})
              .groupby("o_orderkey", sort=False).sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    li_part = li.map_batches(rev_partial, batch_format="pyarrow")

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
                   .select(["c_custkey"]),
        batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    ord_b = orders.join(cust, join_type="inner", num_partitions=8,
                        on=("o_custkey",), right_on=("c_custkey",))
    from rendler_ray.functions.groupagg import sorted_group_agg

    # order-cardinality groupby → sort + Arrow combine (groupagg.py)
    j = sorted_group_agg(
        li_part.join(ord_b.select_columns(["o_orderkey"]),
                     join_type="inner", num_partitions=8,
                     on=("o_orderkey",)),
        "o_orderkey", [("revenue", "sum", "revenue")])
    j = _fixed_point(j, {"revenue": 2}).map_batches(
        lambda t: t.rename_columns(["orderkey", "revenue_c"]),
        batch_format="pyarrow")
    return j.sort(["revenue_c", "orderkey"],
                  descending=[True, False]).limit(10)


MULTIWAY_JOIN_SQL = """
WITH rev AS (
  SELECT l_orderkey AS orderkey,
         CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100)
              AS BIGINT) AS revenue_c
  FROM lineitem GROUP BY l_orderkey)
SELECT rev.orderkey, rev.revenue_c
FROM rev
JOIN orders ON orders.o_orderkey = rev.orderkey
JOIN customer ON customer.c_custkey = orders.o_custkey
WHERE customer.c_mktsegment = 'BUILDING'
ORDER BY revenue_c DESC, orderkey LIMIT 10
"""


def distinct_users_by_type(sf_dir: str):
    """Grouped exact COUNT(DISTINCT): per-batch distinct partial shrinks
    the exchange to unique (type, user) pairs; the shuffle key INCLUDES
    user_id, so a hot event_type spreads across all reducers instead of
    landing on one (the built-in skew handling of composite-key
    distinct — no explicit salting needed for algebraic distinct
    counts). A second, tiny groupby folds pairs into per-type counts."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    pairs = ds.map_batches(
        lambda t: t.group_by(["event_type", "user_id"]).aggregate([]),
        batch_format="pyarrow")
    uniq = pairs.groupby(["event_type", "user_id"]).aggregate(
        Count(alias_name="_n"))
    return (uniq.groupby("event_type")
            .aggregate(Count(alias_name="n_users")))


DISTINCT_USERS_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def median_value_by_type(sf_dir: str):
    """Grouped EXACT median via the value-histogram shape (the grouped
    form of percentile_order_values): the all-to-all carries one row per
    distinct (type, cents) value, never per event; the per-group finish
    runs over that small histogram. Median is emitted ×2 (lo + hi
    middle ranks) so even-count groups stay in exact integer arithmetic
    on both sides."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    cents = _fixed_point(ds, {"value": 2}).map_batches(
        lambda t: t.rename_columns(["event_type", "cents"]),
        batch_format="pyarrow")
    counts = cents.groupby(["event_type", "cents"]).aggregate(
        Count(alias_name="n"))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents")
        v = g["cents"].to_numpy(np.int64)
        cum = np.cumsum(g["n"].to_numpy(np.int64))
        n = int(cum[-1])
        lo = int(v[np.searchsorted(cum, (n + 1) // 2)])
        hi = int(v[np.searchsorted(cum, n // 2 + 1)])
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "n_events": [n],
                             "median_x2_c": [lo + hi]})

    return (counts.groupby("event_type")
            .map_groups(pick, batch_format="pandas")
            .select_columns(["event_type", "n_events", "median_x2_c"]))


MEDIAN_BY_TYPE_SQL = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events)
SELECT event_type, count(*) AS n_events,
  CAST((list(cents ORDER BY cents))[(count(*) + 1) // 2]
     + (list(cents ORDER BY cents))[count(*) // 2 + 1] AS BIGINT)
    AS median_x2_c
FROM c GROUP BY event_type
"""


def corr_qty_price_stats(sf_dir: str):
    """Distributed correlation/covariance MOMENTS per group: the five
    algebraic sums (n, Σq, Σp, Σq², Σp², Σqp) fold per batch into one
    row per key, so the shuffle is O(groups × batches) — the classic
    one-pass parallel corr shape; the final float division happens
    outside the engine compare. Values are floor()ed to whole units
    first (floor matches bit-for-bit between numpy and DuckDB where
    round()/CAST do not — CLAUDE.md rule; whole units also keep Σp²
    inside int64 at bench scale)."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        q = np.floor(t["l_quantity"].to_numpy()).astype(np.int64)
        p = np.floor(t["l_extendedprice"].to_numpy()).astype(np.int64)
        df = pd.DataFrame({"l_returnflag": t["l_returnflag"].to_numpy(
            zero_copy_only=False), "n": 1, "sum_q": q, "sum_p": p,
            "sum_qq": q * q, "sum_pp": p * p, "sum_qp": q * p})
        return pa.Table.from_pandas(
            df.groupby("l_returnflag", sort=False).sum().reset_index(),
            preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("l_returnflag")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_q", alias_name="sum_q"),
                       Sum("sum_p", alias_name="sum_p"),
                       Sum("sum_qq", alias_name="sum_qq"),
                       Sum("sum_pp", alias_name="sum_pp"),
                       Sum("sum_qp", alias_name="sum_qp")))


CORR_STATS_SQL = """
WITH v AS (
  SELECT l_returnflag,
         CAST(floor(l_quantity) AS BIGINT) AS q,
         CAST(floor(l_extendedprice) AS BIGINT) AS p
  FROM lineitem)
SELECT l_returnflag, count(*) AS n,
       CAST(sum(q) AS BIGINT) AS sum_q,
       CAST(sum(p) AS BIGINT) AS sum_p,
       CAST(sum(q * q) AS BIGINT) AS sum_qq,
       CAST(sum(p * p) AS BIGINT) AS sum_pp,
       CAST(sum(q * p) AS BIGINT) AS sum_qp
FROM v GROUP BY l_returnflag
"""


def ntile_customers_by_nation(sf_dir: str):
    """NTILE(4) window over account balance within each nation —
    per-group pandas finish reproduces SQL NTILE exactly (first
    count%4 buckets take the extra row) with a deterministic
    (acctbal, custkey) tie-break. The sort comparison uses the STORED
    doubles (no arithmetic), so engines agree."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey",
                                    "c_acctbal"])

    def ntile(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c_acctbal", "c_custkey"]).reset_index(drop=True)
        k, nb = len(g), 4
        base, rem = divmod(k, nb)
        sizes = [base + (1 if i < rem else 0) for i in range(nb)]
        g["bucket"] = np.repeat(np.arange(1, nb + 1), sizes)[:k]
        return g[["c_custkey", "c_nationkey", "bucket"]]

    return ds.groupby("c_nationkey").map_groups(
        ntile, batch_format="pandas")


NTILE_SQL = """
SELECT c_custkey, c_nationkey,
       NTILE(4) OVER (PARTITION BY c_nationkey
                      ORDER BY c_acctbal, c_custkey) AS bucket
FROM customer
"""


def _rich_nation_presence(sf_dir: str):
    """Shared side-tag presence table for the set ops (the same
    one-shuffle Min/Max presence trick pipelines/diff.py uses for edge
    diffs): per-batch distinct partials of nations with a rich
    (acctbal > 5000) customer (side 1) / supplier (side 2), one union
    groupby → (nationkey, smin, smax)."""
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    supp = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def tag(key_col: str, bal_col: str, side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.greater(t[bal_col], 5000.0))
            keys = pc.unique(pc.cast(t[key_col], pa.int64()))
            return pa.table({
                "nationkey": keys,
                "side": pa.array([side] * len(keys), pa.int8())})
        return fn

    tagged = (cust.map_batches(tag("c_nationkey", "c_acctbal", 1),
                               batch_format="pyarrow")
              .union(supp.map_batches(tag("s_nationkey", "s_acctbal", 2),
                                      batch_format="pyarrow")))
    return tagged.groupby("nationkey").aggregate(
        Min("side", alias_name="smin"), Max("side", alias_name="smax"))


_NATIONKEY_SCHEMA = pa.schema([("nationkey", pa.int64())])


def _small_typed(ds, schema: pa.Schema) -> pa.Table:
    """Collect a known-TINY result as a typed Arrow table: an all-empty
    Dataset loses its column schema through to_pandas (the EXCEPT of
    two sets is legitimately empty at some scales), and the driver's
    compare then sees schema [] != [cols]."""
    return pa.Table.from_pylist(ds.take_all(), schema=schema)


def nations_intersect(sf_dir: str):
    """Distributed INTERSECT: nations with a rich customer AND a rich
    supplier — presence on both sides of the tagged union."""
    agg = _rich_nation_presence(sf_dir)

    def both(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(t["smin"], 1), pc.equal(t["smax"], 2))
        return t.filter(mask).select(["nationkey"])

    return _small_typed(agg.map_batches(both, batch_format="pyarrow"),
                        _NATIONKEY_SCHEMA)


def nations_except(sf_dir: str):
    """Distributed EXCEPT (set difference): nations with a rich customer
    but NO rich supplier — presence on side 1 only (smin == smax == 1).
    Same single exchange as INTERSECT; no join, no second pass. Empty
    at scales where every nation has both (sf0.1) — the typed-empty
    schema survives."""
    agg = _rich_nation_presence(sf_dir)

    def only_left(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(t["smin"], 1), pc.equal(t["smax"], 1))
        return t.filter(mask).select(["nationkey"])

    return _small_typed(agg.map_batches(only_left, batch_format="pyarrow"),
                        _NATIONKEY_SCHEMA)


NATIONS_EXCEPT_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS nationkey
FROM customer WHERE c_acctbal > 5000
EXCEPT
SELECT CAST(s_nationkey AS BIGINT) AS nationkey
FROM supplier WHERE s_acctbal > 5000
"""


def region_nation_pairs(sf_dir: str):
    """CROSS JOIN with the broadcast-small-side shape: region (5 rows)
    is read once on the driver and closed over; each nation batch emits
    the vectorized cartesian block (np.repeat × np.tile). The pattern a
    100-TB pipeline uses for tiny dimension × big fact products — the
    big side streams, the small side never shuffles."""
    import pyarrow.parquet as pq

    r_names = sorted(pq.read_table(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_name"])["r_name"].to_pylist())

    def cross(t: pa.Table) -> pa.Table:
        n = t["n_name"].to_numpy(zero_copy_only=False)
        return pa.table({
            "r_name": pa.array(np.repeat(r_names, len(n))),
            "n_name": pa.array(np.tile(n, len(r_names)))})

    return _read(sf_dir, "nation", ["n_name"]).map_batches(
        cross, batch_format="pyarrow")


REGION_NATION_CROSS_SQL = """
SELECT r_name, n_name FROM region CROSS JOIN nation
"""


def event_gaps_lag(sf_dir: str):
    """LAG window: per-user gap to the previous event in exact int64
    microseconds (epoch_us on both sides — float epoch seconds would
    not hash). groupby(user) + one vectorized diff per group; first
    event per user is dropped (its lag is NULL in SQL)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((g["event_id"].to_numpy(), us))
        us, eid = us[order], g["event_id"].to_numpy()[order]
        return pd.DataFrame({
            "event_id": eid[1:],
            "user_id": g["user_id"].iloc[0],
            "gap_us": np.diff(us)})

    return (ds.groupby("user_id")
            .map_groups(gaps, batch_format="pandas")
            .select_columns(["event_id", "user_id", "gap_us"]))


EVENT_GAPS_SQL = """
WITH w AS (
  SELECT event_id, user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events)
SELECT event_id, user_id, gap_us FROM w WHERE gap_us IS NOT NULL
"""


def customer_order_counts(sf_dir: str):
    """LEFT OUTER join with null-side fill: every customer with their
    order count and spend (0/0 for customers with no orders) — the
    dimension-preserving join the FULL OUTER and INNER entries don't
    cover. Orders pre-aggregate to one row per custkey BEFORE the join,
    so the shuffle carries |customers| + |custkeys-with-orders| rows,
    never the fact table."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0),
                             options=pc.RoundOptions(
                                 ndigits=0,
                                 round_mode="half_towards_infinity")),
                    pa.int64())
        return pa.table({"c_custkey": t["o_custkey"], "spend_c": v})

    from rendler_ray.state.politeness import _nonempty_blocks

    from rendler_ray.functions.groupagg import sorted_group_agg

    # entity-cardinality groupby → sort + Arrow combine (groupagg.py)
    per_cust = sorted_group_agg(
        orders.map_batches(cents, batch_format="pyarrow"),
        "c_custkey", [("c_custkey", "count", "n_orders"),
                      ("spend_c", "sum", "spend_c")])
    # groupby aggregates emit colless placeholder blocks for empty
    # partitions; sanitize before feeding the hash join (ROUND2 notes)
    per_cust = _nonempty_blocks(per_cust.materialize())
    if per_cust is None:
        return cust.map_batches(
            lambda t: t.append_column(
                "n_orders", pa.array(np.zeros(t.num_rows, np.int64))
            ).append_column(
                "spend_c", pa.array(np.zeros(t.num_rows, np.int64))),
            batch_format="pyarrow")
    j = cust.join(per_cust, join_type="left_outer", num_partitions=8,
                  on=("c_custkey",))

    def fill(t: pa.Table) -> pa.Table:
        n = t["n_orders"].to_numpy(zero_copy_only=False)
        s = t["spend_c"].to_numpy(zero_copy_only=False)
        n = np.where(np.isnan(n.astype(np.float64)), 0, n).astype(np.int64)
        s = np.where(np.isnan(s.astype(np.float64)), 0, s).astype(np.int64)
        return pa.table({"c_custkey": t["c_custkey"],
                         "c_mktsegment": t["c_mktsegment"],
                         "n_orders": pa.array(n, pa.int64()),
                         "spend_c": pa.array(s, pa.int64())})

    return j.map_batches(fill, batch_format="pyarrow")


CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c.c_custkey, c.c_mktsegment,
       CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(o.s, 0) AS BIGINT) AS spend_c
FROM customer c LEFT JOIN (
  SELECT o_custkey, count(*) AS n,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS s
  FROM orders GROUP BY o_custkey) o ON c.c_custkey = o.o_custkey
"""


def monthly_revenue(sf_dir: str):
    """Calendar truncation (date_trunc family): revenue per calendar
    month. numpy's datetime64[M] cast is exact calendar math and equals
    DuckDB's (year−1970)·12 + month−1 — months-since-epoch int64 keys
    on both sides; revenue in cents after the grouped sum."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        m = (t["o_orderdate"].to_numpy()
             .astype("datetime64[M]").astype(np.int64))
        # cents BEFORE the sum: per-row rounding is order-independent,
        # a post-sum rounding of a block-parallel double sum is not
        return pa.table({"month": pa.array(m, pa.int64()),
                         "rev": _cents(t["o_totalprice"]),
                         "n": pa.array(np.ones(len(m), np.int64))})

    return (ds.map_batches(part, batch_format="pyarrow")
            .groupby("month")
            .aggregate(Sum("rev", alias_name="revenue_c"),
                       Sum("n", alias_name="n_orders")))


MONTHLY_REVENUE_SQL = """
SELECT (year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1 AS month,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_c,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY month
"""


def incremental_event_stats(sf_dir: str):
    """Incremental view maintenance (the backfill-free shape a 100-TB
    store needs): a PERSISTED per-type aggregate of the 'old' partition
    (event_id % 5 != 0, checkpointed to parquet once) is merged with
    the freshly-aggregated 'new' partition — old raw rows are never
    rescanned. Exact because every statistic is decomposable: counts
    and sums add, mins/maxes fold. The oracle computes the same stats
    over the FULL table, proving merge == recompute."""
    import os as _os

    # checkpoint key includes the source file's (mtime, size): if the
    # testdata under this sf dir is regenerated, a stale 'old' aggregate
    # would silently merge wrong stats — content-keyed paths can't
    sf = _os.path.basename(_os.path.normpath(sf_dir))
    st = _os.stat(_os.path.join(sf_dir, "events.parquet"))
    ck = (f"/tmp/rendler_ray_ivm/{sf}-{st.st_mtime_ns}-{st.st_size}"
          f"/old_agg.parquet")

    def cents(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["value"], 100.0),
                             options=pc.RoundOptions(
                                 ndigits=0,
                                 round_mode="half_towards_infinity")),
                    pa.int64())
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"], "c": v})

    def part(t: pa.Table, *, new: bool) -> pa.Table:
        mod = pc.subtract(t["event_id"],
                          pc.multiply(pc.divide(t["event_id"], 5), 5))
        m = pc.equal(mod, 0) if new else pc.not_equal(mod, 0)
        t = t.filter(m)
        one = pa.array(np.ones(t.num_rows, np.int64))
        return pa.table({"event_type": t["event_type"], "n": one,
                         "sum_c": t["c"], "min_c": t["c"],
                         "max_c": t["c"]})

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"]
               ).map_batches(cents, batch_format="pyarrow")

    def agg(d):
        return d.groupby("event_type").aggregate(
            Sum("n", alias_name="n"), Sum("sum_c", alias_name="sum_c"),
            Min("min_c", alias_name="min_c"),
            Max("max_c", alias_name="max_c"))

    if not _os.path.exists(ck):
        _os.makedirs(_os.path.dirname(ck), exist_ok=True)
        old = agg(ds.map_batches(lambda t: part(t, new=False),
                                 batch_format="pyarrow"))
        tmp = ck + ".tmp"
        import pyarrow.parquet as _pq
        _pq.write_table(pa.concat_tables(
            old.iter_batches(batch_size=None, batch_format="pyarrow")),
            tmp)
        _os.replace(tmp, ck)

    old_ds = rd.read_parquet(ck)
    new_agg = agg(ds.map_batches(lambda t: part(t, new=True),
                                 batch_format="pyarrow"))
    return agg(old_ds.union(new_agg))


INCREMENTAL_STATS_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
       min(CAST(round(value * 100) AS BIGINT)) AS min_c,
       max(CAST(round(value * 100) AS BIGINT)) AS max_c
FROM events GROUP BY event_type
"""


def unpivot_user_type_sums(sf_dir: str):
    """Unpivot (wide → long): the per-user wide pivot result melts back
    to (user_id, event_type, sum_c) rows, dropping the zero cells the
    widening fabricated — the melt is a cheap vectorized per-batch
    flat-map over the ALREADY-AGGREGATED wide table (users × types
    rows, never the fact table). Oracle = the plain long aggregate."""
    types = ["click", "error", "purchase", "signup", "view"]
    wide = pivot_event_values(sf_dir)

    def melt(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        cols = [t[f"sum_{ty}_c"].to_numpy(zero_copy_only=False)
                for ty in types]
        uu = np.tile(u, len(types))
        tt = np.repeat(np.array(types, dtype=object), len(u))
        vv = np.concatenate(cols)
        keep = vv != 0
        return pa.table({
            "user_id": pa.array(uu[keep], pa.int64()),
            "event_type": pa.array(tt[keep], pa.string()),
            "sum_c": pa.array(vv[keep], pa.int64())})

    return wide.map_batches(melt, batch_format="pyarrow")


UNPIVOT_SQL = """
SELECT user_id, event_type,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c
FROM events GROUP BY user_id, event_type
HAVING sum(CAST(round(value * 100) AS BIGINT)) != 0
"""


def dow_hour_event_counts(sf_dir: str):
    """Calendar extraction (day-of-week × hour-of-day heatmap):
    (epoch_days + 4) % 7 equals DuckDB's dayofweek (Sunday=0; epoch day
    0 was a Thursday=4) — pure integer on both sides."""
    ds = _read(sf_dir, "events", ["ts"])

    def part(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        day = us // 86_400_000_000
        return pa.table({
            "dow": pa.array((day + 4) % 7, pa.int64()),
            "hour": pa.array(us // 3_600_000_000 % 24, pa.int64()),
            "n": pa.array(np.ones(len(us), np.int64))})

    return (ds.map_batches(part, batch_format="pyarrow")
            .groupby(["dow", "hour"])
            .aggregate(Sum("n", alias_name="n_events")))


DOW_HOUR_SQL = """
SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY dow, hour
"""


def funnel_view_click_purchase(sf_dir: str):
    """Ordered-funnel analysis: per user, the first 'view', the first
    'click' AT-OR-AFTER that view, and the first 'purchase' at-or-after
    that click — the classic product funnel, computed in one
    groupby(user) pass with exact epoch-µs stage times (-1 = stage not
    reached, so both sides hash on pure int64). Users with no view are
    excluded (they never entered the funnel)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()

        def first_at_or_after(kind: str, t0: int) -> int:
            m = us[(et == kind) & (us >= t0)]
            return int(m.min()) if len(m) else -1

        t_view = first_at_or_after("view", np.iinfo(np.int64).min)
        if t_view == -1:
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "t_view_us": pd.Series([], dtype=np.int64),
                                 "t_click_us": pd.Series([], dtype=np.int64),
                                 "t_purchase_us": pd.Series([],
                                                            dtype=np.int64)})
        t_click = first_at_or_after("click", t_view)
        t_purchase = (first_at_or_after("purchase", t_click)
                      if t_click != -1 else -1)
        return pd.DataFrame({
            "user_id": pd.Series([g["user_id"].iloc[0]], dtype=np.int64),
            "t_view_us": pd.Series([t_view], dtype=np.int64),
            "t_click_us": pd.Series([t_click], dtype=np.int64),
            "t_purchase_us": pd.Series([t_purchase], dtype=np.int64)})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pandas")


FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(epoch_us(ts)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.t_view
  GROUP BY e.user_id),
p AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.t_click
  GROUP BY e.user_id)
SELECT v.user_id, v.t_view AS t_view_us,
       COALESCE(c.t_click, -1) AS t_click_us,
       COALESCE(p.t_purchase, -1) AS t_purchase_us
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""


def hourly_retention_events(sf_dir: str):
    """Cohort retention: for each hour h, how many users active in h
    were ALSO active in h+1. No join — the (user, hour) presence table
    is side-tagged (A at h, B shifted to h−1) and ONE groupby finds
    pairs carrying both tags (the INTERSECT presence shape), then a
    count per hour."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def tag(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        hour = us // 3_600_000_000
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": pa.array(np.concatenate([uid, uid]), pa.int64()),
            "hour": pa.array(np.concatenate([hour, hour - 1]), pa.int64()),
            "tag": pa.array(np.concatenate(
                [np.zeros(len(uid), np.int64),
                 np.ones(len(uid), np.int64)])),
        })

    presence = (ds.map_batches(tag, batch_format="pyarrow")
                .groupby(["user_id", "hour"])
                .aggregate(Min("tag", alias_name="lo"),
                           Max("tag", alias_name="hi")))
    retained = presence.map_batches(
        lambda t: t.filter(pc.and_(pc.equal(t["lo"], 0),
                                   pc.equal(t["hi"], 1))),
        batch_format="pyarrow")
    return (retained.groupby("hour").aggregate(Count(alias_name="n_retained"))
            .select_columns(["hour", "n_retained"]))


HOURLY_RETENTION_SQL = """
WITH uh AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS hour FROM events)
SELECT a.hour, CAST(count(*) AS BIGINT) AS n_retained
FROM uh a JOIN uh b ON a.user_id = b.user_id AND b.hour = a.hour + 1
GROUP BY a.hour
"""


def customer_order_histogram(sf_dir: str):
    """Degree-distribution shape: histogram of orders-per-customer
    (count-of-counts — two cheap groupbys, the second over ≤ max-degree
    rows)."""
    ds = _read(sf_dir, "orders", ["o_custkey"])
    per_cust = ds.groupby("o_custkey").aggregate(
        Count(alias_name="n_orders"))
    return (per_cust.groupby("n_orders")
            .aggregate(Count(alias_name="n_customers"))
            .select_columns(["n_orders", "n_customers"]))


ORDER_HISTOGRAM_SQL = """
SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
FROM (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey)
GROUP BY n_orders
"""


def mode_event_type_per_user(sf_dir: str):
    """Grouped MODE (most frequent value) with a deterministic
    tie-break: per-batch count partials → one (user, type) groupby sum →
    tiny per-user argmax finish. The composite-key count shuffle is the
    skew-safe shape (a hot user still spreads across reducers by
    type)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = (ds.map_batches(
        lambda t: t.group_by(["user_id", "event_type"])
                   .aggregate([([], "count_all")])
                   .rename_columns(["user_id", "event_type", "n"]),
        batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("n", alias_name="n")))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "event_type"],
                          ascending=[False, True])
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "top_type": [g["event_type"].iloc[0]],
                             "n": [int(g["n"].iloc[0])]})

    return counts.groupby("user_id").map_groups(
        pick, batch_format="pandas")


MODE_PER_USER_SQL = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY user_id, event_type),
r AS (
  SELECT user_id, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rn
  FROM c)
SELECT user_id, event_type AS top_type, n FROM r WHERE rn = 1
"""


def _orders_graph_edges(sf_dir: str):
    """Canonical DISTINCT undirected edge list of the orders-derived
    test graph shared by triangle_counts / clustering coefficient /
    assortativity: (min, max) of (o_custkey, o_orderkey % 1500 + 1),
    self-loops dropped. Per-batch dedup combiner, then one groupby."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey"])

    def canon_edges(t: pa.Table) -> pa.Table:
        u = t["o_custkey"].to_numpy()
        v = (t["o_orderkey"].to_numpy() % 1500) + 1
        a, b = np.minimum(u, v), np.maximum(u, v)
        keep = a != b
        df = pd.DataFrame({"a": a[keep], "b": b[keep]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    return (orders.map_batches(canon_edges, batch_format="pyarrow")
            .groupby(["a", "b"]).aggregate(Count(alias_name="_n"))
            .select_columns(["a", "b"]))


def triangle_counts(sf_dir: str):
    """Distributed triangle counting (per lowest vertex) over a
    deterministic graph derived from orders: undirected edges
    (min, max) of (o_custkey, o_orderkey % 1500 + 1). The classic
    two-join scheme: canonical a<b edges → wedge join E⋈E on the low
    vertex (b<c filter) → close the wedge with an edge join on (b, c).
    All exchanges are hash joins on bounded keys; no adjacency list is
    ever collected."""
    edges = _orders_graph_edges(sf_dir)

    right = edges.map_batches(
        lambda t: t.rename_columns(["a", "c"]), batch_format="pyarrow")
    wedges = (edges.join(right, join_type="inner", num_partitions=8,
                         on=("a",))
              .map_batches(lambda t: t.filter(pc.less(t["b"], t["c"])),
                           batch_format="pyarrow"))
    # the wedge table feeds a SECOND hash join: scrub the zero-row
    # columnless placeholder blocks Ray's join emits for empty
    # partitions (they choke a downstream hash shuffle)
    from rendler_ray.state.politeness import _nonempty_blocks
    wedges = _nonempty_blocks(wedges.materialize())
    closing = edges.map_batches(
        lambda t: t.rename_columns(["b", "c"]), batch_format="pyarrow")
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "n_triangles": pa.array([], pa.int64())})
    if wedges is None:
        return empty
    tri = wedges.join(closing, join_type="inner", num_partitions=8,
                      on=("b", "c"))
    out = (tri.groupby("a").aggregate(Count(alias_name="n_triangles"))
           .materialize())  # final result, bounded by vertex count
    # all-empty Datasets lose their schema through to_pandas
    return empty if out.count() == 0 else out


TRIANGLE_SQL = """
WITH e AS (
  SELECT DISTINCT
    LEAST(o_custkey, o_orderkey % 1500 + 1)    AS a,
    GREATEST(o_custkey, o_orderkey % 1500 + 1) AS b
  FROM orders
  WHERE o_custkey <> o_orderkey % 1500 + 1)
SELECT e1.a AS a, count(*) AS n_triangles
FROM e e1
JOIN e e2 ON e2.a = e1.a AND e1.b < e2.b
JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
GROUP BY e1.a
"""


NATIONS_INTERSECT_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS nationkey
FROM customer WHERE c_acctbal > 5000
INTERSECT
SELECT CAST(s_nationkey AS BIGINT) AS nationkey
FROM supplier WHERE s_acctbal > 5000
"""


def top10_orders(sf_dir: str):
    """O1-shape global sort + limit with deterministic tiebreak."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"],
                   descending=[True, False]).limit(10)


TOP10_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def distinct_union_nations(sf_dir: str):
    """D2-shape union + distinct: nation keys present in customer or
    supplier."""
    c = _read(sf_dir, "customer", ["c_nationkey"]).map_batches(
        lambda t: t.rename_columns(["nationkey"]), batch_format="pyarrow")
    s = _read(sf_dir, "supplier", ["s_nationkey"]).map_batches(
        lambda t: t.rename_columns(["nationkey"]), batch_format="pyarrow")
    # distinct as a grouped aggregate (Dataset.unique collects to the
    # driver; this stays distributed)
    return (c.union(s).groupby("nationkey")
            .aggregate(Count(alias_name="_n"))
            .select_columns(["nationkey"]))


DISTINCT_UNION_SQL = """
SELECT DISTINCT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL SELECT s_nationkey FROM supplier)
"""


def extract_tokens(sf_dir: str):
    """M1-shape ordered extraction: documents.text → (doc_id, token, ord)
    with page order preserved (1-based ord, matching
    generate_subscripts)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks = pd.Series(t["text"].to_numpy(zero_copy_only=False),
                         dtype=object).str.split(" ")
        lens = toks.str.len().to_numpy(np.int64)
        out_id = np.repeat(ids, lens)
        out_tok = np.concatenate([np.array(x, dtype=object) for x in toks])
        out_ord = np.concatenate([np.arange(1, n + 1) for n in lens])
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "token": pa.array(out_tok, pa.string()),
                         "ord": pa.array(out_ord, pa.int64())})

    return ds.map_batches(explode, batch_format="pyarrow")


EXTRACT_TOKENS_SQL = """
SELECT doc_id, unnest(string_split(text, ' ')) AS token,
       generate_subscripts(string_split(text, ' '), 1) AS ord
FROM documents
"""


def top_bigrams(sf_dir: str):
    """Corpus-wide top-20 bigram counts (n-gram language statistics):
    fully vectorized per-batch bigram explode + local count combiner
    (the shuffle moves one row per DISTINCT bigram per batch, not per
    occurrence) → groupby(bigram).sum → per-block partial top-k → tiny
    global sort+limit. Ties break on bigram asc (deterministic at the
    cut line)."""
    k = 20
    ds = _read(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pd.Series(t["text"].to_numpy(zero_copy_only=False),
                         dtype=object).str.split(" ")
        lens = toks.str.len().to_numpy(np.int64)
        flat = np.concatenate([np.array(x, dtype=object) for x in toks])
        # first-of-pair positions: everything except each doc's last token
        valid = np.ones(len(flat), dtype=bool)
        valid[np.cumsum(lens) - 1] = False
        idx = np.flatnonzero(valid)
        bg = (pd.Series(flat[idx], dtype=object) + " "
              + pd.Series(flat[idx + 1], dtype=object))
        counts = bg.value_counts()
        return pa.table({
            "bigram": pa.array(counts.index.to_numpy(object), pa.string()),
            "n": pa.array(counts.to_numpy(np.int64), pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("bigram").aggregate(Sum("n", alias_name="n")))

    def prune(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["n", "bigram"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (counts.map_batches(prune, batch_format="pyarrow")
            .sort(["n", "bigram"], descending=[True, False])
            .limit(k))


TOP_BIGRAMS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
         generate_subscripts(string_split(text, ' '), 1) AS ord
  FROM documents),
bg AS (
  SELECT a.token || ' ' || b.token AS bigram
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1)
SELECT bigram, count(*) AS n FROM bg GROUP BY bigram
ORDER BY n DESC, bigram LIMIT 20
"""


def tfidf_top_terms(sf_dir: str, driver_max: int = 5_000_000):
    """Distributed TF-IDF top-3 terms per document: token explode →
    per-batch (doc, token) tf combine (each doc lives in one batch, so
    the combined rows are already globally unique) → per-token
    document-frequency groupby → tf ⋈ df hash join on token → score →
    per-doc top-3. The vocabulary (df table) stays a Dataset through a
    hash join — never broadcast, never on the driver — so the shape
    holds when the vocabulary is billions of tokens. Below
    ``driver_max`` total token instances the combined partials fold on
    the driver (Arrow C++ hash aggregate + one pandas sort) — zero
    shuffles; the two forms' equality is pytest-asserted.

    idf is the LINEAR N/df (not log): the score is then one IEEE
    division of exact integers, which DuckDB and numpy round
    identically — log(x) differs by 1 ulp between libms, which a
    fixed-point hash compare cannot tolerate. Ties break on token asc.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()

    def explode_combine(t: pa.Table) -> pa.Table:
        # local combiner: one (doc, token, partial count) row per unique
        # pair per batch — the shuffle moves unique pairs, not instances
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks = pd.Series(t["text"].to_numpy(zero_copy_only=False),
                         dtype=object).str.split(" ")
        lens = toks.str.len().to_numpy(np.int64)
        df = pd.DataFrame({
            "doc_id": np.repeat(ids, lens),
            "token": np.concatenate(
                [np.array(x, dtype=object) for x in toks]),
        })
        g = df.groupby(["doc_id", "token"], sort=False).size()
        g = g.reset_index(name="tf")
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64), pa.int64()),
            "token": pa.array(g["token"].tolist(), pa.string()),
            "tf": pa.array(g["tf"].to_numpy(np.int64), pa.int64()),
        })

    # each doc lives in exactly one batch, so the per-batch combine
    # already yields globally-unique (doc, token) rows — re-aggregating
    # them was a no-op all-to-all of the widest table (removed r4)
    tf = ds.map_batches(explode_combine, batch_format="pyarrow")

    # gate scalar: one pruned vectorized token-count scan
    def tok_totals(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(
            pc.split_pattern(t["text"], " ")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"n": pa.array(n, pa.int64())})

    tot = (ds.map_batches(tok_totals, batch_format="pyarrow")
           .aggregate(Sum("n", alias_name="tot"))["tot"] or 0)

    if tot <= driver_max:
        # bounded-driver fold: Arrow hash aggregate for df, one pandas
        # sort + groupby-head for the top-3 — zero shuffles
        ptbl = pa.concat_tables(
            tf.iter_batches(batch_size=None, batch_format="pyarrow"))
        dfc = pa.TableGroupBy(ptbl, "token").aggregate([("doc_id", "count")])
        j = ptbl.join(dfc.rename_columns(["token", "df"]), keys=["token"])
        s = ((j["tf"].to_numpy(zero_copy_only=False) * np.int64(n_docs))
             .astype(np.float64)
             / j["df"].to_numpy(zero_copy_only=False).astype(np.float64))
        pdf = pd.DataFrame({
            "doc_id": j["doc_id"].to_numpy(zero_copy_only=False),
            "token": j["token"].to_numpy(zero_copy_only=False),
            "tf": j["tf"].to_numpy(zero_copy_only=False),
            "df": j["df"].to_numpy(zero_copy_only=False), "score": s})
        top = (pdf.sort_values(["doc_id", "score", "token"],
                               ascending=[True, False, True])
               .groupby("doc_id", sort=False).head(3))
        e6 = pc.cast(pc.round(pc.multiply(
            pa.array(top["score"].to_numpy(), pa.float64()), 1e6),
            options=pc.RoundOptions(ndigits=0,
                                    round_mode="half_towards_infinity")),
            pa.int64())
        return pa.table({
            "doc_id": pa.array(top["doc_id"].to_numpy(np.int64), pa.int64()),
            "token": pa.array(top["token"].tolist(), pa.string()),
            "tf": pa.array(top["tf"].to_numpy(np.int64), pa.int64()),
            "df": pa.array(top["df"].to_numpy(np.int64), pa.int64()),
            "score": e6})

    df = tf.groupby("token").aggregate(Count(alias_name="df"))
    joined = tf.join(df, join_type="inner", num_partitions=8, on=("token",))

    def score(t: pa.Table) -> pa.Table:
        tfv = t["tf"].to_numpy(zero_copy_only=False)
        dfv = t["df"].to_numpy(zero_copy_only=False)
        s = (tfv * np.int64(n_docs)).astype(np.float64) / dfv.astype(np.float64)
        return t.append_column("score", pa.array(s, pa.float64()))

    def top3(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["score", "token"],
                             ascending=[False, True]).head(3)

    out = (joined.map_batches(score, batch_format="pyarrow")
           .groupby("doc_id").map_groups(top3, batch_format="pandas")
           .select_columns(["doc_id", "token", "tf", "df", "score"]))
    return _fixed_point(out, {"score": 6})


def doc_freq_score(sf_dir: str):
    """Corpus-frequency quality score per document: global token
    frequencies (explode+combine → groupby sum) hash-joined back onto
    each document's token counts → per-doc integer aggregates
    (freq_sum = Σ tf·global_freq, n_tokens = Σ tf). The vocabulary
    stays a Dataset through the join (tfidf's shape, opposite
    regroup direction); all-integer math makes the sums order-free, so
    the oracle is hash-exact with no fixed-point dance."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode_combine(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks = pd.Series(t["text"].to_numpy(zero_copy_only=False),
                         dtype=object).str.split(" ")
        lens = toks.str.len().to_numpy(np.int64)
        df = pd.DataFrame({
            "doc_id": np.repeat(ids, lens),
            "token": np.concatenate(
                [np.array(x, dtype=object) for x in toks]),
        })
        g = df.groupby(["doc_id", "token"], sort=False).size()
        g = g.reset_index(name="tf")
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64), pa.int64()),
            "token": pa.array(g["token"].tolist(), pa.string()),
            "tf": pa.array(g["tf"].to_numpy(np.int64), pa.int64()),
        })

    # per-batch combine already yields globally-unique (doc, token) rows
    # (each doc lives in one batch) — no re-aggregation shuffle needed
    tfc = ds.map_batches(explode_combine, batch_format="pyarrow")
    tfc = _checkpoint(tfc, "docfreq_tfc")  # consumed by freq AND the join
    freq = tfc.groupby("token").aggregate(Sum("tf", alias_name="freq"))
    joined = tfc.join(freq, join_type="inner", num_partitions=8,
                      on=("token",))

    def weight(t: pa.Table) -> pa.Table:
        w = (t["tf"].to_numpy(zero_copy_only=False)
             * t["freq"].to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": t["doc_id"], "tf": t["tf"],
                         "wf": pa.array(w, pa.int64())})

    return (joined.map_batches(weight, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(Sum("wf", alias_name="freq_sum"),
                       Sum("tf", alias_name="n_tokens")))


DOC_FREQ_SCORE_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tfc AS (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
), freq AS (
  SELECT token, CAST(sum(tf) AS BIGINT) AS freq FROM tfc GROUP BY token
)
SELECT doc_id, CAST(sum(tf * freq) AS BIGINT) AS freq_sum,
       CAST(sum(tf) AS BIGINT) AS n_tokens
FROM tfc JOIN freq USING (token) GROUP BY doc_id
"""


def trigram_fluency_docs(sf_dir: str, driver_max: int = 5_000_000):
    """Corpus-trigram-LM fluency score per document — the LM
    quality-filter shape (CCNet-style: score text against a language
    model built from the corpus itself), made integer-exact: each
    document pools Σ c(trigram) and Σ c(bigram-prefix) as order-free
    INTEGER sums and the score is ONE final IEEE division fixed-pointed
    to e6 (tfidf's determinism trick) — so the DuckDB oracle is
    hash-exact. Documents with < 3 tokens have no trigrams and drop out
    on both sides.

    Scale shape (the dup_span_stats_docs treatment): n-gram STRINGS
    never leave the explode task — each trigram and its bigram prefix is
    replaced by a 128-bit hash (two independently-keyed SipHash64
    halves) in the per-batch combiner, so every downstream exchange
    carries five int64 columns instead of ~25-byte text keys. Each doc
    lives in exactly one batch, so the combined (doc, tri) rows are
    already globally unique — no per-doc re-aggregation shuffle at all.
    Below ``driver_max`` total trigram instances the int partials fold
    on the driver through Arrow's C++ hash aggregate + hash join
    (~40 bytes/row; zero shuffles); above it the identical semantics run
    distributed (two count groupbys + two int-keyed hash joins +
    groupby(doc_id)). Equality of the two forms is pytest-asserted.
    Collision odds are ≈ n²/2^129 (see dup_span_stats_docs)."""
    import pandas.util as pdu

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode_combine(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks = pd.Series(t["text"].to_numpy(zero_copy_only=False),
                         dtype=object).str.split(" ")
        lens = toks.str.len().to_numpy(np.int64)
        flat = np.concatenate([np.array(x, dtype=object) for x in toks])
        lens_rep = np.repeat(lens, lens)
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        pos_in_doc = np.arange(len(flat)) - starts
        idx = np.flatnonzero(pos_in_doc < lens_rep - 2)
        big = (pd.Series(flat[idx], dtype=object) + " "
               + pd.Series(flat[idx + 1], dtype=object)).to_numpy(object)
        tri = big + " " + flat[idx + 2]
        t1 = pdu.hash_array(tri, categorize=False).view(np.int64)
        t2 = pdu.hash_array(tri, hash_key="rendlertrigram2!",
                            categorize=False).view(np.int64)
        b1 = pdu.hash_array(big, categorize=False).view(np.int64)
        b2 = pdu.hash_array(big, hash_key="rendlertrigram2!",
                            categorize=False).view(np.int64)
        g = (pd.DataFrame({"doc_id": np.repeat(ids, np.maximum(lens - 2, 0)),
                           "t1": t1, "t2": t2, "b1": b1, "b2": b2})
             .groupby(["doc_id", "t1", "t2", "b1", "b2"], sort=False).size()
             .reset_index(name="n"))
        return pa.table({c: pa.array(g[c].to_numpy(np.int64), pa.int64())
                         for c in ("doc_id", "t1", "t2", "b1", "b2", "n")})

    inst = ds.map_batches(explode_combine, batch_format="pyarrow")

    def _finish(per_doc: pa.Table) -> pa.Table:
        f = (per_doc["s_tri"].to_numpy(zero_copy_only=False)
             / per_doc["s_big"].to_numpy(zero_copy_only=False))
        e6 = pc.cast(pc.round(pc.multiply(pa.array(f, pa.float64()), 1e6),
                              options=pc.RoundOptions(
                                  ndigits=0,
                                  round_mode="half_towards_infinity")),
                     pa.int64())
        return pa.table({"doc_id": per_doc["doc_id"],
                         "n_tri": per_doc["n_tri"],
                         "s_tri": per_doc["s_tri"],
                         "s_big": per_doc["s_big"],
                         "fluency_e6": e6})

    # gate scalar: one pruned vectorized scan (Σ max(n_tokens − 2, 0))
    def tri_totals(t: pa.Table) -> pa.Table:
        ntok = pc.list_value_length(
            pc.split_pattern(t["text"], " ")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"n": pa.array(np.maximum(ntok - 2, 0), pa.int64())})

    tot = (ds.map_batches(tri_totals, batch_format="pyarrow")
           .aggregate(Sum("n", alias_name="tot"))["tot"] or 0)

    if tot <= driver_max:
        # bounded-driver fold: Arrow C++ hash aggregate + hash join on
        # the int partials — zero shuffles
        ptbl = pa.concat_tables(
            inst.iter_batches(batch_size=None, batch_format="pyarrow"))
        tric = pa.TableGroupBy(ptbl, ["t1", "t2"]).aggregate([("n", "sum")])
        tric = tric.rename_columns(["t1", "t2", "ct"])
        bigc = pa.TableGroupBy(ptbl, ["b1", "b2"]).aggregate([("n", "sum")])
        bigc = bigc.rename_columns(["b1", "b2", "cb"])
        j = ptbl.join(tric, keys=["t1", "t2"]).join(bigc, keys=["b1", "b2"])
        n = j["n"].to_numpy(zero_copy_only=False)
        w = pa.table({
            "doc_id": j["doc_id"], "n": j["n"],
            "wt": pa.array(n * j["ct"].to_numpy(zero_copy_only=False),
                           pa.int64()),
            "wb": pa.array(n * j["cb"].to_numpy(zero_copy_only=False),
                           pa.int64())})
        per_doc = pa.TableGroupBy(w, "doc_id").aggregate(
            [("n", "sum"), ("wt", "sum"), ("wb", "sum")])
        per_doc = per_doc.rename_columns(
            ["doc_id", "n_tri", "s_tri", "s_big"])
        return _finish(per_doc)

    # STAGED executions (materialize barriers): fused, this plan holds
    # 2 aggregates + 2 joins = 4 concurrent hash-shuffle stages whose
    # aggregator actors (8 × 0.125 CPU each) reserve 4 full CPUs up
    # front — on a small cluster (the 4-cpu test session) that starves
    # the map tasks and DEADLOCKS the stream. Staged, each execution
    # carries ≤ 2 shuffle stages; inst is materialized once (spillable)
    # instead of feeding three consumers in one plan.
    inst = inst.materialize()
    tric = inst.groupby(["t1", "t2"]).aggregate(
        Sum("n", alias_name="ct")).materialize()
    bigc = inst.groupby(["b1", "b2"]).aggregate(
        Sum("n", alias_name="cb")).materialize()
    joined = (inst.join(tric, join_type="inner", num_partitions=8,
                        on=("t1", "t2")).materialize()
              .join(bigc, join_type="inner", num_partitions=8,
                    on=("b1", "b2")))

    def weight(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "n": t["n"],
            "wt": pa.array(n * t["ct"].to_numpy(zero_copy_only=False),
                           pa.int64()),
            "wb": pa.array(n * t["cb"].to_numpy(zero_copy_only=False),
                           pa.int64())})

    per_doc = (joined.map_batches(weight, batch_format="pyarrow")
               .groupby("doc_id")
               .aggregate(Sum("n", alias_name="n_tri"),
                          Sum("wt", alias_name="s_tri"),
                          Sum("wb", alias_name="s_big")))
    return per_doc.map_batches(_finish, batch_format="pyarrow")


TRIGRAM_FLUENCY_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
         generate_subscripts(string_split(text, ' '), 1) AS ord
  FROM documents),
tri AS (
  SELECT a.doc_id,
         a.token || ' ' || b.token || ' ' || c.token AS tri,
         a.token || ' ' || b.token AS big
  FROM toks a
  JOIN toks b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
  JOIN toks c ON a.doc_id = c.doc_id AND c.ord = a.ord + 2),
tric AS (SELECT tri, CAST(count(*) AS BIGINT) AS ct FROM tri GROUP BY tri),
bigc AS (SELECT big, CAST(count(*) AS BIGINT) AS cb FROM tri GROUP BY big),
doc AS (
  SELECT t.doc_id, count(*) AS n_tri,
         CAST(sum(ct) AS BIGINT) AS s_tri,
         CAST(sum(cb) AS BIGINT) AS s_big
  FROM tri t JOIN tric USING (tri) JOIN bigc USING (big)
  GROUP BY t.doc_id)
SELECT doc_id, n_tri, s_tri, s_big,
       CAST(round(s_tri / s_big * 1000000) AS BIGINT) AS fluency_e6
FROM doc
"""


TFIDF_SQL = """
WITH tf AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tfc AS (
  SELECT doc_id, token, count(*) AS tf FROM tf GROUP BY doc_id, token
), dfc AS (
  SELECT token, count(*) AS df FROM tfc GROUP BY token
)
SELECT doc_id, token, tf, df,
       CAST(round(tf * (SELECT count(*) FROM documents) / df * 1000000)
            AS BIGINT) AS score
FROM tfc JOIN dfc USING (token)
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY tf * (SELECT count(*) FROM documents) / df DESC,
                                    token ASC) <= 3
"""


def inverted_index_postings(sf_dir: str):
    """Inverted-index build: token → df + sorted posting list (the
    retrieval/shard-index shape a training-data pipeline materializes).
    Per-batch (doc_id, token) dedup acts as the shuffle combiner; one
    groupby(token) then emits the CSV posting string per token. At 100
    TB the posting strings for stop-word-grade tokens get capped/split
    into fixed-size segments; the synthetic vocab stays tiny."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode_dedup(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks = pd.Series(t["text"].to_numpy(zero_copy_only=False),
                         dtype=object).str.split(" ")
        lens = toks.str.len().to_numpy(np.int64)
        df = pd.DataFrame({
            "token": np.concatenate(
                [np.array(x, dtype=object) for x in toks]),
            "doc_id": np.repeat(ids, lens),
        }).drop_duplicates()
        return pa.table({"token": pa.array(df["token"], pa.string()),
                         "doc_id": pa.array(df["doc_id"], pa.int64())})

    def postings(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        return pd.DataFrame({
            "token": [g["token"].iloc[0]],
            "df": pd.Series([len(ids)], dtype=np.int64),
            "postings": [",".join(map(str, ids))]})

    return (ds.map_batches(explode_dedup, batch_format="pyarrow")
            .groupby("token").map_groups(postings, batch_format="pandas"))


INVERTED_INDEX_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
td AS (SELECT DISTINCT doc_id, token FROM tok)
SELECT token, CAST(count(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM td GROUP BY token
"""


# fixed 2-term retrieval queries over the corpus vocabulary. TWO terms
# on purpose: a 2-addend float sum is IEEE-commutative, so the Ray and
# DuckDB per-doc scores are bit-identical regardless of term order
# (3+ addends would be association-order-dependent in the last ulp).
_BM25_QUERIES = {0: ("hash", "join"), 1: ("sort", "merge"),
                 2: ("window", "stream"), 3: ("table", "scan")}
_BM25_K1, _BM25_B = 1.2, 0.75


def bm25_search_docs(sf_dir: str, k: int = 10):
    """BM25 top-k retrieval (Robertson's Okapi weighting, Lucene's
    idf = ln(1 + (N−df+0.5)/(df+0.5)) variant) for a fixed query set —
    the text-retrieval op a curation pipeline runs for benchmark-
    similarity mining or targeted corpus search. Scale shape: corpus
    stats (N, Σdl) from one tiny aggregate; per-term df from a
    distinct-(term, doc) combiner pass (query terms only — rows ≤
    terms × docs/batch); idf computed ON THE DRIVER with ``math.log``
    (libm — numpy's SIMD log can differ from DuckDB's in the last ulp)
    and broadcast; then ONE stateless scoring pass with per-batch
    tie-inclusive partial top-k (the PQ pattern) and a constant-group
    finisher. No shuffle ever touches the corpus."""
    import math

    terms = sorted({t for q in _BM25_QUERIES.values() for t in q})
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats_partial(t: pa.Table) -> pa.Table:
        # ONE fused stats pass: per-term df partials PLUS the corpus
        # (doc count, Σdl) totals as a sentinel "" row — one corpus
        # scan instead of two, one tiny groupby of ≤ terms+1 keys per
        # batch. Integer partials, so fusion is value-identical.
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        out_t, out_c = [""], [int(t.num_rows)]
        out_d = [int(pc.sum(pc.list_value_length(toks)).as_py() or 0)]
        for term in terms:
            hit = np.unique(par[flat == term])
            out_t.append(term)
            out_c.append(len(hit))  # docs whole per batch: safe partial
            out_d.append(0)
        return pa.table({"term": pa.array(out_t, pa.string()),
                         "c": pa.array(out_c, pa.int64()),
                         "d": pa.array(out_d, pa.int64())})

    dfs = {term: 0 for term in terms}
    n = sdl = 0
    for r in (ds.map_batches(stats_partial, batch_format="pyarrow")
              .groupby("term").aggregate(Sum("c", alias_name="df"),
                                         Sum("d", alias_name="sdl"))
              .take_all()):  # bounded: <= len(terms)+1 rows
        if r["term"] == "":
            n, sdl = int(r["df"]), int(r["sdl"])
        else:
            dfs[r["term"]] = int(r["df"])
    avgdl = sdl / n  # same float op as the SQL's sdl / n
    idf = {term: math.log(1.0 + (n - dfs[term] + 0.5)
                          / (dfs[term] + 0.5)) for term in terms}
    bref = ray.put((idf, avgdl))

    def score(t: pa.Table) -> pa.Table:
        idf_, avgdl_ = ray.get(bref)
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        dl = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.float64)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        nr = t.num_rows
        tf = {term: np.bincount(par[flat == term], minlength=nr
                                ).astype(np.float64) for term in terms}
        norm = _BM25_K1 * (1.0 - _BM25_B + _BM25_B * (dl / avgdl_))
        out_q, out_v, out_s = [], [], []
        for qid, qt in _BM25_QUERIES.items():
            s = np.zeros(nr)
            for term in qt:  # exactly the SQL's per-row weight tree
                s = s + idf_[term] * (tf[term] * (_BM25_K1 + 1.0)) \
                    / (tf[term] + norm)
            se6 = np.round(s * 1e6).astype(np.int64)
            pos = (np.asarray([tf[term] for term in qt]).sum(axis=0)
                   > 0)
            if not pos.any():
                continue
            kk = min(k, int(pos.sum()))
            cand = se6[pos]
            thr = np.partition(cand, len(cand) - kk)[len(cand) - kk]
            keep = pos & (se6 >= thr)  # tie-inclusive partial
            out_q.extend([qid] * int(keep.sum()))
            out_v.extend(ids[keep].tolist())
            out_s.extend(se6[keep].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "doc_id": pa.array(out_v, pa.int64()),
                         "score_e6": pa.array(out_s, pa.int64())})

    cands = ds.map_batches(score, batch_format="pyarrow")

    def fin(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score_e6", "doc_id"],
                          ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return cands.groupby("query_id").map_groups(fin,
                                                batch_format="pandas")


def _bm25_cte() -> str:
    """Shared BM25 scoring CTE block (p/stats/q/tf/df/sc) — one
    expression tree reused verbatim by the BM25, RRF-hybrid, and
    hard-negative oracles so all three stay bit-identical to the Ray
    scoring pass."""
    vals = ", ".join(f"({q}, '{t}')"
                     for q, ts in _BM25_QUERIES.items() for t in ts)
    return f"""
WITH p AS (SELECT doc_id, string_split(text, ' ') AS toks,
                  len(string_split(text, ' ')) AS dl
           FROM documents),
stats AS (SELECT count(*) AS n, sum(dl) AS sdl FROM p),
q(query_id, term) AS (VALUES {vals}),
tf AS (SELECT p.doc_id, q.query_id, q.term, p.dl,
              len(list_filter(p.toks, x -> x = q.term)) AS tf
       FROM p CROSS JOIN q),
df AS (SELECT term, count(*) AS df FROM tf
       WHERE tf > 0 GROUP BY term),
sc AS (SELECT t.doc_id, t.query_id,
              CAST(round(sum(
                ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                * (t.tf * {_BM25_K1 + 1.0})
                / (t.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                     + {_BM25_B} * (t.dl / (CAST(s.sdl AS DOUBLE)
                                            / s.n))))
              ) * 1000000) AS BIGINT) AS score_e6
       FROM tf t JOIN df d USING (term), stats s
       WHERE t.tf > 0
       GROUP BY t.doc_id, t.query_id)"""


def _bm25_sql() -> str:
    return f"""{_bm25_cte()}
SELECT query_id, doc_id, score_e6,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY score_e6 DESC, doc_id) AS rank
FROM sc
QUALIFY rank <= 10
"""


BM25_SEARCH_SQL = _bm25_sql()


def last_event_per_user(sf_dir: str):
    """A2-shape last-write-wins per key (renderResults[url]=x semantics):
    latest event per user, tiebreak on event_id."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type",
                                  "value"])

    def last(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["ts", "event_id"]).tail(1)

    out = ds.groupby("user_id").map_groups(last, batch_format="pandas")
    return out


LAST_EVENT_SQL = """
SELECT event_id, ts, user_id, event_type, value FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


def event_type_stats(sf_dir: str):
    """A3-shape counters: per event_type count / sum / min / max."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    out = ds.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("value", alias_name="total_value_c"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"))
    return _fixed_point(out, {"total_value_c": 2})


EVENT_TYPE_STATS_SQL = """
SELECT event_type, count(*) AS n,
       CAST(round(sum(value) * 100) AS BIGINT) AS total_value_c,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY event_type
"""


def hourly_user_windows(sf_dir: str):
    """Streaming-shape tumbling window (SURVEY.md §2.9): events per
    (user, hour) — count + rounded sum. HIGH-CARDINALITY groupby (the
    group count approaches the row count), so it runs on
    ``functions/groupagg.py::sorted_group_sums`` — sort + per-block
    Arrow combine with the bounded boundary fixup — instead of Ray's
    native aggregate, whose per-group Python accumulators cost
    ~35 µs/group (measured 35–53 s for a 1M-group instance vs ~1.2 s
    for this form; equality pytest-asserted). Keys pack to one int64
    (user_id·2³¹ | hour_epoch; bounds asserted — epoch seconds fit
    31 bits until 2038)."""
    from rendler_ray.functions.groupagg import sorted_group_sums

    ds = _read(sf_dir, "events", ["ts", "user_id", "value"])

    def keyed(t: pa.Table) -> pa.Table:
        # int64 epoch-seconds, not a timestamp: pandas datetime64 unit
        # differences (us vs ns) break value-hash comparison.
        floored = pc.floor_temporal(t["ts"], unit="hour")
        secs = pc.divide(pc.cast(floored, pa.int64()),
                         1_000_000).to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        if len(uid):
            assert int(uid.max()) < (1 << 31)
            assert 0 <= int(secs.min()) and int(secs.max()) < (1 << 31)
        return pa.table({"k": pa.array((uid << 31) | secs, pa.int64()),
                         "value": t["value"]})

    agg = sorted_group_sums(ds.map_batches(keyed, batch_format="pyarrow"),
                            "k", ["value"], count_col="n_events")

    def unpack(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0),
                                 options=pc.RoundOptions(
                                     ndigits=0,
                                     round_mode="half_towards_infinity")),
                        pa.int64())
        return pa.table({
            "user_id": pa.array(k >> 31, pa.int64()),
            "hour_epoch": pa.array(k & ((1 << 31) - 1), pa.int64()),
            "n_events": t["n_events"],
            "sum_value_c": cents})

    return agg.map_batches(unpack, batch_format="pyarrow")


HOURLY_WINDOWS_SQL = """
SELECT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       count(*) AS n_events,
       CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_c
FROM events GROUP BY user_id, date_trunc('hour', ts)
"""


def top2_orders_per_customer(sf_dir: str):
    """Top-k per group (grouped sort + head)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def top2(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["o_totalprice", "o_orderkey"],
                             ascending=[False, True]).head(2)

    return ds.groupby("o_custkey").map_groups(top2, batch_format="pandas")


TOP2_PER_CUSTOMER_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey ASC) <= 2
"""


def events_json_extract(sf_dir: str):
    """Scalar-function family: JSON field extraction from the events
    ``props`` column (vectorized regex — the props are flat one-key
    objects), with a DuckDB json_extract oracle."""
    ds = _read(sf_dir, "events", ["event_id", "props"])

    def extract(t: pa.Table) -> pa.Table:
        s = pd.Series(t["props"].to_numpy(zero_copy_only=False),
                      dtype=object)
        k = pd.to_numeric(s.str.extract(r'"k":\s*(-?\d+)', expand=False),
                          errors="coerce")
        return pa.table({
            "event_id": t["event_id"],
            "k": pa.array(k.to_numpy(np.float64), pa.float64()),
        })

    return ds.map_batches(extract, batch_format="pyarrow")


EVENTS_JSON_SQL = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
FROM events
"""


def asof_join_events(sf_dir: str):
    """As-of join — a custom operator Ray Data lacks natively: for each
    'click' event, the most recent 'view' of the SAME user at or before
    its timestamp (ties broken by max event_id). Composition:
    ``groupby(user_id)`` co-locates each user's history, then a
    vectorized per-group ``np.searchsorted`` merge. The partitioning
    assumption (hash by user_id) is the same key every per-user op uses.
    Timestamps emitted as int64 epoch-seconds (hash-stable)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        clicks = g[g["event_type"] == "click"].sort_values(
            ["ts", "event_id"], kind="stable")
        if not len(clicks):
            return pd.DataFrame({
                "click_id": pd.Series([], dtype=np.int64),
                "user_id": pd.Series([], dtype=np.int64),
                "click_epoch": pd.Series([], dtype=np.int64),
                "view_id": pd.Series([], dtype=np.float64)})
        views = g[g["event_type"] == "view"].sort_values(
            ["ts", "event_id"], kind="stable")
        c_ts = clicks["ts"].to_numpy("datetime64[us]").astype(np.int64)
        out_view = np.full(len(clicks), np.nan)
        if len(views):
            v_ts = views["ts"].to_numpy("datetime64[us]").astype(np.int64)
            v_id = views["event_id"].to_numpy(np.int64)
            pos = np.searchsorted(v_ts, c_ts, side="right") - 1
            ok = pos >= 0
            out_view[ok] = v_id[pos[ok]].astype(np.float64)
        return pd.DataFrame({
            "click_id": clicks["event_id"].to_numpy(np.int64),
            "user_id": clicks["user_id"].to_numpy(np.int64),
            "click_epoch": c_ts // 1_000_000,
            "view_id": out_view})

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


ASOF_JOIN_SQL = """
SELECT c.event_id AS click_id, c.user_id,
       CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch,
       v.view_id
FROM events c
LEFT JOIN LATERAL (
  SELECT CAST(v.event_id AS DOUBLE) AS view_id FROM events v
  WHERE v.user_id = c.user_id AND v.event_type = 'view' AND v.ts <= c.ts
  ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
) v ON TRUE
WHERE c.event_type = 'click'
"""


def sliding_window_counts(sf_dir: str):
    """Sliding-window aggregate (width 30 min, hop 15 min) — expressed
    as a window-assignment flat-map (each event lands in exactly two
    windows) followed by a plain groupby aggregate; no windowing
    primitive needed."""
    ds = _read(sf_dir, "events", ["ts", "value"])
    hop_us = 900 * 1_000_000

    def assign(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        k = ts // hop_us
        win = np.concatenate([k * 900, (k - 1) * 900])
        vals = np.tile(t["value"].to_numpy(zero_copy_only=False), 2)
        return pa.table({"win_epoch": pa.array(win, pa.int64()),
                         "value": pa.array(vals, pa.float64())})

    out = (ds.map_batches(assign, batch_format="pyarrow")
           .groupby("win_epoch")
           .aggregate(Count(alias_name="n_events"),
                      Sum("value", alias_name="sum_value_c")))
    return _fixed_point(out, {"sum_value_c": 2})


SLIDING_WINDOW_SQL = """
SELECT win_epoch, count(*) AS n_events,
       CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_c
FROM (
  SELECT CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 AS win_epoch, value
  FROM events
  UNION ALL
  SELECT (CAST(floor(epoch(ts) / 900) AS BIGINT) - 1) * 900, value
  FROM events
)
GROUP BY win_epoch
"""


def range_join_orders(sf_dir: str):
    """Range join (bucketed-band composition): pair each order with the
    price band it falls into. Bands are a small broadcast side; the
    'join' is a vectorized searchsorted per batch — the standard scale
    pattern for interval joins against a small dimension."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    edges = np.array([0.0, 50_000, 100_000, 200_000, 400_000, 1e18])
    names = ["xs", "s", "m", "l", "xl"]
    edges_ref = ray.put((edges, names))

    def band(t: pa.Table) -> pa.Table:
        e, nm = ray.get(edges_ref)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(e, p, side="right") - 1
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "band": pa.array([nm[i] for i in idx], pa.string())})

    return orders.map_batches(band, batch_format="pyarrow")


RANGE_JOIN_SQL = """
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 400000 THEN 'xl'
            WHEN o_totalprice >= 200000 THEN 'l'
            WHEN o_totalprice >= 100000 THEN 'm'
            WHEN o_totalprice >= 50000  THEN 's'
            ELSE 'xs' END AS band
FROM orders
"""


def approx_distinct_users(sf_dir: str):
    """HyperLogLog approximate distinct users per event_type
    (functions/sketch.py): per-batch partial registers, commutative max
    merge — the distributed-sketch shape. Rows-only check (approximate);
    accuracy asserted in tests (±5% vs exact at p=12)."""
    from rendler_ray.functions.sketch import approx_distinct

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return approx_distinct(ds, key_col="event_type", val_col="user_id")


def approx_percentiles_events(sf_dir: str):
    """Approximate p50/p90/p99 of event value via the two-pass
    fixed-width histogram sketch (functions/sketch.py::approx_quantiles)
    — the unbounded-value-cardinality fallback to the exact
    value-histogram percentile (percentile_order_values); error bound
    (max-min)/2^14, accuracy-tested. Deterministic (integer histogram
    merge); rows-only (approximate)."""
    from rendler_ray.functions.sketch import approx_quantiles

    ds = _read(sf_dir, "events", ["value"])
    return approx_quantiles(ds, "value", [50, 90, 99])


def approx_percentiles_by_type(sf_dir: str):
    """Per-event-type approximate p50/p90/p99 of value (grouped
    histogram sketch, functions/sketch.py::approx_quantiles_by): group
    ranges fold through one groupby and broadcast; per-group error ≤
    (group range)/2^12, accuracy-tested. Deterministic; rows-only
    (approximate)."""
    from rendler_ray.functions.sketch import approx_quantiles_by

    ds = _read(sf_dir, "events", ["event_type", "value"])
    return approx_quantiles_by(ds, "event_type", "value", [50, 90, 99])


def heavy_hitter_users(sf_dir: str):
    """Exact frequent items by the two-pass Misra–Gries pattern
    (functions/sketch.py::heavy_hitters): per-batch bounded candidate
    summaries → exact recount of candidates only → threshold. Output
    provably equals the SQL GROUP BY/HAVING — sketch fan-out with an
    exact oracle."""
    from rendler_ray.functions.sketch import heavy_hitters

    ds = _read(sf_dir, "events", ["user_id"])
    return heavy_hitters(ds, "user_id", eps=0.008)


HEAVY_HITTERS_SQL = """
SELECT user_id, count(*) AS n FROM events GROUP BY user_id
HAVING count(*) >=
  CAST(ceil(0.008 * (SELECT count(*) FROM events)) AS BIGINT)
"""


def sample_docs_deterministic(sf_dir: str):
    """Deterministic ~10% Bernoulli sample by content-independent hash
    (md5 of the key + salt): reproducible across runs AND expressible in
    SQL — the scale-safe way to sample (no global shuffle, no RNG
    state). Keeps rows whose first 2 hex digits of md5(doc_id||'-s1')
    are < '1a' (26/256 ≈ 10.2%)."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id"])

    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        mask = pa.array([
            hashlib.md5(f"{i}-s1".encode()).hexdigest()[:2] < "1a"
            for i in ids])
        return t.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


SAMPLE_DOCS_SQL = """
SELECT doc_id FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR) || '-s1'), 1, 2) < '1a'
"""


def sample_docs_exact_k(sf_dir: str, k: int = 100):
    """EXACTLY-k uniform sample without replacement — the reservoir
    shape a Bernoulli sample can't give (its size is binomial, not k) —
    as a distributed TOP-K on a seeded integer mix, never a global
    sort: the k globally-smallest mix keys ARE a uniform k-subset.
    Per-batch partial top-k (each batch keeps its own k smallest, so
    every global winner survives its batch), then one constant-group
    ``map_groups`` finisher over the ≤ k·n_blocks survivors ranks the
    winners — no driver pull, no all-to-all of the corpus. The mix is
    int64-safe multiplicative-xorshift (a sibling of the epoch-shuffle
    mix with an independent multiplier) reproduced verbatim by the SQL
    oracle; doc_id tie-breaks both sides."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        assert not len(d) or int(d.max()) < (1 << 31)  # see epoch mix
        k1 = (d * 2246822519) % 2147483648
        k2 = (np.bitwise_xor(k1, k1 // 4096) * 2246822519) % 2147483648
        key = np.bitwise_xor(k2, k2 // 4096)
        if len(d) > k:
            order = np.lexsort((d, key))[:k]
            d, key = d[order], key[order]
        return pa.table({"g": pa.array(np.zeros(len(d), np.int64)),
                         "doc_id": pa.array(d, pa.int64()),
                         "sample_key": pa.array(key, pa.int64())})

    winners = ds.map_batches(partial, batch_format="pyarrow")

    def fin(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sample_key", "doc_id"]).head(k)
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "sample_key": g["sample_key"].to_numpy(np.int64),
            "sample_rank": np.arange(1, len(g) + 1, dtype=np.int64)})

    return winners.groupby("g").map_groups(fin, batch_format="pandas")


SAMPLE_EXACT_K_SQL = """
WITH k1 AS (SELECT doc_id,
                   (doc_id * 2246822519) % 2147483648 AS k1
            FROM documents),
k2 AS (SELECT doc_id,
              (xor(k1, k1 // 4096) * 2246822519) % 2147483648 AS k2
       FROM k1),
key AS (SELECT doc_id, xor(k2, k2 // 4096) AS sample_key FROM k2)
SELECT doc_id, sample_key,
       row_number() OVER (ORDER BY sample_key, doc_id) AS sample_rank
FROM key
QUALIFY sample_rank <= 100
"""


def stratified_sample_docs(sf_dir: str):
    """Stratified sampling: exactly k=20 docs per ``source`` stratum,
    chosen by deterministic hash rank (md5 of doc_id + salt) — the
    reproducible, shuffle-once form of per-group reservoir sampling
    (every worker/run picks the same rows; no RNG state, no second
    pass). groupby(source) co-locates each stratum; ties impossible
    (md5 of distinct ids)."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        h = g["doc_id"].map(
            lambda i: hashlib.md5(f"{i}-s2".encode()).hexdigest())
        return g.assign(_h=h).sort_values("_h").head(20)[
            ["doc_id", "source"]]

    return ds.groupby("source").map_groups(topk, batch_format="pandas")


STRATIFIED_SAMPLE_SQL = """
SELECT doc_id, source FROM documents
QUALIFY row_number() OVER (
  PARTITION BY source
  ORDER BY md5(CAST(doc_id AS VARCHAR) || '-s2')) <= 20
"""


def weighted_sample_docs(sf_dir: str):
    """Deterministic weighted sample without replacement (the priority-
    sampling shape, Duffield et al. JACM'07): priority = hash / weight,
    keep the k smallest — inclusion probability ∝ weight (here n_chars)
    at small sampling rates, fully reproducible across runs and
    parallelism, and SQL-expressible (no RNG state, no rejection pass).
    The hash is the first 15 md5 hex digits of the salted key (< 2^60,
    exact BIGINT on both sides); integer floor-division keeps the
    comparison exact. Each batch pre-prunes to its local top-k so the
    global sort+limit sees ≤ k rows per block (scale shape)."""
    import hashlib

    k = 100
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def prio(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        w = t["n_chars"].to_numpy(zero_copy_only=False)
        h = np.array(
            [int(hashlib.md5(f"{i}-w1".encode()).hexdigest()[:15], 16)
             for i in ids], dtype=np.int64)
        p = h // np.maximum(w, 1)
        t = t.append_column("priority", pa.array(p, pa.int64()))
        idx = np.lexsort((ids, p))[:k]
        return t.take(pa.array(np.sort(idx)))

    return (ds.map_batches(prio, batch_format="pyarrow")
            .sort(["priority", "doc_id"]).limit(k))


WEIGHTED_SAMPLE_SQL = """
WITH pr AS (
  SELECT doc_id, n_chars,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-w1'), 1, 15)
              AS BIGINT) // greatest(n_chars, 1) AS priority
  FROM documents)
SELECT doc_id, n_chars, priority FROM pr
ORDER BY priority, doc_id LIMIT 100
"""


def percentile_order_values(sf_dir: str):
    """Exact per-group percentiles (p50/p90/p99 of order value in cents)
    WITHOUT per-group row collection: fixed-point → groupby((group,
    value)) count — the all-to-all carries one row per DISTINCT value,
    not per row — then a tiny per-group sorted cumsum picks rank
    ceil(p·n/100), computed in pure integer arithmetic ((p·n + 99)//100)
    so both sides agree bit-for-bit (no float q·n corner cases). The
    value-histogram exact-quantile shape; t-digest is the fallback when
    value cardinality is unbounded."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    cents = _fixed_point(ds, {"o_totalprice": 2}).map_batches(
        lambda t: t.rename_columns(["o_orderpriority", "cents"]),
        batch_format="pyarrow")
    counts = cents.groupby(["o_orderpriority", "cents"]).aggregate(
        Count(alias_name="n"))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents")
        v = g["cents"].to_numpy(np.int64)
        cum = np.cumsum(g["n"].to_numpy(np.int64))
        n = int(cum[-1])
        out = {"o_orderpriority": [g["o_orderpriority"].iloc[0]],
               "n_orders": [n]}
        for p, col in ((50, "p50_c"), (90, "p90_c"), (99, "p99_c")):
            rank = (p * n + 99) // 100
            out[col] = [int(v[np.searchsorted(cum, rank)])]
        return pd.DataFrame(out)

    return (counts.groupby("o_orderpriority")
            .map_groups(pick, batch_format="pandas")
            .select_columns(["o_orderpriority", "n_orders",
                             "p50_c", "p90_c", "p99_c"]))


PERCENTILE_SQL = """
WITH c AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders)
SELECT o_orderpriority, count(*) AS n_orders,
  (list(cents ORDER BY cents))[(50 * count(*) + 99) // 100] AS p50_c,
  (list(cents ORDER BY cents))[(90 * count(*) + 99) // 100] AS p90_c,
  (list(cents ORDER BY cents))[(99 * count(*) + 99) // 100] AS p99_c
FROM c GROUP BY o_orderpriority
"""


def rollup_revenue(sf_dir: str):
    """GROUP BY ROLLUP(priority, status): the detail level is the only
    groupby that touches the base table; the two rollup levels
    re-aggregate the SMALL detail result (the standard
    rollup-from-finest-level optimization — at 100 TB the base table is
    shuffled once, not once per level). 'ALL' sentinels instead of SQL
    NULLs keep the value-hash compare total-order-safe; prices are
    fixed-pointed to int64 cents PER ROW before any sum (the ALL/ALL
    row sums the whole table, where double accumulation-order drift can
    reach the half-cent rounding grain)."""
    ds = _read(sf_dir, "orders",
               ["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def _all(col):
        def fn(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index(col)
            return t.set_column(
                i, col, pa.array(["ALL"] * t.num_rows, pa.string()))
        return fn

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderpriority": t["o_orderpriority"],
                         "o_orderstatus": t["o_orderstatus"],
                         "price_c": _cents(t["o_totalprice"])})

    keys = ["o_orderpriority", "o_orderstatus"]
    aggs = (Sum("revenue_c", alias_name="revenue_c"),
            Sum("n_orders", alias_name="n_orders"))
    detail = (ds.map_batches(cents, batch_format="pyarrow")
              .groupby(keys)
              .aggregate(Sum("price_c", alias_name="revenue_c"),
                         Count(alias_name="n_orders"))).materialize()
    mid = (detail.map_batches(_all("o_orderstatus"), batch_format="pyarrow")
           .groupby(keys).aggregate(*aggs)).materialize()
    top = (mid.map_batches(_all("o_orderpriority"), batch_format="pyarrow")
           .groupby(keys).aggregate(*aggs))
    return detail.union(mid, top)


ROLLUP_SQL = """
SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_c,
       count(*) AS n_orders
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


def cube_revenue(sf_dir: str):
    """GROUP BY CUBE(priority, status) — the full grouping-set lattice
    (detail, each one-dim marginal, grand total). Same
    shuffle-the-base-once optimization as :func:`rollup_revenue`, and
    the same per-row cents fixed-pointing (the grand-total cell sums
    the whole table)."""
    ds = _read(sf_dir, "orders",
               ["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def _all(col):
        def fn(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index(col)
            return t.set_column(
                i, col, pa.array(["ALL"] * t.num_rows, pa.string()))
        return fn

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderpriority": t["o_orderpriority"],
                         "o_orderstatus": t["o_orderstatus"],
                         "price_c": _cents(t["o_totalprice"])})

    keys = ["o_orderpriority", "o_orderstatus"]
    aggs = (Sum("revenue_c", alias_name="revenue_c"),
            Sum("n_orders", alias_name="n_orders"))
    detail = (ds.map_batches(cents, batch_format="pyarrow")
              .groupby(keys)
              .aggregate(Sum("price_c", alias_name="revenue_c"),
                         Count(alias_name="n_orders"))).materialize()
    by_prio = (detail.map_batches(_all("o_orderstatus"),
                                  batch_format="pyarrow")
               .groupby(keys).aggregate(*aggs)).materialize()
    by_status = (detail.map_batches(_all("o_orderpriority"),
                                    batch_format="pyarrow")
                 .groupby(keys).aggregate(*aggs))
    total = (by_prio.map_batches(_all("o_orderpriority"),
                                 batch_format="pyarrow")
             .groupby(keys).aggregate(*aggs))
    return detail.union(by_prio, by_status, total)


CUBE_SQL = """
SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_c,
       count(*) AS n_orders
FROM orders
GROUP BY CUBE(o_orderpriority, o_orderstatus)
"""


def sessionize_events(sf_dir: str):
    """Sessionization — split each user's event stream into sessions at
    >30-min gaps; emits per-session aggregates. groupby(user) co-locates
    the stream; the per-group computation is vectorized diff/cumsum."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    gap_us = 30 * 60 * 1_000_000

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        new_sess = np.ones(len(g), dtype=np.int64)
        new_sess[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sess = np.cumsum(new_sess)
        df = pd.DataFrame({"user_id": g["user_id"].to_numpy(np.int64),
                           "session_id": sess,
                           "v": g["value"].to_numpy(np.float64),
                           "t": ts})
        out = df.groupby("session_id", sort=True).agg(
            user_id=("user_id", "first"), n_events=("v", "size"),
            start_epoch=("t", "min"), sum_value=("v", "sum")).reset_index()
        out["start_epoch"] = out["start_epoch"] // 1_000_000
        return out[["user_id", "session_id", "n_events", "start_epoch",
                    "sum_value"]]

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
    return _fixed_point(out, {"sum_value": 2}).map_batches(
        lambda t: t.rename_columns(
            ["user_id", "session_id", "n_events", "start_epoch",
             "sum_value_c"]), batch_format="pyarrow")


SESSIONIZE_SQL = """
WITH ordered AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS start_epoch,
       CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_c
FROM sess GROUP BY user_id, session_id
"""


def dedup_events_window(sf_dir: str):
    """Streaming windowed dedup (the at-ingest idempotency /
    debounce filter every event pipeline runs): an event is a duplicate
    — and dropped — iff ANOTHER event with the same (user_id,
    event_type) key precedes it within 1 hour. Bounded-stream shape:
    ``groupby(user_id)`` co-locates each key's stream once, the
    per-group check is one vectorized sort + diff (no per-event state
    store, no driver pass); at 100 TB the same op shards by key hash
    exactly like sessionization. Strict LAG semantics (vs the previous
    RAW event) so the SQL window oracle is exact; microsecond-integer
    comparison on both sides."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])
    win_us = 3600 * 1_000_000

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "ts", "event_id"],
                          kind="stable")
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        keep = np.ones(len(g), bool)
        if len(g) > 1:
            same = et[1:] == et[:-1]
            keep[1:] = ~same | (np.diff(ts) > win_us)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64)[keep],
            "user_id": g["user_id"].to_numpy(np.int64)[keep],
            "event_type": et[keep],
            "ts_us": ts[keep]})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pandas")


DEDUP_EVENTS_WINDOW_SQL = """
SELECT event_id, user_id, event_type,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us
FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS prev
      FROM events)
WHERE prev IS NULL OR ts - prev > INTERVAL 1 HOUR
"""


def running_total_events(sf_dir: str):
    """Per-user running total (the classic SUM OVER (PARTITION BY …
    ORDER BY … ROWS UNBOUNDED PRECEDING) window): groupby(user)
    co-locates each stream, the per-group cumsum is vectorized. Values
    fixed-point to cents BEFORE accumulating so the running sums are
    exact integers on both sides (a float prefix sum is reassociation-
    dependent — DuckDB's segment-tree windows would drift in the last
    ulps)."""
    ds = _fixed_point(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"]),
        {"value": 2})  # value now int64 cents (DuckDB round() semantics)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": g["user_id"].to_numpy(np.int64),
            "running_c": np.cumsum(g["value"].to_numpy(np.int64))})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pandas")


RUNNING_TOTAL_SQL = """
SELECT event_id, user_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_c
FROM events
"""


def moving_sum_events(sf_dir: str):
    """Bounded-frame window (ROWS BETWEEN 4 PRECEDING AND CURRENT ROW):
    per-user 5-event moving sum over cents. Exact integers both sides —
    the cumsum-difference c[i] − c[i−5] is the vectorized form."""
    ds = _fixed_point(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"]),
        {"value": 2})

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        c = np.cumsum(g["value"].to_numpy(np.int64))
        w = c.copy()
        w[5:] = c[5:] - c[:-5]
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": g["user_id"].to_numpy(np.int64),
            "w5_sum_c": w})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pandas")


MOVING_SUM_SQL = """
SELECT event_id, user_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS w5_sum_c
FROM events
"""


def trailing_hour_spend(sf_dir: str):
    """Time-based window frame (RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
    AND CURRENT ROW): for each event, the user's spend over the
    trailing hour INCLUDING ties at the same timestamp — the RANGE
    flavor, distinct from the ROWS moving sum. Per user: one sort, a
    prefix-sum, and two searchsorteds (window start by ts-1h, window
    end past all same-ts rows, matching SQL RANGE peer semantics)."""
    ds = _fixed_point(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"]),
        {"value": 2})

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((g["event_id"].to_numpy(), us))
        us = us[order]
        v = g["value"].to_numpy(np.int64)[order]
        eid = g["event_id"].to_numpy(np.int64)[order]
        cum = np.concatenate([[0], np.cumsum(v)])
        lo = np.searchsorted(us, us - 3_600_000_000, side="left")
        hi = np.searchsorted(us, us, side="right")  # all ts-peers
        return pd.DataFrame({
            "event_id": eid,
            "user_id": g["user_id"].iloc[0],
            "hour_spend_c": cum[hi] - cum[lo]})

    return (ds.groupby("user_id")
            .map_groups(per_user, batch_format="pandas")
            .select_columns(["event_id", "user_id", "hour_spend_c"]))


TRAILING_HOUR_SQL = """
SELECT event_id, user_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
         AS BIGINT) AS hour_spend_c
FROM events
"""


def rank_orders_in_priority(sf_dir: str):
    """RANK() with ties (competition ranking — equal values share a
    rank, the next rank skips): per-priority rank of order value. rank
    = 1 + #strictly-greater, vectorized per group with one sort + one
    searchsorted; cents keys so both sides rank identical integers."""
    ds = _fixed_point(
        _read(sf_dir, "orders",
              ["o_orderkey", "o_orderpriority", "o_totalprice"]),
        {"o_totalprice": 2}).map_batches(
        lambda t: t.rename_columns(
            ["o_orderkey", "o_orderpriority", "cents"]),
        batch_format="pyarrow")

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        v = g["cents"].to_numpy(np.int64)
        vs = np.sort(v)
        rnk = 1 + (len(v) - np.searchsorted(vs, v, side="right"))
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
            "o_orderpriority": g["o_orderpriority"].to_numpy(),
            "cents": v, "rnk": rnk.astype(np.int64)})

    return ds.groupby("o_orderpriority").map_groups(
        rank, batch_format="pandas")


RANK_ORDERS_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       CAST(rank() OVER (PARTITION BY o_orderpriority
            ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC)
            AS BIGINT) AS rnk
FROM orders
"""


def zscore_outlier_events(sf_dir: str):
    """Per-user anomaly detection: events whose value sits more than 2
    population standard deviations from the user's mean. The test is
    done in EXACT integer arithmetic — z² > 4 ⟺ (n·v − s)² >
    4·(n·ssq − s²) over cents — no division or sqrt, so the DuckDB
    HUGEINT oracle agrees bit-for-bit (a float z-score would drift in
    the last ulps). One groupby(user) co-locates each stream; the
    per-group test runs on arbitrary-precision Python ints (group
    moments overflow int64 only past sf≈1, but exactness is the
    point)."""
    ds = _fixed_point(
        _read(sf_dir, "events", ["event_id", "user_id", "value"]),
        {"value": 2})

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy(np.int64).astype(object)
        n = len(v)
        s = v.sum()
        ssq = (v * v).sum()
        lhs = (n * v - s) ** 2
        keep = (lhs > 4 * (n * ssq - s * s)).astype(bool)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64)[keep],
            "user_id": g["user_id"].to_numpy(np.int64)[keep],
            "value_c": v[keep].astype(np.int64)})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pandas")


ZSCORE_OUTLIER_SQL = """
WITH c AS (
  SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS v
  FROM events),
st AS (
  SELECT user_id, count(*) AS n, sum(v) AS s,
         sum(CAST(v AS HUGEINT) * v) AS ssq
  FROM c GROUP BY user_id)
SELECT c.event_id, c.user_id, c.v AS value_c
FROM c JOIN st USING (user_id)
WHERE (CAST(n AS HUGEINT) * c.v - s) * (CAST(n AS HUGEINT) * c.v - s)
      > 4 * (CAST(n AS HUGEINT) * ssq - CAST(s AS HUGEINT) * s)
"""


def pivot_event_values(sf_dir: str):
    """Pivot (long → wide): per-user columns of summed value by event
    type. One map_batches pass does the conditional partial pivot
    (vectorized cents sums per type — the base table is read once and
    shuffles ≤ users×1 rows), then a native groupby(user).sum folds the
    partials. SQL oracle = conditional aggregation (the portable PIVOT
    form)."""
    types = ["click", "error", "purchase", "signup", "view"]
    ds = _fixed_point(
        _read(sf_dir, "events", ["user_id", "event_type", "value"]),
        {"value": 2})  # int64 cents, DuckDB round() semantics

    def partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        cents = t["value"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"user_id": u})
        for ty in types:
            df[f"sum_{ty}_c"] = np.where(et == ty, cents, 0)
        out = df.groupby("user_id", sort=False).sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    aggs = [Sum(f"sum_{ty}_c", alias_name=f"sum_{ty}_c") for ty in types]
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("user_id").aggregate(*aggs))


PIVOT_SQL = """
SELECT user_id,
  CAST(sum(CASE WHEN event_type = 'click'
    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
    AS sum_click_c,
  CAST(sum(CASE WHEN event_type = 'error'
    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
    AS sum_error_c,
  CAST(sum(CASE WHEN event_type = 'purchase'
    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
    AS sum_purchase_c,
  CAST(sum(CASE WHEN event_type = 'signup'
    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
    AS sum_signup_c,
  CAST(sum(CASE WHEN event_type = 'view'
    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
    AS sum_view_c
FROM events GROUP BY user_id
"""


def ann_ivf_topk(sf_dir: str):
    """IVF-style partitioned ANN (the scale path beyond brute force):
    deterministic k-means centroids from a hash-sampled subset →
    broadcast → partition assignment per batch → probe the top-P
    partitions per query. Approximate: rows-only here; recall vs brute
    force is asserted in tests."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    queries = _query_vecs(sf_dir, 8)
    return F_ann.ivf_topk(ds, queries, k=10, n_lists=16, n_probe=6)


def ann_pq_topk(sf_dir: str):
    """Product-quantization ANN (Jégou TPAMI'11) — the memory-bound
    100-TB scan shape: each 64-dim vector compresses to 16 codebook
    bytes (32× vs float64), query scoring is 16 ADC table gathers
    instead of a full-precision matmul, and only the per-batch ADC
    survivors (4k rows) get an exact cosine re-rank — so the emitted
    scores are true cosines and recall loss comes only from cross-batch
    prefilter misses (measured 1.0 at both test scales). Codebooks
    train on a deterministic driver sample and broadcast once; ONE
    stateless encode+score pass; the shared fixed-point top-k reduce.
    Approximate by construction: golden-pinned, recall vs brute force
    asserted in tests."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    queries = _query_vecs(sf_dir, 8)
    return F_ann.pq_topk(ds, queries, k=10, m=16, ks=64)


def semantic_decontam_docs(sf_dir: str):
    """Embedding-space benchmark DECONTAMINATION — the modern
    complement to n-gram ``contamination_check_docs`` (paraphrased eval
    leakage that token overlap misses): flag every corpus vector whose
    cosine similarity to ANY benchmark vector (vec_id < 16 = the
    held-out eval set) reaches 0.3. ONE stateless map pass at any
    corpus size: the benchmark matrix broadcasts once via ``ray.put``
    (eval sets are tiny), each batch does a single matmul against it —
    no shuffle, no join. Scores fixed-point e6 (the ann_topk rounding
    convention) so the DuckDB ``list_cosine_similarity`` oracle is
    hash-exact. Emits (vec_id, n_matches, max_sim_e6) per flagged
    vector."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qv = _query_vecs(sf_dir, 16)
    qm = F_ann._normalize(np.stack([qv[i] for i in sorted(qv)]))
    qref = ray.put(qm)

    def flag(t: pa.Table) -> pa.Table:
        empty = pa.table({"vec_id": pa.array([], pa.int64()),
                          "n_matches": pa.array([], pa.int64()),
                          "max_sim_e6": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        corp = ids >= 16
        if not corp.any():
            return empty
        m = F_ann._normalize(F_ann.batch_to_matrix(t))[corp]
        se6 = np.round((ray.get(qref) @ m.T) * 1e6).astype(np.int64)
        nm = (se6 >= 300_000).sum(axis=0).astype(np.int64)
        mx = se6.max(axis=0)
        hit = nm > 0
        return pa.table({
            "vec_id": pa.array(ids[corp][hit], pa.int64()),
            "n_matches": pa.array(nm[hit], pa.int64()),
            "max_sim_e6": pa.array(mx[hit], pa.int64())})

    return ds.map_batches(flag, batch_format="pyarrow")


SEMANTIC_DECONTAM_SQL = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id < 16),
s AS (SELECT e.vec_id,
             CAST(round(list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]),
                 CAST(q.qv AS DOUBLE[])) * 1000000) AS BIGINT) AS sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id >= 16)
SELECT vec_id,
       CAST(count(*) FILTER (WHERE sim >= 300000) AS BIGINT)
         AS n_matches,
       CAST(max(sim) AS BIGINT) AS max_sim_e6
FROM s GROUP BY vec_id
HAVING count(*) FILTER (WHERE sim >= 300000) > 0
"""


def kmeans_embedding_clusters(sf_dir: str):
    """Distributed k-means over the embeddings table (iterative
    broadcast-centroids / partial-sums algorithm — the canonical
    multi-pass Dataset loop). Deterministic init ⇒ stable cluster
    sizes; rows-only check (iterative, not SQL-expressible)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return F_ann.kmeans_cluster_sizes(ds, n_clusters=8, iters=6)


