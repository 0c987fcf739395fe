

def concurrent_sessions_peak(sf_dir: str, k: int = 10):
    """SWEEP-LINE interval concurrency: the k moments of peak
    simultaneous sessions — the capacity-planning number an ops
    dashboard reads (sessions = the 30-min-gap rule shared with
    :func:`sessionize_events`). Each session contributes +1 at its
    first event and −1 at its last; the level after each boundary is
    the running sum over the global (t, +1-before-−1, user) order.

    Scale shape — a GLOBAL running sum with NO global sort: boundaries
    bucket by time RANGE (256 order-preserving buckets), pass 1 folds
    per-bucket delta sums into exclusive prefix offsets (256-row
    driver state, the pack.py two-pass pattern), pass 2 computes each
    bucket's within-order cumsum + base AND its local top-k in
    parallel; the driver merges ≤ 256·k candidate rows."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    gap_us = 30 * 60 * 1_000_000

    def bounds(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        new = np.ones(len(g), bool)
        new[1:] = np.diff(ts) > gap_us
        sid = np.cumsum(new)
        df = pd.DataFrame({"sid": sid, "t": ts})
        iv = df.groupby("sid")["t"].agg(["min", "max"])
        u = np.int64(g["user_id"].iloc[0])
        return pd.DataFrame({
            "t": np.concatenate([iv["min"].to_numpy(np.int64),
                                 iv["max"].to_numpy(np.int64)]),
            "delta": np.concatenate([
                np.ones(len(iv), np.int64),
                -np.ones(len(iv), np.int64)]),
            "user_id": np.full(2 * len(iv), u, np.int64)})

    b = (ds.groupby("user_id").map_groups(bounds, batch_format="pandas")
         .materialize())
    agg = b.aggregate(Min("t", alias_name="lo"),
                      Max("t", alias_name="hi"), Count(alias_name="n"))
    if not (agg["n"] or 0):
        return pa.table({"epoch_us": pa.array([], pa.int64()),
                         "user_id": pa.array([], pa.int64()),
                         "level": pa.array([], pa.int64())})
    lo, hi = int(agg["lo"]), int(agg["hi"])
    span = hi - lo + 1

    def bucketed(t: pa.Table) -> pa.Table:
        tt = t["t"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((tt - lo) * 256 // span, pa.int64()))

    kd = b.map_batches(bucketed, batch_format="pyarrow").materialize()
    bsum = {int(r["bucket"]): int(r["s"])
            for r in kd.groupby("bucket")
            .aggregate(Sum("delta", alias_name="s")).take_all()}
    base, acc = {}, 0
    for bk in range(256):
        base[bk] = acc
        acc += bsum.get(bk, 0)
    bref = ray.put(base)

    def within(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", "delta", "user_id"],
                          ascending=[True, False, True], kind="stable")
        lvl = np.cumsum(g["delta"].to_numpy(np.int64)) \
            + ray.get(bref)[int(g["bucket"].iloc[0])]
        out = pd.DataFrame({"epoch_us": g["t"].to_numpy(np.int64),
                            "user_id": g["user_id"].to_numpy(np.int64),
                            "level": lvl})
        return out.sort_values(["level", "epoch_us", "user_id"],
                               ascending=[False, True, True],
                               kind="stable").head(k)

    cand = (kd.groupby("bucket").map_groups(within,
                                            batch_format="pandas"))
    rows = []
    for bt in cand.iter_batches(batch_size=None, batch_format="pyarrow"):
        rows.extend(zip(bt["level"].to_pylist(),
                        bt["epoch_us"].to_pylist(),
                        bt["user_id"].to_pylist()))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    rows = rows[:k]
    return pa.table({
        "epoch_us": pa.array([r[1] for r in rows], pa.int64()),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "level": pa.array([r[0] for r in rows], pa.int64())})


CONCURRENT_SESSIONS_SQL = """
WITH ordered AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, epoch_us(ts) AS t,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered),
iv AS (SELECT user_id, sid, min(t) AS st, max(t) AS en
       FROM sess GROUP BY user_id, sid),
bnd AS (SELECT user_id, st AS t, 1 AS delta FROM iv
        UNION ALL SELECT user_id, en, -1 FROM iv),
r AS (SELECT t, user_id, delta,
             sum(delta) OVER (ORDER BY t, delta DESC, user_id
                              ROWS UNBOUNDED PRECEDING) AS level
      FROM bnd)
SELECT CAST(t AS BIGINT) AS epoch_us,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(level AS BIGINT) AS level
FROM r
QUALIFY row_number() OVER (ORDER BY level DESC, t, user_id) <= 10
"""


def customers_all_priorities(sf_dir: str):
    """RELATIONAL DIVISION (the "for-all" query shape): customers
    whose orders span EVERY distinct order priority — the universal
    quantifier SQL expresses as count(DISTINCT)=total, and the one
    classic relational operator the registry lacked. Plan: per-batch
    distinct (cust, priority) pairs → one distinct exchange → a
    grouped COUNT per customer on the sorted-agg fast path → a
    stateless filter against the broadcast divisor cardinality (a
    bounded distinct fold — priorities, not customers)."""
    from rendler_ray.functions.groupagg import sorted_group_agg

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    prios: set[str] = set()
    for bt in (ds.map_batches(
            lambda t: pa.table({"p": pc.unique(
                t["o_orderpriority"].combine_chunks())}),
            batch_format="pyarrow")
            .iter_batches(batch_size=None, batch_format="pyarrow")):
        prios.update(bt["p"].to_pylist())
    plist = sorted(prios)
    pidx = {p: i for i, p in enumerate(plist)}
    n_p = len(plist)
    assert n_p <= 63

    def pack(t: pa.Table) -> pa.Table:
        u = t["o_custkey"].to_numpy(zero_copy_only=False)
        ix = np.array([pidx[x] for x in
                       t["o_orderpriority"].to_numpy(
                           zero_copy_only=False)], np.int64)
        return pa.table({"pk": pa.array(np.unique(u * 64 + ix),
                                        pa.int64())})

    distinct = sorted_group_agg(
        ds.map_batches(pack, batch_format="pyarrow"),
        "pk", [("pk", "count", "x")])
    counts = sorted_group_agg(
        distinct.map_batches(
            lambda t: pa.table({
                "o_custkey": pa.array(
                    t["pk"].to_numpy(zero_copy_only=False) // 64,
                    pa.int64()),
                "one": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        "o_custkey", [("one", "sum", "np")])
    return counts.map_batches(
        lambda t: t.filter(pc.equal(t["np"], n_p)).select(["o_custkey"]),
        batch_format="pyarrow")


REL_DIVISION_SQL = """
SELECT o_custkey
FROM (SELECT o_custkey,
             count(DISTINCT o_orderpriority) AS np
      FROM orders GROUP BY o_custkey)
WHERE np = (SELECT count(DISTINCT o_orderpriority) FROM orders)
"""


def dup_weight_docs(sf_dir: str):
    """Duplicate-aware TRAINING WEIGHTS (the SlimPajama/D4 practice of
    down-weighting instead of dropping): every doc annotated with its
    exact-duplicate group size n, so a trainer can weight the example
    1/n — emitted as the integer denominator (no float crosses the
    boundary; unique docs get 1). One hash-partitioned exchange on the
    md5 fingerprint (the exact-dedup key) with a vectorized per-group
    size broadcast back onto each member row."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "fp": pa.array([hashlib.md5(x.encode()).hexdigest()
                            for x in t["text"].to_pylist()],
                           pa.string())})

    def size_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "dup_group_n": np.full(len(g), len(g), np.int64)})

    return (ds.map_batches(fp, batch_format="pyarrow")
            .groupby("fp").map_groups(size_group, batch_format="pandas"))


DUP_WEIGHT_SQL = """
SELECT doc_id,
       CAST(count(*) OVER (PARTITION BY md5(text)) AS BIGINT)
         AS dup_group_n
FROM documents
"""


def markov_next_type_eval(sf_dir: str):
    """Markov NEXT-EVENT prediction eval: fit first-order transition
    counts on the train split (even event_id), predict each test-split
    transition's next type as the train argmax row, and report
    per-from-type accuracy — the composition of the transition-matrix
    op with a held-out eval that turns "we computed a matrix" into "we
    measured what it buys". Deterministic argmax ties break on
    (count desc, type asc); accuracy is the guarded e6 truncating
    division. Both per-user pair passes are the
    :func:`event_transition_matrix` shape (vectorized per-group LAG,
    ≤ types² combiner rows); everything after is bounded driver
    state. Test from-types unseen in train are dropped (inner join
    semantics, mirrored in SQL)."""
    ds = _read(sf_dir, "events",
               ["user_id", "event_id", "ts", "event_type"])

    def pair_counts(parity: int):
        def pairs(g: pd.DataFrame) -> pd.DataFrame:
            g = g[g["event_id"] % 2 == parity]
            g = g.sort_values(["ts", "event_id"])
            et = g["event_type"].to_numpy()
            if len(et) < 2:
                return pd.DataFrame({
                    "from_type": pd.Series([], dtype=object),
                    "to_type": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64)})
            return (pd.DataFrame({"from_type": et[:-1],
                                  "to_type": et[1:]})
                    .groupby(["from_type", "to_type"], sort=False)
                    .size().reset_index(name="n"))

        fold: dict[tuple[str, str], int] = {}
        for bt in (ds.groupby("user_id")
                   .map_groups(pairs, batch_format="pandas")
                   .iter_batches(batch_size=None,
                                 batch_format="pyarrow")):
            for f, t_, n in zip(bt["from_type"].to_pylist(),
                                bt["to_type"].to_pylist(),
                                bt["n"].to_pylist()):
                fold[(f, t_)] = fold.get((f, t_), 0) + int(n)
        return fold

    train = pair_counts(0)
    test = pair_counts(1)
    pred: dict[str, str] = {}
    for (f, t_), n in sorted(train.items()):  # t asc → first-max wins
        cur = pred.get(f)
        if cur is None or n > train[(f, cur)]:
            pred[f] = t_
    rows = []
    for f in sorted({f for f, _ in test} & set(pred)):
        nt = sum(n for (ff, _), n in test.items() if ff == f)
        nc = test.get((f, pred[f]), 0)
        rows.append((f, pred[f], nc, nt, 10**6 * nc // nt))
    return pa.table({
        "from_type": pa.array([r[0] for r in rows], pa.string()),
        "pred_type": pa.array([r[1] for r in rows], pa.string()),
        "n_correct": pa.array([r[2] for r in rows], pa.int64()),
        "n_total": pa.array([r[3] for r in rows], pa.int64()),
        "acc_e6": pa.array([r[4] for r in rows], pa.int64())})


MARKOV_EVAL_SQL = """
WITH tr AS (SELECT event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events WHERE event_id % 2 = 0),
tc AS (SELECT prev, event_type AS t, count(*) AS n
       FROM tr WHERE prev IS NOT NULL GROUP BY prev, t),
pred AS (SELECT prev, t AS pred_type FROM tc
         QUALIFY row_number() OVER (PARTITION BY prev
                                    ORDER BY n DESC, t) = 1),
te AS (SELECT event_type,
              lag(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev
       FROM events WHERE event_id % 2 = 1),
tec AS (SELECT prev, event_type AS t, count(*) AS n
        FROM te WHERE prev IS NOT NULL GROUP BY prev, t),
agg AS (SELECT tec.prev AS from_type, p.pred_type,
               CAST(COALESCE(sum(CASE WHEN tec.t = p.pred_type
                                      THEN tec.n END), 0) AS BIGINT)
                 AS n_correct,
               CAST(sum(tec.n) AS BIGINT) AS n_total
        FROM tec JOIN pred p ON p.prev = tec.prev
        GROUP BY 1, 2)
SELECT from_type, pred_type, n_correct, n_total,
       1000000 * n_correct // n_total AS acc_e6
FROM agg
"""


def psi_score_halves(sf_dir: str, n_buckets: int = 10):
    """POPULATION STABILITY INDEX between doc_id-parity snapshot
    halves of the classifier-score distribution — the industry drift
    companion to :func:`ks_drift_by_source` (KS is the max CDF gap;
    PSI weights every bucket's shift, the credit-scoring convention
    with its 0.1 / 0.25 alert bands). Per-bucket output: EXACT counts
    plus the e6 fixed-point PSI term round(1e6·(p−q)·ln(p/q)) with
    Laplace +1 smoothing so empty buckets stay finite — the term is
    rounded per bucket BEFORE the integer sum (the token-entropy
    convention), and the float expression tree is mirrored verbatim
    in the SQL so both sides compute the identical doubles.

    Scale shape: global score bounds from one bounded min/max fold;
    a single shuffle-free pass then combines (bucket, parity) counts
    per batch — the fold is 2·n_buckets rows, never the corpus."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(flat.astype(object), return_inverse=True)
        w = _clf_weights(uniq)[inv]
        s = np.rint(np.bincount(par, weights=w, minlength=t.num_rows)) \
            .astype(np.int64)
        return pa.table({
            "parity": pa.array(
                t["doc_id"].to_numpy(zero_copy_only=False) % 2,
                pa.int64()),
            "clf_score": pa.array(s, pa.int64())})

    scored = ds.map_batches(score, batch_format="pyarrow").materialize()
    agg = scored.aggregate(Min("clf_score", alias_name="lo"),
                           Max("clf_score", alias_name="hi"))
    lo, hi = int(agg["lo"]), int(agg["hi"])
    width = max(hi - lo + 1, 1)  # zero-width guard: all rows bucket 0

    def bucketed(t: pa.Table) -> pa.Table:
        s = t["clf_score"].to_numpy(zero_copy_only=False)
        b = (s - lo) * n_buckets // width
        df = pd.DataFrame({
            "bucket": b,
            "parity": t["parity"].to_numpy(zero_copy_only=False),
            "c": 1})
        g = df.groupby(["bucket", "parity"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    ca = np.zeros(n_buckets, np.int64)
    cb = np.zeros(n_buckets, np.int64)
    for bt in (scored.map_batches(bucketed, batch_format="pyarrow")
               .iter_batches(batch_size=None, batch_format="pyarrow")):
        for b, p, c in zip(bt["bucket"].to_pylist(),
                           bt["parity"].to_pylist(),
                           bt["c"].to_pylist()):
            (ca if p == 0 else cb)[int(b)] += int(c)
    na, nb = int(ca.sum()), int(cb.sum())
    p = (ca + 1.0) / (na + n_buckets)
    q = (cb + 1.0) / (nb + n_buckets)
    term = np.rint((p - q) * np.log(p / q) * 1_000_000).astype(np.int64)
    return pa.table({
        "bucket": pa.array(np.arange(n_buckets, dtype=np.int64),
                           pa.int64()),
        "n_even": pa.array(ca, pa.int64()),
        "n_odd": pa.array(cb, pa.int64()),
        "psi_term_e6": pa.array(term, pa.int64())})


PSI_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
s AS (SELECT doc_id % 2 AS parity,
             CAST(sum((CAST('0x' || substr(md5(token), 1, 15) AS BIGINT)
                       % 1001) - 500) AS BIGINT) AS clf_score
      FROM tok GROUP BY doc_id),
r AS (SELECT min(clf_score) AS lo,
             greatest(max(clf_score) - min(clf_score) + 1, 1) AS width
      FROM s),
b AS (SELECT (clf_score - lo) * 10 // width AS bucket, parity
      FROM s, r),
g AS (SELECT gs.bucket,
             CAST(COALESCE(sum(CASE WHEN b.parity = 0
                                    THEN 1 END), 0) AS BIGINT) AS n_even,
             CAST(COALESCE(sum(CASE WHEN b.parity = 1
                                    THEN 1 END), 0) AS BIGINT) AS n_odd
      FROM generate_series(0, 9) AS gs(bucket)
      LEFT JOIN b ON b.bucket = gs.bucket
      GROUP BY gs.bucket),
t AS (SELECT CAST(sum(n_even) AS BIGINT) AS na,
             CAST(sum(n_odd) AS BIGINT) AS nb
      FROM g)
SELECT CAST(bucket AS BIGINT) AS bucket, n_even, n_odd,
       CAST(round(((CAST(n_even AS DOUBLE) + 1.0) / (na + 10)
                   - (CAST(n_odd AS DOUBLE) + 1.0) / (nb + 10))
                  * ln(((CAST(n_even AS DOUBLE) + 1.0) / (na + 10))
                       / ((CAST(n_odd AS DOUBLE) + 1.0) / (nb + 10)))
                  * 1000000) AS BIGINT) AS psi_term_e6
FROM g, t
"""


def monthly_revenue_growth(sf_dir: str):
    """Period-over-period reporting: monthly revenue with the
    previous-month value and the exact cents delta (LAG default 0 for
    the first month — both sides share the rule). The calendar
    aggregate is :func:`monthly_revenue`'s shuffle shape; the lag runs
    on the bounded months table folded on the driver (a decade is 120
    rows)."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        m = (t["o_orderdate"].to_numpy()
             .astype("datetime64[M]").astype(np.int64))
        return pa.table({"month": pa.array(m, pa.int64()),
                         "rev": _cents(t["o_totalprice"])})

    monthly = (ds.map_batches(part, batch_format="pyarrow")
               .groupby("month")
               .aggregate(Sum("rev", alias_name="revenue_c")))
    rows = []
    for bt in monthly.iter_batches(batch_size=None,
                                   batch_format="pyarrow"):
        rows.extend(zip(bt["month"].to_pylist(),
                        bt["revenue_c"].to_pylist()))
    rows.sort()
    months = [r[0] for r in rows]
    rev = [int(r[1]) for r in rows]
    prev = [0] + rev[:-1]
    return pa.table({
        "month": pa.array(months, pa.int64()),
        "revenue_c": pa.array(rev, pa.int64()),
        "prev_revenue_c": pa.array(prev, pa.int64()),
        "delta_c": pa.array([a - b for a, b in zip(rev, prev)],
                            pa.int64())})


MONTHLY_GROWTH_SQL = """
WITH m AS (
  SELECT (year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1
           AS month,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_c
  FROM orders GROUP BY month)
SELECT month, revenue_c,
       CAST(lag(revenue_c, 1, 0) OVER (ORDER BY month) AS BIGINT)
         AS prev_revenue_c,
       CAST(revenue_c - lag(revenue_c, 1, 0) OVER (ORDER BY month)
            AS BIGINT) AS delta_c
FROM m
"""


def crawl_host_budget_audit(sf_dir: str, budget: int = 50):
    """POLITENESS COMPLIANCE audit: per-(round, host) fetch counts of a
    budgeted crawl, read back from the crawl's own per-round
    checkpoint layout (``out/round=N/fetch.parquet`` — the audit
    consumes the resumable sink as a data source, which is exactly how
    an offline compliance job would run against a finished crawl). The
    invariant a regulator reads off this table — no (round, host) cell
    exceeds the crawl-delay budget — is pytest-asserted along with the
    budget actually BINDING somewhere (otherwise the audit proves
    nothing). Deterministic; rows-only (golden)."""
    import glob as _glob

    from rendler_ray.functions.canon import hosts_np
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    out_dir = os.path.join(_ckpt_root(),
                           f"budget-audit-{os.path.basename(sf_dir)}")
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                      seeds=default_seeds(1), max_depth=3,
                      host_budget_per_round=budget, out_dir=out_dir))

    legs = []
    for rdir in sorted(_glob.glob(os.path.join(out_dir, "round=*"))):
        rnum = int(os.path.basename(rdir).split("=", 1)[1])
        files = sorted(_glob.glob(os.path.join(rdir, "fetch.parquet",
                                               "*.parquet")))
        if not files:
            continue

        def count_hosts(t: pa.Table, rnum=rnum) -> pa.Table:
            h = hosts_np(t["url"].to_numpy(zero_copy_only=False))
            uh, cnt = np.unique(h, return_counts=True)
            return pa.table({
                "round": pa.array([rnum] * len(uh), pa.int64()),
                "host": pa.array(uh, pa.string()),
                "n_fetched": pa.array(cnt, pa.int64())})

        legs.append(rd.read_parquet(files, columns=["url"])
                    .map_batches(count_hosts, batch_format="pyarrow"))
    if not legs:
        return pa.table({"round": pa.array([], pa.int64()),
                         "host": pa.array([], pa.string()),
                         "n_fetched": pa.array([], pa.int64())})
    all_rounds = legs[0] if len(legs) == 1 else legs[0].union(*legs[1:])
    return (all_rounds.groupby(["round", "host"])
            .aggregate(Sum("n_fetched", alias_name="n_fetched")))


def crawl_depth_histogram(sf_dir: str):
    """Crawl FRONTIER GROWTH curve: pages and distinct hosts reached
    per BFS depth — the fan-out profile that sizes every round's
    resources (a depth whose page count explodes is where adaptive
    batch sizing and host budgets earn their keep). One pass over the
    flagship crawl's fetch table with per-batch (depth, host) dedup
    partials; the final fold is depths × hosts rows. Deterministic;
    rows-only (golden)."""
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=4))
    fetched = res.fetched.select_columns(["host", "depth"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "depth": t["depth"].to_numpy(zero_copy_only=False),
            "host": t["host"].to_numpy(zero_copy_only=False)})
        g = df.groupby(["depth", "host"], as_index=False).size()
        return pa.Table.from_pandas(g.rename(columns={"size": "n"}),
                                    preserve_index=False)

    pages: dict[int, int] = {}
    hosts: dict[int, set] = {}
    for bt in (fetched.map_batches(partial, batch_format="pyarrow")
               .groupby(["depth", "host"])
               .aggregate(Sum("n", alias_name="n"))
               .iter_batches(batch_size=None, batch_format="pyarrow")):
        for d, h, n in zip(bt["depth"].to_pylist(),
                           bt["host"].to_pylist(), bt["n"].to_pylist()):
            pages[int(d)] = pages.get(int(d), 0) + int(n)
            hosts.setdefault(int(d), set()).add(h)
    depths = sorted(pages)
    return pa.table({
        "depth": pa.array(depths, pa.int64()),
        "n_pages": pa.array([pages[d] for d in depths], pa.int64()),
        "n_hosts": pa.array([len(hosts[d]) for d in depths],
                            pa.int64())})


def cusum_changepoint_days(sf_dir: str, k2_num: int = 1,
                           k2_den: int = 1):
    """CUSUM CHANGEPOINT monitor over daily event volume — the
    level-shift detector that catches slow drifts the per-bucket
    z-test (:func:`event_anomaly_hours`) misses: the running sum of
    deviations wanders past its √d envelope only when the mean
    actually moved. Exact integers end-to-end: with daily counts c,
    D days, S = Σc, Q = Σc², the scaled deviation e_d = D·c_d − S sums
    to zero over the full window, and day d flags iff
    cusum_d² > k²·d·(D·Q − S²) (Var(e) = D·Q − S²; independence
    envelope). Default k² = 1 — a sensitive monitor tuned to the
    testdata's uniform month; raise for production alerting.

    Scale shape: one per-batch daily-count combine + one groupby to
    the bounded days table (a decade is 3653 rows); the running sum
    and the HUGEINT-squaring filter run on the driver in Python ints
    (the SQL mirror windows in HUGEINT)."""
    ds = _read(sf_dir, "events", ["ts"])

    def days(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        d = us // 86_400_000_000
        ud, cnt = np.unique(d, return_counts=True)
        return pa.table({"day": pa.array(ud, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    daily = (ds.map_batches(days, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("n", alias_name="c")))
    rows = []
    for bt in daily.iter_batches(batch_size=None,
                                 batch_format="pyarrow"):
        rows.extend(zip(bt["day"].to_pylist(), bt["c"].to_pylist()))
    rows.sort()
    n = len(rows)
    s = sum(c for _, c in rows)
    q = sum(c * c for _, c in rows)
    var_e = n * q - s * s
    out_d, out_c, out_cu = [], [], []
    cu = 0
    for i, (d, c) in enumerate(rows, start=1):
        cu += n * c - s
        if cu * cu * k2_den > k2_num * i * var_e:
            out_d.append(d * 86400)
            out_c.append(c)
            out_cu.append(cu)
    return pa.table({"day_epoch": pa.array(out_d, pa.int64()),
                     "n_events": pa.array(out_c, pa.int64()),
                     "cusum_scaled": pa.array(out_cu, pa.int64())})


CUSUM_SQL = """
WITH d AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                  count(*) AS c
           FROM events GROUP BY 1),
t AS (SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(c) AS HUGEINT)
        AS s, CAST(sum(c * c) AS HUGEINT) AS q FROM d),
r AS (SELECT day, c,
             sum(c * n - s) OVER (ORDER BY day
                                  ROWS UNBOUNDED PRECEDING) AS cu,
             row_number() OVER (ORDER BY day) AS i, n, s, q
      FROM d, t)
SELECT day * 86400 AS day_epoch, CAST(c AS BIGINT) AS n_events,
       CAST(cu AS BIGINT) AS cusum_scaled
FROM r WHERE cu * cu > i * (n * q - s * s)
"""


def dataset_card_report(sf_dir: str):
    """DATASET CARD headline stats in one labeled table — the numbers
    a corpus release publishes (docs, tokens, chars, exact vocabulary,
    sources, languages, exact duplicate docs): the capstone that folds
    the corpus-profiling family into the artifact a consumer actually
    reads. Scalar stats combine per batch and fold on the driver;
    the two EXACT distinct counts (vocabulary, duplicate texts) go
    through per-batch dedup → one distinct exchange each (the
    :func:`profile_orders_columns` shape — hot values collapse in the
    combiner; the driver never holds a value set)."""
    import hashlib

    ds = _read(sf_dir, "documents",
               ["doc_id", "text", "source", "lang", "n_chars"])

    def scalars(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        return pa.table({
            "docs": pa.array([t.num_rows], pa.int64()),
            "tokens": pa.array(
                [int(pc.sum(pc.list_value_length(toks)).as_py() or 0)],
                pa.int64()),
            "chars": pa.array(
                [int(pc.sum(t["n_chars"]).as_py() or 0)], pa.int64())})

    n_docs = n_tokens = n_chars = 0
    for bt in (ds.map_batches(scalars, batch_format="pyarrow")
               .iter_batches(batch_size=None, batch_format="pyarrow")):
        n_docs += int(bt["docs"][0].as_py())
        n_tokens += int(bt["tokens"][0].as_py())
        n_chars += int(bt["chars"][0].as_py())

    def vocab_rows(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        return pa.table({"v": pc.unique(pc.list_flatten(toks))})

    vocab = (ds.map_batches(vocab_rows, batch_format="pyarrow")
             .groupby("v").aggregate(Count(alias_name="x")).count())

    def fp_rows(t: pa.Table) -> pa.Table:
        return pa.table({"fp": pa.array(
            [hashlib.md5(x.encode()).hexdigest()
             for x in t["text"].to_pylist()], pa.string())})

    n_uniq_text = (ds.map_batches(fp_rows, batch_format="pyarrow")
                   .groupby("fp").aggregate(Count(alias_name="x"))
                   .count())

    small: dict[str, set] = {"source": set(), "lang": set()}
    for bt in (ds.map_batches(
            lambda t: pa.table({
                "source": pc.unique(t["source"].combine_chunks()),
            }), batch_format="pyarrow")
            .iter_batches(batch_size=None, batch_format="pyarrow")):
        small["source"].update(bt["source"].to_pylist())
    for bt in (ds.map_batches(
            lambda t: pa.table({
                "lang": pc.unique(t["lang"].combine_chunks()),
            }), batch_format="pyarrow")
            .iter_batches(batch_size=None, batch_format="pyarrow")):
        small["lang"].update(bt["lang"].to_pylist())

    metrics = [("n_docs", n_docs), ("n_tokens", n_tokens),
               ("n_chars", n_chars), ("vocab_size", vocab),
               ("n_sources", len(small["source"])),
               ("n_langs", len(small["lang"])),
               ("n_dup_docs", n_docs - n_uniq_text)]
    return pa.table({
        "metric": pa.array([m for m, _ in metrics], pa.string()),
        "value": pa.array([int(v) for _, v in metrics], pa.int64())})


DATASET_CARD_SQL = """
SELECT 'n_docs' AS metric, CAST(count(*) AS BIGINT) AS value
FROM documents
UNION ALL
SELECT 'n_tokens', CAST(sum(len(string_split(text, ' '))) AS BIGINT)
FROM documents
UNION ALL
SELECT 'n_chars', CAST(sum(n_chars) AS BIGINT) FROM documents
UNION ALL
SELECT 'vocab_size', CAST(count(DISTINCT token) AS BIGINT)
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
UNION ALL
SELECT 'n_sources', CAST(count(DISTINCT source) AS BIGINT)
FROM documents
UNION ALL
SELECT 'n_langs', CAST(count(DISTINCT lang) AS BIGINT) FROM documents
UNION ALL
SELECT 'n_dup_docs',
       CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT)
FROM documents
"""


def autocorr_daily_counts(sf_dir: str):
    """Lag-1 AUTOCORRELATION of daily event volume — the seasonality/
    persistence statistic that decides whether a forecast beats the
    mean (r ≈ 0 = white noise, r → 1 = strong day-over-day memory).
    EXACT int64 rational, sqrt-free: with D days, S = Σc, the scaled
    deviations e_t = D·c_t − S give
    r = Σ e_t·e_{t+1} / Σ e_t² — numerator over consecutive pairs,
    denominator over all days (the standard acf normalization), both
    plain integer sums (HUGEINT in the SQL mirror; Python ints here).
    One bounded daily-counts fold (a decade is 3653 rows) after a
    per-batch count combine."""
    ds = _read(sf_dir, "events", ["ts"])

    def days(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        d = us // 86_400_000_000
        ud, cnt = np.unique(d, return_counts=True)
        return pa.table({"day": pa.array(ud, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    daily = (ds.map_batches(days, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("n", alias_name="c")))
    rows = []
    for bt in daily.iter_batches(batch_size=None,
                                 batch_format="pyarrow"):
        rows.extend(zip(bt["day"].to_pylist(), bt["c"].to_pylist()))
    rows.sort()
    n = len(rows)
    s = sum(c for _, c in rows)
    e = [n * c - s for _, c in rows]
    num = sum(a * b for a, b in zip(e, e[1:]))
    den = sum(a * a for a in e)
    return pa.table({"n_days": pa.array([n], pa.int64()),
                     "acf1_num": pa.array([num], pa.int64()),
                     "acf1_den": pa.array([den], pa.int64())})


AUTOCORR_SQL = """
WITH d AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                  count(*) AS c
           FROM events GROUP BY 1),
t AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(c) AS HUGEINT) AS s FROM d),
e AS (SELECT day, c * n - s AS e,
             lead(c * n - s) OVER (ORDER BY day) AS e_next
      FROM d, t)
SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
       CAST(COALESCE(sum(e * e_next), 0) AS BIGINT) AS acf1_num,
       CAST(sum(e * e) AS BIGINT) AS acf1_den
FROM e
"""


def kl_unigram_by_source(sf_dir: str):
    """Per-source KL DIVERGENCE from the global unigram distribution —
    the information-theoretic "how different is this domain's
    language" number (the DSIR/importance-sampling quantity; completes
    the family next to per-source entropy and χ² feature selection).
    Support(source) ⊆ support(global) always, so no smoothing is
    needed. Per-(source, token) terms are e6-rounded BEFORE the
    per-source integer sum (the token-entropy convention), with the
    float expression tree mirrored verbatim in SQL:
    term = (c_st/n_s)·ln((c_st·N)/(n_s·c_gt)). One (source, token)
    groupby carries the corpus; the global token table folds under
    the vocabulary gate."""
    ds = _read(sf_dir, "documents", ["source", "text"])

    def tok_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        src = t["source"].to_numpy(zero_copy_only=False)[par]
        df = pd.DataFrame({"source": src, "token": flat, "c": 1})
        g = df.groupby(["source", "token"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    st = (ds.map_batches(tok_counts, batch_format="pyarrow")
          .groupby(["source", "token"])
          .aggregate(Sum("c", alias_name="c"))
          .materialize())
    nst = st.count()
    assert nst <= 5_000_000, \
        f"(source, token) table {nst} exceeds the driver fold gate"
    gtok: dict[str, int] = {}
    ns: dict[str, int] = {}
    rows = []
    for bt in st.iter_batches(batch_size=None, batch_format="pyarrow"):
        for s_, tok, c in zip(bt["source"].to_pylist(),
                              bt["token"].to_pylist(),
                              bt["c"].to_pylist()):
            gtok[tok] = gtok.get(tok, 0) + int(c)
            ns[s_] = ns.get(s_, 0) + int(c)
            rows.append((s_, tok, int(c)))
    n_total = sum(gtok.values())
    kl: dict[str, int] = {s_: 0 for s_ in ns}
    for s_, tok, c in rows:
        p = c / ns[s_]
        term = p * np.log((c * n_total) / (ns[s_] * gtok[tok]))
        kl[s_] += int(np.rint(term * 1_000_000))
    srcs = sorted(ns)
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "n_tokens": pa.array([ns[s_] for s_ in srcs], pa.int64()),
        "kl_e6": pa.array([kl[s_] for s_ in srcs], pa.int64())})


KL_UNIGRAM_SQL = """
WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token
             FROM documents),
st AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
       FROM tok GROUP BY source, token),
g AS (SELECT token, CAST(sum(c) AS BIGINT) AS cg FROM st GROUP BY token),
s AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM st
      GROUP BY source),
t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM st),
term AS (SELECT st.source,
                CAST(round((CAST(st.c AS DOUBLE) / s.ns)
                           * ln((CAST(st.c AS DOUBLE) * t.n)
                                / (CAST(s.ns AS DOUBLE) * g.cg))
                           * 1000000) AS BIGINT) AS e
         FROM st
         JOIN g ON g.token = st.token
         JOIN s ON s.source = st.source
         CROSS JOIN t)
SELECT term.source, s.ns AS n_tokens,
       CAST(sum(term.e) AS BIGINT) AS kl_e6
FROM term JOIN s ON s.source = term.source
GROUP BY term.source, s.ns
"""


def graph_diameter_bound(sf_dir: str, driver_max: int = 5_000_000):
    """Graph DIAMETER lower bound by the classic DOUBLE SWEEP: BFS
    from node 1 to its farthest reachable node u (ties → min id),
    then BFS from u — ecc(u) lower-bounds the component's diameter
    and is exact on trees, usually tight in practice (the standard
    cheap estimator where an exact all-pairs diameter is quadratic).
    Output one row (ecc_seed, far_node, diameter_lb). The oracle
    chains TWO recursive CTEs, the second seeded by the first's
    argmax — the deepest recursive oracle in the registry.

    Scale shape: the edge fold runs under the same driver gate as
    :func:`bfs_distances_graph`; past the gate the sweep is that op's
    per-round distributed frontier-join machinery
    (:func:`_bfs_distance_rounds`) run twice, with the far-node argmax
    as two bounded aggregates between the sweeps — two-form equality
    pytest-asserted (forced past the gate)."""
    edges = _orders_graph_edges(sf_dir).materialize()
    ne = edges.count()
    if ne > driver_max:
        d1 = _bfs_distance_rounds(edges, 1, 64).materialize()
        ecc_seed = int(d1.max("dist"))
        far = int(d1.map_batches(
            lambda t, e=ecc_seed: t.filter(pc.equal(t["dist"], e))
            .select(["node"]), batch_format="pyarrow").min("node"))
        d2 = _bfs_distance_rounds(edges, far, 64)
        return pa.table({
            "ecc_seed": pa.array([ecc_seed], pa.int64()),
            "far_node": pa.array([far], pa.int64()),
            "diameter_lb": pa.array([int(d2.max("dist"))], pa.int64())})
    t = pa.concat_tables(
        edges.iter_batches(batch_size=None, batch_format="pyarrow"))
    adj: dict[int, list[int]] = {}
    for a, b in zip(t["a"].to_numpy(), t["b"].to_numpy()):
        adj.setdefault(int(a), []).append(int(b))
        adj.setdefault(int(b), []).append(int(a))

    def bfs(src: int) -> dict[int, int]:
        dist = {src: 0}
        frontier = [src]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        return dist

    d1 = bfs(1)
    ecc_seed = max(d1.values())
    far = min(n for n, d in d1.items() if d == ecc_seed)
    d2 = bfs(far)
    return pa.table({"ecc_seed": pa.array([ecc_seed], pa.int64()),
                     "far_node": pa.array([far], pa.int64()),
                     "diameter_lb": pa.array([max(d2.values())],
                                             pa.int64())})


DIAMETER_SQL = """
WITH RECURSIVE e AS (
  SELECT DISTINCT
    LEAST(o_custkey, o_orderkey % 1500 + 1)    AS a,
    GREATEST(o_custkey, o_orderkey % 1500 + 1) AS b
  FROM orders
  WHERE o_custkey <> o_orderkey % 1500 + 1),
bo AS (SELECT a AS u, b AS v FROM e
       UNION ALL SELECT b AS u, a AS v FROM e),
w1(node, dist) AS (
  SELECT 1, 0
  UNION
  SELECT bo.v, w.dist + 1 FROM w1 w JOIN bo ON bo.u = w.node
  WHERE w.dist < 64),
d1 AS (SELECT node, min(dist) AS dist FROM w1 GROUP BY node),
far AS (SELECT node FROM d1 ORDER BY dist DESC, node LIMIT 1),
w2(node, dist) AS (
  SELECT node, 0 FROM far
  UNION
  SELECT bo.v, w.dist + 1 FROM w2 w JOIN bo ON bo.u = w.node
  WHERE w.dist < 64),
d2 AS (SELECT node, min(dist) AS dist FROM w2 GROUP BY node)
SELECT CAST((SELECT max(dist) FROM d1) AS BIGINT) AS ecc_seed,
       CAST((SELECT node FROM far) AS BIGINT) AS far_node,
       CAST((SELECT max(dist) FROM d2) AS BIGINT) AS diameter_lb
"""


def km_survival_curve(sf_dir: str, window_h: int = 48):
    """KAPLAN–MEIER risk table for time-to-conversion: per user, HOURS
    from first 'view' to first subsequent 'purchase', administratively
    CENSORED at the ``window_h``-hour conversion window (the product
    definition — conversions slower than the window don't count, and
    the censoring is real in every testdata scale, not a dead branch).
    Output one row per EVENT time: (t_hours, n_risk, n_events) with
    the standard risk-set rule n_risk(t) = #users observed ≥ t — all
    exact integers (the S(t) product is the consumer's float; the
    counts table is the engine's exact artifact, which is why a SQL
    suffix-sum window can hash-match it).

    Scale shape: one ``groupby(user)`` pass (the shared per-user key)
    emits each user's (observed hours, event flag); the fold is the
    bounded distinct-times table (≤ window_h + 1 rows)."""
    ds = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type"])
    win_us = window_h * 3_600_000_000

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        views = us[et == "view"]
        empty = pd.DataFrame({"t_hours": pd.Series([], dtype=np.int64),
                              "ev": pd.Series([], dtype=np.int64)})
        if not len(views):
            return empty
        v0 = views[0]
        purch = us[(et == "purchase") & (us >= v0)
                   & (us < v0 + win_us)]
        if len(purch):
            t_h = (purch[0] - v0) // 3_600_000_000
            ev = 1
        else:
            t_h = window_h
            ev = 0
        return pd.DataFrame({"t_hours": [np.int64(t_h)],
                             "ev": [np.int64(ev)]})

    obs = ds.groupby("user_id").map_groups(per_user,
                                           batch_format="pandas")
    cnt: dict[int, list[int]] = {}
    for bt in obs.iter_batches(batch_size=None, batch_format="pyarrow"):
        for t_, e in zip(bt["t_hours"].to_pylist(),
                         bt["ev"].to_pylist()):
            c = cnt.setdefault(int(t_), [0, 0])
            c[0] += 1
            c[1] += int(e)
    times = sorted(cnt)
    suffix = 0
    n_risk: dict[int, int] = {}
    for t_ in reversed(times):
        suffix += cnt[t_][0]
        n_risk[t_] = suffix
    ev_times = [t_ for t_ in times if cnt[t_][1] > 0]
    return pa.table({
        "t_hours": pa.array(ev_times, pa.int64()),
        "n_risk": pa.array([n_risk[t_] for t_ in ev_times], pa.int64()),
        "n_events": pa.array([cnt[t_][1] for t_ in ev_times],
                             pa.int64())})


KM_SURVIVAL_SQL = """
WITH v AS (SELECT user_id, min(ts) AS v0 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
p AS (SELECT e.user_id, min(e.ts) AS p0
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts >= v.v0
       AND epoch_us(e.ts) - epoch_us(v.v0) < 48 * 3600000000
      WHERE e.event_type = 'purchase' GROUP BY e.user_id),
obs AS (SELECT v.user_id,
               CASE WHEN p.p0 IS NOT NULL
                    THEN (epoch_us(p.p0) - epoch_us(v.v0)) // 3600000000
                    ELSE 48 END AS t_hours,
               CASE WHEN p.p0 IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM v LEFT JOIN p ON p.user_id = v.user_id),
g AS (SELECT t_hours, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(ev) AS BIGINT) AS d
      FROM obs GROUP BY t_hours)
SELECT CAST(t_hours AS BIGINT) AS t_hours,
       CAST(sum(c) OVER (ORDER BY t_hours DESC
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk,
       d AS n_events
FROM g
QUALIFY d > 0
"""


def feature_hash_docs(sf_dir: str, n_buckets: int = 64):
    """HASHING-TRICK vectorizer (Weinberger ICML'09, the
    fastText/Vowpal input layer): token counts folded into a fixed
    ``n_buckets``-dim sparse vector per doc, emitted as
    (doc_id, bucket, n) rows — the vocabulary-free featurization that
    needs NO fitted dictionary, which is what makes it streamable at
    corpus scale. One shuffle-free map pass (each doc lives in exactly
    one batch, so per-(doc, bucket) combined rows are already globally
    unique — no re-aggregation groupby, the r4 lesson); the bucket
    hash is the registry's SQL-mirrorable md5 convention."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def vecs(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = toks.values.to_numpy(zero_copy_only=False).astype(object)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(flat, return_inverse=True)
        # md5 per UNIQUE token only (SQL-parity hash, vocab-bounded)
        ub = np.array([int(hashlib.md5(x.encode()).hexdigest()[:15], 16)
                       % n_buckets for x in uniq], np.int64)
        b = ub[inv]
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"doc_id": ids[par], "bucket": b, "n": 1})
        g = df.groupby(["doc_id", "bucket"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return ds.map_batches(vecs, batch_format="pyarrow")


FEATURE_HASH_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents)
SELECT doc_id,
       CAST(CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) % 64
            AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM tok GROUP BY doc_id, bucket
"""


def quality_threshold_sweep(sf_dir: str):
    """Quality-filter THRESHOLD SWEEP — the tuning table a pipeline
    owner reads before picking a classifier cutoff (the dedup
    counterpart is :func:`dedup_threshold_sweep`): for each candidate
    percentile threshold p ∈ {10, 20, …, 90} of the score
    distribution, how many docs and tokens survive "keep score ≥ the
    p-th percentile". Exact: thresholds are order statistics at
    index (p·(N−1))//100 of the (score, doc_id)-sorted corpus, and
    the kept counts are suffix sums over the bounded
    (score → docs, tokens) table — one shuffle-free scoring pass, one
    bounded fold, no per-threshold rescans."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(flat.astype(object), return_inverse=True)
        w = _clf_weights(uniq)[inv]
        s = np.rint(np.bincount(par, weights=w, minlength=t.num_rows)) \
            .astype(np.int64)
        df = pd.DataFrame({"clf_score": s, "docs": 1,
                           "tokens": nt.astype(np.int64)})
        g = df.groupby("clf_score", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (ds.map_batches(score, batch_format="pyarrow")
            .groupby("clf_score")
            .aggregate(Sum("docs", alias_name="docs"),
                       Sum("tokens", alias_name="tokens")))
    rows = []
    for bt in hist.iter_batches(batch_size=None, batch_format="pyarrow"):
        rows.extend(zip(bt["clf_score"].to_pylist(),
                        bt["docs"].to_pylist(),
                        bt["tokens"].to_pylist()))
    rows.sort()
    scores = [r[0] for r in rows]
    docs = np.array([r[1] for r in rows], np.int64)
    toks = np.array([r[2] for r in rows], np.int64)
    n = int(docs.sum())
    cum = np.cumsum(docs)  # docs with score <= scores[i]
    sfx_d = int(docs.sum()) - np.concatenate([[0], cum[:-1]])
    sfx_t = int(toks.sum()) - np.concatenate([[0], np.cumsum(toks)[:-1]])
    out = []
    for p in range(10, 100, 10):
        idx = p * (n - 1) // 100  # rank in the score-sorted corpus
        si = int(np.searchsorted(cum, idx + 1))  # score bucket of rank
        thr = scores[si]
        out.append((p, thr, int(sfx_d[si]), int(sfx_t[si])))
    return pa.table({
        "pctl": pa.array([r[0] for r in out], pa.int64()),
        "threshold": pa.array([r[1] for r in out], pa.int64()),
        "n_docs_kept": pa.array([r[2] for r in out], pa.int64()),
        "n_tokens_kept": pa.array([r[3] for r in out], pa.int64())})


QUALITY_SWEEP_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
s AS (SELECT doc_id,
             CAST(sum((CAST('0x' || substr(md5(token), 1, 15) AS BIGINT)
                       % 1001) - 500) AS BIGINT) AS clf_score,
             CAST(count(*) AS BIGINT) AS n_tokens
      FROM tok GROUP BY doc_id),
r AS (SELECT clf_score, n_tokens,
             row_number() OVER (ORDER BY clf_score, doc_id) - 1 AS rk,
             count(*) OVER () AS n
      FROM s),
p AS (SELECT 10 * g AS pctl FROM generate_series(1, 9) AS t(g)),
thr AS (SELECT p.pctl, r.clf_score AS threshold
        FROM p JOIN r ON r.rk = p.pctl * (r.n - 1) // 100)
SELECT thr.pctl, thr.threshold,
       CAST(count(*) AS BIGINT) AS n_docs_kept,
       CAST(sum(s.n_tokens) AS BIGINT) AS n_tokens_kept
FROM thr JOIN s ON s.clf_score >= thr.threshold
GROUP BY thr.pctl, thr.threshold
"""


def k_anonymity_audit(sf_dir: str, k: int = 5, l_min: int = 3):
    """K-ANONYMITY + L-DIVERSITY release audit (Sweeney IJUFKS'02,
    Machanavajjhala ICDE'06) — the privacy gate a data owner runs
    before releasing an event log: group rows by the quasi-identifier
    (event_type, day, hour) and flag groups re-identifiable because
    they hold fewer than ``k`` rows, or attribute-disclosing because
    the sensitive column (user_id) takes fewer than ``l_min`` distinct
    values. The grouped COUNT(DISTINCT) rides the composite-key
    distinct shape of :func:`distinct_users_by_type` (shuffle key
    includes user_id, so a hot QI cohort spreads across reducers);
    the final fold is the bounded QI table (≤ types·days·24 rows —
    calendar-bounded at any corpus size, never the event count)."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    def qi_pairs(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "day": us // 86_400_000_000,
            "hour": (us // 3_600_000_000) % 24,
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "n": 1})
        g = df.groupby(["event_type", "day", "hour", "user_id"],
                       as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_user = (ds.map_batches(qi_pairs, batch_format="pyarrow")
                .groupby(["event_type", "day", "hour", "user_id"])
                .aggregate(Sum("n", alias_name="n")))
    per_qi = (per_user.map_batches(
        lambda t: t.drop_columns(["user_id"]).append_column(
            "u", pa.array(np.ones(t.num_rows, np.int64))),
        batch_format="pyarrow")
        .groupby(["event_type", "day", "hour"])
        .aggregate(Sum("n", alias_name="n_rows"),
                   Sum("u", alias_name="n_users")))

    def flags(t: pa.Table) -> pa.Table:
        nr = t["n_rows"].to_numpy(zero_copy_only=False)
        nu = t["n_users"].to_numpy(zero_copy_only=False)
        return (t.append_column(
            "k_anon", pa.array((nr >= k).astype(np.int64)))
            .append_column(
            "l_diverse", pa.array((nu >= l_min).astype(np.int64))))

    return per_qi.map_batches(flags, batch_format="pyarrow")


K_ANONYMITY_SQL = """
SELECT event_type,
       CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
       CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) >= 5 AS BIGINT) AS k_anon,
       CAST(count(DISTINCT user_id) >= 3 AS BIGINT) AS l_diverse
FROM events GROUP BY 1, 2, 3
"""


def benford_digit_audit(sf_dir: str):
    """BENFORD'S-LAW first-digit audit over order totals — the
    classic forensic-accounting / data-fabrication screen (Benford'38,
    Nigrini'12): observed leading-digit counts of the cents amounts
    vs the log-law expectation N·log10(1+1/d), with the per-digit χ²
    contribution. Expected values and χ² terms are e6 fixed-point
    with the float expression tree mirrored VERBATIM in the SQL (the
    psi/kl convention) so both sides compute identical doubles; the
    leading digit is exact integer repeated-division, never a float
    log10 (10^k boundaries are unsafe in doubles). One shuffle-free
    9-row-per-batch partial pass; the fold is the 9-row digit table."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def digits(t: pa.Table) -> pa.Table:
        v = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        v = v[v > 0].copy()
        while (v >= 10).any():
            m = v >= 10
            v[m] //= 10
        n = np.bincount(v, minlength=10)[1:10]
        return pa.table({
            "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
            "n_obs": pa.array(n.astype(np.int64))})

    folded = (ds.map_batches(digits, batch_format="pyarrow")
              .groupby("digit").aggregate(Sum("n_obs",
                                              alias_name="n_obs")))
    rows = {int(r["digit"]): int(r["n_obs"]) for r in folded.take_all()}
    total = sum(rows.values())
    d = np.array(sorted(dd for dd in rows if rows[dd] > 0), np.int64)
    n_obs = np.array([rows[dd] for dd in d], np.float64)
    exp = total * (np.log(1.0 + 1.0 / d) / np.log(10.0))
    dev = n_obs - exp
    return pa.table({
        "digit": pa.array(d, pa.int64()),
        "n_obs": pa.array(n_obs.astype(np.int64), pa.int64()),
        "expected_e6": pa.array(
            np.rint(1_000_000 * exp).astype(np.int64), pa.int64()),
        "chi2_term_e6": pa.array(
            np.rint(1_000_000 * (dev * dev / exp)).astype(np.int64),
            pa.int64())})


BENFORD_SQL = """
WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
           FROM orders
           WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0),
d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             CAST(count(*) AS BIGINT) AS n_obs
      FROM c GROUP BY 1),
t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM d)
SELECT digit, n_obs,
       CAST(round(1000000 * (n * (ln(1.0 + 1.0 / digit) / ln(10.0))))
            AS BIGINT) AS expected_e6,
       CAST(round(1000000 *
                  ((n_obs - n * (ln(1.0 + 1.0 / digit) / ln(10.0)))
                   * (n_obs - n * (ln(1.0 + 1.0 / digit) / ln(10.0)))
                   / (n * (ln(1.0 + 1.0 / digit) / ln(10.0)))))
            AS BIGINT) AS chi2_term_e6
FROM d, t
"""


def winsorize_order_values(sf_dir: str):
    """WINSORIZATION at exact global p5/p95 order statistics — the
    standard robust-preprocessing clip (Tukey'62 shape) before moment
    statistics or model features: every order's cents amount clipped
    into [v(p5), v(p95)] where v(p) is the value at 0-based rank
    p·(N−1)//100 of the sorted corpus. The thresholds come from the
    shared :func:`_grouped_value_bisect` engine (one 'all' group, two
    rank targets resolved together) — exact order statistics with NO
    global sort and O(1) driver state; the clip itself is a stateless
    broadcast pass."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "grp": pa.array(["all"] * t.num_rows, pa.string()),
            "value_c": _cents(t["o_totalprice"])})

    scored = ds.map_batches(cents, batch_format="pyarrow")
    agg = scored.aggregate(Min("value_c", alias_name="lo"),
                           Max("value_c", alias_name="hi"),
                           Count(alias_name="n"))
    lo, hi, n = int(agg["lo"]), int(agg["hi"]), int(agg["n"])
    state = {("all", 5): [lo, hi, 5 * (n - 1) // 100 + 1],
             ("all", 95): [lo, hi, 95 * (n - 1) // 100 + 1]}
    got = _grouped_value_bisect(scored, "grp", "value_c", state)
    p5, p95 = got[("all", 5)], got[("all", 95)]

    def clip(t: pa.Table) -> pa.Table:
        v = t["value_c"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "value_c": t["value_c"],
            "winsor_c": pa.array(np.clip(v, p5, p95), pa.int64())})

    return scored.map_batches(clip, batch_format="pyarrow")


WINSORIZE_SQL = """
WITH c AS (SELECT o_orderkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS value_c
           FROM orders),
r AS (SELECT value_c,
             row_number() OVER (ORDER BY value_c) - 1 AS rk,
             count(*) OVER () AS n
      FROM c),
t AS (SELECT max(CASE WHEN rk = 5 * (n - 1) // 100
                      THEN value_c END) AS lo,
             max(CASE WHEN rk = 95 * (n - 1) // 100
                      THEN value_c END) AS hi
      FROM r)
SELECT c.o_orderkey, c.value_c,
       CAST(least(greatest(c.value_c, t.lo), t.hi) AS BIGINT)
         AS winsor_c
FROM c, t
"""


def closeness_centrality_seeds(sf_dir: str, max_depth: int = 6,
                               driver_max: int = 2_000_000):
    """CLOSENESS CENTRALITY for a fixed seed sample (nodes 1–4) over
    the derived undirected graph, bounded to ``max_depth`` hops (the
    Wasserman–Faust within-radius form — at web scale full-eccentricity
    closeness is unbounded BFS, so production systems fix a radius;
    the SQL oracle shares the same bound). Per seed: nodes reached,
    exact hop-sum, and closeness (n_reached−1)·1e6 // sum_dist as an
    exact integer division.

    Scale shape: ONE multi-source BFS carrying (src, node, dist) keys
    — the 4 sources ride the same per-round join + groupby-min
    exchanges instead of 4 sequential BFS runs; below the edge gate a
    driver adjacency fold (the bfs_distances_graph pattern)."""
    from rendler_ray.state.politeness import _nonempty_blocks

    seeds = [1, 2, 3, 4]
    edges = _orders_graph_edges(sf_dir).materialize()

    if edges.count() <= driver_max:
        t = pa.concat_tables(
            edges.iter_batches(batch_size=None, batch_format="pyarrow"))
        adj: dict[int, list[int]] = {}
        for u, v in zip(t["a"].to_numpy(), t["b"].to_numpy()):
            adj.setdefault(int(u), []).append(int(v))
            adj.setdefault(int(v), []).append(int(u))
        out = []
        for s in seeds:
            dist = {s: 0}
            frontier = [s]
            for d in range(1, max_depth + 1):
                nxt = []
                for u in frontier:
                    for v in adj.get(u, ()):
                        if v not in dist:
                            dist[v] = d
                            nxt.append(v)
                frontier = nxt
                if not frontier:
                    break
            nr, sd = len(dist), sum(dist.values())
            out.append((s, nr, sd,
                        (nr - 1) * 1_000_000 // sd if sd else 0))
        return pa.table({
            "src": pa.array([r[0] for r in out], pa.int64()),
            "n_reached": pa.array([r[1] for r in out], pa.int64()),
            "sum_dist": pa.array([r[2] for r in out], pa.int64()),
            "closeness_e6": pa.array([r[3] for r in out], pa.int64())})

    both = edges.map_batches(
        lambda t: pa.table({
            "u": pa.array(np.concatenate([t["a"].to_numpy(),
                                          t["b"].to_numpy()]), pa.int64()),
            "v": pa.array(np.concatenate([t["b"].to_numpy(),
                                          t["a"].to_numpy()]), pa.int64())}),
        batch_format="pyarrow").materialize()
    dist_ds = rd.from_arrow(pa.table({
        "src": pa.array(seeds, pa.int64()),
        "node": pa.array(seeds, pa.int64()),
        "dist": pa.array([0] * len(seeds), pa.int64())})).materialize()
    for d in range(1, max_depth + 1):
        frontier = _nonempty_blocks(dist_ds.map_batches(
            lambda t, d=d: t.filter(pc.equal(t["dist"], d - 1))
            .select(["src", "node"]), batch_format="pyarrow")
            .materialize())
        if frontier is None:
            break
        nbr = _nonempty_blocks(
            frontier.map_batches(
                lambda t: t.rename_columns(["src", "u"]),
                batch_format="pyarrow")
            .join(both, join_type="inner", num_partitions=8, on=("u",))
            .materialize())
        if nbr is None:
            break
        cand = nbr.map_batches(
            lambda t, d=d: pa.table({
                "src": pc.cast(t["src"], pa.int64()),
                "node": pc.cast(t["v"], pa.int64()),
                "dist": pa.array(np.full(t.num_rows, d, np.int64))}),
            batch_format="pyarrow")
        dist_ds = (dist_ds.union(cand).groupby(["src", "node"])
                   .aggregate(Min("dist", alias_name="dist"))
                   .materialize())
    per_src = (dist_ds.map_batches(
        lambda t: t.append_column(
            "one", pa.array(np.ones(t.num_rows, np.int64))),
        batch_format="pyarrow")
        .groupby("src")
        .aggregate(Sum("one", alias_name="n_reached"),
                   Sum("dist", alias_name="sum_dist")))

    def finish(t: pa.Table) -> pa.Table:
        nr = t["n_reached"].to_numpy(zero_copy_only=False)
        sd = t["sum_dist"].to_numpy(zero_copy_only=False)
        cl = np.where(sd > 0, (nr - 1) * 1_000_000 // np.maximum(sd, 1),
                      0)
        return t.append_column("closeness_e6", pa.array(cl, pa.int64()))

    return per_src.map_batches(finish, batch_format="pyarrow")


CLOSENESS_SQL = """
WITH RECURSIVE e AS (
  SELECT DISTINCT
    LEAST(o_custkey, o_orderkey % 1500 + 1)    AS a,
    GREATEST(o_custkey, o_orderkey % 1500 + 1) AS b
  FROM orders
  WHERE o_custkey <> o_orderkey % 1500 + 1),
bo AS (SELECT a AS u, b AS v FROM e
       UNION ALL SELECT b AS u, a AS v FROM e),
walk(src, node, dist) AS (
  SELECT s.src, s.src, 0 FROM (VALUES (1), (2), (3), (4)) s(src)
  UNION
  SELECT w.src, bo.v, w.dist + 1
  FROM walk w JOIN bo ON bo.u = w.node
  WHERE w.dist < 6),
d AS (SELECT src, node, min(dist) AS dist FROM walk
      GROUP BY src, node)
SELECT CAST(src AS BIGINT) AS src,
       CAST(count(*) AS BIGINT) AS n_reached,
       CAST(sum(dist) AS BIGINT) AS sum_dist,
       CAST(CASE WHEN sum(dist) = 0 THEN 0
                 ELSE (count(*) - 1) * 1000000 // sum(dist) END
            AS BIGINT) AS closeness_e6
FROM d GROUP BY src
"""


def bipartite_check_graph(sf_dir: str, max_depth: int = 6,
                          driver_max: int = 2_000_000):
    """BIPARTITENESS / ODD-CYCLE check within ``max_depth`` hops of
    the seed — the structural sanity test run before algorithms that
    assume two-colorability (matching, some embedding inits). A node
    reachable by both an even- and an odd-length walk from the seed
    witnesses an odd closed walk (⇒ an odd cycle in its component);
    the op emits per-node walk-parity flags and the odd_witness bit,
    computed over the DEDUP'd (node, walk-length) relation — exactly
    the recursive CTE's fixpoint, so the oracle is hash-exact by
    construction.

    Scale shape: per-round frontier join + DISTINCT on (node, dist)
    (the walk relation, ≤ depth+1 rows per node); below the edge gate
    a driver level-set fold."""
    from rendler_ray.state.politeness import _nonempty_blocks

    seed = 1
    edges = _orders_graph_edges(sf_dir).materialize()

    if edges.count() <= driver_max:
        t = pa.concat_tables(
            edges.iter_batches(batch_size=None, batch_format="pyarrow"))
        adj: dict[int, set[int]] = {}
        for u, v in zip(t["a"].to_numpy(), t["b"].to_numpy()):
            adj.setdefault(int(u), set()).add(int(v))
            adj.setdefault(int(v), set()).add(int(u))
        seen: dict[int, set[int]] = {seed: {0}}
        level = {seed}
        for d in range(1, max_depth + 1):
            nxt = set()
            for u in level:
                for v in adj.get(u, ()):
                    s = seen.setdefault(v, set())
                    if d not in s:
                        s.add(d)
                        nxt.add(v)
            level = nxt
            if not level:
                break
        ks = sorted(seen)
        he = [int(any(x % 2 == 0 for x in seen[k])) for k in ks]
        ho = [int(any(x % 2 == 1 for x in seen[k])) for k in ks]
        return pa.table({
            "node": pa.array(ks, pa.int64()),
            "has_even": pa.array(he, pa.int64()),
            "has_odd": pa.array(ho, pa.int64()),
            "odd_witness": pa.array(
                [a & b for a, b in zip(he, ho)], pa.int64())})

    both = edges.map_batches(
        lambda t: pa.table({
            "u": pa.array(np.concatenate([t["a"].to_numpy(),
                                          t["b"].to_numpy()]), pa.int64()),
            "v": pa.array(np.concatenate([t["b"].to_numpy(),
                                          t["a"].to_numpy()]), pa.int64())}),
        batch_format="pyarrow").materialize()
    walk = rd.from_arrow(pa.table({
        "node": pa.array([seed], pa.int64()),
        "dist": pa.array([0], pa.int64())})).materialize()
    for d in range(1, max_depth + 1):
        frontier = _nonempty_blocks(walk.map_batches(
            lambda t, d=d: t.filter(pc.equal(t["dist"], d - 1))
            .select(["node"]), batch_format="pyarrow").materialize())
        if frontier is None:
            break
        nbr = _nonempty_blocks(
            frontier.map_batches(
                lambda t: t.rename_columns(["u"]), batch_format="pyarrow")
            .join(both, join_type="inner", num_partitions=8, on=("u",))
            .materialize())
        if nbr is None:
            break
        cand = nbr.map_batches(
            lambda t, d=d: pa.table({
                "node": pc.cast(t["v"], pa.int64()),
                "dist": pa.array(np.full(t.num_rows, d, np.int64))}),
            batch_format="pyarrow")
        walk = (walk.union(cand).groupby(["node", "dist"])
                .aggregate(Count(alias_name="_n"))
                .select_columns(["node", "dist"]).materialize())

    def parity(t: pa.Table) -> pa.Table:
        d = t["dist"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": t["node"],
            "e": pa.array((1 - d % 2).astype(np.int64)),
            "o": pa.array((d % 2).astype(np.int64))})

    flags = (walk.map_batches(parity, batch_format="pyarrow")
             .groupby("node")
             .aggregate(Max("e", alias_name="has_even"),
                        Max("o", alias_name="has_odd")))
    return flags.map_batches(
        lambda t: t.append_column(
            "odd_witness",
            pc.cast(pc.and_(pc.equal(t["has_even"], 1),
                            pc.equal(t["has_odd"], 1)), pa.int64())),
        batch_format="pyarrow")


BIPARTITE_SQL = """
WITH RECURSIVE e AS (
  SELECT DISTINCT
    LEAST(o_custkey, o_orderkey % 1500 + 1)    AS a,
    GREATEST(o_custkey, o_orderkey % 1500 + 1) AS b
  FROM orders
  WHERE o_custkey <> o_orderkey % 1500 + 1),
bo AS (SELECT a AS u, b AS v FROM e
       UNION ALL SELECT b AS u, a AS v FROM e),
walk(node, dist) AS (
  SELECT 1 AS node, 0 AS dist
  UNION
  SELECT bo.v, w.dist + 1
  FROM walk w JOIN bo ON bo.u = w.node
  WHERE w.dist < 6)
SELECT CAST(node AS BIGINT) AS node,
       CAST(max(CASE WHEN dist % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS has_even,
       CAST(max(CASE WHEN dist % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS has_odd,
       CAST(max(CASE WHEN dist % 2 = 0 THEN 1 ELSE 0 END)
            * max(CASE WHEN dist % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS odd_witness
FROM walk GROUP BY node
"""


def betweenness_seed_sample(sf_dir: str, topk: int = 20,
                            driver_max: int = 2_000_000):
    """Source-sampled BETWEENNESS centrality (Brandes JMS'01;
    Brandes–Pich'07 sampling) from the fixed seed set {1,2,3,4} —
    the broker-node score used to pick crawl hubs and graph-cut
    candidates. Exact ``Fraction`` arithmetic end-to-end (see
    :func:`rendler_ray.functions.graph.brandes_betweenness`), emitted
    e9 fixed-point via exact integer division, top-``topk`` by
    (−btw, node).

    Scale shape: below the edge gate, one driver fold over all
    sources; above it, ONE RAY TASK PER SOURCE over the shared
    plasma edge blocks (``to_arrow_refs`` — the edge list never
    lands on the driver; each worker reads the blocks zero-copy,
    builds its own adjacency, and runs an independent single-source
    Brandes pass — O(sources·E) total, no all-to-all). The driver
    folds ``sources`` O(V) Fraction dicts. Two-form equality is
    pytest-asserted (forced past the gate). Edges must fit ONE
    worker's heap; past that the fallback is per-source BFS-DAG
    rounds (not needed at any tested scale)."""
    from rendler_ray.functions.graph import brandes_betweenness

    sources = [1, 2, 3, 4]
    edges = _orders_graph_edges(sf_dir).materialize()
    n = edges.count()
    if n > driver_max:
        refs = list(edges.to_arrow_refs())

        @ray.remote
        def one_source(s: int, *blocks):
            t = pa.concat_tables(blocks)
            return brandes_betweenness(t["a"].to_numpy(),
                                       t["b"].to_numpy(), [s])

        parts = ray.get([one_source.remote(s, *refs) for s in sources])
        btw: dict = {}
        for p in parts:
            for k, f in p.items():
                btw[k] = btw.get(k, 0) + f
    else:
        t = pa.concat_tables(
            edges.iter_batches(batch_size=None, batch_format="pyarrow"))
        btw = brandes_betweenness(t["a"].to_numpy(), t["b"].to_numpy(),
                                  sources)
    rows = sorted(((f.numerator * 1_000_000_000) // f.denominator, k)
                  for k, f in btw.items())
    rows = [(k, v) for v, k in rows if v > 0]
    rows.sort(key=lambda r: (-r[1], r[0]))
    rows = rows[:topk]
    return pa.table({
        "node": pa.array([r[0] for r in rows], pa.int64()),
        "btw_e9": pa.array([r[1] for r in rows], pa.int64())})


def _prefix_verify_driver(ds, cdf: "pd.DataFrame", ids_arr):
    """Driver-side exact verify for the prefix-filter join: fetch only
    CANDIDATE docs' texts (distributed is_in filter, bounded pull),
    re-shingle each doc once, emit (a, b, inter, uni) for pairs with
    2·inter ≥ uni."""
    idref = ray.put(ids_arr)
    txt = pa.concat_tables(
        ds.map_batches(
            lambda t: t.filter(pc.is_in(t["doc_id"],
                                        value_set=ray.get(idref))),
            batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    texts = dict(zip(txt["doc_id"].to_pylist(), txt["text"].to_pylist()))
    gsets: dict[int, frozenset] = {}
    out: dict[tuple[int, int], tuple[int, int]] = {}
    for _, g in cdf.groupby("bucket_key", sort=False):
        ids_b = sorted(set(g["doc_id"]))
        if len(ids_b) < 2:
            continue
        for i in ids_b:
            if i not in gsets:
                gsets[i] = F_text.ngram_set(texts[i], 3)
        for x in range(len(ids_b)):
            for y in range(x + 1, len(ids_b)):
                k = (ids_b[x], ids_b[y])
                if k in out:
                    continue
                ga, gb = gsets[k[0]], gsets[k[1]]
                inter = len(ga & gb)
                uni = len(ga) + len(gb) - inter
                if 2 * inter >= uni:
                    out[k] = (inter, uni)
    keys = sorted(out)
    return rd.from_arrow(pa.table({
        "a": pa.array([k[0] for k in keys], pa.int64()),
        "b": pa.array([k[1] for k in keys], pa.int64()),
        "inter": pa.array([out[k][0] for k in keys], pa.int64()),
        "uni": pa.array([out[k][1] for k in keys], pa.int64())}))


def prefix_filter_jaccard_pairs(sf_dir: str, driver_max: int | None = None,
                                gram_driver_max: int = 5_000_000):
    """EXACT set-similarity self-join with PREFIX FILTERING (SSJoin,
    Chaudhuri ICDE'06; PPJoin, Xiao WWW'08) — ALL document pairs with
    word-3-gram Jaccard ≥ 0.5, COMPLETE by theorem (unlike the
    LSH-probabilistic :func:`ngram_jaccard_pairs`): order the gram
    universe globally by (df asc, hash) and each doc's candidate
    prefix is its first |d| − ⌈t·|d|⌉ + 1 grams in that order; any
    pair with Jaccard ≥ t MUST share a prefix gram, so the bucket
    join over prefix postings misses nothing while rare-first
    ordering keeps postings short. Output (a, b, inter, uni) as
    exact int64 set sizes (2·inter ≥ uni ⟺ jaccard ≥ 0.5), so the
    all-pairs SQL oracle is hash-exact.

    Scale shape: grams are replaced by 128-bit hashes at the explode
    task (the dup_span convention — strings never shuffle); df is one
    int-keyed groupby; the per-doc prefix cut is one map_groups; the
    candidate bucket filter reuses :func:`_hot_bucket_candidates`
    (broadcast under the hot-key cap); the exact verify is the shared
    driver-gate / distributed two-form. Materialize barriers cap each
    execution at ≤2 shuffle stages (the r4e deadlock lesson)."""
    import pandas.util as pdu

    if driver_max is None:
        driver_max = _VERIFY_DRIVER_MAX
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def gram_rows(t: pa.Table) -> pa.Table:
        grams, gpar, _ = F_text.kgram_rows(t["text"].combine_chunks(), 3)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[gpar]
        garr = np.asarray(grams, dtype=object)
        g1 = pdu.hash_array(garr, categorize=False).view(np.int64)
        g2 = pdu.hash_array(garr, hash_key="rendlerprefixj2!",
                            categorize=False).view(np.int64)
        g = (pd.DataFrame({"g1": g1, "g2": g2, "doc_id": ids})
             .drop_duplicates())
        n = g.groupby("doc_id")["g1"].transform("size") \
            .to_numpy(np.int64)
        return pa.table({
            "g1": pa.array(g["g1"].to_numpy(np.int64), pa.int64()),
            "g2": pa.array(g["g2"].to_numpy(np.int64), pa.int64()),
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64),
                               pa.int64()),
            "n": pa.array(n, pa.int64())})

    grams = ds.map_batches(gram_rows,
                           batch_format="pyarrow").materialize()

    if grams.count() <= gram_driver_max:
        # size-gated driver fold (the dup_span pattern): the combined
        # int64 gram partials fit one bounded pull; df, the global
        # rare-first order, and every doc's prefix cut are vectorized
        # in a single lexsort — zero further shuffles below the gate
        gt = pa.concat_tables(
            grams.iter_batches(batch_size=None, batch_format="pyarrow"))
        gdf = gt.to_pandas()
        gdf["df"] = gdf.groupby(["g1", "g2"])["doc_id"] \
            .transform("size").to_numpy(np.int64)
        o = np.lexsort((gdf["g2"].to_numpy(), gdf["g1"].to_numpy(),
                        gdf["df"].to_numpy(), gdf["doc_id"].to_numpy()))
        gdf = gdf.iloc[o]
        rank = gdf.groupby("doc_id", sort=False).cumcount() \
            .to_numpy(np.int64)
        n = gdf["n"].to_numpy(np.int64)
        plen = n - ((n + 1) // 2) + 1  # |d| − ⌈0.5·|d|⌉ + 1
        p = gdf[rank < plen]
        occ = p.groupby(["g1", "g2"], sort=False)["doc_id"] \
            .transform("size")
        cdf = p[occ.to_numpy() >= 2]
        cdf = pd.DataFrame({
            "bucket_key": [f"{a & 0xFFFFFFFFFFFFFFFF:016x}"
                           f"{b & 0xFFFFFFFFFFFFFFFF:016x}"
                           for a, b in zip(cdf["g1"], cdf["g2"])],
            "doc_id": cdf["doc_id"].to_numpy(np.int64)})
        ids_arr = pa.array(sorted(set(cdf["doc_id"])), pa.int64())
        return _prefix_verify_driver(ds, cdf, ids_arr)

    df_tbl = (grams.map_batches(
        lambda t: t.select(["g1", "g2"]).append_column(
            "c", pa.array(np.ones(t.num_rows, np.int64))),
        batch_format="pyarrow")
        .groupby(["g1", "g2"]).aggregate(Sum("c", alias_name="df"))
        .materialize())
    joined = grams.join(df_tbl, join_type="inner", num_partitions=8,
                        on=("g1", "g2")).materialize()

    def prefix(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["df", "g1", "g2"], kind="stable")
        n = int(g["n"].iloc[0])
        plen = n - ((n + 1) // 2) + 1  # |d| − ⌈0.5·|d|⌉ + 1
        p = g.head(plen)
        key = [f"{a & 0xFFFFFFFFFFFFFFFF:016x}"
               f"{b & 0xFFFFFFFFFFFFFFFF:016x}"
               for a, b in zip(p["g1"], p["g2"])]
        return pd.DataFrame({"bucket_key": key,
                             "doc_id": p["doc_id"].to_numpy(np.int64)})

    postings = (joined.groupby("doc_id")
                .map_groups(prefix, batch_format="pandas")
                .materialize())
    cand = _hot_bucket_candidates(postings).materialize()

    if cand.count() <= driver_max:
        ct = pa.concat_tables(
            cand.iter_batches(batch_size=None, batch_format="pyarrow"))
        return _prefix_verify_driver(ds, cdf, ids_arr)

    cand_txt = cand.join(ds, join_type="inner", num_partitions=8,
                         on=("doc_id",))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"]))
        empty = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                              "b": pd.Series([], dtype=np.int64),
                              "inter": pd.Series([], dtype=np.int64),
                              "uni": pd.Series([], dtype=np.int64)})
        if len(ids) < 2:
            return empty
        texts = dict(zip(g["doc_id"], g["text"]))
        gsets = {i: F_text.ngram_set(texts[i], 3) for i in ids}
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ga, gb = gsets[ids[i]], gsets[ids[j]]
                inter = len(ga & gb)
                uni = len(ga) + len(gb) - inter
                if 2 * inter >= uni:
                    rows.append((ids[i], ids[j], inter, uni))
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=["a", "b", "inter", "uni"]) \
            .astype(np.int64)

    # a pair can surface from several prefix grams: grouped Min dedups
    # (inter/uni identical from any bucket)
    return (cand_txt.groupby("bucket_key")
            .map_groups(pairs, batch_format="pandas")
            .groupby(["a", "b"])
            .aggregate(Min("inter", alias_name="inter"),
                       Min("uni", alias_name="uni")))


PREFIX_JACCARD_SQL = """
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
           FROM documents),
gi AS (SELECT doc_id, toks,
              unnest(generate_series(1, len(toks) - 2)) AS i
       FROM t WHERE len(toks) >= 3),
gs AS (SELECT DISTINCT doc_id,
              toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
       FROM gi
       UNION
       SELECT DISTINCT doc_id, text AS gram FROM t
       WHERE len(toks) < 3),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM gs
       GROUP BY doc_id),
iv AS (SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT)
         AS i
       FROM gs x JOIN gs y ON x.gram = y.gram AND x.doc_id < y.doc_id
       GROUP BY 1, 2)
SELECT iv.a, iv.b, i AS inter,
       CAST(sa.n + sb.n - i AS BIGINT) AS uni
FROM iv JOIN sz sa ON sa.doc_id = iv.a
        JOIN sz sb ON sb.doc_id = iv.b
WHERE 2 * i >= sa.n + sb.n - i
"""


def ann_bq_topk(sf_dir: str):
    """BINARY-QUANTIZED ANN (sign-bit codes; Charikar STOC'02
    hyperplane sketches as deployed in modern vector stores) — the
    third point on the registry's compression–recall curve after
    int8 scalar quantization and PQ: 1 bit/dim (512× vs float64),
    query scoring is XOR+popcount over packed uint64 codes, and only
    the per-batch Hamming survivors get an exact cosine re-rank, so
    emitted scores are true cosines. ONE stateless scan + the shared
    fixed-point top-k reduce. Approximate by construction (cross-batch
    prefilter misses only): golden-pinned, recall vs brute force
    asserted in tests."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    queries = _query_vecs(sf_dir, 8)
    return F_ann.bq_topk(ds, queries, k=10, cand=64)


def negative_sample_pairs(sf_dir: str, k: int = 4):
    """Deterministic CONTRASTIVE NEGATIVE SAMPLING — the in-batch /
    random-negative generator for embedding or reranker training
    (DPR's random-negative leg): for every anchor doc, ``k`` negatives
    chosen by a seeded md5 STEP over the dense corpus ranking —
    neg_idx = (idx + 1 + md5(anchor:j) mod (n−1)) mod n — so the draw
    is reproducible, never the anchor itself, and exactly
    SQL-expressible (row_number + the registry's md5 convention).

    Scale shape: one global sort + metadata zip-with-index builds the
    dense rank (`with_row_seq`), one stateless pass emits (anchor,
    j, neg_idx), and ONE int-keyed hash join resolves indices back to
    doc_ids — no broadcast of the corpus, no per-row Python in the
    hot path beyond the md5 calls (k per doc, the pack.py-pinned
    convention)."""
    import hashlib

    from rendler_ray.util import with_row_seq

    ds = _read(sf_dir, "documents", ["doc_id"])
    n = ds.count()
    idx = with_row_seq(ds, ["doc_id"], start=0,
                       column="idx").materialize()

    def targets(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ix = t["idx"].to_numpy(zero_copy_only=False)
        out_a, out_j, out_n = [], [], []
        for d, i in zip(ids.tolist(), ix.tolist()):
            for j in range(1, k + 1):
                h = int(hashlib.md5(
                    f"{d}:{j}".encode()).hexdigest()[:15], 16)
                out_a.append(d)
                out_j.append(j)
                out_n.append((i + 1 + h % (n - 1)) % n)
        return pa.table({"anchor_id": pa.array(out_a, pa.int64()),
                         "j": pa.array(out_j, pa.int64()),
                         "idx": pa.array(out_n, pa.int64())})

    tg = idx.map_batches(targets, batch_format="pyarrow")
    joined = tg.join(idx.map_batches(
        lambda t: t.rename_columns(["neg_id", "idx"]),
        batch_format="pyarrow"),
        join_type="inner", num_partitions=8, on=("idx",))
    return joined.select_columns(["anchor_id", "j", "neg_id"])


NEGATIVE_SAMPLE_SQL = """
WITH r AS (SELECT doc_id,
                  row_number() OVER (ORDER BY doc_id) - 1 AS idx,
                  count(*) OVER () AS n
           FROM documents),
t AS (SELECT r.doc_id AS anchor_id, CAST(s.j AS BIGINT) AS j,
             (idx + 1 + CAST('0x' || substr(md5(
                  CAST(r.doc_id AS VARCHAR) || ':'
                  || CAST(s.j AS VARCHAR)), 1, 15) AS BIGINT)
              % (n - 1)) % n AS neg_idx
      FROM r, generate_series(1, 4) s(j))
SELECT t.anchor_id, t.j, r2.doc_id AS neg_id
FROM t JOIN r r2 ON r2.idx = t.neg_idx
"""


def sssp_bounded_graph(sf_dir: str, max_hops: int = 6,
                       driver_max: int = 2_000_000):
    """WEIGHTED single-source shortest paths within ``max_hops``
    relaxation rounds — bounded Bellman–Ford, the weighted sibling of
    :func:`bfs_distances_graph` (hop-bounded SSSP is the production
    form at web scale: full convergence is unbounded rounds). Edge
    weights are deterministic ints 1 + (7·min + 13·max) % 9 on the
    canonical edge so both engines derive identical weights. The
    Ray rounds mirror the recursive CTE's fixpoint EXACTLY: the
    frontier at round r is every DISTINCT (node, dist, hops=r−1)
    triple, expansions dedup on the triple, and the answer is the
    per-node Min over all walks ≤ max_hops — so the oracle is
    hash-exact by construction.

    Scale shape: per-round join + triple-distinct groupby (the crawl's
    BFS round shape with a weight column); driver level-set fold below
    the edge gate."""
    from rendler_ray.state.politeness import _nonempty_blocks

    seed = 1
    edges = _orders_graph_edges(sf_dir).materialize()

    if edges.count() <= driver_max:
        # vectorized level sets: the walk relation is a boolean
        # (node × dist) matrix, one scatter-OR per distinct weight per
        # hop — python tuple-sets cost 14 s on the dense sf0.1 graph,
        # this runs in milliseconds with identical output
        t = pa.concat_tables(
            edges.iter_batches(batch_size=None, batch_format="pyarrow"))
        ea = t["a"].to_numpy(zero_copy_only=False)
        eb = t["b"].to_numpy(zero_copy_only=False)
        ew = 1 + (7 * ea + 13 * eb) % 9
        nodes = np.unique(np.concatenate([ea, eb, [seed]]))
        ia = np.searchsorted(nodes, ea)
        ib = np.searchsorted(nodes, eb)
        u = np.concatenate([ia, ib])
        v = np.concatenate([ib, ia])
        w = np.concatenate([ew, ew])
        dmax = 9 * max_hops
        cur = np.zeros((len(nodes), dmax + 1), bool)
        cur[np.searchsorted(nodes, seed), 0] = True
        seen = cur.copy()
        for _ in range(max_hops):
            nxt = np.zeros_like(cur)
            for wt in range(1, 10):
                m = w == wt
                if not m.any():
                    continue
                np.logical_or.at(nxt[:, wt:], v[m], cur[u[m], :-wt])
            cur = nxt
            if not cur.any():
                break
            seen |= cur
        has = seen.any(axis=1)
        dist = np.argmax(seen[has], axis=1)  # first True = min dist
        return pa.table({"node": pa.array(nodes[has], pa.int64()),
                         "dist": pa.array(dist.astype(np.int64),
                                          pa.int64())})

    both = edges.map_batches(
        lambda t: pa.table({
            "u": pa.array(np.concatenate([t["a"].to_numpy(),
                                          t["b"].to_numpy()]), pa.int64()),
            "v": pa.array(np.concatenate([t["b"].to_numpy(),
                                          t["a"].to_numpy()]), pa.int64()),
            "w": pa.array(np.tile(
                1 + (7 * t["a"].to_numpy() + 13 * t["b"].to_numpy()) % 9,
                2), pa.int64())}),
        batch_format="pyarrow").materialize()
    walk = rd.from_arrow(pa.table({
        "node": pa.array([seed], pa.int64()),
        "dist": pa.array([0], pa.int64()),
        "hops": pa.array([0], pa.int64())})).materialize()
    for r in range(1, max_hops + 1):
        frontier = _nonempty_blocks(walk.map_batches(
            lambda t, r=r: t.filter(pc.equal(t["hops"], r - 1))
            .select(["node", "dist"]), batch_format="pyarrow")
            .materialize())
        if frontier is None:
            break
        nbr = _nonempty_blocks(
            frontier.map_batches(
                lambda t: t.rename_columns(["u", "dist"]),
                batch_format="pyarrow")
            .join(both, join_type="inner", num_partitions=8, on=("u",))
            .materialize())
        if nbr is None:
            break
        cand = nbr.map_batches(
            lambda t, r=r: pa.table({
                "node": pc.cast(t["v"], pa.int64()),
                "dist": pa.array(
                    t["dist"].to_numpy(zero_copy_only=False)
                    + t["w"].to_numpy(zero_copy_only=False), pa.int64()),
                "hops": pa.array(np.full(t.num_rows, r, np.int64))}),
            batch_format="pyarrow")
        walk = (walk.union(cand).groupby(["node", "dist", "hops"])
                .aggregate(Count(alias_name="_n"))
                .select_columns(["node", "dist", "hops"]).materialize())
    return (walk.groupby("node")
            .aggregate(Min("dist", alias_name="dist")))


SSSP_SQL = """
WITH RECURSIVE e AS (
  SELECT DISTINCT
    LEAST(o_custkey, o_orderkey % 1500 + 1)    AS a,
    GREATEST(o_custkey, o_orderkey % 1500 + 1) AS b
  FROM orders
  WHERE o_custkey <> o_orderkey % 1500 + 1),
bo AS (SELECT a AS u, b AS v, 1 + (7 * a + 13 * b) % 9 AS w FROM e
       UNION ALL
       SELECT b AS u, a AS v, 1 + (7 * a + 13 * b) % 9 AS w FROM e),
walk(node, dist, hops) AS (
  SELECT 1 AS node, 0 AS dist, 0 AS hops
  UNION
  SELECT bo.v, w.dist + bo.w, w.hops + 1
  FROM walk w JOIN bo ON bo.u = w.node
  WHERE w.hops < 6)
SELECT CAST(node AS BIGINT) AS node,
       CAST(min(dist) AS BIGINT) AS dist
FROM walk GROUP BY node
"""


def theil_sen_daily_trend(sf_dir: str):
    """THEIL–SEN robust trend estimator over daily event volumes —
    the median of all pairwise day-over-day slopes (Theil'50, Sen'68),
    the monitoring-grade alternative to OLS that one outlier day
    cannot move. Slopes are ordered by the EXACT integer key
    floor(Δn·10¹² / Δday) (explicit floor-division CASE in the SQL —
    DuckDB ``//`` truncates toward zero where numpy floors, the
    CLAUDE.md rule); the median is emitted ×2 (lo+hi ranks) in the
    registry's even-count convention.

    Scale shape: ONE shuffle-free per-batch (day, n) combine + a
    calendar-bounded groupby; the O(days²) pair table (a month is
    ~435 pairs) folds on the driver."""
    ds = _read(sf_dir, "events", ["ts"])

    def days(t: pa.Table) -> pa.Table:
        d = (t["ts"].to_numpy().astype("datetime64[us]")
             .astype(np.int64)) // 86_400_000_000
        u, c = np.unique(d, return_counts=True)
        return pa.table({"day": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    daily = (ds.map_batches(days, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("n", alias_name="n")))
    rows = sorted((int(r["day"]), int(r["n"])) for r in daily.take_all())
    keys = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            dy = rows[j][1] - rows[i][1]
            dx = rows[j][0] - rows[i][0]
            keys.append((dy * 10**12) // dx)  # python // floors
    keys.sort()
    m = len(keys)
    med2 = keys[(m - 1) // 2] + keys[m // 2]
    return pa.table({
        "n_days": pa.array([len(rows)], pa.int64()),
        "n_pairs": pa.array([m], pa.int64()),
        "med_slope_e12_x2": pa.array([med2], pa.int64())})


THEIL_SEN_SQL = """
WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY day),
p AS (SELECT (b.n - a.n) AS dy, (b.day - a.day) AS dx
      FROM d a JOIN d b ON b.day > a.day),
k AS (SELECT CASE WHEN dy >= 0 THEN (dy * 1000000000000) // dx
                  ELSE -(((-dy) * 1000000000000 + dx - 1) // dx)
             END AS k
      FROM p),
r AS (SELECT k, row_number() OVER (ORDER BY k) AS rk,
             count(*) OVER () AS m
      FROM k)
SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
       CAST(max(m) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN rk = (m + 1) // 2 OR rk = m // 2 + 1
                     THEN k ELSE 0 END)
            + CASE WHEN max(m) % 2 = 1
                   THEN sum(CASE WHEN rk = (m + 1) // 2
                                 THEN k ELSE 0 END) ELSE 0 END
            AS BIGINT) AS med_slope_e12_x2
FROM r
"""


def trending_types_daily(sf_dir: str, topk: int = 3):
    """TRENDING report — per day, the top-``topk`` event types by
    volume with each type's previous-day rank and the rank delta (the
    dashboards' movers-and-shakers table). The heavy pass is one
    per-batch (day, type) combine into a calendar-bounded groupby
    (days × types rows); ranking and the day-over-day LAG run on that
    bounded table on the driver. Rank ties break by type (both
    sides); a type absent from the previous day gets prev_rank 0."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def part(t: pa.Table) -> pa.Table:
        d = (t["ts"].to_numpy().astype("datetime64[us]")
             .astype(np.int64)) // 86_400_000_000
        df = pd.DataFrame({
            "day": d,
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "n": 1})
        g = df.groupby(["day", "event_type"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (ds.map_batches(part, batch_format="pyarrow")
              .groupby(["day", "event_type"])
              .aggregate(Sum("n", alias_name="n")))
    df = counts.to_pandas()
    df = df.sort_values(["day", "n", "event_type"],
                        ascending=[True, False, True], kind="stable")
    df["rank"] = df.groupby("day").cumcount() + 1
    prev = df[["day", "event_type", "rank"]].copy()
    prev["day"] += 1
    prev = prev.rename(columns={"rank": "prev_rank"})
    out = df.merge(prev, on=["day", "event_type"], how="left")
    out["prev_rank"] = out["prev_rank"].fillna(0).astype(np.int64)
    out = out[out["rank"] <= topk]
    out["rank_delta"] = out["prev_rank"] - out["rank"]
    out.loc[out["prev_rank"] == 0, "rank_delta"] = 0
    out = out.sort_values(["day", "rank"]).reset_index(drop=True)
    return pa.table({
        "day": pa.array(out["day"].to_numpy(np.int64), pa.int64()),
        "event_type": pa.array(out["event_type"].tolist(), pa.string()),
        "n": pa.array(out["n"].to_numpy(np.int64), pa.int64()),
        "rank": pa.array(out["rank"].to_numpy(np.int64), pa.int64()),
        "prev_rank": pa.array(out["prev_rank"].to_numpy(np.int64),
                              pa.int64()),
        "rank_delta": pa.array(out["rank_delta"].to_numpy(np.int64),
                               pa.int64())})


TRENDING_SQL = """
WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, event_type,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
r AS (SELECT day, event_type, n,
             row_number() OVER (PARTITION BY day
                                ORDER BY n DESC, event_type) AS rank
      FROM c),
j AS (SELECT r.day, r.event_type, r.n, r.rank,
             COALESCE(p.rank, 0) AS prev_rank
      FROM r LEFT JOIN r p ON p.day = r.day - 1
                          AND p.event_type = r.event_type)
SELECT day, event_type, n, CAST(rank AS BIGINT) AS rank,
       CAST(prev_rank AS BIGINT) AS prev_rank,
       CAST(CASE WHEN prev_rank = 0 THEN 0
                 ELSE prev_rank - rank END AS BIGINT) AS rank_delta
FROM j WHERE rank <= 3
"""
