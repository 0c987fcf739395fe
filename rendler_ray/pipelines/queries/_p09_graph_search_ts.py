

def kendall_tau_docs(sf_dir: str):
    """KENDALL rank correlation between two per-doc signals (token
    count vs classifier score) as EXACT integer pair counts — the
    distribution-free "does quality rise with length" check (Kendall
    1938; tau-b's tie terms emitted separately so the caller owns the
    sqrt): concordant, discordant, tied-on-x-only, tied-on-y-only,
    tied-on-both over all C(n,2) doc pairs — never enumerated:
    the counts fold over the JOINT VALUE HISTOGRAM with a Fenwick
    tree over y-ranks (O(V log V) for V distinct (x, y) cells, the
    value-range-bounded table), processed in ascending-x groups. One
    shuffle-free scoring pass + one (x, y) groupby; the cell fold is
    gate-free because V is bounded by the signal ranges, not the
    corpus. SQL oracle: histogram self-join on the lexicographic
    ordered-pair condition (each unordered pair counted once)."""
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
        df = pd.DataFrame({"x": nt.astype(np.int64), "y": s, "n": 1})
        g = df.groupby(["x", "y"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (ds.map_batches(score, batch_format="pyarrow")
            .groupby(["x", "y"]).aggregate(Sum("n", alias_name="n")))
    ht = pa.concat_tables(
        hist.iter_batches(batch_size=None, batch_format="pyarrow"))
    x = ht["x"].to_numpy(zero_copy_only=False)
    y = ht["y"].to_numpy(zero_copy_only=False)
    n = ht["n"].to_numpy(zero_copy_only=False)
    o = np.lexsort((y, x))
    x, y, n = x[o], y[o], n[o]
    yr = np.searchsorted(np.unique(y), y)  # dense y ranks
    V = int(yr.max()) + 1 if len(yr) else 0
    tree = [0] * (V + 1)

    def fen_add(i: int, v: int) -> None:
        i += 1
        while i <= V:
            tree[i] += v
            i += i & (-i)

    def fen_sum(i: int) -> int:  # counts with rank < i
        s = 0
        while i > 0:
            s += tree[i]
            i -= i & (-i)
        return s

    nc = nd = tx = ty = txy = tot = 0
    i = 0
    while i < len(x):
        j = i
        while j < len(x) and x[j] == x[i]:
            j += 1
        gsum = int(n[i:j].sum())
        tx += (gsum * gsum - int((n[i:j] ** 2).sum())) // 2
        for k in range(i, j):
            r, c = int(yr[k]), int(n[k])
            below = fen_sum(r)
            at = fen_sum(r + 1) - below
            nc += c * below
            ty += c * at
            nd += c * (tot - below - at)
            txy += c * (c - 1) // 2
        for k in range(i, j):
            fen_add(int(yr[k]), int(n[k]))
            tot += int(n[k])
        i = j
    return pa.table({
        "n_docs": pa.array([tot], pa.int64()),
        "concordant": pa.array([nc], pa.int64()),
        "discordant": pa.array([nd], pa.int64()),
        "tied_x": pa.array([tx], pa.int64()),
        "tied_y": pa.array([ty], pa.int64()),
        "tied_xy": pa.array([txy], pa.int64())})


KENDALL_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
s AS (SELECT doc_id,
             CAST(count(*) AS BIGINT) AS x,
             CAST(sum((CAST('0x' || substr(md5(token), 1, 15) AS BIGINT)
                       % 1001) - 500) AS BIGINT) AS y
      FROM tok GROUP BY doc_id),
h AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY x, y),
p AS (SELECT
        CAST(COALESCE(sum(CASE WHEN a.x < b.x AND a.y < b.y
                               THEN a.n * b.n END), 0) AS BIGINT) AS nc,
        CAST(COALESCE(sum(CASE WHEN a.x < b.x AND a.y > b.y
                               THEN a.n * b.n END), 0) AS BIGINT) AS nd,
        CAST(COALESCE(sum(CASE WHEN a.x = b.x
                               THEN a.n * b.n END), 0) AS BIGINT) AS tx,
        CAST(COALESCE(sum(CASE WHEN a.x < b.x AND a.y = b.y
                               THEN a.n * b.n END), 0) AS BIGINT) AS ty
      FROM h a JOIN h b
        ON a.x < b.x OR (a.x = b.x AND a.y < b.y)),
t AS (SELECT CAST(sum(n) AS BIGINT) AS n_docs,
             CAST(sum(n * (n - 1) // 2) AS BIGINT) AS txy
      FROM h)
SELECT t.n_docs, p.nc AS concordant, p.nd AS discordant,
       p.tx AS tied_x, p.ty AS tied_y, t.txy AS tied_xy
FROM p, t
"""


def hourly_value_percentiles(sf_dir: str, n_hist: int = 1024):
    """Hour-of-day latency-style percentile bands — exact p50/p90/p99
    of the event value (cents) per hour cohort, the observability
    table every ops dashboard carries. Grouped EXACT order statistics
    via the shared ``_grouped_value_bisect`` engine (all 3×24 rank
    targets resolved together, no per-group sorts, nothing pulled);
    rank convention (n−1)·q // 100 + 1, the source_quartiles rule."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def keyed(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table({
            "hour": pa.array(((us // 3_600_000_000) % 24)
                             .astype("U2").astype(object), pa.string()),
            "cents": _cents(t["value"])})

    scored = ds.map_batches(keyed, batch_format="pyarrow").materialize()
    agg = scored.aggregate(Min("cents", alias_name="lo"),
                           Max("cents", alias_name="hi"))
    lo, hi = int(agg["lo"]), int(agg["hi"])
    cnts = (scored.groupby("hour")
            .aggregate(Count(alias_name="n")).take_all())
    state: dict[tuple[str, int], list[int]] = {}
    for r in cnts:
        n = int(r["n"])
        for w, q in enumerate((50, 90, 99)):
            state[(r["hour"], w)] = [lo, hi, (n - 1) * q // 100 + 1]
    sel = _grouped_value_bisect(scored, "hour", "cents", state, n_hist)
    hours = sorted({k[0] for k in state})
    return pa.table({
        "hour": pa.array([int(h) for h in hours], pa.int64()),
        "p50": pa.array([sel[(h, 0)] for h in hours], pa.int64()),
        "p90": pa.array([sel[(h, 1)] for h in hours], pa.int64()),
        "p99": pa.array([sel[(h, 2)] for h in hours], pa.int64())})


HOURLY_PCTL_SQL = """
WITH c AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events)
SELECT CAST(hour AS BIGINT) AS hour,
       CAST((list(cents ORDER BY cents))
            [(count(*) - 1) * 50 // 100 + 1] AS BIGINT) AS p50,
       CAST((list(cents ORDER BY cents))
            [(count(*) - 1) * 90 // 100 + 1] AS BIGINT) AS p90,
       CAST((list(cents ORDER BY cents))
            [(count(*) - 1) * 99 // 100 + 1] AS BIGINT) AS p99
FROM c GROUP BY hour
"""


def _matching_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic per-edge priority for greedy matching: a 31-bit
    multiplicative mix of the canonical endpoints (unique TOTAL order
    comes from tie-breaking on (a, b))."""
    return ((a * 2654435761 + b * 40503) % 2147483648).astype(np.int64)


def maximal_matching_graph(sf_dir: str, driver_max: int = 2_000_000):
    """GREEDY MAXIMAL MATCHING over the derived graph — the classic
    parallel symmetry-breaking primitive (local-minima rounds are
    Israeli–Itai'86 / Luby-style; with UNIQUE edge priorities the
    parallel fixpoint equals the sequential greedy scan, which makes
    the output deterministic and two-form checkable). Edge priority is
    a seeded mix with (a, b) tie-break.

    Scale shape: below the edge gate one driver scan over key-sorted
    edges; above it local-minima rounds — per round ONE per-vertex
    Min(packed key) groupby + one broadcast filter dropping matched
    vertices (O(nodes) driver state, the pagerank-broadcast bound);
    expected O(log n) rounds. Golden + invariants + sequential
    equality pytests (iterative — not SQL-expressible)."""
    edges = _orders_graph_edges(sf_dir).materialize()

    def keyed(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        k = _matching_key(a, b)
        packed = [f"{kk:010d}:{aa:012d}:{bb:012d}"
                  for kk, aa, bb in zip(k, a, b)]
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64()),
                         "p": pa.array(packed, pa.string())})

    if edges.count() <= driver_max:
        t = pa.concat_tables(
            edges.iter_batches(batch_size=None, batch_format="pyarrow"))
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        k = _matching_key(a, b)
        order = np.lexsort((b, a, k))
        matched: set[int] = set()
        out = []
        for i in order:
            u, v = int(a[i]), int(b[i])
            if u not in matched and v not in matched:
                matched.add(u)
                matched.add(v)
                out.append((u, v))
        out.sort()
        return pa.table({
            "a": pa.array([r[0] for r in out], pa.int64()),
            "b": pa.array([r[1] for r in out], pa.int64())})

    live = edges.map_batches(keyed, batch_format="pyarrow").materialize()
    sel_a: list[int] = []
    sel_b: list[int] = []
    while live.count() > 0:
        both = live.map_batches(
            lambda t: pa.table({
                "v": pa.array(np.concatenate(
                    [t["a"].to_numpy(), t["b"].to_numpy()]), pa.int64()),
                "p": pa.array(t["p"].to_pylist() * 2, pa.string())}),
            batch_format="pyarrow")
        vmin = both.groupby("v").aggregate(Min("p", alias_name="pmin"))
        vm = {int(r["v"]): r["pmin"] for r in vmin.take_all()}
        vref = ray.put(vm)

        def winners(t: pa.Table) -> pa.Table:
            m = ray.get(vref)
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            ps = t["p"].to_pylist()
            keep = [i for i in range(len(ps))
                    if m.get(int(a[i])) == ps[i]
                    and m.get(int(b[i])) == ps[i]]
            return t.take(pa.array(keep, pa.int64()))

        win = pa.concat_tables(
            live.map_batches(winners, batch_format="pyarrow")
            .iter_batches(batch_size=None, batch_format="pyarrow"))
        if win.num_rows == 0:
            break
        wa = win["a"].to_numpy(zero_copy_only=False)
        wb = win["b"].to_numpy(zero_copy_only=False)
        sel_a.extend(wa.tolist())
        sel_b.extend(wb.tolist())
        mref = ray.put(pa.array(np.concatenate([wa, wb]), pa.int64()))

        def drop(t: pa.Table) -> pa.Table:
            ms = ray.get(mref)
            keep = pc.and_(
                pc.invert(pc.is_in(t["a"], value_set=ms)),
                pc.invert(pc.is_in(t["b"], value_set=ms)))
            return t.filter(keep)

        live = live.map_batches(drop,
                                batch_format="pyarrow").materialize()
    rows = sorted(zip(sel_a, sel_b))
    return pa.table({
        "a": pa.array([r[0] for r in rows], pa.int64()),
        "b": pa.array([r[1] for r in rows], pa.int64())})


def consistent_hash_assignment(sf_dir: str, n_shards: int = 8,
                               vnodes: int = 16):
    """CONSISTENT-HASH ring assignment (Karger STOC'97, the
    memcached/Dynamo shard router) — doc → shard via the nearest
    clockwise virtual node, plus the same assignment with ONE shard
    added, and the moved flag: the op that demonstrates the ring's
    defining property (scale-out moves ~1/(S+1) of keys, not a full
    re-mod). Ring positions and doc positions use the registry's
    md5-15-hex convention so the ASOF-style SQL mirror is hash-exact.

    Scale shape: the ring (shards × vnodes rows) broadcasts once; the
    assignment is one stateless searchsorted pass — no shuffle."""
    import hashlib

    def ring(s: int) -> tuple[np.ndarray, np.ndarray]:
        pos, sh = [], []
        for j in range(s):
            for i in range(vnodes):
                pos.append(int(hashlib.md5(
                    f"s{j}:vn{i}".encode()).hexdigest()[:15], 16))
                sh.append(j)
        o = np.argsort(np.array(pos, np.int64), kind="stable")
        return (np.array(pos, np.int64)[o],
                np.array(sh, np.int64)[o])

    ring_a = ring(n_shards)
    ring_b = ring(n_shards + 1)
    rref = ray.put((ring_a, ring_b))
    ds = _read(sf_dir, "documents", ["doc_id"])

    def assign(t: pa.Table) -> pa.Table:
        (pa_pos, pa_sh), (pb_pos, pb_sh) = ray.get(rref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = np.array([int(hashlib.md5(
            str(int(d)).encode()).hexdigest()[:15], 16)
            for d in ids], np.int64)
        ia = np.searchsorted(pa_pos, h, side="left") % len(pa_pos)
        ib = np.searchsorted(pb_pos, h, side="left") % len(pb_pos)
        sa, sb = pa_sh[ia], pb_sh[ib]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "shard": pa.array(sa, pa.int64()),
            "shard_plus": pa.array(sb, pa.int64()),
            "moved": pa.array((sa != sb).astype(np.int64), pa.int64())})

    return ds.map_batches(assign, batch_format="pyarrow")


CONSISTENT_HASH_SQL = """
WITH ring AS (
  SELECT j.s AS shard, 8 AS ns,
         CAST('0x' || substr(md5('s' || CAST(j.s AS VARCHAR) || ':vn'
              || CAST(i.v AS VARCHAR)), 1, 15) AS BIGINT) AS pos
  FROM generate_series(0, 7) j(s), generate_series(0, 15) i(v)
  UNION ALL
  SELECT j.s AS shard, 9 AS ns,
         CAST('0x' || substr(md5('s' || CAST(j.s AS VARCHAR) || ':vn'
              || CAST(i.v AS VARCHAR)), 1, 15) AS BIGINT) AS pos
  FROM generate_series(0, 8) j(s), generate_series(0, 15) i(v)),
d AS (SELECT doc_id,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
      FROM documents),
pick AS (
  SELECT d.doc_id, r.ns,
         COALESCE(
           min_by(r.shard, r.pos) FILTER (WHERE r.pos >= d.h),
           min_by(r.shard, r.pos)) AS shard
  FROM d CROSS JOIN ring r
  GROUP BY d.doc_id, r.ns)
SELECT a.doc_id, a.shard, b.shard AS shard_plus,
       CAST(a.shard <> b.shard AS BIGINT) AS moved
FROM pick a JOIN pick b ON b.doc_id = a.doc_id AND b.ns = 9
WHERE a.ns = 8
"""


def weekly_active_users(sf_dir: str):
    """Rolling 7-day DISTINCT user counts (WAU) per day — the
    engagement metric whose sliding DISTINCT cannot be merged from
    daily counts (a user active twice in the window counts once).
    Exact shape: composite-key distinct (user, day) pairs (the skew-
    proof distinct of distinct_users_by_type), a stateless 7-day
    target explode (each pair contributes to 7 window anchors), a
    second distinct, and a calendar-bounded count fold. Output days
    are restricted to days present in the data (both sides)."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "day": us // 86_400_000_000}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    uniq = (ds.map_batches(pairs, batch_format="pyarrow")
            .groupby(["user_id", "day"]).aggregate(Count(alias_name="_n"))
            .select_columns(["user_id", "day"])).materialize()
    day_rows = (uniq.groupby("day").aggregate(Count(alias_name="_n"))
                .take_all())
    days = {int(r["day"]) for r in day_rows}
    dref = ray.put(np.array(sorted(days), np.int64))

    def explode(t: pa.Table) -> pa.Table:
        dv = ray.get(dref)
        u = np.repeat(t["user_id"].to_numpy(zero_copy_only=False), 7)
        td = (np.repeat(t["day"].to_numpy(zero_copy_only=False), 7)
              + np.tile(np.arange(7, dtype=np.int64), t.num_rows))
        keep = np.isin(td, dv)
        df = pd.DataFrame({"user_id": u[keep],
                           "day": td[keep]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    return (uniq.map_batches(explode, batch_format="pyarrow")
            .groupby(["user_id", "day"]).aggregate(Count(alias_name="_n"))
            .map_batches(lambda t: t.select(["day"]).append_column(
                "u", pa.array(np.ones(t.num_rows, np.int64))),
                batch_format="pyarrow")
            .groupby("day").aggregate(Sum("u", alias_name="wau")))


WAU_SQL = """
WITH p AS (SELECT DISTINCT user_id,
                  epoch_us(ts) // 86400000000 AS day
           FROM events),
days AS (SELECT DISTINCT day FROM p),
x AS (SELECT DISTINCT p.user_id, p.day + o.o AS day
      FROM p, generate_series(0, 6) o(o))
SELECT x.day, CAST(count(*) AS BIGINT) AS wau
FROM x JOIN days ON days.day = x.day
GROUP BY x.day
"""


class _MaxSimScan:
    """``map_batches`` actor stage for late-interaction retrieval:
    the chunker + embedder stub build ONCE per actor; per batch,
    chunk each doc into 32-token windows (≤8), embed all chunks in
    one vectorized call, score maxsim = Σ_qvec max_chunk cosine, and
    emit per-batch partial top-k rows."""

    def __init__(self, qref, k: int):
        from rendler_ray.stages.embed import TextEmbedder

        self.q = ray.get(qref)  # {qid: (c_q × dim) normalized}
        self.embed = TextEmbedder()
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = ids >= 4  # the 4 query docs are not corpus
        if not keep.any():
            return empty
        ids = ids[keep]
        texts = [x for x, m in zip(t["text"].to_pylist(), keep) if m]
        c_doc, c_txt = [], []
        for d, txt in zip(ids.tolist(), texts):
            toks = txt.split(" ")
            for s in range(0, min(len(toks), 8 * 32), 32):
                c_doc.append(d)
                c_txt.append(" ".join(toks[s: s + 32]))
        ct = self.embed(pa.table({"text": pa.array(c_txt, pa.string())}))
        cm = np.stack([np.asarray(v, np.float64)
                       for v in ct["embedding"].to_pylist()])
        cdoc = np.array(c_doc, np.int64)
        udoc, inv = np.unique(cdoc, return_inverse=True)
        out_q, out_v, out_s = [], [], []
        for qid in sorted(self.q):
            qm = self.q[qid]               # (c_q, dim)
            sims = qm @ cm.T               # (c_q, n_chunks)
            per_doc = np.full((len(qm), len(udoc)), -2.0)
            np.maximum.at(per_doc, (slice(None), inv), sims)
            score = per_doc.sum(axis=0)    # Σ_qvec max_chunk
            kk = min(self.k, len(udoc))
            sel = np.argpartition(-score, kk - 1)[:kk] \
                if len(udoc) > kk else np.arange(len(udoc))
            out_q.extend([qid] * len(sel))
            out_v.extend(udoc[sel].tolist())
            out_s.extend(score[sel].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})


def maxsim_multivector_topk(sf_dir: str, k: int = 10):
    """LATE-INTERACTION (ColBERT-style, Khattab SIGIR'20) multi-vector
    retrieval over the documents table: each doc and query is a BAG of
    32-token chunk vectors (the sandbox's deterministic TextEmbedder
    stub — the plumbing is the real shape), score =
    Σ_{query vec} max_{doc vec} cosine. Query docs 0–3 come from a
    PUSHED-DOWN filtered read; their chunk matrices broadcast once;
    ONE actor-pool scan chunks+embeds+scores each batch (doc chunks
    never leave their batch) and emits partial top-k; the shared
    fixed-point reduce finishes. Golden + driver-brute pytest
    (model-stub op — not SQL-expressible)."""
    import pyarrow.dataset as pds

    from rendler_ray.stages.embed import TextEmbedder

    qt = pa.concat_tables(
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"],
                        filter=pds.field("doc_id") < 4)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    emb = TextEmbedder()
    qmats: dict[int, np.ndarray] = {}
    for d, txt in zip(qt["doc_id"].to_pylist(), qt["text"].to_pylist()):
        toks = txt.split(" ")
        chunks = [" ".join(toks[s: s + 32])
                  for s in range(0, min(len(toks), 4 * 32), 32)]
        et = emb(pa.table({"text": pa.array(chunks, pa.string())}))
        qmats[int(d)] = np.stack([np.asarray(v, np.float64)
                                  for v in et["embedding"].to_pylist()])
    qref = ray.put(qmats)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    cands = ds.map_batches(_MaxSimScan, fn_constructor_kwargs={
        "qref": qref, "k": k}, concurrency=(1, 4),
        batch_format="pyarrow", num_cpus=1)
    return cands.groupby("query_id").map_groups(
        F_ann.topk_reduce(k), batch_format="pandas")


def boolean_search_docs(sf_dir: str):
    """BOOLEAN retrieval (AND / OR / AND-NOT posting algebra) for the
    shared 2-term query set — the set-operation layer under every
    search stack (BM25 ranks; booleans FILTER). One shuffle-free pass:
    per batch, each query term's doc set comes from one vectorized
    token-equality mask (docs never re-tokenized per term), and the
    three set modes emit (query_id, mode, doc_id) rows — no postings
    shuffle because each doc lives in exactly one batch."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    qref = ray.put(_BM25_QUERIES)

    def modes(t: pa.Table) -> pa.Table:
        qs = ray.get(qref)
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_q, out_m, out_d = [], [], []
        for qid in sorted(qs):
            t1, t2 = qs[qid]
            h1 = np.zeros(t.num_rows, bool)
            h2 = np.zeros(t.num_rows, bool)
            h1[par[flat == t1]] = True
            h2[par[flat == t2]] = True
            for mode, mask in (("and", h1 & h2), ("or", h1 | h2),
                               ("not", h1 & ~h2)):
                sel = ids[mask]
                out_q.extend([qid] * len(sel))
                out_m.extend([mode] * len(sel))
                out_d.extend(sel.tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "mode": pa.array(out_m, pa.string()),
                         "doc_id": pa.array(out_d, pa.int64())})

    return ds.map_batches(modes, batch_format="pyarrow")


BOOLEAN_SEARCH_SQL = """
WITH q(query_id, t1, t2) AS (VALUES
  (0, 'hash', 'join'), (1, 'sort', 'merge'),
  (2, 'window', 'stream'), (3, 'table', 'scan')),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents),
p AS (SELECT q.query_id, t.doc_id,
             max(CASE WHEN t.token = q.t1 THEN 1 ELSE 0 END) AS h1,
             max(CASE WHEN t.token = q.t2 THEN 1 ELSE 0 END) AS h2
      FROM tok t CROSS JOIN q
      WHERE t.token = q.t1 OR t.token = q.t2
      GROUP BY q.query_id, t.doc_id)
SELECT query_id, 'and' AS mode, doc_id FROM p WHERE h1 = 1 AND h2 = 1
UNION ALL
SELECT query_id, 'or' AS mode, doc_id FROM p
UNION ALL
SELECT query_id, 'not' AS mode, doc_id FROM p WHERE h1 = 1 AND h2 = 0
"""


def postings_compression_stats(sf_dir: str, topk: int = 100):
    """Inverted-index POSTINGS COMPRESSION report — per high-df token,
    the byte cost of its sorted doc-id posting list under delta +
    varint (LEB128) coding vs raw int64, the storage decision every
    search/lakehouse index makes (gap coding is why postings compress
    ~10×). Exact integers: gaps over the sorted DISTINCT doc ids
    (first element encoded as id+1 so zero never hits the varint),
    varint size via the 128^k ladder — mirrored as a CASE ladder in
    the SQL.

    Scale shape: the top-``topk`` vocabulary cut reuses
    ``_token_freq_topk`` (driver Arrow fold under its gate); the gap
    pass filters to those tokens (broadcast set), one (token, doc)
    distinct combiner, one ``map_groups`` per token — ``topk``
    bounded."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    top = _token_freq_topk(ds, topk)  # token strings, freq-desc
    toks = pa.array(list(top), pa.string())
    tref = ray.put(toks)

    def pairs(t: pa.Table) -> pa.Table:
        keep = ray.get(tref)
        lst = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = lst.values
        par = pc.list_parent_indices(lst).to_numpy(zero_copy_only=False)
        m = pc.is_in(flat, value_set=keep).to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "token": flat.to_numpy(zero_copy_only=False)[m],
            "doc_id": ids[par[m]]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    uniq = (ds.map_batches(pairs, batch_format="pyarrow")
            .groupby(["token", "doc_id"]).aggregate(Count(alias_name="_n"))
            .select_columns(["token", "doc_id"]))
    bounds = 128.0 ** np.arange(1, 10)  # float: 128^9 overflows int64

    def encode(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy(np.int64))
        gaps = np.diff(ids, prepend=-1)  # first element coded as id+1
        nbytes = np.digitize(gaps.astype(np.float64), bounds) + 1
        df = len(ids)
        var = int(nbytes.sum())
        return pd.DataFrame({
            "token": [g["token"].iloc[0]],
            "df": [np.int64(df)],
            "raw_bytes": [np.int64(8 * df)],
            "varint_bytes": [np.int64(var)],
            "ratio_e6": [np.int64(8 * df * 1_000_000 // var)]})

    return uniq.groupby("token").map_groups(encode,
                                            batch_format="pandas")


POSTINGS_COMPRESSION_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
freq AS (SELECT token, count(*) AS c FROM tok GROUP BY token
         ORDER BY c DESC, token LIMIT 100),
p AS (SELECT DISTINCT t.token, t.doc_id FROM tok t
      JOIN freq USING (token)),
g AS (SELECT token,
             doc_id - COALESCE(lag(doc_id) OVER (PARTITION BY token
                                                 ORDER BY doc_id), -1)
               AS gap
      FROM p),
b AS (SELECT token,
             CASE WHEN gap < 128 THEN 1
                  WHEN gap < 16384 THEN 2
                  WHEN gap < 2097152 THEN 3
                  WHEN gap < 268435456 THEN 4
                  WHEN gap < 34359738368 THEN 5
                  WHEN gap < 4398046511104 THEN 6
                  WHEN gap < 562949953421312 THEN 7
                  WHEN gap < 72057594037927936 THEN 8
                  ELSE 9 END AS nb
      FROM g)
SELECT token, CAST(count(*) AS BIGINT) AS df,
       CAST(8 * count(*) AS BIGINT) AS raw_bytes,
       CAST(sum(nb) AS BIGINT) AS varint_bytes,
       CAST(8 * count(*) * 1000000 // sum(nb) AS BIGINT) AS ratio_e6
FROM b GROUP BY token
"""


def cohort_retention_weeks(sf_dir: str):
    """COHORT RETENTION MATRIX — the product-analytics staple: users
    grouped by their first-activity DAY (cohort), each cell
    (cohort_day, week_offset) counting distinct users from that cohort
    active offset weeks later (day-grain cohorts × week-grain offsets
    — the corpus spans ~a month, so day cohorts keep the matrix
    non-degenerate while week offsets keep it readable). Exact shape:
    per-user Min(day) (one groupby), composite-key distinct
    (user, week-of-activity) pairs, ONE int-keyed hash join to attach
    cohorts, and a days×weeks-bounded count fold — no per-user state
    on the driver."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "day": us // 86_400_000_000}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    uniq = (ds.map_batches(pairs, batch_format="pyarrow")
            .groupby(["user_id", "day"])
            .aggregate(Count(alias_name="_n"))
            .select_columns(["user_id", "day"])).materialize()
    from rendler_ray.state.politeness import _nonempty_blocks

    first = _nonempty_blocks(
        (uniq.groupby("user_id")
         .aggregate(Min("day", alias_name="d0"))
         .map_batches(lambda t: pa.table({
             "user_id": pc.cast(t["user_id"], pa.int64()),
             "d0": pc.cast(t["d0"], pa.int64())}),
             batch_format="pyarrow")).materialize())
    joined = uniq.join(first, join_type="inner", num_partitions=8,
                       on=("user_id",))
    pairs2 = joined.map_batches(
        lambda t: pa.Table.from_pandas(pd.DataFrame({
            "cohort_day": t["d0"].to_numpy(zero_copy_only=False),
            "week_offset": (t["day"].to_numpy(zero_copy_only=False)
                            - t["d0"].to_numpy(zero_copy_only=False))
            // 7,
            "user_id": t["user_id"].to_numpy(zero_copy_only=False)})
            .drop_duplicates(), preserve_index=False),
        batch_format="pyarrow")
    return (pairs2.groupby(["cohort_day", "week_offset", "user_id"])
            .aggregate(Count(alias_name="_n"))
            .map_batches(lambda t: pa.table({
                "cohort_day": pc.cast(t["cohort_day"], pa.int64()),
                "week_offset": pc.cast(t["week_offset"], pa.int64()),
                "u": pa.array(np.ones(t.num_rows, np.int64))}),
                batch_format="pyarrow")
            .groupby(["cohort_day", "week_offset"])
            .aggregate(Sum("u", alias_name="n_users")))


COHORT_RETENTION_SQL = """
WITH p AS (SELECT DISTINCT user_id,
                  epoch_us(ts) // 86400000000 AS day
           FROM events),
f AS (SELECT user_id, min(day) AS d0 FROM p GROUP BY user_id),
x AS (SELECT DISTINCT f.d0 AS cohort_day,
             (p.day - f.d0) // 7 AS week_offset, p.user_id
      FROM p JOIN f ON f.user_id = p.user_id)
SELECT cohort_day, CAST(week_offset AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM x GROUP BY 1, 2
"""

# Poisson(1) inverse-CDF thresholds on the md5-15-hex 60-bit uniform:
# draw k = #{j : u >= T_j}, capped at 8 (P(k>8) ~ 1e-6; the cap is
# mirrored in the SQL so exactness holds). Literals derive from one
# import-time computation shared by BOTH sides.
_POIS_T = []
_acc, _term = 0.0, 1.0
import math as _math  # noqa: E402

for _k in range(8):
    _term = _math.exp(-1.0) if _k == 0 else _term / _k
    _acc += _term
    _POIS_T.append(int(_acc * 16 ** 15))
del _acc, _term, _k


def bootstrap_mean_ci_events(sf_dir: str, n_reps: int = 8):
    """POISSON BOOTSTRAP of the mean order value (Chamandy/Google
    'Estimating Uncertainty for Massive Data Streams', the
    one-pass-replicate trick): each event joins replicate b with a
    DETERMINISTIC Poisson(1) weight drawn from md5(event_id:b) via the
    inverse CDF, so all ``n_reps`` resampled means come out of ONE
    streaming pass — no per-replicate rescans, no RNG state — and the
    draw is exactly SQL-expressible (the cms_user_counts philosophy:
    a deterministic sketch IS oracle-checkable). Emits per replicate
    the exact integer (n_eff, sum_c, mean_e6); the spread across rows
    is the bootstrap CI."""
    import hashlib

    ds = _read(sf_dir, "events", ["event_id", "value"])

    def reps(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        thr = np.array(_POIS_T, np.int64)
        out_b, out_n, out_s = [], [], []
        for b in range(n_reps):
            u = np.array([int(hashlib.md5(
                f"{e}:{b}".encode()).hexdigest()[:15], 16)
                for e in ids.tolist()], np.int64)
            w = (u[:, None] >= thr[None, :]).sum(axis=1)
            out_b.append(b)
            out_n.append(int(w.sum()))
            out_s.append(int((w * c).sum()))
        return pa.table({"b": pa.array(out_b, pa.int64()),
                         "n_eff": pa.array(out_n, pa.int64()),
                         "sum_c": pa.array(out_s, pa.int64())})

    folded = (ds.map_batches(reps, batch_format="pyarrow")
              .groupby("b").aggregate(Sum("n_eff", alias_name="n_eff"),
                                      Sum("sum_c", alias_name="sum_c")))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_eff"].to_numpy(zero_copy_only=False)
        s = t["sum_c"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "mean_e6", pa.array(s * 1_000_000 // np.maximum(n, 1),
                                pa.int64()))

    return folded.map_batches(finish, batch_format="pyarrow")


BOOTSTRAP_SQL = f"""
WITH e AS (SELECT event_id, CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
r AS (SELECT b.b, e.c,
             CAST('0x' || substr(md5(CAST(e.event_id AS VARCHAR) || ':'
                  || CAST(b.b AS VARCHAR)), 1, 15) AS BIGINT) AS u
      FROM e, generate_series(0, 7) b(b)),
w AS (SELECT b, c,
             {" + ".join(f"(CASE WHEN u >= {t} THEN 1 ELSE 0 END)"
                         for t in _POIS_T)} AS w
      FROM r)
SELECT CAST(b AS BIGINT) AS b,
       CAST(sum(w) AS BIGINT) AS n_eff,
       CAST(sum(w * c) AS BIGINT) AS sum_c,
       CAST(sum(w * c) * 1000000 // greatest(sum(w), 1) AS BIGINT)
         AS mean_e6
FROM w GROUP BY b
"""


def federated_union_ingest(sf_dir: str):
    """FEDERATED multi-format ingest — one logical table striped
    across three physical formats (event_id % 3: parquet stays at the
    source, CSV and JSONL shards under the cached ingest dir), read
    with three sources, UNIONed, and aggregated — the landing-zone
    reality where history lives in parquet and fresh drops arrive as
    CSV/JSONL. The oracle is the plain full-table SQL: the federation
    must be lossless and bit-exact."""
    import shutil

    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    tag = (f"{os.path.basename(os.path.normpath(sf_dir))}"
           f"_{int(st.st_mtime)}_{st.st_size}")
    root = f"/tmp/rendler_ray_ingest/{tag}/events_fed"

    def conv(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t["event_id"],
                         "ts_us": pc.cast(t["ts"], pa.int64()),
                         "user_id": t["user_id"],
                         "event_type": t["event_type"],
                         "cents": _cents(t["value"])})

    if not os.path.exists(root + ".done"):
        base = rd.read_parquet(
            src, columns=["event_id", "ts", "user_id", "event_type",
                          "value"]).map_batches(conv,
                                                batch_format="pyarrow")
        shutil.rmtree(root, ignore_errors=True)
        base.map_batches(
            lambda t: t.filter(pa.array(
                t["event_id"].to_numpy(zero_copy_only=False) % 3 == 1)),
            batch_format="pyarrow").write_csv(root + "/csv")
        base.map_batches(
            lambda t: t.filter(pa.array(
                t["event_id"].to_numpy(zero_copy_only=False) % 3 == 2)),
            batch_format="pyarrow").write_json(root + "/json")
        open(root + ".done", "w").close()

    pq_leg = rd.read_parquet(
        src, columns=["event_id", "ts", "user_id", "event_type",
                      "value"]).map_batches(conv, batch_format="pyarrow"
                                            ).map_batches(
        lambda t: t.filter(pa.array(
            t["event_id"].to_numpy(zero_copy_only=False) % 3 == 0)),
        batch_format="pyarrow")
    csv_leg = rd.read_csv(root + "/csv")
    json_leg = rd.read_json(root + "/json")

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": pc.cast(t["event_type"],
                                               pa.string()),
                         "cents": pc.cast(t["cents"], pa.int64()),
                         "ts_us": pc.cast(t["ts_us"], pa.int64())})

    legs = [leg.map_batches(norm, batch_format="pyarrow")
            for leg in (pq_leg, csv_leg, json_leg)]
    return (legs[0].union(legs[1]).union(legs[2])
            .groupby("event_type")
            .aggregate(Count(alias_name="n_events"),
                       Sum("cents", alias_name="sum_cents"),
                       Min("ts_us", alias_name="first_us"),
                       Max("ts_us", alias_name="last_us")))


def rle_column_stats(sf_dir: str):
    """RUN-LENGTH ENCODING layout report — for each candidate column
    (event_type, user_id), the exact run count in arrival (ts,
    event_id) order vs the sorted layout (where runs collapse to the
    distinct count), with the 12-bytes-per-run vs 8-bytes-per-row cost
    model: the measurement behind every 'sort by low-cardinality
    columns before writing' lakehouse rule. The neighbor comparison is
    a distributed zip-with-index (`with_row_seq`) + ONE int-keyed
    shifted self-join — no ordered full scan on the driver; the SQL
    mirror is a LAG window."""
    from rendler_ray.util import with_row_seq

    ds = _read(sf_dir, "events", ["ts", "event_id", "user_id",
                                  "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "event_type": t["event_type"]})

    keyed = with_row_seq(ds.map_batches(prep, batch_format="pyarrow"),
                         ["ts_us", "event_id"], start=0,
                         column="seq").materialize()
    nxt = keyed.map_batches(
        lambda t: pa.table({
            "seq": pa.array(t["seq"].to_numpy(zero_copy_only=False) - 1,
                            pa.int64()),
            "nt": t["event_type"], "nu": t["user_id"]}),
        batch_format="pyarrow")
    joined = keyed.join(nxt, join_type="inner", num_partitions=8,
                        on=("seq",))

    def changes(t: pa.Table) -> pa.Table:
        ct = (t["event_type"].to_numpy(zero_copy_only=False)
              != t["nt"].to_numpy(zero_copy_only=False)).sum()
        cu = (t["user_id"].to_numpy(zero_copy_only=False)
              != t["nu"].to_numpy(zero_copy_only=False)).sum()
        return pa.table({"col": pa.array(["event_type", "user_id"]),
                         "chg": pa.array([int(ct), int(cu)], pa.int64())})

    chg = {r["col"]: int(r["chg"])
           for r in (joined.map_batches(changes, batch_format="pyarrow")
                     .groupby("col").aggregate(Sum("chg",
                                                   alias_name="chg"))
                     .take_all())}
    n = keyed.count()
    dt = (keyed.groupby("event_type").aggregate(Count(alias_name="_n"))
          .count())
    du = (keyed.groupby("user_id").aggregate(Count(alias_name="_n"))
          .count())
    rows = []
    for col, dn in (("event_type", dt), ("user_id", du)):
        runs = chg.get(col, 0) + (1 if n else 0)
        rows.append((col, n, runs, dn, 8 * n, 12 * runs, 12 * dn))
    return pa.table({
        "col": pa.array([r[0] for r in rows], pa.string()),
        "n_rows": pa.array([r[1] for r in rows], pa.int64()),
        "runs_time_order": pa.array([r[2] for r in rows], pa.int64()),
        "n_distinct": pa.array([r[3] for r in rows], pa.int64()),
        "raw_bytes": pa.array([r[4] for r in rows], pa.int64()),
        "rle_bytes_time": pa.array([r[5] for r in rows], pa.int64()),
        "rle_bytes_sorted": pa.array([r[6] for r in rows], pa.int64())})


RLE_STATS_SQL = """
WITH o AS (SELECT event_type, user_id,
                  lag(event_type) OVER w AS pt,
                  lag(user_id) OVER w AS pu
           FROM events
           WINDOW w AS (ORDER BY ts, event_id)),
s AS (SELECT
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN pt IS NULL OR event_type <> pt
                      THEN 1 ELSE 0 END) AS BIGINT) AS rt,
        CAST(sum(CASE WHEN pu IS NULL OR user_id <> pu
                      THEN 1 ELSE 0 END) AS BIGINT) AS ru,
        CAST(count(DISTINCT event_type) AS BIGINT) AS dt,
        CAST(count(DISTINCT user_id) AS BIGINT) AS du
      FROM o)
SELECT 'event_type' AS col, n AS n_rows, rt AS runs_time_order,
       dt AS n_distinct, 8 * n AS raw_bytes,
       12 * rt AS rle_bytes_time, 12 * dt AS rle_bytes_sorted
FROM s
UNION ALL
SELECT 'user_id' AS col, n, ru, du, 8 * n, 12 * ru, 12 * du FROM s
"""


def kmv_distinct_users(sf_dir: str, k: int = 64):
    """KMV (k-minimum-values) distinct-count sketch per event_type
    (Bar-Yossef et al. RANDOM'02; Beyer et al. SIGMOD'07 unbiased
    estimator): keep the k smallest DISTINCT 60-bit md5 hashes of
    user_id; if fewer than k distinct hashes exist the count is exact,
    else the k-th order statistic h_k estimates d ≈ (k−1)·2^60/h_k.
    Unlike HLL the sketch is fully deterministic, so the DuckDB oracle
    reproduces it bit-exactly (the cms_user_counts philosophy) — this
    is the mergeable distinct sketch lakehouses persist per partition
    and fold at query time.

    Scale shape: per batch ONE md5 per unique user and a per-type
    prune to the k smallest hashes, so the exchange carries ≤ k·types
    rows per batch regardless of corpus size; the per-type merge
    (distinct union, take k smallest) is the standard KMV sketch union
    over ≤ k·n_batches rows. The estimate uses Python-int arithmetic —
    (k−1)·2^60 overflows int64; the SQL mirrors with HUGEINT."""
    import hashlib

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def prune(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "u": t["user_id"].to_numpy(zero_copy_only=False)}) \
            .drop_duplicates()
        hmap = {int(u): int(hashlib.md5(str(int(u)).encode())
                            .hexdigest()[:15], 16)
                for u in df["u"].unique().tolist()}
        df["h"] = df["u"].map(hmap).astype(np.int64)
        df = df.sort_values("h", kind="stable") \
               .groupby("event_type", sort=False).head(k)
        return pa.Table.from_pandas(df[["event_type", "h"]],
                                    preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        hs = np.unique(g["h"].to_numpy(np.int64))[:k]
        n_kept = len(hs)
        kth = int(hs[-1])
        est = n_kept if n_kept < k else (k - 1) * (16 ** 15) // kth
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_kept": [np.int64(n_kept)],
            "kth_hash": [np.int64(kth)],
            "est_distinct": [np.int64(est)]})

    return (ds.map_batches(prune, batch_format="pyarrow")
            .groupby("event_type").map_groups(merge,
                                              batch_format="pandas"))


KMV_SQL = """
WITH h AS (SELECT DISTINCT event_type,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
           FROM events),
r AS (SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h)
               AS rk
      FROM h)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(max(h) AS BIGINT) AS kth_hash,
       CAST(CASE WHEN count(*) < 64 THEN count(*)
            ELSE CAST(63 AS HUGEINT) * 1152921504606846976 // max(h)
            END AS BIGINT) AS est_distinct
FROM r WHERE rk <= 64 GROUP BY event_type
"""


def pit_join_events(sf_dir: str):
    """POINT-IN-TIME (temporal) join — the feature-store lookup every
    training-set builder runs: the even-event_id half of the stream
    builds an SCD2 event_type dimension (``_scd2_intervals``), and
    each odd-event_id event probes its user's history AS OF its own
    timestamp ([valid_from, valid_to) half-open; 'none'/version 0
    before the user's first interval). PIT-correct lookups are what
    keep feature leakage out of training data; the even/odd split is
    the registry's standard two-stream derivation
    (markov_next_type_eval's convention).

    Scale shape: dimension and probe streams are tagged into one
    schema and co-partitioned by ONE groupby(user_id); the per-user
    resolve is a vectorized searchsorted of probe times into that
    user's interval starts — no per-probe scans, no driver state, and
    a user's intervals and probes meet exactly once."""
    def even_rows(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 2 == 0))

    dim = _scd2_intervals(
        _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                 "event_type"])
        .map_batches(even_rows, batch_format="pyarrow"))

    def dim_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "kind": pa.array(np.zeros(n, np.int64)),
            "t_epoch": pc.cast(t["valid_from"], pa.int64()),
            "valid_to": pc.cast(t["valid_to"], pa.int64()),
            "event_type": pc.cast(t["event_type"], pa.string()),
            "version": pc.cast(t["version"], pa.int64()),
            "event_id": pa.array(np.zeros(n, np.int64))})

    def probe_rows(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        m = ids % 2 == 1
        ts = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)[m] // 1_000_000
        n = int(m.sum())
        return pa.table({
            "user_id": pa.array(
                t["user_id"].to_numpy(zero_copy_only=False)[m],
                type=pa.int64()),
            "kind": pa.array(np.ones(n, np.int64)),
            "t_epoch": pa.array(ts, type=pa.int64()),
            "valid_to": pa.array(np.zeros(n, np.int64)),
            "event_type": pa.array([""] * n, pa.string()),
            "version": pa.array(np.zeros(n, np.int64)),
            "event_id": pa.array(ids[m], type=pa.int64())})

    probes = _read(sf_dir, "events", ["event_id", "ts", "user_id"]) \
        .map_batches(probe_rows, batch_format="pyarrow")
    tagged = dim.map_batches(dim_rows, batch_format="pyarrow") \
        .union(probes)

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["kind"] == 0].sort_values("t_epoch", kind="stable")
        p = g[g["kind"] == 1]
        if len(p) == 0:
            return pd.DataFrame({
                "event_id": pd.Series(dtype=np.int64),
                "user_id": pd.Series(dtype=np.int64),
                "t_epoch": pd.Series(dtype=np.int64),
                "event_type": pd.Series(dtype=object),
                "version": pd.Series(dtype=np.int64)})
        t = p["t_epoch"].to_numpy(np.int64)
        if len(d) == 0:
            et = np.full(len(p), "none", object)
            ver = np.zeros(len(p), np.int64)
        else:
            vf = d["t_epoch"].to_numpy(np.int64)
            vt = d["valid_to"].to_numpy(np.int64)
            idx = np.searchsorted(vf, t, side="right") - 1
            idxc = np.clip(idx, 0, None)
            ok = (idx >= 0) & (t < vt[idxc])
            et = np.where(ok, d["event_type"].to_numpy(object)[idxc],
                          "none")
            ver = np.where(ok, d["version"].to_numpy(np.int64)[idxc], 0)
        return pd.DataFrame({
            "event_id": p["event_id"].to_numpy(np.int64),
            "user_id": p["user_id"].to_numpy(np.int64),
            "t_epoch": t,
            "event_type": et,
            "version": ver.astype(np.int64)})

    return tagged.groupby("user_id").map_groups(resolve,
                                                batch_format="pandas")


PIT_JOIN_SQL = """
WITH src AS (SELECT * FROM events WHERE event_id % 2 = 0),
e AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM src WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
r AS (SELECT user_id, event_type, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS version
      FROM e),
v AS (SELECT user_id, event_type, CAST(version AS BIGINT) AS version,
             CAST(floor(epoch(min(ts))) AS BIGINT) AS valid_from
      FROM r GROUP BY user_id, event_type, version),
dim AS (SELECT user_id, event_type, version, valid_from,
               COALESCE(lead(valid_from) OVER (PARTITION BY user_id
                                               ORDER BY version),
                        4102444800) AS valid_to
        FROM v),
p AS (SELECT event_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS t_epoch
      FROM events WHERE event_id % 2 = 1)
SELECT p.event_id, p.user_id, p.t_epoch,
       COALESCE(d.event_type, 'none') AS event_type,
       CAST(COALESCE(d.version, 0) AS BIGINT) AS version
FROM p LEFT JOIN dim d
  ON d.user_id = p.user_id
 AND d.valid_from <= p.t_epoch AND p.t_epoch < d.valid_to
"""


# fixed (pre, suf) wildcard query set for pre*suf token search — chosen
# to span selectivities over the synthetic corpus vocabulary
_WILDCARD_QUERIES = {0: ("s", ""), 1: ("", "er"), 2: ("qu", "ry"),
                     3: ("c", "n")}


def _permuterm_match(vocab, pre: str, suf: str) -> np.ndarray:
    """Permuterm-index probe: boolean mask over ``vocab`` (array of
    unique tokens) for the wildcard query pre*suf. Builds the rotations
    of ``t + '$'`` per token and prefix-matches the single key
    ``suf + '$' + pre`` — by construction this enforces
    startswith(pre) AND endswith(suf) AND non-overlap
    (len(t) ≥ len(pre)+len(suf)), because the rotation chosen by the
    '$' position consumes suf and pre from disjoint ends. The rotation
    loop runs over the batch's UNIQUE tokens only (the per-unique-token
    convention of feature_hash_docs)."""
    key = suf + "$" + pre
    toks = list(vocab)
    rot_tok: list[int] = []
    rot: list[str] = []
    for j, tok in enumerate(toks):
        aug = tok + "$"
        for i in range(len(aug)):
            rot_tok.append(j)
            rot.append(aug[i:] + aug[:i])
    hit = pd.Series(rot, dtype=object).str.startswith(key).to_numpy()
    mask = np.zeros(len(toks), bool)
    mask[np.asarray(rot_tok, np.int64)[hit]] = True
    return mask


def wildcard_search_docs(sf_dir: str):
    """WILDCARD token search — ``pre*suf`` queries answered through
    Garfield's PERMUTERM index (the rotated-token trick IR systems use
    so one B-tree prefix scan answers mid-token wildcards). Emits per
    query the matched-vocabulary size, matching doc count, and posting
    count.

    Scale shape: rotations are built per batch over the batch's unique
    tokens and probed locally — nothing rotated ever leaves the task;
    matched (query, token, doc) postings are globally distinct by
    construction (per-batch dedup + each doc living in exactly one
    batch), so the stats fold through two tiny matched-rows-only
    groupbys (token grain → query grain, and doc grain → query grain)
    and a ≤|queries|-row driver merge."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    qref = ray.put(dict(_WILDCARD_QUERIES))

    def match(t: pa.Table) -> pa.Table:
        qs = ray.get(qref)
        lst = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = lst.values.to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(lst).to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        posts = pd.DataFrame({"token": flat, "doc_id": ids[par]}) \
            .drop_duplicates()
        vocab = posts["token"].unique()
        out = []
        for qid in sorted(qs):
            pre, suf = qs[qid]
            mt = vocab[_permuterm_match(vocab, pre, suf)]
            hit = posts[posts["token"].isin(mt)]
            out.append(pd.DataFrame({
                "qid": np.int64(qid), "token": hit["token"],
                "doc_id": hit["doc_id"]}))
        res = pd.concat(out, ignore_index=True)
        return pa.Table.from_pandas(res, preserve_index=False)

    posts = ds.map_batches(match, batch_format="pyarrow")
    tok_stats = (posts.groupby(["qid", "token"])
                 .aggregate(Count(alias_name="df"))
                 .groupby("qid")
                 .aggregate(Count(alias_name="n_tokens"),
                            Sum("df", alias_name="n_postings")))
    doc_stats = (posts.groupby(["qid", "doc_id"])
                 .aggregate(Count(alias_name="_n"))
                 .groupby("qid").aggregate(Count(alias_name="n_docs")))
    tok_rows = {int(r["qid"]): r for r in tok_stats.take_all()}
    doc_rows = {int(r["qid"]): r for r in doc_stats.take_all()}
    qids = sorted(tok_rows)
    return pa.table({
        "qid": pa.array(qids, pa.int64()),
        "n_tokens": pa.array([int(tok_rows[q]["n_tokens"])
                              for q in qids], pa.int64()),
        "n_docs": pa.array([int(doc_rows[q]["n_docs"])
                            for q in qids], pa.int64()),
        "n_postings": pa.array([int(tok_rows[q]["n_postings"])
                                for q in qids], pa.int64())})


WILDCARD_SQL = """
WITH q(qid, pre, suf) AS (VALUES
  (0, 's', ''), (1, '', 'er'), (2, 'qu', 'ry'), (3, 'c', 'n')),
tok AS (SELECT DISTINCT doc_id, token FROM
        (SELECT doc_id, unnest(string_split(text, ' ')) AS token
         FROM documents)),
m AS (SELECT q.qid, t.token, t.doc_id
      FROM tok t JOIN q
        ON t.token LIKE q.pre || '%' AND t.token LIKE '%' || q.suf
       AND length(t.token) >= length(q.pre) + length(q.suf))
SELECT CAST(qid AS BIGINT) AS qid,
       CAST(count(DISTINCT token) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_postings
FROM m GROUP BY qid
"""


def _mst_pack(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Unique int64 MST edge key w<<44 | a<<22 | b over the canonical
    a<b edge with the registry's deterministic weight
    w = 1 + (7a+13b) % 9 (shared with sssp_bounded_graph). UNIQUE keys
    (the (a, b) tie-break) make the minimum spanning forest unique, so
    any correct algorithm — and any parallelism level — emits the
    identical edge set. Vertex ids must fit 22 bits (asserted; custkey
    ≤ 4.1M covers every advertised test scale — widen the shifts
    before the key overflows at larger id spaces)."""
    assert a.max(initial=0) < (1 << 22) and b.max(initial=0) < (1 << 22)
    w = 1 + (7 * a + 13 * b) % 9
    return (w.astype(np.int64) << 44) | (a.astype(np.int64) << 22) \
        | b.astype(np.int64)


class _UF:
    """Array union-find (path halving + union by index) — driver-side
    component labels for Borůvka/Kruskal. O(V) ints of driver state,
    the documented driver-rank bound class."""

    def __init__(self, n: int):
        self.p = np.arange(n, dtype=np.int64)

    def find(self, x: int) -> int:
        p = self.p
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return int(x)

    def union(self, x: int, y: int) -> bool:
        rx, ry = self.find(x), self.find(y)
        if rx == ry:
            return False
        self.p[max(rx, ry)] = min(rx, ry)
        return True


def mst_crawl_graph(sf_dir: str, driver_max: int = 2_000_000):
    """MINIMUM SPANNING FOREST of the orders-derived graph — Borůvka's
    1926 algorithm, the textbook DISTRIBUTED MST (each component picks
    its minimum-weight outgoing edge; components at least halve per
    round, so ≤ log₂V rounds). Weights are the registry's
    deterministic ints with a unique (a, b) tie-break (``_mst_pack``),
    so the forest is UNIQUE and the output is golden-pinnable and
    parallelism-invariant.

    Scale shape: the EDGE table (the big thing) never leaves the
    cluster — each round is one broadcast-label ``map_batches`` pass
    emitting per-batch per-component champion keys plus a
    ``groupby(label).Min`` whose result is ≤ #components rows; the
    packed key encodes (w, a, b) completely, so Min IS argmin and the
    driver decodes champions without a second lookup. Driver state is
    the O(V) union-find (the documented ≤5M driver-rank bound class);
    below ``driver_max`` edges a driver Kruskal fold replaces the
    rounds (size-gated two-form, pytest-equal)."""
    edges = _orders_graph_edges(sf_dir).materialize()
    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("w", pa.int64())])

    def emit(ks: "list[int]") -> pa.Table:
        ks = sorted(ks)
        karr = np.asarray(ks, np.int64)
        mask = (1 << 22) - 1
        return pa.table({
            "a": pa.array((karr >> 22) & mask, pa.int64()),
            "b": pa.array(karr & mask, pa.int64()),
            "w": pa.array(karr >> 44, pa.int64())},
            schema=out_schema)

    if edges.count() <= driver_max:
        t = pa.concat_tables(
            edges.iter_batches(batch_size=None, batch_format="pyarrow"))
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        k = _mst_pack(a, b)
        order = np.argsort(k)  # Kruskal: unique keys, stable not needed
        nodes = np.unique(np.concatenate([a, b]))
        uf = _UF(len(nodes))
        ia = np.searchsorted(nodes, a)
        ib = np.searchsorted(nodes, b)
        chosen = [int(k[i]) for i in order
                  if uf.union(int(ia[i]), int(ib[i]))]
        return emit(chosen)

    # distributed Borůvka: champion edge per component per round
    nodes = np.sort(np.unique(np.concatenate([
        r.to_pandas()["v"].to_numpy(np.int64)
        for r in edges.map_batches(
            lambda t: pa.table({"v": pa.array(np.unique(np.concatenate(
                [t["a"].to_numpy(), t["b"].to_numpy()])), pa.int64())}),
            batch_format="pyarrow")
        .groupby("v").aggregate(Count(alias_name="_n"))
        .select_columns(["v"])
        .iter_batches(batch_size=None, batch_format="pyarrow")])))
    uf = _UF(len(nodes))
    chosen: set[int] = set()
    for _ in range(64):  # ≤ log2(V) rounds; hard stop is a backstop
        lab = np.array([uf.find(i) for i in range(len(nodes))],
                       np.int64)
        ref = ray.put({"nodes": nodes, "lab": lab})

        def cross_min(t: pa.Table, _ref=ref) -> pa.Table:
            s = ray.get(_ref)
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            la = s["lab"][np.searchsorted(s["nodes"], a)]
            lb = s["lab"][np.searchsorted(s["nodes"], b)]
            m = la != lb
            if not m.any():
                return pa.table({"label": pa.array([], pa.int64()),
                                 "k": pa.array([], pa.int64())})
            kk = _mst_pack(a[m], b[m])
            df = (pd.DataFrame({
                "label": np.concatenate([la[m], lb[m]]),
                "k": np.tile(kk, 2)})
                .groupby("label", sort=False)["k"].min().reset_index())
            return pa.Table.from_pandas(df, preserve_index=False)

        champs = (edges.map_batches(cross_min, batch_format="pyarrow")
                  .groupby("label").aggregate(Min("k", alias_name="k")))
        rows = champs.take_all()
        if not rows:
            break
        mask = (1 << 22) - 1
        progressed = False
        # ascending key order: deterministic unions (ties impossible —
        # keys are unique — but cycle-skips stay order-independent)
        for kv in sorted(int(r["k"]) for r in rows):
            ea, eb = (kv >> 22) & mask, kv & mask
            if uf.union(int(np.searchsorted(nodes, ea)),
                        int(np.searchsorted(nodes, eb))):
                chosen.add(kv)
                progressed = True
        if not progressed:
            break
    return emit(list(chosen))


def ewma_daily_counts(sf_dir: str):
    """Exponentially weighted moving average of daily event volume —
    Brown'56 simple exponential smoothing with α = 1/2, the standard
    traffic-smoothing monitor. The dyadic α makes every step
    s_t = (s_{t−1} + n_t) / 2.0 a single IEEE add plus an exact
    exponent decrement, and the DuckDB oracle replays the IDENTICAL
    recurrence through a recursive CTE in the same day order — so the
    doubles agree bit-for-bit and floor(s·1e6) is hash-exact (the
    first sequential-recurrence recursive-CTE oracle; the graph ones
    are fixpoints).

    Scale shape: ONE shuffle-free per-batch (day, n) combine + a
    calendar-bounded groupby; the inherently-sequential smoothing runs
    over the ≤ #days driver rows (theil_sen's convention)."""
    import math

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
    rn, day, n, e6 = [], [], [], []
    s = 0.0
    for i, (d, cnt) in enumerate(rows):
        s = float(cnt) if i == 0 else (s + cnt) / 2.0
        rn.append(i + 1)
        day.append(d)
        n.append(cnt)
        e6.append(math.floor(s * 1000000.0))
    return pa.table({"rn": pa.array(rn, pa.int64()),
                     "day": pa.array(day, pa.int64()),
                     "n": pa.array(n, pa.int64()),
                     "ewma_e6": pa.array(e6, pa.int64())})


EWMA_SQL = """
WITH RECURSIVE d AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day),
o AS (SELECT day, n, row_number() OVER (ORDER BY day) AS rn FROM d),
w(rn, day, n, s) AS (
  SELECT rn, day, n, CAST(n AS DOUBLE) FROM o WHERE rn = 1
  UNION ALL
  SELECT o.rn, o.day, o.n, (w.s + o.n) / 2.0
  FROM w JOIN o ON o.rn = w.rn + 1)
SELECT CAST(rn AS BIGINT) AS rn, CAST(day AS BIGINT) AS day, n,
       CAST(floor(s * 1000000.0) AS BIGINT) AS ewma_e6
FROM w
"""


def attribution_u_shape_events(sf_dir: str):
    """POSITION-BASED (U-shaped) multi-touch attribution — the
    marketing-analytics staple: each 'purchase' conversion credits the
    user's touchpoints in the 24 h before it, 40% to the first touch,
    40% to the last, 20% split over the middles (k=1 → 100%, k=2 →
    50/50). Credits are EXACT int64 rationals (credit_num,
    credit_den) — 2/5 for first/last, 1/(5(k−2)) per middle — the
    rrf_hybrid_search_docs convention, so no float crosses the engine
    boundary and the per-conversion credit sum is exactly 1
    (pytest-asserted via Fraction).

    Scale shape: conversions and touches meet in ONE groupby(user_id)
    co-partition; the per-user resolve is a double searchsorted of
    purchase times into the user's (ts, event_id)-ordered touch
    stream (interval_join_attribution's merge shape) — the 24 h window
    bounds output rows linearly, never the O(n²/users) all-history
    explode."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])
    cols = ["pid", "tid", "k", "pos", "credit_num", "credit_den"]

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        t_us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, t_us))
        t_us, eid = t_us[order], eid[order]
        et = g["event_type"].to_numpy(object)[order]
        isp = et == "purchase"
        pts, pid = t_us[isp], eid[isp]
        tts, tid = t_us[~isp], eid[~isp]
        empty = pd.DataFrame({c: pd.Series(
            dtype=object if c == "pos" else np.int64) for c in cols})
        if len(pts) == 0 or len(tts) == 0:
            return empty
        lo = np.searchsorted(tts, pts - 86_400_000_000, side="left")
        hi = np.searchsorted(tts, pts, side="left")
        cnt = hi - lo
        keep = cnt > 0
        if not keep.any():
            return empty
        lo, hi, cnt, pid = lo[keep], hi[keep], cnt[keep], pid[keep]
        idx = np.concatenate([np.arange(l, h) for l, h in zip(lo, hi)])
        k = np.repeat(cnt, cnt)
        rk = idx - np.repeat(lo, cnt) + 1
        first, last = rk == 1, rk == k
        pos = np.where(k == 1, "only",
                       np.where(first, "first",
                                np.where(last, "last", "middle")))
        num = np.where(k == 1, 1,
                       np.where(first | last,
                                np.where(k == 2, 1, 2), 1))
        den = np.where(k == 1, 1,
                       np.where(first | last,
                                np.where(k == 2, 2, 5), 5 * (k - 2)))
        return pd.DataFrame({
            "pid": np.repeat(pid, cnt), "tid": tid[idx],
            "k": k.astype(np.int64), "pos": pos,
            "credit_num": num.astype(np.int64),
            "credit_den": den.astype(np.int64)})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pandas")


ATTRIBUTION_U_SQL = """
WITH p AS (SELECT event_id AS pid, user_id, epoch_us(ts) AS pus
           FROM events WHERE event_type = 'purchase'),
t AS (SELECT p.pid, e.event_id AS tid,
             row_number() OVER (PARTITION BY p.pid
                                ORDER BY epoch_us(e.ts), e.event_id)
               AS rk,
             count(*) OVER (PARTITION BY p.pid) AS k
      FROM p JOIN events e
        ON e.user_id = p.user_id AND e.event_type <> 'purchase'
       AND epoch_us(e.ts) < p.pus
       AND epoch_us(e.ts) >= p.pus - 86400000000)
SELECT pid, tid, CAST(k AS BIGINT) AS k,
       CASE WHEN k = 1 THEN 'only' WHEN rk = 1 THEN 'first'
            WHEN rk = k THEN 'last' ELSE 'middle' END AS pos,
       CAST(CASE WHEN k = 1 THEN 1
                 WHEN rk = 1 OR rk = k THEN
                      CASE WHEN k = 2 THEN 1 ELSE 2 END
                 ELSE 1 END AS BIGINT) AS credit_num,
       CAST(CASE WHEN k = 1 THEN 1
                 WHEN rk = 1 OR rk = k THEN
                      CASE WHEN k = 2 THEN 2 ELSE 5 END
                 ELSE 5 * (k - 2) END AS BIGINT) AS credit_den
FROM t
"""


def welch_t_ab_test(sf_dir: str):
    """WELCH'S t-TEST A/B experiment report — the experimentation-
    platform staple: users split into arms by user_id parity, per
    event_type the unequal-variance t² statistic and Welch–
    Satterthwaite degrees of freedom on order value. All corpus
    reductions are EXACT integer moments (n, Σcents, Σcents² — the
    OLS convention, Python-int / HUGEINT so squares never overflow);
    the t² / df floats are computed on the driver from those integers
    with the expression tree mirrored VERBATIM in SQL (the
    psi_score_halves convention), then floor(·1e6) — so the doubles
    bit-agree and the output is hash-exact.

    Scale shape: one shuffle-free per-batch (event_type, arm) moment
    combine + a ≤ 2·#types groupby — the driver fold is bounded by
    the type vocabulary, never the corpus."""
    import math

    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def moments(t: pa.Table) -> pa.Table:
        cents = _cents(t["value"]).to_numpy(zero_copy_only=False)
        arm = (t["user_id"].to_numpy(zero_copy_only=False) % 2) \
            .astype(np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": et, "arm": arm, "n": 1,
                           "s": cents, "q": cents * cents})
        g = df.groupby(["event_type", "arm"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    rows = (ds.map_batches(moments, batch_format="pyarrow")
            .groupby(["event_type", "arm"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("s", alias_name="s"),
                       Sum("q", alias_name="q"))
            .take_all())  # ≤ 2 rows per event type
    by_type: dict[str, dict[int, tuple[int, int, int]]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[int(r["arm"])] = (
            int(r["n"]), int(r["s"]), int(r["q"]))
    out = []
    for et in sorted(by_type):
        arms = by_type[et]
        if 0 not in arms or 1 not in arms:
            continue
        (na, sa, qa), (nb, sb, qb) = arms[0], arms[1]
        if na < 2 or nb < 2:
            continue
        # identical float tree to the SQL below, operation by operation
        ma = float(sa) / na
        mb = float(sb) / nb
        va = (float(qa) - float(sa) * ma) / (na - 1)
        vb = (float(qb) - float(sb) * mb) / (nb - 1)
        sea = va / na
        seb = vb / nb
        se = sea + seb
        if se <= 0.0:
            t2_e6, df_e6 = 0, 0
        else:
            t2 = (ma - mb) * (ma - mb) / se
            dfw = (se * se) / (sea * sea / (na - 1)
                               + seb * seb / (nb - 1))
            t2_e6 = math.floor(t2 * 1_000_000.0)
            df_e6 = math.floor(dfw * 1_000_000.0)
        out.append((et, na, nb, sa, sb, t2_e6, df_e6))
    return pa.table({
        "event_type": pa.array([o[0] for o in out], pa.string()),
        "n_a": pa.array([o[1] for o in out], pa.int64()),
        "n_b": pa.array([o[2] for o in out], pa.int64()),
        "sum_a_c": pa.array([o[3] for o in out], pa.int64()),
        "sum_b_c": pa.array([o[4] for o in out], pa.int64()),
        "t2_e6": pa.array([o[5] for o in out], pa.int64()),
        "df_e6": pa.array([o[6] for o in out], pa.int64())})


WELCH_AB_SQL = """
WITH m AS (
  SELECT event_type, user_id % 2 AS arm,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(value * 100) AS HUGEINT)
                  * CAST(round(value * 100) AS HUGEINT)) AS HUGEINT)
           AS q
  FROM events GROUP BY event_type, arm),
p AS (
  SELECT a.event_type, a.n AS na, b.n AS nb, a.s AS sa, b.s AS sb,
         CAST(a.s AS DOUBLE) / a.n AS ma,
         CAST(b.s AS DOUBLE) / b.n AS mb,
         (CAST(a.q AS DOUBLE)
          - CAST(a.s AS DOUBLE) * (CAST(a.s AS DOUBLE) / a.n))
           / (a.n - 1) AS va,
         (CAST(b.q AS DOUBLE)
          - CAST(b.s AS DOUBLE) * (CAST(b.s AS DOUBLE) / b.n))
           / (b.n - 1) AS vb
  FROM m a JOIN m b ON a.event_type = b.event_type
  WHERE a.arm = 0 AND b.arm = 1 AND a.n >= 2 AND b.n >= 2),
e AS (SELECT *, va / na AS sea, vb / nb AS seb,
             va / na + vb / nb AS se FROM p)
SELECT event_type, na AS n_a, nb AS n_b, sa AS sum_a_c, sb AS sum_b_c,
       CASE WHEN se <= 0.0 THEN 0
            ELSE CAST(floor((ma - mb) * (ma - mb) / se * 1000000.0)
                      AS BIGINT) END AS t2_e6,
       CASE WHEN se <= 0.0 THEN 0
            ELSE CAST(floor((se * se) / (sea * sea / (na - 1)
                                         + seb * seb / (nb - 1))
                            * 1000000.0) AS BIGINT) END AS df_e6
FROM e
"""


def gini_simpson_by_source(sf_dir: str):
    """GINI–SIMPSON token diversity index per source — the ecology
    diversity number (1 − Σ c(c−1)/(n(n−1)), the probability two
    token draws WITHOUT replacement differ) that data-mix analyses
    report next to entropy: entropy weights rare types, Simpson is
    dominated by the head, so together they separate "big vocabulary"
    from "flat distribution". EXACT integer rationals end to end —
    gini_e6 = (n(n−1) − Σc(c−1))·10⁶ // (n(n−1)) with Python-int /
    HUGEINT arithmetic, so the oracle is hash-exact with no float
    convention needed (unlike the entropy/KL e6-term family).

    Scale shape: the kl_unigram_by_source exchange — one per-batch
    (source, token) combine + one (source, token) groupby; the
    per-source reduction is a SECOND per-batch combine over the
    already-globally-unique rows (Σc, Σc(c−1), #rows) + a ≤ #sources
    groupby, so nothing unbounded reaches the driver."""
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
          .aggregate(Sum("c", alias_name="c")))

    def per_source(t: pa.Table) -> pa.Table:
        # rows are globally unique per (source, token) after the
        # groupby, so per-batch partials sum to the exact totals
        c = t["c"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"source": t["source"].to_numpy(
            zero_copy_only=False), "n": c, "cc": c * (c - 1), "d": 1})
        g = df.groupby("source", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    rows = (st.map_batches(per_source, batch_format="pyarrow")
            .groupby("source").aggregate(Sum("n", alias_name="n"),
                                         Sum("cc", alias_name="cc"),
                                         Sum("d", alias_name="d"))
            .take_all())  # one row per source
    rows.sort(key=lambda r: r["source"])
    gini = []
    for r in rows:
        n, cc = int(r["n"]), int(r["cc"])
        den = n * (n - 1)
        gini.append((den - cc) * 1_000_000 // den if den > 0 else 0)
    return pa.table({
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "n_tokens": pa.array([int(r["n"]) for r in rows], pa.int64()),
        "distinct_tokens": pa.array([int(r["d"]) for r in rows],
                                    pa.int64()),
        "gini_e6": pa.array(gini, pa.int64())})


GINI_SIMPSON_SQL = """
WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token
             FROM documents),
st AS (SELECT source, token, CAST(count(*) AS HUGEINT) AS c
       FROM tok GROUP BY source, token),
s AS (SELECT source, CAST(sum(c) AS HUGEINT) AS n,
             CAST(sum(c * (c - 1)) AS HUGEINT) AS cc,
             CAST(count(*) AS BIGINT) AS d
      FROM st GROUP BY source)
SELECT source, CAST(n AS BIGINT) AS n_tokens, d AS distinct_tokens,
       CASE WHEN n * (n - 1) > 0
            THEN CAST((n * (n - 1) - cc) * 1000000 // (n * (n - 1))
                      AS BIGINT)
            ELSE 0 END AS gini_e6
FROM s
"""


def roc_curve_eval(sf_dir: str):
    """Full ROC CURVE table for the hashed-feature quality classifier
    against the lang = 'en' label — the threshold-choosing companion
    to the scalar :func:`auc_quality_eval`: one row per DISTINCT
    score s with the confusion counts and rates of the rule
    "keep iff score ≥ s". Counts are exact integer suffix sums;
    tpr/fpr are e6 floor-divisions, so the oracle is hash-exact.

    Scale shape: auc_quality_eval's machinery verbatim — a
    shuffle-free scoring pass with per-batch (score, label) combine,
    one groupby over the distinct-score table (bounded by the SCORE
    RANGE, corpus-size-independent), and an O(range) driver
    cumulative fold."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(flat.astype(object), return_inverse=True)
        w = _clf_weights(uniq)[inv]
        s = np.rint(np.bincount(par, weights=w, minlength=t.num_rows)) \
            .astype(np.int64)
        pos = pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"s": s, "p": pos.astype(np.int64)}) \
            .groupby("s", sort=False).agg(np_=("p", "sum"),
                                          nn_=("p", "size"))
        return pa.table({
            "s": pa.array(g.index.to_numpy(np.int64), pa.int64()),
            "np_": pa.array(g["np_"].to_numpy(np.int64), pa.int64()),
            "nn_": pa.array((g["nn_"] - g["np_"]).to_numpy(np.int64),
                            pa.int64())})

    rows = (ds.map_batches(score, batch_format="pyarrow")
            .groupby("s").aggregate(Sum("np_", alias_name="np_"),
                                    Sum("nn_", alias_name="nn_"))
            .take_all())  # bounded by the score RANGE, not the corpus
    rows.sort(key=lambda r: -r["s"])
    np_t = sum(int(r["np_"]) for r in rows)
    nn_t = sum(int(r["nn_"]) for r in rows)
    s_col, tp_col, fp_col, tpr, fpr = [], [], [], [], []
    tp = fp = 0
    for r in rows:  # descending: suffix sums = "score >= s" counts
        tp += int(r["np_"])
        fp += int(r["nn_"])
        s_col.append(int(r["s"]))
        tp_col.append(tp)
        fp_col.append(fp)
        tpr.append(1_000_000 * tp // np_t if np_t else 0)
        fpr.append(1_000_000 * fp // nn_t if nn_t else 0)
    return pa.table({"s": pa.array(s_col, pa.int64()),
                     "tp": pa.array(tp_col, pa.int64()),
                     "fp": pa.array(fp_col, pa.int64()),
                     "tpr_e6": pa.array(tpr, pa.int64()),
                     "fpr_e6": pa.array(fpr, pa.int64())})


ROC_CURVE_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
sc AS (SELECT doc_id,
              CAST(sum((CAST('0x' || substr(md5(token), 1, 15) AS BIGINT)
                        % 1001) - 500) AS BIGINT) AS s
       FROM tok GROUP BY doc_id),
lab AS (SELECT sc.s,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents d JOIN sc USING (doc_id)),
g AS (SELECT s, CAST(sum(pos) AS BIGINT) AS np_,
             CAST(count(*) - sum(pos) AS BIGINT) AS nn_
      FROM lab GROUP BY s),
c AS (SELECT s,
             CAST(sum(np_) OVER (ORDER BY s DESC) AS BIGINT) AS tp,
             CAST(sum(nn_) OVER (ORDER BY s DESC) AS BIGINT) AS fp
      FROM g),
t AS (SELECT CAST(sum(np_) AS BIGINT) AS np_t,
             CAST(sum(nn_) AS BIGINT) AS nn_t FROM g)
SELECT c.s, c.tp, c.fp,
       CASE WHEN t.np_t = 0 THEN 0
            ELSE CAST(1000000 * c.tp // t.np_t AS BIGINT) END AS tpr_e6,
       CASE WHEN t.nn_t = 0 THEN 0
            ELSE CAST(1000000 * c.fp // t.nn_t AS BIGINT) END AS fpr_e6
FROM c CROSS JOIN t
"""


def ktruss_crawl_graph(sf_dir: str, k: int = 4,
                       driver_max: int = 2_000_000,
                       _force_distributed: bool = False):
    """k-TRUSS subgraph (Cohen 2008) of the orders-derived graph — the
    triangle-based cohesion decomposition next to k-core: keep exactly
    the edges supported by ≥ k−2 triangles among SURVIVING edges (the
    fixpoint), the standard community-core primitive that k-core
    over-approximates (a k-core edge needs degree, a k-truss edge
    needs closed wedges). Output the surviving (a, b) edges with their
    fixpoint support — deterministic, golden-pinned (iterative edge
    deletion has no SQL form).

    Scale shape: raw edge counts ≤ ``driver_max`` peel on the driver
    with the classic queue algorithm (compute support once, decrement
    common-neighbour supports on each deletion — O(Σ min-deg), one
    corpus fold). Above the gate (or forced in tests): per-round
    DISTRIBUTED support recount via triangle_counts' two-join wedge
    closure emitting all THREE triangle edges, a support groupby, and
    an edge filter — edges leave only as (a, b, support) rows, each
    round materialized so no plan exceeds two shuffle stages (the
    fused-plan deadlock lesson)."""
    edges = _orders_graph_edges(sf_dir).materialize()
    need = max(k - 2, 0)
    if edges.count() <= driver_max and not _force_distributed:
        t = pa.concat_tables(edges.iter_batches(batch_size=None,
                                                batch_format="pyarrow"))
        av = t["a"].to_numpy(zero_copy_only=False)
        bv = t["b"].to_numpy(zero_copy_only=False)
        adj: dict[int, set] = {}
        for x, y in zip(av.tolist(), bv.tolist()):
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        sup = {(x, y): len(adj[x] & adj[y])
               for x, y in zip(av.tolist(), bv.tolist())}
        queue = [e for e, s in sup.items() if s < need]
        alive = set(sup)
        while queue:
            e = queue.pop()
            if e not in alive:
                continue
            alive.discard(e)
            x, y = e
            for c in adj[x] & adj[y]:
                for f in ((min(x, c), max(x, c)),
                          (min(y, c), max(y, c))):
                    if f in alive:
                        sup[f] -= 1
                        if sup[f] == need - 1:
                            queue.append(f)
            adj[x].discard(y)
            adj[y].discard(x)
        rows = sorted(alive)
        return pa.table({
            "a": pa.array([r[0] for r in rows], pa.int64()),
            "b": pa.array([r[1] for r in rows], pa.int64()),
            "support": pa.array([sup[r] for r in rows], pa.int64())})

    from rendler_ray.state.politeness import _nonempty_blocks
    cur = edges
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "support": pa.array([], pa.int64())})
    while True:
        n_cur = cur.count()
        if n_cur == 0:
            return empty
        right = cur.map_batches(
            lambda t: t.rename_columns(["a", "c"]),
            batch_format="pyarrow")
        wedges = (cur.join(right, join_type="inner", num_partitions=8,
                           on=("a",))
                  .map_batches(lambda t: t.filter(
                      pc.less(t["b"], t["c"])), batch_format="pyarrow"))
        wedges = _nonempty_blocks(wedges.materialize())
        if wedges is None:
            return empty
        closing = cur.map_batches(
            lambda t: t.rename_columns(["b", "c"]),
            batch_format="pyarrow")
        tri = wedges.join(closing, join_type="inner", num_partitions=8,
                          on=("b", "c")).materialize()

        def tri_edges(t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            c = t["c"].to_numpy(zero_copy_only=False)
            return pa.table({
                "a": pa.array(np.concatenate([a, a, b]), pa.int64()),
                "b": pa.array(np.concatenate([b, c, c]), pa.int64()),
                "n": pa.array(np.ones(3 * len(a), np.int64),
                              pa.int64())})

        tri = _nonempty_blocks(tri)
        if tri is None:
            return empty
        sup_ds = (tri.map_batches(tri_edges, batch_format="pyarrow")
                  .groupby(["a", "b"]).aggregate(Sum("n",
                                                     alias_name="n"))
                  .map_batches(lambda t: t.filter(
                      pc.greater_equal(t["n"], need)),
                      batch_format="pyarrow")
                  .materialize())
        sup_ds = _nonempty_blocks(sup_ds)
        if sup_ds is None:
            return empty
        n_keep = sup_ds.count()
        if n_keep == n_cur:
            return sup_ds.map_batches(
                lambda t: t.rename_columns(["a", "b", "support"]),
                batch_format="pyarrow").sort(["a", "b"])
        cur = sup_ds.select_columns(["a", "b"]).materialize()


def rocchio_expand_search(sf_dir: str, k_fb: int = 10, k: int = 10):
    """ROCCHIO pseudo-relevance feedback (Rocchio 1971, the SMART
    relevance-feedback formula, β-only blind variant): for each dense
    query take its cosine top-``k_fb`` as pseudo-relevant, expand the
    query q' = q + ½·mean(feedback vectors), and re-rank the corpus
    against q'. The expansion is EXACT-INTEGER on both sides:
    components are e6-floored per vector BEFORE combining —
    E = 20·⌊q·10⁶⌋ + Σ_fb ⌊v·10⁶⌋ (α=1, β=½, |fb|=10, scaled ×20) —
    so the expanded vector is bit-identical across engines and only
    the final cosine uses the established e6-round convention
    (rrf_hybrid's dense leg).

    Scale shape: two shuffle-free brute_force_topk passes (broadcast
    query matrix, per-batch partial top-k); the feedback vectors are
    fetched by one bounded ``isin`` fold (≤ |Q|·k_fb rows)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    queries = _query_vecs(sf_dir, len(_BM25_QUERIES))
    fb_rows = F_ann.brute_force_topk(ds, queries, k=k_fb).take_all()
    need = np.array(sorted({int(r["vec_id"]) for r in fb_rows}),
                    dtype=np.int64)
    nref = ray.put(need)

    def pick(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(ids, ray.get(nref))))

    fbt = pa.concat_tables(
        ds.map_batches(pick, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    vecs = {int(i): np.asarray(v, dtype=np.float64)
            for i, v in zip(fbt["vec_id"].to_pylist(),
                            fbt["embedding"].to_pylist())}
    expanded = {}
    for qid, qv in queries.items():
        e = 20.0 * np.floor(qv * 1_000_000.0)
        for r in fb_rows:
            if int(r["query_id"]) == qid:
                e = e + np.floor(vecs[int(r["vec_id"])] * 1_000_000.0)
        expanded[qid] = e
    return F_ann.brute_force_topk(ds, expanded, k=k)


def _rocchio_sql(k_fb: int = 10, k: int = 10) -> str:
    nq = len(_BM25_QUERIES)
    return f"""
WITH dq AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < {nq}),
dsc AS (SELECT dq.query_id, e.vec_id AS doc_id,
               CAST(round(list_cosine_similarity(dq.qv,
                 CAST(e.embedding AS DOUBLE[])) * 1000000) AS BIGINT)
                 AS score_e6
        FROM dq CROSS JOIN embeddings e),
dtop AS (SELECT query_id, doc_id FROM (
           SELECT query_id, doc_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score_e6 DESC, doc_id)
                    AS rank
           FROM dsc) WHERE rank <= {k_fb}),
fb AS (SELECT t.query_id,
              unnest(range(1, len(e.embedding) + 1)) AS dim,
              CAST(floor(unnest(CAST(e.embedding AS DOUBLE[]))
                         * 1000000.0) AS BIGINT) AS c
       FROM dtop t JOIN embeddings e ON e.vec_id = t.doc_id),
fbs AS (SELECT query_id, dim, CAST(sum(c) AS BIGINT) AS sd
        FROM fb GROUP BY query_id, dim),
qc AS (SELECT query_id, unnest(range(1, len(qv) + 1)) AS dim,
              CAST(20 * floor(unnest(qv) * 1000000.0) AS BIGINT) AS qq
       FROM dq),
ev AS (SELECT query_id,
              list(CAST(qq + sd AS DOUBLE) ORDER BY dim) AS evec
       FROM qc JOIN fbs USING (query_id, dim) GROUP BY query_id),
esc AS (SELECT ev.query_id, e.vec_id,
               CAST(round(list_cosine_similarity(ev.evec,
                 CAST(e.embedding AS DOUBLE[])) * 1000000) AS BIGINT)
                 AS score_e6
        FROM ev CROSS JOIN embeddings e)
SELECT query_id, vec_id, score_e6,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY score_e6 DESC, vec_id) AS rank
FROM esc QUALIFY rank <= {k}
"""


ROCCHIO_SQL = _rocchio_sql()


def snippet_extract_docs(sf_dir: str, window: int = 10):
    """SNIPPET / best-passage extraction for the BM25 top-10 result
    set — the search-result highlighting step: per (query, hit doc)
    the ``window``-token window with the most query-term occurrences,
    windows ANCHORED at a query-term hit (some max-count window always
    starts at a hit — sliding a window right to its first hit drops
    nothing — so anchoring loses no optimum and makes the tie rule
    well-defined: max hits, then smallest start). Exact integers
    end to end.

    Scale shape: the BM25 top-10 fold is bounded (≤ |Q|·10 rows,
    broadcast); ONE shuffle-free corpus pass filters to the hit docs
    per batch and resolves each doc's best window with two
    searchsorteds over its hit-position list — the corpus is never
    shuffled and non-hit docs contribute zero rows."""
    top = bm25_search_docs(sf_dir).take_all()
    byq: dict[int, set] = {}
    for r in top:
        byq.setdefault(int(r["query_id"]), set()).add(int(r["doc_id"]))
    terms = {qid: set(_BM25_QUERIES[qid]) for qid in byq}
    bref = ray.put((byq, terms))
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    docset = {d for s in byq.values() for d in s}
    dref = ray.put(np.array(sorted(docset), dtype=np.int64))

    def best_windows(t: pa.Table) -> pa.Table:
        byq_, terms_ = ray.get(bref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        mask = np.isin(ids, ray.get(dref))
        out_q, out_d, out_s, out_n = [], [], [], []
        if mask.any():
            sub = t.filter(pa.array(mask))
            for did, text in zip(
                    sub["doc_id"].to_pylist(), sub["text"].to_pylist()):
                toks = text.split(" ")
                for qid, docs in byq_.items():
                    if did not in docs:
                        continue
                    hits = np.array(
                        [p for p, tok in enumerate(toks, 1)
                         if tok in terms_[qid]], dtype=np.int64)
                    # a BM25 hit doc always contains >=1 query term
                    ends = np.searchsorted(hits, hits + window,
                                           side="left")
                    n = ends - np.arange(len(hits))
                    best = int(np.argmax(n))  # first max = smallest p
                    out_q.append(qid)
                    out_d.append(did)
                    out_s.append(int(hits[best]))
                    out_n.append(int(n[best]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "best_start": pa.array(out_s, pa.int64()),
                         "n_hits": pa.array(out_n, pa.int64())})

    return ds.map_batches(best_windows, batch_format="pyarrow")


def _snippet_sql(window: int = 10) -> str:
    return f"""{_bm25_cte()},
topd AS (SELECT query_id, doc_id FROM (
           SELECT query_id, doc_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score_e6 DESC, doc_id)
                    AS rank
           FROM sc) WHERE rank <= 10),
pos AS (SELECT doc_id,
               unnest(string_split(text, ' ')) AS token,
               unnest(range(1, len(string_split(text, ' ')) + 1)) AS p
        FROM documents
        WHERE doc_id IN (SELECT doc_id FROM topd)),
hits AS (SELECT t.query_id, pos.doc_id, pos.p
         FROM pos JOIN q ON q.term = pos.token
         JOIN topd t ON t.query_id = q.query_id
                    AND t.doc_id = pos.doc_id),
win AS (SELECT h0.query_id, h0.doc_id, h0.p AS best_start,
               CAST(count(*) AS BIGINT) AS n_hits
        FROM hits h0 JOIN hits h1
          ON h1.query_id = h0.query_id AND h1.doc_id = h0.doc_id
         AND h1.p >= h0.p AND h1.p < h0.p + {window}
        GROUP BY h0.query_id, h0.doc_id, h0.p)
SELECT query_id, doc_id, best_start, n_hits
FROM win
QUALIFY row_number() OVER (PARTITION BY query_id, doc_id
                           ORDER BY n_hits DESC, best_start) = 1
"""


SNIPPET_SQL = _snippet_sql()


def dbscan_embeddings(sf_dir: str, thr_e6: int = 300_000,
                      min_pts: int = 5, edge_max: int = 5_000_000):
    """DBSCAN density clustering (Ester et al., KDD'96) over the
    embedding corpus with a cosine neighborhood (sim_e6 ≥ ``thr_e6``,
    self excluded) — the density-based family next to the in-tree
    k-means / k-center / SemDeDup clusterers: cores have ≥ ``min_pts``
    neighbors, clusters are connected components of the core-core
    ε-graph labeled by MIN core id, borders take the smallest label
    among their core neighbors, noise is −1. Deterministic, so the
    DuckDB oracle (cross-join ε-graph + recursive min-label closure)
    is hash-exact.

    Scale shape: the ε-graph comes from ONE blocked scan on the
    BlockKnnScan layout — corpus normalized once into plasma blocks,
    each task matmuls its block against the stream, emitting only
    pairs above the threshold. The label/assign fold runs on the
    ε-EDGE table, which density bounds far below n² (gate-asserted,
    the betweenness convention); past the gate the components would
    run on the in-tree star-contraction CC + groupby-count forms."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "unit": pa.array([], pa.list_(pa.float64()))})
        m = F_ann._normalize(F_ann.batch_to_matrix(t))
        return pa.table({
            "vec_id": t["vec_id"],
            "unit": pa.FixedSizeListArray.from_arrays(
                pa.array(m.ravel(), pa.float64()), m.shape[1])})

    mat = ds.map_batches(prep, batch_format="pyarrow").materialize()
    refs = list(mat.to_arrow_refs())

    def edges(batch: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        q_ids, qm = F_ann._ref_to_matrix(batch)
        out_a, out_b = [], []
        for ref in refs:
            tb = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            if tb.num_rows == 0:
                continue
            b_ids, bm = F_ann._ref_to_matrix(tb)
            sim = np.round(qm @ bm.T * 1e6).astype(np.int64)
            hit = (sim >= thr_e6) & (q_ids[:, None] != b_ids[None, :])
            qi, bi = np.nonzero(hit)
            out_a.append(q_ids[qi])
            out_b.append(b_ids[bi])
        if not out_a:
            return empty
        return pa.table({"a": pa.array(np.concatenate(out_a),
                                       pa.int64()),
                         "b": pa.array(np.concatenate(out_b),
                                       pa.int64())})

    et = (mat.map_batches(edges, batch_format="pyarrow")
          .materialize())
    ne = et.count()
    assert ne <= edge_max, \
        f"eps-graph {ne} edges exceeds the driver fold gate"
    all_ids = np.sort(np.concatenate(
        [b["vec_id"].to_numpy(zero_copy_only=False)
         for b in mat.iter_batches(batch_size=None,
                                   batch_format="pyarrow")]))
    if ne:
        etab = pa.concat_tables(et.iter_batches(
            batch_size=None, batch_format="pyarrow"))
        ea = etab["a"].to_numpy(zero_copy_only=False)
        eb = etab["b"].to_numpy(zero_copy_only=False)
    else:
        ea = eb = np.array([], np.int64)
    n_nbrs = {int(i): 0 for i in all_ids}
    for x in ea.tolist():
        n_nbrs[x] += 1
    core = {i for i, c in n_nbrs.items() if c >= min_pts}
    parent = {i: i for i in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(ea.tolist(), eb.tolist()):
        if x in core and y in core:
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
    # min core id per component (find roots are already minima under
    # the min-union rule above, made exact by one more pass)
    root_min: dict[int, int] = {}
    for i in core:
        r = find(i)
        root_min[r] = min(root_min.get(r, i), i)
    label = {i: root_min[find(i)] for i in core}
    for x, y in zip(ea.tolist(), eb.tolist()):
        if x not in core and y in core:
            cur = label.get(x)
            label[x] = label[y] if cur is None else min(cur, label[y])
    ids = [int(i) for i in all_ids]
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "label": pa.array([label.get(i, -1) for i in ids], pa.int64()),
        "is_core": pa.array([int(i in core) for i in ids], pa.int64()),
        "n_nbrs": pa.array([n_nbrs[i] for i in ids], pa.int64())})


def _dbscan_sql(thr_e6: int = 300_000, min_pts: int = 5) -> str:
    return f"""
WITH RECURSIVE e AS (
  SELECT a.vec_id AS i, b.vec_id AS j
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE CAST(round(list_cosine_similarity(
          CAST(a.embedding AS DOUBLE[]),
          CAST(b.embedding AS DOUBLE[])) * 1000000) AS BIGINT)
        >= {thr_e6}),
nb AS (SELECT v.vec_id, CAST(coalesce(c.n, 0) AS BIGINT) AS n_nbrs
       FROM embeddings v LEFT JOIN
         (SELECT i, count(*) AS n FROM e GROUP BY i) c
         ON c.i = v.vec_id),
core AS (SELECT vec_id FROM nb WHERE n_nbrs >= {min_pts}),
ce AS (SELECT e.i, e.j FROM e
       WHERE e.i IN (SELECT vec_id FROM core)
         AND e.j IN (SELECT vec_id FROM core)),
reach(node, root) AS (
  SELECT vec_id, vec_id FROM core
  UNION
  SELECT ce.j, reach.root FROM reach JOIN ce ON ce.i = reach.node),
lab AS (SELECT node AS vec_id, CAST(min(root) AS BIGINT) AS label
        FROM reach GROUP BY node),
blab AS (SELECT e.i AS vec_id, CAST(min(lab.label) AS BIGINT) AS label
         FROM e JOIN lab ON lab.vec_id = e.j
         WHERE e.i NOT IN (SELECT vec_id FROM core)
         GROUP BY e.i)
SELECT nb.vec_id,
       CAST(coalesce(lab.label, blab.label, -1) AS BIGINT) AS label,
       CAST(CASE WHEN lab.vec_id IS NOT NULL THEN 1 ELSE 0 END
            AS BIGINT) AS is_core,
       nb.n_nbrs
FROM nb LEFT JOIN lab ON lab.vec_id = nb.vec_id
        LEFT JOIN blab ON blab.vec_id = nb.vec_id
"""


DBSCAN_SQL = _dbscan_sql()
