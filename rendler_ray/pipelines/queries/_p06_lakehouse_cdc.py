

# ==================================================== round-4g op families
# lakehouse maintenance (MERGE/CDC apply, hive-partitioned layout),
# SCD2 history build, LOCF gap fill, robust (median/MAD) outliers,
# greedy k-center coreset selection.


def _docs_cdc_changes(sf_dir: str):
    """Deterministic CDC change feed over ``documents`` (the merge op's
    input): ~3% of rows become updates (doc_id % 97 == 3 → n_chars+1000,
    source 'patched'), ~1% deletes (% 97 == 7), ~1% inserts (% 97 == 11
    → a clone at doc_id + 10^9, source 'inserted'). Derived by one
    stateless map pass — the op under test (:func:`merge_upsert_docs`)
    treats the feed as OPAQUE (no predicate pushback into the base
    scan), exactly like a real CDC batch."""
    base = _read(sf_dir, "documents", ["doc_id", "n_chars", "source"])

    def emit(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        nch = t["n_chars"].to_numpy(zero_copy_only=False)
        m = ids % 97
        u, d, i = m == 3, m == 7, m == 11
        return pa.table({
            "doc_id": pa.array(np.concatenate(
                [ids[u], ids[d], ids[i] + 1_000_000_000]), pa.int64()),
            "op": pa.array(["U"] * int(u.sum()) + ["D"] * int(d.sum())
                           + ["I"] * int(i.sum()), pa.string()),
            "n_chars": pa.array(np.concatenate(
                [nch[u] + 1000, np.zeros(int(d.sum()), np.int64),
                 nch[i]]), pa.int64()),
            "source": pa.array(["patched"] * int(u.sum())
                               + [""] * int(d.sum())
                               + ["inserted"] * int(i.sum()), pa.string()),
        })

    return base.map_batches(emit, batch_format="pyarrow")


def merge_upsert_docs(sf_dir: str, driver_max: int = 2_000_000):
    """MERGE INTO / CDC-apply — the lakehouse upsert every incremental
    corpus refresh runs: apply a change feed (update / delete / insert
    rows keyed by doc_id) to the base table in ONE pass over the base.

    Scale shape: a CDC batch is small relative to the base, so below
    ``driver_max`` change rows the feed broadcasts once (``ray.put``)
    into a stateless base-side filter+patch pass — the base table
    streams, nothing shuffles. Above the gate it becomes a left outer
    hash join base ⋈ changes on doc_id (the only all-to-all, sized by
    the base's key column) with the same vectorized patch applied
    post-join. Both forms union the insert rows at the end; two-form
    equality is pytest-asserted (tests/test_round4g_ops.py)."""
    base = _read(sf_dir, "documents", ["doc_id", "n_chars", "source"])
    changes = _docs_cdc_changes(sf_dir)
    n_ch = changes.count()

    if n_ch <= driver_max:
        ch = pa.concat_tables(changes.iter_batches(
            batch_size=None, batch_format="pyarrow"))
        ops = ch["op"].to_numpy(zero_copy_only=False)
        ids = ch["doc_id"].to_numpy(zero_copy_only=False)
        upd_ids = ids[ops == "U"]
        upd_nch = ch["n_chars"].to_numpy(zero_copy_only=False)[ops == "U"]
        del_ids = ids[ops == "D"]
        ref = ray.put((upd_ids, upd_nch, del_ids))

        def patch(t: pa.Table) -> pa.Table:
            u_ids, u_nch, d_ids = ray.get(ref)
            bid = t["doc_id"].to_numpy(zero_copy_only=False)
            keep = ~np.isin(bid, d_ids)
            bid = bid[keep]
            nch = t["n_chars"].to_numpy(zero_copy_only=False)[keep]
            src = t["source"].to_numpy(zero_copy_only=False)[keep]
            um = np.isin(bid, u_ids)
            if um.any():
                pos = pd.Index(u_ids).get_indexer(bid[um])
                nch = nch.copy()
                nch[um] = u_nch[pos]
                src = src.copy()
                src[um] = "patched"
            return pa.table({"doc_id": pa.array(bid, pa.int64()),
                             "n_chars": pa.array(nch, pa.int64()),
                             "source": pa.array(src, pa.string())})

        merged = base.map_batches(patch, batch_format="pyarrow")
        ins = ch.filter(pc.equal(ch["op"], "I")).select(
            ["doc_id", "n_chars", "source"])
        return merged.union(rd.from_arrow(ins))

    # distributed form: one hash join keyed on doc_id
    ud = changes.map_batches(
        lambda t: t.filter(pc.not_equal(t["op"], "I")).rename_columns(
            ["ch_doc_id", "op", "ch_n_chars", "ch_source"]),
        batch_format="pyarrow")
    j = base.join(ud, join_type="left_outer", num_partitions=8,
                  on=("doc_id",), right_on=("ch_doc_id",))

    def patch_joined(t: pa.Table) -> pa.Table:
        op = pc.fill_null(t["op"], "").to_numpy(zero_copy_only=False)
        keep = op != "D"
        bid = t["doc_id"].to_numpy(zero_copy_only=False)[keep]
        nch = t["n_chars"].to_numpy(zero_copy_only=False)[keep]
        src = t["source"].to_numpy(zero_copy_only=False)[keep]
        cn = pc.fill_null(t["ch_n_chars"], -1).to_numpy(
            zero_copy_only=False)[keep]
        um = op[keep] == "U"
        nch = np.where(um, cn, nch)
        src = np.where(um, "patched", src)
        return pa.table({"doc_id": pa.array(bid, pa.int64()),
                         "n_chars": pa.array(nch, pa.int64()),
                         "source": pa.array(src.astype(object), pa.string())})

    merged = j.map_batches(patch_joined, batch_format="pyarrow")
    ins = changes.map_batches(
        lambda t: t.filter(pc.equal(t["op"], "I")).select(
            ["doc_id", "n_chars", "source"]), batch_format="pyarrow")
    return merged.union(ins)


MERGE_UPSERT_SQL = """
WITH ch AS (
  SELECT doc_id, 'U' AS op, n_chars + 1000 AS n_chars,
         'patched' AS source FROM documents WHERE doc_id % 97 = 3
  UNION ALL
  SELECT doc_id, 'D', 0, '' FROM documents WHERE doc_id % 97 = 7
  UNION ALL
  SELECT doc_id + 1000000000, 'I', n_chars, 'inserted'
  FROM documents WHERE doc_id % 97 = 11
)
SELECT d.doc_id,
       CAST(COALESCE(u.n_chars, d.n_chars) AS BIGINT) AS n_chars,
       COALESCE(u.source, d.source) AS source
FROM documents d
LEFT JOIN (SELECT * FROM ch WHERE op = 'U') u USING (doc_id)
WHERE NOT EXISTS (SELECT 1 FROM ch
                  WHERE ch.op = 'D' AND ch.doc_id = d.doc_id)
UNION ALL
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, source
FROM ch WHERE op = 'I'
"""


def scd2_user_type_history(sf_dir: str):
    """Slowly-changing-dimension type-2 history build — collapse each
    user's event stream into validity intervals: one row per
    consecutive RUN of equal event_type, with [valid_from, valid_to)
    epoch-second bounds (open current interval → sentinel 4102444800 =
    2100-01-01) and a 1-based version counter. The dimension-table
    build every warehouse ingest runs.

    Scale shape: groupby(user_id) co-locates each key's stream exactly
    once (hash-sharded at scale); the per-group pass is one vectorized
    sort + change-point diff — no per-event state store, no driver
    state. Strict (ts, event_id) ordering on both sides makes the SQL
    window oracle exact."""
    return _scd2_intervals(_read(sf_dir, "events",
                                 ["event_id", "ts", "user_id",
                                  "event_type"]))


def _scd2_intervals(ds):
    """events-shaped stream → SCD2 validity intervals (one row per
    consecutive run of equal event_type per user; shared by
    ``scd2_user_type_history`` and ``pit_join_events``)."""
    sentinel = 4102444800

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        chg = np.ones(len(g), bool)
        chg[1:] = et[1:] != et[:-1]
        starts = np.flatnonzero(chg)
        vf = ts[starts] // 1_000_000
        vt = np.empty_like(vf)
        vt[:-1] = vf[1:]
        vt[-1] = sentinel
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy(np.int64)[starts],
            "event_type": et[starts],
            "version": np.arange(1, len(starts) + 1, dtype=np.int64),
            "valid_from": vf, "valid_to": vt})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pandas")


SCD2_SQL = """
WITH e AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
r AS (
  SELECT user_id, event_type, ts,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS version
  FROM e
),
v AS (
  SELECT user_id, event_type, CAST(version AS BIGINT) AS version,
         CAST(floor(epoch(min(ts))) AS BIGINT) AS valid_from
  FROM r GROUP BY user_id, event_type, version
)
SELECT user_id, event_type, version, valid_from,
       COALESCE(lead(valid_from) OVER (PARTITION BY user_id
                                       ORDER BY version),
                4102444800) AS valid_to
FROM v
"""


def gap_fill_hourly_values(sf_dir: str):
    """Time-series gap fill with last-observation-carried-forward — the
    metrics/sensor resample every monitoring pipeline runs: per
    event_type, the hourly MAX observed value (cents), densified onto
    the full hour grid [global min hour, global max hour] with missing
    hours carried forward from the last observed hour (−1 before a
    type's first observation; ``observed`` flags real points).

    Scale shape: the only corpus-sized work is one shuffle-free
    map pass + a (type × hour) grouped Max whose OUTPUT is
    time-range-bounded, not corpus-bounded (hours in the data's time
    span × event types) — so the driver-side densify/fill is O(grid),
    independent of row count. DuckDB oracle uses generate_series +
    LAST_VALUE IGNORE NULLS over the identical grid."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def obs_batch(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "hour_epoch": ts // 3_600_000_000 * 3600,
            "v": _cents(t["value"]).to_numpy(zero_copy_only=False)})
        g = df.groupby(["event_type", "hour_epoch"], sort=False) \
              .agg(v=("v", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    obs = (ds.map_batches(obs_batch, batch_format="pyarrow")
           .groupby(["event_type", "hour_epoch"])
           .aggregate(Max("v", alias_name="v")))
    rows = obs.take_all()  # bounded: |types| x |hours in time range|
    if not rows:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "hour_epoch": pa.array([], pa.int64()),
                         "value_c": pa.array([], pa.int64()),
                         "observed": pa.array([], pa.int64())})
    h0 = min(r["hour_epoch"] for r in rows)
    h1 = max(r["hour_epoch"] for r in rows)
    grid = np.arange(h0, h1 + 1, 3600, dtype=np.int64)
    bytype: dict[str, list] = {}
    for r in rows:
        bytype.setdefault(r["event_type"], []).append(
            (r["hour_epoch"], r["v"]))
    out_t, out_h, out_v, out_o = [], [], [], []
    for et in sorted(bytype):
        vals = np.full(len(grid), -1, np.int64)
        seen = np.zeros(len(grid), np.int64)
        for h, v in bytype[et]:
            ix = (h - h0) // 3600
            vals[ix] = v
            seen[ix] = 1
        last = np.maximum.accumulate(
            np.where(seen == 1, np.arange(len(grid)), -1))
        filled = np.where(last >= 0, vals[np.maximum(last, 0)], -1)
        out_t.extend([et] * len(grid))
        out_h.append(grid)
        out_v.append(filled)
        out_o.append(seen)
    return pa.table({
        "event_type": pa.array(out_t, pa.string()),
        "hour_epoch": pa.array(np.concatenate(out_h), pa.int64()),
        "value_c": pa.array(np.concatenate(out_v), pa.int64()),
        "observed": pa.array(np.concatenate(out_o), pa.int64())})


GAP_FILL_SQL = """
WITH obs AS (
  SELECT event_type,
         CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
         max(CAST(round(value * 100) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
),
b AS (SELECT min(hour_epoch) AS h0, max(hour_epoch) AS h1 FROM obs),
grid AS (
  SELECT t.event_type, g.h AS hour_epoch
  FROM (SELECT DISTINCT event_type FROM obs) t,
       (SELECT unnest(generate_series(h0, h1, 3600)) AS h FROM b) g
),
j AS (
  SELECT grid.event_type, grid.hour_epoch, obs.v,
         CASE WHEN obs.v IS NULL THEN 0 ELSE 1 END AS observed
  FROM grid LEFT JOIN obs USING (event_type, hour_epoch)
)
SELECT event_type, hour_epoch,
       COALESCE(LAST_VALUE(v IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY hour_epoch
           ROWS UNBOUNDED PRECEDING), -1) AS value_c,
       CAST(observed AS BIGINT) AS observed
FROM j
"""


def docs_hive_partition_roundtrip(sf_dir: str):
    """Hive-partitioned lakehouse layout + partition-PRUNED read-back:
    write documents partitioned by ``lang`` (one ``lang=<v>/``
    directory per value — the layout that makes per-language corpus
    jobs free), then read ONLY the lexicographically-first language's
    directory back. The read never opens any other partition's files —
    directory-level pruning, the strongest predicate pushdown there is.
    Round-trip is oracle-checked against a plain filtered scan."""
    import shutil

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    langs = set()
    for b in ds.map_batches(
            lambda t: pa.table({"lang": pc.unique(t["lang"])}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        langs.update(b["lang"].to_pylist())
    lang0 = min(langs)
    out = (f"/tmp/rendler_ray_hive/docs-"
           f"{os.path.basename(os.path.normpath(sf_dir))}-{os.getpid()}")
    shutil.rmtree(out, ignore_errors=True)
    ds.write_parquet(out, partition_cols=["lang"])
    part = rd.read_parquet(os.path.join(out, f"lang={lang0}"))
    return part.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "lang": pa.array([lang0] * t.num_rows, pa.string()),
            "n_chars": t["n_chars"]}),
        batch_format="pyarrow")


HIVE_ROUNDTRIP_SQL = """
SELECT doc_id, lang, n_chars FROM documents
WHERE lang = (SELECT min(lang) FROM documents)
"""


def robust_outlier_docs(sf_dir: str, n_hist: int = 1024):
    """Robust per-source outlier detection (median/MAD, the
    length-anomaly screen that survives heavy-tailed length
    distributions where mean/stddev z-scores don't): keep docs whose
    length deviates from their OWN source's exact median by more than
    3.5 robust units, i.e. |x − med| > 3.5 · MAD with MAD =
    median(|x − med|).

    Scale shape: two grouped EXACT medians via the shared
    histogram-bisection engine (``_grouped_value_bisect`` — no
    per-group sorts, O(sources) driver state, ≈log(range) streaming
    passes each); the per-source med/MAD tables broadcast into a
    stateless filter. All arithmetic in the lo+hi doubled-median
    convention so the comparison 4·dev > 7·mad2 is pure int64 and the
    SQL oracle is hash-exact (dev = 2|x − med| ⇒ |x−med| > 3.5·MAD ⟺
    4·dev > 7·mad2)."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    agg = ds.aggregate(Min("n_chars", alias_name="lo"),
                       Max("n_chars", alias_name="hi"),
                       Count(alias_name="n"))
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "source": pa.array([], pa.string()),
                      "n_chars": pa.array([], pa.int64())})
    if not (agg["n"] or 0):
        return empty
    lo, hi = int(agg["lo"]), int(agg["hi"])

    cnts = (ds.groupby("source")
            .aggregate(Count(alias_name="n")).take_all())
    state: dict[tuple[str, int], list[int]] = {}
    for r in cnts:
        n = int(r["n"])
        state[(r["source"], 0)] = [lo, hi, (n + 1) // 2]
        state[(r["source"], 1)] = [lo, hi, n // 2 + 1]
    sel = _grouped_value_bisect(ds, "source", "n_chars", state, n_hist)
    med2 = {s: sel[(s, 0)] + sel[(s, 1)] for s in {k[0] for k in state}}
    mref = ray.put(med2)

    def dev_batch(t: pa.Table) -> pa.Table:
        m = ray.get(mref)
        srcs = t["source"].to_numpy(zero_copy_only=False)
        x = t["n_chars"].to_numpy(zero_copy_only=False)
        m2 = np.fromiter((m[s] for s in srcs), np.int64, len(srcs))
        return t.append_column(
            "dev", pa.array(np.abs(2 * x - m2), pa.int64()))

    devds = ds.map_batches(dev_batch, batch_format="pyarrow")
    dagg = devds.aggregate(Min("dev", alias_name="lo"),
                           Max("dev", alias_name="hi"))
    dlo, dhi = int(dagg["lo"]), int(dagg["hi"])
    dstate: dict[tuple[str, int], list[int]] = {}
    for r in cnts:
        n = int(r["n"])
        dstate[(r["source"], 0)] = [dlo, dhi, (n + 1) // 2]
        dstate[(r["source"], 1)] = [dlo, dhi, n // 2 + 1]
    dsel = _grouped_value_bisect(devds, "source", "dev", dstate, n_hist)
    mad2 = {s: dsel[(s, 0)] + dsel[(s, 1)]
            for s in {k[0] for k in dstate}}
    madref = ray.put(mad2)

    def gate(t: pa.Table) -> pa.Table:
        md = ray.get(madref)
        srcs = t["source"].to_numpy(zero_copy_only=False)
        dv = t["dev"].to_numpy(zero_copy_only=False)
        m2 = np.fromiter((md[s] for s in srcs), np.int64, len(srcs))
        return t.filter(pa.array(4 * dv > 7 * m2)).select(
            ["doc_id", "source", "n_chars"])

    out = devds.map_batches(gate, batch_format="pyarrow").materialize()
    # a fully-empty filter result drops block schemas downstream —
    # return the typed empty table instead (legit outcome: a corpus
    # with no 3.5-MAD length outliers)
    return empty if out.count() == 0 else out


ROBUST_OUTLIER_SQL = """
WITH m AS (
  SELECT source,
         CAST((list(n_chars ORDER BY n_chars))[(count(*)+1)//2]
            + (list(n_chars ORDER BY n_chars))[count(*)//2+1]
              AS BIGINT) AS med2
  FROM documents GROUP BY source
),
d AS (
  SELECT doc_id, documents.source, n_chars,
         abs(2 * n_chars - med2) AS dev
  FROM documents JOIN m USING (source)
),
md AS (
  SELECT source,
         CAST((list(dev ORDER BY dev))[(count(*)+1)//2]
            + (list(dev ORDER BY dev))[count(*)//2+1]
              AS BIGINT) AS mad2
  FROM d GROUP BY source
)
SELECT doc_id, d.source, n_chars
FROM d JOIN md USING (source)
WHERE 4 * dev > 7 * mad2
"""


def kcenter_coreset_embeddings(sf_dir: str, k: int = 16):
    """Greedy k-center coreset selection (Gonzalez'85 farthest-point
    traversal) over the embedding corpus — the diversity-maximizing
    data-selection pass (pick the k points that 2-approximate the
    minimal covering radius; used for coreset construction and
    active-learning seed sets). Seed = vec_id 0; each of the k−1
    rounds is ONE streaming pass that (a) folds the new center's
    squared-L2 distance into a persisted per-row min-distance column
    and (b) reduces a per-batch (dist, vec_id) champion to the driver
    — the corpus is never pulled, never all-pairs, and parallelism is
    block-level. k rounds total (the algorithm is inherently
    sequential in k; k is small by construction). Distances fixed to
    e6 int64 with min-vec_id tie-break, so the selection is exact and
    parallelism-invariant.

    Execution shape (the BlockKnnScan layout + raw per-block tasks —
    the Dataset API can't express per-block state that persists
    across k DEPENDENT rounds without re-materializing the corpus
    every round, which cost ~0.25 s of executor fixed overhead × 2
    executions × k rounds, 8.1 s at sf0.1): the corpus is laid into
    plasma blocks ONCE; each round launches one task per block whose
    min-distance array argument and result stay in plasma next to
    their block (ObjectRefs are chained, never ray.get on the driver)
    — only k × n_blocks (dist, id, 64-float vec) champion tuples ever
    reach the driver. Output: (rank, vec_id, radius_e6) — the
    decreasing coverage-radius sequence. Rows-only (iterative);
    golden-pinned + brute-force pytest."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "emb": pa.array([], pa.list_(pa.float64()))})
        m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        return pa.table({
            "vec_id": t["vec_id"],
            "emb": pa.FixedSizeListArray.from_arrays(
                pa.array(m.ravel(), pa.float64()), m.shape[1])})

    mat = ds.map_batches(prep, batch_format="pyarrow").materialize()
    refs = list(mat.to_arrow_refs())
    c0 = _query_vecs(sf_dir, 1)[0]

    @ray.remote(num_returns=2)
    def kc_round(tb, mind, center):
        if tb.num_rows == 0:
            return np.zeros(0, np.int64), (-1, 1 << 62, None)
        ids = tb["vec_id"].to_numpy(zero_copy_only=False)
        m = tb["emb"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).reshape(tb.num_rows, -1)
        diff = m - np.asarray(center, np.float64)[None, :]
        d = np.rint(np.einsum("ij,ij->i", diff, diff) * 1e6) \
            .astype(np.int64)
        mind = d if mind is None else np.minimum(mind, d)
        best = np.lexsort((ids, -mind))[0]
        return mind, (int(mind[best]), int(ids[best]), m[best].tolist())

    centers = [(0, 0)]  # (vec_id, radius_e6 at selection)
    cur = c0
    minds = [None] * len(refs)
    for _ in range(1, k):
        outs = [kc_round.remote(ref, mind, cur)
                for ref, mind in zip(refs, minds)]
        minds = [o[0] for o in outs]  # ObjectRefs: stay in plasma
        champs = ray.get([o[1] for o in outs])
        bd, bid, bvec = max(champs, key=lambda c: (c[0], -c[1]))
        if bd < 0:  # empty corpus
            break
        centers.append((bid, bd))
        cur = np.asarray(bvec, np.float64)

    return pa.table({
        "rank": pa.array(range(len(centers)), pa.int64()),
        "vec_id": pa.array([c[0] for c in centers], pa.int64()),
        "radius_e6": pa.array([c[1] for c in centers], pa.int64())})


def source_epoch_repeat_docs(sf_dir: str):
    """Epoch-repetition data mixing — materialize the training stream
    where each SOURCE is repeated a per-source number of epochs (the
    "4 epochs of wiki, 1 of web" mixture recipe every LLM data plan
    specifies; Muennighoff NeurIPS'23 studies exactly this repeat
    factor): factor(source) = 1 + (first md5 byte of the source name
    mod 3) ∈ {1,2,3} — content-independent, reproducible, and
    SQL-mirrorable. Output one (doc_id, source, epoch) row per epoch
    copy. Shuffle-free: one map pass with np.repeat; the per-batch md5
    cost is one hash per DISTINCT source per batch."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def rep(t: pa.Table) -> pa.Table:
        src = t["source"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src.astype(object), return_inverse=True)
        fac = np.array([1 + int(hashlib.md5(s.encode())
                                .hexdigest()[:2], 16) % 3
                        for s in uniq], np.int64)[inv]
        idx = np.repeat(np.arange(len(ids)), fac)
        epoch = np.concatenate([np.arange(1, f + 1) for f in fac]) \
            if len(fac) else np.zeros(0, np.int64)
        return pa.table({
            "doc_id": pa.array(ids[idx], pa.int64()),
            "source": pa.array(src[idx].astype(object), pa.string()),
            "epoch": pa.array(epoch, pa.int64())})

    return ds.map_batches(rep, batch_format="pyarrow")


SOURCE_EPOCH_REPEAT_SQL = """
WITH f AS (
  SELECT source,
         1 + (CAST('0x' || substr(md5(source), 1, 2) AS INT) % 3)
           AS factor
  FROM (SELECT DISTINCT source FROM documents)
)
SELECT d.doc_id, d.source,
       CAST(unnest(generate_series(1, f.factor)) AS BIGINT) AS epoch
FROM documents d JOIN f USING (source)
"""


def vocab_coverage_curve(sf_dir: str, ks=(10, 100, 1000, 10000),
                         driver_max: int = 2_000_000):
    """Vocabulary coverage curve — what fraction of all token
    INSTANCES the top-k most frequent types cover, at k ∈ {10, 100,
    1k, 10k}: the tokenizer-sizing diagnostic (where the Zipf mass
    lives decides the vocab size / OOV budget). Deterministic
    (freq desc, token asc) tie order, integer-exact coverage_e6.

    Scale shape: per-batch value_counts partials; below ``driver_max``
    partial rows the vocab folds on the driver through Arrow's C++
    hash aggregate (zero shuffles — the _token_freq_topk finding);
    above it, one distributed groupby + sort + limit(max k) whose
    collected output is ≤ max(ks) rows by construction, plus a scalar
    Sum for the denominator. Output: 4 rows."""
    ds = _read(sf_dir, "documents", ["text"])

    def tok_counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(t["text"].combine_chunks(), " "))
        vc = pd.Series(toks.to_numpy(zero_copy_only=False)) \
            .value_counts(sort=False)
        return pa.table({
            "token": pa.array(vc.index.tolist(), pa.string()),
            "c": pa.array(vc.to_numpy(np.int64))})

    kmax = max(ks)
    partials = ds.map_batches(tok_counts, batch_format="pyarrow")
    tables, n, over = [], 0, False
    for b in partials.iter_batches(batch_size=None,
                                   batch_format="pyarrow"):
        tables.append(b)
        n += b.num_rows
        if n > driver_max:
            over = True
            break
    if not over:
        if n == 0:
            top_c, total = np.zeros(0, np.int64), 0
        else:
            t = pa.concat_tables(tables).group_by("token") \
                .aggregate([("c", "sum")]).rename_columns(["token", "c"])
            df = t.to_pandas().sort_values(["c", "token"],
                                           ascending=[False, True])
            top_c = df["c"].head(kmax).to_numpy(np.int64)
            total = int(df["c"].sum())
    else:
        freq = partials.groupby("token").aggregate(
            Sum("c", alias_name="c"))
        rows = freq.sort(["c", "token"], descending=[True, False]) \
            .limit(kmax).take_all()
        top_c = np.array([r["c"] for r in rows], np.int64)
        total = int(partials.aggregate(Sum("c", alias_name="s"))["s"])
    cum = np.cumsum(top_c)
    out_k, out_cov = [], []
    for k in ks:
        out_k.append(k)
        out_cov.append(int(cum[min(k, len(cum)) - 1]) if len(cum) else 0)
    cov = np.array(out_cov, np.int64)
    return pa.table({
        "k": pa.array(out_k, pa.int64()),
        "covered": pa.array(cov, pa.int64()),
        "total": pa.array([total] * len(ks), pa.int64()),
        "coverage_e6": pa.array(
            cov * 1_000_000 // max(total, 1), pa.int64())})


VOCAB_COVERAGE_SQL = """
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
             FROM documents),
f AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
o AS (SELECT c,
             row_number() OVER (ORDER BY c DESC, token ASC) AS rnk,
             sum(c) OVER (ORDER BY c DESC, token ASC
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM f),
t AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM f)
SELECT ks.k, CAST(COALESCE((SELECT max(cum) FROM o WHERE rnk <= ks.k),
                           0) AS BIGINT) AS covered,
       t.total,
       CAST(COALESCE((SELECT max(cum) FROM o WHERE rnk <= ks.k), 0)
            * 1000000 // greatest(t.total, 1) AS BIGINT) AS coverage_e6
FROM (SELECT CAST(unnest([10, 100, 1000, 10000]) AS BIGINT) AS k) ks, t
"""


def compression_ratio_docs(sf_dir: str):
    """Per-source compressibility profile — zlib level-6 bytes over raw
    UTF-8 bytes (the Gopher/FineWeb-style repetitiveness signal:
    boilerplate and template farms compress far below prose; a data
    card reports it per source). Output: (source, raw_bytes,
    zip_bytes, ratio_e6). Shuffle-free scan + a sources-bounded
    grouped sum; the per-doc compress call is C-speed zlib inside the
    batch (the same per-doc-inference shape as classifier scoring).
    zlib output is deterministic for a fixed level/strategy, so the
    op goldens (no SQL — DuckDB has no zlib)."""
    import zlib

    ds = _read(sf_dir, "documents", ["source", "text"])

    def comp(t: pa.Table) -> pa.Table:
        src = t["source"].to_numpy(zero_copy_only=False)
        raw = pc.binary_length(
            pc.cast(t["text"], pa.binary())).to_numpy(
            zero_copy_only=False).astype(np.int64)
        zipb = np.fromiter(
            (len(zlib.compress(s.encode(), 6)) for s in
             t["text"].to_pylist()), np.int64, t.num_rows)
        df = pd.DataFrame({"source": src, "raw_bytes": raw,
                           "zip_bytes": zipb})
        g = df.groupby("source", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(comp, batch_format="pyarrow")
           .groupby("source")
           .aggregate(Sum("raw_bytes", alias_name="raw_bytes"),
                      Sum("zip_bytes", alias_name="zip_bytes")))

    def fin(t: pa.Table) -> pa.Table:
        raw = t["raw_bytes"].to_numpy(zero_copy_only=False)
        z = t["zip_bytes"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "ratio_e6",
            pa.array(z * 1_000_000 // np.maximum(raw, 1), pa.int64()))

    return agg.map_batches(fin, batch_format="pyarrow")


def leakage_free_split_docs(sf_dir: str):
    """Train/val/test split WITHOUT near-duplicate leakage — the
    eval-contamination guard a naive doc_id-hash split misses: two
    near-duplicate docs hashed independently land in different splits
    ~32% of the time, silently putting paraphrases of eval docs in
    train. Split assignment is therefore keyed on the near-dup
    CLUSTER id (MinHash-LSH → exact-Jaccard verify → connected
    components — the near_dup_dedup_docs chain; singletons are their
    own cluster), so a whole cluster moves together: md5(cluster) →
    ~80/10/10 train(0)/val(1)/test(2). Deterministic; rows-only
    (clustering is iterative), golden-pinned + no-pair-straddles
    pytest."""
    import hashlib

    pairs = _verified_jaccard_pairs(sf_dir, "leakfree_banded")

    def pair_edges(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array([f"{x:012d}" for x in a], pa.string()),
            "dst": pa.array([f"{x:012d}" for x in b], pa.string())})

    from rendler_ray.functions import graph as F_graph
    from rendler_ray.state.politeness import _nonempty_blocks

    cc = F_graph.connected_components_auto(
        pairs.map_batches(pair_edges, batch_format="pyarrow"))
    members = _nonempty_blocks(cc.map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["url"], pa.int64()),
            "cluster": pc.cast(t["component"], pa.int64())}),
        batch_format="pyarrow"))

    docs = _read(sf_dir, "documents", ["doc_id"])
    if members is None:
        labeled = docs.map_batches(
            lambda t: t.append_column("cluster", t["doc_id"]),
            batch_format="pyarrow")
    else:
        joined = docs.join(members, join_type="left_outer",
                           num_partitions=8, on=("doc_id",))

        def label(t: pa.Table) -> pa.Table:
            doc = t["doc_id"].to_numpy(zero_copy_only=False)
            cl = t["cluster"].to_numpy(zero_copy_only=False)
            cl = np.where(np.isnan(cl.astype(np.float64)), doc,
                          cl).astype(np.int64)
            return pa.table({"doc_id": pa.array(doc, pa.int64()),
                             "cluster": pa.array(cl, pa.int64())})

        labeled = joined.map_batches(label, batch_format="pyarrow")

    def assign(t: pa.Table) -> pa.Table:
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(cl, return_inverse=True)
        h = np.array([int(hashlib.md5(f"{c}-lf".encode())
                          .hexdigest()[:2], 16) for c in uniq],
                     np.int64)[inv]
        split = np.where(h < 204, 0, np.where(h < 230, 1, 2))
        return t.append_column("split",
                               pa.array(split.astype(np.int64)))

    return labeled.map_batches(assign, batch_format="pyarrow")


def curriculum_interleave_docs(sf_dir: str):
    """Curriculum / balanced-stream ordering — the training-order
    materialization that interleaves sources round-robin by
    within-source quality rank (best doc of every source first, then
    every second-best, …): prevents any single large source from
    dominating early training while still feeding high-quality docs
    first. Output: (doc_id, source, rnk, pos) — ``rnk`` the 1-based
    within-source quality rank, ``pos`` the global stream position.

    Scale shape: the shuffle-free classifier scoring pass, then the
    source_percentile_scores machinery twice — per-source rank via ONE
    global range-partitioned sort + distributed zip-with-index +
    broadcast per-source offsets (no per-group sorts, no group
    materialization), and the final stream position via a second
    global sort on (rnk, source, doc_id) + zip-with-index. Ordering
    ops are exactly the two sorts; everything else is stateless
    maps."""
    from rendler_ray.util import with_row_seq

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(flat.astype(object), return_inverse=True)
        w = _clf_weights(uniq)[inv]
        s = np.bincount(par, weights=w, minlength=t.num_rows)
        return pa.table({
            "doc_id": t["doc_id"], "source": t["source"],
            # negate so the ASC zip-with-index ranks best-first
            "neg_score": pa.array(-np.rint(s).astype(np.int64),
                                  pa.int64())})

    keyed = ds.map_batches(score, batch_format="pyarrow").materialize()
    ranked = with_row_seq(keyed, ["source", "neg_score", "doc_id"],
                          start=1, column="grank")
    counts = (keyed.groupby("source").aggregate(Count(alias_name="n"))
              .take_all())  # bounded: one row per source
    counts.sort(key=lambda r: r["source"])
    offs, cum = {}, 0
    for r in counts:
        offs[r["source"]] = cum
        cum += int(r["n"])
    oref = ray.put(offs)

    def to_rank(t: pa.Table) -> pa.Table:
        o = ray.get(oref)
        srcs = t["source"].to_pylist()
        g = t["grank"].to_numpy(zero_copy_only=False)
        rnk = g - np.array([o[s] for s in srcs], np.int64)
        return pa.table({"doc_id": t["doc_id"], "source": t["source"],
                         "rnk": pa.array(rnk, pa.int64())})

    ranked = ranked.map_batches(to_rank, batch_format="pyarrow")
    return with_row_seq(ranked, ["rnk", "source", "doc_id"],
                        start=1, column="pos")


CURRICULUM_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
sc AS (SELECT doc_id,
              CAST(sum((CAST('0x' || substr(md5(token), 1, 15) AS BIGINT)
                        % 1001) - 500) AS BIGINT) AS clf_score
       FROM tok GROUP BY doc_id),
s AS (SELECT d.doc_id, d.source, sc.clf_score
      FROM documents d JOIN sc USING (doc_id)),
r AS (SELECT doc_id, source,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY clf_score DESC, doc_id)
                  AS BIGINT) AS rnk
      FROM s)
SELECT doc_id, source, rnk,
       CAST(row_number() OVER (ORDER BY rnk, source, doc_id)
            AS BIGINT) AS pos
FROM r
"""


def ann_filtered_topk(sf_dir: str):
    """FILTERED vector search — top-10 cosine neighbors among only the
    rows passing a metadata predicate (label even), for 4 fixed query
    vectors: the filtered-ANN workload every vector store serves
    (search within a language / license / date range). Pre-filtering
    at the scan is the exact, scale-correct form when the predicate is
    selective-ish (the corpus stream shrinks BEFORE any similarity
    work; post-filtering a top-k can return < k rows). Same broadcast
    query matrix → per-batch partial top-k → fixed-point reduce chain
    as ann_topk."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["label"], 1), 0))
        .select(["vec_id", "embedding"]),
        batch_format="pyarrow")
    queries = _query_vecs(sf_dir, 4)
    out = F_ann.brute_force_topk(ds, queries, k=10)
    return out.select_columns(["query_id", "vec_id", "score_e6", "rank"])


ANN_FILTERED_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < 4),
scores AS (
  SELECT q.query_id, e.vec_id,
         CAST(round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
              CAST(e.embedding AS DOUBLE[])) * 1000000) AS BIGINT)
           AS score_e6
  FROM q CROSS JOIN embeddings e WHERE e.label % 2 = 0)
SELECT query_id, vec_id, score_e6,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY score_e6 DESC, vec_id ASC) AS rank
FROM scores
QUALIFY rank <= 10
"""


def skew_join_user_spend(sf_dir: str):
    """Skew-resistant fact⋈dim join (functions/join.py::skew_join —
    exact hot keys via the two-pass heavy-hitter pattern broadcast
    map-side, cold keys through the normal hash join): events (fact,
    skewed user_id) ⋈ customer (dim) → per-segment spend. A plain hash
    join serializes each hot key into one partition's task; the hybrid
    spreads a hot key's work over every block that contains it. Values
    fixed to cents per-row BEFORE the sum; the hybrid's output equals
    the plain join row-for-row (pytest, incl. adversarial 50%-one-key
    skew)."""
    from rendler_ray.functions.join import skew_join

    ev = _read(sf_dir, "events", ["user_id", "value"])
    ev = ev.map_batches(
        lambda t: pa.table({"user_id": t["user_id"],
                            "value_c": _cents(t["value"])}),
        batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    j = skew_join(ev, cust, on="user_id", right_on="c_custkey",
                  hot_eps=0.02)
    return j.groupby("c_mktsegment").aggregate(
        Sum("value_c", alias_name="spend_c"),
        Count(alias_name="n_events"))


SKEW_JOIN_SQL = """
SELECT c_mktsegment,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS spend_c,
       count(*) AS n_events
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


def docs_schema_evolution_union(sf_dir: str):
    """Schema-evolution ingestion (UNION BY NAME with fill — the
    lakehouse append every evolving corpus hits: a new snapshot adds a
    ``quality`` column and drops ``lang``): snapshot A = documents
    as-is, snapshot B = a derived refresh (doc_id + 10^9, no lang,
    quality = n_chars % 100) written to parquet and read back, then
    aligned by COLUMN NAME with explicit fills (missing quality → −1,
    missing lang → '') and unioned. Fills are sentinels, not NULLs, so
    the hash compare stays integer/string-exact on both sides. The
    union itself is metadata-only (no shuffle)."""
    a = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def evolve(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        nch = t["n_chars"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids + 1_000_000_000, pa.int64()),
            "n_chars": pa.array(nch, pa.int64()),
            "quality": pa.array(nch % 100, pa.int64())})

    out = (f"/tmp/rendler_ray_evo/docs-"
           f"{os.path.basename(os.path.normpath(sf_dir))}-{os.getpid()}")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    a.map_batches(evolve, batch_format="pyarrow").write_parquet(out)
    b = rd.read_parquet(out)

    a2 = a.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"], "lang": t["lang"],
            "n_chars": t["n_chars"],
            "quality": pa.array(np.full(t.num_rows, -1, np.int64))}),
        batch_format="pyarrow")
    b2 = b.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "lang": pa.array([""] * t.num_rows, pa.string()),
            "n_chars": t["n_chars"], "quality": t["quality"]}),
        batch_format="pyarrow")
    return a2.union(b2)


SCHEMA_EVOLUTION_SQL = """
SELECT doc_id, lang, n_chars, -1 AS quality FROM documents
UNION ALL
SELECT doc_id + 1000000000 AS doc_id, '' AS lang, n_chars,
       n_chars % 100 AS quality
FROM documents
"""


def compact_docs_files(sf_dir: str):
    """Small-file compaction (lakehouse OPTIMIZE's other half): a
    64-way-fragmented copy of documents is rewritten into few
    near-target-size files — the maintenance pass that keeps per-file
    fixed costs (open/footer/stats) from dominating reads after many
    small incremental appends. Emits one stats row
    (files_before/after, rows, int64 checksums) proving the rewrite is
    content-identical; at scale the same op runs per partition
    directory so compaction parallelizes and stays resumable.
    Deterministic; rows-only (file layout isn't SQL-visible),
    golden-pinned."""
    import shutil

    tag = f"{os.path.basename(os.path.normpath(sf_dir))}-{os.getpid()}"
    src = f"/tmp/rendler_ray_compact/frag-{tag}"
    dst = f"/tmp/rendler_ray_compact/compact-{tag}"
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(dst, ignore_errors=True)

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    ds.repartition(64).write_parquet(src)
    files_before = len([f for f in os.listdir(src)
                        if f.endswith(".parquet")])

    frag = rd.read_parquet(src)
    total = sum(os.path.getsize(os.path.join(src, f))
                for f in os.listdir(src))
    target = max(1, -(-total // (128 << 20)))  # ceil(bytes / 128MB)
    frag.repartition(int(target)).write_parquet(dst)
    files_after = len([f for f in os.listdir(dst)
                       if f.endswith(".parquet")])

    back = rd.read_parquet(dst)
    chk = back.aggregate(Count(alias_name="rows"),
                         Sum("doc_id", alias_name="sum_ids"),
                         Sum("n_chars", alias_name="sum_chars"))
    return pa.table({
        "files_before": pa.array([files_before], pa.int64()),
        "files_after": pa.array([files_after], pa.int64()),
        "rows": pa.array([int(chk["rows"])], pa.int64()),
        "sum_ids": pa.array([int(chk["sum_ids"])], pa.int64()),
        "sum_chars": pa.array([int(chk["sum_chars"])], pa.int64())})


def chi2_token_lang(sf_dir: str, vocab_k: int = 500, topk: int = 20):
    """χ² feature selection over (token, language) — the classic
    supervised feature-ranking pass (Yang & Pedersen ICML'97) a
    pipeline runs to pick class-discriminative vocabulary for a
    lightweight classifier: per language, the top-``topk`` vocabulary
    tokens by the χ² statistic of the doc-level presence 2×2 table
    (a = docs of the lang containing the token, b/c/d the complements).
    χ² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) — ALL INTEGER, computed in
    Python bignums and floored to e6, so the DuckDB HUGEINT oracle is
    hash-exact (no float ever enters).

    Scale shape: the vocabulary cut is the shared ``_token_freq_topk``
    fold; the presence pass is ONE shuffle-free map over the corpus
    emitting per-batch-combined (lang, token_idx, count) partials
    bounded by langs × (vocab_k+1) PER BATCH (a sentinel token_idx −1
    row per doc folds the per-lang doc totals into the same pass), and
    the groupby that sums them touches partial rows, never token
    instances. The χ² arithmetic runs on the bounded
    langs × vocab_k result table on the driver. Only tokens PRESENT in
    a language are ranked (a ≥ 1 — absent-token negative associations
    are out of scope on both sides), and tokens present in every doc
    are skipped (degenerate table, zero denominator)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    vocab = _token_freq_topk(ds, vocab_k)
    vref = ray.put({t: i for i, t in enumerate(vocab)})
    vk = len(vocab)

    def pres(t: pa.Table) -> pa.Table:
        vm = ray.get(vref)
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(flat.astype(object), return_inverse=True)
        uid = np.array([vm.get(u, -1) for u in uniq], np.int64)
        tid = uid[inv]
        keep = tid >= 0
        # unique (doc, token) presence pairs within the batch — docs
        # never split across batches, so these are globally unique
        pairs = np.unique(par[keep].astype(np.int64) * vk + tid[keep])
        langs = np.asarray(t["lang"].to_pylist(), dtype=object)
        lang_rows = np.concatenate([langs[pairs // vk], langs])
        tok_rows = np.concatenate(
            [pairs % vk, np.full(t.num_rows, -1, np.int64)])
        g = pd.DataFrame({"lang": lang_rows, "tok": tok_rows}) \
            .groupby(["lang", "tok"], sort=False).size().reset_index()
        return pa.table({
            "lang": pa.array(g["lang"].to_numpy(object), pa.string()),
            "tok": pa.array(g["tok"].to_numpy(np.int64), pa.int64()),
            "c": pa.array(g[0].to_numpy(np.int64), pa.int64())})

    rows = (ds.map_batches(pres, batch_format="pyarrow")
            .groupby(["lang", "tok"]).aggregate(Sum("c", alias_name="c"))
            .take_all())  # bounded: langs × (vocab_k + 1)

    a = {}          # (lang, tok) -> presence count
    l_tot = {}      # lang -> docs
    t_tot = [0] * vk
    for r in rows:
        if r["tok"] < 0:
            l_tot[r["lang"]] = int(r["c"])
        else:
            a[(r["lang"], int(r["tok"]))] = int(r["c"])
            t_tot[int(r["tok"])] += int(r["c"])
    n = sum(l_tot.values())
    out = []
    for (lang, tok), av in a.items():
        ab = t_tot[tok]
        ac = l_tot[lang]
        if ab >= n:     # token in every doc: degenerate 2x2
            continue
        b = ab - av
        c_ = ac - av
        d = n - ab - ac + av
        num = n * (av * d - b * c_) ** 2 * 10 ** 6
        den = ab * (n - ab) * ac * (n - ac)
        out.append((lang, vocab[tok], num // den))
    out.sort(key=lambda x: (x[0], -x[2], x[1]))
    kept, per_lang = [], {}
    for lang, token, chi in out:
        k = per_lang.get(lang, 0)
        if k < topk:
            per_lang[lang] = k + 1
            kept.append((lang, token, chi))
    return pa.table({
        "lang": pa.array([x[0] for x in kept], pa.string()),
        "token": pa.array([x[1] for x in kept], pa.string()),
        "chi2_e6": pa.array([x[2] for x in kept], pa.int64())})


CHI2_TOKEN_LANG_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
freq AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
vocab AS (SELECT token FROM freq ORDER BY c DESC, token LIMIT 500),
pres AS (SELECT DISTINCT d.doc_id, d.lang, t.token
         FROM documents d JOIN tok t USING (doc_id)
         JOIN vocab v USING (token)),
a AS (SELECT lang, token, CAST(count(*) AS HUGEINT) AS a
      FROM pres GROUP BY lang, token),
tt AS (SELECT token, CAST(count(*) AS HUGEINT) AS ab
       FROM pres GROUP BY token),
lt AS (SELECT lang, CAST(count(*) AS HUGEINT) AS ac
       FROM documents GROUP BY lang),
nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM documents),
chi AS (
  SELECT a.lang, a.token,
         CAST((n * (a * (n - ab - ac + a) - (ab - a) * (ac - a))
                 * (a * (n - ab - ac + a) - (ab - a) * (ac - a))
                 * 1000000)
              // (ab * (n - ab) * ac * (n - ac)) AS BIGINT) AS chi2_e6
  FROM a JOIN tt USING (token) JOIN lt USING (lang) CROSS JOIN nn
  WHERE ab < n)
SELECT lang, token, chi2_e6 FROM chi
QUALIFY row_number() OVER (PARTITION BY lang
                           ORDER BY chi2_e6 DESC, token) <= 20
"""


def auc_quality_eval(sf_dir: str):
    """Exact ROC-AUC of the hashed-feature quality classifier against
    a binary label (lang = 'en') — the eval every scored-data pipeline
    runs before trusting a filter model. AUC via the Mann–Whitney
    U statistic with the standard tie correction (ties contribute ½),
    kept INTEGER throughout: 2U = Σ_s np(s)·(2·NN<(s) + nn(s)) over
    distinct scores s, auc_e6 = 10⁶·2U // (2·n_pos·n_neg).

    Scale shape: one shuffle-free scoring pass with a per-batch
    (score, label) combine; the groupby sums per-DISTINCT-SCORE rows,
    and the distinct-score table is bounded by the SCORE RANGE
    (|score| ≤ 500 × tokens-per-doc — corpus-size-INDEPENDENT), so the
    driver cumulative fold is O(range), not O(corpus). Output one row
    (n_pos, n_neg, auc_e6); degenerate single-class corpora return
    auc_e6 = 500000 on both sides."""
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
    rows.sort(key=lambda r: r["s"])
    u2, nn_less, np_t, nn_t = 0, 0, 0, 0
    for r in rows:
        np_s, nn_s = int(r["np_"]), int(r["nn_"])
        u2 += np_s * (2 * nn_less + nn_s)
        nn_less += nn_s
        np_t += np_s
        nn_t += nn_s
    den = 2 * np_t * nn_t
    auc_e6 = (10 ** 6 * u2) // den if den else 500_000
    return pa.table({"n_pos": pa.array([np_t], pa.int64()),
                     "n_neg": pa.array([nn_t], pa.int64()),
                     "auc_e6": pa.array([auc_e6], pa.int64())})


AUC_QUALITY_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
sc AS (SELECT doc_id,
              CAST(sum((CAST('0x' || substr(md5(token), 1, 15) AS BIGINT)
                        % 1001) - 500) AS BIGINT) AS s
       FROM tok GROUP BY doc_id),
lab AS (SELECT sc.s,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents d JOIN sc USING (doc_id)),
g AS (SELECT s, CAST(sum(pos) AS HUGEINT) AS np_,
             CAST(count(*) - sum(pos) AS HUGEINT) AS nn_
      FROM lab GROUP BY s),
c AS (SELECT s, np_, nn_,
             CAST(coalesce(sum(nn_) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS HUGEINT) AS nnless
      FROM g),
t AS (SELECT CAST(coalesce(sum(np_ * (2 * nnless + nn_)), 0) AS HUGEINT)
               AS u2,
             CAST(coalesce(sum(np_), 0) AS HUGEINT) AS np_t,
             CAST(coalesce(sum(nn_), 0) AS HUGEINT) AS nn_t
      FROM c)
SELECT CAST(np_t AS BIGINT) AS n_pos, CAST(nn_t AS BIGINT) AS n_neg,
       CASE WHEN np_t * nn_t = 0 THEN 500000
            ELSE CAST((1000000 * u2) // (2 * np_t * nn_t) AS BIGINT)
       END AS auc_e6
FROM t
"""


def _zonemap_layout(sf_dir: str, n_files: int = 24):
    """Sorted lakehouse layout of events + a footer-only zone map:
    events sorted by ts and written as ~``n_files`` files (each file a
    contiguous ts range), then a file → (min_ts, max_ts) stats index
    built by reading parquet FOOTERS only — zero data IO, the
    Delta/Iceberg min-max manifest every file-skipping read uses. The
    index is O(files) driver state by construction."""
    import shutil

    import pyarrow.parquet as pq

    tag = f"{os.path.basename(os.path.normpath(sf_dir))}-{os.getpid()}"
    out = f"/tmp/rendler_ray_zonemap/events-{tag}"
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    n = ds.count()

    def conv(t: pa.Table) -> pa.Table:
        return pa.table({
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_type": t["event_type"],
            "value_c": _cents(t["value"])})

    ds.map_batches(conv, batch_format="pyarrow").sort("ts_us") \
        .write_parquet(out, max_rows_per_file=max(1, -(-n // n_files)))
    zmap: dict[str, tuple[int, int]] = {}
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        p = os.path.join(out, f)
        md = pq.read_metadata(p)
        mn = mx = None
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            for j in range(rg.num_columns):
                col = rg.column(j)
                if col.path_in_schema == "ts_us":
                    st = col.statistics
                    mn = st.min if mn is None else min(mn, st.min)
                    mx = st.max if mx is None else max(mx, st.max)
        zmap[p] = (int(mn), int(mx))
    return out, zmap


def zonemap_prune_events(sf_dir: str):
    """Zone-map file skipping (the min-max data-skipping index under
    every lakehouse time-range query): a ts-range aggregate answered
    by opening ONLY the files whose footer [min, max] intersects the
    range. The layout write is the one-time clustering cost; every
    subsequent range query prunes at the FILE level before any row
    leaves storage — at 100 TB a 10% time window reads ~10% of files
    instead of scanning the table. Range = the middle decile
    [45%, 55%] of the ts span (integer arithmetic mirrored in SQL);
    pruned-vs-full equality and the files_read < files_total invariant
    are pytest-asserted; result is oracle-checked against a plain
    filtered scan of the source table."""
    out, zmap = _zonemap_layout(sf_dir)
    tmin = min(lo for lo, _ in zmap.values())
    tmax = max(hi for _, hi in zmap.values())
    lo = tmin + (tmax - tmin) * 45 // 100
    hi = tmin + (tmax - tmin) * 55 // 100
    files = [p for p, (a, b) in sorted(zmap.items())
             if not (b < lo or a > hi)]

    def filt(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(pc.greater_equal(t["ts_us"], lo),
                                pc.less_equal(t["ts_us"], hi)))

    return (rd.read_parquet(files)
            .map_batches(filt, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Count(alias_name="n"),
                       Sum("value_c", alias_name="spend_c")))


ZONEMAP_PRUNE_SQL = """
WITH b AS (SELECT min(epoch_us(ts)) AS tmin, max(epoch_us(ts)) AS tmax
           FROM events),
r AS (SELECT tmin + (tmax - tmin) * 45 // 100 AS lo,
             tmin + (tmax - tmin) * 55 // 100 AS hi FROM b)
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS spend_c
FROM events, r
WHERE epoch_us(ts) BETWEEN lo AND hi
GROUP BY event_type
"""


def bucketed_join_revenue(sf_dir: str, n_buckets: int = 8):
    """Bucketed-table join (Hive/Iceberg ``CLUSTERED BY`` — the layout
    that amortizes ONE shuffle across every future join on the key):
    orders and customer are each written hash-bucketed on the join key
    (bucket = key mod n_buckets) into ``bucket=<b>/`` directories, and
    the join then runs as n_buckets INDEPENDENT bucket-local joins
    with NO exchange at query time — co-bucketing guarantees matching
    keys share a bucket number, so each bucket's task reads exactly
    two co-located slices. Here each per-bucket dim slice (customer /
    n_buckets — broadcast-sized by construction) probes the fact slice
    statelessly; the general form merge-joins co-SORTED buckets. The
    lazy union of the per-bucket joins feeds one bounded segment
    aggregate; output is oracle-checked against the plain shuffle
    join."""
    import shutil

    import pyarrow.parquet as pq

    tag = f"{os.path.basename(os.path.normpath(sf_dir))}-{os.getpid()}"
    root = f"/tmp/rendler_ray_bucketed/{tag}"
    shutil.rmtree(root, ignore_errors=True)

    def with_bucket(key: str, out: dict):
        def fn(t: pa.Table) -> pa.Table:
            k = t[key].to_numpy(zero_copy_only=False)
            cols = {c: t[c] for c in out} | {
                "bucket": pa.array(k % n_buckets, pa.int64())}
            return pa.table(cols)
        return fn

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda t: pa.table({"o_custkey": t["o_custkey"],
                            "price_c": _cents(t["o_totalprice"])}),
        batch_format="pyarrow")
    orders.map_batches(
        with_bucket("o_custkey", {"o_custkey": 0, "price_c": 0}),
        batch_format="pyarrow") \
        .write_parquet(f"{root}/orders", partition_cols=["bucket"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust.map_batches(
        with_bucket("c_custkey", {"c_custkey": 0, "c_mktsegment": 0}),
        batch_format="pyarrow") \
        .write_parquet(f"{root}/customer", partition_cols=["bucket"])

    parts = []
    for b in range(n_buckets):
        odir = f"{root}/orders/bucket={b}"
        cdir = f"{root}/customer/bucket={b}"
        if not os.path.isdir(odir):
            continue
        seg = {}
        if os.path.isdir(cdir):
            ct = pq.read_table(cdir)  # bounded: customer / n_buckets
            seg = dict(zip(ct["c_custkey"].to_pylist(),
                           ct["c_mktsegment"].to_pylist()))
        sref = ray.put(seg)

        def probe(t: pa.Table, _sref=sref) -> pa.Table:
            s = ray.get(_sref)
            keys = t["o_custkey"].to_pylist()
            segs = np.array([s.get(k) for k in keys], dtype=object)
            m = pa.array([x is not None for x in segs])
            return pa.table({
                "c_mktsegment": pa.array(segs, pa.string()),
                "price_c": t["price_c"]}).filter(m)

        parts.append(rd.read_parquet(odir, columns=["o_custkey", "price_c"])
                     .map_batches(probe, batch_format="pyarrow"))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"),
        Sum("price_c", alias_name="revenue_c"))


BUCKETED_JOIN_SQL = """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_c
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def pmi_bigrams_top(sf_dir: str, min_count: int = 5, topk: int = 100,
                    driver_max: int = 2_000_000):
    """PMI collocation extraction (Church & Hanks CL'90) — the
    top-``topk`` adjacent bigrams by pointwise mutual information
    pmi = ln(c_xy · N / (c_x · c_y)) with N = total tokens, among
    bigrams seen ≥ ``min_count`` times: the phrase-mining pass that
    separates true collocations from merely-frequent pairs (top counts
    are dominated by stopword pairs; top PMI by fixed phrases). The ln
    argument is ONE IEEE division of exact integer products, and both
    sides round-half-away the same libm double at e6, so the oracle is
    hash-exact (the token_entropy / bm25-idf precedent).

    Scale shape: per-batch bigram/unigram combines move one row per
    DISTINCT gram per batch, never instances. Below ``driver_max``
    partial rows both streams fold on the driver (Arrow C++ hash
    aggregate — the tfidf/trigram gate pattern); above it the
    distributed form aggregates on SipHash64 keys (strings ride as
    Min-payload exemplars, never as shuffle keys — the dup-span
    finding), joins unigram counts twice, and cuts top-k with a
    per-block prune before the tiny global sort. Two-form equality is
    pytest-asserted."""
    ds = _read(sf_dir, "documents", ["text"])

    def bigram_partial(t: pa.Table) -> pa.Table:
        toks = pd.Series(t["text"].to_numpy(zero_copy_only=False),
                         dtype=object).str.split(" ")
        lens = toks.str.len().to_numpy(np.int64)
        flat = np.concatenate([np.array(x, dtype=object) for x in toks])
        valid = np.ones(len(flat), dtype=bool)
        valid[np.cumsum(lens) - 1] = False
        idx = np.flatnonzero(valid)
        g = pd.DataFrame({"x": flat[idx], "y": flat[idx + 1]}) \
            .groupby(["x", "y"], sort=False).size().reset_index()
        return pa.table({
            "x": pa.array(g["x"].to_numpy(object), pa.string()),
            "y": pa.array(g["y"].to_numpy(object), pa.string()),
            "c": pa.array(g[0].to_numpy(np.int64), pa.int64())})

    def unigram_partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(t["text"].combine_chunks(), " "))
        vc = pd.Series(toks.to_numpy(zero_copy_only=False)) \
            .value_counts(sort=False)
        return pa.table({
            "token": pa.array(vc.index.to_numpy(object), pa.string()),
            "c": pa.array(vc.to_numpy(np.int64), pa.int64())})

    bg = ds.map_batches(bigram_partial, batch_format="pyarrow")
    ug = ds.map_batches(unigram_partial, batch_format="pyarrow")

    def finish(xs, ys, cxy, cx, cy, n_tok):
        num = (cxy * n_tok).astype(np.float64)
        den = (cx * cy).astype(np.float64)
        pmi = _round_half_away(np.log(num / den) * 1e6)
        df = pd.DataFrame({"x": xs, "y": ys,
                           "n": cxy, "pmi_e6": pmi})
        df = df.sort_values(["pmi_e6", "x", "y"],
                            ascending=[False, True, True]).head(topk)
        return pa.table({
            "x": pa.array(df["x"].to_numpy(object), pa.string()),
            "y": pa.array(df["y"].to_numpy(object), pa.string()),
            "n": pa.array(df["n"].to_numpy(np.int64), pa.int64()),
            "pmi_e6": pa.array(df["pmi_e6"].to_numpy(np.int64),
                               pa.int64())})

    # driver-fold gate: stream partials while the row total stays small
    tables, n, over = [], 0, False
    for b in bg.iter_batches(batch_size=None, batch_format="pyarrow"):
        tables.append(b)
        n += b.num_rows
        if n > driver_max:
            over = True
            break
    if not over:
        ut = []
        for b in ug.iter_batches(batch_size=None, batch_format="pyarrow"):
            ut.append(b)
            n += b.num_rows
            if n > driver_max:
                over = True
                break
        if not over:
            bt = pa.concat_tables(tables).group_by(["x", "y"]) \
                .aggregate([("c", "sum")]) \
                .rename_columns(["x", "y", "c"])
            uni = pa.concat_tables(ut).group_by("token") \
                .aggregate([("c", "sum")]).rename_columns(["token", "c"])
            n_tok = int(pc.sum(uni["c"]).as_py() or 0)
            bt = bt.filter(pc.greater_equal(bt["c"], min_count))
            cnt = dict(zip(uni["token"].to_pylist(),
                           uni["c"].to_numpy(zero_copy_only=False)))
            xs = np.asarray(bt["x"].to_pylist(), dtype=object)
            ys = np.asarray(bt["y"].to_pylist(), dtype=object)
            cxy = bt["c"].to_numpy(zero_copy_only=False)
            cx = np.array([cnt[x] for x in xs], np.int64)
            cy = np.array([cnt[y] for y in ys], np.int64)
            return finish(xs, ys, cxy, cx, cy, n_tok)

    # distributed fallback: SipHash64 keys, strings as Min exemplars
    import pandas.util as pdu

    def keyed(t: pa.Table) -> pa.Table:
        xs = t["x"].to_numpy(zero_copy_only=False)
        ys = t["y"].to_numpy(zero_copy_only=False)
        return pa.table({
            "hx": pa.array(pdu.hash_array(xs, categorize=False)
                           .view(np.int64), pa.int64()),
            "hy": pa.array(pdu.hash_array(ys, categorize=False)
                           .view(np.int64), pa.int64()),
            "x": t["x"], "y": t["y"], "c": t["c"]})

    def ukeyed(t: pa.Table) -> pa.Table:
        toks = t["token"].to_numpy(zero_copy_only=False)
        return pa.table({
            "h": pa.array(pdu.hash_array(toks, categorize=False)
                          .view(np.int64), pa.int64()),
            "c": t["c"]})

    bgk = (bg.map_batches(keyed, batch_format="pyarrow")
           .groupby(["hx", "hy"])
           .aggregate(Sum("c", alias_name="c"),
                      Min("x", alias_name="x"), Min("y", alias_name="y")))
    # materialize barriers between shuffle stages: ≥4 hash-shuffle
    # stages fused in one plan reserve aggregator CPUs up front and
    # deadlock small clusters (the forced-distributed ccnet finding)
    bgk = bgk.filter(expr=f"c >= {int(min_count)}").materialize()
    ugk = (ug.map_batches(ukeyed, batch_format="pyarrow")
           .groupby("h").aggregate(Sum("c", alias_name="cu"))
           .materialize())
    n_tok = int(ugk.aggregate(Sum("cu", alias_name="s"))["s"] or 0)
    j = bgk.join(ugk.rename_columns({"h": "hx", "cu": "cx"}),
                 join_type="inner", on=("hx",),
                 num_partitions=16).materialize()
    j = j.join(ugk.rename_columns({"h": "hy", "cu": "cy"}),
               join_type="inner", on=("hy",), num_partitions=16)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"x": pa.array([], pa.string()),
                             "y": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "pmi_e6": pa.array([], pa.int64())})
        num = (t["c"].to_numpy(zero_copy_only=False) * n_tok) \
            .astype(np.float64)
        den = (t["cx"].to_numpy(zero_copy_only=False)
               * t["cy"].to_numpy(zero_copy_only=False)).astype(np.float64)
        pmi = _round_half_away(np.log(num / den) * 1e6)
        out = pa.table({"x": t["x"], "y": t["y"], "c": t["c"],
                        "pmi_e6": pa.array(pmi, pa.int64())})
        df = out.to_pandas().sort_values(
            ["pmi_e6", "x", "y"], ascending=[False, True, True]).head(topk)
        return pa.table({
            "x": pa.array(df["x"].to_numpy(object), pa.string()),
            "y": pa.array(df["y"].to_numpy(object), pa.string()),
            "n": pa.array(df["c"].to_numpy(np.int64), pa.int64()),
            "pmi_e6": pa.array(df["pmi_e6"].to_numpy(np.int64),
                               pa.int64())})

    return (j.map_batches(score, batch_format="pyarrow")
            .sort(["pmi_e6", "x", "y"], descending=[True, False, False])
            .limit(topk))


PMI_BIGRAMS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
         generate_subscripts(string_split(text, ' '), 1) AS ord
  FROM documents),
uni AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
n AS (SELECT count(*) AS n_tok FROM toks),
bg AS (
  SELECT a.token AS x, b.token AS y, count(*) AS c
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
  GROUP BY a.token, b.token),
sc AS (
  SELECT bg.x, bg.y, bg.c AS n,
         CAST(round(ln(CAST(bg.c * n.n_tok AS DOUBLE)
                       / CAST(ux.c * uy.c AS DOUBLE)) * 1000000)
              AS BIGINT) AS pmi_e6
  FROM bg JOIN uni ux ON bg.x = ux.token
          JOIN uni uy ON bg.y = uy.token
          CROSS JOIN n
  WHERE bg.c >= 5)
SELECT x, y, n, pmi_e6 FROM sc
ORDER BY pmi_e6 DESC, x, y LIMIT 100
"""


def adamic_adar_linkpred(sf_dir: str):
    """Adamic–Adar link prediction over the crawl graph (Adamic & Adar
    2003; the common-neighbor score LinkedIn/friend-suggestion systems
    popularized): top-50 non-adjacent page pairs most likely to be
    semantically related, scored Σ 10⁶/ln(deg(w)) over shared
    neighbors w — a crawl curator's "related pages" / seed-expansion
    signal. Size-gated ``functions/graph.py::adamic_adar_auto``:
    driver pair fold under the gate, distributed
    groupby(w).map_groups pair explode (bounded deg_cap² per group) +
    per-pair integer sum + left-outer-join adjacency filter above it;
    per-DEGREE weight rounding makes the sum order-free. Deterministic;
    rows-only (no SQL graph), golden-pinned + brute-force pytest."""
    from rendler_ray.functions.graph import adamic_adar_auto
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=4))
    return adamic_adar_auto(res.edges)


def table_diff_docs(sf_dir: str):
    """Snapshot diff (the lakehouse table_changes / data-versioning
    primitive: what changed between two table versions, by key): a
    derived snapshot B of documents — doc_id % 17 == 0 rows dropped,
    doc_id % 13 == 0 rows' n_chars bumped by 7, doc_id % 19 == 0 rows
    re-appended under new ids — is diffed against A on doc_id, and
    each key classified added / removed / changed / unchanged. Output:
    per-status row count + key checksum (the audit a CDC consumer or
    sync job acts on).

    Scale shape: ONE full-outer hash join on the key with presence
    markers (the shuffle carries one row per key), a stateless
    classify pass, and a ≤4-group aggregate. Payload equality is
    compared inside the join task — no second pass, no driver
    state."""
    from rendler_ray.state.politeness import _nonempty_blocks

    a = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def mk_b(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        nch = t["n_chars"].to_numpy(zero_copy_only=False)
        langs = t["lang"]
        bumped = nch + 7 * (ids % 13 == 0)
        keep = ids % 17 != 0
        base = pa.table({
            "doc_id_b": pa.array(ids[keep], pa.int64()),
            "lang_b": langs.filter(pa.array(keep)),
            "n_chars_b": pa.array(bumped[keep], pa.int64())})
        new = ids % 19 == 0
        app = pa.table({
            "doc_id_b": pa.array(ids[new] + 1_000_000_000, pa.int64()),
            "lang_b": langs.filter(pa.array(new)),
            "n_chars_b": pa.array(nch[new], pa.int64())})
        return pa.concat_tables([base, app])

    b = a.map_batches(mk_b, batch_format="pyarrow")
    a2 = a.map_batches(
        lambda t: t.append_column(
            "_a", pa.array(np.ones(t.num_rows, np.int64))),
        batch_format="pyarrow")
    b2 = b.map_batches(
        lambda t: t.append_column(
            "_b", pa.array(np.ones(t.num_rows, np.int64))),
        batch_format="pyarrow")
    j = a2.join(b2, join_type="full_outer", num_partitions=8,
                on=("doc_id",), right_on=("doc_id_b",))
    j = _nonempty_blocks(j.materialize())

    def classify(t: pa.Table) -> pa.Table:
        ina = pc.is_valid(t["_a"]).to_numpy(zero_copy_only=False)
        inb = pc.is_valid(t["_b"]).to_numpy(zero_copy_only=False)
        same_lang = pc.fill_null(
            pc.equal(t["lang"], t["lang_b"]), False) \
            .to_numpy(zero_copy_only=False)
        same_n = pc.fill_null(
            pc.equal(t["n_chars"], t["n_chars_b"]), False) \
            .to_numpy(zero_copy_only=False)
        status = np.where(
            ~ina, "added", np.where(
                ~inb, "removed", np.where(
                    same_lang & same_n, "unchanged", "changed")))
        return pa.table({
            "status": pa.array(status.astype(object), pa.string()),
            "k": pc.cast(t["doc_id"], pa.int64())})

    return (j.map_batches(classify, batch_format="pyarrow")
            .groupby("status").aggregate(
                Count(alias_name="n"), Sum("k", alias_name="key_sum")))


TABLE_DIFF_SQL = """
WITH b AS (
  SELECT doc_id, lang,
         n_chars + CASE WHEN doc_id % 13 = 0 THEN 7 ELSE 0 END AS n_chars
  FROM documents WHERE doc_id % 17 <> 0
  UNION ALL
  SELECT doc_id + 1000000000 AS doc_id, lang, n_chars
  FROM documents WHERE doc_id % 19 = 0),
j AS (
  SELECT coalesce(a.doc_id, b.doc_id) AS k,
         CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.lang = b.lang AND a.n_chars = b.n_chars
                THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
SELECT status, count(*) AS n, CAST(sum(k) AS BIGINT) AS key_sum
FROM j GROUP BY status
"""


def fk_integrity_audit(sf_dir: str):
    """Referential-integrity audit (the constraint-validation pass a
    warehouse runs after every load): per FK relation, how many child
    rows point at a missing parent. Parents are deliberately
    "corrupted" snapshots (orders missing o_orderkey % 1000 < 5,
    customer missing c_custkey % 100 < 3) so the audit exercises real
    orphans. Output one row per relation (n_child, n_orphan).

    Scale shape: each child side pre-aggregates to one (key, count)
    row per distinct key per batch, then per key — the join probes
    carry key cardinality, not row cardinality; the parent side ships
    only its key column through the hash join; orphan detection is a
    LEFT OUTER join null-marker filter. Zero driver state beyond the
    2-row result."""
    from rendler_ray.state.politeness import _nonempty_blocks

    def audit(child, key, parent, pkey, relation):
        def child_counts(t: pa.Table) -> pa.Table:
            vc = pd.Series(t[key].to_numpy(zero_copy_only=False)) \
                .value_counts(sort=False)
            return pa.table({
                key: pa.array(vc.index.to_numpy(np.int64), pa.int64()),
                "cnt": pa.array(vc.to_numpy(np.int64), pa.int64())})

        def parent_keys(t: pa.Table) -> pa.Table:
            u = pc.unique(t[pkey].combine_chunks())
            return pa.table({
                pkey: u,
                "_p": pa.array(np.ones(len(u), np.int64))})

        ck = (child.map_batches(child_counts, batch_format="pyarrow")
              .groupby(key).aggregate(Sum("cnt", alias_name="cnt")))
        pk = parent.map_batches(parent_keys, batch_format="pyarrow")
        j = ck.join(pk, join_type="left_outer", num_partitions=8,
                    on=(key,), right_on=(pkey,))
        j = _nonempty_blocks(j.materialize())

        def fold(t: pa.Table) -> pa.Table:
            cnt = t["cnt"].to_numpy(zero_copy_only=False)
            orphan = pc.is_null(t["_p"]).to_numpy(zero_copy_only=False)
            return pa.table({
                "relation": pa.array([relation], pa.string()),
                "n_child": pa.array([int(cnt.sum())], pa.int64()),
                "n_orphan": pa.array([int(cnt[orphan].sum())],
                                     pa.int64())})

        return (j.map_batches(fold, batch_format="pyarrow")
                .groupby("relation").aggregate(
                    Sum("n_child", alias_name="n_child"),
                    Sum("n_orphan", alias_name="n_orphan")))

    li = _read(sf_dir, "lineitem", ["l_orderkey"])
    orders_p = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        lambda t: t.filter(pa.array(
            t["o_orderkey"].to_numpy(zero_copy_only=False) % 1000 >= 5)),
        batch_format="pyarrow")
    r1 = audit(li, "l_orderkey", orders_p, "o_orderkey",
               "lineitem->orders")

    od = _read(sf_dir, "orders", ["o_custkey"])
    cust_p = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: t.filter(pa.array(
            t["c_custkey"].to_numpy(zero_copy_only=False) % 100 >= 3)),
        batch_format="pyarrow")
    r2 = audit(od, "o_custkey", cust_p, "c_custkey",
               "orders->customer")
    return r1.union(r2)


FK_AUDIT_SQL = """
SELECT 'lineitem->orders' AS relation,
       count(*) AS n_child,
       CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_orphan
FROM lineitem l LEFT JOIN
     (SELECT o_orderkey FROM orders WHERE o_orderkey % 1000 >= 5) o
     ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'orders->customer' AS relation,
       count(*) AS n_child,
       CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_orphan
FROM orders o LEFT JOIN
     (SELECT c_custkey FROM customer WHERE c_custkey % 100 >= 3) c
     ON o.o_custkey = c.c_custkey
"""


def clustering_coefficient_nodes(sf_dir: str):
    """Per-node LOCAL CLUSTERING COEFFICIENT over triangle_counts'
    derived graph — the standard web-graph cohesion metric:
    cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) for deg(v) ≥ 2, e6
    fixed-point floor so the oracle hash-compares integers.

    Scale shape: the same two-hash-join triangle enumeration as
    triangle_counts, but every triangle keeps all three corners and
    explodes 3× into a per-vertex count; degrees are one 2× explode +
    groupby; the final assembly is one LEFT join of two per-VERTEX
    (bounded ≪ edges) tables. materialize barriers cap each execution
    at ≤2 shuffle stages (the staged-plan deadlock rule)."""
    from rendler_ray.state.politeness import _nonempty_blocks

    edges = _orders_graph_edges(sf_dir).materialize()

    right = edges.map_batches(
        lambda t: t.rename_columns(["a", "c"]), batch_format="pyarrow")
    wedges = (edges.join(right, join_type="inner", num_partitions=8,
                         on=("a",))
              .map_batches(lambda t: t.filter(pc.less(t["b"], t["c"])),
                           batch_format="pyarrow"))
    wedges = _nonempty_blocks(wedges.materialize())

    def corners(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.array(np.concatenate([
            t["a"].to_numpy(), t["b"].to_numpy(), t["c"].to_numpy()]),
            pa.int64())})

    tric = None
    if wedges is not None:
        closing = edges.map_batches(
            lambda t: t.rename_columns(["b", "c"]), batch_format="pyarrow")
        tri = wedges.join(closing, join_type="inner", num_partitions=8,
                          on=("b", "c"))
        tri = _nonempty_blocks(tri.materialize())
        if tri is not None:
            tric = (tri.map_batches(corners, batch_format="pyarrow")
                    .groupby("node").aggregate(Count(alias_name="n_tri")))
            tric = _nonempty_blocks(tric.materialize())

    def both_ends(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.array(np.concatenate([
            t["a"].to_numpy(), t["b"].to_numpy()]), pa.int64())})

    deg = (edges.map_batches(both_ends, batch_format="pyarrow")
           .groupby("node").aggregate(Count(alias_name="deg"))
           .map_batches(lambda t: t.filter(
               pc.greater_equal(t["deg"], 2)), batch_format="pyarrow"))
    deg = _nonempty_blocks(deg.materialize())
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "deg": pa.array([], pa.int64()),
                      "n_tri": pa.array([], pa.int64()),
                      "cc_e6": pa.array([], pa.int64())})
    if deg is None:
        return empty

    def finish(t: pa.Table) -> pa.Table:
        d = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        tr = (t["n_tri"].to_numpy(zero_copy_only=False).astype(np.int64)
              if "n_tri" in t.column_names
              else np.zeros(len(d), np.int64))
        cc = (2_000_000 * tr) // (d * (d - 1))
        return pa.table({
            "node": pc.cast(t["node"], pa.int64()),
            "deg": pa.array(d, pa.int64()),
            "n_tri": pa.array(tr, pa.int64()),
            "cc_e6": pa.array(cc, pa.int64())})

    if tric is None:
        return deg.map_batches(finish, batch_format="pyarrow")
    j = deg.join(tric, join_type="left_outer", num_partitions=8,
                 on=("node",))
    j = _nonempty_blocks(j.materialize())

    def fill_finish(t: pa.Table) -> pa.Table:
        t = t.set_column(t.schema.get_field_index("n_tri"), "n_tri",
                         pc.cast(pc.fill_null(t["n_tri"], 0), pa.int64()))
        return finish(t)

    return j.map_batches(fill_finish, batch_format="pyarrow")


CLUSTER_COEFF_SQL = """
WITH e AS (
  SELECT DISTINCT
    LEAST(o_custkey, o_orderkey % 1500 + 1)    AS a,
    GREATEST(o_custkey, o_orderkey % 1500 + 1) AS b
  FROM orders
  WHERE o_custkey <> o_orderkey % 1500 + 1),
tri AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM e e1
  JOIN e e2 ON e2.a = e1.a AND e1.b < e2.b
  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
tc AS (
  SELECT node, count(*) AS n_tri FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b AS node FROM tri
    UNION ALL SELECT c AS node FROM tri) corners
  GROUP BY node),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e) ends
  GROUP BY node)
SELECT CAST(d.node AS BIGINT) AS node,
       CAST(d.deg AS BIGINT) AS deg,
       CAST(coalesce(tc.n_tri, 0) AS BIGINT) AS n_tri,
       (2000000 * CAST(coalesce(tc.n_tri, 0) AS BIGINT))
         // (CAST(d.deg AS BIGINT) * (d.deg - 1)) AS cc_e6
FROM deg d LEFT JOIN tc ON tc.node = d.node
WHERE d.deg >= 2
"""


def degree_assortativity(sf_dir: str, driver_max: int = 1_000_000):
    """Newman DEGREE ASSORTATIVITY r of the derived graph — do hubs
    link to hubs (r>0) or to leaves (r<0)? For the both-directions
    edge list the x/y marginals coincide, so Pearson needs NO square
    root: r = (m·Σxy − Σx²ₘ) / (m·Σx² − Σx²ₘ) with Σx²ₘ = (Σx)² — a
    ratio of two EXACT integers. Moments are int64-exact per batch;
    the final ×1e6 ratio exceeds 2^63, so the 1-row finisher computes
    it in Python ints and DuckDB mirrors in HUGEINT with toward-zero
    ``//``.

    Scale shape: degrees via one explode + count; attaching deg to
    both endpoints is a broadcast lookup below a NODE-count gate
    (vertex table ≪ edge table; ray.put once, searchsorted per batch)
    with a two-hash-join fallback above it; moments fold as per-batch
    1-row partials into a single-group aggregate."""
    from rendler_ray.state.politeness import _nonempty_blocks

    edges = _orders_graph_edges(sf_dir).materialize()

    def both_ends(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.array(np.concatenate([
            t["a"].to_numpy(), t["b"].to_numpy()]), pa.int64())})

    deg = (edges.map_batches(both_ends, batch_format="pyarrow")
           .groupby("node").aggregate(Count(alias_name="deg"))
           .materialize())

    if deg.count() <= driver_max:
        dt = pa.concat_tables(
            deg.iter_batches(batch_size=None, batch_format="pyarrow"))
        order = pc.sort_indices(dt["node"].combine_chunks())
        keys = dt["node"].to_numpy(zero_copy_only=False)[order]
        vals = dt["deg"].to_numpy(zero_copy_only=False)[order] \
            .astype(np.int64)
        ref = ray.put((keys, vals))

        def partial(t: pa.Table) -> pa.Table:
            k, v = ray.get(ref)
            da = v[np.searchsorted(k, t["a"].to_numpy())]
            db = v[np.searchsorted(k, t["b"].to_numpy())]
            return _assort_partial_row(da, db)

        parts = edges.map_batches(partial, batch_format="pyarrow")
    else:
        dl = deg.map_batches(
            lambda t: t.rename_columns(["a", "da"]),
            batch_format="pyarrow")
        j1 = _nonempty_blocks(
            edges.join(dl, join_type="inner", num_partitions=8,
                       on=("a",)).materialize())
        dr = deg.map_batches(
            lambda t: t.rename_columns(["b", "db"]),
            batch_format="pyarrow")
        j2 = _nonempty_blocks(
            j1.join(dr, join_type="inner", num_partitions=8,
                    on=("b",)).materialize())

        def partial2(t: pa.Table) -> pa.Table:
            return _assort_partial_row(
                t["da"].to_numpy(zero_copy_only=False).astype(np.int64),
                t["db"].to_numpy(zero_copy_only=False).astype(np.int64))

        parts = j2.map_batches(partial2, batch_format="pyarrow")

    agg = parts.groupby("g").aggregate(
        Sum("m", alias_name="m"), Sum("sx", alias_name="sx"),
        Sum("sxy", alias_name="sxy"), Sum("sx2", alias_name="sx2"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        m, sx = int(df["m"][0]), int(df["sx"][0])
        sxy, sx2 = int(df["sxy"][0]), int(df["sx2"][0])
        num, den = m * sxy - sx * sx, m * sx2 - sx * sx
        r = 0 if den == 0 else \
            (1 if num >= 0 else -1) * (abs(1_000_000 * num) // den)
        return pd.DataFrame({"m": [m], "sx": [sx], "sxy": [sxy],
                             "sx2": [sx2], "r_e6": [r]})

    return agg.map_batches(finish, batch_format="pandas") \
        .select_columns(["m", "sx", "sxy", "sx2", "r_e6"])


def _assort_partial_row(da: np.ndarray, db: np.ndarray) -> pa.Table:
    """1-row int64 moment partial for the both-directions edge list.
    da·db < 2^62/|batch| holds for any real degree distribution (deg <
    2^21 on both sides simultaneously) — asserted, not assumed."""
    assert not len(da) or (int(da.max()) < (1 << 21)
                           and int(db.max()) < (1 << 21))
    return pa.table({
        "g": pa.array([1], pa.int64()),
        "m": pa.array([2 * len(da)], pa.int64()),
        "sx": pa.array([int((da + db).sum())], pa.int64()),
        "sxy": pa.array([int(2 * (da * db).sum())], pa.int64()),
        "sx2": pa.array([int((da * da + db * db).sum())], pa.int64())})


DEGREE_ASSORT_SQL = """
WITH e AS (
  SELECT DISTINCT
    LEAST(o_custkey, o_orderkey % 1500 + 1)    AS a,
    GREATEST(o_custkey, o_orderkey % 1500 + 1) AS b
  FROM orders
  WHERE o_custkey <> o_orderkey % 1500 + 1),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e) ends
  GROUP BY node),
de AS (
  SELECT d1.deg AS da, d2.deg AS db
  FROM e JOIN deg d1 ON d1.node = e.a JOIN deg d2 ON d2.node = e.b),
s AS (
  SELECT CAST(2 * count(*) AS HUGEINT) AS m,
         CAST(sum(da + db) AS HUGEINT) AS sx,
         CAST(sum(2 * da * db) AS HUGEINT) AS sxy,
         CAST(sum(da * da + db * db) AS HUGEINT) AS sx2
  FROM de)
SELECT CAST(m AS BIGINT) AS m, CAST(sx AS BIGINT) AS sx,
       CAST(sxy AS BIGINT) AS sxy, CAST(sx2 AS BIGINT) AS sx2,
       CAST(CASE WHEN m * sx2 - sx * sx = 0 THEN 0
                 ELSE (1000000 * (m * sxy - sx * sx))
                      // (m * sx2 - sx * sx) END AS BIGINT) AS r_e6
FROM s
"""


def cms_user_counts(sf_dir: str):
    """COUNT-MIN SKETCH point queries (Cormode–Muthukrishnan '05) —
    the bounded-memory frequency sketch that answers "how often did
    key x occur" with one-sided error ≤ εN: depth 4 × width 256
    int64 counters, queried for the fixed user set 0..49. Unlike the
    HLL/quantile sketches this one is DETERMINISTIC given its hash
    family, so the DuckDB oracle reproduces the sketch cell-exactly —
    the hash is the repo's int64-safe multiplicative-xorshift (every
    intermediate < 2^63, mirrored verbatim in SQL).

    Scale shape: each batch folds to ≤ depth×width nonzero (d, bucket,
    c) partial rows (np.bincount), ONE bounded groupby merges them —
    sketch merge is addition, the property that makes CMS the
    distributed-counting workhorse; the 1024-cell sketch then answers
    the 50 point queries on the driver."""
    ds = _read(sf_dir, "events", ["user_id"])
    depth, width = 4, 256

    def bucket_of(u: np.ndarray, d: int) -> np.ndarray:
        # (u + 131071·d)·2654435761 < 2^63 needs u < 2^31 — numpy wraps
        # silently where DuckDB BIGINT errors, so assert the bound
        assert not len(u) or int(u.max()) < (1 << 31)
        h1 = ((u + 131071 * d) * 2654435761) % 2147483648
        return np.bitwise_xor(h1, h1 // 4096) % width

    def partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ds_, bs, cs = [], [], []
        for d in range(1, depth + 1):
            cnt = np.bincount(bucket_of(u, d), minlength=width)
            nz = np.nonzero(cnt)[0]
            ds_.append(np.full(len(nz), d, np.int64))
            bs.append(nz.astype(np.int64))
            cs.append(cnt[nz].astype(np.int64))
        return pa.table({"d": np.concatenate(ds_),
                         "bucket": np.concatenate(bs),
                         "c": np.concatenate(cs)})

    cells = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["d", "bucket"]).aggregate(Sum("c", alias_name="c"))
             .materialize())
    # the folded sketch is ≤ depth·width rows by construction
    t = pa.concat_tables(
        cells.iter_batches(batch_size=None, batch_format="pyarrow"))
    cms = np.zeros((depth + 1, width), np.int64)
    cms[t["d"].to_numpy(), t["bucket"].to_numpy()] = t["c"].to_numpy()
    q = np.arange(50, dtype=np.int64)
    est = np.min(np.stack([cms[d, bucket_of(q, d)]
                           for d in range(1, depth + 1)]), axis=0)
    return pa.table({"user_id": pa.array(q, pa.int64()),
                     "est": pa.array(est, pa.int64())})


CMS_SQL = """
WITH ds AS (SELECT unnest(generate_series(1, 4)) AS d),
uc AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
cell AS (
  SELECT d, xor(h1, h1 // 4096) % 256 AS bucket, c FROM (
    SELECT d, ((user_id + 131071 * d) * 2654435761) % 2147483648 AS h1,
           c
    FROM uc CROSS JOIN ds) h),
cms AS (SELECT d, bucket, sum(c) AS cnt FROM cell GROUP BY d, bucket),
q AS (SELECT unnest(generate_series(0, 49)) AS user_id),
qb AS (
  SELECT user_id, d, xor(h1, h1 // 4096) % 256 AS bucket FROM (
    SELECT user_id, d,
           ((user_id + 131071 * d) * 2654435761) % 2147483648 AS h1
    FROM q CROSS JOIN ds) h)
SELECT qb.user_id AS user_id,
       CAST(min(coalesce(cms.cnt, 0)) AS BIGINT) AS est
FROM qb LEFT JOIN cms ON cms.d = qb.d AND cms.bucket = qb.bucket
GROUP BY qb.user_id
"""


def calibration_curve_docs(sf_dir: str):
    """Classifier CALIBRATION CURVE (reliability diagram) — the eval
    that tells you whether the quality classifier's scores MEAN
    anything: rank docs by clf score, cut into 10 equi-depth deciles,
    and report each decile's positive-label (lang='en') rate. A
    well-calibrated ranker shows frac_pos rising monotonically with
    the decile; completes the eval family next to AUC (discrimination)
    and the confusion matrix (hard decisions).

    Scale shape: ONE shuffle-free vectorized scoring pass (same
    hashed-BoW stub as classifier_score_docs, so the oracle is exact),
    one global sort + metadata-only zip-with-index (``with_row_seq``),
    decile = (rank−1)·10 // n as a stateless map, per-batch partials
    into a ≤10-group aggregate."""
    from rendler_ray.util import with_row_seq

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
        return pa.table({"doc_id": t["doc_id"],
                         "clf_score": pa.array(s, pa.int64()),
                         "pos": pa.array(pos.astype(np.int64), pa.int64())})

    scored = ds.map_batches(score, batch_format="pyarrow").materialize()
    n = scored.count()
    ranked = with_row_seq(scored, ["clf_score", "doc_id"], start=1,
                          column="rank")

    def partial(t: pa.Table) -> pa.Table:
        dec = (t["rank"].to_numpy(zero_copy_only=False) - 1) * 10 // n
        df = pd.DataFrame({
            "decile": dec.astype(np.int64),
            "n": 1,
            "n_pos": t["pos"].to_numpy(zero_copy_only=False),
            "sum_score": t["clf_score"].to_numpy(zero_copy_only=False)})
        g = df.groupby("decile", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ranked.map_batches(partial, batch_format="pyarrow")
           .groupby("decile").aggregate(
               Sum("n", alias_name="n"),
               Sum("n_pos", alias_name="n_pos"),
               Sum("sum_score", alias_name="sum_score")))

    def finish(t: pa.Table) -> pa.Table:
        nb = t["n"].to_numpy(zero_copy_only=False)
        np_ = t["n_pos"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "frac_pos_e6", pa.array(1_000_000 * np_ // nb, pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow")


CALIBRATION_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
s AS (SELECT doc_id,
             CAST(sum((CAST('0x' || substr(md5(token), 1, 15) AS BIGINT)
                       % 1001) - 500) AS BIGINT) AS clf_score
      FROM tok GROUP BY doc_id),
lab AS (SELECT s.doc_id, s.clf_score,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM s JOIN documents d ON d.doc_id = s.doc_id),
r AS (SELECT clf_score, pos,
             (row_number() OVER (ORDER BY clf_score, doc_id) - 1) * 10
               // (SELECT count(*) FROM lab) AS decile
      FROM lab)
SELECT decile, count(*) AS n, CAST(sum(pos) AS BIGINT) AS n_pos,
       CAST(sum(clf_score) AS BIGINT) AS sum_score,
       (1000000 * CAST(sum(pos) AS BIGINT)) // count(*) AS frac_pos_e6
FROM r GROUP BY decile
"""
