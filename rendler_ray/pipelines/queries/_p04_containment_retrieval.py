

def gram_containment_pairs(sf_dir: str, df_cap: int = 20,
                           driver_max: int = 5_000_000):
    """Quote / excerpt detection — asymmetric near-dup by n-gram
    CONTAINMENT (|G(a) ∩ G(b)| / min(|G(a)|, |G(b)|) ≥ 0.5, word
    5-grams, short docs contribute their whole text): finds a doc
    mostly embedded in another even when Jaccard is low because the
    host doc is much longer. Candidate generation is an INVERTED-INDEX
    similarity join — distinct from the minhash-LSH family: a pair is
    a candidate iff it shares a RARE gram (2 ≤ df ≤ ``df_cap``), the
    standard stop-gram df-cap that keeps hot boilerplate grams from
    exploding the index (both sides of the oracle apply the identical
    rule, so the op is SQL-exact).

    Scale shape: grams leave the explode task only as 128-bit hashes;
    df comes from one int-keyed groupby; candidate rows (multi-
    occupancy rare grams only — output-bounded) fold on the driver
    below ``driver_max`` with a fully vectorized run-length pair
    emit, else distribute via groupby(gram).map_groups (each group
    ≤ df_cap rows). Verification is exact: candidate pairs hash-join
    their two texts and re-shingle (memoized per batch), so hash
    collisions cannot create a false positive — the integer filter
    2·inter ≥ min(na, nb) and the single IEEE division make the
    output hash-exact vs DuckDB. (The broadcast fast path folds the
    two hash halves into one 64-bit is_in key; a fold collision can
    only ADD a candidate whose containment is then computed from real
    text — expected extras ≈ probes·|rare|/2^64, ~0.05 even at 10^12
    grams.)"""
    import pandas.util as pdu

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def gram_rows(t: pa.Table) -> pa.Table:
        grams, gpar, _ = F_text.kgram_rows(t["text"].combine_chunks(), 5)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[gpar]
        garr = np.asarray(grams, dtype=object)
        g1 = pdu.hash_array(garr, categorize=False).view(np.int64)
        g2 = pdu.hash_array(garr, hash_key="rendlercontain2!",
                            categorize=False).view(np.int64)
        u = (pd.DataFrame({"g1": g1, "g2": g2, "doc_id": ids})
             .drop_duplicates())  # DISTINCT per doc (set semantics)
        return pa.table({c: pa.array(u[c].to_numpy(np.int64), pa.int64())
                         for c in ("g1", "g2", "doc_id")})

    g = _checkpoint(ds.map_batches(gram_rows, batch_format="pyarrow"),
                    "contain_g")  # consumed by df AND the candidate pass
    dfc = g.groupby(["g1", "g2"]).aggregate(Count(alias_name="n"))
    rare = dfc.map_batches(
        lambda t: t.filter(pc.and_(pc.greater_equal(t["n"], 2),
                                   pc.less_equal(t["n"], df_cap)))
        .select(["g1", "g2"]),
        batch_format="pyarrow").materialize()  # output-bounded key set

    # candidate rows: gram rows in multi-occupancy rare grams. The
    # rare-key side broadcasts while small (one is_in pass, no second
    # shuffle — the _hot_bucket_candidates switch).
    if rare.count() <= _HOT_BCAST_MAX:
        rt = pa.concat_tables(
            rare.iter_batches(batch_size=None, batch_format="pyarrow"))
        # fold the two hash halves into one 128-bit-unique key for a
        # single-column is_in (is_in has no multi-column form)
        kref = ray.put(pc.bit_wise_xor(
            pc.multiply(rt["g1"], pa.scalar(0x9E3779B1, pa.int64())),
            rt["g2"]).combine_chunks())

        def keep(t: pa.Table) -> pa.Table:
            k = pc.bit_wise_xor(
                pc.multiply(t["g1"], pa.scalar(0x9E3779B1, pa.int64())),
                t["g2"])
            return t.filter(pc.is_in(k, value_set=ray.get(kref)))

        cand = g.map_batches(keep, batch_format="pyarrow")
    else:
        cand = g.join(rare, join_type="inner", num_partitions=8,
                      on=("g1", "g2"))
    cand = cand.materialize()  # output-bounded (rare multi-occupancy)

    if cand.count() <= driver_max:
        # driver fold: vectorized run-length pair emit over the sorted
        # candidate rows (each gram's run is <= df_cap docs)
        ct = pa.concat_tables(
            cand.iter_batches(batch_size=None, batch_format="pyarrow"))
        if ct.num_rows == 0:
            pairs_tbl = pa.table({"a": pa.array([], pa.int64()),
                                  "b": pa.array([], pa.int64())})
        else:
            ct = ct.sort_by([("g1", "ascending"), ("g2", "ascending"),
                             ("doc_id", "ascending")])
            gg1 = ct["g1"].to_numpy(zero_copy_only=False)
            gg2 = ct["g2"].to_numpy(zero_copy_only=False)
            did = ct["doc_id"].to_numpy(zero_copy_only=False)
            new = np.flatnonzero(
                np.diff(gg1, prepend=gg1[0] - 1).astype(bool)
                | np.diff(gg2, prepend=gg2[0] - 1).astype(bool))
            lens = np.diff(np.append(new, len(did)))
            # all (i < j) index pairs within each run, vectorized
            ai, bi = [], []
            for ln in np.unique(lens):
                if ln < 2:
                    continue
                starts = new[lens == ln]
                ii, jj = np.triu_indices(int(ln), k=1)
                ai.append((starts[:, None] + ii[None, :]).ravel())
                bi.append((starts[:, None] + jj[None, :]).ravel())
            if ai:
                ai = np.concatenate(ai)
                bi = np.concatenate(bi)
                a = np.minimum(did[ai], did[bi])
                b = np.maximum(did[ai], did[bi])
                uniq = pd.DataFrame({"a": a, "b": b}).drop_duplicates()
                pairs_tbl = pa.table({
                    "a": pa.array(uniq["a"].to_numpy(np.int64), pa.int64()),
                    "b": pa.array(uniq["b"].to_numpy(np.int64), pa.int64())})
            else:
                pairs_tbl = pa.table({"a": pa.array([], pa.int64()),
                                      "b": pa.array([], pa.int64())})
        # texts for involved docs only (broadcast id set, one filter
        # pass) — no join: Ray's hash join misbehaves when distinct
        # keys < num_partitions (ROUND3_NOTES sparse-key rule), and the
        # involved-doc set is output-bounded anyway
        need = np.unique(np.concatenate([
            pairs_tbl["a"].to_numpy(zero_copy_only=False),
            pairs_tbl["b"].to_numpy(zero_copy_only=False)])) \
            if pairs_tbl.num_rows else np.empty(0, np.int64)
        nref = ray.put(pa.array(need, pa.int64()))
        txt = pa.concat_tables(ds.map_batches(
            lambda t: t.filter(pc.is_in(t["doc_id"],
                                        value_set=ray.get(nref))),
            batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"))
        texts = dict(zip(txt["doc_id"].to_numpy(zero_copy_only=False),
                         txt["text"].to_numpy(zero_copy_only=False)))
        return _containment_verify_table(
            pairs_tbl["a"].to_numpy(zero_copy_only=False),
            pairs_tbl["b"].to_numpy(zero_copy_only=False),
            [texts[i] for i in
             pairs_tbl["a"].to_numpy(zero_copy_only=False)],
            [texts[i] for i in
             pairs_tbl["b"].to_numpy(zero_copy_only=False)])

    def emit_pairs(grp: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(grp["doc_id"].to_numpy(np.int64))
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]})

    pairs = (cand.groupby(["g1", "g2"])
             .map_groups(emit_pairs, batch_format="pandas")
             .groupby(["a", "b"]).aggregate(Count(alias_name="_n"))
             .select_columns(["a", "b"]))

    # exact verify from text: join both sides' texts onto the pairs
    pa_txt = pairs.join(
        ds.map_batches(lambda t: t.rename_columns(["a", "text_a"]),
                       batch_format="pyarrow"),
        join_type="inner", num_partitions=8, on=("a",))
    pb_txt = pa_txt.join(
        ds.map_batches(lambda t: t.rename_columns(["b", "text_b"]),
                       batch_format="pyarrow"),
        join_type="inner", num_partitions=8, on=("b",))

    def verify(t: pa.Table) -> pa.Table:
        return _containment_verify_table(
            t["a"].to_numpy(zero_copy_only=False),
            t["b"].to_numpy(zero_copy_only=False),
            t["text_a"].to_numpy(zero_copy_only=False),
            t["text_b"].to_numpy(zero_copy_only=False))

    return pb_txt.map_batches(verify, batch_format="pyarrow")


def _containment_verify_table(aa, bb, ta, tb) -> pa.Table:
    """Exact containment over (a, b, text_a, text_b) rows: re-shingle
    (memoized per call), keep pairs with 2·inter ≥ min(na, nb), fix the
    single IEEE division to e6 (both query forms share this finisher,
    so they are equal by construction)."""
    memo: dict[str, frozenset] = {}

    def gset(s: str) -> frozenset:
        v = memo.get(s)
        if v is None:
            tk = s.split(" ")
            v = (frozenset(" ".join(tk[i:i + 5])
                           for i in range(len(tk) - 4))
                 if len(tk) >= 5 else frozenset((s,)))
            memo[s] = v
        return v

    rows = []
    for i in range(len(aa)):
        ga, gb = gset(ta[i]), gset(tb[i])
        inter = len(ga & gb)
        m = min(len(ga), len(gb))
        if 2 * inter >= m:
            rows.append((int(aa[i]), int(bb[i]), inter,
                         len(ga), len(gb), inter / m))
    if not rows:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "inter": pa.array([], pa.int64()),
                         "na": pa.array([], pa.int64()),
                         "nb": pa.array([], pa.int64()),
                         "containment_e6": pa.array([], pa.int64())})
    cols = list(zip(*rows))
    e6 = pc.cast(pc.round(pc.multiply(pa.array(cols[5], pa.float64()), 1e6),
                          options=pc.RoundOptions(
                              ndigits=0,
                              round_mode="half_towards_infinity")),
                 pa.int64())
    return pa.table({
        "a": pa.array(cols[0], pa.int64()),
        "b": pa.array(cols[1], pa.int64()),
        "inter": pa.array(cols[2], pa.int64()),
        "na": pa.array(cols[3], pa.int64()),
        "nb": pa.array(cols[4], pa.int64()),
        "containment_e6": e6})


def _grouped_value_bisect(scored, group_col: str, val_col: str,
                          state: dict, n_hist: int = 1024) -> dict:
    """Grouped EXACT rank selection (k-th smallest per group) WITHOUT
    per-group sorts and WITHOUT pulling any data rows: iterative VALUE
    bisection on count histograms. Each level is ONE streaming pass
    that histograms every still-unresolved (group, rank) target's
    current value range into ≤ ``n_hist`` sub-buckets of row counts
    (per-batch combined; ≤ targets·n_hist rows to the driver); the
    per-target ascending cumulative walk narrows each range to the
    sub-bucket containing its rank, until every range collapses to the
    exact value — levels ≈ log_{n_hist}(value range), driver state
    O(targets), nothing ever pulled.

    ``state``: {(group, which): [rlo, rhi, rank]} — inclusive int value
    range + remaining 1-based ascending rank WITHIN the range. Mutated
    in place until every range collapses; returns
    {(group, which): exact_value}. ``scored`` must carry int64
    ``group_col`` (string) and ``val_col`` columns."""

    def _sub(rlo: int, span: int, nb: int, b: int) -> tuple[int, int]:
        s0 = rlo + -(-(b * span) // nb)
        s1 = rlo + -(-((b + 1) * span) // nb) - 1
        return s0, s1

    while True:
        pend = {k: v for k, v in state.items() if v[0] < v[1]}
        if not pend:
            break
        # {group: [(which, rlo, rhi, nb)]} for the streaming pass
        bysrc: dict[str, list] = {}
        for (src, w), (rlo, rhi, _) in pend.items():
            nb = min(n_hist, rhi - rlo + 1)
            bysrc.setdefault(src, []).append((w, rlo, rhi, nb))
        tref = ray.put(bysrc)

        def level(t: pa.Table) -> pa.Table:
            tg = ray.get(tref)
            srcs = t[group_col].to_numpy(zero_copy_only=False)
            sc = t[val_col].to_numpy(zero_copy_only=False)
            out_s, out_w, out_b = [], [], []
            df = pd.DataFrame({"src": srcs, "sc": sc})
            for src, grp in df.groupby("src", sort=False):
                tl = tg.get(src)
                if not tl:
                    continue
                v = grp["sc"].to_numpy(np.int64)
                for w, rlo, rhi, nb in tl:
                    m = (v >= rlo) & (v <= rhi)
                    if not m.any():
                        continue
                    b = (v[m] - rlo) * nb // (rhi - rlo + 1)
                    bs, cs = np.unique(b, return_counts=True)
                    out_s.extend([src] * len(bs))
                    out_w.extend([w] * len(bs))
                    out_b.extend(zip(bs.tolist(), cs.tolist()))
            if not out_b:
                return pa.table({"source": pa.array([], pa.string()),
                                 "w": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            bb, nn = zip(*out_b)
            return pa.table({"source": pa.array(out_s, pa.string()),
                             "w": pa.array(out_w, pa.int64()),
                             "b": pa.array(bb, pa.int64()),
                             "n": pa.array(nn, pa.int64())})

        hl = (scored.map_batches(level, batch_format="pyarrow")
              .groupby(["source", "w", "b"])
              .aggregate(Sum("n", alias_name="n"))
              .take_all())  # bounded: <= targets * n_hist rows
        per_t: dict[tuple[str, int], list] = {}
        for r in hl:
            per_t.setdefault((r["source"], int(r["w"])), []).append(
                (int(r["b"]), int(r["n"])))
        for key, bl in per_t.items():
            bl.sort()
            rlo, rhi, rank = state[key]
            nb = min(n_hist, rhi - rlo + 1)
            span = rhi - rlo + 1
            cum = 0
            for b, cnt in bl:
                if cum < rank <= cum + cnt:
                    s0, s1 = _sub(rlo, span, nb, b)
                    state[key] = [s0, s1, rank - cum]
                    break
                cum += cnt
    return {k: v[0] for k, v in state.items()}


def source_median_quality_gate(sf_dir: str, n_hist: int = 1024):
    """Per-DOMAIN adaptive quality gating (the FineWeb/RefinedWeb
    domain-level filtering shape): keep a doc iff its classifier score
    is strictly above its OWN source's exact median — a per-group
    order statistic, not a global threshold, so a low-quality domain
    cannot hide behind a high-quality one.

    Scale shape — grouped EXACT order statistic WITHOUT per-group
    sorts and WITHOUT pulling any data rows: iterative VALUE bisection
    on count histograms. Each level is ONE streaming pass that
    histograms every still-unresolved (source, rank) target's current
    value range into ≤``n_hist`` sub-buckets of row counts
    (per-batch combined; ≤ 2·sources·n_hist rows to the driver); the
    per-target ascending cumulative walk narrows each range to the
    sub-bucket containing its rank, until every range collapses to the
    exact value — levels ≈ log_{n_hist}(score range) ≤ 3, driver state
    O(sources), nothing ever pulled. The per-source median_x2 table
    (one row per source) then broadcasts into a stateless filter pass.
    Median is lo+hi middle ranks ×2 so even-count groups stay in
    integer arithmetic (the median_value_by_type convention) and the
    SQL oracle is hash-exact at any corpus size."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def score_batch(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(flat.astype(object), return_inverse=True)
        w = _clf_weights(uniq)[inv]
        s = np.rint(np.bincount(par, weights=w, minlength=t.num_rows)
                    ).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"], "source": t["source"],
                         "clf_score": pa.array(s, pa.int64())})

    scored = _checkpoint(ds.map_batches(score_batch,
                                        batch_format="pyarrow"),
                         "srcmedian_scored")
    agg = scored.aggregate(Min("clf_score", alias_name="lo"),
                           Max("clf_score", alias_name="hi"),
                           Count(alias_name="n"))
    if not (agg["n"] or 0):
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "source": pa.array([], pa.string()),
                         "clf_score": pa.array([], pa.int64())})
    lo, hi = int(agg["lo"]), int(agg["hi"])

    # bisection state per (source, which-median-rank): value range
    # [rlo, rhi] + remaining rank WITHIN the range (1-based)
    cnts = (scored.groupby("source")
            .aggregate(Count(alias_name="n")).take_all())
    state: dict[tuple[str, int], list[int]] = {}
    for r in cnts:
        n = int(r["n"])
        state[(r["source"], 0)] = [lo, hi, (n + 1) // 2]
        state[(r["source"], 1)] = [lo, hi, n // 2 + 1]

    sel = _grouped_value_bisect(scored, "source", "clf_score",
                                state, n_hist)
    med2 = {src: sel[(src, 0)] + sel[(src, 1)]
            for src in {k[0] for k in state}}
    mref = ray.put(med2)

    def gate(t: pa.Table) -> pa.Table:
        m = ray.get(mref)
        srcs = t["source"].to_numpy(zero_copy_only=False)
        sc = t["clf_score"].to_numpy(zero_copy_only=False)
        m2 = np.fromiter((m[s] for s in srcs), np.int64, len(srcs))
        return t.filter(pa.array(2 * sc > m2))

    return scored.map_batches(gate, batch_format="pyarrow")


SOURCE_MEDIAN_GATE_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
sc AS (SELECT doc_id,
              CAST(sum((CAST('0x' || substr(md5(token), 1, 15) AS BIGINT)
                        % 1001) - 500) AS BIGINT) AS clf_score
       FROM tok GROUP BY doc_id),
s AS (SELECT d.doc_id, d.source, sc.clf_score
      FROM documents d JOIN sc USING (doc_id)),
m AS (SELECT source,
             CAST((list(clf_score ORDER BY clf_score))[(count(*)+1)//2]
                + (list(clf_score ORDER BY clf_score))[count(*)//2+1]
                  AS BIGINT) AS m2
      FROM s GROUP BY source)
SELECT s.doc_id, s.source, s.clf_score
FROM s JOIN m USING (source)
WHERE 2 * s.clf_score > m.m2
"""


def source_quartiles(sf_dir: str, n_hist: int = 1024):
    """Per-source exact quartiles (p25 / p50 / p75 of doc length) — the
    corpus-profiling order statistics a data curator reads before
    setting per-domain filter thresholds. Grouped EXACT rank selection
    via the shared histogram-bisection helper (``_grouped_value_bisect``
    — no per-group sorts, no data pulled to the driver, O(sources)
    driver state, ≈ log_{n_hist}(length range) streaming passes for ALL
    3·sources targets at once).

    Quantile convention: the element at 1-based ascending rank
    ``(n-1)·q // 1 + 1`` (the "lower" element — integer-exact, matched
    verbatim by the SQL oracle's list-indexing)."""
    ds = _read(sf_dir, "documents", ["source", "n_chars"])
    agg = ds.aggregate(Min("n_chars", alias_name="lo"),
                       Max("n_chars", alias_name="hi"),
                       Count(alias_name="n"))
    if not (agg["n"] or 0):
        return pa.table({"source": pa.array([], pa.string()),
                         "p25": pa.array([], pa.int64()),
                         "p50": pa.array([], pa.int64()),
                         "p75": pa.array([], pa.int64())})
    lo, hi = int(agg["lo"]), int(agg["hi"])

    cnts = (ds.groupby("source")
            .aggregate(Count(alias_name="n")).take_all())
    state: dict[tuple[str, int], list[int]] = {}
    for r in cnts:
        n = int(r["n"])
        for w, q in enumerate((25, 50, 75)):
            state[(r["source"], w)] = [lo, hi, (n - 1) * q // 100 + 1]

    sel = _grouped_value_bisect(ds, "source", "n_chars", state, n_hist)
    srcs = sorted({k[0] for k in state})
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "p25": pa.array([sel[(s, 0)] for s in srcs], pa.int64()),
        "p50": pa.array([sel[(s, 1)] for s in srcs], pa.int64()),
        "p75": pa.array([sel[(s, 2)] for s in srcs], pa.int64())})


SOURCE_QUARTILES_SQL = """
SELECT source,
       CAST((list(n_chars ORDER BY n_chars))
            [(count(*) - 1) * 25 // 100 + 1] AS BIGINT) AS p25,
       CAST((list(n_chars ORDER BY n_chars))
            [(count(*) - 1) * 50 // 100 + 1] AS BIGINT) AS p50,
       CAST((list(n_chars ORDER BY n_chars))
            [(count(*) - 1) * 75 // 100 + 1] AS BIGINT) AS p75
FROM documents GROUP BY source
"""


GRAM_CONTAINMENT_SQL = """
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
           FROM documents),
gi AS (SELECT doc_id, toks,
              unnest(generate_series(1, len(toks) - 4)) AS i
       FROM t WHERE len(toks) >= 5),
g AS (SELECT DISTINCT doc_id,
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
             || toks[i+3] || ' ' || toks[i+4] AS gram FROM gi
      UNION
      SELECT DISTINCT doc_id, text AS gram FROM t WHERE len(toks) < 5),
df AS (SELECT gram, count(*) AS n FROM g GROUP BY gram),
rare AS (SELECT gram FROM df WHERE n BETWEEN 2 AND 20),
cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         FROM g x JOIN rare USING (gram) JOIN g y USING (gram)
         WHERE x.doc_id < y.doc_id),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM g
       GROUP BY doc_id),
inter AS (SELECT c.a, c.b, CAST(count(*) AS BIGINT) AS i
          FROM cand c
          JOIN g ga ON ga.doc_id = c.a
          JOIN g gb ON gb.doc_id = c.b AND gb.gram = ga.gram
          GROUP BY c.a, c.b)
SELECT v.a, v.b, v.i AS inter, sa.n AS na, sb.n AS nb,
       CAST(round(CAST(v.i AS DOUBLE) / least(sa.n, sb.n) * 1e6)
            AS BIGINT) AS containment_e6
FROM inter v
JOIN sz sa ON sa.doc_id = v.a
JOIN sz sb ON sb.doc_id = v.b
WHERE 2 * v.i >= least(sa.n, sb.n)
"""


SELECT_TOKEN_BUDGET_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
s AS (SELECT doc_id,
             CAST(sum((CAST('0x' || substr(md5(token), 1, 15) AS BIGINT)
                       % 1001) - 500) AS BIGINT) AS clf_score,
             CAST(count(*) AS BIGINT) AS n_tokens
      FROM tok GROUP BY doc_id),
c AS (SELECT doc_id, clf_score, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY clf_score DESC, doc_id)
                  AS BIGINT) AS cum
      FROM s),
b AS (SELECT sum(n_tokens) // 4 AS budget FROM s)
SELECT doc_id, clf_score, n_tokens FROM c, b WHERE cum <= budget
"""


def corpus_stats_by_source(sf_dir: str):
    """Dataset-card statistics per source — the summary table a corpus
    release ships (docs, total/max whitespace tokens, chars, exact
    vocabulary size per source). Scale shape: ONE map pass emits two
    partial streams — per-batch scalar partials (O(sources) rows per
    batch) and per-batch-distinct (source, token) vocab rows — so the
    shuffles carry O(sources) scalars and O(per-source vocab) tokens,
    never the corpus text. The final vocab-count table is one row per
    source (sources are a metadata-scale dimension — a dataset card
    enumerates them by definition), folded on the driver and mapped
    onto the scalar aggregate; no sparse-key hash join (see CLAUDE.md
    on empty-block joins when distinct keys < num_partitions)."""
    ds = _read(sf_dir, "documents", ["text", "source", "n_chars"])

    def scal_partial(t: pa.Table) -> pa.Table:
        toks = pd.Series(t["text"].to_numpy(zero_copy_only=False),
                         dtype=object).str.split(" ")
        df = pd.DataFrame({
            "source": t["source"].to_numpy(zero_copy_only=False),
            "nt": toks.str.len().to_numpy(np.int64),
            "nc": t["n_chars"].to_numpy(zero_copy_only=False),
        })
        g = df.groupby("source", sort=False).agg(
            n_docs=("nt", "size"), n_tokens=("nt", "sum"),
            max_tokens=("nt", "max"), sum_chars=("nc", "sum"))
        g = g.reset_index()
        return pa.table({
            "source": pa.array(g["source"].tolist(), pa.string()),
            "n_docs": pa.array(g["n_docs"].to_numpy(np.int64)),
            "n_tokens": pa.array(g["n_tokens"].to_numpy(np.int64)),
            "max_tokens": pa.array(g["max_tokens"].to_numpy(np.int64)),
            "sum_chars": pa.array(g["sum_chars"].to_numpy(np.int64)),
        })

    def vocab_partial(t: pa.Table) -> pa.Table:
        toks = pd.Series(t["text"].to_numpy(zero_copy_only=False),
                         dtype=object).str.split(" ")
        lens = toks.str.len().to_numpy(np.int64)
        df = pd.DataFrame({
            "source": np.repeat(
                t["source"].to_numpy(zero_copy_only=False), lens),
            "token": np.concatenate(
                [np.array(x, dtype=object) for x in toks]),
        }).drop_duplicates()
        return pa.table({
            "source": pa.array(df["source"].tolist(), pa.string()),
            "token": pa.array(df["token"].tolist(), pa.string()),
        })

    scal = (ds.map_batches(scal_partial, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_tokens", alias_name="n_tokens"),
                       Max("max_tokens", alias_name="max_tokens"),
                       Sum("sum_chars", alias_name="sum_chars")))
    vocab = (ds.map_batches(vocab_partial, batch_format="pyarrow")
             .groupby(["source", "token"]).aggregate(Count(alias_name="_c"))
             .groupby("source").aggregate(Count(alias_name="n_vocab")))
    vmap = {r["source"]: r["n_vocab"] for r in vocab.take_all()}
    vref = ray.put(vmap)

    def attach(t: pa.Table) -> pa.Table:
        vm = ray.get(vref)
        nv = [vm[s] for s in t["source"].to_pylist()]
        return t.append_column("n_vocab", pa.array(nv, pa.int64()))

    return scal.map_batches(attach, batch_format="pyarrow")


CORPUS_STATS_SQL = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
), vocab AS (
  SELECT source, CAST(count(DISTINCT token) AS BIGINT) AS n_vocab
  FROM tok GROUP BY source
), scal AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY source
)
SELECT scal.source, n_docs, n_tokens, max_tokens, sum_chars, n_vocab
FROM scal JOIN vocab USING (source)
"""


def doc_length_buckets(sf_dir: str):
    """Sequence-length distribution for length-bucketed batching (the
    histogram a trainer uses to size packing buckets): docs bucketed by
    the bit-length of their whitespace token count (power-of-2 ceiling
    buckets), with doc and token totals per bucket. Shuffle-free map
    pass + an O(buckets)-row groupby (≤ ~40 buckets exist for any
    corpus — bit_length of a 2^40-token doc is 40). ``bit_length`` is
    reproduced in SQL as ``length(bin(n))`` — exact integer bit math on
    both sides, no float log2 boundary risk; n ≥ 1 always (splitting
    '' yields one empty token)."""
    ds = _read(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        nt = pd.Series(t["text"].to_numpy(zero_copy_only=False),
                       dtype=object).str.split(" ").str.len() \
            .to_numpy(np.int64)
        # bit_length via frexp-free integer route: 64 - clz
        bucket = np.zeros(len(nt), np.int64)
        nz = nt > 0
        bucket[nz] = np.floor(np.log2(nt[nz])).astype(np.int64) + 1
        # float log2 can misfloor near 2^k boundaries: correct exactly
        bucket[nz] -= (nt[nz] < (1 << np.maximum(bucket[nz] - 1, 0))) \
            .astype(np.int64)
        bucket[nz] += (nt[nz] >= (1 << bucket[nz])).astype(np.int64)
        df = pd.DataFrame({"bucket": bucket, "nt": nt})
        g = df.groupby("bucket", sort=False).agg(
            n_docs=("nt", "size"), n_tokens=("nt", "sum")).reset_index()
        return pa.table({
            "bucket": pa.array(g["bucket"].to_numpy(np.int64)),
            "n_docs": pa.array(g["n_docs"].to_numpy(np.int64)),
            "n_tokens": pa.array(g["n_tokens"].to_numpy(np.int64)),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_tokens", alias_name="n_tokens")))


DOC_LENGTH_BUCKETS_SQL = """
WITH s AS (
  SELECT CAST(length(bin(len(string_split(text, ' ')))) AS BIGINT)
           AS bucket,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
  FROM documents
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens
FROM s GROUP BY bucket
"""


def oov_rate_docs(sf_dir: str, vocab_k: int = 1000):
    """Tokenizer-coverage audit: per-doc out-of-vocabulary token count
    against the corpus's own top-``vocab_k`` vocabulary (frequency
    desc, token asc tie-break — a deterministic cut). The frequency
    pass shuffles per-batch-combined (token, count) partials (vocab-
    sized, never the corpus); the top-K fold is a sort+limit over the
    vocab table whose K-row result is a broadcast-sized artifact BY
    DEFINITION (that is what a vocabulary is), shipped once via
    ``ray.put``; the scoring pass is shuffle-free. All-integer output
    (doc_id, n_tokens, n_oov) — hash-exact vs SQL."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # driver fold below the _token_freq_topk gate, distributed above
    vocab = frozenset(_token_freq_topk(ds, vocab_k))
    vref = ray.put(vocab)

    def score(t: pa.Table) -> pa.Table:
        arr = t["text"].combine_chunks()
        toks = pc.split_pattern(arr, " ")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks) \
            .to_numpy(zero_copy_only=False)
        inv = pd.Series(flat.to_numpy(zero_copy_only=False)) \
            .isin(ray.get(vref)).to_numpy()
        n = t.num_rows
        n_tok = np.bincount(parents, minlength=n).astype(np.int64)
        n_oov = np.bincount(parents, weights=~inv,
                            minlength=n).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pa.array(n_tok),
                         "n_oov": pa.array(n_oov)})

    return ds.map_batches(score, batch_format="pyarrow")


OOV_RATE_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), freq AS (
  SELECT token, count(*) AS c FROM tok GROUP BY token
), vocab AS (
  SELECT token FROM freq ORDER BY c DESC, token LIMIT 1000
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov
FROM tok LEFT JOIN vocab v USING (token) GROUP BY doc_id
"""


def temperature_mix_docs(sf_dir: str):
    """Temperature-reweighted source mixture (the Gopher/PaLM data-
    mixing shape at alpha = 0.5): per-source quota = min(n_s,
    4 * isqrt(n_s)), so over-represented sources are down-sampled
    toward sqrt scale while small sources survive whole. Membership is
    a deterministic per-source hash rank (md5 hex of the salted
    doc_id — the stratified-sample convention), so every worker/run
    agrees with the SQL oracle bit-for-bit. Scale shape: the per-source
    count table is O(sources) driver state (a mixing config IS a
    per-source table); each batch pre-prunes to its local per-source
    quota so the final groupby(source) finisher sees ≤ quota rows per
    batch, never the corpus. SQL ``floor(sqrt(n))`` equals
    ``math.isqrt(n)`` for n < 2^52 (correctly-rounded double sqrt can
    only misfloor when the 1/(2*sqrt(n)) gap drops under half an ulp,
    i.e. n >= 2^52) — asserted."""
    import hashlib
    import math

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    cnt = ds.groupby("source").aggregate(Count(alias_name="n")).take_all()
    assert all(r["n"] < (1 << 52) for r in cnt)
    quota = {r["source"]: min(r["n"], 4 * math.isqrt(r["n"]))
             for r in cnt}
    qref = ray.put(quota)

    def rank_filter(df: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(qref)
        h = df["doc_id"].map(
            lambda i: hashlib.md5(f"{i}-mx1".encode()).hexdigest())
        df = df.assign(_h=h)
        rk = df.groupby("source", sort=False)["_h"].rank(method="first")
        return df[rk <= df["source"].map(qm)]

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return rank_filter(g)[["doc_id", "source"]]

    pruned = ds.map_batches(rank_filter, batch_format="pandas")
    return pruned.groupby("source").map_groups(finish,
                                               batch_format="pandas")


TEMPERATURE_MIX_SQL = """
WITH cnt AS (
  SELECT source, count(*) AS n FROM documents GROUP BY source
), q AS (
  SELECT source,
         least(n, 4 * CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT))
           AS quota
  FROM cnt
)
SELECT doc_id, source FROM (
  SELECT d.doc_id, d.source, q.quota,
         row_number() OVER (
           PARTITION BY d.source
           ORDER BY md5(CAST(d.doc_id AS VARCHAR) || '-mx1')) AS rn
  FROM documents d JOIN q USING (source))
WHERE rn <= quota
"""


def prefix_dup_source_matrix(sf_dir: str, k: int = 8):
    """Cross-source duplicate-leakage matrix on the opening-``k``-token
    fingerprint — the shared-boilerplate diagnostic a multi-source
    corpus card ships (template headers/openings that bridge source A
    and source B vs repeat inside one source; whole-doc md5 is the
    degenerate k=∞ case). Never materializes pairs: per-batch
    (md5(prefix), source, n) partials → groupby([fp, source]).sum →
    per-fingerprint ``map_groups`` whose group is AT MOST one row per
    source (bounded by the source dimension, not the duplicate count)
    emits pair counts COMBINATORIALLY (n_a·n_b cross-source, C(n,2)
    within) → one O(sources²) groupby. A fingerprint with a million
    copies costs one integer multiply, not 10^12 pair rows.
    All-integer, hash-exact vs SQL (DuckDB list slice [1:k] ==
    Python [:k])."""
    ds = _read(sf_dir, "documents", ["text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        import hashlib
        texts = t["text"].to_numpy(zero_copy_only=False)
        fps = [hashlib.md5(
            " ".join(x.split(" ")[:k]).encode("utf-8")).hexdigest()
            for x in texts]
        df = pd.DataFrame({
            "fp": fps,
            "source": t["source"].to_numpy(zero_copy_only=False)})
        g = df.groupby(["fp", "source"], sort=False).size() \
            .reset_index(name="n")
        return pa.table({
            "fp": pa.array(g["fp"].tolist(), pa.string()),
            "source": pa.array(g["source"].tolist(), pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64)),
        })

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["fp", "source"])
              .aggregate(Sum("n", alias_name="n")))

    def emit_pairs(g: pa.Table) -> pa.Table:
        src = np.asarray(g["source"].to_pylist(), dtype=object)
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(src)
        src, n = src[order], n[order]
        out_a, out_b, out_n = [], [], []
        within = n * (n - 1) // 2
        keep = within > 0
        out_a.extend(src[keep])
        out_b.extend(src[keep])
        out_n.extend(within[keep])
        if len(src) > 1:
            iu, ju = np.triu_indices(len(src), k=1)
            out_a.extend(src[iu])
            out_b.extend(src[ju])
            out_n.extend(n[iu] * n[ju])
        return pa.table({
            "src_a": pa.array(list(out_a), pa.string()),
            "src_b": pa.array(list(out_b), pa.string()),
            "np": pa.array([int(x) for x in out_n], pa.int64())})

    return (counts.groupby("fp").map_groups(emit_pairs,
                                            batch_format="pyarrow")
            .groupby(["src_a", "src_b"])
            .aggregate(Sum("np", alias_name="n_pairs")))


PREFIX_DUP_MATRIX_SQL = """
WITH c AS (
  SELECT md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS fp,
         source, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY fp, source
), p AS (
  SELECT a.source AS src_a, b.source AS src_b, a.n * b.n AS np
  FROM c a JOIN c b USING (fp) WHERE a.source < b.source
  UNION ALL
  SELECT source, source, n * (n - 1) // 2 FROM c WHERE n >= 2
)
SELECT src_a, src_b, CAST(sum(np) AS BIGINT) AS n_pairs
FROM p GROUP BY src_a, src_b
"""


def near_dup_source_matrix(sf_dir: str):
    """NEAR-dup leakage across sources: the verified jaccard pair set
    (MinHash-LSH candidates → exact 3-gram jaccard ≥ 0.5, the
    size-gated chain) mapped to canonical (src_a ≤ src_b) source pairs
    and counted. The pair table is bounded by the verified graph (tiny
    next to the corpus); endpoint sources arrive by a distributed
    ``is_in`` filter over the docs table folded on the driver (bounded
    by 2·pairs), never a corpus pull. Deterministic; rows-only
    (LSH banding is not SQL-expressible), golden + brute pytest. Above
    the verify gate the source lookup switches to two hash joins
    (pairs ⋈ docs on each endpoint) — same output, no driver pull."""
    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    pairs = _verified_jaccard_pairs(sf_dir, "srcmat_banded") \
        .select_columns(["a", "b"]).materialize()
    if pairs.count() > _VERIFY_DRIVER_MAX:
        j = pairs.join(docs, join_type="inner", num_partitions=8,
                       on=("a",), right_on=("doc_id",))
        j = j.map_batches(
            lambda t: pa.table({"b": t["b"], "sa": t["source"]}),
            batch_format="pyarrow")
        j = j.join(docs, join_type="inner", num_partitions=8,
                   on=("b",), right_on=("doc_id",))

        def canon(t: pa.Table) -> pa.Table:
            sa = t["sa"].to_numpy(zero_copy_only=False).astype(object)
            sb = t["source"].to_numpy(zero_copy_only=False).astype(object)
            return pa.table({
                "src_a": pa.array(np.minimum(sa, sb).tolist(),
                                  pa.string()),
                "src_b": pa.array(np.maximum(sa, sb).tolist(),
                                  pa.string())})

        return (j.map_batches(canon, batch_format="pyarrow")
                .groupby(["src_a", "src_b"])
                .aggregate(Count(alias_name="n_pairs")))
    pt = pa.concat_tables(
        pairs.iter_batches(batch_size=None, batch_format="pyarrow"))
    if pt.num_rows == 0:
        return rd.from_arrow(pa.table({
            "src_a": pa.array([], pa.string()),
            "src_b": pa.array([], pa.string()),
            "n_pairs": pa.array([], pa.int64())}))
    a = pt["a"].to_numpy(zero_copy_only=False)
    b = pt["b"].to_numpy(zero_copy_only=False)
    need = np.unique(np.concatenate([a, b]))
    nref = ray.put(pa.array(need, pa.int64()))
    st = pa.concat_tables(
        docs.map_batches(
            lambda t: t.filter(pc.is_in(t["doc_id"],
                                        value_set=ray.get(nref))),
            batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    smap = dict(zip(st["doc_id"].to_pylist(), st["source"].to_pylist()))
    sa = np.array([smap[i] for i in a], dtype=object)
    sb = np.array([smap[i] for i in b], dtype=object)
    lo = np.minimum(sa, sb)
    hi = np.maximum(sa, sb)
    df = pd.DataFrame({"src_a": lo, "src_b": hi}) \
        .groupby(["src_a", "src_b"], sort=True).size() \
        .reset_index(name="n_pairs")
    return rd.from_arrow(pa.table({
        "src_a": pa.array(df["src_a"].tolist(), pa.string()),
        "src_b": pa.array(df["src_b"].tolist(), pa.string()),
        "n_pairs": pa.array(df["n_pairs"].to_numpy(np.int64)),
    }))


def rrf_hybrid_search_docs(sf_dir: str, k_leg: int = 20, k: int = 10,
                           rrf_k: int = 60):
    """Hybrid retrieval with reciprocal-rank fusion (Cormack & Clarke,
    SIGIR'09) — the modern two-tower search shape a curation pipeline
    runs for benchmark mining: the SAME information need expressed
    lexically (BM25 over text, `_BM25_QUERIES`) and densely (cosine
    over embeddings; query q's dense form is the embedding of
    vec_id = q), each leg ranked top-``k_leg``, fused by
    RRF(d) = Σ_legs 1/(rrf_k + rank_leg(d)).

    Exactness: the fused score is kept as an EXACT int64 rational
    (rrf_num / rrf_den) — both-legs docs get (2·K + ra + rb,
    (K+ra)(K+rb)), single-leg docs (1, K+r) — so no float ever crosses
    the Ray/DuckDB boundary as data. The final ordering divides once in
    IEEE double on BOTH sides: distinct fractions here differ by
    ≥ 1/(K+k_leg)⁴ ≈ 2e-8 while double rounding error is ≤ ~6e-16, so
    the sort (and the doc_id tie-break on exactly-equal fractions) is
    bit-identical across engines.

    Scale shape: each leg is a shuffle-free scoring pass with per-batch
    partial top-k and a constant-group finisher (the corpus is never
    shuffled); the fusion folds ≤ 2·k_leg·|Q| rows on the driver."""
    lex_rows = bm25_search_docs(sf_dir, k=k_leg).take_all()

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    queries = _query_vecs(sf_dir, len(_BM25_QUERIES))
    den_rows = F_ann.brute_force_topk(ds, queries, k=k_leg).take_all()

    lexr = {(int(r["query_id"]), int(r["doc_id"])): int(r["rank"])
            for r in lex_rows}
    denr = {(int(r["query_id"]), int(r["vec_id"])): int(r["rank"])
            for r in den_rows}
    out_q, out_d, out_n, out_dn, out_r = [], [], [], [], []
    for qid in sorted({q for q, _ in lexr} | {q for q, _ in denr}):
        fused = []
        for key in {d for qq, d in lexr if qq == qid} \
                | {d for qq, d in denr if qq == qid}:
            ra, rb = lexr.get((qid, key)), denr.get((qid, key))
            if ra is not None and rb is not None:
                num, den = 2 * rrf_k + ra + rb, \
                    (rrf_k + ra) * (rrf_k + rb)
            else:
                num, den = 1, rrf_k + (ra if ra is not None else rb)
            fused.append((-(num / den), key, num, den))
        fused.sort()
        for rank, (_, did, num, den) in enumerate(fused[:k], 1):
            out_q.append(qid)
            out_d.append(did)
            out_n.append(num)
            out_dn.append(den)
            out_r.append(rank)
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "doc_id": pa.array(out_d, pa.int64()),
                     "rrf_num": pa.array(out_n, pa.int64()),
                     "rrf_den": pa.array(out_dn, pa.int64()),
                     "rank": pa.array(out_r, pa.int64())})


def _rrf_sql(k_leg: int = 20, k: int = 10, rrf_k: int = 60) -> str:
    nq = len(_BM25_QUERIES)
    return f"""{_bm25_cte()},
ltop AS (SELECT query_id, doc_id,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY score_e6 DESC, doc_id)
                    AS rank
         FROM sc QUALIFY rank <= {k_leg}),
dq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
       WHERE vec_id < {nq}),
dsc AS (SELECT dq.query_id, e.vec_id AS doc_id,
               CAST(round(list_cosine_similarity(
                 CAST(dq.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                 * 1000000) AS BIGINT) AS score_e6
        FROM dq CROSS JOIN embeddings e),
dtop AS (SELECT query_id, doc_id,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY score_e6 DESC, doc_id)
                    AS rank
         FROM dsc QUALIFY rank <= {k_leg}),
fused AS (SELECT COALESCE(l.query_id, d.query_id) AS query_id,
                 COALESCE(l.doc_id, d.doc_id) AS doc_id,
                 CAST(CASE WHEN l.rank IS NOT NULL
                            AND d.rank IS NOT NULL
                      THEN {2 * rrf_k} + l.rank + d.rank
                      ELSE 1 END AS BIGINT) AS rrf_num,
                 CAST(CASE WHEN l.rank IS NOT NULL
                            AND d.rank IS NOT NULL
                      THEN ({rrf_k} + l.rank) * ({rrf_k} + d.rank)
                      ELSE {rrf_k} + COALESCE(l.rank, d.rank)
                      END AS BIGINT) AS rrf_den
          FROM ltop l FULL OUTER JOIN dtop d
            ON l.query_id = d.query_id AND l.doc_id = d.doc_id)
SELECT query_id, doc_id, rrf_num, rrf_den,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY CAST(rrf_num AS DOUBLE) / rrf_den
                                   DESC, doc_id) AS rank
FROM fused QUALIFY rank <= {k}
"""


RRF_HYBRID_SQL = _rrf_sql()


def ccnet_perplexity_buckets(sf_dir: str, n_hist: int = 1024,
                             driver_max: int = 5_000_000):
    """CCNet-style per-LANGUAGE quality bucketing (Wenzek et al.,
    LREC'20): split each language's documents into head / middle / tail
    by terciles of the corpus-trigram-LM fluency score — CCNet buckets
    on LM perplexity per language so that a low-resource language is
    never graded against a high-resource one's distribution. Here
    higher fluency ≡ lower perplexity, so the TOP tercile is ``head``.

    Scale shape: the fluency table reuses ``trigram_fluency_docs``
    (hashed n-gram keys, per-batch combine, size-gated driver fold),
    joins the doc→lang column once (int-keyed hash join), checkpoints,
    and then the per-language tercile thresholds come from the shared
    ``_grouped_value_bisect`` engine — EXACT grouped order statistics
    via ≈ log₁₀₂₄(score range) streaming histogram passes, O(langs)
    driver state, no per-group sort, no data pulled. The one-row-per-
    language threshold table broadcasts into a stateless bucket-assign
    pass. Tercile convention: ascending rank (n−1)·q // 100 + 1 (the
    ``source_quartiles`` "lower element" convention), docs with < 3
    tokens have no trigrams and drop out on both sides.

    Below the fluency chain's ``driver_max`` gate (the fold already
    returned a driver Arrow table) the lang join, the per-language
    terciles, and the bucket assignment all fold on the driver too —
    one Arrow hash join + a numpy sort per language — instead of
    paying a Ray join, a checkpoint, and 3–4 streaming bisect passes
    for a table the gate already bounded. Two-form equality is
    pytest-asserted."""
    f = trigram_fluency_docs(sf_dir, driver_max=driver_max)
    langs = _read(sf_dir, "documents", ["doc_id", "lang"])
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "lang": pa.array([], pa.string()),
                      "fluency_e6": pa.array([], pa.int64()),
                      "bucket": pa.array([], pa.string())})
    if isinstance(f, pa.Table):
        lt = pa.concat_tables(
            langs.iter_batches(batch_size=None, batch_format="pyarrow"))
        j = f.select(["doc_id", "fluency_e6"]).join(lt, keys="doc_id")
        if j.num_rows == 0:
            return empty
        ids = j["doc_id"].to_numpy(zero_copy_only=False)
        fl = j["fluency_e6"].to_numpy(zero_copy_only=False)
        lg = np.asarray(j["lang"].to_pylist(), dtype=object)
        bucket = np.empty(len(ids), dtype=object)
        for lang in np.unique(lg):
            m = lg == lang
            v = np.sort(fl[m])
            n = len(v)
            t33, t66 = v[(n - 1) * 33 // 100], v[(n - 1) * 66 // 100]
            bucket[m] = np.where(
                fl[m] <= t33, "tail",
                np.where(fl[m] <= t66, "middle", "head"))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "lang": pa.array(lg.tolist(), pa.string()),
                         "fluency_e6": pa.array(fl, pa.int64()),
                         "bucket": pa.array(bucket.tolist(), pa.string())})
    fds = f.select_columns(["doc_id", "fluency_e6"])
    scored = _checkpoint(
        fds.join(langs, join_type="inner", num_partitions=8,
                 on=("doc_id",)), "ccnet_scored")

    agg = scored.aggregate(Min("fluency_e6", alias_name="lo"),
                           Max("fluency_e6", alias_name="hi"),
                           Count(alias_name="n"))
    if not (agg["n"] or 0):
        return empty
    lo, hi = int(agg["lo"]), int(agg["hi"])

    cnts = (scored.groupby("lang")
            .aggregate(Count(alias_name="n")).take_all())
    state: dict[tuple[str, int], list[int]] = {}
    for r in cnts:
        n = int(r["n"])
        for w, q in enumerate((33, 66)):
            state[(r["lang"], w)] = [lo, hi, (n - 1) * q // 100 + 1]

    sel = _grouped_value_bisect(scored, "lang", "fluency_e6",
                                state, n_hist)
    th = {lang: (sel[(lang, 0)], sel[(lang, 1)])
          for lang in {k[0] for k in state}}
    tref = ray.put(th)

    def assign(t: pa.Table) -> pa.Table:
        m = ray.get(tref)
        lg = t["lang"].to_numpy(zero_copy_only=False)
        fl = t["fluency_e6"].to_numpy(zero_copy_only=False)
        t33 = np.fromiter((m[x][0] for x in lg), np.int64, len(lg))
        t66 = np.fromiter((m[x][1] for x in lg), np.int64, len(lg))
        bucket = np.where(fl <= t33, "tail",
                          np.where(fl <= t66, "middle", "head"))
        return pa.table({
            "doc_id": t["doc_id"], "lang": t["lang"],
            "fluency_e6": t["fluency_e6"],
            "bucket": pa.array(bucket.astype(object), pa.string())})

    return scored.map_batches(assign, batch_format="pyarrow")


CCNET_BUCKETS_SQL = """
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
  SELECT t.doc_id,
         CAST(sum(ct) AS BIGINT) AS s_tri,
         CAST(sum(cb) AS BIGINT) AS s_big
  FROM tri t JOIN tric USING (tri) JOIN bigc USING (big)
  GROUP BY t.doc_id),
f AS (SELECT doc_id,
             CAST(round(s_tri / s_big * 1000000) AS BIGINT) AS fluency_e6
      FROM doc),
j AS (SELECT d.doc_id, d.lang, f.fluency_e6
      FROM documents d JOIN f USING (doc_id)),
th AS (SELECT lang,
              CAST((list(fluency_e6 ORDER BY fluency_e6))
                   [(count(*) - 1) * 33 // 100 + 1] AS BIGINT) AS t33,
              CAST((list(fluency_e6 ORDER BY fluency_e6))
                   [(count(*) - 1) * 66 // 100 + 1] AS BIGINT) AS t66
       FROM j GROUP BY lang)
SELECT j.doc_id, j.lang, j.fluency_e6,
       CASE WHEN j.fluency_e6 <= th.t33 THEN 'tail'
            WHEN j.fluency_e6 <= th.t66 THEN 'middle'
            ELSE 'head' END AS bucket
FROM j JOIN th USING (lang)
"""


def bpe_fertility_by_lang(sf_dir: str):
    """Tokenizer fertility by language — pre-tokenizer tokens per
    whitespace word, the standard tokenizer-evaluation metric (a
    fertility ≫ 1 language is being over-segmented and will train
    slower per byte; cf. the multilingual-tokenizer analyses in XLM-R /
    NLLB). Integer partials (Σ regex-pretokens, Σ words, doc count) per
    (batch, lang) combine into ONE tiny groupby(lang); the ratio is a
    single IEEE division fixed-pointed to e6 (the trigram-fluency
    determinism trick) so the DuckDB oracle is hash-exact. Shuffle-free
    over the corpus — the only exchange carries one row per (batch,
    lang)."""
    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        nb = F_text.token_count_bpe_batch(t)["n_bpe_tokens"] \
            .to_numpy(zero_copy_only=False)
        nw = pc.list_value_length(pc.split_pattern(
            t["text"].combine_chunks(), " ")) \
            .to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({
            "lang": t["lang"].to_numpy(zero_copy_only=False),
            "nb": nb.astype(np.int64), "nw": nw.astype(np.int64)})
            .groupby("lang", sort=False)
            .agg(nb=("nb", "sum"), nw=("nw", "sum"), nd=("nb", "size"))
            .reset_index())
        return pa.table({
            "lang": pa.array(g["lang"].tolist(), pa.string()),
            "nb": pa.array(g["nb"].to_numpy(np.int64)),
            "nw": pa.array(g["nw"].to_numpy(np.int64)),
            "nd": pa.array(g["nd"].to_numpy(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("lang")
           .aggregate(Sum("nb", alias_name="n_bpe_tokens"),
                      Sum("nw", alias_name="n_words"),
                      Sum("nd", alias_name="n_docs")))

    def fin(t: pa.Table) -> pa.Table:
        f = (t["n_bpe_tokens"].to_numpy(zero_copy_only=False)
             / t["n_words"].to_numpy(zero_copy_only=False))
        e6 = pc.cast(pc.round(pc.multiply(pa.array(f, pa.float64()), 1e6),
                              options=pc.RoundOptions(
                                  ndigits=0,
                                  round_mode="half_towards_infinity")),
                     pa.int64())
        return pa.table({"lang": t["lang"], "n_docs": t["n_docs"],
                         "n_bpe_tokens": t["n_bpe_tokens"],
                         "n_words": t["n_words"], "fertility_e6": e6})

    return agg.map_batches(fin, batch_format="pyarrow")


BPE_FERTILITY_SQL = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(regexp_extract_all(
         text, '[A-Za-z0-9_]+|[^A-Za-z0-9_[:space:]]+'))) AS BIGINT)
         AS n_bpe_tokens,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
       CAST(round(CAST(sum(len(regexp_extract_all(
              text, '[A-Za-z0-9_]+|[^A-Za-z0-9_[:space:]]+')))
              AS DOUBLE)
            / sum(len(string_split(text, ' '))) * 1000000) AS BIGINT)
         AS fertility_e6
FROM documents GROUP BY lang
"""


def hard_negative_mining_docs(sf_dir: str, k_leg: int = 20, k: int = 10,
                              max_sim_e6: int = 100_000):
    """Hard-negative mining for retrieval training (the DPR / contrastive
    fine-tuning data op): for each query, the documents that score HIGH
    lexically (BM25 top-``k_leg``) but LOW semantically (cosine to the
    query embedding < ``max_sim_e6``/1e6) — lexical confusers, the most
    informative negatives. Query q's dense form is embedding vec_id = q
    (the ``rrf_hybrid_search_docs`` pairing).

    Scale shape: the BM25 leg is the shuffle-free scoring pass with
    per-batch partial top-k (corpus never shuffled); the candidate set
    is then ≤ k_leg·|Q| (query, doc) pairs, whose embeddings arrive by
    a distributed ``is_in`` filter folded on the driver (bounded by
    k_leg·|Q| + |Q| rows — never a corpus pull); the cosine check runs
    on the driver over that bounded set."""
    lex_rows = bm25_search_docs(sf_dir, k=k_leg).take_all()
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64()),
                      "bm25_rank": pa.array([], pa.int64()),
                      "dense_sim_e6": pa.array([], pa.int64()),
                      "hn_rank": pa.array([], pa.int64())})
    if not lex_rows:
        return empty
    import pyarrow.dataset as pds

    need = sorted({int(r["doc_id"]) for r in lex_rows}
                  | {int(q) for q in _BM25_QUERIES})
    # pushed-down isin read: only row groups whose vec_id statistics
    # overlap the bounded candidate set are scanned at all
    et = pa.concat_tables(
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"],
                        filter=pds.field("vec_id").isin(need))
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    vecs = {int(i): np.asarray(v, np.float64)
            for i, v in zip(et["vec_id"].to_pylist(),
                            et["embedding"].to_pylist())}
    unit = {i: v / np.linalg.norm(v) for i, v in vecs.items()}

    out_q, out_d, out_b, out_s, out_r = [], [], [], [], []
    byq: dict[int, list] = {}
    for r in lex_rows:
        byq.setdefault(int(r["query_id"]), []).append(
            (int(r["rank"]), int(r["doc_id"])))
    for qid in sorted(byq):
        qv = unit.get(qid)
        if qv is None:
            continue
        kept = []
        for rank, did in sorted(byq[qid]):
            if did not in unit:
                continue
            se6 = int(np.round(float(unit[did] @ qv) * 1e6))
            if se6 < max_sim_e6:
                kept.append((rank, did, se6))
        for hn, (rank, did, se6) in enumerate(kept[:k], 1):
            out_q.append(qid)
            out_d.append(did)
            out_b.append(rank)
            out_s.append(se6)
            out_r.append(hn)
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "doc_id": pa.array(out_d, pa.int64()),
                     "bm25_rank": pa.array(out_b, pa.int64()),
                     "dense_sim_e6": pa.array(out_s, pa.int64()),
                     "hn_rank": pa.array(out_r, pa.int64())})


def _hard_negative_sql(k_leg: int = 20, k: int = 10,
                       max_sim_e6: int = 100_000) -> str:
    return f"""{_bm25_cte()},
ltop AS (SELECT query_id, doc_id,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY score_e6 DESC, doc_id)
                    AS bm25_rank
         FROM sc QUALIFY bm25_rank <= {k_leg}),
sel AS (SELECT l.query_id, l.doc_id, l.bm25_rank,
               CAST(round(list_cosine_similarity(
                 CAST(eq.embedding AS DOUBLE[]),
                 CAST(ed.embedding AS DOUBLE[])) * 1000000) AS BIGINT)
                 AS dense_sim_e6
        FROM ltop l
        JOIN embeddings eq ON eq.vec_id = l.query_id
        JOIN embeddings ed ON ed.vec_id = l.doc_id)
SELECT query_id, doc_id, bm25_rank, dense_sim_e6,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY bm25_rank) AS hn_rank
FROM sel WHERE dense_sim_e6 < {max_sim_e6}
QUALIFY hn_rank <= {k}
"""


HARD_NEGATIVE_SQL = _hard_negative_sql()


def cdc_chunk_docs(sf_dir: str):
    """Content-defined chunking over the corpus (see
    ``functions.text.cdc_chunk_batch`` — Gear rolling hash, FastCDC
    shape): the storage-dedup unit table (doc_id, chunk_idx, start,
    length, chunk_md5). ONE stateless vectorized pass, no shuffle.
    Rows-only (a 64-byte rolling hash is not SQL-expressible);
    golden-pinned + brute-force/realignment pytests."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(F_text.cdc_chunk_batch, batch_format="pyarrow")


def cdc_dedup_stats(sf_dir: str):
    """Chunk-level dedup accounting over the CDC chunk table — the
    number a storage/dedup system actually reports: total vs unique
    chunks and bytes (unique = distinct chunk_md5). The only exchange
    is the exact-dedup groupby on the 16-byte chunk hash (the
    ``dedup_exact_docs`` shape — hash-partitioned, combiner-friendly);
    the final fold is a 1-row aggregate."""
    from rendler_ray.functions.groupagg import sorted_group_agg

    chunks = (_read(sf_dir, "documents", ["doc_id", "text"])
              .map_batches(F_text.cdc_chunk_batch, batch_format="pyarrow")
              .select_columns(["chunk_md5", "length"]))
    uniq = sorted_group_agg(chunks, "chunk_md5",
                            [("chunk_md5", "count", "n"),
                             ("length", "min", "length")])

    def widen(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        ln = t["length"].to_numpy(zero_copy_only=False)
        return pa.table({"n": t["n"], "length": t["length"],
                         "tot_bytes": pa.array(n * ln, pa.int64())})

    agg = (uniq.map_batches(widen, batch_format="pyarrow")
           .aggregate(Sum("n", alias_name="total_chunks"),
                      Count(alias_name="unique_chunks"),
                      Sum("tot_bytes", alias_name="total_bytes"),
                      Sum("length", alias_name="unique_bytes")))
    return pa.table({k: pa.array([int(agg[k] or 0)], pa.int64())
                     for k in ("total_chunks", "unique_chunks",
                               "total_bytes", "unique_bytes")})


_PROFILE_COLS = ("o_custkey", "o_orderstatus", "o_orderpriority")


def near_dup_incremental_docs(sf_dir: str, driver_max: int | None = None):
    """Incremental near-dup dedup — the production SHARD-ARRIVAL
    shape: an arriving shard (odd doc_id) is deduped against the
    standing corpus (even doc_id) WITHOUT re-clustering the corpus.
    The band table is the standing LSH index (at scale it persists
    across arrivals; here it is rebuilt deterministically — the
    sandbox has no cross-run store), candidate buckets must contain
    BOTH sides, and only cross-side pairs are shingled and verified
    (exact 3-gram jaccard ≥ 0.5) — within-shard and within-corpus
    pairs are never even constructed, which is exactly the work the
    incremental form saves over the full ``ngram_jaccard_pairs``
    chain. Output: (new_id, old_id, jaccard) verified matches, the
    rows an ingest gate would drop-or-link on. Approximate like the
    full chain (LSH recall); golden + brute/containment pytests."""
    pairs = _verified_jaccard_pairs(sf_dir, "incr_banded",
                                    driver_max=driver_max,
                                    cross_parity=True)

    def orient(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        odd_a = a % 2 == 1
        return pa.table({
            "new_id": pa.array(np.where(odd_a, a, b), pa.int64()),
            "old_id": pa.array(np.where(odd_a, b, a), pa.int64()),
            "jaccard": t["jaccard"]})

    return pairs.map_batches(orient, batch_format="pyarrow")


def profile_orders_columns(sf_dir: str):
    """Dataset profiling (the data-card / ingest-quality-report
    staple): per column — row count, null count, EXACT distinct count.
    Scale shape: null/row partials fold per (batch, column) into a
    groupby(col_name) of O(batches·cols) rows; the exact distinct
    count shuffles one row per (column, DISTINCT value) — per-batch
    deduped first so hot values collapse before the exchange (the
    inverted-index combiner shape). Values cross the exchange as
    strings, cast identically to the SQL oracle's VARCHAR."""
    ds = _read(sf_dir, "orders", list(_PROFILE_COLS))

    def stats(t: pa.Table) -> pa.Table:
        return pa.table({
            "col_name": pa.array(list(_PROFILE_COLS), pa.string()),
            "nr": pa.array([t.num_rows] * len(_PROFILE_COLS), pa.int64()),
            "nn": pa.array([t[c].null_count for c in _PROFILE_COLS],
                           pa.int64())})

    def distinct(t: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in _PROFILE_COLS:
            u = pc.unique(pc.drop_null(
                pc.cast(t[c].combine_chunks(), pa.string())))
            names.extend([c] * len(u))
            vals.extend(u.to_pylist())
        return pa.table({"col_name": pa.array(names, pa.string()),
                         "val": pa.array(vals, pa.string())})

    srows = (ds.map_batches(stats, batch_format="pyarrow")
             .groupby("col_name")
             .aggregate(Sum("nr", alias_name="n_rows"),
                        Sum("nn", alias_name="n_null"))
             .take_all())  # bounded: one row per profiled column
    drows = (ds.map_batches(distinct, batch_format="pyarrow")
             .groupby(["col_name", "val"]).aggregate(Count(alias_name="x"))
             .groupby("col_name").aggregate(Count(alias_name="n_distinct"))
             .take_all())  # bounded likewise
    dmap = {r["col_name"]: int(r["n_distinct"]) for r in drows}
    srows.sort(key=lambda r: r["col_name"])
    return pa.table({
        "col_name": pa.array([r["col_name"] for r in srows], pa.string()),
        "n_rows": pa.array([int(r["n_rows"]) for r in srows], pa.int64()),
        "n_null": pa.array([int(r["n_null"]) for r in srows], pa.int64()),
        "n_distinct": pa.array([dmap.get(r["col_name"], 0)
                                for r in srows], pa.int64())})


PROFILE_ORDERS_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows, "
    f"CAST(count(*) - count({c}) AS BIGINT) AS n_null, "
    f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct FROM orders"
    for c in _PROFILE_COLS)


def docs_jsonl_export_roundtrip(sf_dir: str):
    """Sink coverage: export the documents table to newline-delimited
    JSON shards (one file per block — the resumable layout) and read
    them back. The round-trip returning the source table bit-exactly
    (oracle: SELECT the same columns from documents) verifies the JSON
    sink preserves int64 ids, counts, and unicode text. Streaming on
    both legs — the table is never driver-materialized."""
    import shutil

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    ds = _read(sf_dir, "documents", cols)
    path = f"{_ckpt_root()}/jsonl_export"
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ds.write_json(path)
    return rd.read_json(path).select_columns(cols)


DOCS_JSONL_ROUNDTRIP_SQL = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""


def docs_csv_export_roundtrip(sf_dir: str):
    """Sink coverage, CSV leg (the ``docs_jsonl_export_roundtrip``
    sibling): export the documents table to CSV shards (one file per
    block — the resumable layout) and read them back bit-exactly.
    Streaming on both legs; Arrow's CSV writer quotes as needed, and
    the read-back schema is pinned by the source columns."""
    import shutil

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    ds = _read(sf_dir, "documents", cols)
    path = f"{_ckpt_root()}/csv_export"
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ds.write_csv(path)
    return rd.read_csv(path).select_columns(cols)


def kcore_crawl_graph(sf_dir: str):
    """k-core decomposition of the crawl graph (coreness per page) —
    the graph-density complement to PageRank/HITS a crawl curator uses
    to separate densely interlinked cores (boilerplate link farms, nav
    meshes) from tree-like periphery. Size-gated
    ``functions/graph.py::kcore_auto``: driver peeling (one pass)
    under the gate, distributed degree-peel rounds (zero-pad degree
    union-groupby + endpoint semi-joins) above it; two-form equality
    pytest-asserted. Deterministic (coreness is order-free); rows-only
    (iterative), golden-pinned."""
    from rendler_ray.functions.graph import kcore_auto
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=4))
    return kcore_auto(res.edges)


def pca_project_embeddings(sf_dir: str, n_components: int = 4):
    """Distributed PCA over the embedding column — the dimensionality
    reduction every embedding-curation stack runs before clustering /
    visualization / whitening. Scale shape: ONE stats pass where each
    batch emits a single flattened partial — (0,0)→count, (i,0)→column
    sums, (i,j) i≤j → Gram entries, all INTEGER (values floor to 1e-6
    fixed point first, the ``embedding_gram_matrix`` convention) — so
    the ≤2,145-key groupby-sum is exact and the covariance the driver
    assembles is bit-identical at any parallelism; the 64×64 eigh runs
    on the driver (O(d³), d=64) and the components broadcast into a
    stateless projection pass (per-row dot products — batching cannot
    change them). Eigenvector sign is fixed (largest-|component|
    positive) so the output is well-defined. Rows-only (eigh is not
    SQL); golden-pinned + orthonormality/variance/brute pytests."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "g": pa.array([], pa.int64())})
        emb = t["embedding"].combine_chunks()
        d = pc.list_value_length(emb)[0].as_py()
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        e = np.floor(flat.astype(np.float64) * 1_000_000).astype(
            np.int64).reshape(len(emb), d)
        iu, ju = np.triu_indices(d)
        i_out = np.concatenate([[0], np.arange(1, d + 1), iu + 1])
        j_out = np.concatenate([[0], np.zeros(d, np.int64), ju + 1])
        g_out = np.concatenate([[t.num_rows], e.sum(axis=0),
                                (e.T @ e)[iu, ju]])
        return pa.table({"i": pa.array(i_out, pa.int64()),
                         "j": pa.array(j_out, pa.int64()),
                         "g": pa.array(g_out, pa.int64())})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["i", "j"]).aggregate(Sum("g", alias_name="g"))
            .take_all())  # bounded: ≤ 1 + d + d(d+1)/2 keys
    n = sum(int(r["g"]) for r in rows if r["i"] == 0 and r["j"] == 0)
    if n == 0:
        return pa.table({"vec_id": pa.array([], pa.int64())})
    d = max(int(r["i"]) for r in rows)
    s = np.zeros(d)
    G = np.zeros((d, d))
    for r in rows:
        i, j, g = int(r["i"]), int(r["j"]), int(r["g"])
        if i == 0:
            continue
        if j == 0:
            s[i - 1] = g
        else:
            G[i - 1, j - 1] = G[j - 1, i - 1] = g
    mean = s / 1e6 / n
    cov = G / 1e12 / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    W = evecs[:, ::-1][:, :n_components].copy()
    for c in range(W.shape[1]):  # sign convention: max-|w| positive
        if W[np.argmax(np.abs(W[:, c])), c] < 0:
            W[:, c] = -W[:, c]
    state = ray.put((mean, W))

    def project(t: pa.Table) -> pa.Table:
        cols = {"vec_id": t["vec_id"]}
        mu, w = ray.get(state)
        if t.num_rows:
            emb = t["embedding"].combine_chunks()
            flat = emb.flatten().to_numpy(zero_copy_only=False)
            e = np.floor(flat.astype(np.float64) * 1_000_000) / 1e6
            y = (e.reshape(t.num_rows, -1) - mu) @ w
        else:
            y = np.zeros((0, w.shape[1]))
        for c in range(w.shape[1]):
            cols[f"pc{c + 1}_e6"] = pa.array(
                np.round(y[:, c] * 1e6).astype(np.int64), pa.int64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def mmr_rerank_docs(sf_dir: str, k_cand: int = 40, k: int = 10,
                    n_queries: int = 4):
    """Maximal-Marginal-Relevance diversified retrieval (Carbonell &
    Goldstein SIGIR'98) — the de-dup re-rank RAG/retrieval stacks run
    so the top-k isn't k near-copies of one passage: greedily pick the
    candidate maximizing λ·relevance − (1−λ)·max-similarity-to-already-
    picked, λ=½ (integer form: rel_e6 − maxsim_e6, tie → min vec_id).
    Scale shape: the DISTRIBUTED part is the exact dense top-``k_cand``
    candidate pass (broadcast query matrix, per-batch partial top-k —
    the corpus is never shuffled); the greedy loop is inherently
    sequential but runs on the ≤ |Q|·k_cand candidate set, whose
    vectors arrive by a pushed-down ``isin`` read — never a corpus
    pull. Corpus = vec_id ≥ 16 (the decontam convention: low ids are
    the held-out query/eval set). Rows-only (iterative greedy);
    golden-pinned + independent-brute pytest."""
    import pyarrow.dataset as pds

    corpus = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filter=pds.field("vec_id") >= 16)
    queries = _query_vecs(sf_dir, n_queries)
    cand = F_ann.brute_force_topk(corpus, queries, k=k_cand).take_all()
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "vec_id": pa.array([], pa.int64()),
                      "rel_e6": pa.array([], pa.int64()),
                      "mmr_e6": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.int64())})
    if not cand:
        return empty
    need = sorted({int(r["vec_id"]) for r in cand})
    et = pa.concat_tables(
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"],
                        filter=pds.field("vec_id").isin(need))
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    unit = {int(i): (lambda v: v / np.linalg.norm(v))(
        np.asarray(v, np.float64))
        for i, v in zip(et["vec_id"].to_pylist(),
                        et["embedding"].to_pylist())}

    byq: dict[int, list] = {}
    for r in cand:
        byq.setdefault(int(r["query_id"]), []).append(
            (int(r["vec_id"]), int(r["score_e6"])))
    out = {c: [] for c in ("query_id", "vec_id", "rel_e6",
                           "mmr_e6", "rank")}
    for qid in sorted(byq):
        ids = np.array([v for v, _ in sorted(byq[qid])], np.int64)
        rel = np.array([s for _, s in sorted(byq[qid])], np.int64)
        m = np.stack([unit[int(v)] for v in ids])
        sim_e6 = np.round((m @ m.T) * 1e6).astype(np.int64)
        picked: list[int] = []
        maxsim = np.full(len(ids), np.iinfo(np.int64).min, np.int64)
        avail = np.ones(len(ids), bool)
        for rank in range(1, min(k, len(ids)) + 1):
            score = rel if not picked else rel - maxsim
            sc = np.where(avail, score, np.iinfo(np.int64).min)
            best = int(np.flatnonzero(sc == sc.max())[0])  # tie: min id
            out["query_id"].append(qid)
            out["vec_id"].append(int(ids[best]))
            out["rel_e6"].append(int(rel[best]))
            out["mmr_e6"].append(int(sc[best]) if picked
                                 else int(rel[best]))
            out["rank"].append(rank)
            avail[best] = False
            picked.append(best)
            maxsim = np.maximum(maxsim, sim_e6[best])
    return pa.table({c: pa.array(v, pa.int64()) for c, v in out.items()})


_LANG_PRIORITY = {"en": 0, "de": 1, "es": 2, "fr": 3, "zh": 4}


def priority_dedup_docs(sf_dir: str):
    """Exact dedup with a SOURCE-PRIORITY survivor rule — the
    Pile/Dolma convention that when the same text appears in multiple
    cuts, the highest-priority copy survives (here: language rank
    en<de<es<fr<zh, tie → min doc_id) rather than an arbitrary one.
    Same scale shape as ``dedup_exact_docs`` (hash-partitioned groupby
    on the content md5) with the survivor chosen by a packed-key
    native Min — priority·2⁴⁸ + doc_id, one int64, no map_groups
    (doc_id < 2⁴⁸ asserted; the ``first_last_order_per_customer``
    packing trick, mirrored exactly in the SQL)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def prep(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        assert did.size == 0 or int(did.max()) < (1 << 48)
        langs = t["lang"].to_pylist()
        prio = np.array([_LANG_PRIORITY.get(x, 9) for x in langs],
                        np.int64)
        ft = F_text.md5_fingerprint_batch(t)
        return pa.table({"fingerprint": ft["fingerprint"],
                         "packed": pa.array((prio << 48) + did,
                                            pa.int64())})

    from rendler_ray.functions.groupagg import sorted_group_agg

    win = sorted_group_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        "fingerprint", [("packed", "min", "packed")])

    def unpack(t: pa.Table) -> pa.Table:
        p = t["packed"].to_numpy(zero_copy_only=False)
        return pa.table({"fingerprint": t["fingerprint"],
                         "doc_id": pa.array(p & ((1 << 48) - 1),
                                            pa.int64()),
                         "lang_rank": pa.array(p >> 48, pa.int64())})

    return win.map_batches(unpack, batch_format="pyarrow")


PRIORITY_DEDUP_SQL = """
WITH p AS (SELECT md5(text) AS fingerprint,
                  CASE lang WHEN 'en' THEN 0 WHEN 'de' THEN 1
                            WHEN 'es' THEN 2 WHEN 'fr' THEN 3
                            WHEN 'zh' THEN 4 ELSE 9 END
                  * 281474976710656 + doc_id AS packed
           FROM documents),
w AS (SELECT fingerprint, min(packed) AS packed FROM p
      GROUP BY fingerprint)
SELECT fingerprint, packed % 281474976710656 AS doc_id,
       packed // 281474976710656 AS lang_rank
FROM w
"""


def source_token_concentration(sf_dir: str):
    """Training-mix concentration diagnostics: per-source token share
    and the Lorenz-curve cumulative share (sources ranked tokens-desc)
    — the table behind "the top 2 sources are 40% of the tokens"
    dataset-card lines and Gini-style mix audits. Scale shape: token
    counts fold per batch (one row per (batch, source)), the groupby
    moves O(batches·sources) rows, and the one-row-per-source result
    ranks on the driver. Shares are EXACT integer arithmetic
    (n·10⁹ // total — no float division crosses the engine boundary),
    matching the SQL's HUGEINT division exactly."""
    ds = _read(sf_dir, "documents", ["text", "source"])

    def counts(t: pa.Table) -> pa.Table:
        ntok = pc.add(pc.count_substring(t["text"], " "), 1)
        return (pa.table({"source": t["source"],
                          "n_tokens": pc.cast(ntok, pa.int64())})
                .group_by("source").aggregate([("n_tokens", "sum")])
                .rename_columns(["source", "n_tokens"]))

    per = (ds.map_batches(counts, batch_format="pyarrow")
           .groupby("source").aggregate(Sum("n_tokens",
                                            alias_name="n_tokens"))
           .take_all())  # bounded: one row per source
    if not per:
        return pa.table({"source": pa.array([], pa.string())})
    per.sort(key=lambda r: (-int(r["n_tokens"]), r["source"]))
    total = sum(int(r["n_tokens"]) for r in per)
    cum = 0
    rows = {c: [] for c in ("source", "n_tokens", "share_e9",
                            "cum_share_e9", "rank")}
    for rank, r in enumerate(per, 1):
        ntok = int(r["n_tokens"])
        cum += ntok
        rows["source"].append(r["source"])
        rows["n_tokens"].append(ntok)
        rows["share_e9"].append(ntok * 1_000_000_000 // total)
        rows["cum_share_e9"].append(cum * 1_000_000_000 // total)
        rows["rank"].append(rank)
    return pa.table({
        "source": pa.array(rows["source"], pa.string()),
        "n_tokens": pa.array(rows["n_tokens"], pa.int64()),
        "share_e9": pa.array(rows["share_e9"], pa.int64()),
        "cum_share_e9": pa.array(rows["cum_share_e9"], pa.int64()),
        "rank": pa.array(rows["rank"], pa.int64())})


SOURCE_TOKEN_CONC_SQL = """
WITH s AS (SELECT source,
                  CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                      AS n_tokens
           FROM documents GROUP BY source),
r AS (SELECT source, n_tokens,
             row_number() OVER (ORDER BY n_tokens DESC, source)
                 AS rank,
             CAST(sum(n_tokens) OVER () AS HUGEINT) AS total,
             CAST(sum(n_tokens) OVER (ORDER BY n_tokens DESC, source)
                  AS HUGEINT) AS cum
      FROM s)
SELECT source, n_tokens,
       CAST(CAST(n_tokens AS HUGEINT) * 1000000000 // total AS BIGINT)
           AS share_e9,
       CAST(cum * 1000000000 // total AS BIGINT) AS cum_share_e9,
       CAST(rank AS BIGINT) AS rank
FROM r
"""


def knn_graph_embeddings(sf_dir: str, k: int = 4):
    """EXACT cosine k-NN graph over the embedding table — the
    all-pairs primitive under SemDeDup clustering, graph-based dedup,
    UMAP-style layout and label propagation over embeddings. Blocked
    scan (``functions/ann.py::BlockKnnScan``): the corpus normalizes
    once into materialized Arrow blocks; each task holds one query
    block, streams the block list from plasma (stored once per node),
    and keeps a RUNNING top-k per row keyed by the total-order int64
    ``sim_e6·2³² − nbr_id`` — O(n²/p) work, O(block) memory, no
    shuffle. This is the exact baseline; IVF/LSH/PQ in-tree are the
    approximate paths past ~10⁷ vectors. Oracle: DuckDB cross join +
    window top-k, hash-exact (ties break on nbr_id in both)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return F_ann.knn_graph(ds, k=k)


def _knn_sql(k: int = 4) -> str:
    return f"""
WITH s AS (SELECT a.vec_id, b.vec_id AS nbr_id,
                  CAST(round(list_cosine_similarity(
                      CAST(a.embedding AS DOUBLE[]),
                      CAST(b.embedding AS DOUBLE[])) * 1000000)
                      AS BIGINT) AS sim_e6
           FROM embeddings a JOIN embeddings b
             ON a.vec_id != b.vec_id)
SELECT vec_id, nbr_id, sim_e6,
       row_number() OVER (PARTITION BY vec_id
                          ORDER BY sim_e6 DESC, nbr_id) AS rank
FROM s QUALIFY rank <= {k}
"""


KNN_GRAPH_SQL = _knn_sql()


def knn_graph_lsh_embeddings(sf_dir: str, k: int = 4, bits: int = 5):
    """APPROXIMATE kNN graph (the ``knn_graph_embeddings`` scale path):
    multi-probe random-hyperplane LSH buckets, exact cosine within the
    probed buckets only — candidate work is the probe fraction
    ((bits+1)/2^bits of all pairs), not O(n²). Uniform random vectors
    are the LSH worst case (no cluster structure); measured recall@4
    vs the exact graph at this corpus: 0.84 / 0.70 / 0.55 for
    bits = 4 / 5 / 6 — the recall↔work knob, pinned by a pytest at
    bits = 5. Emitted sims are true cosines (verified exact in tests);
    golden-pinned (deterministic: seeded planes)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return F_ann.knn_graph_lsh(ds, k=k, bits=bits)


def bitext_mine_pairs(sf_dir: str, k: int = 4, tau_pct: int = 105,
                      driver_max: int = 2_000_000):
    """Margin-based bitext/parallel-pair mining (Artetxe & Schwenk
    ACL'19, the LASER/CCMatrix shape): sides A = label < 5 and
    B = label ≥ 5 stand in for two languages; for each x the best
    CROSS-side neighbor y is kept iff the ratio margin
    2·cos(x,y) / (avgₖ(x) + avgₖ(y)) ≥ τ — neighbors that are close in
    absolute terms but not *relatively* closer than either side's
    local density are hubness artifacts, the failure mode raw cosine
    thresholds have in mined bitext. EXACT integer form: with sums
    sax = Σ top-k sim_e6(x), kx = |top-k(x)|, the test is
    100·(2·sim·kx·ky) ≥ τ%·(sax·ky + say·kx) — no float division
    crosses the engine boundary (the ``rrf`` rational convention);
    margins emit as (margin_num, margin_den).

    Scale shape: the cross-side exact k-NN graph (blocked scan, see
    ``knn_graph_embeddings``) feeds a groupby(vec_id) sum + two hash
    joins (best-edge ⋈ per-node sums) — all relational after the scan;
    at real scale the scan swaps for the in-tree IVF/LSH candidate
    paths, margins unchanged."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def sideify(t: pa.Table) -> pa.Table:
        lbl = t["label"].to_numpy(zero_copy_only=False)
        return pa.table({
            "vec_id": t["vec_id"], "embedding": t["embedding"],
            "side": pa.array((lbl >= 5).astype(np.int64), pa.int64())})

    knn = F_ann.knn_graph(ds.map_batches(sideify, batch_format="pyarrow"),
                          k=k, side_col="side").materialize()
    empty = pa.table({c: pa.array([], pa.int64())
                      for c in ("src_id", "dst_id", "sim_e6",
                                "margin_num", "margin_den")})
    nk = knn.count()
    if nk == 0:
        return empty
    if nk <= driver_max:
        # size-gated driver fold (the near-dup-chain pattern): the kNN
        # graph is n·k narrow int rows — below the gate the sums/best
        # joins collapse to one pandas pass instead of a groupby + two
        # hash joins (4.6 s → ~0.3 s of exchange overhead at sf0.1);
        # two-form equality is pytest-asserted
        t = pa.concat_tables(knn.iter_batches(batch_size=None,
                                              batch_format="pyarrow"))
        df = t.to_pandas()
        agg = df.groupby("vec_id")["sim_e6"].agg(["sum", "count"])
        ssum = agg["sum"].astype(np.int64)
        kn = agg["count"].astype(np.int64)
        best = df[df["rank"] == 1]
        x = best["vec_id"].to_numpy(np.int64)
        y = best["nbr_id"].to_numpy(np.int64)
        sim = best["sim_e6"].to_numpy(np.int64)
        sax, kx = ssum[x].to_numpy(), kn[x].to_numpy()
        say, ky = ssum[y].to_numpy(), kn[y].to_numpy()
        num = 2 * sim * kx * ky
        den = sax * ky + say * kx
        keep = (den > 0) & (100 * num >= tau_pct * den)
        return pa.table({
            "src_id": pa.array(x[keep], pa.int64()),
            "dst_id": pa.array(y[keep], pa.int64()),
            "sim_e6": pa.array(sim[keep], pa.int64()),
            "margin_num": pa.array(num[keep], pa.int64()),
            "margin_den": pa.array(den[keep], pa.int64())})
    sums = (knn.groupby("vec_id")
            .aggregate(Sum("sim_e6", alias_name="ssum"),
                       Count(alias_name="kn"))).materialize()
    best = knn.map_batches(
        lambda t: (lambda f: pa.table({"src_id": f["vec_id"],
                                       "dst_id": f["nbr_id"],
                                       "sim_e6": f["sim_e6"]}))(
            t.filter(pc.equal(t["rank"], 1))),
        batch_format="pyarrow")
    nparts = max(1, min(8, sums.count() // 4))
    j = best.join(sums, join_type="inner", num_partitions=nparts,
                  on=("src_id",), right_on=("vec_id",))
    j = j.join(sums, join_type="inner", num_partitions=nparts,
               on=("dst_id",), right_on=("vec_id",),
               right_suffix="_y")

    def margin(t: pa.Table, tau=tau_pct) -> pa.Table:
        sim = t["sim_e6"].to_numpy(zero_copy_only=False)
        sax = t["ssum"].to_numpy(zero_copy_only=False)
        kx = t["kn"].to_numpy(zero_copy_only=False)
        say = t["ssum_y"].to_numpy(zero_copy_only=False)
        ky = t["kn_y"].to_numpy(zero_copy_only=False)
        num = 2 * sim * kx * ky
        den = sax * ky + say * kx
        keep = (den > 0) & (100 * num >= tau * den)
        return pa.table({
            "src_id": pa.array(
                t["src_id"].to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
            "dst_id": pa.array(
                t["dst_id"].to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
            "sim_e6": pa.array(sim[keep], pa.int64()),
            "margin_num": pa.array(num[keep], pa.int64()),
            "margin_den": pa.array(den[keep], pa.int64())})

    return j.map_batches(margin, batch_format="pyarrow")


def _bitext_sql(k: int = 4, tau_pct: int = 105) -> str:
    return f"""
WITH s AS (SELECT a.vec_id AS x, b.vec_id AS y,
                  CAST(round(list_cosine_similarity(
                      CAST(a.embedding AS DOUBLE[]),
                      CAST(b.embedding AS DOUBLE[])) * 1000000)
                      AS BIGINT) AS sim
           FROM embeddings a JOIN embeddings b
             ON (a.label >= 5) != (b.label >= 5)),
r AS (SELECT x, y, sim, row_number() OVER (PARTITION BY x
                                           ORDER BY sim DESC, y) AS rnk
      FROM s),
kk AS (SELECT * FROM r WHERE rnk <= {k}),
agg AS (SELECT x, CAST(sum(sim) AS BIGINT) AS ssum,
               CAST(count(*) AS BIGINT) AS kn
        FROM kk GROUP BY x),
best AS (SELECT x, y, sim FROM kk WHERE rnk = 1)
SELECT b.x AS src_id, b.y AS dst_id, b.sim AS sim_e6,
       2 * b.sim * ax.kn * ay.kn AS margin_num,
       ax.ssum * ay.kn + ay.ssum * ax.kn AS margin_den
FROM best b JOIN agg ax ON ax.x = b.x JOIN agg ay ON ay.x = b.y
WHERE ax.ssum * ay.kn + ay.ssum * ax.kn > 0
  AND 100 * (2 * b.sim * ax.kn * ay.kn)
      >= {tau_pct} * (ax.ssum * ay.kn + ay.ssum * ax.kn)
"""


BITEXT_SQL = _bitext_sql()
