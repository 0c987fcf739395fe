

def source_percentile_scores(sf_dir: str):
    """Per-source PERCENTILE normalization of classifier scores — the
    cross-source calibration step before a global quality cut (raw
    fastText scores aren't comparable across domains; CCNet/FineWeb
    filter per-source). Exact percent-rank WITHOUT per-group sorts or
    group materialization: the same shuffle-free scoring pass as
    ``classifier_score_docs``, ONE global range-partitioned sort on
    (source, clf_score, doc_id) with a distributed zip-with-index
    (``with_row_seq`` — block counts from metadata), and a
    one-row-per-source offset table folded on the driver and broadcast
    into a stateless finisher. Percentiles are exact integers
    ((rank−1)·10⁹ // (n−1), the HUGEINT-division convention), so the
    SQL window oracle is hash-exact."""
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
            "clf_score": pa.array(np.rint(s).astype(np.int64),
                                  pa.int64())})

    # materialized: consumed twice (rank sort + per-source counts) —
    # without it the text read + scoring pass would execute twice
    keyed = ds.map_batches(score, batch_format="pyarrow").materialize()
    ranked = with_row_seq(keyed, ["source", "clf_score", "doc_id"],
                          start=1, column="grank")
    counts = (keyed.groupby("source").aggregate(Count(alias_name="n"))
              .take_all())  # bounded: one row per source
    counts.sort(key=lambda r: r["source"])  # with_row_seq's sort order
    offs, ns, cum = {}, {}, 0
    for r in counts:
        offs[r["source"]] = cum
        ns[r["source"]] = int(r["n"])
        cum += int(r["n"])
    state = ray.put((offs, ns))

    def finish(t: pa.Table) -> pa.Table:
        o, n = ray.get(state)
        srcs = t["source"].to_pylist()
        g = t["grank"].to_numpy(zero_copy_only=False)
        off = np.array([o[s] for s in srcs], np.int64)
        nn = np.array([n[s] for s in srcs], np.int64)
        rank = g - off
        pctl = np.where(nn > 1, (rank - 1) * 1_000_000_000
                        // np.maximum(nn - 1, 1), 0)
        return pa.table({
            "doc_id": t["doc_id"], "source": t["source"],
            "clf_score": t["clf_score"],
            "src_rank": pa.array(rank, pa.int64()),
            "pctl_e9": pa.array(pctl, pa.int64())})

    return ranked.map_batches(finish, batch_format="pyarrow")


SOURCE_PCTL_SQL = """
WITH tok AS (SELECT doc_id, source,
                    unnest(string_split(text, ' ')) AS token
             FROM documents),
s AS (SELECT doc_id, source,
             CAST(sum((CAST('0x' || substr(md5(token), 1, 15) AS BIGINT)
                       % 1001) - 500) AS BIGINT) AS clf_score
      FROM tok GROUP BY doc_id, source)
SELECT doc_id, source, clf_score,
       row_number() OVER (PARTITION BY source
                          ORDER BY clf_score, doc_id) AS src_rank,
       CASE WHEN count(*) OVER (PARTITION BY source) > 1
            THEN CAST(CAST(row_number() OVER (PARTITION BY source
                               ORDER BY clf_score, doc_id) - 1
                           AS HUGEINT) * 1000000000
                      // (count(*) OVER (PARTITION BY source) - 1)
                      AS BIGINT)
            ELSE 0 END AS pctl_e9
FROM s
"""


def label_centroids_embeddings(sf_dir: str):
    """Grouped VECTOR aggregation: per-label embedding centroid — the
    domain/class profile vector behind IVF list seeding, per-domain
    drift monitoring, and prototype ("nearest-centroid") classifiers.
    Scale shape: each batch emits one partial-sum row per (label, dim)
    present in it (values floor to 1e-6 fixed point — the gram-matrix
    convention — so sums are EXACT integers), the groupby moves
    O(batches·labels·dims) rows, and the centroid division is exact
    integer floor on both sides (sum·1 // n in 1e-6 units). Output:
    (label, i, centroid_e6, n) — one row per label-dimension."""
    ds = _read(sf_dir, "embeddings", ["embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "i": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        emb = t["embedding"].combine_chunks()
        d = pc.list_value_length(emb)[0].as_py()
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        e = np.floor(flat.astype(np.float64) * 1_000_000).astype(
            np.int64).reshape(len(emb), d)
        lbl = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        ulbl, inv = np.unique(lbl, return_inverse=True)
        sums = np.zeros((len(ulbl), d), np.int64)
        np.add.at(sums, inv, e)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(ulbl, d), pa.int64()),
            "i": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                  len(ulbl)), pa.int64()),
            "s": pa.array(sums.ravel(), pa.int64()),
            "n": pa.array(np.repeat(cnt, d), pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["label", "i"])
           .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n")))

    def finish(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False)
        n = np.maximum(t["n"].to_numpy(zero_copy_only=False), 1)
        # DuckDB // TRUNCATES toward zero (-7//2 = -3) where numpy
        # floors (-4): truncate explicitly so negative sums agree
        cen = np.where(s >= 0, s // n, -((-s) // n))
        return pa.table({"label": t["label"], "i": t["i"],
                         "centroid_e6": pa.array(cen, pa.int64()),
                         "n": t["n"]})

    return agg.map_batches(finish, batch_format="pyarrow")


LABEL_CENTROIDS_SQL = """
WITH e AS (SELECT label, generate_subscripts(embedding, 1) AS i,
                  CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                             * 1000000) AS BIGINT) AS f
           FROM embeddings)
SELECT CAST(label AS BIGINT) AS label, i,
       CAST(sum(f) // count(*) AS BIGINT) AS centroid_e6,
       CAST(count(*) AS BIGINT) AS n
FROM e GROUP BY label, i
"""


# ---------------------------------------------- round-4f op families


def vocab_growth_curve(sf_dir: str, n_buckets: int = 10):
    """Heaps-law vocabulary-growth curve — the dataset-card statistic
    behind "how much NEW vocabulary does each additional corpus slice
    contribute" (sublinear growth is the empirical Heaps/Herdan law;
    a flat tail means the corpus has saturated its domain): documents
    are split into ``n_buckets`` equal slices by doc_id order (SQL
    NTILE semantics: the first n mod k slices take the extra row) and
    each token is charged to the slice of its FIRST occurrence
    (min doc_id). Output: (bucket, new_tokens, vocab_cum) — all
    integers, hash-exact vs the SQL oracle; buckets contributing no
    new tokens are omitted on both sides.

    Scale shape: the bucket boundaries (doc_id value at each slice's
    end RANK) come from the shared ``_grouped_value_bisect`` engine —
    exact order statistics in ~2 streaming passes over the doc_id
    column, O(n_buckets) driver state, no global sort. Token first
    occurrences use the dup_span treatment: token STRINGS never leave
    the explode task (128-bit hash = two independently-keyed SipHash64
    halves), the exchange carries (h1, h2, min-doc partials) — one
    row per DISTINCT token per batch, not per instance — and the final
    fold is groupby(bucket).count over ≤ n_buckets keys. Collision
    odds ≈ vocab²/2^129 (see dup_span_stats_docs)."""
    import pandas.util as pdu

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()
    empty = pa.table({"bucket": pa.array([], pa.int64()),
                      "new_tokens": pa.array([], pa.int64()),
                      "vocab_cum": pa.array([], pa.int64())})
    if n_docs == 0:
        return empty

    ids = ds.select_columns(["doc_id"])
    agg = ids.aggregate(Min("doc_id", alias_name="lo"),
                        Max("doc_id", alias_name="hi"))
    lo, hi = int(agg["lo"]), int(agg["hi"])
    q, r = divmod(n_docs, n_buckets)
    # bucket i's END rank under NTILE sizing (1-based, ascending)
    state = {("all", i): [lo, hi, i * q + min(i, r)]
             for i in range(1, n_buckets + 1)}
    scored = ids.map_batches(
        lambda t: t.append_column(
            "g", pa.array(["all"] * t.num_rows, pa.string())),
        batch_format="pyarrow")
    sel = _grouped_value_bisect(scored, "g", "doc_id", state)
    bounds = np.array([sel[("all", i)]
                       for i in range(1, n_buckets + 1)], dtype=np.int64)

    def first_doc(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(
            zero_copy_only=False).astype(object)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        d = t["doc_id"].to_numpy(zero_copy_only=False)[par]
        h1 = pdu.hash_array(flat, categorize=False).view(np.int64)
        h2 = pdu.hash_array(flat, hash_key="rendlervocabgr2!",
                            categorize=False).view(np.int64)
        g = (pd.DataFrame({"h1": h1, "h2": h2, "fd": d})
             .groupby(["h1", "h2"], sort=False)["fd"].min().reset_index())
        return pa.table({
            "h1": pa.array(g["h1"].to_numpy(np.int64), pa.int64()),
            "h2": pa.array(g["h2"].to_numpy(np.int64), pa.int64()),
            "fd": pa.array(g["fd"].to_numpy(np.int64), pa.int64())})

    firsts = (ds.map_batches(first_doc, batch_format="pyarrow")
              .groupby(["h1", "h2"]).aggregate(Min("fd", alias_name="fd")))
    bref = ray.put(bounds)

    def to_bucket(t: pa.Table) -> pa.Table:
        fd = t["fd"].to_numpy(zero_copy_only=False)
        b = np.searchsorted(ray.get(bref), fd, side="left") + 1
        return pa.table({"bucket": pa.array(b.astype(np.int64))})

    per_b = (firsts.map_batches(to_bucket, batch_format="pyarrow")
             .groupby("bucket").aggregate(Count(alias_name="new_tokens"))
             .take_all())  # ≤ n_buckets rows
    per_b.sort(key=lambda x: x["bucket"])
    cum = np.cumsum([int(x["new_tokens"]) for x in per_b])
    if len(per_b) == 0:
        return empty
    return pa.table({
        "bucket": pa.array([int(x["bucket"]) for x in per_b], pa.int64()),
        "new_tokens": pa.array([int(x["new_tokens"]) for x in per_b],
                               pa.int64()),
        "vocab_cum": pa.array(cum.astype(np.int64), pa.int64())})


VOCAB_GROWTH_SQL = """
WITH nt AS (
  SELECT doc_id, ntile(10) OVER (ORDER BY doc_id) AS bucket
  FROM documents
), tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), first AS (
  SELECT token, min(doc_id) AS fd FROM tok GROUP BY token
), fb AS (
  SELECT f.token, nt.bucket FROM first f JOIN nt ON nt.doc_id = f.fd
), nb AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS new_tokens
  FROM fb GROUP BY bucket
)
SELECT CAST(bucket AS BIGINT) AS bucket, new_tokens,
       CAST(sum(new_tokens) OVER (ORDER BY bucket) AS BIGINT) AS vocab_cum
FROM nb ORDER BY bucket
"""


def _token_freq_topk_counts(ds, k: int, driver_max: int = 2_000_000):
    """Top-``k`` (token, count) pairs of a (…, text) Dataset by
    (freq desc, token asc) — the vocabulary cut shared by
    oov_rate_docs / nb_lang_fit_predict / zipf_fit_tokens. Per-batch
    value_counts partials stream to the driver and fold through
    Arrow's C++ hash aggregate while the partial-row total stays
    ≤ ``driver_max`` (zero shuffles — a distributed sort+limit of a
    vocab-sized table costs ~4 s of pure exchange fixed costs at 32
    cpus, the ccnet/tfidf finding); past the gate it falls back to
    the distributed groupby + sort + limit with identical output
    (two-form equality pytest-asserted)."""
    def tok_counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(t["text"].combine_chunks(), " "))
        vc = pd.Series(toks.to_numpy(zero_copy_only=False)) \
            .value_counts(sort=False)
        return pa.table({
            "token": pa.array(vc.index.tolist(), pa.string()),
            "c": pa.array(vc.to_numpy(np.int64))})

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
            return []
        t = pa.concat_tables(tables).group_by("token") \
            .aggregate([("c", "sum")]).rename_columns(["token", "c"])
        df = t.to_pandas().sort_values(["c", "token"],
                                       ascending=[False, True]).head(k)
        return list(zip(df["token"].tolist(),
                        (int(v) for v in df["c"].tolist())))
    freq = partials.groupby("token").aggregate(Sum("c", alias_name="c"))
    top = freq.sort(["c", "token"], descending=[True, False]) \
        .limit(k).take_all()
    return [(x["token"], int(x["c"])) for x in top]


def _token_freq_topk(ds, k: int, driver_max: int = 2_000_000):
    """Token names only — see :func:`_token_freq_topk_counts`."""
    return [t for t, _ in _token_freq_topk_counts(ds, k, driver_max)]


def _round_half_away(x: "np.ndarray") -> "np.ndarray":
    """DuckDB ``round()``'s half-away-from-zero rule as int64 (np.rint
    rounds half-to-even — a silent oracle mismatch at exact halves)."""
    return np.where(x >= 0, np.floor(x + 0.5),
                    np.ceil(x - 0.5)).astype(np.int64)


def nb_lang_fit_predict(sf_dir: str, vocab_k: int = 2000,
                        fit_driver_max: int = 4_000_000):
    """Supervised Naive-Bayes language-classifier FIT + inference, both
    on-cluster — the fastText-lite train/apply loop a data pipeline
    runs to replace a heuristic lang-ID with a corpus-fitted one
    (McCallum & Nigam AAAI'98 multinomial NB). Train split = docs with
    doc_id % 10 != 0, test = the rest; features = the train corpus's
    top-``vocab_k`` tokens (freq desc, token asc — the oov_rate_docs
    cut); Laplace-smoothed log-likelihood weights and log-priors are
    fixed-pointed at e6 ONCE on the bounded weight table, so scoring
    is pure int64 accumulation — block-order-invariant, and the SQL
    oracle (same expression tree: ln((c+1)/(tot+V)) then round) is
    hash-exact. Output: (doc_id, pred_lang, true_lang, correct).

    Scale shape: the fit's shuffles carry per-batch-combined
    (lang, token, count) partials bounded by langs × vocab_k per batch
    — never token instances; the fitted model (weight matrix
    vocab_k × langs + priors) is a broadcast-sized artifact BY
    DEFINITION and ships once via ``ray.put``; inference is a
    shuffle-free map pass (per-batch np.bincount per lang). Integer
    scores stay < 2^53 (|w| ≤ ~2e7 × tokens/doc), asserted."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def _split(is_train: bool):
        def fn(t: pa.Table) -> pa.Table:
            m = (t["doc_id"].to_numpy(zero_copy_only=False) % 10) != 0
            return t.filter(pa.array(m if is_train else ~m))
        return fn

    train = ds.map_batches(_split(True), batch_format="pyarrow")
    test = ds.map_batches(_split(False), batch_format="pyarrow")

    # ---- ONE fused fit pass: per-(lang, token) counts over ALL train
    # tokens + per-lang DOC counts as sentinel rows (tokens never
    # contain a space, so " " marks the doc-count row — the bm25
    # trick). Partials stream to the driver and fold through Arrow's
    # C++ hash aggregate while the row total stays under the gate —
    # the vocabulary is then the TOKEN MARGINAL's top-K (identical to
    # a separate frequency pass) and the model restricts to it. Past
    # the gate: two distributed passes (vocab cut, then
    # vocab-restricted count groupby) with identical output.
    def lang_tok_all(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        langs = t["lang"].to_numpy(zero_copy_only=False)[par]
        g = (pd.DataFrame({"lang": langs, "token": flat})
             .groupby(["lang", "token"], sort=False).size()
             .reset_index(name="c"))
        docs = (pd.Series(t["lang"].to_numpy(zero_copy_only=False))
                .value_counts(sort=False))
        return pa.table({
            "lang": pa.array(g["lang"].tolist() + docs.index.tolist(),
                             pa.string()),
            "token": pa.array(g["token"].tolist() + [" "] * len(docs),
                              pa.string()),
            "c": pa.array(np.concatenate(
                [g["c"].to_numpy(np.int64),
                 docs.to_numpy(np.int64)]))})

    fparts = train.map_batches(lang_tok_all, batch_format="pyarrow")
    tables, nrows, over = [], 0, False
    for b in fparts.iter_batches(batch_size=None,
                                 batch_format="pyarrow"):
        tables.append(b)
        nrows += b.num_rows
        if nrows > fit_driver_max:
            over = True
            break
    if not over:
        if nrows == 0:
            fused = []
            vocab = []
        else:
            ft = pa.concat_tables(tables).group_by(
                ["lang", "token"]).aggregate([("c", "sum")]) \
                .rename_columns(["lang", "token", "c"])
            marg = (ft.filter(pc.not_equal(ft["token"], " "))
                    .group_by("token").aggregate([("c", "sum")])
                    .rename_columns(["token", "c"]).to_pandas()
                    .sort_values(["c", "token"],
                                 ascending=[False, True]))
            vocab = marg["token"].head(vocab_k).tolist()
            fused = ft.to_pylist()
    else:
        vocab = _token_freq_topk(train, vocab_k)
        vs_ref = ray.put(frozenset(vocab))

        def lang_tok(t: pa.Table) -> pa.Table:
            full = lang_tok_all(t)
            keep = pd.Series(
                full["token"].to_numpy(zero_copy_only=False)).isin(
                ray.get(vs_ref)).to_numpy() | pc.equal(
                full["token"], " ").to_numpy(zero_copy_only=False)
            return full.filter(pa.array(keep))

        fused = (train.map_batches(lang_tok, batch_format="pyarrow")
                 .groupby(["lang", "token"])
                 .aggregate(Sum("c", alias_name="c"))
                 .take_all())  # ≤ langs × (vocab_k + 1) rows
    vset = frozenset(vocab)
    tok_idx = {tok: i for i, tok in enumerate(vocab)}
    V = len(vocab)
    vref = ray.put((vset, tok_idx))
    cnt = [x for x in fused if x["token"] in vset]
    priors_rows = [{"lang": x["lang"], "n": x["c"]}
                   for x in fused if x["token"] == " "]
    n_train = sum(int(x["n"]) for x in priors_rows)
    langs = sorted(x["lang"] for x in priors_rows)
    L = len(langs)
    lidx = {lg: i for i, lg in enumerate(langs)}
    if n_train == 0 or V == 0 or L == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "pred_lang": pa.array([], pa.string()),
                         "true_lang": pa.array([], pa.string()),
                         "correct": pa.array([], pa.int64())})

    C = np.zeros((V, L), dtype=np.int64)
    for x in cnt:
        C[tok_idx[x["token"]], lidx[x["lang"]]] = int(x["c"])
    tot = C.sum(axis=0)
    W = _round_half_away(1e6 * np.log((C + 1.0) / (tot + V)))
    prior = _round_half_away(1e6 * np.log(np.array(
        [int(x["n"]) for x in sorted(priors_rows,
                                     key=lambda x: x["lang"])],
        dtype=np.float64) / n_train))
    # int64 exactness bound: bincount sums in float64; |w|·tokens/doc
    # must stay < 2^53 for the cast back to be exact
    assert np.abs(W).max(initial=0) < (1 << 26)
    mref = ray.put((W, prior))

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        _, tix = ray.get(vref)
        Wm, pr = ray.get(mref)
        idx = pd.Series(flat).map(tix)
        valid = idx.notna().to_numpy()
        iv = idx.to_numpy()[valid].astype(np.int64)
        rows = par[valid]
        n = t.num_rows
        S = np.empty((n, L), dtype=np.int64)
        for li in range(L):
            S[:, li] = pr[li] + np.bincount(
                rows, weights=Wm[iv, li], minlength=n).astype(np.int64)
        pred = np.argmax(S, axis=1)  # ties → first = lang asc
        pl = np.array(langs, dtype=object)[pred]
        tl = t["lang"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "pred_lang": pa.array(pl, pa.string()),
            "true_lang": pa.array(tl, pa.string()),
            "correct": pa.array((pl == tl).astype(np.int64))})

    return test.map_batches(score, batch_format="pyarrow")


NB_LANG_SQL = """
WITH train AS (SELECT * FROM documents WHERE doc_id % 10 <> 0),
test AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
  FROM train
), freq AS (
  SELECT token, count(*) AS c FROM tok GROUP BY token
), vocab AS (
  SELECT token FROM freq ORDER BY c DESC, token LIMIT 2000
), nv AS (SELECT count(*) AS v FROM vocab),
cnt AS (
  SELECT t.lang, t.token, CAST(count(*) AS BIGINT) AS c
  FROM tok t JOIN vocab USING (token) GROUP BY t.lang, t.token
), tot AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS tot FROM cnt GROUP BY lang
), langs AS (SELECT DISTINCT lang FROM train),
prior AS (
  SELECT lang,
         CAST(round(1000000 * ln(CAST(count(*) AS DOUBLE)
                                 / (SELECT count(*) FROM train)))
              AS BIGINT) AS pw
  FROM train GROUP BY lang
), w AS (
  SELECT l.lang, v.token,
         CAST(round(1000000 * ln(
             (COALESCE(c.c, 0) + 1.0)
             / (COALESCE(t.tot, 0) + (SELECT v FROM nv))))
              AS BIGINT) AS w
  FROM langs l CROSS JOIN vocab v
  LEFT JOIN tot t ON t.lang = l.lang
  LEFT JOIN cnt c ON c.lang = l.lang AND c.token = v.token
), ttok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM test
), dsc AS (
  SELECT tt.doc_id, w.lang, CAST(sum(w.w) AS BIGINT) AS sw
  FROM ttok tt JOIN w ON w.token = tt.token
  GROUP BY tt.doc_id, w.lang
), full_s AS (
  SELECT d.doc_id, l.lang, p.pw + COALESCE(dsc.sw, 0) AS s
  FROM test d CROSS JOIN langs l
  JOIN prior p ON p.lang = l.lang
  LEFT JOIN dsc ON dsc.doc_id = d.doc_id AND dsc.lang = l.lang
), pred AS (
  SELECT doc_id, lang AS pred_lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY s DESC, lang ASC) AS rn
  FROM full_s
)
SELECT p.doc_id, p.pred_lang, d.lang AS true_lang,
       CAST(CASE WHEN p.pred_lang = d.lang THEN 1 ELSE 0 END AS BIGINT)
         AS correct
FROM pred p JOIN test d USING (doc_id) WHERE rn = 1
"""


def shard_balance_plan(sf_dir: str, n_shards: int = 8):
    """Balanced training-shard assignment: pack each SOURCE's token
    mass into ``n_shards`` output shards by greedy LPT (longest
    processing time first — Graham'69, max-load ≤ (4/3 − 1/(3k))·OPT),
    the plan a sharded export follows so no trainer data-loader rank
    starves. Deterministic: sources sorted (tokens desc, source asc),
    each assigned to the least-loaded shard (tie: lowest shard id).
    Output (source, n_tokens, shard) — rows-only (the greedy recurrence
    is sequential, not SQL-expressible), golden-pinned + LPT-bound
    property pytest.

    Scale shape: the per-source token table is O(sources) driver state
    (a shard plan IS a per-source table — same argument as
    temperature_mix_docs); the corpus-wide token count pass is one
    shuffle-free map + a bounded groupby."""
    import heapq

    ds = _read(sf_dir, "documents", ["source", "text"])

    def ntok(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(
            pc.split_pattern(t["text"], " ")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        g = (pd.DataFrame({"source": t["source"].to_numpy(
            zero_copy_only=False), "n": n})
            .groupby("source", sort=False)["n"].sum().reset_index())
        return pa.table({
            "source": pa.array(g["source"].tolist(), pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64))})

    per_src = (ds.map_batches(ntok, batch_format="pyarrow")
               .groupby("source").aggregate(Sum("n", alias_name="n"))
               .take_all())  # O(sources)
    order = sorted(per_src, key=lambda x: (-int(x["n"]), x["source"]))
    heap = [(0, s) for s in range(n_shards)]
    heapq.heapify(heap)
    srcs, toks, shards = [], [], []
    for x in order:
        load, sid = heapq.heappop(heap)
        srcs.append(x["source"])
        toks.append(int(x["n"]))
        shards.append(sid)
        heapq.heappush(heap, (load + int(x["n"]), sid))
    return pa.table({"source": pa.array(srcs, pa.string()),
                     "n_tokens": pa.array(toks, pa.int64()),
                     "shard": pa.array(shards, pa.int64())})


def scc_crawl_graph(sf_dir: str):
    """Strongly connected components of the crawl's DIRECTED edge table
    — the bow-tie decomposition question (Broder WWW'00: giant SCC vs
    IN/OUT tendrils) that undirected CC cannot answer; a crawl
    scheduler reads it as "which pages are mutually reachable link
    neighborhoods". Runs the size-gated form
    (functions/graph.py::scc_auto): one-pass driver Tarjan under the
    gate, distributed trim + forward-backward coloring rounds above it
    (two-form equality pytest-asserted). ``scc`` = lexicographic min
    member url. Rows-only (iterative), golden-pinned."""
    from rendler_ray.functions.graph import scc_auto
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=4))
    return scc_auto(res.edges)


def ols_chars_tokens_by_source(sf_dir: str):
    """Per-source ordinary-least-squares fit of token count on char
    count — the distributed "fit a model on-cluster" stats-pass shape
    (the PCA sibling, 1-D): slope/intercept from the five classic
    integer moment sums (n, Σx, Σy, Σxy, Σx²), accumulated as
    per-batch int64 partials and folded through one bounded
    groupby(source). The driver solve uses PYTHON ints (arbitrary
    precision) for n·Σxy − Σx·Σy — the SQL mirror gets the same
    exactness from DuckDB's HUGEINT sums — so the only floats are the
    two final divisions, fixed-pointed at e6 on an identical
    expression tree (hash-exact oracle). Degenerate sources (constant
    x) take slope 0 and the mean intercept, both sides."""
    ds = _read(sf_dir, "documents", ["source", "n_chars", "text"])

    def partial(t: pa.Table) -> pa.Table:
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = pc.list_value_length(
            pc.split_pattern(t["text"], " ")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        g = (pd.DataFrame({
            "source": t["source"].to_numpy(zero_copy_only=False),
            "n": 1, "sx": x, "sy": y, "sxy": x * y, "sxx": x * x})
            .groupby("source", sort=False).sum().reset_index())
        return pa.table({
            "source": pa.array(g["source"].tolist(), pa.string()),
            **{c: pa.array(g[c].to_numpy(np.int64))
               for c in ("n", "sx", "sy", "sxy", "sxx")}})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sx", alias_name="sx"),
                       Sum("sy", alias_name="sy"),
                       Sum("sxy", alias_name="sxy"),
                       Sum("sxx", alias_name="sxx"))
            .take_all())  # O(sources)
    srcs, ns, slopes, icepts = [], [], [], []
    for x in sorted(rows, key=lambda r: r["source"]):
        n, sx, sy = int(x["n"]), int(x["sx"]), int(x["sy"])
        sxy, sxx = int(x["sxy"]), int(x["sxx"])
        den = n * sxx - sx * sx  # exact Python ints (no int64 bound)
        slope = 0.0 if den == 0 else float(n * sxy - sx * sy) / float(den)
        icept = (float(sy) - slope * float(sx)) / n
        srcs.append(x["source"])
        ns.append(n)
        slopes.append(int(_round_half_away(np.float64(1e6 * slope))))
        icepts.append(int(_round_half_away(np.float64(1e6 * icept))))
    return pa.table({"source": pa.array(srcs, pa.string()),
                     "n": pa.array(ns, pa.int64()),
                     "slope_e6": pa.array(slopes, pa.int64()),
                     "intercept_e6": pa.array(icepts, pa.int64())})


OLS_CHARS_TOKENS_SQL = """
WITH s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(n_chars AS BIGINT)) AS sx,
         sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS sy,
         sum(CAST(n_chars AS BIGINT)
             * CAST(len(string_split(text, ' ')) AS BIGINT)) AS sxy,
         sum(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT)) AS sxx
  FROM documents GROUP BY source
), t AS (
  SELECT source, n, sx, sy,
         CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
              ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope
  FROM s
)
SELECT source, n,
       CAST(round(1000000 * slope) AS BIGINT) AS slope_e6,
       CAST(round(1000000 * ((CAST(sy AS DOUBLE)
                              - slope * CAST(sx AS DOUBLE)) / n))
            AS BIGINT) AS intercept_e6
FROM t
"""


def normalize_text_docs(sf_dir: str):
    """Canonical text normalization (the pre-dedup cleaning staple:
    lowercase → strip non-alphanumerics → collapse runs of spaces →
    trim) as ONE shuffle-free vectorized pass — Arrow's RE2 kernels
    (``utf8_lower`` + two ``replace_substring_regex``) per batch, no
    Python in the string path except the md5 content-hash fold (the
    scrub_url_tokens convention). Output (doc_id, n_chars_norm,
    norm_md5) — md5 makes the full normalized TEXT hash-comparable
    against DuckDB's identical lower/regexp_replace/trim tree without
    shipping it."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        s = pc.utf8_lower(t["text"].combine_chunks())
        s = pc.replace_substring_regex(s, "[^a-z0-9 ]", "")
        s = pc.replace_substring_regex(s, " +", " ")
        s = pc.utf8_trim(s, " ")
        md5s = [hashlib.md5(x.encode()).hexdigest()
                for x in s.to_pylist()]
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars_norm": pc.cast(pc.utf8_length(s), pa.int64()),
            "norm_md5": pa.array(md5s, pa.string())})

    return ds.map_batches(norm, batch_format="pyarrow")


NORMALIZE_TEXT_SQL = """
SELECT doc_id, CAST(length(n) AS BIGINT) AS n_chars_norm,
       md5(n) AS norm_md5
FROM (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS n
  FROM documents)
"""


def ndcg_bm25_eval(sf_dir: str, k: int = 10):
    """Ranking-quality evaluation of the BM25 retriever: NDCG@k per
    query (Järvelin & Kekäläinen TOIS'02) against a term-overlap
    relevance oracle (rel(doc, q) = number of q's terms present — the
    graded label a lexical eval harness derives when no human
    judgments exist). Integer-exact: every DCG addend is fixed-pointed
    at e6 BEFORE the sum (round(1e6·rel/log2(rank+1)) as int64), so
    the per-query DCG/IDCG are order-free integer sums and the single
    final NDCG division is one shared float expression — hash-exact vs
    SQL.

    Scale shape: the ranking is the shuffle-free BM25 pass
    (bm25_search_docs); relevance COUNTS per (query, grade) come from
    one more corpus map pass with ≤ |Q|·grades rows of partials (IDCG
    needs only the grade multiset, never doc identity); the ≤ |Q|·k
    ranked docs' relevance comes from a pushed-down ``isin`` read of
    exactly those doc_ids. Driver state: O(|Q|·k)."""
    import math

    import pyarrow.dataset as pds

    ranked = bm25_search_docs(sf_dir, k=k).take_all()
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "dcg_e6": pa.array([], pa.int64()),
                      "idcg_e6": pa.array([], pa.int64()),
                      "ndcg_e6": pa.array([], pa.int64())})
    if not ranked:
        return empty
    terms_by_q = {q: list(ts) for q, ts in _BM25_QUERIES.items()}

    # per-(query, grade) doc counts — IDCG needs only the multiset
    def rel_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nr = t.num_rows
        out_q, out_r, out_c = [], [], []
        present = {}
        for term in {tt for ts in terms_by_q.values() for tt in ts}:
            v = np.zeros(nr, dtype=np.int64)
            v[np.unique(par[flat == term])] = 1
            present[term] = v
        for qid, ts in terms_by_q.items():
            rel = np.sum([present[term] for term in ts], axis=0)
            for grade in range(1, len(ts) + 1):
                out_q.append(qid)
                out_r.append(grade)
                out_c.append(int((rel == grade).sum()))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "rel": pa.array(out_r, pa.int64()),
                         "c": pa.array(out_c, pa.int64())})

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    gc: dict[tuple[int, int], int] = {}
    for x in (ds.map_batches(rel_counts, batch_format="pyarrow")
              .groupby(["query_id", "rel"])
              .aggregate(Sum("c", alias_name="c")).take_all()):
        gc[(int(x["query_id"]), int(x["rel"]))] = int(x["c"])

    # relevance of the ≤ |Q|·k ranked docs: pushed-down isin read
    need = sorted({int(x["doc_id"]) for x in ranked})
    tt = pa.concat_tables(
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"],
                        filter=pds.field("doc_id").isin(need))
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    toks_of = {int(i): set(s.split(" "))
               for i, s in zip(tt["doc_id"].to_pylist(),
                               tt["text"].to_pylist())}

    def addend(rel: int, pos: int) -> int:
        return int(_round_half_away(np.float64(
            (1000000 * rel) / math.log2(pos + 1))))

    byq: dict[int, list] = {}
    for x in ranked:
        byq.setdefault(int(x["query_id"]), []).append(
            (int(x["rank"]), int(x["doc_id"])))
    out_q, out_d, out_i, out_n = [], [], [], []
    for qid in sorted(byq):
        ts = terms_by_q[qid]
        dcg = sum(addend(
            sum(1 for term in ts if term in toks_of[did]), pos)
            for pos, did in sorted(byq[qid]))
        grades: list[int] = []
        for grade in range(len(ts), 0, -1):
            grades.extend([grade] * gc.get((qid, grade), 0))
        idcg = sum(addend(g, pos)
                   for pos, g in enumerate(grades[:k], 1))
        ndcg = 0 if idcg == 0 else int(_round_half_away(
            np.float64(1000000 * (float(dcg) / float(idcg)))))
        out_q.append(qid)
        out_d.append(dcg)
        out_i.append(idcg)
        out_n.append(ndcg)
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "dcg_e6": pa.array(out_d, pa.int64()),
                     "idcg_e6": pa.array(out_i, pa.int64()),
                     "ndcg_e6": pa.array(out_n, pa.int64())})


def _ndcg_sql(k: int = 10) -> str:
    return f"""{_bm25_cte()},
rel AS (SELECT doc_id, query_id,
               CAST(sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS rel
        FROM tf GROUP BY doc_id, query_id),
ranked AS (SELECT query_id, doc_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score_e6 DESC, doc_id)
                      AS rank
           FROM sc QUALIFY rank <= {k}),
dcg AS (SELECT r.query_id,
               CAST(sum(CAST(round(1000000 * rel.rel
                                   / log2(r.rank + 1)) AS BIGINT))
                    AS BIGINT) AS dcg_e6
        FROM ranked r
        JOIN rel ON rel.doc_id = r.doc_id
                AND rel.query_id = r.query_id
        GROUP BY r.query_id),
ideal AS (SELECT query_id, rel,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY rel DESC, doc_id) AS irank
          FROM rel WHERE rel > 0),
idcg AS (SELECT query_id,
                CAST(sum(CAST(round(1000000 * rel
                                    / log2(irank + 1)) AS BIGINT))
                     AS BIGINT) AS idcg_e6
         FROM ideal WHERE irank <= {k} GROUP BY query_id)
SELECT d.query_id, d.dcg_e6, i.idcg_e6,
       CASE WHEN i.idcg_e6 = 0 THEN 0
            ELSE CAST(round(1000000 * (CAST(d.dcg_e6 AS DOUBLE)
                                       / i.idcg_e6)) AS BIGINT) END
         AS ndcg_e6
FROM dcg d JOIN idcg i USING (query_id)
"""


NDCG_BM25_SQL = _ndcg_sql()


def crawl_graph_stats(sf_dir: str):
    """One-row structural profile of the crawl's directed edge table —
    the graph-shape card a crawl run ships (Broder WWW'00 bow-tie
    inputs): distinct edge/node counts, self-loops, reciprocated
    edges (both directions present — link exchanges), and source/sink
    node counts (out-degree-0 = frontier leaves, in-degree-0 = seeds/
    orphans). All from bounded aggregates: reciprocity via ONE
    canonical-pair groupby carrying a direction bit (Min/Max of the
    bit distinguishes one-way from mutual — no self-join), degree
    sides via the src/dst distinct tables. Deterministic; rows-only,
    golden-pinned."""
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=4))
    distinct = (res.edges.select_columns(["src", "dst"])
                .groupby(["src", "dst"])
                .aggregate(Count(alias_name="_n"))
                .select_columns(["src", "dst"])).materialize()
    n_edges = distinct.count()
    loops = distinct.map_batches(
        lambda t: pa.table({"n": pa.array(
            [int(pc.sum(pc.cast(pc.equal(t["src"], t["dst"]),
                                pa.int64())).as_py() or 0)])}),
        batch_format="pyarrow").sum("n") or 0

    def side(col: str):
        return (distinct.select_columns([col]).map_batches(
            lambda t: t.rename_columns(["url"]), batch_format="pyarrow")
            .groupby("url").aggregate(Count(alias_name="_n"))
            .select_columns(["url"])).materialize()

    srcs, dsts = side("src"), side("dst")
    n_nodes = srcs.union(dsts).groupby("url") \
        .aggregate(Count(alias_name="_n")).count()
    n_sources = n_nodes - dsts.count()  # in-degree 0
    n_sinks = n_nodes - srcs.count()    # out-degree 0

    def canon_dir(t: pa.Table) -> pa.Table:
        a = t["src"].to_numpy(zero_copy_only=False)
        b = t["dst"].to_numpy(zero_copy_only=False)
        keep = a != b
        a, b = a[keep], b[keep]
        hi = np.maximum(a, b)
        lo = np.minimum(a, b)
        d = (a < b).astype(np.int64)  # direction bit
        return pa.table({"u": pa.array(lo, pa.string()),
                         "v": pa.array(hi, pa.string()),
                         "d": pa.array(d, pa.int64())})

    pairs = (distinct.map_batches(canon_dir, batch_format="pyarrow")
             .groupby(["u", "v"])
             .aggregate(Min("d", alias_name="dmin"),
                        Max("d", alias_name="dmax")))
    n_mutual_pairs = pairs.map_batches(
        lambda t: pa.table({"n": pa.array([int(pc.sum(pc.cast(
            pc.and_(pc.equal(t["dmin"], 0), pc.equal(t["dmax"], 1)),
            pa.int64())).as_py() or 0)])}),
        batch_format="pyarrow").sum("n") or 0
    return pa.table({
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_nodes": pa.array([n_nodes], pa.int64()),
        "n_self_loops": pa.array([int(loops)], pa.int64()),
        "n_mutual_pairs": pa.array([int(n_mutual_pairs)], pa.int64()),
        "n_source_nodes": pa.array([n_sources], pa.int64()),
        "n_sink_nodes": pa.array([n_sinks], pa.int64())})


def nb_lang_confusion(sf_dir: str):
    """Confusion matrix of the fitted NB language classifier
    (:func:`nb_lang_fit_predict`) on its held-out split — the model-
    card artifact a classifier-gated pipeline ships alongside the
    filter itself. Pure composition: the prediction pass's output
    (already a shuffle-free map over the test split) through one
    bounded groupby (≤ langs² keys). Output (true_lang, pred_lang, n),
    hash-exact vs the wrapped SQL oracle."""
    preds = nb_lang_fit_predict(sf_dir)
    if isinstance(preds, pa.Table):  # degenerate empty-corpus path
        return pa.table({"true_lang": pa.array([], pa.string()),
                         "pred_lang": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    return (preds.groupby(["true_lang", "pred_lang"])
            .aggregate(Count(alias_name="n")))


NB_CONFUSION_SQL = f"""
SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
FROM ({NB_LANG_SQL}) base
GROUP BY true_lang, pred_lang
"""


def top_quality_docs_per_source(sf_dir: str, k: int = 3):
    """Per-source top-``k`` documents by classifier score — the
    "best exemplars per domain" sampling a curation review UI shows
    (grouped top-k over the corpus, the top2_orders_per_customer shape
    on the documents table): one shuffle-free scoring pass
    (:func:`classifier_score_docs`'s exact-oracle weights), per-batch
    PRE-PRUNE to each source's local top-k (a batch can contribute at
    most k survivors per source, so the grouped finisher sees
    ≤ k·batches rows per source, never the corpus), deterministic
    (score desc, doc_id asc) ranks."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def score_prune(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(flat.astype(object), return_inverse=True)
        w = _clf_weights(uniq)[inv]
        s = np.rint(np.bincount(par, weights=w, minlength=t.num_rows)
                    ).astype(np.int64)
        df = pd.DataFrame({
            "source": t["source"].to_numpy(zero_copy_only=False),
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
            "clf_score": s})
        df = df.sort_values(["clf_score", "doc_id"],
                            ascending=[False, True])
        df = df.groupby("source", sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def fin(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["clf_score", "doc_id"],
                          ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (ds.map_batches(score_prune, batch_format="pyarrow")
            .groupby("source").map_groups(fin, batch_format="pandas"))


TOP_QUALITY_PER_SOURCE_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
s AS (SELECT doc_id,
             CAST(sum((CAST('0x' || substr(md5(token), 1, 15) AS BIGINT)
                       % 1001) - 500) AS BIGINT) AS clf_score
      FROM tok GROUP BY doc_id)
SELECT d.source, d.doc_id, s.clf_score,
       row_number() OVER (PARTITION BY d.source
                          ORDER BY s.clf_score DESC, d.doc_id)
         AS rank
FROM documents d JOIN s USING (doc_id)
QUALIFY rank <= 3
"""


def zorder_events_layout(sf_dir: str):
    """Z-order (Morton) data-layout pass over the events table — the
    lakehouse OPTIMIZE ZORDER BY (user_id, hour) operation: interleave
    the low 16 bits of user_id with the low 16 bits of the event's
    hour bucket so rows close in BOTH dimensions land close in the
    sort order, then globally sort by the curve — the layout under
    which either per-user or per-time-range scans touch few
    contiguous row groups (``zbucket`` = top 6 curve bits is the
    partition directory a write_partitioned export would use; the
    actual partitioned sink is the pack/export machinery). The bit
    interleave is pure int64 arithmetic — vectorized magic-number
    spreading here, the expanded 32-term shift sum in SQL — so the
    oracle is hash-exact; the sort is the op's purpose (a layout
    REWRITE is a global sort by definition) and the only shuffle."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def _spread16(v: "np.ndarray") -> "np.ndarray":
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    def zval(t: pa.Table) -> pa.Table:
        secs = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                // 1_000_000)
        x = t["user_id"].to_numpy(zero_copy_only=False) & 0xFFFF
        y = (secs // 3600) & 0xFFFF
        z = _spread16(x.astype(np.int64)) \
            | (_spread16(y.astype(np.int64)) << 1)
        return pa.table({"event_id": t["event_id"],
                         "z": pa.array(z, pa.int64()),
                         "zbucket": pa.array(z >> 26, pa.int64())})

    return ds.map_batches(zval, batch_format="pyarrow") \
        .sort(["z", "event_id"])


def _zorder_sql() -> str:
    def terms(col: str, off: int) -> str:
        return " + ".join(f"((({col} >> {i}) & 1) << {2 * i + off})"
                          for i in range(16))

    return f"""
WITH b AS (
  SELECT event_id, CAST(user_id & 65535 AS BIGINT) AS x,
         CAST((CAST(floor(epoch(ts)) AS BIGINT) // 3600) & 65535
              AS BIGINT) AS y
  FROM events
), zt AS (
  SELECT event_id,
         CAST({terms('x', 0)} + {terms('y', 1)} AS BIGINT) AS z
  FROM b
)
SELECT event_id, z, CAST(z >> 26 AS BIGINT) AS zbucket FROM zt
"""


ZORDER_EVENTS_SQL = _zorder_sql()


def bowtie_crawl_graph(sf_dir: str):
    """Bow-tie decomposition of the crawl graph (Broder WWW'00): the
    giant SCC as CORE, the nodes that can reach it (IN — pages that
    link INTO the mutually-connected center), the nodes it reaches
    (OUT), and everything else (OTHER — tendrils/tubes/disconnected,
    undistinguished as in the 4-way summary). The canonical web-graph
    structure report a crawl run ships. Runs the size-gated form
    (functions/graph.py::bowtie_auto: driver BFS under the gate,
    SCC + directed flag-propagation rounds above it — two-form
    equality pytest-asserted). Output (url, part); deterministic
    (CORE = largest SCC, ties by min member url). Rows-only
    (iterative), golden-pinned."""
    from rendler_ray.functions.graph import bowtie_auto
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=4))
    return bowtie_auto(res.edges)


def dp_source_counts(sf_dir: str, eps: float = 1.0):
    """Differentially-private per-source document counts (ε-DP Laplace
    mechanism, Dwork TCC'06: count sensitivity 1 ⇒ noise scale 1/ε) —
    the privacy-preserving release a dataset card ships when exact
    per-source tallies would leak membership. Noise is DETERMINISTIC
    per (source, fixed seed): each source draws its Laplace sample
    from ``default_rng(stable_hash64(source) ^ seed)`` via inverse-CDF,
    so the published artifact is reproducible and golden-pinnable
    while remaining a faithful Laplace draw (the synthweb side-stream
    seeding discipline). Output (source, noisy_n_e6) — true counts are
    NOT emitted. Scale shape: one bounded groupby (O(sources)); noise
    added on the driver over the one-row-per-source table."""
    from rendler_ray.functions.canon import stable_hash64

    ds = _read(sf_dir, "documents", ["source"])
    rows = (ds.groupby("source").aggregate(Count(alias_name="n"))
            .take_all())  # O(sources)
    srcs, noisy = [], []
    for x in sorted(rows, key=lambda r: r["source"]):
        h = int(stable_hash64(np.array([x["source"]], dtype=object))[0])
        rng = np.random.default_rng((h ^ 0x5f4d2026) & 0x7FFFFFFFFFFFFFFF)
        u = rng.uniform(-0.5, 0.5)
        lap = -(1.0 / eps) * np.sign(u) * np.log1p(-2.0 * abs(u))
        srcs.append(x["source"])
        noisy.append(int(_round_half_away(np.float64(
            1e6 * (int(x["n"]) + lap)))))
    return pa.table({"source": pa.array(srcs, pa.string()),
                     "noisy_n_e6": pa.array(noisy, pa.int64())})


def token_entropy_by_source(sf_dir: str):
    """Per-source unigram Shannon entropy (nats) — the lexical-
    diversity dataset-card statistic (low entropy = templated/
    boilerplate-heavy source; Shannon'48): H = ln N − (Σ c·ln c)/N
    over the source's token counts. Integer-exact pipeline: each
    DISTINCT (source, token)'s contribution is fixed-pointed at e6
    BEFORE the sum (round(1e6·c·ln c) as int64), so the per-source
    fold is an order-free integer sum and the single final expression
    (ln N − (Σe/1e6)/N, e6-rounded) is shared with the SQL oracle —
    hash-exact. Token strings never leave the explode task (two-half
    128-bit hash keys, the dup_span treatment); the count shuffle
    carries per-batch-combined int rows; the entropy fold output is
    O(sources)."""
    import pandas.util as pdu

    ds = _read(sf_dir, "documents", ["source", "text"])

    def explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(
            zero_copy_only=False).astype(object)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        src = t["source"].to_numpy(zero_copy_only=False)[par]
        h1 = pdu.hash_array(flat, categorize=False).view(np.int64)
        h2 = pdu.hash_array(flat, hash_key="rendlerentropy2!",
                            categorize=False).view(np.int64)
        g = (pd.DataFrame({"source": src, "h1": h1, "h2": h2})
             .groupby(["source", "h1", "h2"], sort=False).size()
             .reset_index(name="c"))
        return pa.table({
            "source": pa.array(g["source"].tolist(), pa.string()),
            "h1": pa.array(g["h1"].to_numpy(np.int64)),
            "h2": pa.array(g["h2"].to_numpy(np.int64)),
            "c": pa.array(g["c"].to_numpy(np.int64))})

    counts = (ds.map_batches(explode, batch_format="pyarrow")
              .groupby(["source", "h1", "h2"])
              .aggregate(Sum("c", alias_name="c")))

    def contrib(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        e = _round_half_away(1e6 * c * np.log(c))
        return pa.table({"source": t["source"],
                         "e": pa.array(e, pa.int64()),
                         "c": t["c"]})

    rows = (counts.map_batches(contrib, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Sum("e", alias_name="se"),
                       Sum("c", alias_name="n"))
            .take_all())  # O(sources)
    srcs, ns, ents = [], [], []
    for x in sorted(rows, key=lambda r: r["source"]):
        n, se = int(x["n"]), int(x["se"])
        h = np.log(float(n)) - (float(se) / 1e6) / n
        srcs.append(x["source"])
        ns.append(n)
        ents.append(int(_round_half_away(np.float64(1e6 * h))))
    return pa.table({"source": pa.array(srcs, pa.string()),
                     "n": pa.array(ns, pa.int64()),
                     "entropy_e6": pa.array(ents, pa.int64())})


TOKEN_ENTROPY_SQL = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
), tc AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY source, token
), e AS (
  SELECT source, CAST(round(1000000 * c * ln(c)) AS BIGINT) AS e, c
  FROM tc
), s AS (
  SELECT source, CAST(sum(e) AS BIGINT) AS se,
         CAST(sum(c) AS BIGINT) AS n
  FROM e GROUP BY source
)
SELECT source, n,
       CAST(round(1000000 * (ln(CAST(n AS DOUBLE))
                             - (CAST(se AS DOUBLE) / 1000000) / n))
            AS BIGINT) AS entropy_e6
FROM s
"""


def late_event_stats(sf_dir: str, lateness_s: int = 3600):
    """Watermark / late-arrival accounting — the streaming-semantics
    op a windowed pipeline needs before it can close windows: replay
    the event stream in ARRIVAL order (event_id), maintain the
    watermark = max event-time seen so far, and flag events arriving
    more than ``lateness_s`` behind it (the rows a Beam/Flink-style
    engine would route to late-data handling). Output: per event_type
    (n_late, n_total), hash-exact vs the SQL running-max window
    oracle.

    Scale shape — a GLOBAL running max without a global ordered scan:
    the two-pass distributed prefix pattern (functions/pack.py
    ``assign_offsets``): events bucket by event_id RANGE (256
    order-preserving buckets), pass 1 folds per-bucket max event-time
    (256-row driver state) into exclusive prefix maxima, pass 2
    computes each bucket's within-order cummax + its prefix base in
    parallel ``map_groups`` (rows per group ≈ n/256, the pack bound)
    and emits per-(bucket, type) count partials — one bounded groupby
    finishes."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type"])
    agg = ds.aggregate(Min("event_id", alias_name="lo"),
                       Max("event_id", alias_name="hi"),
                       Count(alias_name="n"))
    if not (agg["n"] or 0):
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n_late": pa.array([], pa.int64()),
                         "n_total": pa.array([], pa.int64())})
    lo, hi = int(agg["lo"]), int(agg["hi"])
    span = hi - lo + 1

    def keyed(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        secs = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                // 1_000_000)
        b = (eid - lo) * 256 // span
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "s": pa.array(secs, pa.int64()),
                         "bucket": pa.array(b, pa.int64())})

    kd = ds.map_batches(keyed, batch_format="pyarrow").materialize()
    bmax = {int(r["bucket"]): int(r["m"])
            for r in kd.groupby("bucket")
            .aggregate(Max("s", alias_name="m")).take_all()}
    base, acc = {}, None
    for b in range(256):
        base[b] = acc  # None = nothing before bucket 0
        if b in bmax:
            acc = bmax[b] if acc is None else max(acc, bmax[b])
    bref = ray.put(base)

    def within(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="stable")
        s = g["s"].to_numpy(np.int64)
        run = np.maximum.accumulate(s)
        wm = np.empty(len(s), np.float64)
        wm[0] = -np.inf
        wm[1:] = run[:-1]
        b0 = ray.get(bref)[int(g["bucket"].iloc[0])]
        if b0 is not None:
            wm = np.maximum(wm, float(b0))
        late = (wm > -np.inf) & (s < wm - lateness_s)
        out = (pd.DataFrame({"event_type": g["event_type"].to_numpy(),
                             "late": late.astype(np.int64)})
               .groupby("event_type", sort=False)
               .agg(n_late=("late", "sum"), n_total=("late", "size"))
               .reset_index())
        return out

    parts = kd.groupby("bucket").map_groups(within, batch_format="pandas")
    return (parts.groupby("event_type")
            .aggregate(Sum("n_late", alias_name="n_late"),
                       Sum("n_total", alias_name="n_total")))


LATE_EVENT_SQL = """
WITH o AS (
  SELECT event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         max(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
           ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM events
)
SELECT event_type,
       CAST(sum(CASE WHEN wm IS NOT NULL AND s < wm - 3600
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(count(*) AS BIGINT) AS n_total
FROM o GROUP BY event_type
"""


def source_vocab_overlap(sf_dir: str):
    """Pairwise source VOCABULARY overlap (token-set Jaccard per
    source pair) — the lexical-similarity complement to the
    duplicate-leakage matrices (prefix_dup_/near_dup_source_matrix):
    two domains can share no documents yet near-identical vocabularies
    (same register), or vice versa — the corpus-card view mixing
    decisions read. Never materializes the token×source×source cube:
    per-batch DISTINCT (source, token-hash) presence partials →
    groupby dedup → per-token ``map_groups`` whose group is ≤ one row
    per source (the prefix_dup combinatorial pattern) emits
    intersection increments → one O(sources²) groupby; vocab sizes are
    a bounded groupby; the Jaccard division happens once per PAIR on
    the driver. Token strings never leave the explode task (two-half
    128-bit hashes; collision odds ≈ vocab²/2^129). Output
    (src_a, src_b, inter, jaccard_e6), pairs with inter ≥ 1."""
    import pandas.util as pdu

    ds = _read(sf_dir, "documents", ["source", "text"])

    def presence(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(
            zero_copy_only=False).astype(object)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        src = t["source"].to_numpy(zero_copy_only=False)[par]
        h1 = pdu.hash_array(flat, categorize=False).view(np.int64)
        h2 = pdu.hash_array(flat, hash_key="rendleroverlap2!",
                            categorize=False).view(np.int64)
        g = (pd.DataFrame({"source": src, "h1": h1, "h2": h2})
             .drop_duplicates())
        return pa.table({
            "source": pa.array(g["source"].tolist(), pa.string()),
            "h1": pa.array(g["h1"].to_numpy(np.int64)),
            "h2": pa.array(g["h2"].to_numpy(np.int64))})

    pres = (ds.map_batches(presence, batch_format="pyarrow")
            .groupby(["source", "h1", "h2"])
            .aggregate(Count(alias_name="_n"))
            .select_columns(["source", "h1", "h2"])).materialize()
    vs = {r["source"]: int(r["n"])
          for r in pres.groupby("source")
          .aggregate(Count(alias_name="n")).take_all()}

    def emit_pairs(g: pa.Table) -> pa.Table:
        src = np.sort(np.asarray(g["source"].to_pylist(), dtype=object))
        if len(src) < 2:
            return pa.table({"src_a": pa.array([], pa.string()),
                             "src_b": pa.array([], pa.string()),
                             "i": pa.array([], pa.int64())})
        iu, ju = np.triu_indices(len(src), k=1)
        return pa.table({
            "src_a": pa.array(src[iu], pa.string()),
            "src_b": pa.array(src[ju], pa.string()),
            "i": pa.array(np.ones(len(iu), np.int64))})

    inter = (pres.groupby(["h1", "h2"])
             .map_groups(emit_pairs, batch_format="pyarrow")
             .groupby(["src_a", "src_b"])
             .aggregate(Sum("i", alias_name="inter"))
             .take_all())  # O(sources²)
    out_a, out_b, out_i, out_j = [], [], [], []
    for x in sorted(inter, key=lambda r: (r["src_a"], r["src_b"])):
        a, b, i = x["src_a"], x["src_b"], int(x["inter"])
        j = float(i) / (vs[a] + vs[b] - i)
        out_a.append(a)
        out_b.append(b)
        out_i.append(i)
        out_j.append(int(_round_half_away(np.float64(1e6 * j))))
    return pa.table({"src_a": pa.array(out_a, pa.string()),
                     "src_b": pa.array(out_b, pa.string()),
                     "inter": pa.array(out_i, pa.int64()),
                     "jaccard_e6": pa.array(out_j, pa.int64())})


SOURCE_VOCAB_OVERLAP_SQL = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
), pres AS (
  SELECT DISTINCT source, token FROM tok
), vs AS (
  SELECT source, CAST(count(*) AS BIGINT) AS v FROM pres GROUP BY source
), i AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(count(*) AS BIGINT) AS inter
  FROM pres a JOIN pres b USING (token)
  WHERE a.source < b.source
  GROUP BY a.source, b.source
)
SELECT src_a, src_b, inter,
       CAST(round(1000000 * CAST(inter AS DOUBLE)
                  / (va.v + vb.v - inter)) AS BIGINT) AS jaccard_e6
FROM i
JOIN vs va ON va.source = i.src_a
JOIN vs vb ON vb.source = i.src_b
"""


def token_drift_halves(sf_dir: str, k: int = 20):
    """Distribution-drift detection between two corpus snapshots
    (doc_id parity halves — the A/B the synthetic corpus affords):
    top-``k`` tokens by absolute log-odds shift of their
    document-frequency rate, |ln((df₀+1)/(n₀+1)) − ln((df₁+1)/(n₁+1))|
    (add-one smoothed so appear/disappear is finite) — the drifted-
    vocabulary report a recrawl/data-refresh pipeline reviews before
    retraining. Per-half df partials are exact per batch (a doc lives
    in one batch — the tfidf trick), the score is fixed-pointed e6
    per TOKEN before the global (score desc, token asc) top-k
    sort+limit over the vocab-sized table. Hash-exact vs SQL."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    halves = ds.map_batches(
        lambda t: t.append_column("half", pa.array(
            t["doc_id"].to_numpy(zero_copy_only=False) % 2,
            pa.int64())),
        batch_format="pyarrow")
    hn = {int(r["half"]): int(r["n"])
          for r in halves.groupby("half")
          .aggregate(Count(alias_name="n")).take_all()}
    n0, n1 = hn.get(0, 0), hn.get(1, 0)

    def df_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(
            zero_copy_only=False).astype(object)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        half = t["half"].to_numpy(zero_copy_only=False)[par]
        did = t["doc_id"].to_numpy(zero_copy_only=False)[par]
        g = (pd.DataFrame({"token": flat, "half": half, "doc": did})
             .drop_duplicates()
             .groupby(["token", "half"], sort=False).size()
             .reset_index(name="df"))
        p = g.pivot_table(index="token", columns="half", values="df",
                          fill_value=0, aggfunc="sum")
        return pa.table({
            "token": pa.array(p.index.tolist(), pa.string()),
            "df0": pa.array(np.asarray(
                p[0] if 0 in p.columns else np.zeros(len(p)),
                dtype=np.int64)),
            "df1": pa.array(np.asarray(
                p[1] if 1 in p.columns else np.zeros(len(p)),
                dtype=np.int64))})

    dfs = (halves.map_batches(df_partial, batch_format="pyarrow")
           .groupby("token")
           .aggregate(Sum("df0", alias_name="df0"),
                      Sum("df1", alias_name="df1")))

    def score(t: pa.Table) -> pa.Table:
        d0 = t["df0"].to_numpy(zero_copy_only=False).astype(np.float64)
        d1 = t["df1"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.abs(np.log((d0 + 1.0) / (n0 + 1))
                   - np.log((d1 + 1.0) / (n1 + 1)))
        return t.append_column(
            "drift_e6", pa.array(_round_half_away(1e6 * s), pa.int64()))

    return (dfs.map_batches(score, batch_format="pyarrow")
            .sort(["drift_e6", "token"], descending=[True, False])
            .limit(k))


TOKEN_DRIFT_SQL = """
WITH tok AS (
  SELECT doc_id, doc_id % 2 AS half,
         unnest(string_split(text, ' ')) AS token
  FROM documents
), tokd AS (
  SELECT DISTINCT doc_id, half, token FROM tok
), hn AS (
  SELECT doc_id % 2 AS half, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1
), w AS (
  SELECT token,
         CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS df0,
         CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS df1
  FROM tokd GROUP BY token
)
SELECT token, df0, df1,
       CAST(round(1000000 * abs(
         ln((df0 + 1.0) / (n0.n + 1)) - ln((df1 + 1.0) / (n1.n + 1))))
            AS BIGINT) AS drift_e6
FROM w,
     (SELECT n FROM hn WHERE half = 0) n0,
     (SELECT n FROM hn WHERE half = 1) n1
ORDER BY drift_e6 DESC, token LIMIT 20
"""


def jl_project_embeddings(sf_dir: str, out_dim: int = 16):
    """Johnson–Lindenstrauss random projection of the embedding table
    (64 → ``out_dim`` dims, Gaussian sketch scaled 1/√d — JL'84,
    Achlioptas JCSS'03): the OBLIVIOUS dimensionality reduction a
    pipeline uses when PCA's stats pass is too expensive or the sketch
    must be data-independent (streaming arrivals project identically
    forever). The projection matrix is a seeded ``default_rng`` draw
    (deterministic, broadcast once via ``ray.put``); the pass is
    shuffle-free batched matmul. Output (vec_id, i, proj_e6) — e6
    fixed-point per coordinate; golden-pinned (a random matrix has no
    SQL form), with a distance-preservation property pytest."""
    rng = np.random.default_rng(20260819)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    proj = rng.standard_normal((64, out_dim)) / np.sqrt(out_dim)
    pref = ray.put(proj)

    def project(t: pa.Table) -> pa.Table:
        m = np.stack([np.asarray(v, np.float64)
                      for v in t["embedding"].to_pylist()])
        p = m @ ray.get(pref)
        n, d = p.shape
        ids = np.repeat(t["vec_id"].to_numpy(zero_copy_only=False), d)
        dims = np.tile(np.arange(1, d + 1, dtype=np.int64), n)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "i": pa.array(dims, pa.int64()),
            "proj_e6": pa.array(_round_half_away(1e6 * p.ravel()),
                                pa.int64())})

    return ds.map_batches(project, batch_format="pyarrow")


def stratified_kfold_docs(sf_dir: str, k: int = 5):
    """Stratified k-fold cross-validation assignment (per-SOURCE
    stratification so every fold sees each domain's proportional
    share — the sklearn StratifiedKFold contract, distributed): fold =
    (per-source md5-hash rank − 1) mod k. Deterministic membership
    (the stratified-sample md5 convention), one shuffle on the
    O(sources)-bounded rank groupby — per-batch rows pre-carry their
    hash so the grouped finisher only ranks. Output
    (doc_id, source, fold), hash-exact vs the SQL window oracle."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def add_hash(t: pa.Table) -> pa.Table:
        h = [hashlib.md5(f"{i}-kf1".encode()).hexdigest()
             for i in t["doc_id"].to_pylist()]
        return t.append_column("_h", pa.array(h, pa.string()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        rk = g["_h"].rank(method="first").astype(np.int64)
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "source": g["source"].to_numpy(),
            "fold": ((rk - 1) % k).to_numpy(np.int64)})

    return (ds.map_batches(add_hash, batch_format="pyarrow")
            .groupby("source").map_groups(fold, batch_format="pandas"))


STRATIFIED_KFOLD_SQL = """
SELECT doc_id, source,
       CAST((row_number() OVER (
              PARTITION BY source
              ORDER BY md5(CAST(doc_id AS VARCHAR) || '-kf1')) - 1) % 5
            AS BIGINT) AS fold
FROM documents
"""


def docs_ipc_export_roundtrip(sf_dir: str):
    """Sink + source coverage, Arrow IPC leg (the parquet/CSV/JSONL
    roundtrips' zero-parse sibling — the format an Arrow-native
    consumer (Flight/mmap trainer loader) reads without decode):
    export the documents table to one ``.arrow`` IPC file per block —
    written to a temp name then atomically renamed, the resumable-sink
    convention, shard-named by min doc_id so a rerun overwrites
    deterministically — then read back through a CUSTOM binary
    source (``read_binary_files`` → per-task ``pa.ipc.open_file``),
    bit-exactly (the §2.10 extension seam: Ray has no IPC sink, so
    this IS the map_batches custom-sink pattern)."""
    import shutil

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    ds = _read(sf_dir, "documents", cols)
    path = f"{_ckpt_root()}/ipc_export"
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    def write_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        mn = int(pc.min(t["doc_id"]).as_py())
        fn = os.path.join(path, f"part-{mn:012d}.arrow")
        tmp = fn + ".tmp"
        with pa.OSFile(tmp, "wb") as f, \
                pa.ipc.new_file(f, t.schema) as w:
            w.write_table(t)
        os.rename(tmp, fn)
        return pa.table({"path": pa.array([fn], pa.string()),
                         "n": pa.array([t.num_rows], pa.int64())})

    ds.map_batches(write_shard, batch_size=None, zero_copy_batch=True,
                   batch_format="pyarrow").materialize()

    def parse(t: pa.Table) -> pa.Table:
        tabs = [pa.ipc.open_file(pa.BufferReader(x.as_py())).read_all()
                for x in t["bytes"]]
        return pa.concat_tables(tabs).select(cols)

    return rd.read_binary_files(path).map_batches(
        parse, batch_format="pyarrow")
