

def sample_docs_per_source_k(sf_dir: str, k: int = 5):
    """Exactly-``k``-PER-GROUP deterministic sample (the per-domain
    spot-check a curation review draws; completes the sampling family
    next to fraction-stratified and global exact-k): rank docs within
    each source by md5(doc_id||salt) and keep the k smallest. Same
    scale shape as the grouped top-k: per-batch PRE-PRUNE to each
    source's local k (a batch contributes ≤ k survivors per source),
    grouped finisher sees ≤ k·batches rows per source."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def prune(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        rk = [hashlib.md5(f"{i}-pss".encode()).hexdigest() for i in ids]
        df = pd.DataFrame({
            "source": t["source"].to_numpy(zero_copy_only=False),
            "doc_id": ids, "rk": rk})
        df = df.sort_values(["rk", "doc_id"])
        return pa.Table.from_pandas(df.groupby("source", sort=False)
                                    .head(k), preserve_index=False)

    def fin(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["rk", "doc_id"]).head(k)
        return pd.DataFrame({
            "source": g["source"].to_numpy(),
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "smp_rank": np.arange(1, len(g) + 1, dtype=np.int64)})

    return (ds.map_batches(prune, batch_format="pyarrow")
            .groupby("source").map_groups(fin, batch_format="pandas"))


SAMPLE_PER_SOURCE_SQL = """
SELECT source, doc_id,
       row_number() OVER (
         PARTITION BY source
         ORDER BY md5(CAST(doc_id AS VARCHAR) || '-pss'), doc_id)
         AS smp_rank
FROM documents QUALIFY smp_rank <= 5
"""


def rfm_user_segments(sf_dir: str):
    """RFM SEGMENTATION (recency / frequency / monetary) — the classic
    customer-analytics cube: per-user aggregates over the event
    stream, each dimension cut into equi-depth terciles by global
    rank, segments reported as (r, f, m) code cells. Exercises the
    aggregate → multi-window-rank → join composition over a DERIVED
    table.

    Scale shape: one grouped aggregate to a per-USER table (≪ events),
    three global sorts with metadata-only zip-with-index
    (``with_row_seq`` — code = (rank−1)·3 // n, the formula NTILE),
    two hash joins to recombine the code columns (materialize barriers
    between, per the staged-plan rule), one ≤27-group aggregate."""
    from rendler_ray.state.politeness import _nonempty_blocks
    from rendler_ray.util import with_row_seq

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table({"user_id": t["user_id"],
                         "us": pa.array(us, pa.int64()),
                         "cents": _cents(t["value"])})

    ua = (ds.map_batches(prep, batch_format="pyarrow")
          .groupby("user_id").aggregate(
              Max("us", alias_name="recency"),
              Count(alias_name="freq"),
              Sum("cents", alias_name="cents"))
          .materialize())
    n = ua.count()

    def code_table(dim: str, code: str, keep_cents: bool = False):
        cols = ["user_id", dim] + (["cents"] if keep_cents
                                   and dim != "cents" else [])
        ranked = with_row_seq(ua.select_columns(cols),
                              [dim, "user_id"], start=1, column="rk")

        def to_code(t: pa.Table) -> pa.Table:
            c = (t["rk"].to_numpy(zero_copy_only=False) - 1) * 3 // n
            out = {"user_id": t["user_id"],
                   code: pa.array(c.astype(np.int64), pa.int64())}
            if keep_cents:
                out["cents"] = t["cents"]
            return pa.table(out)

        return ranked.map_batches(to_code, batch_format="pyarrow")

    cm = code_table("cents", "m_code", keep_cents=True)
    cr = code_table("recency", "r_code")
    cf = code_table("freq", "f_code")
    j = _nonempty_blocks(
        cm.join(cr, join_type="inner", num_partitions=8,
                on=("user_id",)).materialize())
    j = _nonempty_blocks(
        j.join(cf, join_type="inner", num_partitions=8,
               on=("user_id",)).materialize())
    return (j.groupby(["r_code", "f_code", "m_code"]).aggregate(
        Count(alias_name="n_users"), Sum("cents", alias_name="sum_cents")))


RFM_SQL = """
WITH ua AS (
  SELECT user_id,
         CAST(max(epoch_us(ts)) AS BIGINT) AS recency,
         count(*) AS freq,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY user_id),
codes AS (
  SELECT user_id, cents,
         (row_number() OVER (ORDER BY recency, user_id) - 1) * 3
           // (SELECT count(*) FROM ua) AS r_code,
         (row_number() OVER (ORDER BY freq, user_id) - 1) * 3
           // (SELECT count(*) FROM ua) AS f_code,
         (row_number() OVER (ORDER BY cents, user_id) - 1) * 3
           // (SELECT count(*) FROM ua) AS m_code
  FROM ua)
SELECT r_code, f_code, m_code, count(*) AS n_users,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM codes GROUP BY r_code, f_code, m_code
"""


def bfs_distances_graph(sf_dir: str, max_depth: int = 6,
                        driver_max: int = 2_000_000):
    """Single-source BFS DISTANCES over the derived undirected graph —
    the generic "hops from the seed set" primitive (the crawl pipeline
    is its production form, with sharded seen-set actors; this is the
    SQL-graph variant, oracled against a RECURSIVE CTE — dedup'd
    (node, dist) frontier, min(dist) finisher). Output (node, dist)
    for every node within ``max_depth`` hops of node 1, seed included
    even if isolated.

    Scale shape: below the edge-count gate a driver adjacency BFS
    (bounded fold); above it per-round distributed min-label
    expansion — frontier ⋈ edges then union + groupby-min, one join +
    one groupby per round with materialize barriers, exactly the
    crawl's BFS round shape without the politeness machinery."""
    from rendler_ray.state.politeness import _nonempty_blocks

    seed = 1
    edges = _orders_graph_edges(sf_dir).materialize()

    if edges.count() <= driver_max:
        t = pa.concat_tables(
            edges.iter_batches(batch_size=None, batch_format="pyarrow"))
        adj: dict[int, list[int]] = {}
        for a, b in zip(t["a"].to_numpy(), t["b"].to_numpy()):
            adj.setdefault(int(a), []).append(int(b))
            adj.setdefault(int(b), []).append(int(a))
        dist = {seed: 0}
        frontier = [seed]
        for d in range(1, max_depth + 1):
            nxt = [v for u in frontier for v in adj.get(u, ())
                   if v not in dist]
            frontier = []
            for v in nxt:
                if v not in dist:
                    dist[v] = d
                    frontier.append(v)
            if not frontier:
                break
        ks = sorted(dist)
        return pa.table({"node": pa.array(ks, pa.int64()),
                         "dist": pa.array([dist[k] for k in ks],
                                          pa.int64())})

    return _bfs_distance_rounds(edges, seed, max_depth)


def _bfs_distance_rounds(edges, seed: int, max_depth: int):
    """Distributed single-source BFS rounds over an int (a, b) edge
    Dataset → (node, dist) Dataset: per round one frontier ⋈ edges
    join + one union + one groupby-min, each execution materialized
    (≤2 shuffle stages — the r4e deadlock lesson). Shared by
    :func:`bfs_distances_graph` and :func:`graph_diameter_bound`'s
    distributed double sweep."""
    from rendler_ray.state.politeness import _nonempty_blocks

    both = edges.map_batches(
        lambda t: pa.table({
            "u": pa.array(np.concatenate([t["a"].to_numpy(),
                                          t["b"].to_numpy()]), pa.int64()),
            "v": pa.array(np.concatenate([t["b"].to_numpy(),
                                          t["a"].to_numpy()]), pa.int64())}),
        batch_format="pyarrow").materialize()
    dist_ds = rd.from_arrow(pa.table({
        "node": pa.array([seed], pa.int64()),
        "dist": pa.array([0], pa.int64())})).materialize()
    for d in range(1, max_depth + 1):
        frontier = dist_ds.map_batches(
            lambda t, d=d: t.filter(pc.equal(t["dist"], d - 1))
            .select(["node"]), batch_format="pyarrow").materialize()
        frontier = _nonempty_blocks(frontier)
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
        dist_ds = (dist_ds.union(cand).groupby("node")
                   .aggregate(Min("dist", alias_name="dist"))
                   .materialize())
    return dist_ds


BFS_SQL = """
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
  SELECT bo.v AS node, w.dist + 1 AS dist
  FROM walk w JOIN bo ON bo.u = w.node
  WHERE w.dist < 6)
SELECT CAST(node AS BIGINT) AS node, CAST(min(dist) AS BIGINT) AS dist
FROM walk GROUP BY node
"""


_POP8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def media_phash_dedup(sf_dir: str, ham_max: int = 3):
    """Image NEAR-DUP detection by PERCEPTUAL HASH — the multimodal
    dedup pass (decode → 8×8 DCT pHash → banded Hamming search) a
    training pipeline runs before captioning/packing images. The
    corpus is the crawl's media table plus deterministic 'recompressed
    variant' rows (every 5th ref hash-selected, one byte perturbed —
    the derived-snapshot trick; a real store has the variants
    natively). Decode is the sandbox stub (media.py contract); the
    signature/banding math is the production form.

    Scale shape: signatures are one stacked einsum per batch
    (:func:`phash64_batch`); candidates come from 4×16-bit BAND
    buckets — pigeonhole makes Hamming ≤ 3 detection EXACT (4
    differing bits can split 1-per-band, so ham_max > 3 would need
    more bands); within-bucket verify is a vectorized xor+popcount;
    pair dedup is one groupby on (ref_a, ref_b). Hot buckets (a
    billion identical thumbnails) salt via
    ``ann.salt_hot_int_buckets`` exactly as the simhash path does
    (:func:`_phash_banded_pairs`), bounding every verify task at
    O(4096²). Rows-only (golden): DCT floats aren't SQL-expressible."""
    from rendler_ray.functions.canon import stable_hash64
    from rendler_ray.functions.media import phash64_batch

    docs = rd.read_parquet(_synth_docs_for(sf_dir))
    media = F_media.media_pipeline(docs).select_columns(
        ["media_ref", "blob"])

    def with_variants(t: pa.Table) -> pa.Table:
        refs = t["media_ref"].to_pylist()
        blobs = t["blob"].to_pylist()
        pick = stable_hash64(refs) % np.uint64(5) == 0
        for i in np.nonzero(pick)[0]:
            v = bytearray(blobs[int(i)])
            v[17] = (v[17] + 2) % 256
            refs.append(refs[int(i)] + "#v")
            blobs.append(bytes(v))
        h = phash64_batch(blobs)
        return pa.table({
            "ref": pa.array(refs, pa.string()),
            "phash": pa.array(h.view(np.int64), pa.int64())})

    sigs = media.map_batches(with_variants, batch_format="pyarrow")
    return _phash_banded_pairs(sigs, ham_max=ham_max)


def _phash_banded_pairs(sigs, ham_max: int = 3,
                        max_bucket: int = _SIMHASH_MAX_BUCKET):
    """(ref, phash) rows → deduped near-dup pairs via 4×16-bit banding
    with HOT-BUCKET SALTING: the packed (band << 16 | key) bucket key
    goes through ``ann.salt_hot_int_buckets`` before the groupby, so a
    degenerate corpus (millions of identical thumbnails/logos sharing
    one band key) splits into ≤``max_bucket``-row sub-buckets instead
    of one O(b²) verify task — the identical guard the simhash text
    path carries, with the same Manku-style recall trade on pairs that
    straddle sub-buckets of an oversized bucket."""

    def bands(t: pa.Table) -> pa.Table:
        h = t["phash"].to_numpy(zero_copy_only=False).view(np.uint64)
        out = []
        for b in range(4):
            key = ((h >> np.uint64(16 * b))
                   & np.uint64(0xFFFF)).astype(np.int64)
            out.append(pa.table({
                "bucket_key": pa.array((b << 16) | key),
                "ref": t["ref"], "phash": t["phash"]}))
        return pa.concat_tables(out)

    banded = F_ann.salt_hot_int_buckets(
        sigs.map_batches(bands, batch_format="pyarrow"),
        key_col="bucket_key", id_col="ref", max_bucket=max_bucket)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        h = g["phash"].to_numpy(np.int64).view(np.uint64)
        refs = g["ref"].to_numpy(object)
        x = (h[:, None] ^ h[None, :]).view(np.uint8) \
            .reshape(len(h), len(h), 8)
        ham = _POP8[x].sum(axis=2).astype(np.int64)
        ii, jj = np.nonzero(np.triu(ham <= ham_max, k=1))
        ra = np.minimum(refs[ii], refs[jj])
        rb = np.maximum(refs[ii], refs[jj])
        return pd.DataFrame({"ref_a": ra, "ref_b": rb,
                             "hamming": ham[ii, jj]})

    pairs = (banded.groupby("bucket_key")
             .map_groups(verify, batch_format="pandas"))
    empty = pa.table({"ref_a": pa.array([], pa.string()),
                      "ref_b": pa.array([], pa.string()),
                      "hamming": pa.array([], pa.int64())})
    from rendler_ray.state.politeness import _nonempty_blocks
    pairs = _nonempty_blocks(pairs.materialize())
    if pairs is None:
        return empty
    return (pairs.groupby(["ref_a", "ref_b"])
            .aggregate(Min("hamming", alias_name="hamming")))


def personalized_pagerank_crawl(sf_dir: str):
    """Personalized PageRank over the crawl graph from the crawl's own
    seed (functions/graph.py::personalized_pagerank — Haveliwala
    WWW'02): ranks measure link-proximity to the seed, the re-crawl /
    focused-crawl prioritization signal. Deterministic; fixed-point
    1e-9. Rows-only (iterative)."""
    from rendler_ray.functions.graph import personalized_pagerank
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    seeds = default_seeds(1)
    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=seeds, max_depth=4))
    ranks = personalized_pagerank(res.edges, seeds, iters=10)
    e9 = np.rint(ranks["rank"].to_numpy() * 1e9).astype(np.int64)
    return pa.table({"url": pa.array(ranks["url"].to_numpy(object),
                                     pa.string()),
                     "rank_e9": pa.array(e9, pa.int64())})


def skyline_docs(sf_dir: str, driver_max: int = 1_000_000):
    """SKYLINE (Pareto frontier) operator — Börzsönyi ICDE'01: the
    docs not dominated on (clf_score, n_chars), i.e. the
    quality/length frontier a curation pass inspects ("no doc is both
    better-scored AND longer"). Dominance = ≥ on both dims, > on at
    least one; coincident duplicates are mutually non-dominating and
    all kept.

    Scale shape: the skyline is DISTRIBUTIVE — a point dominated in
    any subset is dominated globally — so one shuffle-free pass takes
    each batch's local skyline (vectorized grouped-max rule) and only
    the surviving candidates (≪ corpus; worst case the frontier
    itself) fold through the same rule once more under a gated driver
    finisher. Oracle is the O(n log n) window form: per-score max +
    running max over strictly-greater scores (RANGE … 1 PRECEDING),
    no quadratic NOT EXISTS."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def _sky(df: pd.DataFrame) -> pd.DataFrame:
        eqmax = df.groupby("clf_score")["n_chars"].transform("max")
        per = df.groupby("clf_score")["n_chars"].max() \
            .sort_index(ascending=False)
        gt = per.cummax().shift(1)
        g = df["clf_score"].map(gt)
        keep = (df["n_chars"] == eqmax) & (g.isna() | (df["n_chars"] > g))
        return df[keep]

    def local(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(flat.astype(object), return_inverse=True)
        w = _clf_weights(uniq)[inv]
        s = np.rint(np.bincount(par, weights=w, minlength=t.num_rows)) \
            .astype(np.int64)
        df = pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
            "clf_score": s,
            "n_chars": t["n_chars"].to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(_sky(df), preserve_index=False)

    cand = ds.map_batches(local, batch_format="pyarrow").materialize()
    nc = cand.count()
    assert nc <= driver_max, \
        f"skyline candidate fold {nc} rows exceeds gate {driver_max}"
    df = pa.concat_tables(
        cand.iter_batches(batch_size=None,
                          batch_format="pyarrow")).to_pandas()
    out = _sky(df).sort_values(["clf_score", "doc_id"])
    return pa.Table.from_pandas(out, preserve_index=False)


SKYLINE_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
s AS (SELECT doc_id,
             CAST(sum((CAST('0x' || substr(md5(token), 1, 15) AS BIGINT)
                       % 1001) - 500) AS BIGINT) AS clf_score
      FROM tok GROUP BY doc_id),
d AS (SELECT s.doc_id, s.clf_score, doc.n_chars
      FROM s JOIN documents doc ON doc.doc_id = s.doc_id),
w AS (SELECT doc_id, clf_score, n_chars,
             max(n_chars) OVER (PARTITION BY clf_score) AS cmax_eq,
             max(n_chars) OVER (
               ORDER BY clf_score DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS cmax_gt
      FROM d)
SELECT doc_id, clf_score, n_chars FROM w
WHERE n_chars = cmax_eq AND (cmax_gt IS NULL OR n_chars > cmax_gt)
"""


def ohlc_hourly_values(sf_dir: str):
    """OHLC BARS (open/high/low/close) per hour over the event value
    stream — the time-series downsampling every metrics/finance
    pipeline runs. Open/close are FIRST/LAST_VALUE by (ts, event_id)
    — expressed as pure COMMUTATIVE aggregates via the packed-string
    Min/Max trick (fixed-width zero-padded sort key ‖ '|' ‖ payload;
    lexicographic == numeric for the 16+10-digit key), so there is no
    per-group window sort anywhere: per-batch partials → ONE groupby
    with Min/Max folds. The SQL mirrors the identical packed string,
    so both engines compare the same bytes."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ev = t["event_id"].to_numpy(zero_copy_only=False)
        cents = _cents(t["value"]).to_numpy(zero_copy_only=False)
        hour = us // 3_600_000_000
        pk = np.array([f"{u:016d}{e:010d}|{c}"
                       for u, e, c in zip(us, ev, cents)], object)
        df = pd.DataFrame({"hour": hour, "cents": cents, "pk": pk})
        g = df.groupby("hour", as_index=False).agg(
            pk_min=("pk", "min"), pk_max=("pk", "max"),
            low_c=("cents", "min"), high_c=("cents", "max"),
            n=("cents", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("hour").aggregate(
               Min("pk_min", alias_name="pk_min"),
               Max("pk_max", alias_name="pk_max"),
               Min("low_c", alias_name="low_c"),
               Max("high_c", alias_name="high_c"),
               Sum("n", alias_name="n")))

    def finish(t: pa.Table) -> pa.Table:
        op = [int(s.split("|", 1)[1]) for s in t["pk_min"].to_pylist()]
        cl = [int(s.split("|", 1)[1]) for s in t["pk_max"].to_pylist()]
        return pa.table({
            "hour": pc.cast(t["hour"], pa.int64()),
            "open_c": pa.array(op, pa.int64()),
            "high_c": pc.cast(t["high_c"], pa.int64()),
            "low_c": pc.cast(t["low_c"], pa.int64()),
            "close_c": pa.array(cl, pa.int64()),
            "n": pc.cast(t["n"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


OHLC_SQL = """
WITH e AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) AS us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
p AS (
  SELECT us // 3600000000 AS hour, cents,
         lpad(CAST(us AS VARCHAR), 16, '0')
           || lpad(CAST(event_id AS VARCHAR), 10, '0')
           || '|' || CAST(cents AS VARCHAR) AS pk
  FROM e)
SELECT hour,
       CAST(split_part(min(pk), '|', 2) AS BIGINT) AS open_c,
       CAST(max(cents) AS BIGINT) AS high_c,
       CAST(min(cents) AS BIGINT) AS low_c,
       CAST(split_part(max(pk), '|', 2) AS BIGINT) AS close_c,
       count(*) AS n
FROM p GROUP BY hour
"""


def half_life_decay_users(sf_dir: str, half_life_us: int =
                          86_400_000_000):
    """HALF-LIFE DECAYED engagement score per user — the streaming
    recency-weighted counter (leaderboards, freshness ranking):
    weight = 1e6 · 2^−⌊age/half-life⌋. The decay is BUCKETED to
    integer halvings (a right shift), so every addend is an exact
    int64 and the sum is ORDER-FREE — float exp decay could never
    hash-match across engines (order-dependent last ulps); the shift
    form is the repo's fixed-point-before-sum rule applied to decay.

    Scale shape: one Max aggregate for the reference time T (a scalar
    to the driver), then one shuffle-free weight pass + per-batch
    (user, Σw, n) partials into the user groupby."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def us_col(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table({"user_id": t["user_id"],
                         "us": pa.array(us, pa.int64())})

    used = ds.map_batches(us_col, batch_format="pyarrow").materialize()
    t_max = int(used.max("us"))

    def partial(t: pa.Table) -> pa.Table:
        age = (t_max - t["us"].to_numpy(zero_copy_only=False))
        shift = np.minimum(age // half_life_us, 20).astype(np.int64)
        wt = (1_000_000 >> shift).astype(np.int64)
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "wt": wt, "n": 1})
        g = df.groupby("user_id", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (used.map_batches(partial, batch_format="pyarrow")
            .groupby("user_id").aggregate(
                Sum("wt", alias_name="decay_score"),
                Sum("n", alias_name="n")))


HALF_LIFE_SQL = """
WITH mx AS (SELECT max(epoch_us(ts)) AS t FROM events),
e AS (SELECT user_id,
             (SELECT t FROM mx) - CAST(epoch_us(ts) AS BIGINT) AS age
      FROM events)
SELECT user_id,
       CAST(sum(1000000 >> CAST(LEAST(age // 86400000000, 20)
                                AS INTEGER)) AS BIGINT) AS decay_score,
       count(*) AS n
FROM e GROUP BY user_id
"""


def ks_drift_by_source(sf_dir: str, driver_max: int = 4_000_000):
    """KOLMOGOROV–SMIRNOV drift monitor per source — the
    distribution-shift alarm a data pipeline runs on every incoming
    shard: exact KS distance between each source's classifier-score
    distribution and the global one. D is a max over |ΔCDF| at the
    data points, so the whole statistic is EXACT integer arithmetic:
    D_e6 = 1e6·max|cum_s·N − cum_all·n_s| // (n_s·N) — no float CDFs
    (cum·N < 2^63 needs n < 3·10^9 per side at e6; past that drop to
    e3 or HUGEINT, noted here).

    Scale shape: one shuffle-free scoring pass, per-batch
    (source, score, c) combiners, ONE groupby on (source, score); the
    folded table is source × distinct-score COUNTS (≪ corpus — the
    gated driver fold; the `_grouped_value_bisect` engine is the
    distributed fallback shape if score cardinality ever approaches
    the gate). Oracle is the O(grid) window form on the same counts,
    not a quadratic threshold cross join."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(flat.astype(object), return_inverse=True)
        w = _clf_weights(uniq)[inv]
        s = np.rint(np.bincount(par, weights=w, minlength=t.num_rows)) \
            .astype(np.int64)
        df = pd.DataFrame({
            "source": t["source"].to_numpy(zero_copy_only=False),
            "clf_score": s, "c": 1})
        g = df.groupby(["source", "clf_score"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["source", "clf_score"])
              .aggregate(Sum("c", alias_name="c"))
              .materialize())
    nrows = counts.count()
    assert nrows <= driver_max, \
        f"(source, score) count table {nrows} exceeds gate {driver_max}"
    t = pa.concat_tables(
        counts.iter_batches(batch_size=None, batch_format="pyarrow"))
    src = np.asarray(t["source"].to_pylist(), object)
    sc = t["clf_score"].to_numpy()
    c = t["c"].to_numpy()
    pts = np.unique(sc)
    pos = np.searchsorted(pts, sc)
    all_c = np.zeros(len(pts), np.int64)
    np.add.at(all_c, pos, c)
    cum_all = np.cumsum(all_c)
    n_total = int(cum_all[-1])
    rows = []
    for s_name in np.unique(src):
        m = src == s_name
        sc_c = np.zeros(len(pts), np.int64)
        np.add.at(sc_c, pos[m], c[m])
        cum_s = np.cumsum(sc_c)
        n_s = int(cum_s[-1])
        dmax = int(np.abs(cum_s * n_total - cum_all * n_s).max())
        rows.append((s_name, n_s,
                     1_000_000 * dmax // (n_s * n_total)))
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "n_s": pa.array([r[1] for r in rows], pa.int64()),
        "d_e6": pa.array([r[2] for r in rows], pa.int64())})


KS_DRIFT_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
s AS (SELECT doc_id,
             CAST(sum((CAST('0x' || substr(md5(token), 1, 15) AS BIGINT)
                       % 1001) - 500) AS BIGINT) AS clf_score
      FROM tok GROUP BY doc_id),
d AS (SELECT doc.source, s.clf_score
      FROM s JOIN documents doc ON doc.doc_id = s.doc_id),
pts AS (SELECT DISTINCT clf_score AS x FROM d),
srcs AS (SELECT source, count(*) AS n_s FROM d GROUP BY source),
n AS (SELECT count(*) AS n FROM d),
sc AS (SELECT source, clf_score, count(*) AS c FROM d
       GROUP BY source, clf_score),
grid AS (SELECT srcs.source, pts.x FROM srcs CROSS JOIN pts),
cum AS (SELECT grid.source, grid.x,
               sum(coalesce(sc.c, 0)) OVER (
                 PARTITION BY grid.source ORDER BY grid.x) AS cum_s
        FROM grid LEFT JOIN sc
          ON sc.source = grid.source AND sc.clf_score = grid.x),
ac AS (SELECT pts.x,
              sum(coalesce(g.c, 0)) OVER (ORDER BY pts.x) AS cum_all
       FROM pts LEFT JOIN (SELECT clf_score, count(*) AS c FROM d
                           GROUP BY clf_score) g
         ON g.clf_score = pts.x)
SELECT cum.source,
       CAST(srcs.n_s AS BIGINT) AS n_s,
       CAST(1000000 * max(abs(cum.cum_s * (SELECT n FROM n)
                              - ac.cum_all * srcs.n_s))
            // (srcs.n_s * (SELECT n FROM n)) AS BIGINT) AS d_e6
FROM cum
JOIN ac ON ac.x = cum.x
JOIN srcs ON srcs.source = cum.source
GROUP BY cum.source, srcs.n_s
"""


def docs_orc_export_roundtrip(sf_dir: str):
    """Sink + source coverage, ORC leg (the columnar format the Hive /
    Trino world reads natively; pyarrow ships the codec, Ray has no
    ORC sink or source — so BOTH directions run through the §2.10
    custom map_batches seam, same as the IPC leg): one ORC file per
    block via the atomic temp-rename resumable-sink convention,
    shard-named by min doc_id, read back through ``read_binary_files``
    → per-task ``pyarrow.orc`` decode, bit-exactly."""
    import shutil

    import pyarrow.orc as paorc

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    ds = _read(sf_dir, "documents", cols)
    path = f"{_ckpt_root()}/orc_export"
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    def write_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        mn = int(pc.min(t["doc_id"]).as_py())
        fn = os.path.join(path, f"part-{mn:012d}.orc")
        tmp = fn + ".tmp"
        paorc.write_table(t, tmp)
        os.rename(tmp, fn)
        return pa.table({"path": pa.array([fn], pa.string()),
                         "n": pa.array([t.num_rows], pa.int64())})

    ds.map_batches(write_shard, batch_size=None, zero_copy_batch=True,
                   batch_format="pyarrow").materialize()

    def parse(t: pa.Table) -> pa.Table:
        tabs = [paorc.ORCFile(pa.BufferReader(x.as_py())).read()
                for x in t["bytes"]]
        return pa.concat_tables(tabs).select(cols)

    return rd.read_binary_files(path).map_batches(
        parse, batch_format="pyarrow")


def dedup_threshold_sweep(sf_dir: str, driver_max: int = 262_144):
    """Dedup-quality THRESHOLD SWEEP — the calibration report a
    pipeline owner reads before picking a near-dup cutoff: for each
    simhash Hamming radius h ∈ 0..3, how many candidate pairs fire
    and what fraction are TRUE near-dups by exact 3-gram Jaccard
    ≥ 0.5 (cumulative precision per radius). Composes the lossless
    banded simhash chain with the exact verifier — an operator EVAL,
    the same completeness-critic pattern as ndcg/auc but aimed at the
    dedup family.

    Scale shape: candidate pairs come from the salted banded chain
    (never all-pairs); the verify fetches ONLY candidate docs' texts
    via a pushed ``is_in`` filter under a row gate (the
    `_verified_jaccard_pairs` driver-path convention); the sweep
    itself is a ≤4-row fold. Rows-only (golden): simhash/Jaccard are
    stable_hash/md5-shingle based, not SQL-expressible."""
    from rendler_ray.functions.text import jaccard_sets, ngram_set

    pairs_ds = simhash_near_dup_pairs(sf_dir).materialize()
    npairs = pairs_ds.count()
    assert npairs <= driver_max, \
        f"candidate pairs {npairs} exceed gate {driver_max}"
    empty = pa.table({"ham_max": pa.array([], pa.int64()),
                      "n_pairs": pa.array([], pa.int64()),
                      "n_true": pa.array([], pa.int64()),
                      "precision_e6": pa.array([], pa.int64())})
    if npairs == 0:
        return empty
    pt = pa.concat_tables(
        pairs_ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    ids = sorted({int(x) for c in ("a", "b")
                  for x in pt[c].to_pylist()})
    docs = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda t: t.filter(pc.is_in(t["doc_id"],
                                    value_set=pa.array(ids))),
        batch_format="pyarrow")
    texts = {}
    for b in docs.iter_batches(batch_size=None, batch_format="pyarrow"):
        texts.update(zip(b["doc_id"].to_pylist(),
                         b["text"].to_pylist()))
    shingles = {i: ngram_set(texts[i]) for i in ids}
    ham = pt["hamming"].to_numpy(zero_copy_only=False)
    true = np.array([jaccard_sets(shingles[int(a)],
                                  shingles[int(b)]) >= 0.5
                     for a, b in zip(pt["a"].to_pylist(),
                                     pt["b"].to_pylist())])
    rows = []
    for h in range(4):
        m = ham <= h
        np_, nt = int(m.sum()), int((m & true).sum())
        rows.append((h, np_, nt,
                     1_000_000 * nt // np_ if np_ else 0))
    return pa.table({
        "ham_max": pa.array([r[0] for r in rows], pa.int64()),
        "n_pairs": pa.array([r[1] for r in rows], pa.int64()),
        "n_true": pa.array([r[2] for r in rows], pa.int64()),
        "precision_e6": pa.array([r[3] for r in rows], pa.int64())})


def interval_join_attribution(sf_dir: str):
    """Stream-stream INTERVAL join (attribution window): for each
    'purchase' event, the count and cents-sum of the SAME user's 'view'
    events in the preceding hour (v.ts > p.ts − 1h AND v.ts ≤ p.ts) —
    the marketing-attribution / feature-backfill shape a bounded
    stream-stream join produces. Differs from :func:`asof_join_events`
    (nearest ONE row) in that every row inside the bound contributes.

    Composition: ``groupby(user_id)`` co-locates each user's history
    (the same partitioning key every per-user op reuses), then a fully
    vectorized double-``searchsorted`` + prefix-sum merge per group —
    O(n log n) per user, never a per-pair explode, and the 1 h bound
    means state stays O(window) at streaming scale. Cents fixed-point
    per ROW before the prefix sum (house float rule)."""
    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])
    hour_us = 3600 * 1_000_000

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["event_type"] == "purchase"]
        if not len(p):
            return pd.DataFrame({
                "purchase_id": pd.Series([], dtype=np.int64),
                "user_id": pd.Series([], dtype=np.int64),
                "purchase_epoch": pd.Series([], dtype=np.int64),
                "n_views_1h": pd.Series([], dtype=np.int64),
                "views_value_c": pd.Series([], dtype=np.int64)})
        p = p.sort_values(["ts", "event_id"], kind="stable")
        v = g[g["event_type"] == "view"].sort_values("ts", kind="stable")
        p_ts = p["ts"].to_numpy("datetime64[us]").astype(np.int64)
        v_ts = v["ts"].to_numpy("datetime64[us]").astype(np.int64)
        cents = np.rint(v["value"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(cents)])
        lo = np.searchsorted(v_ts, p_ts - hour_us, side="right")
        hi = np.searchsorted(v_ts, p_ts, side="right")
        return pd.DataFrame({
            "purchase_id": p["event_id"].to_numpy(np.int64),
            "user_id": p["user_id"].to_numpy(np.int64),
            "purchase_epoch": p_ts // 1_000_000,
            "n_views_1h": (hi - lo).astype(np.int64),
            "views_value_c": cum[hi] - cum[lo]})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pandas")


INTERVAL_JOIN_SQL = """
SELECT p.event_id AS purchase_id, p.user_id,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_epoch,
       count(v.event_id) AS n_views_1h,
       CAST(COALESCE(sum(CAST(round(v.value * 100) AS BIGINT)), 0)
            AS BIGINT) AS views_value_c
FROM events p
LEFT JOIN events v
  ON v.user_id = p.user_id AND v.event_type = 'view'
 AND v.ts > p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id, p.ts
"""


def loo_target_encode_events(sf_dir: str):
    """Leave-one-out TARGET ENCODING of ``event_type`` against
    ``value`` (the CatBoost/feature-store categorical encoder, with
    the self-row excluded so the feature carries no target leakage):
    for each event, the mean of every OTHER same-type event's value.
    Emitted as an EXACT int64 rational (numerator cents, denominator
    count) — the :func:`rrf_hybrid_search_docs` convention — so no
    float division crosses the engine boundary; singleton categories
    get den = 0 rather than a NULL-vs-NaN ambiguity.

    Scale shape: the per-category stats table is one bounded
    aggregate (≤ distinct event types) folded on the driver and
    broadcast into a single stateless map pass — the corpus is
    scanned twice and shuffled never."""
    stats = _read(sf_dir, "events", ["event_type", "value"])

    def combine(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "c": _cents(t["value"]).to_numpy(zero_copy_only=False)})
        g = df.groupby("event_type", sort=False).agg(
            s=("c", "sum"), n=("c", "size")).reset_index()
        return pa.table({"event_type": pa.array(g["event_type"],
                                                pa.string()),
                         "s": pa.array(g["s"], pa.int64()),
                         "n": pa.array(g["n"], pa.int64())})

    sums: dict[str, int] = {}
    cnts: dict[str, int] = {}
    for b in (stats.map_batches(combine, batch_format="pyarrow")
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        for ty, s, n in zip(b["event_type"].to_pylist(),
                            b["s"].to_pylist(), b["n"].to_pylist()):
            sums[ty] = sums.get(ty, 0) + int(s)
            cnts[ty] = cnts.get(ty, 0) + int(n)

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def encode(t: pa.Table) -> pa.Table:
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        s = np.array([sums[x] for x in ty], np.int64)
        n = np.array([cnts[x] for x in ty], np.int64)
        return pa.table({
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "enc_num_c": pa.array(s - c, pa.int64()),
            "enc_den": pa.array(n - 1, pa.int64())})

    return ds.map_batches(encode, batch_format="pyarrow")


LOO_ENCODE_SQL = """
SELECT event_id, event_type,
       CAST(sum(c) OVER (PARTITION BY event_type) - c AS BIGINT)
         AS enc_num_c,
       CAST(count(*) OVER (PARTITION BY event_type) - 1 AS BIGINT)
         AS enc_den
FROM (SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events)
"""


def grouping_sets_revenue(sf_dir: str):
    """Explicit GROUP BY GROUPING SETS ((p,s), (p), (s)) with the
    GROUPING() id column — the remaining grouping-lattice SQL surface
    next to :func:`rollup_revenue` / :func:`cube_revenue` (an explicit
    non-lattice set list plus the gid a BI layer keys legends on).
    Same shuffle-the-base-once plan: the detail level is the only
    aggregate that touches the base table; both marginals re-aggregate
    the small detail result. gid follows SQL's bit rule
    2·grouping(p) + grouping(s) ∈ {0, 1, 2}."""
    ds = _read(sf_dir, "orders",
               ["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderpriority": t["o_orderpriority"],
                         "o_orderstatus": t["o_orderstatus"],
                         "price_c": _cents(t["o_totalprice"])})

    def set_const(col: str | None, gid: int):
        def fn(t: pa.Table) -> pa.Table:
            if col is not None:
                i = t.schema.get_field_index(col)
                t = t.set_column(
                    i, col, pa.array(["ALL"] * t.num_rows, pa.string()))
            return t.append_column(
                "gid", pa.array([gid] * t.num_rows, pa.int64()))
        return fn

    keys = ["o_orderpriority", "o_orderstatus"]
    aggs = (Sum("revenue_c", alias_name="revenue_c"),
            Sum("n_orders", alias_name="n_orders"))
    detail = (ds.map_batches(cents, batch_format="pyarrow")
              .groupby(keys)
              .aggregate(Sum("price_c", alias_name="revenue_c"),
                         Count(alias_name="n_orders"))).materialize()
    by_prio = (detail.map_batches(set_const("o_orderstatus", 1),
                                  batch_format="pyarrow")
               .groupby(keys + ["gid"]).aggregate(*aggs))
    by_stat = (detail.map_batches(set_const("o_orderpriority", 2),
                                  batch_format="pyarrow")
               .groupby(keys + ["gid"]).aggregate(*aggs))
    detail_g = detail.map_batches(set_const(None, 0),
                                  batch_format="pyarrow")
    cols = keys + ["gid", "revenue_c", "n_orders"]
    return detail_g.select_columns(cols).union(
        by_prio.select_columns(cols), by_stat.select_columns(cols))


GROUPING_SETS_SQL = """
SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_c,
       count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), (o_orderstatus))
"""


def _lang_eval_confusion(sf_dir: str) -> dict[tuple[str, str], int]:
    """Shared fold for the lang-ID eval ops: confusion counts of the
    heuristic predictor (:func:`lang_id_docs`) against the corpus
    ``lang`` labels. One shuffle-free map pass with a per-batch
    (true, pred) combiner; the driver fold is bounded by classes²
    (≤ 64 keys), never the corpus."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def combine(t: pa.Table) -> pa.Table:
        t = F_text.lang_id_batch(t)
        df = pd.DataFrame({
            "t": t["lang"].to_numpy(zero_copy_only=False),
            "p": t["lang_pred"].to_numpy(zero_copy_only=False)})
        g = df.groupby(["t", "p"], sort=False).size().reset_index(name="n")
        return pa.table({"t": pa.array(g["t"], pa.string()),
                         "p": pa.array(g["p"], pa.string()),
                         "n": pa.array(g["n"], pa.int64())})

    conf: dict[tuple[str, str], int] = {}
    for b in (ds.map_batches(combine, batch_format="pyarrow")
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        for t_, p_, n in zip(b["t"].to_pylist(), b["p"].to_pylist(),
                             b["n"].to_pylist()):
            conf[(t_, p_)] = conf.get((t_, p_), 0) + int(n)
    return conf


_LANG_EVAL_CTE = f"""
pred AS ({LANG_ID_SQL}),
j AS (SELECT d.lang AS t, p.lang_pred AS p
      FROM documents d JOIN pred p ON d.doc_id = p.doc_id)
"""


def prf1_lang_eval(sf_dir: str):
    """Per-class precision / recall / F1 of the heuristic language
    classifier against the corpus labels — the model-card eval table
    next to the AUC / NDCG / calibration / confusion entries. All
    ratios are e6 fixed-point via truncating integer division (every
    quantity is non-negative, so Python ``//`` and DuckDB ``//``
    agree); a class never predicted (or never true) gets −1 rather
    than a NULL-vs-NaN ambiguity. Classes = union of true and
    predicted labels, so systematic over-prediction of an unseen label
    is visible instead of silently dropped."""
    conf = _lang_eval_confusion(sf_dir)
    classes = sorted({t for t, _ in conf} | {p for _, p in conf})
    rows = []
    for c in classes:
        n_true = sum(n for (t, _), n in conf.items() if t == c)
        n_pred = sum(n for (_, p), n in conf.items() if p == c)
        n_corr = conf.get((c, c), 0)
        prec = 1_000_000 * n_corr // n_pred if n_pred else -1
        rec = 1_000_000 * n_corr // n_true if n_true else -1
        if not n_pred or not n_true:
            f1 = -1
        elif prec + rec == 0:
            # n_correct may be >0 yet both e6 ratios truncate to 0 at
            # extreme imbalance — guard the denominator, not n_correct
            f1 = 0
        else:
            f1 = 2 * prec * rec // (prec + rec)
        rows.append((c, n_true, n_pred, n_corr, prec, rec, f1))
    return pa.table({
        "lang": pa.array([r[0] for r in rows], pa.string()),
        "n_true": pa.array([r[1] for r in rows], pa.int64()),
        "n_pred": pa.array([r[2] for r in rows], pa.int64()),
        "n_correct": pa.array([r[3] for r in rows], pa.int64()),
        "prec_e6": pa.array([r[4] for r in rows], pa.int64()),
        "rec_e6": pa.array([r[5] for r in rows], pa.int64()),
        "f1_e6": pa.array([r[6] for r in rows], pa.int64())})


PRF1_LANG_SQL = f"""
WITH {_LANG_EVAL_CTE},
cls AS (SELECT DISTINCT t AS lang FROM j
        UNION SELECT DISTINCT p FROM j),
m AS (SELECT c.lang,
             (SELECT count(*) FROM j WHERE j.t = c.lang) AS n_true,
             (SELECT count(*) FROM j WHERE j.p = c.lang) AS n_pred,
             (SELECT count(*) FROM j
              WHERE j.t = c.lang AND j.p = c.lang) AS n_correct
      FROM cls c)
SELECT lang, n_true, n_pred, n_correct,
       prec_e6, rec_e6,
       CASE WHEN prec_e6 < 0 OR rec_e6 < 0 THEN -1
            WHEN prec_e6 + rec_e6 = 0 THEN 0
            ELSE 2 * prec_e6 * rec_e6 // (prec_e6 + rec_e6) END AS f1_e6
FROM (SELECT lang, n_true, n_pred, n_correct,
             CASE WHEN n_pred = 0 THEN -1
                  ELSE 1000000 * n_correct // n_pred END AS prec_e6,
             CASE WHEN n_true = 0 THEN -1
                  ELSE 1000000 * n_correct // n_true END AS rec_e6
      FROM m)
"""


def kappa_lang_eval(sf_dir: str):
    """Cohen's kappa of the heuristic language classifier vs the corpus
    labels — chance-corrected agreement, the honest headline number
    when the label distribution is skewed (accuracy alone rewards
    majority-class collapse). EXACT integer rational:
    κ = (N·Σdiag − Σₖ rowₖ·colₖ) / (N² − Σₖ rowₖ·colₖ), emitted as
    (kappa_num, kappa_den) in Python arbitrary-precision ints — at
    real corpus scale N² overflows int64, which is why the SQL mirror
    computes in HUGEINT and casts back only at the end."""
    conf = _lang_eval_confusion(sf_dir)
    classes = sorted({t for t, _ in conf} | {p for _, p in conf})
    n = sum(conf.values())
    agree = sum(conf.get((c, c), 0) for c in classes)
    pe = sum(sum(v for (t, _), v in conf.items() if t == c)
             * sum(v for (_, p), v in conf.items() if p == c)
             for c in classes)
    return pa.table({"n": pa.array([n], pa.int64()),
                     "n_agree": pa.array([agree], pa.int64()),
                     "kappa_num": pa.array([n * agree - pe], pa.int64()),
                     "kappa_den": pa.array([n * n - pe], pa.int64())})


KAPPA_LANG_SQL = f"""
WITH {_LANG_EVAL_CTE},
agg AS (SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(CASE WHEN t = p THEN 1 ELSE 0 END) AS HUGEINT)
                 AS n_agree
        FROM j),
marg AS (SELECT lang,
                (SELECT CAST(count(*) AS HUGEINT) FROM j
                 WHERE j.t = lang) AS n_true,
                (SELECT CAST(count(*) AS HUGEINT) FROM j
                 WHERE j.p = lang) AS n_pred
         FROM (SELECT DISTINCT t AS lang FROM j
               UNION SELECT DISTINCT p FROM j)),
pe AS (SELECT sum(n_true * n_pred) AS s FROM marg)
SELECT CAST(n AS BIGINT) AS n,
       CAST(n_agree AS BIGINT) AS n_agree,
       CAST(n * n_agree - s AS BIGINT) AS kappa_num,
       CAST(n * n - s AS BIGINT) AS kappa_den
FROM agg, pe
"""


def event_anomaly_hours(sf_dir: str, z2_num: int = 2, z2_den: int = 1):
    """SEASONAL-baseline anomaly detection over the event stream: flag
    hourly buckets whose count deviates from their OWN hour-of-week
    cohort (the traffic-monitoring shape — Monday-9am compares to
    other Monday-9ams, not to 3am). Exact integer test: with cohort
    sums S = Σc, Q = Σc² over nh buckets, z² > T is
    (c·nh − S)² > T·(nh·Q − S²) — no float variance ever computed.
    Because the flagged bucket is INCLUDED in its own cohort stats,
    z² ≤ nh − 1 identically, so T must sit below nh − 1; the default
    T = 2 suits the testdata's ~4-week span (at years of data raise T
    — it's a parameter). A cohort with zero variance can never flag
    (lhs = 0 for every member).

    Scale shape: one per-batch count combine + one groupby to hourly
    buckets (cardinality = corpus hours — bounded: a decade is 87.6k
    rows), then the cohort fold and the exact filter run on the driver
    in Python ints (the squares overflow int64 at real scale; the SQL
    mirror computes in HUGEINT)."""
    ds = _read(sf_dir, "events", ["ts"])

    def buckets(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        b = us // 3_600_000_000
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(ub, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    hourly = (ds.map_batches(buckets, batch_format="pyarrow")
              .groupby("bucket").aggregate(Sum("n", alias_name="n_events")))

    rows: list[tuple[int, int]] = []
    for bt in hourly.iter_batches(batch_size=None, batch_format="pyarrow"):
        rows.extend(zip(bt["bucket"].to_pylist(),
                        bt["n_events"].to_pylist()))
    stats: dict[int, list[int]] = {}
    hows = []
    for b, c in rows:
        how = ((b // 24 + 4) % 7) * 24 + b % 24
        hows.append(how)
        s = stats.setdefault(how, [0, 0, 0])
        s[0] += 1
        s[1] += c
        s[2] += c * c
    out_b, out_h, out_n = [], [], []
    for (b, c), how in zip(rows, hows):
        nh, s, q = stats[how]
        if (c * nh - s) ** 2 * z2_den > z2_num * (nh * q - s * s):
            out_b.append(b * 3600)
            out_h.append(how)
            out_n.append(c)
    return pa.table({"bucket_epoch": pa.array(out_b, pa.int64()),
                     "how": pa.array(out_h, pa.int64()),
                     "n_events": pa.array(out_n, pa.int64())})


EVENT_ANOMALY_SQL = """
WITH b AS (SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket,
                  count(*) AS n_events
           FROM events GROUP BY 1),
b2 AS (SELECT bucket * 3600 AS bucket_epoch,
              ((bucket // 24 + 4) % 7) * 24 + bucket % 24 AS how,
              n_events
       FROM b),
s AS (SELECT how, CAST(count(*) AS HUGEINT) AS nh,
             CAST(sum(n_events) AS HUGEINT) AS sc,
             CAST(sum(n_events * n_events) AS HUGEINT) AS qc
      FROM b2 GROUP BY how)
SELECT b2.bucket_epoch, b2.how, CAST(b2.n_events AS BIGINT) AS n_events
FROM b2 JOIN s USING (how)
WHERE (b2.n_events * nh - sc) * (b2.n_events * nh - sc)
      > 2 * (nh * qc - sc * sc)
"""


def knn_outlier_docs(sf_dir: str, k: int = 4, n_out: int = 20):
    """Distance-based OUTLIER detection in embedding space (Ramaswamy
    SIGMOD'00's kNN-distance score): rank every vector by the SUM of
    its k nearest cosine similarities (low total similarity = isolated
    = outlier) and emit the top ``n_out`` outliers — the "weird
    documents" screen a curation pass runs before training. Pure
    composition over the exact kNN graph (:func:`knn_graph_embeddings`
    / ``functions/ann.py::BlockKnnScan`` — O(n²/p) blocked scan, no
    shuffle); per-vector scores come from one bounded
    groupby(vec_id) over exactly k rows each, then a distributed
    sort + limit. The integer sim_e6 sum over exactly k addends is
    order-free, so the oracle hash-matches. At 10⁷+ vectors swap the
    exact graph for the in-tree LSH/IVF candidates (score semantics
    unchanged)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    g = F_ann.knn_graph(ds, k=k)
    return (g.groupby("vec_id")
            .aggregate(Sum("sim_e6", alias_name="knn_sim_sum_e6"))
            .sort(["knn_sim_sum_e6", "vec_id"])
            .limit(n_out))


KNN_OUTLIER_SQL = f"""
SELECT vec_id, CAST(sum(sim_e6) AS BIGINT) AS knn_sim_sum_e6
FROM ({_knn_sql()}) g
GROUP BY vec_id
ORDER BY knn_sim_sum_e6 ASC, vec_id ASC
LIMIT 20
"""


_BLOOM_QUERY_TOKENS = ("hash", "dup", "gradientzzz")


def _bloom_token_search(sf_dir: str, tokens=_BLOOM_QUERY_TOKENS,
                        n_shards: int = 8, m_bits: int = 1 << 16):
    """Shared engine for :func:`bloom_index_prune_docs`: build a
    per-shard token Bloom index over a hash-partitioned copy of the
    corpus, then answer token searches reading ONLY shards whose bloom
    admits the token. Returns (results Dataset | Table, prune stats).

    Index build is one shuffle-free pass: each batch emits one
    (shard, bloom bytes) partial per shard it touches; the driver
    OR-folds ≤ shards × batches rows of ``m_bits/8`` bytes each (8 KB
    at the default — the whole index for a 100-TB corpus at 4096
    shards is 32 MB, a driver constant). k = 4 hash probes via
    Kirsch–Mitzenmacher double hashing over the same two SipHash64
    streams the dup-span family uses. Bloom filters have NO false
    negatives, so pruned search is EXACT — false positives only cost
    extra shard reads (bounded by the classic (1−e^{−kn/m})^k rate).
    """
    import pandas.util as pdu

    from rendler_ray.functions.canon import stable_hash64
    from rendler_ray.storage import write_partitioned

    sink = os.path.join(_ckpt_root(),
                        f"bloomidx-{os.path.basename(sf_dir)}")
    import shutil

    shutil.rmtree(sink, ignore_errors=True)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    write_partitioned(ds, sink, "doc_id", num_buckets=n_shards)

    nbytes = m_bits // 8
    k_hashes = 4

    def _bit_positions(toks: np.ndarray) -> np.ndarray:
        h1 = pdu.hash_array(toks, categorize=False)
        h2 = pdu.hash_array(toks, hash_key="rendlerbloomidx!",
                            categorize=False)
        j = np.arange(k_hashes, dtype=np.uint64)
        return ((h1[:, None] + j[None, :] * h2[:, None])
                % np.uint64(m_bits)).astype(np.int64)

    def build(t: pa.Table) -> pa.Table:
        ids = np.asarray([str(x) for x in t["doc_id"].to_pylist()],
                         dtype=object)
        shard = (stable_hash64(ids) % np.uint64(n_shards)).astype(np.int64)
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = toks.values.to_numpy(zero_copy_only=False).astype(object)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        out_s, out_b = [], []
        for s in np.unique(shard):
            m = shard[par] == s
            u = np.unique(flat[m]) if m.any() else np.array([], object)
            bits = np.zeros(m_bits, np.uint8)
            if len(u):
                bits[_bit_positions(u).ravel()] = 1
            out_s.append(int(s))
            out_b.append(np.packbits(bits).tobytes())
        return pa.table({"shard": pa.array(out_s, pa.int64()),
                         "bloom": pa.array(out_b, pa.binary())})

    blooms = {s: np.zeros(nbytes, np.uint8) for s in range(n_shards)}
    for bt in (ds.map_batches(build, batch_format="pyarrow")
               .iter_batches(batch_size=None, batch_format="pyarrow")):
        for s, b in zip(bt["shard"].to_pylist(), bt["bloom"].to_pylist()):
            blooms[int(s)] |= np.frombuffer(b, np.uint8)

    qarr = np.asarray(list(tokens), dtype=object)
    qbits = _bit_positions(qarr)
    unpacked = {s: np.unpackbits(b) for s, b in blooms.items()}
    survive = {t: [s for s in range(n_shards)
                   if unpacked[s][qbits[i]].all()]
               for i, t in enumerate(tokens)}

    import glob as _glob

    legs = []
    files_read = 0
    files_total = len(_glob.glob(os.path.join(sink, "bucket=*",
                                              "*.parquet")))
    for tok in tokens:
        files = [f for s in survive[tok]
                 for f in sorted(_glob.glob(os.path.join(
                     sink, f"bucket={s}", "*.parquet")))]
        files_read += len(files)
        if not files:
            continue

        def match(t: pa.Table, tok=tok) -> pa.Table:
            # exact vectorized membership: any token equals tok
            toks = pc.split_pattern(t["text"].combine_chunks(), " ")
            flat = toks.values.to_numpy(zero_copy_only=False)
            par = pc.list_parent_indices(toks).to_numpy(
                zero_copy_only=False)
            eq = flat == tok
            keep = np.zeros(t.num_rows, bool)
            keep[par[eq]] = True
            ids = t["doc_id"].to_numpy(zero_copy_only=False)[keep]
            return pa.table({
                "token": pa.array([tok] * len(ids), pa.string()),
                "doc_id": pa.array(ids, pa.int64())})

        legs.append(rd.read_parquet(files)
                    .map_batches(match, batch_format="pyarrow"))

    stats = {"files_total": files_total, "files_read": files_read,
             "surviving_shards": {t: len(s) for t, s in survive.items()}}
    if not legs:
        return pa.table({"token": pa.array([], pa.string()),
                         "doc_id": pa.array([], pa.int64())}), stats
    out = legs[0] if len(legs) == 1 else legs[0].union(*legs[1:])
    return out, stats


def bloom_index_prune_docs(sf_dir: str):
    """Token search through a per-shard BLOOM data-skipping index —
    the text-side sibling of :func:`zonemap_prune_events` (range zone
    maps skip files by min/max; bloom filters skip files by set
    membership, the Parquet/Iceberg bloom-index design): the corpus is
    hash-partitioned into shards, a per-shard token bloom is built in
    one pass, and each query token reads only admitting shards.
    EXACT (bloom filters never false-negative; the surviving shards
    are re-verified with an exact vectorized membership pass), which
    is why a plain full-scan SQL oracle can hash-match it. The query
    set includes an absent token, whose every shard is skipped without
    touching storage — the pruning win rare tokens get at scale."""
    out, _stats = _bloom_token_search(sf_dir)
    return out


BLOOM_INDEX_SQL = f"""
WITH q(token) AS (VALUES {", ".join(f"('{t}')"
                                    for t in _BLOOM_QUERY_TOKENS)})
SELECT q.token, d.doc_id
FROM documents d
JOIN q ON list_contains(string_split(d.text, ' '), q.token)
"""


_PHRASE_QUERY = ("hash", "join")


def phrase_search_docs(sf_dir: str):
    """PHRASE query over a positional inverted index: docs where the
    tokens 'hash' and 'join' appear ADJACENT in order, with the exact
    occurrence count — the "exact phrase" search mode a plain
    term-postings index (:func:`inverted_index_postings`) cannot
    answer. One shuffle-free pass: per batch, positions of each phrase
    term are extracted (the positional-postings slice a full index
    would store) and the adjacency test is a vectorized
    intersect-on-(pos+1); only matching docs leave the task. The
    corpus text is single-space tokenized, so the SQL mirror's padded
    substring test is exactly token adjacency (documented assumption;
    the Ray side operates on the same split)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    t1, t2 = _PHRASE_QUERY

    def match(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = toks.values.to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        offs = np.asarray(toks.offsets)
        pos = np.arange(len(flat), dtype=np.int64) - offs[par]
        # positional postings for the two phrase terms, this batch
        m1 = flat == t1
        m2 = flat == t2
        # adjacency: (doc, p) in postings(t1) and (doc, p+1) in
        # postings(t2) — compare on a packed (doc, pos) key
        k1 = par[m1] * (1 << 32) + pos[m1] + 1
        k2 = par[m2] * (1 << 32) + pos[m2]
        hits = np.intersect1d(k1, k2, assume_unique=True) >> 32
        if not len(hits):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_occ": pa.array([], pa.int64())})
        docs, cnt = np.unique(hits, return_counts=True)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[docs]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_occ": pa.array(cnt, pa.int64())})

    return ds.map_batches(match, batch_format="pyarrow")


PHRASE_SEARCH_SQL = f"""
WITH t AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS p
  FROM documents)
SELECT a.doc_id, count(*) AS n_occ
FROM t a JOIN t b ON b.doc_id = a.doc_id AND b.p = a.p + 1
WHERE a.tok = '{_PHRASE_QUERY[0]}' AND b.tok = '{_PHRASE_QUERY[1]}'
GROUP BY a.doc_id
"""


_MRL_DIMS = (8, 16, 32, 64)


def matryoshka_recall_eval(sf_dir: str, k: int = 4, n_queries: int = 4):
    """Embedding-DIMENSION ablation (the Matryoshka/MRL eval): for
    each truncation dim d ∈ {8, 16, 32, 64}, how many of the full-dim
    top-k neighbors the d-dim prefix cosine still retrieves, per
    query — the table that decides how small a serving index can go.
    One streaming pass over the corpus computes per-batch partial
    top-k for EVERY (query, dim) pair simultaneously (queries × dims
    × k driver state — broadcast query matrix, never a shuffle);
    truncated slices are re-normalized per dim, ranks break ties on
    (sim_e6 desc, vec_id asc) exactly as the SQL mirror's window.
    Self-matches are excluded so the overlap measures real neighbors."""
    qv = _query_vecs(sf_dir, n_queries)
    qids = sorted(qv)
    qmat = np.stack([qv[i] for i in qids]).astype(np.float64)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = F_ann.batch_to_matrix(t, "embedding").astype(np.float64)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        out_d, out_q, out_v, out_s = [], [], [], []
        for d in _MRL_DIMS:
            a = F_ann._normalize(m[:, :d])
            b = F_ann._normalize(qmat[:, :d])
            sims = np.rint(a @ b.T * 1_000_000).astype(np.int64)
            for j, qid in enumerate(qids):
                s = sims[:, j]
                keep = ids != qid
                s_k, id_k = s[keep], ids[keep]
                top = np.lexsort((id_k, -s_k))[:k]
                out_d.extend([d] * len(top))
                out_q.extend([qid] * len(top))
                out_v.extend(id_k[top])
                out_s.extend(s_k[top])
        return pa.table({"dim": pa.array(out_d, pa.int64()),
                         "query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim_e6": pa.array(out_s, pa.int64())})

    tops: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for bt in (ds.map_batches(partial, batch_format="pyarrow")
               .iter_batches(batch_size=None, batch_format="pyarrow")):
        for d, q, v, s in zip(bt["dim"].to_pylist(),
                              bt["query_id"].to_pylist(),
                              bt["vec_id"].to_pylist(),
                              bt["sim_e6"].to_pylist()):
            tops.setdefault((d, q), []).append((int(s), int(v)))
    final: dict[tuple[int, int], set[int]] = {}
    for key, cand in tops.items():
        cand.sort(key=lambda x: (-x[0], x[1]))
        final[key] = {v for _, v in cand[:k]}
    rows = []
    for q in qids:
        full = final.get((max(_MRL_DIMS), q), set())
        for d in _MRL_DIMS:
            n = len(final.get((d, q), set()) & full)
            rows.append((d, q, n, 1_000_000 * n // k))
    return pa.table({
        "dim": pa.array([r[0] for r in rows], pa.int64()),
        "query_id": pa.array([r[1] for r in rows], pa.int64()),
        "n_overlap": pa.array([r[2] for r in rows], pa.int64()),
        "recall_e6": pa.array([r[3] for r in rows], pa.int64())})


def _mrl_sql(k: int = 4, n_queries: int = 4) -> str:
    dims_values = ", ".join(f"({d})" for d in _MRL_DIMS)
    return f"""
WITH dims(dim) AS (VALUES {dims_values}),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id < {n_queries}),
s AS (SELECT dims.dim, q.query_id, e.vec_id,
             CAST(round(list_cosine_similarity(
                 CAST(e.embedding[1:dims.dim] AS DOUBLE[]),
                 CAST(q.qv[1:dims.dim] AS DOUBLE[])) * 1000000)
                 AS BIGINT) AS sim_e6
      FROM dims CROSS JOIN q CROSS JOIN embeddings e
      WHERE e.vec_id != q.query_id),
r AS (SELECT dim, query_id, vec_id,
             row_number() OVER (PARTITION BY dim, query_id
                                ORDER BY sim_e6 DESC, vec_id ASC) AS rk
      FROM s QUALIFY rk <= {k}),
full_k AS (SELECT query_id, vec_id FROM r WHERE dim = {max(_MRL_DIMS)})
SELECT d.dim, d.query_id,
       CAST(count(f.vec_id) AS BIGINT) AS n_overlap,
       CAST(1000000 * count(f.vec_id) // {k} AS BIGINT) AS recall_e6
FROM r d LEFT JOIN full_k f
  ON f.query_id = d.query_id AND f.vec_id = d.vec_id
GROUP BY d.dim, d.query_id
"""


MATRYOSHKA_SQL = _mrl_sql()


def dq_constraint_audit(sf_dir: str):
    """Declared-CONSTRAINT data-quality audit (the dbt-tests / Deequ
    shape): uniqueness, not-null, value-range and accepted-values
    rules over the orders and events tables, one row per rule with its
    violation count — passing rules report 0 rather than vanishing, so
    the audit table is the complete contract. Scalar rules fold
    per-batch partials on the driver (≤ rules × blocks rows); the
    uniqueness rule is n − exact-distinct, with the distinct count via
    per-batch key dedup → one groupby (the
    :func:`profile_orders_columns` shape — hot keys collapse in the
    combiner before the exchange, and the driver never holds a key
    set)."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])
    events = _read(sf_dir, "events", ["event_type", "value"])
    accepted = ("view", "click", "purchase", "signup", "refund")

    def o_part(t: pa.Table) -> pa.Table:
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "null_cust": pa.array([t["o_custkey"].null_count], pa.int64()),
            "bad_price": pa.array([int((~(price > 0)).sum())], pa.int64())})

    n_orders = null_cust = bad_price = 0
    for bt in (orders.map_batches(o_part, batch_format="pyarrow")
               .iter_batches(batch_size=None, batch_format="pyarrow")):
        n_orders += int(bt["n"][0].as_py())
        null_cust += int(bt["null_cust"][0].as_py())
        bad_price += int(bt["bad_price"][0].as_py())

    def o_keys(t: pa.Table) -> pa.Table:
        return pa.table({"k": pc.unique(t["o_orderkey"].combine_chunks())})

    n_distinct = (orders.map_batches(o_keys, batch_format="pyarrow")
                  .groupby("k").aggregate(Count(alias_name="x")).count())
    dup_rows = n_orders - n_distinct

    def e_part(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        bad_t = int((~np.isin(et, accepted)).sum())
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "bad_type": pa.array([bad_t], pa.int64()),
            "neg_val": pa.array([int((val < 0).sum())], pa.int64())})

    n_events = bad_type = neg_val = 0
    for bt in (events.map_batches(e_part, batch_format="pyarrow")
               .iter_batches(batch_size=None, batch_format="pyarrow")):
        n_events += int(bt["n"][0].as_py())
        bad_type += int(bt["bad_type"][0].as_py())
        neg_val += int(bt["neg_val"][0].as_py())

    rules = [
        ("orders.o_orderkey unique", n_orders, dup_rows),
        ("orders.o_custkey not_null", n_orders, null_cust),
        ("orders.o_totalprice positive", n_orders, bad_price),
        ("events.event_type accepted_values", n_events, bad_type),
        ("events.value non_negative", n_events, neg_val)]
    return pa.table({
        "rule": pa.array([r[0] for r in rules], pa.string()),
        "n_rows": pa.array([r[1] for r in rules], pa.int64()),
        "n_violations": pa.array([r[2] for r in rules], pa.int64())})


DQ_AUDIT_SQL = """
SELECT 'orders.o_orderkey unique' AS rule,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
         AS n_violations
FROM orders
UNION ALL
SELECT 'orders.o_custkey not_null', count(*),
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders.o_totalprice positive', count(*),
       CAST(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'events.event_type accepted_values', count(*),
       CAST(sum(CASE WHEN event_type IN
                ('view', 'click', 'purchase', 'signup', 'refund')
                THEN 0 ELSE 1 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'events.value non_negative', count(*),
       CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM events
"""


def association_rules_types(sf_dir: str):
    """Frequent-itemset / ASSOCIATION-RULE mining over (user, day)
    baskets — the market-basket staple (whole-history baskets saturate:
    every active user eventually fires every type, making all lifts
    exactly 1; daily baskets carry real signal): for every
    co-occurring type pair a < b, support counts and the lift
    n_both·n_baskets / (n_a·n_b) as an exact int64 rational — lift > 1
    is genuine association, < 1 repulsion, and no float division
    crosses the engine boundary.

    Scale shape (the item vocabulary is BOUNDED, baskets are not):
    one distinct exchange on a packed (user, day, item-bit) int64 key
    and one grouped bit-SUM per basket — both through the
    sorted-group-agg fast path — then masks reduce in a shuffle-free
    per-batch combiner (t·(t−1)/2 counters per batch, folded on the
    driver). Summing DISTINCT bit rows per basket IS the bitwise OR
    (each bit appears at most once after the dedup), which is how the
    basket bitmask is built without an OR aggregate. Packing bound:
    user_id < 2⁴¹ (user·2¹⁶(day)·2⁶(bit) must fit int64); epoch-day
    wraps at 2¹⁶ (~179 years) — both asserted."""
    from rendler_ray.functions.groupagg import sorted_group_agg

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    types: set[str] = set()
    for bt in (ds.map_batches(
            lambda t: pa.table({"ty": pc.unique(
                t["event_type"].combine_chunks())}),
            batch_format="pyarrow")
            .iter_batches(batch_size=None, batch_format="pyarrow")):
        types.update(bt["ty"].to_pylist())
    tlist = sorted(types)
    assert len(tlist) <= 63, "item vocabulary must fit an int64 bitmask"
    tidx = {t_: i for i, t_ in enumerate(tlist)}

    def pack(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        assert not len(u) or int(u.max()) < (1 << 41)
        day = (t["ts"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000) & 0xFFFF
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        ix = np.array([tidx[x] for x in ty], np.int64)
        bk = (u << 16) | day
        return pa.table({"pk": pa.array(
            np.unique(bk * 64 + ix), pa.int64())})

    distinct = sorted_group_agg(
        ds.map_batches(pack, batch_format="pyarrow"),
        "pk", [("pk", "count", "x")])

    def to_bits(t: pa.Table) -> pa.Table:
        pk = t["pk"].to_numpy(zero_copy_only=False)
        return pa.table({
            "basket": pa.array(pk // 64, pa.int64()),
            "bit": pa.array(
                np.int64(1) << (pk % 64).astype(np.int64), pa.int64())})

    masks = sorted_group_agg(
        distinct.map_batches(to_bits, batch_format="pyarrow"),
        "basket", [("bit", "sum", "mask")])

    nt = len(tlist)
    pairs = [(i, j) for i in range(nt) for j in range(i + 1, nt)]

    def pair_counts(t: pa.Table) -> pa.Table:
        m = t["mask"].to_numpy(zero_copy_only=False)
        ii, jj, nn = [], [], []
        for i, j in pairs:
            both = int((((m >> i) & 1) & ((m >> j) & 1)).sum())
            if both:
                ii.append(i)
                jj.append(j)
                nn.append(both)
        singles = [int(((m >> i) & 1).sum()) for i in range(nt)]
        return pa.table({
            "i": pa.array(ii + list(range(nt)), pa.int64()),
            "j": pa.array(jj + [-1] * nt, pa.int64()),
            "n": pa.array(nn + singles, pa.int64()),
            "users": pa.array([len(m)] * (len(ii) + nt), pa.int64())})

    n_both: dict[tuple[int, int], int] = {}
    n_single = [0] * nt
    n_baskets = 0
    for bt in (masks.map_batches(pair_counts, batch_format="pyarrow")
               .iter_batches(batch_size=None, batch_format="pyarrow")):
        first = True
        for i, j, n, us in zip(bt["i"].to_pylist(), bt["j"].to_pylist(),
                               bt["n"].to_pylist(),
                               bt["users"].to_pylist()):
            if first:  # one basket-count partial per combiner output
                n_baskets += int(us)
                first = False
            if j < 0:
                n_single[i] += int(n)
            else:
                n_both[(i, j)] = n_both.get((i, j), 0) + int(n)
    out = sorted(n_both)
    return pa.table({
        "type_a": pa.array([tlist[i] for i, _ in out], pa.string()),
        "type_b": pa.array([tlist[j] for _, j in out], pa.string()),
        "n_a": pa.array([n_single[i] for i, _ in out], pa.int64()),
        "n_b": pa.array([n_single[j] for _, j in out], pa.int64()),
        "n_both": pa.array([n_both[k] for k in out], pa.int64()),
        "n_baskets": pa.array([n_baskets] * len(out), pa.int64()),
        "lift_num": pa.array([n_both[k] * n_baskets for k in out],
                             pa.int64()),
        "lift_den": pa.array([n_single[i] * n_single[j]
                              for i, j in out], pa.int64())})


ASSOC_RULES_SQL = """
WITH ut AS (SELECT DISTINCT user_id,
                   CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                   event_type
            FROM events),
nb AS (SELECT CAST(count(DISTINCT (user_id, day)) AS BIGINT)
         AS n_baskets FROM ut),
m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM ut GROUP BY event_type),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b
        ON b.user_id = a.user_id AND b.day = a.day
       AND a.event_type < b.event_type
      GROUP BY 1, 2)
SELECT type_a, type_b, ma.cnt AS n_a, mb.cnt AS n_b, n_both, n_baskets,
       n_both * n_baskets AS lift_num, ma.cnt * mb.cnt AS lift_den
FROM p
JOIN m ma ON ma.event_type = type_a
JOIN m mb ON mb.event_type = type_b
CROSS JOIN nb
"""


def event_type_trigrams_top(sf_dir: str, k: int = 10):
    """SEQUENTIAL pattern mining: the top-k most frequent length-3
    event-type sequences over each user's time-ordered stream — the
    n-gram extension of :func:`event_transition_matrix` (bigrams) that
    path/affordance analyses read. ``groupby(user)`` co-locates each
    stream (the shared per-user partitioning key); trigram extraction
    and the per-group count are vectorized; the global aggregate is a
    bounded groupby (≤ types³ keys) + one deterministic
    (n desc, trigram asc) sort+limit."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        et = g["event_type"].to_numpy()
        if len(et) < 3:
            return pd.DataFrame({"trigram": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        tri = pd.Series(np.char.add(np.char.add(
            np.char.add(et[:-2].astype(str), ">"),
            np.char.add(et[1:-1].astype(str), ">")),
            et[2:].astype(str)))
        vc = tri.value_counts()
        return pd.DataFrame({"trigram": vc.index.to_numpy(object),
                             "n": vc.to_numpy(np.int64)})

    return (ds.groupby("user_id").map_groups(per_user,
                                             batch_format="pandas")
            .groupby("trigram").aggregate(Sum("n", alias_name="n"))
            .sort(["n", "trigram"], descending=[True, False])
            .limit(k))


TRIGRAM_SEQ_SQL = """
WITH s AS (SELECT user_id, event_type,
                  lead(event_type, 1) OVER w AS t2,
                  lead(event_type, 2) OVER w AS t3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_type || '>' || t2 || '>' || t3 AS trigram,
       CAST(count(*) AS BIGINT) AS n
FROM s WHERE t3 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, trigram ASC LIMIT 10
"""


def sample_bias_chi2(sf_dir: str):
    """SAMPLER-quality audit: per-source χ² contribution of the
    deterministic ~10% Bernoulli sample (:func:`sample_docs_deterministic`'s
    md5 rule) against the corpus source distribution — the
    representativeness check a sampling stage ships next to its output
    (a biased sampler shows up as a large cell before it poisons a
    downstream mix). Exact integers end-to-end: with corpus N, sample
    n, per-source c and o, the cell is
    χ²_s·e6 = 10⁶·(o·N − n·c)² // (N·n·c) — Python arbitrary precision
    on the driver (the square overflows int64 at real scale; the SQL
    mirror computes in HUGEINT). One streaming pass computes both
    per-source counts (sources are bounded; the fold is
    sources × blocks rows)."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def part(t: pa.Table) -> pa.Table:
        src = t["source"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_pylist()
        samp = np.fromiter(
            (hashlib.md5(f"{i}-s1".encode()).hexdigest()[:2] < "1a"
             for i in ids), bool, len(ids))
        us = np.unique(src)
        return pa.table({
            "source": pa.array(us, pa.string()),
            "c": pa.array([int((src == s).sum()) for s in us], pa.int64()),
            "o": pa.array([int(samp[src == s].sum()) for s in us],
                          pa.int64())})

    cs: dict[str, int] = {}
    os_: dict[str, int] = {}
    for bt in (ds.map_batches(part, batch_format="pyarrow")
               .iter_batches(batch_size=None, batch_format="pyarrow")):
        for s, c, o in zip(bt["source"].to_pylist(), bt["c"].to_pylist(),
                           bt["o"].to_pylist()):
            cs[s] = cs.get(s, 0) + int(c)
            os_[s] = os_.get(s, 0) + int(o)
    n_corpus = sum(cs.values())
    n_sample = sum(os_.values())
    srcs = sorted(cs)
    chi = [10**6 * (os_[s] * n_corpus - n_sample * cs[s]) ** 2
           // (n_corpus * n_sample * cs[s]) for s in srcs]
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "n_corpus": pa.array([cs[s] for s in srcs], pa.int64()),
        "n_sample": pa.array([os_[s] for s in srcs], pa.int64()),
        "chi2_e6": pa.array(chi, pa.int64())})


SAMPLE_BIAS_SQL = """
WITH s AS (SELECT source, CAST(count(*) AS HUGEINT) AS c,
                  CAST(sum(CASE WHEN substr(md5(
                      CAST(doc_id AS VARCHAR) || '-s1'), 1, 2) < '1a'
                      THEN 1 ELSE 0 END) AS HUGEINT) AS o
           FROM documents GROUP BY source),
t AS (SELECT sum(c) AS nc, sum(o) AS ns FROM s)
SELECT source,
       CAST(c AS BIGINT) AS n_corpus,
       CAST(o AS BIGINT) AS n_sample,
       CAST(1000000 * (o * nc - ns * c) * (o * nc - ns * c)
            // (nc * ns * c) AS BIGINT) AS chi2_e6
FROM s, t
"""


def winnow_copy_pairs(sf_dir: str, tau: int = 2, df_max: int = 20,
                      driver_max: int = 5_000_000):
    """COPY detection over winnowing fingerprints (the MOSS pipeline,
    Schleimer SIGMOD'03): doc pairs sharing ≥ ``tau`` of their
    keep-smallest window hashes — the match/join step on top of
    :func:`doc_fingerprint_winnow` (which only EMITS fingerprints).
    Candidate generation is the df-capped inverted-index similarity
    join (the :func:`gram_containment_pairs` convention): a fingerprint
    shared by more than ``df_max`` docs is boilerplate and generates
    no pairs (mirrored in the brute-force pytest so the op stays
    exact by definition). Pair counting folds under a row gate —
    postings are ≤ keep(=4) rows per doc, so candidates are bounded by
    4·df_max per doc, never all-pairs. Rows-only (golden): the rolling
    hash is not SQL-expressible."""
    from rendler_ray.functions.text import rolling_hash_fingerprint

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids, fps = [], []
        for i, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for fp in set(rolling_hash_fingerprint(x).split("-")):
                ids.append(i)
                fps.append(fp)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "fp": pa.array(fps, pa.string())})

    post = ds.map_batches(explode, batch_format="pyarrow").materialize()
    npost = post.count()
    assert npost <= driver_max, \
        f"postings {npost} exceed driver gate {driver_max}"
    # driver fold: group postings by fp, emit df-capped pairs
    from collections import defaultdict

    bucket: dict[str, list[int]] = defaultdict(list)
    for bt in post.iter_batches(batch_size=None, batch_format="pyarrow"):
        for i, fp in zip(bt["doc_id"].to_pylist(), bt["fp"].to_pylist()):
            bucket[fp].append(int(i))
    pairs: dict[tuple[int, int], int] = defaultdict(int)
    for docs in bucket.values():
        if not 2 <= len(docs) <= df_max:
            continue
        docs = sorted(set(docs))
        for x in range(len(docs)):
            for y in range(x + 1, len(docs)):
                pairs[(docs[x], docs[y])] += 1
    keep = sorted((k, v) for k, v in pairs.items() if v >= tau)
    return pa.table({
        "a": pa.array([k[0] for k, _ in keep], pa.int64()),
        "b": pa.array([k[1] for k, _ in keep], pa.int64()),
        "n_shared": pa.array([v for _, v in keep], pa.int64())})


def quantile_normalize_chars(sf_dir: str):
    """QUANTILE NORMALIZATION across sources (the batch-effect
    correction microarray analysis popularized, applied to per-source
    feature drift): each doc's ``n_chars`` is replaced by the GLOBAL
    value at its within-source quantile, so every source ends up with
    an identical feature distribution — the strongest form of
    per-source calibration (percentile scores normalize the RANK;
    this normalizes the VALUE). Mapping is exact-integer:
    pos = (rank−1)·(N−1) // (n_s−1) for n_s > 1 (singleton sources map
    to the global median position (N−1)//2).

    Scale shape: one global range-partitioned sort with a distributed
    zip-with-index serves BOTH sides — per-source ranks come from the
    (source, value, id) sort plus a broadcast one-row-per-source
    offset table (the :func:`source_percentile_scores` machinery), the
    global value table from the (value, id) sort — glued by one hash
    join on the integer position. No per-group sort, no group
    materialization."""
    from rendler_ray.util import with_row_seq

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    keyed = ds.materialize()  # consumed three times (two sorts + counts)
    ranked = with_row_seq(keyed, ["source", "n_chars", "doc_id"],
                          start=1, column="grank")
    gpos = with_row_seq(keyed, ["n_chars", "doc_id"],
                        start=0, column="pos").map_batches(
        lambda t: pa.table({"pos": t["pos"],
                            "qn_chars": t["n_chars"]}),
        batch_format="pyarrow")
    counts = (keyed.groupby("source").aggregate(Count(alias_name="n"))
              .take_all())  # bounded: one row per source
    counts.sort(key=lambda r: r["source"])  # with_row_seq's sort order
    offs, ns, cum = {}, {}, 0
    for r in counts:
        offs[r["source"]] = cum
        ns[r["source"]] = int(r["n"])
        cum += int(r["n"])
    n_total = cum
    state = ray.put((offs, ns))

    def to_pos(t: pa.Table) -> pa.Table:
        o, n = ray.get(state)
        srcs = t["source"].to_pylist()
        g = t["grank"].to_numpy(zero_copy_only=False)
        off = np.array([o[s] for s in srcs], np.int64)
        nn = np.array([n[s] for s in srcs], np.int64)
        rank = g - off
        pos = np.where(nn > 1,
                       (rank - 1) * (n_total - 1) // np.maximum(nn - 1, 1),
                       (n_total - 1) // 2)
        return pa.table({"doc_id": t["doc_id"], "source": t["source"],
                         "n_chars": t["n_chars"],
                         "pos": pa.array(pos, pa.int64())})

    lhs = ranked.map_batches(to_pos, batch_format="pyarrow")
    j = lhs.join(gpos, join_type="inner", num_partitions=8,
                 on=("pos",))
    return j.select_columns(["doc_id", "source", "n_chars", "qn_chars"])


QUANTILE_NORM_SQL = """
WITH r AS (SELECT doc_id, source, n_chars,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY n_chars, doc_id) AS rk,
                  count(*) OVER (PARTITION BY source) AS ns,
                  count(*) OVER () AS n
           FROM documents),
g AS (SELECT n_chars AS qn_chars,
             row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS pos
      FROM documents)
SELECT r.doc_id, r.source, r.n_chars, g.qn_chars
FROM r JOIN g
  ON g.pos = CASE WHEN r.ns > 1
                  THEN (r.rk - 1) * (r.n - 1) // (r.ns - 1)
                  ELSE (r.n - 1) // 2 END
"""


def twap_value_by_user(sf_dir: str):
    """TIME-WEIGHTED average (TWAP) of each user's ``value`` stream —
    the aggregate irregular samples need (a plain mean over-weights
    bursts; TWAP weights each observation by how long it was current,
    the LOCF integral). Emitted as an EXACT int64 rational per user:
    numerator Σ cents·Δt(µs) over consecutive same-user events,
    denominator the stream's span in µs — no float division crosses
    the engine boundary; single-event users get 0/0. Bounds: the
    numerator is ≤ max_cents·span_µs, which fits int64 for month-scale
    spans (the SQL mirror sums in HUGEINT and casts back —
    at year-scale spans widen the fixed point first).

    ``groupby(user_id)`` co-locates each stream (the shared per-user
    key); the per-group integral is one vectorized diff + dot."""
    ds = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        c = np.rint(g["value"].to_numpy(np.float64) * 100
                    ).astype(np.int64)
        num = int(np.dot(c[:-1], np.diff(us))) if len(us) > 1 else 0
        return pd.DataFrame({
            "user_id": [np.int64(g["user_id"].iloc[0])],
            "twap_num_c_us": [np.int64(num)],
            "twap_den_us": [np.int64(us[-1] - us[0])]})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pandas")


TWAP_SQL = """
WITH s AS (SELECT user_id, epoch_us(ts) AS t,
                  CAST(round(value * 100) AS BIGINT) AS c,
                  lead(epoch_us(ts)) OVER (
                      PARTITION BY user_id
                      ORDER BY ts, event_id) AS nt
           FROM events)
SELECT user_id,
       CAST(COALESCE(sum(CAST(c AS HUGEINT) * (nt - t)), 0) AS BIGINT)
         AS twap_num_c_us,
       CAST(max(t) - min(t) AS BIGINT) AS twap_den_us
FROM s
GROUP BY user_id
"""


def _walk_hash(start: int, step: int, node: int) -> int:
    """Deterministic walk-choice hash, mirrored verbatim in SQL:
    first 15 hex digits of md5('start-step-node') as an int (the
    classifier-weight convention — 60 bits, always non-negative, so
    Python % and DuckDB % agree)."""
    import hashlib

    return int(hashlib.md5(
        f"{start}-{step}-{node}".encode()).hexdigest()[:15], 16)


def random_walks_crawl(sf_dir: str, steps: int = 4, max_start: int = 8,
                       driver_max: int = 5_000_000):
    """Deterministic RANDOM WALKS over the crawl-shaped graph — the
    sampling primitive under DeepWalk/node2vec embeddings and
    graph-sampled minibatching: from every node with id ≤ 8, walk
    ``steps`` hops, choosing at node x on step t the neighbor ranked
    H(start, t, x) mod deg(x) among x's v-ascending neighbors. The
    hash-mod choice makes the walk REPRODUCIBLE and — unusually for a
    "random" walk — exactly SQL-expressible, so the oracle is a
    WITH RECURSIVE CTE over the identical md5 rule (the second
    recursive oracle in the registry, after BFS).

    Scale shape, two forms (equality pytested): below ``driver_max``
    edges the adjacency folds on the driver; above it the walk runs
    against a DISTRIBUTED v-indexed adjacency (rank/deg assigned once
    per node) with two shuffle-free broadcast-filtered scans per step
    (one to learn deg(frontier), one to fetch the rank-matched row) —
    per-step work is O(frontier) rows out of the scan, never the
    graph."""
    both = _orders_graph_edges(sf_dir).map_batches(
        lambda t: pa.table({
            "u": pa.array(np.concatenate([
                t["a"].to_numpy(zero_copy_only=False),
                t["b"].to_numpy(zero_copy_only=False)]), pa.int64()),
            "v": pa.array(np.concatenate([
                t["b"].to_numpy(zero_copy_only=False),
                t["a"].to_numpy(zero_copy_only=False)]), pa.int64())}),
        batch_format="pyarrow").materialize()
    n_edges = both.count()

    if n_edges <= driver_max:
        adj: dict[int, list[int]] = {}
        for bt in both.iter_batches(batch_size=None,
                                    batch_format="pyarrow"):
            for u, v in zip(bt["u"].to_pylist(), bt["v"].to_pylist()):
                adj.setdefault(int(u), []).append(int(v))
        for u in adj:
            adj[u].sort()
        walks = _drive_walks(adj, steps, max_start)
    else:  # distributed indexed-adjacency form
        def rank_group(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("v", kind="stable").reset_index(drop=True)
            g["rank"] = np.arange(len(g), dtype=np.int64)
            g["deg"] = np.int64(len(g))
            return g

        nbr = both.groupby("u").map_groups(
            rank_group, batch_format="pandas").materialize()
        walks = _distributed_walks(nbr, steps, max_start)

    return pa.table({
        "start": pa.array([w[0] for w in walks], pa.int64()),
        "step": pa.array([w[1] for w in walks], pa.int64()),
        "node": pa.array([w[2] for w in walks], pa.int64())})


def _drive_walks(adj: dict[int, list[int]], steps: int,
                 max_start: int) -> list[tuple[int, int, int]]:
    walks = []
    for s in sorted(u for u in adj if u <= max_start):
        node = s
        walks.append((s, 0, node))
        for t in range(steps):
            nbrs = adj[node]
            node = nbrs[_walk_hash(s, t, node) % len(nbrs)]
            walks.append((s, t + 1, node))
    return walks


def _distributed_walks(nbr, steps: int,
                       max_start: int) -> list[tuple[int, int, int]]:
    """Walk against the indexed adjacency with two broadcast-filtered
    scans per step; ``nbr`` is materialized so scans are block
    filters, not recomputation."""
    starts = set()
    for bt in (nbr.map_batches(
            lambda t: t.filter(pc.and_(
                pc.less_equal(t["u"], max_start),
                pc.equal(t["rank"], 0))).select(["u"]),
            batch_format="pyarrow")
            .iter_batches(batch_size=None, batch_format="pyarrow")):
        starts.update(bt["u"].to_pylist())
    frontier = {int(s): int(s) for s in sorted(starts)}
    walks = [(s, 0, s) for s in sorted(frontier)]
    for t in range(steps):
        nodes = sorted(set(frontier.values()))
        deg_rows = nbr.map_batches(
            lambda b, ns=nodes: b.filter(pc.and_(
                pc.is_in(b["u"], value_set=pa.array(ns, pa.int64())),
                pc.equal(b["rank"], 0))).select(["u", "deg"]),
            batch_format="pyarrow")
        deg = {}
        for bt in deg_rows.iter_batches(batch_size=None,
                                        batch_format="pyarrow"):
            deg.update(zip(bt["u"].to_pylist(), bt["deg"].to_pylist()))
        want: dict[tuple[int, int], list[int]] = {}
        for s, node in frontier.items():
            k_ = (node, _walk_hash(s, t, node) % int(deg[node]))
            want.setdefault(k_, []).append(s)  # walkers may collide
        keys = pa.array([u * (1 << 32) + r for u, r in sorted(want)],
                        pa.int64())
        hit_rows = nbr.map_batches(
            lambda b, ks=keys: b.filter(pc.is_in(pc.add(
                pc.multiply(b["u"], 1 << 32), b["rank"]),
                value_set=ks)).select(["u", "rank", "v"]),
            batch_format="pyarrow")
        nxt = {}
        for bt in hit_rows.iter_batches(batch_size=None,
                                        batch_format="pyarrow"):
            for u, r, v in zip(bt["u"].to_pylist(),
                               bt["rank"].to_pylist(),
                               bt["v"].to_pylist()):
                nxt[(int(u), int(r))] = int(v)
        frontier = {s: nxt[k] for k, ss in want.items() for s in ss}
        walks.extend((s, t + 1, n) for s, n in frontier.items())
    walks.sort()
    return walks


RANDOM_WALKS_SQL = """
WITH RECURSIVE e AS (
  SELECT DISTINCT
    LEAST(o_custkey, o_orderkey % 1500 + 1)    AS a,
    GREATEST(o_custkey, o_orderkey % 1500 + 1) AS b
  FROM orders
  WHERE o_custkey <> o_orderkey % 1500 + 1),
bo AS (SELECT a AS u, b AS v FROM e
       UNION ALL SELECT b AS u, a AS v FROM e),
nbr AS (SELECT u, v,
               row_number() OVER (PARTITION BY u ORDER BY v) - 1 AS rk,
               count(*) OVER (PARTITION BY u) AS deg
        FROM bo),
walk(start, step, node) AS (
  SELECT u, 0, u FROM (SELECT DISTINCT u FROM bo WHERE u <= 8)
  UNION ALL
  SELECT w.start, w.step + 1, n.v
  FROM walk w JOIN nbr n ON n.u = w.node
   AND n.rk = CAST('0x' || substr(md5(
           CAST(w.start AS VARCHAR) || '-' ||
           CAST(w.step AS VARCHAR) || '-' ||
           CAST(w.node AS VARCHAR)), 1, 15) AS BIGINT) % n.deg
  WHERE w.step < 4)
SELECT CAST(start AS BIGINT) AS start, CAST(step AS BIGINT) AS step,
       CAST(node AS BIGINT) AS node
FROM walk
"""
