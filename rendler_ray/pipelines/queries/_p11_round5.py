# ==================================================== round-5 op families
# (final-round additions: part-table coverage, privacy, graph-partition
# quality, LLM mixing, embedding-representation analysis, lakehouse
# time travel, summarization eval)


def part_brand_margins(sf_dir: str):
    """Fact-to-dimension profitability rollup over the PART table
    (the one driver table no other entry read): lineitem ⨝ part on
    partkey, margin = discounted revenue − retail cost, grouped by
    brand. The dimension side (200…20k rows) broadcasts ONCE via
    ``ray.put`` — a numpy searchsorted lookup inside each batch — so
    the fact table never shuffles; the per-batch combine leaves ≤
    |brands| rows per block for the final ≤25-group aggregate. All
    money is per-ROW half-away-from-zero cents before any sum (the
    established exact-integer convention)."""
    part = pa.concat_tables(
        _read(sf_dir, "part", ["p_partkey", "p_brand", "p_retailprice"])
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    keys = part["p_partkey"].to_numpy()
    order = np.argsort(keys)
    keys = keys[order]
    brands = np.asarray(part["p_brand"].to_pylist(), dtype=object)[order]
    retail_cents = _round_half_away(
        part["p_retailprice"].to_numpy().astype(np.float64)
        * 100.0)[order].astype(np.int64)
    dim_ref = ray.put((keys, brands, retail_cents))

    def partial(t: pa.Table) -> pa.Table:
        keys_, brands_, retail_ = ray.get(dim_ref)
        pk = t["l_partkey"].to_numpy()
        idx = np.searchsorted(keys_, pk)
        idx = np.clip(idx, 0, len(keys_) - 1)
        hit = keys_[idx] == pk
        idx, pk = idx[hit], pk[hit]
        ext = t["l_extendedprice"].to_numpy()[hit].astype(np.float64)
        disc = t["l_discount"].to_numpy()[hit].astype(np.float64)
        qty = t["l_quantity"].to_numpy()[hit].astype(np.int64)
        rev = _round_half_away((ext * (1.0 - disc)) * 100.0).astype(
            np.int64)
        cost = retail_[idx] * qty
        df = pd.DataFrame({"p_brand": brands_[idx], "rev": rev,
                           "cost": cost})
        g = df.groupby("p_brand", sort=False).agg(
            n_items=("rev", "size"), revenue_cents=("rev", "sum"),
            retail_cost_cents=("cost", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice",
                "l_discount"])
    agg = (li.map_batches(partial, batch_format="pyarrow")
           .groupby("p_brand")
           .aggregate(Sum("n_items", alias_name="n_items"),
                      Sum("revenue_cents", alias_name="revenue_cents"),
                      Sum("retail_cost_cents",
                          alias_name="retail_cost_cents")))

    def finish(t: pa.Table) -> pa.Table:
        return t.append_column(
            "margin_cents", pc.subtract(t["revenue_cents"],
                                        t["retail_cost_cents"]))

    return agg.map_batches(finish, batch_format="pyarrow")


PART_BRAND_MARGINS_SQL = """
SELECT p_brand,
       count(*) AS n_items,
       CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)
                * CAST(l_quantity AS BIGINT)) AS BIGINT)
         AS retail_cost_cents,
       CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100)
                     AS BIGINT))
            - sum(CAST(round(p_retailprice * 100) AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS BIGINT)
         AS margin_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def l_diversity_orders(sf_dir: str):
    """Privacy audit beside k_anonymity_audit: l-diversity of the
    sensitive attribute (custkey) within each quasi-identifier group
    (order priority × order month). Two bounded aggregates: a
    per-batch drop-duplicates combine feeds ONE (prio, month, cust)
    distinct groupby, whose output (≤ groups × |custkeys| rows, each
    carrying its multiplicity) collapses to the ≤60-row QI table —
    the sensitive-value sets themselves never reach the driver."""
    orders = _read(sf_dir, "orders",
                   ["o_orderpriority", "o_orderdate", "o_custkey"])

    def triple(t: pa.Table) -> pa.Table:
        out = pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "month": pc.cast(pc.month(t["o_orderdate"]), pa.int64()),
            "o_custkey": t["o_custkey"]})
        return out.group_by(
            ["o_orderpriority", "month", "o_custkey"]).aggregate(
            [([], "count_all")]).rename_columns(
            ["o_orderpriority", "month", "o_custkey", "cnt"])

    per_sensitive = (orders.map_batches(triple, batch_format="pyarrow")
                     .groupby(["o_orderpriority", "month", "o_custkey"])
                     .aggregate(Sum("cnt", alias_name="cnt")))
    return (per_sensitive.groupby(["o_orderpriority", "month"])
            .aggregate(Sum("cnt", alias_name="n_rows"),
                       Count(alias_name="l_distinct")))


L_DIVERSITY_SQL = """
SELECT o_orderpriority, CAST(month(o_orderdate) AS BIGINT) AS month,
       count(*) AS n_rows,
       count(DISTINCT o_custkey) AS l_distinct
FROM orders
GROUP BY o_orderpriority, month(o_orderdate)
"""


def partition_modularity_graph(sf_dir: str):
    """Newman modularity of the HASH partitioner (community = node
    % 16) over the shared orders-derived graph — the metric that
    scores a distribution key's community quality before committing a
    graph layout to it. One pass over the distinct edge list emits
    per-batch ≤16-row partials (intra-community edge counts, degree
    sums, edge totals); the ≤16-group fold computes each community's
    exact-integer modularity term  (4·m·e_c − D_c²)·10⁶ // 4·m²
    (floor division, HUGEINT-safe in the SQL mirror). No adjacency
    structure is ever built."""
    edges = _orders_graph_edges(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        ca, cb = a % 16, b % 16
        rows = {}
        intra = np.bincount(ca[ca == cb], minlength=16)
        dega = np.bincount(ca, minlength=16)
        degb = np.bincount(cb, minlength=16)
        nedge = np.bincount(ca, minlength=16)
        rows = pa.table({
            "community": pa.array(np.arange(16), pa.int64()),
            "e_in": pa.array(intra, pa.int64()),
            "deg_sum": pa.array(dega + degb, pa.int64()),
            "n_edges": pa.array(nedge, pa.int64())})
        return rows

    agg = (edges.map_batches(partial, batch_format="pyarrow")
           .groupby("community")
           .aggregate(Sum("e_in", alias_name="e_in"),
                      Sum("deg_sum", alias_name="deg_sum"),
                      Sum("n_edges", alias_name="n_edges")))
    t = pa.concat_tables(agg.iter_batches(batch_size=None,
                                          batch_format="pyarrow"))
    m = int(pc.sum(t["n_edges"]).as_py() or 0)
    comm = t["community"].to_numpy()
    e_in = t["e_in"].to_numpy()
    deg = t["deg_sum"].to_numpy()
    keep = deg > 0
    den = 4 * m * m
    q_terms = [
        int(1_000_000 * (4 * m * int(e) - int(d) * int(d))) // den
        for e, d in zip(e_in[keep], deg[keep])]
    order = np.argsort(comm[keep])
    out = pa.table({
        "community": pa.array(comm[keep][order], pa.int64()),
        "e_in": pa.array(e_in[keep][order], pa.int64()),
        "deg_sum": pa.array(deg[keep][order], pa.int64()),
        "q_term_e6": pa.array(np.asarray(q_terms)[order], pa.int64())})
    return out


PARTITION_MODULARITY_SQL = """
WITH e AS (
  SELECT DISTINCT
    LEAST(o_custkey, o_orderkey % 1500 + 1)    AS a,
    GREATEST(o_custkey, o_orderkey % 1500 + 1) AS b
  FROM orders
  WHERE o_custkey != o_orderkey % 1500 + 1
), m AS (SELECT count(*) AS m FROM e),
deg AS (
  SELECT v % 16 AS community, count(*) AS deg_sum
  FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
  GROUP BY v % 16
), ein AS (
  SELECT a % 16 AS community, count(*) AS e_in
  FROM e WHERE a % 16 = b % 16 GROUP BY a % 16
), q AS (
  SELECT deg.community AS community,
         COALESCE(ein.e_in, 0) AS e_in,
         deg.deg_sum AS deg_sum,
         1000000 * (4 * CAST(m.m AS HUGEINT) * COALESCE(ein.e_in, 0)
                    - CAST(deg.deg_sum AS HUGEINT) * deg.deg_sum)
           AS num,
         4 * CAST(m.m AS HUGEINT) * m.m AS den
  FROM deg LEFT JOIN ein ON deg.community = ein.community, m
)
SELECT CAST(community AS BIGINT) AS community,
       CAST(e_in AS BIGINT) AS e_in,
       CAST(deg_sum AS BIGINT) AS deg_sum,
       CAST(CASE WHEN num >= 0 THEN num // den
                 ELSE -(((-num) + den - 1) // den) END
            AS BIGINT) AS q_term_e6
FROM q
ORDER BY community
"""


def unimax_mix_docs(sf_dir: str):
    """UniMax language mixing (Chung et al. '23): spend a global doc
    budget (half the corpus) as UNIFORMLY across languages as their
    sizes allow — integer water-fill over the per-language counts
    (languages smaller than the fair share keep everything; the slack
    redistributes to the rest), then deterministic md5-rank membership
    per language (the temperature-mix convention, salt ``-ux1``).
    The count table and the ≤|langs|-step water-fill are O(langs)
    driver state; each batch pre-prunes to its local per-lang quota so
    the groupby(lang) finisher never sees the corpus. The SQL oracle
    replays the identical fill through a recursive CTE in (n, lang)
    order."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    cnt = ds.groupby("lang").aggregate(Count(alias_name="n")).take_all()
    rows = sorted((int(r["n"]), r["lang"]) for r in cnt)
    budget = sum(n for n, _ in rows) // 2
    quota, remaining, left = {}, budget, len(rows)
    for n, lang in rows:
        fair = remaining // left
        take = min(n, fair)
        quota[lang] = take
        remaining -= take
        left -= 1
    qref = ray.put(quota)

    def rank_filter(df: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(qref)
        h = df["doc_id"].map(
            lambda i: hashlib.md5(f"{i}-ux1".encode()).hexdigest())
        df = df.assign(_h=h)
        rk = df.groupby("lang", sort=False)["_h"].rank(method="first")
        return df[rk <= df["lang"].map(qm)]

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return rank_filter(g)[["doc_id", "lang"]]

    pruned = ds.map_batches(rank_filter, batch_format="pandas")
    return pruned.groupby("lang").map_groups(finish,
                                             batch_format="pandas")


UNIMAX_MIX_SQL = """
WITH RECURSIVE cnt AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY lang
), tot AS (
  SELECT CAST(sum(n) // 2 AS BIGINT) AS b,
         CAST(count(*) AS BIGINT) AS l FROM cnt
), ord AS (
  SELECT lang, n, row_number() OVER (ORDER BY n, lang) AS rn FROM cnt
), wf AS (
  SELECT 0 AS rn, CAST(NULL AS VARCHAR) AS lang,
         CAST(0 AS BIGINT) AS quota, tot.b AS remaining,
         tot.l AS l_left
  FROM tot
  UNION ALL
  SELECT o.rn, o.lang,
         least(o.n, wf.remaining // wf.l_left) AS quota,
         wf.remaining - least(o.n, wf.remaining // wf.l_left),
         wf.l_left - 1
  FROM wf JOIN ord o ON o.rn = wf.rn + 1
), q AS (SELECT lang, quota FROM wf WHERE rn > 0)
SELECT doc_id, lang FROM (
  SELECT d.doc_id, d.lang, q.quota,
         row_number() OVER (
           PARTITION BY d.lang
           ORDER BY md5(CAST(d.doc_id AS VARCHAR) || '-ux1')) AS rn
  FROM documents d JOIN q USING (lang))
WHERE rn <= quota
"""


def doremi_domain_weights(sf_dir: str):
    """DoReMi-shaped domain reweighting (Xie et al. '23, one-proxy
    simplification): three exponentiated-gradient steps over the
    per-SOURCE proxy loss (1 − stopword fraction — the corpus's own
    fluency signal), starting from uniform weights. Every update is
    order-free and integer-exact between steps: the per-source loss
    comes from two exact integer sums (one bounded groupby), each step
    quantizes w·exp(η·loss) to an int64 BEFORE the normalizing sum
    (the per-addend-fixed-point convention), and renormalization is
    integer division — so the only floats are the per-source scalar
    expression trees, mirrored verbatim in the unrolled 3-stage SQL
    (numpy exp and DuckDB exp bit-agree — the logreg precedent)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    per_src = (ds.map_batches(F_text.quality_batch,
                              batch_format="pyarrow")
               .select_columns(["source", "n_tokens", "n_stopwords"])
               .groupby("source")
               .aggregate(Count(alias_name="n_docs"),
                          Sum("n_tokens", alias_name="t"),
                          Sum("n_stopwords", alias_name="s")))
    rows = sorted(per_src.take_all(), key=lambda r: r["source"])
    L = len(rows)
    srcs = [r["source"] for r in rows]
    n_docs = np.array([int(r["n_docs"]) for r in rows], np.int64)
    t = np.array([int(r["t"]) for r in rows], np.int64)
    s = np.array([int(r["s"]) for r in rows], np.int64)
    assert (t > 0).all()
    loss = 1.0 - (s.astype(np.float64) / t.astype(np.float64))
    w = np.full(L, 1_000_000 // L, dtype=np.int64)
    for _ in range(3):
        u = _round_half_away(
            w.astype(np.float64) * np.exp(0.5 * loss)).astype(np.int64)
        z = int(u.sum())
        w = np.array([int(ui) * 1_000_000 // z for ui in u], np.int64)
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "n_docs": pa.array(n_docs, pa.int64()),
        "loss_e6": pa.array(np.floor(1e6 * loss).astype(np.int64),
                            pa.int64()),
        "weight_e6": pa.array(w, pa.int64())})


DOREMI_SQL = """
WITH f AS (
  SELECT source,
         len(string_split(text, ' ')) AS nt,
         len(list_filter(string_split(text, ' '),
             x -> x IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) AS ns
  FROM documents
), b AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(nt) AS BIGINT) AS t, CAST(sum(ns) AS BIGINT) AS s
  FROM f GROUP BY source
), l AS (SELECT CAST(count(*) AS BIGINT) AS l FROM b),
base AS (
  SELECT source, n_docs,
         1 - CAST(s AS DOUBLE) / CAST(t AS DOUBLE) AS loss
  FROM b
), s1 AS (
  SELECT source, n_docs, loss,
         CAST(round((1000000 // l.l) * exp(0.5 * loss)) AS BIGINT) AS u
  FROM base, l
), w1 AS (
  SELECT source, n_docs, loss,
         CAST((u * 1000000) // (SELECT sum(u) FROM s1) AS BIGINT) AS w
  FROM s1
), s2 AS (
  SELECT source, n_docs, loss,
         CAST(round(w * exp(0.5 * loss)) AS BIGINT) AS u
  FROM w1
), w2 AS (
  SELECT source, n_docs, loss,
         CAST((u * 1000000) // (SELECT sum(u) FROM s2) AS BIGINT) AS w
  FROM s2
), s3 AS (
  SELECT source, n_docs, loss,
         CAST(round(w * exp(0.5 * loss)) AS BIGINT) AS u
  FROM w2
), w3 AS (
  SELECT source, n_docs, loss,
         CAST((u * 1000000) // (SELECT sum(u) FROM s3) AS BIGINT) AS w
  FROM s3
)
SELECT source, n_docs,
       CAST(floor(1000000 * loss) AS BIGINT) AS loss_e6,
       w AS weight_e6
FROM w3
"""


def embedding_cka_halves(sf_dir: str):
    """Uncentered linear CKA between the two HALVES of the embedding
    space (dims 1-32 vs 33-64) — the representation-similarity probe
    (Kornblith ICML'19) a layer/dimension ablation runs before
    truncating embeddings (Matryoshka-style). One shuffle-free stats
    pass: each batch e6-fixes its vectors and emits three 32×32
    integer cross-moment partials (XᵀY, XᵀX, YᵀY) as 1024 rows; a
    1024-group aggregate folds them, and the driver computes the three
    Frobenius sums as exact Python ints (c² overflows int64 — the
    anova two-limb precedent). The ONLY float is the final mirrored
    scalar tree 10⁶·Sxy/√(Sxx·Syy). Per-batch int64 partials are safe
    while Σ|e6·x|·max|e6·y| < 2⁶³ per dim pair — asserted."""
    import pyarrow.parquet as pq

    n = pq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")).metadata.num_rows
    ds = _read(sf_dir, "embeddings", ["embedding"])

    ii, jj = np.meshgrid(np.arange(1, 33), np.arange(1, 33),
                         indexing="ij")

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        assert np.abs(v).max() < 4.0
        e = _round_half_away(v * 1e6).astype(np.int64)
        x, y = e[:, :32], e[:, 32:]
        return pa.table({
            "i": pa.array(ii.ravel(), pa.int64()),
            "j": pa.array(jj.ravel(), pa.int64()),
            "cxy": pa.array((x.T @ y).ravel(), pa.int64()),
            "cxx": pa.array((x.T @ x).ravel(), pa.int64()),
            "cyy": pa.array((y.T @ y).ravel(), pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["i", "j"])
           .aggregate(Sum("cxy", alias_name="cxy"),
                      Sum("cxx", alias_name="cxx"),
                      Sum("cyy", alias_name="cyy")))
    t = pa.concat_tables(agg.iter_batches(batch_size=None,
                                          batch_format="pyarrow"))
    sxy = sum(int(c) * int(c) for c in t["cxy"].to_pylist())
    sxx = sum(int(c) * int(c) for c in t["cxx"].to_pylist())
    syy = sum(int(c) * int(c) for c in t["cyy"].to_pylist())
    cka_e6 = int(np.floor(
        1000000 * (np.float64(sxy)
                   / np.sqrt(np.float64(sxx) * np.float64(syy)))))
    return pa.table({"n": pa.array([n], pa.int64()),
                     "cka_e6": pa.array([cka_e6], pa.int64())})


EMBEDDING_CKA_SQL = """
WITH x AS (
  SELECT vec_id, i,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
           AS v
  FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
), cm AS (
  SELECT a.i AS i, b.i AS j,
         CAST(sum(CAST(a.v AS HUGEINT) * b.v) AS HUGEINT) AS c
  FROM x a JOIN x b USING (vec_id)
  WHERE NOT (a.i > 32 AND b.i <= 32)
  GROUP BY a.i, b.i
), s AS (
  SELECT
    sum(CASE WHEN i <= 32 AND j > 32 THEN c * c END) AS sxy,
    sum(CASE WHEN i <= 32 AND j <= 32 THEN c * c END) AS sxx,
    sum(CASE WHEN i > 32 AND j > 32 THEN c * c END) AS syy
  FROM cm
)
SELECT (SELECT count(*) FROM embeddings) AS n,
       CAST(floor(1000000 * (CAST(sxy AS DOUBLE)
                             / sqrt(CAST(sxx AS DOUBLE)
                                    * CAST(syy AS DOUBLE))))
            AS BIGINT) AS cka_e6
FROM s
"""


def docs_time_travel_read(sf_dir: str):
    """Lakehouse TIME TRAVEL: versioned snapshots + read-as-of. v0 is
    the base documents table; v1 applies the deterministic CDC batch
    (the merge_upsert semantics). Each version's parquet files land in
    their own directory and a manifest records version → file list
    (the Iceberg/Delta snapshot-log shape); the read-as-of path opens
    EXACTLY the manifest's files — never a directory listing — so a
    later compaction/vacuum can't change what a pinned version reads.
    The audit output (row count / checksum sums per version) is
    computed from the READ-BACK files, so the oracle pins the on-disk
    artifact, not the in-memory plan. Bounded per-batch partials +
    driver fold; nothing but the ≤2·#blocks stat rows leaves the
    cluster."""
    import json

    root = os.path.join(
        "/tmp/rendler_ray_tt",
        f"{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}")
    base = _read(sf_dir, "documents", ["doc_id", "n_chars", "source"])
    v1 = merge_upsert_docs(sf_dir)
    manifest = {}
    for ver, ds in ((0, base), (1, v1)):
        vdir = os.path.join(root, f"v{ver}")
        os.makedirs(vdir, exist_ok=True)
        for f in os.listdir(vdir):
            os.unlink(os.path.join(vdir, f))
        ds.write_parquet(vdir)
        manifest[ver] = sorted(
            os.path.join(vdir, f) for f in os.listdir(vdir)
            if f.endswith(".parquet"))
    with open(os.path.join(root, "manifest.json"), "w") as f:
        json.dump({str(k): v for k, v in manifest.items()}, f)

    with open(os.path.join(root, "manifest.json")) as f:
        mf = json.load(f)

    def stats(t: pa.Table) -> pa.Table:
        src = t["source"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_rows": pa.array([t.num_rows], pa.int64()),
            "sum_n_chars": pa.array(
                [int(pc.sum(t["n_chars"]).as_py() or 0)], pa.int64()),
            "sum_doc_id": pa.array(
                [int(pc.sum(t["doc_id"]).as_py() or 0)], pa.int64()),
            "n_patched": pa.array(
                [int((src == "patched").sum())], pa.int64())})

    out_rows = []
    for ver in sorted(mf):
        ds = rd.read_parquet(mf[ver])
        parts = pa.concat_tables(
            ds.map_batches(stats, batch_format="pyarrow")
            .iter_batches(batch_size=None, batch_format="pyarrow"))
        out_rows.append({
            "version": int(ver),
            "n_rows": int(pc.sum(parts["n_rows"]).as_py()),
            "sum_n_chars": int(pc.sum(parts["sum_n_chars"]).as_py()),
            "sum_doc_id": int(pc.sum(parts["sum_doc_id"]).as_py()),
            "n_patched": int(pc.sum(parts["n_patched"]).as_py())})
    return pa.Table.from_pylist(out_rows)


TIME_TRAVEL_SQL = """
WITH ch AS (
  SELECT doc_id, 'U' AS op, n_chars + 1000 AS n_chars,
         'patched' AS source FROM documents WHERE doc_id % 97 = 3
  UNION ALL
  SELECT doc_id, 'D', 0, '' FROM documents WHERE doc_id % 97 = 7
  UNION ALL
  SELECT doc_id + 1000000000, 'I', n_chars, 'inserted'
  FROM documents WHERE doc_id % 97 = 11
), v1 AS (
  SELECT d.doc_id,
         CASE WHEN ch.op = 'U' THEN ch.n_chars ELSE d.n_chars END
           AS n_chars,
         CASE WHEN ch.op = 'U' THEN 'patched' ELSE d.source END
           AS source
  FROM documents d LEFT JOIN ch ON d.doc_id = ch.doc_id
  WHERE ch.op IS NULL OR ch.op != 'D'
  UNION ALL
  SELECT doc_id, n_chars, source FROM ch WHERE op = 'I'
)
SELECT 0 AS version, count(*) AS n_rows,
       CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(count(*) FILTER (source = 'patched') AS BIGINT)
         AS n_patched
FROM documents
UNION ALL
SELECT 1, count(*), CAST(sum(n_chars) AS BIGINT),
       CAST(sum(doc_id) AS BIGINT),
       CAST(count(*) FILTER (source = 'patched') AS BIGINT)
FROM v1
"""


def rouge_l_adjacent_pairs(sf_dir: str):
    """ROUGE-L between each document and its successor within the same
    source (the summarization/paraphrase eval primitive, Lin '04) —
    token-level LCS over the first 64 whitespace tokens. Pairing is
    the sorted-neighborhood shape: one global sort + distributed
    zip-with-index (``with_row_seq``) + ONE int-keyed successor join —
    never a per-source group pull. The LCS DP is vectorized across the
    PAIR axis: 64×64 scalar steps of numpy maximum over the whole
    batch (token ids from an exact per-batch ``np.unique`` encode, so
    no hash collisions), i.e. the loop is over token positions, not
    rows. Output is exact-integer (lcs, truncated lengths, f_e6 =
    2·lcs·10⁶ // (la+lb)); no SQL oracle exists for LCS — golden +
    brute-force DP pytest."""
    from rendler_ray.util import with_row_seq

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    seq = with_row_seq(ds, ["source", "doc_id"], column="seq")

    left = seq.map_batches(
        lambda t: pa.table({
            "k": pc.add(t["seq"], 1), "doc_a": t["doc_id"],
            "text_a": t["text"], "source_a": t["source"]}),
        batch_format="pyarrow")
    right = seq.map_batches(
        lambda t: pa.table({
            "seq": t["seq"], "doc_b": t["doc_id"],
            "text_b": t["text"], "source_b": t["source"]}),
        batch_format="pyarrow")
    pairs = left.join(right, join_type="inner", num_partitions=8,
                      on=("k",), right_on=("seq",))

    def lcs_batch(t: pa.Table) -> pa.Table:
        same = pc.equal(t["source_a"], t["source_b"])
        t = t.filter(same)
        if t.num_rows == 0:
            return pa.table({
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "len_a": pa.array([], pa.int64()),
                "len_b": pa.array([], pa.int64()),
                "lcs": pa.array([], pa.int64()),
                "f_e6": pa.array([], pa.int64())})
        ta = [x.split(" ")[:64]
              for x in t["text_a"].to_numpy(zero_copy_only=False)]
        tb = [x.split(" ")[:64]
              for x in t["text_b"].to_numpy(zero_copy_only=False)]
        P = len(ta)
        la = np.array([len(x) for x in ta], np.int64)
        lb = np.array([len(x) for x in tb], np.int64)
        flat = np.array([w for xs in ta for w in xs]
                        + [w for xs in tb for w in xs], dtype=object)
        _, codes = np.unique(flat, return_inverse=True)
        A = np.full((P, 64), -1, np.int64)
        B = np.full((P, 64), -2, np.int64)
        pos = 0
        for r, xs in enumerate(ta):
            A[r, :len(xs)] = codes[pos:pos + len(xs)]
            pos += len(xs)
        for r, xs in enumerate(tb):
            B[r, :len(xs)] = codes[pos:pos + len(xs)]
            pos += len(xs)
        prev = np.zeros((P, 65), np.int64)
        for i in range(1, 65):
            cur = np.zeros((P, 65), np.int64)
            ai = A[:, i - 1][:, None]  # (P,1)
            eq = ai == B  # (P,64)
            diag = np.where(eq, prev[:, :-1] + 1, 0)
            up = prev[:, 1:]
            best = np.maximum(diag, up)
            # left-to-right running max completes dp[i][j] =
            # max(best[j], dp[i][j-1]) — a cumulative maximum
            cur[:, 1:] = np.maximum.accumulate(best, axis=1)
            prev = cur
        lcs = prev[:, 64]
        f_e6 = (2 * lcs * 1_000_000) // (la + lb)
        return pa.table({
            "doc_a": t["doc_a"], "doc_b": t["doc_b"],
            "len_a": pa.array(la, pa.int64()),
            "len_b": pa.array(lb, pa.int64()),
            "lcs": pa.array(lcs, pa.int64()),
            "f_e6": pa.array(f_e6, pa.int64())})

    return pairs.map_batches(lcs_batch, batch_format="pyarrow")


def excess_fluency_select_docs(sf_dir: str, driver_max: int = 5_000_000):
    """RHO-style excess-likelihood data selection (Mindermann '22
    shape, n-gram proxy): score each document by how much MORE the
    order-3 corpus LM likes it than the order-2 baseline —
    excess = e6(s_tri/s_big) − e6(s_suf/s_uni) — and keep docs with
    positive excess ("learnable structure beyond the cheap model").
    All four count pools (trigram, prefix-bigram, suffix-bigram,
    middle-unigram) are defined over the SAME trigram-position
    instance table, so one explode pass feeds everything; gram strings
    never leave the explode task (128-bit hash keys, the
    trigram_fluency convention), per-doc pools are order-free integer
    sums, and the two e6 fixings are the only floats (mirrored in
    SQL). Below ``driver_max`` trigram instances the count+join fold
    runs through Arrow's C++ kernels on the driver; above it the
    identical semantics run as STAGED distributed groupby+join rounds
    (≤2 shuffle stages per execution — the trigram deadlock lesson).
    Two-form equality is pytest-asserted."""
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
        w1 = pd.Series(flat[idx], dtype=object)
        w2 = pd.Series(flat[idx + 1], dtype=object)
        w3 = pd.Series(flat[idx + 2], dtype=object)
        big = (w1 + " " + w2).to_numpy(object)
        tri = ((w1 + " " + w2) + " " + w3).to_numpy(object)
        suf = (w2 + " " + w3).to_numpy(object)
        uni = w2.to_numpy(object)

        def h2(a, k1=None, k2="rendlertrigram2!"):
            x1 = pdu.hash_array(a, categorize=False).view(np.int64)
            x2 = pdu.hash_array(a, hash_key=k2,
                                categorize=False).view(np.int64)
            return x1, x2

        t1, t2 = h2(tri)
        b1, b2 = h2(big)
        s1, s2 = h2(suf)
        u1, u2 = h2(uni)
        g = (pd.DataFrame({
            "doc_id": np.repeat(ids, np.maximum(lens - 2, 0)),
            "t1": t1, "t2": t2, "b1": b1, "b2": b2,
            "s1": s1, "s2": s2, "u1": u1, "u2": u2})
            .groupby(["doc_id", "t1", "t2", "b1", "b2",
                      "s1", "s2", "u1", "u2"], sort=False).size()
            .reset_index(name="n"))
        return pa.table({c: pa.array(g[c].to_numpy(np.int64), pa.int64())
                         for c in ("doc_id", "t1", "t2", "b1", "b2",
                                   "s1", "s2", "u1", "u2", "n")})

    inst = ds.map_batches(explode_combine, batch_format="pyarrow")

    def _finish(per_doc: pa.Table) -> pa.Table:
        def e6(num, den):
            f = (per_doc[num].to_numpy(zero_copy_only=False)
                 / per_doc[den].to_numpy(zero_copy_only=False))
            return pc.cast(
                pc.round(pc.multiply(pa.array(f, pa.float64()), 1e6),
                         options=pc.RoundOptions(
                             ndigits=0,
                             round_mode="half_towards_infinity")),
                pa.int64())

        f3, f2 = e6("s_tri", "s_big"), e6("s_suf", "s_uni")
        excess = pc.subtract(f3, f2)
        return pa.table({"doc_id": per_doc["doc_id"],
                         "n_tri": per_doc["n_tri"],
                         "fluency3_e6": f3, "fluency2_e6": f2,
                         "excess_e6": excess,
                         "keep": pc.cast(pc.greater(excess, 0),
                                         pa.int64())})

    def tri_totals(t: pa.Table) -> pa.Table:
        ntok = pc.list_value_length(
            pc.split_pattern(t["text"], " ")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"n": pa.array(np.maximum(ntok - 2, 0),
                                       pa.int64())})

    tot = (ds.map_batches(tri_totals, batch_format="pyarrow")
           .aggregate(Sum("n", alias_name="tot"))["tot"] or 0)

    POOLS = [(("t1", "t2"), "ct", "s_tri"), (("b1", "b2"), "cb", "s_big"),
             (("s1", "s2"), "cs", "s_suf"), (("u1", "u2"), "cu", "s_uni")]

    if tot <= driver_max:
        ptbl = pa.concat_tables(
            inst.iter_batches(batch_size=None, batch_format="pyarrow"))
        j = ptbl
        for keys, cname, _ in POOLS:
            cnt = pa.TableGroupBy(ptbl, list(keys)).aggregate(
                [("n", "sum")]).rename_columns(list(keys) + [cname])
            j = j.join(cnt, keys=list(keys))
        n = j["n"].to_numpy(zero_copy_only=False)
        w = pa.table(
            {"doc_id": j["doc_id"], "n": j["n"],
             **{out: pa.array(
                 n * j[cname].to_numpy(zero_copy_only=False), pa.int64())
                for _, cname, out in POOLS}})
        per_doc = pa.TableGroupBy(w, "doc_id").aggregate(
            [("n", "sum")] + [(out, "sum") for _, _, out in POOLS])
        per_doc = per_doc.rename_columns(
            ["doc_id", "n_tri"] + [out for _, _, out in POOLS])
        return _finish(per_doc)

    # staged distributed form: each execution ≤ 2 shuffle stages
    inst = inst.materialize()
    joined = inst
    for keys, cname, _ in POOLS:
        cnt = inst.groupby(list(keys)).aggregate(
            Sum("n", alias_name=cname)).materialize()
        joined = joined.join(cnt, join_type="inner", num_partitions=8,
                             on=tuple(keys)).materialize()

    def weight(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"doc_id": t["doc_id"], "n": t["n"],
             **{out: pa.array(
                 n * t[cname].to_numpy(zero_copy_only=False), pa.int64())
                for _, cname, out in POOLS}})

    per_doc = (joined.map_batches(weight, batch_format="pyarrow")
               .groupby("doc_id")
               .aggregate(Sum("n", alias_name="n_tri"),
                          *[Sum(out, alias_name=out)
                            for _, _, out in POOLS]))
    return per_doc.map_batches(_finish, batch_format="pyarrow")


EXCESS_FLUENCY_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
         generate_subscripts(string_split(text, ' '), 1) AS ord
  FROM documents),
tri AS (
  SELECT a.doc_id,
         a.token || ' ' || b.token || ' ' || c.token AS tri,
         a.token || ' ' || b.token AS big,
         b.token || ' ' || c.token AS suf,
         b.token AS uni
  FROM toks a
  JOIN toks b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
  JOIN toks c ON a.doc_id = c.doc_id AND c.ord = a.ord + 2),
tric AS (SELECT tri, CAST(count(*) AS BIGINT) AS ct FROM tri GROUP BY tri),
bigc AS (SELECT big, CAST(count(*) AS BIGINT) AS cb FROM tri GROUP BY big),
sufc AS (SELECT suf, CAST(count(*) AS BIGINT) AS cs FROM tri GROUP BY suf),
unic AS (SELECT uni, CAST(count(*) AS BIGINT) AS cu FROM tri GROUP BY uni),
doc AS (
  SELECT t.doc_id, count(*) AS n_tri,
         CAST(sum(ct) AS BIGINT) AS s_tri,
         CAST(sum(cb) AS BIGINT) AS s_big,
         CAST(sum(cs) AS BIGINT) AS s_suf,
         CAST(sum(cu) AS BIGINT) AS s_uni
  FROM tri t JOIN tric USING (tri) JOIN bigc USING (big)
             JOIN sufc USING (suf) JOIN unic USING (uni)
  GROUP BY t.doc_id)
SELECT doc_id, n_tri,
       CAST(round(s_tri / s_big * 1000000) AS BIGINT) AS fluency3_e6,
       CAST(round(s_suf / s_uni * 1000000) AS BIGINT) AS fluency2_e6,
       CAST(round(s_tri / s_big * 1000000) AS BIGINT)
       - CAST(round(s_suf / s_uni * 1000000) AS BIGINT) AS excess_e6,
       CAST(CAST(round(s_tri / s_big * 1000000) AS BIGINT)
            - CAST(round(s_suf / s_uni * 1000000) AS BIGINT) > 0
            AS BIGINT) AS keep
FROM doc
"""


def vacuum_expired_snapshots(sf_dir: str, keep_latest: int = 1):
    """Snapshot VACUUM — the retention half of the time-travel story:
    keep the latest ``keep_latest`` versions' files, delete every file
    referenced ONLY by expired versions, and rewrite the manifest so
    pinned readers of retained versions are untouched (files shared
    with a retained version survive — the Iceberg/Delta
    expire-snapshots contract). Builds the same versioned layout as
    :func:`docs_time_travel_read`, then audits by RE-READING through
    the post-vacuum manifest: expired versions read 0 rows, retained
    versions read exactly their pre-vacuum counts. Output is
    parallelism-independent (row counts only; file counts/bytes vary
    with write concurrency and are deliberately excluded)."""
    import json

    docs_time_travel_read(sf_dir)  # builds {root}/v0 v1 + manifest
    root = os.path.join(
        "/tmp/rendler_ray_tt",
        f"{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}")
    with open(os.path.join(root, "manifest.json")) as f:
        mf = json.load(f)
    versions = sorted(mf, key=int)
    retained = set(versions[len(versions) - keep_latest:])
    pre_rows = {}
    for ver in versions:
        n = 0
        for fp in mf[ver]:
            import pyarrow.parquet as pq
            n += pq.ParquetFile(fp).metadata.num_rows
        pre_rows[ver] = n
    keep_files = {fp for v in retained for fp in mf[v]}
    for ver in versions:
        if ver in retained:
            continue
        for fp in mf[ver]:
            if fp not in keep_files and os.path.exists(fp):
                os.unlink(fp)
    mf2 = {v: mf[v] for v in retained}
    with open(os.path.join(root, "manifest.json"), "w") as f:
        json.dump(mf2, f)

    rows = []
    for ver in versions:
        if ver in mf2:
            got = int(rd.read_parquet(mf2[ver]).count())
        else:
            # expired: every unshared file is gone; a pinned reader of
            # this version now has 0 readable rows
            got = 0
            assert all(not os.path.exists(fp) for fp in mf[ver]
                       if fp not in keep_files)
        rows.append({"version": int(ver),
                     "retained": int(ver in mf2),
                     "n_rows_before": pre_rows[ver],
                     "n_rows_after": got})
    return pa.Table.from_pylist(rows)


def promo_revenue_share_monthly(sf_dir: str):
    """TPC-H q14 shape over the part dimension: per ship-month, the
    e6 share of discounted revenue coming from PROMO-type parts.
    The (partkey → is_promo) map broadcasts once (``ray.put`` of two
    sorted numpy arrays); each lineitem batch emits ≤|months| partial
    rows (promo cents, total cents) and the final groupby folds
    ≤|months| groups. The share is an exact integer quotient
    (promo·10⁶ // total) — no float crosses the boundary."""
    part = pa.concat_tables(
        _read(sf_dir, "part", ["p_partkey", "p_type"])
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    keys = part["p_partkey"].to_numpy()
    order = np.argsort(keys)
    keys = keys[order]
    is_promo = (np.asarray(part["p_type"].to_pylist(), dtype=object)
                == "PROMO")[order]
    dim_ref = ray.put((keys, is_promo))

    def partial(t: pa.Table) -> pa.Table:
        keys_, promo_ = ray.get(dim_ref)
        pk = t["l_partkey"].to_numpy()
        idx = np.searchsorted(keys_, pk)
        idx = np.clip(idx, 0, len(keys_) - 1)
        hit = keys_[idx] == pk
        idx = idx[hit]
        ship = t["l_shipdate"]
        ym = pc.add(pc.multiply(pc.cast(pc.year(ship), pa.int64()), 100),
                    pc.cast(pc.month(ship), pa.int64())).to_numpy(
            zero_copy_only=False)[hit]
        ext = t["l_extendedprice"].to_numpy()[hit].astype(np.float64)
        disc = t["l_discount"].to_numpy()[hit].astype(np.float64)
        rev = _round_half_away((ext * (1.0 - disc)) * 100.0).astype(
            np.int64)
        df = pd.DataFrame({"ym": ym, "rev": rev,
                           "promo": np.where(promo_[idx], rev, 0)})
        g = df.groupby("ym", sort=False).agg(
            promo_cents=("promo", "sum"),
            total_cents=("rev", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_shipdate", "l_extendedprice",
                "l_discount"])
    agg = (li.map_batches(partial, batch_format="pyarrow")
           .groupby("ym")
           .aggregate(Sum("promo_cents", alias_name="promo_cents"),
                      Sum("total_cents", alias_name="total_cents")))

    def finish(t: pa.Table) -> pa.Table:
        p = t["promo_cents"].to_numpy()
        tot = t["total_cents"].to_numpy()
        share = np.array([int(a) * 1_000_000 // int(b)
                          for a, b in zip(p, tot)], np.int64)
        return t.append_column("promo_share_e6",
                               pa.array(share, pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow")


PROMO_SHARE_SQL = """
SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
         AS ym,
       CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(round((l_extendedprice
                                      * (1 - l_discount)) * 100)
                               AS BIGINT) ELSE 0 END) AS BIGINT)
         AS promo_cents,
       CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100)
                     AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
                          THEN CAST(round((l_extendedprice
                                           * (1 - l_discount)) * 100)
                                    AS BIGINT) ELSE 0 END) AS HUGEINT)
            * 1000000
            // CAST(sum(CAST(round((l_extendedprice
                                    * (1 - l_discount)) * 100)
                             AS BIGINT)) AS HUGEINT)
            AS BIGINT) AS promo_share_e6
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY year(l_shipdate) * 100 + month(l_shipdate)
"""


def supplier_nation_flow(sf_dir: str):
    """Trade-flow matrix (TPC-H q5/q7 shape): discounted revenue by
    (supplier nation, customer nation). ONE genuine all-to-all — the
    lineitem ⨝ orders hash join on orderkey; every dimension hop
    (suppkey → nation, custkey → nation, nationkey → name) is a
    broadcast numpy lookup inside the batch, and the final groupby
    carries ≤ 25×25 keys. The at-scale shape for star joins: shuffle
    the two facts once, broadcast everything else."""
    cust = pa.concat_tables(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    supp = pa.concat_tables(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    nat = pa.concat_tables(
        rd.read_parquet(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"])
        .iter_batches(batch_size=None, batch_format="pyarrow"))

    def lut(keys, vals):
        o = np.argsort(keys)
        return keys[o], vals[o]

    ck, cv = lut(cust["c_custkey"].to_numpy(),
                 cust["c_nationkey"].to_numpy())
    sk, sv = lut(supp["s_suppkey"].to_numpy(),
                 supp["s_nationkey"].to_numpy())
    nk, nv = lut(nat["n_nationkey"].to_numpy(),
                 np.asarray(nat["n_name"].to_pylist(), dtype=object))
    ref = ray.put((ck, cv, sk, sv, nk, nv))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"])
    od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    j = li.join(od, join_type="inner", num_partitions=8,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        ck_, cv_, sk_, sv_, nk_, nv_ = ray.get(ref)

        def look(keys, vals, q):
            i = np.clip(np.searchsorted(keys, q), 0, len(keys) - 1)
            return vals[i], keys[i] == q

        cnat, okc = look(ck_, cv_, t["o_custkey"].to_numpy())
        snat, oks = look(sk_, sv_, t["l_suppkey"].to_numpy())
        ok = okc & oks
        ext = t["l_extendedprice"].to_numpy()[ok].astype(np.float64)
        disc = t["l_discount"].to_numpy()[ok].astype(np.float64)
        rev = _round_half_away((ext * (1.0 - disc)) * 100.0).astype(
            np.int64)
        sname, _ = look(nk_, nv_, snat[ok])
        cname, _ = look(nk_, nv_, cnat[ok])
        df = pd.DataFrame({"supp_nation": sname, "cust_nation": cname,
                           "rev": rev})
        g = df.groupby(["supp_nation", "cust_nation"],
                       sort=False).agg(
            n_items=("rev", "size"),
            revenue_cents=("rev", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (j.map_batches(partial, batch_format="pyarrow")
            .groupby(["supp_nation", "cust_nation"])
            .aggregate(Sum("n_items", alias_name="n_items"),
                       Sum("revenue_cents", alias_name="revenue_cents")))


SUPPLIER_NATION_FLOW_SQL = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       count(*) AS n_items,
       CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
GROUP BY ns.n_name, nc.n_name
"""


def eigenvector_centrality_graph(sf_dir: str,
                                 driver_max: int = 2_000_000):
    """Eigenvector centrality by THREE max-normalized power-iteration
    rounds over the shared orders graph — completing the centrality
    family (degree / closeness / betweenness / PageRank / HITS) with
    the plain adjacency eigenvector. ENTIRELY integer: scores start at
    10⁶, each round is a neighbor-sum followed by max-normalization
    x·10⁶ // max(x) — integer floor division, so no float ever exists
    and the SQL mirror (3 unrolled CTE rounds) is trivially
    hash-exact. Below ``driver_max`` edges the rounds fold on the
    driver (vectorized np.add.at); above it each round is ONE
    broadcast-score map pass over the distributed edge list (per-batch
    partial neighbor-sums) + a groupby(node).Sum + a Max aggregate for
    the normalizer — the edge table never moves, and the O(V) score
    map is the broadcast side (pagerank_auto's shape). Two-form
    equality is pytest-asserted."""
    edges = _orders_graph_edges(sf_dir)
    n_edges = edges.count()

    if n_edges <= driver_max:
        t = pa.concat_tables(edges.iter_batches(batch_size=None,
                                                batch_format="pyarrow"))
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        nodes = np.unique(np.concatenate([a, b]))
        idx = {int(v): i for i, v in enumerate(nodes)}
        ai = np.array([idx[int(v)] for v in a], np.int64)
        bi = np.array([idx[int(v)] for v in b], np.int64)
        x = np.full(len(nodes), 1_000_000, dtype=object)
        for _ in range(3):
            raw = np.zeros(len(nodes), dtype=object)
            np.add.at(raw, ai, x[bi])
            np.add.at(raw, bi, x[ai])
            mx = raw.max() if len(raw) else 1
            x = np.array([int(r) * 1_000_000 // int(mx) for r in raw],
                         dtype=object)
        out_order = np.argsort(nodes)
        return pa.table({
            "node": pa.array(nodes[out_order], pa.int64()),
            "score_e6": pa.array(
                np.array([int(v) for v in x[out_order]], np.int64),
                pa.int64())})

    # distributed rounds: broadcast score map, partial sums per batch
    edges = edges.materialize()
    score_ref = None  # None == round-0 uniform 1e6 (no map needed)

    def partial(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        if score_map_ref[0] is None:
            xa = np.full(len(a), 1_000_000, np.int64)
            xb = xa
        else:
            keys, vals = ray.get(score_map_ref[0])
            ia = np.searchsorted(keys, a)
            ib = np.searchsorted(keys, b)
            xa = vals[np.clip(ia, 0, len(keys) - 1)]
            xb = vals[np.clip(ib, 0, len(keys) - 1)]
        df = pd.DataFrame({
            "node": np.concatenate([a, b]),
            "s": np.concatenate([xb, xa])})
        g = df.groupby("node", sort=False)["s"].sum().reset_index()
        return pa.table({"node": pa.array(g["node"].to_numpy(np.int64)),
                         "s": pa.array(g["s"].to_numpy(np.int64))})

    score_map_ref = [score_ref]
    raw = None
    for _ in range(3):
        raw = (edges.map_batches(partial, batch_format="pyarrow")
               .groupby("node").aggregate(Sum("s", alias_name="raw"))
               .materialize())
        mx = int(raw.max("raw") or 1)

        def norm(t: pa.Table, mx=mx) -> pa.Table:
            r = t["raw"].to_numpy(zero_copy_only=False)
            x = np.array([int(v) * 1_000_000 // mx for v in r],
                         np.int64)
            return pa.table({"node": t["node"],
                             "x": pa.array(x, pa.int64())})

        scored = raw.map_batches(norm, batch_format="pyarrow")             .materialize()
        st = pa.concat_tables(scored.iter_batches(
            batch_size=None, batch_format="pyarrow"))
        keys = st["node"].to_numpy()
        order = np.argsort(keys)
        score_map_ref[0] = ray.put((keys[order],
                                    st["x"].to_numpy()[order]))
    keys, vals = ray.get(score_map_ref[0])
    return pa.table({"node": pa.array(keys, pa.int64()),
                     "score_e6": pa.array(vals, pa.int64())})


EIGENVECTOR_SQL = """
WITH e AS (
  SELECT DISTINCT
    LEAST(o_custkey, o_orderkey % 1500 + 1)    AS a,
    GREATEST(o_custkey, o_orderkey % 1500 + 1) AS b
  FROM orders
  WHERE o_custkey != o_orderkey % 1500 + 1
), sym AS (
  SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e
), x0 AS (
  SELECT DISTINCT u AS node, CAST(1000000 AS HUGEINT) AS x FROM sym
), r1 AS (
  SELECT s.u AS node, CAST(sum(x0.x) AS HUGEINT) AS raw
  FROM sym s JOIN x0 ON s.v = x0.node GROUP BY s.u
), x1 AS (
  SELECT node, raw * 1000000 // (SELECT max(raw) FROM r1) AS x FROM r1
), r2 AS (
  SELECT s.u AS node, CAST(sum(x1.x) AS HUGEINT) AS raw
  FROM sym s JOIN x1 ON s.v = x1.node GROUP BY s.u
), x2 AS (
  SELECT node, raw * 1000000 // (SELECT max(raw) FROM r2) AS x FROM r2
), r3 AS (
  SELECT s.u AS node, CAST(sum(x2.x) AS HUGEINT) AS raw
  FROM sym s JOIN x2 ON s.v = x2.node GROUP BY s.u
), x3 AS (
  SELECT node, raw * 1000000 // (SELECT max(raw) FROM r3) AS x FROM r3
)
SELECT CAST(node AS BIGINT) AS node, CAST(x AS BIGINT) AS score_e6
FROM x3
"""


def dau_mau_stickiness(sf_dir: str):
    """Monthly engagement stickiness (avg DAU / MAU — the product-
    analytics staple): per calendar month, the exact mean of daily
    distinct users over the month's ACTIVE days against the month's
    distinct users, as the exact integer quotient
    Σdau·10⁶ // (n_days·mau). Two bounded distinct aggregates (the
    (day,user) and (month,user) exchanges carry one row per distinct
    pair thanks to per-batch dedup combiners) and a ≤|months|-row
    driver fold."""
    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def day_pairs(t: pa.Table) -> pa.Table:
        days = pc.cast(pc.floor(pc.divide(
            pc.cast(t["ts"], pa.int64()), 86_400_000_000)), pa.int64())
        out = pa.table({"day": days, "user_id": t["user_id"]})
        return out.group_by(["day", "user_id"]).aggregate(
            [([], "count_all")]).select(["day", "user_id"])

    pairs = (ev.map_batches(day_pairs, batch_format="pyarrow")
             .groupby(["day", "user_id"])
             .aggregate(Count(alias_name="_n"))
             .select_columns(["day", "user_id"]))
    t = pa.concat_tables(
        pairs.groupby("day").aggregate(Count(alias_name="dau"))
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    days = t["day"].to_numpy()
    dau = t["dau"].to_numpy()
    # month of the epoch-day, via pandas (mirrors SQL date arithmetic)
    ts = pd.to_datetime(days * 86400, unit="s")
    ym = (ts.year * 100 + ts.month).to_numpy(np.int64)

    mau_t = pa.concat_tables(
        ev.map_batches(
            lambda t: pa.table({
                "ym": pc.add(pc.multiply(pc.cast(pc.year(t["ts"]),
                                                 pa.int64()), 100),
                             pc.cast(pc.month(t["ts"]), pa.int64())),
                "user_id": t["user_id"]})
            .group_by(["ym", "user_id"]).aggregate(
                [([], "count_all")]).select(["ym", "user_id"]),
            batch_format="pyarrow")
        .groupby(["ym", "user_id"]).aggregate(Count(alias_name="_n"))
        .groupby("ym").aggregate(Count(alias_name="mau"))
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    mau = dict(zip(mau_t["ym"].to_pylist(), mau_t["mau"].to_pylist()))

    rows = []
    df = pd.DataFrame({"ym": ym, "dau": dau}).groupby("ym").agg(
        sum_dau=("dau", "sum"), n_days=("dau", "size")).reset_index()
    for _, r in df.iterrows():
        m = int(mau[int(r["ym"])])
        rows.append({
            "ym": int(r["ym"]),
            "n_days": int(r["n_days"]),
            "sum_dau": int(r["sum_dau"]),
            "mau": m,
            "stickiness_e6": int(r["sum_dau"]) * 1_000_000
            // (int(r["n_days"]) * m)})
    rows.sort(key=lambda r: r["ym"])
    return pa.Table.from_pylist(rows)


DAU_MAU_SQL = """
WITH d AS (
  SELECT CAST(floor(CAST(epoch(ts) AS DOUBLE) / 86400) AS BIGINT)
           AS day,
         user_id
  FROM events GROUP BY 1, 2
), dau AS (
  SELECT day, count(*) AS dau FROM d GROUP BY day
), daum AS (
  SELECT CAST(year(to_timestamp(day * 86400)) * 100
              + month(to_timestamp(day * 86400)) AS BIGINT) AS ym,
         dau
  FROM dau
), mau AS (
  SELECT CAST(year(ts) * 100 + month(ts) AS BIGINT) AS ym,
         count(DISTINCT user_id) AS mau
  FROM events GROUP BY 1
)
SELECT daum.ym,
       count(*) AS n_days,
       CAST(sum(daum.dau) AS BIGINT) AS sum_dau,
       CAST(mau.mau AS BIGINT) AS mau,
       CAST(CAST(sum(daum.dau) AS HUGEINT) * 1000000
            // (count(*) * mau.mau) AS BIGINT) AS stickiness_e6
FROM daum JOIN mau USING (ym)
GROUP BY daum.ym, mau.mau
"""


def degree_distribution_graph(sf_dir: str):
    """Degree distribution of the shared orders graph (the power-law
    corpus-card stat next to crawl_depth_histogram): two bounded
    aggregates — endpoints explode to (node, 1) partials, a
    groupby(node) count gives degrees, a groupby(degree) count gives
    the histogram (≤ max-degree rows)."""
    edges = _orders_graph_edges(sf_dir)

    def endpoints(t: pa.Table) -> pa.Table:
        out = pa.table({"node": pa.concat_arrays(
            [t["a"].combine_chunks(), t["b"].combine_chunks()])})
        return out.group_by("node").aggregate(
            [([], "count_all")]).rename_columns(["node", "d"])

    deg = (edges.map_batches(endpoints, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("d", alias_name="degree")))
    return (deg.groupby("degree").aggregate(Count(alias_name="n_nodes")))


DEGREE_DIST_SQL = """
WITH e AS (
  SELECT DISTINCT
    LEAST(o_custkey, o_orderkey % 1500 + 1)    AS a,
    GREATEST(o_custkey, o_orderkey % 1500 + 1) AS b
  FROM orders
  WHERE o_custkey != o_orderkey % 1500 + 1
), deg AS (
  SELECT v, count(*) AS degree
  FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
  GROUP BY v
)
SELECT CAST(degree AS BIGINT) AS degree, count(*) AS n_nodes
FROM deg GROUP BY degree
"""


def stylometry_burrows_delta(sf_dir: str, k: int = 16):
    """Burrows' Delta authorship distance between SOURCES (Burrows
    LLC'02) — the stylometry screen a provenance audit runs: over the
    corpus's top-``k`` function words, the per-source-pair mean
    |z-score| gap of relative token frequencies. The vocabulary cut is
    the shared ``_token_freq_topk`` fold; per-(source, token) counts
    and per-source token totals come from two bounded aggregates
    (≤ sources×k and ≤ sources rows); the ≤25×16 matrix folds on the
    driver. EXACTNESS: relative freqs are integer e6 quotients; each
    token's cross-source moment radicand R = n·Q − S² is an exact int;
    each pair addend ⌊10⁶·|f_a−f_b|·n/√R⌋ is ONE mirrored float tree
    (the welch convention) fixed per-ADDEND before the integer sum, so
    the pair table hash-matches the SQL mirror bit-for-bit. Tokens
    with R = 0 (identical frequency everywhere) carry no signal and
    are excluded on both sides."""
    ds = _read(sf_dir, "documents", ["text", "source"])
    vocab = _token_freq_topk(ds, k)
    vref = ray.put(np.asarray(vocab, dtype=object))

    def partial(t: pa.Table) -> pa.Table:
        voc = ray.get(vref)
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        src = np.asarray(t["source"].to_pylist(), dtype=object)[parents]
        in_voc = np.isin(flat, voc)
        df = pd.DataFrame({"source": src[in_voc],
                           "token": flat[in_voc]})
        g = df.groupby(["source", "token"], sort=False).size() \
            .reset_index(name="c")
        tot = pd.DataFrame({"source": src}).groupby(
            "source", sort=False).size().reset_index(name="n")
        gt = pa.table({
            "source": pa.array(g["source"].tolist(), pa.string()),
            "token": pa.array(g["token"].tolist(), pa.string()),
            "c": pa.array(g["c"].to_numpy(np.int64)),
            "n": pa.array(np.zeros(len(g), np.int64))})
        tt = pa.table({
            "source": pa.array(tot["source"].tolist(), pa.string()),
            "token": pa.array(["\x00total"] * len(tot), pa.string()),
            "c": pa.array(np.zeros(len(tot), np.int64)),
            "n": pa.array(tot["n"].to_numpy(np.int64))})
        return pa.concat_tables([gt, tt])

    agg = pa.concat_tables(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "token"])
        .aggregate(Sum("c", alias_name="c"), Sum("n", alias_name="n"))
        .iter_batches(batch_size=None, batch_format="pyarrow"))

    srcs = sorted({s for s in agg["source"].to_pylist()})
    tot = {}
    counts = {}
    for s, t, c, n in zip(agg["source"].to_pylist(),
                          agg["token"].to_pylist(),
                          agg["c"].to_pylist(), agg["n"].to_pylist()):
        if t == "\x00total":
            tot[s] = tot.get(s, 0) + int(n)
        else:
            counts[(s, t)] = counts.get((s, t), 0) + int(c)
    f = {(s, t): counts.get((s, t), 0) * 1_000_000 // tot[s]
         for s in srcs for t in vocab}
    n_src = len(srcs)
    rows = []
    stats = {}
    for t in vocab:
        vals = [f[(s, t)] for s in srcs]
        S = sum(vals)
        Q = sum(v * v for v in vals)
        stats[t] = n_src * Q - S * S
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            tot_e6, used = 0, 0
            for t in vocab:
                R = stats[t]
                if R <= 0:
                    continue
                used += 1
                tot_e6 += int(np.floor(
                    1000000.0 * ((abs(f[(a, t)] - f[(b, t)]) * n_src)
                                 / np.sqrt(np.float64(R)))))
            rows.append({"source_a": a, "source_b": b,
                         "k_used": used,
                         "delta_e6": tot_e6 // used if used else 0})
    return pa.Table.from_pylist(rows)


BURROWS_DELTA_SQL = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token
  FROM documents
), tot AS (
  SELECT source, count(*) AS n FROM tok GROUP BY source
), vocab AS (
  SELECT token FROM (
    SELECT token, count(*) AS c FROM tok GROUP BY token)
  QUALIFY row_number() OVER (ORDER BY c DESC, token) <= 16
), sv AS (
  SELECT t.source, t.token, count(*) AS c
  FROM tok t JOIN vocab USING (token) GROUP BY 1, 2
), f AS (
  SELECT s.source, v.token,
         COALESCE(sv.c, 0) * 1000000 // tot.n AS f
  FROM (SELECT DISTINCT source FROM documents) s
  CROSS JOIN vocab v
  LEFT JOIN sv ON sv.source = s.source AND sv.token = v.token
  JOIN tot ON tot.source = s.source
), st AS (
  SELECT token, count(*) AS n,
         CAST(sum(f) AS HUGEINT) AS s,
         CAST(sum(CAST(f AS HUGEINT) * f) AS HUGEINT) AS q
  FROM f GROUP BY token
), r AS (
  SELECT token, n, n * q - s * s AS rr FROM st
), addends AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(floor(1000000 * ((abs(a.f - b.f) * r.n)
                               / sqrt(CAST(r.rr AS DOUBLE))))
              AS BIGINT) AS addend
  FROM f a
  JOIN f b ON a.token = b.token AND a.source < b.source
  JOIN r ON r.token = a.token
  WHERE r.rr > 0
)
SELECT source_a, source_b,
       count(*) AS k_used,
       CAST(CAST(sum(addend) AS HUGEINT) // count(*) AS BIGINT)
         AS delta_e6
FROM addends
GROUP BY source_a, source_b
"""


def readability_scores_docs(sf_dir: str):
    """Flesch-style readability per document — the text-quality signal
    next to quality_scores/gopher filters: sentences = '.'-separated
    non-empty segments (min 1), words = whitespace tokens, syllables =
    vowel runs per word (the standard heuristic). The score is an
    EXACT integer: f_e3 = 206835 − 1015·w//s − 84600·syll//w (each
    term its own floor quotient, mirrored verbatim in SQL) — no float
    anywhere. One stateless Arrow-kernel map pass."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        words = pc.list_value_length(
            pc.split_pattern(txt, " ")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        sents_raw = pc.split_pattern(txt, ".")
        # non-empty sentence segments, floor 1
        flat = pc.list_flatten(sents_raw)
        nonempty = pc.not_equal(pc.utf8_trim_whitespace(flat), "")
        par = pc.list_parent_indices(sents_raw).to_numpy(
            zero_copy_only=False)
        n = t.num_rows
        sents = np.bincount(
            par[nonempty.to_numpy(zero_copy_only=False)],
            minlength=n).astype(np.int64)
        sents = np.maximum(sents, 1)
        syll = pc.count_substring_regex(
            txt, "[aeiouAEIOU]+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        w = np.maximum(words, 1)
        f_e3 = (206835 - 1015 * w // sents - 84600 * syll // w)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_words": pa.array(w, pa.int64()),
            "n_sents": pa.array(sents, pa.int64()),
            "n_syllables": pa.array(syll, pa.int64()),
            "flesch_e3": pa.array(f_e3, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


READABILITY_SQL = """
WITH f AS (
  SELECT doc_id,
         greatest(len(string_split(text, ' ')), 1) AS w,
         greatest(len(list_filter(string_split(text, '.'),
                                  x -> trim(x) != '')), 1) AS s,
         len(regexp_extract_all(text, '[aeiouAEIOU]+')) AS syll
  FROM documents
)
SELECT doc_id, w AS n_words, s AS n_sents, syll AS n_syllables,
       CAST(206835 - 1015 * w // s - 84600 * syll // w AS BIGINT)
         AS flesch_e3
FROM f
"""


def clv_cohort_revenue(sf_dir: str):
    """Customer-lifetime-value cohort matrix (the retention-revenue
    triangle): cohort = a customer's FIRST order month, cell = exact
    cents revenue at each months-since-first offset. Two bounded
    passes over orders: a groupby(custkey).Min finds each customer's
    cohort month (the only all-to-all, keyed on the customer
    dimension), broadcast back as a sorted-array lookup; the matrix
    fold is ≤ months² groups."""
    od = _read(sf_dir, "orders",
               ["o_custkey", "o_orderdate", "o_totalprice"])

    def with_month(t: pa.Table) -> pa.Table:
        ym = pc.add(pc.multiply(pc.cast(pc.year(t["o_orderdate"]),
                                        pa.int64()), 12),
                    pc.cast(pc.month(t["o_orderdate"]), pa.int64()))
        return pa.table({"o_custkey": t["o_custkey"], "m": ym,
                         "cents": _cents(t["o_totalprice"])})

    rows = od.map_batches(with_month, batch_format="pyarrow")
    first = rows.groupby("o_custkey").aggregate(
        Min("m", alias_name="m0"))
    ft = pa.concat_tables(first.iter_batches(batch_size=None,
                                             batch_format="pyarrow"))
    keys = ft["o_custkey"].to_numpy()
    order = np.argsort(keys)
    ref = ray.put((keys[order], ft["m0"].to_numpy()[order]))

    def to_cell(t: pa.Table) -> pa.Table:
        k, m0 = ray.get(ref)
        c = t["o_custkey"].to_numpy()
        i = np.clip(np.searchsorted(k, c), 0, len(k) - 1)
        base = m0[i]
        m = t["m"].to_numpy()
        return pa.table({
            "cohort_ym": pa.array(
                (base - 1) // 12 * 100 + ((base - 1) % 12 + 1),
                pa.int64()),
            "months_since": pa.array(m - base, pa.int64()),
            "cents": t["cents"]})

    return (rows.map_batches(to_cell, batch_format="pyarrow")
            .groupby(["cohort_ym", "months_since"])
            .aggregate(Count(alias_name="n_orders"),
                       Sum("cents", alias_name="revenue_cents")))


CLV_COHORT_SQL = """
WITH o AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) AS m,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), first AS (
  SELECT o_custkey, min(m) AS m0 FROM o GROUP BY o_custkey
)
SELECT CAST((m0 - 1) // 12 * 100 + ((m0 - 1) % 12 + 1) AS BIGINT)
         AS cohort_ym,
       CAST(m - m0 AS BIGINT) AS months_since,
       count(*) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM o JOIN first USING (o_custkey)
GROUP BY 1, 2
"""


def region_nation_rollup_revenue(sf_dir: str):
    """GROUP BY ROLLUP(region, nation) order revenue — the OLAP
    subtotal cube over the full geography dimension chain (region ⨝
    nation ⨝ customer), with 'ALL' sentinels for the rollup levels.
    The two dimension hops broadcast once (custkey → nation/region
    names via sorted-array lookups); the fact pass emits ≤ |nations|
    partials per batch and the ≤125-row leaf table plus its subtotals
    fold on the driver."""
    cust = pa.concat_tables(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    nat = pa.concat_tables(
        rd.read_parquet(os.path.join(sf_dir, "nation.parquet"))
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    reg = pa.concat_tables(
        rd.read_parquet(os.path.join(sf_dir, "region.parquet"))
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    rmap = dict(zip(reg["r_regionkey"].to_pylist(),
                    reg["r_name"].to_pylist()))
    nk = nat["n_nationkey"].to_numpy()
    order = np.argsort(nk)
    nname = np.asarray(nat["n_name"].to_pylist(), dtype=object)[order]
    nreg = np.asarray([rmap[k] for k in nat["n_regionkey"].to_pylist()],
                      dtype=object)[order]
    ck = cust["c_custkey"].to_numpy()
    corder = np.argsort(ck)
    cnat = cust["c_nationkey"].to_numpy()[corder]
    ref = ray.put((ck[corder], cnat, nk[order], nname, nreg))

    def partial(t: pa.Table) -> pa.Table:
        ck_, cnat_, nk_, nname_, nreg_ = ray.get(ref)
        c = t["o_custkey"].to_numpy()
        i = np.clip(np.searchsorted(ck_, c), 0, len(ck_) - 1)
        ni = np.clip(np.searchsorted(nk_, cnat_[i]), 0, len(nk_) - 1)
        cents = _cents(t["o_totalprice"]).to_numpy()
        df = pd.DataFrame({"region": nreg_[ni], "nation": nname_[ni],
                           "cents": cents})
        g = df.groupby(["region", "nation"], sort=False).agg(
            n_orders=("cents", "size"),
            revenue_cents=("cents", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    od = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    leaf = pa.concat_tables(
        od.map_batches(partial, batch_format="pyarrow")
        .groupby(["region", "nation"])
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("revenue_cents", alias_name="revenue_cents"))
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    df = leaf.to_pandas()
    sub = df.groupby("region", as_index=False).agg(
        n_orders=("n_orders", "sum"),
        revenue_cents=("revenue_cents", "sum"))
    sub["nation"] = "ALL"
    tot = pd.DataFrame({
        "region": ["ALL"], "nation": ["ALL"],
        "n_orders": [df["n_orders"].sum()],
        "revenue_cents": [df["revenue_cents"].sum()]})
    out = pd.concat([df, sub, tot], ignore_index=True)[
        ["region", "nation", "n_orders", "revenue_cents"]]
    out = out.astype({"n_orders": np.int64,
                      "revenue_cents": np.int64})
    return pa.Table.from_pandas(out, preserve_index=False)


REGION_ROLLUP_SQL = """
SELECT COALESCE(r_name, 'ALL') AS region,
       COALESCE(n_name, 'ALL') AS nation,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


def peak_hour_per_type(sf_dir: str):
    """Per-event-type peak hour (tie → smallest hour) — the grouped
    ARGMAX shape done with the packed-key native-Min trick (the
    near_dup_keep_best convention): count per (type, hour) is a
    bounded groupby (types × 24), then one ≤types-group Min over the
    packed key (−count)·2⁶ | hour, so no window function and no
    per-group finisher is needed."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def hours(t: pa.Table) -> pa.Table:
        out = pa.table({
            "event_type": t["event_type"],
            "hour": pc.cast(pc.hour(t["ts"]), pa.int64())})
        return out.group_by(["event_type", "hour"]).aggregate(
            [([], "count_all")]).rename_columns(
            ["event_type", "hour", "n"])

    counts = (ev.map_batches(hours, batch_format="pyarrow")
              .groupby(["event_type", "hour"])
              .aggregate(Sum("n", alias_name="n")))

    def pack(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy()
        h = t["hour"].to_numpy()
        key = (-n) * 64 + h
        return pa.table({"event_type": t["event_type"],
                         "key": pa.array(key, pa.int64())})

    packed = counts.map_batches(pack, batch_format="pyarrow")
    best = packed.groupby("event_type").aggregate(
        Min("key", alias_name="key"))

    def unpack(t: pa.Table) -> pa.Table:
        k = t["key"].to_numpy()
        # floor-division semantics recover the count for negative keys
        n = -(k - ((k % 64))) // 64
        return pa.table({
            "event_type": t["event_type"],
            "peak_hour": pa.array(k % 64, pa.int64()),
            "n_events": pa.array(n.astype(np.int64), pa.int64())})

    return best.map_batches(unpack, batch_format="pyarrow")


PEAK_HOUR_SQL = """
SELECT event_type,
       CAST(hour AS BIGINT) AS peak_hour,
       CAST(n AS BIGINT) AS n_events
FROM (
  SELECT event_type, hour(ts) AS hour, count(*) AS n
  FROM events GROUP BY event_type, hour(ts))
QUALIFY row_number() OVER (
  PARTITION BY event_type ORDER BY n DESC, hour) = 1
"""


def repeat_buyer_segments(sf_dir: str):
    """One-time vs repeat buyer segmentation — the retention
    board-metric: customers bucketed by lifetime order count (1 /
    2-5 / 6+), with per-segment customer counts, order counts and
    exact cents revenue. One customer-keyed aggregate (count + sum)
    then a ≤3-group fold; the order table never moves twice."""
    od = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def pre(t: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": t["o_custkey"],
                         "cents": _cents(t["o_totalprice"])})

    per_cust = (od.map_batches(pre, batch_format="pyarrow")
                .groupby("o_custkey")
                .aggregate(Count(alias_name="n_orders"),
                           Sum("cents", alias_name="cents")))

    def seg(t: pa.Table) -> pa.Table:
        n = t["n_orders"].to_numpy()
        segs = np.where(n == 1, "one_time",
                        np.where(n <= 5, "repeat_2_5", "repeat_6_plus"))
        df = pd.DataFrame({"segment": segs, "n": n,
                           "cents": t["cents"].to_numpy()})
        g = df.groupby("segment", sort=False).agg(
            n_customers=("n", "size"), n_orders=("n", "sum"),
            revenue_cents=("cents", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (per_cust.map_batches(seg, batch_format="pyarrow")
            .groupby("segment")
            .aggregate(Sum("n_customers", alias_name="n_customers"),
                       Sum("n_orders", alias_name="n_orders"),
                       Sum("revenue_cents", alias_name="revenue_cents")))


REPEAT_BUYER_SQL = """
WITH per_cust AS (
  SELECT o_custkey, count(*) AS n,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
)
SELECT CASE WHEN n = 1 THEN 'one_time'
            WHEN n <= 5 THEN 'repeat_2_5'
            ELSE 'repeat_6_plus' END AS segment,
       count(*) AS n_customers,
       CAST(sum(n) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM per_cust
GROUP BY 1
"""


def embedding_angle_histogram(sf_dir: str):
    """Distribution of pairwise cosine similarities over the
    (vec_id, vec_id+1) chain — the cheap isotropy/collapse diagnostic
    an embedding pipeline tracks (a healthy space concentrates near 0;
    collapse piles up near 1). Pairing is one int-keyed successor join
    (never all-pairs); per-pair scores use the established
    e6-rounded ``list_cosine_similarity`` convention, bucketed at 0.1
    width into a ≤21-row histogram."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    # Ray's hash join rejects list-typed payload columns — ship the
    # vectors through the exchange as packed float32 bytes instead
    def packv(t: pa.Table, key_shift: int, kname: str,
              vname: str) -> pa.Table:
        v = np.asarray(t["embedding"].to_pylist(), dtype=np.float32)
        return pa.table({
            kname: pc.add(t["vec_id"], key_shift),
            vname: pa.array([r.tobytes() for r in v],
                            pa.large_binary())})

    left = ds.map_batches(lambda t: packv(t, 1, "k", "va"),
                          batch_format="pyarrow")
    right = ds.map_batches(lambda t: packv(t, 0, "vec_id", "vb"),
                           batch_format="pyarrow")
    pairs = left.join(right, join_type="inner", num_partitions=8,
                      on=("k",), right_on=("vec_id",))

    def score(t: pa.Table) -> pa.Table:
        a = np.stack([np.frombuffer(x, np.float32)
                      for x in t["va"].to_pylist()]).astype(np.float64)
        b = np.stack([np.frombuffer(x, np.float32)
                      for x in t["vb"].to_pylist()]).astype(np.float64)
        num = (a * b).sum(1)
        den = np.sqrt((a * a).sum(1)) * np.sqrt((b * b).sum(1))
        s = _round_half_away(1e6 * (num / den))
        bucket = np.floor_divide(s, 100_000)
        out = pa.table({"bucket": pa.array(bucket, pa.int64())})
        return out.group_by("bucket").aggregate(
            [([], "count_all")]).rename_columns(["bucket", "n_pairs"])

    return (pairs.map_batches(score, batch_format="pyarrow")
            .groupby("bucket").aggregate(Sum("n_pairs",
                                             alias_name="n_pairs")))


ANGLE_HIST_SQL = """
SELECT CAST(floor(CAST(round(list_cosine_similarity(
               CAST(a.embedding AS DOUBLE[]),
               CAST(b.embedding AS DOUBLE[])) * 1000000) AS BIGINT)
             / 100000) AS BIGINT) AS bucket,
       count(*) AS n_pairs
FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
GROUP BY 1
"""


def orders_backlog_aging(sf_dir: str):
    """Open-order backlog aging — the ops/ELT freshness report: orders
    not yet finished ('O'/'P'), bucketed by age in days relative to
    the corpus's max order date (the as-of watermark), with counts and
    exact cents value per (status, age bucket). The watermark is one
    Max aggregate folded to a scalar; the bucket pass is stateless."""
    od = _read(sf_dir, "orders",
               ["o_orderstatus", "o_orderdate", "o_totalprice"])
    asof = od.max("o_orderdate")

    def buckets(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["o_orderstatus"], "F")
        t = t.filter(keep)
        age_days = pc.cast(pc.floor(pc.divide(pc.cast(
            pc.subtract(pa.scalar(asof), t["o_orderdate"]),
            pa.int64()), 86_400_000_000.0)), pa.int64()).to_numpy(
            zero_copy_only=False)
        b = np.where(age_days <= 30, "0_30",
                     np.where(age_days <= 90, "31_90",
                              np.where(age_days <= 365, "91_365",
                                       "365_plus")))
        df = pd.DataFrame({
            "o_orderstatus": np.asarray(
                t["o_orderstatus"].to_pylist(), dtype=object),
            "age_bucket": b,
            "cents": _cents(t["o_totalprice"]).to_numpy()})
        g = df.groupby(["o_orderstatus", "age_bucket"],
                       sort=False).agg(
            n_orders=("cents", "size"),
            value_cents=("cents", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (od.map_batches(buckets, batch_format="pyarrow")
            .groupby(["o_orderstatus", "age_bucket"])
            .aggregate(Sum("n_orders", alias_name="n_orders"),
                       Sum("value_cents", alias_name="value_cents")))


BACKLOG_AGING_SQL = """
WITH wm AS (SELECT max(o_orderdate) AS d FROM orders)
SELECT o_orderstatus,
       CASE WHEN datediff('day', o_orderdate, wm.d) <= 30
              THEN '0_30'
            WHEN datediff('day', o_orderdate, wm.d) <= 90
              THEN '31_90'
            WHEN datediff('day', o_orderdate, wm.d) <= 365
              THEN '91_365'
            ELSE '365_plus' END AS age_bucket,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM orders, wm
WHERE o_orderstatus != 'F'
GROUP BY 1, 2
"""


def weekday_seasonality_index(sf_dir: str):
    """Day-of-week seasonality index per event type — the calendar-
    effect report: idx_e6 = (events of type t on dow d, scaled by the
    corpus's dow-day counts) as the EXACT integer
    n_td · n_days · 10⁶ // (D_d · n_t), where D_d is how many distinct
    calendar dates of that weekday the corpus spans (so a corpus that
    starts mid-week doesn't bias the index). Three bounded aggregates:
    (type, dow) counts, distinct dates per dow, per-type totals."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def parts(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor(pc.divide(pc.cast(
            t["ts"], pa.int64()), 86_400_000_000.0)), pa.int64())
        # pyarrow day_of_week is Monday=0; DuckDB dayofweek is
        # Sunday=0 — shift to the SQL convention
        dow = pc.cast(
            pc.add(pc.day_of_week(t["ts"]), 1), pa.int64())
        dow = pc.if_else(pc.equal(dow, 7), pa.scalar(0, pa.int64()),
                         dow)
        return pa.table({"event_type": t["event_type"], "dow": dow,
                         "day": day})

    rows = ev.map_batches(parts, batch_format="pyarrow")
    td = pa.concat_tables(
        rows.groupby(["event_type", "dow"])
        .aggregate(Count(alias_name="n_td"))
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    dd = pa.concat_tables(
        rows.map_batches(
            lambda t: t.select(["dow", "day"]).group_by(
                ["dow", "day"]).aggregate([([], "count_all")])
            .select(["dow", "day"]), batch_format="pyarrow")
        .groupby(["dow", "day"]).aggregate(Count(alias_name="_n"))
        .groupby("dow").aggregate(Count(alias_name="d_days"))
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    d_days = dict(zip(dd["dow"].to_pylist(), dd["d_days"].to_pylist()))
    n_days = sum(d_days.values())
    tot = {}
    for et, n in zip(td["event_type"].to_pylist(),
                     td["n_td"].to_pylist()):
        tot[et] = tot.get(et, 0) + int(n)
    out = []
    for et, dow, n in zip(td["event_type"].to_pylist(),
                          td["dow"].to_pylist(),
                          td["n_td"].to_pylist()):
        out.append({
            "event_type": et, "dow": int(dow), "n_events": int(n),
            "idx_e6": int(n) * n_days * 1_000_000
            // (int(d_days[dow]) * tot[et])})
    out.sort(key=lambda r: (r["event_type"], r["dow"]))
    return pa.Table.from_pylist(out)


WEEKDAY_SEASONALITY_SQL = """
WITH r AS (
  SELECT event_type, dayofweek(ts) AS dow,
         CAST(floor(CAST(epoch(ts) AS DOUBLE) / 86400) AS BIGINT)
           AS day
  FROM events
), td AS (
  SELECT event_type, dow, count(*) AS n_td
  FROM r GROUP BY event_type, dow
), dd AS (
  SELECT dow, count(DISTINCT day) AS d_days FROM r GROUP BY dow
), nd AS (SELECT CAST(sum(d_days) AS BIGINT) AS n_days FROM dd),
tt AS (SELECT event_type, count(*) AS n_t FROM r GROUP BY event_type)
SELECT td.event_type, CAST(td.dow AS BIGINT) AS dow,
       CAST(td.n_td AS BIGINT) AS n_events,
       CAST(CAST(td.n_td AS HUGEINT) * nd.n_days * 1000000
            // (dd.d_days * tt.n_t) AS BIGINT) AS idx_e6
FROM td JOIN dd USING (dow) JOIN tt USING (event_type), nd
"""


def nation_revenue_hhi(sf_dir: str):
    """Herfindahl–Hirschman revenue-concentration index per customer
    nation — the market-structure audit: HHI_e6 = Σ_c cents_c² · 10⁶
    // (Σ_c cents_c)², exact Python-int rationals (cents² · 10⁶
    overflows int64 — HUGEINT in SQL). One customer-keyed aggregate
    (bounded by the customer dimension), a broadcast nation hop, and a
    ≤25-group ``map_groups`` finisher whose group size is the nation's
    customer count."""
    cust = pa.concat_tables(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    ck = cust["c_custkey"].to_numpy()
    order = np.argsort(ck)
    ref = ray.put((ck[order], cust["c_nationkey"].to_numpy()[order]))

    od = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def pre(t: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": t["o_custkey"],
                         "cents": _cents(t["o_totalprice"])})

    per_cust = (od.map_batches(pre, batch_format="pyarrow")
                .groupby("o_custkey")
                .aggregate(Sum("cents", alias_name="cents")))

    def tag(t: pa.Table) -> pa.Table:
        k, nat = ray.get(ref)
        i = np.clip(np.searchsorted(k, t["o_custkey"].to_numpy()),
                    0, len(k) - 1)
        return pa.table({
            "nationkey": pa.array(nat[i].astype(np.int64), pa.int64()),
            "cents": t["cents"]})

    def hhi(g: pd.DataFrame) -> pd.DataFrame:
        c = [int(x) for x in g["cents"]]
        tot = sum(c)
        return pd.DataFrame({
            "nationkey": [int(g["nationkey"].iloc[0])],
            "n_customers": [len(c)],
            "revenue_cents": [tot],
            "hhi_e6": [sum(x * x for x in c) * 1_000_000
                       // (tot * tot)]})

    return (per_cust.map_batches(tag, batch_format="pyarrow")
            .groupby("nationkey").map_groups(hhi,
                                             batch_format="pandas"))


NATION_HHI_SQL = """
WITH per_cust AS (
  SELECT c_nationkey AS nationkey, o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey, o_custkey
)
SELECT CAST(nationkey AS BIGINT) AS nationkey,
       count(*) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS revenue_cents,
       CAST(sum(CAST(cents AS HUGEINT) * cents) * 1000000
            // (CAST(sum(cents) AS HUGEINT) * sum(cents))
            AS BIGINT) AS hhi_e6
FROM per_cust
GROUP BY nationkey
"""
