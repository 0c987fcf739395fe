# ==================================================== training-data ops


_DEDUP_DRIVER_MAX = 1 << 18  # (fingerprint, doc_id) rows; 40 B/row


def dedup_exact_docs(sf_dir: str):
    """Exact dedup: content hash → keep the smallest doc_id per
    distinct text (D1-shape at rest). Hashing is distributed; the
    40-byte (fingerprint, doc_id) residue folds on the driver via
    Arrow's C++ group_by under a row gate (r5 profile at sf0.1/×10:
    driver 0.3 s vs sorted-agg 0.7-0.8 s vs native 0.6-2.2 s — the
    residue is 100-5000× smaller than the text it summarizes).
    Past the gate the exchange runs on
    ``functions/groupagg.py::sorted_group_agg`` (sort + per-block
    Arrow combine, bounded straddle fixup) — Ray's native aggregate
    pays ~35 µs of Python per group, which at dedup cardinalities
    (groups ≈ corpus) dominates at any cluster size: measured 2.2 s
    native vs 0.7 s sorted on the 200k-row leg at 2 cpus."""
    import pyarrow.parquet as pq

    from rendler_ray.functions.groupagg import sorted_group_agg

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    hashed = ds.map_batches(F_text.md5_fingerprint_batch,
                            batch_format="pyarrow").select_columns(
        ["fingerprint", "doc_id"])
    n_rows = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    if n_rows <= _DEDUP_DRIVER_MAX:
        t = pa.concat_tables(hashed.iter_batches(batch_size=None,
                                                 batch_format="pyarrow"))
        return (t.group_by("fingerprint")
                .aggregate([("doc_id", "min")])
                .rename_columns(["fingerprint", "doc_id"]))
    return sorted_group_agg(hashed, "fingerprint",
                            [("doc_id", "min", "doc_id")])


DEDUP_EXACT_SQL = """
SELECT md5(text) AS fingerprint, min(doc_id) AS doc_id
FROM documents GROUP BY md5(text)
"""


def token_count_docs(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(F_text.token_count_batch,
                          batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens"])


TOKEN_COUNT_SQL = """
SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
"""


def token_count_bpe(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(F_text.token_count_bpe_batch,
                          batch_format="pyarrow").select_columns(
        ["doc_id", "n_bpe_tokens"])


TOKEN_COUNT_BPE_SQL = """
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_[:space:]]+'))
         AS n_bpe_tokens
FROM documents
"""


def quality_scores(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(F_text.quality_batch,
                          batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens", "n_uniq_tokens", "n_stopwords",
         "stopword_ratio", "uniq_ratio"])


def c4_quality_filter_docs(sf_dir: str):
    """Data-driven corpus cleaning (C4/CCNet shape): keep docs whose
    length sits between the corpus-exact P5 and P95 of n_tokens AND
    whose stopword ratio is ≥ 5% (fluency floor). The length thresholds
    come FROM the data via the value-histogram exact-percentile shape
    (groupby(n_tokens).count — shuffle carries one row per DISTINCT
    length); the ratio test is the integer inequality 20·n_stop ≥
    n_tokens, so the SQL oracle agrees bit-for-bit."""
    feats = (_read(sf_dir, "documents", ["doc_id", "text"])
             .map_batches(F_text.quality_batch, batch_format="pyarrow")
             .select_columns(["doc_id", "n_tokens", "n_stopwords"]))
    hist = (feats.groupby("n_tokens").aggregate(Count(alias_name="c"))
            .sort("n_tokens").take_all())  # ≤ distinct lengths: tiny
    v = np.array([r["n_tokens"] for r in hist], np.int64)
    cum = np.cumsum(np.array([r["c"] for r in hist], np.int64))
    n = int(cum[-1])
    p5 = int(v[np.searchsorted(cum, (5 * n + 99) // 100)])
    p95 = int(v[np.searchsorted(cum, (95 * n + 99) // 100)])

    def keep(t: pa.Table) -> pa.Table:
        nt = t["n_tokens"].to_numpy(zero_copy_only=False)
        ns = t["n_stopwords"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(
            (nt >= p5) & (nt <= p95) & (20 * ns >= nt)))

    return feats.map_batches(keep, batch_format="pyarrow")


C4_QUALITY_FILTER_SQL = f"""
WITH f AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             x -> x IN {F_text.STOPWORDS!r})) AS n_stopwords
  FROM documents),
hist AS (SELECT n_tokens AS v, count(*) AS c FROM f GROUP BY v),
ranked AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM hist),
tot AS (SELECT count(*) AS n FROM f),
lo AS (SELECT min(v) AS p5 FROM ranked, tot WHERE cum >= (5 * n + 99) // 100),
hi AS (SELECT min(v) AS p95 FROM ranked, tot WHERE cum >= (95 * n + 99) // 100)
SELECT doc_id, n_tokens, n_stopwords
FROM f, lo, hi
WHERE n_tokens BETWEEN p5 AND p95 AND 20 * n_stopwords >= n_tokens
"""


QUALITY_SQL = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens,
       len(list_filter(string_split(text, ' '),
           x -> x IN {F_text.STOPWORDS!r})) AS n_stopwords,
       len(list_filter(string_split(text, ' '),
           x -> x IN {F_text.STOPWORDS!r}))
         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
       len(list_distinct(string_split(text, ' ')))
         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS uniq_ratio
FROM documents
"""


def _trigram_rows(t: pa.Table, id_col: str = "doc_id",
                  col: str = "text") -> pa.Table:
    """(id, text) → (id, gram) word-trigram rows (text.kgram_rows:
    vectorized shifted-concat explode; docs under 3 tokens contribute
    their whole text as one gram — the jaccard short-doc rule)."""
    grams, gpar, _ = F_text.kgram_rows(t[col].combine_chunks(), 3)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    return pa.table({id_col: pa.array(ids[gpar], t[id_col].type),
                     "gram": pa.array(grams, pa.string())})


def contamination_check_docs(sf_dir: str):
    """Benchmark decontamination (the GPT-3 appendix-C shape): flag
    training docs sharing any word trigram with the 'benchmark' set
    (here: the trigrams of docs 0–19, standing in for an eval set).
    The benchmark gram set is SMALL by construction — built once,
    ``ray.put`` broadcast, vectorized ``is_in`` per batch; the corpus
    itself only streams. Output: (doc_id, n_hits) per contaminated doc
    — hit count = trigram POSITIONS matching the benchmark."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    bench_rows = ds.map_batches(
        lambda t: _trigram_rows(t.filter(pc.less(t["doc_id"], 20))),
        batch_format="pyarrow")
    bench = pa.concat_tables(
        bench_rows.iter_batches(batch_size=None, batch_format="pyarrow")
    )["gram"].combine_chunks().unique()
    bref = ray.put(bench)

    def hits(t: pa.Table) -> pa.Table:
        g = _trigram_rows(t)
        g = g.filter(pc.is_in(g["gram"], value_set=ray.get(bref)))
        ids, cnt = np.unique(
            g["doc_id"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_hits": pa.array(cnt.astype(np.int64))})

    return (ds.map_batches(hits, batch_format="pyarrow")
            .groupby("doc_id").aggregate(Sum("n_hits",
                                             alias_name="n_hits")))


CONTAMINATION_SQL = """
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
           FROM documents),
g AS (SELECT doc_id, toks, text,
             unnest(generate_series(1, len(toks) - 2)) AS i
      FROM t WHERE len(toks) >= 3),
gr AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
               AS gram FROM g
       UNION ALL
       SELECT doc_id, text AS gram FROM t WHERE len(toks) < 3),
bench AS (SELECT DISTINCT gram FROM gr WHERE doc_id < 20)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM gr WHERE gram IN (SELECT gram FROM bench)
GROUP BY doc_id
"""


def repetition_filter_docs(sf_dir: str):
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1, public):
    per doc, the duplicate-bigram fraction (1 − distinct/total) and the
    top-bigram fraction (most frequent bigram / total). Purely per-row
    feature extraction — each doc's bigrams live in its own batch row,
    so this is ONE map pass, no shuffle at any corpus size. Fractions
    fixed-point e6 (round-half-away, both sides); docs under 2 tokens
    report 0/0."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pd.Series(
            pc.list_flatten(toks).to_numpy(zero_copy_only=False),
            dtype=object)
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        n = t.num_rows
        dup = np.zeros(n, np.float64)
        top = np.zeros(n, np.float64)
        if len(flat) >= 2:
            valid = parents[:-1] == parents[1:]
            grams = (flat.iloc[:-1].reset_index(drop=True) + " "
                     + flat.iloc[1:].reset_index(drop=True))[valid]
            gpar = parents[:-1][valid]
            df = pd.DataFrame({"p": gpar, "g": grams.to_numpy(object)})
            per = df.groupby(["p", "g"], sort=False).size()
            byp = per.groupby(level=0)
            tot = df.groupby("p").size()
            d2 = byp.size()
            topc = byp.max()
            idx = tot.index.to_numpy()
            dup[idx] = 1.0 - d2.to_numpy() / tot.to_numpy(np.float64)
            top[idx] = topc.to_numpy() / tot.to_numpy(np.float64)
        e6 = lambda x: np.floor(x * 1e6 + 0.5).astype(np.int64)  # noqa: E731
        return pa.table({"doc_id": t["doc_id"],
                         "dup2_e6": pa.array(e6(dup), pa.int64()),
                         "top2_e6": pa.array(e6(top), pa.int64())})

    return ds.map_batches(stats, batch_format="pyarrow")


REPETITION_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
      FROM t WHERE len(toks) >= 2),
gr AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS gram FROM g),
cnt AS (SELECT doc_id, gram, count(*) AS c FROM gr GROUP BY 1, 2),
s AS (SELECT doc_id, sum(c) AS n2, count(*) AS d2, max(c) AS topc
      FROM cnt GROUP BY doc_id)
SELECT t.doc_id,
       COALESCE(CAST(round((1 - d2 / CAST(n2 AS DOUBLE)) * 1000000)
                     AS BIGINT), 0) AS dup2_e6,
       COALESCE(CAST(round((topc / CAST(n2 AS DOUBLE)) * 1000000)
                     AS BIGINT), 0) AS top2_e6
FROM t LEFT JOIN s ON t.doc_id = s.doc_id
"""


# per-source target sampling rates for the domain-mix op (quarters so
# rate·2^60 is exact in int64 on both sides)
_MIX_RATES = {f"src{i}": (i % 4 + 1) / 4 for i in range(10)}


def domain_mix_sample(sf_dir: str):
    """Domain mixture sampling (the Pile/dolma-style source reweighting
    step): each source keeps a deterministic hash fraction of its docs
    per the target mix — src_i keeps (i%4+1)/4. One stateless map pass
    (rate lookup + md5 threshold), reproducible across runs and
    parallelism, no RNG state."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    thr = {s: int(r * (1 << 60)) for s, r in _MIX_RATES.items()}
    tref = ray.put(thr)

    def keep(t: pa.Table) -> pa.Table:
        tm = ray.get(tref)
        ids = t["doc_id"].to_pylist()
        srcs = t["source"].to_pylist()
        h = np.array([int(hashlib.md5(f"{i}-mix".encode())
                          .hexdigest()[:15], 16) for i in ids], np.int64)
        lim = np.array([tm.get(s, 0) for s in srcs], np.int64)
        return t.filter(pa.array(h < lim))

    return ds.map_batches(keep, batch_format="pyarrow")


DOMAIN_MIX_SQL = f"""
WITH r AS (SELECT doc_id, source,
       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-mix'), 1, 15)
            AS BIGINT) AS h,
       CASE {' '.join(f"WHEN source = '{s}' THEN {int(r * (1 << 60))}"
                      for s, r in _MIX_RATES.items())}
            ELSE 0 END AS lim
  FROM documents)
SELECT doc_id, source FROM r WHERE h < lim
"""


def doc_fingerprint_md5(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(F_text.md5_fingerprint_batch,
                          batch_format="pyarrow").select_columns(
        ["doc_id", "fingerprint"])


FINGERPRINT_SQL = """
SELECT doc_id, md5(text) AS fingerprint FROM documents
"""


def lang_id_docs(sf_dir: str):
    """Language-ID heuristic: marker-word scoring, first-max-wins argmax.
    Score emitted fixed-point (1e-9) so the DuckDB oracle can hash-match."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(F_text.lang_id_batch,
                         batch_format="pyarrow").select_columns(
        ["doc_id", "lang_pred", "lang_score"])
    return _fixed_point(out, {"lang_score": 9})


def _lang_id_sql() -> str:
    """Oracle for :func:`lang_id_docs`, generated from the marker table.
    Python scans langs in dict order keeping strictly-greater scores, so
    the winner is the FIRST lang attaining the max — expressed as a CASE
    chain where lang ``l`` wins iff its score >= every later lang's."""
    langs = list(F_text._LANG_MARKERS)
    scores = ",\n       ".join(
        f"len(list_filter(toks, x -> x IN {markers!r}))"
        f" / CAST(n AS DOUBLE) AS s_{lang}"
        for lang, markers in F_text._LANG_MARKERS.items())
    all_s = ", ".join(f"s_{l}" for l in langs)
    case = [f"WHEN greatest({all_s}) <= 0 THEN 'und'"]
    for i, l in enumerate(langs[:-1]):
        conds = " AND ".join(f"s_{l} >= s_{m}" for m in langs[i + 1:])
        case.append(f"WHEN {conds} THEN '{l}'")
    case.append(f"ELSE '{langs[-1]}'")
    case_sql = "\n            ".join(case)
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         greatest(len(string_split(text, ' ')), 1) AS n
  FROM documents
), s AS (
  SELECT doc_id,
       {scores}
  FROM t
)
SELECT doc_id,
       CASE {case_sql} END AS lang_pred,
       CAST(round(greatest({all_s}) * 1000000000) AS BIGINT) AS lang_score
FROM s
"""


LANG_ID_SQL = _lang_id_sql()


def simhash_docs(sf_dir: str):
    """64-bit SimHash per document (deterministic; not SQL-expressible)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(F_text.simhash64_batch,
                          batch_format="pyarrow").select_columns(
        ["doc_id", "simhash"])


_CKPT_ROOT = None


def _ckpt_root() -> str:
    """Per-process checkpoint root, created lazily and reaped at exit.

    Keying by pid (not just tag) means two concurrent runs — bench +
    check_correctness, or two sf dirs — can never rmtree each other's
    checkpoint mid-read or silently consume the other scale factor's
    data; the atexit hook keeps /tmp bounded (the old fixed-path scheme
    reused one dir and was unsafe under concurrency; the scheme before
    that used uuid suffixes and leaked)."""
    global _CKPT_ROOT
    if _CKPT_ROOT is None:
        import atexit
        import shutil

        _CKPT_ROOT = f"/tmp/rendler_ray_ckpt/pid{os.getpid()}"
        atexit.register(shutil.rmtree, _CKPT_ROOT, ignore_errors=True)
    return _CKPT_ROOT


def _checkpoint(ds, tag: str):
    """Spill an intermediate Dataset to /tmp parquet and return a lazy
    read-back — the scale-safe way to consume a computed stage twice
    (``.materialize()`` would pin every block in the object store for
    the whole query; a parquet checkpoint streams both passes).

    The path is keyed by (process, tag) and REUSED — cleared and
    rewritten on each call — so repeated gate runs never accumulate
    /tmp usage while staying safe under concurrent processes."""
    import shutil

    path = f"{_ckpt_root()}/{tag}"
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ds.write_parquet(path)
    return rd.read_parquet(path)


def _banded_with_key(ds, num_perm: int = 64, bands: int = 8):
    """documents → one row per (doc, band) with a single combined
    ``bucket_key`` column (band_id:band_hash, vectorized concat) — the
    LSH shuffle/join key."""
    banded = ds.map_batches(
        F_text.minhash_bands_rows_batch,
        fn_kwargs={"num_perm": num_perm, "bands": bands},
        batch_format="pyarrow", num_cpus=1)

    def add_key(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t["band_id"], pa.string()), t["band_hash"], ":")
        return pa.table({"doc_id": t["doc_id"], "bucket_key": key})

    return banded.map_batches(add_key, batch_format="pyarrow")


# hot-key sets up to this size broadcast (ray.put once + vectorized
# is_in per batch); above it the filter becomes a hash semi-join — the
# same bounded-broadcast/join switch as state/politeness.budget_gate
_HOT_BCAST_MAX = 1_000_000
# banded tables up to this many rows pin in the object store
# (materialize); above it they checkpoint to parquet and both consumers
# stream from storage instead
_BANDED_PIN_MAX = 20_000_000


def _pin_banded(banded, n_rows_est: int, tag: str):
    if n_rows_est <= _BANDED_PIN_MAX:
        return banded.materialize()
    return _checkpoint(banded, tag)


def _hot_bucket_candidates(banded):
    """banded (doc_id, bucket_key) → candidate rows in buckets of size
    ≥ 2, distributed: native count aggregate → filter n≥2 → semi-join
    back onto the banded rows. The hot-key side (already reduced to
    multi-occupancy buckets) broadcasts while ≤ ``_HOT_BCAST_MAX`` rows
    — one vectorized ``is_in`` pass, no second shuffle; past the cap it
    switches to a hash semi-join (identical output)."""
    counts = banded.groupby("bucket_key").aggregate(Count(alias_name="n"))
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], 2)).select(
            ["bucket_key"]),
        batch_format="pyarrow").materialize()
    if hot.count() <= _HOT_BCAST_MAX:
        keys = pa.concat_tables(
            hot.iter_batches(batch_size=None, batch_format="pyarrow")
        )["bucket_key"].combine_chunks()
        kref = ray.put(keys)

        def keep(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["bucket_key"],
                                     value_set=ray.get(kref)))

        return banded.map_batches(keep, batch_format="pyarrow")
    return banded.join(hot, join_type="inner", num_partitions=8,
                       on=("bucket_key",))


def minhash_dup_groups(sf_dir: str):
    """MinHash+LSH near-dup candidates: shingle → minhash → band →
    one bucket-key groupby whose per-group filter keeps only buckets of
    size ≥ 2 → distinct doc_ids with ≥ 1 near-dup candidate.

    The banded table (consumed by both the count and the filter) pins
    in the object store below ``_BANDED_PIN_MAX`` rows and checkpoints
    to parquet above it; the hot-bucket filter broadcasts below
    ``_HOT_BCAST_MAX`` keys and hash-semi-joins above (see
    :func:`_hot_bucket_candidates`)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()
    banded = _pin_banded(_banded_with_key(ds, num_perm=64, bands=8),
                         n_docs * 8, "minhash_banded")
    cand = _hot_bucket_candidates(banded)
    return (cand.groupby("doc_id").aggregate(Count(alias_name="_n"))
            .select_columns(["doc_id"]))


def ngram_jaccard_pairs(sf_dir: str):
    """Near-dup verification: LSH candidate pairs → exact 3-gram Jaccard
    ≥ 0.5 → (a, b, jaccard). Texts reach the verifier by a hash join of
    the candidate rows against the documents table (only candidates pay
    the text shuffle — the corpus is never broadcast), and each bucket
    group verifies from its own rows."""
    return _verified_jaccard_pairs(sf_dir, "jaccard_banded")


# verify runs on the driver while the candidate table (bucket_key,
# doc_id — NOT the corpus; buckets of size >= 2 only) fits this many
# rows: below it the distributed verify's three exchanges (text hash
# join + bucket groupby + pair-dedup groupby) cost more in fixed
# per-block latency than the whole candidate set costs to verify in one
# vectorized process (measured 11s -> ~4s at sf0.1/32cpus). Above the
# gate the distributed form runs unchanged; two-form equality pytested.
_VERIFY_DRIVER_MAX = 262_144


def _verified_jaccard_pairs(sf_dir: str, tag: str,
                            driver_max: int | None = None,
                            cross_parity: bool = False):
    """``cross_parity=True`` restricts candidate pairs to opposite
    doc_id parity BEFORE the exact-jaccard verify — the incremental
    dedup shape (arriving shard vs standing corpus): within-side pairs
    are never shingled or verified, which is the work the incremental
    form saves."""
    if driver_max is None:  # late-bound so tests can force either form
        driver_max = _VERIFY_DRIVER_MAX
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()
    banded = _pin_banded(_banded_with_key(ds, num_perm=64, bands=8),
                         n_docs * 8, tag)
    cand = _hot_bucket_candidates(banded).materialize()
    if cand.count() <= driver_max:
        ct = pa.concat_tables(
            cand.iter_batches(batch_size=None, batch_format="pyarrow"))
        ids_arr = pc.unique(ct["doc_id"].combine_chunks())
        idref = ray.put(ids_arr)
        # texts of CANDIDATE docs only, filtered distributed — the
        # collected table is bounded by the gate, never the corpus
        txt = pa.concat_tables(
            ds.map_batches(
                lambda t: t.filter(pc.is_in(t["doc_id"],
                                            value_set=ray.get(idref))),
                batch_format="pyarrow")
            .iter_batches(batch_size=None, batch_format="pyarrow"))
        texts = dict(zip(txt["doc_id"].to_pylist(),
                         txt["text"].to_pylist()))
        grams: dict[int, frozenset] = {}
        best: dict[tuple[int, int], float] = {}
        cdf = pd.DataFrame({
            "bucket_key": ct["bucket_key"].to_numpy(zero_copy_only=False),
            "doc_id": ct["doc_id"].to_numpy(zero_copy_only=False)})
        for _, g in cdf.groupby("bucket_key", sort=False):
            ids_b = sorted(set(g["doc_id"]))
            if len(ids_b) < 2:
                continue
            if cross_parity and len({i % 2 for i in ids_b}) < 2:
                continue  # single-side bucket: nothing to verify
            for i in ids_b:
                if i not in grams:
                    grams[i] = F_text.ngram_set(texts[i])
            for x in range(len(ids_b)):
                for y in range(x + 1, len(ids_b)):
                    k = (ids_b[x], ids_b[y])
                    if cross_parity and (k[0] + k[1]) % 2 == 0:
                        continue  # same side: not verified incrementally
                    if k in best:
                        continue  # same exact-jaccard from any band
                    jac = F_text.jaccard_sets(grams[k[0]], grams[k[1]])
                    if jac >= 0.5:
                        best[k] = round(jac, 6)
        keys = sorted(best)
        return rd.from_arrow(pa.table({
            "a": pa.array([k[0] for k in keys], pa.int64()),
            "b": pa.array([k[1] for k in keys], pa.int64()),
            "jaccard": pa.array([best[k] for k in keys], pa.float64()),
        }))
    cand_txt = cand.join(ds, join_type="inner", num_partitions=8,
                         on=("doc_id",))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"]))
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "jaccard": pd.Series([], dtype=np.float64)})
        texts = dict(zip(g["doc_id"], g["text"]))
        # shingle each doc ONCE per group (pairwise re-shingling costs
        # O(bucket) redundant tokenizations per doc)
        if cross_parity and len({i % 2 for i in ids}) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "jaccard": pd.Series([], dtype=np.float64)})
        grams = {i: F_text.ngram_set(texts[i]) for i in ids}
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if cross_parity and (ids[i] + ids[j]) % 2 == 0:
                    continue  # same side: not verified incrementally
                jac = F_text.jaccard_sets(grams[ids[i]], grams[ids[j]])
                if jac >= 0.5:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_j.append(round(jac, 6))
        return pd.DataFrame({"a": pd.Series(out_a, dtype=np.int64),
                             "b": pd.Series(out_b, dtype=np.int64),
                             "jaccard": pd.Series(out_j, dtype=np.float64)})

    # a pair can surface from several bands: dedup with a grouped min
    return (cand_txt.groupby("bucket_key")
            .map_groups(pairs, batch_format="pandas")
            .groupby(["a", "b"])
            .aggregate(Min("jaccard", alias_name="jaccard")))


# in-bucket pair verification is O(b²) in ONE task: buckets past this
# cap split into hash-of-id sub-buckets first (ann.salt_hot_int_buckets)
_SIMHASH_MAX_BUCKET = 4096


def _simhash_banded_salted(sig_ds, id_col: str = "doc_id"):
    """(id, simhash) rows → salted 4×16-bit band rows ready for the
    bucket groupby. Output keys are unchanged when no bucket exceeds
    ``_SIMHASH_MAX_BUCKET`` (the common case; boilerplate-heavy corpora
    get split — see salt_hot_int_buckets for the recall trade)."""
    banded = sig_ds.map_batches(F_text.simhash_bands_batch,
                                fn_kwargs={"id_col": id_col},
                                batch_format="pyarrow")
    return F_ann.salt_hot_int_buckets(
        banded, key_col="bucket_key", id_col=id_col,
        max_bucket=_SIMHASH_MAX_BUCKET)


def simhash_near_dup_pairs(sf_dir: str):
    """SimHash near-dup pairs within hamming distance 3: simhash →
    4 × 16-bit band explode (lossless for radius ≤ 3, Manku WWW'07)
    → bucket groupby → in-bucket vectorized XOR-popcount verify →
    grouped-min dedup across bands. All-integer output (a, b,
    hamming); equivalence to brute-force all-pairs is pytest-asserted
    (tests/test_functions.py). Buckets past _SIMHASH_MAX_BUCKET are
    salted into sub-buckets (boilerplate skew guard) — banding stays
    lossless whenever no bucket exceeds the cap."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    banded = _simhash_banded_salted(
        ds.map_batches(F_text.simhash64_batch, batch_format="pyarrow")
          .select_columns(["doc_id", "simhash"]))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "hamming": pd.Series([], dtype=np.int64)})
        sig = g["simhash"].to_numpy().astype(np.uint64)
        iu, ju = np.triu_indices(len(ids), k=1)
        ham = F_text.hamming64(sig[iu], sig[ju])
        keep = ham <= 3
        return pd.DataFrame({
            "a": np.minimum(ids[iu[keep]], ids[ju[keep]]).astype(np.int64),
            "b": np.maximum(ids[iu[keep]], ids[ju[keep]]).astype(np.int64),
            "hamming": ham[keep]})

    return (banded.groupby("bucket_key")
            .map_groups(pairs, batch_format="pandas")
            .groupby(["a", "b"])
            .aggregate(Min("hamming", alias_name="hamming")))


def near_dup_dedup_docs(sf_dir: str):
    """The full corpus-dedup capstone: MinHash-LSH candidates → exact
    3-gram Jaccard ≥ 0.5 verify → connected components over the verified
    pair graph (large/small-star, O(log² n) rounds) → keep ONE canonical
    doc (min doc_id) per near-dup cluster. Returns the surviving
    (doc_id, cluster) rows — singletons carry their own id as cluster.

    Every stage is the at-scale shape: banded shuffle (never all-pairs),
    text via hash join (never a corpus broadcast), cluster membership
    removed via a left-outer join marker (never a collected drop-set).
    Deterministic; value-pinned by golden fixture + a union-find
    equivalence pytest."""
    pairs = _verified_jaccard_pairs(sf_dir, "dedup_banded")

    def pair_edges(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        # zero-pad so CC's lexicographic min label == numeric min doc_id
        return pa.table({
            "src": pa.array([f"{x:012d}" for x in a], pa.string()),
            "dst": pa.array([f"{x:012d}" for x in b], pa.string())})

    from rendler_ray.functions import graph as F_graph
    from rendler_ray.state.politeness import _nonempty_blocks

    # size-gated: driver union-find under 1M distinct pairs (the
    # verified pair graph is tiny next to the corpus), star contraction
    # above — identical output either way (graph.py equality test)
    cc = F_graph.connected_components_auto(
        pairs.map_batches(pair_edges, batch_format="pyarrow"))
    members = cc.map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["url"], pa.int64()),
            "cluster": pc.cast(t["component"], pa.int64())}),
        batch_format="pyarrow")

    docs = _read(sf_dir, "documents", ["doc_id"])
    members = _nonempty_blocks(members)
    if members is None:
        return docs.map_batches(
            lambda t: t.append_column("cluster", t["doc_id"]),
            batch_format="pyarrow")
    joined = docs.join(members, join_type="left_outer", num_partitions=8,
                       on=("doc_id",))

    def survivors(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        cl = t["cluster"].to_numpy(zero_copy_only=False)  # float w/ NaN
        cl = np.where(np.isnan(cl), doc, cl).astype(np.int64)
        keep = cl == doc  # non-members (own cluster) + cluster reps
        return pa.table({"doc_id": pa.array(doc[keep], pa.int64()),
                         "cluster": pa.array(cl[keep], pa.int64())})

    return joined.map_batches(survivors, batch_format="pyarrow")


def near_dup_keep_best_docs(sf_dir: str):
    """QUALITY-AWARE near-dup dedup: same MinHash-LSH → Jaccard-verify
    → connected-components clustering as ``near_dup_dedup_docs``, but
    the survivor per cluster is the BEST doc (max ``n_chars``, tie min
    doc_id) instead of min doc_id — the form real curation uses (keep
    the longest/highest-quality copy, FineWeb/RefinedWeb practice).

    Scale shape: cluster argmax runs as ONE native Max aggregate over a
    packed key ``(n_chars << 40) | (2^40-1 − doc_id)`` (max-quality
    then min-id in a single int64; bounds n_chars < 2^23,
    doc_id < 2^40 — far above any per-doc char count and the testdata
    id space), never a per-cluster sort or pandas group; non-members
    stream straight through the left-outer marker join. Deterministic;
    golden-pinned + brute-force union-find pytest."""
    pairs = _verified_jaccard_pairs(sf_dir, "dedup_banded_best")

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
    members = cc.map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["url"], pa.int64()),
            "cluster": pc.cast(t["component"], pa.int64())}),
        batch_format="pyarrow")

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    members = _nonempty_blocks(members)
    if members is None:
        return docs.map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"],
                                "cluster": t["doc_id"],
                                "n_chars": t["n_chars"]}),
            batch_format="pyarrow")
    _ID_MASK = (1 << 40) - 1

    if members.count() <= _VERIFY_DRIVER_MAX:
        # driver finisher: the members table is bounded by the verified
        # pair graph (tiny next to the corpus); one broadcast filter
        # pass replaces the outer join + checkpoint + Max + union chain
        # whose per-stage fixed latency dominates at this size. Same
        # packed-key argmax, same output; distributed form below is the
        # above-gate path (goldens pin both — gate is value-invisible).
        mt = pa.concat_tables(
            members.iter_batches(batch_size=None, batch_format="pyarrow"))
        mref = ray.put(mt["doc_id"].combine_chunks())
        md = pa.concat_tables(
            docs.map_batches(
                lambda t: t.filter(pc.is_in(t["doc_id"],
                                            value_set=ray.get(mref))),
                batch_format="pyarrow")
            .iter_batches(batch_size=None, batch_format="pyarrow"))
        nc_map = dict(zip(md["doc_id"].to_pylist(),
                          md["n_chars"].to_pylist()))
        doc = mt["doc_id"].to_numpy(zero_copy_only=False)
        cl = mt["cluster"].to_numpy(zero_copy_only=False)
        nc = np.array([nc_map[i] for i in doc], np.int64)
        if len(nc):  # packing bounds (docstring): fail loud, not wrong
            assert int(nc.max()) < (1 << 23) and int(doc.max()) < (1 << 40)
        packed = (nc << 40) | (_ID_MASK - doc)
        wdf = pd.DataFrame({"cluster": cl, "packed": packed}) \
            .groupby("cluster", sort=False)["packed"].max().reset_index()
        w = wdf["packed"].to_numpy(np.int64)
        winners_tbl = pa.table({
            "doc_id": pa.array(_ID_MASK - (w & _ID_MASK), pa.int64()),
            "cluster": pa.array(wdf["cluster"].to_numpy(np.int64),
                                pa.int64()),
            "n_chars": pa.array(w >> 40, pa.int64())})

        def loners_pass(t: pa.Table) -> pa.Table:
            t = t.filter(pc.invert(pc.is_in(t["doc_id"],
                                            value_set=ray.get(mref))))
            return pa.table({"doc_id": t["doc_id"],
                             "cluster": t["doc_id"],
                             "n_chars": t["n_chars"]})

        return (docs.map_batches(loners_pass, batch_format="pyarrow")
                .union(rd.from_arrow(winners_tbl)))

    joined = docs.join(members, join_type="left_outer", num_partitions=8,
                       on=("doc_id",))

    def split_streams(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(nc):  # packing bounds (docstring): fail loud, not wrong
            assert int(nc.max()) < (1 << 23) and int(doc.max()) < (1 << 40)
        cl = t["cluster"].to_numpy(zero_copy_only=False)  # float w/ NaN
        member = ~np.isnan(cl)
        cl = np.where(member, cl, doc).astype(np.int64)
        packed = np.where(member,
                          (nc << 40) | (_ID_MASK - doc), np.int64(-1))
        return pa.table({"doc_id": pa.array(doc, pa.int64()),
                         "cluster": pa.array(cl, pa.int64()),
                         "n_chars": pa.array(nc, pa.int64()),
                         "member": pa.array(member),
                         "packed": pa.array(packed, pa.int64())})

    marked = _checkpoint(joined.map_batches(split_streams,
                                            batch_format="pyarrow"),
                         "neardup_best_marked")
    loners = marked.map_batches(
        lambda t: t.filter(pc.invert(t["member"])).select(
            ["doc_id", "cluster", "n_chars"]),
        batch_format="pyarrow")
    winners = (marked.map_batches(
        lambda t: t.filter(t["member"]).select(["cluster", "packed"]),
        batch_format="pyarrow")
        .groupby("cluster").aggregate(Max("packed", alias_name="w")))

    def unpack(t: pa.Table) -> pa.Table:
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(_ID_MASK - (w & _ID_MASK), pa.int64()),
            "cluster": t["cluster"],
            "n_chars": pa.array(w >> 40, pa.int64())})

    return loners.union(winners.map_batches(unpack,
                                            batch_format="pyarrow"))


def ann_topk(sf_dir: str):
    """Brute-force cosine top-10 for 8 fixed query vectors (vec_id 0–7):
    broadcast query matrix → per-batch matmul partial top-k → per-query
    reduce. Scores rounded to 6 so the SQL oracle agrees exactly."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    queries = _query_vecs(sf_dir, 8)
    out = F_ann.brute_force_topk(ds, queries, k=10)
    return out.select_columns(["query_id", "vec_id", "score_e6", "rank"])


ANN_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < 8),
scores AS (
  SELECT q.query_id, e.vec_id,
         CAST(round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS score_e6
  FROM q CROSS JOIN embeddings e)
SELECT query_id, vec_id, score_e6,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY score_e6 DESC, vec_id ASC) AS rank
FROM scores
QUALIFY rank <= 10
"""


def embedding_near_dup_exact(sf_dir: str):
    """Exact cosine near-dup pairs (score ≥ 0.3) over the vec_id < 1000
    subset — bounded all-pairs so DuckDB can oracle it."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], 1000)),
        batch_format="pyarrow")

    def allpairs(g: pd.DataFrame) -> pd.DataFrame:
        m = F_ann._normalize(
            np.stack(g["embedding"].map(np.asarray)).astype(np.float64))
        ids = g["vec_id"].to_numpy()
        s = m @ m.T
        iu, ju = np.triu_indices(len(g), k=1)
        se6 = np.round(s[iu, ju] * 1e6).astype(np.int64)
        keep = se6 >= 300000
        return pd.DataFrame({
            "a": np.minimum(ids[iu[keep]], ids[ju[keep]]),
            "b": np.maximum(ids[iu[keep]], ids[ju[keep]]),
            "score_e6": se6[keep]})

    return ds.map_batches(lambda t: t.append_column("g", pa.array([0] * t.num_rows)),
                          batch_format="pyarrow").groupby("g").map_groups(
        allpairs, batch_format="pandas")


EMB_NEAR_DUP_SQL = """
SELECT a.vec_id AS a, b.vec_id AS b,
       CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS score_e6
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < 1000 AND b.vec_id < 1000
  AND CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) * 1000000) AS BIGINT) >= 300000
"""


def embedding_near_dup_lsh(sf_dir: str):
    """Scale path: LSH-bucketed near-dup pairs (approximate; rows-only)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return F_ann.embedding_near_dup_pairs(ds, threshold=0.3, bits=8)


# ============================================== crawl + multimodal ops


def crawl_fetch(sf_dir: str):
    """The flagship crawl (conformance mode) over the scale-matched
    synthetic web; returns the fetch table (no spans — hashable cols)."""
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=4))
    return res.fetched.select_columns(["url", "host", "depth", "seq",
                                      "status"])


def crawl_edges(sf_dir: str):
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=4))
    return res.edges


def crawl_enriched(sf_dir: str):
    """Full training-data crawl: fetch → enrich (quality, lang-id,
    simhash, minhash-LSH bands) fused in one pass; returns the enriched
    fetch table (hashable scalar cols only)."""
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=4,
                            enrich=True))
    return res.fetched.select_columns(
        ["url", "depth", "seq", "status", "n_tokens", "n_uniq_tokens",
         "n_stopwords", "lang_pred", "simhash"])


def crawl_enriched_bpe(sf_dir: str):
    """Tokenize-at-ingest: BPE merges trained on the documents corpus
    (functions/bpe.py) are applied INSIDE the crawl's enrich stage —
    every fetched page carries its n_bpe_pieces token budget the moment
    it lands, no later full re-read pass (the merge table broadcasts
    once; encoding memoizes per unique word per batch). Deterministic;
    rows-only (iterative trainer upstream)."""
    import pyarrow.parquet as pq

    from rendler_ray.functions.bpe import bpe_train
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    merges = bpe_train(_read(sf_dir, "documents", ["text"]),
                       num_merges=16)
    docs = _synth_docs_for(sf_dir)
    mpath = docs.replace(".parquet", "") + "_bpe_merges.parquet"
    pq.write_table(merges, mpath)
    res = crawl(CrawlConfig(docs_path=docs, seeds=default_seeds(1),
                            max_depth=4, enrich=True,
                            enrich_bpe_merges=mpath))
    return res.fetched.select_columns(
        ["url", "depth", "seq", "status", "n_tokens", "n_bpe_pieces"])


def crawl_polite(sf_dir: str):
    """Politeness-budgeted crawl (per-host budget + robots): deferred
    URLs keep their discovery seq and drain in later rounds (T2/A4
    skew-rebalance shape). Deterministic; rows-only check."""
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=3,
                            host_budget_per_round=50,
                            robots={"h001": "User-agent: *\nDisallow: /\n"}))
    return res.fetched.select_columns(["url", "host", "depth", "seq",
                                      "status"])


def host_stats_from_crawl(edges, fetched):
    """Per-host link-graph statistics core (see host_graph_stats): the
    big tables shuffle once each — edges collapse to (src_host,
    dst_host) pair counts in a per-batch partial before the groupby, the
    fetched table to per-host page counts; every metric then folds from
    those SMALL keyed tables via one union-groupby (no joins, no second
    pass over the raw edges)."""
    from rendler_ray.functions.canon import hosts_np

    def pair_partial(t: pa.Table) -> pa.Table:
        sh = hosts_np(t["src"].to_numpy(zero_copy_only=False))
        dh = hosts_np(t["dst"].to_numpy(zero_copy_only=False))
        df = (pd.DataFrame({"src_host": sh, "dst_host": dh, "n": 1})
              .groupby(["src_host", "dst_host"], sort=False)
              .sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = (edges.select_columns(["src", "dst"])
             .map_batches(pair_partial, batch_format="pyarrow")
             .groupby(["src_host", "dst_host"])
             .aggregate(Sum("n", alias_name="n")))

    metrics = ["pages", "out_edges", "in_edges", "cross_host_edges",
               "n_dst_hosts"]

    def _metric_rows(host, **vals):
        cols = {"host": host}
        n = len(host)
        for m in metrics:
            v = vals.get(m)
            cols[m] = (pa.array(v, pa.int64()) if v is not None
                       else pa.array(np.zeros(n, np.int64), pa.int64()))
        return pa.table(cols)

    def from_pairs(t: pa.Table) -> pa.Table:
        sh = t["src_host"].to_numpy(zero_copy_only=False)
        dh = t["dst_host"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = _metric_rows(
            pa.array(sh, pa.string()), out_edges=n,
            cross_host_edges=np.where(sh != dh, n, 0),
            n_dst_hosts=np.ones(len(sh), np.int64))
        inn = _metric_rows(pa.array(dh, pa.string()), in_edges=n)
        return pa.concat_tables([out, inn])

    def from_fetched(t: pa.Table) -> pa.Table:
        hosts, counts = np.unique(
            t["host"].to_numpy(zero_copy_only=False), return_counts=True)
        return _metric_rows(pa.array(hosts, pa.string()),
                            pages=counts.astype(np.int64))

    rows = (pairs.map_batches(from_pairs, batch_format="pyarrow")
            .union(fetched.select_columns(["host"])
                   .map_batches(from_fetched, batch_format="pyarrow")))
    return rows.groupby("host").aggregate(
        *[Sum(m, alias_name=m) for m in metrics])


def host_graph_stats(sf_dir: str):
    """Per-host link-graph statistics over the crawl: pages fetched,
    out-/in-edges, cross-host edges, distinct destination hosts
    (host_stats_from_crawl — single-shuffle partial-aggregate shape;
    brute-force-equality tested). Deterministic; rows-only
    (crawl-derived input)."""
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=4))
    return host_stats_from_crawl(res.edges, res.fetched)


def crawl_prioritized(sf_dir: str):
    """Focused crawl (Cho/García-Molina/Page'98 URL ordering): a first
    crawl's PageRank becomes the second crawl's frontier priority — each
    round fetches the 64 highest-ranked frontier URLs, the rest defer
    (stages/prioritize.py). Without a depth cap the fetched SET equals
    the FIFO crawl's (invariant-tested in tests/test_prioritize.py);
    under this query's max_depth=4 the focused crawl instead spends its
    depth budget along high-rank paths, and seq values shift because
    children of deferred pages are discovered later.
    Deterministic (fixed-point e9 scores, seq tie-break); rows-only
    (iterative scoring upstream)."""
    import shutil

    from rendler_ray.functions.graph import pagerank_auto
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    docs = _synth_docs_for(sf_dir)
    base = crawl(CrawlConfig(docs_path=docs, seeds=default_seeds(1),
                             max_depth=4))
    # size-gated: broadcast below 1M nodes, distributed above — the
    # gate is bit-invisible (tests/test_graph.py forced-threshold test).
    # Scores stream straight to the parquet score table (a Dataset →
    # write_parquet dir, never driver-materialized).
    ranks = pagerank_auto(base.edges, iters=5)

    def fixed_point(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t["url"],
            "score": pa.array(
                np.round(t["rank"].to_numpy(zero_copy_only=False)
                         * 1e9).astype(np.int64), pa.int64())})

    spath = docs.replace(".parquet", "") + "_pr_scores.parquet"
    if os.path.isfile(spath):    # pre-r4 runs wrote a single file here
        os.remove(spath)
    shutil.rmtree(spath, ignore_errors=True)
    ranks.map_batches(fixed_point,
                      batch_format="pyarrow").write_parquet(spath)
    res = crawl(CrawlConfig(docs_path=docs, seeds=default_seeds(1),
                            max_depth=4, priority_scores=spath,
                            priority_per_round=64))
    return res.fetched.select_columns(["url", "host", "depth", "seq",
                                       "status"])


def crawl_embed(sf_dir: str):
    """Crawl → text-embedding INFERENCE (stages/embed.py::TextEmbedder,
    the actor-pool text twin of the media decoder — model load once per
    actor, batched vectorized inference per batch; stub-backed in this
    sandbox, honest about it): every fetched 200 page gets an
    L2-normalized embedding at ingest, closing the produce side of the
    embed → index → dedup chain the ANN ops consume. Output is the
    hashable scalar projection (first component + L1 norm, fixed-point
    e6). Deterministic; rows-only, golden-pinned."""
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds
    from rendler_ray.stages.embed import embed_text_ds
    from rendler_ray.stages.enrich import page_text_column

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=4))

    def prep(t: pa.Table) -> pa.Table:
        ok = t.filter(pc.equal(t["status"], 200))
        return page_text_column(ok).select(["url", "page_text"])

    pages = res.fetched.map_batches(prep, batch_format="pyarrow")
    emb = embed_text_ds(pages, text_col="page_text")

    def summarize(t: pa.Table) -> pa.Table:
        m = F_ann.batch_to_matrix(t, "embedding")
        return pa.table({
            "url": t["url"],
            "emb0_e6": pa.array(np.round(m[:, 0] * 1e6).astype(np.int64),
                                pa.int64()),
            "l1_e6": pa.array(
                np.round(np.abs(m).sum(axis=1) * 1e6).astype(np.int64),
                pa.int64())})

    return emb.map_batches(summarize, batch_format="pyarrow")


def scrub_url_tokens(sf_dir: str):
    """PII-style scrubbing stage over the crawled pages: redact every
    URL token (absolute or host-relative) to '<|url|>' — the same
    vectorized regex-redaction kernel an email/phone scrub uses
    (``pc.replace_substring_regex``; one C pass, no Python rows). The
    synthetic corpus's identifying strings ARE its URLs, so this is the
    honest closed-world stand-in. Output: (url, n_scrubbed,
    scrubbed_md5) — count + content hash of the redacted text.
    Deterministic; rows-only, golden-pinned."""
    import hashlib

    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds
    from rendler_ray.stages.enrich import page_text_column

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=4))
    pat = r"(s://h\d{3})?/p\d{5}"

    def scrub(t: pa.Table) -> pa.Table:
        ok = page_text_column(t.filter(pc.equal(t["status"], 200)))
        txt = ok["page_text"].combine_chunks()
        n = pc.count_substring_regex(txt, pat)
        red = pc.replace_substring_regex(txt, pat, "<|url|>")
        md5s = [hashlib.md5(x.encode()).hexdigest()
                for x in red.to_pylist()]
        return pa.table({"url": ok["url"],
                         "n_scrubbed": pc.cast(n, pa.int64()),
                         "scrubbed_md5": pa.array(md5s, pa.string())})

    return res.fetched.map_batches(scrub, batch_format="pyarrow")


def doc_fingerprint_winnow(sf_dir: str):
    """Winnowing document fingerprints (Schleimer et al. SIGMOD'03) —
    rolling-hash windows, keep-smallest selection. Rows-only."""
    from rendler_ray.functions.text import rolling_hash_fingerprint

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "winnow_fp": pa.array(
                [rolling_hash_fingerprint(x)
                 for x in t["text"].to_pylist()], pa.string()),
        })

    return ds.map_batches(fp, batch_format="pyarrow")


def crawl_auto_robots(sf_dir: str):
    """Crawl with robots.txt auto-fetched from the web itself (per new
    host) + crawl-delay budgets — the full politeness flow end-to-end.
    Deterministic; rows-only."""
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds, docs_parquet

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    n = {"0.001": 200, "0.01": 2000, "0.1": 20000}.get(sf, 2000)
    path = docs_parquet(f"/tmp/rendler_ray_web/docs_robots_{n}.parquet",
                        n_docs=n, n_hosts=max(8, n // 100), seed=42,
                        p_host_robots=0.7)
    res = crawl(CrawlConfig(docs_path=path, seeds=default_seeds(1),
                            max_depth=4, auto_robots=True))
    return res.fetched.select_columns(["url", "host", "depth", "seq",
                                      "status"])


def crawl_redirects(sf_dir: str):
    """Crawl over a corpus where ~15% of pages are HTTP-301 redirects:
    fetch reports status 301, render skips them, extract follows the
    single Location edge. Deterministic; conformance-tested vs
    refsim.simulate (tests/test_crawl.py::test_redirect_conformance);
    rows-only here."""
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds, docs_parquet

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    n = {"0.001": 200, "0.01": 2000, "0.1": 20000}.get(sf, 2000)
    path = docs_parquet(f"/tmp/rendler_ray_web/docs_redir_{n}.parquet",
                        n_docs=n, n_hosts=max(8, n // 100), seed=42,
                        p_redirect=0.15)
    res = crawl(CrawlConfig(docs_path=path, seeds=default_seeds(1),
                            max_depth=4))
    return res.fetched.select_columns(["url", "host", "depth", "seq",
                                      "status"])


def crawl_canonical_groups(sf_dir: str):
    """Canonical-URL consolidation after a crawl over a rel=canonical
    corpus: each fetched 200 page maps to its declared canonical target
    (itself if none), then ONE groupby(canonical_url) counts the alias
    set and picks the first-discovered alias (min seq) as the keeper —
    the index-dedup step a canonical-aware crawler runs. Vectorized
    span scan (flatten once, first canonical per page); deterministic;
    conformance of the underlying crawl is pinned by
    tests/test_crawl.py::test_canonical_conformance."""
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds, docs_parquet

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    n = {"0.001": 200, "0.01": 2000, "0.1": 20000}.get(sf, 2000)
    path = docs_parquet(f"/tmp/rendler_ray_web/docs_canon_{n}.parquet",
                        n_docs=n, n_hosts=max(8, n // 100), seed=42,
                        p_canonical=0.3)
    res = crawl(CrawlConfig(docs_path=path, seeds=default_seeds(1),
                            max_depth=4))

    def canon_of(t: pa.Table) -> pa.Table:
        ok = t.filter(pc.equal(t["status"], 200))
        spans = ok["spans"].combine_chunks()
        flat = pc.list_flatten(spans)
        kinds = flat.field("kind").to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        urls = ok["url"].to_numpy(zero_copy_only=False)
        canon = urls.copy()
        cm = kinds == "canonical"
        # last write per parent is fine: synth pages carry ≤1 canonical
        canon[par[cm]] = flat.field("text").to_numpy(
            zero_copy_only=False)[cm]
        return pa.table({
            "canonical_url": pa.array(canon, pa.string()),
            "alias_url": ok["url"],
            "seq": ok["seq"]})

    mapped = res.fetched.map_batches(canon_of, batch_format="pyarrow")
    groups = mapped.groupby("canonical_url").aggregate(
        Count(alias_name="n_aliases"), Min("seq", alias_name="min_seq"))
    # join the min-seq winner's url back (tiny second pass, no driver set)
    winners = mapped.map_batches(
        lambda t: t.rename_columns(["canonical_url", "winner_url",
                                    "min_seq"]),
        batch_format="pyarrow")
    return groups.join(winners, join_type="inner", num_partitions=8,
                       on=("canonical_url", "min_seq"))


def training_data_pipeline(sf_dir: str):
    """The end-to-end training-data story in ONE composition over the
    live crawl: enriched crawl (quality/lang/simhash fused at fetch) →
    C4-style quality gate (corpus-exact P5/P95 length band + 5%
    stopword floor, thresholds computed from the crawled pages
    themselves) → SimHash near-dup drop (lossless 4×16-bit banding,
    smaller-url keeper per pair, drops removed by a left-join marker —
    no driver drop-set) → deterministic 20% hash sample → SEQUENCE
    PACKING manifest (functions/pack.py::pack_manifest_by_counts):
    the surviving shard, hash-shuffled and cut into 256-token training
    sequences from the n_tokens budgets the enrich stage computed at
    fetch time (no text re-read). Returns the per-sequence manifest
    (seq_id, n_tokens, n_docs, first_id). Every stage is the at-scale
    shape its standalone query uses; deterministic, golden-pinned."""
    from rendler_ray.functions.canon import stable_hash64
    from rendler_ray.functions.pack import pack_manifest_by_counts
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds
    from rendler_ray.state.politeness import _nonempty_blocks

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=4,
                            enrich=True))
    pages = res.fetched.select_columns(
        ["url", "status", "n_tokens", "n_stopwords", "simhash"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["status"], 200))
                   .drop_columns(["status"]),
        batch_format="pyarrow")

    # -- stage 1: data-driven quality gate (value-histogram percentiles)
    hist = (pages.groupby("n_tokens").aggregate(Count(alias_name="c"))
            .sort("n_tokens").take_all())
    v = np.array([r["n_tokens"] for r in hist], np.int64)
    cum = np.cumsum(np.array([r["c"] for r in hist], np.int64))
    n = int(cum[-1])
    p5 = int(v[np.searchsorted(cum, (5 * n + 99) // 100)])
    p95 = int(v[np.searchsorted(cum, (95 * n + 99) // 100)])

    def gate(t: pa.Table) -> pa.Table:
        nt = t["n_tokens"].to_numpy(zero_copy_only=False)
        ns = t["n_stopwords"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(
            (nt >= p5) & (nt <= p95) & (20 * ns >= nt)))

    kept = pages.map_batches(gate, batch_format="pyarrow")

    # -- stage 2: simhash near-dup pairwise drop (keep the smaller url);
    # hot buckets salted into sub-buckets (_simhash_banded_salted) so a
    # boilerplate-heavy corpus can't put O(b²) pairs in one task
    banded = _simhash_banded_salted(
        kept.select_columns(["url", "simhash"]), id_col="url")

    def bucket_drops(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["url"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"url": pd.Series([], dtype=object)})
        sig = g["simhash"].to_numpy().astype(np.uint64)
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = F_text.hamming64(sig[iu], sig[ju]) <= 3
        drops = np.where(ids[iu[keep]] > ids[ju[keep]],
                         ids[iu[keep]], ids[ju[keep]])
        return pd.DataFrame({"url": pd.Series(np.unique(drops),
                                              dtype=object)})

    drops = (banded.groupby("bucket_key")
             .map_groups(bucket_drops, batch_format="pandas")
             .groupby("url").aggregate(Count(alias_name="_flag")))
    drops = _nonempty_blocks(drops.materialize())
    if drops is not None:
        j = kept.join(drops, join_type="left_outer", num_partitions=8,
                      on=("url",))
        kept = j.map_batches(
            lambda t: t.filter(pc.is_null(t["_flag"])).drop_columns(
                ["_flag"]),
            batch_format="pyarrow")

    # -- stage 3: deterministic 20% shard sample (hash threshold)
    thr = np.uint64(int(0.2 * 2**64))

    def sample(t: pa.Table) -> pa.Table:
        h = stable_hash64(t["url"])
        return t.filter(pa.array(h < thr))

    sampled = kept.map_batches(sample, batch_format="pyarrow")

    # -- stage 4: packed-sequence manifest (hash-shuffled training
    # export) from the crawl-time n_tokens budgets — the text never
    # re-reads; at write time the same offsets drive the token sink
    return pack_manifest_by_counts(sampled, seq_len=256,
                                   id_col="url", n_col="n_tokens")


def pack_training_sequences(sf_dir: str):
    """Training-batch export, the LLM pipeline's last mile: documents
    (+ one end-of-doc token each) are concatenated in DETERMINISTIC
    SHUFFLED order (md5 hash-ordering — reproducible and
    SQL-expressible, unlike random_shuffle) and cut into fixed-length
    128-token sequences, docs straddling cut points (packed-pretraining
    layout). Fully distributed: two-pass bucket prefix sum for global
    offsets, text to the packers by hash join, per-(doc, seq) partial
    rows folded by one groupby(seq_id) (functions/pack.py). Output is
    the per-sequence manifest (n_tokens — seq_len except the tail —
    n_docs, boundary tokens), verified token-exactly by the DuckDB
    oracle's window-cumsum + zipped-unnest formulation."""
    from rendler_ray.functions.pack import pack_sequences

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return pack_sequences(ds, seq_len=128)


PACK_SEQUENCES_SQL = """
WITH d AS (
  SELECT doc_id, list_append(string_split(text, ' '), '<|eod|>') AS toks,
         len(string_split(text, ' ')) + 1 AS n,
         md5(CAST(doc_id AS VARCHAR) || '-pk') AS hkey
  FROM documents),
o AS (
  SELECT doc_id, toks, n,
         CAST(COALESCE(sum(n) OVER (ORDER BY hkey, doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM d),
tok AS (
  SELECT doc_id,
         off + unnest(generate_series(1, n)) - 1 AS pos,
         unnest(toks) AS token
  FROM o)
SELECT pos // 128 AS seq_id,
       count(*) AS n_tokens,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       arg_min(token, pos) AS first_token,
       arg_max(token, pos) AS last_token
FROM tok GROUP BY seq_id
"""


def pack_token_shards(sf_dir: str):
    """Token-level training shards — the artifact a trainer actually
    loads (closing r3's manifest-only last mile): documents are packed
    into 128-token sequences carrying the FULL token arrays
    (tokens: list<string> + token_ids: list<int32>,
    functions/pack.py::pack_token_sequences), written as resumable
    hash-bucketed parquet shards (storage.write_partitioned — stamped
    buckets, crash-safe re-runs), then verified FROM THE WRITTEN
    SHARDS: the returned rows (seq_id, n_tokens, n_docs, tokens_md5)
    are computed off the read-back, so the oracle pins the on-disk
    artifact token-exactly (DuckDB md5(string_agg(token ORDER BY
    pos)) over the zipped-unnest reconstruction)."""
    import hashlib
    import shutil

    from rendler_ray.functions.pack import pack_token_sequences
    from rendler_ray.storage import write_partitioned

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    seqs = pack_token_sequences(ds, seq_len=128)
    out = f"{_ckpt_root()}/token_shards"
    shutil.rmtree(out, ignore_errors=True)
    write_partitioned(seqs, out, key_col="seq_id", num_buckets=8)

    def verify_rows(t: pa.Table) -> pa.Table:
        joined = pc.binary_join(t["tokens"], " ")
        md5s = [hashlib.md5(s.encode()).hexdigest()
                for s in joined.to_pylist()]
        return pa.table({
            "seq_id": t["seq_id"],
            "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
            "n_docs": pc.cast(t["n_docs"], pa.int64()),
            "tokens_md5": pa.array(md5s, pa.string())})

    return (rd.read_parquet(out)
            .map_batches(verify_rows, batch_format="pyarrow"))


PACK_TOKEN_SHARDS_SQL = """
WITH d AS (
  SELECT doc_id, list_append(string_split(text, ' '), '<|eod|>') AS toks,
         len(string_split(text, ' ')) + 1 AS n,
         md5(CAST(doc_id AS VARCHAR) || '-pk') AS hkey
  FROM documents),
o AS (
  SELECT doc_id, toks, n,
         CAST(COALESCE(sum(n) OVER (ORDER BY hkey, doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM d),
tok AS (
  SELECT doc_id,
         off + unnest(generate_series(1, n)) - 1 AS pos,
         unnest(toks) AS token
  FROM o)
SELECT pos // 128 AS seq_id,
       count(*) AS n_tokens,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       md5(string_agg(token, ' ' ORDER BY pos)) AS tokens_md5
FROM tok GROUP BY seq_id
"""


def crawl_content_dedup(sf_dir: str):
    """Training-data crawl with exact content dedup fused in: duplicate
    pages (same text fingerprint) are dropped before render/extract,
    first discoverer wins (crawl.py::_content_dedup_round). The
    synthetic corpus has near-zero exact dups, so this exercises the
    plumbing at full crawl scale. Deterministic; rows-only."""
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=4,
                            content_dedup=True))
    return res.fetched.select_columns(["url", "host", "depth", "seq",
                                      "status"])


def crawl_incremental(sf_dir: str):
    """Incremental re-crawl end-to-end: crawl the corpus with
    checkpointing, then re-crawl the SAME corpus against that prior run
    — every page's content is unchanged, so the render stage is skipped
    entirely and all artifacts are reused (crawl.py recrawl_prior_dir).
    Returns the reused renders (sans image bytes). Deterministic;
    rows-only."""
    import shutil
    import uuid

    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    prior_dir = f"/tmp/rendler_ray_ckpt/recrawl-{uuid.uuid4().hex[:12]}"
    base = dict(docs_path=_synth_docs_for(sf_dir), seeds=default_seeds(1),
                max_depth=4)
    crawl(CrawlConfig(**base, out_dir=prior_dir))
    res = crawl(CrawlConfig(**base, recrawl_prior_dir=prior_dir))
    assert res.stats["pages_rendered"] == 0, "identical corpus must reuse"
    out = res.renders.select_columns(["doc_id", "media_ref",
                                      "rendered_round"]).materialize()
    shutil.rmtree(prior_dir, ignore_errors=True)
    return out


def _diff_crawl_pair(sf_dir: str):
    """Crawl two deterministic snapshots of the synthetic web: the base
    corpus and its mutated "next snapshot" (pages dropped / text-edited
    / one-link-added — sources/synthweb.py::mutate_docs)."""
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import (
        default_seeds,
        mutated_docs_parquet,
    )

    base = _synth_docs_for(sf_dir)
    v2 = mutated_docs_parquet(base)
    res_a = crawl(CrawlConfig(docs_path=base, seeds=default_seeds(1),
                              max_depth=4))
    res_b = crawl(CrawlConfig(docs_path=v2, seeds=default_seeds(1),
                              max_depth=4))
    return res_a, res_b


def crawl_diff_edges(sf_dir: str):
    """Cross-run structural edge diff: which (src, dst) links exist in
    exactly one of two crawl snapshots (pipelines/diff.py::edge_diff —
    one union-groupby shuffle over per-batch-deduped pairs).
    Deterministic; rows-only (conformance-tested vs refsim diffs)."""
    from rendler_ray.pipelines.diff import edge_diff

    res_a, res_b = _diff_crawl_pair(sf_dir)
    return edge_diff(res_a.edges, res_b.edges)


def crawl_diff_pages(sf_dir: str):
    """Cross-run page-content diff: per-URL added / removed / changed
    between two crawl snapshots via content-fingerprint FULL OUTER join
    (pipelines/diff.py::page_diff). Deterministic; rows-only."""
    from rendler_ray.pipelines.diff import page_diff

    res_a, res_b = _diff_crawl_pair(sf_dir)
    return page_diff(res_a.fetched, res_b.fetched)


def pagerank_crawl_graph(sf_dir: str):
    """PageRank over the crawl's edge table — the flagship name runs
    the size-GATED form (functions/graph.py::pagerank_auto): broadcast
    power iteration while the node table fits driver RAM, the fully
    distributed per-iteration-join ``pagerank_ds`` above the gate. The
    two forms bit-agree (pytest), so the gate is invisible in output.
    Deterministic; ranks emitted fixed-point (1e-9) for stability.
    Rows-only (iterative)."""
    from rendler_ray.functions.graph import pagerank_auto
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=4))
    ranks = pagerank_auto(res.edges, iters=10)

    def fixed(t: pa.Table) -> pa.Table:
        e9 = pc.cast(pc.round(pc.multiply(t["rank"], 1e9)), pa.int64())
        return pa.table({"url": t["url"], "rank_e9": e9})

    return ranks.map_batches(fixed, batch_format="pyarrow")


def hits_crawl_graph(sf_dir: str):
    """HITS hubs/authorities over the crawl's edge table (Kleinberg
    JACM'99) — the link-analysis complement to PageRank (authorities =
    heavily-cited pages, hubs = good link indexes; a crawl scheduler
    prioritizes by either). Runs the size-gated form
    (functions/graph.py::hits_auto): broadcast power iteration under
    the driver-RAM gate, per-iteration-join ``hits_ds`` above it.
    MAX-normalized each half-step — an order-independent float
    reduction, so scores are parallelism-stable. Fixed-point e9;
    rows-only (iterative), golden-pinned + two-form agreement pytest."""
    from rendler_ray.functions.graph import hits_auto
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=4))
    scores = hits_auto(res.edges, iters=10)

    def fixed(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t["url"],
            "hub_e9": pc.cast(pc.round(pc.multiply(t["hub"], 1e9)),
                              pa.int64()),
            "auth_e9": pc.cast(pc.round(pc.multiply(t["auth"], 1e9)),
                               pa.int64())})

    return scores.map_batches(fixed, batch_format="pyarrow")


def pagerank_joined_crawl(sf_dir: str):
    """Fully distributed PageRank (ranks as a Dataset, per-iteration
    hash join ranks ⋈ edges on src — the past-10^8-nodes form; see
    functions/graph.py::pagerank_ds). Same fixture crawl as
    pagerank_crawl_graph; agrees with the broadcast form to 1e-9
    (asserted in tests). Rows-only (iterative)."""
    from rendler_ray.functions.graph import pagerank_ds
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=4))
    ranks = pagerank_ds(res.edges, iters=10, num_partitions=8)

    def fixed(t: pa.Table) -> pa.Table:
        e9 = pc.cast(pc.round(pc.multiply(t["rank"], 1e9)), pa.int64())
        return pa.table({"url": t["url"], "rank_e9": e9})

    return ranks.map_batches(fixed, batch_format="pyarrow")


def bpe_train_merges(sf_dir: str):
    """Learned BPE merge table over the documents corpus (classic
    Sennrich'16 merge learning on the word-frequency table — raw text
    is shuffled exactly once; see functions/bpe.py). Deterministic
    (count desc, pair lexicographic tie-break); rows-only (iterative)."""
    from rendler_ray.functions.bpe import bpe_train

    ds = _read(sf_dir, "documents", ["text"])
    return bpe_train(ds, num_merges=16)


def bpe_encode_docs(sf_dir: str):
    """Tokenize the corpus under its own trained BPE merges: train (16
    merges) then one encode pass — (doc_id, n_bpe_pieces). The merge
    table broadcasts once; encoding memoizes per unique word per batch.
    Deterministic; rows-only (depends on the iterative trainer)."""
    from rendler_ray.functions.bpe import bpe_encode_batch, bpe_train

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    merges_tbl = bpe_train(_read(sf_dir, "documents", ["text"]),
                           num_merges=16)
    merges_ref = ray.put(list(zip(merges_tbl["left"].to_pylist(),
                                  merges_tbl["right"].to_pylist())))
    return ds.map_batches(
        bpe_encode_batch, fn_kwargs={"merges_ref": merges_ref},
        batch_format="pyarrow").select_columns(["doc_id", "n_bpe_pieces"])


def label_prop_crawl(sf_dir: str):
    """Community detection over the crawl graph: 5 rounds of
    synchronous label propagation (functions/graph.py::
    label_propagation_auto — deterministic sync variant; vectorized
    driver rounds below a 2M-edge gate, distributed join + count +
    per-node mode rounds above it, two-form pytested). Communities are the
    site/cluster granularity a corpus-mixing pass balances over —
    finer than connected components, coarser than pages. Rows-only
    (iterative), golden-pinned + driver-recompute pytest."""
    from rendler_ray.functions.graph import label_propagation_auto
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=4))
    return label_propagation_auto(res.edges)


def connected_components_crawl(sf_dir: str):
    """Connected components of the crawl graph (undirected view):
    alternating large-star / small-star contraction (Kiveris SoCC'14,
    functions/graph.py::connected_components_star) — O(log² n) rounds
    vs graph-diameter rounds for the min-label-propagation form
    (connected_components_ds, kept as the cross-checked reference
    implementation in tests). Deterministic (labels are
    lexicographic-min urls); rows-only (iterative)."""
    from rendler_ray.functions.graph import connected_components_star
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds

    res = crawl(CrawlConfig(docs_path=_synth_docs_for(sf_dir),
                            seeds=default_seeds(1), max_depth=4))
    return connected_components_star(res.edges, num_partitions=8)


def media_features(sf_dir: str):
    """Multimodal plumbing: explode media spans from the interleaved docs
    → actor-pool decode (deterministic stub) → typed features."""
    docs = rd.read_parquet(_synth_docs_for(sf_dir))
    out = F_media.media_pipeline(docs)
    return out.select_columns(["doc_id", "media_ref", "kind", "n_bytes",
                               "width", "height"])


def media_text_match(sf_dir: str):
    """Cross-modal retrieval — the CLIP-style dual-encoder shape a
    multimodal training pipeline runs to pair images with captions:
    TEXT tower = the actor-pool ``TextEmbedder`` over the interleaved
    docs (64-d, model-load-once); IMAGE tower = the media decode
    stub's 8-d features lifted into the SAME 64-d space by a seeded
    projection (stands in for the image encoder; swap in a real model
    per the media.py contract, nothing else changes). The 16
    lexicographically-first media_refs are the query images; matching
    is the shared broadcast-queries → per-batch partial top-k →
    fixed-point reduce chain (ann_topk's shape — the text corpus
    streams, nothing all-pairs). Deterministic; rows-only,
    golden-pinned (stub embeddings aren't SQL-expressible)."""
    from rendler_ray.stages.embed import embed_text_ds
    from rendler_ray.stages.enrich import page_text_column

    docs = rd.read_parquet(_synth_docs_for(sf_dir))

    def prep(t: pa.Table) -> pa.Table:
        out = page_text_column(t)
        return pa.table({"vec_id": out["doc_id"],
                         "page_text": out["page_text"]})

    emb = embed_text_ds(docs.map_batches(prep, batch_format="pyarrow"),
                        text_col="page_text")

    media = F_media.media_pipeline(docs)

    def prune16(t: pa.Table) -> pa.Table:
        # each batch keeps its own 16 lexicographically-first refs, so
        # every global winner survives its batch — the driver fold sees
        # <= 16 * n_blocks rows, never the media table
        t = t.select(["media_ref", "feature"])
        if t.num_rows > 16:
            idx = np.argsort(np.asarray(t["media_ref"].to_pylist(),
                                        dtype=object))[:16]
            t = t.take(pa.array(np.sort(idx), pa.int64()))
        return t

    feats = pa.concat_tables(
        media.map_batches(prune16, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    order = np.argsort(np.asarray(feats["media_ref"].to_pylist(),
                                  dtype=object))[:16]
    refs = [feats["media_ref"][int(i)].as_py() for i in order]
    f8 = np.stack([np.asarray(feats["feature"][int(i)].as_py(),
                              np.float64) for i in order])
    proj = np.random.default_rng(99).standard_normal((8, 64))
    qmat = f8 @ proj  # brute_force_topk normalizes queries itself
    queries = {r: qmat[i] for i, r in enumerate(refs)}

    out = F_ann.brute_force_topk(emb, queries, k=3).select_columns(
        ["query_id", "vec_id", "score_e6", "rank"])
    return out.map_batches(
        lambda t: t.rename_columns(
            ["media_ref", "doc_id", "score_e6", "rank"]),
        batch_format="pyarrow")


def media_thumbnails(sf_dir: str):
    """Decode → resize chain (geometry real, payload stubbed): returns
    (doc_id, media_ref, thumb_w, thumb_h, thumb_bytes)."""
    docs = rd.read_parquet(_synth_docs_for(sf_dir))
    decoded = F_media.media_pipeline(docs)
    out = decoded.map_batches(F_media.media_resize_batch,
                              fn_kwargs={"max_side": 256},
                              batch_format="pyarrow", batch_size=256)

    def sizes(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "media_ref": t["media_ref"],
                         "thumb_w": t["thumb_w"], "thumb_h": t["thumb_h"],
                         "thumb_bytes": pc.binary_length(t["thumb"])})

    return out.map_batches(sizes, batch_format="pyarrow")


def media_frame_samples(sf_dir: str):
    """Video frame-sampling plumbing over a video-bearing variant of the
    synthetic interleaved corpus: explode media spans → sample frames
    (deterministic stub payloads, real schema/batching)."""
    from rendler_ray.sources.synthweb import docs_parquet

    path = docs_parquet("/tmp/rendler_ray_web/docs_video_1000.parquet",
                        n_docs=1000, n_hosts=10, seed=42,
                        mean_images=1.2, p_video=0.4)
    docs = rd.read_parquet(path)
    media = docs.map_batches(F_media.explode_media_spans,
                             batch_format="pyarrow")
    frames = media.map_batches(F_media.frame_sample_batch,
                               fn_kwargs={"every_n": 10, "max_frames": 4},
                               batch_format="pyarrow", batch_size=256)

    def sizes(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "media_ref": t["media_ref"],
                         "frame_idx": t["frame_idx"],
                         "frame_bytes": pc.binary_length(t["frame"])})

    return frames.map_batches(sizes, batch_format="pyarrow")


def media_audio_segments(sf_dir: str):
    """Audio segmentation plumbing over an audio-bearing variant of the
    synthetic interleaved corpus (image/video/audio triad): explode
    media spans → fixed-window segments (deterministic stub payloads,
    real schema/batching)."""
    from rendler_ray.sources.synthweb import docs_parquet

    path = docs_parquet("/tmp/rendler_ray_web/docs_audio_1000.parquet",
                        n_docs=1000, n_hosts=10, seed=42,
                        mean_images=1.2, p_video=0.2, p_audio=0.4)
    docs = rd.read_parquet(path)
    media = docs.map_batches(F_media.explode_media_spans,
                             batch_format="pyarrow")
    segs = media.map_batches(F_media.audio_segment_batch,
                             fn_kwargs={"seg_ms": 5000, "max_segments": 4},
                             batch_format="pyarrow", batch_size=256)

    def sizes(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "media_ref": t["media_ref"],
                         "start_ms": t["start_ms"],
                         "seg_bytes": pc.binary_length(t["segment"])})

    return segs.map_batches(sizes, batch_format="pyarrow")


def render_interleaved(sf_dir: str):
    """Render every doc's span sequence (S3-shape) and report the image
    size — exercises the span-sequence canonical serialization."""
    from rendler_ray.stages.render import Renderer

    docs = rd.read_parquet(_synth_docs_for(sf_dir))

    def prep(t: pa.Table) -> pa.Table:
        return t.append_column("status", pa.array([200] * t.num_rows,
                                                  pa.int32())).rename_columns(
            ["url", "spans", "status"])

    prepped = docs.map_batches(prep, batch_format="pyarrow")
    from rendler_ray.stages.render import render_batch

    out = prepped.map_batches(render_batch, fn_kwargs={"round_no": 0},
                              batch_format="pyarrow", num_cpus=1)

    def sizes(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "media_ref": t["media_ref"],
                         "image_bytes": pc.binary_length(t["image"])})

    return out.map_batches(sizes, batch_format="pyarrow")


