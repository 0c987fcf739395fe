# ===================================== round-3 additions (second half):
# substring-level dedup, model-scoring inference, window-family
# completions, semantic dedup.


def dup_span_stats_docs(sf_dir: str, driver_max: int = 5_000_000):
    """Duplicate-substring statistics — the exact-substring training-data
    dedup shape (Lee et al. ACL'22 "Deduplicating Training Data Makes
    Language Models Better", public): a word 5-gram appearing in >= 2
    DISTINCT documents marks a duplicated span; per doc, count its gram
    instances lying in such spans, computed by COMPLEMENT:
    n_dup(doc) = Σ all gram instances − Σ instances of grams UNIQUE to
    the doc. ONE explode pass emits per-batch-combined
    (g1, g2, doc_id, tf) rows — the gram is immediately replaced by a
    128-bit hash (two independently-keyed SipHash64 halves,
    ``pandas.util.hash_array``), so raw gram STRINGS never leave the
    explode task: every downstream exchange carries four int64 columns
    instead of ~30-byte text keys (~6× the corpus). Each doc lives in
    exactly one batch row, so (hash, doc) pairs are globally unique —
    a hash's group row-count IS its distinct-doc count, and a unique
    gram's Min(doc_id)/Sum(tf) identify its sole owner and instance
    count in the same fold. The POSITIVE side never touches the gram
    table: a doc's total gram-instance count is max(n_tokens − 4, 1),
    one cheap vectorized token-count scan.

    Size-gated finish (the connected_components_auto / crawl key-rank
    pattern): total gram instances ≤ ``driver_max`` → the combined
    int64 partials fold on the driver through Arrow's C++ hash
    aggregate (a ~16-byte/row table; 5M rows ≈ 160 MB, one bounded
    pull) — no all-to-all at all; above the gate the identical
    semantics run distributed (hash groupby → negated union →
    groupby(doc_id), two int-keyed shuffles, no join, no corpus-sized
    broadcast). Equality of the two forms is pytest-asserted.

    Collision argument: distinct grams collide on BOTH 64-bit halves
    with probability ≈ n²/2^129 — at 10^12 distinct grams (100-TB
    corpus) that is ~1.5e-15, far below hardware error rates, and a
    collision only perturbs one doc's count by a few grams.
    All-integer, SQL-exact (verified at sf0.01 and sf0.1)."""
    import pandas.util as pdu

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def gram_tf(t: pa.Table) -> pa.Table:
        grams, gpar, _ = F_text.kgram_rows(t["text"].combine_chunks(), 5)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[gpar]
        garr = np.asarray(grams, dtype=object)
        g1 = pdu.hash_array(garr, categorize=False).view(np.int64)
        g2 = pdu.hash_array(garr, hash_key="rendlerdupspan2!",
                            categorize=False).view(np.int64)
        g = (pd.DataFrame({"g1": g1, "g2": g2, "doc_id": ids})
             .groupby(["g1", "g2", "doc_id"], sort=False).size()
             .reset_index(name="tf"))
        return pa.table({
            "g1": pa.array(g["g1"].to_numpy(np.int64), pa.int64()),
            "g2": pa.array(g["g2"].to_numpy(np.int64), pa.int64()),
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64), pa.int64()),
            "tf": pa.array(g["tf"].to_numpy(np.int64), pa.int64())})

    def doc_totals(t: pa.Table) -> pa.Table:
        # total gram instances per doc = max(n_tokens − 4, 1): the same
        # whitespace tokenization as kgram_rows (docs under 5 tokens
        # emit their whole text as one gram)
        ntok = pc.list_value_length(
            pc.split_pattern(t["text"], " ")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "tf": pa.array(np.maximum(ntok - 4, 1),
                                        pa.int64())})

    pos = ds.map_batches(doc_totals, batch_format="pyarrow")
    # gate scalar: one pruned aggregate scan (two ints to the driver)
    tot = pos.aggregate(Sum("tf", alias_name="tot"))["tot"] or 0

    pairs = ds.map_batches(gram_tf, batch_format="pyarrow")

    if tot <= driver_max:
        # bounded-driver fold: pull the batch-combined int partials and
        # finish with two Arrow hash aggregates — zero shuffles
        ptbl = pa.concat_tables(
            pairs.iter_batches(batch_size=None, batch_format="pyarrow"))
        gagg = pa.TableGroupBy(ptbl, ["g1", "g2"]).aggregate(
            [("doc_id", "count"), ("doc_id", "min"), ("tf", "sum")])
        uniq = gagg.filter(pc.equal(gagg["doc_id_count"], 1))
        neg_t = pa.table({"doc_id": uniq["doc_id_min"],
                          "tf": pc.negate(uniq["tf_sum"])})
        pos_t = pa.concat_tables(
            pos.iter_batches(batch_size=None, batch_format="pyarrow"))
        both = pa.concat_tables([pos_t, neg_t])
        out = pa.TableGroupBy(both, "doc_id").aggregate([("tf", "sum")])
        out = out.filter(pc.greater(out["tf_sum"], 0))
        return pa.table({"doc_id": out["doc_id"],
                         "n_dup_grams": out["tf_sum"]})

    gagg = pairs.groupby(["g1", "g2"]).aggregate(
        Count(alias_name="n_docs"),
        Min("doc_id", alias_name="doc_id"),
        Sum("tf", alias_name="tf"))

    def negate_unique(t: pa.Table) -> pa.Table:
        u = t.filter(pc.equal(t["n_docs"], 1))
        return pa.table({"doc_id": u["doc_id"],
                         "tf": pc.negate(u["tf"])})

    neg = gagg.map_batches(negate_unique, batch_format="pyarrow")
    return (pos.union(neg)
            .groupby("doc_id").aggregate(
                Sum("tf", alias_name="n_dup_grams"))
            .map_batches(
                lambda t: t.filter(pc.greater(t["n_dup_grams"], 0)),
                batch_format="pyarrow"))


def remove_dup_spans_docs(sf_dir: str, broadcast_max: int = 1_000_000,
                          num_partitions: int = 8):
    """Exact-substring dedup that REMOVES the duplicated spans — Lee et
    al. ACL'22's actual output (``dup_span_stats_docs`` is the stats
    half): every token covered by a word 5-gram occurring in ≥ 2
    distinct documents is cut, and the cleaned document re-joined.
    Output per AFFECTED doc: (doc_id, n_removed_tokens, cleaned_md5) —
    md5 of the cleaned text (md5('') when nothing survives), so the
    DuckDB oracle pins the cleaned BYTES, not just counts.

    Distributed shape: the dup-gram set is computed as 128-bit hashed
    keys (the dup_span_stats machinery — strings never shuffle). Dup
    grams are the Zipf head, tiny next to the corpus, so up to
    ``broadcast_max`` keys they broadcast once (``ray.put`` of two
    sorted int64 arrays, ~16 MB at the cap) and ONE map pass over the
    documents recomputes its grams locally, marks covered positions
    via a vectorized structured-array ``searchsorted`` membership
    test, and rebuilds the kept tokens with Arrow list offsets +
    ``binary_join`` — no second corpus shuffle. Past the cap the same
    semantics run as int-keyed joins: gram instances ⋈ dup keys →
    per-doc covered starts (bounded lists) ⋈ documents → the same
    vectorized cleaner. Both forms equality-pytested."""
    import hashlib

    import pandas.util as pdu

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def gram_inst(t: pa.Table) -> pa.Table:
        """(doc_id, i, g1, g2) — one row per gram INSTANCE; within a
        doc, gram j starts at token j (kgram_rows slides one token at
        a time; short docs emit one whole-text gram at 0)."""
        grams, gpar, _ = F_text.kgram_rows(t["text"].combine_chunks(), 5)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[gpar]
        garr = np.asarray(grams, dtype=object)
        g1 = pdu.hash_array(garr, categorize=False).view(np.int64)
        g2 = pdu.hash_array(garr, hash_key="rendlerdupspan2!",
                            categorize=False).view(np.int64)
        # occurrence index within each doc == gram start position
        starts = np.arange(len(gpar), dtype=np.int64)
        if len(gpar):
            first = np.concatenate([[0], np.flatnonzero(
                np.diff(gpar)) + 1])
            starts -= np.repeat(starts[first],
                                np.diff(np.concatenate(
                                    [first, [len(gpar)]])))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "i": pa.array(starts, pa.int64()),
            "g1": pa.array(g1, pa.int64()),
            "g2": pa.array(g2, pa.int64())})

    inst = ds.map_batches(gram_inst, batch_format="pyarrow")

    # dup keys: (g1, g2) pairs seen in >= 2 distinct docs. Instances of
    # one doc may repeat a gram, so count distinct docs via per-batch
    # (doc is whole in a batch) first-occurrence rows — reuse the
    # dup_span combiner property: one (g1,g2,doc) row per doc per gram.
    def first_per_doc(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"g1": t["g1"].to_numpy(zero_copy_only=False),
                           "g2": t["g2"].to_numpy(zero_copy_only=False),
                           "doc_id": t["doc_id"].to_numpy(
                               zero_copy_only=False)})
        u = df.drop_duplicates()
        return pa.table({"g1": pa.array(u["g1"].to_numpy(np.int64)),
                         "g2": pa.array(u["g2"].to_numpy(np.int64)),
                         "doc_id": pa.array(
                             u["doc_id"].to_numpy(np.int64))})

    dup_keys = (inst.map_batches(first_per_doc, batch_format="pyarrow")
                .groupby(["g1", "g2"])
                .aggregate(Count(alias_name="n_docs"))
                .map_batches(
                    lambda t: t.filter(
                        pc.greater_equal(t["n_docs"], 2)
                    ).select(["g1", "g2"]),
                    batch_format="pyarrow")).materialize()
    n_dup = dup_keys.count()

    def _clean_batch(t: pa.Table, dup_rec) -> pa.Table:
        """Vectorized cleaner: mark covered token positions, rebuild
        kept tokens per doc via list offsets + binary_join."""
        texts = t["text"].combine_chunks()
        toks = pc.split_pattern(texts, " ")
        nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        grams, gpar, _ = F_text.kgram_rows(texts, 5)
        garr = np.asarray(grams, dtype=object)
        q = np.empty(len(garr), dtype=dup_rec.dtype)
        q["a"] = pdu.hash_array(garr, categorize=False).view(np.int64)
        q["b"] = pdu.hash_array(garr, hash_key="rendlerdupspan2!",
                                categorize=False).view(np.int64)
        if len(dup_rec):
            idx_c = np.minimum(np.searchsorted(dup_rec, q),
                               len(dup_rec) - 1)
            hit = dup_rec[idx_c] == q
        else:
            hit = np.zeros(len(q), bool)
        # within-doc start positions (occurrence index)
        starts = np.arange(len(gpar), dtype=np.int64)
        if len(gpar):
            first = np.concatenate([[0], np.flatnonzero(
                np.diff(gpar)) + 1])
            starts -= np.repeat(starts[first],
                                np.diff(np.concatenate(
                                    [first, [len(gpar)]])))
        doc_off = np.concatenate([[0], np.cumsum(nt)]).astype(np.int64)
        hd, hs = gpar[hit], starts[hit]
        n_flat = int(doc_off[-1])
        covered = np.zeros(n_flat, bool)
        for k in range(5):
            p = doc_off[hd] + hs + k
            ok = hs + k < nt[hd]
            covered[p[ok]] = True
        flat = pc.list_flatten(toks)
        keep = ~covered
        kept_per_doc = np.add.reduceat(
            keep, doc_off[:-1]) if n_flat else np.zeros(len(nt), np.int64)
        kept_per_doc = np.where(nt == 0, 0, kept_per_doc).astype(np.int64)
        removed = nt - kept_per_doc
        offs = np.concatenate([[0], np.cumsum(kept_per_doc)]
                              ).astype(np.int32)
        kept_lists = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), flat.filter(pa.array(keep)))
        cleaned = pc.binary_join(kept_lists, " ").to_pylist()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        aff = removed > 0
        md5s = [hashlib.md5((cleaned[i] or "").encode()).hexdigest()
                for i in np.flatnonzero(aff)]
        return pa.table({
            "doc_id": pa.array(ids[aff], pa.int64()),
            "n_removed_tokens": pa.array(removed[aff], pa.int64()),
            "cleaned_md5": pa.array(md5s, pa.string())})

    if n_dup <= broadcast_max:
        rec = np.empty(n_dup, dtype=[("a", "<i8"), ("b", "<i8")])
        pos = 0
        for b in dup_keys.iter_batches(batch_size=None,
                                       batch_format="pyarrow"):
            m = b.num_rows
            rec["a"][pos:pos + m] = b["g1"].to_numpy(zero_copy_only=False)
            rec["b"][pos:pos + m] = b["g2"].to_numpy(zero_copy_only=False)
            pos += m
        rec.sort()
        rec_ref = ray.put(rec)
        return ds.map_batches(
            lambda t: _clean_batch(t, ray.get(rec_ref)),
            batch_format="pyarrow")

    # join fallback: instances ⋈ dup keys → per-doc covered starts →
    # ⋈ documents → same cleaner semantics per joined row
    cov = inst.join(dup_keys, join_type="inner",
                    num_partitions=num_partitions, on=("g1", "g2"))

    def fold_starts(g: pd.DataFrame) -> pd.DataFrame:
        # comma-joined string: joins can't carry list/tensor payloads
        s = ",".join(map(str, np.sort(g["i"].to_numpy(np.int64))))
        return pd.DataFrame({
            "doc_id": [np.int64(g["doc_id"].iloc[0])],
            "starts": [s]})

    starts_ds = cov.groupby("doc_id").map_groups(fold_starts,
                                                 batch_format="pandas")
    joined = starts_ds.join(ds, join_type="inner",
                            num_partitions=num_partitions,
                            on=("doc_id",))

    def clean_joined(t: pa.Table) -> pa.Table:
        texts = t["text"].combine_chunks()
        toks = pc.split_pattern(texts, " ")
        nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_rm, out_md5 = [], [], []
        for i in range(t.num_rows):
            tk = toks[i].as_py()
            covered = np.zeros(int(nt[i]), bool)
            for s in map(int, t["starts"][i].as_py().split(",")):
                covered[s:s + 5] = True
            kept = [w for w, c in zip(tk, covered) if not c]
            rm = int(covered.sum())
            if rm == 0:
                continue
            out_id.append(int(ids[i]))
            out_rm.append(rm)
            out_md5.append(hashlib.md5(
                " ".join(kept).encode()).hexdigest())
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "n_removed_tokens": pa.array(out_rm, pa.int64()),
            "cleaned_md5": pa.array(out_md5, pa.string())})

    return joined.map_batches(clean_joined, batch_format="pyarrow")


REMOVE_DUP_SPANS_SQL = """
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks,
                  len(string_split(text, ' ')) AS n
           FROM documents),
g AS (SELECT doc_id, n, toks,
             unnest(generate_series(1, n - 4)) AS i
      FROM t WHERE n >= 5),
gr AS (SELECT doc_id, n, i,
              toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                || toks[i+3] || ' ' || toks[i+4] AS gram FROM g
       UNION ALL
       SELECT doc_id, n, 1 AS i, text AS gram FROM t WHERE n < 5),
d AS (SELECT gram FROM gr GROUP BY gram
      HAVING count(DISTINCT doc_id) >= 2),
cov AS (SELECT DISTINCT gr.doc_id, gr.i + ks.k AS pos
        FROM gr JOIN d USING (gram),
             (SELECT unnest(generate_series(0, 4)) AS k) ks
        WHERE gr.i + ks.k <= gr.n),
ap AS (SELECT doc_id, toks, unnest(generate_series(1, n)) AS pos
       FROM t WHERE n > 0),
kept AS (SELECT a.doc_id, a.pos, a.toks[a.pos] AS token
         FROM ap a LEFT JOIN cov c
           ON a.doc_id = c.doc_id AND a.pos = c.pos
         WHERE c.pos IS NULL),
rm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed_tokens
       FROM cov GROUP BY doc_id)
SELECT rm.doc_id, rm.n_removed_tokens,
       coalesce(md5(string_agg(k.token, ' ' ORDER BY k.pos)), md5(''))
         AS cleaned_md5
FROM rm LEFT JOIN kept k ON rm.doc_id = k.doc_id
GROUP BY rm.doc_id, rm.n_removed_tokens
"""


_PARA_SEG_TOKENS = 20


def _doc_segments(texts: pa.Array, seg_tokens: int = _PARA_SEG_TOKENS):
    """Tile each doc's tokens into consecutive ``seg_tokens``-token
    SEGMENTS (the paragraph unit for corpora without newlines; the last
    tile may be short). Fully vectorized: one split, numpy offset
    arithmetic, one ListArray rebuild, one binary_join. Returns
    (seg_strings object-ndarray, seg_doc doc-index per segment,
    seg_cum per-doc first-segment index, toks ListArray, nt per-doc
    token counts)."""
    toks = pc.split_pattern(texts, " ")
    nt = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    doc_off = np.concatenate([[0], np.cumsum(nt)])
    nseg = -(-nt // seg_tokens)
    seg_cum = np.concatenate([[0], np.cumsum(nseg)])
    total = int(seg_cum[-1])
    seg_doc = np.repeat(np.arange(len(nt)), nseg)
    seg_idx = np.arange(total, dtype=np.int64) - seg_cum[seg_doc]
    starts = doc_off[seg_doc] + seg_idx * seg_tokens
    offs = np.append(starts, doc_off[-1]).astype(np.int32)
    seg_lists = pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()), pc.list_flatten(toks))
    segs = pc.binary_join(seg_lists, " ").to_numpy(zero_copy_only=False)
    return segs, seg_doc, seg_cum, toks, nt


def paragraph_dedup_docs(sf_dir: str, broadcast_max: int = 1_000_000,
                         num_partitions: int = 8):
    """Paragraph-level dedup (the RefinedWeb / FineWeb line-dedup
    shape, distinct from Lee ACL'22 span REMOVAL): a document is tiled
    into disjoint 20-token segments (the corpus has no newlines — the
    tile is the paragraph unit) and every segment whose exact text
    occurs in ≥ 2 distinct documents is dropped; the survivors re-join
    in order. Output per AFFECTED doc: (doc_id, n_removed_segments,
    cleaned_md5) — md5 of the cleaned text (md5('') when nothing
    survives) so the DuckDB oracle pins the cleaned BYTES.

    Distributed shape mirrors ``remove_dup_spans_docs``: segment keys
    are 128-bit hashes (two independently-keyed SipHash64 halves —
    strings never shuffle); the dup-segment set is the Zipf head, tiny
    next to the corpus, so up to ``broadcast_max`` keys it broadcasts
    once and ONE map pass re-segments locally and rebuilds kept tokens
    with Arrow list offsets + ``binary_join``. Past the cap the same
    semantics run as int-keyed joins (covered segment indexes fold to a
    bounded per-doc list that joins back to the text)."""
    import hashlib

    import pandas.util as pdu

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def seg_keys(t: pa.Table) -> pa.Table:
        segs, seg_doc, _, _, _ = _doc_segments(t["text"].combine_chunks())
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[seg_doc]
        h1 = pdu.hash_array(segs, categorize=False).view(np.int64)
        h2 = pdu.hash_array(segs, hash_key="rendlerparadup2!",
                            categorize=False).view(np.int64)
        # docs are whole within a batch: per-batch distinct
        # (h1, h2, doc) rows are globally distinct
        df = pd.DataFrame({"g1": h1, "g2": h2, "doc_id": ids}
                          ).drop_duplicates()
        return pa.table({"g1": pa.array(df["g1"].to_numpy(np.int64)),
                         "g2": pa.array(df["g2"].to_numpy(np.int64)),
                         "doc_id": pa.array(
                             df["doc_id"].to_numpy(np.int64))})

    keys = ds.map_batches(seg_keys, batch_format="pyarrow")
    dup_keys = (keys.groupby(["g1", "g2"])
                .aggregate(Count(alias_name="n_docs"))
                .map_batches(
                    lambda t: t.filter(
                        pc.greater_equal(t["n_docs"], 2)
                    ).select(["g1", "g2"]),
                    batch_format="pyarrow")).materialize()
    n_dup = dup_keys.count()

    def _clean(t: pa.Table, covered_seg: np.ndarray, seg_doc, seg_cum,
               toks, nt) -> pa.Table:
        doc_off = np.concatenate([[0], np.cumsum(nt)]).astype(np.int64)
        n_flat = int(doc_off[-1])
        tok_doc = np.repeat(np.arange(len(nt)), nt)
        within = np.arange(n_flat, dtype=np.int64) - doc_off[tok_doc]
        tok_seg = seg_cum[tok_doc] + within // _PARA_SEG_TOKENS
        keep = ~covered_seg[tok_seg]
        kept_per_doc = (np.add.reduceat(keep, doc_off[:-1])
                        if n_flat else np.zeros(len(nt), np.int64))
        kept_per_doc = np.where(nt == 0, 0, kept_per_doc).astype(np.int64)
        rm_seg = (np.add.reduceat(covered_seg, seg_cum[:-1])
                  if len(covered_seg) else np.zeros(len(nt), np.int64))
        rm_seg = np.where(np.diff(seg_cum) == 0, 0, rm_seg).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(kept_per_doc)]
                              ).astype(np.int32)
        kept_lists = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()),
            pc.list_flatten(toks).filter(pa.array(keep)))
        cleaned = pc.binary_join(kept_lists, " ").to_pylist()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        aff = rm_seg > 0
        md5s = [hashlib.md5((cleaned[i] or "").encode()).hexdigest()
                for i in np.flatnonzero(aff)]
        return pa.table({
            "doc_id": pa.array(ids[aff], pa.int64()),
            "n_removed_segments": pa.array(rm_seg[aff], pa.int64()),
            "cleaned_md5": pa.array(md5s, pa.string())})

    if n_dup <= broadcast_max:
        rec = np.empty(n_dup, dtype=[("a", "<i8"), ("b", "<i8")])
        pos = 0
        for b in dup_keys.iter_batches(batch_size=None,
                                       batch_format="pyarrow"):
            m = b.num_rows
            rec["a"][pos:pos + m] = b["g1"].to_numpy(zero_copy_only=False)
            rec["b"][pos:pos + m] = b["g2"].to_numpy(zero_copy_only=False)
            pos += m
        rec.sort()
        rec_ref = ray.put(rec)

        def clean_bcast(t: pa.Table) -> pa.Table:
            dup_rec = ray.get(rec_ref)
            segs, seg_doc, seg_cum, toks, nt = _doc_segments(
                t["text"].combine_chunks())
            q = np.empty(len(segs), dtype=dup_rec.dtype)
            q["a"] = pdu.hash_array(segs, categorize=False).view(np.int64)
            q["b"] = pdu.hash_array(segs, hash_key="rendlerparadup2!",
                                    categorize=False).view(np.int64)
            if len(dup_rec):
                idx = np.minimum(np.searchsorted(dup_rec, q),
                                 len(dup_rec) - 1)
                covered = dup_rec[idx] == q
            else:
                covered = np.zeros(len(q), bool)
            return _clean(t, covered, seg_doc, seg_cum, toks, nt)

        return ds.map_batches(clean_bcast, batch_format="pyarrow")

    # join fallback: per-doc covered segment indexes fold to a bounded
    # comma-joined list that joins back to the text — identical
    # semantics, equality-pytested against the broadcast form
    def seg_inst(t: pa.Table) -> pa.Table:
        segs, seg_doc, seg_cum, _, _ = _doc_segments(
            t["text"].combine_chunks())
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[seg_doc]
        h1 = pdu.hash_array(segs, categorize=False).view(np.int64)
        h2 = pdu.hash_array(segs, hash_key="rendlerparadup2!",
                            categorize=False).view(np.int64)
        segi = (np.arange(len(seg_doc), dtype=np.int64)
                - seg_cum[seg_doc])
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "i": pa.array(segi, pa.int64()),
                         "g1": pa.array(h1, pa.int64()),
                         "g2": pa.array(h2, pa.int64())})

    inst = ds.map_batches(seg_inst, batch_format="pyarrow")
    # sparse-key guard: more partitions than distinct dup keys leaves
    # empty schema-less partitions that crash the join aggregator
    np_eff = max(1, min(num_partitions, n_dup))
    cov = inst.join(dup_keys, join_type="inner",
                    num_partitions=np_eff, on=("g1", "g2"))

    def fold_segs(g: pd.DataFrame) -> pd.DataFrame:
        s = ",".join(map(str, np.sort(np.unique(
            g["i"].to_numpy(np.int64)))))
        return pd.DataFrame({
            "doc_id": [np.int64(g["doc_id"].iloc[0])],
            "segs": [s]})

    segs_ds = cov.groupby("doc_id").map_groups(fold_segs,
                                               batch_format="pandas")
    joined = segs_ds.join(ds, join_type="inner",
                          num_partitions=np_eff,
                          on=("doc_id",))

    def clean_joined(t: pa.Table) -> pa.Table:
        segs, seg_doc, seg_cum, toks, nt = _doc_segments(
            t["text"].combine_chunks())
        covered = np.zeros(len(segs), bool)
        for i in range(t.num_rows):
            for s in map(int, t["segs"][i].as_py().split(",")):
                covered[seg_cum[i] + s] = True
        return _clean(t, covered, seg_doc, seg_cum, toks, nt)

    return joined.map_batches(clean_joined, batch_format="pyarrow")


PARAGRAPH_DEDUP_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                  len(string_split(text, ' ')) AS n
           FROM documents),
tok AS (SELECT doc_id, pos, toks[pos] AS token, (pos - 1) // 20 AS seg
        FROM (SELECT doc_id, toks,
                     unnest(generate_series(1, n)) AS pos
              FROM t WHERE n > 0)),
segs AS (SELECT doc_id, seg,
                string_agg(token, ' ' ORDER BY pos) AS segtext
         FROM tok GROUP BY doc_id, seg),
d AS (SELECT segtext FROM segs GROUP BY segtext
      HAVING count(DISTINCT doc_id) >= 2),
marked AS (SELECT s.doc_id, s.seg, s.segtext,
                  (d.segtext IS NOT NULL) AS dup
           FROM segs s LEFT JOIN d USING (segtext))
SELECT doc_id,
       CAST(count(*) FILTER (WHERE dup) AS BIGINT)
         AS n_removed_segments,
       coalesce(md5(string_agg(segtext, ' ' ORDER BY seg)
                    FILTER (WHERE NOT dup)), md5('')) AS cleaned_md5
FROM marked GROUP BY doc_id
HAVING count(*) FILTER (WHERE dup) > 0
"""


def epoch_shuffle_docs(sf_dir: str):
    """Deterministic seeded EPOCH SHUFFLE — the reproducible global
    permutation a training run needs so every worker/restart sees the
    same example order (``random_shuffle`` is neither seeded across
    runs nor oracle-able). The permutation key is a 31-bit
    multiplicative xorshift mix of doc_id in plain int64 arithmetic
    (every intermediate < 2^63, so DuckDB BIGINT reproduces it
    verbatim); the shuffle itself is the honest at-scale shape: one
    stateless key pass, ONE global range-partitioned sort on
    (shuffle_key, doc_id), and a distributed zip-with-index
    (``with_row_seq`` — per-block counts from metadata only) for the
    dense ``epoch_rank``. The mix is not injective after the xor folds,
    so doc_id tie-breaks in both engines."""
    from rendler_ray.util import with_row_seq

    ds = _read(sf_dir, "documents", ["doc_id"])

    def key(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # d·2654435761 must stay < 2^63 (numpy would wrap silently
        # where DuckDB BIGINT errors — the mismatch would be silent)
        assert not len(d) or int(d.max()) < (1 << 31)
        k1 = (d * 2654435761) % 2147483648
        k2 = (np.bitwise_xor(k1, k1 // 4096) * 2654435761) % 2147483648
        k3 = np.bitwise_xor(k2, k2 // 4096)
        return pa.table({"doc_id": t["doc_id"],
                         "shuffle_key": pa.array(k3, pa.int64())})

    keyed = ds.map_batches(key, batch_format="pyarrow")
    return with_row_seq(keyed, ["shuffle_key", "doc_id"], start=1,
                        column="epoch_rank")


EPOCH_SHUFFLE_SQL = """
WITH k1 AS (SELECT doc_id,
                   (doc_id * 2654435761) % 2147483648 AS k1
            FROM documents),
k2 AS (SELECT doc_id,
              (xor(k1, k1 // 4096) * 2654435761) % 2147483648 AS k2
       FROM k1),
k3 AS (SELECT doc_id, xor(k2, k2 // 4096) AS shuffle_key FROM k2)
SELECT doc_id, shuffle_key,
       row_number() OVER (ORDER BY shuffle_key, doc_id) AS epoch_rank
FROM k3
"""


DUP_SPAN_SQL = """
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
           FROM documents),
g AS (SELECT doc_id, toks,
             unnest(generate_series(1, len(toks) - 4)) AS i
      FROM t WHERE len(toks) >= 5),
gr AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
               || ' ' || toks[i+3] || ' ' || toks[i+4] AS gram FROM g
       UNION ALL
       SELECT doc_id, text AS gram FROM t WHERE len(toks) < 5),
d AS (SELECT gram FROM gr GROUP BY gram
      HAVING count(DISTINCT doc_id) >= 2)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams
FROM gr WHERE gram IN (SELECT gram FROM d)
GROUP BY doc_id
"""


# per-worker memo: token -> integer weight (the model table lookup).
# Insertion-capped like _DSIR_BCACHE: distinct tokens grow with the
# stream at corpus scale, so past the cap tokens still hash correctly —
# they just stop being memoized (bounded worker memory).
_CLF_WCACHE: dict[str, int] = {}
_CLF_WCACHE_CAP = 1 << 21


def _clf_weights(tokens: np.ndarray) -> np.ndarray:
    """Deterministic hashed-feature weights: md5(token) → bucket →
    integer weight (bucket % 1001) − 500. Memoized per worker process
    (unique tokens only ever hash once per worker, up to the cap)."""
    import hashlib

    out = np.empty(len(tokens), np.int64)
    for i, tok in enumerate(tokens):
        w = _CLF_WCACHE.get(tok)
        if w is None:
            h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            w = h % 1001 - 500
            if len(_CLF_WCACHE) < _CLF_WCACHE_CAP:
                _CLF_WCACHE[tok] = w
        out[i] = w
    return out


def classifier_score_docs(sf_dir: str):
    """Model-scoring inference over text — the fastText-style linear
    quality classifier every modern pretraining pipeline runs (CCNet /
    DCLM shape, public): hashed bag-of-words features × a weight
    vector, ONE stateless vectorized map pass, no shuffle at any corpus
    size. The stub derives each bucket weight from md5 so the DuckDB
    oracle is EXACT — a real model swaps ``_clf_weights`` for a learned
    table broadcast once via ``ray.put``; the pipeline shape is
    identical. Hashing is memoized per UNIQUE token per worker; per-doc
    sums are one ``bincount``. ``keep_flag`` = score > 0 is the filter
    decision a quality gate would act on."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(flat.astype(object), return_inverse=True)
        w = _clf_weights(uniq)[inv]
        s = np.bincount(par, weights=w, minlength=t.num_rows)
        s = np.rint(s).astype(np.int64)  # float64 exact below 2^53
        return pa.table({
            "doc_id": t["doc_id"],
            "clf_score": pa.array(s, pa.int64()),
            "keep_flag": pa.array((s > 0).astype(np.int64), pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


CLASSIFIER_SCORE_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
s AS (SELECT doc_id,
             CAST(sum((CAST('0x' || substr(md5(token), 1, 15) AS BIGINT)
                       % 1001) - 500) AS BIGINT) AS clf_score
      FROM tok GROUP BY doc_id)
SELECT doc_id, clf_score,
       CAST(CASE WHEN clf_score > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS keep_flag
FROM s
"""


def dense_rank_orders(sf_dir: str):
    """DENSE_RANK() — equal values share a rank and the next DISTINCT
    value takes rank+1, no gaps (completes the RANK / NTILE window
    family): per-priority dense rank of order value, descending. rank =
    1 + #distinct-strictly-greater — one ``unique`` + one
    ``searchsorted`` per group over cents keys, so both sides rank
    identical integers."""
    ds = _fixed_point(
        _read(sf_dir, "orders",
              ["o_orderkey", "o_orderpriority", "o_totalprice"]),
        {"o_totalprice": 2}).map_batches(
        lambda t: t.rename_columns(
            ["o_orderkey", "o_orderpriority", "cents"]),
        batch_format="pyarrow")

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        v = g["cents"].to_numpy(np.int64)
        vs = np.unique(v)  # sorted ascending, distinct
        rnk = 1 + (len(vs) - np.searchsorted(vs, v, side="right"))
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
            "o_orderpriority": g["o_orderpriority"].to_numpy(),
            "cents": v, "drank": rnk.astype(np.int64)})

    return ds.groupby("o_orderpriority").map_groups(
        rank, batch_format="pandas")


DENSE_RANK_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       CAST(dense_rank() OVER (PARTITION BY o_orderpriority
            ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC)
            AS BIGINT) AS drank
FROM orders
"""


def first_last_order_per_customer(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE over the full partition (per customer,
    ordered by (order date, order key)) — expressed as a pure
    COMMUTATIVE aggregate instead of a window sort: pack the ordering
    key into one int64 composite (epoch_days << 44 | orderkey), Min/Max
    fold it through Ray's two-level partial aggregation, unpack the
    payload with ``%``. No per-group sort, no map_groups — the
    arg-min/arg-max-as-packed-scalar trick (same as pack.py's boundary
    tokens). Bounds: orderkey < 2^44 holds to TPC-H sf ≈ 2.9M (keys are
    6M·sf, sparse ×4) and epoch_days < 2^19 covers year 3000+, so
    days·2^44 + key < 2^63 with headroom — the earlier 10^8 multiplier
    silently corrupted keys ≥ 10^8 (sf ≳ 17)."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey",
                                  "o_orderdate"])

    def composite(t: pa.Table) -> pa.Table:
        us = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(
            zero_copy_only=False)
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        assert keys.max(initial=0) < (1 << 44), "orderkey overflows pack"
        comp = ((us // 86_400_000_000) << 44) | keys
        return pa.table({"o_custkey": t["o_custkey"],
                         "comp": pa.array(comp, pa.int64())})

    agg = (ds.map_batches(composite, batch_format="pyarrow")
           .groupby("o_custkey")
           .aggregate(Min("comp", alias_name="mn"),
                      Max("comp", alias_name="mx"),
                      Count(alias_name="n_orders")))

    def finish(t: pa.Table) -> pa.Table:
        mn = t["mn"].to_numpy(zero_copy_only=False)
        mx = t["mx"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_custkey": t["o_custkey"],
            "first_key": pa.array(mn & ((1 << 44) - 1), pa.int64()),
            "last_key": pa.array(mx & ((1 << 44) - 1), pa.int64()),
            "n_orders": t["n_orders"]})

    return agg.map_batches(finish, batch_format="pyarrow")


FIRST_LAST_SQL = """
WITH c AS (SELECT o_custkey,
                  (CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400)
                    * 17592186044416 + o_orderkey AS comp
           FROM orders)
SELECT o_custkey,
       CAST(min(comp) % 17592186044416 AS BIGINT) AS first_key,
       CAST(max(comp) % 17592186044416 AS BIGINT) AS last_key,
       CAST(count(*) AS BIGINT) AS n_orders
FROM c GROUP BY o_custkey
"""


def semdedup_drop_docs(sf_dir: str, target_cluster: int = 2048,
                       max_cluster: int = 4096):
    """Semantic dedup (SemDeDup, Abbas et al. 2023, public): k-means
    clusters the embedding space (broadcast-centroid distributed fit),
    then near-duplicate detection runs ONLY within each cluster —
    ``groupby(cluster)`` co-locates candidates so the cosine check is
    bounded by cluster size, never corpus size. Two scale bounds
    (SemDeDup's own design — n_clusters grows with the corpus so
    clusters stay bounded):

    - ``n_clusters = clamp(n / target_cluster, 8, 4096)`` scales with
      the corpus count (one parquet-metadata scalar), so the expected
      in-cluster O(b²) cosine matrix stays ~target_cluster² long past
      test scale (the 4096 ceiling keeps the driver-side sample
      k-means init tractable; past n_clusters × max_cluster ≈ 16M
      vectors the hard cap below carries the bound alone);
    - a HARD per-cluster cap: clusters over ``max_cluster`` rows are
      hash-of-id sub-bucket salted BEFORE the groupby
      (``ann.salt_hot_int_buckets`` — the simhash-banding skew guard),
      so no single task can ever materialize an unbounded m @ m.T.
      Near-dup pairs crossing sub-buckets of an oversized cluster are
      the deliberate Manku-style trade; when salting fires, the output
      ``cluster`` ids are the salted keys (cluster << 20 | sub).

    Within a cluster, pairs with cosine >= 0.95 union into groups and
    the min vec_id survives. Output: (vec_id, cluster, keep_flag) for
    every vector. Deterministic (hash-sampled k-means init); rows-only
    (iterative k-means is not SQL-expressible); planted-duplicate +
    adversarial one-giant-cluster recovery pytested."""
    from rendler_ray.functions.ann import (_normalize, batch_to_matrix,
                                           kmeans_fit,
                                           salt_hot_int_buckets)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    n = ds.count()  # parquet metadata, no scan
    n_clusters = int(min(max(8, n // target_cluster), 4096))
    cent = kmeans_fit(ds, n_clusters=n_clusters, iters=6,
                      sample_rows=max(2048, 2 * n_clusters))
    cref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        m = _normalize(batch_to_matrix(t))
        cl = np.argmax(m @ ray.get(cref).T, axis=1).astype(np.int64)
        return t.append_column("cluster", pa.array(cl, pa.int64()))

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    # hard cap: sub-bucket-salt any cluster over max_cluster rows so
    # the in-cluster cosine matrix is bounded at O(max_cluster²)
    assigned = salt_hot_int_buckets(assigned, key_col="cluster",
                                    id_col="vec_id",
                                    max_bucket=max_cluster)

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        m = _normalize(np.stack(
            g["embedding"].iloc[order].map(np.asarray)).astype(np.float64))
        parent = np.arange(len(ids))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ii, jj = np.nonzero(np.triu(m @ m.T >= 0.95, k=1))
        for a, b in zip(ii.tolist(), jj.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(i) for i in range(len(ids))])
        # ids ascend with index, so root == self ⇔ min vec_id in group
        keep = (roots == np.arange(len(ids))).astype(np.int64)
        return pd.DataFrame({
            "vec_id": ids,
            "cluster": g["cluster"].to_numpy(np.int64)[order],
            "keep_flag": keep})

    return assigned.groupby("cluster").map_groups(
        dedup, batch_format="pandas")


# ===================================== round-3 additions (third batch):
# chunking, blocklist gating, window-family completion, split assignment,
# two-pass histogram, CSV/JSONL source-format ingest.


def chunk_docs_overlap(sf_dir: str):
    """Document chunking with overlap — the RAG / context-window prep op
    (fixed WINDOW-token chunks every STRIDE tokens, trailing partial
    chunk kept): ONE stateless map pass, no shuffle at any corpus size.
    Fully vectorized: the per-chunk token ranges are materialized as a
    single gather-index array (repeat/cumsum trick), rebuilt into a
    list array, and joined with ``pc.binary_join`` — no per-chunk
    Python string work."""
    W, S = 32, 24
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        offs = toks.offsets.to_numpy().astype(np.int64)
        vals = toks.values  # raw (offset-aligned) token storage
        n = np.diff(offs)
        n_chunks = (n + S - 1) // S  # ceil(n / S); texts are non-empty
        doc_idx = np.repeat(np.arange(t.num_rows), n_chunks)
        base = np.cumsum(n_chunks) - n_chunks
        chunk_idx = np.arange(len(doc_idx)) - base[doc_idx]
        lo = chunk_idx * S
        lens = np.minimum(lo + W, n[doc_idx]) - lo
        glo = offs[doc_idx] + lo
        cum = np.cumsum(lens) - lens
        gather = np.repeat(glo - cum, lens) + np.arange(int(lens.sum()))
        taken = pc.take(vals, pa.array(gather, pa.int64()))
        loffs = np.concatenate([[0], np.cumsum(lens)])
        larr = pa.LargeListArray.from_arrays(
            pa.array(loffs, pa.int64()), taken)
        return pa.table({
            "doc_id": pc.take(t["doc_id"],
                              pa.array(doc_idx, pa.int64())),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "n_tokens": pa.array(lens, pa.int64()),
            "chunk_text": pc.binary_join(larr, " ")})

    return ds.map_batches(chunks, batch_format="pyarrow")


CHUNK_DOCS_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                  len(string_split(text, ' ')) AS n
           FROM documents),
s AS (SELECT doc_id, toks, n,
             unnest(generate_series(0, n - 1, 24)) AS lo FROM t)
SELECT doc_id, CAST(lo // 24 AS BIGINT) AS chunk_idx,
       CAST(least(lo + 32, n) - lo AS BIGINT) AS n_tokens,
       array_to_string(array_slice(toks, lo + 1, least(lo + 32, n)), ' ')
         AS chunk_text
FROM s
"""


_BADWORDS = ["slow", "dup", "drop", "null"]


def badwords_filter_docs(sf_dir: str):
    """Blocklist gating (the C4 badwords filter, public): drop any doc
    containing a blocklisted token. The list is tiny and broadcast by
    closure capture; the check is one ``pc.is_in`` over the flat token
    array + one bincount — stateless, shuffle-free, O(corpus) at any
    scale. Output keeps every doc with its bad-token count and the gate
    decision so downstream can audit what a drop would remove."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    bw = pa.array(_BADWORDS, pa.string())

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        bad = pc.is_in(flat, value_set=bw).to_numpy(zero_copy_only=False)
        nb = np.bincount(par, weights=bad,
                         minlength=t.num_rows).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_bad": pa.array(nb, pa.int64()),
            "keep_flag": pa.array((nb == 0).astype(np.int64), pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


BADWORDS_SQL = f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
b AS (SELECT doc_id, count(*) AS nb FROM tok
      WHERE token IN ({', '.join(repr(w) for w in _BADWORDS)})
      GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(b.nb, 0) AS BIGINT) AS n_bad,
       CAST(CASE WHEN coalesce(b.nb, 0) = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS keep_flag
FROM documents d LEFT JOIN b ON d.doc_id = b.doc_id
"""


def percent_rank_orders(sf_dir: str):
    """PERCENT_RANK() and CUME_DIST() per priority (completes the
    RANK / DENSE_RANK / NTILE window family): rank numerators come from
    two ``searchsorted`` calls per group over cents keys, the divisions
    (rank−1)/(n−1) and n_le/n are each a single IEEE op on identical
    integers — so the doubles are bit-identical to DuckDB's and the
    1e-9 fixed-pointing (same half-away rounding both sides) is
    hash-exact."""
    ds = _fixed_point(
        _read(sf_dir, "orders",
              ["o_orderkey", "o_orderpriority", "o_totalprice"]),
        {"o_totalprice": 2}).map_batches(
        lambda t: t.rename_columns(
            ["o_orderkey", "o_orderpriority", "cents"]),
        batch_format="pyarrow")

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        v = g["cents"].to_numpy(np.int64)
        n = len(v)
        sv = np.sort(v)
        lt = np.searchsorted(sv, v, side="left")
        le = np.searchsorted(sv, v, side="right")
        pr = lt / (n - 1) if n > 1 else np.zeros(n)
        cd = le / n
        fx = pc.RoundOptions(ndigits=0, round_mode="half_towards_infinity")
        return pa.table({
            "o_orderkey": pa.array(g["o_orderkey"].to_numpy(np.int64)),
            "o_orderpriority": pa.array(g["o_orderpriority"].to_numpy()),
            "pr9": pc.cast(pc.round(pc.multiply(
                pa.array(pr, pa.float64()), 1e9), options=fx), pa.int64()),
            "cd9": pc.cast(pc.round(pc.multiply(
                pa.array(cd, pa.float64()), 1e9), options=fx), pa.int64()),
        }).to_pandas()

    return ds.groupby("o_orderpriority").map_groups(
        rank, batch_format="pandas")


PERCENT_RANK_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(round(percent_rank() OVER w * 1000000000.0) AS BIGINT) AS pr9,
       CAST(round(cume_dist() OVER w * 1000000000.0) AS BIGINT) AS cd9
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY CAST(round(o_totalprice * 100) AS BIGINT))
"""


def train_val_test_split(sf_dir: str):
    """Deterministic train/val/test assignment (80/10/10) by
    content-independent hash — reproducible across runs, parallelism,
    and re-partitioning (no RNG state, no shuffle), the property a
    training-data split must have so a resumed run never leaks val docs
    into train. Same md5-threshold trick as the samplers."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id"])

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        h = np.array([int(hashlib.md5(f"{i}-split".encode())
                          .hexdigest()[:15], 16) % 100 for i in ids])
        split = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
        return pa.table({"doc_id": t["doc_id"],
                         "split": pa.array(split, pa.string())})

    return ds.map_batches(assign, batch_format="pyarrow")


SPLIT_SQL = """
WITH h AS (SELECT doc_id,
       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-split'), 1, 15)
            AS BIGINT) % 100 AS hv
  FROM documents)
SELECT doc_id,
       CASE WHEN hv < 80 THEN 'train'
            WHEN hv < 90 THEN 'val' ELSE 'test' END AS split
FROM h
"""


def value_histogram_events(sf_dir: str):
    """Equal-width numeric histogram with data-driven bounds — the
    two-pass stats-then-transform pattern: pass 1 is a native min/max
    aggregate (two scalars reach the driver), pass 2 re-streams the
    column bucketing each value against the broadcast bounds, then one
    20-row groupby. Bucket edges use the identical double expression on
    both sides ((hi−lo)/20.0, floor((v−lo)/w), clamp) so the floats are
    bit-equal; sums are per-row cents. Zero-width guard: a constant
    column gives hi == lo → all rows to bucket 0 (mirrors
    embedding_quantize_int8's span guard; the SQL special-cases it the
    same way) — without it floor((v−lo)/0) is NaN and NaN→int64 is
    undefined."""
    ds = _read(sf_dir, "events", ["value"])
    stats = ds.aggregate(Min("value"), Max("value"))
    lo, hi = stats["min(value)"], stats["max(value)"]
    w = (hi - lo) / 20.0

    def bucketize(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        if w == 0.0:
            b = np.zeros(len(v), np.int64)
        else:
            b = np.minimum(np.floor((v - lo) / w).astype(np.int64), 19)
        return pa.table({"bucket": pa.array(b, pa.int64()),
                         "cents": _cents(t["value"])})

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Count(alias_name="n_events"),
                       Sum("cents", alias_name="sum_cents")))


VALUE_HISTOGRAM_SQL = """
WITH s AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
b AS (SELECT CASE WHEN hi = lo THEN 0
             ELSE least(CAST(floor((value - lo) / ((hi - lo) / 20.0))
                        AS BIGINT), 19) END AS bucket,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events, s)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM b GROUP BY bucket
"""


def _ingest_copy(sf_dir: str, fmt: str) -> str:
    """Cache a CSV / JSONL copy of the events table (distributed
    ``write_csv`` / ``write_json``, floats pre-converted to cents so no
    text-float roundtrip can drift), keyed on the source parquet's
    (mtime, size) so regenerated testdata invalidates the copy."""
    import shutil

    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    tag = (f"{os.path.basename(os.path.normpath(sf_dir))}"
           f"_{int(st.st_mtime)}_{st.st_size}")
    out = f"/tmp/rendler_ray_ingest/{tag}/events_{fmt}"
    if os.path.exists(out + ".done"):
        return out

    def conv(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t["event_id"],
                         "ts_us": pc.cast(t["ts"], pa.int64()),
                         "user_id": t["user_id"],
                         "event_type": t["event_type"],
                         "cents": _cents(t["value"])})

    ds = rd.read_parquet(src, columns=["event_id", "ts", "user_id",
                                       "event_type", "value"]
                         ).map_batches(conv, batch_format="pyarrow")
    shutil.rmtree(out, ignore_errors=True)
    (ds.write_csv if fmt == "csv" else ds.write_json)(out)
    open(out + ".done", "w").close()
    return out


def _ingest_agg(ds):
    """Shared post-ingest aggregate: per event_type count / cents sum /
    first-last timestamp — proves the re-read columns survive the
    format roundtrip bit-exactly."""
    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "cents": pc.cast(t["cents"], pa.int64()),
                         "ts_us": pc.cast(t["ts_us"], pa.int64())})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Count(alias_name="n_events"),
                       Sum("cents", alias_name="sum_cents"),
                       Min("ts_us", alias_name="first_us"),
                       Max("ts_us", alias_name="last_us")))


def events_csv_ingest(sf_dir: str):
    """CSV source-format coverage: distributed ``write_csv`` of the
    events table (cached) → ``ray.data.read_csv`` → grouped aggregate,
    oracled against the original parquet — the ingest path a user
    switching from CSV landing files runs."""
    return _ingest_agg(rd.read_csv(_ingest_copy(sf_dir, "csv")))


def events_jsonl_ingest(sf_dir: str):
    """JSONL source-format coverage: distributed ``write_json`` (one
    JSON object per line) → ``ray.data.read_json`` → the same grouped
    aggregate, oracled against the original parquet."""
    return _ingest_agg(rd.read_json(_ingest_copy(sf_dir, "json")))


EVENTS_INGEST_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
       CAST(max(epoch_us(ts)) AS BIGINT) AS last_us
FROM events GROUP BY event_type
"""


# per-worker memo: bigram -> hash bucket (the DSIR feature hasher).
# Capped: at corpus scale the distinct-bigram space is unbounded, so the
# memo stops inserting past the cap rather than growing with the stream.
_DSIR_BCACHE: dict[str, int] = {}
_DSIR_BCACHE_CAP = 1 << 21


def _dsir_buckets(grams: np.ndarray, mod: int = 4096) -> np.ndarray:
    """md5(gram) → bucket, memoized per worker process (callers pass
    UNIQUE grams so each distinct bigram hashes once per worker)."""
    import hashlib

    out = np.empty(len(grams), np.int64)
    for i, g in enumerate(grams):
        b = _DSIR_BCACHE.get(g)
        if b is None:
            b = int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % mod
            if len(_DSIR_BCACHE) < _DSIR_BCACHE_CAP:
                _DSIR_BCACHE[g] = b
        out[i] = b
    return out


def dsir_importance_docs(sf_dir: str):
    """DSIR-style importance scoring (Xie et al. NeurIPS'23 "Data
    Selection for Language Models via Importance Resampling", public):
    hashed word-bigram counts for the TARGET distribution (lang='en'
    docs) vs the SOURCE (all docs) → a bounded bucket table of
    importance ratios, broadcast once via ``ray.put`` → per-doc score
    in one stateless pass. Integer-exact variant: per-bucket ratios are
    fixed-point (c_t+1)·10^6 // (c_s+1) and the doc score sums them, so
    the DuckDB oracle matches bit-for-bit (true log-ratio weights are a
    one-line swap at deployment; the pipeline shape — distributed
    count, ≤4096-row driver table, broadcast lookup — is identical).
    Pass 1: explode → per-batch bincount partials → groupby(bucket)
    sum; pass 2: score. Short-doc rule matches kgram_rows (docs with
    < 2 tokens contribute their whole text as one gram)."""
    B = 4096
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def partials(t: pa.Table) -> pa.Table:
        grams, gpar, _ = F_text.kgram_rows(t["text"].combine_chunks(), 2)
        uniq, inv = np.unique(grams, return_inverse=True)
        b = _dsir_buckets(uniq)[inv]
        is_t = pc.equal(t["lang"], "en").to_numpy(
            zero_copy_only=False)[gpar]
        ct = np.bincount(b[is_t], minlength=B)
        cs = np.bincount(b, minlength=B)
        nz = np.flatnonzero(cs)
        return pa.table({"b": pa.array(nz, pa.int64()),
                         "ct": pa.array(ct[nz], pa.int64()),
                         "cs": pa.array(cs[nz], pa.int64())})

    agg = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("b").aggregate(Sum("ct", alias_name="ct"),
                                   Sum("cs", alias_name="cs")))
    ratio = np.zeros(B, np.int64)
    for r in agg.take_all():  # bounded: <= 4096 rows
        ratio[r["b"]] = ((r["ct"] + 1) * 1_000_000) // (r["cs"] + 1)
    rref = ray.put(ratio)

    def score(t: pa.Table) -> pa.Table:
        rt = ray.get(rref)
        grams, gpar, n = F_text.kgram_rows(t["text"].combine_chunks(), 2)
        uniq, inv = np.unique(grams, return_inverse=True)
        b = _dsir_buckets(uniq)[inv]
        # integer weights, per-doc sums < 2^53 ⇒ float64 bincount exact
        s = np.rint(np.bincount(gpar, weights=rt[b].astype(np.float64),
                                minlength=n)).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "dsir_score": pa.array(s, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


DSIR_SQL = """
WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks
           FROM documents),
gr AS (SELECT doc_id, lang, toks[i] || ' ' || toks[i+1] AS gram
       FROM (SELECT doc_id, lang, toks,
                    unnest(generate_series(1, len(toks) - 1)) AS i
             FROM t WHERE len(toks) >= 2)
       UNION ALL
       SELECT doc_id, lang, text AS gram FROM t WHERE len(toks) < 2),
gb AS (SELECT doc_id, lang,
              CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT) % 4096 AS b
       FROM gr),
ct AS (SELECT b, count(*) AS c FROM gb WHERE lang = 'en' GROUP BY b),
cs AS (SELECT b, count(*) AS c FROM gb GROUP BY b),
w AS (SELECT cs.b, ((coalesce(ct.c, 0) + 1) * 1000000) // (cs.c + 1) AS r
      FROM cs LEFT JOIN ct ON cs.b = ct.b)
SELECT gb.doc_id, CAST(sum(w.r) AS BIGINT) AS dsir_score
FROM gb JOIN w ON gb.b = w.b GROUP BY gb.doc_id
"""


def event_transition_matrix(sf_dir: str):
    """Markov transition counts between consecutive event types per
    user (the sequential-pattern / session-flow op): per-user ordered
    LAG pairs, counted globally. ``groupby(user).map_groups`` sorts
    each user's bounded slice and emits its partial pair counts (at
    most |types|² rows per user); one tiny groupby(from, to) sums
    them — the second shuffle carries combiner output, not events."""
    ds = _read(sf_dir, "events",
               ["user_id", "event_id", "ts", "event_type"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        et = g["event_type"].to_numpy()
        if len(et) < 2:
            return pd.DataFrame({"from_type": pd.Series([], dtype=object),
                                 "to_type": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        return (pd.DataFrame({"from_type": et[:-1], "to_type": et[1:]})
                .groupby(["from_type", "to_type"], sort=False).size()
                .reset_index(name="n"))

    part = ds.groupby("user_id").map_groups(pairs, batch_format="pandas")
    return part.groupby(["from_type", "to_type"]).aggregate(
        Sum("n", alias_name="n"))


TRANSITION_SQL = """
WITH o AS (SELECT user_id, event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events)
SELECT prev AS from_type, event_type AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM o WHERE prev IS NOT NULL GROUP BY prev, event_type
"""


def customer_names_by_nation(sf_dir: str):
    """STRING_AGG / LISTAGG with an explicit ORDER BY — grouped ordered
    string aggregation (completes the §2.8 scalar/aggregate function
    surface): per nation the '|'-joined customer names ordered by
    custkey. Per-group pandas finisher; |nations| = 25 groups."""
    ds = _read(sf_dir, "customer", ["c_nationkey", "c_custkey", "c_name"])

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("c_custkey")
        return pd.DataFrame({
            "c_nationkey": [np.int64(g["c_nationkey"].iloc[0])],
            "names": ["|".join(g["c_name"])],
            "n_customers": [np.int64(len(g))]})

    return ds.groupby("c_nationkey").map_groups(agg, batch_format="pandas")


STRING_AGG_SQL = """
SELECT c_nationkey,
       string_agg(c_name, '|' ORDER BY c_custkey) AS names,
       CAST(count(*) AS BIGINT) AS n_customers
FROM customer GROUP BY c_nationkey
"""


def orders_above_customer_avg(sf_dir: str):
    """Correlated-subquery shape (orders strictly above their own
    customer's average order value), lowered exactly as a SQL optimizer
    decorrelates it: per-key aggregate → hash-join back onto the fact
    rows → filter. The comparison is all-integer (cents·n > sum_cents)
    so no float average ever exists on either side."""
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "cents": _cents(t["o_totalprice"])})

    fact = _checkpoint(ds.map_batches(prep, batch_format="pyarrow"),
                       "orders_cents")
    agg = fact.groupby("o_custkey").aggregate(
        Sum("cents", alias_name="s"), Count(alias_name="n"))
    joined = fact.join(agg, join_type="inner", num_partitions=16,
                       on=("o_custkey",))

    def keep(t: pa.Table) -> pa.Table:
        m = pc.greater(pc.multiply(t["cents"], t["n"]), t["s"])
        return t.filter(m).select(["o_orderkey", "o_custkey", "cents"])

    return joined.map_batches(keep, batch_format="pyarrow")


ABOVE_AVG_SQL = """
WITH c AS (SELECT o_custkey,
                  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS s,
                  count(*) AS n
           FROM orders GROUP BY o_custkey)
SELECT o.o_orderkey, o.o_custkey,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
FROM orders o JOIN c USING (o_custkey)
WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) * c.n > c.s
"""


def regex_extract_docs(sf_dir: str):
    """REGEXP_EXTRACT scalar surface: the first ≥6-letter word per doc
    ('' when none) — one vectorized ``pc.extract_regex`` pass. Both
    sides run RE2, so match semantics are identical by construction."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def ex(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["text"], r"\b(?P<m>[a-z]{6,})\b")
        return pa.table({"doc_id": t["doc_id"],
                         "first_long": pc.fill_null(
                             pc.struct_field(m, "m"), "")})

    return ds.map_batches(ex, batch_format="pyarrow")


REGEX_EXTRACT_SQL = r"""
SELECT doc_id, regexp_extract(text, '\b([a-z]{6,})\b', 1) AS first_long
FROM documents
"""


def token_cooccurrence_top100(sf_dir: str):
    """Association mining: document co-occurrence counts over the
    top-100 most-frequent tokens (the PMI / word-association building
    block). Shape at 100 TB: distributed document-frequency groupby →
    distributed sort + limit(100) (the vocab table, tiny) → vocab
    broadcast ONCE via ``ray.put`` → per-batch boolean indicator matrix
    and a single ``Mᵀ·M`` int64 matmul (one partial 100×100 matrix per
    batch — the combiner) → groupby over ≤4,950 (i, j) keys. No
    token-pair explode ever hits the shuffle. Pair order: vocab is
    indexed in lexicographic order, so i < j ⇔ token_a < token_b,
    matching the SQL's ``a.token < b.token`` exactly."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def df_partials(t: pa.Table) -> pa.Table:
        # combiner: each doc lives in exactly one batch, so per-batch
        # (token, n_docs) partials are exact — the df shuffle carries
        # one row per distinct token per batch, not per (doc, token).
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        u = (pd.DataFrame({"doc_id": par, "token": flat}).drop_duplicates()
             .groupby("token", sort=False).size().reset_index(name="df"))
        return pa.table({"token": pa.array(u["token"].tolist(), pa.string()),
                         "df": pa.array(u["df"].to_numpy(np.int64))})

    df = (ds.map_batches(df_partials, batch_format="pyarrow")
          .groupby("token").aggregate(Sum("df", alias_name="df")))
    top = (df.sort(["df", "token"], descending=[True, False]).limit(100)
           .take_all())  # bounded: <= 100 rows
    vocab = sorted(r["token"] for r in top)
    vref = ray.put(pa.array(vocab, pa.string()))
    V = len(vocab)

    def partials(t: pa.Table) -> pa.Table:
        vs = ray.get(vref)
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        idx = pc.index_in(flat, value_set=vs)
        ok = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        iv = idx.to_numpy(zero_copy_only=False)
        m = np.zeros((len(t), V), bool)
        m[par[ok], iv[ok].astype(np.int64)] = True
        c = m.astype(np.int64).T @ m.astype(np.int64)
        iu, ju = np.triu_indices(V, 1)
        g = c[iu, ju]
        nz = g > 0
        return pa.table({"i": pa.array(iu[nz], pa.int64()),
                         "j": pa.array(ju[nz], pa.int64()),
                         "n_docs": pa.array(g[nz], pa.int64())})

    agg = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby(["i", "j"]).aggregate(Sum("n_docs",
                                              alias_name="n_docs")))

    def name_pairs(t: pa.Table) -> pa.Table:
        vs = ray.get(vref)
        return pa.table({"token_a": pc.take(vs, t["i"]),
                         "token_b": pc.take(vs, t["j"]),
                         "n_docs": t["n_docs"]})

    return agg.map_batches(name_pairs, batch_format="pyarrow")


COOCCURRENCE_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
ut AS (SELECT DISTINCT doc_id, token FROM tok),
df AS (SELECT token, count(*) AS df FROM ut GROUP BY token),
top AS (SELECT token FROM df ORDER BY df DESC, token LIMIT 100),
f AS (SELECT ut.doc_id, ut.token FROM ut JOIN top ON ut.token = top.token)
SELECT a.token AS token_a, b.token AS token_b,
       CAST(count(*) AS BIGINT) AS n_docs
FROM f a JOIN f b ON a.doc_id = b.doc_id AND a.token < b.token
GROUP BY 1, 2
"""


def embedding_gram_matrix(sf_dir: str):
    """Distributed Gram / scatter matrix Σ xᵀx over the embedding
    column — the reduction inside PCA, covariance estimation, and
    linear-probe fitting. Each batch contributes ONE 64×64 int64
    partial via a single matmul (B×64 fixed-point matrix, EᵀE);
    partials flatten to upper-triangle (i, j, g) rows and a 2,080-key
    groupby sums them — the classic tree-reduction shape, no driver
    state beyond the final tiny table. Fixed point: values floor() to
    1e-6 units in FLOAT64 (f32→f64 is exact and DuckDB promotes the
    same way), so integer products make the sum order-free and the
    oracle bit-exact. Indices are 1-based to match
    ``generate_subscripts``."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        emb = t["embedding"].combine_chunks()
        d = pc.list_value_length(emb)[0].as_py() if len(emb) else 64
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        e = np.floor(flat.astype(np.float64) * 1_000_000).astype(
            np.int64).reshape(len(t), d)
        g = e.T @ e
        iu, ju = np.triu_indices(d)
        return pa.table({"i": pa.array(iu + 1, pa.int64()),
                         "j": pa.array(ju + 1, pa.int64()),
                         "g": pa.array(g[iu, ju], pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["i", "j"]).aggregate(Sum("g", alias_name="g")))


GRAM_SQL = """
WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                  CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                             * 1000000) AS BIGINT) AS f
           FROM embeddings)
SELECT a.i AS i, b.i AS j, CAST(sum(a.f * b.f) AS BIGINT) AS g
FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY a.i, b.i
"""


def q6_pruned_revenue(sf_dir: str):
    """TPC-H Q6 shape with the predicate pushed INTO the parquet read:
    ``read_parquet(..., filter=<arrow dataset expression>)`` prunes at
    the scan — row groups whose column statistics fail the filter are
    never read, and surviving rows are filtered before they enter the
    object store. At 100 TB this is the difference between scanning the
    fact table and scanning ~2% of it; no downstream ``Dataset.filter``
    pass exists at all. Revenue is fixed-pointed per row on BOTH sides
    (cents × discount-percent, exact integers) before the sum."""
    import datetime

    import pyarrow.dataset as pds

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1997, 1, 1)
    expr = ((pds.field("l_shipdate") >= lo)
            & (pds.field("l_shipdate") < hi)
            & (pds.field("l_discount") >= 0.05)
            & (pds.field("l_discount") <= 0.07)
            & (pds.field("l_quantity") < 24))
    ds = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_extendedprice", "l_discount"],
                         filter=expr)

    def partial(t: pa.Table) -> pa.Table:
        rev = (_cents(t["l_extendedprice"]).to_numpy()
               * _cents(t["l_discount"]).to_numpy())
        return pa.table({"revenue": pa.array([int(rev.sum())], pa.int64()),
                         "n_rows": pa.array([t.num_rows], pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .aggregate(Sum("revenue", alias_name="revenue"),
                      Sum("n_rows", alias_name="n_rows")))
    return pa.table({
        "revenue": pa.array([int(agg.get("revenue") or 0)], pa.int64()),
        "n_rows": pa.array([int(agg.get("n_rows") or 0)], pa.int64())})


Q6_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
           AS revenue,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def _ed_le1_mask(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized exact Levenshtein-distance-≤1 test over two aligned
    string arrays (unit costs, no transposition — the same metric as
    DuckDB ``levenshtein``). Equal lengths: ≤1 mismatching position.
    Lengths off by one: with p = leading equal chars (left-aligned) and
    q = trailing equal chars of short vs longer-shifted-by-one, the
    distance is 1 iff p + q >= len(short). Everything else is > 1."""
    out = np.zeros(len(a), dtype=bool)
    la = np.char.str_len(a.astype(str))
    lb = np.char.str_len(b.astype(str))
    for sa, sb, swap in ((a, b, False), (b, a, True)):
        ls, ll = (la, lb) if not swap else (lb, la)
        for n in np.unique(ls):
            sel = np.flatnonzero((ls == n) & (ll == n + 1))
            if not len(sel):
                continue
            if n == 0:  # empty vs 1-char: one insertion, distance 1
                out[sel] = True
                continue
            s = sa[sel].astype(f"U{n}").view("U1").reshape(len(sel), n)
            l2 = sb[sel].astype(f"U{n + 1}").view("U1").reshape(
                len(sel), n + 1)
            eqp = s == l2[:, :n]
            eqs = s == l2[:, 1:]
            p = np.where(eqp.all(1), n, eqp.argmin(1))
            q = np.where(eqs[:, ::-1].all(1), n, eqs[:, ::-1].argmin(1))
            out[sel[p + q >= n]] = True
    for n in np.unique(la):
        sel = np.flatnonzero((la == n) & (lb == n))
        if not len(sel):
            continue
        if n == 0:  # two empty strings: distance 0
            out[sel] = True
            continue
        s = a[sel].astype(f"U{n}").view("U1").reshape(len(sel), n)
        t = b[sel].astype(f"U{n}").view("U1").reshape(len(sel), n)
        out[sel[(s != t).sum(1) <= 1]] = True
    return out


def fuzzy_name_pairs(sf_dir: str):
    """Fuzzy self-join (edit distance ≤ 1) over customer names — the
    SymSpell / spelling-correction join, an operator Ray Data has no
    native form of. Distributed shape: distinct names → each name emits
    itself plus its single-deletion variants (a pair within distance 1
    ALWAYS shares such a variant — banding is lossless upward) → hash
    JOIN on the variant key co-locates candidates → vectorized exact
    distance-≤1 verify kills the banding's false positives (e.g.
    'ab'/'ba' share variant 'a' but have distance 2) → groupby dedup
    (a true pair shares several variants). Candidate groups are bounded
    by alphabet × name length, never all-pairs; the variant explode is
    |names| × (len+1) rows. Verified against DuckDB ``levenshtein``."""
    ds = _read(sf_dir, "customer", ["c_name"])
    uniq = ds.groupby("c_name").aggregate(Count(alias_name="_n"))

    def variants(t: pa.Table, col_out: str) -> pa.Table:
        s = pd.Series(t["c_name"].to_numpy(zero_copy_only=False),
                      dtype=object)
        outs = [pd.DataFrame({"variant": s, col_out: s})]
        maxlen = int(s.str.len().max()) if len(s) else 0
        for d in range(maxlen):  # maxlen vectorized passes, no row loop
            sub = s[s.str.len() > d]
            outs.append(pd.DataFrame(
                {"variant": sub.str[:d] + sub.str[d + 1:], col_out: sub}))
        v = pd.concat(outs, ignore_index=True)
        return pa.table({"variant": pa.array(v["variant"], pa.string()),
                         col_out: pa.array(v[col_out], pa.string())})

    left = uniq.map_batches(variants, fn_kwargs={"col_out": "name_a"},
                            batch_format="pyarrow")
    right = uniq.map_batches(variants, fn_kwargs={"col_out": "name_b"},
                             batch_format="pyarrow")
    cand = left.join(right, join_type="inner", num_partitions=16,
                     on=("variant",))

    def verify(t: pa.Table) -> pa.Table:
        m = pc.less(t["name_a"], t["name_b"]).to_numpy(
            zero_copy_only=False)
        a = t["name_a"].to_numpy(zero_copy_only=False)[m]
        b = t["name_b"].to_numpy(zero_copy_only=False)[m]
        keep = _ed_le1_mask(a, b)
        return pa.table({"name_a": pa.array(a[keep], pa.string()),
                         "name_b": pa.array(b[keep], pa.string())})

    verified = cand.map_batches(verify, batch_format="pyarrow")
    dedup = verified.groupby(["name_a", "name_b"]).aggregate(
        Count(alias_name="_c"))
    return dedup.map_batches(lambda t: t.select(["name_a", "name_b"]),
                             batch_format="pyarrow")


FUZZY_SQL = """
WITH n AS (SELECT DISTINCT c_name FROM customer)
SELECT a.c_name AS name_a, b.c_name AS name_b
FROM n a JOIN n b ON a.c_name < b.c_name
 AND abs(length(a.c_name) - length(b.c_name)) <= 1
 AND levenshtein(a.c_name, b.c_name) <= 1
"""


def embedding_quantize_int8(sf_dir: str):
    """Per-dimension int8 (0..255) vector quantization — the embedding
    STORAGE op: at 100 TB a float32 vector column quantizes 4× before
    it hits the ANN index. Two passes: (1) per-batch per-dim min/max
    partials (64 rows per batch, one vectorized ``min(0)``/``max(0)``)
    → a 64-row groupby → driver bounds table broadcast via ``ray.put``;
    (2) stateless quantize ``floor((v − mn)·255 / (mx − mn))``. The
    arithmetic is the same IEEE double chain on both sides (f32→f64 is
    exact; numpy broadcasts elementwise left-to-right exactly as the
    SQL expression), so the oracle is bit-exact with no fixed-point
    dance. Output is per-vector integer stats of the quantized codes
    (the full code table is the same map minus the aggregate)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def bounds_partial(t: pa.Table) -> pa.Table:
        emb = t["embedding"].combine_chunks()
        if not len(emb):
            return pa.table({"i": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        d = pc.list_value_length(emb)[0].as_py()
        e = emb.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64).reshape(len(t), d)
        return pa.table({"i": pa.array(np.arange(1, d + 1), pa.int64()),
                         "mn": pa.array(e.min(0), pa.float64()),
                         "mx": pa.array(e.max(0), pa.float64())})

    b = (ds.map_batches(bounds_partial, batch_format="pyarrow")
         .groupby("i").aggregate(Min("mn", alias_name="mn"),
                                 Max("mx", alias_name="mx"))
         .take_all())  # bounded: one row per dimension
    d = len(b)
    mn = np.empty(d, np.float64)
    mx = np.empty(d, np.float64)
    for r in b:
        mn[r["i"] - 1] = r["mn"]
        mx[r["i"] - 1] = r["mx"]
    bref = ray.put((mn, mx))

    def quantize(t: pa.Table) -> pa.Table:
        lo, hi = ray.get(bref)
        emb = t["embedding"].combine_chunks()
        e = emb.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64).reshape(len(t), len(lo))
        span = hi - lo
        q = np.floor((e - lo[None, :]) * 255.0
                     / np.where(span == 0, 1.0, span)[None, :])
        q = np.where(span[None, :] == 0, 0.0, q).astype(np.int64)
        return pa.table({
            "vec_id": t["vec_id"],
            "q_sum": pa.array(q.sum(1), pa.int64()),
            "q_min": pa.array(q.min(1), pa.int64()),
            "q_max": pa.array(q.max(1), pa.int64())})

    return ds.map_batches(quantize, batch_format="pyarrow")


QUANTIZE_SQL = """
WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                  CAST(unnest(embedding) AS DOUBLE) AS v
           FROM embeddings),
b AS (SELECT i, min(v) AS mn, max(v) AS mx FROM e GROUP BY i),
q AS (SELECT e.vec_id,
             CASE WHEN b.mx = b.mn THEN 0
                  ELSE CAST(floor((e.v - b.mn) * 255 / (b.mx - b.mn))
                            AS BIGINT) END AS q
      FROM e JOIN b USING (i))
SELECT vec_id, CAST(sum(q) AS BIGINT) AS q_sum,
       CAST(min(q) AS BIGINT) AS q_min, CAST(max(q) AS BIGINT) AS q_max
FROM q GROUP BY vec_id
"""


def select_docs_token_budget(sf_dir: str, budget_div: int = 4,
                             n_hist: int = 4096,
                             driver_max: int = 5_000_000):
    """Data selection under a global token budget — the "pick the best
    quarter of the corpus" op every pretraining run performs (DCLM /
    FineWeb shape: rank by classifier quality, keep the top-scored docs
    until the token budget is spent). Rank = (clf_score DESC, doc_id
    ASC); budget = total_tokens // ``budget_div``; a doc is kept iff the
    running token total up to and including it stays within budget —
    exactly SQL's ``sum(n_tokens) OVER (ORDER BY clf_score DESC,
    doc_id) <= budget``.

    Distributed shape — an ordered GLOBAL prefix-sum cut WITHOUT a
    global sort: one stateless map pass scores every doc (the
    classifier_score_docs kernel, shuffle-free); then ITERATIVE
    histogram bisection — each level is one streaming pass that
    histograms the current crossing range into ≤``n_hist`` sub-buckets
    (token sums + row counts, O(n_hist) driver state), keeps every
    higher-score sub-bucket wholesale via a scalar cut, and narrows to
    the single crossing sub-bucket, until the residual fits
    ``driver_max`` rows. If the range collapses to ONE score (massive
    ties), a second bisection phase breaks the tie on doc_id ascending
    with the same machinery — so there is NO driver-size assumption at
    any corpus size: levels ≈ log_{n_hist}(score range) ≤ 3, each one
    cheap pass over the checkpointed 3-int-column scored table. Only
    the final ≤ driver_max residual rows are pulled, exactly sorted,
    and cut at the remaining budget. Integer bucket math keeps all
    paths exact; refinement-forced equality (driver_max=0) is
    pytest-asserted."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def score_ntok(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(flat.astype(object), return_inverse=True)
        w = _clf_weights(uniq)[inv]
        s = np.rint(np.bincount(par, weights=w, minlength=t.num_rows)
                    ).astype(np.int64)
        ntok = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "clf_score": pa.array(s, pa.int64()),
                         "n_tokens": pa.array(ntok, pa.int64())})

    scored = _checkpoint(ds.map_batches(score_ntok, batch_format="pyarrow"),
                         "tokbudget_scored")
    agg = scored.aggregate(Sum("n_tokens", alias_name="tot"),
                           Min("clf_score", alias_name="lo"),
                           Max("clf_score", alias_name="hi"))
    tot, lo, hi = agg["tot"] or 0, agg["lo"], agg["hi"]
    if not tot:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "clf_score": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64())})
    budget = tot // budget_div

    def range_hist(col: str, rlo: int, rhi: int, tie_score: int | None):
        """One pass over `scored`: per-sub-bucket (token sum, row count)
        for rows with ``col`` in [rlo, rhi] (and clf_score == tie_score
        when set). Returns a b-ascending list of (b, tokens, rows) and
        the sub-bucket span."""
        span = rhi - rlo + 1
        nb = min(n_hist, span)

        def hp(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False)
            m = (v >= rlo) & (v <= rhi)
            if tie_score is not None:
                m &= (t["clf_score"].to_numpy(zero_copy_only=False)
                      == tie_score)
            v = v[m]
            ntk = t["n_tokens"].to_numpy(zero_copy_only=False)[m]
            b = (v - rlo) * nb // span
            g = (pd.DataFrame({"b": b, "n": ntk})
                 .groupby("b", sort=False)
                 .agg(n=("n", "sum"), c=("n", "size")).reset_index())
            return pa.table({
                "b": pa.array(g["b"].to_numpy(np.int64), pa.int64()),
                "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
                "c": pa.array(g["c"].to_numpy(np.int64), pa.int64())})

        rows = (scored.map_batches(hp, batch_format="pyarrow")
                .groupby("b").aggregate(Sum("n", alias_name="n"),
                                        Sum("c", alias_name="c"))
                .take_all())  # bounded: <= nb rows
        rows.sort(key=lambda r: r["b"])
        return rows, span, nb

    def sub_range(rlo: int, span: int, nb: int, b: int):
        """Exact integer value range of sub-bucket ``b``."""
        s0 = rlo + -(-(b * span) // nb)
        s1 = rlo + -(-((b + 1) * span) // nb) - 1
        return s0, s1

    # ---- phase 1: bisect on score (descending). Invariant: every doc
    # with clf_score > keep_above is kept wholesale; `rem` is the
    # budget left for docs at or below keep_above; the crossing point
    # lies in [rlo, rhi]. Each level shrinks the range ~n_hist× with
    # ONE streaming pass and O(n_hist) driver state — no driver-size
    # assumption anywhere.
    rlo, rhi = int(lo), int(hi)
    rem = budget
    keep_above = None
    cur_rows = None
    while True:
        h, span, nb = range_hist("clf_score", rlo, rhi, None)
        crossed = False
        for r in reversed(h):  # descending score order
            if rem < r["n"]:
                rlo, rhi = sub_range(rlo, span, nb, int(r["b"]))
                cur_rows = int(r["c"])
                keep_above = rhi
                crossed = True
                break
            rem -= int(r["n"])
        if not crossed:  # budget swallows everything (from this range up)
            if keep_above is None:
                return scored
            break
        if cur_rows <= driver_max or rlo == rhi:
            break

    tie_docid_below = None
    s_star = None
    if crossed and cur_rows > driver_max:
        # ---- phase 2: all crossing docs share one score (doc_id is
        # unique, so the range CAN collapse only via ties) — bisect the
        # doc_id tie-break ascending with the same machinery
        s_star = rlo
        dagg = scored.map_batches(
            lambda t: t.filter(pa.array(
                t["clf_score"].to_numpy(zero_copy_only=False) == s_star)),
            batch_format="pyarrow").aggregate(
            Min("doc_id", alias_name="dlo"), Max("doc_id", alias_name="dhi"))
        dlo, dhi = int(dagg["dlo"]), int(dagg["dhi"])
        tie_docid_below = dlo
        while True:
            h, span, nb = range_hist("doc_id", dlo, dhi, s_star)
            crossed2 = False
            for r in h:  # ascending doc_id order
                if rem < r["n"]:
                    dlo, dhi = sub_range(dlo, span, nb, int(r["b"]))
                    cur_rows = int(r["c"])
                    tie_docid_below = dlo
                    crossed2 = True
                    break
                rem -= int(r["n"])
            if not crossed2 or cur_rows <= driver_max or dlo == dhi:
                break

    def keep_wholesale(t: pa.Table) -> pa.Table:
        s = t["clf_score"].to_numpy(zero_copy_only=False)
        m = s > keep_above
        if s_star is not None:
            m |= (s == s_star) & (
                t["doc_id"].to_numpy(zero_copy_only=False)
                < tie_docid_below)
        return t.filter(pa.array(m))

    kept_high = scored.map_batches(keep_wholesale, batch_format="pyarrow")

    # residual crossing region: exact (score DESC, doc_id ASC) cut on
    # the driver — now provably <= driver_max rows (or a collapsed
    # single-value range, bounded by distinct-doc uniqueness)
    if s_star is None:
        flo, fhi = rlo, rhi

        def in_resid(t: pa.Table) -> pa.Table:
            s = t["clf_score"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array((s >= flo) & (s <= fhi)))
    else:
        fdlo, fdhi = tie_docid_below, dhi

        def in_resid(t: pa.Table) -> pa.Table:
            s = t["clf_score"].to_numpy(zero_copy_only=False)
            d = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(
                (s == s_star) & (d >= fdlo) & (d <= fdhi)))

    tb = pa.concat_tables(
        scored.map_batches(in_resid, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    tb = tb.sort_by([("clf_score", "descending"), ("doc_id", "ascending")])
    csum = np.cumsum(tb["n_tokens"].to_numpy(zero_copy_only=False))
    tb_kept = tb.filter(pa.array(csum <= rem))
    if tb_kept.num_rows == 0:
        return kept_high
    return kept_high.union(rd.from_arrow(tb_kept))
