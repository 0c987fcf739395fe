"""Enrich stage (fetch → quality/lang/simhash/minhash columns) and its
fusion into the crawl (SURVEY.md training-data ops as pipeline stages)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rendler_ray.stages.enrich import enrich_batch, page_text_column


def _fetch_batch_from_docs(path, n=50):
    t = pq.read_table(path).slice(0, n)
    return pa.table({
        "url": t["doc_id"],
        "spans": t["spans"],
        "status": pa.array([200] * t.num_rows, pa.int32()),
    })


def test_page_text_join_order(small_docs):
    batch = _fetch_batch_from_docs(small_docs)
    out = page_text_column(batch)
    spans = batch["spans"].to_pylist()
    for i in range(batch.num_rows):
        expected = " ".join(sp["text"] for sp in spans[i]
                            if sp["kind"] == "text")
        assert out["page_text"][i].as_py() == expected


def test_enrich_columns_and_determinism(small_docs):
    batch = _fetch_batch_from_docs(small_docs)
    a = enrich_batch(batch)
    b = enrich_batch(batch)
    for col in ["n_tokens", "n_uniq_tokens", "n_stopwords", "lang_pred",
                "simhash", "minhash_bands"]:
        assert col in a.column_names
        assert a[col].to_pylist() == b[col].to_pylist()
    # quality invariants
    nt = np.array(a["n_tokens"].to_pylist())
    nu = np.array(a["n_uniq_tokens"].to_pylist())
    assert (nu <= nt).all() and (nt > 0).all()
    assert all(len(bands) == 8 for bands in a["minhash_bands"].to_pylist())


def test_enrich_empty_batch_schema(small_docs):
    batch = _fetch_batch_from_docs(small_docs).slice(0, 0)
    out = enrich_batch(batch)
    assert "simhash" in out.column_names and out.num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_crawl_with_enrich_matches_plain(small_docs):
    """enrich=True must not change crawl semantics — same pages, same
    seqs — only add columns."""
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds
    from rendler_ray.util import table_from_ds

    base = dict(docs_path=small_docs, seeds=default_seeds(1), max_depth=2,
                num_seen_shards=2, num_web_shards=2)
    plain = crawl(CrawlConfig(**base))
    rich = crawl(CrawlConfig(**base, enrich=True))
    fp = table_from_ds(plain.fetched)
    fr = table_from_ds(rich.fetched)
    key = lambda t: sorted(zip(t["seq"].to_pylist(), t["url"].to_pylist()))
    assert key(fp) == key(fr)
    assert "simhash" in fr.column_names
    assert "minhash_bands" in fr.column_names


def test_enrich_bpe_column_matches_offline(small_docs):
    """Crawl-time n_bpe_pieces == offline bpe_encode_batch over the same
    page text, and the empty-batch schema includes the column."""
    import ray

    from rendler_ray.functions.bpe import bpe_encode_batch

    merges = [("t", "h"), ("th", "e"), ("a", "n")]
    ref = ray.put(merges)
    batch = _fetch_batch_from_docs(small_docs)
    out = enrich_batch(batch, bpe_merges_ref=ref)
    assert "n_bpe_pieces" in out.column_names

    offline = bpe_encode_batch(
        page_text_column(batch).select(["url", "page_text"]),
        merges_ref=ref, text_col="page_text")
    assert out["n_bpe_pieces"].to_pylist() == \
        offline["n_bpe_pieces"].to_pylist()

    empty = enrich_batch(batch.slice(0, 0), bpe_merges_ref=ref)
    assert "n_bpe_pieces" in empty.column_names and empty.num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_crawl_enrich_bpe_end_to_end(small_docs, tmp_path):
    """Full crawl with enrich_bpe_merges: every 200 page gets a positive
    n_bpe_pieces <= its whitespace token count under char-level merges,
    and the crawl itself is unchanged (same pages/seqs as enrich-only)."""
    from rendler_ray.functions.bpe import bpe_train
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.sources.synthweb import default_seeds
    from rendler_ray.util import table_from_ds
    import ray.data as rd

    docs_ds = rd.read_parquet(small_docs)

    def doc_text(t: pa.Table) -> pa.Table:
        texts = [" ".join(sp["text"] for sp in row if sp["kind"] == "text")
                 for row in t["spans"].to_pylist()]
        return pa.table({"text": pa.array(texts, pa.string())})

    merges = bpe_train(docs_ds.map_batches(doc_text,
                                           batch_format="pyarrow"),
                       num_merges=8)
    mpath = str(tmp_path / "merges.parquet")
    pq.write_table(merges, mpath)

    base = dict(docs_path=small_docs, seeds=default_seeds(1), max_depth=2,
                num_seen_shards=2, num_web_shards=2, enrich=True)
    plain = crawl(CrawlConfig(**base))
    bpe = crawl(CrawlConfig(**base, enrich_bpe_merges=mpath))
    fp, fb = table_from_ds(plain.fetched), table_from_ds(bpe.fetched)
    key = lambda t: sorted(zip(t["seq"].to_pylist(), t["url"].to_pylist()))
    assert key(fp) == key(fb)
    st = np.array(fb["status"].to_pylist())
    npieces = np.array(fb["n_bpe_pieces"].to_pylist())
    ntok = np.array(fb["n_tokens"].to_pylist())
    ok = st == 200
    assert (npieces[ok] > 0).all()
    # merges only ever shrink the char-level piece count, and pieces
    # per word >= 1 so n_bpe_pieces >= n_tokens
    assert (npieces[ok] >= ntok[ok]).all()
