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
