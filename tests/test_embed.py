"""TextEmbedder stage: determinism, schema, strict mode, and the full
embed → IVF-index → top-k chain over stub embeddings."""

import numpy as np
import pyarrow as pa
import pytest

from rendler_ray.stages.embed import TextEmbedder, embed_text_ds


def _batch(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_embedder_deterministic_normalized():
    texts = ["the quick crawl", "render frame fetch page", "the quick crawl",
             "", "one"]
    a = TextEmbedder()(_batch(texts))
    b = TextEmbedder()(_batch(texts))
    ma = np.stack([np.asarray(v, np.float64)
                   for v in a["embedding"].to_pylist()])
    mb = np.stack([np.asarray(v, np.float64)
                   for v in b["embedding"].to_pylist()])
    assert (ma == mb).all()                      # deterministic
    assert np.allclose(np.linalg.norm(ma, axis=1), 1.0, atol=1e-6)
    assert (ma[0] == ma[2]).all()                # identical text, same vec
    assert not (ma[0] == ma[1]).all()            # different text differs
    assert a["embedding"].type == pa.list_(pa.float32())


def test_embedder_strict_raises():
    with pytest.raises(NotImplementedError):
        TextEmbedder(strict=True)(_batch(["x"]))


def test_embedder_empty_batch():
    out = TextEmbedder()(_batch([]))
    assert out.num_rows == 0
    assert "embedding" in out.column_names


@pytest.mark.usefixtures("ray_session")
def test_embed_to_ivf_chain_recall():
    """Closed loop: produce embeddings from the documents TEXT with the
    inference stage, index them with IVF, and check probed top-k recall
    ≥ 0.8 vs brute force over the same produced vectors."""
    import ray.data as rd

    from rendler_ray.functions.ann import brute_force_topk, ivf_topk

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    emb = embed_text_ds(docs, text_col="text").map_batches(
        lambda t: t.select(["doc_id", "embedding"]).rename_columns(
            ["vec_id", "embedding"]),
        batch_format="pyarrow").materialize()

    qtbl = pa.concat_tables(emb.iter_batches(batch_size=None,
                                             batch_format="pyarrow"))
    queries = {int(i): np.asarray(v, np.float64)
               for i, v in zip(qtbl["vec_id"].to_pylist()[:6],
                               qtbl["embedding"].to_pylist()[:6])}

    exact = brute_force_topk(emb, queries, k=10).to_pandas()
    approx = ivf_topk(emb, queries, k=10, n_lists=8, n_probe=3).to_pandas()
    recalls = []
    for q in queries:
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8, recalls
