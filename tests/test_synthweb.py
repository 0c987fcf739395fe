import pyarrow as pa
import pyarrow.parquet as pq

from rendler_ray.schema import DOCS_SCHEMA
from rendler_ray.sources.synthweb import generate_docs, zipf_sizes


def test_deterministic():
    a = generate_docs(n_docs=200, n_hosts=5, seed=7)
    b = generate_docs(n_docs=200, n_hosts=5, seed=7)
    assert a.equals(b)
    c = generate_docs(n_docs=200, n_hosts=5, seed=8)
    assert not a.equals(c)


def test_schema_and_invariants():
    t = generate_docs(n_docs=150, n_hosts=6, seed=42)
    assert t.schema.equals(DOCS_SCHEMA)
    assert t.num_rows == 150
    assert len(set(t["doc_id"].to_pylist())) == 150
    for spans in t["spans"].to_pylist():
        assert len(spans) >= 1
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)
        for s in spans:
            if s["kind"] == "text":
                assert s["media_ref"] == ""
            else:
                assert s["media_ref"] != "" and s["text"] == ""


def test_zipf_sizes_exact_total():
    s = zipf_sizes(1000, 17)
    assert s.sum() == 1000 and (s >= 1).all()
    assert s[0] == s.max()  # skew: first host is the hub


def test_parquet_cache(tmp_path, small_docs):
    t = pq.read_table(small_docs)
    assert t.schema.equals(DOCS_SCHEMA)
    assert t.num_rows == 300
