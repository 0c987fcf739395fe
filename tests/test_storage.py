"""Storage seam: atomic table writes, empty-table round-trips, manifest
atomicity, and hive-inference immunity for round=N paths."""

import os

import pyarrow as pa
import pytest
import ray.data

from rendler_ray.schema import EDGES_SCHEMA
from rendler_ray.storage import (
    read_manifest,
    read_table,
    write_manifest,
    write_table,
)


@pytest.mark.usefixtures("ray_session")
def test_write_read_roundtrip_under_partition_dir(tmp_path):
    t = pa.table({"src": ["a"], "dst": ["b"],
                  "ord": pa.array([0], pa.int32()),
                  "src_seq": pa.array([0], pa.int64()),
                  "depth": pa.array([1], pa.int32())})
    path = str(tmp_path / "round=3" / "edges.parquet")
    os.makedirs(os.path.dirname(path))
    write_table(ray.data.from_arrow(t), path)
    back = read_table(path, EDGES_SCHEMA)
    # round=3 in the path must NOT become a hive column
    assert set(back.schema().names) == set(t.schema.names)
    assert back.count() == 1
    # overwrite is atomic and idempotent
    write_table(ray.data.from_arrow(t), path)
    assert read_table(path, EDGES_SCHEMA).count() == 1
    assert not os.path.exists(path + ".tmp")


@pytest.mark.usefixtures("ray_session")
def test_empty_table_roundtrip(tmp_path):
    path = str(tmp_path / "round=0" / "edges.parquet")
    os.makedirs(os.path.dirname(path))
    empty = ray.data.from_arrow(EDGES_SCHEMA.empty_table())
    write_table(empty, path)
    back = read_table(path, EDGES_SCHEMA)
    assert back.count() == 0
    assert back.schema().names == EDGES_SCHEMA.names


def test_manifest_roundtrip(tmp_path):
    d = str(tmp_path)
    assert read_manifest(d) is None
    write_manifest(d, {"round": 2, "x": [1, 2]})
    assert read_manifest(d) == {"round": 2, "x": [1, 2]}
    assert not os.path.exists(os.path.join(d, "manifest.json.tmp"))


@pytest.mark.usefixtures("ray_session")
def test_write_partitioned_resume_skips_done_buckets(tmp_path):
    """Resumable sink: stamped buckets are skipped on re-run; unstamped
    (crashed) and missing buckets are redone; read-back is complete."""
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray.data as rd

    from rendler_ray.storage import read_partitioned, write_partitioned

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"])
    out = str(tmp_path / "sink")
    r1 = write_partitioned(rd.from_arrow(src), out, "doc_id",
                           num_buckets=8)
    assert r1["skipped"] == [] and len(r1["written"]) > 1

    # simulate a crash: one bucket unstamped (partial), one gone
    written = sorted(r1["written"])
    os.remove(os.path.join(out, f"bucket={written[0]}", "_SUCCESS"))
    shutil.rmtree(os.path.join(out, f"bucket={written[1]}"))

    r2 = write_partitioned(rd.from_arrow(src), out, "doc_id",
                           num_buckets=8)
    assert set(r2["written"]) == {written[0], written[1]}
    assert set(r2["skipped"]) == set(written[2:])

    df = read_partitioned(out).to_pandas()
    got = sorted(zip(df["doc_id"], df["text"]))
    exp = sorted(zip(src["doc_id"].to_pylist(), src["text"].to_pylist()))
    assert got == exp
