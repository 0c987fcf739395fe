"""Storage seam: checkpoint/table I/O behind one module.

BASELINE.json's north_rule stores tables as Lance; the sandbox has no
``lance`` wheel (offline — SURVEY.md §0), so the default format is
Parquet with identical schemas. ``FORMAT`` flips to "lance" when the
wheel is importable; nothing else in the engine changes — this module
is the only place that knows the on-disk format.

Checkpoint layout (resumable output, SURVEY.md §4.2):

    out/round=N/{frontier,fetch,edges,renders}.parquet/   (dirs of files)
    out/manifest.json                                     (atomic rename)

All writes are write-then-rename so a crashed run never leaves a
half-written round visible.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pyarrow as pa
import ray
import ray.data

try:  # pragma: no cover - lance wheel absent in sandbox
    import lance  # noqa: F401

    FORMAT = "lance"
except ImportError:
    FORMAT = "parquet"


def write_table(ds: "ray.data.Dataset", path: str) -> None:
    """Write a Dataset to ``path`` atomically (write temp, rename)."""
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if FORMAT == "lance":
        ds.write_lance(tmp)
    else:
        ds.write_parquet(tmp)
    if not os.path.exists(tmp):
        os.makedirs(tmp)  # empty dataset: writer emits nothing
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def read_table(path: str, schema: pa.Schema) -> "ray.data.Dataset":
    """Read a table dir; an empty marker dir (zero-row write) becomes an
    empty dataset with the right schema. ``partitioning=None``: the
    checkpoint layout's round=N path component must NOT be hive-inferred
    into a column."""
    if FORMAT == "lance" and os.path.isdir(os.path.join(path, "data")):
        return ray.data.read_lance(path)
    if os.path.isdir(path) and not glob.glob(os.path.join(path, "*.parquet")):
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.read_parquet(path, partitioning=None)


def write_partitioned(ds: "ray.data.Dataset", path: str, key_col: str,
                      num_buckets: int = 64) -> dict:
    """Resumable hash-bucketed sink: rows land in ``bucket=K/`` dirs by
    ``stable_hash64(key) % num_buckets``; each completed bucket is
    stamped with ``_SUCCESS``. A re-run (a) deletes unstamped partial
    bucket dirs from the crashed attempt, (b) writes ONLY the missing
    buckets (one distributed filtered pass — never one scan per
    bucket), (c) stamps them. A 100-TB job that dies at 80% re-does
    the missing 20%. Returns {"written": [...], "skipped": [...]}.
    """
    import numpy as np
    import pyarrow.compute as pc

    from rendler_ray.functions.canon import stable_hash64

    os.makedirs(path, exist_ok=True)
    done, partial = [], []
    for d in os.listdir(path):
        if not d.startswith("bucket="):
            continue
        b = int(d.split("=", 1)[1])
        if os.path.exists(os.path.join(path, d, "_SUCCESS")):
            done.append(b)
        else:
            partial.append(d)
    for d in partial:  # unstamped = crashed mid-write: redo
        shutil.rmtree(os.path.join(path, d))

    done_arr = np.asarray(sorted(done), dtype=np.int64)

    def add_bucket_keep_missing(t: pa.Table) -> pa.Table:
        h = stable_hash64(np.asarray(
            [str(x) for x in t[key_col].to_pylist()], dtype=object))
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        t = t.append_column("bucket", pa.array(b, pa.int64()))
        if len(done_arr):
            t = t.filter(pc.invert(pc.is_in(
                t["bucket"], value_set=pa.array(done_arr, pa.int64()))))
        return t

    todo = ds.map_batches(add_bucket_keep_missing, batch_format="pyarrow")
    todo.write_parquet(path, partition_cols=["bucket"])
    written = []
    for d in os.listdir(path):
        if d.startswith("bucket="):
            b = int(d.split("=", 1)[1])
            if b not in done:
                open(os.path.join(path, d, "_SUCCESS"), "w").close()
                written.append(b)
    return {"written": sorted(written), "skipped": sorted(done)}


def read_partitioned(path: str) -> "ray.data.Dataset":
    """Read a :func:`write_partitioned` sink: only stamped (_SUCCESS)
    buckets are read, with the original data schema (``bucket`` lives
    in the directory name, not the files)."""
    files = [
        f
        for d in sorted(os.listdir(path))
        if d.startswith("bucket=")
        and os.path.exists(os.path.join(path, d, "_SUCCESS"))
        for f in sorted(glob.glob(os.path.join(path, d, "*.parquet")))
    ]
    return ray.data.read_parquet(files)


def read_manifest(out_dir: str) -> dict | None:
    p = os.path.join(out_dir, "manifest.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def write_manifest(out_dir: str, m: dict) -> None:
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
