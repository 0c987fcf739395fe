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
