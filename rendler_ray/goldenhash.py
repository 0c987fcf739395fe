"""Order-insensitive result hashing — the driver's compare model.

Shared by the local correctness gate (scripts/check_correctness.py),
the golden-fixture generator (scripts/make_goldens.py) and the golden
regression tests (tests/test_goldens.py): columns sorted by name, rows
sorted by all columns, floats rounded to 9 dp before hashing.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            col = col.round(9)
        h.update(pd.util.hash_pandas_object(col, index=False).values.tobytes())
    return h.hexdigest()[:16]


def result_hash(res) -> tuple[int, str]:
    """(row_count, value_hash) of a query result under the driver model."""
    df = canon(to_pandas(res))
    return len(df), value_hash(df)
