"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry AND its ``oracle_sql()`` side-by-side over a testdata
scale dir, compare row-count + schema + order-insensitive value hash
(columns sorted by name, rows sorted by all columns — the driver's
compare model).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from rendler_ray.goldenhash import canon, to_pandas, value_hash  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")

    import __ray_entry__ as E
    qs, oracles = E.queries(), E.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(mine)} (rows-only, no oracle) "
                  f"[{dt:.1f}s]")
            continue
        try:
            ora = canon(con.execute(oracles[name]).fetch_df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        problems = []
        if list(mine.columns) != list(ora.columns):
            problems.append(f"schema {list(mine.columns)} != {list(ora.columns)}")
        elif len(mine) != len(ora):
            problems.append(f"rows {len(mine)} != {len(ora)}")
        elif value_hash(mine) != value_hash(ora):
            neq = (mine != ora) & ~(mine.isna() & ora.isna())
            bad_cols = [c for c in mine.columns if neq[c].any()]
            problems.append(f"values differ in {bad_cols}; "
                            f"first bad row:\n{mine[neq.any(axis=1)].head(2)}\n"
                            f"vs\n{ora[neq.any(axis=1)].head(2)}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"ok   {name}: rows={len(mine)} hash match [{dt:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
