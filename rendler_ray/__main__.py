"""``python -m rendler_ray`` — the job entry point for cluster runs.

The north-star delivery mode is ``ray job submit`` to a fixed-size
multi-node cluster; this module is the script such a submission runs:

    ray job submit --working-dir . -- \\
        python -m rendler_ray crawl --synth-docs 100000 --seeds 4 \\
            --enrich --out /mnt/out/crawl1 --resume

    ray job submit --working-dir . -- \\
        python -m rendler_ray query dedup_exact_docs \\
            --sf-dir /mnt/data/sf1 --out /mnt/out/dedup

Under ``ray job submit`` the Ray runtime sets ``RAY_ADDRESS`` and a
plain ``ray.init()`` attaches to the submitting cluster; standalone it
starts a local session. As a SCRIPT entry point this module owns its
Ray session (the library itself never calls ray.init — driver
contract); it initializes only when no session exists, so it also
works from an already-initialized driver.

Every command prints exactly one JSON summary line on success (the
machine-readable contract a job supervisor tails for).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        # ray job submit sets RAY_ADDRESS → attaches to the cluster;
        # standalone runs fall back to a local session
        import os

        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_crawl(a) -> dict:
    from rendler_ray.pipelines.crawl import CrawlConfig, crawl
    from rendler_ray.pipelines.export import export_dot
    from rendler_ray.sources.synthweb import default_seeds, docs_parquet

    if a.docs:
        docs = a.docs
    else:
        docs = docs_parquet(
            f"/tmp/rendler_ray_web/docs_{a.synth_docs}.parquet",
            n_docs=a.synth_docs, n_hosts=max(8, a.synth_docs // 100),
            seed=42)
    cfg = CrawlConfig(
        docs_path=docs, seeds=default_seeds(a.seeds),
        max_depth=a.max_depth, max_pages=a.max_pages,
        host_budget_per_round=a.polite, auto_robots=a.auto_robots,
        enrich=a.enrich, content_dedup=a.content_dedup,
        seen_mode=a.seen_mode, out_dir=a.out)
    res = crawl(cfg, resume=a.resume)
    summary = {
        "pages_fetched": res.pages_fetched, "rounds": res.rounds,
        "seen": res.seen_count, "edges": res.edges.count(),
        "out_dir": a.out, **res.stats,
    }
    if a.dot:
        with open(a.dot, "w") as f:
            f.write(export_dot(res.edges, res.renders))
        summary["dot"] = a.dot
    return summary


def cmd_query(a) -> dict:
    from rendler_ray.goldenhash import to_pandas, value_hash
    from rendler_ray.pipelines.queries import QUERIES

    if a.name not in QUERIES:
        sys.exit(f"unknown query {a.name!r} — one of "
                 f"{', '.join(sorted(QUERIES))}")
    res = QUERIES[a.name](a.sf_dir)
    summary = {"query": a.name, "sf_dir": a.sf_dir}
    if a.out:
        import ray.data as rd

        ds = res if hasattr(res, "write_parquet") else rd.from_arrow(res)
        ds.write_parquet(a.out)
        summary["out"] = a.out
        summary["rows"] = ds.count()
    else:
        df = to_pandas(res)
        summary["rows"] = len(df)
        summary["value_hash"] = value_hash(
            df[sorted(df.columns)].sort_values(
                list(sorted(df.columns))).reset_index(drop=True)
            if len(df.columns) else df)
    return summary


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m rendler_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run the crawl pipeline")
    c.add_argument("--docs", help="interleaved-docs parquet path "
                   "(default: deterministic synthetic corpus)")
    c.add_argument("--synth-docs", type=int, default=2000,
                   help="synthetic corpus size when --docs is not given")
    c.add_argument("--seeds", type=int, default=1)
    c.add_argument("--max-depth", type=int, default=None)
    c.add_argument("--max-pages", type=int, default=None)
    c.add_argument("--polite", type=int, default=None,
                   help="per-host fetch budget per round")
    c.add_argument("--auto-robots", action="store_true")
    c.add_argument("--enrich", action="store_true")
    c.add_argument("--content-dedup", action="store_true")
    c.add_argument("--seen-mode", choices=["exact", "cuckoo"],
                   default="exact")
    c.add_argument("--out", default=None,
                   help="checkpoint dir (enables resume)")
    c.add_argument("--resume", action="store_true")
    c.add_argument("--dot", default=None,
                   help="write the crawl-graph dot artifact here")
    c.set_defaults(fn=cmd_crawl)

    q = sub.add_parser("query", help="run a registry pipeline")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--out", default=None,
                   help="write the result as parquet instead of "
                        "printing its value hash")
    q.set_defaults(fn=cmd_query)

    a = p.parse_args(argv)
    _ensure_ray()
    print(json.dumps(a.fn(a)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
