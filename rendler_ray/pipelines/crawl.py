"""The crawl: RENDLER's async scheduler loop (SURVEY.md §3.1) rebuilt as
deterministic, resumable BFS rounds over Ray Datasets (§3.4).

Per round:

    frontier(url, canon_url, host, depth, seq)
      → robots filter + per-host budget gate     (politeness; off in
                                                  conformance mode)
      → map_batches(fetch)                       closed-world web shards
        [+ map_batches(enrich), fused]           quality/lang/fingerprints
      → map_batches(render)                      renders table
      → map_batches(extract_edges)               edges table (page order)
      → candidates = resolved links, depth-gated, per-batch combined
      → offer → sharded SeenShard actors         fused first-discoverer
                                                 dedup + seen check: each
                                                 shard keeps the running
                                                 min(order_key) per unseen
                                                 URL (commutative ⇒ batch-
                                                 order/retry independent)
      → drain winners (Arrow refs)               no groupby all-to-all:
                                                 the only exchange is the
                                                 URL-hash routing the seen
                                                 check already needs
      → dense seq by driver-side key rank        (≤5M rows; distributed
                                                 sort fallback above)
      → checkpoint round outputs + manifest + seen snapshots (atomic)

Determinism: the reference's queue order is "seed, then links in
discovery order" (FIFO). ``seq`` — assigned densely in (depth, src_seq,
ord) order, first-discoverer-wins — reproduces exactly that order for
any fixed seed list + politeness budget, independent of batch/actor
scheduling. Conformance is asserted against ``refsim`` in tests.

Scale posture: the frontier is never collected to the driver; per-round
state crossing the loop is a materialized Dataset (object store, spills)
plus O(#shards) actor state. Edges/renders/fetch stream to partitioned
parquet per round, so a killed run resumes at the last completed round
(seen set rebuilt from frontier snapshots — every seen URL is by
construction a frontier row of some round).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data

from rendler_ray.functions.canon import canonicalize, host_of
from rendler_ray.schema import (
    EDGES_SCHEMA,
    FETCH_SCHEMA,
    FRONTIER_SCHEMA,
    RENDERS_SCHEMA,
)
from rendler_ray.stages.enrich import enrich_batch
from rendler_ray.stages.extract import extract_edges
from rendler_ray.stages.fetch import (
    Fetcher,
    fetch_batch,
    inject_transient_failures,
    make_web_blobs,
    make_web_shards,
)
from rendler_ray.stages.render import Renderer, render_batch
from rendler_ray.state.politeness import (
    RobotsFilter,
    budget_gate,
    build_policies,
    robots_filter_batch,
)
from rendler_ray.state.seen import make_seen_shards, seen_check_and_add
from rendler_ray.util import with_row_seq

# order_key = src_seq * 2^21 + ord: total order of discovery within a
# round. seq < 2^40 even at the 10^10 design point, ord capped at 2^21-1.
_ORD_BITS = 21
_ORD_CAP = (1 << _ORD_BITS) - 1

_TIMING = bool(os.environ.get("RENDLER_CRAWL_TIMING"))


class _T:
    """Env-gated per-stage wall-clock trace (RENDLER_CRAWL_TIMING=1)."""

    def __init__(self, label: str):
        self.label = label

    def __enter__(self):
        self.t0 = time.monotonic()

    def __exit__(self, *exc):
        if _TIMING:
            print(f"[crawl-timing] {self.label}: "
                  f"{time.monotonic() - self.t0:.2f}s", flush=True)


@dataclass
class CrawlConfig:
    docs_path: str
    seeds: list[str]
    max_depth: int | None = None
    max_pages: int | None = None
    canonicalize: bool = False          # False = reference conformance mode
    num_seen_shards: int = 4
    num_web_shards: int = 4
    seen_mode: str = "exact"            # "exact" | "cuckoo"
    seen_capacity_per_shard: int = 1 << 20
    host_budget_per_round: int | None = None   # politeness off when None
    robots: dict[str, str] | None = None       # host -> robots.txt text
    politeness_window_ms: int = 60_000
    out_dir: str | None = None          # enables checkpointing when set
    fetch_concurrency: int | tuple = (1, 4)
    render_concurrency: int | tuple = (1, 4)
    # "tasks": stateless router stages run on warm task workers (the
    # crawl-wide state lives in persistent WebShard/SeenShard actors) —
    # no per-round actor-pool spin-up. "actors": per-worker-stateful
    # stage form (real HTTP sessions / browser engines).
    stage_mode: str = "tasks"
    # deterministic transient fetch-failure model (the closed-world
    # stand-in for HTTP timeouts): per-(url, attempt) hash coin, up to
    # fetch_retries in-task retries, then status 598 = gave up (no
    # spans / render / links, still seen — the reference's TASK_FAILED
    # path). Off at 0.0; see stages/fetch.py::inject_transient_failures.
    fetch_fail_rate: float = 0.0
    fetch_fail_seed: int = 0
    fetch_retries: int = 2
    # per-page enrichment (quality scores, lang-id, simhash) fused into
    # the fetch pass — the training-data half of the pipeline
    enrich: bool = False
    # with enrich: parquet merge table (left, right — functions/bpe.py
    # bpe_train output) applied at crawl time; adds n_bpe_pieces (the
    # token-budget column) to each fetched page. Broadcast once.
    enrich_bpe_merges: str | None = None
    # fetch each newly-seen host's /robots.txt from the (closed-world)
    # web itself and fold it into the politeness policies. With
    # auto_robots the known-host ledger + parsed policies live in
    # sharded actors BY DEFAULT (None → 4 shards — the 10^8-hosts form:
    # the driver only ever holds one round's distinct hosts, never a
    # cumulative ray.put(policies)); set host_ledger_shards=0 to
    # explicitly opt into the driver-set form (small closed crawls).
    auto_robots: bool = False
    host_ledger_shards: int | None = None
    # per-host budget thresholds broadcast as a dict up to this many
    # hosts; above it the gate becomes a hash join on host
    # (state/politeness.py::_budget_gate_join)
    budget_broadcast_max_hosts: int = 200_000
    # crawl-time exact content dedup (training-data crawls): pages whose
    # text-content fingerprint was already crawled are dropped BEFORE
    # render/extract — first discoverer (min seq) wins, deterministic.
    # Off in conformance mode (the reference renders every fetch).
    content_dedup: bool = False
    content_dedup_shards: int = 4
    # incremental re-crawl: path to a PRIOR run's out_dir. Pages whose
    # content fingerprint is unchanged vs the prior run skip the render
    # stage; their prior render artifacts are reused (fetch and link
    # extraction still run — discovering change requires fetching).
    # Limitation: resuming a KILLED re-crawl (out_dir + resume=True)
    # loses the pre-crash rounds' unchanged-URL sets, so reused renders
    # cover only post-resume rounds — re-run the re-crawl from scratch
    # instead (it skips the render work either way).
    recrawl_prior_dir: str | None = None
    recrawl_fp_shards: int = 4
    # priority-driven frontier scheduling (focused crawling — Cho/
    # García-Molina/Page'98 URL ordering): parquet score table
    # (url, score:int64, e.g. fixed-point PageRank from a prior crawl)
    # + per-round fetch cap. Each round fetches the priority_per_round
    # highest-scored frontier rows (ties by seq); the rest defer like
    # politeness deferral. Without a depth cap only fetch order across
    # rounds moves (same final fetched set); with max_depth the depth
    # budget is spent along high-score paths. stages/prioritize.py.
    priority_scores: str | None = None
    priority_per_round: int | None = None
    priority_broadcast_max: int = 1_000_000
    # prebuilt closed-world web (make_web_blobs / make_web_shards) —
    # lets benchmarks keep web-corpus setup (the "internet", not the
    # crawler) out of the timed section
    web: list | None = None
    batch_size: int = 4096
    max_rounds: int = 1000


@dataclass
class CrawlResult:
    fetched: "ray.data.Dataset"         # url, host, depth, seq, status, spans
    edges: "ray.data.Dataset"           # src, dst, ord, src_seq, depth
    renders: "ray.data.Dataset"         # doc_id, media_ref, image, rendered_round
    frontier_log: "ray.data.Dataset"    # every frontier row ever created
    pages_fetched: int = 0
    rounds: int = 0
    seen_count: int = 0
    deferred_rounds: int = 0
    stats: dict = field(default_factory=dict)


def _frontier_from_urls(urls: list[str], depths: list[int], seqs: list[int],
                        canon: bool) -> pa.Table:
    canon_urls = [canonicalize(u) if canon else u for u in urls]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "canon_url": pa.array(canon_urls, pa.string()),
            "host": pa.array([host_of(u) for u in canon_urls], pa.string()),
            "depth": pa.array(depths, pa.int32()),
            "seq": pa.array(seqs, pa.int64()),
        },
        schema=FRONTIER_SCHEMA,
    )


def _seed_frontier(cfg: CrawlConfig) -> pa.Table:
    seen: set[str] = set()
    urls: list[str] = []
    for u in cfg.seeds:
        key = canonicalize(u) if cfg.canonicalize else u
        if key not in seen:
            seen.add(key)
            urls.append(u)
    return _frontier_from_urls(urls, [0] * len(urls), list(range(len(urls))),
                               cfg.canonicalize)


def _edge_keys(batch: pa.Table, max_depth: int | None):
    """Shared prologue: depth-gate the edges batch, compute order_key and
    candidate depth as numpy arrays."""
    import pyarrow.compute as pc

    if max_depth is not None:
        batch = batch.filter(pc.less_equal(batch["depth"], max_depth - 1))
    src_seq = batch["src_seq"].to_numpy(zero_copy_only=False)
    ords = np.minimum(batch["ord"].to_numpy(zero_copy_only=False), _ORD_CAP)
    order_key = (src_seq.astype(np.int64) << _ORD_BITS) | ords.astype(np.int64)
    depth = (batch["depth"].to_numpy(zero_copy_only=False) + 1).astype(np.int32)
    return batch, order_key, depth


def _candidates_fast(batch: pa.Table, max_depth: int | None) -> pa.Table:
    """Edges batch → (canon_url, order_key, depth), fully vectorized —
    the conformance-mode path (no canonicalization, no politeness).

    First-discoverer dedup then runs as native ``aggregate(Min(order_key),
    Min(depth))``. Correct because without deferral every round's frontier
    is single-depth (pure BFS), so all duplicates of a URL inside a round
    share one depth and Min(depth) IS the winner's depth. A local pandas
    groupby-min combiner bounds the shuffle to unique URLs per batch.
    """
    import pandas as pd

    batch, order_key, depth = _edge_keys(batch, max_depth)
    df = pd.DataFrame({
        "canon_url": batch["dst"].to_numpy(zero_copy_only=False),
        "order_key": order_key,
        "depth": depth,
    })
    g = df.groupby("canon_url", sort=False, as_index=False).min()
    return pa.table({
        "canon_url": pa.array(g["canon_url"].to_numpy(dtype=object), pa.string()),
        "order_key": pa.array(g["order_key"].to_numpy(np.int64), pa.int64()),
        "depth": pa.array(g["depth"].to_numpy(np.int32), pa.int32()),
    })


def _finish_winners_fast(batch: pa.Table) -> pa.Table:
    """Drained winners (canon_url, key, depth) → frontier-candidate rows;
    url = canon_url in conformance mode, host vectorized."""
    from rendler_ray.functions.canon import hosts_np

    import pyarrow.compute as pc

    urls = batch["canon_url"].to_numpy(zero_copy_only=False)
    return pa.table({
        "url": batch["canon_url"],
        "canon_url": batch["canon_url"],
        "host": pa.array(hosts_np(urls), pa.string()),
        "depth": pc.cast(batch["depth"], pa.int32()),
        "order_key": pc.cast(batch["key"], pa.int64()),
    })


def _candidates(batch: pa.Table, canon: bool, max_depth: int | None) -> pa.Table:
    """Edges batch → candidate rows (canon_url, pack) — the general path
    (canonicalize mode and/or politeness deferral, where a round can mix
    depths and the winner's (url, depth) must travel WITH its order_key).

    ``pack`` = f"{order_key:016x}|{depth:08x}|{url}" — a fixed-width-hex
    sortable encoding whose lexicographic MIN equals the numeric min of
    order_key (order_key is unique per edge), so first-discoverer dedup
    still runs as a native ``aggregate(Min)``.
    """
    import pandas as pd

    batch, order_key, depth = _edge_keys(batch, max_depth)
    dsts = batch["dst"].to_pylist()
    canon_urls = [canonicalize(u) for u in dsts] if canon else dsts
    df = pd.DataFrame({
        "canon_url": canon_urls,
        "pack": [f"{k:016x}|{d:08x}|{u}"
                 for k, d, u in zip(order_key, depth, dsts)],
    })
    # local combiner: one candidate per canon_url per batch
    df = df.sort_values("pack", kind="stable").drop_duplicates(
        "canon_url", keep="first")
    return pa.table({"canon_url": pa.array(df["canon_url"].tolist(), pa.string()),
                     "pack": pa.array(df["pack"].tolist(), pa.string())})


def _unpack_winners(batch: pa.Table) -> pa.Table:
    """Drained winners (canon_url, key=pack) → (url, canon_url, host,
    depth, order_key)."""
    packs = batch["key"].to_pylist()
    order_key = np.fromiter((int(p[:16], 16) for p in packs),
                            dtype=np.int64, count=len(packs))
    depth = np.fromiter((int(p[17:25], 16) for p in packs),
                        dtype=np.int32, count=len(packs))
    urls = [p[26:] for p in packs]
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "canon_url": batch["canon_url"],
        "host": pa.array([host_of(u) for u in urls], pa.string()),
        "depth": pa.array(depth, pa.int32()),
        "order_key": pa.array(order_key, pa.int64()),
    })



@ray.remote
def _winner_keys(block: pa.Table):
    """order_key (or pack) column of a drained winners block — the only
    data the driver needs to rank a round."""
    return block["key"].to_numpy(zero_copy_only=False)


@ray.remote
def _finish_with_seq(block: pa.Table, fast: bool, ranks: np.ndarray,
                     base: int, row0: int, n_rows: int) -> pa.Table:
    """Slice [row0, row0+n_rows) of a drained winners block → frontier
    rows with dense seq = base + global rank. Fuses the winners decode
    and the seq attach into one task (no Dataset sort, no extra map)."""
    sl = block.slice(row0, n_rows)
    t = _finish_winners_fast(sl) if fast else _unpack_winners(sl)
    t = t.drop_columns(["order_key"])
    seq = pa.array((base + ranks).astype(np.int64), pa.int64())
    return t.append_column("seq", seq).select(
        ["url", "canon_url", "host", "depth", "seq"])


# Rounds larger than this fall back to the distributed sort path; below
# it, ranking the (8-byte) keys on the driver is far cheaper than a
# Ray Data sort (one round ~ 10^8 keys = 800 MB driver RAM at the cap).
_DRIVER_RANK_MAX = 5_000_000


def _number_winners(winner_refs: list, fast: bool, total_seq: int,
                    n_new: int, target_rows_per_block: int = 4096):
    """Drained winners (block refs) → next-frontier Dataset with dense
    contiguous ``seq`` assigned in global (depth, src_seq, ord) order.

    Driver-side rank: pull ONLY the key column of each block (8 B/row),
    argsort once, ship per-slice rank arrays back into tasks. The blocks
    themselves never leave the object store."""
    keys_list = ray.get([_winner_keys.remote(r) for r in winner_refs])
    sizes = [len(k) for k in keys_list]
    all_keys = np.concatenate([k for k in keys_list if len(k)]) \
        if any(sizes) else np.array([], dtype=np.int64)
    order = np.argsort(all_keys, kind="stable")
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order))
    out_refs = []
    off = 0
    for ref, sz in zip(winner_refs, sizes):
        row0 = 0
        while row0 < sz:
            k = min(target_rows_per_block, sz - row0)
            out_refs.append(_finish_with_seq.remote(
                ref, fast, rank[off + row0: off + row0 + k], total_seq,
                row0, k))
            row0 += k
        off += sz
    return ray.data.from_arrow_refs(out_refs)


def _content_fp_batch(t: pa.Table) -> pa.Table:
    """Append an exact-content fingerprint (md5 over the page's text
    spans, newline-joined); "" for non-200 rows (no content)."""
    import hashlib

    spans = t["spans"].to_pylist()
    status = t["status"].to_numpy(zero_copy_only=False)
    fps = [
        hashlib.md5("\n".join(sp["text"] for sp in row
                              if sp["kind"] == "text").encode()).hexdigest()
        if st == 200 else ""
        for row, st in zip(spans, status)
    ]
    return t.append_column("fingerprint", pa.array(fps, pa.string()))


@ray.remote
def _packed_fp_keys(block: pa.Table) -> pa.Table:
    """Winner block (canon_url=fingerprint, key=seq) → packed fp:seq
    key column (small per-round table)."""
    import pyarrow.compute as pc

    key = pc.binary_join_element_wise(
        block["canon_url"], pc.cast(block["key"], pa.string()), ":")
    return pa.table({"k": key})


def _content_dedup_round(fetched, shards):
    """Drop fetched rows whose content fingerprint was already crawled
    (earlier round, or a lower-seq row this round). Reuses the SeenShard
    offer/drain min-reduce keyed by fingerprint with seq as the order
    key — deterministic under any batch order/retry. The per-round
    winner set is broadcast as packed fp:seq keys (bounded by round
    size, the same posture as the driver seq-rank; above that cap this
    becomes a join on (fingerprint, seq)). Returns (kept, n_dups)."""
    import pyarrow.compute as pc

    from rendler_ray.state.seen import drain_winners, offer_batch

    fp = fetched.map_batches(_content_fp_batch,
                             batch_format="pyarrow").materialize()

    def offer(t: pa.Table) -> pa.Table:
        return offer_batch(t.filter(pc.equal(t["status"], 200)),
                           shards=shards, key_column="seq",
                           url_column="fingerprint", depth_column=None)

    fp.map_batches(offer, batch_format="pyarrow").materialize()
    winner_refs = drain_winners(shards, "int64")
    packs = pa.concat_tables(ray.get(
        [_packed_fp_keys.remote(r) for r in winner_refs]))
    winners_ref = ray.put(packs["k"].combine_chunks())

    def keep(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            t["fingerprint"], pc.cast(t["seq"], pa.string()), ":")
        mask = pc.or_(pc.not_equal(t["status"], 200),
                      pc.is_in(key, value_set=ray.get(winners_ref)))
        return t.filter(mask).drop_columns(["fingerprint"])

    kept = fp.map_batches(keep, batch_format="pyarrow").materialize()
    return kept, fetched.count() - kept.count()


# checkpoint I/O lives behind the storage seam (parquet now, lance when
# the wheel exists — rendler_ray/storage.py)
from rendler_ray.storage import (  # noqa: E402
    read_manifest as _read_manifest,
    read_table as _read_round,
    write_manifest as _write_manifest,
    write_table as _write_round,
)


def crawl(cfg: CrawlConfig, resume: bool = False) -> CrawlResult:
    """Run the crawl to fixpoint / budget. ``resume=True`` with an
    ``out_dir`` continues from the last completed round's checkpoint."""
    seen_shards = make_seen_shards(cfg.num_seen_shards, cfg.seen_mode,
                                   cfg.seen_capacity_per_shard)
    if cfg.web is not None:
        web_shards = cfg.web
    elif cfg.stage_mode == "actors":
        web_shards = make_web_shards(cfg.docs_path, cfg.num_web_shards)
    else:
        web_shards = make_web_blobs(cfg.docs_path, cfg.num_web_shards)
    policies = build_policies(cfg.robots, cfg.politeness_window_ms,
                              cfg.host_budget_per_round)
    policies_ref = ray.put(policies)
    # the dict handed to the budget gate each round: the cumulative
    # driver dict by default, ONE ROUND's gathered policies in the
    # sharded-store mode (never cumulative on the driver)
    gate_policies = policies
    politeness_on = (bool(policies) or cfg.host_budget_per_round is not None
                     or cfg.auto_robots)
    robots_known: set[str] = set(policies)
    host_ledger = None
    policy_shards = None
    # None → sharded store by default under auto_robots (4 shards);
    # 0 is the explicit driver-set opt-out
    ledger_shards = (4 if cfg.host_ledger_shards is None
                     else cfg.host_ledger_shards)
    if cfg.auto_robots and ledger_shards > 0:
        # sharded known-host ledger + policy store: same actor infra as
        # the URL-seen set, keyed by host — the driver only ever sees
        # one round's distinct hosts (and their policies), never the
        # cumulative ledger or the cumulative parsed-policy dict
        from rendler_ray.state.politeness import (
            make_policy_shards,
            policy_get,
            policy_put,
        )

        host_ledger = make_seen_shards(ledger_shards, "exact")
        policy_shards = make_policy_shards(ledger_shards)
        if policies:
            seen_check_and_add(host_ledger, sorted(policies))
            policy_put(policy_shards, policies)

    content_shards = (make_seen_shards(cfg.content_dedup_shards, "exact")
                      if cfg.content_dedup else None)
    content_dups_total = 0

    prio_scores = None
    if cfg.priority_scores is not None and cfg.priority_per_round is not None:
        from rendler_ray.stages.prioritize import load_scores

        prio_scores = load_scores(cfg.priority_scores).materialize()

    enrich_kwargs: dict = {}
    if cfg.enrich and cfg.enrich_bpe_merges:
        import pyarrow.parquet as _pq

        mt = _pq.read_table(cfg.enrich_bpe_merges,
                            columns=["left", "right"])
        enrich_kwargs["bpe_merges_ref"] = ray.put(
            list(zip(mt["left"].to_pylist(), mt["right"].to_pylist())))

    fp_shards = None
    unchanged_urls_rounds: list = []
    if cfg.recrawl_prior_dir:
        from rendler_ray.state.fpstore import fp_put, make_fp_shards

        fp_shards = make_fp_shards(cfg.recrawl_fp_shards)
        rr = 0
        while True:
            p = os.path.join(cfg.recrawl_prior_dir, f"round={rr}",
                             "fetch.parquet")
            if not os.path.exists(p):
                break
            prior = _read_round(p, FETCH_SCHEMA)
            for b in (prior.map_batches(_content_fp_batch,
                                        batch_format="pyarrow")
                      .iter_batches(batch_size=65536,
                                    batch_format="pyarrow")):
                import pyarrow.compute as pc
                ok = b.filter(pc.equal(b["status"], 200))
                fp_put(fp_shards, ok["url"].to_pylist(),
                       ok["fingerprint"].to_pylist())
            rr += 1

    manifest = _read_manifest(cfg.out_dir) if (resume and cfg.out_dir) else None
    if manifest:
        r0 = manifest["round"] + 1
        total_seq = manifest["total_seq"]
        pages_fetched = manifest["pages_fetched"]
        # Rebuild the seen set. Fast path: per-shard snapshots written at
        # the last completed round (parallel actor-side restore). Fallback
        # (older checkpoints / shard-count change): replay the frontier
        # snapshots — every seen URL is a frontier row of some round,
        # INCLUDING round r0 itself (discovered and marked seen at the end
        # of round r0-1, before the crash point).
        restored = False
        if (manifest.get("seen_snapshot_round") == manifest["round"]
                and manifest.get("num_seen_shards") == cfg.num_seen_shards):
            oks = ray.get([
                s.load_from.remote(os.path.join(
                    cfg.out_dir, "seen", f"shard={i}.pkl"),
                    manifest["round"])
                for i, s in enumerate(seen_shards)
            ])
            restored = all(oks)
        if not restored:
            for rr in range(r0 + 1):
                fp = os.path.join(cfg.out_dir, f"round={rr}",
                                  "frontier.parquet")
                if not os.path.exists(fp):
                    continue
                snap = _read_round(fp, FRONTIER_SCHEMA)
                for b in snap.iter_batches(batch_size=65536,
                                           batch_format="pyarrow"):
                    seen_check_and_add(seen_shards,
                                       b["canon_url"].to_pylist())
        fnext = os.path.join(cfg.out_dir, f"round={r0}", "frontier.parquet")
        frontier = (_read_round(fnext, FRONTIER_SCHEMA).materialize()
                    if os.path.exists(fnext) else None)

        def _rounds(name: str, schema: pa.Schema) -> list:
            return [
                _read_round(os.path.join(cfg.out_dir, f"round={rr}", name), schema)
                for rr in range(r0)
            ]

        per_round_fetched = _rounds("fetch.parquet", FETCH_SCHEMA)
        if content_shards is not None:
            # checkpointed fetch tables are already deduped, so their
            # fingerprints ARE the content-seen set at the crash point
            for dsr in per_round_fetched:
                for b in (dsr.map_batches(_content_fp_batch,
                                          batch_format="pyarrow")
                          .iter_batches(batch_size=65536,
                                        batch_format="pyarrow")):
                    import pyarrow.compute as pc
                    ok = b.filter(pc.equal(b["status"], 200))
                    seen_check_and_add(content_shards,
                                       ok["fingerprint"].to_pylist())
        per_round_edges = _rounds("edges.parquet", EDGES_SCHEMA)
        per_round_renders = _rounds("renders.parquet", RENDERS_SCHEMA)
        per_round_frontier = _rounds("frontier.parquet", FRONTIER_SCHEMA)
    else:
        seed_tbl = _seed_frontier(cfg)
        seen_check_and_add(seen_shards, seed_tbl["canon_url"].to_pylist())
        frontier = ray.data.from_arrow(seed_tbl).materialize()
        total_seq = seed_tbl.num_rows
        pages_fetched = 0
        r0 = 0
        per_round_fetched, per_round_edges = [], []
        per_round_renders, per_round_frontier = [], []

    deferred_rounds = 0
    pages_rendered = 0
    frontier_rows_total = 0
    round_lineage: list[dict] = (manifest or {}).get("rounds", [])
    r = r0
    while frontier is not None and r < cfg.max_rounds:
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
        frontier_rows_total += n_frontier
        # Log/checkpoint the FULL frontier before any budget truncation:
        # a discovered-but-never-fetched URL is still in the reference's
        # seen set (queued ⇒ seen), and resume rebuilds the seen set from
        # these snapshots.
        if cfg.out_dir:
            rdir = os.path.join(cfg.out_dir, f"round={r}")
            os.makedirs(rdir, exist_ok=True)
            _write_round(frontier, os.path.join(rdir, "frontier.parquet"))
        per_round_frontier.append(frontier)

        prio_deferred = None
        if prio_scores is not None:
            with _T(f"r{r} priority"):
                from rendler_ray.stages.prioritize import priority_gate

                frontier, prio_deferred = priority_gate(
                    frontier, prio_scores, cfg.priority_per_round,
                    cfg.priority_broadcast_max)
                if prio_deferred is not None:
                    prio_deferred = prio_deferred.materialize()

        if cfg.max_pages is not None:
            remaining = cfg.max_pages - pages_fetched
            if remaining <= 0:
                break
            if remaining < n_frontier:
                import pyarrow.compute as pc

                thr = frontier.sort("seq").limit(remaining).max("seq")
                frontier = frontier.map_batches(
                    lambda t, v=thr: t.filter(pc.less_equal(t["seq"], v)),
                    batch_format="pyarrow",
                ).materialize()

        admitted, deferred = frontier, None
        if cfg.auto_robots:
            with _T(f"r{r} robots"):
                import pyarrow.compute as pc

                # per-batch distinct combiner: the driver receives at
                # most (distinct hosts per batch) rows, not every
                # frontier row's host string
                uniq = frontier.select_columns(["host"]).map_batches(
                    lambda t: pa.table({"host": pc.unique(t["host"])}),
                    batch_format="pyarrow")
                hosts_round: set[str] = set()
                for b in uniq.iter_batches(batch_size=65536,
                                           batch_format="pyarrow"):
                    hosts_round.update(b["host"].to_pylist())
                if host_ledger is not None:
                    cand = sorted(hosts_round)
                    newmask = seen_check_and_add(host_ledger, cand)
                    new_hosts = [h for h, m in zip(cand, newmask) if m]
                else:
                    new_hosts = sorted(hosts_round - robots_known)
                    robots_known.update(new_hosts)
                new_pols: dict = {}
                if new_hosts:
                    rb = _frontier_from_urls(
                        [f"s://{h}/robots.txt" for h in new_hosts],
                        [0] * len(new_hosts), list(range(len(new_hosts))),
                        canon=False)
                    fetched_rb = (Fetcher(web_shards)(rb)
                                  if cfg.stage_mode == "actors"
                                  else fetch_batch(rb, shards=web_shards))
                    from rendler_ray.state.politeness import parse_robots
                    for host, status, spans in zip(
                            fetched_rb["host"].to_pylist(),
                            fetched_rb["status"].to_pylist(),
                            fetched_rb["spans"].to_pylist()):
                        if status != 200:
                            continue  # no robots.txt ⇒ allow-all
                        body = "\n".join(sp["text"] for sp in spans
                                          if sp["kind"] == "text")
                        pol = parse_robots(body, cfg.politeness_window_ms)
                        if pol.budget_per_round is None:
                            pol.budget_per_round = cfg.host_budget_per_round
                        new_pols[host] = pol
                if policy_shards is not None:
                    # sharded store: persist the delta, then gather ONLY
                    # this round's frontier hosts' policies — the
                    # broadcast is bounded by the round, not the crawl
                    if new_pols:
                        policy_put(policy_shards, new_pols)
                    gate_policies = policy_get(policy_shards,
                                               sorted(hosts_round))
                    policies_ref = ray.put(gate_policies)
                elif new_pols:
                    policies.update(new_pols)
                    policies_ref = ray.put(policies)
        if politeness_on:
            if cfg.stage_mode == "actors":
                admitted = admitted.map_batches(
                    RobotsFilter, fn_constructor_args=(policies_ref,),
                    batch_format="pyarrow", concurrency=2, num_cpus=0.25,
                )
            else:
                admitted = admitted.map_batches(
                    robots_filter_batch, fn_kwargs={"policies_ref": policies_ref},
                    batch_format="pyarrow",
                )
            admitted, deferred = budget_gate(
                admitted, gate_policies, cfg.host_budget_per_round,
                broadcast_max_hosts=cfg.budget_broadcast_max_hosts,
            )
            if deferred is not None:
                deferred = deferred.materialize()
        defers = [d for d in (prio_deferred, deferred)
                  if d is not None and d.count()]
        deferred_rounds += 1 if defers else 0

        with _T(f"r{r} fetch"):
            if cfg.stage_mode == "actors":
                fetched = admitted.map_batches(
                    Fetcher,
                    fn_constructor_kwargs={"shards": web_shards},
                    batch_format="pyarrow",
                    batch_size=cfg.batch_size,
                    concurrency=cfg.fetch_concurrency,
                    num_cpus=0.5,
                )
                if cfg.fetch_fail_rate:
                    fetched = fetched.map_batches(
                        inject_transient_failures,
                        fn_kwargs={"fail_rate": cfg.fetch_fail_rate,
                                   "fail_seed": cfg.fetch_fail_seed,
                                   "retries": cfg.fetch_retries},
                        batch_format="pyarrow", num_cpus=0.25,
                    )
                if cfg.enrich:
                    fetched = fetched.map_batches(
                        enrich_batch, fn_kwargs=enrich_kwargs,
                        batch_format="pyarrow",
                        batch_size=cfg.batch_size, num_cpus=1,
                    )
                fetched = fetched.materialize()
            else:
                # larger batches than the block size: fewer tasks amortize
                # the per-task shard-gather cost; num_cpus=1 avoids
                # oversubscribing memory bandwidth on the gather-heavy
                # path. Adaptive cap: a small round must still split into
                # >= ~2 tasks per CPU or every core past the task count
                # idles through the round — at a fixed 16384 a 20k-URL
                # round is 2 tasks, i.e. serial time on any cluster size
                # above 2 slots (measured: the round-3 scaling erosion).
                ncpus = int(ray.cluster_resources().get("CPU", 8))
                fetch_bs = int(min(max(cfg.batch_size, 16384),
                                   max(2048, -(-n_frontier // (2 * ncpus)))))
                fetched = admitted.map_batches(
                    fetch_batch,
                    fn_kwargs={"shards": web_shards},
                    batch_format="pyarrow",
                    batch_size=fetch_bs,
                    num_cpus=1,
                )
                if cfg.fetch_fail_rate:
                    fetched = fetched.map_batches(
                        inject_transient_failures,
                        fn_kwargs={"fail_rate": cfg.fetch_fail_rate,
                                   "fail_seed": cfg.fetch_fail_seed,
                                   "retries": cfg.fetch_retries},
                        batch_format="pyarrow", num_cpus=0.25,
                    )
                if cfg.enrich:
                    # fused into the fetch pass (Ray Data operator fusion)
                    fetched = fetched.map_batches(
                        enrich_batch, fn_kwargs=enrich_kwargs,
                        batch_format="pyarrow",
                        batch_size=fetch_bs, num_cpus=1,
                    )
                fetched = fetched.materialize()
        if os.environ.get("RENDLER_CRAWL_STATS"):
            import re as _re
            s = fetched.stats()
            m = _re.findall(r"(\d+) tasks executed, (\d+) blocks produced in ([\d.]+)s", s)
            print(f"[crawl-stats] r{r} fetch ops: {m}", flush=True)
        pages_fetched += fetched.count()
        n_content_dups = 0
        if content_shards is not None:
            with _T(f"r{r} content-dedup"):
                fetched, n_content_dups = _content_dedup_round(
                    fetched, content_shards)
                content_dups_total += n_content_dups
        per_round_fetched.append(fetched)

        to_render = fetched
        if fp_shards is not None:
            with _T(f"r{r} recrawl-diff"):
                import pyarrow.compute as pc

                from rendler_ray.state.fpstore import prior_fp_lookup_batch

                fpt = (fetched.map_batches(_content_fp_batch,
                                           batch_format="pyarrow")
                       .map_batches(prior_fp_lookup_batch,
                                    fn_kwargs={"shards": fp_shards},
                                    batch_format="pyarrow")).materialize()

                def _split_changed(keep_changed: bool):
                    def fn(t: pa.Table) -> pa.Table:
                        unchanged = pc.and_(
                            pc.equal(t["status"], 200),
                            pc.and_(pc.not_equal(t["prior_fp"], ""),
                                    pc.equal(t["fingerprint"],
                                             t["prior_fp"])))
                        mask = (pc.invert(unchanged) if keep_changed
                                else unchanged)
                        return t.filter(mask).drop_columns(
                            ["fingerprint", "prior_fp"])
                    return fn

                to_render = fpt.map_batches(
                    _split_changed(True), batch_format="pyarrow"
                ).materialize()
                unch = fpt.map_batches(
                    _split_changed(False), batch_format="pyarrow"
                ).select_columns(["url"]).materialize()
                if unch.count():
                    unchanged_urls_rounds.append(unch)

        with _T(f"r{r} render"):
            if cfg.stage_mode == "actors":
                renders = to_render.map_batches(
                    Renderer,
                    fn_constructor_kwargs={"round_no": r},
                    batch_format="pyarrow",
                    batch_size=cfg.batch_size,
                    concurrency=cfg.render_concurrency,
                    num_cpus=0.5,
                ).materialize()
            else:
                renders = to_render.map_batches(
                    render_batch,
                    fn_kwargs={"round_no": r},
                    batch_format="pyarrow",
                    # same adaptive sizing as fetch: small rounds must
                    # still fan out across the cluster
                    batch_size=fetch_bs,
                    num_cpus=1,
                ).materialize()
        pages_rendered += renders.count()
        per_round_renders.append(renders)

        with _T(f"r{r} extract"):
            edges = fetched.map_batches(
                extract_edges, batch_format="pyarrow", batch_size=cfg.batch_size
            ).materialize()
        per_round_edges.append(edges)

        if cfg.out_dir:
            _write_round(fetched, os.path.join(rdir, "fetch.parquet"))
            _write_round(renders, os.path.join(rdir, "renders.parquet"))
            _write_round(edges, os.path.join(rdir, "edges.parquet"))
            # swap the in-memory handles for lazy read-backs: at 10^10
            # scale the crawl must NOT pin every round's blocks in the
            # object store — checkpointed rounds stream from storage
            per_round_fetched[-1] = _read_round(
                os.path.join(rdir, "fetch.parquet"), FETCH_SCHEMA)
            per_round_renders[-1] = _read_round(
                os.path.join(rdir, "renders.parquet"), RENDERS_SCHEMA)
            per_round_edges[-1] = _read_round(
                os.path.join(rdir, "edges.parquet"), EDGES_SCHEMA)
            per_round_frontier[-1] = _read_round(
                os.path.join(rdir, "frontier.parquet"), FRONTIER_SCHEMA)
        # per-round lineage/metrics (north_rule): inputs → outputs with
        # row counts, appended to the manifest each round
        round_lineage.append({
            "round": r,
            "frontier_rows": n_frontier,
            "pages_fetched": fetched.count(),
            "renders": renders.count(),
            "edges": edges.count(),
            "outputs": ([f"round={r}/{n}.parquet"
                         for n in ("frontier", "fetch", "renders", "edges")]
                        if cfg.out_dir else []),
        })

        with _T(f"r{r} dedup+seen"):
            from rendler_ray.state.seen import drain_winners, offer_batch

            # First-discoverer dedup + seen check, fused into the sharded
            # seen actors: candidates hash-route to their shard, each
            # shard keeps the running min(order_key) per unseen URL
            # (commutative ⇒ deterministic under any batch order/retry),
            # and an end-of-round drain admits winners to the seen set.
            # This replaces a per-round groupby all-to-all with the one
            # hash partition the seen check already needs.
            fast = not cfg.canonicalize and not politeness_on
            if fast:
                candidates = edges.map_batches(
                    _candidates_fast,
                    fn_kwargs={"max_depth": cfg.max_depth},
                    batch_format="pyarrow",
                )
                offer_kwargs = {"shards": seen_shards,
                                "key_column": "order_key",
                                "depth_column": "depth"}
                key_type = "int64"
            else:
                candidates = edges.map_batches(
                    _candidates,
                    fn_kwargs={"canon": cfg.canonicalize,
                               "max_depth": cfg.max_depth},
                    batch_format="pyarrow",
                )
                offer_kwargs = {"shards": seen_shards,
                                "key_column": "pack",
                                "depth_column": None}
                key_type = "string"
            candidates.map_batches(
                offer_batch, fn_kwargs=offer_kwargs, batch_format="pyarrow",
            ).materialize()  # barrier: all offers land before the drain
            n_new = sum(ray.get(
                [s.pending_count.remote() for s in seen_shards]))
            winner_refs = (drain_winners(seen_shards, key_type)
                           if n_new else [])
            if n_new > _DRIVER_RANK_MAX:
                unseen = ray.data.from_arrow_refs(winner_refs).map_batches(
                    _finish_winners_fast if fast else _unpack_winners,
                    batch_format="pyarrow",
                )  # lazy: fuses into with_row_seq's sort below
            else:
                unseen = None
        if n_new:
            with _T(f"r{r} seq+frontier"):
                if n_new <= _DRIVER_RANK_MAX:
                    next_frontier = _number_winners(
                        winner_refs, fast, total_seq, n_new)
                else:
                    numbered = with_row_seq(unseen, ["order_key"],
                                            start=total_seq)
                    next_frontier = numbered.select_columns(
                        ["url", "canon_url", "host", "depth", "seq"]
                    )
                total_seq += n_new
                if defers:
                    next_frontier = next_frontier.union(
                        *defers).materialize()
                elif n_new > _DRIVER_RANK_MAX:
                    next_frontier = next_frontier.materialize()
                # driver-rank path: blocks are already computed refs —
                # from_arrow_refs needs no extra materialize
        else:
            if len(defers) > 1:
                next_frontier = defers[0].union(*defers[1:]).materialize()
            else:
                next_frontier = defers[0] if defers else None
        round_lineage[-1]["new_urls"] = n_new
        round_lineage[-1]["deferred"] = sum(d.count() for d in defers)
        if content_shards is not None:
            round_lineage[-1]["content_dups"] = n_content_dups

        if cfg.out_dir:
            # next round's frontier lands BEFORE the manifest commit: a
            # crash in between leaves a stale (overwritten-on-redo)
            # frontier file, never a manifest pointing at a missing one
            if next_frontier is not None:
                ndir = os.path.join(cfg.out_dir, f"round={r + 1}")
                os.makedirs(ndir, exist_ok=True)
                _write_round(next_frontier,
                             os.path.join(ndir, "frontier.parquet"))
            # parallel actor-side seen snapshots: resume restores these in
            # one shot instead of replaying every frontier file (O(shard)
            # I/O, driver never holds seen state)
            ray.get([
                s.save_to.remote(os.path.join(
                    cfg.out_dir, "seen", f"shard={i}.pkl"), r)
                for i, s in enumerate(seen_shards)
            ])
            _write_manifest(cfg.out_dir, {
                "round": r, "total_seq": total_seq,
                "pages_fetched": pages_fetched,
                "seen_stats": ray.get(
                    [s.stats.remote() for s in seen_shards]),
                "seen_snapshot_round": r,
                "num_seen_shards": cfg.num_seen_shards,
                "rounds": round_lineage,
                "config": {"seeds": cfg.seeds, "max_depth": cfg.max_depth,
                           "max_pages": cfg.max_pages,
                           "canonicalize": cfg.canonicalize},
                "per_round_pages": [x["pages_fetched"]
                                    for x in round_lineage],
            })

        frontier = next_frontier
        r += 1

    renders_reused = 0
    if fp_shards is not None and unchanged_urls_rounds:
        # attach the PRIOR run's render artifacts for unchanged pages: a
        # broadcast semi-join on url (the unchanged set is bounded by the
        # crawl's own size — swap for a hash join past the broadcast cap)
        import pyarrow.compute as pc

        uarr = pa.concat_tables([
            pa.table({"url": b["url"]})
            for d in unchanged_urls_rounds
            for b in d.iter_batches(batch_size=None, batch_format="pyarrow")
        ])["url"].combine_chunks()
        uref = ray.put(uarr)

        def keep_unchanged(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["doc_id"], value_set=ray.get(uref)))

        rr = 0
        prior_rounds = []
        while True:
            p = os.path.join(cfg.recrawl_prior_dir, f"round={rr}",
                             "renders.parquet")
            if not os.path.exists(p):
                break
            prior_rounds.append(_read_round(p, RENDERS_SCHEMA))
            rr += 1
        if prior_rounds:
            reused = prior_rounds[0]
            for d in prior_rounds[1:]:
                reused = reused.union(d)
            reused = reused.map_batches(keep_unchanged,
                                        batch_format="pyarrow").materialize()
            renders_reused = reused.count()
            if renders_reused:
                per_round_renders.append(reused)

    seen_stats = ray.get([s.stats.remote() for s in seen_shards])
    seen_count = sum(st["count"] for st in seen_stats)

    def _union(lst, empty_schema_src):
        lst = [d for d in lst if d is not None and d.count() > 0]
        if not lst:
            return ray.data.from_arrow(empty_schema_src.empty_table())
        out = lst[0]
        for d in lst[1:]:
            out = out.union(d)
        return out

    return CrawlResult(
        fetched=_union(per_round_fetched, FETCH_SCHEMA),
        edges=_union(per_round_edges, EDGES_SCHEMA),
        renders=_union(per_round_renders, RENDERS_SCHEMA),
        frontier_log=_union(per_round_frontier, FRONTIER_SCHEMA),
        pages_fetched=pages_fetched,
        rounds=r - r0,
        seen_count=seen_count,
        deferred_rounds=deferred_rounds,
        stats={"pages_rendered": pages_rendered,
               "frontier_rows": frontier_rows_total,
               "seen_shards": seen_stats,
               "content_dups": content_dups_total,
               "renders_reused": renders_reused,
               "spilled_mb": _object_store_spilled_mb()},
    )


def _object_store_spilled_mb() -> float | None:
    """Best-effort object-store spill counter (MiB) — recorded in crawl
    stats so a memory-capped run can prove it STREAMED (spilled and
    completed) rather than pinned the whole crawl in plasma
    (bench.py --memory; BASELINE.md). Read from the raylet log's
    cumulative "Spilled N MiB" lines (the grpc-backed memory_summary
    API needs the absent grpc wheel in this sandbox); the max across
    lines is the running total at its latest report."""
    try:
        import glob
        import re

        import ray

        node = ray._private.worker._global_node
        if node is None:
            return None
        spilled = 0.0
        logdir = os.path.join(node.get_session_dir_path(), "logs")
        for f in glob.glob(os.path.join(logdir, "raylet*.out")):
            with open(f, errors="replace") as fh:
                for m in re.finditer(r"Spilled (\d+) MiB", fh.read()):
                    spilled = max(spilled, float(m.group(1)))
        return spilled
    except Exception:  # noqa: BLE001 — telemetry only, never fail a crawl
        return None
