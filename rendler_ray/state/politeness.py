"""Per-host politeness: robots.txt verdicts + per-round fetch budgets.

The reference has NO politeness — it hammers hosts as fast as offers
arrive (SURVEY.md §4.1 "skew: unhandled"). BASELINE.json's north_rule
mandates robots.txt awareness and crawl-delay budgets, so this module
adds them as an explicitly OFF-in-conformance-mode gate (SURVEY.md §2.3
T2, §2.5 A4).

Model: a crawl round represents one politeness window. A host's budget
for the window is ``window_ms / crawl_delay_ms`` (its token-bucket refill
over the round), and URLs over budget are DEFERRED — they stay in the
frontier, keeping their original discovery ``seq``, and are admitted in
later rounds in seq order. This per-host cap is also the skew rebalance:
a hub host with 10^6 frontier URLs trickles through bounded windows
instead of flooding one partition.

The budget is enforced with a deterministic two-phase threshold
computation instead of mutable token-bucket actors so results are
reproducible under retries and independent of batch arrival order:
  1. per-batch partial top-B per host (vectorized pandas) — only
     candidate winners survive, bounding the shuffle;
  2. ``groupby(host)`` over the partials → the B-th smallest seq per
     host (the admission threshold);
  3. broadcast thresholds (``ray.put``) and filter the frontier.
At 10^8+ distinct hosts step 3 becomes a hash join on host instead of a
broadcast dict; the sandbox uses the broadcast path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


@dataclass
class HostPolicy:
    disallow: list[str] = field(default_factory=list)  # path prefixes
    allow: list[str] = field(default_factory=list)     # path prefixes
    allow_all: bool = True
    budget_per_round: int | None = None  # None = unlimited


def parse_robots(robots_txt: str, window_ms: int = 60_000,
                 default_delay_ms: int | None = None) -> HostPolicy:
    """Minimal robots.txt subset: ``User-agent: *`` sections with
    ``Disallow:``/``Allow:`` path prefixes (longest-match wins, the
    Google/REP rule) and ``Crawl-delay:`` seconds."""
    pol = HostPolicy()
    applies = False
    delay_ms = default_delay_ms
    for raw in robots_txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            applies = val == "*"
        elif applies and key == "disallow":
            if val == "/":
                pol.allow_all = False
            elif val:
                pol.disallow.append(val)
        elif applies and key == "allow":
            if val:
                pol.allow.append(val)
        elif applies and key == "crawl-delay":
            try:
                delay_ms = int(float(val) * 1000)
            except ValueError:
                pass
    if delay_ms:
        pol.budget_per_round = max(1, window_ms // delay_ms)
    return pol


def build_policies(robots: dict[str, str] | None, window_ms: int = 60_000,
                   default_budget: int | None = None) -> dict[str, HostPolicy]:
    out: dict[str, HostPolicy] = {}
    for host, txt in (robots or {}).items():
        out[host] = parse_robots(txt, window_ms=window_ms)
        if out[host].budget_per_round is None:
            out[host].budget_per_round = default_budget
    return out


def path_allowed(url: str, pol: HostPolicy) -> bool:
    """Longest-match rule (REP/Google): the most specific matching
    prefix among Disallow ∪ Allow decides; an Allow can carve an
    exception out of a broader Disallow (``Disallow: /`` remains a
    full-host block)."""
    if not pol.allow_all:
        return False
    if not pol.disallow:
        return True
    i = url.find("://")
    path = "/"
    if i >= 0:
        j = url.find("/", i + 3)
        if j >= 0:
            path = url[j:]
    dis = max((len(p) for p in pol.disallow if path.startswith(p)),
              default=-1)
    if dis < 0:
        return True
    alw = max((len(p) for p in pol.allow if path.startswith(p)),
              default=-1)
    return alw >= dis


class RobotsFilter:
    """``map_batches`` callable: drop robots-disallowed frontier rows.
    Policies arrive as a broadcast ``ray.put`` ref, fetched once per
    actor/worker, not re-shipped per batch."""

    def __init__(self, policies_ref):
        self.policies: dict[str, HostPolicy] = ray.get(policies_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.policies or batch.num_rows == 0:
            return batch
        hosts = batch["host"].to_numpy(zero_copy_only=False)
        urls = batch["url"].to_numpy(zero_copy_only=False)
        keep = np.ones(batch.num_rows, dtype=bool)
        for i, (h, u) in enumerate(zip(hosts, urls)):
            pol = self.policies.get(h)
            if pol is not None and not path_allowed(u, pol):
                keep[i] = False
        return batch.filter(pa.array(keep))


def robots_filter_batch(batch: pa.Table, *, policies_ref) -> pa.Table:
    """Task-pool form of :class:`RobotsFilter` (broadcast ref resolved
    from local plasma per task — zero-copy, not re-shipped)."""
    return RobotsFilter(policies_ref)(batch)


@ray.remote(num_cpus=0.1)
class PolicyShard:
    """One shard of the parsed-robots policy store for auto-robots
    crawls at the 10^8-hosts design point: parsed ``HostPolicy`` objects
    live host-hash-partitioned in these actors (alongside the sharded
    known-host ledger), so the DRIVER never holds the cumulative
    policy dict and never re-broadcasts it per round — each round it
    gathers only the policies for THAT round's distinct frontier hosts
    and ``ray.put``s that bounded dict."""

    def __init__(self):
        self.pols: dict[str, HostPolicy] = {}

    def put(self, items: dict) -> int:
        self.pols.update(items)
        return len(self.pols)

    def get(self, hosts: list[str]) -> dict:
        return {h: self.pols[h] for h in hosts if h in self.pols}


def make_policy_shards(n: int) -> list:
    return [PolicyShard.remote() for _ in range(n)]


def _by_shard(hosts, n_shards: int):
    from rendler_ray.functions.canon import url_hash_shard

    ha = np.array(sorted(hosts), dtype=object)
    return ha, url_hash_shard(ha, n_shards)


def policy_put(shards: list, pols: dict) -> None:
    if not pols:
        return
    ha, sh = _by_shard(list(pols), len(shards))
    ray.get([s.put.remote({h: pols[h] for h in ha[sh == i]})
             for i, s in enumerate(shards) if (sh == i).any()])


def policy_get(shards: list, hosts) -> dict:
    """Gather policies for (one round's distinct) hosts — the only
    policy state that ever reaches the driver."""
    if not len(hosts):
        return {}
    ha, sh = _by_shard(hosts, len(shards))
    out: dict = {}
    for d in ray.get([s.get.remote(list(ha[sh == i]))
                      for i, s in enumerate(shards)]):
        out.update(d)
    return out


def budget_gate(frontier, policies: dict[str, HostPolicy],
                default_budget: int | None,
                broadcast_max_hosts: int = 200_000):
    """Split a frontier dataset into (admitted, deferred) by per-host
    budgets. Returns (frontier, None) when no host is budget-limited.

    The per-host threshold table is broadcast (``ray.put`` dict) while it
    has ≤ ``broadcast_max_hosts`` rows; above that it stays a Dataset
    and the gate becomes a hash join on ``host`` (identical output —
    every frontier host has a threshold row by construction)."""
    budgets = {h: p.budget_per_round for h, p in policies.items()
               if p.budget_per_round is not None}
    if default_budget is None and not budgets:
        return frontier, None
    b_max = max([default_budget or 0, *budgets.values()]) or 1

    def partial_top(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.sort_values("seq").groupby("host", sort=False).head(b_max)
            [["host", "seq"]]
        )

    def threshold(g: pd.DataFrame) -> pd.DataFrame:
        host = g["host"].iloc[0]
        b = budgets.get(host, default_budget)
        # candidates ≥ min(b, total_rows_for_host): fewer than b candidates
        # proves the host is under budget; exactly b means the b-th
        # smallest candidate IS the global b-th smallest (each of the b
        # smallest rows survives its batch partial).
        if b is None or len(g) < b:
            thr = np.iinfo(np.int64).max
        else:
            thr = int(np.partition(g["seq"].to_numpy(), b - 1)[b - 1])
        return pd.DataFrame({"host": [host], "thr": [thr]})

    thr_ds = (
        frontier.map_batches(partial_top, batch_format="pandas")
        .groupby("host")
        .map_groups(threshold, batch_format="pandas")
    ).materialize()
    if thr_ds.count() > broadcast_max_hosts:
        return _budget_gate_join(frontier, thr_ds)
    thr_map = {r["host"]: r["thr"] for r in thr_ds.take_all()}
    thr_ref = ray.put(thr_map)

    def _split(admit: bool):
        def fn(batch: pa.Table) -> pa.Table:
            tm = ray.get(thr_ref)
            hosts = batch["host"].to_numpy(zero_copy_only=False)
            seqs = batch["seq"].to_numpy(zero_copy_only=False)
            imax = np.iinfo(np.int64).max
            thr = np.fromiter((tm.get(h, imax) for h in hosts),
                              dtype=np.int64, count=len(hosts))
            mask = seqs <= thr
            return batch.filter(pa.array(mask if admit else ~mask))
        return fn

    return (
        frontier.map_batches(_split(True), batch_format="pyarrow"),
        frontier.map_batches(_split(False), batch_format="pyarrow"),
    )


@ray.remote
def _block_to_arrow(b) -> pa.Table:
    if isinstance(b, pa.Table):
        return b
    return pa.Table.from_pandas(b, preserve_index=False)


def _nonempty_blocks(materialized):
    """Rebuild a MATERIALIZED dataset from its non-empty blocks only
    (converted to Arrow). Ray's hash join / pandas map_groups emit
    zero-row COLUMNLESS placeholder blocks for empty partitions;
    map_batches skips empty blocks (so a normalizing map can't fix
    them), and a later hash shuffle chokes when a partition is built
    purely from colless shards. Metadata-only driver work."""
    refs = [
        _block_to_arrow.remote(ref)
        for bundle in materialized.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows
    ]
    if not refs:
        return None
    return ray.data.from_arrow_refs(refs)


def _budget_gate_join(frontier, thr_ds):
    """Join form of the budget gate for host counts past the broadcast
    ceiling: frontier ⋈ thresholds on host (inner — every frontier host
    has a threshold row), then a vectorized seq<=thr split. The joined
    table is materialized once and both splits stream from it."""
    import pyarrow.compute as pc

    thr_clean = _nonempty_blocks(thr_ds)
    if thr_clean is None:
        return frontier, None  # no threshold rows at all
    front_clean = _nonempty_blocks(frontier.materialize())
    if front_clean is None:
        return frontier, None  # empty frontier: nothing to gate
    cols = ["url", "canon_url", "host", "depth", "seq"]
    joined = front_clean.join(
        thr_clean, join_type="inner", num_partitions=8, on=("host",)
    ).materialize()
    joined = _nonempty_blocks(joined)
    if joined is None:  # inner join can't drop rows here, but be safe
        return frontier, None

    def _split(admit: bool):
        def fn(batch: pa.Table) -> pa.Table:
            mask = pc.less_equal(batch["seq"], batch["thr"])
            if not admit:
                mask = pc.invert(mask)
            return batch.filter(mask).select(cols)
        return fn

    return (
        joined.map_batches(_split(True), batch_format="pyarrow"),
        joined.map_batches(_split(False), batch_format="pyarrow"),
    )
