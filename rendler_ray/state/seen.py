"""Sharded URL-seen set: the distributed replacement for the reference's
single in-memory ``processedURLs`` set (``python/rendler.py::frameworkMessage``,
SURVEY.md §2.3 T1).

``N`` Ray actors each own the keys with ``stable_hash64(url) % N == shard``.
``check_and_add`` is idempotent (set semantics), which is what makes the
crawl safe under Ray task retries. Two modes:

  * ``exact`` — a Python set per shard; bit-identical to the reference's
    raw-string membership semantics. Used by all conformance tests.
  * ``cuckoo`` — a 16-bit-fingerprint cuckoo filter per shard (~2 B/key):
    the 10^10-key design point is ~20 GB of filter, hence sharding is
    mandatory (≥16 shards × ~1.3 GB; SURVEY.md §4.2).

Routing: a batch is split by stable URL hash, one RPC per shard. The
shards ALSO own per-round first-discoverer dedup (``offer``/``drain``):
each shard keeps the running min(order_key) per unseen URL — a
commutative, idempotent reduce, so concurrent batches and Ray task
retries cannot change the outcome. This replaces a per-round groupby
all-to-all with the one hash partition the seen check already needs.
``SeenFilter``/``check_and_add`` remain for direct filter-style use
(seed marking, resume replay, tests).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray

from rendler_ray.functions.canon import url_hash_shard
from rendler_ray.state.cuckoo import CuckooFilter


@ray.remote
class SeenShard:
    """One shard of the URL-seen set."""

    def __init__(self, shard_id: int, num_shards: int, mode: str = "exact",
                 capacity_per_shard: int = 1 << 20):
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.mode = mode
        # round-local first-discoverer state: url -> (min key, its depth)
        self._pending: dict[str, tuple] = {}
        if mode == "exact":
            self._set: set[str] = set()
        elif mode == "cuckoo":
            self._filter = CuckooFilter(capacity_per_shard, seed=1234 + shard_id)
        else:
            raise ValueError(f"unknown seen mode: {mode}")

    def check_and_add(self, urls: list[str]) -> np.ndarray:
        """True where the URL was new; the URL is now marked seen."""
        if self.mode == "exact":
            out = np.zeros(len(urls), dtype=bool)
            s = self._set
            for i, u in enumerate(urls):
                if u not in s:
                    s.add(u)
                    out[i] = True
            return out
        return self._filter.check_and_add_many(urls)

    def contains(self, urls: list[str]) -> np.ndarray:
        if self.mode == "exact":
            s = self._set
            return np.fromiter((u in s for u in urls), dtype=bool, count=len(urls))
        return self._filter.contains_many(urls)

    def offer(self, urls: list[str], keys: list, depths=None) -> int:
        """Round-local first-discoverer offer: for each URL not already
        seen (prior rounds), keep the running MIN key (+ its depth).
        Min is commutative/idempotent, so the result is deterministic
        regardless of batch arrival order or Ray task retries. This fuses
        the per-round first-discoverer dedup INTO the seen shard —
        replacing a full groupby shuffle with the same hash routing the
        seen check already does."""
        import pandas as pd

        pend = self._pending
        # vectorized local reduce: one (min key, min depth) row per unique
        # URL in this RPC. Correct because within a round either depth is
        # uniform (fast mode) or depth rides inside the pack key (general
        # mode, depths all 0 here) — so min over both columns agrees with
        # "the min-key row".
        df = pd.DataFrame({"k": keys, "d": depths if depths is not None
                           else np.zeros(len(urls), np.int64)},
                          index=urls)
        g = df.groupby(level=0, sort=False).min()
        uu = g.index.to_numpy(dtype=object)
        if self.mode == "exact":
            s = self._set
            unseen = np.fromiter((u not in s for u in uu), dtype=bool,
                                 count=len(uu))
        else:
            unseen = ~self._filter.contains_many(list(uu))
        ks = g["k"].to_numpy()
        ds = g["d"].to_numpy()
        for i in np.flatnonzero(unseen):
            u = uu[i]
            k = ks[i]
            p = pend.get(u)
            if p is None or k < p[0]:
                pend[u] = (k, ds[i])
        return len(pend)

    def pending_count(self) -> int:
        return len(self._pending)

    def drain(self, key_type: str = "int64") -> pa.Table:
        """End of round: mark all pending winners seen and return them as
        one Arrow block (canon_url, key, depth) — consumed via
        ``ray.data.from_arrow_refs`` so winners never pass through the
        driver. ``key_type`` fixes the key column type so empty shards
        produce schema-compatible blocks."""
        pend = self._pending
        self._pending = {}
        urls = list(pend.keys())
        if self.mode == "exact":
            self._set.update(urls)
        elif urls:
            self._filter.check_and_add_many(urls)
        keys = [pend[u][0] for u in urls]
        depths = [pend[u][1] for u in urls]
        kt = pa.int64() if key_type == "int64" else pa.string()
        return pa.table({
            "canon_url": pa.array(urls, pa.string()),
            "key": pa.array(keys, kt),
            "depth": pa.array(depths, pa.int32()),
        })

    def count(self) -> int:
        return len(self._set) if self.mode == "exact" else self._filter.count

    def stats(self) -> dict:
        """Occupancy / false-positive telemetry for the manifest. A
        cuckoo false positive means a URL wrongly considered seen (never
        crawled), so the estimated FPR is the crawl's miss-rate bound."""
        if self.mode == "exact":
            return {"mode": "exact", "count": len(self._set)}
        f = self._filter
        slots = f.num_buckets * 4
        load = f.count / slots
        return {
            "mode": "cuckoo",
            "count": f.count,
            "num_buckets": f.num_buckets,
            "load": round(load, 6),
            "kicked_out": f.kicked_out,
            # Fan'14 §5: FPR ≈ 1-(1-2^-16)^(2·4·load) ≈ 8·load/2^16
            "fpr_estimate": 8.0 * load / 65536.0,
        }

    def snapshot(self):
        """Checkpointable state (SURVEY.md §4.2 resume)."""
        if self.mode == "exact":
            return {"mode": "exact", "urls": sorted(self._set)}
        return {"mode": "cuckoo", **self._filter.snapshot()}

    def restore(self, snap) -> None:
        if snap["mode"] == "exact":
            self._set = set(snap["urls"])
        else:
            self._filter.restore(snap)

    def save_to(self, path: str, round_no: int = -1) -> int:
        """Actor-side snapshot write (atomic rename) — the N shards
        persist in parallel, the driver never holds seen-set state.
        The round number is stamped INSIDE the file: a crash between
        snapshot saves and the manifest write must not let resume restore
        state from a round ahead of the manifest."""
        import pickle

        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump({"round": round_no, "snap": self.snapshot()}, f,
                        protocol=5)
        os.replace(tmp, path)
        return self.count()

    def load_from(self, path: str, expected_round: int = -1) -> bool:
        """Actor-side snapshot restore; False if missing or stamped with
        a different round than the manifest committed."""
        import pickle

        if not os.path.exists(path):
            return False
        with open(path, "rb") as f:
            payload = pickle.load(f)
        if payload.get("round") != expected_round:
            return False
        self.restore(payload["snap"])
        return True


def make_seen_shards(num_shards: int, mode: str = "exact",
                     capacity_per_shard: int = 1 << 20) -> list:
    """Spawn the shard actors. ``num_cpus=0``: shards are memory-bound
    lookup services — reserving scheduler slots for them starves the
    fetch/render task pools on small clusters (16 shards at 0.1 cpu ate
    40% of a 4-cpu node). On a multi-node cluster they spread via the
    default SPREAD scheduling of actors."""
    return [
        SeenShard.options(num_cpus=0).remote(i, num_shards, mode,
                                             capacity_per_shard)
        for i in range(num_shards)
    ]


def seen_check_and_add(shards: list, urls: list[str]) -> np.ndarray:
    """Route a URL list to its shards; returns the new-mask in input order."""
    n = len(urls)
    if n == 0:
        return np.zeros(0, dtype=bool)
    urls = np.asarray(urls, dtype=object)
    sh = url_hash_shard(urls, len(shards))
    mask = np.zeros(n, dtype=bool)
    futs = []
    for k in np.unique(sh):
        sel = np.flatnonzero(sh == k)
        futs.append((sel, shards[int(k)].check_and_add.remote(urls[sel].tolist())))
    for sel, f in futs:
        mask[sel] = ray.get(f)
    return mask


def offer_batch(batch: pa.Table, *, shards: list, key_column: str,
                url_column: str = "canon_url",
                depth_column: str | None = "depth") -> pa.Table:
    """Route a candidates batch to its seen shards' ``offer`` (the fused
    first-discoverer + seen check). Returns a 1-row ack so the map stage
    has output; the real results are drained from the shards at end of
    round."""
    n = batch.num_rows
    if n:
        urls = batch[url_column].to_numpy(zero_copy_only=False)
        keys = batch[key_column].to_numpy(zero_copy_only=False)
        depths = (batch[depth_column].to_numpy(zero_copy_only=False)
                  if depth_column is not None else None)
        sh = url_hash_shard(urls, len(shards))
        futs = []
        for k in np.unique(sh):
            sel = np.flatnonzero(sh == k)
            futs.append(shards[int(k)].offer.remote(
                urls[sel].tolist(), keys[sel].tolist(),
                depths[sel].tolist() if depths is not None else None))
        ray.get(futs)  # barrier: offers land before the stage completes
    return pa.table({"offered": pa.array([n], pa.int64())})


def drain_winners(shards: list, key_type: str = "int64") -> list:
    """End-of-round drain: one Arrow block ref per shard (the winners).
    Blocks stay in the object store (``from_arrow_refs``-ready)."""
    return [s.drain.remote(key_type) for s in shards]


def seen_filter_batch(batch: pa.Table, *, shards: list,
                      url_column: str = "url") -> pa.Table:
    """Task-pool form of :class:`SeenFilter`: the seen-set state lives in
    the persistent ``SeenShard`` actors; the batch stage is a stateless
    router, so task workers avoid per-round actor-pool spin-up."""
    return SeenFilter(shards, url_column)(batch)


class SeenFilter:
    """``map_batches`` callable: drop rows whose url is already seen and
    mark the survivors seen (one round-trip per shard per batch)."""

    def __init__(self, shards: list, url_column: str = "url"):
        self.shards = shards
        self.url_column = url_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch[self.url_column].to_pylist()
        mask = seen_check_and_add(self.shards, urls)
        return batch.filter(pa.array(mask))
