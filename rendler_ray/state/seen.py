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

Routing happens inside the ``SeenFilter`` batch callable: a batch is
split by stable hash, one ``check_and_add`` RPC per shard, masks merged.
Because each round's candidate set is deduplicated BEFORE the seen check
(groupby url → first discoverer), concurrent batches never race on the
same URL, keeping results deterministic.
"""

from __future__ import annotations

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

    def count(self) -> int:
        return len(self._set) if self.mode == "exact" else self._filter.count

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


def make_seen_shards(num_shards: int, mode: str = "exact",
                     capacity_per_shard: int = 1 << 20) -> list:
    """Spawn the shard actors. ``num_cpus=0.1``: shards are memory-bound
    lookups; they must not reserve CPUs away from the fetch/render pools."""
    return [
        SeenShard.options(num_cpus=0.1).remote(i, num_shards, mode, capacity_per_shard)
        for i in range(num_shards)
    ]


def seen_check_and_add(shards: list, urls: list[str]) -> np.ndarray:
    """Route a URL list to its shards; returns the new-mask in input order."""
    n = len(urls)
    if n == 0:
        return np.zeros(0, dtype=bool)
    sh = url_hash_shard(urls, len(shards))
    mask = np.zeros(n, dtype=bool)
    futs = []
    for k in np.unique(sh):
        sel = np.flatnonzero(sh == k)
        futs.append((sel, shards[int(k)].check_and_add.remote([urls[i] for i in sel])))
    for sel, f in futs:
        mask[sel] = ray.get(f)
    return mask


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
