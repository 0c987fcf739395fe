"""Sharded url → content-fingerprint store for incremental re-crawls.

The prior run's (url, fingerprint) pairs live in N hash-sharded actors
(same routing as the URL-seen set — SURVEY.md §2.3 T1 infrastructure
pattern); a re-crawl round looks up each fetched URL's prior
fingerprint to decide whether the page changed. At the 10^10-URL design
point the store is ~the seen set's size class, which is exactly why it
shards instead of broadcasting.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from rendler_ray.functions.canon import url_hash_shard


@ray.remote
class FpShard:
    """One shard of the prior-run url → fingerprint map."""

    def __init__(self):
        self._fp: dict[str, str] = {}

    def put(self, urls: list[str], fps: list[str]) -> int:
        self._fp.update(zip(urls, fps))
        return len(self._fp)

    def get(self, urls: list[str]) -> list[str]:
        """Prior fingerprint per url; "" when the url was never crawled."""
        fp = self._fp
        return [fp.get(u, "") for u in urls]

    def count(self) -> int:
        return len(self._fp)


def make_fp_shards(num_shards: int) -> list:
    return [FpShard.options(num_cpus=0).remote() for _ in range(num_shards)]


def fp_put(shards: list, urls: list[str], fps: list[str]) -> None:
    if not urls:
        return
    u = np.asarray(urls, dtype=object)
    f = np.asarray(fps, dtype=object)
    sh = url_hash_shard(u, len(shards))
    futs = []
    for k in np.unique(sh):
        sel = np.flatnonzero(sh == k)
        futs.append(shards[int(k)].put.remote(u[sel].tolist(),
                                              f[sel].tolist()))
    ray.get(futs)


def fp_get(shards: list, urls: list[str]) -> np.ndarray:
    """Prior fingerprints in input order ("" = never crawled)."""
    n = len(urls)
    out = np.empty(n, dtype=object)
    if n == 0:
        return out
    u = np.asarray(urls, dtype=object)
    sh = url_hash_shard(u, len(shards))
    futs = []
    for k in np.unique(sh):
        sel = np.flatnonzero(sh == k)
        futs.append((sel, shards[int(k)].get.remote(u[sel].tolist())))
    for sel, f in futs:
        out[sel] = ray.get(f)
    return out


def prior_fp_lookup_batch(batch: pa.Table, *, shards: list,
                          url_col: str = "url",
                          fp_col: str = "fingerprint") -> pa.Table:
    """``map_batches`` router: append ``prior_fp`` (the prior run's
    fingerprint for each url, "" if new). Stateless — the store lives in
    the shard actors."""
    prior = fp_get(shards, batch[url_col].to_pylist())
    return batch.append_column("prior_fp",
                               pa.array(prior.tolist(), pa.string()))
