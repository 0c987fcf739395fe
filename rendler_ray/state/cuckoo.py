"""A numpy-backed cuckoo filter for the URL-seen set at design scale.

BASELINE.json's north_rule calls for a "bloom/cuckoo URL-seen" set sized
for a 10^10-URL frontier. At ~2 bytes/key a 10^10-key filter is ~20 GB —
which is exactly why the seen set is SHARDED across actors (SURVEY.md
§2.3 T1): each shard holds capacity/num_shards keys. Tests and
conformance runs use the exact-set mode (bit-identical reference
semantics, SURVEY.md §7.4); the cuckoo mode is the scale path and its
false-positive rate is tracked (a false positive ⇒ a URL never crawled).

Standard cuckoo filter (Fan et al., CoNEXT'14, public paper):
16-bit fingerprints, 4 slots/bucket, partial-key cuckoo hashing with
bounded eviction. ~1e-4 FPR at 95% load with 16-bit fingerprints.
"""

from __future__ import annotations

import numpy as np

from rendler_ray.functions.canon import stable_hash64

_EMPTY = np.uint16(0)
_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 1234):
        nb = 1
        while nb * 4 < capacity / 0.95:
            nb *= 2
        self.num_buckets = nb
        self.table = np.zeros((nb, 4), dtype=np.uint16)
        self.count = 0
        self.rng = np.random.default_rng(seed)
        self.kicked_out = 0  # insert failures (filter overfull)

    def _fp_and_bucket(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = stable_hash64(keys) if keys.dtype == object else keys
        fp = (h & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 marks an empty slot
        b1 = (h >> np.uint64(16)) % np.uint64(self.num_buckets)
        return fp, b1.astype(np.int64)

    def _alt_bucket(self, b: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key hashing: alt = b xor hash(fp)
        fp_h = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(
            self.num_buckets - 1
        )
        return (b.astype(np.uint64) ^ fp_h).astype(np.int64)

    def contains_many(self, keys: list[str]) -> np.ndarray:
        arr = np.asarray(keys, dtype=object)
        fp, b1 = self._fp_and_bucket(arr)
        b2 = self._alt_bucket(b1, fp)
        t = self.table
        hit1 = (t[b1] == fp[:, None]).any(axis=1)
        hit2 = (t[b2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def _insert_one(self, b1: int, b2: int, fp: int) -> None:
        t = self.table
        for b in (b1, b2):
            empt = np.flatnonzero(t[b] == _EMPTY)
            if len(empt):
                t[b, empt[0]] = fp
                self.count += 1
                return
        b = b1
        for _ in range(_MAX_KICKS):
            slot = int(self.rng.integers(0, 4))
            fp, t[b, slot] = int(t[b, slot]), fp
            b = int(self._alt_bucket(np.array([b]), np.array([fp], dtype=np.uint16))[0])
            empt = np.flatnonzero(t[b] == _EMPTY)
            if len(empt):
                t[b, empt[0]] = fp
                self.count += 1
                return
        self.kicked_out += 1  # dropped a fingerprint; FPR unaffected, FNR risk logged

    def check_and_add_many(self, keys: list[str]) -> np.ndarray:
        """Returns True where the key was NEW (not present before the call)."""
        arr = np.asarray(keys, dtype=object)
        fp, b1 = self._fp_and_bucket(arr)
        b2 = self._alt_bucket(b1, fp)
        new = np.zeros(len(arr), dtype=bool)
        t = self.table
        for i in range(len(arr)):
            f = fp[i]
            if (t[b1[i]] == f).any() or (t[b2[i]] == f).any():
                continue
            new[i] = True
            self._insert_one(int(b1[i]), int(b2[i]), int(f))
        return new

    def snapshot(self) -> dict:
        return {"table": self.table.copy(), "count": self.count}

    def restore(self, snap: dict) -> None:
        self.table = snap["table"].copy()
        self.count = int(snap["count"])
