"""URL canonicalization and host extraction.

The reference (mesosphere/RENDLER) does NOT canonicalize — its URL-seen
set is raw string equality (``python/rendler.py::frameworkMessage``,
SURVEY.md §2.7 D1), and relative hrefs are resolved with ``urljoin``
inside the crawl executor (``python/crawl_executor.py``, §2.2 M2).

This module provides both behaviors:
  * ``resolve(base, href)`` — relative-URL resolution (reference parity).
  * ``canonicalize(url)`` — full canonicalization (scheme/host lowercase,
    default-port strip, fragment strip, path dot-segment normalization),
    required by BASELINE.json's north_rule but OFF in conformance mode.
  * ``host_of(url)`` — the partition key for every host-hash shuffle.

All batch entry points are vectorized over Arrow string arrays.
"""

from __future__ import annotations

import posixpath
from urllib.parse import urljoin, urlsplit, urlunsplit

import numpy as np
import pyarrow as pa

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}


def resolve(base: str, href: str) -> str:
    """Resolve a possibly-relative href against its page URL.

    Mirrors the reference executor's ``urljoin(url, link)`` exactly for
    standard schemes; the synthetic ``s://`` scheme is handled explicitly
    because urllib treats unknown schemes as opaque.
    """
    if "://" in href:
        return href
    if base.startswith("s://"):
        # s://host/path — same grammar as http; urljoin via http trick.
        return "s" + urljoin("http" + base[1:], href)[4:]
    return urljoin(base, href)


def canonicalize(url: str) -> str:
    """Canonical form: lowercase scheme+host, strip default port and
    fragment, normalize path dot-segments, collapse empty path to '/'."""
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    # normalize dot segments; preserve trailing slash semantics
    norm = posixpath.normpath(path)
    if path.endswith("/") and norm != "/":
        norm += "/"
    if norm == ".":
        norm = "/"
    return urlunsplit((scheme, netloc, norm, parts.query, ""))


def host_of(url: str) -> str:
    """Extract the lowercase host — the frontier partition key."""
    i = url.find("://")
    if i < 0:
        return ""
    rest = url[i + 3 :]
    j = rest.find("/")
    authority = rest if j < 0 else rest[:j]
    # strip userinfo and port
    at = authority.rfind("@")
    if at >= 0:
        authority = authority[at + 1 :]
    colon = authority.rfind(":")
    if colon >= 0 and authority[colon + 1 :].isdigit():
        authority = authority[:colon]
    return authority.lower()


# Port handling matches host_of's numeric-port rule: only strip a
# trailing ':<digits>' — an authority like 'host:abc' keeps its suffix
# (host_of treats a non-numeric colon-suffix as part of the host).
_HOST_RE = r"^[^:/?#]+://(?:[^/@]*@)?([^/?#]+?)(?::\d+)?(?=[/?#]|$)"


def hosts_np(urls: np.ndarray) -> np.ndarray:
    """Vectorized host extraction (C-regex via pandas) over an object
    ndarray of URL strings; agrees with ``host_of`` for well-formed
    URLs (no-scheme / empty-authority rows fall back to the scalar)."""
    import pandas as pd

    s = pd.Series(urls, dtype=object)
    out = s.str.extract(_HOST_RE, expand=False).str.lower()
    miss = out.isna()
    if miss.any():
        out[miss] = [host_of(u) if isinstance(u, str) else ""
                     for u in s[miss]]
    return out.to_numpy(dtype=object)


def hosts_array(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized host extraction over an Arrow string array."""
    return pa.array(hosts_np(urls.to_numpy(zero_copy_only=False)),
                    type=pa.string())


def canonicalize_array(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    out = np.empty(len(urls), dtype=object)
    for i, u in enumerate(urls.to_pylist()):
        out[i] = canonicalize(u) if u is not None else None
    return pa.array(out, type=pa.string())


def stable_hash64(urls) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a string column.

    Uses ``pandas.util.hash_array`` (SipHash-like, fixed key) — stable
    across processes and restarts, unlike Python's salted ``hash``.
    Actors and drivers must agree on routing, so everything routes
    through this one function.
    """
    import pandas.util as pdu

    if isinstance(urls, (pa.Array, pa.ChunkedArray)):
        urls = urls.to_numpy(zero_copy_only=False)
    arr = np.asarray(urls, dtype=object)
    return pdu.hash_array(arr, categorize=False).astype(np.uint64)


def url_hash_shard(urls, num_shards: int) -> np.ndarray:
    """Stable shard assignment for seen-set / web-shard routing."""
    return (stable_hash64(urls) % np.uint64(num_shards)).astype(np.int64)


def fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h & 0x7FFFFFFFFFFFFFFF
