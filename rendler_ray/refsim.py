"""Single-process reference simulator — the conformance oracle.

A faithful ~100-line port of the reference scheduler's state machine
(mesosphere/RENDLER, ``python/rendler.py``; SURVEY.md §3.1): one FIFO
queue, a raw-string URL-seen set seeded with the seed URL, links appended
in page order as crawl results arrive, every fetched page rendered, all
(src, dst) pairs accumulated as the crawl graph. Used ONLY by tests and
goldens — the Ray pipeline must reproduce its fetch order, seen set, and
edge set exactly (north_rule: "matching the reference's crawl ordering
and URL-seen set under the same seed list and politeness budget").

This module deliberately re-implements link extraction and URL
resolution with its own inline code (not the pipeline's kernels) so the
oracle is independent of the code under test.
"""

from __future__ import annotations

import re
from collections import deque
from dataclasses import dataclass, field

import pyarrow as pa

_SIM_LINK = re.compile(r'href="([^"]+)"|(s://h\d+/p\d+)|(/p\d+)')


def _sim_extract(spans: list[dict], base_url: str) -> list[str]:
    """Page-order link extraction + relative resolution (oracle copy)."""
    host = base_url.split("/")[2]
    out: list[str] = []
    for sp in spans:
        if sp["kind"] != "text":
            continue
        for m in _SIM_LINK.finditer(sp["text"]):
            href = m.group(1) or m.group(2) or m.group(3)
            if "://" not in href:
                href = f"s://{host}{href}" if href.startswith("/") else href
            out.append(href)
    return out


@dataclass
class SimResult:
    order: list[str] = field(default_factory=list)    # fetch (pop) order
    seen: set[str] = field(default_factory=set)       # processedURLs
    edges: list[tuple[str, str, int]] = field(default_factory=list)
    rendered: list[str] = field(default_factory=list)  # fetch-200 pages, in order
    depth: dict[str, int] = field(default_factory=dict)


def simulate(
    docs: pa.Table,
    seeds: list[str],
    max_depth: int | None = None,
    max_pages: int | None = None,
) -> SimResult:
    """Run the reference FIFO crawl over the closed-world docs table.

    Semantics (SURVEY.md §3.1): pop URL → fetch → if found, record
    render + one edge per extracted link in page order; links not in the
    seen set are added to the seen set AND the queue (breadth-first via
    FIFO). 404s consume a fetch slot but produce nothing. ``max_pages``
    bounds total pops; ``max_depth`` gates *discovery* (an over-depth
    link still records its edge but never enters seen/queue).
    """
    index: dict[str, list[dict]] = {}
    for row in docs.to_pylist():
        index[row["doc_id"]] = row["spans"]

    r = SimResult()
    q: deque[str] = deque()
    for s in seeds:
        if s not in r.seen:
            r.seen.add(s)
            r.depth[s] = 0
            q.append(s)

    while q and (max_pages is None or len(r.order) < max_pages):
        url = q.popleft()
        r.order.append(url)
        spans = index.get(url)
        if spans is None:
            continue  # 404: reference logs TASK_FAILED and moves on
        r.rendered.append(url)
        d = r.depth[url]
        for ord_, dst in enumerate(_sim_extract(spans, url)):
            r.edges.append((url, dst, ord_))
            if dst not in r.seen and (max_depth is None or d + 1 <= max_depth):
                r.seen.add(dst)
                r.depth[dst] = d + 1
                q.append(dst)
    return r


def edge_set(r: SimResult) -> set[tuple[str, str]]:
    """The reference's crawlResults set semantics (SURVEY.md §2.5 A1):
    duplicate (src, dst) pairs collapse."""
    return {(s, d) for s, d, _ in r.edges}
