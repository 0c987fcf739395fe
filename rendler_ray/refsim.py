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
    """Page-order link extraction + relative resolution (oracle copy).
    A redirect span's text is the absolute Location URL — it yields
    that one link (the 301 Location edge). A canonical span's text is
    the rel=canonical target — one more (trailing) link."""
    host = base_url.split("/")[2]
    out: list[str] = []
    for sp in spans:
        if sp["kind"] not in ("text", "redirect", "canonical"):
            continue
        for m in _SIM_LINK.finditer(sp["text"]):
            href = m.group(1) or m.group(2) or m.group(3)
            if "://" not in href:
                href = f"s://{host}{href}" if href.startswith("/") else href
            out.append(href)
    return out


def _sim_is_redirect(spans: list[dict]) -> bool:
    """HTTP-301 pages (any redirect span) are fetched but never
    rendered — mirrors the engine's status==200 render filter."""
    return any(sp["kind"] == "redirect" for sp in spans)


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
        if not _sim_is_redirect(spans):
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


# ---------------------------------------------------------------- polite
#
# Oracle for the politeness-extended crawl (north_rule: "matching ... under
# the same seed list and politeness budget"). Deliberately independent
# re-implementation: its own robots parser, its own budget model, plain
# Python dict/list state — no imports from rendler_ray.state.

_ORD_BITS = 21
_ORD_CAP = (1 << _ORD_BITS) - 1


@dataclass
class PoliteSimResult(SimResult):
    round_order: list[list[str]] = field(default_factory=list)  # per round
    seq: dict[str, int] = field(default_factory=dict)           # url -> seq
    deferred_total: int = 0


def _sim_parse_robots(body: str, window_ms: int) -> dict:
    """Minimal robots.txt model: ``User-agent: *`` sections, Disallow
    path prefixes, Crawl-delay seconds -> per-round budget."""
    pol = {"allow_all": True, "disallow": [], "allow": [], "budget": None}
    applies = False
    delay_ms = None
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            applies = val == "*"
        elif applies and key == "disallow":
            if val == "/":
                pol["allow_all"] = False
            elif val:
                pol["disallow"].append(val)
        elif applies and key == "allow":
            if val:
                pol["allow"].append(val)
        elif applies and key == "crawl-delay":
            try:
                delay_ms = int(float(val) * 1000)
            except ValueError:
                pass
    if delay_ms:
        pol["budget"] = max(1, window_ms // delay_ms)
    return pol


def _sim_allowed(url: str, pol: dict | None) -> bool:
    """Longest-match Disallow/Allow rule (REP), Allow wins ties."""
    if pol is None:
        return True
    if not pol["allow_all"]:
        return False
    if not pol["disallow"]:
        return True
    i = url.find("://")
    path = "/"
    if i >= 0:
        j = url.find("/", i + 3)
        if j >= 0:
            path = url[j:]
    dis = max((len(p) for p in pol["disallow"] if path.startswith(p)),
              default=-1)
    if dis < 0:
        return True
    alw = max((len(p) for p in pol["allow"] if path.startswith(p)),
              default=-1)
    return alw >= dis


def simulate_polite(
    docs: pa.Table,
    seeds: list[str],
    *,
    max_depth: int | None = None,
    max_pages: int | None = None,
    robots: dict[str, str] | None = None,
    host_budget_per_round: int | None = None,
    window_ms: int = 60_000,
    auto_robots: bool = False,
    max_rounds: int = 1000,
) -> PoliteSimResult:
    """Round-structured polite crawl oracle.

    Round model (mirrors the semantics the Ray pipeline commits to, as an
    independent list/dict implementation): each round the frontier is
    (1) truncated to the remaining ``max_pages`` by smallest seq,
    (2) auto-robots: robots.txt fetched for hosts never seen before,
    (3) robots-filtered (dropped rows stay seen, never re-enter),
    (4) budget-gated per host — the ``b`` smallest-seq rows per host are
    admitted, the rest DEFERRED with their original seq,
    (5) fetched in seq order; extracted links are depth-gated,
    first-discoverer-deduped by (src_seq, ord) order, seen-checked, and
    the new URLs get dense seqs in that discovery order. Next round's
    frontier is new URLs + deferred rows.
    """
    index: dict[str, list[dict]] = {}
    for row in docs.to_pylist():
        index[row["doc_id"]] = row["spans"]

    policies: dict[str, dict] = {}
    for h, txt in (robots or {}).items():
        pol = _sim_parse_robots(txt, window_ms)
        if pol["budget"] is None:
            pol["budget"] = host_budget_per_round
        policies[h] = pol
    known_hosts = set(policies)
    politeness_on = (bool(policies) or host_budget_per_round is not None
                     or auto_robots)

    r = PoliteSimResult()
    frontier: list[tuple[str, int, int]] = []  # (url, depth, seq)
    total_seq = 0
    for s in seeds:
        if s not in r.seen:
            r.seen.add(s)
            r.depth[s] = 0
            r.seq[s] = total_seq
            frontier.append((s, 0, total_seq))
            total_seq += 1

    pages_fetched = 0
    rnd = 0
    while frontier and rnd < max_rounds:
        if max_pages is not None:
            remaining = max_pages - pages_fetched
            if remaining <= 0:
                break
            if remaining < len(frontier):
                frontier = sorted(frontier, key=lambda t: t[2])[:remaining]

        if auto_robots:
            hosts_round = {u.split("/")[2] for u, _, _ in frontier}
            for h in sorted(hosts_round - known_hosts):
                known_hosts.add(h)
                spans = index.get(f"s://{h}/robots.txt")
                if spans is None:
                    continue  # no robots page => allow-all, no policy
                body = "\n".join(sp["text"] for sp in spans
                                 if sp["kind"] == "text")
                pol = _sim_parse_robots(body, window_ms)
                if pol["budget"] is None:
                    pol["budget"] = host_budget_per_round
                policies[h] = pol

        admitted, deferred = frontier, []
        if politeness_on:
            admitted = [t for t in admitted
                        if _sim_allowed(t[0], policies.get(t[0].split("/")[2]))]
            budgets = {h: p["budget"] for h, p in policies.items()
                       if p["budget"] is not None}
            if budgets or host_budget_per_round is not None:
                by_host: dict[str, list] = {}
                for t in admitted:
                    by_host.setdefault(t[0].split("/")[2], []).append(t)
                admitted = []
                for h, rows in by_host.items():
                    b = budgets.get(h, host_budget_per_round)
                    rows.sort(key=lambda t: t[2])
                    if b is None:
                        admitted.extend(rows)
                    else:
                        admitted.extend(rows[:b])
                        deferred.extend(rows[b:])

        admitted.sort(key=lambda t: t[2])
        round_urls: list[str] = []
        # dst -> (order_key, new_depth); min order_key wins (first discoverer)
        cand: dict[str, tuple[int, int]] = {}
        for url, d, seq in admitted:
            r.order.append(url)
            round_urls.append(url)
            pages_fetched += 1
            spans = index.get(url)
            if spans is None:
                continue
            if not _sim_is_redirect(spans):
                r.rendered.append(url)
            for ord_, dst in enumerate(_sim_extract(spans, url)):
                r.edges.append((url, dst, ord_))
                if max_depth is not None and d + 1 > max_depth:
                    continue
                key = (seq << _ORD_BITS) | min(ord_, _ORD_CAP)
                if dst not in cand or key < cand[dst][0]:
                    cand[dst] = (key, d + 1)
        r.round_order.append(round_urls)

        winners = sorted(
            ((key, dst, nd) for dst, (key, nd) in cand.items()
             if dst not in r.seen))
        next_frontier: list[tuple[str, int, int]] = []
        for key, dst, nd in winners:
            r.seen.add(dst)
            r.depth[dst] = nd
            r.seq[dst] = total_seq
            next_frontier.append((dst, nd, total_seq))
            total_seq += 1
        r.deferred_total += len(deferred)
        next_frontier.extend(deferred)
        frontier = next_frontier
        rnd += 1
    return r
