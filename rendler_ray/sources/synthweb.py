"""Deterministic seeded synthetic web: a closed world of interleaved docs.

The reference crawled the live web (``python/crawl_executor.py`` does a
raw ``urlopen``; SURVEY.md §2.1 S2). This sandbox is offline, so the
"web" is a seeded power-law site graph materialized as the interleaved
``docs`` table from BASELINE.json's ``input_hint``:

    doc_id: string            (also the page URL, e.g. "s://h003/p00007")
    spans:  list<struct<kind, text, media_ref, offset>>

Text spans embed outlinks as URL tokens — absolute ("s://h012/p00345")
or host-relative ("/p00345") — mixed with filler words; image spans
carry a ``media_ref`` blob key. Host sizes are Zipf-distributed to
exercise skew handling; a fraction of links dangle (404 targets).

Everything is a pure function of the parameters + seed: the same call
always produces byte-identical tables (tests, bench, and the oracle
simulator all rely on this).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from rendler_ray.schema import DOCS_SCHEMA

_WORDS = (
    "the quick crawl render frame fetch page host link graph queue deque "
    "span text image batch arrow block shard actor round depth frontier "
    "seed filter bucket token robot delay merge sort scan hash join"
).split()


def page_url(host: int, page: int) -> str:
    return f"s://h{host:03d}/p{page:05d}"


def host_name(host: int) -> str:
    return f"h{host:03d}"


def zipf_sizes(n_docs: int, n_hosts: int, alpha: float = 1.1) -> np.ndarray:
    """Allocate n_docs pages across n_hosts with a Zipf size profile."""
    w = 1.0 / np.arange(1, n_hosts + 1) ** alpha
    sizes = np.maximum(1, np.floor(n_docs * w / w.sum()).astype(np.int64))
    # fix rounding so the total is exact
    diff = n_docs - int(sizes.sum())
    sizes[0] += diff
    if sizes[0] < 1:
        raise ValueError("n_docs too small for n_hosts")
    return sizes


def generate_docs(
    n_docs: int = 1000,
    n_hosts: int = 20,
    mean_links: float = 6.0,
    p_intra: float = 0.6,
    p_relative: float = 0.5,
    p_dangle: float = 0.05,
    mean_images: float = 0.8,
    p_video: float = 0.0,
    p_audio: float = 0.0,
    p_host_robots: float = 0.0,
    p_redirect: float = 0.0,
    p_canonical: float = 0.0,
    words_per_span: int = 3,
    seed: int = 42,
) -> pa.Table:
    """Build the docs table. Deterministic in all parameters."""
    rng = np.random.default_rng(seed)
    sizes = zipf_sizes(n_docs, n_hosts)
    host_of_doc = np.repeat(np.arange(n_hosts), sizes)
    page_of_doc = np.concatenate([np.arange(s) for s in sizes])

    n_links = rng.poisson(mean_links, n_docs)
    total_links = int(n_links.sum())
    # vectorized link-target draws
    is_intra = rng.random(total_links) < p_intra
    is_rel = rng.random(total_links) < p_relative
    dangle = rng.random(total_links) < p_dangle
    cross_host = rng.choice(n_hosts, size=total_links, p=sizes / sizes.sum())
    tgt_frac = rng.random(total_links)
    link_src = np.repeat(np.arange(n_docs), n_links)

    tgt_host = np.where(is_intra, host_of_doc[link_src], cross_host)
    tgt_size = sizes[tgt_host]
    tgt_page = (tgt_frac * tgt_size).astype(np.int64)
    # dangling links point past the host's last page (guaranteed 404)
    tgt_page = np.where(dangle, tgt_size + (tgt_frac * 50).astype(np.int64), tgt_page)

    n_imgs = np.minimum(rng.poisson(mean_images, n_docs), 3)
    # separate stream: must not perturb the main rng sequence (default
    # corpora are byte-pinned by tests/oracles)
    vrng = np.random.default_rng(seed + 977)
    is_video = vrng.random(n_docs * 4).reshape(n_docs, 4) < p_video
    # audio stream (seed+978): an image slot becomes audio — video wins
    # ties so existing p_video corpora are unchanged by p_audio=0
    arng = np.random.default_rng(seed + 978)
    is_audio = arng.random(n_docs * 4).reshape(n_docs, 4) < p_audio
    n_text_spans = 1 + rng.integers(0, 3, n_docs)
    word_picks = rng.integers(0, len(_WORDS), n_docs * 8 + 8)

    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    li = 0
    wi = 0
    for d in range(n_docs):
        h = int(host_of_doc[d])
        doc_ids.append(page_url(h, int(page_of_doc[d])))
        k = int(n_links[d])
        tokens: list[str] = []
        for j in range(k):
            th, tp = int(tgt_host[li + j]), int(tgt_page[li + j])
            if th == h and is_rel[li + j]:
                tokens.append(f"/p{tp:05d}")
            else:
                tokens.append(page_url(th, tp))
        li += k

        nts = int(n_text_spans[d])
        # distribute link tokens across text spans, preserving order
        cut = np.linspace(0, k, nts + 1).astype(int)
        spans: list[dict] = []
        off = 0
        for t in range(nts):
            nw = max(3, words_per_span)
            words = [_WORDS[word_picks[(wi + j) % len(word_picks)]]
                     for j in range(nw)]
            wi += nw
            body = " ".join(
                words[: nw - 1] + tokens[cut[t] : cut[t + 1]] + words[nw - 1 :])
            spans.append({"kind": "text", "text": body, "media_ref": "", "offset": off})
            off += 1
            if t < int(n_imgs[d]):
                kind = ("video" if is_video[d, t]
                        else "audio" if is_audio[d, t] else "image")
                spans.append(
                    {
                        "kind": kind,
                        "text": "",
                        "media_ref": f"blob://h{h:03d}/p{int(page_of_doc[d]):05d}/m{t}",
                        "offset": off,
                    }
                )
                off += 1
        spans_col.append(spans)

    if p_redirect > 0:
        # redirect pages (separate rng stream: default corpora stay
        # byte-identical). A redirect page's entire content is ONE
        # kind="redirect" span whose text is the absolute Location URL:
        # fetch reports HTTP 301, render skips it, extract emits the
        # single Location edge, and the target is enqueued like any
        # discovered link. The default seed page never redirects.
        xrng = np.random.default_rng(seed + 8887)
        is_redir = xrng.random(n_docs) < p_redirect
        tgt_h2 = xrng.choice(n_hosts, size=n_docs, p=sizes / sizes.sum())
        tgt_f2 = xrng.random(n_docs)
        for d in range(n_docs):
            if not is_redir[d] or doc_ids[d] == page_url(0, 0):
                continue
            th = int(tgt_h2[d])
            tp = int(tgt_f2[d] * sizes[th])
            tgt = page_url(th, tp)
            if tgt == doc_ids[d]:  # no self-redirect
                if int(sizes[th]) < 2:
                    # single-page host: (tp+1)%1 would re-pick the same
                    # page — skip the redirect (canonical path's guard)
                    continue
                tp = (tp + 1) % int(sizes[th])
                tgt = page_url(th, tp)
            spans_col[d] = [{"kind": "redirect", "text": tgt,
                             "media_ref": "", "offset": 0}]

    if p_canonical > 0:
        # rel=canonical annotations (separate rng stream: default corpora
        # stay byte-identical). An annotated page keeps its content and
        # gains ONE trailing kind="canonical" span whose text is the
        # absolute canonical URL on the SAME host: extract emits it as
        # one more (last-ord) edge — crawlers follow canonical targets —
        # and queries.crawl_canonical_groups consolidates fetched
        # aliases by target. Redirect pages and the default seed are
        # exempt; single-page hosts have no same-host target.
        crng = np.random.default_rng(seed + 8889)
        is_canon = crng.random(n_docs) < p_canonical
        tgt_f3 = crng.random(n_docs)
        for d in range(n_docs):
            if not is_canon[d] or doc_ids[d] == page_url(0, 0):
                continue
            sp = spans_col[d]
            if sp and sp[0]["kind"] == "redirect":
                continue
            h = int(host_of_doc[d])
            if int(sizes[h]) < 2:
                continue
            tp = int(tgt_f3[d] * sizes[h])
            tgt = page_url(h, tp)
            if tgt == doc_ids[d]:  # no self-canonical
                tp = (tp + 1) % int(sizes[h])
                tgt = page_url(h, tp)
            sp.append({"kind": "canonical", "text": tgt,
                       "media_ref": "", "offset": len(sp)})

    if p_host_robots > 0:
        # robots.txt pages per host (separate rng stream: default corpora
        # stay byte-identical). Each blocks the host's "/p00001" prefix
        # (NOT p00000 — that would robots-block the default seed) and
        # sets a crawl delay, exercising both politeness dimensions.
        rrng = np.random.default_rng(seed + 4099)
        for h in range(n_hosts):
            if rrng.random() < p_host_robots:
                body = ("User-agent: *\n"
                        "Disallow: /p00001\n"
                        "Crawl-delay: 2\n")
                doc_ids.append(f"s://{host_name(h)}/robots.txt")
                spans_col.append([{"kind": "text", "text": body,
                                   "media_ref": "", "offset": 0}])

    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans_col}, schema=DOCS_SCHEMA
    )


def docs_parquet(
    path: str,
    n_docs: int = 1000,
    n_hosts: int = 20,
    seed: int = 42,
    **kw,
) -> str:
    """Write (or reuse) a cached parquet of the synthetic docs table.

    At real scale the docs/frontier tables live hash-partitioned on
    shared storage; one file per generator call is the sandbox stand-in.
    """
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tbl = generate_docs(n_docs=n_docs, n_hosts=n_hosts, seed=seed, **kw)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    return path


def default_seeds(n: int = 1) -> list[str]:
    """Reference parity: RENDLER takes one seed URL (SURVEY.md §2.1 S1)."""
    return [page_url(0, i) for i in range(n)]


def mutate_docs(
    tbl: pa.Table,
    seed: int = 42,
    p_drop: float = 0.03,
    p_edit: float = 0.08,
    p_add_link: float = 0.04,
) -> pa.Table:
    """A deterministic "next snapshot" of a docs corpus, for cross-run
    crawl diffing: a fraction of pages is dropped (now 404), a fraction
    gets a text edit (content fingerprint changes, links unchanged), and
    a fraction gains one new outlink to an existing page (new edge).

    Pure post-processing on an already-generated table — the pinned
    ``generate_docs`` RNG streams are untouched (CLAUDE.md rule); all
    draws come from the independent ``default_rng(seed + 6007)`` stream.
    robots.txt rows and the default seed page are never mutated.
    """
    rng = np.random.default_rng(seed + 6007)
    doc_ids = tbl["doc_id"].to_pylist()
    spans_col = tbl["spans"].to_pylist()
    n = len(doc_ids)
    u = rng.random(n)
    tgt_pick = rng.integers(0, max(1, n), n)
    seed0 = page_url(0, 0)

    page_ids = [d for d in doc_ids if not d.endswith("/robots.txt")]
    out_ids: list[str] = []
    out_spans: list[list[dict]] = []
    for i in range(n):
        d, spans = doc_ids[i], spans_col[i]
        immutable = d == seed0 or d.endswith("/robots.txt")
        if not immutable and u[i] < p_drop:
            continue
        if not immutable and u[i] < p_drop + p_edit:
            spans = [dict(sp) for sp in spans]
            for sp in reversed(spans):
                if sp["kind"] == "text":
                    sp["text"] = sp["text"] + " editedrev"
                    break
        elif not immutable and u[i] < p_drop + p_edit + p_add_link:
            spans = [dict(sp) for sp in spans]
            tgt = page_ids[int(tgt_pick[i]) % len(page_ids)]
            for sp in reversed(spans):
                if sp["kind"] == "text":
                    sp["text"] = sp["text"] + " " + tgt
                    break
        out_ids.append(d)
        out_spans.append(spans)
    return pa.Table.from_pydict(
        {"doc_id": out_ids, "spans": out_spans}, schema=DOCS_SCHEMA
    )


def mutated_docs_parquet(base_path: str, seed: int = 42, **kw) -> str:
    """Write (or reuse) the cached mutated snapshot of a cached corpus."""
    suffix = "_v2_" + "_".join(
        f"{k}{v}" for k, v in sorted(kw.items())) if kw else "_v2"
    path = base_path.replace(".parquet", f"{suffix}.parquet")
    if not os.path.exists(path):
        tbl = mutate_docs(pq.read_table(base_path), seed=seed, **kw)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    return path
