"""Render stage: the reference's PhantomJS rasterizer
(``python/render_executor.py`` + ``render.js``; SURVEY.md §2.1 S3),
re-expressed as a ``map_batches`` actor-pool stage.

The reference cold-starts a PhantomJS subprocess PER TASK; here the
renderer is a callable class so a real browser engine would be warmed
once per actor in ``__init__`` and amortized across batches — a genuine
improvement over the reference (SURVEY.md §2.3 T3).

The sandbox has no browser, so "rendering" is a deterministic canonical
serialization of the document's full span sequence (FIXTURES.md F5): it
consumes every span — text AND media, in order — exactly like a real
rasterization would, and is byte-stable, which the golden dot-export
test relies on. The per-row span-sequence invariant (kind, text,
media_ref, order) is what gets serialized, so any upstream corruption of
span order shows up as a render diff.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def render_spans_bytes(spans: list[dict]) -> bytes:
    parts = [
        f"{sp['kind']}\x1f{sp['text']}\x1f{sp['media_ref']}\x1f{sp['offset']}"
        for sp in spans
    ]
    return b"RENDER\x00" + "\x1e".join(parts).encode("utf-8")


def render_batch(batch: pa.Table, *, round_no: int = 0) -> pa.Table:
    """Task-pool form of :class:`Renderer` — the sandbox renderer is a
    stateless serialization, so warm task workers beat a per-round actor
    pool. A real browser-engine deployment uses the class form."""
    return Renderer(round_no)(batch)


class Renderer:
    """Fetch batch (status==200 rows) → renders batch
    (doc_id, media_ref, image, rendered_round)."""

    def __init__(self, round_no: int = 0):
        # A real deployment loads the browser engine here, once per actor.
        self.round_no = round_no

    def __call__(self, batch: pa.Table) -> pa.Table:
        ok = batch.filter(pc.equal(batch["status"], 200))
        n = ok.num_rows
        spans = ok["spans"].combine_chunks()
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        # vectorized canonical serialization (byte-identical to
        # render_spans_bytes): per-span field join, then per-doc list
        # join, then the RENDER\x00 prefix — all Arrow C++ kernels.
        flat = spans.flatten()
        per_span = pc.binary_join_element_wise(
            flat.field("kind"), flat.field("text"), flat.field("media_ref"),
            pc.cast(flat.field("offset"), pa.string()), "\x1f")
        offs = pc.subtract(spans.offsets, spans.offsets[0])  # 0-base slices
        per_doc = pc.binary_join(
            pa.ListArray.from_arrays(offs, per_span), "\x1e")
        images = pc.cast(
            pc.binary_join_element_wise("RENDER\x00", per_doc, ""),
            pa.large_binary())
        media_ref = pc.binary_join_element_wise(
            "render://", ok["url"].combine_chunks(), ".png", "")
        return pa.table(
            {
                "doc_id": ok["url"],
                "media_ref": media_ref,
                "image": images,
                "rendered_round": pa.array(
                    np.full(n, self.round_no, np.int32)),
            }
        )
