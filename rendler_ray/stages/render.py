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

import pyarrow as pa
import pyarrow.compute as pc


def render_spans_bytes(spans: list[dict]) -> bytes:
    parts = [
        f"{sp['kind']}\x1f{sp['text']}\x1f{sp['media_ref']}\x1f{sp['offset']}"
        for sp in spans
    ]
    return b"RENDER\x00" + "\x1e".join(parts).encode("utf-8")


class Renderer:
    """Fetch batch (status==200 rows) → renders batch
    (doc_id, media_ref, image, rendered_round)."""

    def __init__(self, round_no: int = 0):
        # A real deployment loads the browser engine here, once per actor.
        self.round_no = round_no

    def __call__(self, batch: pa.Table) -> pa.Table:
        ok = batch.filter(pc.equal(batch["status"], 200))
        urls = ok["url"].to_pylist()
        spans = ok["spans"].to_pylist()
        images = [render_spans_bytes(sp) for sp in spans]
        return pa.table(
            {
                "doc_id": pa.array(urls, pa.string()),
                "media_ref": pa.array(
                    [f"render://{u}.png" for u in urls], pa.string()
                ),
                "image": pa.array(images, pa.large_binary()),
                "rendered_round": pa.array(
                    [self.round_no] * len(urls), pa.int32()
                ),
            }
        )
