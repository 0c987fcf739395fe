"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container ships no image/audio libraries, so the DECODE step is
stubbed (deterministic fake, or ``NotImplementedError`` in strict mode)
— but the Ray-side plumbing is real and tested: media spans explode out
of the interleaved docs table into a media table, flow through
actor-pool ``map_batches`` stages in small batches (binary payloads ⇒
small ``batch_size``), and land in a typed feature schema.

Real deployments swap ``_decode_stub`` for PIL/ffmpeg in the actor's
``__init__``-loaded toolchain; nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from rendler_ray.functions.canon import stable_hash64


def explode_media_spans(batch: pa.Table) -> pa.Table:
    """Docs batch → one row per media span:
    (doc_id, media_ref, kind, span_offset)."""
    spans = batch["spans"].combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans)
    doc_ids = batch["doc_id"].take(parents)
    t = pa.table(
        {
            "doc_id": doc_ids,
            "media_ref": flat.field("media_ref"),
            "kind": flat.field("kind"),
            "span_offset": flat.field("offset"),
        }
    )
    # positive kind list: link-metadata spans (redirect/canonical) carry
    # no media_ref and must not leak into the media pipeline
    return t.filter(pc.is_in(t["kind"],
                             value_set=pa.array(["image", "video",
                                                 "audio"])))


def fake_media_bytes(media_ref: str) -> bytes:
    """Deterministic stand-in blob for a media_ref (no real store here).
    64–319 pseudo-random bytes seeded by the ref hash."""
    h = int(stable_hash64([media_ref])[0])
    rng = np.random.default_rng(h & 0x7FFFFFFF)
    return rng.integers(0, 256, 64 + h % 256, dtype=np.uint8).tobytes()


class MediaDecoder:
    """Actor-pool stage: media rows → decoded metadata + feature vector.

    ``strict=True`` raises NotImplementedError (the honest no-decoder
    mode); default mode produces a deterministic fake decode so the
    plumbing (schema, batching, actor lifecycle) is fully exercised.
    """

    def __init__(self, strict: bool = False, feat_dim: int = 8):
        # Real impl: import PIL / torchvision / ffmpeg here, once per actor.
        self.strict = strict
        self.feat_dim = feat_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "no image/audio decoder available in this environment; "
                "swap in a real decoder in MediaDecoder.__init__"
            )
        refs = batch["media_ref"].to_pylist()
        blobs = [fake_media_bytes(r) for r in refs]
        sizes = np.array([len(b) for b in blobs], dtype=np.int64)
        h = stable_hash64(refs)
        widths = (h % np.uint64(1920)).astype(np.int64) + 16
        heights = ((h >> np.uint64(17)) % np.uint64(1080)).astype(np.int64) + 16
        feats = np.stack(
            [np.frombuffer(b[: self.feat_dim], dtype=np.uint8).astype(np.float32)
             / 255.0 for b in blobs]
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_ref": batch["media_ref"],
                "kind": batch["kind"],
                "blob": pa.array(blobs, pa.large_binary()),
                "n_bytes": pa.array(sizes, pa.int64()),
                "width": pa.array(widths, pa.int64()),
                "height": pa.array(heights, pa.int64()),
                "feature": pa.array(list(feats), pa.list_(pa.float32())),
            }
        )


_DCT8 = None


def _dct8() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis (the pHash transform), built once
    per process."""
    global _DCT8
    if _DCT8 is None:
        k = np.arange(8)
        d = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / 16) \
            * np.sqrt(2 / 8)
        d[0] /= np.sqrt(2)
        _DCT8 = d
    return _DCT8


def phash64_batch(blobs: list[bytes]) -> np.ndarray:
    """64-bit perceptual hashes for a batch of decoded image blobs
    (pHash shape: 8×8 grayscale → 2-D DCT-II → sign vs the median of
    the 63 non-DC coefficients). One stacked einsum per batch — no
    per-image Python beyond the buffer view. The sandbox 'grayscale'
    is the blob's first 64 bytes (the decode stub's contract); a real
    deployment feeds PIL-resized 8×8 luma here, the hash math is
    identical."""
    if not blobs:
        return np.empty(0, np.uint64)
    m = np.stack([np.frombuffer(b[:64], np.uint8) for b in blobs]) \
        .astype(np.float64).reshape(-1, 8, 8)
    d = _dct8()
    c = np.einsum("ij,njk,lk->nil", d, m, d).reshape(len(blobs), 64)
    med = np.median(c[:, 1:], axis=1, keepdims=True)
    bits = (c > med).astype(np.uint64)
    return (bits << np.arange(64, dtype=np.uint64)[None, :]) \
        .sum(axis=1, dtype=np.uint64)


def media_pipeline(docs_ds, strict: bool = False, concurrency=(1, 4),
                   batch_size: int = 256):
    """docs → explode media spans → actor-pool decode. Small batch_size:
    binary payloads make wide rows (SURVEY.md §7.4 wide-rows note)."""
    media = docs_ds.map_batches(explode_media_spans, batch_format="pyarrow")
    return media.map_batches(
        media_decode_batch,
        fn_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
    )


def media_decode_batch(batch: pa.Table, *, strict: bool = False,
                       feat_dim: int = 8) -> pa.Table:
    """Task-pool form of :class:`MediaDecoder` (the sandbox decode stub
    is stateless; a real decoder deployment uses the actor-pool class)."""
    return MediaDecoder(strict, feat_dim)(batch)


def media_resize_batch(batch: pa.Table, *, max_side: int = 256) -> pa.Table:
    """Thumbnail/resize stage (plumbing-real, decode stubbed): computes
    the target geometry (aspect-preserving fit into max_side) and a
    deterministic fake thumbnail payload sized accordingly. A real
    deployment swaps the payload line for PIL ``Image.thumbnail`` inside
    an actor-pool class; schema and batching stay identical."""
    w = np.array(batch["width"].to_pylist(), dtype=np.float64)
    h = np.array(batch["height"].to_pylist(), dtype=np.float64)
    scale = np.minimum(1.0, max_side / np.maximum(w, h))
    tw = np.maximum(1, np.round(w * scale)).astype(np.int64)
    th = np.maximum(1, np.round(h * scale)).astype(np.int64)
    refs = batch["media_ref"].to_pylist()
    thumbs = [fake_media_bytes(r)[: max(16, int(a * b) % 512)]
              for r, a, b in zip(refs, tw, th)]
    return pa.table({
        "doc_id": batch["doc_id"],
        "media_ref": batch["media_ref"],
        "thumb_w": pa.array(tw, pa.int64()),
        "thumb_h": pa.array(th, pa.int64()),
        "thumb": pa.array(thumbs, pa.large_binary()),
    })


def audio_segment_batch(batch: pa.Table, *, seg_ms: int = 5000,
                        max_segments: int = 4) -> pa.Table:
    """Audio segmentation (plumbing-real, decode stubbed): audio rows
    explode into up to ``max_segments`` fixed-length windows of a
    deterministic fake duration; non-audio rows pass through with zero
    segments. Real deployments swap the payload for an
    ffmpeg/soundfile-backed actor-pool class; schema/batching stay
    identical. Mirrors :func:`frame_sample_batch` for the audio kind."""
    auds = batch.filter(pc.equal(batch["kind"], "audio"))
    refs = auds["media_ref"].to_pylist()
    ids = auds["doc_id"].to_pylist()
    out_doc, out_ref, out_start, out_bytes = [], [], [], []
    for d, r in zip(ids, refs):
        dur_ms = 1000 + int(stable_hash64([r])[0] % 60000)  # fake length
        for j, s in enumerate(range(0, dur_ms, seg_ms)):
            if j >= max_segments:
                break
            out_doc.append(d)
            out_ref.append(r)
            out_start.append(s)
            out_bytes.append(fake_media_bytes(f"{r}#a{s}"))
    return pa.table({
        "doc_id": pa.array(out_doc, pa.string()),
        "media_ref": pa.array(out_ref, pa.string()),
        "start_ms": pa.array(out_start, pa.int32()),
        "segment": pa.array(out_bytes, pa.large_binary()),
    })


def frame_sample_batch(batch: pa.Table, *, every_n: int = 10,
                       max_frames: int = 4) -> pa.Table:
    """Video frame sampling (plumbing-real, decode stubbed): video rows
    explode into up to ``max_frames`` sampled frames (every ``every_n``-th
    frame of a deterministic fake frame count); non-video rows pass
    through with zero frames. Real deployments swap the payload for an
    ffmpeg-backed actor-pool class; schema/batching stay identical."""
    vids = batch.filter(pc.equal(batch["kind"], "video"))
    refs = vids["media_ref"].to_pylist()
    ids = vids["doc_id"].to_pylist()
    out_doc, out_ref, out_idx, out_bytes = [], [], [], []
    for d, r in zip(ids, refs):
        n_frames = 30 + int(stable_hash64([r])[0] % 900)  # fake duration
        for j, f in enumerate(range(0, n_frames, every_n)):
            if j >= max_frames:
                break
            out_doc.append(d)
            out_ref.append(r)
            out_idx.append(f)
            out_bytes.append(fake_media_bytes(f"{r}#f{f}"))
    return pa.table({
        "doc_id": pa.array(out_doc, pa.string()),
        "media_ref": pa.array(out_ref, pa.string()),
        "frame_idx": pa.array(out_idx, pa.int32()),
        "frame": pa.array(out_bytes, pa.large_binary()),
    })
