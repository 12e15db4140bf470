"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with typed
metadata columns alongside. The decode / feature-extract steps run as an
actor-pool ``map_batches`` stage. The actual codecs are NOT available in
this environment, so the decoder is stubbed: ``DecoderStub`` raises
``NotImplementedError`` for real decoding and offers a deterministic
fake feature extractor (byte histogram) so the Ray-side plumbing —
schema, batch sizing, actor signature, output layout — is real and
tested end-to-end.

Scale notes: payload batches are large; callers should use a small
``batch_size`` (payload bytes x batch_size x concurrency must fit worker
heaps) and ``batch_format="pyarrow"`` (binary columns do not round-trip
pandas cleanly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PAYLOAD_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),   # e.g. image/png, audio/wav
    ("payload_bytes", pa.int64()),
])

FEATURE_DIM = 16


def to_payload_table(batch: pa.Table, text_col: str = "text",
                     media_type: str = "application/octet-stream") -> pa.Table:
    """Wrap a column as an opaque binary payload table (the test stand-in
    for real image/audio bytes)."""
    payload = batch.column(text_col).cast(pa.binary())
    if isinstance(payload, pa.ChunkedArray):
        payload = payload.combine_chunks()
    n = batch.num_rows
    return pa.Table.from_arrays(
        [
            batch.column("doc_id").combine_chunks() if isinstance(batch.column("doc_id"), pa.ChunkedArray) else batch.column("doc_id"),
            payload,
            pa.array([media_type] * n, type=pa.string()),
            pc.binary_length(payload).cast(pa.int64()),
        ],
        schema=PAYLOAD_SCHEMA,
    )


FRAME_BYTES = 64


def frame_sample(batch: pa.Table, every_k: int = 4) -> pa.Table:
    """Frame-sampling plumbing for video-like payloads: treat the payload
    as fixed-size frames and keep every k-th. Real codecs would decode
    container frames here (actor-pool stage); the fixed-byte framing is
    the deterministic stand-in — the batch/schema mechanics are real.
    One input row -> one row per sampled frame (the fan-out shape a video
    pipeline produces)."""
    doc_ids, frame_nos, frames = [], [], []
    for doc_id, payload in zip(batch.column("doc_id").to_pylist(),
                               batch.column("payload").to_pylist()):
        if not payload:
            continue
        n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
        for fi in range(0, n_frames, every_k):
            doc_ids.append(doc_id)
            frame_nos.append(fi)
            frames.append(payload[fi * FRAME_BYTES:(fi + 1) * FRAME_BYTES])
    return pa.table({
        "doc_id": pa.array(doc_ids, type=pa.int64()),
        "frame_no": pa.array(frame_nos, type=pa.int32()),
        "frame": pa.array(frames, type=pa.binary()),
    })


def resize_features(batch: pa.Table, out_dim: int = 8) -> pa.Table:
    """Resize stage stand-in: average-pool the feature vector down to
    ``out_dim`` (what an image resize + re-embed would do dimensionally)."""
    feats = batch.column("features")
    if isinstance(feats, pa.ChunkedArray):
        feats = feats.combine_chunks()
    m = feats.values.to_numpy(zero_copy_only=False).reshape(len(feats), -1)
    factor = m.shape[1] // out_dim
    pooled = m[:, : factor * out_dim].reshape(len(feats), out_dim, factor).mean(axis=2)
    flat = pa.array(pooled.astype(np.float32).reshape(-1))
    offsets = pa.array(np.arange(0, (len(feats) + 1) * out_dim, out_dim,
                                 dtype=np.int32))
    return batch.set_column(
        batch.schema.get_field_index("features"), "features",
        pa.ListArray.from_arrays(offsets, flat),
    )


class DecoderStub:
    """Actor-pool decode/feature stage for binary payload columns.

    ``__init__`` is where a real build would load the codec / model once
    per actor; ``__call__`` processes one payload batch. With
    ``fake=False`` it raises NotImplementedError (no image/audio libs in
    this container); with ``fake=True`` it emits a deterministic byte
    histogram as the "feature" so downstream stages can be exercised.
    """

    def __init__(self, fake: bool = True) -> None:
        self.fake = fake
        # real build: self.model = load_decoder(...)  (once per actor)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "payload decoding requires image/audio codecs not present "
                "in this environment; run with fake=True for the plumbing"
            )
        payloads = batch.column("payload").to_pylist()
        feats = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float32)
        for i, p in enumerate(payloads):
            if p:
                b = np.frombuffer(p, dtype=np.uint8)
                hist = np.bincount(b >> 4, minlength=FEATURE_DIM).astype(np.float32)
                feats[i] = hist / max(1, len(b))
        flat = pa.array(feats.reshape(-1))
        offsets = pa.array(
            np.arange(0, (len(payloads) + 1) * FEATURE_DIM, FEATURE_DIM, dtype=np.int32)
        )
        feat_col = pa.ListArray.from_arrays(offsets, flat)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_type": batch.column("media_type"),
            "payload_bytes": batch.column("payload_bytes"),
            "features": feat_col,
        })
