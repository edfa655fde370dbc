"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool map_batches stages.

The decode libraries (PIL/ffmpeg/etc.) are NOT present in this container, so
the decode kernel is STUBBED: ``DecodeStub`` raises NotImplementedError for
real media and provides a clearly-marked deterministic fake for bodies
carrying the ``FAKEIMG`` header. Everything around the kernel — schema,
batch sizing for large binary payloads, per-actor setup, output layout — is
real and tested; swapping in a real decoder is a one-method change.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("doc_id", pa.string()),
    ("kind", pa.string()),        # image | audio | video
    ("media_ref", pa.string()),
    ("body", pa.binary()),        # opaque payload
    ("content_type", pa.string()),
])

FEATURE_DIM = 16
_FAKE_HEADER = b"FAKEIMG\x00"


def make_fake_media(media_ref: str, kind: str = "image") -> bytes:
    """Deterministic fake payload: header + width/height + blake2b filler.
    Stands in for real bytes so the pipeline plumbing is testable."""
    h = hashlib.blake2b(media_ref.encode(), digest_size=16).digest()
    w = 16 + h[0] % 64
    ht = 16 + h[1] % 64
    return _FAKE_HEADER + struct.pack(">HH", w, ht) + h


class DecodeStub:
    """Actor-pool decode/feature stage. Per-actor state (a real model would
    load here) is the feature projection matrix, built once in __init__.

    Real decode path intentionally raises NotImplementedError — this
    container has no image/audio libraries (see module docstring)."""

    def __init__(self, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.proj = rng.normal(size=(16, FEATURE_DIM))

    def decode(self, body: bytes):
        if body.startswith(_FAKE_HEADER):
            w, h = struct.unpack(">HH", body[8:12])
            raw = np.frombuffer(body[12:28], dtype=np.uint8).astype(np.float64)
            return w, h, raw
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg, not present in this "
            "environment; provide FAKEIMG bodies or swap in a real decoder")

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, feats = [], [], []
        for body in batch["body"].to_pylist():
            w, h, raw = self.decode(bytes(body))
            widths.append(w)
            heights.append(h)
            feats.append((raw @ self.proj / 255.0).round(6).tolist())
        return pa.table({
            "media_id": batch["media_id"],
            "doc_id": batch["doc_id"],
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "features": pa.array(feats, type=pa.list_(pa.float64())),
        })


def extract_media_features(media_ds, concurrency: int = 2,
                           batch_size: int = 64):
    """Large binary payloads -> small batches (batch_size) so
    batch x concurrency stays inside the worker heap; features are compact."""
    return media_ds.map_batches(DecodeStub, batch_format="pyarrow",
                                batch_size=batch_size, concurrency=concurrency,
                                num_cpus=0.5)


def media_manifest_from_docs(docs_ds):
    """Project a crawl docs table's media spans into a media manifest with
    deterministic fake bodies (the crawl never fetches media; a production
    pipeline would fetch here via the same politeness gate)."""
    def fn(batch: pa.Table) -> pa.Table:
        rows = {"media_id": [], "doc_id": [], "kind": [], "media_ref": [],
                "body": [], "content_type": []}
        for doc_id, spans in zip(batch["doc_id"].to_pylist(),
                                 batch["spans"].to_pylist()):
            for s in spans or []:
                if s["kind"] != "media":
                    continue
                ref = s["media_ref"]
                rows["media_id"].append(f"{doc_id}#{s['offset']}")
                rows["doc_id"].append(doc_id)
                rows["kind"].append("image")
                rows["media_ref"].append(ref)
                rows["body"].append(make_fake_media(ref))
                rows["content_type"].append("image/fake")
        return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)

    return docs_ds.map_batches(fn, batch_format="pyarrow")
