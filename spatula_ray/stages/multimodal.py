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
    """Deterministic fake payload: header + width/height + the md5 digest of
    the ref as filler bytes. md5 (not blake2b) so the DuckDB oracle can
    reproduce the exact bytes (md5() hex -> per-byte values) and therefore
    the decoded width/height/features."""
    h = hashlib.md5(media_ref.encode()).digest()
    w = 16 + h[0] % 64
    ht = 16 + h[1] % 64
    return _FAKE_HEADER + struct.pack(">HH", w, ht) + h


def _hash_proj(n_in: int, n_out: int) -> np.ndarray:
    """Hash-derived projection matrix, reproducible in SQL:
    proj[i][j] = ((md5_number_lower(f"{i}_{j}_proj") % 2001) - 1000)/1000."""
    w = np.empty((n_in, n_out), dtype=np.float64)
    for i in range(n_in):
        for j in range(n_out):
            v = int.from_bytes(
                hashlib.md5(f"{i}_{j}_proj".encode()).digest()[8:], "little")
            w[i, j] = ((v % 2001) - 1000) / 1000.0
    return w


class DecodeStub:
    """Actor-pool decode/feature stage. Per-actor state (a real model would
    load here) is the feature projection matrix, built once in __init__
    (hash-derived so the correctness oracle can mirror it; ``seed`` kept
    for API stability, unused).

    Real decode path intentionally raises NotImplementedError — this
    container has no image/audio libraries (see module docstring)."""

    def __init__(self, seed: int = 42):
        self.proj = _hash_proj(16, FEATURE_DIM)
        # self-upgrading seam (round-2 verdict fix #10): when PIL exists
        # (it does not in this container), real image bytes decode for
        # real — width/height from the image, 16 features from a 4x4
        # grayscale thumbnail; the import is probed once per actor
        try:
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    def decode(self, body: bytes):
        if body.startswith(_FAKE_HEADER):
            w, h = struct.unpack(">HH", body[8:12])
            raw = np.frombuffer(body[12:28], dtype=np.uint8).astype(np.float64)
            return w, h, raw
        if self._pil is not None:
            import io

            img = self._pil.open(io.BytesIO(body)).convert("L")
            w, h = img.size
            thumb = img.resize((4, 4))
            raw = np.asarray(thumb, dtype=np.float64).reshape(-1)
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
            f = raw @ self.proj / 255.0
            feats.append((np.floor(f * 1e6 + 0.5) / 1e6).tolist())
        return pa.table({
            "media_id": batch["media_id"],
            "doc_id": batch["doc_id"],
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "features": pa.array(feats, type=pa.list_(pa.float64())),
        })


class DecodeStubExploded(DecodeStub):
    """DecodeStub variant that keeps ``media_ref`` (the SQL-reconstructible
    key) and explodes the feature vector into one row per component —
    the oracle-comparable shape for the correctness gate."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = super().__call__(batch)
        rows = {"media_ref": [], "width": [], "height": [],
                "feature_idx": [], "feature": []}
        for ref, w, h, fv in zip(batch["media_ref"].to_pylist(),
                                 out["width"].to_pylist(),
                                 out["height"].to_pylist(),
                                 out["features"].to_pylist()):
            for j, v in enumerate(fv):
                rows["media_ref"].append(ref)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["feature_idx"].append(j)
                rows["feature"].append(v)
        return pa.table({
            "media_ref": pa.array(rows["media_ref"], type=pa.string()),
            "width": pa.array(rows["width"], type=pa.int32()),
            "height": pa.array(rows["height"], type=pa.int32()),
            "feature_idx": pa.array(rows["feature_idx"], type=pa.int64()),
            "feature": pa.array(rows["feature"], type=pa.float64()),
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
