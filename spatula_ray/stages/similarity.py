"""Similarity search over an embedding column (list<float>).

* brute-force cosine top-k — baseline: the query matrix is broadcast once
  (ray.put), each batch computes sims with a double-precision matmul and
  emits per-batch top-k candidates; a final tiny groupby reduces to global
  top-k. Exactly reproducible in SQL (double-precision inner products).
* LSH-bucketed ANN — scale path: random-hyperplane signatures bucket the
  corpus; queries probe only their bucket (+ multiprobe neighbors).
  Approximate; validated by a recall test against the brute-force baseline.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa


class CosineTopK:
    """map_batches actor: holds the normalized query matrix (fetched from
    the object store once per actor)."""

    def __init__(self, queries_ref=None, queries: Optional[np.ndarray] = None,
                 k: int = 10):
        import ray

        q = ray.get(queries_ref) if queries_ref is not None else queries
        q = np.asarray(q, dtype=np.float64)
        qn = np.linalg.norm(q, axis=1)
        qn[qn == 0] = 1.0
        self.q = q / qn[:, None]
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        m = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        m = m / norms[:, None]
        sims = self.q @ m.T                      # (Q, B)
        k = min(self.k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], k - 1)[:k]
            out_q.extend([qi] * len(idx))
            out_v.extend(ids[idx].tolist())
            out_s.extend(sims[qi, idx].tolist())
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         "vec_id": pa.array(out_v, type=pa.int64()),
                         "score": pa.array(out_s, type=pa.float64())})


def topk_cosine(ds, queries: np.ndarray, k: int = 10,
                exclude_ids: Optional[set] = None,
                self_ids: Optional[list] = None, concurrency: int = 2):
    """Global top-k per query: per-batch partial top-k (actor pool) then a
    small groupby reduce. Returns (query_id, vec_id, score rounded 5dp).
    ``self_ids[qi]`` excludes that vec from query qi's results (self-match);
    ``exclude_ids`` excludes globally.

    NOTE: partial top-k per batch needs k+exclusions headroom, so the
    per-batch k is k + (1 if self_ids else 0) + len(exclude_ids or ())."""
    import pandas as pd
    import ray

    pad = (1 if self_ids else 0) + len(exclude_ids or ())
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    cand = ds.map_batches(CosineTopK,
                          fn_constructor_kwargs=dict(queries_ref=qref, k=k + pad),
                          batch_format="pyarrow", concurrency=concurrency,
                          num_cpus=0.5)
    excl = exclude_ids or set()

    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        qi = int(g["query_id"].iloc[0])
        g = g[~g["vec_id"].isin(excl)]
        if self_ids is not None:
            g = g[g["vec_id"] != self_ids[qi]]
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.copy()
        g["score"] = np.floor(g["score"] * 1e5 + 0.5) / 1e5
        return g

    return cand.groupby("query_id").map_groups(reduce_group,
                                               batch_format="pandas")


class HyperplaneLSH:
    """Random-hyperplane signer: sign pattern of ``n_planes`` projections
    (seeded, deterministic) -> bucket id."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(n_planes, dim))
        self.n_planes = n_planes

    def bucket_of(self, vecs: np.ndarray) -> np.ndarray:
        signs = (vecs @ self.planes.T) > 0
        return (signs.astype(np.uint64)
                << np.arange(self.n_planes, dtype=np.uint64)[None, :]).sum(axis=1)


def lsh_ann_topk(ds, queries: np.ndarray, k: int = 10, n_planes: int = 8,
                 seed: int = 42, multiprobe: int = 1, concurrency: int = 2):
    """Approximate top-k: corpus bucketed by hyperplane signature; each
    query scans only its bucket and 1-bit-flip neighbors (multiprobe).
    Validated against topk_cosine by a recall test."""
    import pandas as pd

    q = np.asarray(queries, dtype=np.float64)
    dim = q.shape[1]
    lsh = HyperplaneLSH(dim, n_planes, seed)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    qn_mat = q / qn[:, None]

    probe_buckets = {}
    q_buckets = lsh.bucket_of(q)
    for qi, b in enumerate(q_buckets):
        probes = {int(b)}
        if multiprobe >= 1:
            for bit in range(n_planes):
                probes.add(int(b) ^ (1 << bit))
        if multiprobe >= 2:
            for b1 in range(n_planes):
                for b2 in range(b1 + 1, n_planes):
                    probes.add(int(b) ^ (1 << b1) ^ (1 << b2))
        probe_buckets[qi] = probes
    wanted: set = set()
    for probes in probe_buckets.values():
        wanted |= probes

    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        if len(vecs) == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "bucket": pa.array([], type=pa.uint64()),
                             "embedding": batch["embedding"]})
        buckets = lsh.bucket_of(vecs)
        keep = np.fromiter((int(b) in wanted for b in buckets), dtype=bool,
                           count=len(buckets))
        t = batch.append_column("bucket", pa.array(buckets, type=pa.uint64()))
        return t.filter(pa.array(keep))

    pruned = ds.select_columns(["vec_id", "embedding"]).map_batches(
        bucketize, batch_format="pyarrow")

    rows = pruned.take_all()
    if not rows:
        return pa.table({"query_id": pa.array([], type=pa.int64()),
                         "vec_id": pa.array([], type=pa.int64()),
                         "score": pa.array([], type=pa.float64())})
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    buckets = np.array([r["bucket"] for r in rows], dtype=np.uint64)
    mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]

    out = {"query_id": [], "vec_id": [], "score": []}
    for qi in range(len(q)):
        mask = np.fromiter((int(b) in probe_buckets[qi] for b in buckets),
                           dtype=bool, count=len(buckets))
        if not mask.any():
            continue
        sims = mat[mask] @ qn_mat[qi]
        sub_ids = ids[mask]
        order = np.lexsort((sub_ids, -sims))[:k]
        out["query_id"].extend([qi] * len(order))
        out["vec_id"].extend(sub_ids[order].tolist())
        out["score"].extend((np.floor(sims[order] * 1e5 + 0.5) / 1e5).tolist())
    return pa.table({"query_id": pa.array(out["query_id"], type=pa.int64()),
                     "vec_id": pa.array(out["vec_id"], type=pa.int64()),
                     "score": pa.array(out["score"], type=pa.float64())})
