"""Distributed link-graph analytics over an edge table — the crawl-tier
companion to the curation stages: the crawl emits (src, dst) link rows at
100 TB scale, and ranking / component structure over them is the classic
post-crawl batch job.

PageRank here is INTEGER FIXED-POINT by construction, which buys the two
properties a distributed implementation needs and float PageRank lacks:

* **order independence** — each iteration's per-node update is a SUM of
  integer contributions (``rank // out_degree`` floor divisions), and
  integer sums are exact in any order, so Ray's shuffle/groupby order
  cannot change the result (float sums round differently per block
  order);
* **cross-engine reproducibility** — every op is integer division,
  multiplication, and addition below 2**63, so a DuckDB oracle unrolling
  the same iterations computes bit-identical ranks (the proven
  ``kmeans_centroids`` playbook).

Semantics (scaled by ``SCALE = 10**9``; ranks are integers summing to
~N*SCALE): ``r0[v] = SCALE``; per iteration
``r[v] = (1000 - d) * SCALE // 1000 + d * contrib[v] // 1000`` where
``contrib[v] = sum over edges (u, v) of r[u] // outdeg[u]`` and
``d`` is damping in permille (default 850). Dangling mass is dropped
(the common "no dangling redistribution" variant), documented so the
oracle matches. Integer-range bound: ``sum-of-contribs * damping`` must
stay under 2**63, which holds while ``num_nodes * SCALE * 1000 < 2**63``
(~9.6M nodes at the default SCALE); drop SCALE to 10**6 for
billion-node graphs — precision trades against range explicitly.

Shuffle shape per iteration: ONE hash-bucket join of the (node, rank)
table to edges on src (edge-sized, compact int columns) + ONE
groupby-sum on dst (Ray pre-combines map-side). Ranks and degrees are
(node, int64) tables — never adjacency lists — so skewed in-degree costs
a hot reduce key, not memory; salt a pathological dst by splitting the
sum in two rounds. Blocks are repartitioned each iteration to keep the
sort-based groupby's shuffle fan-in flat (the connected_components
lesson: per-iteration unions otherwise compound block counts
geometrically)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCALE = 10**9


def pagerank(edges, num_nodes: int, iters: int = 5,
             damping_permille: int = 850, num_buckets: int = 32):
    """Integer fixed-point PageRank over an edge Dataset with columns
    ``(src, dst)``; nodes are ``0..num_nodes-1``. Returns a Dataset of
    ``(node, rank)`` with integer ranks on the ``SCALE`` grid. See module
    docstring for semantics, determinism, and the shuffle plan."""
    import ray.data as rd
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from .joins import hash_bucket_join

    edges = edges.materialize()
    deg = edges.groupby("src").aggregate(Count(alias_name="outdeg"))

    base = (1000 - damping_permille) * SCALE // 1000
    nodes = rd.range(num_nodes).map_batches(
        lambda t: pa.table({"node": t["id"].cast(pa.int64())}),
        batch_format="pyarrow")

    # (node, rank, outdeg) — outdeg joined once, reused every iteration
    state = hash_bucket_join(
        nodes.map_batches(
            lambda t: t.append_column(
                "rank", pa.array(np.full(t.num_rows, SCALE,
                                         dtype=np.int64))),
            batch_format="pyarrow"),
        deg.map_batches(lambda t: t.rename_columns(["node", "outdeg"]),
                        batch_format="pyarrow"),
        on=["node"], how="left", num_buckets=num_buckets).materialize()

    for _ in range(iters):
        # contributions along edges: join current ranks to edges on src
        ranks_src = state.map_batches(
            lambda t: pa.table({
                "src": t["node"],
                "c": pc.if_else(
                    pc.is_null(t["outdeg"]),
                    pa.scalar(0, type=pa.int64()),
                    pc.divide(t["rank"],
                              pc.coalesce(t["outdeg"],
                                          pa.scalar(1, type=pa.int64())))),
            }), batch_format="pyarrow")
        contrib = (hash_bucket_join(edges, ranks_src, on=["src"],
                                    num_buckets=num_buckets)
                   .groupby("dst").aggregate(Sum("c", alias_name="s")))

        new_rank = hash_bucket_join(
            state.select_columns(["node", "outdeg"]),
            contrib.map_batches(
                lambda t: t.rename_columns(["node", "s"]),
                batch_format="pyarrow"),
            on=["node"], how="left", num_buckets=num_buckets)

        def update(t: pa.Table, _base=base,
                   _d=damping_permille) -> pa.Table:
            s = pc.coalesce(t["s"], pa.scalar(0, type=pa.int64()))
            rank = pc.add(
                pa.scalar(_base, type=pa.int64()),
                pc.divide(pc.multiply(s, pa.scalar(_d, type=pa.int64())),
                          pa.scalar(1000, type=pa.int64())))
            return pa.table({"node": t["node"], "rank": rank,
                             "outdeg": t["outdeg"]})

        state = new_rank.map_batches(update, batch_format="pyarrow") \
            .repartition(num_buckets).materialize()

    return state.map_batches(
        lambda t: t.select(["node", "rank"]), batch_format="pyarrow")
