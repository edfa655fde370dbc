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

Shuffle shape per iteration — exactly TWO sort-groupby exchanges, both
over compact int columns (the first version composed generic
hash_bucket_joins and paid ~8 Dataset executions per iteration; fusing
the join+aggregate into bucket kernels cut the fixed cost ~3x):

1. **scatter**: edges (bucketed once by hash(src), reused every
   iteration) union the rank table (bucketed by the same hash of node);
   one vectorized kernel per bucket maps ranks onto that bucket's edges
   (unique-key searchsorted) and emits PER-DST PARTIAL integer sums —
   at most one row per distinct dst per bucket.
2. **gather**: partials (re-bucketed by hash(dst)) union the node-state
   table; one kernel per bucket folds the partials (``np.add.at``,
   exact int64) and applies the damping update.

Ranks and degrees are (node, int64) tables — never adjacency lists — so
skewed in-degree costs a hot reduce key, not memory; salt a pathological
dst by splitting the gather in two rounds. Node-state blocks stay
bucket-partitioned across iterations (the connected_components lesson:
re-bucketing per iteration keeps the sort shuffle's fan-in flat)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCALE = 10**9


def pagerank(edges, num_nodes: int, iters: int = 5,
             damping_permille: int = 850, num_buckets: int = 32,
             engine: str = "actor"):
    """Integer fixed-point PageRank over an edge Dataset with columns
    ``(src, dst)``; nodes are ``0..num_nodes-1``. Returns a Dataset of
    ``(node, rank)`` with integer ranks on the ``SCALE`` grid. See module
    docstring for semantics, determinism, and the shuffle plan.

    ``engine="actor"`` (default) runs the fused BSP path — resident
    shards, zero Dataset executions inside the loop (bsp.pagerank_bsp,
    round-4 verdict fix #2); ``engine="dataset"`` keeps the streaming
    two-exchange-per-iteration plan below (the spill-friendly path when
    resident state cannot fit). Both are bit-identical (integer sums are
    order-independent; equality asserted in tests/test_round5.py)."""
    if engine == "actor":
        from .bsp import pagerank_bsp

        return pagerank_bsp(edges, num_nodes, iters=iters,
                            damping_permille=damping_permille,
                            num_buckets=num_buckets, weighted=False)
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count

    from .joins import _bucket_of

    # int64 headroom guard (round-3 advisor fix): the gather kernel's
    # worst case is every node's damped mass landing on one sink —
    # num_nodes * SCALE * 1000 must stay below 2^63 or the np.add.at
    # accumulate and the damping multiply wrap silently. ~9.2e6 nodes at
    # the default SCALE; lower SCALE to raise the node bound.
    if num_nodes * SCALE * 1000 >= 2 ** 63:
        raise ValueError(
            f"pagerank int64 overflow: num_nodes ({num_nodes}) * SCALE "
            f"({SCALE}) * 1000 >= 2**63; reduce graph.SCALE "
            f"(grid resolution) to fit {num_nodes} nodes")

    base = (1000 - damping_permille) * SCALE // 1000
    d = damping_permille

    def i64(x) -> pa.Array:
        return pa.array(np.asarray(x, dtype=np.int64))

    # edges, bucketed by hash(src) ONCE and reused every iteration
    def tag_edges(t: pa.Table) -> pa.Table:
        out = pa.table({"src": t["src"].cast(pa.int64()),
                        "dst": t["dst"].cast(pa.int64())})
        return out.append_column("__bucket",
                                 _bucket_of(out, ["src"], num_buckets))

    eb = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()
    deg = eb.groupby("src").aggregate(Count(alias_name="outdeg"))

    # node state (node, rank, outdeg, __bucket) — __bucket = hash(node),
    # the SAME hash as the edges' src bucket, so scatter co-locates
    def init_state(t: pa.Table) -> pa.Table:
        out = pa.table({"node": t["id"].cast(pa.int64())})
        out = out.append_column("rank",
                                i64(np.full(t.num_rows, SCALE)))
        return out.append_column(
            "__bucket", _bucket_of(out, ["node"], num_buckets))

    nodes = rd.range(num_nodes).map_batches(init_state,
                                            batch_format="pyarrow")

    def with_deg(t: pa.Table) -> pa.Table:
        # per-bucket left join of outdeg onto nodes
        t = t.combine_chunks()
        is_node = pc.is_valid(t["node"])
        nt = t.filter(is_node)
        dt = t.filter(pc.invert(is_node))
        n_ids = nt["node"].to_numpy(zero_copy_only=False)
        d_src = dt["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d_deg = dt["outdeg"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(d_src)
        d_src, d_deg = d_src[order], d_deg[order]
        if len(d_src) == 0:                # bucket with no out-edges
            outdeg = np.zeros(len(n_ids), dtype=np.int64)
        else:
            pos = np.searchsorted(d_src, n_ids)
            ok = (pos < len(d_src))
            safe = np.where(ok, pos, 0)
            outdeg = np.where(ok & (d_src[safe] == n_ids),
                              d_deg[safe], 0)
        return pa.table({"node": nt["node"], "rank": nt["rank"],
                         "outdeg": i64(outdeg),
                         "__bucket": nt["__bucket"]})

    deg_tagged = deg.map_batches(
        lambda t: pa.table({
            "src": t["src"], "outdeg": t["outdeg"],
            "node": pa.nulls(t.num_rows, type=pa.int64()),
            "rank": pa.nulls(t.num_rows, type=pa.int64()),
        }).append_column("__bucket", _bucket_of(t, ["src"], num_buckets)),
        batch_format="pyarrow")
    nodes_tagged = nodes.map_batches(
        lambda t: pa.table({
            "src": pa.nulls(t.num_rows, type=pa.int64()),
            "outdeg": pa.nulls(t.num_rows, type=pa.int64()),
            "node": t["node"], "rank": t["rank"],
            "__bucket": t["__bucket"]}),
        batch_format="pyarrow")
    state = (nodes_tagged.union(deg_tagged).groupby("__bucket")
             .map_groups(with_deg, batch_format="pyarrow")
             .repartition(num_buckets).materialize())

    # union schemas for the two per-iteration exchanges
    def scatter_kernel(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = g.combine_chunks()
        is_edge = pc.is_valid(g["dst"])
        et = g.filter(is_edge)
        st = g.filter(pc.invert(is_edge))
        empty = pa.table({"node": pa.array([], type=pa.int64()),
                          "s": pa.array([], type=pa.int64())})
        if et.num_rows == 0 or st.num_rows == 0:
            return empty
        src_e = et["src"].to_numpy(zero_copy_only=False)
        dst_e = et["dst"].to_numpy(zero_copy_only=False)
        node_s = st["node"].to_numpy(zero_copy_only=False)
        rank_s = st["rank"].to_numpy(zero_copy_only=False)
        deg_s = st["outdeg"].to_numpy(zero_copy_only=False)
        # contribution of each state node: rank // outdeg (0 if dangling)
        c_s = np.where(deg_s > 0, rank_s // np.maximum(deg_s, 1), 0)
        order = np.argsort(node_s)            # unique node ids
        ns, cs = node_s[order], c_s[order]
        pos = np.searchsorted(ns, src_e)
        ok = pos < len(ns)
        safe = np.where(ok, pos, 0)
        ok &= ns[safe] == src_e
        c_e = cs[safe][ok]
        dsts = dst_e[ok]
        codes, inv = np.unique(dsts, return_inverse=True)
        acc = np.zeros(len(codes), dtype=np.int64)
        np.add.at(acc, inv, c_e)
        return pa.table({"node": i64(codes), "s": i64(acc)})

    def gather_kernel(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = g.combine_chunks()
        is_state = pc.is_valid(g["rank"])
        st = g.filter(is_state)
        pt = g.filter(pc.invert(is_state))
        node_s = st["node"].to_numpy(zero_copy_only=False)
        order = np.argsort(node_s)
        acc = np.zeros(st.num_rows, dtype=np.int64)
        if pt.num_rows:
            node_p = pt["node"].to_numpy(zero_copy_only=False)
            s_p = pt["s"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(node_s[order], node_p)
            ok = pos < st.num_rows
            safe = np.where(ok, pos, 0)
            ok &= node_s[order][safe] == node_p
            np.add.at(acc, order[safe[ok]], s_p[ok])
        rank = base + (acc * np.int64(d)) // np.int64(1000)
        return pa.table({"node": st["node"], "rank": i64(rank),
                         "outdeg": st["outdeg"],
                         "__bucket": st["__bucket"]})

    for _ in range(iters):
        ranks_side = state.map_batches(
            lambda t: pa.table({
                "src": pa.nulls(t.num_rows, type=pa.int64()),
                "dst": pa.nulls(t.num_rows, type=pa.int64()),
                "node": t["node"], "rank": t["rank"],
                "outdeg": t["outdeg"], "__bucket": t["__bucket"]}),
            batch_format="pyarrow")
        edges_side = eb.map_batches(
            lambda t: pa.table({
                "src": t["src"], "dst": t["dst"],
                "node": pa.nulls(t.num_rows, type=pa.int64()),
                "rank": pa.nulls(t.num_rows, type=pa.int64()),
                "outdeg": pa.nulls(t.num_rows, type=pa.int64()),
                "__bucket": t["__bucket"]}),
            batch_format="pyarrow")
        partials = (edges_side.union(ranks_side).groupby("__bucket")
                    .map_groups(scatter_kernel, batch_format="pyarrow"))

        partials_side = partials.map_batches(
            lambda t: pa.table({
                "node": t["node"], "s": t["s"],
                "rank": pa.nulls(t.num_rows, type=pa.int64()),
                "outdeg": pa.nulls(t.num_rows, type=pa.int64()),
            }).append_column("__bucket",
                             _bucket_of(t, ["node"], num_buckets)),
            batch_format="pyarrow")
        state_side = state.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "s": pa.nulls(t.num_rows, type=pa.int64()),
                "rank": t["rank"], "outdeg": t["outdeg"],
                "__bucket": t["__bucket"]}),
            batch_format="pyarrow")
        state = (partials_side.union(state_side).groupby("__bucket")
                 .map_groups(gather_kernel, batch_format="pyarrow")
                 .repartition(num_buckets).materialize())

    return state.map_batches(
        lambda t: t.select(["node", "rank"]), batch_format="pyarrow")


def resolve_redirects(edges, hop_cap: int = 8, num_buckets: int = 32,
                      engine: str = "actor"):
    """Redirect-chain resolution over ``(src, dst)`` redirect edges — the
    other classic post-crawl link job: every crawler accumulates a
    redirect map (301/302/canonical rows) and needs, per source URL, the
    FINAL destination, the hop count, and loop detection before URL-seen
    merging and per-host accounting can treat redirected aliases as one
    page. The reference follows redirects inline per fetch (scrapelib);
    at 100 TB the map is a table and resolution is a batch job.

    Algorithm: **pointer doubling** (the textbook parallel
    list-ranking/path-compression step). State rows ``(src, cur, hops)``
    start as the edges themselves; each round composes the state with
    itself — ``cur -> state[cur]`` where present, accumulating exact hop
    counts — so after k rounds every source has advanced
    ``min(2^k, distance-to-terminal)`` hops. ``log2(hop_cap)`` rounds
    resolve every chain of length <= ``hop_cap``; sources still pointing
    at a redirecting URL after the final round are in (or feed into) a
    loop longer than ``hop_cap`` and are flagged ``is_cycle`` (final_url
    '', hops -1) — the same convention a recursion-bounded SQL mirror
    produces, so the oracle is exact. ``hop_cap`` must be a power of two
    (the round reach and the cap must coincide or the two conventions
    diverge between ``hop_cap`` and ``2^rounds``).

    Precondition: ``src`` is unique (a redirect map is a function; HTTP
    gives one Location per URL). Duplicate srcs would fan out the
    composition join.

    Shuffle shape: ``log2(hop_cap) + 1`` hash-bucket exchanges of narrow
    (src, cur, hops) rows — no driver materialization, no broadcast;
    per-bucket memory is O(rows/buckets). Each round is FUSED: the state
    materializes once and feeds both sides of the self-join (probe rows
    bucketed by hash(cur), map rows by hash(src), same hash), and the
    per-bucket kernel composes in place — a generic two-sided
    ``hash_bucket_join`` per round would materialize the same rows twice
    and pay an extra post-join pass (the first version did; ~2x the
    Dataset executions for identical output). Returns a Dataset of
    ``(src_url, final_url, hops, is_cycle)``, one row per source.
    """
    if engine == "actor":
        # fused BSP pointer doubling (bsp.resolve_redirects_bsp):
        # bit-identical, zero Dataset executions inside the rounds
        from .bsp import resolve_redirects_bsp

        return resolve_redirects_bsp(edges, hop_cap=hop_cap,
                                     num_buckets=num_buckets)

    import pandas as pd

    from .joins import _bucket_of

    rounds = int(np.log2(hop_cap))
    if 2 ** rounds != hop_cap:
        raise ValueError(f"hop_cap must be a power of two, got {hop_cap}")

    def init(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["src"], "cur": t["dst"],
                         "hops": pa.array(np.ones(t.num_rows,
                                                  dtype=np.int64))})

    state = edges.map_batches(init, batch_format="pyarrow")

    # tag one materialized state twice: probe rows keyed by cur, map
    # rows keyed by src. key is a separate column so both sides bucket
    # through the identical _bucket_of(["key"]).
    def tag(side: int, key_col: str):
        def fn(t: pa.Table) -> pa.Table:
            out = pa.table({
                "key": t[key_col], "src": t["src"], "cur": t["cur"],
                "hops": t["hops"],
            })
            out = out.append_column(
                "__bucket", _bucket_of(out, ["key"], num_buckets))
            return out.append_column(
                "__side", pa.array(np.full(t.num_rows, side,
                                           dtype=np.int8)))
        return fn

    def compose_kernel(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        m = df[df["__side"] == 1].set_index("key")
        p = df[df["__side"] == 0]
        nxt = p["key"].map(m["cur"])           # key == p.cur
        h2 = p["key"].map(m["hops"])
        cur = nxt.fillna(p["cur"])
        hops = (p["hops"] + h2.fillna(0)).astype(np.int64)
        return pa.table({
            "src": pa.array(p["src"].to_numpy(), type=pa.string()),
            "cur": pa.array(cur.to_numpy(), type=pa.string()),
            "hops": pa.array(hops.to_numpy()),
        })

    for _ in range(rounds):
        st = state.materialize()
        u = st.map_batches(tag(0, "cur"), batch_format="pyarrow").union(
            st.map_batches(tag(1, "src"), batch_format="pyarrow"))
        state = u.groupby("__bucket").map_groups(
            compose_kernel, batch_format="pyarrow")

    # terminal test, same fused shape: cur still appearing as a source
    # => unresolved (loop or chain longer than hop_cap). src is unique,
    # so the lookup cannot multiply rows.
    def tag_srcs(t: pa.Table) -> pa.Table:
        out = pa.table({
            "key": t["src"],
            "src": pa.nulls(t.num_rows, type=pa.string()),
            "cur": pa.nulls(t.num_rows, type=pa.string()),
            "hops": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
        })
        out = out.append_column(
            "__bucket", _bucket_of(out, ["key"], num_buckets))
        return out.append_column(
            "__side", pa.array(np.ones(t.num_rows, dtype=np.int8)))

    def finish_kernel(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        src_set = set(df.loc[df["__side"] == 1, "key"])
        p = df[df["__side"] == 0]
        cyc = p["key"].isin(src_set).to_numpy()
        return pa.table({
            "src_url": pa.array(p["src"].to_numpy(), type=pa.string()),
            "final_url": pa.array(
                np.where(cyc, "", p["cur"].to_numpy()),
                type=pa.string()),
            "hops": pa.array(
                np.where(cyc, -1, p["hops"].to_numpy()).astype(np.int64)),
            "is_cycle": pa.array(cyc),
        })

    u = state.materialize().map_batches(tag(0, "cur"),
                                        batch_format="pyarrow").union(
        edges.map_batches(tag_srcs, batch_format="pyarrow"))
    return u.groupby("__bucket").map_groups(
        finish_kernel, batch_format="pyarrow")


def anchor_topk(links, k: int = 3, num_buckets: int = 32):
    """Inbound anchor-text aggregation — the classic web-search /
    web-corpus signal (Brin & Page '98 §2.2; anchor text often describes
    a target better than the target's own body, and is the standard
    title/label source for pages a crawler never fetched). Per target
    URL: the top-``k`` inbound anchor strings by total inbound-link
    count, ties broken anchor-ascending.

    Input: ``(src_url, dst_url, anchor)`` link rows (one per ``<a>``
    span the parser emitted). Output: ``(dst_url, anchor, n_links,
    rank)`` with ``rank`` in 1..k per dst (count desc, anchor asc — a
    total order, so cross-engine exact).

    Scale shape: per-batch Arrow ``group_by`` pre-combines duplicate
    (dst, anchor) pairs BEFORE anything moves (a nav template linking
    "home" a million times collapses to one partial per block), then
    ONE hash(dst)-bucket exchange of ``(dst, anchor, c)`` partial rows
    and a per-bucket C-path pandas fold + rank filter. Anchors shuffle
    once as block-distinct narrow strings; src URLs never move. A hot
    dst (everyone links the front page) costs a hot reduce key bounded
    by its distinct-anchor vocabulary, not its in-degree."""
    import pandas as pd
    import pyarrow.compute as pc

    from .joins import _bucket_of

    def partial(t: pa.Table) -> pa.Table:
        # drop null anchors up front: a null group's count('anchor') is
        # 0 and would otherwise occupy a top-k rank slot
        t = t.filter(pc.is_valid(t["anchor"]))
        g = (pa.table({"dst_url": t["dst_url"], "anchor": t["anchor"]})
             .group_by(["dst_url", "anchor"])
             .aggregate([("anchor", "count")]))
        out = pa.table({"dst_url": g["dst_url"], "anchor": g["anchor"],
                        "c": pa.array(g["anchor_count"].to_numpy(
                            zero_copy_only=False).astype(np.int64))})
        return out.append_column(
            "__bucket", _bucket_of(out, ["dst_url"], num_buckets))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "dst_url": pd.Series(dtype="object"),
                "anchor": pd.Series(dtype="object"),
                "n_links": pd.Series(dtype="int64"),
                "rank": pd.Series(dtype="int64")})
        out = (df.groupby(["dst_url", "anchor"], sort=False)["c"]
               .sum().reset_index(name="n_links"))
        out = out.sort_values(["dst_url", "n_links", "anchor"],
                              ascending=[True, False, True],
                              kind="mergesort")
        out["rank"] = out.groupby("dst_url", sort=False).cumcount() + 1
        out = out[out["rank"] <= k].reset_index(drop=True)
        out["n_links"] = out["n_links"].astype("int64")
        out["rank"] = out["rank"].astype("int64")
        return out

    return (links.map_batches(partial, batch_format="pyarrow")
            .groupby("__bucket").map_groups(fold, batch_format="pandas"))


def host_link_graph(links, num_buckets: int = 32):
    """Host-level link-graph compression — the first step of every
    web-graph pipeline (WebGraph/Common Crawl host graphs): collapse
    page-level ``(src_url, dst_url)`` edges to one row per ordered host
    pair with ``n_links`` (total page-level links) and ``n_src_pages``
    (distinct linking pages). Feeds host-rank, spam-farm detection, and
    per-host politeness budgets; at 10^10 URLs the page graph is too
    wide to iterate, the host graph is ~10^7 nodes.

    Hosts are extracted with a vectorized RE2 authority match
    (lowercased); rows whose src or dst has no ``scheme://host`` prefix
    are dropped (relative/junk links). Scale shape: per-batch Arrow
    ``group_by`` pre-reduces to block-distinct ``(src_host, dst_host,
    src_url, c)`` partials (so a page's repeated links collapse
    locally), ONE hash(src_host, dst_host)-bucket exchange, and a
    per-bucket fold computing the sum and the exact distinct-src count.
    Bodies/anchors never move; the only strings that shuffle are hosts
    and block-distinct src URLs."""
    import pandas as pd
    import pyarrow.compute as pc

    from .joins import _bucket_of

    host_re = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)"

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        src = pc.cast(t["src_url"], pa.string())
        sh = pc.utf8_lower(pc.struct_field(
            pc.extract_regex(src, host_re.replace("([^/?#]+)",
                                                  "(?P<h>[^/?#]+)")), "h"))
        dh = pc.utf8_lower(pc.struct_field(
            pc.extract_regex(pc.cast(t["dst_url"], pa.string()),
                             host_re.replace("([^/?#]+)",
                                             "(?P<h>[^/?#]+)")), "h"))
        keep = pc.and_(pc.is_valid(sh), pc.is_valid(dh))
        base = pa.table({"src_host": sh, "dst_host": dh,
                         "src_url": src}).filter(keep)
        g = (base.group_by(["src_host", "dst_host", "src_url"])
             .aggregate([("src_url", "count")]))
        out = pa.table({
            "src_host": g["src_host"], "dst_host": g["dst_host"],
            "src_url": g["src_url"],
            "c": pa.array(g["src_url_count"].to_numpy(
                zero_copy_only=False).astype(np.int64))})
        return out.append_column(
            "__bucket", _bucket_of(out, ["src_host", "dst_host"],
                                   num_buckets))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "src_host": pd.Series(dtype="object"),
                "dst_host": pd.Series(dtype="object"),
                "n_links": pd.Series(dtype="int64"),
                "n_src_pages": pd.Series(dtype="int64")})
        out = (df.groupby(["src_host", "dst_host"], sort=False)
               .agg(n_links=("c", "sum"),
                    n_src_pages=("src_url", "nunique"))
               .reset_index())
        out["n_links"] = out["n_links"].astype("int64")
        out["n_src_pages"] = out["n_src_pages"].astype("int64")
        return out

    return (links.map_batches(partial, batch_format="pyarrow")
            .groupby("__bucket").map_groups(fold, batch_format="pandas"))


def outlink_diversity(links, num_buckets: int = 32):
    """Per-page outbound-link diversity — the classic link-spam / boilerplate
    signal (Fetterly et al. WebDB'04 use outlink statistics as a primary
    spam discriminator; SEO link farms show near-zero external fraction,
    scraped mirrors near-one): per source page, total outbound links,
    distinct destination hosts, links leaving the source's own host, and
    the external fraction in exact micro-units.

    Input: ``(src_url, dst_url)`` link rows (one per ``<a>`` span; the
    anchor column, if present, is ignored). Rows whose src or dst lacks a
    parseable ``scheme://host`` authority are dropped (relative/junk
    links), matching :func:`host_link_graph`. Output: ``(src_url,
    n_links, n_hosts, n_external, external_micro)`` with
    ``external_micro = floor(n_external * 1e6 / n_links + 0.5)`` —
    integer operands through one IEEE divide, so cross-engine exact.

    Scale shape: per-batch Arrow ``group_by`` pre-reduces to
    block-distinct ``(src_url, dst_host, c)`` partials (a template
    linking the same host 500 times collapses to one row per block;
    src_host rides along as a functional dependent of src_url), then ONE
    hash(src_url)-bucket exchange and a per-bucket pandas C-path fold.
    Bodies and anchors never move; a hot src (a directory page with 10^5
    outlinks) costs a reduce key bounded by its distinct-host fan-out."""
    import pandas as pd
    import pyarrow.compute as pc

    from .joins import _bucket_of

    host_re = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?P<h>[^/?#]+)"

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        src = pc.cast(t["src_url"], pa.string())
        sh = pc.utf8_lower(pc.struct_field(
            pc.extract_regex(src, host_re), "h"))
        dh = pc.utf8_lower(pc.struct_field(
            pc.extract_regex(pc.cast(t["dst_url"], pa.string()), host_re),
            "h"))
        keep = pc.and_(pc.is_valid(sh), pc.is_valid(dh))
        base = pa.table({"src_url": src, "src_host": sh,
                         "dst_host": dh}).filter(keep)
        g = (base.group_by(["src_url", "src_host", "dst_host"])
             .aggregate([("dst_host", "count")]))
        out = pa.table({
            "src_url": g["src_url"], "src_host": g["src_host"],
            "dst_host": g["dst_host"],
            "c": pa.array(g["dst_host_count"].to_numpy(
                zero_copy_only=False).astype(np.int64))})
        return out.append_column(
            "__bucket", _bucket_of(out, ["src_url"], num_buckets))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "src_url": pd.Series(dtype="object"),
                "n_links": pd.Series(dtype="int64"),
                "n_hosts": pd.Series(dtype="int64"),
                "n_external": pd.Series(dtype="int64"),
                "external_micro": pd.Series(dtype="int64")})
        ext = df["c"].to_numpy() * (df["dst_host"].to_numpy()
                                    != df["src_host"].to_numpy())
        df = df.assign(ext=ext)
        out = (df.groupby("src_url", sort=False)
               .agg(n_links=("c", "sum"), n_hosts=("dst_host", "nunique"),
                    n_external=("ext", "sum"))
               .reset_index())
        nl = out["n_links"].to_numpy().astype(np.int64)
        ne = out["n_external"].to_numpy().astype(np.int64)
        out["external_micro"] = np.floor(
            ne * 1_000_000 / nl + 0.5).astype(np.int64)
        for c in ("n_links", "n_hosts", "n_external"):
            out[c] = out[c].astype("int64")
        return out

    return (links.map_batches(partial, batch_format="pyarrow")
            .groupby("__bucket").map_groups(fold, batch_format="pandas"))


HITS_SCALE = 10**6


def hits(edges, num_nodes: int, iters: int = 3, num_buckets: int = 32,
         engine: str = "actor"):
    """Integer fixed-point HITS (Kleinberg '99, "Authoritative sources
    in a hyperlinked environment") over an edge Dataset ``(src, dst)``
    with nodes ``0..num_nodes-1`` — the hub/authority dual of
    :func:`pagerank`, the other classic post-crawl ranking job (spam-farm
    hubs and authority seeds for crawl prioritization).

    Semantics per iteration (max-normalized variant, normalize after
    EACH half-step, documented so the oracle matches): ``raw_a[v] =
    sum over in-edges (u, v) of h[u]``; ``a = raw_a * HITS_SCALE //
    max(raw_a)`` (all-integer floor division, 0 when the max is 0);
    then ``raw_h[u] = sum over out-edges (u, v) of a[v]`` and the same
    normalization for ``h``. ``a0 = h0 = HITS_SCALE``. Every op is
    int64 addition / multiply / floor-division, so the result is
    order-independent under Ray's shuffle and bit-identical to a DuckDB
    unroll. Range guard: ``num_nodes * HITS_SCALE**2 < 2**63`` (~9.2M
    nodes at the default grid; lower HITS_SCALE for bigger graphs —
    precision trades against range explicitly, the pagerank convention).

    Shuffle shape per iteration: FOUR bucket exchanges (a-scatter,
    a-gather, h-scatter, h-gather — two directions instead of
    pagerank's one) plus two counts-only global ``max`` reduces for the
    normalizers (1 row each to the driver; the normalized update is a
    streaming map with a broadcast scalar). Edges are bucketed ONCE per
    direction (hash(src) and hash(dst)) and reused every iteration;
    everything that moves is (int64, int64) rows."""
    if engine == "actor":
        from .bsp import hits_bsp

        return hits_bsp(edges, num_nodes, iters=iters,
                        num_buckets=num_buckets)

    import pyarrow.compute as pc
    import ray.data as rd

    from .joins import _bucket_of

    if num_nodes * HITS_SCALE * HITS_SCALE >= 2 ** 63:
        raise ValueError(
            f"hits int64 overflow: num_nodes ({num_nodes}) * "
            f"HITS_SCALE^2 >= 2**63; reduce graph.HITS_SCALE")

    def i64(x) -> pa.Array:
        return pa.array(np.asarray(x, dtype=np.int64))

    def tag_edges(key):
        def fn(t: pa.Table) -> pa.Table:
            out = pa.table({"src": t["src"].cast(pa.int64()),
                            "dst": t["dst"].cast(pa.int64())})
            return out.append_column(
                "__bucket", _bucket_of(out, [key], num_buckets))
        return fn

    eb_src = edges.map_batches(tag_edges("src"),
                               batch_format="pyarrow").materialize()
    eb_dst = edges.map_batches(tag_edges("dst"),
                               batch_format="pyarrow").materialize()

    def init_state(t: pa.Table) -> pa.Table:
        out = pa.table({"node": t["id"].cast(pa.int64())})
        out = out.append_column("h", i64(np.full(t.num_rows, HITS_SCALE)))
        out = out.append_column("a", i64(np.full(t.num_rows, HITS_SCALE)))
        return out.append_column(
            "__bucket", _bucket_of(out, ["node"], num_buckets))

    state = rd.range(num_nodes).map_batches(
        init_state, batch_format="pyarrow").materialize()

    def scatter(st, eb, join_key: str, val_col: str, emit_key: str):
        """join state[val_col] onto edges at join_key (= node id), emit
        per-emit_key partial sums — one row per distinct emit_key per
        bucket."""
        state_side = st.map_batches(
            lambda t: pa.table({
                "src": pa.nulls(t.num_rows, type=pa.int64()),
                "dst": pa.nulls(t.num_rows, type=pa.int64()),
                "node": t["node"], "val": t[val_col],
                "__bucket": t["__bucket"]}),
            batch_format="pyarrow")
        edges_side = eb.map_batches(
            lambda t: pa.table({
                "src": t["src"], "dst": t["dst"],
                "node": pa.nulls(t.num_rows, type=pa.int64()),
                "val": pa.nulls(t.num_rows, type=pa.int64()),
                "__bucket": t["__bucket"]}),
            batch_format="pyarrow")

        def kernel(g: pa.Table) -> pa.Table:
            g = g.combine_chunks()
            is_edge = pc.is_valid(g["dst"])
            et = g.filter(is_edge)
            st_ = g.filter(pc.invert(is_edge))
            if et.num_rows == 0 or st_.num_rows == 0:
                return pa.table({"node": pa.array([], type=pa.int64()),
                                 "s": pa.array([], type=pa.int64())})
            jk = et[join_key].to_numpy(zero_copy_only=False)
            ek = et[emit_key].to_numpy(zero_copy_only=False)
            ns = st_["node"].to_numpy(zero_copy_only=False)
            vs = st_["val"].to_numpy(zero_copy_only=False)
            order = np.argsort(ns)
            ns, vs = ns[order], vs[order]
            pos = np.searchsorted(ns, jk)
            ok = pos < len(ns)
            safe = np.where(ok, pos, 0)
            ok &= ns[safe] == jk
            vals = vs[safe][ok]
            keys = ek[ok]
            codes, inv = np.unique(keys, return_inverse=True)
            acc = np.zeros(len(codes), dtype=np.int64)
            np.add.at(acc, inv, vals)
            return pa.table({"node": i64(codes), "s": i64(acc)})

        return (edges_side.union(state_side).groupby("__bucket")
                .map_groups(kernel, batch_format="pyarrow"))

    def gather_raw(st, partials, raw_col: str):
        """fold per-node partials into the state as raw_col (0 default)."""
        partials_side = partials.map_batches(
            lambda t: pa.table({
                "node": t["node"], "s": t["s"],
                "h": pa.nulls(t.num_rows, type=pa.int64()),
                "a": pa.nulls(t.num_rows, type=pa.int64()),
            }).append_column("__bucket",
                             _bucket_of(t, ["node"], num_buckets)),
            batch_format="pyarrow")
        state_side = st.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "s": pa.nulls(t.num_rows, type=pa.int64()),
                "h": t["h"], "a": t["a"], "__bucket": t["__bucket"]}),
            batch_format="pyarrow")

        def kernel(g: pa.Table) -> pa.Table:
            g = g.combine_chunks()
            is_state = pc.is_valid(g["h"])
            st_ = g.filter(is_state)
            pt = g.filter(pc.invert(is_state))
            ns = st_["node"].to_numpy(zero_copy_only=False)
            order = np.argsort(ns)
            acc = np.zeros(st_.num_rows, dtype=np.int64)
            if pt.num_rows:
                np_ = pt["node"].to_numpy(zero_copy_only=False)
                sp = pt["s"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(ns[order], np_)
                ok = pos < st_.num_rows
                safe = np.where(ok, pos, 0)
                ok &= ns[order][safe] == np_
                np.add.at(acc, order[safe[ok]], sp[ok])
            cols = {"node": st_["node"], "h": st_["h"], "a": st_["a"],
                    "__bucket": st_["__bucket"]}
            cols[raw_col] = i64(acc)
            return pa.table(cols)

        return (partials_side.union(state_side).groupby("__bucket")
                .map_groups(kernel, batch_format="pyarrow")
                .repartition(num_buckets).materialize())

    def normalize(st, raw_col: str, out_col: str):
        rmax = int(st.max(raw_col) or 0)

        def fn(t: pa.Table) -> pa.Table:
            raw = t[raw_col].to_numpy(zero_copy_only=False)
            if rmax > 0:
                newv = raw * np.int64(HITS_SCALE) // np.int64(rmax)
            else:
                newv = np.zeros(len(raw), dtype=np.int64)
            cols = {"node": t["node"], "h": t["h"], "a": t["a"],
                    "__bucket": t["__bucket"]}
            cols[out_col] = i64(newv)
            return pa.table(cols)

        return st.map_batches(fn, batch_format="pyarrow")

    for _ in range(iters):
        # authority step: a[v] <- sum of h over in-edges, then normalize
        pa_ = scatter(state, eb_src, "src", "h", "dst")
        state = gather_raw(state, pa_, "ra")
        state = normalize(state, "ra", "a").materialize()
        # hub step: h[u] <- sum of NEW a over out-edges, then normalize
        ph = scatter(state, eb_dst, "dst", "a", "src")
        state = gather_raw(state, ph, "rh")
        state = normalize(state, "rh", "h").materialize()

    return state.map_batches(
        lambda t: pa.table({"node": t["node"], "hub": t["h"],
                            "auth": t["a"]}),
        batch_format="pyarrow")


def pagerank_weighted(edges, num_nodes: int, iters: int = 5,
                      damping_permille: int = 850,
                      num_buckets: int = 32, engine: str = "actor"):
    """Weighted integer fixed-point PageRank over ``(src, dst, w)``
    edges — the host-graph variant (a host pair carrying 10^4 page
    links must pull more rank than a single stray link; unweighted
    PageRank over a compressed host graph discards exactly that
    signal). Same grid, damping and exchange plan as :func:`pagerank`;
    the per-edge contribution becomes ``rank * w // W_u`` (``W_u`` =
    total out-weight), computed in int64 WITHOUT 128-bit arithmetic via
    the exact split ``(r // W) * w + ((r % W) * w) // W`` — identical
    to a HUGEINT ``r * w // W`` in the SQL mirror because
    ``r = qW + s  =>  rw // W = qw + sw // W``.

    Int64 range guards: the pagerank node bound, plus
    ``max(w) * max(W_u) < 2**63`` so the split's middle product never
    wraps (checked with two cheap aggregates at entry — weights are
    link counts, so this holds until a single host pair carries ~10^9
    links against a 10^9-weight hub)."""
    if engine == "actor":
        from .bsp import pagerank_bsp

        return pagerank_bsp(edges, num_nodes, iters=iters,
                            damping_permille=damping_permille,
                            num_buckets=num_buckets, weighted=True)

    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .joins import _bucket_of

    if num_nodes * SCALE * 1000 >= 2 ** 63:
        raise ValueError(
            f"pagerank_weighted int64 overflow: num_nodes ({num_nodes})"
            f" * SCALE ({SCALE}) * 1000 >= 2**63")

    base = (1000 - damping_permille) * SCALE // 1000
    d = damping_permille

    def i64(x) -> pa.Array:
        return pa.array(np.asarray(x, dtype=np.int64))

    def tag_edges(t: pa.Table) -> pa.Table:
        out = pa.table({"src": t["src"].cast(pa.int64()),
                        "dst": t["dst"].cast(pa.int64()),
                        "w": t["w"].cast(pa.int64())})
        return out.append_column("__bucket",
                                 _bucket_of(out, ["src"], num_buckets))

    eb = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()
    wdeg = eb.groupby("src").aggregate(Sum("w", alias_name="wout"))
    max_w = int(eb.max("w") or 0)
    max_W = int(wdeg.max("wout") or 0)
    if max_w > 0 and max_w * max_W >= 2 ** 63:
        raise ValueError("pagerank_weighted int64 overflow: "
                         f"max(w)={max_w} * max(W)={max_W} >= 2**63")

    def init_state(t: pa.Table) -> pa.Table:
        out = pa.table({"node": t["id"].cast(pa.int64())})
        out = out.append_column("rank", i64(np.full(t.num_rows, SCALE)))
        return out.append_column(
            "__bucket", _bucket_of(out, ["node"], num_buckets))

    nodes = rd.range(num_nodes).map_batches(init_state,
                                            batch_format="pyarrow")

    def with_deg(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        is_node = pc.is_valid(t["node"])
        nt = t.filter(is_node)
        dt = t.filter(pc.invert(is_node))
        n_ids = nt["node"].to_numpy(zero_copy_only=False)
        d_src = dt["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d_deg = dt["wout"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(d_src)
        d_src, d_deg = d_src[order], d_deg[order]
        if len(d_src) == 0:                # bucket with no out-edges
            wout = np.zeros(len(n_ids), dtype=np.int64)
        else:
            pos = np.searchsorted(d_src, n_ids)
            ok = (pos < len(d_src))
            safe = np.where(ok, pos, 0)
            wout = np.where(ok & (d_src[safe] == n_ids), d_deg[safe], 0)
        return pa.table({"node": nt["node"], "rank": nt["rank"],
                         "wout": i64(wout), "__bucket": nt["__bucket"]})

    deg_tagged = wdeg.map_batches(
        lambda t: pa.table({
            "src": t["src"], "wout": t["wout"],
            "node": pa.nulls(t.num_rows, type=pa.int64()),
            "rank": pa.nulls(t.num_rows, type=pa.int64()),
        }).append_column("__bucket", _bucket_of(t, ["src"], num_buckets)),
        batch_format="pyarrow")
    nodes_tagged = nodes.map_batches(
        lambda t: pa.table({
            "src": pa.nulls(t.num_rows, type=pa.int64()),
            "wout": pa.nulls(t.num_rows, type=pa.int64()),
            "node": t["node"], "rank": t["rank"],
            "__bucket": t["__bucket"]}),
        batch_format="pyarrow")
    state = (nodes_tagged.union(deg_tagged).groupby("__bucket")
             .map_groups(with_deg, batch_format="pyarrow")
             .repartition(num_buckets).materialize())

    def scatter_kernel(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        is_edge = pc.is_valid(g["dst"])
        et = g.filter(is_edge)
        st = g.filter(pc.invert(is_edge))
        empty = pa.table({"node": pa.array([], type=pa.int64()),
                          "s": pa.array([], type=pa.int64())})
        if et.num_rows == 0 or st.num_rows == 0:
            return empty
        src_e = et["src"].to_numpy(zero_copy_only=False)
        dst_e = et["dst"].to_numpy(zero_copy_only=False)
        w_e = et["w"].to_numpy(zero_copy_only=False)
        node_s = st["node"].to_numpy(zero_copy_only=False)
        rank_s = st["rank"].to_numpy(zero_copy_only=False)
        deg_s = st["wout"].to_numpy(zero_copy_only=False)
        order = np.argsort(node_s)
        ns = node_s[order]
        rs, ws = rank_s[order], deg_s[order]
        pos = np.searchsorted(ns, src_e)
        ok = pos < len(ns)
        safe = np.where(ok, pos, 0)
        ok &= ns[safe] == src_e
        r_e = rs[safe][ok]
        W_e = ws[safe][ok]
        w_ok = w_e[ok]
        dsts = dst_e[ok]
        Wc = np.maximum(W_e, 1)
        # exact split of rank * w // W without 128-bit intermediates
        c_e = np.where(
            W_e > 0,
            (r_e // Wc) * w_ok + ((r_e % Wc) * w_ok) // Wc, 0)
        codes, inv = np.unique(dsts, return_inverse=True)
        acc = np.zeros(len(codes), dtype=np.int64)
        np.add.at(acc, inv, c_e)
        return pa.table({"node": i64(codes), "s": i64(acc)})

    def gather_kernel(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        is_state = pc.is_valid(g["rank"])
        st = g.filter(is_state)
        pt = g.filter(pc.invert(is_state))
        node_s = st["node"].to_numpy(zero_copy_only=False)
        order = np.argsort(node_s)
        acc = np.zeros(st.num_rows, dtype=np.int64)
        if pt.num_rows:
            node_p = pt["node"].to_numpy(zero_copy_only=False)
            s_p = pt["s"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(node_s[order], node_p)
            ok = pos < st.num_rows
            safe = np.where(ok, pos, 0)
            ok &= node_s[order][safe] == node_p
            np.add.at(acc, order[safe[ok]], s_p[ok])
        rank = base + (acc * np.int64(d)) // np.int64(1000)
        return pa.table({"node": st["node"], "rank": i64(rank),
                         "wout": st["wout"], "__bucket": st["__bucket"]})

    for _ in range(iters):
        ranks_side = state.map_batches(
            lambda t: pa.table({
                "src": pa.nulls(t.num_rows, type=pa.int64()),
                "dst": pa.nulls(t.num_rows, type=pa.int64()),
                "w": pa.nulls(t.num_rows, type=pa.int64()),
                "node": t["node"], "rank": t["rank"],
                "wout": t["wout"], "__bucket": t["__bucket"]}),
            batch_format="pyarrow")
        edges_side = eb.map_batches(
            lambda t: pa.table({
                "src": t["src"], "dst": t["dst"], "w": t["w"],
                "node": pa.nulls(t.num_rows, type=pa.int64()),
                "rank": pa.nulls(t.num_rows, type=pa.int64()),
                "wout": pa.nulls(t.num_rows, type=pa.int64()),
                "__bucket": t["__bucket"]}),
            batch_format="pyarrow")
        partials = (edges_side.union(ranks_side).groupby("__bucket")
                    .map_groups(scatter_kernel, batch_format="pyarrow"))

        partials_side = partials.map_batches(
            lambda t: pa.table({
                "node": t["node"], "s": t["s"],
                "rank": pa.nulls(t.num_rows, type=pa.int64()),
                "wout": pa.nulls(t.num_rows, type=pa.int64()),
            }).append_column("__bucket",
                             _bucket_of(t, ["node"], num_buckets)),
            batch_format="pyarrow")
        state_side = state.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "s": pa.nulls(t.num_rows, type=pa.int64()),
                "rank": t["rank"], "wout": t["wout"],
                "__bucket": t["__bucket"]}),
            batch_format="pyarrow")
        state = (partials_side.union(state_side).groupby("__bucket")
                 .map_groups(gather_kernel, batch_format="pyarrow")
                 .repartition(num_buckets).materialize())

    return state.map_batches(
        lambda t: t.select(["node", "rank"]), batch_format="pyarrow")


def reciprocal_edges(edges, num_buckets: int = 32):
    """Reciprocal-link audit over ``(src, dst)`` edges — the classic
    link-spam / link-exchange signal (organic web graphs are ~25%
    reciprocal at host level; link farms approach 100%): per src node,
    its out-degree, the number of out-edges whose reverse edge exists,
    and the reciprocal fraction in exact micro-units. Self-loops are
    excluded (trivially reciprocal).

    Shape: each edge emits ONE row keyed by its unordered pair
    (min, max) plus its src; ONE pair-bucket exchange co-locates both
    directions (the direction bit is derived in-kernel as src == lo),
    the per-bucket kernel marks pairs seen in both directions, and a
    second node-bucket fold sums per src. Both exchanges move 3-int
    value rows (lo, hi, src / src, out, recip) plus the bucket tag."""
    import pandas as pd
    import pyarrow.compute as pc

    from .joins import _bucket_of

    def pair_rows(t: pa.Table) -> pa.Table:
        s = t["src"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = t["dst"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        out = pa.table({
            "lo": pa.array(lo), "hi": pa.array(hi),
            "src": pa.array(s),
        })
        return out.append_column(
            "__bucket", _bucket_of(out, ["lo", "hi"], num_buckets))

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "src": pd.Series(dtype="int64"),
                "out": pd.Series(dtype="int64"),
                "recip": pd.Series(dtype="int64")})
        # distinct directions per unordered pair (parallel edges count
        # once); direction bit derived in-kernel: src == lo iff forward
        g = g.drop_duplicates(["lo", "hi", "src"])
        fwd = (g["src"].to_numpy(dtype=np.int64)
               == g["lo"].to_numpy(dtype=np.int64))
        both = (pd.Series(fwd, index=g.index)
                .groupby([g["lo"], g["hi"]], sort=False)
                .transform("nunique") == 2)
        return pd.DataFrame({
            "src": g["src"].to_numpy(dtype=np.int64),
            "out": np.ones(len(g), dtype=np.int64),
            "recip": both.to_numpy().astype(np.int64)})

    marked = (edges.map_batches(pair_rows, batch_format="pyarrow")
              .groupby("__bucket").map_groups(mark,
                                              batch_format="pandas"))

    def tag_src(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__b2", _bucket_of(t, ["src"], num_buckets))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "src": pd.Series(dtype="int64"),
                "out_deg": pd.Series(dtype="int64"),
                "n_recip": pd.Series(dtype="int64"),
                "recip_micro": pd.Series(dtype="int64")})
        out = (df.groupby("src", sort=False)
               .agg(out_deg=("out", "sum"), n_recip=("recip", "sum"))
               .reset_index())
        out["out_deg"] = out["out_deg"].astype("int64")
        out["n_recip"] = out["n_recip"].astype("int64")
        out["recip_micro"] = (out["n_recip"] * 1_000_000
                              // out["out_deg"]).astype("int64")
        return out

    return (marked.map_batches(tag_src, batch_format="pyarrow")
            .groupby("__b2").map_groups(fold, batch_format="pandas"))


def degree_histogram(edges, num_buckets: int = 32):
    """Log2-bucketed in/out-degree histogram — the one-page web-graph
    health audit (degree distributions are the first thing that shifts
    when a crawl hits a spam network or a trap): per (direction,
    floor(log2(degree))) bucket, the node count. Exact integers only
    (bit_length is the integer log2), so cross-engine exact.

    Shape: per-block Arrow group_by pre-combines (node, c) partials for
    each direction, ONE node-bucket exchange folds exact degrees, then
    a bounded (direction x ~64 buckets) groupby."""
    import pandas as pd

    from .joins import _bucket_of

    def partial(t: pa.Table) -> pa.Table:
        frames = []
        for direction, col in (("out", "src"), ("in", "dst")):
            g = (pa.table({"node": t[col].cast(pa.int64())})
                 .group_by(["node"]).aggregate([("node", "count")]))
            frames.append(pa.table({
                "direction": pa.array([direction] * g.num_rows,
                                      type=pa.string()),
                "node": g["node"],
                "c": pa.array(g["node_count"].to_numpy(
                    zero_copy_only=False).astype(np.int64))}))
        out = pa.concat_tables(frames)
        return out.append_column(
            "__bucket", _bucket_of(out, ["direction", "node"],
                                   num_buckets))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "direction": pd.Series(dtype="object"),
                "log2_deg": pd.Series(dtype="int64"),
                "n_nodes": pd.Series(dtype="int64")})
        deg = (df.groupby(["direction", "node"], sort=False)["c"]
               .sum().reset_index(name="deg"))
        d = deg["deg"].to_numpy(dtype=np.int64)
        # floor(log2) vectorized, then exact boundary correction so the
        # float log can never be off by one: 2^lb <= d < 2^(lb+1)
        lb = np.floor(np.log2(d.astype(np.float64))).astype(np.int64)
        lb = np.where((np.int64(1) << np.minimum(lb + 1, 62)) <= d,
                      lb + 1, lb)
        lb = np.where((np.int64(1) << np.maximum(
            np.minimum(lb, 62), 0)) > d, lb - 1, lb)
        deg["log2_deg"] = lb
        out = (deg.groupby(["direction", "log2_deg"], sort=False)
               .size().reset_index(name="n_nodes"))
        out["log2_deg"] = out["log2_deg"].astype("int64")
        out["n_nodes"] = out["n_nodes"].astype("int64")
        return out

    from ray.data.aggregate import Sum

    # per-bucket partial histograms merge in one bounded groupby
    # (direction x <=64 log buckets); strip the pandas-block schema
    # metadata first or the sort-reduce logs unhashable-schema warnings
    return (edges.map_batches(partial, batch_format="pyarrow")
            .groupby("__bucket").map_groups(fold, batch_format="pandas")
            .map_batches(lambda t: t.replace_schema_metadata(None),
                         batch_format="pyarrow")
            .groupby(["direction", "log2_deg"])
            .aggregate(Sum("n_nodes", alias_name="n_nodes")))


def hyperball(edges, num_nodes: int, iters: int = 2, p: int = 6,
              num_buckets: int = 32, engine: str = "actor"):
    """HyperBall (Boldi & Vigna, WWW'13 — "In-core computation of
    geometric centralities with HyperBall"): the neighborhood function
    N(v, t) = |{nodes reachable from v in <= t hops}| estimated per node
    with an HLL counter propagated along OUT-edges —
    ``B_{t+1}(v) = B_t(v) ∪ ⋃_{v->w} B_t(w)``. THE scalable way to get
    per-page reach / centrality on a web graph (exact 2-hop sets are
    quadratic in hub degree; register unions are linear in |E|).

    ``m = 2^p`` registers per node (default 64); item hash is the
    md5-parity convention of the HLL sketches (``sketch._hash64``), so
    the register state is bit-identical to a DuckDB unroll. The output
    is the exact integer DIGEST of each node's final registers —
    ``(node, v_zero, sum_r)`` (zero-register count and rho sum) — the
    float HLL estimate is a trivial client-side map left off the gate
    surface (the registers, not the estimator, are what distribution
    can get wrong). rho is computed with an integer boundary correction
    so float rounding above 2^53 can never shift it.

    Shuffle plan per iteration: ONE dst-keyed bucket join (register
    rows ride to their in-neighbors... strictly: each edge (src, dst)
    pulls dst's registers to src) + ONE (node, b) groupby-max fold of
    |E| x m-sparse register rows. Registers stay SPARSE (only set
    buckets exist as rows); absent registers count into v_zero at the
    end."""
    if engine == "actor":
        from .bsp import hyperball_bsp

        return hyperball_bsp(edges, num_nodes, iters=iters, p=p,
                             num_buckets=num_buckets)

    import ray.data as rd
    from ray.data.aggregate import Max

    from .joins import hash_bucket_join
    from .sketch import _hash64

    m = 1 << p
    wbits = 64 - p

    def i64(x) -> pa.Array:
        return pa.array(np.asarray(x, dtype=np.int64))

    def init_regs(t: pa.Table) -> pa.Table:
        nodes = t["id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = _hash64([str(int(v)) for v in nodes], oracle_parity=True)
        b = (h >> np.uint64(wbits)).astype(np.int64)
        w = (h & np.uint64((1 << wbits) - 1)).astype(np.int64)
        rho = np.full(len(w), wbits + 1, dtype=np.int64)
        nz = w > 0
        if nz.any():
            e = np.frexp(w[nz].astype(np.float64))[1].astype(np.int64)
            # integer boundary correction: 2^(e-1) <= w < 2^e exactly
            e = np.where((np.int64(1) << np.minimum(e, 62)) <= w[nz],
                         e + 1, e)
            e = np.where((np.int64(1) << np.maximum(e - 1, 0)) > w[nz],
                         e - 1, e)
            rho[nz] = wbits - (e - 1)
        return pa.table({"node": i64(nodes), "b": i64(b),
                         "r": i64(rho)})

    state = rd.range(num_nodes).map_batches(
        init_regs, batch_format="pyarrow").materialize()

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["src"].cast(pa.int64()),
                         "dst": t["dst"].cast(pa.int64())})

    eb = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()

    for _ in range(iters):
        pulled = hash_bucket_join(
            eb, state.map_batches(
                lambda t: pa.table({"dst": t["node"], "b": t["b"],
                                    "r": t["r"]}),
                batch_format="pyarrow"),
            on=["dst"])
        moved = pulled.map_batches(
            lambda t: pa.table({"node": t["src"], "b": t["b"],
                                "r": t["r"]}),
            batch_format="pyarrow")
        state = (state.union(moved)
                 .groupby(["node", "b"])
                 .aggregate(Max("r", alias_name="r"))).materialize()

    from ray.data.aggregate import Count, Sum

    agg = (state.groupby("node")
           .aggregate(Count(alias_name="n_set"),
                      Sum("r", alias_name="sum_r")))

    def finish(t: pa.Table) -> pa.Table:
        n_set = t["n_set"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        return pa.table({
            "node": t["node"].cast(pa.int64()),
            "v_zero": i64(m - n_set),
            "sum_r": t["sum_r"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def colink_similarity(links, threshold: float = 0.2,
                      num_buckets: int = 64, max_df: int = None):
    """Co-citation similarity between hosts (Small '73 co-citation /
    the SimRank-lite used for "related sites"): exact Jaccard between
    the sets of PAGES each host pair is linked FROM — two hosts linked
    by mostly the same pages are near-duplicates of audience, the
    mirror/spam-network signal on the host graph. Input: ``(src_url,
    dst_host)`` rows (page-level links after host extraction).

    Implementation: the documents' inverted-index set-similarity core
    (:func:`spatula_ray.stages.dedup._jaccard_join`) verbatim, with
    "shingle" = hashed linking page and "document" = host id — the
    same two compact-int exchanges and the same ``max_df`` hot-page
    cap. Output ``(a, b, jaccard)`` over host ids (undirected,
    a < b)."""
    import pandas as pd

    from .dedup import _jaccard_join

    def explode(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        src = t["src_url"].cast(pa.string()).to_numpy(
            zero_copy_only=False)
        host = t["dst_host"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        # block-local distinct (host, src) — the inverted index wants
        # set semantics; cross-block repeats merge in the join's
        # partial-count groupby ONLY if deduped here first, so a
        # global distinct pass runs before n_sh counting
        return pa.table({
            "shingle": pa.array(pd.util.hash_array(
                np.asarray(src, dtype=object))),
            "doc_id": pa.array(host),
        })

    rows = links.map_batches(explode, batch_format="pyarrow")

    # global distinct (shingle, host) + per-host set size, then the
    # standard inverted-index layout (shingle, doc_id, n_sh, __bucket)
    def tag(t: pa.Table) -> pa.Table:
        sh = t["shingle"].to_numpy(zero_copy_only=False).astype(
            np.uint64)
        return pa.table({
            "shingle": t["shingle"], "doc_id": t["doc_id"],
            "__bucket": pa.array((sh % np.uint64(num_buckets))
                                 .astype(np.int32))})

    def distinct_and_size(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "shingle": pd.Series(dtype="uint64"),
                "doc_id": pd.Series(dtype="int64")})
        g = g.drop_duplicates(["shingle", "doc_id"])
        return g[["shingle", "doc_id"]]

    distinct = (rows.map_batches(tag, batch_format="pyarrow")
                .groupby("__bucket")
                .map_groups(distinct_and_size, batch_format="pandas"))

    # per-host set size via one bounded groupby, broadcast back as a
    # small dict (host cardinality is the politeness-shard domain)
    from ray.data.aggregate import Count

    sizes = {int(r["doc_id"]): int(r["n_sh"]) for r in
             distinct.groupby("doc_id")
             .aggregate(Count(alias_name="n_sh")).take_all()}

    def inv_layout(t: pa.Table) -> pa.Table:
        sh = t["shingle"].to_numpy(zero_copy_only=False).astype(
            np.uint64)
        hosts = t["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        n_sh = np.fromiter((sizes.get(int(h), 0) for h in hosts),
                           dtype=np.int64, count=len(hosts))
        return pa.table({
            "shingle": pa.array(sh, type=pa.uint64()),
            "doc_id": pa.array(hosts),
            "n_sh": pa.array(n_sh),
            "__bucket": pa.array((sh % np.uint64(num_buckets))
                                 .astype(np.int32))})

    inv = distinct.map_batches(inv_layout, batch_format="pyarrow")
    return _jaccard_join(inv, threshold, num_buckets, max_df)
