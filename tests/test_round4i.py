"""Round-4i operators: anchor-text top-k aggregation and host-level
link-graph compression — edge cases the sf-corpus gate rows don't reach
(tie-breaks at the k boundary, cross-block partial merging, junk/relative
URL dropping, repeated links from one page vs many pages)."""

import pyarrow as pa


def _ds(tbl: pa.Table, blocks: int = 1):
    import ray.data as rd

    ds = rd.from_arrow(tbl)
    if blocks > 1:
        ds = ds.repartition(blocks)
    return ds


def _links(rows):
    return pa.table({
        "src_url": pa.array([r[0] for r in rows], type=pa.string()),
        "dst_url": pa.array([r[1] for r in rows], type=pa.string()),
        "anchor": pa.array([r[2] for r in rows], type=pa.string()),
    })


def test_anchor_topk_ties_and_k_boundary():
    from spatula_ray.stages.graph import anchor_topk

    t = _links([
        # dst X: "beta" x2, "alpha" x2 (tie -> alpha first), "zed" x1,
        # "mid" x1 (tie at rank 3/4 -> mid beats zed alphabetically)
        ("s1", "X", "beta"), ("s2", "X", "beta"),
        ("s3", "X", "alpha"), ("s4", "X", "alpha"),
        ("s5", "X", "zed"), ("s6", "X", "mid"),
        # dst Y: single anchor
        ("s1", "Y", "only"),
    ])
    out = anchor_topk(_ds(t, blocks=3), k=3).to_pandas()
    x = out[out["dst_url"] == "X"].sort_values("rank")
    assert list(x["anchor"]) == ["alpha", "beta", "mid"]
    assert list(x["n_links"]) == [2, 2, 1]
    assert list(x["rank"]) == [1, 2, 3]
    y = out[out["dst_url"] == "Y"]
    assert len(y) == 1 and y.iloc[0]["rank"] == 1


def test_anchor_topk_cross_block_counts_merge():
    from spatula_ray.stages.graph import anchor_topk

    # the same (dst, anchor) pair in every block must merge to one row
    rows = [("s%d" % i, "X", "home") for i in range(12)]
    rows += [("s%d" % i, "X", "rare") for i in range(2)]
    out = anchor_topk(_ds(_links(rows), blocks=6), k=2).to_pandas()
    out = out.sort_values("rank")
    assert list(out["anchor"]) == ["home", "rare"]
    assert list(out["n_links"]) == [12, 2]


def test_host_link_graph_distinct_and_junk():
    from spatula_ray.stages.graph import host_link_graph

    t = _links([
        # one page links b.test twice -> n_links 2, n_src_pages 1
        ("https://A.test/p/1", "https://b.test/x", ""),
        ("https://A.test/p/1", "https://b.test/y", ""),
        # a second page, same host pair (host lowercased)
        ("https://a.test/p/2", "https://b.test/x", ""),
        # relative / junk URLs drop
        ("/relative/only", "https://b.test/x", ""),
        ("https://a.test/p/3", "no-scheme-here", ""),
        # distinct host pair
        ("https://a.test/p/1", "https://c.test/", ""),
    ])
    out = host_link_graph(_ds(t, blocks=3)).to_pandas()
    out = out.sort_values(["src_host", "dst_host"]).reset_index(drop=True)
    assert list(out["src_host"]) == ["a.test", "a.test"]
    assert list(out["dst_host"]) == ["b.test", "c.test"]
    ab = out.iloc[0]
    assert ab["n_links"] == 3 and ab["n_src_pages"] == 2
    ac = out.iloc[1]
    assert ac["n_links"] == 1 and ac["n_src_pages"] == 1


def test_host_link_graph_src_distinct_across_blocks():
    from spatula_ray.stages.graph import host_link_graph

    # the same src page appears in many blocks; distinct count must not
    # double-count it after the block-local pre-reduce
    rows = [("https://a.test/p/1", "https://b.test/%d" % i, "")
            for i in range(8)]
    out = host_link_graph(_ds(_links(rows), blocks=8)).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["n_links"] == 8
    assert out.iloc[0]["n_src_pages"] == 1


def test_hits_star_graph():
    from spatula_ray.stages.graph import HITS_SCALE, hits

    # 0,1,2 all link to 3; 3 links to 4. Authority mass concentrates on
    # 3; hubs are 0,1,2 (equal); 3 is a weaker hub (its only target's
    # authority comes from one in-link); 4 is a pure sink.
    edges = pa.table({"src": pa.array([0, 1, 2, 3], type=pa.int64()),
                      "dst": pa.array([3, 3, 3, 4], type=pa.int64())})
    out = hits(_ds(edges, blocks=2), num_nodes=5, iters=3).to_pandas()
    out = out.set_index("node").sort_index()
    assert out.loc[3, "auth"] == HITS_SCALE          # max authority
    assert out.loc[0, "hub"] == HITS_SCALE           # max hub
    assert out.loc[0, "hub"] == out.loc[1, "hub"] == out.loc[2, "hub"]
    assert out.loc[3, "hub"] < out.loc[0, "hub"]
    assert out.loc[4, "auth"] < out.loc[3, "auth"]
    assert out.loc[4, "hub"] == 0                    # no out-edges
    assert out.loc[0, "auth"] == 0                   # no in-edges


def test_hits_empty_edges_and_guard():
    import pytest

    from spatula_ray.stages.graph import hits

    edges = pa.table({"src": pa.array([], type=pa.int64()),
                      "dst": pa.array([], type=pa.int64())})
    out = hits(_ds(edges), num_nodes=3, iters=2).to_pandas()
    assert (out["hub"] == 0).all() and (out["auth"] == 0).all()

    with pytest.raises(ValueError, match="overflow"):
        hits(_ds(edges), num_nodes=10**13, iters=1)


def test_trap_host_stats_features():
    from spatula_ray.stages.ingest import trap_host_stats

    t = pa.table({"url": pa.array([
        # a.test: 2 repeat-trap URLs, 1 normal -> majority repeat
        "https://a.test/cal/2020/cal/2020/cal/2020/p1",
        "https://a.test/x/y/x/y/x/z",          # 'x' three times
        "https://a.test/p/9",
        # b.test: deep (9 distinct segments) + shallow -> 1 of 2 deep
        "https://b.test/s0/s1/s2/s3/s4/s5/s6/s7/s8",
        "https://b.test/p",
        # c.test: normal only; trailing slash + empty segs don't count
        "https://c.test/p//q/",
        # junk dropped
        "not-a-url",
    ], type=pa.string())})
    out = trap_host_stats(_ds(t, blocks=3)).to_pandas()
    out = out.set_index("host").sort_index()
    a = out.loc["a.test"]
    assert (a["n_urls"], a["max_depth"], a["n_repeat"]) == (3, 7, 2)
    assert a["is_trap"]                      # 2*2 >= 3
    b = out.loc["b.test"]
    assert (b["n_urls"], b["max_depth"], b["n_deep"]) == (2, 9, 1)
    assert b["is_trap"]                      # 2*1 >= 2
    c = out.loc["c.test"]
    assert (c["n_urls"], c["max_depth"], c["n_deep"],
            c["n_repeat"]) == (1, 2, 0, 0)
    assert not c["is_trap"]
    assert len(out) == 3                     # junk row dropped


def test_parse_robots_group_model():
    from spatula_ray.stages.ingest import parse_robots

    body = "\n".join([
        "# banner comment",
        "Disallow: /orphan",              # rule before any group: drop
        "User-Agent: *",
        "Disallow: /a  # trailing comment",
        "Allow:",                          # empty value kept
        "User-agent: late",                # after rules -> NEW group
        "DISALLOW: /b",
        "Unknown-Field: x",                # skipped, doesn't emit
        "no colon line",
        "Sitemap: https://e.test/s.xml",
        "Crawl-delay: 4",                  # still group [late]
    ])
    t = pa.table({"host": pa.array(["e.test"]),
                  "body": pa.array([body])})
    out = parse_robots(_ds(t)).to_pandas()
    rows = list(zip(out["agent"], out["directive"], out["value"],
                    out["seq"]))
    assert ("*", "disallow", "/a", 0) in rows
    assert ("*", "allow", "", 1) in rows
    assert ("late", "disallow", "/b", 2) in rows
    assert ("", "sitemap", "https://e.test/s.xml", 3) in rows
    assert ("late", "crawl_delay", "4", 4) in rows
    assert len(rows) == 5                  # orphan + unknown dropped


def test_parse_robots_stacked_agents_and_bytes():
    from spatula_ray.stages.ingest import parse_robots

    body = b"User-agent: a\nUser-agent: b\nDisallow: /x\n"
    t = pa.table({"host": pa.array(["s.test"]),
                  "body": pa.array([body], type=pa.binary())})
    out = parse_robots(_ds(t)).to_pandas()
    rows = sorted(zip(out["agent"], out["seq"]))
    assert rows == [("a", 0), ("b", 0)]    # one line, two agent rows


def test_parse_warc_records_and_truncation():
    import hashlib

    from spatula_ray.stages.ingest import parse_warc

    def rec(rtype, uri, payload, version=b"WARC/1.1"):
        head = version + b"\r\nWARC-Type: " + rtype.encode() + b"\r\n"
        if uri:
            head += b"WARC-Target-URI: " + uri.encode() + b"\r\n"
        head += b"Content-Length: %d\r\n\r\n" % len(payload)
        return head + payload + b"\r\n\r\n"

    body = b"<html>hi</html>"
    http = (b"HTTP/1.1 404 Not Found\r\nX-Other: 1\r\n"
            b"Content-Type: text/plain\r\n\r\n" + body)
    good = (rec("warcinfo", "", b"sw: x\r\n")
            + rec("response", "https://a.test/x", http)
            + rec("request", "https://a.test/x", b"GET /x\r\n"))
    # truncated record: declared length exceeds remaining bytes ->
    # parsed prefix kept, tail dropped
    trunc = rec("response", "https://b.test/y", http)[:-20]

    t = pa.table({
        "shard_id": pa.array([1, 2], type=pa.int64()),
        "warc": pa.array([good, rec("warcinfo", "", b"sw: x\r\n") + trunc],
                         type=pa.binary()),
    })
    out = parse_warc(_ds(t, blocks=2)).to_pandas()
    s1 = out[out["shard_id"] == 1].sort_values("rec_idx")
    assert list(s1["rec_type"]) == ["warcinfo", "response", "request"]
    resp = s1.iloc[1]
    assert resp["status"] == 404
    assert resp["content_type"] == "text/plain"
    assert resp["body_len"] == len(body)
    assert resp["body_md5"] == hashlib.md5(body).hexdigest()
    req = s1.iloc[2]
    assert req["status"] == -1 and req["content_type"] == ""
    # shard 2: the leading record parses, the truncated tail is dropped
    s2 = out[out["shard_id"] == 2]
    assert list(s2["rec_type"]) == ["warcinfo"]


def test_readability_known_values():
    from spatula_ray.stages.text import readability_stats

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "The cat sat. It sat!",   # 5 words, 2 sents, 5 syllables
            "xyz 123",                # consonant-only words clamp to 1
            "",                       # no words -> sentinel
            None,                     # null -> like empty
        ], type=pa.string()),
    })
    out = readability_stats(_ds(t, blocks=2)).to_pandas()
    out = out.set_index("doc_id").sort_index()
    r0 = out.loc[0]
    assert (r0["n_words"], r0["n_sents"], r0["n_syllables"]) == (5, 2, 5)
    assert r0["fre_micro"] == (206_835_000
                               - (1_015_000 * 5) // 2
                               - (84_600_000 * 5) // 5)
    r1 = out.loc[1]
    assert (r1["n_words"], r1["n_sents"], r1["n_syllables"]) == (2, 1, 2)
    assert out.loc[2, "fre_micro"] == -10**9
    assert out.loc[2, "n_sents"] == 1
    assert out.loc[3, "fre_micro"] == -10**9


def test_exact_substr_cut_matrix():
    from spatula_ray.stages.dedup import (exact_substr_cut,
                                          substring_dup_coverage)

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "a b c d e f g h",        # shares 'a b c d e' run with 1
            "a b c d e x y z",        # -> positions 0..4 cut in both
            "q r s t u v w",          # unique -> untouched
            "p p p p p p p p p",      # within-doc repeat -> fully cut
            "tiny doc",               # n < k whole-doc window, unique
        ], type=pa.string()),
    })
    ds = _ds(t, blocks=3)
    out = exact_substr_cut(ds, k=5).to_pandas().set_index("doc_id")
    assert out.loc[0, "clean_text"] == "f g h"
    assert out.loc[0, "kept_words"] == 3
    assert out.loc[1, "clean_text"] == "x y z"
    assert out.loc[2, "clean_text"] == "q r s t u v w"
    assert out.loc[3, "clean_text"] == ""
    assert out.loc[3, "kept_words"] == 0
    assert out.loc[4, "clean_text"] == "tiny doc"

    # consistency with the coverage measure: kept = n_words - covered
    cov = substring_dup_coverage(ds, k=5).to_pandas().set_index("doc_id")
    for d in range(5):
        assert (out.loc[d, "n_words"] - out.loc[d, "kept_words"]
                == cov.loc[d, "covered_words"])


def test_minhash_calibration_identical_and_bounds():
    import ray.data as rd

    from spatula_ray.stages.dedup import minhash_calibration

    # doc 1 == doc 2 exactly; doc 3 half-overlaps via shared prefix
    base = "w%d " * 30
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array([
            " ".join("w%d" % i for i in range(30)),
            " ".join("w%d" % i for i in range(30)),
            " ".join("w%d" % i for i in range(15))
            + " " + " ".join("z%d" % i for i in range(15)),
        ], type=pa.string()),
    })
    out = minhash_calibration(rd.from_arrow(t), threshold=0.2,
                              n_perm=16).to_pandas()
    ident = out[(out["a"] == 1) & (out["b"] == 2)].iloc[0]
    assert ident["jac_micro"] == 1_000_000
    assert ident["est_micro"] == 1_000_000     # identical sigs
    assert ident["err_micro"] == 0
    part = out[(out["a"] == 1) & (out["b"] == 3)]
    assert len(part) == 1                       # above threshold
    assert 0 < part.iloc[0]["jac_micro"] < 1_000_000
    assert (out["est_micro"] % (1_000_000 // 16) == 0).all()


def test_canonical_urls_election():
    from spatula_ray.stages.ingest import canonical_urls

    t = pa.table({
        "url": pa.array(["https://a.test/z", "https://a.test/b",
                         "https://a.test/m", "https://b.test/solo"],
                        type=pa.string()),
        "fingerprint": pa.array(["f1", "f1", "f1", "f2"],
                                type=pa.string()),
    })
    out = canonical_urls(_ds(t, blocks=3)).to_pandas()
    assert len(out) == 1                      # singleton f2 dropped
    r = out.iloc[0]
    assert r["fingerprint"] == "f1"
    assert r["canonical_url"] == "https://a.test/b"   # lexicographic min
    assert r["n_aliases"] == 3


def test_pagerank_weighted_vs_unweighted():
    from spatula_ray.stages.graph import pagerank, pagerank_weighted

    # node 0 sends 9x more weight to node 1 than to node 2
    e = pa.table({"src": pa.array([0, 0], type=pa.int64()),
                  "dst": pa.array([1, 2], type=pa.int64()),
                  "w": pa.array([9, 1], type=pa.int64())})
    w = pagerank_weighted(_ds(e), num_nodes=3, iters=2).to_pandas()
    w = w.set_index("node").sort_index()
    assert w.loc[1, "rank"] > w.loc[2, "rank"]
    # unit weights must reproduce the unweighted operator exactly
    e1 = pa.table({"src": pa.array([0, 0], type=pa.int64()),
                   "dst": pa.array([1, 2], type=pa.int64()),
                   "w": pa.array([1, 1], type=pa.int64())})
    uw = pagerank(_ds(e1.select(["src", "dst"])), num_nodes=3,
                  iters=2).to_pandas().set_index("node").sort_index()
    ww = pagerank_weighted(_ds(e1), num_nodes=3,
                           iters=2).to_pandas().set_index("node")
    assert (ww.sort_index()["rank"] == uw["rank"]).all()


def test_pagerank_weighted_overflow_guard():
    import pytest

    from spatula_ray.stages.graph import pagerank_weighted

    e = pa.table({"src": pa.array([0], type=pa.int64()),
                  "dst": pa.array([1], type=pa.int64()),
                  "w": pa.array([2**62], type=pa.int64())})
    with pytest.raises(ValueError, match="overflow"):
        pagerank_weighted(_ds(e), num_nodes=2, iters=1)


def test_write_sharded_roundtrip_and_resume_skip(tmp_path):
    import os

    from spatula_ray.stages.ingest import shard_manifest, write_sharded

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 9, 10, -5], type=pa.int64()),
        "text": pa.array(["a", "bb", "ccc", "d", "ee", "f", "gg"],
                         type=pa.string()),
    })
    out = str(tmp_path / "shards")
    write_sharded(_ds(t, blocks=3), out, num_shards=4)
    # hive layout: one directory per shard, prunable by path
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]
    m = shard_manifest(out).to_pandas().set_index("shard").sort_index()
    assert m.loc[0, "n_docs"] == 1 and m.loc[0, "min_doc"] == 0
    assert m.loc[1, "n_docs"] == 2          # 1 and 9
    assert m.loc[1, "max_doc"] == 9
    assert m.loc[2, "n_docs"] == 2          # 2, 10
    assert m.loc[3, "n_docs"] == 2          # 3 and -5 (euclidean mod)
    assert m.loc[3, "min_doc"] == -5
    assert m["n_chars"].sum() == 12


def test_interleaved_truncate_boundaries():
    from spatula_ray.stages.multimodal import interleaved_truncate

    def span(d, seq, kind, text=None, ref=None):
        return (d, seq, kind, text, ref)

    rows = [
        # doc 1: text(3) image(16) text(5) -> budget 20 keeps first two
        # spans (3+16=19), third would hit 24 > 20
        span(1, 0, "text", "a b c"), span(1, 1, "image", None, "m1"),
        span(1, 2, "text", "d e f g h"),
        # doc 2: fits entirely
        span(2, 0, "text", "x y"), span(2, 1, "image", None, "m2"),
        # doc 3: FIRST span already over budget -> keep nothing
        span(3, 0, "text", " ".join("w%d" % i for i in range(25))),
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "seq": pa.array([r[1] for r in rows], type=pa.int64()),
        "kind": pa.array([r[2] for r in rows], type=pa.string()),
        "text": pa.array([r[3] for r in rows], type=pa.string()),
        "media_ref": pa.array([r[4] for r in rows], type=pa.string()),
    })
    out = interleaved_truncate(_ds(t, blocks=3), max_tokens=20,
                               media_tokens=16).to_pandas()
    out = out.set_index("doc_id").sort_index()
    d1 = out.loc[1]
    assert (d1["n_spans_kept"], d1["tokens_kept"]) == (2, 19)
    assert d1["truncated"]
    d2 = out.loc[2]
    assert (d2["n_spans_kept"], d2["n_spans_total"]) == (2, 2)
    assert not d2["truncated"]
    d3 = out.loc[3]
    assert (d3["n_spans_kept"], d3["tokens_kept"]) == (0, 0)
    assert d3["truncated"]


def test_cluster_balanced_select_caps_and_order():
    import numpy as np

    from spatula_ray.stages.similarity import cluster_balanced_select

    # two tight clusters around +e0 and +e1; 6 vectors each, per_cell=2
    rng = [
        [1.0, 0.05 * i, 0.0, 0.0] for i in range(6)
    ] + [
        [0.05 * i, 1.0, 0.0, 0.0] for i in range(6)
    ]
    t = pa.table({
        "vec_id": pa.array(range(12), type=pa.int64()),
        "embedding": pa.array(rng, type=pa.list_(pa.float32())),
    })
    out = cluster_balanced_select(_ds(t, blocks=2), per_cell=2,
                                  n_cells=2, sample=12,
                                  iters=3).to_pandas()
    # every cell keeps exactly per_cell rows, ranks 1..2, scores desc
    assert sorted(out.groupby("cell")["rank"].max()) == [2, 2]
    assert len(out) == 4
    for _, grp in out.groupby("cell"):
        g = grp.sort_values("rank")
        assert list(g["rank"]) == [1, 2]
        assert g["score"].iloc[0] >= g["score"].iloc[1]


def test_host_boilerplate_scoping_and_dedup():
    from spatula_ray.stages.text import host_boilerplate_lines

    def doc(host, *lines):
        return (host, "\n".join(lines))

    rows = [
        doc("a", "NAV", "x1"), doc("a", "NAV", "x2"),
        doc("a", "NAV", "NAV", "x3"),      # repeat within doc counts once
        doc("b", "NAV", "y1"), doc("b", "NAV", "y2"),  # df 2 < 3 on b
        doc("b", "", "y3"),                 # empty lines never count
    ]
    t = pa.table({
        "host": pa.array([r[0] for r in rows], type=pa.string()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    })
    out = host_boilerplate_lines(_ds(t, blocks=3), min_df=3).to_pandas()
    # only host a's NAV reaches df 3 — same line on host b stays under
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["host"], r["line"], r["df"]) == ("a", "NAV", 3)


def test_reciprocal_edges_matrix():
    from spatula_ray.stages.graph import reciprocal_edges

    e = pa.table({
        "src": pa.array([0, 1, 0, 0, 2, 2], type=pa.int64()),
        "dst": pa.array([1, 0, 2, 1, 2, 3], type=pa.int64()),
        # 0->1 / 1->0 reciprocal; 0->2 not; 0->1 DUPLICATE counts once;
        # 2->2 self-loop excluded; 2->3 not reciprocal
    })
    out = reciprocal_edges(_ds(e, blocks=3)).to_pandas()
    out = out.set_index("src").sort_index()
    r0 = out.loc[0]
    assert (r0["out_deg"], r0["n_recip"]) == (2, 1)
    assert r0["recip_micro"] == 500_000
    assert (out.loc[1, "out_deg"], out.loc[1, "n_recip"]) == (1, 1)
    assert (out.loc[2, "out_deg"], out.loc[2, "n_recip"]) == (1, 0)


def test_degree_histogram_buckets():
    from spatula_ray.stages.graph import degree_histogram

    # node 0 has out-degree 4 (log2 bucket 2); nodes 1..4 out-degree 1
    # (bucket 0); in-degrees: node 1 gets 5 (bucket 2), 2..4 get 1
    e = pa.table({
        "src": pa.array([0, 0, 0, 0, 1, 2, 3, 4], type=pa.int64()),
        "dst": pa.array([1, 2, 3, 4, 1, 1, 1, 1], type=pa.int64()),
    })
    out = degree_histogram(_ds(e, blocks=3)).to_pandas()
    key = {(r["direction"], r["log2_deg"]): r["n_nodes"]
           for _, r in out.iterrows()}
    assert key[("out", 2)] == 1          # deg 4
    assert key[("out", 0)] == 4          # deg 1 x4
    assert key[("in", 2)] == 1           # deg 5 -> floor(log2(5)) = 2
    assert key[("in", 0)] == 3           # deg 1 x3


def test_hyperball_register_semantics():
    from spatula_ray.stages.graph import hyperball

    # chain 0 -> 1 -> 2: after 2 iterations node 0's registers are the
    # union of {0,1,2}, node 1's of {1,2}, node 2's of {2} only
    e = pa.table({"src": pa.array([0, 1], type=pa.int64()),
                  "dst": pa.array([1, 2], type=pa.int64())})
    out = hyperball(_ds(e, blocks=2), num_nodes=3, iters=2,
                    p=6).to_pandas().set_index("node").sort_index()
    # reach grows monotonically along the chain: fewer zero registers
    # and a larger rho sum upstream (with 3 distinct hashes, buckets
    # rarely collide at m=64 — and even under collision max() keeps
    # sum_r monotone)
    assert out.loc[0, "v_zero"] <= out.loc[1, "v_zero"] <= \
        out.loc[2, "v_zero"]
    assert out.loc[0, "sum_r"] >= out.loc[1, "sum_r"] >= \
        out.loc[2, "sum_r"]
    assert out.loc[2, "v_zero"] == 63      # exactly its own register
    # one-iteration run must differ for node 0 (can't see 2 yet)
    out1 = hyperball(_ds(e), num_nodes=3, iters=1,
                     p=6).to_pandas().set_index("node").sort_index()
    assert out1.loc[0, "sum_r"] <= out.loc[0, "sum_r"]
    assert out1.loc[1, "sum_r"] == out.loc[1, "sum_r"]


def test_rendezvous_move_fraction_and_stability():
    from spatula_ray.stages.ingest import rendezvous_shards

    urls = ["https://x.test/p/%d" % i for i in range(600)]
    t = pa.table({"url": pa.array(urls, type=pa.string())})
    out = rendezvous_shards(_ds(t, blocks=3), n_old=8,
                            n_new=9).to_pandas()
    # every moved key moved TO the new shard (the rendezvous property:
    # existing shards' relative order is unchanged)
    moved = out[out["moved"]]
    assert (moved["shard_new"] == 8).all()
    assert (out.loc[~out["moved"], "shard_old"]
            == out.loc[~out["moved"], "shard_new"]).all()
    # expected move fraction ~1/9; allow generous slack at n=600
    frac = len(moved) / len(out)
    assert 0.04 < frac < 0.20
    assert out["shard_old"].between(0, 7).all()
    assert out["shard_new"].between(0, 8).all()


def test_colink_similarity_sets():
    from spatula_ray.stages.graph import colink_similarity

    # hosts 1 and 2 share 2 of 3 linking pages (J = 2/4 = 0.5);
    # host 3 is linked only from p1 (J(1,3) = 1/3); duplicate link
    # rows must not inflate intersections
    rows = [("p1", 1), ("p2", 1), ("p3", 1),
            ("p1", 2), ("p2", 2), ("p9", 2),
            ("p1", 3), ("p1", 3)]
    t = pa.table({
        "src_url": pa.array([r[0] for r in rows], type=pa.string()),
        "dst_host": pa.array([r[1] for r in rows], type=pa.int64()),
    })
    out = colink_similarity(_ds(t, blocks=3),
                            threshold=0.3).to_pandas()
    out = out.set_index(["a", "b"]).sort_index()
    assert abs(out.loc[(1, 2), "jaccard"] - 0.5) < 1e-9
    assert (1, 3) in out.index          # 1/3 >= 0.3
    assert abs(out.loc[(1, 3), "jaccard"] - 0.333333) < 1e-6
    assert (2, 3) in out.index          # 1/3 as well
    assert len(out) == 3


def test_textrank_hub_word_wins():
    import ray.data as rd

    from spatula_ray.stages.curate import textrank_keywords

    # 'core' co-occurs with everything; satellites only with 'core'
    texts = ["core alpha core beta core gamma core delta"] * 4 + \
            ["alpha beta"]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    out = textrank_keywords(rd.from_arrow(t).repartition(3),
                            vocab_size=10, iters=3).to_pandas()
    out = out.set_index("term")
    assert out.loc["core", "rank"] == out["rank"].max()
    # satellites all present, ranked below the hub
    for w in ("alpha", "beta", "gamma", "delta"):
        assert out.loc[w, "rank"] < out.loc["core", "rank"]


def test_sitemap_index_recursion_roundtrip():
    from spatula_ray.stages.ingest import (parse_sitemap_index,
                                           parse_sitemaps)

    idx_body = ("<sitemapindex>"
                "<sitemap><loc>https://a.test/s1.xml</loc>"
                "<lastmod>2026-01-02</lastmod></sitemap>"
                "<sitemap><loc>https://a.test/s2.xml</loc></sitemap>"
                "<sitemap><lastmod>junk</lastmod></sitemap>"
                "</sitemapindex>")
    t = pa.table({"host": pa.array(["a.test"]),
                  "body": pa.array([idx_body])})
    out = parse_sitemap_index(_ds(t)).to_pandas()
    assert list(out["sitemap_url"]) == ["https://a.test/s1.xml",
                                        "https://a.test/s2.xml"]
    assert list(out["lastmod"]) == ["2026-01-02", ""]

    # recursion: the child sitemap bodies then flow through the
    # existing leaf parser — the full index -> urlset round trip
    leaf = ("<urlset><url><loc>https://a.test/p/1</loc></url>"
            "<url><loc>https://a.test/p/2</loc></url></urlset>")
    t2 = pa.table({"host": pa.array(["a.test"]),
                   "body": pa.array([leaf])})
    urls = parse_sitemaps(_ds(t2)).to_pandas()
    assert list(urls["url"]) == ["https://a.test/p/1",
                                 "https://a.test/p/2"]
