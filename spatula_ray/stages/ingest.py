"""Crawl-seed ingestion stages: sitemap XML -> frontier seed rows.

The reference takes its roots as constructed page objects
(``cli.py:143-154`` — a module of page classes); real tier-crawl
deployments seed from per-host sitemap.xml documents fetched ahead of the
crawl. This stage turns a table of raw sitemap bodies (one row per host)
into one frontier seed row per ``<url>`` entry, parsed with the repo's
OWN stdlib DOM + XPath subset (``dom.fromstring_xml`` — the same code
path every scraper page class uses, so sitemap ingestion exercises the
production parser, not a shortcut).

Scale shape: pure streaming ``map_batches`` over (host, body) rows — a
sitemap is parsed where it lands, entries are emitted columnar, and no
shuffle happens until the frontier dedup that follows (the URL-seen
cuckoo shards). Sitemap index files (sitemaps pointing at sitemaps) are
one recursion of the same stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class SitemapParse:
    """Actor-pool stage: ``<urlset>`` sitemap bodies -> one row per
    ``<url>`` entry: ``(host, url, lastmod)``. Entries missing ``<loc>``
    are dropped; missing ``<lastmod>`` emits ''. Per-entry Python is the
    parse itself (a DOM walk), same as every page-class stage; bodies
    never shuffle."""

    def __init__(self):
        from ..dom import fromstring_xml

        self._parse = fromstring_xml

    def __call__(self, t: pa.Table) -> pa.Table:
        hosts, urls, mods = [], [], []
        for host, body in zip(t["host"].to_pylist(),
                              t["body"].to_pylist()):
            root = self._parse(body or "")
            for entry in root.xpath("//url"):
                loc = entry.xpath("./loc/text()")
                if not loc:
                    continue
                mod = entry.xpath("./lastmod/text()")
                hosts.append(host)
                urls.append(loc[0])
                mods.append(mod[0] if mod else "")
        return pa.table({
            "host": pa.array(hosts, type=pa.string()),
            "url": pa.array(urls, type=pa.string()),
            "lastmod": pa.array(mods, type=pa.string()),
        })


def parse_sitemaps(sitemaps, concurrency=(2, 8), batch_size: int = 32):
    """Actor-pool wrapper for :class:`SitemapParse`."""
    return sitemaps.map_batches(
        SitemapParse, concurrency=concurrency, batch_size=batch_size,
        batch_format="pyarrow", max_restarts=0)


def snapshot_diff(old, new, key_col: str = "url",
                  fp_col: str = "fingerprint",
                  include_unchanged: bool = False,
                  num_buckets: int = 32):
    """Crawl-snapshot diff — the incremental-recrawl accounting step:
    given yesterday's and today's (url, content-fingerprint) tables,
    classify every URL as ``added`` (new only), ``removed`` (old only),
    ``changed`` (both, fingerprints differ) or ``unchanged``. Feeds
    recrawl scheduling (changed-rate per host) and incremental downstream
    processing (only added/changed docs re-enter the curation pipeline);
    the content-level byte accounting is the separate ``cdc_delta_bytes``.

    ONE full-outer hash-bucket join on the key (acero per bucket, key
    coalesced), narrow (key, fingerprint) rows only — bodies never
    shuffle. With ``include_unchanged=False`` (default) the output is
    bounded by true churn, not corpus size. Returns
    ``(url, status, old_fp, new_fp)`` with '' for the absent side."""
    import pyarrow.compute as pc

    from .joins import hash_bucket_join

    j = hash_bucket_join(new, old, on=[key_col], how="outer",
                         num_buckets=num_buckets)
    old_fp_col = fp_col + "_r"

    def status(t: pa.Table) -> pa.Table:
        new_fp, old_fp = t[fp_col], t[old_fp_col]
        added = pc.and_(pc.is_valid(new_fp), pc.is_null(old_fp))
        removed = pc.is_null(new_fp)
        changed = pc.and_(
            pc.and_(pc.is_valid(new_fp), pc.is_valid(old_fp)),
            pc.invert(pc.equal(new_fp, old_fp)))
        st = pc.if_else(added, "added",
                        pc.if_else(removed, "removed",
                                   pc.if_else(changed, "changed",
                                              "unchanged")))
        out = pa.table({
            "url": t[key_col],
            "status": st,
            "old_fp": pc.fill_null(old_fp, ""),
            "new_fp": pc.fill_null(new_fp, ""),
        })
        if include_unchanged:
            return out
        return out.filter(pc.invert(pc.equal(st, "unchanged")))

    return j.map_batches(status, batch_format="pyarrow")
