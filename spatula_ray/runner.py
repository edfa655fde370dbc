"""Sequential oracle interpreter.

Reproduces the reference's depth-first, in-order traversal
(``/root/reference/src/spatula/pages.py:197-244``) exactly — including the
subtle cases: pagination traversed *after* all items of the current page,
"HandledError still paginates", SkipItem at detail level skips pagination
too (the reference returns before ``_paginate``), scout-mode wave-0
projection, and generator-vs-scalar-vs-Page result dispatch.

This is both the conformance oracle for the distributed engine and the
backend for the dev `test` CLI. It additionally assigns each visited page and
emitted item a deterministic ``order_key`` — the lineage path in the scrape
tree — such that lexicographic order of keys equals the reference's emission
order. The Ray engine assigns identical keys from identical lineage, so
"identical crawl ordering" is checked by sorting its (parallel, unordered)
output by key.

Key scheme: root i gets ``(i,)``; the j-th result of a page at path P gets
``P+(j,)``; a pagination successor of P gets ``P+(PAGINATION_ORDINAL,)``
which sorts after every item index, mirroring pagination-after-items.
"""

from __future__ import annotations

import json
import types
import typing
from dataclasses import dataclass, field

from .client import FetchClient, SyntheticClient
from .model import HandledError, Page, SkipItem
from .records import obj_to_dict

# sorts after any realistic per-page item count; pagination chains nest as
# (..., PAG), (..., PAG, PAG), ...
PAGINATION_ORDINAL = 2**31

OrderKey = typing.Tuple[int, ...]


def scout_projection(result: typing.Any) -> dict:
    """Wave-0 scout row (reference ``pages.py:19-30``)."""
    if isinstance(result, Page):
        return {
            "data": obj_to_dict(result.input),
            "__next__": f"{result.__class__.__name__} source={result.source}",
        }
    return {"data": obj_to_dict(result), "__next__": None}


def _null_client() -> FetchClient:
    return SyntheticClient(lambda url: None)


# events: ("page", key, page, status)  status in ok|handled_error|skipped|
#                                      rejected (propagates)  — one per fetch
#         ("item", key, item, page)    — one per emitted record
def iter_events(page: Page, client: FetchClient, *, scout: bool = False,
                key: OrderKey = (0,)) -> typing.Iterator[tuple]:
    try:
        page._fetch_data(client)
    except HandledError:
        yield ("page", key, page, "handled_error")
        yield from _paginate(page, client, scout, key)
        return
    try:
        result = page.process_page()
    except SkipItem as e:
        page.logger.info(f"SkipItem: {e}")
        yield ("page", key, page, "skipped")
        return  # note: no pagination after a detail-level SkipItem
    yield ("page", key, page, "ok")

    if isinstance(result, types.GeneratorType):
        for idx, item in enumerate(result):
            child_key = key + (idx,)
            if scout:
                yield ("item", child_key, scout_projection(item), page)
            elif isinstance(item, Page):
                yield from iter_events(item, client, key=child_key)
            else:
                yield ("item", child_key, item, page)
    elif scout:
        yield ("item", key + (0,), scout_projection(result), page)
    elif isinstance(result, Page):
        yield from iter_events(result, client, key=key + (0,))
    else:
        yield ("item", key + (0,), result, page)

    yield from _paginate(page, client, scout, key)


def _paginate(page: Page, client: FetchClient, scout: bool,
              key: OrderKey) -> typing.Iterator[tuple]:
    next_source = page.get_next_source()
    if next_source:
        next_page = type(page)(page.input, source=next_source)
        yield from iter_events(next_page, client, scout=scout,
                               key=key + (PAGINATION_ORDINAL,))


def scrape_iter(page: Page, client: typing.Optional[FetchClient] = None, *,
                scout: bool = False, key: OrderKey = (0,)
                ) -> typing.Iterator[typing.Tuple[OrderKey, typing.Any]]:
    """Yield (order_key, item) for this page and all subpages, in reference
    emission order."""
    if client is None:
        client = _null_client()
    for ev in iter_events(page, client, scout=scout, key=key):
        if ev[0] == "item":
            yield ev[1], ev[2]


def to_jsonable(item: typing.Any) -> typing.Any:
    try:
        d = obj_to_dict(item)
        return d
    except ValueError:
        return item


def order_key_str(key: OrderKey) -> str:
    return ".".join(str(k) for k in key)


@dataclass
class OracleResult:
    """Docs rows + fetch log + counters in the engine's output shape."""

    docs: list = field(default_factory=list)        # dict rows, engine docs schema
    page_log: list = field(default_factory=list)    # dict rows: per-page fetch results
    counters: dict = field(default_factory=dict)

    @property
    def fetched_urls(self) -> typing.Set[str]:
        return {r["source_url"] for r in self.page_log if r["source_url"]}


def run_oracle(seeds: typing.Sequence[Page], client: FetchClient, *,
               scout: bool = False) -> OracleResult:
    """Run a full sequential crawl; produce docs rows comparable 1:1 with the
    distributed engine's output (sorted by order_key)."""
    res = OracleResult(counters={"fetched": 0, "emitted": 0, "skipped": 0,
                                 "errors": 0, "pages": 0})
    for i, seed in enumerate(seeds):
        span_cache: dict = {}
        for ev in iter_events(seed, client, scout=scout, key=(i,)):
            if ev[0] == "page":
                _, key, page, status = ev
                src = page.source
                url = getattr(src, "url", "") or ""
                res.page_log.append({
                    "order_key": list(key),
                    "page_class": type(page).__name__,
                    "source_url": url,
                    "status": status,
                })
                res.counters["pages"] += 1
                if url:
                    res.counters["fetched"] += 1
                if status == "handled_error":
                    res.counters["errors"] += 1
                elif status == "skipped":
                    res.counters["skipped"] += 1
                span_cache[id(page)] = None  # computed lazily below
            else:
                _, key, item, page = ev
                if id(page) not in span_cache or span_cache[id(page)] is None:
                    span_cache[id(page)] = page.to_spans()
                res.docs.append({
                    "doc_id": order_key_str(key),
                    "spans": span_cache[id(page)],
                    "page_class": type(page).__name__,
                    "source_url": getattr(page.source, "url", "") or "",
                    "order_key": list(key),
                    "record_json": json.dumps(to_jsonable(item), sort_keys=True,
                                              default=str),
                })
                res.counters["emitted"] += 1
    return res
