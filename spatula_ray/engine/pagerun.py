"""PageRunner — the fused fetch + parse + extract stage.

One callable class for ``Dataset.map_batches(PageRunner, concurrency=N,
batch_format="pyarrow")``: constructed once per actor (client + registry +
broadcast dependency results), invoked per Arrow batch of frontier rows.
Fusing fetch/parse/extract in one stage mirrors the reference's
``postprocess_response`` -> ``process_page`` fusion (pages.py:194-217) and
keeps page bodies out of the object store — only compact emit/expand rows
flow between stages.

Politeness admission is a batched RPC to the owning HostGate shard per
batch, grouped by ``host_hash % n_gates``; null-source rows bypass the gate
(reference NullSource semantics, sources.py:58-72).

The per-row dispatch reproduces the oracle's event semantics
(spatula_ray.runner.iter_events) with child pages and pagination successors
becoming *expand* frontier rows instead of recursive calls; order-key
lineage is identical by construction.
"""

from __future__ import annotations

import json
import types
import typing

from ..client import SyntheticClient
from ..model import HandledError, MissingSourceError, Page, RejectedResponse, SkipItem
from ..records import encode_input
from ..origins import to_spec
from ..runner import PAGINATION_ORDINAL, order_key_str, scout_projection, to_jsonable
from .keys import canonicalize, dedup_hash, encode_order_key, hash64, host_of
from .schema import (
    FRONTIER_SCHEMA,
    KIND_DEFER,
    KIND_EMIT,
    KIND_EXPAND,
    KIND_PAGE,
    UNION_SCHEMA,
    rows_to_table,
)

_FRONTIER_COL_SET = {f.name for f in FRONTIER_SCHEMA} | {"row_kind", "wave"}


def frontier_row_from_page(page: Page, key: typing.Tuple[int, ...],
                           depth: int) -> dict:
    """Enqueue-time projection of a Page instance to a frontier row.

    Source resolution happens here (reference precedence, pages.py:157-165);
    MissingSourceError surfaces at enqueue time (SURVEY.md E3)."""
    name = type(page).__name__
    source = page.resolve_source()
    url = getattr(source, "url", "") or ""
    canon = canonicalize(url)
    host = host_of(url)
    return {
        "row_kind": KIND_EXPAND,
        "url": url,
        "canon_url": canon,
        "url_hash": dedup_hash(name, canon) if url else 0,
        "host": host,
        "host_hash": hash64(host) if host else 0,
        "page_class": name,
        "input_json": encode_input(page.input),
        "source_spec": to_spec(source),
        "depth": depth,
        "priority": int(getattr(page, "priority", 0) or 0),
        "order_key": list(key),
        "order_bytes": encode_order_key(key),
        "pre_admitted": False,
    }


class PageRunner:
    def __init__(self, registry: typing.Dict[str, type],
                 resolver_factory: typing.Callable,
                 gates: typing.Optional[list] = None,
                 filter_shards: typing.Optional[list] = None,
                 dep_ref=None,
                 scout: bool = False,
                 expand: bool = True,
                 error_policy: str = "record",
                 simulate_latency: bool = False,
                 query_input: bool = False,
                 cache_dir: typing.Optional[str] = None):
        self.registry = registry
        self.client = SyntheticClient(resolver_factory(),
                                      simulate_latency=simulate_latency)
        if cache_dir:
            # fastmode: file-per-URL response cache shared by all runners
            from ..cache import CachingClient

            self.client = CachingClient(self.client, cache_dir)
        self.gates = gates or []
        # dedup offer phase is fused into the runner batch: the wave's
        # materialize barrier guarantees all offers land before commit
        self.filter_shards = filter_shards or []
        self.scout = scout
        self.expand = expand
        self.error_policy = error_policy
        # when True, winner-filter input rows here instead of in the
        # driver's candidate pass (off by default: frontier arrives
        # pre-filtered)
        self.query_input = query_input
        if dep_ref is not None:
            import ray

            deps = ray.get(dep_ref)
            # broadcast instance-dependency results: pre-warm the shared
            # class-level cache once per actor (reference pages.py:148-155)
            Page._cached_dependencies.update(deps)

    # -- admission ---------------------------------------------------------
    def _admit(self, rows: list) -> list:
        """Return per-row codes: 0 allow, 1 defer, 2 robots-denied."""
        codes = [0] * len(rows)
        if not self.gates:
            return codes
        import ray
        from urllib.parse import urlsplit

        n = len(self.gates)
        by_shard: typing.Dict[int, list] = {}
        for i, r in enumerate(rows):
            if not r["url"]:
                continue
            by_shard.setdefault(int(r["host_hash"]) % n, []).append(i)
        futures = []
        shard_rows = []
        for shard, idxs in by_shard.items():
            hosts = [rows[i]["host"] for i in idxs]
            paths = [urlsplit(rows[i]["url"]).path for i in idxs]
            futures.append(self.gates[shard].admit.remote(hosts, paths))
            shard_rows.append(idxs)
        for idxs, result in zip(shard_rows, ray.get(futures)):
            for i, code in zip(idxs, result):
                codes[i] = code
        return codes

    # -- per-row execution -------------------------------------------------
    def _page_row(self, row: dict, status: str, *, attempts: int = 0,
                  n_emitted: int = 0, error: str = "") -> dict:
        return {
            "row_kind": KIND_PAGE,
            "page_class": row["page_class"],
            "source_url": row["url"],
            "status": status,
            "order_key": row["order_key"],
            "order_bytes": row["order_bytes"],
            "fetch_attempts": attempts,
            "n_emitted": n_emitted,
            "error": error,
            "wave": row.get("wave"),
        }

    def _follow_pagination(self, page: Page, row: dict, out: list) -> None:
        """Follow the pagination chain *inline* in this task.

        A chain is inherently sequential (reference pages.py:197-204:
        same class, same input, next source); running it as cluster-wide
        waves would serialize the whole crawl on per-wave overhead. Each
        successor is claimed atomically in the URL-seen shard (chain
        successors are unique to their chain, so they bypass the per-wave
        min-order protocol), admitted through the host gate (deferring the
        rest of the chain to the next wave if the quota is spent), then
        fetched and processed right here. Pagination proceeds even in scout
        mode and after handled errors (pages.py:206-244, 212-215)."""
        import ray

        while self.expand:
            next_source = page.get_next_source()
            if not next_source:
                return
            next_page = type(page)(page.input, source=next_source)
            key = tuple(row["order_key"]) + (PAGINATION_ORDINAL,)
            try:
                frow = frontier_row_from_page(next_page, key, row["depth"])
            except MissingSourceError as e:
                if self.error_policy == "raise":
                    raise
                out.append(self._page_row(
                    {**row, "order_key": list(key),
                     "order_bytes": encode_order_key(key)},
                    "error", error=str(e)))
                return
            frow["wave"] = row.get("wave")
            if self.filter_shards and frow["url"]:
                shard = self.filter_shards[
                    int(frow["url_hash"]) % len(self.filter_shards)]
                if not ray.get(shard.claim.remote(frow["url_hash"],
                                                  frow["order_bytes"])):
                    return  # already seen: dedup ends the chain
            code = self._admit([frow])[0]
            if code == 2:
                out.append(self._page_row(frow, "robots_denied"))
                return
            if code == 1:
                frow["row_kind"] = KIND_DEFER
                frow["pre_admitted"] = True
                out.append(frow)
                return
            page = next_page
            row = frow
            page, row = self._exec_page(page, row, out)
            if page is None:
                return

    def _emit_row(self, item, page: Page, row: dict, child_key, spans) -> dict:
        return {
            "row_kind": KIND_EMIT,
            "doc_id": order_key_str(child_key),
            "spans": spans,
            "page_class": row["page_class"],
            "source_url": row["url"],
            "order_key": list(child_key),
            "order_bytes": encode_order_key(child_key),
            "record_json": json.dumps(to_jsonable(item), sort_keys=True,
                                      default=str).encode(),
        }

    def _run_row(self, row: dict) -> list:
        out: list = []
        cls = self.registry.get(row["page_class"])
        if cls is None:
            out.append(self._page_row(row, "error",
                                      error=f"unknown page class {row['page_class']}"))
            return out
        from ..records import decode_input
        from ..origins import source_from_spec

        page = cls(decode_input(row["input_json"]),
                   source=source_from_spec(row["source_spec"]))
        cont, crow = self._exec_page(page, row, out)
        if cont is not None:
            self._follow_pagination(cont, crow, out)
        return out

    def _exec_page(self, page: Page, row: dict, out: list):
        """Fetch + process one page, appending emit/expand/page rows to
        ``out``. Returns (page, row) when the pagination chain should be
        followed (ok and handled-error outcomes), (None, row) otherwise
        (SkipItem / rejected / error end the chain, pages.py:218-222)."""
        key = tuple(row["order_key"])
        before = self.client.fetch_count

        try:
            page._fetch_data(self.client)
        except HandledError as e:
            # reference pages.py:212-215 — nothing to emit, pagination proceeds
            out.append(self._page_row(row, "handled_error",
                                      attempts=self.client.fetch_count - before,
                                      error=str(e)))
            return page, row
        except RejectedResponse as e:
            if self.error_policy == "raise":
                raise
            out.append(self._page_row(row, "rejected",
                                      attempts=self.client.fetch_count - before,
                                      error=str(e)))
            return None, row
        except Exception as e:  # uncaught HTTPError, MissingSourceError, parse
            if self.error_policy == "raise":
                raise
            out.append(self._page_row(row, "error",
                                      attempts=self.client.fetch_count - before,
                                      error=f"{type(e).__name__}: {e}"))
            return None, row

        attempts = self.client.fetch_count - before
        try:
            result = page.process_page()
        except SkipItem as e:
            # detail-level SkipItem: no output, no pagination (pages.py:218-222)
            out.append(self._page_row(row, "skipped", attempts=attempts,
                                      error=str(e)))
            return None, row
        except Exception as e:
            if self.error_policy == "raise":
                raise
            out.append(self._page_row(row, "error", attempts=attempts,
                                      error=f"{type(e).__name__}: {e}"))
            return None, row

        spans = None
        n_emitted = 0

        def emit(item, child_key):
            nonlocal spans, n_emitted
            if spans is None:
                spans = page.to_spans()
            out.append(self._emit_row(item, page, row, child_key, spans))
            n_emitted += 1

        try:
            if isinstance(result, types.GeneratorType):
                for idx, item in enumerate(result):
                    child_key = key + (idx,)
                    if self.scout:
                        emit(scout_projection(item), child_key)
                    elif isinstance(item, Page):
                        if self.expand:
                            out.append(frontier_row_from_page(
                                item, child_key, row["depth"] + 1))
                    else:
                        emit(item, child_key)
            elif self.scout:
                emit(scout_projection(result), key + (0,))
            elif isinstance(result, Page):
                if self.expand:
                    out.append(frontier_row_from_page(result, key + (0,),
                                                      row["depth"] + 1))
            else:
                emit(result, key + (0,))
        except Exception as e:
            if self.error_policy == "raise":
                raise
            out.append(self._page_row(row, "error", attempts=attempts,
                                      error=f"{type(e).__name__}: {e}"))
            return None, row

        out.append(self._page_row(row, "ok", attempts=attempts,
                                  n_emitted=n_emitted))
        return page, row

    def _offer_expands(self, out_rows: list) -> None:
        if not self.filter_shards:
            return
        import ray

        n = len(self.filter_shards)
        by_shard: typing.Dict[int, list] = {}
        for r in out_rows:
            if r.get("row_kind") == KIND_EXPAND and r.get("url"):
                by_shard.setdefault(int(r["url_hash"]) % n, []).append(
                    (int(r["url_hash"]), r["order_bytes"]))
        if by_shard:
            ray.get([
                self.filter_shards[s].offer.remote([h for h, _ in hs],
                                                   [o for _, o in hs])
                for s, hs in by_shard.items()
            ])

    def _filter_seen(self, rows: list) -> list:
        """Wave-N+1 side of the dedup protocol: drop rows that lost the
        min-order winner election committed at the end of wave N. Runs as
        the first step of the runner batch, so the whole query pass costs
        no extra Dataset execution."""
        if not self.filter_shards:
            return rows
        import ray

        n = len(self.filter_shards)
        by_shard: typing.Dict[int, list] = {}
        for i, r in enumerate(rows):
            if r.get("url") and not r.get("pre_admitted"):
                by_shard.setdefault(int(r["url_hash"]) % n, []).append(i)
        if not by_shard:
            return rows
        keep = [True] * len(rows)
        futures, idx_lists = [], []
        for s, idxs in by_shard.items():
            futures.append(self.filter_shards[s].query.remote(
                [int(rows[i]["url_hash"]) for i in idxs],
                [rows[i]["order_bytes"] for i in idxs]))
            idx_lists.append(idxs)
        for idxs, mask in zip(idx_lists, ray.get(futures)):
            for i, ok in zip(idxs, mask):
                keep[i] = bool(ok)
        return [r for r, k in zip(rows, keep) if k]

    # -- batch entry -------------------------------------------------------
    def __call__(self, batch):
        frontier_cols = [c for c in batch.schema.names
                         if c in _FRONTIER_COL_SET]
        rows = batch.select(frontier_cols).to_pylist()
        if self.query_input:
            rows = self._filter_seen(rows)
        codes = self._admit(rows)
        out_rows: list = []
        for row, code in zip(rows, codes):
            if code == 1:  # defer to next wave, already deduped
                defer = dict(row)
                defer["row_kind"] = KIND_DEFER
                defer["pre_admitted"] = True
                out_rows.append(defer)
            elif code == 2:
                out_rows.append(self._page_row(row, "robots_denied"))
            else:
                out_rows.extend(self._run_row(row))
        self._offer_expands(out_rows)
        # lineage counters are derived by the driver from the materialized
        # wave output (a cheap narrow pass) — no per-batch RPC to a shared
        # stats actor, which would serialize every runner on one mailbox at
        # cluster scale (round-1 verdict fix #6)
        return rows_to_table(out_rows, UNION_SCHEMA)
