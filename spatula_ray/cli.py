"""CLI: `scrape`, `test`, and `scout` equivalents of the reference commands
(``/root/reference/src/spatula/cli.py``), argparse-based.

- ``scrape``: full distributed crawl via the Ray engine (ray.init is owned
  by this entry point, guarded for pre-initialized sessions); output is a
  docs parquet directory (+ optional JSON-per-record compat dump).
- ``test``: single-page iterative dev loop on the sequential oracle — no
  cluster needed (reference cli.py:260-370 semantics: --data overrides,
  example_input/input_type fallback, --no-pagination, --subpages).
- ``scout``: wave-0 + pagination projections to scout.json
  (reference cli.py:434-468).

Page classes are addressed as dotted paths ``pkg.module.ClassName`` or a
module path (all leaf ListPage subclasses become roots, alphabetical —
reference cli.py:143-154). Fetching resolves through ``--resolver
module:factory`` (a zero-arg callable returning a url->row resolver; the
synthetic-web path) or, with ``--http``, the real requests-backed client.
"""

from __future__ import annotations

import argparse
import importlib
import inspect
import json
import os
import sys
import uuid
from typing import Any, Dict, List, Optional

from .model import ListPage, Page
from .records import display, obj_to_dict
from .runner import scrape_iter


def _import_attr(dotted: str):
    if ":" in dotted:
        mod, _, attr = dotted.partition(":")
        target = importlib.import_module(mod)
        for part in attr.split("."):
            target = getattr(target, part)
        return target
    try:
        return importlib.import_module(dotted)
    except ImportError:
        mod, _, attr = dotted.rpartition(".")
        target = importlib.import_module(mod)
        return getattr(target, attr)


def get_page_classes(name: str) -> List[type]:
    """Dotted class -> [cls]; module -> its leaf ListPage subclasses in
    alphabetical member order (reference cli.py:143-154)."""
    target = _import_attr(name)
    if isinstance(target, type) and issubclass(target, Page):
        return [target]
    classes = []
    for _n, member in inspect.getmembers(target):
        if (isinstance(member, type) and issubclass(member, ListPage)
                and member.__module__ == target.__name__):
            if not any(member is not other and issubclass(other, member)
                       for _m, other in inspect.getmembers(target)
                       if isinstance(other, type)):
                classes.append(member)
    if not classes:
        raise SystemExit(f"no ListPage subclasses found in {name}")
    return classes


def _build_client(args):
    if getattr(args, "resolver", None):
        from .client import SyntheticClient

        factory = _import_attr(args.resolver)
        if isinstance(factory, type):
            factory = factory()  # factory class -> instance
        return SyntheticClient(factory())
    from .client import RequestsClient

    return RequestsClient(requests_per_minute=args.rpm,
                          retry_attempts=args.retries,
                          retry_wait_seconds=args.retry_wait,
                          timeout=args.timeout,
                          user_agent=args.user_agent)


def _build_input(cls: type, data_pairs: List[str]):
    data: Dict[str, Any] = {}
    for pair in data_pairs or []:
        k, _, v = pair.partition("=")
        data[k] = v
    if cls.input_type is not None:
        fields = {}
        if data:
            fields.update(data)
        elif cls.example_input is not None:
            return cls.example_input
        try:
            return cls.input_type(**fields)
        except TypeError:
            # fill missing fields with dummy values (reference prompts here;
            # non-interactive engine uses placeholders)
            import dataclasses

            if dataclasses.is_dataclass(cls.input_type):
                for f in dataclasses.fields(cls.input_type):
                    fields.setdefault(f.name, f"~{f.name}")
            return cls.input_type(**fields)
    if data:
        return data
    return cls.example_input


def cmd_test(args) -> int:
    cls = get_page_classes(args.name)[0]
    input_val = _build_input(cls, args.data)
    source = args.source or cls.example_source
    page = cls(input_val, source=source) if source else cls(input_val)
    client = _build_client(args)

    if args.subpages:
        for _key, item in scrape_iter(page, client):
            print(display(item))
        return 0

    # manual loop mirroring reference cli.py:327-370: fetch, process, print;
    # child pages are reported, not followed; pagination honored
    from .model import HandledError, SkipItem

    n = 0
    while page is not None:
        try:
            page._fetch_data(client)
        except HandledError as e:
            print(f"handled error: {e}")
            break
        try:
            result = page.process_page()
        except SkipItem as e:
            print(f"skipped: {e}")
            break
        import types

        items = result if isinstance(result, types.GeneratorType) else [result]
        for item in items:
            if isinstance(item, Page):
                print(f"would continue with {item}")
            else:
                print(display(item))
            n += 1
        if args.pagination:
            next_source = page.get_next_source()
            if next_source:
                print(f"paginating for {cls.__name__} source={next_source}")
                page = cls(input_val, source=next_source)
                continue
        page = None
    print(f"{n} items")
    return 0


def _ray_init_guarded(num_cpus: Optional[int]) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")


def cmd_scrape(args) -> int:
    from .engine import CrawlConfig, crawl
    from .engine.driver import build_registry

    classes = get_page_classes(args.name)
    module = inspect.getmodule(classes[0])
    registry = build_registry(module) if module else build_registry(*classes)
    for c in classes:
        registry.setdefault(c.__name__, c)

    factory = _import_attr(args.resolver) if args.resolver else None
    if factory is None:
        raise SystemExit("scrape requires --resolver in this sandbox "
                         "(no network); pass module:factory")
    if isinstance(factory, type):
        factory = factory()

    seeds = []
    for cls in classes:
        if args.source:
            seeds.append(cls(source=args.source))
        else:
            seeds.append(cls())

    _ray_init_guarded(args.num_cpus)
    outdir = args.output or os.path.join("_scrapes", uuid.uuid4().hex[:8])
    cfg = CrawlConfig(dedup=args.dedup if args.dedup != "none" else None,
                      n_gates=args.gates,
                      checkpoint_dir=args.checkpoint,
                      batch_size=args.batch_size)
    result = crawl(seeds, registry, factory, cfg)
    os.makedirs(outdir, exist_ok=True)
    result.docs_sorted().write_parquet(os.path.join(outdir, "docs"))
    if args.json_records:
        jdir = os.path.join(outdir, "records")
        os.makedirs(jdir, exist_ok=True)
        count = 0
        for batch in result.docs.select_columns(["doc_id", "record_json"]) \
                .iter_batches(batch_format="pyarrow"):
            for did, rec in zip(batch["doc_id"].to_pylist(),
                                batch["record_json"].to_pylist()):
                with open(os.path.join(jdir, f"{did}.json"), "wb") as f:
                    f.write(bytes(rec))
                count += 1
    n = result.counters.get("emitted", 0)
    print(f"success: wrote {n} objects to {outdir}")
    print(json.dumps(result.counters, default=str))
    return 0


def cmd_scout(args) -> int:
    classes = get_page_classes(args.name)
    client = _build_client(args)
    items = []
    for i, cls in enumerate(classes):
        page = cls(source=args.source) if args.source else cls()
        for _key, item in scrape_iter(page, client, scout=True, key=(i,)):
            items.append(item)
    with open(args.output, "w") as f:
        json.dump(items, f, indent=1, default=str)
    print(f"wrote {len(items)} records to {args.output}")
    return 0


def _common_fetch_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--resolver", help="module:factory for a synthetic resolver")
    p.add_argument("--rpm", type=int, default=60)
    p.add_argument("--timeout", type=float, default=5.0)
    p.add_argument("--retries", type=int, default=0)
    p.add_argument("--retry-wait", type=float, default=10.0, dest="retry_wait")
    p.add_argument("--user-agent", default="spatula-ray", dest="user_agent")


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(prog="spatula-ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("test", help="dev-run one page class, no cluster")
    pt.add_argument("name")
    pt.add_argument("--source")
    pt.add_argument("-d", "--data", action="append", default=[])
    pt.add_argument("--no-pagination", dest="pagination", action="store_false")
    pt.add_argument("--subpages", action="store_true")
    _common_fetch_args(pt)
    pt.set_defaults(fn=cmd_test)

    ps = sub.add_parser("scrape", help="full distributed crawl")
    ps.add_argument("name")
    ps.add_argument("--source")
    ps.add_argument("-o", "--output")
    ps.add_argument("--dedup", default="cuckoo",
                    choices=["cuckoo", "exact", "none"])
    ps.add_argument("--gates", type=int, default=0)
    ps.add_argument("--checkpoint")
    ps.add_argument("--batch-size", type=int, default=128, dest="batch_size")
    ps.add_argument("--num-cpus", type=int, default=None, dest="num_cpus")
    ps.add_argument("--json-records", action="store_true", dest="json_records")
    _common_fetch_args(ps)
    ps.set_defaults(fn=cmd_scrape)

    pc = sub.add_parser("scout", help="wave-0 change detection")
    pc.add_argument("name")
    pc.add_argument("--source")
    pc.add_argument("-o", "--output", default="scout.json")
    _common_fetch_args(pc)
    pc.set_defaults(fn=cmd_scout)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
