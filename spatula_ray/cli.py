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


def _parse_headers(pairs: List[str]) -> Dict[str, str]:
    headers = {}
    for p in pairs or []:
        k, _, v = p.partition(":")
        headers[k.strip()] = v.strip()
    return headers


def _build_client(args):
    if getattr(args, "resolver", None):
        from .client import SyntheticClient

        factory = _import_attr(args.resolver)
        if isinstance(factory, type):
            factory = factory()  # factory class -> instance
        client = SyntheticClient(factory())
    else:
        from .client import RequestsClient

        client = RequestsClient(requests_per_minute=args.rpm,
                                retry_attempts=args.retries,
                                retry_wait_seconds=args.retry_wait,
                                timeout=args.timeout,
                                user_agent=args.user_agent,
                                headers=_parse_headers(
                                    getattr(args, "header", [])),
                                verify=getattr(args, "verify", True))
    if getattr(args, "fastmode", False):
        # reference cli.py:62-66,91-93 — response cache for cheap re-runs
        from .cache import CachingClient

        client = CachingClient(client, args.cache_dir)
    return client


def _resolve_dump(dotted: Optional[str]):
    """--dump module.func (reference cli.py:134-140); default json.dump."""
    if not dotted:
        return lambda obj, f: json.dump(obj, f, default=str)
    fn = _import_attr(dotted)
    if not callable(fn):
        raise SystemExit(f"--dump target {dotted} is not callable")
    return fn


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


def _prompt_input(cls: type, data: Dict[str, Any]) -> Any:
    """--interactive: prompt for each input_type field not supplied via -d
    (reference cli.py:221-257)."""
    import dataclasses

    fields: Dict[str, Any] = dict(data)
    if cls.input_type is None:
        return fields or None
    names = []
    if dataclasses.is_dataclass(cls.input_type):
        names = [f.name for f in dataclasses.fields(cls.input_type)]
    elif hasattr(cls.input_type, "model_fields"):   # pydantic v2
        names = list(cls.input_type.model_fields)
    elif hasattr(cls.input_type, "__attrs_attrs__"):
        names = [a.name for a in cls.input_type.__attrs_attrs__]
    for name in names:
        if name not in fields:
            fields[name] = input(f"{name}: ")
    return cls.input_type(**fields)


def cmd_test(args) -> int:
    cls = get_page_classes(args.name)[0]
    if args.interactive:
        data = {}
        for pair in args.data or []:
            k, _, v = pair.partition("=")
            data[k] = v
        input_val = _prompt_input(cls, data)
    else:
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


def _default_output_dir() -> str:
    """Auto-incremented dated output dir, reference cli.py:395-407:
    ``_scrapes/<iso-date>/<nnn>``."""
    import datetime

    base = os.path.join("_scrapes", datetime.date.today().isoformat())
    os.makedirs(base, exist_ok=True)
    n = max((int(d) for d in os.listdir(base) if d.isdigit()), default=0) + 1
    return os.path.join(base, f"{n:03d}")


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

    outdir = args.output or _default_output_dir()
    if args.rmdir and os.path.isdir(outdir):
        import shutil

        shutil.rmtree(outdir)
    if os.path.isdir(outdir) and os.listdir(outdir):
        # reference cli.py:409-414: refuse a non-empty -o dir unless --rmdir
        raise SystemExit(f"{outdir} exists and is not empty "
                         "(use --rmdir to overwrite)")
    _ray_init_guarded(args.num_cpus)
    cfg = CrawlConfig(dedup=args.dedup if args.dedup != "none" else None,
                      n_gates=args.gates,
                      checkpoint_dir=args.checkpoint,
                      batch_size=args.batch_size,
                      cache_dir=(args.cache_dir if args.fastmode else None))
    result = crawl(seeds, registry, factory, cfg)
    os.makedirs(outdir, exist_ok=True)
    from .sinks import write_docs

    write_docs(result.docs_sorted(), os.path.join(outdir, "docs"),
               fmt=getattr(args, "sink_format", "auto"))
    if args.json_records:
        dump_fn = _resolve_dump(args.dump) if args.dump else None
        jdir = os.path.join(outdir, "records")
        os.makedirs(jdir, exist_ok=True)
        count = 0
        rec_cols = ["doc_id", "record_json"]
        has_struct = "record" in result.docs.schema().names
        if has_struct:
            rec_cols.append("record")
        for batch in result.docs.select_columns(rec_cols) \
                .iter_batches(batch_format="pyarrow"):
            structs = batch["record"].to_pylist() if has_struct \
                else [None] * batch.num_rows
            for did, rec, rs in zip(batch["doc_id"].to_pylist(),
                                    batch["record_json"].to_pylist(),
                                    structs):
                # typed-record classes carry the struct, not JSON bytes;
                # the sink is the serialization boundary either way
                obj = rs if rec is None else json.loads(bytes(rec))
                if dump_fn is not None:
                    with open(os.path.join(jdir, f"{did}.json"), "w") as f:
                        dump_fn(obj, f)
                elif rec is not None:
                    with open(os.path.join(jdir, f"{did}.json"), "wb") as f:
                        f.write(bytes(rec))
                else:
                    with open(os.path.join(jdir, f"{did}.json"), "w") as f:
                        json.dump(obj, f, sort_keys=True, default=str)
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


def cmd_shell(args) -> int:
    """Fetch one page and drop into an interactive shell with it in scope
    (reference cli.py:192-203; IPython there, stdlib ``code`` fallback —
    IPython is absent in this environment)."""
    cls = get_page_classes(args.name)[0]
    input_val = _build_input(cls, args.data)
    source = args.source or cls.example_source
    page = cls(input_val, source=source) if source else cls(input_val)
    client = _build_client(args)
    page._fetch_data(client)
    ns = {"page": page, "response": page.response, "client": client}
    banner = (f"spatula-ray shell: {type(page).__name__} fetched\n"
              "variables: page, response, client")
    try:  # pragma: no cover - IPython not installed in sandbox
        from IPython import embed

        embed(user_ns=ns, banner1=banner)
    except ImportError:
        import code

        code.interact(banner=banner, local=ns)
    return 0


def _common_fetch_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--resolver", help="module:factory for a synthetic resolver")
    p.add_argument("--rpm", type=int, default=60)
    p.add_argument("--timeout", type=float, default=5.0)
    p.add_argument("--retries", type=int, default=0)
    p.add_argument("--retry-wait", type=float, default=10.0, dest="retry_wait")
    p.add_argument("--user-agent", default="spatula-ray", dest="user_agent")
    p.add_argument("--header", action="append", default=[],
                   help="extra header 'Name: value' (repeatable)")
    p.add_argument("--verify", dest="verify", action="store_true",
                   default=True)
    p.add_argument("--no-verify", dest="verify", action="store_false")
    p.add_argument("--fastmode", action="store_true",
                   help="response cache: second runs skip real fetches")
    p.add_argument("--cache-dir", default="spatula-cache", dest="cache_dir")


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(prog="spatula-ray")
    parser.add_argument("-v", "--verbose", action="count", default=0)
    parser.add_argument("-q", "--quiet", action="count", default=0)
    sub = parser.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("test", help="dev-run one page class, no cluster")
    pt.add_argument("name")
    pt.add_argument("--source")
    pt.add_argument("-d", "--data", action="append", default=[])
    pt.add_argument("--no-pagination", dest="pagination", action="store_false")
    pt.add_argument("--subpages", action="store_true")
    pt.add_argument("--interactive", action="store_true",
                    help="prompt for input_type fields not given via -d")
    _common_fetch_args(pt)
    pt.set_defaults(fn=cmd_test)

    psh = sub.add_parser("shell", help="fetch a page, open an interactive shell")
    psh.add_argument("name")
    psh.add_argument("--source")
    psh.add_argument("-d", "--data", action="append", default=[])
    _common_fetch_args(psh)
    psh.set_defaults(fn=cmd_shell)

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
    ps.add_argument("--format", default="auto", dest="sink_format",
                    choices=("auto", "lance", "parquet"),
                    help="docs sink format: lance when the package is "
                         "available, partitioned parquet otherwise")
    ps.add_argument("--rmdir", action="store_true",
                    help="clear the output dir first (reference --rmdir)")
    ps.add_argument("--dump", help="module.func used to serialize records "
                                   "(reference --dump; default json.dump)")
    _common_fetch_args(ps)
    ps.set_defaults(fn=cmd_scrape)

    pc = sub.add_parser("scout", help="wave-0 change detection")
    pc.add_argument("name")
    pc.add_argument("--source")
    pc.add_argument("-o", "--output", default="scout.json")
    _common_fetch_args(pc)
    pc.set_defaults(fn=cmd_scout)

    args = parser.parse_args(argv)
    import logging

    level = logging.WARNING + 10 * args.quiet - 10 * args.verbose
    logging.basicConfig(level=max(logging.DEBUG, min(logging.CRITICAL, level)))
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
