"""--fastmode response cache (reference cli.py:62-66,91-93): second runs of
the same scrape do zero real fetches. Unit level (CachingClient wraps any
FetchClient) and engine level (CrawlConfig.cache_dir; the second crawl runs
against a resolver that *raises* on any call, proving every response came
from the cache)."""

import os

import pytest

from spatula_ray.cache import CachingClient, ResponseCache
from spatula_ray.client import HTTPError, SyntheticClient


class CountingResolver:
    def __init__(self):
        self.pages = {
            "https://x.test/a": {"status": 200, "body": b"hello"},
            "https://x.test/err": {"status": 500, "body": b"boom"},
        }
        self.calls = 0

    def __call__(self, url):
        self.calls += 1
        return self.pages.get(url)


def test_caching_client_hits_skip_inner(tmp_path):
    inner = SyntheticClient(CountingResolver())
    c = CachingClient(inner, str(tmp_path / "cache"))
    r1 = c.request("GET", "https://x.test/a")
    assert r1.content == b"hello" and not r1.fromcache
    n = inner.fetch_count
    r2 = c.request("GET", "https://x.test/a")
    assert r2.content == b"hello" and r2.fromcache
    assert inner.fetch_count == n            # no real fetch on the hit
    assert c.hits == 1 and c.misses == 1 and c.fetch_count == 2


def test_caching_client_does_not_cache_errors(tmp_path):
    """scrapelib should_cache_response parity: only 2xx responses cache —
    a transient 500 must be retried on the next run, not replayed forever
    (round-2 ADVICE #2)."""
    inner = SyntheticClient(CountingResolver())
    c = CachingClient(inner, str(tmp_path / "cache"))
    for _ in range(2):
        with pytest.raises(HTTPError) as ei:
            c.request("GET", "https://x.test/err")
        assert ei.value.response.status_code == 500
        assert not ei.value.response.fromcache
    assert inner.fetch_count == 2       # real fetch each time

    for _ in range(2):
        with pytest.raises(HTTPError) as ei:
            c.request("GET", "https://x.test/nope")
        assert ei.value.response.status_code == 404
    assert inner.fetch_count == 4


def test_caching_client_keys_on_request_body(tmp_path):
    """Two POSTs to the same endpoint with different payloads must not
    collide (paginated form POSTs; round-2 ADVICE #1)."""
    class EchoResolver:
        def __init__(self):
            self.last = None

        def __call__(self, url):
            return {"status": 200, "body": (self.last or "x").encode()}

    inner = SyntheticClient(EchoResolver())
    c = CachingClient(inner, str(tmp_path / "cache"))
    inner.resolver.last = "page1"
    r1 = c.request("POST", "https://x.test/form", data={"page": 1})
    inner.resolver.last = "page2"
    r2 = c.request("POST", "https://x.test/form", data={"page": 2})
    assert r1.content == b"page1" and r2.content == b"page2"
    # both are independent cache entries now
    assert c.request("POST", "https://x.test/form",
                     data={"page": 1}).content == b"page1"
    assert c.request("POST", "https://x.test/form",
                     data={"page": 2}).content == b"page2"
    assert c.hits == 2 and c.misses == 2


def test_caching_client_persists_headers(tmp_path):
    """Warm runs observe the same response headers as cold runs
    (round-2 ADVICE #4)."""
    class HdrResolver:
        def __call__(self, url):
            return {"status": 200, "body": b"ok"}

    class HdrClient(SyntheticClient):
        def request(self, *a, **k):
            r = super().request(*a, **k)
            r.headers = {"Content-Type": "text/html", "ETag": "abc"}
            return r

    c = CachingClient(HdrClient(HdrResolver()), str(tmp_path / "cache"))
    cold = c.request("GET", "https://x.test/h")
    warm = c.request("GET", "https://x.test/h")
    assert warm.fromcache
    assert warm.headers == cold.headers == {"Content-Type": "text/html",
                                            "ETag": "abc"}


def test_cache_dir_is_sharded(tmp_path):
    """Two-level hash-prefix layout so no single directory accumulates
    millions of entries (round-2 verdict fix #8)."""
    from spatula_ray.client import Response

    cache = ResponseCache(str(tmp_path / "c"))
    cache.put("GET", "https://x.test/a", Response("https://x.test/a", 200, b"1"))
    path = cache._path("GET", "https://x.test/a")
    rel = os.path.relpath(path, str(tmp_path / "c"))
    parts = rel.split(os.sep)
    assert len(parts) == 3 and parts[0] == parts[2][:2]         and parts[1] == parts[2][2:4]
    assert cache.get("GET", "https://x.test/a").content == b"1"


def test_response_cache_roundtrip_is_atomic_and_idempotent(tmp_path):
    from spatula_ray.client import Response

    cache = ResponseCache(str(tmp_path / "c"))
    resp = Response("https://x.test/p?b=2&a=1", 200, b"\x00binary\xff")
    cache.put("GET", "https://x.test/p?b=2&a=1", resp)
    cache.put("GET", "https://x.test/p?b=2&a=1", resp)  # idempotent rewrite
    got = cache.get("GET", "https://x.test/p?b=2&a=1")
    assert got.status_code == 200 and got.content == b"\x00binary\xff"
    assert got.url == "https://x.test/p?b=2&a=1"
    # method and body are part of the key
    assert cache.get("POST", "https://x.test/p?b=2&a=1") is None
    assert cache.get("GET", "https://x.test/p?b=2&a=1",
                     data={"x": 1}) is None


class GatedEmployeesFactory:
    """Resolver factory that refuses to resolve once ``marker`` exists —
    the second (cache-warm) crawl must never reach it."""

    def __init__(self, marker: str):
        self.marker = marker

    def __call__(self):
        from spatula_ray.web import EmployeesResolverFactory

        inner = EmployeesResolverFactory()()
        marker = self.marker

        def resolve(url):
            if os.path.exists(marker):
                raise AssertionError("resolver called despite warm cache")
            return inner(url)

        return resolve


@pytest.mark.usefixtures("ray_session")
def test_fastmode_crawl_second_run_zero_fetches(tmp_path):
    # this module is not importable inside Ray workers; ship the factory
    # class by value instead of by reference
    import sys

    from ray import cloudpickle  # ray serializes with its vendored pickler

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    import spatula_ray.web as web
    from spatula_ray.engine import CrawlConfig, crawl
    from spatula_ray.engine.driver import build_registry
    from spatula_ray.web import EmployeeList

    marker = str(tmp_path / "no_more_fetches")
    factory = GatedEmployeesFactory(marker)
    registry = build_registry(web)
    cfg = lambda: CrawlConfig(dedup="cuckoo", n_filter_shards=2,
                              cache_dir=str(tmp_path / "cache"))

    r1 = crawl([EmployeeList()], registry, factory, cfg())
    n1 = r1.counters["emitted"]
    assert n1 > 0

    open(marker, "w").close()     # from now on any real resolve raises
    r2 = crawl([EmployeeList()], registry, factory, cfg())
    assert r2.counters["emitted"] == n1
    ids1 = sorted(r["doc_id"] for r in r1.docs.select_columns(["doc_id"]).take_all())
    ids2 = sorted(r["doc_id"] for r in r2.docs.select_columns(["doc_id"]).take_all())
    assert ids1 == ids2


def test_cli_test_fastmode(tmp_path, capsys):
    """cmd_test with --fastmode twice: identical output both times."""
    from spatula_ray.cli import main

    args = ["test", "spatula_ray.web.EmployeeList",
            "--resolver", "spatula_ray.web:EmployeesResolverFactory",
            "--fastmode", "--cache-dir", str(tmp_path / "cache")]
    assert main(args) == 0
    out1 = capsys.readouterr().out
    assert main(args) == 0
    out2 = capsys.readouterr().out
    assert out1 == out2
    assert "44 items" in out1
    assert os.listdir(str(tmp_path / "cache"))  # cache got populated
