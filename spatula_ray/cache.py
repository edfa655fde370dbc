"""Response cache — the engine's ``--fastmode`` equivalent of the
reference's scrapelib SQLite response cache
(``/root/reference/src/spatula/cli.py:62-66,91-93``: ``--fastmode`` attaches
``SQLiteCache`` with ``cache_write_only=False`` so a re-run of the same
scrape serves every response from cache).

Storage is one file per canonical-URL hash under ``cache_dir`` (rather than
one SQLite file): writes are atomic (tmp + rename) and idempotent, so many
runner actors — potentially on many nodes over shared storage — can hit the
same cache concurrently with no lock contention. Payload layout:
``status:int32 | url_len:int32 | url_utf8 | body``.

:class:`CachingClient` wraps any :class:`~spatula_ray.client.FetchClient`;
hits never touch the inner client (its ``fetch_count`` stays flat — the
fastmode test asserts a second run does zero resolver calls). Error
responses (4xx/5xx) are cached too and re-raise :class:`HTTPError` on hit,
mirroring scrapelib's cache-everything behavior.
"""

from __future__ import annotations

import hashlib
import os
import struct
from typing import Optional

from .client import FetchClient, HTTPError, Response
from .engine.keys import canonicalize


class ResponseCache:
    def __init__(self, cache_dir: str):
        self.dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    def _path(self, method: str, url: str) -> str:
        key = hashlib.blake2b(f"{method} {canonicalize(url)}".encode(),
                              digest_size=16).hexdigest()
        return os.path.join(self.dir, key)

    def get(self, method: str, url: str) -> Optional[Response]:
        path = self._path(method, url)
        try:
            with open(path, "rb") as f:
                raw = f.read()
        except OSError:
            return None
        status, url_len = struct.unpack("<ii", raw[:8])
        resp_url = raw[8:8 + url_len].decode()
        return Response(resp_url, status, raw[8 + url_len:], fromcache=True)

    def put(self, method: str, url: str, resp: Response) -> None:
        path = self._path(method, url)
        url_bytes = resp.url.encode()
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(struct.pack("<ii", resp.status_code, len(url_bytes)))
            f.write(url_bytes)
            f.write(resp.content)
        os.replace(tmp, path)


class CachingClient(FetchClient):
    """fastmode wrapper: consult the cache before the inner client,
    write-through on miss. ``fetch_count`` counts *logical* fetches (hits
    included) so the page runner's attempt accounting is unchanged; the
    inner client's counter advances only on real fetches."""

    def __init__(self, inner: FetchClient, cache_dir: str):
        self.inner = inner
        self.cache = ResponseCache(cache_dir)
        self.fetch_count = 0
        self.hits = 0
        self.misses = 0

    def request(self, method: str = "GET", url: str = "", data=None,
                headers=None, verify: bool = True,
                timeout: Optional[float] = None) -> Response:
        self.fetch_count += 1
        cached = self.cache.get(method, url)
        if cached is not None:
            self.hits += 1
            if cached.status_code >= 400:
                raise HTTPError(cached)
            return cached
        self.misses += 1
        try:
            resp = self.inner.request(method, url, data=data, headers=headers,
                                      verify=verify, timeout=timeout)
        except HTTPError as e:
            self.cache.put(method, url, e.response)
            raise
        self.cache.put(method, url, resp)
        return resp
