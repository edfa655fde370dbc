"""Sources: declarative descriptions of how a page obtains its response.

Mirrors the reference surface (``/root/reference/src/spatula/sources.py``):
``Source`` plugin base, ``URL`` (method / POST data / headers / timeout /
retries), ``NullSource`` (dispatch-only, no fetch). ``get_response`` takes the
engine's :class:`~spatula_ray.client.FetchClient` instead of a scrapelib
session; user subclasses may override it for multi-request flows.

For the distributed path every source must be representable as a frontier-row
column; ``to_spec`` / ``source_from_spec`` round-trip the built-in kinds
through JSON and fall back to cloudpickle for user subclasses.
"""

from __future__ import annotations

import base64
import json
from typing import Any, Dict, Optional


class Source:
    """Plugin point: subclasses implement ``get_response(client)``."""

    retries: Optional[int] = None

    def get_response(self, client):  # pragma: no cover - abstract
        raise NotImplementedError


class URL(Source):
    def __init__(
        self,
        url: str,
        method: str = "GET",
        data: Optional[dict] = None,
        headers: Optional[dict] = None,
        verify: bool = True,
        timeout: Optional[float] = None,
        retries: Optional[int] = None,
    ):
        self.url = url
        self.method = method
        self.data = data
        self.headers = headers
        self.verify = verify
        self.timeout = timeout
        self.retries = retries

    def get_response(self, client):
        return client.request(
            method=self.method,
            url=self.url,
            data=self.data,
            headers=self.headers,
            verify=self.verify,
            timeout=self.timeout,
        )

    def __str__(self) -> str:
        return self.url


class NullSource(Source):
    """No HTTP request; used to dispatch work without fetching."""

    retries = 0

    def get_response(self, client):
        return None

    def __str__(self) -> str:
        return self.__class__.__name__


# ---------------------------------------------------------------------------
# spec round-trip for frontier rows
# ---------------------------------------------------------------------------

def to_spec(source: Source) -> bytes:
    if type(source) is URL:
        if (source.method == "GET" and source.data is None
                and source.headers is None and source.verify
                and source.timeout is None and source.retries is None):
            # hot path: plain GET — avoid building/sorting the full dict
            return ('{"kind": "url", "url": %s}'
                    % json.dumps(source.url)).encode()
        return json.dumps(
            {
                "kind": "url",
                "url": source.url,
                "method": source.method,
                "data": source.data,
                "headers": source.headers,
                "verify": source.verify,
                "timeout": source.timeout,
                "retries": source.retries,
            },
            sort_keys=True,
        ).encode()
    if type(source) is NullSource:
        return b'{"kind": "null"}'
    # user subclass: cloudpickle fallback (available via ray)
    import cloudpickle

    return json.dumps(
        {"kind": "pickle", "b64": base64.b64encode(cloudpickle.dumps(source)).decode()}
    ).encode()


def source_from_spec(spec: Optional[bytes]) -> Optional[Source]:
    if not spec:
        return None
    d: Dict[str, Any] = json.loads(spec)
    kind = d.get("kind")
    if kind == "url" and len(d) == 2:
        return URL(d["url"])
    if kind == "url":
        return URL(
            d["url"],
            method=d.get("method", "GET"),
            data=d.get("data"),
            headers=d.get("headers"),
            verify=d.get("verify", True),
            timeout=d.get("timeout"),
            retries=d.get("retries"),
        )
    if kind == "null":
        return NullSource()
    if kind == "pickle":
        import cloudpickle

        return cloudpickle.loads(base64.b64decode(d["b64"]))
    raise ValueError(f"unknown source spec kind: {kind!r}")
