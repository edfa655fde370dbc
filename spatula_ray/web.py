"""Deterministic synthetic webs — the engine's network-free fixtures
(FIXTURES.md §1.2/§2/§3). Three families:

* :func:`employees_web` — small hand-built fixture mirroring the reference's
  canonical list→detail chain with pagination, a 404 detail, an awards
  dependency page, a Vacant row (SkipItem), and a robots-disallowed page
  (reference docs/scraper-basics.md + docs/advanced-techniques.md).
* :class:`FormulaResolver` — *formula web* for scale runs: bodies are
  generated on the fly from (seed, host, page) so arbitrarily large logical
  URL spaces cost zero storage. Link structure is deterministic; a
  configurable hot-host fraction points extra links at host 0 to exercise
  skew containment.
* :class:`DocwebResolverFactory` — the *doc-web*: listing+detail pages
  synthesized from a driver-provided ``documents`` parquet table
  (TESTDATA.md), so crawl output is SQL-checkable against the same table.

All generators are pure functions of (seed, scale); no wall clock, no RNG at
run time.
"""

from __future__ import annotations

import hashlib
import html as _html

import pyarrow as pa
import json
import re
from typing import Any, Dict, Optional
from urllib.parse import parse_qs, urlsplit

from .model import HtmlListPage, HtmlPage, SkipItem
from .origins import NullSource
from .select import CSS, XPath

# ---------------------------------------------------------------------------
# employees fixture
# ---------------------------------------------------------------------------

EMP_HOST = "h1.example.test"
EMP_BASE = f"https://{EMP_HOST}"
_FIRST = ["Ada", "Grace", "Alan", "Edsger", "Barbara", "Donald", "John", "Joan",
          "Tim", "Radia", "Ken", "Dennis", "Leslie", "Frances", "Margaret"]
_LAST = ["Lovelace", "Hopper", "Turing", "Dijkstra", "Liskov", "Knuth",
         "McCarthy", "Clarke", "Berners-Lee", "Perlman", "Thompson", "Ritchie",
         "Lamport", "Allen", "Hamilton"]
_POSITIONS = ["Engineer", "Director", "Analyst"]


def _employee(n: int) -> dict:
    return {
        "first": _FIRST[n % 15],
        "last": _LAST[(n * 7) % 15],
        "position": _POSITIONS[n % 3],
        "status": "Active" if n % 5 else "Retired",
        "hired": f"20{10 + n % 14:02d}-0{1 + n % 9}-15",
    }


def employees_web() -> Dict[str, Dict[str, Any]]:
    """Build the web_pages mapping for the employees fixture: 45 staff over 3
    paginated listing pages, detail #13 is a 404, one Vacant row, an awards
    page, and a robots-disallowed /private page."""
    pages: Dict[str, Dict[str, Any]] = {}
    per_page = 15
    for p in range(3):
        rows = []
        for i in range(per_page):
            n = p * per_page + i
            if n == 7:
                rows.append("<tr><td>Vacant</td><td></td><td></td><td></td></tr>")
                continue
            e = _employee(n)
            rows.append(
                f"<tr><td>{e['first']}</td><td>{e['last']}</td>"
                f"<td>{e['position']}</td>"
                f"<td><a href='/staff/{n}'>details</a></td></tr>"
            )
        nxt = (f"<a id='next' href='/staff?page={p + 2}'>Next</a>"
               if p < 2 else "")
        extra = "<a href='/private/secret'>internal</a>" if p == 2 else ""
        body = (f"<html><body><table id='employees'><tbody>{''.join(rows)}"
                f"</tbody></table>{nxt}{extra}</body></html>")
        url = f"{EMP_BASE}/staff" if p == 0 else f"{EMP_BASE}/staff?page={p + 1}"
        pages[url] = {"status": 200, "body": body.encode()}

    for n in range(45):
        if n == 7:
            continue
        url = f"{EMP_BASE}/staff/{n}"
        if n == 13:
            pages[url] = {"status": 404, "body": b"not found"}
            continue
        e = _employee(n)
        body = (f"<html><body><h1>{e['first']} {e['last']}</h1>"
                f"<dl><dd id='position'>{e['position']}</dd>"
                f"<dd id='status'>{e['status']}</dd>"
                f"<dd id='hired'>{e['hired']}</dd></dl></body></html>")
        pages[url] = {"status": 200, "body": body.encode()}

    cards = "".join(
        f"<div class='card'><h2>{_FIRST[i % 15]} {_LAST[(i * 7) % 15]}</h2>"
        f"<small>Award {i}</small></div>"
        for i in range(0, 45, 9)
    )
    pages[f"{EMP_BASE}/awards"] = {
        "status": 200,
        "body": f"<html><body>{cards}</body></html>".encode(),
    }
    pages[f"{EMP_BASE}/private/secret"] = {
        "status": 200, "body": b"<html><body>secret</body></html>",
    }
    return pages


EMP_ROBOTS = {EMP_HOST: {"disallow": ["/private"]}}


class AwardsPage(HtmlPage):
    """Augmentation page: name -> award mapping (instance-dependency /
    broadcast-join path, reference docs/advanced-techniques.md:8-120)."""

    source = f"{EMP_BASE}/awards"

    def process_page(self):
        mapping = {}
        for card in CSS(".card", min_items=0).match(self.root):
            name = XPath(".//h2/text()").match_one(card)
            award = XPath(".//small/text()").match_one(card)
            mapping[name] = award
        return mapping


class EmployeeDetail(HtmlPage):
    dependencies = {"awards": AwardsPage()}

    def get_source_from_input(self):
        return self.input["url"]

    def process_error_response(self, exception):
        # 404 detail page: drop silently, keep crawling (HandledError path)
        pass

    def process_page(self):
        name = f"{self.input['first']} {self.input['last']}"
        return {
            **{k: v for k, v in self.input.items() if k != "url"},
            "position": CSS("#position").match_one(self.root).text,
            "status": CSS("#status").match_one(self.root).text,
            "hired": CSS("#hired").match_one(self.root).text,
            "award": self.awards.get(name, ""),
        }


class EmployeeList(HtmlListPage):
    source = f"{EMP_BASE}/staff"
    selector = CSS("#employees tbody tr")

    def process_item(self, item):
        tds = item.xpath(".//td")
        first = tds[0].text
        if first == "Vacant":
            raise SkipItem("vacant")
        link = tds[3].xpath(".//a/@href")[0]
        return EmployeeDetail({"first": first, "last": tds[1].text, "url": link})

    def get_next_source(self):
        nxt = self.root.cssselect("#next")
        return nxt[0].get("href") if nxt else None


class EmployeesResolverFactory:
    """Picklable resolver factory for the employees fixture."""

    def __call__(self):
        from .client import TableResolver

        return TableResolver(employees_web())


# ---------------------------------------------------------------------------
# formula web (scale / bench)
# ---------------------------------------------------------------------------

_FORMULA_URL = re.compile(r"https://h(\d+)\.bench\.test/p/(\d+)$")
_WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
          "nu xi omicron pi rho sigma tau upsilon phi chi psi omega").split()


class FormulaResolver:
    """Generate page bodies on the fly from the URL (picklable, tiny spec).

    URL space: https://h{i}.bench.test/p/{j}, i < n_hosts, j < pages_per_host.
    Deterministic link graph: ``links_per_page`` links per page; every 4th
    link crosses hosts; a ``hot_frac`` share of cross links is redirected to
    host 0 (skew). ``media_per_page`` <img> tags; text filler sized by
    ``text_words``.
    """

    def __init__(self, n_hosts: int = 10, pages_per_host: int = 100,
                 links_per_page: int = 8, media_per_page: int = 2,
                 text_words: int = 60, hot_frac: float = 0.0, seed: int = 42,
                 flaky_every: int = 0):
        self.n_hosts = n_hosts
        self.pages_per_host = pages_per_host
        self.links_per_page = links_per_page
        self.media_per_page = media_per_page
        self.text_words = text_words
        self.hot_frac = hot_frac
        self.seed = seed
        self.flaky_every = flaky_every

    def _rng(self, h: int, p: int, salt: int) -> int:
        data = f"{self.seed}:{h}:{p}:{salt}".encode()
        return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")

    def __call__(self, url: str) -> Optional[Dict[str, Any]]:
        m = _FORMULA_URL.match(url)
        if not m:
            return None
        h, p = int(m.group(1)), int(m.group(2))
        if h >= self.n_hosts or p >= self.pages_per_host:
            return None
        parts = [f"<html><body><h1>page {h}/{p}</h1>"]
        import numpy as _np

        # filler words via a vectorized hash mix — the old per-page
        # RandomState construction alone cost ~120us/page, ~25% of the
        # whole synthetic fetch. Only the filler TEXT changes (links,
        # media, ordering all derive from _rng/blake2b as before); the
        # spider record is {url, n_links, n_media}, so no oracle or
        # conformance surface reads these bytes.
        base = _np.uint64(self._rng(h, p, 999))
        mix = (base + _np.arange(self.text_words, dtype=_np.uint64)
               * _np.uint64(0x9E3779B97F4A7C15))
        mix ^= mix >> _np.uint64(31)
        idx = (mix % _np.uint64(len(_WORDS))).astype(_np.int64)
        words = [_WORDS[i] for i in idx]
        parts.append(f"<p>{' '.join(words)}</p>")
        for l in range(self.links_per_page):
            r = self._rng(h, p, l)
            if l % 4 == 3:  # cross-host link
                if self.hot_frac and (r % 1000) < self.hot_frac * 1000:
                    th = 0
                else:
                    th = r % self.n_hosts
            else:
                th = h
            tp = r % self.pages_per_host
            parts.append(f"<a href='https://h{th}.bench.test/p/{tp}'>l{l}</a>")
        for mdx in range(self.media_per_page):
            r = self._rng(h, p, 10_000 + mdx)
            parts.append(f"<img src='/media/{r % 10_000}.png'>")
        parts.append("</body></html>")
        flaky = 1 if (self.flaky_every and (h * self.pages_per_host + p) %
                      self.flaky_every == 0) else 0
        return {"status": 200, "body": "".join(parts).encode(),
                "flaky_until": flaky}


class FormulaResolverFactory:
    def __init__(self, **spec):
        self.spec = spec

    def __call__(self):
        return FormulaResolver(**self.spec)


class SpiderPage(HtmlPage):
    """Generic breadth spider over the formula web: emit a per-page record,
    expand every in-web link (global URL-seen dedup bounds the crawl)."""

    accept_marker = b"__FLAKY__"

    def get_source_from_input(self):
        return self.input["url"]

    def accept_response(self, response):
        return response is None or not response.content.startswith(self.accept_marker)

    def process_page(self):
        links = [a for a in self.root.xpath("//a/@href")]
        media = self.root.xpath("//img/@src")
        yield {
            "url": getattr(self.source, "url", ""),
            "n_links": len(links),
            "n_media": len(media),
        }
        for href in links:
            if ".bench.test/" in href:
                yield SpiderPage({"url": href})


def spider_seeds(n_hosts: int):
    return [SpiderPage({"url": f"https://h{i}.bench.test/p/0"})
            for i in range(n_hosts)]


# ---------------------------------------------------------------------------
# doc-web (documents.parquet -> listing+detail site; SQL-checkable)
# ---------------------------------------------------------------------------

DOCWEB_PAGE_SIZE = 20


def docweb_n_hosts(n_docs: int) -> int:
    return max(1, min(10, n_docs // 50))


def doc_url(doc_id: int, n_hosts: int) -> str:
    return f"https://h{doc_id % n_hosts:03d}.docweb.test/doc/{doc_id}"


class DocwebResolverFactory:
    """Builds a resolver over a documents parquet file. The table is read
    once per worker process (the runner cache keeps the factory's product
    alive), so bodies are synthesized locally — nothing ships per batch."""

    def __init__(self, documents_path: str):
        self.documents_path = documents_path

    def __call__(self):
        import pyarrow.parquet as pq

        t = pq.read_table(self.documents_path,
                          columns=["doc_id", "text", "lang", "source"])
        docs = {int(d): (t_, l, s) for d, t_, l, s in zip(
            t["doc_id"].to_pylist(), t["text"].to_pylist(),
            t["lang"].to_pylist(), t["source"].to_pylist())}
        n_hosts = docweb_n_hosts(len(docs))
        by_host: Dict[int, list] = {}
        for d in sorted(docs):
            by_host.setdefault(d % n_hosts, []).append(d)
        return _DocwebResolver(docs, by_host, n_hosts)


class _DocwebResolver:
    def __init__(self, docs, by_host, n_hosts):
        self.docs = docs
        self.by_host = by_host
        self.n_hosts = n_hosts

    def __call__(self, url: str) -> Optional[Dict[str, Any]]:
        parts = urlsplit(url)
        m = re.match(r"h(\d+)\.docweb\.test$", parts.netloc)
        if not m:
            return None
        h = int(m.group(1))
        if h >= self.n_hosts:
            return None
        if parts.path == "/list":
            q = parse_qs(parts.query)
            p = int(q.get("page", ["0"])[0])
            ids = self.by_host.get(h, [])
            chunk = ids[p * DOCWEB_PAGE_SIZE:(p + 1) * DOCWEB_PAGE_SIZE]
            if p and not chunk:
                return None
            links = "".join(
                f"<a class='doc' href='/doc/{d}'>Doc {d}</a>" for d in chunk)
            nxt = (f"<a id='next' href='/list?page={p + 1}'>next</a>"
                   if len(ids) > (p + 1) * DOCWEB_PAGE_SIZE else "")
            body = f"<html><body><ul>{links}</ul>{nxt}</body></html>"
            return {"status": 200, "body": body.encode()}
        m2 = re.match(r"^/doc/(\d+)$", parts.path)
        if m2:
            d = int(m2.group(1))
            if d not in self.docs or d % self.n_hosts != h:
                return None
            text, lang, source = self.docs[d]
            body = (f"<html><body><h1>Doc {d}</h1>"
                    f"<div class='meta'><span id='lang'>{lang}</span>"
                    f"<span id='source'>{source}</span></div>"
                    f"<p id='body'>{_html.escape(text)}</p>"
                    f"<img src='/media/{d}.png'></body></html>")
            return {"status": 200, "body": body.encode()}
        return None


class DocList(HtmlListPage):
    selector = CSS("a.doc", min_items=0)

    def get_source_from_input(self):
        return self.input["url"]

    def process_item(self, a):
        return DocDetail({"url": a.get("href")})

    def get_next_source(self):
        nxt = self.root.cssselect("#next")
        return nxt[0].get("href") if nxt else None


class DocDetail(HtmlPage):
    # typed-record declaration: the engine emits these as one Arrow
    # struct column (no JSON bytes) — engine/schema.merged_record_type
    record_fields = [("doc_id", pa.int64()), ("lang", pa.string()),
                     ("source", pa.string()), ("text", pa.string()),
                     ("n_chars", pa.int64())]

    def get_source_from_input(self):
        return self.input["url"]

    def process_page(self):
        doc_id = int(self.root.xpath("//h1")[0].text.split()[-1])
        body = self.root.xpath("//p[@id='body']")[0]
        text = body.text or ""
        return {
            "doc_id": doc_id,
            "lang": self.root.xpath("//span[@id='lang']")[0].text,
            "source": self.root.xpath("//span[@id='source']")[0].text,
            "text": text,
            "n_chars": len(text),
        }


def docweb_seeds(n_docs: int):
    n_hosts = docweb_n_hosts(n_docs)
    return [DocList({"url": f"https://h{i:03d}.docweb.test/list"})
            for i in range(n_hosts)]


# ---------------------------------------------------------------------------
# mixed-content fixture web (JSON listing -> CSV / XML / PDF details,
# a flaky page for the content-retry loop, a robots-disallowed fetcher,
# and typed-dataclass-input pages)
# ---------------------------------------------------------------------------

from dataclasses import dataclass as _dataclass

from .model import CsvListPage, JsonListPage, PdfPage, XmlListPage

MIXED_BASE = "https://mixed.test"


def mixed_web():
    import json as _json

    return {
        f"{MIXED_BASE}/index.json": {
            "status": 200,
            "body": _json.dumps([
                {"kind": "csv", "url": f"{MIXED_BASE}/data.csv"},
                {"kind": "xml", "url": f"{MIXED_BASE}/feed.xml"},
                {"kind": "pdf", "url": f"{MIXED_BASE}/doc.pdf"},
            ]).encode(),
        },
        f"{MIXED_BASE}/data.csv": {"status": 200,
                                   "body": b"name,qty\nax,1\nbx,2\ncx,3"},
        f"{MIXED_BASE}/feed.xml": {
            "status": 200,
            "body": b"<feed><item>alpha</item><item>beta</item></feed>",
        },
        f"{MIXED_BASE}/doc.pdf": {"status": 200,
                                  "body": b"%FAKEPDF\npdf body text"},
        f"{MIXED_BASE}/flaky": {"status": 200, "body": b"stable at last",
                                "flaky_until": 1},
    }


class MixedResolverFactory:
    def __call__(self):
        from .client import TableResolver

        return TableResolver(mixed_web())


class CsvRows(CsvListPage):
    def get_source_from_input(self):
        return self.input["url"]

    def process_item(self, item):
        return {"kind": "csv", **item}


class XmlItems(XmlListPage):
    selector = XPath("//item/text()")

    def get_source_from_input(self):
        return self.input["url"]

    def process_item(self, item):
        return {"kind": "xml", "value": item}


class PdfText(PdfPage):
    def get_source_from_input(self):
        return self.input["url"]

    def process_page(self):
        return {"kind": "pdf", "text": self.text}


class MixedIndex(JsonListPage):
    source = f"{MIXED_BASE}/index.json"

    def process_item(self, item):
        cls = {"csv": CsvRows, "xml": XmlItems, "pdf": PdfText}[item["kind"]]
        return cls({"url": item["url"]})


class FlakyPage(HtmlPage):
    source = f"{MIXED_BASE}/flaky"

    def accept_response(self, response):
        return not response.content.startswith(b"__FLAKY__")

    def process_page(self):
        return {"body": self.response.text}


class SecretFetcher(HtmlPage):
    source = f"{EMP_BASE}/private/secret"

    def process_page(self):
        return {"secret": self.root.text_content()}


@_dataclass
class DocRef:
    url: str
    label: str


class TypedDetail(HtmlPage):
    input_type = DocRef

    def get_source_from_input(self):
        return self.input.url

    def process_page(self):
        return {"label": self.input.label, "n": len(self.root.text_content())}


class TypedIndex(JsonListPage):
    source = f"{MIXED_BASE}/index.json"

    def process_item(self, item):
        if item["kind"] != "xml":
            raise SkipItem("only xml")
        return TypedDetail(DocRef(url=item["url"], label="feed"))
