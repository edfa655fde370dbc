"""Canonical URL hashing and order-key encoding.

Two partitioning keys (SURVEY.md §7.3): ``url_hash = hash64(canonicalize(url))``
owns URL-seen dedup; ``host_hash = hash64(host)`` owns politeness/fetch
placement so a hot host is contained to one gate shard.

Order keys are lineage paths (tuples of ints). They are carried both as
``list<int64>`` (readable) and as big-endian fixed-width bytes
(``order_bytes``) whose bytewise lexicographic order equals tuple order —
that's what ``Dataset.sort`` uses to reconstruct reference DFS emission
order.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterable, Tuple
from urllib.parse import urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# fast path: lowercase scheme+host, no port/userinfo/fragment — the common
# shape for synthetic and well-formed crawl URLs
import re as _re

_SIMPLE_URL = _re.compile(r"^(https?)://([a-z0-9.-]+)(/[^#]*)?$")


def canonicalize(url: str) -> str:
    """Deterministic, conservative URL canonicalization: lowercase
    scheme/host, strip default port and fragment, '' path -> '/'. Query
    strings are preserved verbatim (reordering params changes server
    semantics too often)."""
    if not url:
        return ""
    m = _SIMPLE_URL.match(url)
    if m:
        return f"{m.group(1)}://{m.group(2)}{m.group(3) or '/'}"
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    creds = ""
    hostport = netloc
    if "@" in netloc:
        # split userinfo BEFORE looking for the port — partitioning the
        # whole netloc at ':' would split inside 'user:pw@...' creds,
        # leaving default ports unstripped (and host_of returning the
        # username)
        creds, _, hostport = netloc.rpartition("@")
        creds += "@"
    host, _, port = hostport.partition(":")
    if port and _DEFAULT_PORTS.get(scheme) == port:
        hostport = host
    path = parts.path or "/"
    return urlunsplit((scheme, creds + hostport, path, parts.query, ""))


def host_of(url: str) -> str:
    if not url:
        return ""
    m = _SIMPLE_URL.match(url)
    if m:
        return m.group(2)
    netloc = urlsplit(url).netloc.lower()
    hostport = netloc.rpartition("@")[2]
    host, _, port = hostport.partition(":")
    return host


def hash64(s: str) -> int:
    """Stable 64-bit hash (blake2b-8); uint64 range."""
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def dedup_hash(page_class: str, canon_url: str) -> int:
    """URL-seen key. Includes the page class so two page types fetching the
    same URL keep their distinct outputs; the reported URL-seen *set* is
    still per canonical URL."""
    return hash64(page_class + "\x00" + canon_url)


def encode_order_key(key: Iterable[int]) -> bytes:
    key = tuple(key)
    # one pack call (struct caches compiled formats) — 2x the
    # per-element join; this runs once per discovered link
    return struct.pack(">%dQ" % len(key), *key)


def decode_order_key(data: bytes) -> Tuple[int, ...]:
    return struct.unpack(">%dQ" % (len(data) // 8), data)
