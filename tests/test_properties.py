"""Property-based tests (hypothesis) for the deterministic primitives:
input encode/decode, order-key encoding, URL canonicalization, cuckoo
membership, span-offset invariants, crawl-delay gate."""

import string

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spatula_ray.engine.cuckoo import CuckooFilter
from spatula_ray.engine.keys import (
    canonicalize,
    decode_order_key,
    encode_order_key,
    hash64,
)
from spatula_ray.records import decode_input, encode_input

json_scalars = st.one_of(st.none(), st.booleans(), st.integers(-2**31, 2**31),
                         st.text(max_size=40))
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(string.ascii_letters, min_size=1, max_size=8),
                        children, max_size=4)),
    max_leaves=10)


@given(json_values)
@settings(max_examples=200)
def test_input_roundtrip(v):
    assert decode_input(encode_input(v)) == v


@given(st.lists(st.integers(0, 2**62), min_size=1, max_size=8))
def test_order_key_roundtrip(key):
    assert decode_order_key(encode_order_key(key)) == tuple(key)


@given(st.lists(st.lists(st.integers(0, 2**31), min_size=1, max_size=5),
                min_size=2, max_size=10))
def test_order_key_bytes_preserve_order(keys):
    """Bytewise lexicographic order of encodings == tuple order."""
    tuples = [tuple(k) for k in keys]
    encoded = [encode_order_key(k) for k in keys]
    assert (sorted(range(len(keys)), key=lambda i: tuples[i])
            == sorted(range(len(keys)), key=lambda i: encoded[i]))


@given(st.text(alphabet=string.ascii_lowercase + string.digits + ":/?.#&=-",
               max_size=60))
def test_canonicalize_idempotent(s):
    url = "https://example.test/" + s
    assert canonicalize(canonicalize(url)) == canonicalize(url)


def test_canonicalize_rules():
    assert canonicalize("HTTPS://ExAmple.Test:443/a#frag") == "https://example.test/a"
    assert canonicalize("http://h.test:80") == "http://h.test/"
    assert canonicalize("http://h.test:8080/x") == "http://h.test:8080/x"
    assert canonicalize("https://h.test/a?b=1&a=2") == "https://h.test/a?b=1&a=2"


def test_canonicalize_userinfo():
    """Default-port stripping and host extraction must survive userinfo:
    partitioning the whole netloc at ':' splits inside 'user:pw' creds
    (the pre-round-4f bug — ports kept, host_of returning the username,
    which would mis-route politeness gates)."""
    from spatula_ray.engine.keys import host_of

    assert canonicalize("https://User:PW@h.test:443/x") == \
        "https://user:pw@h.test/x"
    assert canonicalize("http://alice@h.test:80/") == "http://alice@h.test/"
    assert host_of("https://User:PW@h.test:443/x") == "h.test"
    assert host_of("http://alice@h.test:8080/") == "h.test"


@given(st.sets(st.text(min_size=1, max_size=20), min_size=1, max_size=300))
@settings(max_examples=50)
def test_cuckoo_never_false_negative(urls):
    f = CuckooFilter(capacity=256)  # deliberately small: forces stash use
    hashes = [hash64(u) for u in urls]
    for h in hashes:
        if not f.contains(h):
            f.insert(h)
    assert all(f.contains(h) for h in hashes)
    assert f.contains_many(np.array(hashes, dtype=np.uint64)).all()


@given(st.text(max_size=200))
@settings(max_examples=100)
def test_span_offsets_sequential(text):
    """Span offsets are always the emission index, whatever the markup."""
    from spatula_ray.dom import fromstring_html
    from spatula_ray.model import _tree_spans

    import html as _h

    body = f"<html><body><p>{_h.escape(text)}</p><a href='/x'>l</a></body></html>"
    spans = _tree_spans(fromstring_html(body))
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    kinds = {s["kind"] for s in spans}
    assert kinds <= {"text", "media"}


def test_crawl_delay_gate():
    import time

    from spatula_ray.engine.hostgate import HostGate

    g = HostGate(robots={"a.test": {"crawl_delay_ms": 80}},
                 enforce_crawl_delay=True)
    first = g.admit(["a.test", "a.test"], ["/1", "/2"])
    assert first == [0, 1]  # second within the delay window -> defer
    time.sleep(0.1)
    assert g.admit(["a.test"], ["/3"]) == [0]
    # hosts without rules are unaffected
    assert g.admit(["b.test", "b.test"], ["/1", "/2"]) == [0, 0]


f64s = st.floats(allow_nan=False, width=64)


@given(st.lists(f64s, min_size=1, max_size=50))
@settings(max_examples=300)
def test_ordered_i64_map_preserves_float_order(xs):
    from spatula_ray.stages.selection import (_f64_to_ordered_i64,
                                              _ordered_i64_to_f64)

    a = np.array(xs, dtype=np.float64)
    k = _f64_to_ordered_i64(a)
    # roundtrip is bit-exact (±0.0 keep their signs)
    back = _ordered_i64_to_f64(k)
    assert all(x.tobytes() == y.tobytes() for x, y in zip(a, back))
    # order-preserving: int comparison == float comparison (with -0 < +0
    # being the one refinement over IEEE equality)
    order_f = np.argsort(a, kind="stable")
    assert (np.sort(a)[np.argsort(np.argsort(k[order_f], kind="stable"))]
            == np.sort(a)).all()
    for i in range(len(a) - 1):
        fi, fj = a[order_f[i]], a[order_f[i + 1]]
        ki, kj = k[order_f[i]], k[order_f[i + 1]]
        if fi < fj:
            assert ki < kj


@given(st.lists(st.integers(0, (1 << 52) - 1), min_size=1, max_size=64))
@settings(max_examples=300)
def test_hll_rho_matches_bit_length(ws):
    from spatula_ray.stages.sketch import _rho_of

    w = np.array(ws, dtype=np.int64)
    want = [53 if x == 0 else 52 - (x.bit_length() - 1) for x in ws]
    assert _rho_of(w).tolist() == want


@given(st.lists(st.integers(0, 2**62), min_size=1, max_size=40),
       st.integers(1, 5))
@settings(max_examples=100)
def test_exact_quantile_state_math_consistency(vals, q10):
    """The pure rank convention: the selected element equals
    numpy's sorted[ceil(q*n)-1] for every q — the invariant both the
    engine and the DuckDB oracle implement."""
    q = q10 / 10.0
    a = np.array(vals, dtype=np.float64)
    n = len(a)
    idx = max(int(np.ceil(q * n)) - 1, 0)
    assert np.sort(a)[idx] in a
