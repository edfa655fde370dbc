"""Minimal stdlib-only DOM for HTML/XML with XPath- and CSS-subset selectors.

The container has no lxml/cssselect, so the engine ships its own small
element-tree with the lxml-ish surface the page classes need:

* ``Element``: ``tag / attrib / text / tail / getchildren / getparent /
  sourceline / iter / itertext / text_content / get / xpath / cssselect /
  make_links_absolute``.
* ``fromstring_html`` built on :class:`html.parser.HTMLParser` (void elements,
  loose end-tag recovery, fragment wrapping — mirroring the *behavior* of
  ``lxml.html.fromstring`` used by the reference at
  ``/root/reference/src/spatula/pages.py:342``).
* ``fromstring_xml`` built on ``xml.parsers.expat`` (keeps line numbers).
* A practical XPath subset: ``// / . ./ .// * tag``, predicates ``[@a]``,
  ``[@a='v']``, ``[n]``, ``[contains(@a,'v')]``, ``[text()='v']``, and the
  terminals ``text()`` / ``@attr``.
* A practical CSS subset: ``tag  #id  .cls  [a]  [a=v]``, compounds,
  descendant/child combinators, comma groups.

Everything is deterministic: document order is definitional for selector
results and span extraction.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator, List, Optional, Union
from urllib.parse import urljoin
from xml.parsers import expat

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# attributes that carry URLs, absolutized by make_links_absolute
_LINK_ATTRS = ("href", "src", "action", "formaction", "poster", "data", "cite",
               "background", "longdesc", "usemap", "codebase")
_LINK_ATTR_SET = frozenset(_LINK_ATTRS)

# elements whose URL attribute makes them a *media* span (vs. plain text)
MEDIA_SRC_TAGS = frozenset("img audio video source embed iframe track object".split())


class Element:
    __slots__ = ("tag", "attrib", "text", "tail", "_children", "_parent", "sourceline")

    def __init__(self, tag: str, attrib: Optional[dict] = None, sourceline: Optional[int] = None):
        self.tag = tag
        self.attrib = attrib if attrib is not None else {}
        self.text: Optional[str] = None
        self.tail: Optional[str] = None
        self._children: List["Element"] = []
        self._parent: Optional["Element"] = None
        self.sourceline = sourceline

    # -- tree access ------------------------------------------------------
    def append(self, child: "Element") -> None:
        child._parent = self
        self._children.append(child)

    def getchildren(self) -> List["Element"]:
        return list(self._children)

    def getparent(self) -> Optional["Element"]:
        return self._parent

    def __iter__(self) -> Iterator["Element"]:
        return iter(self._children)

    def __len__(self) -> int:
        return len(self._children)

    def __getitem__(self, i):
        return self._children[i]

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<Element {self.tag} at 0x{id(self):x}>"

    # -- content ----------------------------------------------------------
    def get(self, key: str, default=None):
        return self.attrib.get(key, default)

    def iter(self, tag: Optional[str] = None) -> Iterator["Element"]:
        """Depth-first document-order iteration including self (explicit
        stack: nested ``yield from`` delegation pays per tree level)."""
        stack = [self]
        pop = stack.pop
        while stack:
            el = pop()
            if tag is None or el.tag == tag:
                yield el
            children = el._children
            if children:
                stack.extend(reversed(children))

    def itertext(self) -> Iterator[str]:
        if self.text:
            yield self.text
        for c in self._children:
            yield from c.itertext()
            if c.tail:
                yield c.tail

    def text_content(self) -> str:
        return "".join(self.itertext())

    # -- selectors --------------------------------------------------------
    def xpath(self, expr: str) -> list:
        return xpath(self, expr)

    def cssselect(self, expr: str) -> List["Element"]:
        return cssselect(self, expr)

    # -- link handling ----------------------------------------------------
    def make_links_absolute(self, base_url: str) -> None:
        # fast paths: already-absolute refs pass through; root-relative
        # refs join against the scheme+authority prefix computed once
        m = re.match(r"^(https?://[^/]+)", base_url)
        root_prefix = m.group(1) if m else None
        for el in self.iter():
            attrib = el.attrib
            if not attrib:
                continue
            # iterate the (few) attrs present rather than probing all names
            for a in attrib:
                if a in _LINK_ATTR_SET:
                    v = attrib[a]
                    if v.startswith("http://") or v.startswith("https://"):
                        continue
                    if root_prefix and v.startswith("/") and not v.startswith("//"):
                        attrib[a] = root_prefix + v
                    else:
                        attrib[a] = urljoin(base_url, v)


# ---------------------------------------------------------------------------
# HTML parsing
# ---------------------------------------------------------------------------

class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.roots: List[Element] = []
        self.stack: List[Element] = []

    def _append(self, el: Element) -> None:
        if self.stack:
            self.stack[-1].append(el)
        else:
            self.roots.append(el)

    def handle_starttag(self, tag: str, attrs) -> None:
        el = Element(tag, dict(attrs), sourceline=self.getpos()[0])
        self._append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._append(Element(tag, dict(attrs), sourceline=self.getpos()[0]))

    def handle_endtag(self, tag: str) -> None:
        # recover loosely: close up to the matching open tag if present
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore

    def handle_data(self, data: str) -> None:
        if not data:
            return
        if self.stack:
            top = self.stack[-1]
            if top._children:
                last = top._children[-1]
                last.tail = (last.tail or "") + data
            else:
                top.text = (top.text or "") + data
        elif self.roots:
            last = self.roots[-1]
            last.tail = (last.tail or "") + data
        # leading bare text before any element is dropped (fragment case)


# -- fast tokenizer ----------------------------------------------------------
#
# html.parser.HTMLParser walks the document char-class by char-class in
# Python (27% of the round-2 per-page crawl profile). The fast path below
# tokenizes with a handful of compiled regexes instead and produces the
# SAME event stream for the constructs real pages use; on ANY construct
# whose stdlib handling is subtle (malformed start tags, bogus end tags,
# unterminated comments/tags) it raises ``_Fallback`` and the whole
# document reparses through the stdlib builder, so divergence is
# impossible — the fast path is only ever a faster route to the identical
# tree (differentially fuzzed in tests/test_dom.py).

class _Fallback(Exception):
    pass


# kill-switch for A/B timing and debugging: SPATULA_RAY_SLOW_HTML=1 forces
# every document through the stdlib builder
import os as _os

_FAST_HTML = _os.environ.get("SPATULA_RAY_SLOW_HTML", "") != "1"


# stdlib-identical character classes (html/parser.py tagfind_tolerant /
# attrfind_tolerant); the attr scan below mirrors parse_starttag's
# contiguous-match loop including the `(?:\s|/(?!>))*` inter-attr eater
_FAST_TAGNAME = re.compile(r'([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*')
_FAST_ATTR = re.compile(
    r'((?<=[\'"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*'
    r'(\'[^\']*\'|"[^"]*"|(?![\'"])[^>\s]*))?(?:\s|/(?!>))*')
_FAST_ENDTAG = re.compile(r'</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>')
_FAST_LT = re.compile('<')
_COMMENT_CLOSE = re.compile(r'--\s*>')  # _markupbase._commentclose
_CDATA_CLOSE = {
    "script": re.compile(r'</\s*script', re.IGNORECASE),
    "style": re.compile(r'</\s*style', re.IGNORECASE),
}


def _fast_feed(p: "_TreeBuilder", content: str) -> None:
    """Feed ``content`` through the regex tokenizer, driving the same
    handle_* methods the stdlib parser would, or raise ``_Fallback``."""
    from html import unescape

    n = len(content)
    pos = 0
    line = 1
    lpos = 0            # position up to which ``line`` is current
    data_start = 0      # start of the pending text run
    p._fast_line = 1

    def flush(upto: int, raw: bool = False) -> None:
        if upto > data_start:
            d = content[data_start:upto]
            if not raw and "&" in d:
                d = unescape(d)
            p.handle_data(d)

    while pos < n:
        m = _FAST_LT.search(content, pos)
        if m is None:
            flush(n)
            return
        i = m.start()
        nxt = content[i + 1:i + 2]
        if nxt and (nxt.isalpha() or nxt in "/!?"):
            flush(i)
        else:
            # stdlib treats a lone '<' as text; keep it in the run
            pos = i + 1
            continue
        line += content.count("\n", lpos, i)
        lpos = i
        p._fast_line = line
        if nxt == "!":
            if content.startswith("<!--", i):
                cm2 = _COMMENT_CLOSE.search(content, i + 4)
                if cm2 is None:
                    raise _Fallback  # unterminated comment
                pos = cm2.end()
            elif content.startswith("<![", i):
                raise _Fallback  # marked section: ]]>-style close scan
            else:
                j = content.find(">", i + 2)
                if j < 0:
                    raise _Fallback
                pos = j + 1  # doctype / bogus decl: skipped, like stdlib
        elif nxt == "?":
            j = content.find(">", i + 2)
            if j < 0:
                raise _Fallback
            pos = j + 1
        elif nxt == "/":
            em = _FAST_ENDTAG.match(content, i)
            if em is None:
                raise _Fallback  # bogus end tag: stdlib path is subtle
            p.handle_endtag(em.group(1).lower())
            pos = em.end()
        else:
            tm = _FAST_TAGNAME.match(content, i + 1)
            if tm is None:
                raise _Fallback
            tag = tm.group(1).lower()
            k = tm.end()
            attrs = []
            while True:
                am = _FAST_ATTR.match(content, k)
                if am is None:
                    break
                name, has_val, val = am.group(1), am.group(2), am.group(3)
                if has_val is None:
                    val = None
                else:
                    if val[:1] == "'" == val[-1:] or val[:1] == '"' == val[-1:]:
                        val = val[1:-1]
                    if "&" in val:
                        val = unescape(val)
                attrs.append((name.lower(), val))
                k = am.end()
            if content.startswith("/>", k):
                p.handle_startendtag(tag, attrs)
                pos = k + 2
            elif content.startswith(">", k):
                p.handle_starttag(tag, attrs)
                pos = k + 1
                if tag in _CDATA_CLOSE:
                    search_from = pos
                    while True:
                        cm = _CDATA_CLOSE[tag].search(content, search_from)
                        if cm is None:
                            # stdlib drops unterminated cdata content
                            # (goahead breaks without flushing it)
                            return
                        em = _FAST_ENDTAG.match(content, cm.start())
                        if em is None:
                            raise _Fallback  # tolerant end-tag path
                        if em.group(1).lower() == tag:
                            break
                        # e.g. </scriptfoo> inside script: stays cdata text
                        search_from = cm.start() + 1
                    if cm.start() > pos:
                        p.handle_data(content[pos:cm.start()])
                    pos = cm.start()  # the </script> parses as an end tag
            else:
                raise _Fallback  # malformed start tag: stdlib emits text
        data_start = pos
    flush(n)


class _FastTreeBuilder(_TreeBuilder):
    """_TreeBuilder whose getpos() reads the fast tokenizer's line counter."""

    _fast_line = 1

    def getpos(self):
        return (self._fast_line, 0)


def fromstring_html(content: Union[bytes, str]) -> Element:
    """Parse HTML into an Element tree (behavioral stand-in for
    ``lxml.html.fromstring``; single root returned as-is, fragments wrapped).

    Tries the regex fast path first and reparses with the stdlib
    ``html.parser`` builder when the document contains any construct the
    fast path doesn't replicate bit-for-bit (see ``_fast_feed``)."""
    if isinstance(content, bytes):
        content = content.decode("utf-8", errors="replace")
    p: _TreeBuilder
    if _FAST_HTML:
        p = _FastTreeBuilder()
        try:
            _fast_feed(p, content)
        except _Fallback:
            p = _TreeBuilder()
            p.feed(content)
            p.close()
    else:
        p = _TreeBuilder()
        p.feed(content)
        p.close()
    roots = [r for r in p.roots]
    if len(roots) == 1:
        return roots[0]
    wrapper = Element("div")
    for r in roots:
        wrapper.append(r)
    return wrapper


# ---------------------------------------------------------------------------
# XML parsing (expat keeps line numbers)
# ---------------------------------------------------------------------------

def fromstring_xml(content: Union[bytes, str]) -> Element:
    if isinstance(content, str):
        content = content.encode("utf-8")
    parser = expat.ParserCreate()
    root: List[Element] = []
    stack: List[Element] = []
    textbuf: List[str] = []

    def flush_text() -> None:
        if not textbuf:
            return
        data = "".join(textbuf)
        textbuf.clear()
        if stack:
            top = stack[-1]
            if top._children:
                last = top._children[-1]
                last.tail = (last.tail or "") + data
            else:
                top.text = (top.text or "") + data

    def start(name, attrs):
        flush_text()
        el = Element(name, dict(attrs), sourceline=parser.CurrentLineNumber)
        if stack:
            stack[-1].append(el)
        else:
            root.append(el)
        stack.append(el)

    def end(name):
        flush_text()
        stack.pop()

    def chardata(data):
        textbuf.append(data)

    parser.StartElementHandler = start
    parser.EndElementHandler = end
    parser.CharacterDataHandler = chardata
    parser.Parse(content, True)
    if not root:
        raise ValueError("no root element in XML document")
    return root[0]


# ---------------------------------------------------------------------------
# XPath subset
# ---------------------------------------------------------------------------

_STEP_RE = re.compile(r"(\.?//|/|^\.?/?)([^/\[\]]+)((?:\[[^\]]*\])*)")
_PRED_RE = re.compile(r"\[([^\]]*)\]")


class XPathSyntaxError(ValueError):
    pass


def _parse_steps(expr: str):
    """Tokenize an xpath expression into (axis, name, [predicates]) steps.

    axis is 'desc' for // and 'child' for /.
    """
    expr = expr.strip()
    steps = []
    pos = 0
    first = True
    while pos < len(expr):
        m = _STEP_RE.match(expr, pos)
        if not m:
            raise XPathSyntaxError(f"cannot parse xpath {expr!r} at {pos}")
        sep, name, preds = m.group(1), m.group(2), m.group(3)
        if first:
            if sep in ("//", ".//"):
                axis = "desc"
            elif sep in ("/", "./", "", "."):
                axis = "child"
            else:
                raise XPathSyntaxError(f"bad leading separator in {expr!r}")
            # a leading bare name (no slash) addresses children, like lxml
            first = False
        else:
            axis = "desc" if sep == "//" else "child"
        predicates = _PRED_RE.findall(preds) if preds else []
        steps.append((axis, name, predicates))
        pos = m.end()
    if not steps:
        raise XPathSyntaxError(f"empty xpath {expr!r}")
    return steps


def _eval_pred(el: Element, pred: str, pos1: int) -> bool:
    pred = pred.strip()
    if pred.isdigit():
        return pos1 == int(pred)
    m = re.match(r"^@([\w:-]+)$", pred)
    if m:
        return m.group(1) in el.attrib
    m = re.match(r"^@([\w:-]+)\s*=\s*(['\"])(.*)\2$", pred)
    if m:
        return el.attrib.get(m.group(1)) == m.group(3)
    m = re.match(r"^contains\(\s*@([\w:-]+)\s*,\s*(['\"])(.*)\2\s*\)$", pred)
    if m:
        return m.group(3) in (el.attrib.get(m.group(1)) or "")
    m = re.match(r"^text\(\)\s*=\s*(['\"])(.*)\1$", pred)
    if m:
        return (el.text or "") == m.group(2)
    raise XPathSyntaxError(f"unsupported predicate [{pred}]")


def _text_nodes(el: Element) -> List[str]:
    """lxml-style text() — the direct text-node children of el."""
    out = []
    if el.text:
        out.append(el.text)
    for c in el._children:
        if c.tail:
            out.append(c.tail)
    return out


def xpath(context: Element, expr: str) -> list:
    steps = _parse_steps(expr)
    terminal = None
    last_axis, last_name, last_preds = steps[-1]
    if last_name == "text()":
        terminal = ("text", last_axis)
        steps = steps[:-1]
    elif last_name.startswith("@"):
        terminal = ("attr", last_axis, last_name[1:])
        steps = steps[:-1]

    nodes: List[Element] = [context]
    for axis, name, preds in steps:
        nxt: List[Element] = []
        seen = set()
        for n in nodes:
            if axis == "desc":
                cands = list(n.iter())
            else:
                cands = list(n._children)
            matched = [c for c in cands if name == "*" or c.tag == name]
            for pred in preds:
                matched = [c for i, c in enumerate(matched) if _eval_pred(c, pred, i + 1)]
            for c in matched:
                if id(c) not in seen:
                    seen.add(id(c))
                    nxt.append(c)
        nodes = nxt

    if terminal is None:
        return nodes
    if terminal[0] == "text":
        axis = terminal[1]
        out: List[str] = []
        for n in nodes:
            if axis == "desc":
                out.extend(t for t in n.itertext() if t)
            else:
                out.extend(_text_nodes(n))
        return out
    # attribute terminal
    _, axis, attr = terminal
    out = []
    for n in nodes:
        cands = n.iter() if axis == "desc" else [n]
        if axis == "child":
            # '/@attr' applies to the matched nodes themselves
            cands = [n]
        for c in cands:
            v = c.attrib.get(attr)
            if v is not None:
                out.append(v)
    return out


# ---------------------------------------------------------------------------
# CSS subset
# ---------------------------------------------------------------------------

_SIMPLE_RE = re.compile(
    r"(?P<tag>[\w*-]+)?(?P<rest>(?:[#.][\w-]+|\[[^\]]+\])*)$"
)
_PART_RE = re.compile(r"([#.][\w-]+|\[[^\]]+\])")


class CSSSyntaxError(ValueError):
    pass


def _match_simple(el: Element, simple: str) -> bool:
    m = _SIMPLE_RE.match(simple)
    if not m or (not m.group("tag") and not m.group("rest")):
        raise CSSSyntaxError(f"cannot parse css token {simple!r}")
    tag = m.group("tag")
    if tag and tag != "*" and el.tag != tag:
        return False
    for part in _PART_RE.findall(m.group("rest") or ""):
        if part.startswith("#"):
            if el.attrib.get("id") != part[1:]:
                return False
        elif part.startswith("."):
            classes = (el.attrib.get("class") or "").split()
            if part[1:] not in classes:
                return False
        else:  # [attr] or [attr=value] or [attr="value"]
            inner = part[1:-1]
            if "=" in inner:
                k, _, v = inner.partition("=")
                v = v.strip("'\"")
                if el.attrib.get(k.strip()) != v:
                    return False
            else:
                if inner.strip() not in el.attrib:
                    return False
    return True


def _compile_css(selector: str):
    """selector -> list of (combinator, simple) where combinator in {desc, child}."""
    tokens = selector.replace(">", " > ").split()
    seq = []
    comb = "desc"
    for tok in tokens:
        if tok == ">":
            comb = "child"
            continue
        seq.append((comb, tok))
        comb = "desc"
    if not seq:
        raise CSSSyntaxError(f"empty css selector {selector!r}")
    return seq


def cssselect(context: Element, expr: str) -> List[Element]:
    results: List[Element] = []
    seen = set()
    for group in expr.split(","):
        group = group.strip()
        if not group:
            continue
        seq = _compile_css(group)
        # candidates matching in document order
        for el in context.iter():
            if el is context:
                continue
            if _matches_seq(el, seq, context):
                if id(el) not in seen:
                    seen.add(id(el))
                    results.append(el)
    # keep document order over all groups
    order = {id(e): i for i, e in enumerate(context.iter())}
    results.sort(key=lambda e: order[id(e)])
    return results


def _matches_seq(el: Element, seq, context: Element) -> bool:
    comb, simple = seq[-1]
    if not _match_simple(el, simple):
        return False
    rest = seq[:-1]
    if not rest:
        return True
    parent = el.getparent()
    if comb == "child":
        if parent is None or parent is context.getparent():
            return False
        return _matches_seq(parent, rest, context) if parent is not None else False
    # descendant: any ancestor (up to and including context's children) matches rest
    node = parent
    while node is not None and node is not context.getparent():
        if _matches_seq(node, rest, context):
            return True
        node = node.getparent()
    return False
