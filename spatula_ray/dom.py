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
        """Depth-first document-order iteration including self."""
        if tag is None or self.tag == tag:
            yield self
        for c in self._children:
            yield from c.iter(tag)

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


def fromstring_html(content: Union[bytes, str]) -> Element:
    """Parse HTML into an Element tree (behavioral stand-in for
    ``lxml.html.fromstring``; single root returned as-is, fragments wrapped)."""
    if isinstance(content, bytes):
        content = content.decode("utf-8", errors="replace")
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
