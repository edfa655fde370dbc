"""Unit tests for the stdlib DOM + selector subset engines."""

from spatula_ray.dom import cssselect, fromstring_html, fromstring_xml, xpath

HTML = """
<html><body>
<div id="main" class="content wide">
  <ul>
    <li>one</li>
    <li class="sel">two</li>
    <li>three</li>
  </ul>
  <a href="/rel">rel link</a>
  <a href="https://other.test/abs">abs link</a>
  <img src="/img/x.png">
  <table id="employees">
    <tbody>
      <tr><td>Alice</td><td><a href="/staff/1">details</a></td></tr>
      <tr><td>Bob</td><td><a href="/staff/2">details</a></td></tr>
    </tbody>
  </table>
</div>
</body></html>
"""


def test_html_parse_structure():
    root = fromstring_html(HTML)
    assert root.tag == "html"
    lis = root.xpath("//li")
    assert [li.text for li in lis] == ["one", "two", "three"]


def test_html_fragment_single_root():
    root = fromstring_html("<ul><li>one</li><li>two</li></ul>")
    assert root.tag == "ul"
    assert len(root.xpath("//li")) == 2


def test_html_fragment_multi_root_wrapped():
    root = fromstring_html("<p>a</p><p>b</p>")
    assert root.tag == "div"
    assert [p.text for p in root.xpath("//p")] == ["a", "b"]


def test_xpath_text_terminal():
    root = fromstring_html(HTML)
    assert root.xpath("//li/text()") == ["one", "two", "three"]


def test_xpath_attr_terminal():
    root = fromstring_html(HTML)
    hrefs = root.xpath("//a/@href")
    assert hrefs == ["/rel", "https://other.test/abs", "/staff/1", "/staff/2"]


def test_xpath_predicates():
    root = fromstring_html(HTML)
    assert root.xpath("//li[@class='sel']/text()") == ["two"]
    assert root.xpath("//li[2]/text()") == ["two"]
    assert len(root.xpath("//div[contains(@class,'wide')]")) == 1
    assert root.xpath("//li[text()='three']")[0].text == "three"


def test_xpath_nested_and_relative():
    root = fromstring_html(HTML)
    table = root.xpath("//table")[0]
    rows = table.xpath(".//tr")
    assert len(rows) == 2
    assert rows[0].xpath(".//td")[0].text == "Alice"


def test_css_basic():
    root = fromstring_html(HTML)
    assert len(cssselect(root, "li")) == 3
    assert cssselect(root, "#employees")[0].tag == "table"
    assert cssselect(root, ".sel")[0].text == "two"
    assert cssselect(root, "li.sel")[0].text == "two"


def test_css_descendant_child():
    root = fromstring_html(HTML)
    assert len(cssselect(root, "#employees tbody tr")) == 2
    assert len(cssselect(root, "ul > li")) == 3
    assert len(cssselect(root, "table a")) == 2


def test_css_attr():
    root = fromstring_html(HTML)
    assert len(cssselect(root, "a[href]")) == 4
    assert len(cssselect(root, "a[href=/rel]")) == 1


def test_css_group_doc_order():
    root = fromstring_html(HTML)
    els = cssselect(root, "img, li")
    assert [e.tag for e in els] == ["li", "li", "li", "img"]


def test_make_links_absolute():
    root = fromstring_html(HTML)
    root.make_links_absolute("https://example.test/base/")
    hrefs = root.xpath("//a/@href")
    assert hrefs[0] == "https://example.test/rel"
    assert hrefs[1] == "https://other.test/abs"
    assert root.xpath("//img/@src") == ["https://example.test/img/x.png"]


def test_text_content_and_itertext():
    root = fromstring_html("<div>a<span>b</span>c</div>")
    assert root.text_content() == "abc"


def test_tail_handling():
    root = fromstring_html("<div><b>bold</b> tail text</div>")
    b = root.xpath("//b")[0]
    assert b.tail == " tail text"


def test_void_elements():
    root = fromstring_html("<div>a<br>b<img src='x'>c</div>")
    assert root.text_content() == "abc"
    assert len(root.xpath("//img")) == 1


def test_loose_end_tags():
    root = fromstring_html("<div><p>one<p>two</div>")
    # HTMLParser doesn't imply p-closing; both ps nest but tree stays usable
    assert "one" in root.text_content() and "two" in root.text_content()


def test_xml_parse():
    root = fromstring_xml("<resp><item>one</item><item>two</item><item>three</item></resp>")
    assert root.tag == "resp"
    assert root.xpath("//item/text()") == ["one", "two", "three"]


def test_xml_attributes_and_lines():
    root = fromstring_xml('<a>\n<b id="x">t</b></a>')
    b = root.xpath("//b")[0]
    assert b.get("id") == "x"
    assert b.sourceline == 2


def test_entity_handling():
    root = fromstring_html("<p>a &amp; b</p>")
    assert root.text == "a & b"


# -- fast-tokenizer differential suite ---------------------------------------
# The regex fast path must either produce the stdlib builder's tree
# bit-for-bit (tag/attrib/text/tail/sourceline/children) or raise
# _Fallback; fromstring_html then reparses through stdlib, so user-visible
# divergence is impossible as long as this property holds.

def _stdlib_tree(content):
    from spatula_ray.dom import Element, _TreeBuilder

    p = _TreeBuilder()
    p.feed(content)
    p.close()
    if len(p.roots) == 1:
        return p.roots[0]
    w = Element("div")
    for r in p.roots:
        w.append(r)
    return w


def _tree_eq(a, b, path="/"):
    assert a.tag == b.tag, (path, a.tag, b.tag)
    assert a.attrib == b.attrib, (path, a.attrib, b.attrib)
    assert a.text == b.text, (path, repr(a.text), repr(b.text))
    assert a.tail == b.tail, (path, repr(a.tail), repr(b.tail))
    assert a.sourceline == b.sourceline, (path, a.tag, a.sourceline,
                                          b.sourceline)
    assert len(a._children) == len(b._children), (path,)
    for i, (x, y) in enumerate(zip(a._children, b._children)):
        _tree_eq(x, y, f"{path}{a.tag}[{i}]/")


_DIFF_CASES = [
    '<html><body><a href="/x?a=1&amp;b=2">T &amp; U</a><br>'
    '<img src=i.png></body></html>',
    '<div><p>one<p>two</div>',
    '<ul>\n<li>a\n<li>b &gt; c\n</ul>',
    '<a b c=d e="f g" h=\'i\'>x</a>',
    '<script>if (a < b && c) { x = "</div>"; }</script><p>after',
    '<script>var s = "</scriptfoo>";</script><p>z',
    '<style>a > b { color: red }</style>ok',
    '<!-- comment <div> --><p>y</p>',
    '<!--a -- > b--><p>x</p>',
    '<!DOCTYPE html><html><head><title>t</title></head><body>b</body></html>',
    '<?php echo 1 ?><div>q</div>',
    'text < notag and 1<2 ok <b>bold</b>',
    '<a\nhref="x"\n>multi\nline</a>\n<b>next</b>',
    '<div/><span>s</span>',
    '<input type="checkbox" checked><label>l</label>',
    '<A HREF="UP">case</A>',
    '<div data-x="&#65;&#x42;&amp;">ents</div>',
    '<td>no root', '', 'just text', '<b>unclosed',
    '<em><b>cross</em></b>ed',
    '<a f=1 f=2>dup</a>', '<a b==c>deq</a>', '<a b = "c" >sp</a>',
    '<br/>', '<p>&notanentity;</p>', '<p>&amp</p>',
    '<svg><![CDATA[x]]></svg>', '<a "bare">junk</a>', '</div>stray',
    '<div foo / bar>slashes</div>', '<script>never closed',
    '<p>trailing amp &', '<p>trailing lt <', '<p>tag at eof <div',
    '<script/>not cdata<p>x</p>', '<style>a</style\n>b',
    '<!DOCTYPE doc [ <!ELEMENT a> ]><a>z</a>',
]


def test_fast_html_differential_cases():
    from spatula_ray.dom import Element, _Fallback, _fast_feed
    from spatula_ray.dom import _FastTreeBuilder

    fast_used = 0
    for c in _DIFF_CASES:
        p = _FastTreeBuilder()
        try:
            _fast_feed(p, c)
        except _Fallback:
            continue  # fallback reparses via stdlib: correct by definition
        fast_used += 1
        if len(p.roots) == 1:
            fast = p.roots[0]
        else:
            fast = Element("div")
            for r in p.roots:
                fast.append(r)
        _tree_eq(fast, _stdlib_tree(c))
    assert fast_used >= 25  # the fast path must actually engage


def test_fast_html_differential_fuzz():
    import random

    from spatula_ray.dom import Element, _Fallback, _fast_feed
    from spatula_ray.dom import _FastTreeBuilder

    rng = random.Random(20260817)
    frags = ['<div>', '</div>', '<p class="c1">', '</p>',
             '<a href="/x?a=1&amp;b=2">', '<a href=rel.html>', '</a>',
             '<br>', '<br/>', '<img src="i.png" alt=\'A & B\'>',
             'text &amp; more ', '1 < 2 ', '<!-- c -->',
             '<script>a<b&&c;</script>', '<style>x { }</style>',
             '<span id=s>', '</span>', '&#65;&gt; ', '\n',
             '<table><tr><td>', '</td></tr></table>', '<input checked>',
             '<!DOCTYPE html>', '<li>item', '<b f=1 f=2>', '</b>',
             '<hr >', '< p>', '</ p>', '<em>&nbsp;</em>']
    soup = list('<>&;/="\' abAB\n-!?xyz[]#')
    cases = ["".join(rng.choice(frags)
                     for _ in range(rng.randrange(0, 25)))
             for _ in range(800)]
    cases += ["".join(rng.choice(soup)
                      for _ in range(rng.randrange(0, 150)))
              for _ in range(2500)]
    for c in cases:
        p = _FastTreeBuilder()
        try:
            _fast_feed(p, c)
        except _Fallback:
            continue
        if len(p.roots) == 1:
            fast = p.roots[0]
        else:
            fast = Element("div")
            for r in p.roots:
                fast.append(r)
        _tree_eq(fast, _stdlib_tree(c))


# ---------------------------------------------------------------------------
# round-4 grammar expansion (verdict gap #3): named axes, positional
# functions, richer predicates, unions; CSS pseudo-classes, attribute
# operators, sibling combinators
# ---------------------------------------------------------------------------

GRID = """
<html><body>
<table>
  <tr id="r1"><td>a1</td><td class="x">b1</td><td>c1</td></tr>
  <tr id="r2"><td>a2</td><td>b2</td><td>c2</td></tr>
  <tr id="r3"><td>a3</td><td>b3</td><td>c3</td></tr>
</table>
<div id="d">
  <h2>Title</h2>
  <p class="lead" data-k="v-1">first</p>
  <p>second</p>
  <span>tail</span>
  <p>third</p>
  <p id="empty"></p>
</div>
</body></html>
"""


def _grid():
    return fromstring_html(GRID)


def test_xpath_following_sibling():
    root = _grid()
    h2 = root.xpath("//h2")[0]
    ps = h2.xpath("following-sibling::p")
    assert [p.text for p in ps] == ["first", "second", "third", None]
    assert [p.text for p in h2.xpath("following-sibling::p[1]")] == ["first"]
    # path continuation after a named axis
    assert root.xpath("//h2/following-sibling::p[1]/text()") == ["first"]


def test_xpath_preceding_sibling_proximity_order():
    root = _grid()
    span = root.xpath("//span")[0]
    # positional predicate counts in proximity (reverse-document) order
    near = span.xpath("preceding-sibling::p[1]")
    assert [p.text for p in near] == ["second"]
    # full axis result is returned in document order
    allp = span.xpath("preceding-sibling::p")
    assert [p.text for p in allp] == ["first", "second"]


def test_xpath_parent_and_dotdot():
    root = _grid()
    td = root.xpath("//td[.='b2']")[0]
    assert td.xpath("..")[0].get("id") == "r2"
    assert td.xpath("parent::tr")[0].get("id") == "r2"
    assert td.xpath("../td[1]/text()") == ["a2"]


def test_xpath_ancestor():
    root = _grid()
    td = root.xpath("//td[.='c3']")[0]
    tags = [e.tag for e in td.xpath("ancestor::*")]
    assert tags == ["html", "body", "table", "tr"]
    assert td.xpath("ancestor::tr")[0].get("id") == "r3"


def test_xpath_positional_functions():
    root = _grid()
    assert [e.text for e in root.xpath("//tr/td[last()]")] == ["c1", "c2", "c3"]
    assert [e.text for e in root.xpath("//tr/td[last()-1]")] == ["b1", "b2", "b3"]
    assert [e.text for e in root.xpath("//tr/td[position()<3]")] == [
        "a1", "b1", "a2", "b2", "a3", "b3"]
    assert [e.text for e in root.xpath("//tr/td[position()>=3]")] == ["c1", "c2", "c3"]


def test_xpath_desc_positional_counts_per_parent():
    # //td[1] = first td of EACH row (lxml semantics), not first overall
    root = _grid()
    assert [e.text for e in root.xpath("//td[1]")] == ["a1", "a2", "a3"]


def test_xpath_predicates_extended():
    root = _grid()
    assert root.xpath("//p[starts-with(@class,'le')]/text()") == ["first"]
    assert root.xpath("//p[not(@class)][1]/text()") == ["second"]
    assert root.xpath("//p[@class!='lead']") == []  # others lack the attr entirely
    assert root.xpath("//tr[td]") != []                  # child-existence
    assert [e.get("id") for e in root.xpath("//div[p]")] == ["d"]
    assert root.xpath("//td[contains(text(),'2')]/text()") == ["a2", "b2", "c2"]
    assert root.xpath("//td[.='b1']")[0].get("class") == "x"


def test_xpath_union():
    root = _grid()
    out = root.xpath("//h2 | //span")
    assert [e.tag for e in out] == ["h2", "span"]
    # document order + dedup across branches
    out = root.xpath("//p[@class] | //p")
    assert [e.text for e in out] == ["first", "second", "third", None]
    # string-terminal unions concatenate
    assert root.xpath("//h2/text() | //span/text()") == ["Title", "tail"]


def test_xpath_self_axis():
    root = _grid()
    p = root.xpath("//p[@class='lead']")[0]
    assert p.xpath("self::p") == [p]
    assert p.xpath("self::div") == []


def test_xpath_unsupported_still_raises():
    import pytest

    from spatula_ray.dom import XPathSyntaxError

    root = _grid()
    with pytest.raises(XPathSyntaxError):
        root.xpath("//p[foo(bar)]")
    with pytest.raises(XPathSyntaxError):
        root.xpath("//namespace::p")


def test_css_nth_child():
    root = _grid()
    assert [e.text for e in root.cssselect("tr td:nth-child(2)")] == ["b1", "b2", "b3"]
    assert [e.text for e in root.cssselect("td:nth-child(odd)")] == [
        "a1", "c1", "a2", "c2", "a3", "c3"]
    assert [e.text for e in root.cssselect("td:nth-child(2n)")] == ["b1", "b2", "b3"]
    assert [e.text for e in root.cssselect("td:nth-child(-n+2)")] == [
        "a1", "b1", "a2", "b2", "a3", "b3"]
    assert [e.text for e in root.cssselect("tr:nth-child(3) td")] == ["a3", "b3", "c3"]


def test_css_child_position_pseudos():
    root = _grid()
    assert [e.text for e in root.cssselect("td:first-child")] == ["a1", "a2", "a3"]
    assert [e.text for e in root.cssselect("td:last-child")] == ["c1", "c2", "c3"]
    assert [e.tag for e in root.cssselect("#d :first-child")] == ["h2"]
    assert root.cssselect("table:only-child") == []
    assert [e.text for e in root.cssselect("#d p:first-of-type")] == ["first"]
    assert [e.text for e in root.cssselect("#d p:last-of-type")] == [None]
    assert [e.text for e in root.cssselect("#d p:nth-of-type(2)")] == ["second"]
    assert [e.tag for e in root.cssselect("#d span:only-of-type")] == ["span"]
    assert [e.text for e in root.cssselect("td:nth-last-child(1)")] == ["c1", "c2", "c3"]


def test_css_empty_and_not():
    root = _grid()
    assert [e.get("id") for e in root.cssselect("p:empty")] == ["empty"]
    assert [e.text for e in root.cssselect("#d p:not(.lead):not(:empty)")] == [
        "second", "third"]
    assert [e.text for e in root.cssselect("#d p:not([data-k])")] == [
        "second", "third", None]


def test_css_attribute_operators():
    root = _grid()
    assert [e.text for e in root.cssselect("p[data-k]")] == ["first"]
    assert [e.text for e in root.cssselect("p[data-k='v-1']")] == ["first"]
    assert [e.text for e in root.cssselect("p[data-k^='v']")] == ["first"]
    assert [e.text for e in root.cssselect("p[data-k$='1']")] == ["first"]
    assert [e.text for e in root.cssselect("p[data-k*='-']")] == ["first"]
    assert [e.text for e in root.cssselect("p[data-k|='v']")] == ["first"]
    assert [e.text for e in root.cssselect("p[class~='lead']")] == ["first"]
    assert root.cssselect("p[data-k='nope']") == []


def test_css_sibling_combinators():
    root = _grid()
    assert [e.text for e in root.cssselect("h2 + p")] == ["first"]
    assert [e.text for e in root.cssselect("h2 ~ p")] == [
        "first", "second", "third", None]
    assert [e.tag for e in root.cssselect("p + span")] == ["span"]
    assert root.cssselect("span + h2") == []
    # no-space forms tokenize too
    assert [e.text for e in root.cssselect("h2+p")] == ["first"]
    assert [e.text for e in root.cssselect(".lead~p")] == ["second", "third", None]


def test_css_unsupported_still_raises():
    import pytest

    from spatula_ray.dom import CSSSyntaxError

    root = _grid()
    with pytest.raises(CSSSyntaxError):
        root.cssselect("p:hover")
    with pytest.raises(CSSSyntaxError):
        root.cssselect("p::before")
