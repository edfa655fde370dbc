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
