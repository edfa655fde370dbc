"""Selector constraint matrix + real CSS/XPath/SimilarLink behavior (mirrors
reference tests/test_selectors.py semantics, re-expressed for the engine)."""

import pytest

from spatula_ray.dom import fromstring_html
from spatula_ray.select import CSS, SelectorError, SimilarLink, XPath, Selector

SNIPPET = """
<div>
  <ul>
    <li>one</li>
    <li>two</li>
    <li>three</li>
  </ul>
  <a href="/a">1</a>
  <a href="/a">1-dup</a>
  <a href="/b">2</a>
  <a href="https://example.com/c">3</a>
</div>
"""


class DummySelector(Selector):
    """Controllable match count for the constraint matrix."""

    def __init__(self, n, **kwargs):
        super().__init__(**kwargs)
        self.n = n

    def get_items(self, element):
        yield from range(self.n)

    def __str__(self):
        return f"DummySelector({self.n})"


@pytest.fixture
def root():
    return fromstring_html(SNIPPET)


def test_min_items_default(root):
    with pytest.raises(SelectorError):
        DummySelector(0).match(root)
    assert DummySelector(1).match(root) == [0]


def test_min_items(root):
    assert DummySelector(2, min_items=2).match(root) == [0, 1]
    with pytest.raises(SelectorError):
        DummySelector(1, min_items=2).match(root)
    # call-time override beats ctor
    assert DummySelector(1, min_items=2).match(root, min_items=1) == [0]
    assert DummySelector(0).match(root, min_items=0) == []


def test_max_items(root):
    assert DummySelector(2, max_items=3).match(root) == [0, 1]
    with pytest.raises(SelectorError):
        DummySelector(4, max_items=3).match(root)
    assert len(DummySelector(4, max_items=3).match(root, max_items=5)) == 4


def test_num_items(root):
    assert len(DummySelector(3, num_items=3).match(root)) == 3
    with pytest.raises(SelectorError):
        DummySelector(2, num_items=3).match(root)
    assert len(DummySelector(2, num_items=3).match(root, num_items=2)) == 2


def test_match_one(root):
    assert DummySelector(1).match_one(root) == 0
    with pytest.raises(SelectorError):
        DummySelector(2).match_one(root)


def test_xpath_selector(root):
    assert len(XPath("//li").match(root)) == 3
    assert XPath("//li/text()").match(root) == ["one", "two", "three"]


def test_css_selector(root):
    assert len(CSS("ul li").match(root)) == 3


def test_similar_link(root):
    # 4 <a>, one duplicate href -> 3 distinct matching /
    links = SimilarLink("/").match(root)
    assert len(links) == 2  # "/a" (dedup) and "/b"; https://... doesn't match "/"
    assert [a.get("href") for a in links] == ["/a", "/b"]
    assert len(SimilarLink("https://").match(root)) == 1
    with pytest.raises(SelectorError):
        SimilarLink("ftp://").match(root)


def test_selector_error_message(root):
    with pytest.raises(SelectorError, match="expected 3"):
        DummySelector(2, num_items=3).match(root)
