"""Selectors with cardinality constraints.

Same contract as the reference (``/root/reference/src/spatula/selectors.py``):
``Selector.match`` enforces min/max/exact item counts and raises
``SelectorError``; concrete selectors are ``XPath``, ``CSS`` and
``SimilarLink`` (regex over all ``<a href>`` with per-document insertion-order
dedup, ``selectors.py:136-144``). Implemented over the engine's own stdlib DOM
(:mod:`spatula_ray.dom`) since lxml/cssselect aren't available.
"""

from __future__ import annotations

import re
from abc import ABC, abstractmethod
from typing import Iterator, List, Optional

from .dom import Element
from .records import display


class SelectorError(ValueError):
    """Raised when a selector's min/max/num_items constraint is not met."""


class Selector(ABC):
    def __init__(
        self,
        *,
        min_items: Optional[int] = 1,
        max_items: Optional[int] = None,
        num_items: Optional[int] = None,
    ):
        self.min_items = min_items
        self.max_items = max_items
        self.num_items = num_items

    def match(
        self,
        element: Element,
        *,
        min_items: Optional[int] = None,
        max_items: Optional[int] = None,
        num_items: Optional[int] = None,
    ) -> List:
        items = list(self.get_items(element))
        num_items = self.num_items if num_items is None else num_items
        max_items = self.max_items if max_items is None else max_items
        min_items = self.min_items if min_items is None else min_items

        n = len(items)
        if num_items is not None and n != num_items:
            raise SelectorError(
                f"{self} on {display(element)} got {n} results, expected {num_items}"
            )
        if min_items is not None and n < min_items:
            raise SelectorError(
                f"{self} on {display(element)} got {n} results, expected at least {min_items}"
            )
        if max_items is not None and n > max_items:
            raise SelectorError(
                f"{self} on {display(element)} got {n} results, expected at most {max_items}"
            )
        return items

    def match_one(self, element: Element):
        return self.match(element, num_items=1)[0]

    @abstractmethod
    def get_items(self, element: Element) -> Iterator:  # pragma: no cover
        ...


class XPath(Selector):
    def __init__(self, xpath: str, *, min_items: Optional[int] = 1,
                 max_items: Optional[int] = None, num_items: Optional[int] = None):
        super().__init__(min_items=min_items, max_items=max_items, num_items=num_items)
        self.xpath = xpath

    def get_items(self, element: Element) -> Iterator:
        yield from element.xpath(self.xpath)

    def __str__(self) -> str:
        return f"XPath({self.xpath})"


class CSS(Selector):
    def __init__(self, css_selector: str, *, min_items: Optional[int] = 1,
                 max_items: Optional[int] = None, num_items: Optional[int] = None):
        super().__init__(min_items=min_items, max_items=max_items, num_items=num_items)
        self.css_selector = css_selector

    def get_items(self, element: Element) -> Iterator:
        yield from element.cssselect(self.css_selector)

    def __str__(self) -> str:
        return f"CSS({self.css_selector})"


class SimilarLink(Selector):
    def __init__(self, pattern: str, *, min_items: Optional[int] = 1,
                 max_items: Optional[int] = None, num_items: Optional[int] = None):
        super().__init__(min_items=min_items, max_items=max_items, num_items=num_items)
        self.pattern = re.compile(pattern)

    def get_items(self, element: Element) -> Iterator:
        seen = set()
        for a in element.xpath("//a"):
            href = a.get("href")
            if href and href not in seen and self.pattern.match(href):
                yield a
                seen.add(href)

    def __str__(self) -> str:
        return f"SimilarLink({self.pattern.pattern})"
