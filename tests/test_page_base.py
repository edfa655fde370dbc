"""Page lifecycle unit matrix (mirrors reference tests/test_page_base.py:
source resolution, dependencies, error hook, retry loop, DFS chaining,
scout projection, pagination, SkipItem) against the engine's oracle runner."""

import logging

import pytest

from spatula_ray import (
    HandledError,
    ListPage,
    MissingSourceError,
    NullSource,
    Page,
    RejectedResponse,
    SkipItem,
    config,
)
from spatula_ray.client import HTTPError, Response, SyntheticClient

SOURCE = "https://example.com"


def dummy_client():
    """Returns 'dummy response for <url>' for every url; errors on 'error'."""

    def resolver(url):
        if url == "error":
            return {"status": 400, "body": b"error response"}
        return {"status": 200, "body": f"dummy response for {url}".encode()}

    return SyntheticClient(resolver)


class DummyPage(Page):
    def process_page(self):
        raise NotImplementedError


def test_page_init_and_str():
    INPUT = "input-value"
    assert str(DummyPage()) == "DummyPage()"
    assert str(DummyPage(INPUT)) == f"DummyPage(input={INPUT} )"
    assert str(DummyPage(source=SOURCE)) == f"DummyPage(source={SOURCE})"
    assert (str(DummyPage(INPUT, source=SOURCE))
            == f"DummyPage(input={INPUT} source={SOURCE})")
    assert DummyPage().logger == logging.getLogger(f"{DummyPage.__module__}.DummyPage")


def test_fetch_data_dependencies_class_form():
    class DependencyPage(Page):
        source = SOURCE

        def process_page(self):
            return "dependency fulfilled"

    class DependencyTestPage(DummyPage):
        source = SOURCE
        dependencies = {"a_dependency": DependencyPage}

    p = DependencyTestPage()
    p._fetch_data(dummy_client())
    assert p.a_dependency == "dependency fulfilled"
    # class-form deps are NOT cached (pages.py:143-146)
    assert "a_dependency" not in Page._cached_dependencies


def test_fetch_data_dependencies_instance_cached():
    calls = []

    class DependencyPage(Page):
        source = SOURCE

        def process_page(self):
            calls.append(1)
            return "dep result"

    class A(DummyPage):
        source = SOURCE
        dependencies = {"shared_dep": DependencyPage()}

    p1, p2 = A(), A()
    c = dummy_client()
    p1._fetch_data(c)
    p2._fetch_data(c)
    assert p1.shared_dep == p2.shared_dep == "dep result"
    assert len(calls) == 1  # fetched exactly once, then cached


def test_get_source_from_input_called():
    class SimpleInputPage(DummyPage):
        def get_source_from_input(self):
            return self.input["use_this_as_source"]

    p = SimpleInputPage({"use_this_as_source": SOURCE})
    p._fetch_data(dummy_client())
    assert p.source.url == SOURCE


def test_missing_source_error():
    with pytest.raises(MissingSourceError):
        DummyPage()._fetch_data(dummy_client())


def test_fetch_data_sets_response():
    p = DummyPage(source=SOURCE)
    p._fetch_data(dummy_client())
    assert p.response.text == f"dummy response for {SOURCE}"


def test_fetch_data_handle_error_response():
    class ErrorPage(DummyPage):
        _error_was_called = False

        def process_error_response(self, exception):
            self._error_was_called = True

        def postprocess_response(self):
            raise Exception("should not happen")

    p = ErrorPage(source="error")
    with pytest.raises(HandledError):
        p._fetch_data(dummy_client())
    assert p._error_was_called


def test_unhandled_error_propagates():
    p = DummyPage(source="error")
    with pytest.raises(HTTPError):
        p._fetch_data(dummy_client())


class RetrySource:
    """Fake source that succeeds on the 3rd call (reference RetrySource)."""

    def __init__(self, retries):
        self.retries = retries
        self.called = 0

    def get_response(self, client):
        self.called += 1
        if self.called < 3:
            return Response("http://failure", 200, b"failure")
        return Response("http://retried", 200, b"dummy response for http://retried")


class RetryPage(DummyPage):
    def accept_response(self, response):
        return b"failure" not in response.content


def test_retry_success():
    p = RetryPage(source=RetrySource(retries=2))
    p._fetch_data(dummy_client())
    assert p.response.text == "dummy response for http://retried"


def test_retry_still_fails():
    p = RetryPage(source=RetrySource(retries=1))
    with pytest.raises(RejectedResponse) as e:
        p._fetch_data(dummy_client())
    assert "2x" in str(e.value)


def test_retry_default_budget():
    # no per-source retries -> config.REJECTED_RESPONSE_RETRIES (=1) + 1 attempts
    assert config.REJECTED_RESPONSE_RETRIES == 1
    src = RetrySource(retries=None)
    p = RetryPage(source=src)
    with pytest.raises(RejectedResponse):
        p._fetch_data(dummy_client())
    assert src.called == 2


def test_fetch_data_postprocess():
    class Postprocess(DummyPage):
        _postprocessed = False

        def postprocess_response(self):
            self._postprocessed = True

    p = Postprocess(source=SOURCE)
    p._fetch_data(dummy_client())
    assert p._postprocessed


def test_default_processing():
    p = DummyPage()
    with pytest.raises(ArithmeticError):
        p.process_error_response(ArithmeticError())
    with pytest.raises(NotImplementedError):
        p.process_page()


class SecondPage(Page):
    source = NullSource()

    def process_page(self):
        return {**self.input, "second": "appended"}


class FirstPage(Page):
    source = NullSource()

    def process_page(self):
        yield SecondPage({"first": 1})
        yield SecondPage({"first": 2})
        yield SecondPage({"first": 3})


def test_do_scrape_simple():
    items = list(FirstPage().do_scrape())
    assert items == [
        {"first": 1, "second": "appended"},
        {"first": 2, "second": "appended"},
        {"first": 3, "second": "appended"},
    ]


def test_scout_mode():
    from spatula_ray.runner import scrape_iter

    items = [item for _k, item in scrape_iter(FirstPage(), scout=True)]
    assert items == [
        {"data": {"first": 1}, "__next__": "SecondPage source=NullSource"},
        {"data": {"first": 2}, "__next__": "SecondPage source=NullSource"},
        {"data": {"first": 3}, "__next__": "SecondPage source=NullSource"},
    ]


class ExamplePaginatedPage(Page):
    source = NullSource()

    def process_page(self):
        yield {"val": "a man"}
        yield {"val": "a plan"}
        yield {"val": "panama"}

    def get_next_source(self):
        if isinstance(self.source, NullSource):
            return SOURCE


def test_paginated_page():
    items = list(ExamplePaginatedPage().do_scrape(dummy_client()))
    assert len(items) == 6


def test_paginated_single_value_page():
    class SingleReturnPaginatedPage(Page):
        source = NullSource()

        def process_page(self):
            return {"dummy": "value"}

        def get_next_source(self):
            if isinstance(self.source, NullSource):
                return SOURCE

    items = list(SingleReturnPaginatedPage().do_scrape(dummy_client()))
    assert len(items) == 2


def test_paginated_page_with_error():
    class ErrorThenPaginatedPage(Page):
        source = "error"
        error_handled = False

        def process_page(self):
            return {"dummy": "value"}

        def process_error_response(self, exception):
            ErrorThenPaginatedPage.error_handled = True

        def get_next_source(self):
            if self.source.url == "error":
                return SOURCE

    items = list(ErrorThenPaginatedPage().do_scrape(dummy_client()))
    assert len(items) == 1  # error page yields nothing, pagination proceeds
    assert ErrorThenPaginatedPage.error_handled


def test_skip_item(caplog):
    class SkipOddPage(ListPage):
        source = NullSource()

        def process_page(self):
            yield from self._process_or_skip_loop([1, 2, 3, 4, 5])

        def process_item(self, item):
            if item % 2:
                raise SkipItem(f"{item} is odd!")
            return item

    with caplog.at_level(logging.INFO):
        items = list(SkipOddPage().do_scrape())
    assert items == [2, 4]
    skip_records = [r for r in caplog.records if "SkipItem" in r.message]
    assert len(skip_records) == 3


def test_skip_item_on_detail_page(caplog):
    class SkipOddDetail(Page):
        def process_page(self):
            if self.input % 2:
                raise SkipItem(f"{self.input} is odd!")
            return self.input

    class SkipOddList(ListPage):
        source = NullSource()

        def process_page(self):
            yield from self._process_or_skip_loop([1, 2, 3, 4, 5])

        def process_item(self, item):
            return SkipOddDetail(item, source=NullSource())

    with caplog.at_level(logging.INFO):
        items = list(SkipOddList().do_scrape())
    assert items == [2, 4]


def test_order_keys_reproduce_dfs_order():
    """Lexicographic order of the engine's order keys == emission order."""
    from spatula_ray.runner import scrape_iter

    pairs = list(scrape_iter(ExamplePaginatedPage(), dummy_client()))
    keys = [k for k, _ in pairs]
    assert keys == sorted(keys)
    # pagination items sort after first-page items
    assert len(keys) == 6
    assert keys[3][1] == 2**31


def test_order_keys_nested_chain():
    from spatula_ray.runner import scrape_iter

    pairs = list(scrape_iter(FirstPage(), dummy_client()))
    keys = [k for k, _ in pairs]
    assert keys == [(0, 0, 0), (0, 1, 0), (0, 2, 0)]
    assert keys == sorted(keys)
