"""spatula_ray — a Ray-Data-native crawl/data-processing engine with the
query and workflow model of jamesturk/spatula, built from scratch.

Public API mirrors the reference's extension surface
(`/root/reference/src/spatula/__init__.py`): page classes, selectors,
sources, and exceptions; plus the engine entry points
(`spatula_ray.engine.crawl`) and the sequential oracle
(`spatula_ray.runner`).
"""

from . import config  # noqa: F401
from .client import FetchClient, HTTPError, Response, SyntheticClient, TableResolver  # noqa: F401
from .model import (  # noqa: F401
    CsvListPage,
    ExcelListPage,
    HandledError,
    HtmlListPage,
    HtmlPage,
    JsonListPage,
    JsonPage,
    ListPage,
    LxmlListPage,
    MissingSourceError,
    Page,
    PdfPage,
    RejectedResponse,
    SkipItem,
    XmlListPage,
    XmlPage,
)
from .cache import CachingClient, ResponseCache  # noqa: F401
from .origins import URL, NullSource, Source  # noqa: F401
from .records import obj_to_dict  # noqa: F401
from .select import CSS, SelectorError, SimilarLink, XPath  # noqa: F401

__version__ = "0.1.0"
