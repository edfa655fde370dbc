"""Serialization units: obj_to_dict across dict/dataclass/attrs/pydantic,
display, input encode/decode roundtrip (mirrors reference tests/test_utils.py)."""

from dataclasses import dataclass

import pytest

from spatula_ray.dom import fromstring_html
from spatula_ray.records import (
    decode_input,
    display,
    display_element,
    encode_input,
    obj_to_dict,
)


@dataclass
class Point:
    x: int
    y: int


def test_obj_to_dict_none_and_dict():
    assert obj_to_dict(None) is None
    assert obj_to_dict({"a": 1}) == {"a": 1}


def test_obj_to_dict_dataclass():
    assert obj_to_dict(Point(1, 2)) == {"x": 1, "y": 2}


def test_obj_to_dict_attrs():
    import attr

    @attr.s
    class A:
        name = attr.ib(default="x")

    assert obj_to_dict(A()) == {"name": "x"}


def test_obj_to_dict_pydantic():
    import pydantic

    class M(pydantic.BaseModel):
        name: str = "x"

    assert obj_to_dict(M()) == {"name": "x"}


def test_obj_to_dict_invalid():
    with pytest.raises(ValueError):
        obj_to_dict(42)


def test_display_element():
    root = fromstring_html("<div id='main'><span class='c'>x</span><b a='1' b='2'>y</b></div>")
    assert display_element(root).startswith("<div id='main'>")
    span = root.xpath("//span")[0]
    assert "class='c'" in display_element(span)
    b = root.xpath("//b")[0]
    assert "a='1' b='2'" in display_element(b)


def test_display_fallback():
    assert display(42) == "42"
    assert "x" in display({"x": 1})


def test_input_roundtrip_scalars():
    for v in [None, "s", 7, 3.5, True, [1, 2], {"k": "v"}]:
        assert decode_input(encode_input(v)) == v


def test_input_roundtrip_dataclass():
    out = decode_input(encode_input(Point(3, 4)))
    assert out == Point(3, 4)
    assert isinstance(out, Point)
