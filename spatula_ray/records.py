"""Record normalization & dynamic-input (de)serialization.

The reference accepts ``None | dict | dataclass | attrs | pydantic`` records
(``/root/reference/src/spatula/utils.py:45-55``); the engine collapses those
to plain dicts at every stage boundary and, for the distributed path, to a
JSON ``input_json`` binary column on frontier rows (the dynamic part of the
otherwise fixed Arrow envelope schema).
"""

from __future__ import annotations

import dataclasses
import importlib
import json
import pprint
from typing import Any, Dict, Optional

try:  # attrs is available in this environment (ray dependency)
    import attr as _attr

    def _attrs_has(o):
        return _attr.has(type(o)) if not isinstance(o, type) else _attr.has(o)

    _attrs_asdict = _attr.asdict
except ImportError:  # pragma: no cover
    def _attrs_has(o):
        return False

    def _attrs_asdict(o):
        return {}


def _is_pydantic(obj: Any) -> bool:
    # check model_dump (v2) first so we don't touch the deprecated __fields__
    return hasattr(obj, "model_dump") or (
        hasattr(obj, "__fields__") and hasattr(obj, "dict")
    )


def obj_to_dict(obj: Any) -> Optional[Dict]:
    """Normalize a record to a plain dict (or None).

    Accepts the same four shapes as the reference serialization boundary;
    anything else raises ``ValueError``.
    """
    if obj is None or isinstance(obj, dict):
        return obj
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return dataclasses.asdict(obj)
    if _attrs_has(obj):
        return _attrs_asdict(obj)
    if _is_pydantic(obj):
        if hasattr(obj, "model_dump"):
            return obj.model_dump()
        return obj.dict()
    raise ValueError(f"invalid type: {obj} ({type(obj)})")


def display(obj: Any) -> str:
    """Human-readable rendering used by the dev/test CLI."""
    from .dom import Element

    if isinstance(obj, Element):
        return display_element(obj)
    try:
        return pprint.pformat(obj_to_dict(obj))
    except ValueError:
        return str(obj)


def display_element(el) -> str:
    s = f"<{el.tag} "
    if el.get("id"):
        s += f"id='{el.get('id')}'"
    elif el.get("class"):
        s += f"class='{el.get('class')}'"
    else:
        s += " ".join(f"{k}='{v}'" for k, v in el.attrib.items())
    return f"{s.strip()}> @ line {el.sourceline}"


# ---------------------------------------------------------------------------
# input payload <-> JSON bytes (frontier envelope's dynamic column)
# ---------------------------------------------------------------------------

from json.encoder import encode_basestring_ascii as _escape_str

_TYPE_KEY = "__spatula_ray_type__"
_RAW_KEY = "__raw__"


def encode_input(obj: Any) -> bytes:
    """Serialize a page ``input`` to JSON bytes, remembering typed classes so
    ``decode_input`` can reconstruct dataclass/attrs/pydantic instances."""
    if obj is None:
        return b"null"
    if isinstance(obj, (str, int, float, bool, list)):
        return json.dumps({_RAW_KEY: obj}, sort_keys=True).encode()
    if isinstance(obj, dict):
        if len(obj) == 1 and "url" in obj and type(obj["url"]) is str:
            # hot path: the ubiquitous {"url": ...} child input — one
            # C-level string escape instead of the dict encoder
            return ('{"url": %s}' % _escape_str(obj["url"])).encode()
        return json.dumps(obj, sort_keys=True, default=str).encode()
    d = obj_to_dict(obj)  # raises ValueError on unsupported types
    cls = type(obj)
    d = dict(d or {})
    d[_TYPE_KEY] = f"{cls.__module__}:{cls.__qualname__}"
    return json.dumps(d, sort_keys=True, default=str).encode()


def decode_input(data: Optional[bytes]) -> Any:
    if data is None or data == b"" or data == b"null":
        return None
    obj = json.loads(data)
    if isinstance(obj, dict):
        if _RAW_KEY in obj and len(obj) == 1:
            return obj[_RAW_KEY]
        tname = obj.pop(_TYPE_KEY, None)
        if tname:
            mod, _, qual = tname.partition(":")
            target: Any = importlib.import_module(mod)
            for part in qual.split("."):
                target = getattr(target, part)
            return target(**obj)
    return obj
