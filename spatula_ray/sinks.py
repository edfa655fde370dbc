"""Dataset sinks for the crawl output — Lance when available, partitioned
parquet otherwise.

The north-star pipeline lands interleaved text+media documents in Lance
tables. This container has Ray's ``Dataset.write_lance`` / ``read_lance``
wrappers but not the ``lance`` package itself, so the sink self-selects:

* ``fmt="auto"`` writes Lance when ``import lance`` succeeds, else
  partitioned parquet in the SAME layout (a directory per dataset, blocks
  as files, resumable by skipping complete directories). Outside this
  container the Lance path activates with no code change — the seam is
  exercised by tests either way (skip-marked when lance is absent, the
  same self-upgrading pattern as the PIL branch in stages/multimodal.py).
* ``read_docs`` detects a Lance dataset directory by its ``_versions``
  marker and otherwise reads parquet through the metadata-stripped
  ``read_parquet_clean`` path.

Both formats keep the interleaved document schema from BASELINE.json's
input hint: ``doc_id: string|int64``, ``spans:
list<struct<kind, text, media_ref, offset>>`` — the span struct is a
first-class Arrow column in either format (Lance is Arrow-native; parquet
nests the struct list losslessly).
"""

from __future__ import annotations

import os


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def resolve_format(fmt: str = "auto") -> str:
    """'auto' -> 'lance' when the package is importable, else 'parquet'."""
    if fmt == "auto":
        return "lance" if lance_available() else "parquet"
    if fmt == "lance" and not lance_available():
        raise RuntimeError(
            "format 'lance' requested but the lance package is not "
            "installed; use 'auto' to fall back to parquet")
    if fmt not in ("lance", "parquet"):
        raise ValueError(f"unknown sink format {fmt!r}")
    return fmt


def write_docs(ds, path: str, fmt: str = "auto") -> str:
    """Write a Dataset to ``path`` in the resolved format; returns the
    format actually used. Streaming in both branches — Ray's datasink
    writes blocks as they arrive, never materializing the dataset."""
    fmt = resolve_format(fmt)
    if fmt == "lance":
        ds.write_lance(path)
    else:
        os.makedirs(path, exist_ok=True)
        ds.write_parquet(path)
    return fmt


def is_lance_dir(path: str) -> bool:
    return os.path.isdir(os.path.join(path, "_versions")) or \
        os.path.isdir(os.path.join(path, "_transactions"))


def read_docs(path: str, columns=None):
    """Read a dataset written by :func:`write_docs`, format-detected."""
    if is_lance_dir(path):
        import ray.data as rd

        return rd.read_lance(path, columns=columns)
    from .ioutil import read_parquet_clean

    return read_parquet_clean(path, columns=columns)
