"""Round-4g operators: C4 line filters, intra-document line dedup, and
token-budget selection — edge cases the sf-corpus gate rows don't reach
(empty-survivor docs, all-duplicate docs, budget extremes where the
boundary-bucket refine degenerates)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl: pa.Table):
    import ray.data as rd

    return rd.from_arrow(tbl)


@pytest.mark.usefixtures("ray_session")
def test_c4_line_filters_edges():
    from spatula_ray.stages.text import c4_line_filters

    docs = {
        1: "one two three four five six.\nshort line.\nno punct at all "
           "here now",                       # 1 kept of 3
        2: "good line one two three four.\ngood line five six seven "
           "eight!\ngood line nine ten eleven twelve?",  # all 3 kept
        3: "enable JavaScript to continue browsing now.",   # js drop
        4: "this has lorem ipsum inside it somewhere.\na fine line with "
           "five words here.\nanother fine line with six words here.\n"
           "a third fine line with seven words.",  # >=3 kept but lorem
        5: "var x = { a: 1 };\nclean line with five good words.",  # brace
    }
    out = c4_line_filters(_ds(pa.table({
        "doc_id": pa.array(sorted(docs), type=pa.int64()),
        "text": pa.array([docs[k] for k in sorted(docs)])}))) \
        .to_pandas().set_index("doc_id").sort_index()

    assert out.loc[1, "n_lines"] == 3
    assert out.loc[1, "kept_lines"] == 1
    assert not out.loc[1, "keep"]          # < 3 kept lines
    assert out.loc[1, "clean_text"] == "one two three four five six."

    assert out.loc[2, "kept_lines"] == 3
    assert bool(out.loc[2, "keep"])
    assert out.loc[2, "clean_text"].count("\n") == 2

    assert out.loc[3, "kept_lines"] == 0   # javascript rule
    assert out.loc[4, "kept_lines"] == 4   # lines fine individually
    assert bool(out.loc[4, "has_lorem"]) and not out.loc[4, "keep"]
    assert bool(out.loc[5, "has_brace"]) and not out.loc[5, "keep"]


@pytest.mark.usefixtures("ray_session")
def test_dedup_within_doc_edges():
    from spatula_ray.stages.text import dedup_within_doc

    docs = {
        1: "a\nb\na\nc\nb\na",     # survivors a,b,c in order
        2: "x\nx\nx\nx",           # all duplicates
        3: "only",                 # single line
        4: "p\n\nq\n\np",          # empty lines dedup too
    }
    out = dedup_within_doc(_ds(pa.table({
        "doc_id": pa.array(sorted(docs), type=pa.int64()),
        "text": pa.array([docs[k] for k in sorted(docs)])}))) \
        .to_pandas().set_index("doc_id").sort_index()

    assert out.loc[1, "clean_text"] == "a\nb\nc"
    assert out.loc[1, "n_lines"] == 6 and out.loc[1, "n_unique"] == 3
    assert out.loc[2, "clean_text"] == "x"
    assert out.loc[3, "clean_text"] == "only"
    assert out.loc[4, "clean_text"] == "p\n\nq"
    assert out.loc[4, "n_unique"] == 3


@pytest.mark.usefixtures("ray_session")
def test_token_budget_select_extremes():
    from spatula_ray.stages.curate import token_budget_select

    # ten docs, 4 tokens each; quality rises with doc_id via longer
    # distinct vocab (ttr fixed at 1 -> scores tie), so selection falls
    # back to doc_id tiebreak within the tied score
    tbl = pa.table({
        "doc_id": pa.array(list(range(10)), type=pa.int64()),
        "text": pa.array(["aa bb cc d%d" % i for i in range(10)]),
    })

    # budget fits everything -> all selected (no boundary bucket)
    out = token_budget_select(_ds(tbl), budget_tokens=1000) \
        .to_pandas().sort_values("doc_id")
    assert out["selected"].all()

    # zero budget -> nothing selected
    out0 = token_budget_select(_ds(tbl), budget_tokens=0) \
        .to_pandas()
    assert not out0["selected"].any()

    # budget for exactly three docs (12 tokens): identical scores ->
    # doc_id ascending tiebreak picks 0,1,2
    out3 = token_budget_select(_ds(tbl), budget_tokens=12) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out3["selected"].tolist() == [True] * 3 + [False] * 7

    # budget straddling a doc (13 tokens): prefix rule still stops at 3
    out13 = token_budget_select(_ds(tbl), budget_tokens=13) \
        .to_pandas().sort_values("doc_id")
    assert out13["selected"].sum() == 3


@pytest.mark.usefixtures("ray_session")
def test_token_budget_select_orders_by_quality():
    from spatula_ray.stages.curate import token_budget_select

    # doc 1 low quality (all-repeated tokens -> low ttr), doc 2 high
    tbl = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["spam spam spam spam spam spam",
                          "alpha bravo charlie delta echo foxtrot"]),
    })
    out = token_budget_select(_ds(tbl), budget_tokens=6) \
        .to_pandas().set_index("doc_id")
    assert bool(out.loc[2, "selected"]) and not out.loc[1, "selected"]
