"""Unit tests for the round-4b curation operators: cross-document
substring-span dedup, bigram-LM quality scoring, and SemDeDup semantic
dedup. (Oracle parity at sf0.001 is covered by tests/test_oracles.py;
these pin the semantic behavior on planted fixtures.)"""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


@pytest.mark.usefixtures("ray_session")
def test_dedup_spans_planted_duplicate():
    from spatula_ray.stages.curate import dedup_spans

    span = "alpha beta gamma delta epsilon"          # exactly L=5 tokens
    rows = [
        (1, f"one two {span} three four"),            # owner (min doc_id)
        (2, f"head {span} tail"),                     # loser: span removed
        (3, "totally different words here entirely"), # untouched
        (4, "short doc"),                             # < L tokens: untouched
    ]
    out = dedup_spans(_docs_ds(rows), L=5).to_pandas() \
        .set_index("doc_id").sort_index()

    assert out.loc[1, "clean_text"] == rows[0][1]     # owner keeps its copy
    assert out.loc[1, "n_kept"] == out.loc[1, "n_tokens"] == 9
    assert out.loc[2, "clean_text"] == "head tail"
    assert out.loc[2, "n_tokens"] == 7
    assert out.loc[2, "n_kept"] == 2
    assert out.loc[3, "clean_text"] == rows[2][1]
    assert out.loc[4, "clean_text"] == "short doc"


@pytest.mark.usefixtures("ray_session")
def test_dedup_spans_overlapping_windows_cover_whole_run():
    from spatula_ray.stages.curate import dedup_spans

    # a 7-token duplicated run: every internal 5-window duplicates, so
    # all 7 positions are covered in the loser, not just the first 5
    run = "a b c d e f g"
    rows = [(1, run), (2, f"x {run} y")]
    out = dedup_spans(_docs_ds(rows), L=5).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1, "clean_text"] == run
    assert out.loc[2, "clean_text"] == "x y"
    assert out.loc[2, "n_kept"] == 2


@pytest.mark.usefixtures("ray_session")
def test_lm_nll_flags_out_of_distribution_doc():
    from spatula_ray.stages.curate import lm_nll

    # 20 fluent docs reusing the same bigrams + 1 doc of unseen unigrams:
    # the OOD doc must score a strictly higher mean NLL than every
    # in-distribution doc
    fluent = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, fluent) for i in range(20)]
    rows.append((99, "zq xv jk wp qq zz xx vv"))
    out = lm_nll(_docs_ds(rows), vocab_size=200).to_pandas() \
        .set_index("doc_id")
    assert out.loc[99, "nll"] > out.drop(index=99)["nll"].max()
    assert out.loc[99, "n_tokens"] == 8
    # identical docs score identically (parallelism-invariant)
    assert out.drop(index=99)["nll"].nunique() == 1


@pytest.mark.usefixtures("ray_session")
def test_semdedup_marks_planted_near_duplicates():
    import ray.data as rd

    from spatula_ray.stages.similarity import semdedup

    rng = np.random.RandomState(7)
    base = rng.randn(40, 8)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # vectors 100..103 are tiny perturbations of vector 0
    near = base[0] + rng.randn(4, 8) * 1e-3
    near /= np.linalg.norm(near, axis=1, keepdims=True)
    vecs = np.vstack([base, near])
    ids = list(range(40)) + [100, 101, 102, 103]
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs]),
    }))
    out = semdedup(ds, n_cells=4, tau_permille=990, sample=64,
                   iters=3).to_pandas().set_index("vec_id").sort_index()

    assert len(out) == 44
    assert bool(out.loc[0, "keep"])                   # lowest id kept
    for vid in (100, 101, 102, 103):
        assert not bool(out.loc[vid, "keep"])
        assert out.loc[vid, "dup_of"] == 0            # min qualifying id
    # kept rows carry the -1 sentinel
    assert (out[out["keep"]]["dup_of"] == -1).all()
