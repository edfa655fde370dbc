"""Round-5 brief item #1: auto-derived k-means cell counts and the
hot-cell split guard for the semdedup/knn_graph/cluster_balanced_select
family (the round-4 verdict's one remaining manual scale knob)."""

import numpy as np
import pyarrow as pa
import pytest

import ray


def _emb_ds(mat):
    t = pa.table({
        "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in mat]),
    })
    return ray.data.from_arrow(t)


def test_derive_n_cells_formula():
    from spatula_ray.stages.similarity import derive_n_cells

    assert derive_n_cells(0) == 16
    assert derive_n_cells(500) == 16           # gate scales stay at 16
    assert derive_n_cells(2000) == 16
    assert derive_n_cells(4096) == 16
    assert derive_n_cells(4097) == 17          # first step past the floor
    assert derive_n_cells(10_000) == 40
    assert derive_n_cells(256 * 2048) == 2048  # sample-size ceiling
    assert derive_n_cells(10_000_000) == 2048


def test_split_cell_groups_preserves_exact_duplicates():
    """The hot-cell split never separates identical normalized vectors,
    and every emitted group respects the cap (or is degenerate)."""
    from spatula_ray.stages.similarity import _split_cell_groups

    rng = np.random.RandomState(3)
    m = rng.randint(-1000, 1000, size=(64, 8)).astype(np.int64)
    m[1] = m[0]
    m[33] = m[0]
    ids = np.arange(64, dtype=np.int64)
    groups = list(_split_cell_groups(ids, m, cap=10))
    assert sum(len(g[0]) for g in groups) == 64
    # ids 0, 1, 33 share one group: identical vectors, same plane side
    homes = {int(i): gi for gi, (gids, _) in enumerate(groups)
             for i in gids}
    assert homes[0] == homes[1] == homes[33]
    # order within groups stays id-ascending (mask indexing is stable)
    for gids, _ in groups:
        assert (np.diff(gids) > 0).all()


def test_semdedup_forced_split_keeps_exact_dup_detection():
    """With a tiny cell_cap forcing in-kernel splits, exact duplicates
    (identical embeddings) are still marked dup_of their min id."""
    from spatula_ray.stages.similarity import semdedup

    rng = np.random.RandomState(11)
    mat = rng.standard_normal((120, 8))
    mat[50] = mat[10]
    mat[90] = mat[10]
    out = semdedup(_emb_ds(mat), n_cells=2, tau_permille=999,
                   sample=120, cell_cap=16).to_pandas()
    assert len(out) == 120
    by_id = out.set_index("vec_id")
    assert by_id.loc[50, "dup_of"] == 10
    assert by_id.loc[90, "dup_of"] == 10
    assert bool(by_id.loc[10, "keep"])


def test_knn_graph_forced_split_emits_valid_subgroup_edges():
    """With a tiny cell_cap, knn_graph still emits rank-consistent edges
    and exact duplicates appear as each other's top neighbor."""
    from spatula_ray.stages.similarity import knn_graph

    rng = np.random.RandomState(13)
    mat = rng.standard_normal((100, 8))
    mat[70] = mat[20]
    out = knn_graph(_emb_ds(mat), k=2, n_cells=1, sample=100,
                    cell_cap=12).to_pandas()
    assert (out["nn_rank"] >= 1).all() and (out["nn_rank"] <= 2).all()
    top20 = out[(out.vec_id == 20) & (out.nn_rank == 1)]
    assert top20.iloc[0]["neighbor_id"] == 70
    top70 = out[(out.vec_id == 70) & (out.nn_rank == 1)]
    assert top70.iloc[0]["neighbor_id"] == 20


def test_semdedup_derived_cells_matches_explicit():
    """n_cells=None derives the same result as passing the formula value
    explicitly (the SQL oracle relies on this equivalence)."""
    from spatula_ray.stages.similarity import derive_n_cells, semdedup

    rng = np.random.RandomState(5)
    mat = rng.standard_normal((300, 8))
    auto = semdedup(_emb_ds(mat), sample=256).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    manual = semdedup(_emb_ds(mat), n_cells=derive_n_cells(300),
                      sample=256).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert auto.equals(manual)
