"""Unit tests for the round-3b operators: sliding-window chunking,
vocabulary coverage, int8 embedding quantization, stratified sampling,
and the Lance/parquet sink seam. (Oracle parity at sf0.001 is covered by
tests/test_oracles.py; these pin edge semantics.)"""

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
def test_chunk_documents_edges():
    from spatula_ray.stages.curate import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    rows = [
        (1, ""),                      # empty -> 1 chunk, text ''
        (2, " ".join(toks[:4])),      # n=4 <= size -> 1 chunk
        (3, " ".join(toks[:5])),      # n=5 = size+1 -> 2 chunks
        (4, " ".join(toks)),          # n=10 -> ceil(6/3)+1 = 3 chunks
    ]
    out = chunk_documents(_docs_ds(rows), size=4, stride=3).to_pandas()
    out = out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    by_doc = {d: g for d, g in out.groupby("doc_id")}

    assert list(by_doc[1]["chunk_text"]) == [""]
    assert list(by_doc[1]["n_tokens"]) == [1]  # split('') == ['']
    assert list(by_doc[2]["chunk_text"]) == ["t0 t1 t2 t3"]
    assert list(by_doc[3]["chunk_text"]) == ["t0 t1 t2 t3", "t3 t4"]
    assert list(by_doc[4]["chunk_text"]) == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"]
    assert list(by_doc[4]["chunk_id"]) == [0, 1, 2]
    assert list(by_doc[4]["n_tokens"]) == [4, 4, 4]
    # every token of every doc is covered by at least one chunk
    for did, text in rows:
        got = set()
        for _, r in by_doc[did].iterrows():
            got.update(r["chunk_text"].split(" "))
        assert got == set((text or "").split(" "))


@pytest.mark.usefixtures("ray_session")
def test_chunk_documents_exact_boundary():
    from spatula_ray.stages.curate import chunk_documents

    # (n - size) divisible by stride: last chunk ends exactly at n
    text = " ".join(f"w{i}" for i in range(28))
    out = chunk_documents(_docs_ds([(7, text)]),
                          size=16, stride=12).to_pandas()
    assert len(out) == 2
    assert out["n_tokens"].tolist() == [16, 16]
    assert out["chunk_text"].iloc[1].split(" ")[-1] == "w27"


@pytest.mark.usefixtures("ray_session")
def test_vocab_coverage_top_v_tiebreak():
    from spatula_ray.stages.curate import corpus_vocab, vocab_coverage

    # counts: a=3, b=3, c=2, d=1 -> V=2 vocab is {a, b} (tie on term asc)
    rows = [(1, "a b a"), (2, "b a b"), (3, "c c d")]
    vocab = corpus_vocab(_docs_ds(rows), vocab_size=2).to_pandas()
    assert sorted(vocab["term"]) == ["a", "b"]

    cov = vocab_coverage(_docs_ds(rows), vocab_size=2).to_pandas()
    cov = cov.set_index("doc_id")
    assert cov.loc[1, "n_invocab"] == 3 and cov.loc[1, "coverage"] == 1.0
    assert cov.loc[3, "n_invocab"] == 0 and cov.loc[3, "coverage"] == 0.0
    assert cov.loc[1, "n_tokens"] == 3


@pytest.mark.usefixtures("ray_session")
def test_quantize_embeddings_values():
    import ray.data as rd

    from spatula_ray.stages.similarity import quantize_embeddings

    vecs = [[0.5, -1.0, 0.25], [0.0, 0.0, 0.0], [2.0, 1.0, -2.0]]
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2], type=pa.int64()),
        "embedding": pa.array(vecs, type=pa.list_(pa.float64())),
    }))
    out = quantize_embeddings(ds).to_pandas() \
        .sort_values(["vec_id", "d"]).reset_index(drop=True)
    assert len(out) == 9
    q0 = out[out.vec_id == 0]
    assert q0["scale"].tolist() == [1.0] * 3
    assert q0["q"].tolist() == [64, -127, 32]  # floor(x*127+0.5)
    q1 = out[out.vec_id == 1]
    assert q1["q"].tolist() == [0, 0, 0] and q1["scale"].tolist() == [0.0] * 3
    q2 = out[out.vec_id == 2]
    assert q2["scale"].tolist() == [2.0] * 3
    assert q2["q"].tolist() == [127, 64, -127]


@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_rates_and_determinism():
    import ray.data as rd

    from spatula_ray.stages.curate import hash_sample, stratified_sample

    n = 2000
    langs = ["en", "de", "zz"]
    t = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "lang": pa.array([langs[i % 3] for i in range(n)]),
    })
    rates = {"en": 1000, "de": 100}
    out = stratified_sample(rd.from_arrow(t), "lang", rates,
                            default_permille=0).to_pandas()
    # en: rate 1000 keeps every row; zz: default 0 keeps none
    assert (out["lang"] == "zz").sum() == 0
    assert (out["lang"] == "en").sum() == (n + 2) // 3
    de = out[out["lang"] == "de"]
    assert 0 < len(de) < n // 3
    assert (de["sample_key"] < 100).all()
    # same row set as the global sampler restricted to the stratum
    base = hash_sample(rd.from_arrow(t), rate_permille=100).to_pandas()
    assert set(de["doc_id"]) == set(
        base[base["lang"] == "de"]["doc_id"])
    # deterministic across runs
    again = stratified_sample(rd.from_arrow(t), "lang", rates,
                              default_permille=0).to_pandas()
    assert set(again["doc_id"]) == set(out["doc_id"])


@pytest.mark.usefixtures("ray_session")
def test_epoch_shuffle_properties():
    import ray.data as rd

    from spatula_ray.stages.curate import epoch_shuffle

    n = 500
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(n),
                                                    type=pa.int64())}))
    e1 = epoch_shuffle(ds, epoch=1, n_shards=4).to_pandas()
    # a permutation: every doc exactly once; positions dense per shard
    assert sorted(e1["doc_id"]) == list(range(n))
    for _, g in e1.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))
    # deterministic replay, different epochs give a different order
    again = epoch_shuffle(ds, epoch=1, n_shards=4).to_pandas()
    key = lambda df: df.sort_values("doc_id")[["shard", "pos"]].to_numpy()
    assert (key(e1) == key(again)).all()
    e2 = epoch_shuffle(ds, epoch=2, n_shards=4).to_pandas()
    assert not (key(e1) == key(e2)).all()


@pytest.mark.usefixtures("ray_session")
def test_span_stats_partials_straddle_blocks():
    """The per-batch partial agg must fold correctly when one doc's spans
    split across blocks — force 1-row blocks and compare to a single-frame
    pandas aggregate."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    rows = []
    for d in (1, 2):
        for i in range(3):
            rows.append({"doc_id": d, "kind": "text" if i < 2 else "media",
                         "text": f"x{d}" * (i + 1) if i < 2 else "",
                         "media_ref": "" if i < 2 else "m://r",
                         "offset": i})
    ds = rd.from_items(rows).repartition(len(rows))

    import pandas as pd
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        is_text = pc.equal(t["kind"], "text").to_numpy(zero_copy_only=False)
        chars = pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"doc_id": t["doc_id"].to_numpy(),
                           "t": is_text.astype("int64"),
                           "m": (~is_text).astype("int64"),
                           "c": (chars * is_text).astype("int64")})
        g = df.groupby("doc_id", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("doc_id")
           .aggregate(Sum("t", alias_name="n_text_spans"),
                      Sum("m", alias_name="n_media_spans"),
                      Sum("c", alias_name="n_text_chars"))
           .to_pandas().set_index("doc_id"))
    assert out.loc[1, "n_text_spans"] == 2
    assert out.loc[1, "n_media_spans"] == 1
    assert out.loc[1, "n_text_chars"] == 2 + 4   # 'x1' + 'x1x1'
    assert out.loc[2, "n_text_chars"] == 2 + 4


@pytest.mark.usefixtures("ray_session")
def test_sink_seam_parquet_fallback(tmp_path):
    import ray.data as rd

    from spatula_ray import sinks

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "spans": pa.array(
            [[{"kind": "text", "text": "a", "media_ref": "", "offset": 0}],
             [], [{"kind": "media", "text": "", "media_ref": "m://x",
                   "offset": 0}]],
            type=pa.list_(pa.struct([("kind", pa.string()),
                                     ("text", pa.string()),
                                     ("media_ref", pa.string()),
                                     ("offset", pa.int32())]))),
    }))
    path = str(tmp_path / "docs")
    fmt = sinks.write_docs(ds, path, fmt="auto")
    if sinks.lance_available():
        assert fmt == "lance" and sinks.is_lance_dir(path)
    else:
        assert fmt == "parquet"
        import glob

        assert glob.glob(path + "/*.parquet")
    back = sinks.read_docs(path).to_pandas().sort_values("doc_id")
    assert back["doc_id"].tolist() == [1, 2, 3]
    # span-sequence equality survives the round trip (kind, text,
    # media_ref, order) — the north-rule per-row invariant
    s0 = back["spans"].iloc[0]
    assert s0[0]["kind"] == "text" and s0[0]["text"] == "a"
    s2 = back["spans"].iloc[2]
    assert s2[0]["media_ref"] == "m://x"


def test_sink_lance_explicit_requires_package():
    from spatula_ray import sinks

    if sinks.lance_available():
        pytest.skip("lance installed — explicit lance path is the real one")
    with pytest.raises(RuntimeError):
        sinks.resolve_format("lance")
    assert sinks.resolve_format("auto") == "parquet"
    with pytest.raises(ValueError):
        sinks.resolve_format("orc")
