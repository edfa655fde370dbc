"""Round-4e operators: directed containment pairs, interleaved
media->caption alignment, temperature source mixing. Unit-level edge
cases here; full DuckDB oracle parity lives in test_oracles.py."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl: pa.Table):
    import ray.data as rd

    return rd.from_arrow(tbl)


@pytest.mark.usefixtures("ray_session")
def test_containment_directed_asymmetry():
    """A short doc pasted into a longer one: containment short->long is
    1.0 (emitted), long->short is below threshold (not emitted)."""
    from spatula_ray.stages.dedup import containment_pairs

    short = "a b c d e f"
    long = short + " " + " ".join(f"x{i}" for i in range(40))
    out = containment_pairs(
        _ds(pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                      "text": pa.array([short, long])})),
        threshold=0.9, k_shingle=3).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["src"], row["dst"]) == (1, 2)
    assert row["containment"] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_containment_both_directions_for_exact_dup():
    from spatula_ray.stages.dedup import containment_pairs

    t = "w1 w2 w3 w4 w5 w6 w7"
    out = containment_pairs(
        _ds(pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                      "text": pa.array([t, t])})),
        threshold=0.9).to_pandas().sort_values("src")
    assert len(out) == 2
    assert out["containment"].tolist() == [1.0, 1.0]
    assert set(zip(out["src"], out["dst"])) == {(1, 2), (2, 1)}


def _span_tbl(rows):
    ids, seqs, kinds, texts, refs = zip(*rows)
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "seq": pa.array(seqs, type=pa.int64()),
        "kind": pa.array(kinds, type=pa.string()),
        "text": pa.array(texts, type=pa.string()),
        "media_ref": pa.array(refs, type=pa.string()),
    })


@pytest.mark.usefixtures("ray_session")
def test_caption_after_before_none():
    """Three docs: inline media (caption follows), trailing media
    (falls back to preceding text), all-media doc (side='none')."""
    from spatula_ray.stages.multimodal import caption_pairs

    rows = [
        # doc 1: text, image, text -> caption is the following text
        (1, 0, "text", "intro para", None),
        (1, 1, "image", None, "m/1.png"),
        (1, 2, "text", "caption para", None),
        # doc 2: text, trailing image -> falls back to preceding text
        (2, 0, "text", "only para", None),
        (2, 1, "image", None, "m/2.png"),
        # doc 3: media-only document -> side none, cap_seq -1
        (3, 0, "image", None, "m/3.png"),
    ]
    out = caption_pairs(_ds(_span_tbl(rows))).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["side"].tolist() == ["after", "before", "none"]
    assert out["cap_seq"].tolist() == [2, 0, -1]
    assert out["caption"].tolist()[:2] == ["caption para", "only para"]
    assert pd.isna(out["caption"].iloc[2])


@pytest.mark.usefixtures("ray_session")
def test_caption_doc_spans_cross_blocks():
    """A document's spans split across input blocks must still pair —
    the hash-bucket shuffle is what guarantees co-location."""
    import ray.data as rd

    from spatula_ray.stages.multimodal import caption_pairs

    a = _span_tbl([(7, 0, "text", "early", None),
                   (7, 3, "image", None, "m/7.png")])
    b = _span_tbl([(7, 4, "text", "late caption", None)])
    ds = rd.from_arrow(a).union(rd.from_arrow(b))
    out = caption_pairs(ds).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["caption"] == "late caption"
    assert out.iloc[0]["side"] == "after"


@pytest.mark.usefixtures("ray_session")
def test_temperature_mix_rates_monotone():
    """Smaller sources get strictly higher acceptance rates; global
    output is ~half the corpus; acceptance is the deterministic Knuth
    bucket (parallelism-invariant)."""
    from spatula_ray.stages.curate import temperature_mix

    n = 400
    ids = np.arange(n, dtype=np.int64)
    src = np.where(ids % 10 < 8, "big", "small")
    out = temperature_mix(
        _ds(pa.table({"doc_id": pa.array(ids),
                      "source": pa.array(src.astype(object),
                                         type=pa.string())}))).to_pandas()
    rates = out.groupby("source")["rate_micro"].first()
    assert rates["small"] > rates["big"]
    assert (out["mix_key"] < out["rate_micro"]).all()
    # expected count = sum over rows of indicator; rate calibration
    # targets ~n/2 in expectation over the hash buckets
    assert 0.3 * n < len(out) < 0.7 * n


@pytest.mark.usefixtures("ray_session")
def test_bm25_prefers_dense_short_docs():
    """Classic BM25 behavior: for the same tf, shorter docs score
    higher (length normalization); higher tf scores higher at the same
    length. Query terms are the corpus's own top-3."""
    from spatula_ray.stages.curate import bm25_topk

    filler = lambda i, n: " ".join(f"f{i}_{j}" for j in range(n))  # noqa: E731
    docs = {
        1: "hot hot " + filler(1, 4),      # tf=2, short
        2: "hot hot " + filler(2, 40),     # tf=2, long
        3: "hot " + filler(3, 4),          # tf=1, short
        4: filler(4, 6),                   # no query term
    }
    out = bm25_topk(
        _ds(pa.table({"doc_id": pa.array(sorted(docs), type=pa.int64()),
                      "text": pa.array([docs[k] for k in sorted(docs)])})),
        n_query_terms=1, k=10).to_pandas()
    assert out["doc_id"].tolist()[:3] == [1, 2, 3] or \
        out["doc_id"].tolist()[:3] == [1, 3, 2]
    s = dict(zip(out["doc_id"], out["score"]))
    assert s[1] > s[2] and s[1] > s[3]     # dense+short beats both
    assert 4 not in s                      # no-term docs excluded


@pytest.mark.usefixtures("ray_session")
def test_unigram_entropy_uniform_vs_degenerate():
    """A language whose tokens are all distinct hits ln(N) (maximum
    entropy); a language repeating one token has exactly 0."""
    import math

    from spatula_ray.stages.curate import unigram_entropy

    uni = " ".join(f"u{i}" for i in range(16))   # 16 distinct tokens
    deg = " ".join(["same"] * 16)                # 1 token repeated
    out = unigram_entropy(_ds(pa.table({
        "lang": pa.array(["uni", "deg"]),
        "text": pa.array([uni, deg])}))).set_index("lang")
    assert out.loc["deg", "entropy_micro"] == 0
    assert out.loc["uni", "entropy_micro"] == \
        math.floor(math.log(16) * 1e6 + 0.5)
    assert out["n_tokens"].tolist() == [16, 16]


@pytest.mark.usefixtures("ray_session")
def test_doc_novelty_extremes():
    """A doc sharing no shingles scores 1e6; an exact duplicate pair
    scores 0 (every shingle has df=2); a half-shared doc in between."""
    from spatula_ray.stages.dedup import doc_novelty

    docs = {
        1: "a b c d e",          # shared with doc 2 (exact copy)
        2: "a b c d e",
        3: "p q r s t",          # fully unique
        4: "a b c z9 y8 x7",     # mixes shared and unique shingles
    }
    out = doc_novelty(_ds(pa.table({
        "doc_id": pa.array(sorted(docs), type=pa.int64()),
        "text": pa.array([docs[k] for k in sorted(docs)])}))) \
        .to_pandas().set_index("doc_id").sort_index()
    assert out.loc[1, "novelty_micro"] == 0
    assert out.loc[2, "novelty_micro"] == 0
    assert out.loc[3, "novelty_micro"] == 1_000_000
    # doc 4: shingles {a b c, b c z9, c z9 y8, z9 y8 x7}; only 'a b c'
    # also appears in docs 1/2 -> 3 of 4 novel
    assert out.loc[4, "novelty_micro"] == 750_000


@pytest.mark.usefixtures("ray_session")
def test_main_content_link_density():
    """The extractor picks the prose block, not the link farm — even
    when the link farm has MORE total text — and scores links inside
    the winning block negatively."""
    from spatula_ray.stages.text import extract_main_content

    html = ("<html><body>"
            '<nav><a href="/1">one very long navigation label</a>'
            '<a href="/2">another very long navigation label</a></nav>'
            "<article><p>short real prose</p>"
            '<a href="/x">more</a></article>'
            "</body></html>")
    out = extract_main_content(_ds(pa.table({
        "doc_id": pa.array([7], type=pa.int64()),
        "html": pa.array([html])}))).to_pandas()
    assert out.iloc[0]["main_text"] == "short real prose more"
    # score = len('short real prose') - len('more') = 16 - 4
    assert out.iloc[0]["score"] == 12


@pytest.mark.usefixtures("ray_session")
def test_temperature_mix_rejects_other_alpha():
    from spatula_ray.stages.curate import temperature_mix

    with pytest.raises(ValueError):
        temperature_mix(_ds(pa.table({"doc_id": pa.array([1]),
                                      "source": pa.array(["a"])})),
                        temperature=0.3)


@pytest.mark.usefixtures("ray_session")
def test_cdc_chunks_shift_invariance():
    """The CDC property: prepending a prefix re-chunks only the
    neighborhood of the edit — chunk hashes strictly after the first
    content-defined cut following the edit are IDENTICAL in both
    versions (fixed-stride chunking shares none)."""
    from spatula_ray.stages.curate import cdc_chunks

    rng = np.random.default_rng(7)
    base = " ".join("w%03d" % v for v in rng.integers(0, 80, size=400))
    shifted = "INSERTED PREFIX !! " + base
    out = cdc_chunks(_ds(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array([base, shifted])}))).to_pandas()
    a = out[out.doc_id == 1].sort_values("chunk_seq")
    b = out[out.doc_id == 2].sort_values("chunk_seq")
    # every original chunk must be covered and starts are 1-based
    for g in (a, b):
        assert int(g["start"].iloc[0]) == 1
        assert (g["start"] + g["length"]).iloc[-1] - 1 == \
            (len(base) if g is a else len(shifted))
        assert (g["start"].to_numpy()[1:]
                == (g["start"] + g["length"]).to_numpy()[:-1]).all()
        assert g["length"].max() <= 128
    shared = set(a["chunk_hash"]) & set(b["chunk_hash"])
    # all but the first few boundary-adjacent chunks realign
    assert len(shared) >= len(a) - 3


@pytest.mark.usefixtures("ray_session")
def test_cdc_chunks_edges():
    from spatula_ray.stages.curate import cdc_chunks

    out = cdc_chunks(_ds(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["", "ab", None])}))).to_pandas()
    # empty/None emit nothing; sub-window text is one whole chunk
    assert out["doc_id"].tolist() == [2]
    assert out.iloc[0]["start"] == 1 and out.iloc[0]["length"] == 2
    with pytest.raises(ValueError):
        cdc_chunks(None, divisor=0)


@pytest.mark.usefixtures("ray_session")
def test_cdc_delta_bytes_extremes():
    from spatula_ray.stages.curate import cdc_delta_bytes

    rng = np.random.default_rng(11)
    corpus_text = " ".join("w%03d" % v
                           for v in rng.integers(0, 80, size=300))
    novel_text = " ".join("z%03d" % v
                          for v in rng.integers(0, 80, size=300))
    corpus = _ds(pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "text": pa.array([corpus_text])}))
    new = _ds(pa.table({
        "doc_id": pa.array([10, 11], type=pa.int64()),
        "text": pa.array([corpus_text, novel_text])}))
    out = cdc_delta_bytes(corpus, new).to_pandas().set_index("doc_id")
    # an exact re-ingest adds nothing; disjoint vocabulary adds all
    assert out.loc[10, "new_chars"] == 0
    assert out.loc[10, "pct_new_micro"] == 0
    assert out.loc[11, "new_chars"] == out.loc[11, "total_chars"] \
        == len(novel_text)
    assert out.loc[11, "pct_new_micro"] == 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_interleaved_doc_stats_branches():
    """Branches the caption fixture never hits: a media-LEADING doc, a
    text-only doc (chars_per_media_micro = -1), and cross-block partial
    merging (repartition forces doc 1's spans into separate blocks)."""
    from spatula_ray.stages.multimodal import interleaved_doc_stats

    spans = pa.table({
        "doc_id": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
        "seq": pa.array([0, 1, 2, 0, 1], type=pa.int64()),
        "kind": pa.array(["image", "text", "image", "text", "text"]),
        "text": pa.array([None, "five chars x", None, "abc", "de"]),
        "media_ref": pa.array(["m/a", None, "m/b", None, None]),
    })
    out = interleaved_doc_stats(_ds(spans).repartition(3)) \
        .to_pandas().set_index("doc_id").sort_index()
    assert out.loc[1].tolist() == [3, 1, 2, 12, 6_000_000, 1, 1]
    assert out.loc[2].tolist() == [2, 2, 0, 5, -1, 0, 0]


@pytest.mark.usefixtures("ray_session")
def test_substring_dup_coverage():
    """Positional ExactSubstr coverage: exact copies 100%, unique docs
    0%, partial sharing covers exactly the interval union of duplicated
    windows, within-doc repetition counts, short docs (<k words) form
    one whole-doc window."""
    from spatula_ray.stages.dedup import substring_dup_coverage

    docs = {
        1: "a b c d e f g h i j",              # exact copy of 2
        2: "a b c d e f g h i j",
        3: "p0 p1 p2 p3 p4 p5 p6 p7 p8 p9",    # fully unique
        4: "u1 u2 s1 s2 s3 s4 s5 s6 u3 u4",    # shares run s1..s6 w/ 5
        5: "s1 s2 s3 s4 s5 s6 v1 v2 v3 v4",
        6: "r1 r2 r3 r4 r5 x r1 r2 r3 r4 r5",  # within-doc repeat
        7: "a b c",                            # short, copy of 8
        8: "a b c",
        9: "z z",                              # short, unique
    }
    out = substring_dup_coverage(_ds(pa.table({
        "doc_id": pa.array(sorted(docs), type=pa.int64()),
        "text": pa.array([docs[k] for k in sorted(docs)])})), k=5) \
        .to_pandas().set_index("doc_id").sort_index()
    assert out["n_words"].tolist() == [10, 10, 10, 10, 10, 11, 3, 3, 2]
    assert out.loc[1, "coverage_micro"] == 1_000_000
    assert out.loc[2, "coverage_micro"] == 1_000_000
    assert out.loc[3, "coverage_micro"] == 0
    # docs 4/5: dup windows are the two 5-grams inside the shared
    # 6-word run -> union covers exactly 6 of 10 words
    assert out.loc[4, "covered_words"] == 6
    assert out.loc[4, "coverage_micro"] == 600_000
    assert out.loc[5, "covered_words"] == 6
    # doc 6: 'r1..r5' appears at pos 0 and 6 -> [0,5) + [6,11) = 10/11
    assert out.loc[6, "covered_words"] == 10
    assert out.loc[6, "coverage_micro"] == 10 * 1_000_000 // 11
    # short docs: whole-doc window
    assert out.loc[7, "coverage_micro"] == 1_000_000
    assert out.loc[8, "coverage_micro"] == 1_000_000
    assert out.loc[9, "coverage_micro"] == 0
