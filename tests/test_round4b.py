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


# -- DSIR importance resampling ------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_dsir_ranks_target_like_docs_first():
    from spatula_ray.stages.curate import dsir_select

    target = _docs_ds([
        (100, "cats purr softly on warm rugs"),
        (101, "cats chase yarn and purr at night"),
        (102, "warm cats sleep and purr on rugs"),
    ])
    raw = _docs_ds([
        (1, "cats purr on rugs at night"),            # target-like
        (2, "cats sleep on warm rugs and purr"),      # target-like
        (3, "quarterly revenue grew nine percent"),   # off-domain
        (4, "the compiler emits llvm bitcode"),       # off-domain
    ])
    out = dsir_select(raw, target, n=2).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [1, 2]
    # weights of the selected docs strictly beat the off-domain ones
    all4 = dsir_select(raw, target, n=4).to_pandas() \
        .set_index("doc_id")["logw_micro"]
    assert min(all4[1], all4[2]) > max(all4[3], all4[4])


@pytest.mark.usefixtures("ray_session")
def test_dsir_select_is_partitioning_invariant():
    from spatula_ray.stages.curate import dsir_select

    target = _docs_ds([(100 + i, f"tok{i} alpha beta") for i in range(5)])
    rows = [(i, f"alpha beta tok{i % 7} gamma delta word{i}")
            for i in range(40)]
    a = dsir_select(_docs_ds(rows), target, n=10).to_pandas()
    b = dsir_select(_docs_ds(rows).repartition(7), target, n=10).to_pandas()
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_pmi_finds_planted_collocation():
    from spatula_ray.stages.curate import pmi_top_pairs

    # "hong kong" always co-occurs; "the" pairs with everything
    rows = [(i, "the hong kong office called the office") for i in range(5)]
    rows += [(100 + i, "the office saw the report") for i in range(5)]
    out = pmi_top_pairs(_docs_ds(rows), k=3, min_count=5).to_pandas()
    assert (out.iloc[0]["w1"], out.iloc[0]["w2"]) == ("hong", "kong")
    assert out.iloc[0]["pair_count"] == 5
    # PMI is monotone down the returned list
    assert (np.diff(out["pmi"].to_numpy()) <= 0).all()


# -- BPE trainer -----------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_bpe_learns_planted_merges_greedily():
    from spatula_ray.stages.bpe import bpe_merges

    # 'aaaa' x freq: greedy left-to-right means (a,a) pairs count
    # non-overlapping runs correctly and the second merge sees 'aa aa'
    rows = [(1, "aaaa aaaa aaaa"), (2, "aaaa xy xy xy xy")]
    out = bpe_merges(_docs_ds(rows), n_merges=3).to_pandas()
    assert list(out["step"]) == [1, 2, 3]
    # step 1: (a,a) appears 3 per 'aaaa' x 4 words = 12 > (x,y) = 4
    assert (out.iloc[0]["lhs"], out.iloc[0]["rhs"]) == ("a", "a")
    assert out.iloc[0]["pair_count"] == 12
    # after greedy application 'aaaa' -> ['aa','aa']: (aa,aa) = 4 = (x,y);
    # tie broken lexicographically -> ('aa','aa')
    assert (out.iloc[1]["lhs"], out.iloc[1]["rhs"]) == ("aa", "aa")
    assert out.iloc[1]["pair_count"] == 4
    assert (out.iloc[2]["lhs"], out.iloc[2]["rhs"]) == ("x", "y")


@pytest.mark.usefixtures("ray_session")
def test_bpe_is_partitioning_invariant():
    from spatula_ray.stages.bpe import bpe_merges

    rows = [(i, f"banana bandana ban{i % 3}") for i in range(30)]
    a = bpe_merges(_docs_ds(rows), n_merges=5).to_pandas()
    b = bpe_merges(_docs_ds(rows).repartition(7), n_merges=5).to_pandas()
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_bpe_token_counts_under_learned_merges():
    from spatula_ray.stages.bpe import bpe_token_counts

    # 1 merge learns (a,a); greedy encode: 'aa'->1 token, 'aaa'->2
    rows = [(1, "aa aa b"), (2, "aaa"), (3, "")]
    out = bpe_token_counts(_docs_ds(rows), n_merges=1).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1, "n_words"] == 3 and out.loc[1, "n_tokens"] == 3
    assert out.loc[2, "n_words"] == 1 and out.loc[2, "n_tokens"] == 2
    assert 3 not in out.index                   # no-word doc absent


# -- Gopher quality rules --------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_gopher_rules_flags():
    from spatula_ray.stages.text import gopher_rules

    good = " ".join(["the"] + ["word"] * 30 + ["with", "that"]
                    + ["term"] * 20)                     # 53 words, all rules pass
    rows = [
        (1, good),
        (2, "short doc with the that"),                  # < 50 words
        (3, good + " " + "#" * 1 + " ##### ####"),       # 10 '#' on 56 words: symbol fail
        (4, "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j\nthe with "
            + " ".join(["w"] * 60)),                     # 10/11 bullet lines: bullet fail
        (5, ""),                                         # no words: absent
    ]
    out = gopher_rules(_docs_ds(rows)).to_pandas().set_index("doc_id")
    assert bool(out.loc[1, "keep"])
    assert not bool(out.loc[2, "words_ok"]) and not bool(out.loc[2, "keep"])
    assert not bool(out.loc[3, "symbol_ok"])
    assert not bool(out.loc[4, "bullet_ok"])
    assert 5 not in out.index
    # mean word length micro-units: round-half-up integer arithmetic
    nw, nc = out.loc[1, "n_words"], sum(len(w) for w in good.split(" "))
    assert out.loc[1, "mean_wl_micro"] == (nc * 2_000_000 + nw) // (2 * nw)


# -- WAV audio features ----------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_audio_features_decodes_real_wav():
    import io
    import wave

    import ray.data as rd

    from spatula_ray.stages.multimodal import (
        AUDIO_RATE,
        audio_features,
        synth_wav,
    )

    # the blob is a genuine RIFF container stdlib wave can read back
    blob = synth_wav(7)
    with wave.open(io.BytesIO(blob), "rb") as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) \
            == (1, 2, AUDIO_RATE)
        n = w.getnframes()
    assert n == 800 + (7 % 5) * 80

    # hand-built square wave: +1000 x4, -1000 x4, repeated 100x
    sq = np.tile(np.r_[np.full(4, 1000), np.full(4, -1000)], 100)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(8000)
        w.writeframes(sq.astype("<i2").tobytes())
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "wav": pa.array([buf.getvalue()], type=pa.binary()),
    }))
    out = audio_features(ds).to_pandas().iloc[0]
    assert out["n_samples"] == 800
    assert out["duration_us"] == 100_000
    assert out["sum_amp"] == 0
    assert out["sum_sq"] == 800 * 1000 * 1000
    assert out["peak"] == 1000
    assert out["zero_crossings"] == 199       # 2 per period x100 - 1


# -- Image dHash over real PNG decode ---------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_image_dhash_known_gradients():
    import ray.data as rd

    from spatula_ray.stages.multimodal import encode_png, image_dhash

    # strictly increasing-x gradient: every right block sum exceeds the
    # left -> all bits 0; reversed gradient -> all bits 1
    inc = np.tile(np.arange(36, dtype=np.uint8) * 7, (32, 1))
    dec = inc[:, ::-1].copy()
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "png": pa.array([encode_png(inc), encode_png(dec)],
                        type=pa.binary()),
    }))
    out = image_dhash(ds).to_pandas().set_index("doc_id")
    assert (out.loc[1, "dhash_hi"], out.loc[1, "dhash_lo"]) == (0, 0)
    assert (out.loc[2, "dhash_hi"], out.loc[2, "dhash_lo"]) \
        == (2**32 - 1, 2**32 - 1)
    assert (out["width"] == 36).all() and (out["height"] == 32).all()


@pytest.mark.usefixtures("ray_session")
def test_image_dup_groups_elects_min_rep():
    import ray.data as rd

    from spatula_ray.stages.multimodal import image_dup_groups, synth_png

    # doc ids 5, 102, 199 share seed 5 (mod 97) -> identical images;
    # 7 stands alone
    ids = [5, 7, 102, 199]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "png": pa.array([synth_png(d) for d in ids], type=pa.binary()),
    }))
    out = image_dup_groups(ds).to_pandas().sort_values(
        ["rep", "doc_id"]).reset_index(drop=True)
    assert list(out["rep"]) == [5, 5]
    assert list(out["doc_id"]) == [102, 199]


# -- APNG video frame sampling -----------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_video_frame_dhash_samples_and_matches_stills():
    import ray.data as rd

    from spatula_ray.stages.multimodal import (
        decode_apng,
        image_dhash,
        synth_apng,
        synth_png,
        video_frame_dhash,
    )

    # doc 6 -> 6 frames; stride 2 samples frames 0, 2, 4
    blob = synth_apng(6)
    w, h, delays, frames = decode_apng(blob)
    assert (w, h, len(frames)) == (36, 32, 6)
    assert all(d == (4, 100) for d in delays)

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([6], type=pa.int64()),
        "video": pa.array([blob], type=pa.binary()),
    }))
    out = video_frame_dhash(ds, stride=2).to_pandas() \
        .sort_values("frame_idx").reset_index(drop=True)
    assert list(out["frame_idx"]) == [0, 2, 4]
    assert (out["n_frames"] == 6).all()
    assert (out["duration_ms"] == 240).all()

    # frame 0 is pixel-identical to the still synth_png image of the same
    # seed, so its fingerprint must equal the image path's
    still = image_dhash(rd.from_arrow(pa.table({
        "doc_id": pa.array([6], type=pa.int64()),
        "png": pa.array([synth_png(6)], type=pa.binary()),
    }))).to_pandas().iloc[0]
    assert out.loc[0, "dhash_hi"] == still["dhash_hi"]
    assert out.loc[0, "dhash_lo"] == still["dhash_lo"]


def _span_ds(rows):
    """rows: (doc_id, seq, kind, text, media_bytes|None)"""
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "seq": pa.array([r[1] for r in rows], type=pa.int64()),
        "kind": pa.array([r[2] for r in rows], type=pa.string()),
        "text": pa.array([r[3] for r in rows], type=pa.string()),
        "media": pa.array([r[4] for r in rows], type=pa.binary()),
    }))


@pytest.mark.usefixtures("ray_session")
def test_interleaved_dedup_groups_and_order_sensitivity():
    from spatula_ray.stages.dedup import interleaved_fingerprint_dedup

    img_a, img_b = b"\x01\x02pixels", b"\x99\x98other"
    rows = [
        # doc 1 and doc 2: identical interleaved sequences -> one group
        (1, 0, "text", "hello world", None), (1, 1, "image", None, img_a),
        (2, 0, "text", "hello world", None), (2, 1, "image", None, img_a),
        # doc 3: same spans as 1 but REVERSED order -> distinct
        (3, 0, "image", None, img_a), (3, 1, "text", "hello world", None),
        # doc 4: same text as 1 but different media bytes -> distinct
        (4, 0, "text", "hello world", None), (4, 1, "image", None, img_b),
    ]
    out = interleaved_fingerprint_dedup(_span_ds(rows)).to_pandas() \
        .set_index("doc_id").sort_index()

    assert len(out) == 4
    assert out.loc[1, "fingerprint"] == out.loc[2, "fingerprint"]
    assert bool(out.loc[1, "is_dup"]) and bool(out.loc[2, "is_dup"])
    assert out.loc[1, "group_size"] == out.loc[2, "group_size"] == 2
    assert out.loc[2, "rep_id"] == 1                  # min-id representative
    assert out.loc[3, "fingerprint"] != out.loc[1, "fingerprint"]
    assert not bool(out.loc[3, "is_dup"])
    assert out.loc[4, "fingerprint"] != out.loc[1, "fingerprint"]
    assert out.loc[4, "group_size"] == 1 and out.loc[4, "rep_id"] == 4


@pytest.mark.usefixtures("ray_session")
def test_interleaved_dedup_seq_order_not_row_order():
    """Fingerprints follow the seq column, not row arrival order: the
    same doc with its span rows shuffled hashes identically."""
    from spatula_ray.stages.dedup import interleaved_fingerprint_dedup

    img = b"\xaa\xbb"
    ordered = [(1, 0, "text", "a b c", None), (1, 1, "image", None, img),
               (1, 2, "text", "tail", None)]
    shuffled = [(2, 2, "text", "tail", None), (2, 0, "text", "a b c", None),
                (2, 1, "image", None, img)]
    out = interleaved_fingerprint_dedup(_span_ds(ordered + shuffled)) \
        .to_pandas().set_index("doc_id")
    assert out.loc[1, "fingerprint"] == out.loc[2, "fingerprint"]
    assert out.loc[1, "group_size"] == 2


@pytest.mark.usefixtures("ray_session")
def test_knn_graph_within_cell_exact_neighbors():
    """Two tight clusters far apart: with enough cells they separate,
    and each node's neighbors are exactly its own cluster mates ranked
    by integer dot (ties -> lower id)."""
    import ray.data as rd

    from spatula_ray.stages.similarity import knn_graph

    base_a, base_b = np.array([10.0, 0.0, 0.0]), np.array([0.0, 10.0, 0.0])
    rows = []
    for i in range(4):
        rows.append((i, (base_a + i * 0.01).tolist()))          # cluster A
    for i in range(4, 8):
        rows.append((i, (base_b + (i - 4) * 0.01).tolist()))    # cluster B
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "embedding": pa.array([r[1] for r in rows],
                              type=pa.list_(pa.float64())),
    }))
    out = knn_graph(ds, k=3, n_cells=2, sample=8, iters=3).to_pandas()

    # every node gets min(k, cell_size-1) = 3 neighbors, all in-cluster
    assert len(out) == 8 * 3
    for vid, grp in out.groupby("vec_id"):
        mates = {0, 1, 2, 3} if vid < 4 else {4, 5, 6, 7}
        assert set(grp["neighbor_id"]) == mates - {vid}
        assert sorted(grp["nn_rank"]) == [1, 2, 3]
        # ranks follow dot desc with lower-id tie-break
        g = grp.sort_values("nn_rank")
        dots = g["dot"].to_numpy()
        assert (dots[:-1] >= dots[1:]).all()
        ties = dots[:-1] == dots[1:]
        nbrs = g["neighbor_id"].to_numpy()
        assert (nbrs[:-1][ties] < nbrs[1:][ties]).all()


@pytest.mark.usefixtures("ray_session")
def test_knn_graph_singleton_cell_emits_no_edges():
    import ray.data as rd

    from spatula_ray.stages.similarity import knn_graph

    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([7], type=pa.int64()),
        "embedding": pa.array([[1.0, 2.0]], type=pa.list_(pa.float64())),
    }))
    out = knn_graph(ds, k=3, n_cells=1, sample=1, iters=1)
    assert out.count() == 0
    # an all-empty Dataset drops pandas column names; check Arrow schema
    assert out.schema().names == ["vec_id", "neighbor_id", "nn_rank", "dot"]


@pytest.mark.usefixtures("ray_session")
def test_zipf_fit_recovers_planted_power_law():
    """Counts planted as c_r = 720 // r for ranks 1..6: ln(c) vs ln(r)
    is near-perfectly linear with slope -1 (harmonic Zipf), and the
    engine's integer-grid least squares must land within the fit noise
    of the integer division."""
    from spatula_ray.stages.curate import zipf_fit

    # build a corpus whose term counts are exactly 720//r
    docs = []
    for r in range(1, 7):
        docs.extend(["w%d" % r] * (720 // r))
    # one doc per token keeps tokenization trivial
    ds = _docs_ds(list(enumerate(docs)))
    out = zipf_fit(ds, top_v=10).to_pandas()

    assert out.loc[0, "n_terms"] == 6
    slope = out.loc[0, "zipf_slope"]
    assert -1.05 < slope < -0.95
    # exact-grid reproducibility: same formula recomputed locally
    import math
    cnts = sorted([720 // r for r in range(1, 7)], reverse=True)
    li = [int(math.floor(math.log(i + 1) * 1e6 + 0.5)) for i in range(6)]
    ci = [int(math.floor(math.log(c) * 1e6 + 0.5)) for c in cnts]
    n, sx, sy = 6, sum(li), sum(ci)
    sxy = sum(a * b for a, b in zip(li, ci))
    sxx = sum(a * a for a in li)
    exp = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    assert slope == math.floor(exp * 1e6 + 0.5) / 1e6


@pytest.mark.usefixtures("ray_session")
def test_vocab_growth_checkpoints_exact():
    from spatula_ray.stages.curate import vocab_growth

    # doc_id 0..9, each doc i = "t0 t1 ... ti" (i+1 tokens, introduces
    # exactly one new term ti)
    rows = [(i, " ".join("t%d" % j for j in range(i + 1)))
            for i in range(10)]
    out = vocab_growth(_docs_ds(rows), n_checkpoints=5).to_pandas()

    assert list(out["checkpoint"]) == [1, 2, 3, 4, 5]
    # thresholds: ((k*10)//5)-1 = 1, 3, 5, 7, 9
    assert list(out["doc_id_thr"]) == [1, 3, 5, 7, 9]
    # cumulative tokens: sum_{i<=thr}(i+1)
    assert list(out["n_tokens"]) == [3, 10, 21, 36, 55]
    # vocab at thr = thr+1 distinct terms
    assert list(out["vocab"]) == [2, 4, 6, 8, 10]


@pytest.mark.usefixtures("ray_session")
def test_interleaved_neardup_media_swap_lowers_jaccard():
    """Same text, swapped image: the pair survives only because text
    grams dominate, but its jaccard is strictly below the identical-
    media pair's; a text rewrite with shared media falls out entirely."""
    from spatula_ray.stages.dedup import interleaved_neardup_pairs

    text = " ".join("w%d" % i for i in range(20))
    img_a, img_b = b"blob-a", b"blob-b"
    rows = [
        (1, 0, "text", text, None), (1, 1, "image", None, img_a),
        (2, 0, "text", text, None), (2, 1, "image", None, img_a),  # = 1
        (3, 0, "text", text, None), (3, 1, "image", None, img_b),  # swap
        (4, 0, "text", "completely different words here now", None),
        (4, 1, "image", None, img_a),                              # text rw
    ]
    out = interleaved_neardup_pairs(_span_ds(rows), threshold=0.5,
                                    k_shingle=3).to_pandas() \
        .set_index(["a", "b"]).sort_index()

    assert out.loc[(1, 2), "jaccard"] == 1.0        # identical sequences
    j_swap = out.loc[(1, 3), "jaccard"]
    assert 0.5 <= j_swap < 1.0                      # image swap costs J
    assert (1, 4) not in out.index                  # text rewrite: out
    # exact value: 18 shared grams / union of 19+19-18 = 20 units
    assert j_swap == np.floor(18 / 20 * 1e6 + 0.5) / 1e6
