"""Oracle parity for the queries whose DuckDB mirrors are new in round 2
(langid, winnowing, simhash, minhash-verified, LSH ANN): run the Ray
pipeline and the oracle SQL side-by-side at sf0.001 and compare rows /
columns / order-insensitive values — the same contract as the driver's
correctness gate. Plus the hot-shingle df-cap behavior (round-1 fix #9)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"

NEW_ORACLE_QUERIES = ["langid_pred", "winnow_fingerprints",
                      "simhash_dup_pairs", "minhash_dup_pairs",
                      "lsh_ann_topk", "media_features", "ivf_ann_topk",
                      # round-3 curation layer
                      "repetition_stats", "hash_sample", "pack_sequences",
                      "dup_clusters", "tfidf_top_terms",
                      "decontaminate", "mix_head", "cap_per_source",
                      "dedup_representatives",
                      "purchase_attribution", "value_quantiles",
                      "events_3h_sliding", "new_docs", "props_k_stats",
                      # round-3b: chunking / vocab / quantization / strata
                      "chunk_documents", "vocab_coverage",
                      "quantize_embeddings", "stratified_sample",
                      "crawl_span_stats", "epoch_shuffle",
                      # round-3c: joins / quantiles / sketches / graph /
                      # funnel analytics / df scrub
                      "purchase_followups", "value_quantiles_global",
                      "strip_boilerplate", "distinct_shingles_hll",
                      "event_users_hll", "doc_pagerank", "event_funnel",
                      "retention_cohorts", "docs_above_median_quality",
                      "pack_interleaved", "decontaminate_sharded",
                      "quality_weighted_sample",
                      # round-4: end-to-end curation composition + new
                      # sketch/filter operators
                      "curate_corpus", "heavy_hitters",
                      "bloom_decontaminate",
                      # round-4b: substring-span dedup + LM quality score
                      # + semantic dedup
                      "dedup_spans", "lm_nll", "semdedup",
                      # round-4c: DSIR importance resampling + PMI
                      # + distributed BPE trainer
                      "dsir_select", "pmi_top_pairs", "bpe_merges",
                      "bpe_token_counts", "gopher_rules",
                      "audio_features", "image_dhash",
                      "image_dup_groups",
                      "video_frame_dhash",
                      # round-4d: interleaved span-sequence dedup +
                      # cell-bounded exact k-NN graph
                      "interleaved_dedup", "knn_graph", "zipf_fit",
                      "vocab_growth", "corpus_report", "filter_ensemble",
                      "tokenizer_fertility", "interleaved_neardup",
                      # round-4e: directed containment, interleaved
                      # media->caption alignment, temperature mixing
                      "containment_pairs", "caption_pairs",
                      "temperature_mix", "bm25_topk",
                      "unigram_entropy", "doc_novelty",
                      "media_asset_dedup", "crawl_host_stats",
                      "ann_recall", "main_content", "source_overlap",
                      "span_langid", "cdc_chunks", "cdc_dedup_stats",
                      "cdc_delta_bytes", "interleaved_doc_stats",
                      "url_canonicalize", "exact_substr_coverage",
                      # round-4g: C4 line filters + intra-doc line dedup
                      # + token-budget selection
                      "c4_line_filters", "dedup_within_doc",
                      "token_budget_select", "robots_conformance",
                      "normalize_text", "hashed_linear_score",
                      "resolve_redirects", "sitemap_seeds",
                      "length_batches", "snapshot_diff",
                      "table_profile", "dust_rules",
                      "recrawl_priority", "anchor_topk",
                      "host_link_graph", "doc_hits", "trap_hosts",
                      "robots_rules", "warc_records", "readability",
                      "exact_substr_cut", "host_rank",
                      "minhash_calibration", "canonical_urls",
                      "host_rank_weighted", "shard_manifest",
                      "interleaved_truncate", "cluster_select",
                      "quality_dup_calibration", "host_boilerplate",
                      "reciprocal_edges", "degree_histogram",
                      "hyperball_reach", "rendezvous_shards",
                      "colink_similarity", "textrank_keywords",
                      "sitemap_index",
                      # round-5 session-3: link-spam signal, crawl
                      # planning trio, PQ/IVFADC ANN, CCNet terciles
                      "outlink_diversity", "crawl_budget_allocation",
                      "recrawl_budget", "politeness_budget",
                      "pq_ann_topk", "ivfadc_ann_topk", "ccnet_buckets",
                      "jl_project"]


def _duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", NEW_ORACLE_QUERIES)
def test_oracle_parity(name):
    import __ray_entry__ as entrymod

    res = entrymod.queries()[name](SF)
    got = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    con = _duck(SF)
    want = con.execute(entrymod.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(want.columns)
    g, w = _canon(got), _canon(want)
    assert len(g) == len(w), f"{name}: {len(g)} vs {len(w)} rows"
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if np.issubdtype(np.asarray(gv).dtype, np.floating):
            assert np.allclose(np.asarray(gv, dtype=np.float64),
                               np.asarray(wv, dtype=np.float64),
                               rtol=0, atol=1e-9), f"{name}.{c}"
        else:
            assert (gv == wv).all(), f"{name}.{c}"


def _hot_shingle_ds(n_docs=60):
    import ray.data as rd

    texts = [f"H H H u{i} v{i} w{i}" for i in range(n_docs)]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n_docs), type=pa.int64()),
        "text": pa.array(texts),
    }))


@pytest.mark.usefixtures("ray_session")
def test_jaccard_df_cap_noop_below_cap():
    """With a cap no fixture shingle reaches, output is identical."""
    import ray.data as rd

    from spatula_ray.stages.dedup import exact_jaccard_pairs

    base = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).limit(60)

    def perturb(t):
        ids, texts = [], []
        for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = txt.split(" ")
            toks = ["zz" if (i + 1) % 10 == 0 else w
                    for i, w in enumerate(toks)]
            ids.append(d + 1000)
            texts.append(" ".join(toks))
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "text": pa.array(texts, type=pa.string())})

    aug = base.union(base.map_batches(perturb, batch_format="pyarrow"))
    exact = _canon(exact_jaccard_pairs(aug, threshold=0.5).to_pandas())
    capped = _canon(exact_jaccard_pairs(aug, threshold=0.5,
                                        max_df=10_000).to_pandas())
    pd.testing.assert_frame_equal(exact, capped)


@pytest.mark.usefixtures("ray_session")
def test_jaccard_df_cap_drops_hot_shingle():
    """A stop-shingle shared by all docs produces O(n^2) pairs uncapped;
    the df cap removes it from the inverted index (bounding the bucket)
    and those pairs disappear."""
    from spatula_ray.stages.dedup import exact_jaccard_pairs

    ds = _hot_shingle_ds(60)
    thr = 1.0 / 7.0 - 1e-9  # each pair shares exactly the 1 hot shingle of 7
    uncapped = exact_jaccard_pairs(ds, threshold=thr).to_pandas()
    assert len(uncapped) == 60 * 59 // 2
    capped = exact_jaccard_pairs(ds, threshold=thr, max_df=30).to_pandas()
    assert len(capped) == 0
