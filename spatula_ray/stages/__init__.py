"""Training-data pipeline stages beyond the reference's own operators:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search, text analysis, multimodal plumbing, and a portable
hash-bucket join. All are Ray-Data-first: vectorized map_batches bodies,
actor pools where state is loaded once, explicit shuffle keys."""
