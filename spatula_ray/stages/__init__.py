"""Training-data pipeline stages beyond the reference's own operators:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search (brute-force / LSH / IVF ANN), text analysis, curation
(sampling, packing, dedup clustering, decontamination, boilerplate scrub),
multimodal plumbing, portable joins (hash-bucket / broadcast / anti /
as-of / range), exact distributed quantiles, and cardinality sketching.
All are Ray-Data-first: vectorized map_batches bodies, actor pools where
state is loaded once, explicit shuffle keys."""
