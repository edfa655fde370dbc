"""End-to-end pipelines: the flagship doc-web crawl and the relational /
events demonstrations used by the correctness gate (__ray_entry__)."""
