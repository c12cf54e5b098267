"""meilisearch_thai_spark — a PySpark-native Thai full-text search engine.

A from-scratch rebuild of the query/data semantics of the reference stack
certogo-tech/meilisearch-thai (FastAPI Thai tokenizer + MeiliSearch proxy),
re-expressed Spark-first:

- newmm-style dictionary maximal-matching Thai segmentation as vectorized
  pandas/Arrow UDFs (reference contract: src/tokenizer/thai_segmenter.py),
- ZWSP word-boundary normalization (src/tokenizer/token_processor.py),
- a native distributed inverted index (posting lists, delta+varbyte blocks,
  per-block max-score) — the part the reference delegates to MeiliSearch,
- BM25 top-k query execution with query-variant generation, weighting,
  dedup and re-ranking parity (src/search_proxy/services/*).
"""

__version__ = "0.1.0"
