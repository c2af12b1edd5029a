from .oracle import oracle_bm25_topk, oracle_tfidf_cosine_topk, oracle_tf  # noqa: F401
