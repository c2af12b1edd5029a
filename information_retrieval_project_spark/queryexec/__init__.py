from .bm25 import bm25_scores, bm25_topk, query_terms_df, topk  # noqa: F401
from .tfidf import tfidf_cosine_topk, tfidf_weights  # noqa: F401
from .wand import bm25_topk_compressed, wand_topk  # noqa: F401
