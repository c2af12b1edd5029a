from .language_models import (  # noqa: F401
    collection_lm,
    doc_lms,
    jelinek_mercer_scores,
    laplace_scores,
    param_grid_search,
    perplexity,
    skipgram_pairs,
)
from .decomposition import pca_2d, ppmi_svd_factors, svd_cosine_topk  # noqa: F401
from .expansion import ppmi_triples, query_expansion, top_cooccurring  # noqa: F401
