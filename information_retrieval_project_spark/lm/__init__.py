from .language_models import (  # noqa: F401
    collection_lm,
    doc_lms,
    jelinek_mercer_scores,
    laplace_scores,
    param_grid_search,
    perplexity,
    skipgram_pairs,
)
from .expansion import ppmi_triples, query_expansion, top_cooccurring  # noqa: F401
