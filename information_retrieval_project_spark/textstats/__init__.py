from .textstats import (  # noqa: F401
    doc_fingerprints,
    language_id,
    quality_scores,
    token_counts,
)
