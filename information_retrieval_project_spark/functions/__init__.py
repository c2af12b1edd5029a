from .textnorm import (  # noqa: F401
    STOPWORDS,
    clean_normalize,
    normalize_tokenize,
    porter_stem,
    tokenize,
)
