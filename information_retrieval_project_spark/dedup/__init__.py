from .clusters import connected_components  # noqa: F401
from .dedup import (  # noqa: F401
    bucket_cap_stats,
    cap_buckets,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash64,
    simhash_near_dup_pairs,
)
