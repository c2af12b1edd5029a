from .ann import (  # noqa: F401
    brute_force_cosine_topk,
    ivf_assign,
    ivf_topk,
    ivf_train_centroids,
    lsh_bucketed_topk,
    rp_lsh_buckets,
)
