from .ann import brute_force_cosine_topk, lsh_bucketed_topk, rp_lsh_buckets  # noqa: F401
