"""Vector similarity: brute-force cosine top-k baseline (queries.py),
LSH-bucketed ANN, and IVF (coarse-quantizer cells + nprobe search) scale
paths."""

from .ann import (  # noqa: F401
    ann_lsh_pairs,
    collect_centroids,
    hyperplanes,
    ivf_assign,
    ivf_assign_matmul,
    ivf_search,
    lsh_bucket_col,
)
