"""Vector similarity: brute-force cosine top-k baseline (queries.py) and
LSH-bucketed ANN scale path."""

from .ann import hyperplanes, lsh_bucket_col, ann_lsh_pairs  # noqa: F401
