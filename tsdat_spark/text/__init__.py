"""Text analysis + deduplication operators for training-data pipelines."""

from .dedup import (  # noqa: F401
    char_hash,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signature,
    shingles,
    simhash,
)
