from remote_shuffle_spark.functions.hashing import (
    band_hashes,
    minhash_signature,
    normalized_text,
    rolling_fingerprint,
    shingle_structs,
    simhash64,
    tokens as token_array,
    word_shingles,
    word_shingles_from_tokens,
)
from remote_shuffle_spark.functions.vectors import cosine_similarity, dot, l2_norm, to_double_array

__all__ = [
    "band_hashes",
    "minhash_signature",
    "normalized_text",
    "rolling_fingerprint",
    "shingle_structs",
    "simhash64",
    "token_array",
    "word_shingles",
    "word_shingles_from_tokens",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "to_double_array",
]
