from .hashing import portable_hash64, seeded_hash64, word_shingles
from .serialize import canonical_json, iso_ts
from .vector import cosine_sim, dot, l2_norm

__all__ = [
    "portable_hash64",
    "seeded_hash64",
    "word_shingles",
    "canonical_json",
    "iso_ts",
    "cosine_sim",
    "dot",
    "l2_norm",
]
