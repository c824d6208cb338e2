"""Device-side primitive ops: hashing, token tables, beam-state algebra."""
from .hashing import (
    CH_A,
    CH_B,
    TXT_A,
    TXT_B,
    fnv1a,
    hash_extend_char,
    hash_text_commit,
)
from .tokens import TokenArrays, build_token_arrays

__all__ = [
    "CH_A",
    "CH_B",
    "TXT_A",
    "TXT_B",
    "fnv1a",
    "hash_extend_char",
    "hash_text_commit",
    "TokenArrays",
    "build_token_arrays",
]
