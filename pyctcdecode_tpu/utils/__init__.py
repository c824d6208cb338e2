"""Shared utilities: tries, logit normalization, metrics."""
from .logits import log_softmax_np, normalize_to_logp, normalize_to_logp_jnp
from .metrics import character_error_rate, edit_distance, word_error_rate
from .trie import CharTrie

__all__ = [
    "CharTrie",
    "character_error_rate",
    "edit_distance",
    "log_softmax_np",
    "normalize_to_logp",
    "normalize_to_logp_jnp",
    "word_error_rate",
]
