"""Language-model family: n-gram runtime, fusion wrappers, hotwords."""
from .base import AbstractLanguageModel, AbstractLMState, MultiLMState, NGramLMState
from .hotwords import HotwordScorer
from .language_model import LanguageModel, MultiLanguageModel
from .ngram import NGramModel, load_unigram_set_from_arpa, read_arpa

__all__ = [
    "AbstractLMState",
    "AbstractLanguageModel",
    "HotwordScorer",
    "LanguageModel",
    "MultiLMState",
    "MultiLanguageModel",
    "NGramLMState",
    "NGramModel",
    "load_unigram_set_from_arpa",
    "read_arpa",
]
