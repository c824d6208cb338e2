"""Native-engine-backed n-gram model (drop-in for :class:`NGramModel`).

Wraps :class:`pyctcdecode_tpu.csrc.NativeNGram` with the same facade the
decoding stack consumes (ref role: the KenLM ``Model`` object,
``language_model.py:306-360``). Scoring semantics are verified bit-for-bit
against the Python runtime in ``tests/test_native.py``; ARPA parsing is
10-100x faster, which matters for production-size LMs (GBs of text).
"""
from __future__ import annotations

import logging
import os
from typing import List, Optional, Tuple

from .ngram import EOS_WORD, UNK_WORD

logger = logging.getLogger(__name__)


class NativeNGramModel:
    """KenLM-equivalent model facade backed by the C++ engine."""

    def __init__(self, native) -> None:
        self._native = native

    @classmethod
    def from_file(cls, path: str) -> "NativeNGramModel":
        from ..csrc import NativeNGram

        return cls(NativeNGram(path))

    @property
    def native(self) -> "object":
        return self._native

    @property
    def order(self) -> int:
        return self._native.order

    @property
    def path(self) -> Optional[str]:
        return self._native.path

    def __contains__(self, word: str) -> bool:
        return word in self._native

    def begin_sentence_state(self) -> Tuple[int, ...]:
        """(<s>,) when the model has a <s> unigram entry, else empty."""
        bos = self._native.bos_id
        if bos < 0:
            return ()
        if self.order == 1:
            return (bos,)
        _, out = self._native.raw_score((), bos)
        # state is (bos,) iff <s> has a unigram entry; raw_score's outgoing
        # state computation answers exactly that
        return out if out == (bos,) else ()

    def null_context_state(self) -> Tuple[int, ...]:
        return ()

    def raw_score_word(
        self, state: Tuple[int, ...], word: str
    ) -> Tuple[float, Tuple[int, ...]]:
        """log10 p(word | state) plus outgoing state (KenLM BaseScore)."""
        return self._native.raw_score(state, self._native.word_id(word))

    def raw_end_score(self, state: Tuple[int, ...]) -> float:
        """log10 p(</s> | state)."""
        eos = self._native.eos_id
        wid = eos if eos >= 0 else self._native.word_id(EOS_WORD)
        score, _ = self._native.raw_score(state, wid)
        return score

    def state_words(self, state: Tuple[int, ...]) -> List[str]:
        """Debug helper: map a state's ids back to words."""
        vocab = self._native.vocab_list()
        return [vocab[i] if 0 <= i < len(vocab) else UNK_WORD for i in state]


def open_ngram_file(path: str, backend: str = "auto") -> "object":
    """Factory: open an n-gram model with the best available backend.

    ``backend``: ``"auto"`` (native for ARPA when the toolchain is present),
    ``"native"`` (require the C++ engine), or ``"python"``.
    """
    from .ngram import NGramModel

    if backend not in ("auto", "native", "python"):
        raise ValueError(
            f"backend must be 'auto', 'native' or 'python'; got {backend!r}"
        )
    ext = os.path.splitext(path)[1].lower()
    gzipped = path.endswith(".gz")
    is_arpa = ext not in (".bin", ".binary", ".ctclm")
    if ext in (".bin", ".binary"):
        with open(path, "rb") as fh:
            head = fh.read(16)
        if head.startswith(b"mmap lm "):  # KenLM binary magic prefix
            from .kenlm_bin import KenLMBinaryModel

            return KenLMBinaryModel.from_file(path)
    if backend == "native" and (not is_arpa or gzipped):
        # the C++ parser reads plain-text ARPA only — an explicit native
        # request for another format must not silently fall back
        raise ValueError(
            f"backend='native' supports plain-text ARPA files only; "
            f"{path!r} needs the python backend"
        )
    if backend == "python" or not is_arpa or gzipped:
        # gzipped ARPA: the native parser cannot decompress — route to
        # Python directly instead of wasting a full read of the blob
        # before the auto fallback
        return NGramModel.from_file(path)
    if backend == "native":
        return NativeNGramModel.from_file(path)
    # auto
    from ..csrc import load_native

    if load_native() is not None:
        try:
            return NativeNGramModel.from_file(path)
        except Exception as err:
            logger.warning("native ARPA load failed (%s); falling back to Python", err)
    return NGramModel.from_file(path)
