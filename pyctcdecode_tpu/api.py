"""Public factory: build a ready-to-use CTC decoder (TPU engine by default).

Mirrors the reference entry point ``build_ctcdecoder``
(ref ``pyctcdecode/decoder.py:1051-1099``) but returns this framework's
device engine whenever JAX has a usable backend; the exact host engine
remains available via ``engine="host"`` (or as the automatic fallback when
JAX is absent).
"""
from __future__ import annotations

import logging
from typing import Collection, List, Optional, Union

from .alphabet import Alphabet, verify_alphabet_coverage
from .constants import (
    DEFAULT_ALPHA,
    DEFAULT_BETA,
    DEFAULT_SCORE_LM_BOUNDARY,
    DEFAULT_UNK_LOGP_OFFSET,
)
from .decoder import BeamSearchDecoderCTC
from .models.language_model import LanguageModel
from .models.native import open_ngram_file
from .models.ngram import load_unigram_set_from_arpa

logger = logging.getLogger(__name__)

_ENGINES = ("auto", "tpu", "host")


def _device_engine_available() -> bool:
    """True when JAX imports and exposes at least one device."""
    try:
        import jax

        return len(jax.devices()) > 0
    except Exception:  # noqa: BLE001 - any failure means "no device engine"
        return False


def build_ctcdecoder(
    labels: List[str],
    kenlm_model_path: Optional[str] = None,
    unigrams: Optional[Collection[str]] = None,
    alpha: float = DEFAULT_ALPHA,
    beta: float = DEFAULT_BETA,
    unk_score_offset: float = DEFAULT_UNK_LOGP_OFFSET,
    lm_score_boundary: bool = DEFAULT_SCORE_LM_BOUNDARY,
    engine: str = "auto",
    **engine_options: "object",
) -> Union[BeamSearchDecoderCTC, "TPUBeamSearchDecoderCTC"]:
    """Build a ready-to-use decoder (main entry point).

    Args:
        labels: raw model labels (logit column order).
        kenlm_model_path: optional path to an n-gram LM — ARPA text, a KenLM
            binary (``.bin``/``.binary``), or this framework's compiled
            ``.ctclm`` format; the kwarg name matches the reference API, but
            the file is loaded by this framework's own n-gram runtime.
        unigrams: known word vocabulary (inferred from \\1-grams for ARPA).
        alpha: LM weight for shallow fusion.
        beta: per-word length bonus.
        unk_score_offset: log-score offset for OOV words.
        lm_score_boundary: whether the LM scores <s>/</s> boundaries.
        engine: ``"tpu"`` for the vectorized device engine, ``"host"`` for
            the exact host engine, ``"auto"`` (default) picks the device
            engine whenever JAX is usable.
        **engine_options: forwarded to the device engine constructor
            (``fast_topk``, ``segment_frames``);
            rejected with the host engine, which has no such knobs.

    Returns:
        A :class:`~pyctcdecode_tpu.tpu_decoder.TPUBeamSearchDecoderCTC` or
        :class:`~pyctcdecode_tpu.decoder.BeamSearchDecoderCTC`.
    """
    if engine not in _ENGINES:
        raise ValueError(f"engine must be one of {_ENGINES}; got {engine!r}")
    ngram_model = (
        None if kenlm_model_path is None else open_ngram_file(kenlm_model_path)
    )
    if kenlm_model_path is not None and kenlm_model_path.endswith(".arpa"):
        logger.info(
            "loading a plain-text ARPA model; the compiled .ctclm format "
            "loads much faster for repeated use"
        )
    if unigrams is None and kenlm_model_path is not None:
        if kenlm_model_path.endswith((".arpa", ".arpa.gz")):
            unigrams = load_unigram_set_from_arpa(kenlm_model_path)
        elif hasattr(ngram_model, "vocab_words"):
            # KenLM binaries carry their vocabulary strings; unlike the
            # reference (whose kenlm binding cannot enumerate them, ref
            # decoder.py:1080-1084) we can recover the word set directly
            unigrams = [
                w
                for w in ngram_model.vocab_words()
                if not (w.startswith("<") and w.endswith(">"))
            ]
        else:
            logger.warning(
                "no unigram vocabulary given and none can be read from a "
                "non-ARPA model file; partial-word scoring will treat every "
                "prefix as unknown"
            )
    alphabet = Alphabet.build_alphabet(labels)
    if unigrams is not None:
        verify_alphabet_coverage(alphabet, unigrams)
    language_model: Optional[LanguageModel] = None
    if ngram_model is not None:
        language_model = LanguageModel(
            ngram_model,
            unigrams,
            alpha=alpha,
            beta=beta,
            unk_score_offset=unk_score_offset,
            score_boundary=lm_score_boundary,
        )
    if engine == "auto":
        engine = "tpu" if _device_engine_available() else "host"
    if engine == "tpu":
        from .tpu_decoder import TPUBeamSearchDecoderCTC

        return TPUBeamSearchDecoderCTC(
            alphabet, language_model, **engine_options
        )
    if engine_options:
        raise TypeError(
            "engine options "
            f"{sorted(engine_options)} apply to the device engine only; "
            "the host engine accepts none (remove them or use "
            "engine='tpu')"
        )
    return BeamSearchDecoderCTC(alphabet, language_model)
