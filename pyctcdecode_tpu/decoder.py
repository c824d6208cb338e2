"""CTC beam-search decoder — host engine and public API.

This module is the framework's *exact* engine: a host-side beam search with
bit-level behavioral parity to the reference decoder
(``pyctcdecode/decoder.py:261-1099``), used for golden verification, small
workloads, and as the semantic specification for the TPU engine
(``pyctcdecode_tpu/engine.py``), which vectorizes the same transition system
onto fixed-width device arrays.

Semantics preserved from the reference (each verified by tests):

* 4-way per-(token, beam) transition: blank/repeat extend, BPE ``▁`` word
  boundary (incl. right-bounded tokens like ``▁⁇▁``), char-alphabet space,
  plain partial extension (ref decoder.py:443-534).
* log-domain prefix merging keyed on (text⊕next_word, partial, last char)
  with stable insertion order (ref decoder.py:211-224).
* incremental cached LM fusion + hotword boosting (ref decoder.py:346-424).
* score-window pruning, stable top-k trimming, optional n-gram history
  pruning (ref decoder.py:165-167, 227-258, 536-554).
* streaming with caller-held state, frame-accurate word spans, batch decode,
  directory/HF-hub serialization.

One deliberate fix: the reference tracks the BPE "previous token was
right-bounded" flag in a loop variable shared across beams
(``force_next_break``, ref decoder.py:442,474-482); here it is per-beam
state (``Beam.force_next_break``), which is the correct reading of the
intent and only diverges on alphabets containing right-bounded tokens.
"""
from __future__ import annotations

import dataclasses
import functools
import logging
import math
import multiprocessing as mp
import os
import sys
from multiprocessing.pool import Pool
from pathlib import Path
from typing import (
    Any,
    Collection,
    Dict,
    Iterable,
    List,
    Optional,
    Sequence,
    Tuple,
    Union,
)

import numpy as np

from .alphabet import BPE_TOKEN, Alphabet, verify_alphabet_coverage
from .constants import (
    DEFAULT_ALPHA,
    DEFAULT_BEAM_WIDTH,
    DEFAULT_BETA,
    DEFAULT_HOTWORD_WEIGHT,
    DEFAULT_MIN_TOKEN_LOGP,
    DEFAULT_PRUNE_BEAMS,
    DEFAULT_PRUNE_LOGP,
    DEFAULT_SCORE_LM_BOUNDARY,
    DEFAULT_UNK_LOGP_OFFSET,
    MIN_TOKEN_CLIP_P,
)
from .models.base import AbstractLanguageModel, AbstractLMState
from .models.hotwords import HotwordScorer
from .models.language_model import LanguageModel
from .models.native import open_ngram_file
from .models.ngram import NGramModel, load_unigram_set_from_arpa
from .utils.logits import normalize_to_logp

logger = logging.getLogger(__name__)

# frame span of one word: (start_frame, end_frame)
Frames = Tuple[int, int]
WordFrames = Tuple[str, Frames]

NULL_FRAMES: Frames = (-1, -1)


@dataclasses.dataclass(frozen=True)
class Beam:
    """One beam hypothesis during decoding.

    ``text`` holds LM-scored committed words, ``next_word`` a finished but
    not-yet-scored word, ``partial_word`` the in-progress word.
    """

    text: str
    next_word: str
    partial_word: str
    last_char: Optional[str]
    text_frames: List[Frames]
    partial_frames: Frames
    logit_score: float
    force_next_break: bool = False

    @classmethod
    def from_lm_beam(cls, lm_beam: "LMBeam") -> "Beam":
        """Strip the LM score off an :class:`LMBeam`."""
        return Beam(
            text=lm_beam.text,
            next_word=lm_beam.next_word,
            partial_word=lm_beam.partial_word,
            last_char=lm_beam.last_char,
            text_frames=lm_beam.text_frames,
            partial_frames=lm_beam.partial_frames,
            logit_score=lm_beam.logit_score,
            force_next_break=lm_beam.force_next_break,
        )


@dataclasses.dataclass(frozen=True)
class LMBeam:
    """Beam plus its fused (logit + LM + hotword) score.

    Field order mirrors the reference's ``LMBeam`` so positional construction
    stays drop-in compatible; the per-beam BPE break flag rides at the end.
    """

    text: str
    next_word: str
    partial_word: str
    last_char: Optional[str]
    text_frames: List[Frames]
    partial_frames: Frames
    logit_score: float
    lm_score: float = 0.0
    force_next_break: bool = False


@dataclasses.dataclass(frozen=True)
class OutputBeam:
    """Final decoded hypothesis."""

    text: str
    last_lm_state: Optional[AbstractLMState]
    text_frames: List[WordFrames]
    logit_score: float  # cumulative acoustic log score
    lm_score: float  # cumulative fused score

    def get_mp_safe_beam(self) -> "OutputBeam":
        """Version of this beam safe to send across process boundaries."""
        if self.last_lm_state is None:
            last_lm_state = None
        else:
            last_lm_state = self.last_lm_state.get_mp_safe_state()
        return dataclasses.replace(self, last_lm_state=last_lm_state)


# LM score cache: (text, is_eos) -> (fused score incl. hotwords, fused score, state)
LMScoreCacheKey = Tuple[str, bool]
LMScoreCacheValue = Tuple[float, float, AbstractLMState]
LMScoreCache = Dict[LMScoreCacheKey, LMScoreCacheValue]

EMPTY_START_BEAM = Beam("", "", "", None, [], NULL_FRAMES, 0.0)


def _get_valid_pool(pool: Optional[Pool]) -> Optional[Pool]:
    """Reject spawn-context pools (workers can't inherit the LM registry)."""
    if pool is not None and isinstance(
        pool._ctx, mp.context.SpawnContext  # type: ignore[attr-defined]
    ):
        logger.warning(
            "Specified pool object has a spawn context, which is not currently "
            "supported. Falling back to sequential decoding."
        )
        return None
    return pool


def _normalize_whitespace(text: str) -> str:
    """Collapse runs of whitespace and trim."""
    return " ".join(text.split())


def _sum_log_scores(s1: float, s2: float) -> float:
    """Numerically stable log(exp(s1) + exp(s2))."""
    if s1 >= s2:
        return s1 + math.log(1 + math.exp(s2 - s1))
    return s2 + math.log(1 + math.exp(s1 - s2))


def _merge_tokens(token_1: str, token_2: str) -> str:
    """Join two words with a single space, tolerating empties."""
    if not token_2:
        return token_1
    if not token_1:
        return token_2
    return token_1 + " " + token_2


def _merge_beams(beams: List[Beam]) -> List[Beam]:
    """Combine beams sharing (text⊕next_word, partial, last char) by logsumexp.

    Insertion order is preserved; on a collision the newest beam's metadata
    wins while scores accumulate (matches ref decoder.py:211-224).
    """
    merged: Dict[Tuple[str, str, Optional[str], bool], Beam] = {}
    for beam in beams:
        key = (
            _merge_tokens(beam.text, beam.next_word),
            beam.partial_word,
            beam.last_char,
            beam.force_next_break,
        )
        seen = merged.get(key)
        if seen is None:
            merged[key] = beam
        else:
            merged[key] = dataclasses.replace(
                beam, logit_score=_sum_log_scores(seen.logit_score, beam.logit_score)
            )
    return list(merged.values())


def _sort_and_trim_beams(beams: List[LMBeam], beam_width: int) -> List[LMBeam]:
    """Stable top-N by fused score."""
    return sorted(beams, key=lambda b: b.lm_score, reverse=True)[:beam_width]


def _prune_history(beams: List[LMBeam], lm_order: int) -> List[Beam]:
    """Drop beams identical over the LM-visible recent history.

    Keeps the first (= highest-scoring, input is sorted) beam per truncated
    history key; LM scores are stripped. Trades beam diversity for speed
    (ref decoder.py:227-258).
    """
    min_n_history = max(1, lm_order - 1)
    seen = set()
    kept: List[Beam] = []
    for lm_beam in beams:
        key = (
            tuple(lm_beam.text.split()[-min_n_history:]),
            lm_beam.partial_word,
            lm_beam.last_char,
        )
        if key not in seen:
            seen.add(key)
            kept.append(Beam.from_lm_beam(lm_beam))
    return kept


class _TokenTable:
    """Static per-token transition metadata derived from the alphabet.

    Shared ground truth between the host engine (here) and the TPU engine's
    packed token-class arrays (``ops/tokens.py``).
    """

    BLANK = 0
    BOUNDARY = 1  # char-alphabet space or BPE ▁-prefixed piece
    REGULAR = 2

    def __init__(self, alphabet: Alphabet) -> None:
        self.labels = alphabet.labels
        self.is_bpe = alphabet.is_bpe
        self.kind: List[int] = []
        self.boundary_piece: List[str] = []  # partial seed when used as boundary
        self.right_bound: List[bool] = []  # BPE token also *ends* with ▁
        for lab in self.labels:
            if lab == "":
                self.kind.append(self.BLANK)
            elif self.is_bpe and lab[:1] == BPE_TOKEN:
                self.kind.append(self.BOUNDARY)
            elif not self.is_bpe and lab == " ":
                self.kind.append(self.BOUNDARY)
            else:
                self.kind.append(self.REGULAR)
            piece = lab
            if self.is_bpe and piece[:1] == BPE_TOKEN:
                piece = piece[1:]
            rbound = bool(self.is_bpe and lab != "" and lab[-1:] == BPE_TOKEN)
            if rbound:
                piece = piece[:-1] if piece[-1:] == BPE_TOKEN else piece
            self.boundary_piece.append(piece)
            self.right_bound.append(rbound)


class BeamSearchDecoderCTC:
    """CTC beam-search decoder with optional shallow-fusion LM.

    Language models are registered in a class-level container keyed by a
    random token so forked batch workers share them copy-on-write instead of
    pickling (ref decoder.py:261-290).
    """

    model_container: Dict[bytes, Optional[AbstractLanguageModel]] = {}

    _ALPHABET_SERIALIZED_FILENAME = "alphabet.json"
    _LANGUAGE_MODEL_SERIALIZED_DIRECTORY = "language_model"

    def __init__(
        self,
        alphabet: Alphabet,
        language_model: Optional[AbstractLanguageModel] = None,
    ) -> None:
        """Create a decoder for logit matrices over ``alphabet.labels``."""
        self._alphabet = alphabet
        self._idx2vocab = dict(enumerate(alphabet.labels))
        self._is_bpe = alphabet.is_bpe
        self._tokens = _TokenTable(alphabet)
        self._model_key = os.urandom(16)
        BeamSearchDecoderCTC.model_container[self._model_key] = language_model

    # -- model registry lifecycle ------------------------------------------
    @property
    def _language_model(self) -> Optional[AbstractLanguageModel]:
        return BeamSearchDecoderCTC.model_container[self._model_key]

    def cleanup(self) -> None:
        """Drop this decoder's LM from the class registry."""
        if self._model_key in BeamSearchDecoderCTC.model_container:
            del BeamSearchDecoderCTC.model_container[self._model_key]

    @classmethod
    def clear_class_models(cls) -> None:
        """Drop every registered LM."""
        cls.model_container = {}

    def reset_params(
        self,
        alpha: Optional[float] = None,
        beta: Optional[float] = None,
        unk_score_offset: Optional[float] = None,
        lm_score_boundary: Optional[bool] = None,
    ) -> None:
        """Re-tune LM fusion parameters without rebuilding anything."""
        language_model = self._language_model
        if language_model is None:
            return
        params: Dict[str, Any] = {}
        if alpha is not None:
            params["alpha"] = alpha
        if beta is not None:
            params["beta"] = beta
        if unk_score_offset is not None:
            params["unk_score_offset"] = unk_score_offset
        if lm_score_boundary is not None:
            params["score_boundary"] = lm_score_boundary
        language_model.reset_params(**params)

    # -- validation ---------------------------------------------------------
    def _check_logits_dimension(self, logits: np.ndarray) -> None:
        if len(logits.shape) != 2:
            raise ValueError(
                "Input logits have %s dimensions, but need 2: (time, vocabulary)"
                % len(logits.shape)
            )
        if logits.shape[-1] != len(self._idx2vocab):
            raise ValueError(
                "Input logits shape is %s, but vocabulary is size %s. "
                "Need logits of shape: (time, vocabulary)"
                % (logits.shape, len(self._idx2vocab))
            )

    # -- LM fusion -----------------------------------------------------------
    def _get_lm_beams(
        self,
        beams: List[Beam],
        hotword_scorer: HotwordScorer,
        cached_lm_scores: LMScoreCache,
        cached_partial_token_scores: Dict[str, float],
        is_eos: bool = False,
    ) -> List[LMBeam]:
        """Attach fused scores, folding next_word into text (cached, incremental)."""
        language_model = self._language_model
        new_beams: List[LMBeam] = []
        if language_model is None:
            for beam in beams:
                new_text = _merge_tokens(beam.text, beam.next_word)
                fused = (
                    beam.logit_score
                    + hotword_scorer.score(new_text)
                    + hotword_scorer.score_partial_token(beam.partial_word)
                )
                new_beams.append(
                    LMBeam(
                        text=new_text,
                        next_word="",
                        partial_word=beam.partial_word,
                        last_char=beam.last_char,
                        text_frames=beam.text_frames,
                        partial_frames=beam.partial_frames,
                        logit_score=beam.logit_score,
                        force_next_break=beam.force_next_break,
                        lm_score=fused,
                    )
                )
            return new_beams

        for beam in beams:
            new_text = _merge_tokens(beam.text, beam.next_word)
            cache_key = (new_text, is_eos)
            if cache_key not in cached_lm_scores:
                _, prev_raw, prev_state = cached_lm_scores[(beam.text, False)]
                word_score, end_state = language_model.score(
                    prev_state, beam.next_word, is_last_word=is_eos
                )
                raw = prev_raw + word_score
                cached_lm_scores[cache_key] = (
                    raw + hotword_scorer.score(new_text),
                    raw,
                    end_state,
                )
            lm_score = cached_lm_scores[cache_key][0]
            partial = beam.partial_word
            if partial:
                if partial not in cached_partial_token_scores:
                    if partial in hotword_scorer:
                        cached_partial_token_scores[partial] = (
                            hotword_scorer.score_partial_token(partial)
                        )
                    else:
                        cached_partial_token_scores[partial] = (
                            language_model.score_partial_token(partial)
                        )
                lm_score += cached_partial_token_scores[partial]
            new_beams.append(
                LMBeam(
                    text=new_text,
                    next_word="",
                    partial_word=partial,
                    last_char=beam.last_char,
                    text_frames=beam.text_frames,
                    partial_frames=beam.partial_frames,
                    logit_score=beam.logit_score,
                    force_next_break=beam.force_next_break,
                    lm_score=beam.logit_score + lm_score,
                )
            )
        return new_beams

    # -- transition system ----------------------------------------------------
    def _expand_beam(
        self, beam: Beam, idx_char: int, char: str, p_char: float, frame_idx: int
    ) -> Beam:
        """Apply one token to one beam (the 4-way CTC+word-boundary transition)."""
        tok = self._tokens
        if char == "" or beam.last_char == char:
            # blank or repeated token: acoustic score only
            if char == "":
                new_frames = beam.partial_frames
            else:
                new_frames = (beam.partial_frames[0], frame_idx + 1)
            return dataclasses.replace(
                beam,
                last_char=char,
                partial_frames=new_frames,
                logit_score=beam.logit_score + p_char,
            )
        boundary = (
            tok.kind[idx_char] == _TokenTable.BOUNDARY
            if not self._is_bpe
            else (tok.kind[idx_char] == _TokenTable.BOUNDARY or beam.force_next_break)
        )
        if boundary:
            # word boundary: promote the in-progress word for LM scoring
            committed_frames = (
                beam.text_frames
                if beam.partial_word == ""
                else beam.text_frames + [beam.partial_frames]
            )
            if self._is_bpe:
                new_partial = tok.boundary_piece[idx_char]
                new_partial_frames: Frames = (frame_idx, frame_idx + 1)
                force = tok.right_bound[idx_char]
            else:
                new_partial = ""
                new_partial_frames = NULL_FRAMES
                force = False
            return Beam(
                text=beam.text,
                next_word=beam.partial_word,
                partial_word=new_partial,
                last_char=char,
                text_frames=committed_frames,
                partial_frames=new_partial_frames,
                logit_score=beam.logit_score + p_char,
                force_next_break=force,
            )
        # plain continuation of the in-progress word
        new_partial_frames = (
            (frame_idx, frame_idx + 1)
            if beam.partial_frames[0] < 0
            else (beam.partial_frames[0], frame_idx + 1)
        )
        return Beam(
            text=beam.text,
            next_word=beam.next_word,
            partial_word=beam.partial_word + char,
            last_char=char,
            text_frames=beam.text_frames,
            partial_frames=new_partial_frames,
            logit_score=beam.logit_score + p_char,
            force_next_break=beam.force_next_break,
        )

    def _partial_decode_logits(
        self,
        logits: np.ndarray,
        beams: List[Beam],
        beam_width: int,
        beam_prune_logp: float,
        token_min_logp: float,
        prune_history: bool,
        hotword_scorer: HotwordScorer,
        cached_lm_scores: LMScoreCache,
        cached_p_lm_scores: Dict[str, float],
        processed_frames: int = 0,
    ) -> List[Beam]:
        """Run the per-frame expand → merge → LM-fuse → prune pipeline."""
        language_model = self._language_model
        for frame_offset, logit_col in enumerate(logits):
            frame_idx = processed_frames + frame_offset
            max_idx = int(logit_col.argmax())
            candidates = np.flatnonzero(logit_col >= token_min_logp)
            if max_idx not in candidates:
                candidates = np.sort(np.append(candidates, max_idx))
            new_beams: List[Beam] = []
            for idx_char in candidates:
                idx_char = int(idx_char)
                char = self._idx2vocab[idx_char]
                p_char = logit_col[idx_char]
                for beam in beams:
                    new_beams.append(
                        self._expand_beam(beam, idx_char, char, p_char, frame_idx)
                    )

            merged = _merge_beams(new_beams)
            scored = self._get_lm_beams(
                merged, hotword_scorer, cached_lm_scores, cached_p_lm_scores
            )
            # window prune relative to the best beam, then top-k
            max_score = max(b.lm_score for b in scored)
            cutoff = max_score + beam_prune_logp
            scored = [b for b in scored if b.lm_score >= cutoff]
            trimmed = _sort_and_trim_beams(scored, beam_width)
            if prune_history:
                lm_order = 1 if language_model is None else language_model.order
                beams = _prune_history(trimmed, lm_order=lm_order)
            else:
                beams = [Beam.from_lm_beam(b) for b in trimmed]
        return beams

    def _finalize_beams(
        self,
        beams: Sequence[Beam],
        beam_width: int,
        beam_prune_logp: float,
        hotword_scorer: HotwordScorer,
        cached_lm_scores: LMScoreCache,
        cached_p_lm_scores: Dict[str, float],
        force_next_word: bool = False,
        is_end: bool = False,
    ) -> List[LMBeam]:
        """Optionally commit trailing partial words, then LM-score and sort."""
        if force_next_word or is_end:
            committed: List[Beam] = []
            for beam in beams:
                frames = (
                    beam.text_frames
                    if beam.partial_word == ""
                    else beam.text_frames + [beam.partial_frames]
                )
                committed.append(
                    Beam(
                        text=beam.text,
                        next_word=beam.partial_word,
                        partial_word="",
                        last_char=None,
                        text_frames=frames,
                        partial_frames=NULL_FRAMES,
                        logit_score=beam.logit_score,
                    )
                )
            new_beams = _merge_beams(committed)
        else:
            new_beams = list(beams)
        scored = self._get_lm_beams(
            new_beams,
            hotword_scorer,
            cached_lm_scores,
            cached_p_lm_scores,
            is_eos=is_end,
        )
        max_score = max(b.lm_score for b in scored)
        cutoff = max_score + beam_prune_logp
        scored = [b for b in scored if b.lm_score >= cutoff]
        return _sort_and_trim_beams(scored, beam_width)

    # -- one-shot decoding -----------------------------------------------------
    def _decode_logits(
        self,
        logits: np.ndarray,
        beam_width: int,
        beam_prune_logp: float,
        token_min_logp: float,
        prune_history: bool,
        hotword_scorer: HotwordScorer,
        lm_start_state: Optional[AbstractLMState] = None,
    ) -> List[OutputBeam]:
        language_model = self._language_model
        if language_model is None:
            cached_lm_scores: LMScoreCache = {}
        else:
            start_state = (
                language_model.get_start_state()
                if lm_start_state is None
                else lm_start_state
            )
            cached_lm_scores = {("", False): (0.0, 0.0, start_state)}
        cached_p_lm_scores: Dict[str, float] = {}

        beams = self._partial_decode_logits(
            logits,
            [EMPTY_START_BEAM],
            beam_width,
            beam_prune_logp,
            token_min_logp,
            prune_history,
            hotword_scorer,
            cached_lm_scores,
            cached_p_lm_scores,
        )
        trimmed = self._finalize_beams(
            beams,
            beam_width,
            beam_prune_logp,
            hotword_scorer,
            cached_lm_scores,
            cached_p_lm_scores,
            force_next_word=True,
            is_end=True,
        )
        return [
            OutputBeam(
                text=_normalize_whitespace(b.text),
                last_lm_state=(
                    cached_lm_scores[(b.text, True)][-1]
                    if (b.text, True) in cached_lm_scores
                    else None
                ),
                text_frames=list(zip(b.text.split(), b.text_frames)),
                logit_score=b.logit_score,
                lm_score=b.lm_score,
            )
            for b in trimmed
        ]

    # -- streaming API -----------------------------------------------------------
    def get_starting_state(self) -> Tuple[List[Beam], LMScoreCache, Dict[str, float]]:
        """Initial beams plus warmed score caches for chunked decoding."""
        language_model = self._language_model
        if language_model is None:
            cached_lm_scores: LMScoreCache = {}
        else:
            cached_lm_scores = {("", False): (0.0, 0.0, language_model.get_start_state())}
        return [EMPTY_START_BEAM], cached_lm_scores, {}

    def partial_decode_beams(
        self,
        logits: np.ndarray,
        cached_lm_scores: LMScoreCache,
        cached_p_lm_scores: Dict[str, float],
        beams: List[Beam],
        processed_frames: int,
        beam_width: int = DEFAULT_BEAM_WIDTH,
        beam_prune_logp: float = DEFAULT_PRUNE_LOGP,
        token_min_logp: float = DEFAULT_MIN_TOKEN_LOGP,
        prune_history: bool = DEFAULT_PRUNE_BEAMS,
        hotword_scorer: Optional[HotwordScorer] = None,
        force_next_word: bool = False,
        is_end: bool = False,
    ) -> List[LMBeam]:
        """Consume one chunk of logits, carrying caller-held decode state."""
        self._check_logits_dimension(logits)
        hotword_scorer = hotword_scorer or HotwordScorer.build_scorer([], weight=0.0)
        logits = normalize_to_logp(logits)
        beams = self._partial_decode_logits(
            logits,
            beams,
            beam_width,
            beam_prune_logp,
            token_min_logp,
            prune_history,
            hotword_scorer,
            cached_lm_scores,
            cached_p_lm_scores,
            processed_frames=processed_frames,
        )
        return self._finalize_beams(
            beams,
            beam_width,
            beam_prune_logp,
            hotword_scorer,
            cached_lm_scores,
            cached_p_lm_scores,
            force_next_word=force_next_word,
            is_end=is_end,
        )

    def decode_beams(
        self,
        logits: np.ndarray,
        beam_width: int = DEFAULT_BEAM_WIDTH,
        beam_prune_logp: float = DEFAULT_PRUNE_LOGP,
        token_min_logp: float = DEFAULT_MIN_TOKEN_LOGP,
        prune_history: bool = DEFAULT_PRUNE_BEAMS,
        hotwords: Optional[Iterable[str]] = None,
        hotword_weight: float = DEFAULT_HOTWORD_WEIGHT,
        lm_start_state: Optional[AbstractLMState] = None,
    ) -> List[OutputBeam]:
        """Decode a logit matrix into ranked beams with full metadata.

        Args:
            logits: (time, vocab) token log-probabilities (or probabilities /
                raw logits; normalization is sniffed automatically).
            beam_width: maximum live beams per step.
            beam_prune_logp: window below the best beam's score to keep.
            token_min_logp: per-frame token admission threshold (argmax always
                admitted).
            prune_history: dedupe beams sharing recent n-gram history.
            hotwords: words/phrases to boost (may be OOV for the LM).
            hotword_weight: boost strength per hotword hit.
            lm_start_state: optional LM state for stateful chaining.

        Returns:
            Ranked :class:`OutputBeam` list.
        """
        self._check_logits_dimension(logits)
        hotword_scorer = HotwordScorer.build_scorer(hotwords, weight=hotword_weight)
        logits = normalize_to_logp(logits)
        return self._decode_logits(
            logits,
            beam_width=beam_width,
            beam_prune_logp=beam_prune_logp,
            token_min_logp=token_min_logp,
            prune_history=prune_history,
            hotword_scorer=hotword_scorer,
            lm_start_state=lm_start_state,
        )

    def decode(
        self,
        logits: np.ndarray,
        beam_width: int = DEFAULT_BEAM_WIDTH,
        beam_prune_logp: float = DEFAULT_PRUNE_LOGP,
        token_min_logp: float = DEFAULT_MIN_TOKEN_LOGP,
        hotwords: Optional[Iterable[str]] = None,
        hotword_weight: float = DEFAULT_HOTWORD_WEIGHT,
        lm_start_state: Optional[AbstractLMState] = None,
    ) -> str:
        """Decode a logit matrix to the single best transcript."""
        return self.decode_beams(
            logits,
            beam_width=beam_width,
            beam_prune_logp=beam_prune_logp,
            token_min_logp=token_min_logp,
            prune_history=True,  # only the top beam is returned
            hotwords=hotwords,
            hotword_weight=hotword_weight,
            lm_start_state=lm_start_state,
        )[0].text

    # -- batch decoding -----------------------------------------------------------
    def _decode_beams_mp_safe(
        self,
        logits: np.ndarray,
        beam_width: int,
        beam_prune_logp: float,
        token_min_logp: float,
        prune_history: bool,
        hotwords: Optional[Iterable[str]],
        hotword_weight: float,
    ) -> List[OutputBeam]:
        decoded = self.decode_beams(
            logits=logits,
            beam_width=beam_width,
            beam_prune_logp=beam_prune_logp,
            token_min_logp=token_min_logp,
            prune_history=prune_history,
            hotwords=hotwords,
            hotword_weight=hotword_weight,
        )
        return [beam.get_mp_safe_beam() for beam in decoded]

    def decode_beams_batch(
        self,
        pool: Optional[Pool],
        logits_list: Sequence[np.ndarray],
        beam_width: int = DEFAULT_BEAM_WIDTH,
        beam_prune_logp: float = DEFAULT_PRUNE_LOGP,
        token_min_logp: float = DEFAULT_MIN_TOKEN_LOGP,
        prune_history: bool = DEFAULT_PRUNE_BEAMS,
        hotwords: Optional[Iterable[str]] = None,
        hotword_weight: float = DEFAULT_HOTWORD_WEIGHT,
    ) -> List[List[OutputBeam]]:
        """Data-parallel beam decode over a multiprocessing pool (fork only)."""
        valid_pool = _get_valid_pool(pool)
        if valid_pool is None:
            return [
                self._decode_beams_mp_safe(
                    logits,
                    beam_width=beam_width,
                    beam_prune_logp=beam_prune_logp,
                    token_min_logp=token_min_logp,
                    hotwords=hotwords,
                    prune_history=prune_history,
                    hotword_weight=hotword_weight,
                )
                for logits in logits_list
            ]
        for logits in logits_list:
            self._check_logits_dimension(logits)
        p_decode = functools.partial(
            self._decode_beams_mp_safe,
            beam_width=beam_width,
            beam_prune_logp=beam_prune_logp,
            token_min_logp=token_min_logp,
            hotwords=hotwords,
            prune_history=prune_history,
            hotword_weight=hotword_weight,
        )
        return valid_pool.map(p_decode, logits_list)

    def decode_batch(
        self,
        pool: Optional[Pool],
        logits_list: Sequence[np.ndarray],
        beam_width: int = DEFAULT_BEAM_WIDTH,
        beam_prune_logp: float = DEFAULT_PRUNE_LOGP,
        token_min_logp: float = DEFAULT_MIN_TOKEN_LOGP,
        hotwords: Optional[Iterable[str]] = None,
        hotword_weight: float = DEFAULT_HOTWORD_WEIGHT,
    ) -> List[str]:
        """Data-parallel top-1 decode over a multiprocessing pool (fork only)."""
        valid_pool = _get_valid_pool(pool)
        if valid_pool is None:
            return [
                self.decode(
                    logits,
                    beam_width=beam_width,
                    beam_prune_logp=beam_prune_logp,
                    token_min_logp=token_min_logp,
                    hotwords=hotwords,
                    hotword_weight=hotword_weight,
                )
                for logits in logits_list
            ]
        p_decode = functools.partial(
            self.decode,
            beam_width=beam_width,
            beam_prune_logp=beam_prune_logp,
            token_min_logp=token_min_logp,
            hotwords=hotwords,
            hotword_weight=hotword_weight,
        )
        return valid_pool.map(p_decode, logits_list)

    # -- serialization ----------------------------------------------------------
    def save_to_dir(self, filepath: str) -> None:
        """Write alphabet.json (+ language_model/ when present) to a directory."""
        alphabet_path = os.path.join(filepath, self._ALPHABET_SERIALIZED_FILENAME)
        with open(alphabet_path, "w") as fh:
            fh.write(self._alphabet.dumps())
        lm = self._language_model
        if lm is None:
            logger.info("decoder has no language model.")
        else:
            lm_path = os.path.join(filepath, self._LANGUAGE_MODEL_SERIALIZED_DIRECTORY)
            os.makedirs(lm_path)
            logger.info("Saving language model to %s", lm_path)
            lm.save_to_dir(lm_path)

    @staticmethod
    def parse_directory_contents(filepath: str) -> Dict[str, Union[str, None]]:
        """Validate a serialized-decoder directory layout."""
        contents = [
            c
            for c in os.listdir(filepath)
            if not c.startswith(".") and not c.startswith("__")
        ]
        if BeamSearchDecoderCTC._ALPHABET_SERIALIZED_FILENAME not in contents:
            raise ValueError(
                f"Could not find alphabet file "
                f"{BeamSearchDecoderCTC._ALPHABET_SERIALIZED_FILENAME}. Found {contents}"
            )
        alphabet_filepath = os.path.join(
            filepath, BeamSearchDecoderCTC._ALPHABET_SERIALIZED_FILENAME
        )
        contents.remove(BeamSearchDecoderCTC._ALPHABET_SERIALIZED_FILENAME)
        lm_directory: Optional[str] = None
        if contents:
            if BeamSearchDecoderCTC._LANGUAGE_MODEL_SERIALIZED_DIRECTORY not in contents:
                raise ValueError(
                    f"Could not find language model directory. Looking for "
                    f"{BeamSearchDecoderCTC._LANGUAGE_MODEL_SERIALIZED_DIRECTORY}, "
                    f"found {contents}"
                )
            lm_directory = os.path.join(
                filepath, BeamSearchDecoderCTC._LANGUAGE_MODEL_SERIALIZED_DIRECTORY
            )
        return {"alphabet": alphabet_filepath, "language_model": lm_directory}

    @classmethod
    def load_from_dir(
        cls, filepath: str, unigram_encoding: Optional[str] = None
    ) -> "BeamSearchDecoderCTC":
        """Load a serialized decoder directory."""
        filenames = cls.parse_directory_contents(filepath)
        with open(filenames["alphabet"], "r") as fh:  # type: ignore[arg-type]
            alphabet = Alphabet.loads(fh.read())
        language_model: Optional[AbstractLanguageModel] = None
        if filenames["language_model"] is not None:
            language_model = LanguageModel.load_from_dir(
                filenames["language_model"], unigram_encoding=unigram_encoding
            )
        return cls(alphabet, language_model=language_model)

    @classmethod
    def load_from_hf_hub(
        cls, model_id: str, cache_dir: Optional[str] = None, **kwargs: Any
    ) -> "BeamSearchDecoderCTC":
        """Load a decoder directory from the HuggingFace Hub (or its cache)."""
        if cache_dir is None:
            cache_dir = os.path.join(Path.home(), ".cache", "pyctcdecode_tpu")
        try:
            from huggingface_hub import snapshot_download
        except ImportError as err:
            raise ImportError(
                "You need to install huggingface_hub to use `load_from_hf_hub`. "
                "See https://pypi.org/project/huggingface-hub/ for installation."
            ) from err
        cached_directory = snapshot_download(model_id, cache_dir=cache_dir, **kwargs)
        return cls.load_from_dir(cached_directory)


def build_ctcdecoder(
    labels: List[str],
    kenlm_model_path: Optional[str] = None,
    unigrams: Optional[Collection[str]] = None,
    alpha: float = DEFAULT_ALPHA,
    beta: float = DEFAULT_BETA,
    unk_score_offset: float = DEFAULT_UNK_LOGP_OFFSET,
    lm_score_boundary: bool = DEFAULT_SCORE_LM_BOUNDARY,
) -> BeamSearchDecoderCTC:
    """Build a ready-to-use decoder (main entry point).

    Args:
        labels: raw model labels (logit column order).
        kenlm_model_path: optional path to an ARPA (or compiled) n-gram LM;
            the kwarg name is kept for drop-in compatibility with the
            reference API, but the file is loaded by this framework's own
            n-gram runtime.
        unigrams: known word vocabulary (inferred from \\1-grams for ARPA).
        alpha: LM weight for shallow fusion.
        beta: per-word length bonus.
        unk_score_offset: log-score offset for OOV words.
        lm_score_boundary: whether the LM scores <s>/</s> boundaries.

    Returns:
        A :class:`BeamSearchDecoderCTC`.
    """
    ngram_model = None if kenlm_model_path is None else open_ngram_file(kenlm_model_path)
    if kenlm_model_path is not None and kenlm_model_path.endswith(".arpa"):
        logger.info("Using arpa instead of binary LM file, decoder instantiation might be slow.")
    if unigrams is None and kenlm_model_path is not None:
        if kenlm_model_path.endswith(".arpa"):
            unigrams = load_unigram_set_from_arpa(kenlm_model_path)
        else:
            logger.warning(
                "Unigrams not provided and cannot be automatically determined from "
                "LM file (only arpa format). Decoding accuracy might be reduced."
            )
    alphabet = Alphabet.build_alphabet(labels)
    if unigrams is not None:
        verify_alphabet_coverage(alphabet, unigrams)
    language_model: Optional[AbstractLanguageModel] = None
    if ngram_model is not None:
        language_model = LanguageModel(
            ngram_model,
            unigrams,
            alpha=alpha,
            beta=beta,
            unk_score_offset=unk_score_offset,
            score_boundary=lm_score_boundary,
        )
    return BeamSearchDecoderCTC(alphabet, language_model)
