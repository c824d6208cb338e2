"""Public TPU decoder: device beam search + host text reconstruction.

:class:`TPUBeamSearchDecoderCTC` mirrors the host
:class:`~pyctcdecode_tpu.decoder.BeamSearchDecoderCTC` API (``decode``,
``decode_beams``, ``decode_batch``, ``decode_beams_batch``) but runs the
whole per-frame pipeline on device via :mod:`pyctcdecode_tpu.engine`. The
host side only normalizes logits, backtraces the returned ``(parent,
token)`` pointers, and replays the transition system to rebuild transcripts
and word-level frame spans (ref output semantics, decoder.py:604-667).

Compiled programs are cached per (padded-T, beam width, K, prune-history,
batch) signature; frame counts are bucketed to multiples of 64 so arbitrary
utterance lengths reuse a small set of executables. All float knobs
(alpha/beta/unk/boundary, pruning thresholds) are traced scalars —
``reset_params`` never triggers recompilation.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from .alphabet import BPE_TOKEN, Alphabet
from .constants import (
    DEFAULT_BEAM_WIDTH,
    DEFAULT_MIN_TOKEN_LOGP,
    DEFAULT_PRUNE_BEAMS,
    DEFAULT_PRUNE_LOGP,
)
from .decoder import NULL_FRAMES, OutputBeam, _normalize_whitespace
from .engine import EngineConfig, make_decode_fn
from .models.base import AbstractLMState, NGramLMState
from .models.device_tables import build_device_lm
from .models.language_model import LanguageModel
from .ops.tokens import KIND_BLANK, KIND_BOUNDARY, build_token_arrays

logger = logging.getLogger(__name__)

_T_BUCKET = 64


def _bucket(t: int) -> int:
    return max(_T_BUCKET, ((t + _T_BUCKET - 1) // _T_BUCKET) * _T_BUCKET)


def replay_token_path(
    token_path: Sequence[int],
    labels: Sequence[str],
    is_bpe: bool,
    frame_offset: int = 0,
) -> Tuple[List[str], List[Tuple[int, int]], str]:
    """Rebuild (words, word frame spans, trailing partial) from a token path.

    Applies the exact reference transition rules (ref decoder.py:452-534)
    to a single beam's chosen-token sequence; entries < 0 are padded frames
    and are skipped. The trailing partial word is force-committed by the
    caller when appropriate (finalization semantics, ref decoder.py:558-577).
    """
    words: List[str] = []
    frames: List[Tuple[int, int]] = []
    partial = ""
    partial_frames = NULL_FRAMES
    last: Optional[int] = None
    force = False
    for pos, tok in enumerate(token_path):
        if tok < 0:
            continue
        t = frame_offset + pos
        char = labels[tok]
        if char == "" or last == tok:
            if char != "":
                partial_frames = (partial_frames[0], t + 1)
            last = tok
            continue
        if is_bpe and (char[:1] == BPE_TOKEN or force):
            force = False
            clean = char
            if char[:1] == BPE_TOKEN:
                clean = clean[1:]
            if char[-1:] == BPE_TOKEN:
                clean = clean[:-1]
                force = True
            if partial:
                words.append(partial)
                frames.append(partial_frames)
            partial = clean
            partial_frames = (t, t + 1)
        elif not is_bpe and char == " ":
            if partial:
                words.append(partial)
                frames.append(partial_frames)
            partial = ""
            partial_frames = NULL_FRAMES
        else:
            partial_frames = (
                (t, t + 1) if partial_frames[0] < 0 else (partial_frames[0], t + 1)
            )
            partial = partial + char
        last = tok
    return words, frames, (partial, partial_frames)


class TPUBeamSearchDecoderCTC:
    """Device-resident CTC beam-search decoder (JAX/XLA engine)."""

    def __init__(
        self,
        alphabet: Alphabet,
        language_model: Optional[LanguageModel] = None,
    ) -> None:
        import jax.numpy as jnp

        self._alphabet = alphabet
        self._labels = alphabet.labels
        self._lm = language_model
        self._tokens = build_token_arrays(alphabet)
        self._device_lm = (
            None if language_model is None else build_device_lm(language_model, self._tokens)
        )
        self._fn_cache: Dict[Any, Any] = {}
        self._jnp = jnp

    # -- configuration ---------------------------------------------------
    @property
    def language_model(self) -> Optional[LanguageModel]:
        return self._lm

    def reset_params(self, **kwargs: Any) -> None:
        """Re-tune LM fusion knobs in place (no recompilation)."""
        if self._lm is not None:
            self._lm.reset_params(**kwargs)

    # -- compiled-function cache -------------------------------------------
    def _get_fn(self, t_pad: int, beam_width: int, k: int, prune_history: bool, batch: int):
        import jax

        key = (t_pad, beam_width, k, prune_history, batch)
        fn = self._fn_cache.get(key)
        if fn is None:
            cfg = EngineConfig(
                beam_width=beam_width,
                vocab_size=len(self._labels),
                k_tokens=k,
                is_bpe=self._alphabet.is_bpe,
                use_lm=self._lm is not None,
                order=1 if self._lm is None else self._lm.order,
                prune_history=prune_history,
            )
            raw = make_decode_fn(cfg, self._tokens, self._device_lm)
            if batch > 1:
                raw = jax.vmap(raw, in_axes=(0, 0, None, None, None))
            fn = jax.jit(raw)
            self._fn_cache[key] = fn
        return fn

    # -- call-time parameters ------------------------------------------------
    def _params_vector(
        self, token_min_logp: float, beam_prune_logp: float
    ) -> np.ndarray:
        if self._lm is None:
            tail = [0.0, 0.0, 0.0, 0.0]
        else:
            tail = [
                float(self._lm.alpha),
                float(self._lm.beta),
                float(self._lm.unk_score_offset),
                1.0 if self._lm.score_boundary else 0.0,
            ]
        return np.array(
            [token_min_logp, beam_prune_logp] + tail, dtype=np.float32
        )

    def _start_ctx(
        self, lm_start_state: Optional[AbstractLMState]
    ) -> Tuple[np.ndarray, int]:
        order = 1 if self._lm is None else self._lm.order
        width = max(order - 1, 1)
        ctx = np.full(width, -1, dtype=np.int32)
        if self._lm is None:
            return ctx, 0
        if lm_start_state is None:
            state = self._lm.get_start_state()
        else:
            state = lm_start_state
        if not isinstance(state, NGramLMState):
            raise AssertionError(
                f"Expected NGramLMState, got {type(lm_start_state)}"
            )
        words = state.context[-(width):] if width else ()
        for i, wid in enumerate(words):
            ctx[width - len(words) + i] = wid
        return ctx, len(words)

    # -- output assembly -----------------------------------------------------
    def _build_outputs(
        self,
        out: Dict[str, np.ndarray],
        n_frames: int,
        top_n: Optional[int] = None,
    ) -> List[OutputBeam]:
        parents = np.asarray(out["parents"])  # [Tp, B]
        trace = np.asarray(out["trace"])  # [Tp, B]
        beam_src = np.asarray(out["beam_src"])  # [B]
        logit = np.asarray(out["logit"])
        lm_score = np.asarray(out["lm_score"])
        ctx = np.asarray(out["ctx"])
        ctx_len = np.asarray(out["ctx_len"])
        t_pad = parents.shape[0]

        results: List[OutputBeam] = []
        limit = len(beam_src) if top_n is None else min(top_n, len(beam_src))
        for rank in range(limit):
            if lm_score[rank] <= -1.0e29:
                break
            b = int(beam_src[rank])
            toks = np.empty(t_pad, dtype=np.int64)
            cur = b
            for t in range(t_pad - 1, -1, -1):
                toks[t] = trace[t, cur]
                cur = parents[t, cur]
            words, frames, (partial, pframes) = replay_token_path(
                toks[:n_frames] if n_frames < t_pad else toks,
                self._labels,
                self._alphabet.is_bpe,
            )
            if partial:
                words.append(partial)
                frames.append(pframes)
            text = " ".join(words)
            if self._lm is None:
                last_state: Optional[NGramLMState] = None
            else:
                n_ctx = int(ctx_len[rank])
                width = ctx.shape[1]
                last_state = NGramLMState(
                    tuple(int(w) for w in ctx[rank, width - n_ctx :])
                    if n_ctx
                    else ()
                )
            results.append(
                OutputBeam(
                    text=_normalize_whitespace(text),
                    last_lm_state=last_state,
                    text_frames=list(zip(words, frames)),
                    logit_score=float(logit[rank]),
                    lm_score=float(lm_score[rank]),
                )
            )
        return results

    # -- public API ------------------------------------------------------------
    def decode_beams(
        self,
        logits: np.ndarray,
        beam_width: int = DEFAULT_BEAM_WIDTH,
        beam_prune_logp: float = DEFAULT_PRUNE_LOGP,
        token_min_logp: float = DEFAULT_MIN_TOKEN_LOGP,
        prune_history: bool = DEFAULT_PRUNE_BEAMS,
        hotwords: Optional[Iterable[str]] = None,
        lm_start_state: Optional[AbstractLMState] = None,
        max_tokens_per_frame: Optional[int] = None,
    ) -> List[OutputBeam]:
        """Decode one utterance on device; returns ranked OutputBeams."""
        if hotwords is not None and list(hotwords):
            raise NotImplementedError(
                "Hotword boosting on the device engine lands with the device "
                "hotword trie; use BeamSearchDecoderCTC (host engine) for now."
            )
        if logits.ndim != 2 or logits.shape[1] != len(self._labels):
            raise ValueError(
                f"Input logits of shape {logits.shape}, but vocabulary is "
                f"size {len(self._labels)}"
            )
        v = len(self._labels)
        k = v if max_tokens_per_frame is None else min(max_tokens_per_frame, v)
        t = logits.shape[0]
        t_pad = _bucket(t)
        logp = normalize_host(logits)
        logp_pad = np.full((t_pad, v), 0.0, dtype=np.float32)
        logp_pad[:t] = logp
        fn = self._get_fn(t_pad, beam_width, k, prune_history, batch=1)
        params = self._params_vector(token_min_logp, beam_prune_logp)
        ctx0, ctx0_len = self._start_ctx(lm_start_state)
        out = fn(
            self._jnp.asarray(logp_pad),
            np.int32(t),
            self._jnp.asarray(params),
            self._jnp.asarray(ctx0),
            np.int32(ctx0_len),
        )
        return self._build_outputs(out, n_frames=t)

    def decode(
        self,
        logits: np.ndarray,
        beam_width: int = DEFAULT_BEAM_WIDTH,
        beam_prune_logp: float = DEFAULT_PRUNE_LOGP,
        token_min_logp: float = DEFAULT_MIN_TOKEN_LOGP,
        lm_start_state: Optional[AbstractLMState] = None,
        max_tokens_per_frame: Optional[int] = None,
    ) -> str:
        """Top transcript for one utterance."""
        return self.decode_beams(
            logits,
            beam_width=beam_width,
            beam_prune_logp=beam_prune_logp,
            token_min_logp=token_min_logp,
            prune_history=True,
            lm_start_state=lm_start_state,
            max_tokens_per_frame=max_tokens_per_frame,
        )[0].text

    def decode_beams_batch(
        self,
        logits_list: Sequence[np.ndarray],
        beam_width: int = DEFAULT_BEAM_WIDTH,
        beam_prune_logp: float = DEFAULT_PRUNE_LOGP,
        token_min_logp: float = DEFAULT_MIN_TOKEN_LOGP,
        prune_history: bool = DEFAULT_PRUNE_BEAMS,
        max_tokens_per_frame: Optional[int] = None,
        batch_pad: int = 8,
    ) -> List[List[OutputBeam]]:
        """Vectorized batch decode: one fused device program per batch.

        All utterances are padded to a shared frame bucket and vmapped; the
        batch dimension is padded to a multiple of ``batch_pad`` so repeated
        calls reuse compiled executables.
        """
        if not logits_list:
            return []
        v = len(self._labels)
        k = v if max_tokens_per_frame is None else min(max_tokens_per_frame, v)
        lens = [l.shape[0] for l in logits_list]
        t_pad = _bucket(max(lens))
        n = len(logits_list)
        n_pad = ((n + batch_pad - 1) // batch_pad) * batch_pad
        logp = np.zeros((n_pad, t_pad, v), dtype=np.float32)
        for i, mat in enumerate(logits_list):
            if mat.ndim != 2 or mat.shape[1] != v:
                raise ValueError(
                    f"Input logits of shape {mat.shape}, but vocabulary is size {v}"
                )
            logp[i, : mat.shape[0]] = normalize_host(mat)
        n_frames = np.zeros(n_pad, dtype=np.int32)
        n_frames[:n] = lens
        fn = self._get_fn(t_pad, beam_width, k, prune_history, batch=n_pad)
        params = self._params_vector(token_min_logp, beam_prune_logp)
        ctx0, ctx0_len = self._start_ctx(None)
        out = fn(
            self._jnp.asarray(logp),
            self._jnp.asarray(n_frames),
            self._jnp.asarray(params),
            self._jnp.asarray(ctx0),
            np.int32(ctx0_len),
        )
        host = {key: np.asarray(val) for key, val in out.items()}
        results = []
        for i in range(n):
            one = {key: val[i] for key, val in host.items()}
            results.append(self._build_outputs(one, n_frames=lens[i]))
        return results

    def decode_batch(
        self,
        logits_list: Sequence[np.ndarray],
        beam_width: int = DEFAULT_BEAM_WIDTH,
        beam_prune_logp: float = DEFAULT_PRUNE_LOGP,
        token_min_logp: float = DEFAULT_MIN_TOKEN_LOGP,
        max_tokens_per_frame: Optional[int] = None,
    ) -> List[str]:
        """Batch top-1 transcripts."""
        beams = self.decode_beams_batch(
            logits_list,
            beam_width=beam_width,
            beam_prune_logp=beam_prune_logp,
            token_min_logp=token_min_logp,
            prune_history=True,
            max_tokens_per_frame=max_tokens_per_frame,
        )
        return [b[0].text if b else "" for b in beams]


def normalize_host(logits: np.ndarray) -> np.ndarray:
    """Host-side logit normalization to f32 log-probs (sniff rule as ref)."""
    from .utils.logits import normalize_to_logp

    return normalize_to_logp(np.asarray(logits)).astype(np.float32)
