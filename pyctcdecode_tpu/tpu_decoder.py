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

import dataclasses
import logging
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple, Union

import numpy as np

from .alphabet import BPE_TOKEN, Alphabet
from .constants import (
    DEFAULT_BEAM_WIDTH,
    DEFAULT_HOTWORD_WEIGHT,
    DEFAULT_MIN_TOKEN_LOGP,
    DEFAULT_PRUNE_BEAMS,
    DEFAULT_PRUNE_LOGP,
)
from .decoder import NULL_FRAMES, LMBeam, OutputBeam, collapse_spaces
from .engine import (
    DEAD_THRESH,
    EngineConfig,
    build_table_args,
    make_decode_fn,
    make_segment_decode_fns,
    make_stream_fns,
)
from .models.base import AbstractLMState, NGramLMState
from .models.device_tables import build_device_lm
from .models.language_model import LanguageModel
from .ops.tokens import build_token_arrays
from .utils.logits import blank_collapse as blank_collapse_frames

logger = logging.getLogger(__name__)

_T_BUCKET = 64


def _bucket(t: int) -> int:
    return max(_T_BUCKET, ((t + _T_BUCKET - 1) // _T_BUCKET) * _T_BUCKET)


def _auto_k(counts: np.ndarray, v: int) -> int:
    """Smallest bucketed token preselect covering every frame's admission.

    ``counts`` holds per-frame admitted-token counts (tokens at or above the
    call's ``token_min_logp``; the argmax-inclusion rule never adds a token
    beyond that set when it is non-empty, ref decoder.py:444-445, so
    ``max(counts, 1)`` is the exact candidate-set width). Buckets step by
    ~1.5x (4, 6, 8, 12, 16, 24, 32, ...): engine cost scales with K, so a
    tighter ladder prices K closer to the data while still bounding the
    number of distinct compiled programs.
    """
    need = int(max(counts.max(initial=1), 1)) if counts.size else 1
    k = 4
    while k < need:
        k = k * 3 // 2 if (k & (k - 1)) == 0 else k * 4 // 3
    return min(k, v)


def replay_token_path(
    token_path: Sequence[int],
    labels: Sequence[str],
    is_bpe: bool,
    frame_offset: int = 0,
    frame_ids: Optional[Sequence[int]] = None,
) -> Tuple[List[str], List[Tuple[int, int]], Tuple[str, Tuple[int, int]]]:
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
        if tok == -2:
            # forced word commit between chunks (ref decoder.py:558-577):
            # promote the partial, reset last-char so repeats restart
            if partial:
                words.append(partial)
                frames.append(partial_frames)
            partial = ""
            partial_frames = NULL_FRAMES
            last = None
            force = False
            continue
        if tok < 0:
            continue
        t = frame_ids[pos] if frame_ids is not None else frame_offset + pos
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


def replay_token_path_np(
    token_path: np.ndarray,
    labels: Sequence[str],
    blank_id: int,
    space_id: int,
    frame_ids: Optional[np.ndarray] = None,
    frame_offset: int = 0,
) -> Tuple[List[str], List[Tuple[int, int]]]:
    """Vectorized non-BPE :func:`replay_token_path` with the partial folded.

    Equivalent to ``replay_token_path(...)`` followed by appending the
    trailing partial (finalization semantics) — the per-step Python loop
    was the dominant collect-phase cost at serving batch sizes (768
    utterances x ~900 steps). Only for char alphabets without ``-2``
    force-commit markers (callers fall back to the exact Python loop
    otherwise). Returns ``(words, word_frames)``.
    """
    toks = np.asarray(token_path)
    idx = np.flatnonzero(toks >= 0)
    if idx.size == 0:
        return [], []
    seq = toks[idx]
    if frame_ids is not None:
        t = np.asarray(frame_ids)[idx]
    else:
        t = frame_offset + idx
    prev = np.empty_like(seq)
    prev[0] = -1  # no predecessor: first real token is always "new"
    prev[1:] = seq[:-1]
    new = seq != prev
    letters = (seq != blank_id) & (seq != space_id)
    emit_letter = letters & new
    if not emit_letter.any():
        return [], []
    emit_space = (seq == space_id) & new
    word_of = np.cumsum(emit_space)  # word index per event position
    wl = word_of[emit_letter]
    first = np.flatnonzero(np.diff(wl, prepend=wl[0] - 1))
    last_plus = np.append(first[1:], wl.size)
    chars = [labels[c] for c in seq[emit_letter]]
    words = ["".join(chars[a:b]) for a, b in zip(first, last_plus)]
    # spans: start = first letter EMIT of the word; end = last letter
    # event (emit or repeat both extend the span, ref decoder.py:453-461,
    # 519-523) + 1. Letter repeats never straddle a word boundary (a space
    # or blank in between resets `last`), so grouping repeats by the
    # word of their position is exact.
    ws = word_of[letters]
    t_letters = t[letters]
    first_ws = np.flatnonzero(np.diff(ws, prepend=ws[0] - 1))
    last_ws = np.append(first_ws[1:], ws.size) - 1
    starts = t[emit_letter][first]
    ends = t_letters[last_ws] + 1
    frames = list(zip(starts.tolist(), ends.tolist()))
    return words, frames


def replay_token_paths_batch(
    toks: np.ndarray,
    labels: Sequence[str],
    blank_id: int,
    space_id: int,
    frame_ids: Optional[np.ndarray] = None,
) -> List[Tuple[List[str], List[Tuple[int, int]]]]:
    """Batched :func:`replay_token_path_np`: one numpy pass over ALL rows.

    ``toks``: ``[R, T]`` chosen-token paths (entries < 0 skipped — the
    -1 pad and -3 timeline carry markers); ``frame_ids``: optional
    ``[R, T]`` original frame index per position (blank-collapse /
    timeline mapping). Only for char alphabets without ``-2``
    force-commit markers, same contract as the single-row fast replay.
    Returns one ``(words, word_frames)`` pair per row.

    The per-utterance replay was the collect phase's dominant cost at
    serving batch sizes (~0.5 s per 768-utterance batch: hundreds of
    small numpy calls under the GIL); flattening all rows into one
    event stream makes it ~15 numpy passes total. Row boundaries join
    the word-segmentation key, so no word or repeat-run can straddle
    rows. Fuzz-pinned against the per-row replay in tests.
    """
    r_rows, t_pad = toks.shape
    out: List[Tuple[List[str], List[Tuple[int, int]]]] = [
        ([], []) for _ in range(r_rows)
    ]
    flat = toks.reshape(-1)
    keep = flat >= 0
    if not keep.any():
        return out
    pos = np.flatnonzero(keep)
    seq = flat[pos].astype(np.int64)
    row = pos // t_pad
    if frame_ids is not None:
        t = np.asarray(frame_ids).reshape(-1)[pos].astype(np.int64)
    else:
        t = (pos % t_pad).astype(np.int64)
    first_of_row = np.empty(seq.shape, dtype=bool)
    first_of_row[0] = True
    first_of_row[1:] = row[1:] != row[:-1]
    prev = np.empty_like(seq)
    prev[0] = -1
    prev[1:] = seq[:-1]
    new = (seq != prev) | first_of_row
    letters = (seq != blank_id) & (seq != space_id)
    emit_letter = letters & new
    if not emit_letter.any():
        return out
    emit_space = (seq == space_id) & new
    # global segment id: increments at every space emit AND at row starts,
    # so segments (words) never merge across rows
    word_of = np.cumsum(emit_space | first_of_row)
    wl = word_of[emit_letter]
    first = np.flatnonzero(np.diff(wl, prepend=wl[0] - 1))
    last_plus = np.append(first[1:], wl.size)
    # width set by the longest label: a fixed U1 would silently truncate
    # multi-char labels, which non-BPE alphabets may technically carry
    # (the blank's empty string is fine — blanks never reach emit_letter)
    lab_w = max(1, max(len(lab) for lab in labels))
    lab_arr = np.array(list(labels), dtype=f"U{lab_w}")
    chars = lab_arr[seq[emit_letter]]
    words = ["".join(chars[a:b]) for a, b in zip(first, last_plus)]
    # spans: start = the word's first letter EMIT; end = its last letter
    # event (emit or repeat) + 1. A letter repeat shares its word's
    # segment id (a space/blank in between would break the repeat), so
    # grouping by segment id is exact — see replay_token_path_np.
    ws = word_of[letters]
    t_letters = t[letters]
    first_ws = np.flatnonzero(np.diff(ws, prepend=ws[0] - 1))
    last_ws = np.append(first_ws[1:], ws.size) - 1
    starts = t[emit_letter][first]
    ends = t_letters[last_ws] + 1
    row_of_word = row[emit_letter][first]
    # regroup flat words into rows (row_of_word is non-decreasing)
    bounds = np.searchsorted(row_of_word, np.arange(r_rows + 1))
    starts_l = starts.tolist()
    ends_l = ends.tolist()
    for i in range(r_rows):
        a, b = bounds[i], bounds[i + 1]
        if a == b:
            continue
        out[i] = (
            words[a:b],
            list(zip(starts_l[a:b], ends_l[a:b])),
        )
    return out


@dataclasses.dataclass
class DeviceStreamState:
    """Caller-held streaming decode state (ref decoder.py:669-728 analog).

    ``beam_state`` lives on device between chunks; ``chunks`` holds the host
    copies of per-chunk backpointers needed to rebuild transcripts (cleared
    at each force-commit boundary, where transcripts fold into
    ``prefix_words``/``prefix_spans`` instead).
    """

    beam_state: Any
    chunks: List[Tuple[np.ndarray, np.ndarray, int]]
    processed_frames: int
    beam_width: int
    k_tokens: int
    prune_history: bool
    use_hotwords: bool = False
    hot_sig: Any = None  # (frozenset(unigrams), weight) of the last chunk
    last_partials: Optional[List[str]] = None  # carried beams' partial words
    # committed transcript prefix per carried slot, folded at force-commit
    # boundaries so ``chunks`` (and the per-call backtrace cost) stays
    # proportional to the frames since the last commit, not the stream length
    prefix_words: Optional[List[List[str]]] = None
    prefix_spans: Optional[List[List[Tuple[int, int]]]] = None


def _backtrace_chunks(
    chunks: Sequence[Tuple[np.ndarray, np.ndarray, int]], start_idx: int
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Walk backpointers across chunk boundaries.

    Returns the chosen-token sequence and matching absolute frame ids for
    one beam (oldest frame first), plus the slot index reached at the start
    of the oldest chunk (the beam's origin in any folded committed prefix).
    """
    toks_rev: List[np.ndarray] = []
    frames_rev: List[np.ndarray] = []
    cur = start_idx
    for parents, trace, offset in reversed(chunks):
        tc = parents.shape[0]
        toks = np.empty(tc, dtype=np.int64)
        for t in range(tc - 1, -1, -1):
            toks[t] = trace[t, cur]
            cur = int(parents[t, cur])
        toks_rev.append(toks)
        frames_rev.append(offset + np.arange(tc))
    if not toks_rev:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64), cur
    return (
        np.concatenate(list(reversed(toks_rev))),
        np.concatenate(list(reversed(frames_rev))),
        cur,
    )


class TPUBeamSearchDecoderCTC:
    """Device-resident CTC beam-search decoder (JAX/XLA engine)."""

    def __init__(
        self,
        alphabet: Alphabet,
        language_model: Optional[LanguageModel] = None,
        segment_frames: Optional[int] = None,
        fast_topk: bool = False,
    ) -> None:
        import jax.numpy as jnp

        from .models.language_model import MultiLanguageModel

        # approx_max_k ranking: exact top-k SET, tie order may diverge from
        # the reference's enumeration order (see EngineConfig.fast_topk)
        self._fast_topk = fast_topk
        # batch decoding runs as host-dispatched segments of unrolled frames
        # on accelerators (in-loop gathers take XLA's scalar path, ~40x
        # slower than top-level gathers; see make_segment_decode_fns). 0
        # forces the single-program lax.scan path; None = pick per backend.
        self._segment_frames = segment_frames
        self._alphabet = alphabet
        self._labels = alphabet.labels
        self._blank_id = self._labels.index("")  # CTC blank (always present)
        self._lm = language_model
        self._tokens = build_token_arrays(alphabet)
        if language_model is None:
            self._lm_members = []
        elif isinstance(language_model, MultiLanguageModel):
            members = list(language_model._language_models)
            for m in members:
                if isinstance(m, MultiLanguageModel):
                    raise NotImplementedError(
                        "nested MultiLanguageModel is not supported on the "
                        "device engine"
                    )
            self._lm_members = members
        else:
            self._lm_members = [language_model]
        self._device_lm = [
            build_device_lm(m, self._tokens) for m in self._lm_members
        ] or None
        # table arrays are runtime inputs to the compiled programs (uploaded
        # once here, never baked into executables)
        self._tabs = build_table_args(jnp, self._tokens, self._device_lm)
        self._fn_cache: Dict[Any, Any] = {}
        # hotword device tables keyed by the unigram set (per-call
        # rebuild + upload dominated streaming-chunk latency otherwise)
        self._hot_cache: Dict[tuple, Any] = {}
        self._jnp = jnp

    # -- configuration ---------------------------------------------------
    @property
    def language_model(self) -> Optional[LanguageModel]:
        return self._lm

    def with_options(self, **overrides: Any) -> "TPUBeamSearchDecoderCTC":
        """A decoder sharing this one's device LM tables under different
        engine options.

        ``overrides`` may set any of ``fast_topk`` or ``segment_frames``.
        Building the device tables is the expensive
        part of construction (seconds for a production-scale n-gram LM),
        while the options only select which programs get compiled — so
        serving setups that want both a parity decoder and a throughput
        decoder (e.g. ``fast_topk=True``) should derive the second from
        the first instead of paying the table build twice. The clone
        starts with an empty compiled-function cache; the original is
        unchanged — including its LM fusion knobs: the clone gets its own
        copies of the ``LanguageModel`` wrappers (the heavy n-gram model
        and device tables stay shared), so ``reset_params`` on one
        decoder never retunes the other.
        """
        import copy

        from .models.language_model import MultiLanguageModel

        allowed = ("fast_topk", "segment_frames")
        bad = sorted(set(overrides) - set(allowed))
        if bad:
            raise ValueError(
                f"unknown engine option(s) {bad}; with_options accepts "
                f"{list(allowed)}"
            )
        clone = copy.copy(self)
        clone._fn_cache = {}
        # per-clone knob containers: alpha/beta/unk/boundary live on the
        # LanguageModel wrappers and are read per decode call, so sharing
        # the wrapper objects would let reset_params on either decoder
        # silently retune both (the knobs are traced scalars — copying the
        # wrappers costs nothing and never recompiles)
        if self._lm is not None:
            clone._lm_members = [copy.copy(m) for m in self._lm_members]
            if isinstance(self._lm, MultiLanguageModel):
                clone._lm = copy.copy(self._lm)
                clone._lm._language_models = list(clone._lm_members)
            else:
                clone._lm = clone._lm_members[0]
        for name, value in overrides.items():
            setattr(clone, f"_{name}", value)
        return clone

    def reset_params(self, **kwargs: Any) -> None:
        """Re-tune LM fusion knobs in place (no recompilation)."""
        if self._lm is not None:
            self._lm.reset_params(**kwargs)

    # -- compiled-function cache -------------------------------------------
    def _engine_cfg(
        self,
        beam_width: int,
        k: int,
        prune_history: bool,
        use_hotwords: bool,
        emit_paths: Optional[int] = None,
        collect_stats: bool = False,
        token_timeline: bool = False,
    ) -> EngineConfig:
        orders = tuple(m.order for m in self._lm_members)
        return EngineConfig(
            beam_width=beam_width,
            vocab_size=len(self._labels),
            k_tokens=k,
            is_bpe=self._alphabet.is_bpe,
            use_lm=bool(orders),
            order=max(orders) if orders else 1,
            prune_history=prune_history,
            use_hotwords=use_hotwords,
            orders=orders,
            emit_paths=emit_paths,
            collect_stats=collect_stats,
            fast_topk=self._fast_topk,
            token_timeline=token_timeline,
        )

    def _get_fn(
        self,
        t_pad: int,
        beam_width: int,
        k: int,
        prune_history: bool,
        batch: int,
        use_hotwords: bool = False,
        emit_paths: Optional[int] = None,
        collect_stats: bool = False,
        token_timeline: bool = False,
    ):
        import jax

        key = (
            t_pad, beam_width, k, prune_history, batch, use_hotwords,
            emit_paths, collect_stats, token_timeline,
        )
        fn = self._fn_cache.get(key)
        if fn is None:
            cfg = self._engine_cfg(
                beam_width, k, prune_history, use_hotwords, emit_paths,
                collect_stats, token_timeline,
            )
            raw = make_decode_fn(cfg, self._tokens, self._device_lm)
            if batch > 1:
                raw = jax.vmap(raw, in_axes=(0, 0, None, None, None, None))
            fn = jax.jit(raw)
            self._fn_cache[key] = fn
        return fn

    def _segment_frames_effective(self) -> int:
        """Frames per segment program for batch decode (0 = lax.scan path).

        Default: 16-frame segments on accelerators, the one-program scan on
        CPU (where the while-loop gather penalty does not exist and per-call
        unrolled programs would only slow compiles — e.g. the test suite).
        """
        if self._segment_frames is not None:
            return self._segment_frames
        import jax

        return 16 if jax.devices()[0].platform != "cpu" else 0

    def _get_segment_fns(
        self,
        seg_frames: int,
        beam_width: int,
        k: int,
        prune_history: bool,
        batch: int,
        use_hotwords: bool,
        emit_paths: Optional[int],
        collect_stats: bool = False,
        token_timeline: bool = False,
    ):
        import jax

        key = (
            "seg", seg_frames, beam_width, k, prune_history, batch,
            use_hotwords, emit_paths, collect_stats, token_timeline,
        )
        fns = self._fn_cache.get(key)
        if fns is None:
            cfg = self._engine_cfg(
                beam_width, k, prune_history, use_hotwords, emit_paths,
                collect_stats, token_timeline,
            )
            init_fn, seg_fn, fin_fn = make_segment_decode_fns(
                cfg, self._tokens, self._device_lm, seg_frames
            )
            jnp = self._jnp

            def init_batched(start):
                state = init_fn(start)
                return jax.tree_util.tree_map(
                    lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state
                )

            fns = (
                jax.jit(init_batched),
                jax.jit(
                    jax.vmap(seg_fn, in_axes=(0, 0, None, 0, None, None, None))
                ),
                jax.jit(jax.vmap(fin_fn, in_axes=(0, None, None, 0, None))),
            )
            self._fn_cache[key] = fns
        return fns

    def _hot_tables(self, hotwords, weight: float):
        """Per-call hotword trie arrays: (device pytree, weight, host arrays).

        Returns ``(None, 0.0, None)`` when no hotwords are given.
        """
        from .models.device_tables import build_hotword_tables
        from .models.hotwords import HotwordScorer

        scorer = HotwordScorer.build_scorer(hotwords, weight=weight)
        if not scorer.unigrams:
            return None, 0.0, None
        key = tuple(sorted(scorer.unigrams))
        cached = self._hot_cache.get(key)
        if cached is None:
            tables = build_hotword_tables(
                list(key), self._tokens.char2id, self._tokens
            )
            cached = (self._hot_to_device(tables), tables)
            if len(self._hot_cache) >= 8:  # bound per-call table churn
                self._hot_cache.pop(next(iter(self._hot_cache)))
            self._hot_cache[key] = cached
        return cached[0], float(weight), cached[1]

    def _hot_to_device(self, tables):
        return {
            "next": self._jnp.asarray(tables["next"]),
            "seed": self._jnp.asarray(tables["seed"]),
            "dead": int(tables["dead"]),
        }

    def _empty_hot(self):
        """Root-only hotword trie (streaming chunks without hotwords)."""
        from .models.device_tables import empty_hotword_tables

        tables = getattr(self, "_empty_hot_np", None)
        if tables is None:
            tables = empty_hotword_tables(self._tokens)
            self._empty_hot_np = tables
        return self._hot_to_device(tables), 0.0, tables

    def _get_stream_fns(
        self, beam_width: int, k: int, prune_history: bool, use_hotwords: bool
    ):
        import jax

        key = ("stream", beam_width, k, prune_history, use_hotwords)
        fns = self._fn_cache.get(key)
        if fns is None:
            cfg = self._engine_cfg(beam_width, k, prune_history, use_hotwords)
            init_fn, chunk_fn, finalize_fn = make_stream_fns(
                cfg, self._tokens, self._device_lm
            )
            fns = (init_fn, jax.jit(chunk_fn), jax.jit(finalize_fn))
            self._fn_cache[key] = fns
        return fns

    # -- streaming API ---------------------------------------------------------
    def get_starting_state(
        self,
        beam_width: int = DEFAULT_BEAM_WIDTH,
        prune_history: bool = DEFAULT_PRUNE_BEAMS,
        max_tokens_per_frame: Optional[Union[int, str]] = None,
        lm_start_state: Optional[AbstractLMState] = None,
        hotwords_enabled: bool = False,
    ) -> DeviceStreamState:
        """Fresh device-resident streaming state (ref decoder.py:669-679).

        The host engine's starting state is (beams, score caches); the
        device analog is one beam-state pytree living on device plus an
        empty backpointer log. Decode geometry (beam width, token preselect,
        history pruning) is fixed at state creation because it shapes the
        compiled program.
        """
        v = len(self._labels)
        if max_tokens_per_frame == "auto":
            raise ValueError(
                "streaming decode geometry is fixed before any logits are "
                "seen; pass an integer max_tokens_per_frame (or None for "
                "the exact full-vocabulary preselect)"
            )
        k = v if max_tokens_per_frame is None else min(max_tokens_per_frame, v)
        init_fn, _, _ = self._get_stream_fns(
            beam_width, k, prune_history, hotwords_enabled
        )
        start = self._start_ctx(lm_start_state)
        state = init_fn(start)
        return DeviceStreamState(
            beam_state=state,
            chunks=[],
            processed_frames=0,
            beam_width=beam_width,
            k_tokens=k,
            prune_history=prune_history,
            use_hotwords=hotwords_enabled,
        )

    def partial_decode_beams(
        self,
        stream_state: DeviceStreamState,
        logits_chunk: np.ndarray,
        beam_prune_logp: float = DEFAULT_PRUNE_LOGP,
        token_min_logp: float = DEFAULT_MIN_TOKEN_LOGP,
        hotwords: Optional[Iterable[str]] = None,
        hotword_weight: float = DEFAULT_HOTWORD_WEIGHT,
        force_next_word: bool = False,
        is_end: bool = False,
    ) -> List[LMBeam]:
        """Consume one chunk of logits; returns the ranked current view.

        Device analog of ref ``decoder.py:681-728``: ``stream_state`` is
        updated in place (beam arrays stay on device between calls); the
        returned :class:`LMBeam` list is the finalized view of the current
        hypotheses (committed words only in ``.text``, trailing partial in
        ``.partial_word`` unless ``force_next_word``/``is_end`` commits it).
        The chunked == full-decode invariant is tested in
        ``tests/test_streaming_device.py``.
        """
        if logits_chunk.ndim != 2 or logits_chunk.shape[1] != len(self._labels):
            raise ValueError(
                f"Input logits of shape {logits_chunk.shape}, but vocabulary "
                f"is size {len(self._labels)}"
            )
        # materialize once: generators would be consumed by the first pass
        # below and leave the hot-signature / scorer builds inconsistent
        hotwords = list(hotwords) if hotwords is not None else None
        ss = stream_state
        _, chunk_fn, finalize_fn = self._get_stream_fns(
            ss.beam_width, ss.k_tokens, ss.prune_history, ss.use_hotwords
        )
        if ss.use_hotwords:
            hot, weight, hot_np = self._hot_tables(hotwords, hotword_weight)
            if hot is None:
                hot, weight, hot_np = self._empty_hot()
            # swapping scorers invalidates carried trie nodes: rewalk each
            # carried beam's partial word through the new trie host-side
            # (ref rebuilds prefix membership from strings every call)
            new_sig = (
                tuple(sorted(hotwords)) if hotwords else (),
                float(weight),
            )
            if ss.hot_sig is not None and new_sig != ss.hot_sig:
                from .models.device_tables import HOT_NODE_MASK

                partials = ss.last_partials or [""] * ss.beam_width
                nodes = np.zeros(ss.beam_width, dtype=np.int32)
                bits = np.zeros(ss.beam_width, dtype=np.int32)
                nxt = np.asarray(hot["next"])
                dead = int(hot["dead"])
                for bi, word in enumerate(partials):
                    node, entry = 0, 0
                    for ch in word:
                        cid = self._tokens.char2id.get(ch)
                        if cid is None:
                            node, entry = dead, dead
                            break
                        entry = int(nxt[node, cid])
                        node = entry & HOT_NODE_MASK
                    nodes[bi] = node
                    bits[bi] = entry & ~HOT_NODE_MASK
                ss.beam_state = dict(ss.beam_state)
                ss.beam_state["h_node"] = self._jnp.asarray(nodes)
                ss.beam_state["h_bits"] = self._jnp.asarray(bits)
            ss.hot_sig = new_sig
        else:
            if hotwords is not None and list(hotwords):
                raise ValueError(
                    "stream state was created without hotword support; pass "
                    "hotwords_enabled=True to get_starting_state"
                )
            hot = None
        params = self._params_vector(
            token_min_logp, beam_prune_logp,
            weight if ss.use_hotwords else 0.0,
        )
        t = logits_chunk.shape[0]
        v = len(self._labels)
        t_pad = _bucket(t)
        logp_pad = np.zeros((t_pad, v), dtype=np.float32)
        if t:
            logp_pad[:t] = normalize_host(logits_chunk)
        state1, parents, trace = chunk_fn(
            ss.beam_state, self._jnp.asarray(logp_pad), np.int32(t),
            self._jnp.asarray(params), self._tabs, hot,
        )
        committed = force_next_word or is_end
        fin = finalize_fn(
            state1,
            self._jnp.asarray(params),
            np.float32(1.0 if committed else 0.0),
            np.float32(1.0 if is_end else 0.0),
            self._tabs,
            hot,
        )
        # fetch every per-chunk output CONCURRENTLY: each device->host
        # fetch pays the relay's fixed round trip (~25 ms), and five
        # serial fetches were most of the per-chunk latency
        from .utils.logits import _host_pool

        parents_h, trace_h, beam_src, scores, logits_out = _host_pool().map(
            np.asarray,
            [parents, trace, fin["src"], fin["score"], fin["logit"]],
        )
        if t:
            ss.chunks.append(
                (parents_h[:t], trace_h[:t], ss.processed_frames)
            )

        beams: List[LMBeam] = []
        view_slots: List[int] = []  # carried slot behind each ranked view row
        rank_words: List[List[str]] = []  # per-rank word lists (fold source)
        rank_spans: List[List[Tuple[int, int]]] = []
        for rank in range(ss.beam_width):
            if scores[rank] <= DEAD_THRESH:
                break
            slot = int(beam_src[rank])
            view_slots.append(slot)
            tokens, frame_ids, origin = _backtrace_chunks(ss.chunks, slot)
            words, spans, (partial, pframes) = replay_token_path(
                tokens, self._labels, self._alphabet.is_bpe, frame_ids=frame_ids
            )
            if ss.prefix_words is not None:
                # prepend the folded committed prefix of this beam's origin
                words = ss.prefix_words[origin] + words
                spans = ss.prefix_spans[origin] + spans
            last_label: Optional[str] = None
            for tok in reversed(tokens):
                if tok >= 0:
                    last_label = self._labels[tok]
                    break
            if committed:
                if partial:
                    words = words + [partial]
                    spans = spans + [pframes]
                partial, pframes = "", NULL_FRAMES
                last_label = None
            rank_words.append(words)
            rank_spans.append(spans)
            beams.append(
                LMBeam(
                    text=" ".join(words),
                    next_word="",
                    partial_word=partial,
                    last_char=last_label,
                    text_frames=spans,
                    partial_frames=pframes,
                    logit_score=float(logits_out[rank]),
                    lm_score=float(scores[rank]),
                )
            )

        if committed:
            # fold the fully-committed transcripts into per-slot prefixes and
            # drop every backpointer chunk: the next backtrace only walks
            # frames after this boundary (O(chunk), not O(stream))
            ss.beam_state = fin["committed_state"]
            prefix_words: List[List[str]] = [[] for _ in range(ss.beam_width)]
            prefix_spans: List[List[Tuple[int, int]]] = [
                [] for _ in range(ss.beam_width)
            ]
            for rank in range(len(beams)):
                # committed_state rows are in ranked (view) order; fold
                # the replay's own word lists (re-splitting beam.text
                # would desync words from spans for any label containing
                # whitespace)
                prefix_words[rank] = list(rank_words[rank])
                prefix_spans[rank] = list(rank_spans[rank])
            ss.prefix_words = prefix_words
            ss.prefix_spans = prefix_spans
            ss.chunks = []
            ss.last_partials = [""] * ss.beam_width
        else:
            ss.beam_state = state1
            # partial words keyed by CARRIED slot (view rank r lives in
            # carried slot beam_src[r]; dead slots keep ""), so a swapped
            # hotword scorer rewalks the right beam's trie next chunk
            partials = [""] * ss.beam_width
            for rank, slot in enumerate(view_slots):
                partials[slot] = beams[rank].partial_word
            ss.last_partials = partials
        ss.processed_frames += t
        return beams

    # -- call-time parameters ------------------------------------------------
    def _params_vector(
        self,
        token_min_logp: float,
        beam_prune_logp: float,
        hotword_weight: float = 0.0,
    ) -> np.ndarray:
        vals = [token_min_logp, beam_prune_logp, hotword_weight]
        for m in self._lm_members:
            vals += [
                float(m.alpha),
                float(m.beta),
                float(m.unk_score_offset),
                1.0 if m.score_boundary else 0.0,
            ]
        return np.array(vals, dtype=np.float32)

    def _start_ctx(self, lm_start_state: Optional[AbstractLMState]) -> tuple:
        """Per-LM-member start dicts ({"ctx", "len", "bo"}) for the engine."""
        from .models.base import MultiLMState
        from .models.device_tables import context_suffix_backoffs

        if not self._lm_members:
            return ()
        if lm_start_state is None:
            states = [m.get_start_state() for m in self._lm_members]
        elif isinstance(lm_start_state, MultiLMState):
            states = list(lm_start_state.states)
            if len(states) != len(self._lm_members):
                raise AssertionError(
                    f"Number of states ({len(states)}) does not match number "
                    f"of language models ({len(self._lm_members)})."
                )
        else:
            states = [lm_start_state]
        start = []
        for m, dlm, state in zip(self._lm_members, self._device_lm, states):
            if not isinstance(state, NGramLMState):
                raise AssertionError(
                    f"Expected NGramLMState, got {type(state)}"
                )
            width = max(m.order - 1, 1)
            ctx = np.full(width, -1, dtype=np.int32)
            words = state.context[-(width):] if m.order > 1 else ()
            for i, wid in enumerate(words):
                ctx[width - len(words) + i] = wid
            bo = context_suffix_backoffs(dlm, words)
            start.append(
                {"ctx": ctx, "len": np.int32(len(words)), "bo": bo}
            )
        return tuple(start)

    # -- output assembly -----------------------------------------------------
    def _build_outputs(
        self,
        out: Dict[str, np.ndarray],
        n_frames: int,
        top_n: Optional[int] = None,
        frame_ids: Optional[np.ndarray] = None,
        score_offset: float = 0.0,
    ) -> List[OutputBeam]:
        beam_src = np.asarray(out["beam_src"])  # [B]
        logit = np.asarray(out["logit"])
        lm_score = np.asarray(out["lm_score"])
        ctxs = tuple(np.asarray(c) for c in out["ctx"])  # per-LM-member
        ctx_lens = tuple(np.asarray(c) for c in out["ctx_len"])

        limit = len(beam_src) if top_n is None else min(top_n, len(beam_src))
        if "paths" in out:
            paths = np.asarray(out["paths"])  # [N, Tp] device-backtraced
            limit = min(limit, paths.shape[0])
            t_pad = paths.shape[1]
            n_live = 0
            while n_live < limit and lm_score[n_live] > -1.0e29:
                n_live += 1
            toks_all = paths[:n_live].T
        else:
            if "ptrace" in out:
                packed = np.asarray(out["ptrace"])  # [Tp, B] parent|tok<<16
                parents = packed & 0xFFFF
                trace = (packed >> 16) - 4
            else:
                parents = np.asarray(out["parents"])  # [Tp, B]
                trace = np.asarray(out["trace"])  # [Tp, B]
            t_pad = parents.shape[0]
            n_live = 0
            while n_live < limit and lm_score[n_live] > -1.0e29:
                n_live += 1
            # vectorized backtrace over all returned ranks at once
            toks_all = np.empty((t_pad, n_live), dtype=np.int64)
            cur = beam_src[:n_live].astype(np.int64)
            for t in range(t_pad - 1, -1, -1):
                toks_all[t] = trace[t, cur]
                cur = parents[t, cur]

        # char alphabets without force-commit markers replay vectorized
        # (exact; fuzz-pinned against the Python loop in tests)
        space_id = self._labels.index(" ") if " " in self._labels else -100
        fast_replay = not self._alphabet.is_bpe and not (
            (toks_all[:n_frames] == -2).any() if n_live else False
        )
        results: List[OutputBeam] = []
        for rank in range(n_live):
            toks = toks_all[:n_frames, rank]
            if fast_replay:
                words, frames = replay_token_path_np(
                    toks,
                    self._labels,
                    self._blank_id,
                    space_id,
                    frame_ids=frame_ids,
                )
            else:
                words, frames, (partial, pframes) = replay_token_path(
                    toks,
                    self._labels,
                    self._alphabet.is_bpe,
                    frame_ids=frame_ids,  # original indices under collapse
                )
                if partial:
                    words.append(partial)
                    frames.append(pframes)
            text = " ".join(words)
            if not self._lm_members:
                last_state: Optional[AbstractLMState] = None
            else:
                states = []
                for ctx, ctx_len in zip(ctxs, ctx_lens):
                    n_ctx = int(ctx_len[rank])
                    width = ctx.shape[1]
                    states.append(
                        NGramLMState(
                            tuple(int(w) for w in ctx[rank, width - n_ctx :])
                            if n_ctx
                            else ()
                        )
                    )
                if len(states) == 1:
                    last_state = states[0]
                else:
                    from .models.base import MultiLMState

                    last_state = MultiLMState(states)
            results.append(
                OutputBeam(
                    text=collapse_spaces(text),
                    last_lm_state=last_state,
                    text_frames=list(zip(words, frames)),
                    logit_score=float(logit[rank]) + score_offset,
                    lm_score=float(lm_score[rank]) + score_offset,
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
        hotword_weight: float = DEFAULT_HOTWORD_WEIGHT,
        lm_start_state: Optional[AbstractLMState] = None,
        max_tokens_per_frame: Optional[Union[int, str]] = None,
        top_n: Optional[int] = None,
        blank_collapse: bool = False,
    ) -> List[OutputBeam]:
        """Decode one utterance on device; returns ranked OutputBeams.

        ``top_n`` limits host-side text reconstruction to the best N beams
        (scores/search are unaffected); the top-1 APIs use ``top_n=1``.
        ``blank_collapse`` drops blank-certain frames before decoding
        (exactness-preserving at this call's ``token_min_logp``; see
        :func:`~pyctcdecode_tpu.utils.logits.blank_collapse`).
        ``max_tokens_per_frame``: ``None`` expands every vocabulary token
        per frame (always exact); an integer caps the per-frame top-K
        preselect (exact only when no frame admits more than K tokens at
        ``token_min_logp``); the string ``"auto"`` measures this call's
        admission host-side and picks the smallest sufficient bucketed K
        (1.5x ladder: 4, 6, 8, 12, 16, 24, ...) — exact like ``None``,
        priced like the data.
        """
        if logits.ndim != 2 or logits.shape[1] != len(self._labels):
            raise ValueError(
                f"Input logits of shape {logits.shape}, but vocabulary is "
                f"size {len(self._labels)}"
            )
        hot, weight, _ = self._hot_tables(hotwords, hotword_weight)
        v = len(self._labels)
        logp = normalize_host(logits)
        frame_ids = None
        score_offset = 0.0
        if blank_collapse:
            keep_idx, score_offset = blank_collapse_frames(
                logp, self._blank_id, token_min_logp
            )
            logp = logp[keep_idx]
            frame_ids = keep_idx
        if max_tokens_per_frame == "auto":
            k = _auto_k((logp >= token_min_logp).sum(-1), v)
        else:
            k = v if max_tokens_per_frame is None else min(max_tokens_per_frame, v)
        t = logp.shape[0]
        t_pad = _bucket(t)
        logp_pad = np.full((t_pad, v), 0.0, dtype=np.float32)
        logp_pad[:t] = logp
        fn = self._get_fn(
            t_pad,
            beam_width,
            k,
            prune_history,
            batch=1,
            use_hotwords=hot is not None,
            emit_paths=(min(top_n, beam_width) if top_n is not None else None),
        )
        params = self._params_vector(token_min_logp, beam_prune_logp, weight)
        start = self._start_ctx(lm_start_state)
        out = fn(
            self._jnp.asarray(logp_pad),
            np.int32(t),
            self._jnp.asarray(params),
            start,
            self._tabs,
            hot,
        )
        return self._build_outputs(
            out, n_frames=t, top_n=top_n, frame_ids=frame_ids,
            score_offset=score_offset,
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
        max_tokens_per_frame: Optional[Union[int, str]] = None,
        blank_collapse: bool = False,
    ) -> str:
        """Top transcript for one utterance."""
        return self.decode_beams(
            logits,
            beam_width=beam_width,
            beam_prune_logp=beam_prune_logp,
            token_min_logp=token_min_logp,
            prune_history=True,
            hotwords=hotwords,
            hotword_weight=hotword_weight,
            lm_start_state=lm_start_state,
            max_tokens_per_frame=max_tokens_per_frame,
            top_n=1,
            blank_collapse=blank_collapse,
        )[0].text

    @staticmethod
    def _without_pool_arg(first: Any, rest: Tuple[Any, ...]) -> Any:
        """Support the reference batch calling convention.

        The reference batch APIs lead with a ``multiprocessing`` pool
        (ref decoder.py:801, 895); the device engine vectorizes the batch
        on-chip in one program, so a leading pool (or ``None``) is accepted
        for drop-in compatibility and ignored.
        """
        if not rest:
            return first
        if len(rest) > 1:
            raise TypeError(
                "batch decode takes the logits list plus at most one leading "
                "pool argument"
            )
        return rest[0]

    def decode_beams_batch(
        self,
        logits_list: Sequence[np.ndarray],
        *_pool_compat: Any,
        beam_width: int = DEFAULT_BEAM_WIDTH,
        beam_prune_logp: float = DEFAULT_PRUNE_LOGP,
        token_min_logp: float = DEFAULT_MIN_TOKEN_LOGP,
        prune_history: bool = DEFAULT_PRUNE_BEAMS,
        hotwords: Optional[Iterable[str]] = None,
        hotword_weight: float = DEFAULT_HOTWORD_WEIGHT,
        max_tokens_per_frame: Optional[Union[int, str]] = None,
        batch_pad: int = 8,
        top_n: Optional[int] = None,
        collect_stats: bool = False,
        blank_collapse: bool = False,
        length_bucketing: bool = False,
        token_chunking: Optional[int] = None,
    ) -> "object":
        """Vectorized batch decode: one fused device program per batch.

        All utterances are padded to a shared frame bucket and vmapped; the
        batch dimension is padded to a multiple of ``batch_pad`` so repeated
        calls reuse compiled executables.

        ``length_bucketing=True`` groups utterances by padded-frame bucket
        and dispatches one program per group (all launched before any is
        collected, so they pipeline on device): mixed-length batches stop
        paying the longest utterance's scan length for every row. Results
        come back in input order; with the auto preselect each group also
        measures its own K. Passing an ``int`` instead of ``True`` sets
        the per-group row target (default 384, the measured per-program
        sweet spot on v5e — see :meth:`_length_groups`).

        With ``collect_stats=True`` the engine additionally accumulates
        per-utterance decode counters on device (beams alive, merge/prune
        kills, word commits, per-order LM probe hit rates — SURVEY §5.5)
        and the return value becomes ``(results, stats)`` where ``stats``
        is one ``{counter_name: int}`` dict per utterance.

        ``blank_collapse`` drops blank-certain frames per utterance before
        decoding — exactness-preserving at this call's ``token_min_logp``
        (text, ranking, frame spans and, after score-offset restoration,
        scores all match the full decode; see
        :func:`~pyctcdecode_tpu.utils.logits.blank_collapse`). Real CTC
        emissions are blank-dominated, so this typically shrinks the frame
        count 1.3-2x at zero accuracy cost.

        ``token_chunking`` (``True`` or a chunk width) switches to
        token-timeline decoding — the serving configuration: the host
        splits each frame's exactly-admitted token set into chunks and
        the engine pools candidates across a frame's chunks, pricing
        per-step work to the MEAN admitted count instead of the
        batch-worst frame. Output-exact for any width (see
        :func:`~pyctcdecode_tpu.utils.logits.token_timeline`);
        ``max_tokens_per_frame`` is ignored on this path (admission is
        exact by construction).
        """
        logits_list = self._without_pool_arg(logits_list, _pool_compat)
        dispatch_kw = dict(
            beam_width=beam_width,
            beam_prune_logp=beam_prune_logp,
            token_min_logp=token_min_logp,
            prune_history=prune_history,
            hotwords=hotwords,
            hotword_weight=hotword_weight,
            max_tokens_per_frame=max_tokens_per_frame,
            batch_pad=batch_pad,
            top_n=top_n,
            collect_stats=collect_stats,
            blank_collapse=blank_collapse,
            token_chunking=token_chunking,
        )
        handles = self._launch_batch(logits_list, dispatch_kw, length_bucketing)
        return self._collect_bucketed(handles, len(logits_list), collect_stats)

    def _launch_batch(
        self,
        logits_list: Sequence[np.ndarray],
        dispatch_kw: Dict[str, Any],
        bucketing: bool,
    ) -> List[Tuple[List[int], Optional[Dict[str, Any]]]]:
        """Dispatch one batch asynchronously, bucketed by length if asked.

        With ``blank_collapse`` + bucketing the collapse runs batch-wide
        FIRST so buckets reflect the frame counts the device will actually
        scan, not the raw input lengths. Returns ``(indices, handle)``
        pairs for :meth:`_collect_bucketed`.
        """
        kw = dict(dispatch_kw)
        pre = None
        if bucketing and len(logits_list) > 1:
            if kw.get("blank_collapse"):
                pre = self._collapse_all(logits_list, kw["token_min_logp"])
                logits_list = pre[0]
                kw["blank_collapse"] = False
            target = 384 if bucketing is True else max(1, int(bucketing))
            groups = self._length_groups(logits_list, target_rows=target)
            if len(groups) > 1:
                return self._dispatch_bucketed(logits_list, groups, kw, pre)
            if pre is not None:
                kw["precollapsed"] = pre
        return [(
            list(range(len(logits_list))),
            self._dispatch_batch(logits_list, **kw),
        )]

    def _dispatch_bucketed(
        self,
        logits_list: Sequence[np.ndarray],
        groups: List[List[int]],
        dispatch_kw: Dict[str, Any],
        pre: Optional[Tuple[List[np.ndarray], List[np.ndarray], List[float]]] = None,
    ) -> List[Tuple[List[int], Optional[Dict[str, Any]]]]:
        """Launch one async program per length group; nothing is collected.

        ``pre`` carries batch-level blank-collapse output (collapsed
        log-probs, kept-frame ids, score offsets); each group receives its
        slice so the collapse isn't recomputed per bucket. Every group is
        padded to the SAME row count (the largest group's, rounded to the
        batch_pad grid) so all groups reuse one segment program.
        """
        handles = []
        size = max(len(idx) for idx in groups)
        pad = max(int(dispatch_kw.get("batch_pad", 8)), 1)
        shared_pad = ((size + pad - 1) // pad) * pad
        for idx in groups:
            kw = dict(dispatch_kw, batch_pad=shared_pad)
            if pre is not None:
                kw["precollapsed"] = (
                    [pre[0][i] for i in idx],
                    [pre[1][i] for i in idx],
                    [pre[2][i] for i in idx],
                )
            handles.append((idx, self._dispatch_batch(
                [logits_list[i] for i in idx], **kw
            )))
        return handles

    def _collect_bucketed(
        self,
        handles: List[Tuple[List[int], Optional[Dict[str, Any]]]],
        n: int,
        collect_stats: bool,
    ) -> "object":
        """Block on bucketed dispatches; reassemble results in input order."""
        results: List[Any] = [None] * n
        stats: List[Any] = [None] * n
        for idx, handle in handles:
            group_res = self._collect_batch(handle)
            for j, i in enumerate(idx):
                results[i] = group_res[j]
            if collect_stats and handle is not None:
                per_utt = np.asarray(handle["stats_dev"])[: handle["n"]]
                for j, i in enumerate(idx):
                    stats[i] = dict(
                        zip(handle["stats_names"], per_utt[j].tolist())
                    )
        if collect_stats:
            return results, stats
        return results

    @staticmethod
    def _length_groups(
        logits_list: Sequence[np.ndarray], target_rows: int = 384
    ) -> List[List[int]]:
        """Balanced length bucketing: equal-COUNT groups of sorted lengths.

        Equal group sizes mean every group pads to the same row count, so
        all groups share ONE compiled segment program (segment programs
        depend on the row count but not the frame count; only the cheap
        finalize program is per-frame-bucket). Grouping by padded frame
        bucket instead (the previous scheme) produced one row count per
        bucket — five separate 30-60 s segment compiles per batch at the
        bench shapes — plus tiny straggler buckets with poor device
        utilization. ``target_rows`` is the per-program row sweet spot
        (measured ~350-700 on v5e at the parity config).
        """
        lens = [max(m.shape[0], 1) for m in logits_list]
        order = sorted(range(len(lens)), key=lens.__getitem__)
        n = len(lens)
        n_groups = max(1, -(-n // target_rows))
        size = -(-n // n_groups)
        return [order[i : i + size] for i in range(0, n, size)]

    def _collapse_all(
        self, logits_list: Sequence[np.ndarray], token_min_logp: float
    ) -> Tuple[List[np.ndarray], List[np.ndarray], List[float]]:
        """Normalize and blank-collapse every utterance in a batch.

        Returns (collapsed log-prob matrices, kept original frame indices,
        per-utterance score offsets to restore full-decode scores). Runs
        as whole-batch vectorized passes (bit-equal to the per-utterance
        path, see :func:`~pyctcdecode_tpu.utils.logits.normalize_collapse_batch`).
        """
        from .utils.logits import normalize_collapse_batch

        return normalize_collapse_batch(
            logits_list, self._blank_id, token_min_logp
        )

    def _dispatch_batch(
        self,
        logits_list: Sequence[np.ndarray],
        beam_width: int,
        beam_prune_logp: float,
        token_min_logp: float,
        prune_history: bool,
        hotwords,
        hotword_weight: float,
        max_tokens_per_frame: Optional[Union[int, str]],
        batch_pad: int,
        top_n: Optional[int],
        collect_stats: bool = False,
        blank_collapse: bool = False,
        token_chunking: Optional[int] = None,
        precollapsed: Optional[
            Tuple[List[np.ndarray], List[np.ndarray], List[float]]
        ] = None,
    ) -> Optional[Dict[str, Any]]:
        """Normalize, upload and launch one batch; returns a result handle.

        The launch is asynchronous (JAX dispatch), so callers can overlap
        the next batch's host work with this batch's device run — see
        :meth:`decode_beams_batches`. ``precollapsed`` supplies
        already-normalized, blank-collapsed matrices (from
        :meth:`_collapse_all`, computed batch-wide before length bucketing)
        so the collapse isn't redone per bucket.
        """
        if not logits_list:
            return None
        hot, weight, _ = self._hot_tables(hotwords, hotword_weight)
        v = len(self._labels)
        n = len(logits_list)
        n_pad = ((n + batch_pad - 1) // batch_pad) * batch_pad
        for mat in logits_list:
            if mat.ndim != 2 or mat.shape[1] != v:
                raise ValueError(
                    f"Input logits of shape {mat.shape}, but vocabulary is size {v}"
                )
        frame_ids_list: Optional[List[np.ndarray]] = None
        offsets: Optional[List[float]] = None
        collapsed: Optional[List[np.ndarray]] = None
        if precollapsed is not None:
            collapsed, frame_ids_list, offsets = precollapsed
        elif blank_collapse:
            collapsed, frame_ids_list, offsets = self._collapse_all(
                logits_list, token_min_logp
            )
        if token_chunking:
            # True selects the measured default chunk width (5: best of
            # the round-4 sweep, scripts/serving_sweep.py); any int picks
            # one explicitly
            k_chunk = 5 if token_chunking is True else int(token_chunking)
            return self._dispatch_timeline(
                logits_list, collapsed, frame_ids_list, offsets, hot, weight,
                beam_width=beam_width, beam_prune_logp=beam_prune_logp,
                token_min_logp=token_min_logp, prune_history=prune_history,
                k_chunk=k_chunk, batch_pad=batch_pad,
                top_n=top_n, collect_stats=collect_stats,
            )
        lens = [m.shape[0] for m in (collapsed if collapsed is not None
                                     else logits_list)]
        t_pad = _bucket(max(max(lens), 1))
        seg = self._segment_frames_effective()
        if seg:
            t_pad = ((t_pad + seg - 1) // seg) * seg
        logp = np.zeros((n_pad, t_pad, v), dtype=np.float32)
        if collapsed is not None:
            for i, cl in enumerate(collapsed):
                logp[i, : cl.shape[0]] = cl
        else:
            logp[:n] = normalize_host_batch(logits_list, t_pad, v)
        n_frames = np.zeros(n_pad, dtype=np.int32)
        n_frames[:n] = lens
        if max_tokens_per_frame == "auto":
            counts = (logp >= token_min_logp).sum(-1)  # [n_pad, t_pad]
            valid = np.arange(t_pad)[None, :] < n_frames[:, None]
            k = _auto_k(np.where(valid, counts, 1), v)
        else:
            k = v if max_tokens_per_frame is None else min(max_tokens_per_frame, v)
        emit_paths = min(top_n, beam_width) if top_n is not None else None
        params = self._params_vector(token_min_logp, beam_prune_logp, weight)
        start = self._start_ctx(None)
        if seg:
            out = self._run_segmented(
                seg, logp, n_frames, params, start, hot,
                beam_width=beam_width, k=k, prune_history=prune_history,
                emit_paths=emit_paths, collect_stats=collect_stats,
            )
        else:
            fn = self._get_fn(
                t_pad, beam_width, k, prune_history, batch=n_pad,
                use_hotwords=hot is not None,
                emit_paths=emit_paths,
                collect_stats=collect_stats,
            )
            out = fn(
                self._jnp.asarray(logp),
                self._jnp.asarray(n_frames),
                self._jnp.asarray(params),
                start,
                self._tabs,
                hot,
            )
        handle = {
            "out": dict(out),
            "lens": lens,
            "n": n,
            "top_n": top_n,
            "frame_ids": frame_ids_list,
            "offsets": offsets,
        }
        if collect_stats:
            from .engine import stats_fields

            cfg = self._engine_cfg(
                beam_width, k, prune_history, hot is not None, emit_paths,
                collect_stats,
            )
            # keep the handle async: the device array converts at collect
            handle["stats_dev"] = handle["out"].pop("stats")
            handle["stats_names"] = stats_fields(cfg)
        return handle

    def _dispatch_timeline(
        self,
        logits_list: Sequence[np.ndarray],
        collapsed: Optional[List[np.ndarray]],
        frame_ids_list: Optional[List[np.ndarray]],
        offsets: Optional[List[float]],
        hot,
        weight: float,
        *,
        beam_width: int,
        beam_prune_logp: float,
        token_min_logp: float,
        prune_history: bool,
        k_chunk: int,
        batch_pad: int,
        top_n: Optional[int],
        collect_stats: bool = False,
    ) -> Dict[str, Any]:
        """Launch one batch through the token-timeline engine.

        The host splits every frame's exactly-admitted token set into
        ``k_chunk``-wide chunks (:func:`~pyctcdecode_tpu.utils.logits.
        token_timeline`); the device scans the chunk timeline with a
        carried candidate pool, so per-step work is priced to the MEAN
        admitted count, not the batch-worst frame — output-exact for any
        ``k_chunk``.
        """
        from .utils.logits import normalize_batch, token_timeline_batch

        jnp = self._jnp
        n = len(logits_list)
        n_pad = ((n + batch_pad - 1) // batch_pad) * batch_pad
        mats = (
            collapsed
            if collapsed is not None
            else normalize_batch(logits_list)
        )
        tls, vlens_arr = token_timeline_batch(mats, token_min_logp, k_chunk)
        vlens = [int(x) for x in vlens_arr]
        t_pad = _bucket(max(max(vlens), 1))
        seg = self._segment_frames_effective()
        if seg:
            t_pad = ((t_pad + seg - 1) // seg) * seg
        # upload dtypes: the timeline planes are the serving pipeline's
        # dominant HOST->device payload (~33 MB/batch as i32 at parity
        # shapes over a ~30 MB/s relay — the host-side gate of the
        # steady-state rate). Token ids ride the narrowest int that holds
        # them plus the -1 pad; the is-final flag is one byte; the
        # chunk_base plane is part of the host timeline contract but no
        # longer consumed by the engine and is not uploaded at all.
        v_lab = len(self._labels)
        tok_dt = (
            np.int8 if v_lab <= 127 else
            (np.int16 if v_lab <= 32_767 else np.int32)
        )
        toks = np.full((n_pad, t_pad, k_chunk), -1, dtype=tok_dt)
        tlogp = np.zeros((n_pad, t_pad, k_chunk), dtype=np.float32)
        fin = np.zeros((n_pad, t_pad), dtype=np.int8)
        out_frame_ids: List[np.ndarray] = []
        for i, (tk, tp, fi, cb, fids) in enumerate(tls):
            tv = tk.shape[0]
            toks[i, :tv] = tk
            tlogp[i, :tv] = tp
            fin[i, :tv] = fi
            if frame_ids_list is not None:
                out_frame_ids.append(np.asarray(frame_ids_list[i])[fids])
            else:
                out_frame_ids.append(fids.astype(np.int64))
        n_frames = np.zeros(n_pad, dtype=np.int32)
        n_frames[:n] = vlens
        emit_paths = min(top_n, beam_width) if top_n is not None else None
        params = self._params_vector(token_min_logp, beam_prune_logp, weight)
        start = self._start_ctx(None)
        timeline = (toks, tlogp, fin)
        if seg:
            out = self._run_segmented(
                seg, timeline, n_frames, params, start, hot,
                beam_width=beam_width, k=k_chunk,
                prune_history=prune_history, emit_paths=emit_paths,
                collect_stats=collect_stats, token_timeline=True,
            )
        else:
            fn = self._get_fn(
                t_pad, beam_width, k_chunk, prune_history, batch=n_pad,
                use_hotwords=hot is not None, emit_paths=emit_paths,
                collect_stats=collect_stats, token_timeline=True,
            )
            out = fn(
                tuple(jnp.asarray(a) for a in timeline),
                jnp.asarray(n_frames),
                jnp.asarray(params),
                start,
                self._tabs,
                hot,
            )
        handle = {
            "out": dict(out),
            "lens": vlens,
            "n": n,
            "top_n": top_n,
            "frame_ids": out_frame_ids,
            "offsets": offsets,
        }
        if collect_stats:
            from .engine import stats_fields

            cfg = self._engine_cfg(
                beam_width, k_chunk, prune_history, hot is not None,
                emit_paths, collect_stats, True,
            )
            # keep the handle async: the device array converts at collect
            handle["stats_dev"] = handle["out"].pop("stats")
            handle["stats_names"] = stats_fields(cfg)
        return handle

    def _run_segmented(
        self,
        seg: int,
        logp: np.ndarray,
        n_frames: np.ndarray,
        params: np.ndarray,
        start,
        hot,
        beam_width: int,
        k: int,
        prune_history: bool,
        emit_paths: Optional[int],
        collect_stats: bool = False,
        token_timeline: bool = False,
    ):
        """Drive one batch through host-dispatched unrolled segments.

        The frame loop lives here instead of in a device ``lax.scan`` so
        every LM-probe/trie gather compiles at program top level (the
        in-loop scalar-gather penalty is ~40x; see
        :func:`~pyctcdecode_tpu.engine.make_segment_decode_fns`). All
        dispatches are asynchronous: the device chews through segments
        back-to-back while the host races ahead issuing them.
        """
        jnp = self._jnp
        if token_timeline:
            n_pad, t_pad = logp[2].shape  # (toks, tlogp, fin)
        else:
            n_pad, t_pad, _ = logp.shape
        init_fn, seg_fn, fin_fn = self._get_segment_fns(
            seg, beam_width, k, prune_history, n_pad,
            use_hotwords=hot is not None, emit_paths=emit_paths,
            collect_stats=collect_stats, token_timeline=token_timeline,
        )
        state = init_fn(start)
        nf = jnp.asarray(n_frames)
        prm = jnp.asarray(params)
        blobs = []  # per-segment packed (or (parents, trace)) emissions
        for s in range(t_pad // seg):
            sl = slice(s * seg, (s + 1) * seg)
            if token_timeline:
                seg_in = tuple(
                    jnp.asarray(np.ascontiguousarray(a[:, sl])) for a in logp
                )
            else:
                seg_in = jnp.asarray(np.ascontiguousarray(logp[:, sl]))
            state, blob = seg_fn(
                state,
                seg_in,
                np.int32(s * seg),
                nf,
                prm,
                self._tabs,
                hot,
            )
            blobs.append(blob)
        if isinstance(blobs[0], tuple):
            ptrace = tuple(
                jnp.concatenate([b[i] for b in blobs], axis=1)
                for i in range(2)
            )
        else:
            ptrace = jnp.concatenate(blobs, axis=1)
        return fin_fn(state, prm, self._tabs, ptrace, hot)

    def _collect_batch_fast(
        self, handle: Dict[str, Any], host: Dict[str, Any]
    ) -> Optional[List[List[OutputBeam]]]:
        """Batched output assembly for device-backtraced non-BPE batches.

        One :func:`replay_token_paths_batch` pass over every (utterance,
        rank) row replaces the per-utterance replay loop (~0.5 s of
        GIL-bound small numpy calls per 768-utterance serving batch).
        Returns ``None`` when the batch needs the general path (BPE
        alphabets, raw backpointer outputs, or ``-2`` force-commit
        markers) — exactness is pinned by the whole batch-decode test
        surface running through this path on char alphabets.
        """
        if "paths" not in host or self._alphabet.is_bpe:
            return None
        n = handle["n"]
        paths = np.asarray(host["paths"])[:n]  # [n, r, T]
        lm_score = np.asarray(host["lm_score"])[:n]
        logit = np.asarray(host["logit"])[:n]
        if (paths == -2).any():
            return None
        limit = paths.shape[1]
        if handle["top_n"] is not None:
            limit = min(limit, handle["top_n"])
        live = np.cumprod(lm_score[:, :limit] > -1.0e29, axis=1).astype(bool)
        ui, ri = np.nonzero(live)  # utterance-major, rank ascending
        results: List[List[OutputBeam]] = [[] for _ in range(n)]
        if ui.size == 0:
            return results
        toks_flat = paths[ui, ri]  # [R, T]
        frame_ids_list = handle.get("frame_ids")
        fid = None
        if frame_ids_list is not None:
            fid = np.zeros(toks_flat.shape, dtype=np.int64)
            for k in range(ui.size):
                fi = frame_ids_list[ui[k]]
                fid[k, : len(fi)] = fi
        space_id = self._labels.index(" ") if " " in self._labels else -100
        pairs = replay_token_paths_batch(
            toks_flat, self._labels, self._blank_id, space_id, frame_ids=fid
        )
        offsets = handle.get("offsets")
        ctxs = tuple(np.asarray(c)[:n] for c in host.get("ctx", ()))
        ctx_lens = tuple(np.asarray(c)[:n] for c in host.get("ctx_len", ()))
        from .models.base import MultiLMState

        for k in range(ui.size):
            u, r = int(ui[k]), int(ri[k])
            words, frames = pairs[k]
            off = float(offsets[u]) if offsets is not None else 0.0
            if not self._lm_members:
                last_state: Optional[AbstractLMState] = None
            else:
                states = []
                for ctx, ctx_len in zip(ctxs, ctx_lens):
                    n_ctx = int(ctx_len[u, r])
                    width = ctx.shape[-1]
                    states.append(
                        NGramLMState(
                            tuple(
                                int(w) for w in ctx[u, r, width - n_ctx :]
                            )
                            if n_ctx
                            else ()
                        )
                    )
                last_state = (
                    states[0] if len(states) == 1 else MultiLMState(states)
                )
            results[u].append(
                OutputBeam(
                    text=" ".join(words),
                    last_lm_state=last_state,
                    text_frames=list(zip(words, frames)),
                    logit_score=float(logit[u, r]) + off,
                    lm_score=float(lm_score[u, r]) + off,
                )
            )
        return results

    def _collect_batch(
        self, handle: Optional[Dict[str, Any]]
    ) -> List[List[OutputBeam]]:
        """Block on a dispatched batch and build its OutputBeam lists."""
        if handle is None:
            return []
        # fetch every output array CONCURRENTLY: each device->host fetch
        # pays the relay's fixed round-trip (~25-30 ms measured), so a
        # dozen sequential np.asarray calls were ~0.34 s of pure latency
        # per serving batch; threaded fetches overlap it (the conversion
        # releases the GIL)
        from .utils.logits import _host_pool

        flat: List[Any] = []
        spec: List[Tuple[str, Optional[int]]] = []
        host: Dict[str, Any] = {}
        for key, val in handle["out"].items():
            if isinstance(val, tuple):
                host[key] = ()  # placeholder keeps empty tuples (no-LM ctx)
                for j, v in enumerate(val):
                    flat.append(v)
                    spec.append((key, j))
            else:
                flat.append(val)
                spec.append((key, None))
        fetched = list(_host_pool().map(np.asarray, flat))
        tuples: Dict[str, Dict[int, np.ndarray]] = {}
        for (key, j), arr in zip(spec, fetched):
            if j is None:
                host[key] = arr
            else:
                tuples.setdefault(key, {})[j] = arr
        for key, parts in tuples.items():
            host[key] = tuple(parts[j] for j in range(len(parts)))
        fast = self._collect_batch_fast(handle, host)
        if fast is not None:
            return fast
        frame_ids_list = handle.get("frame_ids")
        offsets = handle.get("offsets")

        def _one(i: int) -> List[OutputBeam]:
            one = {
                key: (
                    tuple(v[i] for v in val) if isinstance(val, tuple) else val[i]
                )
                for key, val in host.items()
            }
            return self._build_outputs(
                one,
                n_frames=handle["lens"][i],
                top_n=handle["top_n"],
                frame_ids=(
                    frame_ids_list[i] if frame_ids_list is not None else None
                ),
                score_offset=offsets[i] if offsets is not None else 0.0,
            )

        n = handle["n"]
        if n >= 64:
            # replay + output assembly across utterances on the host pool
            # (the numpy replay releases the GIL; order preserved by map)
            from .utils.logits import _host_pool

            return list(_host_pool().map(_one, range(n)))
        return [_one(i) for i in range(n)]

    def decode_beams_batches(
        self,
        batches: Iterable[Sequence[np.ndarray]],
        pipeline_depth: int = 1,
        **kwargs: Any,
    ) -> Iterable[List[List[OutputBeam]]]:
        """Pipelined decoding of a stream of batches (the serving path).

        Keeps ``pipeline_depth`` batches in flight: while the device runs
        batch ``i``, the host normalizes and uploads the next batches and
        post-processes earlier ones, hiding the host<->device transfer
        time that a synchronous per-batch loop pays serially (measured
        ~0.7 s of a 2.5 s batch at the parity config). Depth 2 also rides
        over dispatch-rate jitter on relayed/tunneled devices. Accepts the
        same keyword arguments as :meth:`decode_beams_batch` (including
        ``length_bucketing``, which splits each batch into per-group
        programs that pipeline on device); yields one result list per
        batch, in order.
        """
        pipeline_depth = max(int(pipeline_depth), 1)
        pending: List[Tuple[List[Tuple[List[int], Optional[Dict[str, Any]]]], int]] = []
        defaults = dict(
            beam_width=kwargs.pop("beam_width", DEFAULT_BEAM_WIDTH),
            beam_prune_logp=kwargs.pop("beam_prune_logp", DEFAULT_PRUNE_LOGP),
            token_min_logp=kwargs.pop("token_min_logp", DEFAULT_MIN_TOKEN_LOGP),
            prune_history=kwargs.pop("prune_history", DEFAULT_PRUNE_BEAMS),
            hotwords=kwargs.pop("hotwords", None),
            hotword_weight=kwargs.pop("hotword_weight", DEFAULT_HOTWORD_WEIGHT),
            max_tokens_per_frame=kwargs.pop("max_tokens_per_frame", None),
            batch_pad=kwargs.pop("batch_pad", 8),
            top_n=kwargs.pop("top_n", None),
            collect_stats=False,
            blank_collapse=kwargs.pop("blank_collapse", False),
            token_chunking=kwargs.pop("token_chunking", None),
        )
        bucketing = kwargs.pop("length_bucketing", False)
        if kwargs.pop("collect_stats", False):
            raise ValueError(
                "collect_stats is not supported on the pipelined "
                "decode_beams_batches path; use decode_beams_batch"
            )
        if kwargs:
            raise TypeError(f"unknown decode arguments: {sorted(kwargs)}")
        for logits_list in batches:
            handles = self._launch_batch(logits_list, defaults, bucketing)
            pending.append((handles, len(logits_list)))
            if len(pending) > pipeline_depth:
                prev_handles, prev_n = pending.pop(0)
                yield self._collect_bucketed(prev_handles, prev_n, False)
        while pending:
            prev_handles, prev_n = pending.pop(0)
            yield self._collect_bucketed(prev_handles, prev_n, False)

    def decode_batch(
        self,
        logits_list: Sequence[np.ndarray],
        *_pool_compat: Any,
        beam_width: int = DEFAULT_BEAM_WIDTH,
        beam_prune_logp: float = DEFAULT_PRUNE_LOGP,
        token_min_logp: float = DEFAULT_MIN_TOKEN_LOGP,
        hotwords: Optional[Iterable[str]] = None,
        hotword_weight: float = DEFAULT_HOTWORD_WEIGHT,
        max_tokens_per_frame: Optional[Union[int, str]] = None,
        blank_collapse: bool = False,
        length_bucketing: bool = False,
        token_chunking: Optional[int] = None,
    ) -> List[str]:
        """Batch top-1 transcripts (leading pool argument accepted, unused)."""
        logits_list = self._without_pool_arg(logits_list, _pool_compat)
        beams = self.decode_beams_batch(
            logits_list,
            beam_width=beam_width,
            beam_prune_logp=beam_prune_logp,
            token_min_logp=token_min_logp,
            prune_history=True,
            hotwords=hotwords,
            hotword_weight=hotword_weight,
            max_tokens_per_frame=max_tokens_per_frame,
            top_n=1,
            blank_collapse=blank_collapse,
            length_bucketing=length_bucketing,
            token_chunking=token_chunking,
        )
        return [b[0].text if b else "" for b in beams]

    # -- serialization (same directory layout as the host engine) -------------
    def save_to_dir(self, filepath: str) -> None:
        """Write alphabet.json (+ language_model/ when present) to a directory."""
        import os

        from .decoder import BeamSearchDecoderCTC as _Host

        alphabet_path = os.path.join(filepath, _Host._ALPHABET_SERIALIZED_FILENAME)
        with open(alphabet_path, "w") as fh:
            fh.write(self._alphabet.dumps())
        if self._lm is None:
            logger.info("no language model attached; serializing the alphabet only")
        else:
            lm_path = os.path.join(
                filepath, _Host._LANGUAGE_MODEL_SERIALIZED_DIRECTORY
            )
            os.makedirs(lm_path)
            logger.info("writing the language model under %s", lm_path)
            self._lm.save_to_dir(lm_path)

    @staticmethod
    def parse_directory_contents(filepath: str) -> "object":
        """Validate a serialized-decoder directory layout (host-compatible)."""
        from .decoder import BeamSearchDecoderCTC as _Host

        return _Host.parse_directory_contents(filepath)

    @classmethod
    def load_from_dir(
        cls, filepath: str, unigram_encoding: Optional[str] = None
    ) -> "TPUBeamSearchDecoderCTC":
        """Load a serialized decoder directory onto the device engine."""
        filenames = cls.parse_directory_contents(filepath)
        with open(filenames["alphabet"], "r") as fh:  # type: ignore[arg-type]
            alphabet = Alphabet.loads(fh.read())
        language_model: Optional[LanguageModel] = None
        if filenames["language_model"] is not None:
            language_model = LanguageModel.load_from_dir(
                filenames["language_model"], unigram_encoding=unigram_encoding
            )
        return cls(alphabet, language_model=language_model)

    @classmethod
    def load_from_hf_hub(
        cls, model_id: str, cache_dir: Optional[str] = None, **kwargs: Any
    ) -> "TPUBeamSearchDecoderCTC":
        """Load a decoder directory from the HuggingFace Hub (or its cache)."""
        import os
        from pathlib import Path

        if cache_dir is None:
            cache_dir = os.path.join(Path.home(), ".cache", "pyctcdecode_tpu")
        try:
            from huggingface_hub import snapshot_download
        except ImportError as err:
            raise ImportError(
                "loading from the HuggingFace Hub requires the optional "
                "huggingface_hub package (pip install huggingface-hub)"
            ) from err
        cached_directory = snapshot_download(model_id, cache_dir=cache_dir, **kwargs)
        return cls.load_from_dir(cached_directory)


def normalize_host(logits: np.ndarray) -> np.ndarray:
    """Host-side logit normalization to f32 log-probs (sniff rule as ref)."""
    from .utils.logits import normalize_to_logp

    return normalize_to_logp(np.asarray(logits)).astype(np.float32)


def normalize_host_batch(
    logits_list: Sequence[np.ndarray], t_pad: int, v: int
) -> np.ndarray:
    """Batch normalization into one padded f32 ``[n, t_pad, v]`` array.

    Delegates to :func:`~pyctcdecode_tpu.utils.logits.normalize_batch`
    (the single ragged-batch normalizer: threaded, bit-equal to the
    per-utterance sniff, dtype-aware) and pads — one implementation
    serves the dense, collapse and timeline paths alike.
    """
    from .utils.logits import normalize_batch

    outs = normalize_batch(logits_list)
    stacked = np.zeros((len(outs), t_pad, v), dtype=np.float32)
    for i, out in enumerate(outs):
        stacked[i, : out.shape[0]] = out.reshape(-1, v)
    return stacked
