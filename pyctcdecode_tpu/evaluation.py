"""Corpus-level evaluation harness: WER, throughput, and engine parity.

Plays the role of the reference's ``tutorials/03_eval_performance.ipynb``
(the notebook whose executed cells are the source of every published
pyctcdecode number: WER-vs-runtime sweeps over LibriSpeech dev-other,
ref cells 25-31) as a first-class, testable module:

* :func:`synthesize_corpus` builds a reproducible synthetic CTC corpus —
  reference transcripts plus noisy frame-level logit matrices — for
  environments without audio data or network access.
* :func:`evaluate_corpus` decodes a corpus on any engine (host or device)
  and reports corpus WER plus decoded audio-seconds per wall-clock second.
* :func:`compare_engines` runs host and device engines on the same corpus at
  matched parameters and reports both WERs, transcript agreement, and the
  throughput ratio — the framework's standing parity + perf check.

CLI: ``python scripts/eval_corpus.py --help``.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .utils.metrics import word_error_rate

FRAME_SEC = 0.02  # Wav2Vec2 / QuartzNet CTC frame stride

# :func:`synthesize_corpus` difficulty presets calibrated against the
# reference's artifacts (CPU decode cost is strongly data-dependent, so
# pinning difficulty is what makes corpus timings comparable):
#
# * ``DEV_OTHER_DIFFICULTY`` — greedy argmax decoding scores ~10% WER
#   (9.8% measured at 32 utterances), matching the reference's published
#   greedy WER on LibriSpeech dev-other, its benchmark split (10.08%, ref
#   03_eval_performance.ipynb cell 25); 36% of frames are blank-certain.
# * ``FIXTURE_DIFFICULTY`` — matches the reference's real Wav2Vec2 test
#   fixture ``libri_logits.json`` (1.13 mean admitted tokens/frame at the
#   default -5.0 threshold, 39% blank-certain frames).
DEV_OTHER_DIFFICULTY: Dict[str, object] = dict(
    words_per_utterance=(14, 20),
    frames_per_char=(1, 2),
    blank_frames=(1, 2),
    peak=8.0,
    noise=1.7,
    blank_peak=12.5,
)
FIXTURE_DIFFICULTY: Dict[str, object] = dict(
    words_per_utterance=(14, 20),
    frames_per_char=(1, 2),
    blank_frames=(1, 2),
    peak=8.0,
    noise=0.8,
    blank_peak=11.0,
)


@dataclasses.dataclass
class Corpus:
    """Reference transcripts plus per-utterance logit matrices."""

    references: List[str]
    logits: List[np.ndarray]
    labels: List[str]

    @property
    def audio_seconds(self) -> float:
        return sum(m.shape[0] for m in self.logits) * FRAME_SEC

    def __len__(self) -> int:
        return len(self.references)


def synthesize_corpus(
    labels: Sequence[str],
    vocabulary: Sequence[str],
    n_utterances: int = 128,
    words_per_utterance: Tuple[int, int] = (4, 12),
    frames_per_char: Tuple[int, int] = (1, 3),
    blank_rate: float = 0.25,
    noise: float = 1.5,
    peak: float = 6.0,
    seed: int = 0,
    blank_frames: Optional[Tuple[int, int]] = None,
    blank_peak: Optional[float] = None,
) -> Corpus:
    """Generate a reproducible noisy CTC corpus over a char alphabet.

    Each utterance samples words from ``vocabulary``, renders the character
    sequence to frames (each char held 1-3 frames, blanks sprinkled
    between), and emits raw logits = ``peak``·one-hot + N(0, ``noise``) so
    greedy decoding makes occasional character errors that a language model
    can repair — the same shape of workload the reference's LibriSpeech
    evaluation exercises.

    Real CTC acoustic models emit blank on roughly half of all frames and
    are extremely confident about them (the reference's Wav2Vec2 fixture:
    47% blank-argmax frames, 39% with p(blank) > 0.999). The defaults keep
    the original sparser-blank behavior; to mimic real emission statistics
    pass ``blank_frames=(lo, hi)`` (a run of that many blank frames after
    every character, replacing the ``blank_rate`` coin flip) and
    ``blank_peak`` (a larger one-hot peak on blank frames so silence is
    near-certain, as in real models).
    """
    char2id = {c: i for i, c in enumerate(labels)}
    if "" not in char2id:
        raise ValueError(
            "synthesize_corpus needs a char alphabet with a '' CTC blank"
        )
    blank_id = char2id[""]
    if " " not in char2id:
        raise ValueError("synthesize_corpus needs a char alphabet with ' '")
    rng = np.random.RandomState(seed)
    vocab = [w for w in vocabulary if all(ch in char2id for ch in w)]
    if not vocab:
        raise ValueError("no vocabulary word is spellable with these labels")
    refs: List[str] = []
    mats: List[np.ndarray] = []
    lo, hi = words_per_utterance
    flo, fhi = frames_per_char
    b_peak = peak if blank_peak is None else blank_peak
    for _ in range(n_utterances):
        words = [vocab[rng.randint(len(vocab))] for _ in range(rng.randint(lo, hi + 1))]
        refs.append(" ".join(words))
        ids: List[int] = []
        for ch in " ".join(words):
            ids.extend([char2id[ch]] * rng.randint(flo, fhi + 1))
            if blank_frames is not None:
                ids.extend([blank_id] * rng.randint(blank_frames[0], blank_frames[1] + 1))
            elif rng.rand() < blank_rate:
                ids.append(blank_id)
        arr = np.asarray(ids)
        mat = rng.randn(len(ids), len(labels)).astype(np.float32) * noise
        mat[np.arange(len(ids)), arr] += peak
        if b_peak != peak:
            mat[arr == blank_id, blank_id] += b_peak - peak
        mats.append(mat)
    return Corpus(references=refs, logits=mats, labels=list(labels))


_DEVICE_ONLY_KWARGS = (
    "max_tokens_per_frame",
    "blank_collapse",
    "length_bucketing",
    "token_chunking",
)


def _decode_all(decoder, corpus: Corpus, beam_width: int, **kwargs) -> List[str]:
    """Batch top-1 decode on either engine (host engines need a pool slot)."""
    from .decoder import BeamSearchDecoderCTC

    if isinstance(decoder, BeamSearchDecoderCTC):
        kwargs = {k: v for k, v in kwargs.items() if k not in _DEVICE_ONLY_KWARGS}
        return decoder.decode_batch(
            None, corpus.logits, beam_width=beam_width, **kwargs
        )
    return decoder.decode_batch(corpus.logits, beam_width=beam_width, **kwargs)


def evaluate_corpus(
    decoder: "object",
    corpus: Corpus,
    beam_width: int = 100,
    warmup: bool = True,
    **decode_kwargs: "object",
) -> Dict:
    """Decode a corpus and report WER + decoded audio-seconds per second.

    ``warmup`` runs one throwaway batch first so device-engine compile time
    is not billed to throughput (the reference times warm decoding too,
    ref 03_eval_performance.ipynb cells 29-30).
    """
    if warmup:
        _decode_all(decoder, Corpus(corpus.references[:1], corpus.logits[:1],
                                    corpus.labels), beam_width, **decode_kwargs)
    t0 = time.perf_counter()
    hyps = _decode_all(decoder, corpus, beam_width, **decode_kwargs)
    wall = time.perf_counter() - t0
    return {
        "wer": word_error_rate(corpus.references, hyps),
        "audio_seconds": round(corpus.audio_seconds, 2),
        "wall_seconds": round(wall, 4),
        "audio_sec_per_sec": round(corpus.audio_seconds / wall, 2),
        "n_utterances": len(corpus),
        "beam_width": beam_width,
        "hypotheses": hyps,
    }


def compare_engines(
    host_decoder: "object",
    device_decoder: "object",
    corpus: Corpus,
    beam_width: int = 100,
    **decode_kwargs: "object",
) -> Dict:
    """Decode the same corpus on both engines at matched parameters.

    Returns both WERs, the fraction of utterances whose top-1 transcripts
    agree exactly (device f32 score accumulation can flip exact ties the
    host f64 path keeps, see PARITY.md), and the throughput ratio.
    """
    host = evaluate_corpus(host_decoder, corpus, beam_width, **decode_kwargs)
    dev = evaluate_corpus(device_decoder, corpus, beam_width, **decode_kwargs)
    agree = sum(
        h == d for h, d in zip(host["hypotheses"], dev["hypotheses"])
    ) / len(corpus)
    return {
        "host": {k: v for k, v in host.items() if k != "hypotheses"},
        "device": {k: v for k, v in dev.items() if k != "hypotheses"},
        "top1_agreement": round(agree, 4),
        "wer_delta": round(dev["wer"] - host["wer"], 6),
        "speedup": round(host["wall_seconds"] / dev["wall_seconds"], 2),
        "host_hypotheses": host["hypotheses"],
        "device_hypotheses": dev["hypotheses"],
    }
