"""Input normalization: accept probabilities, logits, or log-probs.

Parity surface: ref ``decoder.py:180-197, 699-705, 759-765``. Rows summing to
~1 are treated as probabilities (log + clip); anything else goes through a
clipped log-softmax. Both a numpy (host engine) and a jnp (TPU engine)
implementation are provided; the jnp variant is shape-static and jit-safe.
"""
from __future__ import annotations

import math

import numpy as np

from ..constants import MIN_TOKEN_CLIP_P


def log_softmax_np(x: np.ndarray, axis: int = -1) -> np.ndarray:
    """Numerically stable log-softmax (scipy-equivalent, non-finite-max safe)."""
    x_max = np.amax(x, axis=axis, keepdims=True)
    if x_max.ndim > 0:
        x_max[~np.isfinite(x_max)] = 0
    elif not np.isfinite(x_max):
        x_max = 0
    shifted = x - x_max
    with np.errstate(divide="ignore"):
        log_z = np.log(np.sum(np.exp(shifted), axis=axis, keepdims=True))
    return shifted - log_z


def normalize_to_logp(logits: np.ndarray) -> np.ndarray:
    """Sniff the input domain and return clipped log-probabilities."""
    with np.errstate(invalid="ignore"):
        row_sum_mean = float(logits.sum(axis=1).mean()) if logits.size else float("nan")
    if math.isclose(row_sum_mean, 1):
        # probabilities
        return np.log(np.clip(logits, MIN_TOKEN_CLIP_P, 1))
    # raw logits (or already log-probs; log-softmax is idempotent-enough and
    # matches the reference behavior exactly)
    return np.clip(log_softmax_np(logits, axis=1), math.log(MIN_TOKEN_CLIP_P), 0)


def blank_collapse(
    logp: np.ndarray, blank_id: int, token_min_logp: float
) -> tuple:
    """Frame indices to keep after collapsing blank-certain runs.

    A frame is *droppable* when blank is its argmax and every other token's
    log-prob is below ``token_min_logp``: the decoder's admission rule
    (threshold OR argmax, ref decoder.py:444-445) then admits only the
    blank "stay" transition, which maps every beam to itself with a score
    shift that is uniform across beams. Runs of droppable frames keep
    their FIRST frame (it performs the blank-path beam merge and the
    last-token reset that separates repeated characters — dropping it
    would change results); the rest are removed.

    Decoded text, ranking, frame spans (via the returned original frame
    ids) and pruning decisions are exactly those of the full decode;
    adding the returned ``dropped_sum`` (the dropped frames' blank
    log-probs) to each output score reconstructs full-decode scores up to
    f32 summation order. The technique follows "Blank Collapse:
    Compressing CTC emission for the faster decoding" (arXiv:2210.17017);
    the condition here is the stronger exactness-preserving one.

    Returns ``(keep_idx int64 [T'], dropped_sum float)``.
    """
    t = logp.shape[0]
    if t == 0:
        return np.arange(0, dtype=np.int64), 0.0
    amax = logp.argmax(axis=1)
    second = np.partition(logp, -2, axis=1)[:, -2]
    droppable = (amax == blank_id) & (second < token_min_logp)
    keep = ~droppable | np.concatenate([[True], ~droppable[:-1]])
    keep_idx = np.flatnonzero(keep).astype(np.int64)
    dropped_sum = float(logp[~keep, blank_id].sum())
    return keep_idx, dropped_sum


def token_timeline(
    logp: np.ndarray, token_min_logp: float, k_chunk: int
) -> tuple:
    """Split each frame's exactly-admitted token set into K-wide chunks.

    The decoder admits token ``v`` at frame ``t`` when ``logp[t, v] >=
    token_min_logp`` OR ``v`` is the frame's argmax (ref decoder.py:
    444-445). Dense engines pay a static per-frame token width K sized to
    the WORST frame of the batch, while the mean admitted count on real
    CTC emissions is 2-6; this builder turns each frame into
    ``ceil(admitted / k_chunk)`` *virtual frames* of exactly the admitted
    token ids, in ascending-id order (the reference's enumeration order).
    The engine processes virtual frames with a carried candidate pool and
    promotes the pool to the new beam set on each frame's last chunk —
    output-exact, because candidate merges are confined to one applied-
    token column (so chunks never split a merge group) and an iterated
    top-B over ``pool ∪ chunk`` equals the top-B of the frame's full
    candidate set.

    Returns ``(toks [Tv, K] int32 (-1 padded), tlogp [Tv, K] f32,
    is_final [Tv] bool, chunk_base [Tv] int32 (admitted tokens before the
    chunk), frame_ids [Tv] int32 (owning original frame))``.
    """
    t, v = logp.shape
    k_chunk = int(k_chunk)
    if t == 0:
        z = np.zeros((0, k_chunk), dtype=np.int32)
        return (z, z.astype(np.float32), np.zeros(0, bool),
                np.zeros(0, np.int32), np.zeros(0, np.int32))
    admit = logp >= token_min_logp
    admit[np.arange(t), logp.argmax(axis=1)] = True
    flat = np.flatnonzero(admit)  # sorted by (frame, token id)
    frame_of = flat // v
    counts = admit.sum(axis=1)  # >= 1 per frame
    # position of each admitted token within its frame
    starts = np.zeros(t, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    pos = np.arange(flat.size) - starts[frame_of]
    chunk_of = pos // k_chunk  # chunk index within the frame
    chunks_per_frame = -(-counts // k_chunk)
    tv = int(chunks_per_frame.sum())
    # virtual step of each admitted token
    vstarts = np.zeros(t, dtype=np.int64)
    np.cumsum(chunks_per_frame[:-1], out=vstarts[1:])
    vstep = vstarts[frame_of] + chunk_of
    slot = pos - chunk_of * k_chunk
    toks = np.full((tv, k_chunk), -1, dtype=np.int32)
    tlogp = np.zeros((tv, k_chunk), dtype=np.float32)
    toks[vstep, slot] = (flat % v).astype(np.int32)
    tlogp[vstep, slot] = logp[frame_of, flat % v]
    frame_ids = np.zeros(tv, dtype=np.int32)
    frame_ids[vstarts] = 1
    frame_ids = np.cumsum(frame_ids) - 1
    is_final = np.zeros(tv, dtype=bool)
    is_final[vstarts + chunks_per_frame - 1] = True
    chunk_base = (
        (np.arange(tv) - vstarts[frame_ids]) * k_chunk
    ).astype(np.int32)
    return toks, tlogp, is_final, chunk_base.astype(np.int32), frame_ids


def normalize_to_logp_jnp(logits: "object", assume: str = "auto") -> "object":
    """jnp twin of :func:`normalize_to_logp`.

    ``assume`` may be ``"auto"`` (traced sniff via ``jnp.where``), ``"probs"``,
    ``"logits"`` or ``"logp"`` to skip the sniff when the caller knows the
    domain (keeps the compiled graph minimal).
    """
    import jax.nn
    import jax.numpy as jnp

    if assume == "logp":
        return logits
    floor = math.log(MIN_TOKEN_CLIP_P)
    if assume == "probs":
        return jnp.log(jnp.clip(logits, MIN_TOKEN_CLIP_P, 1.0))
    as_logits = jnp.clip(jax.nn.log_softmax(logits, axis=-1), floor, 0.0)
    if assume == "logits":
        return as_logits
    as_probs = jnp.log(jnp.clip(logits, MIN_TOKEN_CLIP_P, 1.0))
    row_sum_mean = jnp.mean(jnp.sum(logits, axis=-1))
    is_probs = jnp.isclose(row_sum_mean, 1.0, rtol=1e-9, atol=0.0)
    return jnp.where(is_probs, as_probs, as_logits)
