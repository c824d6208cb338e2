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
