"""uint32 hashing shared by host-side table builders and device kernels.

The device engine replaces the reference's *string*-keyed beam merging
(ref ``decoder.py:211-224``) with 2x32-bit rolling hashes over committed
words and in-progress partial words. Host builders (numpy) and the device
scan (jnp) must produce bit-identical hashes, so every function here is
written against an array-module parameter ``xp`` that may be ``numpy`` or
``jax.numpy``; all arithmetic is uint32 with wraparound.

Hash design:

* characters are folded into the partial-word hash with two independent
  multiplicative lanes (:data:`CH_A`, :data:`CH_B`),
* a committed word's hash pair is folded into the text hash pair with a
  second multiplier pair (:data:`TXT_A`, :data:`TXT_B`),
* n-gram table slots use FNV-1a over the key's word ids.

Two lanes give an effective 64-bit key space; the engine additionally
reserves the top bit of the high lane for dead-beam sentinels so dead
slots can never merge with live hypotheses.
"""
from __future__ import annotations

import numpy as np

# FNV-1a (32 bit)
FNV_OFFSET = 2166136261
FNV_PRIME = 16777619

# char-into-partial multipliers (two independent lanes)
CH_A = 31
CH_B = 1000003

# word-into-text multipliers
TXT_A = 2654435761
TXT_B = 40503

# xor salt applied to a word hash before folding it into the text hash
TXT_SALT = 0x9E3779B9


def _u32(xp, v):
    return xp.asarray(v, dtype=xp.uint32)


def fnv1a(xp, ids, valid_len=None):
    """FNV-1a over the trailing dimension of an int array.

    ``ids``: integer array ``[..., n]``. When ``valid_len`` (broadcastable
    to ``[...]``) is given, only the last ``valid_len`` elements contribute
    (right-aligned keys); otherwise all ``n`` do.
    """
    ids = xp.asarray(ids)
    n = ids.shape[-1]
    h = xp.full(ids.shape[:-1], FNV_OFFSET, dtype=xp.uint32)
    prime = _u32(xp, FNV_PRIME)
    for j in range(n):
        x = ids[..., j].astype(xp.uint32)
        hj = (h ^ x) * prime
        if valid_len is None:
            h = hj
        else:
            # position j participates when j >= n - valid_len
            h = xp.where(xp.asarray(valid_len) > (n - 1 - j), hj, h)
    return h


def fnv1a_seeded(xp, ids, seed):
    """FNV-1a over the trailing dimension with a caller-supplied offset basis.

    Used for the n-gram tables' fingerprint lanes: the probe-slot hash and
    the two fingerprint lanes must be independent, and a table that detects
    an in-window fingerprint collision at build time re-derives its lanes
    from bumped seeds (passed to the device as runtime scalars, so a reseed
    never recompiles).
    """
    ids = xp.asarray(ids)
    n = ids.shape[-1]
    h = xp.broadcast_to(
        xp.asarray(seed, dtype=xp.uint32), ids.shape[:-1]
    ).astype(xp.uint32)
    prime = _u32(xp, FNV_PRIME)
    for j in range(n):
        h = (h ^ ids[..., j].astype(xp.uint32)) * prime
    return h


def hash_extend_char(xp, h_lo, h_hi, char_id):
    """Fold one character id into a partial-word hash pair."""
    c = char_id.astype(xp.uint32) if hasattr(char_id, "astype") else _u32(xp, char_id)
    one = _u32(xp, 1)
    lo = h_lo * _u32(xp, CH_A) + c + one
    hi = h_hi * _u32(xp, CH_B) + c + one
    return lo, hi


def hash_string(prefix: str, char2id) -> tuple:
    """Host helper: hash a full string through the char lanes (numpy)."""
    lo = np.uint32(0)
    hi = np.uint32(0)
    with np.errstate(over="ignore"):
        for ch in prefix:
            lo, hi = hash_extend_char(np, lo, hi, np.uint32(char2id[ch]))
    return lo, hi


def hash_text_commit(xp, t_lo, t_hi, w_lo, w_hi):
    """Fold a committed word's hash pair into the text hash pair."""
    salt = _u32(xp, TXT_SALT)
    lo = t_lo * _u32(xp, TXT_A) + (w_lo ^ salt)
    hi = t_hi * _u32(xp, TXT_B) + (w_hi ^ salt)
    return lo, hi
