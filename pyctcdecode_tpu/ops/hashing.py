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

from typing import Any, Optional, Tuple

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


def fnv1a(xp: Any, ids: Any, valid_len: Optional[Any] = None) -> Any:
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


def fnv1a_seeded(xp: Any, ids: Any, seed: Any) -> Any:
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


def hash_extend_char(xp: Any, h_lo: Any, h_hi: Any, char_id: Any) -> Tuple[Any, Any]:
    """Fold one character id into a partial-word hash pair."""
    c = char_id.astype(xp.uint32) if hasattr(char_id, "astype") else _u32(xp, char_id)
    one = _u32(xp, 1)
    lo = h_lo * _u32(xp, CH_A) + c + one
    hi = h_hi * _u32(xp, CH_B) + c + one
    return lo, hi


def mix4(xp: Any, a: Any, b: Any, c: Any, d: Any) -> Any:
    """Fold four uint32 streams into one uint32 lane (beam merge keys)."""
    h = a * _u32(xp, 0x01000193) ^ b
    h = h * _u32(xp, 0x01000193) ^ c
    return h * _u32(xp, 0x01000193) ^ d


def hash_string(prefix: str, char2id: Any) -> tuple:
    """Host helper: hash a full string through the char lanes (numpy)."""
    lo = np.uint32(0)
    hi = np.uint32(0)
    with np.errstate(over="ignore"):
        for ch in prefix:
            lo, hi = hash_extend_char(np, lo, hi, np.uint32(char2id[ch]))
    return lo, hi


def hash_text_commit(xp: Any, t_lo: Any, t_hi: Any, w_lo: Any, w_hi: Any) -> Tuple[Any, Any]:
    """Fold a committed word's hash pair into the text hash pair."""
    salt = _u32(xp, TXT_SALT)
    lo = t_lo * _u32(xp, TXT_A) + (w_lo ^ salt)
    hi = t_hi * _u32(xp, TXT_B) + (w_hi ^ salt)
    return lo, hi


# --------------------------------------------------------------------------
# KenLM-compatible hashing (binary .bin ingestion, models/kenlm_bin.py)
#
# KenLM's PROBING format keys its n-gram hash tables by a 64-bit rolling
# hash over word ids (kenlm lm/search_hashed.hh ``detail::CombineWordHash``)
# and its vocabulary by MurmurHash64A of the word string (kenlm
# lm/vocab.cc ``detail::HashForVocab``). Reading those tables means
# reproducing both hashes exactly: host-side in numpy uint64, device-side
# as u32 lane pairs (the TPU has no 64-bit integer units, so the 64-bit
# multiply is spelled out in 32x32->64 pieces below).
# --------------------------------------------------------------------------
KENLM_MUL_A = 8978948897894561157  # CombineWordHash multipliers
KENLM_MUL_B = 17894857484156487943
_MASK64 = (1 << 64) - 1


def murmur64(data: bytes, seed: int = 0) -> int:
    """MurmurHash64A (Appleby) over ``data`` — kenlm's vocab string hash."""
    m = 0xC6A4A7935BD1E995
    r = 47
    h = (seed ^ ((len(data) * m) & _MASK64)) & _MASK64
    n8 = len(data) & ~7
    for i in range(0, n8, 8):
        k = int.from_bytes(data[i : i + 8], "little")
        k = (k * m) & _MASK64
        k ^= k >> r
        k = (k * m) & _MASK64
        h = ((h ^ k) * m) & _MASK64
    tail = data[n8:]
    if tail:
        h ^= int.from_bytes(tail, "little")
        h = (h * m) & _MASK64
    h ^= h >> r
    h = (h * m) & _MASK64
    h ^= h >> r
    return h


def kenlm_chain_host(keys: "np.ndarray") -> "np.ndarray":
    """KenLM n-gram hash over NATURAL-order id rows ``[..., n]`` (u64).

    kenlm folds from the PREDICTED (newest) word backward through the
    context: its hashed search starts the node at the new word's id and
    applies ``CombineWordHash(c, w) = c * A ^ (w + 1) * B`` (mod 2^64)
    per context word, nearest first (``lm/model.cc`` ScoreExceptBackoff;
    ``lm/search_hashed.cc`` ReadNGrams stores keys over the
    REVERSED-order ``vocab_ids`` the ARPA reader fills). So for a
    natural-order row (w1..wn): ``chain = fold(combine, start=wn) over
    w(n-1)..w1``. (Round 4 fixed the fold direction — it previously ran
    oldest-first, self-consistently across reader/writer/scorer/device,
    which round-trip tests could not catch; authentic kenlm PROBING
    binaries would have missed every n>=2-gram.)
    """
    keys = np.asarray(keys)
    with np.errstate(over="ignore"):
        h = keys[..., -1].astype(np.uint64)
        a = np.uint64(KENLM_MUL_A)
        b = np.uint64(KENLM_MUL_B)
        one = np.uint64(1)
        for j in range(keys.shape[-1] - 2, -1, -1):
            w = keys[..., j].astype(np.uint64)
            h = (h * a) ^ ((w + one) * b)
    return h


def umul32_wide(xp: Any, a: Any, b: Any) -> Tuple[Any, Any]:
    """Full 32x32 -> 64 unsigned multiply as a (lo, hi) u32 pair."""
    mask = _u32(xp, 0xFFFF)
    a0 = a & mask
    a1 = a >> _u32(xp, 16)
    b0 = b & mask
    b1 = b >> _u32(xp, 16)
    m00 = a0 * b0
    m01 = a0 * b1
    m10 = a1 * b0
    m11 = a1 * b1
    mid = (m00 >> _u32(xp, 16)) + (m01 & mask) + (m10 & mask)
    lo = (m00 & mask) | ((mid & mask) << _u32(xp, 16))
    hi = m11 + (m01 >> _u32(xp, 16)) + (m10 >> _u32(xp, 16)) + (mid >> _u32(xp, 16))
    return lo, hi


def _mul64_by_const(xp, lo, hi, c_lo: int, c_hi: int):
    """Low 64 bits of a (lo, hi) u32-pair value times a 64-bit constant."""
    p_lo, p_hi = umul32_wide(xp, lo, _u32(xp, c_lo))
    p_hi = p_hi + lo * _u32(xp, c_hi) + hi * _u32(xp, c_lo)
    return p_lo, p_hi


def kenlm_chain(xp: Any, keys: Any) -> Tuple[Any, Any]:
    """KenLM n-gram hash over id rows ``[..., n]`` as a (lo, hi) u32 pair.

    Bit-identical to :func:`kenlm_chain_host`; written in u32 lanes so it
    runs on TPU (no 64-bit integers) and in numpy alike.
    """
    keys = xp.asarray(keys)
    a_lo = KENLM_MUL_A & 0xFFFFFFFF
    a_hi = KENLM_MUL_A >> 32
    b_lo = KENLM_MUL_B & 0xFFFFFFFF
    b_hi = KENLM_MUL_B >> 32
    h_lo = keys[..., -1].astype(xp.uint32)
    h_hi = xp.zeros_like(h_lo)
    for j in range(keys.shape[-1] - 2, -1, -1):
        w1 = keys[..., j].astype(xp.uint32) + _u32(xp, 1)
        t_lo, t_hi = _mul64_by_const(xp, h_lo, h_hi, a_lo, a_hi)
        u_lo, u_hi = umul32_wide(xp, w1, _u32(xp, b_lo))
        u_hi = u_hi + w1 * _u32(xp, b_hi)
        h_lo = t_lo ^ u_lo
        h_hi = t_hi ^ u_hi
    return h_lo, h_hi


def mix32_pair(xp: Any, lo: Any, hi: Any, seed: Any) -> Any:
    """Seeded 32-bit mix of a u32 hash pair (murmur3 finalizer core).

    KenLM-keyed probe tables derive their base slot and both fingerprint
    lanes from the one 64-bit kenlm key; independent seeds keep the three
    derived values uncorrelated, and a build-time fingerprint collision can
    bump the seeds without touching the key (same contract as
    :func:`fnv1a_seeded` for id-keyed tables).
    """
    h = lo ^ (hi * _u32(xp, 0x85EBCA6B)) ^ xp.asarray(seed, dtype=xp.uint32)
    h ^= h >> _u32(xp, 16)
    h = h * _u32(xp, 0x85EBCA6B)
    h ^= h >> _u32(xp, 13)
    h = h * _u32(xp, 0xC2B2AE35)
    h ^= h >> _u32(xp, 16)
    return h
