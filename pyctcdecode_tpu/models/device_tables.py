"""Device-resident LM tables: fingerprint probe tables and a packed vocab trie.

The reference scores beams through per-word C++ callbacks into KenLM
(ref ``language_model.py:306-360``); a TPU cannot call back to the host per
word, so this module compiles the same model into flat arrays probed
on-device with gathers:

* **n-gram tables** — one bucketized hash table per order n >= 2: 16
  slots per bucket, a bucket row packed as 64 i32 words (struct-of-arrays:
  16x fp_lo, 16x fp_hi, 16x prob, 16x backoff). A probe is ONE 256-byte
  row-gather — TPU gather cost is per-row (issue-bound: measured flat in
  row width in-program, scripts/gather_cost_model.py + round-4 profiles)
  — followed by in-register fingerprint compares. Keys are matched by 64-bit fingerprint (KenLM's
  probing format accepts the same hashed-key risk); build-time reseeding
  keeps residents of every bucket fingerprint-distinct, so every key that
  IS in the table always resolves to its own value.
* **unigrams** — a dense ``[vocab, 4]`` array indexed by word id directly
  (no hashing at all for order-1 probes).
* **vocab trie** — a packed character trie over the LM vocabulary plus the
  known-unigram set. Beams carry their in-progress word as a trie node id;
  one gather per consumed character advances it. Node flags answer every
  string question the decoder asks: "is this partial a prefix of a known
  unigram" (ref ``language_model.py:326-336``), "what is this completed
  word's LM id", "is it in the unigram set / the LM vocab"
  (OOV rule, ref ``language_model.py:349-353``).

Everything is built host-side as numpy (fully vectorized — bucket slot
assignment is a ``searchsorted`` rank over base-sorted entries) and
moved to device once per model; lookup functions are pure jnp and
shape-static, safe under ``jit``/``scan``.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..ops.hashing import (
    fnv1a,
    fnv1a_seeded,
    kenlm_chain,
    mix32_pair,
)
from ..ops.tokens import TokenArrays
from .language_model import LanguageModel
from .ngram import BOS_WORD, EOS_WORD, NGramTables

_MIN_TABLE = 8

# packed hotword-trie entry layout: child node (20 bits), shortest-completion
# length (10 bits, saturating), is-hotword-terminal (bit 30)
HOT_NODE_MASK = (1 << 20) - 1
HOT_MINCOMP_SHIFT = 20
HOT_MINCOMP_MAX = 1023
HOT_WORD_BIT = 1 << 30


# --------------------------------------------------------------------------
# n-gram fingerprint tables (orders >= 2) + dense unigram array
# --------------------------------------------------------------------------
_FP_EMPTY = np.uint32(0xFFFFFFFF)  # fp_lo sentinel marking an empty slot
_FP_SEED_LO = 0x811C9DC5 ^ 0x5BD1E995
_FP_SEED_HI = 0x811C9DC5 ^ 0xC2B2AE35


# Bucket geometry. A bucket row is ``_SUB_BUCKETS`` independent 16-slot
# sub-blocks, each laid out [lo x16 | hi x16 | prob x16 | backoff x16], so
# one row-gather serves a 32-resident bucket while every readout fusion
# still sees the 64-word (16-lane-compare) shapes the scheduler likes.
# History behind the split layout:
#   * round 4 measured in-program gather cost per ROW flat in row width,
#     and 16-slot/64-word rows halved the fingerprint-compare lanes —
#     so 16 slots became the readout granularity;
#   * a round-5 A/B with plain 32-slot buckets (rows [lo x32 | hi x32 |
#     ...]) cut the fp gather wall 576 -> 339 ms/batch (the halved
#     bucket count absorbs the Poisson max-bucket tail AND the smaller
#     plane gathers faster), but the 128-lane readout reshaped the
#     step's fusion graph and total busy REGRESSED 1,471 -> 1,901 ms.
# The sub-bucket split keeps that gather win while the readout stays two
# of the proven 64-word passes (found = f0|f1; the masked sums stay
# single-touch because fingerprints are pairwise distinct across the
# WHOLE row by construction).
_BUCKET_SLOTS = 16  # slots per sub-block = readout compare lanes
_SUB_BUCKETS = 2
_BUCKET_CAP = _BUCKET_SLOTS * _SUB_BUCKETS  # residents per gathered row
_SUB_WIDTH = 4 * _BUCKET_SLOTS
_BUCKET_WIDTH = _SUB_WIDTH * _SUB_BUCKETS


def mark_empty_fp_rows(rows_u32: np.ndarray) -> None:
    """Set every sub-block's fp_lo lanes to the empty sentinel, in place.

    Zero-filled rows are NOT safe vacancies — 0 is a valid fingerprint
    lane value — so padding/vacant rows must carry the sentinel in each
    sub-block's lo field (the hi/prob/backoff fields can stay zero).
    """
    for sub in range(_SUB_BUCKETS):
        rows_u32[:, sub * _SUB_WIDTH : sub * _SUB_WIDTH + _BUCKET_SLOTS] = _FP_EMPTY


@dataclasses.dataclass
class FPTable:
    """One order's probe table in the single-gather bucket layout.

    Entries live in the bucket their base hash selects — never elsewhere —
    so a probe is: gather ``bucket[h % size]`` (one row of
    ``_BUCKET_WIDTH`` words), compare the query's 64-bit fingerprint
    against all resident fingerprints in-register, and read the matching
    slot's (prob, backoff). The build grows ``size`` until every bucket fits and
    reseeds the fingerprint lanes until residents of every bucket are
    pairwise distinct, so present keys always resolve exactly.
    """

    n: int  # key width (the order)
    size: int  # bucket count (2^k or 3*2^k rung)
    seed_lo: int  # fingerprint lane seeds (reseeded on build-time collision)
    seed_hi: int
    count: int
    # i32 [size, _BUCKET_WIDTH], struct-of-arrays columns in slot-count
    # strides: fp_lo (u32 bits, _FP_EMPTY = vacant), fp_hi, prob (f32
    # bits), backoff (f32 bits)
    bucket: np.ndarray
    # "fnv": keys are id tuples hashed with seeded FNV lanes (ARPA/.ctclm
    # models). "kenlm": entries came from a KenLM PROBING binary, which
    # stores only each n-gram's 64-bit chain hash — bucket index and both
    # fingerprint lanes are seeded mixes of that hash pair, and the probe
    # recomputes the chain from the query ids (models/kenlm_bin.py).
    hash_mode: str = "fnv"


def _fp_lanes(keys: np.ndarray, seed_lo: int, seed_hi: int):
    """64-bit fingerprint as two u32 lanes (both reserve the empty sentinel)."""
    lo = fnv1a_seeded(np, keys, np.uint32(seed_lo))
    hi = fnv1a_seeded(np, keys, np.uint32(seed_hi))
    lo = np.minimum(lo, _FP_EMPTY - np.uint32(1))
    hi = np.minimum(hi, _FP_EMPTY - np.uint32(1))
    return lo, hi


def _assemble_fp(
    base_full: np.ndarray,
    lane_fn: "object",
    probs: np.ndarray,
    backoffs: np.ndarray,
    n: int,
    hash_mode: str,
) -> FPTable:
    """Place entries into ``_BUCKET_SLOTS``-slot buckets; pack the plane.

    Bucketized placement (no probing across buckets): entry *e* lives in
    bucket ``base_full[e] % size``, at any free slot. The bucket
    count doubles until the fullest bucket fits (Poisson tails make this
    terminate near load factor ~1/3), then the
    fingerprint lanes (``lane_fn(seed_lo, seed_hi)``) reseed until no two
    residents of a bucket share a full 64-bit fingerprint — lookups of
    present keys are then exact, and the masked-sum readout touches at
    most one slot.
    """
    count = len(base_full)
    probs = np.asarray(probs, dtype=np.float32)
    backoffs = np.asarray(backoffs, dtype=np.float32)
    # size ladder {2^k, 3*2^k}: pure power-of-two growth overshoots —
    # the parity bigram table (1.5M entries) trips the max-bucket Poisson
    # tail at its load-target size and a x2 jump lands it at 134 MB,
    # while the x1.5 rung (393216 buckets, 100 MB) absorbs the tail.
    # Round-5 A/B: serving busy time is IDENTICAL at both sizes (fp
    # gathers are issue-bound, not footprint-bound, in this range), so
    # the rung buys HBM headroom — 25% less waste, which is what matters
    # when a big LM's tables push chip memory — at zero speed cost.
    # Bucket index is ``hash % size`` (mod by a compile-time constant
    # lowers to mul-shift; measured indistinguishable from the mask).
    def _next_size(cur: int) -> int:
        return cur * 3 // 2 if (cur & (cur - 1)) == 0 else cur * 4 // 3

    size = _MIN_TABLE
    while size * (3 * _BUCKET_CAP // 8) < count:  # ~load factor 1/3
        size = _next_size(size)
    while True:
        base = (base_full % np.uint32(size)).astype(np.int64)
        if count:
            counts = np.bincount(base, minlength=size)
            if int(counts.max()) > _BUCKET_CAP:
                size = _next_size(size)
                continue
        break
    order_idx = np.argsort(base, kind="stable")
    sb = base[order_idx]
    # slot within bucket = rank among same-bucket entries (sb is sorted)
    pos = np.arange(count, dtype=np.int64) - np.searchsorted(sb, sb, side="left")
    seed_lo, seed_hi = _FP_SEED_LO, _FP_SEED_HI
    for _attempt in range(256):
        lo, hi = lane_fn(seed_lo, seed_hi)
        lo, hi = lo[order_idx], hi[order_idx]
        same_bucket = sb[1:] == sb[:-1]
        dup = same_bucket & (lo[1:] == lo[:-1]) & (hi[1:] == hi[:-1])
        # sorted-by-bucket order is not sorted by fp, so compare all pairs
        # within each bucket the cheap way: sort (bucket, lo, hi) rows
        if count and bool(np.any(dup)):
            collision = True
        elif count:
            key_order = np.lexsort((hi, lo, sb))
            sb2, lo2, hi2 = sb[key_order], lo[key_order], hi[key_order]
            collision = bool(
                np.any(
                    (sb2[1:] == sb2[:-1])
                    & (lo2[1:] == lo2[:-1])
                    & (hi2[1:] == hi2[:-1])
                )
            )
        else:
            collision = False
        if not collision:
            break
        seed_lo = (seed_lo + 0x9E3779B9) & 0xFFFFFFFF
        seed_hi = (seed_hi + 0x85EBCA6B) & 0xFFFFFFFF
    else:
        raise ValueError(
            "could not find collision-free fingerprint seeds in 256 "
            "attempts — the key set contains entries whose fingerprint "
            "inputs are identical (duplicate keys?)"
        )
    bucket = np.zeros((size, _BUCKET_WIDTH), dtype=np.uint32)
    mark_empty_fp_rows(bucket)
    if count:
        # resident ``pos`` (0.._BUCKET_CAP-1) fills sub-block 0 first
        col = (pos // _BUCKET_SLOTS) * _SUB_WIDTH + pos % _BUCKET_SLOTS
        bucket[sb, col] = lo
        bucket[sb, _BUCKET_SLOTS + col] = hi
        bucket[sb, 2 * _BUCKET_SLOTS + col] = probs[order_idx].view(np.uint32)
        bucket[sb, 3 * _BUCKET_SLOTS + col] = backoffs[order_idx].view(np.uint32)
    return FPTable(
        n=n,
        size=size,
        seed_lo=seed_lo,
        seed_hi=seed_hi,
        count=count,
        bucket=bucket.view(np.int32),
        hash_mode=hash_mode,
    )


def build_fp_table(
    keys: np.ndarray, probs: np.ndarray, backoffs: np.ndarray
) -> FPTable:
    """Build one order's table from id-tuple keys (FNV base + lanes)."""
    keys = np.asarray(keys, dtype=np.int32)
    count, n = keys.shape if keys.ndim == 2 else (0, 1)
    keys = keys.reshape(count, n)
    base_full = fnv1a(np, keys) if count else np.empty(0, dtype=np.uint32)
    return _assemble_fp(
        base_full,
        lambda sl, sh: _fp_lanes(keys, sl, sh),
        probs,
        backoffs,
        n,
        "fnv",
    )


_KENLM_BASE_SEED = 0x243F6A88  # base-slot mix seed for kenlm-keyed tables


def build_fp_table_from_hashes(
    keys64: np.ndarray, probs: np.ndarray, backoffs: np.ndarray, n: int
) -> FPTable:
    """Build one order's table straight from KenLM 64-bit chain hashes.

    A KenLM PROBING binary never stores the n-gram tuples, so the usual
    id-tuple build is impossible — but its chain hash is itself a 64-bit
    fingerprint the device can recompute from query ids
    (:func:`~pyctcdecode_tpu.ops.hashing.kenlm_chain`). Base slot and both
    fingerprint lanes are independent seeded mixes of the hash pair, so
    collision reseeds work exactly as in the FNV build.
    """
    keys64 = np.asarray(keys64, dtype=np.uint64)
    # duplicate chain hashes (authentic probing binaries can contain
    # colliding keys; kenlm's lookup resolves to one of them) would make
    # the fingerprint reseed loop spin forever — keep the first
    # occurrence, matching probing-lookup semantics
    _, first_idx = np.unique(keys64, return_index=True)
    if len(first_idx) != len(keys64):
        keep = np.sort(first_idx)
        keys64 = keys64[keep]
        probs = np.asarray(probs)[keep]
        backoffs = np.asarray(backoffs)[keep]
    lo32 = (keys64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi32 = (keys64 >> np.uint64(32)).astype(np.uint32)
    base_full = mix32_pair(np, lo32, hi32, np.uint32(_KENLM_BASE_SEED))

    def lanes(seed_lo, seed_hi):
        lo = mix32_pair(np, lo32, hi32, np.uint32(seed_lo))
        hi = mix32_pair(np, lo32, hi32, np.uint32(seed_hi))
        return (
            np.minimum(lo, _FP_EMPTY - np.uint32(1)),
            np.minimum(hi, _FP_EMPTY - np.uint32(1)),
        )

    return _assemble_fp(base_full, lanes, probs, backoffs, n, "kenlm")


def probe_fp_host(table: FPTable, keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized numpy mirror of the device probe (build/host-state path)."""
    keys = np.asarray(keys, dtype=np.int32).reshape(-1, table.n)
    nq = keys.shape[0]
    h, lo, hi = _query_hashes(
        np,
        {
            "hash_mode": table.hash_mode,
            "seed_lo": np.uint32(table.seed_lo),
            "seed_hi": np.uint32(table.seed_hi),
        },
        keys,
    )
    base = (h % np.uint32(table.size)).astype(np.int64)
    all_rows = table.bucket.view(np.uint32)[base]  # [Q, _BUCKET_WIDTH]
    s_ = _BUCKET_SLOTS
    found = np.zeros(nq, dtype=bool)
    prob = np.zeros(nq, dtype=np.uint32)
    backoff = np.zeros(nq, dtype=np.uint32)
    for sub in range(all_rows.shape[1] // _SUB_WIDTH):
        rows = all_rows[:, sub * _SUB_WIDTH : (sub + 1) * _SUB_WIDTH]
        eq = (rows[:, :s_] == lo[:, None]) & (
            rows[:, s_ : 2 * s_] == hi[:, None]
        )
        found |= eq.any(axis=1)
        prob += np.where(eq, rows[:, 2 * s_ : 3 * s_], 0).sum(
            axis=1, dtype=np.uint64
        ).astype(np.uint32)
        backoff += np.where(eq, rows[:, 3 * s_ :], 0).sum(
            axis=1, dtype=np.uint64
        ).astype(np.uint32)
    prob = np.where(found, prob, np.uint32(0)).view(np.float32)
    backoff = np.where(found, backoff, np.uint32(0)).view(np.float32)
    return found, prob.astype(np.float32), backoff.astype(np.float32)


def build_unigram_array(
    entries: Dict[Tuple[int, ...], Tuple[np.float32, np.float32]], n_vocab: int
) -> np.ndarray:
    """Dense ``[vocab, 4]`` f32 rows: (prob, backoff, exists, 0) by word id."""
    uni = np.zeros((max(n_vocab, 1), 4), dtype=np.float32)
    for (wid,), (p_val, b_val) in entries.items():
        if 0 <= wid < n_vocab:
            uni[wid, 0] = p_val
            uni[wid, 1] = b_val
            uni[wid, 2] = 1.0
    return uni


def context_suffix_backoffs(dlm: "DeviceLM", ctx: "object") -> np.ndarray:
    """Backoff weights of every suffix of ``ctx`` (right-aligned, 0 absent)."""
    width = max(dlm.order - 1, 1)
    out = np.zeros(width, dtype=np.float32)
    ctx = tuple(int(w) for w in ctx)
    for j in range(1, len(ctx) + 1):
        suffix = ctx[len(ctx) - j :]
        if j == 1:
            wid = suffix[0]
            if 0 <= wid < dlm.uni.shape[0] and dlm.uni[wid, 2] > 0.5:
                out[width - 1] = dlm.uni[wid, 1]
        else:
            found, _, bo = probe_fp_host(
                dlm.fp_tables[j - 2], np.asarray(suffix, dtype=np.int32)
            )
            if bool(found[0]):
                out[width - j] = float(bo[0])
    return out


def _probe_uni_jnp(uni_dev, wid):
    """Dense order-1 lookup: one row-gather per query, no hashing."""
    import jax.numpy as jnp

    rows = uni_dev[jnp.maximum(wid, 0)]
    exists = (rows[:, 2] > 0.5) & (wid >= 0)
    prob = jnp.where(exists, rows[:, 0], 0.0)
    backoff = jnp.where(exists, rows[:, 1], 0.0)
    return exists, prob, backoff


def _query_hashes(xp, tab: Dict, query):
    """Base hash + clamped fingerprint lanes for a query batch ``[Q, n]``.

    Mode "fnv" hashes the id tuple directly; mode "kenlm" first folds the
    ids through KenLM's 64-bit chain (the only key a PROBING binary
    stores) and derives all three values as seeded mixes of that pair.
    """
    if tab.get("hash_mode", "fnv") == "kenlm":
        klo, khi = kenlm_chain(xp, query)
        h = mix32_pair(xp, klo, khi, xp.uint32(_KENLM_BASE_SEED))
        lo = mix32_pair(xp, klo, khi, tab["seed_lo"])
        hi = mix32_pair(xp, klo, khi, tab["seed_hi"])
    else:
        h = fnv1a(xp, query)
        lo = fnv1a_seeded(xp, query, tab["seed_lo"])
        hi = fnv1a_seeded(xp, query, tab["seed_hi"])
    lo = xp.minimum(lo, xp.uint32(0xFFFFFFFE))
    hi = xp.minimum(hi, xp.uint32(0xFFFFFFFE))
    return h, lo, hi


def probe_fp_jnp(tab_dev: Dict, query: "object", valid: "object") -> Tuple:
    """Probe one order's table on device: a single bucket-row gather.

    ``tab_dev``: {"bucket": i32 [size, _BUCKET_WIDTH] (16-slot buckets,
    see :class:`FPTable`), "seed_lo"/"seed_hi": u32 scalars, "size":
    static int}. ``query``: int32 ``[Q, n]``; ``valid``: bool ``[Q]``.
    One 256-byte row-gather per query (per-row cost is issue-bound and
    flat in width; scripts/gather_cost_model.py + round-4 profiles) —
    then the 64-bit fingerprint confirm and (prob, backoff) readout are
    in-register lane math.

    When ``tab_dev`` carries ``shard_axis`` metadata the bucket plane is
    row-sharded over a mesh axis and the probe runs collectively — see
    :func:`_probe_fp_sharded`.
    """
    import jax
    import jax.numpy as jnp

    if tab_dev.get("shard_axis") is not None:
        return _probe_fp_sharded(tab_dev, query, valid)
    size = tab_dev["size"]
    h, lo, hi = _query_hashes(jnp, tab_dev, query)
    base = (h % jnp.uint32(size)).astype(jnp.int32)
    # (round 4: clamping invalid queries' bucket index to 0 for HBM
    # locality was tried and reverted — the extra `where` on the gather
    # index sent the XLA compile time from ~3 min to >25 min per segment
    # program on this backend, for an unmeasurable win)
    rows = tab_dev["bucket"][base]  # [Q, _BUCKET_WIDTH]
    return _bucket_readout(jnp, jax, rows, lo, hi, valid)


def _bucket_readout(jnp, jax, rows, lo, hi, valid):
    """(found, prob, backoff) from gathered bucket rows ``[Q, _BUCKET_WIDTH]``.

    Residents of a bucket have pairwise-distinct 64-bit fingerprints by
    construction (checked across the WHOLE row, sub-blocks included), so
    the masked sums touch at most one slot each and at most one sub-block
    contributes — summing the per-sub results stays single-touch. Each
    sub-block runs the proven 16-lane-compare pass so fusion shapes match
    the 64-word layout the scheduler was tuned on.
    """
    s = _BUCKET_SLOTS
    found = None
    prob = None
    backoff = None
    for sub in range(rows.shape[-1] // _SUB_WIDTH):
        blk = rows[:, sub * _SUB_WIDTH : (sub + 1) * _SUB_WIDTH]
        rl = blk[:, :s].astype(jnp.uint32)
        rh = blk[:, s : 2 * s].astype(jnp.uint32)
        eq = (rl == lo[:, None]) & (rh == hi[:, None]) & valid[:, None]
        f = jnp.any(eq, axis=1)
        pb = jax.lax.bitcast_convert_type(blk[:, 2 * s : 3 * s], jnp.float32)
        bb = jax.lax.bitcast_convert_type(blk[:, 3 * s :], jnp.float32)
        p = jnp.sum(jnp.where(eq, pb, 0.0), axis=1)
        b = jnp.sum(jnp.where(eq, bb, 0.0), axis=1)
        found = f if found is None else (found | f)
        prob = p if prob is None else (prob + p)
        backoff = b if backoff is None else (backoff + b)
    # (round 5: an explicit [4s, Q] transpose of ``rows`` to hand the
    # reductions their preferred Q-minor layout was measured a no-op —
    # XLA canonicalizes it away and the [Q, 64] gather-output relayout
    # copies stay; they are the gather emitter's canonical form, not
    # this readout's doing.)
    return found, prob, backoff


def _probe_fp_sharded(tab_dev: Dict, query: "object", valid: "object") -> Tuple:
    """Collective probe of a row-sharded bucket table (LM larger than HBM).

    The reference shares an arbitrarily large mmap'd KenLM between worker
    processes by fork copy-on-write (ref ``decoder.py:261-269``); the TPU
    analog when the tables exceed a chip's HBM is to row-shard the bucket
    plane over the mesh and exchange probes over ICI. ``tab_dev`` carries
    a local ``[1, rows, _BUCKET_WIDTH]`` block (leading axis sharded by
    ``shard_map``) plus static ``shard_axis``, ``n_shards``, ``shard_rows``.

    One probe round-trip: ``all_gather`` every shard's queries over the
    axis, answer the ones whose bucket falls in the local row range
    (bucketized placement makes ownership trivially unique — no halo),
    ``psum`` the (found, prob, backoff) planes, and slice back this
    shard's block. Costs two small ICI collectives per probe; worth it
    only when the table genuinely cannot be replicated.
    """
    import jax
    import jax.numpy as jnp

    axis = tab_dev["shard_axis"]
    rows_local = tab_dev["shard_rows"]
    q = query.shape[0]
    qa = jax.lax.all_gather(query, axis, tiled=True)  # [n_shards*q, w]
    va = jax.lax.all_gather(valid, axis, tiled=True)  # [n_shards*q]
    h, lo, hi = _query_hashes(jnp, tab_dev, qa)
    base = (h % jnp.uint32(tab_dev["size"])).astype(jnp.int32)
    my_first = jax.lax.axis_index(axis).astype(jnp.int32) * rows_local
    local = base - my_first
    mine = (local >= 0) & (local < rows_local)
    local = jnp.clip(local, 0, rows_local - 1)
    rows = tab_dev["bucket"][0][local]  # [n_shards*q, _BUCKET_WIDTH]
    found, prob, backoff = _bucket_readout(jnp, jax, rows, lo, hi, va & mine)
    found_all = jax.lax.psum(found.astype(jnp.int32), axis)
    prob_all = jax.lax.psum(prob, axis)
    backoff_all = jax.lax.psum(backoff, axis)
    first = jax.lax.axis_index(axis) * q

    def _mine(x):
        return jax.lax.dynamic_slice_in_dim(x, first, q)

    return _mine(found_all) > 0, _mine(prob_all), _mine(backoff_all)


# --------------------------------------------------------------------------
# packed char trie
# --------------------------------------------------------------------------
@dataclasses.dataclass
class PackedTrie:
    """Char trie as flat arrays. Node 0 = root; node ``dead`` swallows."""

    next: np.ndarray  # int32 [N, n_chars]
    word_id: np.ndarray  # int32 [N] (-1: not a vocab word terminal)
    is_uni_word: np.ndarray  # bool [N] (terminal of a known-unigram)
    is_uni_prefix: np.ndarray  # bool [N] (prefix of a known-unigram)
    min_completion: np.ndarray  # int32 [N] shortest key length through node
    dead: int

    @property
    def n_nodes(self) -> int:
        return int(self.next.shape[0])


class _TrieBuilder:
    def __init__(self, n_chars: int) -> None:
        self.n_chars = n_chars
        self.next: List[np.ndarray] = [np.full(n_chars, -1, dtype=np.int64)]
        self.word_id: List[int] = [-1]
        self.is_uni_word: List[bool] = [False]
        self.is_uni_prefix: List[bool] = [False]
        self.min_completion: List[int] = [0]

    def insert(self, key_ids: List[int], depth_len: int) -> int:
        """Insert a key path; returns its terminal node id."""
        node = 0
        if self.min_completion[0] == 0 or depth_len < self.min_completion[0]:
            self.min_completion[0] = depth_len
        for cid in key_ids:
            nxt = self.next[node][cid]
            if nxt < 0:
                nxt = len(self.next)
                self.next[node][cid] = nxt
                self.next.append(np.full(self.n_chars, -1, dtype=np.int64))
                self.word_id.append(-1)
                self.is_uni_word.append(False)
                self.is_uni_prefix.append(False)
                self.min_completion.append(depth_len)
            elif depth_len < self.min_completion[nxt]:
                self.min_completion[nxt] = depth_len
            node = int(nxt)
        return node

    def pack(self) -> PackedTrie:
        """Freeze the builder into flat arrays (adds the dead node).

        Nodes are renumbered breadth-first (shallow levels get the lowest
        ids): beams overwhelmingly sit on short partial words, so the hot
        rows of the device trie plane concentrate in its first few MB
        instead of scattering across hundreds (insertion order is
        per-word DFS). Measured on the serving profile: the trie gather
        ran ~1.9x slower PER ROW than the (much smaller) n-gram bucket
        planes purely from access spread over the 400+ MB plane.
        """
        n = len(self.next)
        dead = n
        table = np.stack(self.next) if n else np.zeros((0, self.n_chars), np.int64)

        # BFS order: every node has exactly one parent in a trie, so the
        # frontier expansion needs no dedup; child order within a level is
        # (parent order, char order) — deterministic.
        new_of_old = np.full(n, -1, dtype=np.int64)
        if n:
            frontier = np.array([0], dtype=np.int64)
            new_of_old[0] = 0
            assigned = 1
            while frontier.size:
                kids = table[frontier].reshape(-1)
                kids = kids[kids >= 0]
                new_of_old[kids] = assigned + np.arange(kids.size)
                assigned += kids.size
                frontier = kids

        perm = np.argsort(new_of_old)  # old id at each new position
        old_next = np.where(table >= 0, table, dead)
        remap = np.append(new_of_old, dead)  # dead stays the last id
        nxt = np.full((n + 1, self.n_chars), dead, dtype=np.int32)
        if n:
            nxt[:n] = remap[old_next[perm]].astype(np.int32)
        word_id = np.array(self.word_id, np.int32)[perm] if n else np.zeros(0, np.int32)
        uni_word = np.array(self.is_uni_word, bool)[perm] if n else np.zeros(0, bool)
        uni_prefix = (
            np.array(self.is_uni_prefix, bool)[perm] if n else np.zeros(0, bool)
        )
        min_comp = (
            np.array(self.min_completion, np.int32)[perm]
            if n
            else np.zeros(0, np.int32)
        )
        return PackedTrie(
            next=nxt,
            word_id=np.append(word_id, -1),
            is_uni_word=np.append(uni_word, False),
            is_uni_prefix=np.append(uni_prefix, False),
            min_completion=np.append(min_comp, 0),
            dead=dead,
        )


def build_vocab_trie(
    vocab: Dict[str, int],
    unigram_set: "object",
    char2id: Dict[str, int],
    unk_id: int,
) -> PackedTrie:
    """Trie over LM vocab words (carrying word ids) and known unigrams."""
    builder = _TrieBuilder(len(char2id))

    def _ids(word: str) -> Optional[List[int]]:
        out = []
        for ch in word:
            cid = char2id.get(ch)
            if cid is None:
                return None  # contains a char no decodable string can produce
            out.append(cid)
        return out

    for word, wid in vocab.items():
        if wid == unk_id or word in (BOS_WORD, EOS_WORD):
            continue
        ids = _ids(word)
        if ids is None:
            continue
        node = builder.insert(ids, len(word))
        builder.word_id[node] = wid
    for word in unigram_set:
        ids = _ids(word)
        if ids is None:
            continue
        node = builder.insert(ids, len(word))
        builder.is_uni_word[node] = True
        # mark the whole path as a unigram prefix
        cur = 0
        builder.is_uni_prefix[0] = True
        for cid in ids:
            cur = int(builder.next[cur][cid])
            builder.is_uni_prefix[cur] = True
    return builder.pack()


def _put_row_major(arr: np.ndarray, major_to_minor: Tuple[int, int] = (0, 1)) -> "object":
    """Device-put a 2-D table with an explicit layout (default row-major).

    XLA's gather emitter wants the wide (>= 64-word-row) tables row-major
    and inserts a whole-table relayout copy into programs that disagree
    (~1 ms per segment call on a 211 MB trie plane); pinning the layout at
    upload time removes those copies. The narrow packed trie plane is the
    opposite case: its gather consumes the operand COLUMN-major
    (sub-128-lane rows tile badly row-major), so callers pass
    ``major_to_minor=(1, 0)`` for it — measured 35.9 ms of in-program
    relayout copies per profiled batch otherwise. (An earlier attempt
    appeared to corrupt batch-256 outputs; the real culprit was a [::-1]
    miscompile on the backtrace path — fixed by scan(reverse=True) in
    engine.py — which the layout change merely perturbed into
    triggering.) Falls back to a plain transfer on CPU and on
    layout-API drift.
    """
    import jax
    import jax.numpy as jnp

    try:
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding

        dev = jax.devices()[0]
        if dev.platform == "cpu":
            return jnp.asarray(arr)
        fmt = Format(Layout(major_to_minor), SingleDeviceSharding(dev))
        return jax.device_put(np.ascontiguousarray(arr), fmt)
    except Exception:  # pragma: no cover - layout API drift
        return jnp.asarray(arr)


_TRIE_ROW_WORDS = 64  # target plane-row width (nodes folded per gather row)


def trie_pack_params(n_chars: int) -> Dict[str, int]:
    """Static cell-packing geometry of the trie plane (see _pack_trie_plane).

    BFS numbering makes every node's children CONTIGUOUS ids ordered by
    char, so a child pointer compresses from a 32-bit absolute id to its
    RANK among the node's children (``rb`` bits, all-ones = no child)
    plus the child's 3 flag bits — one small cell per char instead of a
    full i32 entry. The node's slot stores one ``first_child`` word plus
    ``ncw`` packed cell words (+ 4 unigram/word-id words). For a ~28-char
    alphabet this shrinks a node's entry from 64 words to 13 (round-4
    cell packing), and the round-5 multi-node fold (``pack`` slots per
    512-B plane row) moves the per-step row gather onto the wide-row
    fast path — see the ``stride``/``pack`` note below. The unpack is
    elementwise VPU work with no per-step row reads (unlike the radix
    experiment recorded in PARITY.md).
    """
    rb = 1
    while (1 << rb) - 1 < max(n_chars, 1):
        rb += 1  # sentinel (all-ones) must exceed every rank (< n_chars)
    bpc = rb + 3  # rank bits + 3 child flag bits
    cpw = max(32 // bpc, 1)
    ncw = -(-max(n_chars, 1) // cpw)
    w = 1 + ncw + 4
    # Multiple nodes share one PLANE row (node's slot at ``stride``-word
    # alignment, ``pack`` per row): a round-5 A/B measured the gather
    # emitter's per-row cost collapsing ~5x once rows reach 512 B and the
    # plane's ROW COUNT shrinks accordingly (the sub-bucket fp planes:
    # 576 -> 107 ms/batch at [131k, 128] vs [393k, 64]), while a 13-word
    # 826k-row plane gathers at the ~8 ns/row issue floor. The walk
    # gathers ``node // pack`` and extracts the slot with a masked sum —
    # the same proven pattern as the child pick.
    stride = -(-w // 8) * 8
    pack = max(1, _TRIE_ROW_WORDS // stride)
    return {
        "rb": rb, "cpw": cpw, "ncw": ncw, "width": w,
        "stride": stride, "pack": pack,
    }


def _pack_trie_plane(
    trie: PackedTrie, flag3: np.ndarray, uni: np.ndarray
) -> np.ndarray:
    """Build the cell-packed trie plane (see :func:`trie_pack_params`).

    Row layout (width ``1 + ncw + 4`` i32 words):

    * col 0: ``first_child`` — the node's smallest child id (0 if none);
      child at rank r has id ``first_child + r`` (BFS contiguity,
      asserted below);
    * cols 1..ncw: packed cells, ``cpw`` chars per word, char ``c`` in
      word ``c // cpw`` at bit ``(c % cpw) * bpc``; a cell is
      ``rank | (child_flag3 << rb)`` or all-ones when no child;
    * col W-4: the node's word unigram log10-prob (f32 bits),
    * col W-3: its unigram backoff (f32 bits),
    * col W-2: unigram-exists flag,
    * col W-1: the vocab word id (-1 for non-terminal nodes).

    ``flag3`` is the per-node 3-bit flag vector (bit0 IN_VOCAB, bit1
    UNI_WORD, bit2 UNI_PREFIX — the low bits of the packed-entry flag
    nibble, shifted to ``DeviceLM.BIT_*`` positions by the device walk).
    """
    prm = trie_pack_params(trie.next.shape[1])
    rb, cpw, ncw, w = prm["rb"], prm["cpw"], prm["ncw"], prm["width"]
    bpc = rb + 3
    sentinel = np.uint32((1 << bpc) - 1)  # rank all-ones, flags all-ones
    nxt = trie.next  # [N, C], missing children stored as the dead id
    n, c = nxt.shape
    has = nxt != trie.dead
    rank = np.cumsum(has, axis=1, dtype=np.int64) - has
    fc = np.where(
        has.any(axis=1),
        np.min(np.where(has, nxt, np.iinfo(np.int32).max), axis=1),
        0,
    ).astype(np.int64)
    # BFS contiguity is the layout's correctness contract — verify it
    if not bool(
        np.array_equal(np.where(has, nxt, 0), np.where(has, fc[:, None] + rank, 0))
    ):  # pragma: no cover - BFS numbering guarantees this
        raise AssertionError("trie children are not BFS-contiguous")
    cell = np.where(
        has, rank.astype(np.uint32) | (flag3[nxt].astype(np.uint32) << rb), sentinel
    ).astype(np.uint32)
    cells = np.full((n, ncw * cpw), sentinel, dtype=np.uint32)
    cells[:, :c] = cell
    words = np.zeros((n, ncw), dtype=np.uint32)
    for j in range(cpw):
        words |= cells[:, j::cpw] << np.uint32(j * bpc)
    rows = np.zeros((n, w), dtype=np.int32)
    rows[:, 0] = fc.astype(np.int32)
    rows[:, 1 : 1 + ncw] = words.view(np.int32)
    word_id = trie.word_id
    has_w = word_id >= 0
    wid_safe = np.where(has_w, word_id, 0)
    rows[:, w - 4] = np.where(has_w, uni[wid_safe, 0].view(np.int32), 0)
    rows[:, w - 3] = np.where(has_w, uni[wid_safe, 1].view(np.int32), 0)
    rows[:, w - 2] = np.where(has_w, uni[wid_safe, 2] > 0.5, False).astype(np.int32)
    rows[:, w - 1] = word_id
    # fold ``pack`` consecutive nodes into each 512-B plane row (slots at
    # ``stride``-word alignment); trailing pad slots are unreachable —
    # node ids stay < n, so no gather ever selects them
    stride, pack = prm["stride"], prm["pack"]
    n_rows = -(-n // pack)
    plane = np.zeros((n_rows * pack, stride), dtype=np.int32)
    plane[:n, :w] = rows
    return plane.reshape(n_rows, pack * stride)


def trie_fetch_rows(jnp, trie_rows, tp: Dict[str, int], nodes):
    """Per-node trie rows ``[..., width]`` from the multi-node-packed plane.

    One 512-B row-gather of ``nodes // pack`` (the fast-path granularity,
    see :func:`trie_pack_params`), then a masked sum over the row's
    ``pack`` slots extracts each node's ``width`` words — elementwise VPU
    work, no second gather.
    """
    pack, stride, w = tp["pack"], tp["stride"], tp["width"]
    if pack == 1:
        return trie_rows[nodes][..., :w]
    packed = trie_rows[nodes // pack]  # [..., pack*stride]
    sub = nodes % pack
    out = None
    for s_i in range(pack):
        blk = jnp.where(
            (sub == s_i)[..., None],
            packed[..., s_i * stride : s_i * stride + w],
            0,
        )
        out = blk if out is None else out + blk
    return out


def trie_seed_nodes(trie: PackedTrie, tokens: TokenArrays) -> np.ndarray:
    """Node reached from the root by each token's piece (boundary seeding)."""
    v = tokens.vocab_size
    seeds = np.zeros(v, dtype=np.int32)
    for t in range(v):
        node = 0
        for j in range(int(tokens.piece_len[t])):
            cid = int(tokens.piece_chars[t, j])
            node = int(trie.next[node, cid])
        seeds[t] = node
    return seeds


# --------------------------------------------------------------------------
# bundle
# --------------------------------------------------------------------------
@dataclasses.dataclass
class DeviceLM:
    """Everything the device scan needs to score a shallow-fusion n-gram LM."""

    order: int
    unk_id: int
    eos_id: int
    unk_prob10: float  # unigram log10 prob of <unk> (ill-formed-table fallback)
    start_ctx: np.ndarray  # int32 [order-1], right-aligned, -1 pad (<s> state)
    start_ctx_len: int
    start_ctx_backoffs: np.ndarray  # f32 [order-1], suffix backoffs of start_ctx
    uni: np.ndarray  # f32 [vocab, 4]: (prob, backoff, exists, 0) by word id
    fp_tables: List[FPTable]  # orders 2..order, bucketized layout
    trie: PackedTrie
    seed_node: np.ndarray  # int32 [V]
    has_unigrams: bool

    # bit layout of packed trie transition entries: the child node id in the
    # low 28 bits plus the child's flags, so a walk's single gather also
    # yields everything the scorer asks about the new partial word
    NODE_MASK = (1 << 28) - 1
    BIT_IN_VOCAB = 1 << 28
    BIT_UNI_WORD = 1 << 29
    BIT_UNI_PREFIX = 1 << 30

    def _node_flag_bits(self, nodes: np.ndarray) -> np.ndarray:
        bits = np.zeros(nodes.shape, dtype=np.int64)
        bits |= np.where(self.trie.word_id[nodes] >= 0, self.BIT_IN_VOCAB, 0)
        bits |= np.where(self.trie.is_uni_word[nodes], self.BIT_UNI_WORD, 0)
        bits |= np.where(self.trie.is_uni_prefix[nodes], self.BIT_UNI_PREFIX, 0)
        return bits

    def _node_flag3(self) -> np.ndarray:
        """Per-node 3-bit flags (low-bit form packed into trie-plane cells)."""
        f = (self.trie.word_id >= 0).astype(np.uint32)
        f |= self.trie.is_uni_word.astype(np.uint32) << 1
        f |= self.trie.is_uni_prefix.astype(np.uint32) << 2
        return f

    @property
    def trie_pack(self) -> Dict[str, int]:
        """Static packing geometry of the trie plane (+ the dead node id)."""
        prm = dict(trie_pack_params(self.trie.next.shape[1]))
        prm["dead"] = self.trie.dead
        return prm

    def as_device(self, include_fp: bool = True) -> Dict:
        """jnp pytree of all arrays (call once, reuse across decodes).

        ``include_fp=False`` skips device-putting the (large) n-gram slot
        planes — used when those planes are about to be mesh-sharded
        instead of replicated.
        """
        import jax.numpy as jnp

        if self.trie.n_nodes >= (1 << 28):
            raise ValueError("vocab trie exceeds the 2^28 packed-node limit")
        seed_packed = (
            self.seed_node.astype(np.int64) | self._node_flag_bits(self.seed_node)
        ).astype(np.int32)
        return {
            "uni": _put_row_major(self.uni),
            "fp": [
                {
                    "bucket": _put_row_major(t.bucket),
                    "seed_lo": jnp.uint32(t.seed_lo),
                    "seed_hi": jnp.uint32(t.seed_hi),
                    "size": t.size,
                }
                for t in self.fp_tables
            ]
            if include_fp
            else [],
            # multi-node 512-B rows ride the wide-row gather fast path,
            # which wants its operand ROW-major (the narrow 13-word plane
            # wanted column-major — that pin moved with the old layout)
            "trie_rows": _put_row_major(
                _pack_trie_plane(self.trie, self._node_flag3(), self.uni)
            ),
            "trie_word_id": jnp.asarray(self.trie.word_id),
            "uni_unk_row": jnp.asarray(self.uni[self.unk_id]),
            "seed_node": jnp.asarray(seed_packed),
            "start_ctx": jnp.asarray(self.start_ctx),
        }


def build_device_lm(language_model: LanguageModel, tokens: TokenArrays) -> DeviceLM:
    """Compile a :class:`LanguageModel` into :class:`DeviceLM` tables.

    Two sources feed the same device layout: the pure-Python
    :class:`NGramTables` (hash tables built here) or the native C++ engine
    (tables exported directly — identical slot layout by construction).
    """
    from .kenlm_bin import KenLMBinaryModel
    from .native import NativeNGramModel

    ngram = language_model.ngram_model
    if isinstance(ngram, KenLMBinaryModel):
        kt = ngram.tables
        order = kt.order
        unk_id = kt.unk_id
        eos_id = kt.vocab.get(EOS_WORD, unk_id)
        unk_prob10 = float(kt.uni[unk_id]["prob"])
        vocab = kt.vocab
        bos_state = kt.begin_sentence_state()
        # kenlm's unigram array is dense by id: every id exists at order 1
        n_vocab = max(len(vocab), 1)
        uni = np.zeros((n_vocab, 4), dtype=np.float32)
        uni[: len(kt.uni), 0] = kt.uni["prob"]
        uni[: len(kt.uni), 1] = kt.uni["backoff"]
        uni[: len(kt.uni), 2] = 1.0
        fp_tables = [
            build_fp_table_from_hashes(keys64, probs, backoffs, n_order)
            for n_order, (keys64, probs, backoffs) in enumerate(
                kt.raw, start=2
            )
        ]
    elif isinstance(ngram, NativeNGramModel):
        nat = ngram.native
        order = nat.order
        unk_id = nat.unk_id
        eos_id = nat.eos_id if nat.eos_id >= 0 else unk_id
        unk_prob10 = nat.unk_prob10
        vocab = {w: i for i, w in enumerate(nat.vocab_list())}
        bos_state = ngram.begin_sentence_state()
        # per-order occupied entries straight from the native tables
        uni = np.zeros((max(len(vocab), 1), 4), dtype=np.float32)
        fp_tables: List[FPTable] = []
        for n_order, exp in enumerate(nat.export_tables(), start=1):
            keys = exp["keys"]
            occupied = keys[:, -1] >= 0
            keys = keys[occupied]
            probs = exp["probs"][occupied]
            backoffs = exp["backoffs"][occupied]
            if n_order == 1:
                wids = keys[:, 0]
                uni[wids, 0] = probs
                uni[wids, 1] = backoffs
                uni[wids, 2] = 1.0
            else:
                fp_tables.append(build_fp_table(keys, probs, backoffs))
    else:
        tables_py: NGramTables = ngram.tables
        order = tables_py.order
        unk_id = tables_py.unk_id
        eos_id = tables_py.vocab.get(EOS_WORD, unk_id)
        uni_unk = tables_py.ngrams[0].get((unk_id,))
        unk_prob10 = float(uni_unk[0]) if uni_unk is not None else -99.0
        vocab = tables_py.vocab
        bos_state = tables_py.begin_sentence_state()
        uni = build_unigram_array(tables_py.ngrams[0], len(vocab))
        fp_tables = []
        for n_order in range(2, order + 1):
            entries = tables_py.ngrams[n_order - 1]
            keys = np.array(list(entries.keys()), dtype=np.int32).reshape(
                len(entries), n_order
            )
            vals = np.array(list(entries.values()), dtype=np.float32).reshape(
                len(entries), 2
            )
            fp_tables.append(build_fp_table(keys, vals[:, 0], vals[:, 1]))

    # the trie's char ids must extend the token char map with vocab-only chars
    char2id = dict(tokens.char2id)
    for word in vocab:
        for ch in word:
            if ch not in char2id:
                char2id[ch] = len(char2id)
    for word in language_model.unigram_set:
        for ch in word:
            if ch not in char2id:
                char2id[ch] = len(char2id)
    trie = build_vocab_trie(vocab, language_model.unigram_set, char2id, unk_id)
    seed_node = trie_seed_nodes(trie, tokens)
    ctx_width = max(order - 1, 1)
    start_ctx = np.full(ctx_width, -1, dtype=np.int32)
    for i, wid in enumerate(bos_state):
        start_ctx[ctx_width - len(bos_state) + i] = wid
    dlm = DeviceLM(
        order=order,
        unk_id=unk_id,
        eos_id=eos_id,
        unk_prob10=unk_prob10,
        start_ctx=start_ctx,
        start_ctx_len=len(bos_state),
        start_ctx_backoffs=np.zeros(ctx_width, dtype=np.float32),
        uni=uni,
        fp_tables=fp_tables,
        trie=trie,
        seed_node=seed_node,
        has_unigrams=len(language_model.unigram_set) > 0,
    )
    dlm.start_ctx_backoffs = context_suffix_backoffs(dlm, bos_state)
    return dlm


def build_hotword_tables(
    hotword_unigrams: "object",
    char2id: Dict[str, int],
    tokens: TokenArrays,
    min_nodes: int = 8,
) -> Dict[str, np.ndarray]:
    """Per-call hotword trie as traced device arrays (ref language_model.py:115-189).

    Hotwords change per decode call, so these arrays are *inputs* to the
    compiled program, not baked constants; node counts are padded to powers
    of two so different hotword sets of similar size reuse one executable.
    ``next``/``seed`` entries are packed (child node id + the child's
    shortest-completion length + terminal flag, see ``HOT_NODE_MASK``) so a
    walk's single gather also answers every scoring question. ``dead`` is
    the swallowing node id.
    """
    builder = _TrieBuilder(len(char2id))
    for word in hotword_unigrams:
        ids = []
        ok = True
        for ch in word:
            cid = char2id.get(ch)
            if cid is None:
                ok = False
                break
            ids.append(cid)
        if not ok:
            continue  # contains an undecodable char: can never match
        node = builder.insert(ids, len(word))
        builder.is_uni_word[node] = True
    trie = builder.pack()
    if trie.n_nodes >= (1 << 20):
        raise ValueError("hotword trie exceeds the 2^20 packed-node limit")

    def _pack(nodes: np.ndarray) -> np.ndarray:
        mc = np.minimum(trie.min_completion[nodes], HOT_MINCOMP_MAX).astype(np.int64)
        bits = nodes.astype(np.int64) | (mc << HOT_MINCOMP_SHIFT)
        bits |= np.where(trie.is_uni_word[nodes], HOT_WORD_BIT, 0)
        return bits.astype(np.int32)

    n = trie.n_nodes  # includes the dead node
    n_pad = min_nodes
    while n_pad < n:
        n_pad *= 2
    nxt = np.full(
        (n_pad, trie.next.shape[1]),
        int(_pack(np.array([trie.dead]))[0]),
        dtype=np.int32,
    )
    nxt[:n] = _pack(trie.next)
    return {
        "next": nxt,
        "seed": _pack(trie_seed_nodes(trie, tokens)),
        "dead": np.int32(trie.dead),
    }


def empty_hotword_tables(tokens: TokenArrays) -> Dict[str, np.ndarray]:
    """No-hotword stand-in (root-only trie; every walk lands dead)."""
    return build_hotword_tables([], tokens.char2id, tokens)


def lm_score_words_jnp(
    dev: Dict,
    order: int,
    unk_prob10: float,
    ctx: "object",
    ctx_len: "object",
    wid: "object",
    ctx_backoffs: "object" = None,
    stats_out: Optional[Dict] = None,
    uni_probe: Optional[Tuple] = None,
) -> Tuple:
    """Batched KenLM-``BaseScore``-equivalent on device.

    ``ctx``: int32 ``[Q, order-1]`` right-aligned (-1 pad), ``ctx_len [Q]``,
    ``wid [Q]``. Returns ``(raw10 [Q] f32, out_ctx [Q, order-1], out_len [Q],
    out_backoffs [Q, order-1])`` matching :meth:`NGramTables.raw_score`
    bit-for-bit on float32.

    ``uni_probe`` optionally supplies the word's order-1 probe result
    ``(found [Q] bool, prob [Q] f32, backoff [Q] f32)`` — the engine reads
    it off the beam's trie row (see ``_pad_trie_rows``), saving the dense
    unigram gather here.

    ``stats_out`` (optional dict) receives ``{"hits": [found_1..found_n]}``
    — per-order boolean hit masks of the full-suffix probes — for the
    engine's opt-in decode statistics.

    ``ctx_backoffs`` holds the backoff weights of every context suffix
    (right-aligned like ``ctx``; 0 where absent). Because the outgoing
    state is always a suffix of ``full``, the out-state's suffix backoffs
    fall out of the same probe — so a beam that carries them never probes
    context keys again, cutting queries per word from ``2*order - 1`` to
    ``order``. Pass ``None`` to self-probe the context keys instead
    (stateless callers).
    """
    import jax.numpy as jnp

    ctx_width = max(order - 1, 1)
    q = wid.shape[0]
    if uni_probe is not None:
        f1, p1, b1 = uni_probe
    else:
        f1, p1, b1 = _probe_uni_jnp(dev["uni"], wid)
    if order == 1:
        if stats_out is not None:
            stats_out["hits"] = [f1]
        score = jnp.where(f1, p1, jnp.float32(unk_prob10))
        zeros = jnp.zeros((q,), dtype=jnp.int32)
        zbo = jnp.zeros((q, ctx_width), dtype=jnp.float32)
        return score.astype(jnp.float32), jnp.full_like(ctx, -1), zeros, zbo

    full = jnp.concatenate([ctx, wid[:, None].astype(jnp.int32)], axis=1)  # [Q, order]
    k = ctx_len  # number of context words

    # probe every full-suffix key: order 1 via the dense unigram rows, the
    # rest via each order's bucket table (one gathered row per query)
    found = [f1]
    prob = [p1]
    backoff = [b1]
    for n in range(2, order + 1):
        f, p, b = probe_fp_jnp(
            dev["fp"][n - 2], full[:, order - n :], (k + 1) >= n
        )
        found.append(f)
        prob.append(p)
        backoff.append(b)
    if stats_out is not None:
        stats_out["hits"] = list(found)
    if ctx_backoffs is None:
        # stateless path: also probe the context-suffix keys for backoffs
        ctx_bo = []
        for j in range(1, order):
            if j == 1:
                cf, _, cb = _probe_uni_jnp(dev["uni"], ctx[:, -1])
                cf = cf & (k >= 1)
            else:
                cf, _, cb = probe_fp_jnp(
                    dev["fp"][j - 2], ctx[:, ctx_width - j :], k >= j
                )
            ctx_bo.append(jnp.where(cf, cb, 0.0))
    else:
        ctx_bo = [ctx_backoffs[:, ctx_width - j] for j in range(1, order)]

    # longest match over full suffixes
    matched = jnp.zeros_like(k)
    best_prob = jnp.zeros((q,), dtype=jnp.float32)
    for n in range(1, order + 1):
        take = found[n - 1]
        matched = jnp.where(take, n, matched)
        best_prob = jnp.where(take, prob[n - 1], best_prob)
    no_match = matched == 0
    best_prob = jnp.where(no_match, jnp.float32(unk_prob10), best_prob)
    matched = jnp.where(no_match, 1, matched)

    # backoff accumulation over unmatched context suffixes, ascending j
    # (sequential f32 adds in the same order as the host scorer); the
    # suffix-j backoff sits right-aligned at column ctx_width - j when
    # carried on the beam
    score = best_prob
    for j in range(1, order):
        use = (j >= matched) & (j <= k)
        score = jnp.where(use, (score + ctx_bo[j - 1]).astype(jnp.float32), score)

    # outgoing state: longest suffix of `full` present, capped at order-1
    out_n = jnp.zeros_like(k)
    for n in range(1, order):
        out_n = jnp.where(found[n - 1], n, out_n)
    positions = jnp.arange(ctx_width)[None, :]
    tail = full[:, 1:]
    out_ctx = jnp.where(positions >= (ctx_width - out_n[:, None]), tail, -1)
    # out-state suffix backoffs: suffix j of the out state == full suffix j
    # (valid for j <= out_n); right-aligned at column ctx_width - j
    out_bo_cols = []
    for col in range(ctx_width):
        j = ctx_width - col
        bo = jnp.where((j <= out_n) & found[j - 1], backoff[j - 1], 0.0)
        out_bo_cols.append(bo)
    out_backoffs = jnp.stack(out_bo_cols, axis=1).astype(jnp.float32)
    return score, out_ctx.astype(jnp.int32), out_n.astype(jnp.int32), out_backoffs
