"""Pallas TPU kernel: fused block-diagonal merge + window prune.

The engine's per-frame candidate merge (`engine._merge_dense`) is four
[K, B, B] masked reductions — duplicate detection, group max, group
logsumexp, newest-member donor — that XLA schedules as separate passes,
re-materializing the [K, B, B] collision mask between them. This kernel
computes the collision mask once in VMEM and produces all merge outputs in
a single sweep:

    eq     = key-collision matrix per token block        (VPU compare)
    merged = masked logsumexp over each collision group  (VPU reduce)
    dup    = non-first group member flags                (same pass)
    donor  = newest group member (backtrace metadata)    (same pass)
    score  = merged + extra for group-first members,
             window-pruned against the global max        (VPU)

Ranking (``lax.top_k``) and state selection (one-hot MXU matmuls) stay in
XLA, which beats hand-written equivalents at those shapes — the previous
whole-pipeline kernel (fused iterative top-k) measured 3x slower than the
lowered path precisely because of its sequential beam-width selection
loop; this split keeps each side on its fastest implementation.

Semantics are identical to `engine._merge_dense` + the window prune of
`engine._rank` (verified in ``tests/test_pallas_merge.py`` end to end
against the host oracle). Tie-breaks resolve to the lowest flat candidate
index downstream, matching the reference's enumeration-order stability.

The kernel processes one utterance per call; under ``jax.vmap`` the batch
dimension is lifted onto the grid. Select it with
``EngineConfig(use_pallas_merge=True)``.
"""
from __future__ import annotations

from typing import Tuple

DEAD = -1.0e30


def _kernel(kl_ref, kh_ref, valid_ref, logit_ref, extra_ref, prune_ref,
            score_ref, merged_ref, src_ref):
    import jax
    import jax.numpy as jnp

    kl = kl_ref[:]  # [K, B] uint32
    kh = kh_ref[:]
    valid_i = valid_ref[:]  # [K, B] int32 (Mosaic: broadcast bools 32-bit)
    valid = valid_i != 0
    logit = logit_ref[:]
    extra = extra_ref[:]
    prune = prune_ref[0, 0]

    k, b = kl.shape
    # block-diagonal collision matrix [K, B, B]; pairwise terms broadcast in
    # 32-bit space (minor-dim insertion of 1-bit types is unsupported)
    eq = (valid_i[:, :, None] * valid_i[:, None, :]) != 0
    eq &= kl[:, :, None] == kl[:, None, :]
    eq &= kh[:, :, None] == kh[:, None, :]
    earlier = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1) < (
        jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    )
    dup = jnp.any(eq & earlier[None], axis=-1)

    lj = logit[:, None, :]
    m = jnp.max(jnp.where(eq, lj, -jnp.inf), axis=-1)
    tot = jnp.sum(jnp.where(eq, jnp.exp(lj - m[:, :, None]), 0.0), axis=-1)
    merged = m + jnp.log(tot)
    donor = jnp.max(
        jnp.where(eq, jax.lax.broadcasted_iota(jnp.int32, (k, b, b), 2), -1),
        axis=-1,
    )
    donor = jnp.maximum(donor, 0)

    # group-first members carry the group score; everyone carries the
    # group logsumexp (engine selects it positionally at the top-k index)
    rep = valid & ~dup
    score = jnp.where(rep, merged + extra, DEAD)
    mx = jnp.max(score)
    score = jnp.where(score >= mx + prune, score, DEAD)

    score_ref[:] = score
    merged_ref[:] = merged
    src_ref[:] = jax.lax.broadcasted_iota(jnp.int32, (k, b), 0) * b + donor


def merge_score_pallas(
    kl: "object",
    kh: "object",
    valid: "object",
    logit: "object",
    extra: "object",
    beam_prune_logp: "object",
    interpret: bool = False,
) -> Tuple:
    """Fused merge + window prune for one utterance.

    ``kl``/``kh`` uint32 ``[K, B]`` (pre-mixed beam keys), ``valid``/
    ``logit``/``extra`` ``[K, B]``. Returns ``(score, merged, src)``, all
    ``[K, B]``: the window-pruned candidate score (DEAD for duplicate or
    pruned members), the merge-group logsumexp at every member, and the
    token-major flat index of the group's newest member.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    k, b = kl.shape
    # the kernel materializes a few [K, B, B] f32/i32 intermediates in
    # VMEM; guard with a clear error instead of a Mosaic compile failure.
    if 3 * k * b * b * 4 > 12 * 1024 * 1024:
        raise ValueError(
            f"use_pallas_merge: K*B*B too large for VMEM "
            f"(K={k}, B={b}; need 3*K*B*B*4 <= 12MiB). Reduce beam_width or "
            f"max_tokens_per_frame, or use the default XLA merge path."
        )

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
    except ImportError:  # interpret-only environments
        vmem = None

    def spec():
        return pl.BlockSpec(memory_space=vmem) if vmem is not None else pl.BlockSpec()

    prune = jnp.reshape(beam_prune_logp.astype(jnp.float32), (1, 1))
    out_shape = (
        jax.ShapeDtypeStruct((k, b), jnp.float32),
        jax.ShapeDtypeStruct((k, b), jnp.float32),
        jax.ShapeDtypeStruct((k, b), jnp.int32),
    )
    return pl.pallas_call(
        _kernel,
        out_shape=out_shape,
        in_specs=[spec() for _ in range(6)],
        out_specs=tuple(spec() for _ in range(3)),
        interpret=interpret,
    )(kl, kh, valid.astype(jnp.int32), logit, extra, prune)
