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

The kernel's vmap rule blocks the utterance batch onto the grid
``PYCTCDECODE_TPU_MERGE_BLOCK`` (default 8) utterances per grid step —
per-utterance work is a few microseconds, so several utterances per step
amortize grid/DMA turnaround. Select the kernel with
``EngineConfig(use_pallas_merge=True)``.
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

DEAD = -1.0e30


def _merge_block() -> int:
    """Utterances per grid step for the batched kernel (env-tunable)."""
    return max(int(os.environ.get("PYCTCDECODE_TPU_MERGE_BLOCK", "8")), 1)


def _merge_math(jax, jnp, kl, kh, valid_i, logit, extra, prune):
    """One utterance's merge + window prune on [K, B] values (VMEM-resident).

    ``valid_i`` is int32 (Mosaic: pairwise bool logic broadcasts in 32-bit
    space; minor-dim insertion of 1-bit types is unsupported).
    """
    k, b = kl.shape
    valid = valid_i != 0
    # block-diagonal collision matrix [K, B, B]
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
    src = jax.lax.broadcasted_iota(jnp.int32, (k, b), 0) * b + donor
    return score, merged, src


def _kernel(kl_ref, kh_ref, valid_ref, logit_ref, extra_ref, prune_ref,
            score_ref, merged_ref, src_ref):
    import jax
    import jax.numpy as jnp

    score, merged, src = _merge_math(
        jax, jnp, kl_ref[:], kh_ref[:], valid_ref[:], logit_ref[:],
        extra_ref[:], prune_ref[0, 0],
    )
    score_ref[:] = score
    merged_ref[:] = merged
    src_ref[:] = src


def _kernel_batched(kl_ref, kh_ref, valid_ref, logit_ref, extra_ref,
                    prune_ref, score_ref, merged_ref, src_ref):
    """Several utterances per grid step: [NB, K, B] blocks, looped in-core."""
    import jax
    import jax.numpy as jnp

    def body(n, carry):
        score, merged, src = _merge_math(
            jax, jnp, kl_ref[n], kh_ref[n], valid_ref[n], logit_ref[n],
            extra_ref[n], prune_ref[n, 0, 0],
        )
        score_ref[n] = score
        merged_ref[n] = merged
        src_ref[n] = src
        return carry

    jax.lax.fori_loop(0, kl_ref.shape[0], body, 0)


@functools.lru_cache(maxsize=None)
def _build_runner(k: int, b: int, interpret: bool):
    """(Cached) custom-vmap wrapper: single-program base, batched-grid rule."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
    except ImportError:  # interpret-only environments
        vmem = None

    def spec():
        return pl.BlockSpec(memory_space=vmem) if vmem is not None else pl.BlockSpec()

    @jax.custom_batching.custom_vmap
    def run(kl, kh, valid_i, logit, extra, prune):
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
        )(kl, kh, valid_i, logit, extra, prune)

    @run.def_vmap
    def _rule(axis_size, in_batched, kl, kh, valid_i, logit, extra, prune):
        """Batch rule: grid over blocks of ``_merge_block()`` utterances.

        Planes may arrive unbatched mid-way through scan's batching
        fixpoint (a carry component not yet marked batched) — broadcast
        those along the batch axis rather than reject.
        """
        args = []
        for x, batched in zip((kl, kh, valid_i, logit, extra, prune), in_batched):
            if not batched:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            args.append(x)
        kl, kh, valid_i, logit, extra, prune = args
        nb = min(_merge_block(), axis_size)
        n_pad = -(-axis_size // nb) * nb
        pad = n_pad - axis_size

        def padded(x):
            if not pad:
                return x
            return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

        plane = lambda: pl.BlockSpec((nb, k, b), lambda i: (i, 0, 0))  # noqa: E731
        out_shape = (
            jax.ShapeDtypeStruct((n_pad, k, b), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k, b), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k, b), jnp.int32),
        )
        score, merged, src = pl.pallas_call(
            _kernel_batched,
            grid=(n_pad // nb,),
            out_shape=out_shape,
            in_specs=[plane() for _ in range(5)]
            + [pl.BlockSpec((nb, 1, 1), lambda i: (i, 0, 0))],
            out_specs=tuple(plane() for _ in range(3)),
            interpret=interpret,
        )(*(padded(a) for a in (kl, kh, valid_i, logit, extra, prune)))
        if pad:
            score, merged, src = score[:axis_size], merged[:axis_size], src[:axis_size]
        return (score, merged, src), (True, True, True)

    return run


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
    token-major flat index of the group's newest member. Under ``jax.vmap``
    the batch dimension rides the kernel grid, several utterances per step.
    """
    import jax.numpy as jnp

    k, b = kl.shape
    # the kernel materializes a few [K, B, B] f32/i32 intermediates in
    # VMEM; guard with a clear error instead of a Mosaic compile failure.
    if 3 * k * b * b * 4 > 12 * 1024 * 1024:
        raise ValueError(
            f"use_pallas_merge: K*B*B too large for VMEM "
            f"(K={k}, B={b}; need 3*K*B*B*4 <= 12MiB). Reduce beam_width or "
            f"max_tokens_per_frame, or use the default XLA merge path."
        )
    prune = jnp.reshape(beam_prune_logp.astype(jnp.float32), (1, 1))
    run = _build_runner(k, b, interpret)
    return run(kl, kh, valid.astype(jnp.int32), logit, extra, prune)
