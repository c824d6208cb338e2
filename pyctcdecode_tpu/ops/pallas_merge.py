"""ARCHIVED EXPERIMENT — Pallas fused block-diagonal merge + window prune.

Retired from the decode surface in round 4: at the serving shape
(batch 384, K 6, B 100, vmapped/grid-blocked) the kernel measured
**2.02 ms/frame vs 0.065 ms for XLA's lowered reductions — 31x slower**
(scripts/bench_merge_kernel.py sweep over grid blocks 4/8/16; an earlier
whole-step variant was 3x slower). Grid/DMA turnaround dominates at
sub-100-us per-step work, and XLA's select+reduce fusions already run the
B-minor layout at full lane width. The kernel and its parity tests are
kept as the record of the experiment; nothing in the engine calls it.

Original design notes follow.

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
amortize grid/DMA turnaround.
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

DEAD = -1.0e30
DEAD_THRESH = -1.0e29  # matches engine.DEAD_THRESH


def _merge_block() -> int:
    """Utterances per grid step for the batched kernel (env-tunable)."""
    return max(int(os.environ.get("PYCTCDECODE_TPU_MERGE_BLOCK", "8")), 1)


def _k_chunk(k: int, b: int) -> int:
    """Token columns per merge sweep: bounds the [kc, B, B] temporaries.

    Columns are independent (the collision matrix is block-diagonal per
    token), so the merge can sweep K in chunks; ~3 [kc, B, B] f32/i32
    temporaries are live at once, and VMEM is ~16 MiB, so kc is capped so a
    temporary stays under ~2 MiB (env ``PYCTCDECODE_TPU_MERGE_KCHUNK``
    overrides). Returns a divisor of ``k`` so every sweep is full-width
    (chunk starts are loop-carried and traced; slices are dynamic on the
    majormost dim).
    """
    env = int(os.environ.get("PYCTCDECODE_TPU_MERGE_KCHUNK", "0"))
    cap = env if env > 0 else max(1, (2 << 20) // (b * b * 4))
    if cap >= k:
        return k
    kc = cap
    while k % kc:
        kc -= 1
    return kc


def _merge_core(jax, jnp, kl, kh, valid_i, logit, extra):
    """Merge one token-column chunk: raw score / logsumexp / donor [kc, B].

    ``valid_i`` is int32 (Mosaic: pairwise bool logic broadcasts in 32-bit
    space; minor-dim insertion of 1-bit types is unsupported).
    """
    k, b = kl.shape
    valid = valid_i != 0
    # block-diagonal collision matrix [kc, B, B]
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
    return score, merged, donor


def _merge_math(jax, jnp, kl, kh, valid_i, logit, extra, prune):
    """One utterance's merge + window prune on [K, B] values (VMEM-resident).

    Sweeps token columns in :func:`_k_chunk`-sized chunks so the [kc, B, B]
    collision temporaries stay within VMEM at large K*B^2; the score window
    prune is global over [K, B] and is applied after the sweep.
    """
    k, b = kl.shape
    kc = _k_chunk(k, b)
    if kc == k:
        score, merged, donor = _merge_core(jax, jnp, kl, kh, valid_i, logit, extra)
    else:
        dsl = jax.lax.dynamic_slice_in_dim
        dus = jax.lax.dynamic_update_slice_in_dim

        def body(i, carry):
            score_a, merged_a, donor_a = carry
            c0 = i * kc
            s, m, d = _merge_core(
                jax, jnp,
                dsl(kl, c0, kc, 0), dsl(kh, c0, kc, 0),
                dsl(valid_i, c0, kc, 0), dsl(logit, c0, kc, 0),
                dsl(extra, c0, kc, 0),
            )
            return (
                dus(score_a, s, c0, 0),
                dus(merged_a, m, c0, 0),
                dus(donor_a, d, c0, 0),
            )

        init = (
            jnp.full((k, b), DEAD, jnp.float32),
            jnp.full((k, b), DEAD, jnp.float32),
            jnp.zeros((k, b), jnp.int32),
        )
        score, merged, donor = jax.lax.fori_loop(0, k // kc, body, init)
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


# --------------------------------------------------------------------------
# expansion-folded variant: candidate planes never touch HBM
# --------------------------------------------------------------------------
# flat argument order for the expand kernels (after the per-char cid planes
# are appended): see _expand_math's parameter list.
_X_BEAM = ("text_lo", "text_hi", "cm_text_lo", "cm_text_hi", "p_lo", "p_hi",
           "force", "fused", "wfused", "logit", "last_tok")  # [1, B] planes
_X_TOK = ("tok", "blank", "boundary", "right", "seed_lo", "seed_hi",
          "tok_logp", "admit")  # [K, 1] planes


def _expand_math(jax, jnp, is_bpe, k, b, beam, tok, cids, pscore, prune):
    """Candidate expansion + merge on broadcast [K, B] values.

    ``beam``: dict of [1, B] parent planes (u32 hashes, i32 flags/ids, f32
    scores); ``tok``: dict of [K, 1] token planes; ``cids``: per-label-char
    [K, 1] i32 char ids (-1 past the label end); ``pscore``: [K, B]
    partial-word score (zeros when no LM/hotwords). Reproduces the
    engine's 4-way transition exactly — bools are derived AFTER
    broadcasting the int planes to [K, B] (Mosaic cannot broadcast 1-bit
    types along the minor dim).
    """
    from .hashing import hash_extend_char, mix4

    def bb(x):
        return jnp.broadcast_to(x, (k, b))

    last = bb(beam["last_tok"])
    stay = (bb(tok["blank"]) != 0) | (last == bb(tok["tok"]))
    force_p = bb(beam["force"])  # parent's BPE break flag, i32
    if is_bpe:
        bnd = ~stay & ((bb(tok["boundary"]) != 0) | (force_p != 0))
    else:
        bnd = ~stay & (bb(tok["boundary"]) != 0)

    ext_lo, ext_hi = bb(beam["p_lo"]), bb(beam["p_hi"])
    for cid_plane in cids:
        cid = bb(cid_plane)
        has = cid >= 0
        nlo, nhi = hash_extend_char(
            jnp, ext_lo, ext_hi, jnp.maximum(cid, 0).astype(jnp.uint32)
        )
        ext_lo = jnp.where(has, nlo, ext_lo)
        ext_hi = jnp.where(has, nhi, ext_hi)
    p_lo_n = jnp.where(
        stay, bb(beam["p_lo"]), jnp.where(bnd, bb(tok["seed_lo"]), ext_lo)
    )
    p_hi_n = jnp.where(
        stay, bb(beam["p_hi"]), jnp.where(bnd, bb(tok["seed_hi"]), ext_hi)
    )
    text_lo_n = jnp.where(bnd, bb(beam["cm_text_lo"]), bb(beam["text_lo"]))
    text_hi_n = jnp.where(bnd, bb(beam["cm_text_hi"]), bb(beam["text_hi"]))
    force_n = jnp.where(bnd, bb(tok["right"]), force_p).astype(jnp.uint32)
    logit_p = bb(beam["logit"])
    alive = logit_p > DEAD_THRESH
    logit_n = jnp.where(alive, logit_p + bb(tok["tok_logp"]), DEAD)
    valid_i = (alive & (bb(tok["admit"]) != 0)).astype(jnp.int32)
    kl = mix4(jnp, text_lo_n, p_lo_n, p_hi_n, force_n)
    kh = mix4(jnp, text_hi_n, p_hi_n, p_lo_n, force_n)
    extra = bb(beam["fused"]) + jnp.where(bnd, bb(beam["wfused"]), 0.0) + pscore
    return _merge_math(jax, jnp, kl, kh, valid_i, logit_n, extra, prune)


@functools.lru_cache(maxsize=None)
def _build_expand_runner(k: int, b: int, lmax: int, is_bpe: bool, interpret: bool):
    """(Cached) custom-vmap wrapper for the expansion-folded kernel."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    n_beam, n_tok = len(_X_BEAM), len(_X_TOK)
    n_args = n_beam + n_tok + lmax + 2  # + pscore + prune

    def _unpack(refs):
        beam = {name: refs[i][:] for i, name in enumerate(_X_BEAM)}
        tok = {name: refs[n_beam + i][:] for i, name in enumerate(_X_TOK)}
        cids = [refs[n_beam + n_tok + l][:] for l in range(lmax)]
        pscore = refs[n_beam + n_tok + lmax][:]
        return beam, tok, cids, pscore

    def _kernel_x(*refs):
        ins, outs = refs[:n_args], refs[n_args:]
        beam, tok, cids, pscore = _unpack(ins)
        score, merged, src = _expand_math(
            jax, jnp, is_bpe, k, b, beam, tok, cids, pscore, ins[-1][0, 0]
        )
        outs[0][:] = score
        outs[1][:] = merged
        outs[2][:] = src

    def _kernel_x_batched(*refs):
        ins, outs = refs[:n_args], refs[n_args:]

        def body(n, carry):
            beam = {name: ins[i][n] for i, name in enumerate(_X_BEAM)}
            tok = {name: ins[n_beam + i][n] for i, name in enumerate(_X_TOK)}
            cids = [ins[n_beam + n_tok + l][n] for l in range(lmax)]
            pscore = ins[n_beam + n_tok + lmax][n]
            score, merged, src = _expand_math(
                jax, jnp, is_bpe, k, b, beam, tok, cids, pscore,
                ins[-1][n, 0, 0],
            )
            outs[0][n] = score
            outs[1][n] = merged
            outs[2][n] = src
            return carry

        jax.lax.fori_loop(0, ins[0].shape[0], body, 0)

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
    except ImportError:
        vmem = None

    def spec():
        return pl.BlockSpec(memory_space=vmem) if vmem is not None else pl.BlockSpec()

    out_shape = (
        jax.ShapeDtypeStruct((k, b), jnp.float32),
        jax.ShapeDtypeStruct((k, b), jnp.float32),
        jax.ShapeDtypeStruct((k, b), jnp.int32),
    )

    @jax.custom_batching.custom_vmap
    def run(*args):
        return pl.pallas_call(
            _kernel_x,
            out_shape=out_shape,
            in_specs=[spec() for _ in range(n_args)],
            out_specs=tuple(spec() for _ in range(3)),
            interpret=interpret,
        )(*args)

    @run.def_vmap
    def _rule(axis_size, in_batched, *args):
        """Batch rule: block utterances onto the grid (see _kernel_batched)."""
        args = [
            a if batched else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for a, batched in zip(args, in_batched)
        ]
        nb = min(_merge_block(), axis_size)
        n_pad = -(-axis_size // nb) * nb
        pad = n_pad - axis_size
        if pad:
            args = [
                jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) for a in args
            ]

        def plane_spec(a):
            return pl.BlockSpec((nb,) + a.shape[1:], lambda i: (i,) + (0,) * (a.ndim - 1))

        out_shape_b = (
            jax.ShapeDtypeStruct((n_pad, k, b), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k, b), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k, b), jnp.int32),
        )
        score, merged, src = pl.pallas_call(
            _kernel_x_batched,
            grid=(n_pad // nb,),
            out_shape=out_shape_b,
            in_specs=[plane_spec(a) for a in args],
            out_specs=tuple(
                pl.BlockSpec((nb, k, b), lambda i: (i, 0, 0)) for _ in range(3)
            ),
            interpret=interpret,
        )(*args)
        if pad:
            score, merged, src = score[:axis_size], merged[:axis_size], src[:axis_size]
        return (score, merged, src), (True, True, True)

    return run


def expand_merge_score_pallas(
    beam: dict,
    tok: dict,
    cids: list,
    pscore: "object",
    beam_prune_logp: "object",
    is_bpe: bool,
    interpret: bool = False,
) -> Tuple:
    """Expansion-folded merge for one utterance.

    ``beam``: [B] parent planes keyed by ``_X_BEAM`` (hashes u32, force/
    last_tok i32, scores f32); ``tok``: [K] token planes keyed by
    ``_X_TOK``; ``cids``: per-char [K] i32 planes (label chars, -1 past
    end); ``pscore``: [K, B] f32 partial-word score. Candidate fields
    (keys, logits, validity) are computed in VMEM and never materialize to
    HBM. Returns ``(score, merged, src)`` as :func:`merge_score_pallas`.
    """
    import jax.numpy as jnp

    k = tok["tok"].shape[0]
    b = beam["logit"].shape[0]
    kc = _k_chunk(k, b)
    if 3 * kc * b * b * 4 > 12 * 1024 * 1024:
        raise ValueError(
            f"merge kernel: temporaries exceed VMEM even chunked "
            f"(K={k}, B={b}, chunk={kc}; need 3*kc*B*B*4 <= 12MiB). Reduce "
            f"beam_width, lower PYCTCDECODE_TPU_MERGE_KCHUNK, or use the "
            f"default XLA merge path."
        )
    flat = [jnp.reshape(beam[name], (1, b)) for name in _X_BEAM]
    flat += [jnp.reshape(tok[name], (k, 1)) for name in _X_TOK]
    flat += [jnp.reshape(c, (k, 1)) for c in cids]
    flat.append(pscore)
    flat.append(jnp.reshape(beam_prune_logp.astype(jnp.float32), (1, 1)))
    run = _build_expand_runner(k, b, len(cids), is_bpe, interpret)
    return run(*flat)


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
    # the kernel materializes a few [kc, B, B] f32/i32 intermediates in
    # VMEM; guard with a clear error instead of a Mosaic compile failure.
    kc = _k_chunk(k, b)
    if 3 * kc * b * b * 4 > 12 * 1024 * 1024:
        raise ValueError(
            f"merge kernel: temporaries exceed VMEM even chunked "
            f"(K={k}, B={b}, chunk={kc}; need 3*kc*B*B*4 <= 12MiB). Reduce "
            f"beam_width, lower PYCTCDECODE_TPU_MERGE_KCHUNK, or use the "
            f"default XLA merge path."
        )
    prune = jnp.reshape(beam_prune_logp.astype(jnp.float32), (1, 1))
    run = _build_runner(k, b, interpret)
    return run(kl, kh, valid.astype(jnp.int32), logit, extra, prune)
