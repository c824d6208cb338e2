"""A/B the per-frame merge implementations on device (xplane-timed).

Compares the lowered XLA block-diagonal merge (`engine._merge_dense` +
window prune) against the fused Pallas kernel
(`ops.pallas_merge.merge_score_pallas`) at decode shapes, batched via
``jax.vmap`` exactly as the engine runs them. Each variant runs ``--frames``
back-to-back applications (mimicking the per-frame cadence of a decode) so
per-dispatch overhead is amortized the same way.

    python scripts/bench_merge_kernel.py --batch 384 --beam 100 --k 16
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--beam", type=int, default=100)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--cpu", action="store_true", help="force CPU (interpret)")
    ap.add_argument(
        "--blocks", default="8",
        help="comma-separated PYCTCDECODE_TPU_MERGE_BLOCK values to sweep",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pyctcdecode_tpu.engine import DEAD, _merge_dense
    from pyctcdecode_tpu.ops.pallas_merge import merge_score_pallas
    from pyctcdecode_tpu.utils.profiling import profile_call

    n, k, b = args.batch, args.k, args.beam
    c = k * b
    rng = np.random.RandomState(0)
    # realistic collision density: keys drawn from a small pool per column
    kl = rng.randint(0, 7, size=(n, k, b)).astype(np.uint32)
    kh = kl * np.uint32(2654435761)
    valid = rng.rand(n, k, b) < 0.8
    logit = (rng.randn(n, k, b) * 3.0).astype(np.float32)
    extra = (rng.randn(n, k, b) * 2.0).astype(np.float32)
    prune = jnp.float32(-10.0)
    interp = jax.default_backend() != "tpu"

    def xla_path(kl, kh, valid, logit, extra):
        merged, dup, donor = _merge_dense(jnp, [kl, kh], valid, logit)
        src = jnp.arange(k, dtype=jnp.int32)[:, None] * b + donor
        rep = valid & ~dup
        merged_flat = jnp.where(rep.reshape(c), merged.reshape(c), DEAD)
        live = merged_flat > DEAD / 2
        score = jnp.where(live, merged_flat + extra.reshape(c), DEAD)
        mx = jnp.max(score)
        score = jnp.where(score >= mx + prune, score, DEAD)
        return score, merged.reshape(c), src.reshape(c)

    def pallas_path(kl, kh, valid, logit, extra):
        sc, merged, src = merge_score_pallas(
            kl, kh, valid, logit, extra, prune, interpret=interp
        )
        return sc.reshape(c), merged.reshape(c), src.reshape(c)

    def chained(fn):
        def run(kl, kh, valid, logit, extra):
            outs = []
            for i in range(args.frames):
                # rotate the logit so frames aren't identical (defeats CSE)
                s, m, sr = fn(kl, kh, valid, jnp.roll(logit, i, axis=-1), extra)
                outs.append(s)
            return jnp.stack(outs).sum()

        return jax.jit(jax.vmap(run, in_axes=(0, 0, 0, 0, 0)))

    on_tpu = jax.default_backend() == "tpu"
    variants = [("xla", xla_path)]
    for blk in str(args.blocks).split(","):
        variants.append((f"pallas/b{blk.strip()}", pallas_path, blk.strip()))
    for name, fn, *blk in variants:
        if blk:
            os.environ["PYCTCDECODE_TPU_MERGE_BLOCK"] = blk[0]
        run = chained(fn)
        out = run(kl, kh, valid, logit, extra)
        out.block_until_ready()
        if on_tpu:
            rep = profile_call(lambda: run(kl, kh, valid, logit, extra))
            per_frame = rep.busy_ms / args.frames
            print(
                f"{name:7s} busy {rep.busy_ms:8.2f} ms total, "
                f"{per_frame:7.3f} ms/frame (batch {n}, K {k}, B {b})"
            )
            for op in rep.ops[:6]:
                print(
                    f"    {op.total_ms:8.2f} ms {100 * op.share:5.1f}%  "
                    f"{op.name[:70]}"
                )
        else:  # CPU: correctness pass only (no device plane to parse)
            print(f"{name:7s} ran (CPU; timing skipped)")

    # cross-check outputs match (first batch item)
    sx = jax.jit(jax.vmap(xla_path))(kl[:2], kh[:2], valid[:2], logit[:2], extra[:2])
    sp = jax.jit(jax.vmap(pallas_path))(kl[:2], kh[:2], valid[:2], logit[:2], extra[:2])
    for a, bb, label in zip(sx, sp, ("score", "merged", "src")):
        ok = np.allclose(np.asarray(a), np.asarray(bb), rtol=1e-6, atol=1e-5)
        print(f"match[{label}] = {bool(ok)}")


if __name__ == "__main__":
    main()
