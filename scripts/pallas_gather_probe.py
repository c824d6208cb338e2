"""Can a Pallas DMA-pipelined gather beat XLA's row-gather emitter?

The serving profile's wall is ~836 ms of [38400]-row gathers per batch
(trie + 2 LM probes per step) at ~8 ns/row — latency/issue-bound, ~30x
above HBM bandwidth for 256 B rows. XLA's gather emitter is a black box;
this probe implements the alternative: scalar-prefetched indices driving
single-row HBM->VMEM async copies with NBUF outstanding, measured via
xplane against the XLA gather on identical shapes.

    python scripts/pallas_gather_probe.py
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

R, W, Q = 524_288, 64, 38_400
INTERPRET = bool(__import__("os").environ.get("PG_INTERPRET"))
BQ = 128  # queries per grid instance
NBUF = 16  # outstanding row DMAs


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pyctcdecode_tpu.utils.profiling import profile_call

    def gather_kernel(idx_ref, tab_ref, out_ref, scratch, sems):
        base = pl.program_id(0) * BQ

        def copy(j, slot):
            return pltpu.make_async_copy(
                tab_ref.at[pl.ds(idx_ref[base + j], 1), :],
                scratch.at[pl.ds(j, 1), :],
                sems.at[slot],
            )

        for j in range(NBUF):
            copy(j, j).start()
        for j in range(BQ):
            copy(j, j % NBUF).wait()
            nxt = j + NBUF
            if nxt < BQ:
                copy(nxt, nxt % NBUF).start()
        out_ref[:] = scratch[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q // BQ,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (BQ, W), lambda i, idx: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((BQ, W), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    pallas_gather = pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((Q, W), jnp.int32),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )

    rng = np.random.RandomState(0)
    tab = jnp.asarray(rng.randint(0, 1 << 30, size=(R, W), dtype=np.int32))
    idx = jnp.asarray(rng.randint(0, R, size=Q, dtype=np.int32))

    @jax.jit
    def xla_chain(tab, idx):
        acc = jnp.int32(0)
        for i in range(4):
            rows = tab[idx]
            s = rows.sum(dtype=jnp.int32)
            acc = acc + s
            idx = (idx + s % 5 + i) % R
        return acc

    @jax.jit
    def pallas_chain(tab, idx):
        acc = jnp.int32(0)
        for i in range(4):
            rows = pallas_gather(idx, tab)
            s = rows.sum(dtype=jnp.int32)
            acc = acc + s
            idx = (idx + s % 5 + i) % R
        return acc

    a = xla_chain(tab, idx)
    b = pallas_chain(tab, idx)
    print("results equal:", bool((a == b).all()) if hasattr(a, "all") else a == b)
    for name, fn in (("xla", xla_chain), ("pallas", pallas_chain)):
        r = profile_call(lambda: fn(tab, idx))
        per = r.busy_ms / 4
        print(
            f"{name:7s}: busy {r.busy_ms:8.2f} ms -> {per*1e3:8.1f} us/gather"
            f" ({per*1e6/Q:6.2f} ns/row)",
            flush=True,
        )


if __name__ == "__main__":
    main()
