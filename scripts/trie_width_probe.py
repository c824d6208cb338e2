"""Measure per-row gather cost vs trie-plane row width at decode shapes.

Decides the packed-trie row layout: the current plane is [826k, 64] i32
(211 MB) and its per-step [38400]-row gather costs ~12.4 ns/row in the
serving program. Packing child cells (rank+flags in 8 bits instead of a
32-bit entry) would shrink rows to ~12-16 words — but sub-256-byte rows
may leave the gather emitter's vectorized row-copy tier. This probe holds
the ROW COUNT at the real trie's and sweeps width, so the plane footprint
tracks the actual layout candidates.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROWS = 826_000
Q = 38_400


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pyctcdecode_tpu.utils.profiling import profile_call

    rng = np.random.RandomState(0)
    for width in (8, 12, 16, 32, 64, 128):
        mb = ROWS * width * 4 / (1 << 20)
        tab = jnp.asarray(
            rng.randint(0, 1 << 30, size=(ROWS, width), dtype=np.int32)
        )
        idx = jnp.asarray(rng.randint(0, ROWS, size=Q, dtype=np.int32))

        @jax.jit
        def chain(tab, idx):
            acc = jnp.int32(0)
            for i in range(16):
                rows = tab[idx]
                s = rows.sum(dtype=jnp.int32)
                acc = acc + s
                idx = (idx + s % 5 + i) % ROWS
            return acc

        chain(tab, idx).block_until_ready()
        r = profile_call(lambda: chain(tab, idx))
        per = r.busy_ms / 16
        print(
            f"width {width:3d} ({mb:6.1f} MB): {per*1e3:8.1f} us/gather"
            f" ({per*1e6/Q:6.2f} ns/row)",
            flush=True,
        )
        del tab


if __name__ == "__main__":
    main()
