"""Does gather speed depend on the INDEX DISTRIBUTION at 512-B rows?

Round-5 serving profiles show two same-shape, same-layout [38400, 128]
row-gathers running 7x apart: the fp probe planes (hash-uniform indices)
at ~1.7 ns/row vs the packed trie plane (skewed, heavily duplicated
indices — beams cluster near the root) at ~13 ns/row. This probe times
one gather shape against index distributions, from the xplane profile.

    python scripts/gather_index_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pyctcdecode_tpu.utils.profiling import profile_call

    rng = np.random.RandomState(0)
    rows_tab, width, q = 103216, 128, 38400
    tab = jnp.asarray(
        rng.randint(0, 1 << 30, size=(rows_tab, width), dtype=np.int32)
    )

    def dist(name):
        if name == "uniform":
            return rng.randint(0, rows_tab, size=q, dtype=np.int32)
        if name == "skew_small":  # zipf-ish mass near row 0, like trie roots
            z = np.minimum(rng.zipf(1.3, size=q), rows_tab) - 1
            return z.astype(np.int32)
        if name == "dup64":  # only 64 distinct rows
            return rng.randint(0, 64, size=q, dtype=np.int32)
        if name == "dup600_low":  # 600 distinct small rows
            return rng.randint(0, 600, size=q, dtype=np.int32)
        if name == "sorted_uniform":
            return np.sort(rng.randint(0, rows_tab, size=q, dtype=np.int32))
        raise ValueError(name)

    for name in ("uniform", "sorted_uniform", "skew_small", "dup600_low", "dup64"):
        idx = jnp.asarray(dist(name))

        @jax.jit
        def chain(tab, idx):
            acc = jnp.int32(0)
            for i in range(16):
                rows = tab[idx]
                s = rows.sum(dtype=jnp.int32)
                acc = acc + s
                idx = (idx + (s % 3) * 0 + 0) % rows_tab  # keep chain, same dist
            return acc

        chain(tab, idx)
        r = profile_call(lambda: chain(tab, idx))
        per = r.busy_ms / 16
        print(
            f"{name:15s}: {per*1e3:8.1f} us/gather ({per*1e6/q:6.2f} ns/row)",
            flush=True,
        )


if __name__ == "__main__":
    main()
