"""Why does the packed-trie row gather run ~7x slower in-program?

The serving profile shows the [38400, 128] trie-plane gather at ~11
ns/row while the SAME shape from the same-size plane measures 1.5 ns/row
isolated — and the fp probe gathers in the same program DO run at
isolated speed. This reproduces the engine's consumption pattern a piece
at a time inside a vmapped scan: (a) gather only, (b) + masked-sum slot
extraction, (c) + extraction feeding the carried state (the engine's
``p_node`` chain), (d) + a second consumer layout.

    python scripts/trie_gather_bisect.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROWS, WIDTH, PACK, STRIDE, W = 103216, 128, 8, 16, 13
B, BEAMS, STEPS = 384, 100, 16


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pyctcdecode_tpu.utils.profiling import profile_call

    rng = np.random.RandomState(0)
    tab = jnp.asarray(rng.randint(0, 1 << 20, size=(ROWS, WIDTH), dtype=np.int32))
    nodes0 = jnp.asarray(
        rng.randint(0, ROWS * PACK, size=(B, BEAMS), dtype=np.int32)
    )

    def extract(jnp, packed, sub):
        out = None
        for s_i in range(PACK):
            blk = jnp.where(
                (sub == s_i)[..., None], packed[..., s_i * STRIDE : s_i * STRIDE + W], 0
            )
            out = blk if out is None else out + blk
        return out

    def make(case):
        def step_one(nodes, _):
            packed = tab[nodes // PACK]  # [BEAMS, 128] per vmap row
            if case == "gather_only":
                nxt = (nodes + packed[..., 0]) % (ROWS * PACK)
                return nxt, None
            row = extract(jnp, packed, nodes % PACK)
            if case == "extract":
                nxt = (nodes + row[..., 0]) % (ROWS * PACK)
                return nxt, None
            if case == "extract_2use":
                a = row[..., 0]
                b2 = jnp.sum(row[..., 1:8], axis=-1)
                nxt = (nodes + a + b2) % (ROWS * PACK)
                return nxt, None
            raise ValueError(case)

        def scan_fn(nodes):
            def body(c, x):
                return step_one(c, x)
            out, _ = jax.lax.scan(body, nodes, None, length=STEPS)
            return out

        return jax.jit(jax.vmap(scan_fn))

    for case in ("gather_only", "extract", "extract_2use"):
        fn = make(case)
        fn(nodes0).block_until_ready()
        r = profile_call(lambda: fn(nodes0).block_until_ready())
        per = r.busy_ms / STEPS
        print(
            f"{case:12s}: busy {r.busy_ms:7.2f} ms -> {per*1e3:7.1f} us/step "
            f"({per*1e6/(B*BEAMS):5.2f} ns/row)",
            flush=True,
        )


if __name__ == "__main__":
    main()
