"""Profiler-based TPU gather cost model: device time vs rows and row width.

Wall-clock timing through the axon relay is unreliable (async dispatch);
every number here comes from the xplane profile of a 16-chained gather
program, so per-op device time is exact.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TABLE_MB = 512


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pyctcdecode_tpu.utils.profiling import profile_call

    rng = np.random.RandomState(0)
    results = {}
    import ast as _ast, os as _os
    widths = _ast.literal_eval(_os.environ.get("GCM_WIDTHS", "(1, 2, 4, 8, 16, 32, 64)"))
    for width in widths:
        rows_tab = (TABLE_MB << 20) // (4 * width)
        tab = jnp.asarray(
            rng.randint(0, 1 << 30, size=(rows_tab, width), dtype=np.int32)
        )
        for q in _ast.literal_eval(_os.environ.get("GCM_QS", "(25600, 102400)")):
            idx = jnp.asarray(rng.randint(0, rows_tab, size=q, dtype=np.int32))

            @jax.jit
            def chain(tab, idx):
                acc = jnp.int32(0)
                for i in range(16):
                    rows = tab[idx]
                    s = rows.sum(dtype=jnp.int32)
                    acc = acc + s
                    idx = (idx + s % 5 + i) % rows_tab
                return acc

            chain(tab, idx)  # compile
            r = profile_call(lambda: chain(tab, idx))
            per = r.busy_ms / 16
            results[(width, q)] = per
            print(
                f"width {width:3d} q {q:6d}: busy {r.busy_ms:8.2f} ms"
                f"  -> {per*1e3:8.1f} us/gather "
                f"({per*1e6/q:6.1f} ns/row, {per*1e6/(q*width):6.2f} ns/elt)",
                flush=True,
            )
        del tab


if __name__ == "__main__":
    main()
