"""Do independent gathers overlap on this TPU? (xplane-measured)

Motivates (or kills) breaking the trie->probe gather dependency in the
decode step: if two independent row-gathers co-schedule, removing the
serial dependency saves ~0.25 ms/step; if the copy unit serializes them,
the restructure buys nothing.

Three jitted programs at decode shapes (38400 rows):
  A: one gather
  B: two INDEPENDENT gathers (separate tables, separate indices)
  C: two DEPENDENT gathers (second index derived from first's rows)
Compare busy times: overlap => B ~ A; serial => B ~ 2A ~ C.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pyctcdecode_tpu.utils.profiling import profile_call

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".cache", "jax",
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    size = 1 << 18  # 256k rows x 64 words = 64 MB per table (probe-class)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    tab1 = jax.jit(lambda k: jax.random.randint(k, (size, 64), 0, 1 << 20,
                                                dtype=jnp.int32))(k1)
    tab2 = jax.jit(lambda k: jax.random.randint(k, (size, 64), 0, 1 << 20,
                                                dtype=jnp.int32))(k2)
    q = 38400
    idx1 = jax.jit(lambda k: jax.random.randint(k, (q,), 0, size,
                                                dtype=jnp.int32))(k3)
    idx2 = jax.jit(lambda k: jax.random.randint(k, (q,), 0, size,
                                                dtype=jnp.int32))(k4)
    for x in (tab1, tab2, idx1, idx2):
        x.block_until_ready()
    print("tables ready", flush=True)
    reps = 8  # unrolled pairs per call, like a segment program

    @jax.jit
    def one(idx1, idx2):
        acc = jnp.int32(0)
        for i in range(reps):
            acc = acc + tab1[(idx1 + i) % size].sum(dtype=jnp.int32)
        return acc

    @jax.jit
    def indep(idx1, idx2):
        acc = jnp.int32(0)
        for i in range(reps):
            a = tab1[(idx1 + i) % size].sum(dtype=jnp.int32)
            b = tab2[(idx2 + i) % size].sum(dtype=jnp.int32)
            acc = acc + a + b
        return acc

    @jax.jit
    def dep(idx1, idx2):
        acc = jnp.int32(0)
        for i in range(reps):
            rows = tab1[(idx1 + i) % size]
            a = rows.sum(dtype=jnp.int32)
            second = (rows[:, 0] + a) % size
            acc = acc + tab2[second].sum(dtype=jnp.int32)
        return acc

    for name, fn in (("one", one), ("indep", indep), ("dep", dep)):
        fn(idx1, idx2).block_until_ready()
        r = profile_call(lambda: fn(idx1, idx2))
        print(f"{name:6s}: busy {r.busy_ms:7.2f} ms "
              f"({r.busy_ms / reps * 1e3:7.1f} us per unrolled step)",
              flush=True)

    # per-row gather rate vs table ROW COUNT at fixed row width (is the
    # in-program trie-vs-probe gap a plane-size effect?)
    for log2_rows in (17, 18, 19, 20):
        rows_n = 1 << log2_rows
        tab = jax.jit(
            lambda k: jax.random.randint(k, (rows_n, 64), 0, 1 << 20,
                                         dtype=jnp.int32)
        )(jax.random.PRNGKey(10 + log2_rows))
        idx = jax.jit(
            lambda k: jax.random.randint(k, (q,), 0, rows_n, dtype=jnp.int32)
        )(jax.random.PRNGKey(40 + log2_rows))
        tab.block_until_ready(); idx.block_until_ready()

        def fsz(tab, idx, rows_n=rows_n):
            acc = jnp.int32(0)
            for i in range(reps):
                acc = acc + tab[(idx + i) % rows_n].sum(dtype=jnp.int32)
            return acc

        jf = jax.jit(fsz)
        jf(tab, idx).block_until_ready()
        r = profile_call(lambda: jf(tab, idx))
        per_row = r.busy_ms / reps * 1e6 / q
        print(f"rows 2^{log2_rows} ({rows_n * 256 >> 20:4d} MB): "
              f"{per_row:5.2f} ns/row", flush=True)


if __name__ == "__main__":
    main()
