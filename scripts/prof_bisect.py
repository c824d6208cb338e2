"""Bisect the probe-gather slowdown: probe-only chain vs full segment step.

Profiles both in one process (tables built once) and prints the top ops of
each, so the per-gather device time can be compared in the two contexts.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as B


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pyctcdecode_tpu.alphabet import Alphabet
    from pyctcdecode_tpu.engine import _merge_tables, build_table_meta
    from pyctcdecode_tpu.models.device_tables import lm_score_words_jnp
    from pyctcdecode_tpu.models.language_model import LanguageModel
    from pyctcdecode_tpu.models.native import open_ngram_file
    from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC
    from pyctcdecode_tpu.utils.profiling import profile_call

    jax_cache = os.path.join(B.CACHE_DIR, "jax")
    os.makedirs(jax_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", jax_cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    alphabet = Alphabet.build_alphabet(B.LIBRI_LABELS)
    arpa = B._cached_arpa("bench_parity_3gram.arpa", B._make_parity_arpa)
    dev = TPUBeamSearchDecoderCTC(alphabet, LanguageModel(open_ngram_file(arpa)))
    print("tables ready", flush=True)
    order = dev._device_lm[0].order
    tabs = dev._tabs
    meta = build_table_meta(dev._device_lm)

    N, BM = 256, 100
    rng = np.random.RandomState(0)
    n_vocab = 200003
    ctx = jnp.asarray(rng.randint(0, n_vocab, size=(N, BM, order - 1), dtype=np.int32))
    ctx_len = jnp.asarray(rng.randint(0, order, size=(N, BM), dtype=np.int32))
    wid = jnp.asarray(rng.randint(0, n_vocab, size=(N, BM), dtype=np.int32))
    bo = jnp.asarray(rng.rand(N, BM, order - 1).astype(np.float32))

    def one(tabs_arg, ctx, ctx_len, wid, bo):
        _, devs_in = _merge_tables(tabs_arg, meta)
        tab = devs_in[0]

        def per_utt(c, cl, w, b2):
            return lm_score_words_jnp(tab, order, -10.0, c, cl, w, b2)

        return jax.vmap(per_utt)(ctx, ctx_len, wid, bo)

    @jax.jit
    def chain(tabs_arg, ctx, ctx_len, wid, bo):
        acc = jnp.float32(0)
        for i in range(16):
            s, oc, ol, ob = one(tabs_arg, ctx, ctx_len, wid, bo)
            acc = acc + s.sum()
            ctx = oc
            ctx_len = jnp.minimum(ol, order - 1)
            wid = (wid + s.astype(jnp.int32) % 7 + i) % n_vocab
            bo = ob
        return acc

    chain(tabs, ctx, ctx_len, wid, bo)  # compile
    r = profile_call(lambda: [chain(tabs, ctx, ctx_len, wid, bo) for _ in range(4)])
    print("==== probe-only 16-chain x4 calls ====")
    print(r.table(top=12), flush=True)

    # full segment step, one seg_fn call profiled
    init_fn, seg_fn, fin_fn = dev._get_segment_fns(
        16, BM, 16, True, N, use_hotwords=False, emit_paths=1
    )
    state = init_fn(dev._start_ctx(None))
    logp = jnp.asarray(rng.randn(N, 16, len(B.LIBRI_LABELS)).astype(np.float32))
    nf = jnp.full(N, 371, dtype=np.int32)
    params = jnp.asarray(dev._params_vector(-5.0, -10.0))
    args = (state, logp, np.int32(0), nf, params, tabs, None)
    t0 = time.perf_counter()
    out = seg_fn(*args)
    jax.block_until_ready(out)
    print(f"seg_fn warm in {time.perf_counter() - t0:.1f}s", flush=True)
    r2 = profile_call(lambda: seg_fn(*args))
    print("==== full seg_fn (16 frames) ====")
    print(f"busy {r2.busy_ms:.1f} ms")
    print(r2.table(top=12), flush=True)


if __name__ == "__main__":
    main()
