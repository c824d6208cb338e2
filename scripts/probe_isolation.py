"""Isolate the LM-probe cost: standalone vs in-segment, plus big-table HLO.

Builds the bench parity tables once (slow), then:
1. times lm_score_words_jnp standalone (vmapped exactly like the engine);
2. times it chained x16 (frame-like dependency);
3. dumps the big segment program's optimized HLO for inspection.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as B


def timeit(fn, *args, reps=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[0], ts[len(ts) // 2]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pyctcdecode_tpu.alphabet import Alphabet
    from pyctcdecode_tpu.models.device_tables import lm_score_words_jnp
    from pyctcdecode_tpu.models.language_model import LanguageModel
    from pyctcdecode_tpu.models.native import open_ngram_file
    from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC

    jax_cache = os.path.join(B.CACHE_DIR, "jax")
    os.makedirs(jax_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", jax_cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    alphabet = Alphabet.build_alphabet(B.LIBRI_LABELS)
    arpa = B._cached_arpa("bench_parity_3gram.arpa", B._make_parity_arpa)
    t0 = time.perf_counter()
    dev = TPUBeamSearchDecoderCTC(
        alphabet, LanguageModel(open_ngram_file(arpa))
    )
    print(f"tables built in {time.perf_counter() - t0:.1f}s", flush=True)
    from pyctcdecode_tpu.engine import _merge_tables, build_table_meta

    dlm = dev._device_lm[0]
    order = dlm.order
    tabs = dev._tabs
    meta = build_table_meta(dev._device_lm)
    _, devs = _merge_tables(tabs, meta)
    meta_dev = devs[0]
    print("fp sizes:", [t["slots"].shape for t in meta_dev["fp"]],
          "uni:", meta_dev["uni"].shape, flush=True)

    N, BM = 256, 100
    rng = np.random.RandomState(0)
    n_vocab = meta_dev["uni"].shape[0]
    ctx = jnp.asarray(rng.randint(0, n_vocab, size=(N, BM, order - 1), dtype=np.int32))
    ctx_len = jnp.asarray(rng.randint(0, order, size=(N, BM), dtype=np.int32))
    wid = jnp.asarray(rng.randint(0, n_vocab, size=(N, BM), dtype=np.int32))
    bo = jnp.asarray(rng.rand(N, BM, order - 1).astype(np.float32))

    def one(tabs_arg, ctx, ctx_len, wid, bo):
        _, devs_in = _merge_tables(tabs_arg, meta)
        tab = devs_in[0]

        def per_utt(c, cl, w, b):
            s, oc, ol, ob = lm_score_words_jnp(tab, order, -10.0, c, cl, w, b)
            return s, oc, ol, ob

        return jax.vmap(per_utt)(ctx, ctx_len, wid, bo)

    jone = jax.jit(one)
    mn, md = timeit(jone, tabs, ctx, ctx_len, wid, bo)
    print(f"standalone vmapped probe: min {mn*1e6:9.1f} us median {md*1e6:9.1f} us", flush=True)

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

    mn, md = timeit(chain, tabs, ctx, ctx_len, wid, bo)
    print(f"16-chained vmapped probe: min {mn*1e6:9.1f} us median {md*1e6:9.1f} us "
          f"({md/16*1e6:7.1f} us/step)", flush=True)

    if os.environ.get("DUMP_HLO", "1") == "1":
        init_fn, seg_fn, fin_fn = dev._get_segment_fns(
            16, 100, 16, True, N, use_hotwords=False, emit_paths=1
        )
        state = init_fn(dev._start_ctx(None))
        logp = jnp.asarray(rng.randn(N, 16, len(B.LIBRI_LABELS)).astype(np.float32))
        nf = jnp.full(N, 371, dtype=np.int32)
        params = jnp.asarray(dev._params_vector(-5.0, -10.0))
        txt = seg_fn.lower(
            state, logp, np.int32(0), nf, params, tabs, None
        ).compile().as_text()
        with open("/tmp/seg_big_hlo.txt", "w") as fh:
            fh.write(txt)
        print("big HLO bytes:", len(txt), flush=True)


if __name__ == "__main__":
    main()
