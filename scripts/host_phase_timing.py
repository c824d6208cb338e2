"""Time the host-side phases of a one-shot serving-config batch decode.

The pipelined bench overlaps host prep/post with the device run; the
one-shot number pays them serially. This script breaks a one-shot batch
into its phases so the host work can be attacked where it matters.

    python scripts/host_phase_timing.py [--batch 768] [--chunk 6]
"""
import argparse
import os
import pickle
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=768)
    ap.add_argument("--chunk", type=int, default=6)
    ap.add_argument("--beam", type=int, default=100)
    args = ap.parse_args()

    import jax

    cache = os.path.join(_ROOT, ".cache")
    jax.config.update("jax_compilation_cache_dir", os.path.join(cache, "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pyctcdecode_tpu.alphabet import Alphabet
    from pyctcdecode_tpu.models.language_model import LanguageModel
    from pyctcdecode_tpu.models.native import open_ngram_file
    from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC
    from pyctcdecode_tpu.utils.logits import token_timeline

    labels = [" "] + list("abcdefghijklmnopqrstuvwxyz") + ["'"] + [""]
    arpa = os.path.join(cache, "bench_parity_3gram.arpa")
    corpus_pkl = os.path.join(cache, f"bench_corpus_b{args.batch}.pkl")
    if not (os.path.exists(arpa) and os.path.exists(corpus_pkl)):
        raise SystemExit("run `python bench.py` once to warm .cache/ first")
    with open(corpus_pkl, "rb") as fh:
        _, corpus = pickle.load(fh)

    model = open_ngram_file(arpa)
    unigrams = [w for w in model.native.vocab_list()
                if w not in ("<s>", "</s>", "<unk>")]
    dev = TPUBeamSearchDecoderCTC(
        Alphabet.build_alphabet(labels), LanguageModel(model, unigrams)
    )
    logits = corpus.logits[: args.batch]
    kw = dict(
        beam_width=args.beam, token_chunking=args.chunk,
        length_bucketing=True, blank_collapse=True,
    )

    # warm
    dev.decode_batch(logits, **kw)
    t0 = time.perf_counter()
    dev.decode_batch(logits, **kw)
    total = time.perf_counter() - t0
    print(f"one-shot total: {total:.3f}s")

    # phase 1: normalize + blank collapse
    t0 = time.perf_counter()
    pre = dev._collapse_all(logits, -5.0)
    t_collapse = time.perf_counter() - t0
    print(f"  normalize+collapse: {t_collapse:.3f}s")

    # phase 2: token timelines
    t0 = time.perf_counter()
    tls = [token_timeline(m, -5.0, args.chunk) for m in pre[0]]
    t_tl = time.perf_counter() - t0
    print(f"  token timelines:    {t_tl:.3f}s")

    # phase 3: launch (padding + upload + dispatch) and device wait
    t0 = time.perf_counter()
    handles = dev._launch_batch(logits, dict(
        beam_width=args.beam, beam_prune_logp=-10.0, token_min_logp=-5.0,
        prune_history=True, hotwords=None, hotword_weight=10.0,
        max_tokens_per_frame=None, batch_pad=8, top_n=1,
        blank_collapse=True, token_chunking=args.chunk,
    ), bucketing=True)
    t_launch = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _, h in handles:
        if h is not None:
            for v in h["out"].values():
                if isinstance(v, tuple):
                    for x in v:
                        getattr(x, "block_until_ready", lambda: None)()
                else:
                    getattr(v, "block_until_ready", lambda: None)()
    t_device = time.perf_counter() - t0
    print(f"  launch (prep+dispatch): {t_launch:.3f}s  [includes phases 1+2]")
    print(f"  device wait:            {t_device:.3f}s")

    # phase 4: collect (transfer + backtrace replay + OutputBeam build)
    t0 = time.perf_counter()
    res = dev._collect_bucketed(handles, len(logits), False)
    t_collect = time.perf_counter() - t0
    print(f"  collect (replay+build): {t_collect:.3f}s")
    print(f"  sum: {t_launch + t_device + t_collect:.3f}s")


if __name__ == "__main__":
    main()
