"""Bound the kenlm-shim overhead inside the reference baseline (BASELINE.md).

The bench's ``vs_baseline`` denominator is the reference package running on
a kenlm-API shim over this repo's C++ ctclm engine (scripts/ref_baseline.py)
because the image ships no kenlm. If that shim were slower than a real
kenlm binding, the baseline would be unfairly slow and the ratio inflated.
This script bounds the distortion three ways:

1. per-call cost of the shim's ``BaseScore`` (the reference's hottest LM
   call, ref language_model.py:321,347) — Python wrapper + C++ lookup;
2. per-call cost of the raw C entry point alone (ctypes, preallocated
   buffers) — isolating the wrapper's Python overhead;
3. the LM share of a whole reference decode: BaseScore call count x
   per-call cost vs the utterance's wall time — so even a zero-cost LM
   binding could speed the baseline by at most that share.

    python scripts/shim_overhead_bench.py [--beam 100] [--n-utts 8]
"""
import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(1, os.path.join(_ROOT, "scripts"))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--beam", type=int, default=100)
    ap.add_argument("--n-utts", type=int, default=8)
    ap.add_argument("--calls", type=int, default=200_000)
    args = ap.parse_args()

    import bench
    import ref_baseline

    arpa = bench._cached_arpa(
        "bench_parity_3gram.arpa", bench._make_parity_arpa
    )
    ref = ref_baseline.load_reference()
    if ref is None:
        raise SystemExit("reference unavailable")
    kenlm = sys.modules["kenlm"]
    model = kenlm.Model(arpa)
    native = ref_baseline._load_native(arpa)
    vocab = native.vocab_list()
    rng = np.random.RandomState(0)
    words = [vocab[i] for i in rng.randint(3, len(vocab), 4096)]

    # 1. shim BaseScore per call (chained states, like decoding does)
    st_a, st_b = kenlm.State(), kenlm.State()
    model.BeginSentenceWrite(st_a)
    n = args.calls
    t0 = time.perf_counter()
    for i in range(n):
        model.BaseScore(st_a, words[i & 4095], st_b)
        st_a, st_b = st_b, st_a
    shim_ns = (time.perf_counter() - t0) / n * 1e9

    # 2. raw C entry point (no State/tuple wrapping): the lookup itself
    w = max(model.order - 1, 1)
    ctx = np.full(w, -1, dtype=np.int32)
    out_ctx = np.empty(w, dtype=np.int32)
    out_len = np.empty(1, dtype=np.int32)
    lib, h = model._lib, model._h
    wids = np.array(
        [lib.ctclm_word_id(h, wd.encode()) for wd in words], dtype=np.int32
    )
    score = lib.ctclm_score
    t0 = time.perf_counter()
    for i in range(n):
        score(h, ctx, 1, wids[i & 4095], out_ctx, out_len)
        ctx[w - 1] = out_ctx[w - 1]
    raw_ns = (time.perf_counter() - t0) / n * 1e9

    # 3. LM share of a whole reference decode (count calls, then price
    # them at the measured per-call cost — counting wrappers would skew
    # the wall time otherwise)
    import pickle

    corpus_pkl = os.path.join(bench.CACHE_DIR, "bench_corpus_b768.pkl")
    if os.path.exists(corpus_pkl):
        with open(corpus_pkl, "rb") as fh:
            _, corpus = pickle.load(fh)
        mats = corpus.logits[: args.n_utts]
    else:
        rng = np.random.RandomState(1)
        mats = [rng.randn(350, 29).astype(np.float32) * 3 for _ in range(args.n_utts)]
    dec = ref_baseline.build_reference_decoder(
        ref, bench.LIBRI_LABELS, arpa
    )
    dec.decode(mats[0], beam_width=args.beam)  # warm
    t0 = time.perf_counter()
    for m in mats:
        dec.decode(m, beam_width=args.beam)
    wall = time.perf_counter() - t0

    calls = 0
    real_base = type(model).BaseScore

    def counting(self, a, word, b):
        nonlocal calls
        calls += 1
        return real_base(self, a, word, b)

    type(model).BaseScore = counting
    try:
        for m in mats:
            dec.decode(m, beam_width=args.beam)
    finally:
        type(model).BaseScore = real_base

    lm_time = calls * shim_ns * 1e-9
    out = {
        "shim_basescore_ns_per_call": round(shim_ns, 1),
        "raw_c_lookup_ns_per_call": round(raw_ns, 1),
        "python_wrapper_overhead_ns": round(shim_ns - raw_ns, 1),
        "decode_wall_s": round(wall, 3),
        "basescore_calls": calls,
        "lm_share_of_decode": round(lm_time / wall, 4),
        "max_baseline_speedup_with_free_lm": round(1.0 / (1.0 - lm_time / wall), 3),
        "note": (
            "even a zero-cost LM binding could raise the single-core "
            "baseline (and shrink vs_baseline) by at most "
            "max_baseline_speedup_with_free_lm"
        ),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
