"""Diagnose pipelined serving overlap: per-yield gap trace at several depths.

Round-5 follow-up: a recorded bench showed the depth-3 steady gap (1.84 s)
EXCEEDING the fully-serial one-shot latency (1.75 s) — pipelining reading
as a net loss, against the pre-restart measurements where the steady gap
matched device busy (~1.42 s). This probe prints every yield-to-yield gap
for depths {1, 2, 3} plus the serial per-batch latency, so host-prep,
transfer, and device-busy contributions can be told apart run to run.

    python scripts/pipeline_probe.py [--batches 8] [--depths 1,2,3]

Requires a warm ``.cache/`` (run bench.py once first).
"""
import argparse
import os
import pickle
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--depths", default="1,2,3")
    ap.add_argument("--batch", type=int, default=768)
    ap.add_argument("--beam", type=int, default=100)
    ap.add_argument("--chunk", type=int, default=5)
    args = ap.parse_args()

    import jax

    cache = os.path.join(_ROOT, ".cache")
    jax.config.update("jax_compilation_cache_dir", os.path.join(cache, "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pyctcdecode_tpu.alphabet import Alphabet
    from pyctcdecode_tpu.models.language_model import LanguageModel
    from pyctcdecode_tpu.models.native import open_ngram_file
    from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC

    labels = [" "] + list("abcdefghijklmnopqrstuvwxyz") + ["'"] + [""]
    arpa = os.path.join(cache, "bench_parity_3gram.arpa")
    corpus_pkl = os.path.join(cache, f"bench_corpus_b{args.batch}.pkl")
    if not (os.path.exists(arpa) and os.path.exists(corpus_pkl)):
        raise SystemExit("run `python bench.py` once to warm .cache/ first")
    with open(corpus_pkl, "rb") as fh:
        _, corpus = pickle.load(fh)
    audio_total = sum(m.shape[0] for m in corpus.logits) * 0.02

    t0 = time.time()
    lm = LanguageModel(open_ngram_file(arpa), alpha=0.5, beta=1.5)
    dev = TPUBeamSearchDecoderCTC(Alphabet.build_alphabet(labels), lm)
    print(f"[{time.time() - t0:6.1f}s] decoder built")

    kw = dict(
        beam_width=args.beam, token_chunking=args.chunk,
        length_bucketing=True, blank_collapse=True, top_n=1,
    )

    # serial latency, best of 3 (prep + device + fetch, no overlap)
    lats = []
    for _ in range(3):
        t1 = time.perf_counter()
        dev.decode_beams_batch(corpus.logits, **kw)
        lats.append(time.perf_counter() - t1)
    print(f"[{time.time() - t0:6.1f}s] serial latency best-of-3: "
          f"{min(lats):.3f}s  all={['%.3f' % x for x in lats]}")

    for depth in (int(d) for d in args.depths.split(",")):
        ts = []
        t1 = time.perf_counter()
        for _ in dev.decode_beams_batches(
            [corpus.logits] * args.batches, pipeline_depth=depth, **kw
        ):
            ts.append(time.perf_counter() - t1)
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        steady = gaps[depth:len(gaps) - depth] or gaps
        print(
            f"[{time.time() - t0:6.1f}s] depth={depth} "
            f"whole={ts[-1] / args.batches:.3f}s/batch "
            f"steady={sum(steady) / len(steady):.3f}s "
            f"tput={audio_total * len(steady) / sum(steady):.0f} audio_s/s"
        )
        print("    gaps: " + " ".join(f"{g:.2f}" for g in gaps))


if __name__ == "__main__":
    main()
