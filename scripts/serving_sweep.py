"""Sweep serving-config knobs (segment frames, bucket rows, chunk width).

Times repeated `decode_batch` calls (2nd/3rd reps, warm executables) on
the cached bench corpus for each configuration and prints a ranked table.
Each fresh configuration costs a segment-program compile (~2-4 min on
this backend), so sweep points are few and chosen around the current
operating point.

    python scripts/serving_sweep.py --points "16:384:6,32:384:6,16:768:6,16:384:8"
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
    ap.add_argument("--batch", type=int, default=768)
    ap.add_argument("--beam", type=int, default=100)
    ap.add_argument(
        "--points", default="16:384:6,32:384:6,16:768:6",
        help="comma list of seg:rows:chunk triples",
    )
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
    with open(corpus_pkl, "rb") as fh:
        _, corpus = pickle.load(fh)
    model = open_ngram_file(arpa)
    unigrams = [w for w in model.native.vocab_list()
                if w not in ("<s>", "</s>", "<unk>")]
    base = TPUBeamSearchDecoderCTC(
        Alphabet.build_alphabet(labels), LanguageModel(model, unigrams)
    )
    logits = corpus.logits[: args.batch]
    audio = sum(m.shape[0] for m in logits) * 0.02

    results = []
    for point in args.points.split(","):
        seg, rows, chunk = (int(x) for x in point.split(":"))
        dev = base.with_options(segment_frames=seg)
        kw = dict(
            beam_width=args.beam, token_chunking=chunk,
            length_bucketing=rows, blank_collapse=True,
        )
        t0 = time.time()
        texts0 = dev.decode_batch(logits, **kw)  # compile + warm
        print(f"  {point}: warm+compile {time.time()-t0:.0f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            texts = dev.decode_batch(logits, **kw)
            best = min(best, time.perf_counter() - t0)
        assert texts == texts0
        tput = audio / best
        results.append((tput, point, best))
        print(f"  {point}: {tput:8.1f} audio_s/s  ({best:.3f}s/batch)",
              flush=True)
    results.sort(reverse=True)
    print("\nranked:")
    for tput, point, best in results:
        print(f"  {point:12s} {tput:8.1f} audio_s/s  {best:.3f}s")


if __name__ == "__main__":
    main()
