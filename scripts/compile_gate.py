"""Time the serving segment-program compile (gate before full bench runs).

XLA compile time on this backend is minutes per ~36 MB segment executable
and certain innocuous-looking graph edits blow it past 25 minutes (see
PARITY.md round-4 notes). This script compiles exactly the bench's serving
programs (warm decode of a tiny slice of the cached corpus at the serving
shapes) and prints wall time, so a pathological compile is caught in one
measurement instead of burning a bench budget.

    python scripts/compile_gate.py [--rows 384] [--chunk 6]
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
    ap.add_argument("--rows", type=int, default=384)
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

    labels = [" "] + list("abcdefghijklmnopqrstuvwxyz") + ["'"] + [""]
    arpa = os.path.join(cache, "bench_parity_3gram.arpa")
    corpus_pkl = os.path.join(cache, "bench_corpus_b768.pkl")
    if not (os.path.exists(arpa) and os.path.exists(corpus_pkl)):
        raise SystemExit("run `python bench.py` once to warm .cache/ first")
    with open(corpus_pkl, "rb") as fh:
        _, corpus = pickle.load(fh)
    t0 = time.time()
    model = open_ngram_file(arpa)
    unigrams = [w for w in model.native.vocab_list()
                if w not in ("<s>", "</s>", "<unk>")]
    dev = TPUBeamSearchDecoderCTC(
        Alphabet.build_alphabet(labels), LanguageModel(model, unigrams)
    )
    print(f"decoder built in {time.time()-t0:.0f}s", flush=True)

    # exactly the serving shapes: one group of `rows` utterances
    logits = corpus.logits[: args.rows]
    t0 = time.time()
    dev.decode_batch(
        logits, beam_width=args.beam, token_chunking=args.chunk,
        length_bucketing=args.rows, blank_collapse=True,
    )
    dt = time.time() - t0
    print(f"serving programs compiled+ran in {dt:.0f}s "
          f"({'CACHED' if dt < 45 else 'fresh compile'})", flush=True)


if __name__ == "__main__":
    main()
