"""Profile the bench's serving configuration (token timeline + bucketing).

Reuses bench.py's cached corpus + parity ARPA (run bench.py once first so
``.cache/`` is warm), decodes one batch in the exact serving configuration,
and prints the per-op device table plus a bucketed summary.

    python scripts/profile_serving.py [--top 30] [--batch 768] [--chunk 6]
"""
import argparse
import os
import pickle
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--batch", type=int, default=768)
    ap.add_argument("--chunk", type=int, default=6)
    ap.add_argument("--beam", type=int, default=100)
    ap.add_argument("--no-bucketing", action="store_true")
    ap.add_argument("--target-rows", type=int, default=384,
                    help="length-bucketing per-group row target")
    ap.add_argument("--blank-collapse", action="store_true")
    ap.add_argument("--seg", type=int, default=None,
                    help="frames per segment program (default 16 on TPU)")
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    import jax

    cache = os.path.join(_ROOT, ".cache")
    jax.config.update("jax_compilation_cache_dir", os.path.join(cache, "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pyctcdecode_tpu.alphabet import Alphabet
    from pyctcdecode_tpu.models.language_model import LanguageModel
    from pyctcdecode_tpu.models.native import open_ngram_file
    from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC
    from pyctcdecode_tpu.utils.profiling import profile_call

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
    if args.seg is not None:
        dev = dev.with_options(segment_frames=args.seg)
    kw = dict(
        beam_width=args.beam,
        token_chunking=args.chunk,
        length_bucketing=False if args.no_bucketing else args.target_rows,
        blank_collapse=args.blank_collapse,
    )
    logits = corpus.logits[: args.batch]
    dev.decode_batch(logits, **kw)  # compile + warm
    report = profile_call(lambda: dev.decode_batch(logits, **kw),
                          logdir=args.logdir)
    print(report.table(top=args.top))

    # collapse instance counters (fusion.12 -> fusion) and group by the
    # op's result shape so the table reads as "cost per program point"
    import re
    from collections import defaultdict

    groups = defaultdict(float)
    for op in report.ops:
        m = re.match(r"%([a-z_\-]+)[.\d]* = ([^ )]+)", op.name)
        key = f"{m.group(1)} {m.group(2)[:60]}" if m else op.name[:70]
        groups[key] += op.total_ms
    print()
    total = report.summed_ms
    for name, ms in sorted(groups.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {100 * ms / total:5.1f}%  {ms:9.2f} ms  {name}")


if __name__ == "__main__":
    main()
