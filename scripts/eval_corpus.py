"""Corpus WER / throughput / parity evaluation CLI.

The committed analog of the reference's ``03_eval_performance.ipynb``
methodology: decode a corpus at a given beam width with an n-gram LM,
report WER and audio-seconds/s for the host and device engines, and check
top-1 parity between them. With no ``--arpa`` a synthetic LM + corpus are
generated (no network in this environment); with one, the corpus is drawn
from the model's unigrams.

    python scripts/eval_corpus.py --n 128 --beam 100 [--arpa lm.arpa]
    python scripts/eval_corpus.py --engine device   # single-engine timing
"""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LIBRI_LABELS = [" "] + list("abcdefghijklmnopqrstuvwxyz") + ["'"] + [""]


def _synth_arpa(path: str, n_words: int, seed: int) -> list:
    """Small synthetic 2-gram over random words (for LM-on decoding)."""
    rng = np.random.RandomState(seed)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = set()
    while len(vocab) < n_words:
        vocab.add("".join(rng.choice(letters, size=rng.randint(3, 9))))
    vocab = sorted(vocab)
    with open(path, "w") as fh:
        fh.write("\\data\\\n")
        fh.write(f"ngram 1={len(vocab) + 3}\n")
        fh.write(f"ngram 2={len(vocab)}\n\n")
        fh.write("\\1-grams:\n")
        fh.write("-10\t<unk>\t0\n-2\t<s>\t-0.5\n-2\t</s>\t0\n")
        for w in vocab:
            fh.write(f"-2.5\t{w}\t-0.5\n")
        fh.write("\n\\2-grams:\n")
        for i, w in enumerate(vocab):
            fh.write(f"-1.0\t{w} {vocab[(i + 1) % len(vocab)]}\n")
        fh.write("\n\\end\\\n")
    return vocab


def _k_value(text: str):
    """argparse type for --k: an integer or the literal 'auto'."""
    if text == "auto":
        return text
    try:
        return int(text)
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"expected an integer or 'auto', got {text!r}"
        ) from None


def _time_reference(arpa, corpus, beam, alpha, beta, host_hyps):
    """Single-core reference-package timing on the same corpus."""
    import time

    import ref_baseline

    from pyctcdecode_tpu.utils.metrics import word_error_rate

    ref = ref_baseline.load_reference()
    if ref is None:
        return "unavailable"
    dec = ref_baseline.build_reference_decoder(
        ref, LIBRI_LABELS, arpa, alpha=alpha, beta=beta
    )
    dec.decode(corpus.logits[0], beam_width=beam)  # warm lazy setup
    t0 = time.perf_counter()
    hyps = [dec.decode(m, beam_width=beam) for m in corpus.logits]
    wall = time.perf_counter() - t0
    out = {
        "audio_sec_per_sec": round(corpus.audio_seconds / wall, 2),
        "wer": round(word_error_rate(corpus.references, hyps), 4),
    }
    if host_hyps is not None:
        out["matches_host"] = hyps == host_hyps
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=128, help="utterances")
    ap.add_argument("--beam", type=int, default=100)
    ap.add_argument("--alpha", type=float, default=0.5)
    ap.add_argument("--beta", type=float, default=1.5)
    ap.add_argument(
        "--k", type=_k_value, default=None,
        help="device token preselect: an integer or 'auto' (measured exact)",
    )
    ap.add_argument("--arpa", default=None, help="n-gram LM (synthesized if absent)")
    ap.add_argument("--vocab-words", type=int, default=2000)
    ap.add_argument(
        "--difficulty", choices=["legacy", "dev-other", "fixture"],
        default="legacy",
        help="corpus difficulty preset (calibrations in evaluation.py); "
        "'legacy' keeps this script's original noisier generator settings",
    )
    ap.add_argument(
        "--reference", action="store_true",
        help="also time the reference package single-core (kenlm-API shim "
        "over the C++ ctclm engine; see scripts/ref_baseline.py)",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--engine", choices=["both", "host", "device"], default="both",
        help="'both' also reports parity",
    )
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument(
        "--blank-collapse", action="store_true", dest="blank_collapse",
        help="drop blank-certain frames (device engine only; exactness-"
        "preserving at the decode token_min_logp)",
    )
    ap.add_argument(
        "--token-chunking", type=int, default=None, dest="token_chunking",
        metavar="K",
        help="token-timeline decoding with K-wide chunks (device engine "
        "only; exact admission — the serving configuration)",
    )
    args = ap.parse_args()
    if args.blank_collapse and args.engine != "device":
        ap.error("--blank-collapse requires --engine device")
    if args.token_chunking and args.engine not in ("device", "both"):
        ap.error("--token-chunking requires the device engine")

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from pyctcdecode_tpu import build_ctcdecoder
    from pyctcdecode_tpu.evaluation import (
        DEV_OTHER_DIFFICULTY,
        FIXTURE_DIFFICULTY,
        compare_engines,
        evaluate_corpus,
        synthesize_corpus,
    )
    from pyctcdecode_tpu.models.ngram import load_unigram_set_from_arpa

    with tempfile.TemporaryDirectory() as td:
        arpa = args.arpa
        if arpa is None:
            arpa = os.path.join(td, "eval.arpa")
            vocab = _synth_arpa(arpa, args.vocab_words, args.seed)
        else:
            vocab = sorted(load_unigram_set_from_arpa(arpa))
        difficulty = {
            "legacy": {},
            "dev-other": DEV_OTHER_DIFFICULTY,
            "fixture": FIXTURE_DIFFICULTY,
        }[args.difficulty]
        corpus = synthesize_corpus(
            LIBRI_LABELS, vocab, n_utterances=args.n, seed=args.seed,
            **difficulty,
        )
        kwargs = {}
        if args.k is not None:
            kwargs["max_tokens_per_frame"] = args.k
        if args.blank_collapse:
            kwargs["blank_collapse"] = True
        if args.token_chunking:
            kwargs["token_chunking"] = args.token_chunking
        build = dict(alpha=args.alpha, beta=args.beta)
        if args.engine == "both":
            host = build_ctcdecoder(LIBRI_LABELS, arpa, engine="host", **build)
            dev = build_ctcdecoder(LIBRI_LABELS, arpa, engine="tpu", **build)
            report = compare_engines(host, dev, corpus, args.beam, **kwargs)
            host_hyps = report.pop("host_hypotheses")
            report.pop("device_hypotheses")
        else:
            engine = "host" if args.engine == "host" else "tpu"
            dec = build_ctcdecoder(LIBRI_LABELS, arpa, engine=engine, **build)
            if engine == "host":
                kwargs.pop("max_tokens_per_frame", None)
            report = evaluate_corpus(dec, corpus, args.beam, **kwargs)
            report.pop("hypotheses")
            report["engine"] = args.engine
            host_hyps = None
        if args.reference:
            report["reference"] = _time_reference(
                arpa, corpus, args.beam, args.alpha, args.beta, host_hyps
            )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
