"""Alpha/beta gridsearch parity artifact (ref 03_eval_performance.ipynb cell 27).

The reference's published WER table comes from a small alpha/beta grid
(α ∈ {0.6, 0.7, 0.8}, β ∈ {2, 3, 4}) at beam 50 on dev-other. This
emits the analog on the calibrated synthetic corpus: per grid point,
host-engine WER and the ACTUAL reference package's WER on the SAME
utterances, plus exact-match verification — CPU-only (no device), so it
also documents that fusion-parameter semantics (alpha scaling, beta word
bonus) match the reference across the whole grid, not just the default.

    python scripts/alpha_beta_grid.py [--n 48] [--beam 50]
        [--out docs/alpha_beta_grid.md]
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

LIBRI_LABELS = [" "] + list("abcdefghijklmnopqrstuvwxyz") + ["'"] + [""]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--beam", type=int, default=50)
    ap.add_argument("--alphas", default="0.6,0.7,0.8")
    ap.add_argument("--betas", default="2.0,3.0,4.0")
    ap.add_argument("--arpa", default=None)
    ap.add_argument("--out", default=os.path.join(_ROOT, "docs",
                                                  "alpha_beta_grid.md"))
    args = ap.parse_args()

    from pyctcdecode_tpu.alphabet import Alphabet
    from pyctcdecode_tpu.decoder import BeamSearchDecoderCTC
    from pyctcdecode_tpu.evaluation import DEV_OTHER_DIFFICULTY, synthesize_corpus
    from pyctcdecode_tpu.models.language_model import LanguageModel
    from pyctcdecode_tpu.models.native import open_ngram_file
    from pyctcdecode_tpu.utils.metrics import word_error_rate

    import ref_baseline

    arpa = args.arpa or os.path.join(_ROOT, ".cache", "bench_parity_3gram.arpa")
    if not os.path.exists(arpa):
        raise SystemExit("run `python bench.py` once to create the parity "
                         "ARPA, or pass --arpa")
    model = open_ngram_file(arpa)
    unigrams = [w for w in model.native.vocab_list()
                if w not in ("<s>", "</s>", "<unk>")]
    alphabet = Alphabet.build_alphabet(LIBRI_LABELS)
    rng = np.random.RandomState(11)
    corpus_vocab = [unigrams[i] for i in rng.randint(0, len(unigrams), 6000)]
    corpus = synthesize_corpus(
        LIBRI_LABELS, corpus_vocab, n_utterances=args.n,
        **dict(DEV_OTHER_DIFFICULTY, seed=12),
    )
    ref = ref_baseline.load_reference()
    alphas = [float(a) for a in args.alphas.split(",")]
    betas = [float(b) for b in args.betas.split(",")]
    rows = []
    for alpha in alphas:
        for beta in betas:
            lm = LanguageModel(model, unigrams, alpha=alpha, beta=beta)
            host = BeamSearchDecoderCTC(alphabet, lm)
            t0 = time.perf_counter()
            host_hyps = [host.decode(m, beam_width=args.beam)
                         for m in corpus.logits]
            host_s = time.perf_counter() - t0
            row = {
                "alpha": alpha,
                "beta": beta,
                "host_wer": round(
                    word_error_rate(corpus.references, host_hyps), 4
                ),
                "host_s": round(host_s, 1),
            }
            if ref is not None:
                rdec = ref_baseline.build_reference_decoder(
                    ref, LIBRI_LABELS, arpa, alpha=alpha, beta=beta
                )
                ref_hyps = [rdec.decode(m, beam_width=args.beam)
                            for m in corpus.logits]
                row["reference_wer"] = round(
                    word_error_rate(corpus.references, ref_hyps), 4
                )
                row["host_matches_reference"] = ref_hyps == host_hyps
            rows.append(row)
            BeamSearchDecoderCTC.clear_class_models()
            print(json.dumps(row), flush=True)

    lines = [
        "# Alpha/beta gridsearch parity (ref 03_eval_performance.ipynb cell 27 analog)",
        "",
        f"Beam {args.beam}, {args.n} calibrated dev-other-difficulty "
        "utterances; host engine vs the actual reference package on the "
        "SAME utterances (exact transcript match verified per point).",
        "",
        "| alpha | beta | host WER | ref WER | host==ref |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['alpha']} | {r['beta']} | {r['host_wer']} | "
            f"{r.get('reference_wer', '')} | "
            f"{r.get('host_matches_reference', '')} |"
        )
    lines.append("")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
