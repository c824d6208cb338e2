"""WER-vs-runtime sweep over beam widths (ref README.md:107-109 analog).

The reference publishes a beam ∈ {1..200} WER/runtime curve on LibriSpeech
dev-other (ref 03_eval_performance.ipynb cells 29-31,
docs/images/performance.png). Real LibriSpeech audio is not available in
this environment, so the committed analog sweeps the same beam ladder on
the calibrated dev-other-difficulty synthetic corpus (greedy WER ~10%,
pyctcdecode_tpu/evaluation.py) with the parity-scale 3-gram LM, reporting
ms/sample + WER for the host engine (single core) and the device engine
(serving configuration), plus optionally the reference package itself.

    python scripts/wer_runtime_sweep.py [--n 256] [--beams 1,5,10,50,100,150,200]
        [--host-n 48] [--out docs/wer_runtime_sweep]

Writes <out>.json and <out>.md.
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


def run_sweep(
    beams,
    n: int = 256,
    host_n: int = 48,
    seed: int = 11,
    arpa: str = None,
    include_reference: bool = False,
    device: bool = True,
    lm_vocab_draw: int = 6000,
    reps: int = 3,
) -> dict:
    """Run the sweep; returns the artifact dict (see module docstring)."""
    from pyctcdecode_tpu.alphabet import Alphabet
    from pyctcdecode_tpu.decoder import BeamSearchDecoderCTC
    from pyctcdecode_tpu.evaluation import (
        DEV_OTHER_DIFFICULTY,
        synthesize_corpus,
    )
    from pyctcdecode_tpu.models.language_model import LanguageModel
    from pyctcdecode_tpu.models.native import open_ngram_file
    from pyctcdecode_tpu.utils.metrics import word_error_rate

    model = open_ngram_file(arpa)
    unigrams = [w for w in model.native.vocab_list()
                if w not in ("<s>", "</s>", "<unk>")]
    lm = LanguageModel(model, unigrams)
    alphabet = Alphabet.build_alphabet(LIBRI_LABELS)
    rng = np.random.RandomState(seed)
    draw = min(lm_vocab_draw, len(unigrams))
    corpus_vocab = [unigrams[i] for i in rng.randint(0, len(unigrams), draw)]
    corpus = synthesize_corpus(
        LIBRI_LABELS, corpus_vocab, n_utterances=n,
        **dict(DEV_OTHER_DIFFICULTY, seed=seed + 1),
    )
    host = BeamSearchDecoderCTC(alphabet, lm)
    host_n = min(host_n, n)
    result = {
        "corpus": {
            "n_utterances": n,
            "difficulty": "dev-other (greedy WER calibrated to ~10%)",
            "audio_seconds": round(corpus.audio_seconds, 1),
            "host_timing_subset": host_n,
        },
        "lm": f"3-gram over {len(unigrams)} unigrams ({os.path.basename(arpa)})",
        "methodology": (
            "ref tutorials/03_eval_performance.ipynb cells 29-31: decode "
            "the corpus per beam width, report ms per sample + corpus WER; "
            "host engine timed single-process on the subset, device engine "
            "timed on the full batch in the serving configuration "
            "(token chunking + bucketing + blank collapse, output-exact)"
        ),
        "points": [],
    }

    dev = None
    if device:
        from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC

        dev = TPUBeamSearchDecoderCTC(alphabet, lm)
        dev_kw = dict(
            token_chunking=6, length_bucketing=True, blank_collapse=True
        )

    result["timing"] = (
        f"best of {reps} reps per engine per point (the shared host's "
        "effective CPU speed swings ~30%; single-rep walls made the "
        "round-4 table non-monotonic in beam)"
    )
    result["wer_basis"] = (
        f"every *_wer_subset column is the SAME first {host_n} utterances "
        "for every engine; device_wer_full is additionally the whole "
        f"{n}-utterance corpus"
    )

    rd = None
    if include_reference:
        try:
            import ref_baseline

            ref = ref_baseline.load_reference()
            rd = ref_baseline.build_reference_decoder(ref, LIBRI_LABELS, arpa)
        except Exception as err:
            result["reference_error"] = repr(err)

    def _best_of(fn):
        hyps, best = None, float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            hyps = fn()
            best = min(best, time.perf_counter() - t0)
        return hyps, best

    for beam in beams:
        point = {"beam_width": int(beam)}
        # host: single-process sequential decode on the subset
        host_hyps, host_wall = _best_of(
            lambda: [
                host.decode(m, beam_width=beam)
                for m in corpus.logits[:host_n]
            ]
        )
        point["host_ms_per_sample"] = round(1e3 * host_wall / host_n, 2)
        point["host_wer_subset"] = round(
            word_error_rate(corpus.references[:host_n], host_hyps), 4
        )
        if dev is not None:
            dev.decode_batch(corpus.logits, beam_width=beam, **dev_kw)  # warm
            dev_hyps, dev_wall = _best_of(
                lambda: dev.decode_batch(
                    corpus.logits, beam_width=beam, **dev_kw
                )
            )
            point["device_ms_per_sample"] = round(1e3 * dev_wall / n, 3)
            point["device_wer_subset"] = round(
                word_error_rate(
                    corpus.references[:host_n], dev_hyps[:host_n]
                ),
                4,
            )
            point["device_wer_full"] = round(
                word_error_rate(corpus.references, dev_hyps), 4
            )
            point["device_matches_host_subset"] = (
                dev_hyps[:host_n] == host_hyps
            )
        if rd is not None:
            rd.decode(corpus.logits[0], beam_width=beam)
            ref_hyps, ref_wall = _best_of(
                lambda: [
                    rd.decode(m, beam_width=beam)
                    for m in corpus.logits[:host_n]
                ]
            )
            point["reference_ms_per_sample"] = round(
                1e3 * ref_wall / host_n, 2
            )
            point["reference_wer_subset"] = round(
                word_error_rate(corpus.references[:host_n], ref_hyps), 4
            )
        result["points"].append(point)
        print(json.dumps(point), flush=True)
    return result


def to_markdown(result: dict) -> str:
    """Render the artifact as the committed markdown table."""
    cols = [
        ("beam_width", "beam"),
        ("host_ms_per_sample", "host ms/sample"),
        ("reference_ms_per_sample", "ref ms/sample"),
        ("device_ms_per_sample", "device ms/sample"),
        ("host_wer_subset", "host WER (subset)"),
        ("reference_wer_subset", "ref WER (subset)"),
        ("device_wer_subset", "device WER (subset)"),
        ("device_wer_full", "device WER (full)"),
        ("device_matches_host_subset", "device==host"),
    ]
    present = [c for c in cols if any(c[0] in p for p in result["points"])]
    lines = [
        "# WER vs runtime sweep (beam-width ladder)",
        "",
        result["methodology"],
        "",
        result.get("timing", ""),
        "",
        result.get("wer_basis", ""),
        "",
        f"Corpus: {result['corpus']['n_utterances']} utterances, "
        f"{result['corpus']['difficulty']}; LM: {result['lm']}.",
        "",
        "| " + " | ".join(h for _, h in present) + " |",
        "|" + "|".join("---" for _ in present) + "|",
    ]
    for p in result["points"]:
        lines.append(
            "| " + " | ".join(str(p.get(k, "")) for k, _ in present) + " |"
        )
    lines.append("")
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--host-n", type=int, default=48)
    ap.add_argument("--beams", default="1,5,10,50,100,150,200")
    ap.add_argument("--arpa", default=None,
                    help="defaults to the bench parity ARPA in .cache/")
    ap.add_argument("--reference", action="store_true")
    ap.add_argument("--no-device", action="store_true")
    ap.add_argument("--out", default=os.path.join(_ROOT, "docs",
                                                  "wer_runtime_sweep"))
    args = ap.parse_args()

    import jax

    cache = os.path.join(_ROOT, ".cache")
    jax.config.update("jax_compilation_cache_dir", os.path.join(cache, "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    arpa = args.arpa or os.path.join(cache, "bench_parity_3gram.arpa")
    if not os.path.exists(arpa):
        raise SystemExit("run `python bench.py` once to create the parity "
                         "ARPA, or pass --arpa")
    beams = [int(b) for b in args.beams.split(",")]
    result = run_sweep(
        beams, n=args.n, host_n=args.host_n, arpa=arpa,
        include_reference=args.reference, device=not args.no_device,
    )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out + ".json", "w") as fh:
        json.dump(result, fh, indent=1)
    with open(args.out + ".md", "w") as fh:
        fh.write(to_markdown(result))
    print(f"wrote {args.out}.json and {args.out}.md")


if __name__ == "__main__":
    main()
