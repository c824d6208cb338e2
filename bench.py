"""Benchmark: device batch beam-search throughput vs single-core host decode.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload mirrors the reference's performance methodology (README.md:105-117,
tutorials/03_eval_performance.ipynb): LibriSpeech-style 371x29 log-prob
matrices (the reference's own fixture), beam width 50, shallow-fusion n-gram
LM. The headline metric is decoded audio-seconds per wall-clock second per
chip; ``vs_baseline`` is the speedup over this framework's host engine
decoding the same workload single-process on CPU (the reference's
deployment mode, whose speed is "comparable to C++" per its README).

Frame stride: 0.02 s (Wav2Vec2/QuartzNet CTC frame rate), so one 371-frame
utterance is 7.42 s of audio.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

FRAME_SEC = 0.02
BEAM_WIDTH = 50
BATCH = 256
K_TOKENS = 16  # top-K token preselect (threshold admits ~2-6 in practice)
LM_VOCAB = 30_000
LM_BIGRAMS = 300_000
SAMPLE = "/root/reference/pyctcdecode/tests/sample_data/libri_logits.json"
LIBRI_LABELS = [" "] + list("abcdefghijklmnopqrstuvwxyz") + ["'"] + [""]
TRANSCRIPT = (
    "i have a good deal of will you remember and what i have set my mind upon "
    "no doubt i shall some day achieve"
)


def _make_arpa(path: str) -> list:
    """Realistically-sized 2-gram LM (ref benchmark scale: a pruned n-gram
    over a large vocabulary; here ~30k words / ~300k bigrams, synthesized
    because the container has no network access). Returns the unigram list.
    """
    rng = np.random.RandomState(42)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = set(TRANSCRIPT.split())
    while len(vocab) < LM_VOCAB:
        n = max(1, len(vocab) % 9 + 2)
        vocab.add("".join(rng.choice(letters, size=rng.randint(2, 11))))
    vocab = sorted(vocab)
    ids = rng.randint(0, len(vocab), size=(LM_BIGRAMS, 2))
    words = TRANSCRIPT.split()
    with open(path, "w") as fh:
        fh.write("\\data\\\n")
        fh.write(f"ngram 1={len(vocab) + 3}\n")
        fh.write(f"ngram 2={LM_BIGRAMS + len(words) - 1}\n\n")
        fh.write("\\1-grams:\n")
        fh.write("-10\t<unk>\t0\n-2\t<s>\t-0.5\n-2\t</s>\t0\n")
        for w in vocab:
            fh.write(f"-3.5\t{w}\t-0.5\n")
        fh.write("\n\\2-grams:\n")
        seen = set()
        for a, b in zip(words[:-1], words[1:]):
            if (a, b) not in seen:
                seen.add((a, b))
                fh.write(f"-0.5\t{a} {b}\n")
        for i, j in ids:
            a, b = vocab[i], vocab[j]
            if (a, b) not in seen:
                seen.add((a, b))
                fh.write(f"-2.0\t{a} {b}\n")
        fh.write("\n\\end\\\n")
    return vocab


def main() -> None:
    import jax

    from pyctcdecode_tpu.alphabet import Alphabet
    from pyctcdecode_tpu.decoder import BeamSearchDecoderCTC
    from pyctcdecode_tpu.models.language_model import LanguageModel
    from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if os.path.exists(SAMPLE):
        with open(SAMPLE) as fh:
            logits = np.array(json.load(fh), dtype=np.float32)
    else:  # synthetic stand-in with the same shape statistics
        rng = np.random.RandomState(0)
        logits = rng.randn(371, len(LIBRI_LABELS)).astype(np.float32) * 3.0

    alphabet = Alphabet.build_alphabet(LIBRI_LABELS)
    with tempfile.TemporaryDirectory() as td:
        arpa = os.path.join(td, "bench.arpa")
        unigrams = _make_arpa(arpa)
        from pyctcdecode_tpu.models.native import open_ngram_file

        lm_host = LanguageModel(open_ngram_file(arpa), unigrams)
        lm_dev = LanguageModel(open_ngram_file(arpa), unigrams)

        host = BeamSearchDecoderCTC(alphabet, lm_host)
        dev = TPUBeamSearchDecoderCTC(alphabet, lm_dev)

        batch = [logits] * BATCH
        audio_sec_per_utt = logits.shape[0] * FRAME_SEC

        # --- host single-process baseline (time a few, like the ref notebook)
        n_host = 4
        host.decode(logits, beam_width=BEAM_WIDTH)  # warm caches
        t0 = time.perf_counter()
        for i in range(n_host):
            host.decode(batch[i], beam_width=BEAM_WIDTH)
        host_dt = time.perf_counter() - t0
        host_tput = n_host * audio_sec_per_utt / host_dt

        # --- device batch decode (compile once, then time)
        kwargs = dict(beam_width=BEAM_WIDTH, max_tokens_per_frame=K_TOKENS)
        texts = dev.decode_batch(batch, **kwargs)  # compile + warm
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            texts = dev.decode_batch(batch, **kwargs)
        dev_dt = (time.perf_counter() - t0) / reps
        dev_tput = BATCH * audio_sec_per_utt / dev_dt

        sanity = texts[0] == host.decode(logits, beam_width=BEAM_WIDTH)
        result = {
            "metric": "decode_throughput",
            "value": round(dev_tput, 2),
            "unit": "audio_sec/s/chip",
            "vs_baseline": round(dev_tput / host_tput, 2),
            "detail": {
                "batch": BATCH,
                "beam_width": BEAM_WIDTH,
                "k_tokens": K_TOKENS,
                "frames": int(logits.shape[0]),
                "lm": f"2-gram, {LM_VOCAB} vocab, ~{LM_BIGRAMS} bigrams",
                "host_audio_sec_per_s": round(host_tput, 2),
                "device_batch_latency_s": round(dev_dt, 4),
                "top1_matches_host": bool(sanity),
                "backend": jax.devices()[0].platform,
            },
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
