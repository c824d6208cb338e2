"""Benchmark: device batch beam-search throughput vs single-core host decode.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline runs the PARITY configuration — the setup the reference's own
published numbers use (README.md:105-117, tutorials/03_eval_performance.ipynb
cells 8-9, 18): beam width 100, an order-3 LM at realistic scale (~200k-word
vocabulary, ~1.5M bigrams + ~1.1M trigrams; synthesized here because the
container has no network access, with the same shape statistics as the
pruned LibriSpeech 3-gram), LibriSpeech-style 371x29 log-prob matrices (the
reference's own fixture). The metric is decoded audio-seconds per wall-clock
second per chip; ``vs_baseline`` is the speedup over this framework's host
engine decoding the same workload single-process on CPU (the reference's
deployment mode; its speed is "comparable to C++" per the reference README).
A secondary line in ``detail`` re-times the round-1 2-gram configuration for
continuity.

Frame stride: 0.02 s (Wav2Vec2/QuartzNet CTC frame rate), so one 371-frame
utterance is 7.42 s of audio.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

FRAME_SEC = 0.02
BEAM_WIDTH = 100
# 384 is the measured single-chip sweet spot at the parity config (2513
# audio_s/s vs 2314 @256 and 2253 @512 after the round-2 engine work)
BATCH = int(os.environ.get("BENCH_BATCH", 384))
K_TOKENS = 16  # top-K token preselect (threshold admits ~2-6 in practice)
RUN_SECONDARY = os.environ.get("BENCH_SECONDARY", "1") == "1"
SAMPLE = "/root/reference/pyctcdecode/tests/sample_data/libri_logits.json"
LIBRI_LABELS = [" "] + list("abcdefghijklmnopqrstuvwxyz") + ["'"] + [""]
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")

# parity-scale 3-gram (ref 3-gram.pruned.1e-7.arpa shape statistics)
LM_VOCAB = 200_000
LM_BIGRAMS = 1_500_000
LM_TRIGRAMS = 1_100_000
# round-1 secondary config
LM2_VOCAB = 30_000
LM2_BIGRAMS = 300_000
TRANSCRIPT = (
    "i have a good deal of will you remember and what i have set my mind upon "
    "no doubt i shall some day achieve"
)


def _vocab(rng, n: int) -> list:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = set(TRANSCRIPT.split())
    lens = rng.randint(2, 12, size=n + 20000)
    i = 0
    while len(vocab) < n:
        vocab.add("".join(rng.choice(letters, size=lens[i % len(lens)])))
        i += 1
    return sorted(vocab)


def _write_grams(fh, name, arr_words, probs, backoffs=None):
    lines = []
    for i in range(len(arr_words)):
        row = f"{probs[i]}\t{arr_words[i]}"
        if backoffs is not None:
            row += f"\t{backoffs[i]}"
        lines.append(row + "\n")
        if len(lines) >= 100_000:
            fh.writelines(lines)
            lines = []
    fh.writelines(lines)


def _make_parity_arpa(path: str) -> None:
    """Synthesize the parity-scale 3-gram ARPA (cached across runs)."""
    rng = np.random.RandomState(7)
    vocab = _vocab(rng, LM_VOCAB)
    words = TRANSCRIPT.split()
    n_v = len(vocab)
    bi = rng.randint(0, n_v, size=(LM_BIGRAMS, 2))
    tri = rng.randint(0, n_v, size=(LM_TRIGRAMS, 3))
    with open(path, "w") as fh:
        fh.write("\\data\\\n")
        fh.write(f"ngram 1={n_v + 3}\n")
        fh.write(f"ngram 2={LM_BIGRAMS + len(words) - 1}\n")
        fh.write(f"ngram 3={LM_TRIGRAMS + len(words) - 2}\n\n")
        fh.write("\\1-grams:\n")
        fh.write("-10\t<unk>\t0\n-2.5\t<s>\t-0.6\n-2.5\t</s>\t0\n")
        p1 = np.round(rng.uniform(-6.0, -2.5, size=n_v), 3)
        b1 = np.round(rng.uniform(-1.2, -0.1, size=n_v), 3)
        _write_grams(fh, "1", vocab, p1, b1)
        fh.write("\n\\2-grams:\n")
        for a, b in zip(words[:-1], words[1:]):
            fh.write(f"-0.4\t{a} {b}\t-0.3\n")
        pairs = [f"{vocab[i]} {vocab[j]}" for i, j in bi]
        p2 = np.round(rng.uniform(-4.0, -0.5, size=LM_BIGRAMS), 3)
        b2 = np.round(rng.uniform(-1.0, -0.05, size=LM_BIGRAMS), 3)
        _write_grams(fh, "2", pairs, p2, b2)
        fh.write("\n\\3-grams:\n")
        for a, b, c in zip(words[:-2], words[1:-1], words[2:]):
            fh.write(f"-0.3\t{a} {b} {c}\n")
        tris = [f"{vocab[i]} {vocab[j]} {vocab[k]}" for i, j, k in tri]
        p3 = np.round(rng.uniform(-3.0, -0.3, size=LM_TRIGRAMS), 3)
        _write_grams(fh, "3", tris, p3)
        fh.write("\n\\end\\\n")


def _make_2gram_arpa(path: str) -> None:
    """Round-1 secondary config: 30k vocab, ~300k bigrams."""
    rng = np.random.RandomState(42)
    vocab = _vocab(rng, LM2_VOCAB)
    ids = rng.randint(0, len(vocab), size=(LM2_BIGRAMS, 2))
    words = TRANSCRIPT.split()
    with open(path, "w") as fh:
        fh.write("\\data\\\n")
        fh.write(f"ngram 1={len(vocab) + 3}\n")
        fh.write(f"ngram 2={LM2_BIGRAMS + len(words) - 1}\n\n")
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
        lines = []
        for i, j in ids:
            a, b = vocab[i], vocab[j]
            if (a, b) not in seen:
                seen.add((a, b))
                lines.append(f"-2.0\t{a} {b}\n")
        fh.writelines(lines)
        fh.write("\n\\end\\\n")


def _cached_arpa(name: str, maker) -> str:
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, name)
    if not os.path.exists(path):
        maker(path)
    return path


def _time_device(dev, batch, audio_sec, reps=3, **kwargs):
    texts = dev.decode_batch(batch, **kwargs)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        texts = dev.decode_batch(batch, **kwargs)
    dt = (time.perf_counter() - t0) / reps
    return texts, dt, len(batch) * audio_sec / dt


def main() -> None:
    import jax

    from pyctcdecode_tpu.alphabet import Alphabet
    from pyctcdecode_tpu.decoder import BeamSearchDecoderCTC
    from pyctcdecode_tpu.models.language_model import LanguageModel
    from pyctcdecode_tpu.models.native import open_ngram_file
    from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC

    jax_cache = os.path.join(CACHE_DIR, "jax")
    os.makedirs(jax_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", jax_cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if os.path.exists(SAMPLE):
        with open(SAMPLE) as fh:
            logits = np.array(json.load(fh), dtype=np.float32)
    else:  # synthetic stand-in with the same shape statistics
        rng = np.random.RandomState(0)
        logits = rng.randn(371, len(LIBRI_LABELS)).astype(np.float32) * 3.0

    alphabet = Alphabet.build_alphabet(LIBRI_LABELS)
    arpa = _cached_arpa("bench_parity_3gram.arpa", _make_parity_arpa)

    host = BeamSearchDecoderCTC(alphabet, LanguageModel(open_ngram_file(arpa)))
    dev = TPUBeamSearchDecoderCTC(alphabet, LanguageModel(open_ngram_file(arpa)))

    batch = [logits] * BATCH
    audio_sec = logits.shape[0] * FRAME_SEC

    # --- host single-process baseline (time a few, like the ref notebook;
    # repeated decoding of one utterance keeps the host LM caches warm, which
    # flatters the host baseline rather than the device)
    n_host = 3
    host.decode(logits, beam_width=BEAM_WIDTH)  # warm caches
    t0 = time.perf_counter()
    for _ in range(n_host):
        host.decode(logits, beam_width=BEAM_WIDTH)
    host_tput = n_host * audio_sec / (time.perf_counter() - t0)

    # --- device batch decode at the parity config
    kwargs = dict(beam_width=BEAM_WIDTH, max_tokens_per_frame=K_TOKENS)
    texts, dev_dt, dev_tput = _time_device(dev, batch, audio_sec, **kwargs)
    sanity = texts[0] == host.decode(logits, beam_width=BEAM_WIDTH)

    # --- pipelined steady-state throughput (the serving pattern): keep one
    # batch in flight so host prep/post-process and the relay transfers
    # overlap the device run. Warm with a short stream first, then time a
    # longer one discounting its first (un-overlapped) batch.
    for out in dev.decode_beams_batches([batch] * 2, top_n=1, **kwargs):
        pass
    n_stream = 5
    stream = dev.decode_beams_batches([batch] * n_stream, top_n=1, **kwargs)
    next(stream)  # spin-up: first batch has nothing to overlap with
    t0 = time.perf_counter()
    for out in stream:
        pass
    stream_dt = (time.perf_counter() - t0) / (n_stream - 1)
    stream_tput = len(batch) * audio_sec / stream_dt

    # --- blank collapse (opt-in, exactness-preserving at the call's
    # token_min_logp): real CTC emissions are blank-dominated, so dropping
    # blank-certain frames multiplies throughput at identical output
    texts_bc, bc_dt, bc_tput = _time_device(
        dev, batch, audio_sec, blank_collapse=True, **kwargs
    )

    detail = {
        "blank_collapse": {
            "audio_sec_per_s": round(bc_tput, 2),
            "batch_latency_s": round(bc_dt, 4),
            "texts_match_full": texts_bc == texts,
        },
        "batch": BATCH,
        "beam_width": BEAM_WIDTH,
        "k_tokens": K_TOKENS,
        "frames": int(logits.shape[0]),
        "lm": f"3-gram, {LM_VOCAB} vocab, ~{LM_BIGRAMS} bigrams + {LM_TRIGRAMS} trigrams",
        "host_audio_sec_per_s": round(host_tput, 2),
        "oneshot_batch_latency_s": round(dev_dt, 4),
        "oneshot_audio_sec_per_s": round(dev_tput, 2),
        "pipelined_batch_latency_s": round(stream_dt, 4),
        "pipelined_audio_sec_per_s": round(stream_tput, 2),
        "top1_matches_host": bool(sanity),
        "backend": jax.devices()[0].platform,
    }

    if RUN_SECONDARY:
        arpa2 = _cached_arpa("bench_2gram.arpa", _make_2gram_arpa)
        dev2 = TPUBeamSearchDecoderCTC(
            alphabet, LanguageModel(open_ngram_file(arpa2))
        )
        _, dt2, tput2 = _time_device(
            dev2, batch, audio_sec, beam_width=50, max_tokens_per_frame=K_TOKENS
        )
        detail["secondary_2gram_beam50"] = {
            "audio_sec_per_s": round(tput2, 2),
            "device_batch_latency_s": round(dt2, 4),
        }

    print(
        json.dumps(
            {
                "metric": "decode_throughput",
                "value": round(stream_tput, 2),
                "unit": "audio_sec/s/chip",
                "vs_baseline": round(stream_tput / host_tput, 2),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
