"""Profile the segmented batch decode at the bench parity config on TPU.

Prints the top-op table and a bucketed summary so the next optimization
target is visible. Run alone (serialize TPU jobs).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np

import bench as B


def main() -> None:
    import jax

    from pyctcdecode_tpu.alphabet import Alphabet
    from pyctcdecode_tpu.models.language_model import LanguageModel
    from pyctcdecode_tpu.models.native import open_ngram_file
    from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC
    from pyctcdecode_tpu.utils.profiling import profile_call

    jax_cache = os.path.join(B.CACHE_DIR, "jax")
    os.makedirs(jax_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", jax_cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    with open(B.SAMPLE) as fh:
        logits = np.array(json.load(fh), dtype=np.float32)
    alphabet = Alphabet.build_alphabet(B.LIBRI_LABELS)
    arpa = B._cached_arpa("bench_parity_3gram.arpa", B._make_parity_arpa)
    seg = int(os.environ.get("PROF_SEG", "16"))
    dev = TPUBeamSearchDecoderCTC(
        alphabet, LanguageModel(open_ngram_file(arpa)), segment_frames=seg
    )
    batch = [logits] * B.BATCH
    kwargs = dict(beam_width=B.BEAM_WIDTH, max_tokens_per_frame=B.K_TOKENS)

    t0 = time.perf_counter()
    dev.decode_batch(batch, **kwargs)  # compile + warm
    print(f"warm call: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    dev.decode_batch(batch, **kwargs)
    wall = time.perf_counter() - t0
    print(f"steady call: {wall:.3f}s", flush=True)

    report = profile_call(lambda: dev.decode_batch(batch, **kwargs))
    print(report.table(top=40))
    buckets = {
        "gather": ("gather", "dynamic-slice"),
        "scatter": ("scatter", "dynamic-update"),
        "sort/topk": ("sort", "top-k", "topk"),
        "reduce": ("reduce",),
        "fusion": ("fusion",),
        "copy/transpose": ("copy", "transpose", "bitcast"),
        "dot": ("dot", "convolution"),
    }
    print(json.dumps(report.grouped(buckets), indent=1))
    print(f"busy {report.busy_ms:.1f} ms of wall {wall * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
