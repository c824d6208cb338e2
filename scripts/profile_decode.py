"""Profile a device batch decode and print the per-op TPU time table.

    python scripts/profile_decode.py --beam 100 --batch 256 --k 16 \
        [--arpa /path/to/lm.arpa] [--top 25]

Uses the reference's libri_logits fixture (or synthetic logits when absent)
replicated into a batch; compiles + warms once, then traces a single timed
batch. See pyctcdecode_tpu/utils/profiling.py for the parsing recipe.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SAMPLE = "/root/reference/pyctcdecode/tests/sample_data/libri_logits.json"
LIBRI_LABELS = [" "] + list("abcdefghijklmnopqrstuvwxyz") + ["'"] + [""]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--beam", type=int, default=100)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--arpa", default=None)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default=None, help="keep the raw trace here")
    ap.add_argument("--fast-topk", action="store_true", dest="fast_topk")
    ap.add_argument(
        "--segment-frames", type=int, default=None, dest="segment_frames"
    )
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pyctcdecode_tpu.alphabet import Alphabet
    from pyctcdecode_tpu.models.language_model import LanguageModel
    from pyctcdecode_tpu.models.native import open_ngram_file
    from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC
    from pyctcdecode_tpu.utils.profiling import profile_call

    if os.path.exists(SAMPLE):
        with open(SAMPLE) as fh:
            logits = np.array(json.load(fh), dtype=np.float32)
    else:
        logits = np.random.RandomState(0).randn(371, len(LIBRI_LABELS)).astype(
            np.float32) * 3.0

    lm = None
    if args.arpa:
        lm = LanguageModel(open_ngram_file(args.arpa))
    dev = TPUBeamSearchDecoderCTC(
        Alphabet.build_alphabet(LIBRI_LABELS),
        lm,
        fast_topk=args.fast_topk,
        segment_frames=args.segment_frames,
    )
    batch = [logits] * args.batch
    kw = dict(beam_width=args.beam, max_tokens_per_frame=args.k)
    dev.decode_batch(batch, **kw)  # compile + warm
    report = profile_call(lambda: dev.decode_batch(batch, **kw),
                          logdir=args.logdir)
    print(report.table(top=args.top))


if __name__ == "__main__":
    main()
