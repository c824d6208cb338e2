"""Worker for the 2-process distributed decode test (run via subprocess).

Each process brings up ``jax.distributed`` from ``PYCTC_*`` env vars
(parallel/launch.py), decodes the same global batch through
``ShardedCTCDecoder.decode_beams_batch_multiprocess`` over the global
2x4-virtual-CPU-device mesh, and writes its shard's results to
``sys.argv[1]`` as JSON for the parent test to assemble and compare.
"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

from pyctcdecode_tpu.alphabet import Alphabet
from pyctcdecode_tpu.models.language_model import LanguageModel
from pyctcdecode_tpu.models.ngram import NGramModel
from pyctcdecode_tpu.parallel import ShardedCTCDecoder, make_data_mesh
from pyctcdecode_tpu.parallel.launch import initialize_from_env
from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC

ARPA = "/root/reference/pyctcdecode/tests/sample_data/bugs_bunny_kenlm.arpa"


def main() -> None:
    out_path = sys.argv[1]
    assert initialize_from_env(), "PYCTC_* env vars must be set"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    rng = np.random.RandomState(11)
    labels = [" ", "b", "g", "n", "s", "u", "y", ""]
    batch = [
        np.log(
            rng.dirichlet(np.ones(len(labels)) * 0.35, size=t).astype(
                np.float32
            )
        )
        for t in (17, 9, 23, 12, 20, 7)
    ]
    alphabet = Alphabet.build_alphabet(labels)
    lm = LanguageModel(NGramModel.from_file(ARPA), ["bugs", "bunny"])
    dec = TPUBeamSearchDecoderCTC(alphabet, lm)
    sharded = ShardedCTCDecoder(dec, mesh=make_data_mesh())
    results, (start, stop) = sharded.decode_beams_batch_multiprocess(
        batch, beam_width=12, top_n=3
    )
    payload = {
        "process": jax.process_index(),
        "start": start,
        "stop": stop,
        "beams": [
            [
                {
                    "text": b.text,
                    "logit_score": b.logit_score,
                    "lm_score": b.lm_score,
                }
                for b in utt
            ]
            for utt in results
        ],
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh)
    print("worker done", flush=True)


if __name__ == "__main__":
    main()
