"""Mesh scaling measurement: DP throughput across device counts.

BASELINE.md's scaling row asks for measurements at 1 chip / 1 host /
N hosts. This harness measures the data-parallel decode throughput of
:class:`~pyctcdecode_tpu.parallel.ShardedCTCDecoder` across mesh sizes
and prints one JSON line per size plus a scaling-efficiency summary.

On real hardware, run it on the pod slice directly (the mesh picks up
all visible devices; for multi-host launch see
``pyctcdecode_tpu/parallel/launch.py``). In this repository's
environment only one real chip is reachable, so the default mode
demonstrates the measurement path on a virtual CPU mesh
(``--virtual N`` forces ``xla_force_host_platform_device_count``) —
virtual-device numbers exercise the sharding/collective code but are
NOT hardware throughput. Throughputs within one run are comparable to
each other (fixed per-device batch, same programs); the absolute
audio-s/s only means something on real chips.

Usage::

    python scripts/scaling_bench.py --virtual 8   # CPU-mesh demo
    python scripts/scaling_bench.py               # real devices
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (demo mode)")
    ap.add_argument("--per-device-batch", type=int, default=8)
    ap.add_argument("--beam-width", type=int, default=25)
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from pyctcdecode_tpu.alphabet import Alphabet
    from pyctcdecode_tpu.parallel import ShardedCTCDecoder, make_data_mesh
    from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC

    labels = [" "] + list("abcdefghijklmnopqrstuvwxyz") + [""]
    dec = TPUBeamSearchDecoderCTC(Alphabet.build_alphabet(labels))
    rng = np.random.RandomState(0)
    logits = rng.randn(args.frames, len(labels)).astype(np.float32) * 2.0
    frame_sec = 0.02

    all_devices = jax.devices()
    sizes = []
    n = 1
    while n <= len(all_devices):
        sizes.append(n)
        n *= 2
    results = []
    for size in sizes:
        mesh = make_data_mesh(n_devices=size)
        sharded = ShardedCTCDecoder(dec, mesh=mesh)
        batch = [logits] * (args.per_device_batch * size)
        kwargs = dict(beam_width=args.beam_width)
        sharded.decode_batch(batch, **kwargs)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            sharded.decode_batch(batch, **kwargs)
        dt = (time.perf_counter() - t0) / args.reps
        tput = len(batch) * args.frames * frame_sec / dt
        results.append((size, tput))
        print(json.dumps({
            "metric": "dp_scaling",
            "devices": size,
            "batch": len(batch),
            "audio_sec_per_s": round(tput, 2),
            "backend": all_devices[0].platform,
            "virtual": bool(args.virtual),
        }))
    base = results[0][1]
    print(json.dumps({
        "metric": "dp_scaling_efficiency",
        "per_size": {
            str(size): round(tput / (base * size), 3)
            for size, tput in results
        },
        "note": "1.0 = perfect linear scaling vs the 1-device run",
    }))


if __name__ == "__main__":
    main()
