"""Multi-process (multi-host) mesh bring-up for sharded decoding.

The reference scales across machines by running independent Python
processes, each with its own fork-pool and a copy-on-write LM (ref
``decoder.py:777-945``); there is no cross-machine coordination at all.
The TPU-native story is a single SPMD program over a global mesh: every
host process calls :func:`initialize_from_env`, after which
``jax.devices()`` is the *global* device list and
:class:`~pyctcdecode_tpu.parallel.batch.ShardedCTCDecoder` built on a
global mesh shards the utterance batch (and optionally the LM tables)
across all chips on all hosts, with collectives riding ICI/DCN instead of
a driver process.

Launcher contract (mirrors the standard JAX SPMD environment variables):

* ``PYCTC_COORDINATOR`` — ``host:port`` of process 0 (required when any
  of these variables are set).
* ``PYCTC_NUM_PROCESSES`` — total process count.
* ``PYCTC_PROCESS_ID`` — this process's rank in ``[0, num_processes)``.

On TPU pods where the runtime publishes its own topology (GKE/Cloud TPU
metadata), call ``jax.distributed.initialize()`` with no arguments
instead; this module only fills the gap for explicit launchers (SLURM
wrappers, ssh loops, the test harness).

Each process then feeds its *local* shard of the global batch — see
:func:`process_shard` — exactly like standard JAX SPMD data loading.
"""
from __future__ import annotations

import logging
import os
from typing import Optional, Sequence, Tuple

logger = logging.getLogger(__name__)

_ENV_COORD = "PYCTC_COORDINATOR"
_ENV_NPROC = "PYCTC_NUM_PROCESSES"
_ENV_PID = "PYCTC_PROCESS_ID"


def initialize_from_env(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize ``jax.distributed`` from args or ``PYCTC_*`` env vars.

    Returns ``True`` when a multi-process runtime was brought up, ``False``
    when no configuration is present (single-process mode — not an error,
    so library users can call this unconditionally at startup).
    """
    import jax

    coordinator = coordinator or os.environ.get(_ENV_COORD)
    if num_processes is None and _ENV_NPROC in os.environ:
        num_processes = int(os.environ[_ENV_NPROC])
    if process_id is None and _ENV_PID in os.environ:
        process_id = int(os.environ[_ENV_PID])
    if coordinator is None and num_processes is None and process_id is None:
        return False
    if coordinator is None or num_processes is None or process_id is None:
        raise ValueError(
            "incomplete multi-process configuration: need all three of "
            f"{_ENV_COORD}, {_ENV_NPROC}, {_ENV_PID} (or the matching "
            "arguments), got "
            f"coordinator={coordinator!r} num_processes={num_processes!r} "
            f"process_id={process_id!r}"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "distributed runtime up: process %d/%d, %d global / %d local devices",
        process_id,
        num_processes,
        len(jax.devices()),
        len(jax.local_devices()),
    )
    return True


def process_shard(n_items: int) -> Tuple[int, int]:
    """This process's ``[start, stop)`` slice of a global batch of ``n_items``.

    Contiguous block partitioning in process order, matching the device
    order of :func:`~pyctcdecode_tpu.parallel.batch.make_data_mesh` (JAX
    global device lists are grouped by process). The last process absorbs
    the remainder.
    """
    import jax

    nproc = jax.process_count()
    rank = jax.process_index()
    per = (n_items + nproc - 1) // nproc
    start = min(rank * per, n_items)
    return start, min(start + per, n_items)


def local_batch(global_batch: Sequence, pad_to_multiple: bool = True) -> "object":
    """Slice a host-resident global batch down to this process's shard.

    Every process must pass the same ``global_batch`` ordering. With
    ``pad_to_multiple`` the slice is padded by repeating its last element
    so all processes contribute equal-size shards (required for a global
    ``shard_map`` batch axis); callers drop the padded tail by counting
    ``min(len(shard), stop - start)`` real items.
    """
    start, stop = process_shard(len(global_batch))
    shard = list(global_batch[start:stop])
    if pad_to_multiple:
        import jax

        per = (len(global_batch) + jax.process_count() - 1) // jax.process_count()
        while len(shard) < per and shard:
            shard.append(shard[-1])
        if not shard and len(global_batch):
            shard = [global_batch[0]] * per
    return shard
