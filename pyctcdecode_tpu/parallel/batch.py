"""Data-parallel batch decoding over a ``jax.sharding.Mesh``.

The reference's entire distribution story is a fork-only
``multiprocessing.Pool`` mapping utterances to processes, with the LM shared
by copy-on-write (ref ``decoder.py:146-157, 777-945``). The TPU-native
equivalent here shards the *utterance batch* across a device mesh with
``shard_map``: every chip runs the vmapped decode scan on its shard, LM
tables are replicated per chip (they are read-only arrays), and corpus
metrics aggregate with ``psum`` collectives instead of host reduction.

The semantic contract preserved from the reference: per-utterance decoding
is independent and deterministic, so the sharded result is element-wise
identical to single-device decoding.

For multi-host pods this module relies on ``jax.distributed`` having been
initialized by the launcher; each host feeds its local shard of the batch
(standard JAX SPMD data loading).
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from ..constants import (
    DEFAULT_BEAM_WIDTH,
    DEFAULT_HOTWORD_WEIGHT,
    DEFAULT_MIN_TOKEN_LOGP,
    DEFAULT_PRUNE_BEAMS,
    DEFAULT_PRUNE_LOGP,
)
from ..engine import make_decode_fn
from ..tpu_decoder import (
    TPUBeamSearchDecoderCTC,
    _auto_k,
    _bucket,
    normalize_host_batch,
)

logger = logging.getLogger(__name__)


def make_data_mesh(n_devices: Optional[int] = None, axis: str = "data") -> "object":
    """1-D device mesh over the first ``n_devices`` (default: all) devices."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def all_reduce_counts(mesh: "object", per_shard_counts: np.ndarray, axis: str = "data") -> np.ndarray:
    """``psum`` per-shard integer counters (e.g. WER edits/words) over a mesh.

    ``per_shard_counts``: ``[n_devices, m]`` — row *i* holds shard *i*'s local
    counters (e.g. ``(edit_distance, ref_words)`` from
    :func:`~pyctcdecode_tpu.utils.metrics.wer_numerator_denominator`).
    Returns the ``[m]`` global sums. This is the collective analog of the
    reference notebooks' host-side WER aggregation, riding ICI instead of a
    driver process.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    arr = jnp.asarray(np.asarray(per_shard_counts, dtype=np.int32))
    if arr.ndim != 2 or arr.shape[0] != mesh.devices.size:
        raise ValueError(
            f"per_shard_counts must be [n_devices, m]; got {arr.shape} for "
            f"{mesh.devices.size} devices"
        )

    def _reduce(x):
        return jax.lax.psum(x[0], axis)

    out = shard_map(
        _reduce,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=P(),
    )(arr)
    return np.asarray(out)


class ShardedCTCDecoder:
    """Batch CTC decoding sharded over a device mesh (data parallelism).

    Wraps a :class:`TPUBeamSearchDecoderCTC`; the global batch is padded to
    ``n_devices * per_device_batch`` and scanned in one ``shard_map``-mapped
    program. Host post-processing (backtrace + replay) is unchanged.

    ``shard_lm=True`` additionally row-shards the n-gram slot planes over
    the same mesh axis, so each chip holds ``1/n_devices`` of the LM hash
    table and probes run as ICI collectives (all_gather keys, psum values).
    Decodes are element-wise identical to the replicated layout; use it
    when the LM exceeds a single chip's HBM, since every probe then pays
    two small collectives.
    """

    def __init__(
        self,
        decoder: TPUBeamSearchDecoderCTC,
        mesh=None,
        axis: str = "data",
        shard_lm: bool = False,
    ) -> None:
        self._decoder = decoder
        self._mesh = mesh if mesh is not None else make_data_mesh()
        self._axis = axis
        self._shard_lm = bool(shard_lm) and bool(decoder._device_lm)
        self._fn_cache: Dict[Any, Any] = {}
        if self._shard_lm:
            import jax.numpy as jnp

            from ..engine import build_table_args

            self._tabs = build_table_args(
                jnp,
                decoder._tokens,
                decoder._device_lm,
                shard=(axis, self.n_devices),
            )
        else:
            self._tabs = decoder._tabs
        # commit every table leaf to its mesh sharding ONCE: the shard
        # branch of build_table_args returns host numpy planes, and jit
        # does not cache host inputs across calls — without this, every
        # decode re-uploaded the (potentially multi-GB) LM planes
        import jax
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        specs = self._tabs_specs()
        if not isinstance(specs, P):
            self._tabs = jax.tree_util.tree_map(
                lambda leaf, spec: jax.device_put(
                    leaf, NamedSharding(self._mesh, spec)
                ),
                self._tabs,
                specs,
            )

    @property
    def mesh(self) -> "object":
        return self._mesh

    @property
    def n_devices(self) -> int:
        return int(self._mesh.devices.size)

    def _get_fn(
        self,
        t_pad: int,
        beam_width: int,
        k: int,
        prune_history: bool,
        use_hotwords: bool = False,
        emit_paths: Optional[int] = None,
        collect_stats: bool = False,
        token_timeline: bool = False,
    ):
        import jax
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        key = (
            t_pad, beam_width, k, prune_history, use_hotwords, emit_paths,
            collect_stats, token_timeline,
        )
        fn = self._fn_cache.get(key)
        if fn is None:
            d = self._decoder
            cfg = d._engine_cfg(
                beam_width, k, prune_history, use_hotwords, emit_paths,
                collect_stats=collect_stats, token_timeline=token_timeline,
            )
            axis = self._axis
            shard = (axis, self.n_devices) if self._shard_lm else None
            raw = make_decode_fn(cfg, d._tokens, d._device_lm, shard=shard)
            vfn = jax.vmap(raw, in_axes=(0, 0, None, None, None, None))
            fn = jax.jit(
                shard_map(
                    vfn,
                    mesh=self._mesh,
                    in_specs=(
                        P(axis),
                        P(axis),
                        P(),
                        P(),
                        self._tabs_specs(),
                        P(),
                    ),
                    out_specs=P(axis),
                    check_vma=False,
                )
            )
            self._fn_cache[key] = fn
        return fn

    def _tabs_specs(self):
        """Partition specs for the table pytree.

        Everything is replicated except, under ``shard_lm``, each n-gram
        table's ``bucket`` plane, whose leading (shard) axis is
        partitioned over the mesh.
        """
        import jax
        from jax.sharding import PartitionSpec as P

        if not self._shard_lm:
            return P()
        axis = self._axis

        def spec(path, leaf):
            names = [
                p.key for p in path if isinstance(p, jax.tree_util.DictKey)
            ]
            if names and names[-1] == "bucket" and "fp" in names:
                return P(axis)
            return P()

        return jax.tree_util.tree_map_with_path(spec, self._tabs)

    def decode_beams_batch(
        self,
        logits_list: Sequence[np.ndarray],
        beam_width: int = DEFAULT_BEAM_WIDTH,
        beam_prune_logp: float = DEFAULT_PRUNE_LOGP,
        token_min_logp: float = DEFAULT_MIN_TOKEN_LOGP,
        prune_history: bool = DEFAULT_PRUNE_BEAMS,
        hotwords: "object" = None,
        hotword_weight: float = DEFAULT_HOTWORD_WEIGHT,
        max_tokens_per_frame: Optional[Union[int, str]] = None,
        top_n: Optional[int] = None,
        collect_stats: bool = False,
        blank_collapse: bool = False,
        token_chunking: Optional[int] = None,
    ) -> "object":
        """Decode a global batch sharded over the mesh; ragged inputs padded.

        With ``collect_stats=True`` returns ``(results, stats)`` — one
        on-device counter dict per utterance, same schema as
        :meth:`~pyctcdecode_tpu.tpu_decoder.TPUBeamSearchDecoderCTC.decode_beams_batch`.
        ``token_chunking`` selects token-timeline decoding exactly as on
        the single-chip engine (the timeline arrays shard over the batch
        axis like the logits they replace).
        """
        import jax.numpy as jnp

        if not logits_list:
            return []
        d = self._decoder
        hot, weight, _ = d._hot_tables(hotwords, hotword_weight)
        v = len(d._labels)
        for mat in logits_list:
            if mat.ndim != 2 or mat.shape[1] != v:
                raise ValueError(
                    f"Input logits of shape {mat.shape}, but vocabulary "
                    f"is size {v}"
                )
        frame_ids_list = offsets = None
        if blank_collapse:
            from ..utils.logits import normalize_collapse_batch

            collapsed, frame_ids_list, offsets = normalize_collapse_batch(
                logits_list, d._blank_id, token_min_logp
            )
            lens = [c.shape[0] for c in collapsed]
        else:
            lens = [m.shape[0] for m in logits_list]
        n = len(logits_list)
        n_dev = self.n_devices
        if token_chunking:
            from ..utils.logits import normalize_batch, token_timeline_batch

            k = 5 if token_chunking is True else int(token_chunking)
            mats = (
                collapsed
                if blank_collapse
                else normalize_batch(logits_list)
            )
            tls, vlens_arr = token_timeline_batch(mats, token_min_logp, k)
            lens = [int(x) for x in vlens_arr]
            t_pad = _bucket(max(max(lens), 1))
            per_dev = (n + n_dev - 1) // n_dev
            n_pad = per_dev * n_dev
            v_lab = len(d._labels)
            tok_dt = (
                np.int8 if v_lab <= 127 else
                (np.int16 if v_lab <= 32_767 else np.int32)
            )
            toks = np.full((n_pad, t_pad, k), -1, dtype=tok_dt)
            tlogp = np.zeros((n_pad, t_pad, k), dtype=np.float32)
            fin = np.zeros((n_pad, t_pad), dtype=np.int8)
            vf_ids: list = []
            for i, (tk, tp, fi, cb, fids) in enumerate(tls):
                tv = tk.shape[0]
                toks[i, :tv] = tk
                tlogp[i, :tv] = tp
                fin[i, :tv] = fi
                if frame_ids_list is not None:
                    vf_ids.append(np.asarray(frame_ids_list[i])[fids])
                else:
                    vf_ids.append(fids.astype(np.int64))
            frame_ids_list = vf_ids
            logp_in = tuple(
                jnp.asarray(a) for a in (toks, tlogp, fin)
            )
        else:
            t_pad = _bucket(max(max(lens), 1))
            per_dev = (n + n_dev - 1) // n_dev
            n_pad = per_dev * n_dev
            logp = np.zeros((n_pad, t_pad, v), dtype=np.float32)
            if blank_collapse:
                for i, cl in enumerate(collapsed):
                    logp[i, : cl.shape[0]] = cl
            else:
                logp[:n] = normalize_host_batch(logits_list, t_pad, v)
            logp_in = jnp.asarray(logp)
        n_frames = np.zeros(n_pad, dtype=np.int32)
        n_frames[:n] = lens
        if token_chunking:
            pass  # k already set; admission is exact by construction
        elif max_tokens_per_frame == "auto":
            counts = (logp >= token_min_logp).sum(-1)
            alive = np.arange(t_pad)[None, :] < n_frames[:, None]
            k = _auto_k(np.where(alive, counts, 1), v)
        else:
            k = v if max_tokens_per_frame is None else min(max_tokens_per_frame, v)
        fn = self._get_fn(
            t_pad,
            beam_width,
            k,
            prune_history,
            use_hotwords=hot is not None,
            emit_paths=(min(top_n, beam_width) if top_n is not None else None),
            collect_stats=collect_stats,
            token_timeline=bool(token_chunking),
        )
        params = d._params_vector(token_min_logp, beam_prune_logp, weight)
        start = d._start_ctx(None)
        out = fn(
            logp_in,
            jnp.asarray(n_frames),
            jnp.asarray(params),
            start,
            self._tabs,
            hot,
        )
        out = dict(out)
        stats_dev = out.pop("stats", None)
        host = {
            key: (
                tuple(np.asarray(v) for v in val)
                if isinstance(val, tuple)
                else np.asarray(val)
            )
            for key, val in out.items()
        }
        results = []
        for i in range(n):
            one = {
                key: (
                    tuple(v[i] for v in val) if isinstance(val, tuple) else val[i]
                )
                for key, val in host.items()
            }
            results.append(
                d._build_outputs(
                    one,
                    n_frames=lens[i],
                    top_n=top_n,
                    frame_ids=(
                        frame_ids_list[i] if frame_ids_list is not None else None
                    ),
                    score_offset=offsets[i] if offsets is not None else 0.0,
                )
            )
        if collect_stats:
            from ..engine import stats_fields

            cfg = d._engine_cfg(
                beam_width, k, prune_history, hot is not None,
                (min(top_n, beam_width) if top_n is not None else None),
                collect_stats=True,
            )
            names = stats_fields(cfg)
            per_utt = np.asarray(stats_dev)[:n]
            return results, [dict(zip(names, row.tolist())) for row in per_utt]
        return results

    def decode_beams_batch_multiprocess(
        self,
        global_logits_list: Sequence[np.ndarray],
        beam_width: int = DEFAULT_BEAM_WIDTH,
        beam_prune_logp: float = DEFAULT_PRUNE_LOGP,
        token_min_logp: float = DEFAULT_MIN_TOKEN_LOGP,
        prune_history: bool = DEFAULT_PRUNE_BEAMS,
        max_tokens_per_frame: Optional[Union[int, str]] = None,
        top_n: Optional[int] = None,
    ) -> "object":
        """SPMD decode across a multi-process (multi-host) global mesh.

        Every process passes the same ``global_logits_list`` (the usual JAX
        SPMD input contract: identical global view, each host materializes
        only its shard on device). Returns ``(results, (start, stop))``
        where ``results`` are the beam lists for this process's slice
        ``global_logits_list[start:stop]`` — cross-host output exchange is
        the caller's (launcher's) job, matching standard SPMD data loading.

        Requires ``jax.distributed`` to be up (see
        :mod:`pyctcdecode_tpu.parallel.launch`); on a single process it
        degrades to :meth:`decode_beams_batch` over the whole batch.
        """
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        if not global_logits_list:
            return [], (0, 0)
        if jax.process_count() == 1:
            res = self.decode_beams_batch(
                global_logits_list,
                beam_width=beam_width,
                beam_prune_logp=beam_prune_logp,
                token_min_logp=token_min_logp,
                prune_history=prune_history,
                max_tokens_per_frame=max_tokens_per_frame,
                top_n=top_n,
            )
            return res, (0, len(global_logits_list))

        d = self._decoder
        v = len(d._labels)
        if max_tokens_per_frame == "auto":
            raise ValueError(
                "the multi-process SPMD path compiles one program on every "
                "host before any local normalization; measure the corpus "
                "and pass an integer max_tokens_per_frame instead of 'auto'"
            )
        k = v if max_tokens_per_frame is None else min(max_tokens_per_frame, v)
        lens = [m.shape[0] for m in global_logits_list]
        t_pad = _bucket(max(lens))
        n = len(global_logits_list)
        n_dev = self.n_devices
        per_dev = (n + n_dev - 1) // n_dev
        n_pad = per_dev * n_dev
        # this process's contiguous row block (global device order is
        # process-grouped, so the mesh's data axis lays rows out this way)
        n_local_dev = len([dv for dv in self._mesh.devices.flat if dv.process_index == jax.process_index()])
        rows_per_proc = per_dev * n_local_dev
        row0 = rows_per_proc * jax.process_index()
        local_rows = min(rows_per_proc, max(0, n_pad - row0))
        logp_local = np.zeros((rows_per_proc, t_pad, v), dtype=np.float32)
        nf_local = np.zeros(rows_per_proc, dtype=np.int32)
        for i in range(local_rows):
            g = row0 + i
            if g < n:
                logp_local[i] = normalize_host_batch(
                    [global_logits_list[g]], t_pad, v
                )[0]
                nf_local[i] = lens[g]
        data_sh = NamedSharding(self._mesh, P(self._axis))
        logp_g = jax.make_array_from_process_local_data(data_sh, logp_local)
        nf_g = jax.make_array_from_process_local_data(data_sh, nf_local)
        fn = self._get_fn(
            t_pad, beam_width, k, prune_history,
            use_hotwords=False,
            emit_paths=(min(top_n, beam_width) if top_n is not None else None),
        )
        params = d._params_vector(token_min_logp, beam_prune_logp)
        start = d._start_ctx(None)
        out = fn(logp_g, nf_g, jnp.asarray(params), start, self._tabs, None)
        # outputs are data-sharded global arrays; keep only addressable rows
        local = {}
        for key, val in out.items():
            if isinstance(val, tuple):
                local[key] = tuple(self._local_rows(x) for x in val)
            else:
                local[key] = self._local_rows(val)
        g_start = min(row0, n)
        g_stop = min(row0 + rows_per_proc, n)
        results = []
        for g in range(g_start, g_stop):
            i = g - row0
            one = {
                key: (
                    tuple(x[i] for x in val) if isinstance(val, tuple) else val[i]
                )
                for key, val in local.items()
            }
            results.append(d._build_outputs(one, n_frames=lens[g], top_n=top_n))
        return results, (g_start, g_stop)

    @staticmethod
    def _local_rows(garr) -> np.ndarray:
        """Assemble this process's contiguous row block of a sharded array."""
        shards = sorted(
            garr.addressable_shards, key=lambda s: s.index[0].start or 0
        )
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    def decode_batch(
        self,
        logits_list: Sequence[np.ndarray],
        beam_width: int = DEFAULT_BEAM_WIDTH,
        beam_prune_logp: float = DEFAULT_PRUNE_LOGP,
        token_min_logp: float = DEFAULT_MIN_TOKEN_LOGP,
        hotwords: "object" = None,
        hotword_weight: float = DEFAULT_HOTWORD_WEIGHT,
        max_tokens_per_frame: Optional[Union[int, str]] = None,
    ) -> List[str]:
        """Sharded batch top-1 transcripts."""
        beams = self.decode_beams_batch(
            logits_list,
            beam_width=beam_width,
            beam_prune_logp=beam_prune_logp,
            token_min_logp=token_min_logp,
            prune_history=True,
            hotwords=hotwords,
            hotword_weight=hotword_weight,
            max_tokens_per_frame=max_tokens_per_frame,
            top_n=1,
        )
        return [b[0].text if b else "" for b in beams]
