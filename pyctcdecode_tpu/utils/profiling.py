"""Device profiling helpers: trace a decode and summarize per-op TPU time.

The reference has no profiling story (manual ``time.time()`` loops in its
notebooks); a TPU framework needs one, because the decode scan's cost
structure (gather-bound probes vs elementwise bookkeeping) is invisible
from wall-clock numbers. This module wraps the working recipe for this
stack:

1. run the workload under ``jax.profiler.trace(logdir)``;
2. parse the written ``*.xplane.pb`` protobuf (via the bundled
   ``tensorflow.tsl`` profiler protos — ``tensorboard_plugin_profile``'s own
   package lacks ``xplane_pb2``);
3. read the device plane's "XLA Ops" line: per-op totals plus the
   interval-union busy time (async copies overlap, so the naive sum
   double-counts).

Typical use::

    from pyctcdecode_tpu.utils.profiling import profile_call
    report = profile_call(lambda: decoder.decode_batch(batch, beam_width=100))
    print(report.table(top=20))
"""
from __future__ import annotations

import dataclasses
import glob
import os
import tempfile
from typing import Callable, Dict, List, Optional, Tuple


@dataclasses.dataclass
class OpTime:
    """Aggregated device time of one XLA op."""

    name: str
    total_ms: float
    share: float  # fraction of the summed per-op time (overlap-inclusive)


@dataclasses.dataclass
class TraceReport:
    """Parsed device timing of one traced region."""

    plane: str
    busy_ms: float  # interval-union device busy time
    summed_ms: float  # per-op sum (double-counts overlapped async copies)
    ops: List[OpTime]

    def table(self, top: int = 20) -> str:
        """Human-readable top-N op table."""
        lines = [
            f"device plane: {self.plane}",
            f"busy {self.busy_ms:.1f} ms (op-sum {self.summed_ms:.1f} ms)",
        ]
        for op in self.ops[:top]:
            lines.append(f"{op.total_ms:9.2f} ms {100 * op.share:5.1f}%  {op.name[:90]}")
        return "\n".join(lines)

    def grouped(self, buckets: Dict[str, Tuple[str, ...]]) -> Dict[str, float]:
        """Sum op time into caller-defined buckets by substring match."""
        out = {name: 0.0 for name in buckets}
        out["other"] = 0.0
        for op in self.ops:
            for name, needles in buckets.items():
                if any(n in op.name for n in needles):
                    out[name] += op.total_ms
                    break
            else:
                out["other"] += op.total_ms
        return {k: round(v, 2) for k, v in out.items()}


def summarize_xplane(logdir: str) -> List[TraceReport]:
    """Parse every device plane's XLA-op timings from a profiler logdir."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}; did the trace run?")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as fh:
        space.ParseFromString(fh.read())
    reports: List[TraceReport] = []
    for plane in space.planes:
        if "TPU" not in plane.name and "GPU" not in plane.name:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            totals: Dict[str, int] = {}
            intervals: List[Tuple[int, int]] = []
            for ev in line.events:
                name = meta[ev.metadata_id].name
                totals[name] = totals.get(name, 0) + ev.duration_ps
                intervals.append((ev.offset_ps, ev.offset_ps + ev.duration_ps))
            intervals.sort()
            busy = 0
            cur_s: Optional[int] = None
            cur_e = 0
            for s, e in intervals:
                if cur_s is None:
                    cur_s, cur_e = s, e
                elif s <= cur_e:
                    cur_e = max(cur_e, e)
                else:
                    busy += cur_e - cur_s
                    cur_s, cur_e = s, e
            if cur_s is not None:
                busy += cur_e - cur_s
            summed = sum(totals.values())
            ops = [
                OpTime(name=k, total_ms=v / 1e9, share=(v / summed if summed else 0.0))
                for k, v in sorted(totals.items(), key=lambda kv: -kv[1])
            ]
            reports.append(
                TraceReport(
                    plane=plane.name,
                    busy_ms=busy / 1e9,
                    summed_ms=summed / 1e9,
                    ops=ops,
                )
            )
    if not reports:
        raise RuntimeError(
            f"no device plane with an 'XLA Ops' line found under {logdir} "
            "(CPU-only runs produce no device plane)"
        )
    return reports


def profile_call(
    fn: Callable[[], object], logdir: Optional[str] = None
) -> TraceReport:
    """Trace one call of ``fn`` and return the (first) device plane report.

    The result of ``fn`` is block-until-ready'd so async dispatch is
    captured inside the trace window.
    """
    import jax

    own_dir = logdir is None
    logdir = logdir or tempfile.mkdtemp(prefix="pyctcdecode_tpu_prof_")
    with jax.profiler.trace(logdir):
        out = fn()
        jax.block_until_ready(out)
    try:
        return summarize_xplane(logdir)[0]
    finally:
        if own_dir:
            import shutil

            shutil.rmtree(logdir, ignore_errors=True)


