"""Time the reference pyctcdecode package, single core, on the bench workload.

The throughput target (BASELINE.md: >=50x audio-seconds/s per chip) is
defined against single-core CPU decode with the reference library
(ref README.md:105-117, tutorials/03_eval_performance.ipynb cells 29-31).
This image ships neither ``kenlm`` nor ``pygtrie``, so the harness provides
same-speed-class stand-ins before importing the reference:

* ``kenlm`` -> a ctypes shim over this repo's C++ n-gram engine
  (``csrc/ctclm.cpp``): ``Model``/``State`` with the exact BaseScore call
  surface the reference uses (ref language_model.py:306-360). Both the real
  kenlm binding and this shim are a thin Python call into C++ hash-table
  lookups, so the reference's LM-bound decode speed is representative.
* ``pygtrie.CharTrie`` -> a nested-dict trie covering ``fromkeys``/
  ``has_node``/``__setitem__`` (pygtrie itself is a pure-Python dict walk).

Decodes are cross-checked against this repo's host parity engine, so the
baseline is verified to do the same work, not just run the same code.

Run standalone::

    python scripts/ref_baseline.py --beam 100 --n 3

or import :func:`time_reference` from ``bench.py``.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time
import types
import warnings
from typing import List, Optional, Tuple

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE_PATH = "/root/reference"


class _CharTrie:
    """Nested-dict trie with the pygtrie surface the reference touches."""

    _LEAF = "\0"

    def __init__(self) -> None:
        self._root: dict = {}

    @classmethod
    def fromkeys(cls, keys) -> "_CharTrie":
        trie = cls()
        for key in keys:
            trie[key] = True
        return trie

    def __setitem__(self, key: str, value) -> None:
        node = self._root
        for ch in key:
            node = node.setdefault(ch, {})
        node[self._LEAF] = value

    def _node(self, key: str) -> Optional[dict]:
        node = self._root
        for ch in key:
            nxt = node.get(ch)
            if nxt is None:
                return None
            node = nxt
        return node

    def has_node(self, key: str) -> int:
        """Nonzero when ``key`` is a stored word or a prefix of one."""
        node = self._node(key)
        if node is None:
            return 0
        return (1 if self._LEAF in node else 0) | (2 if len(node) > (self._LEAF in node) else 0)

    def __contains__(self, key: str) -> bool:
        node = self._node(key)
        return node is not None and self._LEAF in node

    def iterkeys(self, prefix: str = "", shallow: bool = False):
        """Words under ``prefix``, pre-order in child-insertion order.

        Matches pygtrie's traversal contract: the prefix's own key is
        yielded first when present, and ``shallow=True`` stops descending
        below any node that holds a key (the reference's HotwordScorer
        takes ``next(iterkeys(token, shallow=True))`` as the first/shortest
        completion, ref language_model.py:145).
        """
        node = self._node(prefix)
        if node is None:
            return

        def walk(text, cur):
            if self._LEAF in cur:
                yield text
                if shallow:
                    return
            for ch, nxt in cur.items():
                if ch != self._LEAF:
                    yield from walk(text + ch, nxt)

        yield from walk(prefix, node)


@functools.lru_cache(maxsize=8)
def _load_native(path: str):
    """One parsed ctclm model per ARPA path (shared by Model + unigrams)."""
    from pyctcdecode_tpu.csrc import NativeNGram

    return NativeNGram(os.path.abspath(path))


def _make_stub_modules() -> Tuple[types.ModuleType, types.ModuleType]:
    """Build fake ``kenlm`` and ``pygtrie`` modules backed by ctclm."""
    kenlm_mod = types.ModuleType("kenlm")

    class State:
        """Outgoing-context state, mutated in place like kenlm.State."""

        __slots__ = ("ctx",)

        def __init__(self) -> None:
            self.ctx: Tuple[int, ...] = ()

        def __copy__(self) -> "State":
            st = State()
            st.ctx = self.ctx
            return st

    class Model:
        """kenlm.Model call surface over the native ctclm engine."""

        def __init__(self, path: str) -> None:
            self._n = _load_native(path)
            self.order = self._n.order
            # kenlm exposes .path as bytes (the reference decodes it when
            # serializing, ref language_model.py:387)
            self.path = os.path.abspath(path).encode("utf-8")
            # preallocated ctypes-visible buffers: BaseScore is the
            # reference's hottest call, keep per-call overhead at the
            # binding level (one C call, no numpy allocation)
            w = max(self.order - 1, 1)
            self._w = w
            self._ctx = np.full(w, -1, dtype=np.int32)
            self._out_ctx = np.empty(w, dtype=np.int32)
            self._out_len = np.empty(1, dtype=np.int32)
            self._lib = self._n._lib
            self._h = self._n._h
            self._score = self._lib.ctclm_score

        def BeginSentenceWrite(self, state: State) -> None:
            state.ctx = (self._n.bos_id,)

        def NullContextWrite(self, state: State) -> None:
            state.ctx = ()

        def BaseScore(self, in_state: State, word: str, out_state: State) -> float:
            n = self._n
            wid = self._lib.ctclm_word_id(self._h, word.encode("utf-8"))
            if wid < 0:
                wid = n.unk_id
            ctx_t = in_state.ctx
            w = self._w
            use = ctx_t[-w:]
            k = len(use)
            ctx = self._ctx
            ctx[:] = -1
            if k:
                ctx[w - k:] = use
            score = self._score(
                self._h, ctx, k, np.int32(wid), self._out_ctx, self._out_len
            )
            m = int(self._out_len[0])
            out_state.ctx = tuple(int(v) for v in self._out_ctx[w - m:]) if m else ()
            return float(score)

        def __contains__(self, word: str) -> bool:
            return word in self._n

    kenlm_mod.State = State
    kenlm_mod.Model = Model

    pygtrie_mod = types.ModuleType("pygtrie")
    pygtrie_mod.CharTrie = _CharTrie
    return kenlm_mod, pygtrie_mod


def load_reference(ref_path: str = REFERENCE_PATH):
    """Import the reference package with the stand-in modules installed.

    Returns the module, or ``None`` when the reference checkout or the
    native engine is unavailable (callers fall back to the host engine).
    """
    if not os.path.isdir(os.path.join(ref_path, "pyctcdecode")):
        return None
    try:
        kenlm_mod, pygtrie_mod = _make_stub_modules()
    except Exception:
        return None
    sys.modules.setdefault("kenlm", kenlm_mod)
    sys.modules.setdefault("pygtrie", pygtrie_mod)
    if ref_path not in sys.path:
        sys.path.insert(0, ref_path)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        try:
            import pyctcdecode as ref  # noqa: PLC0415
        except Exception:
            return None
    if not getattr(ref, "__file__", "").startswith(ref_path):
        return None  # a different pyctcdecode shadowed the reference
    return ref


def build_reference_decoder(ref, labels: List[str], arpa: Optional[str],
                            alpha: Optional[float] = None,
                            beta: Optional[float] = None):
    """Reference ``BeamSearchDecoderCTC`` over the shimmed C++ LM."""
    unigrams = None
    if arpa is not None:
        model = _load_native(arpa)
        unigrams = [w for w in model.vocab_list()
                    if w not in ("<s>", "</s>", "<unk>")]
    kwargs = {}
    if alpha is not None:
        kwargs["alpha"] = alpha
    if beta is not None:
        kwargs["beta"] = beta
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return ref.build_ctcdecoder(labels, arpa, unigrams, **kwargs)


def time_reference(logits: np.ndarray, labels: List[str], arpa: Optional[str],
                   beam_width: int, n_reps: int = 3,
                   ref_path: str = REFERENCE_PATH):
    """Single-core reference decode timing on ``logits``.

    Returns ``(text, seconds_per_decode)`` or ``None`` when the reference
    cannot be loaded.
    """
    ref = load_reference(ref_path)
    if ref is None:
        return None
    decoder = build_reference_decoder(ref, labels, arpa)
    text = decoder.decode(logits, beam_width=beam_width)  # warm LM caches
    t0 = time.perf_counter()
    for _ in range(n_reps):
        text = decoder.decode(logits, beam_width=beam_width)
    return text, (time.perf_counter() - t0) / n_reps


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--beam", type=int, default=100)
    ap.add_argument("--n", type=int, default=3, help="timed repetitions")
    ap.add_argument("--arpa", default=None,
                    help="ARPA path (default: the bench parity 3-gram)")
    ap.add_argument("--no-lm", action="store_true")
    args = ap.parse_args()

    import bench

    if os.path.exists(bench.SAMPLE):
        with open(bench.SAMPLE) as fh:
            logits = np.array(json.load(fh), dtype=np.float32)
    else:
        rng = np.random.RandomState(0)
        logits = rng.randn(371, len(bench.LIBRI_LABELS)).astype(np.float32) * 3.0
    arpa = None
    if not args.no_lm:
        arpa = args.arpa or bench._cached_arpa(
            "bench_parity_3gram.arpa", bench._make_parity_arpa
        )
    out = time_reference(logits, bench.LIBRI_LABELS, arpa, args.beam, args.n)
    if out is None:
        print(json.dumps({"error": "reference unavailable"}))
        return
    text, sec = out
    audio = logits.shape[0] * bench.FRAME_SEC
    print(json.dumps({
        "reference_ms_per_utt": round(sec * 1e3, 2),
        "reference_audio_sec_per_s": round(audio / sec, 2),
        "beam_width": args.beam,
        "lm": bool(arpa),
        "text": text,
    }))


if __name__ == "__main__":
    main()
