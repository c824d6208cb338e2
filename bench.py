"""Benchmark: device batch beam-search throughput vs single-core CPU decode.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology (the reference's own, ref tutorials/03_eval_performance.ipynb
cells 29-31: decode a corpus of distinct utterances single-process and
report runtime): a reproducible synthetic corpus of ``BATCH`` distinct
utterances at the parity configuration — beam width 100, an order-3 LM at
realistic scale (~200k-word vocabulary, ~1.5M bigrams + ~1.1M trigrams;
synthesized because the container has no network access, with the same
shape statistics as the pruned LibriSpeech 3-gram).

CPU decode cost is strongly data-dependent (confident frames admit one
token; noisy frames admit many), so corpus difficulty is pinned to the
reference's own benchmark split: LibriSpeech dev-other, where the
reference publishes greedy WER 10.08% (ref 03_eval_performance.ipynb cell
25). The headline corpus is calibrated so greedy argmax decoding scores
~10% WER (noise=1.7 below: 9.8% measured), with blank statistics matched
to real CTC emissions (36% blank-certain frames vs 39% in the reference's
Wav2Vec2 fixture). On this corpus the shimmed reference package measures
~96 ms per 7-s utterance single-core — the same speed class as its
published 0-80 ms/sample dev-other sweep. A second, easier corpus
calibrated to the fixture itself (1.1 tokens/frame admitted) is reported
in ``detail.easy_corpus`` to show the data-dependence both ways.

Baseline (``vs_baseline``): the ACTUAL reference package at
/root/reference, decoding the same utterances single-process with a C++
n-gram backend (this repo's ctclm engine behind a kenlm-API shim — the
same speed class as the kenlm binding the reference deploys with; see
scripts/ref_baseline.py). Its transcripts are cross-checked against this
repo's host parity engine, so the baseline demonstrably does the same
work. When the reference checkout is absent, the host parity engine stands
in and ``detail.baseline`` says so.

The metric is decoded audio-seconds per wall-clock second per chip
(frame stride 0.02 s — the Wav2Vec2/QuartzNet CTC frame rate). The
headline is the serving configuration: pipelined batches (one in flight),
length bucketing (one program per frame bucket), and blank collapse —
all output-exact. Exactness is verified in-run against the host parity
engine (the bit-parity oracle) on the baseline subset; on mismatch the
run reports ``device_matches_host: false`` and keeps the number with
that caveat visible.

Wall-clock safety: the driver runs this under a timeout (round 2 was
killed before printing). Phases are ordered most-important-first, gated
on the remaining budget, results land incrementally, and SIGTERM/SIGINT/
SIGALRM all emit the best result so far. The synthesized corpus and the
parity ARPA are cached under ``.cache/`` so repeat runs skip ~60 s of
setup, and the XLA persistent compile cache keeps recompiles warm.
"""
import json
import os
import signal
import sys
import time

_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _ROOT)
sys.path.insert(1, os.path.join(_ROOT, "scripts"))

import numpy as np

FRAME_SEC = 0.02
BEAM_WIDTH = 100
# per-program row count keeps improving to ~700 rows (VPU utilization);
# 768 splits into buckets near that operating point
BATCH = int(os.environ.get("BENCH_BATCH", 768))
# exact token-timeline decoding: each frame's exactly-admitted token set,
# chunked 5 wide (engine.EngineConfig.token_timeline) — prices per-step
# work to the MEAN admitted count (~2.5 here) instead of the batch-worst
# frame (auto-K picked 24 on this corpus). Round-4 sweep: 5 beats 6 by
# ~4% and 4 by ~15% on the slimmed engine (scripts/serving_sweep.py).
TOKEN_CHUNK = int(os.environ.get("BENCH_TOKEN_CHUNK", 5))
# the reference package's recorded UNLOADED single-core rate on this
# corpus difficulty (BASELINE.md round-2 measurement); the in-run
# baseline is credited at least this much — see the baseline phase
REF_PINNED_FLOOR = float(os.environ.get("BENCH_REF_FLOOR", 91.0))
BASELINE_N = int(os.environ.get("BENCH_BASELINE_N", 64))
SAMPLE = "/root/reference/pyctcdecode/tests/sample_data/libri_logits.json"
LIBRI_LABELS = [" "] + list("abcdefghijklmnopqrstuvwxyz") + ["'"] + [""]
CACHE_DIR = os.path.join(_ROOT, ".cache")

# parity-scale 3-gram (ref 3-gram.pruned.1e-7.arpa shape statistics)
LM_VOCAB = 200_000
LM_BIGRAMS = 1_500_000
LM_TRIGRAMS = 1_100_000
TRANSCRIPT = (
    "i have a good deal of will you remember and what i have set my mind upon "
    "no doubt i shall some day achieve"
)

# corpus difficulty presets (calibration documented in
# pyctcdecode_tpu/evaluation.py): headline = dev-other, detail = fixture
from pyctcdecode_tpu.evaluation import (  # noqa: E402
    DEV_OTHER_DIFFICULTY,
    FIXTURE_DIFFICULTY,
)

HARD_KW = dict(DEV_OTHER_DIFFICULTY, seed=3)
EASY_KW = dict(FIXTURE_DIFFICULTY, seed=3)


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


def _cached_arpa(name: str, maker) -> str:
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, name)
    if not os.path.exists(path):
        maker(path)
    return path


# --- wall-clock budget + crash/timeout-safe emission -----------------------
#
# The driver runs this script under a timeout; round 2's run was killed
# before the single JSON line was printed and the round recorded no number.
# Measurements therefore land in _RESULT incrementally, phases are ordered
# most-important-first and gated on the remaining budget, and a SIGTERM /
# SIGINT emits the best result so far before exiting — a timeout now
# degrades the measurement instead of erasing it.
_T0 = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 420))
# hard backstop: even a phase stuck inside one device call gets interrupted
# and the best-so-far line still prints (SIGALRM fires in-process, unlike
# the driver's external timeout)
_ALARM_S = int(BUDGET_S + 90)
_RESULT = {
    "metric": "decode_throughput",
    "value": None,
    "unit": "audio_sec/s/chip",
    "vs_baseline": None,
    "detail": {},
}
_EMITTED = False


def _elapsed() -> float:
    return time.monotonic() - _T0


def _left() -> float:
    return BUDGET_S - _elapsed()


def _note(msg: str) -> None:
    print(f"[bench {_elapsed():6.1f}s] {msg}", file=sys.stderr, flush=True)


def _set_headline(tput: float, latency_s: float, config: str,
                  baseline: float = None) -> None:
    _RESULT["value"] = round(tput, 2)
    _RESULT["detail"]["headline_batch_latency_s"] = round(latency_s, 4)
    _RESULT["detail"]["headline_config"] = config
    if baseline:
        _RESULT["vs_baseline"] = round(tput / baseline, 2)


def _emit(partial: bool = False) -> None:
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    if partial:
        _RESULT["detail"]["partial"] = (
            f"budget/timeout hit at {_elapsed():.0f}s; later phases skipped"
        )
    print(json.dumps(_RESULT), flush=True)


def _on_term(signum, frame):
    _note(f"signal {signum}: emitting partial result")
    _emit(partial=True)
    os._exit(0)


signal.signal(signal.SIGTERM, _on_term)
signal.signal(signal.SIGINT, _on_term)
signal.signal(signal.SIGALRM, _on_term)
signal.alarm(_ALARM_S)


def _time_device(dev, batch, audio_sec, reps=3, **kwargs):
    """Best-of-``reps`` batch decode (same treatment as the baseline:
    shared-host load only ever slows a run, so the best rep is the
    closest to the unloaded rate on both sides of the ratio)."""
    texts = dev.decode_batch(batch, **kwargs)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        texts = dev.decode_batch(batch, **kwargs)
        best = min(best, time.perf_counter() - t0)
    return texts, best, audio_sec / best


def _time_single_core(decode_fn, mats, audio_secs, reps=2):
    """Sequential single-process corpus decode (the ref notebook's loop).

    Best-of-``reps`` wall time: the shared host fluctuates, and crediting
    the baseline its best run keeps ``vs_baseline`` conservative.
    """
    decode_fn(mats[0])  # warm any lazy setup outside the timed region
    best = float("inf")
    for _ in range(reps):
        texts = []
        t0 = time.perf_counter()
        for mat in mats:
            texts.append(decode_fn(mat))
        best = min(best, time.perf_counter() - t0)
    return texts, sum(audio_secs) / best


def _backend_reachable(timeout_s: float = 150.0) -> bool:
    """Probe the accelerator backend in a SUBPROCESS with a hard timeout.

    A wedged device tunnel (observed round 5: a runaway remote compile
    held the chip claim and ``jax.devices()`` blocked forever inside
    PJRT client init) would otherwise hang the whole bench past the
    driver's timeout and record nothing. On probe failure the bench
    falls back to the CPU backend with an explicit label — a degraded,
    clearly-marked number beats an empty round.
    """
    import subprocess

    try:
        probe = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax; print(jax.devices()[0].platform)",
            ],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False
    return probe.returncode == 0


def main() -> None:
    import jax

    if not _backend_reachable():
        _note("accelerator backend unreachable (probe timeout); "
              "falling back to CPU — throughput numbers will NOT be "
              "TPU numbers")
        jax.config.update("jax_platforms", "cpu")
        _RESULT["detail"]["backend_fallback"] = (
            "accelerator backend unreachable at bench start (device "
            "tunnel wedged); measured on CPU instead — not a chip number"
        )

    from pyctcdecode_tpu.alphabet import Alphabet
    from pyctcdecode_tpu.decoder import BeamSearchDecoderCTC
    from pyctcdecode_tpu.evaluation import synthesize_corpus
    from pyctcdecode_tpu.models.language_model import LanguageModel
    from pyctcdecode_tpu.models.native import open_ngram_file
    from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC
    from pyctcdecode_tpu.utils.metrics import word_error_rate

    jax_cache = os.path.join(CACHE_DIR, "jax")
    os.makedirs(jax_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", jax_cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    detail = _RESULT["detail"]
    detail.update(
        beam_width=BEAM_WIDTH,
        k_tokens=f"timeline-chunked-{TOKEN_CHUNK} (exact admission)",
        lm=(
            f"3-gram, {LM_VOCAB} vocab, ~{LM_BIGRAMS} bigrams + "
            f"{LM_TRIGRAMS} trigrams"
        ),
        backend=jax.devices()[0].platform,
    )

    # --- setup -------------------------------------------------------------
    alphabet = Alphabet.build_alphabet(LIBRI_LABELS)
    arpa = _cached_arpa("bench_parity_3gram.arpa", _make_parity_arpa)
    _note("parity ARPA ready")
    _note(f"budget {BUDGET_S:.0f}s, batch {BATCH}, chunk {TOKEN_CHUNK}")

    # one ARPA parse shared by host + device; the same unigram vocabulary
    # goes to every engine, the reference included
    model = open_ngram_file(arpa)
    unigrams = [w for w in model.native.vocab_list()
                if w not in ("<s>", "</s>", "<unk>")]
    lm = LanguageModel(model, unigrams)
    _note("LM parsed")

    # corpora: BATCH distinct utterances over LM vocabulary words.
    # Synthesis costs ~30-45 s, so the corpus is cached across runs; the
    # cache key pins every input that shapes the data.
    import pickle

    rng = np.random.RandomState(11)
    corpus_vocab = [unigrams[i] for i in rng.randint(0, len(unigrams), 6000)]
    corpus_vocab += TRANSCRIPT.split()
    corpus_key = (BATCH, sorted(HARD_KW.items()), LIBRI_LABELS)
    corpus_pkl = os.path.join(CACHE_DIR, f"bench_corpus_b{BATCH}.pkl")
    corpus = None
    if os.path.exists(corpus_pkl):
        try:
            with open(corpus_pkl, "rb") as fh:
                cached_key, corpus = pickle.load(fh)
            if cached_key != corpus_key:
                corpus = None
        except Exception:
            corpus = None
    if corpus is None:
        corpus = synthesize_corpus(
            LIBRI_LABELS, corpus_vocab, n_utterances=BATCH, **HARD_KW
        )
        try:
            with open(corpus_pkl, "wb") as fh:
                pickle.dump((corpus_key, corpus), fh)
        except OSError:
            pass
    audio_secs = [m.shape[0] * FRAME_SEC for m in corpus.logits]
    audio_total = sum(audio_secs)
    n_base = min(BASELINE_N, BATCH)
    detail["corpus"] = {
        "n_utterances": BATCH,
        "audio_seconds": round(audio_total, 1),
        "distinct": True,
        "difficulty": "dev-other (greedy WER calibrated to ~10%)",
    }
    detail["baseline_n"] = n_base

    _note("corpus ready")
    host = BeamSearchDecoderCTC(alphabet, lm)
    dev = TPUBeamSearchDecoderCTC(alphabet, lm)
    _note("decoders built (device LM tables uploaded)")

    # --- single-core baselines on the first n_base utterances --------------
    # The host parity engine is a cross-check and the fallback baseline
    # (1 rep); the REAL baseline is the reference package, credited its
    # best-of-2 wall time so vs_baseline stays conservative.
    host_texts, host_tput = _time_single_core(
        lambda m: host.decode(m, beam_width=BEAM_WIDTH),
        corpus.logits[:n_base], audio_secs[:n_base], reps=1,
    )
    baseline_tput = host_tput
    detail["host_engine_audio_sec_per_s"] = round(host_tput, 2)
    detail["baseline"] = (
        "host parity engine, single core (reference unavailable)"
    )
    detail["baseline_audio_sec_per_s"] = round(host_tput, 2)
    detail["corpus"]["wer_host_subset"] = round(
        word_error_rate(corpus.references[:n_base], host_texts), 4
    )
    _note(f"host baseline: {host_tput:.1f} audio_s/s")

    ref_dec = None
    try:
        import ref_baseline

        ref_pkg = ref_baseline.load_reference()
        if ref_pkg is not None:
            ref_dec = ref_baseline.build_reference_decoder(
                ref_pkg, LIBRI_LABELS, arpa
            )
            ref_texts, ref_tput = _time_single_core(
                lambda m: ref_dec.decode(m, beam_width=BEAM_WIDTH),
                corpus.logits[:n_base], audio_secs[:n_base],
            )
            # Host-load noise only ever SLOWS the in-run measurement (the
            # true single-core rate is the unloaded one), which would
            # inflate vs_baseline on a busy host. Credit the baseline at
            # least its recorded unloaded rate (BASELINE.md, measured
            # round 2: ~91 audio-s/s at dev-other difficulty) so the
            # ratio stays conservative and stable across runs.
            baseline_tput = max(ref_tput, REF_PINNED_FLOOR)
            detail["baseline"] = (
                "reference package, single core, C++ (ctclm) LM backend; "
                f"credited >= {REF_PINNED_FLOOR} audio_s/s (recorded "
                "unloaded rate) when the in-run measurement is slower"
            )
            detail["baseline_audio_sec_per_s"] = round(baseline_tput, 2)
            detail["baseline_measured_audio_sec_per_s"] = round(ref_tput, 2)
            detail["reference_matches_host"] = ref_texts == host_texts
            _note(f"reference baseline: {ref_tput:.1f} audio_s/s "
                  f"(credited {baseline_tput:.1f})")
    except Exception as err:  # keep the bench runnable, but say what broke
        print(f"reference baseline failed: {err!r}", file=sys.stderr)

    if "backend_fallback" in detail:
        # No chip: compiling the batch-768 serving programs on CPU would
        # eat the whole budget and still time out mid-compile. Record
        # the host oracle's single-core number as the clearly-labeled
        # stand-in and stop — BASELINE.md carries the real chip numbers
        # and the incident note.
        _set_headline(
            host_tput, sum(audio_secs[:n_base]) / host_tput,
            "HOST ORACLE on CPU — device tunnel unreachable; NOT a chip "
            "number (see BASELINE.md round-5 incident note)",
            baseline_tput,
        )
        _note("device unreachable: emitting host-oracle stand-in and "
              "stopping")
        _emit()
        return

    # --- device batch decode: the serving configuration first -------------
    # (token-timeline chunking + balanced length bucketing + blank
    # collapse — exact admission by construction, collapse offsets
    # restored, so the combination is output-exact). Exactness is checked
    # against the host parity oracle on the baseline subset — the
    # strongest available in-run check. Collapse removes the ~36% of
    # steps spent on blank-certain frames; its cost is HOST-side
    # (normalize + take), which the pipelined phase overlaps entirely.
    kwargs = dict(
        beam_width=BEAM_WIDTH, token_chunking=TOKEN_CHUNK,
        length_bucketing=True, blank_collapse=True,
    )
    texts_bc, bc_dt, bc_tput = _time_device(
        dev, corpus.logits, audio_total,
        reps=3 if _left() > 240 else 2, **kwargs
    )
    bc_exact = texts_bc[:n_base] == host_texts
    detail["device_matches_host"] = bc_exact
    detail["corpus"]["wer_device"] = round(
        word_error_rate(corpus.references, texts_bc), 4
    )
    _note(f"chunked+bucketed: {bc_tput:.1f} audio_s/s, host-exact={bc_exact}")
    detail["oneshot_audio_sec_per_s"] = round(bc_tput, 2)
    detail["oneshot_batch_latency_s"] = round(bc_dt, 4)
    _set_headline(bc_tput, bc_dt,
                  "oneshot + token chunking + balanced bucketing + "
                  "blank collapse",
                  baseline_tput)

    # --- pipelined steady-state throughput (the serving pattern): keep one
    # batch in flight so host prep/post-process and the relay transfers
    # overlap the device run. Reuses the executables compiled above.
    def _time_stream(n_stream=12, depth=3, dec=None, **extra):
        """STEADY-STATE serving throughput (honest measurement).

        Round-5 methodology fix: the previous measurement averaged the
        yield-to-yield gaps after the first batch — but a depth-D
        pipeline's last D yields are a tail DRAIN (their device work
        happened during earlier gaps; fetching results takes ~0.2 s), so
        including them credited device work twice and inflated deeper
        pipelines (measured: depth-4 yield gaps on a 16-batch stream are
        ~1.40 s steady followed by four 0.2 s drain gaps — the old
        average read up to ~2x high, and the round-3/4 depth-2 numbers
        carried up to ~14% of the same inflation). The sustained rate of
        a serving system is the STEADY gap: drop the first ``depth``
        gaps (pipeline fill) and the last ``depth`` (drain), average the
        middle. The whole-stream rate (spin-up included, nothing
        excluded) is recorded alongside as the conservative bound.
        """
        dec = dec if dec is not None else dev
        conf = dict(kwargs, top_n=1, pipeline_depth=depth, **extra)
        for out in dec.decode_beams_batches([corpus.logits], **conf):
            pass  # warm every bucket's executable
        best = float("inf")
        best_whole = float("inf")
        reps = 3 if _left() > 150 else (2 if _left() > 90 else 1)
        _RESULT["detail"]["pipelined_reps"] = reps
        for _ in range(reps):
            ts = []
            t0 = time.perf_counter()
            for out in dec.decode_beams_batches(
                [corpus.logits] * n_stream, **conf
            ):
                ts.append(time.perf_counter() - t0)
            gaps = [b - a for a, b in zip(ts, ts[1:])]
            steady = gaps[depth : len(gaps) - depth]
            if steady:
                best = min(best, sum(steady) / len(steady))
            best_whole = min(best_whole, ts[-1] / n_stream)
        _RESULT["detail"]["pipelined_whole_stream_audio_sec_per_s"] = round(
            audio_total / best_whole, 2
        )
        _RESULT["detail"]["pipelined_depth"] = depth
        _RESULT["detail"]["pipelined_n_stream"] = n_stream
        return audio_total / best, best

    if _left() > 30:
        stream_tput, stream_dt = _time_stream()
        detail["pipelined_audio_sec_per_s"] = round(stream_tput, 2)
        detail["pipelined_batch_latency_s"] = round(stream_dt, 4)
        if stream_tput > (_RESULT["value"] or 0.0):
            _set_headline(
                stream_tput, stream_dt,
                "pipelined + token chunking + balanced bucketing + "
                "blank collapse (output-exact)",
                baseline_tput,
            )
        _note(f"pipelined: {stream_tput:.1f} audio_s/s")

    # --- fast_topk ranking (exact top-k SET, enumeration tie order
    # restored within it; only equal-score ties across the selection
    # boundary may resolve differently): promote to the headline only
    # when it still matches the host subset. Budget-gated — it compiles
    # a separate program family.
    ft_exact = None
    if _left() > 60:
        # round 5: fast_topk also accelerates timeline mode (the pool
        # ranking's 600-wide top_k is ~4% of device busy); promoted to
        # the headline ONLY when the transcripts still match the
        # collapsed run exactly (checked below)
        dev_fast = dev.with_options(fast_topk=True)
        texts_ft, ft_dt, ft_tput = _time_device(
            dev_fast, corpus.logits, audio_total, reps=2, **kwargs
        )
        ft_exact = texts_ft == texts_bc
        detail["fast_topk"] = {
            "oneshot_collapsed_audio_sec_per_s": round(ft_tput, 2),
            "texts_match_collapsed": ft_exact,
        }
        if ft_exact and ft_tput > (_RESULT["value"] or 0.0):
            _set_headline(
                ft_tput, ft_dt,
                "oneshot + length bucketing + blank collapse + fast_topk "
                "(output-exact on this corpus)",
                baseline_tput,
            )
            if _left() > 30:
                stream_tput, stream_dt = _time_stream(dec=dev_fast)
                if stream_tput > (_RESULT["value"] or 0.0):
                    _set_headline(
                        stream_tput, stream_dt,
                        "pipelined + length bucketing + blank collapse "
                        "+ fast_topk (output-exact)",
                        baseline_tput,
                    )
                _note(f"pipelined fast_topk: {stream_tput:.1f} audio_s/s")
        _note(f"fast_topk: {ft_tput:.1f} audio_s/s, exact={ft_exact}")

    # --- FULL-corpus exactness + same-set WER pair: decode every utterance
    # with the host parity oracle (fork pool — correctness only, not a
    # timing) and assert whole-set text equality against the device run.
    # The two WER numbers are then computed on the SAME utterances, so the
    # artifact demonstrates parity to a reader (exactness as an invariant,
    # ref test_decoder.py:515-584 philosophy — not a 64-utterance sample).
    if _left() > 110:
        import multiprocessing

        try:
            ctx = multiprocessing.get_context("fork")
            with ctx.Pool(min(os.cpu_count() or 1, 8)) as pool:
                host_full = host.decode_batch(
                    pool, corpus.logits, beam_width=BEAM_WIDTH
                )
        except Exception as err:
            print(f"host full-corpus decode failed: {err!r}", file=sys.stderr)
            host_full = None
        if host_full is not None:
            full_exact = texts_bc == host_full
            detail["device_matches_host_full"] = full_exact
            detail["corpus"]["wer_host"] = round(
                word_error_rate(corpus.references, host_full), 4
            )
            # wer_device above is already the same full-set basis
            _note(
                f"full-corpus host oracle: exact={full_exact}, "
                f"wer_host={detail['corpus']['wer_host']} vs "
                f"wer_device={detail['corpus']['wer_device']} (same "
                f"{BATCH} utterances)"
            )

    # --- streaming path (ref decoder.py:669-728 surface): single-stream
    # chunked decode with device-resident state. One utterance per stream
    # (the streaming API is stateful per utterance); throughput is
    # audio-seconds consumed per wall second including every chunk's
    # host<->device turnaround — the honest interactive-latency number,
    # not a batch number.
    if _left() > 60:
        chunk_frames = 50
        n_stream_utts = min(8, BATCH)

        def _run_stream(mat):
            st = dev.get_starting_state(beam_width=BEAM_WIDTH)
            n = mat.shape[0]
            out = None
            for lo in range(0, n, chunk_frames):
                out = dev.partial_decode_beams(
                    st, mat[lo : lo + chunk_frames],
                    is_end=lo + chunk_frames >= n,
                )
            return out[0].text

        try:
            stream_text = _run_stream(corpus.logits[0])  # compile + warm
            t0 = time.perf_counter()
            stream_texts = [
                _run_stream(m) for m in corpus.logits[:n_stream_utts]
            ]
            stream_wall = time.perf_counter() - t0
            stream_audio = sum(audio_secs[:n_stream_utts])
            detail["streaming"] = {
                "audio_sec_per_s": round(stream_audio / stream_wall, 2),
                "chunk_frames": chunk_frames,
                "n_utterances": n_stream_utts,
                "texts_match_batch": stream_texts
                == texts_bc[:n_stream_utts],
                "note": "single stream, state-carrying, per-chunk "
                "host<->device turnaround included",
            }
            _note(
                f"streaming: {detail['streaming']['audio_sec_per_s']:.1f} "
                f"audio_s/s single-stream, batch-exact="
                f"{detail['streaming']['texts_match_batch']}"
            )
        except Exception as err:
            print(f"streaming phase failed: {err!r}", file=sys.stderr)

    # --- no-collapse variant (a second exactness angle: collapsed vs
    # plain decode on device must produce identical transcripts)
    if _left() > 120:
        kw_plain = dict(kwargs, blank_collapse=False)
        texts, dev_dt, dev_tput = _time_device(
            dev, corpus.logits, audio_total, reps=1, **kw_plain
        )
        detail["no_collapse"] = {
            "audio_sec_per_s": round(dev_tput, 2),
            "batch_latency_s": round(dev_dt, 4),
            "texts_match_collapsed": texts == texts_bc,
        }
        _note(f"plain oneshot: {dev_tput:.1f} audio_s/s, "
              f"collapse-exact={texts == texts_bc}")

    # --- optional extras, budget permitting ---------------------------------
    if _left() > 100:
        # data-dependence shown both ways: a corpus calibrated to the easy
        # libri fixture (1.1 tokens/frame admitted)
        easy = synthesize_corpus(
            LIBRI_LABELS, corpus_vocab, n_utterances=BATCH, **EASY_KW
        )
        easy_total = sum(m.shape[0] * FRAME_SEC for m in easy.logits)
        easy_texts, _, easy_tput = _time_device(
            dev, easy.logits, easy_total, reps=1, **kwargs
        )
        detail["easy_corpus"] = {
            "difficulty": "libri fixture (1.1 tokens/frame admitted)",
            "device_audio_sec_per_s": round(easy_tput, 2),
            "wer_device": round(
                word_error_rate(easy.references, easy_texts), 4
            ),
        }
        _note(f"easy corpus device: {easy_tput:.1f} audio_s/s")
        if ref_dec is not None and _left() > 30:
            _, ref_easy_tput = _time_single_core(
                lambda m: ref_dec.decode(m, beam_width=BEAM_WIDTH),
                easy.logits[:n_base],
                [m.shape[0] * FRAME_SEC for m in easy.logits[:n_base]],
                reps=1,
            )
            detail["easy_corpus"]["reference_audio_sec_per_s"] = round(
                ref_easy_tput, 2
            )
            _note(f"easy corpus reference: {ref_easy_tput:.1f} audio_s/s")

    _note("done")
    _emit()


if __name__ == "__main__":
    main()
