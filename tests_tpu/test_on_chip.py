"""Golden-fixture parity on the REAL chip (XLA:TPU lowering).

Every case here is a pinned-on-CPU invariant from the main suite, re-run
against the actual accelerator: golden bugs/bunny floats + frames (ref
test_decoder.py:330-336), the libri transcript (ref
test_decoder.py:746-753), the serving composition (token timeline +
blank collapse + length bucketing) vs the host oracle, and chunked
streaming == one-shot. See tests_tpu/conftest.py for why this shard
exists separately.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

from helpers import (  # noqa: E402
    GOLDEN_TOP_LM_SCORE,
    GOLDEN_TOP_LOGIT_SCORE,
    TEST_LOGITS,
)

from pyctcdecode_tpu import Alphabet, BeamSearchDecoderCTC, LanguageModel  # noqa: E402
from pyctcdecode_tpu.api import build_ctcdecoder  # noqa: E402
from pyctcdecode_tpu.evaluation import synthesize_corpus  # noqa: E402
from pyctcdecode_tpu.models.ngram import NGramModel  # noqa: E402
from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC  # noqa: E402

SAMPLE_LABELS = [" ", "b", "g", "n", "s", "u", "y", ""]
LIBRI_LABELS = [" "] + list("abcdefghijklmnopqrstuvwxyz") + ["'"] + [""]
TRANSCRIPT = (
    "i have a good deal of will you remember and what i have set my mind "
    "upon no doubt i shall some day achieve"
)


def test_bugs_bunny_goldens(bugs_bunny_arpa_path):
    """LM decode reproduces the reference goldens on the chip (f32 drift)."""
    dec = build_ctcdecoder(SAMPLE_LABELS, bugs_bunny_arpa_path, engine="tpu")
    assert isinstance(dec, TPUBeamSearchDecoderCTC)
    beams = dec.decode_beams(TEST_LOGITS)
    top = beams[0]
    assert top.text == "bugs bunny"
    assert abs(top.logit_score - GOLDEN_TOP_LOGIT_SCORE) < 1e-4
    assert abs(top.lm_score - GOLDEN_TOP_LM_SCORE) < 1e-4
    assert top.text_frames == [("bugs", (0, 4)), ("bunny", (7, 13))]
    BeamSearchDecoderCTC.clear_class_models()


def test_libri_transcript_device_equals_host(libri_logits):
    """The real logit fixture decodes identically on chip and host."""
    host = build_ctcdecoder(LIBRI_LABELS)
    dev = build_ctcdecoder(LIBRI_LABELS, engine="tpu")
    h = host.decode(libri_logits)
    t = dev.decode(libri_logits)
    assert h == TRANSCRIPT
    assert t == h
    BeamSearchDecoderCTC.clear_class_models()


def _small_arpa(path):
    words = TRANSCRIPT.split()
    vocab = sorted(set(words))
    bigrams = sorted(set(zip(words[:-1], words[1:])))
    with open(path, "w") as fh:
        fh.write("\\data\\\n")
        fh.write(f"ngram 1={len(vocab) + 3}\nngram 2={len(bigrams)}\n\n")
        fh.write("\\1-grams:\n-10\t<unk>\t0\n-2\t<s>\t-0.5\n-2\t</s>\t0\n")
        for w in vocab:
            fh.write(f"-1.5\t{w}\t-0.5\n")
        fh.write("\n\\2-grams:\n")
        for a, b in bigrams:
            fh.write(f"-0.5\t{a} {b}\n")
        fh.write("\n\\end\\\n")


def test_serving_composition_matches_host():
    """Timeline chunking + blank collapse + bucketing == host, on chip."""
    vocab = sorted(set(TRANSCRIPT.split()))
    corpus = synthesize_corpus(
        LIBRI_LABELS, vocab, n_utterances=12, noise=1.5, seed=5
    )
    alphabet = Alphabet.build_alphabet(LIBRI_LABELS)
    with tempfile.TemporaryDirectory() as td:
        arpa = os.path.join(td, "t.arpa")
        _small_arpa(arpa)
        lm = LanguageModel(NGramModel.from_file(arpa), vocab)
        host = BeamSearchDecoderCTC(alphabet, lm)
        dev = TPUBeamSearchDecoderCTC(alphabet, lm)
        host_texts = [host.decode(m) for m in corpus.logits]
        dev_texts = dev.decode_batch(
            corpus.logits,
            token_chunking=4,
            blank_collapse=True,
            length_bucketing=True,
        )
        assert dev_texts == host_texts
    BeamSearchDecoderCTC.clear_class_models()


def test_streaming_chunked_equals_oneshot(libri_logits):
    """Device streaming chunks compose to the one-shot transcript on chip."""
    dev = build_ctcdecoder(LIBRI_LABELS, engine="tpu")
    full = dev.decode(libri_logits)
    st = dev.get_starting_state()
    out = None
    n = libri_logits.shape[0]
    for lo in range(0, n, 100):
        out = dev.partial_decode_beams(
            st, libri_logits[lo : lo + 100], is_end=lo + 100 >= n
        )
    assert out[0].text == full
    BeamSearchDecoderCTC.clear_class_models()


def test_timeline_stats_on_chip():
    """Timeline-mode decode counters work under XLA:TPU lowering."""
    import numpy as np

    dev = build_ctcdecoder(LIBRI_LABELS, engine="tpu")
    rng = np.random.RandomState(6)
    mats = [rng.randn(30, len(LIBRI_LABELS)).astype(np.float32) * 2.0
            for _ in range(3)]
    plain = dev.decode_batch(mats, token_chunking=4)
    res, stats = dev.decode_beams_batch(
        mats, token_chunking=4, collect_stats=True
    )
    assert [r[0].text for r in res] == plain
    for st, m in zip(stats, mats):
        assert st["frames"] == m.shape[0]
        assert st["beams_alive"] > 0
    BeamSearchDecoderCTC.clear_class_models()
