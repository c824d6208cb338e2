"""Differential fuzz: host parity engine vs the ACTUAL reference package.

The bench cross-checks reference-vs-host transcripts on its corpus every
run; this pins the same property in the suite, at test cost: the real
pyctcdecode from /root/reference (over scripts/ref_baseline.py's C++ LM
shim, verified against the reference's own golden floats) must decode
identically to this repo's host oracle on fuzzed inputs — texts, scores
AND frame spans. This is the parity contract stated end-to-end, not
through fixtures alone.

(The known, documented divergence is excluded by construction: the host
engine's per-beam BPE force-break fix only diverges on ``▁...▁``
alphabets, and these tests use char alphabets.)
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts"),
)

from pyctcdecode_tpu import Alphabet, BeamSearchDecoderCTC, LanguageModel
from pyctcdecode_tpu.models.ngram import NGramModel

from .helpers import SAMPLE_LABELS, TEST_LOGITS, TEST_UNIGRAMS

ARPA = "/root/reference/pyctcdecode/tests/sample_data/bugs_bunny_kenlm.arpa"


def _load_ref():
    import ref_baseline

    ref = ref_baseline.load_reference()
    if ref is None:
        pytest.skip("reference package not importable here")
    return ref, ref_baseline


@pytest.mark.skipif(not os.path.exists(ARPA), reason="reference fixtures absent")
def test_reference_and_host_agree_on_goldens():
    ref, rb = _load_ref()
    rdec = rb.build_reference_decoder(ref, SAMPLE_LABELS, ARPA)
    lm = LanguageModel(NGramModel.from_file(ARPA), TEST_UNIGRAMS)
    host = BeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS), lm)
    r_beams = rdec.decode_beams(TEST_LOGITS)
    h_beams = host.decode_beams(TEST_LOGITS)
    assert r_beams[0].text == h_beams[0].text == "bugs bunny"
    assert r_beams[0].text_frames == h_beams[0].text_frames
    assert abs(r_beams[0].logit_score - h_beams[0].logit_score) < 1e-9
    assert abs(r_beams[0].lm_score - h_beams[0].lm_score) < 1e-9
    BeamSearchDecoderCTC.clear_class_models()


@pytest.mark.skipif(not os.path.exists(ARPA), reason="reference fixtures absent")
def test_reference_and_host_agree_on_fuzz():
    ref, rb = _load_ref()
    rdec = rb.build_reference_decoder(ref, SAMPLE_LABELS, ARPA)
    lm = LanguageModel(NGramModel.from_file(ARPA), TEST_UNIGRAMS)
    host = BeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS), lm)
    rng = np.random.RandomState(23)
    v = len(SAMPLE_LABELS)
    for i in range(25):
        mat = rng.randn(rng.randint(4, 40), v).astype(np.float32) * 2.0
        beam = int(rng.choice([4, 8, 16]))
        r_beams = rdec.decode_beams(mat, beam_width=beam)
        h_beams = host.decode_beams(mat, beam_width=beam)
        assert r_beams[0].text == h_beams[0].text, (i, r_beams[0].text)
        assert r_beams[0].text_frames == h_beams[0].text_frames, i
        assert abs(r_beams[0].logit_score - h_beams[0].logit_score) < 1e-4, i
        assert abs(r_beams[0].lm_score - h_beams[0].lm_score) < 1e-4, i
    BeamSearchDecoderCTC.clear_class_models()


def test_reference_and_host_agree_no_lm():
    ref, rb = _load_ref()
    rdec = rb.build_reference_decoder(ref, SAMPLE_LABELS, None)
    host = BeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS))
    rng = np.random.RandomState(31)
    v = len(SAMPLE_LABELS)
    for i in range(25):
        mat = rng.randn(rng.randint(4, 40), v).astype(np.float32) * 2.0
        assert rdec.decode(mat, beam_width=8) == host.decode(
            mat, beam_width=8
        ), i
    BeamSearchDecoderCTC.clear_class_models()
