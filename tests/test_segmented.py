"""Segmented batch decode (host-dispatched unrolled frame segments).

On accelerators the batch path runs as a chain of loop-free programs
(engine.make_segment_decode_fns) because XLA lowers in-while gathers to a
scalar path ~40x slower than top-level gathers. These tests pin the
segmented path to the single-program lax.scan path bit-for-bit on CPU,
across segment boundaries, ragged lengths, top-N slicing and hotwords.
"""
import json
import os

import numpy as np
import pytest

from .helpers import SAMPLE_LABELS, TEST_PROBS

from pyctcdecode_tpu.alphabet import Alphabet
from pyctcdecode_tpu.models.language_model import LanguageModel
from pyctcdecode_tpu.models.native import open_ngram_file
from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC

BUGS_ARPA = "/root/reference/pyctcdecode/tests/sample_data/bugs_bunny_kenlm.arpa"
LIBRI = "/root/reference/pyctcdecode/tests/sample_data/libri_logits.json"


def _decoders(segment_frames):
    alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
    lm = LanguageModel(open_ngram_file(BUGS_ARPA), ["bugs", "bunny"])
    return (
        TPUBeamSearchDecoderCTC(alphabet, lm, segment_frames=0),
        TPUBeamSearchDecoderCTC(alphabet, lm, segment_frames=segment_frames),
    )


def _assert_batches_equal(a, b):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert len(ra) == len(rb)
        for x, y in zip(ra, rb):
            assert x.text == y.text
            assert x.logit_score == pytest.approx(y.logit_score, abs=1e-5)
            assert x.lm_score == pytest.approx(y.lm_score, abs=1e-5)
            assert x.text_frames == y.text_frames


@pytest.mark.skipif(not os.path.exists(BUGS_ARPA), reason="no reference data")
@pytest.mark.parametrize("seg", [1, 4, 16])
def test_segment_sizes_match_scan(seg):
    scan_dec, seg_dec = _decoders(seg)
    batch = [TEST_PROBS, TEST_PROBS[:9], TEST_PROBS[:5], TEST_PROBS]
    _assert_batches_equal(
        scan_dec.decode_beams_batch(batch, beam_width=20),
        seg_dec.decode_beams_batch(batch, beam_width=20),
    )


@pytest.mark.skipif(not os.path.exists(BUGS_ARPA), reason="no reference data")
def test_segmented_top_n_and_hotwords():
    scan_dec, seg_dec = _decoders(4)
    batch = [TEST_PROBS] * 3
    kwargs = dict(beam_width=16, top_n=2, hotwords=["bunny"], hotword_weight=5.0)
    _assert_batches_equal(
        scan_dec.decode_beams_batch(batch, **kwargs),
        seg_dec.decode_beams_batch(batch, **kwargs),
    )


@pytest.mark.skipif(not os.path.exists(LIBRI), reason="no reference data")
def test_segmented_libri_no_lm():
    with open(LIBRI) as fh:
        logits = np.array(json.load(fh), dtype=np.float32)
    labels = [" "] + list("abcdefghijklmnopqrstuvwxyz") + ["'"] + [""]
    alphabet = Alphabet.build_alphabet(labels)
    scan_dec = TPUBeamSearchDecoderCTC(alphabet, None, segment_frames=0)
    seg_dec = TPUBeamSearchDecoderCTC(alphabet, None, segment_frames=32)
    want = scan_dec.decode_batch([logits, logits[:100]], beam_width=24)
    got = seg_dec.decode_batch([logits, logits[:100]], beam_width=24)
    assert want == got
    assert got[0].startswith("i have a good deal of will you remember")


@pytest.mark.skipif(not os.path.exists(BUGS_ARPA), reason="no reference data")
def test_segmented_pipelined_batches():
    scan_dec, seg_dec = _decoders(8)
    batches = [[TEST_PROBS] * 2, [TEST_PROBS[:9]] * 2]
    want = [
        scan_dec.decode_beams_batch(b, beam_width=12, top_n=1) for b in batches
    ]
    got = list(
        seg_dec.decode_beams_batches(iter(batches), beam_width=12, top_n=1)
    )
    for wa, ga in zip(want, got):
        _assert_batches_equal(wa, ga)
