"""Property-based fuzzing of the device engine against the host oracle.

Mirrors the reference's hypothesis tiers (ref test_decoder.py:772-804) but
targets the device engine: random logit matrices (normalized and raw),
random alphabets (char and BPE), random decode knobs.
"""
import os
import unittest

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyctcdecode_tpu import Alphabet, BeamSearchDecoderCTC, LanguageModel
from pyctcdecode_tpu.models.ngram import NGramModel
from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC

from .helpers import SAMPLE_LABELS, TEST_UNIGRAMS

ARPA = "/root/reference/pyctcdecode/tests/sample_data/bugs_bunny_kenlm.arpa"
SCORE_TOL = 2e-3

_CHAR_ALPHABET = Alphabet.build_alphabet(SAMPLE_LABELS)
_BPE_ALPHABET = Alphabet.build_alphabet(["▁bug", "▁bun", "ny", "s", "un", "▁⁇▁", ""])
_CACHE = {}


def _pair(name, alphabet):
    # other test files wipe the class-level model registry
    # (clear_class_models, reference semantics), so rebuild host decoders
    # whose registry entry disappeared
    host, dev = _CACHE.get(name, (None, None))
    if host is None or host._model_key not in BeamSearchDecoderCTC.model_container:
        host = BeamSearchDecoderCTC(alphabet)
        dev = _CACHE.get(name, (None, None))[1] or TPUBeamSearchDecoderCTC(alphabet)
        _CACHE[name] = (host, dev)
    return _CACHE[name]


class TestDeviceFuzz(unittest.TestCase):
    @settings(deadline=None, max_examples=15)
    @given(
        seed=st.integers(0, 2**31 - 1),
        t=st.integers(0, 48),
        scale=st.floats(0.5, 4.0),
    )
    def test_char_random_logits(self, seed, t, scale):
        """Random raw logits decode identically on host and device."""
        host, dev = _pair("char", _CHAR_ALPHABET)
        rng = np.random.RandomState(seed)
        mat = rng.randn(t, len(SAMPLE_LABELS)) * scale
        hb = host.decode_beams(mat, beam_width=5)
        db = dev.decode_beams(mat, beam_width=5)
        self.assertEqual(hb[0].text, db[0].text)
        self.assertAlmostEqual(hb[0].lm_score, db[0].lm_score, delta=SCORE_TOL)
        self.assertEqual(hb[0].text_frames, db[0].text_frames)

    @settings(deadline=None, max_examples=10)
    @given(seed=st.integers(0, 2**31 - 1), t=st.integers(1, 40))
    def test_bpe_random_logits(self, seed, t):
        """BPE alphabets (incl. double-bounded ▁⁇▁) match the host."""
        host, dev = _pair("bpe", _BPE_ALPHABET)
        rng = np.random.RandomState(seed)
        mat = rng.randn(t, len(_BPE_ALPHABET.labels)) * 2.0
        hb = host.decode_beams(mat, beam_width=5)
        db = dev.decode_beams(mat, beam_width=5)
        self.assertEqual(hb[0].text, db[0].text)
        self.assertAlmostEqual(hb[0].lm_score, db[0].lm_score, delta=SCORE_TOL)

    @settings(deadline=None, max_examples=8)
    @given(
        seed=st.integers(0, 2**31 - 1),
        prune=st.floats(-15.0, -2.0),
        tmin=st.floats(-8.0, -1.0),
    )
    def test_char_random_knobs(self, seed, prune, tmin):
        """Random pruning knobs preserve parity."""
        host, dev = _pair("char", _CHAR_ALPHABET)
        rng = np.random.RandomState(seed)
        mat = rng.randn(20, len(SAMPLE_LABELS)) * 2.0
        hb = host.decode_beams(
            mat, beam_width=4, beam_prune_logp=prune, token_min_logp=tmin
        )
        db = dev.decode_beams(
            mat, beam_width=4, beam_prune_logp=prune, token_min_logp=tmin
        )
        self.assertEqual(hb[0].text, db[0].text)
        self.assertAlmostEqual(hb[0].lm_score, db[0].lm_score, delta=SCORE_TOL)


@pytest.mark.skipif(not os.path.exists(ARPA), reason="reference fixtures absent")
class TestDeviceFuzzLM(unittest.TestCase):
    @classmethod
    def setUpClass(cls):
        lm = LanguageModel(
            NGramModel.from_file(ARPA), TEST_UNIGRAMS, alpha=0.6, beta=1.0,
            unk_score_offset=-5.0,
        )
        cls.host = BeamSearchDecoderCTC(_CHAR_ALPHABET, lm)
        cls.dev = TPUBeamSearchDecoderCTC(_CHAR_ALPHABET, lm)

    @classmethod
    def tearDownClass(cls):
        BeamSearchDecoderCTC.clear_class_models()

    @settings(deadline=None, max_examples=12)
    @given(seed=st.integers(0, 2**31 - 1), t=st.integers(1, 40))
    def test_lm_random_logits(self, seed, t):
        """LM-fused decoding parity incl. output LM states."""
        rng = np.random.RandomState(seed)
        mat = rng.randn(t, len(SAMPLE_LABELS)) * 2.0
        hb = self.host.decode_beams(mat, beam_width=5)
        db = self.dev.decode_beams(mat, beam_width=5)
        self.assertEqual(hb[0].text, db[0].text)
        self.assertAlmostEqual(hb[0].lm_score, db[0].lm_score, delta=SCORE_TOL)
        self.assertEqual(hb[0].last_lm_state, db[0].last_lm_state)


class TestDevOtherDifficultyParity(unittest.TestCase):
    """Host-device parity on the bench headline workload shape.

    Synthetic utterances at DEV_OTHER_DIFFICULTY (greedy WER ~10%, wide
    admission tails) with the auto preselect and blank collapse — the exact
    configuration bench.py's parity booleans rely on, pinned here in CI.
    """

    @classmethod
    def setUpClass(cls):
        lm = LanguageModel(
            NGramModel.from_file(ARPA), TEST_UNIGRAMS, alpha=0.6, beta=1.0,
        )
        cls.host = BeamSearchDecoderCTC(_CHAR_ALPHABET, lm)
        cls.dev = TPUBeamSearchDecoderCTC(_CHAR_ALPHABET, lm)

    @classmethod
    def tearDownClass(cls):
        BeamSearchDecoderCTC.clear_class_models()

    def test_auto_k_and_blank_collapse_parity(self):
        from pyctcdecode_tpu.evaluation import (
            DEV_OTHER_DIFFICULTY,
            synthesize_corpus,
        )

        corpus = synthesize_corpus(
            SAMPLE_LABELS, TEST_UNIGRAMS, n_utterances=6, seed=17,
            **dict(DEV_OTHER_DIFFICULTY, words_per_utterance=(4, 8)),
        )
        want = [
            self.host.decode(m, beam_width=25) for m in corpus.logits
        ]
        got = self.dev.decode_batch(
            corpus.logits, beam_width=25, max_tokens_per_frame="auto"
        )
        self.assertEqual(got, want)
        collapsed = self.dev.decode_batch(
            corpus.logits, beam_width=25, max_tokens_per_frame="auto",
            blank_collapse=True,
        )
        self.assertEqual(collapsed, want)
        serving = self.dev.decode_batch(
            corpus.logits, beam_width=25, max_tokens_per_frame="auto",
            blank_collapse=True, length_bucketing=True,
        )
        self.assertEqual(serving, want)


if __name__ == "__main__":
    unittest.main()
