"""alpha/beta grid-search sweep tests (ref tutorial 03 cell 27 as an API)."""
import os
import unittest

import pytest

from pyctcdecode_tpu import Alphabet, BeamSearchDecoderCTC, LanguageModel
from pyctcdecode_tpu.models.ngram import NGramModel
from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC
from pyctcdecode_tpu.utils.tuning import grid_search_alpha_beta

from .helpers import SAMPLE_LABELS, TEST_PROBS, TEST_UNIGRAMS

ARPA = "/root/reference/pyctcdecode/tests/sample_data/bugs_bunny_kenlm.arpa"


@pytest.mark.skipif(not os.path.exists(ARPA), reason="reference fixtures absent")
class TestGridSearch(unittest.TestCase):
    def tearDown(self):
        BeamSearchDecoderCTC.clear_class_models()

    def test_sweep_finds_lm_weighting(self):
        """High alpha wins on the ambiguous fixture ('bugs bunny' ref)."""
        lm = LanguageModel(
            NGramModel.from_file(ARPA), TEST_UNIGRAMS, unk_score_offset=0.0
        )
        dev = TPUBeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS), lm)
        best, grid = grid_search_alpha_beta(
            dev,
            [TEST_PROBS, TEST_PROBS],
            ["bugs bunny", "bugs bunny"],
            alphas=(0.0, 1.0),
            betas=(0.0, 1.5),
            beam_width=16,
        )
        self.assertEqual(len(grid), 4)
        self.assertEqual(best.wer, 0.0)
        self.assertEqual(best.alpha, 1.0)
        # params restored after the sweep
        self.assertEqual(lm.alpha, 0.5)

    def test_sweep_on_host_engine(self):
        lm = LanguageModel(
            NGramModel.from_file(ARPA), TEST_UNIGRAMS, unk_score_offset=0.0
        )
        host = BeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS), lm)
        best, grid = grid_search_alpha_beta(
            host,
            [TEST_PROBS],
            ["bugs bunny"],
            alphas=(0.0, 1.0),
            betas=(1.5,),
            beam_width=16,
        )
        self.assertEqual(best.alpha, 1.0)
        self.assertEqual(best.wer, 0.0)


if __name__ == "__main__":
    unittest.main()
