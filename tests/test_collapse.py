"""Blank collapse (arXiv:2210.17017 analog): exactness-preserving frame drop.

A frame whose argmax is blank and whose every other token falls below
``token_min_logp`` admits only the blank "stay" transition, so collapsing
each such run to its first frame must reproduce the full decode exactly:
same texts, same ranking, same word frame spans (original indices), and —
after the dropped-blank score offset is restored — the same scores.
"""
import json
import os
import unittest

import numpy as np

from pyctcdecode_tpu import Alphabet
from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC
from pyctcdecode_tpu.utils.logits import blank_collapse, normalize_to_logp

from .helpers import SAMPLE_LABELS, TEST_PROBS

LIBRI = "/root/reference/pyctcdecode/tests/sample_data/libri_logits.json"
LIBRI_LABELS = [" "] + list("abcdefghijklmnopqrstuvwxyz") + ["'"] + [""]


def _blanky_logits(rng, t, v, blank_id, run_p=0.55):
    """Random logits with interspersed blank-certain runs."""
    mats = []
    i = 0
    while i < t:
        if rng.rand() < run_p:
            run = rng.randint(1, 5)
            block = np.full((run, v), -30.0, dtype=np.float32)
            block[:, blank_id] = -1e-4
            mats.append(block)
            i += run
        else:
            mats.append(rng.randn(1, v).astype(np.float32) * 2.0)
            i += 1
    return np.concatenate(mats)[:t]


class TestBlankCollapseHelper(unittest.TestCase):
    def test_keeps_run_heads_and_sums_dropped_blanks(self):
        v, blank = 4, 3
        logp = np.full((6, v), -30.0, dtype=np.float32)
        logp[:, blank] = -0.001
        logp[2] = np.log(np.array([0.5, 0.2, 0.2, 0.1], dtype=np.float32))
        keep, off = blank_collapse(logp, blank, -5.0)
        # frames 0..1 are one run (keep 0), 2 is loud, 3..5 one run (keep 3)
        np.testing.assert_array_equal(keep, [0, 2, 3])
        self.assertAlmostEqual(off, float(logp[1, blank] + logp[4:, blank].sum()), places=6)

    def test_empty_input(self):
        keep, off = blank_collapse(np.zeros((0, 4), np.float32), 3, -5.0)
        self.assertEqual(len(keep), 0)
        self.assertEqual(off, 0.0)


class TestBlankCollapseDecode(unittest.TestCase):
    def _assert_equal_decodes(self, dec, mats, **kw):
        full = dec.decode_beams_batch(mats, **kw)
        fast = dec.decode_beams_batch(mats, blank_collapse=True, **kw)
        for fu, fa in zip(full, fast):
            self.assertEqual([b.text for b in fu], [b.text for b in fa])
            for bu, ba in zip(fu, fa):
                self.assertEqual(bu.text_frames, ba.text_frames)
                self.assertAlmostEqual(bu.logit_score, ba.logit_score, places=2)
                self.assertAlmostEqual(bu.lm_score, ba.lm_score, places=2)

    def test_fuzz_matches_full_decode(self):
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        dec = TPUBeamSearchDecoderCTC(alphabet)
        blank = SAMPLE_LABELS.index("")
        rng = np.random.RandomState(5)
        mats = [
            _blanky_logits(rng, rng.randint(6, 40), len(SAMPLE_LABELS), blank)
            for _ in range(6)
        ]
        self._assert_equal_decodes(dec, mats, beam_width=6)

    def test_fuzz_with_lm_matches_full_decode(self):
        arpa = "/root/reference/pyctcdecode/tests/sample_data/bugs_bunny_kenlm.arpa"
        if not os.path.exists(arpa):
            self.skipTest("reference fixture absent")
        from pyctcdecode_tpu import LanguageModel
        from pyctcdecode_tpu.models.ngram import NGramModel

        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        lm = LanguageModel(NGramModel.from_file(arpa), ["bugs", "bunny"])
        dec = TPUBeamSearchDecoderCTC(alphabet, lm)
        blank = SAMPLE_LABELS.index("")
        rng = np.random.RandomState(9)
        mats = [
            _blanky_logits(rng, rng.randint(6, 30), len(SAMPLE_LABELS), blank)
            for _ in range(4)
        ]
        self._assert_equal_decodes(dec, mats, beam_width=6)

    def test_with_length_bucketing_collapses_before_grouping(self):
        """blank_collapse + length_bucketing: buckets form over collapsed
        lengths (a long blank-heavy utterance may share a short bucket) and
        results still match the plain full decode exactly."""
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        dec = TPUBeamSearchDecoderCTC(alphabet)
        blank = SAMPLE_LABELS.index("")
        rng = np.random.RandomState(13)
        v = len(SAMPLE_LABELS)
        # one long but blank-dominated utterance, several short loud ones
        mats = [_blanky_logits(rng, 160, v, blank, run_p=0.9)]
        mats += [rng.randn(t, v).astype(np.float32) * 2.0
                 for t in (12, 35, 70, 9)]
        full = dec.decode_beams_batch(mats, beam_width=6)
        fast = dec.decode_beams_batch(
            mats, beam_width=6, blank_collapse=True, length_bucketing=True
        )
        for fu, fa in zip(full, fast):
            self.assertEqual([b.text for b in fu], [b.text for b in fa])
            self.assertEqual(fu[0].text_frames, fa[0].text_frames)
            self.assertAlmostEqual(fu[0].logit_score, fa[0].logit_score,
                                   places=2)
        # the long utterance must actually land in a smaller bucket
        pre = dec._collapse_all(mats, -5.0)
        self.assertLess(pre[0][0].shape[0], 96)

    def test_single_utterance_api(self):
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        dec = TPUBeamSearchDecoderCTC(alphabet)
        full = dec.decode_beams(TEST_PROBS, beam_width=6)
        fast = dec.decode_beams(TEST_PROBS, beam_width=6, blank_collapse=True)
        self.assertEqual(full[0].text, fast[0].text)
        self.assertEqual(full[0].text_frames, fast[0].text_frames)
        self.assertAlmostEqual(full[0].logit_score, fast[0].logit_score, places=3)

    @unittest.skipUnless(os.path.exists(LIBRI), "reference fixture absent")
    def test_libri_fixture_exact_text_frames_scores(self):
        logits = np.array(json.load(open(LIBRI)), dtype=np.float32)
        alphabet = Alphabet.build_alphabet(LIBRI_LABELS)
        dec = TPUBeamSearchDecoderCTC(alphabet)
        full = dec.decode_beams(logits, beam_width=12)
        fast = dec.decode_beams(logits, beam_width=12, blank_collapse=True)
        self.assertEqual(full[0].text, fast[0].text)
        self.assertEqual(full[0].text_frames, fast[0].text_frames)
        self.assertAlmostEqual(full[0].logit_score, fast[0].logit_score, places=2)
        # the fixture really compresses (the feature's point)
        keep, _ = blank_collapse(
            normalize_to_logp(logits), LIBRI_LABELS.index(""), -5.0
        )
        self.assertLess(len(keep), 0.8 * logits.shape[0])


if __name__ == "__main__":
    unittest.main()
