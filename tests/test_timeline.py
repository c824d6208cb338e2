"""Token-timeline decoding: exact admission at chunked per-step cost.

``token_chunking=K`` builds host-side timelines of each frame's exactly-
admitted token set (threshold OR argmax) split into K-wide chunks
(``utils.logits.token_timeline``); the engine scans chunks with a carried
candidate pool and promotes the pool to the beam set on each frame's last
chunk. These tests pin the exactness claim against the dense engine for
every chunk width: same texts, ranking, word frame spans, and scores.
"""
import json
import os
import unittest

import numpy as np

from pyctcdecode_tpu import Alphabet
from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC
from pyctcdecode_tpu.utils.logits import normalize_to_logp, token_timeline

from .helpers import SAMPLE_LABELS, TEST_PROBS

LIBRI = "/root/reference/pyctcdecode/tests/sample_data/libri_logits.json"
LIBRI_LABELS = [" "] + list("abcdefghijklmnopqrstuvwxyz") + ["'"] + [""]
ARPA = "/root/reference/pyctcdecode/tests/sample_data/bugs_bunny_kenlm.arpa"


class TestTimelineBuilder(unittest.TestCase):
    def test_reconstructs_admitted_sets(self):
        rng = np.random.RandomState(0)
        lp = normalize_to_logp(rng.randn(40, 9).astype(np.float32) * 3.0)
        toks, tlogp, fin, cbase, fids = token_timeline(lp, -5.0, 3)
        admit = lp >= -5.0
        admit[np.arange(40), lp.argmax(1)] = True
        for t in range(40):
            steps = np.flatnonzero(fids == t)
            got = toks[steps].ravel()
            got = got[got >= 0]
            np.testing.assert_array_equal(got, np.flatnonzero(admit[t]))
            self.assertTrue(fin[steps[-1]])
            self.assertFalse(fin[steps[:-1]].any())
            np.testing.assert_array_equal(
                cbase[steps], np.arange(len(steps)) * 3
            )
            for s in steps:
                for j in range(3):
                    if toks[s, j] >= 0:
                        self.assertEqual(tlogp[s, j], lp[t, toks[s, j]])

    def test_empty_and_single_frame(self):
        toks, _, fin, _, fids = token_timeline(
            np.zeros((0, 5), np.float32), -5.0, 2
        )
        self.assertEqual(len(fin), 0)
        toks, _, fin, _, fids = token_timeline(
            np.zeros((1, 5), np.float32), -5.0, 2
        )
        # all 5 tokens admitted -> 3 chunks of one frame
        self.assertEqual(len(fin), 3)
        self.assertTrue(fin[-1])
        self.assertTrue((fids == 0).all())


class TestTimelineDecode(unittest.TestCase):
    def _assert_equal(self, dec, mats, kcs=(2, 4), **kw):
        full = dec.decode_beams_batch(mats, **kw)
        for kc in kcs:
            fast = dec.decode_beams_batch(mats, token_chunking=kc, **kw)
            for fu, fa in zip(full, fast):
                self.assertEqual([b.text for b in fu], [b.text for b in fa])
                for bu, ba in zip(fu, fa):
                    self.assertEqual(bu.text_frames, ba.text_frames)
                    self.assertAlmostEqual(
                        bu.logit_score, ba.logit_score, places=2
                    )
                    self.assertAlmostEqual(bu.lm_score, ba.lm_score, places=2)

    def test_fuzz_matches_dense(self):
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        dec = TPUBeamSearchDecoderCTC(alphabet)
        rng = np.random.RandomState(7)
        v = len(SAMPLE_LABELS)
        mats = [rng.randn(rng.randint(6, 40), v).astype(np.float32) * 2.0
                for _ in range(6)]
        self._assert_equal(dec, mats, beam_width=6)

    def test_fuzz_with_lm_and_hotwords(self):
        if not os.path.exists(ARPA):
            self.skipTest("reference fixture absent")
        from pyctcdecode_tpu import LanguageModel
        from pyctcdecode_tpu.models.ngram import NGramModel

        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        lm = LanguageModel(NGramModel.from_file(ARPA), ["bugs", "bunny"])
        dec = TPUBeamSearchDecoderCTC(alphabet, lm)
        rng = np.random.RandomState(11)
        v = len(SAMPLE_LABELS)
        mats = [rng.randn(rng.randint(6, 30), v).astype(np.float32) * 2.0
                for _ in range(4)]
        self._assert_equal(dec, mats, beam_width=6)
        self._assert_equal(
            dec, mats, beam_width=6, hotwords=["bugs"], hotword_weight=5.0
        )

    def test_with_collapse_and_bucketing(self):
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        dec = TPUBeamSearchDecoderCTC(alphabet)
        rng = np.random.RandomState(3)
        v = len(SAMPLE_LABELS)
        mats = [rng.randn(t, v).astype(np.float32) * 2.0
                for t in (12, 35, 70, 9, 160)]
        full = dec.decode_beams_batch(mats, beam_width=6)
        fast = dec.decode_beams_batch(
            mats, beam_width=6, token_chunking=4,
            blank_collapse=True, length_bucketing=True,
        )
        for fu, fa in zip(full, fast):
            self.assertEqual([b.text for b in fu], [b.text for b in fa])
            self.assertEqual(fu[0].text_frames, fa[0].text_frames)
            self.assertAlmostEqual(fu[0].logit_score, fa[0].logit_score,
                                   places=2)

    def test_bpe_alphabet(self):
        labels = ["▁bug", "▁bun", "s", "ny", "▁", ""]
        alphabet = Alphabet.build_alphabet(labels)
        self.assertTrue(alphabet.is_bpe)
        dec = TPUBeamSearchDecoderCTC(alphabet)
        rng = np.random.RandomState(21)
        mats = [rng.randn(rng.randint(5, 25), len(labels)).astype(np.float32)
                * 2.0 for _ in range(4)]
        self._assert_equal(dec, mats, beam_width=5, kcs=(2, 3))

    def test_one_hot_ties_match_dense_order(self):
        """Equal-score ties must resolve in enumeration order, as dense."""
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        dec = TPUBeamSearchDecoderCTC(alphabet)
        self._assert_equal(dec, [TEST_PROBS], kcs=(2, 3, 5), beam_width=8)

    @unittest.skipUnless(os.path.exists(LIBRI), "reference fixture absent")
    def test_libri_fixture(self):
        logits = np.array(json.load(open(LIBRI)), dtype=np.float32)
        alphabet = Alphabet.build_alphabet(LIBRI_LABELS)
        dec = TPUBeamSearchDecoderCTC(alphabet)
        self._assert_equal(dec, [logits], kcs=(4,), beam_width=12)


    def test_fast_topk_timeline_matches(self):
        """approx_max_k pool ranking == exact top_k on non-tied inputs."""
        import json

        if not os.path.exists(LIBRI):
            self.skipTest("reference fixtures absent")
        logits = np.array(json.load(open(LIBRI)), dtype=np.float32)
        alphabet = Alphabet.build_alphabet(LIBRI_LABELS)
        dec = TPUBeamSearchDecoderCTC(alphabet)
        fast = dec.with_options(fast_topk=True)
        want = dec.decode_beams_batch([logits], token_chunking=4, beam_width=12)
        got = fast.decode_beams_batch([logits], token_chunking=4, beam_width=12)
        self.assertEqual(
            [b.text for b in want[0]], [b.text for b in got[0]]
        )

    def test_stats_supported(self):
        """Timeline mode collects stats (full test in test_stats.py)."""
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        dec = TPUBeamSearchDecoderCTC(alphabet)
        results, stats = dec.decode_beams_batch(
            [TEST_PROBS], token_chunking=4, collect_stats=True
        )
        self.assertEqual(stats[0]["frames"], TEST_PROBS.shape[0])


if __name__ == "__main__":
    unittest.main()
