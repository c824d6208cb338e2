"""Pallas fused merge+window-prune kernel parity (interpret mode on CPU)."""
import os
import unittest

import numpy as np
import pytest

from pyctcdecode_tpu import Alphabet, BeamSearchDecoderCTC, LanguageModel
from pyctcdecode_tpu.models.ngram import NGramModel
from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC

from .helpers import SAMPLE_LABELS, TEST_PROBS, TEST_UNIGRAMS

ARPA = "/root/reference/pyctcdecode/tests/sample_data/bugs_bunny_kenlm.arpa"
SCORE_TOL = 2e-3


class TestPallasMerge(unittest.TestCase):
    def tearDown(self):
        BeamSearchDecoderCTC.clear_class_models()

    def test_no_lm_parity(self):
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        host = BeamSearchDecoderCTC(alphabet)
        dev = TPUBeamSearchDecoderCTC(alphabet, use_pallas_merge=True)
        rng = np.random.RandomState(41)
        for _ in range(4):
            mat = rng.randn(rng.randint(2, 25), len(SAMPLE_LABELS)) * 2.0
            hb = host.decode_beams(mat, beam_width=6)
            db = dev.decode_beams(mat, beam_width=6)
            self.assertEqual(hb[0].text, db[0].text)
            self.assertAlmostEqual(hb[0].lm_score, db[0].lm_score, delta=SCORE_TOL)

    def test_batch_vmap_parity(self):
        """The vmapped batch path (grid-lifted kernel) matches host decodes."""
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        host = BeamSearchDecoderCTC(alphabet)
        dev = TPUBeamSearchDecoderCTC(alphabet, use_pallas_merge=True)
        rng = np.random.RandomState(43)
        mats = [rng.randn(rng.randint(3, 20), len(SAMPLE_LABELS)) * 2.0
                for _ in range(5)]
        got = dev.decode_batch(mats, beam_width=6)
        for mat, text in zip(mats, got):
            self.assertEqual(host.decode(mat, beam_width=6), text)

    def test_vmem_guard(self):
        """Oversized K*B*B raises a clear error instead of a Mosaic failure."""
        import jax.numpy as jnp

        from pyctcdecode_tpu.ops.pallas_merge import merge_score_pallas

        big = jnp.zeros((600, 100), dtype=jnp.uint32)
        with self.assertRaisesRegex(ValueError, "use_pallas_merge"):
            merge_score_pallas(
                big, big, big != 0, big.astype(jnp.float32),
                big.astype(jnp.float32), jnp.float32(-10.0),
                interpret=True,
            )

    def test_segmented_batch_parity(self):
        """Kernel inside host-dispatched segment programs (the bench path)."""
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        host = BeamSearchDecoderCTC(alphabet)
        dev = TPUBeamSearchDecoderCTC(
            alphabet, use_pallas_merge=True, segment_frames=8
        )
        rng = np.random.RandomState(11)
        mats = [rng.randn(rng.randint(3, 30), len(SAMPLE_LABELS)) * 2.0
                for _ in range(4)]
        got = dev.decode_batch(mats, beam_width=6)
        for mat, text in zip(mats, got):
            self.assertEqual(host.decode(mat, beam_width=6), text)

    def test_bpe_parity(self):
        """BPE alphabets exercise the kernel's force-break key lane."""
        labels = ["▁bug", "▁bun", "s", "ny", "▁⁇▁", ""]
        alphabet = Alphabet.build_alphabet(labels)
        host = BeamSearchDecoderCTC(alphabet)
        dev = TPUBeamSearchDecoderCTC(alphabet, use_pallas_merge=True)
        rng = np.random.RandomState(7)
        for _ in range(4):
            mat = rng.randn(rng.randint(4, 22), len(labels)) * 2.0
            self.assertEqual(
                host.decode(mat, beam_width=5), dev.decode(mat, beam_width=5)
            )

    @pytest.mark.skipif(not os.path.exists(ARPA), reason="reference fixtures absent")
    def test_hotword_parity(self):
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        host = BeamSearchDecoderCTC(alphabet)
        dev = TPUBeamSearchDecoderCTC(alphabet, use_pallas_merge=True)
        hb = host.decode_beams(TEST_PROBS, hotwords=["bugs"], hotword_weight=8.0)
        db = dev.decode_beams(TEST_PROBS, hotwords=["bugs"], hotword_weight=8.0)
        self.assertEqual(hb[0].text, db[0].text)
        self.assertAlmostEqual(hb[0].lm_score, db[0].lm_score, delta=SCORE_TOL)

    @pytest.mark.skipif(not os.path.exists(ARPA), reason="reference fixtures absent")
    def test_lm_parity(self):
        lm = LanguageModel(
            NGramModel.from_file(ARPA), TEST_UNIGRAMS, alpha=1.0, unk_score_offset=0.0
        )
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        host = BeamSearchDecoderCTC(alphabet, lm)
        dev = TPUBeamSearchDecoderCTC(alphabet, lm, use_pallas_merge=True)
        hb = host.decode_beams(TEST_PROBS, beam_width=16)
        db = dev.decode_beams(TEST_PROBS, beam_width=16)
        self.assertEqual(db[0].text, "bugs bunny")
        self.assertEqual(hb[0].text, db[0].text)
        self.assertAlmostEqual(hb[0].lm_score, db[0].lm_score, delta=SCORE_TOL)


if __name__ == "__main__":
    unittest.main()
