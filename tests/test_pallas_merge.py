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
        """Guard fires only when even single-column chunks exceed VMEM."""
        import jax.numpy as jnp

        from pyctcdecode_tpu.ops.pallas_merge import _k_chunk, merge_score_pallas

        # large K alone is fine now: the sweep chunks token columns
        self.assertEqual(_k_chunk(600, 100), 50)
        # but B*B itself past VMEM cannot be chunked (kc floors at 1)
        big = jnp.zeros((4, 2000), dtype=jnp.uint32)
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




class TestKChunkedMerge(unittest.TestCase):
    """Forced token-column chunking must match the unchunked sweep."""

    def test_forced_chunk_matches(self):
        import os

        import jax
        import jax.numpy as jnp

        from pyctcdecode_tpu.engine import DEAD, _merge_dense
        from pyctcdecode_tpu.ops import pallas_merge as pm

        rng = np.random.RandomState(7)
        k, b = 12, 32
        kl = rng.randint(0, 5, size=(k, b)).astype(np.uint32)
        kh = kl * np.uint32(2654435761)
        valid = rng.rand(k, b) < 0.7
        logit = np.where(valid, rng.randn(k, b), DEAD).astype(np.float32)
        extra = rng.randn(k, b).astype(np.float32)
        args = (
            jnp.asarray(kl), jnp.asarray(kh),
            jnp.asarray(valid.astype(np.int32)),
            jnp.asarray(logit), jnp.asarray(extra), jnp.float32(-10.0),
        )
        old = os.environ.get("PYCTCDECODE_TPU_MERGE_KCHUNK")
        try:
            os.environ["PYCTCDECODE_TPU_MERGE_KCHUNK"] = "4"
            self.assertEqual(pm._k_chunk(k, b), 4)
            s_c, m_c, src_c = pm.merge_score_pallas(*args, interpret=True)
        finally:
            if old is None:
                os.environ.pop("PYCTCDECODE_TPU_MERGE_KCHUNK", None)
            else:
                os.environ["PYCTCDECODE_TPU_MERGE_KCHUNK"] = old
        merged, dup, donor = _merge_dense(
            jnp, (args[0], args[1]), jnp.asarray(valid), args[3]
        )
        rep = jnp.asarray(valid) & ~dup
        score = jnp.where(rep, merged + args[4], DEAD)
        score = jnp.where(score >= jnp.max(score) - 10.0, score, DEAD)
        np.testing.assert_allclose(
            np.asarray(s_c), np.asarray(score), atol=1e-5
        )


if __name__ == "__main__":
    unittest.main()
