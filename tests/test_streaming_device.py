"""Device streaming API tests: chunked decode == full decode, vs host oracle."""
import os
import unittest

import numpy as np
import pytest

from pyctcdecode_tpu import Alphabet, BeamSearchDecoderCTC, LanguageModel
from pyctcdecode_tpu.decoder import Beam
from pyctcdecode_tpu.models.hotwords import HotwordScorer
from pyctcdecode_tpu.models.ngram import NGramModel
from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC

from .helpers import SAMPLE_LABELS, TEST_LOGITS, TEST_UNIGRAMS

ARPA = "/root/reference/pyctcdecode/tests/sample_data/bugs_bunny_kenlm.arpa"
SCORE_TOL = 2e-3


def _host_chunked(decoder, chunks, offsets, **kwargs):
    beams, lm_cache, p_cache = decoder.get_starting_state()
    out = None
    last = len(chunks) - 1
    for i, (chunk, offset) in enumerate(zip(chunks, offsets)):
        out = decoder.partial_decode_beams(
            chunk, lm_cache, p_cache, beams, offset, is_end=(i == last), **kwargs
        )
        if i != last:
            beams = [Beam.from_lm_beam(b) for b in out]
    return out


def _dev_chunked(decoder, chunks, beam_width=16, **kwargs):
    state = decoder.get_starting_state(beam_width=beam_width)
    out = None
    last = len(chunks) - 1
    for i, chunk in enumerate(chunks):
        out = decoder.partial_decode_beams(
            state, chunk, is_end=(i == last), **kwargs
        )
    return out


class TestDeviceStreaming(unittest.TestCase):
    def tearDown(self):
        BeamSearchDecoderCTC.clear_class_models()

    def _chunks(self):
        return [TEST_LOGITS[:3], TEST_LOGITS[3:8], TEST_LOGITS[8:]]

    def test_chunked_equals_full_no_lm(self):
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        dev = TPUBeamSearchDecoderCTC(alphabet)
        full = dev.decode_beams(TEST_LOGITS, beam_width=16)
        chunked = _dev_chunked(dev, self._chunks(), beam_width=16)
        self.assertEqual(chunked[0].text, "bunny bunny")
        for f, c in zip(full[:3], chunked[:3]):
            self.assertEqual(f.text, c.text)
            self.assertEqual([wf[1] for wf in f.text_frames], c.text_frames)
            self.assertAlmostEqual(f.logit_score, c.logit_score, delta=SCORE_TOL)
            self.assertAlmostEqual(f.lm_score, c.lm_score, delta=SCORE_TOL)

    def test_chunked_matches_host_streaming(self):
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        host = BeamSearchDecoderCTC(alphabet)
        dev = TPUBeamSearchDecoderCTC(alphabet)
        hb = _host_chunked(host, self._chunks(), [0, 3, 8], beam_width=16)
        db = _dev_chunked(dev, self._chunks(), beam_width=16)
        for h, d in zip(hb[:3], db[:3]):
            self.assertEqual(h.text, d.text)
            self.assertEqual(h.text_frames, d.text_frames)
            self.assertAlmostEqual(h.logit_score, d.logit_score, delta=SCORE_TOL)

    def test_intermediate_views_match_host(self):
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        host = BeamSearchDecoderCTC(alphabet)
        dev = TPUBeamSearchDecoderCTC(alphabet)

        beams, lm_cache, p_cache = host.get_starting_state()
        state = dev.get_starting_state(beam_width=16)
        chunks = self._chunks()
        offsets = [0, 3, 8]
        for i, chunk in enumerate(chunks[:-1]):
            hb = host.partial_decode_beams(
                chunk, lm_cache, p_cache, beams, offsets[i], beam_width=16
            )
            beams = [Beam.from_lm_beam(b) for b in hb]
            db = dev.partial_decode_beams(state, chunk)
            self.assertEqual(hb[0].text, db[0].text)
            self.assertEqual(hb[0].partial_word, db[0].partial_word)
            self.assertEqual(hb[0].text_frames, db[0].text_frames)
            self.assertEqual(hb[0].partial_frames, db[0].partial_frames)
            self.assertAlmostEqual(hb[0].logit_score, db[0].logit_score, delta=SCORE_TOL)
            self.assertAlmostEqual(hb[0].lm_score, db[0].lm_score, delta=SCORE_TOL)

    @pytest.mark.skipif(not os.path.exists(ARPA), reason="reference fixtures absent")
    def test_chunked_equals_full_with_lm(self):
        lm = LanguageModel(
            NGramModel.from_file(ARPA), TEST_UNIGRAMS, alpha=1.0, unk_score_offset=0.0
        )
        dev = TPUBeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS), lm)
        full = dev.decode_beams(TEST_LOGITS, beam_width=16)
        chunked = _dev_chunked(dev, self._chunks(), beam_width=16)
        self.assertEqual(chunked[0].text, "bugs bunny")
        for f, c in zip(full[:3], chunked[:3]):
            self.assertEqual(f.text, c.text)
            self.assertAlmostEqual(f.lm_score, c.lm_score, delta=SCORE_TOL)

    @pytest.mark.skipif(not os.path.exists(ARPA), reason="reference fixtures absent")
    def test_force_next_word_mid_stream(self):
        lm = LanguageModel(
            NGramModel.from_file(ARPA), TEST_UNIGRAMS, alpha=1.0, unk_score_offset=0.0
        )
        host = BeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS), lm)
        dev = TPUBeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS), lm)

        chunks = self._chunks()
        # host path with force_next_word on the middle chunk
        beams, lm_cache, p_cache = host.get_starting_state()
        hb = None
        for i, chunk in enumerate(chunks):
            hb = host.partial_decode_beams(
                chunk,
                lm_cache,
                p_cache,
                beams,
                [0, 3, 8][i],
                beam_width=16,
                force_next_word=(i == 1),
                is_end=(i == 2),
            )
            if i != 2:
                beams = [Beam.from_lm_beam(b) for b in hb]
        state = dev.get_starting_state(beam_width=16)
        db = None
        for i, chunk in enumerate(chunks):
            db = dev.partial_decode_beams(
                state, chunk, force_next_word=(i == 1), is_end=(i == 2)
            )
        self.assertEqual(hb[0].text, db[0].text)
        self.assertEqual(hb[0].text_frames, db[0].text_frames)
        self.assertAlmostEqual(hb[0].logit_score, db[0].logit_score, delta=SCORE_TOL)
        self.assertAlmostEqual(hb[0].lm_score, db[0].lm_score, delta=SCORE_TOL)

    def test_chunked_with_hotwords(self):
        """ref test_streaming: hotwords flip greedy outcome mid-stream."""
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        dev = TPUBeamSearchDecoderCTC(alphabet)
        state = dev.get_starting_state(beam_width=16, hotwords_enabled=True)
        chunks = self._chunks()
        out = None
        for i, chunk in enumerate(chunks):
            out = dev.partial_decode_beams(
                state,
                chunk,
                hotwords=["bugs"],
                hotword_weight=25.0,
                is_end=(i == len(chunks) - 1),
            )
        self.assertEqual(out[0].text, "bugs bunny")
        # equals the one-shot hotword decode
        full = dev.decode_beams(
            TEST_LOGITS, beam_width=16, hotwords=["bugs"], hotword_weight=25.0
        )
        self.assertEqual(full[0].text, out[0].text)
        self.assertAlmostEqual(full[0].logit_score, out[0].logit_score, delta=SCORE_TOL)

    def test_swappable_hotword_scorers(self):
        """Dropping the boost mid-word prevents completion (ref behavior)."""
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        host = BeamSearchDecoderCTC(alphabet)
        dev = TPUBeamSearchDecoderCTC(alphabet)
        chunks = self._chunks()

        state = dev.get_starting_state(beam_width=16, hotwords_enabled=True)
        per_chunk = [(["bugs"], 15.0), (["bunny"], 15.0), (None, 0.0)]
        out = None
        for i, chunk in enumerate(chunks):
            hws, w = per_chunk[i]
            out = dev.partial_decode_beams(
                state, chunk, hotwords=hws, hotword_weight=w,
                is_end=(i == len(chunks) - 1),
            )
        self.assertEqual(out[0].text, "bugny bunny")

        # boost kept through the word, swapped after -> full word survives
        state = dev.get_starting_state(beam_width=16, hotwords_enabled=True)
        per_chunk = [(["bugs"], 15.0), (["bugs"], 15.0), (["bunny"], 15.0)]
        for i, chunk in enumerate(chunks):
            hws, w = per_chunk[i]
            out = dev.partial_decode_beams(
                state, chunk, hotwords=hws, hotword_weight=w,
                is_end=(i == len(chunks) - 1),
            )
        self.assertEqual(out[0].text, "bugs bunny")

    def test_force_commit_folds_backpointer_log(self):
        """A force-commit collapses the chunk log; views stay correct after.

        Long-running streams must not accumulate per-frame backpointers
        forever (the carried state is O(beams) in the reference,
        ref decoder.py:669-728); committed prefixes fold into per-slot word
        lists at every commit boundary.
        """
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        dev = TPUBeamSearchDecoderCTC(alphabet)
        chunks = self._chunks()
        state = dev.get_starting_state(beam_width=16)
        out = None
        for i, chunk in enumerate(chunks):
            out = dev.partial_decode_beams(
                state, chunk, force_next_word=(i == 1), is_end=(i == 2)
            )
            if i == 1:
                self.assertEqual(state.chunks, [])  # folded at the commit
                self.assertIsNotNone(state.prefix_words)
        # matches the host engine run with the same mid-stream commit
        host = BeamSearchDecoderCTC(alphabet)
        beams, lm_cache, p_cache = host.get_starting_state()
        hb = None
        for i, chunk in enumerate(chunks):
            hb = host.partial_decode_beams(
                chunk, lm_cache, p_cache, beams, [0, 3, 8][i], beam_width=16,
                force_next_word=(i == 1), is_end=(i == 2),
            )
            if i != 2:
                beams = [Beam.from_lm_beam(b) for b in hb]
        self.assertEqual(hb[0].text, out[0].text)
        self.assertEqual(hb[0].text_frames, out[0].text_frames)

    def test_swap_after_history_prune_keeps_partials_aligned(self):
        """Hotword swap rewalks partials by carried slot, not view rank.

        With history pruning on, finalize's ranked view is a permutation of
        the carried slots (dead slots included), so partial words must be
        recorded per carried index for the swap-time trie rewalk.
        """
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        dev = TPUBeamSearchDecoderCTC(alphabet)
        chunks = self._chunks()
        state = dev.get_starting_state(
            beam_width=16, prune_history=True, hotwords_enabled=True
        )
        per_chunk = [(["bugs"], 15.0), (["bugs"], 15.0), (["bunny"], 15.0)]
        out = None
        for i, chunk in enumerate(chunks):
            hws, w = per_chunk[i]
            out = dev.partial_decode_beams(
                state, chunk, hotwords=hws, hotword_weight=w,
                is_end=(i == len(chunks) - 1),
            )
        self.assertEqual(out[0].text, "bugs bunny")

    def test_fuzz_chunked_equals_full(self):
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        dev = TPUBeamSearchDecoderCTC(alphabet)
        rng = np.random.RandomState(21)
        for _ in range(4):
            t = rng.randint(8, 40)
            mat = rng.randn(t, len(SAMPLE_LABELS)) * 2.0
            cut1, cut2 = sorted(rng.randint(1, t, size=2))
            chunks = [mat[:cut1], mat[cut1:cut2], mat[cut2:]]
            full = dev.decode_beams(mat, beam_width=8)
            chunked = _dev_chunked(dev, chunks, beam_width=8)
            self.assertEqual(full[0].text, chunked[0].text)
            self.assertAlmostEqual(
                full[0].logit_score, chunked[0].logit_score, delta=SCORE_TOL
            )


if __name__ == "__main__":
    unittest.main()


@pytest.mark.skipif(not os.path.exists(ARPA), reason="reference fixtures absent")
class TestStreamingLMPlusHotwords(unittest.TestCase):
    def tearDown(self):
        BeamSearchDecoderCTC.clear_class_models()

    def test_streaming_with_lm_and_hotwords(self):
        """LM fusion and hotword boosting together through the stream."""
        lm = LanguageModel(
            NGramModel.from_file(ARPA), TEST_UNIGRAMS, alpha=0.4,
            unk_score_offset=0.0,
        )
        dev = TPUBeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS), lm)
        chunks = [TEST_LOGITS[:3], TEST_LOGITS[3:8], TEST_LOGITS[8:]]
        state = dev.get_starting_state(beam_width=16, hotwords_enabled=True)
        out = None
        for i, chunk in enumerate(chunks):
            out = dev.partial_decode_beams(
                state, chunk, hotwords=["bugs"], hotword_weight=20.0,
                is_end=(i == len(chunks) - 1),
            )
        self.assertEqual(out[0].text, "bugs bunny")
        # equals the one-shot decode with the same LM + hotwords
        full = dev.decode_beams(
            TEST_LOGITS, beam_width=16, hotwords=["bugs"], hotword_weight=20.0
        )
        self.assertEqual(full[0].text, out[0].text)
        self.assertAlmostEqual(full[0].lm_score, out[0].lm_score, delta=SCORE_TOL)


def test_empty_chunk_is_noop():
    """A zero-frame chunk changes nothing (state or ranked view)."""
    import numpy as np

    from pyctcdecode_tpu import Alphabet
    from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC

    from .helpers import SAMPLE_LABELS, TEST_PROBS

    dec = TPUBeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS))
    st = dec.get_starting_state(beam_width=6)
    before = dec.partial_decode_beams(st, TEST_PROBS[:6])
    empty = np.zeros((0, len(SAMPLE_LABELS)), dtype=np.float32)
    mid = dec.partial_decode_beams(st, empty)
    assert [b.text for b in mid] == [b.text for b in before]
    assert [b.partial_word for b in mid] == [b.partial_word for b in before]
    after = dec.partial_decode_beams(st, TEST_PROBS[6:], is_end=True)
    assert after[0].text == "bunny bunny"
