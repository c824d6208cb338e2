"""Host decoder engine tests.

Mirrors the reference's test strategy (SURVEY.md §4): beam-algebra units,
bugs/bunny golden fixtures (including exact reference float scores), the
realistic LibriSpeech fixture, feature tests (hotwords, multi-LM, pruning,
stateful chaining), batch decode with mock pools, and fuzzing.
"""
import math
import os
import unittest
from multiprocessing.context import SpawnContext

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyctcdecode_tpu import (
    Alphabet,
    BeamSearchDecoderCTC,
    LanguageModel,
    MultiLanguageModel,
    build_ctcdecoder,
)
from pyctcdecode_tpu.decoder import (
    Beam,
    LMBeam,
    OutputBeam,
    _best_beams,
    _collapse_history,
    _combine_prefixes,
    collapse_spaces,
    log_add,
)
from pyctcdecode_tpu.models.ngram import NGramModel

from .helpers import (
    BLANK_PROBS,
    BUGS_PROBS,
    BUNNY_PROBS,
    GOLDEN_PARTIAL_LOGIT_SCORE,
    GOLDEN_TOP_LM_SCORE,
    GOLDEN_TOP_LOGIT_SCORE,
    LIBRI_LABELS,
    SAMPLE_LABELS,
    SAMPLE_VOCAB,
    SPACE_PROBS,
    TEST_LOGITS,
    TEST_PROBS,
    TEST_UNIGRAMS,
    MockContext,
    MockPool,
    one_hots,
)

LIBRI_TRANSCRIPT = (
    "i have a good deal of will you remember and what i have set my mind upon "
    "no doubt i shall some day achieve"
)


def _greedy(logits, alphabet):
    labels = alphabet.labels
    out = []
    prev = None
    for n in logits.argmax(axis=1):
        c = labels[n]
        if c != prev:
            out.append(c)
        prev = c
    return "".join(out)


def _approx_output(beams, precis=5):
    return [
        (b.text, b.text_frames, round(b.logit_score, precis), round(b.lm_score, precis))
        for b in beams
    ]


class TestBeamAlgebra(unittest.TestCase):
    def testcollapse_spaces(self):
        self.assertEqual(collapse_spaces(""), "")
        self.assertEqual(collapse_spaces("  a   b c "), "a b c")

    def testlog_add(self):
        self.assertEqual(log_add(0, 0), math.log(2))
        self.assertAlmostEqual(log_add(1 - math.log(2), 1 - math.log(2)), 1.0)
        # asymmetric, stable for large gaps
        self.assertAlmostEqual(log_add(-1000.0, 0.0), 0.0)

    def test_combine_prefixes(self):
        beams = [
            Beam("deep space", "", "nin", "n", [], (-1, -1), -1.0),
            Beam("deep space", "nine", "", "", [], (-1, -1), -1.0),
            Beam("deep space", "", "nin", "", [], (-1, -1), -1.0),
            Beam("deep space", "", "nin", "", [], (-1, -1), -1.0),
            Beam("deep  space", "", "nin", "", [], (-1, -1), -1.0),
        ]
        merged = _combine_prefixes(beams)
        self.assertEqual(len(merged), 4)
        scores = [b.logit_score for b in merged]
        self.assertAlmostEqual(scores[2], math.log(2 * math.exp(-1)))

    def test_sort_and_trim(self):
        beams = [
            LMBeam("a", "", "x", "x", [], (-1, -1), -1.0, -3.0),
            LMBeam("b", "", "x", "x", [], (-1, -1), -1.0, -9.0),
            LMBeam("c", "", "x", "x", [], (-1, -1), -1.0, -5.0),
        ]
        out = _best_beams(beams, 2)
        self.assertEqual([b.text for b in out], ["a", "c"])

    def test_collapse_history(self):
        beams = [
            LMBeam("A x owns", "", "potatoes", "s", [], (-1, -1), -1.0, -1.0),
            LMBeam("B x owns", "", "potatoes", "", [], (-1, -1), -1.0, -1.0),
            LMBeam("C x owns", "", "potatoes", "s", [], (-1, -1), -1.0, -1.0),
            LMBeam("D x sells", "", "yeast", "", [], (-1, -1), -1.0, -1.0),
            LMBeam("E x owns", "", "yeast", "", [], (-1, -1), -1.0, -1.0),
        ]
        pruned = _collapse_history(beams, 3)
        self.assertEqual([b.text.split()[0] for b in pruned], ["A", "B", "D", "E"])
        self.assertTrue(all(isinstance(b, Beam) for b in pruned))


class TestDecoder:
    def test_decode_no_lm(self):
        decoder = BeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS))
        assert decoder.decode(TEST_LOGITS) == "bunny bunny"

    def test_lm_flips_ambiguity(self, bugs_bunny_arpa_path):
        model = NGramModel.from_file(bugs_bunny_arpa_path)
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)

        # alpha 0: LM silent, beta still applies uniformly -> greedy-ish answer
        decoder = BeamSearchDecoderCTC(alphabet, LanguageModel(model, alpha=0.0))
        assert decoder.decode(TEST_LOGITS) == "bunny bunny"

        # alpha 1: bigram "bugs bunny" wins
        decoder = BeamSearchDecoderCTC(alphabet, LanguageModel(model, alpha=1.0))
        assert decoder.decode(TEST_LOGITS) == "bugs bunny"

        # empty unigram list is still fine
        decoder = BeamSearchDecoderCTC(alphabet, LanguageModel(model, [], alpha=1.0))
        assert decoder.decode(TEST_LOGITS) == "bugs bunny"

        # restricted unigrams with zero unk weight: no penalty
        decoder = BeamSearchDecoderCTC(
            alphabet, LanguageModel(model, ["bunny"], alpha=1.0, unk_score_offset=0.0)
        )
        assert decoder.decode(TEST_LOGITS) == "bugs bunny"

        # restricted unigrams with unk penalty: "bugs" now OOV -> flipped back
        decoder = BeamSearchDecoderCTC(
            alphabet, LanguageModel(model, ["bunny"], alpha=1.0, unk_score_offset=-10.0)
        )
        assert decoder.decode(TEST_LOGITS) == "bunny bunny"

    def test_model_container_lifecycle(self, bugs_bunny_arpa_path):
        model = NGramModel.from_file(bugs_bunny_arpa_path)
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        d1 = BeamSearchDecoderCTC(alphabet, LanguageModel(model))
        d2 = BeamSearchDecoderCTC(alphabet, LanguageModel(model))
        n = len(BeamSearchDecoderCTC.model_container)
        assert n >= 2
        d1.cleanup()
        assert len(BeamSearchDecoderCTC.model_container) < n
        BeamSearchDecoderCTC.clear_class_models()
        assert len(BeamSearchDecoderCTC.model_container) == 0

    def test_build_ctcdecoder(self, bugs_bunny_arpa_path, engine="host"):
        decoder = build_ctcdecoder(SAMPLE_LABELS, bugs_bunny_arpa_path, engine="host")
        assert decoder.decode(TEST_LOGITS) == "bugs bunny"

    def test_golden_scores(self, bugs_bunny_arpa_path):
        """Exact float parity with the reference's golden OutputBeam."""
        decoder = build_ctcdecoder(SAMPLE_LABELS, bugs_bunny_arpa_path, TEST_UNIGRAMS, engine="host")
        beams = decoder.decode_beams(TEST_LOGITS)
        top = beams[0]
        assert top.text == "bugs bunny"
        assert top.text_frames == [("bugs", (0, 4)), ("bunny", (7, 13))]
        assert top.logit_score == pytest.approx(GOLDEN_TOP_LOGIT_SCORE, abs=1e-12)
        assert top.lm_score == pytest.approx(GOLDEN_TOP_LM_SCORE, abs=1e-12)

    def test_decode_batch(self, bugs_bunny_arpa_path):
        decoder = build_ctcdecoder(SAMPLE_LABELS, bugs_bunny_arpa_path, TEST_UNIGRAMS, engine="host")
        pool = MockPool(MockContext())
        texts = decoder.decode_batch(pool, [TEST_LOGITS] * 5)
        assert texts == ["bugs bunny"] * 5
        assert pool.map_has_run

        texts = decoder.decode_batch(None, [TEST_LOGITS] * 5)
        assert texts == ["bugs bunny"] * 5

        spawn_pool = MockPool(SpawnContext())
        texts = decoder.decode_batch(spawn_pool, [TEST_LOGITS] * 5)
        assert texts == ["bugs bunny"] * 5
        assert not spawn_pool.map_has_run

    def test_decode_beams_batch_mp_safe(self, bugs_bunny_arpa_path):
        decoder = build_ctcdecoder(SAMPLE_LABELS, bugs_bunny_arpa_path, TEST_UNIGRAMS, engine="host")
        pool = MockPool(MockContext())
        beam_lists = decoder.decode_beams_batch(pool, [TEST_LOGITS] * 2)
        assert pool.map_has_run
        for beams in beam_lists:
            top = beams[0]
            assert isinstance(top, OutputBeam)
            assert top.text == "bugs bunny"
            assert top.last_lm_state is None  # stripped for process safety
            assert top.logit_score == pytest.approx(GOLDEN_TOP_LOGIT_SCORE, abs=1e-12)
            assert top.lm_score == pytest.approx(GOLDEN_TOP_LM_SCORE, abs=1e-12)

    def test_logit_shape_mismatch(self):
        decoder = build_ctcdecoder(SAMPLE_LABELS, engine="host")
        with pytest.raises(ValueError):
            decoder.decode(np.hstack([TEST_LOGITS] * 2))
        with pytest.raises(ValueError):
            decoder.decode(TEST_LOGITS[None, :, :])

    def test_multi_lm_averages_to_same(self, bugs_bunny_arpa_path):
        model = NGramModel.from_file(bugs_bunny_arpa_path)
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        lm = LanguageModel(model)
        single = BeamSearchDecoderCTC(alphabet, lm)
        double = BeamSearchDecoderCTC(alphabet, MultiLanguageModel([lm, lm]))
        assert single.decode(TEST_LOGITS) == "bugs bunny"
        assert double.decode(TEST_LOGITS) == "bugs bunny"
        assert _approx_output(single.decode_beams(TEST_LOGITS)) == _approx_output(
            double.decode_beams(TEST_LOGITS)
        )

    def test_token_min_logp_pruning(self, bugs_bunny_arpa_path):
        decoder = build_ctcdecoder(SAMPLE_LABELS, bugs_bunny_arpa_path, engine="host")
        assert decoder.decode(TEST_LOGITS) == "bugs bunny"
        assert _greedy(TEST_LOGITS, decoder._alphabet) == "bunny bunny"
        # admitting only the argmax forces the greedy answer
        assert decoder.decode(TEST_LOGITS, token_min_logp=0.0) == "bunny bunny"

    def test_history_pruning(self):
        decoder = build_ctcdecoder(SAMPLE_LABELS, engine="host")
        add = np.vstack([SPACE_PROBS, BUNNY_PROBS])
        logits = np.log(np.clip(np.vstack([TEST_PROBS] + [add] * 5), 1e-15, 1))
        beams = decoder.decode_beams(logits, prune_history=False)
        pruned = decoder.decode_beams(logits, prune_history=True)
        assert beams[0].text == pruned[0].text
        assert len(beams) == 16
        assert len(pruned) == 1

    def test_stateful_chaining(self, bugs_bunny_arpa_path):
        bunny_bunny_probs = np.vstack(
            [
                BUGS_PROBS,
                SPACE_PROBS,
                np.vstack([BUGS_PROBS, BLANK_PROBS, BLANK_PROBS]) * 0.51
                + BUNNY_PROBS * 0.49,
            ]
        )
        no_lm = build_ctcdecoder(SAMPLE_LABELS, engine="host")
        assert no_lm.decode(bunny_bunny_probs) == "bugs bugs"

        decoder = build_ctcdecoder(SAMPLE_LABELS, bugs_bunny_arpa_path, TEST_UNIGRAMS, engine="host")
        assert decoder.decode(bunny_bunny_probs) == "bugs bunny"

        # splitting breaks the bigram context
        split = (
            decoder.decode(bunny_bunny_probs[:4])
            + " "
            + decoder.decode(bunny_bunny_probs[4:])
        )
        assert split == "bugs bugs"

        # carrying the LM state restores it
        top = decoder.decode_beams(bunny_bunny_probs[:4])[0]
        text = top.text + " " + decoder.decode_beams(
            bunny_bunny_probs[4:], lm_start_state=top.last_lm_state
        )[0].text
        assert text == "bugs bunny"

    def test_hotwords(self, bugs_bunny_arpa_path):
        decoder = build_ctcdecoder(SAMPLE_LABELS, bugs_bunny_arpa_path, engine="host")
        assert decoder.decode(TEST_LOGITS) == "bugs bunny"
        assert (
            decoder.decode(TEST_LOGITS, hotwords=["bunny"], hotword_weight=20)
            == "bunny bunny"
        )
        assert (
            decoder.decode(TEST_LOGITS, hotwords=["bugs", "bunny"], hotword_weight=20)
            == "bugs bunny"
        )
        assert (
            decoder.decode(TEST_LOGITS, hotwords=["bugs bunny"], hotword_weight=20)
            == "bugs bunny"
        )
        no_lm = build_ctcdecoder(SAMPLE_LABELS, engine="host")
        assert no_lm.decode(TEST_LOGITS) == "bunny bunny"
        assert no_lm.decode(TEST_LOGITS, hotwords=["bugs"]) == "bugs bunny"

    def test_beam_results(self, bugs_bunny_arpa_path):
        decoder = build_ctcdecoder(SAMPLE_LABELS, engine="host")
        beams = decoder.decode_beams(TEST_LOGITS)
        assert len(beams) == 16
        assert beams[0].text == "bunny bunny"
        assert beams[-1].text == "bugs bunny"

        decoder = build_ctcdecoder(SAMPLE_LABELS, bugs_bunny_arpa_path, engine="host")
        beams = decoder.decode_beams(TEST_LOGITS)
        assert len(beams) == 1
        assert beams[0].text == "bugs bunny"

        model = NGramModel.from_file(bugs_bunny_arpa_path)
        lm = LanguageModel(model, unk_score_offset=0.0)
        decoder = BeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS), lm)
        beams = decoder.decode_beams(TEST_LOGITS, beam_prune_logp=-20.0)
        assert len(beams) == 16
        assert beams[0].text == "bugs bunny"
        assert beams[1].text == "bunny bunny"

    def test_frame_annotations(self):
        decoder = build_ctcdecoder(SAMPLE_LABELS, engine="host")
        beams = decoder.decode_beams(TEST_LOGITS)
        assert beams[0].text == "bunny bunny"
        assert beams[0].text_frames == [("bunny", (0, 6)), ("bunny", (7, 13))]
        assert beams[-1].text == "bugs bunny"
        assert beams[-1].text_frames == [("bugs", (0, 4)), ("bunny", (7, 13))]

        # stretched CTC with repeats and internal blanks
        stretched = [" ", "", "b", "u", "n", "", "n", "n", "y", "", " ", " "]
        logits = one_hots(stretched)
        top = decoder.decode_beams(logits)[0]
        assert top.text == "bunny"
        assert top.text_frames == [("bunny", (2, 9))]

    def test_bpe_frame_annotations(self):
        bpe_labels = ["▁bugs", "▁bun", "ny", ""]
        vocab = {c: n for n, c in enumerate(bpe_labels)}
        decoder = build_ctcdecoder(bpe_labels, engine="host")
        seq = ["", "▁bugs", "▁bun", "ny", "ny", ""]
        logits = np.zeros((len(seq), len(vocab)))
        for n, c in enumerate(seq):
            logits[n][vocab[c]] = 1
        top = decoder.decode_beams(logits)[0]
        assert top.text == "bugs bunny"
        assert top.text_frames == [("bugs", (1, 2)), ("bunny", (2, 5))]

    def test_realistic_char_alphabet(self, libri_logits):
        decoder = build_ctcdecoder(LIBRI_LABELS, engine="host")
        assert decoder.decode(libri_logits) == LIBRI_TRANSCRIPT
        beams = decoder.decode_beams(libri_logits)
        assert len(beams[0].text.split()) == len(beams[0].text_frames)

    def test_realistic_spoofed_bpe(self, libri_logits):
        from pyctcdecode_tpu.alphabet import BPE_TOKEN, UNK_BPE_TOKEN

        labels_bpe = [UNK_BPE_TOKEN, BPE_TOKEN] + ["##" + c for c in LIBRI_LABELS[1:]]
        zero_col = np.full((libri_logits.shape[0], 1), -100.0)
        logits_bpe = np.hstack([zero_col, libri_logits])
        decoder = build_ctcdecoder(labels_bpe, engine="host")
        assert decoder.decode(logits_bpe) == LIBRI_TRANSCRIPT

    def test_reset_params(self, bugs_bunny_arpa_path):
        decoder = build_ctcdecoder(SAMPLE_LABELS, bugs_bunny_arpa_path, alpha=0.0, engine="host")
        assert decoder.decode(TEST_LOGITS) == "bunny bunny"
        decoder.reset_params(alpha=1.0)
        assert decoder.decode(TEST_LOGITS) == "bugs bunny"
        with pytest.raises(ValueError):
            decoder.reset_params(alpha=1)  # int rejected
        BeamSearchDecoderCTC.clear_class_models()

    def test_empty_logits(self):
        decoder = build_ctcdecoder(SAMPLE_LABELS, engine="host")
        beams = decoder.decode_beams(np.zeros((0, len(SAMPLE_LABELS))))
        assert beams[0].text == ""


class TestFuzz(unittest.TestCase):
    @settings(deadline=2000, max_examples=25)
    @given(st.integers(min_value=0, max_value=20), st.integers(min_value=0, max_value=2**32 - 1))
    def test_fuzz_decode_random_logits(self, rows, seed):
        rng = np.random.default_rng(seed)
        xs = np.exp(rng.normal(size=(rows, len(LIBRI_LABELS) + 1)))
        ps = (xs.T / np.sum(xs, axis=1)).T if rows else xs
        logits = np.log(ps) if rows else xs
        decoder = build_ctcdecoder(LIBRI_LABELS, engine="host")
        decoder.decode(logits)

    @settings(deadline=2000, max_examples=25)
    @given(st.integers(min_value=0, max_value=20), st.integers(min_value=0, max_value=2**32 - 1))
    def test_fuzz_decode_unnormalized(self, rows, seed):
        rng = np.random.default_rng(seed)
        logits = rng.normal(size=(rows, len(LIBRI_LABELS) + 1))
        decoder = build_ctcdecoder(LIBRI_LABELS, engine="host")
        decoder.decode(logits)


class TestFuzzResetParams:
    @settings(deadline=None, max_examples=30)
    @given(
        alpha=st.one_of(st.none(), st.floats()),
        beta=st.one_of(st.none(), st.floats()),
        unk_score_offset=st.one_of(st.none(), st.floats()),
        lm_score_boundary=st.one_of(st.none(), st.booleans()),
    )
    def test_fuzz_reset_params(
        self, alpha, beta, unk_score_offset, lm_score_boundary, bugs_bunny_arpa_path
    ):
        decoder = build_ctcdecoder(SAMPLE_LABELS, bugs_bunny_arpa_path, alpha=0.0, engine="host")
        decoder.reset_params(
            alpha=alpha,
            beta=beta,
            unk_score_offset=unk_score_offset,
            lm_score_boundary=lm_score_boundary,
        )
        decoder.cleanup()


if __name__ == "__main__":
    unittest.main()
