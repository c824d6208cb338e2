"""TPU device engine tests: parity against the host engine (the oracle).

The host engine is verified against the reference's golden outputs in
``test_decoder.py``; here the device engine (fixed-width vectorized scan,
``pyctcdecode_tpu/engine.py``) is held to the same outputs: golden
bugs/bunny floats, the LibriSpeech fixture transcript, and randomized
fuzzing with and without a language model, including BPE alphabets,
history pruning, stateful LM chaining and batch decoding.

Scores are compared at 2e-3 absolute (device accumulates f32 vs the host's
f64); texts, frames and LM states must match exactly.
"""
import json
import os
import unittest

import numpy as np
import pytest

from pyctcdecode_tpu import Alphabet, BeamSearchDecoderCTC, LanguageModel
from pyctcdecode_tpu.models.device_tables import build_device_lm, lm_score_words_jnp
from pyctcdecode_tpu.models.ngram import NGramModel
from pyctcdecode_tpu.ops.tokens import build_token_arrays
from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC

from .helpers import (
    LIBRI_LABELS,
    SAMPLE_LABELS,
    GOLDEN_TOP_LM_SCORE,
    GOLDEN_TOP_LOGIT_SCORE,
    TEST_LOGITS,
    TEST_PROBS,
    TEST_UNIGRAMS,
)

SAMPLE_DATA = "/root/reference/pyctcdecode/tests/sample_data"
ARPA = os.path.join(SAMPLE_DATA, "bugs_bunny_kenlm.arpa")
LIBRI_TRANSCRIPT = (
    "i have a good deal of will you remember and what i have set my mind upon "
    "no doubt i shall some day achieve"
)

SCORE_TOL = 2e-3


def _sample_alphabet():
    return Alphabet.build_alphabet(SAMPLE_LABELS)


def _sample_lm(**kwargs):
    model = NGramModel.from_file(ARPA)
    return LanguageModel(model, TEST_UNIGRAMS, **kwargs)


def _assert_beams_match(test, host_beams, dev_beams, check_rank=1):
    """Top-`check_rank` beams must agree in text/scores/frames/state."""
    for hb, db in zip(host_beams[:check_rank], dev_beams[:check_rank]):
        test.assertEqual(hb.text, db.text)
        test.assertEqual(hb.text_frames, db.text_frames)
        test.assertAlmostEqual(hb.logit_score, db.logit_score, delta=SCORE_TOL)
        test.assertAlmostEqual(hb.lm_score, db.lm_score, delta=SCORE_TOL)
        test.assertEqual(hb.last_lm_state, db.last_lm_state)


@pytest.mark.skipif(not os.path.exists(ARPA), reason="reference fixtures absent")
class TestDeviceNGramTables(unittest.TestCase):
    def test_raw_score_parity_exhaustive(self):
        """Device hash-table scorer == exact Python scorer on every state."""
        import jax.numpy as jnp

        model = NGramModel.from_file(ARPA)
        lm = LanguageModel(model, TEST_UNIGRAMS)
        tokens = build_token_arrays(_sample_alphabet())
        dlm = build_device_lm(lm, tokens)
        dev = dlm.as_device()
        tab = model.tables
        ctx_w = max(dlm.order - 1, 1)

        # discover all reachable states
        vocab_ids = sorted(set(tab.vocab.values()))
        seen = {(), tab.begin_sentence_state()}
        frontier = list(seen)
        while frontier:
            s = frontier.pop()
            for wid in vocab_ids:
                _, out = tab.raw_score(s, wid)
                if out not in seen:
                    seen.add(out)
                    frontier.append(out)

        queries, expected = [], []
        for s in sorted(seen):
            for wid in vocab_ids:
                score, out = tab.raw_score(s, wid)
                ctx = np.full(ctx_w, -1, np.int32)
                ctx[ctx_w - len(s) :] = s if s else []
                queries.append((ctx, len(s), wid))
                expected.append((score, out))
        ctxs = jnp.asarray(np.stack([q[0] for q in queries]))
        lens = jnp.asarray(np.array([q[1] for q in queries], np.int32))
        wids = jnp.asarray(np.array([q[2] for q in queries], np.int32))
        raw, octx, olen, obo = lm_score_words_jnp(
            dev, dlm.order, dlm.unk_prob10, ctxs, lens, wids
        )
        raw, octx, olen = np.asarray(raw), np.asarray(octx), np.asarray(olen)
        # carried-backoff path must agree with the stateless path
        raw2, octx2, olen2, _ = lm_score_words_jnp(
            dev,
            dlm.order,
            dlm.unk_prob10,
            ctxs,
            lens,
            wids,
            jnp.asarray(
                np.stack(
                    [
                        __import__(
                            "pyctcdecode_tpu.models.device_tables",
                            fromlist=["context_suffix_backoffs"],
                        ).context_suffix_backoffs(
                            dlm,
                            tuple(int(w) for w in q[0][q[0] >= 0]),
                        )
                        for q in queries
                    ]
                )
            ),
        )
        np.testing.assert_allclose(np.asarray(raw2), raw, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(olen2), olen)
        for i, (score, out) in enumerate(expected):
            self.assertAlmostEqual(float(raw[i]), score, places=5)
            self.assertEqual(int(olen[i]), len(out))
            got = tuple(int(w) for w in octx[i, ctx_w - olen[i] :]) if olen[i] else ()
            self.assertEqual(got, out)


class TestDeviceEngineNoLM(unittest.TestCase):
    def setUp(self):
        self.alphabet = _sample_alphabet()
        self.host = BeamSearchDecoderCTC(self.alphabet)
        self.dev = TPUBeamSearchDecoderCTC(self.alphabet)

    def tearDown(self):
        BeamSearchDecoderCTC.clear_class_models()

    def test_greedy_fixture(self):
        host = self.host.decode_beams(TEST_PROBS, beam_width=16)
        dev = self.dev.decode_beams(TEST_PROBS, beam_width=16)
        self.assertEqual(dev[0].text, "bunny bunny")
        _assert_beams_match(self, host, dev, check_rank=1)

    def test_logit_and_prob_inputs_match(self):
        a = self.dev.decode_beams(TEST_PROBS, beam_width=8)
        b = self.dev.decode_beams(TEST_LOGITS, beam_width=8)
        self.assertEqual(a[0].text, b[0].text)
        self.assertAlmostEqual(a[0].lm_score, b[0].lm_score, delta=1e-4)

    def test_fuzz_parity(self):
        rng = np.random.RandomState(7)
        for _ in range(8):
            mat = rng.randn(rng.randint(1, 40), len(SAMPLE_LABELS)) * 2.0
            host = self.host.decode_beams(mat, beam_width=6)
            dev = self.dev.decode_beams(mat, beam_width=6)
            _assert_beams_match(self, host, dev, check_rank=2)

    def test_prune_history_parity(self):
        rng = np.random.RandomState(11)
        for _ in range(4):
            mat = rng.randn(rng.randint(5, 40), len(SAMPLE_LABELS)) * 2.0
            self.assertEqual(self.host.decode(mat), self.dev.decode(mat))

    def test_empty_time_axis(self):
        out = self.dev.decode_beams(np.zeros((0, len(SAMPLE_LABELS))), beam_width=4)
        self.assertEqual(out[0].text, "")


@pytest.mark.skipif(not os.path.exists(ARPA), reason="reference fixtures absent")
class TestDeviceEngineWithLM(unittest.TestCase):
    def tearDown(self):
        BeamSearchDecoderCTC.clear_class_models()

    def test_golden_scores(self):
        """Reference golden floats (ref test_decoder.py:324-336; beta=default 1.5)."""
        lm = _sample_lm(alpha=1.0, unk_score_offset=0.0)
        dev = TPUBeamSearchDecoderCTC(_sample_alphabet(), lm)
        top = dev.decode_beams(TEST_PROBS, beam_width=16)[0]
        self.assertEqual(top.text, "bugs bunny")
        self.assertAlmostEqual(top.logit_score, GOLDEN_TOP_LOGIT_SCORE, delta=SCORE_TOL)
        self.assertAlmostEqual(top.lm_score, GOLDEN_TOP_LM_SCORE, delta=SCORE_TOL)

    def test_unk_offset_flips_outcome(self):
        lm = _sample_lm(alpha=1.0, beta=0.0, unk_score_offset=-10.0)
        host = BeamSearchDecoderCTC(_sample_alphabet(), lm)
        dev = TPUBeamSearchDecoderCTC(_sample_alphabet(), lm)
        self.assertEqual(host.decode(TEST_PROBS), dev.decode(TEST_PROBS))

    def test_reset_params_no_reload(self):
        lm = _sample_lm(alpha=1.0, beta=0.0, unk_score_offset=0.0)
        dev = TPUBeamSearchDecoderCTC(_sample_alphabet(), lm)
        self.assertEqual(dev.decode(TEST_PROBS), "bugs bunny")
        dev.reset_params(alpha=0.0)
        self.assertEqual(dev.decode(TEST_PROBS), "bunny bunny")
        dev.reset_params(alpha=1.0)
        self.assertEqual(dev.decode(TEST_PROBS), "bugs bunny")

    def test_fuzz_parity_with_lm(self):
        lm = _sample_lm(alpha=0.6, beta=1.2, unk_score_offset=-4.0)
        host = BeamSearchDecoderCTC(_sample_alphabet(), lm)
        dev = TPUBeamSearchDecoderCTC(_sample_alphabet(), lm)
        rng = np.random.RandomState(3)
        for _ in range(8):
            mat = rng.randn(rng.randint(1, 40), len(SAMPLE_LABELS)) * 2.0
            _assert_beams_match(
                self,
                host.decode_beams(mat, beam_width=6),
                dev.decode_beams(mat, beam_width=6),
                check_rank=2,
            )

    def test_stateful_chaining(self):
        """lm_start_state carry-over across utterances (ref test_decoder.py:426-456)."""
        lm = _sample_lm(alpha=1.0, beta=0.0, unk_score_offset=0.0)
        host = BeamSearchDecoderCTC(_sample_alphabet(), lm)
        dev = TPUBeamSearchDecoderCTC(_sample_alphabet(), lm)
        h1 = host.decode_beams(TEST_PROBS)[0]
        d1 = dev.decode_beams(TEST_PROBS)[0]
        self.assertEqual(h1.last_lm_state, d1.last_lm_state)
        h2 = host.decode_beams(TEST_PROBS, lm_start_state=h1.last_lm_state)[0]
        d2 = dev.decode_beams(TEST_PROBS, lm_start_state=d1.last_lm_state)[0]
        self.assertEqual(h2.text, d2.text)
        self.assertAlmostEqual(h2.lm_score, d2.lm_score, delta=SCORE_TOL)

    def test_score_boundary_off(self):
        lm = _sample_lm(alpha=1.0, beta=0.0, unk_score_offset=0.0, score_boundary=False)
        host = BeamSearchDecoderCTC(_sample_alphabet(), lm)
        dev = TPUBeamSearchDecoderCTC(_sample_alphabet(), lm)
        _assert_beams_match(
            self,
            host.decode_beams(TEST_PROBS, beam_width=8),
            dev.decode_beams(TEST_PROBS, beam_width=8),
        )

    def test_hotwords_parity_with_host(self):
        lm = _sample_lm(alpha=1.0, unk_score_offset=0.0)
        host = BeamSearchDecoderCTC(_sample_alphabet(), lm)
        dev = TPUBeamSearchDecoderCTC(_sample_alphabet(), lm)
        for hws, w in [(["bugs"], 25.0), (["bunny"], 10.0), (["bugs bunny"], 5.0)]:
            hb = host.decode_beams(TEST_PROBS, beam_width=16, hotwords=hws, hotword_weight=w)
            db = dev.decode_beams(TEST_PROBS, beam_width=16, hotwords=hws, hotword_weight=w)
            _assert_beams_match(self, hb, db, check_rank=2)

    def test_hotwords_fuzz_parity(self):
        lm = _sample_lm(alpha=0.6, beta=1.2, unk_score_offset=-4.0)
        host = BeamSearchDecoderCTC(_sample_alphabet(), lm)
        dev = TPUBeamSearchDecoderCTC(_sample_alphabet(), lm)
        rng = np.random.RandomState(17)
        for _ in range(6):
            mat = rng.randn(rng.randint(4, 30), len(SAMPLE_LABELS)) * 2.0
            hb = host.decode_beams(mat, beam_width=6, hotwords=["bug", "ny"], hotword_weight=7.0)
            db = dev.decode_beams(mat, beam_width=6, hotwords=["bug", "ny"], hotword_weight=7.0)
            _assert_beams_match(self, hb, db, check_rank=2)

    def test_hotwords_no_lm_parity(self):
        host = BeamSearchDecoderCTC(_sample_alphabet())
        dev = TPUBeamSearchDecoderCTC(_sample_alphabet())
        hb = host.decode_beams(TEST_PROBS, beam_width=16, hotwords=["bugs"], hotword_weight=25.0)
        db = dev.decode_beams(TEST_PROBS, beam_width=16, hotwords=["bugs"], hotword_weight=25.0)
        self.assertEqual(db[0].text, "bugs bunny")
        _assert_beams_match(self, hb, db, check_rank=2)


class TestDeviceTrigramLM(unittest.TestCase):
    """Order-3/4 LMs on device (multi-suffix backoff carry, longer contexts)."""

    ORDER = 3

    @classmethod
    def setUpClass(cls):
        import tempfile

        from .test_native import _random_arpa

        cls._tmp = tempfile.mkdtemp()
        cls.arpa = os.path.join(cls._tmp, "tri.arpa")
        _random_arpa(cls.arpa, seed=5, order=cls.ORDER, n_words=20)

    @classmethod
    def tearDownClass(cls):
        import shutil

        shutil.rmtree(cls._tmp, ignore_errors=True)
        BeamSearchDecoderCTC.clear_class_models()

    def _lm(self):
        # vocab words w0..w19 are not spellable with the sample alphabet,
        # so give the model a few spellable unigrams too
        import random

        rng = random.Random(0)
        words = [f"w{i}" for i in range(20)]
        spellable = ["bugs", "bunny", "bun", "guy", "sun"]
        with open(self.arpa) as fh:
            text = fh.read()
        for w, s in zip(words[: len(spellable)], spellable):
            text = text.replace(f"\t{w}\t", f"\t{s}\t").replace(f" {w}\n", f" {s}\n")
            text = text.replace(f"\t{w} ", f"\t{s} ").replace(f" {w} ", f" {s} ")
        path = os.path.join(self._tmp, "tri_spellable.arpa")
        with open(path, "w") as fh:
            fh.write(text)
        return LanguageModel(
            NGramModel.from_file(path),
            spellable,
            alpha=0.7,
            beta=1.0,
            unk_score_offset=-3.0,
        )

    def test_trigram_fuzz_parity(self):
        lm = self._lm()
        host = BeamSearchDecoderCTC(_sample_alphabet(), lm)
        dev = TPUBeamSearchDecoderCTC(_sample_alphabet(), lm)
        self.assertEqual(lm.order, self.ORDER)
        rng = np.random.RandomState(31)
        for _ in range(6):
            mat = rng.randn(rng.randint(4, 40), len(SAMPLE_LABELS)) * 2.0
            hb = host.decode_beams(mat, beam_width=6)
            db = dev.decode_beams(mat, beam_width=6)
            _assert_beams_match(self, hb, db, check_rank=2)

    def test_trigram_stateful_chaining(self):
        lm = self._lm()
        host = BeamSearchDecoderCTC(_sample_alphabet(), lm)
        dev = TPUBeamSearchDecoderCTC(_sample_alphabet(), lm)
        rng = np.random.RandomState(33)
        mat = rng.randn(20, len(SAMPLE_LABELS)) * 2.0
        h1 = host.decode_beams(mat, beam_width=6)[0]
        d1 = dev.decode_beams(mat, beam_width=6)[0]
        self.assertEqual(h1.last_lm_state, d1.last_lm_state)
        h2 = host.decode_beams(mat, beam_width=6, lm_start_state=h1.last_lm_state)[0]
        d2 = dev.decode_beams(mat, beam_width=6, lm_start_state=d1.last_lm_state)[0]
        self.assertEqual(h2.text, d2.text)
        self.assertAlmostEqual(h2.lm_score, d2.lm_score, delta=SCORE_TOL)


class TestDeviceFourGramLM(TestDeviceTrigramLM):
    """Order-4 LM: deeper backoff chains and 3-word contexts."""

    ORDER = 4


@pytest.mark.skipif(not os.path.exists(ARPA), reason="reference fixtures absent")
class TestDeviceMultiLM(unittest.TestCase):
    """Device multi-LM averaging (ref language_model.py:455-502)."""

    def tearDown(self):
        BeamSearchDecoderCTC.clear_class_models()

    def test_duplicate_members_equal_single(self):
        """MultiLM([lm, lm]) == lm (ref test_decoder.py:386-401)."""
        from pyctcdecode_tpu import MultiLanguageModel

        lm1 = _sample_lm(alpha=1.0, unk_score_offset=0.0)
        lm2 = _sample_lm(alpha=1.0, unk_score_offset=0.0)
        single = TPUBeamSearchDecoderCTC(_sample_alphabet(), lm1)
        multi = TPUBeamSearchDecoderCTC(
            _sample_alphabet(), MultiLanguageModel([lm1, lm2])
        )
        sb = single.decode_beams(TEST_PROBS, beam_width=16)
        mb = multi.decode_beams(TEST_PROBS, beam_width=16)
        self.assertEqual(sb[0].text, mb[0].text)
        self.assertAlmostEqual(sb[0].lm_score, mb[0].lm_score, delta=SCORE_TOL)
        # multi-LM carries a per-member state tuple
        self.assertEqual(len(mb[0].last_lm_state.states), 2)
        self.assertEqual(mb[0].last_lm_state.states[0], sb[0].last_lm_state)

    def test_mixed_members_match_host(self):
        """Members with different fusion params, fuzzed vs the host engine."""
        from pyctcdecode_tpu import MultiLanguageModel

        def _pair():
            return MultiLanguageModel(
                [
                    _sample_lm(alpha=0.8, beta=0.5, unk_score_offset=-2.0),
                    _sample_lm(alpha=0.3, beta=2.0, unk_score_offset=-6.0,
                               score_boundary=False),
                ]
            )

        host = BeamSearchDecoderCTC(_sample_alphabet(), _pair())
        dev = TPUBeamSearchDecoderCTC(_sample_alphabet(), _pair())
        rng = np.random.RandomState(23)
        for _ in range(5):
            mat = rng.randn(rng.randint(4, 30), len(SAMPLE_LABELS)) * 2.0
            hb = host.decode_beams(mat, beam_width=6)
            db = dev.decode_beams(mat, beam_width=6)
            _assert_beams_match(self, hb, db, check_rank=2)


class TestDeviceEngineBPE(unittest.TestCase):
    """BPE alphabets, incl. right-bounded tokens, against the host engine."""

    LABELS = ["▁bug", "▁bun", "ny", "s", "g", "un", "▁⁇▁", ""]

    def setUp(self):
        self.alphabet = Alphabet.build_alphabet(self.LABELS)
        assert self.alphabet.is_bpe
        self.host = BeamSearchDecoderCTC(self.alphabet)
        self.dev = TPUBeamSearchDecoderCTC(self.alphabet)

    def tearDown(self):
        BeamSearchDecoderCTC.clear_class_models()

    def test_simple_sequence(self):
        seq = ["▁bug", "s", "", "▁bun", "ny"]
        mat = np.zeros((len(seq), len(self.LABELS)))
        for i, tok in enumerate(seq):
            mat[i, self.LABELS.index(tok)] = 1.0
        host = self.host.decode_beams(mat, beam_width=8)
        dev = self.dev.decode_beams(mat, beam_width=8)
        self.assertEqual(dev[0].text, "bugs bunny")
        _assert_beams_match(self, host, dev)

    def test_fuzz_parity_bpe(self):
        rng = np.random.RandomState(13)
        for _ in range(8):
            mat = rng.randn(rng.randint(1, 30), len(self.LABELS)) * 2.0
            host = self.host.decode_beams(mat, beam_width=6)
            dev = self.dev.decode_beams(mat, beam_width=6)
            _assert_beams_match(self, host, dev, check_rank=2)


class TestDeviceEngineLibri(unittest.TestCase):
    @pytest.mark.skipif(
        not os.path.exists(os.path.join(SAMPLE_DATA, "libri_logits.json")),
        reason="reference fixtures absent",
    )
    def test_libri_golden_transcript(self):
        with open(os.path.join(SAMPLE_DATA, "libri_logits.json")) as fh:
            logits = np.array(json.load(fh))
        alphabet = Alphabet.build_alphabet(LIBRI_LABELS + [""])
        host = BeamSearchDecoderCTC(alphabet)
        dev = TPUBeamSearchDecoderCTC(alphabet)
        self.assertEqual(dev.decode(logits), LIBRI_TRANSCRIPT)
        hb = host.decode_beams(logits, beam_width=25)[0]
        db = dev.decode_beams(logits, beam_width=25)[0]
        self.assertEqual(hb.text, db.text)
        self.assertEqual(hb.text_frames, db.text_frames)
        self.assertAlmostEqual(hb.logit_score, db.logit_score, delta=SCORE_TOL)
        BeamSearchDecoderCTC.clear_class_models()

    @pytest.mark.skipif(
        not os.path.exists(os.path.join(SAMPLE_DATA, "libri_logits.json")),
        reason="reference fixtures absent",
    )
    def test_libri_spoofed_bpe(self):
        """Realistic-size BPE alphabet on device (ref test_decoder.py:756-770)."""
        from pyctcdecode_tpu.alphabet import BPE_TOKEN, UNK_BPE_TOKEN

        with open(os.path.join(SAMPLE_DATA, "libri_logits.json")) as fh:
            logits = np.array(json.load(fh))
        labels_bpe = [UNK_BPE_TOKEN, BPE_TOKEN] + ["##" + c for c in LIBRI_LABELS[1:]]
        unk_col = np.full((logits.shape[0], 1), -100.0)
        logits_bpe = np.hstack([unk_col, logits])
        alphabet = Alphabet.build_alphabet(labels_bpe + [""])
        host = BeamSearchDecoderCTC(alphabet)
        dev = TPUBeamSearchDecoderCTC(alphabet)
        ht = host.decode(logits_bpe)
        dt = dev.decode(logits_bpe)
        self.assertEqual(dt, LIBRI_TRANSCRIPT)
        self.assertEqual(ht, dt)
        BeamSearchDecoderCTC.clear_class_models()


@pytest.mark.skipif(not os.path.exists(ARPA), reason="reference fixtures absent")
class TestDeviceBatch(unittest.TestCase):
    def tearDown(self):
        BeamSearchDecoderCTC.clear_class_models()

    def test_batch_equals_sequential(self):
        lm = _sample_lm(alpha=0.7, beta=0.5, unk_score_offset=-3.0)
        dev = TPUBeamSearchDecoderCTC(_sample_alphabet(), lm)
        rng = np.random.RandomState(5)
        mats = [
            rng.randn(rng.randint(3, 30), len(SAMPLE_LABELS)) * 2.0 for _ in range(5)
        ]
        single = [dev.decode_beams(m, beam_width=5) for m in mats]
        batched = dev.decode_beams_batch(mats, beam_width=5)
        self.assertEqual(len(batched), len(mats))
        for s, b in zip(single, batched):
            self.assertEqual([x.text for x in s], [x.text for x in b])
            for x, y in zip(s, b):
                self.assertAlmostEqual(x.lm_score, y.lm_score, delta=1e-4)

    def test_pipelined_batches_equal_batch(self):
        """decode_beams_batches yields per-batch results identical to
        decode_beams_batch, in order, including an empty batch."""
        lm = _sample_lm(alpha=0.7, beta=0.5, unk_score_offset=-3.0)
        dev = TPUBeamSearchDecoderCTC(_sample_alphabet(), lm)
        rng = np.random.RandomState(11)
        batches = [
            [rng.randn(rng.randint(3, 20), len(SAMPLE_LABELS)) for _ in range(n)]
            for n in (3, 0, 2)
        ]
        piped = list(dev.decode_beams_batches(iter(batches), beam_width=5))
        self.assertEqual(len(piped), len(batches))
        for batch, got in zip(batches, piped):
            want = dev.decode_beams_batch(batch, beam_width=5)
            self.assertEqual(len(got), len(want))
            for s, b in zip(want, got):
                self.assertEqual([x.text for x in s], [x.text for x in b])

    def test_pipelined_batches_rejects_unknown_kwarg(self):
        dev = TPUBeamSearchDecoderCTC(_sample_alphabet())
        with self.assertRaises(TypeError):
            list(dev.decode_beams_batches([[np.zeros((4, len(SAMPLE_LABELS)))]],
                                          bogus=1))

    def test_batch_top1(self):
        dev = TPUBeamSearchDecoderCTC(_sample_alphabet())
        rng = np.random.RandomState(9)
        mats = [rng.randn(10, len(SAMPLE_LABELS)) for _ in range(3)]
        texts = dev.decode_batch(mats)
        for m, t in zip(mats, texts):
            self.assertEqual(dev.decode(m), t)




class TestFastTopK(unittest.TestCase):
    """fast_topk swaps lax.top_k for approx_max_k (exact set, tie order
    may differ); on identical-score-free inputs the decode is identical."""

    def test_fast_topk_matches_default_on_libri(self):
        path = os.path.join(SAMPLE_DATA, "libri_logits.json")
        if not os.path.exists(path):
            self.skipTest("reference fixture not present")
        with open(path) as fh:
            logits = np.array(json.load(fh), dtype=np.float32)
        alphabet = Alphabet.build_alphabet(LIBRI_LABELS)
        base = TPUBeamSearchDecoderCTC(alphabet)
        fast = TPUBeamSearchDecoderCTC(alphabet, fast_topk=True)
        want = base.decode(logits, beam_width=25)
        got = fast.decode(logits, beam_width=25)
        self.assertEqual(got, want)
        # the segmented per-frame programs (the accelerator batch path)
        # must compile and agree with approx_max_k ranking too
        seg = TPUBeamSearchDecoderCTC(alphabet, fast_topk=True, segment_frames=16)
        self.assertEqual(
            seg.decode_batch([logits], beam_width=25)[0], want
        )


class TestAutoKPreselect(unittest.TestCase):
    """max_tokens_per_frame="auto" measures the call's admission and picks
    the smallest sufficient bucketed K — decode must equal the exact
    (K = V) preselect everywhere, one-shot and batch."""

    def test_auto_matches_exact_on_libri(self):
        path = os.path.join(SAMPLE_DATA, "libri_logits.json")
        if not os.path.exists(path):
            self.skipTest("reference fixture not present")
        with open(path) as fh:
            logits = np.array(json.load(fh), dtype=np.float32)
        alphabet = Alphabet.build_alphabet(LIBRI_LABELS)
        dev = TPUBeamSearchDecoderCTC(alphabet)
        want = dev.decode(logits, beam_width=25)
        got = dev.decode(logits, beam_width=25, max_tokens_per_frame="auto")
        self.assertEqual(got, want)

    def test_auto_matches_exact_on_noisy_batch(self):
        rng = np.random.RandomState(3)
        labels = [" ", "b", "g", "n", "s", "u", "y", ""]
        alphabet = Alphabet.build_alphabet(labels)
        dev = TPUBeamSearchDecoderCTC(alphabet)
        mats = [rng.randn(24, len(labels)).astype(np.float32) * 2.5
                for _ in range(4)]
        want = dev.decode_batch(mats, beam_width=12)
        got = dev.decode_batch(mats, beam_width=12, max_tokens_per_frame="auto")
        self.assertEqual(got, want)

    def test_auto_rejected_for_streaming(self):
        alphabet = Alphabet.build_alphabet([" ", "b", "g", ""])
        dev = TPUBeamSearchDecoderCTC(alphabet)
        with self.assertRaises(ValueError):
            dev.get_starting_state(max_tokens_per_frame="auto")


class TestLengthBucketing(unittest.TestCase):
    """length_bucketing groups utterances by frame bucket; results must be
    in input order and identical to the single-program batch."""

    def test_mixed_lengths_match(self):
        rng = np.random.RandomState(5)
        labels = [" ", "b", "g", "n", "s", "u", "y", ""]
        alphabet = Alphabet.build_alphabet(labels)
        dev = TPUBeamSearchDecoderCTC(alphabet)
        mats = [rng.randn(t, len(labels)).astype(np.float32) * 2.0
                for t in (10, 90, 140, 30, 70)]
        want = dev.decode_batch(mats, beam_width=8)
        got = dev.decode_batch(mats, beam_width=8, length_bucketing=True)
        self.assertEqual(got, want)
        beams_b = dev.decode_beams_batch(mats, beam_width=8,
                                         length_bucketing=True)
        beams_n = dev.decode_beams_batch(mats, beam_width=8)
        self.assertEqual([b[0].text_frames for b in beams_b],
                         [b[0].text_frames for b in beams_n])

    def test_pipelined_batches_with_bucketing(self):
        """length_bucketing through decode_beams_batches: per-bucket
        programs pipeline across batches, results stay in input order."""
        rng = np.random.RandomState(7)
        labels = [" ", "b", "g", "n", "s", "u", "y", ""]
        alphabet = Alphabet.build_alphabet(labels)
        dev = TPUBeamSearchDecoderCTC(alphabet)
        batches = [
            [rng.randn(t, len(labels)).astype(np.float32) * 2.0
             for t in lengths]
            for lengths in ((12, 80, 25), (140,), (60, 9))
        ]
        piped = list(dev.decode_beams_batches(
            iter(batches), beam_width=8, length_bucketing=True))
        self.assertEqual(len(piped), len(batches))
        for batch, got in zip(batches, piped):
            want = dev.decode_beams_batch(batch, beam_width=8)
            self.assertEqual([b.text for b in got[0]],
                             [b.text for b in want[0]])
            self.assertEqual([b[0].text for b in got],
                             [b[0].text for b in want])


if __name__ == "__main__":
    unittest.main()
