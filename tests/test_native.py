"""Native (C++) n-gram engine tests: parity with the Python runtime."""
import os
import random
import unittest

import numpy as np
import pytest

from pyctcdecode_tpu import Alphabet, BeamSearchDecoderCTC, LanguageModel
from pyctcdecode_tpu.csrc import load_native
from pyctcdecode_tpu.models.native import NativeNGramModel, open_ngram_file
from pyctcdecode_tpu.models.ngram import NGramModel
from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC

from .helpers import SAMPLE_LABELS, TEST_PROBS, TEST_UNIGRAMS, TempfileTestCase

ARPA = "/root/reference/pyctcdecode/tests/sample_data/bugs_bunny_kenlm.arpa"

native_available = load_native() is not None
needs_native = pytest.mark.skipif(not native_available, reason="no native toolchain")


def _random_arpa(path: str, seed: int, order: int = 3, n_words: int = 30) -> None:
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(n_words)]
    vocab = ["<unk>", "<s>", "</s>"] + words
    grams = {n: {} for n in range(1, order + 1)}
    for w in vocab:
        grams[1][(w,)] = (round(rng.uniform(-5, 0), 4), round(rng.uniform(-2, 0), 4))
    for _ in range(n_words * 4):
        a, b = rng.choice(vocab[1:]), rng.choice(vocab[1:])
        grams[2][(a, b)] = (round(rng.uniform(-5, 0), 4), round(rng.uniform(-2, 0), 4))
    for n in range(3, order + 1):
        for key in list(grams[n - 1]):
            if rng.random() < 0.5:
                c = rng.choice(vocab[1:])
                bo = 0.0 if n == order else round(rng.uniform(-2, 0), 4)
                grams[n][key + (c,)] = (round(rng.uniform(-5, 0), 4), bo)
    with open(path, "w") as fh:
        fh.write("\\data\\\n")
        for n in range(1, order + 1):
            fh.write(f"ngram {n}={len(grams[n])}\n")
        fh.write("\n")
        for n in range(1, order + 1):
            fh.write(f"\\{n}-grams:\n")
            for key, (p, bo) in grams[n].items():
                row = f"{p}\t{' '.join(key)}"
                if n < order:
                    row += f"\t{bo}"
                fh.write(row + "\n")
            fh.write("\n")
        fh.write("\\end\\\n")


@needs_native
@pytest.mark.skipif(not os.path.exists(ARPA), reason="reference fixtures absent")
class TestNativeParity(unittest.TestCase):
    def test_metadata(self):
        nat = NativeNGramModel.from_file(ARPA)
        py = NGramModel.from_file(ARPA)
        self.assertEqual(nat.order, py.order)
        self.assertEqual(nat.begin_sentence_state() != (), py.begin_sentence_state() != ())
        for w in ["bugs", "bunny", "<unk>", "absent"]:
            self.assertEqual(w in nat, w in py)

    def test_score_parity_exhaustive(self):
        nat = NativeNGramModel.from_file(ARPA)
        py = NGramModel.from_file(ARPA)
        words = list(py.tables.vocab)
        rev_py = {v: k for k, v in py.tables.vocab.items()}
        vocab_nat = nat.native.vocab_list()

        states = {(), ("<s>",)}
        frontier = list(states)
        while frontier:
            s = frontier.pop()
            for w in words:
                ids = tuple(py.tables.vocab[x] for x in s)
                _, out = py.tables.raw_score(ids, py.tables.vocab[w])
                out_w = tuple(rev_py[i] for i in out)
                if out_w not in states:
                    states.add(out_w)
                    frontier.append(out_w)
        for s in sorted(states):
            for w in words:
                sc_py, out_py = py.raw_score_word(
                    tuple(py.tables.vocab[x] for x in s), w
                )
                sc_nat, out_nat = nat.raw_score_word(
                    tuple(nat.native.word_id(x) for x in s), w
                )
                self.assertAlmostEqual(sc_py, sc_nat, places=5, msg=f"{s} {w}")
                self.assertEqual(
                    tuple(rev_py[i] for i in out_py),
                    tuple(vocab_nat[i] for i in out_nat),
                )


@needs_native
class TestNativeRandomArpa(TempfileTestCase):
    def test_random_model_parity(self):
        for seed, order in ((1, 3), (2, 3), (3, 4), (4, 5)):
            path = os.path.join(self.temp_dir, f"r{seed}.arpa")
            _random_arpa(path, seed, order=order)
            nat = NativeNGramModel.from_file(path)
            py = NGramModel.from_file(path)
            rng = random.Random(seed + 100)
            rev_py = {v: k for k, v in py.tables.vocab.items()}
            vocab_nat = nat.native.vocab_list()
            state_py, state_nat = (), ()
            for _ in range(300):
                w = rng.choice(list(py.tables.vocab) + ["oovword"])
                sc_py, state_py = py.raw_score_word(state_py, w)
                sc_nat, state_nat = nat.raw_score_word(state_nat, w)
                self.assertAlmostEqual(sc_py, sc_nat, places=4)
                self.assertEqual(
                    tuple(rev_py[i] for i in state_py),
                    tuple(vocab_nat[i] for i in state_nat),
                )

    def test_batch_scoring(self):
        path = os.path.join(self.temp_dir, "b.arpa")
        _random_arpa(path, 7)
        nat = NativeNGramModel.from_file(path)
        py = NGramModel.from_file(path)
        width = nat.order - 1
        rng = np.random.RandomState(0)
        n = 64
        wids_nat = rng.randint(0, len(nat.native.vocab_list()), size=n).astype(np.int32)
        ctx = np.full((n, width), -1, np.int32)
        ctx_len = np.zeros(n, np.int32)
        scores, out_ctx, out_len = nat.native.score_batch(ctx, ctx_len, wids_nat)
        vocab_nat = nat.native.vocab_list()
        for i in range(n):
            sc_py, _ = py.raw_score_word((), vocab_nat[wids_nat[i]])
            self.assertAlmostEqual(float(scores[i]), sc_py, places=4)


@needs_native
@pytest.mark.skipif(not os.path.exists(ARPA), reason="reference fixtures absent")
class TestNativeEndToEnd(unittest.TestCase):
    def tearDown(self):
        BeamSearchDecoderCTC.clear_class_models()

    def test_host_decode_with_native_backend(self):
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        lm_py = LanguageModel(
            NGramModel.from_file(ARPA), TEST_UNIGRAMS, alpha=1.0, unk_score_offset=0.0
        )
        lm_nat = LanguageModel(
            NativeNGramModel.from_file(ARPA),
            TEST_UNIGRAMS,
            alpha=1.0,
            unk_score_offset=0.0,
        )
        host_py = BeamSearchDecoderCTC(alphabet, lm_py)
        host_nat = BeamSearchDecoderCTC(alphabet, lm_nat)
        bpy = host_py.decode_beams(TEST_PROBS, beam_width=16)
        bnat = host_nat.decode_beams(TEST_PROBS, beam_width=16)
        self.assertEqual([b.text for b in bpy], [b.text for b in bnat])
        for x, y in zip(bpy, bnat):
            self.assertAlmostEqual(x.lm_score, y.lm_score, places=6)

    def test_device_decode_with_native_backend(self):
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        lm_nat = LanguageModel(
            NativeNGramModel.from_file(ARPA),
            TEST_UNIGRAMS,
            alpha=1.0,
            unk_score_offset=0.0,
        )
        dev = TPUBeamSearchDecoderCTC(alphabet, lm_nat)
        top = dev.decode_beams(TEST_PROBS, beam_width=16)[0]
        self.assertEqual(top.text, "bugs bunny")

    def test_open_ngram_file_auto(self):
        model = open_ngram_file(ARPA)
        self.assertIsInstance(model, NativeNGramModel)
        model = open_ngram_file(ARPA, backend="python")
        self.assertIsInstance(model, NGramModel)

    def test_rejects_order_above_native_limit(self):
        """An order-17 ARPA must fail cleanly at load, never build tables.

        The native Table keys are copied through fixed-width stack buffers;
        the loader refuses over-wide models before any insertion happens.
        """
        import tempfile

        from pyctcdecode_tpu.csrc import NativeNGram

        order = 17
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "wide.arpa")
            with open(path, "w") as fh:
                fh.write("\\data\\\n")
                for n in range(1, order + 1):
                    fh.write(f"ngram {n}=1\n")
                fh.write("\n")
                for n in range(1, order + 1):
                    fh.write(f"\\{n}-grams:\n")
                    key = " ".join(f"w{i}" for i in range(n))
                    row = f"-1.0\t{key}"
                    if n < order:
                        row += "\t-0.1"
                    fh.write(row + "\n\n")
                fh.write("\\end\\\n")
            with self.assertRaises(ValueError):
                NativeNGram(path)


if __name__ == "__main__":
    unittest.main()


@needs_native
@pytest.mark.skipif(not os.path.exists(ARPA), reason="reference fixtures absent")
class TestNativeSerialization(TempfileTestCase):
    def test_save_load_round_trip_native_backend(self):
        """LanguageModel dir round-trip with the native model backend."""
        from pyctcdecode_tpu import LanguageModel

        lm = LanguageModel(
            NativeNGramModel.from_file(ARPA), ["bugs", "bunny"], alpha=0.9
        )
        lm.save_to_dir(self.temp_dir)
        loaded = LanguageModel.load_from_dir(self.temp_dir)
        # auto backend re-opens the copied ARPA natively
        self.assertIsInstance(loaded.ngram_model, NativeNGramModel)
        self.assertEqual(loaded.alpha, 0.9)
        self.assertEqual(loaded.order, 2)
        score_a, state_a = lm.score(lm.get_start_state(), "bugs")
        score_b, state_b = loaded.score(loaded.get_start_state(), "bugs")
        self.assertAlmostEqual(score_a, score_b, places=6)
        self.assertEqual(state_a, state_b)
