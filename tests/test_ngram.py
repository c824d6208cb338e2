"""n-gram runtime tests: ARPA parsing, KenLM-semantics scoring, binary format."""
import math
import os
import tempfile
import unittest

import numpy as np
import pytest

from pyctcdecode_tpu.models.binfmt import compile_arpa
from pyctcdecode_tpu.models.ngram import (
    NGramModel,
    load_unigram_set_from_arpa,
    read_arpa,
)

# A self-authored trigram ARPA exercising real backoff paths.
TRIGRAM_ARPA = """
\\data\\
ngram 1=6
ngram 2=4
ngram 3=2

\\1-grams:
-2.5\t<unk>\t0
-99\t<s>\t-0.7
-1.2\t</s>\t0
-0.8\tred\t-0.3
-0.9\tblue\t-0.4
-1.0\tfox\t-0.2

\\2-grams:
-0.5\t<s> red\t-0.25
-0.6\tred fox\t-0.15
-0.7\tblue fox\t0
-0.4\tfox </s>\t0

\\3-grams:
-0.3\t<s> red fox
-0.2\tred fox </s>

\\end\\
""".lstrip()


def make_trigram_model(tmpdir):
    path = os.path.join(tmpdir, "tri.arpa")
    with open(path, "w") as fh:
        fh.write(TRIGRAM_ARPA)
    return NGramModel.from_file(path)


class TestArpaParsing(unittest.TestCase):
    def setUp(self):
        self.tmp = tempfile.TemporaryDirectory()
        self.model = make_trigram_model(self.tmp.name)

    def tearDown(self):
        self.tmp.cleanup()

    def test_order_and_vocab(self):
        self.assertEqual(self.model.order, 3)
        self.assertIn("red", self.model)
        self.assertIn("<s>", self.model)
        self.assertNotIn("<unk>", self.model)  # KenLM parity: unk reports False
        self.assertNotIn("wolf", self.model)

    def test_unigram_set(self):
        unigrams = load_unigram_set_from_arpa(os.path.join(self.tmp.name, "tri.arpa"))
        self.assertEqual(unigrams, {"<unk>", "<s>", "</s>", "red", "blue", "fox"})

    def test_direct_trigram_hit(self):
        # p(fox | <s> red) = trigram -0.3, no backoff
        state = self.model.begin_sentence_state()
        s1, st1 = self.model.raw_score_word(state, "red")
        self.assertAlmostEqual(s1, -0.5, places=6)  # bigram <s> red
        s2, st2 = self.model.raw_score_word(st1, "fox")
        self.assertAlmostEqual(s2, -0.3, places=6)  # trigram <s> red fox

    def test_backoff_chain(self):
        # p(red | blue fox): no trigram, no bigram "fox red"
        # -> B(blue fox) + B(fox) + P(red) = 0 + (-0.2) + (-0.8) = -1.0
        state = self.model.null_context_state()
        _, st = self.model.raw_score_word(state, "blue")
        _, st = self.model.raw_score_word(st, "fox")
        score, _ = self.model.raw_score_word(st, "red")
        self.assertAlmostEqual(score, -1.0, places=5)

    def test_bigram_backoff_partial(self):
        # p(fox | blue): bigram "blue fox" = -0.7 directly
        state = self.model.null_context_state()
        _, st = self.model.raw_score_word(state, "blue")
        score, _ = self.model.raw_score_word(st, "fox")
        self.assertAlmostEqual(score, -0.7, places=6)

    def test_oov_goes_through_unk(self):
        # p(wolf | red) -> unk: B(red) + P(<unk>) = -0.3 + -2.5
        state = self.model.null_context_state()
        _, st = self.model.raw_score_word(state, "red")
        score, out_state = self.model.raw_score_word(st, "wolf")
        self.assertAlmostEqual(score, -2.8, places=5)
        # state after unk: longest suffix present = (<unk>,)
        self.assertEqual(len(out_state), 1)

    def test_state_truncation(self):
        # after "<s> red fox" the state keeps at most order-1 = 2 words,
        # and only the longest suffix with an entry: ("red", "fox")
        state = self.model.begin_sentence_state()
        _, st = self.model.raw_score_word(state, "red")
        _, st = self.model.raw_score_word(st, "fox")
        self.assertEqual(self.model.state_words(st), ["red", "fox"])

    def test_end_score(self):
        # p(</s> | red fox) = trigram "red fox </s>" = -0.2
        state = self.model.begin_sentence_state()
        _, st = self.model.raw_score_word(state, "red")
        _, st = self.model.raw_score_word(st, "fox")
        self.assertAlmostEqual(self.model.raw_end_score(st), -0.2, places=6)

    def test_binary_round_trip(self):
        bin_path = os.path.join(self.tmp.name, "tri.ctclm")
        compile_arpa(os.path.join(self.tmp.name, "tri.arpa"), bin_path)
        model2 = NGramModel.from_file(bin_path)
        self.assertEqual(model2.order, 3)
        for words in [("red", "fox"), ("blue", "fox"), ("fox", "red")]:
            st1 = self.model.null_context_state()
            st2 = model2.null_context_state()
            for w in words:
                s1, st1 = self.model.raw_score_word(st1, w)
                s2, st2 = model2.raw_score_word(st2, w)
                self.assertAlmostEqual(s1, s2, places=6)

    def test_foreign_binary_rejected(self):
        bad = os.path.join(self.tmp.name, "foreign.bin")
        with open(bad, "wb") as fh:
            fh.write(b"mmap lm data not ours")
        with self.assertRaises(ValueError):
            NGramModel.from_file(bad)


class TestBugsBunnyParity:
    """Golden parity against the reference's handwritten 2-gram fixture."""

    def test_fixture_scores(self, bugs_bunny_arpa_path):
        model = NGramModel.from_file(bugs_bunny_arpa_path)
        assert model.order == 2
        state = model.begin_sentence_state()
        s_bugs, st = model.raw_score_word(state, "bugs")
        assert s_bugs == pytest.approx(0.0)  # bigram "<s> bugs" = 0
        s_bunny, st2 = model.raw_score_word(st, "bunny")
        assert s_bunny == pytest.approx(0.0)  # bigram "bugs bunny" = 0
        assert model.raw_end_score(st2) == pytest.approx(0.0)  # "bunny </s>" = 0

        # "<s> bunny" has prob -10
        s_bunny_first, _ = model.raw_score_word(state, "bunny")
        assert s_bunny_first == pytest.approx(-10.0)

        # OOV word goes through <unk> (-10) with zero backoffs
        s_oov, _ = model.raw_score_word(state, "elmer")
        assert s_oov == pytest.approx(-10.0)


if __name__ == "__main__":
    unittest.main()
