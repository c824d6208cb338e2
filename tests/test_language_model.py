"""LanguageModel / MultiLanguageModel / HotwordScorer / trie tests."""
import os
import unittest

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyctcdecode_tpu.models.hotwords import HotwordScorer
from pyctcdecode_tpu.models.language_model import LanguageModel, MultiLanguageModel
from pyctcdecode_tpu.models.ngram import NGramModel
from pyctcdecode_tpu.utils.trie import CharTrie

from .helpers import TempfileTestCase


class TestHotwordScorer(unittest.TestCase):
    def test_full_word_matching(self):
        scorer = HotwordScorer.build_scorer(["tyrion lannister", "hodor"], weight=1.0)
        self.assertEqual(scorer.score("i work with hodor and friends"), 1.0)
        # ngrams are split into unigrams
        self.assertEqual(scorer.score("we can match tyrion only"), 1.0)
        # repeated matches count twice
        self.assertEqual(scorer.score("hodor is friends with hodor"), 2.0)
        # word boundary is space/bos/eos only: punctuation blocks a match
        self.assertEqual(scorer.score("do not match hodor, or anything else here"), 0.0)

    def test_punctuation_hotword(self):
        scorer = HotwordScorer.build_scorer(["hodor,"], weight=1.0)
        self.assertEqual(scorer.score("please match hodor, but not hodor"), 1.0)

    def test_prefix_membership(self):
        scorer = HotwordScorer.build_scorer(["tyrion lannister", "hodor"])
        self.assertIn("hod", scorer)
        self.assertNotIn("dor", scorer)
        self.assertIn("hodor", scorer)
        self.assertIn("lann", scorer)

        scorer = HotwordScorer.build_scorer(["U.S.A."])
        self.assertIn("U.S", scorer)

    def test_partial_token_scoring(self):
        scorer = HotwordScorer.build_scorer(["bunny", "bug"], weight=10.0)
        # "bu" scales against the shortest completion ("bug", len 3)
        self.assertAlmostEqual(scorer.score_partial_token("bu"), 10.0 * 2 / 3)
        self.assertAlmostEqual(scorer.score_partial_token("bunn"), 10.0 * 4 / 5)
        self.assertEqual(scorer.score_partial_token("xyz"), 0.0)

    def test_empty_hotwords(self):
        scorer = HotwordScorer.build_scorer([], weight=5.0)
        self.assertEqual(scorer.score("anything at all"), 0.0)
        self.assertEqual(scorer.score_partial_token("any"), 0.0)
        self.assertNotIn("a", scorer)
        # whitespace-only entries are dropped
        scorer = HotwordScorer.build_scorer(["   ", ""], weight=5.0)
        self.assertEqual(scorer.score("anything"), 0.0)


class TestCharTrie(unittest.TestCase):
    def test_prefix_and_shortest(self):
        trie = CharTrie.fromkeys(["bug", "bunny", "bugs"])
        self.assertTrue(trie.has_prefix("bu"))
        self.assertTrue(trie.has_prefix("bugs"))
        self.assertFalse(trie.has_prefix("bux"))
        self.assertEqual(trie.shortest_completion_len("bu"), 3)
        self.assertEqual(trie.shortest_completion_len("bun"), 5)
        self.assertEqual(trie.shortest_completion_len("nope"), 0)
        self.assertIn("bug", trie)
        self.assertNotIn("bun", trie)

    def test_empty(self):
        trie = CharTrie()
        self.assertFalse(trie.has_prefix(""))
        self.assertFalse(trie.has_prefix("a"))
        self.assertEqual(len(trie), 0)

    def test_prefix_enumeration(self):
        trie = CharTrie.fromkeys(["ab", "ac"])
        prefixes = {p: (m, t) for p, m, t in trie.iter_prefixes_of_keys()}
        self.assertEqual(set(prefixes), {"a", "ab", "ac"})
        self.assertEqual(prefixes["a"][0], 2)
        self.assertTrue(prefixes["ab"][1])


class TestLanguageModel:
    def test_partial_token_scoring(self, bugs_bunny_arpa_path):
        model = NGramModel.from_file(bugs_bunny_arpa_path)
        lm = LanguageModel(model, ["bugs", "bunny"], unk_score_offset=-10.0)
        assert lm.score_partial_token("bu") == 0.0
        assert lm.score_partial_token("bux") == -10.0
        # long unknown tokens scale by length past AVG_TOKEN_LEN
        assert lm.score_partial_token("buxxxxxxx") == pytest.approx(-10.0 * 9 / 6)
        # no trie at all: everything is OOV
        lm_no_uni = LanguageModel(model, None)
        assert lm_no_uni.score_partial_token("bu") == -10.0

    def test_score_boundary_modes(self, bugs_bunny_arpa_path):
        model = NGramModel.from_file(bugs_bunny_arpa_path)
        lm = LanguageModel(model, ["bugs", "bunny"], alpha=1.0, beta=0.0, score_boundary=True)
        state = lm.get_start_state()
        fused, _ = lm.score(state, "bugs")
        # bigram "<s> bugs" = 0 log10 -> fused 0
        assert fused == pytest.approx(0.0)

        lm_nb = LanguageModel(model, ["bugs", "bunny"], alpha=1.0, beta=0.0, score_boundary=False)
        state = lm_nb.get_start_state()
        fused_nb, _ = lm_nb.score(state, "bugs")
        # unigram "bugs" = 0 log10 -> also 0 here (fixture probs are 0)
        assert fused_nb == pytest.approx(0.0)

    def test_reset_params_type_checks(self, bugs_bunny_arpa_path):
        model = NGramModel.from_file(bugs_bunny_arpa_path)
        lm = LanguageModel(model)
        lm.reset_params(alpha=0.7, beta=2.0, unk_score_offset=-5.0, score_boundary=False)
        assert lm.alpha == 0.7 and lm.beta == 2.0
        with pytest.raises(ValueError):
            lm.reset_params(alpha="x")
        with pytest.raises(ValueError):
            lm.reset_params(score_boundary=1)

    def test_multi_lm_requires_two(self, bugs_bunny_arpa_path):
        model = NGramModel.from_file(bugs_bunny_arpa_path)
        lm = LanguageModel(model)
        with pytest.raises(ValueError):
            MultiLanguageModel([lm])
        multi = MultiLanguageModel([lm, lm])
        assert multi.order == lm.order
        state = multi.get_start_state()
        fused, new_state = multi.score(state, "bugs")
        single, _ = lm.score(lm.get_start_state(), "bugs")
        assert fused == pytest.approx(single)
        assert len(new_state.states) == 2


class TestFuzzLanguageModel:
    @settings(deadline=None, max_examples=25)
    @given(
        unigrams=st.one_of(st.none(), st.lists(st.text())),
        alpha=st.floats(allow_nan=False),
        beta=st.floats(allow_nan=False),
        unk_score_offset=st.floats(allow_nan=False),
        score_boundary=st.booleans(),
        partial_token=st.text(),
    )
    def test_fuzz_constructor_and_partial(
        self,
        unigrams,
        alpha,
        beta,
        unk_score_offset,
        score_boundary,
        partial_token,
        bugs_bunny_arpa_path,
    ):
        model = NGramModel.from_file(bugs_bunny_arpa_path)
        lm = LanguageModel(
            model,
            unigrams=unigrams,
            alpha=alpha,
            beta=beta,
            unk_score_offset=unk_score_offset,
            score_boundary=score_boundary,
        )
        lm.score_partial_token(partial_token)

    @settings(deadline=None, max_examples=10)
    @given(weight=st.floats(allow_nan=False), token=st.text())
    def test_fuzz_hotwords(self, weight, token):
        scorer = HotwordScorer.build_scorer(["alpha", "beta gamma"], weight=weight)
        scorer.score(token)
        scorer.score_partial_token(token)


class TestLanguageModelSerialization(TempfileTestCase):
    def _arpa(self):
        # minimal self-authored ARPA for serialization tests
        path = os.path.join(self.temp_dir, "mini.arpa")
        with open(path, "w") as fh:
            fh.write(
                "\\data\\\nngram 1=4\n\n\\1-grams:\n"
                "-10\t<unk>\t0\n0\t<s>\t0\n0\t</s>\t0\n-1\tword\t0\n\n\\end\\\n"
            )
        return path

    def test_parse_directory(self):
        good = [
            ("unigrams.txt", "something.arpa", "attrs.json"),
            ("unigrams.txt", "something.bin", "attrs.json"),
            ("unigrams.txt", "something.binary", "attrs.json"),
            ("unigrams.txt", "something.binary", "attrs.json", ".hidden", "__pycache__"),
        ]
        bad = [
            ("something.arpa", "attrs.json"),
            ("unigrams.txt", "something.bin", "attrs.json", "extra.ext"),
            ("unigrams.txt", "something.binary", "attributes.json"),
        ]
        for filenames in good:
            self.clear_dir()
            for fn in filenames:
                with open(os.path.join(self.temp_dir, fn), "w") as fh:
                    fh.write("x")
            LanguageModel.parse_directory_contents(self.temp_dir)
        for filenames in bad:
            self.clear_dir()
            for fn in filenames:
                with open(os.path.join(self.temp_dir, fn), "w") as fh:
                    fh.write("x")
            with self.assertRaises(ValueError):
                LanguageModel.parse_directory_contents(self.temp_dir)

    def test_save_and_load_round_trip(self):
        arpa = self._arpa()
        model = NGramModel.from_file(arpa)
        lm = LanguageModel(model, unigrams=["word"], alpha=0.1)
        score = lm.score_partial_token("wo")

        save_dir = os.path.join(self.temp_dir, "lm")
        os.makedirs(save_dir)
        lm.save_to_dir(save_dir)
        assert len(LanguageModel.parse_directory_contents(save_dir)) == 3

        restored = LanguageModel.load_from_dir(save_dir)
        assert restored._unigram_set == lm._unigram_set
        assert restored.alpha == lm.alpha
        assert restored.beta == lm.beta
        assert restored.score_partial_token("wo") == score

        # overwrite with different params, reload twice
        lm2 = LanguageModel(model, unigrams=None, alpha=0.3, beta=0.2)
        for fn in os.listdir(save_dir):
            os.remove(os.path.join(save_dir, fn))
        lm2.save_to_dir(save_dir)
        for _ in range(2):
            again = LanguageModel.load_from_dir(save_dir)
            assert again._unigram_set == lm2._unigram_set
            assert again.alpha == lm2.alpha
            assert again.beta == lm2.beta


if __name__ == "__main__":
    unittest.main()


def test_multi_lm_reset_params_forwards_to_members():
    """Deliberate divergence: ensembles re-tune their members (the
    reference's MultiLanguageModel inherits the abstract no-op)."""
    from pyctcdecode_tpu.models.language_model import (
        LanguageModel,
        MultiLanguageModel,
    )
    from pyctcdecode_tpu.models.ngram import NGramModel, read_arpa
    import os

    arpa = "/root/reference/pyctcdecode/tests/sample_data/bugs_bunny_kenlm.arpa"
    if not os.path.exists(arpa):
        import pytest

        pytest.skip("reference fixtures absent")
    a = LanguageModel(NGramModel(read_arpa(arpa)), ["bugs"])
    b = LanguageModel(NGramModel(read_arpa(arpa)), ["bunny"])
    multi = MultiLanguageModel([a, b])
    multi.reset_params(alpha=0.25, beta=3.5)
    assert a.alpha == 0.25 and b.alpha == 0.25
    assert a.beta == 3.5 and b.beta == 3.5


def test_log_add_matches_np_logaddexp_to_the_ulp():
    import numpy as np

    from pyctcdecode_tpu.decoder import log_add

    rng = np.random.RandomState(0)
    for _ in range(2000):
        s1 = float(rng.uniform(-700, 0))
        s2 = s1 - float(rng.uniform(0, 60))
        assert log_add(s1, s2) == float(np.logaddexp(s1, s2))
