"""Alphabet normalization tests (parity surface: ref test_alphabet.py)."""
import unittest

from pyctcdecode_tpu.alphabet import (
    BPE_TOKEN,
    UNK_BPE_TOKEN,
    UNK_TOKEN,
    Alphabet,
    verify_alphabet_coverage,
)


class TestAlphabet(unittest.TestCase):
    def test_regular_nemo_style(self):
        labels = [" ", "a", "b", "'"]
        alphabet = Alphabet.build_alphabet(labels)
        self.assertFalse(alphabet.is_bpe)
        # blank appended at the end
        self.assertEqual(alphabet.labels, [" ", "a", "b", "'", ""])

    def test_regular_huggingface_style(self):
        labels = ["<pad>", "<s>", "</s>", "<unk>", "|", "a", "b"]
        alphabet = Alphabet.build_alphabet(labels)
        self.assertFalse(alphabet.is_bpe)
        out = alphabet.labels
        self.assertEqual(out[0], "")  # <pad> -> blank
        self.assertIn(" ", out)  # | -> space
        self.assertIn(UNK_TOKEN, out)
        self.assertNotIn("|", out)

    def test_underscore_blank_substitution(self):
        labels = ["_", " ", "a"]
        alphabet = Alphabet.build_alphabet(labels)
        self.assertEqual(alphabet.labels, ["", " ", "a"])

    def test_bpe_sentencepiece_style(self):
        labels = ["<unk>", "▁bug", "s", "▁bunny", ""]
        alphabet = Alphabet.build_alphabet(labels)
        self.assertTrue(alphabet.is_bpe)
        out = alphabet.labels
        self.assertIn(UNK_BPE_TOKEN, out)
        self.assertIn("", out)

    def test_bpe_hash_style_conversion(self):
        labels = ["[unk]", "bug", "##s", "bunny", "[pad]"]
        alphabet = Alphabet.build_alphabet(labels)
        self.assertTrue(alphabet.is_bpe)
        out = alphabet.labels
        self.assertIn(BPE_TOKEN + "bug", out)
        self.assertIn("s", out)  # ##s -> continuation piece
        self.assertIn(UNK_BPE_TOKEN, out)
        self.assertIn("", out)

    def test_duplicate_rejected(self):
        with self.assertRaises(ValueError):
            Alphabet.build_alphabet([" ", "a", "a"])

    def test_bpe_with_space_rejected(self):
        with self.assertRaises(ValueError):
            Alphabet.build_alphabet(["▁a", " ", "b"])

    def test_json_round_trip(self):
        alphabet = Alphabet.build_alphabet([" ", "a", "b"])
        restored = Alphabet.loads(alphabet.dumps())
        self.assertEqual(restored.labels, alphabet.labels)
        self.assertEqual(restored.is_bpe, alphabet.is_bpe)

    def test_loads_strict_keys(self):
        with self.assertRaises(ValueError):
            Alphabet.loads('{"labels": [" "], "is_bpe": false, "extra": 1}')
        with self.assertRaises(ValueError):
            Alphabet.loads('{"labels": [" "]}')

    def test_coverage_warning_path(self):
        alphabet = Alphabet.build_alphabet([" ", "a", "b"])
        # should not raise regardless of coverage
        verify_alphabet_coverage(alphabet, ["ab", "ba"])
        verify_alphabet_coverage(alphabet, ["xyz", "qqq"])


if __name__ == "__main__":
    unittest.main()
