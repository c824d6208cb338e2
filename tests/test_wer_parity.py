"""Corpus-level parity: host and device engines decode real-ish workloads
to identical transcripts (the north-star WER-parity property, SURVEY.md §6).
"""
import json
import os
import unittest

import numpy as np
import pytest

from pyctcdecode_tpu import Alphabet, BeamSearchDecoderCTC, LanguageModel
from pyctcdecode_tpu.models.ngram import NGramModel
from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC
from pyctcdecode_tpu.utils.metrics import word_error_rate

from .helpers import LIBRI_LABELS

SAMPLE = "/root/reference/pyctcdecode/tests/sample_data/libri_logits.json"
TRANSCRIPT = (
    "i have a good deal of will you remember and what i have set my mind upon "
    "no doubt i shall some day achieve"
)


def _small_arpa(path):
    words = TRANSCRIPT.split()
    vocab = sorted(set(words))
    bigrams = sorted(set(zip(words[:-1], words[1:])))
    with open(path, "w") as fh:
        fh.write("\\data\\\n")
        fh.write(f"ngram 1={len(vocab) + 3}\nngram 2={len(bigrams)}\n\n")
        fh.write("\\1-grams:\n-10\t<unk>\t0\n-2\t<s>\t-0.5\n-2\t</s>\t0\n")
        for w in vocab:
            fh.write(f"-1.5\t{w}\t-0.5\n")
        fh.write("\n\\2-grams:\n")
        for a, b in bigrams:
            fh.write(f"-0.5\t{a} {b}\n")
        fh.write("\n\\end\\\n")


@pytest.mark.skipif(not os.path.exists(SAMPLE), reason="reference fixtures absent")
class TestCorpusParity(unittest.TestCase):
    def tearDown(self):
        BeamSearchDecoderCTC.clear_class_models()

    def test_noisy_corpus_same_wer(self):
        """Host and device decode a noisy batch to identical transcripts."""
        import tempfile

        with open(SAMPLE) as fh:
            base = np.array(json.load(fh))
        rng = np.random.RandomState(0)
        corpus = [base + rng.randn(*base.shape) * s for s in (0.0, 0.3, 0.6, 1.0)]
        refs = [TRANSCRIPT] * len(corpus)

        alphabet = Alphabet.build_alphabet(LIBRI_LABELS + [""])
        with tempfile.TemporaryDirectory() as td:
            arpa = os.path.join(td, "t.arpa")
            _small_arpa(arpa)
            unigrams = sorted(set(TRANSCRIPT.split()))
            host = BeamSearchDecoderCTC(
                alphabet, LanguageModel(NGramModel.from_file(arpa), unigrams)
            )
            dev = TPUBeamSearchDecoderCTC(
                alphabet, LanguageModel(NGramModel.from_file(arpa), unigrams)
            )
            host_texts = [host.decode(m, beam_width=16) for m in corpus]
            dev_texts = dev.decode_batch(corpus, beam_width=16)
        self.assertEqual(host_texts, dev_texts)
        host_wer = word_error_rate(refs, host_texts)
        dev_wer = word_error_rate(refs, dev_texts)
        self.assertEqual(host_wer, dev_wer)
        # the clean utterance must still be perfect
        self.assertEqual(dev_texts[0], TRANSCRIPT)


if __name__ == "__main__":
    unittest.main()
