"""Shared test fixtures: the handcrafted bugs/bunny world.

Same miniature test universe as the reference suite (an 8-label alphabet,
one-hot utterances for "bugs"/"bunny", and an ambiguous mixture a language
model must disambiguate; ref test_decoder.py:190-223) so the reference's
golden outputs apply verbatim as parity targets.
"""
import os
import shutil
import tempfile
import unittest

import numpy as np

SAMPLE_LABELS = [" ", "b", "g", "n", "s", "u", "y", ""]
SAMPLE_VOCAB = {c: n for n, c in enumerate(SAMPLE_LABELS)}

LIBRI_LABELS = [" "] + list("abcdefghijklmnopqrstuvwxyz") + ["'"]

TEST_UNIGRAMS = ["bugs", "bunny"]


def one_hots(chars):
    """Stack of one-hot probability rows spelling out ``chars``."""
    mat = np.zeros((len(chars), len(SAMPLE_VOCAB)))
    for n, c in enumerate(chars):
        mat[n][SAMPLE_VOCAB[c]] = 1
    return mat


BUGS_PROBS = one_hots(["b", "u", "g", "s"])
BUNNY_PROBS = one_hots(["b", "u", "n", "", "n", "y"])
BLANK_PROBS = one_hots([""])
SPACE_PROBS = one_hots([" "])

# ambiguous mixture: greedy says "bunny bunny", a bigram LM flips word 1 to "bugs"
TEST_PROBS = np.vstack(
    [
        np.vstack([BUGS_PROBS, BLANK_PROBS, BLANK_PROBS]) * 0.49 + BUNNY_PROBS * 0.51,
        SPACE_PROBS,
        BUNNY_PROBS,
    ]
)
TEST_LOGITS = np.log(np.clip(TEST_PROBS, 1e-15, 1))

# golden outputs from the reference test suite (test_decoder.py:330-336, 542)
GOLDEN_TOP_LOGIT_SCORE = -2.853399551509947
GOLDEN_TOP_LM_SCORE = 0.14660044849005294
GOLDEN_PARTIAL_LOGIT_SCORE = -2.6933782130551505


class TempfileTestCase(unittest.TestCase):
    """unittest fixture providing a scratch directory per test."""

    def setUp(self):
        self.temp_dir = tempfile.mkdtemp()

    def tearDown(self):
        shutil.rmtree(self.temp_dir, ignore_errors=True)

    def clear_dir(self):
        for name in os.listdir(self.temp_dir):
            path = os.path.join(self.temp_dir, name)
            if os.path.isdir(path):
                shutil.rmtree(path)
            else:
                os.remove(path)


class MockPool:
    """In-process stand-in for multiprocessing.Pool."""

    def __init__(self, ctx):
        self._ctx = ctx
        self.map_has_run = False

    def map(self, func, items):
        self.map_has_run = True
        return [func(e) for e in items]


class MockContext:
    """Arbitrary non-spawn pool context."""
