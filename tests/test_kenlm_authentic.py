"""Score-pin the kenlm binary readers against AUTHENTIC kenlm files.

The round-trip tests in test_kenlm_bin.py / test_kenlm_trie.py validate
the readers against this repo's own writers; a shared misreading of the
on-disk spec would survive them. This suite instead loads any binaries
produced by real kenlm ``build_binary`` vendored under
``tests/data/kenlm_authentic/`` (see the README there for the offline
generation recipe — this environment cannot build kenlm) and pins reader
scores against the ARPA scorer of the same model. It skips, loudly, while
no fixtures are vendored.
"""
import glob
import os

import numpy as np
import pytest

from pyctcdecode_tpu.models.kenlm_bin import KenLMBinaryModel
from pyctcdecode_tpu.models.ngram import NGramModel, read_arpa

DATA = os.path.join(os.path.dirname(__file__), "data", "kenlm_authentic")
FIXTURES = sorted(
    f for f in glob.glob(os.path.join(DATA, "*.bin"))
    if os.path.exists(f.rsplit(".", 2)[0] + ".arpa")
)


@pytest.mark.skipif(
    not FIXTURES,
    reason=(
        "no authentic kenlm binaries vendored under tests/data/"
        "kenlm_authentic/ (requires an offline kenlm build; see the "
        "README there) — reader compatibility is otherwise pinned by "
        "round-trip + ARPA-score + cross-reader tests"
    ),
)
@pytest.mark.parametrize("path", FIXTURES)
def test_authentic_binary_scores_match_arpa(path):
    arpa = path.rsplit(".", 2)[0] + ".arpa"
    ref = NGramModel(read_arpa(arpa))
    got = KenLMBinaryModel.from_file(path)
    assert got.order == ref.order
    quantized = ".qtrie" in path or ".quant" in path
    tol = 0.08 if quantized else 5e-6  # binned values vs exact floats
    vocab = [w for w in ref.tables.vocab if not w.startswith("<")]
    rng = np.random.RandomState(0)
    # every unigram in context, plus random sentences through the model
    for w in vocab:
        s_ref, _ = ref.raw_score_word(ref.begin_sentence_state(), w)
        s_got, _ = got.raw_score_word(got.begin_sentence_state(), w)
        assert abs(s_ref - s_got) <= tol, (w, s_ref, s_got)
    for _ in range(200):
        words = [vocab[i] for i in rng.randint(0, len(vocab), 6)]
        st_r, st_g = ref.begin_sentence_state(), got.begin_sentence_state()
        for w in words:
            s_r, st_r = ref.raw_score_word(st_r, w)
            s_g, st_g = got.raw_score_word(st_g, w)
            assert abs(s_r - s_g) <= tol, (words, w, s_r, s_g)
        assert abs(ref.raw_end_score(st_r) - got.raw_end_score(st_g)) <= tol
