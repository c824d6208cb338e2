"""WER / CER metric tests."""
import pytest

from pyctcdecode_tpu.utils.metrics import (
    character_error_rate,
    edit_distance,
    wer_numerator_denominator,
    word_error_rate,
)


def test_edit_distance():
    assert edit_distance([], []) == 0
    assert edit_distance(list("abc"), list("abc")) == 0
    assert edit_distance(list("kitten"), list("sitting")) == 3
    assert edit_distance("a b".split(), "a c b".split()) == 1


def test_wer():
    refs = ["the cat sat", "on the mat"]
    hyps = ["the cat sat", "on a mat"]
    assert word_error_rate(refs, hyps) == pytest.approx(1 / 6)
    assert word_error_rate(refs, refs) == 0.0


def test_cer():
    assert character_error_rate(["abc"], ["axc"]) == pytest.approx(1 / 3)


def test_sharded_aggregation():
    refs = ["a b c", "d e", "f g h i"]
    hyps = ["a x c", "d e", "f g h"]
    full = word_error_rate(refs, hyps)
    n1, d1 = wer_numerator_denominator(refs[:2], hyps[:2])
    n2, d2 = wer_numerator_denominator(refs[2:], hyps[2:])
    assert (n1 + n2) / (d1 + d2) == pytest.approx(full)


def test_mismatched_lengths():
    with pytest.raises(ValueError):
        word_error_rate(["a"], ["a", "b"])
    with pytest.raises(ValueError):
        word_error_rate([], [])
