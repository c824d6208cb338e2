"""Streaming / stateful decode tests: chunked must equal full decode."""
import numpy as np
import pytest

from pyctcdecode_tpu import build_ctcdecoder
from pyctcdecode_tpu.models.hotwords import HotwordScorer

from .helpers import (
    GOLDEN_PARTIAL_LOGIT_SCORE,
    SAMPLE_LABELS,
    TEST_LOGITS,
)


def _run_chunked(decoder, chunks, offsets, scorers=None, **kwargs):
    beams, lm_cache, p_cache = decoder.get_starting_state()
    out = None
    last = len(chunks) - 1
    for i, (chunk, offset) in enumerate(zip(chunks, offsets)):
        scorer = scorers[i] if scorers else None
        out = decoder.partial_decode_beams(
            chunk,
            lm_cache,
            p_cache,
            beams,
            offset,
            hotword_scorer=scorer,
            is_end=(i == last),
            **kwargs,
        )
        if i != last:
            from pyctcdecode_tpu.decoder import Beam

            beams = [Beam.from_lm_beam(b) for b in out]
    return out


class TestPartialDecode:
    def test_chunked_equals_full(self):
        decoder = build_ctcdecoder(SAMPLE_LABELS, engine="host")
        beams0, lm_cache, p_cache = decoder.get_starting_state()
        full = decoder.partial_decode_beams(
            TEST_LOGITS, lm_cache, p_cache, beams0, 0, is_end=True
        )
        chunked = _run_chunked(
            decoder,
            [TEST_LOGITS[:3], TEST_LOGITS[3:8], TEST_LOGITS[8:]],
            [0, 3, 8],
        )
        assert len(full) == len(chunked)
        assert chunked[0].text == "bunny bunny"
        assert chunked[0].text_frames == [(0, 6), (7, 13)]
        assert chunked[0].logit_score == pytest.approx(GOLDEN_PARTIAL_LOGIT_SCORE)
        for f, c in zip(full, chunked):
            assert f.text == c.text
            assert f.text_frames == c.text_frames
            assert f.logit_score == pytest.approx(c.logit_score)

        # and both match the one-shot API
        decoded = decoder.decode_beams(TEST_LOGITS)
        assert len(decoded) == len(chunked)
        for d, c in zip(decoded, chunked):
            assert d.text == c.text
            assert [wf[1] for wf in d.text_frames] == c.text_frames
            assert d.logit_score == pytest.approx(c.logit_score)

    def test_chunked_equals_full_with_lm(self, bugs_bunny_arpa_path):
        decoder = build_ctcdecoder(SAMPLE_LABELS, bugs_bunny_arpa_path, engine="host")
        chunked = _run_chunked(
            decoder,
            [TEST_LOGITS[:3], TEST_LOGITS[3:8], TEST_LOGITS[8:]],
            [0, 3, 8],
        )
        decoded = decoder.decode_beams(TEST_LOGITS)
        assert chunked[0].text == "bugs bunny"
        assert len(decoded) == len(chunked)
        for d, c in zip(decoded, chunked):
            assert d.text == c.text
            assert [wf[1] for wf in d.text_frames] == c.text_frames
            assert d.logit_score == pytest.approx(c.logit_score)

    def test_chunked_with_hotwords(self):
        decoder = build_ctcdecoder(SAMPLE_LABELS, engine="host")
        scorer = HotwordScorer.build_scorer(["bugs"], weight=25.0)
        chunked = _run_chunked(
            decoder,
            [TEST_LOGITS[:3], TEST_LOGITS[3:8], TEST_LOGITS[8:]],
            [0, 3, 8],
            scorers=[scorer, scorer, scorer],
        )
        decoded = decoder.decode_beams(TEST_LOGITS, hotwords=["bugs"], hotword_weight=25.0)
        assert chunked[0].text == "bugs bunny"
        for d, c in zip(decoded, chunked):
            assert d.text == c.text
            assert d.logit_score == pytest.approx(c.logit_score)

    def test_swappable_hotword_scorers(self):
        decoder = build_ctcdecoder(SAMPLE_LABELS, engine="host")
        hw_bugs = HotwordScorer.build_scorer(["bugs"], weight=15.0)
        hw_bunny = HotwordScorer.build_scorer(["bunny"], weight=15.0)

        # boost dropped mid-stream: "bug" partial never completes
        out = _run_chunked(
            decoder,
            [TEST_LOGITS[:3], TEST_LOGITS[3:8], TEST_LOGITS[8:]],
            [0, 3, 8],
            scorers=[hw_bugs, hw_bunny, None],
        )
        assert out[0].text == "bugny bunny"

        # boost kept through the word, swapped after
        out = _run_chunked(
            decoder,
            [TEST_LOGITS[:3], TEST_LOGITS[3:8], TEST_LOGITS[8:]],
            [0, 3, 8],
            scorers=[hw_bugs, hw_bugs, hw_bunny],
        )
        assert out[0].text == "bugs bunny"
