"""Opt-in decode statistics (SURVEY §5.5 observability counters).

The engine accumulates per-utterance counters on device when
``collect_stats=True``; these tests pin their sanity (bounds, frame
accounting, probe hit rates) and that the segmented and scan paths agree.
"""
import os

import numpy as np
import pytest

from .helpers import SAMPLE_LABELS, TEST_PROBS

from pyctcdecode_tpu.alphabet import Alphabet
from pyctcdecode_tpu.models.language_model import LanguageModel
from pyctcdecode_tpu.models.native import open_ngram_file
from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC

BUGS_ARPA = "/root/reference/pyctcdecode/tests/sample_data/bugs_bunny_kenlm.arpa"


@pytest.mark.skipif(not os.path.exists(BUGS_ARPA), reason="no reference data")
def test_stats_sane_and_results_unchanged():
    alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
    lm = LanguageModel(open_ngram_file(BUGS_ARPA), ["bugs", "bunny"])
    dec = TPUBeamSearchDecoderCTC(alphabet, lm, segment_frames=0)
    batch = [TEST_PROBS, TEST_PROBS[:9]]
    beam_width = 12

    plain = dec.decode_beams_batch(batch, beam_width=beam_width)
    results, stats = dec.decode_beams_batch(
        batch, beam_width=beam_width, collect_stats=True
    )
    # stats collection must not perturb decoding
    assert [[b.text for b in utt] for utt in results] == [
        [b.text for b in utt] for utt in plain
    ]

    assert len(stats) == len(batch)
    for st, mat in zip(stats, batch):
        frames = mat.shape[0]
        assert st["frames"] == frames
        assert 0 < st["beams_alive"] <= frames * beam_width
        assert st["selected_alive"] <= frames * beam_width
        assert st["candidates_valid"] > 0
        assert st["words_committed"] >= 1  # "bunny bunny" commits words
        assert 0 <= st["history_pruned"] <= frames * beam_width
        assert st["probe_queries"] == st["beams_alive"]  # one LM member
        for key in ("probe_hits_o1", "probe_hits_o2"):
            assert 0 <= st[key] <= st["probe_queries"]


@pytest.mark.skipif(not os.path.exists(BUGS_ARPA), reason="no reference data")
def test_stats_segmented_matches_scan():
    alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
    lm = LanguageModel(open_ngram_file(BUGS_ARPA), ["bugs", "bunny"])
    scan_dec = TPUBeamSearchDecoderCTC(alphabet, lm, segment_frames=0)
    seg_dec = TPUBeamSearchDecoderCTC(alphabet, lm, segment_frames=4)
    batch = [TEST_PROBS, TEST_PROBS[:7]]
    _, scan_stats = scan_dec.decode_beams_batch(
        batch, beam_width=10, collect_stats=True
    )
    _, seg_stats = seg_dec.decode_beams_batch(
        batch, beam_width=10, collect_stats=True
    )
    assert scan_stats == seg_stats


def test_stats_no_lm():
    alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
    dec = TPUBeamSearchDecoderCTC(alphabet, segment_frames=0)
    _, stats = dec.decode_beams_batch(
        [TEST_PROBS], beam_width=8, collect_stats=True
    )
    st = stats[0]
    assert st["frames"] == TEST_PROBS.shape[0]
    assert "probe_queries" not in st
    assert st["beams_alive"] > 0


@pytest.mark.skipif(not os.path.exists(BUGS_ARPA), reason="no reference data")
def test_stats_timeline_matches_dense():
    """Timeline-mode stats: frame-shaped counters equal the dense path.

    Per-chunk work counters accumulate over virtual steps (>= the dense
    per-frame counts); frame-shaped counters are final-chunk-gated and
    must match dense mode exactly (engine.stats_fields docstring).
    """
    alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
    lm = LanguageModel(open_ngram_file(BUGS_ARPA), ["bugs", "bunny"])
    dec = TPUBeamSearchDecoderCTC(alphabet, lm, segment_frames=0)
    batch = [TEST_PROBS, TEST_PROBS[:9]]
    beam_width = 12

    plain = dec.decode_beams_batch(batch, beam_width=beam_width)
    results, tl_stats = dec.decode_beams_batch(
        batch, beam_width=beam_width, token_chunking=4, collect_stats=True
    )
    # stats collection must not perturb timeline decoding
    assert [[b.text for b in utt] for utt in results] == [
        [b.text for b in utt] for utt in plain
    ]
    _, dense_stats = dec.decode_beams_batch(
        batch, beam_width=beam_width, collect_stats=True
    )
    for st, dst, mat in zip(tl_stats, dense_stats, batch):
        assert st["frames"] == dst["frames"] == mat.shape[0]
        for key in (
            "selected_alive",
            "history_pruned",
            "words_committed",
            "candidates_valid",
        ):
            assert st[key] == dst[key], (key, st[key], dst[key])
        # chunk-accumulated counters can only exceed the per-frame ones
        assert st["beams_alive"] >= dst["beams_alive"]
        assert st["probe_queries"] >= dst["probe_queries"]
        for key in ("probe_hits_o1", "probe_hits_o2"):
            assert 0 <= st[key] <= st["probe_queries"]


@pytest.mark.skipif(not os.path.exists(BUGS_ARPA), reason="no reference data")
def test_stats_timeline_segmented_matches_scan():
    """Segmented (host-dispatched) timeline stats equal the scan path's."""
    alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
    lm = LanguageModel(open_ngram_file(BUGS_ARPA), ["bugs", "bunny"])
    scan_dec = TPUBeamSearchDecoderCTC(alphabet, lm, segment_frames=0)
    seg_dec = TPUBeamSearchDecoderCTC(alphabet, lm, segment_frames=4)
    batch = [TEST_PROBS, TEST_PROBS[:7]]
    _, scan_stats = scan_dec.decode_beams_batch(
        batch, beam_width=10, token_chunking=4, collect_stats=True
    )
    _, seg_stats = seg_dec.decode_beams_batch(
        batch, beam_width=10, token_chunking=4, collect_stats=True
    )
    assert scan_stats == seg_stats
