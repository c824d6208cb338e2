"""Batched host-prep helpers must be bit-equal to their per-utterance twins.

The serving path runs normalization, blank collapse, token-timeline
construction and path replay as whole-batch vectorized passes
(``utils.logits.normalize_collapse_batch`` / ``token_timeline_batch``,
``tpu_decoder.replay_token_path_np``); these tests pin them against the
scalar reference implementations across fuzzed ragged batches.
"""
import numpy as np

from pyctcdecode_tpu.tpu_decoder import (
    replay_token_path,
    replay_token_path_np,
)
from pyctcdecode_tpu.utils.logits import (
    blank_collapse,
    normalize_batch,
    normalize_collapse_batch,
    normalize_to_logp,
    token_timeline,
    token_timeline_batch,
)

V = 9
BLANK = V - 1


def _fuzz_mats(rng, n):
    mats = []
    for _ in range(n):
        t = int(rng.choice([0, 1, 2, rng.randint(3, 40)]))
        kind = rng.randint(3)
        if kind == 0:  # probabilities
            mats.append(
                rng.dirichlet(np.ones(V) * 0.3, size=t).astype(np.float32)
            )
        elif kind == 1:  # raw logits
            mats.append((rng.randn(t, V) * 3).astype(np.float32))
        else:  # peaky blank-certain frames (collapsible)
            m = rng.randn(t, V).astype(np.float32) - 8
            m[:, BLANK] = 5.0
            if t:
                m[rng.randint(t), rng.randint(V)] = 6.0
            mats.append(m)
    return mats


def test_normalize_collapse_batch_matches_scalar():
    rng = np.random.RandomState(0)
    for _ in range(25):
        mats = _fuzz_mats(rng, rng.randint(1, 9))
        coll_b, keep_b, off_b = normalize_collapse_batch(mats, BLANK, -5.0)
        for i, m in enumerate(mats):
            lp = normalize_to_logp(m).astype(np.float32)
            ki, off = blank_collapse(lp, BLANK, -5.0)
            assert np.array_equal(ki, keep_b[i])
            assert np.array_equal(lp[ki], coll_b[i])
            assert off == off_b[i]


def test_normalize_batch_matches_scalar():
    rng = np.random.RandomState(1)
    mats = _fuzz_mats(rng, 7)
    outs = normalize_batch(mats)
    for m, got in zip(mats, outs):
        assert np.array_equal(normalize_to_logp(m).astype(np.float32), got)


def test_float64_probability_inputs_match_scalar():
    """f64 probability rows sum to 1 at f64 precision only: the sniff must
    run in the INPUT dtype (a pre-cast to f32 flips ~10% of dirichlet
    batches into the log-softmax branch — round-4 review finding)."""
    rng = np.random.RandomState(5)
    for _ in range(30):
        mats = [
            rng.dirichlet(np.ones(V) * 0.3, size=rng.randint(1, 30))
            for _ in range(rng.randint(1, 6))
        ]  # float64
        outs = normalize_batch(mats)
        for m, got in zip(mats, outs):
            want = normalize_to_logp(m).astype(np.float32)
            assert np.array_equal(want, got)
        coll_b, keep_b, off_b = normalize_collapse_batch(mats, BLANK, -5.0)
        for i, m in enumerate(mats):
            lp = normalize_to_logp(m).astype(np.float32)
            ki, off = blank_collapse(lp, BLANK, -5.0)
            assert np.array_equal(ki, keep_b[i])
            assert np.array_equal(lp[ki], coll_b[i])
            assert off == off_b[i]


def test_token_timeline_batch_matches_scalar():
    rng = np.random.RandomState(2)
    for _ in range(25):
        mats = [
            normalize_to_logp(m).astype(np.float32)
            for m in _fuzz_mats(rng, rng.randint(1, 9))
        ]
        for k in (1, 3, 6):
            tls, vlens = token_timeline_batch(mats, -5.0, k)
            for i, m in enumerate(mats):
                want = token_timeline(m, -5.0, k)
                assert vlens[i] == want[0].shape[0]
                for a, b in zip(want, tls[i]):
                    assert np.array_equal(a, b)


def test_replay_token_path_np_matches_python():
    labels = [" ", "a", "b", "c", ""]
    rng = np.random.RandomState(3)
    for _ in range(1500):
        t = rng.randint(0, 40)
        path = rng.choice(
            [-3, -1, 0, 1, 2, 3, 4],
            size=t,
            p=[0.1, 0.1, 0.2, 0.2, 0.15, 0.05, 0.2],
        )
        fids = (
            np.sort(rng.randint(0, 100, size=t)) if rng.rand() < 0.5 else None
        )
        words, frames, (partial, pframes) = replay_token_path(
            path.tolist(), labels, False, frame_ids=fids
        )
        if partial:
            words.append(partial)
            frames.append(pframes)
        w2, f2 = replay_token_path_np(path, labels, 4, 0, frame_ids=fids)
        assert words == w2
        assert frames == f2


def test_replay_token_paths_batch_matches_python():
    """Batched replay == per-row exact loop over fuzzed ragged rows."""
    from pyctcdecode_tpu.tpu_decoder import replay_token_paths_batch

    labels = [" ", "a", "b", "c", ""]
    rng = np.random.RandomState(7)
    for _ in range(120):
        rows = rng.randint(1, 12)
        t_pad = rng.randint(1, 40)
        toks = rng.choice(
            [-3, -1, 0, 1, 2, 3, 4],
            size=(rows, t_pad),
            p=[0.1, 0.1, 0.2, 0.2, 0.15, 0.05, 0.2],
        )
        use_fids = rng.rand() < 0.5
        if use_fids:
            fids = np.sort(rng.randint(0, 100, size=(rows, t_pad)), axis=1)
        else:
            fids = None
        got = replay_token_paths_batch(
            toks, labels, 4, 0, frame_ids=fids
        )
        for i in range(rows):
            words, frames, (partial, pframes) = replay_token_path(
                toks[i].tolist(),
                labels,
                False,
                frame_ids=fids[i] if use_fids else None,
            )
            if partial:
                words.append(partial)
                frames.append(pframes)
            assert got[i][0] == words, (i, got[i][0], words)
            assert got[i][1] == frames, (i, got[i][1], frames)


def test_collect_batch_fast_matches_general_path():
    """The batched collect == the per-utterance path on a real LM batch."""
    import os

    import pytest

    from pyctcdecode_tpu import Alphabet, LanguageModel
    from pyctcdecode_tpu.models.ngram import NGramModel
    from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC

    arpa = "/root/reference/pyctcdecode/tests/sample_data/bugs_bunny_kenlm.arpa"
    if not os.path.exists(arpa):
        pytest.skip("reference fixtures absent")
    from .helpers import SAMPLE_LABELS, TEST_PROBS

    lm = LanguageModel(NGramModel.from_file(arpa), ["bugs", "bunny"])
    dec = TPUBeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS), lm)
    rng = np.random.RandomState(9)
    batch = [TEST_PROBS] + [
        np.clip(TEST_PROBS + rng.randn(*TEST_PROBS.shape) * s, 1e-6, 1.0)
        for s in (0.02, 0.05, 0.1)
    ]
    kw = dict(beam_width=10, top_n=3, token_chunking=4, blank_collapse=True)
    fast = dec.decode_beams_batch(batch, **kw)
    orig = TPUBeamSearchDecoderCTC._collect_batch_fast
    try:
        TPUBeamSearchDecoderCTC._collect_batch_fast = lambda self, h, host: None
        slow = dec.decode_beams_batch(batch, **kw)
    finally:
        TPUBeamSearchDecoderCTC._collect_batch_fast = orig
    assert len(fast) == len(slow)
    for fu, su in zip(fast, slow):
        assert [b.text for b in fu] == [b.text for b in su]
        for bf, bs in zip(fu, su):
            assert bf.text_frames == bs.text_frames
            assert abs(bf.logit_score - bs.logit_score) < 1e-5
            assert abs(bf.lm_score - bs.lm_score) < 1e-5
            assert bf.last_lm_state == bs.last_lm_state
