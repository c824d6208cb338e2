"""Multi-device data-parallel decoding tests (8 virtual CPU devices).

Mirrors the reference's MockPool philosophy (test parallel semantics
without a cluster, SURVEY.md §4): the conftest forces an 8-device CPU
platform, and these tests assert the DP contract — sharded batch decoding
is element-wise identical to single-device decoding — plus psum metric
aggregation and the driver dry-run entry point.
"""
import os
import unittest

import numpy as np
import pytest

from pyctcdecode_tpu import Alphabet, BeamSearchDecoderCTC, LanguageModel
from pyctcdecode_tpu.models.ngram import NGramModel
from pyctcdecode_tpu.parallel import (
    ShardedCTCDecoder,
    all_reduce_counts,
    make_data_mesh,
)
from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC
from pyctcdecode_tpu.utils.metrics import wer_numerator_denominator

from .helpers import SAMPLE_LABELS, TEST_PROBS, TEST_UNIGRAMS

ARPA = "/root/reference/pyctcdecode/tests/sample_data/bugs_bunny_kenlm.arpa"


def _n_devices():
    import jax

    return len(jax.devices())


class TestShardedDecode(unittest.TestCase):
    def tearDown(self):
        BeamSearchDecoderCTC.clear_class_models()

    def test_mesh_has_8_devices(self):
        self.assertGreaterEqual(_n_devices(), 8)

    def test_sharded_equals_single_device(self):
        dev = TPUBeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS))
        mesh = make_data_mesh(8)
        sharded = ShardedCTCDecoder(dev, mesh=mesh)
        rng = np.random.RandomState(2)
        batch = [
            rng.randn(rng.randint(4, 24), len(SAMPLE_LABELS)) * 2.0
            for _ in range(11)  # ragged, non-multiple of mesh size
        ]
        got = sharded.decode_batch(batch, beam_width=6)
        self.assertEqual(len(got), len(batch))
        for mat, text in zip(batch, got):
            self.assertEqual(dev.decode(mat, beam_width=6), text)

    @pytest.mark.skipif(not os.path.exists(ARPA), reason="reference fixtures absent")
    def test_sharded_with_lm(self):
        lm = LanguageModel(
            NGramModel.from_file(ARPA), TEST_UNIGRAMS, alpha=1.0, unk_score_offset=0.0
        )
        dev = TPUBeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS), lm)
        sharded = ShardedCTCDecoder(dev, mesh=make_data_mesh(8))
        batch = [TEST_PROBS] * 8
        texts = sharded.decode_batch(batch, beam_width=16)
        self.assertEqual(texts, ["bugs bunny"] * 8)

    @pytest.mark.skipif(not os.path.exists(ARPA), reason="reference fixtures absent")
    def test_sharded_lm_table_equals_replicated(self):
        """8-way row-sharded LM tables decode identically to replicated.

        The collective probe path (all_gather keys -> local-range probe ->
        psum values) must be invisible in results: texts, scores and frame
        spans all match the replicated-table layout on the same mesh.
        """
        lm = LanguageModel(
            NGramModel.from_file(ARPA), TEST_UNIGRAMS, alpha=1.0, unk_score_offset=0.0
        )
        dev = TPUBeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS), lm)
        mesh = make_data_mesh(8)
        repl = ShardedCTCDecoder(dev, mesh=mesh)
        shrd = ShardedCTCDecoder(dev, mesh=mesh, shard_lm=True)
        rng = np.random.RandomState(5)
        noisy = [
            np.clip(TEST_PROBS + rng.randn(*TEST_PROBS.shape) * s, 1e-6, 1.0)
            for s in (0.0, 0.02, 0.05, 0.1, 0.0, 0.02, 0.05, 0.1, 0.02)
        ]
        want = repl.decode_beams_batch(noisy, beam_width=12)
        got = shrd.decode_beams_batch(noisy, beam_width=12)
        for w_beams, g_beams in zip(want, got):
            self.assertEqual(len(w_beams), len(g_beams))
            for w, g in zip(w_beams, g_beams):
                self.assertEqual(w.text, g.text)
                self.assertEqual(w.text_frames, g.text_frames)
                self.assertAlmostEqual(w.logit_score, g.logit_score, places=4)
                self.assertAlmostEqual(w.lm_score, g.lm_score, places=4)

    @pytest.mark.skipif(not os.path.exists(ARPA), reason="reference fixtures absent")
    def test_sharded_lm_odd_shard_count_pads_rows(self):
        """Table sizes that don't divide the mesh shard via padded rows.

        Fingerprint planes are power-of-two sized; a 6-device mesh forces
        the ceil-split row padding in ``build_table_args`` (padding rows
        carry the empty fp sentinel and are never owned). Results must be
        identical to the replicated layout.
        """
        lm = LanguageModel(
            NGramModel.from_file(ARPA), TEST_UNIGRAMS, alpha=1.0, unk_score_offset=0.0
        )
        dev = TPUBeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS), lm)
        mesh = make_data_mesh(6)
        repl = ShardedCTCDecoder(dev, mesh=mesh)
        shrd = ShardedCTCDecoder(dev, mesh=mesh, shard_lm=True)
        rng = np.random.RandomState(7)
        noisy = [
            np.clip(TEST_PROBS + rng.randn(*TEST_PROBS.shape) * s, 1e-6, 1.0)
            for s in (0.0, 0.03, 0.08, 0.0, 0.03, 0.08)
        ]
        want = repl.decode_batch(noisy, beam_width=12)
        got = shrd.decode_batch(noisy, beam_width=12)
        self.assertEqual(want, got)

    def test_sharded_lm_without_lm_is_noop(self):
        dev = TPUBeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS))
        sharded = ShardedCTCDecoder(dev, mesh=make_data_mesh(4), shard_lm=True)
        texts = sharded.decode_batch([TEST_PROBS] * 4, beam_width=8)
        self.assertEqual(texts, ["bunny bunny"] * 4)

    def test_sharded_blank_collapse_equals_full(self):
        dec = TPUBeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS))
        sharded = ShardedCTCDecoder(dec, mesh=make_data_mesh(8))
        rng = np.random.RandomState(3)
        blank = len(SAMPLE_LABELS) - 1
        mats = []
        for _ in range(8):
            m = rng.randn(rng.randint(5, 25), len(SAMPLE_LABELS)).astype(
                np.float32
            ) * 2.0
            m[::3] = -30.0
            m[::3, blank] = -1e-4  # blank-certain rows
            mats.append(m)
        full = sharded.decode_beams_batch(mats, beam_width=6)
        fast = sharded.decode_beams_batch(mats, beam_width=6, blank_collapse=True)
        for fu, fa in zip(full, fast):
            self.assertEqual([b.text for b in fu], [b.text for b in fa])
            self.assertEqual(fu[0].text_frames, fa[0].text_frames)

    def test_sharded_token_chunking_equals_dense(self):
        """Token-timeline decoding over the mesh matches the dense path."""
        dec = TPUBeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS))
        sharded = ShardedCTCDecoder(dec, mesh=make_data_mesh(8))
        rng = np.random.RandomState(17)
        mats = [
            rng.randn(rng.randint(5, 25), len(SAMPLE_LABELS)).astype(
                np.float32
            ) * 2.0
            for _ in range(9)
        ]
        dense = sharded.decode_beams_batch(mats, beam_width=6)
        chunked = sharded.decode_beams_batch(
            mats, beam_width=6, token_chunking=3
        )
        for du, ch in zip(dense, chunked):
            self.assertEqual([b.text for b in du], [b.text for b in ch])
            self.assertEqual(du[0].text_frames, ch[0].text_frames)
            self.assertAlmostEqual(du[0].logit_score, ch[0].logit_score,
                                   places=2)

    def test_sharded_with_hotwords(self):
        dev = TPUBeamSearchDecoderCTC(Alphabet.build_alphabet(SAMPLE_LABELS))
        sharded = ShardedCTCDecoder(dev, mesh=make_data_mesh(4))
        texts = sharded.decode_batch(
            [TEST_PROBS] * 4, beam_width=16, hotwords=["bugs"], hotword_weight=25.0
        )
        self.assertEqual(texts, ["bugs bunny"] * 4)
        plain = sharded.decode_batch([TEST_PROBS] * 4, beam_width=16)
        self.assertEqual(plain, ["bunny bunny"] * 4)

    def test_all_reduce_counts(self):
        mesh = make_data_mesh(8)
        per_shard = np.array(
            [wer_numerator_denominator(["a b c"], ["a b x"]) for _ in range(8)],
            dtype=np.int32,
        )
        totals = all_reduce_counts(mesh, per_shard)
        self.assertEqual(totals.tolist(), [8, 24])


class TestMultiProcessMesh(unittest.TestCase):
    """Real 2-process ``jax.distributed`` bring-up over Gloo CPU collectives.

    Two subprocess workers (tests/multiprocess_worker.py) form a global
    2x4-virtual-device mesh via ``parallel.launch.initialize_from_env``,
    decode the same global batch SPMD-style (each feeding its local rows),
    and must reproduce the single-process sharded decode element-wise.
    """

    @pytest.mark.skipif(not os.path.exists(ARPA), reason="no reference data")
    def test_two_process_decode_matches_single(self):
        import json
        import socket
        import subprocess
        import sys as _sys
        import tempfile

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        worker = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")
        with tempfile.TemporaryDirectory() as tmp:
            procs = []
            for pid in range(2):
                env = dict(os.environ)
                env.update(
                    PYCTC_COORDINATOR=f"localhost:{port}",
                    PYCTC_NUM_PROCESSES="2",
                    PYCTC_PROCESS_ID=str(pid),
                )
                env.pop("JAX_PLATFORMS", None)
                procs.append(
                    subprocess.Popen(
                        [_sys.executable, worker, os.path.join(tmp, f"{pid}.json")],
                        env=env,
                        stdout=subprocess.PIPE,
                        stderr=subprocess.STDOUT,
                    )
                )
            outs = [p.communicate(timeout=420)[0].decode() for p in procs]
            for p, out in zip(procs, outs):
                self.assertEqual(p.returncode, 0, out[-3000:])
            shards = []
            for pid in range(2):
                with open(os.path.join(tmp, f"{pid}.json")) as fh:
                    shards.append(json.load(fh))

        # same global batch the workers built
        rng = np.random.RandomState(11)
        labels = [" ", "b", "g", "n", "s", "u", "y", ""]
        batch = [
            np.log(
                rng.dirichlet(np.ones(len(labels)) * 0.35, size=t).astype(
                    np.float32
                )
            )
            for t in (17, 9, 23, 12, 20, 7)
        ]
        from pyctcdecode_tpu.models.language_model import (
            LanguageModel as _LM,
        )

        dec = TPUBeamSearchDecoderCTC(
            Alphabet.build_alphabet(labels),
            _LM(NGramModel.from_file(ARPA), ["bugs", "bunny"]),
        )
        want = dec.decode_beams_batch(batch, beam_width=12, top_n=3)

        covered = []
        for shard in shards:
            self.assertEqual(
                shard["stop"] - shard["start"], len(shard["beams"])
            )
            for g, got in zip(
                range(shard["start"], shard["stop"]), shard["beams"]
            ):
                covered.append(g)
                ref = want[g]
                self.assertEqual(
                    [b["text"] for b in got], [b.text for b in ref]
                )
                for bg, br in zip(got, ref):
                    self.assertAlmostEqual(
                        bg["lm_score"], br.lm_score, places=4
                    )
        self.assertEqual(sorted(covered), list(range(len(batch))))


class TestGraftEntry(unittest.TestCase):
    def test_entry_compiles(self):
        import jax

        import __graft_entry__ as graft

        fn, args = graft.entry()
        out = jax.jit(fn)(*args)
        self.assertEqual(np.asarray(out["beam_src"]).shape, (16,))

    def test_dryrun_multichip(self):
        import __graft_entry__ as graft

        graft.dryrun_multichip(8)


if __name__ == "__main__":
    unittest.main()


def test_sharded_collect_stats_matches_unsharded():
    """Mesh decode returns the same per-utterance counters as the plain
    device engine (stats ride the sharded batch axis like any output)."""
    import numpy as np

    from pyctcdecode_tpu.alphabet import Alphabet
    from pyctcdecode_tpu.parallel import ShardedCTCDecoder, make_data_mesh
    from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC

    from .helpers import LIBRI_LABELS

    rng = np.random.RandomState(3)
    logits = [rng.randn(24, len(LIBRI_LABELS) + 1).astype(np.float32) * 2
              for _ in range(6)]
    labels = LIBRI_LABELS + [""]
    dec = TPUBeamSearchDecoderCTC(Alphabet.build_alphabet(labels))
    plain, plain_stats = dec.decode_beams_batch(
        logits, beam_width=8, collect_stats=True
    )
    sharded = ShardedCTCDecoder(dec, mesh=make_data_mesh(4))
    res, stats = sharded.decode_beams_batch(
        logits, beam_width=8, collect_stats=True
    )
    assert [r[0].text for r in res] == [r[0].text for r in plain]
    assert stats == plain_stats


def test_sharded_timeline_collect_stats():
    """Mesh timeline decode collects counters (round-5: gate removed)."""
    import numpy as np

    from pyctcdecode_tpu.alphabet import Alphabet
    from pyctcdecode_tpu.parallel import ShardedCTCDecoder, make_data_mesh
    from pyctcdecode_tpu.tpu_decoder import TPUBeamSearchDecoderCTC

    from .helpers import LIBRI_LABELS

    rng = np.random.RandomState(4)
    logits = [rng.randn(20, len(LIBRI_LABELS) + 1).astype(np.float32) * 2
              for _ in range(4)]
    labels = LIBRI_LABELS + [""]
    dec = TPUBeamSearchDecoderCTC(Alphabet.build_alphabet(labels))
    plain, plain_stats = dec.decode_beams_batch(
        logits, beam_width=8, token_chunking=4, collect_stats=True
    )
    sharded = ShardedCTCDecoder(dec, mesh=make_data_mesh(4))
    res, stats = sharded.decode_beams_batch(
        logits, beam_width=8, token_chunking=4, collect_stats=True
    )
    assert [r[0].text for r in res] == [r[0].text for r in plain]
    assert stats == plain_stats
