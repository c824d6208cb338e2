"""Corpus evaluation harness tests: synthesis, WER reporting, engine parity."""
import os
import tempfile
import unittest

from pyctcdecode_tpu import BeamSearchDecoderCTC, build_ctcdecoder
from pyctcdecode_tpu.evaluation import (
    compare_engines,
    evaluate_corpus,
    synthesize_corpus,
)

LIBRI_LABELS = [" "] + list("abcdefghijklmnopqrstuvwxyz") + ["'"] + [""]


def _write_arpa(path, vocab):
    with open(path, "w") as fh:
        fh.write("\\data\\\n")
        fh.write(f"ngram 1={len(vocab) + 3}\n")
        fh.write(f"ngram 2={len(vocab)}\n\n")
        fh.write("\\1-grams:\n")
        fh.write("-10\t<unk>\t0\n-2\t<s>\t-0.5\n-2\t</s>\t0\n")
        for w in vocab:
            fh.write(f"-2.5\t{w}\t-0.5\n")
        fh.write("\n\\2-grams:\n")
        for i, w in enumerate(vocab):
            fh.write(f"-1.0\t{w} {vocab[(i + 1) % len(vocab)]}\n")
        fh.write("\n\\end\\\n")


VOCAB = sorted(
    {
        "speech", "model", "decode", "beam", "search", "tensor", "kernel",
        "vector", "matrix", "stream", "window", "corpus", "sample", "signal",
        "filter", "weight", "output", "input", "batch", "frame", "token",
        "chip", "mesh", "shard", "probe", "table", "score", "word", "unit",
        "node", "edge", "graph", "path", "cost", "gain", "rate", "time",
    }
)


class TestCorpusEvaluation(unittest.TestCase):
    def tearDown(self):
        BeamSearchDecoderCTC.clear_class_models()

    def test_synthesis_reproducible_and_decodable(self):
        c1 = synthesize_corpus(LIBRI_LABELS, VOCAB, n_utterances=8, seed=3)
        c2 = synthesize_corpus(LIBRI_LABELS, VOCAB, n_utterances=8, seed=3)
        self.assertEqual(c1.references, c2.references)
        for a, b in zip(c1.logits, c2.logits):
            self.assertEqual(a.shape, b.shape)
        self.assertGreater(c1.audio_seconds, 0)

    def test_greedyish_wer_beats_chance_and_lm_helps(self):
        corpus = synthesize_corpus(
            LIBRI_LABELS, VOCAB, n_utterances=24, seed=1, noise=1.6
        )
        with tempfile.TemporaryDirectory() as td:
            arpa = os.path.join(td, "lm.arpa")
            _write_arpa(arpa, VOCAB)
            no_lm = build_ctcdecoder(LIBRI_LABELS, engine="host")
            with_lm = build_ctcdecoder(
                LIBRI_LABELS, arpa, alpha=0.6, engine="host"
            )
            r0 = evaluate_corpus(no_lm, corpus, beam_width=24, warmup=False)
            r1 = evaluate_corpus(with_lm, corpus, beam_width=24, warmup=False)
        self.assertLess(r0["wer"], 0.9)
        # shallow fusion with the word-list LM repairs noisy spellings
        self.assertLessEqual(r1["wer"], r0["wer"])

    def test_engine_parity_on_corpus(self):
        """>100-utterance host-vs-device corpus parity (VERDICT round-1 #6)."""
        corpus = synthesize_corpus(
            LIBRI_LABELS, VOCAB, n_utterances=112, seed=7, noise=1.5
        )
        with tempfile.TemporaryDirectory() as td:
            arpa = os.path.join(td, "lm.arpa")
            _write_arpa(arpa, VOCAB)
            host = build_ctcdecoder(LIBRI_LABELS, arpa, alpha=0.6, engine="host")
            dev = build_ctcdecoder(LIBRI_LABELS, arpa, alpha=0.6, engine="tpu")
            report = compare_engines(host, dev, corpus, beam_width=100)
        # identical corpus WER and (near-)identical transcripts; device f32
        # accumulation may flip exact score ties on synthetic data
        self.assertGreaterEqual(report["top1_agreement"], 0.99)
        self.assertLessEqual(abs(report["wer_delta"]), 1e-3)


class TestWerRuntimeSweep(unittest.TestCase):
    def test_two_point_sweep_artifact(self):
        """scripts/wer_runtime_sweep.py regenerates a 2-point artifact.

        The committed docs/wer_runtime_sweep.{json,md} mirror the
        reference's beam-ladder WER/runtime table (ref README.md:107-109,
        03_eval_performance.ipynb cells 29-31); this pins the generator's
        structure on a tiny 2-beam version.
        """
        import sys

        sys.path.insert(
            0,
            os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"),
        )
        import wer_runtime_sweep as ws

        with tempfile.TemporaryDirectory() as td:
            arpa = os.path.join(td, "lm.arpa")
            _write_arpa(arpa, VOCAB)
            result = ws.run_sweep(
                (1, 5), n=8, host_n=4, arpa=arpa, device=True,
                lm_vocab_draw=200, reps=1,
            )
        self.assertEqual([p["beam_width"] for p in result["points"]], [1, 5])
        for p in result["points"]:
            self.assertIn("host_ms_per_sample", p)
            self.assertIn("host_wer_subset", p)
            self.assertIn("device_ms_per_sample", p)
            self.assertIn("device_wer_subset", p)
            self.assertIn("device_wer_full", p)
            self.assertTrue(p["device_matches_host_subset"])
        md = ws.to_markdown(result)
        self.assertIn("| beam |", md)
        self.assertIn("| 1 |", md)


if __name__ == "__main__":
    unittest.main()
