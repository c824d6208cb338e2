"""KenLM PROBING binary ingestion: round-trip, scoring parity, rejection.

The reference hands .bin files to the kenlm bindings (ref
language_model.py:422-427); here the PROBING layout is read natively
(models/kenlm_bin.py) and scored both on host (hash-chain lookups) and on
device (fingerprint tables built straight from the stored kenlm hashes).
No kenlm is available in this environment, so compatibility is pinned by
round-trip through this module's own writer plus exact score equality
with the ARPA scorer over the same model.
"""
import os
import unittest

import numpy as np

from .helpers import SAMPLE_LABELS, TEST_PROBS, TempfileTestCase

from pyctcdecode_tpu.models.kenlm_bin import (
    KenLMBinaryModel,
    read_kenlm_binary,
    write_kenlm_binary,
)
from pyctcdecode_tpu.models.ngram import NGramModel, read_arpa

BUGS_ARPA = "/root/reference/pyctcdecode/tests/sample_data/bugs_bunny_kenlm.arpa"


def _random_arpa(path, order=3, vocab_n=200, grams_per_order=400, seed=11):
    """Small random ARPA with consistent suffix closure."""
    rng = np.random.RandomState(seed)
    vocab = sorted({f"w{i}" for i in range(vocab_n)})
    with open(path, "w") as fh:
        fh.write("\\data\\\n")
        fh.write(f"ngram 1={vocab_n + 3}\n")
        grams = {}
        for n in range(2, order + 1):
            rows = np.unique(
                rng.randint(0, vocab_n, size=(grams_per_order, n)), axis=0
            )
            grams[n] = rows
            fh.write(f"ngram {n}={len(rows)}\n")
        fh.write("\n\\1-grams:\n")
        fh.write("-9\t<unk>\t0\n-2.1\t<s>\t-0.55\n-2.2\t</s>\t0\n")
        for w in vocab:
            p = round(float(rng.uniform(-5.5, -2.0)), 4)
            b = round(float(rng.uniform(-1.1, -0.1)), 4)
            fh.write(f"{p}\t{w}\t{b}\n")
        for n in range(2, order + 1):
            fh.write(f"\n\\{n}-grams:\n")
            for row in grams[n]:
                words = " ".join(vocab[i] for i in row)
                p = round(float(rng.uniform(-3.5, -0.4)), 4)
                if n < order:
                    b = round(float(rng.uniform(-0.9, -0.05)), 4)
                    fh.write(f"{p}\t{words}\t{b}\n")
                else:
                    fh.write(f"{p}\t{words}\n")
        fh.write("\n\\end\\\n")
    return vocab


def _score_sentence(model, words):
    """Accumulate raw scores through a word sequence from <s>."""
    state = model.begin_sentence_state()
    total = 0.0
    for w in words:
        s, state = model.raw_score_word(state, w)
        total += s
    return total + model.raw_end_score(state), state


class TestKenLMRoundTrip(TempfileTestCase):
    def _roundtrip(self, arpa_path):
        ref = NGramModel(read_arpa(arpa_path))
        bin_path = os.path.join(self.temp_dir, "model.bin")
        write_kenlm_binary(ref.tables, bin_path)
        got = KenLMBinaryModel.from_file(bin_path)
        self.assertEqual(got.order, ref.order)
        return ref, got

    def test_bugs_bunny_scores_match_arpa(self):
        if not os.path.exists(BUGS_ARPA):
            self.skipTest("reference fixture not present")
        ref, got = self._roundtrip(BUGS_ARPA)
        for sent in (["bugs", "bunny"], ["bunny"], ["bugs", "zzz"], []):
            want, ws = _score_sentence(ref, sent)
            have, hs = _score_sentence(got, sent)
            self.assertAlmostEqual(want, have, places=6, msg=str(sent))
            self.assertEqual(len(ws), len(hs), msg=str(sent))

    def test_vocab_and_membership(self):
        if not os.path.exists(BUGS_ARPA):
            self.skipTest("reference fixture not present")
        ref, got = self._roundtrip(BUGS_ARPA)
        self.assertIn("bugs", got)
        self.assertNotIn("zzz", got)
        self.assertNotIn("<unk>", got)
        words = set(got.vocab_words())
        self.assertIn("bunny", words)
        self.assertIn("<unk>", words)  # id order listing includes specials

    def test_random_higher_order_fuzz(self):
        arpa = os.path.join(self.temp_dir, "rand.arpa")
        vocab = _random_arpa(arpa, order=4, vocab_n=150, grams_per_order=600)
        ref, got = self._roundtrip(arpa)
        rng = np.random.RandomState(5)
        for _ in range(300):
            n_words = rng.randint(1, 6)
            sent = [vocab[i] for i in rng.randint(0, len(vocab), n_words)]
            if rng.rand() < 0.2:
                sent[rng.randint(n_words)] = "oov-word"
            want, _ = _score_sentence(ref, sent)
            have, _ = _score_sentence(got, sent)
            self.assertAlmostEqual(want, have, places=5, msg=str(sent))

    def test_reader_accepts_kenlm_strings_convention(self):
        """kenlm's own writer omits <unk> from the trailing strings (ids
        start at 1, <unk> fixed 0); ids are recovered via the murmur hash
        table, so a binary in that convention must load identically."""
        if not os.path.exists(BUGS_ARPA):
            self.skipTest("reference fixture not present")
        ref = NGramModel(read_arpa(BUGS_ARPA))
        path = os.path.join(self.temp_dir, "model.bin")
        write_kenlm_binary(ref.tables, path)
        with open(path, "rb") as fh:
            raw = fh.read()
        marker = b"<unk>\x00"
        idx = raw.rindex(marker)  # our writer puts <unk> first in strings
        with open(path, "wb") as fh:
            fh.write(raw[:idx] + raw[idx + len(marker):])
        got = KenLMBinaryModel.from_file(path)
        self.assertEqual(got.tables.vocab["<unk>"], 0)
        want, _ = _score_sentence(ref, ["bugs", "bunny"])
        have, _ = _score_sentence(got, ["bugs", "bunny"])
        self.assertAlmostEqual(want, have, places=6)

    def test_states_track_reference(self):
        arpa = os.path.join(self.temp_dir, "rand.arpa")
        vocab = _random_arpa(arpa, order=3, vocab_n=80, grams_per_order=500)
        ref, got = self._roundtrip(arpa)
        rng = np.random.RandomState(9)
        rs, hs = ref.begin_sentence_state(), got.begin_sentence_state()
        for i in rng.randint(0, len(vocab), 50):
            sr, rs = ref.raw_score_word(rs, vocab[i])
            sh, hs = got.raw_score_word(hs, vocab[i])
            self.assertAlmostEqual(sr, sh, places=5)
            # states carry different id spaces; lengths must agree
            self.assertEqual(len(rs), len(hs))


class TestKenLMRejection(TempfileTestCase):
    def _write_header_variant(self, overrides):
        from pyctcdecode_tpu.models import kenlm_bin as kb

        raw = bytearray(kb._pack_header(3, [10, 5, 2], 1.5, True))
        for off, blob in overrides.items():
            raw[off : off + len(blob)] = blob
        path = os.path.join(self.temp_dir, "bad.bin")
        with open(path, "wb") as fh:
            fh.write(bytes(raw) + b"\x00" * 64)
        return path

    def test_array_trie_model_rejected_with_guidance(self):
        path = self._write_header_variant({96: np.int32(4).tobytes()})
        with self.assertRaisesRegex(ValueError, "ARRAY_TRIE.*probing"):
            read_kenlm_binary(path)

    def test_wrong_version_rejected(self):
        path = os.path.join(self.temp_dir, "v4.bin")
        with open(path, "wb") as fh:
            fh.write(
                b"mmap lm http://kheafield.com/code format version 4\n\x00"
                + b"\x00" * 128
            )
        with self.assertRaisesRegex(ValueError, "version"):
            read_kenlm_binary(path)

    def test_not_kenlm_rejected(self):
        path = os.path.join(self.temp_dir, "junk.bin")
        with open(path, "wb") as fh:
            fh.write(b"CTCLM001" + b"\x00" * 100)
        with self.assertRaisesRegex(ValueError, "magic"):
            read_kenlm_binary(path)

    def test_missing_vocab_strings_rejected(self):
        from pyctcdecode_tpu.models import kenlm_bin as kb

        raw = bytearray(kb._pack_header(3, [10, 5, 2], 1.5, False))
        path = os.path.join(self.temp_dir, "novocab.bin")
        with open(path, "wb") as fh:
            fh.write(bytes(raw) + b"\x00" * 1024)
        with self.assertRaisesRegex(ValueError, "vocabulary"):
            read_kenlm_binary(path)


class TestKenLMDecoding(TempfileTestCase):
    def _bin_path(self):
        ref = NGramModel(read_arpa(BUGS_ARPA))
        path = os.path.join(self.temp_dir, "bugs.bin")
        write_kenlm_binary(ref.tables, path)
        return path

    def test_host_decoder_from_binary(self):
        if not os.path.exists(BUGS_ARPA):
            self.skipTest("reference fixture not present")
        from pyctcdecode_tpu import build_ctcdecoder

        decoder = build_ctcdecoder(
            SAMPLE_LABELS, self._bin_path(), engine="host"
        )
        self.assertEqual(decoder.decode(TEST_PROBS), "bugs bunny")
        top = decoder.decode_beams(TEST_PROBS)[0]
        self.assertAlmostEqual(top.logit_score, -2.853399551509947, places=5)
        self.assertAlmostEqual(top.lm_score, 0.14660044849005294, places=5)

    def test_device_decoder_matches_host(self):
        if not os.path.exists(BUGS_ARPA):
            self.skipTest("reference fixture not present")
        from pyctcdecode_tpu import build_ctcdecoder

        path = self._bin_path()
        host = build_ctcdecoder(SAMPLE_LABELS, path, engine="host")
        dev = build_ctcdecoder(SAMPLE_LABELS, path, engine="tpu")
        want = host.decode_beams(TEST_PROBS)[0]
        got = dev.decode_beams(TEST_PROBS)[0]
        self.assertEqual(got.text, want.text)
        self.assertAlmostEqual(got.lm_score, want.lm_score, places=3)

    def test_unigrams_derived_from_binary_vocab(self):
        if not os.path.exists(BUGS_ARPA):
            self.skipTest("reference fixture not present")
        from pyctcdecode_tpu import build_ctcdecoder

        decoder = build_ctcdecoder(
            SAMPLE_LABELS, self._bin_path(), engine="host"
        )
        lm = decoder.model_container[decoder._model_key]
        self.assertEqual(lm.unigram_set, {"bugs", "bunny"})


class TestDeviceTablesFromHashes(unittest.TestCase):
    def test_probe_host_kenlm_mode(self):
        from pyctcdecode_tpu.models.device_tables import (
            build_fp_table_from_hashes,
            probe_fp_host,
        )
        from pyctcdecode_tpu.ops.hashing import kenlm_chain_host

        rng = np.random.RandomState(3)
        keys = np.unique(
            rng.randint(0, 5000, size=(4000, 3)), axis=0
        ).astype(np.int32)
        h64 = kenlm_chain_host(keys)
        probs = rng.randn(len(keys)).astype(np.float32)
        backoffs = rng.randn(len(keys)).astype(np.float32)
        tab = build_fp_table_from_hashes(h64, probs, backoffs, 3)
        self.assertEqual(tab.hash_mode, "kenlm")
        found, p, b = probe_fp_host(tab, keys)
        self.assertTrue(bool(found.all()))
        np.testing.assert_array_equal(p, probs)
        np.testing.assert_array_equal(b, backoffs)
        absent = keys.copy()
        absent[:, 0] += 6000
        found, _, _ = probe_fp_host(tab, absent)
        self.assertFalse(bool(found.any()))

    def test_probe_device_kenlm_mode(self):
        import jax.numpy as jnp

        from pyctcdecode_tpu.models.device_tables import (
            build_fp_table_from_hashes,
            probe_fp_jnp,
        )
        from pyctcdecode_tpu.ops.hashing import kenlm_chain_host

        rng = np.random.RandomState(4)
        keys = np.unique(
            rng.randint(0, 3000, size=(1500, 2)), axis=0
        ).astype(np.int32)
        h64 = kenlm_chain_host(keys)
        probs = rng.randn(len(keys)).astype(np.float32)
        backoffs = rng.randn(len(keys)).astype(np.float32)
        tab = build_fp_table_from_hashes(h64, probs, backoffs, 2)
        tab_dev = {
            "bucket": jnp.asarray(tab.bucket),
            "seed_lo": jnp.uint32(tab.seed_lo),
            "seed_hi": jnp.uint32(tab.seed_hi),
            "size": tab.size,
            "hash_mode": "kenlm",
        }
        q = jnp.asarray(keys)
        valid = jnp.ones(len(keys), dtype=bool)
        found, p, b = probe_fp_jnp(tab_dev, q, valid)
        self.assertTrue(bool(np.asarray(found).all()))
        np.testing.assert_array_equal(np.asarray(p), probs)
        np.testing.assert_array_equal(np.asarray(b), backoffs)


if __name__ == "__main__":
    unittest.main()
