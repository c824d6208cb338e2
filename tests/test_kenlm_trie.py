"""KenLM TRIE binary ingestion: bit-packing, round-trip, parity, blanks.

The reference hands any kenlm binary to the kenlm bindings; here the
un-quantized TRIE layout is decoded natively (models/kenlm_trie.py) into
the same hash-keyed tables the PROBING reader produces. No kenlm exists in
this environment, so compatibility is pinned by round-trip through this
module's own writer plus exact score equality with the ARPA scorer on
suffix-closed models (where kenlm's blank-entry semantics cannot diverge).
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
from pyctcdecode_tpu.models.kenlm_trie import (
    _read_bits,
    _write_bits,
    encode_bins,
    train_bins,
    write_kenlm_trie,
)
from pyctcdecode_tpu.models.ngram import NGramModel, NGramTables, read_arpa

BUGS_ARPA = "/root/reference/pyctcdecode/tests/sample_data/bugs_bunny_kenlm.arpa"


def _suffix_closed_arpa(path, order=3, vocab_n=120, grams=500, seed=7):
    """Random ARPA where every suffix of every n-gram is itself present.

    Suffix closure makes kenlm's trie blank insertion a no-op, so the trie
    round trip must score identically to the ARPA scorer.
    """
    rng = np.random.RandomState(seed)
    vocab = sorted({f"w{i}" for i in range(vocab_n)})
    top = np.unique(rng.randint(0, vocab_n, size=(grams, order)), axis=0)
    by_order = {order: {tuple(r) for r in top}}
    for n in range(order - 1, 1, -1):
        rows = {tuple(r) for r in rng.randint(0, vocab_n, size=(grams, n))}
        rows |= {t[1:] for t in by_order[n + 1]}  # close under suffix
        by_order[n] = rows
    with open(path, "w") as fh:
        fh.write("\\data\\\n")
        fh.write(f"ngram 1={vocab_n + 3}\n")
        for n in range(2, order + 1):
            fh.write(f"ngram {n}={len(by_order[n])}\n")
        fh.write("\n\\1-grams:\n")
        fh.write("-9\t<unk>\t0\n-2.1\t<s>\t-0.55\n-2.2\t</s>\t0\n")
        for w in vocab:
            p = round(float(rng.uniform(-5.5, -2.0)), 4)
            b = round(float(rng.uniform(-1.1, -0.1)), 4)
            fh.write(f"{p}\t{w}\t{b}\n")
        for n in range(2, order + 1):
            fh.write(f"\n\\{n}-grams:\n")
            for row in sorted(by_order[n]):
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
    state = model.begin_sentence_state()
    total = 0.0
    for w in words:
        s, state = model.raw_score_word(state, w)
        total += s
    return total + model.raw_end_score(state), state


class TestBitPacking(unittest.TestCase):
    def test_write_read_roundtrip_random_widths(self):
        rng = np.random.RandomState(0)
        for width in (1, 7, 17, 31, 32, 48, 57):
            n = 257
            total = width + 13  # entries straddle byte boundaries
            buf = np.zeros(((n + 1) * total + 7) // 8 + 8, dtype=np.uint8)
            offs = np.arange(n, dtype=np.uint64) * np.uint64(total)
            vals = rng.randint(0, 2 ** min(width, 62), size=n).astype(
                np.uint64
            ) & np.uint64((1 << width) - 1)
            _write_bits(buf, offs, width, vals)
            got = _read_bits(buf, offs, width)
            np.testing.assert_array_equal(got, vals)

    def test_interleaved_fields_do_not_clobber(self):
        n = 64
        total = 10 + 31 + 32
        buf = np.zeros(((n + 1) * total + 7) // 8 + 8, dtype=np.uint8)
        base = np.arange(n, dtype=np.uint64) * np.uint64(total)
        words = (np.arange(n) % 1000).astype(np.uint64)
        probs = -np.linspace(0.1, 9.9, n).astype(np.float32)
        backs = np.linspace(-2, 2, n).astype(np.float32)
        from pyctcdecode_tpu.models.kenlm_trie import (
            _float_to_npf31,
            _npf31_to_float,
        )

        _write_bits(buf, base, 10, words)
        _write_bits(buf, base + np.uint64(10), 31, _float_to_npf31(probs))
        _write_bits(
            buf, base + np.uint64(41), 32,
            backs.view(np.uint32).astype(np.uint64),
        )
        np.testing.assert_array_equal(_read_bits(buf, base, 10), words)
        np.testing.assert_array_equal(
            _npf31_to_float(_read_bits(buf, base + np.uint64(10), 31)), probs
        )
        np.testing.assert_array_equal(
            _read_bits(buf, base + np.uint64(41), 32)
            .astype(np.uint32)
            .view(np.float32),
            backs,
        )


class TestTrieRoundTrip(TempfileTestCase):
    def _roundtrip(self, arpa_path):
        ref = NGramModel(read_arpa(arpa_path))
        bin_path = os.path.join(self.temp_dir, "model.trie.bin")
        write_kenlm_trie(ref.tables, bin_path)
        got = KenLMBinaryModel(read_kenlm_binary(bin_path))
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

    def test_suffix_closed_fuzz_orders_3_to_5(self):
        for order, seed in ((3, 7), (4, 23), (5, 41)):
            arpa = os.path.join(self.temp_dir, f"rand{order}.arpa")
            vocab = _suffix_closed_arpa(arpa, order=order, seed=seed)
            ref, got = self._roundtrip(arpa)
            rng = np.random.RandomState(order)
            for _ in range(200):
                n_words = rng.randint(1, 6)
                sent = [vocab[i] for i in rng.randint(0, len(vocab), n_words)]
                if rng.rand() < 0.2:
                    sent[rng.randint(n_words)] = "oov-word"
                want, _ = _score_sentence(ref, sent)
                have, _ = _score_sentence(got, sent)
                self.assertAlmostEqual(want, have, places=5, msg=str(sent))

    def test_trie_matches_probing_reader_on_same_model(self):
        arpa = os.path.join(self.temp_dir, "rand.arpa")
        vocab = _suffix_closed_arpa(arpa, order=3, seed=3)
        ref = NGramModel(read_arpa(arpa))
        trie_path = os.path.join(self.temp_dir, "m.trie.bin")
        prob_path = os.path.join(self.temp_dir, "m.prob.bin")
        write_kenlm_trie(ref.tables, trie_path)
        write_kenlm_binary(ref.tables, prob_path)
        trie = KenLMBinaryModel(read_kenlm_binary(trie_path))
        prob = KenLMBinaryModel(read_kenlm_binary(prob_path))
        rng = np.random.RandomState(1)
        for _ in range(100):
            sent = [vocab[i] for i in rng.randint(0, len(vocab), 4)]
            self.assertAlmostEqual(
                _score_sentence(trie, sent)[0],
                _score_sentence(prob, sent)[0],
                places=6,
            )

    def test_blank_entries_materialize_kenlm_semantics(self):
        """A pruned suffix becomes a blank whose prob is its longest
        surviving suffix's — kenlm BlankManager behavior, which diverges
        from pure ARPA resolution by the missing context's backoff."""
        arpa = os.path.join(self.temp_dir, "pruned.arpa")
        with open(arpa, "w") as fh:
            fh.write(
                "\\data\\\nngram 1=5\nngram 2=1\nngram 3=1\n\n"
                "\\1-grams:\n-9\t<unk>\t0\n-1\t<s>\t-0.5\n-1.5\t</s>\t0\n"
                "-2\ta\t-0.25\n-3\tc\t0\n\n"
                "\\2-grams:\n-0.4\t<s> a\t-0.3\n\n"
                "\\3-grams:\n-0.2\t<s> a c\n\n\\end\\\n"
            )
        ref = NGramModel(read_arpa(arpa))
        bin_path = os.path.join(self.temp_dir, "pruned.trie.bin")
        write_kenlm_trie(ref.tables, bin_path)
        got = KenLMBinaryModel(read_kenlm_binary(bin_path))
        # (a c) was pruned -> blank with prob of its suffix (c) = -3.
        # Full trigram hits still resolve exactly:
        s_ref, _ = _score_sentence(ref, ["a", "c"])
        s_got, _ = _score_sentence(got, ["a", "c"])
        self.assertAlmostEqual(s_ref, s_got, places=6)
        # Scoring c | a alone hits the blank: kenlm returns prob(c) with
        # NO backoff(a) penalty; the ARPA scorer adds backoff(a) = -0.25.
        sc_got, _ = got.raw_score_word((got.tables.word_id("a"),), "c")
        self.assertAlmostEqual(sc_got, -3.0, places=6)
        sc_ref, _ = ref.raw_score_word((ref.tables.vocab["a"],), "c")
        self.assertAlmostEqual(sc_ref, -3.25, places=6)

    def test_vocab_ids_follow_sorted_hash_order(self):
        arpa = os.path.join(self.temp_dir, "rand.arpa")
        _suffix_closed_arpa(arpa, order=2, vocab_n=50, seed=9)
        ref, got = self._roundtrip(arpa)
        from pyctcdecode_tpu.ops.hashing import murmur64

        vocab = got.tables.vocab
        self.assertEqual(vocab["<unk>"], 0)
        non_unk = [w for w in vocab if w != "<unk>"]
        by_hash = sorted(non_unk, key=lambda w: murmur64(w.encode()))
        for rank, w in enumerate(by_hash, start=1):
            self.assertEqual(vocab[w], rank)


class TestTrieDecoding(TempfileTestCase):
    def _bin_path(self):
        ref = NGramModel(read_arpa(BUGS_ARPA))
        path = os.path.join(self.temp_dir, "bugs.trie.bin")
        write_kenlm_trie(ref.tables, path)
        return path

    def test_host_decoder_from_trie_binary(self):
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


class TestTrieRejection(TempfileTestCase):
    def test_bhiksha_trie_rejected_with_guidance(self):
        from pyctcdecode_tpu.models import kenlm_bin as kb

        raw = bytearray(
            kb._pack_header(3, [10, 5, 2], 1.5, True, model_type=4)
        )
        path = os.path.join(self.temp_dir, "array.bin")
        with open(path, "wb") as fh:
            fh.write(bytes(raw) + b"\x00" * 64)
        with self.assertRaisesRegex(ValueError, "ARRAY_TRIE"):
            read_kenlm_binary(path)

    def test_corrupt_csr_rejected(self):
        arpa = os.path.join(self.temp_dir, "rand.arpa")
        _suffix_closed_arpa(arpa, order=3, vocab_n=30, grams=60, seed=2)
        ref = NGramModel(read_arpa(arpa))
        path = os.path.join(self.temp_dir, "m.trie.bin")
        write_kenlm_trie(ref.tables, path)
        with open(path, "rb") as fh:
            raw = bytearray(fh.read())
        # trash the unigram next pointers (monotonicity check must fire)
        from pyctcdecode_tpu.models.kenlm_bin import _read_header

        order, _, _, counts, off, _ = _read_header(bytes(raw), path)
        uni_off = off + 8 + 8 * counts[0]
        for i in range(4):
            base = uni_off + i * 16 + 8
            raw[base : base + 8] = (
                np.uint64(10_000_000 - i).tobytes()
            )
        with open(path, "wb") as fh:
            fh.write(bytes(raw))
        with self.assertRaisesRegex(ValueError, "corrupt"):
            read_kenlm_binary(path)


def _quantize_tables(tables, prob_bits, backoff_bits):
    """Expected model after quantization: every order >= 2 value replaced
    by its bin center, with the same bins the writer trains."""
    new = [dict(tables.ngrams[0])]
    for n in range(2, tables.order + 1):
        grams = tables.ngrams[n - 1]
        probs = np.array([v[0] for v in grams.values()], dtype=np.float32)
        p_centers = train_bins(probs, 1 << prob_bits)
        if n < tables.order:
            backoffs = np.array(
                [v[1] for v in grams.values()], dtype=np.float32
            )
            b_centers = np.concatenate(
                [
                    np.array([-0.0, 0.0], dtype=np.float32),
                    train_bins(
                        backoffs[backoffs != 0.0], (1 << backoff_bits) - 2
                    ),
                ]
            )
        level = {}
        for key, (p, b) in grams.items():
            qp = p_centers[int(encode_bins(np.float32(p), p_centers, 0))]
            if n < tables.order and b != 0.0:
                qb = b_centers[int(encode_bins(np.float32(b), b_centers, 2))]
            else:
                qb = np.float32(b)
            level[key] = (np.float32(qp), np.float32(qb))
        new.append(level)
    return NGramTables(tables.order, dict(tables.vocab), new, path=tables.path)


class TestQuantTrieRoundTrip(TempfileTestCase):
    """QUANT_TRIE (build_binary -q/-b) layout: bins + index packing."""

    def _roundtrip(self, arpa_path, qp=8, qb=8):
        ref = NGramModel(read_arpa(arpa_path))
        bin_path = os.path.join(self.temp_dir, "model.qtrie.bin")
        write_kenlm_trie(ref.tables, bin_path, quant_bits=(qp, qb))
        got = KenLMBinaryModel(read_kenlm_binary(bin_path))
        want = NGramModel(_quantize_tables(ref.tables, qp, qb))
        self.assertEqual(got.order, ref.order)
        return want, got

    def test_scores_equal_binned_model(self):
        """Read-back scoring equals the explicitly-quantized model exactly
        (bit-level: both read f32 centers from the same bins)."""
        for order, seed, qp, qb in ((3, 7, 8, 8), (4, 23, 6, 5), (2, 11, 4, 4)):
            arpa = os.path.join(self.temp_dir, f"q{order}.arpa")
            vocab = _suffix_closed_arpa(arpa, order=order, seed=seed)
            want, got = self._roundtrip(arpa, qp, qb)
            rng = np.random.RandomState(order)
            for _ in range(150):
                n_words = rng.randint(1, 6)
                sent = [vocab[i] for i in rng.randint(0, len(vocab), n_words)]
                if rng.rand() < 0.2:
                    sent[rng.randint(n_words)] = "oov-word"
                w, _ = _score_sentence(want, sent)
                h, _ = _score_sentence(got, sent)
                self.assertAlmostEqual(w, h, places=5, msg=str(sent))

    def test_quantization_actually_compresses(self):
        arpa = os.path.join(self.temp_dir, "c.arpa")
        _suffix_closed_arpa(arpa, order=3, seed=9)
        ref = NGramModel(read_arpa(arpa))
        plain = os.path.join(self.temp_dir, "plain.bin")
        quant = os.path.join(self.temp_dir, "quant.bin")
        write_kenlm_trie(ref.tables, plain)
        write_kenlm_trie(ref.tables, quant, quant_bits=(8, 8))
        self.assertLess(os.path.getsize(quant), os.path.getsize(plain))

    def test_unigrams_not_quantized(self):
        arpa = os.path.join(self.temp_dir, "u.arpa")
        _suffix_closed_arpa(arpa, order=3, seed=5)
        ref = NGramModel(read_arpa(arpa))
        path = os.path.join(self.temp_dir, "u.qtrie.bin")
        write_kenlm_trie(ref.tables, path, quant_bits=(4, 4))
        got = KenLMBinaryModel(read_kenlm_binary(path))
        for w in ("w0", "w5", "</s>"):
            wid_r = ref.tables.vocab[w]
            wid_g = got.tables.vocab[w]
            np.testing.assert_equal(
                got.tables.uni[wid_g]["prob"],
                ref.tables.ngrams[0][(wid_r,)][0],
            )

    def test_unknown_quant_version_rejected(self):
        arpa = os.path.join(self.temp_dir, "v.arpa")
        _suffix_closed_arpa(arpa, order=3, seed=2)
        ref = NGramModel(read_arpa(arpa))
        path = os.path.join(self.temp_dir, "v.qtrie.bin")
        write_kenlm_trie(ref.tables, path, quant_bits=(8, 8))
        from pyctcdecode_tpu.models.kenlm_bin import _read_header

        with open(path, "rb") as fh:
            raw = bytearray(fh.read())
        _, _, _, counts, off, _ = _read_header(bytes(raw), path)
        raw[off + 8 + 8 * counts[0]] = 77  # quant version byte
        with open(path, "wb") as fh:
            fh.write(bytes(raw))
        with self.assertRaisesRegex(ValueError, "quantization version"):
            read_kenlm_binary(path)


if __name__ == "__main__":
    unittest.main()
