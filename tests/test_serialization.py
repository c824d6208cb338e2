"""Decoder directory serialization + offline HF-hub cache loading."""
import os

import pytest

from pyctcdecode_tpu import Alphabet, BeamSearchDecoderCTC, LanguageModel
from pyctcdecode_tpu.models.ngram import NGramModel

from .helpers import LIBRI_LABELS, SAMPLE_LABELS, TEST_LOGITS, TempfileTestCase


def _count_models():
    return sum(1 for m in BeamSearchDecoderCTC.model_container.values() if m is not None)


class TestDecoderSerialization(TempfileTestCase):
    def test_parse_directory(self):
        good = [
            ("alphabet.json", "language_model"),
            ("alphabet.json",),
            ("README.md", "alphabet.json", "language_model"),
        ]
        bad = [
            ("language_model",),
            ("alphabet.wrong-ext", "language_model"),
        ]
        for filenames in good:
            self.clear_dir()
            for fn in filenames:
                with open(os.path.join(self.temp_dir, fn), "w") as fh:
                    fh.write("x")
            BeamSearchDecoderCTC.parse_directory_contents(self.temp_dir)
        for filenames in bad:
            self.clear_dir()
            for fn in filenames:
                with open(os.path.join(self.temp_dir, fn), "w") as fh:
                    fh.write("x")
            with self.assertRaises(ValueError):
                BeamSearchDecoderCTC.parse_directory_contents(self.temp_dir)

    def test_round_trip_no_lm(self):
        from pyctcdecode_tpu import build_ctcdecoder

        decoder = build_ctcdecoder(LIBRI_LABELS, engine="host")
        old_count = _count_models()
        decoder.save_to_dir(self.temp_dir)
        self.assertEqual(_count_models(), old_count)
        restored = BeamSearchDecoderCTC.load_from_dir(self.temp_dir)
        self.assertEqual(restored._alphabet.labels, decoder._alphabet.labels)
        self.assertEqual(old_count, _count_models())


class TestDecoderSerializationWithLM(TempfileTestCase):
    @pytest.fixture(autouse=True)
    def _arpa(self, bugs_bunny_arpa_path):
        self.arpa_path = bugs_bunny_arpa_path

    def test_round_trip_with_lm(self):
        model = NGramModel.from_file(self.arpa_path)
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        decoder = BeamSearchDecoderCTC(alphabet, LanguageModel(model, alpha=1.0))
        text = decoder.decode(TEST_LOGITS)
        assert text == "bugs bunny"

        old_count = _count_models()
        decoder.save_to_dir(self.temp_dir)
        assert _count_models() == old_count

        restored = BeamSearchDecoderCTC.load_from_dir(self.temp_dir)
        assert restored.decode(TEST_LOGITS) == text
        assert _count_models() == old_count + 1

    def test_load_from_hf_hub_offline(self):
        try:
            import huggingface_hub
            from huggingface_hub.constants import REPO_ID_SEPARATOR
        except ImportError:
            pytest.skip("huggingface_hub not installed")

        model = NGramModel.from_file(self.arpa_path)
        alphabet = Alphabet.build_alphabet(SAMPLE_LABELS)
        decoder = BeamSearchDecoderCTC(alphabet, LanguageModel(model, alpha=1.0))
        text = decoder.decode(TEST_LOGITS)

        # fake a cached hub download (modern cache layout)
        name = "someone/dummy_test".replace("/", REPO_ID_SEPARATOR)
        sha = "123456abcdef"
        models_dir = os.path.join(self.temp_dir, f"models{REPO_ID_SEPARATOR}{name}")
        snap_dir = os.path.join(models_dir, "snapshots", sha)
        os.makedirs(snap_dir)
        os.makedirs(os.path.join(models_dir, "refs"))
        with open(os.path.join(models_dir, "refs", "main"), "w") as fh:
            fh.write(sha)
        decoder.save_to_dir(snap_dir)

        restored = BeamSearchDecoderCTC.load_from_hf_hub(
            "someone/dummy_test", cache_dir=self.temp_dir, local_files_only=True
        )
        assert restored.decode(TEST_LOGITS) == text


def test_gzipped_arpa_round_trips_through_save_load(tmp_path):
    """save_to_dir copies an .arpa.gz model; load_from_dir must accept it."""
    import gzip
    import os

    from pyctcdecode_tpu import BeamSearchDecoderCTC, build_ctcdecoder
    from pyctcdecode_tpu.models.ngram import load_unigram_set_from_arpa

    src_arpa = "/root/reference/pyctcdecode/tests/sample_data/bugs_bunny_kenlm.arpa"
    if not os.path.exists(src_arpa):
        import pytest

        pytest.skip("reference fixtures absent")
    gz = tmp_path / "bugs.arpa.gz"
    with open(src_arpa, "rb") as fin, gzip.open(gz, "wb") as fout:
        fout.write(fin.read())
    # the gz-aware unigram loader reads the same set as the plain file
    assert load_unigram_set_from_arpa(str(gz)) == load_unigram_set_from_arpa(
        src_arpa
    )
    labels = [" ", "b", "g", "n", "s", "u", "y", ""]
    dec = build_ctcdecoder(labels, str(gz), engine="host")
    out = tmp_path / "saved"
    os.makedirs(out)
    dec.save_to_dir(str(out))
    loaded = BeamSearchDecoderCTC.load_from_dir(str(out))
    assert loaded._language_model is not None
    BeamSearchDecoderCTC.clear_class_models()
