"""Notebook smoke tests (ref test_notebooks.py: execute via nbconvert)."""
import os
import unittest

import pytest

TUTORIALS = os.path.join(os.path.dirname(__file__), "..", "tutorials")


class TestNotebooks(unittest.TestCase):
    def _run(self, name):
        try:
            import nbformat
            from nbconvert.preprocessors import ExecutePreprocessor
        except ImportError:
            pytest.skip("nbconvert not available")
        path = os.path.join(TUTORIALS, name)
        with open(path) as fh:
            nb = nbformat.read(fh, as_version=4)
        ep = ExecutePreprocessor(timeout=300)
        ep.preprocess(nb, {"metadata": {"path": TUTORIALS}})

    def test_basic_usage_executes(self):
        """tutorials/00_basic_usage.ipynb runs end-to-end."""
        self._run("00_basic_usage.ipynb")

    def test_tpu_batch_and_sharding_executes(self):
        """tutorials/01_tpu_batch_and_sharding.ipynb runs end-to-end."""
        self._run("01_tpu_batch_and_sharding.ipynb")

    def test_pipeline_huggingface_executes(self):
        """tutorials/02_pipeline_huggingface.ipynb runs end-to-end."""
        self._run("02_pipeline_huggingface.ipynb")

    def test_eval_performance_executes(self):
        """tutorials/03_eval_performance.ipynb runs end-to-end."""
        self._run("03_eval_performance.ipynb")


if __name__ == "__main__":
    unittest.main()
