"""Notebook smoke tests (ref test_notebooks.py: execute via nbconvert)."""
import os
import unittest

import pytest

TUTORIALS = os.path.join(os.path.dirname(__file__), "..", "tutorials")


class TestNotebooks(unittest.TestCase):
    def test_basic_usage_executes(self):
        """tutorials/00_basic_usage.ipynb runs end-to-end."""
        try:
            import nbformat
            from nbconvert.preprocessors import ExecutePreprocessor
        except ImportError:
            pytest.skip("nbconvert not available")
        path = os.path.join(TUTORIALS, "00_basic_usage.ipynb")
        with open(path) as fh:
            nb = nbformat.read(fh, as_version=4)
        ep = ExecutePreprocessor(timeout=120)
        ep.preprocess(nb, {"metadata": {"path": TUTORIALS}})


if __name__ == "__main__":
    unittest.main()
