"""Build driver for the native engine: g++ -> cached shared library.

No pybind11 in the image, so the library exposes a C ABI consumed through
ctypes. The .so is cached next to the source keyed by a source hash;
rebuilds happen automatically when ctclm.cpp changes.
"""
from __future__ import annotations

import hashlib
import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ctclm.cpp")


def _source_tag() -> str:
    with open(_SRC, "rb") as fh:
        return hashlib.sha256(fh.read()).hexdigest()[:16]


def so_path() -> str:
    return os.path.join(_DIR, f"libctclm-{_source_tag()}.so")


def build(verbose: bool = False) -> str:
    """Compile (if needed) and return the shared-library path."""
    out = so_path()
    if os.path.exists(out):
        return out
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-o",
        out,
        _SRC,
    ]
    if verbose:
        sys.stderr.write("+ " + " ".join(cmd) + "\n")
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
    except (subprocess.CalledProcessError, FileNotFoundError) as err:
        raise RuntimeError(f"native build failed: {err}") from err
    # drop stale builds
    for name in os.listdir(_DIR):
        if name.startswith("libctclm-") and name.endswith(".so"):
            path = os.path.join(_DIR, name)
            if path != out:
                try:
                    os.remove(path)
                except OSError:
                    pass
    return out


if __name__ == "__main__":
    sys.stdout.write(build(verbose=True) + "\n")
