#!/usr/bin/env bash
# Lint driver (ref scripts/lint.sh analog; the image ships no external
# linters, so checks are self-contained: byte-compile + AST style checks).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== byte-compile =="
python -m compileall -q pyctcdecode_tpu tests bench.py __graft_entry__.py

echo "== style checks =="
python scripts/check_style.py

echo "lint: all checks passed"
