#!/usr/bin/env bash
# Lint driver (ref scripts/lint.sh analog). Dispatches to the full external
# tool stack when installed — configs are committed (mypy.ini, setup.cfg
# [flake8]/[isort], .pylintrc, .pydocstyle) so any CI can run them — and
# skips each missing tool with a notice. The self-contained checks
# (byte-compile + scripts/check_style.py, which mirror the core rules)
# always run, so a toolless image still gets real linting.
#
# Usage: scripts/lint.sh [--run-only-fast|--run-only-mypy|--run-only-pylint]
set -euo pipefail
cd "$(dirname "$0")/.."

only="${1:-}"
failures=0

run_tool() {
    local name="$1"; shift
    if python -c "import ${name}" >/dev/null 2>&1; then
        echo "== ${name} =="
        if ! "$@"; then
            failures=1
        fi
    else
        echo "== ${name}: not installed here, skipped (configs committed; runs in CI) =="
    fi
}

if [[ -z "$only" || "$only" == "--run-only-fast" ]]; then
    echo "== byte-compile =="
    python -m compileall -q pyctcdecode_tpu tests bench.py __graft_entry__.py

    echo "== style checks (self-contained) =="
    python scripts/check_style.py

    run_tool isort python -m isort --check-only --diff pyctcdecode_tpu
    run_tool flake8 python -m flake8 pyctcdecode_tpu
    run_tool pydocstyle python -m pydocstyle pyctcdecode_tpu
fi

if [[ -z "$only" || "$only" == "--run-only-mypy" ]]; then
    run_tool mypy python -m mypy pyctcdecode_tpu
fi

if [[ -z "$only" || "$only" == "--run-only-pylint" ]]; then
    run_tool pylint python -m pylint pyctcdecode_tpu
fi

if [[ "$failures" -ne 0 ]]; then
    echo "lint: FAILURES above"
    exit 1
fi
echo "lint: all checks passed"
